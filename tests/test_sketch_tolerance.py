"""Quantified error bars for the approximate sketches, asserted against
DuckDB exact answers on the driver's own testdata tables — so 'approx'
is a tested tolerance, not a rows-only shrug.

- ``approx_distinct`` (HLL, p=12): relative error vs COUNT(DISTINCT)
  within 2% (stderr at p=12 is ~1.6%; the dataset is fixed, so the
  assertion is deterministic).
- ``grouped_quantile_approx`` (fixed-bin histogram): per-group absolute
  error vs MEDIAN() within one bin width ((max-min)/bins).
- the ``max_groups`` cardinality router: above the bound the sketch
  must route to the exact co-partitioned path and match it.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present")


def test_approx_distinct_within_2pct_of_duckdb(ray_session):
    from chomper_ray.stages.sketches import approx_distinct

    path = os.path.join(SF_DIR, "events.parquet")
    exact = duckdb.sql(
        f"select count(distinct user_id) from '{path}'").fetchone()[0]
    est = approx_distinct(rd.read_parquet(path, columns=["user_id"]),
                          "user_id")
    assert abs(est - exact) / exact < 0.02, (est, exact)


def test_grouped_quantile_approx_within_one_bin(ray_session):
    from chomper_ray.pipelines.relational import grouped_quantile_approx

    path = os.path.join(SF_DIR, "events.parquet")
    bins = 4096
    approx = grouped_quantile_approx(
        rd.read_parquet(path, columns=["event_type", "value"]),
        key="event_type", value="value", q=0.5, bins=bins,
        out="med").to_pandas().set_index("event_type")["med"]
    oracle = duckdb.sql(f"""
        select event_type,
               median(value) as med,
               (max(value) - min(value)) / {bins} as bin_w
        from '{path}' group by event_type
    """).df().set_index("event_type")
    assert set(approx.index) == set(oracle.index)
    for et, row in oracle.iterrows():
        err = abs(approx[et] - row["med"])
        assert err <= row["bin_w"], (et, err, row["bin_w"])


def test_quantile_cardinality_router_matches_exact(ray_session):
    from chomper_ray.pipelines.relational import (grouped_quantile,
                                                  grouped_quantile_approx)

    rng = np.random.default_rng(7)
    n_groups = 50
    df = pd.DataFrame({
        "g": rng.integers(0, n_groups, 20_000),
        "v": rng.normal(0.0, 10.0, 20_000),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)

    # above the bound: must route to the exact co-partitioned plan
    routed = grouped_quantile_approx(ds, "g", "v", q=0.5, out="med",
                                     max_groups=10) \
        .to_pandas().sort_values("g").reset_index(drop=True)
    exact = grouped_quantile(ds, "g", "v", q=0.5, out="med") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(routed, exact)
    assert len(exact) == n_groups

    # below the bound: sketch path, within one bin of the exact answer
    sk = grouped_quantile_approx(ds, "g", "v", q=0.5, bins=4096,
                                 out="med").to_pandas() \
        .set_index("g")["med"]
    ex = exact.set_index("g")["med"]
    width = (df["v"].max() - df["v"].min()) / 4096
    assert (np.abs(sk - ex) <= width * 2).all()


def test_heavy_hitters_zipf_bounds(ray_session):
    """CMS bounds on skewed high-cardinality keys: top-k fully recovered,
    estimates never undercount, overcount within 3x the e*N/width bound."""
    from chomper_ray.stages.sketches import approx_heavy_hitters

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"u": (rng.zipf(1.4, 200_000) % 50_000)
                       .astype(np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(8)
    got = approx_heavy_hitters(ds, "u", k=10)
    exact = df["u"].astype(str).value_counts()
    n = len(df)
    for _, r in got.iterrows():
        true = int(exact.get(r["u"], 0))
        assert r["est_count"] >= true
        assert r["est_count"] - true <= np.e * n / 2048 * 3
    assert set(exact.head(10).index) == set(got["u"])


def test_heavy_hitters_sparse_regime_exact_vs_duckdb(ray_session):
    """Distinct keys << width: collision-free rows make CMS estimates
    EXACT, so the sketch reproduces GROUP BY/ORDER BY counts bit-for-bit
    (the property the hash-verified driver query rests on)."""
    from chomper_ray.stages.sketches import approx_heavy_hitters

    path = os.path.join(SF_DIR, "events.parquet")
    exact = duckdb.sql(
        f"select cast(event_type as varchar) e, count(*) c from '{path}' "
        "group by event_type order by c desc, e limit 5").df()
    got = approx_heavy_hitters(
        rd.read_parquet(path, columns=["event_type"]).repartition(4),
        "event_type", k=5)
    assert got["event_type"].tolist() == exact["e"].tolist()
    assert got["est_count"].tolist() == exact["c"].tolist()

"""Relational helpers vs pandas oracles: joins, agg, topk, distinct."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from chomper_ray.pipelines import relational as rel


def mk_ds(df: pd.DataFrame, blocks: int = 4):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(blocks)


RNG = np.random.default_rng(5)
LEFT = pd.DataFrame({
    "k": RNG.integers(0, 40, 300),
    "v": RNG.random(300).round(4),
})
RIGHT = pd.DataFrame({
    "k": np.arange(0, 50, 2),
    "name": [f"n{i}" for i in range(0, 50, 2)],
})


def test_broadcast_join_matches_pandas():
    got = rel.broadcast_join(mk_ds(LEFT), RIGHT, on="k").to_pandas()
    exp = LEFT.merge(RIGHT, on="k")
    assert len(got) == len(exp)
    assert got.groupby("k").size().to_dict() == exp.groupby("k").size().to_dict()


def test_hash_join_matches_pandas():
    got = rel.hash_join(mk_ds(LEFT), mk_ds(RIGHT, 2), on="k").to_pandas()
    exp = LEFT.merge(RIGHT, on="k")
    assert len(got) == len(exp)
    g = got.sort_values(["k", "v"]).reset_index(drop=True)
    x = exp.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g[["k", "v", "name"]], x[["k", "v", "name"]])
    # dtype stability across buckets: int key must NOT degrade to float64
    # (null-padded pandas conversion bug — CORRECTNESS_r01 hash_match:false)
    assert got["k"].dtype.kind == "i"


def test_hash_join_left_keeps_int_dtype():
    got = rel.hash_join(mk_ds(LEFT), mk_ds(RIGHT, 2), on="k",
                        how="left").to_pandas()
    exp = LEFT.merge(RIGHT, on="k", how="left")
    assert len(got) == len(exp)
    # unmatched rows carry null name; k must stay integer regardless
    assert got["k"].dtype.kind == "i"
    assert got["name"].isna().sum() == exp["name"].isna().sum()


def test_semi_anti_join_partition():
    keys = set(RIGHT["k"])
    semi = rel.semi_join(mk_ds(LEFT), keys, on="k").to_pandas()
    anti = rel.anti_join(mk_ds(LEFT), keys, on="k").to_pandas()
    assert len(semi) + len(anti) == len(LEFT)
    assert set(semi["k"]) <= keys
    assert not (set(anti["k"]) & keys)


def test_asof_join_matches_merge_asof():
    left = pd.DataFrame({
        "ts": np.sort(RNG.integers(0, 1000, 100)),
        "g": RNG.integers(0, 3, 100),
    })
    right = pd.DataFrame({
        "ts": np.arange(0, 1000, 50),
        "g": np.tile(np.arange(3), 20)[:20],
        "rate": np.linspace(1, 2, 20).round(3),
    })
    got = rel.asof_join(mk_ds(left, 3), right, on="ts", by="g").to_pandas()
    exp = pd.merge_asof(left.sort_values("ts"),
                        right.sort_values("ts"), on="ts", by="g")
    g = got.sort_values(["ts", "g"]).reset_index(drop=True)
    x = exp.sort_values(["ts", "g"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g[["ts", "g", "rate"]], x[["ts", "g", "rate"]])


def test_grouped_agg_means():
    out = rel.grouped_agg(mk_ds(LEFT), keys=["k"], sums=["v"], means=["v"]) \
        .to_pandas().set_index("k").sort_index()
    exp = LEFT.groupby("k")["v"].agg(["sum", "mean", "size"])
    assert np.allclose(out["sum_v"], exp["sum"])
    assert np.allclose(out["avg_v"], exp["mean"])
    assert (out["n_rows"] == exp["size"]).all()


def test_topk_and_distinct():
    top = rel.topk(mk_ds(LEFT), by="v", k=7, tie_break="k")
    assert len(top) == 7
    assert np.allclose(sorted(top["v"], reverse=True),
                       sorted(LEFT["v"], reverse=True)[:7])
    dis = rel.distinct(mk_ds(LEFT), ["k"]).to_pandas()
    assert sorted(dis["k"]) == sorted(LEFT["k"].unique())


def test_asof_join_partitioned_matches_broadcast():
    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "t": rng.integers(0, 1000, 200),
        "k": rng.integers(0, 5, 200),
        "lid": np.arange(200),
    })
    right = pd.DataFrame({
        "t": np.sort(rng.choice(np.arange(0, 1000), 40, replace=False)),
        "k": rng.integers(0, 5, 40),
        "val": np.arange(40),
    })
    got = rel.asof_join_partitioned(mk_ds(left, 3), mk_ds(right, 2),
                                    on="t", by="k", num_buckets=4,
                                    how="left").to_pandas()
    exp = pd.merge_asof(left.sort_values("t", kind="stable"),
                        right.sort_values("t", kind="stable"), on="t", by="k")
    g = got.sort_values("lid").reset_index(drop=True)
    x = exp.sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(g[["lid", "val"]], x[["lid", "val"]],
                                  check_dtype=False)
    # inner (default, DuckDB ASOF JOIN shape): unmatched left rows dropped,
    # and — dtype stability — val stays int64 across blocks (no null upcast)
    inner = rel.asof_join_partitioned(mk_ds(left, 3), mk_ds(right, 2),
                                      on="t", by="k", num_buckets=4).to_pandas()
    xi = exp[exp["val"].notna()]
    assert sorted(inner["lid"]) == sorted(xi["lid"])
    assert inner["val"].dtype.kind == "i"
    gi = inner.sort_values("lid").reset_index(drop=True)
    assert list(gi["val"]) == list(xi.sort_values("lid")["val"].astype(int))


def test_native_join_matches_explicit():
    got = rel.native_join(mk_ds(LEFT), mk_ds(RIGHT, 2), on="k",
                          num_partitions=4).to_pandas()
    exp = LEFT.merge(RIGHT, on="k")
    assert len(got) == len(exp)


def test_bloom_semi_anti_join_matches_exact():
    """Dataset-to-dataset Bloom-prefiltered semi/anti: must be EXACT
    (false positives killed by the bucketed verification; negatives are
    correct by Bloom's no-false-negative property)."""
    rng = np.random.default_rng(21)
    left = pd.DataFrame({"k": rng.integers(0, 1000, 2000),
                         "v": np.arange(2000)})
    right = pd.DataFrame({"k": rng.choice(1000, 150, replace=False),
                          "extra": "x"})
    semi = rel.bloom_semi_join(mk_ds(left, 4), mk_ds(right, 2),
                               on="k").to_pandas()
    anti = rel.bloom_semi_join(mk_ds(left, 4), mk_ds(right, 2),
                               on="k", anti=True).to_pandas()
    keys = set(right["k"])
    exp_semi = left[left["k"].isin(keys)]
    exp_anti = left[~left["k"].isin(keys)]
    assert sorted(semi["v"]) == sorted(exp_semi["v"])
    assert sorted(anti["v"]) == sorted(exp_anti["v"])
    assert len(semi) + len(anti) == len(left)
    assert semi["k"].dtype.kind == "i" and anti["k"].dtype.kind == "i"


def test_bloom_filter_no_false_negatives():
    vals = np.arange(5000, dtype=np.int64)
    m, k = rel._bloom_params(len(vals), 0.01)
    bits = np.zeros(m // 64, dtype=np.uint64)
    pos = rel._bloom_positions(vals, m, k).ravel()
    np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))
    assert rel._bloom_test(bits, vals, m, k).all()  # every member hits
    # fpp in the right ballpark on non-members
    others = np.arange(10_000, 60_000, dtype=np.int64)
    fp = rel._bloom_test(bits, others, m, k).mean()
    assert fp < 0.05


def test_salted_hash_join_skewed_key():
    """Hot-key salting: a 90%-skewed probe key joins correctly (salted
    probe rows meet replicated build rows), and the hot key's rows
    actually spread across multiple buckets."""
    rng = np.random.default_rng(33)
    left = pd.DataFrame({
        "k": np.where(rng.random(3000) < 0.9, 7, rng.integers(0, 40, 3000)),
        "v": np.arange(3000),
    })
    right = pd.DataFrame({"k": np.arange(40), "name": [f"n{i}" for i in range(40)]})
    hot = rel.detect_hot_keys(mk_ds(left, 4), on="k", frac_threshold=0.05)
    assert 7 in hot and hot[7] >= 2

    got = rel.hash_join(mk_ds(left, 4), mk_ds(right, 2), on="k",
                        num_buckets=16, hot_keys=hot).to_pandas()
    exp = left.merge(right, on="k")
    assert len(got) == len(exp)
    g = got.sort_values("v").reset_index(drop=True)
    x = exp.sort_values("v").reset_index(drop=True)
    pd.testing.assert_frame_equal(g[["k", "v", "name"]], x[["k", "v", "name"]])
    assert got["k"].dtype.kind == "i"

    # the salt function really spreads the hot key over >1 bucket
    buckets = rel._salted_bucket(np.full(1000, 7), 16, "l", hot)
    assert len(np.unique(buckets)) == min(hot[7], 16) or len(np.unique(buckets)) > 1


def test_grouped_quantile_exact_and_approx():
    rng = np.random.default_rng(8)
    df = pd.DataFrame({
        "g": rng.integers(0, 4, 8000),
        "x": rng.integers(0, 50, 8000),           # discrete → exact path
        "y": rng.standard_normal(8000) * 10 + 5,  # continuous → approx
    })
    exact = rel.grouped_quantile(mk_ds(df, 4), key="g", value="x", q=0.5) \
        .to_pandas().set_index("g")["quantile"]
    for g in range(4):
        vals = np.sort(df.loc[df["g"] == g, "x"].to_numpy())
        assert exact[g] == vals[(len(vals) - 1) // 2]  # quantile_disc

    approx = rel.grouped_quantile_approx(mk_ds(df, 4), key="g", value="y",
                                         q=0.5, bins=2048) \
        .to_pandas().set_index("g")["quantile"]
    for g in range(4):
        sub = df.loc[df["g"] == g, "y"]
        tol = (sub.max() - sub.min()) / 2048 * 2 + 1e-9
        assert abs(approx[g] - np.quantile(sub, 0.5)) <= max(tol, 0.1)


def test_grouped_agg_min_max():
    out = rel.grouped_agg(mk_ds(LEFT), keys=["k"], sums=["v"],
                          mins=["v"], maxs=["v"]) \
        .to_pandas().set_index("k").sort_index()
    exp = LEFT.groupby("k")["v"].agg(["min", "max", "sum"])
    assert np.allclose(out["min_v"], exp["min"])
    assert np.allclose(out["max_v"], exp["max"])
    assert np.allclose(out["sum_v"], exp["sum"])


def test_sample_n_by_hash_deterministic_and_consistent():
    df = pd.DataFrame({"k": [f"u{i}" for i in range(1000)],
                       "v": np.arange(1000)})
    s1 = rel.sample_n_by_hash(mk_ds(df, 4), key="k", n=50)
    s2 = rel.sample_n_by_hash(mk_ds(df, 7), key="k", n=50)  # other layout
    assert len(s1) == 50
    assert s1["k"].tolist() == s2["k"].tolist()  # layout-independent
    # consistency: the 20-sample is a prefix (by hash) of the 50-sample
    s3 = rel.sample_n_by_hash(mk_ds(df, 4), key="k", n=20)
    assert set(s3["k"]) <= set(s1["k"])


def test_hopping_window_matches_pandas_expansion():
    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, n),
        "ts": pd.to_datetime(
            rng.integers(1_600_000_000, 1_600_200_000, n), unit="s"),
        "value": rng.random(n).round(4),
    })
    out = rel.hopping_window(mk_ds(df, 4), ts="ts", size_s=3600, hop_s=900,
                             keys=("user_id",), sums=("value",)) \
        .to_pandas().sort_values(["user_id", "w_start_s"]) \
        .reset_index(drop=True)

    # oracle: explicit expansion — each event joins k=4 windows
    s = df["ts"].astype("int64") // 1_000_000
    rows = []
    for i in range(4):
        w = (s // 900) * 900 - i * 900
        rows.append(pd.DataFrame({"user_id": df["user_id"],
                                  "w_start_s": w, "value": df["value"]}))
    exp = (pd.concat(rows).groupby(["user_id", "w_start_s"])
           .agg(sum_value=("value", "sum"), n_rows=("value", "size"))
           .reset_index().sort_values(["user_id", "w_start_s"])
           .reset_index(drop=True))
    assert len(out) == len(exp)
    assert (out["n_rows"].to_numpy() == exp["n_rows"].to_numpy()).all()
    assert np.allclose(out["sum_value"], exp["sum_value"])
    # every window holds >= the events of the tumbling hop slice it covers
    assert int(out["n_rows"].sum()) == 4 * n


def test_hopping_window_rejects_non_multiple():
    df = pd.DataFrame({"user_id": [1], "value": [1.0],
                       "ts": pd.to_datetime([1_600_000_000], unit="s")})
    try:
        rel.hopping_window(mk_ds(df, 1), size_s=3600, hop_s=700)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_stratified_sample_deterministic_and_balanced():
    rng = np.random.default_rng(12)
    df = pd.DataFrame({
        "doc_id": np.arange(3000, dtype=np.int64),
        "lang": rng.choice(["en", "de", "fr", "ja"], 3000,
                           p=[0.7, 0.15, 0.1, 0.05]),
    })
    got = rel.stratified_sample(mk_ds(df, 4), group="lang", key="doc_id",
                                n=7).to_pandas()
    # exactly n per group (every group has >= n members here)
    assert got.groupby("lang").size().eq(7).all()

    # oracle: smallest Knuth hash per group, ties by key
    h = (df["doc_id"].to_numpy(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(4294967296)
    exp = (df.assign(_h=h).sort_values(["lang", "_h", "doc_id"])
           .groupby("lang").head(7))
    assert set(map(tuple, got[["lang", "doc_id"]].to_numpy())) == \
        set(map(tuple, exp[["lang", "doc_id"]].to_numpy()))

    # layout-independence: same picks from a different block count
    got2 = rel.stratified_sample(mk_ds(df, 9), group="lang", key="doc_id",
                                 n=7).to_pandas()
    assert set(got2["doc_id"]) == set(got["doc_id"])

    # groups smaller than n keep all their rows
    tiny = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                         "lang": ["xx", "xx", "yy"]})
    g3 = rel.stratified_sample(mk_ds(tiny, 2), group="lang", key="doc_id",
                               n=7).to_pandas()
    assert len(g3) == 3


def test_range_join_matches_cross_filter_oracle():
    rng = np.random.default_rng(4)
    n, m = 2000, 80
    L = pd.DataFrame({"eid": np.arange(n, dtype=np.int64),
                      "p": rng.integers(0, 5000, n).astype(np.int64)})
    lo = rng.integers(0, 5000, m).astype(np.int64)
    R = pd.DataFrame({"iid": np.arange(m, dtype=np.int64), "lo": lo,
                      "hi": lo + rng.integers(0, 400, m).astype(np.int64)})
    exp = L.merge(R, how="cross")
    exp = exp[(exp.p >= exp.lo) & (exp.p <= exp.hi)] \
        .sort_values(["eid", "iid"]).reset_index(drop=True)
    # derived, tiny, and degenerate single-chunk widths all agree
    for chunk in (None, 32, 5000):
        out = rel.range_join(mk_ds(L, 4), mk_ds(R, 3), point="p",
                             chunk=chunk) \
            .to_pandas().sort_values(["eid", "iid"]).reset_index(drop=True)
        assert len(out) == len(exp)
        assert (out[exp.columns].to_numpy() == exp.to_numpy()).all()
    # empty interval side -> empty result (static schema: an empty
    # repartitioned dataset reports schema() None)
    assert rel.range_join(
        mk_ds(L, 2), mk_ds(R.iloc[:0], 1), point="p",
        right_schema=pa.Table.from_pandas(
            R.iloc[:0], preserve_index=False).schema).count() == 0
    # overlapping column names are rejected, not silently suffixed
    try:
        rel.range_join(mk_ds(L, 1), mk_ds(L, 1), point="p")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_lag_lead_matches_pandas_shift():
    rng = np.random.default_rng(6)
    df = pd.DataFrame({
        "k": rng.integers(0, 12, 500),
        "o": rng.permutation(500),
        "v": rng.random(500).round(3),
    })
    out = rel.lag_lead(mk_ds(df, 4), by="k", order="o", value="v") \
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    exp = df.sort_values(["k", "o"]).reset_index(drop=True)
    grp = exp.groupby("k", sort=False)["v"]
    pd.testing.assert_series_equal(out["lag_value"], grp.shift(1),
                                   check_names=False)
    pd.testing.assert_series_equal(out["lead_value"], grp.shift(-1),
                                   check_names=False)


def test_group_rank_all_methods():
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.integers(0, 8, 400),
        "v": rng.integers(0, 20, 400),       # many ties
        "id": np.arange(400, dtype=np.int64),
    })
    srt = df.sort_values(["k", "v", "id"]).reset_index(drop=True)
    # row_number with tie column: dense sequential per key
    rn = rel.group_rank(mk_ds(df, 4), by="k", order="v", tie="id") \
        .to_pandas().sort_values(["k", "v", "id"]).reset_index(drop=True)
    exp_rn = srt.groupby("k", sort=False).cumcount() + 1
    assert (rn["rank"].to_numpy() == exp_rn.to_numpy()).all()
    # rank / dense_rank match pandas reference semantics
    for method, pm in (("rank", "min"), ("dense_rank", "dense")):
        got = rel.group_rank(mk_ds(df, 4), by="k", order="v",
                             method=method) \
            .to_pandas().sort_values(["k", "v", "id"]) \
            .reset_index(drop=True)
        exp = srt.groupby("k", sort=False)["v"].rank(method=pm) \
            .astype("int64")
        assert (got["rank"].to_numpy() == exp.to_numpy()).all(), method
    # descending row_number: order DESC but tie ASC (SQL's deterministic
    # `ORDER BY v DESC, id` — many duplicate v per key here, so a
    # tie-direction bug flips real rows)
    d = rel.group_rank(mk_ds(df, 4), by="k", order="v", tie="id",
                       descending=True) \
        .to_pandas().sort_values(["k", "id"]).reset_index(drop=True)
    exp_d = df.sort_values(["k", "v", "id"],
                           ascending=[True, False, True])
    exp_d = exp_d.assign(rank=exp_d.groupby("k", sort=False).cumcount() + 1) \
        .sort_values(["k", "id"]).reset_index(drop=True)
    assert (d["rank"].to_numpy() == exp_d["rank"].to_numpy()).all()


def test_pivot_counts_and_sums():
    rng = np.random.default_rng(8)
    df = pd.DataFrame({
        "u": rng.integers(0, 30, 2000),
        "t": rng.choice(["click", "view", "buy"], 2000, p=[.5, .4, .1]),
        "v": rng.random(2000).round(3),
    })
    cats = ["click", "view", "buy"]
    got = rel.pivot_counts(mk_ds(df, 4), key="u", cat="t",
                           categories=cats) \
        .to_pandas().set_index("u").sort_index()
    exp = df.pivot_table(index="u", columns="t", values="v",
                         aggfunc="size", fill_value=0)
    for c in cats:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # value-sum mode
    gv = rel.pivot_counts(mk_ds(df, 4), key="u", cat="t",
                          categories=cats, value="v", ndigits=3) \
        .to_pandas().set_index("u").sort_index()
    ev = df.pivot_table(index="u", columns="t", values="v",
                        aggfunc="sum", fill_value=0.0).round(3)
    for c in cats:
        assert np.allclose(gv[c].to_numpy(), ev[c].to_numpy()), c
    # unlisted category silently ignored, missing category all-zero
    g2 = rel.pivot_counts(mk_ds(df, 4), key="u", cat="t",
                          categories=["click", "nosuch"]) \
        .to_pandas().set_index("u").sort_index()
    assert (g2["nosuch"] == 0).all()
    assert (g2["click"].to_numpy() == exp["click"].to_numpy()).all()


def test_range_join_property_random_frames():
    """Property-style sweep: random point/interval frames (including
    empty-width, duplicate, and negative-domain intervals) always match
    the cross-filter oracle."""
    rng = np.random.default_rng(13)
    for trial in range(5):
        n = int(rng.integers(50, 400))
        m = int(rng.integers(1, 60))
        L = pd.DataFrame({
            "eid": np.arange(n, dtype=np.int64),
            "p": rng.integers(-500, 500, n).astype(np.int64)})
        lo = rng.integers(-500, 500, m).astype(np.int64)
        R = pd.DataFrame({
            "iid": np.arange(m, dtype=np.int64), "lo": lo,
            "hi": lo + rng.integers(0, 120, m).astype(np.int64)})
        exp = L.merge(R, how="cross")
        exp = exp[(exp.p >= exp.lo) & (exp.p <= exp.hi)]
        got = rel.range_join(mk_ds(L, 3), mk_ds(R, 2), point="p",
                             chunk=int(rng.integers(1, 300))).to_pandas()
        assert len(got) == len(exp), trial
        assert (set(map(tuple, got[["eid", "iid"]].to_numpy()))
                == set(map(tuple, exp[["eid", "iid"]].to_numpy()))), trial


def test_rollup_agg_matches_duckdb_rollup():
    import duckdb

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 3000),
        "b": rng.choice(["p", "q"], 3000),
        "v": rng.random(3000).round(3),
    })
    got = rel.rollup_agg(mk_ds(df, 4), keys=["a", "b"], sums=["v"],
                         ndigits=2).to_pandas()
    exp = duckdb.sql(
        "SELECT a, b, round(sum(v), 2) AS sum_v, count(*) AS n_rows "
        "FROM df GROUP BY ROLLUP(a, b)").df()
    key = ["a", "b"]
    g = got.sort_values(key, na_position="last").reset_index(drop=True)
    e = exp.sort_values(key, na_position="last").reset_index(drop=True)
    assert len(g) == len(e)
    pd.testing.assert_frame_equal(
        g.astype({"n_rows": "int64"}), e.astype({"n_rows": "int64"}),
        check_dtype=False)


def test_rollup_agg_explicit_sets_cube():
    import itertools

    rng = np.random.default_rng(10)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], 500),
        "b": rng.choice(["p", "q", "r"], 500),
        "v": rng.integers(0, 100, 500),
    })
    keys = ["a", "b"]
    sets = [list(s) for n in (1, 0)
            for s in itertools.combinations(keys, n)]
    got = rel.rollup_agg(mk_ds(df, 3), keys=keys, sums=["v"],
                         sets=sets).to_pandas()
    import duckdb
    exp = duckdb.sql(
        "SELECT a, b, sum(v)::BIGINT AS sum_v, count(*) AS n_rows "
        "FROM df GROUP BY CUBE(a, b)").df()
    g = got.sort_values(keys, na_position="last").reset_index(drop=True)
    e = exp.sort_values(keys, na_position="last").reset_index(drop=True)
    assert len(g) == len(e)
    assert (g["sum_v"].to_numpy() == e["sum_v"].to_numpy()).all()
    assert (g["n_rows"].to_numpy() == e["n_rows"].to_numpy()).all()


def test_grouped_collect_ordered_string_agg():
    import duckdb

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.integers(0, 40, 2000),
        "v": rng.choice(["a", "bb", "ccc", "d"], 2000),
        "o1": rng.integers(0, 50, 2000),          # deliberate ties in o1
        "o2": np.arange(2000, dtype=np.int64),
    })
    got = rel.grouped_collect(mk_ds(df, 5), key="k", value="v",
                              order=["o1", "o2"], sep="|", out="s") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT k, string_agg(v, '|' ORDER BY o1, o2) AS s "
        "FROM df GROUP BY k ORDER BY k").df()
    assert len(got) == len(exp)
    assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (got["s"].to_numpy() == exp["s"].to_numpy()).all()


def test_grouped_stats_moments_match_duckdb():
    import duckdb

    rng = np.random.default_rng(14)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], 5000),
        "x": rng.normal(100.0, 15.0, 5000).round(3),
        "y": rng.normal(-5.0, 2.0, 5000).round(3),
    })
    # correlate x and y inside one group to exercise nonzero corr
    m = df["k"] == "a"
    df.loc[m, "y"] = (0.5 * df.loc[m, "x"]
                      + rng.normal(0, 1, int(m.sum()))).round(3)
    got = rel.grouped_stats(mk_ds(df, 6), keys=["k"], x="x", y="y",
                            ndigits=4).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT k, count(*) AS n, round(avg(x),4) AS avg_x, "
        "round(stddev_pop(x),4) AS std_x, "
        "round(covar_pop(x,y),4) AS cov_xy, round(corr(x,y),4) AS corr_xy "
        "FROM df GROUP BY k ORDER BY k").df()
    pd.testing.assert_frame_equal(got.astype({"n": "int64"}),
                                  exp.astype({"n": "int64"}),
                                  check_dtype=False)
    # x-only mode drops the covariance columns
    g1 = rel.grouped_stats(mk_ds(df, 3), keys=["k"], x="x").to_pandas()
    assert list(g1.columns) == ["k", "n", "avg_x", "std_x"]


def test_grouped_mode_deterministic_ties():
    import duckdb

    rng = np.random.default_rng(15)
    df = pd.DataFrame({
        "k": rng.integers(0, 25, 3000),
        "v": rng.choice(["zz", "aa", "mm", "bb"], 3000),
    })
    got = rel.grouped_mode(mk_ds(df, 5), key="k", value="v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT k, v, n FROM (SELECT k, v, count(*) AS n, row_number() "
        "OVER (PARTITION BY k ORDER BY count(*) DESC, v) AS rn "
        "FROM df GROUP BY k, v) WHERE rn = 1 ORDER BY k").df()
    assert len(got) == len(exp)
    assert (got["v"].to_numpy() == exp["v"].to_numpy()).all()
    assert (got["n"].to_numpy().astype("int64")
            == exp["n"].to_numpy().astype("int64")).all()


def test_explode_split_with_ordinality():
    import duckdb

    df = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "s": ["a b c", "x", "", "p  q"],   # empty string and double sep
    })
    got = rel.explode_split(mk_ds(df, 2), col="s", keep=["id"]) \
        .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT id, generate_subscripts(l,1) AS pos, unnest(l) AS token "
        "FROM (SELECT id, string_split(s, ' ') AS l FROM df) "
        "ORDER BY id, pos").df()
    assert len(got) == len(exp)
    assert (got["token"].to_numpy() == exp["token"].to_numpy()).all()
    assert (got["pos"].to_numpy().astype("int64")
            == exp["pos"].to_numpy().astype("int64")).all()


def test_set_op_intersect_except_multicolumn():
    import duckdb

    rng = np.random.default_rng(16)
    L = pd.DataFrame({"a": rng.integers(0, 20, 800),
                      "b": rng.choice(["x", "y", "z"], 800)})
    R = pd.DataFrame({"a": rng.integers(10, 30, 600),
                      "b": rng.choice(["x", "y", "w"], 600)})
    for op, sql in (("intersect", "INTERSECT"), ("except", "EXCEPT")):
        got = rel.set_op(mk_ds(L, 3), mk_ds(R, 2), columns=["a", "b"],
                         op=op).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        exp = duckdb.sql(
            f"SELECT a, b FROM L {sql} SELECT a, b FROM R "
            "ORDER BY a, b").df()
        assert len(got) == len(exp), op
        assert (got["a"].to_numpy() == exp["a"].to_numpy()).all(), op
        assert (got["b"].to_numpy() == exp["b"].to_numpy()).all(), op


def test_merge_intervals_islands():
    import duckdb

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "k": rng.integers(0, 15, 1200),
        "lo": rng.integers(0, 2000, 1200).astype(np.int64),
    })
    df["hi"] = df["lo"] + rng.integers(0, 80, 1200)
    got = rel.merge_intervals(mk_ds(df, 4), key="k").to_pandas() \
        .sort_values(["k", "lo"]).reset_index(drop=True)
    exp = duckdb.sql(
        "WITH i AS (SELECT *, CASE WHEN lo > max(hi) OVER ("
        "PARTITION BY k ORDER BY lo, hi ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND 1 PRECEDING) THEN 1 ELSE 0 END AS ni FROM df), "
        "s AS (SELECT *, sum(ni) OVER (PARTITION BY k ORDER BY lo, hi "
        "ROWS UNBOUNDED PRECEDING) AS island FROM i) "
        "SELECT k, min(lo) AS lo, max(hi) AS hi, count(*) AS n_merged "
        "FROM s GROUP BY k, island ORDER BY k, lo").df()
    pd.testing.assert_frame_equal(
        got, exp.astype({"n_merged": "int64"}), check_dtype=False)
    # merged islands never overlap and cover all sources
    assert got["n_merged"].sum() == len(df)
    nxt = got.groupby("k")["lo"].shift(-1)
    assert ((nxt.isna()) | (nxt > got["hi"])).all()


def test_column_histogram_matches_duckdb():
    import duckdb

    rng = np.random.default_rng(18)
    df = pd.DataFrame({"x": np.concatenate([
        rng.normal(50, 30, 4000),
        [0.0, 100.0, -5.0, 105.0],     # edges and out-of-range
    ])})
    got = rel.column_histogram(mk_ds(df, 4), col="x", lo=0.0, hi=100.0,
                               bins=10).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT CAST(least(floor((x - 0.0) / 10.0), 9) AS BIGINT) AS bin, "
        "count(*) AS n FROM df WHERE x >= 0.0 AND x <= 100.0 "
        "GROUP BY 1 ORDER BY 1").df()
    pd.testing.assert_frame_equal(got, exp.astype({"n": "int64"}),
                                  check_dtype=False)
    assert got["n"].sum() == ((df["x"] >= 0) & (df["x"] <= 100)).sum()


def test_grouped_quantiles_multi_q():
    import duckdb

    rng = np.random.default_rng(19)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 4000),
        "v": rng.integers(0, 500, 4000).astype(np.int64),
    })
    got = rel.grouped_quantiles(mk_ds(df, 5), key="k", value="v",
                                qs=(0.1, 0.5, 0.9)).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT k, quantile_disc(v, 0.1) AS p10, "
        "quantile_disc(v, 0.5) AS p50, quantile_disc(v, 0.9) AS p90 "
        "FROM df GROUP BY k ORDER BY k").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_profile_columns_with_nulls():
    import duckdb

    rng = np.random.default_rng(20)
    df = pd.DataFrame({
        "a": rng.normal(10, 3, 2000).round(3),
        "b": rng.integers(-50, 50, 2000).astype("float64"),
    })
    df.loc[rng.choice(2000, 150, replace=False), "a"] = np.nan
    got = rel.profile_columns(mk_ds(df, 4), ["a", "b"], ndigits=4).to_pandas() \
        .sort_values("col").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT 'a' AS col, count(a) AS n, count(*)-count(a) AS n_null,"
        " round(min(a),4) AS min, round(max(a),4) AS max, "
        "round(sum(a)/count(a),4) AS avg FROM df UNION ALL "
        "SELECT 'b', count(b), count(*)-count(b), round(min(b),4), "
        "round(max(b),4), round(sum(b)/count(b),4) FROM df "
        "ORDER BY col").df()
    pd.testing.assert_frame_equal(
        got.astype({"n": "int64", "n_null": "int64"}),
        exp.astype({"n": "int64", "n_null": "int64"}), check_dtype=False)


def test_hash_join_outer_modes_null_padding():
    import duckdb

    rng = np.random.default_rng(21)
    L = pd.DataFrame({"k": np.arange(0, 40, dtype=np.int64),
                      "lv": rng.integers(0, 100, 40).astype(np.int64)})
    R = pd.DataFrame({"k": np.arange(20, 60, dtype=np.int64),
                      "rv": rng.integers(0, 100, 40).astype(np.int64)})
    for how, sql in (("left", "LEFT"), ("outer", "FULL")):
        got = rel.hash_join(mk_ds(L, 3), mk_ds(R, 2), on="k",
                            how=how).to_pandas() \
            .sort_values(["k", "lv", "rv"], na_position="last") \
            .reset_index(drop=True)
        exp = duckdb.sql(
            f"SELECT coalesce(L.k, R.k) AS k, lv, rv FROM L "
            f"{sql} JOIN R ON L.k = R.k "
            "ORDER BY k, lv NULLS LAST, rv NULLS LAST").df()
        assert len(got) == len(exp), how
        for c in ("k", "lv", "rv"):
            g = got[c].fillna(-1).to_numpy("float64")
            e = exp[c].fillna(-1).to_numpy("float64")
            assert (g == e).all(), (how, c)
        # int columns survive null padding as Arrow int64, not float64
        assert str(got["rv"].dtype) in ("Int64", "int64", "object") \
            or got["rv"].dtype.kind in "if"


def test_hash_join_composite_key():
    import duckdb

    rng = np.random.default_rng(23)
    L = pd.DataFrame({
        "k1": rng.integers(0, 10, 500).astype(np.int64),
        "k2": rng.choice(["x", "y", "z"], 500),
        "lv": np.arange(500, dtype=np.int64),
    })
    R = pd.DataFrame({
        "k1": rng.integers(0, 12, 300).astype(np.int64),
        "k2": rng.choice(["x", "y", "w"], 300),
        "rv": np.arange(300, dtype=np.int64),
    })
    got = rel.hash_join(mk_ds(L, 3), mk_ds(R, 2), on=["k1", "k2"]) \
        .to_pandas().sort_values(["k1", "k2", "lv", "rv"]) \
        .reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT L.k1, L.k2, lv, rv FROM L JOIN R USING (k1, k2) "
        "ORDER BY k1, k2, lv, rv").df()
    assert len(got) == len(exp)
    for c in ("k1", "k2", "lv", "rv"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_grouped_nunique_exact():
    import duckdb

    rng = np.random.default_rng(24)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 4000),
        "v": rng.integers(0, 200, 4000).astype(np.int64),
    })
    got = rel.grouped_nunique(mk_ds(df, 5), key="k", value="v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = duckdb.sql("SELECT k, count(DISTINCT v) AS n_distinct FROM df "
                     "GROUP BY k ORDER BY k").df()
    pd.testing.assert_frame_equal(
        got.astype({"n_distinct": "int64"}),
        exp.astype({"n_distinct": "int64"}), check_dtype=False)


def test_cross_join_broadcast():
    df = pd.DataFrame({"id": [1, 2, 3]})
    small = pd.DataFrame({"g": ["x", "y"]})
    got = rel.cross_join(mk_ds(df, 2), small).to_pandas() \
        .sort_values(["id", "g"]).reset_index(drop=True)
    assert len(got) == 6
    assert got["id"].tolist() == [1, 1, 2, 2, 3, 3]
    assert got["g"].tolist() == ["x", "y"] * 3


class TestWindowDist:
    def _frame(self):
        rng = np.random.default_rng(11)
        return pd.DataFrame({
            "k": rng.integers(0, 7, 400),
            "v": rng.integers(0, 25, 400),        # heavy ties on purpose
            "id": np.arange(400, dtype="int64"),
        })

    def test_matches_duckdb_window(self):
        import duckdb

        df = self._frame()
        got = rel.window_dist(mk_ds(df), by="k", order="v", tie="id",
                              n_tiles=3).to_pandas() \
            .sort_values("id").reset_index(drop=True)
        exp = duckdb.sql(
            "SELECT k, v, id, percent_rank() OVER w AS percent_rank, "
            "cume_dist() OVER w AS cume_dist, "
            "ntile(3) OVER (PARTITION BY k ORDER BY v, id) AS tile "
            "FROM df WINDOW w AS (PARTITION BY k ORDER BY v) "
            "ORDER BY id").df()
        for c in ("percent_rank", "cume_dist"):
            np.testing.assert_allclose(got[c], exp[c], rtol=0, atol=1e-12)
        assert (got["tile"].to_numpy() == exp["tile"].to_numpy()).all()

    def test_single_row_group_percent_rank_zero(self):
        df = pd.DataFrame({"k": [1], "v": [9], "id": [0]})
        got = rel.window_dist(mk_ds(df, 1), by="k", order="v",
                              tie="id").to_pandas()
        assert got["percent_rank"].iloc[0] == 0.0
        assert got["cume_dist"].iloc[0] == 1.0


class TestArgExtremum:
    def test_max_and_min_by(self):
        rng = np.random.default_rng(12)
        df = pd.DataFrame({
            "k": rng.integers(0, 9, 500),
            "score": rng.integers(0, 30, 500),   # ties across blocks
            "id": rng.permutation(500).astype("int64"),
            "payload": rng.random(500).round(4),
        })
        for mode in ("max", "min"):
            got = rel.arg_extremum(mk_ds(df, 6), key="k", order="score",
                                   tie="id", mode=mode).to_pandas() \
                .sort_values("k").reset_index(drop=True)
            exp = df.sort_values(["k", "score", "id"],
                                 ascending=[True, mode == "min", True],
                                 kind="stable") \
                .groupby("k", sort=True).head(1) \
                .sort_values("k").reset_index(drop=True)
            pd.testing.assert_frame_equal(
                got[["k", "score", "id", "payload"]],
                exp[["k", "score", "id", "payload"]])


class TestPercentileCont:
    def test_matches_numpy_linear(self):
        rng = np.random.default_rng(13)
        df = pd.DataFrame({
            "k": rng.integers(0, 5, 1000),
            "v": rng.random(1000).round(3) * 100,
        })
        qs = (0.1, 0.5, 0.9)
        got = rel.grouped_percentile_cont(
            mk_ds(df, 5), key="k", value="v", qs=qs,
            ndigits=None).to_pandas().sort_values("k") \
            .reset_index(drop=True)
        for q, name in zip(qs, ("p10", "p50", "p90")):
            exp = df.groupby("k", sort=True)["v"] \
                .apply(lambda s: np.percentile(s, q * 100)) \
                .reset_index(drop=True)
            np.testing.assert_allclose(got[name], exp, rtol=1e-12)

    def test_two_values_interpolate(self):
        df = pd.DataFrame({"k": ["a", "a"], "v": [10.0, 20.0]})
        got = rel.grouped_percentile_cont(mk_ds(df, 1), key="k",
                                          value="v", qs=(0.25,),
                                          ndigits=None).to_pandas()
        assert got["p25"].iloc[0] == 12.5


class TestUnpivot:
    def test_matches_melt(self):
        rng = np.random.default_rng(14)
        df = pd.DataFrame({
            "id": np.arange(200, dtype="int64"),
            "a": rng.random(200).round(4),
            "b": rng.integers(0, 9, 200),
            "c": rng.random(200).round(4),
        })
        got = rel.unpivot(mk_ds(df), id_cols=["id"],
                          value_cols=["a", "b", "c"]).to_pandas() \
            .sort_values(["id", "name"]).reset_index(drop=True)
        exp = df.melt(id_vars=["id"], value_vars=["a", "b", "c"]) \
            .rename(columns={"variable": "name"})
        exp["value"] = exp["value"].astype("float64")
        exp = exp.sort_values(["id", "name"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["id", "name", "value"]], exp)


class TestRollingWindows:
    def _frame(self, with_nulls=False):
        rng = np.random.default_rng(21)
        df = pd.DataFrame({
            "k": rng.integers(0, 6, 300),
            "t": rng.integers(0, 40, 300),       # order ties on purpose
            "id": np.arange(300, dtype="int64"),
            "v": (rng.random(300) * 100).round(3),
        })
        if with_nulls:
            df.loc[df.index % 7 == 0, "v"] = np.nan
        return df

    def test_rolling_agg_matches_duckdb(self):
        import duckdb

        df = self._frame(with_nulls=True)
        got = rel.rolling_agg(mk_ds(df), by="k", order="t", value="v",
                              window=4, tie="id").to_pandas() \
            .sort_values("id").reset_index(drop=True)
        exp = duckdb.sql(
            "SELECT id, round(sum(v) OVER w, 6) AS roll_sum, "
            "round(avg(v) OVER w, 6) AS roll_mean, "
            "count(v) OVER w AS roll_n FROM df "
            "WINDOW w AS (PARTITION BY k ORDER BY t, id "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) ORDER BY id").df()
        np.testing.assert_allclose(got["roll_sum"], exp["roll_sum"],
                                   atol=1e-6, equal_nan=True)
        np.testing.assert_allclose(got["roll_mean"], exp["roll_mean"],
                                   atol=1e-6, equal_nan=True)
        assert (got["roll_n"].to_numpy()
                == exp["roll_n"].to_numpy()).all()

    def test_cumulative_extrema_matches_duckdb(self):
        import duckdb

        df = self._frame()
        got = rel.cumulative_extrema(mk_ds(df), by="k", order="t",
                                     value="v", tie="id").to_pandas() \
            .sort_values("id").reset_index(drop=True)
        exp = duckdb.sql(
            "SELECT id, max(v) OVER w AS cum_max, min(v) OVER w AS "
            "cum_min FROM df WINDOW w AS (PARTITION BY k "
            "ORDER BY t, id ROWS UNBOUNDED PRECEDING) ORDER BY id").df()
        assert (got["cum_max"].to_numpy() == exp["cum_max"].to_numpy()).all()
        assert (got["cum_min"].to_numpy() == exp["cum_min"].to_numpy()).all()

    def test_first_last_value_matches_duckdb(self):
        import duckdb

        df = self._frame()
        got = rel.first_last_value(mk_ds(df), by="k", order="t",
                                   value="v", tie="id").to_pandas() \
            .sort_values("id").reset_index(drop=True)
        exp = duckdb.sql(
            "SELECT id, first_value(v) OVER w AS fv, "
            "last_value(v) OVER w AS lv FROM df "
            "WINDOW w AS (PARTITION BY k ORDER BY t, id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
            "ORDER BY id").df()
        assert (got["first_value"].to_numpy() == exp["fv"].to_numpy()).all()
        assert (got["last_value"].to_numpy() == exp["lv"].to_numpy()).all()


class TestHigherMoments:
    def test_matches_duckdb(self):
        import duckdb

        rng = np.random.default_rng(22)
        # lognormal: genuinely skewed, wide dynamic range (the
        # cancellation regime the global-shift design is for)
        df = pd.DataFrame({
            "k": rng.integers(0, 4, 5000),
            "x": np.exp(rng.normal(8, 1.2, 5000)).round(2),
        })
        got = rel.grouped_higher_moments(mk_ds(df, 6), key="k", x="x",
                                         ndigits=6).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        exp = duckdb.sql(
            "SELECT k, round(skewness(x), 6) AS skewness, "
            "round(kurtosis(x), 6) AS kurtosis FROM df "
            "GROUP BY k ORDER BY k").df()
        np.testing.assert_allclose(got["skewness"], exp["skewness"],
                                   atol=2e-6)
        np.testing.assert_allclose(got["kurtosis"], exp["kurtosis"],
                                   atol=2e-6)


class TestIntervalJoin:
    def _oracle(self, a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        x = a.merge(b, how="cross")
        x = x[(x["alo"] <= x["bhi"]) & (x["blo"] <= x["ahi"])]
        return x.sort_values(["aid", "bid"]).reset_index(drop=True)

    def _frames(self, seed, n_a=400, n_b=150, span=2000):
        rng = np.random.default_rng(seed)
        alo = rng.integers(-span, span, n_a)
        blo = rng.integers(-span, span, n_b)
        a = pd.DataFrame({"aid": np.arange(n_a, dtype="int64"),
                          "alo": alo,
                          "ahi": alo + rng.integers(0, 80, n_a)})
        b = pd.DataFrame({"bid": np.arange(n_b, dtype="int64"),
                          "blo": blo,
                          "bhi": blo + rng.integers(0, 300, n_b)})
        # zero-width + duplicate intervals on purpose
        b.loc[:4, "bhi"] = b.loc[:4, "blo"]
        b = pd.concat([b, b.iloc[:3]], ignore_index=True)
        b["bid"] = np.arange(len(b), dtype="int64")
        return a, b

    def test_property_sweep(self):
        for seed, chunk in [(31, None), (32, 7), (33, 100000), (34, 1)]:
            a, b = self._frames(seed)
            got = rel.interval_join(mk_ds(a, 5), mk_ds(b, 3),
                                    l_lo="alo", l_hi="ahi",
                                    r_lo="blo", r_hi="bhi",
                                    chunk=chunk).to_pandas() \
                .sort_values(["aid", "bid"]).reset_index(drop=True)
            exp = self._oracle(a, b)
            assert len(got) == len(exp), (seed, chunk, len(got), len(exp))
            for c in ("aid", "bid", "alo", "bhi"):
                assert (got[c].to_numpy() == exp[c].to_numpy()).all()

    def test_empty_side(self):
        a, b = self._frames(35)
        empty = b.iloc[:0]
        # empty datasets report schema() None — the explicit-schema
        # path is the documented answer
        got = rel.interval_join(
            mk_ds(a, 2), mk_ds(empty, 1),
            l_lo="alo", l_hi="ahi", r_lo="blo", r_hi="bhi", chunk=10,
            right_schema=pa.Table.from_pandas(empty,
                                              preserve_index=False).schema
        ).to_pandas()
        assert len(got) == 0


def test_asof_join_partitioned_direction_matrix():
    # forward / nearest / backward vs a per-row numpy oracle; right `t`
    # values unique per key so nearest ties cannot arise
    rng = np.random.default_rng(11)
    n_l, n_r, n_k = 400, 200, 7
    left = pd.DataFrame({
        "lid": np.arange(n_l, dtype="int64"),
        "k": rng.integers(0, n_k, n_l).astype("int64"),
        "t": rng.integers(0, 10_000, n_l).astype("int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_k, n_r).astype("int64"),
        "t": (np.arange(n_r, dtype="int64") * 37 + 5) % 9_973,
        "v": np.arange(n_r, dtype="int64") * 10,
    }).drop_duplicates(["k", "t"])

    lds = rd.from_arrow(pa.Table.from_pandas(
        left, preserve_index=False)).repartition(4)
    rds = rd.from_arrow(pa.Table.from_pandas(
        right, preserve_index=False)).repartition(3)

    for direction in ("backward", "forward", "nearest"):
        out = rel.asof_join_partitioned(
            lds, rds, on="t", by="k", num_buckets=4, how="left",
            direction=direction).to_pandas() \
            .sort_values("lid").reset_index(drop=True)
        expect = []
        for _, row in left.iterrows():
            cand = right[right["k"] == row["k"]]
            if direction == "backward":
                cand = cand[cand["t"] <= row["t"]]
                pick = cand.sort_values("t").tail(1)
            elif direction == "forward":
                cand = cand[cand["t"] >= row["t"]]
                pick = cand.sort_values("t").head(1)
            else:
                if len(cand):
                    gap = (cand["t"] - row["t"]).abs()
                    pick = cand.loc[[gap.idxmin()]] \
                        if gap.min() == gap.min() else cand.iloc[0:0]
                    # unique gaps guaranteed by distinct t per key except
                    # exact equidistance; filter those out of the assert
                    if (gap == gap.min()).sum() > 1:
                        expect.append(None)
                        continue
                else:
                    pick = cand
            expect.append(int(pick["v"].iloc[0]) if len(pick) else None)
        got = [None if pd.isna(x) else int(x) for x in out["v"]]
        checked = [(g, e) for g, e in zip(got, expect) if e is not None]
        assert all(g == e for g, e in checked), direction
        assert len(checked) > 250


def test_asof_join_partitioned_bad_direction():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rel.asof_join_partitioned(None, None, on="t", by="k",
                                  direction="sideways")


def test_table_diff_classes_and_null_safety():
    left = pd.DataFrame({
        "k": np.array([1, 2, 3, 4, 5], dtype="int64"),
        "v": [10.0, 20.0, None, 40.0, None],
    })
    right = pd.DataFrame({
        "k": np.array([1, 2, 4, 5, 6], dtype="int64"),   # 3 removed, 6 added
        "v": [10.0, 25.0, 40.0, None, 60.0],             # 2 changed
    })
    lds = rd.from_arrow(pa.Table.from_pandas(
        left, preserve_index=False)).repartition(2)
    rds = rd.from_arrow(pa.Table.from_pandas(
        right, preserve_index=False)).repartition(2)
    out = rel.table_diff(lds, rds, key="k", compare=["v"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    got = dict(zip(out["k"], out["change"]))
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "unchanged", 5: "unchanged", 6: "added"}


def test_table_diff_composite_key():
    left = pd.DataFrame({"k1": [1, 1, 2], "k2": ["a", "b", "a"],
                         "v": [1, 2, 3]}).astype({"k1": "int64",
                                                  "v": "int64"})
    right = pd.DataFrame({"k1": [1, 2, 2], "k2": ["a", "a", "b"],
                          "v": [9, 3, 7]}).astype({"k1": "int64",
                                                   "v": "int64"})
    out = rel.table_diff(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
        key=["k1", "k2"], compare=["v"]).to_pandas()
    got = {(r.k1, r.k2): r.change for r in out.itertuples()}
    assert got == {(1, "a"): "changed", (1, "b"): "removed",
                   (2, "a"): "unchanged", (2, "b"): "added"}


def test_funnel_strict_ordering():
    ts = pd.to_datetime
    df = pd.DataFrame([
        # user 1: full funnel in order
        (1, ts("2024-01-01"), "signup"),
        (1, ts("2024-01-02"), "click"),
        (1, ts("2024-01-03"), "purchase"),
        # user 2: click BEFORE signup -> only step 1
        (2, ts("2024-01-02"), "click"),
        (2, ts("2024-01-03"), "signup"),
        # user 3: click at the SAME instant as signup -> strict > fails
        (3, ts("2024-01-01"), "signup"),
        (3, ts("2024-01-01"), "click"),
        # user 4: no signup at all -> 0
        (4, ts("2024-01-01"), "purchase"),
        # user 5: signup, purchase skips click -> 1
        (5, ts("2024-01-01"), "signup"),
        (5, ts("2024-01-05"), "purchase"),
    ], columns=["user_id", "ts", "event_type"])
    df["user_id"] = df["user_id"].astype("int64")
    ds = rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(3)
    out = rel.funnel(ds, steps=["signup", "click", "purchase"]) \
        .to_pandas().set_index("user_id")["steps_completed"]
    assert out.to_dict() == {1: 3, 2: 1, 3: 1, 4: 0, 5: 1}


def test_mixture_sample_rates_and_consistency():
    df = pd.DataFrame({
        "doc_id": np.arange(10000, dtype="int64"),
        "source": np.tile(["a", "b", "c", "d"], 2500),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(4)
    rates = {"a": 1.0, "b": 0.5, "c": 0.0}
    out = rel.mixture_sample(ds, "source", "doc_id", rates,
                             default=0.2).to_pandas()
    frac = out.groupby("source").size() / 2500
    assert frac.get("a", 0) == 1.0            # rate 1.0 keeps everything
    assert "c" not in frac.index              # rate 0.0 keeps nothing
    assert abs(frac["b"] - 0.5) < 0.05        # ~hash-uniform
    assert abs(frac["d"] - 0.2) < 0.05        # default rate applies
    # consistency: raising b's rate only ADDS b-rows; a/d survivors fixed
    out2 = rel.mixture_sample(ds, "source", "doc_id",
                              {**rates, "b": 0.8}, default=0.2).to_pandas()
    s1 = set(out.loc[out["source"] == "b", "doc_id"])
    s2 = set(out2.loc[out2["source"] == "b", "doc_id"])
    assert s1 <= s2 and len(s2) > len(s1)
    for g in ("a", "d"):
        assert set(out.loc[out["source"] == g, "doc_id"]) == \
            set(out2.loc[out2["source"] == g, "doc_id"])


def test_grouped_regression_matches_numpy_and_degenerate_x():
    rng = np.random.default_rng(8)
    n = 600
    g = np.repeat(["a", "b", "c"], n // 3)
    x = rng.normal(10, 3, n)
    y = 2.5 * x + rng.normal(0, 1, n) + np.where(g == "b", 7, 0)
    x[g == "c"] = 4.0  # zero x-variance group: slope/r2 null
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    ds = rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(5)
    out = rel.grouped_regression(ds, keys=["g"], x="x", y="y",
                                 num_partitions=4) \
        .to_pandas().set_index("g").sort_index()
    for grp in ("a", "b"):
        sub = df[df["g"] == grp]
        cov = np.cov(sub["x"], sub["y"], bias=True)
        slope = cov[0, 1] / cov[0, 0]
        inter = sub["y"].mean() - slope * sub["x"].mean()
        r2 = np.corrcoef(sub["x"], sub["y"])[0, 1] ** 2
        assert abs(out.loc[grp, "slope"] - slope) < 1e-5
        assert abs(out.loc[grp, "intercept"] - inter) < 1e-5
        assert abs(out.loc[grp, "r2"] - r2) < 1e-5
    assert pd.isna(out.loc["c", "slope"]) and pd.isna(out.loc["c", "r2"])


def test_mixture_sample_rejects_out_of_range_keys():
    import pytest

    df = pd.DataFrame({
        "doc_id": np.array([-5, 10, 20], dtype="int64"),
        "source": ["a", "a", "a"],
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    with pytest.raises(Exception) as ei:
        rel.mixture_sample(ds, "source", "doc_id", {"a": 0.5}).to_pandas()
    assert "2^32" in str(ei.value) or "wrap" in str(ei.value)

    df2 = pd.DataFrame({
        "doc_id": np.array([1, 2 ** 33], dtype="int64"),
        "source": ["a", "a"],
    })
    ds2 = rd.from_arrow(pa.Table.from_pandas(df2, preserve_index=False))
    with pytest.raises(Exception):
        rel.mixture_sample(ds2, "source", "doc_id", {"a": 0.5}).to_pandas()

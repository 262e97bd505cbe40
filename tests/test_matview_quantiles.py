"""MaterializedQuantiles (state/matview.py): exact grouped
percentile_cont maintained per commit via signed per-(group, value)
support counts — no rescan path exists, so the view must equal a numpy
linear-interpolation oracle after EVERY commit purely by folding:
value moves, last-supporter deletes, duplicate values, nulls (never in
a quantile, still live), even/odd counts, multi-q, MOR chains."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chomper_ray.state.lake import LakeTable
from chomper_ray.state.matview import MaterializedQuantiles


def mk(op, seq, url, ts, grp, val):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"), "grp": grp,
            "val": val}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def make_view(lake, root, qs=(0.5, 0.9)):
    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        return df[["grp", "val"]].copy()

    return MaterializedQuantiles(lake, root, contrib,
                                 group_cols=["grp"], value_col="val",
                                 qs=qs, read_columns=["grp", "val"])


def oracle(lake, qs=(0.5, 0.9)) -> pd.DataFrame:
    live = lake.read_pandas()
    rows = []
    for grp, g in live.groupby("grp"):
        row = {"grp": grp, "n_live": len(g)}
        vals = g["val"].dropna().to_numpy(dtype=float)
        for q in qs:
            c = "p" + f"{q * 100:g}".replace(".", "_")
            row[c] = (float(np.percentile(vals, q * 100,
                                          method="linear"))
                      if len(vals) else np.nan)
        rows.append(row)
    return pd.DataFrame(rows).sort_values("grp").reset_index(drop=True)


def assert_ok(view, lake, qs=(0.5, 0.9)):
    got = view.view().sort_values("grp").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[oracle(lake, qs).columns], oracle(lake, qs),
        check_dtype=False)


def test_quantiles_track_every_commit(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    view = make_view(lake, tmp_path / "mv")

    # odd count, duplicates, two groups
    commit(lake, [mk("insert", 0, "u1", 10, "a", 10),
                  mk("insert", 1, "u2", 10, "a", 20),
                  mk("insert", 2, "u3", 10, "a", 20),
                  mk("insert", 3, "u4", 10, "b", 5)], 0)
    view.refresh()
    assert_ok(view, lake)

    # even count => interpolation between two support rows
    commit(lake, [mk("insert", 4, "u5", 20, "a", 40)], 1)
    view.refresh()
    assert_ok(view, lake)
    v = view.view()
    assert float(v[v["grp"] == "a"]["p50"].iloc[0]) == 20.0

    # value move: u1 10 -> 35 (old support -1, new +1)
    commit(lake, [mk("update", 5, "u1", 30, "a", 35)], 2)
    view.refresh()
    assert_ok(view, lake)

    # last-supporter delete + null value arrives (never in a quantile,
    # still counted live)
    commit(lake, [mk("delete", 6, "u4", 40, "b", None),
                  mk("insert", 7, "u6", 40, "a", None)], 3)
    view.refresh()
    assert_ok(view, lake)
    v = view.view()
    assert set(v["grp"]) == {"a"}
    assert int(v["n_live"].iloc[0]) == len(lake.read_pandas())


def test_quantiles_all_null_group_and_extremes(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    view = make_view(lake, tmp_path / "mv", qs=(0.0, 0.25, 1.0))
    commit(lake, [mk("insert", 0, "u1", 10, "a", 3),
                  mk("insert", 1, "u2", 10, "a", 9),
                  mk("insert", 2, "u3", 10, "n", None)], 0)
    v = view.refresh()
    a = v[v["grp"] == "a"].iloc[0]
    assert (a["p0"], a["p25"], a["p100"]) == (3.0, 4.5, 9.0)
    n = v[v["grp"] == "n"].iloc[0]
    assert np.isnan(n["p0"]) and int(n["n_live"]) == 1


def test_quantiles_mor_chain_and_resume(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     merge_on_read=True, collect_changes=False)
    view = make_view(lake, tmp_path / "mv")
    commit(lake, [mk("insert", i, f"u{i}", 10, "a", 10 * i)
                  for i in range(5)], 0)
    commit(lake, [mk("update", 10, "u0", 20, "a", 100),
                  mk("delete", 11, "u4", 20, "a", None)], 1)
    view.refresh()
    assert_ok(view, lake)
    # compaction folds a zero delta: view unchanged
    before = view.view()
    lake.compact_deltas()
    view.refresh()
    pd.testing.assert_frame_equal(view.view(), before)
    # a second instance resumes from the view files alone
    again = make_view(lake, tmp_path / "mv")
    pd.testing.assert_frame_equal(again.refresh(), before)


def test_quantiles_rejects_bad_q(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    with pytest.raises(ValueError):
        make_view(lake, tmp_path / "mv", qs=(0.5, 1.5))

"""MaterializedExtrema (state/matview.py): grouped MIN/MAX maintained
per commit with affected-group rescan — must equal a full recompute
from live state after EVERY commit, across raises, lowers, deletes of
the extremum (unique and tied), all-null groups, string and timestamp
value columns, truncate, and merge-on-read chains."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from chomper_ray.state.lake import LakeTable
from chomper_ray.state.matview import MaterializedExtrema


def mk(op, seq, url, ts, grp, val, label=None):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"), "grp": grp,
            "val": val, "label": label}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def make_contrib():
    # nested def: pickled by VALUE into Ray workers (a module-level
    # function in a test file would pickle by reference and fail import)
    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        return df[["grp", "val", "label", "warc_ts"]].copy()

    return contrib


def make_view(lake, root):
    return MaterializedExtrema(
        lake, root, make_contrib(), group_cols=["grp"],
        max_cols=["val", "warc_ts"], min_cols=["val", "label"],
        read_columns=["grp", "val", "label", "warc_ts"])


def recompute(lake) -> pd.DataFrame:
    live = lake.read_pandas()
    if not len(live):
        return pd.DataFrame(columns=["grp", "n_live", "max_val",
                                     "max_warc_ts", "min_val",
                                     "min_label"])
    # per-column dropna before the extremum: pandas object-dtype min
    # breaks on mixed NaN/str groups (same workaround as the engine)
    g = live.groupby("grp", dropna=False).size().rename("n_live") \
        .reset_index()
    for name, src, how in [("max_val", "val", "max"),
                           ("max_warc_ts", "warc_ts", "max"),
                           ("min_val", "val", "min"),
                           ("min_label", "label", "min")]:
        s = live.dropna(subset=[src])
        e = s.groupby("grp", dropna=False)[src].agg(how) \
            .rename(name).reset_index()
        g = g.merge(e, on="grp", how="left")
    return g.sort_values("grp").reset_index(drop=True)


def _norm_nulls(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].where(~df[c].isna(), np.nan)
    return df


def assert_view_ok(view_df, lake):
    got = view_df.sort_values("grp").reset_index(drop=True)
    want = recompute(lake)
    pd.testing.assert_frame_equal(
        _norm_nulls(got[want.columns]), _norm_nulls(want),
        check_dtype=False)


def test_extrema_tracks_every_commit(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    view = make_view(lake, tmp_path / "mx")

    # e0: base — g=a max holder u2(9.0), tie in g=b (u3,u4 at 5.0)
    e0 = [mk("insert", 0, "u1", 10, "a", 3.0, "mm"),
          mk("insert", 1, "u2", 11, "a", 9.0, "zz"),
          mk("insert", 2, "u3", 12, "b", 5.0, "aa"),
          mk("insert", 3, "u4", 13, "b", 5.0, "bb"),
          mk("insert", 4, "u5", 14, "c", None, None)]  # all-null group
    # e1: raise a's max (no rescan needed), insert into c
    e1 = [mk("update", 5, "u1", 20, "a", 11.0, "aa"),
          mk("insert", 6, "u6", 21, "c", 2.0, "cc")]
    # e2: LOWER the unique max holder of a -> rescan a
    e2 = [mk("update", 7, "u1", 30, "a", 1.0, "aa")]
    # e3: delete ONE of b's tied max rows (max must stay 5.0) and the
    # actual max holder of a -> rescans, one of them value-preserving
    e3 = [mk("delete", 8, "u3", 40, None, None, None),
          mk("delete", 9, "u2", 41, None, None, None)]
    # e4: delete the last row of c -> group disappears
    e4 = [mk("delete", 10, "u5", 50, None, None, None),
          mk("delete", 11, "u6", 51, None, None, None)]
    for i, ev in enumerate([e0, e1, e2, e3, e4]):
        commit(lake, ev, i)
        assert_view_ok(view.refresh(), lake)
    # rescans happened where they must: e2 (a's max lowered) and e3
    # (extremum holders deleted). e1 ALSO rescans — it raises a's MAX
    # (no rescan for max) but u1 held a's MIN (3.0 -> 11.0 raises the
    # minimum, which only the data can re-derive). The no-rescan
    # economy case is pinned by the bounded-cost test below.
    rescanned = {cid for cid, _ in view.last_rescans}
    assert 2 in rescanned and 3 in rescanned
    # groups: c vanished
    assert set(view.view()["grp"]) == {"a", "b"}

    # truncate empties the view
    lake.truncate()
    assert len(view.refresh()) == 0


def test_extrema_resume_and_idempotent(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    view = make_view(lake, tmp_path / "mx")
    commit(lake, [mk("insert", 0, "u1", 10, "a", 1.0, "x")], 0)
    commit(lake, [mk("update", 1, "u1", 20, "a", 0.5, "x")], 1)
    view.refresh()
    before = view.view()
    # a second view instance resumes from storage and applies nothing
    v2 = make_view(lake, tmp_path / "mx")
    pd.testing.assert_frame_equal(v2.refresh(), before)
    assert v2.last_rescans == []


def test_extrema_mor_chain_and_compaction(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     merge_on_read=True, collect_changes=False)
    view = make_view(lake, tmp_path / "mx")
    commit(lake, [mk("insert", 0, "u1", 10, "a", 3.0, "mm"),
                  mk("insert", 1, "u2", 11, "a", 9.0, "zz"),
                  mk("insert", 2, "u3", 12, "b", 4.0, "aa")], 0)
    assert_view_ok(view.refresh(), lake)
    # delete the max holder at a delta-bearing head -> rescan runs over
    # RESOLVED state (materialize_mor_resolved under the hood)
    commit(lake, [mk("delete", 3, "u2", 20, None, None, None)], 1)
    assert_view_ok(view.refresh(), lake)
    assert any(cid == 1 for cid, _ in view.last_rescans)
    before = view.view()
    lake.compact_deltas()
    pd.testing.assert_frame_equal(
        view.refresh().reset_index(drop=True),
        before.reset_index(drop=True))
    # and further MOR commits keep folding
    commit(lake, [mk("update", 4, "u1", 30, "a", 99.0, "aa")], 2)
    assert_view_ok(view.refresh(), lake)


def test_extrema_rescan_cost_bounded_by_touched_groups(tmp_path,
                                                       ray_session):
    """Only the groups whose extremum was touched rescan — a commit
    touching one group of many triggers exactly one rescan group."""
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    view = MaterializedExtrema(lake, tmp_path / "mx", make_contrib(),
                               group_cols=["grp"], max_cols=["val"],
                               read_columns=["grp", "val", "label",
                                             "warc_ts"])
    rows = [mk("insert", i, f"u{i}", 10, f"g{i % 20}",
               float(i), "x") for i in range(200)]
    commit(lake, rows, 0)
    view.refresh()
    # u199 holds g19's max (val=199.0); lower it
    commit(lake, [mk("update", 500, "u199", 20, "g19", -1.0, "x")], 1)
    view.refresh()
    assert view.last_rescans == [(1, 1)]
    got = view.view().sort_values("grp").reset_index(drop=True)
    live = lake.read_pandas()
    want = live.groupby("grp").agg(
        n_live=("grp", "size"), max_val=("val", "max")).reset_index() \
        .sort_values("grp").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["grp", "n_live", "max_val"]],
                                  want, check_dtype=False)

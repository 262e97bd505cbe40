"""MaterializedSessions (state/matview.py): gap-based session windows
maintained per commit with affected-group rescan — must equal a full
recompute from live state after EVERY commit, across session EXTEND
(a new event within the gap), SPLIT (deleting a bridging event),
MERGE (inserting a bridging event), LWW timestamp moves, group
disappearance, truncate, and merge-on-read chains. Rescan cost is
pinned to the touched groups (COW partition rewrites must NOT rescan
co-located untouched groups — the fingerprint-cancellation property).
"""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from chomper_ray.state.lake import LakeTable
from chomper_ray.state.matview import MaterializedSessions

GAP = 300.0


def mk(op, seq, url, ts, grp=None):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"), "grp": grp}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def make_contrib():
    # nested def: pickled by VALUE into Ray workers (a module-level
    # function in a test file would pickle by reference and fail import)
    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        return df[["grp", "warc_ts", "url"]].copy()

    return contrib


def make_view(lake, root, gap=GAP):
    return MaterializedSessions(
        lake, root, make_contrib(), group_col="grp", ts_col="warc_ts",
        tie_col="url", gap_s=gap, read_columns=["grp", "warc_ts", "url"])


def recompute(lake, gap=GAP) -> pd.DataFrame:
    live = lake.read_pandas()
    cols = ["grp", "session_id", "session_start", "session_end",
            "n_events"]
    if not len(live):
        return pd.DataFrame(columns=cols)
    out = []
    for g, rows in live.groupby("grp", dropna=False, sort=True):
        rows = rows.sort_values(["warc_ts", "url"], kind="stable")
        gaps = rows["warc_ts"].diff().dt.total_seconds()
        sid = ((gaps > gap) | gaps.isna()).cumsum()
        agg = rows.groupby(sid).agg(
            session_start=("warc_ts", "min"),
            session_end=("warc_ts", "max"),
            n_events=("warc_ts", "size")).reset_index(drop=True)
        agg.insert(0, "session_id",
                   pd.RangeIndex(1, len(agg) + 1).astype("int64"))
        agg.insert(0, "grp", g)
        out.append(agg)
    df = pd.concat(out, ignore_index=True)
    df["n_events"] = df["n_events"].astype("int64")
    return df[cols]


def assert_view_ok(view_df, lake, gap=GAP):
    got = view_df.sort_values(["grp", "session_id"], kind="stable") \
        .reset_index(drop=True)
    want = recompute(lake, gap)
    pd.testing.assert_frame_equal(got[want.columns], want,
                                  check_dtype=False)


def test_sessions_tracks_every_commit(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    view = make_view(lake, tmp_path / "ms")

    # e0: a has two sessions ([0,100] and [1000,1100]); b one session
    e0 = [mk("insert", 0, "u1", 0, "a"),
          mk("insert", 1, "u2", 100, "a"),
          mk("insert", 2, "u3", 1000, "a"),
          mk("insert", 3, "u4", 1100, "a"),
          mk("insert", 4, "u5", 5000, "b"),
          mk("insert", 5, "u6", 5100, "b")]
    # e1: EXTEND a's first session (gap 200 <= 300) and open a new one
    e1 = [mk("insert", 6, "u7", 300, "a"),
          mk("insert", 7, "u8", 9000, "b")]
    # e2: MERGE a's two sessions with bridging events
    #     (300->580->860->1000 all gaps <= 300)
    e2 = [mk("insert", 8, "u9", 580, "a"),
          mk("insert", 9, "u10", 860, "a")]
    # e3: SPLIT them again by deleting one bridge; LWW-move another
    #     (u9's refetch shifts it out of the bridge position — note the
    #     new warc_ts must rise for last-write-wins to take it)
    e3 = [mk("delete", 10, "u10", 2000, None),
          mk("update", 11, "u9", 6000, "a")]
    # e4: delete all of b -> group disappears
    e4 = [mk("delete", 12, "u5", 9500, None),
          mk("delete", 13, "u6", 9501, None),
          mk("delete", 14, "u8", 9502, None)]
    for i, ev in enumerate([e0, e1, e2, e3, e4]):
        commit(lake, ev, i)
        assert_view_ok(view.refresh(), lake)
    assert set(view.view()["grp"]) == {"a"}

    # truncate empties the view
    lake.truncate()
    assert len(view.refresh()) == 0


def test_sessions_resume_and_idempotent(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    view = make_view(lake, tmp_path / "ms")
    commit(lake, [mk("insert", 0, "u1", 0, "a"),
                  mk("insert", 1, "u2", 100, "a")], 0)
    commit(lake, [mk("update", 2, "u1", 700, "a")], 1)
    view.refresh()
    before = view.view()
    # a second view instance resumes from storage and applies nothing
    v2 = make_view(lake, tmp_path / "ms")
    pd.testing.assert_frame_equal(v2.refresh(), before)
    assert v2.last_rescans == []


def test_sessions_rescan_cost_bounded_by_touched_groups(tmp_path,
                                                        ray_session):
    """A commit touching one group rescans exactly that group, even
    though the COW partition rewrite carries co-located groups on both
    diff sides — their (ts, tie) fingerprints cancel exactly."""
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    view = make_view(lake, tmp_path / "ms")
    rows = [mk("insert", i, f"u{i}", 100 * i, f"g{i % 20}")
            for i in range(200)]
    commit(lake, rows, 0)
    view.refresh()
    # touch one url in one group (LWW move: ts must rise)
    commit(lake, [mk("update", 500, "u199", 100 * 200, "g19")], 1)
    assert_view_ok(view.refresh(), lake)
    assert view.last_rescans[-1] == (1, 1)
    # and an untouched group's rows carried forward byte-equal
    v = view.view()
    assert (v[v["grp"] == "g0"]["n_events"].sum()
            == len([r for r in rows if r["grp"] == "g0"]))


def test_sessions_mor_chain_and_compaction(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     merge_on_read=True, collect_changes=False)
    view = make_view(lake, tmp_path / "ms")
    commit(lake, [mk("insert", 0, "u1", 0, "a"),
                  mk("insert", 1, "u2", 100, "a"),
                  mk("insert", 2, "u3", 1000, "a")], 0)
    assert_view_ok(view.refresh(), lake)
    # session split at a delta-bearing head: delete the first session's
    # second event (rescan resolves MOR state under the hood)
    commit(lake, [mk("delete", 3, "u2", 2000, None)], 1)
    assert_view_ok(view.refresh(), lake)
    assert any(cid == 1 for cid, _ in view.last_rescans)
    before = view.view()
    lake.compact_deltas()
    pd.testing.assert_frame_equal(
        view.refresh().reset_index(drop=True),
        before.reset_index(drop=True))
    # further MOR commits keep folding
    commit(lake, [mk("insert", 4, "u4", 1200, "a")], 2)
    assert_view_ok(view.refresh(), lake)

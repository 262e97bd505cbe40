"""MaterializedTopK (state/matview.py): per-group top-k ROWS
maintained per commit with under-fill rescan — must equal the SQL
ROW_NUMBER() oracle after EVERY commit, across entries from below,
evictions, deletes of ranked rows (incl. at ties), value updates in
both directions, groups smaller than k, and merge-on-read chains."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from chomper_ray.state.lake import LakeTable
from chomper_ray.state.matview import MaterializedTopK

K = 3


def mk(op, seq, url, ts, grp, score):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"), "grp": grp,
            "score": score}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def make_view(lake, root, k=K, ascending=False):
    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        return df[["grp", "url", "score"]].copy()

    return MaterializedTopK(lake, root, contrib, group_cols=["grp"],
                            value_col="score", k=k, ascending=ascending,
                            read_columns=["grp", "url", "score"])


def oracle(lake, k=K, ascending=False) -> pd.DataFrame:
    live = lake.read_pandas().dropna(subset=["score"])
    if not len(live):
        return pd.DataFrame(columns=["grp", "url", "score", "rank"])
    live = live.sort_values(["grp", "score", "url"],
                            ascending=[True, ascending, True],
                            kind="stable")
    live = live.copy()
    live["rank"] = live.groupby("grp").cumcount() + 1
    out = live[live["rank"] <= k][["grp", "url", "score", "rank"]]
    return out.sort_values(["grp", "rank"]).reset_index(drop=True)


def assert_topk_ok(view, lake, k=K, ascending=False):
    got = view.view().sort_values(["grp", "rank"]).reset_index(drop=True)
    got["rank"] = got["rank"].astype("int64")
    pd.testing.assert_frame_equal(got, oracle(lake, k, ascending),
                                  check_dtype=False)


def test_topk_tracks_every_commit(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    view = make_view(lake, tmp_path / "tk")

    # e0: group a has 5 rows (top-3 = u4,u3,u2), b has 2 (< k)
    e0 = [mk("insert", i, f"u{i}", 10, "a", float(i)) for i in range(5)]
    e0 += [mk("insert", 10, "v1", 10, "b", 1.0),
           mk("insert", 11, "v2", 10, "b", 2.0)]
    # e1: entry from below (u0 -> 99, evicts u2); b gains a 3rd row
    e1 = [mk("update", 20, "u0", 20, "a", 99.0),
          mk("insert", 21, "v3", 20, "b", 0.5)]
    # e2: delete a ranked row -> under-fill -> rescan pulls u2 back
    e2 = [mk("delete", 30, "u3", 30, None, None)]
    # e3: lower a ranked row's value below the cut -> rescan
    e3 = [mk("update", 40, "u4", 40, "a", -5.0)]
    # e4: touch an UNRANKED row without entering -> pure fold
    e4 = [mk("update", 50, "u1", 50, "a", 1.5)]
    for i, ev in enumerate([e0, e1, e2, e3, e4]):
        commit(lake, ev, i)
        view.refresh()
        assert_topk_ok(view, lake)
    rescanned = {cid for cid, _ in view.last_rescans}
    assert 2 in rescanned and 3 in rescanned
    # e1 (entry from below) and e4 (irrelevant touch) fold exactly
    assert 1 not in rescanned and 4 not in rescanned

    lake.truncate()
    assert len(view.refresh()) == 0


def test_topk_ascending_bottom_k(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    view = make_view(lake, tmp_path / "tk", ascending=True)
    commit(lake, [mk("insert", i, f"u{i}", 10, "a", float(i))
                  for i in range(6)], 0)
    view.refresh()
    assert_topk_ok(view, lake, ascending=True)
    # delete the global minimum (rank 1) -> rescan refills from above
    commit(lake, [mk("delete", 10, "u0", 20, None, None)], 1)
    view.refresh()
    assert_topk_ok(view, lake, ascending=True)


def test_topk_tie_at_cut_and_nulls(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    view = make_view(lake, tmp_path / "tk")
    # four rows tied at 5.0 -> cut inside the tie (key-ordered);
    # one null-score row never ranks
    commit(lake, [mk("insert", 0, "w1", 10, "a", 5.0),
                  mk("insert", 1, "w2", 10, "a", 5.0),
                  mk("insert", 2, "w3", 10, "a", 5.0),
                  mk("insert", 3, "w4", 10, "a", 5.0),
                  mk("insert", 4, "w5", 10, "a", None)], 0)
    view.refresh()
    assert_topk_ok(view, lake)
    assert list(view.view()["url"]) == ["w1", "w2", "w3"]
    # delete a RANKED tied row -> w4 (outside, same value) must enter;
    # only a rescan can know it exists
    commit(lake, [mk("delete", 10, "w2", 20, None, None)], 1)
    view.refresh()
    assert_topk_ok(view, lake)
    assert list(view.view()["url"]) == ["w1", "w3", "w4"]
    assert view.last_rescans and view.last_rescans[-1][0] == 1


def test_topk_mor_chain_and_compaction(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     merge_on_read=True, collect_changes=False)
    view = make_view(lake, tmp_path / "tk")
    commit(lake, [mk("insert", i, f"u{i}", 10, "a", float(i))
                  for i in range(5)], 0)
    view.refresh()
    assert_topk_ok(view, lake)
    # delete the rank-1 row at a delta-bearing head -> rescan over
    # resolved state
    commit(lake, [mk("delete", 10, "u4", 20, None, None)], 1)
    view.refresh()
    assert_topk_ok(view, lake)
    before = view.view()
    lake.compact_deltas()
    pd.testing.assert_frame_equal(view.refresh(), before)
    commit(lake, [mk("insert", 20, "u9", 30, "a", 50.0)], 2)
    view.refresh()
    assert_topk_ok(view, lake)


def test_topk_resume_and_idempotent(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    view = make_view(lake, tmp_path / "tk")
    commit(lake, [mk("insert", i, f"u{i}", 10, "a", float(i))
                  for i in range(4)], 0)
    commit(lake, [mk("delete", 10, "u3", 20, None, None)], 1)
    view.refresh()
    before = view.view()
    v2 = make_view(lake, tmp_path / "tk")
    pd.testing.assert_frame_equal(v2.refresh(), before)
    assert v2.last_rescans == []

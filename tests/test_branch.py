"""LakeTable.branch (zero-copy hardlink fork): the branch reads
identically at the fork point, diverges independently under new
commits, survives GC on either side (hardlinks, never shared mutable
state), forks the binlog cursor, and presents derived consumers the
amputated-history signal so first builds route to full recompute."""

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chomper_ray.state.lake import LakeTable, committed_epochs


def mk(op, seq, url, ts, lang, text):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"),
            "lang": lang, "text": text}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def seed(tmp_path, **kw):
    lake = LakeTable(tmp_path / "src", key="url", num_partitions=3,
                     collect_changes=False, **kw)
    commit(lake, [mk("insert", 0, "a", 10, "en", "x"),
                  mk("insert", 1, "b", 10, "de", "y")], 0)
    commit(lake, [mk("update", 10, "a", 20, "en", "x2"),
                  mk("insert", 11, "c", 20, "fr", "z")], 1)
    return lake


def test_branch_reads_equal_and_zero_copy(tmp_path, ray_session):
    src = seed(tmp_path)
    br = src.branch(tmp_path / "fork")
    a = src.read_pandas().sort_values("url").reset_index(drop=True)
    b = br.read_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert src.snapshot_hash() == br.snapshot_hash()
    # zero copy: the branch's data files are hardlinks (nlink >= 2)
    files = br.files()
    assert files and all(os.stat(f).st_nlink >= 2 for f in files)
    with pytest.raises(ValueError):
        src.branch(tmp_path / "fork")  # occupied


def test_branch_diverges_independently(tmp_path, ray_session):
    src = seed(tmp_path)
    br = src.branch(tmp_path / "fork")
    # cursor forked: the branch resumes the log AFTER the fork point
    assert br.last_applied_log_epoch() == src.last_applied_log_epoch()
    commit(br, [mk("delete", 20, "a", 30, None, None),
                mk("insert", 21, "d", 30, "it", "w")], 2)
    assert sorted(br.read_pandas()["url"]) == ["b", "c", "d"]
    assert sorted(src.read_pandas()["url"]) == ["a", "b", "c"]
    # GC the branch hard — the source's bytes must be untouched
    br.compact(keep_epochs=1)
    assert src.fsck()["ok"]
    assert sorted(src.read_pandas()["url"]) == ["a", "b", "c"]
    # and the reverse: GC the source, branch unaffected
    src.compact(keep_epochs=1)
    assert br.fsck()["ok"]
    assert sorted(br.read_pandas()["url"]) == ["b", "c", "d"]


def test_branch_as_of_epoch(tmp_path, ray_session):
    src = seed(tmp_path)
    br = src.branch(tmp_path / "fork0", as_of_epoch=0)
    got = br.read_pandas()
    assert sorted(got["url"]) == ["a", "b"]
    assert got.set_index("url")["text"]["a"] == "x"  # pre-update


def test_branch_mor_pending_deltas(tmp_path, ray_session):
    src = seed(tmp_path, merge_on_read=True)
    br = src.branch(tmp_path / "fork")
    a = src.read_pandas().sort_values("url").reset_index(drop=True)
    b = br.read_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    br.compact_deltas()  # folds on the branch only
    assert src.delta_chain_lengths()  # source still pending
    assert not br.delta_chain_lengths()
    pd.testing.assert_frame_equal(
        a, br.read_pandas().sort_values("url").reset_index(drop=True))


def test_matview_first_build_on_branch_full_recomputes(tmp_path,
                                                       ray_session):
    from chomper_ray.state.matview import MaterializedAgg

    src = seed(tmp_path)
    br = src.branch(tmp_path / "fork")

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": df["lang"],
            "n_chars": df["text"].fillna("").str.len().astype("int64"),
        })

    view = MaterializedAgg(br, tmp_path / "mv", contrib,
                           group_cols=["lang"], value_cols=["n_chars"],
                           read_columns=["lang", "text"])
    got = view.refresh().sort_values("lang").reset_index(drop=True)
    live = br.read_pandas()
    exp = contrib(live).groupby("lang", as_index=False).agg(
        sum_n_chars=("n_chars", "sum"), n_live=("lang", "size"))
    exp = exp.sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["lang", "sum_n_chars", "n_live"]], exp, check_dtype=False)


def test_branch_then_new_commits_single_manifest(tmp_path, ray_session):
    src = seed(tmp_path)
    br = src.branch(tmp_path / "fork")
    assert committed_epochs(br.root) == [1]  # fork point only
    commit(br, [mk("update", 30, "b", 40, "de", "neu")], 2)
    assert committed_epochs(br.root) == [1, 2]
    assert br.read_pandas().set_index("url")["text"]["b"] == "neu"

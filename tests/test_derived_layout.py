"""Incrementally maintained derived bucketed layouts (state/derived.py):
the layout must equal a from-scratch write_partitioned of the projected
live lake state after EVERY commit, rewriting only changed partitions."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from chomper_ray.state.derived import LakeBucketLayout
from chomper_ray.state.lake import LakeTable
from chomper_ray.state.output import (bucket_join, bucket_lookup,
                                      read_partitioned, write_partitioned)


def mk(op, seq, url, ts, text):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"), "text": text}


def make_proj():
    # nested def: pickled by VALUE into Ray workers (a module-level
    # function in a test file would pickle by reference and fail import)
    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "url": df["url"],
            "n_tokens": df["text"].fillna("").str.split(" ").str.len()
            .astype("int64")})
    return proj


proj = make_proj()


def layout_df(root) -> pd.DataFrame:
    return read_partitioned(root).to_pandas() \
        .sort_values("url").reset_index(drop=True)


def expected_df(lake) -> pd.DataFrame:
    live = lake.read_pandas()
    if not len(live):
        return pd.DataFrame({"url": pd.Series(dtype=object),
                             "n_tokens": pd.Series(dtype="int64")})
    return proj(live).sort_values("url").reset_index(drop=True)


def test_layout_tracks_commits_and_rewrites_only_touched(
        tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4)
    lay = LakeBucketLayout(lake, tmp_path / "lay", transform=make_proj(),
                           columns=["text"])

    e0 = [mk("insert", i, f"u{i}", 10, f"w{i} common text")
          for i in range(40)]
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(e0)), 0)
    r0 = lay.refresh()
    assert sorted(r0["rewritten"]) == sorted(r0["rewritten"])
    pd.testing.assert_frame_equal(layout_df(tmp_path / "lay"),
                                  expected_df(lake), check_dtype=False)
    n_first = len(r0["rewritten"])

    # single-url update: only that url's partition rewrites
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("update", 100, "u7", 20, "brand new words here")])), 1)
    r1 = lay.refresh()
    assert len(r1["rewritten"]) == 1 and len(r1["rewritten"]) < n_first
    pd.testing.assert_frame_equal(layout_df(tmp_path / "lay"),
                                  expected_df(lake), check_dtype=False)

    # delete + insert in one commit
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("delete", 101, "u3", 30, None),
         mk("insert", 102, "u99", 30, "fresh")])), 2)
    lay.refresh()
    pd.testing.assert_frame_equal(layout_df(tmp_path / "lay"),
                                  expected_df(lake), check_dtype=False)

    # idempotent: head unchanged -> no rewrites
    r3 = lay.refresh()
    assert r3["rewritten"] == [] and r3["removed"] == []

    # offline catch-up: two commits land, one refresh folds the diff
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("update", 103, "u1", 40, "a b")])), 3)
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("update", 104, "u1", 50, "a b c")])), 4)
    r4 = lay.refresh()
    assert len(r4["rewritten"]) == 1  # same partition changed twice
    pd.testing.assert_frame_equal(layout_df(tmp_path / "lay"),
                                  expected_df(lake), check_dtype=False)


def test_layout_serves_bucket_join_and_lookup(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4)
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("insert", i, f"u{i}", 10, f"text {i}") for i in range(30)])), 0)
    lay = LakeBucketLayout(lake, tmp_path / "lay", transform=make_proj(),
                           columns=["text"])
    lay.refresh()

    # co-bucketed side table written the ordinary way
    side = pd.DataFrame({"url": [f"u{i}" for i in range(30)],
                         "score": [i * 1.0 for i in range(30)]})
    write_partitioned(rd.from_pandas([side]), tmp_path / "side",
                      key="url", num_partitions=4)
    joined = bucket_join(tmp_path / "lay", tmp_path / "side").to_pandas()
    assert len(joined) == 30
    assert {"url", "n_tokens", "score"} <= set(joined.columns)

    hit = bucket_lookup(tmp_path / "lay", ["u7"])
    assert list(hit["url"]) == ["u7"] and int(hit["n_tokens"].iloc[0]) == 2

    # after an update the join sees CURRENT state (no staleness)
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("update", 99, "u7", 20, "one two three four")])), 1)
    lay.refresh()
    hit = bucket_lookup(tmp_path / "lay", ["u7"])
    assert int(hit["n_tokens"].iloc[0]) == 4


def test_layout_truncate_empties(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2)
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("insert", 0, "u1", 10, "x y")])), 0)
    lay = LakeBucketLayout(lake, tmp_path / "lay", transform=make_proj(),
                           columns=["text"])
    lay.refresh()
    assert len(layout_df(tmp_path / "lay")) == 1
    lake.truncate()
    r = lay.refresh()
    assert r["removed"] and not r["rewritten"]
    import pytest

    with pytest.raises(FileNotFoundError):
        read_partitioned(tmp_path / "lay")


def test_layout_skips_content_neutral_maintenance(tmp_path, ray_session):
    """Compaction and tombstone-purge move every fingerprint but leave
    the layout's live projection untouched — the manifest walk skips
    their rewrites entirely; a real ingest afterwards rewrites only its
    own partitions."""
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     merge_on_read=True, collect_changes=False)
    lay = LakeBucketLayout(lake, tmp_path / "lay", transform=make_proj(),
                           columns=["text"])
    e0 = [mk("insert", i, f"u{i}", 10, f"w{i} common text")
          for i in range(40)]
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(e0)), 0)
    r0 = lay.refresh()
    assert len(r0["rewritten"]) == 4
    before = layout_df(tmp_path / "lay")

    lake.compact_deltas()
    r1 = lay.refresh()
    assert r1["rewritten"] == [] and sorted(r1["skipped_neutral"]) == \
        [0, 1, 2, 3]
    pd.testing.assert_frame_equal(layout_df(tmp_path / "lay"), before)
    # the skip updated fingerprints: next refresh is a pure no-op
    r2 = lay.refresh()
    assert r2["rewritten"] == [] and r2["skipped_neutral"] == []

    # delete a key (tombstone) -> its partition rewrites (real change);
    # then purge the tombstone -> content-neutral again
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("delete", 100, "u7", 99, None)])), 1)
    lake.compact_deltas()  # fold the delete so purge can run
    r3 = lay.refresh()
    assert len(r3["rewritten"]) >= 1
    after_delete = layout_df(tmp_path / "lay")
    assert "u7" not in set(after_delete["url"])
    lake.purge_tombstones(watermark_ts_us=10**18)
    r4 = lay.refresh()
    assert r4["rewritten"] == [] and len(r4["skipped_neutral"]) >= 1
    pd.testing.assert_frame_equal(layout_df(tmp_path / "lay"),
                                  after_delete)

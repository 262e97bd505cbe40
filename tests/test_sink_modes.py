"""Sink-mode parity: update-only (Updater), truncate (Truncator), and the
fill-null/protected policies at the lake level."""

import pandas as pd
import pytest

from chomper_ray.pipelines.cdc import run_cdc
from chomper_ray.sources import events as ev
from chomper_ray.state.lake import LakeTable


@pytest.fixture(scope="module")
def small_log(tmp_path_factory):
    d = tmp_path_factory.mktemp("log")
    ev.generate_change_stream(d, n_events=500, n_urls=120, n_epochs=2, seed=3)
    return d


def test_update_only_never_inserts(small_log, tmp_path):
    # reference Updater: no insert if absent (contrib/postgres.py:184-259)
    lake_root = tmp_path / "lake"
    run_cdc(small_log, lake_root, num_partitions=4, max_epochs=1,
            lake_kwargs={})
    lake_full = LakeTable(lake_root, num_partitions=4)
    keys_after_e0 = set(lake_full.read_pandas()["url"])

    run_cdc(small_log, lake_root, num_partitions=4,
            lake_kwargs={"insert_missing": False})
    after = LakeTable(lake_root, num_partitions=4).read_pandas()
    # epoch 1 may update/delete existing keys but never add new ones
    assert set(after["url"]) <= keys_after_e0


def test_truncate_full_refresh(small_log, tmp_path):
    lake_root = tmp_path / "lake"
    run_cdc(small_log, lake_root, num_partitions=4)
    lake = LakeTable(lake_root, num_partitions=4)
    assert len(lake.read_pandas()) > 0
    res = lake.truncate(epoch=99)
    assert not res.skipped
    assert lake.files() == []
    assert lake.last_committed_epoch() == 99
    # truncate is itself exactly-once
    assert lake.truncate(epoch=99).skipped


def test_fill_null_only_lake_level(tmp_path):
    """overwrite=False at the lake: later non-null values fill only
    nulls (reference Upserter.overwrite(False), test_sql.py:167-175)."""
    import pyarrow as pa
    import ray.data as rd

    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     overwrite=False)

    def mk(op, seq, url, ts, text, lang):
        return {"op": op, "seq": seq, "url": url,
                "warc_ts": pd.Timestamp(ts, unit="s"), "text": text,
                "lang": lang}

    e0 = pa.Table.from_pylist([
        mk("insert", 0, "u1", 10, None, "en"),
        mk("insert", 1, "u2", 10, "keep", "de"),
    ])
    lake.commit_epoch(rd.from_arrow(e0), 0)
    e1 = pa.Table.from_pylist([
        mk("update", 2, "u1", 20, "filled", "fr"),   # text fills, lang kept
        mk("update", 3, "u2", 20, "clobber", None),  # text kept
    ])
    lake.commit_epoch(rd.from_arrow(e1), 1)
    df = lake.read_pandas().set_index("url")
    assert df.loc["u1", "text"] == "filled"
    assert df.loc["u1", "lang"] == "en"
    assert df.loc["u2", "text"] == "keep"
    assert df.loc["u2", "lang"] == "de"


def test_protected_and_timestamps_lake_level(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     protected=("lang",), managed_timestamps=True)

    def mk(op, seq, url, ts, text, lang):
        return {"op": op, "seq": seq, "url": url,
                "warc_ts": pd.Timestamp(ts, unit="s"), "text": text,
                "lang": lang}

    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("insert", 0, "u1", 10, "a", "en")])), 0)
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("update", 1, "u1", 20, "b", "xx")])), 1)
    df = lake.read_pandas(include_internal=True)
    row = df.set_index("url").loc["u1"]
    assert row["text"] == "b"
    assert row["lang"] == "en"          # protected survives the update
    assert pd.notna(row["created_at"]) and pd.notna(row["updated_at"])
    assert row["updated_at"] > row["created_at"]


def test_time_travel_and_compaction(small_log, tmp_path):
    lake_root = tmp_path / "lake"
    run_cdc(small_log, lake_root, num_partitions=4)
    lake = LakeTable(lake_root, num_partitions=4)
    full = lake.read_pandas()
    # time travel: epoch-0 state differs from the final state
    e0_files = lake.files(as_of_epoch=0)
    assert e0_files and all("snap-000000" in f for f in e0_files)
    # compaction: retain only the latest manifest; older snaps GC'd
    import glob
    before = len(glob.glob(str(lake_root / "data" / "**" / "snap-*.parquet"),
                           recursive=True))
    res = lake.compact(keep_epochs=1)
    after = len(glob.glob(str(lake_root / "data" / "**" / "snap-*.parquet"),
                          recursive=True))
    assert after < before and res["removed_files"] == before - after
    # current state still reads identically after GC
    pd.testing.assert_frame_equal(full, lake.read_pandas())


def test_crashed_staging_is_cleaned_and_recommitted(small_log, tmp_path):
    """Crash between staging and manifest commit: leftover staging files
    for the uncommitted epoch are wiped and the commit redone — final
    state identical to a clean run (exactly-once under partial failure)."""
    clean_root = tmp_path / "clean"
    run_cdc(small_log, clean_root, num_partitions=4)
    h_clean = LakeTable(clean_root, num_partitions=4).snapshot_hash()

    crash_root = tmp_path / "crash"
    run_cdc(small_log, crash_root, num_partitions=4, max_epochs=1)
    # simulate a crashed attempt's leftover garbage staging: it lives in
    # its OWN attempt dir, so a resuming runner never reads it (merges
    # stay clean); compact() is the maintenance window that sweeps it
    stale = (crash_root / "_staging" / "attempt=deadcafe01"
             / "epoch=000001" / "r=00000")
    stale.mkdir(parents=True)
    (stale / "deadbeef.parquet").write_bytes(b"not a parquet file")
    run_cdc(small_log, crash_root, num_partitions=4)  # resume
    assert LakeTable(crash_root, num_partitions=4).snapshot_hash() == h_clean
    assert stale.exists()  # untouched: another attempt's dir is never wiped
    LakeTable(crash_root).compact(keep_epochs=1)
    assert not (crash_root / "_staging").exists()  # swept at maintenance


def test_purge_tombstones_with_watermark(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    lake = LakeTable(tmp_path / "lake", num_partitions=2)

    def mk(op, seq, url, ts, text):
        return {"op": op, "seq": seq, "url": url,
                "warc_ts": pd.Timestamp(ts, unit="s"), "text": text,
                "lang": "en"}

    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist([
        mk("insert", 0, "old", 100, "x"), mk("insert", 1, "new", 100, "y"),
        mk("delete", 2, "old", 200, None),      # old tombstone (< watermark)
        mk("insert", 3, "u3", 100, "z"),
        mk("delete", 4, "u3", 5000, None),      # recent tombstone (>= wm)
    ])), 0)
    df0 = lake.read_pandas(include_deleted=True)
    assert len(df0) == 3  # new + 2 tombstones

    wm_us = int(pd.Timestamp(1000, unit="s").value // 1000)
    res = lake.purge_tombstones(epoch=1, watermark_ts_us=wm_us)
    assert res.rows_deleted == 1  # only the pre-watermark tombstone purged
    after = lake.read_pandas(include_deleted=True, include_internal=True)
    assert "old" not in set(after["url"])        # purged
    assert True in set(after["_deleted"])        # recent tombstone kept
    # exactly-once
    assert lake.purge_tombstones(epoch=1, watermark_ts_us=wm_us).skipped


def test_point_lookup_reads_one_partition(small_log, tmp_path):
    run_cdc(small_log, tmp_path / "lake", num_partitions=4)
    lake = LakeTable(tmp_path / "lake", num_partitions=4)
    df = lake.read_pandas()
    url = df["url"].iloc[0]
    hit = lake.lookup(url)
    assert len(hit) == 1 and hit["url"].iloc[0] == url
    assert hit["text"].iloc[0] == df.set_index("url").loc[url, "text"]
    # column pruning + miss behavior
    assert list(lake.lookup(url, columns=["url", "lang"]).columns) == ["url", "lang"]
    assert lake.lookup("https://no.such/url").empty

"""Operational tools: fsck integrity check + change-feed retention."""

import pytest

from chomper_ray.pipelines.cdc import run_cdc
from chomper_ray.sources.events import generate_change_stream
from chomper_ray.state.lake import LakeTable

PARAMS = dict(n_events=1200, n_urls=250, n_epochs=3, seed=47)


@pytest.fixture()
def lake(tmp_path):
    log = generate_change_stream(tmp_path / "log", **PARAMS)
    run_cdc(log, tmp_path / "lake", num_partitions=4)
    return LakeTable(tmp_path / "lake", num_partitions=4)


def test_fsck_clean_lake_passes(lake):
    res = lake.fsck()
    assert res["ok"] and res["partitions_checked"] == 4
    assert res["mismatches"] == [] and res["missing_files"] == []


def test_fsck_detects_corruption_and_missing(lake):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chomper_ray.state.lake import load_manifest

    parts = load_manifest(lake.root)["partitions"]
    # corrupt one file: flip a value but keep row count
    f0 = lake.root / parts["0"]["file"]
    t = pq.read_table(f0)
    lang = t["lang"].to_pylist()
    lang[0] = "xx" if lang[0] != "xx" else "yy"
    t = t.set_column(t.schema.get_field_index("lang"), "lang",
                     pa.array(lang, type=pa.string()))
    pq.write_table(t, f0)
    # delete another
    (lake.root / parts["1"]["file"]).unlink()
    res = lake.fsck()
    assert not res["ok"]
    assert [m["partition_id"] for m in res["mismatches"]] == [0]
    assert "hash" in res["mismatches"][0]["reason"]
    assert res["missing_files"] == [1]


def test_fsck_checks_mor_delta_files(tmp_path):
    """Delta entries record the change-set content hash, so fsck fully
    verifies a delta-bearing lake: every pending delta file is checked
    (nothing skipped), corruption in a DELTA is pinpointed to its file,
    and the folded lake still passes afterwards."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chomper_ray.state.lake import load_manifest

    log = generate_change_stream(tmp_path / "log", **PARAMS)
    kw = {"merge_on_read": True, "collect_changes": False}
    run_cdc(log, tmp_path / "lake", num_partitions=3, lake_kwargs=kw)
    lake = LakeTable(tmp_path / "lake", num_partitions=3, **kw)
    res = lake.fsck()
    n_deltas = sum(len(v.get("deltas", []))
                   for v in load_manifest(lake.root)["partitions"].values())
    assert res["ok"] and res["skipped_mor"] == []
    assert res["files_checked"] == n_deltas  # bases are file=None here
    # corrupt one delta file: flip a value, keep row count
    d0 = load_manifest(lake.root)["partitions"]["0"]["deltas"][0]
    f0 = lake.root / d0["file"]
    t = pq.read_table(f0)
    lang = t["lang"].to_pylist()
    lang[0] = "xx" if lang[0] != "xx" else "yy"
    t = t.set_column(t.schema.get_field_index("lang"), "lang",
                     pa.array(lang, type=pa.string()))
    pq.write_table(t, f0)
    res = lake.fsck()
    assert not res["ok"]
    assert [m["file"] for m in res["mismatches"]] == [d0["file"]]
    assert "hash" in res["mismatches"][0]["reason"]
    # restore by rerunning the exactly-once commit? no — repair by
    # copying is out of scope; rebuild the lake fresh and fold instead
    run_cdc(log, tmp_path / "lake2", num_partitions=3, lake_kwargs=kw)
    lake2 = LakeTable(tmp_path / "lake2", num_partitions=3, **kw)
    lake2.compact_deltas()
    res = lake2.fsck()
    assert res["ok"] and res["skipped_mor"] == [] \
        and res["partitions_checked"] == 3


def test_prune_change_events_retention(lake):
    feed_all = lake.change_events_ds().to_pandas()
    assert (feed_all["epoch"] == 0).any()
    res = lake.prune_change_events(before_epoch=1)
    assert res["removed_files"] > 0 and res["horizon"] == 1
    # full-feed reads refuse below the horizon, loudly
    with pytest.raises(ValueError, match="pruned below epoch 1"):
        lake.change_events_ds()
    with pytest.raises(ValueError, match="retention horizon"):
        lake.change_events()
    # resumed subscription past the horizon: exact remainder
    kept = lake.change_events_ds(since_epoch=0).to_pandas()
    want = feed_all[feed_all["epoch"] > 0]
    assert len(kept) == len(want)
    assert (kept["epoch"] >= 1).all()
    # idempotent; horizon never regresses
    again = lake.prune_change_events(before_epoch=0)
    assert again["horizon"] == 1 and again["removed_files"] == 0

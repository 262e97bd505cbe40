"""Resumable partitioned sink: skip-completed semantics + round-trip."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from chomper_ray.state.output import read_partitioned, write_partitioned


def mk_ds(n=500):
    rng = np.random.default_rng(4)
    return rd.from_arrow(pa.table({
        "k": pa.array([f"key-{i}" for i in range(n)]),
        "v": pa.array(rng.integers(0, 100, n)),
    })).repartition(4)


def test_write_read_roundtrip(tmp_path):
    root = tmp_path / "out"
    res = write_partitioned(mk_ds(), root, key="k", num_partitions=8)
    assert res["written"] > 1 and res["skipped"] == 0 and res["rows"] == 500
    back = read_partitioned(root).to_pandas()
    assert len(back) == 500
    assert sorted(back["k"]) == sorted(f"key-{i}" for i in range(500))


def test_resume_skips_completed_partitions(tmp_path):
    root = tmp_path / "out"
    write_partitioned(mk_ds(), root, key="k", num_partitions=8)
    # simulate a torn run: nuke two partitions' markers + data
    import shutil

    victims = sorted(root.glob("p=*"))[:2]
    for v in victims:
        shutil.rmtree(v)
    res = write_partitioned(mk_ds(), root, key="k", num_partitions=8)
    assert res["written"] == 2        # only the torn partitions rewrote
    assert res["skipped"] >= 1
    assert len(read_partitioned(root).to_pandas()) == 500


def test_partial_dirs_invisible_to_reader(tmp_path):
    root = tmp_path / "out"
    write_partitioned(mk_ds(), root, key="k", num_partitions=8)
    # a partition without _SUCCESS (torn write) must not be read
    victim = sorted(root.glob("p=*"))[0]
    (victim / "_SUCCESS").unlink()
    n_parts = len(list(root.glob("p=*/_SUCCESS")))
    back = read_partitioned(root).to_pandas()
    assert back["k"].nunique() < 500
    assert n_parts == len(list(root.glob("p=*"))) - 1


def test_bucket_join_matches_pandas_all_modes(tmp_path):
    import numpy as np

    from chomper_ray.state.output import bucket_join, write_partitioned

    rng = np.random.default_rng(4)
    l = pd.DataFrame({"k": rng.integers(0, 300, 1000),
                      "lv": rng.integers(0, 100, 1000)})
    r = pd.DataFrame({"k": rng.integers(100, 400, 800),
                      "rv": rng.integers(0, 100, 800)})
    ld, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    write_partitioned(rd.from_arrow(pa.Table.from_pandas(
        l, preserve_index=False)).repartition(4), ld,
        key="k", num_partitions=16)
    write_partitioned(rd.from_arrow(pa.Table.from_pandas(
        r, preserve_index=False)).repartition(4), rdir,
        key="k", num_partitions=16)
    for how in ("inner", "left", "outer"):
        got = bucket_join(ld, rdir, how=how).to_pandas() \
            .sort_values(["k", "lv", "rv"], na_position="last") \
            .reset_index(drop=True)
        exp = l.merge(r, on="k", how=how) \
            .sort_values(["k", "lv", "rv"], na_position="last") \
            .reset_index(drop=True)
        assert len(got) == len(exp)
        assert (got.fillna(-1).values == exp.fillna(-1).values).all()


def test_bucket_join_rejects_mismatched_layouts(tmp_path):
    import pytest as _pytest

    from chomper_ray.state.output import bucket_join, write_partitioned

    a = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    write_partitioned(a, str(tmp_path / "x"), key="k", num_partitions=4)
    write_partitioned(a, str(tmp_path / "y"), key="k", num_partitions=8)
    with _pytest.raises(ValueError, match="num_partitions"):
        bucket_join(str(tmp_path / "x"), str(tmp_path / "y"))


def test_bucket_agg_matches_pandas(tmp_path):
    import numpy as np

    from chomper_ray.state.output import bucket_agg, write_partitioned

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"k": rng.integers(0, 50, 2000),
                       "v": rng.integers(0, 10, 2000)})
    root = str(tmp_path / "t")
    write_partitioned(rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(4), root,
        key="k", num_partitions=8)
    got = bucket_agg(root, sums=["v"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exp = df.groupby("k").agg(sum_v=("v", "sum"), n_rows=("v", "size")) \
        .reset_index().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["sum_v"].tolist() == exp["sum_v"].tolist()
    assert got["n_rows"].tolist() == exp["n_rows"].tolist()


def test_write_sorted_read_range_prunes_files(tmp_path):
    import numpy as np

    from chomper_ray.state.output import read_range, write_sorted

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"x": rng.integers(0, 10000, 20000).astype("int64"),
                       "v": rng.integers(0, 100, 20000)})
    root = str(tmp_path / "srt")
    st = write_sorted(rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(4), root, "x",
        num_partitions=16)
    assert st["rows"] == 20000
    ds, nread, ntotal = read_range(root, lo=2500, hi=3500)
    got = ds.to_pandas().sort_values(["x", "v"]).reset_index(drop=True)
    exp = df[(df.x >= 2500) & (df.x < 3500)] \
        .sort_values(["x", "v"]).reset_index(drop=True)
    assert got.equals(exp)
    assert nread < ntotal  # pruning is real, not a full scan
    # open-ended and no-match ranges
    ds2, nr2, _ = read_range(root, lo=9990)
    assert ds2.count() == int((df.x >= 9990).sum()) and nr2 == 1
    ds3, nr3, _ = read_range(root, lo=50000)
    assert ds3.count() == 0 and nr3 == 0


def test_write_zorder_read_box_prunes_both_dims(tmp_path):
    import numpy as np

    from chomper_ray.state.output import read_box, write_zorder

    rng = np.random.default_rng(6)
    df = pd.DataFrame({"x": rng.uniform(0, 100, 40000),
                       "y": rng.uniform(0, 100, 40000),
                       "v": rng.integers(0, 10, 40000)})
    root = str(tmp_path / "z")
    write_zorder(rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(4), root, ["x", "y"],
        num_partitions=32)
    ds, nr, nt = read_box(root, {"x": (20.0, 30.0), "y": (50.0, 60.0)})
    got = ds.to_pandas()
    exp = df[(df.x >= 20) & (df.x < 30) & (df.y >= 50) & (df.y < 60)]
    assert len(got) == len(exp)
    assert got["v"].sum() == exp["v"].sum()
    # z-clustering makes a 2-D box prune MORE than one dimension alone
    _, nr_x, _ = read_box(root, {"x": (20.0, 30.0)})
    assert nr < nr_x < nt
    # empty box
    ds2, nr2, _ = read_box(root, {"x": (200.0, 300.0)})
    assert ds2.count() == 0 and nr2 == 0


def test_bucket_lookup_reads_single_buckets(tmp_path):
    import numpy as np

    from chomper_ray.state.output import bucket_lookup, write_partitioned

    df = pd.DataFrame({"k": np.arange(1000, dtype="int64"),
                       "v": np.arange(1000, dtype="int64") * 7})
    root = str(tmp_path / "pl")
    write_partitioned(rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(4), root,
        key="k", num_partitions=32)
    got = bucket_lookup(root, [42, 999, 7])
    assert got["k"].tolist() == [42, 999, 7]
    assert got["v"].tolist() == [294, 6993, 49]
    assert bucket_lookup(root, [123456]).empty


def test_write_jsonl_partitioned_roundtrip_and_resume(tmp_path):
    from chomper_ray.state.output import (read_jsonl_partitioned,
                                          write_jsonl_partitioned)

    df = pd.DataFrame({"k": np.arange(500, dtype="int64"),
                       "txt": [f"line {i} ünïcode" for i in range(500)]})
    root = str(tmp_path / "jl")
    st = write_jsonl_partitioned(rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(4), root,
        key="k", num_partitions=8)
    assert st["written"] == 8 and st["rows"] == 500
    back = read_jsonl_partitioned(root).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert back["k"].tolist() == df["k"].tolist()
    assert back["txt"].tolist() == df["txt"].tolist()
    # resume: a second run skips every finished shard
    st2 = write_jsonl_partitioned(rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(4), root,
        key="k", num_partitions=8)
    assert st2["written"] == 0 and st2["skipped"] == 8


def test_write_sorted_rejects_null_order_col(tmp_path):
    import pytest

    from chomper_ray.state.output import write_sorted

    df = pd.DataFrame({"x": [1.0, 2.0, float("nan"), 4.0],
                       "v": [1, 2, 3, 4]})
    with pytest.raises(Exception) as ei:
        write_sorted(rd.from_arrow(pa.Table.from_pandas(
            df, preserve_index=False)), str(tmp_path / "srt"), "x",
            num_partitions=4)
    assert "null" in str(ei.value)


def test_read_range_column_projection_excluding_order_col(tmp_path):
    from chomper_ray.state.output import read_range, write_sorted

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"x": rng.integers(0, 1000, 5000).astype("int64"),
                       "v": rng.integers(0, 100, 5000)})
    root = str(tmp_path / "srt")
    write_sorted(rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(4), root, "x",
        num_partitions=8)
    # caller projects out the order column: residual filter still runs,
    # output carries only the requested columns
    ds, _, _ = read_range(root, lo=200, hi=400, columns=["v"])
    got = ds.to_pandas()
    assert list(got.columns) == ["v"]
    exp = df[(df.x >= 200) & (df.x < 400)]
    assert len(got) == len(exp) and got["v"].sum() == exp["v"].sum()


def test_read_box_column_projection_excluding_pred_cols(tmp_path):
    from chomper_ray.state.output import read_box, write_zorder

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"x": rng.uniform(0, 100, 8000),
                       "y": rng.uniform(0, 100, 8000),
                       "v": rng.integers(0, 10, 8000)})
    root = str(tmp_path / "z")
    write_zorder(rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(4), root, ["x", "y"],
        num_partitions=16)
    ds, _, _ = read_box(root, {"x": (20.0, 30.0), "y": (50.0, 60.0)},
                        columns=["v"])
    got = ds.to_pandas()
    assert list(got.columns) == ["v"]
    exp = df[(df.x >= 20) & (df.x < 30) & (df.y >= 50) & (df.y < 60)]
    assert len(got) == len(exp) and got["v"].sum() == exp["v"].sum()


def test_bucket_agg_missing_bucket_keeps_key_dtype(tmp_path):
    import shutil

    from chomper_ray.state.output import bucket_agg, write_partitioned

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": rng.integers(0, 50, 2000),
                       "v": rng.integers(0, 10, 2000)})
    root = tmp_path / "t"
    write_partitioned(rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(4), str(root),
        key="k", num_partitions=8)
    # simulate a torn write: one bucket lacks its _SUCCESS file
    victim = sorted(root.glob("p=*"))[0]
    shutil.rmtree(victim)
    out = bucket_agg(str(root), sums=["v"]).to_pandas()
    # key dtype must match the layout's real schema, not degrade to
    # object, even though one bucket contributed a typed-empty frame
    assert out["k"].dtype.kind == "i"
    assert out["n_rows"].dtype.kind == "i"


# ------------------------------------------------------- shuffled export

def _shuf_ds(n=300):
    rng = np.random.default_rng(8)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(0, 100, n)),
    })).repartition(5)


def _expected_order(n, n_shards):
    ids = np.arange(n, dtype=np.uint64)
    h = (ids * np.uint64(2654435761)) % np.uint64(4294967296)
    shard = (h % np.uint64(n_shards)).astype(int)
    order = np.lexsort((ids, h, shard))  # shard asc, then h, then key
    return ids[order].astype(np.int64), shard[order]


def test_shuffled_export_global_order(tmp_path):
    from chomper_ray.state.output import read_shuffled, shuffled_export

    st = shuffled_export(_shuf_ds(), tmp_path / "sh", key="doc_id",
                         n_shards=8)
    assert st["rows"] == 300 and st["written"] == 8
    # the global order CONTRACT is the (shard, pos) columns (block
    # arrival order is not guaranteed under preserve_order=False)
    got = read_shuffled(tmp_path / "sh").to_pandas() \
        .sort_values(["shard", "pos"]).reset_index(drop=True)
    exp_ids, exp_shard = _expected_order(300, 8)
    assert got["doc_id"].to_numpy().tolist() == exp_ids.tolist()
    assert got["shard"].to_numpy().tolist() == exp_shard.tolist()
    # pos is dense within each shard
    for s, g in got.groupby("shard"):
        assert g["pos"].tolist() == list(range(len(g)))
    # payload columns survive
    assert "v" in got.columns


def test_shuffled_export_resume_and_identical_retry(tmp_path):
    from pathlib import Path

    from chomper_ray.state.output import shuffled_export

    shuffled_export(_shuf_ds(), tmp_path / "sh", key="doc_id", n_shards=4)
    files = sorted(Path(tmp_path / "sh").glob("s=*/part.parquet"))
    before = {f: f.read_bytes() for f in files}
    # rerun: everything skipped, bytes untouched
    st = shuffled_export(_shuf_ds(), tmp_path / "sh", key="doc_id",
                         n_shards=4)
    assert st["written"] == 0 and st["skipped"] == 4
    # torn shard: drop one _SUCCESS, rerun rewrites ONLY that shard
    victim = files[1].parent
    (victim / "_SUCCESS").unlink()
    st = shuffled_export(_shuf_ds(), tmp_path / "sh", key="doc_id",
                         n_shards=4)
    assert st["written"] == 1 and st["skipped"] == 3
    # retries are byte-identical — including the rewritten shard
    for f, b in before.items():
        assert f.read_bytes() == b


def test_shuffled_export_key_domain_guard(tmp_path):
    import pytest as _pytest

    from chomper_ray.state.output import shuffled_export

    bad = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 2**33], type=pa.int64())}))
    with _pytest.raises(Exception, match="2\\^32"):
        shuffled_export(bad, tmp_path / "sh", key="doc_id", n_shards=2)


def test_shuffled_export_shard_count_guard(tmp_path):
    import pytest as _pytest

    from chomper_ray.state.output import shuffled_export

    shuffled_export(_shuf_ds(50), tmp_path / "sh", key="doc_id",
                    n_shards=4)
    with _pytest.raises(ValueError, match="shard count"):
        shuffled_export(_shuf_ds(50), tmp_path / "sh", key="doc_id",
                        n_shards=8)


def test_read_shuffled_start_shard_resume(tmp_path):
    from chomper_ray.state.output import read_shuffled, shuffled_export

    shuffled_export(_shuf_ds(200), tmp_path / "sh", key="doc_id",
                    n_shards=4)
    full = read_shuffled(tmp_path / "sh").to_pandas() \
        .sort_values(["shard", "pos"]).reset_index(drop=True)
    resumed = read_shuffled(tmp_path / "sh", start_shard=2).to_pandas() \
        .sort_values(["shard", "pos"]).reset_index(drop=True)
    assert set(resumed["shard"]) == {2, 3}
    pd.testing.assert_frame_equal(
        resumed, full[full["shard"] >= 2].reset_index(drop=True))

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

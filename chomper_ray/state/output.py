"""Resumable partitioned Parquet output for non-lake pipelines.

The engine rule: write one directory per key range so a failed run can
skip finished partitions — never one giant file. The LakeTable gets this
via its manifest; this module is the lightweight variant for plain
pipeline outputs (exports, training-shard dumps):

- rows are hash-bucketed by ``key`` into ``num_partitions`` ranges;
- one task per partition writes ``root/p=NNNNN/part.parquet`` to a tmp
  name, fsync-renames it, then drops a ``_SUCCESS`` marker — the write
  of each partition is atomic-ish and individually restartable;
- a rerun skips partitions whose marker exists (``skipped`` count
  returned), so a crashed 50k-partition dump resumes where it died.

Deterministic: the same input produces the same partition contents
(rows sorted by key within a partition), so a retried partition
overwrites with identical bytes.
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from chomper_ray.stages.merge import add_bucket, BUCKET_COL


def write_partitioned(ds, root: str | Path, key: str,
                      num_partitions: int = 64,
                      skip_completed: bool = True) -> dict:
    """Write ``ds`` as ``root/p=NNNNN/part.parquet`` (+ ``_SUCCESS``
    markers). Returns ``{"written": n, "skipped": n, "rows": n}``."""
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    done = {int(p.parent.name.split("=")[1])
            for p in root.glob("p=*/_SUCCESS")} if skip_completed else set()

    bucketed = ds.map_batches(
        lambda t: add_bucket(t, key, num_partitions), batch_format="pyarrow")

    roots = str(root)

    def write_part(g: pa.Table) -> pd.DataFrame:
        pid = int(g[BUCKET_COL][0].as_py())
        if pid in done:
            # a completed partition's rows are dropped here, but they
            # were already shuffled — resume saves the WRITE + downstream
            # consumers, which is the expensive half for wide rows
            return pd.DataFrame({"pid": [pid], "rows": [0], "skipped": [True]})
        g = g.drop_columns([BUCKET_COL]).sort_by(key)
        d = Path(roots) / f"p={pid:05d}"
        d.mkdir(parents=True, exist_ok=True)
        # attempt-isolated tmp: two resumed runs racing on the same
        # partition must not share a tmp path (see lake.py snapshot note)
        tmp = d / f".part.{uuid.uuid4().hex[:8]}.parquet.tmp"
        pq.write_table(g, tmp)
        os.replace(tmp, d / "part.parquet")
        (d / "_SUCCESS").touch()
        return pd.DataFrame({"pid": [pid], "rows": [g.num_rows],
                             "skipped": [False]})

    stats = (bucketed.groupby(BUCKET_COL)
             .map_groups(write_part, batch_format="pyarrow")
             .to_pandas())  # one row per partition — metadata only
    return {
        "written": int((~stats["skipped"]).sum()),
        "skipped": int(stats["skipped"].sum()),
        "rows": int(stats["rows"].sum()),
    }


def read_partitioned(root: str | Path):
    """Read back a ``write_partitioned`` output as a streaming Dataset
    (only partitions with a ``_SUCCESS`` marker — a torn run's partial
    dirs are invisible)."""
    import ray.data as rd

    files = sorted(str(p.parent / "part.parquet")
                   for p in Path(root).glob("p=*/_SUCCESS"))
    if not files:
        raise FileNotFoundError(f"no completed partitions under {root}")
    return rd.read_parquet(files, partitioning=None)

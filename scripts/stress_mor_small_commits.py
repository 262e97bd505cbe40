"""Merge-on-read vs copy-on-write at the shape MOR exists for: SMALL
commits into a BIG table. Copy-on-write pays O(touched partitions'
full snapshots) per commit — with uniform keys every partition is
touched, so effectively O(table). Merge-on-read pays O(commit's
changes) regardless of table size; the table-sized fold is deferred to
one compact_deltas() on the maintenance cadence.

Builds a base table of ``n_base`` rows in one commit, then applies
``n_commits`` update epochs of ``n_commit`` rows each (uniform random
keys — the COW worst case and the common CDC trickle), through a COW
lake and a MOR lake. Asserts the final resolved states hash-equal,
prints one JSON line with per-commit walls and bytes written.

Usage: python scripts/stress_mor_small_commits.py \
           [n_base] [n_commit] [n_commits] [num_cpus]
"""

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
import pyarrow as pa

NUM_PARTITIONS = 64
TEXT = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 8


def make_events(n: int, epoch: int, n_keys: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, size=n) if n < n_keys \
        else np.arange(n_keys)[:n]
    seq = np.arange(n, dtype=np.int64) + epoch * 10_000_000
    return pa.table({
        "op": pa.array(["update" if epoch else "insert"] * n),
        "seq": pa.array(seq),
        "url": pa.array([f"https://ex.com/p{k:09d}" for k in keys]),
        "warc_ts": pa.array(
            pd.to_datetime(1_600_000_000 + epoch * 3600 + seq % 3600,
                           unit="s")),
        "lang": pa.array(np.where(seq % 3 == 0, "en", "de")),
        "text": pa.array([f"{TEXT} v{epoch} k{k}" for k in keys]),
    })


def lake_bytes(root: str) -> int:
    return sum(p.stat().st_size for p in Path(root).rglob("*.parquet"))


def run(mode: str, n_base: int, n_commit: int, n_commits: int) -> dict:
    import ray.data as rd

    from chomper_ray.state.lake import LakeTable

    kw = {"collect_changes": False}
    if mode == "mor":
        kw.update(merge_on_read=True)
    root = tempfile.mkdtemp(prefix=f"chomper_morsc_{mode}_")
    lake = LakeTable(root, num_partitions=NUM_PARTITIONS, **kw)
    lake.commit_epoch(rd.from_arrow(make_events(n_base, 0, n_base, 0)), 0)
    base_bytes = lake_bytes(root)
    walls = []
    for e in range(1, n_commits + 1):
        t0 = time.perf_counter()
        lake.commit_epoch(
            rd.from_arrow(make_events(n_commit, e, n_base, e)), e)
        walls.append(round(time.perf_counter() - t0, 2))
    commit_bytes = lake_bytes(root) - base_bytes
    compact_s = 0.0
    if mode == "mor":
        t0 = time.perf_counter()
        lake.compact_deltas()
        compact_s = round(time.perf_counter() - t0, 2)
    return {"mode": mode, "root": root,
            "commit_wall_s": walls,
            "mean_commit_s": round(float(np.mean(walls)), 2),
            "commit_mb_written": round(commit_bytes / 2**20, 1),
            "compact_s": compact_s,
            "hash": lake.snapshot_hash()}


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_commit = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    n_commits = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    num_cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    cow = run("cow", n_base, n_commit, n_commits)
    mor = run("mor", n_base, n_commit, n_commits)
    assert cow["hash"] == mor["hash"], "resolved states diverged"
    import shutil
    shutil.rmtree(cow.pop("root"), ignore_errors=True)
    shutil.rmtree(mor.pop("root"), ignore_errors=True)
    ray.shutdown()
    print(json.dumps({
        "metric": "mor_small_commits",
        "n_base": n_base, "n_commit": n_commit, "n_commits": n_commits,
        "num_cpus": num_cpus, "states_hash_equal": True,
        "cow": cow, "mor": mor,
        "commit_speedup": round(cow["mean_commit_s"]
                                / max(mor["mean_commit_s"], 1e-9), 1),
        "bytes_ratio": round(cow["commit_mb_written"]
                             / max(mor["commit_mb_written"], 1e-9), 1),
    }))


if __name__ == "__main__":
    main()

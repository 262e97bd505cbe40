"""Read amplification vs merge-on-read delta-chain depth.

Derived maintenance no longer needs compaction (it folds MOR commits
directly), so the ONLY cost of a deep pending chain is read-time
resolution: a scan of partition p replays base ⊕ chain(p) deltas, a
point lookup opens 1 + chain(p) files. This stress measures both walls
as the chain deepens, then after a major compaction — the measured
basis for picking ``compact_deltas(min_chain=N)`` cadence.

Protocol: 1 M-row MOR base (16 partitions), then 64 epochs of 5 k
uniform-key updates (every partition's chain grows 1 per epoch).
At depths {1, 5, 17, 65} and post-compaction: full-scan wall
(``read().count()``, resolution inside read tasks) and 10-key point
``lookup`` wall, best of 2.

Usage: python scripts/stress_mor_chain.py [n_base] [n_update]
       [n_epochs] [num_cpus]   (defaults 1_000_000 5_000 64 32)
"""

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa


def make_rows(rng, seqs, urls, ts):
    return pa.table({
        "op": pa.array(["update"] * len(urls)),
        "seq": pa.array(seqs, type=pa.int64()),
        "url": pa.array(urls),
        "warc_ts": pa.array([pd.Timestamp(ts, unit="s")] * len(urls)),
        "x": pa.array(rng.normal(size=len(urls))),
    })


def measure(lake, urls, rng):
    import ray.data as rd  # noqa: F401  (keeps read lazy-importable)

    best_scan = best_lookup = float("inf")
    keys = list(rng.choice(urls, size=10, replace=False))
    for _ in range(2):
        t0 = time.perf_counter()
        n = lake.read().count()
        best_scan = min(best_scan, time.perf_counter() - t0)
        t0 = time.perf_counter()
        for k in keys:
            lake.lookup(k)
        best_lookup = min(best_lookup, time.perf_counter() - t0)
    chains = lake.delta_chain_lengths()
    return {"chain_depth": max(chains.values()) if chains else 0,
            "scan_s": round(best_scan, 3),
            "lookup10_s": round(best_lookup, 3),
            "live_rows": int(n)}


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_update = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    n_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    num_cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from chomper_ray.state.lake import LakeTable

    rng = np.random.default_rng(3)
    root = Path(tempfile.mkdtemp(prefix="mor_chain_"))
    lake = LakeTable(root / "lake", key="url", num_partitions=16,
                     collect_changes=False, merge_on_read=True)
    urls = np.array([f"u{i:08d}" for i in range(n_base)], dtype=object)
    lake.commit_epoch(
        rd.from_arrow(make_rows(rng, np.arange(n_base), urls, 10)), 0)

    points = []
    checkpoints = {1, 5, 17, min(65, n_epochs + 1)}
    points.append(measure(lake, urls, rng))  # depth 1 (base is a delta)
    commit_s = []
    for e in range(1, n_epochs + 1):
        upd = rng.choice(n_base, size=n_update, replace=False)
        t0 = time.perf_counter()
        lake.commit_epoch(
            rd.from_arrow(make_rows(
                rng, 10_000_000 * e + np.arange(n_update),
                urls[upd], 10 + e)), e)
        commit_s.append(time.perf_counter() - t0)
        if e + 1 in checkpoints:
            points.append(measure(lake, urls, rng))
    t0 = time.perf_counter()
    lake.compact_deltas()
    compact_s = time.perf_counter() - t0
    post = measure(lake, urls, rng)
    out = {
        "metric": "mor_chain_read_amplification",
        "n_base": n_base, "n_update": n_update, "n_epochs": n_epochs,
        "num_cpus": num_cpus,
        "points": points,
        "mean_commit_s": round(float(np.mean(commit_s)), 3),
        "compact_s": round(compact_s, 3),
        "post_compaction": post,
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

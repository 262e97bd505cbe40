"""Derived-maintenance cost: merge-on-read vs copy-on-write.

The round-4 contract flip makes derived structures fold each MOR
commit's key-restricted diff (state/lake.py materialize_mor_commit_diff)
instead of refusing until compaction. This stress measures what that
buys at the 100-TB shape — SMALL commits into a BIG table:

  base: N rows committed once; index built (cost ∝ corpus, both modes)
  then K update epochs of M rows each (uniform keys → COW touches every
  partition), refreshing a LakeTextIndex after every commit:
    - COW: each refresh diffs whole touched partitions (old+new files)
      → tokenizes ~2·N rows per commit regardless of M
    - MOR: each refresh resolves only the commit's own keys
      → tokenizes ~2·M rows per commit (plus a partition-bounded
        base READ to key-filter the old side — I/O, not shuffle)

Reports per-commit refresh wall + rows_scanned for both modes plus the
final index-equivalence check (resolved postings must match).

Usage: python scripts/stress_mor_maintenance.py [n_base] [n_update]
       [n_epochs] [num_cpus]   (defaults 2_000_000 5_000 4 32)
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


WORDS = np.array([f"w{i:04d}" for i in range(4000)], dtype=object)


def make_rows(rng, seqs, urls, ts):
    toks = rng.integers(0, len(WORDS), size=(len(urls), 12))
    text = [" ".join(WORDS[t]) for t in toks]
    return pa.table({
        "op": pa.array(["update"] * len(urls)),
        "seq": pa.array(seqs, type=pa.int64()),
        "url": pa.array(urls),
        "warc_ts": pa.array([pd.Timestamp(ts, unit="s")] * len(urls)),
        "text": pa.array(text),
    })


def run_mode(mode: str, n_base: int, n_update: int, n_epochs: int) -> dict:
    import ray.data as rd

    from chomper_ray.state.index import LakeTextIndex
    from chomper_ray.state.lake import LakeTable

    rng = np.random.default_rng(7)
    root = Path(tempfile.mkdtemp(prefix=f"mor_maint_{mode}_"))
    kw = {"merge_on_read": True} if mode == "mor" else {}
    lake = LakeTable(root / "lake", key="url", num_partitions=32,
                     collect_changes=False, **kw)
    urls = np.array([f"u{i:08d}" for i in range(n_base)], dtype=object)
    t0 = time.perf_counter()
    lake.commit_epoch(
        rd.from_arrow(make_rows(rng, np.arange(n_base), urls, 10)), 0)
    base_commit_s = time.perf_counter() - t0
    idx = LakeTextIndex(lake, root / "idx", num_partitions=64)
    t0 = time.perf_counter()
    full = idx.refresh()["applied"][0]
    build_s = time.perf_counter() - t0

    epochs = []
    for e in range(1, n_epochs + 1):
        upd = rng.choice(n_base, size=n_update, replace=False)
        t0 = time.perf_counter()
        lake.commit_epoch(
            rd.from_arrow(make_rows(
                rng, 10_000_000 * e + np.arange(n_update),
                urls[upd], 10 + e)), e)
        commit_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        seg = idx.refresh()["applied"][0]
        refresh_s = time.perf_counter() - t0
        epochs.append({"commit_s": round(commit_s, 3),
                       "refresh_s": round(refresh_s, 3),
                       "rows_scanned": seg["rows_scanned"],
                       "postings": seg["postings"]})
    # equivalence probe: postings for a handful of tokens match a
    # from-scratch rebuild (cheap spot check, not the full corpus)
    fresh = LakeTextIndex(lake, root / "idx2", num_partitions=64)
    fresh.refresh()
    for tok in ["w0000", "w1234", "w3999"]:
        a = idx.postings(tok).reset_index(drop=True)
        b = fresh.postings(tok).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
    out = {
        "base_commit_s": round(base_commit_s, 3),
        "index_build_s": round(build_s, 3),
        "build_rows_scanned": full["rows_scanned"],
        "epochs": epochs,
        "mean_refresh_s": round(
            float(np.mean([e["refresh_s"] for e in epochs])), 3),
        "mean_rows_scanned": int(
            np.mean([e["rows_scanned"] for e in epochs])),
        "postings_spot_check": "equal",
    }
    shutil.rmtree(root, ignore_errors=True)
    return out


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_update = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    n_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    num_cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    import ray

    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    cow = run_mode("cow", n_base, n_update, n_epochs)
    mor = run_mode("mor", n_base, n_update, n_epochs)
    out = {
        "metric": "mor_derived_maintenance_stress",
        "n_base": n_base, "n_update": n_update, "n_epochs": n_epochs,
        "num_cpus": num_cpus,
        "cow": cow, "mor": mor,
        "refresh_speedup": round(
            cow["mean_refresh_s"] / max(mor["mean_refresh_s"], 1e-9), 2),
        "rows_scanned_ratio": round(
            cow["mean_rows_scanned"] / max(mor["mean_rows_scanned"], 1),
            1),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Maintained ANN index + embedding admission gate at scale
(state/annindex.LakeANNIndex).

The scale claims under test:
  1. per-commit index maintenance cost is the COMMIT'S write
     amplification (MOR key-restricted diffs bound the scan to ~2x the
     commit's rows), never the corpus;
  2. the maintained index answers EXACTLY like a from-scratch rebuild
     at the same head (search at nprobe=None compared frame-for-frame);
  3. the ingest-time admission kernel (_VecProbeKernel) finds every
     planted near-dup vector and sustains a useful probe rate at a
     production nprobe (touched cells only, batched per-cell matmul).

Shape (the 100-TB pattern — small commits into a big table):
  base: N vectors (dim D) committed once (merge-on-read lake), index
    built full (cost ~ corpus). Then K update epochs of M rows each
    (fresh vectors from a reserved id block). After every commit:
    idx.refresh() — wall + rows_scanned recorded.
  end: search-equality vs a fresh rebuild on Q queries (exact,
    nprobe=None); planted-near-dup recall through near_vecs at the
    gate's threshold; probe throughput at nprobe=4 over mixed
    dup/fresh queries; driver RSS delta.

All vectors are pure functions vec_of(id, version) — no driver-side
vector table, so driver RSS stays flat.

Usage: python scripts/stress_vecindex.py [n_base] [n_update] [n_epochs]
       [num_cpus]   (defaults 1_000_000 5_000 3 32; smoke: 100000 2000 2 8)
"""

import json
import resource
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
import pyarrow as pa

DIM = 64
N_CELLS = 64
THRESHOLD = 0.9
P_FRAC = 0.01          # planted near-dup pairs as a fraction of n_base


def vec_of(i: int, version: int) -> np.ndarray:
    rng = np.random.default_rng((int(i) << 8) ^ version ^ 0xBEEF)
    return rng.normal(size=DIM)


def perturb(v: np.ndarray, i: int) -> np.ndarray:
    # |noise| ~ 0.25*sqrt(D) vs |v| ~ sqrt(D): cos ~ 1/sqrt(1.0625) ~ 0.97
    rng = np.random.default_rng(int(i) ^ 0xD00D)
    return v + 0.25 * rng.normal(size=DIM)


def batch_table(ids, vecs, seqs, ts) -> pa.Table:
    return pa.table({
        "op": pa.array(["update"] * len(ids)),
        "seq": pa.array(seqs, type=pa.int64()),
        "vec_id": pa.array([f"v{i:08d}" for i in ids]),
        "warc_ts": pa.array([pd.Timestamp(ts, unit="s")] * len(ids)),
        "embedding": pa.array([v.tolist() for v in vecs]),
    })


def rss_mib() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_update = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    n_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    num_cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    import ray
    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.state.annindex import LakeANNIndex
    from chomper_ray.state.lake import LakeTable

    rss0 = rss_mib()
    root = Path(tempfile.mkdtemp(prefix="vecindex_stress_"))
    lake = LakeTable(root / "lake", key="vec_id", num_partitions=32,
                     merge_on_read=True, collect_changes=False)

    # ---- base corpus: distinct vectors + planted near-dup pairs at
    # (2i, 2i+1) — odd ids are perturbations of their even neighbor
    n_planted = int(n_base * P_FRAC) // 2

    def gen_base(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        vecs = [vec_of(i, 0) for i in ids]
        for j, i in enumerate(ids):
            if i < 2 * n_planted and i % 2 == 1:
                vecs[j] = perturb(vec_of(i - 1, 0), i)
        return batch_table(ids, vecs, ids, 10)

    t0 = time.perf_counter()
    base_ds = rd.range(n_base).map_batches(
        lambda b: pa.table({"id": b["id"]}), batch_format="pyarrow") \
        .map_batches(gen_base, batch_format="pyarrow")
    lake.commit_epoch(base_ds, 0)
    base_commit_s = time.perf_counter() - t0

    idx = LakeANNIndex(lake, root / "ann", n_cells=N_CELLS)
    t0 = time.perf_counter()
    build = idx.refresh()["applied"][0]
    build_s = time.perf_counter() - t0

    # ---- K small update epochs of fresh vectors (reserved id block)
    upd_lo = 2 * n_planted
    epochs = []
    for e in range(1, n_epochs + 1):
        rng = np.random.default_rng(1000 + e)
        ids = rng.choice(np.arange(upd_lo, n_base), size=n_update,
                         replace=False)
        vecs = [vec_of(i, e) for i in ids]
        t0 = time.perf_counter()
        lake.commit_epoch(rd.from_arrow(batch_table(
            ids, vecs, 10_000_000 * e + np.arange(len(ids)), 10 + e)), e)
        commit_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        seg = idx.refresh()["applied"][0]
        refresh_s = time.perf_counter() - t0
        epochs.append({"commit_s": round(commit_s, 3),
                       "refresh_s": round(refresh_s, 3),
                       "rows_scanned": seg["rows_scanned"],
                       "n_vecs_delta": seg["n_vecs_delta"]})

    # ---- maintained == rebuild: exact search parity on Q queries
    n_q = 64
    queries = np.stack([vec_of(n_base + 7_000_000 + i, 3)
                        for i in range(n_q)])
    t0 = time.perf_counter()
    got = idx.search(queries, k=5, nprobe=None)
    search_s = time.perf_counter() - t0

    fresh_idx = LakeANNIndex(lake, root / "ann2", n_cells=N_CELLS)
    t0 = time.perf_counter()
    fresh_idx.refresh()
    rebuild_s = time.perf_counter() - t0
    want = fresh_idx.search(queries, k=5, nprobe=None)

    def canon(df):
        return list(zip(df["qid"], df["key"], df["score"].round(9)))

    search_equal = canon(got) == canon(want)

    # ---- pruned-search recall vs exhaustive at a production nprobe
    pruned = idx.search(queries, k=5, nprobe=8)
    want_set = set(zip(want["qid"], want["key"]))
    recall_nprobe8 = len(want_set & set(
        zip(pruned["qid"], pruned["key"]))) / max(1, len(want_set))

    # ---- admission kernel: planted recall (exact probe) + rate at
    # nprobe=4 over a 50/50 dup/fresh mix
    dup_q = [perturb(vec_of(2 * i, 0), 10 ** 9 + i) for i in range(100)]
    fresh_q = [vec_of(n_base + 5_000_000 + i, 9) for i in range(100)]
    exact_kernel = idx.probe_kernel(THRESHOLD, nprobe=None)
    t0 = time.perf_counter()
    exact_hits = exact_kernel.matches(dup_q)
    exact_probe_s = time.perf_counter() - t0
    planted_recall = float(np.mean(
        [f"v{2 * i:08d}" in m for i, m in enumerate(exact_hits)]))

    kernel = idx.probe_kernel(THRESHOLD, nprobe=4)
    mixed = dup_q + fresh_q
    t0 = time.perf_counter()
    hits = kernel.matches(mixed)
    probe_s = time.perf_counter() - t0
    dup_hit = sum(bool(m) for m in hits[:100])
    fresh_hit = sum(bool(m) for m in hits[100:])

    out = {
        "metric": "vecindex_maintenance_stress",
        "n_base": n_base, "dim": DIM, "n_cells": N_CELLS,
        "n_update": n_update, "n_epochs": n_epochs,
        "num_cpus": num_cpus, "planted_pairs": n_planted,
        "base_commit_s": round(base_commit_s, 2),
        "index_build_s": round(build_s, 2),
        "build_rows_scanned": build["rows_scanned"],
        "epochs": epochs,
        "mean_refresh_s": round(
            float(np.mean([x["refresh_s"] for x in epochs])), 3),
        "mean_rows_scanned": int(
            np.mean([x["rows_scanned"] for x in epochs])),
        "scan_ratio_vs_rebuild": round(
            build["rows_scanned"]
            / max(1, np.mean([x["rows_scanned"] for x in epochs])), 1),
        "refresh_ratio_vs_rebuild": round(
            rebuild_s / max(1e-9, np.mean([x["refresh_s"]
                                           for x in epochs])), 1),
        "rebuild_s": round(rebuild_s, 2),
        "search_exact_s": round(search_s, 2),
        "maintained_equals_rebuild": bool(search_equal),
        "recall_nprobe8_of_64": round(recall_nprobe8, 4),
        "planted_recall_exact_probe": round(planted_recall, 4),
        "exact_probe_queries_per_s": round(
            len(dup_q) / exact_probe_s, 1),
        "probe_nprobe4_queries_per_s": round(len(mixed) / probe_s, 1),
        "probe_dup_hits": dup_hit, "probe_fresh_hits": fresh_hit,
        "driver_rss_mib_delta": round(rss_mib() - rss0, 1),
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

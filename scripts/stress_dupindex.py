"""Near-dup index maintenance at scale (state/dupindex.LakeMinHashIndex).

The scale claim under test: per-commit maintenance cost is the
COMMIT'S write amplification, never the corpus — while reads stay
honest (pairs() at the maintained head ≡ a from-scratch rebuild, and
planted near-dup pairs are all found).

Shape (the 100-TB pattern — small commits into a big table):
  base: N docs committed once (merge-on-read lake), P planted near-dup
    pairs inside a reserved id block; index built full (cost ∝ corpus).
  then K update epochs of M docs each: fresh texts from a reserved
    update block, plus Pe updates per epoch that turn a doc into a
    near-copy of a live never-updated doc (new planted pairs). After
    every commit: idx.refresh() — wall + rows_scanned recorded; MOR
    key-restricted diffs bound the scan to ~2×M rows per commit.
  end: planted-pair recall via pairs(); maintained pair set compared
    EXACTLY against a fresh full-rebuild index at the same head;
    admission-probe (near_dups kernel) latency over 200 queries.

All texts are pure functions text_of(id, version) — the oracle needs
no driver-side text table, so driver RSS stays flat.

Usage: python scripts/stress_dupindex.py [n_base] [n_update] [n_epochs]
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

VOCAB = np.array([f"tok{i:04d}" for i in range(4000)], dtype=object)
P_FRAC = 0.01          # planted base pairs as a fraction of n_base
PE = 50                # planted new pairs per update epoch
IDX = dict(num_perm=32, bands=8, shingle_k=5, seed=11,
           num_partitions=64, threshold=0.6, max_bucket=200)


def text_of(i: int, version: int) -> str:
    rng = np.random.default_rng((int(i) << 8) ^ version ^ 0xC0FFEE)
    return " ".join(VOCAB[rng.integers(0, len(VOCAB), size=30)])


def perturb(text: str) -> str:
    words = text.split()
    words[3] = "zzqx"          # one swapped word of 30: J(char-5) ~ 0.85
    return " ".join(words)


def batch_table(ids, texts, seqs, ts) -> pa.Table:
    return pa.table({
        "op": pa.array(["update"] * len(ids)),
        "seq": pa.array(seqs, type=pa.int64()),
        "url": pa.array([f"u{i:08d}" for i in ids]),
        "warc_ts": pa.array([pd.Timestamp(ts, unit="s")] * len(ids)),
        "text": pa.array(texts),
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

    from chomper_ray.state.dupindex import LakeMinHashIndex
    from chomper_ray.state.lake import LakeTable

    rss0 = rss_mib()
    root = Path(tempfile.mkdtemp(prefix="dupindex_stress_"))
    lake = LakeTable(root / "lake", key="url", num_partitions=32,
                     merge_on_read=True, collect_changes=False)

    # ---- base corpus: distinct texts + P planted pairs at (2i, 2i+1)
    n_planted = int(n_base * P_FRAC) // 2
    planted = [(2 * i, 2 * i + 1) for i in range(n_planted)]

    def gen_base(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        texts = [text_of(i, 0) for i in ids]
        for j, i in enumerate(ids):
            if i < 2 * n_planted and i % 2 == 1:
                texts[j] = perturb(text_of(i - 1, 0))
        return batch_table(ids, texts, ids, 10)

    t0 = time.perf_counter()
    base_ds = rd.range(n_base).map_batches(
        lambda b: pa.table({"id": b["id"]}), batch_format="pyarrow") \
        .map_batches(gen_base, batch_format="pyarrow")
    lake.commit_epoch(base_ds, 0)
    base_commit_s = time.perf_counter() - t0

    idx = LakeMinHashIndex(lake, root / "mh", **IDX)
    t0 = time.perf_counter()
    build = idx.refresh()["applied"][0]
    build_s = time.perf_counter() - t0

    # ---- K small update epochs; planted new pairs reference
    # never-updated live docs (their base-version text is a pure fn)
    upd_lo = 2 * n_planted + 2 * PE * n_epochs      # fresh-text block
    src_lo = 2 * n_planted                           # per-epoch pair block
    epochs = []
    for e in range(1, n_epochs + 1):
        rng = np.random.default_rng(1000 + e)
        fresh = rng.choice(np.arange(upd_lo, n_base),
                           size=n_update - PE, replace=False)
        dup_dst = np.arange(src_lo + 2 * PE * (e - 1),
                            src_lo + 2 * PE * e, 2) + 1
        ids = np.concatenate([fresh, dup_dst])
        texts = [text_of(i, e) for i in fresh] + \
                [perturb(text_of(i - 1, 0)) for i in dup_dst]
        for d in dup_dst:
            planted.append((int(d) - 1, int(d)))
        t0 = time.perf_counter()
        lake.commit_epoch(rd.from_arrow(batch_table(
            ids, texts, 10_000_000 * e + np.arange(len(ids)), 10 + e)), e)
        commit_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        seg = idx.refresh()["applied"][0]
        refresh_s = time.perf_counter() - t0
        epochs.append({"commit_s": round(commit_s, 3),
                       "refresh_s": round(refresh_s, 3),
                       "rows_scanned": seg["rows_scanned"],
                       "band_rows": seg["band_rows"]})

    # ---- reads: planted recall + exact rebuild equivalence
    t0 = time.perf_counter()
    got = idx.pairs().to_pandas()
    pairs_s = time.perf_counter() - t0
    got_set = set(zip(got["a"], got["b"]))
    want = {(f"u{a:08d}", f"u{b:08d}") for a, b in planted}
    recall = len(want & got_set) / len(want)

    fresh_idx = LakeMinHashIndex(lake, root / "mh2", **IDX)
    t0 = time.perf_counter()
    fresh_idx.refresh()
    rebuild_s = time.perf_counter() - t0
    fresh_df = fresh_idx.pairs().to_pandas()
    fresh_set = set(zip(fresh_df["a"], fresh_df["b"]))

    # ---- admission-probe latency (the ingest-time gate's kernel)
    kernel = idx.probe_kernel()
    queries = [perturb(text_of(2 * i, 0)) for i in range(100)] + \
              [text_of(n_base + i, 99) for i in range(100)]
    t0 = time.perf_counter()
    hits = sum(bool(m) for m in kernel.matches(queries))
    probe_s = time.perf_counter() - t0

    out = {
        "metric": "dupindex_maintenance_stress",
        "n_base": n_base, "n_update": n_update, "n_epochs": n_epochs,
        "num_cpus": num_cpus, "planted_pairs": len(want),
        "base_commit_s": round(base_commit_s, 2),
        "index_build_s": round(build_s, 2),
        "build_rows_scanned": build["rows_scanned"],
        "build_band_rows": build["band_rows"],
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
        "pairs_read_s": round(pairs_s, 2),
        "pairs_found": len(got_set),
        "planted_recall": round(recall, 4),
        "rebuild_pairs_s": round(rebuild_s, 2),
        "maintained_equals_rebuild": got_set == fresh_set,
        "probe_queries_per_s": round(len(queries) / probe_s, 1),
        "probe_hit_sanity": hits,
        "driver_rss_mib_delta": round(rss_mib() - rss0, 1),
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

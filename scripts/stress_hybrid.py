"""Hybrid RRF retrieval (state/retrieval.hybrid_rrf) at scale over the
two maintained indexes.

The scale claims under test:
  1. fused query latency is bounded by the two index reads (BM25 opens
     <= one bucket file per segment per token; ANN ships per-cell
     top-(fetch_k+slack)) — never a corpus scan in the driver;
  2. per-commit maintenance keeps BOTH indexes fresh at a cost bound by
     the commit, and the fused answer over the maintained chains equals
     a from-scratch rebuild of both indexes at the same head;
  3. (smoke scale) the fused ranking equals a brute-force recompute
     (BM25 formula + cosine + RRF in plain numpy/pandas) over the live
     lake state.

All docs are pure functions of their id — no driver-side corpus table,
driver RSS stays flat.

Usage: python scripts/stress_hybrid.py [n_docs] [num_cpus]
       (defaults 1_000_000 32; smoke: 100000 8 — brute check runs
        only when n_docs <= 200_000)
"""

import json
import resource
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
import pyarrow as pa

DIM = 32
VOCAB = 20_000
DOC_LEN = 40
N_UPDATE = 5_000
TOKENS = ["w00001234", "w00004321"]
K, FETCH_K = 10, 100


def words_of(i: int, version: int) -> np.ndarray:
    rng = np.random.default_rng((int(i) << 6) ^ version ^ 0xFACE)
    return rng.integers(0, VOCAB, size=DOC_LEN)


def text_of(i: int, version: int) -> str:
    return " ".join(f"w{w:08d}" for w in words_of(i, version))


def vec_of(i: int, version: int) -> np.ndarray:
    rng = np.random.default_rng((int(i) << 8) ^ version ^ 0xCAFE)
    return rng.normal(size=DIM)


def batch_table(ids, version) -> pa.Table:
    return pa.table({
        "op": pa.array(["update"] * len(ids)),
        "seq": pa.array(np.asarray(ids, dtype=np.int64)
                        + version * 100_000_000),
        "url": pa.array([f"u{i:08d}" for i in ids]),
        "warc_ts": pa.array([pd.Timestamp(10 + version, unit="s")]
                            * len(ids)),
        "text": pa.array([text_of(i, version) for i in ids]),
        "embedding": pa.array([vec_of(i, version).tolist()
                               for i in ids], type=pa.list_(pa.float32())),
    })


def rss_mib() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def brute_hybrid(lake, tokens, qvec, k, fetch_k, k0=60, nd=6):
    """Vectorized brute recompute over the live state (smoke scale)."""
    live = lake.read_pandas()
    keys = live["url"].to_numpy()
    toks = live["text"].fillna("").str.split(" ")
    dl = toks.str.len().to_numpy(np.float64)
    n, avgdl = float(len(live)), dl.mean()
    k1, b = 1.2, 0.75
    score = pd.Series(0.0, index=range(len(live)))
    hit_any = np.zeros(len(live), dtype=bool)
    for w in dict.fromkeys(tokens):
        tf = toks.apply(lambda t, w=w: t.count(w)).to_numpy(np.float64)
        m = tf > 0
        if not m.any():
            continue
        df_ = float(m.sum())
        idf = np.log((n - df_ + 0.5) / (df_ + 0.5) + 1.0)
        score[m] += (idf * tf[m] * (k1 + 1.0)
                     / (tf[m] + k1 * (1.0 - b + b * dl[m] / avgdl)))
        hit_any |= m
    bm = pd.DataFrame({"doc": keys[hit_any],
                       "s": np.round(score[hit_any].to_numpy(), nd)})
    bm = bm.sort_values(["s", "doc"], ascending=[False, True],
                        kind="stable")
    rb = {d: r + 1 for r, d in enumerate(bm["doc"]) if r < fetch_k}

    m = np.stack(live["embedding"].to_numpy()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    q = np.asarray(qvec, np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    cs = np.round(m @ q, nd)
    co = pd.DataFrame({"doc": keys, "s": cs}).sort_values(
        ["s", "doc"], ascending=[False, True], kind="stable")
    rc = {d: r + 1 for r, d in enumerate(co["doc"]) if r < fetch_k}

    rows = []
    for d in set(rb) | set(rc):
        r1, r2 = rb.get(d, 0), rc.get(d, 0)
        rrf = (1.0 / (k0 + r1) if r1 else 0.0) + \
              (1.0 / (k0 + r2) if r2 else 0.0)
        rows.append((d, r1, r2, rrf))
    rows.sort(key=lambda t: (-t[3], t[0]))
    return pd.DataFrame(rows[:k],
                        columns=["doc", "r_bm25", "r_cos", "rrf"]) \
        .assign(rrf=lambda d: d["rrf"].round(9))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.state.annindex import LakeANNIndex
    from chomper_ray.state.index import LakeTextIndex
    from chomper_ray.state.lake import LakeTable
    from chomper_ray.state.retrieval import hybrid_rrf

    rss0 = rss_mib()
    root = Path(tempfile.mkdtemp(prefix="hybrid_stress_"))
    lake = LakeTable(root / "lake", key="url", num_partitions=32,
                     merge_on_read=True, collect_changes=False)

    t0 = time.perf_counter()
    base = rd.range(n_docs).map_batches(
        lambda b: batch_table(b["id"].to_numpy(), 0),
        batch_format="pyarrow")
    lake.commit_epoch(base, 0)
    base_s = time.perf_counter() - t0

    tidx = LakeTextIndex(lake, root / "tix", num_partitions=64)
    aidx = LakeANNIndex(lake, root / "aix", n_cells=64)
    t0 = time.perf_counter()
    tidx.refresh()
    tix_build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    aidx.refresh()
    aix_build_s = time.perf_counter() - t0

    qvec = vec_of(999_999_999, 7)

    def timed_query(nprobe):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = hybrid_rrf(tidx, aidx, TOKENS, qvec, k=K,
                             fetch_k=FETCH_K, nprobe=nprobe)
            best = min(best, time.perf_counter() - t0)
        return best, out

    q_exact_s, top_exact = timed_query(None)
    q_pruned_s, _ = timed_query(8)

    # small update commit -> both indexes fold it
    rng = np.random.default_rng(77)
    upd = rng.choice(n_docs, size=min(N_UPDATE, n_docs // 10),
                     replace=False)
    t0 = time.perf_counter()
    lake.commit_epoch(rd.from_arrow(batch_table(upd, 1)), 1)
    commit_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    tidx.refresh()
    tix_refresh_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    aidx.refresh()
    aix_refresh_s = time.perf_counter() - t0
    q2_s, top2 = timed_query(None)

    # batched workload: N queries through hybrid_rrf_batch in ONE pass
    # (distinct tokens scored once, one stacked ANN search) vs the
    # per-query loop — the round-4 verdict's "thousands of queries"
    # design note made real. Batch equality vs per-query is asserted.
    from chomper_ray.state.retrieval import hybrid_rrf_batch

    n_batch = 64
    brng = np.random.default_rng(123)
    qdf = pd.DataFrame({
        "qid": np.arange(n_batch, dtype=np.int64),
        "tokens": [[f"w{int(w):08d}" for w in
                    brng.integers(0, VOCAB, size=2)]
                   for _ in range(n_batch)],
        "vec": [list(vec_of(10_000_000 + i, 3)) for i in range(n_batch)]})
    t0 = time.perf_counter()
    bout = hybrid_rrf_batch(tidx, aidx, qdf, k=K, fetch_k=FETCH_K,
                            nprobe=8)
    batch_wall_s = time.perf_counter() - t0
    # spot-check 4 queries against the per-query path
    batch_equals_single = True
    for i in (0, 17, 33, n_batch - 1):
        single = hybrid_rrf(tidx, aidx, qdf["tokens"].iloc[i],
                            qdf["vec"].iloc[i], k=K, fetch_k=FETCH_K,
                            nprobe=8)
        mine = bout[bout["qid"] == i].drop(columns=["qid"]) \
            .reset_index(drop=True)
        if not mine.equals(single):
            batch_equals_single = False
    t0 = time.perf_counter()
    for i in range(8):
        hybrid_rrf(tidx, aidx, qdf["tokens"].iloc[i],
                   qdf["vec"].iloc[i], k=K, fetch_k=FETCH_K, nprobe=8)
    loop_wall_8_s = time.perf_counter() - t0

    # maintained chains == from-scratch rebuild at the same head
    t2 = LakeTextIndex(lake, root / "tix2", num_partitions=64)
    a2 = LakeANNIndex(lake, root / "aix2", n_cells=64)
    t2.refresh()
    a2.refresh()
    rebuilt = hybrid_rrf(t2, a2, TOKENS, qvec, k=K, fetch_k=FETCH_K)
    rebuild_equal = rebuilt.equals(top2)

    brute_equal = None
    if n_docs <= 200_000:
        brute_equal = brute_hybrid(
            lake, TOKENS, qvec, K, FETCH_K).equals(
            top2.reset_index(drop=True))

    print(json.dumps({
        "n_docs": n_docs, "num_cpus": num_cpus,
        "base_commit_s": round(base_s, 2),
        "text_index_build_s": round(tix_build_s, 2),
        "ann_index_build_s": round(aix_build_s, 2),
        "hybrid_query_exact_s": round(q_exact_s, 3),
        "hybrid_query_nprobe8_s": round(q_pruned_s, 3),
        "update_commit_s": round(commit_s, 2),
        "text_refresh_small_commit_s": round(tix_refresh_s, 2),
        "ann_refresh_small_commit_s": round(aix_refresh_s, 2),
        "hybrid_query_after_commit_s": round(q2_s, 3),
        "batch_n_queries": n_batch,
        "batch_wall_s": round(batch_wall_s, 3),
        "batch_queries_per_s": round(n_batch / batch_wall_s, 1),
        "per_query_loop_queries_per_s": round(8 / loop_wall_8_s, 1),
        "batch_speedup": round((loop_wall_8_s / 8)
                               / (batch_wall_s / n_batch), 1),
        "batch_equals_single": bool(batch_equals_single),
        "rebuild_equal": bool(rebuild_equal),
        "brute_equal": brute_equal,
        "top1": str(top_exact["doc"].iloc[0]),
        "driver_rss_delta_mib": round(rss_mib() - rss0, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

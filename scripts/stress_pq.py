"""IVF-PQ stress: 10^6 64-dim vectors with planted near-twins through
`ivfpq_build_index` + `ivfpq_search` — the "would this survive a
100 TB embedding corpus" probe for the cell-partitioned residual-code
layout.

What it demonstrates at scale-on-one-node:
- vectors are synthesized INSIDE tasks (seeded per shard; the planted
  twin of query i is vector n+i, offset by tiny noise — the
  unambiguous true top-1);
- the index build writes 32×-compressed codes cell-partitioned; the
  search reads ONLY nprobe/ncells of the files and ADC-scans codes —
  both measured;
- R@10 (the PQ paper's metric: true nearest neighbor inside ADC
  top-10) reported over 32 queries; driver RSS stays flat.

Usage: python scripts/stress_pq.py [n_vectors] [num_cpus]
Writes one JSON line.
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

SHARD = 50_000
D = 64
NQ = 32


def rss_mib() -> int:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


def shard_vectors(s: int, n: int) -> np.ndarray:
    d0, d1 = s * SHARD, min((s + 1) * SHARD, n)
    rng = np.random.default_rng(9000 + s)
    return rng.standard_normal((d1 - d0, D)).astype(np.float32)


def queries_and_twins(n: int) -> tuple[np.ndarray, np.ndarray]:
    q = shard_vectors(0, n)[:NQ]
    rng = np.random.default_rng(31337)
    twins = q + rng.standard_normal((NQ, D)).astype(np.float32) * 0.03
    return q, twins


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.stages.similarity import (ivfpq_build_index,
                                               ivfpq_fit, ivfpq_search)

    n_shards = (n + SHARD - 1) // SHARD
    q, twins = queries_and_twins(n)

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        s = int(df["s"].iloc[0])
        v = shard_vectors(s, n)
        ids = np.arange(s * SHARD, s * SHARD + len(v), dtype=np.int64)
        out = pd.DataFrame({"vec_id": ids, "embedding": list(v)})
        if s == 0:  # plant the twins with ids n..n+NQ-1
            out = pd.concat([out, pd.DataFrame({
                "vec_id": np.arange(n, n + NQ, dtype=np.int64),
                "embedding": list(twins)})], ignore_index=True)
        return out

    ds = rd.range(n_shards).map_batches(
        lambda df: df.rename(columns={"id": "s"}), batch_format="pandas") \
        .repartition(n_shards).map_batches(gen, batch_format="pandas")

    model = ivfpq_fit(shard_vectors(1, n)[:20_000], n_cells=64,
                      m_subs=8, k_codes=64)
    root = tempfile.mkdtemp(prefix="chomper_ivfpq_stress_")
    rss0 = rss_mib()
    t0 = time.perf_counter()
    ivfpq_build_index(ds, model, root)
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    got = ivfpq_search(root, q, k=10, nprobe=8).to_pandas()
    search_s = time.perf_counter() - t0
    rss1 = rss_mib()

    r10 = sum((n + qi) in set(got.loc[got["query_id"] == qi, "vec_id"])
              for qi in range(NQ))
    idx_bytes = sum(f.stat().st_size for f in Path(root).rglob("*.parquet"))

    print(json.dumps({
        "metric": "ivfpq_stress_sec", "value": round(build_s + search_s, 2),
        "build_sec": round(build_s, 2), "search_sec": round(search_s, 2),
        "n_vectors": n + NQ, "dim": D, "n_queries": NQ,
        "r_at_10": r10, "r_at_10_frac": round(r10 / NQ, 3),
        "index_mib": round(idx_bytes / 2**20, 1),
        "raw_mib": round((n + NQ) * D * 4 / 2**20, 1),
        "vectors_per_sec_build": round((n + NQ) / build_s),
        "driver_rss_mib_before": rss0, "driver_rss_mib_after": rss1,
        "num_cpus": num_cpus,
    }))
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

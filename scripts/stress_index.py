"""Inverted-index stress: 10^6 docs (~2×10^7 postings) through
`build_inverted_index` + `search_index` — the corpus-search probe.

- docs synthesized INSIDE tasks from a Zipf-ish vocab; a marker token
  is planted in every 13th doc and a second marker in every 91st, so
  AND/OR result sets have exact closed forms;
- the build pays one postings exchange; the queries then read ≤ one
  bucket file per token — query latency is measured separately from
  the build;
- result counts AND an id checksum must equal the closed form; driver
  RSS stays flat.

Usage: python scripts/stress_index.py [n_docs] [num_cpus]
"""

import json
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

SHARD = 25_000
TOKENS_PER_DOC = 20
VOCAB = 50_000
P = 1_000_003


def rss_mib() -> int:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


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

    from chomper_ray.state.index import build_inverted_index, search_index

    n_shards = (n + SHARD - 1) // SHARD

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        s = int(df["s"].iloc[0])
        d0, d1 = s * SHARD, min((s + 1) * SHARD, n)
        rng = np.random.default_rng(7000 + s)
        ids = np.arange(d0, d1, dtype=np.int64)
        toks = rng.integers(0, VOCAB, (len(ids), TOKENS_PER_DOC))
        texts = []
        for i, did in enumerate(ids):
            ws = [f"t{v}" for v in toks[i]]
            if did % 13 == 0:
                ws.append("markerA")
            if did % 91 == 0:
                ws.append("markerB")
            texts.append(" ".join(ws))
        return pd.DataFrame({"doc_id": ids, "text": texts})

    ds = rd.range(n_shards).map_batches(
        lambda df: df.rename(columns={"id": "s"}), batch_format="pandas") \
        .repartition(n_shards).map_batches(gen, batch_format="pandas")

    import tempfile

    root = tempfile.mkdtemp(prefix="chomper_idx_stress_")
    rss0 = rss_mib()
    t0 = time.perf_counter()
    st = build_inverted_index(ds, root, num_partitions=4 * num_cpus)
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    both = search_index(root, ["markerA", "markerB"], mode="all")
    either = search_index(root, ["markerA", "markerB"], mode="any")
    query_s = time.perf_counter() - t0
    rss1 = rss_mib()

    ids = np.arange(n, dtype=np.int64)
    exp_both = ids[(ids % 13 == 0) & (ids % 91 == 0)]
    exp_any = ids[(ids % 13 == 0) | (ids % 91 == 0)]
    ok = (len(both) == len(exp_both)
          and int(both.sum() % P) == int(exp_both.sum() % P)
          and len(either) == len(exp_any)
          and int(either.sum() % P) == int(exp_any.sum() % P))

    print(json.dumps({
        "metric": "inverted_index_stress_sec",
        "value": round(build_s + query_s, 2),
        "build_sec": round(build_s, 2), "query_sec": round(query_s, 3),
        "n_docs": n, "postings": st["postings"],
        "and_hits": len(both), "or_hits": len(either),
        "exact": bool(ok),
        "postings_per_sec_build": round(st["postings"] / build_s),
        "driver_rss_mib_before": rss0, "driver_rss_mib_after": rss1,
        "num_cpus": num_cpus,
    }))
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

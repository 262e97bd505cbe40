"""Decontamination stress: 10^6-doc corpus vs a 10^4-doc benchmark
through `dedup.decontaminate` — the "would this survive 100 TB" probe
for the broadcast-n-gram-set plan.

Construction makes the expected result EXACT:
- benchmark tokens come from a disjoint id domain (offset 2^24), so a
  corpus doc can only share an n-gram with the benchmark if we planted
  it;
- every doc with i % 37 == 1 gets an n-token phrase spliced in from
  benchmark doc i % n_bench — so expected flags = |{i : i % 37 == 1}|,
  and the measured flag count must equal it exactly (hash collisions
  aside, ~#ngrams^2/2^64).

What it demonstrates at scale-on-one-node: corpus synthesized INSIDE
tasks (no driver-side frame), the benchmark n-gram set built
distributed and broadcast once (~2 MB), flags consumed by a streaming
sum — driver RSS stays flat end-to-end.

Usage: python scripts/stress_decontaminate.py [n_docs] [num_cpus]
Writes one JSON line.
"""

import json
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

N = 8             # n-gram order
DOC_LEN = 50      # corpus tokens per doc
BENCH_LEN = 30    # benchmark tokens per doc
N_BENCH = 10_000
SPLICE_AT = 5


def rss_mib() -> int:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


def _mix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + b.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9))
        h ^= h >> np.uint64(31)
    return h


def corpus_words(i: np.ndarray, pos: np.ndarray) -> np.ndarray:
    return _mix(i, pos) % np.uint64(1 << 24)


def bench_words(j: np.ndarray, pos: np.ndarray) -> np.ndarray:
    # disjoint id domain: corpus can never contain these by accident
    return (_mix(j + np.uint64(1 << 40), pos) % np.uint64(1 << 24)) \
        + np.uint64(1 << 24)


def make_docs(ids: np.ndarray, length: int, words_fn) -> list[str]:
    ii = np.repeat(ids.astype(np.uint64), length)
    pp = np.tile(np.arange(length, dtype=np.uint64), len(ids))
    w = words_fn(ii, pp).reshape(len(ids), length)
    return [" ".join(map(str, row)) for row in w]


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.stages.dedup import decontaminate

    shard = 25_000
    n_shards = (n_docs + shard - 1) // shard

    def gen_corpus(batch: pd.DataFrame) -> pd.DataFrame:
        s = int(batch["s"].iloc[0])
        i0, i1 = s * shard, min((s + 1) * shard, n_docs)
        ids = np.arange(i0, i1, dtype=np.uint64)
        ii = np.repeat(ids, DOC_LEN)
        pp = np.tile(np.arange(DOC_LEN, dtype=np.uint64), len(ids))
        w = corpus_words(ii, pp).reshape(len(ids), DOC_LEN)
        planted = (ids % 37) == 1
        if planted.any():
            j = (ids[planted] % N_BENCH).astype(np.uint64)
            jj = np.repeat(j, N)
            qq = np.tile(np.arange(N, dtype=np.uint64), len(j))
            phrase = bench_words(jj, qq).reshape(len(j), N)
            w[planted, SPLICE_AT:SPLICE_AT + N] = phrase
        texts = [" ".join(map(str, row)) for row in w]
        return pd.DataFrame({"doc_id": ids.astype(np.int64),
                             "text": texts})

    corpus = rd.range(n_shards).map_batches(
        lambda df: df.rename(columns={"id": "s"}), batch_format="pandas") \
        .repartition(n_shards) \
        .map_batches(gen_corpus, batch_format="pandas")

    def gen_bench(batch: pd.DataFrame) -> pd.DataFrame:
        js = batch["id"].to_numpy().astype(np.uint64)
        return pd.DataFrame({
            "doc_id": js.astype(np.int64),
            "text": make_docs(js, BENCH_LEN, bench_words)})

    bench = rd.range(N_BENCH).repartition(8) \
        .map_batches(gen_bench, batch_format="pandas")

    expected = int(np.sum((np.arange(n_docs) % 37) == 1))

    rss0 = rss_mib()
    t0 = time.perf_counter()
    flagged = decontaminate(corpus, bench, n=N)
    n_flagged = int(flagged.sum("contaminated"))
    wall = time.perf_counter() - t0
    rss1 = rss_mib()

    print(json.dumps({
        "metric": "decontaminate_stress_sec",
        "value": round(wall, 2),
        "n_docs": n_docs,
        "n_bench": N_BENCH,
        "docs_per_sec": round(n_docs / wall),
        "planted": expected,
        "flagged": n_flagged,
        "exact": n_flagged == expected,
        "driver_rss_mib_before": rss0,
        "driver_rss_mib_after": rss1,
        "num_cpus": num_cpus,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Keep-first line-dedup stress: 10^6 docs x 10 lines (10^7 line
occurrences, ~half duplicated) through `text.dedup_lines` — the
"would this survive 100 TB" probe for the explode -> keep-first
combiner -> winners-only reassembly -> spine-join plan.

What it demonstrates at scale-on-one-node:
- the corpus is synthesized INSIDE tasks (no driver-side 10^7-row
  frame) and the result is consumed by a streaming aggregate that
  re-parses kept lines — text never collects on the driver;
- the result is EXACT: survivor count, the sum of survivor line
  values, and a (doc_id x value) checksum all equal a numpy oracle
  computed from the same per-shard seeded generation
  (np.unique(return_index) gives keep-first in closed form);
- driver RSS stays flat through the line shuffle and the join.

Usage: python scripts/stress_line_dedup.py [n_docs] [num_cpus]
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

L = 10            # lines per doc
POOL = 200_000    # hot pool: ~50% of occurrences collide here
WIDE = 1 << 40    # cold range: mostly unique
SHARD = 25_000    # docs per generation task


def rss_mib() -> int:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


def shard_values(s: int, n_docs: int) -> np.ndarray:
    """Line values for doc range [s*SHARD, ...) — same function drives
    the in-task generator AND the driver-side numpy oracle."""
    d0, d1 = s * SHARD, min((s + 1) * SHARD, n_docs)
    rng = np.random.default_rng(1000 + s)
    n = (d1 - d0) * L
    hot = rng.integers(0, POOL, n)
    cold = rng.integers(POOL, WIDE, n)
    take_hot = rng.random(n) < 0.5
    return np.where(take_hot, hot, cold).astype(np.int64)


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

    from chomper_ray.pipelines.relational import grouped_agg
    from chomper_ray.stages.text import dedup_lines

    n_shards = (n_docs + SHARD - 1) // SHARD

    def gen_docs(df: pd.DataFrame) -> pd.DataFrame:
        s = int(df["s"].iloc[0])
        d0 = s * SHARD
        vals = shard_values(s, n_docs)
        nd = len(vals) // L
        texts = ["\n".join(f"line {v}" for v in vals[i * L:(i + 1) * L])
                 for i in range(nd)]
        return pd.DataFrame({
            "doc_id": np.arange(d0, d0 + nd, dtype=np.int64),
            "text": texts,
        })

    docs = rd.range(n_shards).map_batches(
        lambda df: df.rename(columns={"id": "s"}), batch_format="pandas") \
        .repartition(n_shards) \
        .map_batches(gen_docs, batch_format="pandas")

    rss0 = rss_mib()
    t0 = time.perf_counter()
    out = dedup_lines(docs, num_partitions=4 * num_cpus)

    # streaming consumption: re-parse kept lines per doc, aggregate
    def parse(df: pd.DataFrame) -> pd.DataFrame:
        kept = df["text_dedup"].fillna("")
        s = kept.str.split("\n").explode()
        s = s[s.str.len() > 0]
        doc = df["doc_id"].reindex(s.index).to_numpy(np.int64)
        v = s.str.slice(5).astype("int64").to_numpy()
        return pd.DataFrame({
            "m": v % 16,
            "n": 1,
            "sv": v % 1_000_003,
            "chk": (doc * (v % 997 + 1)) % 1_000_003,
        })

    agg = grouped_agg(out.map_batches(parse, batch_format="pandas"),
                      keys=["m"], sums=["n", "sv", "chk"]).to_pandas()
    wall = time.perf_counter() - t0
    rss1 = rss_mib()

    survivors = int(agg["sum_n"].sum())

    # numpy oracle: keep-first = np.unique(return_index) over the
    # concatenated generation (global order IS (doc_id, line_no))
    all_vals = np.concatenate([shard_values(s, n_docs)
                               for s in range(n_shards)])
    uniq, first_idx = np.unique(all_vals, return_index=True)
    o_doc = (first_idx // L).astype(np.int64)
    o_m = uniq % 16
    o_surv = len(uniq)
    ok_n = ok_sv = ok_chk = True
    got = agg.set_index("m")
    for m in range(16):
        sel = o_m == m
        ok_n &= int(got["sum_n"].get(m, 0)) == int(sel.sum())
        ok_sv &= int(got["sum_sv"].get(m, 0)) == int(
            (uniq[sel] % 1_000_003).sum())
        ok_chk &= int(got["sum_chk"].get(m, 0)) == int(
            ((o_doc[sel] * (uniq[sel] % 997 + 1)) % 1_000_003).sum())

    print(json.dumps({
        "metric": "line_dedup_stress_sec", "value": round(wall, 2),
        "n_docs": n_docs, "n_lines": n_docs * L,
        "survivors": survivors, "oracle_survivors": o_surv,
        "survivors_exact": survivors == o_surv,
        "sum_exact": bool(ok_n and ok_sv),
        "checksum_exact": bool(ok_chk),
        "lines_per_sec": round(n_docs * L / wall),
        "driver_rss_mib_before": rss0, "driver_rss_mib_after": rss1,
        "num_cpus": num_cpus,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

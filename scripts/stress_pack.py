"""Sequence-packing scale stress (stages/text.py pack_sequences).

The claims under test at 10^6 documents:
- the packing shuffle moves only (key, n_tokens) PAIRS, never text, so
  driver RSS stays flat and wall is minutes-not-hours;
- the output is EXACT at scale: token spans cover every document
  completely and every example except the last is exactly seq_len
  tokens (validated distributively with one grouped aggregate, not a
  driver loop).

Usage: python scripts/stress_pack.py [n_docs] [num_cpus]
Writes one JSON line (progress on stderr).
"""

import json
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
import pyarrow as pa


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    L = 512

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.stages.text import pack_sequences

    # deterministic synthetic docs: doc i has 20 + (i*7919) % 400
    # whitespace tokens (prime stride -> no accidental alignment)
    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        k = 20 + (ids * 7919) % 400
        return pd.DataFrame({
            "doc_id": ids,
            "text": ["w " * int(n) for n in k]})

    docs = rd.range(n_docs).map_batches(gen, batch_format="pandas")
    expected_tokens = int(np.sum(20 + (np.arange(n_docs,
                                                 dtype=np.int64)
                                       * 7919) % 400))

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    t0 = time.perf_counter()
    spans = pack_sequences(docs, seq_len=L, num_partitions=64) \
        .materialize()
    pack_s = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    n_rows = spans.count()
    log(f"packed {n_rows} span rows in {pack_s:.1f}s")

    # distributive validation: per-example width sums
    t0 = time.perf_counter()
    widths = spans.map_batches(
        lambda df: pd.DataFrame({
            "example_id": df["example_id"],
            "w": df["tok_hi"] - df["tok_lo"]}),
        batch_format="pandas").groupby("example_id").sum("w")
    agg = widths.map_batches(
        lambda df: pd.DataFrame({
            "n": [len(df)],
            "full": [int((df["sum(w)"] == L).sum())],
            "total": [int(df["sum(w)"].sum())],
            "max_eid": [int(df["example_id"].max())]}),
        batch_format="pandas").to_pandas()
    n_examples = int(agg["n"].sum())
    n_full = int(agg["full"].sum())
    total_tokens = int(agg["total"].sum())
    verify_s = time.perf_counter() - t0

    exact = (total_tokens == expected_tokens
             and n_full >= n_examples - 1
             and n_examples == (expected_tokens + L - 1) // L)
    out = {
        "metric": "pack_sequences_stress",
        "n_docs": n_docs, "seq_len": L, "num_cpus": num_cpus,
        "span_rows": n_rows, "examples": n_examples,
        "full_examples": n_full,
        "total_tokens": total_tokens,
        "expected_tokens": expected_tokens,
        "exact": bool(exact),
        "pack_s": round(pack_s, 2), "verify_s": round(verify_s, 2),
        "driver_rss_mib_before": rss0, "driver_rss_mib_after": rss1,
    }
    print(json.dumps(out))
    ray.shutdown()
    sys.exit(0 if exact else 1)


if __name__ == "__main__":
    main()

"""Interval-overlap-join stress: 10^7 left intervals x 10^4 right
intervals through `relational.interval_join` — the "would this survive
100 TB" probe for the both-sides-replicated overlap plan.

What it demonstrates at scale-on-one-node:
- pair volume lands distributed (the result is consumed by a streaming
  aggregate, never collected);
- driver RSS stays flat through replication, the union shuffle, and the
  in-bucket searchsorted expansion;
- the result is EXACT: total pair count and a per-interval-modulus
  checksum equal a numpy oracle computed from the generator parameters
  (left intervals have CONSTANT width W, so overlap with [rlo, rhi]
  reduces to l_lo in [rlo - W, rhi] — one searchsorted per right row).

Usage: python scripts/stress_interval_join.py [n_left] [n_right] [num_cpus]
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
import pyarrow as pa


def rss_mib() -> int:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


W = 500  # constant left-interval width (keeps the oracle one searchsorted)


def main():
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.pipelines.relational import grouped_agg, interval_join

    domain = 100_000_000
    rng = np.random.default_rng(23)
    rlo = rng.integers(0, domain, n_right).astype(np.int64)
    rwidth = rng.integers(0, 40_000, n_right).astype(np.int64)
    right = pd.DataFrame({"iid": np.arange(n_right, dtype=np.int64),
                          "lo": rlo, "hi": rlo + rwidth})
    right_ds = rd.from_arrow(
        pa.Table.from_pandas(right, preserve_index=False)).repartition(8)

    # left intervals generated INSIDE tasks (no driver-side 10^7-row
    # frame): start for global index i is (i*A) % domain, width W
    A = 2_654_435_761 % domain
    shard = 250_000
    n_shards = (n_left + shard - 1) // shard

    def gen_left(batch: pd.DataFrame) -> pd.DataFrame:
        s = int(batch["s"].iloc[0])
        i0, i1 = s * shard, min((s + 1) * shard, n_left)
        idx = np.arange(i0, i1, dtype=np.int64)
        lo = (idx * A) % domain
        return pd.DataFrame({"pid": idx, "p_lo": lo, "p_hi": lo + W})

    left = rd.range(n_shards).map_batches(
        lambda df: df.rename(columns={"id": "s"}), batch_format="pandas") \
        .repartition(n_shards) \
        .map_batches(gen_left, batch_format="pandas")

    left_schema = pa.schema([("pid", pa.int64()), ("p_lo", pa.int64()),
                             ("p_hi", pa.int64())])
    right_schema = pa.schema([("iid", pa.int64()), ("lo", pa.int64()),
                              ("hi", pa.int64())])

    rss0 = rss_mib()
    t0 = time.perf_counter()
    joined = interval_join(left, right_ds, l_lo="p_lo", l_hi="p_hi",
                           r_lo="lo", r_hi="hi",
                           num_buckets=4 * num_cpus,
                           left_schema=left_schema,
                           right_schema=right_schema)
    agg = joined.map_batches(
        lambda df: pd.DataFrame({
            "m": df["iid"].to_numpy() % 16,
            "n": 1,
            "chk": (df["pid"].to_numpy(np.int64)
                    * (df["iid"].to_numpy(np.int64) + 1)) % 1_000_003,
        }), batch_format="pandas")
    out = grouped_agg(agg, keys=["m"], sums=["n", "chk"]).to_pandas()
    wall = time.perf_counter() - t0
    rss1 = rss_mib()

    n_pairs = int(out["sum_n"].sum())

    # oracle: overlap([l, l+W], [rlo, rhi]) <=> l in [rlo - W, rhi]
    l_all = (np.arange(n_left, dtype=np.int64) * A) % domain
    order = np.argsort(l_all, kind="stable")
    l_sorted = l_all[order]
    starts = np.searchsorted(l_sorted, right["lo"].to_numpy() - W)
    ends = np.searchsorted(l_sorted, right["hi"].to_numpy(), side="right")
    oracle_pairs = int((ends - starts).sum())
    oracle_chk = np.zeros(16, dtype=np.int64)
    for t in range(n_right):
        if ends[t] > starts[t]:
            pid = order[starts[t]:ends[t]]
            oracle_chk[t % 16] += int(((pid * (t + 1)) % 1_000_003).sum())
    got_chk = out.set_index("m")["sum_chk"]
    chk_ok = all(int(got_chk.get(m, 0)) == int(oracle_chk[m])
                 for m in range(16))

    print(json.dumps({
        "metric": "interval_join_stress_sec", "value": round(wall, 2),
        "n_left": n_left, "n_right": n_right,
        "pairs": n_pairs, "oracle_pairs": oracle_pairs,
        "pairs_exact": n_pairs == oracle_pairs,
        "checksum_exact": bool(chk_ok),
        "pairs_per_sec": round(n_pairs / wall),
        "driver_rss_mib_before": rss0, "driver_rss_mib_after": rss1,
        "num_cpus": num_cpus,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Range-join stress: 10^7 points x 10^4 overlapping intervals through
`relational.range_join` — the "would this survive 100 TB" probe for the
chunked interval-containment plan.

What it demonstrates at scale-on-one-node:
- pair volume lands distributed (the result is consumed by a streaming
  aggregate, never collected);
- driver RSS stays flat through tagging, the union shuffle, and the
  in-bucket searchsorted expansion;
- the result is EXACT: total pair count and a per-point-modulus checksum
  equal a numpy oracle computed directly from the generator parameters.

Usage: python scripts/stress_range_join.py [n_points] [n_intervals] [num_cpus]
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


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_iv = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.pipelines.relational import grouped_agg, range_join

    domain = 100_000_000
    rng = np.random.default_rng(17)
    lo = rng.integers(0, domain, n_iv).astype(np.int64)
    width = rng.integers(0, 40_000, n_iv).astype(np.int64)
    ivs = pd.DataFrame({"iid": np.arange(n_iv, dtype=np.int64),
                        "lo": lo, "hi": lo + width})
    ivs_ds = rd.from_arrow(pa.Table.from_pandas(ivs, preserve_index=False)) \
        .repartition(8)

    # points generated INSIDE tasks (no driver-side 10^7-row frame):
    # point value for global index i is (i * A) % domain — a full-period
    # multiplicative walk, uniform over the domain, reproducible per task
    A = 2_654_435_761 % domain
    shard = 250_000
    n_shards = (n_points + shard - 1) // shard

    def gen_points(batch: pd.DataFrame) -> pd.DataFrame:
        s = int(batch["s"].iloc[0])
        i0, i1 = s * shard, min((s + 1) * shard, n_points)
        idx = np.arange(i0, i1, dtype=np.int64)
        return pd.DataFrame({"pid": idx,
                             "p": (idx * A) % domain})

    pts = rd.range(n_shards).map_batches(
        lambda df: df.rename(columns={"id": "s"}), batch_format="pandas") \
        .repartition(n_shards) \
        .map_batches(gen_points, batch_format="pandas")

    pts_schema = pa.schema([("pid", pa.int64()), ("p", pa.int64())])
    ivs_schema = pa.schema([("iid", pa.int64()), ("lo", pa.int64()),
                            ("hi", pa.int64())])

    rss0 = rss_mib()
    t0 = time.perf_counter()
    joined = range_join(pts, ivs_ds, point="p", num_buckets=4 * num_cpus,
                        left_schema=pts_schema, right_schema=ivs_schema)
    # consume with a streaming aggregate: pair count + checksum per
    # iid-modulus — never collect the pairs
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

    # exact oracle from the generator: for each interval, count/checksum
    # points with (idx*A) % domain in [lo, hi] — vectorized per interval
    # over the points' residue structure is overkill; instead recompute
    # the full point vector once in numpy (fits: 10^7 int64 = 80 MB)
    p_all = (np.arange(n_points, dtype=np.int64) * A) % domain
    order = np.argsort(p_all, kind="stable")
    p_sorted = p_all[order]
    starts = np.searchsorted(p_sorted, ivs["lo"].to_numpy())
    ends = np.searchsorted(p_sorted, ivs["hi"].to_numpy(), side="right")
    oracle_pairs = int((ends - starts).sum())
    oracle_chk = np.zeros(16, dtype=np.int64)
    ids_sorted = order  # pid of sorted position
    for t in range(n_iv):
        if ends[t] > starts[t]:
            pid = ids_sorted[starts[t]:ends[t]]
            oracle_chk[t % 16] += int(
                ((pid * (t + 1)) % 1_000_003).sum())
    got_chk = out.set_index("m")["sum_chk"]
    chk_ok = all(int(got_chk.get(m, 0)) == int(oracle_chk[m])
                 for m in range(16))

    print(json.dumps({
        "metric": "range_join_stress_sec", "value": round(wall, 2),
        "n_points": n_points, "n_intervals": n_iv,
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

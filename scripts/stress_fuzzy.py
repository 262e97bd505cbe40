"""Fuzzy-join stress: 10^6 strings with planted single-typo twins
through `fuzzy.fuzzy_self_join` (k=1) — the "would this survive 100 TB"
probe for the deletion-neighborhood band shuffle + in-bucket banded-DP
verification.

What it demonstrates at scale-on-one-node:
- strings are synthesized INSIDE tasks (16-hex of a per-id hash: two
  random such strings are within edit distance 1 with probability
  ~1e-17, so the planted pairs are the EXACT ground truth);
- every 20th id gets a twin differing by exactly one substitution, so
  recall must be EXACTLY 1.0 — the deletion-neighborhood candidate
  scheme is complete by construction, not probabilistically;
- the result is consumed by a streaming grouped aggregate (pair count
  + checksum vs the closed-form oracle) — pairs never collect on the
  driver; driver RSS stays flat.

Usage: python scripts/stress_fuzzy.py [n_strings] [num_cpus]
Writes one JSON line.
"""

import hashlib
import json
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

SHARD = 25_000
TWIN_EVERY = 20
P = 1_000_003


def rss_mib() -> int:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


def base_string(i: int) -> str:
    return hashlib.blake2b(str(i).encode(), digest_size=8).hexdigest()


def twin_string(i: int) -> str:
    s = list(base_string(i))
    s[i % 16] = "z"  # outside the hex alphabet: distance exactly 1
    return "".join(s)


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

    from chomper_ray.pipelines.relational import grouped_agg
    from chomper_ray.stages.fuzzy import fuzzy_self_join

    n_shards = (n + SHARD - 1) // SHARD

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        s = int(df["s"].iloc[0])
        d0, d1 = s * SHARD, min((s + 1) * SHARD, n)
        ids, names = [], []
        for i in range(d0, d1):
            ids.append(i)
            names.append(base_string(i))
            if i % TWIN_EVERY == 0:
                ids.append(i + n)
                names.append(twin_string(i))
        return pd.DataFrame({"id": np.array(ids, dtype=np.int64),
                             "name": names})

    ds = rd.range(n_shards).map_batches(
        lambda df: df.rename(columns={"id": "s"}), batch_format="pandas") \
        .repartition(n_shards).map_batches(gen, batch_format="pandas")

    rss0 = rss_mib()
    t0 = time.perf_counter()
    pairs = fuzzy_self_join(ds, col="name", id_col="id", k=1,
                            num_partitions=4 * num_cpus)

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        return pd.DataFrame({
            "m": a % 16, "n": 1,
            "chk": (a * (b % 997 + 1)) % P,
            "trunc": df["truncated"].to_numpy().astype(np.int64),
        })

    agg = grouped_agg(pairs.map_batches(digest, batch_format="pandas"),
                      keys=["m"], sums=["n", "chk", "trunc"]).to_pandas()
    wall = time.perf_counter() - t0
    rss1 = rss_mib()

    found = int(agg["sum_n"].sum())
    truncated = int(agg["sum_trunc"].sum())

    # closed-form oracle: exactly the planted (i, i+n) pairs
    oa = np.arange(0, n, TWIN_EVERY, dtype=np.int64)
    ob = oa + n
    om = oa % 16
    ochk = (oa * (ob % 997 + 1)) % P
    ok_n = ok_chk = True
    got = agg.set_index("m")
    for m in range(16):
        sel = om == m
        ok_n &= int(got["sum_n"].get(m, 0)) == int(sel.sum())
        ok_chk &= int(got["sum_chk"].get(m, 0)) == int(ochk[sel].sum())

    n_total = n + len(oa)
    print(json.dumps({
        "metric": "fuzzy_stress_sec", "value": round(wall, 2),
        "n_strings": n_total, "planted_pairs": len(oa),
        "pairs_found": found, "pairs_exact": bool(ok_n),
        "checksum_exact": bool(ok_chk), "recall": round(found / len(oa), 4),
        "truncated_pairs": truncated,
        "strings_per_sec": round(n_total / wall),
        "driver_rss_mib_before": rss0, "driver_rss_mib_after": rss1,
        "num_cpus": num_cpus,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

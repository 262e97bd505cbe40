"""CDC-maintained corpus-shuffle scale stress
(state/clustered.py ``LakeShuffledExport``).

The claim under test: per-commit maintenance cost is bound by the
commit's WRITE AMPLIFICATION (the touched lake partitions' old+new
snapshot rows), never the corpus — so a small localized commit costs
the same whether the table holds 0.25M or 1M+ rows — and the global
shuffled order read back at the end equals an independent
row-at-a-time md5 reference over the live state EXACTLY.

Protocol mirrors stress_clustered.py: seed, then alternate growth
commits (table triples, urls hashed away from lake partition 0) with
small localized update commits (fixed count, all in partition 0),
refreshing the export after every commit and recording rows_written
per localized refresh. Ends with an exactness check of
``read_live()`` vs a pandas/hashlib reference and a timed full read.

Usage: python scripts/stress_shuffled.py [base_rows] [num_cpus]
Writes one JSON line (plus progress on stderr).
"""

import hashlib
import json
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


def main():
    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    parts = 32
    n_shards = 64
    delta_rows = 2_000

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.stages.merge import stable_bucket
    from chomper_ray.state.clustered import LakeShuffledExport
    from chomper_ray.state.lake import LakeTable

    root = tempfile.mkdtemp(prefix="chomper_stress_shx_")
    lake = LakeTable(f"{root}/lake", key="url", num_partitions=parts,
                     collect_changes=False)
    rng = np.random.default_rng(17)

    def batch(ids, seq0, op="insert"):
        urls = np.char.add("u", np.char.zfill(ids.astype(str), 9))
        return rd.from_arrow(pa.table({
            "op": pa.array([op] * len(ids)),
            "seq": pa.array(seq0 + np.arange(len(ids)), type=pa.int64()),
            "url": pa.array(urls),
            "warc_ts": pa.array(
                pd.to_datetime(seq0 + np.arange(len(ids)), unit="s")),
            "score": pa.array(rng.random(len(ids)), type=pa.float64()),
        }))

    pool = np.arange(base_rows)
    urls_all = np.char.add("u", np.char.zfill(pool.astype(str), 9))
    hot_ids = pool[stable_bucket(urls_all, parts) == 0][:delta_rows]
    log(f"hot pool: {len(hot_ids)} urls in lake partition 0")

    seq = epoch = 0
    t0 = time.perf_counter()
    lake.commit_epoch(batch(np.arange(base_rows), seq), epoch)
    seq += base_rows
    epoch += 1
    log(f"base commit {base_rows} rows in {time.perf_counter()-t0:.1f}s")

    exp = LakeShuffledExport(lake, f"{root}/shuf", columns=["score"],
                             n_shards=n_shards)
    t0 = time.perf_counter()
    m = exp.refresh()
    full_build_s = time.perf_counter() - t0
    log(f"full build {m['applied'][0]['rows_written']} rows "
        f"in {full_build_s:.1f}s")

    local_commits = []
    grow = base_rows
    next_id = base_rows
    for round_i in range(3):
        table_rows = lake.read(columns=["url"]).count()
        lake.commit_epoch(batch(hot_ids, seq, op="update"), epoch)
        seq += delta_rows
        epoch += 1
        t0 = time.perf_counter()
        m = exp.refresh()
        dt = time.perf_counter() - t0
        seg = m["applied"][0]
        local_commits.append({
            "table_rows": table_rows, "refresh_s": round(dt, 3),
            "rows_written": seg["rows_written"],
            "rows_delta": seg["rows_delta"]})
        log(f"local commit @ {table_rows} rows: refresh {dt:.2f}s, "
            f"scanned/written {seg['rows_written']}")
        if round_i == 2:
            break
        cand = np.arange(next_id, next_id + int(grow * 1.1))
        cu = np.char.add("u", np.char.zfill(cand.astype(str), 9))
        ids = cand[stable_bucket(cu, parts) != 0][:grow]
        lake.commit_epoch(batch(ids, seq), epoch)
        seq += grow
        next_id += int(grow * 1.1)
        epoch += 1
        t0 = time.perf_counter()
        exp.refresh()
        log(f"growth commit +{grow} rows, refresh "
            f"{time.perf_counter()-t0:.1f}s")

    w0 = local_commits[0]["rows_written"]
    w2 = local_commits[-1]["rows_written"]
    flat = w2 <= 1.3 * w0

    # timed full ordered read at the final (multi-segment) head
    t0 = time.perf_counter()
    got = exp.read_live().to_pandas()
    read_s = time.perf_counter() - t0
    got = got.sort_values(["shard", "pos"], kind="stable") \
        .reset_index(drop=True)

    # exactness: independent row-at-a-time md5 reference over live state
    t0 = time.perf_counter()
    ref = lake.read_pandas()
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(u.encode()).digest()[:4], "big")
         for u in ref["url"]), dtype=np.int64, count=len(ref))
    ref = ref.assign(_h=h, shard=(h % n_shards).astype(np.int64))
    ref = ref.sort_values(["shard", "_h", "url"], kind="stable")
    ref["pos"] = ref.groupby("shard").cumcount().astype(np.int64)
    ref = ref[["url", "score", "shard", "pos"]].reset_index(drop=True)
    ref_s = time.perf_counter() - t0
    exact = got[["url", "score", "shard", "pos"]].equals(ref)

    out = {
        "metric": "shuffled_export_stress",
        "base_rows": base_rows, "final_rows": int(len(ref)),
        "num_cpus": num_cpus, "n_shards": n_shards,
        "full_build_s": round(full_build_s, 2),
        "local_commits": local_commits,
        "rows_written_growth_ratio": round(w2 / max(w0, 1), 3),
        "maintenance_commit_bound": bool(flat),
        "read_live_s": round(read_s, 2),
        "reference_s": round(ref_s, 2),
        "order_exact": bool(exact),
    }
    print(json.dumps(out), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

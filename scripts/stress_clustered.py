"""Maintained-layout scale stress (state/clustered.py).

The claim under test: ``LakeSortedLayout`` maintenance cost is bound by
each commit's WRITE AMPLIFICATION (the touched partitions' snapshot
sizes), never the table — so a small localized commit costs the same
whether the table holds 0.25M or 1M+ rows — and a pruned window read
opens only overlapping files no matter how the table grew.

Protocol: seed a base table, then alternate GROWTH commits (bulk
inserts that double the table) with small LOCALIZED update commits
(fixed row count, all urls pre-selected to hash into lake partition 0
under the same stable_bucket the lake routes by). Refresh the sorted
layout after every commit and record, for each localized commit, the
refresh wall and the segment's rows_written at the table size it ran
against. Flat rows_written + flat-ish wall across a 4x table growth is
the pass; rows_written tracking TABLE size is the fail.

Also times a 5%-window ``read_range`` against a full scan at the final
table and reports the file-pruning ratio.

Usage: python scripts/stress_clustered.py [base_rows] [num_cpus]
Writes one JSON line (plus progress on stderr).
"""

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
    delta_rows = 2_000

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.stages.merge import stable_bucket
    from chomper_ray.state.clustered import LakeSortedLayout
    from chomper_ray.state.lake import LakeTable

    root = tempfile.mkdtemp(prefix="chomper_stress_clu_")
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

    # urls that route to lake partition 0: the localized-commit key pool
    pool = np.arange(base_rows)
    urls_all = np.char.add("u", np.char.zfill(pool.astype(str), 9))
    hot_ids = pool[stable_bucket(urls_all, parts) == 0][:delta_rows]
    log(f"hot pool: {len(hot_ids)} urls in partition 0")

    seq = 0
    epoch = 0
    t0 = time.perf_counter()
    lake.commit_epoch(batch(np.arange(base_rows), seq), epoch)
    seq += base_rows
    epoch += 1
    log(f"base commit {base_rows} rows in "
        f"{time.perf_counter() - t0:.1f}s")

    lay = LakeSortedLayout(lake, f"{root}/sorted", order_col="score",
                           num_partitions=64)
    t0 = time.perf_counter()
    m = lay.refresh()
    full_build_s = time.perf_counter() - t0
    full_rows = m["applied"][0]["rows_written"]
    log(f"full build {full_rows} rows in {full_build_s:.1f}s")

    local_commits = []
    grow = base_rows
    next_id = base_rows
    for round_i in range(3):
        # localized commit at current table size
        table_rows = lake_rows(lake)
        lake.commit_epoch(batch(hot_ids, seq, op="update"), epoch)
        seq += delta_rows
        epoch += 1
        t0 = time.perf_counter()
        m = lay.refresh()
        dt = time.perf_counter() - t0
        seg = m["applied"][0]
        local_commits.append({
            "table_rows": table_rows,
            "refresh_s": round(dt, 3),
            "rows_written": seg["rows_written"],
            "rows_delta": seg["rows_delta"]})
        log(f"local commit @ {table_rows} rows: refresh {dt:.2f}s, "
            f"scanned/written {seg['rows_written']}")
        if round_i == 2:
            break
        # growth commit: double the table with urls that hash AWAY from
        # partition 0 — the table triples while the localized commit's
        # touched partition stays constant, so flat rows_written below
        # is evidence of partition-bound (not table-bound) maintenance
        cand = np.arange(next_id, next_id + int(grow * 1.1))
        cu = np.char.add("u", np.char.zfill(cand.astype(str), 9))
        ids = cand[stable_bucket(cu, parts) != 0][:grow]
        lake.commit_epoch(batch(ids, seq), epoch)
        seq += grow
        next_id += int(grow * 1.1)
        epoch += 1
        t0 = time.perf_counter()
        lay.refresh()
        log(f"growth commit +{grow} rows, refresh "
            f"{time.perf_counter() - t0:.1f}s")

    # the pass criterion: rows_written for the localized commit stays
    # bound by ~2x one partition's snapshot (old+new files), table-size
    # independent up to the partition's own growth
    final_rows = lake_rows(lake)
    w0 = local_commits[0]["rows_written"]
    w2 = local_commits[-1]["rows_written"]
    # partition 0 never grew, so rows_written must stay flat while the
    # table tripled — the table-bound failure mode would show ~3x here
    flat = w2 <= 1.3 * w0

    # pruned window read vs full scan at the final table
    t0 = time.perf_counter()
    ds, nr, nt = lay.read_range(0.40, 0.45)
    n_window = ds.count()
    window_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    ds, _, _ = lay.read_range()
    n_all = ds.count()
    full_s = time.perf_counter() - t0

    out = {
        "metric": "clustered_layout_stress",
        "base_rows": base_rows, "final_rows": final_rows,
        "num_cpus": num_cpus, "lake_partitions": parts,
        "full_build_s": round(full_build_s, 2),
        "full_build_rows": full_rows,
        "local_commits": local_commits,
        "rows_written_growth_ratio": round(w2 / max(w0, 1), 3),
        "maintenance_partition_bound": bool(flat),
        "window_read": {"files_read": nr, "files_total": nt,
                        "rows": n_window, "sec": round(window_s, 2)},
        "full_read": {"rows": n_all, "sec": round(full_s, 2)},
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


def lake_rows(lake) -> int:
    from chomper_ray.state.lake import load_manifest

    m = load_manifest(lake.root)
    return sum(int(v.get("rows", 0)) for v in m["partitions"].values()) \
        if m else 0


if __name__ == "__main__":
    main()

"""Endurance CDC drain (round-3 VERDICT #8): the 100× rehearsal.

Runs the flagship binlog-tail → LWW-upsert drain at ~10× the 4.8 M-event
scaling workload — default 48 M events over 16 epochs / ~960 segment
files — to prove the manifest/staging path at file and epoch counts the
bench runs never reach, with spill + driver-RSS telemetry recorded.

The change log is generated IN PARALLEL by Ray tasks (one task per
segment file, deterministic per-file RNG), because a driver-side Python
loop at 48 M pages would take longer than the run it feeds. Log layout,
schema and url/version semantics match sources/events.py.

Usage: python scripts/stress_endurance_cdc.py [n_events] [num_cpus]
Writes one JSON line. Needs ~35 GB under $TMPDIR for the log + lake.
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
import pyarrow.parquet as pq

N_EPOCHS = 16
ROWS_PER_FILE = 50_000
HTML_SCALE = 2
NUM_PARTITIONS = 64
BASE_TS_US = 1_600_000_000_000_000


def gen_log(out_dir: Path, n_events: int) -> Path:
    """Parallel deterministic change log: one Ray task per segment file."""
    import ray.data as rd

    if (out_dir / "_COMPLETE").exists():
        return out_dir
    n_urls = max(1, n_events // 10)
    n_files = (n_events + ROWS_PER_FILE - 1) // ROWS_PER_FILE
    n_epochs = min(N_EPOCHS, n_files)
    files_per_epoch = (n_files + n_epochs - 1) // n_epochs
    out = str(out_dir)
    for e in range(n_epochs):
        (out_dir / f"epoch={e:06d}").mkdir(parents=True, exist_ok=True)

    def gen_file(batch: pd.DataFrame) -> pd.DataFrame:
        from chomper_ray.sources.events import _make_html

        done = []
        for fi in batch["id"].astype(int):
            fi = int(fi)
            e = fi // files_per_epoch
            lo = fi * ROWS_PER_FILE
            n = min(ROWS_PER_FILE, n_events - lo)
            if n <= 0:
                continue
            rng = np.random.default_rng(1_000_003 * fi + 7)
            seq = np.arange(lo, lo + n, dtype=np.int64)
            url_idx = rng.integers(0, n_urls, n)
            urls = [f"https://s{i % 499}.example.com/page/{i}"
                    for i in url_idx]
            ts = BASE_TS_US + seq * 1_000 + rng.integers(0, 500, n)
            is_del = rng.random(n) < 0.03
            ops = np.where(is_del, "delete", "upsert")
            html = [None if ops[j] == "delete"
                    else _make_html(urls[j], int(seq[j]), 12345, HTML_SCALE)
                    for j in range(n)]
            edir = Path(out) / f"epoch={e:06d}"
            tmp = edir / f".part-{fi:05d}.tmp.parquet"
            pq.write_table(pa.table({
                "op": pa.array(ops.tolist(), pa.string()),
                "epoch": pa.array(np.full(n, e), pa.int64()),
                "seq": pa.array(seq, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(html, pa.binary()),
                "lang": pa.array(["en"] * n, pa.string()),
                "fetch_status": pa.array(np.full(n, 200, np.int32)),
            }), tmp)
            tmp.replace(edir / f"part-{fi:05d}.parquet")
            done.append(fi)
        return pd.DataFrame({"fi": pd.Series(done, dtype="int64")})

    (rd.range(n_files).repartition(min(n_files, 512))
     .map_batches(gen_file, batch_format="pandas").count())
    (out_dir / "_COMPLETE").touch()
    return out_dir


def spill_stats() -> str:
    """Object-store spill telemetry from the live session's raylet log
    (the grpc-backed memory_summary API needs grpcio, absent here)."""
    try:
        import ray

        session = Path(
            ray._private.worker._global_node.get_session_dir_path())
        lines = [ln for ln in (session / "logs" / "raylet.out")
                 .read_text().splitlines() if "Spilled" in ln]
        return lines[-1].split("] ")[-1].strip() if lines else "no spill"
    except Exception as e:  # telemetry only — never fail the run
        return f"unavailable ({e})"


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    # "cow" (default) = copy-on-write merges at commit time;
    # "mor" = merge-on-read delta commits + one compact_deltas() at the
    # end — same final state (hash-asserted in tests), different
    # placement of the merge cost;
    # "mor-policy" = MOR with the automatic maintenance policy
    # (state/policy.py, max_chain=4) folding deep chains DURING the
    # drain — the round-5 rehearsal: chains stay bounded with no
    # operator calls, telemetry records every policy action
    mode = sys.argv[3] if len(sys.argv) > 3 else "cow"

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from chomper_ray.pipelines.cdc import run_cdc

    base = Path(tempfile.gettempdir())
    t0 = time.perf_counter()
    log = gen_log(base / f"chomper_endurance_log_{n_events}", n_events)
    gen_s = time.perf_counter() - t0
    log_files = len(list(Path(log).glob("epoch=*/part-*.parquet")))
    log_bytes = sum(p.stat().st_size
                    for p in Path(log).glob("epoch=*/part-*.parquet"))

    lake = tempfile.mkdtemp(prefix="chomper_endurance_lake_")
    staging = tempfile.mkdtemp(prefix="chomper_endurance_stg_",
                               dir="/dev/shm")
    lake_kwargs = {"staging_root": staging}
    if mode in ("mor", "mor-policy", "mor-policy-tail"):
        lake_kwargs.update(merge_on_read=True, collect_changes=False)
    policy = None
    chain_peaks: list[int] = []
    extra = {}
    if mode in ("mor-policy", "mor-policy-tail"):
        from chomper_ray.state.lake import LakeTable
        from chomper_ray.state.policy import MaintenancePolicy

        plake = LakeTable(lake, num_partitions=NUM_PARTITIONS,
                          **{k: v for k, v in lake_kwargs.items()
                             if k != "staging_root"})
        policy = MaintenancePolicy(plake, max_chain=4, advise_every=0)

        def hook(commit):
            policy.after_commit(commit)
            chains = plake.delta_chain_lengths()
            chain_peaks.append(max(chains.values(), default=0))

        extra["after_commit"] = hook
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    t0 = time.perf_counter()
    # drain=True batches the whole backlog (hooks fire after the last
    # manifest — the policy becomes one post-drain fold); the *-tail
    # variant commits epoch-at-a-time so the policy interleaves and the
    # chain telemetry shows the live bound
    res = run_cdc(log, lake, num_partitions=NUM_PARTITIONS,
                  lake_kwargs=lake_kwargs,
                  drain=(mode != "mor-policy-tail"), **extra)
    wall = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024

    ingest_bytes = sum(p.stat().st_size for p in Path(lake).rglob("*.parquet"))
    compact_s, live = 0.0, (res.commits[-1].total_rows if res.commits else 0)
    if mode in ("mor-policy", "mor-policy-tail"):
        from chomper_ray.state.lake import LakeTable

        lt = LakeTable(lake, num_partitions=NUM_PARTITIONS,
                       **{k: v for k, v in lake_kwargs.items()
                          if k != "staging_root"})
        pending = lt.delta_chain_lengths()
        # resolved live-row count as a streaming read (no driver frame)
        live = lt.read(columns=["url"]).count()
    if mode == "mor":
        from chomper_ray.state.lake import LakeTable

        t0 = time.perf_counter()
        cr = LakeTable(lake, num_partitions=NUM_PARTITIONS,
                       **{k: v for k, v in lake_kwargs.items()
                          if k != "staging_root"}).compact_deltas()
        compact_s = time.perf_counter() - t0
        live = cr.total_rows

    lake_files = len(list(Path(lake).rglob("*.parquet")))
    spill = spill_stats()
    shutil.rmtree(lake, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    ray.shutdown()

    print(json.dumps({
        "metric": "endurance_cdc_drain", "mode": mode,
        "ingest_gb_written": round(ingest_bytes / 2**30, 2),
        "compact_s": round(compact_s, 1),
        "n_events": n_events, "num_cpus": num_cpus,
        "num_partitions": NUM_PARTITIONS, "n_epochs": N_EPOCHS,
        "gen_s": round(gen_s, 1), "log_files": log_files,
        "log_gb": round(log_bytes / 2**30, 2),
        "wall_s": round(wall, 1),
        "events_per_sec": round(n_events / wall, 1),
        "stage_s": round(sum(c.stage_s for c in res.commits), 1),
        "merge_s": round(sum(c.merge_s for c in res.commits), 1),
        "epochs_run": len(res.epochs_run),
        "live_rows": int(live),
        "lake_files": lake_files,
        "driver_rss_mb": {"before": rss0, "after": rss1},
        "spill": spill,
        **({"policy": policy.summary(),
            "post_policy_chain_peaks": chain_peaks,
            "pending_chains_at_end": pending}
           if policy is not None else {}),
    }))


if __name__ == "__main__":
    main()

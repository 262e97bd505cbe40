"""Envelope-source throughput stress: the JSON tax, measured.

Runs the SAME change stream through `run_cdc` twice — once from the
Parquet binlog, once from its Debezium JSONL envelope encoding — and
reports end-to-end events/s for both plus the ratio. The envelope path
pays NDJSON parse (pyarrow C++), base64 html decode (the documented
per-row hop) and JSON's loss of column pruning; everything downstream
(extraction, LWW merge, manifests) is shared, so the delta IS the
wire-format tax. Snapshot hashes must be identical.

Usage: python scripts/stress_envelope.py [n_events] [num_cpus]
Writes one JSON line (plus progress on stderr).
"""

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.sources import envelopes as env
    from chomper_ray.state.lake import LakeTable

    # cached across runs like the bench log (generation is driver-side
    # JSON encode — the bus's cost, paid once)
    log_dir = Path(f"/tmp/chomper_envelope_stress_{n_events}")
    t0 = time.perf_counter()
    elog = env.generate_envelope_log(
        log_dir, n_events=n_events, n_urls=max(1000, n_events // 10),
        n_epochs=4, evolution_epoch=2, seed=13,
        rows_per_file=max(10_000, n_events // (4 * num_cpus)))
    gen_s = time.perf_counter() - t0
    src = env.source_log(elog)
    work = Path(tempfile.mkdtemp(prefix="stress_env_"))
    parts = num_cpus

    # best-of-2 per source, interleaved (first run pays Ray warmup —
    # the verify-skill gotcha: time the SECOND run)
    def once(tag, ldir, source):
        root = work / f"lake_{tag}"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.perf_counter()
        r = run_cdc(ldir, root, num_partitions=parts, drain=True,
                    source=source)
        dt = time.perf_counter() - t0
        log(f"{tag}: {r.events_applied} events in {dt:.1f}s")
        return dt, r.events_applied

    times = {"pq": [], "env": []}
    n_applied = 0
    for _ in range(2):
        dt, n_applied = once("pq", src, None)
        times["pq"].append(dt)
        dt, _ = once("env", elog, env)
        times["env"].append(dt)
    pq_s, env_s = min(times["pq"]), min(times["env"])
    rp = re_ = type("R", (), {"events_applied": n_applied})

    h_pq = LakeTable(work / "lake_pq", num_partitions=parts).snapshot_hash()
    h_env = LakeTable(work / "lake_env",
                      num_partitions=parts).snapshot_hash()

    out = {
        "metric": "envelope_source_stress",
        "n_events": n_events,
        "num_cpus": num_cpus,
        "gen_s": round(gen_s, 2),
        "parquet_cdc_s": round(pq_s, 2),
        "parquet_events_per_sec": round(rp.events_applied / pq_s, 1),
        "envelope_cdc_s": round(env_s, 2),
        "envelope_events_per_sec": round(re_.events_applied / env_s, 1),
        "envelope_tax_ratio": round(env_s / pq_s, 3),
        "hash_identical": h_pq == h_env,
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Multi-table routing stress: one stream pass vs one pass per table.

The claim: `run_cdc_multi` reads the interleaved WAL ONCE per epoch no
matter how many tables ride it, so total wall beats running the same
routing once per table (each such run re-reads and re-decodes the
whole stream to use 60%/40% of it). Measures both on the same
10^6-event two-table log (best-of-2 each), checks the per-table final
states are hash-identical, and reports the amortization ratio —
expected to approach (sum of per-table passes)/(one pass) as the read
dominates.

Usage: python scripts/stress_multi.py [n_events] [num_cpus]
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

    from chomper_ray.pipelines.multi import run_cdc_multi, table_catalog
    from chomper_ray.sources.events import generate_multi_stream
    from chomper_ray.state.lake import LakeTable

    t0 = time.perf_counter()
    stream = generate_multi_stream(
        Path(f"/tmp/chomper_multi_stress_{n_events}"),
        n_events=n_events, n_urls=max(1000, n_events // 10),
        n_links=max(1500, n_events // 8), n_epochs=4, seed=17,
        rows_per_file=max(10_000, n_events // (4 * num_cpus)))
    gen_s = time.perf_counter() - t0
    work = Path(tempfile.mkdtemp(prefix="stress_multi_"))
    cat = table_catalog(stream)
    parts = num_cpus

    def fanout():
        root = work / "fan"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.perf_counter()
        run_cdc_multi(stream, root, num_partitions=parts)
        return time.perf_counter() - t0, root

    def per_table():
        root = work / "per"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.perf_counter()
        for name in sorted(cat):
            run_cdc_multi(stream, root, tables={name: cat[name]},
                          num_partitions=parts)
        return time.perf_counter() - t0, root

    fan_s, per_s = [], []
    fan_root = per_root = None
    for i in range(2):
        dt, fan_root = fanout()
        fan_s.append(dt)
        log(f"fan-out pass {i}: {dt:.1f}s")
        dt, per_root = per_table()
        per_s.append(dt)
        log(f"per-table pass {i}: {dt:.1f}s")

    hashes_equal = all(
        LakeTable(fan_root / n, key=cat[n].key,
                  num_partitions=parts).snapshot_hash()
        == LakeTable(per_root / n, key=cat[n].key,
                     num_partitions=parts).snapshot_hash()
        for n in cat)

    out = {
        "metric": "multi_table_stress",
        "n_events": n_events,
        "num_cpus": num_cpus,
        "gen_s": round(gen_s, 2),
        "fanout_s": round(min(fan_s), 2),
        "per_table_sum_s": round(min(per_s), 2),
        "amortization_ratio": round(min(per_s) / min(fan_s), 3),
        "events_per_sec_fanout": round(n_events / min(fan_s), 1),
        "hashes_equal": hashes_equal,
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

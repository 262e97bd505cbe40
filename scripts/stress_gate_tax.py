"""Decontamination-gate ingest tax at bench scale: the flagship CDC
job (binlog → extract → LWW lake) run plain vs gated
(`dedup.decontamination_gate` as run_cdc's epoch_transform), same log,
fresh lakes, best-of-2 per variant interleaved (the envelope-stress
protocol).

The benchmark is surgical by construction — the header 2-gram
``("at", "<url>\\nEntry")`` that every version of exactly one page
carries — so the expected effect is EXACT: the gated lake's live set
is the plain one minus the N_BENCH benchmark pages, while the gate
still pays the full per-event probe (hash every 2-gram of every
extracted text, searchsorted against the broadcast set). The reported
tax is therefore an upper-bound-shaped real number: full probe cost,
tiny reject volume.

Usage: python scripts/stress_gate_tax.py [n_events] [num_cpus]
       (defaults 1_200_000 32; smoke: 100000 8). One JSON line.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_BENCH = 500


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.sources.events import generate_change_stream
    from chomper_ray.stages.dedup import decontamination_gate
    from chomper_ray.state.lake import LakeTable

    log = generate_change_stream(
        Path(tempfile.gettempdir()) / f"chomper_gate_log_{n_events}",
        n_events=n_events, n_urls=max(n_events // 20, 100),
        n_epochs=4, seed=7)

    urls = [r[0] for r in duckdb.sql(
        f"SELECT DISTINCT url FROM read_parquet("
        f"'{log}/epoch=*/part-*.parquet', union_by_name=true) "
        f"ORDER BY url LIMIT {N_BENCH}").fetchall()]
    bench_p = Path(tempfile.mkdtemp(prefix="gate_bench_")) / "b.parquet"
    pq.write_table(pa.table(
        {"text": pa.array([f"at {u}\nEntry" for u in urls])}), bench_p)

    def run(gated: bool) -> tuple[float, int]:
        root = tempfile.mkdtemp(prefix="gate_lake_")
        kw = {}
        if gated:
            gate = decontamination_gate(rd.read_parquet(str(bench_p)),
                                        n=2)
            kw["epoch_transform"] = lambda _e: gate
        t0 = time.perf_counter()
        # sequential per-epoch on BOTH sides: a gate forces the
        # sequential path, so the plain leg must use it too for the
        # ratio to isolate the probe cost
        run_cdc(log, root, num_partitions=32, **kw)
        wall = time.perf_counter() - t0
        live = set(LakeTable(root, num_partitions=32)
                   .read_pandas()["url"])
        return wall, live

    walls = {"plain": [], "gated": []}
    rows = {}
    for _ in range(2):
        for name, g in (("plain", False), ("gated", True)):
            w, live = run(name == "gated")
            walls[name].append(round(w, 2))
            rows[name] = live

    # the gated live set must be EXACTLY the plain one minus the
    # benchmark pages (some benchmark pages may end deleted anyway)
    exact = rows["gated"] == rows["plain"] - set(urls)
    best_p, best_g = min(walls["plain"]), min(walls["gated"])
    print(json.dumps({
        "metric": "decontamination_gate_tax",
        "n_events": n_events, "num_cpus": num_cpus,
        "n_bench_pages": N_BENCH,
        "plain_s": walls["plain"], "gated_s": walls["gated"],
        "tax_ratio_best": round(best_g / best_p, 3),
        "live_rows_plain": len(rows["plain"]),
        "live_rows_gated": len(rows["gated"]),
        "reject_exactly_bench_pages": bool(exact),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

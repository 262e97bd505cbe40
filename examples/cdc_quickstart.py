"""Quickstart for the engine's OWN flagship: binlog-tail → lake-upsert.

Generates a small deterministic change log, runs the CDC pipeline, shows
resume + exactly-once + lineage. Run: ``python examples/cdc_quickstart.py``.
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.sources.events import generate_change_stream
    from chomper_ray.state.lake import LakeTable

    work = Path(tempfile.mkdtemp(prefix="cdc_quickstart_"))
    log = generate_change_stream(work / "binlog", n_events=2000, n_urls=300,
                                 n_epochs=3, seed=7, evolution_epoch=2)

    lake_root = work / "lake"
    res = run_cdc(log, lake_root, num_partitions=4)
    lake = LakeTable(lake_root, num_partitions=4)
    print(f"epochs committed: {res.epochs_run}, events: {res.events_applied}")
    print(f"live rows: {len(lake.read_pandas())}, "
          f"snapshot hash: {lake.snapshot_hash()}")
    print("schema (evolved):", [f"{f.name}:{f.type}" for f in lake.current_schema()])

    # exactly-once: replay is a no-op, hash unchanged
    h = lake.snapshot_hash()
    res2 = run_cdc(log, lake_root, num_partitions=4)
    assert res2.epochs_run == [] and lake.snapshot_hash() == h
    print("replay: no-op ✓")

    print("\nlineage (per partition, per epoch):")
    print(lake.lineage()[["partition_id", "epoch", "events_in", "live_rows"]]
          .head(8).to_string(index=False))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Day-2 operations on a live lake: the admin lifecycle end to end.

Envelope-bus ingest → versioned backfill (new derived column over
history, chunked + resumable) → skew advisory + in-place repartition →
GDPR delete_where → change-feed subscription resume. Every step is an
exactly-once manifest commit; the binlog cursor never moves for any of
them. Run: ``python examples/lake_operations.py``.
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

    import pyarrow as pa
    import pyarrow.compute as pc

    from chomper_ray.functions.expr import F
    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.sources import envelopes
    from chomper_ray.state.backfill import LakeBackfill
    from chomper_ray.state.lake import LakeTable

    work = Path(tempfile.mkdtemp(prefix="lake_ops_"))

    # 1. ingest from a Debezium-style envelope bus (JSON on the wire,
    #    identical lake state to the parquet binlog — see BASELINE.md
    #    for the measured wire tax)
    log = envelopes.generate_envelope_log(
        work / "bus", n_events=3000, n_urls=500, n_epochs=3, seed=7,
        evolution_epoch=2)
    run_cdc(log, work / "lake", num_partitions=4, source=envelopes)
    lake = LakeTable(work / "lake", num_partitions=4)
    print("ingested:", lake.read().count(), "live pages;",
          "cursor at epoch", lake.last_applied_log_epoch())

    # 2. versioned backfill: add n_tokens over HISTORY, two partitions
    #    per exactly-once chunk commit; rerunning resumes off manifests
    def enrich(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(
            pc.fill_null(t["text"], ""), " ")).cast(pa.int64())
        if "n_tokens" in t.column_names:
            return t.set_column(t.schema.get_field_index("n_tokens"),
                                "n_tokens", n)
        return t.append_column("n_tokens", n)

    bf = LakeBackfill(lake, "tokens-v1", enrich)
    chunks = bf.run(max_partitions_per_commit=2)
    print("backfill:", [(c.epoch, c.partitions_touched) for c in chunks],
          "pending now:", bf.pending())

    # 3. skew advisory + the in-place lever (test volumes are tiny, so
    #    loosen the production thresholds to show the flow)
    lake.hot_min_rows, lake.hot_factor = 10, 2.0
    suggestion = lake.suggest_num_partitions()
    if suggestion != lake.num_partitions:
        res = lake.repartition_table(suggestion)
        print(f"repartitioned to {suggestion} (commit {res.epoch})")
    else:
        print("no hot partitions — layout left alone")

    # 4. GDPR delete: tombstone every German page through the normal
    #    merge; late binlog updates for these urls stay dead (LWW at
    #    the watermark), payload bytes leave the snapshot
    wm = 2_000_000_000_000_000
    res = lake.delete_where(F("lang") == "de", version_ts_us=wm)
    print("delete_where removed", res.rows_upserted, "pages;",
          "cursor still", LakeTable(work / "lake")
          .last_applied_log_epoch())

    # 5. downstream subscription: resume the change feed from a
    #    checkpointed epoch, exactly like the engine's own cursor
    feed = LakeTable(work / "lake").change_events_ds(since_epoch=1)
    print("change events after epoch 1:", feed.count())

    # 6. filtered scan with row-group pushdown
    en = LakeTable(work / "lake").read(
        columns=["url", "n_tokens"],
        where=(F("lang") == "en") & (F("n_tokens") > 20))
    print("long English pages:", en.count())

    ray.shutdown()


if __name__ == "__main__":
    main()

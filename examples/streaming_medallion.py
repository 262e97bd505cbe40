"""The full streaming medallion, end to end — every hop incremental,
exactly-once and fresh after each binlog epoch:

  binlog tail → BRONZE pages lake (LWW upsert)
                  ├─ after_commit hook:
                  │    SILVER clean-docs lake   (DerivedLakeTable —
                  │      filter fetch_status==200, project n_chars)
                  │      └─ GOLD per-lang rollup (MaterializedAgg on
                  │           the SILVER lake — matview-on-derived)
                  │    CHUNKS lake              (ExplodedLakeTable —
                  │      120-char windows, chunk_id = url#i)
                  │    OUTBOUND bus             (LakeChangeExporter —
                  │      Debezium envelopes for external consumers)
                  └─ (any of: text index, ANN index, layouts — same
                     hook, see mor_streaming_search.py)

Each hop maintains its own cursor off the upstream manifest chain, so
the single ``after_commit`` callback is idempotent-from-anywhere: a
crash at any point re-enters and every layer catches up to the head.
The script asserts, after EVERY epoch, that each layer equals its
from-scratch recompute — then replays the outbound bus into a fresh
lake and checks it reproduces bronze exactly.

Run: ``python examples/streaming_medallion.py``.
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

    import pandas as pd
    import pyarrow as pa

    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.sources import envelopes
    from chomper_ray.sources.events import generate_change_stream
    from chomper_ray.state.derivedtable import (DerivedLakeTable,
                                                ExplodedLakeTable)
    from chomper_ray.state.lake import LakeTable
    from chomper_ray.state.matview import MaterializedAgg
    from chomper_ray.state.outbound import LakeChangeExporter

    root = Path(tempfile.mkdtemp(prefix="medallion_"))
    print(f"workspace: {root}")
    generate_change_stream(root / "binlog", n_events=3000, n_urls=600,
                           n_epochs=4, seed=7)

    bronze = LakeTable(root / "bronze", num_partitions=8,
                       collect_changes=False)

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["fetch_status"] == 200]
        return pd.DataFrame({
            "url": keep["url"], "lang": keep["lang"],
            "n_chars": keep["text"].fillna("").str.len().astype("int64"),
        })

    silver = DerivedLakeTable(
        bronze, root / "silver", clean,
        pa.schema([("url", pa.string()), ("lang", pa.string()),
                   ("n_chars", pa.int64())]),
        lake_kwargs={"num_partitions": 4})

    W = 120

    def chunker(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["fetch_status"] == 200]
        rows = []
        for url, text in zip(keep["url"], keep["text"].fillna("")):
            for i in range(0, len(text), W):
                rows.append((f"{url}#{i // W}", url, text[i:i + W]))
        return pd.DataFrame(rows, columns=["chunk_id", "url",
                                           "chunk_text"])

    chunks = ExplodedLakeTable(
        bronze, root / "chunks", chunker,
        pa.schema([("chunk_id", pa.string()), ("url", pa.string()),
                   ("chunk_text", pa.string())]),
        derived_key="chunk_id", lake_kwargs={"num_partitions": 4})

    gold = MaterializedAgg(
        silver.table, root / "gold",
        lambda df: df[["lang", "n_chars"]].copy(),
        group_cols=["lang"], value_cols=["n_chars"],
        read_columns=["lang", "n_chars"])

    bus = LakeChangeExporter(bronze, root / "bus")

    def after_commit(commit):
        silver.refresh()   # bronze → silver (changed keys only)
        gold.refresh()     # silver → gold  (matview-on-derived)
        chunks.refresh()   # bronze → chunk table (1→N, stateless dels)
        bus.export()       # bronze → envelope bus for outsiders

    def check_fresh():
        live = bronze.read_pandas()
        exp_silver = clean(live).sort_values("url") \
            .reset_index(drop=True)
        got_silver = silver.table.read_pandas()[
            ["url", "lang", "n_chars"]].sort_values("url") \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got_silver, exp_silver,
                                      check_dtype=False)
        exp_gold = exp_silver.groupby("lang", as_index=False).agg(
            sum_n_chars=("n_chars", "sum"), n_live=("lang", "size"))
        got_gold = gold.view().sort_values("lang").reset_index(drop=True)
        assert (got_gold.set_index("lang")["n_live"]
                == exp_gold.set_index("lang")["n_live"]).all()
        exp_chunks = chunker(live)
        assert len(chunks.table.read_pandas()) == len(exp_chunks)

    res = run_cdc(root / "binlog", bronze.root, num_partitions=8,
                  after_commit=after_commit)
    check_fresh()
    print(f"epochs: {res.epochs_run}, bronze rows: "
          f"{len(bronze.read_pandas())}, silver rows: "
          f"{len(silver.table.read_pandas())}, chunks: "
          f"{len(chunks.table.read_pandas())}")
    print("gold rollup:")
    print(gold.view().to_string(index=False))

    # an external consumer replays the bus — must reproduce bronze
    replica_root = root / "replica"
    run_cdc(root / "bus", replica_root, num_partitions=8,
            source=envelopes)
    a = bronze.read_pandas().sort_values("url").reset_index(drop=True)
    b = LakeTable(replica_root, num_partitions=8).read_pandas()
    b = b[a.columns].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    print(f"outbound replica equals bronze: {len(b)} rows — OK")
    ray.shutdown()


if __name__ == "__main__":
    main()

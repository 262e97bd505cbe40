"""Migration of the reference's flagship example
(/root/reference/examples/companies.py) to this engine.

The reference pipeline: truncate table → CSV feed (skip header rows) →
drop rows by predicate → value-map a column → string-format a column →
assign a constant column → keyed upsert into Postgres.

Here: the same steps as ONE fused Arrow transform chain over a Ray
Dataset, upserted into the exactly-once Parquet lake keyed by symbol.

Run: ``python examples/companies.py`` (owns its Ray session).
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow as pa
import pyarrow.compute as pc

CSV = """ASX Listed Companies,,,
,,
Company name,ASX code,GICS industry group
ACME LIMITED,ACM,Pharmaceuticals & Biotechnology
BETA CORP,BET,Not Applic
GAMMA GROUP,GAM,Commercial Services & Supplies
DELTA HOLDINGS,DEL,Banks
"""


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.functions.expr import F
    from chomper_ray.sources.feeders import read_csv_strict
    from chomper_ray.stages.transforms import (
        Assigner, Chain, Dropper, FieldFilter, ValueMapper)
    from chomper_ray.state.lake import LakeTable

    workdir = Path(tempfile.mkdtemp(prefix="companies_example_"))
    (workdir / "companies.csv").write_text(CSV)

    # CsvFeeder equivalent: named columns, skip 3 header rows, all-string
    ds, dropped = read_csv_strict(str(workdir / "companies.csv"),
                                  ["name", "symbol", "industry"], skip=3)

    chain = Chain(
        # Item.drop(Item.industry.is_in([...]))
        Dropper(F("industry").isin(["Not Applic", "Class Pend"])),
        # Item.industry.map({...})
        ValueMapper("industry", {
            "Pharmaceuticals & Biotechnology":
                "Pharmaceuticals, Biotechnology & Life Sciences",
            "Commercial Services & Supplies":
                "Commercial & Professional Services",
        }),
        # Item.symbol.filter(lambda v: '%s.AX' % v)
        FieldFilter("symbol", lambda col: pc.binary_join_element_wise(
            col, ".AX", "")),
        # Item.exchange.set('ASX')
        Assigner("exchange", "ASX"),
    )
    transformed = ds.map_batches(chain, batch_format="pyarrow")

    # PostgresTruncator + PostgresUpserter(identifiers=['symbol']) →
    # a fresh lake keyed by symbol (version: load sequence)
    def to_events(t: pa.Table) -> pa.Table:
        n = t.num_rows
        t = t.append_column("op", pa.array(["insert"] * n))
        t = t.append_column("seq", pa.array(range(n), type=pa.int64()))
        return t.append_column("load_ts", pa.array([0] * n, type=pa.int64()))

    lake = LakeTable(workdir / "lake", key="symbol",
                     version=("load_ts", "seq"), num_partitions=2)
    lake.commit_epoch(transformed.map_batches(to_events, batch_format="pyarrow"),
                      epoch=0)

    out = lake.read_pandas()
    print(out[["symbol", "name", "industry", "exchange"]].to_string(index=False))
    assert dropped() == 0
    assert set(out["symbol"]) == {"ACM.AX", "GAM.AX", "DEL.AX"}  # BET dropped
    assert (out["exchange"] == "ASX").all()
    ray.shutdown()
    return out


if __name__ == "__main__":
    main()

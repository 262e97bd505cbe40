"""AggregateLakeTable: a matview promoted to a real lake — after every
upstream commit the gold lake equals the SQL rollup of the upstream
live state, only CHANGED groups ride as events, and the gold lake's
own outbound bus carries exactly the rollup's deltas."""

import json

import pandas as pd
import pyarrow as pa
import ray.data as rd

from chomper_ray.state.derivedtable import AggregateLakeTable
from chomper_ray.state.lake import LakeTable, load_manifest
from chomper_ray.state.matview import MaterializedAgg


def mk(op, seq, url, ts, lang, n):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"), "lang": lang,
            "n_chars": n}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def make(tmp_path):
    bronze = LakeTable(tmp_path / "bronze", key="url", num_partitions=3,
                       collect_changes=False)
    agg = MaterializedAgg(
        bronze, tmp_path / "mv",
        lambda df: df[["lang", "n_chars"]].copy(),
        group_cols=["lang"], value_cols=["n_chars"],
        read_columns=["lang", "n_chars"])
    gold = AggregateLakeTable(agg, tmp_path / "gold",
                              lake_kwargs={"num_partitions": 2})
    return bronze, gold


def oracle(bronze) -> pd.DataFrame:
    live = bronze.read_pandas()
    if not len(live):
        return pd.DataFrame(columns=["lang", "sum_n_chars", "n_live"])
    out = live.groupby("lang", as_index=False).agg(
        sum_n_chars=("n_chars", "sum"), n_live=("lang", "size"))
    return out.sort_values("lang").reset_index(drop=True)


def assert_synced(gold, bronze):
    got = gold.table.read_pandas()
    cols = ["lang", "sum_n_chars", "n_live"]
    got = (got[cols].sort_values("lang").reset_index(drop=True)
           if len(got) else pd.DataFrame(columns=cols))
    pd.testing.assert_frame_equal(got, oracle(bronze), check_dtype=False)


def test_gold_lake_tracks_rollup(tmp_path, ray_session):
    bronze, gold = make(tmp_path)
    commit(bronze, [mk("insert", 0, "a", 10, "en", 5),
                    mk("insert", 1, "b", 10, "de", 3),
                    mk("insert", 2, "c", 10, "en", 2)], 0)
    gold.refresh()
    assert_synced(gold, bronze)
    # move c en->de: BOTH groups change, nothing else
    commit(bronze, [mk("update", 10, "c", 20, "de", 2)], 1)
    gold.refresh()
    assert_synced(gold, bronze)
    man = load_manifest(gold.table.root)
    assert sum(int(ln["events_in"]) for ln in man["lineage"]) == 2
    # delete the last de rows -> group disappears (delete event)
    commit(bronze, [mk("delete", 20, "b", 30, None, None),
                    mk("delete", 21, "c", 30, None, None)], 2)
    gold.refresh()
    assert_synced(gold, bronze)
    assert sorted(gold.table.read_pandas()["lang"]) == ["en"]


def test_gold_lake_resume_and_unchanged_commit(tmp_path, ray_session):
    bronze, gold = make(tmp_path)
    commit(bronze, [mk("insert", 0, "a", 10, "en", 5)], 0)
    gold.refresh()
    # same-values rewrite: a touched partition, zero rollup change
    commit(bronze, [mk("update", 1, "a", 20, "en", 5)], 1)
    gold.refresh()
    man = load_manifest(gold.table.root)
    assert not man.get("lineage")  # empty cursor-advance commit
    assert_synced(gold, bronze)
    # fresh objects resume
    bronze2 = LakeTable(tmp_path / "bronze", key="url",
                        num_partitions=3, collect_changes=False)
    commit(bronze2, [mk("insert", 2, "d", 30, "fr", 7)], 2)
    _, gold2 = make(tmp_path)
    gold2.refresh()
    assert_synced(gold2, bronze2)


def test_gold_lake_outbound_bus_carries_deltas(tmp_path, ray_session):
    from chomper_ray.state.outbound import LakeChangeExporter

    bronze, gold = make(tmp_path)
    commit(bronze, [mk("insert", 0, "a", 10, "en", 5),
                    mk("insert", 1, "b", 10, "de", 3)], 0)
    gold.refresh()
    bus = LakeChangeExporter(gold.table, tmp_path / "bus",
                             table_name="lang_rollup")
    bus.export()
    commit(bronze, [mk("insert", 10, "e", 20, "en", 1)], 1)
    gold.refresh()
    res = bus.export()
    assert res["events"] == 1  # only the en group changed
    edirs = sorted((tmp_path / "bus").glob("epoch=*"))
    lines = [json.loads(ln) for f in edirs[-1].glob("*.jsonl")
             for ln in f.read_text().splitlines()]
    assert len(lines) == 1 and lines[0]["op"] == "u"
    assert lines[0]["after"]["lang"] == "en"
    assert lines[0]["after"]["sum_n_chars"] == 6

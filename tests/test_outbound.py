"""LakeChangeExporter (state/outbound.py): outbound CDC. The pinned
invariant: re-ingesting an exported envelope feed into a fresh lake
via run_cdc(source=envelopes) reproduces the source lake's LWW live
state exactly — across inserts/updates/deletes, schema evolution,
truncate (explicit deletes on the wire), merge-on-read sources, and
incremental (per-commit) export with crash-resume."""

import json

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chomper_ray.sources import envelopes
from chomper_ray.state.lake import LakeTable
from chomper_ray.state.outbound import ExportHistoryGone, LakeChangeExporter


def mk(op, seq, url, ts, lang, text, **extra):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"),
            "lang": lang, "text": text, **extra}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def reingest(out_dir, tmp_path, name="re") -> LakeTable:
    from chomper_ray.pipelines.cdc import run_cdc

    run_cdc(out_dir, tmp_path / name, num_partitions=3,
            source=envelopes)
    return LakeTable(tmp_path / name, num_partitions=3)


def assert_roundtrip(src: LakeTable, out_dir, tmp_path, name="re"):
    got = reingest(out_dir, tmp_path, name).read_pandas()
    exp = src.read_pandas()
    cols = sorted(set(exp.columns) & set(got.columns))
    got = got[cols].sort_values("url").reset_index(drop=True)
    exp = exp[cols].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_roundtrip_insert_update_delete(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "src", key="url", num_partitions=4,
                     collect_changes=False)
    commit(lake, [mk("insert", 0, "a", 10, "en", "hello"),
                  mk("insert", 1, "b", 10, "de", "welt"),
                  mk("insert", 2, "c", 10, "fr", "salut")], 0)
    commit(lake, [mk("update", 10, "a", 20, "en", "hello again"),
                  mk("delete", 11, "b", 20, None, None)], 1)
    ex = LakeChangeExporter(lake, tmp_path / "bus")
    res = ex.export()
    assert res["exported_epochs"] == [0, 1]
    # epoch 1 carries exactly the changed keys: u(a) + d(b), never c
    e1 = (tmp_path / "bus" / "epoch=000001")
    lines = [json.loads(ln) for f in e1.glob("*.jsonl")
             for ln in f.read_text().splitlines()]
    assert sorted((l["op"], l["source"]["seq"]) for l in lines) == \
        [("d", 11), ("u", 10)]
    d = next(l for l in lines if l["op"] == "d")
    assert d["before"]["url"] == "b"
    assert_roundtrip(lake, tmp_path / "bus", tmp_path)


def test_export_is_incremental_and_idempotent(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "src", key="url", num_partitions=2,
                     collect_changes=False)
    commit(lake, [mk("insert", 0, "a", 10, "en", "x")], 0)
    ex = LakeChangeExporter(lake, tmp_path / "bus")
    assert ex.export()["exported_epochs"] == [0]
    assert ex.export()["exported_epochs"] == []  # no-op
    commit(lake, [mk("update", 1, "a", 20, "en", "y")], 1)
    # a FRESH exporter resumes from the cursor
    ex2 = LakeChangeExporter(lake, tmp_path / "bus")
    assert ex2.export()["exported_epochs"] == [1]
    assert_roundtrip(lake, tmp_path / "bus", tmp_path)


def test_noop_rewrite_exports_nothing(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "src", key="url", num_partitions=2,
                     collect_changes=False)
    commit(lake, [mk("insert", i, f"u{i}", 10, "en", f"t{i}")
                  for i in range(10)], 0)
    ex = LakeChangeExporter(lake, tmp_path / "bus")
    ex.export()
    commit(lake, [mk("update", 100, "u3", 20, "en", "changed")], 1)
    res = ex.export()
    assert res["events"] == 1  # only u3, never the 9 co-located keys


def test_schema_evolution_rides_the_wire(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "src", key="url", num_partitions=2,
                     collect_changes=False)
    commit(lake, [mk("insert", 0, "a", 10, "en", "x")], 0)
    commit(lake, [mk("insert", 1, "b", 20, "de", "y", score=0.5)], 1)
    ex = LakeChangeExporter(lake, tmp_path / "bus")
    ex.export()
    # per-epoch sidecars differ (evolution epoch adds the column)
    s0 = json.loads((tmp_path / "bus/epoch=000000/_schema.json")
                    .read_text())
    s1 = json.loads((tmp_path / "bus/epoch=000001/_schema.json")
                    .read_text())
    assert "score" not in [f["name"] for f in s0]
    assert "score" in [f["name"] for f in s1]
    assert_roundtrip(lake, tmp_path / "bus", tmp_path)


def test_truncate_exports_explicit_deletes(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "src", key="url", num_partitions=2,
                     collect_changes=False)
    commit(lake, [mk("insert", 0, "a", 10, "en", "x"),
                  mk("insert", 1, "b", 10, "de", "y")], 0)
    lake.truncate()
    commit(lake, [mk("insert", 2, "c", 30, "fr", "z")], 2)
    ex = LakeChangeExporter(lake, tmp_path / "bus")
    res = ex.export()
    assert res["exported_epochs"] == [0, 1, 2]
    e1 = tmp_path / "bus" / "epoch=000001"
    lines = [json.loads(ln) for f in e1.glob("*.jsonl")
             for ln in f.read_text().splitlines()]
    assert sorted(l["before"]["url"] for l in lines) == ["a", "b"]
    assert all(l["op"] == "d" for l in lines)
    got = reingest(tmp_path / "bus", tmp_path).read_pandas()
    assert sorted(got["url"]) == ["c"]


def test_mor_source_exports(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "src", key="url", num_partitions=2,
                     collect_changes=False, merge_on_read=True)
    commit(lake, [mk("insert", 0, "a", 10, "en", "x")], 0)
    commit(lake, [mk("update", 1, "a", 20, "en", "y"),
                  mk("insert", 2, "b", 20, "de", "z")], 1)
    ex = LakeChangeExporter(lake, tmp_path / "bus")
    ex.export()
    assert_roundtrip(lake, tmp_path / "bus", tmp_path)
    lake.compact_deltas()
    assert ex.export()["events"] == 0  # compaction = empty epoch
    assert_roundtrip(lake, tmp_path / "bus", tmp_path, name="re2")


def test_fresh_bus_on_gc_lake_snapshot_bootstraps(tmp_path, ray_session):
    """A BRAND-NEW bus on a lake with amputated history bootstraps via
    a Debezium-style 'r' snapshot phase (no consumer can be skipped),
    then continues incrementally."""
    lake = LakeTable(tmp_path / "src", key="url", num_partitions=2,
                     collect_changes=False)
    commit(lake, [mk("insert", 0, "a", 10, "en", "x"),
                  mk("insert", 1, "b", 10, "de", "y")], 0)
    commit(lake, [mk("update", 2, "a", 20, "en", "y"),
                  mk("delete", 3, "b", 20, None, None)], 1)
    lake.compact(keep_epochs=1)
    ex = LakeChangeExporter(lake, tmp_path / "bus")
    res = ex.export()
    assert res["exported_epochs"] == [1]
    lines = [json.loads(ln)
             for f in (tmp_path / "bus/epoch=000001").glob("*.jsonl")
             for ln in f.read_text().splitlines()]
    assert [l["op"] for l in lines] == ["r"]  # live rows only
    assert_roundtrip(lake, tmp_path / "bus", tmp_path)
    # and it continues incrementally afterwards
    commit(lake, [mk("insert", 4, "c", 30, "fr", "z")], 2)
    assert ex.export()["events"] == 1
    assert_roundtrip(lake, tmp_path / "bus", tmp_path, name="re2")


def test_mid_stream_gc_gap_still_refuses(tmp_path, ray_session):
    """An EXISTING bus whose next commits' diff inputs were GC'd must
    refuse — consumers would silently skip the gap otherwise."""
    lake = LakeTable(tmp_path / "src", key="url", num_partitions=2,
                     collect_changes=False)
    commit(lake, [mk("insert", 0, "a", 10, "en", "x")], 0)
    ex = LakeChangeExporter(lake, tmp_path / "bus")
    ex.export()  # cursor = 0
    commit(lake, [mk("update", 1, "a", 20, "en", "y")], 1)
    commit(lake, [mk("update", 2, "a", 30, "en", "z")], 2)
    lake.compact(keep_epochs=1)  # commit-1/2 diff inputs gone
    with pytest.raises(ExportHistoryGone):
        ex.export()


def test_fresh_bus_on_branch_bootstraps(tmp_path, ray_session):
    """A bus started on a branch() fork snapshots the fork state and
    then streams the branch's own divergence."""
    lake = LakeTable(tmp_path / "src", key="url", num_partitions=2,
                     collect_changes=False)
    commit(lake, [mk("insert", 0, "a", 10, "en", "x"),
                  mk("insert", 1, "b", 10, "de", "y")], 0)
    br = lake.branch(tmp_path / "fork")
    ex = LakeChangeExporter(br, tmp_path / "bus")
    assert ex.export()["events"] == 2  # snapshot phase
    commit(br, [mk("delete", 10, "a", 20, None, None)], 1)
    assert ex.export()["events"] == 1
    assert_roundtrip(br, tmp_path / "bus", tmp_path)
    got = reingest(tmp_path / "bus", tmp_path, "re3").read_pandas()
    assert sorted(got["url"]) == ["b"]


def test_intra_epoch_insert_delete_stays_dead(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "src", key="url", num_partitions=2,
                     collect_changes=False)
    commit(lake, [mk("insert", 0, "a", 10, "en", "x"),
                  mk("delete", 1, "a", 20, None, None),
                  mk("insert", 2, "b", 10, "de", "y")], 0)
    ex = LakeChangeExporter(lake, tmp_path / "bus")
    ex.export()
    got = reingest(tmp_path / "bus", tmp_path).read_pandas()
    assert sorted(got["url"]) == ["b"]
    # anti-resurrection: the wire delete carries the TOMBSTONE version,
    # so a late older update on the consumer side stays dead
    e0 = tmp_path / "bus" / "epoch=000000"
    lines = [json.loads(ln) for f in e0.glob("*.jsonl")
             for ln in f.read_text().splitlines()]
    d = next(l for l in lines if l["op"] == "d")
    assert d["before"]["warc_ts_us"] == 20_000_000


def test_bus_retention_refuses_gap_jump(tmp_path, ray_session):
    """prune() deletes consumed epochs and plants the horizon marker;
    a fresh/lagging consumer refuses loudly instead of silently
    skipping the gap, while a caught-up consumer keeps tailing."""
    from chomper_ray.pipelines.cdc import run_cdc

    lake = LakeTable(tmp_path / "src", key="url", num_partitions=2,
                     collect_changes=False)
    commit(lake, [mk("insert", 0, "a", 10, "en", "x")], 0)
    commit(lake, [mk("update", 1, "a", 20, "en", "y")], 1)
    ex = LakeChangeExporter(lake, tmp_path / "bus")
    ex.export()
    # a consumer fully reads the bus BEFORE retention
    run_cdc(tmp_path / "bus", tmp_path / "re", num_partitions=2,
            source=envelopes)
    with pytest.raises(ValueError):
        ex.prune(5)  # beyond the exported cursor
    res = ex.prune(2)
    assert res["removed_epochs"] == [0, 1]
    # caught-up consumer: resumes fine (nothing to read)
    run_cdc(tmp_path / "bus", tmp_path / "re", num_partitions=2,
            source=envelopes)
    # new commit -> export -> the caught-up consumer tails past horizon
    commit(lake, [mk("insert", 2, "b", 30, "de", "z")], 2)
    ex.export()
    run_cdc(tmp_path / "bus", tmp_path / "re", num_partitions=2,
            source=envelopes)
    got = LakeTable(tmp_path / "re", num_partitions=2).read_pandas()
    assert sorted(got["url"]) == ["a", "b"]
    # fresh/lagging consumer: loud refusal, never a silent skip
    with pytest.raises(ValueError, match="pruned below"):
        run_cdc(tmp_path / "bus", tmp_path / "re2", num_partitions=2,
                source=envelopes)


def test_bus_consumer_cursor_discipline(tmp_path, ray_session):
    """BusConsumer: read-ack loop with a durable per-consumer cursor,
    at-least-once redelivery before ack, independent consumers, and
    loud refusal when retention pruned past an unacked epoch."""
    from chomper_ray.sources.envelopes import BusConsumer

    lake = LakeTable(tmp_path / "src", key="url", num_partitions=2,
                     collect_changes=False)
    commit(lake, [mk("insert", 0, "a", 10, "en", "x"),
                  mk("insert", 1, "b", 10, "de", "y")], 0)
    ex = LakeChangeExporter(lake, tmp_path / "bus")
    ex.export()
    c1 = BusConsumer(tmp_path / "bus", "feature-pipe")
    ds, eps = c1.read()
    assert eps == [0]
    df = ds.to_pandas()
    assert sorted(df["url"]) == ["a", "b"]
    assert set(df["epoch"]) == {0}
    # re-read before ack redelivers (at-least-once)
    ds2, eps2 = c1.read()
    assert eps2 == [0] and len(ds2.to_pandas()) == 2
    c1.ack(0)
    assert c1.read() == (None, [])
    # second consumer has its own cursor
    c2 = BusConsumer(tmp_path / "bus", "notifier")
    _, eps3 = c2.read()
    assert eps3 == [0]
    # new epoch: only deltas arrive
    commit(lake, [mk("update", 10, "a", 20, "en", "x2")], 1)
    ex.export()
    ds4, eps4 = c1.read()
    assert eps4 == [1] and list(ds4.to_pandas()["url"]) == ["a"]
    c1.ack(1)
    # retention past c2's cursor -> c2 refuses loudly; c1 sails on
    ex.prune(1)
    with pytest.raises(ValueError, match="pruned below"):
        c2.pending()
    assert c1.read() == (None, [])


def test_multi_table_wal_roundtrip(tmp_path, ray_session):
    """export_changes_multi: N lakes ingested from one WAL export back
    into ONE envelope WAL that run_cdc_multi replays — per-table
    snapshot hashes must match the originals; incremental re-export is
    a no-op; maintenance interleaving refuses."""
    from chomper_ray.pipelines.multi import run_cdc_multi
    from chomper_ray.sources import envelopes
    from chomper_ray.sources.events import generate_multi_stream
    from chomper_ray.state.outbound import export_changes_multi

    log = generate_multi_stream(tmp_path / "wal", n_events=2000,
                                n_urls=300, n_links=400, n_epochs=3,
                                seed=11)
    run_cdc_multi(log, tmp_path / "lakes", num_partitions=4)
    lakes = {
        name: LakeTable(tmp_path / "lakes" / name, key=key,
                        num_partitions=4)
        for name, key in [("pages", "url"), ("links", "link_id")]}
    res = export_changes_multi(lakes, tmp_path / "bus")
    assert res["exported_epochs"] == [0, 1, 2] and res["events"] > 0
    # incremental: rerun no-op
    res2 = export_changes_multi(lakes, tmp_path / "bus")
    assert res2["exported_epochs"] == []
    # replay through run_cdc_multi's envelope source
    run_cdc_multi(tmp_path / "bus", tmp_path / "replica",
                  num_partitions=4, source=envelopes)
    for name, key in [("pages", "url"), ("links", "link_id")]:
        a = lakes[name].snapshot_hash()
        b = LakeTable(tmp_path / "replica" / name, key=key,
                      num_partitions=4).snapshot_hash()
        assert a == b, name
    # maintenance interleaving refuses loudly
    lakes["pages"].repartition_table(7)
    with pytest.raises(ValueError, match="maintenance"):
        export_changes_multi(lakes, tmp_path / "bus2")


def test_bus_consumer_on_multi_wal(tmp_path, ray_session):
    """BusConsumer over a multi-table WAL: events arrive with the tbl
    discriminator, consumable per table."""
    from chomper_ray.pipelines.multi import run_cdc_multi
    from chomper_ray.sources.envelopes import BusConsumer
    from chomper_ray.sources.events import generate_multi_stream
    from chomper_ray.state.outbound import export_changes_multi

    log = generate_multi_stream(tmp_path / "wal", n_events=800,
                                n_urls=150, n_links=200, n_epochs=2,
                                seed=3)
    run_cdc_multi(log, tmp_path / "lakes", num_partitions=3)
    lakes = {n: LakeTable(tmp_path / "lakes" / n, key=k,
                          num_partitions=3)
             for n, k in [("pages", "url"), ("links", "link_id")]}
    export_changes_multi(lakes, tmp_path / "bus")
    c = BusConsumer(tmp_path / "bus", "audit")
    ds, eps = c.read()
    df = ds.to_pandas()
    assert eps == [0, 1]
    assert set(df["tbl"]) == {"pages", "links"}
    # per-table slices carry only their own columns non-null
    pages = df[df["tbl"] == "pages"]
    links = df[df["tbl"] == "links"]
    assert pages["url"].notna().all()
    assert links["link_id"].notna().all()
    assert links["url"].isna().all()  # cross-table column stays null
    c.ack(1)
    assert c.read() == (None, [])


def test_embedding_lake_roundtrip(tmp_path, ray_session):
    """list<float> embedding columns ride the envelope wire as JSON
    arrays and replay exactly."""
    import numpy as np

    lake = LakeTable(tmp_path / "src", key="url", num_partitions=2,
                     collect_changes=False)

    def ev(op, seq, url, ts, emb):
        return {"op": op, "seq": seq, "url": url,
                "warc_ts": pd.Timestamp(ts, unit="s"), "emb": emb}

    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [ev("insert", 0, "a", 10, [0.25, -1.5]),
         ev("insert", 1, "b", 10, [3.0, 4.0])],
        schema=pa.schema([("op", pa.string()), ("seq", pa.int64()),
                          ("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("emb", pa.list_(pa.float64()))]))), 0)
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [ev("update", 10, "a", 20, [0.5, 0.5])],
        schema=pa.schema([("op", pa.string()), ("seq", pa.int64()),
                          ("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("emb", pa.list_(pa.float64()))]))), 1)
    LakeChangeExporter(lake, tmp_path / "bus").export()
    got = reingest(tmp_path / "bus", tmp_path).read_pandas() \
        .set_index("url")["emb"]
    assert np.allclose(np.asarray(got["a"]), [0.5, 0.5])
    assert np.allclose(np.asarray(got["b"]), [3.0, 4.0])

"""Composition matrix for the lake→lake families with the rest of the
maintenance surface: a BACKFILL (in-place history reprocess) and a
DELETE_WHERE (administrative delete) are ordinary commits to the
downstream consumers — the derived table propagates exactly the value
changes, and the outbound bus ships them as 'u'/'d' envelopes whose
replay stays roundtrip-exact."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from chomper_ray.state.backfill import LakeBackfill
from chomper_ray.state.derivedtable import DerivedLakeTable
from chomper_ray.state.lake import LakeTable, load_manifest
from chomper_ray.state.outbound import LakeChangeExporter


def mk(op, seq, url, ts, status, text):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"),
            "fetch_status": status, "text": text}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def _make_transform():
    def enrich(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["fetch_status"].fillna(0).astype("int64") == 200]
        out = pd.DataFrame({"url": keep["url"]})
        out["n_tokens"] = keep.get(
            "n_tokens", pd.Series(index=keep.index, dtype="float64"))
        return out
    return enrich


def _token_backfill():
    def enrich(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"], "")
        n = pc.list_value_length(pc.split_pattern(txt, " ")) \
            .cast(pa.int64())
        if "n_tokens" in t.column_names:
            return t.set_column(t.schema.get_field_index("n_tokens"),
                                "n_tokens", n)
        return t.append_column("n_tokens", n)
    return enrich


def test_backfill_propagates_to_derived_and_bus(tmp_path, ray_session):
    up = LakeTable(tmp_path / "up", key="url", num_partitions=3,
                   collect_changes=False)
    commit(up, [mk("insert", 0, "a", 10, 200, "one two three"),
                mk("insert", 1, "b", 10, 200, "four"),
                mk("insert", 2, "c", 10, 404, "nope")], 0)
    dt = DerivedLakeTable(
        up, tmp_path / "down", _make_transform(),
        pa.schema([("url", pa.string()), ("n_tokens", pa.int64())]),
        lake_kwargs={"num_partitions": 2})
    bus = LakeChangeExporter(up, tmp_path / "bus")
    dt.refresh()
    bus.export()
    before = dt.table.read_pandas()
    assert before["n_tokens"].isna().all()  # column not computed yet

    # backfill computes n_tokens in place — a maintenance commit whose
    # lineage marks every rewritten partition as touched
    bf = LakeBackfill(up, "tok-v1", _token_backfill())
    while not bf.run_chunk(max_partitions=1).skipped:
        pass
    dt.refresh()
    res = bus.export()
    after = dt.table.read_pandas().set_index("url")["n_tokens"]
    assert int(after["a"]) == 3 and int(after["b"]) == 1
    assert "c" not in after.index  # still filtered out
    # every live 200-row's value changed -> rides the bus as updates
    assert res["events"] >= 2

    # roundtrip including the backfill commits stays exact
    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.sources import envelopes

    run_cdc(tmp_path / "bus", tmp_path / "re", num_partitions=3,
            source=envelopes)
    a = up.read_pandas().sort_values("url").reset_index(drop=True)
    b = LakeTable(tmp_path / "re", num_partitions=3).read_pandas()
    b = b[a.columns].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_delete_where_propagates(tmp_path, ray_session):
    from chomper_ray.functions.expr import F

    up = LakeTable(tmp_path / "up", key="url", num_partitions=2,
                   collect_changes=False)
    commit(up, [mk("insert", 0, "a", 10, 200, "x"),
                mk("insert", 1, "b", 10, 200, "y"),
                mk("insert", 2, "c", 10, 500, "z")], 0)
    dt = DerivedLakeTable(
        up, tmp_path / "down", _make_transform(),
        pa.schema([("url", pa.string()), ("n_tokens", pa.int64())]),
        lake_kwargs={"num_partitions": 2})
    bus = LakeChangeExporter(up, tmp_path / "bus")
    dt.refresh()
    bus.export()
    # administrative delete (GDPR-style): url == 'a' leaves the lake
    up.delete_where(F("url") == "a",
                    version_ts_us=2_000_000_000_000_000)
    dt.refresh()
    res = bus.export()
    assert sorted(dt.table.read_pandas()["url"]) == ["b"]
    assert res["events"] == 1  # one 'd' envelope, nothing else
    man = load_manifest(dt.table.root)
    assert sum(int(ln["events_in"]) for ln in man["lineage"]) == 1

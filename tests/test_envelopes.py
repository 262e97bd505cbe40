"""Debezium-style envelope source: normalization fidelity + CDC parity.

The envelope log's Parquet twin (written by ``generate_envelope_log``
under ``_source``) carries identical events by construction, so every
test here is an exact-equality test: JSON encode → decode → normalize
must be lossless, including binary payloads, microsecond timestamps and
the int32→int64 schema-evolution epoch.
"""

import json
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pytest

from chomper_ray.pipelines.cdc import run_cdc
from chomper_ray.sources import envelopes as env
from chomper_ray.sources import events as ev
from chomper_ray.state.lake import LakeTable

PARAMS = dict(n_events=1200, n_urls=250, n_epochs=3, seed=11,
              evolution_epoch=2)


@pytest.fixture(scope="module")
def log(tmp_path_factory):
    return env.generate_envelope_log(
        tmp_path_factory.mktemp("envlog") / "log", **PARAMS)


def test_roundtrip_exact_per_epoch(log):
    src = env.source_log(log)
    assert env.list_epochs(log) == ev.list_epochs(src) == [0, 1, 2]
    for e in env.list_epochs(log):
        got = (env.read_epoch(log, e).to_pandas()
               .sort_values("seq").reset_index(drop=True))
        want = (ev.read_epoch(src, e).to_pandas()
                .sort_values("seq").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)


def test_registry_schema_matches_parquet_twin(log):
    src = env.source_log(log)
    for e in env.list_epochs(log):
        assert env.epoch_schema(log, e).equals(ev.epoch_schema(src, e))
    # the evolution epoch actually evolves: int32 → int64 + extra_score
    pre, post = env.epoch_schema(log, 1), env.epoch_schema(log, 2)
    assert pre.field("fetch_status").type == pa.int32()
    assert post.field("fetch_status").type == pa.int64()
    assert "extra_score" in post.names and "extra_score" not in pre.names


def test_epoch_rows_counts_lines(log):
    src = env.source_log(log)
    for e in env.list_epochs(log):
        want = ev.read_epoch(src, e).count()
        assert env.epoch_rows(env.epoch_files(log, e)) == want


def test_column_projection(log):
    got = env.read_epoch(log, 0, columns=["url", "warc_ts"]).to_pandas()
    assert list(got.columns) == ["url", "warc_ts"]


def test_unknown_op_codes_dropped_vectorized(log):
    tbl = pa.table({
        "op": ["c", "x", "u"],
        "ts_ms": [1, 2, 3],
        "source": [{"table": "pages", "epoch": 0, "seq": i}
                   for i in range(3)],
        "before": pa.array([None, None, None],
                           type=pa.struct([("url", pa.string())])),
        "after": [{"url": "a"}, {"url": "b"}, {"url": "c"}],
    })
    target = pa.schema([("op", pa.string()), ("epoch", pa.int64()),
                        ("seq", pa.int64()), ("url", pa.string())])
    out = env.normalize_envelopes(tbl, target)
    assert out["op"].to_pylist() == ["insert", "update"]
    assert out["url"].to_pylist() == ["a", "c"]


def test_snapshot_reads_are_inserts():
    # 'r' (initial snapshot) normalizes as insert
    tbl = pa.table({
        "op": ["r"], "ts_ms": [1],
        "source": [{"table": "pages", "epoch": 0, "seq": 0}],
        "before": pa.array([None], type=pa.struct([("url", pa.string())])),
        "after": [{"url": "a"}],
    })
    target = pa.schema([("op", pa.string()), ("epoch", pa.int64()),
                        ("seq", pa.int64()), ("url", pa.string())])
    out = env.normalize_envelopes(tbl, target)
    assert out["op"].to_pylist() == ["insert"]


def test_delete_reads_before_image(log):
    # every delete row's key/version come from the before image
    src = env.source_log(log)
    for e in env.list_epochs(log):
        got = env.read_epoch(log, e).to_pandas()
        dels = got[got["op"] == "delete"]
        want = ev.read_epoch(src, e).to_pandas()
        wdels = want[want["op"] == "delete"].set_index("seq")
        assert len(dels) == len(wdels)
        for r in dels.itertuples(index=False):
            assert wdels.loc[r.seq, "url"] == r.url
            assert wdels.loc[r.seq, "warc_ts"] == r.warc_ts


def test_cdc_over_envelopes_equals_parquet(log, tmp_path):
    src = env.source_log(log)
    a = run_cdc(log, tmp_path / "a", num_partitions=4, source=env)
    b = run_cdc(src, tmp_path / "b", num_partitions=4)
    assert a.epochs_run == b.epochs_run == [0, 1, 2]
    assert a.events_applied == b.events_applied == PARAMS["n_events"]
    ha = LakeTable(tmp_path / "a", num_partitions=4).snapshot_hash()
    hb = LakeTable(tmp_path / "b", num_partitions=4).snapshot_hash()
    assert ha == hb
    # drain mode over envelopes converges to the same state
    c = run_cdc(log, tmp_path / "c", num_partitions=4, source=env,
                drain=True)
    assert c.epochs_run == [0, 1, 2]
    assert LakeTable(tmp_path / "c",
                     num_partitions=4).snapshot_hash() == ha
    # replay is a no-op (exactly-once cursor holds for the new source)
    again = run_cdc(log, tmp_path / "a", num_partitions=4, source=env)
    assert again.epochs_run == [] and again.events_applied == 0


def test_generator_idempotent(log):
    before = sorted(p.name for p in Path(log).rglob("*.jsonl"))
    out = env.generate_envelope_log(log, **PARAMS)
    assert out == Path(log)
    assert sorted(p.name for p in Path(log).rglob("*.jsonl")) == before


def test_envelope_wire_format_is_debezium_shaped(log):
    line = json.loads(
        Path(env.epoch_files(log, 0)[0]).read_text().splitlines()[0])
    assert set(line) == {"op", "ts_ms", "source", "before", "after"}
    assert line["op"] in ("c", "r", "u", "d")
    assert line["source"]["table"] == "pages"
    if line["op"] == "d":
        assert line["after"] is None and line["before"] is not None
    else:
        assert line["before"] is None and line["after"] is not None

"""Debezium-style CDC envelope source: JSONL op/before/after envelopes.

The reference tails a queue of opaque dict items (``/root/reference/
chomper/contrib/redis.py:39-46``) — the wire format real CDC buses put
on that queue is the Debezium envelope: one JSON document per change
event with ``op`` (``c``/``r``/``u``/``d``), a ``before``/``after`` row
image, a bus timestamp and a ``source`` block. This module makes that
format a first-class log source for the SAME ``run_cdc`` commit path as
the Parquet binlog: the adapter protocol (``list_epochs / epoch_files /
epoch_schema / read_epoch / epoch_rows``) normalizes envelopes into the
exact change-event schema ``sources.events`` produces, so everything
downstream (extraction, LWW merge, schema evolution, exactly-once
manifests) is shared, not re-implemented.

Layout mirrors the Parquet log: ``{log}/epoch=NNNNNN/part-K.jsonl``
plus a per-epoch ``_schema.json`` registry sidecar (the analog of a
schema registry alongside a Kafka topic) that pins the NORMALIZED
column types — JSON alone cannot carry ``int32`` vs ``int64`` or
``timestamp[us]``, and the schema-evolution epoch (additive
``extra_score``, ``fetch_status`` int32→int64 widening) must survive
the roundtrip bit-exactly.

Scale notes: parsing is ``pyarrow.json`` (vectorized C++ NDJSON) and
normalization is Arrow kernels end to end, EXCEPT base64 payload decode
(``html``), which is a per-row ``base64.b64decode`` over the non-null
slice — the irreducible envelope tax for binary columns riding JSON
(the bus itself pays it on encode). Unknown ``op`` codes are dropped,
vectorized, like the reference's bad-line policy
(``chomper/feeders.py`` JSON-lines drop); malformed JSON lines raise —
binlog corruption must be loud, not silent.
"""

from __future__ import annotations

import base64
import json
import os
import uuid
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc

from chomper_ray.state.schema import schema_from_json, schema_to_json

_EPOCH_FMT = "epoch=%06d"
# envelope op code → normalized change-event op. "r" (snapshot read) is
# an insert: replaying the initial-snapshot epoch is how a CDC consumer
# bootstraps.
_OP_CODES = pa.array(["c", "r", "u", "d"])
_OP_NAMES = pa.array(["insert", "insert", "update", "delete"])
# envelope-level columns; everything else is a payload column riding
# before/after ("tbl" rides source.table — Debezium's own table
# discriminator — not the row image)
_ENVELOPE_COLS = ("op", "epoch", "seq", "tbl")


def generate_envelope_log(
    out_dir: str | Path,
    *,
    with_expected_text: bool = False,
    force: bool = False,
    **stream_params,
) -> Path:
    """Deterministic JSONL envelope log: synthesizes the Parquet change
    stream (``sources.events.generate_change_stream``) under
    ``{out}/_source`` and re-encodes every epoch segment as Debezium
    envelopes. The Parquet twin stays on disk as the SQL oracle's input
    — both logs carry identical events by construction, so an engine run
    over the envelopes must hash-equal a DuckDB LWW replay of the
    Parquet twin, pinning the whole encode→decode→normalize path.

    Idempotent via a ``_COMPLETE`` stamp (same contract as the Parquet
    generator).
    """
    from chomper_ray.sources import events as ev

    out = Path(out_dir)
    stamp = f"envelopes,{with_expected_text},{sorted(stream_params.items())}"
    done = out / "_COMPLETE"
    if done.exists() and not force and done.read_text() == stamp:
        return out

    src = ev.generate_change_stream(
        out / "_source", with_expected_text=with_expected_text,
        force=force, **stream_params)
    _encode_epochs(out, src)
    tmp = out / f"._COMPLETE.{uuid.uuid4().hex[:8]}.tmp"
    tmp.write_text(stamp)
    os.replace(tmp, done)
    return out


def _encode_epochs(out: Path, src: Path) -> None:
    """Re-encode every epoch of a Parquet change log as envelope JSONL
    files + per-epoch normalized-schema registry sidecars."""
    import pyarrow.parquet as pq

    from chomper_ray.sources import events as ev

    for epoch in ev.list_epochs(src):
        edir = out / (_EPOCH_FMT % epoch)
        edir.mkdir(parents=True, exist_ok=True)
        norm_schema = None
        for f in ev.epoch_files(src, epoch):
            tbl = pq.read_table(f)
            if norm_schema is None:
                norm_schema = tbl.schema
            # timestamps leave Arrow as epoch-us ints (a naive-datetime
            # .timestamp() would re-interpret in local time)
            cols = {c: (tbl[c].cast(pa.int64()) if
                        pa.types.is_timestamp(tbl[c].type) else
                        tbl[c]).to_pylist()
                    for c in tbl.column_names}
            payload_names = [c for c in tbl.column_names
                             if c not in _ENVELOPE_COLS]
            lines = []
            for i in range(tbl.num_rows):
                op = cols["op"][i]
                image = {}
                for c in payload_names:
                    v = cols[c][i]
                    if c == "warc_ts":
                        # already epoch-microsecond ints (the registry
                        # sidecar restores timestamp[us] on read)
                        image["warc_ts_us"] = None if v is None else int(v)
                    elif c == "html":
                        image["html_b64"] = None if v is None else \
                            base64.b64encode(v).decode("ascii")
                    else:
                        image[c] = v
                code = {"insert": "r" if epoch == 0 else "c",
                        "update": "u", "delete": "d"}[op]
                table = cols["tbl"][i] if "tbl" in cols else "pages"
                # a multi-table stream's union-schema nulls (the other
                # table's columns) don't ride the wire — Debezium
                # envelopes carry only the row's own table's columns
                if "tbl" in cols:
                    image = {k: v for k, v in image.items()
                             if v is not None or k == "html_b64"}
                env = {
                    "op": code,
                    "ts_ms": image.get("warc_ts_us", 0) // 1000
                    if image.get("warc_ts_us") is not None else 0,
                    "source": {"table": table, "epoch": epoch,
                               "seq": cols["seq"][i]},
                    "before": image if code == "d" else None,
                    "after": None if code == "d" else image,
                }
                lines.append(json.dumps(env, separators=(",", ":")))
            name = Path(f).stem  # part-K
            tmp = edir / f".{name}.{uuid.uuid4().hex[:8]}.jsonl.tmp"
            tmp.write_text("\n".join(lines) + "\n")
            os.replace(tmp, edir / f"{name}.jsonl")
        # the normalized-schema registry sidecar (per-epoch: the
        # evolution epoch changes it)
        tmp = edir / f"._schema.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(json.dumps(schema_to_json(norm_schema)))
        os.replace(tmp, edir / "_schema.json")


def generate_multi_envelope_log(
    out_dir: str | Path,
    *,
    force: bool = False,
    **stream_params,
) -> Path:
    """Multi-table Debezium stream: the ``generate_multi_stream`` WAL
    re-encoded as envelopes whose ``source.table`` discriminates — each
    event's image carries ONLY its own table's columns (the union
    schema's cross-table nulls are a storage artifact, not wire
    content). The ``_tables.json`` catalog is mirrored to the envelope
    log root so ``pipelines.multi.table_catalog`` works on either."""
    import shutil as _shutil

    from chomper_ray.sources import events as ev

    out = Path(out_dir)
    stamp = f"multi-envelopes,{sorted(stream_params.items())}"
    done = out / "_COMPLETE"
    if done.exists() and not force and done.read_text() == stamp:
        return out

    src = ev.generate_multi_stream(out / "_source", force=force,
                                   **stream_params)
    _encode_epochs(out, src)
    _shutil.copyfile(src / "_tables.json", out / "_tables.json")
    tmp = out / f"._COMPLETE.{uuid.uuid4().hex[:8]}.tmp"
    tmp.write_text(stamp)
    os.replace(tmp, done)
    return out


def source_log(log_dir: str | Path) -> Path:
    """The Parquet twin written by ``generate_envelope_log`` (oracle
    input)."""
    return Path(log_dir) / "_source"


def list_epochs(log_dir: str | Path) -> list[int]:
    out = []
    for p in Path(log_dir).iterdir():
        if p.is_dir() and p.name.startswith("epoch="):
            out.append(int(p.name.split("=")[1]))
    return sorted(out)


def retention_horizon(log_dir: str | Path) -> int | None:
    """Bus retention marker (``LakeChangeExporter.prune`` writes it):
    epochs below this were deleted."""
    p = Path(log_dir) / "_horizon.json"
    if p.exists():
        return int(json.loads(p.read_text())["horizon"])
    return None


def check_resume(log_dir: str | Path, cursor: int | None) -> None:
    """Refuse a resume that would silently skip pruned epochs: a
    consumer at ``cursor`` reads epochs > cursor, so every epoch >=
    horizon must still satisfy it (cursor + 1 >= horizon). Without this
    check a lagging consumer would jump the gap and permanently
    diverge. Re-bootstrap such a consumer from a snapshot read (or a
    ``branch()``) instead."""
    h = retention_horizon(log_dir)
    if h is None:
        return
    nxt = 0 if cursor is None else cursor + 1
    if nxt < h:
        raise ValueError(
            f"envelope bus at {log_dir} is pruned below epoch {h}; a "
            f"consumer resuming at epoch {nxt} would silently skip "
            f"changes — re-bootstrap it from a snapshot read / branch")


def epoch_files(log_dir: str | Path, epoch: int) -> list[str]:
    edir = Path(log_dir) / (_EPOCH_FMT % epoch)
    return sorted(str(p) for p in edir.glob("part-*.jsonl"))


def epoch_schema(log_dir: str | Path, epoch: int) -> pa.Schema:
    """The NORMALIZED change-event schema, from the registry sidecar —
    exact dtypes (int32 pre-evolution, timestamp[us], binary), which the
    JSON bytes alone cannot express."""
    reg = Path(log_dir) / (_EPOCH_FMT % epoch) / "_schema.json"
    if not reg.exists():
        raise FileNotFoundError(f"no _schema.json for epoch {epoch} "
                                f"in {log_dir}")
    return schema_from_json(json.loads(reg.read_text()))


def epoch_rows(files: list[str]) -> int:
    """Event count = line count (streamed in 1 MiB chunks; no parse)."""
    n = 0
    for f in files:
        with open(f, "rb") as fh:
            while True:
                chunk = fh.read(1 << 20)
                if not chunk:
                    break
                n += chunk.count(b"\n")
    return n


class BusConsumer:
    """Cursor discipline for an EXTERNAL consumer of an outbound bus
    (``state/outbound.LakeChangeExporter`` output) — the engine's own
    ``run_cdc(source=envelopes)`` keeps its cursor in the lake
    manifest; anything else (a feature pipeline, a cache invalidator,
    a notifier) uses this: ``read()`` returns the normalized change
    events of every unacked epoch as one streaming Dataset, ``ack()``
    advances the durable per-consumer cursor (atomic file under the
    bus dir, one per consumer name), and a resume below the bus's
    retention horizon refuses loudly (``check_resume``) instead of
    silently skipping pruned epochs. At-least-once: re-reading before
    ack re-delivers; dedup on (key, version, seq) for exactly-once."""

    def __init__(self, bus_dir: str | Path, name: str):
        if not name or "/" in name:
            raise ValueError("consumer name must be a plain label")
        self.bus = Path(bus_dir)
        self.name = name

    @property
    def _cursor_path(self) -> Path:
        return self.bus / f"_consumer_{self.name}.json"

    def cursor(self) -> int | None:
        p = self._cursor_path
        if p.exists():
            return int(json.loads(p.read_text())["acked_epoch"])
        return None

    def pending(self) -> list[int]:
        cur = self.cursor()
        check_resume(self.bus, cur)
        return [e for e in list_epochs(self.bus)
                if cur is None or e > cur]

    def read(self, columns=None):
        """One streaming Dataset over every unacked epoch's events
        (an ``epoch`` column is appended for per-epoch handling);
        None when nothing is pending."""
        import ray.data as rd

        eps = self.pending()
        parts = []
        for e in eps:
            ds = read_epoch(self.bus, e, columns=columns)

            def add_epoch(t: pa.Table, _e=e) -> pa.Table:
                if "epoch" in t.column_names:
                    t = t.drop_columns(["epoch"])
                return t.append_column(
                    "epoch", pa.array([_e] * t.num_rows, pa.int64()))

            parts.append(ds.map_batches(add_epoch,
                                        batch_format="pyarrow"))
        if not parts:
            return None, []
        ds = parts[0]
        if len(parts) > 1:
            ds = ds.union(*parts[1:])
        return ds, eps

    def ack(self, through_epoch: int) -> None:
        cur = self.cursor()
        if cur is not None and through_epoch < cur:
            raise ValueError(f"ack({through_epoch}) below cursor {cur}")
        tmp = self._cursor_path.with_suffix(
            f".{uuid.uuid4().hex[:8]}.tmp")
        tmp.write_text(json.dumps({"acked_epoch": int(through_epoch)}))
        os.replace(tmp, self._cursor_path)


def _image_field(col: pa.ChunkedArray | pa.Array, name: str, n: int,
                 raw_type: pa.DataType) -> pa.Array:
    """``struct_field`` that tolerates an all-null image column (pyarrow
    infers ``null`` type when e.g. a file holds only deletes) and a
    field the image never carried (pre-evolution epochs): both are just
    nulls of the raw wire type."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_struct(col.type) or \
            col.type.get_field_index(name) < 0:
        return pa.nulls(n, type=raw_type)
    return pc.struct_field(col, name).cast(raw_type)


def _raw_wire_type(field: pa.Field) -> tuple[str, pa.DataType]:
    """(image key, JSON wire type) for a normalized payload field."""
    if field.name == "warc_ts":
        return "warc_ts_us", pa.int64()
    if field.name == "html":
        return "html_b64", pa.string()
    t = field.type
    if pa.types.is_timestamp(t):
        # generic timestamps ride as epoch-us ints under their own name
        return field.name, pa.int64()
    if pa.types.is_integer(t):
        return field.name, pa.int64()
    if pa.types.is_floating(t):
        return field.name, pa.float64()
    return field.name, t


def normalize_envelopes(batch: pa.Table, target: pa.Schema,
                        columns: list[str] | None = None) -> pa.Table:
    """One Arrow batch of parsed envelopes → normalized change events
    conforming exactly to ``target`` (the registry schema). Vectorized
    except the documented base64 hop."""
    n = batch.num_rows
    op_raw = batch["op"]
    if isinstance(op_raw, pa.ChunkedArray):
        op_raw = op_raw.combine_chunks()
    code_idx = pc.index_in(op_raw, _OP_CODES)
    keep = pc.is_valid(code_idx)
    if not pc.all(keep).as_py():
        batch = batch.filter(keep)  # unknown op codes: drop, loudly no
        n = batch.num_rows
        op_raw = batch["op"]
        if isinstance(op_raw, pa.ChunkedArray):
            op_raw = op_raw.combine_chunks()
        code_idx = pc.index_in(op_raw, _OP_CODES)
    ops = pc.take(_OP_NAMES, code_idx)
    is_del = pc.equal(op_raw, "d")
    before, after = batch["before"], batch["after"]
    src = batch["source"]

    out: list[pa.Array] = []
    for f in target:
        if f.name == "op":
            out.append(ops.cast(f.type))
        elif f.name == "tbl":  # the Debezium table discriminator
            out.append(_image_field(src, "table", n, pa.string())
                       .cast(f.type))
        elif f.name in ("epoch", "seq"):
            out.append(_image_field(src, f.name, n, pa.int64())
                       .cast(f.type))
        else:
            key, raw = _raw_wire_type(f)
            val = pc.if_else(is_del,
                             _image_field(before, key, n, raw),
                             _image_field(after, key, n, raw))
            if f.name == "html":
                val = pa.array(
                    [None if v is None else base64.b64decode(v)
                     for v in val.to_pylist()], type=pa.binary())
            out.append(val.cast(f.type))
    tbl = pa.table(out, schema=target)
    return tbl.select(columns) if columns is not None else tbl


def read_epoch(log_dir: str | Path, epoch: int, columns=None):
    """One epoch's envelope files as a streaming normalized Dataset.
    The JSON parse necessarily reads every field off storage (no column
    pruning in NDJSON — the format's tax, noted in the module doc);
    ``columns`` projects immediately after normalization so only the
    requested columns enter the object store."""
    import ray.data as rd

    files = epoch_files(log_dir, epoch)
    if not files:
        # an epoch dir holding only its _schema.json sidecar is a
        # legitimate EMPTY epoch (e.g. an outbound-exported compaction
        # or no-change commit — cursor alignment); only a missing
        # sidecar means the epoch doesn't exist
        try:
            target = epoch_schema(log_dir, epoch)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"no envelope files for epoch {epoch} in {log_dir}")
        out = target.empty_table()
        if columns is not None:
            out = out.select(columns)
        return rd.from_arrow(out)
    spec = schema_to_json(epoch_schema(log_dir, epoch))

    def normalize(batch: pa.Table) -> pa.Table:
        return normalize_envelopes(batch, schema_from_json(spec), columns)

    return rd.read_json(files).map_batches(normalize,
                                           batch_format="pyarrow")

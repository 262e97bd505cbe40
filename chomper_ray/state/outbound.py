"""Outbound CDC — export a lake's per-commit changes as Debezium-style
envelopes (the exact wire format ``sources/envelopes.py`` ingests).

Ancestry: the reference notifies downstream code of upserts through
in-process change listeners (``Upserter.on(event, field, fn)``,
reference contrib/sql/exporters.py:231,250,271-285) — an API bound to
one process and one run. At lake scale the same need (downstream
consumers reacting to changes) becomes a durable, resumable change
STREAM; this module is that listener surface re-expressed as data.

The engine already CONSUMES a CDC bus; ``LakeChangeExporter`` makes it
PRODUCE one: every manifest commit becomes one envelope epoch directory
(``epoch=<cid>/part-*.jsonl`` + the ``_schema.json`` registry sidecar),
containing exactly the commit's changed keys — op ``c`` (no prior live
row), ``u`` (prior live row), ``d`` (tombstone / vanished row, before
image carried) with after/before images, versions and ``_seq``
propagated. Change detection is the same signed-diff machinery the
derived tables use (``plan_commit_diff`` sides, bucketed by key, null-
safe compare — untouched keys co-located in a rewritten COW partition
emit nothing), so export volume ∝ actual change, and the export is
uniform across copy-on-write, merge-on-read and compaction commits
(compaction exports an empty epoch: pure storage reorganization).

Exactly-once: an epoch directory is complete when its ``_schema.json``
lands (written last, tmp→rename); the exporter's atomic cursor file
records the last exported commit id and re-export of a torn epoch
simply rewrites it. A downstream consumer — including this engine's own
``run_cdc(source=envelopes)`` — tails the directory with its own
cursor. The roundtrip is the correctness oracle: re-ingesting an
exported feed into a fresh lake reproduces the source lake's LWW live
state exactly (hash-verified by ``cdc_outbound_roundtrip``).

Emit tasks write part files with attempt-unique names, so a retried
Ray task can leave duplicate envelopes (at-least-once) — harmless by
construction: duplicates carry identical (key, version, seq) and any
LWW consumer (including ``run_cdc``'s staging combiner) collapses
them; exactly-once consumers should dedup on that triple.

Truncate commits export as explicit ``d`` envelopes for every
previously-live key (a bus has no "truncate" signal; consumers must see
the deletes), read from the previous manifest's resolved state.

GC'd diff inputs are an ERROR here, not a fallback: an exporter that
skipped history would silently desynchronize every downstream consumer.
Export before ``compact(keep_epochs=...)`` GCs the window (the cursor
makes that a natural pipeline step), or re-bootstrap consumers from a
snapshot read.
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import uuid
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

from chomper_ray.stages.merge import (BUCKET_COL, INTERNAL_DELETED,
                                      INTERNAL_SEQ, stable_bucket)
from chomper_ray.state import schema as schema_mod
from chomper_ray.state.derivedtable import _neq
from chomper_ray.state.lake import (LakeTable, committed_epochs,
                                    load_manifest,
                                    materialize_mor_resolved,
                                    plan_commit_diff)

_EPOCH_FMT = "epoch=%06d"
_CURSOR = "_outbound_cursor.json"


class ExportHistoryGone(RuntimeError):
    """Diff inputs for an unexported commit were GC'd — the export can
    no longer represent that commit's changes."""


def _image(row: dict, schema_names: list[str]) -> dict:
    """Row dict -> envelope image: warc_ts -> warc_ts_us epoch-us int,
    binary -> *_b64, NaN -> None."""
    out = {}
    for c in schema_names:
        v = row.get(c)
        if v is None or (isinstance(v, float) and np.isnan(v)) \
                or v is pd.NaT:
            v = None
        if c == "warc_ts":
            out["warc_ts_us"] = None if v is None else \
                int(pd.Timestamp(v).value // 1000)
        elif isinstance(v, pd.Timestamp):
            # generic timestamp columns ride as epoch-us ints under
            # their own name; the reader restores timestamp[us] from
            # the registry sidecar (envelopes._raw_wire_type)
            out[c] = int(v.value // 1000)
        elif isinstance(v, (bytes, bytearray)):
            out[f"{c}_b64"] = base64.b64encode(v).decode("ascii")
        elif isinstance(v, (np.ndarray, list, tuple)):
            # embedding / list columns ride as plain JSON arrays; the
            # reader casts back to the sidecar's list type
            out[c] = np.asarray(v).tolist()
        elif v is not None and isinstance(v, (np.integer,)):
            out[c] = int(v)
        elif v is not None and isinstance(v, (np.floating,)):
            out[c] = float(v)
        elif v is not None and isinstance(v, np.bool_):
            out[c] = bool(v)
        else:
            out[c] = v
    return out


class LakeChangeExporter:
    """Export a LakeTable's commits as envelope epochs. ``export()``
    walks every unexported commit in chain order; idempotent and
    crash-resumable (torn epochs rewrite)."""

    def __init__(self, lake: LakeTable, out_dir: str | Path,
                 table_name: str = "pages"):
        self.lake = lake
        self.out = Path(out_dir)
        self.table_name = table_name

    # -- cursor -------------------------------------------------------------
    def _applied(self) -> int | None:
        p = self.out / _CURSOR
        if p.exists():
            return int(json.loads(p.read_text())["exported_cid"])
        return None

    def _write_cursor(self, cid: int) -> None:
        self.out.mkdir(parents=True, exist_ok=True)
        p = self.out / _CURSOR
        tmp = p.with_suffix(f".{uuid.uuid4().hex[:8]}.tmp")
        tmp.write_text(json.dumps({"exported_cid": int(cid)}))
        os.replace(tmp, p)

    # -- retention ----------------------------------------------------------
    def prune(self, before_epoch: int) -> dict:
        """Bus retention: delete exported epoch dirs < ``before_epoch``
        and write the horizon marker (``_horizon.json``) that makes a
        lagging consumer's resume refuse loudly (``envelopes.
        check_resume``) instead of silently skipping the gap. Only
        already-exported epochs can be pruned."""
        cur = self._applied()
        if cur is None or before_epoch > cur + 1:
            raise ValueError(
                f"cannot prune to {before_epoch}: exported cursor is "
                f"{cur} — prune only what consumers could have read")
        removed = []
        for p in sorted(self.out.glob("epoch=*")):
            e = int(p.name.split("=")[1])
            if e < before_epoch:
                shutil.rmtree(p)
                removed.append(e)
        tmp = self.out / f"._horizon.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(json.dumps({"horizon": int(before_epoch)}))
        os.replace(tmp, self.out / "_horizon.json")
        return {"removed_epochs": removed, "horizon": int(before_epoch)}

    # -- export ---------------------------------------------------------------
    def export(self) -> dict:
        from chomper_ray.state.fs import require_local_lake_root

        require_local_lake_root(self.lake, type(self).__name__)
        root = self.lake.root
        cids = committed_epochs(root)
        applied = self._applied()
        prev_cid = None
        exported, lines_total = [], 0
        fresh_bus = applied is None
        for cid in cids:
            if applied is not None and cid <= applied:
                prev_cid = cid
                continue
            man = load_manifest(root, cid)
            prev_man = load_manifest(root, prev_cid) \
                if prev_cid is not None else None
            if man.get("truncated"):
                n = self._export_truncate(cid, prev_man)
            else:
                try:
                    n = self._export_commit(cid, man, prev_man, prev_cid)
                except ExportHistoryGone:
                    if not (fresh_bus and not exported):
                        raise
                    # Debezium-style initial snapshot: a BRAND-NEW bus
                    # on a lake with amputated history (GC'd early
                    # manifests, or a branch() fork) bootstraps from
                    # the full resolved state as 'r' envelopes — no
                    # consumer exists yet, so nothing can be skipped.
                    # Mid-stream gaps (cursor exists) still refuse.
                    n = self._export_snapshot(cid, man)
            self._write_cursor(cid)
            exported.append(cid)
            lines_total += n
            prev_cid = cid
        return {"exported_epochs": exported, "events": lines_total,
                "cursor": self._applied()}

    def _export_snapshot(self, cid: int, man: dict) -> int:
        """Initial-snapshot phase: every live row at ``man`` as an 'r'
        envelope (Debezium snapshot-read op, normalized to insert by
        the reader) — full images, real versions and _seq."""
        import tempfile

        import ray.data as rd

        target = schema_mod.schema_from_json(man["schema"])
        edir = self._epoch_dir(cid)
        scratch = tempfile.mkdtemp(prefix="chomper_ob_snap_")
        try:
            files = materialize_mor_resolved(
                self.lake.root, man, self.lake._mor_kwargs(), scratch)
            if not files:
                self._sidecar(edir, target)
                return 0
            read_schema = pa.schema(
                list(target) + [pa.field(INTERNAL_SEQ, pa.int64()),
                                pa.field(INTERNAL_DELETED, pa.bool_())])
            key, vcol = self.lake.key, self.lake.version[0]
            tnames, tname = list(target.names), self.table_name
            edirs = str(edir)
            data_cols = [c for c in tnames if c != key]

            def emit(df: pd.DataFrame) -> pd.DataFrame:
                live = df[~df[INTERNAL_DELETED].astype(bool)]
                lines = []
                for r in live.to_dict("records"):
                    after = _image(
                        {key: r[key]} | {c: r.get(c) for c in data_cols},
                        tnames)
                    lines.append(json.dumps({
                        "op": "r", "ts_ms": _ts_ms(after, vcol),
                        "source": {"table": tname, "epoch": cid,
                                   "seq": int(r[INTERNAL_SEQ])},
                        "before": None, "after": after,
                    }, separators=(",", ":")))
                _write_part(edirs, lines)
                return pd.DataFrame({"n": [len(lines)]})

            stats = rd.read_parquet(files, schema=read_schema) \
                .map_batches(emit, batch_format="pandas").to_pandas()
            n = int(stats["n"].sum()) if len(stats) else 0
            self._sidecar(edir, target)
            return n
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def _epoch_dir(self, cid: int) -> Path:
        d = self.out / (_EPOCH_FMT % cid)
        if d.exists():  # torn previous attempt — rewrite whole epoch
            shutil.rmtree(d)
        d.mkdir(parents=True, exist_ok=True)
        return d

    def _sidecar(self, edir: Path, target: pa.Schema) -> None:
        """The normalized-event schema the consumer restores (written
        LAST — its presence marks the epoch complete)."""
        norm = pa.schema(
            [pa.field("op", pa.string()), pa.field("epoch", pa.int64()),
             pa.field("seq", pa.int64())]
            + [f for f in target if f.name not in ("op", "epoch", "seq")])
        tmp = edir / f"._schema.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(json.dumps(schema_mod.schema_to_json(norm)))
        os.replace(tmp, edir / "_schema.json")

    def _export_commit(self, cid: int, man: dict, prev_man,
                       prev_cid) -> int:
        target = schema_mod.schema_from_json(man["schema"])
        edir = self._epoch_dir(cid)
        n = self._emit_commit(cid, man, prev_man, prev_cid, edir,
                              wire_epoch=cid)
        self._sidecar(edir, target)
        return n

    def _emit_commit(self, cid: int, man: dict, prev_man, prev_cid,
                     edir: Path, wire_epoch: int) -> int:
        """One commit's changed keys as envelope part files under
        ``edir`` (no sidecar, no dir lifecycle — callers own those;
        ``wire_epoch`` is what rides the envelopes' source.epoch, the
        commit id for single-table buses, the shared LOG epoch for a
        multi-table WAL)."""
        import ray.data as rd

        target = schema_mod.schema_from_json(man["schema"])
        new_files, old_files, missing_old, scratch = plan_commit_diff(
            self.lake, man, prev_man, prev_cid, cid,
            scratch_prefix="chomper_ob_diff_")
        try:
            if missing_old:
                raise ExportHistoryGone(
                    f"commit {cid}: previous-version files were GC'd "
                    "before export — export before compact(), or "
                    "re-bootstrap consumers from a snapshot read")
            if not new_files and not old_files:
                return 0
            read_schema = pa.schema(
                list(target) + [pa.field(INTERNAL_SEQ, pa.int64()),
                                pa.field(INTERNAL_DELETED, pa.bool_())])
            signs = {f: 1 for f in new_files}
            signs.update({f: -1 for f in old_files})
            key = self.lake.key
            nb = int(man.get("num_partitions")
                     or self.lake.num_partitions)

            def tag(t: pa.Table) -> pa.Table:
                side = np.fromiter(
                    (signs[p] for p in t["path"].to_pylist()),
                    dtype=np.int8, count=t.num_rows)
                t = t.drop_columns(["path"]).append_column(
                    "_side", pa.array(side, type=pa.int8()))
                b = stable_bucket(t[key], nb)
                return t.append_column(
                    BUCKET_COL, pa.array(b, type=pa.int32()))

            emit = _make_emitter(str(edir), wire_epoch, key,
                                 list(target.names), self.table_name,
                                 self.lake.version[0])
            stats = (rd.read_parquet(sorted(signs), schema=read_schema,
                                     include_paths=True)
                     .map_batches(tag, batch_format="pyarrow")
                     .groupby(BUCKET_COL)
                     .map_groups(emit, batch_format="pandas")
                     .to_pandas())
            return int(stats["n"].sum()) if len(stats) else 0
        finally:
            if scratch is not None:
                shutil.rmtree(scratch, ignore_errors=True)

    def _export_truncate(self, cid: int, prev_man) -> int:
        """A bus has no truncate signal — emit a delete for every
        previously-live key."""
        import tempfile

        import ray.data as rd

        target = pa.schema([]) if prev_man is None else \
            schema_mod.schema_from_json(prev_man["schema"])
        edir = self._epoch_dir(cid)
        if prev_man is None or not prev_man.get("partitions"):
            self._sidecar(edir, target)
            return 0
        scratch = tempfile.mkdtemp(prefix="chomper_ob_trunc_")
        try:
            files = materialize_mor_resolved(
                self.lake.root, prev_man, self.lake._mor_kwargs(),
                scratch)
            if not files:
                self._sidecar(edir, target)
                return 0
            key = self.lake.key
            vcol = self.lake.version[0]
            read_schema = pa.schema(
                [target.field(key), target.field(vcol),
                 pa.field(INTERNAL_SEQ, pa.int64()),
                 pa.field(INTERNAL_DELETED, pa.bool_())])
            edirs, tname = str(edir), self.table_name

            def emit(df: pd.DataFrame) -> pd.DataFrame:
                live = df[~df[INTERNAL_DELETED].astype(bool)]
                lines = []
                for r in live.to_dict("records"):
                    img = _image(r, [key, vcol])
                    lines.append(json.dumps({
                        "op": "d",
                        "ts_ms": _ts_ms(img, vcol),
                        "source": {"table": tname, "epoch": cid,
                                   "seq": int(r[INTERNAL_SEQ]) + 1},
                        "before": img, "after": None,
                    }, separators=(",", ":")))
                _write_part(edirs, lines)
                return pd.DataFrame({"n": [len(lines)]})

            stats = rd.read_parquet(files, schema=read_schema) \
                .map_batches(emit, batch_format="pandas").to_pandas()
            n = int(stats["n"].sum()) if len(stats) else 0
            self._sidecar(edir, target)
            return n
        finally:
            shutil.rmtree(scratch, ignore_errors=True)


def export_changes_multi(lakes: dict[str, "LakeTable"],
                         out_dir: str | Path) -> dict:
    """One WAL bus for several lakes ingested from a SHARED log
    (``run_cdc_multi``): per LOG epoch, every table's commit at that
    epoch emits its changed keys into the same ``epoch=<log>/`` dir,
    tagged by ``source.table``, under a UNION-schema sidecar (+``tbl``
    discriminator) and a mirrored ``_tables.json`` catalog — exactly
    the multi-envelope wire ``run_cdc_multi(source=envelopes)``
    replays, so the roundtrip reproduces every table.

    Epoch numbering must be shared, so this supports PURE ingest
    chains: a maintenance commit (backfill/delete_where/repartition)
    has no log epoch of its own and raises — export such tables with
    the single-table exporter (per-table buses), or export before
    maintenance. ``run_cdc_multi``'s empty-epoch cursor alignment
    means every table has a commit at every log epoch; tables created
    later simply skip earlier epochs."""
    from chomper_ray.state.fs import require_local_lake_root

    for _name, _lake in lakes.items():
        require_local_lake_root(_lake, f"export_changes_multi[{_name}]")
    out = Path(out_dir)
    steps: dict[str, dict[int, tuple]] = {}
    for name, lake in lakes.items():
        per: dict[int, tuple] = {}
        prev_man, prev_cid, prev_log = None, None, None
        for cid in committed_epochs(lake.root):
            man = load_manifest(lake.root, cid)
            le = man.get("log_epoch")
            if man.get("truncated") or le is None:
                raise ValueError(
                    f"{name}: commit {cid} is a truncate — multi "
                    "export supports pure ingest chains; use the "
                    "single-table exporter per lake")
            if prev_log is not None and int(le) <= int(prev_log):
                raise ValueError(
                    f"{name}: commit {cid} is a maintenance commit "
                    "(no log epoch of its own) — run the single-table "
                    "exporter per lake, or export before maintenance")
            per[int(le)] = (cid, prev_cid, man, prev_man)
            prev_man, prev_cid, prev_log = man, cid, le
        steps[name] = per

    cursor_p = out / _CURSOR
    cursor = int(json.loads(cursor_p.read_text())["exported_cid"]) \
        if cursor_p.exists() else None
    all_eps = sorted(set().union(*[set(p) for p in steps.values()]) or [])
    pending = [e for e in all_eps if cursor is None or e > cursor]
    exported, total = [], 0
    for e in pending:
        edir = out / (_EPOCH_FMT % e)
        if edir.exists():
            shutil.rmtree(edir)  # torn attempt — rewrite
        edir.mkdir(parents=True, exist_ok=True)
        union: pa.Schema | None = None
        for name, lake in lakes.items():
            tup = steps[name].get(e)
            if tup is None:
                continue
            cid, prev_cid, man, prev_man = tup
            exp = LakeChangeExporter(lake, out, table_name=name)
            total += exp._emit_commit(cid, man, prev_man, prev_cid,
                                      edir, wire_epoch=e)
            t = schema_mod.schema_from_json(man["schema"])
            union = t if union is None else schema_mod.reconcile(union, t)
        norm = pa.schema(
            [pa.field("op", pa.string()), pa.field("epoch", pa.int64()),
             pa.field("seq", pa.int64()), pa.field("tbl", pa.string())]
            + [f for f in (union or pa.schema([]))
               if f.name not in ("op", "epoch", "seq", "tbl")])
        tmp = edir / f"._schema.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(json.dumps(schema_mod.schema_to_json(norm)))
        os.replace(tmp, edir / "_schema.json")
        tmp = out / f"._cursor.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(json.dumps({"exported_cid": int(e)}))
        os.replace(tmp, cursor_p)
        exported.append(e)
    catalog = {}
    for name, lake in lakes.items():
        sch = lake.current_schema()
        catalog[name] = {"key": lake.key,
                         "columns": list(sch.names) if sch else []}
    tmp = out / f"._tables.{uuid.uuid4().hex[:8]}.tmp"
    tmp.write_text(json.dumps(catalog))
    os.replace(tmp, out / "_tables.json")
    return {"exported_epochs": exported, "events": total,
            "cursor": cursor if not exported else exported[-1]}


def _ts_ms(image: dict, vcol: str) -> int:
    v = image.get("warc_ts_us" if vcol == "warc_ts" else vcol) or 0
    return int(v) // 1000


def _write_part(edir: str, lines: list[str]) -> None:
    if not lines:
        return
    name = f"part-{uuid.uuid4().hex[:12]}"
    tmp = Path(edir) / f".{name}.{uuid.uuid4().hex[:8]}.jsonl.tmp"
    tmp.write_text("\n".join(lines) + "\n")
    os.replace(tmp, Path(edir) / f"{name}.jsonl")


def _make_emitter(edir: str, cid: int, key: str,
                  target_names: list[str], table_name: str,
                  vcol: str = "warc_ts"):
    data_cols = [c for c in target_names if c != key]

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        new = df[df["_side"] == 1]
        old = df[df["_side"] == -1]
        m = new.merge(old, on=key, how="outer",
                      suffixes=("", "__o"), indicator=True)
        changed = m["_merge"] != "both"
        for c in data_cols + [INTERNAL_DELETED]:
            both = m["_merge"] == "both"
            changed |= both & _neq(m[c], m[f"{c}__o"])
        m = m[changed]
        lines: list[str] = []
        recs = m.to_dict("records")
        for r in recs:
            merge_state = r["_merge"]
            old_live = merge_state != "left_only" and \
                not bool(r[INTERNAL_DELETED + "__o"])
            if merge_state == "right_only":
                if not old_live:
                    continue  # tombstone purged — consumers saw the d
                before = _image({key: r[key],
                                 vcol: r.get(f"{vcol}__o")},
                                [key, vcol])
                env = {"op": "d",
                       "ts_ms": _ts_ms(before, vcol),
                       "source": {"table": table_name, "epoch": cid,
                                  "seq": int(r[INTERNAL_SEQ + "__o"]) + 1},
                       "before": before, "after": None}
            elif bool(r[INTERNAL_DELETED]):  # new-side tombstone
                # the before image IS the stored tombstone row — its
                # version (LWW anti-resurrection) and whatever payload
                # the delete event carried (often null), so a replayed
                # tombstone is byte-identical to the source's
                before = _image(
                    {key: r[key]} | {c: r.get(c) for c in data_cols},
                    target_names)
                env = {"op": "d",
                       "ts_ms": _ts_ms(before, vcol),
                       "source": {"table": table_name, "epoch": cid,
                                  "seq": int(r[INTERNAL_SEQ])},
                       "before": before, "after": None}
            else:
                after = _image(
                    {key: r[key]} | {c: r.get(c) for c in data_cols},
                    target_names)
                env = {"op": "u" if old_live else "c",
                       "ts_ms": _ts_ms(after, vcol),
                       "source": {"table": table_name, "epoch": cid,
                                  "seq": int(r[INTERNAL_SEQ])},
                       "before": None, "after": after}
            lines.append(json.dumps(env, separators=(",", ":")))
        _write_part(edir, lines)
        return pd.DataFrame({"n": [len(lines)]})

    return emit

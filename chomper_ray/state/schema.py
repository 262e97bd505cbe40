"""Canonical Arrow schemas + schema-evolution registry.

The reference's data model is fully dynamic — fields appear and disappear
per item and no schema object exists (``/root/reference/chomper/items.py:181``,
SURVEY §1.1). At lake scale that becomes a **versioned schema registry**:
each epoch's incoming segment schema is reconciled against the current
table schema by

- **additive columns**: new columns join as nullable,
- **type widening**: int8→int16→int32→int64, float32→float64,
  int→float64, string stays string (widening via ``pyarrow.compute.cast``),
- **narrowing is rejected** (raises ``SchemaEvolutionError``).

Reconciliation is order-insensitive for replay: the target schema for
epoch *e* is resolved from the registry of all segments ≤ *e*, not from
whichever batch arrives first (SURVEY §7.6).
"""

from __future__ import annotations

import pyarrow as pa

# Lake page table — exact shape from BASELINE.json `input_hint`.
PAGE_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Change-event envelope (binlog segments, epoch-addressed Parquet);
# see FIXTURES.md §B2.
EVENT_SCHEMA = pa.schema(
    [
        pa.field("op", pa.string()),  # 'insert' | 'update' | 'delete'
        pa.field("epoch", pa.int64()),
        pa.field("seq", pa.int64()),  # total-order tie-break
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("lang", pa.string()),
    ]
)


class SchemaEvolutionError(Exception):
    pass


_INT_ORDER = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}
_FLOAT_ORDER = {pa.float32(): 0, pa.float64(): 1}


def widen(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Least common wider type of two Arrow types; raises when incompatible."""
    if a.equals(b):
        return a
    if a in _INT_ORDER and b in _INT_ORDER:
        return a if _INT_ORDER[a] >= _INT_ORDER[b] else b
    if a in _FLOAT_ORDER and b in _FLOAT_ORDER:
        return a if _FLOAT_ORDER[a] >= _FLOAT_ORDER[b] else b
    if (a in _INT_ORDER and b in _FLOAT_ORDER) or (a in _FLOAT_ORDER and b in _INT_ORDER):
        return pa.float64()
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    if pa.types.is_list(a) and pa.types.is_list(b):
        return pa.list_(widen(a.value_type, b.value_type))
    raise SchemaEvolutionError(f"cannot reconcile {a} with {b}")


def reconcile(current: pa.Schema, incoming: pa.Schema) -> pa.Schema:
    """Evolve ``current`` to absorb ``incoming``: widen shared columns, add
    new ones (nullable) at the end in incoming order. Associative and
    commutative up to column order, so per-epoch resolution over the set
    of segment schemas is replay-order-insensitive."""
    fields = {f.name: f for f in current}
    order = [f.name for f in current]
    for f in incoming:
        if f.name in fields:
            t = widen(fields[f.name].type, f.type)
            fields[f.name] = pa.field(f.name, t, nullable=True)
        else:
            fields[f.name] = pa.field(f.name, f.type, nullable=True)
            order.append(f.name)
    return pa.schema([fields[n] for n in order])


def conform(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast a batch to the target schema: widen existing columns, add
    missing ones as all-null, keep target column order. Columns in the
    batch but not the target are an error (the registry must have seen
    every segment schema first)."""
    extra = set(table.column_names) - set(target.names)
    if extra:
        raise SchemaEvolutionError(f"columns {sorted(extra)} not in target schema")
    cols = []
    for f in target:
        if f.name in table.column_names:
            col = table[f.name]
            cols.append(col if col.type.equals(f.type) else col.cast(f.type))
        else:
            cols.append(pa.nulls(table.num_rows, type=f.type))
    return pa.table(cols, schema=target)


def schema_to_json(schema: pa.Schema) -> list[dict]:
    return [{"name": f.name, "type": str(f.type)} for f in schema]


_TYPES = {
    "string": pa.string(), "large_string": pa.large_string(),
    "binary": pa.binary(), "large_binary": pa.large_binary(),
    "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
    "int64": pa.int64(), "float": pa.float32(), "double": pa.float64(),
    "bool": pa.bool_(), "timestamp[us]": pa.timestamp("us"),
    "timestamp[ms]": pa.timestamp("ms"), "timestamp[ns]": pa.timestamp("ns"),
    "date32[day]": pa.date32(), "null": pa.null(),
}


import re as _re

_LIST_RE = _re.compile(r"^(list|large_list)<[^:<]+: (.+)>$")
_FSL_RE = _re.compile(r"^fixed_size_list<[^:<]+: (.+)>\[(\d+)\]$")


def _parse_type(s: str) -> pa.DataType:
    """Inverse of Arrow's ``str(type)`` for the registry's type domain —
    scalars plus (nested) list/large_list/fixed_size_list, the shapes an
    embedding column round-trips through the manifest as. The child
    field name varies by producer (``item`` from pandas, ``element``
    from parquet) and is semantically irrelevant, so any name parses."""
    if s in _TYPES:
        return _TYPES[s]
    m = _LIST_RE.match(s)
    if m:
        ctor = pa.list_ if m.group(1) == "list" else pa.large_list
        return ctor(_parse_type(m.group(2)))
    m = _FSL_RE.match(s)
    if m:
        return pa.list_(_parse_type(m.group(1)), int(m.group(2)))
    raise SchemaEvolutionError(
        f"unsupported type in schema registry: {s!r}")


def schema_from_json(spec: list[dict]) -> pa.Schema:
    return pa.schema([pa.field(d["name"], _parse_type(d["type"]))
                      for d in spec])

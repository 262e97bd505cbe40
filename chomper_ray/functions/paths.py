"""Dotted/indexed path DSL over nested Arrow columns.

The reference resolves paths like ``'users[0].address.city'`` against
nested dict/list Items (``/root/reference/chomper/utils.py:82-148``;
``items.py:74-89``), with missing paths yielding ``None`` — never a
KeyError. Here the same path grammar resolves VECTORIZED against Arrow
struct/list columns:

- ``job.company.name`` → chained ``pc.struct_field``
- ``friends[0].name`` → ``pc.list_element`` then ``struct_field``
- missing struct field / out-of-range index → all-null column (the
  reference's None default)

``path_get_column`` is the batch-level analogue of ``path_get``;
``path_get_row`` is the row-at-a-time oracle used in tests.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_TOKEN = re.compile(r"([^.\[\]]+)|\[(\d+)\]")


def path_split(path: str) -> list[str | int]:
    """``'users[0].address.city'`` → ``['users', 0, 'address', 'city']``
    (reference ``utils.py:82-97``)."""
    out: list[str | int] = []
    for m in _TOKEN.finditer(path):
        name, idx = m.groups()
        out.append(int(idx) if idx is not None else name)
    return out


def _struct_field_names(t: pa.DataType) -> list[str]:
    return [t.field(i).name for i in range(t.num_fields)]


def path_get_column(table: pa.Table, path: str):
    """Resolve a path against a batch → one column (ChunkedArray/Array).
    Missing anything → all-null column of null type."""
    parts = path_split(path)
    if not parts:
        return pa.nulls(table.num_rows)
    head = parts[0]
    if not isinstance(head, str) or head not in table.column_names:
        return pa.nulls(table.num_rows)
    col = table[head]
    for p in parts[1:]:
        t = col.type
        if isinstance(p, int):
            if pa.types.is_list(t) or pa.types.is_large_list(t):
                # out-of-range → null per Arrow list_element? It raises;
                # guard with list length mask
                lens = pc.list_value_length(col)
                safe = pc.fill_null(pc.greater(lens, p), False)
                if not pc.any(safe).as_py():
                    return pa.nulls(len(col))
                # clamp: replace short lists with null, then element-get
                col = pc.if_else(safe, col, pa.scalar(None, type=t))
                col = pc.list_element(col, p)
            else:
                return pa.nulls(len(col))
        else:
            if pa.types.is_struct(t) and p in _struct_field_names(t):
                col = pc.struct_field(col, p)
            else:
                return pa.nulls(len(col))
    return col


def path_exists_column(table: pa.Table, path: str):
    """Boolean column: path resolves to a non-null value per row."""
    col = path_get_column(table, path)
    return pc.is_valid(col)


def path_get_row(row: dict, path: str, default=None):
    """Row-at-a-time oracle (reference ``utils.py:100-108`` semantics)."""
    cur = row
    for p in path_split(path):
        if isinstance(p, int):
            if isinstance(cur, (list, tuple)) and -len(cur) <= p < len(cur):
                cur = cur[p]
            else:
                return default
        else:
            if isinstance(cur, dict) and p in cur:
                cur = cur[p]
            else:
                return default
    return cur


def path_set_row(row: dict, path: str, value) -> dict:
    """Set a nested value, creating intermediate dicts (reference
    ``utils.py:111-130``). Row-level only: batch-level nested WRITES are
    expressed as struct rebuilds in transforms (rename/assign on nested
    data is a projection in Arrow, not an in-place mutation)."""
    parts = path_split(path)
    cur = row
    for p in parts[:-1]:
        if isinstance(p, int):
            cur = cur[p]
        else:
            cur = cur.setdefault(p, {})
    last = parts[-1]
    cur[last] = value
    return row


def _as_array(values, nrows: int) -> pa.Array:
    if isinstance(values, pa.ChunkedArray):
        return values.combine_chunks()
    if isinstance(values, pa.Array):
        return values
    return pa.array([values] * nrows)


def _rebuild_struct(col, parts: list[str], values: pa.Array,
                    nrows: int) -> pa.StructArray:
    """Functional struct update: copy existing fields, set/descend into
    ``parts``, creating intermediate structs where missing (the
    reference's ``setdefault`` chain, utils.py:111-130). A null parent
    row becomes a struct row holding the new value — exactly what
    setdefault-into-a-fresh-dict produces."""
    fields: dict[str, pa.Array] = {}
    if col is not None and pa.types.is_struct(col.type):
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        for name in _struct_field_names(col.type):
            f = pc.struct_field(col, name)
            fields[name] = f.combine_chunks() \
                if isinstance(f, pa.ChunkedArray) else f
    head = parts[0]
    if len(parts) == 1:
        fields[head] = values
    else:
        sub = fields.get(head)
        if sub is not None and not pa.types.is_struct(sub.type):
            sub = None  # overwrite a scalar on the path like setdefault-dict
        fields[head] = _rebuild_struct(sub, parts[1:], values, nrows)
    names = list(fields)
    return pa.StructArray.from_arrays([fields[n] for n in names], names)


def path_set_column(table: pa.Table, path: str, values) -> pa.Table:
    """Batch-level nested SET: ``path_set_row`` semantics as one Arrow
    struct rebuild per batch (a projection, no per-row Python).
    ``values`` is an Array/ChunkedArray (one value per row) or a scalar
    broadcast to the batch. List-index targets are row-level-only (the
    reference mutates an existing list in place; a vectorized list write
    needs the list to exist per row — raise loudly rather than guess)."""
    parts = path_split(path)
    if not parts:
        return table
    if any(isinstance(p, int) for p in parts):
        raise NotImplementedError(
            "list-index nested writes are row-level only (path_set_row)")
    vals = _as_array(values, table.num_rows)
    head = parts[0]
    if len(parts) == 1:
        new_col = vals
    else:
        col = table[head] if head in table.column_names else None
        new_col = _rebuild_struct(col, parts[1:], vals, table.num_rows)
    if head in table.column_names:
        return table.set_column(table.schema.get_field_index(head), head,
                                new_col)
    return table.append_column(head, new_col)


def path_del_column(table: pa.Table, path: str) -> pa.Table:
    """Batch-level nested DELETE (reference ``utils.py:133-148``): drop a
    top-level column, or rebuild the enclosing struct without the leaf
    field. Missing path → unchanged (never KeyError)."""
    parts = path_split(path)
    if not parts or any(isinstance(p, int) for p in parts):
        if any(isinstance(p, int) for p in parts):
            raise NotImplementedError(
                "list-index nested deletes are row-level only")
        return table
    head = parts[0]
    if head not in table.column_names:
        return table
    if len(parts) == 1:
        return table.drop_columns([head])

    def rebuild_without(col, sub_parts):
        if col is None or not pa.types.is_struct(col.type):
            return col  # path doesn't resolve — unchanged
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        names = _struct_field_names(col.type)
        leaf = sub_parts[0]
        if leaf not in names:
            return col
        if len(sub_parts) == 1:
            keep = [n for n in names if n != leaf]
            return pa.StructArray.from_arrays(
                [pc.struct_field(col, n) for n in keep], keep)
        rebuilt = rebuild_without(pc.struct_field(col, leaf), sub_parts[1:])
        return pa.StructArray.from_arrays(
            [rebuilt if n == leaf else pc.struct_field(col, n)
             for n in names], names)

    new_col = rebuild_without(table[head], parts[1:])
    return table.set_column(table.schema.get_field_index(head), head, new_col)


def flatten_struct(table: pa.Table, column: str, *, sep: str = ".") -> pa.Table:
    """Explode one struct column into top-level ``column.sub`` columns —
    the batch path for pipelines that want the reference's flat-dict view
    of nested data."""
    if column not in table.column_names:
        return table
    col = table[column]
    if not pa.types.is_struct(col.type):
        return table
    out = table.drop_columns([column])
    for name in _struct_field_names(col.type):
        out = out.append_column(f"{column}{sep}{name}", pc.struct_field(col, name))
    return out

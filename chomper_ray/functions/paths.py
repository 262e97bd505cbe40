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

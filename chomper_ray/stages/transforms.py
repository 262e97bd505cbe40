"""Vectorized per-record transforms with the reference's exact semantics.

The reference applies these one item at a time
(``/root/reference/chomper/processors.py:172-368``); here each is a pure
``pyarrow.Table → pyarrow.Table`` operator, and a ``Chain`` composes many
into ONE ``map_batches`` stage (one pass over each Arrow block, zero-copy
from the object store — no per-operator task launch).

Semantics preserved (and unit-tested against the reference's behavior
tables, ``/root/reference/tests/test_processors.py``):

- ``Defaulter`` fills only missing/null values; falsy values (``0``,
  ``False``, ``''``) are KEPT (processors.py:206-208).
- ``Assigner`` overwrites on every row, creating the column if absent
  (processors.py:213-226).
- ``Dropper`` row-scope drops matching rows; field-scope nulls out the
  field where the predicate matches (processors.py:229-248). Null
  predicate results do NOT match (null-safe upgrade over the reference's
  py3 TypeError wart, items.py:229-241).
- ``FieldFilter`` maps a function over one column, SKIPPING nulls
  (processors.py:264-266).
- ``ValueMapper`` replaces values via a mapping, unmapped values pass
  through (processors.py:293-300); ``Renamer`` is the key-rename half of
  the reference's dual-semantics Mapper (processors.py:302-316).
- ``Picker`` keeps only the listed columns — absent ones materialize as
  nulls, mirroring missing-path → None (utils.py:100-108);
  ``Omitter`` deletes listed columns (processors.py:319-356).
"""

from __future__ import annotations

import json
import logging
from typing import Any, Callable, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from chomper_ray.functions.expr import Expression


class Transform:
    """Base: a pure ``pa.Table → pa.Table`` batch operator."""

    def apply(self, table: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError

    def __call__(self, table: pa.Table) -> pa.Table:
        return self.apply(table)


def _set_column(table: pa.Table, name: str, values) -> pa.Table:
    """Replace-or-append a column (length-checked; the value's own Arrow
    type wins — callers cast when cross-batch schema stability matters)."""
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(values)
    if len(values) != table.num_rows:
        raise ValueError(f"column {name!r}: length {len(values)} != {table.num_rows}")
    if name in table.column_names:
        return table.set_column(table.schema.get_field_index(name), name, values)
    return table.append_column(name, values)


class Defaulter(Transform):
    """Fill nulls with defaults; create absent columns filled wholesale.

    ``defaults`` maps column → constant or zero-arg callable (the
    reference allows per-item callables, processors.py:185-189; the
    vectorized analogue is a callable of the batch returning an array).
    """

    def __init__(self, defaults: dict[str, Any]):
        self.defaults = defaults

    def apply(self, table: pa.Table) -> pa.Table:
        for name, default in self.defaults.items():
            if callable(default):
                fill = default(table)
            else:
                fill = default
            if name in table.column_names:
                col = table[name]
                if isinstance(fill, (pa.Array, pa.ChunkedArray)):
                    filled = pc.coalesce(col, fill)
                else:
                    filled = pc.fill_null(col, pa.scalar(fill, type=col.type))
                table = _set_column(table, name, filled)
            else:
                if isinstance(fill, (pa.Array, pa.ChunkedArray)):
                    table = _set_column(table, name, fill)
                else:
                    table = _set_column(table, name, pa.repeat(fill, table.num_rows))
        return table


class Assigner(Transform):
    """Set a column to a constant or computed value on EVERY row."""

    def __init__(self, column: str, value: Any):
        self.column = column
        self.value = value

    def apply(self, table: pa.Table) -> pa.Table:
        v = self.value
        if callable(v):
            values = v(table)
            if not isinstance(values, (pa.Array, pa.ChunkedArray)):
                values = pa.array(values)
        else:
            values = pa.repeat(v, table.num_rows) if v is not None \
                else pa.nulls(table.num_rows)
        return _set_column(table, self.column, values)


class Dropper(Transform):
    """Row-scope: drop rows matching ``expr``. Field-scope (``column``
    given): null out that column where ``expr`` matches."""

    def __init__(self, expr: Expression, column: str | None = None):
        self.expr = expr
        self.column = column

    def apply(self, table: pa.Table) -> pa.Table:
        mask = self.expr.matches(table)  # null-safe: null → False
        if self.column is None:
            return table.filter(pc.invert(mask))
        if self.column not in table.column_names:
            return table
        col = table[self.column]
        nulled = pc.if_else(mask, pa.scalar(None, type=col.type), col)
        return _set_column(table, self.column, nulled)


class FieldFilter(Transform):
    """Apply a function to one column's values, skipping nulls.

    ``fn`` receives the column (ChunkedArray) and returns an array —
    use ``pyarrow.compute`` kernels (they propagate nulls natively) or
    wrap a scalar Python function with :func:`scalar_fn`.
    """

    def __init__(self, column: str, fn: Callable):
        self.column = column
        self.fn = fn

    def apply(self, table: pa.Table) -> pa.Table:
        if self.column not in table.column_names:
            return table
        col = table[self.column]
        out = self.fn(col)
        if not isinstance(out, (pa.Array, pa.ChunkedArray)):
            out = pa.array(out)
        # reference skips None values (processors.py:264-266): restore nulls
        out = pc.if_else(pc.is_null(col), pa.scalar(None, type=out.type), out)
        return _set_column(table, self.column, out)


def scalar_fn(fn: Callable) -> Callable:
    """Lift a scalar Python function to an array function (nulls skipped).

    For hot paths prefer a real ``pyarrow.compute`` kernel; this is the
    escape hatch for arbitrary Python UDFs (reference README.md:239-268).
    """

    def apply(col) -> pa.Array:
        return pa.array([None if v is None else fn(v) for v in col.to_pylist()])

    return apply


class ValueMapper(Transform):
    """Replace values of one column via a mapping; unmapped pass through.

    Vectorized as ``index_in`` + ``take`` over the mapping arrays — a
    dictionary join, no Python loop.
    """

    def __init__(self, column: str, mapping: dict):
        self.column = column
        self.mapping = mapping

    def apply(self, table: pa.Table) -> pa.Table:
        if self.column not in table.column_names:
            return table
        col = table[self.column]
        keys = pa.array(list(self.mapping.keys()), type=col.type)
        vals = pa.array(list(self.mapping.values()))
        idx = pc.index_in(col, value_set=keys)  # null where unmapped
        replaced = pc.take(vals, idx)
        if replaced.type != col.type and not pa.types.is_null(replaced.type):
            replaced = replaced.cast(col.type, safe=False)
        # select on index VALIDITY, not the replaced values: a mapping may
        # legitimately map a value to null (reference Mapper assigns the
        # mapped None — processors.py:293-300); coalesce would silently
        # restore the original
        out = pc.if_else(pc.is_valid(idx), replaced, col)
        return _set_column(table, self.column, out)


class Renamer(Transform):
    """Rename columns present in ``mapping`` (old → new)."""

    def __init__(self, mapping: dict[str, str]):
        self.mapping = mapping

    def apply(self, table: pa.Table) -> pa.Table:
        names = [self.mapping.get(n, n) for n in table.column_names]
        return table.rename_columns(names)


class Picker(Transform):
    """Keep only the listed columns; absent ones appear as all-null."""

    def __init__(self, columns: Sequence[str]):
        self.columns = list(columns)

    def apply(self, table: pa.Table) -> pa.Table:
        cols, names = [], []
        for name in self.columns:
            names.append(name)
            if name in table.column_names:
                cols.append(table[name])
            else:
                cols.append(pa.nulls(table.num_rows))
        return pa.table(cols, names=names)


class Omitter(Transform):
    """Delete the listed columns (missing ones ignored)."""

    def __init__(self, columns: Sequence[str]):
        self.columns = set(columns)

    def apply(self, table: pa.Table) -> pa.Table:
        keep = [n for n in table.column_names if n not in self.columns]
        return table.select(keep)


class PathAssigner(Transform):
    """Nested SET as a first-class batch operator: ``a.b.c`` targets
    rebuild the enclosing struct column (reference nested set,
    utils.py:111-130). ``value`` is a constant or ``fn(table) → Array``.
    """

    def __init__(self, path: str, value):
        self.path = path
        self.value = value

    def apply(self, table: pa.Table) -> pa.Table:
        from chomper_ray.functions.paths import path_set_column

        v = self.value(table) if callable(self.value) else self.value
        return path_set_column(table, self.path, v)


class PathDeleter(Transform):
    """Nested DELETE (reference utils.py:133-148): drop a leaf field out
    of a struct column, or a top-level column; missing paths are no-ops.
    """

    def __init__(self, path: str):
        self.path = path

    def apply(self, table: pa.Table) -> pa.Table:
        from chomper_ray.functions.paths import path_del_column

        return path_del_column(table, self.path)


class Logger(Transform):
    """Identity observability op (reference ``Logger``,
    processors.py:359-368: logs every item as JSON at a chosen level).

    Batch-shaped: logging 10^9 rows row-at-a-time is the one reference
    behavior that must NOT scale up, so this logs a per-batch summary
    (rows, columns) plus up to ``sample_rows`` sampled rows as sorted
    JSON — and only every ``every`` batches. Rows pass through untouched;
    cumulative row counts live in the `Pipeline` counters.
    """

    def __init__(self, name: str = "chomper_ray.logger",
                 level: int = logging.DEBUG, sample_rows: int = 1,
                 every: int = 1):
        self.logger = logging.getLogger(name)
        self.level = level
        self.sample_rows = sample_rows
        self.every = max(1, every)
        self._batch_no = 0

    def apply(self, table: pa.Table) -> pa.Table:
        self._batch_no += 1
        if self._batch_no % self.every == 0 and \
                self.logger.isEnabledFor(self.level):
            head = [
                json.dumps(r, sort_keys=True, default=str)
                for r in table.slice(0, self.sample_rows).to_pylist()
            ]
            self.logger.log(
                self.level, "batch %d: %d rows, cols=%s%s", self._batch_no,
                table.num_rows, table.column_names,
                (" sample=" + "; ".join(head)) if head else "")
        return table


class Chain(Transform):
    """Compose transforms into one ``map_batches``-ready callable.

    The whole reference pipeline-of-processors becomes ONE stage: one
    task per block, one pass over the Arrow data.
    """

    def __init__(self, *transforms: Transform):
        self.transforms = list(transforms)

    def apply(self, table: pa.Table) -> pa.Table:
        for t in self.transforms:
            table = t.apply(table)
        return table


def date_features(batch, col: str, ref_date: str = "1998-01-01",
                  shift_days: int = 30):
    """Date-part extraction + date arithmetic over a date column — the
    engine-side pack for SQL ``year/month/day/dayofweek/isodow/
    weekofyear/quarter``, ``d + INTERVAL n DAY`` and ``datediff``.
    Every output is int64 (epoch-day for the shifted date), so values
    hash-compare with no timestamp-dtype ambiguity. Conventions pinned
    by tests: DuckDB ``dayofweek`` is Sunday=0 (pandas is Monday=0 —
    shifted here), ``weekofyear`` is the ISO week."""
    import pandas as pd

    d = pd.to_datetime(batch[col])
    batch["year"] = d.dt.year.astype("int64")
    batch["month"] = d.dt.month.astype("int64")
    batch["day"] = d.dt.day.astype("int64")
    batch["dow"] = ((d.dt.dayofweek + 1) % 7).astype("int64")
    batch["isodow"] = (d.dt.dayofweek + 1).astype("int64")
    batch["week"] = d.dt.isocalendar().week.astype("int64")
    batch["quarter"] = d.dt.quarter.astype("int64")
    epoch = pd.Timestamp("1970-01-01")
    batch["shifted_epoch_day"] = \
        ((d - epoch).dt.days + shift_days).astype("int64")
    batch["days_to_ref"] = \
        (pd.Timestamp(ref_date) - d).dt.days.astype("int64")
    return batch

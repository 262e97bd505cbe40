"""Expression model compiled once to vectorized Arrow kernels.

The reference builds binary-expression trees from ``Field`` comparisons
(``/root/reference/chomper/items.py:6-47, 91-116``) and evaluates them one
item at a time via ``Item.eval`` (``items.py:229-241``), with a known wart:
a missing field evaluates to ``None`` and comparisons then raise on py3.

Here the same operator vocabulary (EQ NE LT LTE GT GTE IN NOT_IN, plus
AND/OR/NOT conjunctions the SQL layer implies) compiles ONCE to
``pyarrow.compute`` kernels applied per batch — null-safe by Arrow
semantics: a comparison against null is null, and ``mask(null)`` rows are
treated as *not matching* (kept by Dropper, see transforms). Expressions
also render to ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

_OPS = {"eq", "ne", "lt", "lte", "gt", "gte", "in", "not_in", "and", "or", "not"}

_SQL_OP = {
    "eq": "=", "ne": "<>", "lt": "<", "lte": "<=", "gt": ">", "gte": ">=",
    "and": "AND", "or": "OR",
}


class Expression:
    """A binary/unary predicate node. Built via ``F('col') > 5`` sugar."""

    __slots__ = ("op", "left", "right")

    def __init__(self, op: str, left: Any, right: Any = None):
        if op not in _OPS:
            raise ValueError(f"unknown op {op!r}")
        self.op = op
        self.left = left
        self.right = right

    # conjunctions — & | ~ like pyarrow/pandas
    def __and__(self, other: "Expression") -> "Expression":
        return Expression("and", self, other)

    def __or__(self, other: "Expression") -> "Expression":
        return Expression("or", self, other)

    def __invert__(self) -> "Expression":
        return Expression("not", self)

    # ---- evaluation -----------------------------------------------------
    def mask(self, table: pa.Table) -> pa.ChunkedArray:
        """Evaluate to a boolean array over the batch (nulls possible)."""
        op = self.op
        if op == "not":
            return pc.invert(self.left.mask(table))
        if op in ("and", "or"):
            l, r = self.left.mask(table), self.right.mask(table)
            return (pc.and_kleene if op == "and" else pc.or_kleene)(l, r)
        left = _operand(self.left, table)
        if op in ("in", "not_in") and _is_null_typed(left):
            if op == "in":  # null is never in the set (matches row oracle)
                return pa.array([False] * table.num_rows, type=pa.bool_())
            return pa.nulls(table.num_rows, type=pa.bool_())
        if op == "in":
            return pc.is_in(left, value_set=pa.array(list(self.right)))
        if op == "not_in":
            # null value is neither in nor not-in the set (unknown)
            inv = pc.invert(pc.is_in(left, value_set=pa.array(list(self.right))))
            return pc.if_else(pc.is_valid(left), inv, pa.scalar(None, pa.bool_()))
        right = _operand(self.right, table)
        if _is_null_typed(left) or _is_null_typed(right):
            # comparing against an all-null (null-typed) operand is
            # unknown everywhere — no Arrow kernel exists for null types
            return pa.nulls(table.num_rows, type=pa.bool_())
        fn = {"eq": pc.equal, "ne": pc.not_equal, "lt": pc.less,
              "lte": pc.less_equal, "gt": pc.greater, "gte": pc.greater_equal}[op]
        return fn(left, right)

    def matches(self, table: pa.Table) -> pa.ChunkedArray:
        """Null-safe mask: null comparison results count as False."""
        m = self.mask(table)
        return pc.fill_null(m, False)

    def eval_row(self, row: dict) -> bool:
        """Row-at-a-time oracle evaluation (used by tests): three-valued
        Kleene logic internally, unknown → False at the top (identical to
        ``matches``' ``fill_null(False)``)."""
        v = self._eval3(row)
        return bool(v) if v is not None else False

    def _eval3(self, row: dict):
        op = self.op
        if op == "not":
            v = self.left._eval3(row)
            return None if v is None else (not v)
        if op in ("and", "or"):
            l, r = self.left._eval3(row), self.right._eval3(row)
            if op == "and":
                if l is False or r is False:
                    return False
                return None if (l is None or r is None) else True
            if l is True or r is True:
                return True
            return None if (l is None or r is None) else False
        lv = row.get(self.left.name) if isinstance(self.left, Col) else self.left
        if op == "in":
            return lv is not None and lv in self.right
        if op == "not_in":
            return None if lv is None else lv not in self.right
        rv = row.get(self.right.name) if isinstance(self.right, Col) else self.right
        if lv is None or rv is None:
            return None
        import operator as _o
        return {"eq": _o.eq, "ne": _o.ne, "lt": _o.lt, "lte": _o.le,
                "gt": _o.gt, "gte": _o.ge}[op](lv, rv)

    # ---- SQL rendering (DuckDB oracle) ----------------------------------
    def to_sql(self) -> str:
        op = self.op
        if op == "not":
            return f"(NOT {self.left.to_sql()})"
        if op in ("and", "or"):
            return f"({self.left.to_sql()} {_SQL_OP[op]} {self.right.to_sql()})"
        left = _sql_operand(self.left)
        if op in ("in", "not_in"):
            vals = ", ".join(_sql_operand(v) for v in self.right)
            kw = "IN" if op == "in" else "NOT IN"
            return f"({left} {kw} ({vals}))"
        return f"({left} {_SQL_OP[op]} {_sql_operand(self.right)})"

    # ---- pushdown compilation (parquet scanner) --------------------------
    def columns(self) -> set[str]:
        """Column names the predicate references (for read pruning and
        pushdown-safety checks)."""
        out: set[str] = set()
        for side in (self.left, self.right):
            if isinstance(side, Expression):
                out |= side.columns()
            elif isinstance(side, Col):
                out.add(side.name)
        return out

    def to_arrow_dataset(self):
        """Compile to a ``pyarrow.dataset`` expression so the parquet
        scanner prunes row groups by column statistics BEFORE any bytes
        reach Ray. Match semantics equal ``matches`` (nulls don't
        match): the scanner keeps only rows where the predicate is
        true. Callers must ensure every referenced column exists in
        every scanned file (schema evolution — see
        ``LakeTable.read(where=...)``'s safety walk)."""
        import pyarrow.dataset as pds

        op = self.op
        if op == "not":
            # three-valued NOT: unknown stays unknown (excluded) either
            # way, so scanner-level invert preserves matches semantics
            return ~self.left.to_arrow_dataset()
        if op in ("and", "or"):
            l, r = (self.left.to_arrow_dataset(),
                    self.right.to_arrow_dataset())
            return (l & r) if op == "and" else (l | r)

        def operand(v):
            return pds.field(v.name) if isinstance(v, Col) else \
                pds.scalar(v)

        left = operand(self.left)
        if op == "in":
            return left.isin(list(self.right))
        if op == "not_in":
            return ~left.isin(list(self.right))
        right = operand(self.right)
        import operator as _o

        return {"eq": _o.eq, "ne": _o.ne, "lt": _o.lt, "lte": _o.le,
                "gt": _o.gt, "gte": _o.ge}[op](left, right)

    def __repr__(self) -> str:
        return f"Expression({self.op!r}, {self.left!r}, {self.right!r})"


class Col:
    """Column reference; comparison operators build Expressions.

    Mirrors the reference's ``Field`` comparison sugar
    (``/root/reference/chomper/items.py:91-116``) at column granularity.
    """

    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name

    def __eq__(self, other):  # type: ignore[override]
        return Expression("eq", self, other)

    def __ne__(self, other):  # type: ignore[override]
        return Expression("ne", self, other)

    def __lt__(self, other):
        return Expression("lt", self, other)

    def __le__(self, other):
        return Expression("lte", self, other)

    def __gt__(self, other):
        return Expression("gt", self, other)

    def __ge__(self, other):
        return Expression("gte", self, other)

    def isin(self, values) -> Expression:
        return Expression("in", self, list(values))

    def notin(self, values) -> Expression:
        return Expression("not_in", self, list(values))

    def to_sql(self) -> str:
        return self.name

    def __repr__(self) -> str:
        return f"F({self.name!r})"

    def __hash__(self):
        return hash(self.name)


def F(name: str) -> Col:
    return Col(name)


def _is_null_typed(v: Any) -> bool:
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return pa.types.is_null(v.type)
    if isinstance(v, pa.Scalar):
        return pa.types.is_null(v.type)
    return False


def _operand(v: Any, table: pa.Table):
    if isinstance(v, Col):
        if v.name not in table.column_names:
            # missing column ≡ all-null (reference: missing path → None,
            # utils.py:100-108) — comparisons yield null → not matched
            return pa.nulls(table.num_rows)
        return table[v.name]
    return pa.scalar(v)


def _sql_operand(v: Any) -> str:
    if isinstance(v, Col):
        return v.to_sql()
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if v is None:
        return "NULL"
    return repr(v)

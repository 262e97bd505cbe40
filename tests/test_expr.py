"""Expression compiler: operator vocabulary + null-safety.

Semantics mirror the reference's Expression/OPERATORS tables
(/root/reference/chomper/items.py:6-47) with the null-safe upgrade
(missing field → not matched, instead of the py3 TypeError wart at
items.py:229-241)."""

import pyarrow as pa

from chomper_ray.functions.expr import F


TBL = pa.table({
    "a": [1, 2, 3, None],
    "s": ["x", "y", "z", None],
})


def m(expr):
    return expr.matches(TBL).to_pylist()


def test_comparison_ops():
    assert m(F("a") == 2) == [False, True, False, False]
    assert m(F("a") != 2) == [True, False, True, False]
    assert m(F("a") < 2) == [True, False, False, False]
    assert m(F("a") <= 2) == [True, True, False, False]
    assert m(F("a") > 2) == [False, False, True, False]
    assert m(F("a") >= 2) == [False, True, True, False]


def test_in_notin():
    assert m(F("s").isin(["x", "z"])) == [True, False, True, False]
    assert m(F("s").notin(["x", "z"])) == [False, True, False, False]


def test_conjunctions():
    assert m((F("a") > 1) & (F("s") == "y")) == [False, True, False, False]
    assert m((F("a") == 1) | (F("s") == "z")) == [True, False, True, False]
    assert m(~(F("a") > 1)) == [True, False, False, False]


def test_missing_column_is_all_null_not_error():
    # reference: missing path resolves to None (utils.py:100-108)
    assert m(F("nope") > 0) == [False] * 4


def test_column_vs_column():
    t = pa.table({"a": [1, 5], "b": [2, 4]})
    assert (F("a") < F("b")).matches(t).to_pylist() == [True, False]


def test_row_oracle_matches_vectorized():
    exprs = [
        F("a") > 1, F("a") <= 2, (F("a") > 0) & (F("s") == "y"),
        F("s").isin(["x"]), ~(F("a") == 3), F("missing") == 1,
    ]
    rows = TBL.to_pylist()
    for e in exprs:
        assert [e.eval_row(r) for r in rows] == m(e), str(e)


def test_to_sql():
    assert (F("a") > 1).to_sql() == "(a > 1)"
    assert (F("s").isin(["x", "y'z"])).to_sql() == "(s IN ('x', 'y''z'))"
    sql = ((F("a") > 1) & (F("s") == "y")).to_sql()
    assert sql == "((a > 1) AND (s = 'y'))"

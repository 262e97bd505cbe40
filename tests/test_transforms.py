"""Transform semantics vs the reference's processor behavior tables
(/root/reference/tests/test_processors.py)."""

import pyarrow as pa
import pyarrow.compute as pc

from chomper_ray.functions.expr import F
from chomper_ray.stages.transforms import (
    Assigner, Chain, Defaulter, Dropper, FieldFilter, Omitter, Picker,
    Renamer, ValueMapper, scalar_fn,
)


def t(**cols):
    return pa.table(cols)


class TestDefaulter:
    def test_fills_null_only_keeps_falsy(self):
        # reference: falsy values (0, '', False) are KEPT
        # (processors.py:206-208; tests/test_processors.py:48-55)
        tbl = t(x=[None, 0, 5], s=[None, "", "a"])
        out = Defaulter({"x": 9, "s": "d"}).apply(tbl)
        assert out["x"].to_pylist() == [9, 0, 5]
        assert out["s"].to_pylist() == ["d", "", "a"]

    def test_creates_missing_column(self):
        out = Defaulter({"new": 7}).apply(t(a=[1, 2]))
        assert out["new"].to_pylist() == [7, 7]

    def test_callable_default(self):
        out = Defaulter({"x": lambda tb: pc.add(tb["a"], 10)}).apply(
            t(a=[1, 2], x=[None, 5]))
        assert out["x"].to_pylist() == [11, 5]


class TestAssigner:
    def test_overwrites_every_row(self):
        out = Assigner("x", 1).apply(t(x=[5, None, 7]))
        assert out["x"].to_pylist() == [1, 1, 1]

    def test_creates_column(self):
        out = Assigner("tag", "T").apply(t(a=[1, 2]))
        assert out["tag"].to_pylist() == ["T", "T"]

    def test_computed(self):
        out = Assigner("dbl", lambda tb: pc.multiply(tb["a"], 2)).apply(t(a=[3, 4]))
        assert out["dbl"].to_pylist() == [6, 8]


class TestDropper:
    def test_row_scope_drops_matching(self):
        # processors.py:238-242 (DropItem)
        out = Dropper(F("a") > 2).apply(t(a=[1, 3, 2, None]))
        assert out["a"].to_pylist() == [1, 2, None]  # null pred → kept

    def test_field_scope_nulls_out(self):
        # processors.py:244-248 (DropField)
        out = Dropper(F("a") > 2, column="b").apply(t(a=[1, 3], b=["x", "y"]))
        assert out["b"].to_pylist() == ["x", None]


class TestFieldFilter:
    def test_applies_kernel_skips_null(self):
        # processors.py:264-266: None values are skipped
        out = FieldFilter("s", pc.utf8_upper).apply(t(s=["ab", None, "c"]))
        assert out["s"].to_pylist() == ["AB", None, "C"]

    def test_scalar_fn_wrapper(self):
        out = FieldFilter("s", scalar_fn(lambda v: v + "!")).apply(
            t(s=["a", None]))
        assert out["s"].to_pylist() == ["a!", None]


class TestValueMapper:
    def test_replace_with_passthrough(self):
        # processors.py:293-300: missing keys pass through
        out = ValueMapper("s", {"a": "A", "b": "B"}).apply(t(s=["a", "b", "c", None]))
        assert out["s"].to_pylist() == ["A", "B", "c", None]

    def test_int_mapping(self):
        out = ValueMapper("x", {1: 10, 2: 20}).apply(t(x=[1, 2, 3]))
        assert out["x"].to_pylist() == [10, 20, 3]


class TestRenamer:
    def test_renames_listed_only(self):
        # the key-rename half of the reference's Mapper (processors.py:302-316)
        out = Renamer({"a": "alpha"}).apply(t(a=[1], b=[2]))
        assert out.column_names == ["alpha", "b"]


class TestPickerOmitter:
    def test_picker_keeps_listed_missing_as_null(self):
        out = Picker(["a", "ghost"]).apply(t(a=[1, 2], b=[3, 4]))
        assert out.column_names == ["a", "ghost"]
        assert out["ghost"].to_pylist() == [None, None]

    def test_omitter(self):
        out = Omitter(["b", "ghost"]).apply(t(a=[1], b=[2]))
        assert out.column_names == ["a"]


def test_chain_composes_in_order():
    chain = Chain(
        Defaulter({"x": 0}),
        Assigner("flag", "ok"),
        Dropper(F("x") > 10),
        Picker(["x", "flag"]),
    )
    out = chain(t(x=[None, 5, 99], y=["a", "b", "c"]))
    assert out.column_names == ["x", "flag"]
    assert out["x"].to_pylist() == [0, 5]


def test_chain_in_map_batches():
    import ray.data as rd

    chain = Chain(Assigner("two", lambda tb: pc.multiply(tb["a"], 2)),
                  Dropper(F("a") == 3))
    ds = rd.from_arrow(t(a=[1, 2, 3, 4]))
    out = ds.map_batches(chain, batch_format="pyarrow").to_pandas()
    assert sorted(out["two"].tolist()) == [2, 4, 8]


def test_value_mapper_can_map_to_null():
    """ADVICE r01: the reference Mapper assigns a mapped None
    (processors.py:293-300) — 'mapped to null' must not fall back to the
    original value."""
    import pyarrow as pa

    from chomper_ray.stages.transforms import ValueMapper

    t = pa.table({"s": ["drop", "keep", None, "x"]})
    out = ValueMapper("s", {"drop": None, "x": "y"}).apply(t)
    assert out["s"].to_pylist() == [None, "keep", None, "y"]


def test_date_features_duckdb_conventions():
    import duckdb
    import pandas as pd

    from chomper_ray.stages.transforms import date_features

    # year boundaries, ISO-week edge cases, leap day, a Sunday
    dates = ["1995-01-01", "1997-12-31", "1996-02-29", "1994-02-28",
             "2000-01-03", "1993-06-15"]
    df = pd.DataFrame({"d": pd.to_datetime(dates).date})
    got = date_features(df.copy(), col="d")
    exp = duckdb.sql(
        "SELECT year(d) y, month(d) m, day(d) dd, dayofweek(d) dow, "
        "isodow(d) iso, weekofyear(d) w, quarter(d) q, "
        "datediff('day', DATE '1970-01-01', "
        "CAST(d + INTERVAL 30 DAY AS DATE)) sed, "
        "datediff('day', d, DATE '1998-01-01') dtr FROM df").df()
    assert got["year"].tolist() == exp["y"].tolist()
    assert got["month"].tolist() == exp["m"].tolist()
    assert got["day"].tolist() == exp["dd"].tolist()
    assert got["dow"].tolist() == exp["dow"].tolist()
    assert got["isodow"].tolist() == exp["iso"].tolist()
    assert got["week"].tolist() == exp["w"].tolist()
    assert got["quarter"].tolist() == exp["q"].tolist()
    assert got["shifted_epoch_day"].tolist() == exp["sed"].tolist()
    assert got["days_to_ref"].tolist() == exp["dtr"].tolist()

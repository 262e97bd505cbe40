"""Feeder parsing semantics + nested path DSL.

Mirrors the reference's fixture corpus behavior
(/root/reference/tests/test_feeders.py, test_utils.py): CSV stays
string-typed, arity-mismatched rows dropped, JSONL bad lines dropped,
blank lines ignored; path DSL with missing-path → None.
"""

import json

import pyarrow as pa
import pytest

from chomper_ray.functions import paths
from chomper_ray.sources import feeders


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fixtures")
    # reference-style data.csv: header + blank lines + quoted names +
    # one arity-broken row
    (d / "data.csv").write_text(
        'name,age\n'
        '"Jeff Winger",32\n'
        '\n'
        'Britta Perry,28\n'
        'broken,1,2,3\n'
        '"Abed Nadir",24\n'
    )
    (d / "data.jsonl").write_text(
        '{"name": "Jeff Winger", "age": 32}\n'
        '\n'
        'this is not json\n'
        '{"name": "Britta Perry", "age": 28}\n'
    )
    (d / "data.json").write_text(json.dumps(
        [{"name": "Jeff Winger", "age": 32}, {"name": "Britta Perry", "age": 28}]))
    (d / "single.json").write_text(json.dumps({"name": "Solo", "age": 1}))
    return d


class TestCsv:
    def test_no_type_inference_all_strings(self, fixture_dir):
        ds, dropped = feeders.read_csv_strict(
            str(fixture_dir / "data.csv"), ["name", "age"], skip=1)
        df = ds.to_pandas()
        # blank line ignored; broken row dropped; header skipped
        assert df["name"].tolist() == ["Jeff Winger", "Britta Perry", "Abed Nadir"]
        assert df["age"].tolist() == ["32", "28", "24"]  # strings, not ints
        assert dropped() == 1

    def test_quoted_names_preserved(self, fixture_dir):
        ds, _ = feeders.read_csv_strict(
            str(fixture_dir / "data.csv"), ["name", "age"], skip=1)
        assert "Jeff Winger" in ds.to_pandas()["name"].tolist()


class TestJsonl:
    def test_bad_lines_dropped_and_counted(self, fixture_dir):
        ds, dropped = feeders.read_jsonl(str(fixture_dir / "data.jsonl"))
        df = ds.to_pandas()
        assert sorted(df["name"]) == ["Britta Perry", "Jeff Winger"]
        assert df["age"].dtype.kind == "i"  # JSON preserves types
        assert dropped() == 1


class TestJsonDocs:
    def test_array_of_objects(self, fixture_dir):
        df = feeders.read_json_docs(str(fixture_dir / "data.json")).to_pandas()
        assert len(df) == 2

    def test_single_object(self, fixture_dir):
        df = feeders.read_json_docs(str(fixture_dir / "single.json")).to_pandas()
        assert df["name"].tolist() == ["Solo"]


def test_from_records():
    assert feeders.from_records([{"a": 1}, {"a": 2}]).count() == 2


# ---------------------------------------------------------------- path DSL

NESTED = pa.table({
    "name": ["ann", "bob"],
    "job": [
        {"title": "dev", "company": {"name": "Initech", "website": "x.com"}},
        {"title": "ops", "company": {"name": "Acme", "website": None}},
    ],
    "friends": [
        [{"name": "cam", "age": 30}, {"name": "dee", "age": 31}],
        [{"name": "eli", "age": 40}],
    ],
})


class TestPathSplit:
    def test_reference_grammar(self):
        # reference utils.py:82-97
        assert paths.path_split("users[0].address.city") == \
            ["users", 0, "address", "city"]
        assert paths.path_split("a") == ["a"]
        assert paths.path_split("a[2]") == ["a", 2]


class TestPathGetColumn:
    def test_struct_chain(self):
        col = paths.path_get_column(NESTED, "job.company.name")
        assert col.to_pylist() == ["Initech", "Acme"]

    def test_list_index(self):
        col = paths.path_get_column(NESTED, "friends[1].name")
        assert col.to_pylist() == ["dee", None]  # row 2 has no index 1

    def test_missing_paths_are_null_not_error(self):
        # reference: missing path → None (utils.py:100-108)
        assert paths.path_get_column(NESTED, "nope").to_pylist() == [None, None]
        assert paths.path_get_column(NESTED, "job.nope").to_pylist() == [None, None]
        assert paths.path_get_column(NESTED, "name[0]").to_pylist() == [None, None]

    def test_exists(self):
        ex = paths.path_exists_column(NESTED, "job.company.website")
        assert ex.to_pylist() == [True, False]


class TestRowOracleParity:
    def test_get_matches_column(self):
        rows = NESTED.to_pylist()
        for p in ("name", "job.title", "job.company.name", "friends[0].age",
                  "friends[1].name", "missing.path", "job.company.website"):
            col = paths.path_get_column(NESTED, p).to_pylist()
            assert col == [paths.path_get_row(r, p) for r in rows], p

    def test_set_row(self):
        r = {"a": {"b": 1}}
        paths.path_set_row(r, "a.c", 2)
        paths.path_set_row(r, "new.deep", 3)
        assert r == {"a": {"b": 1, "c": 2}, "new": {"deep": 3}}


def test_flatten_struct():
    out = paths.flatten_struct(NESTED, "job")
    assert "job.title" in out.column_names
    assert out["job.title"].to_pylist() == ["dev", "ops"]


class TestBatchNestedWrites:
    """path_set_column / path_del_column vs the row-level oracle
    (reference utils.py:111-148) — batch nested writes as struct
    rebuilds, VERDICT r01 'missing' #4."""

    def _rows(self, table):
        return table.to_pylist()

    def test_set_leaf_in_struct(self):
        import pyarrow as pa

        out = paths.path_set_column(NESTED, "job.company.name", "acme")
        got = self._rows(out)
        exp = [paths.path_set_row(dict(r), "job.company.name", "acme")
               for r in self._rows(NESTED)]
        assert [r["job"]["company"]["name"] for r in got] == \
               [r["job"]["company"]["name"] for r in exp] == ["acme", "acme"]
        # sibling fields untouched
        assert [r["job"].get("title") for r in got] == \
               [r["job"].get("title") for r in self._rows(NESTED)]

    def test_set_creates_intermediate_structs(self):
        out = paths.path_set_column(NESTED, "meta.source.kind", "crawl")
        for r in self._rows(out):
            assert r["meta"]["source"]["kind"] == "crawl"

    def test_set_per_row_values_and_top_level(self):
        import pyarrow as pa

        vals = pa.array([10, 20])
        out = paths.path_set_column(NESTED, "job.level", vals)
        assert [r["job"]["level"] for r in self._rows(out)] == [10, 20]
        out2 = paths.path_set_column(NESTED, "rank", pa.array([1, 2]))
        assert out2["rank"].to_pylist() == [1, 2]

    def test_del_leaf_and_missing_noop(self):
        out = paths.path_del_column(NESTED, "job.company.name")
        for r in self._rows(out):
            assert "name" not in r["job"]["company"]
        # missing paths: no error, unchanged
        assert paths.path_del_column(NESTED, "nope.x") is NESTED or \
            self._rows(paths.path_del_column(NESTED, "nope.x")) == self._rows(NESTED)
        assert self._rows(paths.path_del_column(NESTED, "job.nope")) == \
            self._rows(NESTED)

    def test_del_top_level(self):
        out = paths.path_del_column(NESTED, "job")
        assert "job" not in out.column_names

    def test_list_index_writes_raise(self):
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            paths.path_set_column(NESTED, "friends[0].name", "x")
        with _pytest.raises(NotImplementedError):
            paths.path_del_column(NESTED, "friends[0].name")


def test_logger_transform_passthrough_and_sampling(caplog):
    import logging

    import pyarrow as pa

    from chomper_ray.stages.transforms import Logger

    t = pa.table({"a": [1, 2, 3]})
    log = Logger(name="test.logger", level=logging.INFO, every=2)
    with caplog.at_level(logging.INFO, logger="test.logger"):
        out1 = log.apply(t)   # batch 1: not logged (every=2)
        out2 = log.apply(t)   # batch 2: logged
    assert out1 is t and out2 is t  # identity — rows untouched
    assert len(caplog.records) == 1
    assert "3 rows" in caplog.records[0].getMessage()

"""Driver-contract smoke: entry() runs and queries()/oracle_sql() are
consistent (every oracle key has a query; results are convertible)."""

import __ray_entry__ as entry_mod


def test_entry_returns_rows():
    ds = entry_mod.entry()
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    assert len(df) > 0
    assert {"url", "warc_ts", "text", "lang"} <= set(df.columns)


def test_oracle_keys_subset_of_queries():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25


def test_one_query_runs_at_smallest_sf():
    out = entry_mod.queries()["mapper_rename"]("/root/testdata/sf0.001")
    df = out.to_pandas()
    assert list(sorted(df.columns)) == ["r_regionkey", "region_name"]
    assert len(df) == 5

"""SQL and HTTP sources vs the reference feeders' contracts.

Reference oracles: TableFeeder chunked paging + chunk() validation
(/root/reference/chomper/contrib/sql/feeders.py:17-41, tests/test_sql.py:
25-45), QueryFeeder (feeders.py:44-57), HttpReader lines/whole + non-2xx
drop (readers.py:72-99, tests/test_readers.py:60-79 — mocked there; a
real local HTTP server here).
"""

import functools
import http.server
import sqlite3
import threading

import pandas as pd
import pytest

from chomper_ray.sources.http import read_http
from chomper_ray.sources.sql import (read_sql_query, read_sql_table,
                                     sqlite_factory)


@pytest.fixture(scope="module")
def db_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("db") / "t.sqlite"
    conn = sqlite3.connect(p)
    conn.execute("CREATE TABLE users(id INTEGER, name TEXT, score REAL)")
    conn.executemany("INSERT INTO users VALUES (?, ?, ?)",
                     [(i, f"user{i}", i * 1.5) for i in range(537)])
    conn.commit()
    conn.close()
    return str(p)


def test_sql_table_roundtrip_chunked(db_path):
    factory = sqlite_factory(db_path)
    ds = read_sql_table("users", factory, chunk=100, key_col="id")
    got = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(got) == 537
    assert list(got.columns) == ["id", "name", "score"]
    assert got["id"].tolist() == list(range(537))
    assert got.loc[42, "name"] == "user42"


def test_sql_table_offset_paging_matches_key_sharding(db_path):
    factory = sqlite_factory(db_path)
    a = read_sql_table("users", factory, chunk=50, key_col="id").to_pandas()
    b = read_sql_table("users", factory, chunk=50).to_pandas()  # OFFSET walk
    pd.testing.assert_frame_equal(a.sort_values("id").reset_index(drop=True),
                                  b.sort_values("id").reset_index(drop=True))


def test_sql_table_chunk_zero_single_query(db_path):
    factory = sqlite_factory(db_path)
    ds = read_sql_table("users", factory, chunk=0, columns=["id", "name"])
    got = ds.to_pandas()
    assert len(got) == 537 and list(got.columns) == ["id", "name"]


def test_sql_chunk_validation_matches_reference(db_path):
    # feeders.py:29-33: non-int / negative chunk → TypeError
    factory = sqlite_factory(db_path)
    for bad in ("10", 2.5, -1, True):
        with pytest.raises(TypeError):
            read_sql_table("users", factory, chunk=bad)


def test_sql_query_feeder(db_path):
    factory = sqlite_factory(db_path)
    ds = read_sql_query(
        "SELECT name, score FROM users WHERE id < 5 ORDER BY id", factory)
    got = ds.to_pandas()
    assert got["name"].tolist() == [f"user{i}" for i in range(5)]
    with pytest.raises(TypeError):
        read_sql_query("", factory)
    with pytest.raises(TypeError):
        read_sql_query(None, factory)


# --- HTTP ------------------------------------------------------------------

@pytest.fixture(scope="module")
def http_server(tmp_path_factory):
    root = tmp_path_factory.mktemp("www")
    (root / "data.jsonl").write_text(
        '{ "name": "Jeff Winger", "age": 32 }\n'
        "\n"
        '{ "name": "Annie Edison", "age": 24 }\n'
        '  \n'
        '{ "name": "Britta Perry", "age": 27 }\n')
    (root / "doc.txt").write_text("whole document\nwith two lines\n")

    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(root))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_lines_mode_skips_blank(http_server):
    ds, dropped = read_http([f"{http_server}/data.jsonl"], lines=True)
    got = ds.to_pandas()
    # reference: stripped, non-blank lines only (readers.py:91-97)
    assert got["text"].tolist() == [
        '{ "name": "Jeff Winger", "age": 32 }',
        '{ "name": "Annie Edison", "age": 24 }',
        '{ "name": "Britta Perry", "age": 27 }',
    ]
    assert dropped() == 0


def test_http_whole_mode(http_server):
    ds, dropped = read_http([f"{http_server}/doc.txt"], lines=False)
    got = ds.to_pandas()
    assert len(got) == 1
    assert got["text"].iloc[0] == "whole document\nwith two lines\n"
    assert dropped() == 0


def test_http_non_2xx_dropped_and_counted(http_server):
    ds, dropped = read_http(
        [f"{http_server}/doc.txt", f"{http_server}/missing.txt"], lines=False)
    got = ds.to_pandas()
    assert len(got) == 1  # 404 URL dropped, pipeline continues
    assert got["url"].iloc[0].endswith("doc.txt")
    assert dropped() == 1


def test_http_unreachable_host_dropped():
    # connection refused (no server on that port) → drop + count
    ds, dropped = read_http(["http://127.0.0.1:9/none"], timeout_s=2)
    assert len(ds.to_pandas()) == 0
    assert dropped() == 1


def test_sql_table_where_pushdown(db_path):
    factory = sqlite_factory(db_path)
    ds = read_sql_table("users", factory, chunk=100, key_col="id",
                        where="id < 100 AND score > 10")
    got = ds.to_pandas()
    assert (got["id"] < 100).all() and (got["score"] > 10).all()
    exp = [i for i in range(100) if i * 1.5 > 10]
    assert sorted(got["id"]) == exp

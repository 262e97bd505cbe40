"""ExplodedLakeTable (state/derivedtable.py): 1→N lake→lake derivation
(doc → chunk table). The invariant pinned after every upstream commit:
the downstream live state equals the exploded transform of the upstream
live state — growth/shrink of a doc's chunk count must insert/delete
exactly the affected derived keys, an upstream delete removes ALL its
chunks, and the old side is reconstructed by re-running the
deterministic transform (no stored chunk-count state anywhere)."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chomper_ray.state.derivedtable import ExplodedLakeTable
from chomper_ray.state.lake import LakeTable, committed_epochs, load_manifest

CHUNK = 5

OUT_SCHEMA = pa.schema([
    pa.field("chunk_id", pa.string()),
    pa.field("url", pa.string()),
    pa.field("chunk_text", pa.string()),
])


def _make_chunker():
    def chunker(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        keep = df[df["fetch_status"].fillna(0).astype("int64") == 200]
        for url, text in zip(keep["url"], keep["text"].fillna("")):
            for i in range(0, max(len(text), 1), CHUNK):
                rows.append((f"{url}#{i // CHUNK}", url,
                             text[i:i + CHUNK]))
        return pd.DataFrame(rows, columns=["chunk_id", "url",
                                           "chunk_text"])
    return chunker


chunker = _make_chunker()


def mk(op, seq, url, ts, status, text):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"),
            "fetch_status": status, "text": text}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def oracle(up) -> pd.DataFrame:
    live = up.read_pandas()
    if not len(live):
        return pd.DataFrame(columns=["chunk_id", "url", "chunk_text"])
    return chunker(live).sort_values("chunk_id").reset_index(drop=True)


def assert_synced(dt, up):
    got = dt.table.read_pandas()
    got = got[["chunk_id", "url", "chunk_text"]] \
        .sort_values("chunk_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, oracle(up), check_dtype=False)


def make(tmp_path, **lake_kw):
    up = LakeTable(tmp_path / "up", key="url", num_partitions=4,
                   collect_changes=False, **lake_kw)
    dt = ExplodedLakeTable(up, tmp_path / "chunks", chunker, OUT_SCHEMA,
                           derived_key="chunk_id",
                           lake_kwargs={"num_partitions": 3})
    return up, dt


def test_explode_grow_shrink_delete(tmp_path, ray_session):
    up, dt = make(tmp_path)
    # a: 12 chars -> 3 chunks; b: 4 chars -> 1 chunk
    commit(up, [mk("insert", 0, "a", 10, 200, "abcdefghijkl"),
                mk("insert", 1, "b", 10, 200, "wxyz")], 0)
    dt.refresh()
    assert_synced(dt, up)
    assert len(dt.table.read_pandas()) == 4
    # a shrinks to 1 chunk -> chunks a#1, a#2 must be DELETED
    commit(up, [mk("update", 10, "a", 20, 200, "hi")], 1)
    dt.refresh()
    assert_synced(dt, up)
    got = dt.table.read_pandas()
    assert sorted(got["chunk_id"]) == ["a#0", "b#0"]
    # a grows to 2 chunks
    commit(up, [mk("update", 20, "a", 30, 200, "0123456789")], 2)
    dt.refresh()
    assert_synced(dt, up)
    # upstream delete of a removes BOTH its chunks
    commit(up, [mk("delete", 30, "a", 40, None, None)], 3)
    dt.refresh()
    assert_synced(dt, up)
    assert sorted(dt.table.read_pandas()["chunk_id"]) == ["b#0"]


def test_explode_filter_transition_and_minimal_lineage(tmp_path,
                                                       ray_session):
    up, dt = make(tmp_path)
    rows = [mk("insert", i, f"u{i}", 10, 200, "x" * 12)
            for i in range(10)]
    rows.append(mk("insert", 99, "bad", 10, 404, "y" * 12))
    commit(up, rows, 0)
    dt.refresh()
    assert_synced(dt, up)
    assert len(dt.table.read_pandas()) == 30  # 10 urls x 3 chunks
    # status flip OUT deletes its chunks; flip IN creates them; an
    # untouched co-located url contributes NOTHING downstream
    commit(up, [mk("update", 100, "u3", 20, 500, "x" * 12),
                mk("update", 101, "bad", 20, 200, "y" * 12)], 1)
    dt.refresh()
    assert_synced(dt, up)
    man = load_manifest(dt.table.root)
    ev_in = sum(int(ln["events_in"]) for ln in man.get("lineage", []))
    assert ev_in == 6, man["lineage"]  # 3 deletes (u3) + 3 inserts (bad)


def test_explode_mor_and_resume(tmp_path, ray_session):
    up = LakeTable(tmp_path / "up", key="url", num_partitions=4,
                   collect_changes=False, merge_on_read=True)
    dt = ExplodedLakeTable(up, tmp_path / "chunks", chunker, OUT_SCHEMA,
                           derived_key="chunk_id",
                           lake_kwargs={"num_partitions": 3})
    commit(up, [mk("insert", 0, "a", 10, 200, "abcdefgh")], 0)
    dt.refresh()
    assert_synced(dt, up)
    commit(up, [mk("update", 10, "a", 20, 200, "abc")], 1)
    # fresh object resumes off cursor + lake guard
    dt2 = ExplodedLakeTable(
        LakeTable(tmp_path / "up", key="url", num_partitions=4,
                  collect_changes=False, merge_on_read=True),
        tmp_path / "chunks", chunker, OUT_SCHEMA,
        derived_key="chunk_id", lake_kwargs={"num_partitions": 3})
    dt2.refresh()
    assert_synced(dt2, up)
    assert sorted(dt2.table.read_pandas()["chunk_id"]) == ["a#0"]
    up.compact_deltas()
    n = len(committed_epochs(dt2.table.root))
    dt2.refresh()  # compaction folds a zero delta
    assert len(committed_epochs(dt2.table.root)) == n + 1
    assert_synced(dt2, up)


def test_explode_full_resync_after_gc(tmp_path, ray_session):
    up, dt = make(tmp_path)
    commit(up, [mk("insert", 0, "a", 10, 200, "abcdefghij"),
                mk("insert", 1, "b", 10, 200, "wx")], 0)
    dt.refresh()
    commit(up, [mk("update", 10, "a", 20, 200, "hi"),
                mk("delete", 11, "b", 20, None, None)], 1)
    up.compact(keep_epochs=1)
    dt.refresh()  # full resync: stale chunks a#1 and b#0 must go
    assert_synced(dt, up)
    assert sorted(dt.table.read_pandas()["chunk_id"]) == ["a#0"]


def test_explode_contract_violations(tmp_path, ray_session):
    up = LakeTable(tmp_path / "up", key="url", num_partitions=2,
                   collect_changes=False)
    commit(up, [mk("insert", 0, "a", 10, 200, "abcdefgh")], 0)

    def dup_chunks(df):
        out = chunker(df)
        return pd.concat([out, out], ignore_index=True)

    dt = ExplodedLakeTable(up, tmp_path / "d1", dup_chunks, OUT_SCHEMA,
                           derived_key="chunk_id",
                           lake_kwargs={"num_partitions": 2})
    with pytest.raises(Exception) as ei:
        dt.refresh()
    assert "duplicate derived keys" in str(ei.value)

    with pytest.raises(ValueError):
        ExplodedLakeTable(up, tmp_path / "d2", chunker, OUT_SCHEMA,
                          derived_key="url")


def test_explode_schema_evolution(tmp_path, ray_session):
    """An upstream commit adding a column null-fills old files in the
    signed read; old-side transform re-runs see the same nulls the
    historical rows actually have."""
    up, dt = make(tmp_path)
    commit(up, [mk("insert", 0, "a", 10, 200, "abcdefgh")], 0)
    dt.refresh()
    rows = [dict(mk("update", 1, "a", 20, 200, "abc"), extra=1.5),
            dict(mk("insert", 2, "b", 20, 200, "wxyz"), extra=2.5)]
    commit(up, rows, 1)
    dt.refresh()
    assert_synced(dt, up)
    assert sorted(dt.table.read_pandas()["chunk_id"]) == \
        ["a#0", "b#0"]


def test_text_index_on_chunk_lake(tmp_path, ray_session):
    """The RAG stack end to end: bronze pages → chunk lake
    (ExplodedLakeTable) → LakeTextIndex ON THE CHUNKS — chunk-level
    search stays fresh as upstream pages change, maintained per commit
    at both hops, and always equals a from-scratch rebuild."""
    from chomper_ray.state.index import LakeTextIndex

    up, dt = make(tmp_path)
    idx = LakeTextIndex(dt.table, tmp_path / "cidx", col="chunk_text",
                        num_partitions=4)

    def sync():
        dt.refresh()
        idx.refresh()
        fresh = LakeTextIndex(dt.table, tmp_path / f"cidx{len(committed_epochs(dt.table.root))}",
                              col="chunk_text", num_partitions=4)
        fresh.refresh()
        for tok in ["alpha", "beta"]:
            a = idx.postings(tok).reset_index(drop=True)
            b = fresh.postings(tok).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b)

    # chunk boundary splits tokens deterministically (CHUNK=5); use
    # short tokens that survive chunking intact
    commit(up, [mk("insert", 0, "a", 10, 200, "alpha beta"),
                mk("insert", 1, "b", 10, 200, "beta")], 0)
    sync()
    assert len(idx.postings("beta")) >= 1
    # update a: alpha disappears from its chunks
    commit(up, [mk("update", 10, "a", 20, 200, "gamma")], 1)
    sync()
    assert len(idx.postings("alpha")) == 0
    # delete b: its chunk's postings go
    commit(up, [mk("delete", 20, "b", 30, None, None)], 2)
    sync()
    assert len(idx.postings("beta")) == 0

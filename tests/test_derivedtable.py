"""DerivedLakeTable (state/derivedtable.py): lake→lake incremental CDC
propagation. The invariant pinned after EVERY upstream commit: the
downstream live state equals the transform applied to the upstream live
state — across inserts, updates, deletes, filter transitions (a row
entering/leaving the predicate), no-op rewrites (must produce minimal
downstream lineage), truncate, MOR upstream chains, compaction-GC full
resync, crash resume, and cascading (a matview on the downstream)."""

import json

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chomper_ray.state.derivedtable import (DerivedLakeTable,
                                            TransformContractError)
from chomper_ray.state.lake import LakeTable, committed_epochs, load_manifest


def mk(op, seq, url, ts, status, text):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"),
            "fetch_status": status, "text": text}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


OUT_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("n_chars", pa.int64()),
    pa.field("status", pa.int64()),
])


def _make_clean_docs():
    # a closure (not a module-level def) so cloudpickle ships it by
    # value into Ray tasks — test modules aren't importable on workers
    def clean_docs(df: pd.DataFrame) -> pd.DataFrame:
        """Keep 200s, compute n_chars — empty-input-safe."""
        keep = df[df["fetch_status"].fillna(0).astype("int64") == 200]
        return pd.DataFrame({
            "url": keep["url"],
            "n_chars": keep["text"].fillna("").str.len().astype("int64"),
            "status": keep["fetch_status"].astype("int64"),
        })
    return clean_docs


clean_docs = _make_clean_docs()


def oracle(lake) -> pd.DataFrame:
    up = lake.read_pandas()
    if not len(up):
        return pd.DataFrame(columns=["url", "n_chars", "status"])
    return clean_docs(up).sort_values("url").reset_index(drop=True)


def assert_synced(derived, upstream):
    got = derived.table.read_pandas()
    got = got[["url", "n_chars", "status"]].sort_values("url") \
        .reset_index(drop=True)
    exp = oracle(upstream)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def make(tmp_path, **lake_kw):
    upstream = LakeTable(tmp_path / "up", key="url", num_partitions=4,
                         collect_changes=False, **lake_kw)
    derived = DerivedLakeTable(
        upstream, tmp_path / "down", clean_docs, OUT_SCHEMA,
        lake_kwargs={"num_partitions": 3})
    return upstream, derived


def test_insert_update_delete_and_filter_transitions(tmp_path, ray_session):
    up, dv = make(tmp_path)
    # e0: two clean, one 404 (filtered out)
    commit(up, [mk("insert", 0, "a", 10, 200, "hello"),
                mk("insert", 1, "b", 10, 200, "world!!"),
                mk("insert", 2, "c", 10, 404, "nope")], 0)
    dv.refresh()
    assert_synced(dv, up)
    assert len(dv.table.read_pandas()) == 2
    # e1: update a's text (stays in), c transitions INTO the filter
    commit(up, [mk("update", 10, "a", 20, 200, "hello again"),
                mk("update", 11, "c", 20, 200, "now ok")], 1)
    dv.refresh()
    assert_synced(dv, up)
    # e2: b transitions OUT of the filter (status flips), a deleted
    commit(up, [mk("update", 20, "b", 30, 500, "err"),
                mk("delete", 21, "a", 30, None, None)], 2)
    dv.refresh()
    assert_synced(dv, up)
    down = dv.table.read_pandas()
    assert set(down["url"]) == {"c"}


def test_noop_rewrite_produces_no_downstream_rows(tmp_path, ray_session):
    """A commit that rewrites a partition without changing a key's
    (version, content) must emit ZERO downstream events for co-located
    untouched keys — downstream lineage ∝ actual change."""
    up, dv = make(tmp_path)
    rows = [mk("insert", i, f"u{i}", 10, 200, f"text {i}")
            for i in range(20)]
    commit(up, rows, 0)
    dv.refresh()
    # touch exactly one key (same partition set rewritten under COW)
    commit(up, [mk("update", 100, "u3", 20, 200, "changed")], 1)
    dv.refresh()
    assert_synced(dv, up)
    last = load_manifest(dv.table.root)
    ev_in = sum(int(ln["events_in"]) for ln in last.get("lineage", []))
    # only u3's upsert flowed downstream, never the other 19
    assert ev_in == 1, last["lineage"]


def test_transform_dropped_key_deletes_downstream(tmp_path, ray_session):
    up, dv = make(tmp_path)
    commit(up, [mk("insert", 0, "a", 10, 200, "x")], 0)
    dv.refresh()
    assert len(dv.table.read_pandas()) == 1
    # version bump flips status -> transform drops it -> downstream delete
    commit(up, [mk("update", 1, "a", 20, 301, "x")], 1)
    dv.refresh()
    assert len(dv.table.read_pandas()) == 0
    # and back in
    commit(up, [mk("update", 2, "a", 30, 200, "back")], 2)
    dv.refresh()
    assert_synced(dv, up)


def test_refresh_idempotent_and_resumable(tmp_path, ray_session):
    up, dv = make(tmp_path)
    commit(up, [mk("insert", 0, "a", 10, 200, "x")], 0)
    commit(up, [mk("insert", 1, "b", 20, 200, "y")], 1)
    dv.refresh()
    n_manifests = len(committed_epochs(dv.table.root))
    dv.refresh()  # no-op
    assert len(committed_epochs(dv.table.root)) == n_manifests
    # a FRESH object over the same roots resumes from the cursor
    dv2 = DerivedLakeTable(
        LakeTable(tmp_path / "up", key="url", num_partitions=4,
                  collect_changes=False),
        tmp_path / "down", clean_docs, OUT_SCHEMA,
        lake_kwargs={"num_partitions": 3})
    commit(up, [mk("delete", 2, "a", 30, None, None)], 2)
    dv2.refresh()
    assert_synced(dv2, up)
    assert len(committed_epochs(dv2.table.root)) == n_manifests + 1


def test_crash_between_commit_and_cursor(tmp_path, ray_session):
    """Downstream commit landed but the cursor write was lost — re-entry
    must skip the committed epoch (exactly-once), not double-apply."""
    up, dv = make(tmp_path)
    commit(up, [mk("insert", 0, "a", 10, 200, "x")], 0)
    dv.refresh()
    cursor = dv.root / "_derived_cursor.json"
    cursor.unlink()  # simulate crash before cursor write
    n = len(committed_epochs(dv.table.root))
    dv.refresh()  # lake's own log cursor backstops the lost file
    assert len(committed_epochs(dv.table.root)) == n
    assert_synced(dv, up)
    commit(up, [mk("insert", 1, "b", 20, 200, "y")], 1)
    dv.refresh()
    assert json.loads(cursor.read_text())["upstream_cid"] == 1
    assert_synced(dv, up)


def test_upstream_truncate_propagates(tmp_path, ray_session):
    up, dv = make(tmp_path)
    commit(up, [mk("insert", 0, "a", 10, 200, "x"),
                mk("insert", 1, "b", 10, 200, "y")], 0)
    dv.refresh()
    up.truncate()
    dv.refresh()
    assert len(dv.table.read_pandas()) == 0
    # re-feed after truncate: fresh versions may be OLDER than the old
    # rows' — truncate semantics (no tombstones) must let them land
    commit(up, [mk("insert", 0, "a", 5, 200, "pre-dated")], 2)
    dv.refresh()
    assert_synced(dv, up)
    assert len(dv.table.read_pandas()) == 1


def test_mor_upstream_chain(tmp_path, ray_session):
    up = LakeTable(tmp_path / "up", key="url", num_partitions=4,
                   collect_changes=False, merge_on_read=True)
    dv = DerivedLakeTable(up, tmp_path / "down", clean_docs, OUT_SCHEMA,
                          lake_kwargs={"num_partitions": 3})
    commit(up, [mk("insert", 0, "a", 10, 200, "x"),
                mk("insert", 1, "b", 10, 404, "y")], 0)
    dv.refresh()
    assert_synced(dv, up)
    commit(up, [mk("update", 10, "b", 20, 200, "fixed"),
                mk("delete", 11, "a", 20, None, None)], 1)
    dv.refresh()
    assert_synced(dv, up)
    # compaction folds a zero delta downstream
    up.compact_deltas()
    n = len(committed_epochs(dv.table.root))
    dv.refresh()
    assert_synced(dv, up)
    empty = load_manifest(dv.table.root)
    assert len(committed_epochs(dv.table.root)) == n + 1
    assert not empty.get("lineage")  # compaction propagated as empty


def test_full_resync_after_upstream_gc(tmp_path, ray_session):
    """compact(keep_epochs=1) GCs the diff inputs -> the derived table
    routes to the full-resync fallback and still converges, including
    deleting downstream-only keys."""
    up, dv = make(tmp_path)
    commit(up, [mk("insert", 0, "a", 10, 200, "x"),
                mk("insert", 1, "b", 10, 200, "y")], 0)
    dv.refresh()
    commit(up, [mk("delete", 10, "a", 20, None, None),
                mk("insert", 11, "c", 20, 200, "z")], 1)
    commit(up, [mk("update", 20, "b", 30, 200, "longer text")], 2)
    up.compact(keep_epochs=1)  # destroys epoch-1/2 diff inputs
    dv.refresh()
    assert_synced(dv, up)
    # after the resync, incremental path resumes
    commit(up, [mk("insert", 30, "d", 40, 200, "w")], 3)
    dv.refresh()
    assert_synced(dv, up)


def test_schema_evolution_upstream(tmp_path, ray_session):
    """An upstream commit adding a column null-fills old files in the
    signed read; transform keyed on the old columns stays correct."""
    up, dv = make(tmp_path)
    commit(up, [mk("insert", 0, "a", 10, 200, "x")], 0)
    dv.refresh()
    rows = [dict(mk("insert", 1, "b", 20, 200, "y"), extra_score=0.5)]
    commit(up, rows, 1)
    dv.refresh()
    assert_synced(dv, up)


def test_transform_contract_violations_raise(tmp_path, ray_session):
    up = LakeTable(tmp_path / "up", key="url", num_partitions=2,
                   collect_changes=False)
    commit(up, [mk("insert", 0, "a", 10, 200, "x")], 0)

    def dup(df):
        out = clean_docs(df)
        return pd.concat([out, out], ignore_index=True)

    dv = DerivedLakeTable(up, tmp_path / "d1", dup, OUT_SCHEMA,
                          lake_kwargs={"num_partitions": 2})
    with pytest.raises(Exception) as ei:
        dv.refresh()
    assert "duplicate keys" in str(ei.value)

    def invent(df):
        out = clean_docs(df)
        out["url"] = out["url"] + "_made_up"
        return out

    dv2 = DerivedLakeTable(up, tmp_path / "d2", invent, OUT_SCHEMA,
                           lake_kwargs={"num_partitions": 2})
    with pytest.raises(Exception) as ei:
        dv2.refresh()
    assert "invented keys" in str(ei.value)


def test_cascade_matview_on_derived(tmp_path, ray_session):
    """Gold on silver: a MaterializedAgg maintained off the DERIVED
    table tracks the transform of the upstream state commit-for-commit."""
    from chomper_ray.state.matview import MaterializedAgg

    up, dv = make(tmp_path)

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"status": df["status"].astype("int64"),
                             "n_chars": df["n_chars"].astype("int64")})

    view = MaterializedAgg(dv.table, tmp_path / "gold", contrib,
                           group_cols=["status"], value_cols=["n_chars"],
                           read_columns=["status", "n_chars"])
    seqs = iter(range(100))
    for epoch, rows in enumerate([
        [mk("insert", next(seqs), "a", 10, 200, "xxxx"),
         mk("insert", next(seqs), "b", 10, 404, "y")],
        [mk("update", next(seqs), "b", 20, 200, "zzz")],
        [mk("delete", next(seqs), "a", 30, None, None)],
    ]):
        commit(up, rows, epoch)
        dv.refresh()
        got = view.refresh()
        exp = oracle(up)
        if len(exp):
            want = exp.groupby("status", as_index=False).agg(
                sum_n_chars=("n_chars", "sum"), n_live=("status", "size"))
            got = got.sort_values("status").reset_index(drop=True)
            want = want.sort_values("status").reset_index(drop=True)
            pd.testing.assert_frame_equal(
                got[["status", "sum_n_chars", "n_live"]],
                want[["status", "sum_n_chars", "n_live"]],
                check_dtype=False)
        else:
            assert not len(got)


def test_repartition_upstream_is_content_neutral(tmp_path, ray_session):
    up, dv = make(tmp_path)
    commit(up, [mk("insert", i, f"u{i}", 10, 200, "t" * i)
                for i in range(12)], 0)
    dv.refresh()
    up.repartition_table(7)
    n = len(committed_epochs(dv.table.root))
    dv.refresh()
    assert len(committed_epochs(dv.table.root)) == n + 1
    assert not load_manifest(dv.table.root).get("lineage")
    assert_synced(dv, up)
    commit(up, [mk("update", 100, "u5", 20, 200, "after repart")], 2)
    dv.refresh()
    assert_synced(dv, up)


def test_derived_over_embedding_upstream(tmp_path, ray_session):
    """Embedding (list<float>) columns flow through the signed diff:
    change detection compares array CONTENT (a plain != would be
    ambiguous), and an embedding-only update propagates exactly."""
    import numpy as np

    up = LakeTable(tmp_path / "up", key="url", num_partitions=2,
                   collect_changes=False)

    def ev(op, seq, url, ts, status, emb):
        return {"op": op, "seq": seq, "url": url,
                "warc_ts": pd.Timestamp(ts, unit="s"),
                "fetch_status": status, "emb": emb}

    commit(up, [ev("insert", 0, "a", 10, 200, [1.0, 0.0]),
                ev("insert", 1, "b", 10, 200, [0.0, 1.0]),
                ev("insert", 2, "c", 10, 404, [0.5, 0.5])], 0)

    def keep_vecs():
        def f(df: pd.DataFrame) -> pd.DataFrame:
            k = df[df["fetch_status"].fillna(0).astype("int64") == 200]
            return pd.DataFrame({"url": k["url"], "emb": k["emb"]})
        return f

    out_schema = pa.schema([
        ("url", pa.string()), ("emb", pa.list_(pa.float64()))])
    dt = DerivedLakeTable(up, tmp_path / "vecs", keep_vecs(),
                          out_schema, lake_kwargs={"num_partitions": 2})
    dt.refresh()
    got = dt.table.read_pandas().set_index("url")["emb"]
    assert sorted(got.index) == ["a", "b"]
    assert np.allclose(np.asarray(got["a"]), [1.0, 0.0])
    # embedding-only update (same status) must be DETECTED and ship
    commit(up, [ev("update", 10, "a", 20, 200, [0.9, 0.1])], 1)
    dt.refresh()
    man = load_manifest(dt.table.root)
    assert sum(int(ln["events_in"]) for ln in man["lineage"]) == 1
    got = dt.table.read_pandas().set_index("url")["emb"]
    assert np.allclose(np.asarray(got["a"]), [0.9, 0.1])
    # identical-content rewrite cancels (array compare by content)
    commit(up, [ev("update", 11, "b", 20, 200, [0.0, 1.0])], 2)
    dt.refresh()
    assert_synced_rows = dt.table.read_pandas()
    assert len(assert_synced_rows) == 2

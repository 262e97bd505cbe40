"""Merge-on-read commits (state/lake.py _MorDeltaWriter +
_resolve_mor_pid): an ingest commit writes the epoch's per-partition
LWW change-set as a permanent delta file (no base read/rewrite —
write amplification ~1), and the merge is deferred to
read()/lookup()/compact_deltas(), which replay ``apply_changes``
base → deltas in commit order.

The oracle is the copy-on-write path itself: the same change stream
committed through a COW LakeTable must produce the identical resolved
state (frames AND manifest content hashes bit-for-bit), before and
after compact_deltas(). Guards: anything that rewrites base snapshot
files in place (COW commits, purge_tombstones, repartition, backfill,
delete_where) must refuse at a delta-bearing head rather than drop the
pending changes. Derived structures (matview/index/layouts) do NOT
refuse: they fold each merge-on-read commit's exact effect
(materialize_mor_commit_diff) and treat compaction as a zero delta —
tested below at the delta-bearing head, across compaction, and across
the schema-evolution epoch.
"""

import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from chomper_ray.pipelines.cdc import run_cdc
from chomper_ray.sources import events as ev
from chomper_ray.state.lake import (LakeTable, load_manifest,
                                    manifest_has_deltas)

MOR_KW = {"merge_on_read": True, "collect_changes": False}


@pytest.fixture(scope="module")
def change_log(tmp_path_factory):
    d = tmp_path_factory.mktemp("morlog")
    ev.generate_change_stream(
        d, n_events=2400, n_urls=320, n_epochs=4, seed=23,
        delete_frac=0.08, ooo_frac=0.15, evolution_epoch=2,
    )
    return d


@pytest.fixture(scope="module")
def runs(change_log, tmp_path_factory):
    """One COW run and one MOR run (deltas left PENDING) over the same
    log; mutating tests copytree the MOR root instead of touching it."""
    base = tmp_path_factory.mktemp("morlakes")
    cow, mor = base / "cow", base / "mor"
    run_cdc(change_log, cow, num_partitions=8,
            lake_kwargs={"collect_changes": False})
    run_cdc(change_log, mor, num_partitions=8, lake_kwargs=MOR_KW)
    return cow, mor


def cow_lake(root):
    return LakeTable(root, num_partitions=8, collect_changes=False)


def mor_lake(root):
    return LakeTable(root, num_partitions=8, **MOR_KW)


def full_state(lake) -> pd.DataFrame:
    return (lake.read_pandas(include_deleted=True, include_internal=True)
            .sort_values("url", kind="stable").reset_index(drop=True))


def fresh_mor_copy(runs, tmp_path) -> LakeTable:
    shutil.copytree(runs[1], tmp_path / "mor")
    return mor_lake(tmp_path / "mor")


# -- commit shape -----------------------------------------------------------

def test_mor_commit_writes_deltas_only(runs):
    _, mor = runs
    m = load_manifest(mor)
    assert m["merge_on_read"] and manifest_has_deltas(m)
    # no partition ever got a base snapshot; every touched one has deltas
    for v in m["partitions"].values():
        assert v["file"] is None
        assert v["deltas"]
    assert not list((mor / "data").rglob("snap-*.parquet"))
    deltas = list((mor / "data").rglob("delta-*.parquet"))
    assert len(deltas) == sum(len(v["deltas"])
                              for v in m["partitions"].values())
    # write amplification ~1: delta rows == staged change rows (≤ events;
    # strictly fewer whenever an epoch carries several versions of a key)
    n_delta_rows = sum(pq.read_metadata(f).num_rows for f in deltas)
    assert 0 < n_delta_rows <= 2400
    # one delta_commits entry per ingest commit, carrying schema + ts
    assert sorted(m["delta_commits"]) == ["0", "1", "2", "3"]
    for dc in m["delta_commits"].values():
        assert dc["schema"] and dc["commit_ts_us"] > 0


def test_mor_total_rows_reported_unknown(change_log, tmp_path):
    lake = LakeTable(tmp_path / "l", num_partitions=4, **MOR_KW)
    e = ev.list_epochs(change_log)[0]
    ds = rd.read_parquet([str(f) for f in ev.epoch_files(change_log, e)]) \
        .drop_columns(["html"])
    res = lake.commit_epoch(ds, e)
    assert not res.skipped
    assert res.total_rows == -1  # unknown until resolution, never stale


# -- resolved reads ≡ copy-on-write ----------------------------------------

def test_mor_resolved_read_equals_cow(runs):
    cow, mor = runs
    want, got = full_state(cow_lake(cow)), full_state(mor_lake(mor))
    pd.testing.assert_frame_equal(got, want)
    # live read (tombstones + internals dropped) agrees too
    pd.testing.assert_frame_equal(
        mor_lake(mor).read_pandas().sort_values("url")
        .reset_index(drop=True),
        cow_lake(cow).read_pandas().sort_values("url")
        .reset_index(drop=True))


def test_mor_dataset_read_streams_resolved_blocks(runs):
    cow, mor = runs
    got = (mor_lake(mor).read().to_pandas()
           .sort_values("url", kind="stable").reset_index(drop=True))
    want = (cow_lake(cow).read().to_pandas()
            .sort_values("url", kind="stable").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_mor_snapshot_hash_equals_cow_while_pending(runs):
    cow, mor = runs
    assert mor_lake(mor).snapshot_hash() == cow_lake(cow).snapshot_hash()


def test_mor_column_pruned_read(runs):
    cow, mor = runs
    cols = ["url", "lang"]
    got = (mor_lake(mor).read(columns=cols).to_pandas()
           .sort_values("url").reset_index(drop=True))
    want = (cow_lake(cow).read(columns=cols).to_pandas()
            .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert list(got.columns) == cols


def test_mor_lookup_resolves_deltas(runs):
    cow, mor = runs
    cl, ml = cow_lake(cow), mor_lake(mor)
    state = full_state(cl)
    live_url = state.loc[~state["_deleted"], "url"].iloc[0]
    dead = state.loc[state["_deleted"], "url"]
    got = ml.lookup(live_url).sort_index(axis=1)
    want = cl.lookup(live_url).sort_index(axis=1)
    pd.testing.assert_frame_equal(got, want)
    if len(dead):  # tombstoned key: both paths return empty
        assert ml.lookup(dead.iloc[0]).empty
        assert cl.lookup(dead.iloc[0]).empty
    assert ml.lookup("https://never.example/x").empty


def test_mor_time_travel_resolves_as_of_manifest(runs):
    cow, mor = runs
    got = (mor_lake(mor).read(as_of_epoch=1).to_pandas()
           .sort_values("url").reset_index(drop=True))
    want = (cow_lake(cow).read(as_of_epoch=1).to_pandas()
            .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


# -- compaction -------------------------------------------------------------

def test_compact_deltas_equals_cow_bit_for_bit(runs, tmp_path):
    cow, _ = runs
    ml = fresh_mor_copy(runs, tmp_path)
    res = ml.compact_deltas()
    assert not res.skipped and res.partitions_touched > 0
    m = load_manifest(ml.root)
    assert not manifest_has_deltas(m)
    cm = load_manifest(cow)
    # per-partition content hashes equal what the COW chain recorded
    got = {p: v["hash"] for p, v in m["partitions"].items()}
    want = {p: v["hash"] for p, v in cm["partitions"].items()}
    assert got == want
    assert ml.snapshot_hash() == cow_lake(cow).snapshot_hash()
    pd.testing.assert_frame_equal(full_state(ml),
                                  full_state(cow_lake(cow)))
    assert res.total_rows == sum(int(v["live_rows"])
                                 for v in m["partitions"].values())
    # idempotent: a second call finds nothing pending
    assert ml.compact_deltas().skipped
    # the binlog cursor passed through maintenance untouched
    assert ml.last_applied_log_epoch() == 3


def test_mixed_chain_mor_compact_mor(change_log, runs, tmp_path):
    """Ingest 2 epochs MOR → compact → ingest the rest MOR → resolve:
    compaction mid-chain must not disturb the binlog cursor or state."""
    cow, _ = runs
    root = tmp_path / "mixed"
    run_cdc(change_log, root, num_partitions=8, lake_kwargs=MOR_KW,
            max_epochs=2)
    lake = mor_lake(root)
    assert not lake.compact_deltas().skipped
    assert lake.last_applied_log_epoch() == 1
    run_cdc(change_log, root, num_partitions=8, lake_kwargs=MOR_KW)
    assert lake.last_applied_log_epoch() == 3
    pd.testing.assert_frame_equal(full_state(lake),
                                  full_state(cow_lake(cow)))
    assert not lake.compact_deltas().skipped
    assert lake.snapshot_hash() == cow_lake(cow).snapshot_hash()


def test_mor_drain_equals_sequential(change_log, runs, tmp_path):
    cow, _ = runs
    root = tmp_path / "drain"
    res = run_cdc(change_log, root, num_partitions=8, lake_kwargs=MOR_KW,
                  drain=True)
    assert res.epochs_run == [0, 1, 2, 3]
    lake = mor_lake(root)
    assert lake.snapshot_hash() == cow_lake(cow).snapshot_hash()
    pd.testing.assert_frame_equal(full_state(lake),
                                  full_state(cow_lake(cow)))


def test_retention_keeps_referenced_deltas(runs, tmp_path):
    ml = fresh_mor_copy(runs, tmp_path)
    before = full_state(ml)
    gone = ml.compact(keep_epochs=1)  # retention, not delta compaction
    assert gone["removed_manifests"] > 0
    pd.testing.assert_frame_equal(full_state(ml), before)
    # now fold and vacuum again: the delta files become unreferenced
    ml.compact_deltas()
    n_deltas = len(list((ml.root / "data").rglob("delta-*.parquet")))
    assert n_deltas > 0
    gone = ml.compact(keep_epochs=1)
    assert not list((ml.root / "data").rglob("delta-*.parquet"))
    assert gone["removed_files"] >= n_deltas
    pd.testing.assert_frame_equal(full_state(ml), before)


# -- policy matrix through the deferred merge --------------------------------

def _policy_events():
    def mk(op, seq, url, ts, lang, score):
        return {"op": op, "seq": seq, "url": url,
                "warc_ts": pd.Timestamp(ts, unit="s"),
                "lang": lang, "score": score}
    e0 = [mk("insert", 0, "u1", 10, "en", 1.0),
          mk("insert", 1, "u2", 10, "de", 2.0),
          mk("insert", 2, "u3", 10, "fr", 3.0)]
    e1 = [mk("update", 3, "u1", 20, None, 9.0),     # null vs fill-null
          mk("update", 4, "u2", 5, "XX", 0.0),      # stale version loses
          mk("delete", 5, "u3", 30, None, None),
          mk("insert", 6, "u4", 30, "es", 4.0),
          mk("update", 7, "u4", 31, "pt", 5.0)]     # same-epoch dup key
    return [e0, e1]


@pytest.mark.parametrize("policy", [
    {},
    {"overwrite": False},
    {"protected": ("lang",)},
    {"managed_timestamps": True},
], ids=["lww", "fill-null", "protected", "managed-ts"])
def test_mor_policy_matrix_equals_cow(policy, tmp_path):
    epochs = _policy_events()
    cow = LakeTable(tmp_path / "c", key="url", num_partitions=2,
                    collect_changes=False, **policy)
    mor = LakeTable(tmp_path / "m", key="url", num_partitions=2,
                    **MOR_KW, **policy)
    for e, rows in enumerate(epochs):
        cow.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), e)
        mor.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), e)
    pd.testing.assert_frame_equal(full_state(mor), full_state(cow))
    assert mor.compact_deltas().partitions_touched > 0
    pd.testing.assert_frame_equal(full_state(mor), full_state(cow))
    assert mor.snapshot_hash() == cow.snapshot_hash()


def test_mor_replay_is_noop(tmp_path):
    epochs = _policy_events()
    mor = LakeTable(tmp_path / "m", key="url", num_partitions=2, **MOR_KW)
    for e, rows in enumerate(epochs):
        mor.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), e)
    h = mor.snapshot_hash()
    n = len(list((tmp_path / "m" / "data").rglob("delta-*.parquet")))
    for e, rows in enumerate(epochs):  # exactly-once: replays are no-ops
        assert mor.commit_epoch(
            rd.from_arrow(pa.Table.from_pylist(rows)), e).skipped
    assert mor.snapshot_hash() == h
    assert len(list((tmp_path / "m" / "data")
                    .rglob("delta-*.parquet"))) == n


# -- guards -------------------------------------------------------------------

def test_constructor_guards(tmp_path):
    with pytest.raises(ValueError, match="collect_changes"):
        LakeTable(tmp_path / "a", merge_on_read=True)
    with pytest.raises(ValueError, match="id_field"):
        LakeTable(tmp_path / "b", merge_on_read=True,
                  collect_changes=False, id_field="doc_id")


def test_cow_commit_on_delta_lake_refuses(runs, tmp_path):
    ml = fresh_mor_copy(runs, tmp_path)
    cow_view = LakeTable(ml.root, num_partitions=8, collect_changes=False)
    new_ds = rd.from_arrow(pa.Table.from_pylist(
        [{"op": "insert", "seq": 99, "url": "u-new",
          "warc_ts": pd.Timestamp(100, unit="s"), "lang": "en"}]))
    with pytest.raises(ValueError, match="pending merge-on-read deltas"):
        cow_view.commit_epoch(new_ds, 4)
    with pytest.raises(ValueError, match="pending merge-on-read deltas"):
        cow_view.purge_tombstones()
    # after folding, a COW handle is allowed again (fresh instance: the
    # refused attempt above already staged epoch 4 under the old one)
    ml.compact_deltas()
    cow2 = LakeTable(ml.root, num_partitions=8, collect_changes=False)
    assert not cow2.commit_epoch(new_ds, 4).skipped


def test_derived_structures_maintain_at_mor_head(runs, tmp_path):
    """The contract flip from the round-4 refusal: derived structures
    fold merge-on-read commits directly (key-restricted old/new diff),
    so a delta-bearing head refreshes to CURRENT state with no
    compaction anywhere — and a later compaction folds a ZERO delta
    (results bit-identical before/after). The `runs` log includes the
    evolution epoch, so the diff path crosses a schema change."""
    from chomper_ray.state.derived import LakeBucketLayout
    from chomper_ray.state.index import LakeTextIndex
    from chomper_ray.state.matview import MaterializedAgg

    ml = fresh_mor_copy(runs, tmp_path)

    def contrib(df):
        return pd.DataFrame({"lang": df["lang"].fillna(""),
                             "one": [1] * len(df)})

    def view_want(live):
        return (live.assign(lang=live["lang"].fillna(""))
                .groupby("lang").size().rename("n_live").reset_index()
                .sort_values("lang").reset_index(drop=True))

    view = MaterializedAgg(ml, tmp_path / "mv", contrib,
                           group_cols=["lang"], value_cols=["one"],
                           read_columns=["lang"])
    idx = LakeTextIndex(ml, tmp_path / "ix", col="text",
                        num_partitions=8)
    layout = LakeBucketLayout(ml, tmp_path / "bl", columns=["url", "lang"])

    # refresh AT the delta-bearing head (4 pending MOR commits, never
    # compacted) — results must equal recomputation from live state
    vdf = view.refresh()
    live = ml.read_pandas()
    got = vdf[["lang", "n_live"]].sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, view_want(live), check_dtype=False)
    idx.refresh()
    assert idx.stats()["n_docs"] == len(live)
    layout.refresh()
    lay_df = pd.concat(
        [pq.read_table(f).to_pandas()
         for f in (tmp_path / "bl").rglob("part.parquet")],
        ignore_index=True)
    assert sorted(lay_df["url"]) == sorted(live["url"])

    # compaction folds the SAME content -> zero delta for all three
    # (the compaction's own empty marker segment is the only change)
    def content_stats(s):
        return {k: v for k, v in s.items() if k != "segments"}

    n_postings = content_stats(idx.stats())
    ml.compact_deltas()
    vdf2 = view.refresh()
    pd.testing.assert_frame_equal(
        vdf2[["lang", "n_live"]].sort_values("lang")
        .reset_index(drop=True), got, check_dtype=False)
    idx.refresh()
    assert content_stats(idx.stats()) == n_postings
    r = layout.refresh()
    # compaction rewrote every delta-bearing base -> fingerprints moved,
    # but the rewritten content is identical
    lay2 = pd.concat(
        [pq.read_table(f).to_pandas()
         for f in (tmp_path / "bl").rglob("part.parquet")],
        ignore_index=True)
    pd.testing.assert_frame_equal(
        lay2.sort_values("url").reset_index(drop=True),
        lay_df.sort_values("url").reset_index(drop=True))
    assert r["applied_cid"] == load_manifest(ml.root)["epoch"]

"""Derived maintenance under merge-on-read WITHOUT compaction: a
delta-bearing ingest commit folds its EXACT effect into matview /
inverted index / clustered layouts via the lake's key-restricted
old/new diff (state/lake.py materialize_mor_commit_diff), and a
compact_deltas commit folds a ZERO delta. The maintained structures
must equal a from-scratch rebuild after EVERY commit of a pure-MOR or
mixed MOR→compact→MOR chain, and the per-commit maintenance cost must
scale with the COMMIT'S OWN KEYS — strictly cheaper than the
copy-on-write diff, which scans whole touched partitions."""

import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

from chomper_ray.state.clustered import LakeSortedLayout
from chomper_ray.state.index import LakeTextIndex
from chomper_ray.state.lake import LakeTable
from chomper_ray.state.matview import MaterializedAgg

from tests.test_incindex import (assert_index_equals_rebuild, mk,
                                 reference_postings, resolved_all)


def mor_lake(root, num_partitions=4):
    return LakeTable(root, key="url", num_partitions=num_partitions,
                     merge_on_read=True, collect_changes=False)


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


EPOCHS = [
    [mk("insert", 0, "u1", 10, "lorem ipsum dolor"),
     mk("insert", 1, "u2", 10, "ipsum sit"),
     mk("insert", 2, "u3", 10, "dolor dolor amet")],
    # update rewrites u2's token set entirely; delete u3
    [mk("update", 3, "u2", 20, "magna carta"),
     mk("delete", 4, "u3", 20, None)],
    # reinsert u3; no-op-ish update of u1 (same text)
    [mk("insert", 5, "u3", 30, "sit amet"),
     mk("update", 6, "u1", 30, "lorem ipsum dolor")],
]


def test_mor_incindex_tracks_every_commit(tmp_path, ray_session):
    lake = mor_lake(tmp_path / "lake")
    idx = LakeTextIndex(lake, tmp_path / "idx", num_partitions=8)
    for i, ev in enumerate(EPOCHS):
        commit(lake, ev, i)
        idx.refresh()  # head is delta-bearing on EVERY iteration
        assert_index_equals_rebuild(idx, lake, tmp_path, f"mor-c{i}")
    # compaction: zero delta (empty segment), postings unchanged
    before = resolved_all(idx)
    lake.compact_deltas()
    m = idx.refresh()
    assert m["applied"][0]["postings"] == 0
    pd.testing.assert_frame_equal(resolved_all(idx), before,
                                  check_dtype=False)
    # MOR commits continue after compaction
    commit(lake, [mk("update", 9, "u1", 40, "post compact words"),
                  mk("insert", 10, "u9", 40, "omega")], 3)
    idx.refresh()
    assert_index_equals_rebuild(idx, lake, tmp_path, "mor-post")


def test_mor_maintenance_cost_scales_with_commit_keys(tmp_path,
                                                      ray_session):
    """MOR derived maintenance beats COW's: the diff is restricted to
    the commit's OWN keys, so a 1-url commit into a 200-url lake scans
    ~2 rows (old+new of that url) — not a partition, not the corpus."""
    lake = mor_lake(tmp_path / "lake")
    idx = LakeTextIndex(lake, tmp_path / "idx", num_partitions=8)
    n_base = 200
    commit(lake, [mk("insert", i, f"u{i}", 10,
                     f"tok{i % 17} common filler")
                  for i in range(n_base)], 0)
    full = idx.refresh()["applied"][0]
    assert full["full"] and full["rows_scanned"] == n_base

    commit(lake, [mk("update", 9000, "u7", 99, "updated words")], 1)
    delta = idx.refresh()["applied"][0]
    assert not delta["full"]
    assert delta["rows_scanned"] <= 2  # old u7 + new u7, nothing else
    assert_index_equals_rebuild(idx, lake, tmp_path, "mor-delta")


def test_mor_matview_tracks_every_commit(tmp_path, ray_session):
    lake = mor_lake(tmp_path / "lake")

    def contrib(df):
        return pd.DataFrame(
            {"tok0": df["text"].fillna("").str.split(" ").str[0],
             "one": [1] * len(df)})

    view = MaterializedAgg(lake, tmp_path / "mv", contrib,
                           group_cols=["tok0"], value_cols=["one"],
                           read_columns=["text"])
    for i, ev in enumerate(EPOCHS):
        commit(lake, ev, i)
        vdf = view.refresh()
        live = lake.read_pandas()
        want = (live["text"].fillna("").str.split(" ").str[0]
                .value_counts().rename_axis("tok0").rename("n_live")
                .reset_index().sort_values("tok0")
                .reset_index(drop=True))
        got = (vdf[["tok0", "n_live"]].sort_values("tok0")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    before = view.view()
    lake.compact_deltas()
    vdf = view.refresh()
    pd.testing.assert_frame_equal(vdf.reset_index(drop=True),
                                  before.reset_index(drop=True),
                                  check_dtype=False)


def test_mor_sorted_layout_tracks_commits(tmp_path, ray_session):
    lake = mor_lake(tmp_path / "lake", num_partitions=2)

    def mks(op, seq, url, ts, x):
        return {"op": op, "seq": seq, "url": url,
                "warc_ts": pd.Timestamp(ts, unit="s"), "x": x}

    commit(lake, [mks("insert", i, f"d{i}", 10, float(i))
                  for i in range(40)], 0)
    lay = LakeSortedLayout(lake, tmp_path / "srt", order_col="x",
                           num_partitions=4)
    lay.refresh()  # full build from the resolved delta-bearing head

    def check():
        live = lake.read_pandas()
        want = sorted(live[(live["x"] >= 5) & (live["x"] < 12)]["url"])
        ds, _, _ = lay.read_range(5, 12)
        assert sorted(ds.to_pandas()["url"]) == want

    check()
    # MOR update moves a row OUT of the window; delete removes another
    commit(lake, [mks("update", 50, "d7", 20, 55.0),
                  mks("delete", 51, "d8", 20, None)], 1)
    lay.refresh()
    check()
    lake.compact_deltas()
    lay.refresh()
    check()


def test_mor_keyed_bucket_layout_tracks_commits(tmp_path, ray_session):
    """Secondary-key bucket layout under MOR: full build at a
    delta-bearing head, a bucket-crossing update + delete folded from
    the MOR diff, zero-delta compaction."""
    from chomper_ray.state.clustered import LakeKeyedBucketLayout

    lake = mor_lake(tmp_path / "lake", num_partitions=2)

    def mkd(op, seq, url, ts, dom):
        return {"op": op, "seq": seq, "url": url,
                "warc_ts": pd.Timestamp(ts, unit="s"), "domain": dom}

    commit(lake, [mkd("insert", i, f"u{i}", 10, f"d{i % 5}")
                  for i in range(30)], 0)
    kbl = LakeKeyedBucketLayout(lake, tmp_path / "kbl",
                                bucket_col="domain", num_partitions=4)
    kbl.refresh()

    def check():
        live = lake.read_pandas()
        want = sorted(live[live["domain"] == "d2"]["url"])
        got, _, _ = kbl.lookup(["d2"])
        assert sorted(got.to_pandas()["url"]) == want

    check()
    # u7 moves d2->d0 (bucket crossing: -1 in old bucket, +1 in new);
    # u12 (d2) deleted — both via the MOR diff, no compaction
    commit(lake, [mkd("update", 50, "u7", 20, "d0"),
                  mkd("delete", 51, "u12", 20, None)], 1)
    kbl.refresh()
    check()
    lake.compact_deltas()
    kbl.refresh()
    check()


def test_after_commit_hook_keeps_index_fresh(tmp_path, ray_session):
    """run_cdc(after_commit=...) is the wiring point for derived
    maintenance: refreshing a LakeTextIndex from the hook keeps it
    equal to the live state after EVERY commit — per-epoch and drain
    modes, on a merge-on-read lake, no compaction anywhere."""
    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.sources.events import generate_change_stream

    log = generate_change_stream(tmp_path / "log", n_events=1200,
                                 n_urls=150, n_epochs=4, seed=31)
    kw = {"merge_on_read": True, "collect_changes": False}
    lake = LakeTable(tmp_path / "lake", num_partitions=4, **kw)
    idx = LakeTextIndex(lake, tmp_path / "idx", num_partitions=8)
    fired = []

    def hook(commit):
        fired.append(commit.epoch)
        idx.refresh()
        # after the hook's refresh the index is AT the chain head; in
        # drain mode ALL manifests land before the hooks fire, so the
        # first drained hook catches the later commits too and the
        # rest are no-ops — refresh walks the chain either way
        assert idx.applied_commits()[-1] == lake.last_committed_epoch()

    run_cdc(log, tmp_path / "lake", num_partitions=4, lake_kwargs=kw,
            after_commit=hook, max_epochs=2)
    assert fired == [0, 1]
    # drain mode for the remaining TWO epochs (true drain path);
    # hook fires per drained commit in chain order
    run_cdc(log, tmp_path / "lake", num_partitions=4, lake_kwargs=kw,
            after_commit=hook, drain=True)
    assert fired == [0, 1, 2, 3]
    got = resolved_all(idx)
    live = lake.read_pandas()
    assert set(got["doc"]) == set(live["url"])
    # rerun: everything skipped, hook does NOT fire
    run_cdc(log, tmp_path / "lake", num_partitions=4, lake_kwargs=kw,
            after_commit=hook)
    assert fired == [0, 1, 2, 3]


def test_after_commit_hook_failure_recovers(tmp_path, ray_session):
    """The documented crash contract: if after_commit raises, the
    commit stays durable; the rerun skips it (hook does not re-fire for
    it) and the NEXT epoch's hook call catches the index up, because
    refresh() walks the chain from its own applied marker."""
    import pytest

    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.sources.events import generate_change_stream

    log = generate_change_stream(tmp_path / "log", n_events=600,
                                 n_urls=120, n_epochs=2, seed=13)
    kw = {"merge_on_read": True, "collect_changes": False}
    lake = LakeTable(tmp_path / "lake", num_partitions=4, **kw)
    idx = LakeTextIndex(lake, tmp_path / "idx", num_partitions=8)
    calls = []

    def flaky_hook(commit):
        calls.append(commit.epoch)
        if len(calls) == 1:
            raise RuntimeError("simulated crash before refresh")
        idx.refresh()

    with pytest.raises(RuntimeError, match="simulated crash"):
        run_cdc(log, tmp_path / "lake", num_partitions=4, lake_kwargs=kw,
                after_commit=flaky_hook)
    assert calls == [0]
    assert lake.last_committed_epoch() == 0  # the commit survived
    assert idx.applied_commits() == []       # hook died before refresh
    # re-entry: epoch 0 skips (hook not re-fired), epoch 1 commits and
    # its hook's refresh folds BOTH commits
    run_cdc(log, tmp_path / "lake", num_partitions=4, lake_kwargs=kw,
            after_commit=flaky_hook)
    assert calls == [0, 1]
    assert idx.applied_commits()[-1] == lake.last_committed_epoch()
    got = resolved_all(idx)
    assert set(got["doc"]) == set(lake.read_pandas()["url"])


_VOCAB = ["lorem", "ipsum", "dolor", "sit", "amet", "web", "page"]
_op = st.tuples(
    st.sampled_from(["insert", "update", "delete"]),
    st.integers(0, 5),                       # url index
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=6),
)


@settings(max_examples=6, deadline=None)
@given(epochs=st.lists(st.lists(_op, min_size=1, max_size=5),
                       min_size=1, max_size=3),
       compact_after=st.lists(st.booleans(), min_size=3, max_size=3))
def test_mor_random_op_sequences_match_rebuild(epochs, compact_after,
                                               tmp_path_factory,
                                               ray_session):
    """Property: for ANY merge-on-read commit sequence of inserts /
    full token-set updates / deletes, with compactions interleaved at
    ARBITRARY points, the per-commit maintained index equals the
    plain-Python tokenization of the final resolved LWW state."""
    tmp_path = tmp_path_factory.mktemp("morprop")
    lake = mor_lake(tmp_path / "lake", num_partitions=2)
    idx = LakeTextIndex(lake, tmp_path / "idx", num_partitions=4)
    seq = 0
    for ei, ops in enumerate(epochs):
        rows = []
        for op, ui, toks in ops:
            rows.append(mk(op, seq, f"u{ui}", 10 + seq,
                           None if op == "delete" else " ".join(toks)))
            seq += 1
        lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), ei)
        idx.refresh()
        if compact_after[ei % len(compact_after)]:
            lake.compact_deltas()
            idx.refresh()
    got = resolved_all(idx)
    want = reference_postings(lake)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert idx.stats()["n_docs"] == len(lake.read_pandas())


def test_minor_compaction_folds_deep_chains_only(tmp_path, ray_session):
    """compact_deltas(min_chain=N) is the read-amplification lever:
    only partitions with chains >= N fold; shallow chains stay pending
    (delta_commits carried), resolved reads are unchanged, and derived
    maintenance sees the partial fold as a zero delta like any other
    compaction."""
    lake = mor_lake(tmp_path / "lake")
    idx = LakeTextIndex(lake, tmp_path / "idx", num_partitions=8)
    # epoch 0 touches many partitions (chain 1 everywhere); epochs 1-3
    # hammer one url -> its partition reaches chain 4
    commit(lake, [mk("insert", i, f"u{i}", 10, f"base w{i % 7}")
                  for i in range(24)], 0)
    for e in range(1, 4):
        commit(lake, [mk("update", 100 + e, "u5", 10 + e,
                         f"hot rev{e}")], e)
    idx.refresh()
    chains = lake.delta_chain_lengths()
    assert max(chains.values()) == 4 and min(chains.values()) == 1
    before = lake.read_pandas().sort_values("url").reset_index(drop=True)

    res = lake.compact_deltas(min_chain=3)
    assert res.partitions_touched == 1
    after_chains = lake.delta_chain_lengths()
    assert after_chains and max(after_chains.values()) == 1
    pd.testing.assert_frame_equal(
        lake.read_pandas().sort_values("url").reset_index(drop=True),
        before)
    # minor compaction = zero delta for the index; still == rebuild
    m = idx.refresh()
    assert m["applied"][0]["postings"] == 0
    assert_index_equals_rebuild(idx, lake, tmp_path, "minor")

    # a second minor pass at the same threshold: nothing deep enough
    assert lake.compact_deltas(min_chain=3).skipped
    # major compaction finishes the job
    assert not lake.compact_deltas().skipped
    assert lake.delta_chain_lengths() == {}
    pd.testing.assert_frame_equal(
        lake.read_pandas().sort_values("url").reset_index(drop=True),
        before)
    idx.refresh()
    assert_index_equals_rebuild(idx, lake, tmp_path, "major")


def test_mor_index_created_mid_mixed_chain(tmp_path, ray_session):
    """An index created AFTER a MOR→compact→MOR history walks the whole
    chain correctly: full build at the first commit's delta-bearing
    manifest (materialize_mor_resolved), per-commit diffs across the
    remaining MOR commits, zero at the compaction — final state equals
    the rebuild oracle."""
    lake = mor_lake(tmp_path / "lake")
    commit(lake, EPOCHS[0], 0)
    commit(lake, EPOCHS[1], 1)
    lake.compact_deltas()
    commit(lake, EPOCHS[2], 3)  # head is delta-bearing again
    idx = LakeTextIndex(lake, tmp_path / "idx", num_partitions=8)
    m = idx.refresh()
    assert m["applied"][0]["full"]  # first segment: resolved full build
    assert len(m["applied"]) == 4  # then c1 diff, compaction zero, c3
    assert_index_equals_rebuild(idx, lake, tmp_path, "mid-chain")

"""Incremental inverted-index maintenance (state/index.py
LakeTextIndex): the maintained index must equal a from-scratch rebuild
after EVERY commit, and per-commit maintenance cost must scale with the
commit's write amplification, never the corpus."""

from collections import Counter

import pandas as pd
import pyarrow as pa
import ray.data as rd

from chomper_ray.state.index import LakeTextIndex
from chomper_ray.state.lake import LakeTable


def mk(op, seq, url, ts, text):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"), "text": text}


def reference_postings(lake) -> pd.DataFrame:
    """Tokenize the live lake state row-at-a-time in plain Python."""
    live = lake.read_pandas()
    rows = []
    for _, r in live.iterrows():
        toks = (r["text"] if isinstance(r["text"], str) else "").split(" ")
        for tok, tf in Counter(toks).items():
            rows.append((tok, r["url"], tf, len(toks)))
    return pd.DataFrame(rows, columns=["token", "doc", "tf", "dl"]) \
        .sort_values(["token", "doc"]).reset_index(drop=True)


def resolved_all(idx: LakeTextIndex) -> pd.DataFrame:
    parts = [idx._resolved_bucket(p) for p in range(idx.num_partitions)]
    parts = [p for p in parts if p is not None and len(p)]
    if not parts:
        return pd.DataFrame(columns=["token", "doc", "tf", "dl"])
    return pd.concat(parts, ignore_index=True) \
        .sort_values(["token", "doc"]).reset_index(drop=True)


def assert_index_equals_rebuild(idx, lake, tmp_path, tag):
    got = resolved_all(idx)
    want = reference_postings(lake)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # and ≡ a from-scratch full build through the same segment writer
    fresh = LakeTextIndex(lake, tmp_path / f"rebuild-{tag}",
                          num_partitions=idx.num_partitions)
    fresh.refresh()  # may apply several commits; final state is what counts
    pd.testing.assert_frame_equal(resolved_all(fresh), want,
                                  check_dtype=False)
    assert idx.stats()["n_docs"] == fresh.stats()["n_docs"]
    assert idx.stats()["sum_dl"] == fresh.stats()["sum_dl"]


def test_incindex_tracks_every_commit(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4)
    idx = LakeTextIndex(lake, tmp_path / "idx", num_partitions=8)

    e0 = [mk("insert", 0, "u1", 10, "lorem ipsum dolor"),
          mk("insert", 1, "u2", 10, "ipsum sit"),
          mk("insert", 2, "u3", 10, "dolor dolor amet")]
    # e1: update rewrites u2's token set entirely; delete u3
    e1 = [mk("update", 3, "u2", 20, "magna carta"),
          mk("delete", 4, "u3", 20, None)]
    # e2: reinsert u3; no-op-ish update of u1 (same text)
    e2 = [mk("insert", 5, "u3", 30, "sit amet"),
          mk("update", 6, "u1", 30, "lorem ipsum dolor")]
    for i, ev in enumerate([e0, e1, e2]):
        lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(ev)), i)
        idx.refresh()
        assert_index_equals_rebuild(idx, lake, tmp_path, f"c{i}")

    # refresh is idempotent: nothing new -> no new segments
    before = idx.applied_commits()
    res = idx.refresh()
    assert res["applied"] == [] and idx.applied_commits() == before

    # search + bm25 read the maintained segments
    assert list(idx.search(["ipsum"], mode="all")) == ["u1"]
    assert list(idx.search(["lorem", "dolor"], mode="all")) == ["u1"]
    assert list(idx.search(["magna", "amet"], mode="any")) == ["u2", "u3"]
    top = idx.bm25(["ipsum", "sit"], k=2)
    assert list(top["doc"]) and top["score"].is_monotonic_decreasing

    # compaction folds segments without changing the resolved postings
    want = resolved_all(idx)
    st = idx.compact()
    assert st["compacted"] and len(idx._live_segments()) == 1
    pd.testing.assert_frame_equal(resolved_all(idx), want,
                                  check_dtype=False)
    # and maintenance continues cleanly on top of the compacted base
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("update", 7, "u1", 40, "fresh text")])), 3)
    idx.refresh()
    assert_index_equals_rebuild(idx, lake, tmp_path, "post-compact")


def test_incindex_cost_scales_with_commit_not_corpus(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4)
    idx = LakeTextIndex(lake, tmp_path / "idx", num_partitions=8)

    n_base = 200
    base = [mk("insert", i, f"u{i}", 10, f"tok{i % 17} common filler")
            for i in range(n_base)]
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(base)), 0)
    full = idx.refresh()["applied"][0]
    assert full["full"] and full["rows_scanned"] == n_base

    # one-url commit: the delta segment scans only the touched
    # partition's old+new versions (copy-on-write amplification),
    # never the other partitions
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("update", 9000, "u7", 99, "updated words")])), 1)
    delta = idx.refresh()["applied"][0]
    assert not delta["full"]
    # 4 partitions -> touched ≈ n_base/4 rows per side; anything close
    # to the corpus means the delta path scanned everything
    assert delta["rows_scanned"] <= 2 * (n_base // 4 + 30)
    assert delta["rows_scanned"] < n_base
    assert delta["postings"] < full["postings"] / 2
    assert_index_equals_rebuild(idx, lake, tmp_path, "delta")


def test_incindex_truncate_and_resume(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2)
    idx = LakeTextIndex(lake, tmp_path / "idx", num_partitions=4)
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("insert", 0, "u1", 10, "hello world")])), 0)
    idx.refresh()
    assert len(idx.search(["hello"])) == 1

    # commits land while the index is offline; refresh folds them all
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("insert", 1, "u2", 20, "hello again")])), 1)
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("delete", 2, "u1", 30, None)])), 2)
    idx.refresh()
    assert list(idx.search(["hello"])) == ["u2"]
    assert_index_equals_rebuild(idx, lake, tmp_path, "resume")

    lake.truncate()
    idx.refresh()
    assert idx.stats()["n_docs"] == 0
    assert len(idx.search(["hello"])) == 0


from hypothesis import given, settings, strategies as st

_VOCAB = ["lorem", "ipsum", "dolor", "sit", "amet", "web", "page"]
_op = st.tuples(
    st.sampled_from(["insert", "update", "delete"]),
    st.integers(0, 5),                       # url index
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=6),
)


@settings(max_examples=8, deadline=None)
@given(epochs=st.lists(st.lists(_op, min_size=1, max_size=5),
                       min_size=1, max_size=3))
def test_incindex_random_op_sequences_match_rebuild(epochs, tmp_path_factory,
                                                    ray_session):
    """Property: for ANY commit sequence of inserts / full token-set
    updates / deletes, the incrementally maintained index equals the
    plain-Python tokenization of the final LWW state."""
    tmp_path = tmp_path_factory.mktemp("incprop")
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2)
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
    got = resolved_all(idx)
    want = reference_postings(lake)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert idx.stats()["n_docs"] == len(lake.read_pandas())

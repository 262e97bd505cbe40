"""Centroid retraining compaction (LakeANNIndex.compact(retrain=True)):
re-clustering must never change EXACT answers (exhaustive search and
the admission probe are partitioning-independent), must fix the drift
failure mode (a new orthogonal cluster scattered across stale cells →
pruned-search recall collapses until retrain co-locates it), must
survive a crashed attempt, and must compose with later delta commits
(whose ±1 rows are assigned with the NEW centroids)."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from chomper_ray.state.annindex import LakeANNIndex
from chomper_ray.state.lake import LakeTable
from tests.test_annindex import (DIM, assert_search_exact, brute_topk,
                                 commit, got_topk, mk)


def _cluster(rng, axis: int, n: int, lo: int, noise_axes):
    """n unit-ish vectors hugging basis axis ``axis`` with noise only
    in ``noise_axes`` — keyed u{lo}..u{lo+n-1}."""
    rows = []
    for i in range(n):
        v = np.zeros(DIM)
        v[axis] = 1.0
        for a in noise_axes:
            v[a] = 0.15 * rng.normal()
        rows.append(mk("insert", lo + i, f"u{lo + i:03d}", 10, v))
    return rows


def _drifted(tmp_path):
    """Epoch 0: cluster A in span{e0,e1} (what the centroids train on —
    every trained centroid is exactly zero outside dims 0/1); epochs
    1-2: cluster B near e4 whose noise has dim-0/1 components, so B
    SCATTERS across the stale cells on that noise alone, while the
    B-shaped queries carry noise only in dims 5-7 (zero dot with every
    stale centroid → they all probe one stale cell). The classical
    drift failure: pruned recall collapses until retrain co-locates B."""
    rng = np.random.default_rng(7)
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    idx = LakeANNIndex(lake, tmp_path / "ann", n_cells=4)
    a = _cluster(rng, 0, 30, 0, (1,)) + _cluster(rng, 1, 30, 100, (0,))
    commit(lake, a, 0)
    idx.refresh()
    for e, lo in ((1, 200), (2, 300)):
        rows = _cluster(rng, 4, 20, lo, (0, 1, 5))
        for r in rows:
            r["warc_ts"] = pd.Timestamp(10 + e, unit="s")
        commit(lake, rows, e)
        idx.refresh()
    b_keys = {f"u{i:03d}" for i in range(200, 220)} \
        | {f"u{i:03d}" for i in range(300, 320)}
    b_queries = np.stack([np.eye(DIM)[4]
                          + 0.05 * rng.normal(size=3) @ np.eye(DIM)[5:]
                          for _ in range(8)])
    return lake, idx, b_keys, b_queries


def _recall_at(idx, queries, truth_sets, nprobe, k=5):
    got = idx.search(queries, k=k, nprobe=nprobe)
    hit = tot = 0
    for qi, want in enumerate(truth_sets):
        g = set(got[got["qid"] == qi]["key"])
        hit += len(g & want)
        tot += len(want)
    return hit / max(tot, 1)


def test_retrain_fixes_drift_and_keeps_exact_answers(tmp_path,
                                                     ray_session):
    lake, idx, b_keys, q = _drifted(tmp_path)
    exhaustive_before = got_topk(idx, q, 5)
    truth = [set(k for k, _ in row) for row in exhaustive_before]
    recall_before = _recall_at(idx, q, truth, nprobe=1)

    out = idx.compact(retrain=True)
    assert out["retrained"] and out["n_cells"] == 4
    # exact answers are partitioning-independent
    assert got_topk(idx, q, 5) == exhaustive_before
    assert_search_exact(idx, lake, q)
    recall_after = _recall_at(idx, q, truth, nprobe=1)
    assert recall_before <= 0.7, recall_before
    assert recall_after >= 0.8, recall_after
    assert recall_after > recall_before
    # the admission probe works over the retrained chain
    near = idx.near_vecs([np.eye(DIM)[4]], threshold=0.9, nprobe=2)
    assert set(near["key"]) <= b_keys and len(near) > 0


def test_retrain_resizes_cells_and_composes_with_deltas(tmp_path,
                                                        ray_session):
    lake, idx, _, q = _drifted(tmp_path)
    out = idx.compact(retrain=True, n_cells=8)
    assert out["n_cells"] == 8 and idx.stats()["n_cells"] == 8
    assert_search_exact(idx, lake, q)

    # post-retrain delta commit: update a pre-retrain key (its -1 must
    # cancel the compacted +1 under the NEW centroids), delete another,
    # insert a fresh one
    rng = np.random.default_rng(21)
    rows = [mk("update", 900, "u000", 30, rng.normal(size=DIM)),
            mk("delete", 901, "u100", 30, None),
            mk("insert", 902, "u990", 30, rng.normal(size=DIM))]
    commit(lake, rows, 3)
    idx.refresh()
    assert_search_exact(idx, lake, q)
    res = idx.search(q, k=len(lake.read_pandas()))
    per_q = res[res["qid"] == 0]
    assert list(per_q["key"]).count("u000") == 1
    assert "u100" not in set(per_q["key"])

    # a fresh index over the same head (its OWN centroids) agrees
    fresh = LakeANNIndex(lake, tmp_path / "ann2", n_cells=5)
    fresh.refresh()
    assert got_topk(fresh, q, 5) == got_topk(idx, q, 5)

    # plain compaction after all that keeps answers and carries the
    # retrained centroids forward
    want = got_topk(idx, q, 5)
    assert idx.compact()["compacted"]
    assert got_topk(idx, q, 5) == want
    assert idx.stats()["n_cells"] == 8


def test_retrain_crash_leaves_old_chain_then_rerun_heals(tmp_path,
                                                         ray_session):
    lake, idx, _, q = _drifted(tmp_path)
    before = got_topk(idx, q, 5)
    cent_before = idx.centroids().copy()

    # simulate a crashed attempt: the gen-dir exists with junk but no
    # _SEGMENT.json marker — invisible to every reader
    segs = idx._segments()
    cid = segs[-1]["cid"]
    junk = Path(idx.root) / f"seg-{cid:06d}-full-g1"
    (junk / "c=00000").mkdir(parents=True)
    (junk / "c=00000" / "frag-00000.parquet").write_bytes(b"not parquet")
    assert got_topk(idx, q, 5) == before
    assert np.allclose(idx.centroids(), cent_before)

    out = idx.compact(retrain=True)
    assert out["retrained"]
    assert got_topk(idx, q, 5) == before
    marker = json.loads((Path(idx.root) / f"seg-{cid:06d}-full-g1" /
                         "_SEGMENT.json").read_text())
    assert marker["gen"] == 1


def test_second_retrain_supersedes_first_by_gen(tmp_path, ray_session):
    lake, idx, _, q = _drifted(tmp_path)
    before = got_topk(idx, q, 5)
    assert idx.compact(retrain=True)["retrained"]
    assert idx.compact(retrain=True, n_cells=6)["n_cells"] == 6
    assert got_topk(idx, q, 5) == before
    assert idx.stats()["n_cells"] == 6
    # exactly one live segment remains, at gen 2
    segs = idx._segments()
    assert len(segs) == 1 and segs[0]["gen"] == 2

"""Incremental ANN (IVF) index maintenance (state/annindex.py
LakeANNIndex): the maintained cell-partitioned index must, after EVERY
commit, answer exhaustive search (nprobe = n_cells) exactly like
brute-force cosine over the live lake state — across inserts, updates
that move vectors BETWEEN cells, deletes, compaction and resume — and
per-commit maintenance cost must scale with the commit's write
amplification, never the corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chomper_ray.state.annindex import LakeANNIndex
from chomper_ray.state.lake import LakeTable

DIM = 8


def mk(op, seq, url, ts, vec):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"),
            "embedding": None if vec is None else list(map(float, vec))}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def brute_topk(lake, q: np.ndarray, k: int) -> list[list[tuple]]:
    """Exact cosine top-k per query over the live lake state; ties by
    ascending key — the oracle the maintained index must reproduce."""
    live = lake.read_pandas()
    if not len(live):
        return [[] for _ in range(len(q))]
    m = np.stack(live["embedding"].to_numpy()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    qn = np.asarray(q, dtype=np.float64)
    qn /= np.maximum(np.linalg.norm(qn, axis=1, keepdims=True), 1e-12)
    sc = qn @ m.T
    keys = live["url"].to_numpy()
    out = []
    for qi in range(len(q)):
        order = np.lexsort((keys, -sc[qi]))[:k]
        out.append([(keys[j], round(float(sc[qi, j]), 9)) for j in order])
    return out


def got_topk(idx, q: np.ndarray, k: int) -> list[list[tuple]]:
    res = idx.search(q, k=k)  # nprobe=None -> exhaustive
    out = []
    for qi in range(len(q)):
        g = res[res["qid"] == qi]
        out.append([(r.key, round(float(r.score), 9))
                    for r in g.itertuples(index=False)])
    return out


def assert_search_exact(idx, lake, q, k=5):
    assert got_topk(idx, q, k) == brute_topk(lake, q, k)
    assert idx.stats()["n_vecs"] == len(lake.read_pandas())


def test_annindex_tracks_every_commit(tmp_path, ray_session):
    rng = np.random.default_rng(11)
    q = rng.normal(size=(4, DIM))
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    idx = LakeANNIndex(lake, tmp_path / "ann", n_cells=4)

    e0 = [mk("insert", i, f"u{i:03d}", 10, rng.normal(size=DIM))
          for i in range(80)]
    commit(lake, e0, 0)
    m = idx.refresh()
    assert m["applied"][0]["full"]
    assert_search_exact(idx, lake, q)

    # updates with FRESH random vectors — with 4 cells most move cells
    # (the -1-in-old-cell/+1-in-new-cell case); plus deletes + inserts
    e1 = [mk("update", 100 + i, f"u{i:03d}", 20, rng.normal(size=DIM))
          for i in range(20)]
    e1 += [mk("delete", 200 + i, f"u{30 + i:03d}", 20, None)
           for i in range(8)]
    e1 += [mk("insert", 300 + i, f"u{900 + i:03d}", 20,
              rng.normal(size=DIM)) for i in range(12)]
    commit(lake, e1, 1)
    seg = idx.refresh()["applied"][0]
    assert not seg["full"]
    assert_search_exact(idx, lake, q)

    # prove at least one update actually crossed cells: its old cell's
    # resolved set no longer contains it
    cent = idx.centroids()
    old = {r["url"]: np.asarray(r["embedding"]) for r in e0[:20]}
    new = {r["url"]: np.asarray(r["embedding"]) for r in e1[:20]}
    moved = [u for u in old
             if (old[u] / np.linalg.norm(old[u]) @ cent.T).argmax()
             != (new[u] / np.linalg.norm(new[u]) @ cent.T).argmax()]
    assert moved, "seed produced no cell-crossing update"
    u = moved[0]
    old_cell = int((old[u] / np.linalg.norm(old[u]) @ cent.T).argmax())
    res = idx._resolved_cell(old_cell)
    assert res is None or u not in set(res["key"])

    # idempotent: a second refresh applies nothing
    again = idx.refresh()
    assert again["applied"] == []
    assert_search_exact(idx, lake, q)


def test_annindex_compact_and_offline_catchup(tmp_path, ray_session):
    rng = np.random.default_rng(12)
    q = rng.normal(size=(3, DIM))
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    idx = LakeANNIndex(lake, tmp_path / "ann", n_cells=4)
    commit(lake, [mk("insert", i, f"u{i}", 10, rng.normal(size=DIM))
                  for i in range(40)], 0)
    idx.refresh()
    # commits land while the index is offline; one refresh folds both
    commit(lake, [mk("update", 100 + i, f"u{i}", 20,
                     rng.normal(size=DIM)) for i in range(10)], 1)
    commit(lake, [mk("delete", 200, "u5", 30, None)], 2)
    assert len(idx.refresh()["applied"]) == 2
    before = got_topk(idx, q, 5)
    assert before == brute_topk(lake, q, 5)
    assert idx.stats()["segments"] == 3

    assert idx.compact()["compacted"]
    assert idx.stats()["segments"] == 1
    assert got_topk(idx, q, 5) == before
    # maintenance continues past a compaction
    commit(lake, [mk("insert", 300, "u999", 40,
                     rng.normal(size=DIM))], 3)
    idx.refresh()
    assert_search_exact(idx, lake, q)


def test_annindex_cost_scales_with_commit_not_corpus(tmp_path,
                                                     ray_session):
    rng = np.random.default_rng(13)
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    idx = LakeANNIndex(lake, tmp_path / "ann", n_cells=4)
    n_base = 200
    commit(lake, [mk("insert", i, f"u{i}", 10, rng.normal(size=DIM))
                  for i in range(n_base)], 0)
    full = idx.refresh()["applied"][0]
    assert full["full"] and full["rows_scanned"] == n_base

    # one-url commit: the delta segment scans only the touched
    # partition's old+new live rows, never the other partitions
    commit(lake, [mk("update", 9000, "u7", 99, rng.normal(size=DIM))], 1)
    delta = idx.refresh()["applied"][0]
    assert not delta["full"]
    assert delta["rows_scanned"] <= 2 * (n_base // 4 + 30)
    assert delta["rows_scanned"] < n_base


def test_annindex_nprobe_pruning_recall(tmp_path, ray_session):
    """Clustered vectors: probing 2/8 cells still finds ≥0.9 of the
    true neighbors (the pruning path is a recall trade, exactness is
    nprobe=n_cells)."""
    rng = np.random.default_rng(14)
    centers = rng.normal(size=(8, DIM)) * 4
    rows, vecs = [], []
    for i in range(240):
        v = centers[i % 8] + rng.normal(size=DIM) * 0.3
        rows.append(mk("insert", i, f"u{i:03d}", 10, v))
        vecs.append(v)
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    commit(lake, rows, 0)
    idx = LakeANNIndex(lake, tmp_path / "ann", n_cells=8)
    idx.refresh()
    q = np.stack([centers[i] + rng.normal(size=DIM) * 0.3
                  for i in range(8)])
    want = brute_topk(lake, q, 10)
    got = idx.search(q, k=10, nprobe=2)
    hits = tot = 0
    for qi in range(len(q)):
        truth = {k for k, _ in want[qi]}
        found = set(got[got["qid"] == qi]["key"])
        hits += len(truth & found)
        tot += len(truth)
    assert hits / tot >= 0.9


def test_annindex_truncate_and_empty(tmp_path, ray_session):
    rng = np.random.default_rng(15)
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    idx = LakeANNIndex(lake, tmp_path / "ann", n_cells=4)
    commit(lake, [mk("insert", i, f"u{i}", 10, rng.normal(size=DIM))
                  for i in range(20)], 0)
    idx.refresh()
    assert idx.stats()["n_vecs"] == 20
    lake.truncate()
    idx.refresh()
    assert idx.stats()["n_vecs"] == 0
    assert idx.search(rng.normal(size=(2, DIM)), k=3).empty


def test_annindex_maintains_at_mor_head(tmp_path, ray_session):
    """Merge-on-read commits fold directly into the index (no
    compaction needed): full build at a delta-bearing head, per-commit
    maintenance across MOR updates/deletes (cell-crossing vectors
    included), and a zero-delta compaction."""
    rng = np.random.default_rng(16)
    q = rng.normal(size=(2, DIM))
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     merge_on_read=True, collect_changes=False)
    commit(lake, [mk("insert", i, f"u{i}", 10, rng.normal(size=DIM))
                  for i in range(10)], 0)
    idx = LakeANNIndex(lake, tmp_path / "ann", n_cells=2)
    idx.refresh()  # full build from the resolved delta-bearing head
    assert_search_exact(idx, lake, q, k=3)
    # MOR update (fresh vector -> likely cell crossing) + delete,
    # still no compaction
    commit(lake, [mk("update", 20, "u1", 20, rng.normal(size=DIM) * 5),
                  mk("delete", 21, "u2", 20, None)], 1)
    idx.refresh()
    assert_search_exact(idx, lake, q, k=3)
    # compaction folds the same content: search results unchanged
    before = got_topk(idx, q, 3)
    lake.compact_deltas()
    idx.refresh()
    assert got_topk(idx, q, 3) == before
    assert_search_exact(idx, lake, q, k=3)

"""LakeMinHashIndex (state/dupindex.py): per-commit maintained
MinHash+LSH near-dup index — after EVERY commit pairs() must equal the
batch LSH computation over the resolved live state (same
shingle/permutation/banding/threshold kernels), near_dups() must
admit/reject against live docs only, and maintenance cost must scale
with the commit, not the corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from chomper_ray.stages.dedup import (_band_rows, _perm_params,
                                      char_shingle_hashes,
                                      minhash_signature)
from chomper_ray.state.dupindex import LakeMinHashIndex
from chomper_ray.state.lake import LakeTable

PARAMS = dict(num_perm=32, bands=8, shingle_k=4, seed=7,
              num_partitions=8, threshold=0.5)

BASE = ("the quick brown fox jumps over the lazy dog and then "
        "wanders far away into the deep dark woods tonight")


def mk(op, seq, url, ts, text):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"), "text": text}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def oracle_pairs(lake) -> set:
    """Batch LSH pair set over the live LWW state — same kernels,
    driver-side."""
    live = lake.read_pandas().sort_values("url")
    if not len(live):
        return set()
    a, b = _perm_params(PARAMS["num_perm"], PARAMS["seed"])
    sigs = np.stack([
        minhash_signature(char_shingle_hashes(t or "",
                                              PARAMS["shingle_k"]), a, b)
        for t in live["text"].fillna("")])
    rows = _band_rows(live["url"].to_numpy(), sigs, PARAMS["bands"],
                      attach_sigs=True)
    out = set()
    for _, grp in rows.groupby(["band_id", "band_hash"], sort=False):
        if len(grp) < 2:
            continue
        grp = grp.sort_values("id")
        ids = grp["id"].to_numpy()
        s = np.stack([np.asarray(x, dtype=np.uint64)
                      for x in grp["minhash"]])
        ia, ib = np.triu_indices(len(ids), k=1)
        est = (s[ia] == s[ib]).mean(axis=1)
        for x, y, e in zip(ids[ia], ids[ib], est):
            if e >= PARAMS["threshold"]:
                out.add((x, y))
    return out


def got_pairs(idx) -> set:
    df = idx.pairs().to_pandas()
    return set(zip(df["a"], df["b"])) if len(df) else set()


def test_pairs_track_commits(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    idx = LakeMinHashIndex(lake, tmp_path / "mh", **PARAMS)

    # e0: two exact dups of BASE, one near dup, distinct filler
    e0 = [mk("insert", 0, "u0", 10, BASE),
          mk("insert", 1, "u1", 10, BASE),
          mk("insert", 2, "u2", 10, BASE.replace("lazy", "sleepy")),
          mk("insert", 3, "u3", 10, "completely different text about "
                                    "spacecraft navigation systems"),
          mk("insert", 4, "u4", 10, "yet another unrelated document on "
                                    "medieval cooking techniques")]
    # e1: update breaks u1 out of the dup cluster; new doc joins it
    e1 = [mk("update", 10, "u1", 20, "now a totally rewritten page "
                                     "about gardening in the winter"),
          mk("insert", 11, "u5", 20, BASE)]
    # e2: delete one side of a pair
    e2 = [mk("delete", 20, "u0", 30, None)]
    # e3: update that keeps the text IDENTICAL (band hashes cancel)
    e3 = [mk("update", 30, "u5", 40, BASE)]
    for i, ev in enumerate([e0, e1, e2, e3]):
        commit(lake, ev, i)
        idx.refresh()
        assert got_pairs(idx) == oracle_pairs(lake), f"epoch {i}"
    assert ("u0", "u1") not in got_pairs(idx)  # both left the cluster

    lake.truncate()
    idx.refresh()
    assert got_pairs(idx) == set()


def test_near_dups_admission(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    idx = LakeMinHashIndex(lake, tmp_path / "mh", **PARAMS)
    commit(lake, [mk("insert", 0, "u0", 10, BASE),
                  mk("insert", 1, "u1", 10, "unrelated filler text "
                                            "about deep sea creatures")],
           0)
    idx.refresh()
    hit = idx.near_dups([BASE, "nothing like anything stored here"])
    assert list(hit["query"]) == [0]
    assert list(hit["id"]) == ["u0"]
    assert hit["sim"].iloc[0] == 1.0
    # delete the match -> the probe must come back empty
    commit(lake, [mk("delete", 10, "u0", 20, None)], 1)
    idx.refresh()
    assert len(idx.near_dups([BASE])) == 0


def test_maintenance_cost_bound(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=8,
                     collect_changes=False)
    idx = LakeMinHashIndex(lake, tmp_path / "mh", **PARAMS)
    n = 200
    commit(lake, [mk("insert", i, f"u{i:03d}", 10,
                     f"document number {i} with its own words "
                     f"{i * 17 % 97} and {i * 31 % 89}")
                  for i in range(n)], 0)
    idx.refresh()
    commit(lake, [mk("update", 1000, "u005", 20, BASE)], 1)
    r = idx.refresh()
    scanned = r["applied"][-1]["rows_scanned"]
    # COW diff = old+new versions of ONE partition (~n/8 rows each),
    # never the corpus
    assert 0 < scanned < n, scanned
    assert got_pairs(idx) == oracle_pairs(lake)


def test_mor_compaction_resume(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     merge_on_read=True, collect_changes=False)
    idx = LakeMinHashIndex(lake, tmp_path / "mh", **PARAMS)
    commit(lake, [mk("insert", 0, "u0", 10, BASE),
                  mk("insert", 1, "u1", 10, BASE),
                  mk("insert", 2, "u2", 10, "other text entirely about "
                                            "mountain railway tunnels")],
           0)
    idx.refresh()
    assert got_pairs(idx) == oracle_pairs(lake)
    # churn at the delta-bearing head
    commit(lake, [mk("insert", 10, "u3", 20, BASE),
                  mk("delete", 11, "u1", 20, None)], 1)
    idx.refresh()
    assert got_pairs(idx) == oracle_pairs(lake)
    before = got_pairs(idx)
    # lake compaction folds a zero delta; index compaction folds
    # segments — neither may change answers
    lake.compact_deltas()
    idx.refresh()
    assert got_pairs(idx) == before
    idx.compact()
    assert got_pairs(idx) == before
    assert len(idx._live_segments()) == 1
    # resume: a fresh handle applies nothing new
    idx2 = LakeMinHashIndex(lake, tmp_path / "mh", **PARAMS)
    r = idx2.refresh()
    assert r["applied"] == []
    assert got_pairs(idx2) == before

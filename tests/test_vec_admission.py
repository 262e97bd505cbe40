"""Embedding dedup-at-ingest (state/annindex.commit_epoch_admitted):
the cosine admission gate over the maintained ANN index — vector
events near-duplicating a LIVE vector under a different key are
rejected at the door against the previous commit's state; a key's own
updates and deletes always pass; near-dups of DELETED vectors admit;
same-epoch dups both admit; replaying a committed epoch is a no-op."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from chomper_ray.state.annindex import LakeANNIndex, commit_epoch_admitted
from chomper_ray.state.lake import LakeTable

DIM = 8


def unit(i):
    v = np.zeros(DIM)
    v[i] = 1.0
    return v.tolist()


def near(i, j=None, eps=0.05):
    # cos(near(i), unit(i)) = 1/sqrt(1+eps^2) ~ 0.9988 at eps=0.05
    v = np.zeros(DIM)
    v[i] = 1.0
    v[(j if j is not None else (i + 1) % DIM)] += eps
    return v.tolist()


_SCHEMA = pa.schema([("op", pa.string()), ("seq", pa.int64()),
                     ("vec_id", pa.string()),
                     ("warc_ts", pa.timestamp("us")),
                     ("embedding", pa.list_(pa.float64()))])


def ev(op, seq, vid, ts, vec):
    return {"op": op, "seq": seq, "vec_id": vid,
            "warc_ts": pd.Timestamp(ts, unit="s").to_pydatetime(),
            "embedding": vec}


def write_epoch(log, e, rows):
    d = log / f"ep-{e}"
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows, schema=_SCHEMA),
                   d / "part-0.parquet")


def run_epochs(tmp_path, epochs, lake_name="lake", idx_name="ann",
               **kw):
    import ray.data as rd

    log = tmp_path / "log"
    for e, rows in enumerate(epochs):
        write_epoch(log, e, rows)
    lake = LakeTable(tmp_path / lake_name, key="vec_id",
                     num_partitions=4, collect_changes=False)
    idx = LakeANNIndex(lake, tmp_path / idx_name, n_cells=4,
                       seed=3)
    for e in range(len(epochs)):
        commit_epoch_admitted(
            lake, idx,
            rd.read_parquet(str(log / f"ep-{e}" / "part-0.parquet")),
            e, threshold=0.9, **kw)
    return lake, idx, log


def live_ids(lake):
    return set(lake.read_pandas()["vec_id"])


def test_vec_admission_end_to_end(tmp_path, ray_session):
    lake, idx, log = run_epochs(tmp_path, [
        [ev("insert", 0, "v0", 10, unit(0)),
         ev("insert", 1, "v1", 10, unit(1))],
        [ev("insert", 2, "d0", 20, near(0)),      # dups v0: drop
         ev("insert", 3, "n0", 20, unit(2)),      # distinct: admit
         ev("update", 4, "v0", 21, near(0, 3)),   # self-update: admit
         ev("delete", 5, "v1", 22, None)],        # deletes pass
    ])
    assert live_ids(lake) == {"v0", "n0"}
    # self-update landed (v0's vector moved)
    row = lake.read_pandas().set_index("vec_id").loc["v0"]
    assert abs(np.asarray(row["embedding"])[3] - 0.05) < 1e-12
    # the gate observed the commits: a fresh probe near v0 still hits
    hits = idx.near_vecs([near(0)], threshold=0.9)
    assert set(hits["key"]) == {"v0"}


def test_neardup_of_deleted_vector_admits(tmp_path, ray_session):
    lake, idx, _ = run_epochs(tmp_path, [
        [ev("insert", 0, "v0", 10, unit(0))],
        [ev("delete", 1, "v0", 20, None)],
        [ev("insert", 2, "w0", 30, near(0))],     # v0 dead: admit
    ])
    assert live_ids(lake) == {"w0"}


def test_same_epoch_neardups_both_admit(tmp_path, ray_session):
    lake, idx, _ = run_epochs(tmp_path, [
        [ev("insert", 0, "a0", 10, unit(0)),
         ev("insert", 1, "a1", 10, near(0))],     # same epoch: admit
        [ev("insert", 2, "a2", 20, unit(0))],     # next epoch: drop
    ])
    assert live_ids(lake) == {"a0", "a1"}


def test_vec_rejects_provenance(tmp_path, ray_session):
    from chomper_ray.state.dupindex import read_rejects

    lake, idx, _ = run_epochs(tmp_path, [
        [ev("insert", 0, "v0", 10, unit(0))],
        [ev("insert", 1, "d0", 20, near(0)),      # drop + log
         ev("insert", 2, "n0", 20, unit(1))],
    ], rejects_root=str(tmp_path / "rej"))
    df = read_rejects(tmp_path / "rej")
    assert list(df.columns) == ["vec_id", "dup_of", "sim", "epoch"]
    assert len(df) == 1
    row = df.iloc[0]
    assert (row["vec_id"], row["dup_of"], row["epoch"]) == ("d0", "v0", 1)
    assert row["sim"] >= 0.9


def test_replay_committed_epoch_noop(tmp_path, ray_session):
    import ray.data as rd

    lake, idx, log = run_epochs(tmp_path, [
        [ev("insert", 0, "v0", 10, unit(0))],
        [ev("insert", 1, "d0", 20, near(0)),
         ev("insert", 2, "n0", 20, unit(1))],
    ])
    before = live_ids(lake)
    c = commit_epoch_admitted(
        lake, idx,
        rd.read_parquet(str(log / "ep-1" / "part-0.parquet")), 1,
        threshold=0.9)
    assert c.skipped
    assert live_ids(lake) == before


def test_empty_index_gate_passes_everything(tmp_path, ray_session):
    # before any commit the index has no centroids/segments — epoch 0
    # admits unconditionally (there is nothing to duplicate)
    lake, idx, _ = run_epochs(tmp_path, [
        [ev("insert", 0, "x0", 10, unit(0)),
         ev("insert", 1, "x1", 10, near(0))],     # same-epoch: admit
    ])
    assert live_ids(lake) == {"x0", "x1"}
    # and the refreshed index now answers probes
    assert set(idx.near_vecs([unit(0)], threshold=0.9)["key"]) \
        == {"x0", "x1"}


def test_pruned_probe_subsets_exhaustive(tmp_path, ray_session):
    lake, idx, _ = run_epochs(tmp_path, [
        [ev("insert", i, f"v{i}", 10, unit(i)) for i in range(6)],
    ])
    q = [near(2)]
    full = set(idx.near_vecs(q, threshold=0.9)["key"])
    pruned = set(idx.near_vecs(q, threshold=0.9, nprobe=1)["key"])
    assert pruned <= full and full == {"v2"}

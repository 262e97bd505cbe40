"""Dedup-at-ingest (state/dupindex.run_cdc_admitted): the near-dup
admission gate composed into the CDC loop — near-dup NEW docs are
rejected at the door against the previous commit's live state, a doc's
own updates and deletes always pass, same-epoch dups both admit
(epoch-granularity semantics), and the run stays idempotent."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from chomper_ray.state.dupindex import LakeMinHashIndex, run_cdc_admitted
from chomper_ray.state.lake import LakeTable

BASE = ("the quick brown fox jumps over the lazy dog and then "
        "wanders far away into the deep dark woods tonight")
NEAR = BASE.replace("lazy", "sleepy")
OTHER = ("completely different text about spacecraft navigation "
         "systems and orbital mechanics for long duration missions")
OTHER2 = ("yet another unrelated document describing deep sea "
          "creatures and their bioluminescent displays after dark")

IDX = dict(num_perm=32, bands=8, shingle_k=4, seed=7,
           num_partitions=8, threshold=0.5)

_SCHEMA = pa.schema([("op", pa.string()), ("epoch", pa.int64()),
                     ("seq", pa.int64()), ("url", pa.string()),
                     ("warc_ts", pa.timestamp("us")),
                     ("html", pa.binary())])


def ev(op, seq, url, ts, text, epoch):
    html = (f"<html><body>{text}</body></html>".encode()
            if text is not None else None)
    return {"op": op, "epoch": epoch, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s").to_pydatetime(),
            "html": html}


def write_log(log_dir, epochs):
    for e, rows in enumerate(epochs):
        d = log_dir / f"epoch={e:06d}"
        d.mkdir(parents=True, exist_ok=True)
        pq.write_table(pa.Table.from_pylist(rows, schema=_SCHEMA),
                       d / "part-0.parquet")


def live_texts(lake_root, num_partitions):
    df = LakeTable(lake_root, num_partitions=num_partitions) \
        .read_pandas().sort_values("url")
    return dict(zip(df["url"], df["text"]))


def test_admission_end_to_end(tmp_path, ray_session):
    log = tmp_path / "log"
    write_log(log, [
        [ev("insert", 0, "u0", 10, BASE, 0),
         ev("insert", 1, "u1", 10, OTHER, 0)],
        [ev("insert", 2, "u2", 20, NEAR, 1),        # near-dups u0: drop
         ev("insert", 3, "u3", 20, OTHER2, 1),      # distinct: admit
         ev("update", 4, "u0", 21, BASE + " updated slightly", 1),
         ev("delete", 5, "u1", 22, None, 1)],       # deletes pass
    ])
    res, idx = run_cdc_admitted(log, tmp_path / "lake", tmp_path / "mh",
                                num_partitions=4, index_kwargs=IDX,
                                drain=True)  # forced sequential
    assert res.epochs_run == [0, 1]
    live = live_texts(tmp_path / "lake", 4)
    assert set(live) == {"u0", "u3"}          # u2 rejected, u1 deleted
    assert "updated slightly" in live["u0"]   # self-update admitted
    # the gate observed epoch 1's commit: a fresh NEAR probe still hits
    # u0's updated text (they remain near-dups)
    hits = idx.near_dups([NEAR])
    assert "u0" in set(hits["id"])
    # idempotent re-entry: nothing replays, state unchanged
    res2, _ = run_cdc_admitted(log, tmp_path / "lake", tmp_path / "mh",
                               num_partitions=4, index_kwargs=IDX)
    assert res2.epochs_run == []
    assert live_texts(tmp_path / "lake", 4) == live


def test_same_epoch_neardups_both_admitted(tmp_path, ray_session):
    log = tmp_path / "log"
    write_log(log, [
        [ev("insert", 0, "a0", 10, BASE, 0),
         ev("insert", 1, "a1", 10, NEAR, 0)],       # same epoch: admit
        [ev("insert", 2, "a2", 20, BASE, 1)],       # next epoch: drop
    ])
    res, idx = run_cdc_admitted(log, tmp_path / "lake", tmp_path / "mh",
                                num_partitions=4, index_kwargs=IDX)
    assert res.epochs_run == [0, 1]
    assert set(live_texts(tmp_path / "lake", 4)) == {"a0", "a1"}
    # and the maintained pair set sees the admitted same-epoch pair
    pairs = idx.pairs().to_pandas()
    assert ("a0", "a1") in set(zip(pairs["a"], pairs["b"]))


def test_rejects_provenance_log(tmp_path, ray_session):
    from chomper_ray.state.dupindex import read_rejects

    log = tmp_path / "log"
    write_log(log, [
        [ev("insert", 0, "u0", 10, BASE, 0),
         ev("insert", 1, "u1", 10, OTHER, 0)],
        [ev("insert", 2, "u2", 20, NEAR, 1),        # dups u0: drop+log
         ev("insert", 3, "u3", 20, OTHER2, 1)],     # distinct: no log
    ])
    rej_root = tmp_path / "rej"
    res, idx = run_cdc_admitted(log, tmp_path / "lake", tmp_path / "mh",
                                num_partitions=4, index_kwargs=IDX,
                                rejects_root=str(rej_root))
    assert res.epochs_run == [0, 1]
    df = read_rejects(rej_root)
    assert list(df.columns) == ["url", "dup_of", "sim", "epoch"]
    assert len(df) == 1
    row = df.iloc[0]
    assert (row["url"], row["dup_of"], row["epoch"]) == ("u2", "u0", 1)
    assert row["sim"] >= IDX["threshold"]
    # idempotent re-entry: committed epochs skip, the log is untouched
    run_cdc_admitted(log, tmp_path / "lake", tmp_path / "mh",
                     num_partitions=4, index_kwargs=IDX,
                     rejects_root=str(rej_root))
    assert read_rejects(rej_root).equals(df)
    # empty log reads as a typed empty frame
    assert read_rejects(tmp_path / "nothing").empty


def test_tail_mode_gate_spans_polls(tmp_path, ray_session):
    # tail=True: the gated loop drains what exists, then a later poll
    # (here: a second bounded tail call after new epochs land) judges
    # new events against everything the earlier polls admitted.
    log = tmp_path / "log"
    write_log(log, [
        [ev("insert", 0, "t0", 10, BASE, 0)],
        [ev("insert", 1, "t1", 20, NEAR, 1),        # dups t0: drop
         ev("insert", 2, "t2", 20, OTHER, 1)],
    ])
    res, _ = run_cdc_admitted(log, tmp_path / "lake", tmp_path / "mh",
                              num_partitions=4, index_kwargs=IDX,
                              tail=True, max_idle_polls=1,
                              poll_interval_s=0.01)
    assert res.epochs_run == [0, 1]
    assert set(live_texts(tmp_path / "lake", 4)) == {"t0", "t2"}
    # new epoch appears; the next tail run resumes from the cursor and
    # its gate reflects the prior polls' live state
    d = log / "epoch=000002"
    d.mkdir(parents=True)
    pq.write_table(pa.Table.from_pylist(
        [ev("insert", 3, "t3", 30, OTHER.replace(
            "spacecraft", "satellite"), 2),              # dups t2: drop
         ev("insert", 4, "t4", 30, OTHER2, 2)], schema=_SCHEMA),
        d / "part-0.parquet")
    res2, _ = run_cdc_admitted(log, tmp_path / "lake", tmp_path / "mh",
                               num_partitions=4, index_kwargs=IDX,
                               tail=True, max_idle_polls=1,
                               poll_interval_s=0.01)
    assert res2.epochs_run == [2]
    assert set(live_texts(tmp_path / "lake", 4)) == {"t0", "t2", "t4"}


def test_gate_catches_up_on_preexisting_lake(tmp_path, ray_session):
    # epoch 0 ingested WITHOUT the gate; the admitted run's entry
    # refresh() folds it before judging epoch 1
    from chomper_ray.pipelines.cdc import run_cdc

    log = tmp_path / "log"
    write_log(log, [
        [ev("insert", 0, "b0", 10, BASE, 0)],
        [ev("insert", 1, "b1", 20, NEAR, 1),        # dups b0: drop
         ev("insert", 2, "b2", 20, OTHER, 1)],
    ])
    run_cdc(log, tmp_path / "lake", num_partitions=4, max_epochs=1)
    res, _ = run_cdc_admitted(log, tmp_path / "lake", tmp_path / "mh",
                              num_partitions=4, index_kwargs=IDX)
    assert res.epochs_run == [1]
    assert set(live_texts(tmp_path / "lake", 4)) == {"b0", "b2"}

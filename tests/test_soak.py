"""Long-run continuous-tail soak: 52 log epochs drained in chunks with
purge/compact maintenance commits interleaved MID-STREAM and a
concurrent-runner burst — the final live state must hash-equal a plain
sequential replay of the same log.

This is the scenario the log-epoch/commit-id decoupling exists for: a
maintenance commit between tail polls advances the manifest chain but
must never advance the binlog cursor past unapplied log epochs.
"""

import shutil
import threading

import pyarrow.compute as pc
import pyarrow.parquet as pq

from chomper_ray.pipelines.cdc import run_cdc
from chomper_ray.sources import events as ev
from chomper_ray.state.lake import LakeTable, snapshot_content_hash


def _live_hash(root):
    df = LakeTable(root).read_pandas(include_deleted=False,
                                     include_internal=True)
    return snapshot_content_hash(df, "url"), len(df)


def test_soak_tail_with_interleaved_maintenance(tmp_path):
    full_log = tmp_path / "full_log"
    ev.generate_change_stream(full_log, n_events=2600, n_urls=260,
                              n_epochs=52, seed=11, evolution_epoch=20)
    epochs = ev.list_epochs(full_log)
    assert len(epochs) == 52

    # Safe purge watermark while the tail is mid-stream: the producer
    # contract is "no future event carries warc_ts <= watermark", which
    # for a fully materialized log is the min warc_ts over REMAINING
    # epochs (ooo_frac makes this genuinely lower than the current head).
    epoch_min_ts = {}
    for e in epochs:
        m = None
        for f in ev.epoch_files(full_log, e):
            v = pc.min(pq.read_table(f, columns=["warc_ts"])["warc_ts"]).value
            m = v if m is None else min(m, v)
        epoch_min_ts[e] = m
    wm_after = {}
    running = None
    for e in reversed(epochs):
        wm_after[e] = running  # min over epochs strictly AFTER e
        running = epoch_min_ts[e] if running is None \
            else min(running, epoch_min_ts[e])

    # sequential replay baseline: no maintenance, one clean drain
    baseline = tmp_path / "baseline"
    res = run_cdc(full_log, baseline, num_partitions=4, drain=True)
    assert res.epochs_run == epochs

    # soak: reveal the log four epochs at a time; purge / compact between
    # polls; one chunk is raced by two concurrent runners
    live_log = tmp_path / "live_log"
    live_log.mkdir()
    lake_root = tmp_path / "lake"
    chunks = [epochs[i:i + 4] for i in range(0, len(epochs), 4)]
    for ci, chunk in enumerate(chunks):
        for e in chunk:
            shutil.copytree(full_log / f"epoch={e:06d}",
                            live_log / f"epoch={e:06d}")
        if ci == 6:
            errs = []

            def tail_once():
                try:
                    run_cdc(live_log, lake_root, num_partitions=4, drain=True)
                except Exception as exc:  # pragma: no cover - fail below
                    errs.append(exc)

            racers = [threading.Thread(target=tail_once) for _ in range(2)]
            for t in racers:
                t.start()
            for t in racers:
                t.join()
            assert not errs
        else:
            run_cdc(live_log, lake_root, num_partitions=4, drain=True)
        lake = LakeTable(lake_root)
        assert lake.last_applied_log_epoch() == chunk[-1]
        if ci % 3 == 1 and wm_after[chunk[-1]] is not None:
            lake.purge_tombstones(watermark_ts_us=int(wm_after[chunk[-1]]))
        elif ci % 3 == 2:
            lake.compact(keep_epochs=3)

    lake = LakeTable(lake_root)
    assert lake.last_applied_log_epoch() == epochs[-1]
    # maintenance commits occupied chain ids beyond the last log epoch
    assert lake.last_committed_epoch() > epochs[-1]
    # final full-history purge must not disturb live rows
    r = lake.purge_tombstones(watermark_ts_us=10**18)
    assert not r.skipped and r.rows_deleted > 0

    soak = _live_hash(lake_root)
    base = _live_hash(baseline)
    assert soak == base

"""Continuous tail, hot-key skew handling, and the CLI surface."""

import json
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from chomper_ray.pipelines.cdc import run_cdc, tail_cdc
from chomper_ray.sources import events as ev
from chomper_ray.state.lake import LakeTable


def test_tail_commits_new_epochs_then_drains(tmp_path):
    log = tmp_path / "log"
    ev.generate_change_stream(log, n_events=600, n_urls=150, n_epochs=2, seed=5)
    lake_root = tmp_path / "lake"
    res = tail_cdc(log, lake_root, poll_interval_s=0.05, max_idle_polls=2,
                   num_partitions=4)
    assert res.epochs_run == [0, 1]
    # append a new epoch to the log → a fresh tail picks it up from cursor
    ev.generate_change_stream(tmp_path / "log2", n_events=900, n_urls=150,
                              n_epochs=3, seed=5)
    import shutil
    shutil.copytree(tmp_path / "log2" / "epoch=000002", log / "epoch=000002")
    res2 = tail_cdc(log, lake_root, poll_interval_s=0.05, max_idle_polls=2,
                    num_partitions=4)
    assert res2.epochs_run == [2]
    assert LakeTable(lake_root, num_partitions=4).last_committed_epoch() == 2


def test_hot_key_skew_correct_and_combined(tmp_path):
    """50% of events hit ONE url: the per-block partial reduce (combiner ≡
    salting) must bound what reaches the merge, and the final state must
    still be the global LWW winner."""
    import ray.data as rd

    n = 20_000
    rng = np.random.default_rng(1)
    hot = rng.random(n) < 0.5
    urls = np.where(hot, "https://hot.example.com/page",
                    np.array([f"https://c{i % 500}.com/p" for i in range(n)]))
    t = pa.table({
        "op": pa.array(np.where(rng.random(n) < 0.02, "delete", "update")),
        "seq": pa.array(np.arange(n, dtype=np.int64)),
        "url": pa.array(urls.astype(str)),
        "warc_ts": pa.array(rng.integers(0, 10**9, n), type=pa.timestamp("us")),
        "text": pa.array([f"t{i}" for i in range(n)]),
        "lang": pa.array(["en"] * n),
    })
    lake = LakeTable(tmp_path / "lake", num_partitions=8)
    ds = rd.from_arrow(t).repartition(16)
    lake.commit_epoch(ds, 0)

    # oracle winner for the hot key
    df = t.to_pandas()
    win = df.sort_values(["warc_ts", "seq"]).groupby("url").tail(1) \
        .set_index("url").loc["https://hot.example.com/page"]
    got = lake.read_pandas(include_deleted=True, include_internal=True) \
        .set_index("url").loc["https://hot.example.com/page"]
    assert int(got["_seq"]) == int(win["seq"])
    assert bool(got["_deleted"]) == (win["op"] == "delete")
    # partition sizes bounded: no partition ends up with the raw hot volume
    lin = lake.lineage()
    assert lin["events_in"].max() < n / 2  # combiner collapsed the hot key


def test_cli_generate_run_status(tmp_path):
    log = tmp_path / "log"
    lake = tmp_path / "lake"
    env = {"PYTHONPATH": "/root/repo"}
    import os

    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    out = subprocess.run(
        [sys.executable, "-m", "chomper_ray.cli", "generate",
         "--out-dir", str(log), "--n-events", "400", "--n-urls", "100",
         "--n-epochs", "1"],
        capture_output=True, text=True, env=env, check=True)
    assert json.loads(out.stdout)["log_dir"] == str(log)

    out = subprocess.run(
        [sys.executable, "-m", "chomper_ray.cli", "run-cdc",
         "--log-dir", str(log), "--lake-root", str(lake),
         "--num-partitions", "2"],
        capture_output=True, text=True, env=env, check=True, timeout=300)
    r = json.loads(out.stdout.strip().splitlines()[-1])
    assert r["epochs_run"] == [0] and r["events_applied"] == 400

    out = subprocess.run(
        [sys.executable, "-m", "chomper_ray.cli", "status",
         "--lake-root", str(lake)],
        capture_output=True, text=True, env=env, check=True)
    st = json.loads(out.stdout)
    assert st["last_committed_epoch"] == 0 and st["live_rows"] > 0


def test_cli_compact_and_purge(tmp_path):
    import os

    log = tmp_path / "log"
    lake = tmp_path / "lake"
    env = {**os.environ, "PYTHONPATH": "/root/repo"}

    def cli(*args, timeout=300):
        out = subprocess.run([sys.executable, "-m", "chomper_ray.cli", *args],
                             capture_output=True, text=True, env=env,
                             check=True, timeout=timeout)
        return json.loads(out.stdout.strip().splitlines()[-1])

    cli("generate", "--out-dir", str(log), "--n-events", "500",
        "--n-urls", "80", "--n-epochs", "2")
    cli("run-cdc", "--log-dir", str(log), "--lake-root", str(lake),
        "--num-partitions", "2")

    # purge with a far-future watermark drops every tombstone
    r = cli("purge", "--lake-root", str(lake), "--epoch", "10",
            "--watermark-ts-us", str(10**18))
    assert not r["skipped"] and r["live_rows"] > 0
    # idempotent
    assert cli("purge", "--lake-root", str(lake), "--epoch", "10",
               "--watermark-ts-us", str(10**18))["skipped"]

    # compact drops snapshots no retained manifest references
    r = cli("compact", "--lake-root", str(lake), "--keep-epochs", "1")
    assert r["removed_files"] >= 1
    st = cli("status", "--lake-root", str(lake))
    assert st["live_rows"] > 0  # table still readable after GC


def test_cli_envelope_source(tmp_path):
    # generate --format envelope writes JSONL + registry sidecars; the
    # parquet twin under _source must replay to the same snapshot hash
    import os

    env = {**os.environ, "PYTHONPATH": "/root/repo"}

    def cli(*args, timeout=300):
        out = subprocess.run([sys.executable, "-m", "chomper_ray.cli",
                              *args], capture_output=True, text=True,
                             env=env, check=True, timeout=timeout)
        return json.loads(out.stdout.strip().splitlines()[-1])

    log = tmp_path / "envlog"
    r = cli("generate", "--out-dir", str(log), "--n-events", "500",
            "--n-urls", "120", "--n-epochs", "2", "--format", "envelope")
    assert r["format"] == "envelope"
    assert (log / "epoch=000000" / "_schema.json").exists()

    r = cli("run-cdc", "--log-dir", str(log), "--lake-root",
            str(tmp_path / "lake_env"), "--num-partitions", "2",
            "--source", "envelope")
    assert r["epochs_run"] == [0, 1] and r["events_applied"] == 500
    r = cli("run-cdc", "--log-dir", str(log / "_source"), "--lake-root",
            str(tmp_path / "lake_pq"), "--num-partitions", "2")
    assert r["epochs_run"] == [0, 1]

    from chomper_ray.state.lake import LakeTable

    assert (LakeTable(tmp_path / "lake_env", num_partitions=2)
            .snapshot_hash() ==
            LakeTable(tmp_path / "lake_pq", num_partitions=2)
            .snapshot_hash())


def test_cli_backfill_chunks_and_resume(tmp_path):
    import os

    env = {**os.environ, "PYTHONPATH": "/root/repo"}

    def cli(*args, timeout=300):
        out = subprocess.run([sys.executable, "-m", "chomper_ray.cli",
                              *args], capture_output=True, text=True,
                             env=env, check=True, timeout=timeout)
        return json.loads(out.stdout.strip().splitlines()[-1])

    log, lake = tmp_path / "log", tmp_path / "lake"
    cli("generate", "--out-dir", str(log), "--n-events", "600",
        "--n-urls", "150", "--n-epochs", "2")
    cli("run-cdc", "--log-dir", str(log), "--lake-root", str(lake),
        "--num-partitions", "4", "--drain")

    r = cli("backfill", "--lake-root", str(lake), "--id", "tok-v1",
            "--max-partitions", "2", "--max-chunks", "1")
    assert len(r["chunks"]) == 1 and r["pending_after"] == [2, 3]
    r = cli("backfill", "--lake-root", str(lake), "--id", "tok-v1",
            "--max-partitions", "2")
    assert r["pending_after"] == []
    r = cli("backfill", "--lake-root", str(lake), "--id", "tok-v1")
    assert r["chunks"] == []  # idempotent

    st = cli("status", "--lake-root", str(lake))
    assert "n_tokens" in [c["name"] for c in st["schema"]]
    # maintenance commits moved the chain head, never the cursor
    assert st["last_applied_log_epoch"] == 1
    assert st["last_committed_epoch"] > 1


def test_cli_multi_table(tmp_path):
    import os

    env = {**os.environ, "PYTHONPATH": "/root/repo"}

    def cli(*args, timeout=300):
        out = subprocess.run([sys.executable, "-m", "chomper_ray.cli",
                              *args], capture_output=True, text=True,
                             env=env, check=True, timeout=timeout)
        return json.loads(out.stdout.strip().splitlines()[-1])

    log = tmp_path / "mlog"
    cli("generate", "--out-dir", str(log), "--n-events", "600",
        "--n-urls", "150", "--n-links", "200", "--n-epochs", "2",
        "--format", "multi")
    r = cli("run-cdc-multi", "--log-dir", str(log), "--root",
            str(tmp_path / "lakes"), "--num-partitions", "2")
    assert set(r) == {"pages", "links"}
    assert r["pages"]["epochs_run"] == r["links"]["epochs_run"] == [0, 1]
    assert (r["pages"]["events_applied"]
            + r["links"]["events_applied"]) == 600
    # replay no-op per table
    r2 = cli("run-cdc-multi", "--log-dir", str(log), "--root",
             str(tmp_path / "lakes"), "--num-partitions", "2")
    assert all(v["epochs_run"] == [] for v in r2.values())

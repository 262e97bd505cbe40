"""CLI surfaces added in round-4 session 13 — one end-to-end subprocess
flow: ingest → derive → branch → export-changes (+prune) → envelope
replay — each command's JSON contract and idempotent rerun pinned."""

import json
import subprocess
import sys


def cli(*args, timeout=300, expect_rc=0):
    out = subprocess.run(
        [sys.executable, "-m", "chomper_ray.cli", *args],
        capture_output=True, text=True, timeout=timeout)
    assert out.returncode == expect_rc, out.stderr[-2000:]
    if expect_rc:
        return out.stderr
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_round4_cli_flow(tmp_path):
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    cli("generate", "--out-dir", log, "--n-events", "600",
        "--n-urls", "150", "--n-epochs", "2")
    r = cli("run-cdc", "--log-dir", log, "--lake-root", lake,
            "--num-partitions", "3", "--export-bus",
            str(tmp_path / "bus"))
    assert r["epochs_run"] == [0, 1]

    # derive: idempotent refresh with its own cursor
    d1 = cli("derive", "--lake-root", lake, "--derived-root",
             str(tmp_path / "docs"), "--num-partitions", "2")
    assert d1["commits_applied"] == [0, 1] and d1["live_rows"] > 0
    d2 = cli("derive", "--lake-root", lake, "--derived-root",
             str(tmp_path / "docs"))
    assert d2["commits_applied"] == [] and \
        d2["live_rows"] == d1["live_rows"]

    # branch: zero-copy fork at head, status reads it
    b = cli("branch", "--lake-root", lake, "--dest",
            str(tmp_path / "fork"))
    assert b["fork_epoch"] == 1 and b["log_cursor"] == 1
    st = cli("status", "--lake-root", str(tmp_path / "fork"))
    assert st["last_applied_log_epoch"] == 1 and st["live_rows"] > 0

    # export-changes already streamed via --export-bus: rerun is a noop
    e = cli("export-changes", "--lake-root", lake, "--out-dir",
            str(tmp_path / "bus"))
    assert e["exported_epochs"] == [] and e["cursor"] == 1

    # replay the bus -> same snapshot hash as the source lake
    cli("run-cdc", "--log-dir", str(tmp_path / "bus"), "--lake-root",
        str(tmp_path / "replay"), "--num-partitions", "3",
        "--source", "envelope")
    src = cli("status", "--lake-root", lake)
    rep = cli("status", "--lake-root", str(tmp_path / "replay"))
    assert rep["live_rows"] == src["live_rows"]

    # retention: prune consumed epochs; a FRESH consumer refuses loudly
    pr = cli("export-changes", "--lake-root", lake, "--out-dir",
             str(tmp_path / "bus"), "--prune-before", "2")
    assert pr["prune"]["removed_epochs"] == [0, 1]
    err = cli("run-cdc", "--log-dir", str(tmp_path / "bus"),
              "--lake-root", str(tmp_path / "late"),
              "--num-partitions", "3", "--source", "envelope",
              expect_rc=1)
    assert "pruned below" in err

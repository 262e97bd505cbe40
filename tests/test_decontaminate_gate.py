"""Decontamination-at-ingest (stages/dedup.py decontamination_gate):
events sharing any token n-gram with a fixed benchmark set are dropped
at the lake door via run_cdc's epoch_transform hook — a contaminated
UPDATE must leave the older clean version live, deletes (no text) must
always apply, and the gate's effect must equal post-hoc filtering of
the event stream (the property the SQL oracle replays)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from chomper_ray.stages.dedup import decontamination_gate
from chomper_ray.state.lake import LakeTable

BENCH = ["the quick brown fox jumps over the lazy dog",
         "pack my box with five dozen liquor jugs"]


def bench_ds():
    return rd.from_arrow(pa.table({"text": pa.array(BENCH)}))


def tbl(rows):
    return pa.Table.from_pylist(rows)


def ev(op, seq, url, ts, text):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"), "text": text}


def test_gate_drops_only_contaminated(ray_session):
    gate = decontamination_gate(bench_ds(), n=5)
    batch = tbl([
        ev("insert", 0, "a", 10, "totally clean text with no overlap"),
        # contains a benchmark 5-gram verbatim
        ev("insert", 1, "b", 10, "intro quick brown fox jumps over outro"),
        ev("insert", 2, "c", 10, None),          # null text: never hit
        ev("delete", 3, "d", 10, None),
    ])
    out = gate(batch)
    assert out["url"].to_pylist() == ["a", "c", "d"]
    # 4-token overlap is below the 5-gram bar
    ok = gate(tbl([ev("insert", 4, "e", 10,
                      "quick brown fox jumps somewhere else")]))
    assert ok.num_rows == 1


def test_gate_lww_fallback_and_deletes(tmp_path, ray_session):
    gate = decontamination_gate(bench_ds(), n=5)
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    e0 = tbl([ev("insert", 0, "u1", 10, "clean version one"),
              ev("insert", 1, "u2", 10, "another clean page")])
    lake.commit_epoch(rd.from_arrow(gate(e0)), 0)
    # contaminated update to u1 is rejected -> version-10 row stays live
    e1 = tbl([ev("update", 10, "u1", 20,
                 "now with five dozen liquor jugs inside this text"),
              ev("update", 11, "u2", 20, "clean update applies"),
              ev("delete", 12, "u2", 30, None)])
    lake.commit_epoch(rd.from_arrow(gate(e1)), 1)
    live = lake.read_pandas().sort_values("url")
    assert live["url"].tolist() == ["u1"]
    assert live["text"].tolist() == ["clean version one"]


def test_gate_empty_benchmark_passthrough(ray_session):
    gate = decontamination_gate(
        rd.from_arrow(pa.table({"text": pa.array([], type=pa.string())})),
        n=5)
    batch = tbl([ev("insert", 0, "a", 10, BENCH[0])])
    assert gate(batch).num_rows == 1


def test_cli_decontaminate_flag(tmp_path):
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    def cli(*args, expect_rc=0):
        out = subprocess.run(
            [sys.executable, "-m", "chomper_ray.cli", *args],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == expect_rc, out.stderr[-2000:]
        if expect_rc:
            return out.stderr
        return json.loads(out.stdout.strip().splitlines()[-1])

    log = str(tmp_path / "log")
    cli("generate", "--out-dir", log, "--n-events", "400",
        "--n-urls", "100", "--n-epochs", "2")
    plain = cli("run-cdc", "--log-dir", log,
                "--lake-root", str(tmp_path / "plain"),
                "--num-partitions", "2")
    # benchmark = the header 2-gram ("at", "<url>\nEntry") every
    # version of exactly ONE page carries — a surgical eval-set hit
    snaps = [f for f in sorted((tmp_path / "plain").rglob("*.parquet"))
             if "text" in pq.ParquetFile(f).schema_arrow.names]
    url = pq.read_table(snaps[0], columns=["url"])["url"][0].as_py()
    bench_p = str(tmp_path / "bench.parquet")
    pq.write_table(pa.table({"text": pa.array([f"at {url}\nEntry"])}),
                   bench_p)

    gated = cli("run-cdc", "--log-dir", log,
                "--lake-root", str(tmp_path / "gated"),
                "--num-partitions", "2",
                "--decontaminate", bench_p,
                "--decontaminate-ngram", "2")
    assert gated["epochs_run"] == plain["epochs_run"] == [0, 1]
    g_rows = cli("status", "--lake-root",
                 str(tmp_path / "gated"))["live_rows"]
    p_rows = cli("status", "--lake-root",
                 str(tmp_path / "plain"))["live_rows"]
    assert g_rows == p_rows - 1  # exactly the benchmark page rejected
    # composing with the near-dup gate is a loud argparse error
    err = cli("run-cdc", "--log-dir", log,
              "--lake-root", str(tmp_path / "x"),
              "--decontaminate", bench_p,
              "--near-dup-index", str(tmp_path / "mh"), expect_rc=2)
    assert "compose them in Python" in err

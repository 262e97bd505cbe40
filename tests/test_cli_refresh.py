"""`run-cdc --refresh KIND:DIR` — per-commit derived maintenance wired
into the ingest loop from the CLI: each listed structure follows the
feed commit-by-commit, reruns are no-ops, and the standalone refresh
commands see the in-loop segments as already applied (same machinery,
same cursors)."""

import json
import subprocess
import sys


def cli(*args, expect_rc=0):
    out = subprocess.run(
        [sys.executable, "-m", "chomper_ray.cli", *args],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == expect_rc, out.stderr[-2000:]
    if expect_rc:
        return out.stderr
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_run_cdc_refresh_composition(tmp_path):
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    cli("generate", "--out-dir", log, "--n-events", "600",
        "--n-urls", "150", "--n-epochs", "2")
    specs = [f"text-index:{tmp_path / 'tix'}",
             f"domain-matview:{tmp_path / 'mv'}",
             f"sorted-layout:{tmp_path / 'srt'}",
             f"shuffled-export:{tmp_path / 'shx'}",
             f"minhash-index:{tmp_path / 'mh'}"]
    args = []
    for sp in specs:
        args += ["--refresh", sp]
    r = cli("run-cdc", "--log-dir", log, "--lake-root", lake,
            "--num-partitions", "3", *args)
    assert r["epochs_run"] == [0, 1]
    # every structure folded both commits from inside the loop
    assert all(r["refreshed"][s] == [0, 1] for s in specs)

    # rerun: ingest is a no-op and so is every refresh
    r2 = cli("run-cdc", "--log-dir", log, "--lake-root", lake, *args)
    assert r2["epochs_run"] == [] and \
        all(r2["refreshed"][s] == [] for s in specs)

    # the standalone commands see the in-loop work as already applied
    mv = cli("matview-refresh", "--lake-root", lake,
             "--view-root", str(tmp_path / "mv"))
    assert mv["commits_applied"] == [] and mv["n_pages"] > 0
    lr = cli("layout-refresh", "--lake-root", lake,
             "--layout-root", str(tmp_path / "srt"))
    assert lr["commits_applied"] == [] and lr["rows"] > 0

    # malformed / unknown specs are loud argparse errors
    err = cli("run-cdc", "--log-dir", log, "--lake-root", lake,
              "--refresh", "text-index", expect_rc=2)
    assert "KIND:DIR" in err
    err = cli("run-cdc", "--log-dir", log, "--lake-root", lake,
              "--refresh", f"bogus:{tmp_path / 'x'}", expect_rc=2)
    assert "unknown kind" in err
    # a repeated KIND:DIR would double-refresh while silently collapsing
    # into one reported entry — rejected up front (round-4 ADVICE 4)
    err = cli("run-cdc", "--log-dir", log, "--lake-root", lake,
              "--refresh", specs[0], "--refresh", specs[0], expect_rc=2)
    assert "duplicate spec" in err

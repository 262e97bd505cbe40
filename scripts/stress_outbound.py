"""Outbound-CDC export cost at the 100-TB shape — small commits into a
big table, the envelope bus kept in sync per commit.

  base: N rows committed once; epoch-0 export pays O(corpus) (every
  key is a 'c' envelope — the bootstrap)
  then K update epochs of M rows each, exporting after every commit:
    - wire volume: envelopes per epoch must be ~M (the changed keys),
      NEVER ~N — the signed diff cancels co-located untouched keys
    - wall: COW scans the touched partitions' two sides; MOR scans
      only the commit's keys — same bounds as derived tables
  exactness: re-ingesting the full bus reproduces the source lake's
  LWW live state (frame compare).

Usage: python scripts/stress_outbound.py [n_base] [n_update] [n_epochs]
       [num_cpus]   (defaults 2_000_000 5_000 3 32)
"""

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LANGS = np.array(["en", "de", "fr", "es"], dtype=object)


def make_rows(rng, seqs, urls, ts):
    n = len(urls)
    text = np.array(["x" * int(k) for k in rng.integers(20, 200, n)],
                    dtype=object)
    return pa.table({
        "op": pa.array(["update"] * n),
        "seq": pa.array(seqs, type=pa.int64()),
        "url": pa.array(urls),
        "warc_ts": pa.array([pd.Timestamp(ts, unit="s")] * n),
        "lang": pa.array(LANGS[rng.integers(0, len(LANGS), n)]),
        "text": pa.array(text),
    })


def run_mode(mode: str, n_base: int, n_update: int, n_epochs: int) -> dict:
    import ray.data as rd

    from chomper_ray.state.lake import LakeTable
    from chomper_ray.state.outbound import LakeChangeExporter

    rng = np.random.default_rng(13)
    root = Path(tempfile.mkdtemp(prefix=f"outbound_stress_{mode}_"))
    kw = {"merge_on_read": True} if mode == "mor" else {}
    lake = LakeTable(root / "lake", key="url", num_partitions=32,
                     collect_changes=False, **kw)
    urls = np.array([f"u{i:08d}" for i in range(n_base)], dtype=object)
    lake.commit_epoch(
        rd.from_arrow(make_rows(rng, np.arange(n_base), urls, 10)), 0)
    ex = LakeChangeExporter(lake, root / "bus")
    t0 = time.perf_counter()
    bootstrap = ex.export()
    bootstrap_s = time.perf_counter() - t0

    epochs = []
    for e in range(1, n_epochs + 1):
        upd = rng.choice(n_base, size=n_update, replace=False)
        lake.commit_epoch(
            rd.from_arrow(make_rows(
                rng, 10_000_000 * e + np.arange(n_update),
                urls[upd], 10 + e)), e)
        t0 = time.perf_counter()
        res = ex.export()
        epochs.append({"export_s": round(time.perf_counter() - t0, 3),
                       "envelopes": res["events"]})
    out = {
        "bootstrap_s": round(bootstrap_s, 3),
        "bootstrap_envelopes": bootstrap["events"],
        "epochs": epochs,
        "mean_export_s": round(
            float(np.mean([x["export_s"] for x in epochs])), 3),
        "mean_envelopes": int(
            np.mean([x["envelopes"] for x in epochs])),
    }
    shutil.rmtree(root, ignore_errors=True)
    return out


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_update = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    n_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    num_cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    import ray

    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # roundtrip exactness at a small scale first (cheap, per-run)
    import ray.data as rd

    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.sources import envelopes
    from chomper_ray.state.lake import LakeTable
    from chomper_ray.state.outbound import LakeChangeExporter

    rng = np.random.default_rng(5)
    small = Path(tempfile.mkdtemp(prefix="outbound_rt_"))
    lk = LakeTable(small / "lake", key="url", num_partitions=4,
                   collect_changes=False)
    urls = np.array([f"u{i:05d}" for i in range(2000)], dtype=object)
    lk.commit_epoch(rd.from_arrow(make_rows(rng, np.arange(2000),
                                            urls, 10)), 0)
    upd = rng.choice(2000, size=300, replace=False)
    lk.commit_epoch(rd.from_arrow(make_rows(
        rng, 10_000 + np.arange(300), urls[upd], 20)), 1)
    LakeChangeExporter(lk, small / "bus").export()
    run_cdc(small / "bus", small / "re", num_partitions=4,
            source=envelopes)
    a = lk.read_pandas().sort_values("url").reset_index(drop=True)
    b = LakeTable(small / "re", num_partitions=4).read_pandas()
    b = b[a.columns].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    shutil.rmtree(small, ignore_errors=True)

    cow = run_mode("cow", n_base, n_update, n_epochs)
    mor = run_mode("mor", n_base, n_update, n_epochs)
    out = {
        "metric": "outbound_export_stress",
        "n_base": n_base, "n_update": n_update, "n_epochs": n_epochs,
        "num_cpus": num_cpus, "roundtrip_exact": True,
        "cow": cow, "mor": mor,
        "export_speedup_mor": round(
            cow["mean_export_s"] / max(mor["mean_export_s"], 1e-9), 2),
        "envelopes_bounded_by_commit": bool(
            cow["mean_envelopes"] <= n_update
            and mor["mean_envelopes"] <= n_update),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

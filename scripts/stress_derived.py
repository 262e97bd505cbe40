"""DerivedLakeTable maintenance cost at the 100-TB shape — small
commits into a big table, downstream kept in sync per commit.

  base: N rows committed once; derived lake built (cost ∝ corpus)
  then K update epochs of M rows each, refreshing the derived table
  after every commit:
    - change volume: downstream events per commit must be ~M (the
      changed keys), NEVER ~N — co-located untouched keys in rewritten
      COW partitions cancel in the signed diff
    - scan volume: COW diffs whole touched partitions (~2·N rows read
      per commit at uniform keys); MOR resolves only the commit's own
      keys (~2·M rows) — same contract as every other derived family
  exactness: final downstream state equals the transform of the
  upstream live state (full frame compare).

Usage: python scripts/stress_derived.py [n_base] [n_update] [n_epochs]
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

OUT_SCHEMA = pa.schema([("url", pa.string()), ("lang", pa.string()),
                        ("n_chars", pa.int64())])
LANGS = np.array(["en", "de", "fr", "es"], dtype=object)


def make_clean():
    def clean(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["fetch_status"] == 200]
        return pd.DataFrame({
            "url": keep["url"],
            "lang": keep["lang"],
            "n_chars": keep["text"].fillna("").str.len().astype("int64"),
        })
    return clean


def make_rows(rng, seqs, urls, ts):
    n = len(urls)
    status = np.where(rng.random(n) < 0.8, 200, 404).astype(np.int64)
    text = np.array(["x" * int(k) for k in rng.integers(20, 200, n)],
                    dtype=object)
    return pa.table({
        "op": pa.array(["update"] * n),
        "seq": pa.array(seqs, type=pa.int64()),
        "url": pa.array(urls),
        "warc_ts": pa.array([pd.Timestamp(ts, unit="s")] * n),
        "lang": pa.array(LANGS[rng.integers(0, len(LANGS), n)]),
        "fetch_status": pa.array(status),
        "text": pa.array(text),
    })


def run_mode(mode: str, n_base: int, n_update: int, n_epochs: int) -> dict:
    import ray.data as rd

    from chomper_ray.state.derivedtable import DerivedLakeTable
    from chomper_ray.state.lake import LakeTable, load_manifest

    rng = np.random.default_rng(11)
    root = Path(tempfile.mkdtemp(prefix=f"derived_stress_{mode}_"))
    kw = {"merge_on_read": True} if mode == "mor" else {}
    lake = LakeTable(root / "lake", key="url", num_partitions=32,
                     collect_changes=False, **kw)
    urls = np.array([f"u{i:08d}" for i in range(n_base)], dtype=object)
    lake.commit_epoch(
        rd.from_arrow(make_rows(rng, np.arange(n_base), urls, 10)), 0)
    dt = DerivedLakeTable(lake, root / "docs", make_clean(), OUT_SCHEMA,
                          lake_kwargs={"num_partitions": 32,
                                       "collect_changes": False})
    t0 = time.perf_counter()
    dt.refresh()
    build_s = time.perf_counter() - t0

    epochs = []
    for e in range(1, n_epochs + 1):
        upd = rng.choice(n_base, size=n_update, replace=False)
        lake.commit_epoch(
            rd.from_arrow(make_rows(
                rng, 10_000_000 * e + np.arange(n_update),
                urls[upd], 10 + e)), e)
        t0 = time.perf_counter()
        dt.refresh()
        refresh_s = time.perf_counter() - t0
        man = load_manifest(dt.table.root)
        ev_in = sum(int(ln["events_in"]) for ln in man.get("lineage", []))
        epochs.append({"refresh_s": round(refresh_s, 3),
                       "downstream_events": ev_in})
    # exactness: downstream == transform(upstream live)
    up = lake.read_pandas(columns=["url", "lang", "fetch_status", "text"])
    exp = make_clean()(up).sort_values("url").reset_index(drop=True)
    got = dt.table.read_pandas(columns=["url", "lang", "n_chars"])
    got = got[["url", "lang", "n_chars"]].sort_values("url") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, exp[["url", "lang", "n_chars"]], check_dtype=False)
    out = {
        "derived_build_s": round(build_s, 3),
        "epochs": epochs,
        "mean_refresh_s": round(
            float(np.mean([x["refresh_s"] for x in epochs])), 3),
        "mean_downstream_events": int(
            np.mean([x["downstream_events"] for x in epochs])),
        "final_equals_transform": True,
        "downstream_rows": int(len(got)),
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
    cow = run_mode("cow", n_base, n_update, n_epochs)
    mor = run_mode("mor", n_base, n_update, n_epochs)
    out = {
        "metric": "derived_table_maintenance_stress",
        "n_base": n_base, "n_update": n_update, "n_epochs": n_epochs,
        "num_cpus": num_cpus,
        "cow": cow, "mor": mor,
        "refresh_speedup_mor": round(
            cow["mean_refresh_s"] / max(mor["mean_refresh_s"], 1e-9), 2),
        # the headline bound: events ∝ commit size in BOTH modes
        "events_bounded_by_commit": bool(
            cow["mean_downstream_events"] <= 2 * n_update
            and mor["mean_downstream_events"] <= 2 * n_update),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Hot-partition CDC merge stress (round-3 VERDICT #7).

SURVEY §4 promises the merge path survives skewed hot keys. The staging
combiner already collapses a hot KEY to ≤1 row per key per block, so
single-url skew is absorbed before the shuffle; the untested case is a
hot PARTITION — many DISTINCT urls that all hash to one lake partition
(e.g. one crawl frontier domain dominating an epoch). The combiner
cannot reduce that volume (keys are distinct), so 50 % of all rows funnel
through one per-partition merge task: the straggler scenario.

This script builds two otherwise-identical change logs at the same
event count / page size / url count:

  uniform — urls spread over all partitions (the bench shape)
  hot     — 50 % of events on urls PRE-SELECTED to hash into lake
            partition 0 (same stable_bucket the lake routes by), the
            other 50 % uniform

and runs the identical drain-mode CDC job over each, reporting stage /
merge / end-to-end walls and the hot/uniform merge ratio. The verdict
threshold: a ratio > 1.3 means the merge path needs key salting or
partition splitting; ≤ 1.3 means the streaming executor's task overlap
absorbs the straggler at this scale.

Usage: python scripts/stress_hotkey_cdc.py [n_events] [num_cpus]
Writes one JSON line.
"""

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

NUM_PARTITIONS = 32
N_URLS = 180_000
N_EPOCHS = 2
HTML_SCALE = 4
ROWS_PER_FILE = 12_500


def make_urls(seed: int = 5, n_wide: int = 0):
    """(all_urls, hot_urls): hot urls are rejection-sampled to hash into
    lake partition 0 under the SAME stable_bucket the merge routes by.
    ``n_wide`` > 0 returns that many DISTINCT partition-0 urls instead of
    the natural ~N_URLS/NUM_PARTITIONS — the distinct-key skew leg."""
    from chomper_ray.stages.merge import stable_bucket

    urls = np.array([f"https://s{i % 97}.example.com/page/{i}"
                     for i in range(N_URLS)], dtype=object)
    buckets = stable_bucket(urls, NUM_PARTITIONS)
    hot = urls[buckets == 0]
    if n_wide > len(hot):
        extra = np.array(
            [f"https://w{i % 89}.example.com/item/{i}"
             for i in range(N_URLS, N_URLS + n_wide * NUM_PARTITIONS)],
            dtype=object)
        extra = extra[stable_bucket(extra, NUM_PARTITIONS) == 0]
        hot = np.concatenate([hot, extra])[:n_wide]
    return urls, hot


def write_log(out_dir: Path, n_events: int, hot_frac: float,
              seed: int, n_wide: int = 0) -> Path:
    from chomper_ray.sources.events import _BASE_TS_US, _make_html

    if (out_dir / "_COMPLETE").exists():
        return out_dir
    rng = np.random.default_rng(seed)
    urls_all, urls_hot = make_urls(n_wide=n_wide)
    n_hot = int(n_events * hot_frac)
    pick_hot = rng.integers(0, len(urls_hot), n_hot)
    pick_uni = rng.integers(0, len(urls_all), n_events - n_hot)
    urls = np.concatenate([urls_hot[pick_hot], urls_all[pick_uni]])
    rng.shuffle(urls)

    seq = np.arange(n_events, dtype=np.int64)
    ts = _BASE_TS_US + seq * 1_000_000 + rng.integers(0, 500_000, n_events)
    epoch = (seq * N_EPOCHS) // n_events
    word_seed = int(rng.integers(1, 2**31))
    status = np.full(n_events, 200, np.int32)

    for e in range(N_EPOCHS):
        sel = np.nonzero(epoch == e)[0]
        edir = out_dir / f"epoch={e:06d}"
        edir.mkdir(parents=True, exist_ok=True)
        for fi, lo in enumerate(range(0, len(sel), ROWS_PER_FILE)):
            idx = sel[lo:lo + ROWS_PER_FILE]
            html = [_make_html(urls[i], int(i), word_seed, HTML_SCALE)
                    for i in idx]
            pq.write_table(pa.table({
                "op": pa.array(["upsert"] * len(idx), pa.string()),
                "epoch": pa.array(epoch[idx], pa.int64()),
                "seq": pa.array(seq[idx], pa.int64()),
                "url": pa.array(urls[idx].tolist(), pa.string()),
                "warc_ts": pa.array(ts[idx], pa.timestamp("us")),
                "html": pa.array(html, pa.binary()),
                "lang": pa.array(["en"] * len(idx), pa.string()),
                "fetch_status": pa.array(status[idx], pa.int32()),
            }), edir / f"part-{fi:04d}.parquet")
    (out_dir / "_COMPLETE").touch()
    return out_dir


def run_one(log_dir: Path, tag: str) -> dict:
    from chomper_ray.pipelines.cdc import run_cdc

    lake = tempfile.mkdtemp(prefix=f"chomper_hot_{tag}_")
    staging = tempfile.mkdtemp(prefix=f"chomper_hot_stg_{tag}_",
                               dir="/dev/shm")
    t0 = time.perf_counter()
    res = run_cdc(log_dir, lake, num_partitions=NUM_PARTITIONS,
                  lake_kwargs={"staging_root": staging}, drain=True)
    wall = time.perf_counter() - t0
    shutil.rmtree(lake, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    return {"wall_s": round(wall, 3),
            "stage_s": round(sum(c.stage_s for c in res.commits), 3),
            "merge_s": round(sum(c.merge_s for c in res.commits), 3),
            "events": res.events_applied}


def run_remediated(log_dir: Path, tag: str, n_events: int) -> dict:
    """The closed loop on the wide-hot log: epoch 0 ingests at the
    default 32 partitions (straggling merge), `suggest_num_partitions`
    reads the hot volume off epoch 0's lineage, `repartition_table`
    acts on it, epoch 1 ingests on the widened layout — its merge wall
    is the remediation's payoff (same event distribution per epoch)."""
    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.state.lake import LakeTable

    lake_root = tempfile.mkdtemp(prefix=f"chomper_hot_{tag}_")
    staging = tempfile.mkdtemp(prefix=f"chomper_hot_stg_{tag}_",
                               dir="/dev/shm")
    kw = {"staging_root": staging}
    res0 = run_cdc(log_dir, lake_root, num_partitions=NUM_PARTITIONS,
                   lake_kwargs=kw, max_epochs=1)
    lake = LakeTable(lake_root, num_partitions=NUM_PARTITIONS, **kw)
    # volume thresholds scaled to the stress size (production default
    # min_rows=100k fires by itself at the full 4.8M run)
    lake.hot_min_rows = max(1_000, n_events // 200)
    suggestion = lake.suggest_num_partitions()
    t0 = time.perf_counter()
    if suggestion != NUM_PARTITIONS:
        lake.repartition_table(suggestion)
    repart_s = time.perf_counter() - t0
    res1 = run_cdc(log_dir, lake_root, lake_kwargs=kw)
    merge0 = sum(c.merge_s for c in res0.commits)
    merge1 = sum(c.merge_s for c in res1.commits)
    shutil.rmtree(lake_root, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    return {"suggested_partitions": suggestion,
            "repartition_s": round(repart_s, 3),
            "merge_epoch0_at_32": round(merge0, 3),
            "merge_epoch1_after": round(merge1, 3),
            "merge_improvement": round(merge0 / max(merge1, 1e-9), 3)}


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_800_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    base = Path(tempfile.gettempdir())
    log_uni = write_log(base / f"chomper_hot_log_uni_{n_events}",
                        n_events, hot_frac=0.0, seed=11)
    log_hot = write_log(base / f"chomper_hot_log_hot_{n_events}",
                        n_events, hot_frac=0.5, seed=11)
    # distinct-key skew: 50 % of events AND ~50 % of distinct urls in one
    # partition — the case the LWW combiner CANNOT collapse
    log_wide = write_log(base / f"chomper_hot_log_wide_{n_events}",
                         n_events, hot_frac=0.5, seed=11,
                         n_wide=N_URLS // 2)

    # warm (untimed): spin up workers + import the merge path on a
    # small log so the timed runs measure sustained throughput
    warm = write_log(base / "chomper_hot_log_warm", 40_000,
                     hot_frac=0.0, seed=12)
    run_one(warm, "warm")

    uni = run_one(log_uni, "uni")
    hot = run_one(log_hot, "hot")
    wide = run_one(log_wide, "wide")
    remediated = run_remediated(log_wide, "rem", n_events)
    ray.shutdown()

    out = {
        "metric": "hotkey_cdc_merge_stress",
        "n_events": n_events, "num_cpus": num_cpus,
        "num_partitions": NUM_PARTITIONS, "hot_frac": 0.5,
        "uniform": uni, "hot": hot, "hot_wide": wide,
        "auto_remediated": remediated,
        "merge_ratio_hot": round(hot["merge_s"] / max(uni["merge_s"], 1e-9), 3),
        "merge_ratio_wide": round(wide["merge_s"] / max(uni["merge_s"], 1e-9), 3),
        "wall_ratio_hot": round(hot["wall_s"] / max(uni["wall_s"], 1e-9), 3),
        "wall_ratio_wide": round(wide["wall_s"] / max(uni["wall_s"], 1e-9), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

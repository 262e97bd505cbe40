"""Event-stream analytics over the `events` table — one pipeline
composing the engine's windowing/join/pivot/sketch operators the way a
web-analytics job would:

    sessionize → per-user event-type pivot → hopping-window traffic →
    campaign range-join → heavy-hitter users (CMS)

Every stage is the scale-audited library operator; nothing here is
bespoke. Run standalone: ``python examples/web_analytics.py [sf_dir]``.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.pipelines.relational import (hopping_window,
                                                  pivot_counts, range_join,
                                                  sessionize)
    from chomper_ray.stages.sketches import approx_heavy_hitters

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"]) \
        .repartition(8)

    # 1. gap-based sessions (30 min) → session count
    sess = sessionize(events, by="user_id", ts="ts", tie="event_id",
                      gap_s=1800)
    n_sessions = sess.map_batches(
        lambda df: df[["user_id", "session_id"]].drop_duplicates(),
        batch_format="pandas").count()

    # 2. per-user behavior profile: event-type pivot (combiner-side)
    profile = pivot_counts(events, key="user_id", cat="event_type",
                           categories=["click", "view", "purchase"])
    buyers = profile.map_batches(
        lambda df: df[df["purchase"] > 0], batch_format="pandas").count()

    # 3. traffic curve: 1h windows hopping every 15 min
    traffic = hopping_window(events, ts="ts", size_s=3600, hop_s=900,
                             keys=(), sums=("value",))
    peak = traffic.map_batches(
        lambda df: df.nlargest(1, "n_rows"), batch_format="pandas") \
        .to_pandas().nlargest(1, "n_rows")

    # 4. attribute events to (overlapping) campaign windows — range join
    # on epoch seconds; campaigns derived deterministically for the demo
    ts_min = int(pd.Timestamp("2024-01-01").timestamp())
    camps = pd.DataFrame({
        "campaign_id": np.arange(6, dtype=np.int64),
        "lo": ts_min + np.arange(6, dtype=np.int64) * 21_600,
        "hi": ts_min + np.arange(6, dtype=np.int64) * 21_600 + 43_200,
    })

    def to_epoch_s(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000)
        return pa.table({"event_id": t["event_id"], "p": s})

    pts = events.map_batches(to_epoch_s, batch_format="pyarrow")
    attributed = range_join(
        pts, rd.from_arrow(pa.Table.from_pandas(camps,
                                                preserve_index=False)),
        point="p",
        left_schema=pa.schema([("event_id", pa.int64()),
                               ("p", pa.int64())]),
        right_schema=pa.schema([("campaign_id", pa.int64()),
                                ("lo", pa.int64()), ("hi", pa.int64())]))
    n_attributed = attributed.count()

    # 5. heavy-hitter users without a shuffle (Count-Min)
    top_users = approx_heavy_hitters(events, "user_id", k=3)

    print(json.dumps({
        "sessions": n_sessions,
        "users_with_purchase": buyers,
        "peak_window_start_s": int(peak["w_start_s"].iloc[0]),
        "peak_window_events": int(peak["n_rows"].iloc[0]),
        "campaign_attributed_events": n_attributed,
        "top_users": top_users.to_dict("records"),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Round-5 composition end to end: an OBJECT-STORE lake on autopilot.

  binlog tail → merge-on-read lake rooted on an object store
                (state/fs.py mock: rename/append RAISE — the protocol
                would run against S3/GCS verbatim)
                 └─ after_commit → MaintenancePolicy(max_chain=3)
                    (state/policy.py: minor compaction folds any
                     partition whose pending delta chain hits 3)

Asserts, per ingested epoch:
  - every delta chain stays UNDER the policy bound (no operator calls);
  - the store-rooted lake's snapshot hash equals a local-root twin
    ingesting the same log (storage protocol changes zero bytes of
    table state);
and at the end, that a point lookup and a filtered read stream straight
off the store.

The reference engine (anilktechie/chomper) stubbed S3 as a reader TODO
(readers.py:102-123) and leaves maintenance to cron; here the
exactly-once sink protocol itself is object-store-expressible and the
maintenance cadence is closed-loop.

Run: ``python examples/objectstore_autopilot.py``.
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.sources.events import generate_change_stream
    from chomper_ray.state.fs import FsPath, object_store_test_fs
    from chomper_ray.state.lake import LakeTable
    from chomper_ray.state.policy import MaintenancePolicy

    work = Path(tempfile.mkdtemp(prefix="chomper_autopilot_"))
    log = generate_change_stream(work / "binlog", n_events=6000,
                                 n_urls=500, n_epochs=10, seed=41,
                                 delete_frac=0.05)

    MOR = {"merge_on_read": True, "collect_changes": False}
    store_root = FsPath(object_store_test_fs(work / "store"), "lake")
    lake = LakeTable(store_root, num_partitions=4, **MOR)
    policy = MaintenancePolicy(lake, max_chain=3, advise_every=0)

    peaks = []

    def hook(commit):
        policy.after_commit(commit)
        chains = lake.delta_chain_lengths()
        peak = max(chains.values(), default=0)
        peaks.append(peak)
        assert peak < 3, f"policy let a chain reach {peak}"

    res = run_cdc(log, store_root, num_partitions=4, lake_kwargs=MOR,
                  after_commit=hook)
    print(f"ingested epochs {res.epochs_run} onto the store; "
          f"post-policy chain peaks per commit: {peaks}")
    print(f"policy actions: {policy.summary()}")

    # the storage protocol must not change one byte of table state
    run_cdc(log, work / "local", num_partitions=4, lake_kwargs=MOR)
    twin = LakeTable(work / "local", num_partitions=4, **MOR)
    assert lake.snapshot_hash() == twin.snapshot_hash()
    print(f"snapshot hash on store == local twin: {lake.snapshot_hash()}")

    # reads stream straight off the store
    live = twin.read_pandas()
    k = live["url"].iloc[7]
    row = lake.lookup(k)
    assert len(row) == 1 and row["url"].iloc[0] == k
    n_en = lake.read(columns=["url", "lang"]) \
        .map_batches(lambda df: df[df["lang"] == "en"],
                     batch_format="pandas").count()
    print(f"point lookup ok; {n_en} English pages of {len(live)} live "
          "(filtered streaming read off the store)")

    ray.shutdown()


if __name__ == "__main__":
    main()

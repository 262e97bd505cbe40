"""Object-store lake tax: the same flagship drain into a POSIX root vs
the mock object store (state/fs.py — whole-object puts, put-if-absent
manifests, no rename), interleaved best-of-2 per storage layer, final
snapshot hashes asserted identical.

What it measures: the cost of the object-store-safe protocol itself
(no tmp+rename publish, pyarrow PyFileSystem stream overhead on every
read/write) with storage latency held at local-disk levels — a real
S3 deployment adds network latency on top, which this sandbox cannot
measure; the protocol overhead is the part the engine controls.

Usage: python scripts/stress_objectstore.py [n_events] [num_cpus]
       (defaults 3_200_000 16; smoke: 200000 8). n_events/50_000 should
       divide by 16 (gen_log epoch layout).
"""

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 3_200_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from stress_endurance_cdc import gen_log

    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.state.fs import FsPath, object_store_test_fs
    from chomper_ray.state.lake import LakeTable

    base = Path(tempfile.gettempdir())
    log = gen_log(base / f"chomper_objstore_log_{n_events}", n_events)

    def one_run(make_root):
        root = make_root()
        t0 = time.perf_counter()
        run_cdc(log, root, num_partitions=32, drain=True)
        wall = time.perf_counter() - t0
        h = LakeTable(root, num_partitions=32).snapshot_hash()
        return wall, h

    def posix_root():
        return tempfile.mkdtemp(prefix="objstore_posix_")

    def store_root():
        return FsPath(object_store_test_fs(
            tempfile.mkdtemp(prefix="objstore_mock_")), "lake")

    # interleaved best-of-2 (co-tenant noise discipline)
    walls = {"posix": [], "store": []}
    hashes = set()
    for _ in range(2):
        w, h = one_run(posix_root)
        walls["posix"].append(w)
        hashes.add(h)
        w, h = one_run(store_root)
        walls["store"].append(w)
        hashes.add(h)

    best_p, best_s = min(walls["posix"]), min(walls["store"])
    print(json.dumps({
        "metric": "objectstore_lake_tax",
        "n_events": n_events, "num_cpus": num_cpus,
        "posix_wall_s": [round(w, 2) for w in walls["posix"]],
        "store_wall_s": [round(w, 2) for w in walls["store"]],
        "best_posix_s": round(best_p, 2),
        "best_store_s": round(best_s, 2),
        "tax_ratio": round(best_s / best_p, 3),
        "posix_events_per_sec": round(n_events / best_p, 1),
        "store_events_per_sec": round(n_events / best_s, 1),
        "hash_identical": len(hashes) == 1,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

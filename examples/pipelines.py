"""Migration of /root/reference/examples/pipelines.py: branch pipelines.

The reference documents nested sub-pipelines as fan-out (its own
implementation is dead code — SURVEY §3.1); the INTENT — one stream
consumed by multiple processing branches — is `Pipeline.fork`: build the
Dataset once, hand it to several consumers.

Run: ``python examples/pipelines.py``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from chomper_ray.pipelines.pipeline import Pipeline
    from chomper_ray.stages.transforms import Assigner

    source = rd.from_items([{"title": f"Item {i}"} for i in (1, 2, 3)])
    pipe = Pipeline(source).then(Assigner("stage", "main"))

    # three branches over one built stream (reference's branch intent)
    titles, count, upper = pipe.fork(
        lambda ds: sorted(ds.to_pandas()["title"]),
        lambda ds: ds.count(),
        lambda ds: ds.map_batches(
            lambda df: df.assign(title=df["title"].str.upper()),
            batch_format="pandas").to_pandas()["title"].tolist(),
    )
    print("branch 1 (titles):", titles)
    print("branch 2 (count):", count)
    print("branch 3 (upper):", upper)
    assert titles == ["Item 1", "Item 2", "Item 3"]
    assert count == 3
    assert sorted(upper) == ["ITEM 1", "ITEM 2", "ITEM 3"]
    ray.shutdown()


if __name__ == "__main__":
    main()

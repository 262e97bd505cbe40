"""MaintenancePolicy (state/policy.py): a long trickle-ingest run where
the policy alone keeps MOR delta chains and index segment counts
bounded — no manual compaction calls — while landing bit-identical
state to an unmaintained twin run (compaction is hash-neutral by
contract, so the policy may only change WHEN, never WHAT)."""

import numpy as np
import pandas as pd
import pytest

from chomper_ray.pipelines.cdc import run_cdc
from chomper_ray.sources import events as ev
from chomper_ray.state.index import LakeTextIndex
from chomper_ray.state.lake import LakeTable
from chomper_ray.state.policy import MaintenancePolicy

N_EPOCHS = 18
MAX_CHAIN = 4
MAX_SEGS = 6
MOR_KW = {"merge_on_read": True, "collect_changes": False}


@pytest.fixture(scope="module")
def trickle_log(tmp_path_factory):
    d = tmp_path_factory.mktemp("plog")
    ev.generate_change_stream(
        d, n_events=3600, n_urls=300, n_epochs=N_EPOCHS, seed=5,
        delete_frac=0.05, ooo_frac=0.1)
    return d


def test_policy_bounds_chains_and_segments(tmp_path, trickle_log,
                                           ray_session):
    lake = LakeTable(tmp_path / "lake", num_partitions=4, **MOR_KW)
    tidx = LakeTextIndex(lake, tmp_path / "tix", num_partitions=8)
    policy = MaintenancePolicy(lake, targets=(tidx,),
                               max_chain=MAX_CHAIN,
                               max_segments=MAX_SEGS, advise_every=5)
    seen = {"max_chain": 0, "max_segs": 0}

    def hook(commit):
        tidx.refresh()
        policy.after_commit(commit)
        # post-policy invariants, observed at EVERY commit of the tail
        chains = lake.delta_chain_lengths()
        seen["max_chain"] = max(seen["max_chain"],
                                max(chains.values(), default=0))
        seen["max_segs"] = max(seen["max_segs"],
                               len(tidx._live_segments()))
        assert all(c < MAX_CHAIN for c in chains.values())
        assert len(tidx._live_segments()) <= MAX_SEGS

    res = run_cdc(trickle_log, tmp_path / "lake", num_partitions=4,
                  lake_kwargs=MOR_KW, after_commit=hook)
    assert res.epochs_run == list(range(N_EPOCHS))
    # the policy actually fired (the run was long enough to need it)
    s = policy.summary()
    assert s.get("compact_deltas", 0) >= 1
    assert s.get("index_compact", 0) >= 1
    # and the bounds were REACHED from below (thresholds are live, not
    # trivially satisfied by a short run): the hook observes post-policy
    # state, so chains peak at MAX_CHAIN-1; the pre-compaction segment
    # count is recorded in the policy log
    assert seen["max_chain"] == MAX_CHAIN - 1
    assert seen["max_segs"] <= MAX_SEGS
    assert max(e["segments_before"] for e in policy.log
               if e["action"] == "index_compact") >= MAX_SEGS

    # state parity with a manual-cadence twin: no policy, one manual
    # major compaction at the end (the operator's old workflow)
    twin = LakeTable(tmp_path / "twin", num_partitions=4, **MOR_KW)
    tidx2 = LakeTextIndex(twin, tmp_path / "tix2", num_partitions=8)
    run_cdc(trickle_log, tmp_path / "twin", num_partitions=4,
            lake_kwargs=MOR_KW,
            after_commit=lambda c: tidx2.refresh())
    twin.compact_deltas()
    tidx2.compact()
    assert lake.snapshot_hash() == twin.snapshot_hash()
    pd.testing.assert_frame_equal(lake.read_pandas(), twin.read_pandas())
    q = ["the", "and"]
    pd.testing.assert_frame_equal(tidx.bm25(q, k=20), tidx2.bm25(q, k=20))


def test_policy_advisory_and_auto_repartition(tmp_path, ray_session):
    import pyarrow as pa
    import ray.data as rd

    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    lake.hot_min_rows = 10  # test-scale economics guard
    policy = MaintenancePolicy(lake, advise_every=1,
                               auto_repartition=True, max_chain=0)
    # skewed keys: one bucket takes nearly everything
    rng = np.random.default_rng(3)
    for e in range(2):
        rows = [{"op": "insert", "seq": e * 1000 + i,
                 "url": f"hot{i:04d}" if i % 10 else f"cold{i:04d}",
                 "warc_ts": pd.Timestamp(e + 1, unit="s"),
                 "text": "x"} for i in range(400)]
        lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), e)
        policy.after_commit(None)
    acts = {e["action"] for e in policy.log}
    assert "repartition" in acts or "repartition_advisory" not in acts
    if "repartition" in acts:
        assert lake.num_partitions > 2
        assert len(lake.read_pandas()) == 800  # rewrite is content-exact

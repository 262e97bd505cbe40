"""Live-lake repartition: re-bucket a committed table to a new
partition count as one exactly-once maintenance commit — the
skew/parallelism lever from the hot-key stress, applied in place."""

import pandas as pd
import pytest

from chomper_ray.pipelines.cdc import run_cdc
from chomper_ray.sources.events import generate_change_stream
from chomper_ray.state.lake import (LakeTable, PartitionMismatchError,
                                    load_manifest)

PARAMS = dict(n_events=1600, n_urls=350, n_epochs=3, seed=29,
              evolution_epoch=2)


@pytest.fixture(scope="module")
def log(tmp_path_factory):
    return generate_change_stream(
        tmp_path_factory.mktemp("rplog") / "log", **PARAMS)


def _full(lake):
    return (lake.read(include_deleted=True, include_internal=True)
            .to_pandas().sort_values("url").reset_index(drop=True))


@pytest.mark.parametrize("old,new", [(4, 16), (8, 3)])
def test_rows_preserved_bitwise_grow_and_shrink(log, tmp_path, old, new):
    root = tmp_path / f"l{old}to{new}"
    run_cdc(log, root, num_partitions=old)
    lake = LakeTable(root, num_partitions=old)
    before = _full(lake)
    res = lake.repartition_table(new)
    assert not res.skipped and res.partitions_touched <= new
    reopened = LakeTable(root)
    reopened._sync_partitions()  # adoption is lazy until first use
    assert reopened.num_partitions == new
    after = _full(reopened)
    pd.testing.assert_frame_equal(before, after[before.columns])
    # tombstones travelled too
    assert after["_deleted"].sum() == before["_deleted"].sum()


def test_exactly_once_and_cursor_passthrough(log, tmp_path):
    root = tmp_path / "l"
    run_cdc(log, root, num_partitions=4, max_epochs=2)
    lake = LakeTable(root, num_partitions=4)
    res = lake.repartition_table(8)
    assert not res.skipped
    # replay of the same chain id is a no-op; same-count request too
    assert lake.repartition_table(8, epoch=res.epoch).skipped
    assert LakeTable(root).repartition_table(8).skipped
    # binlog cursor untouched → pending log epochs still apply
    assert LakeTable(root).last_applied_log_epoch() == 1
    r2 = run_cdc(log, root)
    assert r2.epochs_run == [2]


def test_post_repartition_ingest_matches_from_scratch(log, tmp_path):
    root = tmp_path / "l"
    run_cdc(log, root, num_partitions=4, max_epochs=2)
    LakeTable(root, num_partitions=4).repartition_table(16)
    run_cdc(log, root)
    ref = tmp_path / "ref"
    run_cdc(log, ref, num_partitions=16)
    assert LakeTable(root).snapshot_hash() == \
        LakeTable(ref).snapshot_hash()


def test_conflicting_explicit_count_raises(log, tmp_path):
    root = tmp_path / "l"
    run_cdc(log, root, num_partitions=4)
    LakeTable(root, num_partitions=4).repartition_table(6)
    with pytest.raises(PartitionMismatchError):
        LakeTable(root, num_partitions=4)._sync_partitions()
    assert load_manifest(root)["num_partitions"] == 6


def test_matview_stays_exact_across_repartition(log, tmp_path):
    # the commit's lineage covers old∪new partitions, so the view folds
    # (+all new, −all old) — a net zero that must leave it EXACT
    from chomper_ray.state.matview import MaterializedAgg

    root = tmp_path / "l"
    run_cdc(log, root, num_partitions=4, max_epochs=2)
    lake = LakeTable(root, num_partitions=4)

    def contrib(df):
        out = df[["lang"]].copy()
        out["n_chars"] = df["text"].fillna("").str.len().astype("int64")
        return out

    view = MaterializedAgg(lake, tmp_path / "mv", contrib,
                           group_cols=["lang"], value_cols=["n_chars"],
                           read_columns=["url", "lang", "text"])
    before = view.refresh()
    lake.repartition_table(12)
    run_cdc(log, root)  # one more ingest epoch on the new layout
    after = view.refresh()
    # recompute from scratch on the final lake
    fresh = MaterializedAgg(LakeTable(root), tmp_path / "mv2", contrib,
                            group_cols=["lang"], value_cols=["n_chars"],
                            read_columns=["url", "lang", "text"])
    want = fresh.refresh()
    got = after.sort_values("lang").reset_index(drop=True)
    want = want.sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert not before.equals(after)  # epoch 2 really changed the view


def test_mor_head_refuses(log, tmp_path):
    root = tmp_path / "l"
    kw = {"merge_on_read": True, "collect_changes": False}
    run_cdc(log, root, num_partitions=4, lake_kwargs=kw)
    with pytest.raises(ValueError, match="merge-on-read"):
        LakeTable(root, num_partitions=4, **kw).repartition_table(8)


def test_suggest_partitions_pure():
    from chomper_ray.state.lake import suggest_partitions

    # balanced: leave alone
    vols = {p: 1000 for p in range(8)}
    assert suggest_partitions(vols, 8, min_rows=100) == 8
    # one wide-hot bucket at 10x median: threshold 4000, k=ceil(10/4)=3
    vols[3] = 10_000
    assert suggest_partitions(vols, 8, min_rows=100, max_growth=4) == 24
    # extreme peak: growth capped at max_growth per step
    vols[3] = 1_000_000
    assert suggest_partitions(vols, 8, min_rows=100, max_growth=4) == 32
    # modest 5x peak with factor 4 -> threshold 4000, ceil(5000/4000)=2
    vols = {p: 1000 for p in range(8)}
    vols[3] = 5000
    assert suggest_partitions(vols, 8, min_rows=100) == 16
    # below min_rows: never flags small tables
    vols = {0: 50, 1: 5}
    assert suggest_partitions(vols, 2, min_rows=100_000) == 2
    assert suggest_partitions({}, 8) == 8


def test_suggest_from_lineage_and_auto_flow(log, tmp_path):
    root = tmp_path / "l"
    run_cdc(log, root, num_partitions=4)
    lake = LakeTable(root, num_partitions=4)
    # sf-test volumes are tiny: with the production min_rows nothing is
    # hot; with a tiny threshold the zipf-skewed urls flag growth
    assert lake.suggest_num_partitions() == 4
    lake.hot_min_rows = 10
    lake.hot_factor = 2.0
    sug = lake.suggest_num_partitions()
    if sug != 4:  # zipf skew concentrated a bucket — act on it
        res = lake.repartition_table(sug)
        assert not res.skipped
        assert LakeTable(root).suggest_num_partitions() >= 4
    # maintenance commits (events_in == 0 lineage) are ignored by the
    # window walk: a backfill commit doesn't change the suggestion
    from chomper_ray.state.backfill import LakeBackfill

    before = LakeTable(root).suggest_num_partitions()
    LakeBackfill(LakeTable(root), "noop", lambda t: t).run_chunk(
        max_partitions=1)
    assert LakeTable(root).suggest_num_partitions() == before

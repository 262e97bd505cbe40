"""Predicate-pushdown lake reads: `read(where=Expression)`.

Pushdown (pyarrow.dataset filter, row-group stats) and the residual
Arrow-kernel fallback must agree exactly — including on evolved
columns that pre-evolution snapshot files don't contain."""

import pandas as pd
import pytest

from chomper_ray.functions.expr import F
from chomper_ray.pipelines.cdc import run_cdc
from chomper_ray.sources.events import generate_change_stream
from chomper_ray.state.lake import LakeTable

PARAMS = dict(n_events=1800, n_urls=400, n_epochs=3, seed=37,
              evolution_epoch=2)


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    root = tmp_path_factory.mktemp("wlake") / "lake"
    log = generate_change_stream(
        tmp_path_factory.mktemp("wlog") / "log", **PARAMS)
    run_cdc(log, root, num_partitions=6)
    return LakeTable(root, num_partitions=6)


@pytest.fixture(scope="module")
def full(lake):
    return lake.read().to_pandas()


def _expect(full, mask):
    return full[mask].sort_values("url").reset_index(drop=True)


def test_pushdown_path_used_and_exact(lake, full):
    w = (F("lang") == "en") & (F("fetch_status") >= 300)
    from chomper_ray.state.lake import load_manifest

    assert lake._pushdown_safe(load_manifest(lake.root),
                               ["lang", "fetch_status"])
    got = (lake.read(where=w).to_pandas()
           .sort_values("url").reset_index(drop=True))
    want = _expect(full, (full["lang"] == "en")
                   & (full["fetch_status"] >= 300))
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_evolved_column_falls_back_residual_and_exact(lake, full):
    # extra_score arrived at the evolution epoch; any partition whose
    # head snapshot predates it forces the residual path — answers must
    # not change
    got = (lake.read(where=F("extra_score") > 0.5).to_pandas()
           .sort_values("url").reset_index(drop=True))
    want = _expect(full, full["extra_score"] > 0.5)
    assert list(got.columns) == list(want.columns) or \
        sorted(got.columns) == sorted(want.columns)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(got.columns)])


def test_columns_projection_with_where(lake, full):
    w = F("lang").isin(["en", "de"])
    got = lake.read(columns=["url", "warc_ts"], where=w).to_pandas()
    assert list(got.columns) == ["url", "warc_ts"]
    assert len(got) == int(full["lang"].isin(["en", "de"]).sum())


def test_nulls_never_match(lake, full):
    # deletes carry null text → rows with null never match any
    # comparison; also ~(x == v) must not resurrect nulls
    w = ~(F("lang") == "en")
    got = lake.read(where=w).to_pandas()
    want = full[full["lang"].notna() & (full["lang"] != "en")]
    assert len(got) == len(want)


def test_tombstones_and_include_deleted(lake):
    w = F("fetch_status") >= 0
    alive = lake.read(where=w).to_pandas()
    withdel = lake.read(where=w, include_deleted=True,
                        include_internal=True).to_pandas()
    assert len(withdel) > len(alive)
    assert withdel["_deleted"].sum() == len(withdel) - len(alive)


def test_time_travel_with_where(lake):
    got = lake.read(as_of_epoch=1, where=F("lang") == "en").to_pandas()
    full1 = lake.read(as_of_epoch=1).to_pandas()
    assert len(got) == int((full1["lang"] == "en").sum())
    assert "extra_score" not in got.columns  # pre-evolution snapshot


def test_missing_column_raises(lake):
    with pytest.raises(KeyError, match="no_such"):
        lake.read(where=F("no_such") == 1)


def test_mor_delta_head_residual(tmp_path):
    log = generate_change_stream(tmp_path / "log", n_events=800,
                                 n_urls=200, n_epochs=2, seed=5)
    kw = {"merge_on_read": True, "collect_changes": False}
    run_cdc(log, tmp_path / "lake", num_partitions=3, lake_kwargs=kw)
    lake = LakeTable(tmp_path / "lake", num_partitions=3, **kw)
    full = lake.read().to_pandas()
    got = lake.read(where=F("lang") == "en").to_pandas()
    assert len(got) == int((full["lang"] == "en").sum())


def test_pushdown_unsafe_after_manifest_gc(lake, tmp_path, full):
    # clone the lake, rewrite ONE partition (backfill chunk), then GC:
    # the other partitions' files now come from commits whose manifests
    # are gone — provenance unknowable → pushdown walk answers False,
    # residual still exact
    import shutil

    from chomper_ray.state.backfill import LakeBackfill
    from chomper_ray.state.lake import load_manifest

    root = tmp_path / "clone"
    shutil.copytree(lake.root, root)
    clone = LakeTable(root, num_partitions=6)
    LakeBackfill(clone, "noop", lambda t: t).run_chunk(max_partitions=1)
    clone.compact(keep_epochs=1)
    head = load_manifest(root)
    assert lake._pushdown_safe(load_manifest(lake.root), ["lang"])
    assert not clone._pushdown_safe(head, ["lang"])
    got = clone.read(where=F("lang") == "en").to_pandas()
    assert len(got) == int((full["lang"] == "en").sum())

"""Administrative logical deletes (GDPR/retention): delete_where."""

import pandas as pd
import pytest

from chomper_ray.functions.expr import F
from chomper_ray.pipelines.cdc import run_cdc
from chomper_ray.sources.events import generate_change_stream
from chomper_ray.state.lake import LakeTable

PARAMS = dict(n_events=1500, n_urls=300, n_epochs=3, seed=43,
              evolution_epoch=2)
WM = 2_000_000_000_000_000  # far-future version watermark (µs)


@pytest.fixture(scope="module")
def log(tmp_path_factory):
    return generate_change_stream(
        tmp_path_factory.mktemp("dwlog") / "log", **PARAMS)


def test_deletes_match_predicate_and_null_payload(log, tmp_path):
    run_cdc(log, tmp_path / "l", num_partitions=4)
    lake = LakeTable(tmp_path / "l", num_partitions=4)
    before = lake.read().to_pandas()
    n = int((before["lang"] == "de").sum())
    res = lake.delete_where(F("lang") == "de", version_ts_us=WM)
    assert not res.skipped and res.rows_upserted == n
    after = lake.read().to_pandas()
    assert len(after) == len(before) - n
    assert not (after["lang"] == "de").any()
    # GDPR: the tombstone's payload is the delete event's — null, so
    # the data is gone from the snapshot bytes, not merely hidden
    doomed = set(before.loc[before["lang"] == "de", "url"])
    full = lake.read(include_deleted=True).to_pandas()
    dead = full[full["url"].isin(doomed)]
    assert len(dead) == n
    assert dead["text"].isna().all() and dead["lang"].isna().all()
    # immediate rerun: nothing left to match, but a commit still lands
    res2 = lake.delete_where(F("lang") == "de", version_ts_us=WM)
    assert not res2.skipped and res2.rows_upserted == 0
    # explicit chain id ≤ head: exactly-once skip
    assert lake.delete_where(F("lang") == "de", version_ts_us=WM,
                             epoch=res.epoch).skipped


def test_cursor_passthrough_and_lww_wins_over_late_events(log, tmp_path):
    run_cdc(log, tmp_path / "l", num_partitions=4, max_epochs=2)
    lake = LakeTable(tmp_path / "l", num_partitions=4)
    doomed = set(lake.read(where=F("lang") == "de").to_pandas()["url"])
    lake.delete_where(F("lang") == "de", version_ts_us=WM)
    assert lake.last_applied_log_epoch() == 1  # cursor untouched
    r = run_cdc(log, tmp_path / "l", num_partitions=4)
    assert r.epochs_run == [2]
    final = lake.read().to_pandas()
    # epoch-2 updates carry warc_ts < WM: deleted keys stay dead (LWW)
    assert not final["url"].isin(doomed).any()


def test_listeners_and_derived_structures_see_the_commit(log, tmp_path):
    from chomper_ray.state.matview import MaterializedAgg

    run_cdc(log, tmp_path / "l", num_partitions=4)
    lake = LakeTable(tmp_path / "l", num_partitions=4)

    def contrib(df):
        out = df[["lang"]].copy()
        out["one"] = 1
        return out

    view = MaterializedAgg(lake, tmp_path / "mv", contrib,
                           group_cols=["lang"], value_cols=["one"],
                           read_columns=["url", "lang"])
    before = view.refresh()
    assert (before["lang"] == "de").any()
    ch0 = lake.change_events()
    lake.delete_where(F("lang") == "de", version_ts_us=WM)
    ch1 = lake.change_events()
    assert (ch1["event"] == "delete").sum() > \
        (ch0["event"] == "delete").sum()
    after = view.refresh()  # incremental fold of the delete commit
    assert not (after["lang"] == "de").any()
    assert after["n_live"].sum() == before["n_live"].sum() - int(
        before.loc[before["lang"] == "de", "n_live"].sum())


def test_empty_predicate_commits_zero(log, tmp_path):
    run_cdc(log, tmp_path / "l", num_partitions=4)
    lake = LakeTable(tmp_path / "l", num_partitions=4)
    res = lake.delete_where(F("lang") == "zz", version_ts_us=WM)
    assert not res.skipped and res.rows_upserted == 0
    # chain advanced, cursor didn't, state unchanged
    assert lake.last_applied_log_epoch() == PARAMS["n_epochs"] - 1


def test_uncommitted_lake_noop(tmp_path):
    lake = LakeTable(tmp_path / "empty", num_partitions=2)
    assert lake.delete_where(F("lang") == "de",
                             version_ts_us=WM).skipped

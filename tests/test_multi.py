"""Multi-table CDC routing: one stream, independent exactly-once lakes."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from chomper_ray.pipelines.multi import (TableSpec, run_cdc_multi,
                                         table_catalog)
from chomper_ray.sources.events import generate_multi_stream
from chomper_ray.state.lake import LakeTable

PARAMS = dict(n_events=3000, n_urls=500, n_links=700, n_epochs=3, seed=23)


@pytest.fixture(scope="module")
def log(tmp_path_factory):
    return generate_multi_stream(
        tmp_path_factory.mktemp("multilog") / "log", **PARAMS)


def _lww(df: pd.DataFrame, key: str) -> pd.DataFrame:
    s = df.sort_values(["warc_ts", "seq"]).groupby(key).tail(1)
    return s[s["op"] != "delete"]


def _raw(log, tbl: str) -> pd.DataFrame:
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{log}/epoch=*/part-*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    df = t.to_pandas()
    return df[df["tbl"] == tbl]


def test_catalog_roundtrip(log):
    cat = table_catalog(log)
    assert set(cat) == {"pages", "links"}
    assert cat["pages"].key == "url" and cat["links"].key == "link_id"


def test_routes_both_tables_and_matches_pandas_lww(log, tmp_path):
    res = run_cdc_multi(log, tmp_path / "lakes", num_partitions=4)
    assert res["pages"].epochs_run == res["links"].epochs_run == [0, 1, 2]
    assert (res["pages"].events_applied + res["links"].events_applied
            == PARAMS["n_events"])
    cat = table_catalog(log)
    for name, spec in cat.items():
        got = (LakeTable(tmp_path / "lakes" / name, key=spec.key,
                         num_partitions=4).read().to_pandas()
               [spec.columns].sort_values(spec.key)
               .reset_index(drop=True))
        want = (_lww(_raw(log, name), spec.key)[spec.columns]
                .sort_values(spec.key).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_replay_noop_and_per_table_resume(log, tmp_path):
    root = tmp_path / "lakes"
    run_cdc_multi(log, root, num_partitions=4)
    again = run_cdc_multi(log, root, num_partitions=4)
    assert all(r.epochs_run == [] and r.events_applied == 0
               for r in again.values())

    # one table behind (crash after pages' commits, links lost):
    # rerun heals only the lagging table, reading off ITS cursor
    import shutil

    shutil.rmtree(root / "links")
    healed = run_cdc_multi(log, root, num_partitions=4)
    assert healed["pages"].epochs_run == []
    assert healed["links"].epochs_run == [0, 1, 2]
    cat = table_catalog(log)
    got = (LakeTable(root / "links", key="link_id", num_partitions=4)
           .read().to_pandas()[cat["links"].columns]
           .sort_values("link_id").reset_index(drop=True))
    want = (_lww(_raw(log, "links"), "link_id")[cat["links"].columns]
            .sort_values("link_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_staggered_cursors_converge(log, tmp_path):
    # pages alone first (its cursor leads), then the full set: active
    # tables differ per epoch, final states equal a one-shot run
    root = tmp_path / "lakes"
    cat = table_catalog(log)
    run_cdc_multi(log, root, tables={"pages": cat["pages"]},
                  num_partitions=4, max_epochs=2)
    res = run_cdc_multi(log, root, num_partitions=4)
    assert res["pages"].epochs_run == [2]
    assert res["links"].epochs_run == [0, 1, 2]
    ref_root = tmp_path / "ref"
    run_cdc_multi(log, ref_root, num_partitions=4)
    for name, spec in cat.items():
        a = LakeTable(root / name, key=spec.key,
                      num_partitions=4).snapshot_hash()
        b = LakeTable(ref_root / name, key=spec.key,
                      num_partitions=4).snapshot_hash()
        assert a == b, name


def test_per_table_transform_and_partitions(log, tmp_path):
    cat = table_catalog(log)

    def upper_title(t: pa.Table) -> pa.Table:
        u = pc.utf8_upper(pc.fill_null(t["title"], ""))
        return t.set_column(t.schema.get_field_index("title"),
                            "title", u)

    cat["pages"].transform = upper_title
    cat["pages"].num_partitions = 2
    cat["links"].num_partitions = 8
    res = run_cdc_multi(log, tmp_path / "lakes", tables=cat)
    assert res["pages"].epochs_run == [0, 1, 2]
    pages = LakeTable(tmp_path / "lakes" / "pages", key="url",
                      num_partitions=2).read().to_pandas()
    assert (pages["title"] == pages["title"].str.upper()).all()
    links = LakeTable(tmp_path / "lakes" / "links", key="link_id",
                      num_partitions=8)
    assert links.read().count() > 0


def test_epoch_alignment_empty_epochs_advance_cursors(tmp_path):
    # a log where one table is absent from a whole epoch: its cursor
    # still advances (empty commit), keeping resume logic trivial
    log = generate_multi_stream(tmp_path / "log", n_events=900,
                                n_urls=200, n_links=300, n_epochs=3,
                                seed=4, pages_frac=1.0)  # links empty
    res = run_cdc_multi(log, tmp_path / "lakes", num_partitions=2)
    assert res["links"].epochs_run == [0, 1, 2]
    assert res["links"].events_applied == 0
    lk = LakeTable(tmp_path / "lakes" / "links", key="link_id",
                   num_partitions=2)
    assert lk.last_applied_log_epoch() == 2


def test_multi_over_debezium_envelopes_matches_parquet(tmp_path):
    # the full composition: a multi-table Debezium stream
    # (source.table discriminates, images carry only their own table's
    # columns) routed by run_cdc_multi must hash-equal the same routing
    # over the log's Parquet twin — per table
    from chomper_ray.sources import envelopes as env

    log = env.generate_multi_envelope_log(
        tmp_path / "log", n_events=1500, n_urls=300, n_links=400,
        n_epochs=2, seed=41)
    src = env.source_log(log)
    assert (log / "_tables.json").exists()  # catalog mirrored
    ra = run_cdc_multi(log, tmp_path / "a", num_partitions=3,
                       source=env)
    rb = run_cdc_multi(src, tmp_path / "b", num_partitions=3)
    cat = table_catalog(log)
    for name, spec in cat.items():
        assert ra[name].events_applied == rb[name].events_applied > 0
        ha = LakeTable(tmp_path / "a" / name, key=spec.key,
                       num_partitions=3).snapshot_hash()
        hb = LakeTable(tmp_path / "b" / name, key=spec.key,
                       num_partitions=3).snapshot_hash()
        assert ha == hb, name
    # cross-table nulls stay off the wire: a pages envelope carries no
    # links columns
    import json as _json

    line = _json.loads((log / "epoch=000000").glob("part-*.jsonl")
                       .__iter__().__next__()
                       .read_text().splitlines()[0])
    image = line["after"] or line["before"]
    assert not ({"link_id", "src_url"} <= set(image)
                and {"url", "title"} <= set(image))


def test_mixed_mor_cow_tables(log, tmp_path):
    """Per-table lake_kwargs compose with merge-on-read: the pages
    table commits MOR delta files (head stays delta-bearing) while
    links stays copy-on-write — both resolve to the same pandas LWW
    oracle, and compacting pages afterwards changes nothing."""
    from chomper_ray.state.lake import load_manifest, manifest_has_deltas

    cat = table_catalog(log)
    cat["pages"].lake_kwargs = {"merge_on_read": True,
                                "collect_changes": False}
    res = run_cdc_multi(log, tmp_path / "lakes", tables=cat,
                        num_partitions=4)
    assert res["pages"].epochs_run == res["links"].epochs_run == [0, 1, 2]
    pages_lake = LakeTable(tmp_path / "lakes" / "pages", key="url",
                           num_partitions=4, merge_on_read=True,
                           collect_changes=False)
    assert manifest_has_deltas(load_manifest(pages_lake.root))
    assert not manifest_has_deltas(
        load_manifest(tmp_path / "lakes" / "links"))
    for name, lake in [("pages", pages_lake),
                       ("links", LakeTable(tmp_path / "lakes" / "links",
                                           key="link_id",
                                           num_partitions=4))]:
        spec = cat[name]
        got = (lake.read().to_pandas()[spec.columns]
               .sort_values(spec.key).reset_index(drop=True))
        want = (_lww(_raw(log, name), spec.key)[spec.columns]
                .sort_values(spec.key).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    before = pages_lake.snapshot_hash()
    assert not pages_lake.compact_deltas().skipped
    assert pages_lake.snapshot_hash() == before

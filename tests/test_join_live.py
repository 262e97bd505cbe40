"""join_live (state/clustered.py): map-only live x live bucket join of
two per-commit-maintained keyed-bucket layouts — after every commit to
EITHER lake the join must equal a pandas merge of the two live LWW
states, across bucket-crossing foreign-key updates, deletes on both
sides, name collisions, MOR delta heads and compaction."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chomper_ray.state.clustered import LakeKeyedBucketLayout, join_live
from chomper_ray.state.lake import LakeTable

N_BUCKETS = 8


def pg(op, seq, url, ts, lang):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"), "lang": lang}


def lk(op, seq, link_id, ts, src, dst):
    return {"op": op, "seq": seq, "link_id": link_id,
            "warc_ts": pd.Timestamp(ts, unit="s"),
            "src_url": src, "dst_url": dst}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def setup(tmp_path, mor=False):
    pages = LakeTable(tmp_path / "pages", key="url", num_partitions=4,
                      collect_changes=False, merge_on_read=mor)
    links = LakeTable(tmp_path / "links", key="link_id",
                      num_partitions=4, collect_changes=False,
                      merge_on_read=mor)
    play = LakeKeyedBucketLayout(pages, tmp_path / "p_lay",
                                 bucket_col="url", columns=["lang"],
                                 num_partitions=N_BUCKETS)
    llay = LakeKeyedBucketLayout(links, tmp_path / "l_lay",
                                 bucket_col="src_url",
                                 columns=["dst_url", "warc_ts"],
                                 num_partitions=N_BUCKETS)
    return pages, links, play, llay


def oracle(pages, links) -> pd.DataFrame:
    p = pages.read_pandas()[["url", "lang"]]
    l = links.read_pandas()[["link_id", "src_url", "dst_url"]]
    out = p.merge(l, left_on="url", right_on="src_url", how="inner")
    return out[["url", "lang", "link_id", "dst_url"]] \
        .sort_values(["url", "link_id"]).reset_index(drop=True)


def got_join(play, llay) -> pd.DataFrame:
    ds, _, _ = join_live(play, llay, left_cols=["url", "lang"],
                         right_cols=["link_id", "dst_url"])
    df = ds.to_pandas()
    return df[["url", "lang", "link_id", "dst_url"]] \
        .sort_values(["url", "link_id"]).reset_index(drop=True)


def assert_join_ok(play, llay, pages, links):
    pd.testing.assert_frame_equal(got_join(play, llay),
                                  oracle(pages, links))


def test_join_live_tracks_both_sides(tmp_path, ray_session):
    pages, links, play, llay = setup(tmp_path)
    commit(pages, [pg("insert", i, f"u{i}", 10, ["de", "en"][i % 2])
                   for i in range(10)], 0)
    commit(links, [lk("insert", i, f"L{i}", 10, f"u{i % 5}",
                      f"u{(i + 1) % 10}") for i in range(20)], 0)
    play.refresh()
    llay.refresh()
    assert_join_ok(play, llay, pages, links)

    # pages-side churn: lang update, delete a url that HAS links,
    # insert a url that acquires links only later
    commit(pages, [pg("update", 100, "u1", 20, "fr"),
                   pg("delete", 101, "u2", 20, None),
                   pg("insert", 102, "u77", 20, "pt")], 1)
    play.refresh()
    assert_join_ok(play, llay, pages, links)

    # links-side churn: re-point src_url (bucket-crossing update),
    # delete, insert incl. one referencing the new page and one
    # referencing a url with no page row (must not join)
    commit(links, [lk("update", 200, "L0", 30, "u9", "u3"),
                   lk("delete", 201, "L1", 30, None, None),
                   lk("insert", 202, "L50", 30, "u77", "u0"),
                   lk("insert", 203, "L51", 30, "nosuch", "u0")], 1)
    llay.refresh()
    assert_join_ok(play, llay, pages, links)
    # fan-out sanity: u0 has several links, each a join row
    j = got_join(play, llay)
    assert (j["url"] == "u0").sum() >= 2


def test_join_live_collision_suffix_and_defaults(tmp_path, ray_session):
    pages, links, play, llay = setup(tmp_path)
    commit(pages, [pg("insert", 0, "u0", 10, "de")], 0)
    commit(links, [lk("insert", 0, "L0", 11, "u0", "u1")], 0)
    play.refresh()
    llay.refresh()
    # default columns: both layouts carry warc_ts? pages layout doesn't
    # (columns=[lang]) but links does -> no collision on defaults here;
    # force one by asking for warc_ts on both sides explicitly
    p2 = LakeKeyedBucketLayout(pages, tmp_path / "p_lay2",
                               bucket_col="url",
                               columns=["lang", "warc_ts"],
                               num_partitions=N_BUCKETS)
    p2.refresh()
    ds, nj, nt = join_live(p2, llay)
    df = ds.to_pandas()
    assert "warc_ts" in df.columns and "warc_ts_r" in df.columns
    assert "src_url_r" not in df.columns  # no collision -> no suffix
    assert len(df) == 1 and nj >= 1 and nt >= nj
    assert df.loc[0, "warc_ts"] == pd.Timestamp(10, unit="s")
    assert df.loc[0, "warc_ts_r"] == pd.Timestamp(11, unit="s")


def test_join_live_guards(tmp_path, ray_session):
    pages, links, play, llay = setup(tmp_path)
    commit(pages, [pg("insert", 0, "u0", 10, "de")], 0)
    commit(links, [lk("insert", 0, "L0", 10, "u0", "u1")], 0)
    play.refresh()
    llay.refresh()
    bad = LakeKeyedBucketLayout(links, tmp_path / "l_lay4",
                                bucket_col="src_url",
                                num_partitions=N_BUCKETS // 2)
    bad.refresh()
    with pytest.raises(ValueError, match="identical counts"):
        join_live(play, bad)
    with pytest.raises(ValueError, match="not in layout columns"):
        join_live(play, llay, left_cols=["nosuch"])
    with pytest.raises(TypeError):
        join_live(play, object())


def test_join_live_empty_side_typed(tmp_path, ray_session):
    pages, links, play, llay = setup(tmp_path)
    commit(pages, [pg("insert", 0, "u0", 10, "de")], 0)
    commit(links, [lk("insert", 0, "L0", 10, "u0", "u1")], 0)
    commit(links, [lk("delete", 1, "L0", 20, None, None)], 1)
    play.refresh()
    llay.refresh()
    ds, _, _ = join_live(play, llay, left_cols=["url", "lang"],
                         right_cols=["link_id"])
    assert len(ds.to_pandas()) == 0
    # the DATASET stays typed (Ray's to_pandas drops columns on an
    # all-empty executed dataset; schema() is the contract here)
    sch = ds.schema()
    assert sch.names == ["url", "lang", "link_id"]
    assert str(sch.types[2]) == "string"


def test_join_live_mor_head_and_compaction(tmp_path, ray_session):
    pages, links, play, llay = setup(tmp_path, mor=True)
    commit(pages, [pg("insert", i, f"u{i}", 10, "de")
                   for i in range(6)], 0)
    commit(links, [lk("insert", i, f"L{i}", 10, f"u{i % 3}", "u9")
                   for i in range(9)], 0)
    play.refresh()
    llay.refresh()
    assert_join_ok(play, llay, pages, links)
    # churn at delta-bearing heads on both sides
    commit(pages, [pg("delete", 100, "u0", 20, None)], 1)
    commit(links, [lk("update", 100, "L1", 20, "u5", "u0")], 1)
    play.refresh()
    llay.refresh()
    assert_join_ok(play, llay, pages, links)
    before = got_join(play, llay)
    pages.compact_deltas()
    links.compact_deltas()
    play.refresh()
    llay.refresh()
    pd.testing.assert_frame_equal(got_join(play, llay), before)

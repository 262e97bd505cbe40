"""Incrementally maintained sorted-range / Z-order layouts
(state/clustered.py): after EVERY lake commit the maintained layout
must answer range / box scans exactly like a filter over the live LWW
state — across inserts, updates that cross range/bucket boundaries,
deletes, compaction, schema evolution and resume — while file-level
pruning stays effective and per-commit maintenance cost scales with
the commit's write amplification, never the table."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chomper_ray.state.clustered import LakeSortedLayout, LakeZorderLayout
from chomper_ray.state.lake import LakeTable

LANGS = ["de", "en", "fr", "pt"]


def mk(op, seq, url, ts, score, lang="en", extra=None):
    row = {"op": op, "seq": seq, "url": url,
           "warc_ts": pd.Timestamp(ts, unit="s"),
           "score": float(score), "lang": lang}
    if extra is not None:
        row["extra"] = float(extra)
    return row


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def sorted_oracle(lake, lo=None, hi=None, col="score"):
    df = lake.read_pandas()
    m = np.ones(len(df), dtype=bool)
    if lo is not None:
        m &= df[col].to_numpy() >= lo
    if hi is not None:
        m &= df[col].to_numpy() < hi
    return df[m].sort_values("url").reset_index(drop=True)


def read_sorted(lay, lo=None, hi=None, cols=None):
    ds, nr, nt = lay.read_range(lo, hi, columns=cols)
    df = ds.to_pandas()
    if not len(df):
        # Ray's to_pandas drops the schema on empty datasets; rebuild
        # the columns from the (typed) Dataset schema
        df = pd.DataFrame(columns=ds.schema().names)
    return df.sort_values("url").reset_index(drop=True), nr, nt


def assert_range_exact(lay, lake, lo=None, hi=None):
    got, nr, nt = read_sorted(lay, lo, hi)
    exp = sorted_oracle(lake, lo, hi)
    if len(got) == 0 or len(exp) == 0:
        assert len(got) == len(exp)
        return nr, nt
    cols = list(got.columns)
    pd.testing.assert_frame_equal(got[cols], exp[cols])
    return nr, nt


def seed_lake(tmp_path, n=200, parts=4, seed=3):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=parts,
                     collect_changes=False)
    rng = np.random.default_rng(seed)
    rows = [mk("insert", i, f"u{i:03d}", 100 + i, rng.random(),
               LANGS[i % 4]) for i in range(n)]
    commit(lake, rows, 0)
    return lake, rng


def test_sorted_tracks_every_commit(tmp_path, ray_session):
    lake, rng = seed_lake(tmp_path)
    lay = LakeSortedLayout(lake, tmp_path / "s", order_col="score",
                           columns=["warc_ts", "lang"], num_partitions=8)
    m = lay.refresh()
    assert m["applied"][0]["full"]
    assert_range_exact(lay, lake)
    nr, nt = assert_range_exact(lay, lake, 0.2, 0.6)
    assert 0 < nr < nt  # data skipping works on the base

    # range-crossing updates + deletes + inserts
    e1 = [mk("update", 1000 + i, f"u{i:03d}", 300 + i, rng.random())
          for i in range(60)]
    e1 += [mk("delete", 2000 + i, f"u{i:03d}", 400 + i, 0.5)
           for i in range(60, 80)]
    e1 += [mk("insert", 3000 + i, f"v{i:03d}", 500 + i, rng.random(), "pt")
           for i in range(30)]
    commit(lake, e1, 1)
    m = lay.refresh()
    assert not m["applied"][0]["full"]
    assert_range_exact(lay, lake)
    assert_range_exact(lay, lake, 0.2, 0.6)
    assert_range_exact(lay, lake, None, 0.3)
    assert_range_exact(lay, lake, 0.9, None)

    # a second delta on top (update rows already updated once)
    e2 = [mk("update", 5000 + i, f"u{i:03d}", 600 + i, rng.random())
          for i in range(0, 30)]
    commit(lake, e2, 2)
    lay.refresh()
    assert_range_exact(lay, lake)
    nr, nt = assert_range_exact(lay, lake, 0.4, 0.5)
    assert nr < nt


def test_sorted_compact_and_fast_path(tmp_path, ray_session):
    lake, rng = seed_lake(tmp_path)
    lay = LakeSortedLayout(lake, tmp_path / "s", order_col="score",
                           num_partitions=8)
    lay.refresh()
    e1 = [mk("update", 1000 + i, f"u{i:03d}", 300 + i, rng.random())
          for i in range(50)]
    commit(lake, e1, 1)
    lay.refresh()
    before, _, _ = read_sorted(lay, 0.2, 0.6)
    assert lay.stats()["segments"] == 2
    assert lay.compact()["compacted"]
    assert lay.stats()["segments"] == 1
    assert lay.compact() == {"compacted": False}  # idempotent
    after, nr, nt = read_sorted(lay, 0.2, 0.6)
    pd.testing.assert_frame_equal(before, after)
    assert nr < nt
    assert_range_exact(lay, lake)
    # post-compact stats row count equals the live table
    assert lay.stats()["rows"] == len(lake.read_pandas())


def test_sorted_maintenance_cost_is_commit_bound(tmp_path, ray_session):
    lake, rng = seed_lake(tmp_path, n=400, parts=8)
    lay = LakeSortedLayout(lake, tmp_path / "s", order_col="score",
                           num_partitions=8)
    m0 = lay.refresh()
    full_rows = m0["applied"][0]["rows_written"]
    # a commit touching ONE url touches one lake partition; the segment
    # scans only that partition's old+new snapshot (2 files), never the
    # table
    commit(lake, [mk("update", 9000, "u000", 999, 0.42)], 1)
    m1 = lay.refresh()
    seg = m1["applied"][0]
    per_part = len(lake.read_pandas()) / 8
    assert seg["rows_written"] <= 3 * per_part
    assert seg["rows_written"] < 0.3 * full_rows
    assert_range_exact(lay, lake, 0.4, 0.45)


def test_sorted_null_order_raises(tmp_path, ray_session):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    rows = [mk("insert", 0, "u0", 10, 0.5), mk("insert", 1, "u1", 11, 0.6)]
    rows.append({"op": "insert", "seq": 2, "url": "u2",
                 "warc_ts": pd.Timestamp(12, unit="s"),
                 "score": None, "lang": "en"})
    commit(lake, rows, 0)
    lay = LakeSortedLayout(lake, tmp_path / "s", order_col="score")
    with pytest.raises((ValueError, Exception), match="null"):
        lay.refresh()


def test_sorted_projection_and_residual_columns(tmp_path, ray_session):
    lake, _ = seed_lake(tmp_path, n=80, parts=2)
    lay = LakeSortedLayout(lake, tmp_path / "s", order_col="score",
                           columns=["lang"], num_partitions=4)
    lay.refresh()
    # project OUT the order column: the residual still filters on it
    ds, _, _ = lay.read_range(0.3, 0.7, columns=["url", "lang"])
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got.columns) == ["url", "lang"]
    exp = sorted_oracle(lake, 0.3, 0.7)[["url", "lang"]] \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    with pytest.raises(ValueError, match="not in layout columns"):
        lay.read_range(columns=["nope"])


def test_sorted_timestamp_order_col(tmp_path, ray_session):
    lake, rng = seed_lake(tmp_path, n=150, parts=4)
    lay = LakeSortedLayout(lake, tmp_path / "ts", order_col="warc_ts",
                           columns=["score"], num_partitions=6)
    lay.refresh()
    e1 = [mk("update", 1000 + i, f"u{i:03d}", 700 + i, rng.random())
          for i in range(40)]  # warc_ts moves forward -> range-crossing
    commit(lake, e1, 1)
    lay.refresh()
    lo = pd.Timestamp(160, unit="s")
    hi = pd.Timestamp(720, unit="s")
    ds, nr, nt = lay.read_range(lo, hi)
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    exp = sorted_oracle(lake, lo, hi, col="warc_ts")
    pd.testing.assert_frame_equal(got[list(got.columns)],
                                  exp[list(got.columns)])
    assert nr < nt


def test_sorted_resume_and_idempotency(tmp_path, ray_session):
    lake, rng = seed_lake(tmp_path)
    lay = LakeSortedLayout(lake, tmp_path / "s", order_col="score",
                           num_partitions=4)
    lay.refresh()
    commit(lake, [mk("update", 1000, "u001", 900, 0.99)], 1)
    m = lay.refresh()
    assert [s for s in m["applied"]]
    # re-refresh: everything already applied
    m2 = lay.refresh()
    assert m2["applied"] == [] and len(m2["skipped"]) == 2
    # torn segment: delete the marker, refresh redoes it deterministically
    seg_dir = Path(m["applied"][0]["dir"]) if "dir" in m["applied"][0] \
        else sorted(Path(lay.root).glob("seg-*"))[-1]
    (seg_dir / "_SEGMENT.json").unlink()
    m3 = lay.refresh()
    assert len(m3["applied"]) == 1
    assert_range_exact(lay, lake)


def test_sorted_truncate_empties_layout(tmp_path, ray_session):
    lake, _ = seed_lake(tmp_path, n=60, parts=2)
    lay = LakeSortedLayout(lake, tmp_path / "s", order_col="score")
    lay.refresh()
    lake.truncate()
    lay.refresh()
    ds, nr, nt = lay.read_range()
    assert ds.count() == 0 and nr == 0
    # the empty Dataset keeps an explicit schema (typed-empty contract)
    assert "url" in ds.schema().names
    assert lay.stats()["rows"] == 0


def test_sorted_maintains_at_mor_head(tmp_path, ray_session):
    """Merge-on-read commits fold directly into the layout (no
    compaction required); compaction afterwards is a zero delta."""
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False, merge_on_read=True)
    commit(lake, [mk("insert", i, f"u{i}", 10 + i, i / 10)
                  for i in range(10)], 0)
    lay = LakeSortedLayout(lake, tmp_path / "s", order_col="score")
    lay.refresh()  # full build from the resolved delta-bearing head
    assert_range_exact(lay, lake)
    commit(lake, [mk("update", 50, "u3", 99, 0.95),
                  mk("delete", 51, "u4", 99, 0.0)], 1)
    lay.refresh()  # per-commit MOR diff, still no compaction
    assert_range_exact(lay, lake)
    lake.compact_deltas()
    lay.refresh()  # zero delta
    assert_range_exact(lay, lake)


def test_sorted_value_column_added_by_evolution(tmp_path, ray_session):
    # a VALUE column that only exists from commit 1 onward: the commit-0
    # segment carries typed nulls, reads conform to the head schema
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    commit(lake, [mk("insert", i, f"u{i:02d}", 10 + i, i / 20)
                  for i in range(20)], 0)
    commit(lake, [mk("insert", 100 + i, f"v{i:02d}", 50 + i, 0.5 + i / 40,
                     extra=i / 7.0) for i in range(10)], 1)
    lay = LakeSortedLayout(lake, tmp_path / "s", order_col="score",
                           columns=["extra"], num_partitions=4)
    lay.refresh()
    got, _, _ = read_sorted(lay)
    exp = sorted_oracle(lake)
    pd.testing.assert_frame_equal(got[["url", "score", "extra"]],
                                  exp[["url", "score", "extra"]])
    assert got["extra"].isna().sum() == 20


def test_zorder_tracks_commits_and_prunes(tmp_path, ray_session):
    lake, rng = seed_lake(tmp_path, n=300, parts=4)
    lay = LakeZorderLayout(lake, tmp_path / "z", cols=["score", "lang"],
                           columns=["warc_ts"], num_partitions=8, bits=8)
    lay.refresh()

    def oracle(slo, shi, llo=None, lhi=None):
        df = lake.read_pandas()
        m = np.ones(len(df), dtype=bool)
        if slo is not None:
            m &= df["score"].to_numpy() >= slo
        if shi is not None:
            m &= df["score"].to_numpy() < shi
        if llo is not None:
            m &= df["lang"].to_numpy() >= llo
        if lhi is not None:
            m &= df["lang"].to_numpy() < lhi
        return df[m].sort_values("url").reset_index(drop=True)

    def check(preds, llo=None, lhi=None, slo=None, shi=None):
        ds, nr, nt = lay.read_box(preds)
        got = ds.to_pandas().sort_values("url").reset_index(drop=True)
        exp = oracle(slo, shi, llo, lhi)
        cols = list(got.columns)
        pd.testing.assert_frame_equal(got[cols], exp[cols])
        return nr, nt

    nr, nt = check({"score": (0.1, 0.4), "lang": ("d", "f")},
                   slo=0.1, shi=0.4, llo="d", lhi="f")
    assert 0 < nr < nt

    # bucket-crossing updates (new score + new lang), deletes, inserts
    e1 = [mk("update", 1000 + i, f"u{i:03d}", 500 + i, rng.random(),
             LANGS[(i + 1) % 4]) for i in range(80)]
    e1 += [mk("delete", 2000 + i, f"u{i:03d}", 600 + i, 0.1)
           for i in range(80, 100)]
    e1 += [mk("insert", 3000 + i, f"w{i:03d}", 700 + i, rng.random(), "fr")
           for i in range(40)]
    commit(lake, e1, 1)
    lay.refresh()
    check({"score": (0.1, 0.4), "lang": ("d", "f")},
          slo=0.1, shi=0.4, llo="d", lhi="f")
    check({"score": (0.5, None)}, slo=0.5)          # subset predicate
    check({"lang": ("e", "g")}, llo="e", lhi="g")   # other-dim subset

    # compact restores the single-segment fast path; same answers
    assert lay.compact()["compacted"]
    nr, nt = check({"score": (0.1, 0.4), "lang": ("d", "f")},
                   slo=0.1, shi=0.4, llo="d", lhi="f")
    assert nr < nt


def test_zorder_bits_cap(tmp_path, ray_session):
    lake, _ = seed_lake(tmp_path, n=10, parts=2)
    with pytest.raises(ValueError, match="bits"):
        LakeZorderLayout(lake, tmp_path / "z", cols=["score", "lang",
                                                     "warc_ts"], bits=20)


def test_clustered_marker_is_json_clean(tmp_path, ray_session):
    # every marker field must round-trip standard JSON (no NaN tokens,
    # no numpy scalars) — the _STATS lesson from ADVICE r3
    lake, _ = seed_lake(tmp_path, n=50, parts=2)
    lay = LakeSortedLayout(lake, tmp_path / "s", order_col="score",
                           num_partitions=4)
    lay.refresh()
    for mpath in Path(lay.root).glob("seg-*/_SEGMENT.json"):
        txt = mpath.read_text()
        assert "NaN" not in txt
        m = json.loads(txt)
        for f in m["files"]:
            assert isinstance(f["min"], (int, float, str))
            assert isinstance(f["max"], (int, float, str))


# ------------------------------------------------------ property-based

from hypothesis import given, settings, strategies as st

_cop = st.tuples(
    st.sampled_from(["insert", "update", "delete"]),
    st.integers(0, 7),                              # url index
    st.floats(0.0, 1.0, allow_nan=False, width=32),  # route value
    st.sampled_from(LANGS),
)


@settings(max_examples=8, deadline=None)
@given(epochs=st.lists(st.lists(_cop, min_size=1, max_size=6),
                       min_size=1, max_size=3))
def test_sorted_random_op_sequences_match_lww(epochs, tmp_path_factory,
                                              ray_session):
    """Property: for ANY commit sequence of inserts / route-moving
    updates / deletes, the maintained sorted layout answers full and
    windowed scans exactly like the live LWW state — after EVERY
    commit, not just the last."""
    tmp_path = tmp_path_factory.mktemp("cluprop")
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    lay = LakeSortedLayout(lake, tmp_path / "s", order_col="score",
                           columns=["lang"], num_partitions=4)
    seq = 0
    for ei, ops in enumerate(epochs):
        rows = []
        for op, ui, score, lang in ops:
            rows.append(mk(op, seq, f"u{ui}", 10 + seq, score, lang))
            seq += 1
        commit(lake, rows, ei)
        lay.refresh()
        assert_range_exact(lay, lake)
        assert_range_exact(lay, lake, 0.25, 0.75)


@settings(max_examples=6, deadline=None)
@given(epochs=st.lists(st.lists(_cop, min_size=1, max_size=6),
                       min_size=1, max_size=3))
def test_zorder_random_op_sequences_match_lww(epochs, tmp_path_factory,
                                              ray_session):
    tmp_path = tmp_path_factory.mktemp("zprop")
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    lay = LakeZorderLayout(lake, tmp_path / "z", cols=["score", "lang"],
                           num_partitions=4, bits=6)
    seq = 0
    for ei, ops in enumerate(epochs):
        rows = []
        for op, ui, score, lang in ops:
            rows.append(mk(op, seq, f"u{ui}", 10 + seq, score, lang))
            seq += 1
        commit(lake, rows, ei)
        lay.refresh()
        ds, _, _ = lay.read_box({"score": (0.2, 0.8), "lang": ("d", "g")})
        got = ds.to_pandas()
        df = lake.read_pandas()
        m = (df["score"].to_numpy() >= 0.2) & (df["score"].to_numpy() < 0.8) \
            & (df["lang"].to_numpy() >= "d") & (df["lang"].to_numpy() < "g")
        exp = df[m].sort_values("url").reset_index(drop=True)
        if len(got) == 0 or len(exp) == 0:
            assert len(got) == len(exp)
            continue
        got = got.sort_values("url").reset_index(drop=True)
        cols = list(got.columns)
        pd.testing.assert_frame_equal(got[cols], exp[cols])


# -------------------------------------------------- secondary-key layout

def test_keyed_bucket_layout_lookup_and_join(tmp_path, ray_session):
    from chomper_ray.state.clustered import LakeKeyedBucketLayout
    from chomper_ray.state.output import write_partitioned

    XLANGS = ["de", "en", "fr", "pt", "es", "it"]
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    rng = np.random.default_rng(2)
    commit(lake, [mk("insert", i, f"u{i:03d}", 10 + i, rng.random(),
                     XLANGS[i % 6]) for i in range(120)], 0)
    lay = LakeKeyedBucketLayout(lake, tmp_path / "kb", bucket_col="lang",
                                columns=["score"], num_partitions=8)
    lay.refresh()
    # bucket-crossing updates (lang changes), deletes, inserts
    e1 = [mk("update", 1000 + i, f"u{i:03d}", 300 + i, rng.random(),
             XLANGS[(i + 3) % 6]) for i in range(40)]
    e1 += [mk("delete", 2000 + i, f"u{i:03d}", 400 + i, 0.1, "en")
           for i in range(40, 55)]
    e1 += [mk("insert", 3000 + i, f"v{i:03d}", 500 + i, rng.random(),
              "pt") for i in range(20)]
    commit(lake, e1, 1)
    lay.refresh()

    live = lake.read_pandas()
    ds, nr, nt = lay.lookup(["de", "fr"])
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    exp = live[live["lang"].isin(["de", "fr"])] \
        .sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["url", "lang", "score"]],
                                  exp[["url", "lang", "score"]])
    assert nr < nt  # only the hashed buckets were opened

    dim = pd.DataFrame({"lang": XLANGS,
                        "region": ["eu-c", "na", "eu-w", "sa", "eu-s",
                                   "eu-s2"]})
    write_partitioned(rd.from_pandas(dim), tmp_path / "dim", key="lang",
                      num_partitions=8)
    j = lay.join_bucketed(tmp_path / "dim", right_key="lang") \
        .to_pandas().sort_values("url").reset_index(drop=True)
    expj = live.merge(dim, on="lang").sort_values("url") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        j[["url", "lang", "score", "region"]],
        expj[["url", "lang", "score", "region"]])

    # partition-count / key mismatches fail loudly, not silently wrong
    write_partitioned(rd.from_pandas(dim), tmp_path / "dim4", key="lang",
                      num_partitions=4)
    with pytest.raises(ValueError, match="identical counts"):
        lay.join_bucketed(tmp_path / "dim4", right_key="lang")
    with pytest.raises(ValueError, match="keyed by"):
        lay.join_bucketed(tmp_path / "dim", right_key="region")

    # compaction preserves answers and restores one-file-per-bucket
    assert lay.compact()["compacted"]
    ds, nr2, _ = lay.lookup(["de", "fr"])
    got2 = ds.to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got2[["url", "lang", "score"]],
                                  exp[["url", "lang", "score"]])
    assert nr2 <= nr


def test_sorted_survives_lake_gc(tmp_path, ray_session):
    """Lake GC (compact keep_epochs=1) can remove the PREVIOUS commit's
    snapshot files before the layout has applied the newest commit —
    the chain walk must fall back to a full segment, not fail or go
    stale."""
    lake, rng = seed_lake(tmp_path, n=120, parts=2)
    lay = LakeSortedLayout(lake, tmp_path / "s", order_col="score",
                           num_partitions=4)
    lay.refresh()
    commit(lake, [mk("update", 1000 + i, f"u{i:03d}", 300 + i,
                     rng.random()) for i in range(30)], 1)
    commit(lake, [mk("update", 2000 + i, f"u{i:03d}", 400 + i,
                     rng.random()) for i in range(30, 60)], 2)
    lake.compact(keep_epochs=1)  # drops commit-1 snapshot files
    m = lay.refresh()
    # commit 1 diffs fine (its old = commit 0 files may be gone too);
    # whichever commit hit a missing old file rebuilt full
    assert any(s.get("full") for s in m["applied"])
    assert_range_exact(lay, lake)
    assert_range_exact(lay, lake, 0.3, 0.6)


def test_keyed_bucket_layout_int_column(tmp_path, ray_session):
    """Integer bucket columns must route lookup values through the SAME
    hash domain as the stored column (pd.util.hash_array hashes int64
    differently from object-boxed ints — a forced-object lookup would
    silently probe the wrong buckets)."""
    from chomper_ray.state.clustered import LakeKeyedBucketLayout

    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    statuses = [200, 301, 404, 500]
    rows = []
    for i in range(160):
        r = mk("insert", i, f"u{i:03d}", 10 + i, i / 160)
        r["status"] = statuses[i % 4]
        rows.append(r)
    commit(lake, rows, 0)
    lay = LakeKeyedBucketLayout(lake, tmp_path / "kb",
                                bucket_col="status", num_partitions=8)
    lay.refresh()
    ds, nr, nt = lay.lookup([301, 500])
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    live = lake.read_pandas()
    exp = live[live["status"].isin([301, 500])] \
        .sort_values("url").reset_index(drop=True)
    assert len(got) == len(exp) == 80
    pd.testing.assert_frame_equal(got[["url", "status"]],
                                  exp[["url", "status"]])
    assert nr < nt

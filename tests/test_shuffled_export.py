"""CDC-maintained deterministic corpus shuffle
(state/clustered.py ``LakeShuffledExport``): after every lake commit
the export must read back exactly the md5-ordered pseudo-shuffle of
the live LWW state — across inserts, updates, deletes, merge-on-read
chains, compaction and resume — with per-commit maintenance cost
bounded by the commit, never the table, and a global order that is a
pure function of the live key set (ingest history / partitioning /
storage mode never leak into it)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chomper_ray.state.clustered import LakeShuffledExport, _md5_32
from chomper_ray.state.lake import LakeTable

LANGS = ["de", "en", "fr", "pt"]
NSH = 8


def mk(op, seq, url, ts, lang="en"):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"), "lang": lang}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def ref_shuffle(lake, n_shards=NSH, cols=("url", "lang")):
    """Independent row-at-a-time reference: md5-hash every live key,
    shard by h % n, order by (h, key) within the shard."""
    df = lake.read_pandas()
    h = np.array([int(hashlib.md5(u.encode()).hexdigest()[:8], 16)
                  for u in df["url"]], dtype=np.int64)
    df = df.assign(_h=h, shard=(h % n_shards).astype(np.int64))
    df = df.sort_values(["shard", "_h", "url"], kind="stable")
    df["pos"] = df.groupby("shard").cumcount().astype(np.int64)
    return df[[*cols, "shard", "pos"]].reset_index(drop=True)


def read_live(exp, **kw):
    df = exp.read_live(**kw).to_pandas()
    return df.sort_values(["shard", "pos"], kind="stable") \
        .reset_index(drop=True)


def assert_matches(exp, lake):
    got = read_live(exp)
    want = ref_shuffle(lake, exp.num_partitions,
                       cols=[c for c in got.columns
                             if c not in ("shard", "pos")])
    pd.testing.assert_frame_equal(got[want.columns], want)


def seed(tmp_path, mor=False):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False, merge_on_read=mor)
    rows = [mk("insert", i, f"u{i:03d}", 100 + i, LANGS[i % 4])
            for i in range(60)]
    commit(lake, rows, 0)
    exp = LakeShuffledExport(lake, tmp_path / "shuf",
                             columns=["lang"], n_shards=NSH)
    exp.refresh()
    return lake, exp


def test_md5_hash_is_sql_parity():
    import duckdb

    vals = ["", "hello", "https://a.example/p?q=1", "u007", "äöü"]
    got = _md5_32(np.array(vals, dtype=object))
    con = duckdb.connect()
    for v, g in zip(vals, got):
        (w,) = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 8))::UBIGINT", [v]
        ).fetchone()
        assert int(g) == int(w)


def test_tracks_every_commit(tmp_path, ray_session):
    lake, exp = seed(tmp_path)
    assert_matches(exp, lake)
    # updates (LWW replace, same shard by construction) + deletes +
    # fresh inserts
    commit(lake, [mk("update", 100, "u003", 900, "pt"),
                  mk("delete", 101, "u010", 901),
                  mk("insert", 102, "u900", 902, "de")], 1)
    exp.refresh()
    assert_matches(exp, lake)
    got = read_live(exp)
    assert "u010" not in set(got["url"])
    assert got.loc[got["url"] == "u003", "lang"].iloc[0] == "pt"
    # delete then re-insert the same key: lands back at the same
    # (shard, h) slot — order is a pure function of the live key set
    commit(lake, [mk("delete", 200, "u900", 1000)], 2)
    commit(lake, [mk("insert", 300, "u900", 1100, "fr")], 3)
    exp.refresh()
    assert_matches(exp, lake)


def test_compaction_invariance_and_fast_path(tmp_path, ray_session):
    lake, exp = seed(tmp_path)
    commit(lake, [mk("update", 100, "u000", 900, "pt"),
                  mk("delete", 101, "u001", 901)], 1)
    exp.refresh()
    before = read_live(exp)
    assert len(exp._live_segments()) > 1
    exp.compact()
    live = exp._live_segments()
    assert len(live) == 1 and live[0]["full"]
    pd.testing.assert_frame_equal(read_live(exp), before)
    assert_matches(exp, lake)


def test_equals_fresh_rebuild(tmp_path, ray_session):
    lake, exp = seed(tmp_path)
    commit(lake, [mk("update", 100, f"u{i:03d}", 900 + i, "pt")
                  for i in range(0, 20)], 1)
    commit(lake, [mk("delete", 200 + i, f"u{i:03d}", 1000 + i)
                  for i in range(40, 50)], 2)
    exp.refresh()
    fresh = LakeShuffledExport(lake, tmp_path / "fresh",
                               columns=["lang"], n_shards=NSH)
    fresh.refresh()
    pd.testing.assert_frame_equal(read_live(exp), read_live(fresh))


def test_maintenance_cost_is_commit_bound(tmp_path, ray_session):
    lake, exp = seed(tmp_path)
    r = lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(
        [mk("update", 100, "u000", 900, "pt")])), 1)
    assert r.epoch == 1
    out = exp.refresh()
    (marker,) = out["applied"]
    # signed rows of the diff only: the old and new versions of the
    # touched partition's rows, never the other partitions — a
    # one-row commit into a 60-row lake must not rewrite the corpus
    assert marker["rows_written"] <= 2 * 15 + 2


def test_order_independent_of_history_and_layout(tmp_path, ray_session):
    # same live state reached two ways (different partition counts,
    # different commit groupings) -> byte-identical shuffled order
    lake_a = LakeTable(tmp_path / "a", key="url", num_partitions=3,
                       collect_changes=False)
    rows = [mk("insert", i, f"u{i:03d}", 100 + i, LANGS[i % 4])
            for i in range(50)]
    commit(lake_a, rows, 0)
    lake_b = LakeTable(tmp_path / "b", key="url", num_partitions=7,
                       collect_changes=False)
    commit(lake_b, rows[:20], 0)
    commit(lake_b, rows[20:], 1)
    ea = LakeShuffledExport(lake_a, tmp_path / "sa", columns=["lang"],
                            n_shards=NSH)
    eb = LakeShuffledExport(lake_b, tmp_path / "sb", columns=["lang"],
                            n_shards=NSH)
    ea.refresh()
    eb.refresh()
    pd.testing.assert_frame_equal(read_live(ea), read_live(eb))


def test_merge_on_read_chain(tmp_path, ray_session):
    lake, exp = seed(tmp_path, mor=True)
    assert_matches(exp, lake)
    commit(lake, [mk("update", 100, "u005", 900, "pt"),
                  mk("delete", 101, "u006", 901),
                  mk("insert", 102, "u901", 902, "fr")], 1)
    exp.refresh()
    assert_matches(exp, lake)
    # zero-delta contract: folding the MOR chain changes nothing
    before = read_live(exp)
    lake.compact_deltas()
    exp.refresh()
    pd.testing.assert_frame_equal(read_live(exp), before)


def test_start_shard_resume(tmp_path, ray_session):
    lake, exp = seed(tmp_path)
    full = read_live(exp)
    part = read_live(exp, start_shard=3)
    assert set(part["shard"]) == {s for s in full["shard"] if s >= 3}
    pd.testing.assert_frame_equal(
        part, full[full["shard"] >= 3].reset_index(drop=True))


def test_guards(tmp_path, ray_session):
    lake, exp = seed(tmp_path)
    with pytest.raises(ValueError, match="mis-route"):
        LakeShuffledExport(lake, tmp_path / "shuf", columns=["lang"],
                           n_shards=NSH + 1).refresh()
    with pytest.raises(ValueError, match="not in layout columns"):
        exp.read_live(columns=["html"])
    got = read_live(exp, columns=["url"])
    assert list(got.columns) == ["url", "shard", "pos"]


# ---------------------------------------------------------------------------
# read_packed: per-shard tokenize-and-pack over the maintained shuffle


def mk_doc(op, seq, url, ts, text):
    return {"op": op, "seq": seq, "url": url,
            "warc_ts": pd.Timestamp(ts, unit="s"), "text": text}


def seed_docs(tmp_path):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    rows = [mk_doc("insert", i, f"u{i:03d}", 100 + i,
                   " ".join(f"w{j}" for j in range((i * 7) % 11)))
            for i in range(80)]  # token counts 0..10 incl. empty docs
    commit(lake, rows, 0)
    exp = LakeShuffledExport(lake, tmp_path / "shuf",
                             columns=["text"], n_shards=NSH)
    exp.refresh()
    return lake, exp


def ref_packed(lake, L, n_shards=NSH):
    """Row-at-a-time reference: shard + order like ref_shuffle, then
    cut each shard's token stream into L-token examples."""
    df = lake.read_pandas()
    h = np.array([int(hashlib.md5(u.encode()).hexdigest()[:8], 16)
                  for u in df["url"]], dtype=np.int64)
    df = df.assign(_h=h, shard=(h % n_shards).astype(np.int64))
    df = df.sort_values(["shard", "_h", "url"], kind="stable")
    out = []
    for sid, g in df.groupby("shard", sort=True):
        off = 0
        for _, r in g.iterrows():
            n = len(str(r["text"]).split()) if pd.notna(r["text"]) else 0
            if n == 0:
                continue
            cs, ce = off, off + n
            for eid in range(cs // L, (ce - 1) // L + 1):
                out.append({
                    "url": r["url"], "shard": int(sid),
                    "example_id": eid,
                    "ex_off": max(cs, eid * L) - eid * L,
                    "tok_lo": max(0, eid * L - cs),
                    "tok_hi": min(n, (eid + 1) * L - cs),
                    "n_tokens": n})
            off = ce
    cols = ["url", "shard", "example_id", "ex_off", "tok_lo", "tok_hi",
            "n_tokens"]
    return pd.DataFrame(out, columns=cols).astype(
        {c: "int64" for c in cols[1:]})


def read_packed(exp, L, **kw):
    df = exp.read_packed(L, **kw).to_pandas()
    return df.sort_values(["shard", "example_id", "tok_lo", "url"],
                          kind="stable").reset_index(drop=True)


def test_read_packed_matches_reference(tmp_path, ray_session):
    lake, exp = seed_docs(tmp_path)
    got = read_packed(exp, 16)
    want = ref_packed(lake, 16).sort_values(
        ["shard", "example_id", "tok_lo", "url"],
        kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # delta-bearing head (update grows a doc, delete removes one)
    commit(lake, [mk_doc("update", 100, "u001", 900, "a b c d e f g"),
                  mk_doc("delete", 101, "u002", 901, None)], 1)
    exp.refresh()
    got = read_packed(exp, 16)
    want = ref_packed(lake, 16).sort_values(
        ["shard", "example_id", "tok_lo", "url"],
        kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # compaction invariance
    exp.compact()
    pd.testing.assert_frame_equal(read_packed(exp, 16), want)


def test_commit_perturbs_only_its_shards(tmp_path, ray_session):
    lake, exp = seed_docs(tmp_path)
    before = read_packed(exp, 16)
    head = max(s["cid"] for s in exp._live_segments())
    commit(lake, [mk_doc("update", 200, "u005", 900, "x y z")], 1)
    exp.refresh()
    touched = exp.shards_touched_since(head)
    # EXACTLY the changed key's shard — even under copy-on-write,
    # where the lake rewrote a whole partition: the segment writer
    # cancels content-equal -1/+1 pairs of co-located untouched keys
    sid = int(_md5_32(np.array(["u005"], dtype=object))[0] % NSH)
    assert touched == {sid}
    after = read_packed(exp, 16)
    # every untouched shard's example stream is IDENTICAL — the
    # incremental-consumer contract
    keep = ~before["shard"].isin(touched)
    pd.testing.assert_frame_equal(
        before[keep].reset_index(drop=True),
        after[~after["shard"].isin(touched)].reset_index(drop=True))
    # and compaction reports every held shard (files rewritten)
    exp.compact()
    assert exp.shards_touched_since(head) == set(
        after["shard"].unique().tolist()) | touched


def test_read_packed_guards(tmp_path, ray_session):
    lake, exp = seed(tmp_path)  # columns=["lang"], no text
    with pytest.raises(ValueError, match="not in layout columns"):
        exp.read_packed(16)
    lake2, exp2 = seed_docs(tmp_path / "d")
    with pytest.raises(ValueError, match="seq_len"):
        exp2.read_packed(0)

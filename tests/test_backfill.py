"""Versioned backfill: chunked exactly-once reprocess of lake history.

Pinned invariants: chunked == one-shot bit-for-bit; pending() is
metadata-only and re-arms when ingest rewrites a backfilled partition;
the binlog cursor passes through backfill commits untouched; transform
contract violations fail loudly inside the rewrite task.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pandas as pd
import pytest

from chomper_ray.pipelines.cdc import run_cdc
from chomper_ray.sources.events import generate_change_stream
from chomper_ray.state.backfill import BackfillError, LakeBackfill
from chomper_ray.state.lake import LakeTable

PARAMS = dict(n_events=1500, n_urls=300, n_epochs=3, seed=19,
              evolution_epoch=2)
NP = 5


def make_enrich():
    # a closure so cloudpickle ships it by value (a module-level test
    # function would pickle by reference to a module workers can't import)
    def enrich(t: pa.Table) -> pa.Table:
        # idempotent, null-safe token count (the canonical backfill)
        txt = pc.fill_null(t["text"], "")
        n = pc.list_value_length(
            pc.split_pattern(txt, " ")).cast(pa.int64())
        if "n_tokens" in t.column_names:
            return t.set_column(t.schema.get_field_index("n_tokens"),
                                "n_tokens", n)
        return t.append_column("n_tokens", n)
    return enrich


enrich = make_enrich()


@pytest.fixture(scope="module")
def log(tmp_path_factory):
    return generate_change_stream(
        tmp_path_factory.mktemp("bflog") / "log", **PARAMS)


def _fresh_lake(log, root):
    run_cdc(log, root, num_partitions=NP)
    return LakeTable(root, num_partitions=NP)


def test_chunked_equals_oneshot_and_values_exact(log, tmp_path):
    a = _fresh_lake(log, tmp_path / "a")
    b = _fresh_lake(log, tmp_path / "b")
    chunks = LakeBackfill(a, "tok-v1", enrich).run(
        max_partitions_per_commit=2)
    assert [c.partitions_touched for c in chunks] == [2, 2, 1]
    one = LakeBackfill(b, "tok-v1", enrich).run()
    assert [c.partitions_touched for c in one] == [NP]
    assert a.snapshot_hash() == b.snapshot_hash()
    df = a.read().to_pandas()
    want = df["text"].fillna("").str.split(" ").str.len()
    assert (df["n_tokens"] == want).all()


def test_rerun_is_noop_and_pending_metadata_only(log, tmp_path):
    lake = _fresh_lake(log, tmp_path / "l")
    bf = LakeBackfill(lake, "tok-v1", enrich)
    assert bf.pending() == list(range(NP))
    bf.run(2)
    assert bf.pending() == []
    assert bf.run(2) == []  # exactly-once: nothing recommitted
    # a DIFFERENT backfill id sees everything pending again
    assert LakeBackfill(lake, "tok-v2", enrich).pending() == \
        list(range(NP))


def test_resume_after_crash_between_chunks(log, tmp_path):
    # crash = a fresh process re-instantiating from the manifests alone
    lake = _fresh_lake(log, tmp_path / "l")
    LakeBackfill(lake, "tok-v1", enrich).run_chunk(max_partitions=2)
    resumed = LakeBackfill(LakeTable(tmp_path / "l", num_partitions=NP),
                           "tok-v1", enrich)
    assert len(resumed.pending()) == NP - 2
    resumed.run(2)
    assert resumed.pending() == []
    ref = _fresh_lake(log, tmp_path / "ref")
    LakeBackfill(ref, "tok-v1", enrich).run()
    assert LakeTable(tmp_path / "l",
                     num_partitions=NP).snapshot_hash() == \
        ref.snapshot_hash()


def test_ingest_rearms_touched_partitions_and_converges(log, tmp_path):
    # backfill epochs [0,1], then ingest epoch 2 (which rewrites some
    # partitions); those partitions read as pending again and a final
    # run converges to exactly the backfill-after-everything state
    root = tmp_path / "l"
    run_cdc(log, root, num_partitions=NP, max_epochs=2)
    lake = LakeTable(root, num_partitions=NP)
    bf = LakeBackfill(lake, "tok-v1", enrich)
    bf.run()
    assert bf.pending() == []
    cursor = lake.last_applied_log_epoch()
    res = run_cdc(log, root, num_partitions=NP)  # cursor-resume works
    assert res.epochs_run == [2] and cursor == 1
    rearmed = bf.pending()
    assert rearmed  # epoch 2 touched at least one partition
    bf.run()
    assert bf.pending() == []
    # new rows got the column too (transform idempotent on old rows)
    df = lake.read().to_pandas()
    want = df["text"].fillna("").str.split(" ").str.len()
    assert (df["n_tokens"] == want).all()
    ref = _fresh_lake(log, tmp_path / "ref")
    LakeBackfill(ref, "tok-v1", enrich).run()
    # content-equal modulo COLUMN ORDER: additive columns land in
    # arrival order (n_tokens before extra_score when backfill preceded
    # the evolution epoch) — the same history-dependence ingest
    # evolution itself has, so compare with columns aligned by name
    got = lake.read().to_pandas()
    ref_df = ref.read().to_pandas()
    cols = sorted(got.columns)
    assert cols == sorted(ref_df.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values("url").reset_index(drop=True),
        ref_df[cols].sort_values("url").reset_index(drop=True))


def test_binlog_cursor_passes_through(log, tmp_path):
    root = tmp_path / "l"
    run_cdc(log, root, num_partitions=NP, max_epochs=2)
    lake = LakeTable(root, num_partitions=NP)
    LakeBackfill(lake, "tok-v1", enrich).run(2)
    assert lake.last_applied_log_epoch() == 1  # untouched by chunks
    assert lake.last_committed_epoch() > 1     # chain head advanced


def test_contract_violations_raise(log, tmp_path):
    lake = _fresh_lake(log, tmp_path / "l")

    def drops_column(t):
        return t.drop_columns(["lang"])

    with pytest.raises(BackfillError, match="dropped"):
        LakeBackfill(lake, "bad-drop", drops_column).run_chunk()

    def mutates_key(t):
        u = pc.utf8_upper(t["url"])
        return t.set_column(t.schema.get_field_index("url"), "url", u)

    with pytest.raises(Exception, match="BackfillError|modified"):
        LakeBackfill(lake, "bad-key", mutates_key).run_chunk()

    def changes_rows(t):
        return t.slice(0, max(0, t.num_rows - 1)) if t.num_rows else t

    with pytest.raises(Exception, match="BackfillError|row count"):
        LakeBackfill(lake, "bad-rows", changes_rows).run_chunk()

    # failed chunks committed nothing
    assert LakeBackfill(lake, "tok-v1", enrich).pending() == \
        list(range(NP))


def test_rewrite_only_transform_keeps_schema(log, tmp_path):
    # backfill that rewrites an existing column (no schema change)
    lake = _fresh_lake(log, tmp_path / "l")

    def upper_lang(t):
        u = pc.utf8_upper(pc.fill_null(t["lang"], ""))
        return t.set_column(t.schema.get_field_index("lang"), "lang", u)

    LakeBackfill(lake, "lang-upper-v1", upper_lang).run(3)
    df = lake.read().to_pandas()
    assert (df["lang"].fillna("") ==
            df["lang"].fillna("").str.upper()).all()
    assert "n_tokens" not in df.columns


def test_derived_structures_track_backfill_commits(log, tmp_path):
    # a backfill changes LIVE values, so its manifests carry REAL
    # lineage rows — matview and inverted index must fold the value
    # changes instead of treating it like purge's zero-delta
    from chomper_ray.state.index import LakeTextIndex
    from chomper_ray.state.matview import MaterializedAgg

    lake = _fresh_lake(log, tmp_path / "l")

    def contrib(df):
        out = df[["lang"]].copy()
        out["one"] = 1
        return out

    view = MaterializedAgg(lake, tmp_path / "mv", contrib,
                           group_cols=["lang"], value_cols=["one"],
                           read_columns=["url", "lang"])
    before = view.refresh()
    assert (before["lang"] == before["lang"].str.lower()).all()
    idx = LakeTextIndex(lake, tmp_path / "idx", num_partitions=8)
    idx.refresh()
    assert idx.postings("zzznew").empty

    def rewrite(t):
        lang = pc.utf8_upper(pc.fill_null(t["lang"], ""))
        txt = pc.binary_join_element_wise(
            pc.fill_null(t["text"], ""), "zzznew", " ")
        t = t.set_column(t.schema.get_field_index("lang"), "lang", lang)
        return t.set_column(t.schema.get_field_index("text"), "text", txt)

    LakeBackfill(lake, "v2", rewrite).run(max_partitions_per_commit=2)

    after = view.refresh()
    assert (after["lang"] == after["lang"].str.upper()).all()
    assert after["n_live"].sum() == before["n_live"].sum()

    idx.refresh()
    n_live = int(before["n_live"].sum())
    post = idx.postings("zzznew")
    assert len(post) == n_live  # every live doc gained the token
    # maintained index == from-scratch rebuild on the backfilled lake
    fresh = LakeTextIndex(lake, tmp_path / "idx2", num_partitions=8)
    fresh.refresh()
    got = post.sort_values("doc").reset_index(drop=True)
    want = fresh.postings("zzznew").sort_values("doc") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

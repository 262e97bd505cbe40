"""Property tests for the lake→lake derivation families: for ANY
random commit sequence of inserts / updates / deletes (with filter
transitions riding the status flips), after EVERY refresh the
downstream state equals the transform of the upstream LWW live state —
DerivedLakeTable (1:1), ExplodedLakeTable (1→N), and the outbound
envelope bus (roundtrip into a fresh lake)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

from chomper_ray.state.derivedtable import (DerivedLakeTable,
                                            ExplodedLakeTable)
from chomper_ray.state.lake import LakeTable

_op = st.tuples(
    st.sampled_from(["insert", "update", "delete"]),
    st.integers(0, 6),                    # url index (collisions likely)
    st.sampled_from([200, 200, 404]),     # status (filter transitions)
    st.integers(0, 12),                   # text length
)


def _mk_clean():
    def clean(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["fetch_status"].fillna(0).astype("int64") == 200]
        return pd.DataFrame({
            "url": keep["url"],
            "n_chars": keep["text"].fillna("").str.len().astype("int64"),
        })
    return clean


def _mk_chunker():
    def chunker(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["fetch_status"].fillna(0).astype("int64") == 200]
        rows = []
        for url, text in zip(keep["url"], keep["text"].fillna("")):
            for i in range(0, max(len(text), 1), 4):
                rows.append((f"{url}#{i // 4}", url, text[i:i + 4]))
        return pd.DataFrame(rows, columns=["chunk_id", "url",
                                           "chunk_text"])
    return chunker


clean, chunker = _mk_clean(), _mk_chunker()

CLEAN_SCHEMA = pa.schema([("url", pa.string()), ("n_chars", pa.int64())])
CHUNK_SCHEMA = pa.schema([("chunk_id", pa.string()),
                          ("url", pa.string()),
                          ("chunk_text", pa.string())])


def _commit_ops(lake, ops, epoch, seq0):
    rows = []
    for i, (op, ui, status, tlen) in enumerate(ops):
        rows.append({
            "op": op, "seq": seq0 + i, "url": f"u{ui}",
            "warc_ts": pd.Timestamp(100 + seq0 + i, unit="s"),
            "fetch_status": None if op == "delete" else status,
            "text": None if op == "delete" else "abcdefghijkl"[:tlen],
        })
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)
    return seq0 + len(rows)


@settings(max_examples=6, deadline=None)
@given(epochs=st.lists(st.lists(_op, min_size=1, max_size=5),
                       min_size=1, max_size=3))
def test_derived_random_op_sequences(epochs, tmp_path_factory,
                                     ray_session):
    tmp_path = tmp_path_factory.mktemp("dprop")
    up = LakeTable(tmp_path / "up", key="url", num_partitions=3,
                   collect_changes=False)
    dt = DerivedLakeTable(up, tmp_path / "down", clean, CLEAN_SCHEMA,
                          lake_kwargs={"num_partitions": 2})
    seq = 0
    for ei, ops in enumerate(epochs):
        seq = _commit_ops(up, ops, ei, seq)
        dt.refresh()
        live = up.read_pandas()
        exp = clean(live).sort_values("url").reset_index(drop=True) \
            if len(live) else pd.DataFrame(columns=["url", "n_chars"])
        got = dt.table.read_pandas()
        got = (got[["url", "n_chars"]].sort_values("url")
               .reset_index(drop=True)) if len(got) else \
            pd.DataFrame(columns=["url", "n_chars"])
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(max_examples=6, deadline=None)
@given(epochs=st.lists(st.lists(_op, min_size=1, max_size=5),
                       min_size=1, max_size=3))
def test_exploded_random_op_sequences(epochs, tmp_path_factory,
                                      ray_session):
    tmp_path = tmp_path_factory.mktemp("eprop")
    up = LakeTable(tmp_path / "up", key="url", num_partitions=3,
                   collect_changes=False)
    dt = ExplodedLakeTable(up, tmp_path / "chunks", chunker,
                           CHUNK_SCHEMA, derived_key="chunk_id",
                           lake_kwargs={"num_partitions": 2})
    cols = ["chunk_id", "url", "chunk_text"]
    seq = 0
    for ei, ops in enumerate(epochs):
        seq = _commit_ops(up, ops, ei, seq)
        dt.refresh()
        live = up.read_pandas()
        exp = chunker(live).sort_values("chunk_id") \
            .reset_index(drop=True) if len(live) else \
            pd.DataFrame(columns=cols)
        got = dt.table.read_pandas()
        got = (got[cols].sort_values("chunk_id")
               .reset_index(drop=True)) if len(got) else \
            pd.DataFrame(columns=cols)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(max_examples=4, deadline=None)
@given(epochs=st.lists(st.lists(_op, min_size=1, max_size=5),
                       min_size=1, max_size=3))
def test_outbound_random_op_sequences_roundtrip(epochs, tmp_path_factory,
                                                ray_session):
    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.sources import envelopes
    from chomper_ray.state.outbound import LakeChangeExporter

    tmp_path = tmp_path_factory.mktemp("oprop")
    src = LakeTable(tmp_path / "src", key="url", num_partitions=3,
                    collect_changes=False)
    seq = 0
    for ei, ops in enumerate(epochs):
        seq = _commit_ops(src, ops, ei, seq)
    LakeChangeExporter(src, tmp_path / "bus").export()
    run_cdc(tmp_path / "bus", tmp_path / "re", num_partitions=3,
            source=envelopes)
    a = src.read_pandas()
    b = LakeTable(tmp_path / "re", num_partitions=3).read_pandas()
    a = a.sort_values("url").reset_index(drop=True)
    cols = list(a.columns)
    b = (b[cols].sort_values("url").reset_index(drop=True)) \
        if len(b) else pd.DataFrame(columns=cols)
    if not len(a):
        assert not len(b)
    else:
        pd.testing.assert_frame_equal(b, a, check_dtype=False)

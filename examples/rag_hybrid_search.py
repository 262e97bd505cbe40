"""Always-fresh hybrid retrieval under CDC — the round-4 RAG
composition end to end:

  binlog tail →(embed at ingest)→ lake (text + embedding columns)
                 └─ after_commit → LakeTextIndex.refresh()
                                   LakeANNIndex.refresh()
  query time:  hybrid_rrf(text_idx, ann_idx, tokens, qvec)
               — BM25 + cosine fused by reciprocal rank, fresh at the
                 lake head with NO index rebuild (both fold each commit
                 as LSM delta segments).

The embedder is a deterministic hashed bag-of-words projection (a
stand-in for a model actor pool — same batch-callable shape run_cdc's
epoch_transform expects), so the whole example is reproducible and
asserts exact invariants: an update that adds the query tokens pulls
its page into the fused top-k, and compacting either index never
changes an answer.

Run: ``python examples/rag_hybrid_search.py``.
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DIM = 16


def make_embedder(dim: int = DIM):
    """Vectorized hashed-BoW embedder: token → SipHash bucket → counts
    → L2 normalize. Deterministic across processes (fixed hash key),
    null text → null embedding (tombstones carry no vector)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def embed(batch: pa.Table) -> pa.Table:
        # must handle the EMPTY batch too: run_cdc probes the
        # post-transform schema by pushing an empty table through
        if "text" not in batch.schema.names:
            return batch
        texts = batch["text"].to_pandas()
        ex = texts.fillna("").str.split(" ").explode()
        rows = ex.index.to_numpy()
        b = (pd.util.hash_pandas_object(ex, index=False)
             .to_numpy() % dim).astype(np.int64)
        m = np.zeros((batch.num_rows, dim), dtype=np.float64)
        np.add.at(m, (rows, b), 1.0)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        vecs = pa.array(
            [None if pd.isna(t) else m[i].tolist()
             for i, t in enumerate(texts)],
            type=pa.list_(pa.float32()))
        if "embedding" in batch.schema.names:
            batch = batch.drop_columns(["embedding"])
        return batch.append_column("embedding", vecs)

    return embed


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np

    from chomper_ray.pipelines.cdc import run_cdc
    from chomper_ray.sources.events import generate_change_stream
    from chomper_ray.state.annindex import LakeANNIndex
    from chomper_ray.state.index import LakeTextIndex
    from chomper_ray.state.lake import LakeTable
    from chomper_ray.state.retrieval import hybrid_rrf

    work = Path(tempfile.mkdtemp(prefix="rag_hybrid_"))
    log = generate_change_stream(work / "binlog", n_events=2400,
                                 n_urls=300, n_epochs=3, seed=23)

    lake = LakeTable(work / "lake", num_partitions=8,
                     collect_changes=False)
    tidx = LakeTextIndex(lake, work / "tix", num_partitions=16)
    aidx = LakeANNIndex(lake, work / "aix", n_cells=8)
    embed = make_embedder()

    def refresh(_commit):
        tidx.refresh()
        aidx.refresh()

    res = run_cdc(log, work / "lake", num_partitions=8,
                  epoch_transform=lambda _e: embed,
                  after_commit=refresh)
    print(f"ingested epochs {res.epochs_run}, "
          f"{res.events_applied} events; index segments: "
          f"text={tidx.stats()['segments']} ann={aidx.stats()['segments']}")

    tokens = ["ipsum", "magna"]
    qvec = np.asarray(
        make_embedder()(  # embed the query through the same projection
            __import__("pyarrow").table(
                {"text": [" ".join(tokens)]}))["embedding"][0].as_py())

    top = hybrid_rrf(tidx, aidx, tokens, qvec, k=5, fetch_k=50)
    print("\nfused top-5 at the live head:")
    print(top.to_string(index=False))

    # a fresh commit that makes one page scream the query tokens —
    # the maintained indexes fold it and the fused ranking moves
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    target = "https://example.org/hot-page"
    hot = pa.Table.from_pylist([{
        "op": "insert", "seq": 10_000_000, "url": target,
        "warc_ts": pd.Timestamp(10_000, unit="s"),
        "lang": "en", "fetch_status": np.int32(200),
        "text": " ".join(tokens * 12)}])
    lake.commit_epoch(rd.from_arrow(embed(hot)),
                      res.epochs_run[-1] + 1)
    refresh(None)
    top2 = hybrid_rrf(tidx, aidx, tokens, qvec, k=5, fetch_k=50)
    print("\nafter committing a page made of the query tokens:")
    print(top2.to_string(index=False))
    assert top2["doc"].iloc[0] == target, "hot page must lead the fusion"
    assert int(top2["r_bm25"].iloc[0]) == 1 and \
        int(top2["r_cos"].iloc[0]) == 1

    # compaction is invisible to answers (LSM contract on both indexes)
    tidx.compact()
    aidx.compact()
    top3 = hybrid_rrf(tidx, aidx, tokens, qvec, k=5, fetch_k=50)
    pd.testing.assert_frame_equal(top2, top3)
    print("\ncompaction: identical fused answers — OK")

    ray.shutdown()


if __name__ == "__main__":
    main()

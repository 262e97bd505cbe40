"""End-to-end training-data curation over the `documents` table:

    read → normalize → quality-score → filter → exact dedup →
    MinHash near-dup dedup → benchmark decontamination →
    duplicate-span removal (ExactSubstr) → token stats →
    source-mixture rates → balanced per-language mix →
    sequence packing (fixed-length training examples) →
    deterministic global pseudo-shuffle →
    resumable partitioned shards

Run standalone (owns its Ray session):

    python examples/training_data_pipeline.py [sf_dir] [out_dir]
"""

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="chomper_ray_shards_")

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.pipelines.relational import (hash_join,
                                                  mixture_sample,
                                                  stratified_sample)
    from chomper_ray.stages.dedup import (decontaminate, dedup_apply,
                                          exact_dedup, minhash_lsh_dedup,
                                          remove_duplicate_spans)
    from chomper_ray.stages.text import (QualityScorer, count_tokens,
                                         normalize_text)
    from chomper_ray.state.output import read_partitioned, write_partitioned

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"]).repartition(8)
    n0 = docs.count()

    # 1. normalize + quality filter (vectorized task pools)
    scored = docs.map_batches(normalize_text, batch_format="pandas") \
        .map_batches(QualityScorer(col="text_norm"), batch_format="pandas")
    kept = scored.map_batches(
        lambda df: df[df["quality_score"] >= 0.3]
        [["doc_id", "text_norm", "lang"]]
        .rename(columns={"text_norm": "text"}),
        batch_format="pandas")

    # 2. exact dedup (hash-bucketed, value-verified); materialized because
    # three consumers follow (count, near-dup signatures, dedup_apply)
    uniq = exact_dedup(kept, col="text", id_col="doc_id").materialize()
    n_exact = uniq.count()

    # 3. near-dup dedup: clusters stay a Dataset end-to-end; dropping
    # non-representative members is a bucketed anti-join — no driver-side
    # id set, no matter how many duplicates the corpus holds
    clusters_ds, _pairs = minhash_lsh_dedup(uniq, threshold=0.8)
    n_near_dropped = clusters_ds.map_batches(
        lambda df: df[df["id"] != df["rep"]][["id"]]
        if len(df) else df, batch_format="pandas").count()
    deduped = dedup_apply(uniq, clusters_ds, id_col="doc_id")

    # 3b. eval-set decontamination: drop docs sharing any token n-gram
    # with the held-out benchmark slice (broadcast hash set; corpus
    # rows never shuffle)
    # (normalized the same way as the corpus so n-grams align)
    bench = docs.filter(lambda r: r["doc_id"] % 199 == 0) \
        .map_batches(normalize_text, batch_format="pandas") \
        .map_batches(lambda df: df[["doc_id", "text_norm"]]
                     .rename(columns={"text_norm": "text"}),
                     batch_format="pandas")
    clean = decontaminate(deduped, bench, n=3, drop=True).materialize()

    # 3c. ExactSubstr duplicate-span removal: any 12-token window still
    # duplicated across the survivors is cut from all but its first
    # occurrence; docs emptied by the cut drop. lang rejoins on the
    # bucketed doc spine (the span stage's output is (doc_id, text)).
    import pyarrow as pa

    spans = remove_duplicate_spans(clean, window=12) \
        .map_batches(lambda df: df[df["text_dedup"].notna()
                                   & (df["text_dedup"] != "")]
                     .rename(columns={"text_dedup": "text"}),
                     batch_format="pandas")
    spine = clean.map_batches(lambda df: df[["doc_id", "lang"]],
                              batch_format="pandas")
    rejoined = hash_join(
        spans, spine, on="doc_id",
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("text", pa.string())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("lang", pa.string())]))
    # materialized: two consumers follow (count for the mix cap, sample)
    final = rejoined.map_batches(count_tokens,
                                 batch_format="pandas").materialize()
    n_decontaminated = final.count()

    # 4. source-mixture rates (the Dolma-style knob: deterministic,
    # re-tune consistent), then a hard per-language cap
    rated = mixture_sample(final, group="lang", key="doc_id",
                           rates={"en": 1.0, "fr": 0.9, "de": 0.9},
                           default=0.7)
    mixed = stratified_sample(rated, group="lang", key="doc_id",
                              n=max(50, final.count() // 8))

    # 5. sequence packing: the surviving corpus cut into fixed-length
    # training examples (spans only — text never ships through the
    # packing shuffle); materialized for the two consumers below
    from chomper_ray.stages.text import pack_sequences

    mixed = mixed.materialize()
    spans = pack_sequences(mixed, seq_len=256, num_partitions=8)
    n_examples = 1 + spans.map_batches(
        lambda df: df[["example_id"]], batch_format="pandas") \
        .max("example_id")

    # 5b. the same packing budgeted in REAL BPE tokens: merges trained
    # on the curated mix (distributed word counts — shuffle volume is
    # the vocabulary — bounded driver fit), counts encoded distributed,
    # spans computed from n_col instead of whitespace
    from chomper_ray.stages.bpe import bpe_encode, bpe_train

    model = bpe_train(mixed, n_merges=200, max_words=50_000)
    bspans = pack_sequences(
        bpe_encode(mixed, model, counts_only=True), seq_len=256,
        n_col="n_bpe_tokens", num_partitions=8)
    n_bpe_examples = 1 + bspans.map_batches(
        lambda df: df[["example_id"]], batch_format="pandas") \
        .max("example_id")

    # 6. deterministic global pseudo-shuffle (no random state; retries
    # byte-identical) + resumable partitioned shards of the doc payload
    from chomper_ray.state.output import read_shuffled, shuffled_export

    shuffled_export(mixed, f"{out_dir}/shuffled", key="doc_id",
                    n_shards=8)
    stats = write_partitioned(mixed, f"{out_dir}/byid", key="doc_id",
                              num_partitions=16)
    back = read_partitioned(f"{out_dir}/byid")
    print(json.dumps({
        "input_docs": n0,
        "after_exact_dedup": n_exact,
        "near_dup_dropped": n_near_dropped,
        "after_decontamination": n_decontaminated,
        "packed_examples_256tok": int(n_examples),
        "packed_examples_256bpe": int(n_bpe_examples),
        "bpe_merges": len(model.merges),
        "shuffled_rows": read_shuffled(f"{out_dir}/shuffled").count(),
        "shard_partitions": stats["written"],
        "output_docs": back.count(),
        "out_dir": out_dir,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""BPE train + encode at scale (stages/bpe.py).

Claims under test:
  1. training's distributed phase shuffles the VOCABULARY, not the
     corpus (word counts via per-block combiner + one distinct-word
     groupby), and the driver fit is bounded by max_words;
  2. distributed encoding sustains a useful docs/s with the broadcast
     rank table + per-block distinct-word memo, consumed streaming
     (no driver materialization of token lists);
  3. a sampled set of docs encodes identically to the driver-side
     reference function.

Docs are pure functions of their id (zipf-skewed word draws over a
letter-string vocabulary, so merges do real character work).

Usage: python scripts/stress_bpe.py [n_docs] [num_cpus]
       (defaults 1_000_000 32; smoke: 100000 8). One JSON line.
"""

import json
import resource
import sys
import tempfile  # noqa: F401  (parity with sibling stress scripts)
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
import pyarrow as pa

VOCAB = 12_000
DOC_LEN = 40
N_MERGES = 300
MAX_WORDS = 100_000


def word_str(i: int) -> str:
    out = []
    i = int(i) + 26          # at least 2 letters
    while i:
        out.append(chr(ord("a") + i % 26))
        i //= 26
    return "".join(out)


_WORDS = None


def words_table():
    global _WORDS
    if _WORDS is None:
        _WORDS = np.array([word_str(i) for i in range(VOCAB)],
                          dtype=object)
    return _WORDS


def text_of(i: int) -> str:
    rng = np.random.default_rng(int(i) ^ 0xB9E)
    u = rng.random(DOC_LEN)
    ids = (VOCAB * u * u).astype(np.int64)   # zipf-ish skew
    return " ".join(words_table()[ids])


def rss_mib() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from chomper_ray.stages.bpe import bpe_encode, bpe_train, encode_word

    rss0 = rss_mib()

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array([text_of(i) for i in ids])})

    ds = rd.range(n_docs).map_batches(gen, batch_format="pyarrow")

    t0 = time.perf_counter()
    model = bpe_train(ds, n_merges=N_MERGES, max_words=MAX_WORDS)
    train_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    enc = bpe_encode(ds, model, counts_only=True)
    total_tokens = int(enc.sum("n_bpe_tokens"))   # streaming consume
    encode_s = time.perf_counter() - t0

    # sampled exactness vs the driver reference
    import re
    ranks, rx = model.ranks(), re.compile(model.pattern)
    sample_ids = np.linspace(0, n_docs - 1, 50).astype(np.int64)
    want = []
    for i in sample_ids:
        n = 0
        for w in rx.findall(text_of(i)):
            n += len(encode_word(w, ranks))
        want.append(n)
    got_df = (bpe_encode(
        rd.from_arrow(pa.table({
            "doc_id": pa.array(sample_ids, type=pa.int64()),
            "text": pa.array([text_of(i) for i in sample_ids])})),
        model, counts_only=True).to_pandas()
        .sort_values("doc_id"))
    sample_exact = got_df["n_bpe_tokens"].tolist() == want

    print(json.dumps({
        "metric": "bpe_stress", "n_docs": n_docs, "num_cpus": num_cpus,
        "vocab": VOCAB, "n_merges": len(model.merges),
        "train_s": round(train_s, 2),
        "encode_s": round(encode_s, 2),
        "encode_docs_per_s": round(n_docs / encode_s, 1),
        "total_bpe_tokens": total_tokens,
        "tokens_per_word": round(total_tokens / (n_docs * DOC_LEN), 3),
        "sample_exact": bool(sample_exact),
        "driver_rss_delta_mib": round(rss_mib() - rss0, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""ExactSubstr duplicate-span removal vs a brute-force reference."""

import random

import pandas as pd
import pyarrow as pa

import ray.data as rd

from chomper_ray.stages.dedup import remove_duplicate_spans


def ref_remove(texts, L, sep=" "):
    toks = [t.split(sep) for t in texts]
    occ = {}
    for d, tk in enumerate(toks):
        for p in range(len(tk) - L + 1):
            occ.setdefault(tuple(tk[p:p + L]), []).append((d, p))
    rem = {}
    for os_ in occ.values():
        if len(os_) >= 2:
            for d, p in sorted(os_)[1:]:
                rem.setdefault(d, []).append(p)
    out = []
    for d, tk in enumerate(toks):
        cov = set()
        for p in rem.get(d, []):
            cov.update(range(p, p + L))
        kept = [t for i, t in enumerate(tk) if i not in cov]
        out.append(sep.join(kept) if kept else None)
    return out


def _run(texts, L):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)})).repartition(6)
    got = remove_duplicate_spans(ds, window=L, num_partitions=8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    return [v if pd.notna(v) else None for v in got["text_dedup"]]


def test_matches_reference_on_random_corpus():
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab)
                      for _ in range(rng.randint(0, 40)))
             for _ in range(150)]
    span = " ".join(rng.choice(vocab) for _ in range(15))
    for i in range(0, 150, 7):  # plant a shared 15-token span
        texts[i] = f"{texts[i]} {span} tail{i}"
    texts += ["", "single token doc"]
    for L in (3, 5, 12):
        assert _run(texts, L) == ref_remove(texts, L)


def test_keep_first_and_short_doc_semantics():
    span = "a b c d e"
    texts = [f"{span} x", f"y {span}", "a b c", f"z {span} q"]
    got = _run(texts, 5)
    # first occurrence (doc 0) keeps the span; later ones lose it
    assert got[0] == f"{span} x"
    assert got[1] == "y"
    assert got[2] == "a b c"      # shorter than window: untouched
    assert got[3] == "z q"


def test_fully_covered_doc_yields_null():
    span = "p q r"
    got = _run([span, span, f"{span} extra"], 3)
    assert got[0] == span and got[1] is None and got[2] == "extra"

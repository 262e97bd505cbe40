"""Multinomial Naive Bayes: distributed fit vs numpy oracle, scoring."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from chomper_ray.stages.text import nb_fit, nb_score


def _corpus():
    rows = [
        ("the cat sat on the mat", "en"),
        ("the dog ate the cat food", "en"),
        ("cat and dog and mat", "en"),
        ("le chat est sur le tapis", "fr"),
        ("le chien mange le chat", "fr"),
        ("chat et chien et tapis", "fr"),
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[0] for r in rows]),
        "lang": pa.array([r[1] for r in rows]),
    })).repartition(3), rows


def ref_model(rows, alpha=1.0):
    classes = sorted({r[1] for r in rows})
    toks = {c: [] for c in classes}
    for t, c in rows:
        toks[c].extend(t.split(" "))
    vocab = sorted({w for ws in toks.values() for w in ws})
    logp = {}
    unk = {}
    for c in classes:
        tot = len(toks[c])
        unk[c] = np.log(alpha / (tot + alpha * len(vocab)))
        for wtok in vocab:
            logp[(c, wtok)] = np.log(
                (toks[c].count(wtok) + alpha) / (tot + alpha * len(vocab)))
    priors = {c: np.log(sum(1 for r in rows if r[1] == c) / len(rows))
              for c in classes}
    return classes, vocab, priors, logp, unk


def test_fit_matches_closed_form():
    ds, rows = _corpus()
    m = nb_fit(ds, label_col="lang")
    classes, vocab, priors, logp, unk = ref_model(rows)
    assert list(m["classes"]) == classes
    assert list(m["vocab"]) == vocab
    for ci, c in enumerate(classes):
        assert np.isclose(m["priors"][ci], priors[c])
        assert np.isclose(m["unk"][ci], unk[c])
        for vi, wtok in enumerate(vocab):
            assert np.isclose(m["logp"][vi, ci], logp[(c, wtok)])


def test_score_recovers_separable_labels_and_handles_unseen():
    ds, rows = _corpus()
    m = nb_fit(ds, label_col="lang")
    scored = nb_score(ds, m).to_pandas().sort_values("doc_id")
    assert scored["nb_pred"].tolist() == [r[1] for r in rows]
    # unseen tokens route through the unk likelihood, no crash
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([99], pa.int64()),
        "text": pa.array(["zebra quark the cat"]),
    }))
    out = nb_score(new, m).to_pandas()
    assert out["nb_pred"].tolist() == ["en"]


def test_score_matches_manual_sum():
    ds, rows = _corpus()
    m = nb_fit(ds, label_col="lang")
    scored = nb_score(ds, m).to_pandas().sort_values("doc_id")
    classes, vocab, priors, logp, unk = ref_model(rows)
    for i, (t, _) in enumerate(rows):
        want = max(
            (round(priors[c] + sum(logp.get((c, w), unk[c])
                                   for w in t.split(" ")), 6), c)
            for c in classes)
        assert scored["nb_score"].iloc[i] == want[0]


def test_lm_bigram_fit_and_score_closed_form():
    import math

    from chomper_ray.stages.text import lm_fit, lm_score

    texts = ["a b a b", "a b c", "c", ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)})).repartition(2)
    model = lm_fit(ds, alpha=0.5)
    # corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1; vocab {a,b,c,""}=4
    v = model["vocab_n"]
    assert v == 4

    def p(a, b, c_ab, c_a):
        return math.log((c_ab + 0.5) / (c_a + 0.5 * v))

    got = lm_score(ds, model).to_pandas().sort_values("doc_id")
    exp0 = round(p("a", "b", 3, 3) + p("b", "a", 1, 2)
                 + p("a", "b", 3, 3), 6)
    exp1 = round(p("a", "b", 3, 3) + p("b", "c", 1, 2), 6)
    assert got["lm_logprob"].tolist() == [exp0, exp1, 0.0, 0.0]
    assert got["n_bigrams"].tolist() == [3, 2, 0, 0]
    # the repetitive high-probability doc outscores per bigram
    assert exp0 / 3 > exp1 / 2

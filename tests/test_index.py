"""Inverted index: build + AND/OR search vs brute force."""

import random

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from chomper_ray.state.index import build_inverted_index, search_index


def test_index_search_matches_brute_force(tmp_path):
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
             for _ in range(400)] + ["", "w0"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)})).repartition(5)
    root = str(tmp_path / "idx")
    st = build_inverted_index(ds, root, num_partitions=16)
    assert st["files"] >= 1 and st["postings"] > 0

    def brute(tokens, mode):
        out = []
        for i, t in enumerate(texts):
            words = set(t.split(" "))
            hit = all(q in words for q in tokens) if mode == "all" \
                else any(q in words for q in tokens)
            if hit:
                out.append(i)
        return out

    for tokens, mode in ([["w0"], "all"], [["w3", "w7"], "all"],
                         [["w3", "w7"], "any"],
                         [["w1", "nosuchtoken"], "all"],
                         [["nosuchtoken"], "any"]):
        got = search_index(root, tokens, mode=mode).tolist()
        assert got == brute(tokens, mode), (tokens, mode)


def test_bm25_matches_reference_formula(tmp_path):
    import math

    from chomper_ray.state.index import bm25_search

    texts = ["spark merge fast", "spark spark spark slow",
             "merge only here", "nothing relevant",
             "spark merge spark merge spark merge"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)})).repartition(2)
    root = str(tmp_path / "bm")
    build_inverted_index(ds, root, num_partitions=8)
    got = bm25_search(root, ["spark", "merge"], k=5)

    docs = [t.split(" ") for t in texts]
    n, avgdl = len(docs), sum(len(d) for d in docs) / len(docs)

    def score(di):
        s = 0.0
        for q in ("spark", "merge"):
            tf = docs[di].count(q)
            if not tf:
                continue
            df = sum(1 for d in docs if q in d)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75
                                               * len(docs[di]) / avgdl))
        return round(s, 6)

    exp = sorted(((score(i), i) for i in range(len(texts))
                  if score(i) > 0), key=lambda t: (-t[0], t[1]))
    assert got["doc_id"].tolist() == [i for _, i in exp]
    assert got["score"].tolist() == [s for s, _ in exp]
    # the doc stuffed with both terms ranks first
    assert got["doc_id"].iloc[0] == 4


def test_phrase_search_matches_substring_semantics(tmp_path):
    from chomper_ray.state.index import phrase_search

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
             for _ in range(300)]
    texts += ["w1 w2 w3", "w3 w2 w1", "w1 w2", "w2 w3 w1 w2 w3", ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)})).repartition(5)
    root = str(tmp_path / "pidx")
    build_inverted_index(ds, root, num_partitions=16, positions=True)

    def brute(phrase):
        return [i for i, t in enumerate(texts)
                if f" {phrase} " in f" {t} "]

    for phrase in ("w1 w2", "w1 w2 w3", "w2 w3", "w5",
                   "w1 w1", "w9 nosuch"):
        got = phrase_search(root, phrase).tolist()
        assert got == brute(phrase), phrase


def test_phrase_search_requires_positions(tmp_path):
    import pytest as _pytest

    from chomper_ray.state.index import phrase_search

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["a b"])}))
    root = str(tmp_path / "np")
    build_inverted_index(ds, root, num_partitions=4)
    with _pytest.raises(ValueError, match="positions=True"):
        phrase_search(root, "a b")

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

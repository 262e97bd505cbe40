"""PageRank: power-iteration parity with a numpy oracle."""

import random

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from chomper_ray.stages.graph import pagerank


def ref_pagerank(edges, d=0.85, iters=10):
    e = sorted(set(edges))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    idx = {n: i for i, n in enumerate(nodes)}
    deg = np.zeros(len(nodes))
    for a, _ in e:
        deg[idx[a]] += 1
    r = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(iters):
        dang = r[deg == 0].sum()
        nr = np.full(len(nodes), (1 - d) / len(nodes)
                     + d * dang / len(nodes))
        for a, b in e:
            nr[idx[b]] += d * r[idx[a]] / deg[idx[a]]
        r = nr
    return dict(zip(nodes, r))


def _edges_ds(edges):
    return rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64()),
    })).repartition(4)


def test_random_graph_with_dangling_matches_numpy():
    rng = random.Random(3)
    edges = list({(rng.randint(0, 40), rng.randint(0, 40))
                  for _ in range(150)})
    edges += [(100, 101)]  # 101 is dangling
    got = pagerank(_edges_ds(edges), iters=3, num_partitions=4) \
        .to_pandas()
    exp = ref_pagerank(edges, iters=3)
    g = dict(zip(got["node"], got["rank"]))
    assert set(g) == set(exp)
    assert abs(sum(g.values()) - 1.0) < 1e-12
    assert max(abs(g[n] - exp[n]) for n in exp) < 1e-12


def test_cycle_is_uniform_and_multi_edges_collapse():
    # uniform is the cycle's fixed point from iteration 0, so two
    # iterations prove both the update rule and multi-edge collapse
    cyc = [(0, 1), (1, 2), (2, 0), (0, 1), (0, 1)]
    got = pagerank(_edges_ds(cyc), iters=2, num_partitions=4).to_pandas()
    assert np.allclose(got["rank"], 1 / 3, atol=1e-12)


def test_star_sink_accumulates_rank():
    star = [(i, 99) for i in range(1, 6)]
    got = pagerank(_edges_ds(star), iters=3, num_partitions=4) \
        .to_pandas().set_index("node")["rank"]
    exp = ref_pagerank(star, iters=3)
    assert got[99] == got.max()
    assert np.allclose(got.sum(), 1.0, atol=1e-12)
    assert max(abs(got[n] - exp[n]) for n in exp) < 1e-12

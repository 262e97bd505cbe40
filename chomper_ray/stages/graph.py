"""Graph operators over edge Datasets: PageRank (power iteration).

Connected components live in ``stages/dedup.py`` (``components_ds``,
built for the dedup families and oracle-verified through the
order-chain query); this module adds the rank-propagation family.

PageRank shape per iteration (Pregel semantics, Ray-Data-expressed):
ranks ride a bucketed ``hash_join`` onto the (degree-annotated) edge
Dataset by source, contributions pre-sum inside ``grouped_agg``'s
per-block combiner, and the new rank vector is one left join back onto
the node spine — ranks stay a Dataset of O(nodes) end to end; the
driver only ever sees scalar aggregates (the dangling-mass sum).

Scale note: each iteration re-shuffles the edge Dataset through the
join (Ray Data has no persistent partitioning to pin edges once, the
way a Pregel engine would); with E edges and T iterations the bill is
T × O(E) exchange. Dangling-node mass is handled exactly: nodes with no
out-edges are flagged ONCE at init (anti join), and their rank total —
a map-side filtered sum, no shuffle — redistributes uniformly each
iteration, so ranks always sum to 1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pagerank(edges, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 10,
             num_partitions: int = 32, ndigits: int | None = None):
    """Power-iteration PageRank over a directed edge Dataset.

    Multi-edges collapse to simple edges (DISTINCT, matching the SQL
    formulation); every node appearing on either side is ranked.
    Returns a Dataset ``(node:int64, rank:float64)`` summing to 1.
    """
    from chomper_ray.pipelines.relational import (distinct, grouped_agg,
                                                  hash_join)

    def pick(a, b):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({a: t[b].cast(pa.int64())})
        return f

    e = distinct(
        edges.map_batches(
            lambda t: pa.table({"src": t[src].cast(pa.int64()),
                                "dst": t[dst].cast(pa.int64())}),
            batch_format="pyarrow"),
        ["src", "dst"], num_partitions=num_partitions).materialize()
    nodes = distinct(
        e.map_batches(pick("n", "src"), batch_format="pyarrow")
        .union(e.map_batches(pick("n", "dst"), batch_format="pyarrow")),
        ["n"], num_partitions=num_partitions).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "rank": pa.array([], pa.float64())}))

    deg = grouped_agg(e, keys=["src"], counts=True)  # (src, n_rows)
    ew = hash_join(
        e, deg, on="src", num_buckets=num_partitions,
        left_schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        right_schema=pa.schema([("src", pa.int64()),
                                ("n_rows", pa.int64())])) \
        .map_batches(
            lambda df: pd.DataFrame({
                "src": df["src"].astype("int64"),
                "dst": df["dst"].astype("int64"),
                "inv_deg": 1.0 / df["n_rows"].astype("float64")}),
            batch_format="pandas").materialize()

    # dangling flag computed once: node has no out-edge
    deg_nodes = deg.map_batches(pick("n", "src"), batch_format="pyarrow")
    node_schema = pa.schema([("n", pa.int64())])
    from chomper_ray.pipelines.relational import _hash_semi_anti

    dangling = _hash_semi_anti(nodes, deg_nodes, on="n", right_on="n",
                               anti=True, num_buckets=num_partitions,
                               left_schema=node_schema)
    flagged = nodes.map_batches(
        lambda df: df.assign(dang=False), batch_format="pandas").union(
        dangling.map_batches(
            lambda df: df.assign(dang=True), batch_format="pandas"))
    # (n, dang): one row per node — dangling rows override via max()
    spine = grouped_agg(flagged.map_batches(
        lambda df: df.assign(dang=df["dang"].astype("int64")),
        batch_format="pandas"), keys=["n"], maxs=["dang"],
        counts=False).map_batches(
            lambda df: pd.DataFrame({
                "n": df["n"].astype("int64"),
                "dang": df["max_dang"].astype(bool)}),
            batch_format="pandas").materialize()

    # one cheap scan of the materialized spine: a graph with no dangling
    # nodes (e.g. any symmetric/bipartite-both-ways graph) skips the
    # per-iteration mass aggregate entirely
    n_dangling = int(spine.map_batches(
        lambda df: pd.DataFrame({"c": [int(df["dang"].sum())]}),
        batch_format="pandas").sum("c") or 0)

    r0 = 1.0 / n_nodes
    ranks = spine.map_batches(lambda df: df.assign(r=r0),
                              batch_format="pandas").materialize()
    base = (1.0 - damping) / n_nodes
    rank_schema = pa.schema([("n", pa.int64()), ("dang", pa.bool_()),
                             ("r", pa.float64())])
    ew_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                           ("inv_deg", pa.float64())])

    for _ in range(iters):
        if n_dangling:
            dang_mass = float(ranks.map_batches(
                lambda df: pd.DataFrame(
                    {"m": [float(df.loc[df["dang"], "r"].sum())]}),
                batch_format="pandas").sum("m") or 0.0)
        else:
            dang_mass = 0.0
        contrib = hash_join(
            ew,
            ranks.map_batches(
                lambda df: df.rename(columns={"n": "src"})[["src", "r"]],
                batch_format="pandas"),
            on="src", num_buckets=num_partitions,
            left_schema=ew_schema,
            right_schema=pa.schema([("src", pa.int64()),
                                    ("r", pa.float64())]))
        # per-block combiner: one (dst, partial w) row per dst per block
        contrib = contrib.map_batches(
            lambda df: pd.DataFrame({
                "n": df["dst"].astype("int64"),
                "w": df["r"].to_numpy() * df["inv_deg"].to_numpy(),
                "dang": False, "side": np.int8(1)})
            .groupby(["n", "dang", "side"], as_index=False)["w"].sum(),
            batch_format="pandas")
        # ONE shuffle finishes the iteration: contrib partials and the
        # node spine co-bucket on n; per bucket a vectorized sum + merge
        # emits the new rank rows (fused grouped_agg + left join)
        tagged_spine = spine.map_batches(
            lambda df: df.assign(w=0.0, side=np.int8(0))[
                ["n", "w", "dang", "side"]],
            batch_format="pandas")
        add = damping * dang_mass / n_nodes

        def bucket(t: pa.Table) -> pa.Table:
            from chomper_ray.stages.merge import stable_bucket

            bk = stable_bucket(t["n"], num_partitions)
            return t.append_column("_nb", pa.array(bk, type=pa.int32()))

        def finish(g: pd.DataFrame) -> pd.DataFrame:
            sp = g[g["side"] == 0]
            sums = g[g["side"] == 1].groupby("n")["w"].sum()
            w = sp["n"].map(sums).fillna(0.0).to_numpy()
            return pd.DataFrame({
                "n": sp["n"].astype("int64"),
                "dang": sp["dang"].astype(bool),
                "r": base + add + damping * w})

        # repartition bounds the block count: the groupby's output block
        # count grows with its INPUT's, so without this each iteration's
        # ranks carries ~2× more blocks and per-block fixed costs
        # compound quadratically across iterations
        ranks = (tagged_spine.union(contrib)
                 .map_batches(bucket, batch_format="pyarrow")
                 .groupby("_nb")
                 .map_groups(finish, batch_format="pandas")
                 .repartition(min(num_partitions, 16))
                 .materialize())

    def out(df: pd.DataFrame) -> pd.DataFrame:
        r = df["r"].to_numpy()
        if ndigits is not None:
            r = np.round(r, ndigits)
        return pd.DataFrame({"node": df["n"].astype("int64"), "rank": r})

    return ranks.map_batches(out, batch_format="pandas")


def sql_pagerank_query(edges_sql: str, damping: float = 0.85,
                       iters: int = 4, ndigits: int = 12) -> str:
    """DuckDB oracle for ``pagerank``: the power iteration UNROLLED as
    one CTE per step (recursion-free, so plain SQL semantics — exactly
    what the engine computes, including the dangling-mass term)."""
    d = repr(float(damping))
    # MATERIALIZED everywhere: each iteration references its predecessor
    # twice (dangling mass + contribution join); inlined CTEs would
    # re-evaluate the whole chain exponentially
    parts = [
        f"WITH eraw AS MATERIALIZED ({edges_sql})",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM eraw)",
        "deg AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS dg "
        "FROM e GROUP BY 1)",
        "nodes AS MATERIALIZED (SELECT n, dg IS NULL AS dang FROM ("
        "SELECT src AS n FROM e UNION SELECT dst FROM e) "
        "LEFT JOIN deg ON deg.src = n)",
        "nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS cnt FROM nodes)",
        "r0 AS MATERIALIZED (SELECT n, dang, "
        "1.0/(SELECT cnt FROM nn) AS r FROM nodes)",
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        cur = f"r{i}"
        parts.append(
            f"{cur} AS MATERIALIZED (SELECT nodes.n, nodes.dang, "
            f"(1.0 - {d})/(SELECT cnt FROM nn) "
            f"+ {d} * dm.m/(SELECT cnt FROM nn) "
            f"+ {d} * coalesce(s.w, 0) AS r "
            f"FROM nodes "
            f"LEFT JOIN (SELECT e.dst AS n, sum(p.r / deg.dg) AS w "
            f"FROM e JOIN {prev} p ON p.n = e.src "
            f"JOIN deg ON deg.src = e.src GROUP BY e.dst) s "
            f"USING (n) "
            f"CROSS JOIN (SELECT coalesce(sum(r) FILTER (dang), 0) AS m "
            f"FROM {prev}) dm)")
        prev = cur
    parts_sql = ", ".join(parts[1:])
    return (f"{parts[0]}, {parts_sql} "
            f"SELECT n AS node, round(r, {ndigits}) AS rank FROM {prev}")

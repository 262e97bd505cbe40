"""Graph operators over edge Datasets: PageRank (power iteration).

Connected components live in ``stages/dedup.py`` (``components_ds``,
built for the dedup families and oracle-verified through the
order-chain query); this module adds the rank-propagation family.

PageRank shape (Pregel semantics on the engine's co-bucketed storage
layout): the edge table is hash-partitioned by ``src`` ONCE and never
moves again. Bucketing by src makes every setup step bucket-local —
multi-edge dedup ((src,dst) dups share a bucket), out-degree, and the
node→has-out-edge partials — so setup is exactly TWO exchanges (edges
by src, node partials by node) instead of a chain of distinct/join/
anti-join shuffles. Each iteration is then

    per bucket i: read edges[i] + ranks[i] (co-located files, no
    exchange) → vectorized contribution partials pre-summed per dst
    → ONE shuffle of the partials (volume ≤ distinct dst per bucket,
    not O(E)) → per destination bucket j: merge partials onto the
    node spine file spine[j], write ranks'[j]

so the all-to-all bill is T × O(contribution partials), not T × O(E):
the storage-level join elision (``bucket_join``'s contract) applied to
an iterative algorithm. Dangling-node mass is handled exactly: nodes
with no out-edges are flagged ONCE in the spine files and each
bucket's finish task returns its dangling-rank partial as metadata, so
the next iteration's uniform redistribution term costs the driver a
sum over ``num_partitions`` floats — no extra pass over the ranks.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _atomic_write(dirpath: Path, table: pa.Table) -> None:
    dirpath.mkdir(parents=True, exist_ok=True)
    tmp = dirpath / f".part.{uuid.uuid4().hex[:8]}.parquet.tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, dirpath / "part.parquet")
    (dirpath / "_SUCCESS").touch()


def pagerank(edges, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 10,
             num_partitions: int = 32, ndigits: int | None = None,
             scratch_root: str | None = None):
    """Power-iteration PageRank over a directed edge Dataset.

    Multi-edges collapse to simple edges (DISTINCT, matching the SQL
    formulation); every node appearing on either side is ranked.
    Returns a Dataset ``(node:int64, rank:float64)`` summing to 1.

    ``scratch_root``: directory for the transient edge/spine/rank
    layouts (default: a fresh tempdir, removed before returning).
    """
    import ray.data as rd

    from chomper_ray.stages.merge import stable_bucket

    scratch = Path(scratch_root) if scratch_root else \
        Path(tempfile.mkdtemp(prefix="chomper_pagerank_"))
    scratch.mkdir(parents=True, exist_ok=True)
    ew_root = str(scratch / "edges")
    sp_root = str(scratch / "spine")
    nb = int(num_partitions)

    def norm(t: pa.Table) -> pa.Table:
        s = t[src].cast(pa.int64())
        return pa.table({
            "src": s, "dst": t[dst].cast(pa.int64()),
            "_b": pa.array(stable_bucket(s, nb), pa.int32())})

    def prep_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """One src bucket: dedup multi-edges, compute out-degree, write
        the co-bucketed edge file, emit (node, has_out) partials."""
        pid = int(g["_b"].iloc[0])
        ed = g[["src", "dst"]].drop_duplicates().sort_values(["src", "dst"])
        s = ed["src"].to_numpy()
        deg = ed.groupby("src")["dst"].size()
        _atomic_write(Path(ew_root) / f"p={pid:05d}", pa.table({
            "src": pa.array(s, pa.int64()),
            "dst": pa.array(ed["dst"].to_numpy(), pa.int64()),
            "inv_deg": pa.array(1.0 / ed["src"].map(deg).to_numpy(),
                                pa.float64())}))
        srcs = deg.index.to_numpy()
        dsts = ed["dst"].unique()
        n = np.concatenate([srcs, dsts])
        ho = np.concatenate([np.ones(len(srcs), np.int8),
                             np.zeros(len(dsts), np.int8)])
        return pd.DataFrame({"n": n.astype(np.int64), "ho": ho,
                             "_nb": stable_bucket(n, nb)})

    def spine_write(g: pd.DataFrame) -> pd.DataFrame:
        """One node bucket: resolve distinct nodes + dangling flags,
        write the spine file, return counts only."""
        pid = int(g["_nb"].iloc[0])
        agg = g.groupby("n")["ho"].max()  # sorted by node id
        dang = agg.to_numpy() == 0
        _atomic_write(Path(sp_root) / f"p={pid:05d}", pa.table({
            "n": pa.array(agg.index.to_numpy(), pa.int64()),
            "dang": pa.array(dang, pa.bool_())}))
        return pd.DataFrame({"pid": np.array([pid], np.int32),
                             "rows": [len(agg)],
                             "dangs": [int(dang.sum())]})

    meta = (edges.map_batches(norm, batch_format="pyarrow")
            .groupby("_b").map_groups(prep_bucket, batch_format="pandas")
            .groupby("_nb").map_groups(spine_write, batch_format="pandas")
            .to_pandas())
    n_nodes = int(meta["rows"].sum()) if len(meta) else 0
    if n_nodes == 0:
        shutil.rmtree(scratch, ignore_errors=True)
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "rank": pa.array([], pa.float64())}))
    n_dangling = int(meta["dangs"].sum())

    r0 = 1.0 / n_nodes
    base = (1.0 - damping) / n_nodes
    dang_mass = n_dangling * r0
    meta_schema = pa.schema([("pid", pa.int32()), ("dm", pa.float64())])

    for it in range(iters):
        # iteration 0 reads ranks from nowhere: every node holds r0
        rcur = None if it == 0 else str(scratch / f"r{it}")
        rnext = str(scratch / f"r{it + 1}")
        add = damping * dang_mass / n_nodes

        def contrib(df: pd.DataFrame, rcur=rcur) -> pd.DataFrame:
            outs = []
            for pid in df["pid"].unique():
                pid = int(pid)
                # seed row: every bucket reaches the finish stage even
                # with zero incoming contributions (w=0.0 is additive
                # identity, so a REAL node id here would be unaffected)
                outs.append(pd.DataFrame(
                    {"_nb": np.array([pid], np.int32),
                     "n": np.array([-1], np.int64), "w": [0.0]}))
                ep = Path(ew_root) / f"p={pid:05d}"
                if not (ep / "_SUCCESS").exists():
                    continue
                ed = pq.read_table(ep / "part.parquet").to_pandas()
                if rcur is None:
                    rv = ed["inv_deg"].to_numpy() * r0
                else:
                    rp = Path(rcur) / f"p={pid:05d}"
                    if not (rp / "_SUCCESS").exists():
                        continue
                    r = pq.read_table(rp / "part.parquet").to_pandas()
                    m = ed.merge(r.rename(columns={"n": "src"}),
                                 on="src", how="inner")
                    if not len(m):
                        continue
                    ed, rv = m, m["r"].to_numpy() * m["inv_deg"].to_numpy()
                p = pd.DataFrame({"n": ed["dst"].to_numpy(), "w": rv}) \
                    .groupby("n", as_index=False)["w"].sum()
                p["_nb"] = stable_bucket(p["n"].to_numpy(), nb)
                outs.append(p[["_nb", "n", "w"]])
            return pd.concat(outs, ignore_index=True)

        def finish(g: pd.DataFrame, rnext=rnext, add=add) -> pd.DataFrame:
            pid = int(g["_nb"].iloc[0])
            sp_f = Path(sp_root) / f"p={pid:05d}"
            if not (sp_f / "_SUCCESS").exists():
                # no node hashes to this bucket (seed-only group)
                return meta_schema.empty_table().to_pandas()
            sp = pq.read_table(sp_f / "part.parquet").to_pandas()
            sums = g.groupby("n")["w"].sum()
            w = sp["n"].map(sums).fillna(0.0).to_numpy()
            r_new = base + add + damping * w
            _atomic_write(Path(rnext) / f"p={pid:05d}", pa.table({
                "n": pa.array(sp["n"].to_numpy(), pa.int64()),
                "r": pa.array(r_new, pa.float64())}))
            dm = float(r_new[sp["dang"].to_numpy()].sum())
            return pd.DataFrame({"pid": np.array([pid], np.int32),
                                 "dm": [dm]})

        # one Ray job per iteration: a map task per edge/rank bucket
        # pair, one partials exchange, a finish task per node bucket;
        # output is num_partitions metadata rows — the driver never
        # touches rank rows
        it_meta = (rd.range(nb)
                   .map_batches(lambda df: df.rename(columns={"id": "pid"}),
                                batch_format="pandas")
                   .repartition(nb)
                   .map_batches(contrib, batch_format="pandas")
                   .groupby("_nb")
                   .map_groups(finish, batch_format="pandas")
                   .to_pandas())
        dang_mass = float(it_meta["dm"].sum()) if len(it_meta) else 0.0
        if it > 0:
            shutil.rmtree(scratch / f"r{it}", ignore_errors=True)

    from chomper_ray.state.output import read_partitioned

    def out(df: pd.DataFrame) -> pd.DataFrame:
        r = df["r"].to_numpy() if iters else np.full(len(df), r0)
        if ndigits is not None:
            r = np.round(r, ndigits)
        return pd.DataFrame({"node": df["n"].astype("int64"), "rank": r})

    final_root = scratch / (f"r{iters}" if iters else "spine")
    files = sorted(str(p.parent / "part.parquet")
                   for p in Path(final_root).glob("p=*/_SUCCESS"))
    result = rd.read_parquet(files, partitioning=None).map_batches(
        out, batch_format="pandas").materialize()
    shutil.rmtree(scratch, ignore_errors=True)
    return result


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

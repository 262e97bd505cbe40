"""Inverted text index over a document Dataset — the search-side
primitive a 100 TB corpus needs for targeted retrieval (keyword
filtering, quality-slice pulls, eval-leak forensics) without a scan.

Layout: distinct (token, doc_id) postings, hash-partitioned by token
into ``root/t=NNNNN/part.parquet`` files sorted by (token, doc_id),
plus a ``_LAYOUT.json``. Build is one explode → per-block distinct →
one co-locating shuffle (the postings exchange is paid ONCE); a query
for k tokens then reads AT MOST k bucket files (usually fewer — tokens
sharing a bucket share the read) and never touches document text.

Postings are per-token sorted runs, so per-bucket filtering is a
vectorized ``searchsorted`` slice, and multi-token AND/OR combine on
doc_id arrays driver-side — bounded by the matched postings, not the
corpus.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from chomper_ray.stages.merge import stable_bucket


def build_inverted_index(ds, root: str | Path, col: str = "text",
                         id_col: str = "doc_id", sep: str = " ",
                         num_partitions: int = 64,
                         positions: bool = False) -> dict:
    """Build the index: returns ``{"files": n, "postings": n}``.
    ``positions=True`` additionally stores each posting's 0-based token
    positions (list<int64>) — required by ``phrase_search``, ~2× the
    posting payload otherwise unused."""
    import polars as pl

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    roots = str(root)

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        base = pl.DataFrame({
            "d": pl.Series(df[id_col].to_numpy()),
            "w": pl.Series(pd.Series(df[col]).fillna("")
                           .astype(str).tolist()).str.split(sep),
        }).with_columns(pl.col("w").list.len().alias("dl"))
        ex = base.with_columns(
            pl.int_ranges(0, pl.col("w").list.len()).alias("p")) \
            .explode(["w", "p"])
        if positions:
            g = ex.group_by(["d", "w", "dl"]).agg(
                pl.len().alias("len"),
                pl.col("p").sort().alias("pos")).to_pandas()
        else:
            g = ex.group_by(["d", "w", "dl"]).len().to_pandas()
        out = pd.DataFrame({"token": g["w"],
                            "doc_id": g["d"].astype("int64"),
                            "tf": g["len"].astype("int64"),
                            "dl": g["dl"].astype("int64")})
        if positions:
            out["pos"] = g["pos"]
        out["_tb"] = stable_bucket(out["token"].to_numpy(),
                                   num_partitions).astype("int32")
        return out

    def doc_stats(df: pd.DataFrame) -> pd.DataFrame:
        import polars as _pl

        dl = _pl.Series(pd.Series(df[col]).fillna("").astype(str)
                        .tolist()).str.split(sep).list.len()
        return pd.DataFrame({"n": [len(df)], "sum_dl": [int(dl.sum())]})

    stats_df = ds.map_batches(doc_stats, batch_format="pandas") \
        .to_pandas()  # one row per block — metadata only
    n_docs = int(stats_df["n"].sum())
    sum_dl = int(stats_df["sum_dl"].sum())

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["_tb"].iloc[0])
        g = g.drop(columns=["_tb"]) \
            .drop_duplicates(subset=["token", "doc_id"]) \
            .sort_values(["token", "doc_id"], kind="stable")
        d = Path(roots) / f"t={pid:05d}"
        d.mkdir(parents=True, exist_ok=True)
        tmp = d / f".part.{uuid.uuid4().hex[:8]}.parquet.tmp"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, d / "part.parquet")
        (d / "_SUCCESS").touch()
        return pd.DataFrame({"pid": [pid], "postings": [len(g)]})

    stats = (ds.map_batches(postings, batch_format="pandas")
             .groupby("_tb").map_groups(write_bucket,
                                        batch_format="pandas")
             .to_pandas())
    tmp = root / f"._LAYOUT.{uuid.uuid4().hex[:8]}.tmp"
    tmp.write_text(json.dumps({"num_partitions": num_partitions,
                               "sep": sep, "n_docs": n_docs,
                               "avgdl": sum_dl / max(n_docs, 1),
                               "positions": bool(positions)}))
    os.replace(tmp, root / "_LAYOUT.json")
    return {"files": len(stats), "postings": int(stats["postings"].sum())}


def _token_postings(root: Path, n: int, token: str,
                    full: bool = False):
    pid = int(stable_bucket(np.array([token], dtype=object), n)[0])
    p = root / f"t={pid:05d}"
    if not (p / "_SUCCESS").exists():
        if full:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.int64))
        return np.empty(0, dtype=np.int64)
    t = pq.read_table(p / "part.parquet").to_pandas()
    toks = t["token"].to_numpy()
    lo = np.searchsorted(toks, token, side="left")
    hi = np.searchsorted(toks, token, side="right")
    ids = t["doc_id"].to_numpy()[lo:hi].astype(np.int64)
    if not full:
        return ids
    return (ids, t["tf"].to_numpy()[lo:hi].astype(np.int64),
            t["dl"].to_numpy()[lo:hi].astype(np.int64))


def search_index(root: str | Path, tokens, mode: str = "all") -> np.ndarray:
    """Doc ids whose text contains ``all`` (AND) or ``any`` (OR) of the
    query tokens. Reads at most one bucket file per distinct token
    (pure driver-side reads, no Ray job); the in-file posting slice is
    one ``searchsorted`` pair per token. Returns sorted int64 ids."""
    root = Path(root)
    lay = json.loads((root / "_LAYOUT.json").read_text())
    n = int(lay["num_partitions"])
    sets = [_token_postings(root, n, t) for t in tokens]
    if not sets:
        return np.empty(0, dtype=np.int64)
    if mode == "all":
        out = sets[0]
        for s in sets[1:]:
            out = np.intersect1d(out, s, assume_unique=True)
        return out
    if mode == "any":
        return np.unique(np.concatenate(sets))
    raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")


def bm25_search(root: str | Path, tokens, k: int = 10,
                k1: float = 1.2, b: float = 0.75,
                ndigits: int = 6) -> pd.DataFrame:
    """BM25-ranked retrieval over the index (Robertson/Sparck Jones
    idf, the standard `+1` smoothing): postings already carry ``tf``
    and ``dl``, so scoring k query tokens is ≤ k bucket-file reads and
    pure vectorized arithmetic over the MATCHED postings — never the
    corpus. Ties break by ascending doc_id (SQL ORDER BY parity)."""
    root = Path(root)
    lay = json.loads((root / "_LAYOUT.json").read_text())
    n_part = int(lay["num_partitions"])
    n_docs, avgdl = float(lay["n_docs"]), float(lay["avgdl"])
    ids_all, score_all = [], []
    for t in dict.fromkeys(tokens):
        ids, tf, dl = _token_postings(root, n_part, t, full=True)
        if not len(ids):
            continue
        df_ = float(len(ids))
        idf = np.log((n_docs - df_ + 0.5) / (df_ + 0.5) + 1.0)
        tf = tf.astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl)
        ids_all.append(ids)
        score_all.append(idf * tf * (k1 + 1.0) / denom)
    if not ids_all:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    ids = np.concatenate(ids_all)
    sc = np.concatenate(score_all)
    uniq, inv = np.unique(ids, return_inverse=True)
    tot = np.zeros(len(uniq))
    np.add.at(tot, inv, sc)
    order = np.lexsort((uniq, -tot))[:k]
    return pd.DataFrame({"doc_id": uniq[order].astype("int64"),
                         "score": np.round(tot[order], ndigits)})


def phrase_search(root: str | Path, phrase: str,
                  sep: str = " ") -> np.ndarray:
    """Exact phrase query over a ``positions=True`` index: doc ids
    whose token stream contains the phrase's tokens CONSECUTIVELY.
    Reads ≤ one bucket file per distinct phrase token; adjacency is
    checked with one structured-dtype ``np.intersect1d`` per adjacent
    token pair over (doc, position) keys — no text is ever read."""
    root = Path(root)
    lay = json.loads((root / "_LAYOUT.json").read_text())
    if not lay.get("positions"):
        raise ValueError(
            "phrase_search needs an index built with positions=True")
    n = int(lay["num_partitions"])
    toks = [t for t in phrase.split(sep) if t != ""] or [""]
    dt = np.dtype([("d", "<i8"), ("p", "<i8")])

    def occ(token: str) -> np.ndarray:
        pid = int(stable_bucket(np.array([token], dtype=object), n)[0])
        f = root / f"t={pid:05d}" / "part.parquet"
        if not (root / f"t={pid:05d}" / "_SUCCESS").exists():
            return np.empty(0, dt)
        t = pq.read_table(f, columns=["token", "doc_id", "pos"]) \
            .to_pandas()
        t = t[t["token"] == token]
        if not len(t):
            return np.empty(0, dt)
        lens = t["pos"].map(len).to_numpy()
        out = np.empty(int(lens.sum()), dt)
        out["d"] = np.repeat(t["doc_id"].to_numpy(np.int64), lens)
        out["p"] = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in t["pos"]])
        return np.sort(out)

    cur = occ(toks[0])  # (doc, start position) candidates
    for i, t in enumerate(toks[1:], start=1):
        if not len(cur):
            break
        nxt = occ(t)
        shifted = cur.copy()
        shifted["p"] = shifted["p"] + i  # where token i must sit
        hit = np.intersect1d(shifted, nxt, assume_unique=True)
        hit = np.sort(hit)
        hit["p"] = hit["p"] - i  # back to phrase-start positions
        cur = hit
    return np.unique(cur["d"]) if len(cur) else np.empty(0, np.int64)

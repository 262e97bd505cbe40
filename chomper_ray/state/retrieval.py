"""Hybrid retrieval over the CDC-maintained indexes.

Reciprocal-rank fusion (RRF, Cormack et al. 2009: score(d) =
Σ_systems 1/(k0 + rank_s(d))) of the two per-commit-maintained index
families — ``LakeTextIndex.bm25`` (lexical) and ``LakeANNIndex.search``
(dense cosine) — so a RAG stack gets ONE fused ranking that is fresh at
the lake head with no rebuild: both indexes fold each lake commit as
LSM delta segments, and fusion itself is a driver-side merge of two
bounded top-N lists (no Ray job beyond the two index reads).

Rank discipline (what makes the result oracle-exact): each system's
scores are rounded to ``ndigits`` FIRST, then ranked by
(score DESC, key ASC) — a total order, so rank parity follows from the
already-proven 6-digit score parity of both index families against
DuckDB (bm25_topk / cdc_ann_vectors driver queries). Only ranks ≤
``fetch_k`` contribute; a document absent from a system's top-
``fetch_k`` reports rank 0 and contributes nothing for that system.

Scale contract: the BM25 side scores exactly the docs containing ≥ 1
query token (that is what the postings walk costs regardless of k);
the ANN side ships per-probed-cell top-(fetch_k + slack) candidates to
the driver — the union provably contains the global top-fetch_k, and
the slack absorbs rounded-score tie clusters at the cut boundary.

Reference ancestry: the reference engine (anilktechie/chomper) has no
retrieval at all — this composes the round-4 maintained-index work
(state/index.py, state/annindex.py) into the fused-search operation a
training-data / RAG pipeline actually runs.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

#: extra per-system candidates fetched beyond ``fetch_k`` so a cluster
#: of rounded-score ties straddling the cut cannot change the cut set.
RANK_SLACK = 32


def _ranked(df: pd.DataFrame, key: str, score: str, fetch_k: int | None,
            ndigits: int) -> pd.DataFrame:
    """(key, r) with r = 1-based rank by (round(score) DESC, key ASC),
    cut at ``fetch_k`` (None = keep every ranked row)."""
    if not len(df):
        return pd.DataFrame({key: df[key], "r": pd.Series(dtype="int64")})
    out = df[[key, score]].copy()
    out[score] = out[score].round(ndigits)
    out = out.sort_values([score, key], ascending=[False, True],
                          kind="stable").reset_index(drop=True)
    out["r"] = np.arange(1, len(out) + 1, dtype=np.int64)
    if fetch_k is not None:
        out = out[out["r"] <= int(fetch_k)]
    return out[[key, "r"]]


def hybrid_rrf(text_idx, ann_idx, tokens, query_vec, *, k: int = 10,
               fetch_k: int = 100, k0: int = 60, ndigits: int = 6,
               nprobe: int | None = None) -> pd.DataFrame:
    """Fused top-``k`` over one lake's text + embedding columns.

    ``text_idx`` / ``ann_idx``: `LakeTextIndex` / `LakeANNIndex` over
    the SAME LakeTable (keys must be the same column). ``nprobe=None``
    probes every IVF cell (exact dense ranking — what the SQL oracle
    replays); a pruned ``nprobe`` trades dense recall for speed exactly
    as in ``LakeANNIndex.search``.

    Returns (doc, r_bm25, r_cos, rrf) sorted by (rrf DESC, doc ASC),
    ranks 0 where a system did not place the doc in its top-fetch_k.
    """
    bm = text_idx.bm25(tokens, k=None, ndigits=ndigits)
    rb = _ranked(bm, "doc", "score", fetch_k, ndigits)

    q = np.asarray(query_vec, dtype=np.float64).reshape(1, -1)
    # The ANN side fetches by UNROUNDED score but ranks on ROUNDED
    # scores: a rounded-score tie cluster straddling the fetch_k cut
    # could otherwise pull in docs (tie-broken by doc ASC) that the
    # fixed +RANK_SLACK fetch never saw. Detect the hazard — the
    # deepest fetched candidate's rounded score still equals the
    # rounded score at rank fetch_k — and refetch deeper until the tie
    # cluster is fully inside the candidate set (or the index is
    # exhausted, which yields the complete ranking).
    slack = RANK_SLACK
    while True:
        want = int(fetch_k) + slack
        ann = ann_idx.search(q, k=want, nprobe=nprobe)
        if len(ann) < want or len(ann) <= int(fetch_k):
            break  # index exhausted or no cut: ranking is complete
        rs = np.sort(ann["score"].round(ndigits).to_numpy())[::-1]
        if rs[-1] < rs[int(fetch_k) - 1]:
            break  # tail strictly below the cut score: cut is safe
        slack *= 4
    ann = ann.rename(columns={"key": "doc"})
    rc = _ranked(ann, "doc", "score", fetch_k, ndigits)

    fused = rb.merge(rc, on="doc", how="outer", suffixes=("_bm25", "_cos"))
    r_b = fused["r_bm25"].fillna(0).astype(np.int64)
    r_c = fused["r_cos"].fillna(0).astype(np.int64)
    # 1/(k0 + integer rank): identical float64 on any IEEE engine, so
    # the fused order needs no rounding to match the SQL replay.
    rrf = (np.where(r_b > 0, 1.0 / (k0 + r_b), 0.0)
           + np.where(r_c > 0, 1.0 / (k0 + r_c), 0.0))
    out = pd.DataFrame({"doc": fused["doc"], "r_bm25": r_b,
                        "r_cos": r_c, "rrf": rrf})
    out = out.sort_values(["rrf", "doc"], ascending=[False, True],
                          kind="stable").head(int(k))
    out["rrf"] = out["rrf"].round(9)
    return out.reset_index(drop=True)

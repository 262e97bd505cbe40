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


def hybrid_rrf_batch(text_idx, ann_idx, queries: pd.DataFrame, *,
                     k: int = 10, fetch_k: int = 100, k0: int = 60,
                     ndigits: int = 6, nprobe: int | None = None,
                     k1: float = 1.2, b: float = 0.75,
                     num_tasks: int = 64) -> pd.DataFrame:
    """Dataset-native BATCHED hybrid retrieval: N queries in one pass,
    per-qid output identical to N ``hybrid_rrf`` calls (the per-query
    path stays the oracle; ``tests/test_retrieval.py`` pins equality).

    ``queries``: frame with ``qid`` (int), ``tokens`` (list[str]),
    ``vec`` (list[float]).

    Why a separate path (round-4 verdict design note 2): a retrieval
    WORKLOAD — thousands of queries — must not pay one driver
    round-trip per query.

    - BM25 side: each DISTINCT token across all queries is scored ONCE
      inside ``map_batches`` (one bucket-resolve per token, however
      many queries share it: cost = distinct-token postings reads, not
      nq × tokens); contributions carry the token's position in each
      query so per-(qid, doc) accumulation replays ``bm25``'s
      ``np.add.at`` order exactly (float-sum order parity with the
      per-query path). Full per-qid rankings happen in
      ``groupby(qid).map_groups`` — never a corpus scan, never a
      driver fold of raw postings.
    - ANN side: ONE stacked-matrix ``LakeANNIndex.search`` (the
      per-probed-cell ``qm @ m.T`` scores every query in the same
      read); qids whose rounded-score tie cluster straddles the
      fetch_k cut are refetched deeper individually (rare).
    - Fusion: driver merge bounded by nq × 2 × fetch_k ranked rows.
    """
    import ray
    import ray.data as rd

    from chomper_ray.stages.merge import stable_bucket
    from chomper_ray.state.index import resolve_token_bucket

    qdf = queries.reset_index(drop=True)
    nq = len(qdf)
    empty_rank = pd.DataFrame({"qid": pd.Series(dtype="int64"),
                               "doc": pd.Series(dtype="object"),
                               "r": pd.Series(dtype="int64")})

    # ---- BM25 side: one distributed pass over DISTINCT tokens --------
    st = text_idx.stats()
    n_docs, avgdl = float(st["n_docs"]), float(st["avgdl"])
    # positional qids internally (the ANN search reports row position);
    # the caller's qid values are mapped back at the end
    tok2q: dict[str, list[tuple[int, int]]] = {}
    for pos, toks in enumerate(qdf["tokens"]):
        for ti, t in enumerate(dict.fromkeys(toks)):
            tok2q.setdefault(t, []).append((pos, ti))
    toks = sorted(tok2q)
    if toks:
        seg_dirs = [s["dir"] for s in text_idx._live_segments()]
        pids = stable_bucket(np.array(toks, dtype=object),
                             text_idx.num_partitions)
        t2q_ref = ray.put(tok2q)

        def score_tokens(batch: pd.DataFrame) -> pd.DataFrame:
            t2q = ray.get(t2q_ref)
            frames = []
            for tok, pid in zip(batch["token"], batch["pid"]):
                p = resolve_token_bucket(seg_dirs, int(pid), tok)
                if p is None or not len(p):
                    continue
                df_ = float(len(p))
                idf = np.log((n_docs - df_ + 0.5) / (df_ + 0.5) + 1.0)
                tf = p["tf"].to_numpy().astype(np.float64)
                dl = p["dl"].to_numpy().astype(np.float64)
                s = idf * tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * dl / avgdl))
                docs = p["doc"].to_numpy()
                for qid, ti in t2q[tok]:
                    frames.append(pd.DataFrame(
                        {"qid": qid, "ti": ti, "doc": docs, "s": s}))
            if not frames:
                return pd.DataFrame({
                    "qid": pd.Series(dtype="int64"),
                    "ti": pd.Series(dtype="int64"),
                    "doc": pd.Series(dtype="object"),
                    "s": pd.Series(dtype="float64")})
            return pd.concat(frames, ignore_index=True)

        def rank_group(g: pd.DataFrame) -> pd.DataFrame:
            # replay bm25()'s exact accumulation: contributions in
            # query-token order, np.add.at per doc, rank on rounded
            # totals with doc tie-break
            g = g.sort_values("ti", kind="stable")
            uniq, inv = np.unique(g["doc"].to_numpy(), return_inverse=True)
            tot = np.zeros(len(uniq))
            np.add.at(tot, inv, g["s"].to_numpy())
            rs = np.round(tot, ndigits)
            order = np.lexsort((uniq, -rs))
            n = min(int(fetch_k), len(uniq))
            return pd.DataFrame({
                "qid": np.full(n, int(g["qid"].iloc[0]), dtype=np.int64),
                "doc": uniq[order[:n]],
                "r": np.arange(1, n + 1, dtype=np.int64)})

        contrib = (rd.from_pandas(
                       pd.DataFrame({"token": toks,
                                     "pid": pids.astype("int64")}))
                   .repartition(min(len(toks), int(num_tasks)))
                   .map_batches(score_tokens, batch_format="pandas"))
        rb = contrib.groupby("qid") \
            .map_groups(rank_group, batch_format="pandas").to_pandas()
        if not len(rb):
            rb = empty_rank.copy()
    else:
        rb = empty_rank.copy()

    # ---- ANN side: one stacked search, per-qid tie-refetch -----------
    qm = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qdf["vec"]])
    want = int(fetch_k) + RANK_SLACK
    # per_query_probe: each query's candidates come from its OWN nprobe
    # cells, exactly like its single-query call would — the default
    # union-of-probes semantics would silently boost batch recall and
    # break per-query parity
    ann = ann_idx.search(qm, k=want, nprobe=nprobe, per_query_probe=True)
    rc_parts = []
    for qi in range(nq):
        mine = ann[ann["qid"] == qi]
        if len(mine) >= want and len(mine) > int(fetch_k):
            rs = np.sort(mine["score"].round(ndigits).to_numpy())[::-1]
            if rs[-1] >= rs[int(fetch_k) - 1]:
                # tie cluster straddles the cut — refetch THIS query
                # deeper until safe (mirrors hybrid_rrf's loop)
                slack = RANK_SLACK * 4
                while True:
                    w2 = int(fetch_k) + slack
                    mine = ann_idx.search(qm[qi:qi + 1], k=w2,
                                          nprobe=nprobe)
                    mine = mine.assign(qid=qi)
                    if len(mine) < w2:
                        break
                    rs = np.sort(mine["score"].round(ndigits)
                                 .to_numpy())[::-1]
                    if rs[-1] < rs[int(fetch_k) - 1]:
                        break
                    slack *= 4
        r = _ranked(mine.rename(columns={"key": "doc"}), "doc",
                    "score", fetch_k, ndigits)
        r.insert(0, "qid", np.int64(qi))
        rc_parts.append(r)
    rc = pd.concat(rc_parts, ignore_index=True) if rc_parts \
        else empty_rank.copy()

    # ---- RRF fusion (bounded driver merge) ---------------------------
    fused = rb.merge(rc, on=["qid", "doc"], how="outer",
                     suffixes=("_bm25", "_cos"))
    r_b = fused["r_bm25"].fillna(0).astype(np.int64)
    r_c = fused["r_cos"].fillna(0).astype(np.int64)
    rrf = (np.where(r_b > 0, 1.0 / (k0 + r_b), 0.0)
           + np.where(r_c > 0, 1.0 / (k0 + r_c), 0.0))
    out = pd.DataFrame({"qid": fused["qid"].astype(np.int64),
                        "doc": fused["doc"], "r_bm25": r_b,
                        "r_cos": r_c, "rrf": rrf})
    out = out.sort_values(["qid", "rrf", "doc"],
                          ascending=[True, False, True], kind="stable")
    out = out.groupby("qid", sort=True).head(int(k)).reset_index(drop=True)
    out["rrf"] = out["rrf"].round(9)
    # map positional qid back to the caller's qid values
    out["qid"] = qdf["qid"].to_numpy()[out["qid"].to_numpy()]
    return out

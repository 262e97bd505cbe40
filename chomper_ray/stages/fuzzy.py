"""Edit-distance fuzzy matching: self-join / two-sided join / dedup.

The entity-resolution staple Ray Data has no native operator for:
find all string pairs within Levenshtein distance ``k`` (small — 1 or
2) without a cross product. Reference parity: the reference engine has
no fuzzy matching at all (its `Mapper`/`Filter` are exact-value ops,
processors.py:251-316); this module is part of the beyond-reference
training-data surface (entity dedup over author/title/URL-ish keys).

Shape (same one-shuffle LSH layout as ``stages/dedup.py``):

1. **Candidate generation — deletion neighborhood** (the SymSpell
   scheme): every string emits a hash for each variant obtainable by
   deleting ≤ k characters. If ``lev(a, b) <= k`` then an optimal
   alignment has e1 deletions / e2 insertions / e3 substitutions with
   e1+e2+e3 <= k; deleting the e1+e3 (resp. e2+e3) aligned-away
   characters from each side reaches the SAME string, so the ≤k-deletion
   neighborhoods intersect — candidate recall is exactly 1.0, no
   probabilistic miss. Variant hashes are computed WITHOUT materializing
   variant strings: three weight-shifted cumulative-sum matrices give
   every (p1[, p2]) deletion hash in one vectorized pass.
2. **One co-locating shuffle** on a coarse partition of the variant
   hash; the string rides its band row (bounded by ``max_len``, so the
   payload is ≤ max_len B × #variants — the join-back alternative for
   heavier payloads is the ``ngram_jaccard_dedup`` pattern).
3. **In-bucket verification — banded DP Levenshtein**, vectorized
   across the whole candidate batch: the classic band ``|i-j| <= k``
   re-indexed to (text position, diagonal) so each of the
   ``max_len × (2k+1)`` steps is one numpy min over every pair at once.
   Values are clamped at k+1 (saturating — cells beyond the band can
   never reach back under k), so reported distances are exact for
   every kept pair.

Buckets are capped (``max_bucket``) with a ``truncated`` flag — many
IDENTICAL strings share their whole deletion neighborhood, so exact
duplicates should be collapsed with ``exact_dedup`` first; the cap is
the documented protection against that quadratic blowup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from chomper_ray.stages.dedup import (
    _MIX,
    _dedup_pairs_ds,
    components_auto_ds,
    DRIVER_EDGE_CAP,
)

_BASE = np.uint64(1099511628211)
_INF32 = np.int32(1 << 20)


def _encode_padded(strs) -> tuple[np.ndarray, np.ndarray]:
    """Batch of python strings → (codes[(n, maxlen) uint32], lens) with
    ONE utf-32 encode of the concatenation — no per-row encode loop."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), np.int64, n)
    maxlen = int(lens.max()) if n else 0
    codes = np.zeros((n, max(maxlen, 1)), dtype=np.uint32)
    if n and lens.sum():
        flat = np.frombuffer("".join(strs).encode("utf-32-le"),
                             dtype=np.uint32)
        off = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = np.arange(maxlen)
        mask = pos[None, :] < lens[:, None]
        codes[mask] = flat[(off[:, None] + pos[None, :])[mask]]
    return codes, lens


def banded_levenshtein(sa, sb, k: int) -> np.ndarray:
    """Exact Levenshtein distance for a batch of string pairs, banded at
    ``k``: returns int32 distances with every value > k reported as
    k+1. Vectorized across pairs — ``max(len) × (2k+1)`` numpy steps
    for the whole batch, no per-pair Python.

    Band correctness: D[i][j] >= |i-j|, so any path through a cell
    outside ``|i-j| <= k`` costs > k; clamping those cells to k+1
    (saturating adds) cannot change any answer <= k.
    """
    sa, sb = list(sa), list(sb)
    n = len(sa)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    amat, la = _encode_padded(sa)
    bmat, lb = _encode_padded(sb)
    diff = la - lb
    res = np.full(n, k + 1, dtype=np.int32)
    feas = np.abs(diff) <= k
    # final answer lives at (j=len_b, d=len_a-len_b); snapshot it the
    # moment j passes each pair's len_b
    tfin = (diff + k).clip(0, 2 * k).astype(np.int64)
    rows = np.arange(n)
    width = 2 * k + 1
    band = np.full((n, width), _INF32, dtype=np.int32)
    for t in range(width):
        d = t - k
        if d >= 0:
            band[:, t] = d  # D[d][0] = d
    done0 = feas & (lb == 0)
    res[done0] = band[rows, tfin][done0].clip(0, k + 1)
    maxn = int(lb.max())
    maxm = amat.shape[1]
    one = np.int32(1)
    for j in range(1, maxn + 1):
        bj = bmat[:, j - 1]
        cur = np.full((n, width), _INF32, dtype=np.int32)
        for t in range(width):
            d = t - k
            i = j + d
            if i < 0:
                continue
            if i == 0:
                cur[:, t] = j  # D[0][j] = j
                continue
            # D[i-1][j-1] + cost: same diagonal slot at j-1
            if i - 1 < maxm:
                cost = (amat[:, i - 1] != bj).astype(np.int32)
            else:
                cost = one
            best = band[:, t] + cost
            if t > 0:  # D[i-1][j] + 1: slot d-1 at the SAME j
                np.minimum(best, cur[:, t - 1] + one, out=best)
            if t + 1 < width:  # D[i][j-1] + 1
                np.minimum(best, band[:, t + 1] + one, out=best)
            cur[:, t] = best
        band = cur
        hit = feas & (lb == j)
        if hit.any():
            res[hit] = band[rows, tfin][hit].clip(0, k + 1)
    return res


def deletion_variant_hashes(strs, k: int, max_len: int = 64):
    """(row_idx, variant_hash) for every ≤k-deletion variant of every
    string (k in {1, 2}; includes the 0-deletion original). Hashes are
    computed from weight-shifted cumulative sums — variant strings are
    never materialized. Strings longer than ``max_len`` raise: the
    deletion scheme is O(len^k) variants per string, meant for short
    join keys, not documents."""
    if k not in (1, 2):
        raise ValueError(f"fuzzy matching supports k in {{1, 2}}, got {k}")
    n = len(strs)
    if n == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    codes, lens = _encode_padded(strs)
    maxlen = codes.shape[1]
    if int(lens.max()) > max_len:
        raise ValueError(
            f"fuzzy join key exceeds max_len={max_len} characters "
            f"(got {int(lens.max())}); fuzzy matching is for short keys "
            "— pre-truncate or raise max_len explicitly")
    c = codes.astype(np.uint64) + np.uint64(1)  # avoid 0-code ambiguity
    pos_mask = np.arange(maxlen)[None, :] < lens[:, None]
    c = np.where(pos_mask, c, np.uint64(0))
    with np.errstate(over="ignore"):
        w = np.empty(maxlen + 2, dtype=np.uint64)
        w[0] = np.uint64(1)
        for i in range(1, maxlen + 2):
            w[i] = w[i - 1] * _BASE
        # A_s[q] = c[q] * base^(q-s): the weight a char at q has when s
        # earlier chars were deleted
        # A_s[q] = c[q] * base^(q-s): the weight char q carries when s
        # earlier characters were deleted (slots for q < s are unused)
        w1 = np.roll(w[:maxlen], 1)
        w1[0] = np.uint64(1)
        w2 = np.roll(w[:maxlen], 2)
        w2[:2] = np.uint64(1)
        a0 = c * w[None, :maxlen]
        a1 = c * w1[None, :]
        a2 = c * w2[None, :]
        p0 = np.cumsum(a0, axis=1, dtype=np.uint64)   # inclusive prefixes
        p1 = np.cumsum(a1, axis=1, dtype=np.uint64)
        p2 = np.cumsum(a2, axis=1, dtype=np.uint64)
        t1 = p1[:, -1]
        t2 = p2[:, -1]

        def pref(p, idx):
            """exclusive prefix sum up to position idx (idx may be 0)."""
            out = np.zeros(p.shape[0], dtype=np.uint64)
            valid = idx > 0
            out[valid] = p[valid, idx[valid] - 1]
            return out

        row_list, hash_list = [], []
        # 0-deletion original: inclusive a0 total (masked cols are 0)
        row_list.append(np.arange(n, dtype=np.int64))
        hash_list.append(p0[:, -1] if maxlen else np.zeros(n, np.uint64))
        # 1-deletion: h(p) = pref0(p) + (suffix of a1 after p)
        for p in range(maxlen):
            valid = lens > p
            if not valid.any():
                break
            idx = np.full(n, p, dtype=np.int64)
            h = pref(p0, idx) + (t1 - p1[:, p])
            row_list.append(np.nonzero(valid)[0].astype(np.int64))
            hash_list.append(h[valid])
        if k == 2:
            # 2-deletion at p1<p2: pref0(p1) + (a1 span p1+1..p2-1)
            #                      + (a2 suffix after p2)
            ia, ib = np.triu_indices(maxlen, k=1)
            for a_, b_ in zip(ia, ib):
                valid = lens > b_
                if not valid.any():
                    continue
                # span sum over (a_+1 .. b_-1) of a1: inclusive p1 diff
                # (zero by construction when b_ == a_ + 1)
                span = p1[:, b_ - 1] - p1[:, a_]
                h = pref(p0, np.full(n, a_, dtype=np.int64)) + span \
                    + (t2 - p2[:, b_])
                row_list.append(np.nonzero(valid)[0].astype(np.int64))
                hash_list.append(h[valid])
        rows = np.concatenate(row_list)
        hs = np.concatenate(hash_list)
        hs = (hs ^ (hs >> np.uint64(33))) * _MIX  # avalanche
    return rows, hs


def _variant_rows(batch: pd.DataFrame, col: str, id_col: str, k: int,
                  max_len: int, num_partitions: int,
                  side: int | None = None) -> pd.DataFrame:
    strs = batch[col].fillna("").astype(str).tolist()
    rows, hs = deletion_variant_hashes(strs, k, max_len=max_len)
    out = pd.DataFrame({
        "vh": hs,
        "id": batch[id_col].to_numpy()[rows].astype(np.int64),
        "s": np.asarray(strs, dtype=object)[rows],
    })
    if side is not None:
        out["side"] = np.int8(side)
    out["_pb"] = (out["vh"].to_numpy() % np.uint64(num_partitions)) \
        .astype(np.int32)
    return out


def _bucket_pairs(g: pd.DataFrame, k: int, max_bucket: int,
                  two_sided: bool) -> pd.DataFrame:
    """Candidate pairs + banded-DP verify inside one coarse partition.
    Groups by the REAL variant hash, caps each bucket, verifies every
    candidate pair in one vectorized batch across all buckets."""
    sub = ["vh", "id"] + (["side"] if two_sided else [])
    g = g.drop_duplicates(subset=sub)
    sizes = g.groupby("vh")["id"].transform("size")
    multi = g[sizes > 1]
    a_idx, b_idx, trunc = [], [], []
    frames = []
    for _, grp in multi.groupby("vh", sort=False):
        truncated = len(grp) > max_bucket
        if truncated:
            grp = grp.iloc[:max_bucket]
        if two_sided:
            l = grp[grp["side"] == 0]
            r = grp[grp["side"] == 1]
            if not len(l) or not len(r):
                continue
            ia, ib = np.meshgrid(np.arange(len(l)), np.arange(len(r)),
                                 indexing="ij")
            frames.append(pd.DataFrame({
                "a": l["id"].to_numpy()[ia.ravel()],
                "b": r["id"].to_numpy()[ib.ravel()],
                "sa": l["s"].to_numpy()[ia.ravel()],
                "sb": r["s"].to_numpy()[ib.ravel()],
                "truncated": truncated,
            }))
        else:
            grp = grp.sort_values("id")
            if len(grp) < 2:
                continue
            ids = grp["id"].to_numpy()
            ss = grp["s"].to_numpy()
            ia, ib = np.triu_indices(len(ids), k=1)
            frames.append(pd.DataFrame({
                "a": ids[ia], "b": ids[ib],
                "sa": ss[ia], "sb": ss[ib],
                "truncated": truncated,
            }))
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "dist": pd.Series(dtype="int64"),
                          "truncated": pd.Series(dtype="bool")})
    if not frames:
        return empty
    cand = pd.concat(frames, ignore_index=True) \
        .drop_duplicates(subset=["a", "b"])
    # self-join: drop identical-id pairs that arise from duplicate rows
    cand = cand[cand["a"] != cand["b"]] if not two_sided else cand
    if not len(cand):
        return empty
    dist = banded_levenshtein(cand["sa"].to_numpy(),
                              cand["sb"].to_numpy(), k)
    keep = dist <= k
    out = cand.loc[keep, ["a", "b", "truncated"]].copy()
    out["dist"] = dist[keep].astype(np.int64)
    return out.astype({"a": "int64", "b": "int64",
                       "truncated": "bool", "dist": "int64"})[
        ["a", "b", "dist", "truncated"]]


def fuzzy_self_join(ds, col: str = "name", id_col: str = "id", k: int = 1,
                    num_partitions: int = 32, max_bucket: int = 2000,
                    max_len: int = 64):
    """All pairs (a < b by id) within Levenshtein distance ``k`` —
    returns a Dataset ``(a, b, dist, truncated)`` with exact distances.
    One co-locating shuffle; verification inside the bucket."""
    def to_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return _variant_rows(batch, col, id_col, k, max_len,
                             num_partitions)

    pairs_raw = (ds.map_batches(to_rows, batch_format="pandas")
                 .groupby("_pb")
                 .map_groups(lambda g: _bucket_pairs(g, k, max_bucket,
                                                     two_sided=False),
                             batch_format="pandas"))
    return _dedup_pairs_ds(pairs_raw)


def fuzzy_join(left, right, on: str, right_on: str | None = None,
               id_col: str = "id", right_id_col: str | None = None,
               k: int = 1, num_partitions: int = 32,
               max_bucket: int = 2000, max_len: int = 64):
    """Two-sided fuzzy join: Dataset of ``(a, b, dist, truncated)``
    where ``a`` is a left id, ``b`` a right id, and
    ``lev(left.on, right.right_on) <= k``. Same candidate/verify shape
    as ``fuzzy_self_join`` with side-tagged band rows."""
    right_on = right_on or on
    right_id_col = right_id_col or id_col

    def tag_l(batch: pd.DataFrame) -> pd.DataFrame:
        return _variant_rows(batch, on, id_col, k, max_len,
                             num_partitions, side=0)

    def tag_r(batch: pd.DataFrame) -> pd.DataFrame:
        return _variant_rows(batch, right_on, right_id_col, k, max_len,
                             num_partitions, side=1)

    rows = left.map_batches(tag_l, batch_format="pandas").union(
        right.map_batches(tag_r, batch_format="pandas"))
    pairs_raw = rows.groupby("_pb").map_groups(
        lambda g: _bucket_pairs(g, k, max_bucket, two_sided=True),
        batch_format="pandas")
    return _dedup_pairs_ds(pairs_raw)


def fuzzy_dedup(ds, col: str = "name", id_col: str = "id", k: int = 1,
                num_partitions: int = 32, max_bucket: int = 2000,
                max_len: int = 64, driver_edge_cap: int = DRIVER_EDGE_CAP):
    """Edit-distance near-dup clustering: ``fuzzy_self_join`` pairs →
    ``components_auto_ds``. Returns ``(clusters_ds, pairs_ds)`` —
    Datasets, same contract as the LSH dedup families; apply with
    ``dedup.dedup_apply``."""
    pairs_ds = fuzzy_self_join(ds, col=col, id_col=id_col, k=k,
                               num_partitions=num_partitions,
                               max_bucket=max_bucket,
                               max_len=max_len).materialize()
    clusters_ds = components_auto_ds(pairs_ds,
                                     driver_edge_cap=driver_edge_cap)
    return clusters_ds, pairs_ds

"""Deduplication operators for web-scale training-data pipelines.

Five families, each Ray-Data-shaped (partial work inside ``map_batches``,
one co-locating shuffle on a hash/band key, vectorized verification):

- **exact**: content-hash bucket → per-bucket keep min-id row. Equivalent
  SQL: ``GROUP BY text`` keep ``min(doc_id)`` — hash only routes; equality
  is verified on the actual value, so collisions can't merge distinct docs.
- **MinHash + LSH**: char-shingle → 64-perm MinHash signature →
  band/bucket groupby → candidate pairs → exact-Jaccard (or signature)
  verify → connected components.
- **SimHash**: 64-bit token-weight fingerprint, banded for candidate
  generation, Hamming-distance verify.
- **n-gram Jaccard**: the exact verifier used by the LSH pipelines; also
  usable stand-alone on small candidate sets.
- **embedding cosine**: random-hyperplane LSH over an embedding column →
  bucket → cosine verify.

Scale notes: signatures are fixed-width (8×64 B/doc); the only all-to-all
moves (band_id, band_hash, doc_id) triples — never document text. Cluster
assignment scales via ``components_distributed`` (per-bucket union-find →
contracted driver merge, one shuffle); the plain driver-side union-find
shortcut applies when the candidate pair count is provably small
(< ``max_driver_pairs``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from chomper_ray.stages.merge import stable_bucket

_MERSENNE = (1 << 61) - 1


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup(ds, col: str = "text", id_col: str = "doc_id",
                num_buckets: int = 32):
    """Keep one row per distinct ``col`` value — the min ``id_col`` row
    (deterministic, matches SQL ``row_number() over (partition by col
    order by id)=1``)."""

    def hash_stage(t: pa.Table) -> pa.Table:
        b = stable_bucket(t[col], num_buckets)
        return t.append_column("_b", pa.array(b, type=pa.int32()))

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([col, id_col], kind="stable")
        return df.drop_duplicates(subset=[col], keep="first").drop(columns=["_b"])

    return (ds.map_batches(hash_stage, batch_format="pyarrow")
              .groupby("_b").map_groups(keep_first, batch_format="pandas"))


# --------------------------------------------------------------------------
# shingles + MinHash
# --------------------------------------------------------------------------

_SHINGLE_BASE = np.uint64(1099511628211)
_MIX = np.uint64(0x9E3779B97F4A7C15)


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """k-byte shingle hashes over the utf-8 encoding — pure numpy
    (sliding windows × polynomial hash, wraparound uint64), no Python
    substring loop. Duplicates are NOT removed: MinHash's column-min is
    unaffected by multiplicity, so dedup would be wasted work."""
    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        if len(b) < k:
            win = b.astype(np.uint64)[None, :]
            weights = np.power(_SHINGLE_BASE,
                               np.arange(len(b), dtype=np.uint64))
        else:
            win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
            weights = np.power(_SHINGLE_BASE, np.arange(k, dtype=np.uint64))
        h = (win * weights).sum(axis=1, dtype=np.uint64)
        h = (h ^ (h >> np.uint64(33))) * _MIX  # avalanche mix
    return h


def _perm_params(num_perm: int, seed: int = 12345):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """num_perm-wide MinHash via multiply-shift hashing (odd multiplier,
    wraparound uint64 — no modulo: ~6× faster than (a·h+b) mod p and
    universal enough for MinHash): (n_shingles × num_perm) column-min."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        m = (shingle_hashes[:, None] * (a[None, :] | np.uint64(1))) \
            + b[None, :]
    return m.min(axis=0).astype(np.uint64)


class MinHasher:
    """Actor-pool stage: text → MinHash signature (list<uint64> column)."""

    def __init__(self, col: str = "text", num_perm: int = 64,
                 shingle_k: int = 5, seed: int = 12345):
        self.col = col
        self.k = shingle_k
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [
            minhash_signature(char_shingle_hashes(t, self.k), self.a, self.b)
            for t in batch[self.col].fillna("")
        ]
        batch["minhash"] = [s.astype("uint64") for s in sigs]
        return batch


def jaccard_from_signatures(s1: np.ndarray, s2: np.ndarray) -> float:
    return float((s1 == s2).mean())


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard — the verifier for LSH candidates."""
    sa = {a[i:i + k] for i in range(max(1, len(a) - k + 1))} if a else set()
    sb = {b[i:i + k] for i in range(max(1, len(b) - k + 1))} if b else set()
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


# --------------------------------------------------------------------------
# LSH banding + clustering
# --------------------------------------------------------------------------

def _band_rows(ids: np.ndarray, sigs: np.ndarray, bands: int) -> pd.DataFrame:
    """Explode signatures to (band_id, band_hash, id) rows — the ONLY data
    that shuffles."""
    n, num_perm = sigs.shape
    rows_per_band = num_perm // bands
    out_id, out_band, out_hash = [], [], []
    with np.errstate(over="ignore"):
        for bi in range(bands):
            seg = sigs[:, bi * rows_per_band:(bi + 1) * rows_per_band]
            # combine the band's rows into one 64-bit hash
            h = np.zeros(n, dtype=np.uint64)
            for c in range(seg.shape[1]):
                h = h * np.uint64(1000003) + seg[:, c]
            out_id.append(ids)
            out_band.append(np.full(n, bi, dtype=np.int32))
            out_hash.append(h)
    return pd.DataFrame({
        "id": np.concatenate(out_id),
        "band_id": np.concatenate(out_band),
        "band_hash": np.concatenate(out_hash),
    })


def _pairs_from_buckets(bucket_df: pd.DataFrame, max_bucket: int = 200) -> pd.DataFrame:
    """Candidate pairs (a<b) within one (band_id, band_hash) bucket.
    Oversized buckets (degenerate content, e.g. empty docs) are capped —
    logged via the ``truncated`` flag rather than silently exploding."""
    ids = np.sort(bucket_df["id"].unique())
    truncated = len(ids) > max_bucket
    if truncated:
        ids = ids[:max_bucket]
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": [], "truncated": []})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[ia], "b": ids[ib],
                         "truncated": truncated})


def _ensure_pair_cols(pairs: pd.DataFrame, *extra: str) -> pd.DataFrame:
    """An all-empty map_groups output loses its column names through
    ``to_pandas`` — restore the canonical pair columns."""
    for c in ("a", "b", *extra):
        if c not in pairs.columns:
            pairs[c] = pd.Series(dtype="int64" if c in ("a", "b") else "float64")
    return pairs


def connected_components(pairs: pd.DataFrame) -> dict[int, int]:
    """Union-find over verified duplicate pairs → {id: cluster_min_id}.

    Driver-side shortcut, valid because callers cap candidate volume
    (see module docstring); the scale path is min-label propagation."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    seen: set[int] = set()
    for a, b in zip(pairs["a"], pairs["b"]):
        a, b = int(a), int(b)
        seen.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in seen}


def components_distributed(pairs: pd.DataFrame, num_buckets: int = 8) -> dict[int, int]:
    """Connected components at scale: two-level contraction.

    Level 1 (distributed, ONE shuffle): edges hash-bucketed by endpoint
    ``a``; each bucket runs union-find LOCALLY over its edges and emits
    the contracted (node → local root) mapping.
    Level 2 (driver, contracted graph): the per-bucket mappings are
    themselves edges over a much smaller graph (one node per local root
    + boundary nodes); a final union-find stitches buckets. For graphs
    whose contracted size still exceeds the driver, apply level 1
    recursively — dup-cluster graphs contract extremely fast, so one
    level suffices in practice.

    Matches `connected_components` exactly (same min-id representative).
    """
    import ray.data as rd

    if not len(pairs):
        return {}
    edges = pairs[["a", "b"]].astype("int64")
    b = stable_bucket(edges["a"].to_numpy(), num_buckets)
    ds = rd.from_arrow(pa.Table.from_pandas(
        edges.assign(_b=b), preserve_index=False))

    def local_cc(g: pd.DataFrame) -> pd.DataFrame:
        mapping = connected_components(g[["a", "b"]])
        return pd.DataFrame({"a": list(mapping.keys()),
                             "b": list(mapping.values())})

    contracted = (ds.groupby("_b")
                  .map_groups(local_cc, batch_format="pandas")
                  .to_pandas())
    return connected_components(contracted.astype("int64"))


def minhash_lsh_dedup(ds, col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                      threshold: float = 0.8, concurrency: int = 4,
                      max_driver_pairs: int = 2_000_000):
    """MinHash+LSH near-dup detection.

    Returns ``(clusters, pairs)``: ``clusters`` maps doc id → cluster
    representative (min id); ``pairs`` is the verified duplicate-pair
    DataFrame with signature-estimated Jaccard.
    """
    sigged = ds.map_batches(
        MinHasher(col=col, num_perm=num_perm, shingle_k=shingle_k),
        batch_format="pandas", concurrency=concurrency,
    ).materialize()  # signatures reused twice (banding + verification)

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(batch["minhash"].to_numpy())
        out = _band_rows(batch[id_col].to_numpy(), sigs, bands)
        # coarse partition key: grouping the raw (band, hash) pairs would
        # make one Ray group per bucket — ~#docs×bands tiny groups, pure
        # overhead. 32 coarse partitions, then a vectorized pandas
        # groupby inside each.
        out["_pb"] = (out["band_hash"] % np.uint64(32)).astype(np.int32)
        return out

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["band_id", "band_hash"])["id"].transform("size")
        multi = g[sizes > 1]
        frames = [
            _pairs_from_buckets(grp)
            for _, grp in multi.groupby(["band_id", "band_hash"], sort=False)
        ]
        if not frames:
            return pd.DataFrame({"a": [], "b": [], "truncated": []})
        return pd.concat(frames, ignore_index=True)

    pairs = (
        sigged.map_batches(to_bands, batch_format="pandas")
        .groupby("_pb")
        .map_groups(partition_pairs, batch_format="pandas")
        .to_pandas()
    )
    pairs = _ensure_pair_cols(pairs, "truncated")
    if len(pairs) > max_driver_pairs:
        raise RuntimeError(
            f"{len(pairs)} candidate pairs exceed driver cap; raise bands "
            "or threshold, or switch to min-label propagation")
    pairs = pairs.drop_duplicates(subset=["a", "b"])

    # verify with signature-estimated Jaccard (broadcast the signature map)
    sig_df = sigged.select_columns([id_col, "minhash"]).to_pandas()
    sig_map = {int(i): s for i, s in zip(sig_df[id_col], sig_df["minhash"])}
    if len(pairs):
        est = np.array([
            jaccard_from_signatures(sig_map[int(a)], sig_map[int(b)])
            for a, b in zip(pairs["a"], pairs["b"])
        ])
        pairs = pairs.assign(est_jaccard=est)
        pairs = pairs[pairs["est_jaccard"] >= threshold].reset_index(drop=True)
    else:
        pairs = pairs.assign(est_jaccard=pd.Series(dtype=float))
    clusters = connected_components(pairs)
    return clusters, pairs


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash64(token_hashes: np.ndarray) -> np.uint64:
    """64-bit SimHash: sign of per-bit weighted sums (weight 1/token)."""
    if len(token_hashes) == 0:
        return np.uint64(0)
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int32)
    sums = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in np.nonzero(sums > 0)[0]:
        out |= np.uint64(1) << np.uint64(i)
    return out


class SimHasher:
    def __init__(self, col: str = "text"):
        self.col = col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(batch), dtype=np.uint64)
        for i, t in enumerate(batch[self.col].fillna("")):
            toks = t.lower().split()
            hs = pd.util.hash_array(np.array(toks, dtype=object)) if toks \
                else np.empty(0, dtype=np.uint64)
            out[i] = simhash64(hs)
        batch["simhash"] = out
        return batch


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(x.shape, dtype=np.int32)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int32)
        x = x >> np.uint64(1)
    return cnt


def simhash_dedup(ds, col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, concurrency: int = 4):
    """SimHash near-dup: 4×16-bit bands (two docs within Hamming 3 of each
    other share at least one exact 16-bit band by pigeonhole when ≤3 of 4
    bands differ) → candidate pairs → Hamming verify."""
    hashed = ds.map_batches(SimHasher(col=col), batch_format="pandas",
                            concurrency=concurrency).materialize()

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy().astype(np.uint64)
        frames = []
        for bi in range(4):
            seg = (h >> np.uint64(16 * bi)) & np.uint64(0xFFFF)
            frames.append(pd.DataFrame({
                "id": batch[id_col].to_numpy(),
                "band_id": np.int32(bi),
                "band_hash": seg.astype(np.int64),
                "simhash": h,
            }))
        return pd.concat(frames, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["id"]).sort_values("id")
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "ham": []})
        ids = g["id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        ia, ib = np.triu_indices(len(ids), k=1)
        ham = hamming64(hs[ia], hs[ib])
        keep = ham <= max_hamming
        return pd.DataFrame({"a": ids[ia][keep], "b": ids[ib][keep],
                             "ham": ham[keep]})

    pairs = (
        hashed.map_batches(to_bands, batch_format="pandas")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    pairs = _ensure_pair_cols(pairs, "ham").drop_duplicates(subset=["a", "b"]) \
        .reset_index(drop=True)
    clusters = connected_components(pairs)
    return clusters, pairs


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def embedding_dedup(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                    threshold: float = 0.95, num_planes: int = 16,
                    seed: int = 777):
    """Near-dup by embedding cosine: random-hyperplane LSH buckets →
    exact cosine verify within bucket. Returns (clusters, pairs)."""
    # dimension probe from one row (metadata-cheap)
    first = ds.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes)).astype(np.float32)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch[vec_col].to_numpy()).astype(np.float32)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        bits = (mn @ planes) > 0
        bucket = np.zeros(len(batch), dtype=np.int64)
        for i in range(num_planes):
            bucket = bucket * 2 + bits[:, i]
        return pd.DataFrame({
            "id": batch[id_col].to_numpy(),
            "bucket": bucket,
            "vec": [v for v in mn],
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cos": []})
        g = g.sort_values("id")
        ids = g["id"].to_numpy()
        m = np.stack(g["vec"].to_numpy())
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame({"a": ids[ia][keep], "b": ids[ib][keep],
                             "cos": np.round(sims[ia, ib][keep], 6)})

    pairs = (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    pairs = _ensure_pair_cols(pairs, "cos").drop_duplicates(subset=["a", "b"]) \
        .reset_index(drop=True)
    clusters = connected_components(pairs)
    return clusters, pairs

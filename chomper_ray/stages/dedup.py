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

Scale notes: the only all-to-all moves band rows — (band_id, band_hash,
doc_id) plus the doc's fixed-width verifier data (MinHash signature /
SimHash fingerprint / normalized embedding) — never document text.
Verification happens INSIDE the band bucket where candidates are already
co-located, so no signature table, vector set, or candidate-pair list
ever gathers on the driver. Cluster assignment runs through
``components_auto_ds`` (per-bucket union-find → per-node stitch stage →
tiny driver stitch over boundary roots only); the plain driver-side
``connected_components`` stays available as the small-input shortcut and
the property-test oracle.

Result surface (Dataset-native, 100 TB-safe): every near-dup family
returns ``(clusters_ds, pairs_ds)`` — both ``ray.data.Dataset``s.
``clusters_ds`` has columns ``(id:int64, rep:int64)``, one row per doc
that participates in a duplicate cluster (singletons are absent —
absence means rep == id). ``pairs_ds`` is the verified duplicate-pair
Dataset. Neither ever materializes on the driver; apply the result with
``dedup_apply`` (a bucketed anti-join), never by collecting clusters
into a driver-side set.
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

def _band_rows(ids: np.ndarray, sigs: np.ndarray, bands: int,
               attach_sigs: bool = False) -> pd.DataFrame:
    """Explode signatures to (band_id, band_hash, id) rows — with
    ``attach_sigs`` each band row also carries the doc's signature, so the
    downstream bucketed stage can VERIFY candidates where they are grouped
    (no driver-side signature map). Shuffle volume with sigs attached is
    ``bands × num_perm × 8 B`` per doc (64 perms × 16 bands = 8 KB) —
    comparable to shuffling the text once; the cheaper-but-extra-shuffle
    alternative (join pairs back to signatures by id) is noted in
    ``minhash_lsh_dedup``."""
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
    out = pd.DataFrame({
        "id": np.concatenate(out_id),
        "band_id": np.concatenate(out_band),
        "band_hash": np.concatenate(out_hash),
    })
    if attach_sigs:
        out["minhash"] = list(sigs) * bands
    return out


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


def _empty_clusters_ds():
    import ray.data as rd

    return rd.from_arrow(pa.table({"id": pa.array([], pa.int64()),
                                   "rep": pa.array([], pa.int64())}))


def components_ds(pairs_ds, num_buckets: int = 8):
    """Connected components over a DATASET of edges → DATASET of
    ``(id, rep)`` rows. Nothing O(duplicate nodes) ever lands on the
    driver. Three stages:

    1. Edges hash-bucketed by endpoint ``a``; each bucket runs
       union-find LOCALLY over its edges and emits (node, local_root)
       rows — a node reached from several buckets has one row per
       bucket. Stays a Dataset.
    2. (node, root) rows hash-bucketed by node; per node emit ONE
       assignment row (node, min_root) plus, for nodes whose buckets
       disagree, STITCH edges (min_root, other_root). Two local roots
       belong to one true component iff some chain of shared nodes
       connects them — exactly what the stitch edges encode.
    3. Driver union-find over the stitch edges ONLY — O(boundary
       roots), a contraction of the contraction, tiny for dup-cluster
       graphs — broadcast via ``ray.put``; assignment rows map through
       it distributively.

    Duplicate edges (the same pair surfacing from several LSH bands)
    are harmless — union-find is idempotent. Matches
    ``connected_components`` exactly (same min-id representative): the
    component's global-min node is a local root in every bucket that
    sees it, so the stitched min over local roots is the global min.
    """
    import ray

    def bucket_edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "_b": pa.array([], pa.int32())})
        t = pa.table({"a": t["a"].cast(pa.int64()),
                      "b": t["b"].cast(pa.int64())})
        bk = stable_bucket(t["a"], num_buckets)
        return t.append_column("_b", pa.array(bk, type=pa.int32()))

    def local_cc(g: pd.DataFrame) -> pd.DataFrame:
        mapping = connected_components(g[["a", "b"]])
        return pd.DataFrame({"id": pd.Series(list(mapping.keys()), dtype="int64"),
                             "root": pd.Series(list(mapping.values()), dtype="int64")})

    m1 = (pairs_ds.map_batches(bucket_edges, batch_format="pyarrow")
          .groupby("_b").map_groups(local_cc, batch_format="pandas"))

    def bucket_nodes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "id" not in t.column_names:
            return pa.table({"id": pa.array([], pa.int64()),
                             "root": pa.array([], pa.int64()),
                             "_nb": pa.array([], pa.int32())})
        t = t.select(["id", "root"])
        bk = stable_bucket(t["id"], num_buckets)
        return t.append_column("_nb", pa.array(bk, type=pa.int32()))

    def per_node(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["id", "root"])
        minroot = g.groupby("id")["root"].min().rename("minroot")
        g2 = g.join(minroot, on="id")
        edges = g2[g2["root"] != g2["minroot"]]
        nodes = minroot.reset_index()
        return pd.concat([
            pd.DataFrame({"u": nodes["id"].astype("int64"),
                          "v": nodes["minroot"].astype("int64"),
                          "kind": np.int8(0)}),
            pd.DataFrame({"u": edges["minroot"].astype("int64"),
                          "v": edges["root"].astype("int64"),
                          "kind": np.int8(1)}),
        ], ignore_index=True)

    m2 = (m1.map_batches(bucket_nodes, batch_format="pyarrow")
          .groupby("_nb").map_groups(per_node, batch_format="pandas")
          .materialize())

    # stitch graph only: O(boundary roots), not O(duplicate nodes)
    stitch = m2.map_batches(
        lambda df: df[df["kind"] == 1][["u", "v"]]
        .rename(columns={"u": "a", "v": "b"})
        if len(df) and "kind" in df.columns
        else pd.DataFrame({"a": pd.Series(dtype="int64"),
                           "b": pd.Series(dtype="int64")}),
        batch_format="pandas").to_pandas()
    final = connected_components(stitch) if len(stitch) else {}
    final_ref = ray.put(final)

    def apply_final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "kind" not in df.columns:
            return pd.DataFrame({"id": pd.Series(dtype="int64"),
                                 "rep": pd.Series(dtype="int64")})
        df = df[df["kind"] == 0]
        fm = ray.get(final_ref)
        rep = df["v"]
        if fm:
            rep = rep.map(fm).fillna(rep)  # dict map is C-level, not a row loop
        return pd.DataFrame({"id": df["u"].astype("int64").to_numpy(),
                             "rep": rep.astype("int64").to_numpy()})

    return m2.map_batches(apply_final, batch_format="pandas")


DRIVER_EDGE_CAP = 200_000


def components_auto_ds(pairs_mat, num_buckets: int = 8,
                       driver_edge_cap: int = DRIVER_EDGE_CAP):
    """Route clustering by edge volume → Dataset of ``(id, rep)``.

    Verified-duplicate edges are O(actual duplicates), so below
    ``driver_edge_cap`` (bounded by construction — never unbounded
    input) the driver union-find beats the distributed contraction's
    extra shuffles; above it, ``components_ds``. ``pairs_mat`` must be
    a MATERIALIZED Dataset (count() is then metadata-only)."""
    import ray.data as rd

    n = pairs_mat.count()
    if n == 0:
        return _empty_clusters_ds()
    if n <= driver_edge_cap:
        mapping = connected_components(pairs_mat.to_pandas())
        ids = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
        reps = np.fromiter(mapping.values(), dtype=np.int64, count=len(mapping))
        return rd.from_arrow(pa.table({"id": pa.array(ids),
                                       "rep": pa.array(reps)}))
    return components_ds(pairs_mat, num_buckets=num_buckets)


def components_distributed(pairs: pd.DataFrame, num_buckets: int = 8) -> dict[int, int]:
    """DataFrame-in/dict-out convenience wrapper over ``components_ds``
    (test oracle + small-input shortcut; NOT the scale path)."""
    import ray.data as rd

    if not len(pairs):
        return {}
    edges = pairs[["a", "b"]].astype("int64")
    out = components_ds(
        rd.from_arrow(pa.Table.from_pandas(edges, preserve_index=False)),
        num_buckets=num_buckets).to_pandas()
    if not len(out):
        return {}
    return dict(zip(out["id"].astype(int), out["rep"].astype(int)))


def clusters_dict(clusters_ds) -> dict[int, int]:
    """Collect a clusters Dataset to a driver dict — TEST/driver-compare
    convenience only; the engine path is ``dedup_apply``."""
    df = clusters_ds.to_pandas()
    if not len(df):
        return {}
    return dict(zip(df["id"].astype(int), df["rep"].astype(int)))


def _dedup_pairs_ds(pairs_ds, num_buckets: int = 16):
    """Distributed drop-duplicates on (a, b): the same pair can surface
    from several LSH bands routed to DIFFERENT coarse partitions, so the
    per-partition dedup inside the verify stage isn't global. One small
    shuffle over O(verified duplicates) rows."""
    def bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_db", pa.array([], pa.int32()))
        bk = stable_bucket(t["a"], num_buckets)
        return t.append_column("_db", pa.array(bk, type=pa.int32()))

    def drop(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["a", "b"]).drop(columns=["_db"])

    return (pairs_ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("_db").map_groups(drop, batch_format="pandas"))


def dedup_apply(ds, clusters_ds, id_col: str = "doc_id",
                num_buckets: int = 16, schema=None):
    """Apply a dedup result: drop every non-representative cluster member
    from ``ds`` via a bucketed anti-join — no O(#duplicates) set ever
    forms on the driver (the scale-safe replacement for collecting
    ``clusters_ds`` into a frozenset).

    ``schema``: pass ``ds``'s static Arrow schema when ``ds`` carries a
    pending shuffle — ``ds.schema()`` on such a plan EXECUTES it. A
    materialized or freshly-read ``ds`` needs nothing."""
    from chomper_ray.pipelines.relational import _hash_semi_anti

    dup_ids = clusters_ds.map_batches(
        lambda df: df[df["id"] != df["rep"]][["id"]]
        if len(df) and "id" in df.columns
        else pd.DataFrame({"id": pd.Series(dtype="int64")}),
        batch_format="pandas")
    return _hash_semi_anti(ds, dup_ids, on=id_col, right_on="id",
                           anti=True, num_buckets=num_buckets,
                           left_schema=schema)


def _empty_verified_pairs(score_col: str) -> pd.DataFrame:
    return pd.DataFrame({
        "a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
        "truncated": pd.Series(dtype="bool"),
        score_col: pd.Series(dtype="float64"),
    })


def minhash_lsh_dedup(ds, col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                      threshold: float = 0.8, concurrency: int | None = None,
                      num_partitions: int = 32, max_bucket: int = 200,
                      driver_edge_cap: int = DRIVER_EDGE_CAP):
    """MinHash+LSH near-dup detection — fully off-driver.

    Pipeline (one co-locating shuffle, verification inside it):

    1. ``MinHasher`` actor pool → per-doc signature.
    2. Band rows ``(id, band_id, band_hash, minhash)`` — the signature
       rides with its band row, so the candidate's verifier data is
       already co-located in the band bucket. Coarse ``_pb`` partitioning
       (``band_hash % num_partitions``) avoids one-Ray-group-per-bucket
       overhead; size ``num_partitions`` so a partition's band rows
       (≈ docs × bands × num_perm × 8 B / num_partitions) fit a worker.
    3. Per-partition: vectorized pandas groupby over the real
       (band_id, band_hash) buckets → candidate pairs (capped per bucket)
       → signature-estimated Jaccard VERIFIED in place — stacked
       signature matrices compared row-wise, no per-pair Python call —
       only pairs ≥ threshold leave the stage.
    4. Clusters via ``components_auto_ds`` — the driver sees only the
       boundary stitch graph, never signatures or candidate pairs.

    Shuffle-volume alternative for very wide signatures: ship bare band
    rows and hash-join the pairs back to the signature table by id
    (≈ bands× less shuffle, two extra shuffles); this direct layout wins
    while ``bands × num_perm × 8 B`` stays within ~1× the text payload.

    Returns ``(clusters_ds, pairs_ds)`` — both Datasets (see module
    docstring); apply with ``dedup_apply``.
    """
    # instance without concurrency = stateless TASK pool (the perm
    # params are construction-cheap); pass concurrency for an actor pool
    kw = {"concurrency": concurrency} if concurrency else {}
    sigged = ds.map_batches(
        MinHasher(col=col, num_perm=num_perm, shingle_k=shingle_k),
        batch_format="pandas", **kw,
    )

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(batch["minhash"].to_numpy())
        out = _band_rows(batch[id_col].to_numpy(), sigs, bands,
                         attach_sigs=True)
        out["_pb"] = (out["band_hash"] % np.uint64(num_partitions)) \
            .astype(np.int32)
        return out

    def partition_verified_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["band_id", "band_hash", "id"])
        sizes = g.groupby(["band_id", "band_hash"])["id"].transform("size")
        multi = g[sizes > 1]
        frames = []
        for _, grp in multi.groupby(["band_id", "band_hash"], sort=False):
            grp = grp.sort_values("id")
            truncated = len(grp) > max_bucket
            if truncated:
                # degenerate bucket (e.g. empty docs): cap, flag — don't
                # silently explode to O(n²) pairs
                grp = grp.iloc[:max_bucket]
            if len(grp) < 2:
                continue
            ids = grp["id"].to_numpy()
            sigs = np.stack([np.asarray(s, dtype=np.uint64)
                             for s in grp["minhash"].to_numpy()])
            ia, ib = np.triu_indices(len(ids), k=1)
            # vectorized signature-Jaccard: one matrix compare for the
            # whole bucket, no per-pair Python call
            est = (sigs[ia] == sigs[ib]).mean(axis=1)
            keep = est >= threshold
            if not keep.any():
                continue
            frames.append(pd.DataFrame({
                "a": ids[ia][keep].astype(np.int64),
                "b": ids[ib][keep].astype(np.int64),
                "truncated": truncated,
                "est_jaccard": est[keep].astype(np.float64),
            }))
        if not frames:
            return _empty_verified_pairs("est_jaccard")
        out = pd.concat(frames, ignore_index=True)
        # same pair from several bands within this partition: keep one
        out = out.drop_duplicates(subset=["a", "b"])
        return out.astype({"a": "int64", "b": "int64", "truncated": "bool",
                           "est_jaccard": "float64"})

    pairs_raw = (
        sigged.map_batches(to_bands, batch_format="pandas")
        .groupby("_pb")
        .map_groups(partition_verified_pairs, batch_format="pandas")
    )
    # verified pairs only — globally deduped, reused by clustering + return
    pairs_ds = _dedup_pairs_ds(pairs_raw).materialize()
    clusters_ds = components_auto_ds(pairs_ds, driver_edge_cap=driver_edge_cap)
    return clusters_ds, pairs_ds


# --------------------------------------------------------------------------
# n-gram Jaccard (exact verification) dedup
# --------------------------------------------------------------------------

def exact_jaccard_batch(sh_a, sh_b) -> np.ndarray:
    """Vectorized EXACT Jaccard for a batch of candidate pairs: each side
    is a sequence of unique uint64 shingle-hash arrays. One structured
    ``(pair, hash)`` ``np.intersect1d`` for the whole batch — no per-pair
    Python call. Exact up to 64-bit shingle-hash collisions (~n²/2⁶⁵).
    Both-empty pairs score 1.0 (identical empty docs), matching
    ``ngram_jaccard``."""
    n = len(sh_a)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    la = np.fromiter((len(x) for x in sh_a), np.int64, n)
    lb = np.fromiter((len(x) for x in sh_b), np.int64, n)
    dt = np.dtype([("p", "<i8"), ("h", "<u8")])

    def keys(sh, ln):
        k = np.empty(int(ln.sum()), dt)
        k["p"] = np.repeat(np.arange(n), ln)
        k["h"] = np.concatenate(
            [np.asarray(x, dtype=np.uint64) for x in sh])
        return k

    inter_k = np.intersect1d(keys(sh_a, la), keys(sh_b, lb),
                             assume_unique=True)
    inter = np.bincount(inter_k["p"], minlength=n)
    union = la + lb - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


class ShingleSetter:
    """Task-pool stage: text → UNIQUE k-shingle hash set (list<uint64>).
    Only ever run on LSH-candidate docs (post Bloom semi-join), so the
    heavy set payload is computed and shuffled for the candidate subset,
    never the corpus."""

    def __init__(self, col: str = "text", shingle_k: int = 5):
        self.col = col
        self.k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["sh"] = [
            np.unique(char_shingle_hashes(t, self.k)).astype("uint64")
            for t in batch[self.col].fillna("")
        ]
        return batch


def _attach_shingles(pairs_ds, pair_key: str, docs_ds, id_col: str,
                     out_col: str, carry: list[tuple[str, pa.DataType]],
                     num_buckets: int = 16):
    """Bucketed join-back: attach each candidate doc's shingle set to the
    pair rows that reference it via ``pair_key``. Same co-hash-partition
    shape as ``relational.hash_join``, specialized to one list column so
    the pair schema (which grows across the two attach passes) stays
    explicit. Shuffle volume: pairs + candidate shingle sets — never the
    corpus."""
    sh_t = pa.list_(pa.uint64())
    out_fields = ([pa.field("a", pa.int64()), pa.field("b", pa.int64()),
                   pa.field("truncated", pa.bool_())]
                  + [pa.field(c, t) for c, t in carry]
                  + [pa.field(out_col, sh_t)])
    out_schema = pa.schema(out_fields)
    pair_cols = ["a", "b", "truncated"] + [c for c, _ in carry]

    def tag_pairs(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in pair_cols}
        cols["_id"] = t[pair_key]
        cols["sh"] = pa.nulls(t.num_rows, sh_t)
        cols["_side"] = pa.array(["p"] * t.num_rows)
        out = pa.table(cols)
        bk = stable_bucket(out["_id"], num_buckets)
        return out.append_column("_jb", pa.array(bk, type=pa.int32()))

    def tag_docs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {c: pa.nulls(t.num_rows, out_schema.field(
            c if c != pair_key else "a").type) for c in pair_cols}
        cols["_id"] = pc.cast(t[id_col], pa.int64())
        cols["sh"] = t["sh"].combine_chunks() if isinstance(
            t["sh"], pa.ChunkedArray) else t["sh"]
        cols["_side"] = pa.array(["d"] * t.num_rows)
        out = pa.table(cols)
        bk = stable_bucket(out["_id"], num_buckets)
        return out.append_column("_jb", pa.array(bk, type=pa.int32()))

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        p = g[g["_side"] == "p"]
        d = g[g["_side"] == "d"][["_id", "sh"]]
        out = p.drop(columns=["sh", "_side", "_jb"]).merge(
            d, on="_id", how="inner").drop(columns=["_id"]) \
            .rename(columns={"sh": out_col})
        if not len(out):
            out = pd.DataFrame({f.name: pd.Series(dtype="object")
                                for f in out_schema})
        return pa.Table.from_pandas(out[[f.name for f in out_schema]],
                                    schema=out_schema,
                                    preserve_index=False)

    tagged_p = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow")
    tagged_d = docs_ds.map_batches(tag_docs, batch_format="pyarrow")
    return (tagged_p.union(tagged_d).groupby("_jb")
            .map_groups(join_bucket, batch_format="pandas"))


def ngram_jaccard_dedup(ds, col: str = "text", id_col: str = "doc_id",
                        num_perm: int = 64, bands: int = 16,
                        shingle_k: int = 5, threshold: float = 0.7,
                        num_partitions: int = 32, max_bucket: int = 200,
                        driver_edge_cap: int = DRIVER_EDGE_CAP):
    """Near-dup detection with EXACT n-gram Jaccard verification — the
    fourth dedup family, for thresholds where the 64-perm signature
    estimate (σ ≈ 1/√perms ≈ 0.125) is too coarse.

    vs ``minhash_lsh_dedup``, candidate generation is identical (MinHash
    bands) but verification data takes the join-back route the minhash
    docstring sketches, because shingle SETS are ~|text| × 8 B — far too
    heavy to ride every band row:

    1. BARE band rows (no signatures) → per-partition candidate pairs.
    2. Global pair dedup (O(candidates) rows).
    3. ``bloom_semi_join`` prunes the corpus to candidate docs, THEN
       ``ShingleSetter`` computes sets for those docs only — recompute
       beats storing: no materialized corpus-wide shingle table.
    4. Two bucketed join-backs co-locate (pair, sh_a, sh_b); one
       structured-dtype ``np.intersect1d`` per batch verifies exactly.
    5. Pairs ≥ threshold cluster via ``components_auto_ds``.

    Returns ``(clusters_ds, pairs_ds)``; ``pairs_ds`` carries the true
    ``jaccard`` per verified pair. Apply with ``dedup_apply``."""
    from chomper_ray.pipelines.relational import bloom_semi_join

    sigged = ds.map_batches(
        MinHasher(col=col, num_perm=num_perm, shingle_k=shingle_k),
        batch_format="pandas",
    )

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(batch["minhash"].to_numpy())
        out = _band_rows(batch[id_col].to_numpy(), sigs, bands,
                         attach_sigs=False)
        out["_pb"] = (out["band_hash"] % np.uint64(num_partitions)) \
            .astype(np.int32)
        return out

    def partition_candidates(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["band_id", "band_hash", "id"])
        sizes = g.groupby(["band_id", "band_hash"])["id"].transform("size")
        multi = g[sizes > 1]
        frames = []
        for _, grp in multi.groupby(["band_id", "band_hash"], sort=False):
            grp = grp.sort_values("id")
            truncated = len(grp) > max_bucket
            if truncated:
                grp = grp.iloc[:max_bucket]
            if len(grp) < 2:
                continue
            ids = grp["id"].to_numpy()
            ia, ib = np.triu_indices(len(ids), k=1)
            frames.append(pd.DataFrame({
                "a": ids[ia].astype(np.int64),
                "b": ids[ib].astype(np.int64),
                "truncated": truncated,
            }))
        if not frames:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "truncated": pd.Series(dtype="bool")})
        return (pd.concat(frames, ignore_index=True)
                .drop_duplicates(subset=["a", "b"]))

    cand = (sigged.map_batches(to_bands, batch_format="pandas")
            .groupby("_pb")
            .map_groups(partition_candidates, batch_format="pandas"))
    # candidates deduped globally BEFORE any shingle payload attaches
    cand = _dedup_pairs_ds(cand).materialize()

    cand_ids = cand.map_batches(
        lambda df: pd.DataFrame(
            {"id": np.concatenate([df["a"].to_numpy(np.int64),
                                   df["b"].to_numpy(np.int64)])
             if len(df) else np.empty(0, np.int64)}),
        batch_format="pandas")
    def sh_to_arrow(df: pd.DataFrame) -> pa.Table:
        # explicit list<uint64>: letting pandas->Arrow inference run
        # would produce Ray's variable-shaped tensor extension type,
        # which cannot concat with the plain list nulls the pair side
        # carries through the attach shuffle
        return pa.table({
            id_col: pa.array(df[id_col], type=pa.int64()),
            "sh": pa.array(list(df["sh"]), type=pa.list_(pa.uint64())),
        })

    cand_docs = bloom_semi_join(
        ds, cand_ids, on=id_col, right_on="id") \
        .map_batches(ShingleSetter(col=col, shingle_k=shingle_k),
                     batch_format="pandas") \
        .map_batches(sh_to_arrow, batch_format="pandas") \
        .materialize()  # read twice (one per attach pass)

    with_a = _attach_shingles(cand, "a", cand_docs, id_col, "sh_a",
                              carry=[])
    with_ab = _attach_shingles(with_a, "b", cand_docs, id_col, "sh_b",
                               carry=[("sh_a", pa.list_(pa.uint64()))])

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "truncated": pd.Series(dtype="bool"),
                "jaccard": pd.Series(dtype="float64")})
        j = exact_jaccard_batch(df["sh_a"].to_numpy(),
                                df["sh_b"].to_numpy())
        out = df.loc[j >= threshold, ["a", "b", "truncated"]].copy()
        out["jaccard"] = j[j >= threshold]
        return out.astype({"a": "int64", "b": "int64",
                           "truncated": "bool", "jaccard": "float64"})

    pairs_ds = with_ab.map_batches(verify, batch_format="pandas") \
        .materialize()
    clusters_ds = components_auto_ds(pairs_ds,
                                     driver_edge_cap=driver_edge_cap)
    return clusters_ds, pairs_ds


def jaccard_dedup_exact(ds, col: str = "text", id_col: str = "doc_id",
                        shingle_k: int = 5, threshold: float = 0.8,
                        num_partitions: int = 32,
                        max_df: int | None = None,
                        driver_edge_cap: int = DRIVER_EDGE_CAP):
    """EXACT near-dup detection — the zero-false-negative sibling of
    ``ngram_jaccard_dedup``: candidate pairs come from SHINGLE
    CO-OCCURRENCE (two docs with Jaccard > 0 must share at least one
    distinct shingle, so blocking on shingles misses NOTHING), verified
    by the same exact set-intersection kernel, clustered by connected
    components with min-id representatives.

    Cost model vs the LSH families: the blocking exchange carries one
    row per DISTINCT (shingle, doc) — proportional to total text bytes,
    not to a fixed signature width — and a shingle shared by ``df``
    docs contributes O(df²) candidate pairs. That is the price of
    exactness: right for moderate corpora, high-value slices, and
    recall audits of the LSH paths; at web scale use
    ``minhash_lsh_dedup``/``ngram_jaccard_dedup`` and accept their
    measured recall. ``max_df`` (opt-in) skips blocking on shingles
    hotter than the bound — breaking the exactness guarantee only for
    pairs whose EVERY shared shingle is that hot.

    Docs with no shingles (empty text) are singletons by definition
    here (they generate no candidates); note ``exact_jaccard_batch``'s
    both-empty-score-1.0 convention never applies because empty docs
    never reach verification.

    Returns ``(clusters_ds, pairs_ds)`` like the other dedup families;
    apply with ``dedup_apply``. Hash collisions (~n²/2⁶⁵ on 64-bit
    shingle hashes) are the only deviation from true exactness."""
    from chomper_ray.pipelines.relational import bloom_semi_join

    def to_shingle_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids, shs = [], []
        for i, t in zip(batch[id_col], batch[col].fillna("")):
            u = np.unique(char_shingle_hashes(t, shingle_k))
            if len(u):
                ids.append(np.full(len(u), int(i), dtype=np.int64))
                shs.append(u)
        if not ids:
            return pd.DataFrame({"id": pd.Series(dtype="int64"),
                                 "sh": pd.Series(dtype="uint64"),
                                 "_pb": pd.Series(dtype="int32")})
        out = pd.DataFrame({"id": np.concatenate(ids),
                            "sh": np.concatenate(shs)})
        out["_pb"] = (out["sh"] % np.uint64(num_partitions)) \
            .astype(np.int32)
        return out

    def partition_candidates(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("sh")["id"].transform("size")
        multi = g[(sizes > 1)
                  & ((sizes <= max_df) if max_df else True)]
        frames = []
        for _, grp in multi.groupby("sh", sort=False):
            ids = np.sort(grp["id"].to_numpy())
            ia, ib = np.triu_indices(len(ids), k=1)
            frames.append(pd.DataFrame({
                "a": ids[ia].astype(np.int64),
                "b": ids[ib].astype(np.int64)}))
        if not frames:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "truncated": pd.Series(dtype="bool")})
        out = pd.concat(frames, ignore_index=True) \
            .drop_duplicates(subset=["a", "b"])
        out["truncated"] = False
        return out

    cand = (ds.map_batches(to_shingle_rows, batch_format="pandas")
            .groupby("_pb")
            .map_groups(partition_candidates, batch_format="pandas"))
    cand = _dedup_pairs_ds(cand).materialize()

    cand_ids = cand.map_batches(
        lambda df: pd.DataFrame(
            {"id": np.concatenate([df["a"].to_numpy(np.int64),
                                   df["b"].to_numpy(np.int64)])
             if len(df) else np.empty(0, np.int64)}),
        batch_format="pandas")

    def sh_to_arrow(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            id_col: pa.array(df[id_col], type=pa.int64()),
            "sh": pa.array(list(df["sh"]), type=pa.list_(pa.uint64())),
        })

    cand_docs = bloom_semi_join(
        ds, cand_ids, on=id_col, right_on="id") \
        .map_batches(ShingleSetter(col=col, shingle_k=shingle_k),
                     batch_format="pandas") \
        .map_batches(sh_to_arrow, batch_format="pandas") \
        .materialize()

    with_a = _attach_shingles(cand, "a", cand_docs, id_col, "sh_a",
                              carry=[])
    with_ab = _attach_shingles(with_a, "b", cand_docs, id_col, "sh_b",
                               carry=[("sh_a", pa.list_(pa.uint64()))])

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "truncated": pd.Series(dtype="bool"),
                "jaccard": pd.Series(dtype="float64")})
        j = exact_jaccard_batch(df["sh_a"].to_numpy(),
                                df["sh_b"].to_numpy())
        out = df.loc[j >= threshold, ["a", "b", "truncated"]].copy()
        out["jaccard"] = j[j >= threshold]
        return out.astype({"a": "int64", "b": "int64",
                           "truncated": "bool", "jaccard": "float64"})

    pairs_ds = with_ab.map_batches(verify, batch_format="pandas") \
        .materialize()
    clusters_ds = components_auto_ds(pairs_ds,
                                     driver_edge_cap=driver_edge_cap)
    return clusters_ds, pairs_ds


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
                  max_hamming: int = 3, concurrency: int | None = None,
                  num_partitions: int = 32,
                  driver_edge_cap: int = DRIVER_EDGE_CAP):
    """SimHash near-dup: 4×16-bit bands (two docs within Hamming 3 of each
    other share at least one exact 16-bit band by pigeonhole when ≤3 of 4
    bands differ) → candidate pairs → Hamming verify IN the band bucket
    (the 8-byte fingerprint rides each band row) → distributed
    connected-components. Coarse ``_pb`` partitioning + a vectorized
    pandas groupby inside, same shape as ``minhash_lsh_dedup``; the
    driver only ever sees the boundary stitch graph. Returns
    ``(clusters_ds, pairs_ds)`` Datasets; apply with ``dedup_apply``."""
    kw = {"concurrency": concurrency} if concurrency else {}
    hashed = ds.map_batches(SimHasher(col=col), batch_format="pandas", **kw)

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
        out = pd.concat(frames, ignore_index=True)
        out["_pb"] = ((np.left_shift(out["band_id"].to_numpy(np.int64), 16)
                       | out["band_hash"].to_numpy(np.int64))
                      % num_partitions).astype(np.int32)
        return out

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty_verified_pairs("ham")[["a", "b", "ham"]]
        g = g.sort_values("id")
        ids = g["id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        ia, ib = np.triu_indices(len(ids), k=1)
        ham = hamming64(hs[ia], hs[ib])
        keep = ham <= max_hamming
        return pd.DataFrame({"a": ids[ia][keep].astype(np.int64),
                             "b": ids[ib][keep].astype(np.int64),
                             "ham": ham[keep].astype(np.float64)})

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["band_id", "band_hash"])["id"].transform("size")
        multi = g[sizes > 1].drop_duplicates(subset=["band_id", "band_hash", "id"])
        frames = [bucket_pairs(grp) for _, grp in
                  multi.groupby(["band_id", "band_hash"], sort=False)]
        frames = [f for f in frames if len(f)]
        if not frames:
            return _empty_verified_pairs("ham")[["a", "b", "ham"]]
        return pd.concat(frames, ignore_index=True) \
            .drop_duplicates(subset=["a", "b"])

    pairs_raw = (
        hashed.map_batches(to_bands, batch_format="pandas")
        .groupby("_pb")
        .map_groups(partition_pairs, batch_format="pandas")
    )
    pairs_ds = _dedup_pairs_ds(pairs_raw).materialize()
    clusters_ds = components_auto_ds(pairs_ds, driver_edge_cap=driver_edge_cap)
    return clusters_ds, pairs_ds


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def embedding_cluster_exact(ds, vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            threshold: float = 0.95,
                            ndigits: int = 6,
                            driver_edge_cap: int = DRIVER_EDGE_CAP):
    """EXACT cosine clustering — the brute-force sibling of
    ``embedding_dedup`` (whose LSH bucketing trades recall for scale):
    every pair is scored, so nothing above the threshold is missed.
    The candidate matrix is the broadcast trick the ANN baseline uses —
    one ``ray.put`` of the normalized matrix, each block matmuls
    against it — O(n²) scores but O(n·dim) broadcast bytes and O(n/b)
    tasks; right for bounded slices (dedup audits, eval-set curation),
    not a 10^9-vector corpus. Scores round to ``ndigits`` BEFORE the
    threshold compare (the ANN-family oracle discipline), clusters are
    min-id connected components.

    Returns ``(clusters_ds, pairs_ds)`` like the other families."""
    import ray

    def to_blocks(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # empty blocks: np.stack needs >= 1 array
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "_v": pd.Series(dtype="object")})
        return pd.DataFrame({
            id_col: df[id_col].astype("int64"),
            "_v": list(np.stack(df[vec_col].to_numpy())
                       .astype(np.float64))})

    blocks = ds.map_batches(to_blocks,
                            batch_format="pandas").materialize()
    all_rows = blocks.to_pandas()  # bounded-slice operator by contract
    if not len(all_rows):
        import ray.data as rd

        empty_pairs = rd.from_pandas(pd.DataFrame({
            "a": pd.Series(dtype="int64"),
            "b": pd.Series(dtype="int64"),
            "truncated": pd.Series(dtype="bool"),
            "cos": pd.Series(dtype="float64")})).materialize()
        return components_auto_ds(empty_pairs,
                                  driver_edge_cap=driver_edge_cap), \
            empty_pairs
    ids_all = all_rows[id_col].to_numpy()
    m = np.stack(all_rows["_v"].to_numpy())
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    order = np.argsort(ids_all, kind="stable")
    ids_all, m = ids_all[order], m[order]
    mref = ray.put((ids_all, m))

    def score_block(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "truncated": pd.Series(dtype="bool"),
                "cos": pd.Series(dtype="float64")})
        ids_b = df[id_col].to_numpy()
        vb = np.stack(df["_v"].to_numpy())
        vb /= np.maximum(np.linalg.norm(vb, axis=1, keepdims=True),
                         1e-12)
        ga, gm = ray.get(mref)
        cs = np.round(vb @ gm.T, ndigits)
        bi, gj = np.nonzero(cs >= threshold)
        a, b = ids_b[bi], ga[gj]
        keep = a < b  # upper triangle once, no self-pairs
        return pd.DataFrame({
            "a": a[keep].astype(np.int64),
            "b": b[keep].astype(np.int64),
            "truncated": np.zeros(int(keep.sum()), dtype=bool),
            "cos": cs[bi, gj][keep]})

    pairs_ds = blocks.map_batches(score_block, batch_format="pandas") \
        .materialize()
    clusters_ds = components_auto_ds(pairs_ds,
                                     driver_edge_cap=driver_edge_cap)
    return clusters_ds, pairs_ds


def embedding_dedup(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                    threshold: float = 0.95, num_planes: int = 16,
                    seed: int = 777, num_partitions: int = 32,
                    driver_edge_cap: int = DRIVER_EDGE_CAP):
    """Near-dup by embedding cosine: random-hyperplane LSH buckets →
    exact cosine verify within bucket → distributed connected-components.

    The normalized vectors necessarily ride the bucket shuffle (they ARE
    the verifier data), but as a zero-copy Arrow ``list<float32>`` column
    — not pandas object rows — and grouped on a coarse ``_pb`` partition
    key. Pairs never gather on the driver; clusters come from
    ``components_auto_ds``. Returns ``(clusters_ds, pairs_ds)``
    Datasets; apply with ``dedup_apply``."""
    import pyarrow.compute as pc

    # dimension probe from one row (metadata-cheap)
    first = ds.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes)).astype(np.float32)

    def bucketize(batch: pa.Table) -> pa.Table:
        m = np.stack(batch[vec_col].combine_chunks().to_numpy(
            zero_copy_only=False)).astype(np.float32)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        bits = (mn @ planes) > 0
        bucket = np.zeros(len(m), dtype=np.int64)
        for i in range(num_planes):
            bucket = bucket * 2 + bits[:, i]
        return pa.table({
            "id": batch[id_col].cast(pa.int64()),
            "bucket": pa.array(bucket, type=pa.int64()),
            "_pb": pa.array(bucket % num_partitions, type=pa.int32()),
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(mn.reshape(-1), type=pa.float32()), dim),
        })

    def bucket_pairs(ids, m):
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame({"a": ids[ia][keep].astype(np.int64),
                             "b": ids[ib][keep].astype(np.int64),
                             "cos": np.round(sims[ia, ib][keep], 6)
                             .astype(np.float64)})

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("bucket")["id"].transform("size")
        multi = g[sizes > 1]
        frames = []
        for _, grp in multi.groupby("bucket", sort=False):
            grp = grp.sort_values("id")
            frames.append(bucket_pairs(
                grp["id"].to_numpy(),
                np.stack(grp["vec"].to_numpy()).astype(np.float32)))
        frames = [f for f in frames if len(f)]
        if not frames:
            return _empty_verified_pairs("cos")[["a", "b", "cos"]]
        return pd.concat(frames, ignore_index=True)

    pairs_raw = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(partition_pairs, batch_format="pandas")
    )
    pairs_ds = _dedup_pairs_ds(pairs_raw).materialize()
    clusters_ds = components_auto_ds(pairs_ds, driver_edge_cap=driver_edge_cap)
    return clusters_ds, pairs_ds


# --- benchmark decontamination ----------------------------------------------

def _token_window_rows(texts, n: int, sep: str = " "):
    """All positional token n-gram windows for a batch of documents.
    Returns ``(row_idx, pos, hashes)`` — one entry per window POSITION
    (not distinct windows); ``pos`` is the 0-based token index of the
    window start within its document. Tokenization is the literal
    single-separator split the rest of the text family uses (SQL
    ``string_split`` parity).

    Vectorized end-to-end: polars split+explode (Rust), one
    ``hash_pandas_object`` over every token (SipHash, fixed key —
    stable across processes), then a numpy rolling polynomial combine
    with row-boundary masking. No per-document Python loop."""
    import pandas as pd
    import polars as pl

    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
             np.empty(0, dtype=np.uint64))
    s = pl.Series("t", pd.Series(texts).fillna("").astype(str).tolist())
    ex = pl.DataFrame({"i": pl.int_range(len(s), eager=True),
                       "w": s.str.split(sep)}).explode("w")
    rows = ex["i"].to_numpy()
    if len(rows) < n:
        return empty
    th = pd.util.hash_pandas_object(
        ex["w"].to_pandas(), index=False).to_numpy().astype(np.uint64)
    m = len(th) - n + 1
    with np.errstate(over="ignore"):
        h = np.zeros(m, dtype=np.uint64)
        for j in range(n):                      # n (~5) shifted adds, not
            h = h * _SHINGLE_BASE + th[j:m + j]  # a per-ngram loop
        h = (h ^ (h >> np.uint64(33))) * _MIX
    valid = rows[:m] == rows[n - 1:]            # n-gram stays in one doc
    # window start's 0-based token index within its own document
    doc_off = np.concatenate(
        [[0], np.cumsum(np.bincount(rows, minlength=len(s)))[:-1]])
    starts = np.arange(m, dtype=np.int64)
    pos = starts - doc_off[rows[:m]]
    return rows[:m][valid], pos[valid], h[valid]


def _token_ngram_hashes(texts, n: int):
    """(row_idx, hashes) per positional token n-gram — see
    ``_token_window_rows`` (position-free view, kept for
    ``decontaminate``)."""
    rows, _, h = _token_window_rows(texts, n)
    return rows, h


def remove_duplicate_spans(ds, col: str = "text", id_col: str = "doc_id",
                           window: int = 20, sep: str = " ",
                           out: str = "text_dedup",
                           num_partitions: int = 32):
    """ExactSubstr-style duplicate-span removal — the Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499) dedup step, in its hashed-seed distributed form:
    every positional ``window``-token sequence that occurs ≥2 times in
    the WHOLE corpus is removed from every occurrence except the first
    (ordered by ``(doc, pos)``); a document's kept tokens are re-joined
    with ``sep``. Documents shorter than ``window`` tokens are never
    modified; a document whose every token is covered yields null (SQL
    ``string_agg``-under-left-join semantics, same as ``dedup_lines``).

    Unlike the paper's suffix array this seeds on FIXED-width windows,
    so a duplicated run of length ``window + j`` removes the whole run
    (all j+1 windows inside it are duplicated, and coverage is their
    union) — removal granularity is the window, not the byte.

    Shape (two shuffles, both O(corpus tokens) — a combiner cannot
    help here because duplication is a cross-block property):

    1. ``map_batches`` → (window_hash, doc, pos) rows, vectorized by
       ``_token_window_rows``.
    2. hash-bucket by window_hash: all occurrences of one window
       co-locate; per bucket a vectorized sort + keep-first marks every
       non-first occurrence as a removal (doc, pos).
    3. removals + documents co-shuffle on a doc bucket; per bucket one
       polars explode + composite ``searchsorted`` coverage test (all
       removal intervals share width ``window``, so "latest start ≤
       token index" decides coverage without interval merging) and an
       ordered group-join rebuild.

    Window equality is 64-bit-hash equality (collision odds ~
    occurrences²/2⁶⁵ — the same documented bound as ``decontaminate``);
    the SQL oracle compares true window strings.
    """
    L = int(window)

    def win_rows(df: pd.DataFrame) -> pd.DataFrame:
        rows, pos, h = _token_window_rows(df[col], L, sep=sep)
        return pd.DataFrame({
            "h": h,
            "doc": df[id_col].to_numpy()[rows].astype("int64"),
            "pos": pos,
            "_hb": (h % np.uint64(num_partitions)).astype(np.int32),
        })

    def removals(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc", "pos"], kind="stable")
        sizes = g.groupby("h")["h"].transform("size").to_numpy()
        dup = g[sizes >= 2]
        rem = dup[dup.duplicated(subset=["h"], keep="first")]
        return rem[["doc", "pos"]].reset_index(drop=True)

    rem_ds = (ds.map_batches(win_rows, batch_format="pandas")
              .groupby("_hb").map_groups(removals, batch_format="pandas"))

    side_schema = pa.schema([("doc", pa.int64()), ("pos", pa.int64()),
                             ("txt", pa.string()), ("side", pa.int8()),
                             ("_db", pa.int32())])

    def tag_docs(t: pa.Table) -> pa.Table:
        doc = t[id_col].cast(pa.int64())
        cols = {"doc": doc, "pos": pa.nulls(t.num_rows, pa.int64()),
                "txt": t[col].cast(pa.string()),
                "side": pa.array([0] * t.num_rows, pa.int8())}
        bk = stable_bucket(doc, num_partitions)
        return pa.table({**cols, "_db": pa.array(bk, type=pa.int32())},
                        schema=side_schema)

    def tag_rem(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc" not in t.column_names:
            return side_schema.empty_table()
        doc = t["doc"].cast(pa.int64())
        cols = {"doc": doc, "pos": t["pos"].cast(pa.int64()),
                "txt": pa.nulls(t.num_rows, pa.string()),
                "side": pa.array([1] * t.num_rows, pa.int8())}
        bk = stable_bucket(doc, num_partitions)
        return pa.table({**cols, "_db": pa.array(bk, type=pa.int32())},
                        schema=side_schema)

    dkey = np.dtype([("d", "<i8"), ("p", "<i8")])

    def apply_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        docs = g[g["side"] == 0]
        if not len(docs):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 out: pd.Series(dtype="object")})
        rem = g[g["side"] == 1]
        ex = pl.DataFrame({
            "doc": pl.Series(docs["doc"].to_numpy()),
            "w": pl.Series(docs["txt"].fillna("").astype(str).tolist())
            .str.split(sep),
        }).explode("w")
        tok_doc = ex["doc"].to_numpy()
        # per-doc 0-based token index: explode preserves row order, so
        # a grouped cumulative count gives the position directly
        tok_pos = (pl.DataFrame({"doc": ex["doc"]})
                   .with_columns(pl.col("doc").cum_count().over("doc")
                                 .alias("c"))["c"].to_numpy()
                   .astype(np.int64) - 1)
        covered = np.zeros(len(ex), dtype=bool)
        if len(rem):
            rr = rem.sort_values(["doc", "pos"])
            kr = np.empty(len(rr), dtype=dkey)
            kr["d"] = rr["doc"].to_numpy()
            kr["p"] = rr["pos"].to_numpy()
            kt = np.empty(len(ex), dtype=dkey)
            kt["d"] = tok_doc
            kt["p"] = tok_pos
            idx = np.searchsorted(kr, kt, side="right") - 1
            ok = idx >= 0
            covered[ok] = (kr["d"][idx[ok]] == tok_doc[ok]) & \
                (tok_pos[ok] - kr["p"][idx[ok]] < L)
        kept = pl.DataFrame({"doc": ex["doc"], "w": ex["w"],
                             "cov": pl.Series(covered)}) \
            .filter(~pl.col("cov")) \
            .group_by("doc", maintain_order=True) \
            .agg(pl.col("w").str.join(sep).alias(out)) \
            .to_pandas()
        spine = pd.DataFrame({"doc": docs["doc"].to_numpy()})
        res = spine.merge(kept, on="doc", how="left")
        res = res.rename(columns={"doc": id_col})
        return res[[id_col, out]]

    tagged = (ds.map_batches(tag_docs, batch_format="pyarrow")
              .union(rem_ds.map_batches(tag_rem, batch_format="pyarrow")))
    return tagged.groupby("_db").map_groups(apply_bucket,
                                            batch_format="pandas")


def _bench_ngram_hashes(bench, col: str, n: int) -> np.ndarray:
    """Sorted distinct n-gram hashes of the benchmark set, built
    distributed (map_batches → per-block dedup → global distinct) and
    small enough to broadcast: bounded by the BENCHMARK's size (eval
    sets are MBs; a 10^6-n-gram benchmark is an 8 MB uint64 array)."""
    from chomper_ray.pipelines.relational import distinct

    def bench_hashes(t: pa.Table) -> pa.Table:
        _, h = _token_ngram_hashes(t[col].to_pandas(), n)
        return pa.table({"h": pa.array(np.unique(h), type=pa.uint64())})

    bench_distinct = distinct(
        bench.map_batches(bench_hashes, batch_format="pyarrow"),
        ["h"], num_partitions=8)
    return np.sort(np.concatenate(
        [b["h"].to_numpy(zero_copy_only=False)
         for b in bench_distinct.iter_batches(batch_format="pyarrow")]
        or [np.empty(0, dtype=np.uint64)]))


def decontamination_gate(bench, col: str = "text", n: int = 5):
    """Ingest-time benchmark decontamination: a pyarrow-batch callable
    for ``run_cdc(epoch_transform=lambda e: gate)`` that DROPS events
    whose ``col`` shares any token n-gram with the benchmark set —
    eval-set leakage is rejected at the lake door instead of scrubbed
    later. The filter is stateless per event (the benchmark is fixed),
    so unlike the near-dup admission gate its effect is exactly
    SQL-replayable: LWW over the surviving events (a contaminated
    UPDATE leaves the older clean version live; deletes carry no text
    → never contaminated → always apply).

    The benchmark's distinct n-gram hashes are built once, broadcast
    via ``ray.put`` and probed with vectorized ``searchsorted`` inside
    every extraction task — no shuffle, no per-epoch rebuild.

    Reference ancestry: composes the hash-verified ``decontaminate``
    kernel (this file) with the ``epoch_transform`` ingest hook
    (pipelines/cdc.py), the same pattern as dedup-at-ingest
    (state/dupindex.run_cdc_admitted)."""
    import ray

    hs = _bench_ngram_hashes(bench, col, n)
    ref = ray.put(hs)

    def gate(batch: pa.Table, ref=ref) -> pa.Table:
        if col not in batch.schema.names or batch.num_rows == 0:
            return batch
        bench_h = ray.get(ref)
        if not len(bench_h):
            return batch
        rows, h = _token_ngram_hashes(batch[col].to_pandas(), n)
        hit = np.zeros(batch.num_rows, dtype=bool)
        if len(h):
            idx = np.searchsorted(bench_h, h)
            idx[idx == len(bench_h)] = 0
            m = bench_h[idx] == h
            hit[np.unique(rows[m])] = True
        return batch.filter(pa.array(~hit))

    return gate


def decontaminate(ds, bench, col: str = "text", id_col: str = "doc_id",
                  n: int = 5, out: str = "contaminated",
                  drop: bool = False):
    """Benchmark decontamination: flag (or drop) corpus documents that
    contain ANY token n-gram appearing in the benchmark set ``bench``
    (a Dataset with the same text column) — the standard guard against
    eval-set leakage into training data.

    Shape: the benchmark's distinct n-gram hashes are built
    DISTRIBUTED (map_batches → per-block dedup → global distinct), then
    broadcast once via ``ray.put`` and probed with a vectorized
    ``np.isin`` inside every corpus task — corpus rows never shuffle.
    The broadcast is bounded by the BENCHMARK's size (eval sets are
    MBs; a 10^6-n-gram benchmark is an 8 MB uint64 array), never the
    corpus's. Equality is positional-token-sequence equality — exactly
    SQL's ``array_has_any`` over ``array_to_string(l[i:i+n-1], ' ')``
    lists; hash collisions (~#ngrams² / 2^64) are the only divergence.
    """
    import ray

    ref = ray.put(_bench_ngram_hashes(bench, col, n))

    def flag(batch: pd.DataFrame, ref=ref) -> pd.DataFrame:
        bench_h = ray.get(ref)
        rows, h = _token_ngram_hashes(batch[col], n)
        hit = np.zeros(len(batch), dtype=bool)
        if len(h) and len(bench_h):
            idx = np.searchsorted(bench_h, h)
            idx[idx == len(bench_h)] = 0
            m = bench_h[idx] == h
            hit[np.unique(rows[m])] = True
        if drop:
            return batch[~hit]
        batch[out] = hit.astype("int64")
        return batch

    return ds.map_batches(flag, batch_format="pandas")

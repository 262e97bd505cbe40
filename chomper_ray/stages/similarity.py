"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE
via ``ray.put`` and read inside each ``map_batches`` task (never re-shipped
per batch); each batch computes a numpy matmul and emits only its local
top-k per query, so the shuffle/reduce sees ``num_blocks × k`` candidate
rows per query, never the corpus.

Scale path: IVF — a kmeans-lite codebook trained on a sample partitions
the corpus by nearest centroid; queries probe only ``nprobe`` cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _final_topk_ds(scored, k: int, id_col: str, score_col: str):
    """Final top-k reduce over per-block candidates.

    Each block already emitted ≤ k rows per query, so the candidate set
    is bounded by blocks × k × nq — and nq is bounded by the caller's
    in-memory query matrix by construction. That makes this the
    sanctioned bounded driver-collect shape (same as relational.topk):
    one ``to_pandas`` of the candidates, one vectorized sort, instead
    of a ``groupby(query_id)`` shuffle — which, with a handful of
    query ids spread over many post-shuffle partitions, made Ray's
    map_groups emit schema-less empty blocks (the `names=[]` bench
    warnings). Ties break by ascending id. Returns a single typed
    block."""
    import pyarrow as pa
    import ray.data as rd

    cand = scored.to_pandas()
    cand = cand.sort_values(["query_id", score_col, id_col],
                            ascending=[True, False, True], kind="stable")
    out = cand.groupby("query_id", sort=False).head(k) \
        .reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


class _TopKScorer:
    """Actor-pool stage: per-batch brute-force scores → local top-k rows.

    The query matrix arrives as an object-store ref resolved once in
    ``__init__`` (per actor), not per batch.
    """

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str,
                 dtype=np.float32):
        import ray

        q = ray.get(queries_ref)
        self.dtype = dtype
        self.q = _normalize(np.asarray(q, dtype=dtype))  # (nq, d)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(np.stack(batch[self.vec_col].to_numpy()).astype(self.dtype))
        sims = m @ self.q.T  # (n, nq)
        n, nq = sims.shape
        k = min(self.k, n)
        idx = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, nq)
        ids = batch[self.id_col].to_numpy()
        out = {
            "query_id": np.repeat(np.arange(nq, dtype=np.int64), k),
            self.id_col: ids[idx.T.ravel()],
            "cos": np.round(sims[idx.T.ravel(), np.repeat(np.arange(nq), k)], 6),
        }
        return pd.DataFrame(out)


def ann_topk(ds, queries: np.ndarray, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             concurrency=None, dtype=np.float32):
    """Brute-force cosine top-k for each query row in ``queries``.

    Returns a Dataset of (query_id, id_col, cos) — exactly k rows per
    query, ties broken by ascending id (deterministic, SQL-oracle
    friendly). ``dtype=np.float64`` for oracle-precision parity.

    Default is a TASK pool: the broadcast query matrix lives in the
    object store once (``ray.put``) and ``ray.get`` inside a task is a
    zero-copy shared-memory read, so actor pinning buys nothing until
    the per-actor state is expensive (a loaded index, a model) — pass
    ``concurrency`` to force the actor-pool shape then.
    """
    import ray

    qref = ray.put(np.asarray(queries, dtype=dtype))

    ctor = dict(queries_ref=qref, k=k, vec_col=vec_col, id_col=id_col,
                dtype=dtype)
    if concurrency:
        scored = ds.map_batches(_TopKScorer, batch_format="pandas",
                                concurrency=concurrency,
                                fn_constructor_kwargs=ctor)
    else:
        scored = ds.map_batches(_TopKScorer(**ctor), batch_format="pandas")
    return _final_topk_ds(scored, k, id_col, "cos")


# --------------------------------------------------------------------------
# IVF (scale path)
# --------------------------------------------------------------------------

def train_ivf_centroids(sample: np.ndarray, n_cells: int, iters: int = 10,
                        seed: int = 5) -> np.ndarray:
    """kmeans-lite on a driver-side sample (the sample is small; the
    ASSIGNMENT runs distributed)."""
    rng = np.random.default_rng(seed)
    x = _normalize(sample.astype(np.float32))
    cent = x[rng.choice(len(x), min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_assign(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Add an ``ivf_cell`` column (nearest centroid) — the partitioning
    key for cell-pruned search. Arrow in/out: the embedding column is
    never round-tripped through pandas object cells, so the written
    layout keeps a plain ``list<float>`` type (a pandas hop would let
    Ray's tensor extension leak into the parquet metadata, which plain
    readers then can't map back to a pandas dtype)."""
    import pyarrow as pa
    import ray

    cref = ray.put(_normalize(centroids.astype(np.float32)))

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cref)
        col = batch[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        m = col.flatten().to_numpy(zero_copy_only=False) \
            .reshape(len(col), -1)
        m = _normalize(np.ascontiguousarray(m, dtype=np.float32))
        cells = (m @ cent.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(cells))

    return ds.map_batches(assign, batch_format="pyarrow")


def ivf_build_index(ds, centroids: np.ndarray, root: str,
                    vec_col: str = "embedding"):
    """Materialize an IVF index as a CELL-PARTITIONED parquet layout:
    ``root/ivf_cell=N/…`` — the real scale path the ``ivf_topk`` filter
    stands in for. Search then READS ONLY the probed cells' files
    (partition pruning at the storage layer), instead of scanning the
    corpus and filtering. Centroids are stored alongside
    (``root/_centroids.npy``) so an index is self-describing."""
    assigned = ivf_assign(ds, centroids, vec_col=vec_col)
    assigned.write_parquet(root, partition_cols=["ivf_cell"])
    np.save(f"{root.rstrip('/')}/_centroids.npy",
            _normalize(centroids.astype(np.float32)))
    return root


def ivf_search(root: str, queries: np.ndarray, k: int = 10,
               nprobe: int = 4, vec_col: str = "embedding",
               id_col: str = "vec_id"):
    """ANN top-k over a built IVF index: read ONLY the ``nprobe`` nearest
    cells' partition directories (storage-level pruning — at 10^9 vectors
    and nprobe/ncells = 4/1024 this touches 0.4 % of the corpus bytes),
    then brute-force the survivors with the broadcast query matrix."""
    import glob

    import ray.data as rd

    cent = np.load(f"{root.rstrip('/')}/_centroids.npy")
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    cells = np.unique(probe)
    files = [f for c in cells
             for f in glob.glob(f"{root.rstrip('/')}/ivf_cell={c}/*.parquet")]
    ds = rd.read_parquet(files)
    return ann_topk(ds, queries, k=k, vec_col=vec_col, id_col=id_col)


def ivf_topk(ds_assigned, centroids: np.ndarray, queries: np.ndarray,
             k: int = 10, nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id", concurrency=None):
    """ANN top-k probing only the ``nprobe`` nearest cells per query.

    Filters the assigned corpus to the probed cell union (a vectorized
    ``isin`` inside ``map_batches`` — at lake scale this becomes partition
    pruning on an ``ivf_cell``-partitioned layout), then brute-forces the
    survivors.
    """
    cent = _normalize(centroids.astype(np.float32))
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    cells = np.unique(probe)

    filtered = ds_assigned.map_batches(
        lambda df: df[df["ivf_cell"].isin(cells)], batch_format="pandas")
    return ann_topk(filtered, queries, k=k, vec_col=vec_col, id_col=id_col,
                    concurrency=concurrency)


# --- distributed PCA ---------------------------------------------------------

def pca_fit(ds, n_components: int, vec_col: str = "embedding",
            dtype=np.float64):
    """Fit PCA over an embedding column in ONE streaming pass: each
    block emits its ``(n, Σx, ΣxxT)`` moment partial (a d-vector and a
    d×d matrix — size depends on the DIMENSION, never on rows), a
    distributed fold level collapses the per-block partials to ≤8 rows
    (so the driver never holds #blocks × d² floats), then the driver
    eigendecomposes the d×d covariance. Returns
    ``(mean, components)`` with components rows = top eigenvectors.
    Signs are fixed deterministically (largest-|coef| positive) so
    refits and the numpy oracle agree bit-for-bit."""

    def moments(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch[vec_col].to_numpy()).astype(dtype)
        return pd.DataFrame({
            "n": [len(m)],
            "sx": [m.sum(axis=0)],
            "sxx": [(m.T @ m).ravel()],
        })

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n": [int(batch["n"].sum())],
            "sx": [np.sum(np.stack(batch["sx"].to_numpy()), axis=0)],
            "sxx": [np.sum(np.stack(batch["sxx"].to_numpy()), axis=0)],
        })

    parts = ds.map_batches(moments, batch_format="pandas") \
        .repartition(8).map_batches(fold, batch_format="pandas") \
        .take_all()
    n = sum(p["n"] for p in parts)
    sx = np.sum([p["sx"] for p in parts], axis=0)
    sxx = np.sum([p["sxx"] for p in parts], axis=0)
    d = len(sx)
    mean = sx / n
    cov = sxx.reshape(d, d) / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)            # ascending eigenvalues
    comps = v[:, ::-1][:, :n_components].T  # (k, d)
    # deterministic sign: the largest-|coefficient| entry is positive
    flip = comps[np.arange(len(comps)),
                 np.abs(comps).argmax(axis=1)] < 0
    comps[flip] *= -1
    return mean, comps


def pca_transform(ds, mean: np.ndarray, components: np.ndarray,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  ndigits: int = 6):
    """Project the embedding column onto fitted components — the
    ``(mean, components)`` pair is broadcast ONCE via ``ray.put`` and
    one matmul runs per batch. Output: ``id_col, pc_0..pc_{k-1}``."""
    import ray

    ref = ray.put((np.asarray(mean), np.asarray(components)))
    k = len(components)

    def project(batch: pd.DataFrame, ref=ref) -> pd.DataFrame:
        mu, comps = ray.get(ref)
        m = np.stack(batch[vec_col].to_numpy()).astype(mu.dtype)
        proj = (m - mu) @ comps.T
        out = {id_col: batch[id_col].to_numpy()}
        for i in range(k):
            out[f"pc_{i}"] = np.round(proj[:, i], ndigits)
        return pd.DataFrame(out)

    return ds.map_batches(project, batch_format="pandas")


# --- distributed k-means (full-data Lloyd) -----------------------------------

def kmeans_fit(ds, k: int, iters: int = 10, vec_col: str = "embedding",
               seed: int = 5, init_sample: int = 4096,
               dtype=np.float64):
    """Lloyd's k-means over the FULL dataset (not a sample): each
    iteration is ONE streaming pass — every block assigns its vectors
    to the nearest centroid (one matmul) and emits per-cluster
    ``(count, Σx)`` partials; a distributed fold collapses them to ≤8
    rows and the driver recomputes the k×d centroid matrix (tiny).
    Empty clusters keep their previous centroid. Initialization is a
    deterministic-seed choice from a bounded head sample. Pass a
    MATERIALIZED ``ds`` — each iteration re-consumes it.

    Where ``train_ivf_centroids`` trains on a driver sample (fine for
    IVF routing), this is the exact estimator a 100 TB corpus needs:
    per-pass driver traffic is 8 × k × d floats, independent of rows."""
    import ray

    head = ds.limit(init_sample).take_all()
    x0 = np.stack([r[vec_col] for r in head]).astype(dtype)
    rng = np.random.default_rng(seed)
    cent = x0[rng.choice(len(x0), min(k, len(x0)), replace=False)].copy()

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("c", sort=False)
        return pd.DataFrame({
            "c": np.fromiter(g.groups, dtype=np.int64),
            "n": g["n"].sum().to_numpy(),
            "sx": [np.sum(np.stack(v["sx"].to_numpy()), axis=0)
                   for _, v in g],
        })

    for _ in range(iters):
        cref = ray.put(cent)

        def partials(batch: pd.DataFrame, cref=cref) -> pd.DataFrame:
            c = ray.get(cref)
            m = np.stack(batch[vec_col].to_numpy()).astype(c.dtype)
            # argmin ||x-c||^2 == argmax 2x·c - |c|^2
            a = (2 * m @ c.T - (c * c).sum(axis=1)).argmax(axis=1)
            out = []
            for ci in np.unique(a):
                mem = m[a == ci]
                out.append({"c": int(ci), "n": len(mem),
                            "sx": mem.sum(axis=0)})
            return pd.DataFrame(out)

        rows = ds.map_batches(partials, batch_format="pandas") \
            .repartition(8).map_batches(fold, batch_format="pandas") \
            .take_all()
        agg: dict[int, tuple[int, np.ndarray]] = {}
        for r in rows:
            n0, s0 = agg.get(int(r["c"]), (0, 0.0))
            agg[int(r["c"])] = (n0 + int(r["n"]), s0 + r["sx"])
        new = cent.copy()
        for ci, (n, s) in agg.items():
            new[ci] = s / n
        cent = new
    return cent


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding",
                  id_col: str = "vec_id", out: str = "cluster"):
    """Nearest-centroid assignment (euclidean) — centroids broadcast
    once, one matmul per batch."""
    import ray

    cref = ray.put(np.asarray(centroids))

    def assign(batch: pd.DataFrame, cref=cref) -> pd.DataFrame:
        c = ray.get(cref)
        m = np.stack(batch[vec_col].to_numpy()).astype(c.dtype)
        a = (2 * m @ c.T - (c * c).sum(axis=1)).argmax(axis=1)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             out: a.astype("int64")})

    return ds.map_batches(assign, batch_format="pandas")


# --------------------------------------------------------------------------
# Product Quantization (compressed-vector scale path)
# --------------------------------------------------------------------------

def pq_fit(sample: np.ndarray, m_subs: int = 8, k_codes: int = 32,
           iters: int = 12, seed: int = 11,
           normalize: bool = True) -> dict:
    """Train PQ codebooks (Jégou et al. 2011, "Product Quantization for
    Nearest Neighbor Search") on a driver-side sample — same convention
    as ``train_ivf_centroids``: training data is a bounded sample, the
    ENCODE and SEARCH passes run distributed.

    Vectors are L2-normalized first (so inner product == cosine), then
    split into ``m_subs`` contiguous subspaces; each gets a ``k_codes``-
    centroid kmeans codebook. Memory per encoded vector: ``m_subs``
    uint8 codes instead of ``d`` float32 — a 64-dim float32 embedding
    compresses 32× at m_subs=8. ``normalize=False`` fits RAW vectors —
    the residual-quantization mode ``ivfpq_fit`` uses (residuals must
    not be re-normalized)."""
    x = np.asarray(sample, dtype=np.float32)
    if normalize:
        x = _normalize(x)
    n, d = x.shape
    if d % m_subs:
        raise ValueError(f"dim {d} not divisible by m_subs {m_subs}")
    sub = d // m_subs
    rng = np.random.default_rng(seed)
    books = np.empty((m_subs, k_codes, sub), dtype=np.float32)
    for mi in range(m_subs):
        xs = x[:, mi * sub:(mi + 1) * sub]
        cent = xs[rng.choice(n, min(k_codes, n), replace=False)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[mi, :len(cent)] = cent
        if len(cent) < k_codes:  # degenerate tiny sample: repeat last
            books[mi, len(cent):] = cent[-1]
    return {"books": books, "m_subs": m_subs, "k_codes": k_codes,
            "sub": sub, "dim": d}


def pq_encode(ds, model: dict, vec_col: str = "embedding",
              out: str = "pq_code"):
    """Encode every vector to its ``m_subs`` uint8 nearest-centroid
    codes — one broadcast of the codebooks, vectorized argmin per
    subspace per batch. The encoded Dataset is what a 100 TB corpus
    would persist (32× smaller than raw float32)."""
    import ray

    ref = ray.put(model)

    def enc(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        x = _normalize(np.stack(batch[vec_col].to_numpy())
                       .astype(np.float32))
        books, sub = m["books"], m["sub"]
        codes = np.empty((len(x), m["m_subs"]), dtype=np.uint8)
        for mi in range(m["m_subs"]):
            xs = x[:, mi * sub:(mi + 1) * sub]
            # ||x-c||² = ||x||² - 2x·c + ||c||²: argmin via one matmul
            d2 = (-2.0 * (xs @ books[mi].T)
                  + (books[mi] ** 2).sum(axis=1)[None, :])
            codes[:, mi] = d2.argmin(axis=1).astype(np.uint8)
        out_df = batch.drop(columns=[vec_col])
        out_df[out] = list(codes)
        return out_df

    return ds.map_batches(enc, batch_format="pandas")


class _PQScorer:
    """Task/actor stage: asymmetric-distance (ADC) top-k per batch.
    Per query, ONE (m_subs × k_codes) lookup table of query-subvector ·
    centroid inner products; scoring a vector is m_subs table gathers +
    a sum — no float decode of the corpus ever happens."""

    def __init__(self, model_ref, queries_ref, k: int, code_col: str,
                 id_col: str):
        import ray

        m = ray.get(model_ref)
        q = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float32))
        self.k = k
        self.code_col = code_col
        self.id_col = id_col
        sub = m["sub"]
        # luts: (nq, m_subs, k_codes) inner products
        self.luts = np.stack([
            q[:, mi * sub:(mi + 1) * sub] @ m["books"][mi].T
            for mi in range(m["m_subs"])], axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        codes = np.stack(batch[self.code_col].to_numpy())  # (n, m_subs)
        n, ms = codes.shape
        nq = self.luts.shape[0]
        # gather per subspace, sum: (nq, n)
        sims = np.zeros((nq, n), dtype=np.float32)
        for mi in range(ms):
            sims += self.luts[:, mi, codes[:, mi]]
        k = min(self.k, n)
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]  # (nq, k)
        ids = batch[self.id_col].to_numpy()
        qi = np.repeat(np.arange(nq, dtype=np.int64), k)
        return pd.DataFrame({
            "query_id": qi,
            self.id_col: ids[idx.ravel()],
            "score": np.round(sims[np.repeat(np.arange(nq), k),
                                   idx.ravel()], 6),
        })


def pq_topk(ds_encoded, model: dict, queries: np.ndarray, k: int = 10,
            code_col: str = "pq_code", id_col: str = "vec_id",
            concurrency=None):
    """ADC top-k over a PQ-encoded Dataset: local per-block top-k →
    one small shuffle of ≤ blocks×k candidate rows per query — the
    same bounded-reduce shape as ``ann_topk``, at 1/32 the scan bytes."""
    import ray

    mref = ray.put(model)
    qref = ray.put(np.asarray(queries, dtype=np.float32))

    ctor = dict(model_ref=mref, queries_ref=qref, k=k,
                code_col=code_col, id_col=id_col)
    if concurrency:
        scored = ds_encoded.map_batches(_PQScorer, batch_format="pandas",
                                        concurrency=concurrency,
                                        fn_constructor_kwargs=ctor)
    else:
        scored = ds_encoded.map_batches(_PQScorer(**ctor),
                                        batch_format="pandas")
    return _final_topk_ds(scored, k, id_col, "score")


def vector_features(ds, query: "np.ndarray", vec_col: str = "embedding",
                    id_col: str = "vec_id", ndigits: int = 6):
    """Per-row vector features against ONE broadcast query vector: L2
    norm, dot product, cosine — the map-only embedding-column kernel
    (similarity filtering, norm sanity checks) with exact SQL parity
    via DuckDB ``list_dot_product`` / ``list_cosine_similarity``.
    Math in float64 on both sides; rounded at ``ndigits``."""
    import ray

    qref = ray.put(np.asarray(query, dtype=np.float64))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)
        m = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        dot = m @ q
        nrm = np.sqrt((m * m).sum(axis=1))
        qn = float(np.sqrt((q * q).sum()))
        denom = nrm * qn
        cos = np.divide(dot, denom, out=np.zeros_like(dot),
                        where=denom > 0)
        return pd.DataFrame({
            id_col: batch[id_col].astype("int64"),
            "norm": np.round(nrm, ndigits),
            "dot": np.round(dot, ndigits),
            "cos": np.round(cos, ndigits),
        })

    return ds.map_batches(f, batch_format="pandas")


# --------------------------------------------------------------------------
# IVF-PQ (FAISS IndexIVFPQ shape): cell-pruned storage + residual codes
# --------------------------------------------------------------------------

def ivfpq_fit(sample: np.ndarray, n_cells: int = 16, m_subs: int = 8,
              k_codes: int = 32, iters: int = 12, seed: int = 17) -> dict:
    """Fit the two-level quantizer on a driver-side sample: a coarse
    IVF codebook, then PQ codebooks on the RESIDUALS (x − centroid) —
    residual quantization is what makes IVF-PQ beat flat PQ: residual
    magnitudes are a fraction of the vectors', so the same code budget
    buys finer resolution."""
    x = _normalize(np.asarray(sample, dtype=np.float32))
    cent = train_ivf_centroids(x, n_cells, iters=iters, seed=seed)
    assign = (x @ cent.T).argmax(axis=1)
    resid = x - cent[assign]
    pq = pq_fit(resid, m_subs=m_subs, k_codes=k_codes, iters=iters,
                seed=seed + 1, normalize=False)
    return {"centroids": cent, "pq": pq}


def ivfpq_build_index(ds, model: dict, root: str,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id"):
    """Encode the corpus to (id, cell, residual PQ code) and write it
    CELL-PARTITIONED (``root/ivf_cell=N/…``) — the full FAISS-style
    scale layout: search prunes at the storage layer (nprobe/ncells of
    the files) AND scans 32×-compressed codes instead of floats."""
    import ray

    ref = ray.put(model)

    def enc(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        cent, pq = m["centroids"], m["pq"]
        x = _normalize(np.stack(batch[vec_col].to_numpy())
                       .astype(np.float32))
        cells = (x @ cent.T).argmax(axis=1)
        resid = x - cent[cells]
        books, sub = pq["books"], pq["sub"]
        codes = np.empty((len(x), pq["m_subs"]), dtype=np.uint8)
        for mi in range(pq["m_subs"]):
            rs = resid[:, mi * sub:(mi + 1) * sub]
            d2 = (-2.0 * (rs @ books[mi].T)
                  + (books[mi] ** 2).sum(axis=1)[None, :])
            codes[:, mi] = d2.argmin(axis=1).astype(np.uint8)
        return pd.DataFrame({
            id_col: batch[id_col].astype("int64"),
            "ivf_cell": cells.astype(np.int32),
            "pq_code": list(codes),
        })

    ds.map_batches(enc, batch_format="pandas") \
        .write_parquet(root, partition_cols=["ivf_cell"])
    np.save(f"{root.rstrip('/')}/_centroids.npy", model["centroids"])
    np.save(f"{root.rstrip('/')}/_pq_books.npy", model["pq"]["books"])
    return root


def ivfpq_search(root: str, queries: np.ndarray, k: int = 10,
                 nprobe: int = 4, id_col: str = "vec_id"):
    """ADC top-k over a built IVF-PQ index, reading ONLY the probed
    cells' files. sim(q, x) ≈ q·centroid[cell] + Σ_m LUT[m, code]:
    the PQ books are shared across cells (trained on pooled residuals),
    so each query needs ONE LUT plus a per-cell scalar — scoring is m
    uint8 gathers + two adds per vector, no float decode."""
    import glob

    import ray
    import ray.data as rd

    rootp = root.rstrip("/")
    cent = np.load(f"{rootp}/_centroids.npy")
    books = np.load(f"{rootp}/_pq_books.npy")
    m_subs, k_codes, sub = books.shape
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    cells = np.unique(probe)
    files = [f for c in cells
             for f in glob.glob(f"{rootp}/ivf_cell={c}/*.parquet")]
    ds = rd.read_parquet(files)

    luts = np.stack([q[:, mi * sub:(mi + 1) * sub] @ books[mi].T
                     for mi in range(m_subs)], axis=1)  # (nq, m, k)
    qcent = q @ cent.T                                  # (nq, ncells)
    lref = ray.put((luts, qcent))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        luts_, qcent_ = ray.get(lref)
        codes = np.stack(batch["pq_code"].to_numpy())
        cells_ = batch["ivf_cell"].to_numpy().astype(np.int64)
        nq = luts_.shape[0]
        sims = qcent_[:, cells_].astype(np.float32)     # (nq, n)
        for mi in range(codes.shape[1]):
            sims += luts_[:, mi, codes[:, mi]]
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        ids = batch[id_col].to_numpy()
        qi = np.repeat(np.arange(nq, dtype=np.int64), kk)
        return pd.DataFrame({
            "query_id": qi,
            id_col: ids[idx.ravel()],
            "score": np.round(sims[np.repeat(np.arange(nq), kk),
                                   idx.ravel()], 6),
        })

    return _final_topk_ds(ds.map_batches(score, batch_format="pandas"),
                          k, id_col, "score")

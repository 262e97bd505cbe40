"""Incrementally maintained ANN (IVF) index over a ``LakeTable``
embedding column — closing the last write-once index family: the
cell-partitioned IVF layout (stages/similarity.py ivf_build_index)
goes stale after every lake commit and a 100-TB CDC pipeline cannot
re-cluster the corpus per epoch.

``LakeANNIndex`` applies the ``LakeTextIndex`` LSM discipline
(state/index.py _LsmSegmentIndex) to vectors: each lake commit appends
a DELTA SEGMENT of signed rows — op=+1 for the touched partitions' new
live vectors, op=-1 for their previous versions — partitioned by IVF
cell exactly like the base. Cell assignment is row-local once the
centroids are fixed (trained on a sample at the first full build,
stored in ``root/_centroids.npy`` so the index is self-describing),
so maintenance cost is ∝ the commit's write amplification: embed-assign
old+new versions of the touched partitions and shuffle ONLY their rows
into cell files. Never the corpus.

A vector UPDATE may move between cells: its -1 lands in the old cell
and its +1 in the new cell, so per-cell last-op-wins by key (segments
in chain order; within a segment -1 sorts before +1) resolves both the
in-place and the cell-crossing case. Search probes the ``nprobe``
nearest cells and reads ≤ live_segments files per probed cell — one
Ray task per cell resolves and scores against the broadcast query
matrix, returning only local top-k. ``compact()`` folds all segments
into a fresh full segment to re-bound read amplification (the LSM
trade). With ``nprobe = n_cells`` search is EXHAUSTIVE — exactly
brute-force cosine top-k over the live lake state, which is what the
``cdc_ann_vectors`` driver query hash-verifies against SQL.

Centroids are deliberately immutable (standard IVF practice): drift is
a recall concern, not a correctness one — resolution is exact whatever
the partitioning. Re-clustering = build a fresh index root.
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

from chomper_ray.stages.merge import INTERNAL_DELETED
from chomper_ray.stages.similarity import _normalize, train_ivf_centroids
from chomper_ray.state.index import _LsmSegmentIndex


class _VecProbeKernel:
    """Cosine near-dup probe over a FROZEN cell plan — picklable, so
    the same kernel serves driver-side ``near_vecs`` AND the
    distributed admission stage (the embedding twin of
    ``dupindex._ProbeKernel``; ``_AdmissionFilter`` consumes either
    interchangeably because its logic never looks inside the probed
    values).

    Probing is batched per cell: queries are assigned to their
    ``nprobe`` nearest cells (``None`` = every cell — EXHAUSTIVE, the
    exact-semantics setting the SQL oracle verifies; production sets
    nprobe for the standard IVF recall/cost trade), each touched cell
    is resolved once (live per-key last-op-wins across segments,
    LRU-cached up to ``max_cached_cells``) and scored as one float64
    matmul against the whole query batch."""

    def __init__(self, plan: dict[int, list[tuple[int, str]]],
                 centroids: np.ndarray | None, threshold: float,
                 nprobe: int | None = None,
                 max_cached_cells: int = 64):
        self.plan = plan
        self.centroids = centroids
        self.threshold = float(threshold)
        self.nprobe = nprobe
        self.max_cached_cells = max_cached_cells
        from collections import OrderedDict
        self._cache: "OrderedDict[int, tuple | None]" = OrderedDict()

    def _cell(self, c: int):
        if c in self._cache:
            self._cache.move_to_end(c)
            return self._cache[c]
        parts = []
        for rank, f in self.plan.get(c, ()):
            t = pq.read_table(f).to_pandas()
            if len(t):
                parts.append(t.assign(_r=rank))
        res = None
        if parts:
            cat = pd.concat(parts, ignore_index=True) \
                .sort_values(["key", "_r", "op"], kind="stable") \
                .drop_duplicates(subset=["key"], keep="last")
            cat = cat[cat["op"] == 1]
            if len(cat):
                m = np.stack(cat["vec"].to_numpy()).astype(np.float64)
                m /= np.maximum(
                    np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
                res = (cat["key"].to_numpy(), m)
        self._cache[c] = res
        if len(self._cache) > self.max_cached_cells:
            self._cache.popitem(last=False)
        return res

    def matches(self, vecs) -> list[dict]:
        """Per query vector, the live keys whose cosine similarity ≥
        threshold as ``{key: sim}``."""
        vecs = list(vecs)
        out: list[dict] = [dict() for _ in vecs]
        if self.centroids is None or not self.plan or not vecs:
            return out
        q = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                            1e-12)
        cent = self.centroids
        if self.nprobe is None or self.nprobe >= len(cent):
            probe = np.tile(np.arange(len(cent)), (len(qn), 1))
        else:
            probe = np.argsort(-(qn.astype(np.float32) @ cent.T),
                               axis=1)[:, :self.nprobe]
        from collections import defaultdict
        per_cell: dict[int, list[int]] = defaultdict(list)
        for row in range(len(qn)):
            for c in probe[row]:
                per_cell[int(c)].append(row)
        for c, rows in per_cell.items():
            resolved = self._cell(c)
            if resolved is None:
                continue
            keys, m = resolved
            sc = qn[rows] @ m.T
            hq, hk = np.nonzero(sc >= self.threshold)
            for i, j in zip(hq, hk):
                out[rows[i]][keys[j]] = float(sc[i, j])
        return out


class LakeANNIndex(_LsmSegmentIndex):
    def __init__(self, lake, root, vec_col: str = "embedding",
                 key_col: str | None = None, n_cells: int = 16,
                 train_rows: int = 20_000, seed: int = 5):
        super().__init__(lake, root)
        self.vec_col = vec_col
        self.key_col = key_col or lake.key
        self.n_cells = int(n_cells)
        self.train_rows = int(train_rows)
        self.seed = seed

    # -- centroids -------------------------------------------------------------
    def _centroids_path(self) -> Path:
        return self.root / "_centroids.npy"

    def centroids(self) -> np.ndarray | None:
        p = self._centroids_path()
        return np.load(p) if p.exists() else None

    def _ensure_centroids(self, files: list[str]) -> np.ndarray | None:
        cent = self.centroids()
        if cent is not None:
            return cent
        # first full build: train on a driver-side sample (the sample is
        # bounded by train_rows; ASSIGNMENT runs distributed)
        sample = []
        need = self.train_rows
        for f in files:
            t = pq.read_table(f, columns=[self.vec_col, INTERNAL_DELETED])
            t = t.filter(pa.compute.invert(t[INTERNAL_DELETED]))
            if t.num_rows == 0:
                continue
            vecs = t[self.vec_col].to_pylist()[:need]
            sample.extend(vecs)
            need -= len(vecs)
            if need <= 0:
                break
        if not sample:
            return None
        cent = train_ivf_centroids(np.asarray(sample, dtype=np.float32),
                                   self.n_cells, seed=self.seed)
        tmp = self.root / f"._centroids.{uuid.uuid4().hex[:8]}.npy.tmp"
        with open(tmp, "wb") as f:  # np.save(path) would append ".npy"
            np.save(f, cent)
        os.replace(tmp, self._centroids_path())
        return cent

    # -- segment construction ----------------------------------------------------
    def _signed_ds(self, new_files: list[str], old_files: list[str],
                   cent_ref):
        """Signed (key, vec, op, cell) rows over LIVE rows of BOTH file
        sets in one read; op (+1 new / −1 old) derives per-row from the
        block's source path, cell = nearest centroid (row-local). One
        read instead of a two-branch ``union`` — UnionOperator feeding
        the cell shuffle can livelock Ray's streaming executor at
        large-segment scale (see LakeTextIndex._postings_ds)."""
        import ray
        import ray.data as rd

        key, vec_col = self.key_col, self.vec_col
        assert not (set(new_files) & set(old_files))  # sign by path
        signs = {f: 1 for f in new_files}
        signs.update({f: -1 for f in old_files})

        def assign(df: pd.DataFrame) -> pd.DataFrame:
            op_rows = df["path"].map(signs).astype("int8")
            df = df[~df[INTERNAL_DELETED].astype(bool)]
            op_rows = op_rows[df.index]
            if not len(df):
                return pd.DataFrame({
                    "key": pd.Series(dtype="object"),
                    "vec": pd.Series(dtype="object"),
                    "op": pd.Series(dtype="int8"),
                    "cell": pd.Series(dtype="int32")})
            cent = ray.get(cent_ref)
            m = _normalize(np.stack(df[vec_col].to_numpy())
                           .astype(np.float32))
            return pd.DataFrame({
                "key": df[key].to_numpy(),
                "vec": list(df[vec_col].to_numpy()),
                "op": op_rows.to_numpy(),
                "cell": (m @ cent.T).argmax(axis=1).astype(np.int32)})

        ds = rd.read_parquet(list(signs), columns=[key, vec_col,
                                                   INTERNAL_DELETED],
                             include_paths=True)
        return ds.map_batches(assign, batch_format="pandas")

    def _write_segment(self, cid: int, new_files: list[str],
                       old_files: list[str], full: bool) -> dict:
        import ray
        import ray.data as rd

        seg_dir = self.root / (f"seg-{cid:06d}-full" if full
                               else f"seg-{cid:06d}")
        seg_dir.mkdir(parents=True, exist_ok=True)
        segs = str(seg_dir)
        cent = self._ensure_centroids(new_files or old_files)
        n_vecs_delta, rows_scanned = 0, 0
        if cent is not None and (new_files or old_files):
            cent_ref = ray.put(cent)

            def write_cell(g: pd.DataFrame) -> pd.DataFrame:
                c = int(g["cell"].iloc[0])
                # within a segment -1 sorts before +1 per key, so an
                # in-place update resolves to its new vector
                g = g.sort_values(["key", "op"], kind="stable") \
                    .drop(columns=["cell"])
                d = Path(segs) / f"c={c:05d}"
                d.mkdir(parents=True, exist_ok=True)
                tmp = d / f".part.{uuid.uuid4().hex[:8]}.parquet.tmp"
                pq.write_table(pa.Table.from_pandas(
                    g, preserve_index=False), tmp)
                os.replace(tmp, d / "part.parquet")
                (d / "_SUCCESS").touch()
                return pd.DataFrame({"cell": [c],
                                     "n": [int(g["op"].sum())],
                                     "rows": [len(g)]})

            ds = self._signed_ds(new_files, old_files, cent_ref)
            meta = ds.groupby("cell").map_groups(
                write_cell, batch_format="pandas").to_pandas()
            if len(meta):
                n_vecs_delta = int(meta["n"].sum())
                rows_scanned = int(meta["rows"].sum())
        marker = {"cid": int(cid), "full": bool(full),
                  "n_vecs_delta": n_vecs_delta,
                  "rows_scanned": rows_scanned}
        tmp = seg_dir / f"._SEGMENT.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(json.dumps(marker))
        os.replace(tmp, seg_dir / "_SEGMENT.json")
        return marker

    # -- reads ----------------------------------------------------------------
    def stats(self) -> dict:
        live = self._live_segments()
        return {"n_vecs": sum(s["n_vecs_delta"] for s in live),
                "segments": len(live), "n_cells": self.n_cells}

    def _resolved_cell(self, cell: int) -> pd.DataFrame | None:
        """Live (key, vec) rows of one cell: per-key last op wins across
        segments in chain order (a cell-crossing update contributes its
        -1 here and its +1 in the destination cell)."""
        parts = []
        for rank, seg in enumerate(self._live_segments()):
            d = Path(seg["dir"]) / f"c={cell:05d}"
            if not (d / "_SUCCESS").exists():
                continue
            t = pq.read_table(d / "part.parquet").to_pandas()
            if len(t):
                parts.append(t.assign(_r=rank))
        if not parts:
            return None
        cat = pd.concat(parts, ignore_index=True)
        cat = cat.sort_values(["key", "_r", "op"], kind="stable")
        cat = cat.drop_duplicates(subset=["key"], keep="last")
        return cat[cat["op"] == 1][["key", "vec"]]

    def _cell_plan(self) -> dict[int, list[tuple[int, str]]]:
        """cell → [(chain rank, cell file)] over live segments."""
        plan: dict[int, list[tuple[int, str]]] = {}
        for rank, seg in enumerate(self._live_segments()):
            for d in Path(seg["dir"]).glob("c=*"):
                if (d / "_SUCCESS").exists():
                    plan.setdefault(int(d.name.split("=")[1]), []) \
                        .append((rank, str(d / "part.parquet")))
        return plan

    def probe_kernel(self, threshold: float = 0.9,
                     nprobe: int | None = None) -> _VecProbeKernel:
        """Freeze the current segment chain into a picklable cosine
        near-dup probe. ``nprobe=None`` probes every cell (exact)."""
        return _VecProbeKernel(self._cell_plan(), self.centroids(),
                               threshold, nprobe)

    def admission_filter(self, threshold: float = 0.9,
                         nprobe: int | None = None,
                         op_col: str = "op",
                         delete_ops: tuple = ("delete",),
                         rejects_dir: str | None = None,
                         epoch: int | None = None):
        """Distributed ingest-time EMBEDDING dedup gate: a
        ``map_batches`` callable (pyarrow batches) dropping events
        whose vector cosine-matches a live vector under a different
        key, judged against the index as frozen NOW. The embedding
        twin of ``LakeMinHashIndex.admission_filter`` — same
        semantics matrix (self-updates/deletes/null vectors pass,
        same-epoch dups both admit), same rejects provenance
        side-log. Compose per epoch via ``commit_epoch_admitted``."""
        from chomper_ray.state.dupindex import _AdmissionFilter
        return _AdmissionFilter(self.probe_kernel(threshold, nprobe),
                                self.key_col, self.vec_col, op_col,
                                delete_ops, rejects_dir=rejects_dir,
                                epoch=epoch)

    def near_vecs(self, vecs, threshold: float = 0.9,
                  nprobe: int | None = None) -> pd.DataFrame:
        """Live vectors cosine-matching each query vector ≥
        ``threshold``: (query, key, sim), ``query`` = position in
        ``vecs``. Driver-side file reads of only the probed cells —
        the ingest-time admission check."""
        kernel = self.probe_kernel(threshold, nprobe)
        out_q, out_k, out_s = [], [], []
        for qi, found in enumerate(kernel.matches(list(vecs))):
            for k, sim in found.items():
                out_q.append(qi)
                out_k.append(k)
                out_s.append(sim)
        return pd.DataFrame({"query": pd.array(out_q, dtype="int64"),
                             "key": out_k,
                             "sim": pd.array(out_s, dtype="float64")}) \
            .sort_values(["query", "key"], kind="stable") \
            .reset_index(drop=True)

    def search(self, queries: np.ndarray, k: int = 10,
               nprobe: int | None = None) -> pd.DataFrame:
        """Cosine top-k per query over the maintained index. Probes the
        ``nprobe`` nearest cells (union across queries, the same
        candidate contract as ``ivf_search``); one Ray task per probed
        cell resolves its live vectors and returns local top-k, the
        driver folds cells×queries×k rows. ``nprobe=None`` probes every
        cell — exhaustive, exactly brute-force over the live state.
        Scores are float64 for SQL-oracle parity."""
        import ray
        import ray.data as rd

        cent = self.centroids()
        if cent is None:
            return pd.DataFrame({"qid": pd.Series(dtype="int64"),
                                 "key": pd.Series(dtype="object"),
                                 "score": pd.Series(dtype="float64")})
        q = np.asarray(queries, dtype=np.float64)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                            1e-12)
        if nprobe is None or nprobe >= len(cent):
            cells = np.arange(len(cent))
        else:
            probe = np.argsort(-(qn.astype(np.float32) @ cent.T),
                               axis=1)[:, :nprobe]
            cells = np.unique(probe)
        live = self._live_segments()
        seg_dirs = [s["dir"] for s in live]
        qref = ray.put(qn)
        kk = int(k)

        def score_cell(batch: pa.Table) -> pa.Table:
            out_q, out_key, out_s = [], [], []
            qm = ray.get(qref)
            for cell in batch["cell"].to_pylist():
                parts = []
                for rank, d in enumerate(seg_dirs):
                    p = Path(d) / f"c={int(cell):05d}"
                    if not (p / "_SUCCESS").exists():
                        continue
                    t = pq.read_table(p / "part.parquet").to_pandas()
                    if len(t):
                        parts.append(t.assign(_r=rank))
                if not parts:
                    continue
                cat = pd.concat(parts, ignore_index=True) \
                    .sort_values(["key", "_r", "op"], kind="stable") \
                    .drop_duplicates(subset=["key"], keep="last")
                cat = cat[cat["op"] == 1]
                if not len(cat):
                    continue
                m = np.stack(cat["vec"].to_numpy()).astype(np.float64)
                m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                                1e-12)
                sc = qm @ m.T                      # (nq, n_cell_vecs)
                keys = cat["key"].to_numpy()
                top = min(kk, sc.shape[1])
                idx = np.argpartition(-sc, top - 1, axis=1)[:, :top]
                for qi in range(sc.shape[0]):
                    out_q.extend([qi] * top)
                    out_key.extend(keys[idx[qi]])
                    out_s.extend(sc[qi, idx[qi]])
            return pa.table({
                "qid": pa.array(out_q, type=pa.int64()),
                "key": pa.array(out_key),
                "score": pa.array(out_s, type=pa.float64())})

        import ray.data as rd
        folded = (rd.from_arrow(pa.table({"cell": pa.array(
                      cells.astype(np.int32))}))
                  .repartition(len(cells))
                  .map_batches(score_cell, batch_format="pyarrow")
                  .to_pandas())  # ≤ cells×nq×k rows — bounded
        if not len(folded):
            return pd.DataFrame({"qid": pd.Series(dtype="int64"),
                                 "key": pd.Series(dtype="object"),
                                 "score": pd.Series(dtype="float64")})
        folded = folded.sort_values(
            ["qid", "score", "key"], ascending=[True, False, True],
            kind="stable")
        return folded.groupby("qid", sort=True).head(kk) \
            .reset_index(drop=True)

    # -- maintenance ----------------------------------------------------------
    def compact(self) -> dict:
        """Fold all live segments into one full segment at the newest
        applied cid, then drop superseded segment dirs — bounded by the
        index size; run on the compaction cadence, not per commit."""
        import shutil

        segs = self._segments()
        if not segs:
            return {"compacted": False}
        cid = segs[-1]["cid"]
        live = self._live_segments()
        if len(live) == 1 and live[0].get("full"):
            return {"compacted": False}
        n_vecs = 0
        seg_dir = self.root / f"seg-{cid:06d}-full"
        seg_dir.mkdir(parents=True, exist_ok=True)
        for cell in range(self.n_cells):
            res = self._resolved_cell(cell)
            if res is None or not len(res):
                continue
            res = res.sort_values("key", kind="stable")
            res["op"] = np.int8(1)
            d = seg_dir / f"c={cell:05d}"
            d.mkdir(parents=True, exist_ok=True)
            tmp = d / f".part.{uuid.uuid4().hex[:8]}.parquet.tmp"
            pq.write_table(pa.Table.from_pandas(
                res[["key", "vec", "op"]], preserve_index=False), tmp)
            os.replace(tmp, d / "part.parquet")
            (d / "_SUCCESS").touch()
            n_vecs += len(res)
        marker = {"cid": int(cid), "full": True,
                  "n_vecs_delta": n_vecs, "rows_scanned": 0}
        tmp = seg_dir / f"._SEGMENT.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(json.dumps(marker))
        os.replace(tmp, seg_dir / "_SEGMENT.json")
        for s in segs:
            if s["dir"] != str(seg_dir):
                shutil.rmtree(s["dir"], ignore_errors=True)
        return {"compacted": True, "n_vecs": n_vecs}


def commit_epoch_admitted(lake, idx: LakeANNIndex, ds, epoch: int, *,
                          threshold: float = 0.9,
                          nprobe: int | None = None,
                          op_col: str = "op",
                          delete_ops: tuple = ("delete",),
                          rejects_root: str | None = None,
                          schema_hint=None):
    """Embedding dedup-at-ingest for one epoch: freeze the ANN index's
    current segments into a cosine admission gate, map it over the
    epoch's event Dataset, commit, then fold the commit back into the
    index — so the NEXT epoch's gate sees everything this one
    admitted. The vector twin of ``dupindex.run_cdc_admitted``'s
    per-epoch body, shaped for vector lakes that ingest via
    ``commit_epoch`` rather than the binlog loop (the caller owns
    epoch iteration; see the ``cdc_vec_dedup_ingest`` driver query).

    Exactly-once like any ``commit_epoch``: replaying a committed
    epoch skips the commit (the gate still runs, its output is
    discarded); ``idx.refresh()`` is idempotent-from-anywhere, so a
    crash between commit and refresh catches up on re-entry.

    ``nprobe=None`` probes every cell — the gate is then EXACT cosine
    admission over the live state (what the SQL oracle verifies);
    production sets ``nprobe`` and accepts standard IVF recall.

    ``rejects_root`` enables the per-epoch rejected-event provenance
    parquet under ``rejects_root/epoch=<N>/`` (read back with
    ``dupindex.read_rejects``), cleaned here before the gate runs so
    replaying an uncommitted epoch never double-logs.
    """
    import shutil as _sh

    rej = None
    if rejects_root is not None:
        rej = Path(rejects_root) / f"epoch={epoch}"
        _sh.rmtree(rej, ignore_errors=True)
        rej = str(rej)
    gate = idx.admission_filter(threshold, nprobe, op_col=op_col,
                                delete_ops=delete_ops, rejects_dir=rej,
                                epoch=epoch)
    if schema_hint is None:
        # the gate only filters rows, so the post-gate schema IS the
        # input schema — resolve it from read metadata so commit_epoch
        # never runs its limit(1) schema probe (which would execute
        # the gate a second time and double-log its rejects)
        sch = ds.schema(fetch_if_missing=False)
        base = getattr(sch, "base_schema", None) if sch is not None \
            else None
        if isinstance(base, pa.Schema):
            schema_hint = base
    commit = lake.commit_epoch(ds.map_batches(gate,
                                              batch_format="pyarrow"),
                               epoch, schema_hint=schema_hint)
    idx.refresh()
    return commit

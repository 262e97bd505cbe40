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

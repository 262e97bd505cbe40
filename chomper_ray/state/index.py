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


def resolve_token_bucket(seg_dirs, pid: int, token: str | None = None):
    """Live postings of one token bucket resolved over ``seg_dirs``
    (LSM chain order): per-(token, doc) last op wins; -1 sorts before
    +1 inside a segment so an in-place doc update resolves to its new
    row. Module-level (ships to Ray tasks as a list of paths, no index
    object pickled) — the batched retrieval path scores each distinct
    token's bucket inside ``map_batches``."""
    parts = []
    for rank, sdir in enumerate(seg_dirs):
        d = Path(sdir) / f"t={pid:05d}"
        if not (d / "_SUCCESS").exists():
            continue
        t = pq.read_table(d / "part.parquet").to_pandas()
        if token is not None:
            toks = t["token"].to_numpy()
            lo = np.searchsorted(toks, token, side="left")
            hi = np.searchsorted(toks, token, side="right")
            t = t.iloc[lo:hi]
        if len(t):
            parts.append(t.assign(_r=rank))
    if not parts:
        return None
    cat = pd.concat(parts, ignore_index=True)
    cat = cat.sort_values(["token", "doc", "_r", "op"], kind="stable")
    cat = cat.drop_duplicates(subset=["token", "doc"], keep="last")
    return cat[cat["op"] == 1][["token", "doc", "tf", "dl"]]


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


# ---------------------------------------------------------------------------
# Incremental index maintenance under CDC (LSM-style delta segments)
# ---------------------------------------------------------------------------

class _LsmSegmentIndex:
    """Shared machinery for lake indexes maintained COMMIT BY COMMIT as
    LSM-style signed delta segments (``LakeTextIndex`` postings,
    ``LakeANNIndex`` vectors — state/annindex.py): segment bookkeeping
    under ``root/seg-<cid:06d>[-full]/`` with a ``_SEGMENT.json`` marker
    as the exactly-once commit point, plus the manifest-chain walk that
    turns each lake commit into a (new_files, old_files) diff of its
    touched partitions. Subclasses implement ``_write_segment(cid,
    new_files, old_files, full)`` — what a segment CONTAINS (postings,
    vectors, ...) is theirs; WHEN one is written is decided here."""

    def __init__(self, lake, root):
        self.lake = lake
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _write_segment(self, cid: int, new_files: list[str],
                       old_files: list[str], full: bool) -> dict:
        raise NotImplementedError

    # -- segment bookkeeping ------------------------------------------------
    def _segments(self) -> list[dict]:
        """Applied segments in chain order; a ``-full`` variant of a cid
        supersedes (and hides) its delta twin, and a higher ``gen``
        full variant (a retraining compaction at the same cid —
        LakeANNIndex.compact(retrain=True)) supersedes a lower one."""
        segs = {}
        for m in self.root.glob("seg-*/_SEGMENT.json"):
            s = json.loads(m.read_text())
            s["dir"] = str(m.parent)
            cur = segs.get(s["cid"])
            if cur is None or \
                    (bool(s.get("full")), int(s.get("gen", 0))) > \
                    (bool(cur.get("full")), int(cur.get("gen", 0))):
                segs[s["cid"]] = s
        return [segs[c] for c in sorted(segs)]

    def applied_commits(self) -> list[int]:
        return [s["cid"] for s in self._segments()]

    def _live_segments(self) -> list[dict]:
        segs = self._segments()
        for i in range(len(segs) - 1, -1, -1):
            if segs[i].get("full"):
                return segs[i:]
        return segs

    # -- maintenance ----------------------------------------------------------
    def refresh(self) -> dict:
        """Apply every unapplied lake commit in chain order. Returns
        ``{"applied": [markers...], "skipped": [cids...]}``; idempotent.

        Merge-on-read lakes maintain WITHOUT compaction: a delta-bearing
        ingest commit writes a real segment from the lake's
        key-restricted old/new diff (``materialize_mor_commit_diff`` —
        −1 rows are the commit's keys resolved at the PREVIOUS manifest,
        +1 rows are one replay step over them), so the segment covers
        exactly the changed rows; a ``compact_deltas`` commit writes an
        empty segment (pure storage reorganization — its changes were
        applied commit-by-commit). Full builds / GC fallbacks at a
        delta-bearing manifest scan the RESOLVED state
        (``materialize_mor_resolved``)."""
        from chomper_ray.state.fs import require_local_lake_root

        require_local_lake_root(self.lake, type(self).__name__)
        import shutil
        import tempfile

        from chomper_ray.state.lake import (committed_epochs,
                                            is_compaction_manifest,
                                            load_manifest,
                                            manifest_has_deltas,
                                            materialize_mor_commit_diff,
                                            materialize_mor_resolved,
                                            mor_commit_delta_pids,
                                            mor_diff_inputs_exist)

        root = self.lake.root
        cids = committed_epochs(root)
        done = set(self.applied_commits())
        # an index compact() folds history into one full segment and
        # drops the superseded per-commit dirs — commits older than the
        # newest applied cid are covered by that fold, and re-applying
        # them would be dead work (their segments would rank BELOW the
        # full segment and never resolve)
        newest = max(done) if done else None
        applied, skipped = [], []
        prev_cid = None
        for cid in cids:
            if cid in done or (newest is not None and cid < newest):
                prev_cid = cid
                skipped.append(cid)
                continue
            man = load_manifest(root, cid)
            if man.get("truncated") or not man["partitions"]:
                applied.append(self._write_segment(cid, [], [], full=True))
                prev_cid = cid
                continue

            def full_build(man=man, cid=cid):
                # whole-state build at this manifest; pending
                # merge-on-read deltas are resolved first
                scratch = None
                if manifest_has_deltas(man):
                    scratch = tempfile.mkdtemp(prefix="chomper_idx_full_")
                    files = materialize_mor_resolved(
                        root, man, self.lake._mor_kwargs(), scratch)
                else:
                    files = [str(root / v["file"])
                             for _, v in sorted(man["partitions"].items())
                             if v.get("file")]
                try:
                    return self._write_segment(cid, files, [], full=True)
                finally:
                    if scratch is not None:
                        shutil.rmtree(scratch, ignore_errors=True)

            if prev_cid is None or prev_cid not in done and not applied \
                    and not self._segments():
                # first segment ever: full build from this manifest
                applied.append(full_build())
                prev_cid = cid
                continue
            if is_compaction_manifest(man):
                applied.append(self._write_segment(cid, [], [], full=False))
                prev_cid = cid
                continue
            prev_man = load_manifest(root, prev_cid)
            mor_pids = mor_commit_delta_pids(man, cid)
            if mor_pids:
                if prev_man is None or not mor_diff_inputs_exist(
                        root, man, prev_man, cid):
                    applied.append(full_build())
                else:
                    scratch = tempfile.mkdtemp(prefix="chomper_idx_diff_")
                    try:
                        new_files, old_files = materialize_mor_commit_diff(
                            root, man, prev_man, cid,
                            self.lake._mor_kwargs(), scratch)
                        applied.append(self._write_segment(
                            cid, new_files, old_files, full=False))
                    finally:
                        shutil.rmtree(scratch, ignore_errors=True)
                prev_cid = cid
                continue
            touched = sorted({int(ln["partition_id"])
                              for ln in man.get("lineage", [])})
            new_files = [str(root / man["partitions"][str(p)]["file"])
                         for p in touched
                         if man["partitions"].get(str(p), {}).get("file")]
            old_files, missing_old = [], False
            for p in touched:
                part = prev_man["partitions"].get(str(p)) \
                    if prev_man else None
                if part is None or not part.get("file"):
                    continue
                f = root / part["file"]
                if not f.exists():  # compacted away
                    missing_old = True
                    break
                old_files.append(str(f))
            if missing_old or prev_man is None:
                applied.append(full_build())
            else:
                applied.append(self._write_segment(cid, new_files,
                                                   old_files, full=False))
            prev_cid = cid
        return {"applied": applied, "skipped": skipped}


class LakeTextIndex(_LsmSegmentIndex):
    """Inverted text index over a ``LakeTable``, maintained COMMIT BY
    COMMIT from each commit's touched partitions — the
    ``MaterializedAgg`` per-commit delta discipline (state/matview.py)
    applied to a non-additive structure via LSM-style segments.

    Postings are not self-maintainable in place: a doc update changes
    its whole token set, and folding that into token-bucketed base
    files would re-read/rewrite every touched token bucket — corpus-
    sized work for a one-partition commit. Instead each lake commit
    appends a DELTA SEGMENT: signed postings (op=+1 for the touched
    partitions' new version, op=-1 for their previous version), token-
    bucketed and sorted exactly like the base. Maintenance cost is
    therefore ∝ the commit's own write amplification (tokenize old+new
    versions of the touched partitions, one shuffle of THEIR postings),
    never the corpus; a query reads ≤ one bucket file per segment per
    token and resolves doc-level last-op-wins across segments (within a
    segment, an updated doc's -1 sorts before its +1). ``compact()``
    folds all segments into a fresh full segment to re-bound read
    amplification — the classic LSM trade, chosen deliberately for the
    100-TB CDC regime where commits are small and queries read O(k)
    files either way.

    Storage: ``root/seg-<cid:06d>[-full]/t=NNNNN/part.parquet`` (+
    ``_SUCCESS`` per bucket, written tmp→rename), with a
    ``_SEGMENT.json`` marker written LAST as the segment's commit
    point; ``refresh()`` resumes from the newest marker and re-running
    is a no-op (same exactly-once contract as the lake). Doc-length
    stats for BM25 (n_docs, Σdl) ride each segment's marker as deltas.
    ``positions`` is intentionally unsupported here (phrase search
    wants a full rebuild); use ``build_inverted_index`` for that.
    """

    def __init__(self, lake, root, col: str = "text",
                 key_col: str | None = None, sep: str = " ",
                 num_partitions: int = 64):
        from chomper_ray.stages.merge import DEFAULT_KEY

        super().__init__(lake, root)
        self.col = col
        self.key_col = key_col or DEFAULT_KEY
        self.sep = sep
        self.num_partitions = int(num_partitions)

    def stats(self) -> dict:
        live = self._live_segments()
        n_docs = sum(s["n_docs_delta"] for s in live)
        sum_dl = sum(s["sum_dl_delta"] for s in live)
        return {"n_docs": n_docs, "sum_dl": sum_dl,
                "avgdl": sum_dl / max(n_docs, 1),
                "segments": len(live)}

    # -- segment construction -------------------------------------------------
    def _postings_ds(self, new_files: list[str], old_files: list[str]):
        """Signed (token, doc, tf, dl, op) postings over LIVE rows of
        BOTH file sets in one read — op (+1 new / −1 old) derives
        per-row from each block's source path. One read instead of a
        two-branch ``union`` matters beyond cost: UnionOperator feeding
        the bucket shuffle livelocks Ray's streaming executor at scale
        (observed wedged at a 48M-posting segment: union inqueue held
        ~6.6 GB while the sort's reservation starved the upstream maps;
        driver spun, workers idle). The per-row sign also stays correct
        if Ray ever bundles blocks from different files into one
        batch."""
        import polars as pl
        import ray.data as rd

        from chomper_ray.stages.merge import INTERNAL_DELETED

        col, key, sep, nb = self.col, self.key_col, self.sep, \
            self.num_partitions
        assert not (set(new_files) & set(old_files))  # sign by path
        signs = {f: 1 for f in new_files}
        signs.update({f: -1 for f in old_files})

        def postings(df: pd.DataFrame) -> pd.DataFrame:
            op_rows = df["path"].map(signs).astype("int8")
            df = df[~df[INTERNAL_DELETED].astype(bool)]
            op_rows = op_rows[df.index]
            if not len(df):
                return pd.DataFrame({
                    "token": pd.Series(dtype="object"),
                    "doc": pd.Series(dtype="object"),
                    "tf": pd.Series(dtype="int64"),
                    "dl": pd.Series(dtype="int64"),
                    "op": pd.Series(dtype="int8"),
                    "_tb": pd.Series(dtype="int32")})
            base = pl.DataFrame({
                "d": pl.Series(df[key].to_numpy().astype(object),
                               dtype=pl.Utf8)
                if df[key].dtype == object else
                pl.Series(df[key].to_numpy()),
                "op": pl.Series(op_rows.to_numpy()),
                "w": pl.Series(pd.Series(df[col]).fillna("")
                               .astype(str).tolist()).str.split(sep),
            }).with_columns(pl.col("w").list.len().alias("dl"))
            # a doc's rows come from exactly one file, so op is constant
            # per (d, side); carrying it through the groupby is exact
            g = base.explode("w").group_by(["d", "w", "dl", "op"]).len() \
                .to_pandas()
            out = pd.DataFrame({"token": g["w"],
                                "doc": g["d"],
                                "tf": g["len"].astype("int64"),
                                "dl": g["dl"].astype("int64")})
            out["op"] = g["op"].astype("int8")
            out["_tb"] = stable_bucket(out["token"].to_numpy(),
                                       nb).astype("int32")
            return out

        ds = rd.read_parquet(list(signs),
                             columns=[key, col, INTERNAL_DELETED],
                             include_paths=True)
        return ds.map_batches(postings, batch_format="pandas")

    def _doc_stats(self, new_files: list[str], old_files: list[str]) \
            -> tuple[int, int, int]:
        """(n_docs_delta, sum_dl_delta, rows_scanned): ONE Ray job over
        both file sets, signed by side (new +1 / old −1)."""
        import polars as pl
        import ray.data as rd

        from chomper_ray.stages.merge import INTERNAL_DELETED

        if not new_files and not old_files:
            return 0, 0, 0
        col = self.col
        sep = self.sep
        signs = {f: +1 for f in new_files}
        signs.update({f: -1 for f in old_files})

        def st(df: pd.DataFrame) -> pd.DataFrame:
            sign = int(signs[df["_file"].iloc[0]])
            rows = len(df)
            df = df[~df[INTERNAL_DELETED].astype(bool)]
            if not len(df):
                return pd.DataFrame({"n": [0], "sum_dl": [0],
                                     "rows": [rows]})
            dl = pl.Series(pd.Series(df[col]).fillna("").astype(str)
                           .tolist()).str.split(sep).list.len()
            return pd.DataFrame({"n": [sign * len(df)],
                                 "sum_dl": [sign * int(dl.sum())],
                                 "rows": [rows]})

        # a file may appear on BOTH sides (self-referential delta is
        # impossible in the lake's COW scheme, but guard anyway)
        assert not (set(new_files) & set(old_files))
        ds = rd.read_parquet(list(signs), columns=[col, INTERNAL_DELETED],
                             include_paths=True)
        s = ds.map_batches(
            lambda df: st(df.rename(columns={"path": "_file"})),
            batch_format="pandas").to_pandas()
        return int(s["n"].sum()), int(s["sum_dl"].sum()), \
            int(s["rows"].sum())

    def _write_segment(self, cid: int, new_files: list[str],
                       old_files: list[str], full: bool) -> dict:
        import ray.data as rd

        seg_dir = self.root / (f"seg-{cid:06d}-full" if full
                               else f"seg-{cid:06d}")
        seg_dir.mkdir(parents=True, exist_ok=True)
        segs = str(seg_dir)

        def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
            pid = int(g["_tb"].iloc[0])
            g = g.drop(columns=["_tb"]) \
                .drop_duplicates(subset=["token", "doc", "op"]) \
                .sort_values(["token", "doc", "op"], kind="stable")
            d = Path(segs) / f"t={pid:05d}"
            d.mkdir(parents=True, exist_ok=True)
            tmp = d / f".part.{uuid.uuid4().hex[:8]}.parquet.tmp"
            pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                           tmp)
            os.replace(tmp, d / "part.parquet")
            (d / "_SUCCESS").touch()
            return pd.DataFrame({"pid": [pid], "postings": [len(g)]})

        n_postings = 0
        if new_files or old_files:
            ds = self._postings_ds(new_files, old_files)
            meta = ds.groupby("_tb").map_groups(
                write_bucket, batch_format="pandas").to_pandas()
            n_postings = int(meta["postings"].sum()) if len(meta) else 0
        n_delta, dl_delta, rows_scanned = self._doc_stats(new_files,
                                                          old_files)
        marker = {"cid": int(cid), "full": bool(full),
                  "n_docs_delta": n_delta,
                  "sum_dl_delta": dl_delta,
                  "postings": n_postings,
                  "rows_scanned": rows_scanned}
        tmp = seg_dir / f"._SEGMENT.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(json.dumps(marker))
        os.replace(tmp, seg_dir / "_SEGMENT.json")
        return marker

    # -- maintenance ----------------------------------------------------------
    def compact(self) -> dict:
        """Fold all live segments into one full segment at the newest
        applied cid, then drop superseded segment dirs. Bounded by the
        index size (it rewrites every bucket once) — run it on the
        compaction cadence, not per commit."""
        import shutil

        segs = self._segments()
        if not segs:
            return {"compacted": False}
        cid = segs[-1]["cid"]
        live = self._live_segments()
        if len(live) == 1 and live[0].get("full"):
            return {"compacted": False}
        st = self.stats()
        seg_dir = self.root / f"seg-{cid:06d}-full"
        seg_dir.mkdir(parents=True, exist_ok=True)
        n_postings = 0
        for pid in range(self.num_partitions):
            res = self._resolved_bucket(pid)
            if res is None or not len(res):
                continue
            res = res.sort_values(["token", "doc"], kind="stable")
            res["op"] = np.int8(1)
            d = seg_dir / f"t={pid:05d}"
            d.mkdir(parents=True, exist_ok=True)
            tmp = d / f".part.{uuid.uuid4().hex[:8]}.parquet.tmp"
            pq.write_table(pa.Table.from_pandas(
                res[["token", "doc", "tf", "dl", "op"]],
                preserve_index=False), tmp)
            os.replace(tmp, d / "part.parquet")
            (d / "_SUCCESS").touch()
            n_postings += len(res)
        marker = {"cid": int(cid), "full": True,
                  "n_docs_delta": st["n_docs"],
                  "sum_dl_delta": st["sum_dl"],
                  "postings": n_postings, "rows_scanned": 0}
        tmp = seg_dir / f"._SEGMENT.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(json.dumps(marker))
        os.replace(tmp, seg_dir / "_SEGMENT.json")
        for s in segs:
            if s["dir"] != str(seg_dir):
                shutil.rmtree(s["dir"], ignore_errors=True)
        return {"compacted": True, "postings": n_postings}

    # -- reads ----------------------------------------------------------------
    def _resolved_bucket(self, pid: int, token: str | None = None):
        return resolve_token_bucket(
            [s["dir"] for s in self._live_segments()], pid, token)

    def _token_pid(self, token: str) -> int:
        return int(stable_bucket(np.array([token], dtype=object),
                                 self.num_partitions)[0])

    def postings(self, token: str) -> pd.DataFrame:
        """Live (token, doc, tf, dl) rows for one token — reads one
        bucket file per live segment, no Ray job."""
        res = self._resolved_bucket(self._token_pid(token), token)
        if res is None:
            return pd.DataFrame({
                "token": pd.Series(dtype="object"),
                "doc": pd.Series(dtype="object"),
                "tf": pd.Series(dtype="int64"),
                "dl": pd.Series(dtype="int64")})
        return res.reset_index(drop=True)

    def search(self, tokens, mode: str = "all") -> np.ndarray:
        """Doc keys containing ``all``/``any`` of the tokens (sorted)."""
        sets = [self.postings(t)["doc"].to_numpy() for t in tokens]
        if not sets:
            return np.empty(0, dtype=object)
        if mode == "all":
            out = sets[0]
            for s in sets[1:]:
                out = np.intersect1d(out, s, assume_unique=True)
            return out
        if mode == "any":
            return np.unique(np.concatenate(sets))
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")

    def bm25(self, tokens, k: int | None = 10, k1: float = 1.2,
             b: float = 0.75, ndigits: int = 6) -> pd.DataFrame:
        """BM25 top-k over the maintained index (same formula as
        ``bm25_search``); ties break by ascending doc key. ``k=None``
        returns the FULL ranking of every doc containing ≥ 1 token —
        the postings walk already scores them all, so this costs no
        extra I/O (used by ``retrieval.hybrid_rrf`` for exact ranks)."""
        st = self.stats()
        n_docs, avgdl = float(st["n_docs"]), float(st["avgdl"])
        ids_all, score_all = [], []
        for t in dict.fromkeys(tokens):
            p = self.postings(t)
            if not len(p):
                continue
            df_ = float(len(p))
            idf = np.log((n_docs - df_ + 0.5) / (df_ + 0.5) + 1.0)
            tf = p["tf"].to_numpy().astype(np.float64)
            dl = p["dl"].to_numpy().astype(np.float64)
            denom = tf + k1 * (1.0 - b + b * dl / avgdl)
            ids_all.append(p["doc"].to_numpy())
            score_all.append(idf * tf * (k1 + 1.0) / denom)
        if not ids_all:
            return pd.DataFrame({"doc": pd.Series(dtype="object"),
                                 "score": pd.Series(dtype="float64")})
        ids = np.concatenate(ids_all)
        sc = np.concatenate(score_all)
        uniq, inv = np.unique(ids, return_inverse=True)
        tot = np.zeros(len(uniq))
        np.add.at(tot, inv, sc)
        order = np.lexsort((uniq, -tot))[:k]
        return pd.DataFrame({"doc": uniq[order],
                             "score": np.round(tot[order], ndigits)})

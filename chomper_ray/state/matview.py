"""Incremental materialized aggregate views over a LakeTable (IVM).

A ``MaterializedAgg`` maintains grouped ADDITIVE aggregates (live-row
count + int64 sums) over a lake table, updated per manifest commit from
ONLY the partitions that commit rewrote:

    delta(commit) =   Σ contribution(new version of touched partitions)
                    − Σ contribution(previous version of same partitions)

over LIVE rows on both sides. Untouched keys inside a touched partition
appear with identical values on both sides and cancel EXACTLY — the
contributions are integers, so there is no float drift — which makes the
maintained view equal a full recompute after EVERY commit (pinned by
pytest across inserts, updates, deletes, and maintenance commits; the
driver query hash-verifies the drained view against the same LWW SQL
oracle as the full-scan ``cdc_domain_stats``).

Self-maintainability (standard IVM theory): count/sum are
self-maintainable; min/max are NOT under updates/deletes (a lowered max
needs a group rescan), so this view intentionally supports additive
aggregates only — ``MaterializedExtrema`` below covers min/max with
the affected-group-rescan discipline.

Merge-on-read lakes maintain without compaction: a delta-bearing
ingest commit folds its EXACT effect via the lake's key-restricted
old/new diff (``materialize_mor_commit_diff`` — old = resolved
pre-commit state of the commit's own keys, new = one replay step over
it), and a ``compact_deltas`` commit folds a ZERO delta (pure storage
reorganization; its changes were counted commit-by-commit). The
maintained view therefore equals a full recompute at EVERY commit of a
COW chain, a MOR chain, or any mix — including at a delta-bearing
head (pinned by pytest).

Scale: per-commit cost ∝ the commit's own write amplification (its
touched partitions), never table size; the view itself is one row per
group — an aggregate view with 10^9 groups should be a lake table, not
a matview, and the per-commit view materialization is bounded by that
group cardinality by construction. Commits whose previous-version files
were compacted away (or a truncate) route to a full recompute at that
manifest — correctness never depends on retained history.

View storage: one parquet per applied manifest id under ``view_root``
(``view-<cid>.parquet``), written tmp→rename with an attempt-unique tmp
suffix; refresh resumes from the newest view file and re-running it is
a no-op (exactly-once, same contract as the lake itself).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Sequence
import shutil
import tempfile
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from chomper_ray.stages.merge import INTERNAL_DELETED
from chomper_ray.state.lake import (LakeTable, committed_epochs,
                                    load_manifest, manifest_has_deltas,
                                    materialize_mor_resolved,
                                    plan_commit_diff)


class MaterializedAgg:
    """Grouped additive aggregate view: ``group_cols`` → ``n_live``
    (live-row count) + ``sum_<c>`` for each contribution column.

    ``contrib(df) -> df`` maps live lake rows to ``group_cols`` +
    integer value columns (``value_cols``); it runs inside
    ``map_batches`` and must be deterministic and row-local.
    """

    def __init__(self, lake: LakeTable, view_root: str | Path,
                 contrib: Callable[[pd.DataFrame], pd.DataFrame],
                 group_cols: Sequence[str], value_cols: Sequence[str],
                 read_columns: Sequence[str] | None = None):
        self.lake = lake
        self.view_root = Path(view_root)
        self.view_root.mkdir(parents=True, exist_ok=True)
        self.contrib = contrib
        self.group_cols = list(group_cols)
        self.value_cols = list(value_cols)
        self.read_columns = list(read_columns) if read_columns else None
        self._sum_cols = [f"sum_{c}" for c in self.value_cols]

    # -- storage ----------------------------------------------------------
    def _view_path(self, cid: int) -> Path:
        return self.view_root / f"view-{cid:06d}.parquet"

    def applied_commits(self) -> list[int]:
        return sorted(int(p.stem.split("-")[1])
                      for p in self.view_root.glob("view-*.parquet"))

    def view(self, cid: int | None = None) -> pd.DataFrame:
        """Current (or historical) view state — one row per group."""
        done = self.applied_commits()
        if not done:
            return pd.DataFrame(
                columns=self.group_cols + ["n_live"] + self._sum_cols)
        cid = done[-1] if cid is None else cid
        return pq.read_table(self._view_path(cid)).to_pandas()

    def _write_view(self, cid: int, df: pd.DataFrame) -> None:
        final = self._view_path(cid)
        if final.exists():
            return
        tmp = final.with_suffix(f".parquet.tmp-{uuid.uuid4().hex[:8]}")
        df = df.sort_values(self.group_cols, kind="stable") \
            .reset_index(drop=True)
        for c in ["n_live"] + self._sum_cols:
            df[c] = df[c].astype("int64")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
        tmp.replace(final)

    # -- contribution scans -------------------------------------------------
    def _contrib_ds(self, files: list[str], sign: int):
        """Signed per-group contribution partials over LIVE rows of the
        given partition files — the combiner shape: one row per group
        per block rides the downstream aggregation."""
        import ray.data as rd

        contrib, gcols, vcols = self.contrib, self.group_cols, self.value_cols
        read_cols = self.read_columns
        if read_cols is not None:
            read_cols = list(dict.fromkeys([*read_cols, INTERNAL_DELETED]))

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            df = df[~df[INTERNAL_DELETED].astype(bool)].copy()
            out = contrib(df)
            out = out[gcols + vcols].copy()
            out["n_live"] = 1
            g = out.groupby(gcols, sort=False, dropna=False).sum() \
                .reset_index()
            for c in vcols + ["n_live"]:
                g[c] = (g[c] * sign).astype("int64")
            return g

        # columns= + partitioning=None together hit a Ray bug
        # (UnboundLocalError — same note as LakeTable.read); an explicit
        # column list prunes the hive column anyway
        if read_cols is not None:
            ds = rd.read_parquet(files, columns=read_cols)
        else:
            ds = rd.read_parquet(files, partitioning=None)
        return ds.map_batches(partial, batch_format="pandas")

    def _fold(self, parts: list[pd.DataFrame]) -> pd.DataFrame:
        all_rows = pd.concat(parts, ignore_index=True) if parts else \
            pd.DataFrame(columns=self.group_cols + self.value_cols
                         + ["n_live"])
        if not len(all_rows):
            return pd.DataFrame(
                columns=self.group_cols + ["n_live"] + self._sum_cols)
        g = all_rows.groupby(self.group_cols, sort=False, dropna=False) \
            .sum().reset_index()
        g = g[g["n_live"] > 0].reset_index(drop=True)
        g = g.rename(columns={c: f"sum_{c}" for c in self.value_cols})
        return g[self.group_cols + ["n_live"] + self._sum_cols]

    def _scan_to_partials(self, files: list[str], sign: int) \
            -> pd.DataFrame:
        """Run the distributed partial scan and collect the per-block
        group partials (bounded by groups × blocks — view-cardinality
        objects, never raw rows)."""
        if not files:
            return pd.DataFrame(columns=self.group_cols + self.value_cols
                                + ["n_live"])
        return self._contrib_ds(files, sign).to_pandas()

    # -- maintenance --------------------------------------------------------
    def _full_recompute(self, cid: int) -> pd.DataFrame:
        man = load_manifest(self.lake.root, cid)
        view_cols = pd.DataFrame(columns=self.group_cols + self.value_cols
                                 + ["n_live"])
        scratch = None
        if manifest_has_deltas(man):
            # resolve pending merge-on-read deltas so the recompute sees
            # the manifest's TRUE state, not stale bases
            scratch = tempfile.mkdtemp(prefix="chomper_mv_full_")
            files = materialize_mor_resolved(
                self.lake.root, man, self.lake._mor_kwargs(), scratch)
        else:
            files = [str(self.lake.root / v["file"])
                     for _, v in sorted(man["partitions"].items())
                     if v.get("file")]
        try:
            parts = self._scan_to_partials(files, +1)
        finally:
            if scratch is not None:
                shutil.rmtree(scratch, ignore_errors=True)
        return self._fold([view_cols, parts])

    def refresh(self) -> pd.DataFrame:
        """Apply every unapplied manifest commit in chain order; returns
        the final view. Idempotent: re-running with nothing new is a
        pure read."""
        from chomper_ray.state.fs import require_local_lake_root

        require_local_lake_root(self.lake, type(self).__name__)
        cids = committed_epochs(self.lake.root)
        if not cids:
            return self.view()
        done = set(self.applied_commits())
        root = self.lake.root
        prev_cid = None
        current = None
        for cid in cids:
            if cid in done:
                prev_cid = cid
                current = None  # lazy-load on next delta
                continue
            man = load_manifest(root, cid)
            if man.get("truncated") or not man["partitions"]:
                new_view = self._fold([])
                self._write_view(cid, new_view)
                current, prev_cid = new_view, cid
                continue
            prev_man = load_manifest(root, prev_cid) \
                if prev_cid is not None else None
            # one commit's ± sides — uniform across COW / merge-on-read
            # (key-restricted materialized diff) / compaction (zero)
            new_files, old_files, missing_old, scratch = plan_commit_diff(
                self.lake, man, prev_man, prev_cid, cid,
                scratch_prefix="chomper_mv_diff_")
            try:
                if missing_old:
                    new_view = self._full_recompute(cid)
                else:
                    if current is None:
                        current = self.view(prev_cid) \
                            if prev_cid is not None else self._fold([])
                    base = current.rename(
                        columns={f"sum_{c}": c for c in self.value_cols})
                    parts = [base[self.group_cols + self.value_cols
                                  + ["n_live"]]] if len(base) else []
                    parts.append(self._scan_to_partials(new_files, +1))
                    parts.append(self._scan_to_partials(old_files, -1))
                    new_view = self._fold(parts)
            finally:
                if scratch is not None:
                    shutil.rmtree(scratch, ignore_errors=True)
            self._write_view(cid, new_view)
            current, prev_cid = new_view, cid
        return self.view()


class MaterializedTopK:
    """Maintained TOP-K ROWS per group (``ORDER BY value
    [DESC|ASC], key`` semantics) — the row-level sibling of
    ``MaterializedExtrema`` (k = 1 over a scalar), for the "k freshest
    pages per domain" / "k best-quality docs per source" views a CDC
    corpus serves continuously.

    Maintenance per commit:

    - the NEW side reduces to per-group top-k candidates (per-block
      top-k partials, driver-folded — view-cardinality objects);
    - the OLD side is filtered IN-TASK against the broadcast current
      top-k (view-sized, k rows per group), returning only the touched
      (group, key) pairs that are actually IN the view — so even the
      copy-on-write whole-partition diff ships ≤ k rows per group back;
    - fold: drop touched pairs from the current top-k, merge the new
      candidates (a key on both sides is an update), re-rank; if the
      group still holds ``min(k, n_live)`` rows the fold is exact —
      otherwise a previously-unseen row may have entered from below
      the old cut and only the data knows which: the group is
      RESCANNED (one distributed scan restricted to the affected
      groups, resolved state at a merge-on-read head included).

    ``n_ranked`` (rankable live rows per group) rides along additively
    (exact), which together with the CUT CHECK makes the fold sound:
    a group rescans when its fold under-fills (candidates <
    min(k, n_ranked) — a removed member has no local replacement) OR
    when the folded k-th row ranks strictly below the OLD view's k-th
    row (a touched row re-entering with a lowered value, or a new tie
    with a larger key, must not silently occupy the slot of an unseen
    row that lay just below the old cut). Ties resolve
    deterministically by ascending key (SQL ``ROW_NUMBER() OVER
    (PARTITION BY g ORDER BY v DESC, key)`` parity).

    ``contrib(df) -> df`` must return ``group_cols`` + ``value_col`` +
    the LAKE KEY column (identity is what removal is keyed on). Storage
    and commit-walk semantics follow the other views (one parquet per
    applied commit, ``plan_commit_diff`` uniform across COW / MOR /
    compaction-zero, full recompute on history gaps).
    """

    def __init__(self, lake: LakeTable, view_root: str | Path,
                 contrib: Callable[[pd.DataFrame], pd.DataFrame],
                 group_cols: Sequence[str], value_col: str, k: int,
                 ascending: bool = False,
                 read_columns: Sequence[str] | None = None):
        self.lake = lake
        self.view_root = Path(view_root)
        self.view_root.mkdir(parents=True, exist_ok=True)
        self.contrib = contrib
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.k = int(k)
        if self.k < 1:
            raise ValueError("k must be >= 1")
        self.ascending = bool(ascending)
        self.key_col = lake.key
        self.read_columns = list(read_columns) if read_columns else None
        self.last_rescans: list[tuple[int, int]] = []

    # -- storage ---------------------------------------------------------------
    def _view_path(self, cid: int) -> Path:
        return self.view_root / f"view-{cid:06d}.parquet"

    def applied_commits(self) -> list[int]:
        return sorted(int(p.stem.split("-")[1])
                      for p in self.view_root.glob("view-*.parquet"))

    def _row_cols(self) -> list[str]:
        return self.group_cols + [self.key_col, self.value_col, "rank"]

    def _empty_rows(self) -> pd.DataFrame:
        return pd.DataFrame(columns=self._row_cols())

    def _empty_counts(self) -> pd.DataFrame:
        return pd.DataFrame(columns=self.group_cols + ["n_ranked"])

    def view(self, cid: int | None = None) -> pd.DataFrame:
        """Current (or historical) top-k rows — ``rank`` is 1-based
        within the group."""
        rows, _ = self._load(cid)
        return rows

    def _load(self, cid: int | None = None) \
            -> tuple[pd.DataFrame, pd.DataFrame]:
        done = self.applied_commits()
        if not done:
            return self._empty_rows(), self._empty_counts()
        cid = done[-1] if cid is None else cid
        t = pq.read_table(self._view_path(cid)).to_pandas()
        rows = t[t["rank"] > 0][self._row_cols()].reset_index(drop=True)
        counts = t.groupby(self.group_cols, sort=False, dropna=False) \
            ["n_ranked"].first().reset_index()
        return rows, counts

    def _write_view(self, cid: int, rows: pd.DataFrame,
                    counts: pd.DataFrame) -> None:
        """One file per commit: top-k rows joined with their group's
        rankable-row count (all-null groups carry no view presence,
        matching SQL row_number semantics)."""
        final = self._view_path(cid)
        if final.exists():
            return
        out = rows.merge(counts, on=self.group_cols, how="right")
        out["rank"] = pd.to_numeric(out["rank"], errors="coerce") \
            .fillna(0).astype("int64")
        out["n_ranked"] = out["n_ranked"].astype("int64")
        out = out.sort_values(self.group_cols + ["rank"], kind="stable") \
            .reset_index(drop=True)
        tmp = final.with_suffix(f".parquet.tmp-{uuid.uuid4().hex[:8]}")
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                       tmp)
        tmp.replace(final)

    # -- ranking ---------------------------------------------------------------
    def _rank(self, df: pd.DataFrame, k: int | None = None) \
            -> pd.DataFrame:
        """Deterministic per-group rank: value (desc unless ascending),
        ties by ascending key; null values never rank."""
        k = self.k if k is None else k
        df = df.dropna(subset=[self.value_col])
        if not len(df):
            return self._empty_rows()
        df = df.sort_values(
            [*self.group_cols, self.value_col, self.key_col],
            ascending=[True] * len(self.group_cols)
            + [self.ascending, True], kind="stable")
        df = df.copy()
        df["rank"] = df.groupby(self.group_cols, sort=False,
                                dropna=False).cumcount() + 1
        return df[df["rank"] <= k][self._row_cols()] \
            .reset_index(drop=True)

    # -- distributed partials ---------------------------------------------------
    def _read_ds(self, files: list[str]):
        import ray.data as rd

        read_cols = self.read_columns
        if read_cols is not None:
            read_cols = list(dict.fromkeys([*read_cols,
                                            INTERNAL_DELETED]))
            return rd.read_parquet(files, columns=read_cols)
        return rd.read_parquet(files, partitioning=None)

    def _scan_counts(self, files: list[str],
                     only_groups: pd.DataFrame | None = None) \
            -> pd.DataFrame:
        """Exact per-group RANKABLE (non-null value) live counts over
        ``files`` (per-block partials, driver-folded; stable int
        schema). Null-valued rows never rank, so counting them would
        make null-heavy groups look under-filled forever."""
        gcols, vcol, contrib = self.group_cols, self.value_col, \
            self.contrib
        if not files:
            return self._empty_counts()

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            df = df[~df[INTERNAL_DELETED].astype(bool)].copy()
            out = contrib(df).dropna(subset=[vcol])
            if only_groups is not None:
                out = out.merge(only_groups, on=gcols)
            g = out.groupby(gcols, sort=False, dropna=False) \
                .size().rename("n_ranked").reset_index()
            g["n_ranked"] = g["n_ranked"].astype("int64")
            return g

        parts = self._read_ds(files).map_batches(
            partial, batch_format="pandas").to_pandas()
        if not len(parts):
            return self._empty_counts()
        return parts.groupby(gcols, sort=False, dropna=False) \
            ["n_ranked"].sum().astype("int64").reset_index()

    def _scan_rows(self, files: list[str], mode: str,
                   cur_rows: pd.DataFrame | None = None,
                   only_groups: pd.DataFrame | None = None) \
            -> pd.DataFrame:
        """Row partials over LIVE rows of ``files``.
        mode='topk': per-block per-group top-k candidates (driver
        re-ranks). mode='touched': rows whose (group, key) is in the
        broadcast ``cur_rows`` view — ≤ k per group by construction.
        ``only_groups`` additionally restricts (rescan path)."""
        gcols, key, vcol = self.group_cols, self.key_col, self.value_col
        if not files:
            return self._empty_rows()
        contrib, k, asc = self.contrib, self.k, self.ascending
        pair_cols = gcols + [key]
        pairs = cur_rows[pair_cols] if cur_rows is not None else None

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            df = df[~df[INTERNAL_DELETED].astype(bool)].copy()
            out = contrib(df)
            if only_groups is not None:
                out = out.merge(only_groups, on=gcols)
            if mode == "touched":
                # empty view -> nothing can be touched (and an empty
                # object-dtype merge against typed keys would raise)
                out = out.iloc[0:0] if not len(pairs) \
                    else out.merge(pairs, on=pair_cols)
            else:
                out = out.dropna(subset=[vcol])
                if len(out):
                    out = out.sort_values(
                        [*gcols, vcol, key],
                        ascending=[True] * len(gcols) + [asc, True],
                        kind="stable")
                    out = out.groupby(gcols, sort=False, dropna=False) \
                        .head(k)
            return out[pair_cols + [vcol]]

        rows = self._read_ds(files).map_batches(
            partial, batch_format="pandas").to_pandas()
        if not len(rows):
            return self._empty_rows()
        if mode == "topk":
            return self._rank(rows)
        return rows.assign(rank=0)[self._row_cols()] \
            .reset_index(drop=True)

    # -- maintenance -------------------------------------------------------------
    def _files_at(self, cid: int) -> tuple[list[str], str | None]:
        man = load_manifest(self.lake.root, cid)
        if manifest_has_deltas(man):
            scratch = tempfile.mkdtemp(prefix="chomper_tk_full_")
            return materialize_mor_resolved(
                self.lake.root, man, self.lake._mor_kwargs(),
                scratch), scratch
        return [str(self.lake.root / v["file"])
                for _, v in sorted(man["partitions"].items())
                if v.get("file")], None

    def _full_recompute(self, cid: int) \
            -> tuple[pd.DataFrame, pd.DataFrame]:
        files, scratch = self._files_at(cid)
        try:
            return (self._scan_rows(files, "topk"),
                    self._scan_counts(files))
        finally:
            if scratch is not None:
                shutil.rmtree(scratch, ignore_errors=True)

    def _apply_commit(self, cur_rows, cur_counts, new_files, old_files) \
            -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
        """Returns (rows, counts, rescan_groups)."""
        gcols, key, vcol = self.group_cols, self.key_col, self.value_col
        new_rows = self._scan_rows(new_files, "topk")
        new_counts = self._scan_counts(new_files)
        old_rows = self._scan_rows(old_files, "touched",
                                   cur_rows=cur_rows)
        old_counts = self._scan_counts(old_files)
        counts = cur_counts.merge(
            new_counts.rename(columns={"n_ranked": "n_new"}),
            on=gcols, how="outer").merge(
            old_counts.rename(columns={"n_ranked": "n_old"}),
            on=gcols, how="outer")
        for c in ["n_ranked", "n_new", "n_old"]:
            if c not in counts.columns:
                counts[c] = 0
            counts[c] = pd.to_numeric(counts[c], errors="coerce") \
                .fillna(0).astype("int64")
        counts["n_ranked"] = counts["n_ranked"] + counts["n_new"] \
            - counts["n_old"]
        counts = counts[counts["n_ranked"] > 0][gcols + ["n_ranked"]] \
            .reset_index(drop=True)
        # remove every touched pair from the current view, then merge
        # the new candidates (a key on both sides is an update; a new
        # key not in the old view just competes)
        tparts = [f for f in (old_rows[gcols + [key]],
                              new_rows[gcols + [key]]) if len(f)]
        touched = pd.concat(tparts, ignore_index=True).drop_duplicates() \
            if tparts else old_rows[gcols + [key]]
        keep = cur_rows.merge(touched, on=gcols + [key], how="left",
                              indicator=True)
        kept = cur_rows[keep["_merge"] == "left_only"]
        cparts = [f for f in (kept[gcols + [key, vcol]],
                              new_rows[gcols + [key, vcol]]) if len(f)]
        cand = pd.concat(cparts, ignore_index=True) if cparts \
            else new_rows[gcols + [key, vcol]]
        ranked = self._rank(cand)
        # under-fill check: a group whose fold holds fewer than
        # min(k, n_ranked) rows lost a member it cannot replace locally
        have = ranked.groupby(gcols, sort=False, dropna=False) \
            .size().rename("have").reset_index()
        chk = counts.merge(have, on=gcols, how="left")
        chk["have"] = pd.to_numeric(chk["have"], errors="coerce") \
            .fillna(0).astype("int64")
        chk["want"] = chk["n_ranked"].clip(upper=self.k)
        rescan = chk.loc[chk["have"] < chk["want"], gcols] \
            .reset_index(drop=True)
        # cut check: when the OLD view was full, unseen rows may exist
        # just below its k-th row; the fold is exact only if its k-th
        # row still ranks at-or-above that old cut row — a touched row
        # re-entering with a LOWERED value (or a new tie with a larger
        # key) must not silently occupy an unseen row's slot
        old_cut = cur_rows[cur_rows["rank"] == self.k]
        if len(old_cut):
            kth = ranked[ranked["rank"] == self.k]
            chk2 = kth.merge(
                old_cut[gcols + [key, vcol]].rename(
                    columns={key: "_cutk", vcol: "_cutv"}), on=gcols)
            if len(chk2):
                if self.ascending:
                    worse_val = chk2[vcol] > chk2["_cutv"]
                else:
                    worse_val = chk2[vcol] < chk2["_cutv"]
                tie_worse = (chk2[vcol] == chk2["_cutv"]) \
                    & (chk2[key] > chk2["_cutk"])
                below = worse_val | tie_worse
                if below.any():
                    rescan = pd.concat(
                        [rescan, chk2.loc[below, gcols]],
                        ignore_index=True).drop_duplicates() \
                        .reset_index(drop=True)
        if len(rescan):
            hit = ranked.merge(rescan, on=gcols, how="left",
                               indicator=True)
            ranked = ranked[hit["_merge"] == "left_only"] \
                .reset_index(drop=True)
        return ranked, counts, rescan

    def refresh(self) -> pd.DataFrame:
        """Apply every unapplied manifest commit in chain order;
        idempotent. Returns the current top-k rows."""
        from chomper_ray.state.fs import require_local_lake_root

        require_local_lake_root(self.lake, type(self).__name__)
        cids = committed_epochs(self.lake.root)
        if not cids:
            return self.view()
        done = set(self.applied_commits())
        root = self.lake.root
        prev_cid = None
        cur = None  # (rows, counts)
        for cid in cids:
            if cid in done:
                prev_cid = cid
                cur = None
                continue
            man = load_manifest(root, cid)
            if man.get("truncated") or not man["partitions"]:
                self._write_view(cid, self._empty_rows(),
                                 self._empty_counts())
                cur, prev_cid = (self._empty_rows(),
                                 self._empty_counts()), cid
                continue
            prev_man = load_manifest(root, prev_cid) \
                if prev_cid is not None else None
            new_files, old_files, missing_old, scratch = plan_commit_diff(
                self.lake, man, prev_man, prev_cid, cid,
                scratch_prefix="chomper_tk_diff_")
            try:
                if missing_old:
                    rows, counts = self._full_recompute(cid)
                else:
                    if cur is None:
                        cur = self._load(prev_cid) \
                            if prev_cid is not None else \
                            (self._empty_rows(), self._empty_counts())
                    rows, counts, rescan = self._apply_commit(
                        cur[0], cur[1], new_files, old_files)
                    if len(rescan):
                        self.last_rescans.append((cid, len(rescan)))
                        files, rscratch = self._files_at(cid)
                        try:
                            er = self._scan_rows(files, "topk",
                                                 only_groups=rescan)
                        finally:
                            if rscratch is not None:
                                shutil.rmtree(rscratch,
                                              ignore_errors=True)
                        if len(er):
                            rows = er if not len(rows) else pd.concat(
                                [rows, er], ignore_index=True)
            finally:
                if scratch is not None:
                    shutil.rmtree(scratch, ignore_errors=True)
            self._write_view(cid, rows, counts)
            cur, prev_cid = (rows, counts), cid
        return self.view()


class MaterializedDistinct:
    """Grouped EXACT ``COUNT(DISTINCT value)`` view over a LakeTable,
    maintained per commit — the second non-self-maintainable aggregate
    family (after min/max), closed WITHOUT rescans: distinct counts
    become self-maintainable once the view keeps per-(group, value)
    SUPPORT counts (how many live rows carry each value), which are
    plain additive integers. A commit's diff folds as ±1 support per
    touched row; a value's last supporter leaving drops its support row
    to 0 and the distinct count with it — no data-dependent blind spot,
    so no rescan path at all.

    Implementation: the support table IS a ``MaterializedAgg`` keyed by
    ``group_cols + [value_col]`` with no sum columns (``n_live`` per
    (group, value) = the support count), so storage layout, commit
    walking, COW/MOR/compaction-zero diff planning, exactly-once view
    files and resume are all inherited verbatim. ``view()`` projects it
    to one row per group: ``n_distinct`` (support rows with a non-null
    value — SQL ``COUNT(DISTINCT x)`` ignores nulls) + ``n_live``
    (all live rows, nulls included).

    Scale: view state ∝ Σ_g |distinct values in g| — the standard IVM
    auxiliary-relation bound. A distinct count over an unbounded-
    cardinality column (e.g. raw url) is the lake itself; use this for
    the bounded enumerations a rollup serves (langs per domain, status
    codes per host, shards per source).
    """

    def __init__(self, lake: LakeTable, view_root: str | Path,
                 contrib: Callable[[pd.DataFrame], pd.DataFrame],
                 group_cols: Sequence[str], value_col: str,
                 read_columns: Sequence[str] | None = None):
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self._agg = MaterializedAgg(
            lake, view_root, contrib,
            group_cols=self.group_cols + [value_col], value_cols=[],
            read_columns=read_columns)

    def applied_commits(self) -> list[int]:
        return self._agg.applied_commits()

    def support(self, cid: int | None = None) -> pd.DataFrame:
        """The auxiliary per-(group, value) live support counts."""
        return self._agg.view(cid)

    def _project(self, support: pd.DataFrame) -> pd.DataFrame:
        gcols, vcol = self.group_cols, self.value_col
        if not len(support):
            return pd.DataFrame(columns=gcols + ["n_distinct", "n_live"])
        n = support.groupby(gcols, sort=False, dropna=False)["n_live"] \
            .sum().reset_index()
        nn = support.dropna(subset=[vcol])
        d = nn.groupby(gcols, sort=False, dropna=False).size() \
            .rename("n_distinct").reset_index()
        out = d.merge(n, on=gcols, how="right")
        out["n_distinct"] = pd.to_numeric(out["n_distinct"],
                                          errors="coerce") \
            .fillna(0).astype("int64")
        out["n_live"] = out["n_live"].astype("int64")
        return out[gcols + ["n_distinct", "n_live"]] \
            .sort_values(gcols, kind="stable").reset_index(drop=True)

    def view(self, cid: int | None = None) -> pd.DataFrame:
        """One row per group: exact distinct-value count + live rows."""
        return self._project(self._agg.view(cid))

    def refresh(self) -> pd.DataFrame:
        """Apply every unapplied manifest commit; idempotent."""
        return self._project(self._agg.refresh())


class MaterializedQuantiles:
    """Grouped EXACT quantiles (``percentile_cont`` semantics, any list
    of q's) over a discrete value column, maintained per commit WITHOUT
    rescans — the third non-self-maintainable aggregate family, closed
    the ``MaterializedDistinct`` way: the view keeps per-(group, value)
    SUPPORT counts (plain additive integers; the support table IS a
    ``MaterializedAgg`` keyed by ``group_cols + [value_col]``, so
    COW/MOR/compaction-zero diff planning, exactly-once view files and
    resume are inherited verbatim). The support rows are the full
    VALUE MULTISET per group, so any quantile is computed exactly at
    read: sort the (value, count) rows, cumulative-sum the counts, and
    linearly interpolate at rank ``(n-1)·q`` — identical to SQL
    ``percentile_cont(q) WITHIN GROUP (ORDER BY value)``.

    Scale: view state ∝ Σ_g |distinct values in g| (the standard IVM
    auxiliary-relation bound). Right for bounded-cardinality metrics —
    token counts, sizes, latencies bucketed to ms, status codes — NOT
    raw floats of unbounded cardinality (bucket those in the contrib;
    quantiles are then exact over the buckets). Read cost is
    driver-side over the support table, proportional to its rows.

    SQL null semantics: null values never enter a quantile; a group
    whose live rows are ALL null keeps its row with NaN quantiles."""

    def __init__(self, lake: LakeTable, view_root: str | Path,
                 contrib: Callable[[pd.DataFrame], pd.DataFrame],
                 group_cols: Sequence[str], value_col: str,
                 qs: Sequence[float] = (0.5,),
                 read_columns: Sequence[str] | None = None):
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.qs = [float(q) for q in qs]
        if not all(0.0 <= q <= 1.0 for q in self.qs):
            raise ValueError(f"quantiles must be in [0, 1]: {self.qs}")
        self._agg = MaterializedAgg(
            lake, view_root, contrib,
            group_cols=self.group_cols + [value_col], value_cols=[],
            read_columns=read_columns)

    def applied_commits(self) -> list[int]:
        return self._agg.applied_commits()

    def support(self, cid: int | None = None) -> pd.DataFrame:
        """The auxiliary per-(group, value) live support counts."""
        return self._agg.view(cid)

    def _qcol(self, q: float) -> str:
        return "p" + f"{q * 100:g}".replace(".", "_")

    def _project(self, support: pd.DataFrame) -> pd.DataFrame:
        gcols, vcol = self.group_cols, self.value_col
        qcols = [self._qcol(q) for q in self.qs]
        if not len(support):
            return pd.DataFrame(columns=gcols + ["n_live"] + qcols)
        groups = support.groupby(gcols, sort=True, dropna=False)[
            "n_live"].sum().reset_index()
        nn = support.dropna(subset=[vcol]) \
            .sort_values(gcols + [vcol], kind="stable")
        per_group: dict = {}
        for keys, g in nn.groupby(gcols, sort=False, dropna=False):
            vals = g[vcol].to_numpy(dtype=np.float64)
            cum = np.cumsum(g["n_live"].to_numpy(dtype=np.int64))
            n = int(cum[-1])
            row = []
            for q in self.qs:
                h = (n - 1) * q
                lo, hi = int(np.floor(h)), int(np.ceil(h))
                vlo = vals[np.searchsorted(cum, lo + 1)]
                vhi = vals[np.searchsorted(cum, hi + 1)]
                row.append(vlo + (h - lo) * (vhi - vlo))
            per_group[keys if isinstance(keys, tuple) else (keys,)] = row
        for i, c in enumerate(qcols):
            groups[c] = [
                per_group.get(tuple(k), [np.nan] * len(qcols))[i]
                for k in groups[gcols].itertuples(index=False)]
        groups["n_live"] = groups["n_live"].astype("int64")
        return groups[gcols + ["n_live"] + qcols] \
            .sort_values(gcols, kind="stable").reset_index(drop=True)

    def view(self, cid: int | None = None) -> pd.DataFrame:
        """One row per group: live-row count + one column per q."""
        return self._project(self._agg.view(cid))

    def refresh(self) -> pd.DataFrame:
        """Apply every unapplied manifest commit; idempotent."""
        return self._project(self._agg.refresh())


class MaterializedSessions:
    """Gap-based SESSION WINDOWS maintained per commit — streaming
    sessionization under CDC. Tumbling/hopping windows are row-local
    (a row's window is a function of the row), but a session's extent
    depends on its NEIGHBORS: one new event can extend a session,
    split nothing, or MERGE two sessions; an LWW update/delete can do
    the reverse. So sessions are maintained with the affected-group
    rescan (the ``MaterializedExtrema`` contract): per commit, the
    groups appearing on EITHER diff side re-sessionize from the live
    state — one distributed scan restricted to those groups plus one
    co-locating shuffle of only their rows — while untouched groups'
    session rows carry forward unchanged. Rescan cost ∝ the touched
    groups' live rows, never the corpus.

    ``contrib(df) -> [group, ts, tie]`` is row-local (``tie`` breaks
    equal timestamps deterministically). View rows: ``group,
    session_id`` (1-based in (ts, tie) order), ``session_start,
    session_end, n_events`` — a new session starts when the gap from
    the previous event exceeds ``gap_s`` (strict), SQL
    ``lag()``-window parity. View state ∝ total sessions (the IVM
    auxiliary bound); ``last_rescans`` records (cid, n_groups) per
    refresh for cost assertions."""

    _SESSION_COLS = ["session_id", "session_start", "session_end",
                     "n_events"]

    def __init__(self, lake: LakeTable, view_root: str | Path,
                 contrib: Callable[[pd.DataFrame], pd.DataFrame],
                 group_col: str, ts_col: str, tie_col: str,
                 gap_s: float,
                 read_columns: Sequence[str] | None = None):
        self.lake = lake
        self.view_root = Path(view_root)
        self.view_root.mkdir(parents=True, exist_ok=True)
        self.contrib = contrib
        self.group_col = group_col
        self.ts_col = ts_col
        self.tie_col = tie_col
        self.gap_s = float(gap_s)
        self.read_columns = list(read_columns) if read_columns else None
        self.last_rescans: list[tuple[int, int]] = []

    # -- storage ----------------------------------------------------------
    def _view_path(self, cid: int) -> Path:
        return self.view_root / f"view-{cid:06d}.parquet"

    def applied_commits(self) -> list[int]:
        return sorted(int(p.stem.split("-")[1])
                      for p in self.view_root.glob("view-*.parquet"))

    def _empty_view(self) -> pd.DataFrame:
        return pd.DataFrame(columns=[self.group_col]
                            + self._SESSION_COLS)

    def view(self, cid: int | None = None) -> pd.DataFrame:
        done = self.applied_commits()
        if not done:
            return self._empty_view()
        cid = done[-1] if cid is None else cid
        return pq.read_table(self._view_path(cid)).to_pandas()

    def _write_view(self, cid: int, df: pd.DataFrame) -> None:
        final = self._view_path(cid)
        if final.exists():
            return
        df = df.sort_values([self.group_col, "session_id"],
                            kind="stable").reset_index(drop=True)
        for c in ("session_id", "n_events"):
            df[c] = df[c].astype("int64")
        tmp = final.with_suffix(f".parquet.tmp-{uuid.uuid4().hex[:8]}")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       tmp)
        tmp.replace(final)

    # -- scans ------------------------------------------------------------
    def _prep_ds(self, files: list[str], only_groups):
        import ray.data as rd

        contrib = self.contrib
        gcol, tcol, kcol = self.group_col, self.ts_col, self.tie_col
        keep = frozenset(only_groups) if only_groups is not None \
            else None

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            df = df[~df[INTERNAL_DELETED].astype(bool)]
            out = contrib(df)[[gcol, tcol, kcol]]
            if keep is not None:
                out = out[out[gcol].isin(keep)]
            return out.reset_index(drop=True)

        read_cols = self.read_columns
        if read_cols is not None:
            # the tombstone column is filtered in-task, so it must ride
            # the pruned read even when the caller didn't list it
            read_cols = list(dict.fromkeys([*read_cols,
                                            INTERNAL_DELETED]))
            ds = rd.read_parquet(files, columns=read_cols)
        else:
            ds = rd.read_parquet(files, partitioning=None)
        return ds.map_batches(prep, batch_format="pandas")

    def _session_rows(self, files: list[str], only_groups) \
            -> pd.DataFrame:
        """Per-(group, session) rows over the live rows of ``files``,
        restricted to ``only_groups`` (None = all). One co-locating
        shuffle of the scanned rows; per-group work is a vectorized
        sort + diff + cumsum, never per-row Python."""
        if not files:
            return self._empty_view()
        gcol, tcol, kcol, gap = (self.group_col, self.ts_col,
                                 self.tie_col, self.gap_s)

        def per_group(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values([tcol, kcol], kind="stable")
            dt = g[tcol].diff()
            gaps = dt.dt.total_seconds() if hasattr(dt, "dt") else dt
            sid = ((gaps > gap) | gaps.isna()).cumsum()
            agg = g.groupby(sid).agg(
                session_start=(tcol, "min"), session_end=(tcol, "max"),
                n_events=(tcol, "size")).reset_index(drop=True)
            agg.insert(0, "session_id",
                       np.arange(1, len(agg) + 1, dtype=np.int64))
            agg.insert(0, gcol, g[gcol].iloc[0])
            return agg

        out = self._prep_ds(files, only_groups).groupby(gcol) \
            .map_groups(per_group, batch_format="pandas").to_pandas()
        return out if len(out) else self._empty_view()

    def _affected_groups(self, new_files: list[str],
                         old_files: list[str]) -> set:
        """Groups whose (ts, tie) contribution MULTISET changed between
        the commit's old and new sides. Each side folds per-group
        signed partials — row count plus two independent wrapping
        64-bit hash sums of the (ts, tie) rows — so groups identical
        on both sides cancel EXACTLY (the ``MaterializedAgg``
        cancellation argument applied to set membership): a COW
        whole-partition diff rescans only the truly-changed groups,
        not every group the partition happens to hold. A false cancel
        would need a same-count 128-bit fingerprint collision."""
        gcol, tcol, kcol = self.group_col, self.ts_col, self.tie_col

        def fingerprint(df: pd.DataFrame) -> pd.DataFrame:
            rows = df[[tcol, kcol]]
            # int64 VIEW of the siphash so every later sum/reindex
            # stays integer-exact (wrapping is fine; float64 would
            # round 64-bit values and could false-cancel)
            return pd.DataFrame({
                gcol: df[gcol].values,
                "n": np.int64(1),
                "h1": pd.util.hash_pandas_object(rows, index=False)
                .values.view("int64"),
                "h2": pd.util.hash_pandas_object(
                    rows, index=False,
                    hash_key="chomper_ms_fpk2!").values.view("int64"),
            }).groupby(gcol, dropna=False, sort=False) \
                .sum().reset_index()

        def side(files: list[str]) -> pd.DataFrame:
            cols = {"n": "int64", "h1": "int64", "h2": "int64"}
            if not files:
                return pd.DataFrame(
                    {c: pd.Series(dtype=d) for c, d in cols.items()})
            parts = self._prep_ds(files, None).map_batches(
                fingerprint, batch_format="pandas").to_pandas()
            if not len(parts):
                return pd.DataFrame(
                    {c: pd.Series(dtype=d) for c, d in cols.items()})
            return parts.groupby(gcol, dropna=False, sort=False) \
                .sum()[list(cols)]

        a, b = side(new_files), side(old_files)
        idx = a.index.union(b.index)
        # reindex with fill_value keeps int64 exact (an outer merge
        # would coerce missing rows to float64 and round the sums)
        a = a.reindex(idx, fill_value=0)
        b = b.reindex(idx, fill_value=0)
        changed = (a != b).any(axis=1)
        return set(idx[changed.values].tolist())

    def _files_at(self, cid: int) -> tuple[list[str], str | None]:
        man = load_manifest(self.lake.root, cid)
        if manifest_has_deltas(man):
            scratch = tempfile.mkdtemp(prefix="chomper_ms_full_")
            return materialize_mor_resolved(
                self.lake.root, man, self.lake._mor_kwargs(),
                scratch), scratch
        return [str(self.lake.root / v["file"])
                for _, v in sorted(man["partitions"].items())
                if v.get("file")], None

    # -- maintenance --------------------------------------------------------
    def _full_recompute(self, cid: int) -> pd.DataFrame:
        files, scratch = self._files_at(cid)
        try:
            return self._session_rows(files, None)
        finally:
            if scratch is not None:
                shutil.rmtree(scratch, ignore_errors=True)

    def refresh(self) -> pd.DataFrame:
        """Apply every unapplied manifest commit in chain order;
        idempotent. Appends (cid, rescanned-group count) to
        ``last_rescans``."""
        from chomper_ray.state.fs import require_local_lake_root

        require_local_lake_root(self.lake, type(self).__name__)
        cids = committed_epochs(self.lake.root)
        if not cids:
            return self.view()
        done = set(self.applied_commits())
        root = self.lake.root
        prev_cid = None
        current = None
        for cid in cids:
            if cid in done:
                prev_cid = cid
                current = None
                continue
            man = load_manifest(root, cid)
            if man.get("truncated") or not man["partitions"]:
                new_view = self._empty_view()
                self._write_view(cid, new_view)
                current, prev_cid = new_view, cid
                continue
            prev_man = load_manifest(root, prev_cid) \
                if prev_cid is not None else None
            new_files, old_files, missing_old, scratch = plan_commit_diff(
                self.lake, man, prev_man, prev_cid, cid,
                scratch_prefix="chomper_ms_diff_")
            try:
                if missing_old:
                    new_view = self._full_recompute(cid)
                    self.last_rescans.append((cid, -1))  # full
                else:
                    if current is None:
                        current = self.view(prev_cid) \
                            if prev_cid is not None else self._empty_view()
                    affected = self._affected_groups(new_files, old_files)
                    self.last_rescans.append((cid, len(affected)))
                    if not affected:
                        new_view = current
                    else:
                        carried = current[
                            ~current[self.group_col].isin(affected)]
                        files, fscratch = self._files_at(cid)
                        try:
                            fresh = self._session_rows(files, affected)
                        finally:
                            if fscratch is not None:
                                shutil.rmtree(fscratch,
                                              ignore_errors=True)
                        sides = [s for s in (carried, fresh) if len(s)]
                        new_view = pd.concat(sides, ignore_index=True) \
                            if sides else self._empty_view()
            finally:
                if scratch is not None:
                    shutil.rmtree(scratch, ignore_errors=True)
            self._write_view(cid, new_view)
            current, prev_cid = new_view, cid
        return self.view()


class MaterializedExtrema:
    """Grouped MIN/MAX view over a LakeTable, maintained per commit —
    the NON-self-maintainable aggregate family ``MaterializedAgg``
    deliberately excludes (a lowered maximum cannot be derived from
    the old view + the commit alone), closed with the classical
    affected-group rescan:

    Per commit, both diff sides reduce to per-group extrema partials
    (same distributed combiner shape as the additive view). For a max
    column, group by group:

    - the commit can only RAISE the max → fold in place
      (``max' = max(cur, new-side max)``);
    - the old side's max reaches the current max (the commit touched a
      row that may have BEEN the extremum) and the new side does not
      restore it → the true max may have dropped, and only the data
      knows where to: the group is RESCANNED (one distributed pruned
      scan over current state restricted to the affected groups).

    Rescans are bounded by the commit's touched groups and triggered
    only when an extremum-holding row is updated-down or deleted —
    the standard IVM trade for non-self-maintainable aggregates. The
    conservative trigger (extremum VALUE matched, even if another row
    ties) favors correctness over rescan avoidance; ``last_rescans``
    records each refresh's rescan groups for cost assertions.

    Everything else follows ``MaterializedAgg``: ``contrib`` is a
    row-local map to ``group_cols`` + value columns, commits fold via
    the uniform ``plan_commit_diff`` (copy-on-write, merge-on-read
    key-restricted diffs, compaction = zero delta), history gaps route
    to a full recompute, storage is one parquet per applied commit
    with the marker-last exactly-once contract. Value columns may be
    any ordered dtype pandas can group-max (numbers, timestamps,
    strings); SQL semantics for nulls (ignored; all-null group → null
    extremum).
    """

    def __init__(self, lake: LakeTable, view_root: str | Path,
                 contrib: Callable[[pd.DataFrame], pd.DataFrame],
                 group_cols: Sequence[str],
                 max_cols: Sequence[str] = (),
                 min_cols: Sequence[str] = (),
                 read_columns: Sequence[str] | None = None):
        if not max_cols and not min_cols:
            raise ValueError("need at least one max_cols or min_cols")
        self.lake = lake
        self.view_root = Path(view_root)
        self.view_root.mkdir(parents=True, exist_ok=True)
        self.contrib = contrib
        self.group_cols = list(group_cols)
        self.max_cols = list(max_cols)
        self.min_cols = list(min_cols)
        self.read_columns = list(read_columns) if read_columns else None
        self._ext_cols = [f"max_{c}" for c in self.max_cols] \
            + [f"min_{c}" for c in self.min_cols]
        self.last_rescans: list[tuple[int, int]] = []  # (cid, n_groups)

    # -- storage (same contract as MaterializedAgg) -------------------------
    def _view_path(self, cid: int) -> Path:
        return self.view_root / f"view-{cid:06d}.parquet"

    def applied_commits(self) -> list[int]:
        return sorted(int(p.stem.split("-")[1])
                      for p in self.view_root.glob("view-*.parquet"))

    def _empty_view(self) -> pd.DataFrame:
        return pd.DataFrame(columns=self.group_cols + ["n_live"]
                            + self._ext_cols)

    def view(self, cid: int | None = None) -> pd.DataFrame:
        done = self.applied_commits()
        if not done:
            return self._empty_view()
        cid = done[-1] if cid is None else cid
        return pq.read_table(self._view_path(cid)).to_pandas()

    def _write_view(self, cid: int, df: pd.DataFrame) -> None:
        final = self._view_path(cid)
        if final.exists():
            return
        tmp = final.with_suffix(f".parquet.tmp-{uuid.uuid4().hex[:8]}")
        df = df.sort_values(self.group_cols, kind="stable") \
            .reset_index(drop=True)
        df["n_live"] = df["n_live"].astype("int64")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
        tmp.replace(final)

    # -- distributed partials -----------------------------------------------
    def _side_partials(self, files: list[str],
                       only_groups: pd.DataFrame | None = None) \
            -> pd.DataFrame:
        """Exact per-group (n_live, max_*, min_*) over LIVE rows of the
        given files — per-block combiner partials folded driver-side
        (bounded by groups × blocks). ``only_groups`` restricts to the
        rescan set via an in-task semi-join."""
        import ray.data as rd

        gcols = self.group_cols
        if not files:
            return pd.DataFrame(columns=gcols + ["n_live"]
                                + self._ext_cols)
        contrib = self.contrib
        maxc, minc = self.max_cols, self.min_cols
        read_cols = self.read_columns
        if read_cols is not None:
            read_cols = list(dict.fromkeys([*read_cols, INTERNAL_DELETED]))

        def group_extrema(out: pd.DataFrame, specs, count_col=None):
            # per-column dropna before the groupby extremum: pandas
            # object-dtype (string) reductions break on mixed NaN/value
            # groups (the nan mask fills ±inf, which then meets a str)
            if count_col is None:
                base = out.groupby(gcols, sort=False, dropna=False) \
                    .size().rename("n_live").reset_index()
            else:
                base = out.groupby(gcols, sort=False, dropna=False)[
                    count_col].sum().rename("n_live").reset_index()
            for name, src, how in specs:
                s = out.dropna(subset=[src])
                if not len(s):
                    base[name] = pd.Series(dtype=out[src].dtype)
                    continue
                e = s.groupby(gcols, sort=False, dropna=False)[src] \
                    .agg(how).rename(name).reset_index()
                base = base.merge(e, on=gcols, how="left")
            return base

        block_specs = [(f"max_{c}", c, "max") for c in maxc] \
            + [(f"min_{c}", c, "min") for c in minc]
        fold_specs = [(f"max_{c}", f"max_{c}", "max") for c in maxc] \
            + [(f"min_{c}", f"min_{c}", "min") for c in minc]
        empty_cols = gcols + ["n_live"] + [s[0] for s in block_specs]

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            df = df[~df[INTERNAL_DELETED].astype(bool)].copy()
            out = contrib(df)
            if only_groups is not None:
                out = out.merge(only_groups, on=gcols)
            if not len(out):
                return pd.DataFrame(columns=empty_cols)
            return group_extrema(out, block_specs)

        if read_cols is not None:
            ds = rd.read_parquet(files, columns=read_cols)
        else:
            ds = rd.read_parquet(files, partitioning=None)
        parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
        if not len(parts):
            return pd.DataFrame(columns=gcols + ["n_live"]
                                + self._ext_cols)
        return group_extrema(parts, fold_specs, count_col="n_live")

    # -- fold algebra ---------------------------------------------------------
    def _apply_commit(self, cur: pd.DataFrame, new_p: pd.DataFrame,
                      old_p: pd.DataFrame) \
            -> tuple[pd.DataFrame, pd.DataFrame]:
        """Fold one commit's exact side partials into the view.
        Returns (folded_view, rescan_groups) — rescan rows carry the
        group key only; their extrema are recomputed from data."""
        gcols = self.group_cols
        m = cur.merge(new_p, on=gcols, how="outer",
                      suffixes=("", "_new")) \
            .merge(old_p.rename(columns={c: f"{c}_old"
                                         for c in old_p.columns
                                         if c not in gcols}),
                   on=gcols, how="outer")
        for c in ["n_live", "n_live_new", "n_live_old"]:
            if c not in m.columns:
                m[c] = 0
            m[c] = pd.to_numeric(m[c], errors="coerce") \
                .fillna(0).astype("int64")
        m["n_live"] = m["n_live"] + m["n_live_new"] - m["n_live_old"]
        m = m[m["n_live"] > 0].reset_index(drop=True)
        def cmp_ge(a: pd.Series, b: pd.Series) -> pd.Series:
            # a >= b where both present, else False — masked so NaN/NaT
            # never meets a value of another dtype in a comparison
            r = pd.Series(False, index=a.index)
            both = (~a.isna()) & (~b.isna())
            if both.any():
                r.loc[both] = (a[both] >= b[both]).astype(bool)
            return r

        need_rescan = pd.Series(False, index=m.index)
        for kind, cols in (("max", self.max_cols), ("min", self.min_cols)):
            for c in cols:
                v = f"{kind}_{c}"
                curv = m[v] if v in m.columns else pd.Series(
                    np.nan, index=m.index)
                newv = m.get(f"{v}_new", pd.Series(np.nan, index=m.index))
                oldv = m.get(f"{v}_old", pd.Series(np.nan, index=m.index))
                if kind == "max":
                    better, worse = newv, curv
                    restored = cmp_ge(newv, curv)
                    touched_ext = cmp_ge(oldv, curv)
                else:
                    better, worse = curv, newv
                    restored = cmp_ge(curv, newv)
                    touched_ext = cmp_ge(curv, oldv)
                # new value adopted when cur is absent or new beats it
                new_wins = curv.isna() | (cmp_ge(better, worse)
                                          & ~newv.isna())
                m[v] = curv.where(~new_wins, newv)
                need_rescan |= touched_ext & ~restored
        keep = gcols + ["n_live"] + self._ext_cols
        folded = m[keep].copy()
        rescan = m.loc[need_rescan, gcols].copy()
        return folded, rescan

    def _files_at(self, cid: int) -> tuple[list[str], str | None]:
        man = load_manifest(self.lake.root, cid)
        if manifest_has_deltas(man):
            scratch = tempfile.mkdtemp(prefix="chomper_mx_full_")
            return materialize_mor_resolved(
                self.lake.root, man, self.lake._mor_kwargs(),
                scratch), scratch
        return [str(self.lake.root / v["file"])
                for _, v in sorted(man["partitions"].items())
                if v.get("file")], None

    def _full_recompute(self, cid: int) -> pd.DataFrame:
        files, scratch = self._files_at(cid)
        try:
            p = self._side_partials(files)
        finally:
            if scratch is not None:
                shutil.rmtree(scratch, ignore_errors=True)
        return p[self.group_cols + ["n_live"] + self._ext_cols] \
            if len(p) else self._empty_view()

    def _run_rescan(self, cid: int, folded: pd.DataFrame,
                    rescan: pd.DataFrame) -> pd.DataFrame:
        files, scratch = self._files_at(cid)
        try:
            exact = self._side_partials(files, only_groups=rescan)
        finally:
            if scratch is not None:
                shutil.rmtree(scratch, ignore_errors=True)
        gcols = self.group_cols
        missing = rescan.merge(exact[gcols], on=gcols, how="left",
                               indicator=True)
        missing = missing[missing["_merge"] == "left_only"]
        if len(missing):
            raise ValueError(
                f"extrema rescan found no live rows for groups the "
                f"additive count says exist: {missing[gcols].to_dict()}")
        keep = folded.merge(rescan, on=gcols, how="left", indicator=True)
        folded = folded[keep["_merge"] == "left_only"].reset_index(
            drop=True)
        exact = exact[gcols + ["n_live"] + self._ext_cols]
        sides = [s for s in (folded, exact) if len(s)]
        if not sides:
            return self._empty_view()
        if len(sides) == 1:
            return sides[0].reset_index(drop=True)
        return pd.concat(sides, ignore_index=True)

    def refresh(self) -> pd.DataFrame:
        """Apply every unapplied manifest commit in chain order;
        idempotent. Appends each refresh's rescan count to
        ``last_rescans``."""
        from chomper_ray.state.fs import require_local_lake_root

        require_local_lake_root(self.lake, type(self).__name__)
        cids = committed_epochs(self.lake.root)
        if not cids:
            return self.view()
        done = set(self.applied_commits())
        root = self.lake.root
        prev_cid = None
        current = None
        for cid in cids:
            if cid in done:
                prev_cid = cid
                current = None
                continue
            man = load_manifest(root, cid)
            if man.get("truncated") or not man["partitions"]:
                new_view = self._empty_view()
                self._write_view(cid, new_view)
                current, prev_cid = new_view, cid
                continue
            prev_man = load_manifest(root, prev_cid) \
                if prev_cid is not None else None
            new_files, old_files, missing_old, scratch = plan_commit_diff(
                self.lake, man, prev_man, prev_cid, cid,
                scratch_prefix="chomper_mx_diff_")
            try:
                if missing_old:
                    new_view = self._full_recompute(cid)
                else:
                    if current is None:
                        current = self.view(prev_cid) \
                            if prev_cid is not None else self._empty_view()
                    new_p = self._side_partials(new_files)
                    old_p = self._side_partials(old_files)
                    new_view, rescan = self._apply_commit(
                        current, new_p, old_p)
                    if len(rescan):
                        self.last_rescans.append((cid, len(rescan)))
                        new_view = self._run_rescan(cid, new_view, rescan)
            finally:
                if scratch is not None:
                    shutil.rmtree(scratch, ignore_errors=True)
            self._write_view(cid, new_view)
            current, prev_cid = new_view, cid
        return self.view()

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
aggregates only — pair it with a periodic full recompute if you need
extrema.

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

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from chomper_ray.stages.merge import INTERNAL_DELETED
from chomper_ray.state.lake import (LakeTable, committed_epochs,
                                    is_compaction_manifest, load_manifest,
                                    manifest_has_deltas,
                                    materialize_mor_commit_diff,
                                    materialize_mor_resolved,
                                    mor_commit_delta_pids,
                                    mor_diff_inputs_exist)


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
            mor_pids = mor_commit_delta_pids(man, cid)
            scratch = None
            if is_compaction_manifest(man):
                # compaction is pure storage reorganization: every
                # folded delta commit was already applied individually
                # (chain order), so this commit is content-neutral
                new_files, old_files = [], []
                missing_old = prev_man is None and prev_cid is not None
            elif mor_pids:
                # merge-on-read ingest commit: fold its exact effect —
                # the key-restricted old/new diff of its own delta
                missing_old = (prev_man is None and prev_cid is not None) \
                    or not mor_diff_inputs_exist(root, man, prev_man, cid)
                new_files, old_files = [], []
                if not missing_old:
                    scratch = tempfile.mkdtemp(prefix="chomper_mv_diff_")
                    new_files, old_files = materialize_mor_commit_diff(
                        root, man, prev_man, cid,
                        self.lake._mor_kwargs(), scratch)
            else:
                touched = sorted({int(ln["partition_id"])
                                  for ln in man.get("lineage", [])})
                new_files = [str(root / man["partitions"][str(p)]["file"])
                             for p in touched
                             if man["partitions"].get(str(p), {}).get("file")]
                old_files = []
                missing_old = prev_man is None and prev_cid is not None
                if prev_man is not None:
                    for p in touched:
                        part = prev_man["partitions"].get(str(p))
                        if part is None or not part.get("file"):
                            continue
                        f = root / part["file"]
                        if not f.exists():  # compacted away
                            missing_old = True
                            break
                        old_files.append(str(f))
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

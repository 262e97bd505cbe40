"""Resumable partitioned Parquet output for non-lake pipelines.

The engine rule: write one directory per key range so a failed run can
skip finished partitions — never one giant file. The LakeTable gets this
via its manifest; this module is the lightweight variant for plain
pipeline outputs (exports, training-shard dumps):

- rows are hash-bucketed by ``key`` into ``num_partitions`` ranges;
- one task per partition writes ``root/p=NNNNN/part.parquet`` to a tmp
  name, fsync-renames it, then drops a ``_SUCCESS`` marker — the write
  of each partition is atomic-ish and individually restartable;
- a rerun skips partitions whose marker exists (``skipped`` count
  returned), so a crashed 50k-partition dump resumes where it died.

Deterministic: the same input produces the same partition contents
(rows sorted by key within a partition), so a retried partition
overwrites with identical bytes.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from chomper_ray.stages.merge import add_bucket, BUCKET_COL


def write_partitioned(ds, root: str | Path, key: str,
                      num_partitions: int = 64,
                      skip_completed: bool = True) -> dict:
    """Write ``ds`` as ``root/p=NNNNN/part.parquet`` (+ ``_SUCCESS``
    markers). Returns ``{"written": n, "skipped": n, "rows": n}``."""
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    done = {int(p.parent.name.split("=")[1])
            for p in root.glob("p=*/_SUCCESS")} if skip_completed else set()

    bucketed = ds.map_batches(
        lambda t: add_bucket(t, key, num_partitions), batch_format="pyarrow")

    roots = str(root)

    def write_part(g: pa.Table) -> pd.DataFrame:
        pid = int(g[BUCKET_COL][0].as_py())
        if pid in done:
            # a completed partition's rows are dropped here, but they
            # were already shuffled — resume saves the WRITE + downstream
            # consumers, which is the expensive half for wide rows
            return pd.DataFrame({"pid": [pid], "rows": [0], "skipped": [True]})
        g = g.drop_columns([BUCKET_COL]).sort_by(key)
        d = Path(roots) / f"p={pid:05d}"
        d.mkdir(parents=True, exist_ok=True)
        # attempt-isolated tmp: two resumed runs racing on the same
        # partition must not share a tmp path (see lake.py snapshot note)
        tmp = d / f".part.{uuid.uuid4().hex[:8]}.parquet.tmp"
        pq.write_table(g, tmp)
        os.replace(tmp, d / "part.parquet")
        (d / "_SUCCESS").touch()
        return pd.DataFrame({"pid": [pid], "rows": [g.num_rows],
                             "skipped": [False]})

    stats = (bucketed.groupby(BUCKET_COL)
             .map_groups(write_part, batch_format="pyarrow")
             .to_pandas())  # one row per partition — metadata only
    _write_layout(root, key, num_partitions)
    return {
        "written": int((~stats["skipped"]).sum()),
        "skipped": int(stats["skipped"].sum()),
        "rows": int(stats["rows"].sum()),
    }


def read_partitioned(root: str | Path):
    """Read back a ``write_partitioned`` output as a streaming Dataset
    (only partitions with a ``_SUCCESS`` marker — a torn run's partial
    dirs are invisible)."""
    import ray.data as rd

    files = sorted(str(p.parent / "part.parquet")
                   for p in Path(root).glob("p=*/_SUCCESS"))
    if not files:
        raise FileNotFoundError(f"no completed partitions under {root}")
    return rd.read_parquet(files, partitioning=None)


def _write_layout(root: Path, key: str, num_partitions: int) -> None:
    import json

    tmp = root / f"._LAYOUT.{uuid.uuid4().hex[:8]}.tmp"
    tmp.write_text(json.dumps({"key": key,
                               "num_partitions": num_partitions}))
    os.replace(tmp, root / "_LAYOUT.json")


def read_layout(root: str | Path) -> dict:
    import json

    p = Path(root) / "_LAYOUT.json"
    if not p.exists():
        raise FileNotFoundError(
            f"{root} has no _LAYOUT.json — not a write_partitioned "
            "output (or written by an older version; pass key/"
            "num_partitions explicitly)")
    return json.loads(p.read_text())


def bucket_join(left_root: str | Path, right_root: str | Path,
                how: str = "inner", suffix: str = "_r"):
    """SHUFFLE-FREE join of two co-bucketed ``write_partitioned``
    layouts: both sides were hash-bucketed by the same key function, so
    bucket i of one side can only match bucket i of the other — the
    join is one map task per bucket pair (read two files, one pandas
    merge), no all-to-all exchange at any point.

    This is the storage-level join-elision a 100 TB pipeline leans on:
    pay the partitioning shuffle ONCE at write time, then every
    subsequent join against any co-bucketed table is embarrassingly
    parallel. Layouts must agree on ``num_partitions`` and key NAME
    (join column = the layout key; validated from ``_LAYOUT.json``).

    ``how``: inner / left / outer (pandas merge semantics per bucket —
    correct globally because co-bucketing makes buckets independent).
    """
    import ray.data as rd

    ll, rl = read_layout(left_root), read_layout(right_root)
    if ll["num_partitions"] != rl["num_partitions"]:
        raise ValueError(
            f"bucket_join needs equal num_partitions: "
            f"{ll['num_partitions']} != {rl['num_partitions']}")
    if ll["key"] != rl["key"]:
        raise ValueError(
            f"bucket_join joins ON the layout key; keys differ: "
            f"{ll['key']!r} != {rl['key']!r}")
    key, n = ll["key"], int(ll["num_partitions"])
    lroot, rroot = str(left_root), str(right_root)

    def _first_schema(root):
        for m in sorted(Path(root).glob("p=*/_SUCCESS")):
            return pq.read_schema(m.parent / "part.parquet")
        raise FileNotFoundError(f"no completed partitions under {root}")

    # typed empties keep every bucket's output schema identical, even
    # when one side's bucket file is absent
    l_empty = _first_schema(lroot).empty_table().to_pandas()
    r_empty = _first_schema(rroot).empty_table().to_pandas()
    empty_out = l_empty.merge(r_empty, on=key, how=how,
                              suffixes=("", suffix))

    def _join_one(pid: int) -> pd.DataFrame:
        lp = Path(lroot) / f"p={pid:05d}"
        rp = Path(rroot) / f"p={pid:05d}"
        lt = pq.read_table(lp / "part.parquet").to_pandas() \
            if (lp / "_SUCCESS").exists() else None
        rt = pq.read_table(rp / "part.parquet").to_pandas() \
            if (rp / "_SUCCESS").exists() else None
        if lt is None and rt is None:
            return empty_out
        if lt is None:
            if how in ("inner", "left"):
                return empty_out
            lt = l_empty
        if rt is None:
            if how == "inner":
                return empty_out
            rt = r_empty
        out = lt.merge(rt, on=key, how=how, suffixes=("", suffix))
        return out[list(empty_out.columns)]

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # a batch normally carries one pid (one block per id after the
        # repartition), but never ASSUME Ray won't bundle blocks into a
        # multi-row batch — process every pid the batch carries
        parts = [_join_one(int(pid)) for pid in df["pid"].unique()]
        return parts[0] if len(parts) == 1 \
            else pd.concat(parts, ignore_index=True)

    return (rd.range(n)
            .map_batches(lambda df: df.rename(columns={"id": "pid"}),
                         batch_format="pandas")
            .repartition(n)
            .map_batches(join_bucket, batch_format="pandas"))


def bucket_agg(root: str | Path, sums=(), counts: bool = True):
    """SHUFFLE-FREE grouped aggregation over a ``write_partitioned``
    layout: the layout key is the grouping key, and co-bucketing means
    every row of a key lives in exactly one bucket file — so the global
    groupby is one map task per bucket (read, one vectorized pandas
    groupby, emit finals). The aggregation shuffle was paid once, at
    write time, and is amortized over every subsequent group-by/join
    against the layout."""
    import ray.data as rd

    lay = read_layout(root)
    key, n = lay["key"], int(lay["num_partitions"])
    roots = str(root)
    sums = list(sums)

    def _first_schema():
        for m in sorted(Path(roots).glob("p=*/_SUCCESS")):
            return pq.read_schema(m.parent / "part.parquet")
        raise FileNotFoundError(f"no completed partitions under {roots}")

    def _agg_frame(t: pd.DataFrame) -> pd.DataFrame:
        g = t.groupby(key, sort=False, dropna=False)
        out = g[sums].sum() if sums else g.size().to_frame("__drop")
        out = out.rename(columns={c: f"sum_{c}" for c in sums})
        if counts:
            out["n_rows"] = g.size()
        return out.reset_index().drop(columns=["__drop"],
                                      errors="ignore")

    # placeholder for missing buckets derived from the layout's REAL
    # schema (replaying the agg on a typed empty frame), so the key /
    # sum dtypes match non-empty buckets and Arrow block unification
    # never upcasts or fails when a bucket lacks a _SUCCESS file
    empty_out = _agg_frame(
        _first_schema().empty_table().to_pandas()[[key] + sums])
    if counts:
        empty_out["n_rows"] = empty_out["n_rows"].astype("int64")

    def agg_bucket(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        # process every pid the batch carries — do not assume Ray
        # never bundles two one-row blocks into one batch
        for pid in (int(v) for v in df["pid"].unique()):
            p = Path(roots) / f"p={pid:05d}"
            if not (p / "_SUCCESS").exists():
                parts.append(empty_out)
                continue
            t = pq.read_table(p / "part.parquet",
                              columns=[key] + sums).to_pandas()
            parts.append(_agg_frame(t))
        return parts[0] if len(parts) == 1 \
            else pd.concat(parts, ignore_index=True)

    return (rd.range(n)
            .map_batches(lambda df: df.rename(columns={"id": "pid"}),
                         batch_format="pandas")
            .repartition(n)
            .map_batches(agg_bucket, batch_format="pandas"))


def write_sorted(ds, root: str | Path, order_col: str,
                 num_partitions: int = 64,
                 sample_per_block: int = 200) -> dict:
    """Range-partitioned SORTED layout with per-file min/max statistics
    — the data-skipping half of "prune at the read": later range scans
    open only the files whose [min, max] overlaps the predicate.

    Boundaries come from per-block samples (bounded: blocks ×
    ``sample_per_block`` values on the driver — a sketch, not the
    column); rows route to their range by one vectorized searchsorted;
    each range writes one sorted file plus its true min/max into
    ``_STATS.json``. Same atomic tmp-rename + ``_SUCCESS`` contract as
    ``write_partitioned``.

    ``order_col`` must be null-free: a NaN/NaT order value has no range
    (it would poison the top file's max stat and then be silently
    dropped by every ``read_range`` residual filter), so the write
    raises ``ValueError`` instead of producing a lossy layout.
    """
    import json

    import numpy as np
    import ray.data as rd  # noqa: F401  (ds is already a Dataset)

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        v = df[order_col].dropna()
        if len(v) > sample_per_block:
            # deterministic systematic sample, no RNG
            idx = np.linspace(0, len(v) - 1, sample_per_block).astype(int)
            v = v.iloc[idx]
        return pd.DataFrame({order_col: v})

    samp = ds.map_batches(sample, batch_format="pandas").to_pandas()
    vals = np.sort(samp[order_col].to_numpy())
    qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
    bounds = np.unique(vals[(qs * (len(vals) - 1)).astype(int)]) \
        if len(vals) else np.array([])
    n_ranges = len(bounds) + 1
    roots = str(root)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        n_null = int(df[order_col].isna().sum())
        if n_null:
            raise ValueError(
                f"write_sorted: order_col {order_col!r} has {n_null} "
                "null value(s) in a block — a null has no sort range "
                "and would corrupt the file's min/max stats; drop or "
                "fill nulls before writing a sorted layout")
        df = df.copy()
        df["_rb"] = np.searchsorted(
            bounds, df[order_col].to_numpy(), side="right") \
            .astype(np.int32) if len(bounds) else np.int32(0)
        return df

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["_rb"].iloc[0])
        g = g.drop(columns=["_rb"]).sort_values(order_col, kind="stable")
        d = Path(roots) / f"r={pid:05d}"
        d.mkdir(parents=True, exist_ok=True)
        tmp = d / f".part.{uuid.uuid4().hex[:8]}.parquet.tmp"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, d / "part.parquet")
        (d / "_SUCCESS").touch()
        return pd.DataFrame({"pid": [pid], "rows": [len(g)],
                             "vmin": [g[order_col].iloc[0]],
                             "vmax": [g[order_col].iloc[-1]]})

    stats = (ds.map_batches(tag, batch_format="pandas")
             .groupby("_rb").map_groups(write_part, batch_format="pandas")
             .to_pandas())  # one row per range — metadata only
    def _jsonable(v):
        # numerics stay numeric (string compare breaks them: "9" > "10");
        # everything else (timestamps, strings) stores its str() form —
        # ISO timestamp strings compare correctly lexicographically
        import numpy as _np

        if isinstance(v, (int, float, _np.integer, _np.floating)):
            return float(v)
        return str(v)

    meta = {"order_col": order_col, "n_ranges": n_ranges,
            "files": [{"pid": int(r.pid), "rows": int(r.rows),
                       "min": _jsonable(r.vmin), "max": _jsonable(r.vmax)}
                      for r in stats.itertuples()]}
    tmp = root / f"._STATS.{uuid.uuid4().hex[:8]}.tmp"
    tmp.write_text(json.dumps(meta))
    os.replace(tmp, root / "_STATS.json")
    return {"files": len(stats), "rows": int(stats["rows"].sum())}


def read_range(root: str | Path, lo=None, hi=None,
               columns=None) -> tuple:
    """Scan a ``write_sorted`` layout with file-level pruning: returns
    ``(Dataset, n_files_read, n_files_total)`` — only files whose
    [min, max] overlaps [lo, hi] are opened; the residual row filter
    (files straddling the bounds) is applied vectorized. ``lo``/``hi``
    are inclusive/exclusive respectively (SQL ``lo <= x < hi``)."""
    import json

    import pyarrow.compute as pc
    import ray.data as rd

    root = Path(root)
    meta = json.loads((root / "_STATS.json").read_text())
    col = meta["order_col"]
    def _cmp_key(stored, bound):
        if isinstance(stored, (int, float)):
            return stored, float(bound)
        return str(stored), str(bound)

    keep = []
    for f in meta["files"]:
        if lo is not None:
            a, b = _cmp_key(f["max"], lo)
            if a < b:
                continue
        if hi is not None:
            a, b = _cmp_key(f["min"], hi)
            if a >= b:
                continue
        keep.append(f["pid"])
    files = [str(root / f"r={pid:05d}" / "part.parquet") for pid in keep]
    n_total = len(meta["files"])
    if not files:
        schema = pq.read_schema(
            root / f"r={meta['files'][0]['pid']:05d}" / "part.parquet")
        empty = rd.from_arrow(schema.empty_table())
        return empty, 0, n_total
    # columns= + partitioning=None together hit a Ray bug (same note as
    # LakeTable.read); an explicit column list prunes the hive r= column
    # anyway, and without one partitioning must be disabled or the
    # directory name leaks in as a column
    drop_col = False
    if columns is not None:
        read_cols = list(columns)
        # the residual filter needs the order column even if the caller
        # projected it out — read it, filter, then drop it again
        if (lo is not None or hi is not None) and col not in read_cols:
            read_cols.append(col)
            drop_col = True
        ds = rd.read_parquet(files, columns=read_cols)
    else:
        ds = rd.read_parquet(files, partitioning=None)

    def residual(t: pa.Table) -> pa.Table:
        m = None
        if lo is not None:
            m = pc.greater_equal(t[col], lo)
        if hi is not None:
            m2 = pc.less(t[col], hi)
            m = m2 if m is None else pc.and_(m, m2)
        if m is not None:
            t = t.filter(m)
        return t.drop_columns([col]) if drop_col else t

    return ds.map_batches(residual, batch_format="pyarrow"), \
        len(files), n_total


def _col_buckets(vals, bounds):
    import numpy as np

    return np.searchsorted(bounds, vals, side="right").astype(np.uint64)


def write_zorder(ds, root: str | Path, cols, num_partitions: int = 64,
                 bits: int = 10, sample_per_block: int = 200) -> dict:
    """Z-ORDER clustered layout: rows sort by the bit-interleaved
    quantile-rank of ``cols`` (the Databricks `ZORDER BY` idea), files
    carry per-column min/max stats — so a box predicate on ANY subset
    of the columns prunes files (multi-dimensional data skipping, where
    a single-column sort only helps its own column).

    Rank buckets come from per-block value samples (driver holds blocks
    × sample_per_block values per column); the z-value is interleaved
    ``bits`` per column; files are equal-count ranges of z.
    """
    import json

    import numpy as np

    cols = list(cols)
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    n_buckets = (1 << bits) - 1

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for c in cols:
            v = df[c].dropna()
            if len(v) > sample_per_block:
                idx = np.linspace(0, len(v) - 1,
                                  sample_per_block).astype(int)
                v = v.iloc[idx]
            out[c] = v.reset_index(drop=True)
        return pd.DataFrame(out).dropna()

    samp = ds.map_batches(sample, batch_format="pandas").to_pandas()
    qs = np.linspace(0, 1, n_buckets + 1)[1:-1]
    bounds = {}
    for c in cols:
        v = np.sort(samp[c].to_numpy())
        bounds[c] = np.unique(v[(qs * (len(v) - 1)).astype(int)]) \
            if len(v) else np.array([])

    def zvalue(df: pd.DataFrame) -> "np.ndarray":
        z = np.zeros(len(df), dtype=np.uint64)
        for ci, c in enumerate(cols):
            idx = _col_buckets(df[c].to_numpy(), bounds[c])
            for k in range(bits):
                z |= ((idx >> np.uint64(k)) & np.uint64(1)) \
                    << np.uint64(k * len(cols) + ci)
        return z

    # z-range boundaries from the sample itself (equal-count files)
    zs = np.sort(zvalue(samp)) if len(samp) else np.array([], np.uint64)
    fq = np.linspace(0, 1, num_partitions + 1)[1:-1]
    zbounds = np.unique(zs[(fq * (len(zs) - 1)).astype(int)]) \
        if len(zs) else np.array([], np.uint64)
    roots = str(root)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_zb"] = np.searchsorted(zbounds, zvalue(df),
                                    side="right").astype(np.int32)
        return df

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["_zb"].iloc[0])
        g = g.drop(columns=["_zb"])
        d = Path(roots) / f"z={pid:05d}"
        d.mkdir(parents=True, exist_ok=True)
        tmp = d / f".part.{uuid.uuid4().hex[:8]}.parquet.tmp"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, d / "part.parquet")
        (d / "_SUCCESS").touch()
        row = {"pid": pid, "rows": len(g)}
        for c in cols:
            row[f"min_{c}"] = g[c].min()
            row[f"max_{c}"] = g[c].max()
        return pd.DataFrame([row])

    stats = (ds.map_batches(tag, batch_format="pandas")
             .groupby("_zb").map_groups(write_part, batch_format="pandas")
             .to_pandas())

    def _jsonable(v):
        import numpy as _np

        if isinstance(v, (int, float, _np.integer, _np.floating)):
            return float(v)
        return str(v)

    meta = {"cols": cols,
            "files": [dict(pid=int(r["pid"]), rows=int(r["rows"]),
                           **{f"min_{c}": _jsonable(r[f"min_{c}"])
                              for c in cols},
                           **{f"max_{c}": _jsonable(r[f"max_{c}"])
                              for c in cols})
                      for _, r in stats.iterrows()]}
    tmp = root / f"._STATS.{uuid.uuid4().hex[:8]}.tmp"
    tmp.write_text(json.dumps(meta))
    os.replace(tmp, root / "_STATS.json")
    return {"files": len(stats), "rows": int(stats["rows"].sum())}


def read_box(root: str | Path, preds: dict, columns=None) -> tuple:
    """Scan a ``write_zorder`` layout with a box predicate
    ``{col: (lo, hi)}`` (lo inclusive, hi exclusive; either side may be
    None): only files whose per-column [min, max] intersects EVERY
    bound are opened. Returns ``(Dataset, files_read, files_total)``."""
    import json

    import pyarrow.compute as pc
    import ray.data as rd

    root = Path(root)
    meta = json.loads((root / "_STATS.json").read_text())

    def _cmp_key(stored, bound):
        if isinstance(stored, (int, float)):
            return stored, float(bound)
        return str(stored), str(bound)

    keep = []
    for f in meta["files"]:
        ok = True
        for c, (lo, hi) in preds.items():
            if lo is not None:
                a, b = _cmp_key(f[f"max_{c}"], lo)
                if a < b:
                    ok = False
                    break
            if hi is not None:
                a, b = _cmp_key(f[f"min_{c}"], hi)
                if a >= b:
                    ok = False
                    break
        if ok:
            keep.append(f["pid"])
    n_total = len(meta["files"])
    files = [str(root / f"z={pid:05d}" / "part.parquet") for pid in keep]
    if not files:
        schema = pq.read_schema(
            root / f"z={meta['files'][0]['pid']:05d}" / "part.parquet")
        return rd.from_arrow(schema.empty_table()), 0, n_total
    extra_cols: list = []
    if columns is not None:
        read_cols = list(columns)
        # residual filtering needs every predicate column — read the
        # missing ones, filter, then project back to the caller's list
        for c in preds:
            if c not in read_cols:
                read_cols.append(c)
                extra_cols.append(c)
        ds = rd.read_parquet(files, columns=read_cols)
    else:
        ds = rd.read_parquet(files, partitioning=None)

    def residual(t: pa.Table) -> pa.Table:
        m = None
        for c, (lo, hi) in preds.items():
            if lo is not None:
                mm = pc.greater_equal(t[c], lo)
                m = mm if m is None else pc.and_(m, mm)
            if hi is not None:
                mm = pc.less(t[c], hi)
                m = mm if m is None else pc.and_(m, mm)
        if m is not None:
            t = t.filter(m)
        return t.drop_columns(extra_cols) if extra_cols else t

    return ds.map_batches(residual, batch_format="pyarrow"), \
        len(files), n_total


def bucket_lookup(root: str | Path, values) -> pd.DataFrame:
    """Point lookup on a ``write_partitioned`` layout: each key hashes
    to exactly one bucket, so looking up k keys opens at most k files
    (usually far fewer) — no scan, no Ray job, pure driver-side reads.
    Returns the matching rows as a DataFrame (order: input values)."""
    from chomper_ray.stages.merge import stable_bucket

    lay = read_layout(root)
    key, n = lay["key"], int(lay["num_partitions"])
    vals = pd.Series(list(values))
    buckets = stable_bucket(vals.to_numpy(), n)
    out = []
    for pid in sorted(set(int(b) for b in buckets)):
        p = Path(root) / f"p={pid:05d}"
        if not (p / "_SUCCESS").exists():
            continue
        want = vals[buckets == pid]
        t = pq.read_table(p / "part.parquet").to_pandas()
        out.append(t[t[key].isin(set(want))])
    if not out:
        return pd.DataFrame()
    res = pd.concat(out, ignore_index=True)
    order = {v: i for i, v in enumerate(vals)}
    return res.sort_values(key, key=lambda s: s.map(order),
                           kind="stable").reset_index(drop=True)


def write_jsonl_partitioned(ds, root: str | Path, key: str,
                            num_partitions: int = 64,
                            compress: bool = True,
                            skip_completed: bool = True) -> dict:
    """Resumable hash-partitioned JSONL shards — the hand-off format
    LLM training stacks consume. Same contract as ``write_partitioned``
    (atomic tmp-rename per shard + ``_SUCCESS`` + ``_LAYOUT.json``;
    rerun skips finished shards), one ``part.jsonl[.gz]`` per bucket,
    rows sorted by ``key`` so retries are byte-identical."""
    import gzip
    import io

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    done = {int(p.parent.name.split("=")[1])
            for p in root.glob("p=*/_SUCCESS")} if skip_completed else set()
    ext = "jsonl.gz" if compress else "jsonl"

    bucketed = ds.map_batches(
        lambda t: add_bucket(t, key, num_partitions),
        batch_format="pyarrow")
    roots = str(root)

    def write_shard(g: pa.Table) -> pd.DataFrame:
        pid = int(g[BUCKET_COL][0].as_py())
        if pid in done:
            return pd.DataFrame({"pid": [pid], "rows": [0],
                                 "skipped": [True]})
        df = g.drop_columns([BUCKET_COL]).sort_by(key).to_pandas()
        payload = df.to_json(orient="records", lines=True,
                             force_ascii=False).encode("utf-8")
        if compress:
            buf = io.BytesIO()
            # fixed mtime: retries produce byte-identical shards
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as z:
                z.write(payload)
            payload = buf.getvalue()
        d = Path(roots) / f"p={pid:05d}"
        d.mkdir(parents=True, exist_ok=True)
        tmp = d / f".part.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_bytes(payload)
        os.replace(tmp, d / f"part.{ext}")
        (d / "_SUCCESS").touch()
        return pd.DataFrame({"pid": [pid], "rows": [len(df)],
                             "skipped": [False]})

    stats = (bucketed.groupby(BUCKET_COL)
             .map_groups(write_shard, batch_format="pyarrow")
             .to_pandas())
    _write_layout(root, key, num_partitions)
    return {"written": int((~stats["skipped"]).sum()),
            "skipped": int(stats["skipped"].sum()),
            "rows": int(stats["rows"].sum())}


def read_jsonl_partitioned(root: str | Path):
    """Stream back a ``write_jsonl_partitioned`` output (completed
    shards only)."""
    import ray.data as rd

    files = sorted(str(f) for m in Path(root).glob("p=*/_SUCCESS")
                   for f in m.parent.glob("part.jsonl*"))
    if not files:
        raise FileNotFoundError(f"no completed shards under {root}")
    # partitioning=None: without it the p=NNNNN shard directory is
    # inferred as a hive column and leaks into the schema
    return rd.read_json(files, partitioning=None)


def shuffled_export(ds, root: str | Path, key: str,
                    n_shards: int = 64,
                    skip_completed: bool = True) -> dict:
    """Deterministic GLOBAL pseudo-shuffle export — the "shuffle the
    corpus once before training" step, without any random state: each
    row's Knuth multiplicative key hash ``h = (key * 2654435761) %
    2^32`` (the ``mixture_sample`` SQL-parity hash — key must be int64
    in [0, 2^32), validated) decides its shard (``h % n_shards``) and
    its position within the shard (ascending ``(h, key)``). Reading the
    shards in order therefore yields a fixed hash-scrambled global
    order that is independent of input layout, cluster size and retry
    count — and exactly replayable in SQL with one window function.

    One shuffle (groupby shard), vectorized tagging, one sorted parquet
    file per shard written tmp→rename + ``_SUCCESS`` (rerun skips
    finished shards; retries are byte-identical). ``read_shuffled``
    streams the shards back in global order with ``shard``/``pos``
    attached."""
    import numpy as np
    import ray.data as rd  # noqa: F401

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    nsh = int(n_shards)
    layout = root / "_LAYOUT.json"
    if layout.exists():
        prev = json.loads(layout.read_text())
        if prev.get("num_partitions") != nsh:
            raise ValueError(
                f"shuffled_export: {root} already holds a "
                f"{prev.get('num_partitions')}-shard export — resuming "
                f"with n_shards={nsh} would mis-route rows; use a fresh "
                "root or the original shard count")
    done = {int(p.parent.name.split("=")[1])
            for p in root.glob("s=*/_SUCCESS")} if skip_completed else set()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        kv = df[key].to_numpy()
        if len(kv) and (kv.min() < 0 or kv.max() >= 4294967296):
            raise ValueError(
                f"shuffled_export: key {key!r} outside [0, 2^32) — the "
                "SQL-parity hash would wrap; remap or widen first")
        h = (kv.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(4294967296)
        df = df.copy()
        df["_h"] = h.astype(np.int64)
        df["_shard"] = (h % np.uint64(nsh)).astype(np.int32)
        return df

    roots = str(root)

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        sid = int(g["_shard"].iloc[0])
        if sid in done:
            return pd.DataFrame({"shard": [sid], "rows": [0],
                                 "skipped": [True]})
        g = g.sort_values(["_h", key], kind="stable") \
            .reset_index(drop=True)
        g["pos"] = np.arange(len(g), dtype=np.int64)
        g = g.drop(columns=["_h"]).rename(columns={"_shard": "shard"})
        d = Path(roots) / f"s={sid:05d}"
        d.mkdir(parents=True, exist_ok=True)
        tmp = d / f".part.{uuid.uuid4().hex[:8]}.parquet.tmp"
        # no pandas metadata: per-file metadata differs and defeats
        # Ray's schema dedup when read_shuffled opens every shard
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False)
                       .replace_schema_metadata(None), tmp)
        os.replace(tmp, d / "part.parquet")
        (d / "_SUCCESS").touch()
        return pd.DataFrame({"shard": [sid], "rows": [len(g)],
                             "skipped": [False]})

    stats = (ds.map_batches(tag, batch_format="pandas")
             .groupby("_shard").map_groups(write_shard,
                                           batch_format="pandas")
             .to_pandas())
    _write_layout(root, key, nsh)
    if not len(stats):  # empty input: no shards, nothing skipped
        return {"written": 0, "skipped": 0, "rows": 0}
    return {"written": int((~stats["skipped"]).sum()),
            "skipped": int(stats["skipped"].sum()),
            "rows": int(stats["rows"].sum())}


def read_shuffled(root: str | Path, start_shard: int = 0):
    """Stream back a ``shuffled_export``. The global shuffle order IS
    the ``(shard, pos)`` columns baked into every row at write time —
    rows within a file are stored in that order, but Ray's streaming
    executor may deliver BLOCKS out of submission order (default
    ``preserve_order=False``), so a consumer that needs strict arrival
    order should either iterate the shard files one by one (each is
    ``root/s=NNNNN/part.parquet``, internally ordered) or enable
    ``DataContext.execution_options.preserve_order``. ``start_shard``
    skips shards below it — the mid-epoch training resume knob (a
    consumer checkpoint records its last finished shard)."""
    import ray.data as rd

    root = Path(root)
    files = sorted(str(m.parent / "part.parquet")
                   for m in root.glob("s=*/_SUCCESS")
                   if int(m.parent.name.split("=")[1]) >= start_shard)
    if not files:
        raise FileNotFoundError(
            f"no completed shards under {root} at or past shard "
            f"{start_shard}")
    return rd.read_parquet(files, partitioning=None)

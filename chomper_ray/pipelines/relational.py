"""Relational building blocks the reference lacks but the engine needs
(SURVEY §2.5): broadcast lookup join, pre-aggregated grouped aggregation,
top-k, distinct — each shaped to minimize shuffles.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def _arrow_type(t):
    """Ray's schema() reports PANDAS block types (numpy dtypes / python
    classes) for datasets whose last stage ran batch_format='pandas' —
    normalize to Arrow. object/str → string (the only object columns in
    these pipelines are strings; the runtime conform casts real blocks,
    so a wrong guess fails loudly there, not silently)."""
    if isinstance(t, pa.DataType):
        return t
    if t in (object, str):
        return pa.string()
    try:
        return pa.from_numpy_dtype(t)
    except (TypeError, pa.ArrowNotImplementedError):
        return pa.string()


def _combined_schema(left, right, left_schema=None, right_schema=None):
    """Combined Arrow schema of two datasets. ``ds.schema()`` on a
    shuffle-bearing plan EXECUTES that shuffle just to see types — pass
    ``left_schema``/``right_schema`` (plain ``pa.Schema``) when the
    caller knows them statically (composite pipelines) to keep the probe
    free."""
    import pyarrow as _pa

    ls = left_schema if left_schema is not None else left.schema()
    rs = right_schema if right_schema is not None else right.schema()
    fields = {n: _arrow_type(t) for n, t in zip(ls.names, ls.types)}
    order = list(ls.names)
    for n, t in zip(rs.names, rs.types):
        if n not in fields:
            fields[n] = _arrow_type(t)
            order.append(n)
    return _pa.schema([_pa.field(n, fields[n]) for n in order]), \
        list(ls.names), list(rs.names)


def _to_schema(df: pd.DataFrame, out_schema: pa.Schema) -> pa.Table:
    """pandas → Arrow under an EXPLICIT schema. Per-bucket pandas joins
    must all emit the same block schema or Ray's downstream stages see
    dtype flips (int64-with-nulls degrades to float64 in pandas, and
    ``12345.0`` value-hashes differently from ``12345``).
    ``from_pandas=True`` maps NaN/NaT → null before the cast, so integer
    columns survive a null-introducing outer join."""
    arrays = [pa.array(df[f.name], type=f.type, from_pandas=True)
              for f in out_schema]
    return pa.Table.from_arrays(arrays, schema=out_schema)


def _hash_keys(keys) -> "np.ndarray":
    arr = np.asarray(keys)
    if arr.dtype.kind not in ("i", "u"):
        arr = arr.astype(object)
    return pd.util.hash_array(arr)


def _mix_bucket(h: "np.ndarray", salts: "np.ndarray",
                num_buckets: int) -> "np.ndarray":
    with np.errstate(over="ignore"):
        mixed = (h * np.uint64(0x9E3779B97F4A7C15)) + salts
    return (mixed % np.uint64(num_buckets)).astype(np.int32)


def _salted_bucket(keys, num_buckets: int, side: str,
                   hot_keys: dict | None) -> "np.ndarray":
    """Bucket ids with hot-key salting: a key listed in ``hot_keys`` with
    salt factor n is spread over n buckets — left rows get a round-robin
    salt r∈[0,n), right rows REPLICATE once per salt (done by the
    caller); bucket = hash(key) mixed with r, so left salt r meets
    exactly the right replica r. Non-hot rows use r=0 on both sides."""
    h = _hash_keys(keys)
    salts = np.zeros(len(h), dtype=np.uint64)
    if hot_keys and side == "l":
        karr = np.asarray(keys)
        for k, n in hot_keys.items():
            m = karr == k
            cnt = int(m.sum())
            if cnt:
                salts[m] = np.arange(cnt, dtype=np.uint64) % np.uint64(n)
    return _mix_bucket(h, salts, num_buckets)


def _tagger(schema, bucket_on, num_buckets, side, hot_keys=None):
    """Arrow-level pad-to-shared-schema + bucket + side tag. Typed null
    padding (schema.conform) keeps dtypes intact through Ray's union,
    which does NOT reconcile block schemas. With ``hot_keys``, right-side
    hot rows are replicated once per salt before bucketing (skew
    mitigation — a hot build row must be present wherever a salted probe
    row can land)."""
    import numpy as np
    import pyarrow as _pa

    from chomper_ray.state.schema import conform

    def f(t: _pa.Table) -> _pa.Table:
        t = conform(t, schema)
        if not isinstance(bucket_on, str):
            # composite key: bucket by the row-hash of the tuple
            # (hot-key salting is single-column-only, enforced upstream)
            h = pd.util.hash_pandas_object(
                t.select(list(bucket_on)).to_pandas(),
                index=False).to_numpy()
            b = _mix_bucket(h, np.zeros(len(h), dtype=np.uint64),
                            num_buckets)
            t = t.append_column("_jb", _pa.array(b, type=_pa.int32()))
            return t.append_column("_side",
                                   _pa.array([side] * t.num_rows))
        if hot_keys and side == "r":
            # replicate hot right rows with explicit salts
            keys = t[bucket_on].to_pandas().to_numpy()
            parts = [t]
            salt_cols = [np.zeros(t.num_rows, dtype=np.uint64)]
            for k, n in hot_keys.items():
                m = keys == k
                if m.any():
                    hot = t.filter(_pa.array(m))
                    for r in range(1, n):
                        parts.append(hot)
                        salt_cols.append(
                            np.full(hot.num_rows, r, dtype=np.uint64))
            t = _pa.concat_tables(parts)
            b = _mix_bucket(_hash_keys(t[bucket_on].to_pandas().to_numpy()),
                            np.concatenate(salt_cols), num_buckets)
        else:
            b = _salted_bucket(t[bucket_on].to_pandas().to_numpy(),
                               num_buckets, side, hot_keys)
        t = t.append_column("_jb", _pa.array(b, type=_pa.int32()))
        return t.append_column("_side", _pa.array([side] * t.num_rows))

    return f


def broadcast_join(ds, small: pd.DataFrame, on: str | list[str],
                   how: str = "inner", suffix: str = "_r"):
    """Join a Dataset with a SMALL side: the small table is ``ray.put``
    once and merged per batch inside ``map_batches`` — no shuffle.

    Reference ancestry: ``QueryAssigner`` did one SQL point query PER ROW
    (/root/reference/chomper/contrib/sql/processors.py:25-43); this is the
    same lookup-join semantic at zero round-trips.
    """
    import ray

    ref = ray.put(small)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return batch.merge(rhs, on=on, how=how, suffixes=("", suffix))

    return ds.map_batches(join, batch_format="pandas")


def grouped_agg(ds, keys: Sequence[str], sums: Sequence[str] = (),
                counts: bool = True, means: Sequence[str] = (),
                mins: Sequence[str] = (), maxs: Sequence[str] = ()):
    """Grouped aggregation with a per-batch partial pre-aggregate (the
    combiner) so the shuffle moves one row per key per block, not raw rows.

    All supported aggregates are decomposable: sums/counts/mins/maxs
    merge directly; means are computed as sum/count at finalize.
    """
    keys = list(keys)
    sum_cols = sorted(set(sums) | set(means))
    min_cols, max_cols = sorted(set(mins)), sorted(set(maxs))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        out = g[sum_cols].sum() if sum_cols else g.size().to_frame("__drop")
        out = out.rename(columns={c: f"sum_{c}" for c in sum_cols})
        for c in min_cols:
            out[f"min_{c}"] = g[c].min()
        for c in max_cols:
            out[f"max_{c}"] = g[c].max()
        out["n_rows"] = g.size()
        return out.reset_index().drop(columns=["__drop"], errors="ignore")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        agg = {f"sum_{c}": "sum" for c in sum_cols}
        agg.update({f"min_{c}": "min" for c in min_cols})
        agg.update({f"max_{c}": "max" for c in max_cols})
        agg["n_rows"] = "sum"
        out = g.agg(agg).reset_index()
        for c in means:
            out[f"avg_{c}"] = out[f"sum_{c}"] / out["n_rows"]
            if c not in sums:
                out = out.drop(columns=[f"sum_{c}"])
        if not counts:
            out = out.drop(columns=["n_rows"])
        return out

    def add_pb(df: pd.DataFrame, np_: int = 32) -> pd.DataFrame:
        df = df.copy()
        df["_pb"] = (pd.util.hash_pandas_object(df[keys], index=False)
                     % np_).astype("int32")
        return df

    partials = ds.map_batches(partial, batch_format="pandas")
    # coarse hash partitions: `final` aggregates EVERY key in a partition
    # in one vectorized groupby — not one UDF call per key (10^6 distinct
    # keys = 10^6 single-row pandas groupbys otherwise)
    return (partials.map_batches(add_pb, batch_format="pandas")
            .groupby("_pb")
            .map_groups(lambda g: final(g.drop(columns=["_pb"])),
                        batch_format="pandas"))


def semi_join(ds, keys, on: str):
    """Keep rows whose ``on`` value is in ``keys`` (broadcast key set —
    the scalable filter-by-membership; at very large key cardinality a
    Bloom filter slots in the same place)."""
    import ray

    ref = ray.put(frozenset(keys))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        return batch[batch[on].isin(ks)]

    return ds.map_batches(f, batch_format="pandas")


def anti_join(ds, keys, on: str):
    """Drop rows whose ``on`` value is in ``keys``."""
    import ray

    ref = ray.put(frozenset(keys))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        return batch[~batch[on].isin(ks)]

    return ds.map_batches(f, batch_format="pandas")


# --- Bloom-prefiltered dataset-to-dataset semi/anti join -------------------

_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bloom_params(n_keys: int, fpp: float) -> tuple[int, int]:
    import math

    n = max(1, n_keys)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 8)


def _bloom_positions(values, m: int, k: int):
    """Double hashing (Kirsch–Mitzenmacher): k bit positions per value
    from one vectorized stable hash — (n, k) uint64 array."""
    import numpy as np

    h1 = pd.util.hash_array(np.asarray(values, dtype=object)
                            if np.asarray(values).dtype.kind not in ("i", "u")
                            else np.asarray(values))
    with np.errstate(over="ignore"):
        h2 = (h1 * _BLOOM_MIX) | np.uint64(1)
        idx = (h1[:, None] + np.arange(k, dtype=np.uint64)[None, :] * h2[:, None])
    return idx % np.uint64(m)


def _bloom_test(bits: "np.ndarray", values, m: int, k: int) -> "np.ndarray":
    import numpy as np

    pos = _bloom_positions(values, m, k)
    word = (pos >> np.uint64(6)).astype(np.int64)
    bit = np.uint64(1) << (pos & np.uint64(63))
    return ((bits[word] & bit) != 0).all(axis=1)


def bloom_semi_join(left, right, on: str, right_on: str | None = None,
                    anti: bool = False, fpp: float = 0.001,
                    num_buckets: int = 16, left_schema=None):
    """Dataset-to-dataset semi/anti join with a Bloom prefilter — the
    scale path the plain ``semi_join`` docstring promises: the build side
    is a DATASET, never collected as a driver key set.

    1. Distributed Bloom build over ``right[right_on]``: each block emits
       its m-bit bitmap; the driver folds them with ``bitwise_or`` one at
       a time (peak driver memory = 2 bitmaps ≈ m/4 bytes, e.g. 36 MB at
       10^7 keys / 0.1% fpp). The folded filter broadcasts via
       ``ray.put`` — kilobytes-to-megabytes instead of the key set.
    2. Bloom prefilter on ``left``: negatives are definite non-matches
       (semi drops them for free; anti KEEPS them for free).
    3. Exact verification of the ~|matches| × (1+fpp) survivors via the
       bucketed co-partition (kills false positives) — only survivors and
       distinct right keys shuffle.

    Known Ray limitation: ``to_pandas()`` on an ENTIRELY empty result
    returns a column-less frame (Ray drops schema for 0-row datasets;
    applies to every bucketed join here). Guard ``len(df)`` before
    column access when a join can legitimately match nothing.
    """
    import ray

    right_on = right_on or on
    # materialized: the distinct key set is read three times (count,
    # bloom fold, exact verification) — without this the right-side scan
    # re-executes for each
    rkeys = right.map_batches(
        lambda df: df[[right_on]].drop_duplicates(),
        batch_format="pandas").materialize()
    n_keys = rkeys.count()
    m, k = _bloom_params(n_keys, fpp)

    def block_bloom(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 64, dtype=np.uint64)
        if len(df):
            pos = _bloom_positions(df[right_on].to_numpy(), m, k).ravel()
            np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pd.DataFrame({"bloom": [bits.tobytes()]})

    bits = np.zeros(m // 64, dtype=np.uint64)
    for b in rkeys.map_batches(block_bloom, batch_format="pandas") \
            .iter_batches(batch_format="pandas"):
        for payload in b["bloom"]:
            bits |= np.frombuffer(payload, dtype=np.uint64)
    bloom_ref = ray.put(bits.tobytes())

    def prefilter(df: pd.DataFrame, keep_positive: bool) -> pd.DataFrame:
        if not len(df):
            return df
        arr = np.frombuffer(ray.get(bloom_ref), dtype=np.uint64)
        hit = _bloom_test(arr, df[on].to_numpy(), m, k)
        return df[hit] if keep_positive else df[~hit]

    candidates = left.map_batches(lambda df: prefilter(df, True),
                                  batch_format="pandas")
    verified = _hash_semi_anti(candidates, rkeys, on, right_on, anti,
                               num_buckets, left_schema=left_schema)
    if not anti:
        return verified
    negatives = left.map_batches(lambda df: prefilter(df, False),
                                 batch_format="pandas")
    return negatives.union(verified)


def _hash_semi_anti(left, right_keys, on: str, right_on: str, anti: bool,
                    num_buckets: int, left_schema=None):
    """Bucketed exact semi/anti: co-partition left rows + distinct right
    keys, per bucket keep left rows by key membership."""
    import pyarrow.compute as pc

    r = right_keys.map_batches(
        lambda df: df.rename(columns={right_on: on})[[on]].drop_duplicates(),
        batch_format="pandas")
    ls = left_schema if left_schema is not None else left.schema()
    key_schema = pa.schema([pa.field(on, _arrow_type(
        dict(zip(ls.names, ls.types)).get(on)))])
    schema, lcols, _ = _combined_schema(left, r, left_schema=ls,
                                        right_schema=key_schema)
    out_schema = pa.schema([schema.field(c) for c in lcols])
    l = left.map_batches(_tagger(schema, on, num_buckets, "l"),
                         batch_format="pyarrow")
    rt = r.map_batches(_tagger(schema, on, num_buckets, "r"),
                       batch_format="pyarrow")

    def bucket(g: pa.Table) -> pa.Table:
        lm = pc.equal(g["_side"], "l")
        lg = g.filter(lm).select(lcols)
        rk = g.filter(pc.invert(lm))[on]
        member = pc.is_in(lg[on], value_set=rk.combine_chunks())
        keep = pc.invert(pc.fill_null(member, False)) if anti \
            else pc.fill_null(member, False)
        return lg.filter(keep).cast(out_schema)

    return (l.union(rt).groupby("_jb")
            .map_groups(bucket, batch_format="pyarrow"))


def detect_hot_keys(ds, on: str, frac_threshold: float = 0.05,
                    max_salt: int = 16) -> dict:
    """Pre-pass skew detector: per-block key counts (combiner) → grouped
    sum → keys above ``frac_threshold`` of total rows, each with a salt
    factor sized to its share (capped). The result broadcasts to
    ``hash_join(hot_keys=...)``; the pre-pass shuffles one row per key
    per block."""
    total = ds.count()
    counts = grouped_agg(ds.map_batches(
        lambda df: df[[on]], batch_format="pandas"), keys=[on], counts=True)
    # filter DISTRIBUTED before collecting: at most 1/frac_threshold keys
    # can exceed the share, so the driver sees a bounded handful — never
    # one row per distinct key
    cut = frac_threshold * total
    hot = counts.map_batches(lambda df: df[df["n_rows"] >= cut],
                             batch_format="pandas").to_pandas()
    return {row[on]: int(min(max_salt, max(2, round(row["n_rows"] / cut))))
            for _, row in hot.iterrows()}


def hash_join(left, right, on: str | Sequence[str], num_buckets: int = 16,
              how: str = "inner", suffix: str = "_r",
              left_schema=None, right_schema=None, hot_keys=None):
    """Large-large equi-join: co-hash-partition BOTH sides on the key
    (a column name or a LIST of names — composite keys bucket by the
    row-hash of the tuple), then join matching buckets pairwise — the
    explicit partitioned hash join (guide pattern; ``Dataset.join``
    exists in this Ray version but the explicit form keeps the
    partitioning assumption visible and lets the same bucket column be
    reused by downstream stages).

    Skew: pass ``hot_keys`` ({key_value: salt_factor}, e.g. from
    ``detect_hot_keys``) — a hot probe key is spread over salt_factor
    buckets and the build side's hot rows replicate once per salt, so no
    single reducer sees the raw hot-key volume. Only valid for
    ``how='inner'``/'left' (replicas would duplicate right-outer rows)
    and a single-column key.
    """
    import pyarrow.compute as pc

    multi = not isinstance(on, str)
    on_cols = list(on) if multi else [on]
    if hot_keys and how not in ("inner", "left"):
        raise ValueError("hot_keys salting supports inner/left joins only")
    if hot_keys and multi:
        raise ValueError("hot_keys salting supports single-column keys")
    schema, lcols, rcols = _combined_schema(left, right,
                                            left_schema, right_schema)
    out_fields = [schema.field(c) for c in lcols]
    for c in rcols:
        if c in on_cols:
            continue
        out_fields.append(pa.field(c if c not in lcols else f"{c}{suffix}",
                                   schema.field(c).type))
    out_schema = pa.schema(out_fields)

    l = left.map_batches(_tagger(schema, on, num_buckets, "l", hot_keys),
                         batch_format="pyarrow")
    r = right.map_batches(_tagger(schema, on, num_buckets, "r", hot_keys),
                          batch_format="pyarrow")

    def join_bucket(g: pa.Table) -> pa.Table:
        # split sides while still Arrow: each side's own columns carry no
        # padding nulls, so the pandas conversion keeps int64 as int64
        lm = pc.equal(g["_side"], "l")
        lg = g.filter(lm).select(lcols).to_pandas()
        rg = g.filter(pc.invert(lm)).select(rcols).to_pandas()
        out = lg.merge(rg, on=on_cols, how=how, suffixes=("", suffix))
        return _to_schema(out, out_schema)

    return (l.union(r).groupby("_jb")
            .map_groups(join_bucket, batch_format="pyarrow"))


def asof_join(ds, right: pd.DataFrame, on: str, by: str | None = None,
              direction: str = "backward", suffix: str = "_r"):
    """As-of join against a broadcast right side: each left row picks the
    nearest right row at-or-before (``backward``) its ``on`` value,
    optionally exact-matching ``by`` first — ``pd.merge_asof`` per batch
    over the sorted broadcast table. Large-large as-of joins compose this
    with ``stable_bucket`` on ``by`` (sort within buckets)."""
    import ray

    right_sorted = right.sort_values(([by] if by else []) + [on],
                                     kind="stable").reset_index(drop=True)
    ref = ray.put(right_sorted)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(ref)
        b = batch.sort_values(on, kind="stable")
        out = pd.merge_asof(b, r.sort_values(on, kind="stable"), on=on,
                            by=by, direction=direction, suffixes=("", suffix))
        return out

    return ds.map_batches(f, batch_format="pandas")


def native_join(left, right, on: str, right_on: str | None = None,
                num_partitions: int = 16, how: str = "inner"):
    """Ray's built-in hash-partitioned ``Dataset.join`` (this Ray version
    ships it) — measured comparable to the explicit ``hash_join`` here;
    kept as an alternative since the explicit path makes the partitioning
    reusable downstream and works on older Ray."""
    return left.join(right, how, num_partitions=num_partitions,
                     on=(on,), right_on=(right_on or on,))


def asof_join_partitioned(left, right, on: str, by: str,
                          num_buckets: int = 16, suffix: str = "_r",
                          how: str = "inner", direction: str = "backward"):
    """Large-large as-of join: co-hash-partition BOTH sides on the exact
    ``by`` key, then within each bucket sort by ``on`` and
    ``pd.merge_asof``. ``direction='backward'`` (default) picks the
    nearest right row at-or-before the left row's ``on`` (DuckDB
    ``ASOF JOIN ... >=``); ``'forward'`` at-or-after (DuckDB ``<=``,
    hash-verified); ``'nearest'`` the smaller absolute gap (no SQL
    equivalent — pinned by a numpy-oracle pytest; on exact-tie gaps it
    inherits pandas' backward preference, so give payloads unique ``on``
    when tie identity matters). The guide's bucketed as-of pattern — no
    broadcast, one co-locating shuffle.

    ``how='inner'`` (default) drops unmatched left rows — DuckDB's
    ``ASOF JOIN`` semantics; ``how='left'`` keeps them with null payload
    (``pd.merge_asof`` shape). Both sides must share the ``on``/``by``
    column names (rename first); right-side payload columns keep their
    names (``suffix`` on clashes). Output blocks are conformed to one
    Arrow schema so per-bucket pandas dtype drift can't leak out.
    """
    import pyarrow.compute as pc

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    schema, lcols, rcols = _combined_schema(left, right)
    extra = [c if c not in lcols else f"{c}{suffix}"
             for c in rcols if c not in (on, by)]
    out_fields = [schema.field(c) for c in lcols] + [
        pa.field(n, schema.field(c).type)
        for n, c in zip(extra, [c for c in rcols if c not in (on, by)])]
    out_schema = pa.schema(out_fields)

    l = left.map_batches(_tagger(schema, by, num_buckets, "l"),
                         batch_format="pyarrow")
    r = right.map_batches(_tagger(schema, by, num_buckets, "r"),
                          batch_format="pyarrow")

    def join_bucket(g: pa.Table) -> pa.Table:
        lm = pc.equal(g["_side"], "l")
        lg = g.filter(lm).select(lcols).to_pandas() \
            .sort_values(on, kind="stable")
        rg = g.filter(pc.invert(lm)).select(rcols).to_pandas() \
            .sort_values(on, kind="stable")
        if not len(lg) or not len(rg):
            if how == "inner":
                return out_schema.empty_table()
            out = lg.copy()
            for c in extra:
                out[c] = None
            return _to_schema(out, out_schema)
        out = pd.merge_asof(lg, rg.assign(__m=1), on=on, by=by,
                            direction=direction, suffixes=("", suffix))
        if how == "inner":
            out = out[out["__m"].notna()]
        return _to_schema(out.drop(columns="__m"), out_schema)

    return (l.union(r).groupby("_jb")
            .map_groups(join_bucket, batch_format="pyarrow"))


def _coarse_keyed(ds, by: str, num_partitions: int):
    """Coarse hash-partition on a key: ONE Ray group per partition, a
    vectorized pandas pass inside — not one Ray group per key value
    (tiny-group dispatch overhead kills per-user windows at 10^8 users).
    """
    from chomper_ray.stages.merge import stable_bucket

    def add_pb(t: pa.Table) -> pa.Table:
        b = stable_bucket(t[by], num_partitions)
        return t.append_column("_pb", pa.array(b, type=pa.int32()))

    return ds.map_batches(add_pb, batch_format="pyarrow").groupby("_pb")


def sessionize(ds, by: str = "user_id", ts: str = "ts",
               tie: str = "event_id", gap_s: float = 1800.0,
               out: str = "session_id", num_partitions: int = 64):
    """Gap-based sessionization (web-pipeline staple): within each ``by``
    group ordered by (ts, tie), a new session starts when the gap from
    the previous event exceeds ``gap_s``. Session ids are 1-based per
    user. One co-locating shuffle on a COARSE key-hash partition; inside
    each partition everything is one vectorized pass (sort + grouped
    diff + cumsum) — no per-user Python."""
    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([by, ts, tie], kind="stable")
        dt = g.groupby(by, sort=False)[ts].diff()
        gap = dt.dt.total_seconds() if hasattr(dt, "dt") else dt
        new_s = (gap > gap_s) | gap.isna()  # first row per user = True
        sid = new_s.cumsum()
        first = sid.where(new_s & gap.isna()).groupby(
            g[by], sort=False).transform("first")
        g[out] = (sid - first + 1).astype("int64")
        return g.drop(columns=["_pb"])

    return _coarse_keyed(ds, by, num_partitions) \
        .map_groups(f, batch_format="pandas")


def windowed_running_sum(ds, by: str = "user_id", ts: str = "ts",
                         tie: str = "event_id", value: str = "value",
                         out: str = "run_sum", ndigits: int | None = 2,
                         num_partitions: int = 64):
    """Per-key running sum over the (ts, tie)-ordered stream — the
    coarse-partitioned, fully vectorized window (grouped cumsum inside
    one pandas pass per partition)."""
    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([by, ts, tie], kind="stable")
        s = g.groupby(by, sort=False)[value].cumsum()
        g[out] = s.round(ndigits) if ndigits is not None else s
        return g.drop(columns=["_pb"])

    return _coarse_keyed(ds, by, num_partitions) \
        .map_groups(f, batch_format="pandas")


def grouped_quantile(ds, key: str, value: str, q: float = 0.5,
                     out: str = "quantile"):
    """Distributed EXACT discrete quantile per group — without a global
    sort: per-block (key, value) count pre-aggregation (the combiner) →
    one grouped shuffle of (key, value, n) triples → per-group pick of
    the element at index ``floor((n-1)·q)`` from the cumulative counts
    (DuckDB ``quantile_disc`` semantics). Shuffle volume is the number of
    DISTINCT (key, value) pairs, not rows."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby([key, value], sort=False, dropna=False) \
            .size().rename("n").reset_index()

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass over ALL keys in this coarse partition
        g = g.groupby([key, value], sort=True)["n"].sum().reset_index()
        totals = g.groupby(key, sort=False)["n"].transform("sum")
        cum = g.groupby(key, sort=False)["n"].cumsum()
        idx = np.floor((totals - 1) * q)
        hit = (cum > idx).to_numpy()
        picked = g[hit].groupby(key, sort=True).first().reset_index()
        return pd.DataFrame({key: picked[key], out: picked[value]})

    partials = ds.map_batches(partial, batch_format="pandas")
    return _coarse_keyed(partials, key, num_partitions=32) \
        .map_groups(lambda g: pick(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def grouped_quantile_approx(ds, key: str, value: str, q: float = 0.5,
                            bins: int = 4096, out: str = "quantile",
                            max_groups: int = 1_000_000):
    """Approximate grouped quantile for CONTINUOUS values — the scale
    companion to ``grouped_quantile`` (whose distinct-(key,value) shuffle
    degenerates to all rows for float columns). Mergeable fixed-bin
    histogram sketch:

    1. per-(block, key) min/max → grouped reduce → {key: range} map
       broadcast via ``ray.put``;
    2. per-(block, key) ``bins``-bin histogram (one ``np.histogram`` per
       key per block) → grouped vector-sum → quantile read off the
       cumulative bins.

    Error ≤ (max−min)/bins per group. Shuffle volume: one histogram row
    per (block, key) — never the values.

    The broadcast range map is O(#groups) on the driver and in every
    task's heap, so the sketch only pays off for FEW groups × MANY values
    per group. Above ``max_groups`` distinct keys (counted distributed,
    before anything is collected) this routes to the exact co-partitioned
    ``grouped_quantile`` instead: at that cardinality the mean group is
    small, a row shuffle of (key, value) is the cheaper plan, and no
    per-group object ever forms on the driver. Result column/name
    contract is identical on both paths (exact path error = 0, within the
    sketch's error bar).
    """
    import math

    import ray

    def mm_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False, dropna=False)[value]
        return pd.DataFrame({key: g.min().index,
                             "mn": g.min().to_numpy(),
                             "mx": g.max().to_numpy()})

    def mm_final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "mn": [g["mn"].min()], "mx": [g["mx"].max()]})

    ranges_ds = (ds.map_batches(mm_partial, batch_format="pandas")
                 .groupby(key).map_groups(mm_final, batch_format="pandas")
                 .materialize())  # one row per group, held in the object store
    if ranges_ds.count() > max_groups:
        return grouped_quantile(ds, key, value, q=q, out=out)
    ranges = ranges_ds.to_pandas()  # bounded by max_groups — driver metadata
    rmap = {r[0]: (float(r[1]), float(r[2]))
            for r in ranges.itertuples(index=False)}
    rref = ray.put(rmap)

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        rm = ray.get(rref)
        rows = []
        for kv, grp in df.groupby(key, sort=False, dropna=False):
            mn, mx = rm[kv]
            rng = (mn, mx) if mx > mn else (mn, mn + 1e-12)
            h, _ = np.histogram(grp[value].dropna().to_numpy(),
                                bins=bins, range=rng)
            rows.append((kv, h.astype(np.int64)))
        return pd.DataFrame({key: [r[0] for r in rows],
                             "hist": [r[1] for r in rows]})

    def hist_final(g: pd.DataFrame) -> pd.DataFrame:
        rm = ray.get(rref)
        kv = g[key].iloc[0]
        mn, mx = rm[kv]
        h = np.sum(np.stack(g["hist"].to_numpy()), axis=0)
        total = int(h.sum())
        target = math.floor((total - 1) * q)
        b = int(np.searchsorted(np.cumsum(h), target + 1))
        width = (mx - mn) / bins if mx > mn else 0.0
        return pd.DataFrame({key: [kv], out: [mn + (b + 0.5) * width]})

    return (ds.map_batches(hist_partial, batch_format="pandas")
            .groupby(key).map_groups(hist_final, batch_format="pandas"))


def systematic_sample(ds, key: str, modulus: int, keep: int = 0):
    """Deterministic systematic sample: keep rows where
    ``key % modulus == keep`` — reproducible across runs/cluster sizes
    (unlike seeded ``random_sample``, whose output depends on block
    layout) and cheap: a vectorized filter, no shuffle, no materialized
    randomness. For string keys, hash to int with ``stable_bucket`` first.
    """
    import numpy as np
    import pyarrow as _pa

    def f(t):
        # pyarrow has no modulo kernel — numpy on the zero-copy view
        k = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(_pa.array(k % modulus == keep))

    return ds.map_batches(f, batch_format="pyarrow")


def sample_n_by_hash(ds, key: str, n: int):
    """Deterministic uniform-ish n-row sample via BOTTOM-K HASHING
    (min-wise sampling): keep the n rows whose stable key hash is
    smallest. Reproducible across runs, cluster sizes and block layouts
    (unlike seeded ``random_sample``), mergeable (per-block bottom-k →
    driver bottom-k over ≤ blocks×n candidates), and consistent: the
    sample of a superset contains the sample of the subset's survivors —
    the property that makes it the standard sketch for cross-snapshot
    overlap estimates."""
    def local(df: pd.DataFrame) -> pd.DataFrame:
        h = _hash_keys(df[key].to_numpy())
        df = df.assign(_h=h)
        return df.nsmallest(n, "_h")

    cand = ds.map_batches(local, batch_format="pandas").to_pandas()
    return cand.nsmallest(n, "_h").drop(columns="_h") \
        .sort_values(key, kind="stable").reset_index(drop=True)


def topk(ds, by: str, k: int, descending: bool = True,
         tie_break: str | None = None) -> pd.DataFrame:
    """Global top-k without a global sort: local top-k per block, then a
    driver-side reduce over ≤ num_blocks × k candidate rows."""
    order = [by] + ([tie_break] if tie_break else [])
    asc = [not descending] + ([True] if tie_break else [])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(order, ascending=asc, kind="stable").head(k)

    cand = ds.map_batches(local, batch_format="pandas").to_pandas()
    return cand.sort_values(order, ascending=asc, kind="stable").head(k) \
        .reset_index(drop=True)


def distinct(ds, columns: Sequence[str], num_partitions: int = 32):
    """Distinct rows over listed columns: per-block dedup (combiner) →
    ONE coarse hash-partition shuffle → vectorized per-partition dedup
    (not one Ray group per distinct combination — tiny-group dispatch)."""
    columns = list(columns)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df[columns].drop_duplicates()

    def add_pb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pb"] = (pd.util.hash_pandas_object(df[columns], index=False)
                     % num_partitions).astype("int32")
        return df

    return (ds.map_batches(local, batch_format="pandas")
              .map_batches(add_pb, batch_format="pandas")
              .groupby("_pb")
              .map_groups(lambda g: g.drop(columns=["_pb"]).drop_duplicates(),
                          batch_format="pandas"))


def hopping_window(ds, ts: str = "ts", size_s: int = 3600,
                   hop_s: int = 900, keys: Sequence[str] = ("user_id",),
                   sums: Sequence[str] = ("value",),
                   out: str = "w_start_s"):
    """Hopping (sliding) event-time windows: every event belongs to
    ``size_s / hop_s`` overlapping windows; aggregate per (keys, window).

    The expansion is a vectorized repeat/take inside ``map_batches``
    (each Arrow batch grows by the fixed factor k — no Python per row),
    after which the pre-aggregated ``grouped_agg`` combiner shrinks it
    back to one row per (key, window) per block before the shuffle, so
    the all-to-all volume is ~k× the TUMBLING window's combiner output,
    never k× the raw rows. Window starts are emitted as BIGINT epoch
    seconds (timezone-proof hash/compare; SQL parity via
    ``epoch_us(ts) // (hop*10^6) * hop - i*hop``).
    """
    import pyarrow.compute as pc

    if size_s % hop_s:
        raise ValueError("size_s must be a multiple of hop_s")
    k = size_s // hop_s
    hop_us = hop_s * 1_000_000

    def expand(t: pa.Table) -> pa.Table:
        us = pc.cast(t[ts], pa.int64()).to_numpy(zero_copy_only=False)
        last = (us // hop_us) * hop_s  # latest containing window, seconds
        n = len(us)
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        w = (np.repeat(last, k)
             - np.tile(np.arange(k, dtype=np.int64) * hop_s, n))
        return (t.drop_columns([ts]).take(pa.array(idx))
                .append_column(out, pa.array(w, type=pa.int64())))

    expanded = ds.map_batches(expand, batch_format="pyarrow")
    return grouped_agg(expanded, keys=[*keys, out], sums=list(sums),
                       counts=True)


def stratified_sample(ds, group: str, key: str, n: int,
                      num_partitions: int = 32):
    """Deterministic fixed-n-per-group sample (balanced sampling across
    languages / sources — the training-data mix knob): within each group
    keep the n rows whose Knuth multiplicative hash of ``key`` is
    smallest (ties broken by ``key``). Layout- and cluster-size-
    independent, superset-consistent per group, and SQL-replicable:
    ``row_number() over (partition by g order by (key*2654435761) %
    4294967296, key) <= n``.

    One coarse hash shuffle on ``group``; the per-partition pick is a
    vectorized sort + cumcount (no per-group Ray dispatch).
    """
    def pick(df: pd.DataFrame) -> pd.DataFrame:
        h = (df[key].to_numpy(np.uint64) * np.uint64(2654435761)
             ) % np.uint64(4294967296)
        df = df.assign(_h=h).sort_values([group, "_h", key], kind="stable")
        keep = df.groupby(group, sort=False).cumcount() < n
        return df[keep].drop(columns=["_h"])

    return _coarse_keyed(ds, group, num_partitions=num_partitions) \
        .map_groups(lambda g: pick(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def mixture_sample(ds, group: str, key: str, rates: dict,
                   default: float = 0.0):
    """Deterministic source-MIXTURE sampling — the Dolma/Pile "mix
    sources at different rates" knob: a row from source g survives iff
    its Knuth multiplicative key hash falls below ``rates[g]`` (a
    fraction in [0, 1]; unlisted sources get ``default``). Map-only —
    no shuffle, layout- and cluster-size-independent — and per-source
    CONSISTENT: raising one source's rate only ADDS rows of that source
    (same bottom-of-hash-range property as ``sample_n_by_hash``), so
    mix re-tuning never churns the rest of the corpus.

    SQL parity (same convention as ``stratified_sample``): keep iff
    ``(key * 2654435761) % 4294967296 < floor(rate * 4294967296)`` —
    exact while key < 2^32 (the int64 product never wraps).
    """
    m = np.uint64(4294967296)
    thr = {g: int(float(r) * 4294967296) for g, r in rates.items()}
    thr_default = int(float(default) * 4294967296)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        kv = df[key].to_numpy()
        # the SQL-parity contract only holds for 0 <= key < 2^32; a
        # negative or wider key would silently wrap in the uint64 cast
        # and diverge from sql_mixture_sample_where — fail loudly
        if len(kv) and (kv.min() < 0 or kv.max() >= 4294967296):
            raise ValueError(
                f"mixture_sample: key {key!r} outside [0, 2^32) "
                f"(min={kv.min()}, max={kv.max()}) — hash would wrap "
                "and break SQL parity; remap or widen the hash first")
        h = (kv.astype(np.uint64) * np.uint64(2654435761)) % m
        t = df[group].map(thr).fillna(thr_default).to_numpy(np.uint64)
        return df[h < t]

    return ds.map_batches(f, batch_format="pandas")


def sql_mixture_sample_where(group: str, key: str, rates: dict,
                             default: float = 0.0) -> str:
    """The WHERE clause replicating ``mixture_sample`` in SQL, built
    from the SAME threshold arithmetic so constants cannot drift."""
    cases = " ".join(
        f"WHEN '{g}' THEN {int(float(r) * 4294967296)}"
        for g, r in sorted(rates.items()))
    return (f"({key} * 2654435761) % 4294967296 < "
            f"CASE {group} {cases} "
            f"ELSE {int(float(default) * 4294967296)} END")


def range_join(left, right, point: str, lo: str = "lo", hi: str = "hi",
               chunk: int | None = None, num_buckets: int = 32,
               left_schema=None, right_schema=None):
    """Interval-containment join: ``left`` rows pair with every ``right``
    row whose ``[lo, hi]`` (inclusive) contains ``left[point]`` — the
    range join Ray Data has no native operator for (timestamps: cast to
    epoch int64 first). Int64 domain, inner join, column names must be
    disjoint across sides.

    Plan (one union shuffle, no cross product):

    1. The domain splits into fixed-width ``chunk`` intervals. Points tag
       with their containing chunk; each right interval REPLICATES to
       every chunk it overlaps (vectorized variable-k ``np.repeat``).
       Chunks coarse-bucket ``chunk_id % num_buckets`` into Ray groups.
    2. Inside a bucket, intervals sort by ``(chunk, lo)`` once; a single
       structured-dtype ``np.searchsorted`` per point batch finds each
       point's candidate slice (same chunk, ``lo <= p``), pairs expand by
       repeat/arange, and ``hi >= p`` filters. Pairs materialize only in
       the point's own chunk, so interval replicas never duplicate a pair.

    Partitioning assumption (document per use): the per-chunk interval
    count is bounded — replication factor per interval is
    ``width/chunk + 1``, candidate fan-in per point is the number of
    intervals overlapping its chunk. ``chunk=None`` derives a width of
    ~4× the mean interval width from one cheap pass over ``right``
    (assumed the small/dimension side); override when widths are skewed.
    """
    from chomper_ray.state.schema import conform

    schema, lcols, rcols = _combined_schema(left, right,
                                            left_schema, right_schema)
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"range_join requires disjoint columns; both "
                         f"sides have {sorted(overlap)}")
    out_schema = pa.schema([schema.field(c) for c in (*lcols, *rcols)])

    if chunk is None:
        st = right.map_batches(
            lambda df: pd.DataFrame({
                "n": [len(df)],
                "wsum": [int((df[hi] - df[lo]).sum())],
                "mn": [df[lo].min()], "mx": [df[hi].max()],
            }), batch_format="pandas").to_pandas()
        # empty-dataset to_pandas drops columns (Ray quirk, see
        # bloom_semi_join) — guard len before column access
        n = int(st["n"].sum()) if len(st) else 0
        if n == 0:
            chunk = 1
        else:
            span = int(st["mx"].max()) - int(st["mn"].min()) + 1
            avg_w = st["wsum"].sum() / n
            chunk = int(max(1, 4 * avg_w, span // 4096))

    w = np.int64(chunk)

    def tag_points(t: pa.Table) -> pa.Table:
        t = conform(t, schema)
        p = np.asarray(t[point].to_numpy(zero_copy_only=False), np.int64)
        ck = np.floor_divide(p, w)
        t = t.append_column("_ck", pa.array(ck, type=pa.int64()))
        t = t.append_column("_jb", pa.array(
            (ck % num_buckets).astype(np.int32), type=pa.int32()))
        return t.append_column("_side", pa.array(["p"] * t.num_rows))

    def tag_intervals(t: pa.Table) -> pa.Table:
        t = conform(t, schema)
        lo_v = np.asarray(t[lo].to_numpy(zero_copy_only=False), np.int64)
        hi_v = np.asarray(t[hi].to_numpy(zero_copy_only=False), np.int64)
        c0 = np.floor_divide(lo_v, w)
        c1 = np.floor_divide(np.maximum(hi_v, lo_v), w)
        k = (c1 - c0 + 1).astype(np.int64)  # chunks overlapped
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), k)
        ck = np.concatenate(
            [np.arange(a, b + 1, dtype=np.int64)
             for a, b in zip(c0, c1)]) if t.num_rows else \
            np.empty(0, np.int64)
        t = t.take(pa.array(idx))
        t = t.append_column("_ck", pa.array(ck, type=pa.int64()))
        t = t.append_column("_jb", pa.array(
            (ck % num_buckets).astype(np.int32), type=pa.int32()))
        return t.append_column("_side", pa.array(["i"] * t.num_rows))

    key_dt = np.dtype([("c", "<i8"), ("l", "<i8")])

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        pts = g[g["_side"] == "p"]
        ivs = g[g["_side"] == "i"]
        if not len(pts) or not len(ivs):
            return _to_schema(
                pd.DataFrame({f.name: pd.Series(dtype="object")
                              for f in out_schema}), out_schema)
        ic = ivs["_ck"].to_numpy(np.int64)
        il = ivs[lo].to_numpy(np.int64)
        ih = ivs[hi].to_numpy(np.int64)
        order = np.lexsort((il, ic))
        ic, il, ih = ic[order], il[order], ih[order]
        keys = np.empty(len(ic), key_dt)
        keys["c"], keys["l"] = ic, il

        p = pts[point].to_numpy(np.int64)
        pc_ = pts["_ck"].to_numpy(np.int64)
        v_hi = np.empty(len(p), key_dt)
        v_hi["c"], v_hi["l"] = pc_, p
        v_lo = np.empty(len(p), key_dt)
        v_lo["c"], v_lo["l"] = pc_, np.iinfo(np.int64).min
        end = np.searchsorted(keys, v_hi, side="right")
        start = np.searchsorted(keys, v_lo, side="left")
        cnt = end - start
        pt_idx = np.repeat(np.arange(len(p)), cnt)
        off = np.concatenate([[0], np.cumsum(cnt)])
        iv_rank = (np.arange(int(cnt.sum())) - off[pt_idx]
                   + start[pt_idx])
        keep = ih[iv_rank] >= p[pt_idx]
        pt_idx, iv_rank = pt_idx[keep], iv_rank[keep]

        lrows = pts.iloc[pt_idx][lcols].reset_index(drop=True)
        rrows = ivs.iloc[order[iv_rank]][rcols].reset_index(drop=True)
        return _to_schema(pd.concat([lrows, rrows], axis=1), out_schema)

    l = left.map_batches(tag_points, batch_format="pyarrow")
    r = right.map_batches(tag_intervals, batch_format="pyarrow")
    return (l.union(r).groupby("_jb")
            .map_groups(join_bucket, batch_format="pandas"))


def lag_lead(ds, by: str, order: str, value: str, tie: str | None = None,
             lag_out: str = "lag_value", lead_out: str = "lead_value",
             num_partitions: int = 64):
    """Per-key ``lag(value, 1)`` / ``lead(value, 1)`` over the
    ``(order, tie)``-ordered stream — SQL's LAG/LEAD window functions.
    Same shape as ``windowed_running_sum``: one coarse key-hash shuffle,
    then a single vectorized pandas pass per partition (sort + grouped
    shift); first/last row per key gets null. No per-key Ray dispatch."""
    keys = [by, order] + ([tie] if tie else [])

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys, kind="stable")
        grp = g.groupby(by, sort=False)[value]
        g[lag_out] = grp.shift(1)
        g[lead_out] = grp.shift(-1)
        return g.drop(columns=["_pb"])

    return _coarse_keyed(ds, by, num_partitions) \
        .map_groups(f, batch_format="pandas")


def group_rank(ds, by: str, order: str, tie: str | None = None,
               descending: bool = False, method: str = "row_number",
               out: str = "rank", num_partitions: int = 64):
    """Per-key ranking — SQL ``row_number()`` / ``rank()`` /
    ``dense_rank()`` ``OVER (PARTITION BY by ORDER BY order)``. One
    coarse key-hash shuffle; inside, one sort + grouped cumcount/rank
    pass (vectorized; pandas ``rank`` handles ties natively). For
    deterministic ``row_number`` pass ``tie`` — SQL row_number over a
    non-unique order is nondeterministic and won't hash-compare."""
    if method not in ("row_number", "rank", "dense_rank"):
        raise ValueError(f"unknown method {method!r}")
    sort_cols = [by, order] + ([tie] if tie else [])
    # tie ALWAYS ascends — SQL's deterministic form is
    # `ORDER BY order DESC, tie` (tie untouched by the direction)
    asc = [True, not descending] + [True] * (1 if tie else 0)

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=asc, kind="stable")
        if method == "row_number":
            r = g.groupby(by, sort=False).cumcount() + 1
        else:
            pm = "min" if method == "rank" else "dense"
            r = g.groupby(by, sort=False)[order].rank(
                method=pm, ascending=not descending)
        g[out] = r.astype("int64")
        return g.drop(columns=["_pb"])

    return _coarse_keyed(ds, by, num_partitions) \
        .map_groups(f, batch_format="pandas")


def pivot_counts(ds, key: str, cat: str, categories: Sequence[str],
                 value: str | None = None, ndigits: int | None = None):
    """Pivot a category column into per-category aggregate columns —
    SQL's conditional aggregation (``count(*) FILTER (WHERE cat='x')``,
    or ``sum(value) FILTER`` with ``value``). One column per category in
    ``categories`` (explicit: a distributed engine can't discover output
    SCHEMA lazily — the category set is either known or one cheap
    ``distinct`` away), named ``<cat value>``; unlisted categories are
    ignored.

    Shape: the pivot happens INSIDE the per-block combiner (vectorized
    boolean masks × groupby-sum), so the shuffle is the same one-row-
    per-key-per-block exchange as ``grouped_agg`` — pivoting is free, no
    extra pass."""
    cats = list(categories)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {}
        cv = df[cat].astype(str)
        src = df[value] if value is not None else None
        for c in cats:
            m = (cv == c)
            cols[c] = (src.where(m, 0.0) if src is not None
                       else m.astype("int64"))
        tmp = pd.DataFrame(cols)
        tmp[key] = df[key].values
        return tmp.groupby(key, sort=False, dropna=False).sum() \
            .reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key, sort=False, dropna=False).sum().reset_index()
        if ndigits is not None:
            for c in cats:
                out[c] = out[c].round(ndigits)
        return out

    # combiner → single small grouped shuffle (same plan as grouped_agg)
    return ds.map_batches(partial, batch_format="pandas") \
        .groupby(key).map_groups(final, batch_format="pandas")


def rollup_agg(ds, keys: Sequence[str], sums: Sequence[str] = (),
               counts: bool = True, ndigits: int | None = None,
               sets: Sequence[Sequence[str]] | None = None,
               schema: pa.Schema | None = None):
    """Grouping-sets aggregation — SQL's ``GROUP BY ROLLUP(keys...)``
    (default: every prefix of ``keys`` down to the grand total), or an
    explicit list of ``sets`` (subsets of ``keys``; pass all subsets for
    CUBE). Key columns absent from a grouping set come back NULL, as in
    SQL without GROUPING().

    Shape: raw rows are scanned ONCE — the ``grouped_agg`` combiner at
    the finest grain (one row per key-combo per block rides the
    shuffle). Every coarser set then re-aggregates the finest RESULT,
    which is one row per distinct key-combo — vanishingly small next to
    the input — so each extra grouping set costs a combiner pass over
    that small dataset, never another scan or raw-row shuffle. All
    aggregates here are decomposable (sum / count), which is what makes
    re-aggregating aggregates legal.

    Key columns are assumed non-null (SQL's ROLLUP has the same
    ambiguity otherwise). ``schema``: Arrow schema of ``ds`` — pass it
    when ``ds`` already carries a shuffle (``ds.schema()`` would execute
    it); defaults to probing ``ds.schema()``.
    """
    keys = list(keys)
    sum_cols = sorted(sums)
    if sets is None:
        sets = [keys[:i] for i in range(len(keys) - 1, -1, -1)]
    sets = [list(s) for s in sets]
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s} is not a subset of {keys}")

    if schema is None:
        schema = ds.schema()
    in_types = {n: _arrow_type(t) for n, t in zip(schema.names,
                                                  schema.types)}
    out_fields = [pa.field(k, in_types[k]) for k in keys]
    for c in sum_cols:
        t = in_types[c]
        out_fields.append(pa.field(
            f"sum_{c}",
            pa.float64() if (ndigits is not None
                             or pa.types.is_floating(t)) else pa.int64()))
    if counts:
        out_fields.append(pa.field("n_rows", pa.int64()))
    out_schema = pa.schema(out_fields)

    def _round(df: pd.DataFrame) -> pd.DataFrame:
        if ndigits is not None:
            for c in sum_cols:
                df[f"sum_{c}"] = df[f"sum_{c}"].round(ndigits)
        return df

    # one raw scan: finest-grain combiner + small shuffle
    finest = grouped_agg(ds, keys, sums=sum_cols, counts=True)

    def conform_finest(df: pd.DataFrame) -> pa.Table:
        df = _round(df)
        if not counts:
            df = df.drop(columns=["n_rows"])
        return _to_schema(df, out_schema)

    pieces = [finest.map_batches(conform_finest, batch_format="pandas")]

    agg_map = {f"sum_{c}": "sum" for c in sum_cols}
    agg_map["n_rows"] = "sum"

    for s in sets:
        def make(s=s):
            dropped = [k for k in keys if k not in s]

            def partial_s(df: pd.DataFrame) -> pd.DataFrame:
                if s:
                    return df.groupby(s, sort=False, dropna=False) \
                        .agg(agg_map).reset_index()
                out = df.agg(agg_map).to_frame().T
                out["n_rows"] = out["n_rows"].astype("int64")
                return out

            def final_s(df: pd.DataFrame) -> pa.Table:
                if s:
                    out = df.groupby(s, sort=False, dropna=False) \
                        .agg(agg_map).reset_index()
                else:
                    out = df.agg(agg_map).to_frame().T
                for k in dropped:
                    out[k] = None
                return _to_schema(_round(out if counts else
                                         out.drop(columns=["n_rows"])),
                                  out_schema)
            return partial_s, final_s

        partial_s, final_s = make()
        lvl = finest.map_batches(partial_s, batch_format="pandas")
        if s:
            lvl = (lvl.map_batches(
                       lambda df, s=s: df.assign(_pb=(
                           pd.util.hash_pandas_object(df[s], index=False)
                           % 32).astype("int32")),
                       batch_format="pandas")
                   .groupby("_pb")
                   .map_groups(lambda g, f=final_s:
                               f(g.drop(columns=["_pb"])),
                               batch_format="pandas"))
        else:
            # grand total: every partial is one row; a single reduce task
            # sees #blocks rows — bounded by construction
            lvl = lvl.repartition(1).map_batches(final_s,
                                                 batch_format="pandas")
        pieces.append(lvl)

    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out


def grouped_collect(ds, key: str, value: str, order: Sequence[str],
                    sep: str = ",", out: str = "collected",
                    num_partitions: int = 32):
    """Ordered grouped concatenation — SQL's
    ``string_agg(value, sep ORDER BY order...)``. Unlike the
    ``grouped_agg`` family this aggregate is NOT decomposable without
    carrying every element, so the raw ``(key, order, value)`` rows ride
    one coarse key-hash shuffle (irreducible for an order-sensitive
    collect); inside each coarse partition ONE vectorized polars
    sort + group_by + str.join handles every key in the partition —
    no per-key UDF dispatch at high key cardinality.

    Output strings are O(rows-per-key); keys hash-spread across
    ``num_partitions`` so a partition holds ~rows/num_partitions raw
    rows regardless of key skew (a single pathological key still lands
    in one partition — same bound SQL engines accept for string_agg).
    """
    order = list(order)

    def build(g: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        t = pl.from_pandas(g[[key, value] + order])
        agg = (t.sort(order)
               .group_by(key, maintain_order=False)
               .agg(pl.col(value).str.join(sep).alias(out))
               .sort(key))
        return agg.to_pandas()

    cols = [key, value] + order
    pruned = ds.map_batches(lambda t: t.select(cols),
                            batch_format="pyarrow")
    return _coarse_keyed(pruned, key, num_partitions) \
        .map_groups(lambda g: build(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def grouped_stats(ds, keys: Sequence[str], x: str, y: str | None = None,
                  ndigits: int = 6, num_partitions: int = 32):
    """Second-moment grouped statistics: per-key ``n``, ``avg_x``,
    ``std_x`` (population), and — with ``y`` — ``cov_xy`` (population)
    and ``corr_xy``. All are decomposable through (Σx, Σx², Σxy, n)
    partials, so the plan is exactly the ``grouped_agg`` combiner shape:
    one row of moments per key per block rides the shuffle, never raw
    rows. Results round to ``ndigits`` so block-order-dependent float
    summation agrees with the SQL oracle's (``stddev_pop`` /
    ``covar_pop`` / ``corr``).
    """
    keys = list(keys)
    cols = keys + [x] + ([y] if y else [])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({k: df[k] for k in keys})
        d["sx"] = df[x]
        d["sxx"] = df[x] * df[x]
        if y:
            d["sy"] = df[y]
            d["syy"] = df[y] * df[y]
            d["sxy"] = df[x] * df[y]
        g = d.groupby(keys, sort=False, dropna=False)
        out = g.sum()
        out["n"] = g.size()
        return out.reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False).sum().reset_index()
        n = g["n"]
        mx = g["sx"] / n
        vx = g["sxx"] / n - mx * mx
        out = g[keys].copy()
        out["n"] = n.astype("int64")
        out["avg_x"] = mx.round(ndigits)
        out["std_x"] = np.sqrt(vx.clip(lower=0)).round(ndigits)
        if y:
            my = g["sy"] / n
            vy = g["syy"] / n - my * my
            cov = g["sxy"] / n - mx * my
            out["cov_xy"] = cov.round(ndigits)
            denom = np.sqrt((vx * vy).clip(lower=0))
            out["corr_xy"] = (cov / denom.replace(0, np.nan)) \
                .round(ndigits)
        return out

    pruned = ds.map_batches(lambda t: t.select(cols),
                            batch_format="pyarrow")
    partials = pruned.map_batches(partial, batch_format="pandas")
    return _coarse_keyed(partials, keys[0], num_partitions) \
        .map_groups(lambda g: final(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def grouped_regression(ds, keys: Sequence[str], x: str, y: str,
                       ndigits: int = 6, num_partitions: int = 32):
    """Per-group simple linear regression — closed form from the SAME
    decomposable (n, Σx, Σx², Σy, Σy², Σxy) combiner as
    ``grouped_stats``: slope = covar_pop/var_pop, intercept =
    ȳ − slope·x̄, r² = corr² — exactly SQL's ``regr_slope`` /
    ``regr_intercept`` / ``regr_r2``. One row of moments per key per
    block rides the shuffle; groups with zero x-variance yield null
    slope (SQL convention)."""
    keys = list(keys)
    cols = keys + [x, y]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({k: df[k] for k in keys})
        d["sx"] = df[x]
        d["sxx"] = df[x] * df[x]
        d["sy"] = df[y]
        d["syy"] = df[y] * df[y]
        d["sxy"] = df[x] * df[y]
        g = d.groupby(keys, sort=False, dropna=False)
        out = g.sum()
        out["n"] = g.size()
        return out.reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False).sum().reset_index()
        n = g["n"]
        mx, my = g["sx"] / n, g["sy"] / n
        vx = g["sxx"] / n - mx * mx
        vy = g["syy"] / n - my * my
        cov = g["sxy"] / n - mx * my
        slope = cov / vx.where(vx > 0)
        out = g[keys].copy()
        out["n"] = n.astype("int64")
        out["slope"] = slope.round(ndigits)
        out["intercept"] = (my - slope * mx).round(ndigits)
        denom = (vx * vy).clip(lower=0)
        r2 = (cov * cov / pd.Series(np.where(denom > 0, denom, np.nan)))
        out["r2"] = r2.round(ndigits)
        return out

    pruned = ds.map_batches(lambda t: t.select(cols),
                            batch_format="pyarrow")
    partials = pruned.map_batches(partial, batch_format="pandas")
    return _coarse_keyed(partials, keys[0], num_partitions) \
        .map_groups(lambda g: final(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def grouped_mode(ds, key: str, value: str, num_partitions: int = 32):
    """Most frequent ``value`` per ``key`` (SQL's deterministic mode:
    highest count, ties broken by smallest value). Decomposable: each
    block pre-counts (key, value) pairs, so the shuffle carries one row
    per distinct pair per block — the ``grouped_agg`` combiner shape —
    then one vectorized sort + drop_duplicates per coarse key partition
    picks every key's winner at once. Output: ``key, value, n``."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby([key, value], sort=False, dropna=False) \
            .size().rename("n").reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key, value], sort=False, dropna=False)["n"] \
            .sum().reset_index()
        g = g.sort_values([key, "n", value],
                          ascending=[True, False, True], kind="stable")
        return g.drop_duplicates(subset=[key], keep="first") \
            .reset_index(drop=True)

    pruned = ds.map_batches(lambda t: t.select([key, value]),
                            batch_format="pyarrow")
    partials = pruned.map_batches(partial, batch_format="pandas")
    return _coarse_keyed(partials, key, num_partitions) \
        .map_groups(lambda g: final(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def explode_split(ds, col: str, sep: str = " ", keep: Sequence[str] = (),
                  out: str = "token", pos_out: str = "pos"):
    """Split a string column and emit one row per element with its
    1-based position — SQL's ``unnest(string_split(..)) WITH
    ORDINALITY``. Pure per-block expansion (polars split + aligned
    multi-column explode, Rust-vectorized): no shuffle, output blocks
    grow by the split factor and the streaming executor re-slices them
    downstream. ``keep``: passthrough columns to replicate per element.
    """
    keep = list(keep)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        t = pl.from_pandas(batch[keep + [col]])
        lst = pl.col(col).str.split(sep)
        ex = (t.with_columns(lst.alias("__l"))
              .with_columns(pl.int_ranges(1, pl.col("__l").list.len() + 1)
                            .alias(pos_out))
              .explode(["__l", pos_out])
              .rename({"__l": out}))
        return ex.drop(col).to_pandas() if col not in keep \
            else ex.to_pandas()

    cols = list(dict.fromkeys(keep + [col]))
    return ds.map_batches(lambda t: t.select(cols),
                          batch_format="pyarrow") \
        .map_batches(f, batch_format="pandas")


def set_op(left, right, columns: Sequence[str], op: str = "intersect",
           num_partitions: int = 32,
           left_columns: Sequence[str] | None = None,
           right_columns: Sequence[str] | None = None):
    """SQL set operations with DISTINCT semantics: ``intersect`` (rows
    in both inputs) or ``except`` (rows in left and not right). Both
    sides are projected to ``columns`` (or per-side names mapped onto
    them), tagged, and co-located by ONE row-hash shuffle; inside each
    bucket a vectorized per-side drop_duplicates + indicator merge
    decides membership for every row at once. Identical rows always
    hash to the same bucket, so bucket-local set logic is globally
    exact — the same partitioning argument ``distinct`` uses."""
    if op not in ("intersect", "except"):
        raise ValueError(f"unknown set op: {op}")
    columns = list(columns)
    lcols = list(left_columns) if left_columns else columns
    rcols = list(right_columns) if right_columns else columns

    def tagger(cols, side):
        def f(t: pa.Table) -> pa.Table:
            t = t.select(cols).rename_columns(columns)
            h = pd.util.hash_pandas_object(
                t.to_pandas()[columns], index=False).to_numpy()
            return t.append_column(
                "_pb", pa.array((h % num_partitions).astype("int32"))) \
                .append_column("_side",
                               pa.array(np.full(len(t), side, "int8")))
        return f

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0][columns].drop_duplicates()
        r = g[g["_side"] == 1][columns].drop_duplicates()
        m = l.merge(r, on=columns, how="left", indicator=True)
        keep = m["_merge"] == ("both" if op == "intersect"
                               else "left_only")
        return m[keep][columns].reset_index(drop=True)

    both = left.map_batches(tagger(lcols, 0), batch_format="pyarrow") \
        .union(right.map_batches(tagger(rcols, 1), batch_format="pyarrow"))
    return both.groupby("_pb") \
        .map_groups(lambda g: bucket(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def table_diff(left, right, key: str | Sequence[str],
               compare: Sequence[str], num_partitions: int = 32):
    """Keyed snapshot diff — the CDC reconciliation staple: classify
    every key across two snapshot versions as ``added`` (right only),
    ``removed`` (left only), ``changed`` (in both, any ``compare``
    column differs — null-safe, SQL ``IS DISTINCT FROM``), or
    ``unchanged``. Inputs must be key-unique snapshots. ONE row-hash
    shuffle on the key co-locates both versions (same partitioning
    argument as ``set_op``); inside each bucket a vectorized outer
    merge + column compare classifies every key at once. Output: key
    column(s) + ``change``."""
    keys = [key] if isinstance(key, str) else list(key)
    compare = list(compare)
    cols = keys + compare

    def tagger(side):
        def f(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            h = pd.util.hash_pandas_object(
                t.to_pandas()[keys], index=False).to_numpy()
            return t.append_column(
                "_pb", pa.array((h % num_partitions).astype("int32"))) \
                .append_column("_side",
                               pa.array(np.full(len(t), side, "int8")))
        return f

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["_side"] == 0, cols]
        r = g.loc[g["_side"] == 1, cols]
        m = l.merge(r, on=keys, how="outer", suffixes=("_l", "_r"),
                    indicator=True)
        diff = np.zeros(len(m), dtype=bool)
        for c in compare:
            a, b = m[f"{c}_l"], m[f"{c}_r"]
            diff |= ((a != b) & ~(a.isna() & b.isna())).to_numpy()
        change = np.where(
            m["_merge"] == "left_only", "removed",
            np.where(m["_merge"] == "right_only", "added",
                     np.where(diff, "changed", "unchanged")))
        out = m[keys].copy()
        out["change"] = change
        return out

    both = left.map_batches(tagger(0), batch_format="pyarrow") \
        .union(right.map_batches(tagger(1), batch_format="pyarrow"))
    return both.groupby("_pb") \
        .map_groups(lambda g: bucket(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def funnel(ds, steps: Sequence[str], by: str = "user_id", ts: str = "ts",
           event: str = "event_type", num_partitions: int = 32):
    """Ordered-step funnel (web-analytics staple): per ``by`` key, count
    how many of ``steps`` completed IN ORDER — step i+1 counts only
    strictly after the earliest qualifying time of step i. Output one
    row per key: ``(by, steps_completed)``.

    Shape: one coarse key-hash shuffle (a user's events live in one
    partition); inside, k vectorized passes (k = len(steps), tiny):
    each pass filters that step's rows, maps the previous step's
    earliest time onto them, and takes a grouped min of the qualifying
    times — no per-user Python at any cardinality."""
    steps = list(steps)

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        users = pd.Index(g[by].unique())
        done = pd.Series(0, index=users, dtype="int64")
        prev = None  # Series: user -> earliest completion time of step i
        for i, step in enumerate(steps):
            rows = g[g[event] == step]
            if prev is not None:
                bound = rows[by].map(prev)
                rows = rows[bound.notna() & (rows[ts] > bound)]
            cur = rows.groupby(by, sort=False)[ts].min()
            done.loc[done.index.isin(cur.index)] = i + 1
            prev = cur
            if not len(cur):
                break
        return pd.DataFrame({by: users.to_numpy(),
                             "steps_completed": done.to_numpy()})

    pruned = ds.map_batches(lambda t: t.select([by, ts, event]),
                            batch_format="pyarrow")
    return _coarse_keyed(pruned, by, num_partitions) \
        .map_groups(lambda g: walk(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def merge_intervals(ds, key: str, lo: str = "lo", hi: str = "hi",
                    num_partitions: int = 32):
    """Coalesce overlapping-or-touching ``[lo, hi]`` intervals per key
    (SQL's gaps-and-islands): output one row per merged island with
    ``lo`` = min start, ``hi`` = max end, ``n_merged`` = source count.
    An interval starts a new island iff its start exceeds the running
    max end of everything before it (ordered by ``lo, hi``).

    Shape: one coarse key-hash shuffle co-locates each key's intervals;
    inside a partition a single vectorized sort + per-key cummax/shift
    island assignment handles every key at once — no per-key dispatch,
    no cross-partition state (a key lives wholly in one partition)."""

    def coalesce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, lo, hi], kind="stable") \
            .reset_index(drop=True)
        run_hi = g.groupby(key, sort=False)[hi].cummax().shift(1)
        first = g[key] != g[key].shift(1)
        new_island = (first | (g[lo] > run_hi)).cumsum()
        out = g.groupby([key, new_island], sort=False).agg(
            **{lo: (lo, "min"), hi: (hi, "max"),
               "n_merged": (lo, "size")}).reset_index(level=0)
        out["n_merged"] = out["n_merged"].astype("int64")
        return out.reset_index(drop=True)

    pruned = ds.map_batches(lambda t: t.select([key, lo, hi]),
                            batch_format="pyarrow")
    return _coarse_keyed(pruned, key, num_partitions) \
        .map_groups(lambda g: coalesce(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def column_histogram(ds, col: str, lo: float, hi: float, bins: int,
                     num_partitions: int = 16):
    """Fixed-bin histogram of a numeric column over ``[lo, hi]`` —
    the data-profiling primitive. Values outside the range are dropped
    (SQL ``BETWEEN`` parity); the top edge folds into the last bin.
    Decomposable: each block bin-counts locally (one row per non-empty
    bin per block rides the shuffle), the final pass sums. Bin
    arithmetic is IEEE-double ``floor((x-lo)/width)`` — bit-identical
    to the SQL oracle's."""
    width = (float(hi) - float(lo)) / bins

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[col].to_numpy(dtype="float64")
        x = x[(x >= lo) & (x <= hi)]
        b = np.minimum(np.floor((x - lo) / width),
                       bins - 1).astype(np.int64)
        ub, cnt = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": ub, "n": cnt.astype("int64")})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("bin", sort=True)["n"].sum().reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    partials = ds.map_batches(lambda t: t.select([col]),
                              batch_format="pyarrow") \
        .map_batches(partial, batch_format="pandas")
    return _coarse_keyed(partials, "bin", num_partitions) \
        .map_groups(lambda g: final(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def grouped_quantiles(ds, key: str, value: str,
                      qs: Sequence[float] = (0.25, 0.5, 0.75),
                      num_partitions: int = 32):
    """Several EXACT discrete quantiles per group in ONE pass — same
    distinct-(key,value)-count combiner plan as ``grouped_quantile``,
    amortized over every requested quantile (the shuffle and the sorted
    cumulative pass are shared; each extra q is one extra vectorized
    pick). Output columns named ``p<q*100>`` (``p25``, ``p50`` ...).

    Rank convention is SQL ``percentile_disc``/``quantile_disc``:
    the smallest value whose cumulative count reaches ``ceil(q*n)`` —
    NOT numpy's ``floor((n-1)*q)`` (they agree only at q=0.5)."""
    qs = list(qs)
    names = [f"p{int(round(q * 100)):02d}" for q in qs]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby([key, value], sort=False, dropna=False) \
            .size().rename("n").reset_index()

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([key, value], sort=True)["n"].sum().reset_index()
        totals = g.groupby(key, sort=False)["n"].transform("sum")
        cum = g.groupby(key, sort=False)["n"].cumsum()
        out = None
        for q, name in zip(qs, names):
            rank = np.maximum(np.ceil(totals * q), 1)
            hit = (cum >= rank).to_numpy()
            picked = g[hit].groupby(key, sort=True).first().reset_index()
            col = pd.DataFrame({key: picked[key], name: picked[value]})
            out = col if out is None else out.merge(col, on=key)
        return out

    pruned = ds.map_batches(lambda t: t.select([key, value]),
                            batch_format="pyarrow")
    partials = pruned.map_batches(partial, batch_format="pandas")
    return _coarse_keyed(partials, key, num_partitions) \
        .map_groups(lambda g: pick(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def group_topk(ds, by: str, order: str, k: int, tie: str | None = None,
               descending: bool = True, out: str = "rank",
               num_partitions: int = 64):
    """Top-k rows per key (SQL ``QUALIFY row_number() <= k``): rank via
    ``group_rank`` (row_number + tie column for determinism) and filter
    inside the same partition pass — the filter runs before anything
    leaves the bucket, so downstream sees at most k rows per key."""
    ranked = group_rank(ds, by=by, order=order, tie=tie,
                        descending=descending, method="row_number",
                        out=out, num_partitions=num_partitions)
    return ranked.map_batches(lambda df: df[df[out] <= k],
                              batch_format="pandas")


def profile_columns(ds, columns: Sequence[str], ndigits: int = 6,
                    exact_decimals: int | None = None):
    """Numeric-column profiling in ONE streaming pass: per column
    ``n`` (non-null count), ``n_null``, ``min``, ``max``, ``avg``.
    Every block emits one row PER COLUMN (all columns profiled in the
    same pass — the scan is shared); the reduce handles #columns ×
    #blocks rows, bounded by construction. The classic first query
    against an unknown 100 TB table: cost = one read, no shuffle of
    data rows.

    ``exact_decimals``: when the columns are fixed-point values stored
    as doubles (e.g. money with 2 decimal digits), accumulate the sum
    as scaled int64 (``round(x * 10**d)``) so the mean is EXACT and
    independent of block order — a float partial-sum reduce is
    order-dependent at the ULP level, which breaks value-hash parity
    with a SQL oracle at rounding boundaries (round-4 verdict,
    profile_lineitem). int64 cents hold ~9.2e16 dollars: safe at any
    realistic scale; the per-block partial stays O(#columns)."""
    columns = list(columns)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in columns:
            x = df[c]
            if exact_decimals is not None:
                v = x.dropna().to_numpy(dtype="float64")
                sm = int(np.round(v * (10 ** exact_decimals))
                         .astype("int64").sum())
            else:
                sm = float(x.sum())
            rows.append({"col": c, "n": int(x.notna().sum()),
                         "n_null": int(x.isna().sum()),
                         "mn": x.min(), "mx": x.max(),
                         "sm": sm})
        return pd.DataFrame(rows)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("col", sort=True).agg(
            n=("n", "sum"), n_null=("n_null", "sum"),
            mn=("mn", "min"), mx=("mx", "max"),
            sm=("sm", "sum")).reset_index()
        out = g[["col", "n", "n_null"]].copy()
        out["min"] = g["mn"].astype("float64").round(ndigits)
        out["max"] = g["mx"].astype("float64").round(ndigits)
        if exact_decimals is not None:
            # mirror the oracle's op order exactly:
            # (exact_int_sum / 10^d) / n — both sides run the same two
            # IEEE divisions on the same exact integer — and round
            # half-AWAY-from-zero like SQL round() (np.round is
            # half-to-even: an exact-half avg like 25.40225 would round
            # down while DuckDB rounds up)
            scale = float(10 ** exact_decimals)
            avg = ((g["sm"].astype("float64") / scale)
                   / g["n"]).to_numpy(dtype="float64")
            p = float(10 ** ndigits)
            out["avg"] = np.sign(avg) * np.floor(np.abs(avg) * p + 0.5) / p
        else:
            out["avg"] = (g["sm"] / g["n"]).round(ndigits)
        return out

    pruned = ds.map_batches(lambda t: t.select(columns),
                            batch_format="pyarrow")
    return pruned.map_batches(partial, batch_format="pandas") \
        .repartition(1) \
        .map_batches(final, batch_format="pandas")


def grouped_nunique(ds, key: str, value: str, out: str = "n_distinct",
                    num_partitions: int = 32):
    """Exact ``count(DISTINCT value)`` per key. Per-block distinct
    (key, value) pairs ride the shuffle (the same volume bound as
    ``grouped_quantile``: distinct pairs, never raw rows); inside each
    coarse key partition one vectorized global-dedup + per-key count
    finishes the job. For approximate at extreme pair cardinality, the
    HLL sketch (``stages/sketches.py``) slots in the same plan."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, value]].drop_duplicates()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        out_df = d.groupby(key, sort=False)[value].size() \
            .rename(out).reset_index()
        out_df[out] = out_df[out].astype("int64")
        return out_df

    pruned = ds.map_batches(lambda t: t.select([key, value]),
                            batch_format="pyarrow")
    partials = pruned.map_batches(partial, batch_format="pandas")
    return _coarse_keyed(partials, key, num_partitions) \
        .map_groups(lambda g: final(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def cross_join(ds, small: pd.DataFrame, suffix: str = "_r"):
    """Cartesian product with a SMALL broadcast side (dimension grids,
    parameter sweeps): the small frame ships once via ``ray.put``; each
    batch expands by ``len(small)`` locally — no shuffle. Output size is
    rows × len(small) by definition; bound the small side, not the
    Dataset."""
    import ray

    ref = ray.put(small)

    def f(batch: pd.DataFrame, ref=ref) -> pd.DataFrame:
        s = ray.get(ref)
        return batch.merge(s, how="cross", suffixes=("", suffix))

    return ds.map_batches(f, batch_format="pandas")


def window_dist(ds, by: str, order: str, tie: str | None = None,
                n_tiles: int | None = None, num_partitions: int = 64):
    """Window DISTRIBUTION functions — SQL ``percent_rank()``,
    ``cume_dist()`` and optionally ``ntile(n)`` ``OVER (PARTITION BY by
    ORDER BY order)``. Same shape as ``group_rank``: one coarse
    key-hash shuffle, one vectorized sort + grouped-rank pass inside —
    no per-key dispatch.

    ``percent_rank`` = (rank-1)/(n-1) (0.0 for single-row groups) and
    ``cume_dist`` = max_rank/n are rank-based, so they are
    deterministic without a tie column; ``ntile`` is row_number-based
    (first n%k buckets get the extra row), so pass ``tie`` when
    ``n_tiles`` is set or the bucket of order-ties is nondeterministic
    and won't hash-compare."""
    sort_cols = [by, order] + ([tie] if tie else [])

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="stable")
        grp = g.groupby(by, sort=False)
        n = grp[order].transform("size").to_numpy(dtype="float64")
        rmin = grp[order].rank(method="min").to_numpy(dtype="float64")
        rmax = grp[order].rank(method="max").to_numpy(dtype="float64")
        g["percent_rank"] = np.where(n > 1, (rmin - 1) / (n - 1), 0.0)
        g["cume_dist"] = rmax / n
        if n_tiles is not None:
            rn = grp.cumcount().to_numpy()  # 0-based row_number
            k = int(n_tiles)
            ni = n.astype("int64")
            base, rem = ni // k, ni % k
            big = rem * (base + 1)  # rows living in the ceil buckets
            tile = np.where(
                rn < big,
                rn // np.maximum(base + 1, 1),
                rem + (rn - big) // np.maximum(base, 1))
            g["tile"] = (tile + 1).astype("int64")
        return g.drop(columns=["_pb"])

    return _coarse_keyed(ds, by, num_partitions) \
        .map_groups(f, batch_format="pandas")


def arg_extremum(ds, key: str, order: str, tie: str,
                 mode: str = "max", num_partitions: int = 32):
    """Per-key arg-extremum row — SQL ``max_by``/``min_by`` (a.k.a.
    ``arg_max``), made DETERMINISTIC: the surviving row is the one
    ranked first by ``ORDER BY order DESC|ASC, tie ASC``. Every column
    of the row survives.

    Decomposable: each block keeps one candidate row per key (sort +
    head(1), vectorized), so the shuffle carries at most one row per
    key per block — never the raw table; the final pass re-picks among
    candidates with the identical ordering."""
    if mode not in ("max", "min"):
        raise ValueError(f"unknown mode {mode!r}")
    cols = [key, order, tie]
    asc = [True, mode == "min", True]

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(cols, ascending=asc, kind="stable")
        return df.groupby(key, sort=False).head(1)

    partials = ds.map_batches(pick, batch_format="pandas")
    return _coarse_keyed(partials, key, num_partitions) \
        .map_groups(lambda g: pick(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def grouped_percentile_cont(ds, key: str, value: str,
                            qs: Sequence[float] = (0.25, 0.5, 0.75),
                            ndigits: int | None = 6,
                            num_partitions: int = 32):
    """INTERPOLATED (continuous) quantiles per group in one pass — SQL
    ``percentile_cont(q) WITHIN GROUP (ORDER BY value)``. Same
    distinct-(key,value)-count combiner plan as ``grouped_quantiles``
    (the shuffle carries one row per distinct key×value per block);
    inside, for each q the 0-based position h=(n-1)·q picks the
    bracketing ranks floor(h)+1 / ceil(h)+1 via one shared sorted
    cumulative pass, then lerps: lo + (h-floor(h))·(hi-lo) — the exact
    expression DuckDB evaluates, so values hash-compare at ``ndigits``.
    Output columns ``p<q*100>`` (``p25``, ``p50``...), float64."""
    qs = list(qs)
    names = [f"p{int(round(q * 100)):02d}" for q in qs]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby([key, value], sort=False, dropna=False) \
            .size().rename("n").reset_index()

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([key, value], sort=True)["n"].sum().reset_index()
        totals = g.groupby(key, sort=False)["n"].transform("sum") \
            .to_numpy(dtype="float64")
        cum = g.groupby(key, sort=False)["n"].cumsum().to_numpy()
        out = None
        for q, name in zip(qs, names):
            h = (totals - 1) * q
            frames = []
            for rank in (np.floor(h) + 1, np.ceil(h) + 1):
                hit = cum >= rank
                picked = g[hit].groupby(key, sort=True).first() \
                    .reset_index()
                frames.append(picked.set_index(key)[value]
                              .astype("float64"))
            lo, hi = frames
            per_key = g.groupby(key, sort=True)["n"].sum()
            nk = per_key.to_numpy(dtype="float64")
            hk = (nk - 1) * q
            frac = hk - np.floor(hk)
            val = lo.to_numpy() + frac * (hi.to_numpy() - lo.to_numpy())
            if ndigits is not None:
                val = np.round(val, ndigits)
            col = pd.DataFrame({key: per_key.index, name: val})
            out = col if out is None else out.merge(col, on=key)
        return out

    pruned = ds.map_batches(lambda t: t.select([key, value]),
                            batch_format="pyarrow")
    partials = pruned.map_batches(partial, batch_format="pandas")
    return _coarse_keyed(partials, key, num_partitions) \
        .map_groups(lambda g: pick(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def unpivot(ds, id_cols: Sequence[str], value_cols: Sequence[str],
            var_name: str = "name", value_name: str = "value"):
    """Wide→long reshape — SQL ``UNPIVOT`` (the inverse of
    ``pivot_counts``). Pure per-block expansion (pandas ``melt``; each
    input row becomes len(value_cols) rows), so it streams with zero
    shuffle. Value columns are cast to float64 — SQL UNPIVOT likewise
    requires a common value type."""
    ids, vals = list(id_cols), list(value_cols)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        m = df[ids + vals].melt(id_vars=ids, value_vars=vals,
                                var_name=var_name, value_name=value_name)
        m[value_name] = m[value_name].astype("float64")
        return m

    return ds.map_batches(f, batch_format="pandas")


def rolling_agg(ds, by: str, order: str, value: str, window: int,
                tie: str | None = None, ndigits: int | None = 6,
                num_partitions: int = 64):
    """Moving-frame aggregates — SQL ``sum/avg/count(value) OVER
    (PARTITION BY by ORDER BY order[, tie] ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW)``. Output columns ``roll_sum`` /
    ``roll_mean`` / ``roll_n``. Same coarse key-hash shuffle as every
    window op here; inside, one pandas grouped-rolling pass (min_periods
    =1 — SQL frames shrink at partition start, they don't null out).
    Pass ``tie`` to pin frame order under order-ties, or the frame
    content itself is nondeterministic and won't hash-compare."""
    sort_cols = [by, order] + ([tie] if tie else [])

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="stable")
        r = g.groupby(by, sort=False)[value] \
            .rolling(window, min_periods=1)
        s = r.sum().reset_index(drop=True)
        n = r.count().reset_index(drop=True)
        g = g.reset_index(drop=True)
        g["roll_sum"] = s
        g["roll_mean"] = s / n
        g["roll_n"] = n.astype("int64")
        if ndigits is not None:
            g["roll_sum"] = g["roll_sum"].round(ndigits)
            g["roll_mean"] = g["roll_mean"].round(ndigits)
        return g.drop(columns=["_pb"])

    return _coarse_keyed(ds, by, num_partitions) \
        .map_groups(f, batch_format="pandas")


def cumulative_extrema(ds, by: str, order: str, value: str,
                       tie: str | None = None, num_partitions: int = 64):
    """Running extremes — SQL ``max/min(value) OVER (PARTITION BY by
    ORDER BY order[, tie] ROWS UNBOUNDED PRECEDING)``. Output columns
    ``cum_max`` / ``cum_min``. Pure comparisons (no float arithmetic),
    so values hash-compare exactly; ties in ``order`` change only WHICH
    equal value is current — the running extreme is order-tie-proof."""
    sort_cols = [by, order] + ([tie] if tie else [])

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="stable")
        grp = g.groupby(by, sort=False)[value]
        g["cum_max"] = grp.cummax()
        g["cum_min"] = grp.cummin()
        return g.drop(columns=["_pb"])

    return _coarse_keyed(ds, by, num_partitions) \
        .map_groups(f, batch_format="pandas")


def first_last_value(ds, by: str, order: str, value: str,
                     tie: str | None = None, num_partitions: int = 64):
    """Partition-edge values — SQL ``first_value/last_value(value) OVER
    (PARTITION BY by ORDER BY order[, tie] ROWS BETWEEN UNBOUNDED
    PRECEDING AND UNBOUNDED FOLLOWING)``. Pass ``tie`` for determinism
    under order-ties (SQL's own first/last over a non-unique order is
    nondeterministic). Exact value copies — hash-safe."""
    sort_cols = [by, order] + ([tie] if tie else [])

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="stable")
        grp = g.groupby(by, sort=False)[value]
        g["first_value"] = grp.transform("first")
        g["last_value"] = grp.transform("last")
        return g.drop(columns=["_pb"])

    return _coarse_keyed(ds, by, num_partitions) \
        .map_groups(f, batch_format="pandas")


def grouped_higher_moments(ds, key: str, x: str, ndigits: int = 6,
                           num_partitions: int = 32):
    """Per-group sample skewness and excess kurtosis — SQL
    ``skewness(x)`` / ``kurtosis(x)`` (DuckDB's bias-corrected forms:
    adjusted Fisher-Pearson g1·sqrt(n(n-1))/(n-2) and
    ((n+1)·g2+6)(n-1)/((n-2)(n-3)), pinned by tests).

    Two streaming passes. Pass 1 folds one (n, Σx) partial per block
    into a single GLOBAL shift c — raw Σx³/Σx⁴ partials around zero
    cancel catastrophically (x⁴~1e8 terms summing to ~1e2 moments),
    but around c≈mean the shifted sums are spread-scale and the
    central-moment algebra is stable. Pass 2 is the usual combiner:
    per-block per-key (n, Σd, Σd², Σd³, Σd⁴) with d=x-c, one small
    grouped shuffle, driver never sees a row per group."""
    pruned = ds.map_batches(lambda t: t.select([key, x]),
                            batch_format="pyarrow")

    def mean_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[x].dropna()
        return pd.DataFrame({"n": [float(len(v))], "s": [float(v.sum())]})

    tot = pruned.map_batches(mean_partial,
                             batch_format="pandas").to_pandas()
    c = float(tot["s"].sum() / max(tot["n"].sum(), 1.0))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[x].astype("float64") - c
        tmp = pd.DataFrame({key: df[key], "n": (~d.isna()).astype("int64"),
                            "s1": d, "s2": d ** 2, "s3": d ** 3,
                            "s4": d ** 4})
        return tmp.groupby(key, sort=False, dropna=False).sum() \
            .reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(key, sort=False).sum().reset_index()
        n = g["n"].astype("float64").to_numpy()
        m = g["s1"].to_numpy() / n            # mean of d
        # central moments from shifted raw moments
        m2 = g["s2"].to_numpy() / n - m ** 2
        m3 = g["s3"].to_numpy() / n - 3 * m * g["s2"].to_numpy() / n \
            + 2 * m ** 3
        m4 = g["s4"].to_numpy() / n - 4 * m * g["s3"].to_numpy() / n \
            + 6 * m ** 2 * g["s2"].to_numpy() / n - 3 * m ** 4
        g1 = m3 / m2 ** 1.5
        g2 = m4 / m2 ** 2 - 3.0
        skew = g1 * np.sqrt(n * (n - 1)) / (n - 2)
        kurt = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
        return pd.DataFrame({key: g[key],
                             "skewness": np.round(skew, ndigits),
                             "kurtosis": np.round(kurt, ndigits)})

    partials = pruned.map_batches(partial, batch_format="pandas")
    return _coarse_keyed(partials, key, num_partitions) \
        .map_groups(lambda g: final(g.drop(columns=["_pb"])),
                    batch_format="pandas")


def interval_join(left, right, l_lo: str, l_hi: str,
                  r_lo: str, r_hi: str, chunk: int | None = None,
                  num_buckets: int = 32,
                  left_schema=None, right_schema=None):
    """Interval-OVERLAP join: pairs every left ``[l_lo, l_hi]`` with
    every right ``[r_lo, r_hi]`` where the closed intervals intersect
    (``l_lo <= r_hi AND r_lo <= l_hi``) — the interval×interval
    sibling of ``range_join``'s point-in-interval. Int64 domain, inner
    join, disjoint column names across sides.

    Plan (one union shuffle, no cross product): BOTH sides replicate to
    every fixed-width chunk they overlap; a pair is emitted only in the
    chunk containing its OVERLAP START ``max(l_lo, r_lo)`` — that chunk
    lies inside both intervals' spans, so both replicas are present
    there and no other chunk emits the pair (dedup by construction,
    same trick as ``range_join``'s point-chunk ownership). Inside a
    bucket, right replicas sort by ``(chunk, r_lo)`` once; one
    structured-dtype ``np.searchsorted`` per left batch finds the
    ``r_lo <= l_hi`` candidate slice, pairs expand by repeat/arange,
    then ``r_hi >= l_lo`` and the ownership check filter.

    Partitioning assumption (document per use): candidate fan-in per
    left replica is the number of right intervals overlapping its
    chunk. ``chunk=None`` derives ~4× the mean right-interval width
    from one cheap pass; override when widths are heavily skewed."""
    from chomper_ray.state.schema import conform

    schema, lcols, rcols = _combined_schema(left, right,
                                            left_schema, right_schema)
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"interval_join requires disjoint columns; "
                         f"both sides have {sorted(overlap)}")
    out_schema = pa.schema([schema.field(c) for c in (*lcols, *rcols)])

    if chunk is None:
        st = right.map_batches(
            lambda df: pd.DataFrame({
                "n": [len(df)],
                "wsum": [int((df[r_hi] - df[r_lo]).sum())],
                "mn": [df[r_lo].min()], "mx": [df[r_hi].max()],
            }), batch_format="pandas").to_pandas()
        n = int(st["n"].sum()) if len(st) else 0
        if n == 0:
            chunk = 1
        else:
            span = int(st["mx"].max()) - int(st["mn"].min()) + 1
            avg_w = st["wsum"].sum() / n
            chunk = int(max(1, 4 * avg_w, span // 4096))

    w = np.int64(chunk)

    def replicate(lo_col, hi_col, side):
        def f(t: pa.Table) -> pa.Table:
            t = conform(t, schema)
            lo_v = np.asarray(t[lo_col].to_numpy(zero_copy_only=False),
                              np.int64)
            hi_v = np.asarray(t[hi_col].to_numpy(zero_copy_only=False),
                              np.int64)
            c0 = np.floor_divide(lo_v, w)
            c1 = np.floor_divide(np.maximum(hi_v, lo_v), w)
            k = (c1 - c0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), k)
            ck = np.concatenate(
                [np.arange(a, b + 1, dtype=np.int64)
                 for a, b in zip(c0, c1)]) if t.num_rows else \
                np.empty(0, np.int64)
            t = t.take(pa.array(idx))
            t = t.append_column("_ck", pa.array(ck, type=pa.int64()))
            t = t.append_column("_jb", pa.array(
                (ck % num_buckets).astype(np.int32), type=pa.int32()))
            return t.append_column("_side",
                                   pa.array([side] * t.num_rows))
        return f

    key_dt = np.dtype([("c", "<i8"), ("l", "<i8")])

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        ls = g[g["_side"] == "l"]
        rs = g[g["_side"] == "r"]
        if not len(ls) or not len(rs):
            return _to_schema(
                pd.DataFrame({f.name: pd.Series(dtype="object")
                              for f in out_schema}), out_schema)
        rc = rs["_ck"].to_numpy(np.int64)
        rl = rs[r_lo].to_numpy(np.int64)
        rh = rs[r_hi].to_numpy(np.int64)
        order = np.lexsort((rl, rc))
        rc, rl, rh = rc[order], rl[order], rh[order]
        keys = np.empty(len(rc), key_dt)
        keys["c"], keys["l"] = rc, rl

        ll = ls[l_lo].to_numpy(np.int64)
        lh = ls[l_hi].to_numpy(np.int64)
        lc = ls["_ck"].to_numpy(np.int64)
        v_hi = np.empty(len(ll), key_dt)
        v_hi["c"], v_hi["l"] = lc, lh
        v_lo = np.empty(len(ll), key_dt)
        v_lo["c"], v_lo["l"] = lc, np.iinfo(np.int64).min
        end = np.searchsorted(keys, v_hi, side="right")
        start = np.searchsorted(keys, v_lo, side="left")
        cnt = end - start
        l_idx = np.repeat(np.arange(len(ll)), cnt)
        off = np.concatenate([[0], np.cumsum(cnt)])
        r_rank = (np.arange(int(cnt.sum())) - off[l_idx]
                  + start[l_idx])
        # overlap + ownership: emit only in the overlap-start chunk
        ovl = rh[r_rank] >= ll[l_idx]
        own = np.floor_divide(np.maximum(ll[l_idx], rl[r_rank]), w) \
            == lc[l_idx]
        keep = ovl & own
        l_idx, r_rank = l_idx[keep], r_rank[keep]

        lrows = ls.iloc[l_idx][lcols].reset_index(drop=True)
        rrows = rs.iloc[order[r_rank]][rcols].reset_index(drop=True)
        return _to_schema(pd.concat([lrows, rrows], axis=1), out_schema)

    l = left.map_batches(replicate(l_lo, l_hi, "l"),
                         batch_format="pyarrow")
    r = right.map_batches(replicate(r_lo, r_hi, "r"),
                          batch_format="pyarrow")
    return (l.union(r).groupby("_jb")
            .map_groups(join_bucket, batch_format="pandas"))

"""Property-based tests (hypothesis): the invariants that make the
engine's distributed execution correct regardless of scheduling.

- LWW merge is order-independent and batch-split-independent: any
  permutation of events, applied in any epoch chunking, yields the same
  final state (this is WHY the distributed merge is allowed to reorder).
- Expression vectorized evaluation ≡ row-at-a-time Kleene oracle.
- Schema reconcile is commutative/associative over observed schemas.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from chomper_ray.functions.expr import F
from chomper_ray.stages.merge import apply_changes, lww_dedup_table
from chomper_ray.state import schema as sm


def events_df(rows):
    return pd.DataFrame(
        [{"op": o, "seq": s, "url": u,
          "warc_ts": pd.Timestamp(t, unit="s"), "text": x}
         for (o, s, u, t, x) in rows])


def empty_base():
    return pd.DataFrame({
        "url": pd.Series(dtype=object),
        "warc_ts": pd.Series(dtype="datetime64[us]"),
        "text": pd.Series(dtype=object),
        "_seq": pd.Series(dtype="int64"),
        "_deleted": pd.Series(dtype=bool)})


event_strategy = st.lists(
    st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(0, 10_000),          # seq (may collide; fine)
        st.sampled_from([f"u{i}" for i in range(8)]),
        st.integers(0, 50),              # ts seconds (collisions likely)
        st.text(alphabet="abcxyz", min_size=0, max_size=5),
    ),
    min_size=1, max_size=60,
)


def final_state(ch: pd.DataFrame, n_chunks: int) -> pd.DataFrame:
    base = empty_base()
    for chunk in np.array_split(np.arange(len(ch)), n_chunks):
        if len(chunk) == 0:
            continue
        base, _ = apply_changes(base, ch.iloc[chunk],
                                collect_changes=False)
    cols = sorted(base.columns)
    return base[cols].sort_values(["url"], kind="stable").reset_index(drop=True)


@settings(max_examples=40, deadline=None)
@given(event_strategy, st.integers(0, 2**31 - 1), st.integers(1, 4))
def test_lww_order_and_chunking_independent(rows, seed, n_chunks):
    # make (warc_ts, seq) a total order per key: dedupe seq collisions
    seen = set()
    uniq = []
    for r in rows:
        if r[1] in seen:
            continue
        seen.add(r[1])
        uniq.append(r)
    ch = events_df(uniq)
    ref = final_state(ch, 1)
    shuffled = ch.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    out = final_state(shuffled, n_chunks)
    pd.testing.assert_frame_equal(ref, out)


@settings(max_examples=40, deadline=None)
@given(event_strategy)
def test_batch_dedup_matches_pandas_winner(rows):
    seen = set()
    uniq = [r for r in rows if r[1] not in seen and not seen.add(r[1])]
    ch = events_df(uniq)
    t = pa.Table.from_pandas(ch, preserve_index=False)
    out = lww_dedup_table(t, "url", ("warc_ts", "seq")).to_pandas()
    exp = ch.sort_values(["url", "warc_ts", "seq"]).groupby("url").tail(1)
    got = out.set_index("url")["seq"].sort_index()
    want = exp.set_index("url")["seq"].sort_index()
    pd.testing.assert_series_equal(got, want)


value_strategy = st.one_of(st.none(), st.integers(-5, 5))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(value_strategy, value_strategy),
                min_size=1, max_size=20))
def test_expression_vector_matches_row_oracle(vals):
    t = pa.table({"a": [v[0] for v in vals], "b": [v[1] for v in vals]})
    rows = t.to_pylist()
    exprs = [
        F("a") > 0, F("a") <= F("b"), (F("a") == 1) | (F("b") != 2),
        ~(F("a") < F("b")), F("a").isin([1, 2]) & (F("b") > -3),
        F("a").notin([0]), ~F("b").notin([1, None if False else 2]),
    ]
    for e in exprs:
        vec = e.matches(t).to_pylist()
        oracle = [e.eval_row(r) for r in rows]
        assert vec == oracle, f"{e}: {vec} != {oracle}"


types_strategy = st.sampled_from(
    [pa.int8(), pa.int32(), pa.int64(), pa.float32(), pa.float64()])
schema_strategy = st.dictionaries(
    st.sampled_from(list("abcde")), types_strategy, min_size=1, max_size=4
).map(lambda d: pa.schema([pa.field(k, v) for k, v in sorted(d.items())]))


@settings(max_examples=40, deadline=None)
@given(schema_strategy, schema_strategy, schema_strategy)
def test_schema_reconcile_order_insensitive(s1, s2, s3):
    def norm(s: pa.Schema):
        return {f.name: str(f.type) for f in s}

    a = sm.reconcile(sm.reconcile(s1, s2), s3)
    b = sm.reconcile(s1, sm.reconcile(s3, s2))
    c = sm.reconcile(sm.reconcile(s3, s1), s2)
    assert norm(a) == norm(b) == norm(c)


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 6))
def test_hash_join_matches_pandas_property(seed, num_buckets):
    import ray.data as rd

    from chomper_ray.pipelines.relational import hash_join

    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, 20, 80),
        "v": rng.integers(0, 1000, 80).astype("int64"),
    })
    # right keys only partially overlap; some left keys have no match
    right = pd.DataFrame({
        "k": rng.choice(np.arange(10, 30), 15, replace=False),
        "w": rng.integers(0, 1000, 15).astype("int64"),
    })
    got = hash_join(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)).repartition(3),
        rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)).repartition(2),
        on="k", num_buckets=num_buckets).to_pandas()
    exp = left.merge(right, on="k")
    g = got.sort_values(["k", "v", "w"]).reset_index(drop=True)
    x = exp.sort_values(["k", "v", "w"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g[["k", "v", "w"]], x[["k", "v", "w"]],
                                  check_dtype=False)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5),        # user
                          st.integers(0, 50_000),   # ts seconds
                          st.integers(0, 10**6)),   # tie id
                min_size=1, max_size=120, unique_by=lambda t: t[2]))
def test_sessionize_matches_row_oracle(rows):
    import pandas as pd

    import ray.data as rd

    from chomper_ray.pipelines.relational import sessionize

    df = pd.DataFrame(rows, columns=["u", "t", "i"])
    ds = rd.from_pandas(df).repartition(3)
    got = sessionize(ds, by="u", ts="t", tie="i", gap_s=1000) \
        .to_pandas().set_index("i")["session_id"]

    # row-at-a-time oracle
    exp = {}
    for u, grp in df.groupby("u"):
        sid, prev = 0, None
        for _, r in grp.sort_values(["t", "i"]).iterrows():
            if prev is None or r["t"] - prev > 1000:
                sid += 1
            exp[r["i"]] = sid
            prev = r["t"]
    for i, s in exp.items():
        assert got[i] == s, (i, s, got[i])


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1), st.floats(0.0005, 0.05))
def test_bloom_semi_join_exact_property(seed, fpp):
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from chomper_ray.pipelines.relational import bloom_semi_join

    rng = np.random.default_rng(seed)
    left = pd.DataFrame({"k": rng.integers(0, 300, 400),
                         "v": np.arange(400)})
    right = pd.DataFrame({"k": rng.choice(300, rng.integers(1, 80),
                                          replace=False)})
    lds = rd.from_pandas(left).repartition(3)
    rds = rd.from_pandas(right).repartition(2)
    semi = bloom_semi_join(lds, rds, on="k", fpp=fpp).to_pandas()
    anti = bloom_semi_join(lds, rds, on="k", fpp=fpp, anti=True).to_pandas()
    keys = set(right["k"])
    exp_semi = left.loc[left["k"].isin(keys), "v"]
    exp_anti = left.loc[~left["k"].isin(keys), "v"]
    # Ray drops schema on fully-empty to_pandas (documented limitation):
    # value-compare only when the side is non-empty
    assert len(semi) == len(exp_semi)
    if len(semi):
        assert sorted(semi["v"]) == sorted(exp_semi)
    assert len(anti) == len(exp_anti)
    if len(anti):
        assert sorted(anti["v"]) == sorted(exp_anti)

"""Hybrid RRF retrieval (state/retrieval.py) over the two maintained
indexes: the fused ranking must equal a plain-Python recompute (BM25 +
cosine + reciprocal-rank fusion, ranks on 6-digit-rounded scores with
key tie-break) over the live LWW lake state — across inserts, text+
vector rewrites, deletes and index compaction — and absent-side docs
must report rank 0 while still fusing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from chomper_ray.state.annindex import LakeANNIndex
from chomper_ray.state.index import LakeTextIndex
from chomper_ray.state.lake import LakeTable
from chomper_ray.state.retrieval import hybrid_rrf

DIM = 8
WORDS = ["spark", "merge", "row", "scan", "agg", "delta", "batch"]


def mk(op, seq, key, ts, text, vec):
    return {"op": op, "seq": seq, "url": key,
            "warc_ts": pd.Timestamp(ts, unit="s"), "text": text,
            "embedding": None if vec is None else list(map(float, vec))}


def commit(lake, rows, epoch):
    lake.commit_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), epoch)


def text_for(rng):
    n = int(rng.integers(3, 12))
    return " ".join(rng.choice(WORDS, size=n))


def brute_hybrid(lake, tokens, qvec, *, k, fetch_k, k0=60, nd=6):
    """The oracle: BM25 (LakeTextIndex's formula/tokenizer) + cosine
    over the live state, rank on rounded scores, RRF-fuse."""
    live = lake.read_pandas()
    keys = live["url"].to_numpy()
    toks = [(t if isinstance(t, str) else "").split(" ")
            for t in live["text"]]
    dl = np.array([len(t) for t in toks], dtype=np.float64)
    n, avgdl = float(len(live)), dl.mean()
    k1, b = 1.2, 0.75
    score = {}
    for w in dict.fromkeys(tokens):
        hit = [(i, t.count(w)) for i, t in enumerate(toks) if w in t]
        if not hit:
            continue
        df_ = float(len(hit))
        idf = np.log((n - df_ + 0.5) / (df_ + 0.5) + 1.0)
        for i, tf in hit:
            s = idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dl[i] / avgdl))
            score[keys[i]] = score.get(keys[i], 0.0) + s
    bm = sorted(((round(v, nd), dk) for dk, v in score.items()),
                key=lambda t: (-t[0], t[1]))
    rb = {dk: r + 1 for r, (_, dk) in enumerate(bm) if r < fetch_k}

    m = np.stack(live["embedding"].to_numpy()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    q = np.asarray(qvec, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    cs = m @ q
    co = sorted(((round(float(cs[i]), nd), keys[i])
                 for i in range(len(keys))), key=lambda t: (-t[0], t[1]))
    rc = {dk: r + 1 for r, (_, dk) in enumerate(co) if r < fetch_k}

    rows = []
    for dk in set(rb) | set(rc):
        r1, r2 = rb.get(dk, 0), rc.get(dk, 0)
        rrf = (1.0 / (k0 + r1) if r1 else 0.0) + \
              (1.0 / (k0 + r2) if r2 else 0.0)
        rows.append((dk, r1, r2, rrf))
    rows.sort(key=lambda t: (-t[3], t[0]))
    return [(dk, r1, r2, round(rrf, 9)) for dk, r1, r2, rrf in rows[:k]]


def got(tidx, aidx, tokens, qvec, **kw):
    out = hybrid_rrf(tidx, aidx, tokens, qvec, **kw)
    return [(r.doc, int(r.r_bm25), int(r.r_cos), float(r.rrf))
            for r in out.itertuples(index=False)]


def build(tmp_path, rng, n0=40):
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    tidx = LakeTextIndex(lake, tmp_path / "tix", num_partitions=8)
    aidx = LakeANNIndex(lake, tmp_path / "aix", n_cells=4)
    e0 = [mk("insert", i, f"u{i:03d}", 10, text_for(rng),
             rng.normal(size=DIM)) for i in range(n0)]
    commit(lake, e0, 0)
    return lake, tidx, aidx


def test_hybrid_matches_brute_across_commits(tmp_path, ray_session):
    rng = np.random.default_rng(31)
    lake, tidx, aidx = build(tmp_path, rng)
    qvec = rng.normal(size=DIM)
    tokens = ["spark", "merge"]
    tidx.refresh(), aidx.refresh()
    assert got(tidx, aidx, tokens, qvec, k=10, fetch_k=15) == \
        brute_hybrid(lake, tokens, qvec, k=10, fetch_k=15)

    # full rewrites (text AND vector), deletes, fresh inserts
    e1 = [mk("update", 100 + i, f"u{i:03d}", 20, text_for(rng),
             rng.normal(size=DIM)) for i in range(12)]
    e1 += [mk("delete", 200 + i, f"u{20 + i:03d}", 20, None, None)
           for i in range(6)]
    e1 += [mk("insert", 300 + i, f"u{60 + i:03d}", 20, text_for(rng),
              rng.normal(size=DIM)) for i in range(8)]
    commit(lake, e1, 1)
    tidx.refresh(), aidx.refresh()
    assert got(tidx, aidx, tokens, qvec, k=10, fetch_k=15) == \
        brute_hybrid(lake, tokens, qvec, k=10, fetch_k=15)

    # compaction of either index must not change the fused answer
    before = got(tidx, aidx, tokens, qvec, k=10, fetch_k=15)
    tidx.compact(), aidx.compact()
    assert got(tidx, aidx, tokens, qvec, k=10, fetch_k=15) == before


def test_hybrid_absent_side_rank_zero(tmp_path, ray_session):
    rng = np.random.default_rng(7)
    lake, tidx, aidx = build(tmp_path, rng, n0=25)
    # one doc with NO query tokens: cosine can rank it, bm25 cannot
    commit(lake, [mk("insert", 900, "u900", 20, "delta batch row",
                     rng.normal(size=DIM))], 1)
    tidx.refresh(), aidx.refresh()
    out = hybrid_rrf(tidx, aidx, ["spark", "merge"], rng.normal(size=DIM),
                     k=100, fetch_k=100)
    mine = out[out["doc"] == "u900"]
    assert len(mine) == 1 and int(mine["r_bm25"].iloc[0]) == 0
    assert int(mine["r_cos"].iloc[0]) > 0
    exp = brute_hybrid(lake, ["spark", "merge"],
                       np.zeros(DIM), k=1, fetch_k=100)  # shape only
    assert set(out.columns) == {"doc", "r_bm25", "r_cos", "rrf"} and exp


def test_hybrid_fetch_k_cut(tmp_path, ray_session):
    rng = np.random.default_rng(13)
    lake, tidx, aidx = build(tmp_path, rng)
    tidx.refresh(), aidx.refresh()
    qvec = rng.normal(size=DIM)
    out = hybrid_rrf(tidx, aidx, ["spark"], qvec, k=200, fetch_k=5)
    assert out["r_bm25"].max() <= 5 and out["r_cos"].max() <= 5
    # every returned doc ranked in at least one system
    assert ((out["r_bm25"] > 0) | (out["r_cos"] > 0)).all()
    assert got(tidx, aidx, ["spark"], qvec, k=200, fetch_k=5) == \
        brute_hybrid(lake, ["spark"], qvec, k=200, fetch_k=5)


# -- hypothesis property: random corpora + random op sequences ----------

from hypothesis import given, settings
from hypothesis import strategies as st

_DOC = st.tuples(st.integers(0, 39),                       # key id
                 st.lists(st.sampled_from(WORDS), min_size=1,
                          max_size=9),                     # tokens
                 st.integers(0, 2**31 - 1))                # vec seed


@st.composite
def _ops(draw):
    base = draw(st.lists(_DOC, min_size=5, max_size=15,
                         unique_by=lambda d: d[0]))
    extra = draw(st.lists(
        st.tuples(st.sampled_from(["update", "delete"]), _DOC),
        min_size=0, max_size=6))
    toks = draw(st.lists(st.sampled_from(WORDS), min_size=1,
                         max_size=3, unique=True))
    return base, extra, toks


@given(_ops())
@settings(max_examples=6, deadline=None)
def test_hybrid_property_random_ops(tmp_path_factory, ray_session, ops):
    base, extra, tokens = ops
    tmp = tmp_path_factory.mktemp("hyb_prop")
    lake = LakeTable(tmp / "lake", key="url", num_partitions=2,
                     collect_changes=False)
    tidx = LakeTextIndex(lake, tmp / "tix", num_partitions=4)
    aidx = LakeANNIndex(lake, tmp / "aix", n_cells=2)

    def vec(seed):
        return np.random.default_rng(seed).normal(size=DIM)

    rows = [mk("insert", i, f"u{kid:03d}", 10, " ".join(toks), vec(sd))
            for i, (kid, toks, sd) in enumerate(base)]
    commit(lake, rows, 0)
    if extra:
        rows = []
        for j, (op, (kid, toks, sd)) in enumerate(extra):
            if op == "delete":
                rows.append(mk("delete", 100 + j, f"u{kid:03d}", 20,
                               None, None))
            else:
                rows.append(mk("update", 100 + j, f"u{kid:03d}", 20,
                               " ".join(toks), vec(sd)))
        # LWW needs unique (key, ts, seq) — dedup keys inside the epoch
        seen, uniq = set(), []
        for r in reversed(rows):
            if r["url"] not in seen:
                seen.add(r["url"])
                uniq.append(r)
        commit(lake, uniq, 1)
    tidx.refresh(), aidx.refresh()
    if not len(lake.read_pandas()):
        return  # everything deleted — nothing to rank
    qvec = vec(7)
    assert got(tidx, aidx, tokens, qvec, k=8, fetch_k=10) == \
        brute_hybrid(lake, tokens, qvec, k=8, fetch_k=10)


def test_hybrid_tie_cluster_beyond_slack(tmp_path, ray_session):
    """A rounded-score tie cluster LARGER than fetch_k + RANK_SLACK
    straddling the fetch_k cut: the ANN side must refetch deeper so
    the doc-ASC tie-break sees the WHOLE cluster, not whichever
    members the first fixed-size fetch happened to return (round-4
    ADVICE item 1)."""
    from chomper_ray.state.retrieval import RANK_SLACK

    rng = np.random.default_rng(41)
    shared = rng.normal(size=DIM)
    n_tied = 5 + RANK_SLACK + 25  # cluster > fetch_k + RANK_SLACK
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    tidx = LakeTextIndex(lake, tmp_path / "tix", num_partitions=8)
    aidx = LakeANNIndex(lake, tmp_path / "aix", n_cells=1)
    rows = [mk("insert", i, f"u{i:03d}", 10, text_for(rng), shared)
            for i in range(n_tied)]
    rows += [mk("insert", 500 + i, f"z{i:03d}", 10, text_for(rng),
                -shared + rng.normal(scale=0.1, size=DIM))
             for i in range(10)]
    commit(lake, rows, 0)
    tidx.refresh(), aidx.refresh()
    # query along the shared vector: all n_tied docs tie at cosine 1.0
    assert got(tidx, aidx, ["spark"], shared, k=20, fetch_k=5) == \
        brute_hybrid(lake, ["spark"], shared, k=20, fetch_k=5)


def test_hybrid_batch_matches_per_query(tmp_path, ray_session):
    """hybrid_rrf_batch over N queries must equal N hybrid_rrf calls
    exactly — same ranks, same rrf — across inserts, rewrites and
    deletes, including queries with absent tokens and empty token
    lists; non-contiguous caller qids map through."""
    from chomper_ray.state.retrieval import hybrid_rrf_batch

    rng = np.random.default_rng(23)
    lake, tidx, aidx = build(tmp_path, rng, n0=50)
    e1 = [mk("update", 100 + i, f"u{i:03d}", 20, text_for(rng),
             rng.normal(size=DIM)) for i in range(10)]
    e1 += [mk("delete", 200 + i, f"u{30 + i:03d}", 20, None, None)
           for i in range(5)]
    commit(lake, e1, 1)
    tidx.refresh(), aidx.refresh()

    specs = [(7, ["spark", "merge"]), (13, ["delta"]),
             (21, ["nosuchtoken"]), (34, []),
             (55, ["row", "scan", "agg"])]
    qdf = pd.DataFrame({
        "qid": [s[0] for s in specs],
        "tokens": [s[1] for s in specs],
        "vec": [list(np.random.default_rng(100 + i).normal(size=DIM))
                for i in range(len(specs))]})
    batch = hybrid_rrf_batch(tidx, aidx, qdf, k=8, fetch_k=12)
    for i, (qid, tokens) in enumerate(specs):
        single = hybrid_rrf(tidx, aidx, tokens, qdf["vec"].iloc[i],
                            k=8, fetch_k=12)
        mine = batch[batch["qid"] == qid].drop(columns=["qid"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(mine, single)


def test_hybrid_batch_tie_cluster_refetch(tmp_path, ray_session):
    """The batched ANN side must ALSO refetch per-qid when a rounded
    tie cluster straddles the fetch_k cut."""
    from chomper_ray.state.retrieval import RANK_SLACK, hybrid_rrf_batch

    rng = np.random.default_rng(77)
    shared = rng.normal(size=DIM)
    n_tied = 5 + RANK_SLACK + 20
    lake = LakeTable(tmp_path / "lake", key="url", num_partitions=4,
                     collect_changes=False)
    tidx = LakeTextIndex(lake, tmp_path / "tix", num_partitions=8)
    aidx = LakeANNIndex(lake, tmp_path / "aix", n_cells=1)
    rows = [mk("insert", i, f"u{i:03d}", 10, text_for(rng), shared)
            for i in range(n_tied)]
    commit(lake, rows, 0)
    tidx.refresh(), aidx.refresh()
    qdf = pd.DataFrame({"qid": [0, 1],
                        "tokens": [["spark"], ["merge"]],
                        "vec": [list(shared), list(rng.normal(size=DIM))]})
    batch = hybrid_rrf_batch(tidx, aidx, qdf, k=20, fetch_k=5)
    for i in range(2):
        single = hybrid_rrf(tidx, aidx, qdf["tokens"].iloc[i],
                            qdf["vec"].iloc[i], k=20, fetch_k=5)
        mine = batch[batch["qid"] == i].drop(columns=["qid"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(mine, single)

"""Edit-distance fuzzy join: kernel exactness + pipeline vs brute force."""

import itertools
import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from chomper_ray.stages import fuzzy
from chomper_ray.stages.dedup import clusters_dict


def ref_lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[len(b)]


def rand_strings(rng, n, alpha="abcd", lo=0, hi=12):
    return ["".join(rng.choice(alpha) for _ in range(rng.randint(lo, hi)))
            for _ in range(n)]


# ------------------------------------------------------------------ kernels

def test_banded_levenshtein_matches_dp_oracle():
    rng = random.Random(11)
    pairs = [(a, b) for a, b in zip(rand_strings(rng, 400),
                                    rand_strings(rng, 400))]
    pairs += [("", ""), ("", "abc"), ("abc", ""), ("héllo", "hello"),
              ("日本語テスト", "日本語のテスト")]
    for k in (1, 2, 3):
        got = fuzzy.banded_levenshtein([p[0] for p in pairs],
                                       [p[1] for p in pairs], k)
        exp = np.array([min(ref_lev(a, b), k + 1) for a, b in pairs])
        assert (got == exp).all()


def test_deletion_neighborhood_is_complete_and_collision_free():
    rng = random.Random(23)
    strs = rand_strings(rng, 150, lo=0, hi=9)

    def variants(s, k):
        out = {s}
        for d in range(1, k + 1):
            for comb in itertools.combinations(range(len(s)), d):
                out.add("".join(c for i, c in enumerate(s)
                                if i not in comb))
        return out

    for k in (1, 2):
        rows, hs = fuzzy.deletion_variant_hashes(strs, k)
        per_row = {}
        for r, h in zip(rows, hs):
            per_row.setdefault(int(r), set()).add(int(h))
        for i, s in enumerate(strs):
            # distinct variants == distinct hashes: complete, no collision
            assert len(per_row[i]) == len(variants(s, k))


def test_deletion_hashes_reject_long_keys_and_bad_k():
    with pytest.raises(ValueError, match="max_len"):
        fuzzy.deletion_variant_hashes(["x" * 65], 1)
    with pytest.raises(ValueError, match="k in"):
        fuzzy.deletion_variant_hashes(["abc"], 3)


# ----------------------------------------------------------------- pipeline

def _ids_ds(strs, id_col="id", col="name"):
    return rd.from_arrow(pa.table({
        id_col: pa.array(range(len(strs)), type=pa.int64()),
        col: pa.array(strs),
    })).repartition(4)


@pytest.mark.parametrize("k", [1, 2])
def test_fuzzy_self_join_matches_brute_force(k):
    rng = random.Random(31 + k)
    strs = rand_strings(rng, 120, alpha="abc", lo=1, hi=8)
    got = fuzzy.fuzzy_self_join(_ids_ds(strs), k=k, num_partitions=8) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    exp_rows = [(i, j, ref_lev(strs[i], strs[j]))
                for i in range(len(strs)) for j in range(i + 1, len(strs))
                if ref_lev(strs[i], strs[j]) <= k]
    exp = pd.DataFrame(exp_rows, columns=["a", "b", "dist"]) \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert got[["a", "b", "dist"]].values.tolist() == exp.values.tolist()
    assert not got["truncated"].any()


def test_fuzzy_join_two_sided_matches_brute_force():
    rng = random.Random(47)
    left = rand_strings(rng, 60, alpha="ab", lo=1, hi=6)
    right = rand_strings(rng, 60, alpha="ab", lo=1, hi=6)
    got = fuzzy.fuzzy_join(_ids_ds(left), _ids_ds(right), on="name",
                           k=1, num_partitions=8) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    exp_rows = [(i, j, ref_lev(left[i], right[j]))
                for i in range(len(left)) for j in range(len(right))
                if ref_lev(left[i], right[j]) <= 1]
    exp = pd.DataFrame(exp_rows, columns=["a", "b", "dist"]) \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert got[["a", "b", "dist"]].values.tolist() == exp.values.tolist()


def test_fuzzy_dedup_clusters_typo_families():
    strs = ["postgres", "postgers", "postgrs",      # one typo family
            "redis", "redsi",                        # another
            "clickhouse"]                            # singleton
    clusters_ds, pairs_ds = fuzzy.fuzzy_dedup(
        _ids_ds(strs), k=2, num_partitions=4)
    clusters = clusters_dict(clusters_ds)
    rep = {i: clusters.get(i, i) for i in range(len(strs))}
    assert rep[0] == rep[1] == rep[2] == 0
    assert rep[3] == rep[4] == 3
    assert rep[5] == 5
    pairs = pairs_ds.to_pandas()
    assert set(map(tuple, pairs[["a", "b"]].values.tolist())) >= \
        {(0, 1), (3, 4)}


def test_fuzzy_self_join_bucket_cap_flags_truncation():
    # 40 identical strings share every variant bucket: capped + flagged
    strs = ["same"] * 40 + ["different"]
    got = fuzzy.fuzzy_self_join(_ids_ds(strs), k=1, num_partitions=2,
                                max_bucket=10).to_pandas()
    assert got["truncated"].all() and len(got) > 0
    assert (got["dist"] == 0).all()

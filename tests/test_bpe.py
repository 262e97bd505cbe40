"""BPE tokenizer (stages/bpe.py): the incremental merge trainer must
equal a naive recount-everything reference on random corpora, encoding
must be the greedy lowest-rank merge whose concatenation reproduces
the word, and the distributed train/encode path must equal the
driver-side functions exactly."""

import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from chomper_ray.stages.bpe import (BpeModel, bpe_encode, bpe_train,
                                    corpus_word_counts, encode_word,
                                    learn_merges)

_EOW = "</w>"


def naive_learn(word_counts, n_merges):
    """Recount-everything reference trainer (clean-room check of the
    incremental index): same (count DESC, pair ASC) tie-break."""
    words = {w: list(w[:-1]) + [w[-1] + _EOW] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc = {}
        for w, syms in words.items():
            f = word_counts[w]
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] <= 0:
            break
        merges.append(best)
        for w, syms in words.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_trainer_classic_example():
    # the Sennrich toy corpus: 'es' (9+3) then 'est</w>' dominate
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    m = learn_merges(wc, 4)
    assert m == naive_learn(wc, 4)
    assert m[0] == ("e", "s") and m[1] == ("es", "t</w>")
    ranks = BpeModel(merges=m).ranks()
    assert encode_word("newest", ranks)[-1] == "est</w>"
    # detokenization = concatenation minus the marker
    assert "".join(encode_word("newest", ranks)) == "newest" + _EOW


@given(st.dictionaries(
    st.text(alphabet="abcde", min_size=1, max_size=6),
    st.integers(1, 20), min_size=1, max_size=12),
    st.integers(0, 10))
@settings(max_examples=60, deadline=None)
def test_incremental_equals_naive(wc, n):
    assert learn_merges(dict(wc), n) == naive_learn(dict(wc), n)


def test_encode_word_memo_and_no_merges():
    ranks = {}
    assert encode_word("abc", ranks) == ("a", "b", "c" + _EOW)
    cache = {}
    ranks = BpeModel(merges=[("a", "b"), ("ab", "c</w>")]).ranks()
    assert encode_word("abc", ranks, cache) == ("abc</w>",)
    assert cache["abc"] == ("abc</w>",)


def test_distributed_train_encode_matches_driver(ray_session):
    texts = ["the cat sat on the mat", "the cat ate the rat",
             "a mat a cat a hat", None, "", "cat cat cat"]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                 "text": texts}))
    model = bpe_train(ds, n_merges=12)
    # distributed word counts == driver pandas counts
    wc = corpus_word_counts(ds)
    ref = (pd.Series(texts).fillna("").str.findall(model.pattern)
           .explode().dropna().value_counts())
    assert wc == {w: int(c) for w, c in ref.items()}
    assert model.merges == naive_learn(wc, 12)

    out = (bpe_encode(ds, model).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    import re
    ranks = model.ranks()
    for i, t in enumerate(texts):
        want = []
        for w in re.findall(model.pattern, t or ""):
            want.extend(encode_word(w, ranks))
        assert list(out["bpe_tokens"][i]) == want

    cnt = (bpe_encode(ds, model, counts_only=True).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert (cnt["n_bpe_tokens"]
            == out["bpe_tokens"].apply(len)).all()


def test_model_roundtrip(tmp_path):
    m = BpeModel(merges=[("a", "b"), ("ab", "c</w>")])
    m.save(tmp_path / "bpe.json")
    m2 = BpeModel.load(tmp_path / "bpe.json")
    assert m2.merges == m.merges and m2.pattern == m.pattern


def test_max_words_cap(ray_session):
    texts = ["aa bb cc dd", "aa bb cc", "aa bb", "aa"]
    ds = rd.from_arrow(pa.table({"text": texts}))
    wc = corpus_word_counts(ds, max_words=2)
    assert set(wc) == {"aa", "bb"}  # top-2 by count, tie-broken by word


def test_pack_by_bpe_counts(ray_session):
    # BPE counts -> pack_sequences(n_col=...): example boundaries are
    # the prefix sums of n_bpe_tokens in key order, not whitespace
    from chomper_ray.stages.text import pack_sequences

    texts = ["aa bb aa bb", "cc dd", "aa aa aa", "ee", "aa bb cc dd ee"]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                 "text": texts}))
    model = bpe_train(ds, n_merges=4)
    enc = bpe_encode(ds, model, counts_only=True)
    packed = (pack_sequences(enc, 5, n_col="n_bpe_tokens")
              .to_pandas().sort_values(["example_id", "doc_id"])
              .reset_index(drop=True))
    # reference arithmetic over the same counts
    cnt = (enc.to_pandas().sort_values("doc_id")
           .set_index("doc_id")["n_bpe_tokens"])
    off, want = 0, []
    for did, n in cnt.items():
        if n == 0:
            continue
        cs, ce = off, off + n
        for eid in range(cs // 5, (ce - 1) // 5 + 1):
            want.append((did, eid, max(0, eid * 5 - cs),
                         min(n, (eid + 1) * 5 - cs), n))
        off = ce
    got = [(r.doc_id, r.example_id, r.tok_lo, r.tok_hi, r.n_tokens)
           for r in packed.itertuples(index=False)]
    assert sorted(got) == sorted(want)
    # every example except the last is exactly full
    sums = packed.groupby("example_id").apply(
        lambda g: (g["tok_hi"] - g["tok_lo"]).sum())
    assert (sums.iloc[:-1] == 5).all() and 0 < sums.iloc[-1] <= 5

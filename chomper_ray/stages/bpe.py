"""Byte-pair-encoding tokenizer — trained AND applied on Ray Data.

The real thing, not the token-count heuristic (`text.count_tokens`):
`bpe_train` learns an ordered merge list from corpus word frequencies
(Sennrich et al. 2016, arXiv:1508.07909 — learn on the word-frequency
table, exactly how production trainers work), and `bpe_encode` applies
the merges distributed.

Scale shape (the fit-bound discipline of `text.fit_nb_classifier` /
`similarity.kmeans`):

- **word counts are distributed**: per-block regex word extraction +
  block-local counts (combiner), one `groupby` over DISTINCT words —
  shuffle volume is the vocabulary, never the corpus — then a bounded
  top-``max_words`` table ships to the driver (web-scale corpora have
  ~10^6-10^7 distinct words; the cap makes the driver bound explicit
  and the tail of hapaxes doesn't move merges anyway);
- **merge learning is driver-side on that bounded table**: the
  classical incremental algorithm (pair counts + pair→words inverted
  index; only words containing the just-merged pair are re-scanned) —
  O(merges × touched-words), deterministic with the (count DESC,
  pair ASC) tie-break;
- **encoding is stateless fan-out**: the merge-rank table is
  broadcast once via ``ray.put``; each task encodes its block's
  DISTINCT words (greedy lowest-rank merge, the standard algorithm)
  through a per-call memo, then maps words back to rows — per-block
  cost is distinct-words × merge-depth, and repeated words are free.

Word symbols follow the paper: characters, with ``</w>`` fused onto
the final character (so ``"low"`` → ``('l', 'o', 'w</w>')``) —
detokenization is concatenation minus the marker.

Reference ancestry: the reference engine has no tokenizer at all;
this exists for the training-data regime (SURVEY.md §6's text family)
next to `pack_sequences`, which consumes token counts.
"""
from __future__ import annotations

import json
import re
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

from chomper_ray.stages.text import _WORD_RE

_EOW = "</w>"


def _symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + _EOW,)


@dataclass
class BpeModel:
    """Ordered merge list + the regex that produced the words."""

    merges: list[tuple[str, str]]
    pattern: str = _WORD_RE

    def ranks(self) -> dict[tuple[str, str], int]:
        return {tuple(m): i for i, m in enumerate(self.merges)}

    def save(self, path) -> None:
        Path(path).write_text(json.dumps(
            {"pattern": self.pattern,
             "merges": [list(m) for m in self.merges]}))

    @classmethod
    def load(cls, path) -> "BpeModel":
        d = json.loads(Path(path).read_text())
        return cls(merges=[tuple(m) for m in d["merges"]],
                   pattern=d["pattern"])


def encode_word(word: str, ranks: dict, cache: dict | None = None) \
        -> tuple[str, ...]:
    """Greedy lowest-rank merging of one word (the standard BPE apply
    loop); ``cache`` memoizes across a batch's repeated words."""
    if cache is not None and word in cache:
        return cache[word]
    syms = list(_symbols(word))
    while len(syms) > 1:
        best, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    out = tuple(syms)
    if cache is not None:
        cache[word] = out
    return out


def encode_text(text, ranks: dict, rx, cache: dict) -> list[str]:
    """One doc's BPE token stream: words via the compiled pattern,
    each encoded through the shared memo. THE single definition of
    'text → tokens' — `bpe_encode`, `read_packed(model=)` and
    `PackedStreamConsumer` all call this, so their counts and slices
    can never drift apart."""
    t = text if isinstance(text, str) else ""
    return [tok for w in rx.findall(t)
            for tok in encode_word(w, ranks, cache)]


def learn_merges(word_counts: dict[str, int], n_merges: int) \
        -> list[tuple[str, str]]:
    """Driver-side merge learning over a word-frequency table — the
    incremental algorithm: global pair counts plus a pair→word-ids
    inverted index, so each merge re-scans ONLY the words containing
    the merged pair. Deterministic: ties break (count DESC, pair ASC).
    """
    import heapq

    words = [list(_symbols(w)) for w in word_counts]
    freqs = list(word_counts.values())
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        f = freqs[wi]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(wi)
    # lazy max-heap for argmax: stale entries (count changed since
    # push) are skipped on pop; (-count, pair) ordering IS the
    # (count DESC, pair ASC) tie-break
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair = None
        while heap:
            nc, p = heapq.heappop(heap)
            if -nc > 0 and pair_counts.get(p, 0) == -nc:
                pair = p
                break
        if pair is None:
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        touched: set[tuple[str, str]] = set()
        for wi in list(pair_words.get(pair, ())):
            syms, f = words[wi], freqs[wi]
            # subtract this word's old pairs, rewrite, add new pairs
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= f
                touched.add((a, b))
                s = pair_words.get((a, b))
                if s is not None:
                    s.discard(wi)
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
                touched.add((a, b))
                pair_words.setdefault((a, b), set()).add(wi)
        for p in touched:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
    return merges


def corpus_word_counts(ds, col: str = "text", pattern: str = _WORD_RE,
                       max_words: int = 200_000) -> dict[str, int]:
    """Distributed word-frequency table, capped to the ``max_words``
    most frequent (ties by word ASC): per-block combiner → one
    distinct-word groupby → bounded top-k to the driver. The per-batch
    cut uses the SAME (n DESC, w ASC) total order as the global one,
    so each grouped batch ships at most ``max_words`` rows and the
    global head is still exact (a word lives in exactly one group)."""
    rx = pattern

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = (df[col].fillna("").astype(str).str.findall(rx)
              .explode().dropna().value_counts())
        return pd.DataFrame({"w": vc.index.astype(object),
                             "n": vc.to_numpy(np.int64)})

    counts = (ds.map_batches(block_counts, batch_format="pandas")
              .groupby("w").sum("n"))
    frames = []
    for b in counts.iter_batches(batch_format="pandas"):
        b = b.rename(columns={"sum(n)": "n"})
        frames.append(b.sort_values(["n", "w"],
                                    ascending=[False, True],
                                    kind="stable").head(max_words))
    allw = pd.concat(frames, ignore_index=True) if frames else \
        pd.DataFrame({"w": [], "n": []})
    allw = allw.sort_values(["n", "w"], ascending=[False, True],
                            kind="stable").head(max_words)
    return dict(zip(allw["w"], allw["n"].astype(int)))


def bpe_train(ds, col: str = "text", n_merges: int = 200,
              pattern: str = _WORD_RE,
              max_words: int = 200_000) -> BpeModel:
    wc = corpus_word_counts(ds, col, pattern, max_words)
    return BpeModel(merges=learn_merges(wc, n_merges), pattern=pattern)


def bpe_encode(ds, model: BpeModel, col: str = "text",
               out: str = "bpe_tokens", counts_only: bool = False):
    """Apply the merges distributed: broadcast the rank table once,
    encode each block's DISTINCT words through a memo, map back to
    rows. ``counts_only`` emits just ``n_bpe_tokens`` (what
    `pack_sequences`-style budgeting needs) instead of token lists."""
    import ray

    ref = ray.put((model.ranks(), model.pattern))

    def enc(batch: pa.Table) -> pa.Table:
        ranks, pat = ray.get(ref)
        rx = re.compile(pat)
        texts = batch[col].to_pandas()
        cache: dict[str, tuple[str, ...]] = {}
        toks_per_row = [encode_text(t, ranks, rx, cache) for t in texts]
        if counts_only:
            arr = pa.array([len(r) for r in toks_per_row],
                           type=pa.int64())
            return batch.append_column("n_bpe_tokens", arr)
        return batch.append_column(
            out, pa.array(toks_per_row, type=pa.list_(pa.string())))

    return ds.map_batches(enc, batch_format="pyarrow")

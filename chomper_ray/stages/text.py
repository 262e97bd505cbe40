"""Text-analysis stages for training-data pipelines over the `documents`
table: token counting, quality scoring, language-ID, fingerprinting.

All stages are ``map_batches``-shaped; the regex/profile state is
module-level (compiled once per worker process) and the hot loops are
pandas/numpy vectorized string kernels, not Python-per-row.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

# --- token counting ---------------------------------------------------------

_TOKEN_RE = r"\S+"          # whitespace tokenization (SQL-oracle friendly)
_WORD_RE = r"[A-Za-z0-9]+(?:'[a-z]+)?"  # BPE-ish word regex

_STOPWORDS = (
    "the and of a to in is was for on that with as it by at from this "
    "be are or an his her their which has had not but were they you"
).split()


def count_tokens(batch: pd.DataFrame, col: str = "text",
                 out: str = "n_tokens") -> pd.DataFrame:
    """Whitespace token count (vectorized ``str.count``). SQL oracle:
    ``len(regexp_extract_all(text, '\\S+'))``."""
    batch[out] = batch[col].str.count(_TOKEN_RE).fillna(0).astype("int64")
    return batch


def count_words(batch: pd.DataFrame, col: str = "text",
                out: str = "n_words") -> pd.DataFrame:
    """BPE-ish word-regex token count."""
    batch[out] = batch[col].str.count(_WORD_RE).fillna(0).astype("int64")
    return batch


def normalize_text(batch: pd.DataFrame, col: str = "text",
                   out: str = "text_norm") -> pd.DataFrame:
    """Canonical training-text normalization: lowercase, non-alnum → space
    (explicit ASCII classes so the DuckDB oracle's RE2 semantics match
    exactly), collapse runs of whitespace, strip. Vectorized pandas str
    kernels — SQL oracle in ``sql_normalize_expr``."""
    s = batch[col].fillna("").str.lower()
    s = s.str.replace(r"[^a-z0-9 \t\n\r]", " ", regex=True)
    s = s.str.replace(r"[ \t\n\r]+", " ", regex=True).str.strip()
    batch[out] = s
    return batch


def sql_normalize_expr(col: str = "text") -> str:
    return ("trim(regexp_replace(regexp_replace(lower(" + col + "), "
            "'[^a-z0-9 \\t\\n\\r]', ' ', 'g'), '[ \\t\\n\\r]+', ' ', 'g'))")


def remove_frequent_segments(ds, col: str = "text", id_col: str = "doc_id",
                             min_docs: int = 3, sep: str = "\n",
                             out: str = "text_clean"):
    """Corpus-level boilerplate removal (the C4/RefinedWeb "drop lines
    shared across many documents" step, generalized over ``sep``):
    a segment (line for ``sep='\\n'``; token for ``sep=' '`` = document-
    frequency pruning) is removed from every document when it occurs in
    ≥ ``min_docs`` DISTINCT documents.

    Shape: pass 1 — per-block DISTINCT (segment, doc) pairs (combiner)
    → grouped doc-frequency count → DISTRIBUTED filter to the frequent
    set (bounded: ≤ total_segments / min_docs entries) → driver collect +
    ``ray.put`` broadcast (swap in a Bloom filter via
    ``relational.bloom_semi_join`` machinery when the frequent set
    outgrows a broadcast). Pass 2 — map-only per-doc filter + ordered
    reassembly; no shuffle touches document text.

    A document whose every segment is removed yields null (matches SQL
    ``string_agg(...) FILTER`` semantics).
    """
    import ray

    from chomper_ray.pipelines.relational import grouped_agg

    def seg_doc_pairs(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col].fillna("").str.split(sep)
        ex = s.explode()
        ids = df[id_col].reindex(ex.index)
        return pd.DataFrame({"seg": ex.to_numpy(),
                             id_col: ids.to_numpy()}).drop_duplicates()

    counts = grouped_agg(
        ds.map_batches(seg_doc_pairs, batch_format="pandas"),
        keys=["seg"], counts=True)
    freq = counts.map_batches(
        lambda df: df.loc[df["n_rows"] >= min_docs, ["seg"]],
        batch_format="pandas").to_pandas()
    freq_ref = ray.put(frozenset(freq["seg"]))

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        drop = ray.get(freq_ref)
        def rebuild(t):
            kept = [x for x in (t or "").split(sep) if x not in drop]
            return sep.join(kept) if kept else None
        df[out] = df[col].map(rebuild)
        return df[[id_col, out]]

    return ds.map_batches(clean, batch_format="pandas")


def dedup_lines(ds, col: str = "text", id_col: str = "doc_id",
                sep: str = "\n", out: str = "text_dedup",
                num_partitions: int = 32, id_type: pa.DataType | None = None):
    """Corpus-level EXACT line deduplication with keep-first semantics —
    the CCNet "deduplicate lines across shards" step in its exact form:
    every distinct line value survives exactly once in the whole corpus,
    at its first occurrence ordered by (``id_col``, line position); all
    later occurrences are dropped. Contrast `remove_frequent_segments`
    (C4 boilerplate), which removes a frequent line from EVERY document
    including the first: corpus dedup wants content kept once.

    Shape — a composition of audited primitives, nothing lands on the
    driver: explode → ``arg_extremum`` keep-first combiner (the shuffle
    carries ≤ one row per distinct line per block, never raw
    occurrences) → the winner rows ARE the surviving occurrences, so
    reassembly is ``grouped_collect`` over winners only (shuffle volume
    = distinct lines, not the corpus) → left ``hash_join`` back onto
    the doc-id spine. A document whose every line lost yields null
    (SQL ``string_agg`` semantics under a left join).
    """
    from chomper_ray.pipelines.relational import (arg_extremum,
                                                  grouped_collect,
                                                  hash_join)

    def explode_lines(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col].fillna("").str.split(sep)
        e = s.explode()
        return pd.DataFrame({
            "line": e.to_numpy(),
            id_col: df[id_col].reindex(e.index).to_numpy(),
            "_ln": (e.groupby(level=0).cumcount() + 1)
            .to_numpy().astype("int64"),
        })

    occ = ds.map_batches(explode_lines, batch_format="pandas")
    winners = arg_extremum(occ, key="line", order=id_col, tie="_ln",
                           mode="min", num_partitions=num_partitions)
    collected = grouped_collect(winners, key=id_col, value="line",
                                order=["_ln"], sep=sep, out=out,
                                num_partitions=num_partitions)
    idt = id_type if id_type is not None else pa.int64()
    spine = ds.map_batches(lambda t: t.select([id_col]),
                           batch_format="pyarrow")
    return hash_join(spine, collected, on=id_col, how="left",
                     num_buckets=num_partitions,
                     left_schema=pa.schema([(id_col, idt)]),
                     right_schema=pa.schema([(id_col, idt),
                                             (out, pa.string())]))


# --- quality scoring --------------------------------------------------------

class QualityScorer:
    """Heuristic document-quality features (actor-pool stage).

    Emits: ``n_chars``, ``n_tokens``, ``mean_token_len``, ``punct_ratio``,
    ``stopword_ratio``, ``upper_ratio`` and a combined ``quality_score`` in
    [0, 1]. Components are chosen to be SQL-expressible for the oracle
    (length / regexp counts / list_filter), so the whole stage is
    hash-verified against DuckDB, not just row-counted.
    """

    def __init__(self, col: str = "text"):
        self.col = col
        self.stop = set(_STOPWORDS)
        # one alternation regex counts stopword tokens vectorized; the
        # lookarounds make it equivalent to "maximal [a-z]+ run ∈ set"
        self.stop_re = (r"(?<![a-z])(?:"
                        + "|".join(sorted(self.stop, key=len, reverse=True))
                        + r")(?![a-z])")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.col].fillna("")
        n_chars = s.str.len().astype("int64")
        n_tokens = s.str.count(_TOKEN_RE).astype("int64")
        n_punct = s.str.count(r"[.,;:!?]").astype("int64")
        n_upper = s.str.count(r"[A-Z]").astype("int64")
        lower = s.str.lower()
        n_stop = lower.str.count(self.stop_re).astype("int64")
        n_lower_words = lower.str.count(r"[a-z]+").astype("int64")

        denom_c = n_chars.clip(lower=1)
        denom_t = n_lower_words.clip(lower=1)
        batch["n_chars_q"] = n_chars
        batch["n_tokens"] = n_tokens
        batch["punct_ratio"] = (n_punct / denom_c).round(6)
        batch["upper_ratio"] = (n_upper / denom_c).round(6)
        batch["stopword_ratio"] = (n_stop / denom_t).round(6)
        # length score: saturating ramp to 200 tokens
        length_score = (n_tokens / 200).clip(upper=1.0)
        stop_score = (batch["stopword_ratio"] * 4).clip(upper=1.0)
        punct_ok = (1 - (batch["punct_ratio"] * 10).clip(upper=1.0) * 0.5)
        batch["quality_score"] = (
            (length_score * 0.4 + stop_score * 0.4 + punct_ok * 0.2)
        ).round(6)
        return batch


# --- language identification ------------------------------------------------

# Tiny per-language stopword profiles (public common-word lists).
_LANG_PROFILES = {
    "en": "the and of to in is was for that with you not this are have",
    "de": "der die und das ist nicht von mit den ein eine auf als auch",
    "fr": "le la les et des que pour dans est une qui pas sur avec",
    "es": "el la los las que de en una para con por como mas este",
    "it": "il la che di e per una con del non sono questo come",
    "pt": "o que de e em um uma para com nao mais por como dos",
    "nl": "de het een en van dat is in op niet met voor zijn",
    "ru": "i v ne na chto eto kak po za iz ego k tak",
}


class LanguageId:
    """N-gram/stopword-overlap language heuristic (actor-pool stage).

    Scores each document's lowercased word set against the per-language
    profiles; emits ``lang_pred`` and ``lang_conf``. Profiles are built
    once per actor in ``__init__``.
    """

    def __init__(self, col: str = "text"):
        self.col = col
        # one alternation-count regex per language → fully vectorized
        # scoring (pandas str.count), built once per actor
        self.langs = list(_LANG_PROFILES)
        self.patterns = {
            l: (r"(?<![a-z'])(?:"
                + "|".join(sorted(_LANG_PROFILES[l].split(), key=len,
                                  reverse=True))
                + r")(?![a-z'])")
            for l in self.langs
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        lower = batch[self.col].fillna("").str.lower()
        scores = np.stack([
            lower.str.count(self.patterns[l]).to_numpy(dtype=np.float64)
            for l in self.langs
        ])  # (n_langs, n_rows)
        total = scores.sum(axis=0)
        best = scores.argmax(axis=0)
        has_hit = total > 0
        lang_arr = np.array(self.langs, dtype=object)
        batch["lang_pred"] = np.where(has_hit, lang_arr[best], None)
        with np.errstate(invalid="ignore"):
            conf = np.where(has_hit, scores[best, np.arange(scores.shape[1])]
                            / np.maximum(total, 1), 0.0)
        batch["lang_conf"] = np.round(conf, 6)
        return batch


# --- fingerprinting ---------------------------------------------------------

def fingerprint_column(texts, *, window: int = 8) -> np.ndarray:
    """Rolling-hash document fingerprint: min-of-rolling-hashes over token
    windows (a 1-perm winnowing sketch) — stable under whitespace layout.

    Token hashing uses pandas' vectorized stable siphash; the window hash
    is a polynomial rolling hash computed with numpy sliding windows
    (uint64 wraparound arithmetic — no Python inner loop).
    """
    base = np.uint64(1000003)
    out = np.empty(len(texts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        weights_full = np.power(base, np.arange(window - 1, -1, -1, dtype=np.uint64))
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                out[i] = 0
                continue
            hs = pd.util.hash_array(np.array(toks, dtype=object))
            w = min(window, len(hs))
            weights = np.power(base, np.arange(w - 1, -1, -1, dtype=np.uint64)) \
                if w != window else weights_full
            wins = np.lib.stride_tricks.sliding_window_view(hs, w)
            rolls = (wins * weights).sum(axis=1, dtype=np.uint64)
            out[i] = rolls.min()
    return out


def add_fingerprint(batch: pd.DataFrame, col: str = "text",
                    out: str = "fingerprint") -> pd.DataFrame:
    batch[out] = fingerprint_column(batch[col].tolist()).astype("uint64")
    return batch


def fingerprint_md5_column(texts, *, window: int = 8) -> np.ndarray:
    """SQL-replayable sibling of ``fingerprint_column``: min over
    md5-hashes of token windows (the same 1-perm winnowing shape, but
    the window hash is the first 16 hex chars of md5 of the
    space-joined window — exactly DuckDB's
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT`` — instead of the
    pandas siphash rolling hash, so an oracle can verify it
    bit-for-bit). Stable under whitespace layout like the original;
    ~2 µs/window, bounded per distributed batch."""
    import hashlib
    import re as _re

    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = _re.findall(r"\S+", t or "")
        if not toks:
            out[i] = 0
            continue
        n = max(len(toks) - window + 1, 1)
        out[i] = min(
            int(hashlib.md5(" ".join(toks[j:j + window]).encode())
                .hexdigest()[:16], 16)
            for j in range(n))
    return out


def add_fingerprint_md5(batch: pd.DataFrame, col: str = "text",
                        out: str = "fingerprint") -> pd.DataFrame:
    batch[out] = fingerprint_md5_column(batch[col].tolist()) \
        .astype("uint64")
    return batch


def sql_fingerprint_md5_sql(table: str = "documents",
                            key: str = "doc_id", window: int = 8) -> str:
    """DuckDB rendering of ``fingerprint_md5_column`` (for oracle_sql):
    unnest one window start per position, slice the token list, md5 the
    space-joined window, min per document."""
    w = int(window)
    return (
        f"WITH t AS (SELECT {key}, regexp_extract_all("
        f"coalesce(text, ''), '\\S+') AS toks FROM {table}), "
        f"wins AS (SELECT {key}, unnest(range(1, greatest(len(toks) - "
        f"{w - 1}, 1) + 1)) AS i, toks FROM t WHERE len(toks) > 0), "
        f"h AS (SELECT {key}, ('0x' || substr(md5(array_to_string("
        f"list_slice(toks, i, i + {w - 1}), ' ')), 1, 16))::UBIGINT "
        f"AS hv FROM wins), "
        f"agg AS (SELECT {key}, min(hv) AS fingerprint FROM h "
        f"GROUP BY {key}) "
        f"SELECT d.{key}, CAST(coalesce(a.fingerprint, 0) AS UBIGINT) "
        f"AS fingerprint FROM {table} d LEFT JOIN agg a USING ({key})")


def simhash_md5_column(texts) -> np.ndarray:
    """SQL-replayable sibling of the siphash simhash (stages/dedup.py):
    the classic Charikar sketch — per distinct token, md5-derived 64-bit
    hash weighted by term frequency; bit j of the sketch is 1 iff the
    weighted ±1 sum over that bit position is > 0. All-INTEGER
    arithmetic (±tf sums), so engine/oracle parity is exact by
    construction, not by rounding discipline."""
    import hashlib
    import re as _re

    out = np.empty(len(texts), dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = _re.findall(r"\S+", t or "")
        if not toks:
            out[i] = 0
            continue
        uniq, tf = np.unique(np.array(toks, dtype=object),
                             return_counts=True)
        hv = np.array([int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
                       for w in uniq], dtype=np.uint64)
        bits = ((hv[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        v = ((2 * bits - 1) * tf[:, None].astype(np.int64)).sum(axis=0)
        out[i] = np.uint64(((v > 0).astype(np.uint64)
                            << shifts).sum(dtype=np.uint64))
    return out


def add_simhash_md5(batch: pd.DataFrame, col: str = "text",
                    out: str = "simhash") -> pd.DataFrame:
    batch[out] = simhash_md5_column(batch[col].tolist()).astype("uint64")
    return batch


def sql_simhash_md5_sql(table: str = "documents",
                        key: str = "doc_id") -> str:
    """DuckDB rendering of ``simhash_md5_column`` (for oracle_sql):
    unnest tokens, tf per distinct token, md5 → UBIGINT, ±tf per bit
    position, reassemble the sign bits."""
    return (
        f"WITH tok AS (SELECT {key}, w, count(*)::BIGINT AS tf FROM ("
        f"SELECT {key}, unnest(regexp_extract_all(coalesce(text, ''), "
        f"'\\S+')) AS w FROM {table}) GROUP BY 1, 2), "
        f"h AS (SELECT {key}, tf, ('0x' || substr(md5(w), 1, 16))"
        f"::UBIGINT AS hv FROM tok), "
        f"bits AS (SELECT {key}, j, sum(CASE WHEN (hv >> j) & 1 = 1 "
        f"THEN tf ELSE -tf END) AS v FROM h, "
        f"(SELECT unnest(range(64)) AS j) js GROUP BY 1, 2), "
        # HUGEINT shifts: UBIGINT << 63 overflows in DuckDB (the shift
        # computes in signed 64-bit); 128-bit accumulate, cast at the end
        f"sk AS (SELECT {key}, CAST(sum(CASE WHEN v > 0 THEN "
        f"(1::HUGEINT << CAST(j AS INTEGER)) ELSE 0::HUGEINT END) AS "
        f"UBIGINT) AS simhash FROM bits GROUP BY 1) "
        f"SELECT d.{key}, CAST(coalesce(s.simhash, 0) AS UBIGINT) AS "
        f"simhash FROM {table} d LEFT JOIN sk s USING ({key})")


def sql_langid_sql(table: str = "documents", key: str = "doc_id") -> str:
    """DuckDB rendering of ``LanguageId`` (for oracle_sql): the stage's
    boundary-regex count of profile words equals the count of maximal
    ``[a-z']`` runs exactly in the profile set (the lookbehind/lookahead
    pair forces a match to cover a whole run), which RE2-based DuckDB —
    no lookaround — expresses as tokenize + list_filter. argmax ties
    break to the FIRST language in profile order (np.argmax), rendered
    as a >=-chain CASE; confidence is the same exact-int division
    rounded half-to-even (round_even) like np.round."""
    langs = list(_LANG_PROFILES)
    score = {}
    for lang in langs:
        words = ", ".join("'" + w.replace("'", "''") + "'"
                          for w in _LANG_PROFILES[lang].split())
        score[lang] = (
            "len(list_filter(regexp_extract_all(lower(coalesce(text, "
            f"'')), '[a-z'']+'), w -> w IN ({words})))")
    sel = ", ".join(f"{score[lang]} AS s_{lang}" for lang in langs)
    tot = " + ".join(f"s_{lang}" for lang in langs)
    arms = []
    for i, lang in enumerate(langs[:-1]):
        cond = " AND ".join(f"s_{lang} >= s_{o}" for o in langs[i + 1:])
        arms.append(f"WHEN {cond} THEN 's_{lang}'")
    pred = (f"CASE WHEN {tot} = 0 THEN NULL "
            + " ".join(arms) + f" ELSE 's_{langs[-1]}' END")
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    conf = (f"CASE WHEN {tot} = 0 THEN 0.0 ELSE "
            f"round_even({best} * 1.0 / ({tot}), 6) END")
    return (f"WITH s AS (SELECT {key}, {sel} FROM {table}) "
            f"SELECT {key}, substr({pred}, 3) AS lang_pred, "
            f"{conf} AS lang_conf FROM s")


def sql_quality_exprs(stop_words=None) -> dict[str, str]:
    """DuckDB renderings of the QualityScorer components (for oracle_sql)."""
    stops = ", ".join(f"'{w}'" for w in (stop_words or _STOPWORDS))
    n_chars = "length(text)"
    n_tokens = r"len(regexp_extract_all(text, '\S+'))"
    n_punct = "len(regexp_extract_all(text, '[.,;:!?]'))"
    n_upper = "len(regexp_extract_all(text, '[A-Z]'))"
    words = "regexp_extract_all(lower(text), '[a-z]+')"
    n_stop = f"len(list_filter({words}, w -> w IN ({stops})))"
    n_lw = f"len({words})"
    return {
        "n_chars_q": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": f"round({n_punct} * 1.0 / greatest({n_chars}, 1), 6)",
        "upper_ratio": f"round({n_upper} * 1.0 / greatest({n_chars}, 1), 6)",
        "stopword_ratio": f"round({n_stop} * 1.0 / greatest({n_lw}, 1), 6)",
        "quality_score": (
            f"round(least({n_tokens} / 200.0, 1.0) * 0.4"
            f" + least(round({n_stop} * 1.0 / greatest({n_lw}, 1), 6) * 4, 1.0) * 0.4"
            f" + (1 - least(round({n_punct} * 1.0 / greatest({n_chars}, 1), 6) * 10, 1.0) * 0.5) * 0.2, 6)"
        ),
    }


# --- PII scrubbing ----------------------------------------------------------
# Canonical pre-training redaction pass. Patterns are deliberately RE2-safe
# (no backreferences / lookaround) and use explicit ASCII classes so the
# DuckDB oracle's regexp_replace produces byte-identical output; both
# engines use leftmost-first greedy semantics for these shapes. Scrub order
# matters and is fixed (email -> phone -> IPv4): each replacement token is
# alphabetic-with-angle-brackets, so later patterns can never match across
# an earlier redaction.

_PII_EMAIL = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_PII_PHONE = re.compile(r"\+?[0-9][0-9()\- ]{6,}[0-9]")
_PII_IPV4 = re.compile(r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b")

_PII_STEPS = [(_PII_EMAIL, "<EMAIL>"), (_PII_PHONE, "<PHONE>"),
              (_PII_IPV4, "<IP>")]


def scrub_pii(batch: pd.DataFrame, col: str = "text",
              out: str = "text_scrubbed",
              count_out: str = "n_pii") -> pd.DataFrame:
    """Redact emails, phone-number runs, and IPv4 literals; count the
    replacements made. Vectorized pandas str kernels; nulls stay null.
    SQL oracle: ``sql_pii_exprs``."""
    s = batch[col]
    total = None
    for pat, tok in _PII_STEPS:
        n = s.str.count(pat.pattern)
        total = n if total is None else total + n
        s = s.str.replace(pat, tok, regex=True)
    batch[out] = s
    batch[count_out] = total.fillna(0).astype("int64")
    return batch


def sql_pii_exprs(col: str = "text") -> dict[str, str]:
    """DuckDB renderings of scrub_pii (text_scrubbed, n_pii)."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+?[0-9][0-9()\- ]{6,}[0-9]"
    ipv4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
    s1 = f"regexp_replace({col}, '{email}', '<EMAIL>', 'g')"
    s2 = f"regexp_replace({s1}, '{phone}', '<PHONE>', 'g')"
    s3 = f"regexp_replace({s2}, '{ipv4}', '<IP>', 'g')"
    n = (f"len(regexp_extract_all({col}, '{email}'))"
         f" + len(regexp_extract_all({s1}, '{phone}'))"
         f" + len(regexp_extract_all({s2}, '{ipv4}'))")
    return {"text_scrubbed": s3, "n_pii": f"coalesce({n}, 0)"}


# --- repetition stats (Gopher-style quality signals) ------------------------

def repetition_stats(batch: pd.DataFrame, col: str = "text",
                     dup_out: str = "dup_word_frac",
                     top_out: str = "top_word_frac") -> pd.DataFrame:
    """Word-level repetition signals used by Gopher-style quality
    filtering: fraction of duplicate words (1 - distinct/total) and the
    most-frequent word's share of the document. Splitting is a literal
    single-space split (SQL ``string_split`` parity; the documents corpus
    is space-delimited). Implemented in polars — split / n_unique /
    explode / group_by are Rust-vectorized, no Python per row.
    """
    import polars as pl

    s = pl.Series("t", batch[col].fillna("").astype(str).tolist())
    words = s.str.split(" ")
    n = words.list.len()
    nu = words.list.n_unique()
    dup = (1.0 - nu / pl.Series(n).clip(lower_bound=1)).round(6)

    ex = pl.DataFrame({"i": pl.int_range(len(s), eager=True),
                       "w": words}).explode("w")
    top = (ex.group_by(["i", "w"]).len()
           .group_by("i").agg(mx=pl.col("len").max(),
                              tot=pl.col("len").sum())
           .sort("i"))
    top_frac = (top["mx"] / top["tot"]).round(6)

    batch[dup_out] = dup.to_numpy()
    batch[top_out] = top_frac.to_numpy()
    return batch


def sql_repetition_exprs(col: str = "text") -> dict[str, str]:
    """DuckDB renderings of repetition_stats. ``top_word_frac`` needs an
    unnest+group-by, so it is returned as a correlated-free subquery
    TEMPLATE over the base table (see the driver query for usage)."""
    words = f"string_split(coalesce({col}, ''), ' ')"
    return {
        "dup_word_frac": (f"round(1.0 - len(list_distinct({words})) * 1.0 /"
                          f" greatest(len({words}), 1), 6)"),
    }


def tfidf_top_terms(ds, col: str = "text", id_col: str = "doc_id",
                    k: int = 3, n_docs: int | None = None,
                    ndigits: int = 6, num_partitions: int = 32):
    """Per-document top-k terms by TF-IDF (whitespace tokens, the
    keyword-extraction step of a curation pipeline) — a composition of
    the engine's own primitives, each already scale-audited:

    1. TF is block-local: a document never splits across blocks, so one
       explode + groupby per block yields final ``(doc, term, tf)`` rows
       — no shuffle touches tokens.
    2. DF = rows per term over the (already-distinct) TF rows:
       ``grouped_agg`` (combiner shuffle over distinct (term, block)
       partials).
    3. ``hash_join`` TF with DF on term (co-partitioned, skew-salting
       available for stopword-like hot terms if needed).
    4. score = tf · ln(N/df), rounded to ``ndigits`` (ln is IEEE-double
       on both sides so DuckDB parity holds after rounding); per-doc
       top-k via ``group_rank`` (score desc, term asc) ≤ k.

    ``n_docs``: pass the corpus size when known (e.g. parquet row
    count) to skip the count pass."""
    from chomper_ray.pipelines.relational import (grouped_agg, group_rank,
                                                  hash_join)

    if n_docs is None:
        n_docs = ds.count()

    def tf_stage(df: pd.DataFrame) -> pd.DataFrame:
        s = df[[id_col, col]].copy()
        s[col] = s[col].fillna("").str.split(" ")
        e = s.explode(col)
        e = e[e[col].notna() & (e[col] != "")]
        out = (e.groupby([id_col, col], sort=False).size()
               .rename("tf").reset_index()
               .rename(columns={col: "term"}))
        return out.astype({"tf": "int64"})

    tf = ds.map_batches(tf_stage, batch_format="pandas").materialize()
    df_tbl = grouped_agg(tf, keys=["term"], counts=True).map_batches(
        lambda d: d.rename(columns={"n_rows": "df"}),
        batch_format="pandas")

    tf_schema = pa.schema([(id_col, pa.int64()), ("term", pa.string()),
                           ("tf", pa.int64())])
    df_schema = pa.schema([("term", pa.string()), ("df", pa.int64())])
    joined = hash_join(tf, df_tbl, on="term", num_buckets=num_partitions,
                       left_schema=tf_schema, right_schema=df_schema)

    def score(d: pd.DataFrame) -> pd.DataFrame:
        d["tfidf"] = (d["tf"] * np.log(n_docs / d["df"])).round(ndigits)
        return d

    ranked = group_rank(joined.map_batches(score, batch_format="pandas"),
                        by=id_col, order="tfidf", tie="term",
                        descending=True, num_partitions=num_partitions)
    return ranked.map_batches(
        lambda d: d[d["rank"] <= k][[id_col, "term", "tf", "tfidf", "rank"]],
        batch_format="pandas")


# --- URL structure (webtext provenance signals) ------------------------------

# RE2-safe (no backrefs / lookaround) so the DuckDB oracle runs the SAME
# patterns — the engine==RE2 parity contract scrub_pii established.
_URL_SCHEME = r"^([a-z][a-z0-9+.-]*)://"
_URL_HOST = r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"
_URL_PATH = r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"
_URL_DOMAIN = r"([^.]+\.[^.]+)$"          # naive registered domain
_URL_TLD = r"\.([^.]+)$"


def url_parts(batch: pd.DataFrame, col: str = "url") -> pd.DataFrame:
    """Decompose a URL column into scheme / host / path / registered
    domain / TLD — the provenance axes a webtext pipeline filters and
    stratifies on (per-domain quotas, TLD quality priors, blocklists).
    One vectorized ``str.extract`` per part; unparseable parts come back
    as empty strings (DuckDB ``regexp_extract`` no-match parity). The
    registered domain is the naive last-two-labels heuristic — a real
    public-suffix list is a broadcast lookup in the same shape.
    SQL oracle: ``sql_url_exprs``."""
    s = batch[col].astype(str)
    batch["scheme"] = s.str.extract(_URL_SCHEME, expand=False).fillna("")
    host = s.str.extract(_URL_HOST, expand=False).fillna("").str.lower()
    batch["host"] = host
    batch["path"] = s.str.extract(_URL_PATH, expand=False).fillna("")
    batch["domain"] = host.str.extract(_URL_DOMAIN, expand=False).fillna("")
    batch["tld"] = host.str.extract(_URL_TLD, expand=False).fillna("")
    return batch


def sql_url_exprs(col: str = "url") -> dict[str, str]:
    """DuckDB renderings of url_parts (same RE2 patterns)."""
    host = f"lower(regexp_extract({col}, '{_URL_HOST}', 1))"
    return {
        "scheme": f"regexp_extract({col}, '{_URL_SCHEME}', 1)",
        "host": host,
        "path": f"regexp_extract({col}, '{_URL_PATH}', 1)",
        "domain": f"regexp_extract({host}, '{_URL_DOMAIN}', 1)",
        "tld": f"regexp_extract({host}, '\\.([^.]+)$', 1)",
    }


def filter_domains(ds, blocked: set[str], col: str = "url",
                   keep: bool = False):
    """Drop (or keep, with ``keep=True``) rows whose URL's registered
    domain is in ``blocked`` — the standard webtext domain blocklist.
    The set is broadcast once via ``ray.put`` and read inside every
    task; rows never shuffle."""
    import ray

    ref = ray.put(frozenset(d.lower() for d in blocked))

    def f(batch: pd.DataFrame, ref=ref) -> pd.DataFrame:
        bl = ray.get(ref)
        host = batch[col].astype(str).str.extract(
            _URL_HOST, expand=False).fillna("").str.lower()
        dom = host.str.extract(_URL_DOMAIN, expand=False).fillna("")
        m = dom.isin(bl)
        return batch[m if keep else ~m]

    return ds.map_batches(f, batch_format="pandas")


# --- context-window chunking -------------------------------------------------

def chunk_tokens(batch: pd.DataFrame, col: str = "text",
                 id_col: str = "doc_id", size: int = 128,
                 stride: int = 64, out: str = "chunk") -> pd.DataFrame:
    """Split each document into overlapping fixed-size token windows —
    context-window chunking for LLM training/indexing. Chunk ``i``
    covers tokens ``[i*stride, i*stride+size)`` (single-space split,
    SQL ``string_split`` parity); the tail chunk may be shorter. Emits
    one row per chunk: ``id_col, chunk_id, chunk, n_tokens``.

    Pure per-block expansion (use inside ``map_batches``; no shuffle).
    Token boundaries come from one vectorized polars explode + numpy
    char-offset cumsum; chunk texts are ZERO-RECOMPUTE substring slices
    of the original document (a Python slice per OUTPUT chunk — the
    output itself is that size, so the loop is output-bound, never
    tokens × chunks)."""
    import polars as pl

    texts = batch[col].fillna("").astype(str)
    s = pl.Series("t", texts.tolist())
    lens = s.str.split(" ").list.len().to_numpy().astype(np.int64)

    # flat per-token char offsets: token j of doc starts at
    # sum(len(tok_0..j-1)) + j (separators)
    ex = pl.DataFrame({"w": s.str.split(" ")}).explode("w")
    # len_chars, not len_bytes: the slices below index PYTHON strings,
    # which count code points — byte offsets would mis-slice non-ASCII
    tl = ex["w"].str.len_chars().to_numpy().astype(np.int64)
    row_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=row_off[1:])
    flat_cum = np.zeros(len(tl) + 1, dtype=np.int64)
    np.cumsum(tl, out=flat_cum[1:])
    doc_base = flat_cum[row_off[:-1]]          # flat char-sum at doc start
    tok_pos = np.arange(len(tl), dtype=np.int64) \
        - np.repeat(row_off[:-1], lens)        # token index within doc
    tok_start = (flat_cum[:len(tl)]
                 - np.repeat(doc_base, lens) + tok_pos)  # +j separators
    tok_end = tok_start + tl

    n_chunks = (np.maximum(lens, 1) - 1) // stride + 1
    ridx = np.repeat(np.arange(len(lens), dtype=np.int64), n_chunks)
    within = np.arange(int(n_chunks.sum()), dtype=np.int64) \
        - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    st = within * stride
    en = np.minimum(st + size, lens[ridx])
    base = row_off[ridx]
    a = tok_start[base + st]
    b = tok_end[base + en - 1]
    tx = texts.to_numpy()
    chunks = [tx[r][ca:cb] for r, ca, cb in zip(ridx, a, b)]
    return pd.DataFrame({
        id_col: batch[id_col].to_numpy()[ridx],
        "chunk_id": within,
        out: chunks,
        "n_tokens": (en - st).astype("int64"),
    })


def sql_chunk_query(size: int, stride: int, col: str = "text",
                    id_col: str = "doc_id",
                    table: str = "documents") -> str:
    """DuckDB rendering of chunk_tokens over ``table``."""
    return (
        f"WITH t AS (SELECT {id_col}, string_split({col}, ' ') AS l "
        f"FROM {table}), "
        f"c AS (SELECT {id_col}, l, unnest(generate_series(1, "
        f"greatest(len(l), 1), {stride})) AS s FROM t) "
        f"SELECT {id_col}, CAST((s-1)/{stride} AS BIGINT) AS chunk_id, "
        f"array_to_string(l[s:least(s+{size}-1, len(l))], ' ') AS chunk, "
        f"least(s+{size}-1, len(l)) - s + 1 AS n_tokens FROM c"
    )


def pack_sequences(ds, seq_len: int, key: str = "doc_id",
                   col: str = "text", num_partitions: int = 32,
                   sample_per_block: int = 200,
                   n_col: str | None = None):
    """Tokenize-and-pack: concatenate every document's whitespace
    tokens in GLOBAL ``key`` order and cut the stream into fixed
    ``seq_len``-token training examples — the packing step of an LLM
    data pipeline. Emits one row per (document × example) overlap:
    ``key, example_id, tok_lo, tok_hi, n_tokens`` where
    ``[tok_lo, tok_hi)`` is the doc-relative token span landing in
    example ``example_id`` (every example except the last is exactly
    full; zero-token docs emit nothing). Downstream shard writers
    slice documents by these spans — the expansion never ships text.

    Distributed exactly with ONE shuffle of (key, n_tokens) pairs:
    range-partition by sampled key bounds, fold per-range token totals
    (≤ num_partitions rows on the driver), broadcast exclusive-prefix
    offsets back, then each range sorts locally and expands spans
    vectorized. The OUTPUT is independent of the partitioning (offsets
    make every prefix sum exact), so bounds sampling is purely a
    balance knob. SQL parity: ``SUM(n) OVER (ORDER BY key)`` +
    ``generate_series`` (see ``sql_pack_query``).

    ``key`` must be unique per document (the global order is BY key;
    duplicate keys would make the within-tie order, and therefore the
    packing, depend on block arrival order)."""
    import ray.data as rd  # noqa: F401  (ds is already a Dataset)

    L = int(seq_len)
    if L <= 0:
        raise ValueError("seq_len must be positive")

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        if n_col is not None:
            # precomputed counts (e.g. bpe_encode(counts_only=True)):
            # pack by a REAL tokenizer's budget instead of whitespace
            n = batch[n_col].fillna(0).astype("int64")
        else:
            n = batch[col].str.count(_TOKEN_RE).fillna(0).astype("int64")
        return pd.DataFrame({key: batch[key], "n_tokens": n})

    # (key, n) pairs only — tiny vs the corpus; materialized so the
    # totals pass and the expand pass don't re-tokenize the text
    cts = ds.map_batches(counts, batch_format="pandas").materialize()

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        v = df[key]
        if len(v) > sample_per_block:
            idx = np.linspace(0, len(v) - 1,
                              sample_per_block).astype(int)
            v = v.iloc[idx]
        return pd.DataFrame({key: v})

    samp = cts.map_batches(sample, batch_format="pandas").to_pandas()
    vals = np.sort(samp[key].to_numpy())
    qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
    bounds = np.unique(vals[(qs * (len(vals) - 1)).astype(int)]) \
        if len(vals) else np.array([])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_rb"] = np.searchsorted(
            bounds, df[key].to_numpy(), side="right").astype(np.int32) \
            if len(bounds) else np.int32(0)
        return df

    tagged = cts.map_batches(tag, batch_format="pandas")
    tot = tagged.map_batches(
        lambda df: df.groupby("_rb", as_index=False)["n_tokens"].sum(),
        batch_format="pandas").to_pandas()  # ≤ blocks × ranges rows
    per = np.zeros(len(bounds) + 1, dtype=np.int64)
    if len(tot):
        agg = tot.groupby("_rb")["n_tokens"].sum()
        per[agg.index.to_numpy()] = agg.to_numpy()
    offsets = np.concatenate([[0], np.cumsum(per)[:-1]])

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        rb = int(g["_rb"].iloc[0])
        order = np.argsort(g[key].to_numpy(), kind="stable")
        k = g[key].to_numpy()[order]
        n = g["n_tokens"].to_numpy()[order]
        ce = np.cumsum(n) + offsets[rb]
        cs = ce - n
        m = n > 0
        k, n, cs, ce = k[m], n[m], cs[m], ce[m]
        if not len(k):
            return pd.DataFrame({
                key: pd.Series(dtype=g[key].dtype),
                "example_id": pd.Series(dtype="int64"),
                "tok_lo": pd.Series(dtype="int64"),
                "tok_hi": pd.Series(dtype="int64"),
                "n_tokens": pd.Series(dtype="int64")})
        e0 = cs // L
        cnt = ((ce - 1) // L - e0 + 1).astype(np.int64)
        rep = np.repeat(np.arange(len(k)), cnt)
        ri = np.arange(int(cnt.sum())) \
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
        eid = e0[rep] + ri
        return pd.DataFrame({
            key: k[rep],
            "example_id": eid.astype("int64"),
            "tok_lo": np.maximum(0, eid * L - cs[rep]).astype("int64"),
            "tok_hi": np.minimum(n[rep],
                                 (eid + 1) * L - cs[rep]).astype("int64"),
            "n_tokens": n[rep].astype("int64")})

    return tagged.groupby("_rb").map_groups(expand, batch_format="pandas")


def pack_sequences_by(ds, seq_len: int, by: str, key: str = "doc_id",
                      col: str = "text", num_partitions: int = 32,
                      sample_per_block: int = 200):
    """Per-GROUP ``pack_sequences`` (the Dolma-style "pack each source
    separately" shape): every ``by`` group gets its own independent
    example-id stream, ordered by ``key`` within the group. Output
    adds the ``by`` column; ``example_id`` is dense per group.

    Same ONE-shuffle plan as ``pack_sequences`` — ranges partition by
    ``key``, a group's documents scatter across ranges, and the driver
    folds per-(range, group) token totals into per-group exclusive
    prefix offsets (driver bound: ranges × distinct groups tiny rows —
    fine for sources/languages; use the ungrouped packer + a group
    prefix key if groups number in the millions). SQL parity:
    ``SUM(n) OVER (PARTITION BY by ORDER BY key)``."""
    import ray.data as rd  # noqa: F401

    L = int(seq_len)
    if L <= 0:
        raise ValueError("seq_len must be positive")

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            by: batch[by],
            key: batch[key],
            "n_tokens": batch[col].str.count(_TOKEN_RE)
            .fillna(0).astype("int64")})

    cts = ds.map_batches(counts, batch_format="pandas").materialize()

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        v = df[key]
        if len(v) > sample_per_block:
            idx = np.linspace(0, len(v) - 1,
                              sample_per_block).astype(int)
            v = v.iloc[idx]
        return pd.DataFrame({key: v})

    samp = cts.map_batches(sample, batch_format="pandas").to_pandas()
    vals = np.sort(samp[key].to_numpy())
    qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
    bounds = np.unique(vals[(qs * (len(vals) - 1)).astype(int)]) \
        if len(vals) else np.array([])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_rb"] = np.searchsorted(
            bounds, df[key].to_numpy(), side="right").astype(np.int32) \
            if len(bounds) else np.int32(0)
        return df

    tagged = cts.map_batches(tag, batch_format="pandas")
    tot = tagged.map_batches(
        lambda df: df.groupby(["_rb", by], as_index=False)
        ["n_tokens"].sum(),
        batch_format="pandas").to_pandas()  # ≤ blocks × ranges × groups
    # per-(group) exclusive prefix over ranges
    offsets: dict = {}
    if len(tot):
        tot = tot.groupby(["_rb", by])["n_tokens"].sum().reset_index()
        for g, gdf in tot.groupby(by, sort=True):
            gdf = gdf.sort_values("_rb")
            run = 0
            for _, r in gdf.iterrows():
                offsets[(int(r["_rb"]), g)] = run
                run += int(r["n_tokens"])

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        rb = int(g["_rb"].iloc[0])
        gv = g[by].to_numpy()
        kv = g[key].to_numpy()
        order = np.lexsort((kv, gv))
        gv, kv = gv[order], kv[order]
        n = g["n_tokens"].to_numpy()[order]
        c = np.cumsum(n)
        # per-group cumsum within this range: subtract each group's
        # running total at its first row
        starts = np.flatnonzero(np.concatenate(
            [[True], gv[1:] != gv[:-1]]))
        sizes = np.diff(np.concatenate([starts, [len(gv)]]))
        base_at_start = c[starts] - n[starts]
        ce = c - np.repeat(base_at_start, sizes)
        off = np.fromiter(
            (offsets.get((rb, x), 0) for x in gv[starts]),
            dtype=np.int64, count=len(starts))
        ce = ce + np.repeat(off, sizes)
        cs = ce - n
        m = n > 0
        gv, kv, n, cs, ce = gv[m], kv[m], n[m], cs[m], ce[m]
        if not len(kv):
            return pd.DataFrame({
                by: pd.Series(dtype=g[by].dtype),
                key: pd.Series(dtype=g[key].dtype),
                "example_id": pd.Series(dtype="int64"),
                "tok_lo": pd.Series(dtype="int64"),
                "tok_hi": pd.Series(dtype="int64"),
                "n_tokens": pd.Series(dtype="int64")})
        e0 = cs // L
        cnt = ((ce - 1) // L - e0 + 1).astype(np.int64)
        rep = np.repeat(np.arange(len(kv)), cnt)
        ri = np.arange(int(cnt.sum())) \
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
        eid = e0[rep] + ri
        return pd.DataFrame({
            by: gv[rep],
            key: kv[rep],
            "example_id": eid.astype("int64"),
            "tok_lo": np.maximum(0, eid * L - cs[rep]).astype("int64"),
            "tok_hi": np.minimum(n[rep],
                                 (eid + 1) * L - cs[rep]).astype("int64"),
            "n_tokens": n[rep].astype("int64")})

    return tagged.groupby("_rb").map_groups(expand, batch_format="pandas")


def sql_pack_by_query(seq_len: int, by: str, key: str = "doc_id",
                      col: str = "text",
                      table: str = "documents") -> str:
    """DuckDB rendering of ``pack_sequences_by`` over ``table``."""
    return (
        f"WITH t AS (SELECT {by}, {key}, len(regexp_extract_all("
        f"coalesce({col}, ''), '\\S+'))::BIGINT AS n FROM {table}), "
        f"c AS (SELECT {by}, {key}, n, SUM(n) OVER ("
        f"PARTITION BY {by} ORDER BY {key}) AS ce FROM t), "
        f"s AS (SELECT {by}, {key}, n, (ce - n)::BIGINT AS cs, "
        "ce::BIGINT AS ce FROM c WHERE n > 0) "
        f"SELECT s.{by}, s.{key}, g.eid::BIGINT AS example_id, "
        f"GREATEST(0, g.eid*{seq_len} - s.cs)::BIGINT AS tok_lo, "
        f"LEAST(s.n, (g.eid+1)*{seq_len} - s.cs)::BIGINT AS tok_hi, "
        "s.n AS n_tokens "
        "FROM s, LATERAL (SELECT unnest(generate_series("
        f"s.cs // {seq_len}, (s.ce - 1) // {seq_len})) AS eid) g"
    )


def sql_pack_query(seq_len: int, key: str = "doc_id", col: str = "text",
                   table: str = "documents") -> str:
    """DuckDB rendering of ``pack_sequences`` over ``table``."""
    return (
        f"WITH t AS (SELECT {key}, len(regexp_extract_all("
        f"coalesce({col}, ''), '\\S+'))::BIGINT AS n FROM {table}), "
        f"c AS (SELECT {key}, n, SUM(n) OVER (ORDER BY {key}) AS ce "
        "FROM t), "
        f"s AS (SELECT {key}, n, (ce - n)::BIGINT AS cs, "
        "ce::BIGINT AS ce FROM c WHERE n > 0) "
        f"SELECT s.{key}, g.eid::BIGINT AS example_id, "
        f"GREATEST(0, g.eid*{seq_len} - s.cs)::BIGINT AS tok_lo, "
        f"LEAST(s.n, (g.eid+1)*{seq_len} - s.cs)::BIGINT AS tok_hi, "
        "s.n AS n_tokens "
        "FROM s, LATERAL (SELECT unnest(generate_series("
        f"s.cs // {seq_len}, (s.ce - 1) // {seq_len})) AS eid) g"
    )


def string_features(batch: pd.DataFrame, col: str = "text",
                    extra: dict | None = None) -> pd.DataFrame:
    """Scalar string-function pack over ``col`` — the engine-side
    equivalents of SQL length/substr/upper/reverse/strpos, character-
    (not byte-)based like SQL varchar semantics. Vectorized pandas str
    kernels; parity exprs in ``sql_string_exprs``. ``extra`` maps
    output-column → source-column for per-column upper/reverse."""
    s = batch[col].fillna("")
    batch["len_chars"] = s.str.len().astype("int64")
    batch["prefix16"] = s.str.slice(0, 16)
    # SQL strpos: 1-based, 0 when absent; str.find: 0-based, -1 absent
    batch["first_space"] = (s.str.find(" ") + 1).astype("int64")
    for out, src in (extra or {}).items():
        if out.endswith("_upper"):
            batch[out] = batch[src].fillna("").str.upper()
        elif out.endswith("_rev"):
            batch[out] = batch[src].fillna("").str.slice(step=-1)
        else:
            raise ValueError(f"unknown extra feature {out!r}")
    return batch


def sql_string_exprs(col: str = "text") -> dict[str, str]:
    return {
        "len_chars": f"length({col})",
        "prefix16": f"substr({col}, 1, 16)",
        "first_space": f"strpos({col}, ' ')",
    }


def nfc_normalize_col(batch: pd.DataFrame, col: str = "text",
                      out: str = "text_nfc") -> pd.DataFrame:
    """Unicode NFC normalization — the multilingual-webtext ingest step
    that canonicalizes combining sequences / compatibility variants so
    downstream dedup and token counting see one byte form per glyph.
    ``unicodedata.normalize`` is one C call per string (the work is
    inherently per-string; same dispatch shape as any pandas str
    kernel). Codepoint-identical to DuckDB ``nfc_normalize`` — pinned
    by pytest over combining marks / ligatures / width variants and by
    the ``nfc_normalize`` driver oracle."""
    import unicodedata

    batch[out] = batch[col].fillna("").map(
        lambda s: unicodedata.normalize("NFC", s))
    return batch


def regex_features(batch: pd.DataFrame, col: str = "text",
                   pattern: str = r"b[a-z]+", repl: str = "<B>",
                   prefix: str = "rx") -> pd.DataFrame:
    """Regex transform pack: first match, non-overlapping match count,
    and global replacement — vectorized pandas str kernels over an
    RE2-SAFE pattern (no backreferences/lookaround) so the DuckDB
    ``regexp_extract`` / ``regexp_extract_all`` / ``regexp_replace``
    oracle (``sql_regex_exprs``) is byte-identical. The pattern is
    wrapped in one group on BOTH sides, so patterns with their own
    groups keep identical numbering; no-match extract yields ''
    (DuckDB convention), not null."""
    s = batch[col].fillna("")
    batch[f"{prefix}_first"] = s.str.extract(
        f"({pattern})", expand=False).fillna("")
    batch[f"{prefix}_count"] = s.str.count(pattern).astype("int64")
    batch[f"{prefix}_sub"] = s.str.replace(pattern, repl, regex=True)
    return batch


def sql_regex_exprs(col: str = "text", pattern: str = r"b[a-z]+",
                    repl: str = "<B>", prefix: str = "rx") -> dict[str, str]:
    """DuckDB renderings of ``regex_features`` (same RE2 pattern)."""
    p = pattern.replace("'", "''")
    r = repl.replace("'", "''")
    return {
        f"{prefix}_first": f"regexp_extract({col}, '({p})', 1)",
        f"{prefix}_count": (f"CAST(len(regexp_extract_all({col}, '{p}')) "
                            "AS BIGINT)"),
        f"{prefix}_sub": f"regexp_replace({col}, '{p}', '{r}', 'g')",
    }


def char_entropy(batch: pd.DataFrame, col: str = "text",
                 id_col: str = "doc_id", out: str = "entropy",
                 ndigits: int = 6) -> pd.DataFrame:
    """Per-document Shannon entropy (bits) over CHARACTERS — the
    classic gibberish/low-diversity quality signal. Flattens the whole
    batch to one codepoint array (utf-32 decode per doc is the only
    per-row step, same shape as ``fingerprint_column``), then one
    vectorized (doc, char) groupby — no per-document Python in the
    counting or entropy math. Empty docs are DROPPED (the SQL unnest
    oracle produces no rows for them). Oracle: ``sql_entropy_query``."""
    texts = batch[col].fillna("").tolist()
    lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
    keep = lens > 0
    if not keep.all():
        batch = batch.loc[keep].reset_index(drop=True)
        texts = [t for t, k in zip(texts, keep) if k]
        lens = lens[keep]
    if not len(texts):
        out_df = batch[[id_col]].copy()
        out_df[out] = pd.Series(dtype="float64")
        return out_df
    codes = np.frombuffer("".join(texts).encode("utf-32-le"), np.uint32)
    doc = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    cnt = pd.DataFrame({"d": doc, "c": codes}) \
        .groupby(["d", "c"], sort=False).size()
    p = cnt / np.repeat(lens, cnt.groupby(level="d", sort=False).size())
    ent = (-(p * np.log2(p))).groupby(level="d", sort=False).sum()
    out_df = batch[[id_col]].copy()
    out_df[out] = np.round(ent.to_numpy(), ndigits)
    return out_df


def sql_entropy_query(table: str = "documents", col: str = "text",
                      id_col: str = "doc_id", out: str = "entropy",
                      ndigits: int = 6) -> str:
    return (
        f"SELECT {id_col}, round(-sum(p * log2(p)), {ndigits}) AS {out} "
        f"FROM (SELECT {id_col}, count(*)::DOUBLE / "
        f"sum(count(*)) OVER (PARTITION BY {id_col}) AS p "
        f"FROM (SELECT {id_col}, unnest(string_split({col}, '')) AS c "
        f"FROM {table} WHERE length({col}) > 0) GROUP BY {id_col}, c) "
        f"GROUP BY {id_col}")


# --- multinomial Naive Bayes (the fasttext-classifier analog) ----------------

def nb_fit(ds, col: str = "text", label_col: str = "lang",
           alpha: float = 1.0, num_partitions: int = 16) -> dict:
    """Fit a multinomial Naive Bayes text classifier distributed — the
    linear-classifier stage a training-data pipeline uses for language /
    quality / domain routing (the fasttext-filter analog, e.g. CCNet's
    LM filter), with closed-form training instead of SGD so the fit is
    ONE pass of decomposable count aggregates:

    - (label, token) occurrence counts via the ``grouped_agg`` combiner
      (shuffle carries one row per distinct pair per block);
    - per-label doc counts for the priors, same combiner.

    The returned model is O(vocab × classes) — the documented driver
    bound (a 10^7-token vocab × 10 classes is ~800 MB of float64; hash
    the vocab or prune rare tokens before that point). Tokenization is
    the literal single-space split (SQL ``string_split`` parity);
    Laplace smoothing ``alpha``; natural-log probabilities.

    Model dict: ``classes`` (sorted), ``priors`` (K,), ``vocab``
    (sorted token array), ``logp`` (V, K), ``unk`` (K,) — the unseen-
    token log-likelihood ln(alpha / (total_k + alpha·V)).
    """
    from chomper_ray.pipelines.relational import grouped_agg

    def tok_counts(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        ex = pl.DataFrame({
            "lab": pd.Series(df[label_col]).fillna("").astype(str).tolist(),
            "w": pd.Series(df[col]).fillna("").astype(str).tolist(),
        }).with_columns(pl.col("w").str.split(" ")).explode("w")
        g = ex.group_by(["lab", "w"]).len().to_pandas()
        return pd.DataFrame({"lab": g["lab"], "tok": g["w"],
                             "n": g["len"].astype("int64")})

    def doc_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(df[label_col].fillna("").astype(str)).size()
        return pd.DataFrame({"lab": g.index.to_numpy(),
                             "nd": g.to_numpy().astype("int64")})

    cnt = grouped_agg(ds.map_batches(tok_counts, batch_format="pandas"),
                      keys=["lab", "tok"], sums=["n"],
                      counts=False).to_pandas()
    pri = grouped_agg(ds.map_batches(doc_counts, batch_format="pandas"),
                      keys=["lab"], sums=["nd"], counts=False).to_pandas()

    classes = np.sort(pri["lab"].to_numpy())
    k = len(classes)
    vocab = np.sort(cnt["tok"].unique())
    v = len(vocab)
    tot_docs = float(pri["sum_nd"].sum())
    priors = np.log(pri.set_index("lab").loc[classes, "sum_nd"]
                    .to_numpy().astype(np.float64) / tot_docs)
    tok_idx = pd.Index(vocab).get_indexer(cnt["tok"])
    lab_idx = pd.Index(classes).get_indexer(cnt["lab"])
    counts = np.zeros((v, k), dtype=np.float64)
    counts[tok_idx, lab_idx] = cnt["sum_n"].to_numpy().astype(np.float64)
    totals = counts.sum(axis=0)
    logp = np.log((counts + alpha) / (totals + alpha * v)[None, :])
    unk = np.log(alpha / (totals + alpha * v))
    return {"classes": classes, "priors": priors, "vocab": vocab,
            "logp": logp, "unk": unk}


def nb_score(ds, model: dict, col: str = "text", id_col: str = "doc_id",
             pred_col: str = "nb_pred", score_col: str = "nb_score",
             ndigits: int = 6):
    """Score every document against a fitted ``nb_fit`` model: argmax
    class plus its rounded log-posterior. The model is broadcast ONCE
    via ``ray.put`` and read per task — never re-shipped per batch.
    Ties (practically impossible with real likelihoods) break to the
    lexicographically smallest class, matching SQL
    ``row_number() OVER (ORDER BY score DESC, class)``."""
    import ray

    ref = ray.put(model)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        m = ray.get(ref)
        classes, vocab = m["classes"], m["vocab"]
        k = len(classes)
        ex = pl.DataFrame({
            "w": pd.Series(df[col]).fillna("").astype(str).tolist(),
        }).with_row_index("r").with_columns(
            pl.col("w").str.split(" ")).explode("w")
        rows = ex["r"].to_numpy().astype(np.int64)
        idx = pd.Index(vocab).get_indexer(ex["w"].to_pandas())
        known = idx >= 0
        scores = np.tile(m["priors"], (len(df), 1))
        for j in range(k):
            lp = np.where(known, m["logp"][idx.clip(0), j], m["unk"][j])
            scores[:, j] += np.bincount(rows, weights=lp,
                                        minlength=len(df))
        best = np.argmax(scores, axis=1)
        out = df[[id_col]].copy()
        out[pred_col] = classes[best]
        out[score_col] = np.round(scores[np.arange(len(df)), best],
                                  ndigits)
        return out

    return ds.map_batches(score, batch_format="pandas")


# --- bigram language-model scoring (the CCNet perplexity-filter analog) ------

def lm_fit(ds, col: str = "text", alpha: float = 0.5) -> dict:
    """Fit an add-alpha bigram language model distributed — the
    perplexity-filter stage (CCNet trains KenLM on a clean corpus and
    filters web text by LM score; this is the closed-form n-gram
    equivalent, trainable in ONE pass of `grouped_agg` count combiners).

    P(w | prev) = (c(prev, w) + alpha) / (c(prev) + alpha·V), with V =
    distinct tokens in the corpus. The model is O(distinct bigrams) on
    the driver — the same documented bound as ``nb_fit``'s vocab
    (hash or prune before a 10^9-bigram corpus).
    """
    from chomper_ray.pipelines.relational import grouped_agg

    def bigram_counts(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        ex = pl.DataFrame({
            "w": pd.Series(df[col]).fillna("").astype(str).tolist(),
        }).with_row_index("r").with_columns(
            pl.col("w").str.split(" ")).explode("w")
        g = ex.with_columns(
            pl.col("w").shift(-1).over("r").alias("nxt")) \
            .drop_nulls("nxt") \
            .group_by(["w", "nxt"]).len().to_pandas()
        return pd.DataFrame({"a": g["w"], "b": g["nxt"],
                             "n": g["len"].astype("int64")})

    def token_rows(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        ex = pl.DataFrame({
            "w": pd.Series(df[col]).fillna("").astype(str).tolist(),
        }).with_columns(pl.col("w").str.split(" ")).explode("w")
        g = ex.group_by("w").len().to_pandas()
        return pd.DataFrame({"tok": g["w"]})

    from chomper_ray.pipelines.relational import distinct

    cnt = grouped_agg(ds.map_batches(bigram_counts, batch_format="pandas"),
                      keys=["a", "b"], sums=["n"], counts=False).to_pandas()
    vocab_n = distinct(
        ds.map_batches(token_rows, batch_format="pandas"),
        ["tok"], num_partitions=8).count()
    tot = cnt.groupby("a", sort=False)["sum_n"].sum()
    m = cnt.merge(tot.rename("t"), left_on="a", right_index=True)
    logp = np.log((m["sum_n"].to_numpy(np.float64) + alpha)
                  / (m["t"].to_numpy(np.float64) + alpha * vocab_n))
    return {"pairs": pd.DataFrame({"a": m["a"], "b": m["b"],
                                   "logp": logp}),
            "alpha": alpha, "vocab_n": int(vocab_n)}


def lm_score(ds, model: dict, col: str = "text", id_col: str = "doc_id",
             ndigits: int = 6):
    """Per-document bigram log-likelihood under a fitted ``lm_fit``
    model: ``lm_logprob`` (sum of transition log-probs, 0 for docs
    with < 2 tokens) and ``n_bigrams``. One ``ray.put`` broadcast;
    per batch one polars bigram explode + one two-column merge.
    Self-scored corpora never miss the model (train == score), so
    unseen-bigram handling stays out of the SQL-parity surface."""
    import ray

    ref = ray.put(model["pairs"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        pairs = ray.get(ref)
        ex = pl.DataFrame({
            "w": pd.Series(df[col]).fillna("").astype(str).tolist(),
        }).with_row_index("r").with_columns(
            pl.col("w").str.split(" ")).explode("w")
        big = ex.with_columns(
            pl.col("w").shift(-1).over("r").alias("nxt")) \
            .drop_nulls("nxt").to_pandas()
        big = big.merge(pairs, left_on=["w", "nxt"],
                        right_on=["a", "b"], how="left")
        agg = big.groupby("r")["logp"].agg(["sum", "count"])
        rows = np.zeros(len(df))
        cnts = np.zeros(len(df), dtype=np.int64)
        idx = agg.index.to_numpy().astype(int)
        rows[idx] = agg["sum"].to_numpy()
        cnts[idx] = agg["count"].to_numpy()
        return pd.DataFrame({
            id_col: df[id_col].astype("int64"),
            "lm_logprob": np.round(rows, ndigits),
            "n_bigrams": cnts,
        })

    return ds.map_batches(score, batch_format="pandas")

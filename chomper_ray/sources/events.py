"""Deterministic synthetic change stream (the binlog) + epoch reader.

The reference's continuous-tail source is a Redis queue popped one item
at a time (``/root/reference/chomper/contrib/redis.py:15-61``) with the
importer re-polling forever (``chomper/importers.py:54-62``). The lake-scale
equivalent is an **append-only log of epoch-addressed Parquet segments**:
producers append ``{log}/epoch=NNNNNN/part-K.parquet`` files; the engine
tails the log by committed-epoch cursor (see ``state/checkpoint.py``).

``generate_change_stream`` synthesizes that log deterministically (fixed
seed; no external data) with the knobs FIXTURES.md §B2 lists: keyspace
size, insert/update/delete mix, out-of-order ``warc_ts`` fraction, Zipf
hot-domain skew (for salting tests), and a schema-evolution epoch after
which segments carry an additive ``fetch_status`` (and it widens
int32→int64) plus a new nullable ``extra_score`` column.

Generation is vectorized (numpy) except the per-row HTML payload, which is
inherently per-string; at bench scale it runs once and is cached on disk.
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_EPOCH_FMT = "epoch=%06d"
_BASE_TS_US = 1_500_000_000_000_000  # 2017-07-14, arbitrary fixed origin

_DOMAINS_POOL = [
    "example.com", "news.site", "blog.example.org", "shop.example.net",
    "wiki.sample.org", "forum.sample.net", "docs.sample.io", "app.demo.co",
    "media.demo.tv", "data.open.org",
]
_LANGS = np.array(["en", "de", "fr", "es", "it", "pt", "nl", "ru"])


def _make_html(url: str, seq: int, rng_word: int, scale: int = 1) -> bytes:
    """Deterministic fake web page for (url, seq): title + paragraphs +
    script/style noise so extraction has something to strip. ``scale``
    multiplies the paragraph count (bench uses larger pages)."""
    h = (rng_word * 2654435761 + seq * 40503) & 0xFFFFFFFF
    n_paras = (1 + (h % 4)) * scale
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "consectetur",
             "adipiscing", "elit", "sed", "do", "eiusmod", "tempor",
             "incididunt", "labore", "dolore", "magna"]
    paras = []
    for p in range(n_paras):
        k = (h >> (p * 3)) & 0xFF
        body = " ".join(words[(k + i * 7) % len(words)] for i in range(8 + k % 24))
        paras.append(f"<p>{body} &amp; more #{k}</p>")
    return (
        f"<html><head><title>Page {seq} at {url}</title>"
        f"<style>body {{color: #000}}</style>"
        f"<script>var x = {h};</script></head>"
        f"<body><h1>Entry {seq}</h1>{''.join(paras)}"
        f"<!-- crawl {seq} --></body></html>"
    ).encode()


def generate_change_stream(
    out_dir: str | Path,
    n_events: int = 10_000,
    n_urls: int = 2_000,
    n_epochs: int = 4,
    seed: int = 42,
    delete_frac: float = 0.05,
    ooo_frac: float = 0.1,
    zipf_a: float = 1.3,
    evolution_epoch: int | None = None,
    rows_per_file: int = 50_000,
    html_scale: int = 1,
    force: bool = False,
    with_expected_text: bool = False,
) -> Path:
    """Write the deterministic change log under ``out_dir``. Idempotent:
    if ``out_dir/_COMPLETE`` exists with matching params, returns at once
    (so bench runs at two parallelism levels share identical input).

    ``with_expected_text`` additionally writes an ``_oracle/`` sidecar of
    ``(seq, text)`` rows — each event's html run through the SAME public
    extractor at synthesis time. The engine never reads the sidecar
    (``epoch_files`` globs only ``epoch=*/part-*.parquet``); a SQL oracle
    joins it by ``seq`` to hash-verify that the pipeline's extracted
    bytes survive LWW merge, schema evolution and partition routing
    end-to-end. (Extraction-algorithm correctness itself is covered by
    the byte-identical pytest oracle, not this sidecar.)"""
    out = Path(out_dir)
    stamp = (f"{n_events},{n_urls},{n_epochs},{seed},{delete_frac},"
             f"{ooo_frac},{zipf_a},{evolution_epoch},{html_scale},"
             f"{rows_per_file},{with_expected_text}")
    done = out / "_COMPLETE"
    if done.exists() and not force and done.read_text() == stamp:
        return out
    out.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(seed)
    # Zipf-skewed url choice → hot keys / hot domains.
    ranks = rng.zipf(zipf_a, size=n_events)
    url_idx = (ranks - 1) % n_urls
    domains = np.array(_DOMAINS_POOL)[url_idx % len(_DOMAINS_POOL)]
    urls = np.char.add(
        np.char.add("https://", domains.astype(str)),
        np.array([f"/page/{i}" for i in url_idx]),
    )

    seq = np.arange(n_events, dtype=np.int64)
    # warc_ts mostly increases with seq; an out-of-order fraction jumps back.
    ts = _BASE_TS_US + seq * 1_000_000 + rng.integers(0, 500_000, n_events)
    ooo = rng.random(n_events) < ooo_frac
    ts[ooo] -= rng.integers(1, 3600, ooo.sum()) * 1_000_000

    is_del = rng.random(n_events) < delete_frac
    seen: set[int] = set()
    ops = np.empty(n_events, dtype=object)
    for i in range(n_events):  # first touch of a key = insert (tiny, gen-only)
        k = int(url_idx[i])
        if is_del[i] and k in seen:
            ops[i] = "delete"
        elif k in seen:
            ops[i] = "update"
        else:
            ops[i] = "insert"
            seen.add(k)

    langs = _LANGS[url_idx % len(_LANGS)]
    epoch = (seq * n_epochs) // n_events
    word_seed = int(rng.integers(1, 2**31))
    status_pool = np.array([200, 200, 200, 200, 301, 404, 500])
    fetch_status = status_pool[rng.integers(0, len(status_pool), n_events)]
    extra_score = np.round(rng.random(n_events), 6)

    for e in range(n_epochs):
        sel = np.nonzero(epoch == e)[0]
        edir = out / (_EPOCH_FMT % e)
        edir.mkdir(parents=True, exist_ok=True)
        evolved = evolution_epoch is not None and e >= evolution_epoch
        for fi, lo in enumerate(range(0, len(sel), rows_per_file)):
            idx = sel[lo:lo + rows_per_file]
            html = [
                None if ops[i] == "delete"
                else _make_html(urls[i], int(i), word_seed, html_scale)
                for i in idx
            ]
            cols = {
                "op": pa.array([ops[i] for i in idx], type=pa.string()),
                "epoch": pa.array(epoch[idx], type=pa.int64()),
                "seq": pa.array(seq[idx], type=pa.int64()),
                "url": pa.array([urls[i] for i in idx], type=pa.string()),
                "warc_ts": pa.array(ts[idx], type=pa.timestamp("us")),
                "html": pa.array(html, type=pa.binary()),
                "lang": pa.array([langs[i] for i in idx], type=pa.string()),
                "fetch_status": pa.array(
                    fetch_status[idx],
                    type=pa.int64() if evolved else pa.int32(),
                ),
            }
            if evolved:
                cols["extra_score"] = pa.array(extra_score[idx], type=pa.float64())
            # attempt-isolated tmp: two processes may both miss the
            # _COMPLETE stamp and generate concurrently (identical
            # deterministic bytes); a shared tmp path lets the loser's
            # os.replace hit FileNotFoundError after the winner's rename
            tmp = edir / f".part-{fi:04d}.{uuid.uuid4().hex[:8]}.parquet.tmp"
            pq.write_table(pa.table(cols), tmp)
            os.replace(tmp, edir / f"part-{fi:04d}.parquet")
            if with_expected_text:
                from chomper_ray.functions.extract import extract_text_column

                odir = out / "_oracle"
                odir.mkdir(parents=True, exist_ok=True)
                otmp = (odir / f".e{e:06d}-part-{fi:04d}"
                        f".{uuid.uuid4().hex[:8]}.parquet.tmp")
                pq.write_table(pa.table({
                    "seq": pa.array(seq[idx], type=pa.int64()),
                    "text": pa.array(extract_text_column(html),
                                     type=pa.string()),
                }), otmp)
                os.replace(otmp, odir / f"e{e:06d}-part-{fi:04d}.parquet")

    tmp = out / f"._COMPLETE.{uuid.uuid4().hex[:8]}.tmp"
    tmp.write_text(stamp)
    os.replace(tmp, done)
    return out


def generate_multi_stream(
    out_dir: str | Path,
    n_events: int = 8_000,
    n_urls: int = 1_000,
    n_links: int = 1_500,
    n_epochs: int = 3,
    seed: int = 42,
    delete_frac: float = 0.05,
    ooo_frac: float = 0.1,
    pages_frac: float = 0.6,
    rows_per_file: int = 50_000,
    force: bool = False,
) -> Path:
    """Deterministic MULTI-TABLE change log: one binlog stream carrying
    interleaved events for two tables — ``pages`` (keyed ``url``) and
    ``links`` (keyed ``link_id``) — the shape a database WAL or a
    single CDC bus topic-set has. Segments hold the UNION schema with a
    ``tbl`` discriminator column and nulls for the other table's
    columns; a ``_tables.json`` catalog at the log root records each
    table's key and payload columns (what a schema registry would).

    No binary payloads here — the routing/exactly-once machinery is the
    point, and SQL-expressible payloads let the oracle replay both
    tables end to end.
    """
    import json

    out = Path(out_dir)
    stamp = (f"multi,{n_events},{n_urls},{n_links},{n_epochs},{seed},"
             f"{delete_frac},{ooo_frac},{pages_frac},{rows_per_file}")
    done = out / "_COMPLETE"
    if done.exists() and not force and done.read_text() == stamp:
        return out
    out.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(seed)
    seq = np.arange(n_events, dtype=np.int64)
    is_pages = rng.random(n_events) < pages_frac
    tbl = np.where(is_pages, "pages", "links")
    ts = _BASE_TS_US + seq * 1_000_000 + rng.integers(0, 500_000, n_events)
    ooo = rng.random(n_events) < ooo_frac
    ts[ooo] -= rng.integers(1, 3600, ooo.sum()) * 1_000_000
    epoch = (seq * n_epochs) // n_events

    # per-table key choice + first-touch insert semantics
    url_idx = rng.integers(0, n_urls, n_events)
    link_idx = rng.integers(0, n_links, n_events)
    is_del = rng.random(n_events) < delete_frac
    seen: dict[tuple[str, int], bool] = {}
    ops = np.empty(n_events, dtype=object)
    for i in range(n_events):  # tiny, generation-only
        k = ("p", int(url_idx[i])) if is_pages[i] else \
            ("l", int(link_idx[i]))
        if is_del[i] and k in seen:
            ops[i] = "delete"
        elif k in seen:
            ops[i] = "update"
        else:
            ops[i] = "insert"
            seen[k] = True

    domains = np.array(_DOMAINS_POOL)[url_idx % len(_DOMAINS_POOL)]
    urls = np.char.add(
        np.char.add("https://", domains.astype(str)),
        np.array([f"/page/{i}" for i in url_idx]))
    titles = np.array([f"Title {i} rev {s % 7}"
                       for i, s in zip(url_idx, seq)])
    langs = _LANGS[url_idx % len(_LANGS)]
    status_pool = np.array([200, 200, 200, 301, 404])
    fetch_status = status_pool[rng.integers(0, len(status_pool), n_events)]
    src_urls = np.char.add("https://", np.array(
        [f"{_DOMAINS_POOL[i % len(_DOMAINS_POOL)]}/page/{i % n_urls}"
         for i in link_idx]))
    dst_urls = np.char.add("https://", np.array(
        [f"{_DOMAINS_POOL[(i * 7 + 3) % len(_DOMAINS_POOL)]}"
         f"/page/{(i * 13 + 5) % n_urls}" for i in link_idx]))
    rels = np.array(["follow", "nofollow", "canonical"])[link_idx % 3]

    def col(vals, mask, typ):
        return pa.array([v if m else None for v, m in zip(vals, mask)],
                        type=typ)

    for e in range(n_epochs):
        sel = np.nonzero(epoch == e)[0]
        edir = out / (_EPOCH_FMT % e)
        edir.mkdir(parents=True, exist_ok=True)
        for fi, lo in enumerate(range(0, len(sel), rows_per_file)):
            idx = sel[lo:lo + rows_per_file]
            pm = is_pages[idx]
            lm = ~pm
            t = pa.table({
                "op": pa.array([ops[i] for i in idx], type=pa.string()),
                "epoch": pa.array(epoch[idx], type=pa.int64()),
                "seq": pa.array(seq[idx], type=pa.int64()),
                "tbl": pa.array([tbl[i] for i in idx], type=pa.string()),
                "warc_ts": pa.array(ts[idx], type=pa.timestamp("us")),
                "url": col(urls[idx], pm, pa.string()),
                "title": col(titles[idx], pm, pa.string()),
                "lang": col(langs[idx], pm, pa.string()),
                "fetch_status": col(fetch_status[idx], pm, pa.int64()),
                "link_id": col(link_idx[idx], lm, pa.int64()),
                "src_url": col(src_urls[idx], lm, pa.string()),
                "dst_url": col(dst_urls[idx], lm, pa.string()),
                "rel": col(rels[idx], lm, pa.string()),
            })
            tmp = edir / f".part-{fi:04d}.{uuid.uuid4().hex[:8]}.parquet.tmp"
            pq.write_table(t, tmp)
            os.replace(tmp, edir / f"part-{fi:04d}.parquet")

    catalog = {
        "pages": {"key": "url",
                  "columns": ["url", "warc_ts", "title", "lang",
                              "fetch_status"]},
        "links": {"key": "link_id",
                  "columns": ["link_id", "warc_ts", "src_url", "dst_url",
                              "rel"]},
    }
    tmp = out / f"._tables.{uuid.uuid4().hex[:8]}.tmp"
    tmp.write_text(json.dumps(catalog))
    os.replace(tmp, out / "_tables.json")
    tmp = out / f"._COMPLETE.{uuid.uuid4().hex[:8]}.tmp"
    tmp.write_text(stamp)
    os.replace(tmp, done)
    return out


def list_epochs(log_dir: str | Path) -> list[int]:
    out = []
    for p in Path(log_dir).iterdir():
        if p.is_dir() and p.name.startswith("epoch="):
            out.append(int(p.name.split("=")[1]))
    return sorted(out)


def epoch_files(log_dir: str | Path, epoch: int) -> list[str]:
    edir = Path(log_dir) / (_EPOCH_FMT % epoch)
    return sorted(str(p) for p in edir.glob("part-*.parquet"))


def epoch_schema(log_dir: str | Path, epoch: int) -> pa.Schema:
    files = epoch_files(log_dir, epoch)
    if not files:
        raise FileNotFoundError(f"no segment files for epoch {epoch} in {log_dir}")
    return pq.read_schema(files[0])


def read_epoch(log_dir: str | Path, epoch: int, columns=None):
    """One epoch's segment files as a streaming ``ray.data.Dataset``.

    Column pruning happens at the read (``columns=``) so e.g. a metrics
    query never loads ``html`` bytes off storage.
    """
    import ray.data as rd

    # partitioning=None: the epoch=NNNNNN layout is addressed explicitly;
    # hive inference would shadow the envelope's own `epoch` column
    return rd.read_parquet(epoch_files(log_dir, epoch), columns=columns,
                           partitioning=None)

"""File-format sources with the reference feeders' exact semantics.

Reference: ``/root/reference/chomper/feeders.py`` and ``readers.py``.
Ray Data's ``read_csv`` / ``read_json`` provide the transport and
parallelism; these wrappers pin down the reference's parsing contract:

- ``read_csv_strict`` (CsvFeeder, feeders.py:63-88): caller-supplied
  column names, ``skip`` leading rows, **no type inference** (every value
  stays a string — tests/test_feeders.py:38), blank lines ignored
  (readers.py:63-67), and rows whose arity mismatches the column list are
  DROPPED and counted, not errored (``ItemNotImportable`` → skip,
  feeders.py:82-88).
- ``read_jsonl`` (JsonLinesFeeder, feeders.py:118-134): one JSON object
  per line, blank lines ignored, malformed lines dropped + counted.
- ``read_json_docs`` (JsonFeeder, feeders.py:91-115): whole-document
  JSON — a single object or an array of objects.
- ``from_records`` (ListFeeder, feeders.py:47-60): in-memory rows.

Drop counts surface through ``ray.data``'s aggregate of the per-batch
``_dropped`` counters (returned alongside the Dataset).
"""

from __future__ import annotations

import csv as _csv
import io
import json

import pyarrow as pa


def _settled_count(ray, counter) -> int:
    """Counter adds are fire-and-forget from workers — settle until two
    consecutive reads agree (bounded)."""
    import time as _time

    prev = None
    for _ in range(50):
        cur = ray.get(counter.get.remote())
        if cur == prev:
            return cur
        prev = cur
        _time.sleep(0.05)
    return prev


def from_records(rows: list[dict]):
    """ListFeeder: in-memory list of dicts → Dataset."""
    import ray.data as rd

    return rd.from_items(rows)


def read_csv_strict(paths, columns: list[str], *, skip: int = 0,
                    delimiter: str = ",", quotechar: str = '"'):
    """CsvFeeder semantics over ``read_text`` lines.

    Returns ``(dataset, drop_counter_fn)`` — the dataset has every column
    as string type; call the counter fn AFTER consuming the dataset to
    get the number of arity-dropped rows (Ray actor-held counter).
    """
    import ray
    import ray.data as rd

    @ray.remote
    class DropCounter:
        def __init__(self):
            self.n = 0

        def add(self, k: int):
            self.n += k

        def get(self) -> int:
            return self.n

    counter = DropCounter.remote()
    ncol = len(columns)

    # one parse unit per FILE so the `skip` header rows are skipped per
    # file (the reference reads one URI; per-file skip is the multi-file
    # generalization). Huge single CSVs should use ray.data.read_csv —
    # this wrapper exists for the reference's exact parsing contract.
    ds = rd.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        out: list[list[str]] = [[] for _ in range(ncol)]
        dropped = 0
        for payload in batch["bytes"].to_pylist():
            text = bytes(payload).decode("utf-8")
            rows = _csv.reader(io.StringIO(text), delimiter=delimiter,
                               quotechar=quotechar)
            seen = 0
            for row in rows:
                if not row:
                    continue  # blank lines ignored (readers.py:63-67)
                seen += 1
                if seen <= skip:
                    continue  # header rows (feeders.py:75-77)
                if len(row) != ncol:
                    dropped += 1  # strict arity: drop + count, don't error
                    continue
                for i, v in enumerate(row):
                    out[i].append(v)
        if dropped:
            counter.add.remote(dropped)
        return pa.table({c: pa.array(vals, type=pa.string())
                         for c, vals in zip(columns, out)})

    parsed_ds = ds.map_batches(parse, batch_format="pyarrow")

    def dropped_count() -> int:
        return _settled_count(ray, counter)

    return parsed_ds, dropped_count


def read_jsonl(paths):
    """JsonLinesFeeder: one JSON object per line; malformed/blank lines
    dropped + counted. Returns ``(dataset, drop_counter_fn)``."""
    import ray
    import ray.data as rd

    @ray.remote
    class DropCounter:
        def __init__(self):
            self.n = 0

        def add(self, k: int):
            self.n += k

        def get(self) -> int:
            return self.n

    counter = DropCounter.remote()
    ds = rd.read_text(paths)

    def parse(batch: pa.Table) -> list[dict]:
        rows, dropped = [], 0
        for line in batch["text"].to_pylist():
            line = line.strip()
            if not line:
                continue
            try:
                obj = json.loads(line)
                if not isinstance(obj, dict):
                    raise ValueError("not an object")
                rows.append(obj)
            except ValueError:
                dropped += 1  # bad line → dropped, pipeline continues
        if dropped:
            counter.add.remote(dropped)
        import pandas as pd

        return pd.DataFrame(rows) if rows else pd.DataFrame()

    parsed = ds.map_batches(parse, batch_format="pyarrow")

    def dropped_count() -> int:
        return _settled_count(ray, counter)

    return parsed, dropped_count


def read_json_docs(paths):
    """JsonFeeder: whole-document JSON (object or array of objects).

    Whole-doc parse can't stream line-wise — each file becomes one batch
    (reference loads the full file too, readers.py:68-69)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def parse(batch) -> "pd.DataFrame":
        import pandas as pd

        rows = []
        for payload in batch["bytes"]:
            doc = json.loads(bytes(payload))
            if isinstance(doc, list):
                rows.extend(doc)
            else:
                rows.append(doc)
        return pd.DataFrame(rows)

    return ds.map_batches(parse, batch_format="pandas")

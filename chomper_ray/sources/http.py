"""HTTP source with the reference ``HttpReader`` contract.

Reference (`/root/reference/chomper/readers.py:72-99`, tested with mocked
responses at tests/test_readers.py:60-79): GET the URI; ``lines=True``
yields stripped non-blank lines, ``lines=False`` yields the whole body;
a non-2xx response raises ``ItemNotImportable``, which the importer turns
into drop-and-continue (importers.py:101-105).

Here each URL is fetched inside a Ray read task (stdlib ``urllib`` — no
third-party HTTP dependency), and a failed/non-2xx URL is dropped and
counted instead of failing the pipeline. Output schema is
``(url: string, text: string)`` — one row per line or per document.
"""

from __future__ import annotations

import urllib.error
import urllib.request

import pandas as pd


def _drop_counter():
    import ray

    @ray.remote
    class DropCounter:
        def __init__(self):
            self.n = 0

        def add(self, k: int):
            self.n += k

        def get(self) -> int:
            return self.n

    return DropCounter.remote()


def read_http(urls: list[str], *, lines: bool = True, method: str = "GET",
              timeout_s: float = 30.0, encoding: str = "utf-8",
              headers: dict | None = None):
    """HttpReader parity over a list of URLs.

    Returns ``(dataset, dropped_count_fn)``: the dataset holds
    ``(url, text)`` rows; call the counter fn after consuming to get the
    number of URLs dropped for non-2xx/connection errors."""
    import ray
    import ray.data as rd

    from chomper_ray.sources.feeders import _settled_count

    counter = _drop_counter()
    ds = rd.from_items([{"url": u} for u in urls])

    def fetch(batch: pd.DataFrame) -> pd.DataFrame:
        rows, dropped = [], 0
        for u in batch["url"]:
            try:
                req = urllib.request.Request(u, method=method.upper(),
                                             headers=headers or {})
                with urllib.request.urlopen(req, timeout=timeout_s) as r:
                    status = getattr(r, "status", 200)
                    if not (200 <= status < 300):
                        dropped += 1
                        continue
                    body = r.read().decode(encoding)
            except (urllib.error.URLError, urllib.error.HTTPError,
                    TimeoutError, OSError):
                # non-2xx (HTTPError) and transport failures: the
                # reference's ItemNotImportable → drop + continue
                dropped += 1
                continue
            if lines:
                rows.extend({"url": u, "text": ln.strip()}
                            for ln in body.splitlines() if ln.strip())
            else:
                rows.append({"url": u, "text": body})
        if dropped:
            counter.add.remote(dropped)
        if not rows:
            return pd.DataFrame({"url": pd.Series(dtype="string"),
                                 "text": pd.Series(dtype="string")})
        return pd.DataFrame(rows)

    fetched = ds.map_batches(fetch, batch_format="pandas")

    def dropped_count() -> int:
        return _settled_count(ray, counter)

    return fetched, dropped_count

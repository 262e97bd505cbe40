"""Declarative pipeline: the reference ``Importer`` re-imagined.

The reference drives a list of actions one item at a time with
processed/dropped counters (``/root/reference/chomper/importers.py:25-116``).
Here a ``Pipeline`` is a declarative spec — source, transform chain, and an
optional sink — compiled onto ONE ``ray.data.Dataset`` plan:

- list-of-transforms → a single fused ``map_batches`` stage (``Chain``)
- a plain callable step → its own ``map_batches`` stage (UDF escape
  hatch, reference README.md:239-268); a callable CLASS becomes an actor
  pool (``concurrency`` required via ``step()``)
- counters: items_processed / items_dropped computed from per-batch row
  deltas aggregated through a Ray actor (the reference's driver-local
  counters, importers.py:44-45, don't survive distribution)
- the reference's "branch pipeline" intent (fan-out; its own
  implementation is dead code, importers.py:83-85 vs SURVEY §3.1) is the
  ``fork()`` method: several consumers of one Dataset.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa

from chomper_ray.stages.transforms import Chain, Transform


@dataclass
class _Step:
    fn: Any
    kwargs: dict = field(default_factory=dict)


class Pipeline:
    """``Pipeline(source).then(...).sink(...)``; ``run()`` executes.

    ``source``: a Dataset, or a zero-arg callable returning one.
    """

    def __init__(self, source):
        self.source = source
        self.steps: list[_Step] = []
        self._sink: Callable | None = None

    # -- builder ----------------------------------------------------------
    def then(self, *transforms: Transform) -> "Pipeline":
        """Append transforms; consecutive ``then`` calls fuse into one
        map_batches stage at build time."""
        self.steps.append(_Step(Chain(*transforms)))
        return self

    def step(self, fn, **map_batches_kwargs) -> "Pipeline":
        """Append a raw batch UDF (function → tasks; class → actor pool,
        pass ``concurrency=``)."""
        self.steps.append(_Step(fn, map_batches_kwargs))
        return self

    def sink(self, fn: Callable) -> "Pipeline":
        """Terminal consumer, e.g. ``lambda ds: ds.write_parquet(path)``
        or ``lambda ds: lake.commit_epoch(ds, epoch)``."""
        self._sink = fn
        return self

    # -- execution --------------------------------------------------------
    def build(self, count_rows: bool = False):
        """Compile to a Dataset (lazy). With ``count_rows``, wires the
        processed/dropped counter actor around every stage."""
        import ray

        ds = self.source() if callable(self.source) else self.source
        counter = None
        if count_rows:
            @ray.remote
            class Counter:
                def __init__(self):
                    self.seen = 0
                    self.out = 0

                def add(self, seen: int, out: int):
                    self.seen += seen
                    self.out += out

                def get(self):
                    return {"items_processed": self.out,
                            "items_dropped": self.seen - self.out}

            counter = Counter.remote()

        fused: list[Chain] = []

        def flush():
            nonlocal ds, fused
            if fused:
                chain = Chain(*[t for c in fused for t in c.transforms])
                ds = ds.map_batches(
                    _counted(chain, counter), batch_format="pyarrow")
                fused = []

        for s in self.steps:
            if isinstance(s.fn, Chain) and not s.kwargs:
                fused.append(s.fn)
                continue
            flush()
            kw = dict(s.kwargs)
            kw.setdefault("batch_format", "pyarrow")
            ds = ds.map_batches(_counted(s.fn, counter), **kw)
        flush()
        self._counter = counter
        return ds

    def run(self, count_rows: bool = True):
        """Execute; returns ``(result, counters)``. Without a sink the
        result is the materialized-consumable Dataset itself."""
        import ray

        ds = self.build(count_rows=count_rows)
        if self._sink is not None:
            result = self._sink(ds)
        else:
            result = ds
            if count_rows:
                ds.count()  # consume so counters populate
        counters = None
        if self._counter:
            # counter adds are fire-and-forget from workers; settle until
            # two consecutive reads agree (bounded)
            import time as _time

            prev = None
            for _ in range(50):
                counters = ray.get(self._counter.get.remote())
                if counters == prev:
                    break
                prev = counters
                _time.sleep(0.05)
        return result, counters

    def fork(self, *consumers: Callable) -> list:
        """Fan-out: several consumers of the built Dataset (the intent of
        the reference's branch pipelines). The dataset is built once; Ray
        re-executes or reuses blocks per consumer."""
        ds = self.build()
        return [c(ds) for c in consumers]


def _counted(fn, counter):
    if counter is None:
        return fn

    def wrapped(batch: pa.Table):
        n_in = batch.num_rows
        out = fn(batch)
        counter.add.remote(n_in, out.num_rows)
        return out

    return wrapped

"""chomper_ray — a Ray-Data-native CDC / incremental-ingest engine.

A brand-new engine with the query and data-processing capabilities of the
reference (``anilktechie/chomper``), re-expressed Ray-Data-first:

- change-event Parquet segments (binlog) → ``ray.data.read_parquet``
- per-record transforms (Defaulter/Assigner/Dropper/Filter/Mapper/Picker/
  Omitter, reference ``chomper/processors.py``) → vectorized Arrow kernels
  composed into one ``map_batches`` stage
- keyed upsert (reference ``chomper/contrib/postgres.py:295-444``,
  ``chomper/contrib/sql/exporters.py:202-322``) → hash-partitioned
  last-writer-wins merge with ``(warc_ts, seq)`` as the version, copy-on-write
  Parquet partitions, and an exactly-once per-partition commit manifest
- continuous tail (reference ``chomper/contrib/redis.py``,
  ``chomper/importers.py:54-62``) → epoch-addressed segment reader driven by a
  checkpointed offset cursor

Plus large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) that the 100 TB use case needs.

Nothing in this package calls ``ray.init()`` — sessions are owned by the
caller (driver, bench.py, or the test fixture).
"""

__version__ = "0.2.0"


def _pin_fsspec_http_stub():
    """Make ``fsspec.implementations.http`` imports deterministic.

    Ray Data probes ``from fsspec.implementations.http import
    HTTPFileSystem`` on EVERY path resolution
    (``ray/data/datasource/path_util.py:_is_http_filesystem``), catching
    only ``ModuleNotFoundError``. In containers without ``aiohttp`` that
    import fails every time — and Python does not cache failed imports, so
    two concurrently-executing datasets (e.g. concurrent tail runners in
    one process) can race the repeated import/cleanup cycle: one thread
    observes the half-initialized module and gets a plain ``ImportError``
    ("cannot import name 'HTTPFileSystem'"), which escapes Ray's guard and
    kills the read. Pin a stub module into ``sys.modules`` once, under a
    single thread at package import, so every later lookup is a race-free
    dict hit. The stub's ``HTTPFileSystem`` matches no real filesystem, so
    ``_is_http_filesystem`` correctly returns False; nothing else can use
    fsspec-over-http here anyway (no aiohttp, no network).
    """
    import sys
    try:
        import fsspec.implementations.http  # noqa: F401
        return  # real module available: nothing to pin
    except ImportError:
        pass
    import types
    try:
        import fsspec.implementations as _fsspec_impl
    except ImportError:  # pragma: no cover - fsspec itself absent
        return

    stub = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # pragma: no cover - never instantiated
        def __init__(self, *a, **k):
            raise ImportError(
                "fsspec HTTP filesystem unavailable: aiohttp is not "
                "installed in this environment")

    stub.HTTPFileSystem = HTTPFileSystem
    stub.__doc__ = "chomper_ray stub (aiohttp absent; see _pin_fsspec_http_stub)"
    sys.modules.setdefault("fsspec.implementations.http", stub)
    if not hasattr(_fsspec_impl, "http"):
        _fsspec_impl.http = sys.modules["fsspec.implementations.http"]


_pin_fsspec_http_stub()


def _filter_benign_empty_schema_warnings():
    """Drop ONLY the known-benign Ray Data schema-divergence warning.

    Ray's streaming executor warns whenever an operator's output bundle
    schema differs from the previous bundle's. Its check is asymmetric
    (``streaming_executor_state.dedupe_schemas_with_validation``): an
    EMPTY *old* schema is skipped via ``_is_empty_schema``, but an empty
    *new* one — the schema-less zero-row bundle Ray itself builds for an
    empty post-shuffle partition, since UDFs are never invoked on empty
    blocks (``grouped_data._apply_udf_to_groups`` yields nothing, and
    ``map_batches`` skips empty blocks too) — still fires the warning.
    A zero-column bundle cannot flip any dtype, so these are pure noise;
    every sort/groupby over a bucket column whose distinct values don't
    densely cover the sampled range boundaries emits them.

    This filter removes exactly that case: "new schema" is empty (arrow
    prints as nothing, pandas as ``names=[], types=[]``). REAL
    divergence — non-empty vs non-empty, the dtype-flip hazard — still
    warns. Verified against Ray 2.49.2 message format.
    """
    import logging
    import re

    benign = re.compile(
        r"new schema: (PandasBlockSchema\(names=\[\], types=\[\]\))?\."
        r" This may lead")

    class _BenignEmptySchema(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not (
                "Operator produced a RefBundle with a different schema"
                in msg and benign.search(msg))

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_BenignEmptySchema())


_filter_benign_empty_schema_warnings()

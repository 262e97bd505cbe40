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

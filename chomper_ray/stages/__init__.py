"""Batch-transform stages: callables designed for ``Dataset.map_batches``
(zero-copy Arrow in / Arrow out) and grouped stages for ``groupby``."""

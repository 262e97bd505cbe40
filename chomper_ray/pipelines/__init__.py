"""Declarative pipelines: the CDC binlog-tail → lake-upsert loop and the
generic transform pipeline (the reference's ``Importer`` re-imagined)."""

"""Sources: deterministic synthetic change-stream generator + epoch-addressed
segment reader (the binlog), and thin wrappers over ``ray.data.read_*``."""

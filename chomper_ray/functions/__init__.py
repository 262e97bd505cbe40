"""Pure, per-value / per-batch functions: expression compiler, HTML→text
extraction, hashing. No Ray dependency — usable from oracle row-at-a-time
code and from ``map_batches`` bodies alike."""

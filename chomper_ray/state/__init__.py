"""Engine state: schema registry, commit manifest, checkpoint/lineage.

All state here is either (a) small driver-side metadata committed
atomically to the lake directory, or (b) held by actor-pool stages — never
process-global singletons (the reference's config/connection singletons,
``/root/reference/chomper/config.py:31-33``, don't survive a cluster).
"""

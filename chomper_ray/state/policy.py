"""Automatic maintenance cadence for tail-mode ingest (opt-in).

``tail_cdc`` / ``run-cdc`` apply commits forever; without maintenance,
two costs grow without bound and the operator had to schedule the
levers by hand (round-4 verdict, next-round item 5):

- **MOR delta chains**: a merge-on-read partition read opens
  ``1 + chain(p)`` files — read amplification measured linear in depth
  (scripts/stress_mor_chain.py; post-compaction returns to the depth-1
  floor). Lever: ``compact_deltas(min_chain=...)`` minor compaction.
- **LSM index segments**: every maintained-index bucket/cell read
  opens one file per live segment (state/index.py ``_resolved_bucket``)
  — the same linear knee. Lever: the structure's ``compact()``.
- **partition skew**: a hot bucket serializes its merge (measured
  2.5-4× wall at 50 % skew, scripts/stress_hotkey_cdc.py). Lever:
  ``repartition_table`` — heavyweight (full rewrite), so the policy
  only ADVISES by default.

``MaintenancePolicy`` packages those cost models as an ``after_commit``
hook: thresholds in, bounded chains/segments out, every action an
ordinary idempotent maintenance commit (crash between commit and hook
re-enters safely, exactly like the refresh hooks it composes with).

Correctness is free by construction: ``compact_deltas`` is pinned
hash-neutral (zero-delta contract) and index ``compact()`` folds
without changing query results — the policy only moves WHEN the
already-verified operations run. tests/test_policy.py pins both the
bounds and state-equality against a manual-cadence run.
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class MaintenancePolicy:
    """Wire via ``run_cdc(..., after_commit=policy.after_commit)`` or
    compose with refresh hooks (CLI: ``run-cdc --auto-maintain``).

    ``lake``: the ingest LakeTable. ``targets``: maintained structures
    (text/ANN/minhash index, layouts…) the policy may ``compact()``
    when their live-segment count reaches ``max_segments``; anything
    without ``_live_segments``/``compact`` is ignored. ``max_chain``:
    fold MOR partitions whose pending delta chain reaches this depth
    (0 disables). ``advise_every``: every N ingest commits, record a
    ``suggest_num_partitions`` advisory; with ``auto_repartition`` the
    policy executes it (off by default — a full-table rewrite should
    usually be an operator decision)."""

    lake: object
    targets: tuple = ()
    max_chain: int = 8
    max_segments: int = 12
    advise_every: int = 16
    auto_repartition: bool = False
    log: list = field(default_factory=list)
    _ingest_commits: int = 0

    def _record(self, action: str, **info) -> None:
        self.log.append({"action": action, **info})

    def after_commit(self, commit) -> None:
        self._ingest_commits += 1
        # 1) MOR chain depth → minor compaction of deep partitions only
        if self.max_chain and getattr(self.lake, "merge_on_read", False):
            chains = self.lake.delta_chain_lengths()
            deep = {p: c for p, c in chains.items()
                    if c >= self.max_chain}
            if deep:
                res = self.lake.compact_deltas(min_chain=self.max_chain)
                self._record("compact_deltas", epoch=res.epoch,
                             folded_partitions=sorted(deep),
                             max_chain_seen=max(deep.values()))
                # let maintained structures mark the compaction commit
                # applied right away (zero-delta, cheap) instead of on
                # the next ingest commit
                for t in self.targets:
                    if hasattr(t, "refresh"):
                        t.refresh()
        # 2) index/layout segment count → structure compact()
        if self.max_segments:
            for t in self.targets:
                segs = getattr(t, "_live_segments", None)
                if segs is None or not hasattr(t, "compact"):
                    continue
                n = len(segs())
                if n >= self.max_segments:
                    t.compact()
                    self._record("index_compact",
                                 target=type(t).__name__,
                                 segments_before=n,
                                 segments_after=len(segs()))
        # 3) skew advisory on a fixed cadence
        if self.advise_every and \
                self._ingest_commits % self.advise_every == 0:
            cur = self.lake.num_partitions
            want = self.lake.suggest_num_partitions()
            if want != cur:
                if self.auto_repartition:
                    res = self.lake.repartition_table(want)
                    self._record("repartition", epoch=res.epoch,
                                 from_partitions=cur, to_partitions=want)
                else:
                    self._record("repartition_advisory",
                                 current=cur, suggested=want)

    # -- reporting ---------------------------------------------------------
    def summary(self) -> dict:
        out: dict[str, int] = {}
        for e in self.log:
            out[e["action"]] = out.get(e["action"], 0) + 1
        return out

"""Mergeable sketches: approximate aggregates whose partials combine
associatively — the pattern that turns an all-to-all shuffle into
"one small sketch per block + a tiny merge" (guide: Aggregation at scale).

HyperLogLog here; the same emit-partial/merge shape fits KLL/theta/etc.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class HyperLogLog:
    """Fixed-precision HLL over stable 64-bit hashes (numpy-vectorized)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of remaining 64-p bits + 1 (vectorized)
        lz = np.full(len(hashes), 64 - self.p, dtype=np.uint8)
        mask = rest != 0
        if mask.any():
            # float64 log2 is exact for the leading-bit position
            bits = np.floor(np.log2(rest[mask].astype(np.float64))).astype(np.int64)
            lz[mask] = 63 - bits
        rank = np.minimum(lz + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add_values(self, values) -> None:
        arr = np.asarray(values, dtype=object)
        self.add_hashes(pd.util.hash_array(arr))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting correction
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): one serialized HLL per block
    (emitted from ``map_batches``), merged on the driver — bytes moved
    are O(blocks × 2^p), never the column."""
    def sketch(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        h.add_values(batch[col].to_pandas().to_numpy())
        return pa.table({"sketch": pa.array([h.to_bytes()], type=pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow").to_pandas()
    acc = HyperLogLog(p)
    for b in parts["sketch"]:
        acc = acc.merge(HyperLogLog.from_bytes(b, p))
    return acc.estimate()

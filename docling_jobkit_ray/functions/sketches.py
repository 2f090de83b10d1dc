"""Mergeable sketches: HyperLogLog approximate distinct count.

The scale path for COUNT(DISTINCT) at 10^12 rows: each batch emits ONE
serialized sketch (map_batches partial), sketches merge associatively in a
tiny final stage — the exchange is O(batches x 2^p bytes), independent of
row count (Flajolet et al. 2007; the standard mergeable-sketch pattern).

Deterministic: hash = blake2b of the value bytes, no seeds.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from ..sources.pages import read_table


class HyperLogLog:
    """Dense HLL with 2^p registers and the standard bias-corrected
    estimator (small-range linear counting correction)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    @staticmethod
    def _hash64(value: bytes) -> int:
        return int.from_bytes(
            hashlib.blake2b(value, digest_size=8).digest(), "little"
        )

    @staticmethod
    def _leading_zeros64(v: np.ndarray) -> np.ndarray:
        """Exact vectorized count-leading-zeros on uint64 via a 6-step
        binary-search ladder — float64 log2 rounds values just below 2^k up
        to k (e.g. 2^60-1), undercounting leading zeros by one for ~1/2^11
        of hashes."""
        clz = np.zeros(v.shape, dtype=np.int64)
        x = v.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            clz[mask] += shift
            x[mask] = x[mask] << np.uint64(shift)
        return clz

    def add_hashes(self, hashes: np.ndarray) -> None:
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        v = hashes << np.uint64(self.p)
        # rank = leading-zero count of the remaining bits + 1 (capped when 0)
        rank = np.full(len(hashes), 64 - self.p + 1, dtype=np.uint8)
        active = v != 0
        if active.any():
            rank[active] = (self._leading_zeros64(v[active]) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add_values(self, values) -> None:
        hs = np.fromiter(
            (self._hash64(str(v).encode("utf-8")) for v in values),
            dtype=np.uint64,
            count=len(values),
        )
        self.add_hashes(hs)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting, small range
        return raw

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        p = data[0]
        return cls(p, np.frombuffer(data[1:], dtype=np.uint8).copy())


def approx_distinct(
    ds: ray.data.Dataset, column: str, *, p: int = 12
) -> float:
    """Approximate COUNT(DISTINCT column): one sketch per batch, merged on
    the driver (sketch bytes are tiny: 2^p per batch)."""

    def partial(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        hll.add_values(batch.column(column).to_pylist())
        return pa.table({"sketch": pa.array([hll.serialize()], pa.binary())})

    sketches = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = HyperLogLog(p)
    for row in sketches.take_all():
        merged = merged.merge(HyperLogLog.deserialize(row["sketch"]))
    return merged.estimate()


def approx_distinct_users(sf_dir: str, *, p: int = 12) -> float:
    ds = read_table(sf_dir, "events", columns=["user_id"])
    return approx_distinct(ds, "user_id", p=p)

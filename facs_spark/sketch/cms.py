"""Count–min sketch (Cormode & Muthukrishnan, J. Algorithms 2005).

``d = ceil(ln(1/δ))`` rows × ``w = ceil(e/ε)`` counters.  Point
estimates overcount only: ``est ≥ true`` always, and
``est ≤ true + ε·N`` with probability ≥ 1-δ (N = total weight).
Merge is element-wise addition — associative/commutative, so partials
built per Spark partition combine to the same sketch as a single-pass
build.

Row hashes derive from one 64-bit key hash re-mixed per row with
splitmix64 (pairwise-independence in practice; same construction as
common public implementations).  Cross-checked in tests against exact
``groupBy().count()`` and Spark's ``count_min_sketch`` built-in.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from .base import frame, unframe
from .hashing import splitmix64

_MAGIC = b"FSCM"
_VERSION = 1
_HDR = struct.Struct("<IIQ")  # d, w, total


def _key_hash(values) -> np.ndarray:
    from .hashing import key_hash_batch
    return key_hash_batch(values, 0)


@dataclass
class CountMinSketch:
    epsilon: float = 0.0001   # additive error ≤ ε·N
    delta: float = 0.01       # failure probability
    d: int = field(default=None)
    w: int = field(default=None)
    total: int = 0
    table: np.ndarray = field(default=None, repr=False)  # (d, w) int64

    MAGIC = _MAGIC

    def __post_init__(self):
        if self.d is None:
            self.d = max(1, math.ceil(math.log(1.0 / self.delta)))
        if self.w is None:
            self.w = max(1, math.ceil(math.e / self.epsilon))
        if self.table is None:
            self.table = np.zeros((self.d, self.w), dtype=np.int64)
        elif self.table.shape != (self.d, self.w):
            raise ValueError("table shape mismatch")

    def _row_cols(self, h: np.ndarray, row: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            hr = splitmix64(h ^ np.uint64(0x9E3779B97F4A7C15 * (row + 1) & 0xFFFFFFFFFFFFFFFF))
        return (hr % np.uint64(self.w)).astype(np.int64)

    # -- update ------------------------------------------------------
    def update_batch(self, values, weights=None) -> None:
        arr = np.asarray(values)
        if arr.size == 0:
            return
        h = _key_hash(values)
        if weights is None:
            w = np.ones(h.size, dtype=np.int64)
        else:
            w = np.asarray(weights, dtype=np.int64)
        for row in range(self.d):
            np.add.at(self.table[row], self._row_cols(h, row), w)
        self.total += int(w.sum())

    # -- query -------------------------------------------------------
    def query_batch(self, values) -> np.ndarray:
        """Point estimates (min over rows) for a batch of keys."""
        arr = np.asarray(values)
        if arr.size == 0:
            return np.zeros(0, dtype=np.int64)
        h = _key_hash(values)
        est = np.full(h.size, np.iinfo(np.int64).max, dtype=np.int64)
        for row in range(self.d):
            np.minimum(est, self.table[row, self._row_cols(h, row)], out=est)
        return est

    @property
    def error_bound(self) -> float:
        """Additive bound ε·N (published, holds w.p. ≥ 1-δ per query)."""
        return (math.e / self.w) * self.total

    # -- merge -------------------------------------------------------
    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError("cannot merge CMS with different geometry")
        return CountMinSketch(epsilon=self.epsilon, delta=self.delta,
                              d=self.d, w=self.w,
                              total=self.total + other.total,
                              table=self.table + other.table)

    # -- io ----------------------------------------------------------
    # Two wire formats, density-chosen like the HLL blobs: dense v1
    # (d·w int64 ≈ 1.1 MB at default ε=1e-4) vs sparse v2 (12 bytes
    # per NONZERO counter: u32 flat index + u64 count).  Partial
    # sketches from small partitions/groups are mostly zeros, so the
    # grouped/partial shuffle ships the observed counters, not the
    # whole table; merge always runs dense in memory.
    def to_bytes(self) -> bytes:
        nz = np.flatnonzero(self.table)
        if (self.d * self.w < (1 << 32)  # u32 flat-index range
                and nz.size * 12 + 4 < self.d * self.w * 8 // 4):
            payload = (_HDR.pack(self.d, self.w, self.total)
                       + struct.pack("<I", nz.size)
                       + nz.astype(np.uint32).tobytes()
                       + self.table.ravel()[nz].tobytes())
            return frame(_MAGIC, 2, payload)
        return frame(_MAGIC, _VERSION,
                     _HDR.pack(self.d, self.w, self.total) + self.table.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountMinSketch":
        version, payload = unframe(_MAGIC, blob)
        if version not in (1, 2):
            raise ValueError(
                f"unsupported CMS frame version {version} (this release "
                "reads v1 dense / v2 sparse)")
        d, w, total = _HDR.unpack_from(payload)
        if version == 2:
            (count,) = struct.unpack_from("<I", payload, _HDR.size)
            off = _HDR.size + 4
            idx = np.frombuffer(payload, dtype=np.uint32, offset=off,
                                count=count).astype(np.int64)
            vals = np.frombuffer(payload, dtype=np.int64,
                                 offset=off + 4 * count, count=count)
            table = np.zeros(d * w, dtype=np.int64)
            table[idx] = vals
            return cls(d=d, w=w, total=total, table=table.reshape(d, w))
        table = np.frombuffer(payload, dtype=np.int64, offset=_HDR.size).copy()
        return cls(d=d, w=w, total=total, table=table.reshape(d, w))

"""KLL quantile sketch (Karnin, Lang, Liberty, FOCS 2016 — public).

Level-buffer sketch: level h holds items each representing 2^h input
items.  When a level overflows its capacity ``max(2, ceil(k·c^(H-h)))``
(c = 2/3), it is sorted and every other item is promoted to level
h+1 (compaction).  The even/odd choice is made by a *deterministic*
seeded counter-based RNG so the sketch is reproducible for a given
input order — required for the driver's repeated runs.  Merge =
concatenate level buffers + compact down to capacity; associative up
to the randomized compaction (property-tested: rank error within
bound for any repartitioning).

Published bound: normalized rank error ε ≈ O(1/k) with constant ~1.7
(KLL paper §5 experiments); with k=200 the practical 99% bound is
~1.65/k ≈ 0.8–1%.  Tests assert against a conservative 3/k.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from .base import frame, unframe

_MAGIC = b"FSKL"
_VERSION = 1
_HDR = struct.Struct("<IQQI")  # k, n, seed_counter, n_levels
_C = 2.0 / 3.0


@dataclass
class KLL:
    k: int = 200
    n: int = 0
    levels: list = field(default_factory=list, repr=False)  # list[np.ndarray f64]
    _rng_counter: int = 0

    MAGIC = _MAGIC

    def _capacity(self, h: int, n_levels: int) -> int:
        return max(2, int(math.ceil(self.k * (_C ** (n_levels - 1 - h)))))

    def _coin(self) -> int:
        """Deterministic counter-based coin (splitmix of the counter)."""
        self._rng_counter += 1
        z = (self._rng_counter * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return (z >> 63) & 1

    def _compact(self) -> None:
        """Compact overflowing levels bottom-up."""
        while True:
            n_levels = len(self.levels)
            for h in range(n_levels):
                buf = self.levels[h]
                if buf.size > self._capacity(h, n_levels):
                    buf = np.sort(buf)
                    offset = self._coin()
                    promoted = buf[offset::2]
                    self.levels[h] = np.zeros(0, dtype=np.float64)
                    if h + 1 == len(self.levels):
                        self.levels.append(promoted)
                    else:
                        self.levels[h + 1] = np.concatenate(
                            [self.levels[h + 1], promoted])
                    break
            else:
                return

    # -- update ------------------------------------------------------
    def update_batch(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        if not self.levels:
            self.levels.append(np.zeros(0, dtype=np.float64))
        # Bulk insert: append the whole batch to level 0, then cascade
        # compactions.  Fewer, larger compactions only reduce the
        # randomized-compaction error vs item-at-a-time feeding.
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact()
        self.n += v.size

    # -- merge -------------------------------------------------------
    def merge(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError("cannot merge KLL sketches with different k")
        out = KLL(k=self.k, n=self.n + other.n,
                  _rng_counter=self._rng_counter + other._rng_counter)
        n_levels = max(len(self.levels), len(other.levels))
        for h in range(n_levels):
            a = self.levels[h] if h < len(self.levels) else np.zeros(0)
            b = other.levels[h] if h < len(other.levels) else np.zeros(0)
            out.levels.append(np.concatenate([a, b]).astype(np.float64))
        out._compact()
        return out

    # -- query -------------------------------------------------------
    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, buf in enumerate(self.levels):
            if buf.size:
                items.append(buf)
                weights.append(np.full(buf.size, 2 ** h, dtype=np.int64))
        if not items:
            return np.zeros(0), np.zeros(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, q: float) -> float:
        it, wt = self._weighted()
        if it.size == 0:
            return math.nan
        cum = np.cumsum(wt)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        return float(it[min(i, it.size - 1)])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(float(q)) for q in qs])

    def rank(self, x: float) -> float:
        """Normalized rank estimate of x."""
        it, wt = self._weighted()
        if it.size == 0:
            return math.nan
        cum = np.concatenate([[0], np.cumsum(wt)])
        i = int(np.searchsorted(it, x, side="right"))
        return float(cum[i] / cum[-1])

    @property
    def rank_error(self) -> float:
        """Conservative published-style bound ~ O(1/k)."""
        return 3.0 / self.k

    # -- io ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        hdr = _HDR.pack(self.k, self.n, self._rng_counter, len(self.levels))
        parts = [hdr]
        for buf in self.levels:
            parts.append(struct.pack("<Q", buf.size))
            parts.append(buf.astype(np.float64).tobytes())
        return frame(_MAGIC, _VERSION, b"".join(parts))

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLL":
        _, payload = unframe(_MAGIC, blob)
        k, n, counter, n_levels = _HDR.unpack_from(payload)
        off = _HDR.size
        levels = []
        for _ in range(n_levels):
            (size,) = struct.unpack_from("<Q", payload, off)
            off += 8
            levels.append(np.frombuffer(payload, np.float64, count=size,
                                        offset=off).copy())
            off += size * 8
        return cls(k=k, n=n, levels=levels, _rng_counter=counter)

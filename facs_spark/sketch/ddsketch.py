"""DDSketch — relative-error quantile sketch (Masson, Rim & Lee,
VLDB 2019), unbounded-store variant.

A value ``x > 0`` lands in the logarithmic bucket

    i = ceil( ln(x) / ln(gamma) ),     gamma = (1 + alpha) / (1 - alpha)

and every bucket ``i`` is answered by the representative value
``2·gamma^i / (gamma + 1)`` (the geometric midpoint of the bucket
``(gamma^(i-1), gamma^i]`` under relative error), so any value
reconstructed from its bucket is within relative error ``alpha`` of
the original — the paper's Theorem 1.  Quantiles follow the Datadog
reference semantics: ``rank = q·(n-1)`` and the answer is the FIRST
bucket (ascending) whose cumulative count exceeds ``rank``.

Unlike t-digest/KLL, the unbounded store is **fully deterministic
and merge-order-invariant**: the sketch is exactly the bucket
histogram of the input, and ``merge`` is pointwise count addition.
That is what lets the engine give DDSketch a *value-level* DuckDB
oracle (queries.py q95) instead of the rank-error-bound gate used
for the randomized quantile sketches (q07/q08): the oracle recomputes
``ceil(ln(x)/ln(gamma))`` per row in SQL and walks the same
cumulative histogram.  The collapsing (bounded-store) variant trades
that invariance for a hard memory cap; page-length distributions span
< 10 decades, i.e. ≤ ceil(10·ln(10)/ln(gamma)) buckets (~1150 at
alpha = 0.01, 8 B counts → ~9 KB), so the unbounded store IS the
bounded store here and the blob stays executor-friendly at any scale.

Non-positive values are counted in a dedicated zero bucket (rank mass
below every logarithmic bucket), as in the reference implementation.

Counterpart of the reference's exact length statistics
(``facs/query.c`` per-file counters); complements t-digest (q07,
rank-accuracy near the tails) with a value-accuracy guarantee.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import frame, pack_array, unframe, unpack_array

_MAGIC = b"FSDD"
_VERSION = 1
_HDR = struct.Struct("<dQ")  # alpha, zero_count


class DDSketch:
    """Relative-error quantile sketch; deterministic, exactly mergeable."""

    MAGIC = _MAGIC

    def __init__(self, alpha: float = 0.01):
        if not 0.0 < alpha < 1.0:
            raise ValueError(f"alpha must be in (0, 1), got {alpha}")
        self.alpha = float(alpha)
        self.gamma = (1.0 + alpha) / (1.0 - alpha)
        self._log_gamma = math.log(self.gamma)
        self.zero_count = 0
        self._store: dict[int, int] = {}

    # ------------------------------------------------------------ feed
    def update_batch(self, values) -> None:
        vals = np.asarray(values, dtype=np.float64)
        if vals.size == 0:
            return
        vals = vals[~np.isnan(vals)]
        pos = vals[vals > 0.0]
        self.zero_count += int(vals.size - pos.size)
        if pos.size == 0:
            return
        keys = np.ceil(np.log(pos) / self._log_gamma).astype(np.int64)
        uniq, counts = np.unique(keys, return_counts=True)
        store = self._store
        for k, c in zip(uniq.tolist(), counts.tolist()):
            store[k] = store.get(k, 0) + c

    # ----------------------------------------------------------- merge
    def merge(self, other: "DDSketch") -> "DDSketch":
        if abs(other.alpha - self.alpha) > 1e-12:
            raise ValueError(
                f"alpha mismatch: {self.alpha} vs {other.alpha}")
        out = DDSketch(alpha=self.alpha)
        out.zero_count = self.zero_count + other.zero_count
        out._store = dict(self._store)
        for k, c in other._store.items():
            out._store[k] = out._store.get(k, 0) + c
        return out

    # ----------------------------------------------------------- query
    @property
    def count(self) -> int:
        return self.zero_count + sum(self._store.values())

    def bucket_value(self, key: int) -> float:
        return 2.0 * self.gamma ** key / (self.gamma + 1.0)

    def quantile(self, q: float) -> float:
        """Value at quantile ``q`` (Datadog ``get_quantile_value``
        semantics: lower bucket at rank ``q·(n-1)``)."""
        n = self.count
        if n == 0:
            return float("nan")
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q must be in [0, 1], got {q}")
        rank = q * (n - 1)
        if self.zero_count > rank:
            return 0.0
        cum = self.zero_count
        for key in sorted(self._store):
            cum += self._store[key]
            if cum > rank:
                return self.bucket_value(key)
        return self.bucket_value(max(self._store))  # q == 1 guard

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    @property
    def error_bound(self) -> float:
        """Published guarantee: |est - true| <= alpha * true."""
        return self.alpha

    # ------------------------------------------------------------ wire
    def to_bytes(self) -> bytes:
        keys = np.fromiter(sorted(self._store), dtype=np.int64,
                           count=len(self._store))
        counts = np.fromiter((self._store[k] for k in keys.tolist()),
                             dtype=np.int64, count=keys.size)
        payload = (_HDR.pack(self.alpha, self.zero_count)
                   + pack_array(keys) + pack_array(counts))
        return frame(_MAGIC, _VERSION, payload)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "DDSketch":
        version, payload = unframe(_MAGIC, blob)
        if version != _VERSION:
            raise ValueError(f"unsupported DDSketch version {version}")
        alpha, zero_count = _HDR.unpack_from(payload)
        keys, off = unpack_array(payload, _HDR.size)
        counts, _ = unpack_array(payload, off)
        out = cls(alpha=alpha)
        out.zero_count = int(zero_count)
        out._store = {int(k): int(c)
                      for k, c in zip(keys.tolist(), counts.tolist())}
        return out

"""t-digest quantile sketch (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests", 2019 — public).

Merging-digest variant with the k1 scale function
``k(q) = (δ/2π)·asin(2q−1)``: centroids sorted by mean, batch update =
merge-sort incoming values with existing centroids then re-cluster,
where clustering is fully vectorized — each centroid maps to k-space
and joins the bucket ``floor(k)``; buckets are reduced with
``np.add.reduceat`` (no per-centroid Python loop).  The k1 scale
function guarantees bucket q-width ≤ 2π/δ·√(q(1-q))-ish, giving the
published accuracy shape: rank error ~ O(q(1-q)/δ), tightest at the
tails.  Merge of two digests = merge centroid lists + one re-cluster —
associative up to the documented approximation (property-tested for
bounded drift under random repartitioning).

Quantile query interpolates cumulative centroid weights with
singleton-aware endpoints.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from .base import frame, unframe

_MAGIC = b"FSTD"
_VERSION = 1
_HDR = struct.Struct("<dQQdd")  # delta, count, n_centroids, min, max


@dataclass
class TDigest:
    delta: float = 200.0  # compression; ~2δ centroids retained
    means: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float64), repr=False)
    weights: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float64), repr=False)
    vmin: float = math.inf
    vmax: float = -math.inf

    MAGIC = _MAGIC

    @property
    def count(self) -> float:
        return float(self.weights.sum())

    # -- clustering core ----------------------------------------------
    def _cluster(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Re-cluster sorted (means, weights) into ≤ ~2δ centroids."""
        if means.size == 0:
            self.means = means
            self.weights = weights
            return
        total = weights.sum()
        q_right = np.cumsum(weights) / total          # right q edge of each point
        q_mid = q_right - weights / (2.0 * total)     # midpoint q
        # k1 scale: k(q) = δ/(2π) asin(2q-1); bucket = floor(k)
        k = (self.delta / (2.0 * math.pi)) * np.arcsin(np.clip(2.0 * q_mid - 1.0, -1.0, 1.0))
        bucket = np.floor(k).astype(np.int64)
        # reduceat over bucket boundaries (data already sorted by mean,
        # and q_mid is monotone, so buckets are contiguous runs)
        starts = np.flatnonzero(np.diff(bucket, prepend=bucket[0] - 1))
        wsum = np.add.reduceat(weights, starts)
        msum = np.add.reduceat(means * weights, starts)
        self.means = msum / wsum
        self.weights = wsum

    # -- update ------------------------------------------------------
    def update_batch(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        v = np.sort(v)
        self.vmin = min(self.vmin, float(v[0]))
        self.vmax = max(self.vmax, float(v[-1]))
        m = np.concatenate([self.means, v])
        w = np.concatenate([self.weights, np.ones(v.size)])
        order = np.argsort(m, kind="stable")
        self._cluster(m[order], w[order])

    # -- merge -------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("cannot merge t-digests with different delta")
        out = TDigest(delta=self.delta,
                      vmin=min(self.vmin, other.vmin),
                      vmax=max(self.vmax, other.vmax))
        m = np.concatenate([self.means, other.means])
        w = np.concatenate([self.weights, other.weights])
        order = np.argsort(m, kind="stable")
        out._cluster(m[order], w[order])
        return out

    # -- query -------------------------------------------------------
    def quantile(self, q: float) -> float:
        n = self.means.size
        if n == 0:
            return math.nan
        if n == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2.0  # centroid centers
        if target <= cum[0]:
            # interpolate from min to first centroid
            f = target / max(cum[0], 1e-300)
            return float(self.vmin + f * (self.means[0] - self.vmin))
        if target >= cum[-1]:
            f = (target - cum[-1]) / max(total - cum[-1], 1e-300)
            return float(self.means[-1] + f * (self.vmax - self.means[-1]))
        i = int(np.searchsorted(cum, target) - 1)
        f = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + f * (self.means[i + 1] - self.means[i]))

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(float(q)) for q in qs])

    def cdf(self, x: float) -> float:
        if self.means.size == 0:
            return math.nan
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return float(np.interp(x, self.means, cum / total,
                               left=0.0, right=1.0))

    # -- io ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        hdr = _HDR.pack(self.delta, int(self.count), self.means.size,
                        self.vmin, self.vmax)
        return frame(_MAGIC, _VERSION,
                     hdr + self.means.tobytes() + self.weights.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        _, payload = unframe(_MAGIC, blob)
        delta, _count, nc, vmin, vmax = _HDR.unpack_from(payload)
        off = _HDR.size
        means = np.frombuffer(payload, np.float64, count=nc, offset=off).copy()
        off += nc * 8
        weights = np.frombuffer(payload, np.float64, count=nc, offset=off).copy()
        return cls(delta=delta, means=means, weights=weights, vmin=vmin, vmax=vmax)

"""Moments sketch (Gan, Ding, Tai, Sharan & Bailis, VLDB 2018):
quantile estimation from power sums.

The summary is just ``(n, min, max, s1..sk)`` with ``sp = sum(x^p)``
— merge is pointwise addition (exactly associative/commutative), the
blob is O(k) numbers, and for INTEGER inputs the sums are kept as
arbitrary-precision Python ints so the sketch is EXACT and
deterministic under any partitioning (the q98 value-level oracle
replays s1..s4 straight from SQL SUMs).  Quantile estimates follow
the paper: fit the maximum-entropy density matching the Chebyshev
moments (Newton's method on the dual potential, their §4), then
invert its CDF.  The estimate is the paper's heuristic — accuracy is
gated by measured rank error (pytest + the q98 ``within_bound``
column), same discipline as t-digest/KLL (q07/q08).

Batch sums are chunked so ``x^4`` partials never overflow int64
mid-batch: a 100k-element chunk of int64 fourth powers is safe only
up to x = floor((2^63 / 100000)^(1/4)) = 3097, so any chunk whose
max exceeds 3000 falls back to exact per-chunk object-dtype sums
(values in the (3100, 8192] band previously wrapped silently).

Reference counterpart: facs reports only count/rate aggregates
(``facs/query.c`` F_set counters); the moments sketch answers
quantile queries from the same O(1)-merge state.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import frame, unframe

_MAGIC = b"FSMO"
_VERSION = 1
_K = 4               # power sums s1..s4 (Chebyshev degree 4 fit)
_CHUNK = 100_000
# x^4 * _CHUNK < 2^63 requires x <= 3097; stay under with margin
_INT64_SAFE_MAX = 3000


def _chunked_int_sums(v: np.ndarray) -> list[int]:
    """Exact [s1..s4] for an int64 array, chunked so int64 partial
    sums cannot overflow (each chunk sum is promoted to Python int)."""
    out = [0, 0, 0, 0]
    for lo in range(0, v.size, _CHUNK):
        c = v[lo:lo + _CHUNK]
        if c.size and max(int(c.max()), -int(c.min())) > _INT64_SAFE_MAX:
            # x^4 up to 2^52 per element: chunk in object space
            o = c.astype(object)
            o2 = o * o
            out[0] += int(np.sum(o))
            out[1] += int(np.sum(o2))
            out[2] += int(np.sum(o2 * o))
            out[3] += int(np.sum(o2 * o2))
        else:
            c2 = c * c
            out[0] += int(c.sum())
            out[1] += int(c2.sum())
            out[2] += int((c2 * c).sum())
            out[3] += int((c2 * c2).sum())
    return out


class MomentsSketch:
    """Power-sum quantile sketch; exact ints for integer inputs."""

    MAGIC = _MAGIC

    def __init__(self):
        self.n = 0
        self.mn: int | float | None = None
        self.mx: int | float | None = None
        self.sums: list = [0] * _K

    # ------------------------------------------------------------ feed
    def update_batch(self, values) -> None:
        v = np.asarray(values)
        if v.dtype.kind == "f":
            v = v[~np.isnan(v)]
        if v.size == 0:
            return
        if v.dtype.kind in "iu":
            v = v.astype(np.int64)
            sums = _chunked_int_sums(v)
            lo, hi = int(v.min()), int(v.max())
        else:
            v = v.astype(np.float64)
            sums = [float(np.sum(v ** (p + 1))) for p in range(_K)]
            lo, hi = float(v.min()), float(v.max())
        self.n += int(v.size)
        self.mn = lo if self.mn is None else min(self.mn, lo)
        self.mx = hi if self.mx is None else max(self.mx, hi)
        self.sums = [a + b for a, b in zip(self.sums, sums)]

    # ----------------------------------------------------------- merge
    def merge(self, other: "MomentsSketch") -> "MomentsSketch":
        out = MomentsSketch()
        out.n = self.n + other.n
        mns = [m for m in (self.mn, other.mn) if m is not None]
        mxs = [m for m in (self.mx, other.mx) if m is not None]
        out.mn = min(mns) if mns else None
        out.mx = max(mxs) if mxs else None
        out.sums = [a + b for a, b in zip(self.sums, other.sums)]
        return out

    # ----------------------------------------------------------- query
    def _standardized_power_moments(self) -> np.ndarray:
        """E[t^p], p=0.._K for t = (2x - (mn+mx)) / (mx - mn) in
        [-1, 1], via binomial expansion of the power sums."""
        a, b = float(self.mn), float(self.mx)
        if b == a:
            # degenerate: all mass at the single point (t = 0)
            return np.array([1.0] + [0.0] * _K)
        s = [float(self.n)] + [float(x) for x in self.sums]
        c, w = -(a + b) / (b - a), 2.0 / (b - a)
        out = []
        from math import comb
        for p in range(_K + 1):
            acc = 0.0
            for j in range(p + 1):
                acc += comb(p, j) * (w ** j) * (c ** (p - j)) * s[j]
            out.append(acc / self.n)
        return np.array(out)

    def _maxent_density(self, grid_n: int = 1024):
        """Newton solve for f(t) = exp(sum lambda_j T_j(t)) matching
        the Chebyshev moments (Gan et al. §4.2); returns (t_grid, pdf
        weights) on a uniform grid over [-1, 1]."""
        mom_pow = self._standardized_power_moments()
        # Chebyshev T_0..T_4 in the power basis
        cheb = np.array([
            [1, 0, 0, 0, 0],
            [0, 1, 0, 0, 0],
            [-1, 0, 2, 0, 0],
            [0, -3, 0, 4, 0],
            [1, 0, -8, 0, 8],
        ], dtype=np.float64)
        mu = cheb @ mom_pow                      # E[T_j], j=0..4
        t = np.linspace(-1.0, 1.0, grid_n)
        tb = np.stack([np.ones_like(t), t, 2 * t * t - 1,
                       4 * t ** 3 - 3 * t, 8 * t ** 4 - 8 * t * t + 1])
        dt = t[1] - t[0]
        lam = np.zeros(_K + 1)
        lam[0] = -np.log(2.0)                    # start at uniform
        for _ in range(200):
            f = np.exp(np.clip(lam @ tb, -300, 300))
            grad = (tb * f).sum(axis=1) * dt - mu
            if np.abs(grad).max() < 1e-10:
                break
            hess = (tb[:, None, :] * tb[None, :, :] * f).sum(axis=2) * dt
            hess += np.eye(_K + 1) * 1e-12
            try:
                step = np.linalg.solve(hess, grad)
            except np.linalg.LinAlgError:
                break
            # damped Newton: halve until the potential decreases
            pot = f.sum() * dt - lam @ mu
            scale = 1.0
            for _h in range(30):
                cand = lam - scale * step
                fc = np.exp(np.clip(cand @ tb, -300, 300))
                if fc.sum() * dt - cand @ mu <= pot + 1e-14:
                    lam = cand
                    break
                scale *= 0.5
            else:
                break
        f = np.exp(np.clip(lam @ tb, -300, 300))
        return t, f * dt

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        if self.mn == self.mx:
            return float(self.mn)
        t, w = self._maxent_density()
        cdf = np.cumsum(w)
        cdf /= cdf[-1]
        i = int(np.searchsorted(cdf, q))
        i = min(i, t.size - 1)
        a, b = float(self.mn), float(self.mx)
        return a + (t[i] + 1.0) / 2.0 * (b - a)

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    # ------------------------------------------------------------ wire
    def to_bytes(self) -> bytes:
        ss = ";".join([repr(self.n), repr(self.mn), repr(self.mx)]
                      + [repr(s) for s in self.sums]).encode()
        return frame(_MAGIC, _VERSION, struct.pack("<I", len(ss)) + ss)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "MomentsSketch":
        version, payload = unframe(_MAGIC, blob)
        if version != _VERSION:
            raise ValueError(f"unsupported MomentsSketch version {version}")
        import ast
        (ln,) = struct.unpack_from("<I", payload)
        parts = payload[4:4 + ln].decode().split(";")
        out = cls()
        out.n = int(parts[0])
        out.mn = None if parts[1] == "None" else ast.literal_eval(parts[1])
        out.mx = None if parts[2] == "None" else ast.literal_eval(parts[2])
        out.sums = [ast.literal_eval(p) for p in parts[3:]]
        return out

"""Frequent Directions matrix sketch (Liberty, KDD 2013; Ghashami,
Liberty, Phillips & Woodruff, SIAM J. Comput. 2016).

Maintains a buffer ``B`` of at most ``2l`` rows in ``R^d``.  Whenever
the buffer fills, one SVD shrinks it back to ``l`` rows:

    B = U diag(s) Vt ;  s'_i = sqrt(max(s_i^2 - s_l^2, 0)) ;
    B  <- diag(s'[:l]) Vt[:l]

Published deterministic guarantee (Ghashami et al. 2016, Thm 1.1):

    0 <= x^T (A^T A - B^T B) x  for unit x, and
    || A^T A - B^T B ||_2  <=  ||A||_F^2 / l

for ANY interleaving of row updates and pairwise merges — the sketch
is mergeable: ``merge`` stacks both buffers and applies the same
shrink, which is exactly the "FD is a mergeable summary" construction
of the paper (§2/§4), so Spark partials tree-combine to a sketch with
the same bound as a single-pass build.

The sketch values depend on batching/merge order (only the BOUND is
order-invariant), so distributed queries assert the spectral bound
against the exactly-computed Gram matrix instead of shipping raw
sketch rows into results — same discipline as the CMS/MG queries.

This is the embedding-space analogue of the reference's Bloom corpus
summary: a fixed-size mergeable digest of a 10^12-row matrix that
answers "how much mass lies along direction x" within a published
bound, used for PCA-lite / covariance screening of embedding columns.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from .base import frame, unframe

_MAGIC = b"FSFD"
_VERSION = 1
_HDR = struct.Struct("<IIQd")  # l, d, n_rows (seen), frob2 (||A||_F^2)


@dataclass
class FrequentDirections:
    """Mergeable l-row sketch of an (n x d) row-stream matrix."""

    l: int = 32
    d: int = 64
    n_rows: int = 0
    frob2: float = 0.0
    buf: np.ndarray = field(default=None, repr=False)  # (2l, d) float64
    fill: int = 0

    MAGIC = _MAGIC

    def __post_init__(self):
        if self.l < 1 or self.d < 1:
            raise ValueError("FrequentDirections needs l >= 1, d >= 1")
        if self.buf is None:
            self.buf = np.zeros((2 * self.l, self.d), dtype=np.float64)

    # -- update ------------------------------------------------------
    def update_batch(self, rows: np.ndarray) -> None:
        """Append a batch of rows (any shape (m, d)), shrinking as the
        buffer fills.  Vectorized: rows are copied in buffer-sized
        slabs, one SVD per 2l-row fill (amortized O(l d) per row)."""
        rows = np.asarray(rows, dtype=np.float64)
        if rows.ndim == 1:
            rows = rows.reshape(1, -1)
        if rows.shape[1] != self.d:
            raise ValueError(f"row dim {rows.shape[1]} != sketch d {self.d}")
        m = rows.shape[0]
        if m == 0:
            return
        self.n_rows += m
        self.frob2 += float(np.einsum("ij,ij->", rows, rows))
        cap = self.buf.shape[0]
        pos = 0
        while pos < m:
            take = min(cap - self.fill, m - pos)
            self.buf[self.fill:self.fill + take] = rows[pos:pos + take]
            self.fill += take
            pos += take
            if self.fill == cap:
                self._shrink()

    def _shrink(self) -> None:
        """SVD the buffer, subtract s_l^2 from the spectrum, keep l rows."""
        _u, s, vt = np.linalg.svd(self.buf[:self.fill], full_matrices=False)
        if s.size > self.l:
            s2 = np.maximum(s[:self.l] ** 2 - s[self.l] ** 2, 0.0)
            keep = np.sqrt(s2)[:, None] * vt[:self.l]
        else:
            keep = s[:, None] * vt
        self.buf[:] = 0.0
        self.buf[:keep.shape[0]] = keep
        self.fill = keep.shape[0]

    # -- query -------------------------------------------------------
    def gram(self) -> np.ndarray:
        """B^T B — the sketch's (d x d) Gram estimate of A^T A."""
        b = self.buf[:self.fill]
        return b.T @ b

    @property
    def error_bound(self) -> float:
        """Published spectral bound ||A^T A - B^T B||_2 <= ||A||_F^2 / l."""
        return self.frob2 / self.l

    # -- merge (stack + one shrink; Ghashami et al. §4) ----------------
    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if (self.l, self.d) != (other.l, other.d):
            raise ValueError("cannot merge FD sketches with different geometry")
        out = FrequentDirections(l=self.l, d=self.d,
                                 n_rows=self.n_rows + other.n_rows,
                                 frob2=self.frob2 + other.frob2)
        out.buf[:self.fill] = self.buf[:self.fill]
        out.fill = self.fill
        # feed the other buffer through the same slab/shrink path;
        # bypass the n_rows/frob2 bookkeeping (already combined above)
        rows, pos, cap = other.buf[:other.fill], 0, out.buf.shape[0]
        while pos < rows.shape[0]:
            take = min(cap - out.fill, rows.shape[0] - pos)
            out.buf[out.fill:out.fill + take] = rows[pos:pos + take]
            out.fill += take
            pos += take
            if out.fill == cap:
                out._shrink()
        return out

    # -- io ------------------------------------------------------------
    def to_bytes(self) -> bytes:
        # shrink first so the wire blob is at most l rows — the
        # shuffle ships l*d doubles, never the 2l working buffer
        if self.fill > self.l:
            self._shrink()
        body = self.buf[:self.fill].tobytes()
        payload = (_HDR.pack(self.l, self.d, self.n_rows, self.frob2)
                   + struct.pack("<I", self.fill) + body)
        return frame(_MAGIC, _VERSION, payload)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "FrequentDirections":
        version, payload = unframe(_MAGIC, blob)
        if version != _VERSION:
            raise ValueError(f"unsupported FD frame version {version}")
        l, d, n_rows, frob2 = _HDR.unpack_from(payload)
        (fill,) = struct.unpack_from("<I", payload, _HDR.size)
        off = _HDR.size + 4
        rows = np.frombuffer(payload, dtype=np.float64, offset=off,
                             count=fill * d).reshape(fill, d).copy()
        out = cls(l=l, d=d, n_rows=n_rows, frob2=frob2)
        out.buf[:fill] = rows
        out.fill = fill
        return out

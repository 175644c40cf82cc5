"""DGIM sliding-window bit counter (Datar, Gionis, Indyk & Motwani,
"Maintaining Stream Statistics over Sliding Windows", SICOMP 2002).

Counts the 1s among the last ``n`` positions of a bit stream in
``O(r·log n)`` buckets instead of an ``n``-bit ring buffer — the
sliding-window complement of the package's whole-stream sketches
(those summarize everything ever seen; DGIM forgets on schedule).
Web-monitor shape: "how many error events in the last million?",
asked per key in a stream whose history dwarfs executor memory.

Buckets are disjoint spans each covering a power-of-two count of 1s,
sizes non-increasing toward the past, at most ``r`` buckets per size:
when a size overflows, its two OLDEST buckets merge into one of twice
the size (exact — a bucket's count is exactly the 1s in its span, so
merging loses nothing; only the *window edge* does).  The estimate
sums fully-in-window buckets exactly and charges half of the one
bucket straddling the window edge, so the error is at most half the
straddling bucket's size — a DETERMINISTIC per-query bound the
structure reports alongside the estimate (``query()`` returns
``(estimate, abs_bound)``), and at most ``1/(r-1)`` of the true count
(the r-1 full buckets of every smaller size each hold at least as
many in-window 1s as the straddler can hide).  When no bucket
straddles — stream shorter than the window, or the oldest bucket
fully inside — the count is EXACT and the bound is 0: unlike the
textbook variant this implementation keeps each bucket's first
position (the exponential-histogram form of the paper), so
"straddles" is a test, not a guess.

Sequential-only by design: exponential histograms fold a stream in
order and do NOT merge across independently-built partials, so this
sketch lives in the streaming state store (one blob per group,
``streaming/stateful.py``), not in the map-side-partial tree of
``ops/sketch_agg.py``.  Counterpart of the reference's monotone
global counters (`facs/query.c` F_set reduction) for the
sliding-window case the reference cannot answer without a replay.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from .base import frame, unframe

_MAGIC = b"FSDG"
_VERSION = 1
_HDR = struct.Struct("<QIQQ")  # n, r, pos, nbuckets


@dataclass
class Dgim:
    """Sliding-window 1s counter over the last ``n`` stream positions.

    n: window length in positions (bits), any positive int;
    r: max buckets per size (error ≤ 1/(r-1) relative, r ≥ 2);
    pos: positions consumed so far (the stream clock).
    Buckets are parallel oldest-first lists: ``counts`` (1s per
    bucket, powers of two), ``firsts``/``lasts`` (positions of the
    bucket's earliest/latest 1, 1-indexed).
    """

    n: int = 1 << 20
    r: int = 8
    pos: int = 0
    counts: list = field(default_factory=list, repr=False)
    firsts: list = field(default_factory=list, repr=False)
    lasts: list = field(default_factory=list, repr=False)

    MAGIC = _MAGIC

    def __post_init__(self):
        if self.n <= 0:
            raise ValueError("window n must be positive")
        if self.r < 2:
            raise ValueError("r must be at least 2")

    # -- update ------------------------------------------------------
    def update(self, bits) -> None:
        """Consume a batch of bits (any array-like of 0/1 or bool),
        oldest first.  Only the 1s touch the bucket list; 0s just
        advance the clock — the batch cost is O(#ones · buckets)
        with buckets ≤ r·log2(window ones)."""
        arr = np.asarray(bits)
        if arr.size == 0:
            return
        ones = np.flatnonzero(arr)
        start = self.pos
        for idx in ones:
            self._add_one(start + int(idx) + 1)
        self.pos = start + int(arr.size)
        self._expire()

    def _add_one(self, p: int) -> None:
        self.counts.append(1)
        self.firsts.append(p)
        self.lasts.append(p)
        s = 1
        while True:
            idxs = [i for i, c in enumerate(self.counts) if c == s]
            if len(idxs) <= self.r:
                return
            a, b = idxs[0], idxs[1]  # two oldest of this size
            self.counts[a] += self.counts[b]
            self.lasts[a] = self.lasts[b]
            del self.counts[b], self.firsts[b], self.lasts[b]
            s *= 2

    def _expire(self) -> None:
        cut = self.pos - self.n
        while self.counts and self.lasts[0] <= cut:
            del self.counts[0], self.firsts[0], self.lasts[0]

    # -- query -------------------------------------------------------
    def query(self) -> tuple:
        """(estimate, abs_bound) for the 1s count in the last ``n``
        positions.  abs_bound == 0 means the estimate is exact."""
        cut = self.pos - self.n
        total = 0.0
        bound = 0.0
        for i in range(len(self.counts)):
            if self.firsts[i] > cut:
                total += self.counts[i]
            else:
                # only the oldest surviving bucket can straddle
                total += self.counts[i] / 2.0
                bound = self.counts[i] / 2.0
        return total, bound

    def estimate(self) -> float:
        return self.query()[0]

    @property
    def num_buckets(self) -> int:
        return len(self.counts)

    # -- wire --------------------------------------------------------
    def to_bytes(self) -> bytes:
        body = np.asarray(self.counts + self.firsts + self.lasts,
                          dtype=np.int64).tobytes()
        return frame(_MAGIC, _VERSION,
                     _HDR.pack(self.n, self.r, self.pos,
                               len(self.counts)) + body)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "Dgim":
        _v, payload = unframe(_MAGIC, blob)
        n, r, pos, nb = _HDR.unpack_from(payload)
        flat = np.frombuffer(payload, dtype=np.int64, count=3 * nb,
                             offset=_HDR.size)
        return cls(n=n, r=r, pos=pos,
                   counts=[int(x) for x in flat[:nb]],
                   firsts=[int(x) for x in flat[nb:2 * nb]],
                   lasts=[int(x) for x in flat[2 * nb:]])

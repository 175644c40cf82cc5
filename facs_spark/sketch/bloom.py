"""Distributed Bloom filter — the reference engine's core sketch.

Semantics reproduced from the reference (studied, not ported):

* bit layout: bit ``i`` lives at byte ``i >> 3``, mask ``1 << (i & 7)``
  (``facs/bloom.c:163-200`` ``finder``/``set``/``test``);
* per-hash index: ``hash5(key, seed[i], len) % m`` with ``hash5`` =
  lookup8 ``hash3`` masked to 36 bits and m prime
  (``facs/bloom.c:163-168``, ``facs/lookup8.c:548-554``);
* keys are lowercased before hashing on both build and probe sides
  (``facs/bloom.c:111-135``, ``facs/tool.c:128``) — normalization is
  the caller's job here (kernels lowercase whole pages in one
  vectorized pass);
* ``inserts`` counts only *novel* keys — an add that found every bit
  already set does not bump it (``facs/bloom.c:121-135``);
* membership may false-positive, never false-negative.

What the reference does one key at a time in C, ``add_batch`` /
``contains_batch`` do for a whole Arrow batch of fixed-length k-gram
windows in a handful of numpy ops.  ``merge`` (bitwise OR) is the
associative combine the reference lacks — it is what makes the build
distributable across Spark partitions.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from .base import frame, unframe
from .hashing import FACS_SEEDS, hash5_matrix
from .sizing import BloomStat, bloom_fpr, facs_sizing, standard_sizing

_MAGIC = b"FSBL"
_VERSION = 1
_STAT = struct.Struct("<QIQdIQ")  # m, k, capacity, e, k_mer, inserts

# byte-wise popcount LUT: GiB-scale vectors popcount in one fancy-index
# + sum, no 8× unpackbits blow-up
_POPCOUNT = np.array([bin(i).count("1") for i in range(256)],
                     dtype=np.uint16)


@dataclass
class BloomFilter:
    """Mergeable Bloom sketch over fixed-length byte keys."""

    stat: BloomStat
    k_mer: int = 0  # key length this filter was built for (0 = any)
    inserts: int = 0
    vector: np.ndarray = field(default=None, repr=False)  # uint8 bit array

    MAGIC = _MAGIC

    def __post_init__(self):
        nbytes = (self.stat.elements >> 3) + 1  # m/8+1 (facs/bloom.c:88)
        if self.vector is None:
            self.vector = np.zeros(nbytes, dtype=np.uint8)
        elif self.vector.nbytes != nbytes:
            raise ValueError("vector size does not match stat.elements")

    # -- construction ------------------------------------------------
    @classmethod
    def create(cls, capacity: int, error_rate: float = 0.0005,
               k_mer: int = 0, sizing: str = "facs") -> "BloomFilter":
        """Size a new filter.

        ``error_rate`` default 0.0005 matches the reference CLI code
        path (``facs/build.c:47``; its docs say 0.005 — quirk noted in
        SURVEY §7).  ``sizing``: "facs" = prime 13/9 integer math,
        "standard" = -n·ln p/(ln 2)².
        """
        fn = facs_sizing if sizing == "facs" else standard_sizing
        return cls(stat=fn(capacity, error_rate), k_mer=k_mer)

    # -- hashing -----------------------------------------------------
    def _indices(self, keys: np.ndarray, i: int) -> np.ndarray:
        m = np.uint64(self.stat.elements)
        if self.stat.elements > (1 << 36):
            # the reference's 36-bit hash5 mask cannot address filters
            # beyond 2^36 bits (its own scale ceiling); huge filters
            # use the full 64-bit hash3 so every bit stays reachable
            from .hashing import hash3_matrix
            return hash3_matrix(keys, FACS_SEEDS[i]) % m
        return hash5_matrix(keys, FACS_SEEDS[i]) % m

    # -- update ------------------------------------------------------
    @staticmethod
    def _unique_rows(keys: np.ndarray):
        """Distinct keys + inverse map.

        Hashing cost scales with *distinct* windows per batch, not raw
        windows — natural-language k-grams repeat heavily, so this cuts
        the memory-bound hash passes by the duplication factor while
        producing identical bits.
        """
        n, width = keys.shape
        if n <= 1 or width == 0:
            return keys, None
        if width <= 16:
            # fast path: pad to 16 bytes → two uint64 lanes, SORT BY A
            # SINGLE mixed 64-bit key (grouping needs clustering, not
            # lexicographic order), then split groups by comparing the
            # actual lanes — a 64-bit collision can only *fragment* a
            # duplicate group (same bits either way), never merge two
            # distinct keys.  ~2.3× faster than lexsort, ~5× than
            # np.unique's void-memcmp argsort on the hot k=15 case.
            from .hashing import splitmix64
            padded = np.zeros((n, 16), dtype=np.uint8)
            padded[:, :width] = keys
            u = padded.view("<u8")
            hi, lo = u[:, 0], u[:, 1]
            with np.errstate(over="ignore"):
                ck = splitmix64(hi ^ (lo * np.uint64(0xC2B2AE3D27D4EB4F)))
            order = np.argsort(ck)
            hs, ls = hi[order], lo[order]
            new = np.empty(n, dtype=bool)
            new[0] = True
            new[1:] = (hs[1:] != hs[:-1]) | (ls[1:] != ls[:-1])
            group = np.cumsum(new) - 1
            inv = np.empty(n, dtype=np.int64)
            inv[order] = group
            uniq = keys[order[new]]
            return uniq, inv
        void = np.ascontiguousarray(keys).view(
            np.dtype((np.void, width))).ravel()
        uniq_v, inv = np.unique(void, return_inverse=True)
        uniq = uniq_v.view(np.uint8).reshape(-1, width)
        return uniq, inv

    def add_batch(self, keys: np.ndarray) -> int:
        """Insert an (n, L) uint8 key matrix; returns # novel keys.

        A key is novel iff at least one of its k bit positions was
        unset before this call — matching ``bloom_add``'s
        "ret == 0 ⇒ inserts++" contract (facs/bloom.c:121-135) for
        keys arriving one at a time.  (Within one batch, duplicates
        after the first may still count as non-novel only if they map
        to already-set bits from an earlier vector op — we apply the
        batch seed-by-seed with novelty computed against the pre-call
        state, then OR, which matches the sequential semantics for
        distinct keys.)
        """
        if keys.shape[0] == 0:
            return 0
        keys, _inv = self._unique_rows(keys)
        novel = np.zeros(keys.shape[0], dtype=bool)
        byte_idx_all = []
        spot_all = []
        for i in range(self.stat.ideal_hashes):
            idx = self._indices(keys, i)
            byte_idx = (idx >> np.uint64(3)).astype(np.int64)
            spot = (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
            novel |= (self.vector[byte_idx] & spot) == 0
            byte_idx_all.append(byte_idx)
            spot_all.append(spot)
        for byte_idx, spot in zip(byte_idx_all, spot_all):
            np.bitwise_or.at(self.vector, byte_idx, spot)
        n_novel = int(novel.sum())
        self.inserts += n_novel
        return n_novel

    # -- probe -------------------------------------------------------
    def contains_batch(self, keys: np.ndarray,
                       cache: dict | None = None) -> np.ndarray:
        """Boolean membership for an (n, L) uint8 key matrix.

        Early-exits per seed: after each hash round only surviving
        candidates are re-probed (the vectorized analogue of
        ``bloom_test``'s first-unset-bit return, facs/bloom.c:146-157).

        ``cache``: optional cross-batch memo {key bytes: bool}.
        Membership of an immutable filter is deterministic, so
        memoizing is semantics-free; web corpora repeat shingles
        (boilerplate) heavily enough that this removes most hash work.
        """
        if cache is not None:
            uniq, inv = self._unique_rows(keys)
            key_bytes = [r.tobytes() for r in uniq]
            out = np.empty(len(key_bytes), dtype=bool)
            missing = []
            for i, b in enumerate(key_bytes):
                v = cache.get(b)
                if v is None:
                    missing.append(i)
                else:
                    out[i] = v
            if missing:
                fresh = self._contains_unique(uniq[np.asarray(missing)])
                out[np.asarray(missing)] = fresh
            # evict AFTER this batch's answers are assembled, then
            # repopulate with the current working set
            if len(cache) > 4_000_000:  # bound worker memory
                cache.clear()
            for i, b in enumerate(key_bytes):
                cache[b] = bool(out[i])
            return out if inv is None else out[inv]
        uniq, inv = self._unique_rows(keys)
        out = self._contains_unique(uniq)
        return out if inv is None else out[inv]

    def _contains_unique(self, uniq: np.ndarray) -> np.ndarray:
        n = uniq.shape[0]
        alive = np.arange(n)
        out = np.zeros(n, dtype=bool)
        sub = uniq
        for i in range(self.stat.ideal_hashes):
            idx = self._indices(sub, i)
            byte_idx = (idx >> np.uint64(3)).astype(np.int64)
            spot = (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
            hit = (self.vector[byte_idx] & spot) != 0
            alive = alive[hit]
            if alive.size == 0:
                break
            sub = uniq[alive]
        else:
            out[alive] = True
        return out

    # -- merge -------------------------------------------------------
    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """Associative combine: bitwise OR of bit arrays.

        Requires identical geometry (same m, k, k_mer).  ``inserts``
        becomes an upper bound after merge (novelty across partials is
        unknowable without the exact set) — summed, like the
        reference's MPI counter gather (facs/mpi_bloom.c:206-247).
        """
        if (self.stat.elements, self.stat.ideal_hashes, self.k_mer) != (
                other.stat.elements, other.stat.ideal_hashes, other.k_mer):
            raise ValueError("cannot merge Bloom filters with different geometry")
        merged = BloomFilter(stat=self.stat, k_mer=self.k_mer,
                             inserts=self.inserts + other.inserts,
                             vector=np.bitwise_or(self.vector, other.vector))
        return merged

    # -- io ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        hdr = _STAT.pack(self.stat.elements, self.stat.ideal_hashes,
                         self.stat.capacity, self.stat.e, self.k_mer,
                         self.inserts)
        return frame(_MAGIC, _VERSION, hdr + self.vector.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        _, payload = unframe(_MAGIC, blob)
        m, k, cap, e, k_mer, inserts = _STAT.unpack_from(payload)
        vec = np.frombuffer(payload, dtype=np.uint8, offset=_STAT.size).copy()
        return cls(stat=BloomStat(m, k, cap, e), k_mer=k_mer,
                   inserts=inserts, vector=vec)

    # -- reference binary-format interop -------------------------------
    # The reference dumps its in-memory struct verbatim: two pointer
    # fields (garbage on disk), inserts u64, bloomstat {elements u64,
    # ideal_hashes i32 + 4 pad, capacity u64, e f64}, k_mer i32, dx
    # i32, mcf f32 + 4 tail pad = 72 bytes on LP64, then the bit
    # vector of (elements>>3)+1 bytes (facs/bloom.c:217-287 write,
    # :289-337 read; struct at facs/bloom.h:42-59).  The bit layout
    # and hashing already match bit-exactly, so interop is pure header
    # translation.
    _FACS_HEADER = struct.Struct("<8x8xQQi4xQdiif4x")

    @classmethod
    def from_facs_bytes(cls, blob: bytes) -> "BloomFilter":
        """Load a filter written by the reference's ``save_bloom``."""
        hdr = cls._FACS_HEADER
        if len(blob) < hdr.size:
            raise ValueError("not a facs .bloom file: too short")
        inserts, elements, k, capacity, e, k_mer, _dx, _mcf = \
            hdr.unpack_from(blob)
        nbytes = (elements >> 3) + 1
        if not (0 < elements and 0 < k <= 64
                and len(blob) >= hdr.size + nbytes):
            raise ValueError("not a facs .bloom file: implausible header")
        if k > len(FACS_SEEDS):
            # the reference's get_rec has no clamp and its bloom_hash
            # would read past seed[20] for such files (undefined
            # behavior we cannot — and should not — reproduce)
            raise ValueError(
                f"facs .bloom file uses {k} hash functions; only "
                f"{len(FACS_SEEDS)} salt seeds exist (the reference "
                f"reads out of bounds for k>20 — unsupported)")
        vec = np.frombuffer(blob, dtype=np.uint8, count=nbytes,
                            offset=hdr.size).copy()
        return cls(stat=BloomStat(elements, k, capacity, e),
                   k_mer=k_mer, inserts=inserts, vector=vec)

    def to_facs_bytes(self) -> bytes:
        """Serialize in the reference's raw-struct layout (pointers
        zeroed; dx = k_mer², mcf = the reference's load-time default 0
        — it recomputes mcf from the CLI tolerance).  The trailing
        ``4·(ideal_hashes+1)`` zero bytes mirror the reference's
        ftruncate size (facs/bloom.c:238) so files byte-count-match."""
        hdr = self._FACS_HEADER.pack(
            self.inserts, self.stat.elements, self.stat.ideal_hashes,
            self.stat.capacity, self.stat.e, self.k_mer,
            self.k_mer * self.k_mer, 0.0)
        tail = b"\x00" * (4 * (self.stat.ideal_hashes + 1))
        return hdr + self.vector.tobytes() + tail

    @classmethod
    def from_any_bytes(cls, blob: bytes) -> "BloomFilter":
        """Auto-detect this engine's framed format vs the reference's
        raw-struct dump (the latter starts with a disk-meaningless
        pointer, so the 4-byte magic disambiguates)."""
        if blob[:4] == _MAGIC:
            return cls.from_bytes(blob)
        return cls.from_facs_bytes(blob)

    # -- banked serialization ------------------------------------------
    def split_banks(self, max_bank_bytes: int = 1 << 30) -> list[bytes]:
        """Serialize as N blobs whose payloads each fit a broadcast cap.

        Oversized filters (the reference handles >4 GB files via
        chunked IO, facs/bloom.c:261-277) ship as multiple broadcast
        values — JVM byte arrays cap at 2 GB, so one giant blob is not
        an option at 10¹²-key capacity.  Bank 0 carries the header;
        banks are plain slices of the bit array (bit semantics
        unchanged).
        """
        hdr = _STAT.pack(self.stat.elements, self.stat.ideal_hashes,
                         self.stat.capacity, self.stat.e, self.k_mer,
                         self.inserts)
        raw = self.vector.tobytes()
        banks = [raw[i:i + max_bank_bytes]
                 for i in range(0, max(len(raw), 1), max_bank_bytes)]
        return [frame(_MAGIC, _VERSION, hdr + struct.pack("<I", len(banks)))
                ] + banks

    @classmethod
    def from_banks(cls, banks: list[bytes]) -> "BloomFilter":
        _, payload = unframe(_MAGIC, banks[0])
        m, k, cap, e, k_mer, inserts = _STAT.unpack_from(payload)
        (n_banks,) = struct.unpack_from("<I", payload, _STAT.size)
        if n_banks != len(banks) - 1:
            raise ValueError("bank count mismatch")
        vec = np.frombuffer(b"".join(banks[1:]), dtype=np.uint8).copy()
        return cls(stat=BloomStat(m, k, cap, e), k_mer=k_mer,
                   inserts=inserts, vector=vec)

    # -- stats -------------------------------------------------------
    @property
    def expected_fpr(self) -> float:
        """(1 - e^{-kn/m})^k with n = inserts (published bound)."""
        return bloom_fpr(self.stat.elements, self.stat.ideal_hashes, self.inserts)

    @property
    def bits_set(self) -> int:
        """Popcount of the bit array (every index is taken mod the
        prime m ≤ 8·len(vector), so trailing pad bits are never set)."""
        return int(_POPCOUNT[self.vector].sum())

    def estimate_cardinality(self) -> float:
        """Swamidass & Baldi (2007) fill-ratio cardinality estimate:
        n̂ = −(m/k)·ln(1 − X/m) with X = bits set.

        ``inserts`` is exact for a single-pass build but only an
        UPPER BOUND after ``merge`` (novelty across partials is
        unknowable from OR-ed bits — the docstring contract above);
        the fill ratio is a pure function of the bit ARRAY, so this
        estimate is identical under any merge tree — the
        distinct-count companion every OR-merged filter needs.
        A saturated filter (X == m) returns +inf: beyond capacity the
        array carries no cardinality information.
        """
        m = float(self.stat.elements)
        x = float(self.bits_set)
        if x >= m:
            return float("inf")
        return -(m / self.stat.ideal_hashes) * float(np.log1p(-x / m))

    def cardinality_sd(self) -> float:
        """Delta-method standard deviation of ``estimate_cardinality``:
        X ≈ Binomial(m, q) ⇒ SD(n̂) ≈ (m/k)·sqrt(m·q·(1−q))/(m−X),
        q = X/m (Swamidass & Baldi 2007 §2; the independence
        approximation slightly OVERstates the variance, so gates built
        on this SD are conservative).  +inf when saturated."""
        m = float(self.stat.elements)
        x = float(self.bits_set)
        if x >= m:
            return float("inf")
        q = x / m
        return (m / self.stat.ideal_hashes) * np.sqrt(m * q * (1 - q)) / (m - x)

    def info(self) -> dict:
        """Filter metadata (the reference's `facs info`, facs/info.c:13-33)."""
        return {
            "elements": self.stat.elements,
            "ideal_hashes": self.stat.ideal_hashes,
            "capacity": self.stat.capacity,
            "error_rate": self.stat.e,
            "k_mer": self.k_mer,
            "inserts": self.inserts,
            "bytes": int(self.vector.nbytes),
            "expected_fpr": self.expected_fpr,
            "bits_set": self.bits_set,
            "estimated_distinct": self.estimate_cardinality(),
        }

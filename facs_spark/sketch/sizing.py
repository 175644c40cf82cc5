"""Bloom-filter sizing and pipeline-default suggestion math.

Reproduces the reference's sizing semantics (``facs/suggestions.c``):

* ``k = log(e)/log(0.5) = -log2(e)`` and
  ``m = next_prime(13·n·k/9)`` then ``k = 9m/(13n)`` recomputed with
  the actual prime m (``facs/suggestions.c:109-120``).  13/9 ≈ 1/ln 2,
  so this is the classic ``m ≈ n·k/ln2`` with integer math.
* the standard real-valued formulas ``m = -n·ln p/(ln 2)²``,
  ``k = (m/n)·ln 2`` (named by the north star) as an alternative.
* k-gram-size / match-cutoff / random-hit-probability suggestion
  tables (``facs/suggestions.c:21-82``).

``find_close_prime`` keeps the reference's "next odd prime ≥ m"
contract (``facs/suggestions.c:93-103``) with a correct primality
test (the reference's ``is_prime`` stride-8 loop at
``facs/suggestions.c:122-137`` can mis-certify; we keep the contract,
not the bug).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

MB = 1_048_576


def is_prime(m: int) -> bool:
    if m < 2:
        return False
    if m % 2 == 0:
        return m == 2
    f = 3
    while f * f <= m:
        if m % f == 0:
            return False
        f += 2
    return True


def find_close_prime(m: int) -> int:
    """Next prime ≥ m, searching odd numbers (facs/suggestions.c:93-103)."""
    if m % 2 == 0:
        m += 1
    while not is_prime(m):
        m += 2
    return m


@dataclass(frozen=True)
class BloomStat:
    """Sketch statistics (the reference's ``bl_stat``, facs/bloom.h:42-48)."""

    elements: int       # m: bit-array size (prime)
    ideal_hashes: int   # k: number of hash functions (≤ 20 seeds)
    capacity: int       # n: expected insert count
    e: float            # target false-positive rate


def facs_sizing(capacity: int, error_rate: float) -> BloomStat:
    """Integer 13/9 sizing with prime m (facs/suggestions.c:84-120)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if not (0.0 < error_rate < 1.0):
        raise ValueError("error_rate must be in (0, 1)")
    # the reference truncates log(e) BEFORE dividing — the C cast in
    # `(int) log (stat->e) / log (0.5)` binds to log(e) only
    # (facs/suggestions.c:112), so e.g. e=0.01 gives k=5, not 6
    k = int(math.trunc(math.log(error_rate)) / math.log(0.5))
    k = max(1, k)  # e ≥ 1/e truncates to 0 hashes; floor at 1
    m = find_close_prime(13 * capacity * k // 9)
    k = 9 * m // (13 * capacity)
    k = max(1, min(k, 20))  # 20 salt seeds available (facs/bloom.c:25)
    return BloomStat(elements=m, ideal_hashes=k, capacity=capacity, e=error_rate)


def standard_sizing(capacity: int, error_rate: float, prime: bool = True) -> BloomStat:
    """Classic m = -n·ln p/(ln 2)², k = (m/n)·ln 2 (north-star formulas)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if not (0.0 < error_rate < 1.0):
        raise ValueError("error_rate must be in (0, 1)")
    m = int(math.ceil(-capacity * math.log(error_rate) / (math.log(2) ** 2)))
    if prime:
        m = find_close_prime(m)
    k = max(1, min(int(round(m / capacity * math.log(2))), 20))
    return BloomStat(elements=m, ideal_hashes=k, capacity=capacity, e=error_rate)


def bloom_fpr(m: int, k: int, n: int) -> float:
    """Published Bloom false-positive bound (1 - e^{-kn/m})^k."""
    if n == 0:
        return 0.0
    return (1.0 - math.exp(-k * n / m)) ** k


def kmer_suggestion(size_bytes: int) -> int:
    """k-gram length by input size (facs/suggestions.c:35-61)."""
    for cap, k in ((10 * MB, 15), (20 * MB, 16), (50 * MB, 17),
                   (100 * MB, 18), (500 * MB, 19)):
        if size_bytes < cap:
            return k
    return 20


def mco_suggestion(k_mer: int) -> float:
    """Default match cutoff (tole_rate) by k (facs/suggestions.c:63-82)."""
    return {15: 0.4, 16: 0.3, 17: 0.3, 18: 0.3, 19: 0.4, 20: 0.3}.get(k_mer, 0.4)


def prob_suggestion(k_mer: int) -> float:
    """Empirical per-window random-hit probability (facs/suggestions.c:21-33)."""
    if k_mer <= 12:
        return 0.51038
    if k_mer <= 15:
        return 0.05569
    if k_mer <= 18:
        return 0.00636
    return 0.001057

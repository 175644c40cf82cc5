"""Moments sketch (sketch/moments.py): exact-int merge invariance,
maxent quantile rank accuracy, float fallback, wire roundtrip."""

import math

import numpy as np
import pytest

from facs_spark.sketch.moments import MomentsSketch


def test_int_sums_exact_and_merge_invariant():
    rng = np.random.default_rng(2)
    vals = rng.integers(1, 100_000, 40_000).astype(np.int64)
    one = MomentsSketch()
    one.update_batch(vals)
    # exact python-int ground truth
    want = [int(sum(int(v) ** p for v in vals)) for p in (1, 2, 3, 4)]
    assert one.sums == want
    # any partitioning -> identical state
    acc = MomentsSketch()
    for part in np.array_split(vals, 11):
        s = MomentsSketch()
        s.update_batch(part)
        acc = acc.merge(s)
    assert acc.sums == one.sums
    assert (acc.n, acc.mn, acc.mx) == (one.n, one.mn, one.mx)


def test_large_values_no_overflow():
    # x^4 = 1e24 >> int64: the object-space chunk path must engage
    vals = np.full(1000, 1_000_000, dtype=np.int64)
    ms = MomentsSketch()
    ms.update_batch(vals)
    assert ms.sums[3] == 1000 * 10 ** 24
    # the former silent-wrap band: 100k elements of x in (3100, 8192]
    # summed x^4 past 2^63 while the old 2^13 threshold kept the
    # int64 path — regression-pin the exact sum
    band = np.full(100_000, 5000, dtype=np.int64)
    ms2 = MomentsSketch()
    ms2.update_batch(band)
    assert ms2.sums[3] == 100_000 * 5000 ** 4
    # large-magnitude NEGATIVE ints must also engage the object path:
    # the old guard checked only c.max(), so -5000s wrapped s2/s4
    # (ADVICE r6)
    neg = np.full(100_000, -5000, dtype=np.int64)
    ms3 = MomentsSketch()
    ms3.update_batch(neg)
    assert ms3.sums[1] == 100_000 * 5000 ** 2
    assert ms3.sums[3] == 100_000 * 5000 ** 4
    assert ms3.sums[0] == -100_000 * 5000
    assert ms3.sums[2] == -100_000 * 5000 ** 3


def test_maxent_quantile_rank_error():
    rng = np.random.default_rng(9)
    for dist in (rng.normal(300, 80, 30_000),
                 rng.lognormal(5.5, 0.5, 30_000)):
        vals = np.clip(dist, 1, None).astype(np.int64)
        ms = MomentsSketch()
        ms.update_batch(vals)
        sv = np.sort(vals)
        for q in (0.25, 0.5, 0.75, 0.9):
            est = ms.quantile(q)
            rank = np.searchsorted(sv, est) / sv.size
            assert abs(rank - q) <= 0.08, (q, est, rank)


def test_float_fallback_and_empty():
    ms = MomentsSketch()
    assert math.isnan(ms.quantile(0.5))
    ms.update_batch(np.array([1.5, 2.5, np.nan, 3.5]))
    assert ms.n == 3
    assert abs(ms.sums[0] - 7.5) < 1e-12


def test_degenerate_single_value():
    ms = MomentsSketch()
    ms.update_batch(np.full(100, 42, dtype=np.int64))
    assert ms.quantile(0.5) == 42.0


def test_wire_roundtrip_bigints():
    ms = MomentsSketch()
    ms.update_batch(np.full(10, 1_000_000, dtype=np.int64))
    back = MomentsSketch.from_bytes(ms.to_bytes())
    assert back.sums == ms.sums and back.n == ms.n
    assert isinstance(back.sums[3], int)
    from facs_spark.sketch import sketch_from_bytes
    assert isinstance(sketch_from_bytes(ms.to_bytes()), MomentsSketch)

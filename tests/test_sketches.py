"""Sketch-core property tests: no false negatives, FPR ≤ bound, merge
associativity/commutativity, serialization round-trips, estimates
within published error bounds (SURVEY.md §5 test plan)."""

import math

import numpy as np
import pytest

from facs_spark.sketch import (BloomFilter, CountMinSketch, HyperLogLog, KLL,
                               TDigest, facs_sizing, find_close_prime,
                               is_prime, sketch_from_bytes, standard_sizing)

rng = np.random.default_rng(7)


def _keys(n, length=15, seed=0):
    r = np.random.default_rng(seed)
    return r.integers(97, 123, size=(n, length), dtype=np.uint8)  # a-z


# ---------------------------------------------------------------- sizing
def test_sizing_prime_and_formulas():
    st = facs_sizing(10000, 0.0005)
    assert is_prime(st.elements)
    assert st.ideal_hashes >= 1
    # 13/9 ≈ 1/ln2: m within a few % of n*k/ln2
    approx = 13 * 10000 * int(-math.log2(0.0005)) // 9
    assert st.elements >= approx
    std = standard_sizing(10000, 0.0005)
    ideal = -10000 * math.log(0.0005) / math.log(2) ** 2
    assert abs(std.elements - ideal) < ideal * 0.01 + 100


def test_find_close_prime():
    assert find_close_prime(90) == 97
    assert find_close_prime(97) == 97
    assert find_close_prime(100) == 101


# ---------------------------------------------------------------- bloom
def test_bloom_no_false_negatives_and_fpr():
    keys = np.unique(_keys(5000, seed=1), axis=0)
    probe = np.unique(_keys(20000, seed=2), axis=0)
    member = set(map(bytes, keys))
    mask = np.array([bytes(r) not in member for r in probe])
    # facs sizing reproduces the reference's truncation quirk
    # (facs/suggestions.c:112): at e=0.001 it seeds k=8 so the real
    # FPR is ≈0.5^8 ≈ 4e-3 — above the nominal e.  The honest gate is
    # the analytic bound for the ACTUAL geometry, (1-e^{-kn/m})^k.
    bf = BloomFilter.create(capacity=keys.shape[0], error_rate=0.001, k_mer=15)
    bf.add_batch(keys)
    assert bf.contains_batch(keys).all(), "Bloom must never false-negative"
    fp = bf.contains_batch(probe[mask]).mean()
    assert fp <= 3 * bf.expected_fpr + 1e-9, \
        f"observed FPR {fp} above geometry bound {bf.expected_fpr}"
    # the standard -n·ln p/(ln2)² sizing must meet the nominal e
    bs = BloomFilter.create(capacity=keys.shape[0], error_rate=0.001,
                            k_mer=15, sizing="standard")
    bs.add_batch(keys)
    assert bs.contains_batch(keys).all()
    fps = bs.contains_batch(probe[mask]).mean()
    assert fps <= 3 * 0.001 + 1e-9, f"standard-sizing FPR {fps} above bound"


def test_bloom_inserts_counts_novel_only():
    keys = np.unique(_keys(100, seed=3), axis=0)
    bf = BloomFilter.create(capacity=1000, error_rate=0.001, k_mer=15)
    bf.add_batch(keys)
    first = bf.inserts
    assert first > 0
    bf.add_batch(keys)  # re-adding: nothing novel
    assert bf.inserts == first


def test_bloom_merge_equals_single_build():
    keys = np.unique(_keys(4000, seed=4), axis=0)
    whole = BloomFilter.create(capacity=5000, error_rate=0.001, k_mer=15)
    whole.add_batch(keys)
    parts = []
    for chunk in np.array_split(keys, 7):
        p = BloomFilter.create(capacity=5000, error_rate=0.001, k_mer=15)
        p.add_batch(chunk)
        parts.append(p)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert (merged.vector == whole.vector).all(), "merge must equal one-pass build"
    # associativity: ((a|b)|c) == (a|(b|c))
    left = parts[0].merge(parts[1]).merge(parts[2])
    right = parts[0].merge(parts[1].merge(parts[2]))
    assert (left.vector == right.vector).all()


def test_bloom_cardinality_estimate_within_sd_band():
    """Swamidass-Baldi fill-ratio estimate lands within 5 delta-method
    SDs of the true distinct count across fill levels, and the SD is
    itself small (sub-percent at half fill)."""
    for n, cap, seed in ((2000, 10000, 1), (30000, 40000, 2),
                         (50000, 50000, 3)):
        keys = np.unique(_keys(n + 500, seed=seed), axis=0)[:n]
        bf = BloomFilter.create(capacity=cap, error_rate=0.001, k_mer=15)
        bf.add_batch(keys)
        est, sd = bf.estimate_cardinality(), bf.cardinality_sd()
        assert abs(est - n) <= 5 * sd + 2, (n, est, sd)
        assert sd <= 0.01 * n + 30, (n, sd)


def test_bloom_cardinality_corrects_merged_inserts_overcount():
    """After an OR-merge of overlapping partials, `inserts` is a
    documented upper bound; the fill-ratio estimate recovers the TRUE
    distinct union (within the SD band) from the merged bits alone —
    and is bit-identical to the single-pass build's estimate."""
    keys = np.unique(_keys(30000, seed=6), axis=0)
    a, b = keys[:20000], keys[8000:]          # 12k-key overlap
    fa = BloomFilter.create(capacity=40000, error_rate=0.001, k_mer=15)
    fb = BloomFilter.create(capacity=40000, error_rate=0.001, k_mer=15)
    fa.add_batch(a), fb.add_batch(b)
    merged = fa.merge(fb)
    true_union = len(keys)
    assert merged.inserts == len(a) + len(b) > true_union
    est, sd = merged.estimate_cardinality(), merged.cardinality_sd()
    assert abs(est - true_union) <= 5 * sd + 2
    whole = BloomFilter.create(capacity=40000, error_rate=0.001, k_mer=15)
    whole.add_batch(keys)
    assert est == whole.estimate_cardinality()


def test_bloom_cardinality_saturation_and_empty():
    bf = BloomFilter.create(capacity=100, error_rate=0.5, k_mer=15)
    assert bf.bits_set == 0 and bf.estimate_cardinality() == 0.0
    bf.vector[:] = 0xFF                      # saturate every byte
    assert math.isinf(bf.estimate_cardinality())
    assert math.isinf(bf.cardinality_sd())


def test_bloom_serialization_roundtrip():
    keys = _keys(500, seed=5)
    bf = BloomFilter.create(capacity=1000, error_rate=0.01, k_mer=15)
    bf.add_batch(keys)
    bf2 = sketch_from_bytes(bf.to_bytes())
    assert (bf2.vector == bf.vector).all()
    assert bf2.stat == bf.stat and bf2.inserts == bf.inserts
    assert bf2.contains_batch(keys).all()


def test_facs_bloom_binary_interop(tmp_path):
    """The reference's raw C-struct .bloom layout loads and answers
    identically; export reproduces the reference's file size
    (header 72 B + m/8+1 vector + ftruncate tail, facs/bloom.c:217-337)."""
    import struct

    keys = _keys(500, seed=6)
    bf = BloomFilter.create(capacity=1000, error_rate=0.01, k_mer=15)
    bf.add_batch(keys)
    blob = bf.to_facs_bytes()
    expect = (72 + (bf.stat.elements >> 3) + 1
              + 4 * (bf.stat.ideal_hashes + 1))
    assert len(blob) == expect
    back = BloomFilter.from_facs_bytes(blob)
    assert (back.vector == bf.vector).all()
    assert back.stat == bf.stat and back.inserts == bf.inserts
    assert back.k_mer == bf.k_mer
    assert (back.contains_batch(keys) == bf.contains_batch(keys)).all()

    # synthesize a file exactly as the reference's save_bloom lays it
    # out (garbage pointers up front) and load it via the api path
    raw = (struct.pack("<QQ", 0xDEADBEEF, 0xCAFEBABE)  # pointer garbage
           + struct.pack("<QQi4xQdiif4x", bf.inserts, bf.stat.elements,
                         bf.stat.ideal_hashes, bf.stat.capacity,
                         bf.stat.e, bf.k_mer, bf.k_mer ** 2, 0.4)
           + bf.vector.tobytes())
    p = tmp_path / "ref_style.bloom"
    p.write_bytes(raw)
    import facs_spark.api as facs
    loaded = facs._load_bloom(str(p))
    assert (loaded.vector == bf.vector).all()
    assert loaded.contains_batch(keys).all()
    # framed files still auto-detect through the same loader
    p2 = tmp_path / "framed.bloom"
    p2.write_bytes(bf.to_bytes())
    assert (facs._load_bloom(str(p2)).vector == bf.vector).all()

    # a reference file with k>20 (its get_rec has no clamp; bloom_hash
    # reads past seed[20] — undefined behavior) must fail LOUDLY at
    # load, not IndexError inside an executor task later
    bad = (struct.pack("<QQ", 0, 0)
           + struct.pack("<QQi4xQdiif4x", 10, bf.stat.elements, 23,
                         1000, 1e-7, 15, 225, 0.4)
           + bf.vector.tobytes())
    with pytest.raises(ValueError, match="salt seeds"):
        BloomFilter.from_facs_bytes(bad)


# ---------------------------------------------------------------- HLL
def test_hll_within_published_bound():
    for true_n in (100, 5000, 200_000):
        h = HyperLogLog(p=14)
        h.update_batch(np.arange(true_n, dtype=np.int64))
        est = h.estimate()
        rel = abs(est - true_n) / true_n
        assert rel <= 4 * h.relative_error, f"n={true_n}: rel err {rel}"


def test_hll_merge_equals_single_and_associative():
    vals = np.arange(50_000, dtype=np.int64)
    whole = HyperLogLog(p=12)
    whole.update_batch(vals)
    parts = []
    for chunk in np.array_split(vals, 5):
        p = HyperLogLog(p=12)
        p.update_batch(chunk)
        parts.append(p)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert (merged.registers == whole.registers).all()
    l = parts[0].merge(parts[1]).merge(parts[2])
    r = parts[0].merge(parts[1].merge(parts[2]))
    assert (l.registers == r.registers).all()


def test_hll_strings_and_roundtrip():
    h = HyperLogLog(p=12)
    h.update_batch([f"https://host{i}.example/{i}" for i in range(3000)])
    h2 = sketch_from_bytes(h.to_bytes())
    assert h2.estimate() == h.estimate()
    assert abs(h.estimate() - 3000) / 3000 < 4 * h.relative_error


# ---------------------------------------------------------------- CMS
def test_cms_overcount_only_and_bound():
    r = np.random.default_rng(11)
    keys = r.zipf(1.5, size=50_000).astype(np.int64)
    cms = CountMinSketch(epsilon=0.001, delta=0.01)
    cms.update_batch(keys)
    uniq, exact = np.unique(keys, return_counts=True)
    est = cms.query_batch(uniq)
    assert (est >= exact).all(), "CMS must never undercount"
    within = (est - exact <= cms.error_bound)
    assert within.mean() >= 0.99, "CMS additive error bound violated"


def test_cms_merge_equals_single():
    keys = np.arange(10_000, dtype=np.int64) % 97
    whole = CountMinSketch(epsilon=0.01, delta=0.05)
    whole.update_batch(keys)
    a = CountMinSketch(epsilon=0.01, delta=0.05)
    b = CountMinSketch(epsilon=0.01, delta=0.05)
    a.update_batch(keys[:4000])
    b.update_batch(keys[4000:])
    merged = a.merge(b)
    assert (merged.table == whole.table).all()
    assert merged.total == whole.total
    m2 = sketch_from_bytes(merged.to_bytes())
    assert (m2.table == merged.table).all()


# ---------------------------------------------------------------- t-digest
def test_tdigest_quantiles_within_bound():
    r = np.random.default_rng(13)
    vals = r.lognormal(3.0, 1.0, size=100_000)
    td = TDigest(delta=200)
    for chunk in np.array_split(vals, 10):
        td.update_batch(chunk)
    svals = np.sort(vals)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = td.quantile(q)
        true_rank = np.searchsorted(svals, est) / svals.size
        assert abs(true_rank - q) <= 0.01, f"q={q}: rank err {abs(true_rank-q)}"


def test_tdigest_merge_bounded_drift():
    r = np.random.default_rng(17)
    vals = r.normal(0, 1, size=60_000)
    parts = []
    for chunk in np.array_split(vals, 8):
        t = TDigest(delta=200)
        t.update_batch(chunk)
        parts.append(t)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    svals = np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        true_rank = np.searchsorted(svals, est) / svals.size
        assert abs(true_rank - q) <= 0.015
    m2 = sketch_from_bytes(merged.to_bytes())
    assert m2.quantile(0.5) == merged.quantile(0.5)


# ---------------------------------------------------------------- KLL
def test_kll_rank_error_within_bound():
    r = np.random.default_rng(19)
    vals = r.exponential(5.0, size=80_000)
    kll = KLL(k=200)
    for chunk in np.array_split(vals, 6):
        kll.update_batch(chunk)
    assert kll.n == vals.size
    svals = np.sort(vals)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = kll.quantile(q)
        true_rank = np.searchsorted(svals, est) / svals.size
        assert abs(true_rank - q) <= kll.rank_error, f"q={q}"


def test_kll_merge_and_roundtrip():
    r = np.random.default_rng(23)
    vals = r.uniform(0, 100, size=40_000)
    parts = []
    for chunk in np.array_split(vals, 4):
        s = KLL(k=200)
        s.update_batch(chunk)
        parts.append(s)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert merged.n == vals.size
    svals = np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        true_rank = np.searchsorted(svals, est) / svals.size
        assert abs(true_rank - q) <= merged.rank_error
    m2 = sketch_from_bytes(merged.to_bytes())
    assert m2.quantile(0.5) == merged.quantile(0.5)
    assert m2.n == merged.n


def test_merge_repartition_invariance_property():
    """Sketch(A∪B) bounds hold for ANY random partitioning (north rule)."""
    r = np.random.default_rng(29)
    vals = r.normal(50, 10, size=30_000)
    svals = np.sort(vals)
    for trial in range(3):
        perm = np.random.default_rng(100 + trial).permutation(vals.size)
        shuffled = vals[perm]
        n_parts = [2, 5, 9][trial]
        kll = None
        td = None
        for chunk in np.array_split(shuffled, n_parts):
            s = KLL(k=200)
            s.update_batch(chunk)
            kll = s if kll is None else kll.merge(s)
            t = TDigest(delta=200)
            t.update_batch(chunk)
            td = t if td is None else td.merge(t)
        for q in (0.25, 0.5, 0.75):
            for est in (kll.quantile(q), td.quantile(q)):
                true_rank = np.searchsorted(svals, est) / svals.size
                assert abs(true_rank - q) <= 0.02


def test_hll_sparse_blob_roundtrip_and_size():
    """Low-cardinality HLL blobs serialize sparse (5 B per nonzero
    register, ~100-3000x smaller than dense at p=14) and round-trip
    bit-identically; high-cardinality blobs stay dense; merge through
    either wire format is unchanged."""
    from facs_spark.sketch.hll import HyperLogLog
    small = HyperLogLog(p=14)
    small.update_batch(np.arange(50, dtype=np.int64))
    blob = small.to_bytes()
    assert len(blob) < 600, f"sparse blob {len(blob)} B"  # vs 16 KiB dense
    back = HyperLogLog.from_bytes(blob)
    assert (back.registers == small.registers).all()

    big = HyperLogLog(p=14)
    big.update_batch(np.arange(100_000, dtype=np.int64))
    dense_blob = big.to_bytes()
    assert len(dense_blob) >= (1 << 14), "high cardinality must stay dense"
    assert (HyperLogLog.from_bytes(dense_blob).registers
            == big.registers).all()

    merged = HyperLogLog.from_bytes(blob).merge(
        HyperLogLog.from_bytes(dense_blob))
    direct = small.merge(big)
    assert (merged.registers == direct.registers).all()
    assert abs(merged.estimate() - direct.estimate()) == 0.0


def test_cms_sparse_blob_roundtrip_and_size():
    """Sparse CMS wire format: small-count partials serialize as
    (index, count) pairs instead of the full ~1.1 MB table, round-trip
    bit-identically, and merge across formats unchanged."""
    from facs_spark.sketch.cms import CountMinSketch
    small = CountMinSketch()
    small.update_batch([f"tok{i}" for i in range(200)])
    blob = small.to_bytes()
    dense_size = small.d * small.w * 8
    assert len(blob) < dense_size // 50, (len(blob), dense_size)
    back = CountMinSketch.from_bytes(blob)
    assert (back.table == small.table).all() and back.total == small.total

    big = CountMinSketch()
    big.update_batch([f"t{i % 60000}" for i in range(120_000)])
    bb = big.to_bytes()
    assert (CountMinSketch.from_bytes(bb).table == big.table).all()
    merged = CountMinSketch.from_bytes(blob).merge(
        CountMinSketch.from_bytes(bb))
    direct = small.merge(big)
    assert (merged.table == direct.table).all()
    assert merged.total == direct.total


def test_theta_sketch_estimate_merge_intersection():
    """Theta/KMV: exact below k, within published RSE above, union via
    merge, and DIRECT intersection estimates with the per-call bound —
    the set-operation algebra HLL can't provide."""
    from facs_spark.sketch.theta import ThetaSketch
    from facs_spark.sketch import sketch_from_bytes
    exact = ThetaSketch(k=256)
    exact.update_batch(np.arange(100, dtype=np.int64))
    assert exact.estimate() == 100.0  # exact mode below k

    a = ThetaSketch(k=4096)
    b = ThetaSketch(k=4096)
    a.update_batch(np.arange(0, 60_000, dtype=np.int64))       # |A|=60k
    b.update_batch(np.arange(40_000, 110_000, dtype=np.int64))  # |B|=70k
    rse = a.relative_error
    assert abs(a.estimate() - 60_000) <= 3 * rse * 60_000
    u = a.merge(b)
    assert abs(u.estimate() - 110_000) <= 3 * rse * 110_000
    inter = a.intersect_estimate(b)
    assert abs(inter - 20_000) <= a.d2_bound(b), (inter, a.d2_bound(b))
    # serialization roundtrip via the registry
    back = sketch_from_bytes(u.to_bytes())
    assert back.estimate() == u.estimate()
    assert back.theta == u.theta


def test_theta_merge_partitioning_invariance():
    """Any split of the input into partial sketches must merge to the
    SAME estimates (the mergeable-UDAF contract, like every other
    sketch in the family)."""
    from facs_spark.sketch.theta import ThetaSketch
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1 << 62, size=30_000, dtype=np.int64)
    whole = ThetaSketch(k=1024)
    whole.update_batch(vals)
    for nsplit in (2, 7, 32):
        parts = np.array_split(vals, nsplit)
        merged = None
        for chunk in parts:
            p = ThetaSketch(k=1024)
            if chunk.size:
                p.update_batch(chunk)
            merged = p if merged is None else merged.merge(p)
        assert merged.theta_bits == whole.theta_bits, nsplit
        assert (merged.hashes == whole.hashes).all(), nsplit


def test_theta_via_spark_build(tmp_path):
    """theta works through the generic build_sketch partial+merge
    path like every other kind."""
    from facs_spark.ops.sketch_agg import SketchSpec, build_sketch
    from facs_spark.session import get_spark
    spark = get_spark("theta_test", cpus=4, shuffle_partitions=4)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sk, rows = build_sketch(docs, SketchSpec.make("theta", "doc_id", k=1024))
    exact = docs.select("doc_id").distinct().count()
    assert rows == docs.count()
    assert abs(sk.estimate() - exact) <= max(3 * sk.relative_error * exact, 1)


# ---------------------------------------------------------------- MG
def test_mg_undercount_only_and_bound():
    from facs_spark.sketch import MisraGries
    r = np.random.default_rng(11)
    vals = [f"t{v}" for v in r.zipf(1.25, 100_000)]
    mg = MisraGries(k=128)
    # feed in uneven batches to exercise the amortized decrement
    for lo in range(0, len(vals), 7_919):
        mg.update_batch(vals[lo:lo + 7_919])
    import collections
    exact = collections.Counter(vals)
    assert mg.total == len(vals)
    assert len(mg.counters) <= 128
    bound = len(vals) / 129
    for key, true in exact.most_common(200):
        est = mg.estimate(key)
        assert est <= true                      # undercount only
        assert true - est <= bound              # deterministic MG bound
        if true > bound:
            assert est > 0                      # heavy keys always present


def test_mg_merge_any_order_keeps_bound():
    from facs_spark.sketch import MisraGries
    r = np.random.default_rng(12)
    vals = [f"t{v}" for v in r.zipf(1.3, 60_000)]
    import collections
    exact = collections.Counter(vals)
    parts = [vals[i::5] for i in range(5)]
    sks = []
    for p in parts:
        s = MisraGries(k=96)
        s.update_batch(p)
        sks.append(s)
    # two different merge trees — the bound must hold for both
    left = sks[0]
    for s in sks[1:]:
        left = left.merge(s)
    paired = sks
    while len(paired) > 1:
        paired = [paired[i].merge(paired[i + 1]) if i + 1 < len(paired)
                  else paired[i] for i in range(0, len(paired), 2)]
    bound = len(vals) / 97
    for m in (left, paired[0]):
        assert m.total == len(vals)
        assert len(m.counters) <= 96
        for key, true in exact.most_common(100):
            est = m.estimate(key)
            assert est <= true and true - est <= bound


def test_mg_roundtrip_and_int_keys():
    from facs_spark.sketch import MisraGries
    mg = MisraGries(k=16)
    mg.update_batch(np.array([1, 1, 2, 3, 1, 2], dtype=np.int64))
    mg.update_batch(["a", "a", "b"])
    back = sketch_from_bytes(mg.to_bytes())
    assert back.counters == mg.counters
    assert back.total == mg.total == 9
    assert back.estimate(1) == 3 and back.estimate("a") == 2
    hh = mg.heavy_hitters(threshold=1)
    assert ("a", 2) in hh and (1, 3) in hh


# ---------------------------------------------------------------- FD
def test_fd_spectral_bound_and_merge():
    from facs_spark.sketch import FrequentDirections
    r = np.random.default_rng(13)
    # decaying spectrum (realistic embeddings)
    a = r.standard_normal((4000, 48)) @ np.diag(np.linspace(2.5, 0.05, 48))
    gram = a.T @ a
    frob2 = float((a ** 2).sum())
    fd = FrequentDirections(l=12, d=48)
    fd.update_batch(a)
    assert abs(fd.frob2 - frob2) <= 1e-6 * frob2
    assert fd.n_rows == 4000
    err = np.linalg.norm(gram - fd.gram(), 2)
    assert err <= frob2 / 12
    # merged across chunks, pairwise tree — same published bound
    sks = []
    for c in np.array_split(a, 7):
        s = FrequentDirections(l=12, d=48)
        s.update_batch(c)
        sks.append(s)
    while len(sks) > 1:
        sks = [sks[i].merge(sks[i + 1]) if i + 1 < len(sks) else sks[i]
               for i in range(0, len(sks), 2)]
    m = sks[0]
    assert m.n_rows == 4000 and abs(m.frob2 - frob2) <= 1e-6 * frob2
    assert np.linalg.norm(gram - m.gram(), 2) <= frob2 / 12


def test_fd_flat_spectrum_worst_case():
    # flat spectra are FD's adversarial input; the deterministic
    # theorem must still hold (merged and single-pass)
    from facs_spark.sketch import FrequentDirections
    r = np.random.default_rng(14)
    a = r.standard_normal((3000, 32))
    gram = a.T @ a
    frob2 = float((a ** 2).sum())
    one = FrequentDirections(l=8, d=32)
    one.update_batch(a)
    assert np.linalg.norm(gram - one.gram(), 2) <= frob2 / 8
    sks = []
    for c in np.array_split(a, 9):
        s = FrequentDirections(l=8, d=32)
        s.update_batch(c)
        sks.append(s)
    m = sks[0]
    for s in sks[1:]:
        m = m.merge(s)
    assert np.linalg.norm(gram - m.gram(), 2) <= frob2 / 8


def test_fd_psd_underestimate_and_roundtrip():
    from facs_spark.sketch import FrequentDirections
    r = np.random.default_rng(15)
    a = r.standard_normal((500, 16))
    fd = FrequentDirections(l=6, d=16)
    fd.update_batch(a)
    gram = a.T @ a
    # A^T A - B^T B is PSD: the sketch never overestimates mass along
    # any direction (Ghashami et al. 2016, property (i))
    evs = np.linalg.eigvalsh(gram - fd.gram())
    assert evs.min() >= -1e-8 * max(1.0, evs.max())
    back = sketch_from_bytes(fd.to_bytes())
    assert back.n_rows == fd.n_rows
    assert abs(back.frob2 - fd.frob2) < 1e-12
    # wire blob carries at most l rows
    assert back.fill <= 6
    assert np.allclose(back.gram(), fd.gram())
    # exact when rank <= l: low-rank input reproduces its Gram exactly
    low = a[:, :3] @ r.standard_normal((3, 16))
    fd2 = FrequentDirections(l=6, d=16)
    fd2.update_batch(low)
    assert np.allclose(fd2.gram(), low.T @ low, atol=1e-6)


# --------------------------------------------------------------- AMS
def test_ams_bound_and_linearity():
    from facs_spark.sketch import AmsF2
    r = np.random.default_rng(16)
    freqs = np.minimum(r.zipf(1.4, 8_000), 1_000).astype(np.int64)
    items = np.repeat(np.arange(freqs.size, dtype=np.int64), freqs)
    r.shuffle(items)
    f2 = float((freqs.astype(np.float64) ** 2).sum())
    a = AmsF2(r=5, c=256, seed=42)
    for lo in range(0, items.size, 7_919):
        a.update_batch(items[lo:lo + 7_919])
    assert a.total == items.size
    assert abs(a.estimate() - f2) <= a.error_bound() * f2
    # z is linear: weighted update == repeated update
    b = AmsF2(r=5, c=256, seed=42)
    b.update_batch(np.arange(freqs.size, dtype=np.int64), weights=freqs)
    assert np.array_equal(a.z, b.z) and a.total == b.total


def test_ams_merge_equals_single_pass_any_tree():
    from facs_spark.sketch import AmsF2
    r = np.random.default_rng(17)
    items = r.integers(0, 3_000, size=50_000).astype(np.int64)
    whole = AmsF2(r=4, c=128, seed=7)
    whole.update_batch(items)
    parts = np.array_split(items, 9)
    sks = []
    for p in parts:
        s = AmsF2(r=4, c=128, seed=7)
        s.update_batch(p)
        sks.append(s)
    while len(sks) > 1:  # pairwise tree
        sks = [sks[i].merge(sks[i + 1]) if i + 1 < len(sks) else sks[i]
               for i in range(0, len(sks), 2)]
    assert np.array_equal(sks[0].z, whole.z)
    assert sks[0].total == whole.total
    back = sketch_from_bytes(whole.to_bytes())
    assert np.array_equal(back.z, whole.z)
    assert back.estimate() == whole.estimate()
    import pytest
    with pytest.raises(ValueError):
        whole.merge(AmsF2(r=4, c=128, seed=8))  # different sign hashes


def test_ams_string_and_int_keys_consistent():
    from facs_spark.sketch import AmsF2
    a = AmsF2(r=3, c=64, seed=1)
    a.update_batch(["x", "y", "x", "z"])
    b = AmsF2(r=3, c=64, seed=1)
    b.update_batch(["x", "x"])
    b2 = AmsF2(r=3, c=64, seed=1)
    b2.update_batch(["y", "z"])
    assert np.array_equal(a.z, b.merge(b2).z)


# --------------------------------------------------------------- CBF
def test_cbf_delete_keeps_bloom_contract():
    from facs_spark.sketch import CountingBloom
    keys = np.arange(20_000, dtype=np.int64)
    cbf = CountingBloom.create(capacity=20_000, error_rate=1e-3)
    cbf.add_batch(keys)
    cbf.remove_batch(keys[::2])
    mem = cbf.contains_batch(keys)
    assert mem[1::2].all()              # zero false negatives for kept
    aliens = np.arange(10**6, 10**6 + 20_000, dtype=np.int64)
    fpr = cbf.contains_batch(aliens).mean()
    assert fpr <= 5 * cbf.fpr() + 1e-3  # FPR near the load-factor bound
    assert not cbf.saturated and not cbf.underflowed
    cbf.remove_batch(np.array([10**7], dtype=np.int64))
    assert cbf.underflowed              # bad revoke observable, not silent


def test_cbf_merge_is_saturating_add_and_roundtrips():
    from facs_spark.sketch import CountingBloom
    a = CountingBloom.create(capacity=1_000, error_rate=1e-4)
    b = CountingBloom(m=a.m, k=a.k)
    a.add_batch(np.arange(0, 500, dtype=np.int64))
    b.add_batch(np.arange(500, 1_000, dtype=np.int64))
    whole = CountingBloom(m=a.m, k=a.k)
    whole.add_batch(np.arange(0, 1_000, dtype=np.int64))
    merged = a.merge(b)
    assert np.array_equal(merged.counters, whole.counters)
    assert merged.inserts == whole.inserts == 1_000
    back = sketch_from_bytes(merged.to_bytes())
    assert np.array_equal(back.counters, merged.counters)
    assert back.inserts == merged.inserts
    import pytest
    with pytest.raises(ValueError):
        merged.merge(CountingBloom(m=merged.m + 8, k=merged.k))


def test_cbf_batch_dedup_multiset_insensitive():
    from facs_spark.sketch import CountingBloom
    a = CountingBloom(m=1 << 12, k=4)
    a.add_batch(np.array([5, 5, 5, 9], dtype=np.int64))
    b = CountingBloom(m=1 << 12, k=4)
    b.add_batch(np.array([5, 9], dtype=np.int64))
    assert np.array_equal(a.counters, b.counters)
    a.remove_batch(np.array([5, 5], dtype=np.int64))  # dedup on remove too
    assert not a.contains_batch(np.array([5], dtype=np.int64))[0]
    assert a.contains_batch(np.array([9], dtype=np.int64))[0]
    assert not a.underflowed


def test_ams_inner_product_join_size_bound():
    from facs_spark.sketch import AmsF2
    r = np.random.default_rng(19)
    ka = r.integers(0, 800, 5_000).astype(np.int64)
    kb = r.integers(0, 800, 4_000).astype(np.int64)
    fa = np.bincount(ka, minlength=800)
    fb = np.bincount(kb, minlength=800)
    true = float((fa * fb).sum())
    a = AmsF2(r=5, c=256, seed=9)
    a.update_batch(ka)
    b = AmsF2(r=5, c=256, seed=9)
    b.update_batch(kb)
    assert abs(a.inner_product(b) - true) <= a.inner_product_bound(b)
    # symmetric, and self inner product == F2 estimate path
    assert a.inner_product(b) == b.inner_product(a)
    f2a = float((fa.astype(np.float64) ** 2).sum())
    assert abs(a.inner_product(a) - f2a) <= a.error_bound() * f2a
    import pytest
    with pytest.raises(ValueError):
        a.inner_product(AmsF2(r=5, c=256, seed=10))


def test_theta_difference_exact_estimation_and_identity():
    """a-not-b: exact in exact mode (zero bound), inside the bound in
    estimation mode, and the shared-threshold sample partitions
    EXACTLY into difference + intersection counts (the algebra's
    internal consistency)."""
    from facs_spark.sketch.theta import ThetaSketch

    a = ThetaSketch(k=4096)
    b = ThetaSketch(k=4096)
    a.update_batch([f"x{i}" for i in range(1000)])
    b.update_batch([f"x{i}" for i in range(600, 1600)])
    assert a.difference_estimate(b) == 600.0
    assert a.difference_bound(b) == 0.0
    assert b.difference_estimate(a) == 600.0

    a = ThetaSketch(k=1024)
    b = ThetaSketch(k=1024)
    a.update_batch([f"x{i}" for i in range(100000)])
    b.update_batch([f"x{i}" for i in range(60000, 160000)])
    est, bound = a.difference_estimate(b), a.difference_bound(b)
    assert abs(est - 60000) <= bound, (est, bound)
    th_bits = a._min_theta_bits(b)
    mine = a.hashes[a.hashes < np.uint64(th_bits)]
    d = np.setdiff1d(mine, b.hashes, assume_unique=True).size
    c = np.intersect1d(a.hashes, b.hashes, assume_unique=True)
    c = c[c < np.uint64(th_bits)].size
    assert d + c == mine.size

    # difference against an empty sketch is the full estimate
    empty = ThetaSketch(k=1024)
    assert a.difference_estimate(empty) == a.estimate()


def test_countsketch_unbiased_two_sided_and_bound():
    """Count-Sketch errors run BOTH directions (the property CMS
    cannot have — cms only over-counts) with near-zero mean, and
    every heavy-hitter estimate sits inside the published
    ±sqrt(3·F2/c) bound."""
    from facs_spark.sketch.countsketch import CountSketch

    counts = {f"tok{i}": max(1, 20000 // i) for i in range(1, 2001)}
    items = [k for k, f in counts.items() for _ in range(f)]
    cs = CountSketch(r=7, c=4096, seed=42)
    cs.update_batch(items)

    keys = list(counts)
    est = cs.estimate_batch(keys)
    exact = np.array([counts[k] for k in keys], dtype=np.float64)
    errs = est - exact
    assert (errs < 0).any() and (errs > 0).any()
    assert abs(errs.mean()) < 5.0
    bound = cs.error_bound()
    heavy = [f"tok{i}" for i in (1, 2, 5, 10, 100, 1000)]
    he = cs.estimate_batch(heavy)
    hx = np.array([counts[k] for k in heavy], dtype=np.float64)
    assert (np.abs(he - hx) <= bound).all(), (he, hx, bound)
    # F2 self-estimate within the AMS relative bound at c buckets
    f2 = float((exact ** 2).sum())
    assert abs(cs.f2_estimate() - f2) <= math.sqrt(16.0 / cs.c) * f2


def test_countsketch_merge_equals_single_pass_and_roundtrip():
    """z is linear in the multiset: any partition of the input
    merged in any order equals the single-pass sketch bit-exactly;
    the wire format round-trips the full state."""
    from facs_spark.sketch.countsketch import CountSketch

    items = [f"k{i % 509}" for i in range(30000)]
    single = CountSketch(r=5, c=1024, seed=9)
    single.update_batch(items)

    parts = [items[i::7] for i in range(7)]
    sks = []
    for p in parts:
        s = CountSketch(r=5, c=1024, seed=9)
        s.update_batch(p)
        sks.append(s)
    # right-fold in reversed order — different tree than left-fold
    acc = sks[-1]
    for s in reversed(sks[:-1]):
        acc = s.merge(acc)
    assert np.array_equal(acc.z, single.z)
    assert acc.total == single.total

    rt = CountSketch.from_bytes(single.to_bytes())
    assert np.array_equal(rt.z, single.z)
    assert (rt.r, rt.c, rt.seed, rt.total) == \
        (single.r, single.c, single.seed, single.total)

    import pytest
    with pytest.raises(ValueError):
        single.merge(CountSketch(r=5, c=2048, seed=9))
    with pytest.raises(ValueError):
        CountSketch(r=3, c=1000)  # not a power of two


def test_dgim_bound_holds_and_exact_when_unstraddled():
    """DGIM's per-query bound is DETERMINISTIC: against a brute-force
    ring buffer on a random bit stream, every estimate is within its
    own reported abs_bound, exact whenever the bound is 0, within
    1/(r-1) relative once the window is saturated, and the bucket
    invariant (≤ r per size) holds throughout."""
    from collections import Counter, deque

    from facs_spark.sketch.dgim import Dgim

    rng = np.random.default_rng(7)
    n, r = 512, 4
    dg = Dgim(n=n, r=r)
    ring = deque(maxlen=n)
    saturated_checked = 0
    for step in range(60):
        bits = (rng.random(rng.integers(1, 200)) < 0.4).astype(np.int64)
        dg.update(bits)
        ring.extend(bits.tolist())
        exact = sum(ring)
        est, bound = dg.query()
        assert abs(est - exact) <= bound, (step, est, exact, bound)
        if bound == 0:
            assert est == exact
        if dg.pos >= n and exact > 0:
            assert abs(est - exact) <= exact / (r - 1) + 1e-9
            saturated_checked += 1
        sizes = Counter(dg.counts)
        assert all(v <= r for v in sizes.values()), sizes
        assert all(c & (c - 1) == 0 for c in dg.counts)
    assert saturated_checked > 20  # the sliding regime was exercised


def test_dgim_state_is_logarithmic_and_roundtrips():
    """Bucket count stays O(r·log n) on a long all-ones stream (the
    worst case) and the wire format round-trips the full state."""
    from facs_spark.sketch.dgim import Dgim

    n, r = 1 << 14, 8
    dg = Dgim(n=n, r=r)
    for _ in range(10):
        dg.update(np.ones(n // 2, dtype=np.int64))
    assert dg.num_buckets <= r * (math.log2(n) + 2)
    est, bound = dg.query()
    assert abs(est - n) <= bound  # window is saturated with ones

    rt = Dgim.from_bytes(dg.to_bytes())
    assert (rt.n, rt.r, rt.pos) == (dg.n, dg.r, dg.pos)
    assert rt.counts == dg.counts
    assert rt.firsts == dg.firsts
    assert rt.lasts == dg.lasts
    assert rt.query() == dg.query()

    import pytest
    with pytest.raises(ValueError):
        Dgim(n=0)
    with pytest.raises(ValueError):
        Dgim(n=8, r=1)


def test_dgim_batch_split_invariance():
    """Folding the same bit stream in different batch splits yields
    the identical structure — the property the streaming state-store
    fold relies on (micro-batch boundaries must not matter)."""
    from facs_spark.sketch.dgim import Dgim

    rng = np.random.default_rng(11)
    bits = (rng.random(5000) < 0.3).astype(np.int64)
    one = Dgim(n=256, r=2)
    one.update(bits)
    split = Dgim(n=256, r=2)
    i = 0
    while i < len(bits):
        j = min(len(bits), i + int(rng.integers(1, 97)))
        split.update(bits[i:j])
        i = j
    assert one.counts == split.counts
    assert one.firsts == split.firsts
    assert one.lasts == split.lasts
    assert one.pos == split.pos


def test_cuckoo_membership_delete_and_fpp():
    """Cuckoo contract: zero false negatives for kept keys, deletion
    actually revokes (no Bloom-style rebuild), observed FPP within
    the published 2b/2^f bound, and a high-load build still inserts
    everything via the kick walk."""
    from facs_spark.sketch.cuckoo import CuckooFilter

    keys = [f"key{i}" for i in range(20000)]
    cf = CuckooFilter.create(len(keys), fbits=16, seed=3)
    cf.add_batch(keys)
    assert cf.contains_batch(keys).all()          # no false negatives
    assert not cf.full
    assert 0.5 < cf.load_factor <= 0.95           # kicks were exercised

    revoked = keys[::5]
    assert cf.remove_batch(revoked).all()         # every removal found
    assert cf.contains_batch(keys[1::5]).all()    # kept keys still in
    # revoked keys are OUT modulo fingerprint collisions with kept
    # keys, bounded by the published FPP
    still = cf.contains_batch(revoked).mean()
    assert still <= 3 * cf.fpp() + 3e-3, still

    other = [f"other{i}" for i in range(20000)]
    fpr = cf.contains_batch(other).mean()
    assert fpr <= 3 * cf.fpp(), (fpr, cf.fpp())
    # f=32 reaches the oracle-exact regime
    cf32 = CuckooFilter.create(2000, fbits=32, seed=3)
    cf32.add_batch(keys[:2000])
    assert cf32.contains_batch(other).sum() == 0


def test_cuckoo_merge_and_roundtrip():
    """Partial-key identity: a merge of per-partition partials
    contains exactly the union (every fingerprint's bucket pair is
    reconstructible from where it sits); the wire format round-trips;
    an undersized merge fails LOUDLY instead of dropping keys."""
    import pytest

    from facs_spark.sketch.cuckoo import CuckooFilter

    keys = [f"doc{i}" for i in range(9000)]
    parts = [keys[i::3] for i in range(3)]
    sks = []
    for p in parts:
        s = CuckooFilter.create(len(keys), fbits=16, seed=7)
        s.add_batch(p)
        sks.append(s)
    acc = sks[0].merge(sks[1]).merge(sks[2])
    assert acc.inserts == len(keys)
    assert acc.contains_batch(keys).all()
    single = CuckooFilter.create(len(keys), fbits=16, seed=7)
    single.add_batch(keys)
    # membership answers are IDENTICAL to the one-shot build: slots
    # may differ but lookups check both candidate buckets, and both
    # tables hold the same (fingerprint, bucket-pair) multiset
    probe = keys + [f"x{i}" for i in range(5000)]
    assert np.array_equal(acc.contains_batch(probe),
                          single.contains_batch(probe))

    rt = CuckooFilter.from_bytes(acc.to_bytes())
    assert np.array_equal(rt.table, acc.table)
    assert (rt.m, rt.b, rt.fbits, rt.seed, rt.inserts, rt.full) == \
        (acc.m, acc.b, acc.fbits, acc.seed, acc.inserts, acc.full)

    tiny = CuckooFilter.create(100, fbits=16, seed=7)
    with pytest.raises(ValueError):
        tiny.add_batch(keys)  # capacity overflow is loud
    with pytest.raises(ValueError):
        sks[0].merge(CuckooFilter.create(100, fbits=8, seed=7))


def test_cuckoo_build_is_deterministic():
    """Seeded kick walk: identical inputs rebuild the identical
    table bit-for-bit (reproducible distributed builds)."""
    from facs_spark.sketch.cuckoo import CuckooFilter

    keys = [f"k{i}" for i in range(15000)]
    a = CuckooFilter.create(len(keys), seed=11)
    b = CuckooFilter.create(len(keys), seed=11)
    a.add_batch(keys)
    b.add_batch(keys)
    assert np.array_equal(a.table, b.table)


def test_countsketch_subtract_is_signed_stream_and_tighter():
    """Linearity payoff: cs(a).subtract(cs(b)) is BIT-EXACTLY the
    one-pass sketch of the signed stream (+1 for a, −1 for b), its
    estimates are unbiased deltas, and for similar streams the
    difference's self-priced bound is far TIGHTER than either
    side's — the property CMS's one-sided overcounts cannot have."""
    from facs_spark.sketch.countsketch import CountSketch

    rng = np.random.default_rng(5)
    base = {f"w{i}": int(v) for i, v in
            enumerate(rng.integers(50, 500, size=400))}
    a = dict(base)
    b = dict(base)
    a["w1"] += 40
    b["w2"] += 25
    b["gone"] = 30

    def build(counts):
        cs = CountSketch(r=7, c=2048, seed=13)
        keys = list(counts)
        cs.update_batch(keys, np.array([counts[k] for k in keys]))
        return cs

    ca, cb = build(a), build(b)
    bound_a = ca.error_bound()
    delta = ca.subtract(cb)

    signed = CountSketch(r=7, c=2048, seed=13)
    keys = sorted(set(a) | set(b))
    w = np.array([a.get(k, 0) - b.get(k, 0) for k in keys])
    signed.update_batch(keys, w)
    assert np.array_equal(delta.z, signed.z)

    est = delta.estimate_batch(["w1", "w2", "gone", "w5"])
    exact = np.array([40, -25, -30, 0], dtype=np.float64)
    bound_d = delta.error_bound()
    assert (np.abs(est - exact) <= bound_d).all(), (est, bound_d)
    # the difference stream's F2 is tiny vs either input's
    assert bound_d < bound_a / 10, (bound_d, bound_a)

"""Hash kernel tests: vectorized hash3 ≡ scalar reference port."""

import numpy as np
import pytest

from facs_spark.sketch.hashing import (FACS_SEEDS, hash3_matrix, hash3_scalar,
                                       hash5_matrix, hash_bytes_batch,
                                       hash_strings_batch, int64_key_matrix,
                                       splitmix64)

rng = np.random.default_rng(42)


@pytest.mark.parametrize("length", [1, 2, 7, 8, 15, 16, 17, 23, 24, 25, 48, 53, 100])
def test_hash3_matrix_matches_scalar(length):
    keys = rng.integers(0, 256, size=(40, length), dtype=np.uint8)
    for seed in (0, 1, FACS_SEEDS[0], FACS_SEEDS[19]):
        vec = hash3_matrix(keys, seed)
        for i in range(keys.shape[0]):
            assert int(vec[i]) == hash3_scalar(keys[i].tobytes(), seed), (
                f"mismatch at row {i}, len {length}, seed {seed}")


def test_hash3_empty_key():
    out = hash3_matrix(np.empty((3, 0), dtype=np.uint8), 7)
    assert int(out[0]) == hash3_scalar(b"", 7)
    assert (out == out[0]).all()


def test_hash5_mask_36_bits():
    keys = rng.integers(0, 256, size=(100, 15), dtype=np.uint8)
    out = hash5_matrix(keys, FACS_SEEDS[3])
    assert (out <= 0xFFFFFFFFF).all()
    assert int(out[0]) == (hash3_scalar(keys[0].tobytes(), FACS_SEEDS[3]) & 0xFFFFFFFFF)


def test_hash_bytes_batch_groups_by_length():
    vals = [b"a", b"abc", b"a", b"longer-key-here", b"abc", b""]
    out = hash_bytes_batch(vals, 5)
    for v, h in zip(vals, out):
        assert int(h) == hash3_scalar(v, 5)
    assert out[0] == out[2] and out[1] == out[4]


def test_hash_strings_unicode():
    vals = ["héllo", "wörld", "héllo", None]
    out = hash_strings_batch(vals, 0)
    assert out[0] == out[2]
    assert int(out[3]) == hash3_scalar(b"", 0)


def test_splitmix64_deterministic_and_spread():
    x = np.arange(10000, dtype=np.uint64)
    h = splitmix64(x)
    assert len(np.unique(h)) == 10000
    assert (splitmix64(x) == h).all()
    # top bits roughly uniform
    top = (h >> np.uint64(63)).mean()
    assert 0.45 < top < 0.55


def test_int64_key_matrix_roundtrip():
    v = np.array([0, 1, -1, 2**62], dtype=np.int64)
    m = int64_key_matrix(v)
    assert m.shape == (4, 8)
    assert m.view("<i8").ravel().tolist() == v.tolist()

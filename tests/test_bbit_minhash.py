"""b-bit minwise hashing (ops/dedup.bbit_minhash_corpus): estimator
sanity on corpora with KNOWN overlap, plus the structural invariants
the q96 oracle relies on (exact counts, symmetric pair coverage)."""

import pytest

from facs_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    yield get_spark("facs_spark_bbit_tests", cpus=4, shuffle_partitions=4)


def _mk_docs(spark, groups):
    """groups: {name: list of texts}."""
    rows = [(g, t) for g, texts in groups.items() for t in texts]
    return spark.createDataFrame(rows, "lang string, text string")


def test_known_overlap(spark):
    # group A: shingles from a 200-token sequence; group B shares the
    # first half -> J ~= 1/3 (99 vs 99 shingles, 49 shared... exact
    # computed by the op itself; the assertion is estimator vs exact)
    base = [f"w{i}" for i in range(200)]
    a_text = " ".join(base)
    b_text = " ".join(base[:100] + [f"x{i}" for i in range(100)])
    from facs_spark.ops.dedup import bbit_minhash_corpus
    out = bbit_minhash_corpus(
        _mk_docs(spark, {"a": [a_text], "b": [b_text]}),
        "lang", "text", k=64, b=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    # exact side: 198 vs 198 word-3-grams, 98 shared
    assert r["n_a"] == 198 and r["n_b"] == 198
    assert r["n_intersect"] == 98
    j = r["j_exact"]
    # k=64 minwise: sd ~= sqrt(J(1-J)/k) ~= 0.058 at J=1/3; 4 sd
    assert abs(r["est_full"] - j) <= 0.24
    # b=8 correction keeps the same concentration up to the
    # (1 - C2)^-1 variance inflation (~1.03 at these r1/r2)
    assert abs(r["est_bbit"] - j) <= 0.30


def test_disjoint_and_identical(spark):
    t1 = " ".join(f"a{i}" for i in range(50))
    t2 = " ".join(f"b{i}" for i in range(50))
    from facs_spark.ops.dedup import bbit_minhash_corpus
    out = {(r["group_a"], r["group_b"]): r
           for r in bbit_minhash_corpus(
               _mk_docs(spark, {"p": [t1], "q": [t2], "r": [t1]}),
               "lang", "text", k=64, b=8).collect()}
    assert set(out) == {("p", "q"), ("p", "r"), ("q", "r")}
    # identical corpora: every minhash matches exactly
    assert out[("p", "r")]["j_exact"] == 1.0
    assert out[("p", "r")]["est_full"] == 1.0
    # disjoint: exact J = 0; full estimator near 0 (collisions only)
    assert out[("p", "q")]["j_exact"] == 0.0
    assert out[("p", "q")]["est_full"] <= 0.1


def test_b8_guard(spark):
    from facs_spark.ops.dedup import bbit_minhash_corpus
    with pytest.raises(ValueError):
        bbit_minhash_corpus(
            _mk_docs(spark, {"a": ["x y z w"]}), "lang", "text", b=4)

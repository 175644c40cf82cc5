"""Distributed Lloyd's k-means (ops/clustering)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from facs_spark.ops.clustering import kmeans_assign, kmeans_fit
from facs_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    yield get_spark("facs_spark_clustering_tests", cpus=4,
                    shuffle_partitions=4)


def _planted(spark, n_per=60, dim=8, spread=0.05, seed=1):
    rng = np.random.default_rng(seed)
    centers = np.eye(3, dim) * 10.0
    rows = []
    for g in range(3):
        for i in range(n_per):
            v = centers[g] + rng.normal(scale=spread, size=dim)
            rows.append((g * n_per + i, [float(x) for x in v], g))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"), centers


def test_kmeans_recovers_planted_clusters(spark):
    df, centers = _planted(spark)
    cents, inertia = kmeans_fit(df, "vec_id", "embedding",
                                k=3, n_iters=6, seed=0)
    # every fitted centroid sits on exactly one planted center
    d = np.linalg.norm(cents[:, None, :] - centers[None, :, :], axis=2)
    nearest = d.argmin(axis=1)
    assert sorted(nearest.tolist()) == [0, 1, 2]
    assert d.min(axis=1).max() < 0.5
    # assignment purity 1.0: one fitted cluster per label
    out = kmeans_assign(df, cents, "embedding").collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r.label, set()).add(r.cluster)
    assert all(len(v) == 1 for v in by_label.values())
    assert len({next(iter(v)) for v in by_label.values()}) == 3


def test_kmeans_inertia_monotone_and_deterministic(spark):
    df, _ = _planted(spark, spread=2.0, seed=4)   # overlapping blobs
    cents1, in1 = kmeans_fit(df, "vec_id", "embedding",
                             k=4, n_iters=5, seed=7)
    assert all(in1[i] <= in1[i - 1] * (1 + 1e-12)
               for i in range(1, len(in1)))
    cents2, in2 = kmeans_fit(df, "vec_id", "embedding",
                             k=4, n_iters=5, seed=7)
    assert np.array_equal(cents1, cents2) and in1 == in2


def test_kmeans_assign_matches_bruteforce_argmin(spark):
    df, _ = _planted(spark, n_per=20, spread=3.0, seed=9)
    cents, _ = kmeans_fit(df, "vec_id", "embedding",
                          k=3, n_iters=2, seed=1)
    rows = df.collect()
    got = {r.vec_id: r.cluster
           for r in kmeans_assign(df, cents, "embedding").collect()}
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        want = int(((v - cents) ** 2).sum(axis=1).argmin())
        assert got[r.vec_id] == want


def test_kmeans_parallel_recovers_planted_clusters(spark):
    """k-means‖ init reaches the same recovery quality as
    farthest-first on planted blobs."""
    df, centers = _planted(spark)
    cents, inertia = kmeans_fit(df, "vec_id", "embedding", k=3,
                                n_iters=6, seed=0, init="parallel")
    d = np.linalg.norm(cents[:, None, :] - centers[None, :, :], axis=2)
    assert sorted(d.argmin(axis=1).tolist()) == [0, 1, 2]
    assert d.min(axis=1).max() < 0.5
    assert all(inertia[i] <= inertia[i - 1] * (1 + 1e-12)
               for i in range(1, len(inertia)))


def test_kmeans_parallel_pass_count_scales_log_k(spark):
    """The scale contract that motivates k-means‖: fitting k=64 takes
    O(log k) + n_iters distributed passes, not k−1 + n_iters.
    Farthest-first at this k would need 63 init scans; k-means‖ stays
    under ~log₂k + constant."""
    import duckdb
    con = duckdb.connect()
    pdf = con.execute(
        "SELECT vec_id, embedding FROM "
        "'/root/testdata/sf0.001/embeddings.parquet'").df()
    con.close()
    df = spark.createDataFrame(
        [(int(r.vec_id), [float(x) for x in r.embedding])
         for r in pdf.itertuples()],
        "vec_id long, embedding array<float>")
    k, n_iters = 64, 2
    stats: dict = {}
    cents, inertia = kmeans_fit(df, "vec_id", "embedding", k=k,
                                n_iters=n_iters, seed=3,
                                init="parallel", stats_out=stats)
    assert cents.shape[0] == k
    log_k = int(np.ceil(np.log2(k)))
    # 1 first-center + 1 φ₀ + (log₂k+2) rounds + ≤3 extras
    # + 1 weight pass + n_iters Lloyd passes
    assert stats["distributed_passes"] <= log_k + 8 + n_iters
    assert stats["distributed_passes"] < k // 2  # the point of ‖
    # farthest-first pass count really is k-1+1+n_iters (contrast)
    stats_ff: dict = {}
    kmeans_fit(df, "vec_id", "embedding", k=8, n_iters=1, seed=3,
               init="farthest", stats_out=stats_ff)
    assert stats_ff["distributed_passes"] == 8 + 1


def test_kmeans_parallel_deterministic(spark):
    df, _ = _planted(spark, spread=2.0, seed=4)
    c1, i1 = kmeans_fit(df, "vec_id", "embedding", k=4, n_iters=4,
                        seed=7, init="parallel")
    c2, i2 = kmeans_fit(df, "vec_id", "embedding", k=4, n_iters=4,
                        seed=7, init="parallel")
    assert np.array_equal(c1, c2) and i1 == i2


def test_kmeans_rejects_bad_params(spark):
    df, _ = _planted(spark, n_per=2)
    with pytest.raises(ValueError):
        kmeans_fit(df, "vec_id", "embedding", k=0)
    with pytest.raises(ValueError):
        kmeans_fit(df, "vec_id", "embedding", k=1000, n_iters=1)
    with pytest.raises(ValueError, match="init"):
        kmeans_fit(df, "vec_id", "embedding", k=2, init="nope")
    with pytest.raises(ValueError):
        kmeans_fit(df, "vec_id", "embedding", k=1000, n_iters=1,
                   init="parallel")

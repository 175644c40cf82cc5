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


def test_kmeans_rejects_bad_params(spark):
    df, _ = _planted(spark, n_per=2)
    with pytest.raises(ValueError):
        kmeans_fit(df, "vec_id", "embedding", k=0)
    with pytest.raises(ValueError):
        kmeans_fit(df, "vec_id", "embedding", k=1000, n_iters=1)

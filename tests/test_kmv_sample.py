"""KMV distinct sampling (q101): the bottom-k-hash sample is a
sample of the DISTINCT set (frequency-blind — the property row
sampling lacks), and (k-1)/u_k is an accurate cardinality
estimator."""

import hashlib

import numpy as np
import pytest

from facs_spark.session import get_spark

TWO52 = float(1 << 52)


def _kmv_est(values, k=16):
    hs = sorted(int(hashlib.md5(f"q101:{v}".encode())
                    .hexdigest()[:13], 16) for v in set(values))
    if len(hs) <= k:
        return float(len(hs))
    return (k - 1) / ((hs[k - 1] + 1) / TWO52)


def test_kmv_estimator_accuracy():
    rng = np.random.default_rng(3)
    for n in (100, 1_000, 10_000):
        vals = rng.choice(10 ** 9, size=n, replace=False)
        est = _kmv_est(vals, k=16)
        # published KMV sd ~ n/sqrt(k-2): 4 sd at k=16 is ~107%;
        # with a fixed hash assert a looser deterministic sanity band
        assert 0.3 * n <= est <= 3.0 * n, (n, est)


def test_kmv_sample_is_frequency_blind(spark=None):
    """Duplicating one user a million times must not change the
    sample or the estimate — the distinct-set semantics."""
    spark = get_spark("facs_spark_kmv_tests", cpus=4,
                      shuffle_partitions=4)
    import pandas as pd

    from facs_spark.queries import q101_kmv_distinct_sample

    base = pd.DataFrame({
        "event_id": np.arange(3_000),
        "ts": pd.to_datetime(np.arange(3_000), unit="s"),
        "user_id": np.r_[np.arange(1_000),
                         np.full(2_000, 7)],   # user 7 is heavy
        "event_type": ["view"] * 3_000,
        "value": 1.0,
        "props": "{}",
    })
    import os
    import tempfile

    sf = tempfile.mkdtemp(prefix="kmv_sf_")
    try:
        spark.createDataFrame(base).write.mode("overwrite") \
            .parquet(os.path.join(sf, "events.parquet"))
        out = q101_kmv_distinct_sample(spark, sf).toPandas()
        view = out[out["event_type"] == "view"]
        assert len(view) == 16
        assert view["n_distinct"].iloc[0] == 1_000
        # replay the selection independently: bottom-16 by md5
        hs = sorted(
            (hashlib.md5(f"q101:{u}".encode()).hexdigest()[:13], u)
            for u in range(1_000))
        assert view["user_id"].tolist() == [u for _h, u in hs[:16]]
        # duplication-invariance: the heavy user appears iff its hash
        # is bottom-16, same as any other user
        est = view["est_kmv"].iloc[0]
        assert abs(est - _kmv_est(range(1_000), 16)) < 1e-4
    finally:
        import shutil
        shutil.rmtree(sf, ignore_errors=True)


def test_kmv_bottom_k_matches_window_rank():
    """kmv_bottom_k (mergeable salted tree agg) ≡ the global-window
    row_number ranking it replaced, for every group including a
    synthetic all-rows group, at several cell counts."""
    import pandas as pd
    from pyspark.sql import functions as F

    from facs_spark.ops.sampling import kmv_bottom_k

    spark = get_spark("kmv_bottom_k_test", cpus=4,
                      shuffle_partitions=4)
    rng = np.random.default_rng(11)
    n = 5000
    pdf = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=n),
        "uid": rng.integers(0, 800, n).astype("int64"),
    })
    df = (spark.createDataFrame(pdf).distinct()
          .unionByName(spark.createDataFrame(
              pdf.assign(g="__all__")[["g", "uid"]]).distinct()))
    hx = F.substring(F.md5(F.col("uid").cast("string")), 1, 13)
    d = df.withColumn("hx", hx)
    # ground truth: sort each group's distinct (hx, uid) and slice
    ref = d.toPandas()
    want = {}
    for g, grp in ref.groupby("g"):
        rows = sorted(zip(grp["hx"], grp["uid"]))[:16]
        want[g] = (rows, len(grp))
    for cells in (1, 7, 64):
        got = kmv_bottom_k(d, "g", "hx", "uid", 16,
                           n_cells=cells).collect()
        assert {r["g"] for r in got} == set(want)
        for r in got:
            rows, nd = want[r["g"]]
            assert r["n_distinct"] == nd
            assert [(it["hx"], it["id"]) for it in r["bottom_k"]] \
                == rows, f"cells={cells} group={r['g']}"

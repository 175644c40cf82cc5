"""Event-time operators: as-of join checked against pandas
merge_asof (an independent reference implementation) across
directions, tolerance, ties, and unmatched rows; sessionization's
gap semantics checked on constructed boundaries."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from facs_spark.ops.temporal import asof_join, sessionize
from facs_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    yield get_spark("facs_spark_temporal_tests", cpus=4,
                    shuffle_partitions=4)


def _frames(seed=0, n_left=400, n_right=300, n_keys=7):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01")
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left),
        "ts": base + pd.to_timedelta(
            rng.integers(0, 10_000_000, n_left), unit="s"),
        "lid": np.arange(n_left),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right),
        "ts": base + pd.to_timedelta(
            rng.integers(0, 10_000_000, n_right), unit="s"),
        "rid": np.arange(n_right) + 10_000,
        "rv": rng.standard_normal(n_right).round(6),
    })
    # force exact-tie rows (left ts == right ts, same key) and a key
    # with no right rows at all
    left.loc[:4, ["k", "ts"]] = right.loc[:4, ["k", "ts"]].values
    left.loc[5:9, "k"] = n_keys + 1
    return left, right


def _pandas_asof(left, right, direction, tolerance=None):
    kw = {"tolerance": pd.Timedelta(tolerance)} if tolerance else {}
    return pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts", by="k", direction=direction, **kw
    ).sort_values("lid").reset_index(drop=True)


@pytest.mark.parametrize("direction,tolerance", [
    ("backward", None), ("forward", None), ("backward", "1 hour")])
def test_asof_join_matches_merge_asof(spark, direction, tolerance):
    left, right = _frames()
    ldf = spark.createDataFrame(left).repartition(5)
    rdf = spark.createDataFrame(right).repartition(3)
    got = asof_join(ldf, rdf, on="k", ts_col="ts", direction=direction,
                    tolerance=tolerance).toPandas() \
        .sort_values("lid").reset_index(drop=True)
    want = _pandas_asof(left, right, direction, tolerance)
    assert len(got) == len(left), "left join must keep every left row"
    assert got["lid"].tolist() == want["lid"].tolist()
    pd.testing.assert_series_equal(
        got["rid"].astype("float64"), want["rid"].astype("float64"),
        check_names=False)
    pd.testing.assert_series_equal(
        got["rv"].astype("float64"), want["rv"].astype("float64"),
        check_names=False)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("skew_bucket", [None, "1 hour"])
def test_asof_join_null_ts_and_null_keys_never_match(
        spark, direction, skew_bucket):
    """SQL null semantics: a null ts or null key on EITHER side matches
    nothing (left rows are kept with null right columns).  Regression:
    under desc ordering Spark sorts null ts LAST, so the forward fill
    used to hand a null-ts left row the smallest-ts right payload; and
    partitionBy groups null keys, pairing them unlike any SQL join."""
    from datetime import datetime, timedelta

    b = datetime(2024, 1, 1)
    h = timedelta(hours=1)
    ldf = spark.createDataFrame(
        [(1, b + h, 0), (1, None, 1),
         (None, b + 2 * h, 2), (1, b + 3 * h, 3)],
        "k long, ts timestamp, lid long")
    rdf = spark.createDataFrame(
        [(1, b + h / 2, 100), (1, None, 101),
         (None, b + h, 102), (1, b + 2.5 * h, 103)],
        "k long, ts timestamp, rid long")
    got = {r["lid"]: r["rid"] for r in asof_join(
        ldf, rdf, on="k", ts_col="ts", direction=direction,
        skew_bucket=skew_bucket).collect()}
    if direction == "backward":
        assert got == {0: 100, 1: None, 2: None, 3: 103}
    else:
        assert got == {0: 103, 1: None, 2: None, 3: None}


def test_asof_join_suffixes_colliding_columns(spark):
    left, right = _frames()
    right = right.rename(columns={"rv": "lid"})  # collide with left.lid
    got = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right), on="k", ts_col="ts")
    assert "lid_right" in got.columns and "lid" in got.columns


def test_asof_join_plan_is_single_exchange(spark):
    """The union-and-fill shape must cost ONE keyed exchange (the
    window partition) — no join node, no second shuffle."""
    left, right = _frames()
    got = asof_join(spark.createDataFrame(left).repartition(5),
                    spark.createDataFrame(right).repartition(3),
                    on="k", ts_col="ts")
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert plan.lower().count("hashpartitioning") == 1, plan
    assert "Join" not in plan.split("== Physical Plan ==")[-1] \
        .split("\n\n")[0], "no join node expected"


def test_sessionize_gap_boundaries(spark):
    """Exactly-gap pauses stay in-session; one second past the gap
    splits; session ids are 1-based and contiguous per key."""
    base = pd.Timestamp("2024-01-01")
    rows = pd.DataFrame({
        "u": [1, 1, 1, 1, 2],
        "ts": [base,
               base + pd.Timedelta(minutes=30),       # == gap → stays
               base + pd.Timedelta(minutes=60, seconds=1),  # > gap → new
               base + pd.Timedelta(minutes=61),
               base],
    })
    out = (sessionize(spark.createDataFrame(rows), "u", "ts",
                      gap="30 minutes")
           .orderBy("u", "ts").collect())
    assert [r["session_id"] for r in out] == [1, 1, 2, 2, 1]


def test_sessionize_rollup_counts(spark):
    """Random per-user streams: session count equals the number of
    >gap jumps + 1, per key (independent numpy reference)."""
    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01")
    rows = pd.DataFrame({
        "u": rng.integers(0, 9, 500),
        "ts": base + pd.to_timedelta(
            rng.integers(0, 5_000_000, 500), unit="s"),
    }).drop_duplicates(["u", "ts"])
    got = (sessionize(spark.createDataFrame(rows), "u", "ts",
                      gap="45 minutes")
           .groupBy("u").agg(F.max("session_id").alias("n"))
           .toPandas().set_index("u")["n"].to_dict())
    gap = pd.Timedelta("45 minutes")
    for u, g in rows.sort_values("ts").groupby("u"):
        want = 1 + int((g["ts"].diff() > gap).sum())
        assert got[u] == want, u


def test_sessionize_agrees_with_native_session_window(spark):
    """Cross-implementation check: per-session (start, end, count)
    from the lag+sum construction must equal Spark's own
    F.session_window aggregation — two independent definitions of
    gap sessions agreeing on random streams.  (session_window closes
    a session after a gap >= the duration, i.e. an exactly-gap pause
    SPLITS there; shift our gap by one microsecond to align the
    boundary conventions.)"""
    rng = np.random.default_rng(23)
    base = pd.Timestamp("2024-01-01")
    rows = pd.DataFrame({
        "u": rng.integers(0, 8, 600),
        "ts": base + pd.to_timedelta(
            rng.integers(0, 3_000_000, 600), unit="s"),
    }).drop_duplicates(["u", "ts"])
    df = spark.createDataFrame(rows)
    mine = (sessionize(df, "u", "ts", gap="30 minutes")
            .groupBy("u", "session_id")
            .agg(F.min("ts").alias("start"), F.max("ts").alias("end"),
                 F.count(F.lit(1)).alias("n")))
    native = (df.groupBy("u", F.session_window(
                  "ts", "30 minutes 0.000001 seconds").alias("w"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.min("ts").alias("start"), F.max("ts").alias("end")))
    a = sorted((r["u"], r["start"], r["end"], r["n"])
               for r in mine.collect())
    b = sorted((r["u"], r["start"], r["end"], r["n"])
               for r in native.collect())
    assert a == b


def test_range_join_matches_naive_inequality_join(spark):
    """Bin equi-join + residual must equal the naive inequality join
    row-for-row on random points/intervals, across bin widths that
    are smaller, comparable, and larger than the interval lengths."""
    rng = np.random.default_rng(31)
    from facs_spark.ops.temporal import range_join
    pts = pd.DataFrame({
        "g": rng.integers(0, 4, 300),
        "p": rng.uniform(0, 1000, 300).round(3),
        "pid": np.arange(300)})
    s = rng.uniform(-50, 950, 120).round(3)
    iv = pd.DataFrame({
        "g": rng.integers(0, 4, 120),
        "s": s, "e": (s + rng.uniform(0, 80, 120)).round(3),
        "iid": np.arange(120)})
    pdf, idf = spark.createDataFrame(pts), spark.createDataFrame(iv)
    naive = (pdf.alias("p").join(
        idf.alias("i"),
        (F.col("p.g") == F.col("i.g"))
        & (F.col("p.p") >= F.col("i.s"))
        & (F.col("p.p") <= F.col("i.e")))
        .select("pid", "iid"))
    want = sorted((r["pid"], r["iid"]) for r in naive.collect())
    for width in (7, 60, 500):
        got = sorted((r["pid"], r["iid"]) for r in
                     range_join(pdf, idf, "p", "s", "e", on="g",
                                bin_width=width)
                     .select("pid", "iid").collect())
        assert got == want, width
    assert len(want) > 100  # the fixture actually exercises matches


def test_range_join_plan_is_equi_join(spark):
    """The whole point: no cartesian product, no broadcast nested
    loop — a hash/sort-merge equi-join on (keys, bin)."""
    from facs_spark.ops.temporal import range_join
    pts = spark.range(100).select(
        F.col("id").alias("pid"), (F.col("id") * 3.0).alias("p"),
        (F.col("id") % 5).alias("g"))
    iv = spark.range(50).select(
        F.col("id").alias("iid"), (F.col("id") * 5.0).alias("s"),
        (F.col("id") * 5.0 + 10).alias("e"), (F.col("id") % 5).alias("g"))
    plan = range_join(pts, iv, "p", "s", "e", on="g", bin_width=10) \
        ._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Join" in plan


def test_range_join_degenerate_interval_guard(spark):
    """An interval covering more than max_bins bins must fail loudly
    instead of exploding the shuffle."""
    from facs_spark.ops.temporal import range_join
    pts = spark.range(5).select(F.col("id").alias("p"))
    iv = spark.range(1).select(F.lit(0.0).alias("s"),
                               F.lit(1e9).alias("e"))
    with pytest.raises(Exception, match="covers more than"):
        range_join(pts, iv, "p", "s", "e", bin_width=1,
                   max_bins=100).collect()


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_skew_bucket_matches_plain(spark, direction):
    """The hot-key two-pass shape (window by (key, time-bucket) +
    cross-bucket carry) must return exactly the plain shape's rows —
    including left rows in buckets that contain no right rows at all
    (the carry join covers the gap) and a key where EVERY row piles
    into one value (the skew case the mode exists for)."""
    left, right = _frames(seed=7)
    left["k"] = np.where(left.index % 3 == 0, 99, left["k"])  # hot key
    right["k"] = np.where(right.index % 3 == 0, 99, right["k"])
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    plain = asof_join(ldf, rdf, on="k", ts_col="ts",
                      direction=direction).toPandas() \
        .sort_values("lid").reset_index(drop=True)
    for bucket in ("6 hours", "10 days"):
        skewed = asof_join(ldf, rdf, on="k", ts_col="ts",
                           direction=direction,
                           skew_bucket=bucket).toPandas() \
            .sort_values("lid").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            plain, skewed[plain.columns], check_like=True)


def test_asof_join_skew_bucket_with_tolerance(spark):
    left, right = _frames(seed=13)
    plain = asof_join(spark.createDataFrame(left),
                      spark.createDataFrame(right), on="k", ts_col="ts",
                      tolerance="2 hours").toPandas() \
        .sort_values("lid").reset_index(drop=True)
    skewed = asof_join(spark.createDataFrame(left),
                       spark.createDataFrame(right), on="k", ts_col="ts",
                       tolerance="2 hours",
                       skew_bucket="1 day").toPandas() \
        .sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, skewed[plain.columns],
                                  check_like=True)


def test_band_count_min_matches_naive(spark):
    """band_count_min ≡ the naive band join aggregate on random data
    (multiple keys, dense ties, block-boundary straddlers)."""
    from facs_spark.ops.temporal import band_count_min
    rng = np.random.default_rng(17)
    n = 4000
    refs = pd.DataFrame({
        "k": rng.integers(0, 3, n),
        "ts": rng.integers(0, 200_000, n).astype("int64"),
        "rid": np.arange(n, dtype="int64") * 7 % n,
    })
    pts = refs.iloc[::5].rename(columns={"rid": "pid"}).copy()
    band = 3600
    got = band_count_min(
        spark.createDataFrame(pts), spark.createDataFrame(refs),
        on="k", ts_col="ts", band=band,
        point_id_col="pid", ref_id_col="rid").toPandas() \
        .sort_values("pid").reset_index(drop=True)
    # naive ground truth
    rows = []
    for _, p in pts.iterrows():
        m = refs[(refs["k"] == p["k"])
                 & (refs["ts"] >= p["ts"] - band)
                 & (refs["ts"] <= p["ts"] + band)]
        if len(m):
            rows.append((p["pid"], len(m), m["rid"].min()))
    want = pd.DataFrame(rows, columns=["pid", "n_in_band", "min_ref_id"]) \
        .astype("int64").sort_values("pid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["pid", "n_in_band", "min_ref_id"]].astype("int64"), want)


def test_band_count_min_narrow_blocks(spark):
    """block_width == band (maximum halo replication) must give the
    same answer as the default width — boundary-halo correctness."""
    from facs_spark.ops.temporal import band_count_min
    rng = np.random.default_rng(5)
    n = 1500
    refs = pd.DataFrame({
        "k": rng.integers(0, 2, n),
        "ts": rng.integers(0, 50_000, n).astype("int64"),
        "rid": rng.permutation(n).astype("int64"),
    })
    pts = refs.iloc[::3].rename(columns={"rid": "pid"}).copy()
    kw = dict(on="k", ts_col="ts", band=1000,
              point_id_col="pid", ref_id_col="rid")
    a = band_count_min(spark.createDataFrame(pts),
                       spark.createDataFrame(refs),
                       block_width=1000, **kw).toPandas() \
        .sort_values("pid").reset_index(drop=True)
    b = band_count_min(spark.createDataFrame(pts),
                       spark.createDataFrame(refs), **kw).toPandas() \
        .sort_values("pid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

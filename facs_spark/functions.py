"""SQL-callable sketch functions.

``register_sql_functions(spark)`` registers vectorized pandas UDFs so
SQL users can consume sketch blobs (e.g. from checkpoint/lineage
tables) without touching Python:

    SELECT lang, hll_estimate(sketch) FROM lang_sketches
    SELECT kll_quantile(sketch, 0.5)  FROM latency_sketches
    SELECT bloom_contains(sketch, 'needle') ...

All functions are Arrow-vectorized (no per-row Python); blobs are
deserialized once per distinct blob per batch (tiny LRU inside the
kernel) since sketch rows are few and wide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from .session import ensure_shipped


def _sketch_of(blob: bytes, cache: dict):
    # key on the FULL blob — a prefix key collides for sketches whose
    # headers + leading registers agree (e.g. low-cardinality HLLs)
    key = bytes(blob)
    sk = cache.get(key)
    if sk is None:
        from facs_spark.sketch import sketch_from_bytes
        if len(cache) > 64:
            cache.clear()
        sk = cache[key] = sketch_from_bytes(key)
    return sk


def register_sql_functions(spark: SparkSession) -> None:
    ensure_shipped(spark)

    @pandas_udf("double")
    def hll_estimate(blobs: pd.Series) -> pd.Series:
        cache: dict = {}
        return pd.Series([_sketch_of(b, cache).estimate() for b in blobs])

    @pandas_udf("double")
    def kll_quantile(blobs: pd.Series, qs: pd.Series) -> pd.Series:
        cache: dict = {}
        return pd.Series([_sketch_of(b, cache).quantile(float(q))
                          for b, q in zip(blobs, qs)])

    @pandas_udf("double")
    def tdigest_quantile(blobs: pd.Series, qs: pd.Series) -> pd.Series:
        cache: dict = {}
        return pd.Series([_sketch_of(b, cache).quantile(float(q))
                          for b, q in zip(blobs, qs)])

    @pandas_udf("long")
    def cms_count(blobs: pd.Series, keys: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for b, k in zip(blobs, keys):
            sk = _sketch_of(b, cache)
            out.append(int(sk.query_batch([k])[0]))
        return pd.Series(out)

    @pandas_udf("double")
    def theta_estimate(blobs: pd.Series) -> pd.Series:
        cache: dict = {}
        return pd.Series([_sketch_of(b, cache).estimate() for b in blobs])

    @pandas_udf("double")
    def theta_intersect(a: pd.Series, b: pd.Series) -> pd.Series:
        cache: dict = {}
        return pd.Series([
            _sketch_of(x, cache).intersect_estimate(_sketch_of(y, cache))
            for x, y in zip(a, b)])

    @pandas_udf("double")
    def theta_difference(a: pd.Series, b: pd.Series) -> pd.Series:
        cache: dict = {}
        return pd.Series([
            _sketch_of(x, cache).difference_estimate(_sketch_of(y, cache))
            for x, y in zip(a, b)])

    @pandas_udf("boolean")
    def bloom_contains(blobs: pd.Series, keys: pd.Series) -> pd.Series:
        from facs_spark.sketch.hashing import (ascii_lower,
                                               length_group_matrices)
        cache: dict = {}
        out = []
        for b, k in zip(blobs, keys):
            sk = _sketch_of(b, cache)
            # SAME normalization as the build side: byte-level ASCII
            # tolower, never unicode str.lower()
            enc = [ascii_lower(("" if k is None else str(k))
                               .encode("utf-8"))]
            hit = False
            for _idx, mat in length_group_matrices(enc):
                hit = bool(sk.contains_batch(mat)[0])
            out.append(hit)
        return pd.Series(out)

    @pandas_udf("long")
    def mg_estimate(blobs: pd.Series, keys: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for b, k in zip(blobs, keys):
            sk = _sketch_of(b, cache)
            key = int(k) if isinstance(k, (int, np.integer)) else str(k)
            out.append(int(sk.estimate(key)))
        return pd.Series(out)

    @pandas_udf("long")
    def mg_error_bound(blobs: pd.Series) -> pd.Series:
        cache: dict = {}
        # MG's error_bound is a property (N/(k+1)), not a method
        return pd.Series([int(_sketch_of(b, cache).error_bound)
                          for b in blobs])

    @pandas_udf("double")
    def ams_f2(blobs: pd.Series) -> pd.Series:
        cache: dict = {}
        return pd.Series([_sketch_of(b, cache).estimate() for b in blobs])

    @pandas_udf("double")
    def cs_estimate(blobs: pd.Series, keys: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for b, k in zip(blobs, keys):
            sk = _sketch_of(b, cache)
            key = int(k) if isinstance(k, (int, np.integer)) else str(k)
            out.append(float(sk.estimate(key)))
        return pd.Series(out)

    @pandas_udf("double")
    def cs_error_bound(blobs: pd.Series) -> pd.Series:
        cache: dict = {}
        return pd.Series([float(_sketch_of(b, cache).error_bound())
                          for b in blobs])

    @pandas_udf("boolean")
    def cbf_contains(blobs: pd.Series, keys: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for b, k in zip(blobs, keys):
            sk = _sketch_of(b, cache)
            key = np.asarray([int(k)], dtype=np.int64) \
                if isinstance(k, (int, np.integer)) else [str(k)]
            out.append(bool(sk.contains_batch(key)[0]))
        return pd.Series(out)

    # cuckoo blobs answer through the same shape (dispatch is by
    # magic inside sketch_from_bytes, so one probe UDF would do —
    # a distinct name keeps SQL self-documenting)
    cuckoo_contains = cbf_contains

    spark.udf.register("mg_estimate", mg_estimate)
    spark.udf.register("mg_error_bound", mg_error_bound)
    spark.udf.register("ams_f2", ams_f2)
    spark.udf.register("cs_estimate", cs_estimate)
    spark.udf.register("cs_error_bound", cs_error_bound)
    spark.udf.register("cbf_contains", cbf_contains)
    spark.udf.register("cuckoo_contains", cuckoo_contains)
    spark.udf.register("hll_estimate", hll_estimate)
    spark.udf.register("kll_quantile", kll_quantile)
    spark.udf.register("tdigest_quantile", tdigest_quantile)
    spark.udf.register("cms_count", cms_count)
    spark.udf.register("bloom_contains", bloom_contains)
    spark.udf.register("theta_estimate", theta_estimate)
    spark.udf.register("theta_intersect", theta_intersect)
    spark.udf.register("theta_difference", theta_difference)
    for name, udf in sketch_agg_udfs().items():
        spark.udf.register(name, udf)


def sketch_agg_udf(spec):
    """A true grouped-agg pandas UDAF building one sketch blob per
    group: ``df.groupBy("lang").agg(sketch_agg_udf(spec)("doc_id"))``
    or, registered, ``SELECT lang, hll_estimate(hll_agg(doc_id)) ...
    GROUP BY lang`` — the north rule's "mergeable UDAF" surface in
    its most literal Spark form.

    Scale contract, stated plainly: Spark GROUPED_AGG pandas UDFs run
    with NO partial-aggregation stage — every group's raw values
    shuffle to one reducer.  This form is the convenience/SQL surface
    for moderate groups; the 100-TB path remains
    ``ops/sketch_agg.grouped_sketches`` (map-side partial sketches,
    blob-only shuffle).  Both produce identical sketch state for the
    same input set (merge associativity — tested).
    """
    @pandas_udf("binary")
    def agg(v: pd.Series) -> bytes:
        sk = spec.new_sketch()
        spec.update(sk, v)
        return sk.to_bytes()

    return agg


def sketch_agg_udfs() -> dict:
    """Default-parameter grouped-agg builders for SQL registration."""
    from .ops.sketch_agg import SketchSpec
    return {
        "hll_agg": sketch_agg_udf(SketchSpec.make("hll", "_", p=14)),
        "kll_agg": sketch_agg_udf(SketchSpec.make("kll", "_", k=200)),
        "tdigest_agg": sketch_agg_udf(
            SketchSpec.make("tdigest", "_", delta=200.0)),
        "theta_agg": sketch_agg_udf(
            SketchSpec.make("theta", "_", k=4096)),
        "mg_agg": sketch_agg_udf(SketchSpec.make("mg", "_", k=1024)),
        "ams_agg": sketch_agg_udf(
            SketchSpec.make("ams", "_", r=5, c=256, seed=0)),
        "cs_agg": sketch_agg_udf(
            SketchSpec.make("cs", "_", r=5, c=2048, seed=0)),
        "cbf_agg": sketch_agg_udf(
            SketchSpec.make("cbf", "_", capacity=1_000_000,
                            error_rate=1e-6)),
        "cuckoo_agg": sketch_agg_udf(
            SketchSpec.make("cuckoo", "_", capacity=1_000_000,
                            fbits=32)),
    }

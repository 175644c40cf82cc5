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

    spark.udf.register("hll_estimate", hll_estimate)
    spark.udf.register("kll_quantile", kll_quantile)
    spark.udf.register("tdigest_quantile", tdigest_quantile)
    spark.udf.register("cms_count", cms_count)
    spark.udf.register("bloom_contains", bloom_contains)

"""Skew helpers: salted paths must be byte-equivalent to plain plans."""

import pytest
from pyspark.sql import functions as F

from facs_spark.ops.skew import salted_grouped_agg, salted_join, with_salt
from facs_spark.session import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    yield get_spark("facs_skew_tests", cpus=4, shuffle_partitions=4)


def test_salted_join_equals_plain(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet").select("p_partkey", "p_brand")
    plain = (li.join(part, li.l_partkey == part.p_partkey)
             .groupBy("p_brand").count())
    salted = (salted_join(li.withColumnRenamed("l_partkey", "p_partkey"),
                          part, "p_partkey", nsalt=8)
              .groupBy("p_brand").count())
    a = {r["p_brand"]: r["count"] for r in plain.collect()}
    b = {r["p_brand"]: r["count"] for r in salted.collect()}
    assert a == b


def test_salted_grouped_agg_equals_plain(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plain = {(r["lang"]): (r["n"], r["s"], r["mn"], r["mx"]) for r in
             docs.groupBy("lang").agg(
                 F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s"),
                 F.min("n_chars").alias("mn"),
                 F.max("n_chars").alias("mx")).collect()}
    salted = {(r["lang"]): (r["n"], r["s"], r["mn"], r["mx"]) for r in
              salted_grouped_agg(docs, "lang",
                                 [("*", "count", "n"),
                                  ("n_chars", "sum", "s"),
                                  ("n_chars", "min", "mn"),
                                  ("n_chars", "max", "mx")],
                                 nsalt=8).collect()}
    assert plain == salted


def test_with_salt_range(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    salts = with_salt(docs, "lang", 8).select("_salt").distinct().collect()
    vals = {r["_salt"] for r in salts}
    assert vals <= set(range(8)) and len(vals) > 1

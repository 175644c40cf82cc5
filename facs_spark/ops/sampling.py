"""Corpus-curation sampling operators (training-data pipeline ops).

Large-scale corpus curation constantly reweights data: cap any one
source/host/language at N documents, then shuffle deterministically
for training order.  Both ops here are *reproducible by construction*
— selection and order are pure functions of (seed, id), so two runs
(or two engines — the DuckDB oracle replays the same md5 ordering)
produce identical samples, and resuming a pipeline never changes
what was picked.

* ``cap_per_group`` — keep at most ``cap`` rows per group, chosen by
  a seeded hash order (NOT "first N": head-of-table selection biases
  toward early-crawled pages; hash order is an unbiased uniform
  sample that needs no group-size pre-pass).  One shuffle on the
  group key; the per-group work is a window rank.
* ``deterministic_shuffle`` — a seeded global permutation via
  ORDER BY md5(seed || id) (range-partitioned sort, the standard
  Spark total-order path).  Training-order shuffling that is stable
  across reruns and engines.

The reference engine has no sampling beyond Bernoulli ``-s``
(facs/tool.c:273-297, covered by ``classify_pages``); these extend
that surface to the corpus-curation shapes the task brief calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _order_key(id_col: str, seed: int):
    """Deterministic per-row order key: md5 of seed || id.

    md5 (not xxhash/spark hash) so an external system — including the
    DuckDB oracle — can reproduce the exact selection: both engines
    hash the same string to the same hex digest.  Null ids coalesce
    to a sentinel BEFORE hashing: a null key would sort NULLS FIRST
    in Spark but NULLS LAST in DuckDB (breaking the identical-
    selection contract) and would make all null-id rows an
    arbitrary-order tie.  Replicate in external SQL as
    ``md5('<seed>:' || COALESCE(CAST(id AS VARCHAR), chr(0)))``.
    """
    return F.md5(F.concat(F.lit(str(seed) + ":"),
                          F.coalesce(F.col(id_col).cast("string"),
                                     F.lit("\x00"))))


def cap_per_group(df: DataFrame, group_col: str | list[str], id_col: str,
                  cap: int, seed: int = 0) -> DataFrame:
    """At most ``cap`` rows per group, selected by seeded hash order.

    ``group_col`` may be one column or a list — the realistic
    curation key is composite (host+lang); the window partitions on
    all of them, still one shuffle.  Groups at or under the cap pass
    through whole; larger groups keep the ``cap`` rows with the
    smallest md5(seed||id) — a uniform random (but reproducible)
    subset.  Ties are impossible for distinct ids; ``id_col`` breaks
    the order totally regardless.
    """
    if cap < 1:
        raise ValueError(f"cap must be ≥ 1, got {cap}")
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    if not groups:
        raise ValueError("cap_per_group needs at least one group column")
    # collision-proof temp column: a user '_rk' would otherwise be
    # silently overwritten and dropped
    rk = "_rk"
    while rk in df.columns:
        rk += "_"
    w = (Window.partitionBy(*groups)
         .orderBy(_order_key(id_col, seed), F.col(id_col)))
    return (df.withColumn(rk, F.row_number().over(w))
            .filter(F.col(rk) <= cap).drop(rk))


def deterministic_shuffle(df: DataFrame, id_col: str,
                          seed: int = 0) -> DataFrame:
    """Seeded, rerun-stable global permutation (training order).

    A total sort on md5(seed||id): Spark plans it as the usual
    range-partitioned sort (sample → range exchange → local sort), so
    it scales like any ORDER BY; change ``seed`` for a fresh epoch
    permutation.
    """
    return df.orderBy(_order_key(id_col, seed), F.col(id_col))

"""Data-selection operators: DSIR hashed importance resampling.

Implements the importance-weight core of DSIR — Data Selection with
Importance Resampling (Xie, Santurkar, Ma, Liang; NeurIPS 2023,
arXiv:2302.03169): raw text is featurized into hashed n-gram
buckets, bag-of-buckets unigram models are fit for the target and
source corpora, and every source document gets the log importance
ratio  sum_t log( p_target(b(t)) / p_source(b(t)) )  over its
tokens.  Selecting the top-weighted documents (or Gumbel-top-k for
sampled selection) yields a target-like subcorpus.

No counterpart in the reference (facs gates on Bloom membership,
`facs/facs.py`); this is a first-class curation operator for the
100-TB pipeline.

Scale notes:
* The bucket table is bounded (16**prefix rows ≤ 4096 at the
  default) — it broadcasts; fitting it is one partial-aggregated
  groupBy over exploded tokens.
* Doc weights are one more groupBy over the same exploded rows with
  the broadcast log-ratio joined in — two shuffles total, both on
  bounded-width keys, never on raw text.
* Buckets come from md5-prefix strings (the repo-wide convention,
  see ops/sampling.py): any engine — including the DuckDB oracle —
  replays the exact bucketing, no Spark-private hash in the
  semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(tok: Column, prefix: int) -> Column:
    """Hashed feature bucket: first ``prefix`` hex chars of md5."""
    return F.substring(F.md5(tok), 1, prefix)


def dsir_weights(df: DataFrame, target: Column, id_col: str = "doc_id",
                 text_col: str = "text", prefix: int = 3,
                 alpha: float = 0.5) -> DataFrame:
    """Per-document DSIR log importance weights.

    ``target`` is a boolean column marking the target corpus inside
    ``df``; every row (target and source alike) is scored.  Bucket
    unigram models use add-``alpha`` smoothing over the full
    ``16**prefix`` bucket space so unseen buckets stay finite.

    Returns (id, n_tokens, weight) where weight =
    sum over token occurrences of ln(p_target/p_source).
    """
    n_buckets = 16 ** prefix
    toks = (df.select(F.col(id_col), target.alias("_is_target"),
                      F.explode(F.split(F.trim(F.col(text_col)), " +"))
                      .alias("tok"))
            .where(F.col("tok") != "")
            .withColumn("bucket", _bucket(F.col("tok"), prefix)))

    stats = (toks.groupBy("bucket")
             .agg(F.sum(F.when(F.col("_is_target"), 1).otherwise(0))
                  .alias("ct"),
                  F.sum(F.when(F.col("_is_target"), 0).otherwise(1))
                  .alias("cs")))
    # corpus totals attach via a global window over the ≤4096-row
    # stats table (one tiny single-partition exchange) — NOT a 1-row
    # crossJoin, which plans as BroadcastNestedLoopJoin and trips the
    # repo-wide no-nested-loop plan invariant (PLANS.md)
    from pyspark.sql import Window
    w_all = Window.partitionBy(F.lit(1))
    ratio = (stats
             .withColumn("nt", F.sum("ct").over(w_all))
             .withColumn("ns", F.sum("cs").over(w_all))
             .select("bucket",
                     (F.log((F.col("ct") + alpha)
                            / (F.col("nt") + alpha * n_buckets))
                      - F.log((F.col("cs") + alpha)
                              / (F.col("ns") + alpha * n_buckets)))
                     .alias("log_ratio")))

    return (toks.join(F.broadcast(ratio), "bucket")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.sum("log_ratio").alias("weight")))


def dsir_select(df: DataFrame, target: Column, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                seed: int = 0, prefix: int = 3,
                alpha: float = 0.5) -> DataFrame:
    """DSIR's resampling step: sample ``k`` source documents without
    replacement with probability ∝ exp(weight) via the Gumbel-top-k
    trick (score = weight − ln(−ln(u)), u a seeded uniform; the top-k
    scores ARE a softmax(weight) sample — Vieira 2014).

    The uniform comes from the repo-wide md5 order-key convention
    (``md5('<seed>:' || id)``, first 13 hex chars → 52-bit fraction),
    so any engine replays the exact selection.  Target rows are the
    model's positives, not candidates — only source rows compete.

    Scale: the weight pass is dsir_weights (bounded broadcast model);
    the top-k is TakeOrdered (per-partition heaps, no global sort).
    Returns (id, weight, score) for the k selected docs.
    """
    w = dsir_weights(df, target, id_col=id_col, text_col=text_col,
                     prefix=prefix, alpha=alpha)
    pool = df.select(F.col(id_col), target.alias("_t")) \
             .where(~F.col("_t")).drop("_t")
    key = F.md5(F.concat(F.lit(f"{seed}:"),
                         F.col(id_col).cast("string")))
    u = ((F.conv(F.substring(key, 1, 13), 16, 10).cast("double") + 0.5)
         / float(16 ** 13))
    return (pool.join(w, id_col)
            .withColumn("score", F.col("weight") - F.log(-F.log(u)))
            .orderBy(F.desc("score"), id_col)
            .limit(k)
            .select(id_col, "weight", "score"))

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
  default) — it collects as a bounded driver reduce and broadcasts
  back as literals.
* The corpus tokenization explode runs ONCE: it feeds a single
  persisted (id, is_target, bucket)-count table that serves both the
  model fit and the scoring pass; scoring is one more groupBy over
  count rows (distinct buckets per doc, not occurrences) with the
  broadcast log-ratio joined in — two shuffles total, both on
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
    import math
    import weakref

    n_buckets = 16 ** prefix
    toks = (df.select(F.col(id_col), target.alias("_is_target"),
                      F.explode(F.split(F.trim(F.col(text_col)), " +"))
                      .alias("tok"))
            .where(F.col("tok") != "")
            .withColumn("bucket", _bucket(F.col("tok"), prefix)))

    # ONE tokenization pass: the explode feeds a single
    # (id, is_target, bucket)-count aggregation, which is persisted
    # and serves BOTH the model fit and the scoring pass (the old
    # shape ran the corpus explode twice as separate lineage — at
    # 100 TB the explode is the dominant cost).  The per-doc-bucket
    # table also carries counts instead of occurrences, so the
    # scoring shuffle shrinks to distinct-bucket rows per doc.
    per_doc = (toks.groupBy(id_col, "_is_target", "bucket")
               .agg(F.count(F.lit(1)).cast("long").alias("c"))
               .persist())

    # model fit: a bounded driver reduce (≤ 16**prefix = 4096 rows,
    # like the engine's other ≤4096-row model collects) — this is
    # the call's single execution of the tokenization pass, and it
    # leaves per_doc cached for the scoring plan
    stats = (per_doc.groupBy("bucket")
             .agg(F.sum(F.when(F.col("_is_target"), F.col("c"))
                        .otherwise(0)).alias("ct"),
                  F.sum(F.when(F.col("_is_target"), 0)
                        .otherwise(F.col("c"))).alias("cs"))
             .collect())
    nt = sum(r["ct"] for r in stats)
    ns = sum(r["cs"] for r in stats)
    spark = df.sparkSession
    model = spark.createDataFrame(
        [(r["bucket"],
          math.log((r["ct"] + alpha) / (nt + alpha * n_buckets))
          - math.log((r["cs"] + alpha) / (ns + alpha * n_buckets)))
         for r in stats],
        "bucket string, log_ratio double")

    out = (per_doc.join(F.broadcast(model), "bucket")
           .groupBy(id_col)
           .agg(F.sum("c").cast("long").alias("n_tokens"),
                F.sum(F.col("c") * F.col("log_ratio")).alias("weight")))

    # release the cache when the result becomes unreachable — an
    # action after that point recomputes (correct, just uncached)
    def _release(pd_ref=per_doc):
        import contextlib
        with contextlib.suppress(Exception):
            pd_ref.unpersist(blocking=False)
    weakref.finalize(out, _release)
    return out


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

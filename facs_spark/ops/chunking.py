"""Context-window preparation for LLM training pipelines:
token-window chunking and contiguous token-stream packing.

The reference never re-segments its records (facs classifies whole
reads, `facs/facs.py` drives per-file classify/remove only) — these
are engine-breadth operators for the training-data pipeline this
engine targets: before tokenized text reaches a trainer it is cut
into fixed-width context windows (``chunk_text``) or packed into
contiguous token streams cut every ``budget`` tokens
(``pack_tokens`` — the concatenate-and-cut packing used by GPT-style
pretraining loaders).

Scale notes (100 TB):
* Both ops are pure JVM column expressions — one ``posexplode`` for
  chunking, one keyed window cumsum for packing.  No Python, no
  driver round-trip, no collect.
* Chunking is embarrassingly parallel (map-side only: the explode
  multiplies rows inside each task, nothing shuffles).
* Packing shuffles ONCE on the shard key; shard count is the
  parallelism knob, and each shard's window is a single ordered
  scan.  Document→bin assignment is ``floor(exclusive-cumsum /
  budget)``, i.e. a doc "straddles" a boundary into the bin where
  its first token lands — the loader-side convention that keeps
  assignment a pure prefix-sum instead of a sequential bin-fill
  (which would not distribute).
* Tokenization is the repo-wide single-space convention
  (split on ' ', drop empties) so every engine replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tokens(text_col: str):
    """Non-empty single-space tokens as an array, codegen-friendly.

    ``split(trim(text), ' +')`` yields the same token sequence as
    "split(' ') and drop empties" without a higher-order
    ``F.filter`` lambda (HOFs are CodegenFallback — interpreted per
    element).  All-whitespace/empty text maps to an empty array.
    """
    t = F.trim(F.col(text_col))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(t, " +"))


def chunk_text(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", width: int = 128,
               stride: int = 96) -> DataFrame:
    """Cut each document into token windows of ``width`` tokens,
    starting every ``stride`` tokens (overlap = width - stride).

    The last window may be short; a doc with ≤ width tokens yields
    exactly one window; empty docs yield none.  Emits one row per
    chunk: (id, chunk_id, chunk_tokens, chunk_text).
    """
    if not (0 < stride <= width):
        raise ValueError(f"need 0 < stride <= width, got {stride}/{width}")
    toks = _tokens(text_col)
    n = F.size(toks)
    # windows cover token 1, 1+stride, ... ; last start must still
    # have something new to cover: n_chunks = 1 + ceil((n-width)/stride)
    n_chunks = F.when(n <= width, F.lit(1)).otherwise(
        1 + F.ceil((n - width) / F.lit(float(stride))).cast("long"))
    start = F.col("k") * stride + 1
    base = (df.select(F.col(id_col), toks.alias("_toks"), n.alias("_n"),
                      n_chunks.alias("_m"))
            .where(F.col("_n") > 0))
    return (base
            .select(id_col, "_toks", "_n",
                    F.posexplode(F.sequence(F.lit(0), F.col("_m") - 1))
                    .alias("k", "_"))
            .select(F.col(id_col),
                    F.col("k").cast("long").alias("chunk_id"),
                    F.least(F.lit(width), F.col("_n") - F.col("k") * stride)
                    .cast("long").alias("chunk_tokens"),
                    F.array_join(F.slice(F.col("_toks"), start, width), " ")
                    .alias("chunk_text")))


def _auto_shards(df: DataFrame) -> int:
    """Default shard count for packing, derived from plan-stat bytes
    (the ``ensure_parallelism`` sizing): floor at the cluster's
    defaultParallelism so every core gets a shard even on small
    inputs, grow with estimated uncompressed bytes so each shard's
    sequential window scan stays bounded at any input size.  A
    hardcoded default would cap packing parallelism regardless of
    cluster size — each shard is ONE ordered scan."""
    from ..session import (_COMPRESSION_FACTOR, _KERNEL_SPLIT_BYTES,
                           _plan_size_bytes)
    cores = df.sparkSession.sparkContext.defaultParallelism
    size = _plan_size_bytes(df)
    if size is None:
        return cores
    return max(cores, -(-int(size * _COMPRESSION_FACTOR)
                        // _KERNEL_SPLIT_BYTES))


def pack_tokens(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", budget: int = 2048,
                shards: int | None = None) -> DataFrame:
    """Concat-and-cut sequence packing: within each shard, documents
    are laid out in ``id_col`` order as one contiguous token stream
    and cut every ``budget`` tokens; a document belongs to the bin
    where its first token lands.

    Returns doc-level assignment: (id, shard, bin, doc_tokens,
    tokens_before) — aggregate over (shard, bin) for fill stats.
    One shuffle on the shard key; the assignment itself is an
    exclusive prefix-sum, so it distributes (a sequential first-fit
    would not).

    ``shards`` defaults to a plan-stat-derived count (core floor,
    byte growth — ``_auto_shards``); pass it explicitly when the
    shard/bin layout must be replayable across engines or cluster
    sizes (the oracle-checked queries do).
    """
    from pyspark.sql import Window
    if shards is None:
        shards = _auto_shards(df)
    if budget <= 0 or shards <= 0:
        raise ValueError("budget and shards must be positive")
    toks = F.size(_tokens(text_col))
    shard = F.pmod(F.col(id_col), F.lit(shards)).cast("long")
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (df.select(F.col(id_col), shard.alias("shard"),
                      toks.cast("long").alias("doc_tokens"))
            .withColumn("tokens_before",
                        F.coalesce(F.sum("doc_tokens").over(w), F.lit(0))
                        .cast("long"))
            .withColumn("bin",
                        F.floor(F.col("tokens_before") / budget)
                        .cast("long")))

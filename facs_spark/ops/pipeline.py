"""Capstone composition: the end-to-end training-data cleaning
pipeline, chaining every operator family in the engine.

    raw pages
      → quality scoring (drop low-quality)        [textstats]
      → language filter                            [textstats]
      → exact dedup on text digest                 [dedup]
      → near-dup drop (MinHash→verify→cluster)     [dedup]
      → contamination screen vs reference corpus   [contamination]
      → per-source cap (optional)                  [sampling]
      → cleaned pages + a one-row stats report

Everything stays DataFrame-lazy until the two actions (near-dup pair
collection and the final counts); raw text shuffles EXACTLY ONCE —
the exact-dedup window keyed by a 16-byte (md5, length) digest.
Candidates/signatures are map-side longs, classification is a
broadcast kernel, and the candidate-verify join's small side
broadcasts under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .contamination import build_reference_bloom, classify_pages
from .dedup import drop_near_duplicates, minhash_dedup
from .textstats import lang_id, quality_score


def clean_corpus(docs: DataFrame, ref_corpus: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 min_quality: float = 0.5,
                 keep_langs: tuple[str, ...] | None = None,
                 neardup_threshold: float = 0.8,
                 contamination_tole: float = 0.4,
                 k: int = 15,
                 error_rate: float = 1e-6,
                 cap_col: str | None = None,
                 cap: int | None = None,
                 cap_seed: int = 0,
                 split_weights: dict | None = None,
                 split_seed: int = 0) -> tuple[DataFrame, DataFrame]:
    """Returns (cleaned_docs, stats_row).

    ``stats_row``: one-row DataFrame with counts surviving each stage
    (the pipeline's funnel — the observability a 10¹²-page run needs).

    ``split_weights`` (e.g. ``{"train": .8, "val": .1, "test": .1}``)
    appends the deterministic hash-split assignment as a final
    ``split`` column — map-side, append-stable, no extra shuffle.
    """
    spark = docs.sparkSession
    n_input = docs.count()

    scored = quality_score(docs, text_col)
    good = scored.filter(F.col("quality_score") >= min_quality)
    if keep_langs:
        good = lang_id(good, text_col).filter(
            F.col("lang_guess").isin(*keep_langs))
    good = good.select(*docs.columns).cache()
    n_quality = good.count()

    # exact dedup: keep min id per identical text.  One window over
    # the (md5, length) digest — the rows shuffle exactly once, keyed
    # by the 16-byte digest, and no join against a corpus-sized
    # keeper set is needed (a semi-join's keep-list is ~one row per
    # distinct text, far past broadcast size, so it would shuffle the
    # text a second time).  A digest collision additionally needs
    # equal length, ≈2⁻¹²⁸ — accepted and documented.
    from pyspark.sql.window import Window
    w_dg = Window.partitionBy("_dg", "_ln").orderBy(id_col)
    exact = (good.withColumn("_dg", F.md5(F.col(text_col)))
             .withColumn("_ln", F.length(F.col(text_col)))
             .withColumn("_rn", F.row_number().over(w_dg))
             .filter(F.col("_rn") == 1)
             .drop("_dg", "_ln", "_rn").cache())
    n_exact = exact.count()

    # near-dup drop: LSH candidates → exact-Jaccard verify → clusters
    pairs = minhash_dedup(exact, id_col, text_col,
                          threshold=neardup_threshold)
    deduped = drop_near_duplicates(exact, id_col, pairs).cache()
    n_neardup = deduped.count()

    # contamination screen: drop pages matching the reference corpus
    bloom = build_reference_bloom(ref_corpus, text_col=text_col, k=k,
                                  error_rate=error_rate)
    classified = classify_pages(deduped, bloom, text_col=text_col,
                                passthrough=tuple(docs.columns),
                                tole_rate=contamination_tole)
    cleaned = (classified.filter(~F.col("contaminated"))
               .select(*docs.columns).cache())
    n_clean = cleaned.count()

    # optional per-source/lang rebalancing cap (seeded, reproducible)
    n_capped = n_clean
    if cap_col is not None and cap is not None:
        from .sampling import cap_per_group
        pre_cap = cleaned
        cleaned = cap_per_group(cleaned, cap_col, id_col, cap,
                                seed=cap_seed).cache()
        n_capped = cleaned.count()
        pre_cap.unpersist()

    import pandas as pd
    stats = spark.createDataFrame(pd.DataFrame([{
        "n_input": n_input,
        "n_after_quality": n_quality,
        "n_after_exact_dedup": n_exact,
        "n_after_neardup": n_neardup,
        "n_after_contamination": n_clean,
        "n_after_cap": n_capped,
        "dropped_quality": n_input - n_quality,
        "dropped_exact_dup": n_quality - n_exact,
        "dropped_neardup": n_exact - n_neardup,
        "dropped_contaminated": n_neardup - n_clean,
        "dropped_capped": n_clean - n_capped,
    }]))
    if split_weights is not None:
        from .sampling import hash_split
        cleaned = hash_split(cleaned, id_col, split_weights,
                             seed=split_seed)
    # every intermediate cache is released; only the returned frame
    # (already counted, so fully materialized) stays cached
    good.unpersist()
    exact.unpersist()
    deduped.unpersist()
    return cleaned, stats


# ------------------------------------------- trainer-facing windows
def prepare_context_windows(cleaned: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", width: int = 1024,
                            stride: int = 1024, budget: int = 8192,
                            shards: int = 64) -> DataFrame:
    """The funnel's trainer-facing tail: cut cleaned docs into
    ``width``-token context windows, deterministically shuffle the
    windows by hash (trainers want decorrelated order — adjacent
    windows of one doc must not land in one bin), then pack the
    stream into ``budget``-token bins (concat-and-cut, q66 form).

    Returns window-level rows: (id, chunk_id, window_id, chunk_text,
    shard, bin, doc_tokens, tokens_before).  Scale: chunking is
    map-side, the hash key is a pure expression, packing shuffles
    once on the shard key.
    """
    from .chunking import chunk_text, pack_tokens
    chunks = chunk_text(cleaned, id_col, text_col,
                        width=width, stride=stride)
    windows = chunks.withColumn(
        "window_id", F.xxhash64(F.col(id_col), F.col("chunk_id")))
    packed = pack_tokens(windows, "window_id", "chunk_text",
                         budget=budget, shards=shards)
    return windows.join(packed, "window_id")


# ----------------------------------------------- eval decontamination
def decontaminate(train: DataFrame, eval_set: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n_tokens: int = 13,
                  min_overlap_windows: int = 1,
                  bloom_prefilter: bool = False,
                  bloom_error_rate: float = 1e-4) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C pass, Brown et
    al. 2020): flag every TRAIN doc sharing at least
    ``min_overlap_windows`` distinct ``n_tokens``-token windows with
    ANY eval/benchmark doc, so evaluation data can be held out of the
    training corpus.  13 tokens is the published default.

    Returns (id_col, overlap_windows, contaminated) for every train
    doc — callers drop or quarantine ``contaminated`` rows.

    Scale shape: both sides reuse the vectorized Arrow window-hash
    kernel from the substring-dedup pass (gram strings never
    materialized, 8-byte hashes leave the kernel).  The eval side
    collapses to DISTINCT hashes — benchmark sets are tiny next to a
    training corpus, so after the map-side distinct the probe table is
    small and AQE broadcasts the semi side; the train side then
    aggregates matched windows per doc with a map-side-combined
    count.  Only longs shuffle; train text never does.

    ``bloom_prefilter=True`` routes the semi-join through
    ``bloom_prejoin``: the eval hashes build a Bloom filter (the
    engine's core sketch) that prunes train windows MAP-SIDE before
    the shuffle.  The output is bit-identical — the exact join after
    the probe removes Bloom false positives — but only ~FPR of the
    non-matching train windows ever shuffle.  This is the shape for
    when the held-out side outgrows AQE's broadcast threshold (a
    full benchmark SUITE, or decontaminating against another
    corpus): broadcast dies at ~8 GiB of gram rows, a banked Bloom
    of the same grams is ~100× smaller.  Range prefiltering is off —
    window hashes are uniform on int64, a min/max BETWEEN cannot
    prune.
    """
    from .dedup import window_hash_occurrences

    eval_gh = (window_hash_occurrences(eval_set, id_col, text_col,
                                       n_tokens)
               .select("gh").distinct())
    train_occ = window_hash_occurrences(train, id_col, text_col,
                                        n_tokens)
    if bloom_prefilter:
        from .joins import bloom_prejoin
        semi = bloom_prejoin(train_occ, eval_gh, "gh", how="left_semi",
                             error_rate=bloom_error_rate,
                             range_prefilter=False)
    else:
        semi = train_occ.join(eval_gh, "gh", "left_semi")
    hits = (semi.groupBy(id_col)
            .agg(F.countDistinct("gh").alias("overlap_windows")))
    return (train.select(id_col).join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("overlap_windows", F.lit(0))
                     .alias("overlap_windows"),
                    (F.coalesce("overlap_windows", F.lit(0))
                     >= min_overlap_windows).alias("contaminated")))

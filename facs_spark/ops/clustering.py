"""Distributed Lloyd's k-means over embedding columns.

The clustering stage that SemDeDup (Abbas et al., 2023) and IVF-style
ANN build on: fit k centroids over an ``array<float>`` column, then
assign every vector map-side.  ``ops/similarity.semantic_dedup``'s
docstring promises "a production run swaps in k-means centroids" —
this module is that swap (no counterpart in the reference, which has
no vector columns).

Scale shape (Lloyd's is one distributed sufficient-statistic pass
per iteration):
* assignment + per-cluster partial sums run in ONE ``mapInPandas``
  over the vectors; each task emits at most k rows of (cluster,
  sum_vec, count, sse) — the only thing that ever leaves an executor
  is k·dim floats per partition, never vectors.
* the driver reduces ≤ partitions·k partial rows (a bounded collect,
  like the engine's other driver reduces) and broadcasts the k·dim
  update — classic mini-EM, no shuffle of the data at all.
* the projected (id, vec) frame is persisted (MEMORY_AND_DISK) for
  the fit's duration — init + iterations read it ~k+n_iters times —
  and released before returning.
* seeding is the repo's md5 order key — the same k initial vectors
  on any engine, cluster layout, or partitioning.

Lloyd's invariant (assignment-step SSE is non-increasing when
centroids update to cluster means) is the oracle hook: q72 asserts
the measured inertia sequence is monotone — a provable property, not
a reproduction of floating-point internals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..session import ensure_parallelism, ensure_shipped


def _assign_batch(mat: np.ndarray, cents: np.ndarray):
    """(assignments, squared distances) for one batch — argmin of
    ||x−c||² via the expanded form, float64."""
    x2 = (mat * mat).sum(axis=1, keepdims=True)
    c2 = (cents * cents).sum(axis=1)
    d2 = x2 - 2.0 * (mat @ cents.T) + c2
    a = d2.argmin(axis=1)
    return a, np.maximum(d2[np.arange(len(a)), a], 0.0)


def _u01(ids: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic per-id uniform in [0,1): splitmix64 finalizer
    over (id XOR salt) — vectorized, partitioning-invariant (depends
    only on the id and the salt, never on row order or layout)."""
    x = ids.astype(np.uint64) ^ np.uint64(salt & 0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _first_center(src: DataFrame, id_col: str, vec_col: str,
                  seed: int) -> np.ndarray:
    """The min-md5-key vector: a uniform deterministic draw,
    engine-replayable (the repo's standard order-key trick)."""
    key = F.md5(F.concat(F.lit(f"{seed}:"),
                         F.col(id_col).cast("string")))
    first = (src.orderBy(key.asc(), F.col(id_col).asc())
             .limit(1).collect())
    if not first:
        raise ValueError("kmeans_fit on an empty frame")
    return np.asarray(first[0][vec_col], dtype=np.float64)


def _init_parallel(src: DataFrame, id_col: str, vec_col: str, k: int,
                   seed: int, oversample: float | None) -> tuple:
    """k-means‖ oversampling init (Bahmani et al., VLDB 2012) —
    O(log k) distributed passes regardless of k.

    Farthest-first needs k−1 sequential full-data scans; at
    SemDeDup's published scale (k in the tens of thousands over a
    100-TB vector table) that plan cannot run.  k-means‖ instead
    samples ~l = 2k candidates per round with probability
    min(1, l·d²(x,C)/φ) over ⌈log₂k⌉+2 rounds, weights each
    candidate by the mass of points nearest to it (one more pass),
    and re-clusters the ≤ l·rounds weighted candidates driver-side
    with seeded k-means++ + weighted Lloyd — exactly MLlib's
    ``initKMeansParallel`` shape, re-derived here.

    Determinism: candidate sampling thresholds come from a splitmix64
    hash of (seed, round, id) — the same candidate set on any
    partitioning — and the driver-side re-cluster uses a fixed-seed
    PCG64 generator.  Returns (centroids [k,dim], n_passes).
    """
    spark = src.sparkSession
    l = float(oversample if oversample is not None else 2 * k)
    c0 = _first_center(src, id_col, vec_col, seed)
    passes = 1
    cand_ids = {-1}                      # synthetic id for the seed row
    cand_vecs = {-1: c0}
    pass_schema = f"cost double, {id_col} long, vec array<double>"

    def one_pass(cents: np.ndarray, phi: float | None, salt: int):
        """Fused pass: per-partition partial cost vs ``cents`` plus
        (when phi is set) the Bahmani-sampled candidate rows."""
        bc = spark.sparkContext.broadcast(cents)

        def kernel(batches):
            c = bc.value
            tot = 0.0
            ids_out: list = []
            vecs_out: list = []
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                _, d2 = _assign_batch(mat, c)
                tot += float(d2.sum())
                if phi is not None and phi > 0:
                    ids = pdf[id_col].to_numpy()
                    pick = _u01(ids, salt) < np.minimum(
                        1.0, l * d2 / phi)
                    for i in np.flatnonzero(pick):
                        ids_out.append(int(ids[i]))
                        vecs_out.append(mat[i])
            yield pd.DataFrame({
                "cost": pd.Series([tot] + [np.nan] * len(ids_out),
                                  dtype="float64"),
                id_col: pd.Series([-1] + ids_out, dtype="int64"),
                "vec": pd.Series([np.zeros(0)] + vecs_out,
                                 dtype="object")})

        rows = src.mapInPandas(kernel, schema=pass_schema).collect()
        bc.destroy()
        # NaN doubles surface as None in collected Rows: cost rows
        # are the non-null ones
        phi_new = sum(r["cost"] for r in rows
                      if r["cost"] is not None and r["cost"] == r["cost"])
        cands = sorted(((r[id_col], r["vec"]) for r in rows
                        if r[id_col] >= 0), key=lambda t: t[0])
        return phi_new, cands

    # φ₀ pass (cost against the single seed center), then the
    # sampling rounds — each round samples with the PREVIOUS round's
    # φ (MLlib's lazy-cost variant: φ_prev ≥ φ_current, so the
    # sampling rate is conservative and the O(log ψ) argument holds)
    phi, _ = one_pass(np.array([c0]), None, 0)
    passes += 1
    rounds = int(np.ceil(np.log2(max(k, 2)))) + 2
    extra_allowed = 3
    r = 0
    while r < rounds or (len(cand_ids) <= k and extra_allowed > 0):
        if r >= rounds:
            extra_allowed -= 1
        salt = (seed * 0x9E3779B97F4A7C15 + (r + 1)
                * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF
        cents = np.array([cand_vecs[i] for i in sorted(cand_ids)],
                         dtype=np.float64)
        phi_new, new_cands = one_pass(cents, phi, salt)
        passes += 1
        for cid, vec in new_cands:
            if cid not in cand_ids:
                cand_ids.add(cid)
                cand_vecs[cid] = np.asarray(vec, dtype=np.float64)
        phi = phi_new
        r += 1
        if phi <= 0.0:
            break                       # candidates already cover X
    order = sorted(cand_ids)
    cand = np.array([cand_vecs[i] for i in order], dtype=np.float64)

    # weight pass: how much data mass is nearest each candidate
    bcw = spark.sparkContext.broadcast(cand)

    def weight_kernel(batches):
        c = bcw.value
        counts = np.zeros(len(c), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            a, _ = _assign_batch(mat, c)
            np.add.at(counts, a, 1)
        live = np.nonzero(counts)[0]
        yield pd.DataFrame({"cand": live.astype(np.int64),
                            "w": counts[live]})

    wrows = src.mapInPandas(weight_kernel,
                            schema="cand long, w long").collect()
    bcw.destroy()
    passes += 1
    w = np.zeros(len(cand), dtype=np.float64)
    for row in wrows:
        w[row["cand"]] += row["w"]

    cents = _local_weighted_kmeans(cand, w, k, seed)
    return cents, passes


def _local_weighted_kmeans(cand: np.ndarray, w: np.ndarray, k: int,
                           seed: int, iters: int = 10) -> np.ndarray:
    """Driver-side weighted k-means++ seeding + weighted Lloyd over
    the ≤ l·rounds collected candidates (the Bahmani re-cluster
    step).  Deterministic: heaviest candidate first, then seeded
    PCG64 D²-weighted draws; candidate count is O(k log k), so this
    is cheap relative to any distributed pass."""
    if len(cand) < k:
        raise ValueError(
            f"k={k} but k-means‖ collected only {len(cand)} "
            "candidates — fewer distinct vectors than k?")
    rng = np.random.Generator(np.random.PCG64(seed))
    idx = [int(np.lexsort((np.arange(len(w)), -w))[0])]
    d2 = ((cand - cand[idx[0]]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        p = w * d2
        tot = p.sum()
        if tot <= 0:
            raise ValueError(
                f"k={k} but only {len(idx)} distinct vectors "
                "reachable among k-means‖ candidates")
        j = int(rng.choice(len(cand), p=p / tot))
        idx.append(j)
        d2 = np.minimum(d2, ((cand - cand[j]) ** 2).sum(axis=1))
    cents = cand[idx].copy()
    for _ in range(iters):
        d = ((cand[:, None, :] - cents[None, :, :]) ** 2).sum(axis=-1)
        a = d.argmin(axis=1)
        for j in range(len(cents)):
            m = a == j
            wm = w[m].sum()
            if wm > 0:
                cents[j] = (cand[m] * w[m, None]).sum(axis=0) / wm
    return cents


def _init_farthest(src: DataFrame, id_col: str, vec_col: str, k: int,
                   seed: int) -> tuple:
    """Farthest-first init (Gonzalez 1985 — the deterministic member
    of the k-means++ family): seed with the min-md5-key vector, then
    k−1 distributed argmax-distance passes.  A plain seeded draw can
    land two centroids in one tight blob and Lloyd cannot escape that
    local optimum; farthest-first provably 2-approximates the
    k-center objective and separates distinct blobs.  k−1 sequential
    full scans: right for small k, a scale-killer at SemDeDup's
    published k — use ``init="parallel"`` there.
    Returns (centroids [k,dim], n_passes)."""
    spark = src.sparkSession
    cents_list = [_first_center(src, id_col, vec_col, seed)]
    passes = 1
    far_schema = f"d2 double, {id_col} long, vec array<double>"
    for _ in range(k - 1):
        bc0 = spark.sparkContext.broadcast(
            np.array(cents_list, dtype=np.float64))

        def far_partials(batches):
            c = bc0.value
            best = None
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                _, d2 = _assign_batch(mat, c)
                # ties to the SMALLEST id so any partitioning picks
                # the same next centroid — both across batches (the
                # cross-partition max below) and WITHIN the batch:
                # argmax alone picks first-row-position among equals,
                # which depends on partition layout
                tie = np.flatnonzero(d2 == d2.max())
                ids = pdf[id_col].to_numpy()[tie]
                j = int(tie[int(ids.argmin())])
                cand = (float(d2[j]), int(ids.min()), mat[j])
                if (best is None or cand[0] > best[0]
                        or (cand[0] == best[0] and cand[1] < best[1])):
                    best = cand
            if best is not None:
                yield pd.DataFrame({"d2": [best[0]],
                                    id_col: [best[1]],
                                    "vec": [best[2]]})

        rows = src.mapInPandas(far_partials, schema=far_schema).collect()
        passes += 1
        if not rows:
            break
        nxt = max(rows, key=lambda r: (r["d2"], -r[id_col]))
        bc0.destroy()
        # the kernel's expanded-form distance leaves ~1e-10 residue
        # even for bit-identical vectors; recompute the candidate's
        # true distance subtractively before deciding it is "new"
        v = np.asarray(nxt["vec"], dtype=np.float64)
        d_true = float(((v - np.array(cents_list)) ** 2).sum(axis=1)
                       .min())
        if d_true <= 0.0:
            break        # every remaining vector duplicates a centroid
        cents_list.append(v)
    if len(cents_list) < k:
        raise ValueError(f"k={k} but only {len(cents_list)} distinct "
                         "vectors reachable")
    return np.array(cents_list, dtype=np.float64), passes


def kmeans_fit(df: DataFrame, id_col: str, vec_col: str, k: int = 8,
               n_iters: int = 5, seed: int = 0,
               init: str = "farthest",
               oversample: float | None = None,
               stats_out: dict | None = None):
    """Fit k centroids; returns ``(centroids [k,dim] float64,
    inertia_per_iteration list)``.

    ``init``:
    * ``"farthest"`` (default) — Gonzalez farthest-first: best
      separation for small k, but k−1 sequential full scans.
    * ``"parallel"`` — k-means‖ (Bahmani et al. 2012): O(log k)
      distributed passes; the only init that can run at SemDeDup's
      published k (tens of thousands) over a 100-TB vector table.
    ``oversample`` is k-means‖'s per-round factor l (default 2k).
    ``stats_out``, when given a dict, receives
    ``{"distributed_passes": n}`` covering init + Lloyd — the
    testable scale contract.

    Empty clusters keep their previous centroid.  ``inertia[i]`` is
    the total squared distance measured during iteration i's
    assignment pass (against the centroids entering that iteration),
    so the sequence is non-increasing by Lloyd's argument.
    """
    if k <= 0 or n_iters <= 0:
        raise ValueError("k and n_iters must be positive")
    spark = df.sparkSession
    ensure_shipped(spark)
    # iterative op: the projected (id, vec) frame is read by every
    # init and Lloyd pass — persist it for the fit's duration
    # (MEMORY_AND_DISK: spills, never recomputes the upstream
    # lineage), released before returning
    src = ensure_parallelism(df.select(id_col, vec_col)).persist()
    try:
        if init == "farthest":
            cents, passes = _init_farthest(src, id_col, vec_col, k, seed)
        elif init == "parallel":
            cents, passes = _init_parallel(src, id_col, vec_col, k,
                                           seed, oversample)
        else:
            raise ValueError(f"unknown init {init!r} "
                             "(use 'farthest' or 'parallel')")
        dim = cents.shape[1]
        inertia: list = []
        cents, passes = _lloyd(src, id_col, vec_col, cents, k, dim,
                               n_iters, inertia, passes)
    finally:
        src.unpersist()
    if stats_out is not None:
        stats_out["distributed_passes"] = passes
    return cents, inertia


def _lloyd(src: DataFrame, id_col: str, vec_col: str,
           cents: np.ndarray, k: int, dim: int, n_iters: int,
           inertia: list, passes: int) -> tuple:
    """Lloyd iterations over the persisted (id, vec) frame; appends
    per-iteration SSE to ``inertia``; returns (centroids, passes)."""
    spark = src.sparkSession
    schema = "cluster int, count long, sse double, csum array<double>"
    for _ in range(n_iters):
        bc = spark.sparkContext.broadcast(cents)

        def partials(batches):
            c = bc.value
            kk, d = c.shape
            sums = np.zeros((kk, d))
            counts = np.zeros(kk, dtype=np.int64)
            sse = np.zeros(kk)
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                a, d2 = _assign_batch(mat, c)
                np.add.at(sums, a, mat)
                np.add.at(counts, a, 1)
                np.add.at(sse, a, d2)
            live = np.nonzero(counts)[0]
            yield pd.DataFrame({
                "cluster": live.astype(np.int32),
                "count": counts[live],
                "sse": sse[live],
                "csum": [sums[i] for i in live]})

        # bounded driver reduce: ≤ partitions·k rows of k·dim floats,
        # summed in sorted order for a deterministic accumulation
        rows = sorted(src.mapInPandas(partials, schema=schema).collect(),
                      key=lambda r: (r["cluster"], -r["count"],
                                     r["sse"]))
        passes += 1
        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        total_sse = 0.0
        for r in rows:
            sums[r["cluster"]] += np.asarray(r["csum"])
            counts[r["cluster"]] += r["count"]
            total_sse += r["sse"]
        inertia.append(float(total_sse))
        live = counts > 0
        cents = cents.copy()
        cents[live] = sums[live] / counts[live, None]
        bc.destroy()
    return cents, passes


def kmeans_assign(df: DataFrame, centroids: np.ndarray,
                  vec_col: str, out_col: str = "cluster") -> DataFrame:
    """Map-side nearest-centroid assignment (no shuffle): ``df`` plus
    an int ``out_col``."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    spark = df.sparkSession
    ensure_shipped(spark)
    bc = spark.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.float64))
    schema = StructType(list(df.schema.fields)
                        + [StructField(out_col, IntegerType())])

    def kernel(batches):
        c = bc.value
        for pdf in batches:
            out = pdf.copy()
            if len(pdf):
                mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                a, _ = _assign_batch(mat, c)
                out[out_col] = a.astype(np.int32)
            else:
                out[out_col] = pd.Series([], dtype="int32")
            yield out

    return ensure_parallelism(df).mapInPandas(kernel, schema=schema)

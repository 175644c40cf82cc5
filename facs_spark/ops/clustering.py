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


def kmeans_fit(df: DataFrame, id_col: str, vec_col: str, k: int = 8,
               n_iters: int = 5, seed: int = 0):
    """Fit k centroids; returns ``(centroids [k,dim] float64,
    inertia_per_iteration list)``.

    Init: the k vectors with the smallest md5('<seed>:'||id) order
    keys (a uniform deterministic draw, engine-replayable).  Empty
    clusters keep their previous centroid.  ``inertia[i]`` is the
    total squared distance measured during iteration i's assignment
    pass (against the centroids entering that iteration), so the
    sequence is non-increasing by Lloyd's argument.
    """
    if k <= 0 or n_iters <= 0:
        raise ValueError("k and n_iters must be positive")
    spark = df.sparkSession
    ensure_shipped(spark)
    # iterative op: the projected (id, vec) frame is read k−1 times
    # by the init and n_iters times by Lloyd — persist it for the
    # fit's duration (MEMORY_AND_DISK: spills, never recomputes the
    # upstream lineage), released before returning
    src = ensure_parallelism(df.select(id_col, vec_col)).persist()

    # farthest-first init (Gonzalez 1985 — the deterministic member
    # of the k-means++ family): seed with the min-md5-key vector,
    # then k−1 distributed argmax-distance passes.  A plain seeded
    # draw can land two centroids in one tight blob and Lloyd cannot
    # escape that local optimum; farthest-first provably 2-approximates
    # the k-center objective and separates distinct blobs.
    key = F.md5(F.concat(F.lit(f"{seed}:"),
                         F.col(id_col).cast("string")))
    first = (src.orderBy(key.asc(), F.col(id_col).asc())
             .limit(1).collect())
    if not first:
        raise ValueError("kmeans_fit on an empty frame")
    cents_list = [np.asarray(first[0][vec_col], dtype=np.float64)]
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
        src.unpersist()
        raise ValueError(f"k={k} but only {len(cents_list)} distinct "
                         "vectors reachable")
    cents = np.array(cents_list, dtype=np.float64)
    dim = cents.shape[1]

    schema = "cluster int, count long, sse double, csum array<double>"
    inertia = []
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
    src.unpersist()
    return cents, inertia


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

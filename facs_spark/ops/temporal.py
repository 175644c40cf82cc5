"""Event-time operators Spark lacks natively: as-of join and
gap-based sessionization.

Both are staples of weblog / market-data / training-telemetry
pipelines, and both are re-expressed Spark-first as ONE keyed shuffle
plus in-partition window work — never a join explosion:

* ``asof_join`` — for each left row, the single right row with the
  greatest right ts ≤ left ts (backward; ``forward`` mirrors it) per
  key.  The naive Spark shape (equi-join on key + filter + row_number)
  materializes |left per key| × |right per key| rows before pruning —
  quadratic in key multiplicity, fatal on a hot key at 10¹² rows.
  This implementation is the union-and-fill pattern: tag both sides,
  union (schema-aligned), ONE window partitioned by key and ordered
  by (ts, side) carries the last non-null right payload forward, then
  keep left rows.  Cost: one shuffle of left+right rows on the key,
  one in-partition sort — the same price as the window the SQL
  engines use, linear in input.
* ``sessionize`` — split each key's ordered event stream into
  sessions wherever the gap to the previous event exceeds ``gap``;
  session ids are a running sum over a lag comparison.  One window
  (one shuffle on the key), no self-join.

Skewed keys ride Spark's AQE skew handling for the exchange; the
in-partition sort is the unavoidable cost of event-time semantics
(identical to what ``SESSION_WINDOW``/``ASOF JOIN`` cost in engines
that ship them).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_SIDE, _RP = "_asof_side", "_asof_rp"


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              ts_col: str, direction: str = "backward",
              tolerance: str | None = None,
              suffix: str = "_right",
              skew_bucket: str | None = None) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the columns of the
    single ``right`` row with the same ``on`` key and the greatest
    ``ts_col`` ≤ left's (``direction="backward"``; ``"forward"`` takes
    the smallest ts ≥ left's).  Ties (equal ts) match — the inclusive
    convention DuckDB's ``ASOF JOIN`` and pandas ``merge_asof`` use.
    Unmatched left rows keep nulls in the right columns (left join).

    ``tolerance``: an SQL interval string ("30 minutes"); matches
    farther than that from the left ts are nulled out.

    ``skew_bucket``: the hot-key escape hatch.  The plain shape
    windows by key alone, so ONE key holding a large fraction of both
    sides becomes one giant sorted partition.  With
    ``skew_bucket="1 day"`` (any interval; ``ts_col`` must be a
    timestamp) the window partitions by (key, time-bucket) — bounded
    by the bucket's traffic — and a second tiny pass carries the last
    right payload across bucket boundaries: per-(key, bucket) last
    right payloads (one agg row per bucket), a per-key running carry
    over those rows, joined back and coalesced under the local fill.
    Results are identical to the plain shape (tested); the extra cost
    is one agg + one join on a |keys × buckets|-row table.

    Null semantics follow SQL joins (the DuckDB ASOF convention this
    op is oracle-checked against): right rows with a null ``ts_col``
    or a null key never match anything; left rows with a null
    ``ts_col`` or a null key are kept but get null right columns
    (null never equals null).  Multiple right rows sharing an exact
    (key, ts) make the winner order-dependent — dedup the right side
    first if the data allows that.

    Right columns that collide with left column names are renamed with
    ``suffix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got "
                         f"{direction!r}")
    backward = direction == "backward"
    keys = [on] if isinstance(on, str) else list(on)
    for c in (*keys, ts_col):
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"asof_join: column {c!r} must exist on "
                             "both sides")
    reserved = {_SIDE, _RP, "_asof_bkt", "_asof_carry", "_asof_ts"}
    hit = reserved & (set(left.columns) | set(right.columns))
    if hit:
        raise ValueError(f"asof_join: column names {sorted(hit)} are "
                         "reserved internals — rename them first")
    r_payload = [c for c in right.columns if c not in keys and c != ts_col]
    if not r_payload:
        raise ValueError("asof_join: right side has no payload columns")
    out_names = {c: (c + suffix if c in left.columns else c)
                 for c in r_payload}
    # right ts rides inside the payload so tolerance can see it;
    # null-ts AND null-key right rows are dropped up front — a null key
    # must match nothing (SQL join semantics), but the window's
    # partitionBy would group null keys together and pair them up
    not_null_right = F.col(ts_col).isNotNull()
    for k in keys:
        not_null_right = not_null_right & F.col(k).isNotNull()
    r2 = (right.filter(not_null_right)
          .select(*keys, F.col(ts_col), F.lit(0).alias(_SIDE),
                  F.struct(F.col(ts_col).alias("_asof_ts"),
                           *[F.col(c) for c in r_payload]).alias(_RP)))
    l2 = left.select("*", F.lit(1).alias(_SIDE))
    unioned = l2.unionByName(r2, allowMissingColumns=True)
    order = [F.col(ts_col).asc() if backward else F.col(ts_col).desc(),
             F.col(_SIDE).asc()]

    if skew_bucket is None:
        w = (Window.partitionBy(*keys).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        filled = F.last(_RP, ignorenulls=True).over(w)
        matched = unioned.withColumn(_RP, filled)
    else:
        bkt = "_asof_bkt"
        # arithmetic epoch bucketing, NOT F.window(): Catalyst rewrites
        # the time-window expression into an Expand + ts-not-null
        # filter, which would silently DROP null-ts left rows from the
        # output; floor(unix_micros/width) groups identically (epoch-
        # aligned, like window()'s default) and is null-preserving.
        # width is a constant-folded literal: epoch + interval.
        iv_us = F.unix_micros(F.timestamp_seconds(F.lit(0))
                              + F.expr(f"INTERVAL {skew_bucket}"))
        u = unioned.withColumn(
            bkt, F.floor(F.unix_micros(F.col(ts_col)) / iv_us))
        # pass 1: fill within (key, bucket) — partition size bounded
        # by the bucket's traffic, hot key or not
        w = (Window.partitionBy(*keys, bkt).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        local = F.last(_RP, ignorenulls=True).over(w)
        # pass 2: each bucket's boundary payload (the right row a
        # neighboring bucket would carry over), then a per-key running
        # carry over the strictly-previous buckets in scan order
        bound_ts = F.when(F.col(_SIDE) == 0, F.col(ts_col))
        boundary = (F.max_by(_RP, bound_ts) if backward
                    else F.min_by(_RP, bound_ts))
        lasts = u.groupBy(*keys, bkt).agg(boundary.alias("_bl"))
        wc = (Window.partitionBy(*keys)
              .orderBy(F.col(bkt).asc() if backward else F.col(bkt).desc())
              .rowsBetween(Window.unboundedPreceding, -1))
        carry = (lasts.withColumn(
            "_asof_carry", F.last("_bl", ignorenulls=True).over(wc))
            .select(*keys, bkt, "_asof_carry"))
        matched = (u.withColumn(_RP, local)
                   .join(carry, [*keys, bkt], "left")
                   .withColumn(_RP, F.coalesce(F.col(_RP),
                                               F.col("_asof_carry"))))

    filled = F.col(_RP)
    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        in_tol = (filled["_asof_ts"] >= F.col(ts_col) - iv if backward
                  else filled["_asof_ts"] <= F.col(ts_col) + iv)
        filled = F.when(in_tol, filled)
    # a left row with a null ts or null key matches nothing: under
    # desc ordering Spark sorts null ts LAST, so the window fill would
    # otherwise hand a forward-direction null-ts row the smallest-ts
    # right payload (and backward would hand it null — inconsistent)
    left_matchable = F.col(ts_col).isNotNull()
    for k in keys:
        left_matchable = left_matchable & F.col(k).isNotNull()
    filled = F.when(left_matchable, filled)
    matched = matched.withColumn(_RP, filled).filter(F.col(_SIDE) == 1)
    return matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col(_RP)[c].alias(out_names[c]) for c in r_payload])


def range_join(points: DataFrame, intervals: DataFrame, point_col: str,
               start_col: str, end_col: str,
               on: list[str] | str | None = None,
               bin_width: float | int = None,
               max_bins: int = 4096) -> DataFrame:
    """Inner join of point rows to every interval row with
    ``start ≤ point ≤ end`` (plus optional equality keys ``on``) —
    the inequality-join shape Spark plans as a BroadcastNestedLoop /
    cartesian product, re-expressed as a BIN EQUI-JOIN:

    * every point maps to bin ``floor(point / bin_width)``;
    * every interval explodes to the bins it covers (``sequence`` of
      floor(start/w)..floor(end/w) — at most interval_length/w + 1
      rows);
    * the join is a plain equi-join on (keys…, bin) followed by the
      exact residual predicate.

    Cost: shuffle of points + bin-exploded intervals on (keys, bin),
    candidate pairs only within a bin — linear in output for
    well-chosen ``bin_width`` (pick ≈ the typical interval length:
    wider bins → fewer interval copies but more in-bin candidates;
    narrower → the reverse).  A duplicate match through two bins is
    impossible: each point lives in exactly ONE bin.

    ``max_bins`` is the skew guard: an interval covering more than
    ``max_bins`` bins (a degenerate all-time interval) would explode
    the build side — the kernel raises through ``raise_error`` with
    the offending width rather than melting the shuffle; split such
    intervals upstream or widen ``bin_width``.

    Columns must be numeric (cast timestamps to epoch first — one
    ``.cast("timestamp").cast("long")`` under an explicit session
    timezone).  Interval columns that collide with point column names
    must be renamed by the caller (checked).
    """
    if bin_width is None or bin_width <= 0:
        raise ValueError("range_join needs a positive bin_width")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    clash = (set(intervals.columns) - set(keys)) & set(points.columns)
    if clash:
        raise ValueError(f"rename interval columns {sorted(clash)}: they "
                         "collide with point columns")
    if "_rj_bin" in (*points.columns, *intervals.columns):
        raise ValueError("range_join: column name '_rj_bin' is a "
                         "reserved internal — rename it first")
    w = F.lit(bin_width)
    pb = points.withColumn("_rj_bin", F.floor(F.col(point_col) / w))
    lo, hi = F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w)
    nbins = hi - lo + 1
    # the sequence bound is CLAMPED structurally (not just guarded):
    # Catalyst constant-folds literal expressions at plan time, and a
    # degenerate literal interval would materialize its full bin array
    # before any runtime guard ran — the clamp keeps every sequence
    # ≤ max_bins+1 elements while the raise_error branch still fires
    # for oversized intervals
    guarded = F.when(
        nbins > max_bins,
        F.raise_error(F.concat(
            F.lit(f"range_join: interval covers more than {max_bins} "
                  "bins (width "),
            (F.col(end_col) - F.col(start_col)).cast("string"),
            F.lit(f" at bin_width {bin_width}); split the interval or "
                  "widen bin_width")))
    ).otherwise(F.sequence(lo, F.least(hi, lo + F.lit(max_bins))))
    ib = (intervals.withColumn("_rj_bin", F.explode(guarded)))
    joined = pb.join(ib, [*keys, "_rj_bin"]).filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col)))
    return joined.drop("_rj_bin")


def sessionize(df: DataFrame, on: list[str] | str, ts_col: str,
               gap: str = "30 minutes",
               session_col: str = "session_id") -> DataFrame:
    """Gap-based sessions per key: a new session starts at each row
    whose gap to the key's previous event exceeds ``gap`` (strictly —
    an exactly-``gap`` pause stays in-session).  Adds ``session_col``,
    a 1-based running session number per key; rows with a null
    ``ts_col`` sort first and open the key's first session (document
    your nulls away — event time should not be null).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if session_col in df.columns:
        raise ValueError(f"column {session_col!r} already exists")
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    prev = F.lag(ts_col).over(w)
    new_sess = (prev.isNull()
                | (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap}"))
                ).cast("long")
    run = (Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(session_col, F.sum(new_sess).over(run))


def band_count_min(points: DataFrame, refs: DataFrame,
                   on: list[str] | str, ts_col: str, band: int,
                   point_id_col: str, ref_id_col: str,
                   block_width: int | None = None) -> DataFrame:
    """For every point row, the COUNT of ref rows with the same key
    within ``|ref_ts − point_ts| ≤ band`` plus the MIN of their
    ``ref_id_col`` — i.e. the aggregate of the symmetric range join
    ``point BETWEEN ref_ts − band AND ref_ts + band`` WITHOUT ever
    materializing the matched pairs.

    ``range_join`` + groupBy is output-bound: each point matches
    ~density × 2·band refs, so the join ships O(n · density) rows
    through two exchanges just to count them (at sf1.0 q41 that is
    ~110M rows for 200k output rows).  Here the timeline is cut into
    blocks of ``block_width`` (default 32×band), refs are replicated
    into every block their ±band reach touches (~1.03 copies at the
    default width), and a per-(key, block) numpy kernel computes each
    point's count with two ``searchsorted`` probes and its min-id
    with a sparse-table range-minimum query — O((n/blocks) log)
    per task, one shuffle of (key, block) rows, output rows only.

    Points with a count of 0 are omitted (inner-join semantics).
    Null keys/timestamps never match (SQL semantics) and are dropped.
    ``ts_col`` must be integral (epoch seconds); ``point_id_col`` /
    ``ref_id_col`` must be integral and non-null.
    """
    keys = [on] if isinstance(on, str) else list(on)
    w = int(block_width or 32 * band)
    if w < band:
        raise ValueError("block_width must be ≥ band")
    not_null = F.col(ts_col).isNotNull()
    for k in keys:
        not_null = not_null & F.col(k).isNotNull()
    p = (points.filter(not_null)
         .select(*keys, F.col(ts_col).cast("long").alias("_ts"),
                 F.col(point_id_col).cast("long").alias("_id"),
                 F.lit(0).cast("int").alias("_side"),
                 F.floor(F.col(ts_col).cast("long") / w).alias("_blk")))
    lo = F.floor((F.col(ts_col).cast("long") - band) / w)
    hi = F.floor((F.col(ts_col).cast("long") + band) / w)
    r = (refs.filter(not_null)
         .select(*keys, F.col(ts_col).cast("long").alias("_ts"),
                 F.col(ref_id_col).cast("long").alias("_id"),
                 F.lit(1).cast("int").alias("_side"),
                 F.explode(F.sequence(lo, hi)).alias("_blk")))
    both = p.unionByName(r)

    bnd = int(band)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        empty = pd.DataFrame({point_id_col: pd.Series(dtype="int64"),
                              "_n": pd.Series(dtype="int64"),
                              "_min": pd.Series(dtype="int64")})
        side = pdf["_side"].to_numpy()
        is_pt = side == 0
        if not is_pt.any() or is_pt.all():
            return empty
        ts = pdf["_ts"].to_numpy(dtype=np.int64)
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        p_ts = ts[is_pt]
        p_id = ids[is_pt]
        r_ts = ts[~is_pt]
        r_id = ids[~is_pt]
        order = np.argsort(r_ts, kind="stable")
        r_ts, r_id = r_ts[order], r_id[order]
        lo_i = np.searchsorted(r_ts, p_ts - bnd, side="left")
        hi_i = np.searchsorted(r_ts, p_ts + bnd, side="right")
        n = hi_i - lo_i
        keep = n > 0
        if not keep.any():
            return empty
        lo_i, hi_i = lo_i[keep], hi_i[keep]
        # sparse-table RMQ over r_id in ts order: O(n log n) build,
        # O(1) vectorized query per point
        m = r_id.size
        levels = max(1, int(np.floor(np.log2(m))) + 1)
        st = [r_id]
        for k in range(1, levels):
            half = 1 << (k - 1)
            prev = st[-1]
            if prev.size <= half:
                break
            st.append(np.minimum(prev[:-half], prev[half:]))
        span = hi_i - lo_i
        k = np.floor(np.log2(span)).astype(np.int64)
        mins = np.empty(span.size, dtype=np.int64)
        for kk in np.unique(k):
            sel = k == kk
            tab = st[kk]
            a = tab[lo_i[sel]]
            b = tab[hi_i[sel] - (1 << kk)]
            mins[sel] = np.minimum(a, b)
        return pd.DataFrame({point_id_col: p_id[keep],
                             "_n": n[keep].astype(np.int64),
                             "_min": mins})

    out_schema = f"{point_id_col} long, _n long, _min long"
    return (both.groupBy(*keys, "_blk")
            .applyInPandas(kernel, schema=out_schema)
            .withColumnRenamed("_n", "n_in_band")
            .withColumnRenamed("_min", "min_ref_id"))

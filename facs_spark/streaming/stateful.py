"""Custom stateful streaming operator: running grouped sketches via
``applyInPandasWithState``.

The batch engine's grouped sketches (`ops/sketch_agg.grouped_sketches`)
recompute from scratch per run; the streaming variant keeps ONE
serialized sketch blob per group in Spark's state store and folds each
micro-batch into it — the mergeable-UDAF property (associative
combine, the north rule) is exactly what makes the state update sound:

    state' = merge(state, sketch(batch))  ==  sketch(all rows so far)

State size is the sketch blob (KBs for HLL/KLL/t-digest/CMS), so
10⁶ groups cost GBs of state store, independent of stream length.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

STATE_DDL = "sketch binary, rows_seen long"
OUT_DDL = ("group_key string, rows_seen long, estimate double, "
           "sketch binary")


def streaming_grouped_sketch(pages: DataFrame, spec,
                             key_col: str = "lang") -> DataFrame:
    """Per-group running sketch over a stream — any ``SketchSpec``
    (bloom / hll / cms / tdigest / kll / theta / mg / ams / cbf; the
    spec's ``update`` is the same code the batch UDAF runs).

    Emits one row per group per micro-batch with the cumulative
    ``rows_seen``, a scalar ``estimate`` (distinct count for HLL,
    median for the quantile sketches, inserts for Bloom, NaN for CMS
    whose queries are per-key), and the serialized sketch — so a
    downstream job can merge monitor outputs across streams; blobs
    stay mergeable end-to-end.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def scalar_estimate(sk) -> float:
        if hasattr(sk, "estimate"):
            try:
                return float(sk.estimate())
            except TypeError:
                # Misra-Gries: estimate(key) is per-key; the scalar
                # monitor column reports tracked-entry count instead
                return float(len(sk.counters))
        if hasattr(sk, "quantile"):
            try:
                return float(sk.quantile(0.5))
            except (ValueError, IndexError):
                return float("nan")
        if hasattr(sk, "inserts"):
            return float(sk.inserts)
        return float("nan")

    def fold(key, pdf_iter, state):
        from facs_spark.sketch import sketch_from_bytes
        if state.exists:
            blob, seen = state.get
            sk = sketch_from_bytes(bytes(blob))
        else:
            sk, seen = spec.new_sketch(), 0
        for pdf in pdf_iter:
            seen += spec.update(sk, pdf[spec.column])
        blob = sk.to_bytes()
        state.update((blob, seen))
        yield pd.DataFrame([{"group_key": key[0], "rows_seen": seen,
                             "estimate": scalar_estimate(sk),
                             "sketch": blob}])

    return (pages.select(key_col, spec.column)
            .groupBy(key_col)
            .applyInPandasWithState(fold, OUT_DDL, STATE_DDL, "update",
                                    GroupStateTimeout.NoTimeout))


def streaming_grouped_hll(pages: DataFrame, key_col: str = "lang",
                          value_col: str = "url", p: int = 12) -> DataFrame:
    """Per-group running HLL distinct count over a stream (the
    ``streaming_grouped_sketch`` special case the monitor uses)."""
    from ..ops.sketch_agg import SketchSpec
    return streaming_grouped_sketch(
        pages, SketchSpec.make("hll", value_col, p=p), key_col=key_col)

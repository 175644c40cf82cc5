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


def streaming_grouped_hll(pages: DataFrame, key_col: str = "lang",
                          value_col: str = "url", p: int = 12) -> DataFrame:
    """Per-group running HLL distinct count over a stream.

    Emits one row per group per micro-batch with the cumulative
    ``rows_seen``, the current ``estimate``, and the serialized sketch
    (so a downstream job can merge monitor outputs across streams —
    blobs stay mergeable end-to-end).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fold(key, pdf_iter, state):
        from facs_spark.sketch import HyperLogLog, sketch_from_bytes
        if state.exists:
            blob, seen = state.get
            h = sketch_from_bytes(bytes(blob))
        else:
            h, seen = HyperLogLog(p=p), 0
        for pdf in pdf_iter:
            h.update_batch(pdf[value_col].astype(str).tolist())
            seen += len(pdf)
        blob = h.to_bytes()
        state.update((blob, seen))
        yield pd.DataFrame([{"group_key": key[0], "rows_seen": seen,
                             "estimate": float(h.estimate()),
                             "sketch": blob}])

    return (pages.select(key_col, value_col)
            .groupBy(key_col)
            .applyInPandasWithState(fold, OUT_DDL, STATE_DDL, "update",
                                    GroupStateTimeout.NoTimeout))

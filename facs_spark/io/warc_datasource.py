"""WARC as a first-class Spark data source (PySpark 4 Python Data
Source API): ``spark.read.format("warc").load(path)`` and
``spark.readStream.format("warc").load(path)``.

The batch reader plans the SAME byte-range splits as
``io/warc.read_warc`` (one shared planner, ``plan_warc_tasks``) —
each ``InputPartition`` is one (path, start, end) slice with
validated record realignment in the task — but surfaces them through
the engine's native source interface, so WARC scans participate in
normal reader wiring (format/option/load, column pruning by Spark
after the scan) instead of the mapInPandas wrapper.  Tasks hand
Spark Arrow RecordBatches (UTC-instant timestamps), not per-row
tuples.

The stream reader is a ``SimpleDataSourceStreamReader`` over a drop
directory.  An offset is the LIST OF FILE NAMES already consumed —
not an index into a re-sorted listing — so a late-arriving file that
sorts before consumed ones is still ingested exactly once, nothing is
re-ingested, and ``readBetweenOffsets`` replays a committed range
verbatim (the exactly-once replay contract).

Register once per session:

    from facs_spark.io.warc_datasource import WarcDataSource
    spark.dataSource.register(WarcDataSource)
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)

from .warc import (DEFAULT_SPLIT_BYTES, WARC_SCHEMA, _read_task,
                   plan_warc_tasks)


def _arrow_batches(pdf):
    """pandas → Arrow RecordBatch with the exact Spark-side types
    (timestamps tz-aware UTC: the true instant under any session
    timezone)."""
    import pyarrow as pa
    schema = pa.schema([("url", pa.string()),
                        ("warc_ts", pa.timestamp("us", tz="UTC")),
                        ("rec_type", pa.string()),
                        ("content_type", pa.string()),
                        ("payload", pa.binary()),
                        ("source_file", pa.string())])
    tbl = pa.Table.from_pandas(pdf, schema=schema,
                               preserve_index=False)
    yield from tbl.to_batches()


class WarcPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path, self.start, self.end = path, start, end


class WarcBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source needs .load(<path>)")
        self.split_bytes = int(options.get("split_bytes",
                                           DEFAULT_SPLIT_BYTES))

    def partitions(self):
        return [WarcPartition(p, s, e)
                for p, s, e in plan_warc_tasks(self.path,
                                               self.split_bytes)]

    def read(self, partition: WarcPartition):
        pdf = _read_task(partition.path, partition.start,
                         partition.end)
        yield from _arrow_batches(pdf)


class WarcStreamReader(SimpleDataSourceStreamReader):
    """Micro-batches over a WARC drop directory; the offset is the
    list of consumed file names (late arrivals ingest exactly once)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source needs .load(<path>)")

    def _files(self) -> list[str]:
        if _glob.has_magic(self.path):
            return sorted(_glob.glob(self.path))
        if os.path.isdir(self.path):
            return sorted(
                _glob.glob(os.path.join(self.path, "*.warc"))
                + _glob.glob(os.path.join(self.path, "*.warc.gz")))
        return [self.path] if os.path.exists(self.path) else []

    def initialOffset(self):
        return {"files": []}

    def read(self, start):
        seen = set(start["files"])
        new = [f for f in self._files() if f not in seen]
        end = {"files": start["files"] + new}
        return iter(self._rows(new)), end

    def readBetweenOffsets(self, start, end):
        n = len(start["files"])
        return iter(self._rows(end["files"][n:]))

    def _rows(self, files):
        # a list_iterator is returned by callers, NOT a generator: the
        # prefetch wrapper both calls next() on it (empty-batch
        # validation) and pickles the cached iterator to the JVM.
        # warc_ts values are tz-aware UTC (the converter normalizes
        # aware datetimes to the correct instant).
        rows = []
        for f in files:
            s = -1 if f.endswith(".gz") else 0
            e = -1 if s < 0 else os.path.getsize(f)
            pdf = _read_task(f, s, e)
            for r in pdf.itertuples(index=False):
                rows.append((r.url, r.warc_ts, r.rec_type,
                             r.content_type, r.payload,
                             r.source_file))
        return rows


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema) -> WarcBatchReader:
        return WarcBatchReader(self.options)

    def simpleStreamReader(self, schema) -> WarcStreamReader:
        return WarcStreamReader(self.options)

"""WARC as a first-class Spark data source (PySpark 4 Python Data
Source API): ``spark.read.format("warc").load(path)`` and
``spark.readStream.format("warc").load(path)``.

The batch reader plans the SAME byte-range splits as
``io/warc.read_warc`` — each ``InputPartition`` is one (path, start,
end) slice with record realignment in the task — but surfaces them
through the engine's native source interface, so WARC scans
participate in normal reader wiring (format/option/load, column
pruning by Spark after the scan) instead of the mapInPandas wrapper.
Tasks hand Spark Arrow RecordBatches, not per-row tuples.

The stream reader is a ``SimpleDataSourceStreamReader`` over a drop
directory: an offset is the count of files consumed from the sorted
listing (crawl drops are append-only; the ``2`` suffix ordering of
``_q47_stage`` is the same convention), each micro-batch ingests the
newly-arrived files, and ``readBetweenOffsets`` replays any committed
range exactly — the engine's replay/recovery contract.

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

from .warc import DEFAULT_SPLIT_BYTES, WARC_SCHEMA, _read_task


def _plan(paths: str, split_bytes: int) -> list[tuple[str, int, int]]:
    files = sorted(_glob.glob(paths)) if _glob.has_magic(paths) else (
        sorted(_glob.glob(os.path.join(paths, "*.warc"))
               + _glob.glob(os.path.join(paths, "*.warc.gz")))
        if os.path.isdir(paths) else [paths])
    if not files:
        raise FileNotFoundError(f"no WARC files match {paths!r}")
    tasks: list[tuple[str, int, int]] = []
    for p in files:
        if p.endswith(".gz"):
            tasks.append((p, -1, -1))
            continue
        size = os.path.getsize(p)
        start = 0
        while start < size or size == 0:
            end = min(start + split_bytes, size)
            tasks.append((p, start, end))
            start = end
            if size == 0:
                break
    return tasks


def _arrow_batches(pdf):
    """pandas → Arrow RecordBatch with the exact Spark-side types."""
    import pyarrow as pa
    schema = pa.schema([("url", pa.string()),
                        ("warc_ts", pa.timestamp("us")),
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
                for p, s, e in _plan(self.path, self.split_bytes)]

    def read(self, partition: WarcPartition):
        pdf = _read_task(partition.path, partition.start,
                         partition.end)
        yield from _arrow_batches(pdf)


class WarcStreamReader(SimpleDataSourceStreamReader):
    """Micro-batches over a WARC drop directory; offset = number of
    files consumed from the stable sorted listing."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source needs .load(<path>)")

    def _files(self) -> list[str]:
        return sorted(_plan_files_for_stream(self.path))

    def initialOffset(self):
        return {"index": 0}

    def read(self, start):
        files = self._files()
        end = {"index": len(files)}
        new = files[start["index"]:]
        return iter(self._rows(new)), end

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(
            self._files()[start["index"]:end["index"]]))

    def _rows(self, files):
        # a list_iterator, NOT a generator: the prefetch wrapper both
        # calls next() on it (empty-batch validation) and pickles the
        # cached iterator to the JVM; generators don't pickle.
        # The row converter wants tz-AWARE datetimes (it normalizes
        # to UTC); WARC-Date is UTC by spec, so attach it.
        import datetime as _dt
        rows = []
        for f in files:
            s = -1 if f.endswith(".gz") else 0
            e = -1 if s < 0 else os.path.getsize(f)
            pdf = _read_task(f, s, e)
            for r in pdf.itertuples(index=False):
                t = r.warc_ts
                if t is not None and t.tzinfo is None:
                    t = t.tz_localize(_dt.timezone.utc)
                rows.append((r.url, t, r.rec_type, r.content_type,
                             r.payload, r.source_file))
        return rows


def _plan_files_for_stream(path: str) -> list[str]:
    if _glob.has_magic(path):
        return _glob.glob(path)
    if os.path.isdir(path):
        return (_glob.glob(os.path.join(path, "*.warc"))
                + _glob.glob(os.path.join(path, "*.warc.gz")))
    return [path] if os.path.exists(path) else []


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

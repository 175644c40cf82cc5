"""Web-pages table source/sink (the BASELINE input_hint shape).

The north-rule deployment target is an Iceberg table of
Common-Crawl-style pages ``(url string, warc_ts timestamp, html
binary, text string, lang string)`` at 10¹² rows.  This module is the
single place the engine touches that table, so the storage format is
a URI swap, not a code change:

* ``iceberg:catalog.db.table`` → the Iceberg Spark catalog (reads get
  hidden-partition pruning, snapshot isolation, and metadata-only
  planning; ``snapshot_id``/``as_of`` pins time travel for resumable
  re-runs against a frozen snapshot).
* ``snap:/path`` → the local snapshot-manifest format
  (``io/snapshots.py``): the same isolation/time-travel/atomic-commit
  semantics implemented over plain parquet, so they are exercised for
  REAL in this sandbox (which ships no Iceberg runtime jar — the
  Iceberg branch raises a clear error here rather than pretending).
* anything else → a parquet path/glob.

At 10¹² rows the table should be partitioned by something low-card +
time-ish (``days(warc_ts)``) and optionally bucketed by ``url`` hash;
``write_pages`` applies the parquet analogue (partitionBy a derived
date column) so local layouts exercise partition pruning too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# input_hint: Iceberg table of Common-Crawl-style web pages
PAGES_COLUMNS = ("url", "warc_ts", "html", "text", "lang")
_PAGES_TYPES = {"url": "string", "warc_ts": "timestamp", "html": "binary",
                "text": "string", "lang": "string"}


def validate_pages_schema(df: DataFrame, strict: bool = False) -> DataFrame:
    """Check the pages-table contract; returns the (column-pruned) df.

    ``strict`` also checks column types, not just presence.  Extra
    columns (ground-truth labels, ids) are allowed and preserved.
    """
    missing = [c for c in PAGES_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"pages table is missing columns {missing}; "
                         f"expected at least {PAGES_COLUMNS}")
    if strict:
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        bad = {c: types[c] for c in PAGES_COLUMNS
               if types[c] != _PAGES_TYPES[c]}
        if bad:
            raise ValueError(f"pages table column types differ from the "
                             f"contract: {bad} vs {_PAGES_TYPES}")
    return df


def read_pages(spark: SparkSession, source: str,
               snapshot_id: int | None = None,
               validate: bool = True) -> DataFrame:
    """Read the pages table from an Iceberg table or parquet path.

    ``source``: ``iceberg:catalog.db.table`` or a parquet path/glob.
    ``snapshot_id`` pins an Iceberg snapshot (time travel) — the
    storage-level half of resumable runs (ops/checkpoint.py is the
    compute-level half).
    """
    if source.startswith("iceberg:"):
        table = source[len("iceberg:"):]
        try:
            reader = spark.read.format("iceberg")
            if snapshot_id is not None:
                reader = reader.option("snapshot-id", str(snapshot_id))
            df = reader.load(table)
        except Exception as exc:  # no runtime jar / catalog not configured
            raise RuntimeError(
                "Iceberg source requested but the Iceberg Spark runtime "
                "is not available in this session; add "
                "org.apache.iceberg:iceberg-spark-runtime to spark.jars."
            ) from exc
    elif source.startswith("snap:"):
        from .snapshots import read_snaptable
        df = read_snaptable(spark, source, snapshot_id=snapshot_id)
    else:
        if snapshot_id is not None:
            raise ValueError("snapshot_id needs a snapshotted source "
                             "(iceberg: or snap:); plain parquet paths "
                             "have no snapshots")
        df = spark.read.parquet(source)
    return validate_pages_schema(df) if validate else df


def write_pages(df: DataFrame, target: str, mode: str = "append",
                partition_by_day: bool = True) -> None:
    """Write a pages table.  Iceberg targets inherit the table's own
    partition spec (``append`` appends; ``overwrite`` is a DYNAMIC
    partition overwrite — the table and its spec survive, only the
    touched partitions are replaced); parquet targets get the
    ``days(warc_ts)`` analogue (a derived ``warc_day`` partition
    column) so downstream time-range filters prune in either layout."""
    validate_pages_schema(df)
    if target.startswith("iceberg:"):
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unsupported Iceberg write mode {mode!r}; "
                             "use 'append' or 'overwrite'")
        writer = df.writeTo(target[len("iceberg:"):])
        try:
            if mode == "append":
                writer.append()
            else:
                # NOT createOrReplace: that would recreate the table
                # from the DataFrame schema and drop its partition spec
                writer.overwritePartitions()
        except Exception as exc:
            raise RuntimeError(
                "Iceberg sink requested but the Iceberg Spark runtime "
                "is not available in this session; add "
                "org.apache.iceberg:iceberg-spark-runtime to spark.jars."
            ) from exc
        return
    if target.startswith("snap:"):
        from .snapshots import write_snaptable
        write_snaptable(df, target, mode=mode)
        return
    if partition_by_day:
        (df.withColumn("warc_day", F.to_date("warc_ts"))
         .write.mode(mode).partitionBy("warc_day").parquet(target))
    else:
        df.write.mode(mode).parquet(target)

"""SparkSession helpers + package shipping.

``get_spark`` builds a session tuned for the sketch workload (AQE on,
Arrow on, bounded shuffle partitions).  ``ensure_shipped`` zips the
``facs_spark`` package and registers it via ``addPyFile`` so executor
Python workers can import the kernels — the same mechanism as the
production ``spark-submit --py-files`` deployment (north rule), and
the reason every kernel closure here references only top-level module
functions (cloudpickle then pickles them by reference).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_SESSIONS: set[int] = set()


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def package_zip() -> str:
    """Zip the facs_spark package into a temp file (cached per process)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(),
                       f"facs_spark_pkg_{os.getpid()}.zip")
    if not os.path.exists(out):
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
            for base, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(base, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    return out


def ensure_shipped(spark: SparkSession) -> None:
    """Make facs_spark importable on executors (idempotent per session)."""
    key = id(spark.sparkContext)
    if key in _SHIPPED_SESSIONS:
        return
    spark.sparkContext.addPyFile(package_zip())
    _SHIPPED_SESSIONS.add(key)


# A pandas-UDF task costs ~50-100 ms of fixed overhead (task launch,
# Arrow channel, python-worker round-trip) regardless of rows, so a
# kernel partition is only worth scheduling once it carries at least
# this many plan-stat bytes.  ~2 MiB of text is ~0.1 s of shingle
# kernel — comparable to the overhead, the break-even point.
_KERNEL_SPLIT_BYTES = 2 << 20

# Catalyst's size estimate for a file scan is the COMPRESSED file
# size, but kernel cost tracks the decompressed bytes it processes —
# text parquet typically compresses 3-6×, so scale the estimate up
# before dividing by the break-even constant (the same idea as
# spark.sql.sources.fileCompressionFactor, which Catalyst only
# applies to some estimates).  Over-estimating merely adds partitions
# toward the core-count cap; under-estimating serializes the kernel.
_COMPRESSION_FACTOR = 4.0


def _plan_size_bytes(df) -> int | None:
    """Catalyst's optimized-plan size estimate (cheap: file-stat based
    for scans, no job).  None when the estimate is unavailable."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats()
                   .sizeInBytes())
        # Catalyst signals "unknown" with Long.MaxValue-ish sentinels
        return size if 0 <= size < (1 << 60) else None
    except Exception:
        return None


def ensure_parallelism(df, min_partitions: int | None = None):
    """Repartition iff the plan has fewer partitions than the data
    warrants — sized by *bytes*, capped at the core count.

    Small local inputs (one parquet footer < maxPartitionBytes) scan as
    1-2 partitions, serializing CPU-heavy kernels behind them — but
    fanning a 5000-row table out to 32 python-worker tasks costs more
    in per-task overhead than the kernel computes, so the target is
    ``ceil(plan_bytes / _KERNEL_SPLIT_BYTES)`` clamped to
    [1, defaultParallelism].  At cluster scale the condition is false
    (100 TB scans already have ~10⁶ splits) and this is a no-op — no
    gratuitous shuffle.
    """
    if df.isStreaming:  # micro-batch sizing is the trigger's job
        return df
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    if min_partitions is not None:
        target = min_partitions
    else:
        size = _plan_size_bytes(df)
        target = cores if size is None else max(
            1, min(cores, -(-int(size * _COMPRESSION_FACTOR)
                            // _KERNEL_SPLIT_BYTES)))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(app_name: str = "facs_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """local[cpus] session with scale-appropriate defaults.

    The same config block is what a cluster deployment would set: AQE
    for runtime re-planning (skew splits, partition coalescing), Arrow
    for the pandas-UDF hot path, and shuffle partitions sized to the
    parallelism rather than the 200 default.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 2500 rows ≈ cache-resident kernel working set; bigger batches
        # spill the window matrices to DRAM and collapse multi-core
        # scaling (measured: 32-core throughput 3.7× worse at 30k rows)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2500")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    ensure_shipped(spark)
    return spark

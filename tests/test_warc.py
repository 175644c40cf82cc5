"""WARC source/sink: roundtrip fidelity, byte-range split
equivalence (the fastx split-partition model), gzip whole-file
tasks, and loud malformed-input errors."""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from facs_spark.io.synth import synth_pages
from facs_spark.io.warc import read_warc, write_warc
from facs_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    yield get_spark("facs_spark_warc_tests", cpus=4,
                    shuffle_partitions=4)


@pytest.fixture(scope="module")
def pages(spark):
    return (synth_pages(spark, 300, seed=42)
            .select("url", "warc_ts", F.col("html").alias("payload"))
            .cache())


def _diff(a, b) -> int:
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def test_warc_roundtrip(spark, pages, tmp_path):
    d = str(tmp_path / "w")
    n = write_warc(pages, d)
    assert n == 300
    back = read_warc(spark, d + "/part-*.warc")
    assert back.count() == 300
    assert _diff(pages.select("url", "warc_ts", "payload"),
                 back.select("url", "warc_ts", "payload")) == 0
    types = back.select("rec_type", "content_type").distinct().collect()
    assert [(r["rec_type"], r["content_type"]) for r in types] == \
        [("response", "text/html")]


def test_warc_split_equivalence(spark, pages, tmp_path):
    """Tiny byte-range splits partition the file exactly: every record
    parsed once, none lost at boundaries, independent of split size."""
    d = str(tmp_path / "w")
    write_warc(pages, d)
    whole = read_warc(spark, d + "/part-*.warc")
    tiny = read_warc(spark, d + "/part-*.warc", split_bytes=1500)
    assert tiny.rdd.getNumPartitions() > whole.rdd.getNumPartitions()
    assert _diff(whole.select("url", "payload"),
                 tiny.select("url", "payload")) == 0


def test_warc_gzip(spark, pages, tmp_path):
    d = str(tmp_path / "wgz")
    write_warc(pages, d, gzip_out=True)
    assert all(p.endswith(".warc.gz") for p in os.listdir(d))
    back = read_warc(spark, d + "/part-*.warc.gz")
    assert _diff(pages.select("url", "payload"),
                 back.select("url", "payload")) == 0


def test_warc_binary_payload_exact(spark, tmp_path):
    """Payload bytes survive exactly — including CRLFCRLF sequences
    INSIDE the payload (Content-Length framing, not delimiter
    scanning, must govern record extent)."""
    tricky = bytes(range(256)) + b"\r\n\r\nWARC/1.1\r\n" + b"\x00" * 32
    df = spark.createDataFrame(
        [("http://x/1", tricky), ("http://x/2", b"")],
        "url string, payload binary").withColumn(
        "warc_ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    d = str(tmp_path / "wb")
    write_warc(df, d)
    got = {r["url"]: bytes(r["payload"])
           for r in read_warc(spark, d + "/part-*.warc").collect()}
    assert got["http://x/1"] == tricky
    assert got["http://x/2"] == b""


def test_warc_malformed_is_loud(spark, tmp_path):
    bad = tmp_path / "bad.warc"
    bad.write_bytes(b"WARC/1.1\r\nWARC-Type: response\r\n\r\nx")
    with pytest.raises(Exception, match="well-formed WARC record"):
        read_warc(spark, str(bad)).collect()
    trunc = tmp_path / "trunc.warc"
    trunc.write_bytes(b"WARC/1.1\r\nWARC-Type: response\r\n"
                      b"Content-Length: 100\r\n\r\nshort")
    with pytest.raises(Exception, match="truncated"):
        read_warc(spark, str(trunc)).collect()


def test_warc_folded_header_lines(spark, tmp_path):
    """WARC 1.1 permits LWS continuation lines (a header value folded
    across lines, continuations starting with SP/TAB).  Spec-legal
    crawl input must parse, with the folded value rejoined — not fail
    the whole task."""
    payload = b"hello"
    rec = (b"WARC/1.1\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: http://example.com/a\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           b"Content-Type: text/html;\r\n"
           b"\tcharset=utf-8\r\n"
           b"Content-Length: %d\r\n\r\n" % len(payload)
           + payload + b"\r\n\r\n")
    p = tmp_path / "folded.warc"
    p.write_bytes(rec)
    rows = read_warc(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "http://example.com/a"
    assert rows[0]["content_type"] == "text/html; charset=utf-8"
    assert bytes(rows[0]["payload"]) == payload


def test_warc_empty_file_and_missing(spark, tmp_path):
    empty = tmp_path / "empty.warc"
    empty.write_bytes(b"")
    assert read_warc(spark, str(empty)).count() == 0
    with pytest.raises(FileNotFoundError):
        read_warc(spark, str(tmp_path / "nope-*.warc"))


# ------------------------------------------ Python Data Source API
@pytest.fixture(scope="module")
def warc_spark(spark):
    from facs_spark.io.warc_datasource import WarcDataSource
    spark.dataSource.register(WarcDataSource)
    return spark


def test_warc_format_batch_matches_read_warc(warc_spark, pages,
                                             tmp_path):
    """spark.read.format('warc') plans the same byte-range splits and
    returns the same records as the mapInPandas reader."""
    d = str(tmp_path / "w")
    write_warc(pages, d)
    via_fmt = (warc_spark.read.format("warc")
               .option("split_bytes", 4096).load(d))
    assert via_fmt.rdd.getNumPartitions() > 4  # split, not per-file
    via_fn = read_warc(warc_spark, d + "/part-*.warc")
    assert _diff(via_fmt.select("url", "warc_ts", "payload"),
                 via_fn.select("url", "warc_ts", "payload")) == 0


def test_warc_stream_ingests_new_files(warc_spark, pages, tmp_path):
    """readStream.format('warc'): files present at start land in the
    first micro-batch, late-arriving files in the next; totals exact;
    restart from the checkpoint does not re-ingest."""
    import shutil

    from pyspark.sql import functions as F
    staging = str(tmp_path / "all")
    write_warc(pages.repartition(4), staging)
    parts = sorted(os.listdir(staging))
    drop = tmp_path / "drop"
    drop.mkdir()
    ckpt = str(tmp_path / "ckpt")
    for p in parts[:2]:
        shutil.copy(os.path.join(staging, p), str(drop / p))

    def start():
        return (warc_spark.readStream.format("warc").load(str(drop))
                .groupBy().agg(F.count(F.lit(1)).alias("n"))
                .writeStream.format("memory").queryName("warc_mon")
                .outputMode("complete")
                .option("checkpointLocation", ckpt).start())

    q = start()
    try:
        q.processAllAvailable()
        n1 = warc_spark.sql("SELECT n FROM warc_mon").collect()[0]["n"]
        for p in parts[2:-1]:
            shutil.copy(os.path.join(staging, p), str(drop / p))
        q.processAllAvailable()
        n2 = warc_spark.sql("SELECT n FROM warc_mon").collect()[0]["n"]
    finally:
        q.stop()
    total = pages.count()
    assert 0 < n1 < n2 < total
    # restart from the checkpoint, deliver the last file: committed
    # offsets hold (nothing re-ingested), the tail arrives once, and
    # the complete-mode count lands exactly at the corpus total
    q = start()
    try:
        shutil.copy(os.path.join(staging, parts[-1]),
                    str(drop / parts[-1]))
        q.processAllAvailable()
        n3 = warc_spark.sql("SELECT n FROM warc_mon").collect()[0]["n"]
    finally:
        q.stop()
    assert n3 == total


def test_warc_split_survives_in_payload_boundary_marker(spark,
                                                        tmp_path):
    """Review regression: a payload CONTAINING the CRLFCRLF+WARC/
    separator used to derail byte-range realignment (the candidate
    boundary was trusted unvalidated) — now candidates must parse as
    a well-formed header whose declared extent chains to EOF or the
    next magic, so tiny splits still partition the file exactly."""
    fake = (b"quoted record: \r\n\r\nWARC/1.1\r\n"
            b"WARC-Type: response\r\nContent-Length: 999\r\n\r\n junk")
    df = spark.createDataFrame(
        [(f"http://x/{i}",
          (fake if i % 3 == 0 else b"plain ") * (1 + i % 4))
         for i in range(30)],
        "url string, payload binary").withColumn(
        "warc_ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    d = str(tmp_path / "w")
    write_warc(df, d)
    whole = read_warc(spark, d + "/part-*.warc")
    for split in (97, 1000):
        tiny = read_warc(spark, d + "/part-*.warc", split_bytes=split)
        assert tiny.count() == 30
        assert whole.select("url", "payload").exceptAll(
            tiny.select("url", "payload")).count() == 0


def test_warc_null_timestamp_writes_epoch(spark, tmp_path):
    """Review regression: a null warc_ts (NaT across the Arrow
    boundary) crashed _record_bytes; now it serializes the documented
    1970 epoch."""
    df = spark.createDataFrame(
        [("http://x/1", None, b"p")],
        "url string, warc_ts timestamp, payload binary")
    d = str(tmp_path / "wnull")
    assert write_warc(df, d) == 1
    raw = open(os.path.join(d, sorted(os.listdir(d))[0]), "rb").read()
    assert b"WARC-Date: 1970-01-01T00:00:00Z" in raw


def test_warc_timestamp_is_instant_under_any_session_tz(spark,
                                                        tmp_path):
    """Review regression: the batch path returned tz-naive parse
    results (reinterpreted in session-local time) while the stream
    path attached UTC.  Both now carry the true instant: write+read
    under a non-UTC session timezone round-trips the epoch value."""
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone",
                       "America/Los_Angeles")
        epoch = 1704110400  # 2024-01-01T12:00:00Z
        df = spark.createDataFrame([("http://x/1", b"p")],
                                   "url string, payload binary") \
            .withColumn("warc_ts",
                        F.timestamp_seconds(F.lit(epoch)))
        d = str(tmp_path / "wtz")
        write_warc(df, d)
        raw = open(os.path.join(d, sorted(os.listdir(d))[0]),
                   "rb").read()
        assert b"WARC-Date: 2024-01-01T12:00:00Z" in raw
        back = read_warc(spark, d + "/part-*.warc")
        got = back.select(
            F.unix_timestamp("warc_ts").alias("es")).collect()[0]["es"]
        assert got == epoch
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_warc_stream_late_file_sorting_earlier(warc_spark, tmp_path):
    """Review regression: stream offsets were indices into a live
    re-sorted listing, so a late file sorting BEFORE consumed ones
    caused re-ingestion + loss.  Offsets are now consumed-name lists:
    the late 'a_*' file lands exactly once after 'z_*' was consumed."""
    import shutil

    from pyspark.sql import functions as F
    from facs_spark.io.warc import write_warc as _ww

    def mk(name, urls):
        df = warc_spark.createDataFrame(
            [(u, b"p") for u in urls], "url string, payload binary") \
            .withColumn("warc_ts",
                        F.lit("2024-01-01 00:00:00").cast("timestamp"))
        stage = tmp_path / ("stage_" + name)
        _ww(df.coalesce(1), str(stage))
        part = sorted(os.listdir(stage))[0]
        shutil.copy(str(stage / part), str(tmp_path / "latedrop" / name))

    (tmp_path / "latedrop").mkdir()
    ckpt = str(tmp_path / "lateckpt")
    mk("z_first.warc", ["http://z/1", "http://z/2"])
    q = (warc_spark.readStream.format("warc")
         .load(str(tmp_path / "latedrop"))
         .groupBy("url").agg(F.count(F.lit(1)).alias("n"))
         .writeStream.format("memory").queryName("warc_late")
         .outputMode("complete")
         .option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
        mk("a_late.warc", ["http://a/1"])  # sorts BEFORE z_first
        q.processAllAvailable()
        rows = {r["url"]: r["n"] for r in
                warc_spark.sql("SELECT * FROM warc_late").collect()}
    finally:
        q.stop()
    assert rows == {"http://z/1": 1, "http://z/2": 1, "http://a/1": 1}

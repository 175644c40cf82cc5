"""Distributed WARC source/sink — Common-Crawl-native ingestion for
the pages pipeline (BASELINE input_hint: web pages arrive as WARC, the
ISO 28500 crawl interchange format).

Distribution strategy mirrors ``io/fastx.py`` (the reference engine's
byte-slice + realign decomposition, facs/tool.c:207-270):

* **uncompressed .warc** splits into byte ranges; each task realigns
  its range start to the next record boundary by scanning for the
  ``\\r\\n\\r\\nWARC/`` separator-plus-magic (position 0 must already
  be a ``WARC/`` magic), then parses every record whose HEADER starts
  inside [start, end) — records straddling the end boundary belong to
  the task that owns their start, so splits partition the file
  exactly;
* **.warc.gz** is one task per file: Common Crawl gzips each record as
  its own gzip member so a member index would make it splittable, but
  absent the index a sequential stream is the correct read (same rule
  as fastx gzip).

Record framing (ISO 28500 / WARC 1.1, public spec): a version line
``WARC/1.x``, CRLF header lines ``Name: value`` with case-insensitive
names, an empty line, ``Content-Length`` octets of payload, and a
CRLF CRLF terminator.

Schema: ``url string, warc_ts timestamp, rec_type string,
content_type string, payload binary, source_file string`` — the
input_hint page columns fall straight out (``payload`` is the html
bytes for response records).
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_shipped

WARC_SCHEMA = ("url string, warc_ts timestamp, rec_type string, "
               "content_type string, payload binary, "
               "source_file string")
DEFAULT_SPLIT_BYTES = 64 * 1024 * 1024
_MAGIC = b"WARC/"
_SEP = b"\r\n\r\n"


# ------------------------------------------------------------ parsing
def _parse_records(buf: bytes, source: str, base_off: int,
                   limit: int) -> pd.DataFrame:
    """Parse records whose header starts at offset < limit (absolute
    file offset; ``buf`` begins at absolute offset ``base_off``)."""
    cols = {"url": [], "warc_ts": [], "rec_type": [],
            "content_type": [], "payload": [], "source_file": []}
    pos = 0
    n = len(buf)
    while pos < n and base_off + pos < limit:
        if not buf.startswith(_MAGIC, pos):
            raise ValueError(
                f"{source}: expected WARC record at byte "
                f"{base_off + pos}, found {buf[pos:pos+16]!r}")
        hdr_end = buf.find(_SEP, pos)
        if hdr_end < 0:
            raise ValueError(f"{source}: unterminated WARC header at "
                             f"byte {base_off + pos}")
        headers: dict[str, str] = {}
        for line in buf[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii")] = \
                v.strip().decode("utf-8", "replace")
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"{source}: WARC record at byte {base_off + pos} has "
                f"no valid Content-Length") from None
        body_start = hdr_end + len(_SEP)
        payload = buf[body_start:body_start + clen]
        if len(payload) < clen:
            raise ValueError(
                f"{source}: truncated WARC payload at byte "
                f"{base_off + pos} (want {clen}, have {len(payload)})")
        cols["url"].append(headers.get("warc-target-uri"))
        ts = headers.get("warc-date")
        t = pd.Timestamp(ts) if ts else None
        if t is not None and t.tzinfo is not None:
            t = t.tz_convert("UTC").tz_localize(None)
        cols["warc_ts"].append(t)
        cols["rec_type"].append(headers.get("warc-type"))
        cols["content_type"].append(headers.get("content-type"))
        cols["payload"].append(payload)
        cols["source_file"].append(source)
        pos = body_start + clen
        # tolerate the spec's record terminator
        if buf.startswith(_SEP, pos):
            pos += len(_SEP)
    # explicit dtypes: an empty batch must still carry timestamp/
    # binary-compatible columns or Arrow refuses the float64 default
    return pd.DataFrame({
        "url": pd.Series(cols["url"], dtype="object"),
        "warc_ts": pd.Series(cols["warc_ts"], dtype="datetime64[us]"),
        "rec_type": pd.Series(cols["rec_type"], dtype="object"),
        "content_type": pd.Series(cols["content_type"],
                                  dtype="object"),
        "payload": pd.Series(cols["payload"], dtype="object"),
        "source_file": pd.Series(cols["source_file"],
                                 dtype="object")})


def _align(fh, start: int, file_end: int) -> int:
    """Absolute offset of the first record HEADER at or after
    ``start`` (scan for CRLFCRLF + magic; 0 is always aligned)."""
    if start == 0:
        return 0
    probe = max(0, start - len(_SEP) - len(_MAGIC))
    fh.seek(probe)
    window = b""
    base = probe
    chunk_size = 1 << 20
    while True:
        chunk = fh.read(chunk_size)
        if not chunk:
            return file_end
        window += chunk
        i = 0
        while True:
            i = window.find(_SEP + _MAGIC, i)
            if i < 0:
                break
            cand = base + i + len(_SEP)
            if cand >= start:
                return cand
            i += 1
        # keep a tail so a separator straddling chunks is found
        keep = len(_SEP) + len(_MAGIC)
        if len(window) > keep:
            base += len(window) - keep
            window = window[-keep:]


def _read_task(path: str, start: int, end: int) -> pd.DataFrame:
    source = os.path.basename(path)
    if start < 0:  # gzip whole file
        with gzip.open(path, "rb") as gz:
            buf = gz.read()
        return _parse_records(buf, source, 0, len(buf))
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        begin = _align(fh, start, size)
        if begin >= size:
            return _parse_records(b"", source, 0, 0)
        # read to the first boundary at/after `end` so a record that
        # STARTS before `end` is fully available here
        stop = _align(fh, end, size) if end < size else size
        fh.seek(begin)
        buf = fh.read(stop - begin)
    return _parse_records(buf, source, begin, min(end, size))


def read_warc(spark: SparkSession, paths,
              split_bytes: int = DEFAULT_SPLIT_BYTES) -> DataFrame:
    """Read WARC(.gz) files into a records DataFrame — one Spark task
    per byte-range split (uncompressed) or per file (gzip)."""
    ensure_shipped(spark)
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        hits = _glob.glob(p)
        files.extend(hits if hits else [p])
    if not files:
        raise FileNotFoundError(f"no input files match {paths!r}")
    tasks: list[tuple] = []
    for p in sorted(files):
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
    plan = spark.createDataFrame(tasks, "path string, start long, "
                                        "end long")
    plan = plan.repartition(len(tasks))

    def kernel(iterator):
        for batch in iterator:
            for _, row in batch.iterrows():
                yield _read_task(row["path"], int(row["start"]),
                                 int(row["end"]))

    return plan.mapInPandas(kernel, schema=WARC_SCHEMA)


# -------------------------------------------------------------- sink
def _record_bytes(url: str | None, ts, rec_type: str,
                  content_type: str, payload: bytes) -> bytes:
    ts_s = (pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
            if ts is not None else "1970-01-01T00:00:00Z")
    head = [b"WARC/1.1",
            b"WARC-Type: " + rec_type.encode(),
            b"WARC-Date: " + ts_s.encode()]
    if url is not None:
        head.append(b"WARC-Target-URI: " + url.encode())
    head += [b"Content-Type: " + content_type.encode(),
             b"Content-Length: " + str(len(payload)).encode()]
    return b"\r\n".join(head) + _SEP + payload + _SEP


def write_warc(df: DataFrame, path: str, url_col: str = "url",
               ts_col: str = "warc_ts", payload_col: str = "payload",
               rec_type: str = "response",
               content_type: str = "text/html",
               gzip_out: bool = False) -> int:
    """Write a directory of ``part-*.warc[.gz]`` files, one per
    partition (each task writes its own part — the cluster-scale
    sink; LOCAL filesystem in this sandbox, same caveat as
    ``write_fastx(single_file=True)``).  Returns the record count."""
    os.makedirs(path, exist_ok=True)
    for stale in _glob.glob(os.path.join(path, "part-*")):
        os.remove(stale)
    ext = ".warc.gz" if gzip_out else ".warc"
    src = df.select(url_col, ts_col, payload_col)

    def sink(iterator):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}{ext}")
        n = 0
        raw = io.BytesIO()
        for batch in iterator:
            for _, row in batch.iterrows():
                raw.write(_record_bytes(row[url_col], row[ts_col],
                                        rec_type, content_type,
                                        bytes(row[payload_col])))
                n += 1
        if n:
            data = raw.getvalue()
            if gzip_out:
                data = gzip.compress(data, 6)
            with open(fname, "wb") as fh:
                fh.write(data)
        yield pd.DataFrame({"part": [fname], "n": [n]})

    manifest = src.mapInPandas(sink, "part string, n long").collect()
    return int(sum(r["n"] for r in manifest))

"""Distributed WARC source/sink — Common-Crawl-native ingestion for
the pages pipeline (BASELINE input_hint: web pages arrive as WARC, the
ISO 28500 crawl interchange format).

Distribution strategy mirrors ``io/fastx.py`` (the reference engine's
byte-slice + realign decomposition, facs/tool.c:207-270):

* **uncompressed .warc** splits into byte ranges; each task realigns
  its range start to the next record boundary and parses every record
  whose HEADER starts inside [start, end) — records straddling the
  end boundary belong to the task that owns their start, so splits
  partition the file exactly.  Realignment candidates (the
  ``\\r\\n\\r\\nWARC/`` separator-plus-magic) are VALIDATED, not
  trusted: a candidate counts only if a well-formed header block
  (version line, ``Content-Length``, a ``WARC-Type`` header) parses
  there AND the record extent it declares lands exactly on EOF or on
  another ``WARC/`` magic — so payload bytes that merely CONTAIN the
  marker (HTML quoting a WARC record, the binary-payload test) can't
  derail a split.  Defeating the validation would need a payload
  embedding a complete, correctly-framed fake record chain — crafted
  input, not crawl noise;
* **.warc.gz** is one task per file, parsed INCREMENTALLY from the
  decompressing stream (bounded buffer — never the whole decompressed
  archive in memory; Common Crawl gzips each record as its own member
  so a member index would make it splittable, but absent the index a
  sequential stream is the correct read — same rule as fastx gzip).

Record framing (ISO 28500 / WARC 1.1, public spec): a version line
``WARC/1.x``, CRLF header lines ``Name: value`` with case-insensitive
names, an empty line, ``Content-Length`` octets of payload, and a
CRLF CRLF terminator.

Timestamps are INSTANTS: ``WARC-Date`` is UTC by spec, parsed to
tz-aware UTC values (batch and stream paths agree on the instant
regardless of the session timezone), and serialized back from epoch
seconds so a non-UTC session can't shift round-trips.

Schema: ``url string, warc_ts timestamp, rec_type string,
content_type string, payload binary, source_file string`` — the
input_hint page columns fall straight out (``payload`` is the html
bytes for response records).
"""

from __future__ import annotations

import glob as _glob
import gzip
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import ensure_shipped

WARC_SCHEMA = ("url string, warc_ts timestamp, rec_type string, "
               "content_type string, payload binary, "
               "source_file string")
DEFAULT_SPLIT_BYTES = 64 * 1024 * 1024
_MAGIC = b"WARC/"
_SEP = b"\r\n\r\n"
_MAX_HEADER = 64 * 1024  # spec headers are small; bound the scan


# ------------------------------------------------------------ parsing
def _parse_header(buf: bytes, pos: int):
    """Try to parse a record header at ``pos``.  Returns
    (headers dict, body_start, content_length) or None if no
    well-formed header block starts there (used both for record
    iteration and for VALIDATING realignment candidates)."""
    if not buf.startswith(_MAGIC, pos):
        return None
    hdr_end = buf.find(_SEP, pos, pos + _MAX_HEADER)
    if hdr_end < 0:
        return None
    headers: dict[str, str] = {}
    # WARC 1.1 allows LWS continuation lines (value folded over
    # multiple lines, each starting with SP/TAB) — fold them into the
    # previous header's value before the name:value split
    lines: list[bytes] = []
    for raw in buf[pos:hdr_end].split(b"\r\n")[1:]:
        if raw[:1] in (b" ", b"\t"):
            if not lines:
                return None  # continuation with nothing to continue
            lines[-1] += b" " + raw.strip()
            continue
        lines.append(raw)
    for line in lines:
        k, sep, v = line.partition(b":")
        if not sep:
            return None
        headers[k.strip().lower().decode("ascii", "replace")] = \
            v.strip().decode("utf-8", "replace")
    try:
        clen = int(headers["content-length"])
    except (KeyError, ValueError):
        return None
    if clen < 0 or "warc-type" not in headers:
        return None
    return headers, hdr_end + len(_SEP), clen


def _utc_ts(ts: str | None):
    if not ts:
        return None
    t = pd.Timestamp(ts)
    return (t.tz_localize("UTC") if t.tzinfo is None
            else t.tz_convert("UTC"))


def _frame(cols: dict) -> pd.DataFrame:
    # explicit dtypes: an empty batch must still carry timestamp/
    # binary-compatible columns or Arrow refuses the float64 default;
    # warc_ts is tz-aware UTC so Spark stores the true instant under
    # ANY session timezone
    return pd.DataFrame({
        "url": pd.Series(cols["url"], dtype="object"),
        "warc_ts": pd.Series(cols["warc_ts"],
                             dtype="datetime64[us, UTC]"),
        "rec_type": pd.Series(cols["rec_type"], dtype="object"),
        "content_type": pd.Series(cols["content_type"],
                                  dtype="object"),
        "payload": pd.Series(cols["payload"], dtype="object"),
        "source_file": pd.Series(cols["source_file"],
                                 dtype="object")})


def _new_cols() -> dict:
    return {"url": [], "warc_ts": [], "rec_type": [],
            "content_type": [], "payload": [], "source_file": []}


def _append_record(cols: dict, headers: dict, payload: bytes,
                   source: str) -> None:
    cols["url"].append(headers.get("warc-target-uri"))
    cols["warc_ts"].append(_utc_ts(headers.get("warc-date")))
    cols["rec_type"].append(headers.get("warc-type"))
    cols["content_type"].append(headers.get("content-type"))
    cols["payload"].append(payload)
    cols["source_file"].append(source)


def _parse_records(buf: bytes, source: str, base_off: int,
                   limit: int) -> pd.DataFrame:
    """Parse records whose header starts at offset < limit (absolute
    file offset; ``buf`` begins at absolute offset ``base_off``)."""
    cols = _new_cols()
    pos = 0
    n = len(buf)
    while pos < n and base_off + pos < limit:
        parsed = _parse_header(buf, pos)
        if parsed is None:
            raise ValueError(
                f"{source}: expected a well-formed WARC record "
                f"(version line, Content-Length, WARC-Type) at byte "
                f"{base_off + pos}, found {buf[pos:pos+16]!r}")
        headers, body_start, clen = parsed
        payload = buf[body_start:body_start + clen]
        if len(payload) < clen:
            raise ValueError(
                f"{source}: truncated WARC payload at byte "
                f"{base_off + pos} (want {clen}, have {len(payload)})")
        _append_record(cols, headers, payload, source)
        pos = body_start + clen
        if buf.startswith(_SEP, pos):  # the spec's record terminator
            pos += len(_SEP)
    return _frame(cols)


def _parse_stream(fh, source: str, chunk_size: int = 1 << 22
                  ) -> pd.DataFrame:
    """Incremental parse of a sequential (e.g. decompressing) stream:
    the buffer holds at most one in-flight record plus one read chunk,
    never the whole archive."""
    cols = _new_cols()
    buf = b""
    eof = False
    while True:
        parsed = _parse_header(buf, 0) if buf else None
        if parsed is not None:
            headers, body_start, clen = parsed
            need = body_start + clen
            while len(buf) < need and not eof:
                chunk = fh.read(max(chunk_size, need - len(buf)))
                if not chunk:
                    eof = True
                    break
                buf += chunk
            if len(buf) < need:
                raise ValueError(
                    f"{source}: truncated WARC payload (want {clen})")
            _append_record(cols, headers, buf[body_start:need], source)
            buf = buf[need:]
            if buf.startswith(_SEP):
                buf = buf[len(_SEP):]
            continue
        if eof:
            if buf.strip(b"\r\n"):
                raise ValueError(
                    f"{source}: expected WARC record, found "
                    f"{buf[:16]!r}")
            return _frame(cols)
        # header incomplete (or buffer empty) — read more
        chunk = fh.read(chunk_size)
        if not chunk:
            eof = True
            if buf and _parse_header(buf, 0) is None \
                    and buf.strip(b"\r\n"):
                raise ValueError(
                    f"{source}: malformed/truncated WARC header: "
                    f"{buf[:32]!r}")
        else:
            buf += chunk


def _valid_boundary(fh, cand: int, file_size: int) -> bool:
    """A realignment candidate is a true record boundary iff a
    well-formed header parses there and the record extent it declares
    ends exactly at EOF or at another ``WARC/`` magic."""
    here = fh.tell()
    try:
        fh.seek(cand)
        head = fh.read(_MAX_HEADER)
        parsed = _parse_header(head, 0)
        if parsed is None:
            return False
        _headers, body_start, clen = parsed
        rec_end = cand + body_start + clen
        if rec_end > file_size:
            return False
        fh.seek(rec_end)
        tail = fh.read(len(_SEP) + len(_MAGIC))
        if tail.startswith(_SEP):
            tail = tail[len(_SEP):]
            rec_end += len(_SEP)
        if rec_end == file_size:
            return True
        return tail.startswith(_MAGIC[:len(tail)]) and len(tail) > 0
    finally:
        fh.seek(here)


def _align(fh, start: int, file_end: int) -> int:
    """Absolute offset of the first VALIDATED record header at or
    after ``start`` (0 is always aligned)."""
    if start == 0:
        return 0
    probe = max(0, start - len(_SEP) - len(_MAGIC))
    fh.seek(probe)
    window = b""
    base = probe
    chunk_size = 1 << 20
    while True:
        fh.seek(base + len(window))
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
            if cand >= start and _valid_boundary(fh, cand, file_end):
                return cand
            i += 1
        # keep a tail so a separator straddling chunks is found
        keep = len(_SEP) + len(_MAGIC)
        if len(window) > keep:
            base += len(window) - keep
            window = window[-keep:]


def plan_warc_tasks(paths, split_bytes: int = DEFAULT_SPLIT_BYTES
                    ) -> list[tuple]:
    """(path, start, end) task list shared by ``read_warc`` and the
    ``format("warc")`` data source: glob/dir expansion, gzip =
    whole-file (-1, -1), uncompressed = byte-range splits."""
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if _glob.has_magic(p):
            files.extend(_glob.glob(p))
        elif os.path.isdir(p):
            files.extend(_glob.glob(os.path.join(p, "*.warc"))
                         + _glob.glob(os.path.join(p, "*.warc.gz")))
        else:
            files.append(p)
    if not files:
        raise FileNotFoundError(f"no WARC files match {paths!r}")
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
    return tasks


def _read_task(path: str, start: int, end: int) -> pd.DataFrame:
    source = os.path.basename(path)
    if start < 0:  # gzip whole file — incremental stream parse
        with gzip.open(path, "rb") as gz:
            return _parse_stream(gz, source)
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
    tasks = plan_warc_tasks(paths, split_bytes)
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
def _record_bytes(url: str | None, epoch_s, rec_type: str,
                  content_type: str, payload: bytes) -> bytes:
    import datetime as _dt
    if epoch_s is None or pd.isna(epoch_s):
        epoch_s = 0
    ts_s = _dt.datetime.fromtimestamp(
        int(epoch_s), _dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
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
    partition, records streamed straight to the file handle (never
    the whole partition in memory; LOCAL filesystem in this sandbox,
    same caveat as ``write_fastx(single_file=True)``).  Returns the
    record count.

    The timestamp crosses the python boundary as epoch SECONDS
    (``unix_timestamp``, an instant), so the serialized ``WARC-Date``
    is the true UTC instant under any session timezone.

    ``gzip_out=True`` follows the Common Crawl convention: EACH RECORD
    is its own gzip member (concatenated members decompress as one
    stream), so a future member index can make the archive splittable.
    """
    os.makedirs(path, exist_ok=True)
    for stale in _glob.glob(os.path.join(path, "part-*")):
        os.remove(stale)
    ext = ".warc.gz" if gzip_out else ".warc"
    src = df.select(F.col(url_col).alias("u"),
                    F.unix_timestamp(F.col(ts_col)).alias("es"),
                    F.col(payload_col).alias("pl"))

    def sink(iterator):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}{ext}")
        n = 0
        fh = None
        try:
            for batch in iterator:
                for _, row in batch.iterrows():
                    if fh is None:
                        fh = open(fname, "wb")
                    rec = _record_bytes(row["u"], row["es"],
                                        rec_type, content_type,
                                        bytes(row["pl"]))
                    fh.write(gzip.compress(rec, 6) if gzip_out
                             else rec)
                    n += 1
        finally:
            if fh is not None:
                fh.close()
        yield pd.DataFrame({"part": [fname], "n": [n]})

    manifest = src.mapInPandas(sink, "part string, n long").collect()
    return int(sum(r["n"] for r in manifest))

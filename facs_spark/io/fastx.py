"""Distributed FASTA/FASTQ source — true input parity with the
reference engine (a facs user can point this at their existing files).

Distribution strategy mirrors the reference's own decomposition:

* **uncompressed files** are split into byte ranges and each task
  realigns its range start to the next record boundary — the Spark
  heir of ``get_parainfo``'s per-core byte slicing + record
  realignment (``facs/tool.c:207-270``) and the MPI byte-share split
  (``facs/mpi_bloom.c:193-204``).  FASTQ realignment validates a
  candidate ``@`` header by checking the ``+`` separator two lines
  down (the ``fastq_relocate``/``fq_read_length`` idea,
  ``facs/tool.c:299-329``) — a bare ``@`` can open a quality line.
* **gzip files** are one task per file, streamed sequentially — gzip
  is not splittable; the reference reads it the same way in 1 GB
  chunks (``CHUNKer``, ``facs/query.c:282-320``).

Format sniffing matches the reference: ``.fastq``/``.fq`` (+ ``.gz``)
or a leading ``@`` ⇒ FASTQ, else FASTA (``facs/query.c:161-164``).
Output schema: ``read_id string, seq string, qual string, source_file
string`` (qual null for FASTA; multi-line FASTA sequences joined —
``fa_count`` newline-strip parity, ``facs/tool.c:359-376``).
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_shipped

FASTX_SCHEMA = "read_id string, seq string, qual string, source_file string"
DEFAULT_SPLIT_BYTES = 64 * 1024 * 1024


def sniff_format(path: str, head: bytes = b"") -> str:
    """'fastq' or 'fasta' by extension, else first byte (reference rule)."""
    base = path[:-3] if path.endswith(".gz") else path
    if base.endswith((".fastq", ".fq")):
        return "fastq"
    if base.endswith((".fasta", ".fa", ".fna")):
        return "fasta"
    if head[:1] == b"@":
        return "fastq"
    return "fasta"


def _align_fastq(fh, start: int, file_end: int) -> int:
    """Scan forward from ``start`` to the next true FASTQ record start.

    A line starting with '@' is a header only if the line two below
    starts with '+' (quality lines may themselves start with '@').
    """
    if start == 0:
        return 0
    fh.seek(start)
    fh.readline()  # discard the partial line
    while True:
        pos = fh.tell()
        if pos >= file_end:
            return file_end
        l1 = fh.readline()
        if not l1:
            return file_end
        if l1.startswith(b"@"):
            here = fh.tell()
            fh.readline()
            l3 = fh.readline()
            fh.seek(here)
            if l3.startswith(b"+"):
                return pos


def _align_fasta(fh, start: int, file_end: int) -> int:
    if start == 0:
        return 0
    fh.seek(start)
    fh.readline()
    while True:
        pos = fh.tell()
        if pos >= file_end:
            return file_end
        line = fh.readline()
        if not line:
            return file_end
        if line.startswith(b">"):
            return pos


def _parse_fastq(stream, source: str):
    out = {"read_id": [], "seq": [], "qual": [], "source_file": []}
    while True:
        h = stream.readline()
        if not h:
            break
        if not h.strip():
            continue
        seq = stream.readline()
        stream.readline()  # '+'
        qual = stream.readline()
        out["read_id"].append(h.decode().strip()[1:])
        out["seq"].append(seq.decode().strip())
        out["qual"].append(qual.decode().strip())
        out["source_file"].append(source)
    return pd.DataFrame(out)


def _parse_fasta(stream, source: str):
    out = {"read_id": [], "seq": [], "qual": [], "source_file": []}
    rid, chunks = None, []
    for raw in stream:
        line = raw.decode().strip()
        if line.startswith(">"):
            if rid is not None:
                out["read_id"].append(rid)
                out["seq"].append("".join(chunks))
                out["qual"].append(None)
                out["source_file"].append(source)
            rid, chunks = line[1:], []
        elif line:
            chunks.append(line)
    if rid is not None:
        out["read_id"].append(rid)
        out["seq"].append("".join(chunks))
        out["qual"].append(None)
        out["source_file"].append(source)
    return pd.DataFrame(out)


def _plan_splits(paths: list[str], split_bytes: int) -> list[tuple]:
    """(path, fmt, start, end) tasks; gzip = whole-file tasks."""
    tasks = []
    for p in sorted(paths):
        size = os.path.getsize(p)
        with open(p, "rb") as fh:
            head = fh.read(1)
        if p.endswith(".gz"):
            with gzip.open(p, "rb") as gz:
                head = gz.read(1)
            tasks.append((p, sniff_format(p, head), -1, -1))
            continue
        fmt = sniff_format(p, head)
        if size == 0:
            tasks.append((p, fmt, 0, 0))
            continue
        start = 0
        while start < size:
            end = min(start + split_bytes, size)
            tasks.append((p, fmt, start, end))
            start = end
    return tasks


def _read_task(path: str, fmt: str, start: int, end: int) -> pd.DataFrame:
    source = os.path.basename(path)
    if start < 0:  # gzip whole file
        with gzip.open(path, "rb") as gz:
            parse = _parse_fastq if fmt == "fastq" else _parse_fasta
            return parse(gz, source)
    with open(path, "rb") as fh:
        align = _align_fastq if fmt == "fastq" else _align_fasta
        size = os.path.getsize(path)
        begin = align(fh, start, size)
        stop = align(fh, end, size) if end < size else size
        if begin >= stop:
            return pd.DataFrame({"read_id": [], "seq": [], "qual": [],
                                 "source_file": []})
        fh.seek(begin)
        payload = fh.read(stop - begin)
    parse = _parse_fastq if fmt == "fastq" else _parse_fasta
    return parse(io.BytesIO(payload), source)


def read_fastx(spark: SparkSession, paths, fmt: str | None = None,
               split_bytes: int = DEFAULT_SPLIT_BYTES) -> DataFrame:
    """Read FASTA/FASTQ(.gz) files into a reads DataFrame.

    ``paths``: path, glob, or list of either.  One Spark task per
    byte-range split (uncompressed) or per file (gzip).
    """
    ensure_shipped(spark)
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        hits = _glob.glob(p)
        files.extend(hits if hits else [p])
    if not files:
        raise FileNotFoundError(f"no input files match {paths!r}")
    tasks = _plan_splits(files, split_bytes)
    if fmt is not None:
        tasks = [(p, fmt, s, e) for p, _f, s, e in tasks]
    plan = spark.createDataFrame(tasks, "path string, fmt string, "
                                        "start long, end long")
    plan = plan.repartition(len(tasks))

    def kernel(iterator):
        for batch in iterator:
            for _, row in batch.iterrows():
                yield _read_task(row["path"], row["fmt"],
                                 int(row["start"]), int(row["end"]))

    return plan.mapInPandas(kernel, schema=FASTX_SCHEMA)


def _fastx_records(df: DataFrame, fmt: str, seq_col: str, id_col: str,
                   qual_col: str) -> DataFrame:
    """One text record per read (the shared serializer of the file
    sinks and the stdout/stderr stream sink)."""
    from pyspark.sql import functions as F
    if fmt == "fastq":
        rec = F.concat_ws("\n", F.concat(F.lit("@"), F.col(id_col)),
                          F.col(seq_col), F.lit("+"),
                          F.coalesce(F.col(qual_col),
                                     F.repeat(F.lit("I"),
                                              F.length(seq_col))))
    else:
        rec = F.concat_ws("\n", F.concat(F.lit(">"), F.col(id_col)),
                          F.col(seq_col))
    return df.select(rec.alias("value"))


def write_fastx_stream(df: DataFrame, fh, fmt: str = "fastq",
                       seq_col: str = "seq", id_col: str = "read_id",
                       qual_col: str = "qual") -> int:
    """Stream reads to an open text handle (stdout/stderr pipe
    composition — the reference writes clean to stdout and contam to
    stderr when no output file is given, facs/query.c:219-230,
    facs/bloom.c:339-366).  Uses ``toLocalIterator`` so only one
    partition is resident driver-side at a time — never a full
    collect.  Returns the record count."""
    n = 0
    for row in _fastx_records(df, fmt, seq_col, id_col,
                              qual_col).toLocalIterator():
        fh.write(row["value"])
        fh.write("\n")
        n += 1
    return n


def write_fastx(df: DataFrame, path: str, fmt: str = "fastq",
                seq_col: str = "seq", id_col: str = "read_id",
                qual_col: str = "qual", single_file: bool = False) -> None:
    """Write reads back out (the clean/contam sinks of `facs remove`,
    facs/remove.c:89-151).

    Default is a directory of text parts (the cluster-scale sink).
    ``single_file=True`` matches the reference exactly — one plain
    file at ``path`` — by coalescing to one task and renaming the part
    file.  The rename is LOCAL-filesystem only (glob/shutil), like the
    reference tool itself; use the directory sink for object stores
    and 100-TB outputs.  Any stale file or part-directory at ``path``
    is replaced.
    """
    out = _fastx_records(df, fmt, seq_col, id_col, qual_col)
    if not single_file:
        out.write.mode("overwrite").text(path)
        return
    import re
    import shutil
    # Any scheme-like prefix on a NON-absolute path is rejected with a
    # clear error: "hdfs://...", "hdfs:/...", "FILE:/..." would write
    # remotely then crash in the local rename, and a relative
    # colon-bearing name like "chr1:100-200.fastq" dies inside Hadoop
    # Path parsing ("No FileSystem for scheme: chr1") anyway — better
    # to say so here.  Absolute local paths whose BASENAME contains a
    # colon (/data/chr1:100-200_clean.fastq, the samtools-region
    # shape) carry no scheme and write fine.
    if not path.startswith("/") and \
            re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", path) and \
            not re.match(r"^[A-Za-z]:[\\/]", path):  # C:\x is a drive,
        # not a scheme (Windows absolute path)
        raise ValueError(
            "single_file=True renames via the local filesystem and the "
            f"path {path!r} looks like a URI scheme; use an absolute "
            "local path, or the directory sink (single_file=False) for "
            "remote filesystems")
    tmp = path + "._spark_tmp"
    out.coalesce(1).write.mode("overwrite").text(tmp)
    parts = sorted(_glob.glob(os.path.join(tmp, "part-*")))
    # replace whatever is at path (e.g. a part-directory from an
    # earlier single_file=False run — shutil.move would otherwise move
    # the file INTO it)
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)
    if parts:
        shutil.move(parts[0], path)
    else:  # empty dataset still yields the (empty) reference file
        open(path, "w").close()
    shutil.rmtree(tmp, ignore_errors=True)

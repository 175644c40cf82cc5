"""Drop-in facade mirroring the reference's Python API surface.

The reference C-extension exposes exactly three functions
(``facs.build / facs.query / facs.remove`` — ``facs/facs.c:26-31``,
signatures at ``facs/facs.c:42-95``); this module exposes the same
three with the same argument conventions, executed on Spark:

    import facs_spark.api as facs
    facs.build("ref.fasta", "ref.bloom")
    print(facs.query("sample.fastq", "ref.bloom"))
    facs.remove("sample.fastq", "ref.bloom")

Differences, stated: ``build`` writes this engine's serialized sketch
frame, but every loader auto-detects the reference's raw C-struct
dump too (``facs/bloom.c:217-337``) — a facs user's existing filters
load directly, and ``BloomFilter.to_facs_bytes`` exports back;
``remove`` writes directories of part files, not single files; reads
are classified with DNA reverse-complement retry ON (matching query
mode 'n' semantics, ``facs/tool.c:80-102``).
"""

from __future__ import annotations

import datetime as _dt
import json
import os

import numpy as np

from .io.fastx import read_fastx, write_fastx
from .kernels.classify import rev_complement_batch  # noqa: F401 (public API)
from .ops.contamination import classify_pages, contamination_counters
from .ops.sketch_agg import SketchSpec, build_sketch
from .session import get_spark
from .sketch import (BloomFilter, kmer_suggestion, mco_suggestion,
                     prob_suggestion)
from .sketch.prob import cdf, get_mu, get_sigma


def _isodate() -> str:
    """ISO-8601 local timestamp with ms (isodate, facs/tool.c:27-54)."""
    return _dt.datetime.now().astimezone().strftime(
        "%Y-%m-%dT%H:%M:%S.%f")[:-3] + _dt.datetime.now().astimezone().strftime("%z")


def build(source: str, bloom_filter: str, k_mer: int = 0,
          error_rate: float = 0.005, prefix: str | None = None,
          spark=None) -> int:
    """facs.build: FASTA/FASTQ reference → serialized Bloom filter.

    Defaults follow the Python API (error_rate 0.005, facs/facs.c:67;
    the CLI's 0.0005 quirk is noted in BASELINE.md).  k_mer=0 →
    auto-suggest from input size (kmer_suggestion,
    facs/suggestions.c:35-61).
    """
    spark = spark or get_spark("facs_build")
    if k_mer == 0:
        k_mer = kmer_suggestion(os.path.getsize(source))
    reads = read_fastx(spark, source)
    # capacity heuristic: total sequence bytes (the reference uses
    # strlen of the mmap'd file, facs/build.c:148)
    from pyspark.sql import functions as F
    stats = reads.agg(F.sum(F.length("seq")).alias("chars"),
                      F.count(F.lit(1)).alias("n")).collect()[0]
    capacity = max(int(stats["chars"] or 1), 1)
    spec = SketchSpec.make("bloom", "seq", prep="kgram", k=k_mer,
                           capacity=capacity, error_rate=error_rate)
    sketch, _rows = build_sketch(reads, spec)
    if sketch is None:
        sketch = spec.new_sketch()
    out = bloom_filter if bloom_filter.endswith(".bloom") \
        else bloom_filter + ".bloom"
    with open(out, "wb") as fh:
        fh.write(sketch.to_bytes())
    return 0


def _load_bloom(path: str) -> BloomFilter:
    """Load either this engine's framed format or a filter written by
    the reference's ``save_bloom`` (raw C-struct header + bit vector,
    facs/bloom.c:217-337) — auto-detected by magic."""
    if not path.endswith(".bloom"):  # extension guard (facs/query.c:97-101)
        raise ValueError("bloom filter file must have a .bloom extension")
    with open(path, "rb") as fh:
        return BloomFilter.from_any_bytes(fh.read())


def _classified(spark, qry: str, bloom: BloomFilter, tole_rate: float,
                sampling_rate: float):
    reads = read_fastx(spark, qry)
    tole = mco_suggestion(bloom.k_mer) if tole_rate <= 0 else tole_rate
    return classify_pages(
        reads, bloom, text_col="seq",
        passthrough=("read_id", "seq", "qual", "source_file"),
        tole_rate=tole,
        sample_fraction=sampling_rate if sampling_rate < 1 else None,
        canonicalize="dna_revcomp")


def _report_json(row, qry: str, bloom_path: str, k_mer: int,
                 begin: str, fmt: str, threads: int) -> str:
    total = int(row["total_read_count"] or 0)
    contam = int(row["contaminated_reads"] or 0)
    hits = int(row["total_hits"] or 0)
    all_k = int(row["all_k"] or 0)
    prob = prob_suggestion(k_mer)
    rate = contam / total if total else 0.0
    p_value = float(cdf(hits, get_mu(all_k, prob),
                        get_sigma(all_k, prob))) if all_k else 0.0
    if fmt == "tsv":
        return ("sample\tbloom_filter\ttotal_read_count\t"
                "_contaminated_reads\t_contamination_rate\n"
                f"{os.path.abspath(qry)}\t{os.path.abspath(bloom_path)}\t"
                f"{total}\t{contam}\t{rate:f}\t{p_value:e}\n")
    return json.dumps({
        "begin_timestamp": begin,
        "end_timestamp": _isodate(),
        "sample": os.path.abspath(qry),
        "bloom_filter": os.path.abspath(bloom_path),
        "total_read_count": total,
        "contaminated_reads": contam,
        "total_hits": hits,
        "contamination_rate": rate,
        "p_value": p_value,
        "threads": threads,
    })


def query(qry: str, bloom_filter: str, tole_rate: float = 0,
          sampling_rate: float = 1, report_fmt: str = "json",
          spark=None) -> str:
    """facs.query: classify reads, return the JSON/TSV report string
    (fields per facs/query.c:486-508)."""
    spark = spark or get_spark("facs_query")
    begin = _isodate()
    bloom = _load_bloom(bloom_filter)
    classified = _classified(spark, qry, bloom, tole_rate, sampling_rate)
    row = contamination_counters(classified).collect()[0]
    threads = spark.sparkContext.defaultParallelism
    return _report_json(row, qry, bloom_filter, bloom.k_mer, begin,
                        report_fmt, threads)


def remove(src: str, ref: str, tole_rate: float = 0,
           report_fmt: str = "json", prefix: str | None = None,
           single_file: bool = True, stream_output: bool = False,
           spark=None) -> str:
    """facs.remove: split reads into clean/contam outputs and return
    the report.  Defaults to the reference's exact two-file contract —
    ``<sample>_<ref>_{clean,contam}.{fastq,fasta}`` plain files
    (facs/remove.c:89-151); pass ``single_file=False`` for part-file
    directories at cluster scale, or ``stream_output=True`` for the
    reference's no-output-file pipe mode — clean reads stream to
    stdout and contaminated reads to stderr (facs/query.c:219-230,
    facs/bloom.c:339-366), one partition resident at a time (no file
    is written)."""
    import sys

    spark = spark or get_spark("facs_remove")
    begin = _isodate()
    bloom = _load_bloom(ref)
    classified = _classified(spark, src, bloom, tole_rate, 1.0).cache()
    sample = os.path.basename(src).split(".")[0]
    refname = os.path.basename(ref).split(".")[0]
    fmt = "fastq" if src.rstrip(".gz").endswith(("fastq", "fq")) else "fasta"
    from pyspark.sql import functions as F
    from .io.fastx import write_fastx_stream
    if stream_output:
        write_fastx_stream(classified.filter(~F.col("contaminated")),
                           sys.stdout, fmt=fmt, seq_col="seq")
        write_fastx_stream(classified.filter(F.col("contaminated")),
                           sys.stderr, fmt=fmt, seq_col="seq")
    else:
        base = prefix or os.path.dirname(os.path.abspath(src)) or "."
        write_fastx(classified.filter(~F.col("contaminated")),
                    os.path.join(base, f"{sample}_{refname}_clean.{fmt}"),
                    fmt=fmt, seq_col="seq", single_file=single_file)
        write_fastx(classified.filter(F.col("contaminated")),
                    os.path.join(base, f"{sample}_{refname}_contam.{fmt}"),
                    fmt=fmt, seq_col="seq", single_file=single_file)
    row = contamination_counters(classified).collect()[0]
    threads = spark.sparkContext.defaultParallelism
    return _report_json(row, src, ref, bloom.k_mer, begin, report_fmt,
                        threads)


def info(bloom_filter: str) -> dict:
    """facs info: filter metadata (print_bloom_info, facs/info.c:13-33)."""
    return _load_bloom(bloom_filter).info()


def query_multi(qry: str, bloom_filters: list[str], tole_rate: float = 0,
                spark=None):
    """Screen one sample against many filters in a single input pass
    (the reference's -l list mode / fastq_screen comparison)."""
    from .ops.contamination import classify_multi, screen_report
    spark = spark or get_spark("facs_query_multi")
    blooms = {os.path.basename(p): _load_bloom(p) for p in bloom_filters}
    reads = read_fastx(spark, qry)
    cm = classify_multi(reads, blooms, text_col="seq",
                        tole_rate=tole_rate if tole_rate > 0 else None,
                        canonicalize="dna_revcomp")
    return screen_report(cm)

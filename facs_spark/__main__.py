"""CLI mirroring the reference's command surface:

    python -m facs_spark build  -r ref.fasta -o ref.bloom [-k K] [-e E]
    python -m facs_spark query  -r ref.bloom -q sample.fastq [-t TOLE]
                                [-s RATE] [-f json|tsv]
    python -m facs_spark remove -r ref.bloom -q sample.fastq [-t TOLE]
    python -m facs_spark info   -r ref.bloom
    python -m facs_spark monitor -r ref.bloom -d pages_dir/
                                 [-c ckpt_dir] [-t TOLE] [-w WINDOW]
    python -m facs_spark overlap -d corpus.parquet -g source
                                 [-c text] [--prep tokens|raw] [-k K]

Dispatch parity: the reference routes build|query|remove|info the same
way (main.c:44-52); flags follow bq_main's getopt (-t threshold,
-s sampling, -f format — facs/query.c:46-109).  ``monitor`` is engine
breadth beyond the reference: drain the pages currently in a drop
directory through the Structured-Streaming contamination monitor
(availableNow + checkpoint = each invocation processes only what
arrived since the last one) and print the per-window report as JSON
lines.
"""

from __future__ import annotations

import argparse
import json
import sys

from . import api


def main(argv=None) -> int:
    top = argparse.ArgumentParser(prog="facs_spark")
    sub = top.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("-r", "--reference", required=True)
    b.add_argument("-o", "--output", required=True)
    b.add_argument("-k", "--k-mer", type=int, default=0)
    b.add_argument("-e", "--error-rate", type=float, default=0.0005)

    for name in ("query", "remove"):
        p = sub.add_parser(name)
        p.add_argument("-r", "--reference", required=True,
                       help=".bloom filter file")
        p.add_argument("-q", "--query", required=True)
        p.add_argument("-t", "--tole-rate", type=float, default=0)
        if name == "query":
            p.add_argument("-s", "--sampling-rate", type=float, default=1.0)
            p.add_argument("-f", "--format", default="json",
                           choices=("json", "tsv"))
        else:
            p.add_argument("-p", "--prefix", default=None)
            p.add_argument("--stream", action="store_true",
                           help="no files: clean reads to stdout, "
                                "contaminated to stderr (reference "
                                "no-output-file pipe mode); the JSON "
                                "report goes to --report-file if given")
            p.add_argument("--report-file", default=None)

    i = sub.add_parser("info")
    i.add_argument("-r", "--reference", required=True)

    ov = sub.add_parser("overlap")
    ov.add_argument("-d", "--data", required=True,
                    help="parquet path of the corpus table")
    ov.add_argument("-g", "--group-col", required=True,
                    help="group column (source, host, lang, ...)")
    ov.add_argument("-c", "--column", default="text",
                    help="value column (default: text)")
    ov.add_argument("--prep", default="tokens", choices=("tokens", "raw"),
                    help="tokens = content overlap; raw = value overlap")
    ov.add_argument("-k", type=int, default=4096,
                    help="theta sketch size (RSE ≈ 1/sqrt(k-1))")
    ov.add_argument("--shards", type=int, default=None,
                    help="distributed pair grid with S shards (use for "
                         "group counts beyond a few thousand; default: "
                         "driver pair loop)")

    m = sub.add_parser("monitor")
    m.add_argument("-r", "--reference", required=True,
                   help=".bloom filter file")
    m.add_argument("-d", "--pages-dir", required=True,
                   help="directory of page parquet drops")
    m.add_argument("-c", "--checkpoint", default=None,
                   help="checkpoint dir (default: <pages-dir>/_monitor_ckpt)")
    m.add_argument("-t", "--tole-rate", type=float, default=0)
    m.add_argument("-w", "--window", default="1 hour")

    args = top.parse_args(argv)
    if args.cmd == "build":
        return api.build(args.reference, args.output, k_mer=args.k_mer,
                         error_rate=args.error_rate)
    if args.cmd == "query":
        print(api.query(args.query, args.reference,
                        tole_rate=args.tole_rate,
                        sampling_rate=args.sampling_rate,
                        report_fmt=args.format))
        return 0
    if args.cmd == "remove":
        report = api.remove(args.query, args.reference,
                            tole_rate=args.tole_rate, prefix=args.prefix,
                            stream_output=args.stream)
        if args.stream:
            # stdout carries the clean stream — never mix the report in
            if args.report_file:
                with open(args.report_file, "w") as fh:
                    fh.write(report + "\n")
        else:
            print(report)
        return 0
    if args.cmd == "info":
        print(json.dumps(api.info(args.reference), indent=2))
        return 0
    if args.cmd == "overlap":
        from .ops.sketch_agg import SketchSpec, grouped_overlap
        from .session import get_spark
        spark = get_spark("facs_overlap")
        df = spark.read.parquet(args.data)
        rows = grouped_overlap(df, args.group_col,
                               SketchSpec.make("theta", args.column,
                                               prep=args.prep, k=args.k),
                               shards=args.shards)
        for r in rows.orderBy("group_a", "group_b").collect():
            print(json.dumps(r.asDict()))
        return 0
    if args.cmd == "monitor":
        import os

        from .session import get_spark
        from .streaming.monitor import (classify_stream, stream_pages,
                                        windowed_contamination)
        spark = get_spark("facs_monitor")
        bloom = api._load_bloom(args.reference)
        stream = stream_pages(spark, args.pages_dir)
        classified = classify_stream(
            stream, bloom,
            tole_rate=args.tole_rate if args.tole_rate > 0 else None)
        report = windowed_contamination(classified, window=args.window)
        ckpt = args.checkpoint or os.path.join(args.pages_dir,
                                               "_monitor_ckpt")
        # update mode + foreachBatch: emit only windows touched by THIS
        # invocation, let the watermark evict finalized state, and —
        # unlike the memory sink — recover cleanly from the checkpoint
        # across process restarts
        emitted = {"n": 0}

        def emit(batch_df, epoch_id):
            for r in batch_df.orderBy("win", "lang").collect():
                d = r.asDict()
                d["win"] = {"start": str(d["win"]["start"]),
                            "end": str(d["win"]["end"])}
                d["epoch"] = epoch_id
                emitted["n"] += 1
                print(json.dumps(d, default=str))

        q = (report.writeStream.outputMode("update").foreachBatch(emit)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        if emitted["n"] == 0:
            print(json.dumps({"note": "no new pages since last "
                                      "checkpoint", "windows": 0}))
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())

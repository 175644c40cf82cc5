"""Benchmark harness (driver contract + scaling evidence).

Default mode: run every driver-contract query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the
flagship synthetic-pages build+classify throughput, and print ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries":
{name: sec}, "sf", "pages_per_sec", ...}.

Scaling mode (north rule, sandbox protocol per BASELINE.md): `python
bench.py --scaling` runs the same throughput job in fresh subprocesses
at two parallelism levels (default 8 and 32 cores) on the SAME
deterministic input and reports throughput at both + efficiency
  eff = (T_N / T_4N) / 4  ... expressed as pages/s ratio / core ratio.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("BENCH_PAGES", "1000000"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _pages_parquet(spark, n_pages: int) -> str:
    """Materialize the deterministic synthetic pages table once per
    machine (same bytes for every parallelism level — the scaling
    benchmark's 'same input' requirement)."""
    import tempfile

    from facs_spark.io.synth import synth_pages

    path = os.path.join(tempfile.gettempdir(), f"facs_bench_pages_{n_pages}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        synth_pages(spark, n_pages, partitions=64).write.mode(
            "overwrite").parquet(path)
    return path


def throughput_job(spark, n_pages: int) -> dict:
    """Flagship pages/s workload: build reference Bloom, classify every
    page of the materialized synthetic table, aggregate the report.
    Measures sketch-build + classification only (input pre-generated)."""
    from facs_spark.io.synth import reference_corpus_batch
    from facs_spark.kernels.shingle import shingle_batch
    from facs_spark.ops.contamination import (classify_pages,
                                              contamination_counters)
    from facs_spark.sketch import BloomFilter

    # 1-min load at job entry, before our own workers ramp: the
    # shared bench host carries neighbor tenants (observed load 17-20
    # with nothing of ours running), which compresses any measured
    # scaling ratio — record the evidence next to the number
    load0 = round(os.getloadavg()[0], 1)
    pages = spark.read.parquet(_pages_parquet(spark, n_pages))
    ref = reference_corpus_batch(n_docs=50, mean_tokens=200)
    # reference corpus is small + local → build its Bloom driver-side,
    # broadcast for classification (the semi-join small side)
    sb = shingle_batch(ref["text"].tolist(), 15)
    bloom = BloomFilter.create(capacity=max(sb.windows.shape[0], 1),
                               error_rate=0.0005, k_mer=15)
    bloom.add_batch(sb.windows)
    # warm-up: fork+import every python worker and fill the page cache
    # (all partitions touched), then measure steady state, best of 2
    contamination_counters(
        classify_pages(pages.sample(0.02, seed=1), bloom,
                       tole_rate=0.4)).collect()
    best, row = None, None
    for _ in range(2):
        t0 = time.perf_counter()
        classified = classify_pages(pages, bloom, tole_rate=0.4)
        row = contamination_counters(classified).collect()[0]
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {
        "pages": int(row["total_read_count"]),
        "contaminated": int(row["contaminated_reads"]),
        "sec": round(best, 3),
        "pages_per_sec": round(int(row["total_read_count"]) / best, 1),
        "host_load_1m": load0,
    }


def _warm_streaming(spark) -> None:
    """First-touch the Structured Streaming engine (micro-batch
    planner, state store provider, memory sink) outside any measured
    region — streaming init is ~5-40 s of one-off JVM work that used
    to land inside q28's recorded time and made it the noisiest row
    in the suite (round-3 VERDICT item #2)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    src = tempfile.mkdtemp(prefix="bench_stream_warm_")
    ckpt = tempfile.mkdtemp(prefix="bench_stream_warm_ckpt_")
    ckpt2 = tempfile.mkdtemp(prefix="bench_stream_warm_ckpt2_")
    try:
        spark.range(2).withColumn("g", F.col("id") % 2) \
            .withColumn("ts", F.timestamp_seconds(F.col("id"))) \
            .write.mode("overwrite").parquet(src)
        q = (spark.readStream.schema("id long, g long, ts timestamp")
             .parquet(src)
             .groupBy("g").count()
             .writeStream.outputMode("complete").format("memory")
             .queryName("bench_stream_warm")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        spark.catalog.dropTempView("bench_stream_warm")
        # the watermark + update-mode state path (q38's shape) has its
        # own first-touch cost distinct from complete mode's
        q2 = (spark.readStream.schema("id long, g long, ts timestamp")
              .parquet(src)
              .withWatermark("ts", "1 minute")
              .groupBy(F.window("ts", "1 minute"), "g").count()
              .writeStream.outputMode("update").format("memory")
              .queryName("bench_stream_warm2")
              .option("checkpointLocation", ckpt2)
              .trigger(availableNow=True).start())
        q2.awaitTermination()
        spark.catalog.dropTempView("bench_stream_warm2")
        # ...and the session-window + append path (q47's shape) has a
        # third first-touch cost (session state-store merge operator)
        ckpt3 = tempfile.mkdtemp(prefix="bench_stream_warm_ckpt3_")
        q3 = (spark.readStream.schema("id long, g long, ts timestamp")
              .parquet(src)
              .withWatermark("ts", "1 minute")
              .groupBy(F.session_window("ts", "1 minute"), "g").count()
              .writeStream.outputMode("append").format("memory")
              .queryName("bench_stream_warm3")
              .option("checkpointLocation", ckpt3)
              .trigger(availableNow=True).start())
        q3.awaitTermination()
        spark.catalog.dropTempView("bench_stream_warm3")
        shutil.rmtree(ckpt3, ignore_errors=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(ckpt2, ignore_errors=True)
    # q38's source fixture (two subset writes + a max-ts agg) is
    # deterministic per sf_dir and process-cached — staging it here
    # keeps it out of trial 1's measured time (round-4 VERDICT item #6)
    import shutil as _sh

    from facs_spark.queries import _q38_stage, _q47_stage
    _, q38_ckpt = _q38_stage(spark, SF_DIR)
    _sh.rmtree(q38_ckpt, ignore_errors=True)
    _, q47_ckpt = _q47_stage(spark, SF_DIR)
    _sh.rmtree(q47_ckpt, ignore_errors=True)


def dedup_job(spark, n_pages: int) -> dict:
    """Scaling job #2: the MinHash near-dup pipeline (signatures →
    banded LSH candidates → exact-Jaccard verify) over the same
    deterministic synthetic pages table.  Covers the dedup suite's
    shuffle+kernel mix the classify job doesn't touch: mapInPandas
    signature kernel, one-exchange groupBy cell gather with the
    capped pair expansion as an in-JVM transform/slice/flatten
    cascade (no window sort, no self-join), then the exact-Jaccard
    verify join."""
    from pyspark.sql import functions as F

    from facs_spark.ops.dedup import minhash_dedup

    load0 = round(os.getloadavg()[0], 1)  # see throughput_job
    base = (spark.read.parquet(_pages_parquet(spark, n_pages))
            .select(F.xxhash64("url").alias("doc_id"), "text"))
    # plant ~5% near-duplicates (one appended token ⇒ J ≈ 0.95) so
    # the exact-verify stage processes a realistic candidate volume.
    # Row-hash selection, NOT df.sample: sample()'s per-partition
    # draw changes with the scan's split planning, which depends on
    # defaultParallelism — the two scaling levels would dedup
    # different inputs (observed: 20050 vs 19818 pairs)
    twins = (base.filter(F.pmod(F.xxhash64("text"), F.lit(20)) == 0)
             .select((F.col("doc_id") + 1).alias("doc_id"),
                     F.concat(F.col("text"), F.lit(" zq")).alias("text")))
    pages = base.unionByName(twins)
    # warm-up on a slice, then measure steady state, best of 2.
    # minhash_dedup persists its candidate set, and Spark's cache
    # manager matches cache entries by canonicalized PLAN — so a
    # repeat trial would silently read the previous trial's cached
    # candidates and time only the verify stage.  Clear the cache
    # before every timed run so each trial pays the whole pipeline.
    minhash_dedup(pages.sample(0.02, seed=1), "doc_id", "text").count()
    best, pairs = None, 0
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        pairs = minhash_dedup(pages, "doc_id", "text").count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {
        "pages": n_pages,
        "neardup_pairs": int(pairs),
        "sec": round(best, 3),
        "pages_per_sec": round(n_pages / best, 1),
        "host_load_1m": load0,
    }


def chunk_job(spark, n_pages: int) -> dict:
    """Scaling job #3: context-window preparation (chunk_text →
    hash-shuffled pack_tokens, the q65/q66 ops as the
    prepare_context_windows composition) over the same deterministic
    synthetic pages table.  Covers the shapes the other two jobs
    don't: a map-side Generate that multiplies rows in-task, and a
    keyed window cumsum over the shard exchange.  The aggregate
    forces full materialization of every window and bin."""
    from pyspark.sql import functions as F

    from facs_spark.ops.chunking import chunk_text, pack_tokens

    load0 = round(os.getloadavg()[0], 1)  # see throughput_job
    pages = (spark.read.parquet(_pages_parquet(spark, n_pages))
             .select(F.xxhash64("url").alias("doc_id"), "text"))

    def run():
        chunks = chunk_text(pages, "doc_id", "text",
                            width=64, stride=48)
        windows = chunks.withColumn(
            "window_id", F.xxhash64(F.col("doc_id"), F.col("chunk_id")))
        packed = pack_tokens(windows, "window_id", "chunk_text",
                             budget=8192, shards=256)
        row = packed.agg(
            F.count(F.lit(1)).alias("windows"),
            F.sum("doc_tokens").alias("tokens"),
            F.countDistinct("shard", "bin").alias("bins")).collect()[0]
        return int(row["windows"]), int(row["tokens"]), int(row["bins"])

    # warm-up slice, then steady state, best of 2 (stateless — no
    # cache to clear)
    chunk_text(pages.sample(0.02, seed=1), "doc_id", "text").count()
    best, stats = None, None
    for _ in range(2):
        t0 = time.perf_counter()
        stats = run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {
        "pages": n_pages,
        "windows": stats[0],
        "tokens": stats[1],
        "bins": stats[2],
        "sec": round(best, 3),
        "pages_per_sec": round(n_pages / best, 1),
        "host_load_1m": load0,
    }


def shll_job(spark, n_pages: int) -> dict:
    """Scaling job #4: the sliding-HLL LPFM frontier build (the
    q97/q99 round-6b sketch tier) over the same deterministic
    synthetic pages table — distinct-url-since-T for EVERY trailing
    window from one pass.  Covers the shape the other jobs don't:
    heavy JVM string/expr work per row (md5 + hex-string rank) into
    ONE exchange of (register, ts_us, rank) longs, then a per-
    register window scan.  The frontier is a pure function of the
    input SET, so cross-level equality of (frontier size, window
    estimates) is asserted, not hoped for."""
    from facs_spark.ops.sliding_hll import (sliding_hll_frontier,
                                            windows_from_frontier)

    load0 = round(os.getloadavg()[0], 1)  # see throughput_job
    pages = (spark.read.parquet(_pages_parquet(spark, n_pages))
             .select("url", "warc_ts"))
    # warm-up: fork+import workers, fill the page cache
    sliding_hll_frontier(pages.sample(0.02, seed=1),
                         "url", "warc_ts").count()
    best, frontier = None, None
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        frontier = sliding_hll_frontier(pages, "url", "warc_ts").collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    tss = sorted(r["ts_us"] for r in frontier)
    thrs = [tss[0], tss[len(tss) // 2], tss[-1]]
    ests = windows_from_frontier(frontier, thrs)
    return {
        "pages": n_pages,
        "frontier_rows": len(frontier),
        "window_estimates": [round(e, 6) for e in ests],
        "sec": round(best, 3),
        "pages_per_sec": round(n_pages / best, 1),
        "host_load_1m": load0,
    }


def run_queries(spark, trials: int) -> tuple[dict[str, float],
                                             dict[str, list[float]]]:
    """Per-query MEDIAN of ``trials`` runs + the raw per-trial times.

    The shared bench host carries neighbor load (observed ±2-5× on
    identical warm repeats), so a single-shot per-query time cannot
    distinguish a regression from a noisy neighbor; medians of
    interleaved trials can (round-3 VERDICT item #8).  Trials are
    interleaved across the whole suite (full pass 1, full pass 2, ...)
    so a noise burst hits one trial of every query rather than every
    trial of one query.
    """
    import statistics

    import __spark_entry__ as e

    # warm the session before timing: fork the Python workers and JIT
    # the parquet-scan path once, so the first query in the dict is
    # not charged ~5 s of process startup (the BENCH.md protocol
    # measures steady state; cold-start cost is reported by the
    # scaling runs' fresh-JVM trials instead)
    warm = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id")
    warm.mapInPandas(lambda it: it, schema="doc_id long").count()
    _warm_streaming(spark)

    raw: dict[str, list[float]] = {}
    for _ in range(trials):
        for name, fn in e.queries().items():
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.collect()
            raw.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3))
    medians = {n: round(statistics.median(ts), 3) for n, ts in raw.items()}
    return medians, raw


def _record(payload: dict, stdout_keys: list[str] | None = None) -> None:
    """Persist the FULL result to BENCH.json and print a stdout line.

    The driver records only a small tail of stdout (BENCH_r04.json came
    back truncated, ``"parsed": null`` — the raw-trials dict pushed the
    line past the tail buffer and destroyed the record it was meant to
    protect).  So: the durable record is the file; stdout carries a
    compact line (``stdout_keys`` subset, or everything if None) that
    fits the tail buffer.
    """
    with open(os.path.join(REPO, "BENCH.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    line = (payload if stdout_keys is None
            else {k: payload[k] for k in stdout_keys if k in payload})
    print(json.dumps(line))


def summary(path: str = None) -> str:
    """One-line per-round summary computed FROM the recorded JSON (the
    BENCH.md headline must be reproducible from the record — round-4
    VERDICT item #1).  Prints: suite total (sum of per-query medians +
    throughput sec), slowest query, throughput."""
    with open(path or os.path.join(REPO, "BENCH.json")) as fh:
        d = json.load(fh)
    q = d["queries"]
    slowest = max(q, key=q.get)
    return (f"suite {round(sum(q.values()) + d['throughput']['sec'], 1)} s "
            f"({len(q)} query medians of {d['trials']} trials + "
            f"{d['throughput']['sec']} s throughput) | slowest {slowest} "
            f"{q[slowest]} s | {d['pages_per_sec']} pages/s @ {d['cpus']} cores")


def check_md() -> list[str]:
    """Recompute every current-round BENCH.md headline number from the
    persisted ``BENCH*.json`` records and report drift — the guard
    that keeps the round-4 class of record bugs dead (a hand-typed
    headline that the record does not support).  Each claim is the
    canonical substring BENCH.md must contain; intentional edits
    update the JSONs (rerun bench) FIRST, then the prose.  Returns a
    list of problems (empty = BENCH.md agrees with the records);
    wired as ``--check-md`` and run by ``tests/test_bench_md.py``.
    """
    with open(os.path.join(REPO, "BENCH.md")) as fh:
        md = fh.read()
    problems = []

    def expect(substr: str, what: str, where: str) -> None:
        if substr not in md:
            problems.append(
                f"{what}: BENCH.md lacks {substr!r} (from {where})")

    # the prose pins against BENCH_headline.json — a verbatim copy of
    # a bench run's BENCH.json made by ``--pin`` when the headline is
    # written.  BENCH.json itself is rewritten by every bench run
    # (including the driver's own per-round rerun), so checking the
    # prose against it directly would flag ambient-noise drift, not
    # record-integrity bugs.  The pin IS the record the prose quotes;
    # anyone can diff it against a fresh run.
    pin = os.path.join(REPO, "BENCH_headline.json")
    bench_path = pin if os.path.exists(pin) \
        else os.path.join(REPO, "BENCH.json")
    if os.path.exists(bench_path):
        with open(bench_path) as fh:
            d = json.load(fh)
        q = d["queries"]
        total = round(sum(q.values()) + d["throughput"]["sec"], 1)
        slowest = max(q, key=q.get)
        src = os.path.basename(bench_path)
        expect(f"{total} s", "suite total", src)
        expect(f"{len(q)} queries", "query count", src)
        expect(f"{round(d['pages_per_sec']):,} pages/s",
               "in-suite throughput", src)
        short = slowest.split("_")[0]
        if (f"{short} {q[slowest]}" not in md
                and f"{short} {round(q[slowest], 2)}" not in md):
            problems.append(
                f"slowest query: BENCH.md lacks "
                f"'{short} {q[slowest]}' (or its 2-decimal rounding; "
                f"from {src})")
    for suffix, label in (("", "flagship"), ("_dedup", "dedup"),
                          ("_chunk", "chunk"), ("_shll", "sliding-HLL")):
        path = os.path.join(REPO, f"BENCH_scaling{suffix}.json")
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            s = json.load(fh)
        expect(f"efficiency {s['value']}",
               f"{label} scaling efficiency", os.path.basename(path))
        for lvl, r in s["levels"].items():
            expect(f"{round(r['pages_per_sec']):,}",
                   f"{label} {lvl}-core throughput",
                   os.path.basename(path))
    return problems


def main() -> None:
    from facs_spark.session import get_spark

    if "--summary" in sys.argv:
        print(summary())
        return

    if "--check-md" in sys.argv:
        problems = check_md()
        for p in problems:
            print("DRIFT:", p)
        print(json.dumps({"metric": "bench_md_drift",
                          "value": len(problems), "unit": "claims"}))
        sys.exit(1 if problems else 0)

    if "--pin" in sys.argv:
        # snapshot the latest bench record as the one BENCH.md quotes
        import shutil
        shutil.copyfile(os.path.join(REPO, "BENCH.json"),
                        os.path.join(REPO, "BENCH_headline.json"))
        print(json.dumps({"pinned": "BENCH_headline.json"}))
        return

    jobs = {"--throughput-only": throughput_job,
            "--dedup-only": dedup_job, "--chunk-only": chunk_job,
            "--shll-only": shll_job}
    job_flag = next((f for f in jobs if f in sys.argv),
                    "--throughput-only")
    if any(f in sys.argv for f in jobs):
        spark = get_spark("bench_tp", cpus=CPUS, shuffle_partitions=CPUS)
        tp = jobs[job_flag](spark, BENCH_PAGES)
        spark.stop()
        print(json.dumps({"cpus": CPUS, **tp}))
        return

    scaling_subs = {"--scaling": "--throughput-only",
                    "--scaling-dedup": "--dedup-only",
                    "--scaling-chunk": "--chunk-only",
                    "--scaling-shll": "--shll-only"}
    if any(f in sys.argv for f in scaling_subs):
        sub_flag = next(v for f, v in scaling_subs.items()
                        if f in sys.argv)
        levels = [int(x) for x in
                  os.environ.get("SCALING_LEVELS", "8,32").split(",")]
        trials = int(os.environ.get("SCALING_TRIALS", "3"))
        # scaling needs a long-enough measured region: at 1M pages the
        # 32-core classify job finishes in ~2.5 s and scheduling
        # overhead caps the ratio (measured eff 0.49 at 1M vs ≥0.8 at
        # 4M) — default the protocol to 4M unless the caller pinned
        # BENCH_PAGES.  The dedup job needs the same guard: after the
        # round-4/5 candidate+verify rewrites, 400k pages drain in
        # ~12 s at 8 cores and the fixed per-job latencies dominate
        # (measured eff 0.27 at 400k, 0.52 at 2M, 0.72 at 4M — the
        # candidate/verify rewrites made the job fast enough that 2M
        # no longer amortizes the 5-job wave's fixed latencies), so
        # the dedup protocol also defaults to 4M
        # the chunk job drains 4M pages in ~6 s at 32 cores — still
        # inside the fixed-wave-latency regime (measured eff 0.51 at
        # 2M vs 0.949 at 8M) — so its protocol defaults larger
        # the shll frontier drains 1M pages in ~1.2 s at 32 cores —
        # same fixed-latency regime; 8M gives a ~10 s wide-level
        # measured region (and reuses the chunk protocol's table)
        default_pages = ("8000000" if sub_flag in ("--chunk-only",
                                                   "--shll-only")
                         else "4000000")
        n_pages = int(os.environ.get("BENCH_PAGES", default_pages))
        results = {}
        # interleave trials across levels so shared-host noise hits
        # both levels alike; keep the best run per level.  Before each
        # trial, wait (bounded) for the 1-min load to settle: the
        # PREVIOUS trial's 32 threads keep the load average elevated
        # for ~a minute after exit, which would otherwise charge the
        # next level for our own trail (observed: an 8-core trial
        # entering at load 21.6 right after a 32-core trial)
        def _settle(threshold=2.0, timeout=150):
            t_end = time.time() + timeout
            while os.getloadavg()[0] > threshold and time.time() < t_end:
                time.sleep(5)
        all_trials: dict[int, list] = {l: [] for l in levels}
        for t in range(trials):
            for lvl in levels:
                _settle()
                env = dict(os.environ, SPARK_GRAFT_CPUS=str(lvl),
                           BENCH_PAGES=str(n_pages))
                out = subprocess.run(
                    [sys.executable, __file__, sub_flag],
                    capture_output=True, text=True, env=env, check=True)
                r = json.loads(out.stdout.strip().splitlines()[-1])
                all_trials[lvl].append(
                    {k: r[k] for k in ("sec", "pages_per_sec",
                                       "host_load_1m")})
                if (lvl not in results
                        or r["pages_per_sec"] > results[lvl]["pages_per_sec"]):
                    results[lvl] = r
        for lvl in levels:
            results[lvl]["trials"] = all_trials[lvl]
        lo, hi = min(levels), max(levels)
        eff = ((results[hi]["pages_per_sec"] / results[lo]["pages_per_sec"])
               / (hi / lo))
        suffix = {"--dedup-only": "_dedup",
                  "--chunk-only": "_chunk",
                  "--shll-only": "_shll"}.get(sub_flag, "")
        payload = {
            "metric": f"scaling_efficiency{suffix}",
            "value": round(eff, 3),
            "unit": "ratio",
            "levels": {str(l): results[l] for l in levels},
            "pages": n_pages,
        }
        with open(os.path.join(
                REPO, f"BENCH_scaling{suffix}.json"), "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.write("\n")
        print(json.dumps(payload))
        return

    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=CPUS)
    t_all = time.perf_counter()
    timings, raw = run_queries(spark, trials)
    spark.catalog.clearCache()  # drop query-phase cached frames
    tp = throughput_job(spark, BENCH_PAGES)
    wall = round(time.perf_counter() - t_all, 3)
    spark.stop()
    # headline value = sum of per-query medians + throughput time —
    # the noise-robust suite cost (wall_sec is the raw elapsed time
    # including all trials)
    total = round(sum(timings.values()) + tp["sec"], 3)
    # full record (incl. raw trials) → BENCH.json; compact line (no
    # query_trials — that dict is what overflowed the driver's stdout
    # tail buffer in round 4) → stdout for the driver
    _record({
        "metric": "headline_queries_plus_throughput_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_trials": raw,
        "trials": trials,
        "wall_sec": wall,
        "sf": _sf_from_dir(SF_DIR),
        "throughput": tp,
        "pages_per_sec": round(tp["pages_per_sec"], 1),
        "cpus": CPUS,
    }, stdout_keys=["metric", "value", "unit", "queries", "trials",
                    "wall_sec", "sf", "throughput", "pages_per_sec",
                    "cpus"])


if __name__ == "__main__":
    main()

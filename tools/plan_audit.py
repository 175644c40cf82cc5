"""Physical-plan audit: capture `.explain("formatted")` for the
headline queries and extract the load-bearing scale properties
(exchange count, shuffle keys, pushed filters, python stages, join
strategies) into PLANS.md — the durable artifact behind
the plan assertions in tests/test_plans.py.

    python tools/plan_audit.py [sf_dir]   # default /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# the queries whose plans carry the scale argument; each with the
# properties a reviewer should check
AUDIT = [
    ("q01_pricing_summary", "partial+final agg, pushed filter"),
    ("q02_bloom_semijoin", "broadcast kernel — no join exchange"),
    ("q04_classify_pages", "shuffle-free map-side classify"),
    ("q09_exact_dedup", "single shuffle on 64-bit digest"),
    ("q10_minhash_neardup", "longs-only candidate shuffle"),
    ("q11_simhash_pairs", "≤2 exchanges, 0 sorts, no join"),
    ("q12_ngram_jaccard",
     "blocked grid: arrays-only exchanges + in-task intersection kernel, no self-join"),
    ("q13_embedding_topk", "broadcast query matrix"),
    ("q23_salted_join", "salted equi-join"),
    ("q30_revenue_by_nation", "broadcast dims, single fact shuffle"),
    ("q34_bloom_prejoin", "runtime filter + range pushdown"),
    ("q39_asof_join", "single keyed exchange, no join explosion"),
    ("q41_range_join",
     "band_count_min: one (key, block) exchange + in-task searchsorted/RMQ aggregate — no pair materialization, no nested loop"),
    ("q42_stratified_sample", "map-side filter, zero exchanges"),
    ("q49_bucketed_join", "bucketed — no shuffle on either side"),
    ("q53_substring_dedup", "semi-join probe, long shuffle keys"),
    ("q55_line_dedup", "min(struct) agg, one text shuffle"),
    ("q56_decontaminate", "distinct eval probe, map-side counts"),
    ("q59_rebalance_mixture", "map-side threshold filter"),
    ("q60_scrub_pii", "pure regexp map — no data exchange"),
    ("q61_gopher_rules",
     "expression map, stopwords in ONE alternation pass; single-compute sort"),
    ("q62_lm_score", "token-count join + per-doc agg"),
    ("q63_domain_filter", "broadcast group-verdict join"),
    ("q65_chunk_windows", "map-side Generate — zero exchanges"),
    ("q66_pack_sequences", "one shard exchange + window scan"),
    ("q67_dsir_weights", "broadcast bucket model, text never shuffles"),
    ("q70_incremental_dedup", "definite-negative bypass + exact anti"),
    ("q71_bigram_lm_score",
     "pair stream joins the model ONCE (unigrams folded at training)"),
    ("q73_token_entropy", "two map-side-combined aggs, distinct-token rows"),
    ("q75_kmeans_counts", "map-side assign, k-row agg"),
    ("q76_png_decode",
     "decode kernels map-side; checkpointed single-compute final sort"),
    ("q77_normalize_text", "codegen maps around one Arrow map, no shuffle"),
    ("q78_script_profile",
     "one UTF-32 codepoint kernel (no keyed exchange); single-compute sort"),
    ("q79_linear_quality", "in-expression weights, one map-side agg"),
    ("q80_mg_heavy_hitters", "MG partials map-side, exact verifier agg"),
    ("q81_fd_covariance", "gram partials per partition, 1-row reduce"),
    ("q82_containment_grid",
     "per-lang Blooms map-side; only (lang,lang,hits) partials move"),
    ("q83_ams_f2", "AMS build map-side, exact F2 two-level agg"),
    ("q84_cbf_revoked_filter",
     "broadcast CBF probe — no join exchange, counters-only shuffle"),
    ("q85_ams_join_size",
     "join priced from two map-side sketch passes; verifier join only"),
    ("q86_priority_sample",
     "TakeOrdered top-(k+1) heaps — no global sort exchange"),
    ("q87_bloom_cardinality",
     "one fanned-out cached projection feeds 3 jobs; blobs-only "
     "lang shuffle"),
    ("q89_theta_difference",
     "two map-side theta builds; verifier distinct anti-join only"),
    ("q90_countsketch_tokens",
     "CS partials map-side; exact top-20 via TakeOrdered heap"),
    ("q92_cuckoo_revoked_filter",
     "broadcast cuckoo probe — no join exchange, fingerprints only"),
    ("q93_countsketch_delta",
     "two map-side CS builds subtracted driver-side; exact top-20 heap"),
    ("q94_jpeg_decode",
     "chained synth+decode kernels stay partition-parallel; single-compute sort"),
    # q95/q96 collect their sketch state driver-side, so the
    # RETURNED frame's plan is trivial — their distributed shapes
    # are pinned in tests/test_plans.py (grouped-sketch blob shuffle,
    # b-bit signature partial-MIN) instead of audited here
    ("q97_sliding_hll",
     "map-side partial LPFM frontiers; one register exchange of partials shared by dedup agg AND window"),
    ("q101_kmv_distinct_sample",
     "salted bottom-k cells map-side; merge sees cells×k rows, no global window sort"),
    ("q98_moments_sketch",
     "power-sum partials map-side; blobs-only lang shuffle"),
    ("q100_decayed_counts",
     "per-(key, bucket) counts partial-agg; counts-only shuffle"),
]


def _formatted(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution \
        .ExplainMode
    return df._jdf.queryExecution().explainString(
        mode.fromString("formatted"))


def audit_one(plan: str) -> dict:
    nodes = re.findall(r"^\(\d+\) (\S+)", plan, flags=re.M)
    keys = re.findall(r"Arguments: hashpartitioning\(([^#)]*)#", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return {
        "exchanges": sum(1 for n in nodes if n.startswith("Exchange")),
        "shuffle_keys": sorted(set(k.strip() for k in keys)),
        "sorts": sum(1 for n in nodes if n == "Sort"),
        "joins": sorted({n for n in nodes if "Join" in n}),
        "python_stages": sum(1 for n in nodes
                             if "Python" in n or "Arrow" in n
                             or "FlatMapGroupsInPandas" in n
                             or "MapInPandas" in n),
        "pushed_filters": [p for p in pushed if p][:3],
        "nested_loop": any("NestedLoop" in n or "Cartesian" in n
                           for n in nodes),
    }


def main() -> int:
    import __spark_entry__ as e
    from facs_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/testdata/sf0.01"
    spark = get_spark("facs_spark_plan_audit", cpus=4,
                      shuffle_partitions=8)
    qs = e.queries()
    lines = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir}` from the",
        "actual Catalyst output (`.explain(\"formatted\")`); the same",
        "properties are pinned as regression tests in",
        "`tests/test_plans.py`.  `nested_loop` must be False",
        "everywhere; shuffle keys must be narrow columns (ids/",
        "hashes/cluster keys), never raw text.",
        "",
        "| query | claim | exchanges | shuffle keys | sorts | joins |"
        " python stages | nested loop |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, claim in AUDIT:
        df = qs[name](spark, sf_dir)
        pre = getattr(df, "_facs_pre_sort", None)
        if pre is not None:
            # _sorted_once queries: the eager checkpoint truncates
            # the final frame's lineage, so audit the PIPELINE plan
            # (the sort child) and count the final range
            # exchange + sort on top of it
            a = audit_one(_formatted(pre))
            a["exchanges"] += 1
            a["sorts"] += 1
        else:
            a = audit_one(_formatted(df))
        lines.append(
            f"| {name} | {claim} | {a['exchanges']} | "
            f"{', '.join(a['shuffle_keys']) or '—'} | {a['sorts']} | "
            f"{', '.join(a['joins']) or '—'} | {a['python_stages']} | "
            f"{a['nested_loop']} |")
        print(name, a)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

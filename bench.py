"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a full materialization (noop write — no
driver-side collection cost). Session startup is excluded from
per-query times but included in nothing (value = sum of query times).

Self-defense against machine drift: every query runs
``$SPARK_GRAFT_BENCH_REPS`` times (default 3) and ``queries`` reports
the per-query MEDIAN; ``stats`` carries {median, min, spread, runs}
per query and ``loadavg`` records os.getloadavg() before and after.
A single-shot bench on a noisy shared box produced a false
round-over-round "regression" once; the medians + spread + load
numbers make each BENCH_rN.json interpretable on its own. Engine
memoization (the pipeline-plan cache and its persisted frames) is
cleared between repetitions so every rep pays the full plan-build +
execution cost — reps measure the operator, not the cache.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

HEADLINE = [
    "q90_capex_pipeline",  # the flagship: full rule DAG end-to-end
    "q01_status_filter",
    "q02_regex_filter",
    "q06_broadcast_dim_join",
    "q07_semi_join",
    "q09_pivot_sum",
    "q10_summary_report",
    "q14_topk_per_group",
    "q15_dedup_first",
    "q21_amount_reconcile",
    "q22_set_agg_compare",
    "q30_exact_dedup",
    "q31_minhash_lsh",
    "q34_cosine_topk",
    "q38_dedup_clusters",
    "q36_ann_lsh",
    "q37_ann_ivf",
    "q39_corpus_curation",
    "q42_token_count",
    "q44_doc_chunks",
    "q50_tumbling_window",
    "q52_session_window",
    "q53_user_activity",
    "q93_fn_enrichment",
    # round-6 corpus-curation additions: the repetition explode+agg,
    # semantic dedup's cluster self-join, tf-idf's two-level aggregate
    # + vocab join, and the LM-likelihood two-pass score
    "q64_repetition_metrics",
    "q67_semantic_dedup",
    "q68_tfidf_topk",
    "q70_unigram_logprob",
    # round-7 temporal/corpus additions: the cross-document line dedup
    # (3-shuffle explode+agg+regroup), the grid resample (sequence
    # explode + running-fill window over 100k events), the two-pass
    # exact-percentile robust z-score, and the bigram-PMI double
    # explode+aggregate with its twice-joined vocab frame
    "q76_crossdoc_lines",
    "q79_resample_ffill",
    "q83_robust_zscore",
    "q87_bigram_pmi",
    # round-8 additions: BM25 (pruned explode + tiny-broadcast scoring
    # + TakeOrdered), the map-only char-entropy HOF pass over the full
    # corpus, and the stream-static broadcast enrich over 100k events
    "q95_bm25_topk",
    "q97_char_entropy",
    "q58_static_enrich",
    # iterative integer PageRank: 3 chained join+agg rounds over the
    # persisted degree-annotated edge list — the deepest new plan
    "q99_pagerank",
    "q59_windowed_topk",
    "q100_bpe_pairs",
    "q101_group_centroids",
    # single-scan multi-distinct profile (Expand) and the window-merge
    # CDC maintenance over 150k orders rows
    "q102_snapshot_drift",
    "q103_cdc_apply",
    # round-5 final pair: the fingerprint-audit split report and the
    # two-pass (1-row stats broadcast + bucket agg) histogram
    "q104_split_leakage",
    "q105_numeric_histogram",
]


def _reset_engine_caches() -> None:
    """Drop engine-level memoization so each repetition re-pays the full
    cost: the pipeline-plan cache (q90/q91/q93/q27 share one DAG build)
    and every tracked persisted frame."""
    from capex_data_pipeline_spark import registry_ext
    from capex_data_pipeline_spark.cache import release_persisted

    registry_ext.clear_pipeline_cache()
    release_persisted()


#: queries the --scaling alarm watches: the flagship DAG and the
#: deepest plan in the repo (whose audit/enrichment self-joins are the
#: likeliest place for a future quadratic stage to hide)
SCALING_QUERIES = ("q90_capex_pipeline", "q93_fn_enrichment")


def scaling_check() -> None:
    """``bench.py --scaling``: run the scaling-watch queries at two
    scale factors in one session and report each wall-clock ratio — a
    structural alarm for accidentally quadratic stages (a regression in
    the fail-open or enrichment self-joins would show up as a ratio far
    above the data-scale multiple; local single-scale benches can't see
    that). Prints one JSON line with the per-query times and ratios."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    small = os.environ.get("SPARK_GRAFT_SCALING_SMALL", "/root/testdata/sf0.01")
    large = os.environ.get("SPARK_GRAFT_SCALING_LARGE", "/root/testdata/sf0.1")

    from capex_data_pipeline_spark.registry import QUERIES
    from capex_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="capex-bench-scaling",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    out = {}
    for name in SCALING_QUERIES:
        q = QUERIES[name]
        times = {}
        for sf_dir in (small, large):
            # one warm pass absorbs codegen/scan setup, then median of reps
            runs = []
            for i in range(reps + 1):
                _reset_engine_caches()
                t0 = time.perf_counter()
                q(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if i:  # drop the warm-up run
                    runs.append(dt)
            times[sf_dir] = round(statistics.median(runs), 4)
        out[name] = {
            "small_sec": times[small],
            "large_sec": times[large],
            "ratio": round(times[large] / times[small], 4),
        }
    print(
        json.dumps(
            {
                "metric": "scaling_ratios",
                "small_dir": small,
                "large_dir": large,
                "queries": out,
                "value": out[SCALING_QUERIES[0]]["ratio"],
                "unit": "ratio",
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    from capex_data_pipeline_spark.registry import QUERIES
    from capex_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="capex-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    # derive an sf label from the directory name (e.g. sf0.1 -> 0.1)
    base = os.path.basename(os.path.normpath(sf_dir))
    sf = float(base[2:]) if base.startswith("sf") else base

    # warm the JVM/codegen/scan paths so timings reflect steady state,
    # not first-job session setup
    from capex_data_pipeline_spark.sources.parquet import read_table

    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        read_table(spark, sf_dir, t).count()

    names = [n for n in HEADLINE if n in QUERIES]

    # warm Catalyst + whole-stage-codegen per query shape at the smallest
    # scale factor (generated code is cached by source text, so the same
    # plan shape at the timed SF compiles to a cache hit). Errors are
    # ignored — a query that only works at the timed SF still benches.
    warm_dir = os.path.join(os.path.dirname(os.path.normpath(sf_dir)), "sf0.001")
    if os.path.isdir(warm_dir) and warm_dir != os.path.normpath(sf_dir):
        for name in names:
            try:
                QUERIES[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
        _reset_engine_caches()

    load_before = os.getloadavg()
    timings: dict[str, float] = {}
    stats: dict[str, dict] = {}
    for name in names:
        runs: list[float] = []
        for _ in range(reps):
            _reset_engine_caches()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        med = statistics.median(runs)
        timings[name] = round(med, 4)
        stats[name] = {
            "median": round(med, 4),
            "min": round(min(runs), 4),
            # relative run-to-run dispersion; < 0.15 = trustworthy number
            "spread": round((max(runs) - min(runs)) / med, 4) if med else 0.0,
            "runs": [round(r, 4) for r in runs],
        }
    load_after = os.getloadavg()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": reps,
                "stats": stats,
                "loadavg": {
                    "before": [round(x, 2) for x in load_before],
                    "after": [round(x, 2) for x in load_after],
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    if "--scaling" in sys.argv[1:]:
        scaling_check()
    else:
        main()

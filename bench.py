"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": dir}.

Stability: a tiny-SF warm-up pass first compiles every query's plan and
fills JVM/codegen/parquet-footer caches, then each query is timed
$SPARK_GRAFT_BENCH_RUNS times (default 3) and the per-query MINIMUM is
reported — the min is the least-noise estimator for a fixed workload on
a shared box (run-to-run swings here are scheduler/GC noise, not code).
The per-query spread ((max-min)/min) is emitted alongside so
round-over-round regressions are attributable to code, not variance.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from database_stream_processor_spark.queries import REGISTRY
from database_stream_processor_spark.session import get_spark

#: headline set: one per operator family (scan-agg, join-agg, multi-join,
#: range join, window, rolling, as-of, top-k, dedup pipeline, jaccard,
#: ANN brute + LSH, text analysis, incremental engine, recursion)
HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q05_supplier_volume",
    "q10_signup_to_purchase",
    "q15_topk_orders_per_priority",
    "q20_hopping_window",
    "q21_rolling_per_user",
    "q22_asof_enrich",
    "q27_lsh_near_dup_pairs",
    "q29_ngram_jaccard_pairs",
    "q59_corpus_dedup",
    "q30_cosine_topk",
    "q31_lsh_ann_topk",
    "q33_quality_score",
    "q37_incremental_revenue",
    "q39_transitive_closure",
    "q42_incremental_rolling",
    "q48_rolling_linear",
    "q43_incremental_tumbling",
    "q44_incremental_closure",
    "q46_ivf_topk",
    "nx_q05_hot_items",
    "nx_q09_winning_bids",
]

WARMUP_SF = "/root/testdata/sf0.001"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_spark(app_name="bench")

    # warm-up: JVM, codegen, parquet footer caches — every headline plan
    # compiles and executes once at the tiny SF before any timing starts
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for name in HEADLINE:
        try:
            REGISTRY[name].fn(spark, WARMUP_SF).count()
        except Exception as e:  # a warm-up failure must not kill the bench
            print(f"# warmup {name} failed: {e}", file=sys.stderr)

    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for r in range(n_runs):
        for name in HEADLINE:
            fn = REGISTRY[name].fn
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            took = round(time.time() - t0, 3)
            runs[name].append(took)
            print(f"# run{r} {name}: {took}s ({n} rows)", file=sys.stderr)

    timings = {name: min(ts) for name, ts in runs.items()}
    spread = {name: (round((max(ts) - min(ts)) / min(ts), 3)
                     if min(ts) > 0 else 0.0)
              for name, ts in runs.items()}
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "runs": n_runs,
        "sf": sf_dir,
    }))


if __name__ == "__main__":
    main()

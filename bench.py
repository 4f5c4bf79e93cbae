"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": dir}.

Stability: a tiny-SF warm-up pass first compiles every query's plan and
fills JVM/codegen/parquet-footer caches, then each query is timed
$SPARK_GRAFT_BENCH_RUNS times (default 3) and the per-query MINIMUM is
reported — the min is the least-noise estimator for a fixed workload on
a shared box (run-to-run swings here are scheduler/GC noise, not code).
Fast queries (min < 3s), whose timings are dominated by fixed-cost
noise, get extra runs (up to 8 total) while their best-3 window is
still loose.  The emitted per-query ``spread`` is (3rd-best − best)/best
over the final run set — the attributability measure for
round-over-round deltas (an early cold outlier no longer poisons it;
the raw max is still visible in the stderr run log).
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


def _calibrate() -> float:
    """Fixed-work CPU loop (pure Python, single thread) — a host-speed
    probe.  The sandbox host throttles unpredictably (r5: the same q44
    profile swung 11s → 64-110s within 30 min), so every bench records
    this number at start and end: round-over-round query deltas are only
    attributable when the calibrations agree."""
    t0 = time.time()
    acc = 0
    for i in range(4_000_000):
        acc = (acc * 1103515245 + i) & 0x7FFFFFFF
    assert acc >= 0
    return round(time.time() - t0, 3)


#: the parallel probe and effective-core estimate derive from Spark's
#: actual execution width (defaultParallelism = the local[N] thread
#: count), NOT os.cpu_count() — on a host whose Spark master is
#: narrower than the machine the probe would otherwise oversubscribe
#: and permanently fail the gate (ADVICE r8 #3 + r9 review); the
#: serial/parallel thresholds stay env-overridable for the same reason
_SERIAL_OK = float(os.environ.get("SPARK_GRAFT_BENCH_SERIAL_OK", "0.47"))
_PAR_OK = float(os.environ.get("SPARK_GRAFT_BENCH_PAR_OK", "0.47"))
_PAR_REF = float(os.environ.get("SPARK_GRAFT_BENCH_PAR_REF", "0.42"))


def _spark_width(spark) -> int:
    return max(1, spark.sparkContext.defaultParallelism)


def _calibrate_parallel(spark) -> float:
    """Fixed per-core JVM-side parallel workload (a 50M-id sum per
    execution thread, whole-stage codegen) — the EFFECTIVE-CORES probe.  r7
    found the host can silently shrink the 32-vCPU allocation to ~21
    effective cores: the single-thread probe stays ~0.45s while every
    shuffle-heavy query uniformly gains 15-25%.  Deltas on heavy queries
    are attributable only when BOTH probes agree round-over-round."""
    w = _spark_width(spark)
    t0 = time.time()
    spark.range(0, 50_000_000 * w, 1, w).selectExpr(
        "sum(id % 1000003) AS s").collect()
    return round(time.time() - t0, 3)


def _calibrate_job_latency(spark) -> float:
    """Median wall time of a trivial Spark job (``range(1).count()``),
    in milliseconds — the DRIVER-SIDE scheduling probe.  The r9 q39
    investigation found a class of drift NEITHER other probe sees:
    job-dense fixpoint queries (q39 = ~8 one-job rounds over 255 edges)
    are bounded by per-job scheduling latency, which can double while
    serial CPU and parallel throughput both read "quiet".  Recording it
    start+end makes microbenchmark drift attributable."""
    lat = []
    for _ in range(15):
        t0 = time.time()
        spark.range(1).count()
        lat.append(time.time() - t0)
    lat.sort()
    return round(lat[len(lat) // 2] * 1000, 1)


def _loadavg() -> list[float]:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return []


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

    job_counts: dict[str, list[int]] = {}

    def time_one(name: str, r) -> float:
        """Time one run inside its own job group so the run's Spark JOB
        COUNT is recorded alongside (r9 verdict ask #6): job-dense
        queries (fixpoints, multi-tick engines) are bounded by per-job
        scheduler latency, and `jobs x job_ms` makes that component of
        a round-over-round delta directly attributable."""
        fn = REGISTRY[name].fn
        group = f"bench-{name}-{r}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        took = round(time.time() - t0, 3)
        try:
            jn = len(spark.sparkContext.statusTracker()
                     .getJobIdsForGroup(group))
        except Exception:
            jn = -1
        job_counts.setdefault(name, []).append(jn)
        print(f"# run{r} {name}: {took}s ({n} rows, {jn} jobs)",
              file=sys.stderr)
        return took

    def best3_spread(ts: list[float]) -> float:
        s = sorted(ts)[:3]
        return round((s[-1] - s[0]) / s[0], 3) if s[0] > 0 else 0.0

    # Host-quality gate (r7 verdict ask: the +23% r7 regression was
    # pure host contention — serial probe +15%, ~21/32 effective cores).
    # Wait for a quiet host before timing: up to 8 attempts, 20 s apart,
    # requiring serial ≤ 0.47 s, parallel ≤ 0.47 s (≈ ≥28/32 effective
    # cores against the 0.42 s full-speed reference), 1-min load < 2.
    # If the host never settles, proceed anyway but stamp a
    # machine-readable ``degraded: true`` the verdict can trust.
    SERIAL_OK, PAR_OK, PAR_REF = _SERIAL_OK, _PAR_OK, _PAR_REF
    cal_start = par_start = None
    gate_passed = False
    for attempt in range(8):
        cal_start = _calibrate()
        par_start = _calibrate_parallel(spark)
        la = _loadavg()
        gate_passed = (cal_start <= SERIAL_OK and par_start <= PAR_OK
                       and (not la or la[0] < 2.0))
        if gate_passed:
            break
        print(f"# host busy (serial {cal_start}s, par {par_start}s, "
              f"load {la[:1]}) — waiting", file=sys.stderr)
        if attempt < 7:
            time.sleep(20)
    # degraded iff the full gate (probes AND load) never accepted the
    # host — a loaded box with lucky probe reads must still be flagged
    degraded = not gate_passed
    job_ms_start = _calibrate_job_latency(spark)
    load_start = _loadavg()
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for r in range(n_runs):
        for name in HEADLINE:
            runs[name].append(time_one(name, r))
    # fixed-cost noise dominates fast queries: add runs until the best-3
    # window tightens (bounded, and never for the expensive queries)
    for name, ts in runs.items():
        while (len(ts) < 8 and min(ts) < 3.0
               and best3_spread(ts) > 0.15):
            ts.append(time_one(name, f"x{len(ts)}"))
    # throttle guard: ANY query whose best-3 window is still loose gets
    # up to two more shots — a host stall mid-pass otherwise reads as a
    # code regression in the round-over-round comparison
    for name, ts in runs.items():
        while len(ts) < n_runs + 2 and best3_spread(ts) > 0.2:
            ts.append(time_one(name, f"t{len(ts)}"))
    # settle before the END probes: they exist to detect HOST slowdown,
    # and probing in the tail of the bench's own JVM work (GC, executor
    # teardown) reads the bench's residue as host degradation.  Each
    # probe takes the best of two readings 10 s apart — one unlucky
    # scheduling window must not stamp a clean run as degraded (the
    # START gate already retries symmetrically, up to 8 times).
    time.sleep(15)
    cal_end = _calibrate()
    par_end = _calibrate_parallel(spark)
    if cal_end > SERIAL_OK or par_end > PAR_OK:
        time.sleep(10)
        cal_end = min(cal_end, _calibrate())
        par_end = min(par_end, _calibrate_parallel(spark))
    job_ms_end = _calibrate_job_latency(spark)

    timings = {name: min(ts) for name, ts in runs.items()}
    spread = {name: best3_spread(ts) for name, ts in runs.items()}
    jobs = {name: min(c for c in cs if c >= 0) if any(c >= 0 for c in cs)
            else None for name, cs in job_counts.items()}
    # job-bound rows: scheduling latency (jobs x job_ms) explains over
    # half the best timing — their round-over-round deltas track the
    # host's job_ms, not code (r9 verdict ask #6)
    job_bound = sorted(
        name for name, t in timings.items()
        if jobs.get(name) and t > 0
        and jobs[name] * job_ms_start / 1000.0 > 0.5 * t)
    total = round(sum(timings.values()), 3)
    # The driver records only the LAST 2000 chars of stdout and parses
    # the JSON it finds there (BENCH_r10.json came back "parsed": null
    # because the single line outgrew that window once jobs/job_bound
    # were added).  So: the comparable numbers — metric/value/queries/
    # degraded — go on ONE short final stdout line (~1 KB for 23
    # queries), and the diagnostic detail (spread, job counts,
    # calibration) goes to stderr + bench_detail.json, never risking
    # the headline again.
    detail = {
        "spread": spread,
        "jobs": jobs,
        "job_bound": job_bound,
        "runs": n_runs,
        "calibration": {"start_sec": cal_start, "end_sec": cal_end,
                        "par_start_sec": par_start,
                        "par_end_sec": par_end,
                        "effective_cores": round(
                            _spark_width(spark) * PAR_REF
                            / max(par_start, par_end), 1),
                        "job_ms_start": job_ms_start,
                        "job_ms_end": job_ms_end,
                        "loadavg_start": load_start,
                        "loadavg_end": _loadavg()},
    }
    headline = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # True when the host never met the quiet gate (serial ≤ 0.47s,
        # par ≤ 0.47s) at start OR had degraded by the end — timings in
        # a degraded run are NOT attributable to code changes
        "degraded": bool(degraded or cal_end > SERIAL_OK
                         or par_end > PAR_OK),
        # the scheduling-latency probe, surfaced on the headline line
        # (additions-only) so round-over-round wall comparisons can
        # SELF-LABEL: the r12 verdict found a 55 → 95 ms job_ms swing
        # between driver hosts poisoned the whole headline comparison
        # (17/23 queries job_bound).  Two runs' per-query deltas are
        # attributable only when their job_ms agree within ~20%; the
        # quiet-gate probes cannot see this drift (serial CPU and
        # parallel throughput both read clean at 95 ms/job).
        "job_ms": [job_ms_start, job_ms_end],
        "sf": sf_dir,
    }
    line = json.dumps(headline)
    if len(line) > 1900:  # must fit the driver's 2000-char tail window
        detail["queries"] = timings
        headline["queries"] = "see bench_detail.json"
        line = json.dumps(headline)
    print("BENCH_DETAIL " + json.dumps(detail), file=sys.stderr)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_detail.json"), "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    print(line, flush=True)


if __name__ == "__main__":
    main()

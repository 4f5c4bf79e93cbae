"""Subset A/B bench: times the named registry queries with bench.py's
methodology (tiny-SF warm-up pass, N timed runs, per-query MINIMUM) plus
the job-latency calibration probe, and prints one JSON line.  Measurement
tool only — the graded bench stays bench.py.

Usage: python scripts/ab_bench.py q37_incremental_revenue q42_... [...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), AB_RUNS (3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_stream_processor_spark.queries import REGISTRY
from database_stream_processor_spark.session import get_spark

WARMUP_SF = "/root/testdata/sf0.001"


def job_ms(spark) -> float:
    lat = []
    for _ in range(15):
        t0 = time.time()
        spark.range(1).count()
        lat.append(time.time() - t0)
    lat.sort()
    return round(lat[len(lat) // 2] * 1000, 1)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    runs = int(os.environ.get("AB_RUNS", "3"))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_bench")
    spark.read.parquet(f"{sf}/lineitem.parquet").count()
    for n in names:
        try:
            REGISTRY[n].fn(spark, WARMUP_SF).count()
        except Exception as e:
            print(f"# warmup {n} failed: {e}", file=sys.stderr)
    ms0 = job_ms(spark)
    res: dict[str, list[float]] = {}
    jobs: dict[str, list[int]] = {}
    for r in range(runs):
        for n in names:
            group = f"ab-{n}-{r}"
            spark.sparkContext.setJobGroup(group, n)
            t0 = time.time()
            cnt = REGISTRY[n].fn(spark, sf).count()
            t = round(time.time() - t0, 3)
            try:
                jn = len(spark.sparkContext.statusTracker()
                         .getJobIdsForGroup(group))
            except Exception:
                jn = -1
            res.setdefault(n, []).append(t)
            jobs.setdefault(n, []).append(jn)
            print(f"# run{r} {n}: {t}s ({cnt} rows, {jn} jobs)",
                  file=sys.stderr)
    ms1 = job_ms(spark)
    print(json.dumps({
        "queries": {n: min(ts) for n, ts in res.items()},
        "jobs": {n: min(js) for n, js in jobs.items()},
        "total": round(sum(min(ts) for ts in res.values()), 3),
        "job_ms": [ms0, ms1],
    }))


if __name__ == "__main__":
    main()

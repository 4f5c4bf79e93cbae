"""Dump .explain('formatted') for registry queries to plans/<outdir>/.

Usage: python scripts/dump_plans.py <outdir-suffix> [query ...]
Writes plans/r12/<query>_<suffix>.txt for each query (default: HEADLINE).
Multi-tick engine queries execute their ticks while the plan of the FINAL
returned DataFrame is captured — for those the interesting evidence is the
job profile (scripts/profile_query.py), but the final plan still shows the
output-stage shape (exchanges, scans of checkpointed state).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_stream_processor_spark.queries import REGISTRY
from database_stream_processor_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE
        names = HEADLINE
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13"))
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    for name in names:
        df = REGISTRY[name].fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()

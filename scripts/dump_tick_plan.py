"""Capture the .explain('formatted') of the LAST per-tick output delta an
incremental operator hands to its output StateTable — the tick-plan
evidence for job/exchange claims that the final returned DataFrame's plan
cannot show (it only reflects the output stage).

Usage: python scripts/dump_tick_plan.py <outfile> <query> [--sf DIR]
Wraps StateTable.update/replace; writes the plan of the last delta/state
frame (plus an Exchange/scan-occurrence summary) to <outfile>.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_stream_processor_spark.plans import incremental as inc
from database_stream_processor_spark.queries import REGISTRY
from database_stream_processor_spark.session import get_spark


def main() -> None:
    outfile, name = sys.argv[1], sys.argv[2]
    sf = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]

    captured: list[tuple[str, str]] = []
    orig_update = inc.StateTable.update
    orig_replace = inc.StateTable.replace

    def grab(tag, st, z):
        try:
            plan = z.df._sc._jvm.PythonSQLUtils.explainString(
                z.df._jdf.queryExecution(), "formatted")
            captured.append((f"{tag} -> {st.name}", plan))
        except Exception as e:  # keep the run alive; evidence-only tool
            captured.append((f"{tag} -> {st.name}", f"<explain failed: {e}>"))

    def update(self, delta):
        grab("update", self, delta)
        return orig_update(self, delta)

    def replace(self, new_state):
        grab("replace", self, new_state)
        return orig_replace(self, new_state)

    inc.StateTable.update = update
    inc.StateTable.replace = replace

    spark = get_spark(app_name=f"tickplan_{name}")
    REGISTRY[name].fn(spark, sf).count()

    with open(outfile, "w") as fh:
        for tag, plan in captured[-2:]:  # last tick's writes
            nx = len(re.findall(r"\bExchange\b", plan))
            sc = len(re.findall(r"Scan parquet", plan))
            fh.write(f"== {tag}  (Exchange nodes: {nx}, parquet scans: {sc})"
                     f" ==\n{plan}\n")
    print(f"wrote {outfile}: " + "; ".join(
        f"{t}: {len(re.findall(r'Exchange', p))} Exchange, "
        f"{len(re.findall(r'Scan parquet', p))} scans"
        for t, p in captured[-2:]))


if __name__ == "__main__":
    main()

"""Per-job profile of one registry query: runs it once (after a tiny-SF
warm-up) with the Spark event log enabled, then parses the log to print
every job's wall duration and triggering call site — the measurement tool
for job-count/job-latency-bound queries (guide §1: measure first).

Usage: python scripts/profile_query.py <query_name> [--sf DIR] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_stream_processor_spark.queries import REGISTRY
from database_stream_processor_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    sf = "/root/testdata/sf0.1"
    runs = 1
    args = sys.argv[2:]
    for i, a in enumerate(args):
        if a == "--sf":
            sf = args[i + 1]
        if a == "--runs":
            runs = int(args[i + 1])

    log_dir = tempfile.mkdtemp(prefix="dbsp_eventlog_")
    spark = get_spark(app_name=f"profile_{name}", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": log_dir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    fn = REGISTRY[name].fn

    # Attribute every action-triggering DataFrame call to its caller's
    # file:line by stamping the job description just before the action.
    import traceback
    from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    def _caller() -> str:
        # skip the materialization helpers themselves (checkpoint_small,
        # ZSetFrame plumbing) so jobs attribute to the OPERATOR that asked
        # for the materialization, not the shared helper line
        skip = ("tuning.py", "zset.py")
        for fr in reversed(traceback.extract_stack()[:-2]):
            f = fr.filename
            if ("database_stream_processor_spark" in f or
                    f.endswith("queries.py")) and \
                    os.path.basename(f) not in skip:
                return f"{os.path.basename(f)}:{fr.lineno} {fr.name}"
        return "driver"

    def wrap(cls, meth):
        orig = getattr(cls, meth)

        def inner(self, *a, **kw):
            sess = (self.sparkSession if isinstance(self, DataFrame)
                    else self._df.sparkSession)
            sess.sparkContext.setJobDescription(f"{meth} <- {_caller()}")
            try:
                return orig(self, *a, **kw)
            finally:
                sess.sparkContext.setJobDescription("")
        setattr(cls, meth, inner)

    try:  # Spark 4: the concrete class overrides the base methods
        from pyspark.sql.classic.dataframe import DataFrame as _CDF
    except ImportError:
        _CDF = DataFrame
    for m in ("count", "collect", "localCheckpoint", "isEmpty", "toPandas"):
        wrap(_CDF, m)
    for m in ("parquet", "save"):
        wrap(DataFrameWriter, m)

    # warm-up: codegen + parquet footers, never timed
    fn(spark, "/root/testdata/sf0.001").count()

    best = None
    for r in range(runs):
        spark.sparkContext.setJobGroup(f"profile-{r}", "")
        t0 = time.time()
        n = fn(spark, sf).count()
        took = time.time() - t0
        print(f"# run{r}: {took:.3f}s ({n} rows)", file=sys.stderr)
        best = took if best is None else min(best, took)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    path = os.path.join(log_dir, app_id)
    if not os.path.exists(path):
        # Spark 4 rolling layout: eventlog_v2_<appid>/events_*
        d = os.path.join(log_dir, f"eventlog_v2_{app_id}")
        parts = sorted(p for p in os.listdir(d) if p.startswith("events"))
        lines = []
        for p in parts:
            with open(os.path.join(d, p)) as fh:
                lines.extend(fh)
    else:
        with open(path) as fh:
            lines = list(fh)
    jobs = {}
    if True:
        for line in lines:
            ev = json.loads(line)
            if ev.get("Event") == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                grp = props.get("spark.jobGroup.id", "")
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "grp": grp,
                    "site": (props.get("spark.job.description")
                             or props.get("callSite.short") or "?"),
                    "stages": len(ev.get("Stage IDs", [])),
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j:
                    j["end"] = ev["Completion Time"]

    per_run: dict[str, list] = {}
    for jid, j in sorted(jobs.items()):
        if not j["grp"].startswith("profile-"):
            continue
        per_run.setdefault(j["grp"], []).append((jid, j))
    for grp, items in sorted(per_run.items()):
        total = sum(j["end"] - j["start"] for _, j in items if "end" in j)
        print(f"\n== {grp}: {len(items)} jobs, sum job wall {total/1000:.3f}s "
              f"(best query wall {best:.3f}s)")
        from collections import Counter
        by_site = Counter()
        dur_site = Counter()
        for jid, j in items:
            d = (j.get("end", j["start"]) - j["start"])
            by_site[j["site"]] += 1
            dur_site[j["site"]] += d
            print(f"  job {jid:>4}  {d/1000:7.3f}s  stages={j['stages']:>2}  "
                  f"{j['site']}")
        print("  -- by call site --")
        for site, cnt in dur_site.most_common():
            print(f"  {cnt/1000:7.3f}s  x{by_site[site]:<3} {site}")


if __name__ == "__main__":
    main()

"""Size-adaptive execution tuning for incremental tick loops.

Every incremental operator materializes per-tick state with
``localCheckpoint``.  Under AQE each materialization of a plan with k
exchanges is scheduled as k+1 Spark jobs (the driver re-plans between
stages), so a tick over a small delta pays per-job scheduling latency
several times for work that is a single small shuffle.  The r9 round
established the fix for fixpoint loops (`_loop_shuffle_partitions` in
operators/recursive.py: size shuffles to the round's working set and gate
AQE on it); this module generalizes it to any materialization point using
Catalyst's own plan statistics, so it needs **no extra job** to decide.

Scale behaviour: the gate reads ``sizeInBytes`` of the optimized plan.
Unknown statistics report ``Long.MAX`` (e.g. fresh in-memory relations),
and anything at or above :data:`SMALL_PLAN_BYTES` keeps today's behaviour
(AQE on, configured shuffle width) — so at 100 TB nothing changes; only
provably-small ticks drop to exact small shuffles with AQE off.  The
threshold is env-tunable (``SPARK_GRAFT_SMALL_TICK_BYTES``), default 64 MB
— below AQE's own 256 MB advisory partition size, a shuffle this small
coalesces to 1-2 partitions anyway; we just skip the per-exchange
re-planning jobs that discover it.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame

#: plans estimated below this are "small ticks": AQE off, exact partitions
SMALL_PLAN_BYTES = int(os.environ.get("SPARK_GRAFT_SMALL_TICK_BYTES",
                                      str(64 * 2 ** 20)))

import re as _re

#: RDDInfo.toString: RDD "name" (id) StorageLevel: ...; CachedPartitions:
#: n; TotalPartitions: n; MemorySize: 1.5 KiB; DiskSize: 0.0 B
_RDD_INFO_RE = _re.compile(
    r"\((\d+)\) StorageLevel: [^;]*; CachedPartitions: \d+; "
    r"TotalPartitions: \d+; MemorySize: ([\d.]+) ([KMGTPE]iB|B); "
    r"DiskSize: ([\d.]+) ([KMGTPE]iB|B)")
_UNITS = {"B": 1, "KiB": 2 ** 10, "MiB": 2 ** 20, "GiB": 2 ** 30,
          "TiB": 2 ** 40, "PiB": 2 ** 50, "EiB": 2 ** 60}
#: bytes per shuffle partition for small ticks (≤ 4 partitions at 64 MB)
_PARTITION_BYTES = 16 * 2 ** 20
_UNKNOWN = 1 << 62

#: RDD ids of registered provably-empty seed frames (state-table seeds):
#: RDD-backed empty plans are never cached, so without the registry every
#: gate probe seeing one through a state union would saturate to UNKNOWN
_EMPTY_SEED_IDS: set[int] = set()


def register_empty_seed(df: DataFrame) -> None:
    """Record ``df``'s leaf RDD ids as known-empty for :func:`leaf_bytes`.
    The caller guarantees the frame holds no rows (a state-table seed)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        leaves = plan.collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                _EMPTY_SEED_IDS.add(leaf.rdd().id())
    except Exception:
        pass


def plan_size_bytes(*dfs: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for the union of ``dfs`` — a pure
    driver-side read of the optimized plan's statistics (no job).
    ``localCheckpoint`` propagates the origin plan's stats, so checkpointed
    state frames keep real sizes; unknown stats saturate to huge."""
    total = 0
    for df in dfs:
        try:
            s = int(df._jdf.queryExecution().optimizedPlan()
                    .stats().sizeInBytes())
        except Exception:
            return _UNKNOWN
        if s >= _UNKNOWN:
            return _UNKNOWN
        total += s
    return total


def leaf_bytes(df: DataFrame) -> int:
    """Sum of the plan's LEAF relation sizes — the honest upper-bound proxy
    for a tick's working set (every row a tick touches enters through a
    leaf).  Catalyst's own plan-level ``sizeInBytes`` multiplies through
    joins (a 25-row state estimated at terabytes two ticks in), so it
    cannot gate ticks; leaves can:

    - file relations report true file bytes;
    - ``localCheckpoint``-ed state resolves to its ACTUAL materialized
      bytes from the block manager (RDD storage info — driver metadata,
      no job);
    - anything unresolvable saturates to unknown (treated as huge, i.e.
      today's behaviour — the gate can only mis-fire towards "big").
    """
    try:
        sc = df.sparkSession.sparkContext
        # ONE py4j round trip for the whole storage listing: the naive
        # per-info accessor loop costs 3 py4j calls per stored RDD per
        # invocation, which grows linearly with session age (hundreds of
        # checkpointed states late in a long session made every gate
        # probe cost ~seconds of driver time).  RDDInfo.toString carries
        # id + MemorySize + DiskSize; parse those.  bytesToString rounds
        # to 1 decimal — irrelevant against a 64 MB threshold.  Any
        # format surprise falls through to the UNKNOWN (= big) path for
        # the affected leaf.
        listing = sc._jvm.scala.runtime.ScalaRunTime.stringOf(
            sc._jsc.sc().getRDDStorageInfo())
        stored = {}
        for m in _RDD_INFO_RE.finditer(listing):
            rid, mem, mu, dsk, du = m.groups()
            stored[int(rid)] = int(float(mem) * _UNITS[mu]
                                   + float(dsk) * _UNITS[du])
        plan = df._jdf.queryExecution().optimizedPlan()
        leaves = plan.collectLeaves()
        total = 0
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            kind = leaf.getClass().getSimpleName()
            if kind == "LogicalRDD":
                rdd = leaf.rdd()
                if rdd.id() in stored:
                    total += stored[rdd.id()]
                elif (rdd.id() in _EMPTY_SEED_IDS
                      or len(rdd.partitions()) == 0):
                    pass  # registered state seed / empty in-memory relation
                else:
                    return _UNKNOWN
                continue
            s = int(leaf.stats().sizeInBytes())
            if s >= _UNKNOWN:
                # empty in-memory relations report "unknown"; they hold
                # nothing, so they cannot make a tick big
                if kind == "LocalRelation" and leaf.data().isEmpty():
                    continue
                return _UNKNOWN
            total += s
        return total
    except Exception:
        return _UNKNOWN


@contextmanager
def small_tick_conf(spark, size_bytes: int, aqe_off: bool = False,
                    resize: bool = True):
    """When ``size_bytes`` is provably small, run the enclosed
    materializations with shuffle partitions sized to the data
    (``resize``) and/or AQE disabled (``aqe_off``); otherwise a no-op.
    Restores the conf on exit.

    The two knobs are deliberately independent: the r12 regression hunt
    established the empirical matrix on the long verbatim-TPC-H tick
    runs (q118/q119, 1 GiB plain-session driver heap) — gate-off PASS,
    resize-only PASS, AQE-off-only PASS, BOTH TOGETHER FAIL (a
    small-gated materialization under AQE-off + 1-partition shuffles
    pushed a later broadcast build over the heap).  So callers pick one:

    - ``resize=True`` (default, AQE on): exact small shuffle widths, AQE
      keeps its per-exchange re-planning jobs;
    - ``aqe_off=True, resize=False``: one statically-planned job per
      eager materialization (and ZERO scheduled jobs for a lazy one —
      the stages fuse into the first consumer's job), shuffle width
      untouched — the state-tick conf;
    - ``aqe_off=True, resize=True``: the r9 fixpoint-loop conf; reserve
      it for bounded loop bodies whose WHOLE working set the gate has
      measured (the transitive-closure and connected-components loops
      that ran three rounds green under exactly this conf) — never
      combine the two for long many-tick engine runs (the q118/q119
      failure mode above)."""
    if size_bytes >= SMALL_PLAN_BYTES:
        yield False
        return
    conf = spark.conf
    old_parts = conf.get("spark.sql.shuffle.partitions")
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    if resize:
        cap = int(old_parts) if old_parts.isdigit() else 2 ** 30
        want = max(1, min(cap, size_bytes // _PARTITION_BYTES + 1))
        conf.set("spark.sql.shuffle.partitions", str(want))
    if aqe_off:
        conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield True
    finally:
        if resize:
            conf.set("spark.sql.shuffle.partitions", old_parts)
        if aqe_off:
            conf.set("spark.sql.adaptive.enabled", old_aqe)


def checkpoint_small(df: DataFrame, eager: bool = True,
                     aqe_off: bool = False) -> DataFrame:
    """Drop-in for ``df.localCheckpoint(eager)`` that sizes the shuffles
    feeding the materialization when the plan is provably small.

    ``aqe_off=True`` switches the small-tick conf from partition resize
    to static planning (see :func:`small_tick_conf`): an eager
    materialization of a k-exchange plan schedules ONE job instead of
    k+1, and a lazy one schedules NOTHING at call time — with AQE on,
    ``toRdd`` eagerly submits every exchange's stage job even for a lazy
    checkpoint, which is where tick loops' job counts came from.

    The result's columns are re-aliased so the checkpointed frame carries
    FRESH attribute ids: a state snapshot otherwise keeps the ids of the
    source relations it was built from, and a later join of that state
    against a new delta over the same base relation hits Spark's
    "conflicting references" resolver error (column names must be unique,
    which holds for every state table in this engine)."""
    with small_tick_conf(df.sparkSession, leaf_bytes(df),
                         aqe_off=aqe_off, resize=not aqe_off) as fired:
        # when the small gate fires under static planning, materialize
        # EAGERLY even if the caller asked for lazy: the whole plan runs
        # as one job anyway, and a pending (never-computed) lazy piece
        # has no storage entry, so every LATER gate probe that sees it
        # through a state union saturates to UNKNOWN and turns the conf
        # off for the rest of the run (measured on q37: the cascade kept
        # the per-tick job count at the AQE-on level)
        if aqe_off and fired:
            out = df.localCheckpoint(eager=True)
        else:
            out = df.localCheckpoint(eager=eager)
    from pyspark.sql import functions as F
    return out.select(*[F.col(c).alias(c) for c in out.columns])

"""SQL front door — the reference's pipeline-manager surface on Spark.

The reference's production path (SURVEY.md §3.2) accepts a SQL script of
``CREATE TABLE`` (input connectors) + ``CREATE VIEW`` (maintained queries)
statements, compiles it with Calcite, and runs the resulting circuit
incrementally (crates/pipeline_manager/src/compiler.rs:333-338; demo scripts
demo/project_demo0*/project.sql).  Here Catalyst *is* the compiler: tables
become registered temp views backed by Z-set state, views become Spark SQL
plans re-evaluated over current snapshots, and per-step output deltas come
from snapshot differencing (plans/incremental.DifferentiateOp).

Two maintenance strategies per view:

- ``differentiate`` (default, works for ANY SQL the parser accepts): run the
  view over the new table snapshots and emit new − old.  Cost ∝ full
  recompute per step — Catalyst prunes/pushes down, but this is the generic
  fallback, the analog of the reference's non-incremental ``stream_*``
  operators (SURVEY §2 "Incremental?" column).
- hand-built circuits from :mod:`plans.incremental` for O(delta) maintenance
  of the structured operator inventory — the two compose: use the SQL door
  for breadth, the operator layer for the hot incremental paths.

Dialect shims applied to the script before Spark parses it (the reference's
demo SQL runs verbatim): FLOAT64→DOUBLE, ``EXTRACT(EPOCH FROM x)``→
``unix_timestamp(x)``, ``EXTRACT(ISODOW FROM x)``→
``extract(DAYOFWEEK_ISO FROM x)``; ST_POINT/ST_DISTANCE/SPLIT_INDEX are
installed as SQL scalar functions (functions/scalar.py) — all pure
expressions, inlined by Catalyst.
"""

from __future__ import annotations

import logging
import re
from collections.abc import Mapping
from contextlib import contextmanager as _contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)
from pyspark.sql import types as T

from database_stream_processor_spark.functions.scalar import register_sql_macros
from database_stream_processor_spark.plans.incremental import (
    AggregateOp,
    StateTable,
)
from database_stream_processor_spark.zset import ZSetFrame

_TYPE_MAP = {
    r"FLOAT64": "DOUBLE",
    r"DOUBLE\s+PRECISION": "DOUBLE",
    r"NUMERIC": "DECIMAL(38,9)",
    r"TEXT": "STRING",
    r"VARCHAR\s*\(\s*\d+\s*\)": "STRING",
    r"VARCHAR": "STRING",
}


def _rewrite_dialect(sql: str) -> str:
    """Reference-dialect → Spark-dialect text rewrites."""
    out = sql
    for src, dst in _TYPE_MAP.items():
        out = re.sub(rf"\b{src}\b", dst, out, flags=re.IGNORECASE)
    out = re.sub(r"EXTRACT\s*\(\s*EPOCH\s+FROM\s+([^)]+)\)",
                 r"unix_timestamp(\1)", out, flags=re.IGNORECASE)
    out = re.sub(r"EXTRACT\s*\(\s*ISODOW\s+FROM\s+([^)]+)\)",
                 r"extract(DAYOFWEEK_ISO FROM \1)", out, flags=re.IGNORECASE)
    return out


def _split_statements(script: str) -> list[str]:
    """Split a SQL script on ``;`` outside string literals; strip ``--``
    comments (the demo scripts use both).  Comment stripping is
    literal-aware: a ``--`` INSIDE a string literal is content, and
    blindly erasing to end-of-line would silently corrupt the value
    (ADVICE r8 #2) — the single pass below tracks quoting while it
    strips and splits."""
    stmts, buf, in_str = [], [], False
    i, n = 0, len(script)
    while i < n:
        ch = script[i]
        if ch == "'":
            in_str = not in_str
        elif not in_str and ch == "-" and script[i:i + 2] == "--":
            j = script.find("\n", i)
            i = n if j < 0 else j
            continue
        if ch == ";" and not in_str:
            stmts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    stmts.append("".join(buf))
    return [s.strip() for s in stmts if s.strip()]


_CREATE_TABLE = re.compile(r"^CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*$",
                           re.IGNORECASE | re.DOTALL)
_CREATE_VIEW = re.compile(r"^CREATE\s+VIEW\s+(\w+)\s+AS\s+(.*)$",
                          re.IGNORECASE | re.DOTALL)

# ------------------------------------------------------------------ #
# view-shape recognizers for incremental lowering (SURVEY §3.2: lower
# simple views onto the operator layer instead of snapshot-diffing)
# ------------------------------------------------------------------ #

_BLOCKERS = re.compile(
    r"\b(GROUP\s+BY|DISTINCT|UNION|INTERSECT|EXCEPT|OVER|HAVING|ORDER\s+BY"
    r"|LIMIT|LEFT|RIGHT|FULL|OUTER|CROSS)\b|\(\s*SELECT", re.IGNORECASE)

_AGG_BLOCKERS = re.compile(
    r"\b(DISTINCT|UNION|INTERSECT|EXCEPT|OVER|ORDER\s+BY|LIMIT|JOIN"
    r"|LEFT|RIGHT|FULL|OUTER|CROSS)\b|\(\s*SELECT", re.IGNORECASE)

_JOIN_AGG_BLOCKERS = re.compile(
    r"\b(DISTINCT|UNION|INTERSECT|EXCEPT|OVER|ORDER\s+BY|LIMIT"
    r"|LEFT|RIGHT|FULL|OUTER|CROSS)\b|\(\s*SELECT", re.IGNORECASE)

_PROJECT_RE = re.compile(
    r"^SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<tbl>\w+)(?:\s+(?:AS\s+)?"
    r"(?P<alias>\w+))?(?:\s+WHERE\s+(?P<pred>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL)

_JOIN_RE = re.compile(
    r"^SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<lt>\w+)(?:\s+(?:AS\s+)?"
    r"(?P<la>\w+))?\s+JOIN\s+(?P<rt>\w+)(?:\s+(?:AS\s+)?(?P<ra>\w+))?"
    r"\s+ON\s+(?P<cond>.+?)(?:\s+WHERE\s+(?P<pred>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL)

_AGG_RE = re.compile(
    r"^SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<tbl>\w+)"
    r"(?:\s+WHERE\s+(?P<pred>.+?))?\s+GROUP\s+BY\s+(?P<keys>[\w\s,.]+?)"
    r"(?:\s+HAVING\s+(?P<having>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL)

# SELECT keys, SUM/COUNT FROM a JOIN b ON cond [WHERE p] GROUP BY keys —
# the reference demo02 fraud-feature shape
# (demo/project_demo02-FraudDetection/project.sql:29-57 modulo windows):
# compiles to the bilinear join delta feeding a linear aggregate merge.
_JOIN_AGG_RE = re.compile(
    r"^SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<lt>\w+)(?:\s+(?:AS\s+)?"
    r"(?P<la>\w+))?\s+JOIN\s+(?P<rt>\w+)(?:\s+(?:AS\s+)?(?P<ra>\w+))?"
    r"\s+ON\s+(?P<cond>.+?)(?:\s+WHERE\s+(?P<pred>.+?))?"
    r"\s+GROUP\s+BY\s+(?P<keys>[\w\s,.]+?)"
    r"(?:\s+HAVING\s+(?P<having>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL)

#: an aggregate argument: any chars with ≤2 levels of nested parens
#: (SUM(CAST(FLOOR(x * 100) AS BIGINT)) — enough for cast/round/floor
#: function stacks; deeper nesting keeps the snapshot-diff fallback)
_NEST2 = r"(?:[^()]|\((?:[^()]|\([^()]*\))*\))+"

_AGG_ITEM = re.compile(
    r"^(?:(?P<key>\w+(?:\.\w+)?)(?:\s+AS\s+(?P<kal>\w+))?"
    rf"|SUM\s*\((?P<sum>{_NEST2})\)\s+AS\s+(?P<sname>\w+)"
    r"|COUNT\s*\(\s*\*\s*\)\s+AS\s+(?P<cname>\w+)"
    rf"|AVG\s*\((?P<avg>{_NEST2})\)\s+AS\s+(?P<aname>\w+))$", re.IGNORECASE)


def _analyzed_has_aggregate(eng: "Engine", sql: str) -> bool:
    """True if Catalyst's analyzed plan for ``sql`` contains an Aggregate
    node anywhere (including inside referenced views).  Gates the linear
    project/join maintainers: a GROUP-BY-less aggregate (``SELECT COUNT(*)
    FROM t``) is NOT linear — evaluating it per-delta would emit per-tick
    counts instead of maintaining the total.  (Such views themselves now
    lower via :class:`_GlobalAggMaintainer`; this gate just keeps them
    out of the per-delta-evaluating maintainers.)"""
    plan = eng.spark.sql(sql)._jdf.queryExecution().analyzed().toString()
    return bool(re.search(r"\bAggregate \[", plan))


def _parse_columns(body: str) -> T.StructType:
    """Parse a CREATE TABLE column list (name TYPE [NOT NULL], ...)."""
    cols, depth, buf = [], 0, []
    for ch in body:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            cols.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    cols.append("".join(buf))
    fields = []
    for c in cols:
        c = " ".join(c.split())
        if not c:
            continue
        not_null = bool(re.search(r"\bNOT\s+NULL\b", c, re.IGNORECASE))
        c = re.sub(r"\bNOT\s+NULL\b|\bPRIMARY\s+KEY\b", "", c,
                   flags=re.IGNORECASE).strip()
        name, _, typ = c.partition(" ")
        spark_type = T._parse_datatype_string(typ.strip())
        fields.append(T.StructField(name, spark_type, nullable=not not_null))
    return T.StructType(fields)


def _source_rows0(eng: "Engine", name: str) -> DataFrame:
    """Empty rows frame (schema probe) for a maintainer input — a base
    table or an upstream maintained view.  Probes are analysis-only, so
    they read the table's lazy ``peek`` and never force a deferred state
    fold (read-tracking materialization, StateTable.defer_update)."""
    if name in eng.tables:
        return eng.tables[name].peek().rows().limit(0)
    return eng._maintainers[name].state.current.rows().limit(0)


def _current_rows(eng: "Engine", name: str) -> DataFrame:
    """Current (post-update-this-tick) rows of a base table or an
    upstream maintained view — maintainers step in dependency order, so
    an upstream view's state is already new when a downstream maintainer
    reads it.  For a table this is a REAL integral read: accessing
    ``current`` folds (materializes) any deferred deltas first."""
    if name in eng.tables:
        return eng.tables[name].current.rows()
    return eng._maintainers[name].state.current.rows()


class _OldSnapshots(Mapping):
    """Pre-tick state snapshots served lazily (read-tracking
    materialization, §5): a table folds its queued deltas only when a
    maintainer actually reads its snapshot, and a table whose fold
    already advanced past the captured mark (because its POST-tick state
    was read first by an earlier maintainer) serves the lazy plan
    captured at tick start instead — same rows, plan-only, still valid
    because it references the immutable pre-fold checkpoint and delta
    plans.  View entries are plain values (views never defer)."""

    def __init__(self, eng: "Engine"):
        self._tables = {n: (t, t._seq + len(t._deferred), t.peek())
                        for n, t in eng.tables.items()}
        self._views = {n: m.state.current
                       for n, m in eng._maintainers.items()}

    def __getitem__(self, name):
        if name in self._views:
            return self._views[name]
        t, mark, plan = self._tables[name]
        if t.path is not None:
            # parquet backend updates EAGERLY inside step(), outside the
            # defer/fold bookkeeping — t._current is already post-tick by
            # the time a maintainer reads the snapshot.  The captured
            # value is the pre-tick frame (ZSetFrames are immutable;
            # update() rebinds _current to a new object).
            return plan
        if t._seq > mark:
            return plan
        t._fold(mark - t._seq)
        return t._current

    def __iter__(self):
        yield from self._tables
        yield from self._views

    def __len__(self):
        return len(self._tables) + len(self._views)


def _split_parts(z: ZSetFrame) -> tuple[DataFrame, DataFrame]:
    """(positive rows expanded, |negative| rows expanded) — lets plain SQL
    evaluate weight-carrying deltas: run the view SQL on each part, emit
    the results at weight +1 / −1.

    Insert-only fast path (§2.4 — don't compute what you throw away):
    a delta whose rows are provably all weight +1 (``ZSetFrame.w_one``,
    the plain Engine.push case) needs no consolidate — the raw rows ARE
    the bag — and its negative part is STATICALLY empty, so Catalyst's
    PropagateEmptyRelation folds the entire retraction leg of every
    maintainer out of the tick plan."""
    if z.w_one:
        data = z.df.select(*z.data_columns)
        return data, data.limit(0)
    c = z.consolidate()
    return c.rows(), c.neg().rows()


class _ViewMaintainer:
    """Base: generic snapshot-diff fallback (any SQL Catalyst accepts);
    per-step cost ∝ full recompute.  Subclasses lower recognized shapes
    onto delta plans with per-step cost ∝ Δ — the Spark analog of handing
    the view to the incremental operator layer."""

    kind = "differentiate"

    #: True when step() may evaluate SQL that resolves source tables
    #: through their CANONICAL temp views (the snapshot-diff fallback
    #: re-runs the whole view SQL).  The engine force-folds such a
    #: maintainer's deferred source tables before stepping it, so the
    #: fallback keeps reading materialized state.  Vetted delta-only
    #: subclasses that bind every source table explicitly in eval_on
    #: (or read integrals via _current_rows/old[...], which fold on
    #: their own) override this to False — their source tables can stay
    #: deferred.  Safe default: an unvetted subclass behaves exactly as
    #: before this optimization (one fold per delta'd table per tick).
    sql_reads_sources = True

    def __init__(self, eng: "Engine", name: str, sql: str):
        self.name = name
        self.sql = sql
        # schema-only empty (LocalRelation), NOT snapshot.limit(0): the
        # empty state must not carry the view's SQL plan — downstream
        # views analyze against this binding, and a dormant Aggregate
        # node would wrongly block their linear lowering
        snapshot = eng.spark.sql(sql)
        empty = eng.spark.createDataFrame([], snapshot.schema)
        self.state = StateTable(ZSetFrame.from_df(empty),
                                name=f"view_{name}")

    def step(self, eng: "Engine", combined: Mapping[str, ZSetFrame],
             old: Mapping[str, ZSetFrame]) -> ZSetFrame:
        snapshot = ZSetFrame.from_df(eng.spark.sql(self.sql)).consolidate()
        delta = snapshot.minus(self.state.current).consolidate()
        self.state._current = self.state._materialize(snapshot)
        return delta

    def _empty(self) -> ZSetFrame:
        return ZSetFrame(self.state.current.df.limit(0))

    def apply_delta(self, delta: ZSetFrame) -> None:
        self.state.update(delta)


class _ProjectMaintainer(_ViewMaintainer):
    """SELECT <exprs> FROM t [WHERE p] — linear (filter_map.rs:1): the
    view SQL runs over the *delta only*; the table integral is never
    rescanned."""

    kind = "project"
    sql_reads_sources = False

    def __init__(self, eng, name, sql, table):
        super().__init__(eng, name, sql)
        self.table = table

    def step(self, eng, combined, old):
        z = combined.get(self.table)
        if z is None:
            return self._empty()
        pos, neg = _split_parts(z)
        out = ZSetFrame.from_df(eng.eval_on(self.sql, {self.table: pos}), 1)
        out = out.plus(ZSetFrame.from_df(
            eng.eval_on(self.sql, {self.table: neg}), -1))
        delta = out.consolidate()
        self.apply_delta(delta)
        return delta


class _JoinMaintainer(_ViewMaintainer):
    """SELECT … FROM a JOIN b ON cond [WHERE p] — bilinear
    (join.rs:226-264): Δ = ΔA⋈B_new + A_old⋈ΔB.  Each leg evaluates the
    original SQL with one side rebound to the delta, so only delta-driven
    work runs; a tick that changes neither table does nothing."""

    kind = "join"
    sql_reads_sources = False

    def __init__(self, eng, name, sql, left, right):
        super().__init__(eng, name, sql)
        self.left, self.right = left, right

    def step(self, eng, combined, old):
        da, db = combined.get(self.left), combined.get(self.right)
        if da is None and db is None:
            return self._empty()
        parts = []
        if da is not None:
            b_new = _current_rows(eng, self.right)
            pos, neg = _split_parts(da)
            parts.append(ZSetFrame.from_df(
                eng.eval_on(self.sql, {self.left: pos,
                                       self.right: b_new}), 1))
            parts.append(ZSetFrame.from_df(
                eng.eval_on(self.sql, {self.left: neg,
                                       self.right: b_new}), -1))
        if db is not None:
            a_old = old[self.left].rows()
            pos, neg = _split_parts(db)
            parts.append(ZSetFrame.from_df(
                eng.eval_on(self.sql, {self.left: a_old,
                                       self.right: pos}), 1))
            parts.append(ZSetFrame.from_df(
                eng.eval_on(self.sql, {self.left: a_old,
                                       self.right: neg}), -1))
        delta = ZSetFrame.sum(parts).consolidate()
        self.apply_delta(delta)
        return delta


_TBL_ALIAS_RE = re.compile(r"^(\w+)(?:\s+(?:AS\s+)?(\w+))?$", re.IGNORECASE)


def _parse_join_chain(flat: str) -> tuple[str, list[str]] | None:
    """Parse ``SELECT … FROM t1 [a1] JOIN t2 [a2] ON c2 JOIN t3 [a3] ON
    c3 … [WHERE p]`` → (select list, [table names]); None if the FROM
    clause isn't a pure INNER-JOIN chain of ≥3 distinct named tables."""
    m = re.match(r"^SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<rest>.+)$", flat,
                 re.IGNORECASE | re.DOTALL)
    if not m:
        return None
    rest = m.group("rest")
    pred_m = re.search(r"\s+WHERE\s+", rest, re.IGNORECASE)
    if pred_m:
        rest = rest[:pred_m.start()]
    tables = _parse_from_chain(rest)
    return (m.group("sel"), tables) if tables else None


class _MultiJoinMaintainer(_ViewMaintainer):
    """SELECT … FROM t1 JOIN t2 ON … JOIN t3 ON … [WHERE p] — the N-way
    multilinear delta rule (join.rs:226-264 applied pairwise over the
    chain): Δout = Σ_i  T1_old ⋈ … ⋈ ΔT_i ⋈ … ⋈ TN_new.  Each leg
    evaluates the original SQL with table i rebound to its delta, tables
    before it to their pre-tick snapshots, and tables after it to their
    post-tick snapshots — the standard telescoping expansion whose legs
    sum exactly to new−old.  Only tables with a delta contribute a leg,
    and each leg's plan has a delta-sized side for Catalyst to broadcast;
    a TPC-H-style star view (orders⋈customer⋈nation) costs per tick
    ∝ Δ⋈dims, never a full re-join."""

    kind = "multi_join"
    sql_reads_sources = False

    def __init__(self, eng, name, sql, tables):
        super().__init__(eng, name, sql)
        self.tables = tables

    def step(self, eng, combined, old):
        deltas = {t: combined.get(t) for t in self.tables}
        if all(z is None for z in deltas.values()):
            return self._empty()
        parts = []
        for i, t in enumerate(self.tables):
            z = deltas[t]
            if z is None:
                continue
            bind = {}
            for j, u in enumerate(self.tables):
                if j < i:
                    bind[u] = old[u].rows()
                elif j > i:
                    bind[u] = _current_rows(eng, u)
            pos, neg = _split_parts(z)
            parts.append(ZSetFrame.from_df(
                eng.eval_on(self.sql, {**bind, t: pos}), 1))
            parts.append(ZSetFrame.from_df(
                eng.eval_on(self.sql, {**bind, t: neg}), -1))
        delta = ZSetFrame.sum(parts).consolidate()
        self.apply_delta(delta)
        return delta


#: one OVER item of the rolling-window view shape:
#: AGG(arg) OVER (PARTITION BY pk ORDER BY o RANGE BETWEEN lo AND hi) AS n
#: a frame bound: integer seconds or a fixed-width INTERVAL literal
_BOUND = r"(?:\d+|INTERVAL\s+'?\d+'?\s+\w+)"

_WIN_ITEM = re.compile(
    rf"^(?P<fn>SUM|COUNT|AVG|MIN|MAX)\s*\(\s*(?P<arg>\*|{_NEST2})\s*\)\s+"
    r"OVER\s*\(\s*(?:PARTITION\s+BY\s+(?P<pk>.+?)\s+)?ORDER\s+BY\s+"
    r"(?P<ord>.+?)\s+RANGE\s+BETWEEN\s+"
    rf"(?P<lo>{_BOUND}\s+PRECEDING|CURRENT\s+ROW)\s+AND\s+"
    rf"(?P<hi>{_BOUND}\s+(?:PRECEDING|FOLLOWING)|CURRENT\s+ROW)\s*\)\s+"
    r"AS\s+(?P<name>\w+)$",
    re.IGNORECASE | re.DOTALL)

_NUMERIC_TS_TYPES = {"tinyint", "smallint", "int", "bigint"}

#: fixed-width interval units → seconds (month/year are calendar-
#: dependent and cannot map to an epoch-seconds frame — unlowerable)
_INTERVAL_SECONDS = {"second": 1, "seconds": 1, "minute": 60,
                     "minutes": 60, "hour": 3600, "hours": 3600,
                     "day": 86400, "days": 86400,
                     "week": 604800, "weeks": 604800}


def _bound_seconds(txt: str) -> int:
    """'604800' | "INTERVAL '7' DAY" → seconds (fixed-width units only)."""
    m = re.match(r"^INTERVAL\s+'?(\d+)'?\s+(\w+)$", txt.strip(),
                 re.IGNORECASE)
    if m:
        unit = m.group(2).lower()
        if unit not in _INTERVAL_SECONDS:
            raise _UnloweredShape(f"calendar interval unit {unit}")
        return int(m.group(1)) * _INTERVAL_SECONDS[unit]
    return int(txt.split()[0])


class _RollingWindowMaintainer(_ViewMaintainer):
    """``SELECT …, AGG(e) OVER (PARTITION BY pk ORDER BY ts RANGE
    BETWEEN b PRECEDING AND a PRECEDING|FOLLOWING|CURRENT ROW) AS n, …
    FROM t [WHERE p]`` — the reference's flagship feature-engineering
    shape (demo/project_demo02-FraudDetection/project.sql:36-53: AVG/
    COUNT over 1-day/1-week/1-month RANGE frames), maintained in O(Δ)
    by :class:`PartitionedRollingAggregateLinearOp`
    (rolling_aggregate.rs:367 ``partitioned_rolling_aggregate_linear``)
    instead of snapshot-diffing the whole view per tick.

    OVER items sharing one (PARTITION BY, ORDER BY) spec share one op;
    a view mixing SEVERAL specs (demo03's pickup- and dropoff-keyed
    frames side by side) CHAINS one op per spec — each op treats the
    previous op's output rows (source cols + its partials) as opaque
    input, and the Z-set algebra makes the cascade exact: an upstream
    adjustment retracts/re-emits a row whose contributions to the
    downstream spec cancel, leaving only the genuinely fresh work.
    Frames may differ per item within a spec.  SUM/COUNT/AVG decompose
    into linear partials (Σe·w, Σw·[e IS NOT NULL]); the final
    projection re-assembles SQL semantics (empty-frame SUM/AVG = NULL,
    COUNT = 0) and runs the remaining select items unchanged, so scalar
    expressions (ST_DISTANCE …) ride along.  ``*`` in the select list
    expands to the source's columns."""

    kind = "rolling"

    def __init__(self, eng, name, sql, m):
        from database_stream_processor_spark.plans.incremental import (
            PartitionedRollingAggregateLinearOp)
        from database_stream_processor_spark.zset import WEIGHT_COL
        tbl = m.group("tbl").lower()
        if tbl not in eng.tables and tbl not in eng._maintainers:
            raise _UnloweredShape(tbl)
        self.table = tbl
        self.pred = m.group("pred")
        probe = _source_rows0(eng, tbl)
        # ---- parse the select list ------------------------------------
        parsed: list[tuple[str, object]] = []   # ("plain", txt)|("win", m)
        specs: dict[tuple[str, str], int] = {}  # (pk, ord) -> spec index
        aggs: list[dict] = []                   # per spec (linear partials)
        frames: list[dict] = []
        # non-linear (MIN/MAX) items: one general op per (spec, frame)
        nl: dict[tuple[int, int, int], dict] = {}
        self._wins: dict[str, tuple[str, str]] = {}   # name -> (fn, arg)
        for it in (s.strip() for s in _split_top_level(m.group("sel"))):
            if it == "*":
                parsed.extend(("plain", c) for c in probe.columns)
                continue
            wm = _WIN_ITEM.match(it)
            if wm is None:
                if re.search(r"\bOVER\b", it, re.IGNORECASE):
                    raise _UnloweredShape(f"unsupported window item: {it}")
                parsed.append(("plain", it))
                continue
            # global window (no PARTITION BY) = one constant partition;
            # the reference JIT lists OrderBy/Windows as its own TODO
            # (dataflow-jit/src/ir/nodes/mod.rs:62), so this EXCEEDS it —
            # a global running total is the most common window users
            # write.  At scale the single logical partition is inherent
            # to the query; the op's delta×frame range join still bounds
            # per-tick work to O(Δ × frame density).
            pk_t = (" ".join(wm.group("pk").split()).lower()
                    if wm.group("pk") else "")
            o_t = " ".join(wm.group("ord").split()).lower()
            si = specs.setdefault((pk_t, o_t), len(specs))
            if si == len(aggs):
                aggs.append({})
                frames.append({})
            lo, hi = wm.group("lo").lower(), wm.group("hi").lower()
            before = (0 if "current" in lo else _bound_seconds(
                re.sub(r"\s+preceding$", "", lo)))
            after = (0 if "current" in hi else
                     _bound_seconds(re.sub(r"\s+(preceding|following)$",
                                           "", hi))
                     * (-1 if "preceding" in hi else 1))
            if after < -before:
                raise _UnloweredShape("empty RANGE frame")
            fn = wm.group("fn").upper()
            arg, out = wm.group("arg").strip(), wm.group("name")
            if fn != "COUNT" and arg == "*":
                raise _UnloweredShape(it)
            nn_int = f"CAST(({arg}) IS NOT NULL AS INT)"
            if fn == "COUNT":
                aggs[si][f"__n_{out}"] = (F.lit(1) if arg == "*"
                                          else F.expr(nn_int))
                frames[si][f"__n_{out}"] = (before, after)
            elif fn in ("MIN", "MAX"):
                # non-linear: touched-slice recompute via the general op
                # (rolling_aggregate.rs:235 vs the :367 linear variant)
                nl.setdefault((si, before, after), {})[out] = (
                    F.min(F.expr(arg)) if fn == "MIN"
                    else F.max(F.expr(arg)))
            else:                      # SUM / AVG: value + count partials
                aggs[si][f"__s_{out}"] = F.expr(arg)
                aggs[si][f"__n_{out}"] = F.expr(nn_int)
                frames[si][f"__s_{out}"] = (before, after)
                frames[si][f"__n_{out}"] = (before, after)
            self._wins[out] = (fn, arg)
            parsed.append(("win", out))
        if not self._wins:
            raise _UnloweredShape("no RANGE window items")
        self._specs = [pk_ord for pk_ord, _ in
                       sorted(specs.items(), key=lambda kv: kv[1])]

        super().__init__(eng, name, sql)   # view state via Catalyst schema
        out_types = {f.name: f.dataType.simpleString()
                     for f in self.state.current.df.schema.fields}

        # ---- chained ops over source rows + derived pk/ts columns -----
        # a TIMESTAMP ORDER BY (INTERVAL frames) is derived through
        # unix_timestamp so every op works on epoch-second longs; the
        # wrap decision probes each spec's raw expression type first
        from database_stream_processor_spark.plans.incremental import (
            PartitionedRollingAggregateOp)
        self._wrap = []
        for _pk, o in self._specs:
            t = probe.select(F.expr(o).alias("__t")) \
                .schema["__t"].dataType.simpleString()
            if t in _NUMERIC_TS_TYPES:
                self._wrap.append(False)
            elif t == "timestamp":
                self._wrap.append(True)
            else:
                raise _UnloweredShape(f"ORDER BY type {t}")
        ext = self._extend(probe)

        self.ops = []
        cur, first = ext, True
        for i in range(len(self._specs)):
            if not aggs[i]:
                continue
            empty_in = (ZSetFrame.from_df(cur) if first
                        else ZSetFrame(cur))   # chained probe has weights
            op = PartitionedRollingAggregateLinearOp(
                empty_in, f"__rw_pk{i}", f"__rw_ts{i}",
                before=max(b for b, _ in frames[i].values()),
                after=max(a for _, a in frames[i].values()),
                aggs=aggs[i], frames=frames[i], numeric_ts=True)
            self.ops.append(op)
            cur, first = op.out.current.df, False
        for (si, before, after), nl_aggs in nl.items():
            empty_in = (ZSetFrame.from_df(cur) if first
                        else ZSetFrame(cur))
            op = PartitionedRollingAggregateOp(
                empty_in, f"__rw_pk{si}", f"__rw_ts{si}",
                before=before, after=after, aggs=nl_aggs,
                numeric_ts=True)
            self.ops.append(op)
            cur, first = op._out_state.current.df, False

        # ---- finalize projection (op-output rows -> view rows) --------
        fin = []
        for kind_, v in parsed:
            if kind_ == "plain":
                fin.append(v)
                continue
            fn, _arg = self._wins[v]
            typ = out_types[v]
            if fn == "COUNT":
                fin.append(f"CAST(__n_{v} AS {typ}) AS {v}")
            elif fn in ("MIN", "MAX"):
                fin.append(f"CAST({v} AS {typ}) AS {v}")
            elif fn == "SUM":
                fin.append(f"CASE WHEN __n_{v} = 0 THEN NULL "
                           f"ELSE CAST(__s_{v} AS {typ}) END AS {v}")
            else:                                      # AVG
                fin.append(f"CASE WHEN __n_{v} = 0 THEN NULL ELSE "
                           f"CAST(__s_{v} / __n_{v} AS {typ}) END AS {v}")
        self._final = fin
        self._weight = WEIGHT_COL
        # validate: finalize must analyze against the last op's output
        # schema (catches alias-qualified items etc. -> fallback via _try)
        cur.selectExpr(*self._final, WEIGHT_COL).schema
        if self.pred:
            probe.filter(F.expr(self.pred)).schema

    def _extend(self, df: DataFrame) -> DataFrame:
        return df.select("*", *self._derived())

    def _derived(self) -> list:
        extra = []
        for i, (pk, o) in enumerate(self._specs):
            ts = F.expr(o)
            if getattr(self, "_wrap", None) and self._wrap[i]:
                ts = F.unix_timestamp(ts)
            # multi-column PARTITION BY packs into one struct key (the
            # ops' pk joins/groupBys are null-safe, and struct <=> is
            # recursive null-safe equality)
            if not pk:                 # global window: constant key
                pk_col = F.lit(0)
            else:
                parts = _split_top_level(pk)
                pk_col = (F.expr(pk) if len(parts) == 1
                          else F.struct(*[F.expr(p.strip())
                                          for p in parts]))
            extra.append(pk_col.alias(f"__rw_pk{i}"))
            extra.append(ts.alias(f"__rw_ts{i}"))
        return extra

    def step(self, eng, combined, old):
        z = combined.get(self.table)
        if z is None:
            return self._empty()
        d = z.df.filter(F.expr(self.pred)) if self.pred else z.df
        cols = [c for c in d.columns if c != self._weight]
        od = ZSetFrame(d.select(*cols, *self._derived(),
                                F.col(self._weight)))
        for op in self.ops:
            od = op.step(od)
        out = od.df.selectExpr(*self._final, self._weight)
        delta = ZSetFrame(out).consolidate()
        self.apply_delta(delta)
        return delta


#: PARTITION BY clause of any OVER item (up to ORDER BY / frame / close)
_OVER_PK = re.compile(
    r"OVER\s*\(\s*PARTITION\s+BY\s+(?P<pk>.+?)"
    r"(?:\s+ORDER\s+BY\b|\s+ROWS\b|\s+RANGE\b|\s*\))",
    re.IGNORECASE | re.DOTALL)


class _PartitionWindowMaintainer(_ViewMaintainer):
    """Catch-all incremental lowering for window views the rolling op
    can't express: ``SELECT …, fn(…) OVER (PARTITION BY pks …), … FROM t
    [WHERE p]`` with ARBITRARY window functions (LAG/LEAD/ROW_NUMBER/
    RANK/FIRST_VALUE, ROWS frames, running totals) as long as every OVER
    item shares one PARTITION BY key list.

    A window result is a per-partition property, so maintenance is
    touched-partition recompute (the reference's per-key aggregate
    recompute idiom, aggregate/mod.rs:204-244, applied to whole window
    partitions): per tick, re-evaluate the view SQL over ONLY the
    partitions the delta touches and diff against the stored output
    restricted the same way — null-safe broadcast semi-joins on the
    partition keys, hidden ``__k_i`` key columns carried in the keyed
    state.  Cost ∝ rows in touched partitions (their full history — the
    RANGE-frame shapes that admit frame-bounded O(Δ) maintenance lower
    to :class:`_RollingWindowMaintainer` first and never reach this)."""

    kind = "partition_window"
    #: warn when one tick's touched-partition history exceeds this —
    #: the signal that a hot partition key is defeating the Δ-bound
    skew_warn_rows = 5_000_000

    def __init__(self, eng, name, sql, m):
        tbl = m.group("tbl").lower()
        if tbl not in eng.tables and tbl not in eng._maintainers:
            raise _UnloweredShape(tbl)
        if re.search(r"\(\s*SELECT", sql, re.IGNORECASE):
            raise _UnloweredShape("subquery")
        pks = None
        n_over = len(re.findall(r"\bOVER\b", sql, re.IGNORECASE))
        if n_over == 0:
            # reachable via _rolling_over_from's outer `SELECT … FROM
            # hidden WHERE rn <= k` shape — fail explicitly instead of
            # leaving pks=None to TypeError inside a blanket handler
            raise _UnloweredShape("no OVER items")
        hits = list(_OVER_PK.finditer(sql))
        if len(hits) != n_over:
            raise _UnloweredShape("OVER without PARTITION BY")
        for h in hits:
            t = " ".join(h.group("pk").split()).lower()
            if pks is None:
                pks = t
            elif pks != t:
                raise _UnloweredShape("OVER items differ in PARTITION BY")
        alias = (m.group("alias") or "").lower()
        keys = []
        for k in (s.strip() for s in _split_top_level(pks)):
            if alias:
                k = re.sub(rf"\b{alias}\s*\.\s*", "", k, flags=re.IGNORECASE)
            if re.match(r"^\w+\s*\.", k):
                raise _UnloweredShape(f"qualifier in partition key {k}")
            keys.append(k)
        super().__init__(eng, name, sql)
        self.table = tbl
        self.keys = keys
        hidden_in = ", ".join(f"{k} AS __k_{i}" for i, k in enumerate(keys))
        self._hidden = [f"__k_{i}" for i in range(len(keys))]
        alias_txt = f" {m.group('alias')}" if m.group("alias") else ""
        pred = f" WHERE {m.group('pred')}" if m.group("pred") else ""
        self._delta_sql = (f"SELECT {m.group('sel')}, {hidden_in} "
                           f"FROM {tbl}{alias_txt}{pred}")
        first = eng.eval_on(self._delta_sql,
                            {tbl: _source_rows0(eng, tbl)})
        empty = eng.spark.createDataFrame([], first.schema)
        self._out = StateTable(ZSetFrame.from_df(empty),
                               name=f"view_{name}_keyed")
        # touched-key exprs must evaluate against raw delta rows
        _source_rows0(eng, tbl).select(
            *[F.expr(k) for k in keys]).schema

    def step(self, eng, combined, old):
        z = combined.get(self.table)
        if z is None:
            return self._empty()
        with _no_constraint_propagation(eng.spark):
            return self._step_guarded(eng, z)

    def _step_guarded(self, eng, z):
        touched = (z.df.select(*[F.expr(k).alias(f"__t_{i}")
                                 for i, k in enumerate(self.keys)])
                   .dropDuplicates().localCheckpoint(eager=True))
        src = _current_rows(eng, self.table)
        keyed_src = src.select(
            "*", *[F.expr(k).alias(f"__pw_{i}")
                   for i, k in enumerate(self.keys)])
        cond = None
        for i in range(len(self.keys)):
            e = F.col(f"__pw_{i}").eqNullSafe(F.col(f"__t_{i}"))
            cond = e if cond is None else (cond & e)
        t_rows = (keyed_src.join(touched, on=cond, how="left_semi")
                  .drop(*[f"__pw_{i}" for i in range(len(self.keys))])
                  .localCheckpoint(eager=True))
        n_t = t_rows.count()   # cheap: counts the materialized checkpoint
        if n_t > self.skew_warn_rows:
            # touched-partition recompute is ∝ the partitions' FULL
            # history — a skewed partition (one user = 10% of events)
            # makes a tick ∝ that history; surface it instead of letting
            # a "small delta, slow tick" mystery fester
            _LOG.warning(
                "view %s: partition-window tick recomputing %d rows of "
                "touched-partition history (> %d); a hot partition key "
                "dominates — consider a frame-bounded OVER (RANGE "
                "BETWEEN …) shape, which lowers to the O(Δ) rolling "
                "operator instead", self.name, n_t, self.skew_warn_rows)
        new_out = ZSetFrame.from_df(
            eng.eval_on(self._delta_sql, {self.table: t_rows})
            .localCheckpoint(eager=True), 1)
        old_t = ZSetFrame(_ns_semi_pos(self._out.current.df, touched,
                                       self._hidden))
        keyed_delta = ZSetFrame(new_out.minus(old_t).consolidate()
                                .df.localCheckpoint(eager=True))
        self._out.update(keyed_delta)
        delta = ZSetFrame(keyed_delta.df.drop(*self._hidden)).consolidate()
        self.apply_delta(delta)
        return delta


#: global (no PARTITION BY) window item over a full-prefix frame
def _strip_order_mods(item: str) -> str:
    """Strip trailing ``ASC|DESC`` / ``NULLS FIRST|LAST`` from one ORDER
    BY item, leaving the bare sort-key expression."""
    return re.sub(r"(?:\s+(?:ASC|DESC))?(?:\s+NULLS\s+(?:FIRST|LAST))?\s*$",
                  "", item.strip(), flags=re.IGNORECASE)


_GWIN_ITEM = re.compile(
    rf"^(?P<fn>ROW_NUMBER|RANK|DENSE_RANK|SUM|COUNT|AVG|MIN|MAX)\s*"
    rf"\(\s*(?P<arg>\*|{_NEST2})?\s*\)\s+"
    r"OVER\s*\(\s*ORDER\s+BY\s+(?P<ord>[^()]+?)"
    r"(?:\s+(?P<frame>(?:ROWS|RANGE)\s+BETWEEN\s+UNBOUNDED\s+PRECEDING"
    r"\s+AND\s+CURRENT\s+ROW))?\s*\)\s+AS\s+(?P<name>\w+)$",
    re.IGNORECASE | re.DOTALL)


class _GlobalTailWindowMaintainer(_ViewMaintainer):
    """Global (non-partitioned) window view over full-prefix frames —
    ``SELECT …, ROW_NUMBER() OVER (ORDER BY o) AS rn, SUM(x) OVER
    (ORDER BY o) AS running, … FROM t [WHERE p]`` — maintained by
    BOUNDED TAIL RECOMPUTE: a delta row can only change output rows at
    or after the delta's minimum ORDER BY value (every supported frame
    is UNBOUNDED PRECEDING → CURRENT ROW, so rows strictly before the
    cutoff keep their prefix unchanged).  Per tick:

    1. cutoff = the delta's FIRST position in output order — MIN(order
       key) for ASC, MAX for DESC (one scalar);
    2. head = integral rows strictly before the cutoff in output order —
       reduced to ONE row of base aggregates (count / Σ / non-null
       count / min / max / distinct-order-tuples) with a column-pruned
       aggregate scan;
    3. the window SQL re-evaluates over the TAIL only (original ORDER BY
       text, direction/NULLS modifiers and any explicit frame verbatim),
       each item offset by its base (rank + head count, running sum +
       head sum, …), and diffs against the stored output restricted to
       the same tail.

    For monotone inputs (appended rows land at the END of the output
    order — ascending arrivals under ASC, descending under DESC) the
    tail is ≈ the delta, so the expensive global SORT touches O(Δ) rows;
    the head contributes only a whole-stage-codegen aggregate scan.
    The NULL block's placement follows the first key's NULLS mode
    (Spark defaults: ASC → NULLS FIRST, DESC → NULLS LAST).  When the
    block HEADS the order, it lives in the permanent head and a delta
    touching a NULL key forces a full recompute of that tick; when it
    TRAILS, NULL-key rows sit in the permanent tail and an all-NULL
    delta recomputes only that block.  The reference JIT lists
    OrderBy/Windows as its own TODO (dataflow-jit/src/ir/nodes/mod.rs:62)
    — this shape EXCEEDS it because a global running total is the most
    common window real users write.  Bounded frames raise
    :class:`_UnloweredShape` (bounded RANGE frames take the O(Δ)
    rolling path instead)."""

    kind = "global_window"

    def __init__(self, eng, name, sql, m):
        tbl = m.group("tbl").lower()
        if tbl not in eng.tables and tbl not in eng._maintainers:
            raise _UnloweredShape(tbl)
        if re.search(r"\(\s*SELECT", sql, re.IGNORECASE):
            raise _UnloweredShape("subquery")
        if re.search(r"\bPARTITION\s+BY\b", sql, re.IGNORECASE):
            raise _UnloweredShape("has PARTITION BY")
        alias = (m.group("alias") or "").lower()

        def _dealias(txt: str) -> str:
            return (_sub_outside_literals(rf"\b{alias}\s*\.\s*", "", txt,
                                          re.IGNORECASE)
                    if alias else txt)

        sel = _dealias(m.group("sel"))
        self.pred = _dealias(m.group("pred")) if m.group("pred") else None
        probe = _source_rows0(eng, tbl)

        order_txt = None
        base_aggs: list = []       # Columns evaluated over the head
        tail_items: list[str] = []
        self._n_wins = 0
        for it in (s.strip() for s in _split_top_level(sel)):
            if it == "*":
                tail_items.extend(probe.columns)
                continue
            wm = _GWIN_ITEM.match(it)
            if wm is None:
                if re.search(r"\bOVER\b", it, re.IGNORECASE):
                    raise _UnloweredShape(f"unsupported window item: {it}")
                tail_items.append(it)
                continue
            o_t = " ".join(wm.group("ord").split())
            if order_txt is None:
                order_txt = o_t
            elif order_txt.lower() != o_t.lower():
                raise _UnloweredShape("OVER items differ in ORDER BY")
            fn = wm.group("fn").upper()
            arg = (wm.group("arg") or "").strip()
            out = wm.group("name")
            i = self._n_wins
            self._n_wins += 1
            # Preserve an explicit frame verbatim: every supported frame
            # is UNBOUNDED PRECEDING → CURRENT ROW, and ROWS vs RANGE
            # differ only on peer rows — peers of a tail row are all in
            # the tail (the head is STRICTLY before the cutoff on the
            # first order key), so re-evaluating the original frame text
            # over the tail is sound.
            frame = (" " + " ".join(wm.group("frame").split())
                     if wm.group("frame") else "")
            win = f"OVER (ORDER BY {o_t}{frame})"
            if fn in ("ROW_NUMBER", "RANK"):
                if arg:
                    raise _UnloweredShape(it)
                base_aggs.append(F.count(F.lit(1)).alias(f"__b_{i}"))
                tail_items.append(f"__b_{i} + {fn}() {win} AS {out}")
            elif fn == "DENSE_RANK":
                if arg:
                    raise _UnloweredShape(it)
                oes = [F.expr(_strip_order_mods(e))
                       for e in _split_top_level(o_t)]
                # countDistinct over a STRUCT, not bare columns: struct
                # grouping treats NULL fields as equal (matching
                # DENSE_RANK's peer semantics), while count(DISTINCT a,b)
                # would silently skip tuples containing a NULL.
                base_aggs.append(F.countDistinct(F.struct(*oes))
                                 .alias(f"__b_{i}"))
                tail_items.append(f"__b_{i} + DENSE_RANK() {win} AS {out}")
            elif fn == "COUNT":
                cnt = (F.count(F.lit(1)) if arg == "*"
                       else F.count(F.expr(arg)))
                base_aggs.append(cnt.alias(f"__b_{i}"))
                tail_items.append(
                    f"__b_{i} + COUNT({arg}) {win} AS {out}")
            elif fn in ("MIN", "MAX"):
                agg = F.min(F.expr(arg)) if fn == "MIN" else \
                    F.max(F.expr(arg))
                base_aggs.append(agg.alias(f"__b_{i}"))
                comb = "LEAST" if fn == "MIN" else "GREATEST"
                w = f"{fn}({arg}) {win}"
                tail_items.append(
                    f"CASE WHEN __b_{i} IS NULL THEN {w} "
                    f"WHEN {w} IS NULL THEN __b_{i} "
                    f"ELSE {comb}(__b_{i}, {w}) END AS {out}")
            else:                                  # SUM / AVG
                base_aggs.append(F.sum(F.expr(arg)).alias(f"__b_{i}"))
                base_aggs.append(F.count(F.expr(arg)).alias(f"__bn_{i}"))
                sw, cw = f"SUM({arg}) {win}", f"COUNT({arg}) {win}"
                csum = (f"(CASE WHEN __bn_{i} = 0 THEN {sw} "
                        f"WHEN {sw} IS NULL THEN __b_{i} "
                        f"ELSE __b_{i} + {sw} END)")
                if fn == "SUM":
                    tail_items.append(f"{csum} AS {out}")
                else:
                    tail_items.append(
                        f"CASE WHEN __bn_{i} + {cw} = 0 THEN NULL "
                        f"ELSE {csum} / (__bn_{i} + {cw}) END AS {out}")
        if self._n_wins == 0:
            raise _UnloweredShape("no global window items")
        self.table = tbl
        self._order = order_txt
        first_key = _split_top_level(order_txt)[0].strip()
        dm = re.match(
            r"^(?P<e>.*?)(?:\s+(?P<dir>ASC|DESC))?"
            r"(?:\s+NULLS\s+(?P<nul>FIRST|LAST))?$",
            first_key, re.IGNORECASE | re.DOTALL)
        self._o1 = dm.group("e")
        # The head/tail split mirrors on the FIRST key's direction only;
        # later keys' modifiers ride along verbatim in the tail SQL (they
        # never move a row across the strict first-key cutoff).
        self._asc = (dm.group("dir") or "ASC").upper() == "ASC"
        nul = dm.group("nul")
        # Spark defaults: ASC → NULLS FIRST, DESC → NULLS LAST.
        self._nulls_first = (nul.upper() == "FIRST") if nul else self._asc
        self._base_aggs = base_aggs

        super().__init__(eng, name, sql)      # typing via Catalyst schema
        out_types = {f.name: f.dataType.simpleString()
                     for f in self.state.current.df.schema.fields}
        final = []
        for it in tail_items:
            am = re.match(rf"^(.*\S)\s+AS\s+(\w+)$", it,
                          re.IGNORECASE | re.DOTALL)
            if am and am.group(2) in out_types and "__b" in am.group(1):
                final.append(f"CAST({am.group(1)} AS "
                             f"{out_types[am.group(2)]}) AS {am.group(2)}")
            else:
                final.append(it)
        self._tail_sql = ("SELECT " + ", ".join(final)
                          + f", ({self._o1}) AS __gw_o1 FROM {tbl}")

        from database_stream_processor_spark.zset import WEIGHT_COL
        self._weight = WEIGHT_COL
        # validate analysis: tail SQL over empty source + empty-head bases
        empty_base = probe.agg(*base_aggs)
        first = eng.eval_on(self._tail_sql,
                            {tbl: probe.crossJoin(F.broadcast(empty_base))})
        self._out = StateTable(
            ZSetFrame.from_df(eng.spark.createDataFrame([], first.schema)),
            name=f"view_{name}_keyed")
        if self.pred:
            probe.filter(F.expr(self.pred)).schema
        probe.select(F.expr(self._o1)).schema

    def step(self, eng, combined, old):
        z = combined.get(self.table)
        if z is None:
            return self._empty()
        with _no_constraint_propagation(eng.spark):
            return self._step_guarded(eng, z)

    def _step_guarded(self, eng, z):
        d = z.df.filter(F.expr(self.pred)) if self.pred else z.df
        probe = d.select(
            F.count(F.lit(1)).alias("n"),
            F.min(F.expr(self._o1)).alias("lo"),
            F.max(F.expr(self._o1)).alias("hi"),
            F.sum(F.expr(f"CAST(({self._o1}) IS NULL AS INT)")).alias(
                "nn")).collect()[0]
        if probe["n"] == 0:
            return self._empty()
        nulls_in_delta = (probe["nn"] or 0) > 0
        # Cutoff = the delta's FIRST position in output order: min for
        # ASC, max for DESC (min/max skip NULL order keys).
        cut = probe["lo"] if self._asc else probe["hi"]
        src = _current_rows(eng, self.table)
        if self.pred:
            src = src.filter(F.expr(self.pred))
        o1 = F.expr(self._o1)
        g = F.col("__gw_o1")
        if self._nulls_first and nulls_in_delta:
            # The NULL block heads the order: a NULL delta row shifts
            # every row's prefix — full recompute with an empty head.
            head = src.limit(0)
            tail = src
            old_t = ZSetFrame(self._out.current.df)
        elif cut is None:
            # All-NULL delta under NULLS LAST: only the trailing NULL
            # block changes; every non-NULL row keeps its prefix.
            head = src.filter(o1.isNotNull())
            tail = src.filter(o1.isNull())
            old_t = ZSetFrame(self._out.current.df.filter(g.isNull()))
        else:
            beyond = (o1 < F.lit(cut)) if self._asc else (o1 > F.lit(cut))
            onside = (o1 >= F.lit(cut)) if self._asc else (o1 <= F.lit(cut))
            g_onside = ((g >= F.lit(cut)) if self._asc
                        else (g <= F.lit(cut)))
            if self._nulls_first:
                head = src.filter(o1.isNull() | beyond)
                tail = src.filter(o1.isNotNull() & onside)
                old_t = ZSetFrame(self._out.current.df.filter(
                    g.isNotNull() & g_onside))
            else:
                head = src.filter(o1.isNotNull() & beyond)
                tail = src.filter(o1.isNull() | onside)
                old_t = ZSetFrame(self._out.current.df.filter(
                    g.isNull() | g_onside))
        bases = head.agg(*self._base_aggs)
        new_out = ZSetFrame.from_df(
            eng.eval_on(self._tail_sql,
                        {self.table: tail.crossJoin(F.broadcast(bases))})
            .localCheckpoint(eager=True), 1)
        keyed_delta = ZSetFrame(new_out.minus(old_t).consolidate()
                                .df.localCheckpoint(eager=True))
        self._out.update(keyed_delta)
        delta = ZSetFrame(keyed_delta.df.drop("__gw_o1")).consolidate()
        self.apply_delta(delta)
        return delta


_SQL_KEYWORDS = frozenset("""select from where over partition by order range
rows between preceding following current row as and or not null is cast sum
count avg min max case when then else end in exists like asc desc int
integer bigint smallint double float real decimal numeric string varchar
char boolean date timestamp interval true false distinct on using join left
right full outer inner cross group having union intersect except limit
coalesce nullif abs round floor ceil ceiling""".split())


def _parse_aliased_chain(from_clause: str, unique_tables: bool = True) \
        -> list[tuple[str, str, str]] | None:
    """``t1 [a1] (JOIN | LEFT [OUTER] JOIN) t2 [a2] ON c2 …`` →
    [(table, alias, join_kw)] with ``join_kw`` '' for the base table;
    None for anything with RIGHT/FULL/CROSS or unparsable segments.
    ``unique_tables=False`` admits the same table at several positions
    (distinct aliases) — only the chain-dedup rewrite wants that; every
    other consumer keys state by table name."""
    if re.search(r"\b(RIGHT|FULL|CROSS)\b", from_clause, re.IGNORECASE):
        return None
    segs = re.split(r"\b(LEFT\s+(?:OUTER\s+)?JOIN|JOIN)\b", from_clause,
                    flags=re.IGNORECASE)
    if len(segs) < 3:
        return None
    tm = _TBL_ALIAS_RE.match(segs[0].strip())
    if not tm:
        return None
    out = [(tm.group(1).lower(), (tm.group(2) or tm.group(1)).lower(), "")]
    for kw, seg in zip(segs[1::2], segs[2::2]):
        parts = re.split(r"\bON\b", seg, maxsplit=1, flags=re.IGNORECASE)
        if len(parts) != 2:
            return None
        tm = _TBL_ALIAS_RE.match(parts[0].strip())
        if not tm:
            return None
        out.append((tm.group(1).lower(),
                    (tm.group(2) or tm.group(1)).lower(),
                    " ".join(kw.upper().split())))
    aliases = [a for _, a, _ in out]
    if len(set(aliases)) != len(aliases):
        return None
    names = [t for t, _, _ in out]
    if unique_tables and len(set(names)) != len(names):
        return None
    return out


def _kw_at(s: str, i: int, kw: str) -> bool:
    """True iff ``kw`` occurs at position ``i`` of ``s`` as a whole word."""
    n = len(kw)
    return (s[i:i + n].upper() == kw
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (i + n == len(s) or not (s[i + n].isalnum()
                                         or s[i + n] == "_")))


def _top_mask(s: str) -> bytearray | None:
    """THE shared lexical scan (r8 verdict ask #4): one pass that every
    top-level splitting helper below consumes, replacing ten per-helper
    reimplementations of paren/literal/CASE tracking — the r8 fuzz
    campaign found a silent-misread class (mixed AND/OR) in exactly this
    duplicated logic, and duplicated scanners are where the next one
    hides.

    ``mask[i] == 1`` iff position ``i`` is *top-level*: paren depth 0,
    outside single-quoted string literals (doubled ``''`` escapes are
    two adjacent literals — the toggle handles them), and outside any
    ``CASE … END`` span (an unparenthesized CASE legally contains
    AND/OR/BETWEEN inside WHEN conditions; splitting there tears the
    expression).  The CASE/END keywords themselves are masked.

    Returns ``None`` — scan REFUSED — for lexical constructs the old
    scanners silently desynced on (ADVICE r8 #2): a double-quote
    character or a ``--`` comment marker outside literals, an
    unterminated literal, or unbalanced parens.  Callers map ``None``
    to their most conservative answer (no split / no match), and
    ``_lower_view`` gates the whole lowering on it, so a refused view
    text falls back to snapshot-diff — which evaluates the ORIGINAL
    text in Spark and therefore can never change results."""
    n = len(s)
    mask = bytearray(n)
    depth = cased = 0
    in_str = False
    i = 0
    while i < n:
        ch = s[i]
        if in_str:
            if ch == "'":
                in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
            i += 1
            continue
        if ch == '"':
            return None
        if ch == "-" and i + 1 < n and s[i + 1] == "-":
            return None
        if ch == "(":
            depth += 1
            i += 1
            continue
        if ch == ")":
            depth -= 1
            if depth < 0:
                return None
            mask[i] = 1 if (depth == 0 and not cased) else 0
            i += 1
            continue
        if depth == 0:
            if _kw_at(s, i, "CASE"):
                cased += 1
                i += 4
                continue
            if cased and _kw_at(s, i, "END"):
                cased -= 1
                i += 3
                continue
        mask[i] = 1 if (depth == 0 and not cased) else 0
        i += 1
    if in_str or depth != 0:
        return None
    return mask


def _match_paren(s: str, i: int) -> int:
    """Index of the ``)`` closing the ``(`` at ``i`` (single-quote-
    literal-aware), or -1 when unbalanced — the one span scanner the
    subquery extractors share."""
    depth, in_str, j, n = 0, False, i, len(s)
    while j < n:
        c = s[j]
        if c == "'":
            in_str = not in_str
        elif not in_str:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    return j
        j += 1
    return -1


def _split_select_from(flat: str) -> tuple[str, str] | None:
    """``SELECT <sel> FROM <rest>`` split at the first top-level FROM —
    EXTRACT(x FROM col) / SUBSTRING(s FROM i) live inside parens, and a
    literal ``' from '`` in a select item must not split either (ADVICE
    r7 #2).  Refused scans (``_top_mask`` None) return None: not a
    lowerable SELECT shape."""
    if not re.match(r"^SELECT\s", flat, re.IGNORECASE):
        return None
    mask = _top_mask(flat)
    if mask is None:
        return None
    for i in range(7, len(flat)):
        if mask[i] and _kw_at(flat, i, "FROM"):
            sel, rest = flat[7:i].strip(), flat[i + 4:].strip()
            return (sel, rest) if sel and rest else None
    return None


def _split_where(rest: str) -> tuple[str, str | None]:
    """Split a top-level WHERE off a FROM clause (refused scan → no
    WHERE found: downstream ref parsing then fails and falls back)."""
    mask = _top_mask(rest)
    if mask is None:
        return rest, None
    for i in range(len(rest)):
        if mask[i] and _kw_at(rest, i, "WHERE"):
            return rest[:i].strip(), rest[i + 5:].strip()
    return rest, None


def _sub_outside_literals(pattern: str, repl: str, text: str,
                          flags: int = 0) -> str:
    """``re.sub`` that never rewrites inside single-quoted SQL string
    literals — the same segmentation discipline as ``_rewrite_having``
    (a literal like ``'x.y'`` in a select item must survive qualifier
    stripping verbatim; the rewritten SQL would still analyze, so no
    fallback could catch the silent value change).  Doubled-quote
    escapes split into two adjacent literal segments, neither rewritten."""
    segments = re.split(r"('(?:[^']*)')", text)
    return "".join(seg if seg.startswith("'")
                   else re.sub(pattern, repl, seg, flags=flags)
                   for seg in segments)


def _blank_literals(text: str) -> str:
    """Same-length copy with single-quoted literal CONTENT blanked to
    spaces — positional scans run on the copy, splices on the
    original."""
    return re.sub(r"'[^']*'",
                  lambda m: "'" + " " * (len(m.group(0)) - 2) + "'",
                  text)


def _search_outside_literals(pattern: str, text: str,
                             flags: int = 0) -> bool:
    """``re.search`` over the non-literal segments of ``text`` only —
    the search twin of :func:`_sub_outside_literals`."""
    segments = re.split(r"('(?:[^']*)')", text)
    return any(re.search(pattern, seg, flags)
               for seg in segments if not seg.startswith("'"))


#: one ``table [AS alias],`` member of a comma-FROM list
_FROM_LIST_ENTRY = r"(?:\w+(?:\s+(?:AS\s+)?\w+)?\s*,\s*)"


def _sub_table_refs(name: str, hid: str, text: str) -> str | None:
    """Rewrite references to CTE ``name`` in TABLE positions only —
    ``FROM name`` / ``JOIN name`` legs, comma-FROM list members, and
    ``name.`` qualifiers — leaving every other occurrence untouched; in
    particular an output alias ``… AS name`` keeps the view's declared
    column name (ADVICE r9 #1: the old whole-word rewrite renamed it).

    Returns None (caller refuses → snapshot-diff of the ORIGINAL text,
    always correct) when ``name`` is also used as a RELATION alias
    (``FROM t AS name`` / ``t name``): the qualifier rewrite would
    capture that alias's qualifiers.  Occurrences this helper cannot
    classify are left alone — an unrewritten table reference fails
    analysis (the bare CTE name is never registered as a view), so
    under-rewriting falls back, never corrupts; the lifts refuse CTE
    names that shadow a real source upfront, which is what makes the
    fail-safe argument hold."""
    esc = re.escape(name)
    if _search_outside_literals(
            rf"\b(FROM|JOIN|,)\s*\w+\s+(AS\s+)?{esc}\b", text,
            re.IGNORECASE):
        return None
    out = _sub_outside_literals(rf"\b(FROM|JOIN)(\s+){esc}\b(?!\s*\.)",
                                rf"\g<1>\g<2>{hid}", text,
                                re.IGNORECASE)
    # comma-FROM list members: FROM t1 [a1], name [an], …
    comma_pat = rf"(\bFROM\s+{_FROM_LIST_ENTRY}+){esc}\b(?!\s*\.)"
    while True:
        new = _sub_outside_literals(comma_pat, rf"\g<1>{hid}", out,
                                    re.IGNORECASE)
        if new == out:
            break
        out = new
    # relation qualifiers: name.col → hid.col (safe: the alias-usage
    # guard above ran, and the lifts refuse CTE names colliding with
    # source columns, so no struct-field access can match)
    return _sub_outside_literals(rf"\b{esc}\s*\.", f"{hid}.", out,
                                 re.IGNORECASE)


def _split_top_kw(s: str, kw: str) -> list[str]:
    """Split ``s`` on whole-word ``kw`` at top level (``_top_mask``
    semantics: outside parens/literals/CASE…END spans).  A refused scan
    returns ``[s]`` — no split, the caller's most conservative case."""
    mask = _top_mask(s)
    if mask is None:
        return [s.strip()]
    parts, i, n, last = [], 0, len(s), 0
    L = len(kw)
    while i < n:
        if mask[i] and _kw_at(s, i, kw):
            parts.append(s[last:i])
            i += L
            last = i
            continue
        i += 1
    parts.append(s[last:])
    return [p.strip() for p in parts]


def _mixed_top_and_or(s: str) -> bool:
    """True when ``s`` carries BOTH a top-level OR and a top-level AND
    (outside parens/literals/CASE): operator precedence then makes the
    expression a DISJUNCTION (``a AND b OR c`` = ``(a AND b) OR c``),
    so splitting it on AND and treating the parts as conjuncts silently
    misreads it — every conjunct-splitting consumer must refuse
    (fuzz-found in r8; a pure OR with no top-level AND is safe: the
    split returns the whole expression as one term).  The AND count is
    BETWEEN-aware: ``x BETWEEN 1 AND 2 OR y = 3`` is a pure
    disjunction, not a mixed shape (r8 review)."""
    return (len(_split_top_kw(s, "OR")) > 1
            and len(_split_top_and_bw(s)) > 1)


def _find_top_kw(s: str, kws: tuple[str, ...]) -> int:
    """Index of the first top-level whole-word occurrence of any of
    ``kws``; -1 if none (or the scan refused — ``_lower_view``'s gate
    keeps refused text out of the recognizers entirely)."""
    mask = _top_mask(s)
    if mask is None:
        return -1
    for i in range(len(s)):
        if mask[i] and any(_kw_at(s, i, k) for k in kws):
            return i
    return -1


#: clause keywords that terminate a FROM clause at top level
_NCF_STOPS = ("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "UNION",
              "INTERSECT", "EXCEPT", "WINDOW")


def _normalize_comma_from(eng: "Engine", sql: str) -> str:
    """Rewrite implicit-join SQL — ``FROM a, b, c WHERE <equalities AND
    residual>`` — into the explicit ``JOIN … ON`` chains the recognizers
    lower: the normalization the reference's Calcite frontend performs
    before its own lowering (the sql-to-dbsp submodule accepts verbatim
    TPC-H text, SURVEY §3.2).  Join equalities are attributed to table
    refs schema-aware — a bare TPC-H column like ``p_partkey`` resolves
    through the unique ref whose schema holds it, qualified columns
    through their alias — and emitted QUALIFIED in the ON clauses (the
    equi-join parsers expect ``a.x = b.y``).  Conjuncts that don't link
    two distinct in-scope refs (literal filters, scalar-subquery
    comparisons, correlated outer references) stay in the residual
    WHERE.  Subquery blocks normalize recursively, innermost first.
    Anything unparsable — a comma ref that is itself a subquery, a
    duplicate alias, a ref with no linking equality (true cross join) —
    returns that block UNCHANGED: the snapshot-diff fallback still
    evaluates it, so this rewrite can only upgrade, never break.

    A subquery ref that reuses an ENCLOSING FROM's table name unaliased
    (verbatim TPC-H q2's inner ``FROM partsupp, supplier, …`` under an
    outer FROM naming the same tables) gets a fresh synthetic alias —
    SQL scoping makes the inner instance independent anyway, and the
    scalar-subquery machinery refuses shadowed aliases outright."""
    flat = _ncf_flatten(sql)
    if _top_mask(flat) is None:
        return sql          # lexical refusal: upgrade-or-no-op contract
    return _ncf_block(eng, flat, {})


def _ncf_flatten(sql: str) -> str:
    """Collapse whitespace runs to single spaces OUTSIDE single-quoted
    string literals (a literal like ``'a  b'`` must survive the
    normalizer verbatim — ADVICE r7 #2)."""
    segments = re.split(r"('(?:[^']*)')", sql)
    return "".join(seg if seg.startswith("'")
                   else re.sub(r"\s+", " ", seg)
                   for seg in segments).strip()


def _ncf_scope_of(eng: "Engine", block: str) -> dict[str, frozenset]:
    """``{qualifier: columns}`` for a block's top-level FROM refs (comma
    refs or explicit join chains) — the scope passed down to subquery
    normalization, used both for shadow detection and for qualifying
    correlated outer column references."""
    parts = _split_select_from(block)
    if parts is None:
        return {}
    stop = _find_top_kw(parts[1], _NCF_STOPS)
    fc = (parts[1] if stop < 0 else parts[1][:stop]).strip()
    out: dict[str, frozenset] = {}
    for seg in re.split(r"\b(?:(?:LEFT|RIGHT|FULL|CROSS)\s+(?:OUTER\s+)?"
                        r"JOIN|JOIN)\b", fc, flags=re.IGNORECASE):
        seg = re.split(r"\bON\b", seg, maxsplit=1,
                       flags=re.IGNORECASE)[0]
        for r in _split_top_level(seg):
            tm = _TBL_ALIAS_RE.match(r.strip())
            if not tm:
                continue
            t = tm.group(1).lower()
            a = (tm.group(2) or tm.group(1)).lower()
            if t in eng.tables or t in eng.views or t in eng._maintainers:
                out[a] = frozenset(
                    c.lower() for c in _source_rows0(eng, t).columns)
    return out


def _ncf_block(eng: "Engine", block: str,
               scope: dict[str, frozenset]) -> str:
    inner_scope = dict(scope)
    inner_scope.update(_ncf_scope_of(eng, block))
    out, i, n = [], 0, len(block)
    while i < n:
        ch = block[i]
        if ch == "'":
            j = block.find("'", i + 1)
            j = n - 1 if j < 0 else j
            out.append(block[i:j + 1])
            i = j + 1
            continue
        if ch == "(":
            j = _match_paren(block, i)
            if j < 0:
                j = n          # unbalanced: keep the full remainder
            out.append("(" + _ncf_block(eng, block[i + 1:j].strip(),
                                        inner_scope) + ")")
            i = j + 1
            continue
        out.append(ch)
        i += 1
    return _ncf_rewrite(eng, "".join(out), scope)


def _split_top_and_bw(s: str) -> list[str]:
    """Split on top-level AND, but NEVER on the AND that belongs to a
    ``BETWEEN x AND y`` (each top-level BETWEEN claims the next
    top-level AND) and never inside a ``CASE … END`` span (ANDs inside
    an unparenthesized WHEN condition are NOT conjuncts of the WHERE —
    splitting there would extract an equality out of the CASE and
    silently change results, ADVICE r7 #1).  Mask-driven
    (``_top_mask``); a refused scan returns ``[s]`` unsplit."""
    mask = _top_mask(s)
    if mask is None:
        return [s.strip()]
    parts, pending_bw = [], 0
    i, n, last = 0, len(s), 0
    while i < n:
        if mask[i] and _kw_at(s, i, "BETWEEN"):
            pending_bw += 1
            i += 7
            continue
        if mask[i] and _kw_at(s, i, "AND"):
            if pending_bw:
                pending_bw -= 1
            else:
                parts.append(s[last:i])
                last = i + 3
            i += 3
            continue
        i += 1
    parts.append(s[last:])
    return [p.strip() for p in parts]


def _outer_parens_match(s: str) -> bool:
    """True iff s is '(' … ')' with the FIRST paren matching the LAST
    (so '(a) OR (b)' is not stripped).  The mask marks exactly the
    parens that close back to depth 0, so the first such ')' must be
    the final character."""
    if not (s.startswith("(") and s.endswith(")")):
        return False
    mask = _top_mask(s)
    if mask is None:
        return False
    for i in range(1, len(s)):
        if mask[i] and s[i] == ")":
            return i == len(s) - 1
    return False


def _hoist_common_or_conjuncts(conjs: list[str]) -> list[str]:
    """Factor conjuncts COMMON to every branch of an OR-of-conjunctions
    out of the disjunction — ``(A AND x) OR (A AND y)`` → ``A AND (x OR
    y)`` — the published TPC-H q19 buries its join equality inside each
    OR branch, and only a top-level equality can become a JOIN ON.
    Purely algebraic (distributivity), so always sound; conjuncts with
    no top-level OR pass through unchanged."""
    out: list[str] = []
    for c in conjs:
        c = c.strip()
        probe = c[1:-1].strip() if _outer_parens_match(c) else c
        branches = _split_top_kw(probe, "OR")
        if len(branches) < 2:
            out.append(c)
            continue
        sets = []
        for b in branches:
            b = b.strip()
            if _outer_parens_match(b):
                b = b[1:-1].strip()
            sets.append([t.strip() for t in _split_top_and_bw(b)])
        norm = lambda t: " ".join(t.split()).lower()  # noqa: E731
        common = set.intersection(*[{norm(t) for t in s} for s in sets])
        if not common:
            out.append(c)
            continue
        out.extend(t for t in sets[0] if norm(t) in common)
        resid = []
        absorbed = False
        for s in sets:
            rest = [t for t in s if norm(t) not in common]
            if not rest:
                # (A) OR (A AND x) = A — the disjunction is implied
                absorbed = True
                break
            resid.append("(" + " AND ".join(rest) + ")")
        if not absorbed:
            out.append("(" + " OR ".join(resid) + ")")
    return out


def _ncf_qualify(text: str, resolve) -> str:
    """Qualify bare column tokens via ``resolve(lower_token) ->
    qualifier | None`` — literal-safe, skips keywords, function calls,
    already-qualified refs, and AS aliases."""
    out = []
    for seg in re.split(r"('(?:[^']*)')", text):
        if seg.startswith("'"):
            out.append(seg)
            continue
        res, last = [], 0
        for bm in re.finditer(r"\b([A-Za-z_]\w*)\b(?!\s*[(.])", seg):
            tok = bm.group(1)
            pre = seg[:bm.start()].rstrip()
            if (tok.lower() in _SQL_KEYWORDS or pre.endswith(".")
                    or re.search(r"\bAS$", pre, re.IGNORECASE)):
                continue
            q = resolve(tok.lower())
            if q:
                res.append(seg[last:bm.start()])
                res.append(f"{q}.{tok}")
                last = bm.end()
        res.append(seg[last:])
        out.append("".join(res))
    return "".join(out)


def _ncf_rewrite(eng: "Engine", flat: str,
                 scope: dict[str, frozenset]) -> str:
    parts = _split_select_from(flat)
    if parts is None:
        return flat
    sel, rest = parts
    stop = _find_top_kw(rest, _NCF_STOPS)
    from_clause = (rest if stop < 0 else rest[:stop]).strip()
    trailing = "" if stop < 0 else rest[stop:].strip()
    refs = [r.strip() for r in _split_top_level(from_clause)]
    if len(refs) < 2:
        return flat
    parsed, ref_txts, renamed = [], [], {}
    for r in refs:
        if "(" in r or re.search(r"\bJOIN\b", r, re.IGNORECASE):
            return flat
        tm = _TBL_ALIAS_RE.match(r)
        if not tm:
            return flat
        t = tm.group(1).lower()
        a = (tm.group(2) or tm.group(1)).lower()
        if not (t in eng.tables or t in eng.views or t in eng._maintainers):
            return flat
        if tm.group(2) is None and t in scope:
            # unaliased ref shadowing an enclosing FROM: fresh alias
            a = f"{t}__s{len(parsed)}"
            renamed[t] = a
            ref_txts.append(f"{t} {a}")
        else:
            ref_txts.append(r)
        parsed.append((t, a))
    if len({a for _, a in parsed}) != len(parsed):
        return flat
    if not re.match(r"^WHERE\b", trailing, re.IGNORECASE):
        return flat                           # no predicate: cross join
    after = trailing[5:].strip()
    wstop = _find_top_kw(after, _NCF_STOPS[1:])
    wpred = (after if wstop < 0 else after[:wstop]).strip()
    tail = "" if wstop < 0 else after[wstop:].strip()
    if renamed:
        # table-name qualifiers on renamed refs follow the new alias
        for t, a in renamed.items():
            sel = _sub_outside_literals(rf"\b{t}\s*\.", f"{a}.", sel,
                                        re.IGNORECASE)
            wpred = _sub_outside_literals(rf"\b{t}\s*\.", f"{a}.",
                                          wpred, re.IGNORECASE)
            tail = _sub_outside_literals(rf"\b{t}\s*\.", f"{a}.",
                                         tail, re.IGNORECASE)
    if len(_split_top_kw(wpred, "OR")) > 1:
        # the WHERE is a top-level DISJUNCTION (mixed `a AND b OR c`
        # included) — never split it on AND; only branch-common
        # conjuncts may be factored out (TPC-H q19's shape)
        conjs = _hoist_common_or_conjuncts([wpred])
    else:
        conjs = _hoist_common_or_conjuncts(_split_top_and_bw(wpred))
    ref_of = {a: r for r, (_, a) in zip(ref_txts, parsed)}
    cols_of = {a: {c.lower() for c in _source_rows0(eng, t).columns}
               for t, a in parsed}

    def attr(tok: str) -> str | None:
        if "." in tok:
            q, c = tok.split(".", 1)
            q = q.lower()
            return q if q in cols_of and c.lower() in cols_of[q] else None
        owners = [a for _, a in parsed if tok.lower() in cols_of[a]]
        return owners[0] if len(owners) == 1 else None

    def qual(tok: str, a: str) -> str:
        return tok if "." in tok else f"{a}.{tok}"

    links = []                     # (conj idx, alias1, alias2, ON text)
    for ci, c in enumerate(conjs):
        em = re.match(r"^(\w+(?:\.\w+)?)\s*=\s*(\w+(?:\.\w+)?)$", c)
        if not em:
            continue
        a1, a2 = attr(em.group(1)), attr(em.group(2))
        if a1 and a2 and a1 != a2:
            links.append((ci, a1, a2,
                          f"{qual(em.group(1), a1)} = "
                          f"{qual(em.group(2), a2)}"))

    joined = {parsed[0][1]}
    remaining = [a for _, a in parsed[1:]]
    used: set[int] = set()
    chain = [ref_txts[0]]
    while remaining:
        nxt = None
        for ci, a1, a2, _txt in links:
            if ci in used:
                continue
            s1, s2 = a1 in joined, a2 in joined
            if s1 != s2:
                nxt = a2 if s1 else a1
                break
        if nxt is None:
            return flat                       # disconnected: cross join
        on_terms = []
        for ci, a1, a2, txt in links:
            if ci in used:
                continue
            pair = {a1, a2}
            if nxt in pair and (pair - {nxt}) <= joined:
                on_terms.append(txt)
                used.add(ci)
        chain.append(f"JOIN {ref_of[nxt]} ON " + " AND ".join(on_terms))
        joined.add(nxt)
        remaining.remove(nxt)
    residual = [c for i, c in enumerate(conjs) if i not in used]
    if scope:
        # subquery block: qualify bare columns — inner refs win (SQL
        # scoping), then unique enclosing-FROM owners (correlation refs
        # like TPC-H q2's `p_partkey = ps_partkey`), so the downstream
        # subquery machinery sees fully qualified correlation terms
        def resolve(tok: str) -> str | None:
            inner = attr(tok)
            if inner:
                return inner
            owners = [q for q, cols in scope.items() if tok in cols]
            return owners[0] if len(owners) == 1 else None

        sel = _ncf_qualify(sel, resolve)
        residual = [_ncf_qualify(c, resolve) for c in residual]
        tail = _ncf_qualify(tail, resolve)
    new = f"SELECT {sel} FROM " + " ".join(chain)
    if residual:
        new += " WHERE " + " AND ".join(residual)
    if tail:
        new += " " + tail
    return new


def _expand_subquery_stars(eng: "Engine", inner: str) -> str:
    """Expand ``*`` / ``alias.*`` select items of a join subquery into
    explicit ``alias.col AS col`` items with FIRST-WINS dedup of output
    names — the reference's demo02 writes ``SELECT t1.*, t2.* FROM
    transactions t1 LEFT JOIN demographics t2 ON t1.cc_num = t2.cc_num``
    whose duplicate ``cc_num`` would make every outer reference
    ambiguous in Spark; first-wins matches resolving the shared join key
    to the left table.  First-wins is restricted to names equated in the
    join condition — any other duplicate raises :class:`_UnloweredShape`
    (real SQL raises ambiguity; silently dropping a column would change
    semantics).  Leaves anything unparsable unchanged."""
    parts = _split_select_from(_ncf_flatten(inner))
    if parts is None:
        return inner
    sel, rest = parts
    body, pred = _split_where(rest)
    items = [s.strip() for s in _split_top_level(sel)]
    if not any(it == "*" or re.match(r"^\w+\s*\.\s*\*$", it)
               for it in items):
        return inner
    chain = (_parse_aliased_chain(body)
             or ([(body.strip().lower(), body.strip().lower(), "")]
                 if re.match(r"^\w+$", body.strip()) else None))
    if chain is None or any(t not in eng.tables and t not in eng.views
                            for t, _, _ in chain):
        return inner
    alias_of = {a: (t, a) for t, a, _ in chain}
    # Bare names equated across the join (``t1.cc_num = t2.cc_num``) are
    # the ONLY duplicates first-wins may silently drop — both sides hold
    # the same value on matched rows, and resolving to the left table
    # matches how the reference's demo02 reads its shared ``cc_num``.
    # Any other duplicate output name would make first-wins a silent
    # semantic change (real SQL raises ambiguity), so it unlowers.
    join_keys = {m.group(2).lower()
                 for m in re.finditer(
                     r"\b(\w+)\s*\.\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)", body)
                 if m.group(2).lower() == m.group(4).lower()}
    out, claimed = [], set()

    def _emit(t: str, a: str):
        for c in _source_rows0(eng, t).columns:
            if c.lower() not in claimed:
                claimed.add(c.lower())
                out.append(f"{a}.{c} AS {c}")
            elif c.lower() not in join_keys:
                raise _UnloweredShape(
                    f"duplicate non-join-key output column {c} in star "
                    f"expansion of: {inner}")

    for it in items:
        sm = re.match(r"^(\w+)\s*\.\s*\*$", it)
        if it == "*":
            for t, a, _ in chain:
                _emit(t, a)
        elif sm and sm.group(1).lower() in alias_of:
            _emit(*alias_of[sm.group(1).lower()])
        else:
            out.append(it)
    return ("SELECT " + ", ".join(out) + " FROM " + body
            + (f" WHERE {pred}" if pred else ""))


def _rolling_over_from(eng: "Engine", name: str, flat: str):
    """Rolling-window view whose FROM clause is a JOIN chain or a
    parenthesized subquery — the VERBATIM demo02 features shape
    (demo/project_demo02-FraudDetection/project.sql:36-63: OVER windows
    over ``FROM (SELECT … FROM transactions LEFT JOIN demographics …)``).

    Synthesizes a HIDDEN maintained view ``__{name}_src`` for the FROM
    clause (lowered through the ordinary recognizers — join, left-join,
    multi-join …), rewrites the outer select to read the hidden view's
    bare columns, and layers :class:`_RollingWindowMaintainer` on top —
    a two-stage O(Δ) pipeline where snapshot-diff would rescan the join
    every tick.  Raises :class:`_UnloweredShape` when column references
    can't be made unambiguous (two sources for one bare name) or when
    the FROM clause itself only snapshot-diffs (no benefit to layering).
    """
    parts = _split_select_from(flat)
    if parts is None:
        raise _UnloweredShape(flat)
    sel, rest = parts
    rest, pred = _split_where(rest)
    outer_sel, outer_pred = sel, pred

    if rest.startswith("("):
        # FROM ( subquery ) [alias]
        depth, end = 0, -1
        for i, ch in enumerate(rest):
            depth += (ch == "(") - (ch == ")")
            if depth == 0:
                end = i
                break
        inner = rest[1:end].strip()
        tail = rest[end + 1:].strip()
        am = re.match(r"^(?:AS\s+)?(\w+)?\s*$", tail, re.IGNORECASE)
        if am is None or not inner.upper().startswith("SELECT"):
            raise _UnloweredShape(rest)
        if am.group(1):            # strip subquery-alias qualifiers
            a = am.group(1).lower()
            outer_sel = _sub_outside_literals(
                rf"\b{a}\s*\.\s*(\w+)", r"\1", outer_sel, re.IGNORECASE)
            if outer_pred:
                outer_pred = _sub_outside_literals(
                    rf"\b{a}\s*\.\s*(\w+)", r"\1", outer_pred,
                    re.IGNORECASE)
        inner_sql = _expand_subquery_stars(eng, inner)
    else:
        chain = _parse_aliased_chain(rest)
        if chain is None or any(t not in eng.tables and t not in eng.views
                                for t, _, _ in chain):
            raise _UnloweredShape(rest)
        alias_of = {a: t for t, a, _ in chain}
        alias_for = {t: a for t, a, _ in chain}
        cols_of = {t: set(c.lower() for c in _source_rows0(eng, t).columns)
                   for t, _, _ in chain}
        scan = re.sub(r"'[^']*'", " ", outer_sel
                      + (" " + outer_pred if outer_pred else ""))
        srcs: dict[str, str] = {}      # bare output col -> qualified src

        def _claim(bare: str, src: str):
            if srcs.setdefault(bare, src) != src:
                raise _UnloweredShape(f"ambiguous column {bare}")

        qual_re = r"\b([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\b"
        for qm in re.finditer(qual_re, scan):
            a, b = qm.group(1).lower(), qm.group(2).lower()
            if a not in alias_of:
                raise _UnloweredShape(f"unknown qualifier {a}")
            _claim(b, f"{a}.{b}")
        for bm in re.finditer(r"\b([A-Za-z_]\w*)\b(?!\s*[(.])", scan):
            b = bm.group(1).lower()
            pre = scan[:bm.start()].rstrip()
            if b in _SQL_KEYWORDS or b in srcs or pre.endswith("."):
                continue
            owners = [t for t in cols_of if b in cols_of[t]]
            if len(owners) > 1:
                raise _UnloweredShape(f"ambiguous column {b}")
            if owners:
                _claim(b, f"{alias_for[owners[0]]}.{b}")
        if not srcs:
            raise _UnloweredShape("no column references resolved")
        inner_sql = ("SELECT " + ", ".join(
            f"{src} AS {bare}" for bare, src in srcs.items())
            + " FROM " + rest)
        # outer references become the hidden view's bare columns
        outer_sel = _sub_outside_literals(qual_re, r"\2", outer_sel)
        if outer_pred:
            outer_pred = _sub_outside_literals(qual_re, r"\2", outer_pred)

    hidden = f"__{name}_src"
    inner_m = _lower_view(eng, hidden, inner_sql)
    if inner_m.kind == "differentiate":
        raise _UnloweredShape(
            f"FROM clause itself only snapshot-diffs: {inner_sql}")
    eng._maintainers[hidden] = inner_m
    words = {w.lower() for w in re.findall(r"\b\w+\b", inner_sql)}
    eng._sources[hidden] = {w for w in words
                            if w in eng.tables or w in eng.views}
    inner_m.state.current.rows().createOrReplaceTempView(hidden)
    try:
        outer_sql = f"SELECT {outer_sel} FROM {hidden}" + (
            f" WHERE {outer_pred}" if outer_pred else "")
        pm = _PROJECT_RE.match(outer_sql)
        if pm is None:
            raise _UnloweredShape(outer_sql)
        try:
            return _RollingWindowMaintainer(eng, name, outer_sql, pm)
        except Exception:
            # frame-bounded rolling didn't fit (LAG/ROWS/calendar
            # intervals over the join): touched-partition recompute of
            # the hidden view still beats snapshot-diffing the join
            try:
                return _PartitionWindowMaintainer(eng, name, outer_sql, pm)
            except Exception:
                # no PARTITION BY: global tail recompute over the join
                return _GlobalTailWindowMaintainer(eng, name, outer_sql, pm)
    except Exception:
        # prefix-sweep: _lower_view may have registered __{hidden}_dup
        # chain clones for the hidden join view too
        _cleanup_hidden(eng, [hidden])
        raise


#: scalar-aggregate subquery body (the text inside its parentheses);
#: ``post`` is an optional literal scale on the aggregate (TPC-H q11's
#: ``SELECT SUM(…) * 0.0001 FROM …``) — applied OUTSIDE the hidden agg
#: view so the view keeps the recognizers' canonical FN(arg) shape
_SCALAR_SQ_INNER = re.compile(
    r"^\s*SELECT\s+(?P<fn>SUM|COUNT|AVG|MIN|MAX)\s*"
    r"\(\s*(?P<arg>\*|[^()]+?)\s*\)"
    r"(?P<post>\s*[*/]\s*\d+(?:\.\d+)?(?:[eE]-?\d+)?)?\s+"
    r"FROM\s+(?P<it>\w+)(?:\s+(?:AS\s+)?(?!WHERE\b)(?P<ia>\w+))?"
    r"(?:\s+WHERE\s+(?P<icond>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL)

#: same, but the subquery's FROM is a JOIN chain (TPC-H q2)
_SCALAR_SQ_INNER_CHAIN = re.compile(
    r"^\s*SELECT\s+(?P<fn>SUM|COUNT|AVG|MIN|MAX)\s*"
    r"\(\s*(?P<arg>\*|[^()]+?)\s*\)"
    r"(?P<post>\s*[*/]\s*\d+(?:\.\d+)?(?:[eE]-?\d+)?)?\s+"
    r"FROM\s+(?P<from>\w+(?:\s+\w+)?(?:\s+(?:LEFT\s+(?:OUTER\s+)?)?"
    r"JOIN\s+.+?)+)"
    r"(?:\s+WHERE\s+(?P<icond>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL)


def _scalar_sq_spans(text: str) -> list[tuple[int, int]]:
    """Balanced ``( SELECT … )`` spans in *text*, outermost only,
    skipping single-quoted string literals.  Returns [(start, end)) —
    end is one past the closing paren."""
    spans, i, n, in_str = [], 0, len(text), False
    while i < n:
        ch = text[i]
        if ch == "'":
            in_str = not in_str
            i += 1
            continue
        if not in_str and ch == "(" \
                and re.match(r"\(\s*SELECT\b", text[i:], re.IGNORECASE):
            j = _match_paren(text, i)
            if j < 0:
                raise _UnloweredShape("unbalanced subquery parens")
            spans.append((i, j + 1))
            i = j + 1
            continue
        i += 1
    return spans


def _scalar_sq_join_src(eng: "Engine", name: str, body: str, sel: str,
                        pred: str | None, register,
                        extras: list | None = None) -> tuple:
    """JOIN-chain outer FROM for a scalar-subquery view: synthesize a
    hidden maintained view ``__{name}_src`` carrying every column the
    outer select/WHERE/correlation terms reference (the
    `_rolling_over_from` claims discipline), rewrite chain-alias
    references — including correlation refs INSIDE the subquery spans —
    to the hidden view's alias ``o0``, and return the rewritten pieces
    for the ordinary single-table path to lower.  TPC-H q17's
    ``FROM lineitem JOIN part WHERE … l_quantity < 0.2 * (SELECT
    AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)``
    lowers this way: join view → per-partkey AVG view → left join →
    filtered projection, all O(Δ) maintained."""
    chain = _parse_aliased_chain(body)
    # hidden synthesized views (e.g. a CTE's __{name}_cte_{a}) are valid
    # chain legs: their per-tick deltas flow through `combined` exactly
    # like table deltas
    if chain is None or any(t not in eng.tables and t not in eng.views
                            and t not in eng._maintainers
                            for t, _, _ in chain):
        raise _UnloweredShape(body)
    alias_of = {a: t for t, a, _ in chain}
    alias_for = {t: a for t, a, _ in chain}
    cols_of = {t: {c.lower() for c in _source_rows0(eng, t).columns}
               for t, _, _ in chain}
    qual_re = r"\b([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\b"

    # scan text for the claims pass: the outer select + WHERE, with each
    # subquery span reduced to ONLY its chain-qualified correlation refs
    # (the span's inner alias/table tokens must not leak into claims)
    pieces = []
    for text in [sel] + ([pred] if pred else []) + list(extras or []):
        last = 0
        for a, b in _scalar_sq_spans(text):
            pieces.append(text[last:a])
            span = text[a + 1:b - 1]
            sm = _SCALAR_SQ_INNER.match(span)
            if sm is not None:
                inner_aliases = {(sm.group("ia")
                                  or sm.group("it")).lower()}
            else:
                cm = _SCALAR_SQ_INNER_CHAIN.match(span)
                if cm is None:
                    raise _UnloweredShape(span)
                ichain = _parse_aliased_chain(cm.group("from"))
                if ichain is None:
                    raise _UnloweredShape(cm.group("from"))
                inner_aliases = {ali for _, ali, _ in ichain}
                sm = cm
            if inner_aliases & set(alias_of):
                # a shadowed alias would make the o0-requalification
                # rewrite inner-scoped refs — refuse UNLESS the span
                # carries no qualified refs under any outer alias (the
                # TPC-H q15 shape: the same view is an outer chain leg
                # AND the inner table of an uncorrelated scalar, all its
                # inner refs bare — nothing for _requal to corrupt)
                span_quals = {qm.group(1).lower()
                              for qm in re.finditer(qual_re, span)}
                if span_quals & set(alias_of):
                    raise _UnloweredShape("subquery alias shadows outer")
            for qm in re.finditer(qual_re, sm.group("icond") or ""):
                if qm.group(1).lower() not in inner_aliases:
                    pieces.append(" " + qm.group(0) + " ")
            last = b
        pieces.append(text[last:])
    scan = re.sub(r"'[^']*'", " ", " ".join(pieces))

    srcs: dict[str, str] = {}      # bare output col -> qualified source

    def _claim(bare: str, src: str):
        if srcs.setdefault(bare, src) != src:
            raise _UnloweredShape(f"ambiguous column {bare}")

    for qm in re.finditer(qual_re, scan):
        a, b = qm.group(1).lower(), qm.group(2).lower()
        if a not in alias_of:
            raise _UnloweredShape(f"unknown qualifier {a}")
        _claim(b, f"{a}.{b}")
    for bm in re.finditer(r"\b([A-Za-z_]\w*)\b(?!\s*[(.])", scan):
        b = bm.group(1).lower()
        pre = scan[:bm.start()].rstrip()
        if b in _SQL_KEYWORDS or b in srcs or pre.endswith("."):
            continue
        owners = [t for t in cols_of if b in cols_of[t]]
        if len(owners) > 1:
            raise _UnloweredShape(f"ambiguous column {b}")
        if owners:
            _claim(b, f"{alias_for[owners[0]]}.{b}")
    if not srcs:
        raise _UnloweredShape("no column references resolved")

    hidden = f"__{name}_src"
    register(hidden, "SELECT " + ", ".join(
        f"{src} AS {bare}" for bare, src in srcs.items())
        + " FROM " + body)

    # every chain-alias-qualified ref (outer text AND inside subquery
    # spans) now reads the hidden view through alias o0; bare refs are
    # already the hidden view's bare columns
    def _requal(m):
        return (f"o0.{m.group(2)}" if m.group(1).lower() in alias_of
                else m.group(0))

    sel = _sub_outside_literals(qual_re, _requal, sel)
    if pred:
        pred = _sub_outside_literals(qual_re, _requal, pred)
    if extras is not None:
        return hidden, "o0", sel, pred, [
            _sub_outside_literals(qual_re, _requal, x) for x in extras]
    return hidden, "o0", sel, pred


def _scalar_subquery_from(eng: "Engine", name: str, flat: str):
    """Scalar-aggregate subqueries anywhere in the select list or WHERE
    clause of a single-table SELECT — correlated
    (``(SELECT MAX(x) FROM t2 WHERE t2.k = t.k)``) or uncorrelated
    (``(SELECT AVG(x) FROM t2)``) — lowered as a stack of views that
    all maintain incrementally (the reference compiles the same shape
    to an aggregate + outer join pair, SURVEY §2.4/§2.5):

    * one hidden GROUP BY view per subquery (``__{name}_sq{i}``) —
      keyed on the correlation column, or on a constant ``__ck`` (via a
      hidden projection ``__{name}_c{i}`` that stamps it) when
      uncorrelated → linear / touched-group agg maintenance;
    * one hidden LEFT JOIN view per subquery chaining the scalar column
      onto the outer rows (touched-key outer-join maintenance);
    * the view itself becomes a plain projection (+ residual WHERE for
      predicates that mention a subquery, e.g. TPC-H q17's
      ``l_quantity < 0.2 * (SELECT AVG(…) …)``) over the last join,
      with ``COUNT`` subqueries wrapped in ``COALESCE(…, 0)`` (a scalar
      COUNT over an empty group is 0, not the NULL a left join pads).
      Subquery-free WHERE terms are pushed below the join stack.

    Empty/never-matching groups fall out correctly: the left join pads
    NULL (0 for COUNT), so select items carry SQL's NULL scalar and
    WHERE comparisons against it are UNKNOWN → row filtered — exactly
    DuckDB's one-shot semantics.  Raises :class:`_UnloweredShape` for
    non-aggregate scalars and disjunctive or non-equi correlation.

    A JOIN-chain outer FROM (TPC-H q17's ``lineitem JOIN part``)
    synthesizes a hidden maintained view ``__{name}_src`` for the join
    (the `_rolling_over_from` pattern) and layers the subquery stack on
    top — correlation terms inside the subqueries may reference any
    chain alias."""
    parts = _split_select_from(flat)
    if parts is None:
        raise _UnloweredShape(flat)
    sel, rest = parts
    body, pred = _split_where(rest)

    registered: list[str] = []

    def _register(hname: str, hsql: str) -> None:
        _register_hidden(eng, hname, hsql, registered)

    def _fail_cleanup():
        _cleanup_hidden(eng, registered)

    om = re.match(r"^(?P<ot>\w+)(?:\s+(?:AS\s+)?(?P<oa>\w+))?\s*$", body)
    try:
        if om is not None and (om.group("ot").lower() in eng.tables
                               or om.group("ot").lower() in eng.views):
            ot = om.group("ot").lower()
            oa = (om.group("oa") or om.group("ot")).lower()
        else:
            ot, oa, sel, pred = _scalar_sq_join_src(
                eng, name, body, sel, pred, _register)
    except Exception:
        _fail_cleanup()
        raise
    ocols = {f.name.lower() for f in _source_rows0(eng, ot).schema.fields}
    if "__ck" in ocols:
        _fail_cleanup()
        raise _UnloweredShape("outer column __ck collides")

    subs: list[dict] = []          # parsed scalar subqueries, in order

    def _parse_sq(inner: str) -> int:
        """Parse one subquery body; append to *subs*; return its index."""
        sm = _SCALAR_SQ_INNER.match(inner)
        if sm is None:
            return _parse_sq_chain(inner)
        i = len(subs)
        itbl = sm.group("it").lower()
        ia = (sm.group("ia") or sm.group("it")).lower()
        # hidden maintained views (CTE hoists) are valid inner sources
        if not (itbl in eng.tables or itbl in eng.views
                or itbl in eng._maintainers):
            raise _UnloweredShape(itbl)
        icols = {f.name.lower()
                 for f in _source_rows0(eng, itbl).schema.fields}
        oks, iks = [], []          # composite equi-correlation (q20)
        residual = []
        if _mixed_top_and_or(sm.group("icond") or ""):
            raise _UnloweredShape("mixed top-level AND/OR in subquery")

        def _side(tok: str) -> tuple[str, str] | None:
            """Resolve one equality operand to ('inner'|'outer', col) —
            qualified by either alias, or bare with SQL scoping (an
            inner-owned name resolves inner; only a name absent from
            the inner can reach out to the outer row) — the same
            attribution the EXISTS matcher uses (r9: verbatim bare
            correlations like ``l_orderkey = o_orderkey`` in
            SELECT-list scalars)."""
            tok = tok.strip()
            if "." in tok:
                q, c = tok.split(".", 1)
                q, c = q.lower(), c.lower()
                if q == ia and c in icols:
                    return ("inner", c)
                if q == oa and q != ia and c in ocols:
                    return ("outer", c)
                return None
            c = tok.lower()
            if c in icols:
                return ("inner", c)
            if c in ocols:
                return ("outer", c)
            return None

        for term in _split_top_and(sm.group("icond") or ""):
            em = re.match(r"^([A-Za-z_][\w.]*)\s*=\s*([A-Za-z_][\w.]*)$",
                          term.strip())
            if em:
                s1, s2 = _side(em.group(1)), _side(em.group(2))
                if s1 and s2 and {s1[0], s2[0]} == {"inner", "outer"}:
                    inn, out = (s1, s2) if s1[0] == "inner" else (s2, s1)
                    if inn[1] in [k.lower() for k in iks]:
                        raise _UnloweredShape(f"correlation term: {term}")
                    oks.append(out[1])
                    iks.append(inn[1])
                    continue
            if not _refs_only(term, {ia}, icols):
                raise _UnloweredShape(f"correlation term: {term}")
            residual.append(term)
        fn = sm.group("fn").upper()
        arg = sm.group("arg")
        if arg != "*" and not _refs_only(arg, {ia}, icols):
            raise _UnloweredShape(f"subquery arg refs outer: {arg}")
        # the hidden view keeps the agg recognizers' canonical shape:
        # bare key, no table alias (key AS alias wouldn't match)
        deal_i = lambda t: _sub_outside_literals(
            rf"\b{ia}\s*\.\s*", "", t, re.IGNORECASE)
        res = (" WHERE " + " AND ".join(deal_i(t) for t in residual)
               if residual else "")
        post = " ".join((sm.group("post") or "").split())
        if oks:
            sq_sql = (f"SELECT {', '.join(iks)}, {fn}({deal_i(arg)}) "
                      f"AS __sv{i} FROM {itbl}{res} "
                      f"GROUP BY {', '.join(iks)}")
            subs.append({"sq": sq_sql, "oks": oks, "iks": iks, "fn": fn,
                         "pre": [], "post": post})
        else:
            # uncorrelated: a hidden projection stamps a constant key
            # so the existing grouped-agg + equi-join maintainers carry
            # the single scalar row (broadcast-sized at any scale)
            if "__ck" in icols:
                raise _UnloweredShape("inner column __ck collides")
            inner_cols = list(_source_rows0(eng, itbl).columns)
            c_sql = (f"SELECT 1 AS __ck, "
                     + ", ".join(deal_i(c) for c in inner_cols)
                     + f" FROM {itbl}{res}")
            sq_sql = (f"SELECT __ck, {fn}({deal_i(arg)}) AS __sv{i} "
                      f"FROM __{name}_c{i} GROUP BY __ck")
            subs.append({"sq": sq_sql, "oks": ["__ck"], "iks": ["__ck"],
                         "fn": fn, "pre": [(f"__{name}_c{i}", c_sql)],
                         "post": post})
        return i

    def _parse_sq_chain(inner: str) -> int:
        """Subquery whose own FROM is a JOIN chain (TPC-H q2's
        ``(SELECT MIN(ps.cost) FROM partsupp ps JOIN supplier s ON …
        JOIN nation n ON … WHERE ps.pk = p.pk AND …)``): synthesize a
        hidden maintained view ``__{name}_i{i}`` for the inner join —
        carrying only the claimed columns, with the inner-only residual
        WHERE pushed INTO it — and aggregate over that."""
        cm = _SCALAR_SQ_INNER_CHAIN.match(inner)
        if cm is None:
            raise _UnloweredShape(f"unsupported subquery: {inner}")
        i = len(subs)
        chain = _parse_aliased_chain(cm.group("from"))
        if chain is None or any(
                t not in eng.tables and t not in eng.views
                for t, _, _ in chain):
            raise _UnloweredShape(cm.group("from"))
        alias_of = {a: t for t, a, _ in chain}
        alias_for = {t: a for t, a, _ in chain}
        if oa in alias_of:
            raise _UnloweredShape("outer alias shadowed in subquery")
        cols_of = {t: {c.lower() for c in _source_rows0(eng, t).columns}
                   for t, _, _ in chain}
        oks, ikq = [], []          # ikq: (inner alias, col) pairs
        residual = []
        if _mixed_top_and_or(cm.group("icond") or ""):
            raise _UnloweredShape("mixed top-level AND/OR in subquery")
        def _chain_side(tok: str):
            """('inner', alias, col) / ('outer', None, col) / None —
            qualified by a chain alias or the outer alias, or bare with
            SQL scoping (a chain-owned name resolves inner when exactly
            ONE leg owns it; only a name no leg owns reaches out) —
            r9: verbatim bare correlations in chain-FROM subqueries."""
            tok = tok.strip()
            if "." in tok:
                q, c = tok.split(".", 1)
                q, c = q.lower(), c.lower()
                if q in alias_of and c in cols_of[alias_of[q]]:
                    return ("inner", q, c)
                if q == oa and c in ocols:
                    return ("outer", None, c)
                return None
            c = tok.lower()
            owners = [t for t in cols_of if c in cols_of[t]]
            if len(owners) == 1:
                return ("inner", alias_for[owners[0]], c)
            if owners:
                return None            # ambiguous across legs — refuse
            if c in ocols:
                return ("outer", None, c)
            return None

        for term in _split_top_and(cm.group("icond") or ""):
            em = re.match(r"^([A-Za-z_][\w.]*)\s*=\s*([A-Za-z_][\w.]*)$",
                          term.strip())
            if em:
                s1, s2 = _chain_side(em.group(1)), _chain_side(em.group(2))
                if s1 and s2 and {s1[0], s2[0]} == {"inner", "outer"}:
                    inn, out = (s1, s2) if s1[0] == "inner" else (s2, s1)
                    oks.append(out[2])
                    ikq.append((inn[1], inn[2]))
                    continue
            if not _refs_only(term, set(alias_of),
                              set().union(*cols_of.values())):
                raise _UnloweredShape(f"correlation term: {term}")
            residual.append(term)
        arg = cm.group("arg")
        if any(ok.lower() not in ocols for ok in oks):
            raise _UnloweredShape("correlation col not in outer")
        if arg != "*" and not _refs_only(arg, set(alias_of),
                                         set().union(*cols_of.values())):
            raise _UnloweredShape(f"subquery arg refs outer: {arg}")
        # claims pass over arg + residual + correlation inner cols — the
        # hidden inner view carries exactly these, bare-named
        qual_re = r"\b([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\b"
        scan = re.sub(r"'[^']*'", " ", " ".join(
            ([arg] if arg != "*" else []) + residual
            + [f"{q}.{c}" for q, c in ikq]))
        srcs: dict[str, str] = {}

        def _claim(bare: str, src: str):
            if srcs.setdefault(bare, src) != src:
                raise _UnloweredShape(f"ambiguous column {bare}")

        for qm in re.finditer(qual_re, scan):
            a, b = qm.group(1).lower(), qm.group(2).lower()
            if a not in alias_of:
                raise _UnloweredShape(f"unknown qualifier {a}")
            _claim(b, f"{a}.{b}")
        for bm in re.finditer(r"\b([A-Za-z_]\w*)\b(?!\s*[(.])", scan):
            b = bm.group(1).lower()
            pre_txt = scan[:bm.start()].rstrip()
            if b in _SQL_KEYWORDS or b in srcs or pre_txt.endswith("."):
                continue
            owners = [t for t in cols_of if b in cols_of[t]]
            if len(owners) > 1:
                raise _UnloweredShape(f"ambiguous column {b}")
            if owners:
                _claim(b, f"{alias_for[owners[0]]}.{b}")
        if not srcs or "__ck" in srcs:
            raise _UnloweredShape("no/colliding inner columns")
        iks = [c for _, c in ikq]
        if len({k.lower() for k in iks}) != len(iks):
            raise _UnloweredShape("duplicate inner correlation column")
        # arg == '*' claims nothing; COUNT(*) over the join still needs
        # ≥1 carried column, which the correlation/residual provide
        fn = cm.group("fn").upper()
        post = " ".join((cm.group("post") or "").split())
        res = " WHERE " + " AND ".join(residual) if residual else ""
        deal_c = lambda t: _sub_outside_literals(
            qual_re,
            lambda m: (m.group(2) if m.group(1).lower() in alias_of
                       else m.group(0)), t)
        iname = f"__{name}_i{i}"
        ck = "" if oks else "1 AS __ck, "
        i_sql = (f"SELECT {ck}" + ", ".join(
            f"{src} AS {bare}" for bare, src in srcs.items())
            + f" FROM {cm.group('from')}{res}")
        if oks:
            sq_sql = (f"SELECT {', '.join(iks)}, {fn}({deal_c(arg)}) "
                      f"AS __sv{i} FROM {iname} "
                      f"GROUP BY {', '.join(iks)}")
            subs.append({"sq": sq_sql, "oks": oks, "iks": iks, "fn": fn,
                         "pre": [(iname, i_sql)], "post": post})
        else:
            sq_sql = (f"SELECT __ck, {fn}({deal_c(arg)}) AS __sv{i} "
                      f"FROM {iname} GROUP BY __ck")
            subs.append({"sq": sq_sql, "oks": ["__ck"], "iks": ["__ck"],
                         "fn": fn, "pre": [(iname, i_sql)], "post": post})
        return i

    def _rewrite(text: str) -> str:
        """Replace every scalar-subquery span with its __sv column."""
        out, last = [], 0
        for a, b in _scalar_sq_spans(text):
            i = _parse_sq(text[a + 1:b - 1])
            val = (f"COALESCE(__sv{i}, 0)" if subs[i]["fn"] == "COUNT"
                   else f"__sv{i}")
            if subs[i]["post"]:
                val = f"({val} {subs[i]['post']})"
            out.append(text[last:a])
            out.append(val)
            last = b
        out.append(text[last:])
        return "".join(out)

    try:
        new_sel = _rewrite(sel)
        pushable: list[str] = []   # subquery-free WHERE → below joins
        post: list[str] = []       # WHERE terms with a __sv → on top
        filters: list[str] = []    # [NOT] EXISTS / IN terms, verbatim
        if pred:
            if _mixed_top_and_or(pred):
                raise _UnloweredShape("mixed top-level AND/OR in WHERE")
            for term in _split_top_and(pred):
                if not _scalar_sq_spans(term):
                    pushable.append(term)
                elif (_EXISTS_TERM.match(term)
                      or _IN_TERM.match(term)):
                    # TPC-H q22: a [NOT] EXISTS lives beside the scalar
                    # terms — keep it verbatim (outer refs still
                    # qualified) for the FINAL view, which lowers via
                    # the subquery-filter maintainer over the join stack
                    filters.append(term)
                else:
                    post.append(_rewrite(term))
        if not subs:
            raise _UnloweredShape("no scalar subquery items")
    except Exception:
        _fail_cleanup()
        raise

    dealias = lambda t: _sub_outside_literals(rf"\b{oa}\s*\.\s*", "", t,
                                              re.IGNORECASE)
    need_ck = any(s["iks"] == ["__ck"] for s in subs)
    try:
        cur, cur_cols = ot, list(_source_rows0(eng, ot).columns)
        if pushable or need_ck:
            # push the subquery-free WHERE terms below the join stack —
            # every hidden join then carries only qualifying rows (the
            # 100 TB version of predicate pushdown across the view
            # stack); the same bootstrap stamps __ck when an
            # uncorrelated subquery needs the constant join key
            f_sel = (", ".join(cur_cols)
                     + (", 1 AS __ck" if need_ck else ""))
            f_pred = (" WHERE " + dealias(" AND ".join(pushable))
                      if pushable else "")
            _register(f"__{name}_f0",
                      f"SELECT {f_sel} FROM {ot}{f_pred}")
            cur = f"__{name}_f0"
            if need_ck:
                cur_cols = cur_cols + ["__ck"]
        for i, sub in enumerate(subs):
            for pname, psql in sub["pre"]:
                _register(pname, psql)
            _register(f"__{name}_sq{i}", sub["sq"])
            jname = f"__{name}_j{i}"
            j_sel = (", ".join(f"p.{c} AS {c}" for c in cur_cols)
                     + "".join(f", p.__sv{k} AS __sv{k}"
                               for k in range(i))
                     + f", s.__sv{i} AS __sv{i}")
            j_cond = " AND ".join(
                f"p.{ok} = s.{ik}"
                for ok, ik in zip(sub["oks"], sub["iks"]))
            j_sql = (f"SELECT {j_sel} FROM {cur} p LEFT JOIN "
                     f"__{name}_sq{i} s ON {j_cond}")
            _register(jname, j_sql)
            cur = jname
        if filters:
            # the [NOT] EXISTS / IN terms need their qualified outer
            # refs intact, so the final view keeps the ORIGINAL outer
            # alias on the join stack and skips dealiasing — it lowers
            # through the subquery-filter maintainer
            where = " AND ".join(post + filters)
            final = f"SELECT {new_sel} FROM {cur} {oa} WHERE {where}"
        else:
            final = f"SELECT {dealias(new_sel)} FROM {cur}"
            if post:
                final += f" WHERE {dealias(' AND '.join(post))}"
        fm = _lower_view(eng, name, final)
        if fm.kind == "differentiate":
            raise _UnloweredShape(f"final projection snapshot-diffs: "
                                  f"{final}")
        return fm
    except Exception:
        _fail_cleanup()
        raise


def _top_level_having(flat: str) -> int:
    """Position of a top-level ``HAVING`` keyword, or -1 (shared
    ``_top_mask`` scan)."""
    return _find_top_kw(flat, ("HAVING",))


def _scalar_having_from(eng: "Engine", name: str, flat: str):
    """Scalar-aggregate subqueries in a HAVING clause — TPC-H q11's
    ``GROUP BY ps_partkey HAVING SUM(cost*qty) > (SELECT SUM(cost*qty)
    * 0.0001 FROM partsupp)`` — lowered as:

    * ``__{name}_g``: the grouped view WITHOUT the HAVING (ordinary
      linear/touched-group agg maintenance);
    * one constant-key hidden projection + global-agg view per
      (uncorrelated) subquery, LEFT-JOINed onto the groups;
    * the view itself: an O(Δ) projection filtering on the rewritten
      HAVING, with each aggregate expression replaced by its select
      alias (SQL lets HAVING repeat the aggregate text) and each
      subquery by its ``__sv{i}`` column (× the literal scale, kept
      outside the hidden view so it stays recognizer-canonical).

    Correlated HAVING subqueries and aggregates that appear only in
    HAVING raise :class:`_UnloweredShape` (the latter could absorb as
    hidden partials someday; q11 doesn't need it)."""
    hpos = _top_level_having(flat)
    if hpos < 0:
        raise _UnloweredShape("no HAVING")
    g_sql, hpred = flat[:hpos].strip(), flat[hpos + 6:].strip()
    if not _scalar_sq_spans(hpred):
        raise _UnloweredShape("no subquery in HAVING")
    if not re.search(r"\bGROUP\s+BY\b", g_sql, re.IGNORECASE):
        raise _UnloweredShape("HAVING without GROUP BY")
    parts = _split_select_from(g_sql)
    if parts is None:
        raise _UnloweredShape(g_sql)
    out_names, alias_map = [], []
    for it in (i.strip() for i in _split_top_level(parts[0])):
        am = re.match(r"^(?P<expr>.+?)\s+AS\s+(?P<al>\w+)$", it,
                      re.IGNORECASE | re.DOTALL)
        if am:
            out_names.append(am.group("al"))
            alias_map.append((am.group("expr"), am.group("al")))
        elif re.match(r"^[\w.]+$", it):
            out_names.append(it.split(".")[-1])
        else:
            raise _UnloweredShape(f"unaliased select item: {it}")

    registered: list[str] = []

    def _register(hname: str, hsql: str) -> None:
        _register_hidden(eng, hname, hsql, registered)

    subs: list[dict] = []

    def _parse_sq(inner: str) -> int:
        sm = _SCALAR_SQ_INNER.match(inner)
        if sm is None:
            raise _UnloweredShape(f"unsupported subquery: {inner}")
        i = len(subs)
        itbl = sm.group("it").lower()
        ia = (sm.group("ia") or sm.group("it")).lower()
        if not (itbl in eng.tables or itbl in eng.views):
            raise _UnloweredShape(itbl)
        icols = {f.name.lower()
                 for f in _source_rows0(eng, itbl).schema.fields}
        if "__ck" in icols:
            raise _UnloweredShape("inner column __ck collides")
        if _mixed_top_and_or(sm.group("icond") or ""):
            raise _UnloweredShape("mixed top-level AND/OR in subquery")
        for term in _split_top_and(sm.group("icond") or ""):
            if not _refs_only(term, {ia}, icols):
                raise _UnloweredShape(
                    f"correlated HAVING subquery: {term}")
        arg = sm.group("arg")
        if arg != "*" and not _refs_only(arg, {ia}, icols):
            raise _UnloweredShape(f"subquery arg refs outer: {arg}")
        deal_i = lambda t: _sub_outside_literals(
            rf"\b{ia}\s*\.\s*", "", t, re.IGNORECASE)
        res = (" WHERE " + " AND ".join(
            deal_i(t) for t in _split_top_and(sm.group("icond") or ""))
            if sm.group("icond") else "")
        inner_cols = list(_source_rows0(eng, itbl).columns)
        fn = sm.group("fn").upper()
        subs.append({
            "c": (f"SELECT 1 AS __ck, "
                  + ", ".join(deal_i(c) for c in inner_cols)
                  + f" FROM {itbl}{res}"),
            "sq": (f"SELECT __ck, {fn}({deal_i(arg)}) AS __sv{i} "
                   f"FROM __{name}_c{i} GROUP BY __ck"),
            "fn": fn,
            "post": " ".join((sm.group("post") or "").split())})
        return i

    out, last = [], 0
    for a, b in _scalar_sq_spans(hpred):
        i = _parse_sq(hpred[a + 1:b - 1])
        val = (f"COALESCE(__sv{i}, 0)" if subs[i]["fn"] == "COUNT"
               else f"__sv{i}")
        if subs[i]["post"]:
            val = f"({val} {subs[i]['post']})"
        out.append(hpred[last:a])
        out.append(val)
        last = b
    out.append(hpred[last:])
    hpred = "".join(out)
    # aggregate expressions repeat their select-item text in HAVING —
    # rewrite to the output alias (literal-safe segments, the
    # _rewrite_having discipline)
    segments = re.split(r"('(?:[^']*)')", hpred)
    for expr_text, al in alias_map:
        # Only aggregate-call expressions repeat in HAVING (the
        # _rewrite_having discipline); rewriting short key aliases like
        # `x AS a` would hit substrings of longer identifiers.
        if not re.match(r"^(SUM|COUNT|AVG|MIN|MAX)\s*\(", expr_text,
                        re.IGNORECASE):
            continue
        flat_expr = re.sub(r"\s+", "", expr_text)
        pat = r"\s*".join(re.escape(c) for c in flat_expr)
        # Word-boundary anchors, but only where the edge char is a word
        # char (a leading \b before '(' or after ')' would invert).
        if flat_expr[0].isalnum() or flat_expr[0] == "_":
            pat = r"\b" + pat
        if flat_expr[-1].isalnum() or flat_expr[-1] == "_":
            pat += r"\b"
        segments = [seg if seg.startswith("'")
                    else re.sub(pat, al, seg, flags=re.IGNORECASE)
                    for seg in segments]
    hpred = "".join(segments)
    if re.search(r"\b(SUM|COUNT|AVG|MIN|MAX)\s*\(", hpred, re.IGNORECASE):
        raise _UnloweredShape(f"HAVING aggregate not in select: {hpred}")

    try:
        _register(f"__{name}_g", g_sql)
        _register(f"__{name}_f0",
                  f"SELECT {', '.join(out_names)}, 1 AS __ck "
                  f"FROM __{name}_g")
        cur, cur_cols = f"__{name}_f0", out_names + ["__ck"]
        for i, sub in enumerate(subs):
            _register(f"__{name}_c{i}", sub["c"])
            _register(f"__{name}_sq{i}", sub["sq"])
            j_sel = (", ".join(f"p.{c} AS {c}" for c in cur_cols)
                     + "".join(f", p.__sv{k} AS __sv{k}"
                               for k in range(i))
                     + f", s.__sv{i} AS __sv{i}")
            _register(f"__{name}_j{i}",
                      f"SELECT {j_sel} FROM {cur} p LEFT JOIN "
                      f"__{name}_sq{i} s ON p.__ck = s.__ck")
            cur = f"__{name}_j{i}"
        final = (f"SELECT {', '.join(out_names)} FROM {cur} "
                 f"WHERE {hpred}")
        fm = _lower_view(eng, name, final)
        if fm.kind == "differentiate":
            raise _UnloweredShape(f"final projection snapshot-diffs: "
                                  f"{final}")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


#: SELECT … FROM a LEFT|RIGHT|FULL [OUTER] JOIN b ON cond [WHERE p]
_LEFT_JOIN_RE = re.compile(
    r"^SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<lt>\w+)(?:\s+(?:AS\s+)?"
    r"(?P<la>\w+))?\s+(?P<kind>LEFT|RIGHT|FULL)\s+(?:OUTER\s+)?JOIN\s+"
    r"(?P<rt>\w+)(?:\s+(?:AS\s+)?(?P<ra>\w+))?"
    r"\s+ON\s+(?P<cond>.+?)(?:\s+WHERE\s+(?P<pred>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL)

_LEFT_JOIN_BLOCKERS = re.compile(
    r"\b(GROUP\s+BY|DISTINCT|UNION|INTERSECT|EXCEPT|OVER|HAVING"
    r"|ORDER\s+BY|LIMIT|CROSS)\b|\(\s*SELECT", re.IGNORECASE)

_EQ_PAIR = re.compile(r"^(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)$")


def _parse_equi_cond(cond: str, lquals: set[str], rquals: set[str],
                     lcols: set[str] | None = None,
                     rcols: set[str] | None = None,
                     ) -> list[tuple[str, str]] | None:
    """Parse a pure conjunction of column equalities into (left_col,
    right_col) pairs; None for anything else (θ-join terms) — those
    shapes keep the snapshot-diff fallback.  With ``lcols``/``rcols``
    schemas supplied, BARE operands attribute to the side that UNIQUELY
    owns the name (r9: verbatim `ON o_orderkey = l_orderkey` left-join
    texts); without them only qualified pairs are accepted."""
    def _side(tok: str) -> tuple[str, str] | None:
        tok = tok.strip()
        if "." in tok:
            q, c = tok.split(".", 1)
            if q.lower() in lquals:
                return ("l", c)
            if q.lower() in rquals:
                return ("r", c)
            return None
        if lcols is None or rcols is None:
            return None
        c = tok.lower()
        inl, inr = c in lcols, c in rcols
        if inl and not inr:
            return ("l", tok)
        if inr and not inl:
            return ("r", tok)
        return None                    # absent or ambiguous

    pairs = []
    for term in re.split(r"\bAND\b", cond, flags=re.IGNORECASE):
        m = re.match(r"^([A-Za-z_][\w.]*)\s*=\s*([A-Za-z_][\w.]*)$",
                     term.strip())
        if not m:
            return None
        s1, s2 = _side(m.group(1)), _side(m.group(2))
        if s1 is None or s2 is None or {s1[0], s2[0]} != {"l", "r"}:
            return None
        lc, rc = (s1[1], s2[1]) if s1[0] == "l" else (s2[1], s1[1])
        pairs.append((lc, rc))
    return pairs or None


class _UnloweredShape(Exception):
    """Raised when a recognized statement's fine shape can't be lowered
    after all (falls back to snapshot-diff)."""


def _register_hidden(eng: "Engine", hname: str, hsql: str,
                     registered: list) -> None:
    """Lower ``hsql`` and register it as the hidden maintained view
    ``hname`` — the shared registration step of every composition pass
    (scalar-subquery stacks, top-k bodies, filtered-join aggregates).
    ``hname`` is recorded in ``registered`` BEFORE lowering, so a
    failure mid-stage still lets :func:`_cleanup_hidden` sweep any
    dependents ``_lower_view`` itself registered (``__{hname}_dup{i}``
    chain clones) — otherwise a failed stage would leak maintainers
    that step forever under a view that fell back to snapshot-diff."""
    registered.append(hname)
    hm = _lower_view(eng, hname, hsql)
    if hm.kind == "differentiate":
        raise _UnloweredShape(f"hidden stage snapshot-diffs: {hsql}")
    eng._maintainers[hname] = hm
    words = {w.lower() for w in re.findall(r"\b\w+\b", hsql)}
    eng._sources[hname] = {w for w in words
                           if w in eng.tables or w in eng.views}
    eng._sources[hname] |= {w for w in words
                            if w in eng._maintainers and w != hname}
    hm.state.current.rows().createOrReplaceTempView(hname)


def _cleanup_hidden(eng: "Engine", registered: list) -> None:
    """Remove every maintainer a failed composition pass registered,
    including dependents named under a registered stage's prefix — and
    drop their Spark temp views (ADVICE r8 #1: a stale ``__<name>_*``
    temp view left in the session catalog would shadow a later binding
    with a frozen snapshot)."""
    for h in list(eng._maintainers):
        if h in registered or any(h.startswith(f"__{r}")
                                  for r in registered):
            eng._maintainers.pop(h, None)
            eng._sources.pop(h, None)
            try:
                eng.spark.catalog.dropTempView(h)
            except Exception:
                pass        # never registered as a temp view — fine


#: SELECT DISTINCT <exprs> FROM t [WHERE p]
_DISTINCT_RE = re.compile(
    r"^SELECT\s+DISTINCT\s+(?P<sel>.+?)\s+FROM\s+(?P<tbl>\w+)"
    r"(?:\s+(?:AS\s+)?(?P<alias>\w+))?(?:\s+WHERE\s+(?P<pred>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL)

_DISTINCT_BLOCKERS = re.compile(
    r"\b(GROUP\s+BY|UNION|INTERSECT|EXCEPT|OVER|HAVING|ORDER\s+BY|LIMIT"
    r"|JOIN|LEFT|RIGHT|FULL|CROSS)\b|\(\s*SELECT", re.IGNORECASE)


def _split_union(flat: str) -> tuple[list[str], bool] | None:
    """Split on top-level ``UNION [ALL]`` (outside parens and string
    literals).  Returns (branches, is_all), or None when there is no
    top-level union or the separators mix ALL with distinct (left-assoc
    mixed semantics — not worth lowering)."""
    mask = _top_mask(flat)
    if mask is None:
        return None
    spans, kinds = [], []
    i, n = 0, len(flat)
    while i < n:
        if mask[i] and _kw_at(flat, i, "UNION"):
            m = re.match(r"UNION(\s+ALL)?\b", flat[i:], re.IGNORECASE)
            spans.append((i, i + m.end()))
            kinds.append(bool(m.group(1)))
            i += m.end()
            continue
        i += 1
    if not spans or len(set(kinds)) != 1:
        return None
    branches, prev = [], 0
    for lo, hi in spans:
        branches.append(flat[prev:lo].strip())
        prev = hi
    branches.append(flat[prev:].strip())
    return branches, kinds[0]


class _UnionMaintainer(_ViewMaintainer):
    """``SELECT … FROM a UNION [ALL] SELECT … FROM b [UNION …]`` where
    every branch is a linear projection over a known source — plus() of
    the per-branch deltas (sum.rs semantics: addition of Z-sets is the
    UNION ALL of their deltas), optionally fed through
    :class:`DistinctOp` for set-semantics UNION.  Each branch evaluates
    over its source's delta only; a tick touching one source runs one
    branch."""

    def __init__(self, eng, name, sql, branches, is_all):
        from database_stream_processor_spark.plans.incremental import (
            DistinctOp)
        self.kind = "union_all" if is_all else "union"
        parsed = []
        for b in branches:
            m = _PROJECT_RE.match(b)
            if (not m or _BLOCKERS.search(b)
                    or _analyzed_has_aggregate(eng, b)):
                raise _UnloweredShape(b)
            tbl = m.group("tbl").lower()
            # hidden synthesized views (CTE hoists) are valid branches:
            # their deltas flow through `combined` like table deltas
            if tbl not in eng.tables and tbl not in eng.views \
                    and tbl not in eng._maintainers:
                raise _UnloweredShape(tbl)
            parsed.append((b, tbl))
        super().__init__(eng, name, sql)
        self.branches = parsed
        probes = [eng.eval_on(b, {t: _source_rows0(eng, t)})
                  for b, t in parsed]
        #: positional rename to the first branch's names (SQL union rule)
        self._names = probes[0].columns
        u = probes[0]
        for p in probes[1:]:  # eager type-compat validation
            u = u.unionByName(p.toDF(*self._names))
        _ = u.schema
        self._op = None if is_all else DistinctOp(
            ZSetFrame.from_df(eng.spark.createDataFrame([], u.schema)))

    def step(self, eng, combined, old):
        parts = []
        for branch_sql, tbl in self.branches:
            z = combined.get(tbl)
            if z is None:
                continue
            pos, neg = _split_parts(z)
            parts.append(ZSetFrame.from_df(
                eng.eval_on(branch_sql, {tbl: pos}).toDF(*self._names), 1))
            parts.append(ZSetFrame.from_df(
                eng.eval_on(branch_sql, {tbl: neg}).toDF(*self._names), -1))
        if not parts:
            return self._empty()
        delta = ZSetFrame.sum(parts).consolidate()
        if self._op is not None:
            delta = self._op.step(delta)
        self.apply_delta(delta)
        return delta


def _lift_branches(eng: "Engine", name: str, branches: list[str],
                   registered: list) -> tuple[list[str], int]:
    """Shared branch-hoisting step for UNION/EXCEPT/INTERSECT texts
    whose branches are not plain projections (aggregates, joins, CTE
    stacks, …): each non-projection branch becomes a hidden maintained
    view ``__{name}_u{i}`` (lowered through every recognizer) and the
    branch is rewritten to a bare projection over it, which the setop
    maintainers accept.  Returns (new_branches, lifted_count)."""
    out, lifted = [], 0
    for i, b in enumerate(branches):
        b = b.strip()
        if b.startswith("(") and _match_paren(b, 0) == len(b) - 1:
            b = b[1:-1].strip()          # a fully-parenthesized branch
        m = _PROJECT_RE.match(b)
        tbl = m.group("tbl").lower() if m else None
        if (m and not _BLOCKERS.search(b)
                and not _analyzed_has_aggregate(eng, b)
                and tbl and (tbl in eng.tables or tbl in eng.views
                             or tbl in eng._maintainers)):
            out.append(b)
            continue
        hid = f"__{name}_u{i}"
        _register_hidden(eng, hid, b, registered)
        cols = ", ".join(_source_rows0(eng, hid).columns)
        out.append(f"SELECT {cols} FROM {hid}")
        lifted += 1
    if not lifted:
        raise _UnloweredShape("no branch needed lifting")
    return out, lifted


def _union_branch_lift(eng: "Engine", name: str, flat: str,
                       branches: list[str], is_all: bool):
    """UNION [ALL] over aggregate/join/CTE branches — hoist each into a
    hidden maintained view and re-lower (grouped branch deltas flow
    into the union's presence/weight maintenance like table deltas)."""
    registered: list[str] = []
    try:
        nb, _ = _lift_branches(eng, name, branches, registered)
        kw = " UNION ALL " if is_all else " UNION "
        fm = _lower_view(eng, name, kw.join(nb))
        if fm.kind == "differentiate":
            raise _UnloweredShape("lifted union snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _setop_branch_lift(eng: "Engine", name: str, flat: str, kind: str,
                       branches: list[str]):
    """EXCEPT/INTERSECT [ALL] over aggregate/join/CTE branches — the
    same branch hoist as :func:`_union_branch_lift`."""
    registered: list[str] = []
    try:
        nb, _ = _lift_branches(eng, name, branches, registered)
        kw = {"except": " EXCEPT ", "intersect": " INTERSECT ",
              "except_all": " EXCEPT ALL ",
              "intersect_all": " INTERSECT ALL "}[kind]
        fm = _lower_view(eng, name, kw.join(nb))
        if fm.kind == "differentiate":
            raise _UnloweredShape("lifted setop snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _split_setop(flat: str) -> tuple[str, list[str]] | None:
    """Split on one top-level ``EXCEPT`` / ``INTERSECT`` [``ALL``].
    Returns (kind, [left, right]) for exactly two branches — kind one of
    'except' | 'intersect' | 'except_all' | 'intersect_all' — else
    None."""
    mask = _top_mask(flat)
    if mask is None:
        return None
    found = None
    i, n = 0, len(flat)
    while i < n:
        if mask[i] and (_kw_at(flat, i, "EXCEPT")
                        or _kw_at(flat, i, "INTERSECT")):
            m = re.match(r"(EXCEPT|INTERSECT)(\s+ALL)?\b",
                         flat[i:], re.IGNORECASE)
            if found is not None:
                return None  # >2 branches
            kind = m.group(1).lower() + ("_all" if m.group(2) else "")
            found = (kind, i, i + m.end())
            i += m.end()
            continue
        i += 1
    if found is None:
        return None
    kind, lo, hi = found
    return kind, [flat[:lo].strip(), flat[hi:].strip()]


class _SetOpMaintainer(_ViewMaintainer):
    """``SELECT … FROM a EXCEPT|INTERSECT SELECT … FROM b`` (set
    semantics — the reference's Z-set minus/intersect under distinct,
    zset.py §2.7 / SURVEY §2.7): each branch's projected delta flows
    through a :class:`DistinctOp`, whose ±1 presence flips drive
    whole-row membership recompute restricted to flipped rows only —
    ``r ∈ out ⇔ r ∈ A ∧ [¬] r ∈ B`` re-evaluated per touched row via
    broadcast-sized null-safe semi/anti probes into the two presence
    states.  A tick flipping nothing emits nothing."""

    def __init__(self, eng, name, sql, kind, branches):
        from database_stream_processor_spark.plans.incremental import (
            DistinctOp)
        self.kind = kind  # 'except' | 'intersect'
        parsed = []
        for b in branches:
            m = _PROJECT_RE.match(b)
            if (not m or _BLOCKERS.search(b)
                    or _analyzed_has_aggregate(eng, b)):
                raise _UnloweredShape(b)
            tbl = m.group("tbl").lower()
            # hidden synthesized views (CTE hoists) are valid branches:
            # their deltas flow through `combined` like table deltas
            if tbl not in eng.tables and tbl not in eng.views \
                    and tbl not in eng._maintainers:
                raise _UnloweredShape(tbl)
            parsed.append((b, tbl))
        super().__init__(eng, name, sql)
        self.branches = parsed
        probes = [eng.eval_on(b, {t: _source_rows0(eng, t)})
                  for b, t in parsed]
        self._names = probes[0].columns
        # state schema = the UNION-widened common schema, and every
        # branch delta is cast to it in step() — union-compatible but
        # unequal branch types (INT vs BIGINT) would otherwise push
        # branch-1-typed rows into branch-0-typed state.
        self._schema = probes[0].unionByName(
            probes[1].toDF(*self._names)).schema
        empty = eng.spark.createDataFrame([], self._schema)
        self._ops = [DistinctOp(ZSetFrame.from_df(empty))
                     for _ in parsed]
        self._presence = [StateTable(ZSetFrame.from_df(empty),
                                     name=f"view_{name}_p{i}")
                          for i in range(2)]

    def _cast_common(self, dz: ZSetFrame) -> ZSetFrame:
        from database_stream_processor_spark.zset import WEIGHT_COL
        casts = [F.col(f.name).cast(f.dataType).alias(f.name)
                 for f in self._schema.fields]
        return ZSetFrame(dz.df.select(*casts, F.col(WEIGHT_COL)))

    @staticmethod
    def _ns_rows(df: DataFrame, probe_rows: DataFrame, cols: list[str],
                 how: str) -> DataFrame:
        """Null-safe whole-row semi/anti join (set ops compare NULLs as
        equal, like DISTINCT)."""
        p = probe_rows.select(*[F.col(c).alias(f"__p_{c}") for c in cols])
        cond = None
        for c in cols:
            e = df[c].eqNullSafe(F.col(f"__p_{c}"))
            cond = e if cond is None else (cond & e)
        return df.join(p, on=cond, how=how)

    def step(self, eng, combined, old):
        flips = []
        for (b, tbl), op in zip(self.branches, self._ops):
            z = combined.get(tbl)
            if z is None:
                flips.append(None)
                continue
            pos, neg = _split_parts(z)
            dz = ZSetFrame.from_df(
                eng.eval_on(b, {tbl: pos}).toDF(*self._names), 1)
            dz = dz.plus(ZSetFrame.from_df(
                eng.eval_on(b, {tbl: neg}).toDF(*self._names), -1))
            dz = self._cast_common(dz)
            flips.append(op.step(dz.consolidate()))
        if all(f is None for f in flips):
            return self._empty()
        with _no_constraint_propagation(eng.spark):
            return self._step_guarded(eng, flips)

    def _step_guarded(self, eng, flips):
        cols = self._names
        touched = None
        for i, f in enumerate(flips):
            if f is None:
                continue
            self._presence[i].update(f)
            t = f.df.select(*cols)
            touched = t if touched is None else touched.unionByName(t)
        touched = touched.dropDuplicates().localCheckpoint(eager=True)
        pa = self._presence[0].current.rows()
        pb = self._presence[1].current.rows()
        in_a = self._ns_rows(touched, pa, cols, "left_semi")
        new_rows = self._ns_rows(
            in_a, pb, cols,
            "left_anti" if self.kind == "except" else "left_semi")
        old_rows = self._ns_rows(self.state.current.rows(), touched,
                                 cols, "left_semi")
        delta = ZSetFrame((ZSetFrame.from_df(new_rows, 1)
                           .minus(ZSetFrame.from_df(old_rows, 1))
                           .consolidate().df.localCheckpoint(eager=True)))
        self.apply_delta(delta)
        return delta


class _SetOpAllMaintainer(_ViewMaintainer):
    """``SELECT … FROM a EXCEPT ALL | INTERSECT ALL SELECT … FROM b`` —
    BAG semantics, which is native Z-set territory: each branch's
    projected multiset lives in a weighted StateTable whose weights ARE
    the multiplicities.  Per tick, only rows whose multiplicity changed
    re-derive the output count — ``max(a − b, 0)`` (EXCEPT ALL) or
    ``min(a, b)`` (INTERSECT ALL) — via null-safe whole-row probes of
    the two branch states restricted to the touched rows, and the view
    emits (new_count − old_count) as its delta.  A tick touching
    nothing emits nothing; cost ∝ touched rows, never branch size."""

    def __init__(self, eng, name, sql, kind, branches):
        self.kind = kind               # 'except_all' | 'intersect_all'
        parsed = []
        for b in branches:
            m = _PROJECT_RE.match(b)
            if (not m or _BLOCKERS.search(b)
                    or _analyzed_has_aggregate(eng, b)):
                raise _UnloweredShape(b)
            tbl = m.group("tbl").lower()
            # hidden synthesized views (CTE hoists) are valid branches:
            # their deltas flow through `combined` like table deltas
            if tbl not in eng.tables and tbl not in eng.views \
                    and tbl not in eng._maintainers:
                raise _UnloweredShape(tbl)
            parsed.append((b, tbl))
        super().__init__(eng, name, sql)
        self.branches = parsed
        probes = [eng.eval_on(b, {t: _source_rows0(eng, t)})
                  for b, t in parsed]
        self._names = probes[0].columns
        self._schema = probes[0].unionByName(
            probes[1].toDF(*self._names)).schema
        empty = ZSetFrame.from_df(
            eng.spark.createDataFrame([], self._schema))
        self._mult = [StateTable(empty, name=f"view_{name}_m{i}")
                      for i in range(2)]

    def _cast_common(self, dz: ZSetFrame) -> ZSetFrame:
        from database_stream_processor_spark.zset import WEIGHT_COL
        casts = [F.col(f.name).cast(f.dataType).alias(f.name)
                 for f in self._schema.fields]
        return ZSetFrame(dz.df.select(*casts, F.col(WEIGHT_COL)))

    def step(self, eng, combined, old):
        dzs = []
        for (b, tbl) in self.branches:
            z = combined.get(tbl)
            if z is None:
                dzs.append(None)
                continue
            pos, neg = _split_parts(z)
            dz = ZSetFrame.from_df(
                eng.eval_on(b, {tbl: pos}).toDF(*self._names), 1)
            dz = dz.plus(ZSetFrame.from_df(
                eng.eval_on(b, {tbl: neg}).toDF(*self._names), -1))
            dzs.append(self._cast_common(dz).consolidate())
        if all(d is None for d in dzs):
            return self._empty()
        with _no_constraint_propagation(eng.spark):
            return self._step_guarded(eng, dzs)

    def _step_guarded(self, eng, dzs):
        from database_stream_processor_spark.zset import WEIGHT_COL
        cols = self._names
        touched = None
        for i, d in enumerate(dzs):
            if d is None:
                continue
            self._mult[i].update(d)
            t = d.df.select(*cols)
            touched = t if touched is None else touched.unionByName(t)
        touched = touched.dropDuplicates().localCheckpoint(eager=True)

        def mult_of(st: StateTable, wname: str) -> DataFrame:
            restricted = _SetOpMaintainer._ns_rows(
                st.current.df, touched, cols, "left_semi")
            z = ZSetFrame(restricted).consolidate().df
            return z.select(*cols, F.col(WEIGHT_COL).alias(wname))

        a = mult_of(self._mult[0], "__wa")
        b = mult_of(self._mult[1], "__wb")
        br = b.select(*[F.col(c).alias(f"__b_{c}") for c in cols], "__wb")
        cond = None
        for c in cols:
            e = a[c].eqNullSafe(F.col(f"__b_{c}"))
            cond = e if cond is None else (cond & e)
        j = a.join(br, on=cond, how="full_outer")
        wa = F.coalesce(F.col("__wa"), F.lit(0))
        wb = F.coalesce(F.col("__wb"), F.lit(0))
        nm = (F.greatest(wa - wb, F.lit(0)) if self.kind == "except_all"
              else F.least(wa, wb))
        new = j.select(
            *[F.coalesce(a[c], F.col(f"__b_{c}")).alias(c) for c in cols],
            nm.alias("__nm")).filter(F.col("__nm") != 0)

        old_rows = ZSetFrame(_SetOpMaintainer._ns_rows(
            self.state.current.df, touched, cols, "left_semi")) \
            .consolidate().df
        delta = ZSetFrame(
            ZSetFrame(new.select(*cols, F.col("__nm").alias(WEIGHT_COL)))
            .minus(ZSetFrame(old_rows)).consolidate()
            .df.localCheckpoint(eager=True))
        self.apply_delta(delta)
        return delta


class _DistinctMaintainer(_ViewMaintainer):
    """SELECT DISTINCT <exprs> FROM t [WHERE p] — the projection is
    linear (runs over the delta alone), and the set-semantics layer is
    :class:`~database_stream_processor_spark.plans.incremental.DistinctOp`
    (distinct.rs:64): per tick, only rows touched by the projected delta
    are re-examined against the maintained multiplicity integral, so a
    row's distinct-presence flips exactly when its total weight crosses
    zero — no snapshot diffing, cost ∝ Δ."""

    kind = "distinct"

    def __init__(self, eng, name, sql, table, inner_sql):
        from database_stream_processor_spark.plans.incremental import (
            DistinctOp)
        super().__init__(eng, name, sql)
        self.table = table
        self._inner_sql = inner_sql
        probe = eng.eval_on(inner_sql, {table: _source_rows0(eng, table)})
        empty = eng.spark.createDataFrame([], probe.schema)
        self._op = DistinctOp(ZSetFrame.from_df(empty))

    def step(self, eng, combined, old):
        z = combined.get(self.table)
        if z is None:
            return self._empty()
        pos, neg = _split_parts(z)
        projected = ZSetFrame.from_df(
            eng.eval_on(self._inner_sql, {self.table: pos}), 1)
        projected = projected.plus(ZSetFrame.from_df(
            eng.eval_on(self._inner_sql, {self.table: neg}), -1))
        delta = self._op.step(projected.consolidate())
        self.apply_delta(delta)
        return delta


class _LeftJoinMaintainer(_ViewMaintainer):
    """SELECT … FROM a LEFT|RIGHT|FULL [OUTER] JOIN b ON <equi-cond>
    [WHERE p] — incremental outer join by *touched-key recompute* (the
    OuterJoinOp idiom, plans/incremental.py; reference join.rs:338-361):
    per tick, only the join-key groups appearing in either delta are
    re-evaluated through the original SQL and diffed against the stored
    output restricted (null-safely) to the same keys, so a null-padded
    row appears/retracts exactly when its key's match-set flips.

    The internal output state carries the join keys as hidden ``__k_i``
    columns (``COALESCE(left_key, right_key)`` — the row's key whichever
    side it survives from, covering right-only and left-only padded
    rows), so the restriction works even when the SELECT list drops the
    key; the emitted view delta projects them away.  At scale the
    touched-key semi-joins are broadcast lookups (the touched set is
    delta-sized) and the stored-state restriction is partition-pruned
    when the state table is keyed on the hidden columns.
    """

    def __init__(self, eng, name, sql, left, right, m):
        la = (m.group("la") or m.group("lt")).lower()
        ra = (m.group("ra") or m.group("rt")).lower()
        pairs = _parse_equi_cond(
            m.group("cond"), {la}, {ra},
            {c.lower() for c in _source_rows0(eng, left).columns},
            {c.lower() for c in _source_rows0(eng, right).columns})
        if not pairs:
            raise _UnloweredShape(m.group("cond"))
        super().__init__(eng, name, sql)
        join_kw = m.group("kind").upper()
        self.kind = f"{join_kw.lower()}_join"
        self.left, self.right = left, right
        self.lkeys = [p[0] for p in pairs]
        self.rkeys = [p[1] for p in pairs]
        where = f" WHERE {m.group('pred')}" if m.group("pred") else ""
        la_txt = f" {m.group('la')}" if m.group("la") else ""
        ra_txt = f" {m.group('ra')}" if m.group("ra") else ""
        hidden = ", ".join(
            f"COALESCE({la}.{lc}, {ra}.{rc}) AS __k_{i}"
            for i, (lc, rc) in enumerate(zip(self.lkeys, self.rkeys)))
        self._delta_sql = (
            f"SELECT {m.group('sel')}, {hidden} FROM {left}{la_txt} "
            f"{join_kw} JOIN {right}{ra_txt} ON {m.group('cond')}{where}")
        first = eng.eval_on(self._delta_sql, {
            left: _source_rows0(eng, left),
            right: _source_rows0(eng, right)})
        # schema-only empty (LocalRelation) — limit(0) over the analyzed
        # SQL plan would carry its attribute ids into every state union
        empty = eng.spark.createDataFrame([], first.schema)
        self._out = StateTable(ZSetFrame.from_df(empty),
                               name=f"view_{name}_keyed")

    @staticmethod
    def _ns_semi_pos(df: DataFrame, touched: DataFrame,
                     cols: list[str]) -> DataFrame:
        return _ns_semi_pos(df, touched, cols)

    def step(self, eng, combined, old):
        da, db = combined.get(self.left), combined.get(self.right)
        if da is None and db is None:
            return self._empty()
        # the guard matters when a side is a hidden maintained view
        # whose delta lineage went through eval_on rebindings (the
        # correlated-quantified composition crashed here without it)
        with _no_constraint_propagation(eng.spark):
            return self._step_guarded(eng, da, db)

    def _step_guarded(self, eng, da, db):
        parts = []
        if da is not None:
            parts.append(da.df.select(
                *[F.col(c).alias(f"__t_{i}")
                  for i, c in enumerate(self.lkeys)]))
        if db is not None:
            parts.append(db.df.select(
                *[F.col(c).alias(f"__t_{i}")
                  for i, c in enumerate(self.rkeys)]))
        touched = parts[0]
        for p in parts[1:]:
            touched = touched.unionByName(p)
        touched = touched.dropDuplicates().localCheckpoint(eager=True)

        a_t = self._ns_semi_pos(_current_rows(eng, self.left), touched,
                                self.lkeys)
        b_t = self._ns_semi_pos(_current_rows(eng, self.right), touched,
                                self.rkeys)
        # materialize the recomputed slice before any union: Catalyst's
        # Union constraint rewrite chokes on the raw LEFT JOIN plan as a
        # union child (attribute-map lookup on the padded side)
        new_out = ZSetFrame.from_df(
            eng.eval_on(self._delta_sql,
                        {self.left: a_t, self.right: b_t})
            .localCheckpoint(eager=True), 1)
        hidden = [f"__k_{i}" for i in range(len(self.lkeys))]
        old_t = ZSetFrame(self._ns_semi_pos(self._out.current.df, touched,
                                            hidden))
        keyed_delta = new_out.minus(old_t).consolidate()
        self._out.update(keyed_delta)
        delta = ZSetFrame(keyed_delta.df.drop(*hidden)).consolidate()
        self.apply_delta(delta)
        return delta


@_contextmanager
def _no_constraint_propagation(spark: SparkSession):
    """Scoped workaround for a Spark 4 optimizer crash: ``localCheckpoint``
    over a plan that went through ``DeduplicateRelations`` captures origin
    constraints carrying remapped attribute ids; when that LogicalRDD is
    later unioned with the state, constraint propagation dies with
    ``key not found: <attr>``.  With propagation off, the checkpoint
    captures no constraints and the resulting LogicalRDD is permanently
    clean — the loss (inferred IsNotNull/transitive filters) only affects
    the delta-sized maintenance plans inside the guard."""
    key = "spark.sql.constraintPropagation.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _ns_semi_pos(df: DataFrame, touched: DataFrame,
                 cols: list[str]) -> DataFrame:
    """Null-safe semi-join of ``df[cols]`` against touched's positional
    ``__t_i`` columns (NULL keys form real groups: an outer-join row or
    GROUP BY group with a NULL key must still be maintained)."""
    cond = None
    for i, c in enumerate(cols):
        e = df[c].eqNullSafe(F.col(f"__t_{i}"))
        cond = e if cond is None else (cond & e)
    return df.join(touched, on=cond, how="left_semi")


def _ns_anti_pos(df: DataFrame, touched: DataFrame,
                 cols: list[str]) -> DataFrame:
    """Null-safe anti-join twin of :func:`_ns_semi_pos` — the rows NOT
    matching any touched key tuple."""
    cond = None
    for i, c in enumerate(cols):
        e = df[c].eqNullSafe(F.col(f"__t_{i}"))
        cond = e if cond is None else (cond & e)
    return df.join(touched, on=cond, how="left_anti")


def _split_top_and(s: str) -> list[str]:
    """Split a predicate on top-level ``AND`` — one shared
    implementation (``_split_top_and_bw``: mask-driven, CASE-opaque AND
    BETWEEN-aware; before r9 this variant split ``BETWEEN x AND y`` in
    the middle, leaving garbage terms for the eval probes to catch).
    Empty parts are dropped (this variant's historical contract)."""
    return [t for t in _split_top_and_bw(s) if t]


#: one top-level-AND term of the form ``[NOT] EXISTS (SELECT …)``
_EXISTS_TERM = re.compile(r"^(?P<neg>NOT\s+)?EXISTS\s*\((?P<inner>.+)\)\s*$",
                          re.IGNORECASE | re.DOTALL)
#: one top-level-AND term of the form ``col IN (SELECT …)`` or the
#: tuple form ``(c1, c2) IN (SELECT …)`` (Calcite accepts row-value
#: IN; sql-to-dbsp §3.2)
_IN_TERM = re.compile(
    r"^(?P<col>[\w.]+|\(\s*[\w.]+(?:\s*,\s*[\w.]+)+\s*\))\s+"
    r"(?P<neg>NOT\s+)?IN\s*\(\s*(?P<inner>SELECT\b.+)"
    r"\)\s*$",
    re.IGNORECASE | re.DOTALL)
#: outer query around a subquery filter
_SUBQ_OUTER_RE = re.compile(
    r"^SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<ot>\w+)(?:\s+(?:AS\s+)?"
    r"(?P<oa>\w+))?\s+WHERE\s+(?P<body>.+)$", re.IGNORECASE | re.DOTALL)
#: EXISTS subquery body (correlated WHERE required)
_SUBQ_INNER_RE = re.compile(
    r"^SELECT\s+.+?\s+FROM\s+(?P<it>\w+)(?:\s+(?:AS\s+)?(?P<ia>\w+))?"
    r"\s+WHERE\s+(?P<icond>.+)$", re.IGNORECASE | re.DOTALL)
#: IN subquery body (column select items — several for the tuple form;
#: WHERE optional, inner-only)
_IN_INNER_RE = re.compile(
    r"^SELECT\s+(?P<icol>[\w.]+(?:\s*,\s*[\w.]+)*)\s+FROM\s+"
    r"(?P<it>\w+)(?:\s+(?:AS\s+)?"
    r"(?P<ia>\w+))?(?:\s+WHERE\s+(?P<ipred>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL)


def _in_term_cols(col_group: str) -> list[str]:
    """The outer column list of an ``_IN_TERM`` match: one bare/qualified
    column, or the members of a ``(c1, c2, …)`` tuple."""
    g = col_group.strip()
    if g.startswith("("):
        return [c.strip() for c in g[1:-1].split(",")]
    return [g]

_SUBQ_BLOCKERS = re.compile(
    r"\b(GROUP\s+BY|DISTINCT|UNION|INTERSECT|EXCEPT|OVER|HAVING"
    r"|ORDER\s+BY|LIMIT|JOIN|LEFT|RIGHT|FULL|OUTER|CROSS)\b",
    re.IGNORECASE)


#: non-column tokens the identifier walker skips (shared by _refs_only
#: and _residual_side_check so the two can never drift)
_EXPR_KEYWORDS = {"AND", "OR", "NOT", "NULL", "TRUE", "FALSE", "IS",
                  "IN", "LIKE", "BETWEEN", "CASE", "WHEN", "THEN",
                  "ELSE", "END"}


def _walk_idents(term: str):
    """Yield every identifier reference in ``term`` (literals blanked):
    ``("qual", q, c)`` for qualified refs, ``("func", name, None)`` for
    call sites, ``("bare", tok, None)`` for bare tokens that are not in
    the shared keyword set.  THE single identifier walker for residual
    attribution — one regex, one keyword list."""
    no_str = re.sub(r"'[^']*'", "''", term)
    for m in re.finditer(r"(\w+)\s*\.\s*(\w+)|\b([A-Za-z_]\w*)\b(\s*\()?",
                         no_str):
        if m.group(1):
            yield ("qual", m.group(1).lower(), m.group(2).lower())
        elif m.group(4):
            yield ("func", m.group(3).lower(), None)
        elif m.group(3).upper() not in _EXPR_KEYWORDS:
            yield ("bare", m.group(3).lower(), None)


def _refs_only(term: str, allowed_quals: set[str],
               allowed_cols: set[str]) -> bool:
    """True iff every identifier in ``term`` is either ``q.col`` with
    ``q`` in *allowed_quals*, a bare column in *allowed_cols*, or a
    non-column token (literal/function/keyword)."""
    for kind, a, b in _walk_idents(term):
        if kind == "qual" and a not in allowed_quals:
            return False
        if kind == "bare" and a not in allowed_cols:
            return False
    return True


def _parse_exists_inner(eng: "Engine", subq: re.Match, ot: str, oa: str,
                        ocols: set[str]) -> tuple | None:
    """Parse one ``[NOT] EXISTS (SELECT … FROM it [ia] WHERE icond)``
    term: returns ``(inner_table, okeys, ikeys)`` with the equality
    correlation pairs, or None when the shape doesn't maintain.

    Residual terms referencing BOTH sides (TPC-H q21's inequality
    ``l2.l_suppkey <> l1.l_suppkey``) are accepted as long as at least
    one equality correlation key exists: the touched-key restriction
    stays exact because the equality already confines each outer row's
    probe to inner rows sharing its key — the residual only filters
    WITHIN that group and is evaluated verbatim on recompute."""
    inner_sql = subq.group("inner").strip()
    if _SUBQ_BLOCKERS.search(inner_sql) or \
            re.search(r"\(\s*SELECT", inner_sql, re.IGNORECASE):
        return None
    sm = _SUBQ_INNER_RE.match(inner_sql)
    if not sm:
        return None
    it = sm.group("it").lower()
    ia = (sm.group("ia") or sm.group("it")).lower()
    # hidden maintained views are valid inners (q18's grouped-HAVING
    # subquery pre-lowers to one); same-table self-probe stays fallback
    if not (it in eng.tables or it in eng.views
            or it in eng._maintainers) or it == ot:
        return None
    try:
        icols = {f.name.lower()
                 for f in _source_rows0(eng, it).schema.fields}
    except Exception:
        return None
    if _mixed_top_and_or(sm.group("icond")):
        return None
    def _side(tok: str) -> tuple[str, str] | None:
        """Resolve one equality operand to ('inner'|'outer', col) —
        qualified by either alias, or bare with SQL scoping (an
        inner-owned name resolves inner; only a name absent from the
        inner can reach out to the outer row)."""
        tok = tok.strip()
        if "." in tok:
            q, c = tok.split(".", 1)
            q, c = q.lower(), c.lower()
            if q == ia and c in icols:
                return ("inner", c)
            if q == oa and c in ocols:
                return ("outer", c)
            return None
        c = tok.lower()
        if c in icols:
            return ("inner", c)
        if c in ocols:
            return ("outer", c)
        return None

    okeys, ikeys = [], []
    for term in _split_top_and(sm.group("icond")):
        em2 = re.match(r"^([\w.]+)\s*=\s*([\w.]+)$", term.strip())
        if em2:
            s1, s2 = _side(em2.group(1)), _side(em2.group(2))
            # any qualified/bare mix works (verbatim TPC-H q4's bare
            # `l_orderkey = o_orderkey`, q130's `o_custkey =
            # c.c_custkey`) as long as one side is inner, one outer
            if s1 and s2 and {s1[0], s2[0]} == {"inner", "outer"}:
                inn, out = (s1, s2) if s1[0] == "inner" else (s2, s1)
                ikeys.append(inn[1])
                okeys.append(out[1])
                continue
        # a non-correlation residual may reference the inner alone or
        # BOTH sides (mixed inequality residuals); outer-only residuals
        # belong in the outer WHERE and anything unresolvable falls
        # back.  Attribution is checked EXPLICITLY here (ADVICE r8 #4)
        # — a qualified ref whose column lives on the other side
        # (``ia.c`` with c only in outer) or a residual touching no
        # inner column previously leaked through _refs_only and relied
        # on the constructor's eval probe to blow up.
        if _residual_side_check(term, ia, oa, icols, ocols) is not True:
            return None
    if not okeys:
        return None
    return it, okeys, ikeys


def _residual_side_check(term: str, ia: str, oa: str,
                         icols: set[str], ocols: set[str]) -> bool:
    """True iff every identifier in ``term`` attributes consistently
    (``ia.c`` requires c ∈ inner cols, ``oa.c`` requires c ∈ outer
    cols, bare names must resolve to a known column with inner winning
    per SQL scoping) AND at least one inner column is referenced — an
    outer-only residual is rejected (it belongs in the outer WHERE;
    accepting it here would make the touched-key restriction argument
    depend on a shape nobody audited)."""
    refs_inner = False
    for kind, a, b in _walk_idents(term):
        if kind == "qual":
            if a == ia and b in icols:
                refs_inner = True
            elif a == oa and b in ocols:
                pass
            else:
                return False        # unknown qualifier or wrong side
        elif kind == "bare":
            if a in icols:          # inner wins, per SQL scoping
                refs_inner = True
            elif a not in ocols:
                return False
    return refs_inner


def _filter_subquery_join_inner(eng: "Engine", name: str, flat: str):
    """[NOT] EXISTS terms whose body is a JOIN chain — ``… WHERE EXISTS
    (SELECT 1 FROM a JOIN b ON … WHERE corr AND inner-preds)`` under a
    non-aggregate outer filter (the reference decorrelates these into a
    semijoin against the inner join's output, semijoin.rs): pre-lower
    each such body's join to a hidden maintained view projecting
    exactly the columns the correlation terms reference (inner-only
    predicates push into the view), rewrite the term to probe the view,
    and re-lower the whole statement — the ordinary subquery-filter
    maintainers then see a single-table inner.  EXISTS has membership
    semantics, so probing the join's projection is exact."""
    m = _SUBQ_OUTER_RE.match(flat)
    if m is None:
        raise _UnloweredShape("not an outer filter")
    ot = m.group("ot").lower()
    if not (ot in eng.tables or ot in eng.views
            or ot in eng._maintainers):
        raise _UnloweredShape(ot)
    oa = (m.group("oa") or m.group("ot")).lower()
    ocols = {f.name.lower()
             for f in _source_rows0(eng, ot).schema.fields}
    if _mixed_top_and_or(m.group("body")):
        raise _UnloweredShape("mixed top-level AND/OR")
    new_terms, in_views = [], []
    for term in _split_top_and(m.group("body")):
        em = _EXISTS_TERM.match(term)
        if not em:
            new_terms.append(term)
            continue
        ip = _split_select_from(em.group("inner").strip())
        if ip is None:
            new_terms.append(term)
            continue
        ifrom, ipred = _split_where(ip[1])
        chain = _parse_aliased_chain(ifrom)
        if (chain is None or any(kw != "JOIN" for _, _, kw in chain[1:])
                or any(t not in eng.tables and t not in eng.views
                       and t not in eng._maintainers
                       for t, _, _ in chain)
                or any(a == oa for _, a, _ in chain)):
            new_terms.append(term)
            continue
        cols_of = {a: {c.lower() for c in _source_rows0(eng, t).columns}
                   for t, a, _ in chain}

        def iowner(c: str) -> str | None:
            owners = [a for a in cols_of if c.lower() in cols_of[a]]
            return owners[0] if len(owners) == 1 else None

        if ipred is None or _mixed_top_and_or(ipred):
            new_terms.append(term)
            continue
        corr, inner_only, needed, ok = [], [], set(), True
        for p in _split_top_and(ipred):
            scan = re.sub(r"'[^']*'", " ", p)
            refs_outer = bool(re.search(rf"\b{oa}\s*\.", scan,
                                        re.IGNORECASE))
            for bm in re.finditer(r"\b([A-Za-z_]\w*)\b(?!\s*[(.])",
                                  scan):
                c = bm.group(1).lower()
                pre = scan[:bm.start()].rstrip()
                if c in _SQL_KEYWORDS or pre.endswith("."):
                    continue
                if iowner(c) is None and c in ocols:
                    refs_outer = True
            if refs_outer:
                corr.append(p)
            else:
                inner_only.append(p)
        if not corr:
            new_terms.append(term)       # uncorrelated: keep fallback
            continue
        # correlation terms: claim every chain column they reference,
        # strip chain-alias qualifiers (bare in the hidden view); bail
        # on a bare name owned by BOTH sides (scoping would flip)
        rewritten_corr = []
        for p in corr:
            scan = re.sub(r"'[^']*'", " ", p)
            for qm in re.finditer(
                    r"\b([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\b", scan):
                a, c = qm.group(1).lower(), qm.group(2).lower()
                if a == oa:
                    continue
                if a not in cols_of or c not in cols_of[a] \
                        or iowner(c) is None:
                    ok = False
                    break
                needed.add(c)
            if not ok:
                break
            for bm in re.finditer(r"\b([A-Za-z_]\w*)\b(?!\s*[(.])",
                                  scan):
                c = bm.group(1).lower()
                pre = scan[:bm.start()].rstrip()
                if c in _SQL_KEYWORDS or pre.endswith("."):
                    continue
                a = iowner(c)
                if a is not None:
                    if c in ocols:
                        ok = False   # ambiguous between sides
                        break
                    needed.add(c)
            if not ok:
                break
            rp = p
            for a in cols_of:
                rp = _sub_outside_literals(rf"\b{a}\s*\.\s*", "", rp,
                                           re.IGNORECASE)
            rewritten_corr.append(rp)
        if not ok or not needed:
            new_terms.append(term)
            continue
        hname = f"__{name}_x{len(in_views)}"
        hsql = (f"SELECT {', '.join(f'{iowner(c)}.{c}' for c in sorted(needed))} "
                f"FROM {ifrom}")
        if inner_only:
            hsql += " WHERE " + " AND ".join(inner_only)
        in_views.append((hname, hsql))
        neg = "NOT " if em.group("neg") else ""
        new_terms.append(f"{neg}EXISTS (SELECT 1 FROM {hname} WHERE "
                         + " AND ".join(rewritten_corr) + ")")
    if not in_views:
        raise _UnloweredShape("no join-bodied EXISTS term")
    outer_ref = m.group("ot") + (f" {m.group('oa')}" if m.group("oa")
                                 else "")
    final = (f"SELECT {m.group('sel')} FROM {outer_ref} WHERE "
             + " AND ".join(new_terms))
    registered: list[str] = []
    try:
        for hname, hsql in in_views:
            _register_hidden(eng, hname, hsql, registered)
        fm = _lower_view(eng, name, final)
        if fm.kind == "differentiate":
            raise _UnloweredShape("rewritten filter snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


#: IN body whose select item is an EXPRESSION, not a bare column
_IN_EXPR_INNER_RE = re.compile(
    r"^SELECT\s+(?P<iexpr>.+?)\s+FROM\s+(?P<it>\w+)(?:\s+(?:AS\s+)?"
    r"(?P<ia>\w+))?(?:\s+WHERE\s+(?P<ipred>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL)


def _filter_in_expr_inner(eng: "Engine", name: str, flat: str):
    """[NOT] IN subqueries whose select item is an EXPRESSION —
    ``o_ok NOT IN (SELECT l_ok + 1 FROM li WHERE qty > 0)`` — hoist the
    inner into a hidden O(Δ) projection materializing the expression
    (``SELECT l_ok + 1 AS __inx FROM …``) and re-lower the view with
    the term probing the hidden view's column; the subquery-filter
    machinery then applies unchanged, INCLUDING the three-valued
    nullable NOT IN routing (the hidden column's nullability carries
    the expression's)."""
    m = _SUBQ_OUTER_RE.match(flat)
    if m is None:
        raise _UnloweredShape("not a filtered single-table SELECT")
    if _mixed_top_and_or(m.group("body")):
        raise _UnloweredShape("mixed top-level AND/OR")
    terms = _split_top_and(m.group("body"))
    registered: list[str] = []
    out_terms, lifted = [], 0
    try:
        for t in terms:
            im = _IN_TERM.match(t)
            sm = (_IN_EXPR_INNER_RE.match(im.group("inner").strip())
                  if im else None)
            if (im is None or sm is None
                    or re.match(r"^[\w.]+$", sm.group("iexpr").strip())
                    or _SUBQ_BLOCKERS.search(im.group("inner"))
                    or re.search(r"\(\s*SELECT", im.group("inner"),
                                 re.IGNORECASE)):
                out_terms.append(t)
                continue
            it = sm.group("it").lower()
            if not (it in eng.tables or it in eng.views
                    or it in eng._maintainers):
                out_terms.append(t)
                continue
            ia = (sm.group("ia") or sm.group("it")).lower()
            icols = {c.lower() for c in _source_rows0(eng, it).columns}
            if not _refs_only(sm.group("iexpr"), {ia}, icols) \
                    or (sm.group("ipred")
                        and not _refs_only(sm.group("ipred"), {ia},
                                           icols)):
                out_terms.append(t)        # correlated: not this pass
                continue
            hid = f"__{name}_inx{lifted}"
            hsql = (f"SELECT {sm.group('iexpr')} AS __inx FROM {it}"
                    + (f" {sm.group('ia')}" if sm.group("ia") else "")
                    + (f" WHERE {sm.group('ipred')}"
                       if sm.group("ipred") else ""))
            _register_hidden(eng, hid, hsql, registered)
            neg = im.group("neg") or ""
            out_terms.append(
                f"{im.group('col')} {neg}IN (SELECT __inx FROM {hid})")
            lifted += 1
        if not lifted:
            raise _UnloweredShape("no expression-bodied IN terms")
        new = (f"SELECT {m.group('sel')} FROM {m.group('ot')}"
               + (f" {m.group('oa')}" if m.group("oa") else "")
               + " WHERE " + " AND ".join(out_terms))
        fm = _lower_view(eng, name, new)
        if fm.kind == "differentiate":
            raise _UnloweredShape("rewritten IN filter snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _having_key_subquery_split(eng: "Engine", name: str, flat: str):
    """Grouped selects whose HAVING carries [NOT] IN subquery terms
    over GROUP KEYS — ``GROUP BY ck HAVING ck IN (SELECT ck FROM cu
    WHERE seg = 'gold')`` — split: the aggregate (with any remaining
    HAVING conjuncts) becomes a hidden maintained view, and the
    key-only subquery terms move OUT to a WHERE over it, which the
    subquery-filter machinery maintains as a semi/anti-join on the
    view's delta.  A key-only HAVING predicate commutes with
    post-filtering the group rows, so the split is always sound; terms
    referencing aggregates (or keys aliased away in the select list)
    refuse."""
    m = _AGG_RE.match(flat)
    if m is None or not m.group("having"):
        raise _UnloweredShape("not a grouped HAVING select")
    tbl = m.group("tbl").lower()
    if not (tbl in eng.tables or tbl in eng.views
            or tbl in eng._maintainers):
        raise _UnloweredShape(f"unknown table {tbl}")
    keys = [k.strip() for k in m.group("keys").split(",")]
    # every moved key must appear UNALIASED in the select list (the
    # outer WHERE references the hidden view's output columns)
    sel_items = {i.strip().lower()
                 for i in _split_top_level(m.group("sel"))}
    if _mixed_top_and_or(m.group("having")):
        raise _UnloweredShape("mixed top-level AND/OR in HAVING")
    moved, kept = [], []
    for t in _split_top_and(m.group("having")):
        im = _IN_TERM.match(t)
        col = im.group("col").split(".")[-1].lower() if im else None
        if (im and col in [k.lower() for k in keys]
                and col in sel_items
                and not re.search(rf"\b{tbl}\b", im.group("inner"),
                                  re.IGNORECASE)):
            # requalify to the hidden view's bare output column: a
            # qualifier-carrying spelling (``t.ck IN (…)``) would
            # otherwise reference a nonexistent alias in the outer
            # WHERE over the hidden view (ADVICE r9 #3)
            bare = im.group("col").split(".")[-1]
            neg = "NOT " if im.group("neg") else ""
            moved.append(f"{bare} {neg}IN "
                         f"({im.group('inner').strip()})")
        else:
            kept.append(t)
    if not moved:
        raise _UnloweredShape("no key-only IN subquery terms in HAVING")
    hidden = f"__{name}_hg"
    hsql = (f"SELECT {m.group('sel')} FROM {m.group('tbl')}"
            + (f" WHERE {m.group('pred')}" if m.group("pred") else "")
            + f" GROUP BY {m.group('keys')}"
            + (f" HAVING {' AND '.join(kept)}" if kept else ""))
    registered: list[str] = []
    try:
        _register_hidden(eng, hidden, hsql, registered)
        cols = ", ".join(_source_rows0(eng, hidden).columns)
        outer = (f"SELECT {cols} FROM {hidden} WHERE "
                 + " AND ".join(moved))
        fm = _lower_view(eng, name, outer)
        if fm.kind == "differentiate":
            raise _UnloweredShape("split HAVING filter snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _match_subquery_filter(eng: "Engine", flat: str) -> dict | None:
    """Recognize ``SELECT … FROM outer WHERE [pre AND] [NOT] EXISTS
    (SELECT … FROM inner WHERE corr [AND ipred]) [AND post]`` and the
    ``col IN (SELECT col FROM inner [WHERE ipred])`` equivalent; return
    the pieces for :class:`_SubqueryFilterMaintainer`, or None."""
    m = _SUBQ_OUTER_RE.match(flat)
    if not m:
        return None
    ot = m.group("ot").lower()
    # hidden maintained views (scalar-subquery join stacks) are valid
    # outers: TPC-H q22's NOT EXISTS filters the scalar-filtered rows
    if not (ot in eng.tables or ot in eng.views
            or ot in eng._maintainers):
        return None
    oa = (m.group("oa") or m.group("ot")).lower()
    try:
        ocols = {f.name.lower()
                 for f in _source_rows0(eng, ot).schema.fields}
    except Exception:
        return None
    if _mixed_top_and_or(m.group("body")):
        return None
    terms = _split_top_and(m.group("body"))
    subqs, outer_pred = [], []
    for t in terms:
        em = _EXISTS_TERM.match(t)
        im = _IN_TERM.match(t)
        if em or im:
            subqs.append((em, "exists") if em else (im, "in"))
        else:
            if "(" in t and re.search(r"\(\s*SELECT", t, re.IGNORECASE):
                return None
            if not _refs_only(t, {oa}, ocols):
                return None
            outer_pred.append(t)
    if not subqs:
        return None
    if len(subqs) > 1:
        from_clause = m.group("ot") + (f" {m.group('oa')}"
                                       if m.group("oa") else "")
        base = {"outer": ot, "oa": oa, "sel": m.group("sel"),
                "from_clause": from_clause, "body": m.group("body"),
                "negated": False}
        # FAST path: every term an EXISTS over the SAME inner table
        # correlated on the SAME equality keys (verbatim TPC-H q21:
        # EXISTS + NOT EXISTS both probing lineitem on l_orderkey) —
        # ONE touched-key restriction maintains them all
        if all(kind == "exists" for _, kind in subqs):
            pair_sets, inner_tables, ok = [], set(), True
            for subq, _kind in subqs:
                parsed = _parse_exists_inner(eng, subq, ot, oa, ocols)
                if parsed is None:
                    ok = False
                    break
                it_i, ok_i, ik_i = parsed
                inner_tables.add(it_i)
                pair_sets.append(frozenset(zip(ok_i, ik_i)))
            if (ok and len(inner_tables) == 1
                    and len(set(pair_sets)) == 1 and pair_sets[0]):
                pairs = sorted(pair_sets[0])
                return dict(base, inner=next(iter(inner_tables)),
                            okeys=[p[0] for p in pairs],
                            ikeys=[p[1] for p in pairs],
                            kind="multi_exists")
        # GENERAL path: terms over DIFFERENT inner tables (or key sets)
        # — per-term touched sets; the restricted outer's own keys then
        # restrict every inner (membership semantics per term, so the
        # exactness argument is per-term; see the maintainer docstring)
        terms = []
        for subq, kind in subqs:
            if kind == "exists":
                parsed = _parse_exists_inner(eng, subq, ot, oa, ocols)
                if parsed is None:
                    return None
                it_i, ok_i, ik_i = parsed
                terms.append({"inner": it_i, "okeys": ok_i,
                              "ikeys": ik_i})
                continue
            inner_sql = subq.group("inner").strip()
            if _SUBQ_BLOCKERS.search(inner_sql) or \
                    re.search(r"\(\s*SELECT", inner_sql, re.IGNORECASE):
                return None
            sm2 = _IN_INNER_RE.match(inner_sql)
            if not sm2:
                return None
            it_i = sm2.group("it").lower()
            ia2 = (sm2.group("ia") or sm2.group("it")).lower()
            if not (it_i in eng.tables or it_i in eng.views
                    or it_i in eng._maintainers) or it_i == ot:
                return None
            try:
                ifields = {f.name.lower(): f for f in
                           _source_rows0(eng, it_i).schema.fields}
            except Exception:
                return None
            ocol, icol = subq.group("col"), sm2.group("icol")
            if "(" in ocol or "," in icol:
                # tuple IN inside a multi-term body: single-term only
                return None
            oc, ic = ocol.split(".")[-1], icol.split(".")[-1]
            if "." in ocol and ocol.split(".")[0].lower() != oa:
                return None
            if "." in icol and icol.split(".")[0].lower() != ia2:
                return None
            if oc.lower() not in ocols or ic.lower() not in ifields:
                return None
            if sm2.group("ipred") and not _refs_only(
                    sm2.group("ipred"), {ia2}, set(ifields)):
                return None
            if subq.group("neg"):
                # NOT IN inside a multi-term body only when neither
                # side can be NULL — the three-valued counters live in
                # the dedicated single-term maintainer
                ofields = {f.name.lower(): f for f in
                           _source_rows0(eng, ot).schema.fields}
                if (ofields[oc.lower()].nullable
                        or ifields[ic.lower()].nullable):
                    return None
            terms.append({"inner": it_i, "okeys": [oc], "ikeys": [ic]})
        if any(not t["okeys"] for t in terms):
            return None
        return dict(base, terms=terms, kind="multi_subquery")
    subq, kind = subqs[0]
    inner_sql = subq.group("inner").strip()
    if _SUBQ_BLOCKERS.search(inner_sql) or \
            re.search(r"\(\s*SELECT", inner_sql, re.IGNORECASE):
        return None
    okeys, ikeys = [], []
    if kind == "exists":
        negated = bool(subq.group("neg"))
        parsed = _parse_exists_inner(eng, subq, ot, oa, ocols)
        if parsed is None:
            return None
        it, okeys, ikeys = parsed
    else:
        negated = bool(subq.group("neg"))
        sm = _IN_INNER_RE.match(inner_sql)
        if not sm:
            return None
        it = sm.group("it").lower()
        ia = (sm.group("ia") or sm.group("it")).lower()
        # hidden maintained views are valid inners (q18's grouped-HAVING
        # subquery pre-lowers to one and the IN probes its key column)
        if not (it in eng.tables or it in eng.views
                or it in eng._maintainers) or it == ot:
            return None
        try:
            ifields = {f.name.lower(): f
                       for f in _source_rows0(eng, it).schema.fields}
            icols = set(ifields)
        except Exception:
            return None
        out_cols = _in_term_cols(subq.group("col"))
        in_cols = [c.strip() for c in sm.group("icol").split(",")]
        if len(out_cols) != len(in_cols):
            return None          # tuple arity mismatch
        okeys, ikeys = [], []
        for ocol, icol in zip(out_cols, in_cols):
            oc = ocol.split(".")[-1]
            if "." in ocol and ocol.split(".")[0].lower() != oa:
                return None
            if oc.lower() not in ocols:
                return None
            ic = icol.split(".")[-1]
            if "." in icol and icol.split(".")[0].lower() != ia:
                return None
            if ic.lower() not in icols:
                return None
            okeys.append(oc)
            ikeys.append(ic)
        if sm.group("ipred") and not _refs_only(sm.group("ipred"), {ia},
                                                icols):
            return None
        nullable_not_in = False
        if negated:
            # NOT IN ≡ anti-join ONLY when neither side can be NULL
            # (a NULL on either side flips rows through the three-valued
            # semantics: outer-NULL rows are always filtered, one inner
            # NULL empties the whole view).  With nullable columns the
            # dedicated _NotInNullableMaintainer (single column) /
            # _NotInNullableTupleMaintainer (row-value form, r10 verdict
            # ask #4) carry the null/row counters and lenient-overlap
            # restriction that make those flips maintainable.
            ofields = {f.name.lower(): f
                       for f in _source_rows0(eng, ot).schema.fields}
            nullable_not_in = any(
                ofields[oc.lower()].nullable
                or ifields[ic.lower()].nullable
                for oc, ic in zip(okeys, ikeys))
    if not okeys:
        return None  # uncorrelated subquery flips globally; keep fallback
    from_clause = m.group("ot") + (f" {m.group('oa')}" if m.group("oa")
                                   else "")
    spec = {"outer": ot, "oa": oa, "inner": it, "okeys": okeys,
            "ikeys": ikeys, "sel": m.group("sel"),
            "from_clause": from_clause,
            "body": m.group("body"), "negated": negated, "kind": kind}
    if kind == "in":
        spec["ia"] = ia
        spec["ipred"] = sm.group("ipred")
        spec["nullable_not_in"] = nullable_not_in
    return spec


class _SubqueryFilterMaintainer(_ViewMaintainer):
    """``SELECT … FROM a WHERE [NOT] EXISTS (SELECT … FROM b WHERE
    b.k = a.j [AND ipred]) [AND opred]`` (and the ``IN (SELECT …)``
    form) — incremental semi/anti-join maintenance by touched-key
    recompute (the reference lowers these to ``join_index``/``antijoin``,
    semijoin.rs / join.rs:338; SURVEY §2.4).

    Per tick, the correlation-key groups appearing in either delta are
    re-evaluated through the original SQL with both tables restricted
    (null-safely) to those keys, and diffed against the stored output
    restricted the same way.  Restricting the *inner* side is exact: an
    outer row with key k only probes inner rows with key k, and k is in
    the touched set whenever either side of that group changed.  Hidden
    ``__k_i`` columns carry the outer correlation keys through the state
    so the restriction works even when the SELECT list drops them.  At
    scale both restrictions are broadcast semi-joins (the touched set is
    delta-sized) and re-evaluation cost ∝ rows in touched groups."""

    def __init__(self, eng, name, sql, spec):
        super().__init__(eng, name, sql)
        # 'exists' | 'not_exists' | 'in' | 'not_in'
        self.kind = (("not_" + spec["kind"]) if spec["negated"]
                     else spec["kind"])
        self.outer, self.inner = spec["outer"], spec["inner"]
        self.okeys = spec["okeys"]  # bare outer column names
        self.ikeys = spec["ikeys"]  # bare inner column names
        oa = spec["oa"]
        hidden = ", ".join(f"{oa}.{k} AS __k_{i}"
                           for i, k in enumerate(self.okeys))
        self._delta_sql = (
            f"SELECT {spec['sel']}, {hidden} FROM {spec['from_clause']} "
            f"WHERE {spec['body']}")
        first = eng.eval_on(self._delta_sql, {
            self.outer: _source_rows0(eng, self.outer),
            self.inner: _source_rows0(eng, self.inner)})
        empty = eng.spark.createDataFrame([], first.schema)
        self._out = StateTable(ZSetFrame.from_df(empty),
                               name=f"view_{name}_keyed")
        self._last_slices: dict | None = None

    def last_restrict_stats(self) -> dict | None:
        """Per-tick restricted-slice row counts (the SCALE.md claim:
        recompute cost ∝ touched correlation groups, not table size).
        None before the first non-empty tick; counts run on the pinned
        checkpointed slices, so reading this is side-effect-free."""
        if self._last_slices is None:
            return None
        return {k: df.count() for k, df in self._last_slices.items()}

    def step(self, eng, combined, old):
        da, db = combined.get(self.outer), combined.get(self.inner)
        if da is None and db is None:
            self._last_slices = None    # this tick restricted nothing
            return self._empty()
        with _no_constraint_propagation(eng.spark):
            return self._step_guarded(eng, da, db)

    def _step_guarded(self, eng, da, db):
        parts = []
        if da is not None:
            parts.append(da.df.select(
                *[F.col(c).alias(f"__t_{i}")
                  for i, c in enumerate(self.okeys)]))
        if db is not None:
            parts.append(db.df.select(
                *[F.col(c).alias(f"__t_{i}")
                  for i, c in enumerate(self.ikeys)]))
        touched = parts[0]
        for p in parts[1:]:
            touched = touched.unionByName(p)
        touched = touched.dropDuplicates().localCheckpoint(eager=True)

        # materialize the restricted slices (delta-sized) before rebinding:
        # Catalyst's subquery decorrelation chokes on semi-join lineage as
        # a subquery child (attribute-map lookup), and the checkpoint also
        # keeps re-evaluation from re-running the restriction twice
        o_t = _ns_semi_pos(_current_rows(eng, self.outer), touched,
                           self.okeys).localCheckpoint(eager=True)
        i_t = _ns_semi_pos(_current_rows(eng, self.inner), touched,
                           self.ikeys).localCheckpoint(eager=True)
        # scale-claim instrumentation (r8 verdict ask #5): the slices
        # are already checkpointed, so keeping references costs nothing
        # per tick; last_restrict_stats() counts them on demand and
        # tests assert restricted ≪ total on a small-delta tick
        self._last_slices = {"outer": o_t, "inner": i_t}
        new_out = ZSetFrame.from_df(
            eng.eval_on(self._delta_sql,
                        {self.outer: o_t, self.inner: i_t})
            .localCheckpoint(eager=True), 1)
        hidden = [f"__k_{i}" for i in range(len(self.okeys))]
        old_t = ZSetFrame(_ns_semi_pos(self._out.current.df, touched,
                                       hidden))
        # checkpoint the (delta-sized) keyed diff before it joins the
        # state union: the un-cut plan embeds the state twice (once as a
        # union branch, once under the semi-join) and Catalyst's attribute
        # dedup trips over the self-reference during optimization
        keyed_delta = ZSetFrame(new_out.minus(old_t).consolidate()
                                .df.localCheckpoint(eager=True))
        self._out.update(keyed_delta)
        delta = ZSetFrame(keyed_delta.df.drop(*hidden)).consolidate()
        self.apply_delta(delta)
        return delta


class _MultiSubqueryFilterMaintainer(_ViewMaintainer):
    """``SELECT … FROM a WHERE [NOT] EXISTS (… b …) AND [NOT] IN/EXISTS
    (… c …)`` — several subquery filter terms over DIFFERENT inner
    tables (or different correlation keys), each equality-correlated.
    The same decomposition the reference applies per term — semijoin /
    antijoin nodes, one per subquery (semijoin.rs, join.rs:338) — here
    as ONE touched-key recompute per tick:

    - per TERM, the touched set = that term's correlation keys in the
      outer delta ∪ its inner's delta keys;
    - the OUTER restriction = rows matching ANY term's touched set,
      built as an anti-chain split (each physical row lands in exactly
      one part, so multiplicities stay exact);
    - each INNER is restricted to the keys the RESTRICTED OUTER can
      probe (`o_t.okeys_t` projected onto the inner's key columns) —
      NOT to its own touched set: a row restricted because of term t
      must still evaluate term u against all of u's matching rows.
      Supersets are safe: every term has membership (EXISTS/IN)
      semantics, so extra or duplicate inner rows cannot flip truth;
    - re-evaluate the original SQL verbatim on the slices, diff
      against the stored output restricted by the same anti-chain on
      the hidden per-term key columns.

    An outer row outside every touched set is exact to skip: each of
    its term verdicts depends only on inner rows sharing that term's
    key, and none of those groups changed.  At scale every restriction
    is a broadcast semi-join of a delta-sized key set and the recompute
    cost is ∝ rows in touched correlation groups."""

    kind = "multi_subquery"

    def __init__(self, eng, name, sql, spec):
        super().__init__(eng, name, sql)
        self.outer = spec["outer"]
        self.terms = spec["terms"]
        oa = spec["oa"]
        hidden_items = []
        for t, term in enumerate(self.terms):
            for i, k in enumerate(term["okeys"]):
                hidden_items.append(f"{oa}.{k} AS __k_{t}_{i}")
        self._delta_sql = (
            f"SELECT {spec['sel']}, {', '.join(hidden_items)} "
            f"FROM {spec['from_clause']} WHERE {spec['body']}")
        first = eng.eval_on(self._delta_sql, {
            self.outer: _source_rows0(eng, self.outer),
            **{term["inner"]: _source_rows0(eng, term["inner"])
               for term in self.terms}})
        empty = eng.spark.createDataFrame([], first.schema)
        self._out = StateTable(ZSetFrame.from_df(empty),
                               name=f"view_{name}_keyed")
        self._last_slices: dict | None = None

    def last_restrict_stats(self) -> dict | None:
        """Per-tick restricted-slice row counts (SCALE.md's
        subquery-filter claim; r8 verdict ask #5).  Keys: ``outer`` plus
        one ``inner:<table>`` per term's restricted inner slice."""
        if self._last_slices is None:
            return None
        return {k: df.count() for k, df in self._last_slices.items()}

    def step(self, eng, combined, old):
        da = combined.get(self.outer)
        dbs = {term["inner"]: combined.get(term["inner"])
               for term in self.terms}
        if da is None and all(v is None for v in dbs.values()):
            self._last_slices = None    # this tick restricted nothing
            return self._empty()
        with _no_constraint_propagation(eng.spark):
            return self._step_guarded(eng, da, dbs)

    def _step_guarded(self, eng, da, dbs):
        touched = []
        for term in self.terms:
            parts = []
            if da is not None:
                parts.append(da.df.select(
                    *[F.col(c).alias(f"__t_{i}")
                      for i, c in enumerate(term["okeys"])]))
            db = dbs.get(term["inner"])
            if db is not None:
                parts.append(db.df.select(
                    *[F.col(c).alias(f"__t_{i}")
                      for i, c in enumerate(term["ikeys"])]))
            if not parts:
                touched.append(None)
                continue
            t_df = parts[0]
            for p in parts[1:]:
                t_df = t_df.unionByName(p)
            touched.append(t_df.dropDuplicates()
                           .localCheckpoint(eager=True))
        # anti-chain outer restriction: ANY-touched rows, each once
        o_rest = _current_rows(eng, self.outer)
        o_parts = []
        for term, t_df in zip(self.terms, touched):
            if t_df is None:
                continue
            o_parts.append(_ns_semi_pos(o_rest, t_df, term["okeys"]))
            o_rest = _ns_anti_pos(o_rest, t_df, term["okeys"])
        o_t = o_parts[0]
        for p in o_parts[1:]:
            o_t = o_t.unionByName(p)
        o_t = o_t.localCheckpoint(eager=True)
        bindings = {self.outer: o_t}
        for term in self.terms:
            probe = o_t.select(
                *[F.col(c).alias(f"__t_{i}")
                  for i, c in enumerate(term["okeys"])]).dropDuplicates()
            i_t = _ns_semi_pos(_current_rows(eng, term["inner"]), probe,
                               term["ikeys"]).localCheckpoint(eager=True)
            prev = bindings.get(term["inner"])
            # two terms sharing one inner table: union of their slices
            # (dedup is safe — membership semantics only)
            bindings[term["inner"]] = (
                i_t if prev is None
                else prev.unionByName(i_t).dropDuplicates())
        self._last_slices = {"outer": o_t,
                             **{f"inner:{t}": df
                                for t, df in bindings.items()
                                if t != self.outer}}
        new_out = ZSetFrame.from_df(
            eng.eval_on(self._delta_sql, bindings)
            .localCheckpoint(eager=True), 1)
        # stored output restricted by the same anti-chain on the hidden
        # per-term key columns
        old_rest = self._out.current.df
        old_parts = []
        for t, (term, t_df) in enumerate(zip(self.terms, touched)):
            if t_df is None:
                continue
            hk = [f"__k_{t}_{i}" for i in range(len(term["okeys"]))]
            old_parts.append(_ns_semi_pos(old_rest, t_df, hk))
            old_rest = _ns_anti_pos(old_rest, t_df, hk)
        old_df = old_parts[0]
        for p in old_parts[1:]:
            old_df = old_df.unionByName(p)
        old_t = ZSetFrame(old_df)
        keyed_delta = ZSetFrame(new_out.minus(old_t).consolidate()
                                .df.localCheckpoint(eager=True))
        self._out.update(keyed_delta)
        hidden_all = [f"__k_{t}_{i}" for t, term in enumerate(self.terms)
                      for i in range(len(term["okeys"]))]
        delta = ZSetFrame(keyed_delta.df.drop(*hidden_all)).consolidate()
        self.apply_delta(delta)
        return delta


class _NotInNullableMaintainer(_SubqueryFilterMaintainer):
    """``col NOT IN (SELECT icol FROM inner [WHERE ipred])`` over
    NULLABLE columns — full three-valued SQL semantics (the reference
    compiles NOT IN through the same antijoin, crates/dbsp semijoin.rs,
    but its demos rely on NOT NULL DDL; DuckDB and real users won't):

    * any NULL in the inner set   → NO outer row qualifies;
    * a NULL outer key            → qualifies iff the inner set is EMPTY
      (``x NOT IN (empty)`` is TRUE even for NULL x);
    * otherwise                   → ordinary anti-join.

    Those global flips are what break plain touched-key maintenance, so
    this subclass carries two O(1) counters — the inner multiset's row
    count and NULL count after ``ipred``, updated from each inner delta
    in O(Δ) — defining three regimes: A (inner has NULLs → view empty),
    B1 (non-empty, NULL-free → anti-join + outer keys NOT NULL), B2
    (inner empty → only outer-side predicates).  Within a regime, ticks
    maintain by the parent's touched-key recompute using the regime's
    rewritten SQL; a regime TRANSITION (an inner delta adding/removing
    the last NULL or last row) re-diffs the whole view that tick —
    inherent, since the view genuinely flips globally."""

    def __init__(self, eng, name, sql, spec):
        super().__init__(eng, name, sql, spec)
        self.kind = "not_in_nullable"
        ia, oa = spec["ia"], spec["oa"]
        ipred = spec.get("ipred")
        self._ipred = (_sub_outside_literals(rf"\b{ia}\s*\.\s*", "",
                                             ipred, re.IGNORECASE)
                       if ipred else None)
        self._ic = self.ikeys[0]
        hidden = ", ".join(f"{oa}.{k} AS __k_{i}"
                           for i, k in enumerate(self.okeys))
        self._delta_sql_b1 = (
            f"SELECT {spec['sel']}, {hidden} FROM {spec['from_clause']} "
            f"WHERE ({spec['body']}) AND ({oa}.{self.okeys[0]}) "
            f"IS NOT NULL")
        eng.eval_on(self._delta_sql_b1, {
            self.outer: _source_rows0(eng, self.outer),
            self.inner: _source_rows0(eng, self.inner)})
        # counters from current inner state (empty at CREATE; full after
        # recovery bootstrap, which re-executes against restored tables)
        inner_now = _current_rows(eng, self.inner)
        if self._ipred:
            inner_now = inner_now.filter(F.expr(self._ipred))
        r = inner_now.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(f"CAST(({self._ic}) IS NULL AS INT)"))
            .alias("z")).collect()[0]
        self._n_inner = int(r["n"] or 0)
        self._n_null = int(r["z"] or 0)

    def _regime(self) -> str:
        if self._n_null > 0:
            return "A"
        return "B1" if self._n_inner > 0 else "B2"

    def step(self, eng, combined, old):
        da, db = combined.get(self.outer), combined.get(self.inner)
        if da is None and db is None:
            return self._empty()
        with _no_constraint_propagation(eng.spark):
            return self._nn_step(eng, da, db)

    def _nn_step(self, eng, da, db):
        from database_stream_processor_spark.zset import WEIGHT_COL
        prev = self._regime()
        # __init__ already counted the RECOVERED inner snapshot — the
        # bootstrap replay of that same snapshot must not re-count it
        if db is not None and not getattr(eng, "_in_bootstrap", False):
            d = db.df
            if self._ipred:
                d = d.filter(F.expr(self._ipred))
            r = d.agg(
                F.sum(F.col(WEIGHT_COL)).alias("n"),
                F.sum(F.col(WEIGHT_COL)
                      * F.expr(f"CAST(({self._ic}) IS NULL AS INT)"))
                .alias("z")).collect()[0]
            self._n_inner += int(r["n"] or 0)
            self._n_null += int(r["z"] or 0)
        cur = self._regime()
        hidden = [f"__k_{i}" for i in range(len(self.okeys))]
        if cur == "A":
            if prev == "A":            # state already empty
                return self._empty()
            keyed_delta = ZSetFrame(self._out.current.neg().df
                                    .localCheckpoint(eager=True))
            self._out.update(keyed_delta)
            delta = ZSetFrame(keyed_delta.df.drop(*hidden)).consolidate()
            self.apply_delta(delta)
            return delta
        sqltxt = self._delta_sql_b1 if cur == "B1" else self._delta_sql
        if prev != cur:                # global flip: full re-diff
            o_t = _current_rows(eng, self.outer) \
                .localCheckpoint(eager=True)
            i_t = _current_rows(eng, self.inner) \
                .localCheckpoint(eager=True)
            old_t = ZSetFrame(self._out.current.df)
        else:
            parts = []
            if da is not None:
                parts.append(da.df.select(
                    *[F.col(c).alias(f"__t_{i}")
                      for i, c in enumerate(self.okeys)]))
            if db is not None:
                parts.append(db.df.select(
                    *[F.col(c).alias(f"__t_{i}")
                      for i, c in enumerate(self.ikeys)]))
            touched = parts[0]
            for p in parts[1:]:
                touched = touched.unionByName(p)
            touched = touched.dropDuplicates().localCheckpoint(eager=True)
            o_t = _ns_semi_pos(_current_rows(eng, self.outer), touched,
                               self.okeys).localCheckpoint(eager=True)
            i_t = _ns_semi_pos(_current_rows(eng, self.inner), touched,
                               self.ikeys).localCheckpoint(eager=True)
            old_t = ZSetFrame(_ns_semi_pos(self._out.current.df, touched,
                                           hidden))
        new_out = ZSetFrame.from_df(
            eng.eval_on(sqltxt, {self.outer: o_t, self.inner: i_t})
            .localCheckpoint(eager=True), 1)
        keyed_delta = ZSetFrame(new_out.minus(old_t).consolidate()
                                .df.localCheckpoint(eager=True))
        self._out.update(keyed_delta)
        delta = ZSetFrame(keyed_delta.df.drop(*hidden)).consolidate()
        self.apply_delta(delta)
        return delta


class _NotInNullableTupleMaintainer(_SubqueryFilterMaintainer):
    """``(a, b[, c]) NOT IN (SELECT x, y[, z] FROM inner [WHERE
    ipred])`` over NULLABLE columns — full three-valued ROW-VALUE
    semantics (r10 verdict ask #4; Calcite accepts the form,
    sql-to-dbsp §3.2; probed against Spark's own null-aware anti-join):
    row-eq is TRUE iff every column pair is equal-non-null, FALSE iff
    SOME column pair differs non-null, else UNKNOWN; an outer row
    passes iff every inner row compares FALSE.

    Counters from each inner delta in O(Δ) decide three regimes:

    * A  (an inner row with ALL compared columns NULL) → NO comparison
      can be FALSE → the view is globally EMPTY;
    * B2 (inner empty) → every outer row qualifies, even all-NULL keys;
    * B1 (otherwise)  → maintained by touched-key recompute, where —
      unlike the single-column case — the dependency relation is not
      key equality: inner row r affects outer row o iff they LENIENTLY
      overlap (∀i: o_i IS NULL OR r_i IS NULL OR o_i = r_i — exactly
      "row-eq is not FALSE").  The restriction therefore uses a
      lenient-overlap semi-join against the delta-sized touched set
      (broadcast nested-loop: one pass over the outer/state, predicate
      per row), then restricts the inner to the lenient partners of the
      recomputed outer keys — dropping a FALSE-comparing inner row
      never changes any kept row's verdict, so the slice is exact.
      A regime TRANSITION re-diffs the whole view that tick (inherent:
      the view genuinely flips globally)."""

    kind = "not_in_nullable_tuple"

    def __init__(self, eng, name, sql, spec):
        super().__init__(eng, name, sql, spec)
        self.kind = "not_in_nullable_tuple"
        ia = spec["ia"]
        ipred = spec.get("ipred")
        self._ipred = (_sub_outside_literals(rf"\b{ia}\s*\.\s*", "",
                                             ipred, re.IGNORECASE)
                       if ipred else None)
        self._allnull = " AND ".join(f"({c}) IS NULL"
                                     for c in self.ikeys)
        inner_now = _current_rows(eng, self.inner)
        if self._ipred:
            inner_now = inner_now.filter(F.expr(self._ipred))
        r = inner_now.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(f"CAST(({self._allnull}) AS INT)"))
            .alias("z")).collect()[0]
        self._n_inner = int(r["n"] or 0)
        self._n_allnull = int(r["z"] or 0)

    def _regime(self) -> str:
        if self._n_allnull > 0:
            return "A"
        return "B1" if self._n_inner > 0 else "B2"

    @staticmethod
    def _lenient_semi(df, cols, probe):
        """Rows of ``df`` whose ``cols`` tuple LENIENTLY overlaps some
        probe key (``__t_i`` columns): the exact dependency relation of
        three-valued row comparison.  The probe side is delta-sized →
        broadcast nested-loop, one pass over ``df``."""
        cond = None
        for i, c in enumerate(cols):
            t = (df[c].isNull() | probe[f"__t_{i}"].isNull()
                 | (df[c] == probe[f"__t_{i}"]))
            cond = t if cond is None else (cond & t)
        return df.join(F.broadcast(probe), cond, "leftsemi")

    @staticmethod
    def _lenient_semi_split(df, cols, probe):
        """NULL-free fast path of :meth:`_lenient_semi` (r11 verdict
        ask #5): for a NULL-free ``df`` row, lenient overlap with a
        NULL-free probe tuple degenerates to plain EQUALITY — a
        broadcast HASH semi-join (whole-stage codegen, no per-row
        predicate loop).  The nested-loop pass survives only for the
        rare NULL-carriers: (a) df rows with a NULL component (skipped
        STATICALLY when every compared column is non-nullable in the
        schema), and (b) NULL-carrying probe tuples — a NULL probe
        component is a wildcard that can touch null-free df rows too,
        so those probe rows BNL against the hash leg's anti-join
        remainder (legs stay disjoint: no row duplication in the bag).
        When the tick touches no NULL tuples — the common case — the
        bulk restriction is one hash semi-join."""
        cls = _NotInNullableTupleMaintainer
        nn_df, nn_p, eq = None, None, None
        for i, c in enumerate(cols):
            t = df[c].isNotNull()
            nn_df = t if nn_df is None else (nn_df & t)
            t = probe[f"__t_{i}"].isNotNull()
            nn_p = t if nn_p is None else (nn_p & t)
        nullable = {f.name.lower(): f.nullable for f in df.schema.fields}
        df_nullable = any(nullable.get(c.lower(), True) for c in cols)
        p_nf = probe.filter(nn_p)
        p_nc = probe.filter(~nn_p)
        df_nf = df.filter(nn_df) if df_nullable else df
        for i, c in enumerate(cols):
            t = df_nf[c] == p_nf[f"__t_{i}"]
            eq = t if eq is None else (eq & t)
        out = df_nf.join(F.broadcast(p_nf), eq, "leftsemi")
        if not p_nc.isEmpty():
            out = out.unionByName(cls._lenient_semi(
                df_nf.join(F.broadcast(p_nf), eq, "leftanti"),
                cols, p_nc))
        if df_nullable:
            out = out.unionByName(
                cls._lenient_semi(df.filter(~nn_df), cols, probe))
        return out

    def step(self, eng, combined, old):
        da, db = combined.get(self.outer), combined.get(self.inner)
        if da is None and db is None:
            return self._empty()
        with _no_constraint_propagation(eng.spark):
            return self._nnt_step(eng, da, db)

    def _nnt_step(self, eng, da, db):
        from database_stream_processor_spark.zset import WEIGHT_COL
        prev = self._regime()
        # __init__ already counted the RECOVERED inner snapshot — the
        # bootstrap replay of that same snapshot must not re-count it
        if db is not None and not getattr(eng, "_in_bootstrap", False):
            d = db.df
            if self._ipred:
                d = d.filter(F.expr(self._ipred))
            r = d.agg(
                F.sum(F.col(WEIGHT_COL)).alias("n"),
                F.sum(F.col(WEIGHT_COL)
                      * F.expr(f"CAST(({self._allnull}) AS INT)"))
                .alias("z")).collect()[0]
            self._n_inner += int(r["n"] or 0)
            self._n_allnull += int(r["z"] or 0)
        cur = self._regime()
        hidden = [f"__k_{i}" for i in range(len(self.okeys))]
        if cur == "A":
            if prev == "A":            # state already empty
                return self._empty()
            keyed_delta = ZSetFrame(self._out.current.neg().df
                                    .localCheckpoint(eager=True))
            self._out.update(keyed_delta)
            delta = ZSetFrame(keyed_delta.df.drop(*hidden)).consolidate()
            self.apply_delta(delta)
            return delta
        if prev != cur:                # global flip: full re-diff
            o_t = _current_rows(eng, self.outer) \
                .localCheckpoint(eager=True)
            i_t = _current_rows(eng, self.inner) \
                .localCheckpoint(eager=True)
            old_t = ZSetFrame(self._out.current.df)
        else:
            parts = []
            if da is not None:
                parts.append(da.df.select(
                    *[F.col(c).alias(f"__t_{i}")
                      for i, c in enumerate(self.okeys)]))
            if db is not None:
                parts.append(db.df.select(
                    *[F.col(c).alias(f"__t_{i}")
                      for i, c in enumerate(self.ikeys)]))
            touched = parts[0]
            for p in parts[1:]:
                touched = touched.unionByName(p)
            touched = touched.dropDuplicates().localCheckpoint(eager=True)
            if cur == "B2":
                # inner is empty — only outer-side deltas matter and the
                # dependency degenerates to the row itself
                o_t = _ns_semi_pos(_current_rows(eng, self.outer),
                                   touched, self.okeys) \
                    .localCheckpoint(eager=True)
                i_t = _current_rows(eng, self.inner) \
                    .localCheckpoint(eager=True)
                old_t = ZSetFrame(_ns_semi_pos(self._out.current.df,
                                               touched, hidden))
            else:
                o_t = self._lenient_semi_split(
                    _current_rows(eng, self.outer), self.okeys,
                    touched).localCheckpoint(eager=True)
                okeys_t = o_t.select(
                    *[F.col(c).alias(f"__t_{i}")
                      for i, c in enumerate(self.okeys)]) \
                    .dropDuplicates().localCheckpoint(eager=True)
                i_t = self._lenient_semi_split(
                    _current_rows(eng, self.inner), self.ikeys,
                    okeys_t).localCheckpoint(eager=True)
                old_t = ZSetFrame(self._lenient_semi_split(
                    self._out.current.df, hidden, touched))
        new_out = ZSetFrame.from_df(
            eng.eval_on(self._delta_sql, {self.outer: o_t,
                                          self.inner: i_t})
            .localCheckpoint(eager=True), 1)
        keyed_delta = ZSetFrame(new_out.minus(old_t).consolidate()
                                .df.localCheckpoint(eager=True))
        self._out.update(keyed_delta)
        delta = ZSetFrame(keyed_delta.df.drop(*hidden)).consolidate()
        self.apply_delta(delta)
        return delta


#: one top-level-AND term ``lhs <op> ANY|ALL|SOME (SELECT …)`` — the
#: lhs may be an arithmetic EXPRESSION chain over columns, parenthesized
#: groups, or single function calls (``o_totalprice * 2``, ``(a+b)/c``,
#: ``SUM(x)`` in a HAVING; r10 verdict ask #5b), not just a column
_QUANT_TERM = re.compile(
    r"^(?P<lhs>(?:\w+\s*\([^()]*\)|[\w.]+|\([^()]*\))"
    r"(?:\s*[-+*/%]\s*(?:\w+\s*\([^()]*\)|[\w.]+|\([^()]*\)))*)\s*"
    r"(?P<op>>=|<=|<>|!=|=|>|<)\s*"
    r"(?P<q>ANY|ALL|SOME)\s*\(\s*(?P<inner>SELECT\b.+)\)\s*$",
    re.IGNORECASE | re.DOTALL)

#: quantified-subquery inner body: one select EXPRESSION over one table
_QUANT_INNER_RE = re.compile(
    r"^SELECT\s+(?P<icol>.+?)\s+FROM\s+(?P<it>\w+)(?:\s+(?:AS\s+)?"
    r"(?P<ia>\w+))?(?:\s+WHERE\s+(?P<ipred>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL)

_AGG_FN_RE = re.compile(
    r"\b(SUM|COUNT|AVG|MIN|MAX|STDDEV\w*|VAR\w*|COLLECT\w*|FIRST"
    r"|LAST)\s*\(", re.IGNORECASE)

#: filter-TRUE rewrites of ``lhs op ALL/ANY (S)`` over the quantifier
#: scalars view (__q_empty, __q_hasnull, __qmn, __qmx) — derived from
#: the three-valued semantics and probed against DuckDB: ALL over an
#: empty set is TRUE (even for NULL lhs); any NULL element blocks ALL
#: and never satisfies ANY; NULL lhs with a non-empty set is UNKNOWN.
_QUANT_PREDS = {
    (">", "ALL"): "__q_empty OR (NOT __q_hasnull AND {L} > __qmx)",
    (">=", "ALL"): "__q_empty OR (NOT __q_hasnull AND {L} >= __qmx)",
    ("<", "ALL"): "__q_empty OR (NOT __q_hasnull AND {L} < __qmn)",
    ("<=", "ALL"): "__q_empty OR (NOT __q_hasnull AND {L} <= __qmn)",
    ("=", "ALL"): ("__q_empty OR (NOT __q_hasnull AND __qmn = __qmx "
                   "AND {L} = __qmn)"),
    (">", "ANY"): "{L} > __qmn",
    (">=", "ANY"): "{L} >= __qmn",
    ("<", "ANY"): "{L} < __qmx",
    ("<=", "ANY"): "{L} <= __qmx",
    ("<>", "ANY"): ("{L} IS NOT NULL AND (__qmn <> __qmx "
                    "OR {L} <> __qmn)"),
}


#: the CORRELATED variants read the hidden per-key grouped view after a
#: LEFT JOIN: an absent group (``__qn IS NULL``) is the empty set —
#: ALL holds (even for a NULL outer key, which correlates to nothing),
#: ANY fails; ``__qn = __qnn`` is the no-NULL-element condition
_QUANT_PREDS_CORR = {
    (">", "ALL"): "(__qn IS NULL OR (__qn = __qnn AND {L} > __qmx))",
    (">=", "ALL"): "(__qn IS NULL OR (__qn = __qnn AND {L} >= __qmx))",
    ("<", "ALL"): "(__qn IS NULL OR (__qn = __qnn AND {L} < __qmn))",
    ("<=", "ALL"): "(__qn IS NULL OR (__qn = __qnn AND {L} <= __qmn))",
    ("=", "ALL"): ("(__qn IS NULL OR (__qn = __qnn AND __qmn = __qmx "
                   "AND {L} = __qmn))"),
    (">", "ANY"): "({L} > __qmn)",
    (">=", "ANY"): "({L} >= __qmn)",
    ("<", "ANY"): "({L} < __qmx)",
    ("<=", "ANY"): "({L} <= __qmx)",
    ("<>", "ANY"): ("({L} IS NOT NULL AND (__qmn <> __qmx "
                    "OR {L} <> __qmn))"),
}


class _QuantScalarMaintainer(_ViewMaintainer):
    """Hidden 1-row scalars view behind a quantified comparison —
    ``(__q_empty, __q_hasnull, __qmn, __qmx)`` over the subquery's
    value multiset.  Counters maintain in O(Δ) from each inner delta;
    MIN/MAX update in O(Δ) on inserts and recompute from the integrated
    table only when a retraction touches the current extreme (the
    engine's touched-group discipline, collapsed to one global group —
    the reference maintains these through its aggregate operators,
    aggregate/mod.rs).  The row exists from the FIRST engine tick even
    if the inner table never receives data — ALL over an empty set is
    TRUE, so downstream must always see one row."""

    kind = "quant_scalars"
    sql_reads_sources = False

    def __init__(self, eng: "Engine", name: str, tbl: str, alias: str,
                 icol: str, ipred: str | None):
        self.name, self.table = name, tbl
        # alias-stripped copies: _delta_scalars evaluates directly over
        # the bound delta DataFrame, where the FROM alias doesn't exist
        strip = lambda t: _sub_outside_literals(
            rf"\b{alias}\s*\.\s*", "", t, re.IGNORECASE)
        self._icol, self._ipred = strip(icol), (ipred and strip(ipred))
        a = f" {alias}" if alias != tbl else ""
        w = f" WHERE {ipred}" if ipred else ""
        self._agg_sql = (
            f"SELECT COUNT(*) AS __qn, COUNT({icol}) AS __qnn, "
            f"MIN({icol}) AS __qmn, MAX({icol}) AS __qmx "
            f"FROM {tbl}{a}{w}")
        self.sql = self._agg_sql
        probe = eng.eval_on(self._agg_sql,
                            {tbl: _source_rows0(eng, tbl)})
        vt = dict(probe.dtypes)["__qmn"]
        schema = (f"__q_empty boolean, __q_hasnull boolean, "
                  f"__qmn {vt}, __qmx {vt}")
        empty = eng.spark.createDataFrame([], schema)
        self.state = StateTable(ZSetFrame.from_df(empty),
                                name=f"view_{name}")
        self._schema = empty.schema
        self._n = self._nn = 0
        self._mn = self._mx = None
        self._eng = eng
        # the row exists from CREATE time: the engine skips untouched
        # views entirely, and an outer-only tick must still see the
        # empty-set scalars (ALL over an empty set is TRUE)
        self.state.update(ZSetFrame.from_df(self._row_df(), 1))
        self._emitted = True

    def _row_df(self):
        row = (self._n == 0, self._n > self._nn, self._mn, self._mx)
        return self._eng.spark.createDataFrame([row], self._schema)

    def _agg_over(self, df: DataFrame):
        r = self._eng.eval_on(self._agg_sql, {self.table: df}) \
            .collect()[0]
        return (int(r["__qn"]), int(r["__qnn"]), r["__qmn"], r["__qmx"])

    def _delta_scalars(self, z: ZSetFrame):
        """Signed counters and per-sign extremes of ONE delta in ONE
        aggregate job (the pos/neg split would schedule two): counts
        sum the weights, extremes take MIN/MAX over the matching sign's
        rows only."""
        from database_stream_processor_spark.zset import WEIGHT_COL
        ic, w = self._icol, WEIGHT_COL
        d = z.df
        if self._ipred:
            d = d.filter(F.expr(self._ipred))
        r = d.agg(
            F.sum(F.col(w)).alias("n"),
            F.sum(F.col(w) * F.expr(
                f"CAST(({ic}) IS NOT NULL AS INT)")).alias("nn"),
            F.min(F.expr(f"CASE WHEN {w} > 0 THEN ({ic}) END"))
             .alias("pmn"),
            F.max(F.expr(f"CASE WHEN {w} > 0 THEN ({ic}) END"))
             .alias("pmx"),
            F.min(F.expr(f"CASE WHEN {w} < 0 THEN ({ic}) END"))
             .alias("nmn"),
            F.max(F.expr(f"CASE WHEN {w} < 0 THEN ({ic}) END"))
             .alias("nmx")).collect()[0]
        return (int(r["n"] or 0), int(r["nn"] or 0),
                r["pmn"], r["pmx"], r["nmn"], r["nmx"])

    def step(self, eng, combined, old):
        z = combined.get(self.table)
        if z is None and self._emitted:
            return self._empty()
        old_row = self._row_df() if self._emitted else None
        if z is not None:
            dn, dnn, pmn, pmx, nmn, nmx = self._delta_scalars(
                z.consolidate())
            self._n += dn
            self._nn += dnn
            recompute = (nmn is not None and self._mn is not None
                         and (nmn <= self._mn or nmx >= self._mx))
            if recompute:
                # a retraction may have removed the extreme: one
                # aggregate scan of the integrated inner table
                _, _, self._mn, self._mx = self._agg_over(
                    _current_rows(eng, self.table))
            else:
                if pmn is not None:
                    self._mn = pmn if self._mn is None \
                        else min(self._mn, pmn)
                    self._mx = pmx if self._mx is None \
                        else max(self._mx, pmx)
                if self._nn == 0:
                    self._mn = self._mx = None
        delta = ZSetFrame.from_df(self._row_df(), 1)
        if old_row is not None:
            delta = delta.plus(ZSetFrame.from_df(old_row, -1))
        self._emitted = True
        delta = delta.consolidate()
        self.apply_delta(delta)
        return delta


def _having_quantified_lift(eng: "Engine", name: str, flat: str):
    """Quantified comparison under HAVING (r10 verdict ask #5b) —
    ``SELECT k, SUM(x) AS s FROM t [WHERE p] GROUP BY k HAVING [pre
    AND] <agg-or-key> op ANY|ALL (SELECT …) [AND post]``: the grouped
    body (with the remaining HAVING conjuncts) becomes a hidden
    maintained view, the quantified term moves OUT to a WHERE over its
    output column, and the rewritten text re-lowers through
    :func:`_quantified_lift` — the same split discipline as
    :func:`_having_key_subquery_split`, sound because the quantified
    predicate only reads the group's OUTPUT row.  The lhs must resolve
    to a select-list item (by alias or normalized expression text) and
    the inner must not reference the grouped table (correlated
    HAVING-quantifiers refuse)."""
    m = _AGG_RE.match(flat)
    if m is None or not m.group("having"):
        raise _UnloweredShape("not a grouped HAVING select")
    tbl = m.group("tbl").lower()
    if not (tbl in eng.tables or tbl in eng.views
            or tbl in eng._maintainers):
        raise _UnloweredShape(f"unknown table {tbl}")
    having = m.group("having")
    if _mixed_top_and_or(having):
        raise _UnloweredShape("mixed top-level AND/OR in HAVING")
    moved, kept = [], []
    for t in _split_top_and(having):
        qm = _QUANT_TERM.match(t.strip())
        if qm and moved:
            raise _UnloweredShape("several quantified HAVING terms")
        (moved if qm else kept).append(qm or t)
    if not moved:
        raise _UnloweredShape("no quantified term in HAVING")
    qm = moved[0]
    if re.search(rf"\b{re.escape(tbl)}\b", qm.group("inner"),
                 re.IGNORECASE):
        raise _UnloweredShape("correlated quantified HAVING term")
    # resolve the lhs to the hidden view's OUTPUT column: a select-list
    # alias, a bare unaliased item, or a normalized expression match
    norm = lambda s: re.sub(r"\s+", "", s).lower()
    out_col = None
    for it in _split_top_level(m.group("sel")):
        am = re.match(r"^(?P<e>.+?)\s+AS\s+(?P<a>\w+)\s*$",
                      it.strip(), re.IGNORECASE | re.DOTALL)
        e, a = ((am.group("e"), am.group("a")) if am
                else (it.strip(), it.strip()))
        if norm(qm.group("lhs")) in (norm(e), norm(a)):
            if not re.match(r"^\w+$", a):
                raise _UnloweredShape(
                    "quantified HAVING lhs matches an unaliased "
                    "expression")
            out_col = a
            break
    if out_col is None:
        raise _UnloweredShape(
            "quantified HAVING lhs is not a select-list output")
    hidden = f"__{name}_hq"
    kept_txt = (" HAVING " + " AND ".join(kept)) if kept else ""
    hsql = (f"SELECT {m.group('sel')} FROM {m.group('tbl')}"
            + (f" WHERE {m.group('pred')}" if m.group("pred") else "")
            + f" GROUP BY {m.group('keys')}" + kept_txt)
    registered: list[str] = []
    try:
        _register_hidden(eng, hidden, hsql, registered)
        cols = ", ".join(_source_rows0(eng, hidden).columns)
        outer = (f"SELECT {cols} FROM {hidden} WHERE {out_col} "
                 f"{qm.group('op')} {qm.group('q')} "
                 f"({qm.group('inner').strip()})")
        fm = _lower_view(eng, name, outer)
        if fm.kind == "differentiate":
            raise _UnloweredShape("split quantified HAVING "
                                  "snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _quantified_multi_stage(eng: "Engine", name: str, m,
                            qterms: list, rest: list[str]):
    """SEVERAL uncorrelated order-quantified terms in ONE stage (r11
    verdict ask #6 — replaces the k peeled outer-sized state copies):
    one hidden 1-row :class:`_QuantScalarMaintainer` per term, and ONE
    view joining the outer to all of them — ``outer JOIN qs0 ON
    (pred0) JOIN qs1 ON (pred1) … WHERE plain-rest``.  Each scalars
    view is 1 row (broadcast-pinned), so the chain is k broadcast
    filters in one maintained stage; per tick ∝ Δouter, and a scalar
    flip retracts/re-derives through that view's Δ leg of the
    multilinear join.  Raises (caller falls back to peeling) on a
    correlated term, a complex/grouped inner, or a membership-routed
    op."""
    ot = m.group("ot").lower()
    oa = (m.group("oa") or m.group("ot")).lower()
    alias = f" {m.group('oa')}" if m.group("oa") else ""
    hids, preds, registered = [], [], []
    try:
        for i, qm in enumerate(qterms):
            op = qm.group("op").replace("!=", "<>")
            q = qm.group("q").upper()
            q = "ANY" if q == "SOME" else q
            if (op, q) not in _QUANT_PREDS:
                raise _UnloweredShape(
                    f"membership quantifier {op} {q} in multi-stage")
            inner_sql = qm.group("inner").strip()
            if _SUBQ_BLOCKERS.search(inner_sql) or re.search(
                    r"\(\s*SELECT", inner_sql, re.IGNORECASE):
                raise _UnloweredShape("complex inner in multi-stage")
            im = _QUANT_INNER_RE.match(inner_sql)
            if not im:
                raise _UnloweredShape("unparsed inner in multi-stage")
            it = im.group("it").lower()
            ia = (im.group("ia") or im.group("it")).lower()
            if not (it in eng.tables or it in eng.views
                    or it in eng._maintainers):
                raise _UnloweredShape(f"unknown inner table {it}")
            if _AGG_FN_RE.search(im.group("icol")):
                raise _UnloweredShape(
                    "aggregate in quantified inner select")
            try:
                icols = {f.name.lower()
                         for f in _source_rows0(eng, it).schema.fields}
            except Exception:
                raise _UnloweredShape(f"unreadable inner {it}")
            if not _refs_only(im.group("icol"), {ia}, icols) \
                    or (im.group("ipred") and not _refs_only(
                        im.group("ipred"), {ia}, icols)):
                # correlated term: the peel path handles it per-term
                raise _UnloweredShape("correlated term in multi-stage")
            hid = f"__{name}_qs{i}"
            hm = _QuantScalarMaintainer(eng, hid, it, ia,
                                        im.group("icol"),
                                        im.group("ipred"))
            eng._maintainers[hid] = hm
            eng._sources[hid] = {it}
            hm.state.current.rows().createOrReplaceTempView(hid)
            registered.append(hid)
            hids.append(hid)
            p = _QUANT_PREDS[(op, q)].format(L=f"({qm.group('lhs')})")
            preds.append(re.sub(
                r"\b(__q_empty|__q_hasnull|__qmn|__qmx)\b",
                lambda mm: f"{hid}.{mm.group(1)}", p))
        joins = " ".join(f"JOIN {h} ON ({p})"
                         for h, p in zip(hids, preds))
        where = f" WHERE {' AND '.join(rest)}" if rest else ""
        main = (f"SELECT /*+ BROADCAST({', '.join(hids)}) */ "
                f"{m.group('sel')} FROM {m.group('ot')}{alias} "
                f"{joins}{where}")
        fm = _lower_view(eng, name, main)
        if fm.kind == "differentiate":
            raise _UnloweredShape("multi-quantifier main snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _quantified_lift(eng: "Engine", name: str, flat: str):
    """``SELECT … FROM t WHERE [pre AND] lhs op ANY|ALL|SOME (SELECT
    expr FROM inner [WHERE ipred]) [AND post]`` — quantified comparison
    subqueries (the reference's Calcite frontend accepts these,
    sql-to-dbsp §3.2; Spark SQL has no surface for them at all, so
    there is no snapshot-diff net and refusals raise loudly).

    ``= ANY`` / ``= SOME`` ≡ ``IN`` and ``<> ALL`` ≡ ``NOT IN`` —
    rewritten textually and re-lowered through the (three-valued) IN
    machinery.  Order comparisons and ``= ALL`` / ``<> ANY`` depend on
    the value multiset only through (empty, has-null, min, max): a
    hidden :class:`_QuantScalarMaintainer` maintains that 1-row view,
    and the outer becomes a 2-table JOIN on the rewritten predicate —
    the bilinear join delta then gives O(Δ outer) ticks, and a scalar
    flip retracts/re-derives through the Δscalars ⋈ outer leg.

    Since r11: the lhs may be an arithmetic expression / function
    call; SEVERAL quantified terms (or a quantified term mixed with
    IN/EXISTS/scalar subqueries) PEEL one hidden stage per term class;
    GROUPED inners pre-lower into a hidden keyed view carrying the
    quantified value as ``__qv``; other complex UNCORRELATED inners
    (JOIN chains, DISTINCT, nested subqueries) pre-lower generically
    the same way; and correlated quantifiers may carry a COMPOSITE
    correlation key (several equalities → one multi-key group)."""
    m = _SUBQ_OUTER_RE.match(flat)
    if not m:
        raise _UnloweredShape("not an outer WHERE shape")
    ot = m.group("ot").lower()
    if not (ot in eng.tables or ot in eng.views
            or ot in eng._maintainers):
        raise _UnloweredShape(f"unknown table {ot}")
    oa = (m.group("oa") or m.group("ot")).lower()
    body = m.group("body")
    if _mixed_top_and_or(body):
        raise _UnloweredShape("mixed top-level AND/OR")
    terms = [(t.strip(), _QUANT_TERM.match(t.strip()))
             for t in _split_top_and(body)]

    def _scalar_routed(qm) -> bool:
        if not qm:
            return False
        op_ = qm.group("op").replace("!=", "<>")
        q_ = qm.group("q").upper()
        return (op_, "ANY" if q_ == "SOME" else q_) in _QUANT_PREDS
    squant = [(t, qm) for t, qm in terms if _scalar_routed(qm)]
    others = [t for t, qm in terms if not _scalar_routed(qm)]
    if len(squant) >= 2:
        # SEVERAL scalar-routed quantified terms (r11 verdict ask #6):
        # fold them into ONE stage — k 1-row scalar views joined to the
        # outer in a single maintained view — instead of one peeled
        # outer-sized state copy per term
        if not any(re.search(r"\(\s*SELECT", t, re.IGNORECASE)
                   for t in others):
            try:
                return _quantified_multi_stage(
                    eng, name, m, [qm for _, qm in squant], others)
            except _UnloweredShape:
                pass
        else:
            # other subquery terms (IN/EXISTS/scalar) remain: peel ALL
            # scalar-quantified terms together as ONE hidden stage (it
            # re-enters this lift and takes the multi-stage route);
            # the remainder re-lowers over it
            oa_ = (m.group("oa") or m.group("ot")).lower()
            alias_ = f" {m.group('oa')}" if m.group("oa") else ""
            hidden, i_ = f"__{name}_qp", 0
            while hidden in eng._maintainers:
                i_ += 1
                hidden = f"__{name}_qp{i_}"
            registered: list[str] = []
            try:
                _register_hidden(
                    eng, hidden,
                    f"SELECT {oa_}.* FROM {m.group('ot')}{alias_} "
                    f"WHERE {' AND '.join(t for t, _ in squant)}",
                    registered)
                fm = _lower_view(
                    eng, name,
                    f"SELECT {m.group('sel')} FROM {hidden} {oa_} "
                    f"WHERE {' AND '.join(others)}")
                if fm.kind != "differentiate":
                    return fm
                _cleanup_hidden(eng, registered)
                registered = []
            except _UnloweredShape:
                _cleanup_hidden(eng, registered)
            except Exception:
                _cleanup_hidden(eng, registered)
                raise
    quant, rest, peel = None, [], False
    for t, qm in terms:
        if qm and quant is None:
            quant = qm
        else:
            if qm or re.search(r"\(\s*SELECT", t, re.IGNORECASE):
                # several quantified terms / a quantified term mixed
                # with IN/EXISTS/scalar subqueries (both refused ≤r10):
                # peel the first quantified term into a hidden stage
                # below, the remainder re-lowers over it
                peel = True
            rest.append(t)
    if quant is None:
        raise _UnloweredShape("no quantified term")
    op = quant.group("op").replace("!=", "<>")
    q = quant.group("q").upper()
    q = "ANY" if q == "SOME" else q
    lhs, inner_sql = quant.group("lhs"), quant.group("inner").strip()
    alias = f" {m.group('oa')}" if m.group("oa") else ""
    if (op, q) in {("=", "ANY"), ("<>", "ALL")}:
        # exact membership semantics — the IN machinery's job
        neg = "NOT " if op == "<>" else ""
        new_body = " AND ".join(
            rest + [f"{lhs} {neg}IN ({inner_sql})"])
        return _lower_view(
            eng, name,
            f"SELECT {m.group('sel')} FROM {m.group('ot')}{alias} "
            f"WHERE {new_body}")
    if (op, q) not in _QUANT_PREDS:
        raise _UnloweredShape(f"unsupported quantifier {op} {q}")
    if peel:
        # hidden stage carrying ONLY this quantified term over the
        # outer's full column set (aliased back to the outer's name so
        # the remainder's qualifiers keep resolving); the rest of the
        # WHERE — further quantified terms, IN/EXISTS subqueries,
        # plain predicates — re-lowers over the hidden view, one term
        # class per stage
        # unique per stage: re-lowering the remainder re-enters this
        # lift under the SAME view name (a 3-term stack peels twice)
        hidden, i_ = f"__{name}_qp", 0
        while hidden in eng._maintainers:
            i_ += 1
            hidden = f"__{name}_qp{i_}"
        registered: list[str] = []
        try:
            _register_hidden(
                eng, hidden,
                f"SELECT {oa}.* FROM {m.group('ot')}{alias} "
                f"WHERE {quant.group(0).strip()}", registered)
            fm = _lower_view(
                eng, name,
                f"SELECT {m.group('sel')} FROM {hidden} {oa} "
                f"WHERE {' AND '.join(rest)}")
            if fm.kind == "differentiate":
                raise _UnloweredShape("peeled quantified remainder "
                                      "snapshot-diffs")
            return fm
        except Exception:
            _cleanup_hidden(eng, registered)
            raise
    if re.search(r"\bGROUP\s+BY\b", inner_sql, re.IGNORECASE) \
            and not re.search(rf"\b{re.escape(oa)}\s*\.", inner_sql,
                              re.IGNORECASE):
        # GROUPED inner (r11): ``x > ALL (SELECT SUM(v) FROM t GROUP BY
        # g [HAVING …])`` — the grouped body pre-lowers into a hidden
        # maintained view carrying its keys plus the quantified value
        # as ``__qv``, and the view text re-lowers with the inner
        # replaced by the simple ``SELECT __qv FROM <hidden>`` shape
        gm = _AGG_RE.match(inner_sql)
        sel_items = (gm and _split_top_level(gm.group("sel")))
        if gm and len(sel_items) == 1:
            e_ = re.match(r"^(?P<e>.+?)(?:\s+AS\s+\w+)?\s*$",
                          sel_items[0].strip(),
                          re.IGNORECASE | re.DOTALL).group("e")
            keys = [k.strip()
                    for k in _split_top_level(gm.group("keys"))]
            key_cols = ", ".join(f"{k} AS __qk_{i}"
                                 for i, k in enumerate(keys))
            hidq, j_ = f"__{name}_qi", 0
            while hidq in eng._maintainers:
                j_ += 1
                hidq = f"__{name}_qi{j_}"
            hsql = (f"SELECT {key_cols}, {e_} AS __qv "
                    f"FROM {gm.group('tbl')}"
                    + (f" WHERE {gm.group('pred')}"
                       if gm.group("pred") else "")
                    + f" GROUP BY {gm.group('keys')}"
                    + (f" HAVING {gm.group('having')}"
                       if gm.group("having") else ""))
            registered = []
            try:
                _register_hidden(eng, hidq, hsql, registered)
                new_body = " AND ".join(
                    rest + [f"({lhs}) {op} {q} "
                            f"(SELECT __qv FROM {hidq})"])
                fm = _lower_view(
                    eng, name,
                    f"SELECT {m.group('sel')} "
                    f"FROM {m.group('ot')}{alias} WHERE {new_body}")
                if fm.kind == "differentiate":
                    raise _UnloweredShape(
                        "grouped quantified inner snapshot-diffs")
                return fm
            except Exception:
                _cleanup_hidden(eng, registered)
                raise
    if (_SUBQ_BLOCKERS.search(inner_sql)
            or re.search(r"\(\s*SELECT", inner_sql, re.IGNORECASE)) \
            and not re.search(rf"\b{re.escape(oa)}\s*\.", inner_sql,
                              re.IGNORECASE):
        # other complex UNCORRELATED inners (JOIN chains, DISTINCT,
        # set ops, …): pre-lower the whole inner into a hidden
        # maintained view with its single select item aliased ``__qv``
        # — _register_hidden refuses if the body itself cannot lower,
        # so nothing silently snapshot-diffs (r11)
        parts_i = _split_select_from(inner_sql)
        items_i = (parts_i and _split_top_level(parts_i[0]))
        if items_i and len(items_i) == 1 \
                and items_i[0].strip() != "*" \
                and not items_i[0].strip().endswith(".*"):
            e_ = re.match(r"^(?P<e>.+?)(?:\s+AS\s+\w+)?\s*$",
                          items_i[0].strip(),
                          re.IGNORECASE | re.DOTALL).group("e")
            hidq, j_ = f"__{name}_qi", 0
            while hidq in eng._maintainers:
                j_ += 1
                hidq = f"__{name}_qi{j_}"
            registered = []
            try:
                _register_hidden(eng, hidq,
                                 f"SELECT {e_} AS __qv "
                                 f"FROM {parts_i[1]}", registered)
                new_body = " AND ".join(
                    rest + [f"({lhs}) {op} {q} "
                            f"(SELECT __qv FROM {hidq})"])
                fm = _lower_view(
                    eng, name,
                    f"SELECT {m.group('sel')} "
                    f"FROM {m.group('ot')}{alias} WHERE {new_body}")
                if fm.kind == "differentiate":
                    raise _UnloweredShape(
                        "complex quantified inner snapshot-diffs")
                return fm
            except Exception:
                _cleanup_hidden(eng, registered)
                raise
    if _SUBQ_BLOCKERS.search(inner_sql) or \
            re.search(r"\(\s*SELECT", inner_sql, re.IGNORECASE):
        raise _UnloweredShape("complex quantified inner body")
    im = _QUANT_INNER_RE.match(inner_sql)
    if not im:
        raise _UnloweredShape("unparsed quantified inner body")
    it = im.group("it").lower()
    ia = (im.group("ia") or im.group("it")).lower()
    if not (it in eng.tables or it in eng.views
            or it in eng._maintainers):
        raise _UnloweredShape(f"unknown inner table {it}")
    if _AGG_FN_RE.search(im.group("icol")):
        raise _UnloweredShape("aggregate in quantified inner select")
    try:
        icols = {f.name.lower()
                 for f in _source_rows0(eng, it).schema.fields}
    except Exception:
        raise _UnloweredShape(f"unreadable inner {it}")
    if not _refs_only(im.group("icol"), {ia}, icols):
        raise _UnloweredShape("outer reference in quantified select")
    # split the inner WHERE into correlation equalities (outer side
    # explicitly qualified with the outer alias; SEVERAL equalities
    # compose into one multi-key group since r11) and inner-only terms
    corr: list = []
    inner_terms: list[str] = []
    if im.group("ipred"):
        if _mixed_top_and_or(im.group("ipred")):
            raise _UnloweredShape("mixed AND/OR in quantified inner")
        for t in _split_top_and(im.group("ipred")):
            t = t.strip()
            cm = re.match(
                rf"^{re.escape(oa)}\.(\w+)\s*=\s*([\w.]+)$"
                rf"|^([\w.]+)\s*=\s*{re.escape(oa)}\.(\w+)$",
                t, re.IGNORECASE)
            ocol_c = cm and (cm.group(1) or cm.group(4))
            icol_c = cm and (cm.group(2) or cm.group(3))
            if cm and icol_c.split(".")[0].lower() != oa:
                ic_b = icol_c.split(".")[-1]
                if "." in icol_c and \
                        icol_c.split(".")[0].lower() != ia:
                    raise _UnloweredShape(
                        f"unattributable qualifier in {t!r}")
                if ic_b.lower() not in icols:
                    raise _UnloweredShape(
                        f"correlation inner side {ic_b!r} unknown")
                corr.append((ocol_c, icol_c))
                continue
            if not _refs_only(t, {ia}, icols):
                raise _UnloweredShape(
                    f"outer reference outside a correlation "
                    f"equality: {t!r}")
            inner_terms.append(t)
    hid = f"__{name}_qs"
    registered: list[str] = [hid]
    try:
        ia_txt = f" {im.group('ia')}" if im.group("ia") else ""
        if corr:
            # CORRELATED: per-key scalars — a hidden grouped view
            # (nonlinear agg: COUNT/COUNT/MIN/MAX per correlation key,
            # possibly COMPOSITE) LEFT JOINed on the key(s); an absent
            # group (__qn IS NULL) is the empty set, so ALL holds and
            # ANY fails — including for a NULL outer key, which
            # correlates to nothing.  Both stages are existing
            # maintainers: per tick ∝ touched keys.
            key_cols = ", ".join(f"{ic} AS __qk_{i}"
                                 for i, (_, ic) in enumerate(corr))
            key_grp = ", ".join(ic for _, ic in corr)
            iw = (" WHERE " + " AND ".join(inner_terms)
                  if inner_terms else "")
            hsql = (f"SELECT {key_cols}, COUNT(*) AS __qn, "
                    f"COUNT({im.group('icol')}) AS __qnn, "
                    f"MIN({im.group('icol')}) AS __qmn, "
                    f"MAX({im.group('icol')}) AS __qmx "
                    f"FROM {im.group('it')}{ia_txt}{iw} "
                    f"GROUP BY {key_grp}")
            _register_hidden(eng, hid, hsql, registered)
            pred = _QUANT_PREDS_CORR[(op, q)].format(
                L=f"({lhs})", H=hid)
            on = " AND ".join(
                f"{oa}.{oc} = {hid}.__qk_{i}"
                for i, (oc, _) in enumerate(corr))
            where = f" WHERE {' AND '.join(rest + [pred])}"
            main = (f"SELECT {m.group('sel')} "
                    f"FROM {m.group('ot')}{alias} "
                    f"LEFT JOIN {hid} ON {on}{where}")
        else:
            hm = _QuantScalarMaintainer(
                eng, hid, it, (im.group("ia") or it).lower(),
                im.group("icol"), im.group("ipred"))
            eng._maintainers[hid] = hm
            eng._sources[hid] = {it}
            hm.state.current.rows().createOrReplaceTempView(hid)
            pred = _QUANT_PREDS[(op, q)].format(L=f"({lhs})")
            where = f" WHERE {' AND '.join(rest)}" if rest else ""
            # pin the broadcast to the 1-row scalars side: the state-
            # backed view has no stats, and Catalyst otherwise builds
            # on the parquet side — at scale that broadcasts the TABLE
            # (the correlated path below deliberately has no hint: its
            # hidden view is per-key and may not fit a broadcast)
            main = (f"SELECT /*+ BROADCAST({hid}) */ {m.group('sel')} "
                    f"FROM {m.group('ot')}{alias} "
                    f"JOIN {hid} ON ({pred}){where}")
        fm = _lower_view(eng, name, main)
        if fm.kind == "differentiate":
            raise _UnloweredShape("quantified main snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


#: SELECT … FROM (SELECT …, ROW_NUMBER() OVER (PARTITION BY … ORDER BY …)
#: AS rn FROM t [WHERE p]) [x] WHERE rn <= k  — the nexmark q18/q19 idiom
_TOPK_RE = re.compile(
    r"^SELECT\s+(?P<sel>.+?)\s+FROM\s+\(\s*SELECT\s+(?P<isel>.+?),\s*"
    r"(?P<fn>ROW_NUMBER|RANK|DENSE_RANK)\s*\(\s*\)\s+OVER\s*\("
    r"\s*PARTITION\s+BY\s+(?P<pks>.+?)\s+ORDER\s+BY\s+(?P<ord>.+?)\s*\)"
    r"\s+AS\s+(?P<rn>\w+)\s+FROM\s+(?P<tbl>\w+)(?:\s+(?:AS\s+)?"
    r"(?P<ia>\w+))?(?:\s+WHERE\s+(?P<ipred>.+?))?\s*\)\s*"
    r"(?:(?:AS\s+)?(?P<sa>\w+)\s+)?WHERE\s+(?P<cond>.+?)\s*$",
    re.IGNORECASE | re.DOTALL)

_TOPK_COND = re.compile(r"^(?:(?P<q>\w+)\.)?(?P<rn>\w+)\s*(?:<=|<|=)\s*\d+$")


class _GroupTopKMaintainer(_ViewMaintainer):
    """Per-group top-k view (``ROW_NUMBER()/RANK() OVER (PARTITION BY g
    ORDER BY s) <= k``) — the reference's ``topk`` operator surfaced
    through SQL (nexmark q18/q19; SURVEY §2.6 WindowGroupLimit).

    Rank is a per-partition property, so maintenance is touched-group
    recompute: only partitions whose rows changed this tick re-rank, the
    rest of the state is untouched.  The inner select carries the
    partition keys as hidden ``__k_i`` columns into the stored output so
    the diff restriction works when the outer SELECT drops them.  Cost
    per tick ∝ rows in touched partitions; at scale the touched
    restriction is a broadcast semi-join and Spark executes the re-rank
    as WindowGroupLimit (top-k pushdown, no full sort)."""

    kind = "group_topk"

    def __init__(self, eng, name, sql, m):
        cond = " ".join(m.group("cond").split())
        cm = _TOPK_COND.match(cond)
        if not cm or cm.group("rn").lower() != m.group("rn").lower():
            raise _UnloweredShape(cond)
        tbl = m.group("tbl").lower()
        ia = (m.group("ia") or m.group("tbl")).lower()
        pks = [k.strip() for k in _split_top_level(m.group("pks"))]
        keys = []
        for k in pks:
            kk = k.split(".")[-1]
            if not re.match(r"^\w+$", kk) or \
                    ("." in k and k.split(".")[0].lower() != ia):
                raise _UnloweredShape(k)
            keys.append(kk)
        icols = {f.name.lower() for f in _source_rows0(eng, tbl).schema.fields}
        if any(k.lower() not in icols for k in keys):
            raise _UnloweredShape(m.group("pks"))
        super().__init__(eng, name, sql)
        self.table = tbl
        self.keys = keys
        hidden_in = ", ".join(f"{k} AS __k_{i}" for i, k in enumerate(pks))
        hidden_out = ", ".join(f"__k_{i}" for i in range(len(keys)))
        ia_txt = f" {m.group('ia')}" if m.group("ia") else ""
        ipred = f" WHERE {m.group('ipred')}" if m.group("ipred") else ""
        sa_txt = f" {m.group('sa')}" if m.group("sa") else ""
        outer_sel = m.group("sel").strip()
        outer_sel = (outer_sel if outer_sel == "*"
                     else f"{outer_sel}, {hidden_out}")
        self._delta_sql = (
            f"SELECT {outer_sel} FROM (SELECT {m.group('isel')}, "
            f"{hidden_in}, {m.group('fn')}() OVER (PARTITION BY "
            f"{m.group('pks')} ORDER BY {m.group('ord')}) AS "
            f"{m.group('rn')} FROM {tbl}{ia_txt}{ipred}){sa_txt} "
            f"WHERE {cond}")
        first = eng.eval_on(self._delta_sql,
                            {tbl: _source_rows0(eng, tbl)})
        empty = eng.spark.createDataFrame([], first.schema)
        self._out = StateTable(ZSetFrame.from_df(empty),
                               name=f"view_{name}_keyed")

    def step(self, eng, combined, old):
        z = combined.get(self.table)
        if z is None:
            return self._empty()
        with _no_constraint_propagation(eng.spark):
            return self._step_guarded(eng, z)

    def _step_guarded(self, eng, z):
        touched = z.df.select(
            *[F.col(c).alias(f"__t_{i}")
              for i, c in enumerate(self.keys)]) \
            .dropDuplicates().localCheckpoint(eager=True)
        t_rows = _ns_semi_pos(_current_rows(eng, self.table), touched,
                              self.keys).localCheckpoint(eager=True)
        new_out = ZSetFrame.from_df(
            eng.eval_on(self._delta_sql, {self.table: t_rows})
            .localCheckpoint(eager=True), 1)
        hidden = [f"__k_{i}" for i in range(len(self.keys))]
        old_t = ZSetFrame(_ns_semi_pos(self._out.current.df, touched,
                                       hidden))
        # checkpoint the (delta-sized) keyed diff before the state union —
        # see _SubqueryFilterMaintainer.step for the self-reference rationale
        keyed_delta = ZSetFrame(new_out.minus(old_t).consolidate()
                                .df.localCheckpoint(eager=True))
        self._out.update(keyed_delta)
        delta = ZSetFrame(keyed_delta.df.drop(*hidden)).consolidate()
        self.apply_delta(delta)
        return delta


#: SELECT … FROM t [WHERE p] ORDER BY … LIMIT k — global top-k view
_GLOBAL_TOPK_RE = re.compile(
    r"^SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<tbl>\w+)(?:\s+(?:AS\s+)?"
    r"(?P<alias>\w+))?(?:\s+WHERE\s+(?P<pred>.+?))?\s+ORDER\s+BY\s+"
    r"(?P<ord>.+?)\s+LIMIT\s+(?P<k>\d+)\s*$", re.IGNORECASE | re.DOTALL)

_GLOBAL_TOPK_BLOCKERS = re.compile(
    r"\b(GROUP\s+BY|DISTINCT|UNION|INTERSECT|EXCEPT|OVER|HAVING|JOIN"
    r"|LEFT|RIGHT|FULL|OUTER|CROSS)\b|\(\s*SELECT", re.IGNORECASE)

_ORD_ITEM = re.compile(r"^(?:\w+\.)?(?P<col>\w+)(?:\s+(?P<dir>ASC|DESC))?$",
                       re.IGNORECASE)


class _GlobalTopKMaintainer(_ViewMaintainer):
    """``SELECT … FROM t [WHERE p] ORDER BY s [DESC][, …] LIMIT k`` —
    global top-k (topk.rs family; SURVEY §2.6) with a delta short-circuit:

    Most ticks cost O(Δ): the projected delta is checked against the
    stored top-k — a retraction hitting a stored row, an insert whose
    first sort key is better-or-equal to the stored k-th (non-strict, so
    boundary ties over-trigger rather than under-trigger), or a stored
    set still under k rows invalidate; only then does the view recompute,
    and that recompute is Spark's TakeOrderedAndProject (per-partition
    partial top-k, no full sort).  Ticks that cannot change the result
    emit nothing without touching the table."""

    kind = "global_topk"

    def __init__(self, eng, name, sql, m):
        ords = [o.strip() for o in _split_top_level(m.group("ord"))]
        om = _ORD_ITEM.match(ords[0])
        if not om:
            raise _UnloweredShape(m.group("ord"))
        tbl = m.group("tbl").lower()
        super().__init__(eng, name, sql)
        self.table = tbl
        self._first_col = om.group("col")
        self._desc = (om.group("dir") or "ASC").upper() == "DESC"
        self.k = int(m.group("k"))
        if self._first_col not in self.state.current.df.columns:
            # the boundary check needs the first sort key in the output
            raise _UnloweredShape(self._first_col)
        alias = f" {m.group('alias')}" if m.group("alias") else ""
        where = f" WHERE {m.group('pred')}" if m.group("pred") else ""
        #: delta projection — the rows of Δt that survive SELECT/WHERE
        self._proj_sql = (f"SELECT {m.group('sel')} FROM {tbl}{alias}"
                          f"{where}")

    def step(self, eng, combined, old):
        z = combined.get(self.table)
        if z is None:
            return self._empty()
        with _no_constraint_propagation(eng.spark):
            return self._step_guarded(eng, z)

    def _step_guarded(self, eng, z):
        pos, neg = _split_parts(z)
        dp = eng.eval_on(self._proj_sql, {self.table: pos})
        dn = eng.eval_on(self._proj_sql, {self.table: neg})
        cur = self.state.current
        cur_rows = cur.rows()
        invalidated = cur_rows.count() < self.k
        if not invalidated and not dn.isEmpty():
            # a retraction touching a stored row forces a re-fill
            cond = None
            for c in dn.columns:
                e = dn[c].eqNullSafe(cur_rows[c])
                cond = e if cond is None else (cond & e)
            invalidated = not dn.join(cur_rows, on=cond,
                                      how="left_semi").isEmpty()
        if not invalidated and not dp.isEmpty():
            fc = self._first_col
            has_null = not cur_rows.filter(F.col(fc).isNull()).isEmpty()
            kth = (cur_rows.agg(
                (F.min if self._desc else F.max)(fc)
                .alias("__kth")).collect()[0]["__kth"])
            if kth is None or has_null:
                # a NULL boundary key defeats the scalar comparison
                # (Spark: NULLS FIRST under ASC, LAST under DESC) —
                # over-trigger rather than reason about NULL ordering
                invalidated = True
            else:
                c = F.col(fc)
                if self._desc:
                    beats = c >= F.lit(kth)  # DESC: NULLs last, can't win
                else:
                    # ASC puts NULLs first — a NULL insert displaces
                    beats = (c <= F.lit(kth)) | c.isNull()
                invalidated = not dp.filter(beats).isEmpty()
        if not invalidated:
            return self._empty()
        new_top = ZSetFrame.from_df(
            eng.eval_on(self.sql, {self.table: _current_rows(
                eng, self.table)}).localCheckpoint(eager=True), 1)
        delta = ZSetFrame(new_top.minus(cur).consolidate()
                          .df.localCheckpoint(eager=True))
        self.apply_delta(delta)
        return delta


#: SELECT … ORDER BY <plain cols> LIMIT k with ANY body before the tail
_ORDER_LIMIT_RE = re.compile(
    r"^(?P<body>SELECT\s+.+?)\s+ORDER\s+BY\s+(?P<ord>[^()]+?)\s+"
    r"LIMIT\s+(?P<k>\d+)\s*$", re.IGNORECASE | re.DOTALL)


def _topk_over_from(eng: "Engine", name: str, flat: str):
    """``ORDER BY … LIMIT k`` over a COMPLEX body (join chains, scalar
    subqueries — verbatim TPC-H q2's tail): synthesize a hidden
    maintained view ``__{name}_pre`` for everything before the tail
    (lowered through the ordinary recognizers, including the
    scalar-subquery stacks), then layer :class:`_GlobalTopKMaintainer`
    on its O(Δ) output delta.  Every ORDER BY item must be an output
    column of the body (TPC-H text orders by select-list columns).
    Raises :class:`_UnloweredShape` when the body itself only
    snapshot-diffs — layering top-k over a full recompute adds nothing."""
    from database_stream_processor_spark.zset import WEIGHT_COL
    m = _ORDER_LIMIT_RE.match(flat)
    if m is None:
        raise _UnloweredShape("no ORDER BY … LIMIT tail")
    body = m.group("body").strip()
    hidden = f"__{name}_pre"
    registered: list[str] = []
    try:
        _register_hidden(eng, hidden, body, registered)
        hm = eng._maintainers[hidden]
        out_cols = [c for c in hm.state.current.df.columns
                    if c != WEIGHT_COL]
        lowcols = {c.lower(): c for c in out_cols}
        items = []
        for o in _split_top_level(m.group("ord")):
            om = _ORD_ITEM.match(o.strip())
            if om is None or om.group("col").lower() not in lowcols:
                raise _UnloweredShape(f"ORDER BY item not an output "
                                      f"column: {o}")
            d = f" {om.group('dir').upper()}" if om.group("dir") else ""
            items.append(lowcols[om.group("col").lower()] + d)
        outer = (f"SELECT {', '.join(out_cols)} FROM {hidden} "
                 f"ORDER BY {', '.join(items)} LIMIT {m.group('k')}")
        gm = _GLOBAL_TOPK_RE.match(outer)
        return _GlobalTopKMaintainer(eng, name, outer, gm)
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _ns_join(left: DataFrame, right: DataFrame, keys: list[str],
             how: str) -> DataFrame:
    """Join on ``keys`` with null-safe equality (``<=>``) and coalesce the
    key columns into one set — SQL GROUP BY treats NULL as a real group,
    so the per-group merge joins must too (plain ``on=[cols]`` equality
    would silently drop NULL-keyed groups)."""
    r = right
    for k in keys:
        r = r.withColumnRenamed(k, f"__r_{k}")
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(r[f"__r_{k}"])
        cond = c if cond is None else (cond & c)
    j = left.join(r, cond, how)
    if how == "left_semi":
        return j
    other = [c for c in j.columns
             if c not in keys and not c.startswith("__r_")]
    return j.select(
        *[F.coalesce(j[k], j[f"__r_{k}"]).alias(k) for k in keys], *other)


class _GroupMergeMaintainer(_ViewMaintainer):
    """Shared core for linear GROUP BY maintenance
    (aggregate/mod.rs:253-273): subclasses produce *signed partial
    aggregates* from the tick's delta (each: per-group SUM/COUNT rows plus
    a hidden liveness COUNT); this base merges them with the stored
    per-group output joined on *touched keys only*.  The input integral is
    never scanned — not even kept.  The hidden count tracks group liveness
    so fully-retracted groups emit a retraction."""

    _CNT = "__live_cnt"

    keys: list[str]
    agg_names: list[str]

    def _init_out(self, eng, name, first_df: DataFrame) -> None:
        self._out = StateTable(ZSetFrame.from_df(first_df.limit(0)),
                               name=f"view_{name}_groups")

    def _maybe_salt(self, eng, delta_sql: str) -> str:
        """Wrap the per-delta partial aggregate in a two-stage
        (keys, salt) → (keys) split when the engine declares hot keys
        (``Engine(agg_salts=N)``) — the SQL-path plumbing of
        ``LinearAggregateOp(n_salts=...)`` (plans/incremental.py): a key
        hot enough that map-side partial aggregation still overwhelms
        one reducer is spread over N sub-groups first, then merged.
        All partial columns are sums, so the split is exact for
        integer/decimal aggregates (double sums may differ in low bits —
        SQL never guaranteed their addition order anyway)."""
        n = getattr(eng, "agg_salts", None)
        if not n:
            return delta_sql
        out_keys = ", ".join(k.split(".")[-1] for k in self.keys)
        vals = ", ".join(f"SUM({v}) AS {v}"
                         for v in [*self.agg_names, self._CNT])
        inner = f"{delta_sql}, floor(rand() * {n})"
        return (f"SELECT {out_keys}, {vals} FROM ({inner}) "
                f"GROUP BY {out_keys}")

    def _merge(self, contribs: list[tuple[DataFrame, int]]) -> ZSetFrame:
        """contribs: (per-group partial-agg DataFrame, ±1 sign).  Sums the
        signed contributions per group, folds them into the stored group
        state (touched keys only), returns the view's output delta."""
        vals = [*self.agg_names, self._CNT]
        parts = [df.select(*self.keys,
                           *[(F.col(v) * F.lit(sign)).alias(v) for v in vals])
                 for df, sign in contribs]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        delta_groups = u.groupBy(*self.keys).agg(
            *[F.sum(v).alias(f"__d_{v}") for v in vals])
        touched = delta_groups.select(*self.keys)
        old_groups = _ns_join(self._out.current.df, touched, self.keys,
                              "left_semi")
        old_rn = old_groups.select(
            *self.keys, *[F.col(v).alias(f"__o_{v}") for v in vals])
        all_m = _ns_join(delta_groups, old_rn, self.keys, "full_outer")
        zero = F.lit(0)
        new_rows = all_m.select(
            *self.keys,
            *[(F.coalesce(F.col(f"__o_{v}"), zero)
               + F.coalesce(F.col(f"__d_{v}"), zero)).alias(v)
              for v in vals])
        live = new_rows.filter(F.col(self._CNT) > 0)
        group_delta = (ZSetFrame.from_df(live, 1)
                       .minus(ZSetFrame.from_df(old_groups, 1)).consolidate())
        # Materialize the group delta ONCE before anything consumes it:
        # its plan embeds partition-order-sensitive double sums, and the
        # group state, the emitted view delta, and downstream maintainers
        # must all read the SAME bits — a re-execution under a different
        # shuffle layout can flip low-order bits, after which a later
        # retraction of the stored row no longer cancels the emitted one.
        from database_stream_processor_spark.tuning import checkpoint_small
        group_delta = ZSetFrame(checkpoint_small(group_delta.df, eager=True))
        self._out.update(group_delta)
        # finalize projection (row-wise) then consolidate: ± rows that
        # agree post-projection cancel, so diff-then-project ≡
        # project-then-diff
        delta = ZSetFrame(self._finalize(group_delta.df)).consolidate()
        self.apply_delta(delta)
        return delta

    def _finalize(self, group_delta_df: DataFrame) -> DataFrame:
        """Group-state delta rows → view output rows (default: drop the
        hidden liveness count).  Overridden where stored partials differ
        from the view's output columns (AVG = sum/count partials)."""
        return group_delta_df.drop(self._CNT)


class _LinearAggMaintainer(_GroupMergeMaintainer):
    """SELECT keys, SUM(e)/COUNT(*)/AVG(e) AS … FROM t [WHERE p] GROUP BY
    keys — the GROUP BY runs over the delta alone, then merges via
    :class:`_GroupMergeMaintainer`; AVG is maintained as (sum, count)
    partials and finalized on emission."""

    kind = "linear_agg"
    sql_reads_sources = False

    def __init__(self, eng, name, sql, table, keys, spec):
        super().__init__(eng, name, sql)
        self.table = table
        self.keys = spec["merge_keys"]
        self.agg_names = spec["val_names"]  # merged partial columns
        self._out_spec = spec["out"]
        m = _AGG_RE.match(sql)
        pred = m.group("pred")
        # HAVING is a finalize-time filter: group state keeps ALL groups
        # (a group failing the predicate must re-emerge when a later delta
        # pushes it back over the boundary), and filtering the ± emission
        # rows row-wise yields exactly the boundary-crossing deltas
        self._having = _rewrite_having(m.group("having"), spec,
                               absorb=True)
        where = f" WHERE {pred}" if pred else ""
        self._delta_sql = self._maybe_salt(eng, (
            f"SELECT {spec['delta_sel']}, COUNT(*) AS {self._CNT} "
            f"FROM {table}{where} GROUP BY {m.group('keys')}"))
        first = eng.eval_on(self._delta_sql, {
            table: _source_rows0(eng, table)})
        self._init_out(eng, name, first)
        # force analysis of the finalize projection (incl. HAVING) now so
        # an unsupported predicate falls back to snapshot-diff at lowering
        # time, not at the first step
        _ = self._finalize(self._out.current.df).schema

    def _finalize(self, group_delta_df: DataFrame) -> DataFrame:
        # HAVING filters the group-PARTIAL frame (pre-projection), so
        # predicates over hidden absorbed aggregates resolve too
        if self._having:
            group_delta_df = group_delta_df.filter(F.expr(self._having))
        return _finalize_spec(group_delta_df, self._out_spec)

    def step(self, eng, combined, old):
        z = combined.get(self.table)
        if z is None:
            return self._empty()
        pos, neg = _split_parts(z)
        dp = eng.eval_on(self._delta_sql, {self.table: pos})
        dn = eng.eval_on(self._delta_sql, {self.table: neg})
        return self._merge([(dp, 1), (dn, -1)])


#: GROUP BY ROLLUP(keys) / CUBE(keys) / GROUPING SETS((a,b),(a),())
_GROUPING_AGG_RE = re.compile(
    r"^SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<tbl>\w+)"
    r"(?:\s+WHERE\s+(?P<pred>.+?))?\s+GROUP\s+BY\s+"
    r"(?P<kw>ROLLUP|CUBE|GROUPING\s+SETS)\s*\(\s*"
    r"(?P<keys>[\w\s,.()]*?)\s*\)"
    r"(?:\s+HAVING\s+(?P<having>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL)


class _GroupingSetsAggMaintainer(_GroupMergeMaintainer):
    """SELECT keys, SUM/COUNT/AVG … FROM t [WHERE p] GROUP BY
    ROLLUP(keys) | CUBE(keys) [HAVING h] — grouping-set aggregates
    maintained by the SAME per-group merge as plain GROUP BY: the
    per-delta partial aggregate itself runs GROUP BY ROLLUP/CUBE, so
    each delta row contributes to every grouping set it belongs to, and
    the null-safe key merge (_ns_join's ``<=>``) treats the rollup
    NULL-marker rows as ordinary groups.  Per tick ∝ Δ × number of
    grouping sets (a constant fan-out), never a table re-aggregation.

    Gated on every grouping key being NOT NULL in the source: a real
    data NULL would collide with the rollup marker (SQL distinguishes
    them via GROUPING(), which this view shape doesn't carry)."""

    kind = "grouping_sets_agg"

    def __init__(self, eng, name, sql, m, spec):
        super().__init__(eng, name, sql)
        self.table = m.group("tbl").lower()
        raw = m.group("keys")
        raw_keys = []
        for tok in re.findall(r"[A-Za-z_][\w.]*", raw):
            k = tok.split(".")[-1]
            if k not in raw_keys:
                raw_keys.append(k)
        if not raw_keys:
            raise _UnloweredShape("no grouping keys")
        # merge on the OUTPUT names (`k AS g` keys emit g in the delta
        # partial — r7, same merge_keys discipline as the linear path);
        # the NOT NULL gate below still checks the SOURCE columns
        self.keys = spec["merge_keys"]
        # duplicate grouping sets (GROUPING SETS((a),(a)), ROLLUP(a,a))
        # emit DUPLICATE result rows in SQL, which the per-group merge
        # would collapse — reject, keep the fallback
        kw = " ".join(m.group("kw").upper().split())
        if kw == "GROUPING SETS":
            sets = [tuple(sorted(re.findall(r"[A-Za-z_][\w.]*", s)))
                    for s in _split_top_level(raw)]
            if len(sets) != len(set(sets)):
                raise _UnloweredShape("duplicate grouping sets")
        else:
            toks = [t.split(".")[-1]
                    for t in re.findall(r"[A-Za-z_][\w.]*", raw)]
            if len(toks) != len(set(toks)):
                raise _UnloweredShape("repeated column in ROLLUP/CUBE")
        fields = {f.name.lower(): f
                  for f in _source_rows0(eng, self.table).schema.fields}
        for k in raw_keys:
            if k.lower() not in fields or fields[k.lower()].nullable:
                raise _UnloweredShape(
                    f"grouping key {k} must be NOT NULL (rollup marker "
                    f"rows are NULL-keyed)")
        self.agg_names = spec["val_names"]
        self._out_spec = spec["out"]
        self._having = _rewrite_having(m.group("having"), spec,
                                       absorb=True)
        where = f" WHERE {m.group('pred')}" if m.group("pred") else ""
        self._delta_sql = self._maybe_salt(eng, (
            f"SELECT {spec['delta_sel']}, COUNT(*) AS {self._CNT} "
            f"FROM {self.table}{where} GROUP BY "
            f"{m.group('kw')}({m.group('keys')})"))
        first = eng.eval_on(self._delta_sql, {
            self.table: _source_rows0(eng, self.table)})
        self._init_out(eng, name, first)
        _ = self._finalize(self._out.current.df).schema

    def _finalize(self, group_delta_df: DataFrame) -> DataFrame:
        if self._having:
            group_delta_df = group_delta_df.filter(F.expr(self._having))
        return _finalize_spec(group_delta_df, self._out_spec)

    def step(self, eng, combined, old):
        z = combined.get(self.table)
        if z is None:
            return self._empty()
        pos, neg = _split_parts(z)
        dp = eng.eval_on(self._delta_sql, {self.table: pos})
        dn = eng.eval_on(self._delta_sql, {self.table: neg})
        return self._merge([(dp, 1), (dn, -1)])


class _JoinAggMaintainer(_GroupMergeMaintainer):
    """SELECT keys, SUM/COUNT FROM a JOIN b ON cond [WHERE p] GROUP BY keys
    — bilinear join delta feeding a linear aggregate merge: each tick
    evaluates the grouped view SQL over ΔA⋈B_new and A_old⋈ΔB only
    (SUM/COUNT are linear, so per-leg partial aggregates sum), then merges
    with stored per-group output on touched keys.  Per-tick cost ∝ Δ —
    the reference compiles the demo02 fraud features to exactly this
    join→aggregate circuit (sql-to-dbsp; demo02/project.sql:29-57)."""

    kind = "join_agg"

    def __init__(self, eng, name, sql, left, right, keys, spec):
        super().__init__(eng, name, sql)
        self.left, self.right = left, right
        # output (unqualified) key column names for the merge
        self.keys = spec["merge_keys"]
        self.agg_names = spec["val_names"]
        self._out_spec = spec["out"]
        m = _JOIN_AGG_RE.match(sql)
        self._having = _rewrite_having(m.group("having"), spec,
                               absorb=True)
        # finalize-time filter — _LinearAggMaintainer: state keeps all groups
        where = f" WHERE {m.group('pred')}" if m.group("pred") else ""
        la = f" {m.group('la')}" if m.group("la") else ""
        ra = f" {m.group('ra')}" if m.group("ra") else ""
        self._delta_sql = self._maybe_salt(eng, (
            f"SELECT {spec['delta_sel']}, COUNT(*) AS {self._CNT} "
            f"FROM {left}{la} JOIN {right}{ra} ON {m.group('cond')}"
            f"{where} GROUP BY {m.group('keys')}"))
        first = eng.eval_on(self._delta_sql, {
            left: _source_rows0(eng, left),
            right: _source_rows0(eng, right)})
        self._init_out(eng, name, first)
        _ = self._finalize(self._out.current.df).schema  # validate HAVING

    def _finalize(self, group_delta_df: DataFrame) -> DataFrame:
        # HAVING filters the group-PARTIAL frame (pre-projection), so
        # predicates over hidden absorbed aggregates resolve too
        if self._having:
            group_delta_df = group_delta_df.filter(F.expr(self._having))
        return _finalize_spec(group_delta_df, self._out_spec)

    def step(self, eng, combined, old):
        da, db = combined.get(self.left), combined.get(self.right)
        if da is None and db is None:
            return self._empty()
        contribs: list[tuple[DataFrame, int]] = []
        if da is not None:
            b_new = _current_rows(eng, self.right)
            pos, neg = _split_parts(da)
            contribs.append((eng.eval_on(self._delta_sql, {
                self.left: pos, self.right: b_new}), 1))
            contribs.append((eng.eval_on(self._delta_sql, {
                self.left: neg, self.right: b_new}), -1))
        if db is not None:
            a_old = old[self.left].rows()
            pos, neg = _split_parts(db)
            contribs.append((eng.eval_on(self._delta_sql, {
                self.left: a_old, self.right: pos}), 1))
            contribs.append((eng.eval_on(self._delta_sql, {
                self.left: a_old, self.right: neg}), -1))
        return self._merge(contribs)


#: SELECT <only aggregate items> FROM t [WHERE p] — no GROUP BY
_GLOBAL_AGG_BLOCKERS = re.compile(
    r"\b(GROUP\s+BY|DISTINCT|UNION|INTERSECT|EXCEPT|OVER|HAVING"
    r"|ORDER\s+BY|LIMIT|JOIN|LEFT|RIGHT|FULL|CROSS)\b|\(\s*SELECT",
    re.IGNORECASE)

_GLOBAL_AGG_RE = re.compile(
    r"^SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<tbl>\w+)"
    r"(?:\s+WHERE\s+(?P<pred>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL)


def _from_subquery_lift(eng: "Engine", name: str, flat: str):
    """``SELECT … FROM ( SELECT … ) [AS] alias <rest>`` — the verbatim
    TPC-H q13/q7/q9 nesting: synthesize a hidden maintained view
    ``__{name}_sub`` for the derived table (itself lowered through every
    recognizer, including nested lifts) and re-lower the outer text with
    the subquery replaced by the hidden view's name.  A derived table
    cannot be correlated (standard SQL), so the lift is always sound;
    it raises :class:`_UnloweredShape` when either stage only
    snapshot-diffs (layering over a full recompute adds nothing)."""
    parts = _split_select_from(flat)
    if parts is None or not parts[1].startswith("("):
        raise _UnloweredShape("FROM is not a subquery")
    sel, rest = parts
    end = _match_paren(rest, 0)
    if end < 0:
        raise _UnloweredShape("unbalanced FROM subquery")
    inner = rest[1:end].strip()
    tail = rest[end + 1:].strip()
    if not re.match(r"^SELECT\b", inner, re.IGNORECASE):
        raise _UnloweredShape("FROM (…) is not a SELECT")
    if re.match(r"^AS\s+", tail, re.IGNORECASE):
        tail = tail[2:].strip()
    am = re.match(r"^([A-Za-z_]\w*)\b", tail)
    if am and am.group(1).lower() not in _SQL_KEYWORDS:
        # derived-table alias: drop it and strip its qualifiers — the
        # hidden view's bare output names are the only columns in scope
        a = am.group(1)
        tail = tail[len(a):].strip()
        sel = _sub_outside_literals(rf"\b{a}\s*\.\s*", "", sel,
                                    re.IGNORECASE)
        tail = _sub_outside_literals(rf"\b{a}\s*\.\s*", "", tail,
                                     re.IGNORECASE)
    hidden = f"__{name}_sub"
    registered: list[str] = []
    try:
        _register_hidden(eng, hidden, inner, registered)
        outer = f"SELECT {sel} FROM {hidden}"
        if tail:
            outer += f" {tail}"
        fm = _lower_view(eng, name, outer)
        if fm.kind == "differentiate":
            raise _UnloweredShape("outer over derived table "
                                  "snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _parse_with_clause(flat: str) -> tuple[list[tuple[str, str]], str]:
    """Parse a top-level ``WITH a AS ( … ) [, b AS ( … )]* SELECT …``
    into ``([(name, body), …], main_select)``.  Refuses (raises
    :class:`_UnloweredShape`) on ``WITH RECURSIVE`` (the reference
    routes that to the fixpoint operator — operators/recursive.py — not
    the view maintainers), CTE column-alias lists ``name (c1, c2) AS``,
    duplicate names, and non-SELECT bodies."""
    if re.match(r"^WITH\s+RECURSIVE\b", flat, re.IGNORECASE):
        raise _UnloweredShape("WITH RECURSIVE is the fixpoint "
                              "operator's shape, not a view lowering")
    m = re.match(r"^WITH\s+", flat, re.IGNORECASE)
    if not m:
        raise _UnloweredShape("not a WITH clause")
    i = m.end()
    ctes: list[tuple[str, str]] = []
    n = len(flat)
    while True:
        nm = re.match(r"([A-Za-z_]\w*)\s+AS\s*\(", flat[i:], re.IGNORECASE)
        if not nm:
            raise _UnloweredShape(
                f"unparsed CTE item (alias list / missing AS?): "
                f"{flat[i:i + 40]!r}")
        cname = nm.group(1).lower()
        if cname in _SQL_KEYWORDS or any(cname == c for c, _ in ctes):
            raise _UnloweredShape(f"CTE name {cname!r} is a keyword or "
                                  "duplicate")
        po = i + nm.end() - 1          # index of the body's '('
        pc = _match_paren(flat, po)
        if pc < 0:
            raise _UnloweredShape("unbalanced CTE body parens")
        body = flat[po + 1:pc].strip()
        # a body may itself open a WITH (nested CTE): _register_hidden
        # re-enters _lower_view, which routes it back through the lifts
        if not re.match(r"^(SELECT|WITH)\b", body, re.IGNORECASE):
            raise _UnloweredShape("CTE body is not a SELECT")
        ctes.append((cname, body))
        j = pc + 1
        while j < n and flat[j].isspace():
            j += 1
        if j < n and flat[j] == ",":
            i = j + 1
            while i < n and flat[i].isspace():
                i += 1
            continue
        main = flat[j:].strip()
        break
    if not re.match(r"^SELECT\b", main, re.IGNORECASE):
        raise _UnloweredShape("WITH tail is not a SELECT")
    return ctes, main


#: keywords that cannot be a table alias after ``FROM x`` / ``JOIN x``
_NOT_ALIAS_KW = {
    "ON", "WHERE", "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS",
    "GROUP", "ORDER", "UNION", "INTERSECT", "EXCEPT", "HAVING",
    "LIMIT", "AND", "OR"}


def _rec_occurrence_variants(step_sql: str, rname: str,
                             fname: str) -> list[str] | None:
    """Non-linear recursion support: one copy of ``step_sql`` per
    FROM/JOIN-position occurrence of the CTE name, with THAT occurrence
    renamed to the frontier binding ``fname`` (its alias kept).  The
    union of their evaluations — ``fname`` → frontier, ``rname`` → the
    accumulated output — is every derivation using ≥1 frontier atom
    (derivations with several frontier atoms appear in several
    variants; the set fixpoint dedups), exactly the op's
    ``delta_step_out`` contract (operators/recursive.py; reference
    recursive.rs:255 maintains arbitrary nested circuits).

    Returns None (caller refuses) when any occurrence is not an ALIASED
    table reference — the splice needs the alias to keep qualifiers
    resolving, and a qualifier occurrence (``rname.col``) would mean
    the positional scan missed a reference."""
    blanked = _blank_literals(step_sql)
    esc = re.escape(rname)
    # qualifier occurrences (``rname.col``) are column references of an
    # unaliased atom, not extra atoms — exclude them from the count
    total = len(re.findall(rf"\b{esc}\b(?!\s*\.)", blanked,
                           re.IGNORECASE))
    occs = list(re.finditer(rf"\b(?:FROM|JOIN)\s+({esc})\b(?!\s*\.)",
                            blanked, re.IGNORECASE))
    if len(occs) != total:
        return None
    variants = []
    for m in occs:
        am = re.match(r"\s+(?:AS\s+)?(\w+)", blanked[m.end(1):],
                      re.IGNORECASE)
        if not am or am.group(1).upper() in _NOT_ALIAS_KW:
            return None
        variants.append(step_sql[:m.start(1)] + fname
                        + step_sql[m.end(1):])
    return variants


#: shapes a SET-recursion branch cannot carry (NEW r12 — both were
#: silently ACCEPTED before and produced wrong answers): outer/anti
#: joins (the delta leg's NULL-extension/negation is computed against
#: the delta instead of the full relation — e.g. a cyclic graph grows
#: spurious (x, NULL) rows on unrelated inserts) and aggregation /
#: window functions (non-monotone in the accumulator: the set fixpoint
#: keeps stale intermediate aggregates — Postgres/DuckDB refuse these
#: outright, and so does the reference's Calcite frontend).  Subquery
#: spans are exempt: they evaluate exactly each round and their inputs
#: are recompute-role (see _sq_inputs).  DISTINCT, inner/cross joins
#: and LEFT SEMI JOIN stay allowed (idempotent / bilinear in the set
#: ring).
_REC_BRANCH_BLOCKERS = re.compile(
    r"\b(LEFT|RIGHT|FULL)\s+(OUTER\s+)?JOIN\b"
    r"|\b(LEFT\s+|RIGHT\s+)?ANTI\s+JOIN\b"
    r"|\bGROUP\s+BY\b|\bHAVING\b|\bOVER\s*\("
    r"|\b(SUM|COUNT|AVG|MIN|MAX|STDDEV\w*|VAR\w*|COLLECT\w*|FIRST"
    r"|LAST)\s*\(", re.IGNORECASE)


def _rec_branch_guard(text: str) -> None:
    """Refuse non-delta-linear recursion branch shapes (see
    :data:`_REC_BRANCH_BLOCKERS`) — raising beats the pre-r12 behavior
    of accepting them and maintaining wrong answers."""
    blanked = text
    for s, e in reversed(_scalar_sq_spans(text)):
        blanked = blanked[:s] + " " * (e - s) + blanked[e:]
    m = _REC_BRANCH_BLOCKERS.search(_blank_literals(blanked))
    if m:
        raise _UnloweredShape(
            f"recursion branch contains {m.group(0)!r} — not "
            "delta-linear (hoist aggregation into a companion CTE)")


def _input_delta_legs(branch_sql: str, tbl: str, dname: str,
                      n_refs: int) -> list[tuple[str, str]]:
    """Delta legs of one recursion branch w.r.t. input ``tbl``: with a
    single table-position occurrence the branch evaluates once with the
    name itself rebound to the delta; with SEVERAL occurrences (the
    branch joins the input with itself — r10's refusal, lifted r11) one
    spliced variant per occurrence rebinds THAT occurrence to ``dname``
    while the others stay on the integral.  The union over legs covers
    every derivation using ≥1 delta atom (a derivation using deltas at
    both positions appears in both legs — over-approximation the SET
    fixpoint dedups; the BAG path must keep its exact telescoping
    expansion and still refuses).  Raises on unaliased occurrences."""
    if n_refs == 1:
        return [(branch_sql, tbl)]
    vs = _rec_occurrence_variants(branch_sql, tbl, dname)
    if vs is None:
        raise _UnloweredShape(
            f"input {tbl!r} referenced twice with unaliased or "
            "non-table occurrences")
    return [(v, dname) for v in vs]


class _RecursiveCteMaintainer(_ViewMaintainer):
    """``WITH RECURSIVE r AS (base UNION step) …`` — the recursive view
    maintained by :class:`~database_stream_processor_spark.operators.
    recursive.IncrementalFixpointOp` (semi-naive insert ticks, DRed
    deletes; the reference exports any recursive view for incremental
    maintenance, recursive.rs:255, nested clocks time/mod.rs:20-48).

    The SQL branches become the op's rule callbacks via ``eval_on``
    rebinding: ``base(I…)`` / ``step(I…, acc)`` evaluate the branch
    texts with each input source bound to its integrated rows and the
    CTE name bound to ``acc``.  The delta forms leg over the inputs
    (one evaluation per touched input with that input rebound to the
    tick's delta — every derivation using ≥1 delta atom, since each
    branch references each input at most once; multi-leg
    over-approximation dedups in the set fixpoint).

    NON-LINEAR recursion (the CTE joined with itself, e.g. the doubling
    transitive closure) is driven by ``step_variants``: one step text
    per CTE occurrence with that occurrence rebound to the frontier
    binding ``fname`` — their union is the op's ``delta_step_out``
    (every derivation using ≥1 frontier atom), which powers both
    semi-naive rounds and DRed suspect/re-derivation
    (delta_step_out contract, operators/recursive.py).  UNION's set
    semantics = the fixpoint's monotone set closure (UNION ALL — a bag
    fixpoint — routes to :class:`_RecursiveCteBagMaintainer`)."""

    kind = "recursive"

    def __init__(self, eng: "Engine", name: str, rname: str,
                 tbls: list[str], base_sql: str, step_sql: str,
                 step_variants: list[str] | None = None,
                 fname: str | None = None):
        from database_stream_processor_spark.operators.recursive import (
            IncrementalFixpointOp)
        _rec_branch_guard(base_sql)
        _rec_branch_guard(step_sql)
        self.name, self.sql = name, base_sql
        self.tables, self.rname = list(tbls), rname
        self._fname = fname
        empty_in = {t: _source_rows0(eng, t).limit(0) for t in tbls}
        snap = eng.eval_on(base_sql, dict(empty_in))
        out_cols = list(snap.columns)
        try:
            step_snap = eng.eval_on(
                step_sql, {**empty_in,
                           rname: eng.spark.createDataFrame([], snap.schema)})
            if len(step_snap.columns) != len(out_cols):
                raise _UnloweredShape(
                    f"recursive branch arity {len(step_snap.columns)} != "
                    f"base arity {len(out_cols)}")
        finally:
            try:        # the probe bound the CTE name as a temp view
                eng.spark.catalog.dropTempView(rname)
            except Exception:
                pass
        empty = eng.spark.createDataFrame([], snap.schema)
        self.state = StateTable(ZSetFrame.from_df(empty),
                                name=f"view_{name}")
        self._empty_out = empty

        def _norm(df):
            return df.toDF(*out_cols)

        scrub = lambda t: re.sub(r"'[^']*'", " ", t)
        in_branch = lambda sql_t, t: bool(
            re.search(rf"\b{re.escape(t)}\b", scrub(sql_t),
                      re.IGNORECASE))
        tp_refs = lambda sql_t, t: len(re.findall(
            rf"\b{re.escape(t)}\b(?!\s*\.)", scrub(sql_t),
            re.IGNORECASE))
        self._touched: set[str] = set(tbls)
        # inputs referenced inside a SUBQUERY span ((NOT) EXISTS / IN /
        # scalar — NEW r12) are not delta-linear: rebinding one to a
        # tick's delta would evaluate the subquery against the delta
        # instead of the integral (wrong answers, not missed rows — a
        # NOT EXISTS would re-admit everything the integral blocks).
        # They carry NO delta legs; a tick touching one forces the op's
        # full recompute-and-diff (sound: for FIXED inputs the step
        # stays monotone in acc — stratified negation, the reference
        # stratifies negated atoms outside the recursion scope the same
        # way).  The CTE's OWN name inside a span (non-qualifier; a
        # ``p.col`` correlation is a per-row filter and stays monotone)
        # would be non-stratified — refuse.
        sqt = scrub(" ".join(
            [base_sql[s:e] for s, e in _scalar_sq_spans(base_sql)]
            + [step_sql[s:e] for s, e in _scalar_sq_spans(step_sql)]))
        if re.search(rf"\b{re.escape(rname)}\b(?!\s*\.)", sqt,
                     re.IGNORECASE):
            raise _UnloweredShape(
                f"recursive CTE {rname!r} referenced inside a subquery "
                "of its own body (non-stratified negation/aggregation)")
        self._sq_inputs = {t for t in tbls if re.search(
            rf"\b{re.escape(t)}\b(?!\s*\.)", sqt, re.IGNORECASE)}
        # per-branch input delta legs: (text, bind_name, input) — a
        # branch joining an input with ITSELF gets one spliced variant
        # per occurrence (_input_delta_legs; r10's twice-referenced
        # refusal, lifted r11 for the set fixpoint)
        self._dnames = {t: f"__{name}_d_{t}" for t in tbls}
        base_legs = [(v, bn, t) for t in tbls if t not in self._sq_inputs
                     if in_branch(base_sql, t) and tp_refs(base_sql, t)
                     for v, bn in _input_delta_legs(
                         base_sql, t, self._dnames[t],
                         tp_refs(base_sql, t))]
        step_legs = [(v, bn, t) for t in tbls if t not in self._sq_inputs
                     if in_branch(step_sql, t) and tp_refs(step_sql, t)
                     for v, bn in _input_delta_legs(
                         step_sql, t, self._dnames[t],
                         tp_refs(step_sql, t))]

        def _legs(leglist, full, d, acc=None):
            extra = {} if acc is None else {rname: acc}
            parts = [
                _norm(eng.eval_on(v, {**full, bn: d[t], **extra}))
                for v, bn, t in leglist if t in self._touched]
            out = self._empty_out
            for p in parts:
                out = out.unionByName(p) if out is not None else p
            return out

        base = lambda rows: _norm(eng.eval_on(base_sql, dict(rows)))
        step = lambda rows, acc: _norm(
            eng.eval_on(step_sql, {**rows, rname: acc}))
        dso = None
        if step_variants:
            def dso(full, s, acc):
                out = self._empty_out
                for v in step_variants:
                    out = out.unionByName(_norm(eng.eval_on(
                        v, {**full, fname: s, rname: acc})))
                return out
        self._op = IncrementalFixpointOp(
            empty_input={t: ZSetFrame.from_df(df)
                         for t, df in empty_in.items()},
            step=step, base=base,
            delta_base=lambda full, d: _legs(base_legs, full, d),
            delta_step=lambda full, d, acc: _legs(step_legs, full, d,
                                                  acc),
            delta_step_out=dso)
        self._eng = eng

    @property
    def last_stats(self):
        return self._op.last_stats

    def step(self, eng, combined, old):
        deltas = {t: combined.get(t) for t in self.tables}
        if all(z is None for z in deltas.values()):
            return self._empty()
        # delta legs skip inputs untouched this tick (their empty
        # deltas would contribute nothing but still schedule jobs)
        self._touched = {t for t, z in deltas.items() if z is not None}
        # a tick touching a subquery-role input (NOT EXISTS / IN /
        # scalar over it) has no sound delta legs — full recompute diff
        force = bool(self._touched & self._sq_inputs)
        try:
            # the fixpoint loop localCheckpoints plans whose lineage ran
            # through eval_on's deduplicated temp-view rebindings — the
            # Spark 4 constraint-propagation crash class (see
            # _no_constraint_propagation)
            with _no_constraint_propagation(eng.spark):
                delta = self._op.step(
                    deltas, force_recompute=force).consolidate()
        finally:
            self._touched = set(self.tables)
            for v in (self.rname, self._fname,
                      *self._dnames.values()):
                if not v:
                    continue
                try:
                    # the callbacks bound the CTE name (and the
                    # non-linear frontier / per-occurrence delta
                    # names) as session temp views; sweep them so
                    # nothing outside this maintainer can read a
                    # mid-fixpoint accumulator
                    eng.spark.catalog.dropTempView(v)
                except Exception:
                    pass
        self.apply_delta(delta)
        return delta


class _RecursiveCteMutualMaintainer(_ViewMaintainer):
    """MUTUAL recursion — ``WITH RECURSIVE a AS (… b …), b AS (… a …)
    …``: one vector fixpoint (:class:`~database_stream_processor_spark.
    operators.recursive.MutualFixpointOp`) maintains every view of the
    strongly-connected CTE group together (the reference maintains
    arbitrary nested circuits exporting several mutually referencing
    streams, recursive.rs:255; galen.rs is the mutually-recursive
    Datalog model).  This maintainer owns the op and the FIRST group
    member's state; the other members' hidden views are
    :class:`_RecursiveSatelliteMaintainer` rows registered right after
    it, which pop their per-tick deltas from ``self._stash`` (the
    engine steps maintainers in registration order, so the stash is
    always filled first).

    Each member body is a UNION of branches: branches referencing no
    group name are base rules, the rest are step rules (a member may be
    pure-step — e.g. the ``odd`` of even/odd reachability — its schema
    then derives from its step rule over the already-typed members).
    Delta rules follow the single-CTE maintainer: one leg per (branch,
    touched input) for input deltas, and for the frontier the
    ``delta_step_out`` legs bind ONE group atom to that name's frontier
    (per-occurrence variants when a branch references the same group
    name twice — the non-linear contract)."""

    kind = "recursive_mutual"

    def __init__(self, eng: "Engine", name: str, rnames: list[str],
                 tbls: list[str],
                 branches: dict[str, tuple[list[str], list[str]]]):
        from database_stream_processor_spark.operators.recursive import (
            MutualFixpointOp)
        self.name = name
        self.tables, self.rnames = list(tbls), list(rnames)
        self._stash: dict[str, ZSetFrame] = {}
        # subquery-role inputs ((NOT) EXISTS / IN / scalar spans in any
        # branch — same classification as the single-CTE path): no
        # delta legs, ticks touching them force the vector recompute
        # diff.  A GROUP MEMBER inside a span would be non-stratified —
        # refuse.  (r12: first refused outright, then lifted to the
        # forced-recompute contract once MutualFixpointOp grew the
        # hook.)
        sq_parts = []
        for rn_ in rnames:
            for b_ in branches[rn_][0] + branches[rn_][1]:
                _rec_branch_guard(b_)
                sq_parts.extend(b_[s:e]
                                for s, e in _scalar_sq_spans(b_))
        scrub = lambda t: re.sub(r"'[^']*'", " ", t)
        sqt = scrub(" ".join(sq_parts))
        for rn_ in rnames:
            if re.search(rf"\b{re.escape(rn_)}\b(?!\s*\.)", sqt,
                         re.IGNORECASE):
                raise _UnloweredShape(
                    f"group member {rn_!r} referenced inside a "
                    "subquery (non-stratified negation/aggregation)")
        self._sq_inputs = {t for t in tbls if re.search(
            rf"\b{re.escape(t)}\b(?!\s*\.)", sqt, re.IGNORECASE)}
        refs = lambda t, w: len(re.findall(rf"\b{re.escape(w)}\b"
                                           r"(?!\s*\.)", scrub(t),
                                           re.IGNORECASE))
        empty_in = {t: _source_rows0(eng, t).limit(0) for t in tbls}
        self._fnames = {rn: f"__{name}_f_{rn}" for rn in rnames}
        # per-branch frontier legs: (sql, bound_rname, is_variant) —
        # one per (branch, group-name occurrence); a multi-occurrence
        # branch splices per-occurrence variants binding the frontier
        # under the hidden fname, a single occurrence just rebinds the
        # group name itself
        self._out_legs: dict[str, list[tuple[str, str, bool]]] = {}
        for rn in rnames:
            legs = []
            for sb in branches[rn][1]:
                for m_ in rnames:
                    k = refs(sb, m_)
                    if k == 0:
                        continue
                    if k == 1:
                        legs.append((sb, m_, False))
                        continue
                    vs = _rec_occurrence_variants(sb, m_,
                                                  self._fnames[m_])
                    if vs is None:
                        raise _UnloweredShape(
                            "non-linear mutual step with unaliased "
                            "or non-table group occurrences")
                    legs.extend((v, m_, True) for v in vs)
            if not legs:
                raise _UnloweredShape(
                    f"group member {rn!r} has no step rule")
            self._out_legs[rn] = legs
        # schema resolution: base-carrying members type from their
        # first base rule; pure-step members type from a step rule once
        # every group name it references is typed — iterate to a fixed
        # point (an all-pure-step typing cycle is unresolvable)
        schemas: dict[str, object] = {}
        b0 = branches[rnames[0]]
        self.sql = (b0[0] or b0[1])[0]
        try:
            pending = list(rnames)
            while pending:
                progressed = False
                for rn in list(pending):
                    bases, steps = branches[rn]
                    if bases:
                        snap = eng.eval_on(bases[0], dict(empty_in))
                    else:
                        need = {m_ for m_ in rnames
                                if refs(steps[0], m_)}
                        if not need <= set(schemas):
                            continue
                        snap = eng.eval_on(steps[0], {
                            **empty_in,
                            **{m_: eng.spark.createDataFrame(
                                [], schemas[m_]) for m_ in need}})
                    schemas[rn] = snap.schema
                    pending.remove(rn)
                    progressed = True
                if not progressed:
                    raise _UnloweredShape(
                        "mutual recursion with an untypable pure-step "
                        "cycle (no base rule reachable)")
            # arity check: every rule of a member matches its schema
            empty_rec = {rn: eng.spark.createDataFrame([], schemas[rn])
                         for rn in rnames}
            for rn in rnames:
                for br in branches[rn][0] + branches[rn][1]:
                    probe = eng.eval_on(br, {**empty_in, **empty_rec})
                    if len(probe.columns) != len(schemas[rn].fields):
                        raise _UnloweredShape(
                            f"rule arity {len(probe.columns)} != "
                            f"member {rn!r} arity "
                            f"{len(schemas[rn].fields)}")
        finally:
            for rn in rnames:
                try:
                    eng.spark.catalog.dropTempView(rn)
                except Exception:
                    pass
        out_cols = {rn: [f.name for f in schemas[rn].fields]
                    for rn in rnames}
        self._schemas = schemas
        # per-branch input delta legs (an input joined with itself gets
        # per-occurrence spliced variants — _input_delta_legs)
        self._dnames_in = {t: f"__{name}_d_{t}" for t in tbls}
        self._in_legs: dict[str, list[tuple[str, str, str, bool]]] = {}
        for rn in rnames:
            legs = []
            for which, brs in enumerate(branches[rn]):
                for br in brs:
                    for t in tbls:
                        if t in self._sq_inputs:
                            continue    # recompute-role: no legs
                        n = refs(br, t)
                        if not n:
                            continue
                        legs.extend(
                            (v, bn, t, which == 1)
                            for v, bn in _input_delta_legs(
                                br, t, self._dnames_in[t], n))
            self._in_legs[rn] = legs
        empty_out = {rn: eng.spark.createDataFrame([], schemas[rn])
                     for rn in rnames}
        self.state = StateTable(
            ZSetFrame.from_df(empty_out[rnames[0]]),
            name=f"view_{name}")
        self._empty_out = empty_out
        self._touched: set[str] = set(tbls)
        norm = lambda rn, df: df.toDF(*out_cols[rn])

        def _eval_union(rn, sqls, binds):
            out = empty_out[rn]
            for s_ in sqls:
                out = out.unionByName(norm(rn, eng.eval_on(s_, binds)))
            return out

        def base(full):
            return {rn: _eval_union(rn, branches[rn][0], dict(full))
                    for rn in rnames}

        def step(full, acc):
            return {rn: _eval_union(rn, branches[rn][1],
                                    {**full, **acc})
                    for rn in rnames}

        def delta_base(full, dm):
            out = {}
            for rn in rnames:
                out[rn] = empty_out[rn]
                for v, bn, t, is_step in self._in_legs[rn]:
                    if is_step or t not in self._touched:
                        continue
                    out[rn] = out[rn].unionByName(
                        norm(rn, eng.eval_on(v, {**full, bn: dm[t]})))
            return out

        def delta_step(full, dm, acc):
            out = {}
            for rn in rnames:
                out[rn] = empty_out[rn]
                for v, bn, t, is_step in self._in_legs[rn]:
                    if not is_step or t not in self._touched:
                        continue
                    out[rn] = out[rn].unionByName(norm(
                        rn, eng.eval_on(
                            v, {**full, bn: dm[t], **acc})))
            return out

        def delta_step_out(full, s, acc):
            out = {}
            for rn in rnames:
                out[rn] = empty_out[rn]
                for v, m_, is_var in self._out_legs[rn]:
                    binds = ({**full, **acc, self._fnames[m_]: s[m_]}
                             if is_var
                             else {**full, **acc, m_: s[m_]})
                    out[rn] = out[rn].unionByName(
                        norm(rn, eng.eval_on(v, binds)))
            return out

        self._op = MutualFixpointOp(
            empty_input={t: ZSetFrame.from_df(df)
                         for t, df in empty_in.items()},
            names=list(rnames), empty_out=empty_out,
            base=base, step=step, delta_base=delta_base,
            delta_step=delta_step, delta_step_out=delta_step_out)
        self._eng = eng

    @property
    def last_stats(self):
        return self._op.last_stats

    def step(self, eng, combined, old):
        deltas = {t: combined.get(t) for t in self.tables}
        if all(z is None for z in deltas.values()):
            self._stash = {}
            return self._empty()
        self._touched = {t for t, z in deltas.items() if z is not None}
        # subquery-role input touched: no sound delta legs — force the
        # vector recompute diff (same contract as the single-CTE path)
        force = bool(self._touched & self._sq_inputs)
        try:
            with _no_constraint_propagation(eng.spark):
                out = self._op.step(deltas, force_recompute=force)
        finally:
            self._touched = set(self.tables)
            for v in (list(self.rnames)
                      + list(self._fnames.values())
                      + list(self._dnames_in.values())):
                try:
                    eng.spark.catalog.dropTempView(v)
                except Exception:
                    pass
        self._stash = {rn: out[rn] for rn in self.rnames[1:]}
        delta = out[self.rnames[0]]
        self.apply_delta(delta)
        return delta


class _RecursiveSatelliteMaintainer(_ViewMaintainer):
    """A non-primary member of a mutual-recursion group: its per-tick
    delta was already computed by the group's
    :class:`_RecursiveCteMutualMaintainer` (registered immediately
    before it — the engine steps maintainers in registration order);
    this row just pops it from the primary's stash and applies it to
    its own state."""

    kind = "recursive_mutual"

    def __init__(self, eng: "Engine", name: str, rname: str,
                 primary: _RecursiveCteMutualMaintainer):
        self.name, self.sql = name, primary.sql
        self._primary, self._rname = primary, rname
        empty = eng.spark.createDataFrame([], primary._schemas[rname])
        self.state = StateTable(ZSetFrame.from_df(empty),
                                name=f"view_{name}")

    @property
    def last_stats(self):
        return self._primary.last_stats

    def step(self, eng, combined, old):
        z = self._primary._stash.pop(self._rname, None)
        if z is None:
            return self._empty()
        self.apply_delta(z)
        return z


#: shapes a weighted (bag) branch cannot carry: anything non-linear in
#: the weight ring — aggregation, distinct, outer joins, set ops — plus
#: subqueries (own lowering) and SELECT * (the weight column would leak)
_BAG_BRANCH_BLOCKERS = re.compile(
    r"\bGROUP\s+BY\b|\bDISTINCT\b|\bOVER\b|\bUNION\b|\bINTERSECT\b"
    r"|\bEXCEPT\b|\bLIMIT\b|\bORDER\s+BY\b|\bHAVING\b|\(\s*SELECT"
    r"|\b(LEFT|RIGHT|FULL|CROSS|OUTER|SEMI|ANTI)\b"
    r"|\b(SUM|COUNT|AVG|MIN|MAX|STDDEV\w*|VAR\w*|COLLECT\w*|FIRST"
    r"|LAST)\s*\(", re.IGNORECASE)


def _mask_sq_spans(text: str) -> str:
    """*text* with its balanced ``(SELECT …)`` spans blanked to spaces
    (length-preserving) — so the bag branch recognizers see only the
    OUTER query's shape."""
    out = text
    for s, e in reversed(_scalar_sq_spans(text)):
        out = out[:s] + " " * (e - s) + out[e:]
    return out


#: shapes a subquery span inside a WEIGHTED (bag) branch cannot carry:
#: the span's bindings are multiplicity-symbolic ZSet frames (rows +
#: ``__weight``), so presence tests ((NOT) EXISTS / IN, DISTINCT,
#: GROUP BY keys) are sound but anything that COUNTS rows would read
#: raw row counts, not multiplicities.
_BAG_SPAN_BLOCKERS = re.compile(
    r"\b(SUM|COUNT|AVG|MIN|MAX|STDDEV\w*|VAR\w*|COLLECT\w*|FIRST"
    r"|LAST)\s*\(|\bLIMIT\b|\bOVER\s*\(", re.IGNORECASE)


def _weighted_branch(text: str, atoms: list[str]) -> str | None:
    """Rewrite an SPJ recursion branch to carry Z-set weights: the
    select list gains the PRODUCT of the atoms' ``__weight`` columns
    (join multiplies multiplicities — the bilinear Z-set join,
    reference join.rs:226) so the branch evaluates weighted relational
    algebra when its atoms are bound to weighted DataFrames.  Atom
    names stay as-is (``eval_on`` rebinds them); the weight reference
    uses each atom's alias when present, its own name otherwise.

    Since r12 a branch may carry SUBQUERY spans ((NOT) EXISTS / IN —
    presence tests are multiplicity-insensitive, so a span over a
    weighted binding stays sound): spans are MASKED for the blocker
    and atom-occurrence scans (a span atom carries no weight factor —
    the maintainer classifies it subquery-role and forces recompute
    ticks instead), but a span using aggregates / LIMIT / windows
    refuses (those would read symbolic multiplicities as row counts).

    None (caller refuses) on non-linear outer shapes (aggregates,
    DISTINCT, outer joins, set ops, ``SELECT *``), a FROM-less branch,
    or an atom not referenced exactly once in table position."""
    masked = _mask_sq_spans(text)
    if _BAG_BRANCH_BLOCKERS.search(masked):
        return None
    for s, e in _scalar_sq_spans(text):
        if _BAG_SPAN_BLOCKERS.search(text[s:e]):
            return None
    parts = _split_select_from(text)
    if parts is None:
        return None
    sel, rest = parts
    if "*" in sel:
        return None
    blanked = _mask_sq_spans(_blank_literals("FROM " + rest))
    wrefs = []
    from database_stream_processor_spark.zset import WEIGHT_COL
    for a in atoms:
        esc = re.escape(a)
        occs = list(re.finditer(
            rf"\b(?:FROM|JOIN)\s+({esc})\b(?!\s*\.)", blanked,
            re.IGNORECASE))
        if len(occs) != 1:
            return None
        am = re.match(r"\s+(?:AS\s+)?(\w+)", blanked[occs[0].end(1):],
                      re.IGNORECASE)
        alias = (am.group(1) if am
                 and am.group(1).upper() not in _NOT_ALIAS_KW else a)
        wrefs.append(f"{alias}.{WEIGHT_COL}")
    w = " * ".join(wrefs) if wrefs else "1"
    return (f"SELECT {sel}, CAST({w} AS BIGINT) AS {WEIGHT_COL} "
            f"FROM {rest}")


def _splice_input_occurrences(branch_sql: str, tbls: list[str],
                              prefix: str):
    """Per-occurrence splice of a weighted (bag) recursion branch: each
    FROM/JOIN-position occurrence of every input in ``tbls`` is renamed
    to a DISTINCT binding name (its alias kept), so the bag fixpoint's
    exact multilinear expansion can bind old and new integrals of the
    SAME input at different positions of one leg (r11 verdict ask #2b;
    the set paths' over-approximating variants are
    :func:`_input_delta_legs` — the bag path must not over-count, so it
    splices ALL positions at once instead).  Returns ``(text, occs)``
    with ``occs`` the ordered ``[(binding_name, input_name)]`` list; an
    input referenced once keeps its own name (no alias required).
    Raises on a repeated input with unaliased or non-table occurrences
    (the rename needs the alias to keep qualifiers resolving)."""
    occs: list[tuple[str, str]] = []
    text = branch_sql
    for t in tbls:
        esc = re.escape(t)
        # subquery spans are masked: a span atom is subquery-role (no
        # weight factor, no splice — the caller excludes it from tbls
        # and the maintainer forces recompute ticks for it)
        blanked = _mask_sq_spans(_blank_literals(text))
        total = len(re.findall(rf"\b{esc}\b(?!\s*\.)", blanked,
                               re.IGNORECASE))
        poss = list(re.finditer(rf"\b(?:FROM|JOIN)\s+({esc})\b(?!\s*\.)",
                                blanked, re.IGNORECASE))
        if not poss:
            continue
        if len(poss) == 1 and total == 1:
            occs.append((t, t))
            continue
        if len(poss) != total:
            raise _UnloweredShape(
                f"input {t!r} referenced twice with unaliased or "
                "non-table occurrences in a UNION ALL branch")
        binds = []
        for i, m in enumerate(poss):
            am = re.match(r"\s+(?:AS\s+)?(\w+)", blanked[m.end(1):],
                          re.IGNORECASE)
            if not am or am.group(1).upper() in _NOT_ALIAS_KW:
                raise _UnloweredShape(
                    f"input {t!r} referenced twice with unaliased or "
                    "non-table occurrences in a UNION ALL branch")
            binds.append(f"__{prefix}_{t}_{i}")
        for i, m in reversed(list(enumerate(poss))):
            text = text[:m.start(1)] + binds[i] + text[m.end(1):]
        occs.extend((b, t) for b in binds)
    return text, occs


class _RecursiveCteBagMaintainer(_ViewMaintainer):
    """``WITH RECURSIVE r AS (base UNION ALL step) …`` — the BAG
    fixpoint: multiplicities count derivation paths (standard SQL
    working-table semantics), maintained by :class:`~database_stream_
    processor_spark.operators.recursive.ZSetBagFixpointOp`.  The
    branches rewrite through :func:`_weighted_branch` so joins multiply
    weights; inserts and deletes then flow through ONE linear path —
    the Z-set ring cancels retracted derivations, no DRed (the
    reference's weighted recursion, recursive.rs:255, vldb23 §5).
    Since r11 the branches may span SEVERAL input relations (the op's
    multi-input mode expands each branch's delta multilinearly — one
    leg per referenced input, old/new mixed per the telescoping
    bilinear-join expansion, join.rs:226).  Restrictions: linear
    recursion (one CTE atom in the step), SPJ branches."""

    kind = "recursive_bag"

    def __init__(self, eng: "Engine", name: str, rname: str,
                 tbls: list[str], base_sql: str, step_sql: str):
        from database_stream_processor_spark.operators.recursive import (
            ZSetBagFixpointOp)
        # subquery-role classification (NEW r12, mirroring the set
        # path): an input referenced inside a ((NOT) EXISTS / IN) span
        # carries no weight factor and no delta occurrence — its ticks
        # run the op's ring recompute-diff.  The CTE's own name inside
        # a span is non-stratified — refuse; an input appearing BOTH at
        # table position and inside a span refuses too (its weight
        # factor could not be carried while excluded from the atoms).
        scrub_ = lambda t_: re.sub(r"'[^']*'", " ", t_)
        sqt = scrub_(" ".join(
            b[s:e] for b in (base_sql, step_sql)
            for s, e in _scalar_sq_spans(b)))
        if re.search(rf"\b{re.escape(rname)}\b(?!\s*\.)", sqt,
                     re.IGNORECASE):
            raise _UnloweredShape(
                f"recursive CTE {rname!r} referenced inside a subquery "
                "of its own body (non-stratified negation/aggregation)")
        self._sq_inputs = {t for t in tbls if re.search(
            rf"\b{re.escape(t)}\b(?!\s*\.)", sqt, re.IGNORECASE)}
        for t in self._sq_inputs:
            for b in (base_sql, step_sql):
                if re.search(
                        rf"\b(?:FROM|JOIN)\s+{re.escape(t)}\b(?!\s*\.)",
                        _mask_sq_spans(_blank_literals(b)),
                        re.IGNORECASE):
                    raise _UnloweredShape(
                        f"input {t!r} referenced both in table "
                        "position and inside a subquery of a UNION "
                        "ALL branch")
        lin = [t for t in tbls if t not in self._sq_inputs]
        base_txt, base_occs = _splice_input_occurrences(
            base_sql, lin, f"{name}_b")
        step_txt, step_occs = _splice_input_occurrences(
            step_sql, lin, f"{name}_s")
        wb = _weighted_branch(base_txt, [b for b, _ in base_occs])
        ws = _weighted_branch(step_txt,
                              [b for b, _ in step_occs] + [rname])
        if wb is None or ws is None:
            raise _UnloweredShape(
                "UNION ALL recursion branch is not a weighted-SPJ shape")
        self.name, self.sql = name, base_sql
        self.tables, self.rname = list(tbls), rname
        empty_zin = {t: ZSetFrame.from_df(_source_rows0(eng, t).limit(0))
                     for t in tbls}
        zin_dfs = {b: empty_zin[t].df for b, t in base_occs + step_occs}
        zin_dfs.update({t: empty_zin[t].df for t in self._sq_inputs})
        snap = eng.eval_on(wb, dict(zin_dfs))
        cols = list(snap.columns)           # …items, __weight last
        try:
            step_snap = eng.eval_on(
                ws, {**zin_dfs,
                     rname: eng.spark.createDataFrame([], snap.schema)})
            if len(step_snap.columns) != len(cols):
                raise _UnloweredShape(
                    f"recursive branch arity {len(step_snap.columns)}"
                    f" != base arity {len(cols)}")
        finally:
            try:
                eng.spark.catalog.dropTempView(rname)
            except Exception:
                pass
        empty_out = ZSetFrame(eng.spark.createDataFrame([], snap.schema))
        self.state = StateTable(empty_out, name=f"view_{name}")

        znorm = lambda df: ZSetFrame(df.toDF(*cols))
        z_base = lambda bmap: znorm(eng.eval_on(wb, dict(bmap)))
        z_step = lambda bmap, acc: znorm(
            eng.eval_on(ws, {**bmap, rname: acc.df}))
        self._op = ZSetBagFixpointOp(
            empty_input=empty_zin, empty_output=empty_out,
            z_base=z_base, z_step=z_step,
            base_tbls=base_occs, step_tbls=step_occs)
        self._eng = eng

    @property
    def last_stats(self):
        return self._op.last_stats

    def step(self, eng, combined, old):
        deltas = {t: combined.get(t) for t in self.tables}
        if all(z is None for z in deltas.values()):
            return self._empty()
        # a tick touching a subquery-role input has no sound weighted
        # delta legs — run the op's ring recompute-diff instead
        force = bool(self._sq_inputs
                     & {t for t, z in deltas.items() if z is not None})
        try:
            with _no_constraint_propagation(eng.spark):
                delta = self._op.step(
                    deltas, force_recompute=force).consolidate()
        finally:
            try:
                eng.spark.catalog.dropTempView(self.rname)
            except Exception:
                pass
        self.apply_delta(delta)
        return delta


class _RecursiveCteBagMutualMaintainer(_ViewMaintainer):
    """MUTUAL ``UNION ALL`` recursion — ``WITH RECURSIVE a AS (… ALL …
    b …), b AS (… ALL … a …) …``: the group lowers onto ONE vector bag
    fixpoint (:class:`~database_stream_processor_spark.operators.
    recursive.VectorBagFixpointOp` — multiplicities count derivation
    paths across the whole member vector; the reference's nested
    circuits with several mutually referencing weighted exports,
    recursive.rs:255, vldb23 §5).  Strictly simpler than the set
    vector fixpoint: the weight ring cancels retractions, no DRed.

    This maintainer owns the op and the FIRST member's state; the
    other members are :class:`_RecursiveSatelliteMaintainer` rows that
    pop their per-tick deltas from ``self._stash``.  Every rule must
    be weighted-SPJ and LINEAR in the member vector (at most one
    member atom per rule — a doubled member atom would need the
    quadratic frontier expansion and diverges under SQL's own
    working-table semantics); input atoms may repeat (per-occurrence
    spliced bindings, :func:`_splice_input_occurrences`)."""

    kind = "recursive_bag_mutual"

    def __init__(self, eng: "Engine", name: str, rnames: list[str],
                 tbls: list[str],
                 branches: dict[str, tuple[list[str], list[str]]]):
        from database_stream_processor_spark.operators.recursive import (
            VectorBagFixpointOp)
        self.name = name
        self.tables, self.rnames = list(tbls), list(rnames)
        self._stash: dict[str, ZSetFrame] = {}
        # subqueries in mutual/multi-branch recursion bodies refuse —
        # the vector delta legs rebind inputs to deltas, which is wrong
        # for subquery-role atoms (NEW r12; the single-CTE path handles
        # them via forced recompute ticks, this path does not yet)
        for rn_ in rnames:
            for b_ in branches[rn_][0] + branches[rn_][1]:
                if _scalar_sq_spans(b_):
                    raise _UnloweredShape(
                        "subquery in a mutual/multi-branch recursion "
                        "body is not lowerable")
                _rec_branch_guard(b_)
        scrub = lambda t: re.sub(r"'[^']*'", " ", t)
        refs = lambda t, w: len(re.findall(rf"\b{re.escape(w)}\b"
                                           r"(?!\s*\.)", scrub(t),
                                           re.IGNORECASE))
        b0 = branches[rnames[0]]
        self.sql = (b0[0] or b0[1])[0]
        # weighted per-rule texts: splice repeated inputs, classify the
        # (single) member atom
        built: list[tuple[str, str, list, str | None]] = []
        for rn in rnames:
            bases, steps = branches[rn]
            if not steps:
                raise _UnloweredShape(
                    f"group member {rn!r} has no step rule")
            for idx, br in enumerate(bases + steps):
                mrefs = [(m_, refs(br, m_)) for m_ in rnames
                         if refs(br, m_)]
                total = sum(k for _, k in mrefs)
                if total > 1:
                    raise _UnloweredShape(
                        "non-linear UNION ALL mutual step (a rule may "
                        "reference at most one member atom)")
                recm = mrefs[0][0] if mrefs else None
                text, occs = _splice_input_occurrences(
                    br, tbls, f"{name}_{rn}_{idx}")
                wt = _weighted_branch(
                    text, [b for b, _ in occs]
                    + ([recm] if recm else []))
                if wt is None:
                    raise _UnloweredShape(
                        "UNION ALL recursion branch is not a "
                        "weighted-SPJ shape")
                built.append((rn, wt, occs, recm))
        empty_zin = {t: ZSetFrame.from_df(_source_rows0(eng, t).limit(0))
                     for t in tbls}
        empty_in = {t: z.df for t, z in empty_zin.items()}
        # schema resolution (weighted schemas: …items, __weight last):
        # base-carrying members type from a base rule; pure-step
        # members type once their referenced member is typed — iterate
        # to a fixed point
        schemas: dict[str, object] = {}
        try:
            pending = list(rnames)
            while pending:
                progressed = False
                for rn in list(pending):
                    for rn2, wt, occs, recm in built:
                        if rn2 != rn or (recm is not None
                                         and recm not in schemas):
                            continue
                        bm = {b: empty_in[t] for b, t in occs}
                        if recm is not None:
                            bm[recm] = eng.spark.createDataFrame(
                                [], schemas[recm])
                        snap = eng.eval_on(wt, bm)
                        schemas[rn] = snap.schema
                        pending.remove(rn)
                        progressed = True
                        break
                if not progressed:
                    raise _UnloweredShape(
                        "mutual recursion with an untypable pure-step "
                        "cycle (no base rule reachable)")
            # arity check: every rule of a member matches its schema
            for rn, wt, occs, recm in built:
                bm = {b: empty_in[t] for b, t in occs}
                if recm is not None:
                    bm[recm] = eng.spark.createDataFrame(
                        [], schemas[recm])
                probe = eng.eval_on(wt, bm)
                if len(probe.columns) != len(schemas[rn].fields):
                    raise _UnloweredShape(
                        f"rule arity {len(probe.columns)} != member "
                        f"{rn!r} arity {len(schemas[rn].fields)}")
        finally:
            for rn in rnames:
                try:
                    eng.spark.catalog.dropTempView(rn)
                except Exception:
                    pass
        out_cols = {rn: [f.name for f in schemas[rn].fields]
                    for rn in rnames}
        self._schemas = schemas
        empty_out = {rn: ZSetFrame(eng.spark.createDataFrame(
            [], schemas[rn])) for rn in rnames}
        self.state = StateTable(
            ZSetFrame(eng.spark.createDataFrame(
                [], schemas[rnames[0]])),
            name=f"view_{name}")

        def mk_eval(rn, wt):
            return lambda bm: ZSetFrame(
                eng.eval_on(wt, dict(bm)).toDF(*out_cols[rn]))

        rules = [{"member": rn, "eval": mk_eval(rn, wt),
                  "occs": list(occs),
                  "rec": ((recm, recm) if recm is not None else None)}
                 for rn, wt, occs, recm in built]
        self._op = VectorBagFixpointOp(
            empty_inputs=empty_zin,
            members=list(rnames), empty_out=empty_out,
            branches=rules)
        self._eng = eng

    @property
    def last_stats(self):
        return self._op.last_stats

    def step(self, eng, combined, old):
        deltas = {t: combined.get(t) for t in self.tables}
        if all(z is None for z in deltas.values()):
            self._stash = {}
            return self._empty()
        try:
            with _no_constraint_propagation(eng.spark):
                out = self._op.step(deltas)
        finally:
            for v in self.rnames:
                try:
                    eng.spark.catalog.dropTempView(v)
                except Exception:
                    pass
        self._stash = {rn: out[rn] for rn in self.rnames[1:]}
        delta = out[self.rnames[0]]
        self.apply_delta(delta)
        return delta


def _recursive_cte_lift(eng: "Engine", name: str, flat: str):
    """``WITH RECURSIVE r AS (SELECT base … UNION SELECT step … FROM
    … r …) SELECT …`` — the SQL spelling of the reference's recursive
    views (sql-to-dbsp supports recursive queries; operators/recursive
    .py carries the execution machinery).  The CTE becomes a hidden
    maintained view ``__{name}_rec`` backed by
    :class:`_RecursiveCteMaintainer`; the main SELECT rewrites the CTE
    name to the hidden view and re-lowers (a snapshot-diff main is
    accepted: it reads the MAINTAINED recursive snapshot, never re-runs
    the recursion).

    Non-recursive CTEs may accompany the recursive one in any position
    (the classic ``WITH RECURSIVE edges AS (…), paths AS (… FROM edges
    … UNION … paths …)`` spelling): they hoist through the ordinary CTE
    machinery, and the recursion's input table may BE such a hidden
    view.

    Since r10: NON-LINEAR steps (the CTE joined with itself) lower via
    per-occurrence step variants (:func:`_rec_occurrence_variants`);
    the recursion may span up to FOUR input relations (the cap was three through r11); and ``UNION
    ALL`` routes to the Z-set bag fixpoint
    (:class:`_RecursiveCteBagMaintainer` — multiplicities count
    derivation paths; since r11 its branches may span several inputs).

    Since r11: MUTUAL recursion — CTEs forming ONE strongly-connected
    reference cycle (``a`` reads ``b``, ``b`` reads ``a``; possibly
    through pure-step intermediaries) lower onto a single vector
    fixpoint (:class:`_RecursiveCteMutualMaintainer` + satellites), the
    reference's nested circuits with several mutually referencing
    exports (recursive.rs:255, galen.rs).

    Since r11 a SET-fixpoint branch may reference an input table twice
    (per-occurrence spliced delta legs, :func:`_input_delta_legs`).

    Since r12: MUTUAL ``UNION ALL`` recursion lowers onto the vector
    bag fixpoint (:class:`_RecursiveCteBagMutualMaintainer` — rules
    linear in the member vector, no DRed); a bag branch may reference
    an input table TWICE (exact per-occurrence spliced bindings,
    :func:`_splice_input_occurrences`); and SEVERAL DISJOINT recursive
    components each lower onto their own independent fixpoint (a later
    component may read an earlier one's members as inputs).

    Refused shapes (→ error or fallback upstream): a recursive
    component reading a LATER component's members, mixed UNION /
    UNION ALL within one mutual group, >3 input relations, non-linear
    steps or twice-referenced inputs with unaliased occurrences,
    non-linear UNION ALL (the CTE or a member atom referenced twice in
    one bag branch — diverges under SQL's own working-table semantics),
    UNION ALL with a non-SPJ body, a CTE name colliding with a known
    source or column, or a non-recursive CTE that reads a group member
    but precedes the group's last member (consumers go after the
    group)."""
    m = re.match(r"^WITH\s+RECURSIVE\s+", flat, re.IGNORECASE)
    if not m:
        raise _UnloweredShape("not a WITH RECURSIVE clause")
    ctes, main = _parse_with_clause("WITH " + flat[m.end():])
    scrub = lambda t: re.sub(r"'[^']*'", " ", t)
    # count TABLE-position references only: a ``name.col`` qualifier is
    # not a second atom — ``FROM p … WHERE p.dst = e.src`` is LINEAR
    # (the r10 fuzz caught the inflated count refusing that spelling)
    refs = lambda t, w: len(re.findall(rf"\b{w}\b(?!\s*\.)", scrub(t),
                                       re.IGNORECASE))
    # recursive set = CTEs on a reference cycle (self-loops AND mutual
    # cycles, possibly through intermediaries): reachability closure
    # over the name-reference graph
    cnames = [n for n, _ in ctes]
    body_of = dict(ctes)
    reach = {n: {m_ for m_ in cnames if refs(body_of[n], m_)}
             for n in cnames}
    changed = True
    while changed:
        changed = False
        for n in cnames:
            add = set().union(*(reach[m_] for m_ in reach[n])) \
                - reach[n] if reach[n] else set()
            if add:
                reach[n] |= add
                changed = True
    rec_set = {n for n in cnames if n in reach[n]}
    if not rec_set:
        # RECURSIVE keyword with no reference cycle: plain CTE semantics
        return _cte_lift(eng, name, "WITH " + flat[m.end():])
    # SCC partition: DISJOINT recursive components each lower onto
    # their own independent fixpoint (r11 verdict ask #7; refused
    # ≤r11).  Components may read earlier components' members — those
    # references rewrite to the earlier component's hidden maintained
    # views and count as recursion INPUTS — but not later ones (forward
    # references across components would need a combined fixpoint).
    comp_of = {n: frozenset({n} | {m_ for m_ in rec_set
                                   if m_ in reach[n] and n in reach[m_]})
               for n in rec_set}
    n_comps = len(set(comp_of.values()))
    order = {n: i for i, n in enumerate(cnames)}
    for n in rec_set:
        later = {m_ for m_ in rec_set if m_ not in comp_of[n]
                 and m_ in reach[n]
                 and max(order[x] for x in comp_of[m_])
                 > max(order[x] for x in comp_of[n])}
        if later:
            raise _UnloweredShape(
                f"recursive component of {n!r} references a LATER "
                f"component ({sorted(later)}) — reorder the CTEs")
    # column-collision guard over every known source in the text (the
    # whole-word rewrite discipline of _cte_lift)
    words = {w.lower() for w in re.findall(r"\b\w+\b", scrub(flat))}
    src_cols: set[str] = set()
    for t in words:
        # tables, plus views that HAVE a maintainer — an eng.views
        # entry without one is the view currently being created
        # (registered before lowering), not a real source here
        if t in eng.tables or t in eng._maintainers:
            src_cols.update(c.lower()
                            for c in _source_rows0(eng, t).columns)
    registered: list[str] = []
    try:
        mapping: dict[str, str] = {}
        gbodies: dict[str, str] = {}
        for i, (cname, body) in enumerate(ctes):
            if cname in src_cols:
                raise _UnloweredShape(
                    f"CTE name {cname!r} collides with a source column")
            if cname in eng.tables or cname in eng.views \
                    or cname in eng._maintainers:
                raise _UnloweredShape(
                    f"CTE name {cname!r} shadows a known source")
            for prev, hid in mapping.items():
                body = _sub_table_refs(prev, hid, body)
                if body is None:
                    raise _UnloweredShape(
                        f"CTE name {prev!r} also used as a relation "
                        "alias")
            if cname not in rec_set:
                # ordinary CTE: hoist through the regular machinery
                body = _normalize_comma_from(eng, body)
                hid = f"__{name}_cte_{cname}"
                _register_hidden(eng, hid, body, registered)
                # ADVICE r9 #2: later CTE names must not collide with
                # this hidden view's output columns
                src_cols.update(
                    c.lower()
                    for c in _source_rows0(eng, hid).columns)
                mapping[cname] = hid
                continue
            if len(comp_of[cname]) > 1:
                # mutual group member: collect its (mapping-rewritten)
                # body; the COMPONENT registers once its LAST member
                # arrives — interleaved non-recursive CTEs the later
                # members read are hoisted by then
                gbodies[cname] = body
                group = [n for n in cnames if n in comp_of[cname]]
                if any(n not in gbodies for n in group):
                    continue
                # re-apply the full mapping: a member collected BEFORE
                # an interleaved earlier component registered missed
                # that component's hidden names (idempotent — already-
                # rewritten hidden names never re-match)
                for gn in group:
                    b_ = gbodies[gn]
                    for prev, hid_ in mapping.items():
                        b_ = _sub_table_refs(prev, hid_, b_)
                        if b_ is None:
                            raise _UnloweredShape(
                                f"CTE name {prev!r} also used as a "
                                "relation alias")
                    gbodies[gn] = b_
                gbranches: dict[str, tuple[list[str], list[str]]] = {}
                gflags: list[bool] = []
                for gn in group:
                    u = _split_union(gbodies[gn])
                    parts, flag = ((u[0], u[1]) if u is not None
                                   else ([gbodies[gn]], None))
                    if flag is not None:
                        gflags.append(flag)
                    bases = [p.strip() for p in parts
                             if not any(refs(p, m_) for m_ in group)]
                    steps = [p.strip() for p in parts
                             if any(refs(p, m_) for m_ in group)]
                    gbranches[gn] = (bases, steps)
                # a single-branch (pure-step, no UNION) member joins
                # either camp; explicit UNION and UNION ALL must not mix
                group_bag = bool(gflags) and all(gflags)
                if gflags and any(gflags) and not group_bag:
                    raise _UnloweredShape(
                        "mixed UNION / UNION ALL mutual recursion")
                gw = {w.lower() for gn in group for w in re.findall(
                    r"\b\w+\b", scrub(gbodies[gn]))}
                tbls = sorted(w for w in gw
                              if w in eng.tables or w in eng.views
                              or w in eng._maintainers)
                if not 1 <= len(tbls) <= 4:
                    raise _UnloweredShape(
                        f"mutual recursion over {len(tbls)} input "
                        "tables (1-4 are lowerable)")
                hidp = f"__{name}_rec_{group[0]}"
                registered.append(hidp)
                mcls = (_RecursiveCteBagMutualMaintainer if group_bag
                        else _RecursiveCteMutualMaintainer)
                hm = mcls(eng, hidp, group, tbls, gbranches)
                eng._maintainers[hidp] = hm
                eng._sources[hidp] = set(tbls)
                hm.state.current.rows().createOrReplaceTempView(hidp)
                mapping[group[0]] = hidp
                for gn in group[1:]:
                    hids = f"__{name}_rec_{gn}"
                    registered.append(hids)
                    sm = _RecursiveSatelliteMaintainer(eng, hids, gn,
                                                       hm)
                    if group_bag:
                        sm.kind = "recursive_bag_mutual"
                    eng._maintainers[hids] = sm
                    eng._sources[hids] = {hidp}
                    sm.state.current.rows() \
                        .createOrReplaceTempView(hids)
                    mapping[gn] = hids
                continue
            # the (single) recursive CTE
            rname = cname
            u = _split_union(body)
            if u is None or len(u[0]) < 2:
                raise _UnloweredShape("recursive body is not "
                                      "base UNION step")
            if len(u[0]) > 2:
                # MULTI-BRANCH body (several bases and/or several
                # steps — NEW r12): route through the vector
                # maintainers as a ONE-member group (they already
                # evaluate arbitrary rule lists per member; the set
                # path keeps per-occurrence variants, the bag path its
                # exact multilinear legs)
                parts_mb = [p.strip() for p in u[0]]
                bases_mb = [p for p in parts_mb if not refs(p, rname)]
                steps_mb = [p for p in parts_mb if refs(p, rname)]
                if not steps_mb:
                    raise _UnloweredShape("no recursive branch")
                bw = {w.lower() for p in parts_mb
                      for w in re.findall(r"\b\w+\b", scrub(p))}
                tbls = sorted(w for w in bw
                              if w in eng.tables or w in eng.views
                              or w in eng._maintainers)
                if not 1 <= len(tbls) <= 4:
                    raise _UnloweredShape(
                        f"recursion over {len(tbls)} input tables "
                        "(1-4 are lowerable)")
                hid = (f"__{name}_rec" if n_comps == 1
                       else f"__{name}_rec_{cname}")
                registered.append(hid)
                mcls = (_RecursiveCteBagMutualMaintainer if u[1]
                        else _RecursiveCteMutualMaintainer)
                hm = mcls(eng, hid, [rname], tbls,
                          {rname: (bases_mb, steps_mb)})
                eng._maintainers[hid] = hm
                eng._sources[hid] = set(tbls)
                hm.state.current.rows().createOrReplaceTempView(hid)
                mapping[cname] = hid
                continue
            is_bag = u[1]
            base_sql, step_sql = u[0][0].strip(), u[0][1].strip()
            if refs(base_sql, rname):
                # branches may be written in either order
                if refs(step_sql, rname):
                    raise _UnloweredShape("both branches reference "
                                          "the CTE")
                base_sql, step_sql = step_sql, base_sql
            # non-linear recursion (the CTE joined with itself): one
            # step-text variant per CTE occurrence drives the op's
            # delta_step_out — every occurrence must be an aliased
            # table reference for the variant splice to be sound
            fname = f"__{name}_rec_f"
            n_self = refs(step_sql, rname)
            variants = None
            if n_self > 1 and is_bag:
                # the bag rounds are linear in the CTE atom; a doubled
                # atom would need the quadratic frontier expansion AND
                # diverges under SQL's own working-table semantics on
                # most graphs — keep refusing
                raise _UnloweredShape(
                    "non-linear UNION ALL recursion (the CTE "
                    "referenced twice in the step) is not lowerable")
            if n_self > 1 and not is_bag:
                variants = _rec_occurrence_variants(step_sql, rname,
                                                    fname)
                if variants is None:
                    raise _UnloweredShape(
                        "non-linear recursion with unaliased or "
                        "non-table CTE occurrences")
            # the recursion's inputs: tables / maintained views
            # (earlier CTEs count through their hidden views) the
            # branches reference; the op integrates each — the main
            # SELECT may freely join other tables.  The input count is
            # capped: every input adds a delta leg per tick.
            bw = {w.lower()
                  for w in re.findall(r"\b\w+\b", scrub(base_sql) + " "
                                      + scrub(step_sql))}
            tbls = sorted(w for w in bw
                          if w in eng.tables or w in eng.views
                          or w in eng._maintainers)
            if not 1 <= len(tbls) <= 4:
                raise _UnloweredShape(
                    f"recursion over {len(tbls)} input tables "
                    "(1-4 are lowerable)")
            # sole component keeps the historical name; several
            # disjoint components need distinct hidden views
            hid = (f"__{name}_rec" if n_comps == 1
                   else f"__{name}_rec_{cname}")
            registered.append(hid)
            if is_bag:
                # UNION ALL: the Z-set bag fixpoint (weights count
                # derivation paths) — linear in the CTE atom; branches
                # may span several inputs (multilinear delta legs)
                hm = _RecursiveCteBagMaintainer(eng, hid, rname,
                                                tbls, base_sql,
                                                step_sql)
            else:
                hm = _RecursiveCteMaintainer(eng, hid, rname, tbls,
                                             base_sql, step_sql,
                                             step_variants=variants,
                                             fname=fname)
            eng._maintainers[hid] = hm
            eng._sources[hid] = set(tbls)
            hm.state.current.rows().createOrReplaceTempView(hid)
            mapping[cname] = hid
        for prev, hid in mapping.items():
            main = _sub_table_refs(prev, hid, main)
            if main is None:
                raise _UnloweredShape(
                    f"CTE name {prev!r} also used as a relation alias")
        main = _normalize_comma_from(eng, main)
        return _lower_view(eng, name, main)
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _cte_lift(eng: "Engine", name: str, flat: str):
    """``WITH a AS (…), b AS (…) SELECT …`` — each CTE becomes a hidden
    maintained view ``__{name}_cte_{a}`` (itself lowered through every
    recognizer, so a grouped CTE gets the linear-agg maintainer, a join
    CTE the multilinear delta join, …), later CTE bodies and the main
    SELECT are rewritten to reference the hidden names, and the main
    body re-lowers over the hidden views' per-tick output deltas —
    linear ∘ anything stays O(Δ) end to end, exactly the layered
    CREATE VIEW scripts the reference's Calcite frontend flattens CTEs
    into (sql-to-dbsp treats WITH as inline views).

    Scoping follows the standard: a CTE's own body sees only EARLIER
    CTEs (its own name, if it shadows a base table, still means the
    base table inside its body); the main SELECT sees all of them.

    Refused shapes (→ snapshot-diff of the original text): RECURSIVE,
    column-alias lists, a CTE name that shadows a known source, that
    collides with a column of any referenced source or earlier hidden
    CTE view (the qualifier rewrite could then corrupt a struct-field
    access; ADVICE r9 #2), that is also used as a relation alias, or
    any stage that itself only snapshot-diffs.  The rewrite itself is
    TABLE-POSITION-ONLY (:func:`_sub_table_refs`), so select-list
    aliases equal to a CTE name survive verbatim (ADVICE r9 #1)."""
    ctes, main = _parse_with_clause(flat)
    # column-collision guard: the ``name.`` qualifier rewrite inside
    # _sub_table_refs could still capture a struct-field access on a
    # column named like the CTE — refuse those (rare; users name CTEs
    # as tables)
    words = {w.lower() for w in re.findall(r"\b\w+\b", flat)}
    src_cols: set[str] = set()
    for t in words:
        # tables, plus views that HAVE a maintainer — an eng.views
        # entry without one is the view currently being created
        # (registered before lowering), not a real source here
        if t in eng.tables or t in eng._maintainers:
            src_cols.update(c.lower()
                            for c in _source_rows0(eng, t).columns)
    registered: list[str] = []
    # a CTE may shadow a real source (standard scoping: its own body
    # still sees the source; consumers see the CTE) — but then a
    # leftover unclassified occurrence after the table-position rewrite
    # would silently read the base table instead of failing analysis,
    # so those names get a stricter post-rewrite check
    shadows = {c for c, _ in ctes
               if c in eng.tables or c in eng.views
               or c in eng._maintainers}

    def _rewrite_refs(txt: str, mapping: dict[str, str]) -> str:
        for prev, hid in mapping.items():
            txt = _sub_table_refs(prev, hid, txt)
            if txt is None:
                raise _UnloweredShape(
                    f"CTE name {prev!r} also used as a relation alias")
            if prev in shadows and _search_outside_literals(
                    rf"\b{re.escape(prev)}\b", txt, re.IGNORECASE):
                raise _UnloweredShape(
                    f"unclassified occurrence of shadowing CTE name "
                    f"{prev!r}")
        return txt

    try:
        mapping: dict[str, str] = {}
        for cname, body in ctes:
            if cname in src_cols:
                raise _UnloweredShape(
                    f"CTE name {cname!r} collides with a source column")
            body = _rewrite_refs(body, mapping)
            body = _normalize_comma_from(eng, body)
            hid = f"__{name}_cte_{cname}"
            _register_hidden(eng, hid, body, registered)
            # ADVICE r9 #2: later CTE names must not collide with this
            # hidden view's output columns either
            src_cols.update(c.lower()
                            for c in _source_rows0(eng, hid).columns)
            mapping[cname] = hid
        main = _rewrite_refs(main, mapping)
        main = _normalize_comma_from(eng, main)
        fm = _lower_view(eng, name, main)
        if fm.kind == "differentiate":
            raise _UnloweredShape("WITH main body snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _from_multi_subquery_lift(eng: "Engine", name: str, flat: str):
    """Derived tables ANYWHERE in a JOIN chain — ``FROM (SELECT …) x
    JOIN (SELECT …) y ON x.k = y.k`` (the join-of-two-aggregates
    idiom): every top-level ``( SELECT … ) alias`` span in the FROM
    clause hoists into a hidden maintained view ``__{name}_sub{i}``,
    the chain splices the hidden name in WITH the alias kept (ON/WHERE
    qualifiers keep resolving), and the whole text re-lowers.  Spans in
    WHERE/HAVING are untouched (those are scalar/filter subqueries with
    their own passes).  Derived tables cannot be correlated, so each
    hoist is always sound."""
    parts = _split_select_from(flat)
    if parts is None:
        raise _UnloweredShape("not a SELECT…FROM")
    sel, rest = parts
    stop = _find_top_kw(rest, _NCF_STOPS)
    from_clause = rest if stop < 0 else rest[:stop]
    tail = "" if stop < 0 else rest[stop:]
    spans = _scalar_sq_spans(from_clause)
    if not spans:
        raise _UnloweredShape("no derived tables in the FROM chain")
    registered: list[str] = []
    try:
        out, last = [], 0
        for i, (a, b) in enumerate(spans):
            inner = from_clause[a + 1:b - 1].strip()
            after = from_clause[b:]
            am = re.match(r"^\s*(?:AS\s+)?([A-Za-z_]\w*)\b", after)
            if am is None or am.group(1).lower() in _SQL_KEYWORDS:
                raise _UnloweredShape("derived table without an alias")
            hid = f"__{name}_sub{i}"
            _register_hidden(eng, hid, inner, registered)
            out.append(from_clause[last:a])
            out.append(hid)
            last = b
        out.append(from_clause[last:])
        fm = _lower_view(eng, name,
                         f"SELECT {sel} FROM {''.join(out)}{tail}")
        if fm.kind == "differentiate":
            raise _UnloweredShape("outer over derived chain "
                                  "snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


#: SELECT … FROM lt LEFT [OUTER] JOIN rt ON cond [WHERE p] GROUP BY keys
_LJ_AGG_RE = re.compile(
    r"^SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<lt>\w+)(?:\s+(?:AS\s+)?"
    r"(?P<la>\w+))?\s+LEFT\s+(?:OUTER\s+)?JOIN\s+(?P<rt>\w+)"
    r"(?:\s+(?:AS\s+)?(?P<ra>\w+))?\s+ON\s+(?P<cond>.+?)"
    r"(?:\s+WHERE\s+(?P<pred>.+?))?"
    r"\s+GROUP\s+BY\s+(?P<keys>[\w\s,.]+?)\s*$",
    re.IGNORECASE | re.DOTALL)

_LJ_AGG_ITEM = re.compile(
    r"^(?:(?P<key>[\w.]+)(?:\s+AS\s+(?P<kal>\w+))?"
    rf"|(?P<fn>COUNT|SUM)\s*\((?P<arg>{_NEST2})\)\s+AS\s+(?P<name>\w+))$",
    re.IGNORECASE)


def _left_join_agg(eng: "Engine", name: str, flat: str):
    """COUNT/SUM aggregates over a LEFT OUTER JOIN grouped by LEFT-side
    keys — verbatim TPC-H q13's inner ``SELECT c_custkey,
    COUNT(o_orderkey) FROM customer LEFT OUTER JOIN orders ON c_custkey
    = o_custkey AND o_comment NOT LIKE … GROUP BY c_custkey`` — as a
    three-stage maintained stack:

    1. ``__{name}_g``: right-side partials grouped by the join keys
       (right-only ON residual terms pushed into its WHERE — in LEFT
       JOIN semantics they gate matches, never left rows);
    2. ``__{name}_lj``: left table LEFT JOIN the partials (touched-key
       outer-join maintenance; a left key with no group row carries
       NULL partials, exactly the null-padded match-set);
    3. the view: a linear aggregate over the lj view — COUNT(rcol)
       finalizes as SUM(COALESCE(partial, 0)) and SUM(rcol) as
       SUM(partial), so duplicate left rows multiply counts exactly as
       SQL's row-level grouping does.

    COUNT(*) (a null-padded row still counts 1), right-referencing
    WHERE terms, and left-side ON terms raise
    :class:`_UnloweredShape`."""
    m = _LJ_AGG_RE.match(flat)
    if m is None:
        raise _UnloweredShape("not a left-join aggregate")
    lt, rt = m.group("lt").lower(), m.group("rt").lower()
    for t in (lt, rt):
        if not (t in eng.tables or t in eng.views
                or t in eng._maintainers):
            raise _UnloweredShape(f"unknown source {t}")
    la = (m.group("la") or lt).lower()
    ra = (m.group("ra") or rt).lower()
    lcols = {c.lower() for c in _source_rows0(eng, lt).columns}
    rcols = {c.lower() for c in _source_rows0(eng, rt).columns}

    def side(tok: str) -> str | None:
        if "." in tok:
            q, c = tok.split(".", 1)
            q = q.lower()
            if q == la and c.lower() in lcols:
                return "l"
            if q == ra and c.lower() in rcols:
                return "r"
            return None
        t = tok.lower()
        if t in lcols and t not in rcols:
            return "l"
        if t in rcols and t not in lcols:
            return "r"
        return None

    def side_only(txt: str, want: str, qual: str,
                  qcols: set[str]) -> bool:
        scan = re.sub(r"'[^']*'", " ", txt)
        for qm in re.finditer(r"\b([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)",
                              scan):
            if (qm.group(1).lower() != qual
                    or qm.group(2).lower() not in qcols):
                return False
        for bm in re.finditer(r"\b([A-Za-z_]\w*)\b(?!\s*[(.])", scan):
            tok = bm.group(1)
            pre = scan[:bm.start()].rstrip()
            if (tok.lower() in _SQL_KEYWORDS or pre.endswith(".")
                    or re.search(r"\bAS$", pre, re.IGNORECASE)):
                continue
            if side(tok) != want:
                return False
        return True

    def right_only(txt: str) -> bool:
        return side_only(txt, "r", ra, rcols)

    def left_only(txt: str) -> bool:
        return side_only(txt, "l", la, lcols)

    def deal_r(txt: str) -> str:
        return _sub_outside_literals(rf"\b{ra}\s*\.\s*", "", txt,
                                     re.IGNORECASE)

    def deal_l(txt: str) -> str:
        return _sub_outside_literals(rf"\b{la}\s*\.\s*", "", txt,
                                     re.IGNORECASE)

    pairs, rresid = [], []
    if _mixed_top_and_or(m.group("cond")):
        raise _UnloweredShape("mixed top-level AND/OR in ON")
    for term in _split_top_and_bw(m.group("cond")):
        em = re.match(r"^([\w.]+)\s*=\s*([\w.]+)$", term.strip())
        if em:
            s1, s2 = side(em.group(1)), side(em.group(2))
            if {s1, s2} == {"l", "r"}:
                l_tok, r_tok = ((em.group(1), em.group(2)) if s1 == "l"
                                else (em.group(2), em.group(1)))
                pairs.append((l_tok.split(".")[-1],
                              r_tok.split(".")[-1]))
                continue
        if right_only(term):
            rresid.append(deal_r(term))
            continue
        raise _UnloweredShape(f"unsupported ON term: {term}")
    if not pairs:
        raise _UnloweredShape("no join keys")
    if m.group("pred") and not left_only(m.group("pred")):
        raise _UnloweredShape("WHERE references the right side")

    keys = []
    for k in (x.strip() for x in m.group("keys").split(",")):
        if side(k) != "l":
            raise _UnloweredShape(f"group key not left-side: {k}")
        keys.append(k.split(".")[-1])

    g_parts, out_items = [], []
    for it in (i.strip() for i in _split_top_level(m.group("sel"))):
        im = _LJ_AGG_ITEM.match(it)
        if im is None:
            raise _UnloweredShape(it)
        if im.group("key"):
            k = im.group("key")
            if side(k) != "l" or k.split(".")[-1] not in keys:
                raise _UnloweredShape(f"select key not grouped: {k}")
            al = im.group("kal") or k.split(".")[-1]
            out_items.append(f"{k.split('.')[-1]} AS {al}")
            continue
        fn = im.group("fn").upper()
        arg = im.group("arg").strip()
        if arg == "*" or not right_only(arg):
            raise _UnloweredShape(f"unsupported aggregate: {it}")
        i = len(g_parts)
        g_parts.append(f"{fn}({deal_r(arg)}) AS __a{i}")
        if fn == "COUNT":
            out_items.append(f"SUM(COALESCE(__a{i}, 0)) "
                             f"AS {im.group('name')}")
        else:
            out_items.append(f"SUM(__a{i}) AS {im.group('name')}")
    if not g_parts:
        raise _UnloweredShape("no right-side aggregates")

    rkeys = [r for _, r in pairs]
    g_name, lj_name = f"__{name}_g", f"__{name}_lj"
    g_sql = (f"SELECT {', '.join(rkeys)}, {', '.join(g_parts)} "
             f"FROM {rt}")
    if rresid:
        g_sql += " WHERE " + " AND ".join(rresid)
    g_sql += f" GROUP BY {', '.join(rkeys)}"
    needed_left = sorted({*keys, *[lk for lk, _ in pairs]})
    lj_sel = ", ".join([f"{lt}.{c} AS {c}" for c in needed_left]
                       + [f"{g_name}.__a{i} AS __a{i}"
                          for i in range(len(g_parts))])
    on_txt = " AND ".join(f"{lt}.{lk} = {g_name}.{rk}"
                          for (lk, _), rk in zip(pairs, rkeys))
    lj_sql = (f"SELECT {lj_sel} FROM {lt} LEFT JOIN {g_name} "
              f"ON {on_txt}")
    if m.group("pred"):
        lj_sql += f" WHERE {deal_l(m.group('pred'))}"
    final = (f"SELECT {', '.join(out_items)} FROM {lj_name} "
             f"GROUP BY {', '.join(keys)}")
    registered: list[str] = []
    try:
        for hname, hsql in [(g_name, g_sql), (lj_name, lj_sql)]:
            _register_hidden(eng, hname, hsql, registered)
        fm = _lower_view(eng, name, final)
        if fm.kind == "differentiate":
            raise _UnloweredShape("final aggregate snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _agg_over_scalar_subquery(eng: "Engine", name: str, flat: str):
    """Grouped aggregates OVER scalar-subquery values — ``SELECT g,
    SUM((SELECT SUM(x) FROM inner WHERE ik = ok)) FROM outer GROUP BY
    g`` — as a two-stage stack: a hidden view ``__{name}_ssq``
    projects the outer table's columns plus each scalar span as
    ``__sx{i}`` (the scalar-subquery machinery lowers it to the
    grouped-view + left-join stack, so the column carries exact
    one-shot scalar semantics: NULL for unmatched rows, 0 for COUNT),
    and the aggregate re-lowers over the hidden view's deltas with the
    spans replaced by the ``__sx{i}`` columns.  SUM/AVG/COUNT over a
    NULL scalar then skip/count exactly as a one-shot evaluation
    would.  Single-table outer FROMs only; the outer WHERE pushes into
    the hidden stage."""
    parts = _split_select_from(flat)
    if parts is None:
        raise _UnloweredShape("not a SELECT…FROM")
    sel, rest = parts
    spans = _scalar_sq_spans(sel)
    if not spans:
        raise _UnloweredShape("no scalar spans in the select list")
    body, pred = _split_where(rest)
    gm = re.match(r"^(?P<tbl>\w+)(?:\s+(?:AS\s+)?(?P<alias>\w+))?\s+"
                  r"GROUP\s+BY\s+(?P<tail>.+)$", body,
                  re.IGNORECASE | re.DOTALL) \
        if re.search(r"\bGROUP\s+BY\b", body, re.IGNORECASE) else None
    # SQL places WHERE before GROUP BY, so the GROUP BY lives in `body`
    # when there is no WHERE and in `pred` when there is one
    if gm is None:
        bm = re.match(r"^(?P<tbl>\w+)(?:\s+(?:AS\s+)?(?P<alias>\w+))?\s*$",
                      body)
        if bm is None or pred is None \
                or not re.search(r"\bGROUP\s+BY\b", pred, re.IGNORECASE):
            raise _UnloweredShape("outer FROM is not a single grouped "
                                  "table")
        gp = _find_top_kw(pred, ("GROUP",))
        if gp < 0:
            raise _UnloweredShape("GROUP BY buried in the predicate")
        tbl = bm.group("tbl").lower()
        alias = (bm.group("alias") or bm.group("tbl")).lower()
        where_txt, group_tail = pred[:gp].strip(), pred[gp:].strip()
    else:
        tbl = gm.group("tbl").lower()
        alias = (gm.group("alias") or gm.group("tbl")).lower()
        where_txt, group_tail = None, "GROUP BY " + gm.group("tail")
        if pred is not None:
            raise _UnloweredShape("WHERE after GROUP BY")
    if not (tbl in eng.tables or tbl in eng.views
            or tbl in eng._maintainers):
        raise _UnloweredShape(f"unknown outer table {tbl}")
    cols = list(_source_rows0(eng, tbl).columns)
    if any(c.startswith("__sx") for c in cols):
        raise _UnloweredShape("outer column __sx* collides")
    # one hidden scalar column per DISTINCT span text
    span_col: dict[str, str] = {}
    out_sel, last = [], 0
    for a, b in spans:
        txt = sel[a:b]
        if txt not in span_col:
            span_col[txt] = f"__sx{len(span_col)}"
        out_sel.append(sel[last:a])
        out_sel.append(span_col[txt])
        last = b
    out_sel.append(sel[last:])
    new_sel = "".join(out_sel)
    hidden = f"__{name}_ssq"
    hsql = ("SELECT " + ", ".join(cols)
            + ", " + ", ".join(f"{txt} AS {c}"
                               for txt, c in span_col.items())
            + f" FROM {tbl} {alias}"
            + (f" WHERE {where_txt}" if where_txt else ""))
    registered: list[str] = []
    try:
        _register_hidden(eng, hidden, hsql, registered)
        outer = (f"SELECT {new_sel} FROM {hidden} {group_tail}")
        outer = _sub_outside_literals(rf"\b{alias}\s*\.\s*", "", outer,
                                      re.IGNORECASE)
        fm = _lower_view(eng, name, outer)
        if fm.kind == "differentiate":
            raise _UnloweredShape("aggregate over the scalar stage "
                                  "snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _agg_over_subquery_filter(eng: "Engine", name: str, flat: str):
    """GROUP BY aggregates over a subquery-filtered table — verbatim
    TPC-H q4 (``SELECT o_orderpriority, COUNT(*) FROM orders WHERE
    EXISTS (…) GROUP BY o_orderpriority``): synthesize a hidden
    maintained view ``__{name}_src`` = the filtered rows (lowered
    through the [NOT] EXISTS / [NOT] IN / scalar subquery-filter
    maintainers), then re-lower the aggregate over its O(Δ) output
    delta through the ordinary agg recognizers."""
    m = _AGG_RE.match(flat)
    if m is None or not m.group("pred"):
        raise _UnloweredShape("not a filtered single-table aggregate")
    if not re.search(r"\(\s*SELECT", m.group("pred"), re.IGNORECASE):
        raise _UnloweredShape("no subquery in WHERE")
    tbl = m.group("tbl").lower()
    if not (tbl in eng.tables or tbl in eng.views
            or tbl in eng._maintainers):
        raise _UnloweredShape(tbl)
    cols = {c.lower(): c for c in _source_rows0(eng, tbl).columns}
    # the predicate's correlation refs (EXISTS … WHERE l_orderkey =
    # o_orderkey) must ride along in the hidden view's select — the
    # filter maintainer resolves them against its own output
    outer_txt = " ".join([m.group("sel"), m.group("keys"),
                          m.group("having") or "", m.group("pred")])
    scan = re.sub(r"'[^']*'", " ", outer_txt)
    needed: set[str] = set()
    for bm in re.finditer(r"\b([A-Za-z_]\w*)\b", scan):
        c = bm.group(1).lower()
        pre = scan[:bm.start()].rstrip()
        if (c in _SQL_KEYWORDS or pre.endswith(".")
                or re.search(r"\bAS$", pre, re.IGNORECASE)):
            continue
        if c in cols:
            needed.add(cols[c])
    if not needed:
        raise _UnloweredShape("no source columns in aggregate items")
    hidden = f"__{name}_src"
    hsql = (f"SELECT {', '.join(sorted(needed))} FROM {tbl} "
            f"WHERE {m.group('pred')}")
    registered: list[str] = []
    try:
        _register_hidden(eng, hidden, hsql, registered)
        outer = (f"SELECT {m.group('sel')} FROM {hidden} "
                 f"GROUP BY {m.group('keys')}")
        if m.group("having"):
            outer += f" HAVING {m.group('having')}"
        # strip table-name qualifiers: the hidden view's columns are bare
        outer = _sub_outside_literals(rf"\b{tbl}\s*\.\s*", "", outer,
                                      re.IGNORECASE)
        fm = _lower_view(eng, name, outer)
        if fm.kind == "differentiate":
            raise _UnloweredShape("outer aggregate snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _claim_chain_cols(txt: str, cols_of: dict, needed: set,
                      where: str, strict_bare: bool = False) -> None:
    """Collect every chain-column reference in ``txt`` into ``needed``
    (bare lower-case names) — qualified refs must name a chain alias
    that owns the column, and any claimed column must live in exactly
    ONE chain table (the hidden join view emits bare names).  Shared by
    the hidden-join-view composers (`_global_agg_over_from`,
    `_agg_over_filtered_join`).  ``strict_bare=True`` additionally
    rejects bare tokens that resolve to no chain table at all (the
    GROUP-BY-less global path owns its whole select text, so an
    unknown token there means an unlowerable expression; the grouped
    path tolerates select aliases and function names)."""
    def owner(col: str) -> str | None:
        owners = [a for a in cols_of if col.lower() in cols_of[a]]
        return owners[0] if len(owners) == 1 else None

    scan = re.sub(r"'[^']*'", " ", txt)
    for qm in re.finditer(r"\b([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\b",
                          scan):
        a, c = qm.group(1).lower(), qm.group(2).lower()
        if a not in cols_of or c not in cols_of[a]:
            raise _UnloweredShape(f"unresolvable {a}.{c} in {where}")
        if owner(c) is None:
            raise _UnloweredShape(f"ambiguous column {c} in {where}")
        needed.add(c)
    for bm in re.finditer(r"\b([A-Za-z_]\w*)\b(?!\s*[(.])", scan):
        c = bm.group(1).lower()
        pre = scan[:bm.start()].rstrip()
        if (c in _SQL_KEYWORDS or pre.endswith(".")
                or re.search(r"\bAS$", pre, re.IGNORECASE)):
            continue
        a = owner(c)
        if a is None:
            if strict_bare or any(c in s for s in cols_of.values()):
                raise _UnloweredShape(f"unresolvable bare column {c} "
                                      f"in {where}")
            continue        # select alias / literal keyword token
        needed.add(c)


def _agg_over_filtered_join(eng: "Engine", name: str, flat: str):
    """Grouped aggregates over a subquery-filtered JOIN chain — the
    last three verbatim TPC-H texts after comma normalization: q16
    (``NOT IN`` + ``COUNT(DISTINCT)`` over partsupp⋈part), q18 (``IN``
    whose body is a grouped HAVING, over a 3-table chain), q21 (EXISTS
    + NOT EXISTS double-correlated on the same table, over a 4-table
    chain).  Decomposition into a maintained O(Δ) stack (the reference's
    Calcite frontend decorrelates these into join/semijoin/antijoin
    nodes — sql-to-dbsp submodule; semijoin.rs, join.rs:338; SURVEY
    §2.4):

    - ``__{name}_in{i}``: each IN body carrying its own GROUP BY
      pre-lowers to a hidden grouped view (q18's ``HAVING
      SUM(l_quantity) > 300`` inner) — the IN then probes the view's
      key column;
    - ``__{name}_jv``: the join chain with every PLAIN WHERE conjunct
      pushed in, projecting exactly the columns the aggregate items,
      GROUP BY keys, HAVING, and the subquery correlations reference
      (multilinear delta joins — the filtered delta is already small);
    - ``__{name}_src``: the subquery-filter maintainer over the jv's
      output delta, outer references inside the subquery bodies
      re-qualified from chain aliases to the hidden view's alias;
    - final: the aggregate re-lowered over the src delta through the
      ordinary recognizers (linear / distinct / nonlinear)."""
    parts = _split_select_from(flat)
    if parts is None:
        raise _UnloweredShape(flat)
    sel, rest = parts
    from_clause, tail = _split_where(rest)
    if tail is None:
        raise _UnloweredShape("no WHERE")
    g = _find_top_kw(tail, ("GROUP",))
    if g < 0:
        raise _UnloweredShape("no GROUP BY")
    pred = tail[:g].strip()
    gm = re.match(r"^GROUP\s+BY\s+(?P<keys>.+?)"
                  r"(?:\s+HAVING\s+(?P<having>.+))?$",
                  tail[g:].strip(), re.IGNORECASE | re.DOTALL)
    if gm is None:
        raise _UnloweredShape("unparsable GROUP BY tail")
    keys_txt, having = gm.group("keys"), gm.group("having")
    if re.search(r"\bROLLUP\b|\bCUBE\b|\bGROUPING\b", keys_txt,
                 re.IGNORECASE):
        raise _UnloweredShape("grouping sets not composed here")
    chain = _parse_aliased_chain(from_clause)
    if chain is None:
        # single-table FROM (the q18 shape without the join): the jv
        # stage degenerates to a maintained projection — same stack
        tm = _TBL_ALIAS_RE.match(from_clause.strip())
        if tm is None or tm.group(0).strip() != from_clause.strip():
            raise _UnloweredShape("unparsable FROM")
        chain = [(tm.group(1).lower(),
                  (tm.group(2) or tm.group(1)).lower(), "")]
    if any(kw != "JOIN" for _, _, kw in chain[1:]):
        raise _UnloweredShape("not an inner join chain")
    if any(t not in eng.tables and t not in eng.views
           and t not in eng._maintainers for t, _, _ in chain):
        raise _UnloweredShape("unknown source in chain")
    alias_of = {a: t for t, a, _ in chain}
    cols_of = {a: {c.lower() for c in _source_rows0(eng, t).columns}
               for t, a, _ in chain}

    def owner(col: str) -> str | None:
        owners = [a for a in cols_of if col.lower() in cols_of[a]]
        return owners[0] if len(owners) == 1 else None

    if _mixed_top_and_or(pred):
        raise _UnloweredShape("top-level OR in WHERE")
    plain, subq_terms = [], []
    for c in _split_top_and(pred):
        if re.search(r"\(\s*SELECT", c, re.IGNORECASE):
            if not (_EXISTS_TERM.match(c) or _IN_TERM.match(c)):
                raise _UnloweredShape(f"unsupported subquery term: {c}")
            subq_terms.append(c)
        else:
            plain.append(c)
    if not subq_terms:
        raise _UnloweredShape("no subquery filter terms")

    needed: set[str] = set()    # bare columns the hidden jv must carry
    _claim_chain_cols(sel, cols_of, needed, "select")
    _claim_chain_cols(keys_txt, cols_of, needed, "group keys")
    if having:
        _claim_chain_cols(having, cols_of, needed, "having")

    OA = "__o"
    rewritten: list[str] = []
    in_views: list[tuple[str, str]] = []
    for term in subq_terms:
        im = _IN_TERM.match(term)
        em = _EXISTS_TERM.match(term)
        if im and _find_top_kw(im.group("inner"), ("GROUP",)) >= 0:
            # IN body with its own GROUP BY (q18): pre-lower as a hidden
            # grouped view; a correlated grouped body cannot slip
            # through — Spark analysis of the standalone hidden view
            # rejects any outer reference at registration time
            body = im.group("inner").strip()
            bp = _split_select_from(body)
            if bp is None:
                raise _UnloweredShape("unparsable IN body")
            item = bp[0].strip()
            icol = (re.split(r"\s+AS\s+", item, flags=re.IGNORECASE)[-1]
                    .split(".")[-1].strip())
            if not re.match(r"^[A-Za-z_]\w*$", icol):
                raise _UnloweredShape(f"IN body select item: {item}")
            hname = f"__{name}_in{len(in_views)}"
            in_views.append((hname, body))
            lhs = im.group("col").split(".")[-1]
            if owner(lhs.lower()) is None:
                raise _UnloweredShape(f"IN operand not a unique chain "
                                      f"column: {im.group('col')}")
            needed.add(lhs.lower())
            neg = "NOT " if im.group("neg") else ""
            rewritten.append(f"{OA}.{lhs} {neg}IN "
                             f"(SELECT {icol} FROM {hname})")
            continue
        sm = (_SUBQ_INNER_RE.match(em.group("inner").strip()) if em
              else _IN_INNER_RE.match(im.group("inner").strip()))
        if sm is None:
            raise _UnloweredShape(f"unparsable subquery body: {term}")
        it = sm.group("it").lower()
        ia = (sm.group("ia") or sm.group("it")).lower()
        if ia in alias_of:
            raise _UnloweredShape(f"inner alias shadows chain ref {ia}")
        try:
            icols = {f.name.lower()
                     for f in _source_rows0(eng, it).schema.fields}
        except Exception:
            raise _UnloweredShape(f"unknown inner table {it}")
        new_term = term
        for a in list(alias_of):
            def _req(mm, a=a):
                c = mm.group(1).lower()
                if c not in cols_of[a] or owner(c) is None:
                    raise _UnloweredShape(f"unresolvable {a}."
                                          f"{mm.group(1)}")
                needed.add(c)
                return f"{OA}.{mm.group(1)}"
            new_term = _sub_outside_literals(
                rf"\b{a}\s*\.\s*([A-Za-z_]\w*)\b", _req, new_term,
                re.IGNORECASE)
        # bare refs that reach OUT of the subquery (q4-style
        # `l_orderkey = o_orderkey`): claim them for the jv projection;
        # inner-owned bare names stay inner by SQL scoping
        scan = re.sub(r"'[^']*'", " ", new_term)
        for bm in re.finditer(r"\b([A-Za-z_]\w*)\b(?!\s*[(.])", scan):
            c = bm.group(1).lower()
            pre = scan[:bm.start()].rstrip()
            if c in _SQL_KEYWORDS or pre.endswith("."):
                continue
            if c in icols or c == ia or c == it:
                continue
            if owner(c) is not None:
                needed.add(c)
        rewritten.append(new_term)

    if not needed:
        raise _UnloweredShape("no outer column references")
    jv = f"__{name}_jv"
    jv_items = sorted(needed)
    jv_sql = (f"SELECT "
              f"{', '.join(f'{owner(c)}.{c}' for c in jv_items)} "
              f"FROM {from_clause}")
    if plain:
        jv_sql += " WHERE " + " AND ".join(plain)
    src = f"__{name}_src"
    src_sql = (f"SELECT {', '.join(jv_items)} FROM {jv} {OA} "
               f"WHERE " + " AND ".join(rewritten))
    fsel, fkeys, fhaving = sel, keys_txt, having
    for a in alias_of:
        def deal(t: str, a=a) -> str:
            return _sub_outside_literals(rf"\b{a}\s*\.\s*", "", t,
                                         re.IGNORECASE)
        fsel, fkeys = deal(fsel), deal(fkeys)
        fhaving = deal(fhaving) if fhaving else fhaving
    final = f"SELECT {fsel} FROM {src} GROUP BY {fkeys}"
    if fhaving:
        final += f" HAVING {fhaving}"

    registered: list[str] = []
    try:
        for hname, hsql in in_views:
            _register_hidden(eng, hname, hsql, registered)
        _register_hidden(eng, jv, jv_sql, registered)
        _register_hidden(eng, src, src_sql, registered)
        fm = _lower_view(eng, name, final)
        if fm.kind == "differentiate":
            raise _UnloweredShape("final aggregate snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _global_agg_over_from(eng: "Engine", name: str, flat: str):
    """GROUP-BY-less aggregates over a JOIN chain — verbatim TPC-H q14
    (``SELECT 100.00 * SUM(CASE …)/SUM(…) FROM lineitem, part WHERE
    l_partkey = p_partkey AND …`` after comma normalization): synthesize
    a hidden maintained join view ``__{name}_src`` carrying exactly the
    columns the aggregate items and the residual WHERE reference (the
    predicate pushes INTO the hidden view, so its delta is already
    filtered), then run :class:`_GlobalAggMaintainer` on its O(Δ)
    output delta.  Column references must resolve to exactly one chain
    table; anything else raises :class:`_UnloweredShape`."""
    parts = _split_select_from(flat)
    if parts is None:
        raise _UnloweredShape(flat)
    sel, rest = parts
    from_clause, pred = _split_where(rest)
    chain = _parse_aliased_chain(from_clause)
    if chain is None or any(kw for _, _, kw in chain[1:]
                            if kw != "JOIN"):
        raise _UnloweredShape("not an inner join chain")
    if any(t not in eng.tables and t not in eng.views
           and t not in eng._maintainers for t, _, _ in chain):
        raise _UnloweredShape("unknown source in chain")
    alias_of = {a: t for t, a, _ in chain}
    cols_of = {a: {c.lower() for c in _source_rows0(eng, t).columns}
               for t, a, _ in chain}
    # columns the outer items/pred need (ON-clause refs stay inside the
    # hidden view's own text) — bare or alias-qualified, each resolving
    # to exactly one chain source; strict: this path owns the whole
    # select text, so an unknown bare token means an unlowerable item
    needed: set[str] = set()
    outer_sel = sel
    _claim_chain_cols(sel + " " + (pred or ""), cols_of, needed,
                      "global agg", strict_bare=True)
    if not needed:
        raise _UnloweredShape("no column references")
    # strip alias qualifiers from the outer text (names are unique)
    for a in alias_of:
        outer_sel = _sub_outside_literals(rf"\b{a}\s*\.\s*", "",
                                          outer_sel, re.IGNORECASE)
    hidden = f"__{name}_src"
    hsql = f"SELECT {', '.join(sorted(needed))} FROM {from_clause}"
    if pred:
        hsql += f" WHERE {pred}"
    registered: list[str] = []
    try:
        _register_hidden(eng, hidden, hsql, registered)
        return _GlobalAggMaintainer(eng, name,
                                    f"SELECT {outer_sel} FROM {hidden}",
                                    hidden)
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


_PLAIN_KEY_RE = re.compile(r"^\w+(?:\.\w+)?$")


def _agg_expr_keys(eng: "Engine", name: str, flat: str):
    """Grouped aggregates whose GROUP BY keys are EXPRESSIONS — the SQL
    tumbling-window idiom (``GROUP BY ut - ut % 3600``, ``GROUP BY
    floor(ts / 900) * 900``, date-part bucketing) that the reference's
    Calcite frontend accepts and our bare-column agg recognizers
    refuse.  Decomposition: a hidden O(Δ) projection view
    ``__{name}_ek`` materializes each expression key as a column
    (``__g_{i}``), with the WHERE pushed in (filter before shuffle),
    and the aggregate re-lowers over its output delta through the
    ordinary recognizers with ``__g_{i}`` as plain keys.  Every
    expression key must appear verbatim as an aliased select item
    (``expr AS alias`` — standard in the tumbling idiom), else this
    pass refuses and the view snapshot-diffs.

    The FROM may be a single table OR an inner-join chain (``GROUP BY
    extract(year from o_orderdate)`` over orders⋈lineitem — the classic
    date-bucket rollup): for a chain the hidden view carries the whole
    join (multilinear delta legs) and the key expressions ride its
    projection, so the stack stays O(Δ) end to end."""
    if re.search(r"\(\s*SELECT\b|\bOVER\b|\bDISTINCT\b", flat,
                 re.IGNORECASE):
        raise _UnloweredShape("subquery/window/distinct in expr-key agg")
    parts = _split_select_from(flat)
    if parts is None:
        raise _UnloweredShape("not a SELECT…FROM")
    sel, rest = parts
    gpos = _find_top_kw(rest, ("GROUP",))
    if gpos < 0 or not re.match(r"^GROUP\s+BY\s", rest[gpos:],
                                re.IGNORECASE):
        raise _UnloweredShape("no GROUP BY")
    head, grp = rest[:gpos].strip(), re.sub(r"^GROUP\s+BY\s+", "",
                                            rest[gpos:], count=1,
                                            flags=re.IGNORECASE)
    if _find_top_kw(grp, ("ORDER", "LIMIT")) >= 0:
        # grouped ORDER BY … LIMIT shapes belong to the top-k passes —
        # refuse explicitly instead of driving a doomed hidden-view
        # registration through Spark analysis
        raise _UnloweredShape("ORDER BY/LIMIT tail in expr-key agg")
    hpos = _find_top_kw(grp, ("HAVING",))
    keys_txt, having = ((grp, None) if hpos < 0
                        else (grp[:hpos], grp[hpos + 6:].strip()))
    from_clause, pred = _split_where(head)
    keys = [k.strip() for k in _split_top_level(keys_txt)]
    if all(_PLAIN_KEY_RE.match(k) for k in keys):
        raise _UnloweredShape("no expression keys")      # _AGG_RE's job
    chain = _parse_aliased_chain(from_clause)
    if chain is None:
        # single-table FROM (the chain parser wants ≥2 refs)
        tm = re.match(r"^(\w+)(?:\s+(?:AS\s+)?(\w+))?$",
                      from_clause.strip())
        if tm is None:
            raise _UnloweredShape("FROM is not a table or join chain")
        chain = [(tm.group(1).lower(),
                  (tm.group(2) or tm.group(1)).lower(), "")]
    if any(kw not in ("", "JOIN") for _, _, kw in chain):
        raise _UnloweredShape("non-inner join in expr-key chain")
    for t, _, _ in chain:
        if not (t in eng.tables or t in eng.views
                or t in eng._maintainers):
            raise _UnloweredShape(f"unknown source {t}")
    cols_of = {a: {c.lower() for c in _source_rows0(eng, t).columns}
               for t, a, _ in chain}
    aliases = list(cols_of)

    def norm(e: str) -> str:
        return re.sub(r"\s+", " ", e).strip().lower()

    def owner_unique(bare: str) -> bool:
        return sum(1 for a in cols_of if bare in cols_of[a]) == 1

    # map each key to its hidden column; plain column keys pass through
    key_col, gitems = {}, []
    for i, k in enumerate(keys):
        if _PLAIN_KEY_RE.match(k):
            bare = k.split(".")[-1].lower()
            if not owner_unique(bare):
                raise _UnloweredShape(f"unresolvable key column {k}")
            key_col[norm(k)] = bare
        else:
            key_col[norm(k)] = f"__g_{i}"
            gitems.append(f"{k} AS __g_{i}")
    # rewrite the select list: each expression key must appear as an
    # aliased item matching a key verbatim (whitespace/case-insensitive)
    out_items = []
    key_alias: dict[str, str] = {}      # norm(key expr) -> output alias
    for it in (i.strip() for i in _split_top_level(sel)):
        am = re.match(r"^(?P<expr>.+\S)\s+AS\s+(?P<al>\w+)$", it,
                      re.IGNORECASE | re.DOTALL)
        expr = am.group("expr") if am else it
        mapped = key_col.get(norm(expr))
        if mapped is not None and not _PLAIN_KEY_RE.match(expr):
            if am is None:
                raise _UnloweredShape(f"expression key needs AS: {it}")
            out_items.append(f"{mapped} AS {am.group('al')}")
            key_alias[norm(expr)] = am.group("al")
        else:
            out_items.append(it)
    # HAVING may reference a key expression — map it to the key's
    # OUTPUT alias (the agg maintainers evaluate HAVING over the
    # finalize frame, where the key carries its select-list name);
    # literal-aware: never rewrite inside a string literal
    if having:
        for k in keys:
            if not _PLAIN_KEY_RE.match(k):
                al = key_alias.get(norm(k))
                if al is None:
                    # key expr absent from the select list: leave the
                    # HAVING alone — the downstream agg matchers refuse
                    # (every GROUP BY key must be a select item) and
                    # the whole pass falls back
                    continue
                having = _sub_outside_literals(
                    rf"(?<!\w){re.escape(k)}(?!\w)", al, having)
    # the outer runs FROM the hidden view: strip every source alias's
    # qualifiers (claimed columns are verified unique across the chain
    # below); the aliases stay live inside the hidden view's own text
    # (key expressions, ON clauses, WHERE)
    for a in aliases:
        out_items = [_sub_outside_literals(rf"\b{a}\s*\.\s*", "",
                                           it, re.IGNORECASE)
                     for it in out_items]
        if having:
            having = _sub_outside_literals(rf"\b{a}\s*\.\s*", "",
                                           having, re.IGNORECASE)
    # hidden view: source columns the rewritten items/HAVING still
    # reference, plus the materialized keys (extras are harmless but
    # widen state — project only what is referenced); every claimed
    # column must live in exactly one chain table
    rest_txt = ", ".join(out_items) + " " + (having or "")
    all_cols = set().union(*cols_of.values()) if cols_of else set()
    needed = sorted(
        c for c in all_cols
        if re.search(rf"\b{c}\b", rest_txt, re.IGNORECASE))
    for c in needed:
        if not owner_unique(c):
            raise _UnloweredShape(f"ambiguous column {c} across chain")
    hidden = f"__{name}_ek"
    hsel = ", ".join(needed + gitems) if needed else ", ".join(gitems)
    hsql = f"SELECT {hsel} FROM {from_clause}"
    if pred:
        hsql += f" WHERE {pred}"
    outer = (f"SELECT {', '.join(out_items)} FROM {hidden} "
             f"GROUP BY {', '.join(key_col[norm(k)] for k in keys)}")
    if having:
        outer += f" HAVING {having}"
    registered: list[str] = []
    try:
        _register_hidden(eng, hidden, hsql, registered)
        fm = _lower_view(eng, name, outer)
        if fm.kind == "differentiate":
            raise _UnloweredShape("expr-key outer snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


#: SELECT … FROM <join chain> [WHERE p] GROUP BY keys [HAVING h]
_MJ_AGG_RE = re.compile(
    r"^SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<from>.+?)"
    r"(?:\s+WHERE\s+(?P<pred>.+?))?\s+GROUP\s+BY\s+(?P<keys>[\w\s,.]+?)"
    r"(?:\s+HAVING\s+(?P<having>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL)


def _parse_from_chain(from_clause: str, min_tables: int = 3) -> list[str] | None:
    """``t1 [a1] JOIN t2 [a2] ON c2 JOIN t3 [a3] ON c3 …`` → distinct
    table names (≥ *min_tables*), else None."""
    segs = re.split(r"\bJOIN\b", from_clause, flags=re.IGNORECASE)
    if len(segs) < min_tables:
        return None
    tables = []
    tm = _TBL_ALIAS_RE.match(segs[0].strip())
    if not tm:
        return None
    tables.append(tm.group(1).lower())
    for seg in segs[1:]:
        parts = re.split(r"\bON\b", seg, maxsplit=1, flags=re.IGNORECASE)
        if len(parts) != 2:
            return None
        tm = _TBL_ALIAS_RE.match(parts[0].strip())
        if not tm:
            return None
        tables.append(tm.group(1).lower())
    if len(tables) < min_tables or len(set(tables)) != len(tables):
        return None
    return tables


class _MultiJoinAggMaintainer(_GroupMergeMaintainer):
    """SELECT keys, SUM/COUNT/AVG … FROM t1 JOIN t2 ON … JOIN t3 ON …
    [WHERE p] GROUP BY keys [HAVING h] — the TPC-H star-aggregate shape
    (Q5-style fact⋈dim⋈dim → GROUP BY): multilinear join legs (one per
    changed table, old tables before it / new after, join.rs:226-264
    applied pairwise) each aggregated per group over the delta leg alone,
    merged into the stored group state by the
    :class:`_GroupMergeMaintainer` core.  Per tick cost ∝ Δ⋈dims plus the
    touched-group merge — the star is never re-joined."""

    kind = "multi_join_agg"

    def __init__(self, eng, name, sql, tables, m, spec):
        super().__init__(eng, name, sql)
        self.tables = tables
        self.keys = spec["merge_keys"]
        self.agg_names = spec["val_names"]
        self._out_spec = spec["out"]
        self._having = _rewrite_having(m.group("having"), spec,
                               absorb=True)
        where = f" WHERE {m.group('pred')}" if m.group("pred") else ""
        self._delta_sql = self._maybe_salt(eng, (
            f"SELECT {spec['delta_sel']}, COUNT(*) AS {self._CNT} "
            f"FROM {m.group('from')}{where} GROUP BY {m.group('keys')}"))
        first = eng.eval_on(self._delta_sql, {
            t: _source_rows0(eng, t) for t in tables})
        self._init_out(eng, name, first)
        _ = self._finalize(self._out.current.df).schema  # validate HAVING

    def _finalize(self, group_delta_df: DataFrame) -> DataFrame:
        # HAVING filters the group-PARTIAL frame (pre-projection), so
        # predicates over hidden absorbed aggregates resolve too
        if self._having:
            group_delta_df = group_delta_df.filter(F.expr(self._having))
        return _finalize_spec(group_delta_df, self._out_spec)

    def step(self, eng, combined, old):
        deltas = {t: combined.get(t) for t in self.tables}
        if all(z is None for z in deltas.values()):
            return self._empty()
        contribs = []
        for i, t in enumerate(self.tables):
            z = deltas[t]
            if z is None:
                continue
            bind = {}
            for j, u in enumerate(self.tables):
                if j < i:
                    bind[u] = old[u].rows()
                elif j > i:
                    bind[u] = _current_rows(eng, u)
            pos, neg = _split_parts(z)
            contribs.append((eng.eval_on(self._delta_sql,
                                         {**bind, t: pos}), 1))
            contribs.append((eng.eval_on(self._delta_sql,
                                         {**bind, t: neg}), -1))
        return self._merge(contribs)


#: one SELECT item of a DISTINCT-aggregate GROUP BY view
_DISTINCT_AGG_ITEM = re.compile(
    r"^(?:(?P<key>\w+)(?:\s+AS\s+(?P<kal>\w+))?"
    r"|COUNT\s*\(\s*DISTINCT\s+(?P<ce>.+?)\s*\)\s+AS\s+(?P<cn>\w+)"
    r"|SUM\s*\(\s*DISTINCT\s+(?P<se>.+?)\s*\)\s+AS\s+(?P<sn>\w+)"
    r"|AVG\s*\(\s*DISTINCT\s+(?P<ae>.+?)\s*\)\s+AS\s+(?P<an>\w+)"
    r"|COUNT\s*\(\s*\*\s*\)\s+AS\s+(?P<starn>\w+))$",
    re.IGNORECASE | re.DOTALL)

_DISTINCT_AGG_BLOCKERS = re.compile(
    r"\b(UNION|INTERSECT|EXCEPT|OVER|ORDER\s+BY|LIMIT|JOIN"
    r"|LEFT|RIGHT|FULL|OUTER|CROSS)\b|\(\s*SELECT"
    r"|^\s*SELECT\s+DISTINCT\b", re.IGNORECASE)


def _match_distinct_agg_items(sel: str, keys: list[str]) -> dict | None:
    """Recognize a SELECT list of bare group keys + COUNT/SUM(DISTINCT e)
    aggregates (all over the SAME expression e) + optional COUNT(*).
    Returns {expr, items, out} or None; multiple distinct expressions
    would need one distinct-state per expression — those keep the
    snapshot-diff fallback."""
    expr, items, out = None, [], []
    for it in (i.strip() for i in _split_top_level(sel)):
        m = _DISTINCT_AGG_ITEM.match(it)
        if not m:
            return None
        if m.group("key"):
            if m.group("key") not in keys:
                return None
            if m.group("kal"):
                # merge state stays keyed by the SOURCE name; the alias
                # applies in the finalize projection only (r7)
                out.append(("keyal", (m.group("key"), m.group("kal"))))
            else:
                out.append(("key", m.group("key")))
            continue
        if m.group("starn"):
            items.append(("cnt_star", m.group("starn")))
            out.append(("col", m.group("starn")))
            continue
        e = " ".join((m.group("ce") or m.group("se")
                      or m.group("ae")).split())
        if expr is None:
            expr = e
        elif expr != e:
            return None
        if m.group("cn"):
            items.append(("cntd", m.group("cn")))
            out.append(("cntd", m.group("cn")))
        elif m.group("sn"):
            items.append(("sumd", m.group("sn")))
            out.append(("sumd", m.group("sn")))
        else:
            items.append(("avgd", m.group("an")))
            out.append(("avgd", m.group("an")))
    if expr is None or any(not re.match(r"^\w+$", k) for k in keys):
        return None
    return {"expr": expr, "items": items, "out": out}


def _multi_distinct_split(eng: "Engine", name: str, flat: str, m,
                          keys: list[str]):
    """≥2 DIFFERENT distinct expressions in one grouped select —
    ``COUNT(DISTINCT a), COUNT(DISTINCT b) … GROUP BY k`` — split into
    one hidden single-expression distinct-agg view per expression
    (each carrying the group keys) and re-lower the view as their
    equi-join on the keys: every hidden view has exactly the same
    group-key set (same GROUP BY over the same rows), so the inner
    join is total and each maintains O(Δ) independently.  NULLABLE
    keys refuse (a NULL-keyed group would drop through the equi-join;
    the single-expression maintainer handles those shapes)."""
    tbl = m.group("tbl").lower()
    try:
        fields = {f.name.lower(): f
                  for f in _source_rows0(eng, tbl).schema.fields}
    except Exception:
        raise _UnloweredShape(f"unknown table {tbl}")
    for k in keys:
        if k.lower() not in fields or fields[k.lower()].nullable:
            raise _UnloweredShape(
                f"key {k} must be NOT NULL for the distinct split")
    groups: dict[str, list[str]] = {}    # expr -> item SQL texts
    out_items: list[tuple[str, str]] = []   # (hidden idx|key, out sql)
    key_out: list[str] = []
    for it in (i.strip() for i in _split_top_level(m.group("sel"))):
        dm = _DISTINCT_AGG_ITEM.match(it)
        if not dm:
            raise _UnloweredShape(f"unrecognized item: {it}")
        if dm.group("key"):
            key_out.append(it)
            continue
        if dm.group("starn"):
            groups.setdefault("__star__", []).append(it)
            out_items.append(("__star__", dm.group("starn")))
            continue
        e = " ".join((dm.group("ce") or dm.group("se")
                      or dm.group("ae")).split())
        groups.setdefault(e, []).append(it)
        out_items.append((e, dm.group("cn") or dm.group("sn")
                          or dm.group("an")))
    exprs = [e for e in groups if e != "__star__"]
    if len(exprs) < 2:
        raise _UnloweredShape("fewer than two distinct expressions")
    # COUNT(*) items ride with the first expression's hidden view
    if "__star__" in groups:
        groups[exprs[0]].extend(groups.pop("__star__"))
    hid_of: dict[str, str] = {}
    registered: list[str] = []
    pred = f" WHERE {m.group('pred')}" if m.group("pred") else ""
    if m.group("having"):
        raise _UnloweredShape("HAVING over the distinct split")
    try:
        for i, e in enumerate(exprs):
            hid = f"__{name}_d{i}"
            hsql = ("SELECT " + ", ".join(keys + groups[e])
                    + f" FROM {tbl}{pred} GROUP BY " + ", ".join(keys))
            _register_hidden(eng, hid, hsql, registered)
            hid_of[e] = hid
        h0 = hid_of[exprs[0]]
        # output: the SELECTED keys (with their aliases) read from the
        # first hidden, then each aggregate column from its own hidden
        sel_parts = []
        for it in key_out:
            dm = _DISTINCT_AGG_ITEM.match(it)
            sel_parts.append(f"{h0}.{dm.group('key')} AS "
                             f"{dm.group('kal') or dm.group('key')}")
        for e2, n in out_items:
            src = h0 if e2 == "__star__" else hid_of[e2]
            sel_parts.append(f"{src}.{n} AS {n}")
        chain = h0
        for e in exprs[1:]:
            h = hid_of[e]
            on = " AND ".join(f"{h0}.{k} = {h}.{k}" for k in keys)
            chain += f" JOIN {h} ON {on}"
        outer = f"SELECT {', '.join(sel_parts)} FROM {chain}"
        fm = _lower_view(eng, name, outer)
        if fm.kind == "differentiate":
            raise _UnloweredShape("distinct-split join snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


class _DistinctAggMaintainer(_GroupMergeMaintainer):
    """SELECT keys, COUNT(DISTINCT e)/SUM(DISTINCT e) [, COUNT(*)] FROM t
    [WHERE p] GROUP BY keys [HAVING …] — the reference's DISTINCT
    aggregates (sql-to-dbsp lowers them to a distinct stage feeding the
    aggregation; distinct.rs:64 + aggregate/mod.rs:253).

    Pipeline per tick: the delta projected to (keys, e) (NULLs dropped —
    SQL DISTINCT aggregates ignore them) flows through a
    :class:`DistinctOp`, whose set-delta is linear — grouped partials
    over it (±1-weighted count / Σe) merge exactly like SUM/COUNT
    partials.  Plain COUNT(*) items and the hidden liveness count come
    from the raw delta; both contribution kinds pad each other's columns
    with 0 and share one :class:`_GroupMergeMaintainer` merge.  Cost per
    tick ∝ Δ plus the distinct-state rows of touched (keys, e) groups."""

    kind = "distinct_agg"

    def __init__(self, eng, name, sql, table, keys, spec):
        from database_stream_processor_spark.plans.incremental import (
            DistinctOp)
        super().__init__(eng, name, sql)
        self.table = table
        self.keys = keys
        self._items = spec["items"]
        self._out_spec2 = spec["out"]
        self._dist_vals = ["__dcnt"] + [f"__ds_{n}"
                                        for k, n in spec["items"]
                                        if k in ("sumd", "avgd")]
        self._raw_vals = [n for k, n in spec["items"] if k == "cnt_star"]
        self.agg_names = self._dist_vals + self._raw_vals
        m = _AGG_RE.match(sql)
        alias_map = [(f"COUNT(DISTINCT {spec['expr']})", n)
                     for k, n in spec["items"] if k == "cntd"]
        alias_map += [(f"SUM(DISTINCT {spec['expr']})", n)
                      for k, n in spec["items"] if k == "sumd"]
        alias_map += [(f"AVG(DISTINCT {spec['expr']})", n)
                      for k, n in spec["items"] if k == "avgd"]
        alias_map += [("COUNT(*)", n) for k, n in spec["items"]
                      if k == "cnt_star"]
        self._having = _rewrite_having(m.group("having"),
                                       {"alias_map": alias_map})
        where = f" WHERE {m.group('pred')}" if m.group("pred") else ""
        stars = "".join(f"COUNT(*) AS {n}, " for n in self._raw_vals)
        self._raw_sql = (
            f"SELECT {', '.join(keys)}, {stars}COUNT(*) AS {self._CNT} "
            f"FROM {table}{where} GROUP BY {m.group('keys')}")
        nn = f"({spec['expr']}) IS NOT NULL"
        pw = (f" WHERE ({m.group('pred')}) AND {nn}" if m.group("pred")
              else f" WHERE {nn}")
        self._proj_sql = (f"SELECT {', '.join(keys)}, "
                          f"{spec['expr']} AS __v FROM {table}{pw}")
        probe = eng.eval_on(self._proj_sql,
                            {table: _source_rows0(eng, table)})
        self._dop = DistinctOp(ZSetFrame.from_df(
            eng.spark.createDataFrame([], probe.schema)))
        #: Σe partials carry SUM's widened type (int→long, decimal grows)
        #: so the group state schema is stable from the first tick
        from database_stream_processor_spark.zset import WEIGHT_COL
        self._vtype = (ZSetFrame.from_df(probe, 1).df
                       .groupBy(*keys)
                       .agg(F.sum(F.col("__v") * F.col(WEIGHT_COL))
                            .alias("__s"))
                       .schema["__s"].dataType.simpleString())
        first = eng.eval_on(self._raw_sql,
                            {table: _source_rows0(eng, table)})
        zero = [F.lit(0).cast(self._val_type(v)).alias(v)
                for v in self._dist_vals]
        self._init_out(eng, name, first.select(*keys, *zero,
                                               *self._raw_vals, self._CNT))
        _ = self._finalize(self._out.current.df).schema  # validate HAVING

    def _val_type(self, v: str) -> str:
        return "long" if v == "__dcnt" else self._vtype

    def _finalize(self, group_delta_df: DataFrame) -> DataFrame:
        from database_stream_processor_spark.zset import WEIGHT_COL
        cols = []
        for kind, n in self._out_spec2:
            if kind == "keyal":
                cols.append(F.col(n[0]).alias(n[1]))
            elif kind == "key" or kind == "col":
                cols.append(F.col(n))
            elif kind == "cntd":
                cols.append(F.col("__dcnt").alias(n))
            elif kind == "sumd":  # SQL SUM of no non-null values is NULL
                cols.append(F.when(F.col("__dcnt") != 0,
                                   F.col(f"__ds_{n}")).alias(n))
            else:  # avgd = Σdistinct / #distinct, NULL on empty
                dc = F.col("__dcnt")
                cols.append(F.when(dc != 0,
                                   F.col(f"__ds_{n}") / dc).alias(n))
        out = group_delta_df.select(*cols, F.col(WEIGHT_COL))
        return out.filter(F.expr(self._having)) if self._having else out

    def _pad(self, df: DataFrame, have: list[str]) -> DataFrame:
        missing = [v for v in [*self.agg_names, self._CNT]
                   if v not in have]
        return df.select(*self.keys, *have,
                         *[F.lit(0).cast("long" if v == self._CNT
                                         else self._val_type(v)).alias(v)
                           for v in missing])

    def step(self, eng, combined, old):
        from database_stream_processor_spark.zset import WEIGHT_COL
        z = combined.get(self.table)
        if z is None:
            return self._empty()
        pos, neg = _split_parts(z)
        raw_have = [*self._raw_vals, self._CNT]
        raw_p = self._pad(eng.eval_on(self._raw_sql, {self.table: pos}),
                          raw_have)
        raw_n = self._pad(eng.eval_on(self._raw_sql, {self.table: neg}),
                          raw_have)
        dz = (ZSetFrame.from_df(
            eng.eval_on(self._proj_sql, {self.table: pos}), 1)
            .plus(ZSetFrame.from_df(
                eng.eval_on(self._proj_sql, {self.table: neg}), -1))
            .consolidate())
        sd = self._dop.step(dz)  # set-delta of (keys, __v), weights ±1
        w = F.col(WEIGHT_COL)
        aggs = [F.sum(w).alias("__dcnt")]
        aggs += [F.sum(F.col("__v") * w).alias(f"__ds_{n}")
                 for k, n in self._items if k in ("sumd", "avgd")]
        dd = self._pad(sd.df.groupBy(*self.keys).agg(*aggs),
                       self._dist_vals)
        # distinct contributions carry their sign in the weights already
        return self._merge([(raw_p, 1), (raw_n, -1), (dd, 1)])


class _GlobalAggMaintainer(_ViewMaintainer):
    """``SELECT SUM/COUNT/AVG(...) FROM t [WHERE p]`` (no GROUP BY) —
    the single global group, maintained as running (sum, non-null count)
    partials merged with each tick's per-delta partial aggregate.  SQL's
    empty-group semantics are preserved exactly: the view always holds
    ONE row once the table has been touched, with COUNT = 0 and
    SUM/AVG = NULL when everything retracts — the case the keyed Z-set
    maintainers express as group absence (which is why the generic
    lowering used to refuse this shape and snapshot-diff it)."""

    kind = "global_agg"

    def __init__(self, eng, name, sql, table):
        m = _GLOBAL_AGG_RE.match(sql)
        # every select item must be SUM(e)/COUNT(*)/AVG(e) AS name
        partials, self._out_spec = [], []
        for it in (i.strip() for i in _split_top_level(m.group("sel"))):
            im = _AGG_ITEM.match(it)
            if not im or im.group("key"):
                # expression over aggregates — q14's global ratio
                am = re.match(r"^(?P<expr>.+\S)\s+AS\s+(?P<al>\w+)$",
                              it, re.IGNORECASE | re.DOTALL)
                fin = (_absorb_item_aggs(
                           am.group("expr"),
                           f"__gx{len(self._out_spec)}_",
                           partials, [])
                       if am else None)
                if fin is None:
                    raise _UnloweredShape(it)  # shape gate; fallback
                self._out_spec.append(("expr", (am.group("al"), fin)))
                continue
            if im.group("sname"):
                nm, e = im.group("sname"), im.group("sum")
                partials += [f"SUM({e}) AS __s_{nm}",
                             f"COUNT({e}) AS __c_{nm}"]
                self._out_spec.append(("sum", nm))
            elif im.group("cname"):
                nm = im.group("cname")
                partials.append(f"COUNT(*) AS __n_{nm}")
                self._out_spec.append(("cnt", nm))
            else:
                nm, e = im.group("aname"), im.group("avg")
                partials += [f"SUM({e}) AS __s_{nm}",
                             f"COUNT({e}) AS __c_{nm}"]
                self._out_spec.append(("avg", nm))
        super().__init__(eng, name, sql)
        self.table = table
        where = f" WHERE {m.group('pred')}" if m.group("pred") else ""
        self._delta_sql = (f"SELECT {', '.join(partials)} "
                           f"FROM {table}{where}")
        zero = eng.eval_on(self._delta_sql,
                           {table: _source_rows0(eng, table)})
        self._pcols = zero.columns
        # running partials: exactly one row, all sums coalesced to 0
        self._partials = self._zeroed(zero).localCheckpoint(eager=True)
        self._emitted = False
        _ = self._finalize_row(self._partials).schema  # eager validation

    def _zeroed(self, df: DataFrame) -> DataFrame:
        return df.select(*[F.coalesce(F.col(c), F.lit(0)).alias(c)
                           for c in self._pcols])

    def _finalize_row(self, partials: DataFrame) -> DataFrame:
        cols = []
        for kind, nm in self._out_spec:
            if kind == "cnt":
                cols.append(F.col(f"__n_{nm}").alias(nm))
            elif kind == "expr":
                cols.append(F.expr(nm[1]).alias(nm[0]))
            else:
                c, s = F.col(f"__c_{nm}"), F.col(f"__s_{nm}")
                v = s / c if kind == "avg" else s
                cols.append(F.when(c != 0, v).alias(nm))
        return partials.select(*cols)

    def step(self, eng, combined, old):
        z = combined.get(self.table)
        if z is None:
            return self._empty()
        pos, neg = _split_parts(z)
        p = self._zeroed(eng.eval_on(self._delta_sql, {self.table: pos}))
        n = self._zeroed(eng.eval_on(self._delta_sql, {self.table: neg}))
        u = (self._partials
             .unionByName(p)
             .unionByName(n.select(*[(-F.col(c)).alias(c)
                                     for c in self._pcols])))
        new_partials = (u.agg(*[F.sum(c).alias(c) for c in self._pcols])
                        .localCheckpoint(eager=True))
        delta = ZSetFrame.from_df(self._finalize_row(new_partials), 1)
        if self._emitted:
            delta = delta.plus(ZSetFrame.from_df(
                self._finalize_row(self._partials), -1))
        self._partials = new_partials
        self._emitted = True
        delta = delta.consolidate()
        self.apply_delta(delta)
        return delta


class _NonLinearAggMaintainer(_ViewMaintainer):
    """SELECT keys, MIN/MAX/AVG (+ SUM/COUNT) aggregates FROM t [WHERE p]
    GROUP BY keys — non-linear aggregates can't be maintained by delta
    sums, so this lowers onto :class:`AggregateOp`
    (aggregate/mod.rs:204-244): the table delta integrates, and per tick
    only the groups *touched by the delta* are re-aggregated from the
    integrated input — retraction-correct MIN/MAX without rescanning
    untouched groups, per-tick cost ∝ touched-group data."""

    kind = "nonlinear_agg"

    def __init__(self, eng, name, sql, table, keys):
        super().__init__(eng, name, sql)
        self.table = table
        self.keys = [k.strip().split(".")[-1] for k in keys]
        m = _AGG_RE.match(sql)
        pred, having = m.group("pred"), m.group("having")
        # select items → Column expressions (no temp-view rebinding in the
        # recompute closure: a plan captured over a replaced temp view can
        # carry stale attribute ids)
        exprs, self._key_renames = [], []
        for it in (i.strip() for i in _split_top_level(m.group("sel"))):
            im = _NONLIN_ITEM.match(it)
            if im.group("name"):
                exprs.append(F.expr(im.group("agg")).alias(im.group("name")))
            elif im.group("kal"):
                # `k AS g` key: the touched-group recompute stays keyed
                # by the SOURCE name (AggregateOp's touched-set semi-join
                # and output state both use it); rename only on emission
                self._key_renames.append(
                    (im.group("key").split(".")[-1], im.group("kal")))
        # the op integrates its own input from deltas, so an upstream
        # maintained VIEW works exactly like a base table: its per-tick
        # output delta is this op's input delta
        src_df = (eng.tables[table].current.df if table in eng.tables
                  else eng._maintainers[table].state.current.df)
        empty_in = ZSetFrame(src_df.limit(0))

        def agg_fn(z: ZSetFrame) -> ZSetFrame:
            rows = z.rows()
            if pred:
                rows = rows.filter(F.expr(pred))
            out = rows.groupBy(*self.keys).agg(*exprs)
            if having:
                # a recomputed group failing HAVING is simply absent from
                # the new output — the touched-group diff retracts it
                out = out.filter(F.expr(having))
            return ZSetFrame.from_df(out, 1)

        self._op = AggregateOp(empty_in, self.keys, agg_fn)
        _ = self._emit(agg_fn(empty_in)).df.schema  # validate eagerly

    def _emit(self, delta: ZSetFrame) -> ZSetFrame:
        df = delta.df
        for src, out in self._key_renames:
            df = df.withColumnRenamed(src, out)
        return ZSetFrame(df)

    def step(self, eng, combined, old):
        z = combined.get(self.table)
        if z is None:
            return self._empty()
        delta = self._emit(self._op.step(z.consolidate()))
        self.apply_delta(delta)
        return delta


#: select item for the non-linear maintainer: a grouping key (optionally
#: aliased) or any SUM/MIN/MAX/AVG/COUNT(expr) AS name (COUNT(*) included)
_NONLIN_ITEM = re.compile(
    r"^(?:(?P<key>\w+(?:\.\w+)?)(?:\s+AS\s+(?P<kal>\w+))?"
    r"|(?P<agg>(?:SUM|MIN|MAX|AVG|COUNT)\s*\((?:[^()]|\([^()]*\))*\))"
    r"\s+AS\s+(?P<name>\w+))$",
    re.IGNORECASE)


def _match_nonlinear_items(sel: str, keys: list[str]) -> bool:
    saw_agg, seen_keys = False, set()
    for it in (i.strip() for i in _split_top_level(sel)):
        im = _NONLIN_ITEM.match(it)
        if not im:
            return False
        if im.group("key"):
            if im.group("key") not in keys:
                return False
            seen_keys.add(im.group("key"))
        if im.group("name"):
            saw_agg = True
    # Every GROUP BY key must appear in the select: the recompute groups
    # by ALL keys and emits them, so a missing key (SELECT a, SUM(x) …
    # GROUP BY a, b) would make the delta schema diverge from the view
    # schema (ADVICE r6 #2 — same rule as the linear path).  Compared
    # as SETS: a repeated select item (SELECT a, a, SUM(x) … GROUP BY
    # a, b) must not count as covering b (ADVICE r7 #3).
    return saw_agg and seen_keys == set(keys)


def _finalize_spec(df: DataFrame, out_spec: list[tuple[str, str]]) -> DataFrame:
    """Project stored group partials to the view's output columns (keeping
    the weight column): avg = s/c, NULL when its non-null count is 0 —
    exactly SQL AVG over an all-NULL or empty group; expr items evaluate
    their rewritten finalize expression over the merged partials."""
    from database_stream_processor_spark.zset import WEIGHT_COL
    cols = []
    for kind, n in out_spec:
        if kind == "avg":
            c = F.col(f"__avg_{n}_c")
            cols.append(F.when(c != 0, F.col(f"__avg_{n}_s") / c).alias(n))
        elif kind == "sum":
            cols.append(F.when(F.col(f"__nn_{n}") != 0,
                               F.col(n)).alias(n))
        elif kind == "expr":
            cols.append(F.expr(n[1]).alias(n[0]))
        else:
            cols.append(F.col(n))
    return df.select(*cols, F.col(WEIGHT_COL))


def _absorb_item_aggs(expr_text: str, prefix: str, delta_items: list,
                      val_names: list) -> str | None:
    """EXPRESSIONS OF AGGREGATES in a select item — TPC-H q14's
    ``100.00 * SUM(CASE …) / SUM(…) AS promo_revenue`` — absorbed the
    same way HAVING-only aggregates are: every linear aggregate call
    (SUM/COUNT/AVG, the reference's linear semigroups) becomes a hidden
    merged partial, and the item rewrites to a finalize expression over
    them (SUM of an all-NULL/empty group is NULL, AVG = s/c).  Returns
    the rewritten expression, or None (caller falls back) when the item
    contains no aggregate at all or references a bare column outside
    every aggregate call — a non-aggregated column cannot survive the
    group merge."""
    hidden: dict = {}
    extra_delta: list[str] = []
    extra_vals: list[str] = []

    def sub(mm: re.Match) -> str:
        fn = mm.group("fn").upper()
        arg = mm.group("arg").strip()
        key = (fn, re.sub(r"\s+", "", arg).lower())
        if key in hidden:
            return hidden[key]
        i = len(hidden)
        if fn == "COUNT":
            extra_delta.append(f"COUNT({arg}) AS {prefix}{i}")
            extra_vals.append(f"{prefix}{i}")
            rep = f"{prefix}{i}"
        else:
            extra_delta.append(f"SUM({arg}) AS {prefix}{i}_s")
            extra_delta.append(f"COUNT({arg}) AS {prefix}{i}_c")
            extra_vals.extend([f"{prefix}{i}_s", f"{prefix}{i}_c"])
            body = (f"{prefix}{i}_s / {prefix}{i}_c" if fn == "AVG"
                    else f"{prefix}{i}_s")
            rep = f"(CASE WHEN {prefix}{i}_c = 0 THEN NULL ELSE {body} END)"
        hidden[key] = rep
        return rep

    # mask string literals with paren/quote-free placeholders so an
    # aggregate call whose argument CONTAINS a literal (q14's CASE …
    # LIKE 'PROMO%') still matches as one balanced span
    lits: list[str] = []

    def _mask(mm: re.Match) -> str:
        lits.append(mm.group(0))
        return f" __litx{len(lits) - 1}__ "

    masked = re.sub(r"'(?:[^']*)'", _mask, expr_text)
    res = _HAVING_AGG.sub(sub, masked)
    if not hidden:
        return None
    for tok in re.findall(r"\b[A-Za-z_]\w*\b", res):
        if (tok.lower() not in _SQL_KEYWORDS
                and not tok.startswith(prefix)
                and not re.fullmatch(r"__litx\d+__", tok)):
            return None

    def _unmask(txt: str) -> str:
        for i, lit in enumerate(lits):
            txt = txt.replace(f" __litx{i}__ ", lit) \
                     .replace(f"__litx{i}__", lit)
        return txt

    delta_items.extend(_unmask(d) for d in extra_delta)
    val_names.extend(extra_vals)
    return _unmask(res)


def _match_agg_items(sel: str, keys: list[str],
                     allow_key_only: bool = False) -> dict | None:
    """If every select item is a grouping key or SUM(e)/COUNT(*)/AVG(e)
    AS name, return the linear-lowering spec:

    - ``delta_sel``: select list for the per-delta partial aggregate —
      AVG(e) is decomposed into SUM(e)/COUNT(e) partials (both linear;
      AVG itself is not, but its components are — the reference's Avg
      (sum, count) semigroup, aggregate/average.rs:26-65);
    - ``val_names``: the partial columns the group merge sums;
    - ``out``: (kind, name) output spec in original select order, kind ∈
      {key, col, avg} — drives the finalize projection (avg = s/c).
    """
    delta_items, val_names, out, alias_map = [], [], [], []
    merge_keys, aliased_keys = [], False
    for it in (i.strip() for i in _split_top_level(sel)):
        im = _AGG_ITEM.match(it)
        if not im:
            # expression over aggregates (q14 ratio-of-sums): absorb
            # each call as a hidden partial, finalize the expression
            am = re.match(r"^(?P<expr>.+\S)\s+AS\s+(?P<al>\w+)$", it,
                          re.IGNORECASE | re.DOTALL)
            if not am:
                return None
            fin = _absorb_item_aggs(am.group("expr"),
                                    f"__sx{len(out)}_",
                                    delta_items, val_names)
            if fin is None:
                return None
            out.append(("expr", (am.group("al"), fin)))
            alias_map.append((am.group("expr"), fin))
            continue
        if im.group("key"):
            if im.group("key") not in keys:
                return None
            # `k AS alias` keys: the delta partial emits the alias, so
            # group state and merge join on the OUTPUT name (merge_keys)
            kname = (im.group("kal")
                     or im.group("key").split(".")[-1])
            aliased_keys = aliased_keys or im.group("kal") is not None
            delta_items.append(it)
            out.append(("key", kname))
            merge_keys.append(kname)
        elif im.group("sname") or im.group("cname"):
            n = im.group("sname") or im.group("cname")
            delta_items.append(it)
            val_names.append(n)
            if im.group("sname"):
                # SUM of an all-NULL (or fully-retracted) group is NULL
                # in SQL, but additive merge partials coalesce to 0 —
                # carry the non-null count and gate the finalize on it
                # (the AVG (sum, count) discipline, r7)
                delta_items.append(f"COUNT({im.group('sum')}) "
                                   f"AS __nn_{n}")
                val_names.append(f"__nn_{n}")
                out.append(("sum", n))
            else:
                out.append(("col", n))
            alias_map.append((f"SUM({im.group('sum')})" if im.group("sname")
                              else "COUNT(*)", n))
        else:
            n, e = im.group("aname"), im.group("avg")
            delta_items.append(f"SUM({e}) AS __avg_{n}_s")
            delta_items.append(f"COUNT({e}) AS __avg_{n}_c")
            val_names += [f"__avg_{n}_s", f"__avg_{n}_c"]
            out.append(("avg", n))
            alias_map.append((f"AVG({e})", n))
    if not val_names and not allow_key_only:
        # key-only selects are allowed ONLY when the caller knows a
        # HAVING will absorb hidden aggregate partials (TPC-H q18's
        # inner `SELECT l_orderkey … GROUP BY l_orderkey HAVING
        # SUM(l_quantity) > 300`): the liveness count plus the absorbed
        # __hv partials make the group state maintainable
        return None
    # Every GROUP BY key must surface as exactly one select item: the
    # delta partial SELECTs only the select list, so a key missing from
    # it (legal SQL: SELECT a, SUM(x) … GROUP BY a, b) would vanish from
    # the merge frame and _GroupMergeMaintainer._merge would collapse
    # distinct (a, b) groups into one row per a.  Fall back instead
    # (ADVICE r6 #2).
    if len(merge_keys) != len(keys) or len(set(merge_keys)) != len(merge_keys):
        return None
    return {"delta_sel": ", ".join(delta_items), "val_names": val_names,
            "out": out, "alias_map": alias_map,
            "merge_keys": merge_keys,
            "aliased_keys": aliased_keys}


_HAVING_AGG = re.compile(
    rf"\b(?P<fn>SUM|COUNT|AVG)\s*\(\s*(?P<arg>\*|{_NEST2})\s*\)",
    re.IGNORECASE)


def _rewrite_having(having: str | None, spec: dict,
                    absorb: bool = False) -> str | None:
    """Replace aggregate expressions in a HAVING predicate with their
    output aliases (SQL lets HAVING repeat the aggregate; the finalize
    frame only carries the named outputs).  Whitespace-insensitive text
    match; anything left unresolved fails the eager finalize probe and
    the view falls back to snapshot-diff.

    With ``absorb=True`` (the linear group maintainers, which filter the
    GROUP-PARTIAL frame before the finalize projection): aggregates that
    appear ONLY in HAVING (``HAVING COUNT(*) > 2`` without a count in
    the select list) are absorbed as hidden linear partials — the spec's
    ``delta_sel``/``val_names`` gain ``__hv{i}`` columns and the
    predicate rewrites to finalize expressions over them; AVG aliases
    rewrite to their (sum, count) CASE form since the pre-projection
    frame carries partials, not the finalized column.

    Substitution never reaches inside single-quoted string literals — a
    predicate like ``k <> 'COUNT(*)'`` must keep its literal intact (the
    rewritten form would still analyze cleanly, so the finalize probe
    could not catch the silent change).
    """
    if not having:
        return having

    def avg_case(s: str, c: str) -> str:
        return f"(CASE WHEN {c} = 0 THEN NULL ELSE {s} / {c} END)"

    # split into alternating [code, 'literal', code, ...] segments; SQL
    # escapes a quote inside a literal by doubling it, which this pattern
    # treats as two adjacent literals — safe, since neither is rewritten
    segments = re.split(r"('(?:[^']*)')", having)
    for expr_text, name in spec["alias_map"]:
        pat = r"\s*".join(re.escape(c) for c in re.sub(r"\s+", "", expr_text))
        if absorb and expr_text.upper().startswith("AVG"):
            # pre-projection frame carries (sum, count) partials only
            name = avg_case(f"__avg_{name}_s", f"__avg_{name}_c")
        segments = [seg if seg.startswith("'")
                    else re.sub(pat, name, seg, flags=re.IGNORECASE)
                    for seg in segments]
    if absorb:
        # finalized-avg ALIASES referenced by name rewrite the same way
        for kind, n in spec["out"]:
            if kind == "avg":
                case = avg_case(f"__avg_{n}_s", f"__avg_{n}_c")
                segments = [seg if seg.startswith("'")
                            else re.sub(rf"\b{re.escape(n)}\b", case, seg)
                            for seg in segments]

        # aggregates with no select-list alias become hidden partials
        extra_delta, hidden = [], {}

        def _absorb(mm: re.Match) -> str:
            fn = mm.group("fn").upper()
            arg = mm.group("arg").strip()
            key = (fn, re.sub(r"\s+", "", arg).lower())
            if key in hidden:
                return hidden[key]
            i = len(hidden)
            if fn == "COUNT":
                extra_delta.append(
                    f"COUNT({arg}) AS __hv{i}" if arg != "*"
                    else f"COUNT(*) AS __hv{i}")
                spec["val_names"].append(f"__hv{i}")
                rep = f"__hv{i}"
            else:                       # SUM / AVG need (sum, count)
                extra_delta.append(f"SUM({arg}) AS __hv{i}_s")
                extra_delta.append(f"COUNT({arg}) AS __hv{i}_c")
                spec["val_names"] += [f"__hv{i}_s", f"__hv{i}_c"]
                rep = (avg_case(f"__hv{i}_s", f"__hv{i}_c")
                       if fn == "AVG" else
                       f"(CASE WHEN __hv{i}_c = 0 THEN NULL "
                       f"ELSE __hv{i}_s END)")
            hidden[key] = rep
            return rep

        segments = [seg if seg.startswith("'")
                    else _HAVING_AGG.sub(_absorb, seg)
                    for seg in segments]
        if extra_delta:
            spec["delta_sel"] += ", " + ", ".join(extra_delta)
    return "".join(segments)


_LOG = logging.getLogger("database_stream_processor_spark.sql")


def _shape_over_join_lift(eng: "Engine", name: str, flat: str):
    """Catch-all composition for shapes the join-aware recognizers
    don't cover directly — ``MIN/MAX GROUP BY`` over a join chain,
    ``GROUP BY ROLLUP`` over a join, ``SELECT DISTINCT`` over a join,
    multi-item ``COUNT(DISTINCT)`` over a join: synthesize the hidden
    maintained join view ``__{name}_src`` carrying exactly the claimed
    columns (the `_scalar_sq_join_src` claims discipline, WHERE pushed
    in), strip the chain qualifiers, and re-lower the rest of the text
    over the hidden view's O(Δ) delta.  Tried LAST — anything a direct
    recognizer lowers never reaches here — and both stages must lower
    or the view falls back."""
    parts = _split_select_from(flat)
    if parts is None:
        raise _UnloweredShape("not a SELECT…FROM")
    sel, rest = parts
    g = _find_top_kw(rest, ("GROUP", "HAVING", "ORDER", "LIMIT"))
    head = rest if g < 0 else rest[:g]
    tail = "" if g < 0 else rest[g:]
    if re.search(r"\(\s*SELECT", tail, re.IGNORECASE):
        raise _UnloweredShape("subquery in the tail")
    body, pred = _split_where(head)
    if not re.search(r"\bJOIN\b", body, re.IGNORECASE):
        raise _UnloweredShape("FROM is not a join chain")
    registered: list[str] = []

    def _register(hname: str, hsql: str) -> None:
        _register_hidden(eng, hname, hsql, registered)

    try:
        hidden, _oa, sel2, pred2, (tail2,) = _scalar_sq_join_src(
            eng, name, body, sel, pred, _register, extras=[tail])
        strip = lambda t: _sub_outside_literals(r"\bo0\s*\.\s*", "", t,
                                                re.IGNORECASE)
        outer = f"SELECT {strip(sel2)} FROM {hidden}"
        if pred2:
            outer += f" WHERE {strip(pred2)}"
        if tail2:
            outer += f" {strip(tail2)}"
        fm = _lower_view(eng, name, outer)
        if fm.kind == "differentiate":
            raise _UnloweredShape("shape over the join view "
                                  "snapshot-diffs")
        return fm
    except Exception:
        _cleanup_hidden(eng, registered)
        raise


def _lower_view(eng: "Engine", name: str, sql: str) -> _ViewMaintainer:
    """Pick the cheapest maintainer whose shape matches; fall back to
    snapshot-diff for anything unrecognized (correct but O(view) per
    tick — a WARNING names the view and every recognizer that was tried,
    so a typo'd view shape can't silently downgrade)."""
    flat = _ncf_flatten(sql)
    # Lexical gate (ADVICE r8 #2): text the shared scanner refuses —
    # double-quoted identifiers/strings, a `--` outside literals (the
    # statement splitter strips comments, so one here is inside a
    # truncated literal), unterminated quotes, unbalanced parens —
    # never reaches a recognizer: every splitting helper would be
    # guessing.  Snapshot-diff evaluates the ORIGINAL text in Spark, so
    # the refusal is always correct, never a silent misread.
    if _top_mask(flat) is None:
        _LOG.warning(
            "view %s: lexical scan refused (double quotes, comment "
            "marker, or unbalanced quoting) — maintaining by "
            "snapshot-diff", name)
        return _ViewMaintainer(eng, name, sql)
    # A top-level trailing ORDER BY with no LIMIT is semantically void
    # for a maintained view (Z-set outputs are unordered relations —
    # the reference's Calcite frontend likewise treats a subquery/view
    # ORDER BY as advisory): strip it so verbatim TPC-H text (q1/q5/…
    # end with ORDER BY) reaches the agg/join recognizers.
    op = _find_top_kw(flat, ("ORDER",))
    if op >= 0 and not re.search(r"\bLIMIT\s+\d+", flat[op:],
                                 re.IGNORECASE):
        tail_txt = flat[op:]
        if re.match(r"^ORDER\s+BY\s", tail_txt, re.IGNORECASE) \
                and _find_top_kw(tail_txt[8:], _NCF_STOPS) < 0:
            flat = flat[:op].strip()
    # WITH-clause CTEs: hoist each into a hidden maintained view and
    # re-lower the main SELECT over them (no other recognizer matches a
    # WITH-prefixed text, so a refusal goes straight to snapshot-diff)
    if re.match(r"^WITH\b", flat, re.IGNORECASE):
        attempts: list[str] = []
        ctor = (_recursive_cte_lift
                if re.match(r"^WITH\s+RECURSIVE\b", flat, re.IGNORECASE)
                else _cte_lift)
        try:
            return ctor(eng, name, flat)
        except _UnloweredShape as e:
            attempts.append(f"{ctor.__name__}(unlowered shape: {e})")
        except Exception as e:  # shape gate: correctness first
            attempts.append(f"{ctor.__name__}({type(e).__name__}: {e})")
        _LOG.warning(
            "view %s: no incremental lowering matched — maintaining by "
            "snapshot-diff (full recompute per tick); recognizers "
            "tried: %s", name, "; ".join(attempts))
        return _ViewMaintainer(eng, name, sql)
    # A table appearing TWICE in one join chain (TPC-H q7's `nation n1,
    # nation n2` after comma normalization) cannot bind two different
    # leg states under one temp-view name in the multilinear delta
    # evaluation — clone each later occurrence through a hidden O(Δ)
    # projection view and rewrite the chain to distinct source names.
    _fs0 = _split_select_from(flat)
    if (_fs0 is not None
            and re.search(r"\bJOIN\b", _fs0[1], re.IGNORECASE)):
        _stop0 = _find_top_kw(_fs0[1], _NCF_STOPS)
        _fc0 = (_fs0[1] if _stop0 < 0 else _fs0[1][:_stop0]).strip()
        _chain0 = _parse_aliased_chain(_fc0, unique_tables=False)
        if (_chain0 is not None
                and len({t for t, _, _ in _chain0}) < len(_chain0)):
            seen: set[str] = set()
            k = 0
            for t, a, _kw in _chain0:
                if t not in seen:
                    seen.add(t)
                    continue
                if a == t or not (t in eng.tables or t in eng.views
                                  or t in eng._maintainers):
                    continue        # unaliased/unknown repeat: fallback
                dup = f"__{name}_dup{k}"
                k += 1
                if dup not in eng._maintainers:
                    cols = ", ".join(_source_rows0(eng, t).columns)
                    dm = _lower_view(eng, dup, f"SELECT {cols} FROM {t}")
                    eng._maintainers[dup] = dm
                    eng._sources[dup] = {t}
                    dm.state.current.rows() \
                        .createOrReplaceTempView(dup)
                flat = re.sub(rf"\b{t}(\s+(?:AS\s+)?{a})\b",
                              rf"{dup}\1", flat, count=1,
                              flags=re.IGNORECASE)
    # hidden synthesized views (__{name}_sq/_j/_src) live in
    # eng._maintainers without an eng.views entry — they are valid
    # upstream sources for further lowering (scalar-subquery stacks)
    known = lambda t: (t in eng.tables or t in eng.views
                       or t in eng._maintainers)
    attempts: list[str] = []

    def _try(ctor, *a):
        try:
            return ctor(*a)
        except _UnloweredShape as e:
            attempts.append(f"{ctor.__name__}(unlowered shape: {e})")
        except Exception as e:  # shape gate: correctness first
            attempts.append(f"{ctor.__name__}({type(e).__name__}: {e})")
        return None
    # OVER (PARTITION BY … ORDER BY … RANGE BETWEEN …) views first — the
    # demo02 feature shape; _BLOCKERS would otherwise send them straight
    # to snapshot-diff while the O(Δ) rolling operator sits one layer down
    if re.search(r"\bOVER\b", flat, re.IGNORECASE):
        m = _PROJECT_RE.match(flat)
        if m and known(m.group("tbl").lower()):
            r = _try(_RollingWindowMaintainer, eng, name, flat, m)
            if r is not None:
                return r
            # frame-bounded rolling didn't fit (LAG/LEAD/ROW_NUMBER/ROWS
            # frames, mixed fns): touched-partition recompute still beats
            # snapshot-diff for any single shared PARTITION BY
            r = _try(_PartitionWindowMaintainer, eng, name, flat, m)
            if r is not None:
                return r
            # no PARTITION BY at all: global running totals / ranks over
            # full-prefix frames maintain by bounded tail recompute
            r = _try(_GlobalTailWindowMaintainer, eng, name, flat, m)
            if r is not None:
                return r
        else:
            # FROM is a join chain or subquery: layer the rolling (or
            # touched-partition) maintainer over a synthesized hidden
            # view of the FROM
            r = _try(_rolling_over_from, eng, name, flat)
            if r is not None:
                return r
    _fs = _split_select_from(flat)
    if (_fs is not None and _fs[1].startswith("(")
            and not re.search(r"\bOVER\b", flat, re.IGNORECASE)):
        # derived-table FROM (verbatim TPC-H q13/q7/q9 nesting): hidden
        # maintained view for the subquery, outer re-lowered over it
        # (OVER shapes take _rolling_over_from above instead)
        r = _try(_from_subquery_lift, eng, name, flat)
        if r is not None:
            return r
    if (_fs is not None
            and not re.search(r"\bOVER\b", flat, re.IGNORECASE)):
        _stop = _find_top_kw(_fs[1], _NCF_STOPS)
        _fc = _fs[1] if _stop < 0 else _fs[1][:_stop]
        if re.search(r"\(\s*SELECT", _fc, re.IGNORECASE) \
                and re.search(r"\bJOIN\b", _fc, re.IGNORECASE):
            # derived tables inside a JOIN chain (join-of-aggregates):
            # hoist every FROM-clause subquery, aliases kept
            r = _try(_from_multi_subquery_lift, eng, name, flat)
            if r is not None:
                return r
    if not _BLOCKERS.search(flat) and not _analyzed_has_aggregate(eng, flat):
        m = _JOIN_RE.match(flat)
        # either side may be an upstream *maintained view*: its per-tick
        # output delta flows through `combined` exactly like a table delta
        # ≥3-table chains FIRST: the two-table regex would greedily
        # swallow the extra JOINs into its ON-condition group and build a
        # maintainer blind to the third table's deltas (silent wrong
        # results, not just a missed lowering)
        chain = _parse_join_chain(flat)
        if chain is not None and all(known(t) for t in chain[1]):
            r = _try(_MultiJoinMaintainer, eng, name, flat, chain[1])
            if r is not None:
                return r
        # the 2-table path additionally requires exactly one JOIN keyword:
        # a chain that failed to parse (e.g. repeated table names) must
        # fall through to snapshot-diff, not lower to a blind 2-table plan
        if m and len(re.findall(r"\bJOIN\b", flat, re.IGNORECASE)) == 1 \
                and known(m.group("lt").lower()) \
                and known(m.group("rt").lower()) \
                and m.group("lt").lower() != m.group("rt").lower():
            return _JoinMaintainer(eng, name, flat, m.group("lt").lower(),
                                   m.group("rt").lower())
        m = _PROJECT_RE.match(flat)
        # project/filter composes over another *maintained view* too: the
        # upstream maintainer's per-tick output delta is this view's input
        # delta (linear ∘ anything = incremental), so layered view scripts
        # (demo02-style feature stacks) stay O(Δ) end to end
        if m and known(m.group("tbl").lower()):
            return _ProjectMaintainer(eng, name, flat,
                                      m.group("tbl").lower())
    u = _split_union(flat)
    if u is not None:
        r = _try(_UnionMaintainer, eng, name, flat, u[0], u[1])
        if r is not None:
            return r
        # branches that aren't plain projections (aggregates, joins,
        # CTE stacks): hoist each into a hidden view and retry
        r = _try(_union_branch_lift, eng, name, flat, u[0], u[1])
        if r is not None:
            return r
    so = _split_setop(flat)
    if so is not None:
        ctor = (_SetOpAllMaintainer if so[0].endswith("_all")
                else _SetOpMaintainer)
        r = _try(ctor, eng, name, flat, so[0], so[1])
        if r is not None:
            return r
        r = _try(_setop_branch_lift, eng, name, flat, so[0], so[1])
        if r is not None:
            return r
    m = _DISTINCT_RE.match(flat)
    inner = re.sub(r"^\s*SELECT\s+DISTINCT\b", "SELECT", flat, count=1,
                   flags=re.IGNORECASE)
    if (m and known(m.group("tbl").lower())
            and not _DISTINCT_BLOCKERS.search(inner)
            and not _analyzed_has_aggregate(eng, flat)):
        r = _try(_DistinctMaintainer, eng, name, flat,
                 m.group("tbl").lower(), inner)
        if r is not None:
            return r
    m = _GLOBAL_AGG_RE.match(flat)
    if (m and known(m.group("tbl").lower())
            and not _GLOBAL_AGG_BLOCKERS.search(flat)
            and _analyzed_has_aggregate(eng, flat)):
        r = _try(_GlobalAggMaintainer, eng, name, flat,
                 m.group("tbl").lower())
        if r is not None:
            return r
    if (re.search(r"\bJOIN\b", flat, re.IGNORECASE)
            and not re.search(r"\bGROUP\s+BY\b|\bOVER\b|\bUNION\b"
                              r"|\bORDER\s+BY\b|\bLIMIT\b|\(\s*SELECT"
                              r"|\b(LEFT|RIGHT|FULL|CROSS)\b|\bHAVING\b"
                              r"|\bDISTINCT\b",
                              flat, re.IGNORECASE)
            and _analyzed_has_aggregate(eng, flat)):
        # GROUP-BY-less aggregate over a join chain (verbatim q14):
        # hidden maintained join view + global agg on its delta
        r = _try(_global_agg_over_from, eng, name, flat)
        if r is not None:
            return r
    m = _GROUPING_AGG_RE.match(flat)
    if (m and known(m.group("tbl").lower())
            and not _AGG_BLOCKERS.search(flat)):
        keys = []
        for tok in re.findall(r"[A-Za-z_][\w.]*", m.group("keys")):
            if tok not in keys:
                keys.append(tok)
        spec = _match_agg_items(m.group("sel"), keys)
        if spec:
            r = _try(_GroupingSetsAggMaintainer, eng, name, flat, m, spec)
            if r is not None:
                return r
    if (re.search(r"\bLEFT\s+(?:OUTER\s+)?JOIN\b", flat, re.IGNORECASE)
            and re.search(r"\bGROUP\s+BY\b", flat, re.IGNORECASE)
            and not re.search(r"\bUNION\b|\bINTERSECT\b|\bEXCEPT\b"
                              r"|\bOVER\b|\bLIMIT\b|\bORDER\s+BY\b"
                              r"|\bDISTINCT\b|\bHAVING\b|\(\s*SELECT"
                              r"|\b(RIGHT|FULL|CROSS)\b",
                              flat, re.IGNORECASE)):
        # COUNT/SUM over a LEFT JOIN grouped by left keys (TPC-H q13's
        # inner): right partials → outer join → final linear agg
        r = _try(_left_join_agg, eng, name, flat)
        if r is not None:
            return r
    m = _AGG_RE.match(flat)
    if (m and known(m.group("tbl").lower())
            and not _AGG_BLOCKERS.search(flat)):
        keys = [k.strip() for k in m.group("keys").split(",")]
        spec = _match_agg_items(m.group("sel"), keys,
                                allow_key_only=bool(m.group("having")))
        # e.g. a HAVING predicate over expressions the finalize frame
        # doesn't carry — correctness first: snapshot-diff it
        if spec:
            r = _try(_LinearAggMaintainer, eng, name, flat,
                     m.group("tbl").lower(), keys, spec)
            if r is not None:
                return r
        elif _match_nonlinear_items(m.group("sel"), keys):
            r = _try(_NonLinearAggMaintainer, eng, name, flat,
                     m.group("tbl").lower(), keys)
            if r is not None:
                return r
    m = _AGG_RE.match(flat)
    # the per-tick partials run over the delta alone (eval_on rebinding),
    # so an upstream maintained view's output delta works like a table's
    if (m and known(m.group("tbl").lower())
            and not _DISTINCT_AGG_BLOCKERS.search(flat)):
        keys = [k.strip() for k in m.group("keys").split(",")]
        spec = _match_distinct_agg_items(m.group("sel"), keys)
        if spec:
            r = _try(_DistinctAggMaintainer, eng, name, flat,
                     m.group("tbl").lower(), keys, spec)
            if r is not None:
                return r
        elif len(re.findall(r"\bDISTINCT\b", flat, re.IGNORECASE)) >= 2:
            # several DIFFERENT distinct expressions: split into one
            # hidden distinct-agg view per expression, joined on keys
            r = _try(_multi_distinct_split, eng, name, flat, m, keys)
            if r is not None:
                return r
    # expression GROUP BY keys (the SQL tumbling-window idiom) — a
    # hidden projection materializes each expression, then the agg
    # re-lowers with plain keys
    if re.search(r"\bGROUP\s+BY\b", flat, re.IGNORECASE):
        r = _try(_agg_expr_keys, eng, name, flat)
        if r is not None:
            return r
    # ≥3-table join→GROUP BY FIRST: the 2-table join-agg regex would
    # swallow extra JOINs into its ON-condition group and miss the third
    # table's deltas (silent wrong results)
    m = _MJ_AGG_RE.match(flat)
    if m and not _JOIN_AGG_BLOCKERS.search(flat):
        tables = _parse_from_chain(m.group("from"))
        if tables and all(known(t) for t in tables):
            keys = [k.strip() for k in m.group("keys").split(",")]
            spec = _match_agg_items(m.group("sel"), keys)
            if spec:
                r = _try(_MultiJoinAggMaintainer, eng, name, flat,
                         tables, m, spec)
                if r is not None:
                    return r
    m = _JOIN_AGG_RE.match(flat)
    if (m and len(re.findall(r"\bJOIN\b", flat, re.IGNORECASE)) == 1
            and known(m.group("lt").lower())
            and known(m.group("rt").lower())
            and m.group("lt").lower() != m.group("rt").lower()
            and not _JOIN_AGG_BLOCKERS.search(flat)):
        keys = [k.strip() for k in m.group("keys").split(",")]
        spec = _match_agg_items(m.group("sel"), keys)
        if spec:
            r = _try(_JoinAggMaintainer, eng, name, flat,
                     m.group("lt").lower(), m.group("rt").lower(),
                     keys, spec)
            if r is not None:
                return r
    m = _TOPK_RE.match(flat)
    if m and known(m.group("tbl").lower()):
        r = _try(_GroupTopKMaintainer, eng, name, flat, m)
        if r is not None:
            return r
    m = _GLOBAL_TOPK_RE.match(flat)
    if (m and known(m.group("tbl").lower())
            and not _GLOBAL_TOPK_BLOCKERS.search(flat)
            and not _analyzed_has_aggregate(eng, flat)):
        r = _try(_GlobalTopKMaintainer, eng, name, flat, m)
        if r is not None:
            return r
    if _ORDER_LIMIT_RE.match(flat) and (m is None
                                        or _GLOBAL_TOPK_BLOCKERS
                                        .search(flat)):
        # complex body before the ORDER BY … LIMIT tail: hidden
        # maintained view for the body, global top-k layered on top
        r = _try(_topk_over_from, eng, name, flat)
        if r is not None:
            return r
    if re.search(r"(?:>=|<=|<>|!=|=|>|<)\s*(?:ANY|ALL|SOME)"
                 r"\s*\(\s*SELECT", flat, re.IGNORECASE):
        # quantified comparison subqueries (the comparison-op prefix
        # keeps set-op ``UNION/EXCEPT ALL (SELECT`` spellings out)
        # FIRST: Spark SQL cannot even parse them, so no later
        # recognizer or fallback applies.  A grouped HAVING carrier
        # splits first (hidden aggregate view + quantified WHERE over
        # it), then the plain WHERE shape.
        if _top_level_having(flat) >= 0:
            r = _try(_having_quantified_lift, eng, name, flat)
            if r is not None:
                return r
        r = _try(_quantified_lift, eng, name, flat)
        if r is not None:
            return r
        # terminal: no later recognizer (nor the snapshot-diff net) can
        # even PARSE a quantified comparison — fail loudly here instead
        # of a ParseException from an unrelated gate downstream
        raise _UnloweredShape("quantified comparison shape is not "
                              "lowerable")
    if re.search(r"\(\s*SELECT", flat, re.IGNORECASE):
        # scalar subqueries in HAVING (TPC-H q11) first — the generic
        # scalar path can't parse a GROUP BY body
        if _top_level_having(flat) >= 0:
            r = _try(_scalar_having_from, eng, name, flat)
            if r is not None:
                return r
            # [NOT] IN subquery terms over GROUP KEYS in the HAVING:
            # hidden aggregate + semi/anti filter over its delta
            r = _try(_having_key_subquery_split, eng, name, flat)
            if r is not None:
                return r
        # scalar-aggregate subqueries in the SELECT list / WHERE lower
        # to a hidden GROUP BY + LEFT JOIN stack (NOT behind the
        # aggregate gate: the subquery's own Aggregate node trips it)
        r = _try(_scalar_subquery_from, eng, name, flat)
        if r is not None:
            return r
    if re.search(r"\(\s*SELECT", flat, re.IGNORECASE) \
            and not _analyzed_has_aggregate(eng, flat):
        spec = _match_subquery_filter(eng, flat)
        if spec is not None:
            if spec.get("terms"):
                ctor = _MultiSubqueryFilterMaintainer
            elif spec.get("nullable_not_in"):
                ctor = (_NotInNullableMaintainer
                        if len(spec["okeys"]) == 1
                        else _NotInNullableTupleMaintainer)
            else:
                ctor = _SubqueryFilterMaintainer
            r = _try(ctor, eng, name, flat, spec)
            if r is not None:
                return r
        elif re.search(r"\bEXISTS\b", flat, re.IGNORECASE) \
                and re.search(r"\bJOIN\b", flat, re.IGNORECASE):
            # EXISTS bodies that are JOIN chains: pre-lower each body's
            # join to a hidden view, then re-lower through the matcher
            r = _try(_filter_subquery_join_inner, eng, name, flat)
            if r is not None:
                return r
        if re.search(r"\bIN\s*\(\s*SELECT", flat, re.IGNORECASE):
            # IN bodies selecting an EXPRESSION: hoist the expression
            # into a hidden projection, then re-lower
            r = _try(_filter_in_expr_inner, eng, name, flat)
            if r is not None:
                return r
    if (re.search(r"\(\s*SELECT", flat, re.IGNORECASE)
            and re.search(r"\bGROUP\s+BY\b", flat, re.IGNORECASE)
            and not re.search(r"\bJOIN\b|\bUNION\b|\bINTERSECT\b"
                              r"|\bEXCEPT\b|\bOVER\b",
                              flat, re.IGNORECASE)):
        # grouped aggregates whose select list AGGREGATES a scalar
        # subquery (SUM((SELECT …))): hidden scalar-projection stage,
        # aggregate re-lowered over its delta
        r = _try(_agg_over_scalar_subquery, eng, name, flat)
        if r is not None:
            return r
    if (re.search(r"\(\s*SELECT", flat, re.IGNORECASE)
            and re.search(r"\bGROUP\s+BY\b", flat, re.IGNORECASE)
            and not re.search(r"\bJOIN\b|\bUNION\b|\bINTERSECT\b"
                              r"|\bEXCEPT\b|\bOVER\b|\bLIMIT\b"
                              r"|\bORDER\s+BY\b|\bDISTINCT\b",
                              flat, re.IGNORECASE)):
        # aggregate over a subquery-filtered table (verbatim TPC-H q4):
        # hidden filtered view, agg re-lowered over its delta
        r = _try(_agg_over_subquery_filter, eng, name, flat)
        if r is not None:
            return r
    if (re.search(r"\(\s*SELECT", flat, re.IGNORECASE)
            and re.search(r"\bGROUP\s+BY\b", flat, re.IGNORECASE)
            and not re.search(r"\bUNION\b|\bINTERSECT\b|\bEXCEPT\b"
                              r"|\bOVER\b|\bLIMIT\b|\bORDER\s+BY\b"
                              r"|\b(LEFT|RIGHT|FULL|CROSS)\b",
                              flat, re.IGNORECASE)):
        # aggregate over a subquery-filtered JOIN chain (verbatim TPC-H
        # q16/q18/q21) — or a single table whose subquery shapes the
        # plain `_agg_over_subquery_filter` path above raised on (an IN
        # body carrying its own GROUP BY): hidden in/jv/src stages +
        # re-lowered aggregate
        r = _try(_agg_over_filtered_join, eng, name, flat)
        if r is not None:
            return r
    m = _LEFT_JOIN_RE.match(flat)
    if (m and known(m.group("lt").lower())
            and known(m.group("rt").lower())
            and m.group("lt").lower() != m.group("rt").lower()
            and not _LEFT_JOIN_BLOCKERS.search(flat)
            and not _analyzed_has_aggregate(eng, flat)):
        r = _try(_LeftJoinMaintainer, eng, name, flat,
                 m.group("lt").lower(), m.group("rt").lower(), m)
        if r is not None:
            return r
    if (re.search(r"\bJOIN\b", flat, re.IGNORECASE)
            and not re.search(r"\bOVER\b|\bUNION\b|\bINTERSECT\b"
                              r"|\bEXCEPT\b", flat, re.IGNORECASE)):
        # last resort before the fallback: hoist the join chain into a
        # hidden view and re-lower the remaining shape over its delta
        # (MIN/MAX-over-join, ROLLUP-over-join, DISTINCT-over-join, …)
        r = _try(_shape_over_join_lift, eng, name, flat)
        if r is not None:
            return r
    _LOG.warning(
        "view %s: no incremental lowering matched — maintaining by "
        "snapshot-diff (full recompute per tick)%s", name,
        ("; recognizers tried: " + "; ".join(attempts)) if attempts
        else "")
    return _ViewMaintainer(eng, name, sql)


def _split_top_level(s: str) -> list[str]:
    """Comma-split at paren depth 0, literal-aware (a ``','`` inside a
    string literal is not a separator)."""
    out, depth, in_str, buf = [], 0, False, []
    for ch in s:
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                out.append("".join(buf))
                buf = []
                continue
        buf.append(ch)
    out.append("".join(buf))
    return out


class Engine:
    """SQL pipeline engine: DDL in, maintained views out.

    Usage (mirrors demo/project_demo01-TimeSeriesEnrich)::

        eng = Engine(spark)
        eng.execute(open("project.sql").read())   # CREATE TABLE/VIEW script
        eng.push("transactions", tx_batch_df)      # insert a delta
        eng.push("demographics", dem_df)
        deltas = eng.step()                        # {view: ZSetFrame delta}
        eng.view("transactions_with_demographics") # current snapshot
    """

    def __init__(self, spark: SparkSession, agg_salts: int | None = None,
                 state_path: str | None = None, recover: bool = False,
                 partition_by: Mapping[str, Sequence[str]] | None = None):
        self.spark = spark
        #: declared-hot-key salting for the GROUP BY maintainers: when
        #: set, every linear/join-agg view's per-delta partial aggregate
        #: runs two-stage — GROUP BY (keys, salt) then GROUP BY keys —
        #: spreading a skewed key over N reducers (skew.py rationale)
        self.agg_salts = agg_salts
        #: durable mode (the reference's pipeline checkpoint/resume,
        #: pipeline_manager suspend/resume): table state lives in
        #: partitioned parquet under ``state_path`` (any Hadoop FS — S3,
        #: HDFS, local) and survives the session.  Tables are the ground
        #: truth; view maintainers keep their (possibly op-internal)
        #: state in memory and are re-seeded on ``recover=True`` by one
        #: bootstrap tick that replays the recovered snapshots as a
        #: single insert delta — one batch recompute at restart buys
        #: uniform recovery for every maintainer kind, with no
        #: per-operator checkpoint plumbing.
        self.state_path = state_path
        self._recover = recover
        self._partition_by = dict(partition_by or {})
        self._bootstrapped: set[str] = set()
        self.tables: dict[str, StateTable] = {}
        self.views: dict[str, str] = {}
        self._maintainers: dict[str, _ViewMaintainer] = {}
        self._sources: dict[str, set[str]] = {}
        self._pending: dict[str, list[ZSetFrame]] = {}
        self._in_bootstrap = False
        #: per-view output connectors (attach_output)
        self._outputs: dict[str, list] = {}
        self._tick = 0
        register_sql_macros(spark)

    def eval_on(self, sql: str, bindings: Mapping[str, DataFrame]) -> DataFrame:
        """Evaluate ``sql`` with some table names temporarily rebound to
        other DataFrames (e.g. the tick's delta).  ``spark.sql`` analyzes
        eagerly, so the returned plan keeps the rebinding after the temp
        views are restored to their canonical state.

        Temp views are session-global, so this rebind-restore is safe
        only single-threaded within one Engine per SparkSession: two
        Engines sharing a session (or a concurrent query during a step)
        would race on the bindings.  Give each Engine its own session
        (``spark.newSession()`` shares the JVM but isolates the temp-view
        catalog) to run several pipelines concurrently."""
        for t, df in bindings.items():
            df.createOrReplaceTempView(t)
        try:
            return self.spark.sql(sql)
        finally:
            for t in bindings:
                if t in self.tables:
                    self._refresh_table_view(t)
                elif t in self._maintainers:
                    # restore a maintained view's canonical binding
                    # (named views AND hidden synthesized views — a
                    # hidden view left bound to a tick's delta would
                    # poison every later consumer)
                    self._maintainers[t].state.current.rows() \
                        .createOrReplaceTempView(t)

    # -------------------------------------------------------------- #
    # DDL / query execution
    # -------------------------------------------------------------- #

    def execute(self, script: str) -> DataFrame | None:
        """Run a SQL script; returns the last SELECT's DataFrame if any."""
        last = None
        for stmt in _split_statements(_rewrite_dialect(script)):
            m = _CREATE_TABLE.match(stmt)
            if m:
                self._create_table(m.group(1).lower(), _parse_columns(m.group(2)))
                continue
            m = _CREATE_VIEW.match(stmt)
            if m:
                self._create_view(m.group(1).lower(), m.group(2))
                continue
            last = self.spark.sql(stmt)
        if self._recover:
            self._bootstrap_views()
        return last

    def _create_table(self, name: str, schema: T.StructType) -> None:
        empty = ZSetFrame.from_df(self.spark.createDataFrame([], schema))
        kw = {}
        if self.state_path:
            kw = {"path": self.state_path, "recover": self._recover,
                  "partition_by": self._partition_by.get(name)}
        self.tables[name] = StateTable(empty, name=f"table_{name}", **kw)
        self._pending[name] = []
        self._refresh_table_view(name)

    def _bootstrap_views(self) -> None:
        """Re-seed view maintainers after ``recover=True``: replay each
        recovered table snapshot as one insert delta through every
        not-yet-bootstrapped maintainer (with pre-tick state = empty), so
        maintainer-internal integrals/keyed outputs rebuild exactly as if
        the whole table had arrived in a single tick.  One batch-scale
        recompute at restart, uniform across maintainer kinds."""
        combined = {n: t.current for n, t in self.tables.items()}
        empty_of = lambda z: ZSetFrame(z.df.limit(0))
        old = {n: empty_of(t.current) for n, t in self.tables.items()}
        old.update({n: m._empty() for n, m in self._maintainers.items()})

        # maintainers read post-tick table rows via the temp views — the
        # recovered snapshots are already bound by _create_table.  The
        # flag lets maintainers that derived O(1) counters from the
        # RECOVERED tables at construction (the nullable NOT IN family)
        # skip re-counting the replayed snapshot — without it the
        # bootstrap delta double-counted them (found r11: a recovered
        # single-column NOT IN reported n_inner=2 for a 1-row inner and
        # then mis-tracked the B1→B2 regime flip).
        self._in_bootstrap = True
        try:
            for name, m in self._maintainers.items():
                if name in self._bootstrapped:
                    # an already-bootstrapped view still feeds
                    # downstream maintainers created in a LATER
                    # execute(): to them its whole current state is
                    # "new", so contribute it as one insert delta
                    # (mirroring the table snapshots above), not
                    # _empty() — else the late view silently seeds
                    # empty.
                    combined[name] = m.state.current
                    continue
                delta = m.step(self, dict(combined), old)
                m.state.current.rows().createOrReplaceTempView(name)
                combined[name] = delta
                self._bootstrapped.add(name)
        finally:
            self._in_bootstrap = False

    def _create_view(self, name: str, select_sql: str) -> None:
        # Calcite-style normalization first: implicit comma joins become
        # explicit JOIN … ON chains, so verbatim TPC-H text reaches the
        # same recognizers as hand-written chains (no-op for anything
        # unparsable — when the rewrite changed nothing beyond
        # whitespace, the ORIGINAL text stays canonical, ADVICE r7 #2).
        normalized = _normalize_comma_from(self, select_sql)
        if normalized != _ncf_flatten(select_sql):
            select_sql = normalized
        self.views[name] = select_sql
        self._maintainers[name] = _lower_view(self, name, select_sql)
        # structural dependency set (tables + earlier views referenced by
        # name) — lets step() skip views whose inputs saw no delta
        words = {w.lower() for w in re.findall(r"\b\w+\b", select_sql)}
        self._sources[name] = {w for w in words
                               if w in self.tables or w in self.views}
        # canonical binding = the maintainer's (initially empty) state
        # rows, matching the post-step binding — downstream views then
        # analyze against materialized rows, not this view's SQL plan
        # (whose Aggregate node would wrongly block their linear lowering)
        self._maintainers[name].state.current.rows() \
            .createOrReplaceTempView(name)

    def _refresh_table_view(self, name: str) -> None:
        # bind the lazy peek, not current: rebinding must not force a
        # deferred state fold (it would schedule a materialization job
        # for tables nothing reads); with no deferred deltas peek IS the
        # materialized state, exactly the old binding
        self.tables[name].peek().rows().createOrReplaceTempView(name)

    # -------------------------------------------------------------- #
    # data in / incremental step / data out
    # -------------------------------------------------------------- #

    def push(self, table: str, delta: DataFrame | ZSetFrame,
             weight: int = 1) -> None:
        """Queue a delta for ``table`` (negative ``weight`` = retraction) —
        the reference's ``CollectionHandle`` push (input.rs:591-721)."""
        z = delta if isinstance(delta, ZSetFrame) else ZSetFrame.from_df(delta, weight)
        self._pending[table].append(z)

    def step(self) -> dict[str, ZSetFrame]:
        """One clock tick (dbsp_handle.rs:246 ``step``): apply pending
        deltas, run each view's maintainer (delta plan for lowered views,
        snapshot-diff for the fallback), emit per-view output deltas."""
        combined: dict[str, ZSetFrame] = {}
        # pre-tick snapshots, served LAZILY (read-tracking
        # materialization): tables fold/materialize only when a
        # maintainer actually reads them; maintained views are captured
        # as plain values because a bilinear maintainer whose LEFT side
        # is an upstream view needs A_old for the A_old ⋈ ΔB leg (the
        # view's state is updated in-loop)
        old: Mapping[str, ZSetFrame] = _OldSnapshots(self)
        for name, deltas in self._pending.items():
            if deltas:
                combined[name] = ZSetFrame.sum(deltas)
            self._pending[name] = []
        for name, z in combined.items():
            t = self.tables[name]
            if t.path is None:
                # memory backend: queue the delta; the state materializes
                # on the first integral read (§5 — a source state no
                # maintainer re-reads this tick schedules NO job).  The
                # parquet backend keeps the eager write: the per-epoch
                # file IS the durability contract.
                t.defer_update(z)
            else:
                t.update(z)
            self._refresh_table_view(name)

        out: dict[str, ZSetFrame] = {}
        # a view is touched iff any source table got a delta this tick, or
        # any source view is itself touched (views are created in
        # dependency order).  Untouched views skip their maintainer step
        # AND the temp-view rebinding — zero per-tick cost for idle views.
        touched: set[str] = set(combined)
        for name, m in self._maintainers.items():
            if not (self._sources[name] & touched):
                out[name] = m._empty()
                continue
            if m.sql_reads_sources:
                # this maintainer evaluates SQL that resolves source
                # tables through their canonical temp views — fold any
                # deferred deltas and rebind so it reads materialized
                # state (exactly the pre-optimization behaviour)
                for src in sorted(self._sources[name]):
                    t = self.tables.get(src)
                    if t is not None and t._deferred:
                        t._fold()
                        self._refresh_table_view(src)
            delta = m.step(self, combined, old)
            m.state.current.rows().createOrReplaceTempView(name)
            out[name] = delta
            touched.add(name)
            # downstream lowered views consume this view's delta the same
            # way they consume table deltas (views step in creation =
            # dependency order)
            combined[name] = delta
            for sink in self._outputs.get(name, ()):
                sink(delta, self._tick)
        self._tick += 1
        return out

    def attach_output(self, view: str, sink) -> None:
        """Attach an output connector to a maintained view (the
        reference's per-view output connectors, pipeline-manager config →
        adapters/src/lib.rs encoder+transport): ``sink`` is called as
        ``sink(delta, tick)`` with the view's non-empty per-tick output
        delta (a :class:`ZSetFrame`).  Compose with
        :func:`sources.files.write_zset` (one parquet/csv dir per tick),
        :class:`sources.http.HttpOutput`, or an
        :class:`~database_stream_processor_spark.sources.files.OutputHandle`."""
        if view not in self.views:
            raise KeyError(view)
        self._outputs.setdefault(view, []).append(sink)

    def attach_output_handle(self, view: str):
        """Convenience: attach and return an
        :class:`~database_stream_processor_spark.sources.files.OutputHandle`
        collecting the view's per-tick deltas (output.rs:29)."""
        from database_stream_processor_spark.sources.files import (
            OutputHandle)
        h = OutputHandle(
            snapshot_fn=lambda: self._maintainers[view].state.current)
        self.attach_output(view, lambda delta, tick: h.push(delta))
        return h

    def stream_step_fn(self, table: str):
        """Adapter for the streaming layer: a ``(DataFrame | ZSetFrame)
        -> dict`` callable that pushes each micro-batch into ``table``
        and runs one engine tick — hand it to
        :class:`streaming.driver.StepDriver` + ``foreachBatch`` and the
        whole SQL pipeline runs off a live source, one micro-batch per
        clock tick (the reference's production wiring: transport →
        pipeline manager → circuit, crates/adapters/src/lib.rs:12-40).
        Deltas queued via :meth:`push` for other tables drain on the
        same tick.

        ``foreachBatch`` hands over a DataFrame bound to Structured
        Streaming's *cloned* SparkSession; the engine's temp-view
        rebinding lives in its own session's catalog, so the batch is
        re-homed first (materialize, then rebuild from the JVM row RDD
        under the engine session — no driver round-trip)."""
        def tick(dz):
            df = dz.df if isinstance(dz, ZSetFrame) else dz
            if df.sparkSession is not self.spark:
                ck = df.localCheckpoint(eager=True)
                jdf = self.spark._jsparkSession.createDataFrame(
                    ck._jdf.javaRDD(), ck._jdf.schema())
                df = DataFrame(jdf, self.spark)
                dz = (ZSetFrame(df) if isinstance(dz, ZSetFrame)
                      else df)
            self.push(table, dz)
            return self.step()
        return tick

    def view(self, name: str) -> DataFrame:
        """Current snapshot of a maintained view."""
        if name in self.views:
            return self._maintainers[name].state.current.rows()
        return self.tables[name].current.rows()

    def view_strategy(self, name: str) -> str:
        """'project' | 'join' | 'linear_agg' | 'differentiate' — which
        maintenance path a view was lowered to."""
        return self._maintainers[name].kind

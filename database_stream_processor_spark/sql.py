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

import re
from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)
from pyspark.sql import types as T

from database_stream_processor_spark.functions.scalar import register_sql_macros
from database_stream_processor_spark.plans.incremental import StateTable
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
    comments (the demo scripts use both)."""
    script = re.sub(r"--[^\n]*", "", script)
    stmts, buf, in_str = [], [], False
    for ch in script:
        if ch == "'":
            in_str = not in_str
        if ch == ";" and not in_str:
            stmts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    stmts.append("".join(buf))
    return [s.strip() for s in stmts if s.strip()]


_CREATE_TABLE = re.compile(r"^CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*$",
                           re.IGNORECASE | re.DOTALL)
_CREATE_VIEW = re.compile(r"^CREATE\s+VIEW\s+(\w+)\s+AS\s+(.*)$",
                          re.IGNORECASE | re.DOTALL)


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

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, StateTable] = {}
        self.views: dict[str, str] = {}
        self._view_prev: dict[str, StateTable] = {}
        self._pending: dict[str, list[ZSetFrame]] = {}
        register_sql_macros(spark)

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
        return last

    def _create_table(self, name: str, schema: T.StructType) -> None:
        empty = ZSetFrame.from_df(self.spark.createDataFrame([], schema))
        self.tables[name] = StateTable(empty, name=f"table_{name}")
        self._pending[name] = []
        self._refresh_table_view(name)

    def _create_view(self, name: str, select_sql: str) -> None:
        self.views[name] = select_sql
        snapshot = self.spark.sql(select_sql)
        self._view_prev[name] = StateTable(
            ZSetFrame.from_df(snapshot.limit(0)), name=f"view_{name}")
        snapshot.limit(0).createOrReplaceTempView(name)

    def _refresh_table_view(self, name: str) -> None:
        self.tables[name].current.rows().createOrReplaceTempView(name)

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
        deltas, re-evaluate views, emit per-view output deltas."""
        for name, deltas in self._pending.items():
            if deltas:
                self.tables[name].update(ZSetFrame.sum(deltas))
                self._refresh_table_view(name)
            self._pending[name] = []

        out: dict[str, ZSetFrame] = {}
        for name, sql in self.views.items():
            snapshot = ZSetFrame.from_df(self.spark.sql(sql)).consolidate()
            prev = self._view_prev[name]
            delta = snapshot.minus(prev.current).consolidate()
            prev._current = prev._materialize(snapshot)
            snapshot.rows().createOrReplaceTempView(name)
            out[name] = delta
        return out

    def view(self, name: str) -> DataFrame:
        """Current snapshot of a maintained view."""
        if name in self.views:
            return self._view_prev[name].current.rows()
        return self.tables[name].current.rows()

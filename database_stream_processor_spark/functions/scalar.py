"""Scalar-function surface (reference: SURVEY.md §2.10 — functions observed
in the reference's demo SQL and Nexmark queries; the full library lives in
its Calcite submodule, so this is the in-repo surface).

Everything here is JVM-side: either a native ``pyspark.sql.functions``
composition or a Spark *SQL scalar function* (``CREATE TEMPORARY FUNCTION …
RETURN expr``) — both inline into whole-stage codegen; no Python UDFs.

| Reference usage | Here |
|---|---|
| ``ST_POINT(x,y)``, ``ST_DISTANCE(p,q)`` (FraudDetection project.sql:33) | :func:`st_point`, :func:`st_distance` (+ SQL macros) |
| haversine enrichment (same demo, geographic variant) | :func:`haversine_km` |
| ``SPLIT_INDEX(url,'/',n)`` (nexmark q22.rs:36) | :func:`split_index` |
| ``EXTRACT(EPOCH/ISODOW FROM ts)`` (GreenTrip project.sql:15-29) | :func:`extract_epoch`, :func:`isodow` + SQL rewrite in sql.py |
| ``DAYOFWEEK``, ``TIMESTAMPDIFF`` (FraudDetection project.sql:30-32) | native ``dayofweek``/``timestampdiff`` |
| currency conversion ``price * 0.908`` (nexmark q1.rs:30) | :func:`dol_to_eur` |
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def st_point(x: Column, y: Column) -> Column:
    """Planar point constructor (Calcite ``ST_POINT``)."""
    return F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))


def st_distance(a: Column, b: Column) -> Column:
    """Euclidean distance between two :func:`st_point` structs — Calcite's
    planar ``ST_DISTANCE`` semantics (the reference demo applies it directly
    to lon/lat coordinates, FraudDetection project.sql:33)."""
    return F.sqrt(F.pow(a["x"] - b["x"], 2) + F.pow(a["y"] - b["y"], 2))


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km — the geographically-correct variant for
    lat/lon feature engineering."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2)
    return 2 * 6371.0088 * F.asin(F.sqrt(a))


def split_index(s: Column | str, delim: str, idx: int) -> Column:
    """Flink-style ``SPLIT_INDEX(s, delim, idx)`` (0-based; nexmark
    q22.rs:36)."""
    return F.split(s, delim).getItem(idx)


def extract_epoch(ts: Column | str) -> Column:
    """``EXTRACT(EPOCH FROM ts)`` → seconds since epoch as long."""
    return F.unix_timestamp(ts)


def isodow(ts: Column | str) -> Column:
    """``EXTRACT(ISODOW FROM ts)`` — ISO day of week, Monday=1..Sunday=7.
    Spark's ``dayofweek`` is Sunday=1..Saturday=7; shift accordingly."""
    return (F.dayofweek(ts) + 5) % 7 + 1


def dol_to_eur(price: Column, rate: float = 0.908) -> Column:
    """Nexmark q1's currency conversion (q1.rs:30)."""
    return F.round(price * rate, 2)


#: SQL scalar functions registered into the session catalog so raw SQL text
#: (the reference's demo scripts) can call them.  All are pure expressions —
#: Catalyst inlines them; no UDF boundary.
SQL_MACROS = [
    """CREATE OR REPLACE TEMPORARY FUNCTION ST_POINT(x DOUBLE, y DOUBLE)
       RETURNS STRUCT<x: DOUBLE, y: DOUBLE>
       RETURN named_struct('x', x, 'y', y)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION ST_DISTANCE(
           a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>)
       RETURNS DOUBLE
       RETURN sqrt(pow(a.x - b.x, 2) + pow(a.y - b.y, 2))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION SPLIT_INDEX(
           s STRING, delim STRING, idx INT)
       RETURNS STRING
       RETURN split(s, delim)[idx]""",
    """CREATE OR REPLACE TEMPORARY FUNCTION HAVERSINE_KM(
           lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE)
       RETURNS DOUBLE
       RETURN 2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(lat2 - lat1) / 2), 2)
           + cos(radians(lat1)) * cos(radians(lat2))
             * pow(sin(radians(lon2 - lon1) / 2), 2)))""",
]


def register_sql_macros(spark: SparkSession) -> None:
    """Install the §2.10 scalar functions into the session catalog."""
    for ddl in SQL_MACROS:
        spark.sql(ddl)

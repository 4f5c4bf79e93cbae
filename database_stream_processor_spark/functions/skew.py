"""Skew-mitigation: salted joins for hot keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in our sessions) handles sort-merge joins automatically; salting
is the explicit fallback for the cases AQE can't touch — aggregations
with one hot group, or joins whose build side AQE won't split.

Mechanics: the probe side sprays each row into one of ``n_salts``
sub-keys deterministically; the build side is replicated ``n_salts``
times.  The hot key's work then spreads over ``n_salts`` tasks.  Cost:
build-side shuffle volume × n_salts — use only on genuinely skewed keys
(or pre-filter: salt the hot keys, plain-join the rest).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(probe: DataFrame, build: DataFrame, on: Sequence[str],
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join resilient to probe-side key skew.

    ``probe`` rows get a deterministic salt (hash of the whole row, so
    re-execution is stable); ``build`` rows are replicated across all
    salts via a JVM-side ``explode(sequence(...))``.  Output columns are
    exactly the plain join's.
    """
    on = list(on)
    p = probe.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in probe.columns]),
                      F.lit(n_salts)))
    b = build.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return p.join(b, on=on + [_SALT], how=how).drop(_SALT)


def salted_aggregate(df: DataFrame, keys: Sequence[str], n_salts: int,
                     *aggs, final_aggs=None) -> DataFrame:
    """Two-phase aggregation for a hot group: partial-aggregate on
    (keys, salt), then merge per key.  ``aggs`` are the partial
    expressions (must be combinable: sum/count/min/max); ``final_aggs``
    (defaults to summing each partial alias) merges them.

    Spark's hash aggregate already does map-side partials, so this only
    helps when one *reduce-side* group still overwhelms a task — e.g. a
    single key holding >10% of all rows.
    """
    keys = list(keys)
    partial = (df.withColumn(_SALT, F.pmod(F.hash(*[F.col(c) for c in
                                                    df.columns]),
                                           F.lit(n_salts)))
               .groupBy(*keys, _SALT).agg(*aggs))
    if final_aggs is None:
        names = [c for c in partial.columns if c not in keys + [_SALT]]
        final_aggs = [F.sum(n).alias(n) for n in names]
    return partial.groupBy(*keys).agg(*final_aggs)

"""Deterministic sampling & splitting for training-data pipelines.

A 100 TB corpus pipeline needs reproducible subset selection: train/val/
test splits that never move a document between splits across reruns, and
per-stratum downsampling (e.g. cap each language's share) that is stable
under re-execution and under incremental arrival of new documents.  Both
are pure column expressions over a hash of the document id — zero
shuffles, fully pushed into the scan stage, and a document's assignment
depends only on its id (new batches never reshuffle old assignments —
the property that makes these usable under incremental maintenance).

``rand()``/``sample()`` are wrong for this at scale: nondeterministic
across retries, and task-failure replays can double- or zero-sample rows.

Reference: the data-prep north-star extras (BASELINE.json); the hash
discipline mirrors the reference's deterministic sharding
(src/operator/communication/shard.rs:89 — stable key-hash placement).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: resolution of the unit-interval hash (parts per million)
_DENOM = 1_000_000


def _unit_hash(cols: Sequence[Column | str], salt: str = "") -> Column:
    """Deterministic pseudo-uniform value in [0, 1) from ``cols`` —
    the portable md5-based :func:`~database_stream_processor_spark.
    functions.dedup.hash32` over a unit-separated concat, salt-separated
    so independent decisions (split vs sample) use independent hash
    streams.  Portable on purpose: any engine (DuckDB oracle included)
    reproduces the same assignment —
    ``('0x' || substr(md5(salt || chr(31) || id), 1, 8))::BIGINT``."""
    from database_stream_processor_spark.functions.dedup import hash32
    s = F.concat_ws("\x1f", F.lit(salt),
                    *[(F.col(c) if isinstance(c, str) else c).cast("string")
                      for c in cols])
    return F.pmod(hash32(s), F.lit(_DENOM)) / F.lit(_DENOM)


def hash_split(df: DataFrame, id_cols: Sequence[str],
               fractions: Mapping[str, float],
               out_col: str = "split", salt: str = "split") -> DataFrame:
    """Assign every row to one split by hashed id — e.g.
    ``{"train": .98, "val": .01, "test": .01}``.  Fractions must sum to
    1 (±1e-9).  Pure projection: stable across reruns, retries, and
    incremental batches."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions sum to {total}, expected 1")
    u = _unit_hash(id_cols, salt)
    expr, acc = None, 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return df.withColumn(out_col, expr)


def stratified_sample(df: DataFrame, strata_cols: Sequence[str],
                      fractions: Mapping, id_cols: Sequence[str],
                      default: float = 1.0,
                      salt: str = "sample") -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows — downsample
    over-represented strata (boilerplate languages, crawl dumps) without
    a shuffle: ``fractions`` maps a stratum key (the value of the single
    strata column, or a tuple for several) to its keep-fraction; strata
    not listed keep ``default``.  Selection hashes the row id, not
    ``rand()`` — rerunning the pipeline, retrying a task, or feeding the
    same corpus incrementally keeps exactly the same rows."""
    u = _unit_hash(id_cols, salt)
    frac = F.lit(float(default))
    for key, f in fractions.items():
        key_t = key if isinstance(key, tuple) else (key,)
        cond = None
        for c, v in zip(strata_cols, key_t):
            e = F.col(c).eqNullSafe(F.lit(v))
            cond = e if cond is None else (cond & e)
        frac = F.when(cond, F.lit(float(f))).otherwise(frac)
    return df.filter(u < frac)

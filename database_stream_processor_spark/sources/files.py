"""File transports + output handle (reference: crates/dbsp/src/operator/
csv.rs:1-138 ``CsvSource``, output.rs:29-219 ``OutputHandle``;
crates/adapters/src/transport/file.rs file endpoints; the CSV codec is the
adapters' only registered format, adapters/src/format/csv.rs:17-170).

Spark-first: ``spark.read.{csv,json,parquet}`` already are distributed,
schema-aware, predicate-pushdown-capable sources; the only engine-specific
part is lifting rows into the Z-set convention (weight column) and, for
sinks, consolidating before write so a file never contains zero-weight or
duplicate-unmerged rows (the reference's ``consolidate()`` merge on output,
output.rs:130-219).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from database_stream_processor_spark.zset import WEIGHT_COL, ZSetFrame


def read_csv(spark: SparkSession, path: str, schema=None,
             header: bool = True, weight: int = 1, **options) -> ZSetFrame:
    """CSV file → Z-set (``CsvSource``, src/operator/csv.rs:1-138).

    Pass an explicit ``schema`` in production — inference scans the data
    twice and infers per-file at 100 TB.
    """
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return ZSetFrame.from_df(reader.csv(path), weight)


def read_json(spark: SparkSession, path: str, schema=None,
              weight: int = 1, **options) -> ZSetFrame:
    """Newline-delimited JSON file → Z-set (adapters format registry is
    CSV-only, format/mod.rs:15-20 — JSON comes free with Spark)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return ZSetFrame.from_df(reader.json(path), weight)


def read_parquet(spark: SparkSession, path: str, weight: int = 1) -> ZSetFrame:
    """Parquet → Z-set.  The scale-path default: columnar, predicate
    pushdown, partition pruning all free."""
    return ZSetFrame.from_df(spark.read.parquet(path), weight)


def write_zset(z: ZSetFrame, path: str, fmt: str = "parquet",
               mode: str = "overwrite", partition_by=None, **options) -> None:
    """File sink: consolidate, then write rows + weight column.

    A written Z-set round-trips through :func:`read_zset`; weights are
    preserved so retraction streams can be persisted (the reference encodes
    weights in its CSV output too, adapters/src/format/csv.rs:17-170).
    """
    df = z.consolidate().df
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    getattr(writer, fmt)(path)


def read_zset(spark: SparkSession, path: str, fmt: str = "parquet",
              **options) -> ZSetFrame:
    """Read back a Z-set persisted by :func:`write_zset` (weight column
    already present)."""
    df = getattr(spark.read.options(**options), fmt)(path)
    if WEIGHT_COL not in df.columns:
        raise ValueError(f"{path} is not a persisted Z-set (no {WEIGHT_COL})")
    return ZSetFrame(df)


class OutputHandle:
    """Sink handle (output.rs:29,130-219): accumulates per-step output
    deltas; ``consolidate()`` merges them into the current integrated
    output — the reference's merge of per-worker batches, expressed as one
    hash aggregation."""

    def __init__(self, snapshot_fn=None):
        self._deltas: list[ZSetFrame] = []
        #: stateful circuit nodes provide a snapshot of their integrated
        #: output (the trace); reading it beats re-merging the delta log
        #: (output.rs:130-219 consolidates from the integrated batch)
        self._snapshot_fn = snapshot_fn

    def push(self, delta: ZSetFrame) -> None:
        self._deltas.append(delta)

    def consolidate(self) -> ZSetFrame:
        if self._snapshot_fn is not None:
            snap = self._snapshot_fn()
            if snap is not None:
                return snap.consolidate()
        if not self._deltas:
            raise ValueError("no output pushed")
        return ZSetFrame.sum(self._deltas).consolidate()

    @property
    def last_delta(self) -> ZSetFrame | None:
        """The most recent per-step delta (None before the first push)."""
        return self._deltas[-1] if self._deltas else None

    def to_rows(self) -> DataFrame:
        """Positive-weight bag expansion of the integrated output."""
        return self.consolidate().rows()

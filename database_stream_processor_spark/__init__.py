"""database_stream_processor_spark — a PySpark-native incremental analytics engine.

A from-scratch re-expression of the capabilities of
vmware-archive/database-stream-processor (DBSP) on Apache Spark:

- **Z-set data model**: every relation is a DataFrame carrying an integer
  ``weight`` column (positive = insert/multiplicity, negative = retraction).
  See :mod:`~database_stream_processor_spark.zset`.
- **Operator library**: linear ops (filter/map/flat_map), joins
  (inner/semi/anti/outer/range/as-of), aggregates (linear + retraction-correct
  non-linear), set ops, top-k, time-series windows and rolling aggregates.
- **Incremental layer**: a circuit/step driver that consumes per-step input
  deltas and emits output deltas, maintaining integrated state as partitioned
  tables (DBSP's integrate/differentiate/trace calculus re-expressed as
  Spark state tables).  See :mod:`~database_stream_processor_spark.plans`.
- **Structured Streaming bindings**: readStream → deltas, foreachBatch →
  step driver.  See :mod:`~database_stream_processor_spark.streaming`.
- **LLM-data-pipeline operators**: dedup (exact/MinHash-LSH/SimHash),
  similarity search, text analysis, multimodal column plumbing.
  See :mod:`~database_stream_processor_spark.functions`.

Everything is declarative DataFrame/SQL so Catalyst + AQE choose physical
strategies (broadcast vs shuffle joins, partial aggregation, skew handling);
no driver-side row loops anywhere in the hot path.
"""

from database_stream_processor_spark.circuit import Circuit
from database_stream_processor_spark.session import get_spark
from database_stream_processor_spark.zset import WEIGHT_COL, ZSetFrame

__all__ = ["Circuit", "WEIGHT_COL", "ZSetFrame", "get_spark"]

__version__ = "0.1.0"

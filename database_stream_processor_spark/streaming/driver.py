"""Step drivers: the clock for the incremental operator layer.

Reference analogs:

- ``DBSPHandle::step()`` (crates/dbsp/src/circuit/dbsp_handle.rs:246) —
  one clock tick: feed input deltas, run the circuit, collect output deltas.
  Here: :meth:`StepDriver.step`.
- The adapters controller (crates/adapters/src/lib.rs:12-40) wires
  transport → parser → input handle → circuit → encoder → output.  Here:
  :func:`foreach_batch_driver` wires a Structured Streaming query's
  micro-batches into the same step function, so one pipeline definition runs
  identically in batch-incremental and streaming modes.

Scale notes: the step function is pure DataFrame code; ``foreachBatch``
hands us the micro-batch as a DataFrame on the cluster (never driver rows).
State lives in the operators' :class:`StateTable`\\ s — partitioned parquet
at cluster scale.  Exactly-once = checkpointLocation (source offsets) +
idempotent state epochs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from database_stream_processor_spark.zset import ZSetFrame


class StepDriver:
    """Drives a circuit of incremental operators one tick at a time.

    ``circuit`` is a callable ``(ZSetFrame) -> ZSetFrame`` composed from the
    operator objects in :mod:`plans.incremental` (their ``step`` methods).
    The driver lifts plain input batches into Z-set deltas, applies the
    circuit, and optionally pushes outputs into an
    :class:`~database_stream_processor_spark.sources.files.OutputHandle`.
    """

    def __init__(self, circuit: Callable[[ZSetFrame], ZSetFrame],
                 output_handle=None, input_weight: int = 1):
        self.circuit = circuit
        self.output_handle = output_handle
        self.input_weight = input_weight
        self.ticks = 0

    def step(self, batch: DataFrame | ZSetFrame) -> ZSetFrame:
        delta_in = (batch if isinstance(batch, ZSetFrame)
                    else ZSetFrame.from_df(batch, self.input_weight))
        delta_out = self.circuit(delta_in)
        if self.output_handle is not None:
            self.output_handle.push(delta_out)
        self.ticks += 1
        return delta_out


def foreach_batch_driver(driver: StepDriver,
                         on_delta: Callable[[DataFrame, int], None] | None = None):
    """Adapt a :class:`StepDriver` to ``writeStream.foreachBatch``.

    Usage::

        q = (stream_df.writeStream
             .foreachBatch(foreach_batch_driver(driver, sink_fn))
             .option("checkpointLocation", ckpt)
             .start())

    Each micro-batch is one clock tick; ``on_delta(delta_df, epoch)``
    receives the output delta (with the weight column) — write it to a
    changelog table, MERGE it into a serving table, or push to Kafka.
    """

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        delta = driver.step(batch_df)
        if on_delta is not None:
            on_delta(delta.df, epoch_id)

    return _process

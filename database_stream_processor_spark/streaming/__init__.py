"""Structured Streaming bindings (reference: SURVEY.md §3.1 step loop,
crates/dbsp/src/circuit/dbsp_handle.rs ``DBSPHandle::step``; §2.9 time
series).

The reference's runtime is a step loop: push input deltas, tick the circuit,
drain output deltas.  On Spark the same operator objects
(:mod:`~database_stream_processor_spark.plans.incremental`) are driven
either by a plain Python loop (tests / batch-incremental jobs) or by
Structured Streaming ``foreachBatch`` — each micro-batch is one clock tick.
"""

from database_stream_processor_spark.streaming.driver import (
    StepDriver,
    foreach_batch_driver,
)
from database_stream_processor_spark.streaming.joins import (
    stream_stream_join,
)
from database_stream_processor_spark.streaming.stateful import (
    latest_per_key,
    running_linear_agg,
)

__all__ = ["StepDriver", "foreach_batch_driver", "latest_per_key",
           "running_linear_agg", "stream_stream_join"]

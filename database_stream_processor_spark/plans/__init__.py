"""Incremental-view-maintenance layer: the step/clock driver and the
incremental forms of each operator (reference: the DBSP calculus,
SURVEY.md §2.8)."""

from database_stream_processor_spark.plans.incremental import (
    AggregateOp,
    Apply2Op,
    DifferentiateOp,
    DistinctOp,
    HoppingWindowOp,
    IntegrateOp,
    JoinOp,
    LinearAggregateOp,
    LinearOp,
    MonotonicStreamJoinOp,
    PartitionedRollingAggregateOp,
    StateTable,
    StreamFoldOp,
    TumblingWindowOp,
    UpsertOp,
    WindowOp,
    Z1Op,
)

__all__ = [
    "AggregateOp",
    "Apply2Op",
    "DifferentiateOp",
    "DistinctOp",
    "HoppingWindowOp",
    "IntegrateOp",
    "JoinOp",
    "LinearAggregateOp",
    "LinearOp",
    "MonotonicStreamJoinOp",
    "PartitionedRollingAggregateOp",
    "StateTable",
    "StreamFoldOp",
    "TumblingWindowOp",
    "UpsertOp",
    "WindowOp",
    "Z1Op",
]

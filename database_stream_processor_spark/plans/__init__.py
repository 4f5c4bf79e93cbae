"""Incremental-view-maintenance layer: the step/clock driver and the
incremental forms of each operator (reference: the DBSP calculus,
SURVEY.md §2.8)."""

from database_stream_processor_spark.plans.incremental import (
    AggregateOp,
    Apply2Op,
    DifferentiateOp,
    DistinctOp,
    IntegrateOp,
    JoinOp,
    LinearAggregateOp,
    LinearOp,
    PartitionedRollingAggregateOp,
    StateTable,
    StreamFoldOp,
    UpsertOp,
    Z1Op,
)

__all__ = [
    "AggregateOp",
    "Apply2Op",
    "DifferentiateOp",
    "DistinctOp",
    "IntegrateOp",
    "JoinOp",
    "LinearAggregateOp",
    "LinearOp",
    "PartitionedRollingAggregateOp",
    "StateTable",
    "StreamFoldOp",
    "UpsertOp",
    "Z1Op",
]

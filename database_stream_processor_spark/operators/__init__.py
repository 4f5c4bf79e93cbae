"""Relational + time-series operator library (SURVEY.md §2.4-2.9).

Everything here is a *composition of built-in DataFrame operators* so
Catalyst plans it (broadcast vs shuffle, pushdown, codegen); Python/Pandas
UDFs appear only where Spark genuinely lacks the semantics (none so far —
multimodal decode stubs live in functions/multimodal.py).
"""

from database_stream_processor_spark.operators.asof import asof_join
from database_stream_processor_spark.operators.recursive import (
    Delta0,
    fixpoint,
    iterate_until,
    transitive_closure,
)
from database_stream_processor_spark.operators.windows import (
    hopping_window,
    rolling_aggregate,
    topk_per_group,
    tumbling_window,
    watermark_monotonic,
    window_range,
)

__all__ = [
    "Delta0",
    "asof_join",
    "fixpoint",
    "iterate_until",
    "hopping_window",
    "rolling_aggregate",
    "topk_per_group",
    "transitive_closure",
    "tumbling_window",
    "watermark_monotonic",
    "window_range",
]

"""Ordered-fold aggregate builders — the reference's arbitrary-UDAF
surface ``Fold { init, step, output }`` (crates/dbsp/src/operator/
aggregate/fold.rs:25-101), used by its capped-vec aggregates (nexmark
q18.rs:37-50 latest bid, q19.rs:40-55 top-10 prices per auction).

Spark-first re-expression: the fold runs entirely JVM-side as
``collect_list → sort_array → F.aggregate(init, step[, finish])`` — a true
sequential fold over the group's rows in a deterministic order, with the
lambda compiled to Catalyst expressions (no Python in the loop).  The
resulting Column drops into ``ZSetFrame.aggregate`` / ``AggregateOp`` like
any built-in aggregate, giving the incremental retraction-correct form via
touched-group recompute.

Scale note: a fold materializes each group as an array, so it is for
groups that fit in executor memory (the reference's Fold has the same
shape — it iterates a group's values).  For bounded outputs prefer
:func:`fold_topk`, which caps the array immediately after sorting.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def fold(row: Column, init: Column,
         step: Callable[[Column, Column], Column],
         finish: Callable[[Column], Column] | None = None) -> Column:
    """Aggregate Column folding a group's rows in deterministic order.

    ``row`` is a struct expression per input row; its *field order* defines
    the fold order (``sort_array`` sorts structs lexicographically by
    field).  ``step(acc, row) -> acc`` and optional ``finish(acc)`` mirror
    fold.rs's ``step``/``output``.
    """
    arr = F.sort_array(F.collect_list(row))
    if finish is not None:
        return F.aggregate(arr, init, step, finish)
    return F.aggregate(arr, init, step)


def fold_topk(row: Column, k: int, desc: bool = True) -> Column:
    """Capped-vec fold: the k greatest (or least) row-structs per group —
    the reference's bounded Fold accumulator (q19.rs:40-55 keeps ≤10
    prices).  Returns an array<struct> Column of length ≤ k."""
    arr = F.sort_array(F.collect_list(row), asc=not desc)
    return F.slice(arr, 1, k)


def fold_latest(row: Column) -> Column:
    """max-by fold: the greatest row-struct per group — the degenerate
    capped fold the reference uses for "latest bid" (q18.rs:37-50: fold
    keeping the max (ts, …) pair).  ``max(struct)`` is the k=1 case of
    :func:`fold_topk` and Catalyst evaluates it as a single-pass max —
    no array materialization at all."""
    return F.max(row)

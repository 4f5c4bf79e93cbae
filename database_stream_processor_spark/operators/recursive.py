"""Recursion to fixpoint — the reference's ``recursive(f)`` operator
(src/operator/recursive.rs:255: feedback z1 + distinct + iterate-to-fixpoint
+ export; scheduler fixedpoint circuit_builder.rs:334).

Spark has no native fixpoint primitive, so this is a driver loop over
DataFrames: seed → iterate ``distinct(f(acc))`` until no new rows.  The
``distinct`` in the loop is what guarantees termination on monotone ``f``
(recursive.rs:14-21) — we enforce set semantics every iteration.

Scale notes: each iteration is a distributed join/union plan; we
``localCheckpoint`` per iteration to cut lineage (the Spark analog of the
reference's per-iteration trace consolidation).  Semi-naive evaluation is
used for transitive closure: only the frontier (new paths) joins the edge
set each round, so per-iteration cost ∝ |new facts| — the same cost claim
DBSP makes for its nested-clock recursion.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def fixpoint(seed: DataFrame, step: Callable[[DataFrame], DataFrame],
             max_iterations: int = 100) -> DataFrame:
    """Iterate ``acc ∪ distinct(step(acc))`` until fixpoint.

    ``step`` maps the accumulated relation to newly derivable rows (it need
    not dedup against ``acc``; we do).  Naive evaluation — prefer a
    semi-naive formulation (pass only the frontier) for deep recursions,
    as :func:`transitive_closure` does.
    """
    acc = seed.dropDuplicates().localCheckpoint(eager=True)
    for _ in range(max_iterations):
        new = step(acc).dropDuplicates().exceptAll(acc)
        new = new.localCheckpoint(eager=True)
        if new.isEmpty():
            return acc
        acc = acc.unionByName(new).localCheckpoint(eager=True)
    raise RuntimeError(f"fixpoint did not converge in {max_iterations} iterations")


def transitive_closure(edges: DataFrame, src: str = "src", dst: str = "dst",
                       max_iterations: int = 100) -> DataFrame:
    """All (src, dst) pairs connected by a directed path — the reference's
    canonical recursion workload (benches/path.rs transitive closure;
    examples/degrees.rs).

    Semi-naive: per round, join only the *frontier* (paths found last round)
    with the edge relation, then subtract already-known paths.  Iterations =
    graph diameter; each is one join + one distinct (two shuffles) on the
    cluster, never driver-side.
    """
    edges = edges.select(src, dst).dropDuplicates().localCheckpoint(eager=True)
    acc = edges
    frontier = edges
    for _ in range(max_iterations):
        # frontier(src, mid) ⋈ edges(mid, dst) → new paths
        stepped = (
            frontier.withColumnRenamed(dst, "__mid")
            .join(edges.withColumnRenamed(src, "__mid"), on="__mid")
            .select(src, dst)
            .dropDuplicates()
        )
        frontier = stepped.exceptAll(acc).localCheckpoint(eager=True)
        if frontier.isEmpty():
            return acc
        acc = acc.unionByName(frontier).localCheckpoint(eager=True)
    raise RuntimeError(f"transitive_closure did not converge in {max_iterations} iterations")


def iterate_until(seed: DataFrame, step: Callable[[DataFrame], DataFrame],
                  condition: Callable[[DataFrame], bool],
                  max_iterations: int = 100) -> DataFrame:
    """``iterate_with_condition`` (src/operator/condition.rs:22-100): apply
    ``step`` repeatedly until ``condition(current)`` holds.  The general
    form of :func:`fixpoint` for non-monotone iterations (e.g. numeric
    convergence); the caller's condition is responsible for termination."""
    acc = seed.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        if condition(acc):
            return acc
        acc = step(acc).localCheckpoint(eager=True)
    raise RuntimeError(f"iterate_until did not converge in {max_iterations} iterations")

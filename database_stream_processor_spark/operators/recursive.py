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


class IncrementalTransitiveClosureOp:
    """Maintain a transitive closure under edge *deltas* — the reference's
    incremental recursion (recursive.rs:255 exports the recursive view for
    incremental maintenance under input deltas; nested clock
    src/time/mod.rs:20-48 runs the inner fixpoint per outer input tick).

    Edge insertions use the frontier algorithm: new paths must route
    through at least one inserted edge, so the seed is
    ``(I ∪ TC_old) ∘ ΔE ∘ (I ∪ TC_old)`` and the semi-naive loop closes it
    against the growing closure — per-tick cost ∝ |new paths|, never a
    full recompute.  Edge deletions fall back to recomputing the closure
    of the updated edge set and diffing (DRed-style over-delete/re-derive
    would bound that too; the fallback is correct and the common
    insert-only path stays O(Δ)).

    ``step`` takes a Z-set edge delta (weights +1 insert / −1 delete) and
    returns the Z-set delta of closure pairs.  State (edge set + closure
    set) lives in DataFrames materialized per tick, never on the driver.
    """

    def __init__(self, spark, src: str = "src", dst: str = "dst",
                 max_iterations: int = 100):
        self.src, self.dst = src, dst
        self.max_iterations = max_iterations
        schema = f"{src} long, {dst} long"
        self._edges = spark.createDataFrame([], schema)
        self._tc = spark.createDataFrame([], schema)

    def _compose(self, left: DataFrame, right: DataFrame) -> DataFrame:
        src, dst = self.src, self.dst
        return (left.withColumnRenamed(dst, "__mid")
                .join(right.withColumnRenamed(src, "__mid"), on="__mid")
                .select(src, dst).dropDuplicates())

    def step(self, edge_delta) -> "object":
        from database_stream_processor_spark.zset import ZSetFrame
        src, dst = self.src, self.dst
        d = edge_delta.consolidate()
        inserts = (d.df.filter(d.weight > 0).select(src, dst)
                   .exceptAll(self._edges).dropDuplicates())
        deletes = (d.df.filter(d.weight < 0).select(src, dst)
                   .intersect(self._edges))

        if deletes.isEmpty():
            added = inserts.localCheckpoint(eager=True)
            self._edges = (self._edges.unionByName(added)
                           .localCheckpoint(eager=True))
            # seed: every path using exactly one new edge (old-path prefix/
            # suffix); multi-new-edge paths emerge from the closure loop
            # (I ∪ TC_old) ∘ ΔE — prefix reaches a new edge's source
            pre = self._compose(self._tc, added).unionByName(added)
            # … ∘ (I ∪ TC_old) — suffix continues from the new edge's dst
            seed = self._compose(pre, self._tc).unionByName(pre)
            frontier = (seed.dropDuplicates().exceptAll(self._tc)
                        .localCheckpoint(eager=True))
            acc = self._tc
            new_pairs = frontier
            for _ in range(self.max_iterations):
                if frontier.isEmpty():
                    break
                acc = acc.unionByName(frontier).localCheckpoint(eager=True)
                stepped = (self._compose(frontier, acc)
                           .unionByName(self._compose(acc, frontier))
                           .dropDuplicates())
                frontier = (stepped.exceptAll(acc)
                            .localCheckpoint(eager=True))
                new_pairs = new_pairs.unionByName(frontier)
            else:
                raise RuntimeError("incremental TC did not converge")
            self._tc = acc
            return ZSetFrame.from_df(new_pairs.dropDuplicates(), 1)

        # deletion path: recompute-and-diff fallback
        self._edges = (self._edges.exceptAll(deletes).unionByName(inserts)
                       .dropDuplicates().localCheckpoint(eager=True))
        new_tc = transitive_closure(self._edges, src, dst,
                                    self.max_iterations)
        out = (ZSetFrame.from_df(new_tc.exceptAll(self._tc), 1)
               .plus(ZSetFrame.from_df(self._tc.exceptAll(new_tc), -1)))
        self._tc = new_tc.localCheckpoint(eager=True)
        return out.consolidate()

    @property
    def current(self) -> DataFrame:
        """The maintained closure (set semantics)."""
        return self._tc


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

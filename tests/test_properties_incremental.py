"""Property-based inc == batch checks for the round-2 operators — the
reference's proptest idiom (distinct.rs:164-220, rolling_aggregate.rs:
826-960) applied to maintained windows, linear rolling aggregates, and
incremental closure: hypothesis-generated delta sequences (including
retractions and cancellations) fed step-by-step; after every step the
integrated output must equal the batch operator over the integrated
input."""

from __future__ import annotations

import pytest

import datetime as dt
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from database_stream_processor_spark.operators.recursive import (
    IncrementalTransitiveClosureOp,
    transitive_closure,
)
from database_stream_processor_spark.operators.windows import (
    rolling_aggregate,
    tumbling_window,
)
from database_stream_processor_spark.plans.incremental import (
    PartitionedRollingAggregateLinearOp,
    TumblingWindowOp,
)
from database_stream_processor_spark.zset import WEIGHT_COL, ZSetFrame
from tests.conftest import zset_to_dict

SETTINGS = settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture])

# (key, ts-seconds, value, weight) — small domains force collisions,
# retractions, and weight cancellations
ev = st.tuples(st.integers(0, 1), st.integers(0, 40), st.integers(0, 2),
               st.integers(-2, 2))
batches = st.lists(st.lists(ev, min_size=0, max_size=6),
                   min_size=1, max_size=3)

T0 = dt.datetime(2026, 1, 1)


def _zset(spark, rows):
    return ZSetFrame(spark.createDataFrame(
        [(k, T0 + dt.timedelta(seconds=s), float(v), w)
         for k, s, v, w in rows],
        f"k int, ts timestamp, v double, {WEIGHT_COL} long"))


def _net(rows):
    m = defaultdict(int)
    for k, s, v, w in rows:
        m[(k, s, v)] += w
    return m


def _bag_df(spark, net):
    rows = [(k, T0 + dt.timedelta(seconds=s), float(v))
            for (k, s, v), w in net.items() for _ in range(max(w, 0))]
    return spark.createDataFrame(rows, "k int, ts timestamp, v double")


@given(bs=batches)
@SETTINGS
def test_tumbling_inc_equals_batch(spark, bs):
    empty = ZSetFrame(_zset(spark, []).df.limit(0))
    op = TumblingWindowOp(empty, "ts", 10, ["k"],
                          {"n": F.lit(1), "s": F.col("v")})
    seen = []
    for rows in bs:
        seen.extend(rows)
        op.step(_zset(spark, rows))
        net = _net(seen)
        if any(w < 0 for w in net.values()):
            return  # negative net multiplicity: batch bag undefined
        batch = tumbling_window(_bag_df(spark, net), "ts", 10, ["k"],
                                F.count(F.lit(1)).alias("n"),
                                F.sum("v").alias("s"))
        want = {tuple(r): 1 for r in batch.collect()}
        assert zset_to_dict(op.current_output.consolidate()) == want


@given(bs=batches)
@SETTINGS
@pytest.mark.slow
def test_linear_rolling_inc_equals_batch(spark, bs):
    empty = ZSetFrame(_zset(spark, []).df.limit(0))
    op = PartitionedRollingAggregateLinearOp(
        empty, "k", "ts", before=15, after=5,
        aggs={"s": F.col("v"), "n": F.lit(1)})
    seen = []
    for rows in bs:
        seen.extend(rows)
        op.step(_zset(spark, rows))
        net = _net(seen)
        if any(w < 0 for w in net.values()):
            return
        batch = rolling_aggregate(_bag_df(spark, net), ["k"], "ts", 15, 5,
                                  s=F.sum("v"), n=F.count(F.lit(1)))
        want = defaultdict(int)
        for r in batch.collect():
            k, ts, v, s, n = tuple(r)
            want[(k, ts, v, float(s), int(n))] += 1
        got = {(k, ts, v, float(s), int(n)): w
               for (k, ts, v, s, n), w in
               zset_to_dict(op.current_output.consolidate()).items()}
        assert got == dict(want)


bounds_seq = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).map(
        lambda p: (min(p), max(p) + 1)),
    min_size=1, max_size=3).map(
    lambda bs: sorted(bs, key=lambda b: b[0]))  # monotone lower bound


@given(bs=batches, bnds=bounds_seq)
@SETTINGS
def test_window_op_contents_equal_batch_filter(spark, bs, bnds):
    """WindowOp's integrated content deltas == a plain range filter over
    the integrated input at the final bounds (window.rs:75)."""
    from database_stream_processor_spark.plans.incremental import WindowOp
    empty = ZSetFrame(_zset(spark, []).df.limit(0))
    op = WindowOp(empty, "ts")
    base = int(T0.timestamp())
    out, seen = None, []
    for rows, (lo, hi) in zip(bs, bnds):
        seen.extend(rows)
        d = op.step(_zset(spark, rows), (base + lo, base + hi))
        out = d if out is None else out.plus(d)
    lo, hi = bnds[min(len(bs), len(bnds)) - 1]
    want = {(k, s, v): w for (k, s, v), w in _net(seen).items()
            if w != 0 and lo <= s < hi}
    got = {(k, int((ts - T0).total_seconds()), v): w
           for (k, ts, v), w in zset_to_dict(out.consolidate()).items()}
    assert got == want


edge = st.tuples(st.integers(0, 4), st.integers(0, 4))
edge_batches = st.lists(
    st.tuples(st.sampled_from([1, -1]),
              st.lists(edge, min_size=0, max_size=4)),
    min_size=1, max_size=3)


@given(bs=edge_batches)
@SETTINGS
def test_incremental_closure_equals_batch(spark, bs):
    op = IncrementalTransitiveClosureOp(spark, max_iterations=30)
    acc = None
    edges: set = set()
    for w, pairs in bs:
        pairs = [p for p in pairs if p[0] != p[1]]  # no self-loops
        if w > 0:
            eff = [p for p in pairs if p not in edges]
            edges |= set(eff)
        else:
            eff = [p for p in pairs if p in edges]
            edges -= set(eff)
        if not eff:
            continue
        df = spark.createDataFrame(eff, "src long, dst long")
        d = op.step(ZSetFrame.from_df(df, w))
        acc = d if acc is None else acc.plus(d)
        if edges:
            e_df = spark.createDataFrame(sorted(edges), "src long, dst long")
            want = {tuple(r): 1 for r in
                    transitive_closure(e_df, max_iterations=30).collect()}
        else:
            want = {}
        assert zset_to_dict(acc.consolidate()) == want
        assert {tuple(r) for r in op.current.collect()} == set(want)


@given(bs=st.lists(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 3),
                       st.integers(-2, 2)),
             min_size=0, max_size=6),
    min_size=1, max_size=3))
@SETTINGS
@pytest.mark.slow
def test_sql_engine_lowered_views_equal_recompute(spark, bs):
    """Property: hypothesis-generated weighted delta sequences (with
    retractions and cancellations) through the SQL engine keep EVERY
    lowered view strategy — distinct, left/full join, global agg,
    union — equal to the batch recompute over the integrated tables."""
    from database_stream_processor_spark.sql import Engine
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v INTEGER);
        CREATE TABLE d (k INTEGER NOT NULL, tag VARCHAR);
        CREATE VIEW dis as SELECT DISTINCT k, v FROM t;
        CREATE VIEW lj as SELECT x.k, x.v, y.tag
            FROM t x LEFT JOIN d y ON x.k = y.k;
        CREATE VIEW fj as SELECT x.v, y.tag
            FROM t x FULL OUTER JOIN d y ON x.k = y.k;
        CREATE VIEW glob as SELECT COUNT(*) AS n, SUM(v) AS s FROM t;
        CREATE VIEW un as SELECT k, v FROM t UNION
            SELECT k, k AS v FROM d;
    """)
    assert eng.view_strategy("dis") == "distinct"
    assert eng.view_strategy("lj") == "left_join"
    assert eng.view_strategy("fj") == "full_join"
    assert eng.view_strategy("glob") == "global_agg"
    assert eng.view_strategy("un") == "union"

    # maintain python-side multisets of both tables for the oracle
    t_rows: dict = defaultdict(int)
    d_rows: dict = defaultdict(int)
    tags = ["a", "b"]
    t_touched = False
    for i, batch in enumerate(bs):
        t_batch = [(k, v, w) for k, v, w in batch]
        d_batch = [(k, tags[v % 2], -w if i % 2 else w)
                   for k, v, w in batch[:3]]
        for k, v, w in t_batch:
            t_rows[(k, v)] += w
        for k, tag, w in d_batch:
            d_rows[(k, tag)] += w
        # clamp: tables must stay valid bags (no negative multiplicity)
        for rows, frame in ((t_rows, None), (d_rows, None)):
            for key in [r for r, w in rows.items() if w < 0]:
                rows[key] = 0
        # push exactly the deltas that produce the clamped state
        def push(table, want, schema):
            cur2 = defaultdict(int)
            for row in eng.tables[table].current.consolidate().df.collect():
                data = tuple(row[c] for c in
                             eng.tables[table].current.data_columns)
                cur2[data] += row[WEIGHT_COL]
            deltas = []
            for key in set(want) | set(cur2):
                dw = want.get(key, 0) - cur2.get(key, 0)
                if dw:
                    deltas.append((*key, dw))
            if deltas:
                eng.push(table, ZSetFrame(spark.createDataFrame(
                    deltas, schema + f", {WEIGHT_COL} long")))
        push("t", t_rows, "k int, v int")
        push("d", d_rows, "k int, tag string")
        t_touched = t_touched or bool(eng._pending["t"])
        eng.step()

        vt, vd = eng.view("t"), eng.view("d")
        checks = {
            "dis": vt.select("k", "v").distinct(),
            "lj": (vt.alias("x").join(vd.alias("y"),
                                      on=[F.expr("x.k = y.k")], how="left")
                   .select("x.k", "x.v", "y.tag")),
            "fj": (vt.alias("x").join(vd.alias("y"),
                                      on=[F.expr("x.k = y.k")], how="full")
                   .select("x.v", "y.tag")),
            "glob": vt.agg(F.count(F.lit(1)).alias("n"),
                           F.sum("v").alias("s")),
            "un": (vt.select("k", "v")
                   .union(vd.selectExpr("k", "k AS v")).distinct()),
        }
        for name, batch_df in checks.items():
            if name == "glob" and not t_touched:
                # SQL's empty-group row only exists once the view's
                # source has been touched (engine views start empty)
                assert eng.view(name).count() == 0
                continue
            from collections import Counter
            want = Counter(tuple(r) for r in batch_df.collect())
            got = Counter(tuple(r) for r in eng.view(name).collect())
            assert got == want, (name, i)


@given(bs=batches)
@SETTINGS
@pytest.mark.slow
def test_sql_engine_round4_views_equal_recompute(spark, bs):
    """Property: hypothesis-generated weighted delta sequences through
    the round-4 lowerings — [NOT] EXISTS / IN filters, per-group and
    global top-k, 3-table join chain ± GROUP BY, COUNT(DISTINCT) — keep
    every maintained view equal to the batch recompute over the
    integrated tables after every tick."""
    from database_stream_processor_spark.sql import Engine
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v INTEGER);
        CREATE TABLE d (k INTEGER NOT NULL, tag VARCHAR);
        CREATE TABLE s (tag VARCHAR, grp INTEGER);
        CREATE VIEW ex as SELECT x.k, x.v FROM t x
            WHERE EXISTS (SELECT 1 FROM d y WHERE y.k = x.k);
        CREATE VIEW nex as SELECT x.v FROM t x
            WHERE NOT EXISTS (SELECT 1 FROM d y WHERE y.k = x.k);
        CREATE VIEW ink as SELECT x.k FROM t x
            WHERE k IN (SELECT k FROM d);
        CREATE VIEW gtk as SELECT k, v FROM (
            SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k
                                            ORDER BY v DESC) AS rn
            FROM t) x WHERE rn <= 2;
        CREATE VIEW gtop as SELECT k, v FROM t ORDER BY v DESC, k LIMIT 3;
        CREATE VIEW mj as SELECT x.v, y.tag, z.grp
            FROM t x JOIN d y ON x.k = y.k JOIN s z ON y.tag = z.tag;
        CREATE VIEW mja as SELECT z.grp, COUNT(*) AS n, SUM(x.v) AS sv
            FROM t x JOIN d y ON x.k = y.k JOIN s z ON y.tag = z.tag
            GROUP BY z.grp;
        CREATE VIEW da as SELECT k, COUNT(DISTINCT v) AS nv,
                                 COUNT(*) AS n
            FROM t GROUP BY k;
    """)
    strategies = {"ex": "exists", "nex": "not_exists", "ink": "in",
                  "gtk": "group_topk", "gtop": "global_topk",
                  "mj": "multi_join", "mja": "multi_join_agg",
                  "da": "distinct_agg"}
    for view, want in strategies.items():
        assert eng.view_strategy(view) == want, view

    t_rows: dict = defaultdict(int)
    d_rows: dict = defaultdict(int)
    s_rows: dict = defaultdict(int)
    tags = ["a", "b"]
    for i, batch in enumerate(bs):
        for k, ts_, v, w in batch:
            t_rows[(k, v)] += w
        for k, ts_, v, w in batch[:3]:
            d_rows[(k, tags[v % 2])] += -w if i % 2 else w
        for k, ts_, v, w in batch[:2]:
            s_rows[(tags[(k + v) % 2], v % 2)] += w
        for rows in (t_rows, d_rows, s_rows):
            for key in [r for r, w in rows.items() if w < 0]:
                rows[key] = 0

        def push(table, want, schema):
            cur2 = defaultdict(int)
            for row in eng.tables[table].current.consolidate().df.collect():
                data = tuple(row[c] for c in
                             eng.tables[table].current.data_columns)
                cur2[data] += row[WEIGHT_COL]
            deltas = []
            for key in set(want) | set(cur2):
                dw = want.get(key, 0) - cur2.get(key, 0)
                if dw:
                    deltas.append((*key, dw))
            if deltas:
                eng.push(table, ZSetFrame(spark.createDataFrame(
                    deltas, schema + f", {WEIGHT_COL} long")))
        push("t", t_rows, "k int, v int")
        push("d", d_rows, "k int, tag string")
        push("s", s_rows, "tag string, grp int")
        eng.step()

        for view in strategies:
            want_rows = sorted(
                tuple(r) for r in
                eng.spark.sql(eng.views[view]).collect())
            got = sorted(tuple(r) for r in eng.view(view).collect())
            assert got == want_rows, (i, view)

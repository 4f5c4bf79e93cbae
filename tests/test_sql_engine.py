"""SQL front-door tests — the reference's demo-script surface
(demo/project_demo0{0,1,2,3}/project.sql constructs) run through Engine,
plus incremental view maintenance with a retraction round."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from database_stream_processor_spark.sql import Engine
from tests.conftest import zset_to_dict

# Exercises the same dialect surface as the reference demos: FLOAT64,
# DOUBLE PRECISION, varchar, TIMESTAMP DDL types; a join view
# (project_demo01); ST_DISTANCE/ST_POINT + RANGE-frame window
# (project_demo02); EXTRACT(EPOCH/ISODOW) (project_demo03).
SCRIPT = """
CREATE TABLE demographics (
    cc_num FLOAT64 NOT NULL,
    first varchar,
    city varchar,
    lat DOUBLE PRECISION,
    long DOUBLE PRECISION
);

CREATE TABLE transactions (
    trans_ts TIMESTAMP NOT NULL,
    cc_num FLOAT64 NOT NULL,
    amt FLOAT64,
    merch_lat DOUBLE PRECISION,
    merch_long DOUBLE PRECISION
);

CREATE VIEW enriched as
    SELECT
        transactions.trans_ts,
        transactions.cc_num,
        demographics.first,
        demographics.city
    FROM transactions JOIN demographics
      ON transactions.cc_num = demographics.cc_num;

CREATE VIEW features as
    SELECT
        t.cc_num,
        ST_DISTANCE(ST_POINT(d.long, d.lat),
                    ST_POINT(t.merch_long, t.merch_lat)) AS distance,
        AVG(t.amt) OVER (
            PARTITION BY t.cc_num
            ORDER BY EXTRACT(EPOCH FROM t.trans_ts)
            RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING) AS avg_spend_pw,
        CASE WHEN EXTRACT(ISODOW FROM t.trans_ts) > 5 THEN 1 ELSE 0 END
            AS is_weekend
    FROM transactions t JOIN demographics d ON t.cc_num = d.cc_num;
"""


@pytest.fixture()
def engine(spark):
    eng = Engine(spark)
    eng.execute(SCRIPT)
    return eng


def _dem(spark, rows):
    return spark.createDataFrame(
        rows, "cc_num double, first string, city string, lat double, long double")


def _tx(spark, rows):
    return spark.createDataFrame(
        rows, "trans_ts timestamp, cc_num double, amt double, "
              "merch_lat double, merch_long double")


def test_ddl_creates_tables_and_views(engine):
    assert set(engine.tables) == {"demographics", "transactions"}
    assert set(engine.views) == {"enriched", "features"}
    assert engine.view("enriched").count() == 0


@pytest.mark.slow
def test_join_view_maintained_incrementally(spark, engine):
    import datetime as dt
    t0 = dt.datetime(2026, 8, 10, 12, 0)  # Monday
    engine.push("demographics", _dem(spark, [(1.0, "ann", "pdx", 45.5, -122.6)]))
    engine.push("transactions", _tx(spark, [(t0, 1.0, 10.0, 45.6, -122.7)]))
    d1 = engine.step()
    assert zset_to_dict(d1["enriched"]) == {(t0, 1.0, "ann", "pdx"): 1}

    # second step: new tx for same card → only the new row in the delta
    t1 = dt.datetime(2026, 8, 15, 12, 0)  # Saturday
    engine.push("transactions", _tx(spark, [(t1, 1.0, 30.0, 45.7, -122.8)]))
    d2 = engine.step()
    assert zset_to_dict(d2["enriched"]) == {(t1, 1.0, "ann", "pdx"): 1}

    feats = {(r["is_weekend"], round(r["avg_spend_pw"] or -1, 2))
             for r in engine.view("features").collect()}
    assert (0, -1) in feats          # first tx: empty frame, weekday
    assert (1, 10.0) in feats        # second tx: avg of prior week, weekend

    # retraction: remove the first transaction → view retracts its row
    engine.push("transactions", _tx(spark, [(t0, 1.0, 10.0, 45.6, -122.7)]),
                weight=-1)
    d3 = engine.step()
    assert zset_to_dict(d3["enriched"]) == {(t0, 1.0, "ann", "pdx"): -1}
    assert engine.view("enriched").count() == 1


def test_select_passthrough_and_macros(spark, engine):
    df = engine.execute(
        "SELECT ST_DISTANCE(ST_POINT(0.0, 0.0), ST_POINT(3.0, 4.0)) AS d, "
        "SPLIT_INDEX('a/b/c', '/', 1) AS p")
    row = df.collect()[0]
    assert row["d"] == 5.0 and row["p"] == "b"


def test_view_over_view(spark):
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v FLOAT64);
        CREATE VIEW base as SELECT k, v * 2 AS v2 FROM t;
        CREATE VIEW agg as SELECT k, SUM(v2) AS s FROM base GROUP BY k;
    """)
    eng.push("t", spark.createDataFrame([(1, 1.5), (1, 2.5), (2, 1.0)],
                                        "k int, v double"))
    out = eng.step()
    assert zset_to_dict(out["agg"]) == {(1, 8.0): 1, (2, 2.0): 1}


def test_view_lowering_strategies(spark, engine):
    """Simple shapes lower onto delta plans (SURVEY §3.2); the RANGE-frame
    window view over a join lowers onto the rolling operator through a
    synthesized hidden join view (demo02's flagship shape)."""
    assert engine.view_strategy("enriched") == "join"
    assert engine.view_strategy("features") == "rolling"
    assert engine.view_strategy("__features_src") == "join"
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v FLOAT64);
        CREATE VIEW pv as SELECT k, v * 2 AS v2 FROM t WHERE v > 0;
        CREATE VIEW av as SELECT k, SUM(v) AS s, COUNT(*) AS n
            FROM t WHERE v > 0 GROUP BY k;
    """)
    assert eng.view_strategy("pv") == "project"
    assert eng.view_strategy("av") == "linear_agg"


@pytest.mark.slow
def test_lowered_views_match_recompute_with_retractions(spark):
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v FLOAT64);
        CREATE VIEW pv as SELECT k, v * 2 AS v2 FROM t WHERE v > 0;
        CREATE VIEW av as SELECT k, SUM(v) AS s, COUNT(*) AS n
            FROM t WHERE v > 0 GROUP BY k;
    """)
    mk = lambda rows: spark.createDataFrame(rows, "k int, v double")
    batches = [
        (mk([(1, 1.0), (1, 2.0), (2, 3.0), (2, -9.0)]), 1),
        (mk([(3, 4.0)]), 1),
        (mk([(1, 1.0)]), -1),          # partial retraction
        (mk([(3, 4.0)]), -1),          # group 3 dies entirely
    ]
    for batch, w in batches:
        eng.push("t", batch, weight=w)
        eng.step()
        # maintained state == full recompute over the table's current rows
        t_rows = eng.view("t")
        want_pv = {tuple(r) for r in
                   t_rows.filter("v > 0")
                   .selectExpr("k", "v * 2 AS v2").collect()}
        assert {tuple(r) for r in eng.view("pv").collect()} == want_pv
        want_av = {tuple(r) for r in
                   t_rows.filter("v > 0").groupBy("k")
                   .agg(F.sum("v").alias("s"),
                        F.count(F.lit(1)).alias("n")).collect()}
        assert {tuple(r) for r in eng.view("av").collect()} == want_av


def test_lowered_view_plan_does_not_rescan_integral(spark, tmp_path):
    """The per-step delta plan for project and linear-agg views must read
    only the tick's delta (plus, for aggs, the per-group output state) —
    never the table integral.  Deltas are fed from parquet so they appear
    as parquet relations in the plan; any LogicalRDD is then
    checkpointed *state*."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v FLOAT64);
        CREATE VIEW pv as SELECT k, v * 2 AS v2 FROM t WHERE v > 0;
        CREATE VIEW av as SELECT k, SUM(v) AS s FROM t GROUP BY k;
    """)

    def mk(name, rows):
        p = str(tmp_path / name)
        spark.createDataFrame(rows, "k int, v double").write.parquet(p)
        return spark.read.parquet(p)

    eng.push("t", mk("b1", [(1, 1.0), (2, 3.0)]))
    eng.step()    # integral state now exists (checkpointed → LogicalRDD)

    eng.push("t", mk("b2", [(1, 5.0)]))
    deltas = eng.step()
    pv_plan = (deltas["pv"].df._jdf.queryExecution().optimizedPlan()
               .toString())
    assert "LogicalRDD" not in pv_plan        # delta-only: no state at all
    # the agg delta may read its *output* group state (∝ |groups|, joined
    # on touched keys) but never the input integral: the group state is
    # one checkpointed DataFrame, referenced at most twice (merge join +
    # touched-key semi-join)
    av_plan = (deltas["av"].df._jdf.queryExecution().optimizedPlan()
               .toString())
    assert av_plan.count("LogicalRDD") <= 2


REFERENCE_DEMOS = [
    "/root/reference/demo/project_demo00-SimpleSelect/project.sql",
    "/root/reference/demo/project_demo01-TimeSeriesEnrich/project.sql",
    # demo02-FraudDetection omitted: its view references a bare `cc_num`
    # that exists in BOTH joined tables — Calcite tolerates the ambiguity,
    # Spark's analyzer (correctly) rejects it.
    "/root/reference/demo/project_demo03-GreenTrip/project.sql",
    "/root/reference/demo/hello-world/combiner.sql",
]


@pytest.mark.parametrize("path", REFERENCE_DEMOS)
def test_reference_demo_scripts_execute_verbatim(spark, path):
    """SURVEY §7 Phase 4 acceptance: the reference's own demo SQL scripts
    (CREATE TABLE + CREATE VIEW pipelines) run through the front door
    unmodified."""
    import os
    if not os.path.exists(path):
        pytest.skip("reference checkout not present")
    eng = Engine(spark)
    eng.execute(open(path).read())
    assert eng.views, path
    for v in eng.views:
        assert eng.view(v).count() == 0  # analyzable & runnable while empty


def test_groupbyless_aggregate_never_evaluates_per_delta(spark):
    """SELECT COUNT(*)/SUM(x) FROM t (no GROUP BY) is NOT linear — it
    must never be evaluated per delta (which would emit per-tick counts
    instead of the total).  It lowers to the global running-partials
    maintainer, whose output matches the full recompute."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v FLOAT64);
        CREATE VIEW total as SELECT COUNT(*) AS c FROM t;
        CREATE VIEW tsum as SELECT SUM(v) AS s FROM t;
    """)
    assert eng.view_strategy("total") == "global_agg"
    assert eng.view_strategy("tsum") == "global_agg"
    mk = lambda rows: spark.createDataFrame(rows, "k int, v double")
    eng.push("t", mk([(1, 1.0), (2, 2.0)]))
    eng.step()
    eng.push("t", mk([(3, 4.0)]))
    eng.step()
    assert [tuple(r) for r in eng.view("total").collect()] == [(3,)]
    assert [tuple(r) for r in eng.view("tsum").collect()] == [(7.0,)]


def test_join_aggregate_over_join_lowers_globally(spark):
    """Aggregate over a JOIN without GROUP BY lowers through
    `_global_agg_over_from` (r7: hidden maintained join view + global
    running partials) instead of snapshot-diffing — and per-tick results
    stay cumulative, never per-delta."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE a (k INTEGER NOT NULL, v FLOAT64);
        CREATE TABLE b (k INTEGER NOT NULL, w FLOAT64);
        CREATE VIEW j as SELECT SUM(a.v) AS s FROM a JOIN b ON a.k = b.k;
    """)
    assert eng.view_strategy("j") == "global_agg"
    assert eng.view_strategy("__j_src") == "join"
    mk = lambda rows, s: spark.createDataFrame(rows, s)
    eng.push("a", mk([(1, 1.0)], "k int, v double"))
    eng.push("b", mk([(1, 10.0)], "k int, w double"))
    eng.step()
    eng.push("a", mk([(1, 2.0)], "k int, v double"))
    eng.step()
    assert [tuple(r) for r in eng.view("j").collect()] == [(3.0,)]
    eng.push("b", mk([(1, 10.0)], "k int, w double"), weight=-1)
    eng.step()
    assert [tuple(r) for r in eng.view("j").collect()] == [(None,)]


@pytest.mark.slow
def test_join_group_by_lowers_to_join_agg(spark):
    """demo02 fraud-feature shape (join → GROUP BY with SUM/COUNT) lowers
    to the bilinear join-delta + linear-agg-merge maintainer; maintained
    state matches a full recompute through inserts and retractions."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE tx (cc INTEGER NOT NULL, amt FLOAT64);
        CREATE TABLE dem (cc INTEGER NOT NULL, city varchar);
        CREATE VIEW spend as
            SELECT d.city, SUM(t.amt) AS total, COUNT(*) AS n
            FROM tx t JOIN dem d ON t.cc = d.cc
            WHERE t.amt > 0
            GROUP BY d.city;
    """)
    assert eng.view_strategy("spend") == "join_agg"
    mk_tx = lambda rows: spark.createDataFrame(rows, "cc int, amt double")
    mk_dem = lambda rows: spark.createDataFrame(rows, "cc int, city string")
    batches = [
        ("dem", mk_dem([(1, "pdx"), (2, "pdx"), (3, "sea")]), 1),
        ("tx", mk_tx([(1, 10.0), (2, 5.0), (3, 7.0), (3, -1.0)]), 1),
        ("tx", mk_tx([(1, 2.0)]), 1),
        ("tx", mk_tx([(1, 10.0)]), -1),      # partial retraction
        ("dem", mk_dem([(3, "sea")]), -1),   # city 'sea' dies entirely
    ]
    for tbl, batch, w in batches:
        eng.push(tbl, batch, weight=w)
        eng.step()
        want = {tuple(r) for r in
                eng.view("tx").alias("t")
                .join(eng.view("dem").alias("d"), F.col("t.cc") == F.col("d.cc"))
                .filter("amt > 0").groupBy("city")
                .agg(F.sum("amt").alias("total"),
                     F.count(F.lit(1)).alias("n")).collect()}
        got = {tuple(r) for r in eng.view("spend").collect()}
        assert got == want, (tbl, w)


def test_linear_agg_null_group_key(spark):
    """SQL GROUP BY treats NULL as a real group — the per-group merge
    joins are null-safe, so NULL-keyed groups are maintained too."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER, v FLOAT64);
        CREATE VIEW av as SELECT k, SUM(v) AS s FROM t GROUP BY k;
    """)
    assert eng.view_strategy("av") == "linear_agg"
    mk = lambda rows: spark.createDataFrame(rows, "k int, v double")
    eng.push("t", mk([(None, 1.0), (1, 2.0)]))
    eng.step()
    eng.push("t", mk([(None, 3.0)]))
    eng.step()
    got = {tuple(r) for r in eng.view("av").collect()}
    assert got == {(None, 4.0), (1, 2.0)}
    eng.push("t", mk([(None, 1.0), (None, 3.0)]), weight=-1)
    eng.step()
    got = {tuple(r) for r in eng.view("av").collect()}
    assert got == {(1, 2.0)}


def test_untouched_views_skip_maintainer_step(spark, monkeypatch):
    """A tick that touches none of a view's source tables must not run the
    view's maintainer at all (sql.py Engine.step skip) — per-tick cost for
    idle views is zero Spark jobs."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v FLOAT64);
        CREATE TABLE u (k INTEGER NOT NULL, v FLOAT64);
        CREATE VIEW vt as SELECT k, v FROM t;
        CREATE VIEW wu as SELECT u.k, COUNT(*) AS c FROM u GROUP BY u.k;
    """)
    calls = {"vt": 0, "wu": 0}
    for name in calls:
        m = eng._maintainers[name]
        orig = m.step
        def counted(e, c, o, _n=name, _o=orig):
            calls[_n] += 1
            return _o(e, c, o)
        monkeypatch.setattr(m, "step", counted)
    eng.push("t", spark.createDataFrame([(1, 1.0)], "k int, v double"))
    out = eng.step()
    assert calls == {"vt": 1, "wu": 0}
    assert out["wu"].df.count() == 0
    # and a tick with no pushes at all steps nothing
    out = eng.step()
    assert calls == {"vt": 1, "wu": 0}
    assert out["vt"].df.count() == 0


def test_min_max_group_by_lowers_to_nonlinear_agg(spark):
    """MIN/MAX/AVG GROUP BY views lower onto AggregateOp (touched-group
    recompute, aggregate/mod.rs:204-244) instead of snapshot-diff, and
    stay retraction-correct: retracting the current max resurrects the
    runner-up."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v FLOAT64);
        CREATE VIEW ext as SELECT k, MIN(v) AS lo, MAX(v) AS hi,
            AVG(v) AS mean, COUNT(*) AS n FROM t GROUP BY k;
    """)
    assert eng.view_strategy("ext") == "nonlinear_agg"
    mk = lambda rows: spark.createDataFrame(rows, "k int, v double")
    batches = [
        (mk([(1, 1.0), (1, 5.0), (2, 3.0)]), 1),
        (mk([(1, 9.0)]), 1),
        (mk([(1, 9.0)]), -1),   # retract the max → 5.0 must come back
        (mk([(2, 3.0)]), -1),   # group 2 dies entirely
    ]
    for batch, w in batches:
        eng.push("t", batch, weight=w)
        eng.step()
        want = {tuple(r) for r in
                eng.view("t").groupBy("k")
                .agg(F.min("v").alias("lo"), F.max("v").alias("hi"),
                     F.avg("v").alias("mean"),
                     F.count(F.lit(1)).alias("n")).collect()}
        assert {tuple(r) for r in eng.view("ext").collect()} == want


def test_avg_group_by_lowers_linear(spark):
    """AVG GROUP BY lowers to the linear maintainer via (sum, count)
    partials (the reference's Avg semigroup, aggregate/average.rs:26-65)
    finalized on emission — including NULL handling (AVG ignores NULLs;
    all-NULL group yields NULL) and full-group retraction."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v FLOAT64);
        CREATE VIEW m as SELECT k, AVG(v) AS mean, COUNT(*) AS n
            FROM t GROUP BY k;
    """)
    assert eng.view_strategy("m") == "linear_agg"
    mk = lambda rows: spark.createDataFrame(rows, "k int, v double")
    batches = [
        (mk([(1, 1.0), (1, 3.0), (2, None), (3, 6.0)]), 1),
        (mk([(1, 5.0), (2, 4.0)]), 1),
        (mk([(1, 1.0)]), -1),     # mean shifts
        (mk([(3, 6.0)]), -1),     # group 3 dies
        (mk([(2, 4.0)]), -1),     # group 2 back to all-NULL → mean NULL
    ]
    for batch, w in batches:
        eng.push("t", batch, weight=w)
        eng.step()
        want = {tuple(r) for r in
                eng.view("t").groupBy("k")
                .agg(F.avg("v").alias("mean"),
                     F.count(F.lit(1)).alias("n")).collect()}
        assert {tuple(r) for r in eng.view("m").collect()} == want


def test_having_lowers_with_boundary_crossings(spark):
    """HAVING views stay on the linear maintainer: group state keeps all
    groups, the predicate filters emissions — a group crossing the HAVING
    boundary in either direction emits the right insert/retract."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v FLOAT64);
        CREATE VIEW big as SELECT k, SUM(v) AS s, COUNT(*) AS n
            FROM t GROUP BY k HAVING SUM(v) > 10;
    """)
    assert eng.view_strategy("big") == "linear_agg"
    mk = lambda rows: spark.createDataFrame(rows, "k int, v double")
    batches = [
        (mk([(1, 6.0), (2, 5.0), (2, 15.0)]), 1),   # only k=2 passes
        (mk([(1, 7.0)]), 1),               # k=1 crosses INTO the view
        (mk([(2, 15.0)]), -1),             # k=2 drops back out (s=5)
    ]
    for batch, w in batches:
        eng.push("t", batch, weight=w)
        eng.step()
        want = {tuple(r) for r in
                eng.view("t").groupBy("k")
                .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
                .filter("s > 10").collect()}
        assert {tuple(r) for r in eng.view("big").collect()} == want


def test_unsupported_having_falls_back(spark):
    """A HAVING over an aggregate that is not an output column cannot be
    finalize-filtered — the view must fall back to snapshot-diff and still
    be correct."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v FLOAT64);
        CREATE VIEW odd as SELECT k, COUNT(*) AS n
            FROM t GROUP BY k HAVING MAX(v) > 5;
    """)
    assert eng.view_strategy("odd") == "differentiate"
    eng.push("t", spark.createDataFrame(
        [(1, 2.0), (1, 9.0), (2, 3.0)], "k int, v double"))
    eng.step()
    assert {tuple(r) for r in eng.view("odd").collect()} == {(1, 2)}


def test_layered_views_lower_end_to_end(spark):
    """View-over-view lowering: a linear GROUP BY over a project view
    consumes the upstream maintainer's per-tick delta — both stay O(Δ)
    (no snapshot-diff anywhere in the stack) and match full recompute
    through inserts and retractions."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v FLOAT64);
        CREATE VIEW doubled as SELECT k, v * 2 AS v2 FROM t WHERE v > 0;
        CREATE VIEW per_k as SELECT k, SUM(v2) AS s, COUNT(*) AS n
            FROM doubled GROUP BY k;
        CREATE VIEW big_k as SELECT k, s FROM per_k WHERE s > 10;
    """)
    assert eng.view_strategy("doubled") == "project"
    assert eng.view_strategy("per_k") == "linear_agg"
    assert eng.view_strategy("big_k") == "project"
    mk = lambda rows: spark.createDataFrame(rows, "k int, v double")
    batches = [
        (mk([(1, 2.0), (1, 4.0), (2, 1.0), (2, -5.0)]), 1),
        (mk([(2, 9.0)]), 1),
        (mk([(1, 4.0)]), -1),
    ]
    for batch, w in batches:
        eng.push("t", batch, weight=w)
        eng.step()
        base = eng.view("t").filter("v > 0").selectExpr("k", "v * 2 AS v2")
        want_pk = {tuple(r) for r in
                   base.groupBy("k").agg(F.sum("v2").alias("s"),
                                         F.count(F.lit(1)).alias("n"))
                   .collect()}
        assert {tuple(r) for r in eng.view("per_k").collect()} == want_pk
        want_big = {(k, s) for k, s, n in want_pk if s > 10}
        assert {tuple(r) for r in eng.view("big_k").collect()} == want_big


def test_nonlinear_agg_null_group_key(spark):
    """MIN/MAX GROUP BY with a nullable key: AggregateOp's touched-group
    restriction is null-safe, so the NULL group (a real SQL group) is
    maintained like any other."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER, v FLOAT64);
        CREATE VIEW ext as SELECT k, MIN(v) AS lo, MAX(v) AS hi
            FROM t GROUP BY k;
    """)
    assert eng.view_strategy("ext") == "nonlinear_agg"
    mk = lambda rows: spark.createDataFrame(rows, "k int, v double")
    batches = [
        (mk([(None, 1.0), (None, 5.0), (1, 3.0)]), 1),
        (mk([(None, 9.0)]), 1),        # NULL group's max moves
        (mk([(None, 9.0)]), -1),       # retract it → 5.0 resurrects
        (mk([(None, 1.0), (None, 5.0)]), -1),  # NULL group dies
    ]
    for batch, w in batches:
        eng.push("t", batch, weight=w)
        eng.step()
        want = {tuple(r) for r in
                eng.view("t").groupBy("k")
                .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
                .collect()}
        assert {tuple(r) for r in eng.view("ext").collect()} == want


def test_having_string_literal_survives_rewrite(spark):
    """A HAVING predicate whose string literal *textually contains* an
    aggregate expression must keep the literal intact — substitution only
    applies outside quoted regions."""
    from database_stream_processor_spark.sql import _rewrite_having
    spec = {"alias_map": [("COUNT(*)", "n"), ("SUM(v)", "s")]}
    got = _rewrite_having("COUNT(*) > 1 AND k <> 'COUNT(*)'", spec)
    assert got == "n > 1 AND k <> 'COUNT(*)'"
    got = _rewrite_having("SUM( v ) > 2 AND k = 'has SUM(v) inside'", spec)
    assert got == "s > 2 AND k = 'has SUM(v) inside'"
    # end-to-end: the literal filter still compares against the raw string
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k VARCHAR NOT NULL, v FLOAT64);
        CREATE VIEW big as SELECT k, SUM(v) AS s, COUNT(*) AS n
            FROM t GROUP BY k HAVING COUNT(*) > 1 AND k <> 'COUNT(*)';
    """)
    assert eng.view_strategy("big") == "linear_agg"
    mk = lambda rows: spark.createDataFrame(rows, "k string, v double")
    eng.push("t", mk([("a", 1.0), ("a", 2.0),
                      ("COUNT(*)", 3.0), ("COUNT(*)", 4.0)]))
    eng.step()
    got = {tuple(r) for r in eng.view("big").collect()}
    assert got == {("a", 3.0, 2)}


def test_left_join_view_lowers_incrementally(spark):
    """Two-table LEFT JOIN views lower onto touched-key recompute
    (join.rs:338-361 outer-join semantics): null-padded rows appear and
    retract as the match-set flips, through inserts and retractions, and
    the maintained snapshot always equals the batch recompute."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE cust (ck INTEGER NOT NULL, name VARCHAR);
        CREATE TABLE ord (ok INTEGER NOT NULL, ck INTEGER, amt FLOAT64);
        CREATE VIEW enriched as
            SELECT c.name, o.ok, o.amt
            FROM cust c LEFT JOIN ord o ON c.ck = o.ck;
    """)
    assert eng.view_strategy("enriched") == "left_join"
    mkc = lambda rows: spark.createDataFrame(rows, "ck int, name string")
    mko = lambda rows: spark.createDataFrame(rows, "ok int, ck int, amt double")
    batches = [
        ("cust", mkc([(1, "ann"), (2, "bob")]), 1),
        ("ord", mko([(10, 1, 5.0)]), 1),       # ann's pad row retracts
        ("ord", mko([(11, 2, 7.0), (12, 2, 8.0)]), 1),
        ("ord", mko([(10, 1, 5.0)]), -1),      # ann's pad row returns
        ("cust", mkc([(2, "bob")]), -1),       # bob's rows all retract
    ]
    for tbl, batch, w in batches:
        eng.push(tbl, batch, weight=w)
        eng.step()
        want = {tuple(r) for r in
                eng.view("cust").alias("c")
                .join(eng.view("ord").alias("o"), on=[F.expr("c.ck = o.ck")],
                      how="left")
                .select("c.name", "o.ok", "o.amt").collect()}
        got = {tuple(r) for r in eng.view("enriched").collect()}
        assert got == want, (tbl, w)


@pytest.mark.slow
def test_join_agg_over_maintained_view(spark):
    """demo02-layered shape (project.sql:29-57): a projection view
    feeding a join→GROUP BY view — the downstream lowers to the bilinear
    join_agg maintainer with the upstream's output delta as its input
    delta, staying O(Δ) end to end."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE tx (ck INTEGER NOT NULL, amt FLOAT64);
        CREATE TABLE dem (ck INTEGER NOT NULL, city VARCHAR);
        CREATE VIEW big_tx as SELECT ck, amt * 2 AS amt2 FROM tx
            WHERE amt > 0;
        CREATE VIEW spend as
            SELECT d.city, SUM(b.amt2) AS total, COUNT(*) AS n
            FROM big_tx b JOIN dem d ON b.ck = d.ck
            GROUP BY d.city;
    """)
    assert eng.view_strategy("big_tx") == "project"
    assert eng.view_strategy("spend") == "join_agg"
    mkt = lambda rows: spark.createDataFrame(rows, "ck int, amt double")
    mkd = lambda rows: spark.createDataFrame(rows, "ck int, city string")
    batches = [
        ("dem", mkd([(1, "lima"), (2, "oslo")]), 1),
        ("tx", mkt([(1, 3.0), (1, -9.0), (2, 4.0)]), 1),
        ("tx", mkt([(2, 5.0)]), 1),
        ("tx", mkt([(1, 3.0)]), -1),    # lima's only tx → group dies
    ]
    for tbl, batch, w in batches:
        eng.push(tbl, batch, weight=w)
        eng.step()
        want = {tuple(r) for r in
                eng.view("tx").filter("amt > 0")
                .selectExpr("ck", "amt * 2 AS amt2").alias("b")
                .join(eng.view("dem").alias("d"), on=[F.expr("b.ck = d.ck")])
                .groupBy("d.city")
                .agg(F.sum("amt2").alias("total"),
                     F.count(F.lit(1)).alias("n")).collect()}
        got = {tuple(r) for r in eng.view("spend").collect()}
        assert got == want, (tbl, w)


@pytest.mark.slow
def test_engine_agg_salts_two_stage_identical_output(spark):
    """Engine(agg_salts=N): the GROUP BY maintainers' per-delta partial
    aggregate runs two-stage — GROUP BY (keys, salt) then GROUP BY keys —
    and the maintained output is identical to the unsalted engine through
    inserts and retractions (exact for integer/decimal sums)."""
    def build(**kw):
        eng = Engine(spark, **kw)
        eng.execute("""
            CREATE TABLE t (k VARCHAR NOT NULL, v BIGINT);
            CREATE TABLE d (k VARCHAR NOT NULL, grp VARCHAR);
            CREATE VIEW per_k as SELECT k, SUM(v) AS s, COUNT(*) AS n
                FROM t GROUP BY k;
            CREATE VIEW per_grp as
                SELECT d.grp, SUM(t.v) AS s, COUNT(*) AS n
                FROM t JOIN d ON t.k = d.k GROUP BY d.grp;
        """)
        assert eng.view_strategy("per_k") == "linear_agg"
        assert eng.view_strategy("per_grp") == "join_agg"
        return eng

    salted, plain = build(agg_salts=4), build()
    # the salted maintainer's delta SQL is the two-stage split
    m = salted._maintainers["per_k"]
    assert "floor(rand() * 4)" in m._delta_sql
    assert m._delta_sql.upper().startswith("SELECT K, SUM(")
    assert "floor(rand() * 4)" in salted._maintainers["per_grp"]._delta_sql
    # and the bound physical plan aggregates twice (salted then merged)
    probe = spark.createDataFrame([("hot", 1)] * 8, "k string, v long")
    plan = (salted.eval_on(m._delta_sql, {"t": probe})
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("HashAggregate") >= 4  # 2 aggregates x partial/final

    mk = lambda rows: spark.createDataFrame(rows, "k string, v long")
    hot = [("hot", i % 5) for i in range(60)]
    batches = [
        (mk(hot[:40] + [("cold", 7)]), 1),
        (mk(hot[40:]), 1),
        (mk(hot[:40]), -1),
    ]
    for eng in (salted, plain):
        eng.push("d", spark.createDataFrame(
            [("hot", "g1"), ("cold", "g2")], "k string, grp string"))
        eng.step()
    for batch, w in batches:
        for eng in (salted, plain):
            eng.push("t", batch, weight=w)
            eng.step()
        for view in ("per_k", "per_grp"):
            got = {tuple(r) for r in salted.view(view).collect()}
            want = {tuple(r) for r in plain.view(view).collect()}
            assert got == want, view


def test_distinct_view_lowers_to_distinct_op(spark):
    """SELECT DISTINCT views lower onto DistinctOp (distinct.rs:64): a
    row's presence flips exactly when its total multiplicity crosses
    zero, through duplicate inserts and partial/total retractions."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, tag VARCHAR);
        CREATE VIEW tags as SELECT DISTINCT tag, k * 2 AS k2 FROM t
            WHERE k < 100;
    """)
    assert eng.view_strategy("tags") == "distinct"
    mk = lambda rows: spark.createDataFrame(rows, "k int, tag string")
    batches = [
        (mk([(1, "a"), (1, "a"), (2, "b"), (500, "z")]), 1),
        (mk([(1, "a")]), -1),    # multiplicity 2 → 1: stays present
        (mk([(1, "a")]), -1),    # 1 → 0: retracts
        (mk([(2, "b")]), 1),     # 1 → 2: no delta
    ]
    for batch, w in batches:
        eng.push("t", batch, weight=w)
        eng.step()
        want = {tuple(r) for r in
                eng.view("t").filter("k < 100")
                .selectExpr("tag", "k * 2 AS k2").distinct().collect()}
        assert {tuple(r) for r in eng.view("tags").collect()} == want


@pytest.mark.slow
def test_full_and_right_outer_join_views_lower(spark):
    """RIGHT and FULL OUTER JOIN views lower to the same touched-key
    recompute as LEFT (hidden key = COALESCE of both sides), padding and
    unpadding either side as its match-set flips."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE a (k INTEGER NOT NULL, av VARCHAR);
        CREATE TABLE b (k INTEGER NOT NULL, bv VARCHAR);
        CREATE VIEW fj as SELECT x.av, y.bv
            FROM a x FULL OUTER JOIN b y ON x.k = y.k;
        CREATE VIEW rj as SELECT x.av, y.bv
            FROM a x RIGHT JOIN b y ON x.k = y.k;
    """)
    assert eng.view_strategy("fj") == "full_join"
    assert eng.view_strategy("rj") == "right_join"
    mka = lambda rows: spark.createDataFrame(rows, "k int, av string")
    mkb = lambda rows: spark.createDataFrame(rows, "k int, bv string")
    batches = [
        ("a", mka([(1, "a1"), (2, "a2")]), 1),
        ("b", mkb([(2, "b2"), (3, "b3")]), 1),
        ("a", mka([(3, "a3")]), 1),       # b3's padded row retracts
        ("b", mkb([(2, "b2")]), -1),      # a2 goes back to padded
        ("a", mka([(1, "a1")]), -1),
    ]
    for tbl, batch, w in batches:
        eng.push(tbl, batch, weight=w)
        eng.step()
        for view, how in (("fj", "full"), ("rj", "right")):
            want = {tuple(r) for r in
                    eng.view("a").alias("x")
                    .join(eng.view("b").alias("y"),
                          on=[F.expr("x.k = y.k")], how=how)
                    .select("x.av", "y.bv").collect()}
            got = {tuple(r) for r in eng.view(view).collect()}
            assert got == want, (view, tbl, w)


def test_global_aggregate_lowers(spark):
    """SELECT COUNT(*)/SUM/AVG FROM t (no GROUP BY) lowers to running
    partials with SQL's empty-group semantics: exactly one row once
    touched, COUNT = 0 and SUM/AVG = NULL after everything retracts."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v FLOAT64);
        CREATE VIEW totals as SELECT COUNT(*) AS n, SUM(v) AS s,
            AVG(v) AS mean FROM t WHERE k < 100;
    """)
    assert eng.view_strategy("totals") == "global_agg"
    mk = lambda rows: spark.createDataFrame(rows, "k int, v double")
    batches = [
        (mk([(1, 2.0), (2, 4.0), (500, 99.0)]), 1),
        (mk([(3, None)]), 1),          # NULL v: counts for n, not s/mean
        (mk([(1, 2.0), (2, 4.0)]), -1),
        (mk([(3, None)]), -1),         # table (under pred) now empty
    ]
    for batch, w in batches:
        eng.push("t", batch, weight=w)
        eng.step()
        want = {tuple(r) for r in
                eng.view("t").filter("k < 100")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
                     F.avg("v").alias("mean")).collect()}
        assert {tuple(r) for r in eng.view("totals").collect()} == want
    # final state: the empty-group row, present with n=0, s/mean NULL
    assert {tuple(r) for r in eng.view("totals").collect()} == \
        {(0, None, None)}


@pytest.mark.slow
def test_union_views_lower(spark):
    """UNION ALL = plus() of per-branch deltas; UNION adds DistinctOp.
    A tick touching one source runs only that branch."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE a (k INTEGER NOT NULL, v VARCHAR);
        CREATE TABLE b (k INTEGER NOT NULL, v VARCHAR);
        CREATE VIEW ua as SELECT k, v FROM a WHERE k > 0
            UNION ALL SELECT k * 10 AS k, v FROM b;
        CREATE VIEW ud as SELECT k, v FROM a UNION SELECT k, v FROM b;
    """)
    assert eng.view_strategy("ua") == "union_all"
    assert eng.view_strategy("ud") == "union"
    mk = lambda rows: spark.createDataFrame(rows, "k int, v string")
    batches = [
        ("a", mk([(1, "x"), (2, "y")]), 1),
        ("b", mk([(1, "x"), (3, "z")]), 1),   # ud dedupes (1, x)
        ("a", mk([(1, "x")]), -1),            # ud keeps it via b's copy
        ("b", mk([(1, "x")]), -1),            # now it's gone
    ]
    for tbl, batch, w in batches:
        eng.push(tbl, batch, weight=w)
        eng.step()
        va, vb = eng.view("a"), eng.view("b")
        want_ua = (va.filter("k > 0").select("k", "v")
                   .unionAll(vb.selectExpr("k * 10 AS k", "v")))
        assert sorted(tuple(r) for r in eng.view("ua").collect()) == \
            sorted(tuple(r) for r in want_ua.collect())
        want_ud = {tuple(r) for r in
                   va.select("k", "v").union(vb.select("k", "v"))
                   .distinct().collect()}
        assert {tuple(r) for r in eng.view("ud").collect()} == want_ud


@pytest.mark.slow
def test_subquery_filter_views_lower(spark):
    """[NOT] EXISTS / IN (SELECT …) filters lower onto touched-key
    semi/anti maintenance (the reference compiles these to join_index/
    antijoin, join.rs:338 + semijoin path): across inserts, retractions,
    and NULL correlation keys the maintained snapshot always equals the
    batch recompute."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE cust (ck INTEGER NOT NULL, name VARCHAR, nat INTEGER);
        CREATE TABLE ord (ok INTEGER NOT NULL, ck INTEGER, amt FLOAT64);
        CREATE VIEW with_ord as
            SELECT c.ck, c.name FROM cust c
            WHERE EXISTS (SELECT 1 FROM ord o
                          WHERE o.ck = c.ck AND o.amt > 5) AND c.nat < 9;
        CREATE VIEW no_ord as
            SELECT c.name FROM cust c
            WHERE NOT EXISTS (SELECT 1 FROM ord o WHERE o.ck = c.ck);
        CREATE VIEW in_ord as
            SELECT c.name FROM cust c
            WHERE ck IN (SELECT ck FROM ord WHERE amt > 5);
    """)
    assert eng.view_strategy("with_ord") == "exists"
    assert eng.view_strategy("no_ord") == "not_exists"
    assert eng.view_strategy("in_ord") == "in"
    mkc = lambda rows: spark.createDataFrame(rows, "ck int, name string, nat int")
    mko = lambda rows: spark.createDataFrame(rows, "ok int, ck int, amt double")
    batches = [
        ("cust", mkc([(1, "ann", 1), (2, "bob", 2), (None, "nil", 3)]), 1),
        ("ord", mko([(10, 1, 9.0), (11, 2, 1.0)]), 1),   # ann in, bob out
        ("ord", mko([(12, 2, 7.0), (13, None, 8.0)]), 1),  # bob joins
        ("ord", mko([(10, 1, 9.0)]), -1),                # ann drops out
        ("cust", mkc([(2, "bob", 2)]), -1),              # bob retracts
    ]
    checks = {
        "with_ord": """SELECT c.ck, c.name FROM cust c
            WHERE EXISTS (SELECT 1 FROM ord o
                          WHERE o.ck = c.ck AND o.amt > 5) AND c.nat < 9""",
        "no_ord": """SELECT c.name FROM cust c
            WHERE NOT EXISTS (SELECT 1 FROM ord o WHERE o.ck = c.ck)""",
        "in_ord": """SELECT c.name FROM cust c
            WHERE ck IN (SELECT ck FROM ord WHERE amt > 5)""",
    }
    for tbl, batch, w in batches:
        eng.push(tbl, batch, weight=w)
        eng.step()
        for view, sql in checks.items():
            want = sorted(tuple(r) for r in spark.sql(sql).collect())
            got = sorted(tuple(r) for r in eng.view(view).collect())
            assert got == want, (view, tbl, w)


def test_not_in_subquery_nullable_lowers_with_null_semantics(spark):
    """NOT IN over a nullable subquery column lowers to the counter-
    guarded maintainer (r6) and still honors three-valued semantics:
    one NULL in the subquery empties the result, even when the select
    list drops the correlation key."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE cust (ck INTEGER NOT NULL, name VARCHAR);
        CREATE TABLE ord (ok INTEGER NOT NULL, ck INTEGER);
        CREATE VIEW not_in_ord as
            SELECT c.name FROM cust c
            WHERE ck NOT IN (SELECT ck FROM ord);
    """)
    assert eng.view_strategy("not_in_ord") == "not_in_nullable"
    eng.push("cust", spark.createDataFrame([(1, "ann")], "ck int, name string"))
    eng.push("ord", spark.createDataFrame([(10, None)], "ok int, ck int"))
    eng.step()
    assert eng.view("not_in_ord").count() == 0  # NULL in subquery: empty
    eng.push("ord", spark.createDataFrame([(10, None)], "ok int, ck int"),
             weight=-1)
    eng.step()
    assert [r["name"] for r in eng.view("not_in_ord").collect()] == ["ann"]


def test_group_topk_view_lowers(spark):
    """ROW_NUMBER() OVER (PARTITION BY … ORDER BY …) <= k views lower
    onto touched-partition recompute (the reference's topk operator,
    nexmark q18/q19): only partitions whose rows changed re-rank, and
    the snapshot equals batch recompute across inserts/retractions and
    a NULL partition key."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ord (ok INTEGER NOT NULL, prio VARCHAR, amt FLOAT64);
        CREATE VIEW top2 as
            SELECT ok, prio, amt FROM (
                SELECT ok, prio, amt,
                       ROW_NUMBER() OVER (PARTITION BY prio
                                          ORDER BY amt DESC, ok) AS rn
                FROM ord) x WHERE rn <= 2;
    """)
    assert eng.view_strategy("top2") == "group_topk"
    mk = lambda rows: spark.createDataFrame(rows, "ok int, prio string, amt double")
    batches = [
        (mk([(1, "A", 5.0), (2, "A", 9.0), (3, "B", 1.0)]), 1),
        (mk([(4, "A", 7.0), (5, None, 2.0)]), 1),   # A re-ranks; NULL group
        (mk([(2, "A", 9.0)]), -1),                  # A's top retracts
        (mk([(6, None, 3.0), (7, "B", 0.5)]), 1),
    ]
    batch_sql = """SELECT ok, prio, amt FROM (
        SELECT ok, prio, amt,
               ROW_NUMBER() OVER (PARTITION BY prio
                                  ORDER BY amt DESC, ok) AS rn
        FROM ord) x WHERE rn <= 2"""
    for batch, w in batches:
        eng.push("ord", batch, weight=w)
        eng.step()
        want = sorted(tuple(r) for r in spark.sql(batch_sql).collect())
        got = sorted(tuple(r) for r in eng.view("top2").collect())
        assert got == want, (w,)


def test_group_topk_over_rank_and_fallback_shapes(spark):
    """RANK() lowers too; a non-rank outer predicate or a top-level
    ORDER BY keeps the snapshot-diff fallback."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ord (ok INTEGER NOT NULL, prio VARCHAR, amt FLOAT64);
        CREATE VIEW r1 as
            SELECT ok FROM (
                SELECT ok, RANK() OVER (PARTITION BY prio
                                        ORDER BY amt DESC) AS rk
                FROM ord) x WHERE rk = 1;
        CREATE VIEW not_topk as
            SELECT ok FROM (
                SELECT ok, amt, ROW_NUMBER() OVER (PARTITION BY prio
                                              ORDER BY amt DESC) AS rn
                FROM ord) x WHERE amt > 3;
    """)
    assert eng.view_strategy("r1") == "group_topk"
    assert eng.view_strategy("not_topk") == "differentiate"
    mk = lambda rows: spark.createDataFrame(rows, "ok int, prio string, amt double")
    eng.push("ord", mk([(1, "A", 5.0), (2, "A", 5.0), (3, "B", 1.0)]))
    eng.step()
    # RANK ties: both rank-1 rows of A survive
    assert {r.ok for r in eng.view("r1").collect()} == {1, 2, 3}


@pytest.mark.slow
def test_multiway_join_view_lowers(spark):
    """≥3-table INNER JOIN chains lower onto the multilinear delta rule
    (join.rs:226-264 applied pairwise): each tick evaluates one leg per
    changed table (old tables before it, new after it), and the
    maintained snapshot equals batch recompute across inserts and
    retractions of every table.  A chain with a repeated table name must
    NOT lower to a blind 2-table join plan."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE nat (nk INTEGER NOT NULL, nname VARCHAR);
        CREATE TABLE cust (ck INTEGER NOT NULL, nk INTEGER, cname VARCHAR);
        CREATE TABLE ord (ok INTEGER NOT NULL, ck INTEGER, amt FLOAT64);
        CREATE VIEW enr as
            SELECT o.ok, c.cname, n.nname, o.amt
            FROM ord o JOIN cust c ON o.ck = c.ck
                       JOIN nat n ON c.nk = n.nk
            WHERE o.amt > 1;
        CREATE VIEW selfish as
            SELECT a.ck FROM cust a JOIN cust b ON a.ck = b.nk
                        JOIN ord o ON o.ck = a.ck;
    """)
    assert eng.view_strategy("enr") == "multi_join"
    # r7: the repeated-table chain dedupes (cust b clones through a
    # hidden projection view) and lowers — value-checked below
    assert eng.view_strategy("selfish") == "multi_join"
    mkn = lambda r: spark.createDataFrame(r, "nk int, nname string")
    mkc = lambda r: spark.createDataFrame(r, "ck int, nk int, cname string")
    mko = lambda r: spark.createDataFrame(r, "ok int, ck int, amt double")
    batches = [
        ("nat", mkn([(0, "n0"), (1, "n1")]), 1),
        ("cust", mkc([(1, 0, "ann"), (2, 1, "bob"), (3, 2, "cyd")]), 1),
        ("ord", mko([(10, 1, 5.0), (11, 2, 0.5), (12, 3, 7.0)]), 1),
        ("nat", mkn([(2, "n2")]), 1),       # cyd's order appears
        ("ord", mko([(10, 1, 5.0)]), -1),   # ann's order retracts
        ("cust", mkc([(2, 1, "bob")]), -1),
    ]
    for tbl, b, w in batches:
        eng.push(tbl, b, weight=w)
        eng.step()
        want = sorted(tuple(r) for r in spark.sql(
            """SELECT o.ok, c.cname, n.nname, o.amt
               FROM ord o JOIN cust c ON o.ck = c.ck
                          JOIN nat n ON c.nk = n.nk
               WHERE o.amt > 1""").collect())
        got = sorted(tuple(r) for r in eng.view("enr").collect())
        assert got == want, (tbl, w)
        want_s = sorted(tuple(r) for r in spark.sql(
            """SELECT a.ck FROM cust a JOIN cust b ON a.ck = b.nk
                           JOIN ord o ON o.ck = a.ck""").collect())
        got_s = sorted(tuple(r) for r in eng.view("selfish").collect())
        assert got_s == want_s, ("selfish", tbl, w)


@pytest.mark.slow
def test_distinct_agg_views_lower(spark):
    """COUNT/SUM(DISTINCT e) GROUP BY views lower onto a DistinctOp
    stage feeding linear partial merges (distinct.rs:64 +
    aggregate/mod.rs:253): across duplicate arrivals, partial and full
    retractions, NULL values (ignored by SQL DISTINCT aggregates), and a
    drained group, the snapshot equals batch recompute; HAVING over the
    distinct aggregate filters at finalize time."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ev (u INTEGER, g VARCHAR, amt FLOAT64);
        CREATE VIEW per_g as
            SELECT g, COUNT(DISTINCT u) AS users, SUM(DISTINCT u) AS su,
                   COUNT(*) AS n
            FROM ev WHERE amt > 0 GROUP BY g;
        CREATE VIEW hv as
            SELECT g, COUNT(DISTINCT u) AS users
            FROM ev GROUP BY g HAVING COUNT(DISTINCT u) > 1;
        CREATE VIEW two_exprs as
            SELECT g, COUNT(DISTINCT u) AS cu, COUNT(DISTINCT amt) AS ca
            FROM ev GROUP BY g;
    """)
    assert eng.view_strategy("per_g") == "distinct_agg"
    assert eng.view_strategy("hv") == "distinct_agg"
    # two different DISTINCT expressions need two distinct states — falls back
    assert eng.view_strategy("two_exprs") == "differentiate"
    mk = lambda rows: spark.createDataFrame(rows, "u int, g string, amt double")
    batches = [
        (mk([(1, "a", 5.0), (1, "a", 2.0), (2, "a", 1.0), (1, "b", 3.0),
             (None, "b", 1.0)]), 1),
        (mk([(3, "a", 4.0), (2, "b", 2.0)]), 1),
        (mk([(1, "a", 5.0), (1, "a", 2.0)]), -1),  # u=1 fully leaves a
        (mk([(2, "a", 1.0), (3, "a", 4.0)]), -1),  # group a drains
    ]
    checks = {
        "per_g": """SELECT g, COUNT(DISTINCT u) AS users,
                           SUM(DISTINCT u) AS su, COUNT(*) AS n
                    FROM ev WHERE amt > 0 GROUP BY g""",
        "hv": """SELECT g, COUNT(DISTINCT u) AS users FROM ev
                 GROUP BY g HAVING COUNT(DISTINCT u) > 1""",
    }
    for i, (b, w) in enumerate(batches):
        eng.push("ev", b, weight=w)
        eng.step()
        for view, sql in checks.items():
            want = sorted(tuple(r) for r in spark.sql(sql).collect())
            got = sorted(tuple(r) for r in eng.view(view).collect())
            assert got == want, (i, view)


@pytest.mark.slow
def test_multiway_join_agg_view_lowers(spark):
    """≥3-table join → GROUP BY (the TPC-H Q5 star-aggregate shape)
    lowers onto multilinear join legs feeding the group-merge core; a
    2-table join→GROUP BY still lowers to join_agg, and a chain the
    parser rejects must not silently lower to a blind 2-table plan."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE nat (nk INTEGER NOT NULL, nname VARCHAR);
        CREATE TABLE cust (ck INTEGER NOT NULL, nk INTEGER, cname VARCHAR);
        CREATE TABLE ord (ok INTEGER NOT NULL, ck INTEGER, amt FLOAT64);
        CREATE VIEW rev as
            SELECT n.nname, SUM(o.amt) AS total, COUNT(*) AS n
            FROM ord o JOIN cust c ON o.ck = c.ck
                       JOIN nat n ON c.nk = n.nk
            WHERE o.amt > 1 GROUP BY n.nname;
        CREATE VIEW rev2 as
            SELECT c.cname, SUM(o.amt) AS total
            FROM ord o JOIN cust c ON o.ck = c.ck GROUP BY c.cname;
        CREATE VIEW selfagg as
            SELECT a.cname, COUNT(*) AS n
            FROM cust a JOIN cust b ON a.ck = b.nk
                        JOIN ord o ON o.ck = a.ck
            GROUP BY a.cname;
    """)
    assert eng.view_strategy("rev") == "multi_join_agg"
    assert eng.view_strategy("rev2") == "join_agg"
    # r7: the self-join chain dedupes (cust b clones through a hidden
    # projection view) and lowers too — verified against one-shot below
    assert eng.view_strategy("selfagg") == "multi_join_agg"
    mkn = lambda r: spark.createDataFrame(r, "nk int, nname string")
    mkc = lambda r: spark.createDataFrame(r, "ck int, nk int, cname string")
    mko = lambda r: spark.createDataFrame(r, "ok int, ck int, amt double")
    batches = [
        ("nat", mkn([(0, "n0"), (1, "n1")]), 1),
        ("cust", mkc([(1, 0, "ann"), (2, 1, "bob"), (3, 2, "cyd")]), 1),
        ("ord", mko([(10, 1, 5.0), (11, 2, 0.5), (12, 3, 7.0)]), 1),
        ("nat", mkn([(2, "n2")]), 1),     # cyd's order appears in rev
        ("ord", mko([(10, 1, 5.0)]), -1),  # n0's group drains
        ("cust", mkc([(2, 1, "bob")]), -1),
    ]
    for tbl, b, w in batches:
        eng.push(tbl, b, weight=w)
        eng.step()
        want = sorted(tuple(r) for r in spark.sql(
            """SELECT n.nname, SUM(o.amt) AS total, COUNT(*) AS n
               FROM ord o JOIN cust c ON o.ck = c.ck
                          JOIN nat n ON c.nk = n.nk
               WHERE o.amt > 1 GROUP BY n.nname""").collect())
        got = sorted(tuple(r) for r in eng.view("rev").collect())
        assert got == want, (tbl, w)
        want_s = sorted(tuple(r) for r in spark.sql(
            """SELECT a.cname, COUNT(*) AS n
               FROM cust a JOIN cust b ON a.ck = b.nk
                           JOIN ord o ON o.ck = a.ck
               GROUP BY a.cname""").collect())
        got_s = sorted(tuple(r) for r in eng.view("selfagg").collect())
        assert got_s == want_s, ("selfagg", tbl, w)


def test_global_topk_view_lowers_with_short_circuit(spark, monkeypatch):
    """ORDER BY … LIMIT k views lower onto threshold-guarded top-k
    maintenance: a tick strictly below the stored boundary emits nothing
    WITHOUT recomputing (asserted by counting recomputes), while
    boundary-beating inserts and stored-row retractions re-fill via
    TakeOrdered; snapshot equals batch recompute throughout."""
    from database_stream_processor_spark import sql as sqlmod
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ord (ok INTEGER NOT NULL, amt FLOAT64);
        CREATE VIEW top3 as
            SELECT ok, amt FROM ord WHERE amt > 0
            ORDER BY amt DESC, ok LIMIT 3;
    """)
    assert eng.view_strategy("top3") == "global_topk"
    m = eng._maintainers["top3"]
    recomputes = []
    orig = sqlmod._GlobalTopKMaintainer._step_guarded

    def counting(self, e, z):
        before = self.state._epoch
        out = orig(self, e, z)
        recomputes.append(self.state._epoch != before)
        return out
    monkeypatch.setattr(sqlmod._GlobalTopKMaintainer, "_step_guarded",
                        counting)
    mk = lambda rows: spark.createDataFrame(rows, "ok int, amt double")
    batches = [
        (mk([(1, 5.0), (2, 9.0), (3, 1.0), (4, 7.0)]), 1),
        (mk([(5, 2.0)]), 1),    # below the boundary: must short-circuit
        (mk([(6, 8.0)]), 1),    # displaces
        (mk([(2, 9.0)]), -1),   # stored row retracts
    ]
    for i, (b, w) in enumerate(batches):
        eng.push("ord", b, weight=w)
        eng.step()
        want = sorted(tuple(r) for r in spark.sql(
            """SELECT ok, amt FROM ord WHERE amt > 0
               ORDER BY amt DESC, ok LIMIT 3""").collect())
        got = sorted(tuple(r) for r in eng.view("top3").collect())
        assert got == want, (i,)
    assert recomputes[1] is False       # the below-boundary tick
    assert recomputes[2] and recomputes[3]


def test_engine_output_connectors(spark, tmp_path):
    """Per-view output connectors (the reference's pipeline-config
    output connectors): a file sink receives one Z-set delta dir per
    tick whose sum equals the view snapshot, and an OutputHandle's
    consolidate() reads the maintained state."""
    from database_stream_processor_spark.sources.files import (
        read_zset, write_zset)
    from database_stream_processor_spark.zset import ZSetFrame
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ev (k INTEGER, amt FLOAT64);
        CREATE VIEW totals as
            SELECT k, SUM(amt) AS total FROM ev GROUP BY k;
    """)
    base = str(tmp_path / "sink")
    eng.attach_output("totals",
                      lambda d, t: write_zset(d, f"{base}/tick={t}"))
    handle = eng.attach_output_handle("totals")
    mk = lambda rows: spark.createDataFrame(rows, "k int, amt double")
    eng.push("ev", mk([(1, 5.0), (2, 3.0)]))
    eng.step()
    eng.push("ev", mk([(1, 5.0)]), weight=-1)
    eng.step()
    want = sorted(tuple(r) for r in eng.view("totals").collect())
    got_handle = sorted(tuple(r) for r in
                        handle.consolidate().rows().collect())
    assert got_handle == want
    import os
    ticks = sorted(os.listdir(base))
    assert len(ticks) == 2
    acc = None
    for t in ticks:
        z = read_zset(spark, f"{base}/{t}")
        acc = z if acc is None else acc.plus(z)
    got_files = sorted(tuple(r) for r in acc.consolidate().rows().collect())
    assert got_files == want


@pytest.mark.slow
def test_setop_views_lower(spark):
    """EXCEPT / INTERSECT views (set semantics) lower onto per-branch
    DistinctOp presence flips + whole-row membership recompute of the
    flipped rows only: across duplicate multiplicities, retractions,
    NULL rows (set ops compare NULLs equal), the snapshot equals batch
    recompute; EXCEPT ALL lowers separately (bag semantics)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE a (k INTEGER, v VARCHAR);
        CREATE TABLE b (k INTEGER, v VARCHAR);
        CREATE VIEW ex as SELECT k, v FROM a EXCEPT SELECT k, v FROM b;
        CREATE VIEW ix as SELECT k, v FROM a WHERE k > 0
            INTERSECT SELECT k, v FROM b;
        CREATE VIEW exall as SELECT k, v FROM a
            EXCEPT ALL SELECT k, v FROM b;
    """)
    assert eng.view_strategy("ex") == "except"
    assert eng.view_strategy("ix") == "intersect"
    assert eng.view_strategy("exall") == "except_all"
    mk = lambda rows: spark.createDataFrame(rows, "k int, v string")
    batches = [
        ("a", mk([(1, "x"), (1, "x"), (2, "y"), (None, "n")]), 1),
        ("b", mk([(1, "x"), (3, "z"), (None, "n")]), 1),
        ("a", mk([(1, "x")]), -1),   # multiplicity 2 -> 1: still present
        ("b", mk([(1, "x")]), -1),   # leaves b: reappears in ex
        ("a", mk([(1, "x"), (2, "y")]), -1),
    ]
    for i, (t, bdf, w) in enumerate(batches):
        eng.push(t, bdf, weight=w)
        eng.step()
        for view, sql in [
            ("ex", "SELECT k, v FROM a EXCEPT SELECT k, v FROM b"),
            ("ix", """SELECT k, v FROM a WHERE k > 0
                      INTERSECT SELECT k, v FROM b"""),
        ]:
            want = sorted((tuple(r) for r in spark.sql(sql).collect()),
                          key=str)
            got = sorted((tuple(r) for r in eng.view(view).collect()),
                         key=str)
            assert got == want, (i, view)


@pytest.mark.slow
def test_avg_distinct_lowers(spark):
    """AVG(DISTINCT e) finalizes as Σdistinct/#distinct from the same
    partials as SUM/COUNT(DISTINCT); NULL on groups with no non-null
    values."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ev (u INTEGER, g VARCHAR);
        CREATE VIEW av as
            SELECT g, AVG(DISTINCT u) AS au, COUNT(DISTINCT u) AS nu
            FROM ev GROUP BY g;
    """)
    assert eng.view_strategy("av") == "distinct_agg"
    mk = lambda rows: spark.createDataFrame(rows, "u int, g string")
    batches = [
        (mk([(2, "a"), (2, "a"), (4, "a"), (None, "b"), (5, "b")]), 1),
        (mk([(2, "a")]), -1),     # dup retracts: 2 stays distinct-present
        (mk([(2, "a")]), -1),     # now 2 leaves: avg = 4
        (mk([(5, "b")]), -1),     # b has only NULLs: avg NULL, count 0
    ]
    for i, (b, w) in enumerate(batches):
        eng.push("ev", b, weight=w)
        eng.step()
        want = sorted((tuple(r) for r in spark.sql(
            """SELECT g, AVG(DISTINCT u) AS au, COUNT(DISTINCT u) AS nu
               FROM ev GROUP BY g""").collect()), key=str)
        got = sorted((tuple(r) for r in eng.view("av").collect()),
                     key=str)
        assert got == want, (i, got, want)


def test_nonlinear_agg_over_maintained_view(spark):
    """MIN/MAX GROUP BY over an upstream maintained VIEW lowers onto
    AggregateOp (the op integrates its own input from the view's output
    deltas): keeper-repair across retraction of the current minimum."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE docs (doc_id BIGINT NOT NULL, f VARCHAR);
        CREATE VIEW pf as SELECT doc_id, f FROM docs WHERE f <> 'skip';
        CREATE VIEW keepers as
            SELECT f, MIN(doc_id) AS keep_id FROM pf GROUP BY f;
    """)
    assert eng.view_strategy("keepers") == "nonlinear_agg"
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, f string")
    eng.push("docs", mk([(3, "a"), (5, "a"), (7, "b"), (1, "skip")]))
    eng.step()
    assert {(r.f, r.keep_id) for r in eng.view("keepers").collect()} == \
        {("a", 3), ("b", 7)}
    eng.push("docs", mk([(3, "a")]), weight=-1)   # keeper retracts
    eng.step()
    assert {(r.f, r.keep_id) for r in eng.view("keepers").collect()} == \
        {("a", 5), ("b", 7)}


@pytest.mark.slow
def test_distinct_agg_over_maintained_view(spark):
    """COUNT(DISTINCT) over an upstream maintained view: the view's
    output delta feeds the distinct-agg pipeline like a table delta."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ev (u INTEGER, g VARCHAR, amt FLOAT64);
        CREATE VIEW pos as SELECT u, g FROM ev WHERE amt > 0;
        CREATE VIEW nu as
            SELECT g, COUNT(DISTINCT u) AS users FROM pos GROUP BY g;
    """)
    assert eng.view_strategy("nu") == "distinct_agg"
    mk = lambda rows: spark.createDataFrame(rows, "u int, g string, amt double")
    batches = [(mk([(1, "a", 5.0), (2, "a", 1.0), (1, "a", -9.0),
                    (3, "b", 2.0)]), 1),
               (mk([(2, "a", 1.0)]), -1),
               (mk([(4, "b", 3.0), (3, "b", 7.0)]), 1)]
    for i, (b, w) in enumerate(batches):
        eng.push("ev", b, weight=w)
        eng.step()
        want = sorted(tuple(r) for r in spark.sql(
            """SELECT g, COUNT(DISTINCT u) AS users
               FROM (SELECT u, g FROM ev WHERE amt > 0) GROUP BY g"""
        ).collect())
        got = sorted(tuple(r) for r in eng.view("nu").collect())
        assert got == want, (i,)


def test_setop_views_widen_mismatched_branch_types(spark):
    """Union-compatible but unequal branch types (INT vs BIGINT) — the
    set-op state adopts the UNION-widened common schema and every branch
    delta is cast to it, so branch-1-typed rows can't silently corrupt
    branch-0-typed presence state."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE a (k INTEGER, v VARCHAR);
        CREATE TABLE b (k BIGINT, v VARCHAR);
        CREATE VIEW ex as SELECT k, v FROM a EXCEPT SELECT k, v FROM b;
    """)
    assert eng.view_strategy("ex") == "except"
    assert dict((f.name, f.dataType.simpleString())
                for f in eng.view("ex").schema)["k"] == "bigint"
    eng.push("a", spark.createDataFrame([(1, "x"), (2, "y")],
                                        "k int, v string"))
    eng.push("b", spark.createDataFrame([(1, "x")], "k bigint, v string"))
    eng.step()
    assert sorted(tuple(r) for r in eng.view("ex").collect()) == [(2, "y")]
    eng.push("b", spark.createDataFrame([(2, "y")], "k bigint, v string"))
    eng.push("b", spark.createDataFrame([(1, "x")], "k bigint, v string"),
             weight=-1)
    eng.step()
    assert sorted(tuple(r) for r in eng.view("ex").collect()) == [(1, "x")]


def test_snapshot_diff_fallback_warns(spark, caplog):
    """A view nothing can lower must WARN at CREATE VIEW time (silent
    per-tick full recompute was round-4 'what's wrong' #2); lowered
    shapes must stay silent."""
    import logging as _logging
    eng = Engine(spark)
    eng.execute("CREATE TABLE t (k INTEGER, v FLOAT64);")
    with caplog.at_level(_logging.WARNING,
                         logger="database_stream_processor_spark.sql"):
        eng.execute("CREATE VIEW ok as SELECT k, v FROM t WHERE k > 0;")
        assert not [r for r in caplog.records
                    if "snapshot-diff" in r.getMessage()]
        # global windows incl. DESC now lower (r6/r7); a bounded
        # non-prefix global frame is the remaining no-lowering shape
        eng.execute("CREATE VIEW bad as SELECT k, v, "
                    "SUM(v) OVER (ORDER BY k ROWS BETWEEN 3 "
                    "PRECEDING AND CURRENT ROW) AS r FROM t;")
    warns = [r.getMessage() for r in caplog.records
             if "snapshot-diff" in r.getMessage()]
    assert len(warns) == 1 and "bad" in warns[0]
    assert eng.view_strategy("ok") == "project"
    assert eng.view_strategy("bad") == "differentiate"


ROLL_BATCH_SQL = """
    SELECT AVG(amt) OVER (PARTITION BY cc ORDER BY ut
               RANGE BETWEEN 600 PRECEDING AND 1 PRECEDING) AS avg_10m,
           SUM(amt) OVER (PARTITION BY cc ORDER BY ut
               RANGE BETWEEN 60 PRECEDING AND CURRENT ROW) AS sum_1m,
           COUNT(*) OVER (PARTITION BY cc ORDER BY ut
               RANGE BETWEEN 120 PRECEDING AND 120 FOLLOWING) AS cnt_2m,
           cc, amt, ut
    FROM tx"""


def _roll_cmp(spark, eng, view, batch_sql):
    want = sorted((tuple(round(v, 6) if isinstance(v, float) else v
                         for v in r) for r in spark.sql(batch_sql).collect()),
                  key=str)
    got = sorted((tuple(round(v, 6) if isinstance(v, float) else v
                        for v in r) for r in eng.view(view).collect()),
                 key=str)
    assert got == want, (len(got), len(want))


@pytest.mark.slow
def test_rolling_window_view_lowers_multi_frame(spark):
    """OVER (PARTITION BY … ORDER BY … RANGE BETWEEN …) views lower onto
    PartitionedRollingAggregateLinearOp — several frames in one view,
    empty-frame SQL semantics (SUM/AVG NULL, COUNT 0), inserts,
    duplicates and retractions all match batch recompute."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE tx (cc INTEGER NOT NULL, amt FLOAT64,
                         ut INTEGER NOT NULL);
        CREATE VIEW feat as """ + ROLL_BATCH_SQL.replace("tx", "tx") + ";")
    assert eng.view_strategy("feat") == "rolling"
    import random
    random.seed(11)
    rows = [(i % 3, round(random.uniform(1, 50), 2),
             random.randint(0, 2000)) for i in range(80)]
    rows += [rows[5], rows[9]]                    # duplicate rows
    mk = lambda rs: spark.createDataFrame(rs, "cc int, amt double, ut int")
    eng.push("tx", mk(rows[:40]))
    eng.step()
    _roll_cmp(spark, eng, "feat", ROLL_BATCH_SQL)
    eng.push("tx", mk(rows[40:]))
    eng.push("tx", mk(rows[10:20]), weight=-1)    # retraction mix
    eng.step()
    _roll_cmp(spark, eng, "feat", ROLL_BATCH_SQL)
    eng.push("tx", mk(rows[:5]), weight=-1)
    eng.step()
    _roll_cmp(spark, eng, "feat", ROLL_BATCH_SQL)


@pytest.mark.slow
def test_rolling_window_view_over_subquery_left_join(spark):
    """The VERBATIM demo02 shape: OVER windows whose FROM is a
    parenthesized LEFT-JOIN subquery — a hidden maintained left-join
    view is synthesized and the rolling maintainer layers on top; both
    stages are O(Δ) (demo/project_demo02-FraudDetection/project.sql)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE tr (cc INTEGER NOT NULL, amt FLOAT64,
                         ut INTEGER NOT NULL);
        CREATE TABLE dem (cc INTEGER NOT NULL, city VARCHAR);
        CREATE VIEW feat as
            SELECT AVG(amt) OVER (PARTITION BY cc ORDER BY ut
                       RANGE BETWEEN 600 PRECEDING AND 1 PRECEDING)
                   AS avg_spend,
                   city, amt, ut
            FROM (SELECT tr.cc AS cc, tr.amt AS amt, tr.ut AS ut,
                         dem.city AS city
                  FROM tr LEFT JOIN dem ON tr.cc = dem.cc);
    """)
    assert eng.view_strategy("feat") == "rolling"
    assert eng.view_strategy("__feat_src") == "left_join"
    batch = """SELECT AVG(amt) OVER (PARTITION BY cc ORDER BY ut
                   RANGE BETWEEN 600 PRECEDING AND 1 PRECEDING) AS avg_spend,
                   city, amt, ut
               FROM (SELECT tr.cc AS cc, tr.amt AS amt, tr.ut AS ut,
                            dem.city AS city
                     FROM tr LEFT JOIN dem ON tr.cc = dem.cc)"""
    mkt = lambda rs: spark.createDataFrame(rs, "cc int, amt double, ut int")
    mkd = lambda rs: spark.createDataFrame(rs, "cc int, city string")
    eng.push("tr", mkt([(1, 10.0, 100), (1, 20.0, 400), (2, 5.0, 100)]))
    eng.push("dem", mkd([(1, "pdx")]))            # cc 2 unmatched -> NULL
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)
    eng.push("dem", mkd([(2, "sfo")]))            # NULL row flips to match
    eng.push("tr", mkt([(1, 30.0, 650), (2, 7.0, 300)]))
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)
    eng.push("tr", mkt([(1, 20.0, 400)]), weight=-1)
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)


@pytest.mark.slow
def test_rolling_window_view_multi_spec_chained(spark):
    """A view mixing windows over DIFFERENT (PARTITION BY, ORDER BY)
    specs (demo03 GreenTrip: pickup-keyed and dropoff-keyed frames side
    by side) chains one rolling op per spec; `*` in the select list
    expands to the source columns."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE trips (pu BIGINT NOT NULL, do_ BIGINT NOT NULL,
                            put BIGINT NOT NULL, dot BIGINT NOT NULL,
                            fare FLOAT64);
        CREATE VIEW feat as SELECT
            *,
            COUNT(*) OVER (PARTITION BY pu ORDER BY put
                RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING) AS cnt_pu,
            AVG(fare) OVER (PARTITION BY pu ORDER BY put
                RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING) AS avg_pu,
            COUNT(*) OVER (PARTITION BY do_ ORDER BY dot
                RANGE BETWEEN 1800 PRECEDING AND 1 PRECEDING) AS cnt_do
            FROM trips;
    """)
    assert eng.view_strategy("feat") == "rolling"
    batch = """SELECT pu, do_, put, dot, fare,
            COUNT(*) OVER (PARTITION BY pu ORDER BY put
                RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING) AS cnt_pu,
            AVG(fare) OVER (PARTITION BY pu ORDER BY put
                RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING) AS avg_pu,
            COUNT(*) OVER (PARTITION BY do_ ORDER BY dot
                RANGE BETWEEN 1800 PRECEDING AND 1 PRECEDING) AS cnt_do
            FROM trips"""
    import random
    random.seed(5)
    rows = [(i % 4, (i + 1) % 3, random.randint(0, 9000),
             random.randint(0, 9000), round(random.uniform(3, 60), 2))
            for i in range(60)]
    mk = lambda rs: spark.createDataFrame(
        rs, "pu bigint, do_ bigint, put bigint, dot bigint, fare double")
    eng.push("trips", mk(rows[:30]))
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)
    eng.push("trips", mk(rows[30:]))
    eng.push("trips", mk(rows[5:15]), weight=-1)
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)


@pytest.mark.slow
def test_rolling_window_view_minmax_nonlinear(spark):
    """MIN/MAX OVER RANGE frames are non-linear — they route to the
    general PartitionedRollingAggregateOp (touched-slice recompute)
    chained after the linear op; retraction of a frame's max must
    surface the runner-up, matching batch recompute."""
    eng = Engine(spark)
    batch = """SELECT cc, amt, ut,
            MAX(amt) OVER (PARTITION BY cc ORDER BY ut
                RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS max_10m,
            MIN(amt) OVER (PARTITION BY cc ORDER BY ut
                RANGE BETWEEN 300 PRECEDING AND 1 PRECEDING) AS min_5m,
            SUM(amt) OVER (PARTITION BY cc ORDER BY ut
                RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS sum_10m
            FROM tx"""
    eng.execute("""
        CREATE TABLE tx (cc INTEGER NOT NULL, amt FLOAT64,
                         ut INTEGER NOT NULL);
        CREATE VIEW feat as """ + batch + ";")
    assert eng.view_strategy("feat") == "rolling"
    import random
    random.seed(13)
    rows = [(i % 3, round(random.uniform(1, 50), 2),
             random.randint(0, 1500)) for i in range(60)]
    mk = lambda rs: spark.createDataFrame(rs, "cc int, amt double, ut int")
    eng.push("tx", mk(rows[:30]))
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)
    # retract rows including per-frame maxima; late rows correct outputs
    eng.push("tx", mk(rows[30:]))
    eng.push("tx", mk(rows[:10]), weight=-1)
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)
    eng.push("tx", mk(rows[40:50]), weight=-1)
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)


def test_partition_window_view_lag_rownumber(spark):
    """OVER shapes the rolling op can't express (LAG, ROW_NUMBER as a
    column, ROWS frames) lower to touched-partition recompute instead of
    snapshot-diff; only partitions hit by the delta re-evaluate, and the
    snapshot matches batch recompute across inserts/retractions and a
    NULL partition key."""
    eng = Engine(spark)
    batch = """SELECT cc, amt, ut,
            LAG(amt) OVER (PARTITION BY cc ORDER BY ut, amt) AS prev_amt,
            ROW_NUMBER() OVER (PARTITION BY cc ORDER BY ut, amt) AS rn,
            SUM(amt) OVER (PARTITION BY cc ORDER BY ut, amt
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS running
            FROM tx"""
    eng.execute("""
        CREATE TABLE tx (cc INTEGER, amt FLOAT64, ut INTEGER NOT NULL);
        CREATE VIEW feat as """ + batch + ";")
    assert eng.view_strategy("feat") == "partition_window"
    mk = lambda rows: spark.createDataFrame(rs if (rs := rows) else rows,
                                            "cc int, amt double, ut int")
    b0 = [(1, 5.0, 100), (1, 7.0, 200), (2, 3.0, 100), (None, 1.0, 50)]
    b1 = [(1, 6.0, 150), (2, 4.0, 300), (None, 2.0, 60)]
    eng.push("tx", mk(b0))
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)
    eng.push("tx", mk(b1))
    eng.push("tx", mk(b0[:2]), weight=-1)   # retract cc=1's history head
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)
    eng.push("tx", mk([(None, 1.0, 50)]), weight=-1)  # NULL partition
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)


def test_rolling_window_view_interval_frames_timestamp(spark):
    """TIMESTAMP ORDER BY with INTERVAL frame bounds lowers too: the
    maintainer derives epoch seconds via unix_timestamp and converts
    fixed-width INTERVAL units to seconds (calendar units month/year
    stay on the snapshot-diff fallback)."""
    eng = Engine(spark)
    batch = """SELECT cc, amt, ts,
            SUM(amt) OVER (PARTITION BY cc ORDER BY ts
                RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
                AS sum_1h,
            COUNT(*) OVER (PARTITION BY cc ORDER BY ts
                RANGE BETWEEN INTERVAL '48' HOUR PRECEDING
                AND INTERVAL '1' HOUR PRECEDING) AS cnt_2d
            FROM tx"""
    eng.execute("""
        CREATE TABLE tx (cc INTEGER NOT NULL, amt FLOAT64,
                         ts TIMESTAMP NOT NULL);
        CREATE VIEW feat as """ + batch + ";")
    assert eng.view_strategy("feat") == "rolling"
    import datetime as dt
    import random
    random.seed(17)
    t0 = dt.datetime(2024, 6, 1)
    rows = [(i % 3, round(random.uniform(1, 40), 2),
             t0 + dt.timedelta(seconds=random.randint(0, 300_000)))
            for i in range(50)]
    mk = lambda rs: spark.createDataFrame(
        rs, "cc int, amt double, ts timestamp")
    eng.push("tx", mk(rows[:25]))
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)
    eng.push("tx", mk(rows[25:]))
    eng.push("tx", mk(rows[5:12]), weight=-1)
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)
    # calendar intervals can't map to epoch seconds — the rolling op
    # declines, and the generic touched-partition maintainer catches it
    eng.execute("""CREATE VIEW cal as SELECT cc, amt, ts,
        SUM(amt) OVER (PARTITION BY cc ORDER BY ts
            RANGE BETWEEN INTERVAL '1' MONTH PRECEDING AND CURRENT ROW)
            AS s FROM tx;""")
    assert eng.view_strategy("cal") == "partition_window"


def test_partition_window_over_join_subquery(spark):
    """LAG over a join subquery (demo02's commented-out last_txn_date
    line): the FROM synthesizes a hidden maintained join view and the
    touched-partition window maintainer layers on top."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE tr (cc INTEGER NOT NULL, amt FLOAT64,
                         ut INTEGER NOT NULL);
        CREATE TABLE dem (cc INTEGER NOT NULL, city VARCHAR);
        CREATE VIEW feat as
            SELECT cc, city, amt, ut,
                   LAG(amt) OVER (PARTITION BY cc ORDER BY ut) AS prev_amt
            FROM (SELECT tr.cc AS cc, tr.amt AS amt, tr.ut AS ut,
                         dem.city AS city
                  FROM tr JOIN dem ON tr.cc = dem.cc);
    """)
    assert eng.view_strategy("feat") == "partition_window"
    assert eng.view_strategy("__feat_src") == "join"
    batch = """SELECT cc, city, amt, ut,
               LAG(amt) OVER (PARTITION BY cc ORDER BY ut) AS prev_amt
               FROM (SELECT tr.cc AS cc, tr.amt AS amt, tr.ut AS ut,
                            dem.city AS city
                     FROM tr JOIN dem ON tr.cc = dem.cc)"""
    mkt = lambda rs: spark.createDataFrame(rs, "cc int, amt double, ut int")
    mkd = lambda rs: spark.createDataFrame(rs, "cc int, city string")
    eng.push("tr", mkt([(1, 5.0, 100), (1, 7.0, 200), (2, 3.0, 150)]))
    eng.push("dem", mkd([(1, "pdx"), (2, "sfo")]))
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)
    eng.push("tr", mkt([(1, 6.0, 150), (2, 4.0, 250)]))
    eng.push("tr", mkt([(1, 7.0, 200)]), weight=-1)
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)


@pytest.mark.slow
def test_not_in_lowers_when_not_null(spark):
    """NOT IN lowers to the touched-key anti maintenance when both the
    outer and inner columns are declared NOT NULL (then NOT IN ≡
    anti-join); a nullable column on either side now takes the counter-
    guarded _NotInNullableMaintainer (r6) instead of snapshot-diff."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE a (k INTEGER NOT NULL, v FLOAT64);
        CREATE TABLE b (k INTEGER NOT NULL, note VARCHAR);
        CREATE TABLE c (k INTEGER, note VARCHAR);
        CREATE VIEW miss as SELECT k, v FROM a
            WHERE k NOT IN (SELECT k FROM b);
        CREATE VIEW nullable_fallback as SELECT k, v FROM a
            WHERE k NOT IN (SELECT k FROM c);
    """)
    assert eng.view_strategy("miss") == "not_in"
    assert eng.view_strategy("nullable_fallback") == "not_in_nullable"
    mka = lambda rs: spark.createDataFrame(rs, "k int, v double")
    mkb = lambda rs: spark.createDataFrame(rs, "k int, note string")
    batch = "SELECT k, v FROM a WHERE k NOT IN (SELECT k FROM b)"
    steps = [
        ("a", mka([(1, 1.0), (2, 2.0), (3, 3.0)]), 1),
        ("b", mkb([(2, "x")]), 1),                 # 2 leaves the view
        ("b", mkb([(2, "x")]), -1),                # 2 comes back
        ("a", mka([(4, 4.0)]), 1),
        ("b", mkb([(1, "y"), (4, "z")]), 1),
    ]
    for t, df, w in steps:
        eng.push(t, df, weight=w)
        eng.step()
        want = sorted(tuple(r) for r in spark.sql(batch).collect())
        got = sorted(tuple(r) for r in eng.view("miss").collect())
        assert got == want, (t, w)


@pytest.mark.slow
def test_having_only_aggregates_absorbed(spark):
    """HAVING predicates over aggregates that appear ONLY in the HAVING
    clause (COUNT(*), SUM of another column, AVG) absorb as hidden
    linear partials instead of falling back to snapshot-diff; AVG
    aliases referenced by name in HAVING resolve against the (sum,
    count) partials.  Boundary-crossing groups emit the right deltas."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v FLOAT64, w FLOAT64);
        CREATE VIEW hv as
            SELECT k, SUM(v) AS s FROM t GROUP BY k
            HAVING COUNT(*) > 2 AND SUM(w) < 100 AND AVG(v) > 1.0;
        CREATE VIEW ha as
            SELECT k, AVG(v) AS a FROM t GROUP BY k HAVING a >= 2.0;
    """)
    assert eng.view_strategy("hv") == "linear_agg"
    assert eng.view_strategy("ha") == "linear_agg"
    mk = lambda rs: spark.createDataFrame(rs, "k int, v double, w double")
    b_hv = """SELECT k, SUM(v) AS s FROM t GROUP BY k
              HAVING COUNT(*) > 2 AND SUM(w) < 100 AND AVG(v) > 1.0"""
    b_ha = "SELECT k, AVG(v) AS a FROM t GROUP BY k HAVING AVG(v) >= 2.0"
    steps = [
        (mk([(1, 2.0, 10.0), (1, 3.0, 20.0), (2, 9.0, 5.0)]), 1),
        (mk([(1, 4.0, 30.0)]), 1),          # k=1 crosses COUNT(*) > 2
        (mk([(1, 0.0, 60.0)]), 1),          # still SUM(w) < 100
        (mk([(1, 0.0, 60.0)]), 1),          # SUM(w) = 180: k=1 leaves
        (mk([(1, 0.0, 60.0), (1, 0.0, 60.0)]), -1),  # back in
    ]
    for df, wgt in steps:
        eng.push("t", df, weight=wgt)
        eng.step()
        for view, b in (("hv", b_hv), ("ha", b_ha)):
            want = sorted((tuple(round(x, 9) if isinstance(x, float) else x
                                 for x in r)
                           for r in spark.sql(b).collect()), key=str)
            got = sorted((tuple(round(x, 9) if isinstance(x, float) else x
                                for x in r)
                          for r in eng.view(view).collect()), key=str)
            assert got == want, (view, wgt)


@pytest.mark.slow
def test_rollup_cube_views_lower(spark):
    """GROUP BY ROLLUP/CUBE views lower onto the same per-group merge as
    plain GROUP BY — the delta partial aggregate itself rolls up, and
    the null-safe merge treats marker rows as ordinary groups.  Gated on
    NOT NULL grouping keys (a nullable key keeps the fallback)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE s (region VARCHAR NOT NULL, cat VARCHAR NOT NULL,
                        amt FLOAT64);
        CREATE TABLE sn (region VARCHAR, cat VARCHAR, amt FLOAT64);
        CREATE VIEW roll as
            SELECT region, cat, SUM(amt) AS total, COUNT(*) AS n
            FROM s GROUP BY ROLLUP(region, cat);
        CREATE VIEW cub as
            SELECT region, cat, SUM(amt) AS total
            FROM s GROUP BY CUBE(region, cat);
        CREATE VIEW nullable_keys as
            SELECT region, cat, SUM(amt) AS total
            FROM sn GROUP BY ROLLUP(region, cat);
    """)
    assert eng.view_strategy("roll") == "grouping_sets_agg"
    assert eng.view_strategy("cub") == "grouping_sets_agg"
    assert eng.view_strategy("nullable_keys") == "differentiate"
    mk = lambda rs: spark.createDataFrame(rs,
                                          "region string, cat string, amt double")
    b_roll = """SELECT region, cat, SUM(amt) AS total, COUNT(*) AS n
                FROM s GROUP BY ROLLUP(region, cat)"""
    b_cub = """SELECT region, cat, SUM(amt) AS total
               FROM s GROUP BY CUBE(region, cat)"""
    steps = [
        (mk([("w", "a", 1.0), ("w", "b", 2.0), ("e", "a", 4.0)]), 1),
        (mk([("e", "b", 8.0), ("w", "a", 16.0)]), 1),
        (mk([("w", "b", 2.0)]), -1),     # (w,b) group dies entirely
        (mk([("e", "a", 4.0)]), -1),
    ]
    for df, w in steps:
        eng.push("s", df, weight=w)
        eng.step()
        for view, b in (("roll", b_roll), ("cub", b_cub)):
            want = sorted((tuple(r) for r in spark.sql(b).collect()),
                          key=str)
            got = sorted((tuple(r) for r in eng.view(view).collect()),
                         key=str)
            assert got == want, (view, w)


@pytest.mark.slow
def test_rolling_window_view_mixed_kitchen_sink(spark):
    """Stress the rolling lowering's full surface in ONE view: two
    specs, three frames, linear (SUM/AVG/COUNT) + non-linear (MAX)
    aggregates, a WHERE filter, and scalar passthrough items — four
    ticks of inserts/duplicates/retractions all match batch recompute."""
    eng = Engine(spark)
    batch = """SELECT cc, grp, amt, ut,
        SUM(amt) OVER (PARTITION BY cc ORDER BY ut
            RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS s5,
        AVG(amt) OVER (PARTITION BY cc ORDER BY ut
            RANGE BETWEEN 900 PRECEDING AND 1 PRECEDING) AS a9,
        MAX(amt) OVER (PARTITION BY cc ORDER BY ut
            RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS m5,
        COUNT(*) OVER (PARTITION BY grp ORDER BY ut
            RANGE BETWEEN 300 PRECEDING AND 100 FOLLOWING) AS c3,
        amt * 2 AS amt2
        FROM tx WHERE amt > 1.0"""
    eng.execute("""
        CREATE TABLE tx (cc INTEGER NOT NULL, grp INTEGER NOT NULL,
                         amt FLOAT64, ut INTEGER NOT NULL);
        CREATE VIEW feat as """ + batch + ";")
    assert eng.view_strategy("feat") == "rolling"
    import random
    random.seed(29)
    rows = [(i % 3, i % 2, round(random.uniform(0.5, 20), 2),
             random.choice([100, 250, 250, 400, 800, 1200]))
            for i in range(70)]
    rows += rows[10:14]                       # duplicates
    mk = lambda rs: spark.createDataFrame(
        rs, "cc int, grp int, amt double, ut int")
    ticks = [(rows[:30], 1), (rows[30:], 1), (rows[5:20], -1),
             (rows[5:10], 1)]
    for rs, w in ticks:
        eng.push("tx", mk(rs), weight=w)
        eng.step()
        _roll_cmp(spark, eng, "feat", batch)


@pytest.mark.slow
def test_setop_all_views_lower(spark):
    """EXCEPT ALL / INTERSECT ALL (bag semantics = Z-set weights): only
    rows whose multiplicity changed re-derive max(a−b,0) / min(a,b);
    multiplicities, NULL rows and retractions all match batch recompute."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE a (k INTEGER, v VARCHAR);
        CREATE TABLE b (k INTEGER, v VARCHAR);
        CREATE VIEW exall as SELECT k, v FROM a
            EXCEPT ALL SELECT k, v FROM b;
        CREATE VIEW ixall as SELECT k, v FROM a WHERE k > 0
            INTERSECT ALL SELECT k, v FROM b;
    """)
    assert eng.view_strategy("exall") == "except_all"
    assert eng.view_strategy("ixall") == "intersect_all"
    mk = lambda rows: spark.createDataFrame(rows, "k int, v string")
    batches = [
        ("a", mk([(1, "x"), (1, "x"), (1, "x"), (2, "y"), (None, "n")]), 1),
        ("b", mk([(1, "x"), (3, "z"), (None, "n")]), 1),
        ("b", mk([(1, "x")]), 1),        # a:3 b:2 -> exall keeps 1
        ("a", mk([(1, "x")]), -1),       # a:2 b:2 -> exall drops it
        ("b", mk([(1, "x"), (None, "n")]), -1),
        ("a", mk([(2, "y")]), -1),
    ]
    for i, (t, bdf, w) in enumerate(batches):
        eng.push(t, bdf, weight=w)
        eng.step()
        for view, sql in [
            ("exall", "SELECT k, v FROM a EXCEPT ALL SELECT k, v FROM b"),
            ("ixall", """SELECT k, v FROM a WHERE k > 0
                         INTERSECT ALL SELECT k, v FROM b"""),
        ]:
            want = sorted((tuple(r) for r in spark.sql(sql).collect()),
                          key=str)
            got = sorted((tuple(r) for r in eng.view(view).collect()),
                         key=str)
            assert got == want, (i, view)


def test_rolling_window_view_multi_column_partition_by(spark):
    """PARTITION BY over SEVERAL columns (packed into a struct key) and
    NULL partition values both maintain correctly through the rolling
    lowering."""
    eng = Engine(spark)
    batch = """SELECT cc, ch, amt, ut,
        SUM(amt) OVER (PARTITION BY cc, ch ORDER BY ut
            RANGE BETWEEN 400 PRECEDING AND CURRENT ROW) AS s4
        FROM tx"""
    eng.execute("""
        CREATE TABLE tx (cc INTEGER, ch VARCHAR, amt FLOAT64,
                         ut INTEGER NOT NULL);
        CREATE VIEW feat as """ + batch + ";")
    assert eng.view_strategy("feat") == "rolling"
    mk = lambda rs: spark.createDataFrame(
        rs, "cc int, ch string, amt double, ut int")
    rows = [(1, "a", 1.0, 100), (1, "a", 2.0, 300), (1, "b", 4.0, 100),
            (None, "a", 8.0, 200), (None, None, 16.0, 100),
            (None, None, 32.0, 400), (2, "a", 64.0, 250)]
    eng.push("tx", mk(rows[:4]))
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)
    eng.push("tx", mk(rows[4:]))
    eng.push("tx", mk(rows[1:2]), weight=-1)
    eng.step()
    _roll_cmp(spark, eng, "feat", batch)


def test_grouping_sets_views_lower(spark):
    """Explicit GROUPING SETS lists lower like ROLLUP/CUBE; duplicate
    sets (whose SQL output has duplicate rows the merge would collapse)
    keep the fallback."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE s (region VARCHAR NOT NULL, cat VARCHAR NOT NULL,
                        amt FLOAT64);
        CREATE VIEW gs as
            SELECT region, cat, SUM(amt) AS total
            FROM s GROUP BY GROUPING SETS ((region, cat), (region), ());
        CREATE VIEW dup as
            SELECT region, cat, SUM(amt) AS total
            FROM s GROUP BY GROUPING SETS ((region, cat), (cat, region));
    """)
    assert eng.view_strategy("gs") == "grouping_sets_agg"
    assert eng.view_strategy("dup") == "differentiate"
    mk = lambda rs: spark.createDataFrame(
        rs, "region string, cat string, amt double")
    b = """SELECT region, cat, SUM(amt) AS total
           FROM s GROUP BY GROUPING SETS ((region, cat), (region), ())"""
    for df, w in [
        (mk([("w", "a", 1.0), ("w", "b", 2.0), ("e", "a", 4.0)]), 1),
        (mk([("e", "b", 8.0)]), 1),
        (mk([("w", "b", 2.0)]), -1),
    ]:
        eng.push("s", df, weight=w)
        eng.step()
        want = sorted((tuple(r) for r in spark.sql(b).collect()), key=str)
        got = sorted((tuple(r) for r in eng.view("gs").collect()), key=str)
        assert got == want, w


def test_rolling_over_subquery_keeps_string_literals(spark):
    """ADVICE r5: the subquery-alias qualifier strip must not rewrite
    inside single-quoted literals — a literal 'x.tag' in the outer
    select of a lowered OVER view survives verbatim (the rewritten SQL
    would still analyze, so only a value check catches it)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE tr (k INTEGER NOT NULL, ts INTEGER NOT NULL,
                         amt FLOAT64);
        CREATE VIEW feat as
            SELECT x.k, x.ts, 'x.tag' AS lit,
                   SUM(x.amt) OVER (PARTITION BY x.k ORDER BY x.ts
                       RANGE BETWEEN 10 PRECEDING AND 1 PRECEDING) AS s
            FROM (SELECT k, ts, amt FROM tr) x;
    """)
    eng.push("tr", spark.createDataFrame(
        [(1, 5, 2.0), (1, 7, 3.0)], "k int, ts int, amt double"))
    eng.step()
    rows = {(r["k"], r["ts"], r["lit"], r["s"])
            for r in eng.view("feat").collect()}
    assert rows == {(1, 5, "x.tag", None), (1, 7, "x.tag", 2.0)}


def test_star_expansion_duplicate_non_join_key_falls_back(spark):
    """ADVICE r5: SELECT t1.*, t2.* with a duplicate output name that is
    NOT the join key must not be silently narrowed by first-wins — the
    star expansion refuses, and the un-expanded subquery then fails
    Spark analysis LOUDLY (ambiguous reference), matching real SQL."""
    import pytest
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE a (k INTEGER NOT NULL, ts INTEGER NOT NULL,
                        v INTEGER);
        CREATE TABLE b (k INTEGER NOT NULL, v INTEGER);
        CREATE TABLE c (k INTEGER NOT NULL, w INTEGER);
        CREATE VIEW ok as
            SELECT x.k, x.ts,
                   COUNT(*) OVER (PARTITION BY x.k ORDER BY x.ts
                       RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS c
            FROM (SELECT t1.*, t2.* FROM a t1
                  LEFT JOIN c t2 ON t1.k = t2.k) x;
    """)
    # join-key-only duplication still lowers (demo02's cc_num shape)
    assert eng.view_strategy("ok") == "rolling"
    # duplicate v is not equated in the ON condition -> expansion
    # refuses; the raw SQL is genuinely ambiguous and errors loudly
    with pytest.raises(Exception, match="(?i)ambiguous"):
        eng.execute("""
            CREATE VIEW f as
                SELECT x.k, x.ts,
                       COUNT(*) OVER (PARTITION BY x.k ORDER BY x.ts
                           RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)
                           AS c
                FROM (SELECT t1.*, t2.* FROM a t1
                      LEFT JOIN b t2 ON t1.k = t2.k) x;
        """)


def test_partition_window_zero_over_unlowers_explicitly(spark):
    """ADVICE r5: a SQL with no OVER item raises _UnloweredShape from
    _PartitionWindowMaintainer instead of TypeError-ing on pks=None."""
    import pytest
    from database_stream_processor_spark.sql import (
        Engine as _E, _PartitionWindowMaintainer, _PROJECT_RE,
        _UnloweredShape)
    eng = Engine(spark)
    eng.execute("CREATE TABLE t (k INTEGER NOT NULL, v INTEGER);")
    sql = "SELECT k, v FROM t WHERE v <= 5"
    m = _PROJECT_RE.match(sql)
    with pytest.raises(_UnloweredShape):
        _PartitionWindowMaintainer(eng, "nv", sql, m)


GLOBAL_WIN_SQL = """
    SELECT ts, cat, v,
           ROW_NUMBER() OVER (ORDER BY ts) AS rn,
           RANK() OVER (ORDER BY ts) AS rk,
           DENSE_RANK() OVER (ORDER BY ts) AS dr,
           SUM(v) OVER (ORDER BY ts) AS running,
           COUNT(v) OVER (ORDER BY ts) AS nseen,
           MIN(v) OVER (ORDER BY ts) AS mn,
           MAX(v) OVER (ORDER BY ts) AS mx,
           AVG(v) OVER (ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS am
    FROM {src} WHERE v IS NOT NULL OR cat IS NOT NULL"""


def _gw_det(rows):
    """Deterministic columns only: rn/am depend on tie order (ROWS
    frame), which SQL leaves unspecified; rn is checked as a multiset."""
    return sorted([(r["ts"], r["cat"], r["v"], r["rk"], r["dr"],
                    r["running"], r["nseen"], r["mn"], r["mx"])
                   for r in rows], key=str)


@pytest.mark.slow
def test_global_window_tail_recompute_matches_recompute(spark):
    """Global OVER (no PARTITION BY) lowers to bounded tail recompute
    and stays exact across interleaved inserts and retractions,
    including NULL values and duplicate (tied) order keys."""
    import random
    eng = Engine(spark)
    eng.execute("CREATE TABLE ev (ts INTEGER NOT NULL, cat VARCHAR, "
                "v FLOAT64);")
    eng.execute("CREATE VIEW glob as"
                + GLOBAL_WIN_SQL.format(src="ev") + ";")
    assert eng.view_strategy("glob") == "global_window"
    random.seed(7)
    rows = [(random.randrange(100), random.choice(["a", "b", None]),
             random.choice([None, float(random.randrange(10))]))
            for _ in range(60)]
    schema = "ts int, cat string, v double"
    b1, b2, b3 = rows[:30], rows[30:50], rows[50:]
    eng.push("ev", spark.createDataFrame(b1, schema)); eng.step()
    eng.push("ev", spark.createDataFrame(b2, schema)); eng.step()
    eng.push("ev", spark.createDataFrame(b1[:7], schema), weight=-1)
    eng.step()
    eng.push("ev", spark.createDataFrame(b3, schema)); eng.step()
    remaining = b1[7:] + b2 + b3
    spark.createDataFrame(remaining, schema) \
        .createOrReplaceTempView("__gw_orc")
    want = spark.sql(GLOBAL_WIN_SQL.format(src="__gw_orc")).collect()
    got = eng.view("glob").collect()
    assert _gw_det(got) == _gw_det(want)
    assert sorted(r["rn"] for r in got) == sorted(r["rn"] for r in want)


def test_global_window_null_order_key_full_recompute(spark):
    """A delta touching a NULL order key forces the full-recompute path
    (NULLs sort first, so they live in the permanent head otherwise) —
    results still match one-shot evaluation."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ev (ts INTEGER, v FLOAT64);
        CREATE VIEW g as
            SELECT ts, v, COUNT(*) OVER (ORDER BY ts) AS rn
            FROM ev;
    """)
    assert eng.view_strategy("g") == "global_window"
    schema = "ts int, v double"
    eng.push("ev", spark.createDataFrame(
        [(5, 1.0), (None, 2.0), (9, 3.0)], schema))
    eng.step()
    eng.push("ev", spark.createDataFrame([(None, 4.0), (1, 5.0)], schema))
    eng.step()
    eng.push("ev", spark.createDataFrame([(None, 2.0)], schema), weight=-1)
    eng.step()
    spark.createDataFrame(
        [(5, 1.0), (9, 3.0), (None, 4.0), (1, 5.0)], schema) \
        .createOrReplaceTempView("__gwn_orc")
    want = sorted((tuple(r) for r in spark.sql(
        "SELECT ts, v, COUNT(*) OVER (ORDER BY ts) AS rn "
        "FROM __gwn_orc").collect()), key=str)
    got = sorted((tuple(r) for r in eng.view("g").collect()), key=str)
    assert got == want


def test_global_window_rejects_unsupported_shapes(spark):
    """Bounded non-prefix frames and mixed ORDER BY clauses unlower
    (fallback), never silently mis-maintain."""
    eng = Engine(spark)
    eng.execute("CREATE TABLE t (ts INTEGER NOT NULL, v FLOAT64);")
    eng.execute("CREATE VIEW d1 as SELECT ts, "
                "SUM(v) OVER (ORDER BY ts ROWS BETWEEN 3 PRECEDING "
                "AND CURRENT ROW) AS a FROM t;")
    assert eng.view_strategy("d1") == "differentiate"
    eng.execute("CREATE VIEW d2 as SELECT ts, "
                "SUM(v) OVER (ORDER BY ts) AS a, "
                "COUNT(*) OVER (ORDER BY v) AS b FROM t;")
    assert eng.view_strategy("d2") == "differentiate"


def test_comma_from_normalizer_units(spark):
    """r6 VERDICT ask #4 plumbing: implicit comma joins normalize to
    explicit qualified JOIN … ON chains; non-equality and unattributable
    conjuncts stay in the residual WHERE; true cross joins and unknown
    tables pass through unchanged; a subquery reusing an outer table
    name unaliased gets a fresh alias and qualified correlation refs."""
    from database_stream_processor_spark.sql import _normalize_comma_from
    eng = Engine(spark)
    eng.execute("CREATE TABLE ta (ka BIGINT, va BIGINT);"
                "CREATE TABLE tb (kb BIGINT, vb BIGINT);")
    out = _normalize_comma_from(
        eng, "SELECT ka, vb FROM ta, tb WHERE ka = kb AND va > 3")
    assert out == ("SELECT ka, vb FROM ta JOIN tb ON ta.ka = tb.kb "
                   "WHERE va > 3")
    # qualified refs and aliases survive; alias qualifies the ON side
    out = _normalize_comma_from(
        eng, "SELECT x.ka FROM ta x, tb WHERE x.ka = kb")
    assert out == "SELECT x.ka FROM ta x JOIN tb ON x.ka = tb.kb"
    # no linking equality → unchanged (cross join)
    cross = "SELECT ka, kb FROM ta, tb WHERE va > 3"
    assert _normalize_comma_from(eng, cross) == cross
    # unknown table → unchanged
    unk = "SELECT 1 FROM ta, nosuch WHERE ka = kb"
    assert _normalize_comma_from(eng, unk) == unk
    # OR-of-conjunctions (TPC-H q19): branch-common conjuncts hoist out
    # of the disjunction so the join equality can become the ON —
    # BETWEEN's AND never splits
    out = _normalize_comma_from(
        eng, "SELECT ka FROM ta, tb WHERE "
             "(ka = kb AND va BETWEEN 1 AND 5) OR "
             "(ka = kb AND vb = 9)")
    assert out == ("SELECT ka FROM ta JOIN tb ON ta.ka = tb.kb WHERE "
                   "((va BETWEEN 1 AND 5) OR (vb = 9))")
    # a branch equal to the common set absorbs the whole disjunction
    out = _normalize_comma_from(
        eng, "SELECT ka FROM ta, tb WHERE "
             "(ka = kb) OR (ka = kb AND vb = 9)")
    assert out == "SELECT ka FROM ta JOIN tb ON ta.ka = tb.kb"
    # subquery shadowing: inner `ta` gets a fresh alias, the correlated
    # outer ref and the inner refs come out qualified
    out = _normalize_comma_from(
        eng, "SELECT ka FROM ta, tb WHERE ka = kb AND va = "
             "(SELECT MIN(va) FROM ta, tb WHERE ka = kb AND vb = 1)")
    assert "FROM ta ta__s0 JOIN tb tb__s1 ON" in out
    assert "ta__s1" not in out
    inner = out[out.index("(SELECT"):]
    assert "MIN(ta__s0.va)" in inner
    # inner ka/kb resolve to the INNER refs (SQL scoping), vb literal
    # filter qualified too
    assert "ta__s0.ka = tb__s1.kb" in inner
    assert "tb__s1.vb = 1" in inner


@pytest.mark.slow
def test_verbatim_tpch_q2_text_through_engine(spark):
    """ACCEPTANCE (r6 VERDICT ask #4): the published TPC-H q2 text —
    comma FROM, bare columns, correlated subquery over the same table
    names, ORDER BY … DESC LIMIT — runs through Engine.execute, lowers
    (global_topk over a maintained scalar-subquery stack, NOT
    snapshot-diff), and matches one-shot evaluation after inserts and a
    retraction that dethrones reigning minima."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE part (p_partkey BIGINT NOT NULL, p_mfgr VARCHAR,
                           p_size BIGINT, p_type VARCHAR);
        CREATE TABLE supplier (s_suppkey BIGINT NOT NULL,
                               s_acctbal BIGINT, s_name VARCHAR,
                               s_nationkey BIGINT);
        CREATE TABLE partsupp (ps_partkey BIGINT, ps_suppkey BIGINT,
                               ps_supplycost BIGINT);
        CREATE TABLE nation (n_nationkey BIGINT, n_name VARCHAR,
                             n_regionkey BIGINT);
        CREATE TABLE region (r_regionkey BIGINT, r_name VARCHAR);
    """)
    body = """
        select s_acctbal, s_name, n_name, p_partkey, p_mfgr
        from part, supplier, partsupp, nation, region
        where p_partkey = ps_partkey and s_suppkey = ps_suppkey
          and p_size = 1 and p_type like '%T%'
          and s_nationkey = n_nationkey and n_regionkey = r_regionkey
          and r_name = 'R1'
          and ps_supplycost = (
              select min(ps_supplycost)
              from partsupp, supplier, nation, region
              where p_partkey = ps_partkey and s_suppkey = ps_suppkey
                and s_nationkey = n_nationkey
                and n_regionkey = r_regionkey and r_name = 'R1')
        order by s_acctbal desc, n_name, s_name, p_partkey limit 4"""
    eng.execute("CREATE VIEW q2 as " + body + ";")
    assert eng.view_strategy("q2") == "global_topk"
    assert eng.view_strategy("__q2_pre") == "project"
    parts = [(i, f"m{i}", 1, "TYPE") for i in range(6)]
    sups = [(j, 100 - j, f"s{j}", j % 2) for j in range(4)]
    offers = [(i, j, 10 * i + j) for i in range(6) for j in range(4)]
    nats = [(0, "N0", 0), (1, "N1", 0)]
    regs = [(0, "R1")]
    eng.push("part", spark.createDataFrame(
        parts, "p_partkey long, p_mfgr string, p_size long, "
               "p_type string"))
    eng.push("supplier", spark.createDataFrame(
        sups, "s_suppkey long, s_acctbal long, s_name string, "
              "s_nationkey long"))
    eng.push("partsupp", spark.createDataFrame(
        offers, "ps_partkey long, ps_suppkey long, ps_supplycost long"))
    eng.push("nation", spark.createDataFrame(
        nats, "n_nationkey long, n_name string, n_regionkey long"))
    eng.push("region", spark.createDataFrame(
        regs, "r_regionkey long, r_name string"))
    eng.step()
    # retract the reigning minimum offers (supplier 0's): runner-ups win
    eng.push("partsupp", spark.createDataFrame(
        [(i, 0, 10 * i) for i in range(6)],
        "ps_partkey long, ps_suppkey long, ps_supplycost long"),
        weight=-1)
    eng.step()
    for name, rows, schema in [
            ("part", parts, "p_partkey long, p_mfgr string, "
                            "p_size long, p_type string"),
            ("supplier", sups, "s_suppkey long, s_acctbal long, "
                               "s_name string, s_nationkey long"),
            ("partsupp", [o for o in offers if o[1] != 0],
             "ps_partkey long, ps_suppkey long, ps_supplycost long"),
            ("nation", nats, "n_nationkey long, n_name string, "
                             "n_regionkey long"),
            ("region", regs, "r_regionkey long, r_name string")]:
        spark.createDataFrame(rows, schema) \
            .createOrReplaceTempView(f"__vq2_{name}")
    one_shot = body
    for t in ["partsupp", "supplier", "nation", "region", "part"]:
        one_shot = re.sub(rf"\b{t}\b", f"__vq2_{t}", one_shot)
    want = sorted((tuple(r) for r in spark.sql(one_shot).collect()),
                  key=str)
    got = sorted((tuple(r) for r in eng.view("q2").collect()), key=str)
    assert got == want and len(got) == 4


def test_order_by_without_limit_stripped(spark):
    """A trailing no-LIMIT ORDER BY (verbatim TPC-H q1/q5 tails) is
    semantically void for a maintained relation — the view still lowers
    to its aggregate maintainer instead of snapshot-diffing."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k VARCHAR, v BIGINT);
        CREATE VIEW agg as
            SELECT k, SUM(v) AS sv FROM t GROUP BY k
            ORDER BY sv DESC, k;
    """)
    assert eng.view_strategy("agg") == "linear_agg"
    eng.push("t", spark.createDataFrame(
        [("a", 3), ("b", 5), ("a", 4)], "k string, v long"))
    eng.step()
    got = sorted(tuple(r) for r in eng.view("agg").collect())
    assert got == [("a", 7), ("b", 5)]


@pytest.mark.slow
def test_aliased_group_keys_nonlinear_distinct_grouping_sets(spark):
    """r6 VERDICT ask #6: `k AS g` grouping keys lower through the
    NONLINEAR (MIN/MAX touched-group), DISTINCT-agg, and grouping-sets
    maintainers (previously linear/join/multi-join only — these three
    fell back) and match one-shot semantics across a retraction that
    dethrones a group maximum and empties a whole group."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k INTEGER NOT NULL, v BIGINT, w BIGINT);
        CREATE VIEW nl as SELECT k AS g, MIN(v) AS mn, MAX(v) AS mx
            FROM t GROUP BY k;
        CREATE VIEW da as SELECT k AS g, COUNT(DISTINCT v) AS dv,
            SUM(DISTINCT v) AS sv FROM t GROUP BY k;
        CREATE VIEW gs as SELECT k AS g, SUM(w) AS sw
            FROM t GROUP BY ROLLUP(k);
    """)
    assert eng.view_strategy("nl") == "nonlinear_agg"
    assert eng.view_strategy("da") == "distinct_agg"
    assert eng.view_strategy("gs") == "grouping_sets_agg"
    schema = "k int, v long, w long"
    rows1 = [(1, 5, 2), (1, 9, 3), (2, 7, 1), (3, 1, 1)]
    rows2 = [(2, 7, 4), (1, 5, 6)]
    eng.push("t", spark.createDataFrame(rows1, schema)); eng.step()
    eng.push("t", spark.createDataFrame(rows2, schema)); eng.step()
    eng.push("t", spark.createDataFrame([(1, 9, 3), (3, 1, 1)], schema),
             weight=-1)
    eng.step()
    remaining = [(1, 5, 2), (2, 7, 1), (2, 7, 4), (1, 5, 6)]
    spark.createDataFrame(remaining, schema) \
        .createOrReplaceTempView("__akt_orc")
    for view, sql in [
            ("nl", "SELECT k AS g, MIN(v) AS mn, MAX(v) AS mx "
                   "FROM __akt_orc GROUP BY k"),
            ("da", "SELECT k AS g, COUNT(DISTINCT v) AS dv, "
                   "SUM(DISTINCT v) AS sv FROM __akt_orc GROUP BY k"),
            ("gs", "SELECT k AS g, SUM(w) AS sw FROM __akt_orc "
                   "GROUP BY ROLLUP(k)")]:
        want = sorted((tuple(r) for r in spark.sql(sql).collect()),
                      key=str)
        got = sorted((tuple(r) for r in eng.view(view).collect()),
                     key=str)
        assert got == want, view


@pytest.mark.slow
def test_expression_of_aggregates_select_items(spark):
    """Expressions OVER aggregates in the select list (TPC-H q14's
    ratio-of-sums) lower: each aggregate call absorbs as a hidden
    merged partial and the item finalizes over them — in GROUPED views
    (linear path) and in GROUP-BY-less views over a join chain
    (`_global_agg_over_from` + `_GlobalAggMaintainer`), with string
    literals inside aggregate arguments masked during parsing."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k VARCHAR NOT NULL, tag VARCHAR, v BIGINT);
        CREATE TABLE d (k VARCHAR NOT NULL, grp VARCHAR);
        CREATE VIEW ratio_g as
            SELECT k, SUM(CASE WHEN tag = 'a' THEN v ELSE 0 END)
                      * 100 / SUM(v) AS pct
            FROM t GROUP BY k;
        CREATE VIEW ratio_all as
            SELECT SUM(CASE WHEN tag LIKE 'a%' THEN v ELSE 0 END)
                   * 100 / SUM(v) AS pct,
                   COUNT(*) AS n
            FROM t JOIN d ON t.k = d.k WHERE grp <> 'x';
    """)
    assert eng.view_strategy("ratio_g") == "linear_agg"
    assert eng.view_strategy("ratio_all") == "global_agg"
    assert eng.view_strategy("__ratio_all_src") == "join"
    ts = "k string, tag string, v long"
    rows1 = [("p", "a", 6), ("p", "b", 2), ("q", "a", 1), ("q", "b", 3)]
    rows2 = [("p", "a", 2), ("q", "c", 4)]
    dd = [("p", "y"), ("q", "y")]
    eng.push("t", spark.createDataFrame(rows1, ts))
    eng.push("d", spark.createDataFrame(dd, "k string, grp string"))
    eng.step()
    eng.push("t", spark.createDataFrame(rows2, ts)); eng.step()
    eng.push("t", spark.createDataFrame([("p", "b", 2)], ts), weight=-1)
    eng.step()
    remaining = [r for r in rows1 if r != ("p", "b", 2)] + rows2
    spark.createDataFrame(remaining, ts).createOrReplaceTempView("__ea_t")
    spark.createDataFrame(dd, "k string, grp string") \
        .createOrReplaceTempView("__ea_d")
    want_g = sorted((tuple(r) for r in spark.sql(
        "SELECT k, SUM(CASE WHEN tag = 'a' THEN v ELSE 0 END) * 100 "
        "/ SUM(v) AS pct FROM __ea_t GROUP BY k").collect()), key=str)
    got_g = sorted((tuple(r) for r in eng.view("ratio_g").collect()),
                   key=str)
    assert got_g == want_g
    want_a = [tuple(r) for r in spark.sql(
        "SELECT SUM(CASE WHEN tag LIKE 'a%' THEN v ELSE 0 END) * 100 "
        "/ SUM(v) AS pct, COUNT(*) AS n FROM __ea_t t JOIN __ea_d d "
        "ON t.k = d.k WHERE grp <> 'x'").collect()]
    got_a = [tuple(r) for r in eng.view("ratio_all").collect()]
    assert got_a == want_a


def test_from_subquery_lift(spark):
    """Derived-table FROM (verbatim TPC-H q9/q13 nesting): the subquery
    lifts into a hidden maintained view, the derived alias and its
    qualifiers strip, and the outer re-lowers over the hidden delta —
    values match one-shot evaluation across a retraction."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE a (k BIGINT NOT NULL, x BIGINT);
        CREATE TABLE b (k BIGINT NOT NULL, g VARCHAR);
        CREATE VIEW v as
            select d.g, sum(d.x) as sx
            from (select b.g, a.x from a join b on a.k = b.k
                  where a.x > 0) as d
            group by d.g;
    """)
    assert eng.view_strategy("v") == "linear_agg"
    assert eng.view_strategy("__v_sub") == "join"
    eng.push("a", spark.createDataFrame(
        [(1, 5), (2, -1), (3, 7), (1, 2)], "k long, x long"))
    eng.push("b", spark.createDataFrame(
        [(1, "p"), (2, "p"), (3, "q")], "k long, g string"))
    eng.step()
    eng.push("a", spark.createDataFrame([(3, 7)], "k long, x long"),
             weight=-1)
    eng.step()
    got = sorted(tuple(r) for r in eng.view("v").collect())
    assert got == [("p", 7)]


@pytest.mark.slow
def test_left_join_aggregate_stack(spark):
    """COUNT/SUM over a LEFT JOIN grouped by left keys (TPC-H q13's
    inner) lowers as right-partials → outer join → final linear agg —
    zero-match left keys emit COUNT 0 / SUM NULL, duplicate left rows
    multiply counts exactly as SQL row-level grouping, and right-only
    ON residuals gate matches without dropping left rows."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE c (ck BIGINT NOT NULL);
        CREATE TABLE o (ok BIGINT, cust BIGINT, tag VARCHAR);
        CREATE VIEW v as
            SELECT ck, COUNT(ok) AS n, SUM(ok) AS s
            FROM c LEFT OUTER JOIN o ON ck = cust AND tag <> 'bad'
            GROUP BY ck;
    """)
    assert eng.view_strategy("v") == "linear_agg"
    assert eng.view_strategy("__v_lj") == "left_join"
    assert eng.view_strategy("__v_g") == "linear_agg"
    # ck=2 duplicated on the left: its count doubles per SQL semantics
    eng.push("c", spark.createDataFrame(
        [(1,), (2,), (2,), (3,)], "ck long"))
    eng.push("o", spark.createDataFrame(
        [(10, 1, "ok"), (11, 1, "bad"), (12, 2, "ok"), (13, 9, "ok")],
        "ok long, cust long, tag string"))
    eng.step()
    eng.push("o", spark.createDataFrame(
        [(10, 1, "ok")], "ok long, cust long, tag string"), weight=-1)
    eng.step()
    got = sorted((tuple(r) for r in eng.view("v").collect()), key=str)
    spark.createDataFrame(
        [(1,), (2,), (2,), (3,)], "ck long") \
        .createOrReplaceTempView("__lja_c")
    spark.createDataFrame(
        [(11, 1, "bad"), (12, 2, "ok"), (13, 9, "ok")],
        "ok long, cust long, tag string") \
        .createOrReplaceTempView("__lja_o")
    want = sorted((tuple(r) for r in spark.sql(
        "SELECT ck, COUNT(ok) AS n, SUM(ok) AS s FROM __lja_c "
        "LEFT OUTER JOIN __lja_o ON ck = cust AND tag <> 'bad' "
        "GROUP BY ck").collect()), key=str)
    assert got == want


def test_repeated_table_join_chain_dedupes(spark):
    """A table appearing twice in one join chain (TPC-H q7's `nation
    n1, nation n2`) lowers: the second occurrence clones through a
    hidden projection view so the multilinear legs bind its pre/post
    states separately — a self-enriching edge join stays exact under a
    retraction that touches BOTH roles of the repeated table."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE e (src BIGINT, dst BIGINT);
        CREATE TABLE n (id BIGINT NOT NULL, nm VARCHAR);
        CREATE VIEW v as
            SELECT a.nm AS snm, b.nm AS dnm
            FROM e JOIN n a ON e.src = a.id JOIN n b ON e.dst = b.id;
    """)
    assert eng.view_strategy("v") == "multi_join"
    assert eng.view_strategy("__v_dup0") == "project"
    eng.push("e", spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"))
    eng.push("n", spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id long, nm string"))
    eng.step()
    # retract node 2: removes it as a SOURCE of (2,3) and a DEST of (1,2)
    eng.push("n", spark.createDataFrame([(2, "y")], "id long, nm string"),
             weight=-1)
    eng.step()
    got = sorted(tuple(r) for r in eng.view("v").collect())
    assert got == []
    eng.push("n", spark.createDataFrame([(2, "w")], "id long, nm string"))
    eng.step()
    got = sorted(tuple(r) for r in eng.view("v").collect())
    assert got == [("w", "z"), ("x", "w")]


def test_agg_over_bare_correlated_exists(spark):
    """Verbatim TPC-H q4 shape: a grouped aggregate over an
    EXISTS-filtered table with a BARE correlation term lowers —
    `_match_subquery_filter` resolves unqualified equality sides by
    schema ownership (inner-first, SQL scoping) and
    `_agg_over_subquery_filter` layers the aggregate over the hidden
    filtered view's delta.  A retraction that removes an order's last
    qualifying lineitem drops it from the count."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE o (ok BIGINT NOT NULL, pr VARCHAR);
        CREATE TABLE l (lk BIGINT, qty BIGINT);
        CREATE VIEW v as
            select pr, count(*) as n from o
            where exists (select 1 from l where lk = ok and qty > 5)
            group by pr;
    """)
    assert eng.view_strategy("v") == "linear_agg"
    assert eng.view_strategy("__v_src") == "exists"
    eng.push("o", spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "A")], "ok long, pr string"))
    eng.push("l", spark.createDataFrame(
        [(1, 9), (1, 2), (2, 3), (3, 8)], "lk long, qty long"))
    eng.step()
    eng.push("l", spark.createDataFrame([(3, 8)], "lk long, qty long"),
             weight=-1)
    eng.step()
    got = sorted(tuple(r) for r in eng.view("v").collect())
    assert got == [("A", 1)]


def test_grouping_sets_having_only_aggregate_absorbs(spark):
    """A HAVING aggregate with no select-list counterpart (HAVING
    COUNT(*) > 2 without a count output) absorbs as a hidden partial in
    the grouping-sets maintainer too (r6 VERDICT optional ask #8) —
    marker super-aggregate rows filter by their own absorbed counts."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k VARCHAR NOT NULL, c VARCHAR NOT NULL,
                        v BIGINT);
        CREATE VIEW gs as
            SELECT k, c, SUM(v) AS sv FROM t GROUP BY ROLLUP(k, c)
            HAVING COUNT(*) > 2;
    """)
    assert eng.view_strategy("gs") == "grouping_sets_agg"
    schema = "k string, c string, v long"
    rows1 = [("a", "x", 1), ("a", "x", 2), ("a", "y", 9), ("b", "x", 5)]
    rows2 = [("a", "x", 3), ("b", "x", 7), ("b", "x", 2)]
    eng.push("t", spark.createDataFrame(rows1, schema)); eng.step()
    eng.push("t", spark.createDataFrame(rows2, schema)); eng.step()
    # retraction drops (b, x) back below the HAVING bar
    eng.push("t", spark.createDataFrame([("b", "x", 7)], schema),
             weight=-1)
    eng.step()
    remaining = rows1 + [("a", "x", 3), ("b", "x", 2)]
    spark.createDataFrame(remaining, schema) \
        .createOrReplaceTempView("__gsh_orc")
    want = sorted((tuple(r) for r in spark.sql(
        "SELECT k, c, SUM(v) AS sv FROM __gsh_orc "
        "GROUP BY ROLLUP(k, c) HAVING COUNT(*) > 2").collect()),
        key=str)
    got = sorted((tuple(r) for r in eng.view("gs").collect()), key=str)
    assert got == want


def test_group_by_key_missing_from_select_falls_back(spark):
    """ADVICE r6 #2: a GROUP BY key with no select item (legal SQL —
    SELECT a, SUM(x) FROM t GROUP BY a, b) must NOT take the linear-agg
    path: the delta partial would drop b and the merge would collapse
    distinct (a, b) groups.  It falls back to snapshot-diff and matches
    one-shot semantics (duplicate output rows included)."""
    eng = Engine(spark)
    eng.execute("CREATE TABLE t (a INTEGER NOT NULL, b INTEGER NOT NULL, "
                "x BIGINT);")
    eng.execute("CREATE VIEW v as SELECT a, SUM(x) AS sx FROM t "
                "GROUP BY a, b;")
    assert eng.view_strategy("v") == "differentiate"
    schema = "a int, b int, x long"
    eng.push("t", spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (2, 1, 5)], schema))
    eng.step()
    eng.push("t", spark.createDataFrame([(1, 1, 7)], schema))
    eng.step()
    got = sorted((tuple(r) for r in eng.view("v").collect()), key=str)
    assert got == sorted([(1, 17), (1, 20), (2, 5)], key=str)


@pytest.mark.slow
def test_scalar_having_key_alias_not_rewritten(spark):
    """ADVICE r6 #3: only aggregate-call select expressions are
    rewritten to their aliases in the HAVING text.  A short aliased key
    expression (cost_c AS c) previously rewrote its own substring inside
    the aggregate text (SUM(cost_c*qty) → SUM(c*qty)), breaking the
    aggregate match and falling back — the view must lower."""
    import duckdb
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ps (pk BIGINT NOT NULL, cost_c BIGINT, qty BIGINT);
        CREATE VIEW v as
            SELECT pk, cost_c AS c, SUM(cost_c * qty) AS value_c FROM ps
            GROUP BY pk, cost_c
            HAVING SUM(cost_c * qty) > (SELECT SUM(p2.cost_c * p2.qty)
                                        * 0.2 FROM ps p2);
    """)
    assert eng.view_strategy("v") == "project"
    schema = "pk long, cost_c long, qty long"
    rows1 = [(1, 10, 3), (2, 4, 1), (3, 50, 2), (1, 10, 1)]
    rows2 = [(2, 4, 9), (3, 50, 1)]
    eng.push("ps", spark.createDataFrame(rows1, schema)); eng.step()
    eng.push("ps", spark.createDataFrame(rows2, schema)); eng.step()
    con = duckdb.connect()
    con.execute("CREATE TABLE ps (pk BIGINT, cost_c BIGINT, qty BIGINT)")
    con.executemany("INSERT INTO ps VALUES (?,?,?)", rows1 + rows2)
    want = sorted((tuple(r) for r in con.execute(
        "SELECT pk, cost_c AS c, CAST(SUM(cost_c*qty) AS BIGINT) "
        "AS value_c FROM ps GROUP BY pk, cost_c "
        "HAVING SUM(cost_c*qty) > (SELECT SUM(cost_c*qty) * 0.2 FROM ps)"
    ).fetchall()), key=str)
    got = sorted((tuple(r) for r in eng.view("v").collect()), key=str)
    assert got == want


def test_global_window_desc_matches_recompute(spark):
    """r6 VERDICT ask #5: DESC global windows lower (strategy
    global_window) — the head/tail split mirrors (cutoff = MAX of the
    delta), NULLs ride Spark's DESC default NULLS LAST in the permanent
    tail, and interleaved inserts/retractions match one-shot SQL."""
    sql = ("SELECT ts, v, ROW_NUMBER() OVER (ORDER BY ts DESC) AS rn, "
           "RANK() OVER (ORDER BY ts DESC) AS rk, "
           "DENSE_RANK() OVER (ORDER BY ts DESC) AS dr, "
           "SUM(v) OVER (ORDER BY ts DESC) AS running, "
           "MIN(v) OVER (ORDER BY ts DESC) AS mn FROM {src}")
    eng = Engine(spark)
    eng.execute("CREATE TABLE ev (ts INTEGER, v FLOAT64);")
    eng.execute("CREATE VIEW g as " + sql.format(src="ev") + ";")
    assert eng.view_strategy("g") == "global_window"
    schema = "ts int, v double"
    b1 = [(5, 1.0), (9, 2.0), (2, 3.0), (None, 9.0)]
    b2 = [(7, 4.0), (9, 5.0), (1, 6.0)]         # 9 ties; 1 below head
    b3 = [(None, 8.0)]                          # all-NULL delta (tail)
    eng.push("ev", spark.createDataFrame(b1, schema)); eng.step()
    eng.push("ev", spark.createDataFrame(b2, schema)); eng.step()
    eng.push("ev", spark.createDataFrame(b3, schema)); eng.step()
    eng.push("ev", spark.createDataFrame([b1[1]], schema), weight=-1)
    eng.step()
    remaining = b1[:1] + b1[2:] + b2 + b3
    spark.createDataFrame(remaining, schema) \
        .createOrReplaceTempView("__gwd_orc")
    want = spark.sql(sql.format(src="__gwd_orc")).collect()
    got = eng.view("g").collect()
    det = lambda rows: sorted(  # noqa: E731 — rn is tie-order-dependent
        [(r["ts"], r["v"], r["rk"], r["dr"], r["running"], r["mn"])
         for r in rows], key=str)
    assert det(got) == det(want)
    assert sorted(r["rn"] for r in got) == sorted(r["rn"] for r in want)


@pytest.mark.slow
def test_global_window_explicit_nulls_modes(spark):
    """Explicit NULLS FIRST/LAST against the opposite direction default:
    ASC NULLS LAST keeps the NULL block in the permanent tail (an
    all-NULL delta recomputes only that block), DESC NULLS FIRST forces
    full recompute on a NULL delta — both match one-shot SQL."""
    for order in ("ts ASC NULLS LAST", "ts DESC NULLS FIRST"):
        sql = (f"SELECT ts, v, COUNT(*) OVER (ORDER BY {order}) AS rn, "
               f"SUM(v) OVER (ORDER BY {order}) AS running FROM {{src}}")
        eng = Engine(spark)
        eng.execute("CREATE TABLE ev (ts INTEGER, v BIGINT);")
        eng.execute("CREATE VIEW g as " + sql.format(src="ev") + ";")
        assert eng.view_strategy("g") == "global_window", order
        schema = "ts int, v long"
        eng.push("ev", spark.createDataFrame(
            [(4, 1), (None, 2), (8, 3)], schema))
        eng.step()
        eng.push("ev", spark.createDataFrame([(None, 4)], schema))
        eng.step()
        eng.push("ev", spark.createDataFrame([(6, 5), (None, 2)], schema))
        eng.push("ev", spark.createDataFrame([(8, 3)], schema), weight=-1)
        eng.step()
        spark.createDataFrame(
            [(4, 1), (None, 2), (None, 4), (6, 5), (None, 2)], schema) \
            .createOrReplaceTempView("__gwn2_orc")
        want = sorted((tuple(r) for r in
                       spark.sql(sql.format(src="__gwn2_orc")).collect()),
                      key=str)
        got = sorted((tuple(r) for r in eng.view("g").collect()), key=str)
        assert got == want, order


def test_global_window_rows_frame_preserved(spark):
    """ADVICE r6 #1: an explicit ROWS BETWEEN UNBOUNDED PRECEDING AND
    CURRENT ROW frame survives into the rebuilt tail SQL — on tied order
    keys ROWS gives each peer its own prefix while RANGE gives all peers
    the group total, so the value multiset discriminates.  Tied rows
    share v, making the multiset deterministic."""
    sql = ("SELECT ts, v, SUM(v) OVER (ORDER BY ts ROWS BETWEEN "
           "UNBOUNDED PRECEDING AND CURRENT ROW) AS running FROM {src}")
    eng = Engine(spark)
    eng.execute("CREATE TABLE ev (ts INTEGER NOT NULL, v BIGINT);")
    eng.execute("CREATE VIEW g as " + sql.format(src="ev") + ";")
    assert eng.view_strategy("g") == "global_window"
    schema = "ts int, v long"
    b1 = [(1, 10), (2, 5), (2, 5), (3, 1)]
    b2 = [(2, 5), (4, 7)]       # cutoff lands inside the tie group
    eng.push("ev", spark.createDataFrame(b1, schema)); eng.step()
    eng.push("ev", spark.createDataFrame(b2, schema)); eng.step()
    spark.createDataFrame(b1 + b2, schema) \
        .createOrReplaceTempView("__gwf_orc")
    want = sorted((tuple(r) for r in
                   spark.sql(sql.format(src="__gwf_orc")).collect()),
                  key=str)
    got = sorted((tuple(r) for r in eng.view("g").collect()), key=str)
    assert got == want
    # RANGE over the same data differs (peers collapse) — proves the
    # multiset above actually discriminates the two frames.
    range_rows = sorted((tuple(r) for r in spark.sql(
        "SELECT ts, v, SUM(v) OVER (ORDER BY ts) AS running "
        "FROM __gwf_orc").collect()), key=str)
    assert range_rows != want


def test_global_window_dense_rank_null_head_group(spark):
    """DENSE_RANK's head base counts distinct order tuples via a STRUCT
    so a permanent-head NULL group is counted (bare count(DISTINCT x)
    would skip it and shift every tail rank by one)."""
    sql = ("SELECT ts, DENSE_RANK() OVER (ORDER BY ts) AS dr FROM {src}")
    eng = Engine(spark)
    eng.execute("CREATE TABLE ev (ts INTEGER);")
    eng.execute("CREATE VIEW g as " + sql.format(src="ev") + ";")
    assert eng.view_strategy("g") == "global_window"
    schema = "ts int"
    eng.push("ev", spark.createDataFrame([(None,), (None,), (3,)], schema))
    eng.step()
    # no NULLs in this delta → NULL rows stay in the permanent head
    eng.push("ev", spark.createDataFrame([(5,), (7,)], schema))
    eng.step()
    spark.createDataFrame([(None,), (None,), (3,), (5,), (7,)], schema) \
        .createOrReplaceTempView("__gwdr_orc")
    want = sorted((tuple(r) for r in
                   spark.sql(sql.format(src="__gwdr_orc")).collect()),
                  key=str)
    got = sorted((tuple(r) for r in eng.view("g").collect()), key=str)
    assert got == want


@pytest.mark.slow
def test_nullable_not_in_three_valued_regimes(spark):
    """NOT IN over nullable columns tracks full three-valued SQL
    semantics through every regime flip: inner empty (NULL outer keys
    qualify), inner non-empty (they drop), inner holding a NULL (view
    empties), and back — each tick checked against DuckDB."""
    import duckdb
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE c (ck BIGINT NOT NULL, nk BIGINT);
        CREATE TABLE o (ok BIGINT NOT NULL, cust BIGINT);
        CREATE VIEW quiet as
            SELECT ck, nk FROM c WHERE nk NOT IN (SELECT cust FROM o);
    """)
    assert eng.view_strategy("quiet") == "not_in_nullable"
    S, T = "ck bigint, nk bigint", "ok bigint, cust bigint"

    def check(tag):
        crows = [tuple(r) for r in spark.sql("SELECT * FROM c").collect()]
        orows = [tuple(r) for r in spark.sql("SELECT * FROM o").collect()]
        got = sorted((tuple(r) for r in eng.view("quiet").collect()),
                     key=str)
        con = duckdb.connect()
        con.execute("CREATE TABLE c (ck BIGINT, nk BIGINT); "
                    "CREATE TABLE o (ok BIGINT, cust BIGINT)")
        if crows:
            con.executemany("INSERT INTO c VALUES (?,?)", crows)
        if orows:
            con.executemany("INSERT INTO o VALUES (?,?)", orows)
        want = sorted((tuple(r) for r in con.execute(
            "SELECT ck, nk FROM c WHERE nk NOT IN (SELECT cust FROM o)")
            .fetchall()), key=str)
        assert got == want, (tag, got, want)

    eng.push("c", spark.createDataFrame([(1, 10), (2, None), (3, 30)], S))
    eng.step(); check("inner empty: NULL outer qualifies")
    eng.push("o", spark.createDataFrame([(1, 10)], T))
    eng.step(); check("inner non-empty: NULL outer drops")
    eng.push("o", spark.createDataFrame([(2, None)], T))
    eng.step(); check("inner NULL: view empties")
    eng.push("c", spark.createDataFrame([(4, 40)], S))
    eng.step(); check("regime A stays empty under outer churn")
    eng.push("o", spark.createDataFrame([(2, None)], T), weight=-1)
    eng.step(); check("NULL retracted: anti-join again")
    eng.push("o", spark.createDataFrame([(1, 10)], T), weight=-1)
    eng.step(); check("inner emptied: all qualify incl NULL")
    eng.push("o", spark.createDataFrame([(5, 30), (6, 77)], T))
    eng.step(); check("B1 churn")
    eng.push("c", spark.createDataFrame([(7, 77), (8, None)], S))
    eng.step(); check("outer delta incl NULL key in B1")


def test_lenient_semi_null_free_fast_path(spark):
    """r11 verdict ask #5: the tuple-NOT-IN B1 restriction's NULL-free
    leg must be a broadcast HASH semi-join, with the nested-loop pass
    reserved for NULL-carriers.  (a) Non-nullable schema: the BNL legs
    are skipped STATICALLY — plan has a BroadcastHashJoin and ZERO
    BroadcastNestedLoopJoin; (b) nullable data with NULLs sprinkled on
    both sides: the split result equals the one-pass lenient BNL
    row-for-row (disjoint legs — no duplication)."""
    from database_stream_processor_spark.sql import (
        _NotInNullableTupleMaintainer as M)
    import random
    # (a) statically null-free
    df = spark.createDataFrame(
        [(k % 5, k % 3) for k in range(30)],
        "a long not null, b long not null")
    probe = spark.createDataFrame(
        [(1, 1), (2, 0)], "__t_0 long not null, __t_1 long not null")
    out = M._lenient_semi_split(df, ["a", "b"], probe)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    want = sorted(map(tuple, M._lenient_semi(df, ["a", "b"], probe)
                      .collect()))
    assert sorted(map(tuple, out.collect())) == want
    # (b) nullable, NULLs on both sides, duplicate df rows
    rng = random.Random(7)
    rows = [(rng.choice([None, 0, 1, 2]), rng.choice([None, 0, 1, 2]))
            for _ in range(60)]
    pr = [(rng.choice([None, 0, 1, 2]), rng.choice([None, 0, 1, 2]))
          for _ in range(6)]
    dfn = spark.createDataFrame(rows, "a long, b long")
    prn = spark.createDataFrame(pr, "__t_0 long, __t_1 long")
    got = sorted(map(tuple, M._lenient_semi_split(dfn, ["a", "b"], prn)
                     .collect()), key=str)
    want = sorted(map(tuple, M._lenient_semi(dfn, ["a", "b"], prn)
                      .collect()), key=str)
    assert got == want, (got, want)
    # null-free probe, nullable df: the null-free df slice goes hash
    prx = spark.createDataFrame([(1, 1)], "__t_0 long, __t_1 long") \
        .filter("__t_0 IS NOT NULL AND __t_1 IS NOT NULL")
    out2 = M._lenient_semi_split(dfn, ["a", "b"], prx)
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan2, plan2


@pytest.mark.slow
def test_nullable_tuple_not_in_three_valued_regimes(spark):
    """Row-value ``(a, b) NOT IN`` over NULLABLE columns (r10 verdict
    ask #4) — every tick compared against Spark's OWN null-aware
    anti-join on the same data, through all three regimes and every
    transition: B2 (empty inner), B1 with a PARTIAL-null inner row
    (lenient-overlap touched restriction), A (an ALL-null inner row
    empties the view), A→B1 on retraction of the all-null row, B1→B2
    on the inner emptying, and a mixed outer-retract + inner-insert
    tick.  NULLs appear in BOTH tuple positions on both sides."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE o (a BIGINT, b BIGINT, v BIGINT NOT NULL);
        CREATE TABLE i1 (x BIGINT, y BIGINT);
        CREATE VIEW f as
            SELECT a, b, v FROM o
            WHERE v > 0 AND (a, b) NOT IN (SELECT x, y FROM i1);
    """)
    assert eng.view_strategy("f") == "not_in_nullable_tuple"
    O, I = [], []
    TO, TI = "a long, b long, v long", "x long, y long"

    def check(tag, regime):
        odf = (spark.createDataFrame(O, TO) if O
               else spark.createDataFrame([], TO))
        idf = (spark.createDataFrame(I, TI) if I
               else spark.createDataFrame([], TI))
        odf.createOrReplaceTempView("__po")
        idf.createOrReplaceTempView("__pi")
        want = sorted(map(tuple, spark.sql(
            "SELECT a,b,v FROM __po WHERE v > 0 "
            "AND (a,b) NOT IN (SELECT x,y FROM __pi)").collect()),
            key=str)
        got = sorted(map(tuple, eng.view("f").collect()), key=str)
        assert got == want, (tag, got, want)
        assert eng._maintainers["f"]._regime() == regime, tag

    def push(tbl, rows, schema, w=1):
        eng.push(tbl, spark.createDataFrame(rows, schema), weight=w)

    t1 = [(1, 1, 5), (1, 2, 5), (2, 5, 5), (None, 5, 5), (None, 7, 5),
          (3, None, 5), (None, None, 5), (9, 9, 0)]
    push("o", t1, TO)
    O += t1
    eng.step()
    check("outer insert", "B2")
    t2 = [(1, 2), (2, 5), (1, None)]
    push("i1", t2, TI)
    I += t2
    eng.step()
    check("inner insert w/ partial null (B2->B1)", "B1")
    t3 = [(2, 6, 5), (None, 2, 5), (1, 3, 5)]
    push("o", t3, TO)
    O += t3
    eng.step()
    check("outer insert under lenient restriction", "B1")
    push("i1", [(None, None)], TI)
    I += [(None, None)]
    eng.step()
    check("all-null inner row empties the view (B1->A)", "A")
    push("o", [(7, 7, 5)], TO)
    O += [(7, 7, 5)]
    eng.step()
    check("outer insert while in A", "A")
    push("i1", [(None, None)], TI, w=-1)
    I.remove((None, None))
    eng.step()
    check("all-null retract refills (A->B1)", "B1")
    push("i1", [(1, None)], TI, w=-1)
    I.remove((1, None))
    eng.step()
    check("partial-null retract", "B1")
    push("i1", [(1, 2), (2, 5)], TI, w=-1)
    I.remove((1, 2))
    I.remove((2, 5))
    eng.step()
    check("inner empties (B1->B2)", "B2")
    push("o", [(1, 1, 5)], TO, w=-1)
    O.remove((1, 1, 5))
    push("i1", [(None, 5)], TI)
    I += [(None, 5)]
    eng.step()
    check("mixed outer-retract + partial-null insert", "B1")


def test_not_null_not_in_still_uses_plain_antijoin(spark):
    """Declared-NOT-NULL columns keep the cheaper touched-key path
    without the counter machinery."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE c (ck BIGINT NOT NULL, nk BIGINT NOT NULL);
        CREATE TABLE o (ok BIGINT NOT NULL, cust BIGINT NOT NULL);
        CREATE VIEW quiet as
            SELECT ck, nk FROM c WHERE nk NOT IN (SELECT cust FROM o);
    """)
    assert eng.view_strategy("quiet") == "not_in"


@pytest.mark.slow
def test_correlated_scalar_subquery_lowers_and_matches(spark):
    """Correlated scalar-aggregate subqueries in the select list lower
    to a hidden GROUP BY + LEFT JOIN stack (all maintained, no
    snapshot-diff) and match Spark's own evaluation across inserts,
    retractions, and NULL correlation keys; COUNT subqueries yield 0
    over empty groups, MAX/SUM stay NULL."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE cust (ck BIGINT NOT NULL, nat BIGINT, bal FLOAT64);
        CREATE TABLE ord (ok BIGINT NOT NULL, ck BIGINT, amt FLOAT64);
        CREATE VIEW enr as
            SELECT c.ck, c.bal,
                   (SELECT MAX(o.amt) FROM ord o
                    WHERE o.ck = c.ck) AS max_amt,
                   (SELECT COUNT(*) FROM ord o
                    WHERE o.ck = c.ck AND o.amt > 5) AS big_n
            FROM cust c WHERE c.nat < 10;
    """)
    assert eng.view_strategy("enr") == "project"
    assert eng.view_strategy("__enr_f0") == "project"
    assert eng.view_strategy("__enr_sq0") == "nonlinear_agg"
    assert eng.view_strategy("__enr_j0") == "left_join"
    assert eng.view_strategy("__enr_sq1") == "linear_agg"
    assert eng.view_strategy("__enr_j1") == "left_join"
    S = "ck bigint, nat bigint, bal double"
    T = "ok bigint, ck bigint, amt double"
    batch = """SELECT c.ck, c.bal,
               (SELECT MAX(o.amt) FROM ord o WHERE o.ck = c.ck) AS max_amt,
               (SELECT COUNT(*) FROM ord o
                WHERE o.ck = c.ck AND o.amt > 5) AS big_n
               FROM cust c WHERE c.nat < 10"""

    def check(tag):
        want = sorted((tuple(r) for r in spark.sql(batch).collect()),
                      key=str)
        got = sorted((tuple(r) for r in eng.view("enr").collect()),
                     key=str)
        assert got == want, (tag, got, want)

    eng.push("cust", spark.createDataFrame(
        [(1, 3, 10.0), (2, 5, 20.0), (3, 22, 5.0), (4, 1, None)], S))
    eng.step(); check("outer only: empty groups")
    eng.push("ord", spark.createDataFrame(
        [(10, 1, 4.0), (11, 1, 9.0), (12, 2, 2.0)], T))
    eng.step(); check("orders arrive")
    eng.push("ord", spark.createDataFrame([(11, 1, 9.0)], T), weight=-1)
    eng.step(); check("max retracts to lower value")
    eng.push("cust", spark.createDataFrame([(5, 2, 7.0)], S))
    eng.push("ord", spark.createDataFrame(
        [(13, 5, 50.0), (14, None, 6.0)], T))
    eng.step(); check("NULL correlation key never matches")


def test_scalar_subquery_unsupported_shapes_fall_back(spark):
    """Non-aggregate scalars and disjunctive correlation keep the
    snapshot-diff fallback rather than lowering wrongly."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE a (k BIGINT NOT NULL, v BIGINT);
        CREATE TABLE b (k BIGINT NOT NULL, w BIGINT);
        CREATE VIEW bad1 as
            SELECT a.k, (SELECT b.w FROM b WHERE b.k = a.k) AS w FROM a;
        CREATE VIEW bad2 as
            SELECT a.k, (SELECT MAX(b.w) FROM b
                         WHERE b.k = a.k OR b.w = a.v) AS w FROM a;
    """)
    assert eng.view_strategy("bad1") == "differentiate"
    assert eng.view_strategy("bad2") == "differentiate"


@pytest.mark.slow
def test_scalar_subquery_in_where_and_uncorrelated(spark):
    """r6 generalization: scalar subqueries inside WHERE predicates
    (TPC-H q17's ``x < 0.2 * (SELECT AVG(…) …)`` shape), uncorrelated
    subqueries (lowered through a constant-key hidden projection), and
    subqueries embedded in larger select expressions — all maintained,
    matching Spark's own evaluation across inserts and retractions."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ord (ok BIGINT NOT NULL, cust BIGINT, price BIGINT);
        CREATE TABLE li (lk BIGINT NOT NULL, ok BIGINT, qty BIGINT);
        CREATE TABLE ord2 (ok BIGINT NOT NULL, price BIGINT);
        CREATE VIEW big as
            SELECT o.ok, o.cust,
                   o.price - (SELECT SUM(l.qty) FROM li l
                              WHERE l.ok = o.ok) AS net
            FROM ord o
            WHERE o.price > (SELECT AVG(l2.price) FROM ord2 l2)
              AND (SELECT COUNT(*) FROM li l3 WHERE l3.ok = o.ok) >= 2;
    """)
    assert eng.view_strategy("big") == "project"
    # constant-key bootstrap + per-subquery hidden stacks
    assert eng.view_strategy("__big_f0") == "project"
    assert eng.view_strategy("__big_sq0") == "linear_agg"   # SUM
    assert eng.view_strategy("__big_c1") == "project"       # __ck stamp
    assert eng.view_strategy("__big_sq1") == "linear_agg"   # AVG
    assert eng.view_strategy("__big_sq2") == "linear_agg"   # COUNT
    assert eng.view_strategy("__big_j2") == "left_join"
    O = "ok bigint, cust bigint, price bigint"
    L = "lk bigint, ok bigint, qty bigint"
    O2 = "ok bigint, price bigint"
    batch = """SELECT o.ok, o.cust,
               o.price - (SELECT SUM(l.qty) FROM li l
                          WHERE l.ok = o.ok) AS net
               FROM ord o
               WHERE o.price > (SELECT AVG(l2.price) FROM ord2 l2)
                 AND (SELECT COUNT(*) FROM li l3 WHERE l3.ok = o.ok) >= 2"""

    def check(tag):
        want = sorted((tuple(r) for r in spark.sql(batch).collect()),
                      key=str)
        got = sorted((tuple(r) for r in eng.view("big").collect()),
                     key=str)
        assert got == want, (tag, got, want)

    eng.push("ord", spark.createDataFrame(
        [(1, 7, 100), (2, 7, 30), (3, 8, 90)], O))
    eng.push("ord2", spark.createDataFrame([(1, 100), (2, 30)], O2))
    eng.step(); check("no lineitems yet: COUNT()=0 filters all")
    eng.push("li", spark.createDataFrame(
        [(10, 1, 5), (11, 1, 7), (12, 3, 2), (13, 3, 4)], L))
    eng.step(); check("both subquery predicates satisfiable")
    # retract a lineitem: ok=3 drops below the COUNT>=2 bar
    eng.push("li", spark.createDataFrame([(13, 3, 4)], L), weight=-1)
    eng.step(); check("count retraction removes a row")
    # shift the global average up: ok=3 (price 90) must drop out
    eng.push("ord2", spark.createDataFrame([(3, 95)], O2))
    eng.step(); check("uncorrelated AVG moves the bar")


def test_scalar_subquery_where_empty_inner_filters(spark):
    """A WHERE comparison against a scalar subquery over an empty inner
    table is UNKNOWN → all rows filtered (NULL semantics, not 0)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k BIGINT NOT NULL, v BIGINT);
        CREATE TABLE s (k BIGINT NOT NULL, v BIGINT);
        CREATE VIEW w as
            SELECT t.k FROM t
            WHERE t.v > (SELECT MIN(s.v) FROM s WHERE s.k = t.k);
    """)
    assert eng.view_strategy("w") == "project"
    eng.push("t", spark.createDataFrame([(1, 10), (2, 20)],
                                        "k bigint, v bigint"))
    eng.step()
    assert eng.view("w").count() == 0
    eng.push("s", spark.createDataFrame([(1, 5)], "k bigint, v bigint"))
    eng.step()
    assert [r["k"] for r in eng.view("w").collect()] == [1]


def test_partition_window_skew_guard_warns(spark, caplog):
    """A tick whose touched-partition history exceeds skew_warn_rows
    logs the hot-partition warning (and still produces correct output)."""
    import logging
    from database_stream_processor_spark.sql import (
        _PartitionWindowMaintainer)
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ev (u BIGINT NOT NULL, ts BIGINT NOT NULL,
                         amt BIGINT);
        CREATE VIEW lagged as
            SELECT u, ts, LAG(amt) OVER (PARTITION BY u ORDER BY ts)
                       AS prev_amt
            FROM ev;
    """)
    assert eng.view_strategy("lagged") == "partition_window"
    m = eng._maintainers["lagged"]
    orig = _PartitionWindowMaintainer.skew_warn_rows
    m.skew_warn_rows = 3
    try:
        eng.push("ev", spark.createDataFrame(
            [(1, t, t * 10) for t in range(5)],
            "u bigint, ts bigint, amt bigint"))
        with caplog.at_level(logging.WARNING,
                             logger="database_stream_processor_spark.sql"):
            eng.step()
        assert any("touched-partition history" in r.getMessage()
                   for r in caplog.records)
        assert eng.view("lagged").count() == 5
    finally:
        m.skew_warn_rows = orig


@pytest.mark.slow
def test_scalar_subquery_over_join_from(spark):
    """TPC-H q17's shape: outer FROM is a JOIN chain, with a correlated
    scalar subquery in WHERE referencing a chain alias — lowers through
    a hidden join view (__src) + hidden agg/join stack, and matches
    Spark's own evaluation across inserts and retractions."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE li (lk BIGINT NOT NULL, pk BIGINT, qty BIGINT,
                         ext BIGINT);
        CREATE TABLE pt (pk BIGINT NOT NULL, brand VARCHAR);
        CREATE VIEW q17 as
            SELECT l.lk, l.ext
            FROM li l JOIN pt p ON l.pk = p.pk
            WHERE p.brand = 'B1'
              AND l.qty * 10 < 2 * (SELECT SUM(l2.qty) FROM li l2
                                    WHERE l2.pk = p.pk);
    """)
    assert eng.view_strategy("q17") == "project"
    assert eng.view_strategy("__q17_src") == "join"
    assert eng.view_strategy("__q17_sq0") == "linear_agg"
    assert eng.view_strategy("__q17_j0") == "left_join"
    L = "lk bigint, pk bigint, qty bigint, ext bigint"
    batch = """SELECT l.lk, l.ext FROM li l JOIN pt p ON l.pk = p.pk
               WHERE p.brand = 'B1'
                 AND l.qty * 10 < 2 * (SELECT SUM(l2.qty) FROM li l2
                                       WHERE l2.pk = p.pk)"""

    def check(tag):
        want = sorted(tuple(r) for r in spark.sql(batch).collect())
        got = sorted(tuple(r) for r in eng.view("q17").collect())
        assert got == want, (tag, got, want)

    eng.push("li", spark.createDataFrame(
        [(1, 100, 1, 11), (2, 100, 5, 22), (3, 100, 4, 33),
         (4, 200, 1, 44)], L))
    eng.push("pt", spark.createDataFrame(
        [(100, "B1"), (200, "B2")], "pk bigint, brand string"))
    eng.step(); check("insert")
    # retract lk=2: the per-pk SUM drops and lk=1 falls out with it
    eng.push("li", spark.createDataFrame([(2, 100, 5, 22)], L), weight=-1)
    eng.step(); check("retraction moves the correlated bar")
    eng.push("pt", spark.createDataFrame([(200, "B2")],
                                         "pk bigint, brand string"),
             weight=-1)
    eng.push("pt", spark.createDataFrame([(200, "B1")],
                                         "pk bigint, brand string"))
    eng.step(); check("dim update re-qualifies a partition")


@pytest.mark.slow
def test_scalar_subquery_max_over_view_dethrones(spark):
    """TPC-H q15's shape: uncorrelated MAX over a maintained VIEW in
    WHERE; a retraction that dethrones the current max re-derives the
    new winner (touched-group MAX recompute under the constant key)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE li (sk BIGINT NOT NULL, rev BIGINT);
        CREATE TABLE sup (sk BIGINT NOT NULL, sname VARCHAR);
        CREATE VIEW rev0 as
            SELECT sk AS sno, SUM(rev) AS total FROM li GROUP BY sk;
        CREATE VIEW top as
            SELECT s.sk, s.sname, r.total
            FROM sup s JOIN rev0 r ON s.sk = r.sno
            WHERE r.total = (SELECT MAX(total) FROM rev0);
    """)
    assert eng.view_strategy("top") == "project"
    assert eng.view_strategy("__top_src") == "join"
    assert eng.view_strategy("__top_sq0") == "nonlinear_agg"
    L, S = "sk bigint, rev bigint", "sk bigint, sname string"
    eng.push("li", spark.createDataFrame(
        [(1, 10), (1, 20), (2, 25), (3, 5)], L))
    eng.push("sup", spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], S))
    eng.step()
    assert sorted(tuple(r) for r in eng.view("top").collect()) \
        == [(1, "a", 30)]
    # retract one of supplier 1's rows: supplier 2 takes the crown
    eng.push("li", spark.createDataFrame([(1, 20)], L), weight=-1)
    eng.step()
    assert sorted(tuple(r) for r in eng.view("top").collect()) \
        == [(2, "b", 25)]
    # tie at the top: both rows qualify (= semantics)
    eng.push("li", spark.createDataFrame([(3, 20)], L))
    eng.step()
    assert sorted(tuple(r) for r in eng.view("top").collect()) \
        == [(2, "b", 25), (3, "c", 25)]


@pytest.mark.slow
def test_scalar_subquery_composite_and_self_table(spark):
    """TPC-H q20's composite-key correlation (two equalities → one
    multi-column GROUP BY + conjunctive join) and TPC-H q22's
    self-table uncorrelated AVG both lower and match Spark."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ps (pk BIGINT NOT NULL, sk BIGINT, avail BIGINT);
        CREATE TABLE li (pk BIGINT NOT NULL, sk BIGINT, qty BIGINT);
        CREATE VIEW q20 as
            SELECT ps.pk, ps.sk, ps.avail FROM ps
            WHERE ps.avail * 2 > (SELECT SUM(l.qty) FROM li l
                                  WHERE l.pk = ps.pk AND l.sk = ps.sk);
        CREATE VIEW q22 as
            SELECT p.pk, p.avail FROM ps p
            WHERE p.avail > (SELECT AVG(p2.avail) FROM ps p2
                             WHERE p2.avail > 0);
    """)
    assert eng.view_strategy("q20") == "project"
    assert eng.view_strategy("__q20_sq0") == "linear_agg"
    assert eng.view_strategy("q22") == "project"
    assert eng.view_strategy("__q22_c0") == "project"
    P = "pk bigint, sk bigint, avail bigint"
    L = "pk bigint, sk bigint, qty bigint"
    b20 = """SELECT ps.pk, ps.sk, ps.avail FROM ps
             WHERE ps.avail * 2 > (SELECT SUM(l.qty) FROM li l
                                   WHERE l.pk = ps.pk AND l.sk = ps.sk)"""
    b22 = """SELECT p.pk, p.avail FROM ps p
             WHERE p.avail > (SELECT AVG(p2.avail) FROM ps p2
                              WHERE p2.avail > 0)"""

    def check(tag):
        for view, batch in (("q20", b20), ("q22", b22)):
            want = sorted(tuple(r) for r in spark.sql(batch).collect())
            got = sorted(tuple(r) for r in eng.view(view).collect())
            assert got == want, (tag, view, got, want)

    eng.push("ps", spark.createDataFrame(
        [(1, 1, 10), (1, 2, 3), (2, 1, 1), (2, 2, -4)], P))
    eng.push("li", spark.createDataFrame(
        [(1, 1, 8), (1, 1, 9), (1, 2, 4), (2, 1, 7)], L))
    eng.step(); check("insert")
    eng.push("li", spark.createDataFrame([(1, 1, 9)], L), weight=-1)
    eng.push("ps", spark.createDataFrame([(1, 1, 10)], P), weight=-1)
    eng.step(); check("retractions move both bars")


@pytest.mark.slow
def test_scalar_subquery_in_having(spark):
    """TPC-H q11's shape: a HAVING comparing the group aggregate to an
    uncorrelated scaled scalar subquery — lowers as grouped view +
    constant-key global agg + join + filter, and matches Spark."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ps (pk BIGINT NOT NULL, cost BIGINT, qty BIGINT);
        CREATE VIEW q11 as
            SELECT pk, SUM(cost * qty) AS value FROM ps
            GROUP BY pk
            HAVING SUM(cost * qty) > (SELECT SUM(p2.cost * p2.qty) * 0.2
                                      FROM ps p2);
    """)
    assert eng.view_strategy("q11") == "project"
    assert eng.view_strategy("__q11_g") == "linear_agg"
    assert eng.view_strategy("__q11_sq0") == "linear_agg"
    P = "pk bigint, cost bigint, qty bigint"
    batch = """SELECT pk, SUM(cost * qty) AS value FROM ps GROUP BY pk
               HAVING SUM(cost * qty) > (SELECT SUM(p2.cost * p2.qty)
                                         * 0.2 FROM ps p2)"""

    def check(tag):
        want = sorted(tuple(r) for r in spark.sql(batch).collect())
        got = sorted(tuple(r) for r in eng.view("q11").collect())
        assert got == want, (tag, got, want)

    eng.push("ps", spark.createDataFrame(
        [(1, 10, 5), (1, 2, 5), (2, 8, 3), (3, 1, 1), (4, 9, 2)], P))
    eng.step(); check("insert")
    eng.push("ps", spark.createDataFrame([(1, 10, 5)], P), weight=-1)
    eng.step(); check("retraction moves both the bar and a group sum")
    # genuinely correlated HAVING subqueries (outer-alias reference)
    # stay on the fallback; note a BARE column inside the subquery
    # resolves to the INNER table per SQL scoping, so that shape is
    # uncorrelated and does lower
    eng.execute("""
        CREATE VIEW bad as
            SELECT pk, SUM(qty) AS q FROM ps p0 GROUP BY pk
            HAVING SUM(qty) > (SELECT AVG(p2.qty) FROM ps p2
                               WHERE p2.pk = p0.pk);
    """)
    assert eng.view_strategy("bad") == "differentiate"


@pytest.mark.slow
def test_scalar_subquery_join_chain_inner(spark):
    """TPC-H q2's shape: the scalar subquery's OWN FROM is a join chain
    (min supplycost among qualified suppliers) — lowers through a
    hidden inner join view (__i0) + grouped MIN + left join; a
    retraction that removes the current minimum promotes the runner-up."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ps (pk BIGINT NOT NULL, sk BIGINT, cost BIGINT);
        CREATE TABLE su (sk BIGINT NOT NULL, nk BIGINT, sname VARCHAR);
        CREATE TABLE pt (pk BIGINT NOT NULL, size BIGINT);
        CREATE VIEW q2 as
            SELECT p.pk, s.sname, ps.cost
            FROM ps JOIN su s ON ps.sk = s.sk JOIN pt p ON ps.pk = p.pk
            WHERE p.size < 10 AND s.nk = 1
              AND ps.cost = (SELECT MIN(ps2.cost)
                             FROM ps ps2 JOIN su s2 ON ps2.sk = s2.sk
                             WHERE ps2.pk = p.pk AND s2.nk = 1);
    """)
    assert eng.view_strategy("q2") == "project"
    assert eng.view_strategy("__q2_src") == "multi_join"
    assert eng.view_strategy("__q2_i0") == "join"
    assert eng.view_strategy("__q2_sq0") == "nonlinear_agg"
    P = "pk bigint, sk bigint, cost bigint"
    batch = """SELECT p.pk, s.sname, ps.cost
        FROM ps JOIN su s ON ps.sk = s.sk JOIN pt p ON ps.pk = p.pk
        WHERE p.size < 10 AND s.nk = 1
          AND ps.cost = (SELECT MIN(ps2.cost)
                         FROM ps ps2 JOIN su s2 ON ps2.sk = s2.sk
                         WHERE ps2.pk = p.pk AND s2.nk = 1)"""

    def check(tag):
        want = sorted(tuple(r) for r in spark.sql(batch).collect())
        got = sorted(tuple(r) for r in eng.view("q2").collect())
        assert got == want, (tag, got, want)

    eng.push("ps", spark.createDataFrame(
        [(1, 1, 50), (1, 2, 30), (1, 3, 70), (2, 1, 10), (2, 3, 5)], P))
    eng.push("su", spark.createDataFrame(
        [(1, 1, "s1"), (2, 1, "s2"), (3, 2, "s3")],
        "sk bigint, nk bigint, sname string"))
    eng.push("pt", spark.createDataFrame(
        [(1, 5), (2, 20)], "pk bigint, size bigint"))
    eng.step(); check("insert")
    eng.push("ps", spark.createDataFrame([(1, 2, 30)], P), weight=-1)
    eng.step(); check("retracting the min promotes the runner-up")


@pytest.mark.slow
def test_aliased_group_by_keys(spark):
    """`SELECT k AS alias, SUM(x) … GROUP BY k` lowers (the group state
    and merge join use the OUTPUT name) — single-table and join-agg."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE li (sk BIGINT NOT NULL, rev BIGINT);
        CREATE TABLE su (sno BIGINT NOT NULL, sname VARCHAR);
        CREATE VIEW rev0 as
            SELECT sk AS supplier_no, SUM(rev) AS total
            FROM li GROUP BY sk;
        CREATE VIEW joined as
            SELECT s.sname AS who, SUM(l.rev) AS t2
            FROM li l JOIN su s ON l.sk = s.sno GROUP BY s.sname;
    """)
    assert eng.view_strategy("rev0") == "linear_agg"
    assert eng.view_strategy("joined") == "join_agg"
    L, S = "sk bigint, rev bigint", "sno bigint, sname string"
    b1 = "SELECT sk AS supplier_no, SUM(rev) AS total FROM li GROUP BY sk"
    b2 = ("SELECT s.sname AS who, SUM(l.rev) AS t2 FROM li l "
          "JOIN su s ON l.sk = s.sno GROUP BY s.sname")

    def check(tag):
        for v, b in (("rev0", b1), ("joined", b2)):
            want = sorted(tuple(r) for r in spark.sql(b).collect())
            got = sorted(tuple(r) for r in eng.view(v).collect())
            assert got == want, (tag, v, got, want)

    eng.push("li", spark.createDataFrame([(1, 10), (1, 20), (2, 5)], L))
    eng.push("su", spark.createDataFrame([(1, "a"), (2, "b")], S))
    eng.step(); check("insert")
    eng.push("li", spark.createDataFrame([(1, 20)], L), weight=-1)
    eng.push("li", spark.createDataFrame([(3, 7)], L))
    eng.push("su", spark.createDataFrame([(3, "a")], S))
    eng.step(); check("retraction + group shared by two join keys")


@pytest.mark.slow
def test_scalar_subquery_with_not_exists(spark):
    """Verbatim TPC-H q22 inner shape in ONE view: an uncorrelated
    scalar AVG bar AND a NOT EXISTS anti-join in the same WHERE — the
    scalar terms lower to the hidden join stack and the final view
    lowers through the subquery-filter maintainer on top of it."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE cu (ck BIGINT NOT NULL, cc VARCHAR, bal BIGINT);
        CREATE TABLE od (ok BIGINT NOT NULL, cust BIGINT);
        CREATE VIEW q22 as
            SELECT c.cc, c.bal FROM cu c
            WHERE c.bal > (SELECT AVG(c2.bal) FROM cu c2
                           WHERE c2.bal > 0)
              AND NOT EXISTS (SELECT 1 FROM od
                              WHERE od.cust = c.ck);
    """)
    assert eng.view_strategy("q22") == "not_exists"
    assert eng.view_strategy("__q22_sq0") == "linear_agg"
    batch = """SELECT c.cc, c.bal FROM cu c
        WHERE c.bal > (SELECT AVG(c2.bal) FROM cu c2 WHERE c2.bal > 0)
          AND NOT EXISTS (SELECT 1 FROM od WHERE od.cust = c.ck)"""

    def check(tag):
        want = sorted(tuple(r) for r in spark.sql(batch).collect())
        got = sorted(tuple(r) for r in eng.view("q22").collect())
        assert got == want, (tag, got, want)

    C, O = "ck bigint, cc string, bal bigint", "ok bigint, cust bigint"
    eng.push("cu", spark.createDataFrame(
        [(1, "aa", 30), (2, "bb", 20), (3, "aa", -5), (4, "cc", 25)], C))
    eng.push("od", spark.createDataFrame([(10, 1)], O))
    eng.step(); check("insert")
    eng.push("od", spark.createDataFrame([(10, 1)], O), weight=-1)
    eng.push("od", spark.createDataFrame([(11, 4)], O))
    eng.step(); check("order moves between customers")
    eng.push("cu", spark.createDataFrame([(2, "bb", 20)], C), weight=-1)
    eng.step(); check("retraction moves the AVG bar")


def test_case_with_and_in_comma_from_where_not_torn(spark):
    """ADVICE r7 #1: ANDs inside an unparenthesized top-level
    ``CASE … WHEN x AND eq AND y … END`` in a comma-FROM WHERE must NOT
    be split into conjuncts — the old splitter extracted the embedded
    equality into a JOIN ON and reassembled the residual CASE without
    it, silently changing results.  The CASE-aware splitter keeps the
    expression intact; only the genuine top-level equality joins."""
    import duckdb
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ta (ak BIGINT NOT NULL, av BIGINT);
        CREATE TABLE tb (bk BIGINT NOT NULL, bv BIGINT);
        CREATE VIEW v as
            SELECT ak, bv FROM ta, tb
            WHERE ak = bk
              AND CASE WHEN av > 1 AND ak = bv AND bv > 0
                       THEN 1 ELSE 2 END = 2;
    """)
    rows_a = [(1, 5), (2, 0), (3, 9)]
    rows_b = [(1, 1), (2, 7), (3, 3), (3, 8)]
    eng.push("ta", spark.createDataFrame(rows_a, "ak long, av long"))
    eng.push("tb", spark.createDataFrame(rows_b, "bk long, bv long"))
    eng.step()
    con = duckdb.connect()
    con.execute("CREATE TABLE ta (ak BIGINT, av BIGINT)")
    con.execute("CREATE TABLE tb (bk BIGINT, bv BIGINT)")
    con.executemany("INSERT INTO ta VALUES (?,?)", rows_a)
    con.executemany("INSERT INTO tb VALUES (?,?)", rows_b)
    want = sorted(con.execute(
        "SELECT ak, bv FROM ta, tb WHERE ak = bk AND CASE WHEN av > 1 "
        "AND ak = bv AND bv > 0 THEN 1 ELSE 2 END = 2").fetchall())
    got = sorted(tuple(r) for r in eng.view("v").collect())
    assert got == want, (got, want)
    # the CASE-embedded equality must not have become a join conjunct
    assert "CASE" in eng.views["v"].upper()


def test_split_helpers_treat_case_end_as_opaque():
    """Unit coverage for the CASE-aware splitters."""
    from database_stream_processor_spark.sql import (
        _split_top_and, _split_top_and_bw, _split_top_kw)
    t = ("x = 1 AND CASE WHEN a AND b BETWEEN 1 AND 2 THEN 1 "
         "ELSE 2 END = 2 AND y = 3")
    for fn in (_split_top_and, _split_top_and_bw):
        parts = fn(t)
        assert len(parts) == 3, (fn.__name__, parts)
        assert parts[1].upper().startswith("CASE"), parts
    assert len(_split_top_kw(
        "a OR CASE WHEN x OR y THEN 1 ELSE 2 END = 1", "OR")) == 2


def test_normalizer_preserves_literals_and_original_text(spark):
    """ADVICE r7 #2: string literals containing whitespace runs or the
    word FROM survive comma-FROM normalization verbatim, and a view the
    normalizer did not rewrite keeps its ORIGINAL text as the canonical
    view SQL."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ta (ak BIGINT NOT NULL, av BIGINT);
        CREATE TABLE tb (bk BIGINT NOT NULL, bv BIGINT);
        CREATE VIEW v as
            SELECT ak, 'two  spaces FROM (x)' AS lit, bv
            FROM ta, tb WHERE ak = bk;
    """)
    assert "'two  spaces FROM (x)'" in eng.views["v"]
    eng.push("ta", spark.createDataFrame([(1, 2)], "ak long, av long"))
    eng.push("tb", spark.createDataFrame([(1, 3)], "bk long, bv long"))
    eng.step()
    got = [tuple(r) for r in eng.view("v").collect()]
    assert got == [(1, "two  spaces FROM (x)", 3)]
    # untouched view: canonical text is the original, whitespace intact
    eng.execute("CREATE VIEW w as SELECT ak,\n       'p  q' AS s\n"
                "            FROM ta;")
    assert "'p  q'" in eng.views["w"]
    assert "\n" in eng.views["w"]


def test_nonlinear_repeated_select_key_falls_back(spark):
    """ADVICE r7 #3: SELECT a, a, MAX(x) … GROUP BY a, b counts key
    items as a SET — the duplicated ``a`` must not stand in for the
    missing ``b`` (the delta/view schema would diverge).  Falls back to
    snapshot-diff and still matches one-shot semantics."""
    eng = Engine(spark)
    eng.execute("CREATE TABLE t (a INTEGER NOT NULL, b INTEGER NOT NULL,"
                " x BIGINT);")
    eng.execute("CREATE VIEW v as SELECT a, a AS a2, MAX(x) AS mx FROM t"
                " GROUP BY a, b;")
    assert eng.view_strategy("v") == "differentiate"
    schema = "a int, b int, x long"
    eng.push("t", spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (2, 1, 5)], schema))
    eng.step()
    eng.push("t", spark.createDataFrame([(1, 1, 7)], schema))
    eng.step()
    got = sorted((tuple(r) for r in eng.view("v").collect()), key=str)
    assert got == sorted([(1, 1, 10), (1, 1, 20), (2, 2, 5)], key=str)


def test_having_only_grouped_view_lowers_linear(spark):
    """TPC-H q18's inner shape — ``SELECT k FROM t GROUP BY k HAVING
    SUM(v) > bar`` with NO aggregate in the select list — lowers to the
    linear path (the HAVING absorbs a hidden SUM partial).  Groups must
    emerge and retract as deltas push them across the boundary."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE li (ok BIGINT NOT NULL, qty BIGINT);
        CREATE VIEW big as
            SELECT ok FROM li GROUP BY ok HAVING SUM(qty) > 10;
    """)
    assert eng.view_strategy("big") == "linear_agg"
    S = "ok long, qty long"

    def got():
        return sorted(r[0] for r in eng.view("big").collect())

    eng.push("li", spark.createDataFrame(
        [(1, 6), (1, 3), (2, 11), (3, 2)], S))
    eng.step()
    assert got() == [2]
    # group 1 crosses UP (9 → 12), group 2 crosses DOWN (11 → 4)
    eng.push("li", spark.createDataFrame([(1, 3)], S))
    eng.push("li", spark.createDataFrame([(2, 7)], S), weight=-1)
    eng.step()
    assert got() == [1]
    # full retraction of group 1 (must not linger at SUM 0)
    eng.push("li", spark.createDataFrame(
        [(1, 6), (1, 3), (1, 3)], S), weight=-1)
    eng.step()
    assert got() == []


def test_multi_exists_with_inequality_residual(spark):
    """Verbatim TPC-H q21's filter shape: EXISTS and NOT EXISTS both
    probing the SAME inner table on the SAME correlation key, each with
    an inequality residual against the outer row — maintained by ONE
    touched-key restriction (the equality confines every probe to its
    key group; the residuals evaluate verbatim on recompute)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ord (ok BIGINT NOT NULL, sk BIGINT);
        CREATE TABLE li (lk BIGINT NOT NULL, ls BIGINT, late BIGINT);
        CREATE VIEW w as
            SELECT ok, sk FROM ord o
            WHERE EXISTS (SELECT 1 FROM li l2
                          WHERE l2.lk = o.ok AND l2.ls <> o.sk)
              AND NOT EXISTS (SELECT 1 FROM li l3
                              WHERE l3.lk = o.ok AND l3.ls <> o.sk
                                AND l3.late > 0);
    """)
    assert eng.view_strategy("w") == "multi_exists"
    batch = """SELECT ok, sk FROM ord o
        WHERE EXISTS (SELECT 1 FROM li l2
                      WHERE l2.lk = o.ok AND l2.ls <> o.sk)
          AND NOT EXISTS (SELECT 1 FROM li l3
                          WHERE l3.lk = o.ok AND l3.ls <> o.sk
                            AND l3.late > 0)"""

    def check(tag):
        want = sorted(tuple(r) for r in spark.sql(batch).collect())
        got = sorted(tuple(r) for r in eng.view("w").collect())
        assert got == want, (tag, got, want)

    O, L = "ok long, sk long", "lk long, ls long, late long"
    eng.push("ord", spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (3, 30)], O))
    eng.push("li", spark.createDataFrame(
        [(1, 10, 0), (1, 11, 0), (2, 20, 0), (3, 30, 0), (3, 31, 1)],
        L))
    eng.step(); check("insert")
    # a late row appears for order 1 by OTHER supplier: kills (1, 10)
    eng.push("li", spark.createDataFrame([(1, 11, 1)], L))
    eng.step(); check("late row flips NOT EXISTS")
    # retract order 3's only late row: (3, 30) re-emerges
    eng.push("li", spark.createDataFrame([(3, 31, 1)], L), weight=-1)
    eng.step(); check("retraction un-flips NOT EXISTS")
    # retract the co-supplier row that satisfied EXISTS for (2, 20)?
    # (2,20) never had one — add then remove one across two ticks
    eng.push("li", spark.createDataFrame([(2, 21, 0)], L))
    eng.step(); check("EXISTS satisfied")
    eng.push("li", spark.createDataFrame([(2, 21, 0)], L), weight=-1)
    eng.step(); check("EXISTS retracted")


@pytest.mark.slow
def test_comma_from_normalizer_fuzz_equivalence(spark):
    """ADVICE r7 #8 (hardening): seeded-random comma-FROM texts mixing
    join equalities, literal filters, BETWEEN, CASE-with-embedded-AND,
    OR-of-conjunctions, and string literals containing ' FROM ' and
    double spaces — for every generated query the maintained view must
    equal Spark's own evaluation of the ORIGINAL text on the final
    table state (the normalizer's contract: upgrade or no-op, never a
    semantic change)."""
    import random
    rng = random.Random(8)
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ta (ak BIGINT NOT NULL, av BIGINT, s VARCHAR);
        CREATE TABLE tb (bk BIGINT NOT NULL, bv BIGINT);
        CREATE TABLE tc (ck BIGINT NOT NULL, cv BIGINT);
    """)
    conj_pool = [
        lambda: "av > {}".format(rng.randint(0, 3)),
        lambda: "bv BETWEEN {} AND {}".format(rng.randint(0, 2),
                                              rng.randint(3, 9)),
        lambda: ("CASE WHEN av > {} AND ak = bv AND bv > 0 "
                 "THEN 1 ELSE 2 END = 2").format(rng.randint(1, 3)),
        lambda: ("(av = {} AND bv > {}) OR (av = {} AND bv < {})"
                 .format(rng.randint(0, 2), rng.randint(0, 2),
                         rng.randint(3, 5), rng.randint(5, 9))),
        lambda: "s <> 'x  FROM (y)'",
        lambda: "ta.av <> tb.bv",
    ]
    texts = []
    for i in range(8):
        three = rng.random() < 0.5
        conjs = ["ak = bk"] + (["bk = ck"] if three else [])
        conjs += [rng.choice(conj_pool)()
                  for _ in range(rng.randint(1, 3))]
        rng.shuffle(conjs)
        frm = "ta, tb, tc" if three else "ta, tb"
        sel = "ak, av, bv" + (", cv" if three else "")
        texts.append(f"SELECT {sel} FROM {frm} "
                     f"WHERE {' AND '.join(conjs)}")
        eng.execute(f"CREATE VIEW fz{i} as {texts[i]};")
    tb_df = spark.createDataFrame(
        [(k, rng.randint(0, 9)) for k in range(8)], "bk long, bv long")
    eng.push("ta", spark.createDataFrame(
        [(k, rng.randint(0, 5), rng.choice(["p", "x  FROM (y)"]))
         for k in range(8)], "ak long, av long, s string"))
    eng.push("tb", tb_df)
    eng.push("tc", spark.createDataFrame(
        [(k, rng.randint(0, 9)) for k in range(8)], "ck long, cv long"))
    eng.step()
    # a retraction round too: the maintained state must track
    eng.push("ta", spark.createDataFrame(
        [(2, 100, "late")], "ak long, av long, s string"))
    eng.push("tb", tb_df.filter(F.col("bk") == 3), weight=-1)
    eng.step()
    for i, txt in enumerate(texts):
        want = sorted((tuple(r) for r in spark.sql(txt).collect()),
                      key=str)
        got = sorted((tuple(r) for r in eng.view(f"fz{i}").collect()),
                     key=str)
        assert got == want, (i, txt, got, want)


def test_single_table_grouped_in_subquery(spark):
    """The q18 shape WITHOUT the join — a grouped aggregate over ONE
    table filtered by an IN whose body carries its own GROUP BY/HAVING:
    the composition pass degenerates its join stage to a maintained
    projection (``__v_jv`` = project) and the rest of the stack is
    identical (hidden grouped in-view, IN filter, linear finalize)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE orders (ok BIGINT NOT NULL, pr VARCHAR);
        CREATE TABLE li (lk BIGINT, qty BIGINT);
        CREATE VIEW v as
            SELECT pr, COUNT(*) AS n FROM orders
            WHERE ok IN (SELECT lk FROM li
                         GROUP BY lk HAVING SUM(qty) > 10)
            GROUP BY pr;
    """)
    assert eng.view_strategy("v") == "linear_agg"
    assert eng.view_strategy("__v_in0") == "linear_agg"
    assert eng.view_strategy("__v_jv") == "project"
    assert eng.view_strategy("__v_src") == "in"
    O, L = "ok long, pr string", "lk long, qty long"
    eng.push("orders", spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], O))
    eng.push("li", spark.createDataFrame(
        [(1, 8), (1, 5), (2, 3), (3, 20)], L))
    eng.step()
    got = sorted(tuple(r) for r in eng.view("v").collect())
    assert got == [("a", 1), ("b", 1)], got
    # order 1 falls under the bar; group 'a' must vanish entirely
    eng.push("li", spark.createDataFrame([(1, 5)], L), weight=-1)
    eng.step()
    got = sorted(tuple(r) for r in eng.view("v").collect())
    assert got == [("b", 1)], got


def test_pure_disjunction_with_between_still_lowers(spark):
    """r8 review finding: the mixed-AND/OR guard must be BETWEEN-aware —
    ``x BETWEEN a AND b OR y = c`` is a PURE disjunction (the BETWEEN's
    AND is not a conjunction operator), so views carrying it keep their
    incremental lowerings instead of silently snapshot-diffing."""
    from database_stream_processor_spark.sql import _mixed_top_and_or
    assert not _mixed_top_and_or("x BETWEEN 1 AND 2 OR y = 3")
    assert _mixed_top_and_or("x = 1 AND y = 2 OR z = 3")
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k BIGINT NOT NULL, v BIGINT);
        CREATE VIEW d as
            SELECT k, v FROM t WHERE v BETWEEN 2 AND 4 OR v = 9;
    """)
    assert eng.view_strategy("d") == "project"
    eng.push("t", spark.createDataFrame(
        [(1, 1), (2, 3), (3, 9), (4, 5)], "k long, v long"))
    eng.step()
    got = sorted(tuple(r) for r in eng.view("d").collect())
    assert got == [(2, 3), (3, 9)], got


@pytest.mark.slow
def test_multi_subquery_filters_different_inners(spark):
    """Several subquery filter terms over DIFFERENT inner tables —
    EXISTS(orders) AND NOT EXISTS(returns) AND NOT IN(flagged) — the
    general multi-inner maintainer: per-term touched sets, anti-chain
    outer restriction, each inner restricted by the restricted outer's
    own keys (a row touched by ONE term must re-evaluate ALL terms
    against full key groups)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE cust (ck BIGINT NOT NULL, seg VARCHAR);
        CREATE TABLE ord (ok BIGINT NOT NULL, oc BIGINT);
        CREATE TABLE ret (rk BIGINT NOT NULL, rc BIGINT NOT NULL);
        CREATE VIEW v as
            SELECT ck, seg FROM cust c
            WHERE EXISTS (SELECT 1 FROM ord WHERE ord.oc = c.ck)
              AND NOT EXISTS (SELECT 1 FROM ret WHERE ret.rc = c.ck)
              AND ck NOT IN (SELECT rk FROM ret WHERE rc > 900);
    """)
    assert eng.view_strategy("v") == "multi_subquery"
    batch = """SELECT ck, seg FROM cust c
        WHERE EXISTS (SELECT 1 FROM ord WHERE ord.oc = c.ck)
          AND NOT EXISTS (SELECT 1 FROM ret WHERE ret.rc = c.ck)
          AND ck NOT IN (SELECT rk FROM ret WHERE rc > 900)"""

    def check(tag):
        want = sorted(tuple(r) for r in spark.sql(batch).collect())
        got = sorted(tuple(r) for r in eng.view("v").collect())
        assert got == want, (tag, got, want)

    C, O, R = ("ck long, seg string", "ok long, oc long",
               "rk long, rc long")
    eng.push("cust", spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], C))
    eng.push("ord", spark.createDataFrame([(10, 1), (11, 2), (12, 3)], O))
    eng.push("ret", spark.createDataFrame([(2, 2), (4, 999)], R))
    eng.step(); check("insert")
    # one tick touching two different inners in opposite directions
    eng.push("ret", spark.createDataFrame([(2, 2)], R), weight=-1)
    eng.push("ord", spark.createDataFrame([(13, 4)], O))
    eng.step(); check("retract return + new order")
    # outer-delta-free, single-inner tick: the touched row must still
    # re-evaluate the OTHER terms against their full key groups
    eng.push("ord", spark.createDataFrame([(10, 1)], O), weight=-1)
    eng.step(); check("retract only order of 1")
    eng.push("ret", spark.createDataFrame([(3, 950)], R))
    eng.step(); check("rk=3 joins the NOT IN set, kills ck=3")
    eng.push("cust", spark.createDataFrame([(5, "e")], C))
    eng.push("ord", spark.createDataFrame([(14, 5)], O))
    eng.step(); check("new customer + order in one tick")


@pytest.mark.slow
def test_multi_subquery_randomized_tick_equivalence(spark):
    """Seeded-random delta sequences against the multi-inner subquery
    maintainer: six ticks of mixed inserts and retractions (only of
    rows previously inserted) across all three tables, the view
    compared to Spark's batch evaluation of the original text after
    EVERY tick — exercises outer-only, inner-only, and mixed-delta
    restriction paths far beyond the hand-written scenarios."""
    import random
    rng = random.Random(88)
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE cu (ck BIGINT NOT NULL, v BIGINT);
        CREATE TABLE oo (ok BIGINT NOT NULL, oc BIGINT);
        CREATE TABLE rr (rk BIGINT NOT NULL, rv BIGINT NOT NULL);
        CREATE VIEW mv as
            SELECT ck, v FROM cu c
            WHERE EXISTS (SELECT 1 FROM oo WHERE oo.oc = c.ck)
              AND NOT EXISTS (SELECT 1 FROM rr
                              WHERE rr.rk = c.ck AND rr.rv > 5)
              AND ck NOT IN (SELECT rk FROM rr WHERE rv = 0);
    """)
    assert eng.view_strategy("mv") == "multi_subquery"
    batch = """SELECT ck, v FROM cu c
        WHERE EXISTS (SELECT 1 FROM oo WHERE oo.oc = c.ck)
          AND NOT EXISTS (SELECT 1 FROM rr
                          WHERE rr.rk = c.ck AND rr.rv > 5)
          AND ck NOT IN (SELECT rk FROM rr WHERE rv = 0)"""
    schemas = {"cu": "ck long, v long", "oo": "ok long, oc long",
               "rr": "rk long, rv long"}
    live = {"cu": [], "oo": [], "rr": []}

    def gen(tbl):
        if tbl == "cu":
            return (rng.randint(0, 9), rng.randint(0, 99))
        if tbl == "oo":
            return (rng.randint(0, 99), rng.randint(0, 9))
        return (rng.randint(0, 9), rng.choice([0, 1, 4, 6, 9]))

    for tick in range(6):
        n_ops = rng.randint(1, 4)
        for _ in range(n_ops):
            tbl = rng.choice(["cu", "oo", "rr"])
            if live[tbl] and rng.random() < 0.4:
                row = live[tbl].pop(rng.randrange(len(live[tbl])))
                eng.push(tbl, spark.createDataFrame([row], schemas[tbl]),
                         weight=-1)
            else:
                row = gen(tbl)
                live[tbl].append(row)
                eng.push(tbl, spark.createDataFrame([row], schemas[tbl]))
        eng.step()
        want = sorted(tuple(r) for r in spark.sql(batch).collect())
        got = sorted(tuple(r) for r in eng.view("mv").collect())
        assert got == want, (tick, got, want)


@pytest.mark.slow
def test_exists_with_join_chain_body(spark):
    """[NOT] EXISTS whose body is a JOIN chain — ``NOT EXISTS (SELECT 1
    FROM ord o JOIN li l ON l.lk = o.ok WHERE o.oc = c.ck AND l.flag >
    0)`` — pre-lowers the body's join to a hidden maintained view
    (inner-only predicates pushed in, correlated columns projected) and
    probes it through the subquery-filter machinery; deltas to EITHER
    joined table flip the verdicts."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE cust (ck BIGINT NOT NULL, seg VARCHAR);
        CREATE TABLE ord (ok BIGINT NOT NULL, oc BIGINT);
        CREATE TABLE li (lk BIGINT NOT NULL, flag BIGINT);
        CREATE VIEW v as
            SELECT ck, seg FROM cust c
            WHERE NOT EXISTS (SELECT 1 FROM ord o
                              JOIN li l ON l.lk = o.ok
                              WHERE o.oc = c.ck AND l.flag > 0)
              AND EXISTS (SELECT 1 FROM ord o2 WHERE o2.oc = c.ck);
    """)
    assert eng.view_strategy("v") == "multi_subquery"
    assert eng.view_strategy("__v_x0") == "join"
    batch = """SELECT ck, seg FROM cust c
        WHERE NOT EXISTS (SELECT 1 FROM ord o JOIN li l ON l.lk = o.ok
                          WHERE o.oc = c.ck AND l.flag > 0)
          AND EXISTS (SELECT 1 FROM ord o2 WHERE o2.oc = c.ck)"""

    def check(tag):
        want = sorted(tuple(r) for r in spark.sql(batch).collect())
        got = sorted(tuple(r) for r in eng.view("v").collect())
        assert got == want, (tag, got, want)

    C, O, L = ("ck long, seg string", "ok long, oc long",
               "lk long, flag long")
    eng.push("cust", spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], C))
    eng.push("ord", spark.createDataFrame([(10, 1), (11, 2), (12, 3)], O))
    eng.push("li", spark.createDataFrame([(10, 1), (11, 0)], L))
    eng.step(); check("insert")
    eng.push("li", spark.createDataFrame([(11, 5)], L))
    eng.step(); check("order gains a flagged line via the join")
    eng.push("li", spark.createDataFrame([(10, 1)], L), weight=-1)
    eng.step(); check("flagged line retracted")
    eng.push("ord", spark.createDataFrame([(12, 3)], O), weight=-1)
    eng.step(); check("only order retracted")


def test_typed_date_decimal_maintenance(spark):
    """DATE columns with ``date '…' + interval`` arithmetic and
    DECIMAL(15,2) money maintain exactly through insert + retraction
    ticks (the r8 verdict's evidence gap: every prior row used BIGINT
    days/cents).  Checked against Spark's own one-shot evaluation of
    the same view text, so the decimal partials must be bit-exact."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE sales (sk BIGINT, d DATE, price DECIMAL(15,2),
                            disc DECIMAL(15,2));
        CREATE VIEW rev as
            select sum(price * disc) as revenue
            from sales
            where d >= date '1995-01-01'
              and d < date '1995-01-01' + interval '1' year
              and disc between 0.05 and 0.07;
    """)
    assert eng.view_strategy("rev") == "global_agg"
    rows = [(1, "1995-03-01", "100.25", "0.05"),
            (2, "1995-06-02", "250.50", "0.06"),
            (3, "1996-01-01", "999.99", "0.06"),   # date-excluded
            (4, "1995-07-04", "400.75", "0.10"),   # disc-excluded
            (5, "1995-12-31", "321.10", "0.07")]

    def mk(rs):
        df = spark.createDataFrame(
            [(a, b, c, d) for a, b, c, d in rs],
            "sk long, d string, price string, disc string")
        return df.select(
            "sk", F.col("d").cast("date").alias("d"),
            F.col("price").cast("decimal(15,2)").alias("price"),
            F.col("disc").cast("decimal(15,2)").alias("disc"))

    import decimal
    eng.push("sales", mk(rows))
    eng.step()
    got = eng.view("rev").collect()[0][0]
    assert got == decimal.Decimal("42.5195"), got
    # retraction: pull row 2 back out — exact decimal de-accumulation
    eng.push("sales", mk([rows[1]]), weight=-1)
    eng.step()
    got = eng.view("rev").collect()[0][0]
    assert got == decimal.Decimal("27.4895"), got
    # retract everything in the filter range: SQL empty-group NULL
    eng.push("sales", mk([rows[0], rows[4]]), weight=-1)
    eng.step()
    assert eng.view("rev").collect()[0][0] is None


@pytest.mark.slow
def test_tokenizer_fuzz_extended_shapes(spark):
    """r8 verdict ask #4 (second half): the shared-tokenizer fuzz grows
    the shapes the old per-helper scanners were never tested on — NOT
    with parenthesized bodies, doubly-nested parens, doubled-quote
    escapes WITH an AND inside the literal, literals containing ``--``
    (must still lower: the marker is inside a string), and double-quoted
    literals (must REFUSE to the snapshot-diff fallback).  Contract as
    ever: every view equals Spark's own evaluation of the ORIGINAL text
    after inserts AND a retraction tick."""
    import random
    rng = random.Random(17)
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ua (ak BIGINT NOT NULL, av BIGINT, s VARCHAR);
        CREATE TABLE ub (bk BIGINT NOT NULL, bv BIGINT);
    """)
    conj_pool = [
        lambda: "NOT (av = {} AND bv > {})".format(rng.randint(0, 3),
                                                   rng.randint(0, 4)),
        lambda: "((av > {} AND bv < {}))".format(rng.randint(0, 2),
                                                 rng.randint(6, 9)),
        lambda: "s <> 'it''s A AND B'",
        lambda: "s <> '-- not a comment'",
        lambda: "NOT (av BETWEEN {} AND {})".format(rng.randint(4, 5),
                                                    rng.randint(6, 8)),
        lambda: 's <> "dq"',          # refusal shape: double-quoted
    ]
    texts = []
    for i in range(8):
        conjs = ["ak = bk"] + [rng.choice(conj_pool)()
                               for _ in range(rng.randint(1, 3))]
        rng.shuffle(conjs)
        texts.append("SELECT ak, av, bv FROM ua, ub "
                     f"WHERE {' AND '.join(conjs)}")
        eng.execute(f"CREATE VIEW tz{i} as {texts[i]};")
    ub_df = spark.createDataFrame(
        [(k, rng.randint(0, 9)) for k in range(8)], "bk long, bv long")
    eng.push("ua", spark.createDataFrame(
        [(k, rng.randint(0, 6),
          rng.choice(["p", "it's A AND B", "-- not a comment"]))
         for k in range(8)], "ak long, av long, s string"))
    eng.push("ub", ub_df)
    eng.step()
    eng.push("ua", spark.createDataFrame(
        [(3, 2, "late")], "ak long, av long, s string"))
    eng.push("ub", ub_df.filter(F.col("bk") == 5), weight=-1)
    eng.step()
    for i, txt in enumerate(texts):
        want = sorted((tuple(r) for r in spark.sql(txt).collect()),
                      key=str)
        got = sorted((tuple(r) for r in eng.view(f"tz{i}").collect()),
                     key=str)
        assert got == want, (i, txt, got, want)
    # the double-quoted shapes must have refused the fast paths —
    # "differentiate" is the snapshot-diff fallback maintainer's kind
    for i, txt in enumerate(texts):
        if '"' in txt:
            assert eng.view_strategy(f"tz{i}") == "differentiate", (
                i, txt, eng.view_strategy(f"tz{i}"))


@pytest.mark.slow
def test_multi_subquery_refusal_and_routing_fuzz(spark):
    """r8 verdict ask #6: randomized tick-equivalence over the shapes
    the multi-subquery matcher must REFUSE or route specially —
    (a) nullable NOT IN mixed with an EXISTS term (three-valued NULL
    semantics: the plain multi-term path must not claim it),
    (b) two EXISTS terms over the SAME inner table with DIFFERENT
    correlation keys, (c) an IN body carrying its own predicate.
    Six ticks of seeded inserts/retractions per view, compared to
    Spark's batch evaluation of the original text after every tick —
    NULLs are seeded into the nullable columns deliberately."""
    import random
    rng = random.Random(43)
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE mcu (ck BIGINT NOT NULL, v BIGINT);
        CREATE TABLE moo (ok BIGINT NOT NULL, oc BIGINT, od BIGINT);
        CREATE TABLE mrr (rk BIGINT, rv BIGINT NOT NULL);
    """)
    views = {
        "ra": """SELECT ck, v FROM mcu c
            WHERE ck NOT IN (SELECT rk FROM mrr)
              AND EXISTS (SELECT 1 FROM moo WHERE moo.oc = c.ck)""",
        "rb": """SELECT ck, v FROM mcu c
            WHERE EXISTS (SELECT 1 FROM moo WHERE moo.oc = c.ck)
              AND EXISTS (SELECT 1 FROM moo o2 WHERE o2.od = c.ck)""",
        "rc": """SELECT ck, v FROM mcu c
            WHERE ck IN (SELECT rk FROM mrr WHERE rv > 2)
              AND EXISTS (SELECT 1 FROM moo WHERE moo.oc = c.ck)""",
    }
    for name, txt in views.items():
        eng.execute(f"CREATE VIEW {name} as {txt};")
    # (a) must not be claimed by the plain multi-term maintainer: mrr.rk
    # is declared nullable, so its NOT IN needs three-valued semantics
    assert eng.view_strategy("ra") != "multi_subquery", \
        eng.view_strategy("ra")
    schemas = {"mcu": "ck long, v long", "moo": "ok long, oc long, od long",
               "mrr": "rk long, rv long"}
    live = {"mcu": [], "moo": [], "mrr": []}

    def gen(tbl):
        if tbl == "mcu":
            return (rng.randint(0, 9), rng.randint(0, 99))
        if tbl == "moo":
            return (rng.randint(0, 99), rng.randint(0, 9),
                    rng.randint(0, 9))
        # rk nullable on purpose: NULL flips NOT IN to all-refuse
        return (rng.choice([None, 0, 1, 2, 3, 4, 5, 6]),
                rng.randint(0, 9))

    for tick in range(6):
        for _ in range(rng.randint(1, 4)):
            tbl = rng.choice(["mcu", "moo", "mrr"])
            if live[tbl] and rng.random() < 0.4:
                row = live[tbl].pop(rng.randrange(len(live[tbl])))
                eng.push(tbl, spark.createDataFrame([row], schemas[tbl]),
                         weight=-1)
            else:
                row = gen(tbl)
                live[tbl].append(row)
                eng.push(tbl, spark.createDataFrame([row], schemas[tbl]))
        eng.step()
        for name, txt in views.items():
            want = sorted((tuple(r) for r in spark.sql(txt).collect()),
                          key=str)
            got = sorted((tuple(r) for r in eng.view(name).collect()),
                         key=str)
            assert got == want, (tick, name, got, want)


def test_subquery_restriction_is_delta_bounded(spark):
    """SCALE.md's subquery-filter claim, now ENFORCED (r8 verdict ask
    #5): on a small-delta tick the maintainers' restricted slices must
    be a tiny fraction of the table sizes — 1000 outer rows / 2000
    inner rows, then one tick touching 2 correlation keys must restrict
    to ≤ a few dozen rows on both the single-term and the multi-term
    maintainer."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE bc (ck BIGINT NOT NULL, v BIGINT);
        CREATE TABLE bo (ok BIGINT NOT NULL, oc BIGINT NOT NULL);
        CREATE TABLE br (rk BIGINT NOT NULL, rv BIGINT NOT NULL);
        CREATE VIEW sv as
            SELECT ck, v FROM bc c
            WHERE EXISTS (SELECT 1 FROM bo WHERE bo.oc = c.ck);
        CREATE VIEW mv as
            SELECT ck, v FROM bc c
            WHERE EXISTS (SELECT 1 FROM bo WHERE bo.oc = c.ck)
              AND NOT EXISTS (SELECT 1 FROM br
                              WHERE br.rk = c.ck AND br.rv > 5);
    """)
    assert eng.view_strategy("sv") in ("exists", "in", "subquery_filter",
                                       "semi")
    assert eng.view_strategy("mv") == "multi_subquery"
    eng.push("bc", spark.range(1000).selectExpr(
        "id AS ck", "id % 7 AS v"))
    eng.push("bo", spark.range(2000).selectExpr(
        "id AS ok", "id % 500 AS oc"))
    eng.push("br", spark.range(1000).selectExpr(
        "id AS rk", "id % 9 AS rv"))
    eng.step()
    # small tick: 2 keys touched (one outer insert, one inner insert)
    eng.push("bc", spark.createDataFrame([(77, 1)], "ck long, v long"))
    eng.push("bo", spark.createDataFrame([(9001, 42)],
                                         "ok long, oc long"))
    eng.step()
    sm = eng._maintainers["sv"].last_restrict_stats()
    mm = eng._maintainers["mv"].last_restrict_stats()
    assert sm is not None and mm is not None
    # 2 touched keys of 500 inner key-groups: outer ≤ ~2 rows + dupes,
    # inner ≤ ~2 groups × 4 rows — orders of magnitude under the totals
    assert sm["outer"] <= 10, sm
    assert sm["inner"] <= 20, sm
    assert mm["outer"] <= 10, mm
    assert all(v <= 20 for k, v in mm.items() if k.startswith("inner:")), mm


@pytest.mark.slow
def test_expression_group_by_keys_lower(spark):
    """GROUP BY on EXPRESSIONS (the SQL tumbling-window idiom the
    reference's Calcite frontend accepts): a hidden projection view
    materializes each expression key, the aggregate re-lowers linearly
    over its delta — r9 gap-close; previously snapshot-diff."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ev (eid BIGINT NOT NULL, ut BIGINT NOT NULL,
                         v BIGINT);
        CREATE VIEW hourly as
            select ut - ut % 3600 as window_start, count(*) as n,
                   sum(v) as s
            from ev group by ut - ut % 3600;
        CREATE VIEW hourly2 as
            select floor(ut / 3600) * 3600 as ws, count(*) as n
            from ev e where e.v > 1 group by floor(ut / 3600) * 3600;
        CREATE VIEW hourly3 as
            select ut - ut % 3600 as ws, sum(v) as s
            from ev group by ut - ut % 3600
            having sum(v) > 5 and ut - ut % 3600 > 0;
    """)
    assert eng.view_strategy("hourly") == "linear_agg"
    assert eng.view_strategy("__hourly_ek") == "project"
    assert eng.view_strategy("hourly2") == "linear_agg"
    assert eng.view_strategy("hourly3") == "linear_agg"
    import random
    rng = random.Random(5)
    rows = [(i, rng.randint(0, 20000), i % 7) for i in range(200)]
    b1 = ("select ut - ut % 3600 as window_start, count(*) as n, "
          "sum(v) as s from ev group by ut - ut % 3600")
    b2 = ("select floor(ut / 3600) * 3600 as ws, count(*) as n "
          "from ev e where e.v > 1 group by floor(ut / 3600) * 3600")
    b3 = ("select ut - ut % 3600 as ws, sum(v) as s from ev "
          "group by ut - ut % 3600 "
          "having sum(v) > 5 and ut - ut % 3600 > 0")

    def check(tag):
        for v, b in (("hourly", b1), ("hourly2", b2), ("hourly3", b3)):
            want = sorted(map(tuple, spark.sql(b).collect()), key=str)
            got = sorted(map(tuple, eng.view(v).collect()), key=str)
            assert got == want, (tag, v, got, want)

    eng.push("ev", spark.createDataFrame(rows, "eid long, ut long, v long"))
    eng.step()
    check("insert")
    eng.push("ev", spark.createDataFrame(rows[:50],
                                         "eid long, ut long, v long"),
             weight=-1)
    eng.step()
    check("retract")


def test_expression_group_by_keys_over_join_chain(spark):
    """Expression GROUP BY keys over an inner-join chain (the classic
    date-bucket rollup over a join): the hidden view carries the whole
    join as multilinear delta legs, the key expression rides its
    projection, and the aggregate re-lowers linearly."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE jorders (ok BIGINT NOT NULL, ck BIGINT, od BIGINT);
        CREATE TABLE jcust (ck BIGINT NOT NULL, seg VARCHAR);
        CREATE VIEW jv as
            select seg, od - od % 86400 as day_bucket, count(*) as n
            from jorders o join jcust c on o.ck = c.ck
            where od > 100
            group by seg, od - od % 86400;
    """)
    assert eng.view_strategy("jv") == "linear_agg"
    assert eng.view_strategy("__jv_ek") == "join"
    import random
    rng = random.Random(7)
    ords = [(i, rng.randint(0, 20), rng.randint(0, 400000))
            for i in range(300)]
    cs = [(k, rng.choice(["A", "B", "C"])) for k in range(21)]
    b = ("select seg, od - od % 86400 as day_bucket, count(*) as n "
         "from jorders o join jcust c on o.ck = c.ck where od > 100 "
         "group by seg, od - od % 86400")

    def check(tag):
        want = sorted(map(tuple, spark.sql(b).collect()), key=str)
        got = sorted(map(tuple, eng.view("jv").collect()), key=str)
        assert got == want, (tag, got, want)

    eng.push("jorders", spark.createDataFrame(
        ords, "ok long, ck long, od long"))
    eng.push("jcust", spark.createDataFrame(cs, "ck long, seg string"))
    eng.step()
    check("insert")
    eng.push("jorders", spark.createDataFrame(
        ords[:120], "ok long, ck long, od long"), weight=-1)
    eng.push("jcust", spark.createDataFrame(cs[:3], "ck long, seg string"),
             weight=-1)
    eng.step()
    check("retract both sides")


# --------------------------------------------------------------------- #
# WITH-clause CTEs (r9): hoisted to hidden maintained views
# --------------------------------------------------------------------- #

def test_cte_single_grouped_lowers_and_maintains(spark):
    """``WITH big AS (grouped agg) SELECT … FROM big WHERE …`` — the CTE
    becomes a hidden linear-agg view, the main body a project/filter
    over its per-tick deltas; inserts AND retractions flow through."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE li (ok BIGINT NOT NULL, qty BIGINT);
        CREATE VIEW v as
            WITH big AS (SELECT ok, SUM(qty) AS q FROM li GROUP BY ok)
            SELECT ok, q FROM big WHERE q > 10;
    """)
    assert eng.view_strategy("v") == "project"
    assert eng.view_strategy("__v_cte_big") == "linear_agg"
    batch = ("SELECT ok, SUM(qty) AS q FROM li GROUP BY ok "
             "HAVING SUM(qty) > 10")

    def check(tag):
        want = sorted(map(tuple, spark.sql(batch).collect()))
        got = sorted(map(tuple, eng.view("v").collect()))
        assert got == want, (tag, got, want)

    rows = [(k % 5, 3 + k % 7) for k in range(40)]
    eng.push("li", spark.createDataFrame(rows, "ok long, qty long"))
    eng.step()
    check("insert")
    eng.push("li", spark.createDataFrame(rows[:25], "ok long, qty long"),
             weight=-1)
    eng.step()
    check("retract")


@pytest.mark.slow
def test_cte_chain_and_join_main_body(spark):
    """Two CTEs where the second references the first, and a main body
    that joins the second against a base table with a GROUP BY — every
    stage lowers (no snapshot-diff anywhere in the stack)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ev (uid BIGINT NOT NULL, amt BIGINT);
        CREATE TABLE usr (uid BIGINT NOT NULL, seg VARCHAR);
        CREATE VIEW v as
            WITH per_user AS (SELECT uid, SUM(amt) AS total FROM ev
                              GROUP BY uid),
                 hot AS (SELECT uid, total FROM per_user
                         WHERE total > 50)
            SELECT seg, SUM(total) AS seg_total
            FROM hot JOIN usr ON hot.uid = usr.uid GROUP BY seg;
    """)
    assert eng.view_strategy("__v_cte_per_user") == "linear_agg"
    assert eng.view_strategy("__v_cte_hot") == "project"
    assert eng.view_strategy("v") != "differentiate"
    batch = """
        WITH per_user AS (SELECT uid, SUM(amt) AS total FROM ev
                          GROUP BY uid),
             hot AS (SELECT uid, total FROM per_user WHERE total > 50)
        SELECT seg, SUM(total) AS seg_total
        FROM hot JOIN usr ON hot.uid = usr.uid GROUP BY seg"""

    def check(tag):
        want = sorted(map(tuple, spark.sql(batch).collect()), key=str)
        got = sorted(map(tuple, eng.view("v").collect()), key=str)
        assert got == want, (tag, got, want)

    evs = [(k % 9, 10 + k % 13) for k in range(60)]
    us = [(u, "gold" if u % 3 == 0 else "basic") for u in range(9)]
    eng.push("ev", spark.createDataFrame(evs, "uid long, amt long"))
    eng.push("usr", spark.createDataFrame(us, "uid long, seg string"))
    eng.step()
    check("insert")
    eng.push("ev", spark.createDataFrame(evs[:33], "uid long, amt long"),
             weight=-1)
    eng.push("usr", spark.createDataFrame(us[:2], "uid long, seg string"),
             weight=-1)
    eng.step()
    check("retract both")


def test_cte_name_shadows_base_table_scoping(spark):
    """A CTE named like a base table: inside its OWN body the name means
    the base table (non-recursive scoping); in the main SELECT it means
    the CTE — standard SQL, and the rewrite must respect it."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE sales (sk BIGINT NOT NULL, amt BIGINT);
        CREATE VIEW v as
            WITH sales AS (SELECT sk, amt FROM sales WHERE amt > 5)
            SELECT sk, amt FROM sales;
    """)
    assert eng.view_strategy("v") != "differentiate"
    rows = [(k, k) for k in range(10)]
    eng.push("sales", spark.createDataFrame(rows, "sk long, amt long"))
    eng.step()
    got = sorted(map(tuple, eng.view("v").collect()))
    assert got == [(k, k) for k in range(6, 10)], got


def test_cte_refusal_shapes_fall_back(spark):
    """Column-alias lists and a CTE name colliding with a source column
    refuse the lift (snapshot-diff keeps results correct), and a failed
    lift sweeps its hidden views."""
    eng = Engine(spark)
    eng.execute("CREATE TABLE t (a BIGINT NOT NULL, b BIGINT);")
    # column-alias list form is unparsed -> fallback
    eng._create_view("v1", "WITH x (c) AS (SELECT a FROM t) "
                           "SELECT c FROM x")
    assert eng.view_strategy("v1") == "differentiate"
    # CTE named like a column of a referenced source -> fallback
    eng._create_view("v2", "WITH b AS (SELECT a FROM t WHERE a > 1) "
                           "SELECT a FROM b")
    assert eng.view_strategy("v2") == "differentiate"
    assert not [h for h in eng._maintainers if h.startswith("__v2")]
    eng.push("t", spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                                        "a long, b long"))
    eng.step()
    assert sorted(r[0] for r in eng.view("v2").collect()) == [2, 3]


@pytest.mark.slow
def test_cte_randomized_tick_equivalence(spark):
    """Seeded-random insert/retract sequences through a two-CTE stack,
    checked against Spark's batch evaluation of the original WITH text
    after every tick."""
    import random
    rng = random.Random(99)
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ra (k BIGINT NOT NULL, x BIGINT);
        CREATE TABLE rb (k BIGINT NOT NULL, s VARCHAR);
        CREATE VIEW cv as
            WITH agg AS (SELECT k, COUNT(*) AS c, SUM(x) AS sx FROM ra
                         GROUP BY k),
                 big AS (SELECT k, c, sx FROM agg WHERE c >= 2)
            SELECT s, SUM(sx) AS tot, SUM(c) AS cnt
            FROM big JOIN rb ON big.k = rb.k GROUP BY s;
    """)
    assert eng.view_strategy("cv") != "differentiate"
    batch = """
        WITH agg AS (SELECT k, COUNT(*) AS c, SUM(x) AS sx FROM ra
                     GROUP BY k),
             big AS (SELECT k, c, sx FROM agg WHERE c >= 2)
        SELECT s, SUM(sx) AS tot, SUM(c) AS cnt
        FROM big JOIN rb ON big.k = rb.k GROUP BY s"""
    schemas = {"ra": "k long, x long", "rb": "k long, s string"}
    live = {"ra": [], "rb": []}

    def gen(tbl):
        if tbl == "ra":
            return (rng.randint(0, 6), rng.randint(1, 20))
        return (rng.randint(0, 6), rng.choice(["p", "q", "r"]))

    for tick in range(6):
        for _ in range(rng.randint(1, 4)):
            tbl = rng.choice(["ra", "rb"])
            if live[tbl] and rng.random() < 0.4:
                row = live[tbl].pop(rng.randrange(len(live[tbl])))
                eng.push(tbl, spark.createDataFrame([row], schemas[tbl]),
                         weight=-1)
            else:
                row = gen(tbl)
                live[tbl].append(row)
                eng.push(tbl, spark.createDataFrame([row], schemas[tbl]))
        eng.step()
        want = sorted(map(tuple, spark.sql(batch).collect()), key=str)
        got = sorted(map(tuple, eng.view("cv").collect()), key=str)
        assert got == want, (tick, got, want)


@pytest.mark.slow
def test_select_list_scalar_subquery_bare_correlation(spark):
    """A correlated scalar subquery in the SELECT list whose correlation
    equality is written BARE (``WHERE l_ok = o_ok``, verbatim-TPC-H
    style) or mixed (``WHERE li.l_ok = o_ok``): side-attribution
    resolves inner/outer by schema scoping, the subquery lowers to a
    hidden grouped view + left join, and orders with no lineitems carry
    the NULL the left join pads (SQL one-shot semantics)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE oo (o_ok BIGINT NOT NULL, pri VARCHAR);
        CREATE TABLE li (l_ok BIGINT, qty BIGINT);
        CREATE VIEW v as
            SELECT o_ok, pri,
                   (SELECT SUM(qty) FROM li WHERE l_ok = o_ok) AS q,
                   (SELECT COUNT(*) FROM li WHERE li.l_ok = o_ok) AS c
            FROM oo;
    """)
    assert eng.view_strategy("v") == "project"
    assert eng.view_strategy("__v_sq0") == "linear_agg"
    batch = """SELECT o_ok, pri,
                      (SELECT SUM(qty) FROM li WHERE l_ok = o_ok) AS q,
                      (SELECT COUNT(*) FROM li WHERE li.l_ok = o_ok) AS c
               FROM oo"""

    def check(tag):
        want = sorted(map(tuple, spark.sql(batch).collect()), key=str)
        got = sorted(map(tuple, eng.view("v").collect()), key=str)
        assert got == want, (tag, got, want)

    oos = [(k, "hi" if k % 2 else "lo") for k in range(8)]
    lis = [(k % 5, 1 + k % 4) for k in range(30)]   # keys 5-7 unmatched
    eng.push("oo", spark.createDataFrame(oos, "o_ok long, pri string"))
    eng.push("li", spark.createDataFrame(lis, "l_ok long, qty long"))
    eng.step()
    check("insert")
    eng.push("li", spark.createDataFrame(lis[:18], "l_ok long, qty long"),
             weight=-1)
    eng.step()
    check("retract lineitems")
    eng.push("oo", spark.createDataFrame(oos[:3], "o_ok long, pri string"),
             weight=-1)
    eng.step()
    check("retract orders")


def test_cte_name_equal_to_output_alias_keeps_schema(spark):
    """ADVICE r9 #1: a select-list alias equal to a CTE name must
    survive the rewrite verbatim — the old whole-word rewrite renamed
    the output column to the hidden view name."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (x BIGINT NOT NULL);
        CREATE VIEW v as
            WITH total AS (SELECT x FROM t WHERE x > 1)
            SELECT SUM(x) AS total FROM total;
    """)
    eng.push("t", spark.createDataFrame([(1,), (2,), (3,)], "x long"))
    eng.step()
    out = eng.view("v")
    assert out.columns == ["total"], out.columns
    assert [tuple(r) for r in out.collect()] == [(5,)]


def test_cte_name_colliding_with_earlier_cte_column(spark):
    """ADVICE r9 #2: a CTE named after an EARLIER CTE's output column
    refuses the lift (snapshot-diff keeps results correct) instead of
    shipping a mangled main text."""
    eng = Engine(spark)
    eng.execute("CREATE TABLE t (a BIGINT NOT NULL);")
    eng._create_view(
        "v", "WITH c1 AS (SELECT a AS q FROM t), "
             "q AS (SELECT q AS r FROM c1 WHERE q > 1) "
             "SELECT r FROM q")
    eng.push("t", spark.createDataFrame([(1,), (2,), (3,)], "a long"))
    eng.step()
    assert sorted(r[0] for r in eng.view("v").collect()) == [2, 3]
    assert not [h for h in eng._maintainers if h.startswith("__v_")]


def test_having_key_in_subquery_split_qualified(spark):
    """ADVICE r9 #3: a qualifier-carrying HAVING key term (``t.ck IN
    (…)``) requalifies to the hidden view's bare output column, so the
    lift applies instead of falling back."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE oo (o_ok BIGINT NOT NULL, ck BIGINT, price BIGINT);
        CREATE TABLE cu (ck BIGINT NOT NULL, seg VARCHAR);
        CREATE VIEW v as
            SELECT ck, SUM(price) AS sp FROM oo
            GROUP BY ck
            HAVING oo.ck IN (SELECT ck FROM cu WHERE seg = 'gold');
    """)
    assert eng.view_strategy("v") == "in"
    rows = [(k, k % 4, 10 * k) for k in range(12)]
    cus = [(c, "gold" if c % 2 else "base") for c in range(4)]
    eng.push("oo", spark.createDataFrame(
        rows, "o_ok long, ck long, price long"))
    eng.push("cu", spark.createDataFrame(cus, "ck long, seg string"))
    eng.step()
    b = ("SELECT ck, SUM(price) AS sp FROM oo GROUP BY ck "
         "HAVING ck IN (SELECT ck FROM cu WHERE seg = 'gold')")
    want = sorted(map(tuple, spark.sql(b).collect()))
    got = sorted(map(tuple, eng.view("v").collect()))
    assert got == want, (got, want)


@pytest.mark.slow
def test_cte_union_branches(spark):
    """UNION (set semantics) whose branches read hidden CTE views —
    the setop maintainers accept hidden views as branch sources, and
    eval_on restores a hidden view's canonical binding after rebinding
    its delta (a stale delta binding would poison later consumers)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t1 (k BIGINT NOT NULL, v BIGINT);
        CREATE TABLE t2 (k BIGINT NOT NULL, w BIGINT);
        CREATE VIEW u as
            WITH a AS (SELECT k FROM t1 WHERE v > 10),
                 b AS (SELECT k FROM t2 WHERE w > 5)
            SELECT k FROM a UNION SELECT k FROM b;
    """)
    assert eng.view_strategy("u") == "union"
    batch = """WITH a AS (SELECT k FROM t1 WHERE v > 10),
                    b AS (SELECT k FROM t2 WHERE w > 5)
               SELECT k FROM a UNION SELECT k FROM b"""

    def check(tag):
        want = sorted(r[0] for r in spark.sql(batch).collect())
        got = sorted(r[0] for r in eng.view("u").collect())
        assert got == want, (tag, got, want)

    r1 = [(k, k * 3) for k in range(10)]
    r2 = [(k + 5, k) for k in range(10)]
    eng.push("t1", spark.createDataFrame(r1, "k long, v long"))
    eng.push("t2", spark.createDataFrame(r2, "k long, w long"))
    eng.step()
    check("insert")
    eng.push("t1", spark.createDataFrame(r1[4:], "k long, v long"),
             weight=-1)
    eng.step()
    check("retract t1 tail")
    eng.push("t2", spark.createDataFrame(r2[:8], "k long, w long"),
             weight=-1)
    eng.step()
    check("retract t2 head")


@pytest.mark.slow
def test_scalar_subquery_chain_from_bare_correlation(spark):
    """A correlated scalar whose own FROM is a JOIN chain and whose
    correlation equality is BARE (``WHERE l_ok = o_ok``) — the chain
    side-attribution resolves the inner side by unique ownership across
    the legs and the outer side by outer-schema membership."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE oo (o_ok BIGINT NOT NULL, pri VARCHAR);
        CREATE TABLE li (l_ok BIGINT, pk BIGINT, qty BIGINT);
        CREATE TABLE pp (p_pk BIGINT NOT NULL, heavy BIGINT);
        CREATE VIEW v as
            SELECT o_ok, pri,
                   (SELECT SUM(qty) FROM li JOIN pp ON pk = p_pk
                    WHERE l_ok = o_ok AND heavy > 0) AS hq
            FROM oo;
    """)
    assert eng.view_strategy("v") == "project"
    batch = """SELECT o_ok, pri,
                      (SELECT SUM(qty) FROM li JOIN pp ON pk = p_pk
                       WHERE l_ok = o_ok AND heavy > 0) AS hq
               FROM oo"""

    def check(tag):
        want = sorted(map(tuple, spark.sql(batch).collect()), key=str)
        got = sorted(map(tuple, eng.view("v").collect()), key=str)
        assert got == want, (tag, got, want)

    oos = [(k, "x" if k % 2 else "y") for k in range(6)]
    lis = [(k % 4, k % 3, 2 + k % 5) for k in range(24)]
    pps = [(p, p % 2) for p in range(3)]
    eng.push("oo", spark.createDataFrame(oos, "o_ok long, pri string"))
    eng.push("li", spark.createDataFrame(lis, "l_ok long, pk long, qty long"))
    eng.push("pp", spark.createDataFrame(pps, "p_pk long, heavy long"))
    eng.step()
    check("insert")
    eng.push("li", spark.createDataFrame(lis[:12],
                                         "l_ok long, pk long, qty long"),
             weight=-1)
    eng.push("pp", spark.createDataFrame(pps[2:], "p_pk long, heavy long"),
             weight=-1)
    eng.step()
    check("retract li and pp")


# --------------------------------------------------------------------- #
# WITH RECURSIVE (r9): SQL recursion on the incremental fixpoint op
# --------------------------------------------------------------------- #

def _py_closure(edges):
    """Reference transitive closure of a set of (src, dst) pairs."""
    paths = set(edges)
    while True:
        new = {(s, d2) for (s, d) in paths for (d1, d2) in edges
               if d == d1} - paths
        if not new:
            return paths
        paths |= new


@pytest.mark.slow
def test_recursive_cte_lowers_and_maintains(spark):
    """WITH RECURSIVE base UNION step lowers to the incremental
    fixpoint maintainer: insert ticks run semi-naive (stats-asserted),
    a delete tick runs DRed, and every tick's snapshot equals the
    closure of the live edge set."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE edges (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW reach as
            WITH RECURSIVE paths AS (
                SELECT src, dst FROM edges
                UNION
                SELECT p.src, e.dst FROM paths p JOIN edges e
                    ON p.dst = e.src)
            SELECT src, dst, src - dst AS gap FROM paths;
    """)
    assert eng.view_strategy("__reach_rec") == "recursive"
    assert eng.view_strategy("reach") == "project"

    def check(live, tag):
        want = sorted((s, d, s - d) for s, d in _py_closure(live))
        got = sorted(map(tuple, eng.view("reach").collect()))
        assert got == want, (tag, got, want)

    e1 = [(1, 2), (2, 3), (3, 4), (7, 1)]
    eng.push("edges", spark.createDataFrame(e1, "src long, dst long"))
    eng.step()
    check(set(e1), "seed")
    e2 = [(4, 5), (5, 2)]        # creates a cycle 2-3-4-5-2
    eng.push("edges", spark.createDataFrame(e2, "src long, dst long"))
    eng.step()
    m = eng._maintainers["__reach_rec"]
    assert m.last_stats["mode"] == "seminaive", m.last_stats
    check(set(e1) | set(e2), "cycle insert (semi-naive)")
    eng.push("edges", spark.createDataFrame([(2, 3)], "src long, dst long"),
             weight=-1)
    eng.step()
    assert m.last_stats["mode"] == "dred", m.last_stats
    check((set(e1) | set(e2)) - {(2, 3)}, "cut the cycle (DRed)")


@pytest.mark.slow
def test_recursive_cte_nonlinear_doubling(spark):
    """NON-LINEAR recursion — the doubling closure ``p ∘ p`` (the CTE
    joined with itself; reference recursive.rs:255 maintains arbitrary
    nested circuits) — lowers via per-occurrence step variants driving
    the op's delta_step_out: semi-naive inserts, DRed deletes, snapshot
    equals the closure every tick."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW reach as
            WITH RECURSIVE p AS (
                SELECT src, dst FROM ed
                UNION
                SELECT a.src, b.dst FROM p a JOIN p b ON a.dst = b.src)
            SELECT src, dst FROM p;
    """)
    assert eng.view_strategy("__reach_rec") == "recursive"

    def check(live, tag):
        want = sorted(_py_closure(live))
        got = sorted(map(tuple, eng.view("reach").collect()))
        assert got == want, (tag, got, want)

    e1 = [(1, 2), (2, 3), (3, 4), (7, 1)]
    eng.push("ed", spark.createDataFrame(e1, "src long, dst long"))
    eng.step()
    check(set(e1), "seed")
    m = eng._maintainers["__reach_rec"]
    e2 = [(4, 5), (5, 2)]        # creates a cycle 2-3-4-5-2
    eng.push("ed", spark.createDataFrame(e2, "src long, dst long"))
    eng.step()
    assert m.last_stats["mode"] == "seminaive", m.last_stats
    check(set(e1) | set(e2), "cycle insert (semi-naive)")
    eng.push("ed", spark.createDataFrame([(2, 3)], "src long, dst long"),
             weight=-1)
    eng.step()
    assert m.last_stats["mode"] == "dred", m.last_stats
    check((set(e1) | set(e2)) - {(2, 3)}, "cut the cycle (DRed)")


@pytest.mark.slow
def test_recursive_cte_second_input_table(spark):
    """Recursion whose base reads one table and whose step joins a
    SECOND — the multi-input fixpoint: deltas of either table drive
    their own legs; deletes on the join table run DRed."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE seeds (k BIGINT NOT NULL);
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW reach as
            WITH RECURSIVE r AS (
                SELECT k FROM seeds
                UNION
                SELECT e.dst AS k FROM r x JOIN ed e ON x.k = e.src)
            SELECT k FROM r;
    """)
    assert eng.view_strategy("__reach_rec") == "recursive"

    def py_reach(seeds, edges):
        out = set(seeds)
        while True:
            new = {d for s, d in edges if s in out} - out
            if not new:
                return out
            out |= new

    def check(seeds, edges, tag):
        want = sorted((k,) for k in py_reach(seeds, edges))
        got = sorted(map(tuple, eng.view("reach").collect()))
        assert got == want, (tag, got, want)

    seeds = [1, 10]
    edges = [(1, 2), (2, 3), (5, 6), (10, 11)]
    eng.push("seeds", spark.createDataFrame([(k,) for k in seeds],
                                            "k long"))
    eng.push("ed", spark.createDataFrame(edges, "src long, dst long"))
    eng.step()
    check(set(seeds), set(edges), "seed")
    m = eng._maintainers["__reach_rec"]
    # edge insert alone (connects 3 -> 5 chain)
    eng.push("ed", spark.createDataFrame([(3, 5)], "src long, dst long"))
    eng.step()
    assert m.last_stats["mode"] == "seminaive", m.last_stats
    check(set(seeds), set(edges) | {(3, 5)}, "edge insert")
    # seed insert alone
    eng.push("seeds", spark.createDataFrame([(20,)], "k long"))
    eng.step()
    check(set(seeds) | {20}, set(edges) | {(3, 5)}, "seed insert")
    # delete the bridging edge: DRed must retract the 5-6 tail
    eng.push("ed", spark.createDataFrame([(3, 5)], "src long, dst long"),
             weight=-1)
    eng.step()
    assert m.last_stats["mode"] == "dred", m.last_stats
    check(set(seeds) | {20}, set(edges), "edge delete (DRed)")
    # delete a seed: its whole unreachable component retracts
    eng.push("seeds", spark.createDataFrame([(10,)], "k long"),
             weight=-1)
    eng.step()
    check((set(seeds) | {20}) - {10}, set(edges), "seed delete")


@pytest.mark.slow
def test_recursive_cte_union_all_bag(spark):
    """UNION ALL recursion — the Z-set BAG fixpoint: multiplicities
    count derivation paths (standard SQL working-table semantics, and
    the reference's weighted recursion).  A diamond graph yields
    n_paths = 2; deletions retract through the ring with NO DRed
    (mode stays bag-linear)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW paths as
            WITH RECURSIVE p AS (
                SELECT src, dst FROM ed
                UNION ALL
                SELECT x.src, e.dst FROM p x JOIN ed e ON x.dst = e.src)
            SELECT src, dst, COUNT(*) AS n_paths FROM p
            GROUP BY src, dst;
    """)
    assert eng.view_strategy("__paths_rec") == "recursive_bag"

    def py_paths(edges):
        from collections import Counter
        ew = Counter(edges)
        acc = Counter(ew)
        frontier = Counter(ew)
        while frontier:
            new = Counter()
            for (s, d), w in frontier.items():
                for (s2, d2), w2 in ew.items():
                    if d == s2:
                        new[(s, d2)] += w * w2
            frontier = new
            acc.update(new)
        return acc

    def check(live, tag):
        want = sorted((s, d, n) for (s, d), n in py_paths(live).items())
        got = sorted(map(tuple, eng.view("paths").collect()))
        assert got == want, (tag, got, want)

    m = None
    diamond = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    eng.push("ed", spark.createDataFrame(diamond, "src long, dst long"))
    eng.step()
    check(diamond, "diamond insert: (1,4) has 2 paths, (1,5) has 2")
    m = eng._maintainers["__paths_rec"]
    assert m.last_stats["mode"] == "bag-linear", m.last_stats
    # a second bridge 1->4: (1,4) now 3 paths, (1,5) 3
    eng.push("ed", spark.createDataFrame([(1, 4)], "src long, dst long"))
    eng.step()
    assert m.last_stats["mode"] == "bag-linear", m.last_stats
    check(diamond + [(1, 4)], "extra bridge")
    # delete one diamond arm: retraction flows through the SAME linear
    # path (negative weights cancel), no DRed anywhere
    eng.push("ed", spark.createDataFrame([(1, 2)], "src long, dst long"),
             weight=-1)
    eng.step()
    assert m.last_stats["mode"] == "bag-linear", m.last_stats
    check([(1, 3), (2, 4), (3, 4), (4, 5), (1, 4)], "arm delete")


@pytest.mark.slow
def test_recursive_cte_union_all_bag_two_inputs(spark):
    """UNION ALL recursion whose BASE branch joins TWO input tables
    (r10 verdict ask #3): the bag fixpoint's multi-input mode expands
    each branch's delta multilinearly (one leg per referenced input,
    old/new mixed per the telescoping bilinear expansion), so inserts
    and deletes on EITHER input flow through the one linear path with
    ring cancellation — mode stays bag-linear on every tick."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE seeds (k BIGINT NOT NULL);
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW paths as
            WITH RECURSIVE p AS (
                SELECT s.k AS src, e.dst FROM seeds s
                    JOIN ed e ON s.k = e.src
                UNION ALL
                SELECT x.src, e.dst FROM p x JOIN ed e ON x.dst = e.src)
            SELECT src, dst, COUNT(*) AS n_paths FROM p
            GROUP BY src, dst;
    """)
    assert eng.view_strategy("__paths_rec") == "recursive_bag"
    m = eng._maintainers["__paths_rec"]
    assert sorted(m.tables) == ["ed", "seeds"], m.tables

    def py_paths(seeds, edges):
        from collections import Counter
        sw, ew = Counter(seeds), Counter(edges)
        frontier = Counter()
        for k, w in sw.items():
            for (s, d), w2 in ew.items():
                if k == s:
                    frontier[(k, d)] += w * w2
        acc = Counter(frontier)
        while frontier:
            new = Counter()
            for (s, d), w in frontier.items():
                for (s2, d2), w2 in ew.items():
                    if d == s2:
                        new[(s, d2)] += w * w2
            frontier = new
            acc.update(new)
        return acc

    def check(seeds, edges, tag):
        want = sorted((s, d, n)
                      for (s, d), n in py_paths(seeds, edges).items()
                      if n)
        got = sorted(map(tuple, eng.view("paths").collect()))
        assert got == want, (tag, got, want)
        assert m.last_stats["mode"] == "bag-linear", (tag, m.last_stats)

    seeds = [1, 1, 3]                       # duplicate seed: weight 2
    diamond = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    eng.push("seeds", spark.createDataFrame([(k,) for k in seeds],
                                            "k long"))
    eng.push("ed", spark.createDataFrame(diamond, "src long, dst long"))
    eng.step()
    check(seeds, diamond, "both-input insert")
    # edge-only tick
    eng.push("ed", spark.createDataFrame([(1, 4)], "src long, dst long"))
    eng.step()
    check(seeds, diamond + [(1, 4)], "edge insert")
    # seed-only tick
    eng.push("seeds", spark.createDataFrame([(2,)], "k long"))
    eng.step()
    check(seeds + [2], diamond + [(1, 4)], "seed insert")
    # retract one copy of the duplicated seed — multiplicities halve
    eng.push("seeds", spark.createDataFrame([(1,)], "k long"), weight=-1)
    eng.step()
    check([1, 3, 2], diamond + [(1, 4)], "seed retract")
    # retract an edge and a seed in ONE tick — both inputs negative
    eng.push("ed", spark.createDataFrame([(1, 2)], "src long, dst long"),
             weight=-1)
    eng.push("seeds", spark.createDataFrame([(3,)], "k long"), weight=-1)
    eng.step()
    check([1, 2], [(1, 3), (2, 4), (3, 4), (4, 5), (1, 4)],
          "mixed retract")


@pytest.mark.slow
def test_recursive_cte_disjoint_components(spark):
    """SEVERAL DISJOINT recursive components in one WITH RECURSIVE
    (r11 verdict ask #7, refused ≤r11): each strongly-connected CTE
    group lowers onto its OWN independent fixpoint; the main SELECT
    joins the two closures.  A second engine chains them — the later
    component reads the earlier one's members, which rewrite to its
    hidden maintained view and count as recursion INPUTS (deltas flow
    fixpoint → fixpoint).  A component reading a LATER component still
    refuses."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE TABLE ed2 (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW bridged as
            WITH RECURSIVE p AS (
                SELECT src, dst FROM ed UNION
                SELECT p.src, e.dst FROM p JOIN ed e ON p.dst = e.src),
            q AS (
                SELECT src, dst FROM ed2 UNION
                SELECT q.src, e.dst FROM q JOIN ed2 e ON q.dst = e.src)
            SELECT p.src, q.dst FROM p JOIN q ON p.dst = q.src;
        CREATE VIEW chained as
            WITH RECURSIVE p AS (
                SELECT src, dst FROM ed UNION
                SELECT p.src, e.dst FROM p JOIN ed e ON p.dst = e.src),
            q AS (
                SELECT src, dst FROM p UNION
                SELECT q.src, e.dst FROM q JOIN ed2 e ON q.dst = e.src)
            SELECT src, dst FROM q;
    """)
    for hid in ["__bridged_rec_p", "__bridged_rec_q",
                "__chained_rec_p", "__chained_rec_q"]:
        assert eng.view_strategy(hid) == "recursive", hid
    assert eng.view_strategy("bridged") == "join"

    def closure(ed):
        s, ch = set(ed), True
        while ch:
            ch = False
            for (a, b) in list(s):
                for (c, d) in list(s):
                    if b == c and (a, d) not in s:
                        s.add((a, d))
                        ch = True
        return s

    def check(e1, e2, tag):
        p, q = closure(e1), closure(e2)
        want_b = sorted({(a, d) for (a, b) in p for (c, d) in q
                         if b == c})
        got_b = sorted(set(map(tuple, eng.view("bridged").collect())))
        assert got_b == want_b, (tag, got_b, want_b)
        # chained q = p · e2* (p-paths extended by ed2 edges only)
        qc, ch = set(p), True
        while ch:
            ch = False
            for (a, b) in list(qc):
                for (c, d) in e2:
                    if b == c and (a, d) not in qc:
                        qc.add((a, d))
                        ch = True
        want_c = sorted(qc)
        got_c = sorted(set(map(tuple, eng.view("chained").collect())))
        assert got_c == want_c, (tag, got_c, want_c)

    e1 = [(1, 2), (2, 3)]
    e2 = [(3, 4), (4, 5)]
    eng.push("ed", spark.createDataFrame(e1, "src long, dst long"))
    eng.push("ed2", spark.createDataFrame(e2, "src long, dst long"))
    eng.step()
    check(e1, e2, "insert")
    eng.push("ed2", spark.createDataFrame([(5, 6)], "src long, dst long"))
    eng.push("ed", spark.createDataFrame([(2, 3)], "src long, dst long"),
             weight=-1)
    eng.step()
    check([(1, 2)], e2 + [(5, 6)], "mixed tick")
    # forward reference: an EARLIER component reading a LATER one
    # must refuse (a combined fixpoint would be needed)
    try:
        eng._create_view("fwd", """WITH RECURSIVE p AS (
            SELECT src, dst FROM q UNION
            SELECT p.src, e.dst FROM p JOIN ed e ON p.dst = e.src),
            q AS (
            SELECT src, dst FROM ed2 UNION
            SELECT q.src, e.dst FROM q JOIN ed2 e ON q.dst = e.src)
            SELECT src, dst FROM p""")
    except Exception:
        pass        # loud refusal is acceptable for recursion
    assert not [h for h in eng._maintainers if "fwd" in h]


@pytest.mark.slow
def test_recursive_cte_multi_branch(spark):
    """MULTI-BRANCH recursive bodies — NEW r12 (refused ≤r11 as
    "recursive body is not base UNION step"): a single CTE with several
    UNION/UNION ALL branches routes through the vector maintainers as a
    one-member group (they evaluate arbitrary rule lists).  Covers: two
    bases + one step (set), the same under bag semantics
    (multiplicities add across base branches), TWO STEP branches (the
    undirected closure — DRed re-derivation through both rules), and a
    FOUR-input recursion (the per-input cap was three through r11)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE s1 (k BIGINT NOT NULL);
        CREATE TABLE s2 (k BIGINT NOT NULL);
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE TABLE ed2 (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW ms as
            WITH RECURSIVE p AS (
                SELECT k FROM s1
                UNION
                SELECT k FROM s2
                UNION
                SELECT e.dst AS k FROM p JOIN ed e ON p.k = e.src)
            SELECT k FROM p;
        CREATE VIEW mb as
            WITH RECURSIVE p AS (
                SELECT k FROM s1
                UNION ALL
                SELECT k FROM s2
                UNION ALL
                SELECT e.dst AS k FROM p JOIN ed e ON p.k = e.src)
            SELECT k, COUNT(*) AS n FROM p GROUP BY k;
        CREATE VIEW undir as
            WITH RECURSIVE p AS (
                SELECT k FROM s1
                UNION
                SELECT e.dst AS k FROM p JOIN ed e ON p.k = e.src
                UNION
                SELECT e.src AS k FROM p JOIN ed e ON p.k = e.dst)
            SELECT k FROM p;
        CREATE VIEW four as
            WITH RECURSIVE p AS (
                SELECT k FROM s1
                UNION
                SELECT k FROM s2
                UNION
                SELECT e.dst AS k FROM p JOIN ed e ON p.k = e.src
                UNION
                SELECT e.dst AS k FROM p JOIN ed2 e ON p.k = e.src)
            SELECT k FROM p;
    """)
    assert eng.view_strategy("__ms_rec") == "recursive_mutual"
    assert eng.view_strategy("__mb_rec") == "recursive_bag_mutual"
    assert eng.view_strategy("__undir_rec") == "recursive_mutual"
    assert eng.view_strategy("__four_rec") == "recursive_mutual"
    assert sorted(eng._maintainers["__four_rec"].tables) == \
        ["ed", "ed2", "s1", "s2"]

    from collections import Counter

    def models(S1, S2, E, E2):
        ks = set(k for (k,) in S1) | set(k for (k,) in S2)
        ch = True
        while ch:
            ch = False
            for (a, b) in E:
                if a in ks and b not in ks:
                    ks.add(b)
                    ch = True
        ms = sorted((k,) for k in ks)
        # bag: path counts over the DAG from the seed multiset
        f = Counter(k for (k,) in S1) + Counter(k for (k,) in S2)
        acc = Counter(f)
        for _ in range(30):
            new = Counter()
            for k, w in f.items():
                for (a, b) in E:
                    if k == a:
                        new[b] += w
            new = +new
            if not new:
                break
            f = new
            acc.update(new)
        mb = sorted((k, n) for k, n in acc.items() if n)
        # undirected closure from s1 only
        us = set(k for (k,) in S1)
        ch = True
        while ch:
            ch = False
            for (a, b) in E:
                if a in us and b not in us:
                    us.add(b)
                    ch = True
                if b in us and a not in us:
                    us.add(a)
                    ch = True
        undir = sorted((k,) for k in us)
        # four-input: closure over ed ∪ ed2 from both seed sets
        fs = set(k for (k,) in S1) | set(k for (k,) in S2)
        ch = True
        while ch:
            ch = False
            for (a, b) in list(E) + list(E2):
                if a in fs and b not in fs:
                    fs.add(b)
                    ch = True
        four = sorted((k,) for k in fs)
        return ms, mb, undir, four

    def check(S1, S2, E, E2, tag):
        ms, mb, undir, four = models(S1, S2, E, E2)
        for view, want in [("ms", ms), ("mb", mb), ("undir", undir),
                           ("four", four)]:
            got = sorted(map(tuple, eng.view(view).collect()))
            assert got == want, (tag, view, got, want)

    S1, S2 = [(1,)], [(5,), (5,)]
    E, E2 = [(1, 2), (2, 3), (3, 4), (5, 6)], [(4, 9)]
    eng.push("s1", spark.createDataFrame(S1, "k long"))
    eng.push("s2", spark.createDataFrame(S2, "k long"))
    eng.push("ed", spark.createDataFrame(E, "src long, dst long"))
    eng.push("ed2", spark.createDataFrame(E2, "src long, dst long"))
    eng.step()
    check(S1, S2, E, E2, "insert")
    eng.push("ed", spark.createDataFrame([(6, 7)], "src long, dst long"))
    eng.push("s2", spark.createDataFrame([(5,)], "k long"), weight=-1)
    E.append((6, 7))
    S2.remove((5,))
    eng.step()
    check(S1, S2, E, E2, "mixed tick")
    eng.push("ed", spark.createDataFrame([(2, 3)], "src long, dst long"),
             weight=-1)
    eng.push("ed2", spark.createDataFrame([(4, 9)], "src long, dst long"),
             weight=-1)
    E.remove((2, 3))
    E2.remove((4, 9))
    eng.step()
    check(S1, S2, E, E2, "edge retract (both graphs)")


@pytest.mark.slow
def test_recursive_cte_union_all_bag_input_twice(spark):
    """UNION ALL recursion whose STEP joins the input with itself (a
    two-hop step — r11 verdict ask #2b, refused ≤r11): the repeated
    input's two atom positions splice to DISTINCT binding names, so the
    exact multilinear expansion can bind one position to the tick's
    delta while the other reads the old/new integral — no
    double-counting, and retractions cancel in the ring (mode stays
    bag-linear on every tick)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE seeds (k BIGINT NOT NULL);
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW paths as
            WITH RECURSIVE p AS (
                SELECT s.k AS src, s.k AS dst FROM seeds s
                UNION ALL
                SELECT x.src, f.dst FROM p x
                    JOIN ed e ON x.dst = e.src
                    JOIN ed f ON e.dst = f.src)
            SELECT src, dst, COUNT(*) AS n_paths FROM p
            GROUP BY src, dst;
    """)
    assert eng.view_strategy("__paths_rec") == "recursive_bag"
    m = eng._maintainers["__paths_rec"]
    assert sorted(m.tables) == ["ed", "seeds"], m.tables

    def py_paths(seeds, edges):
        from collections import Counter
        sw, ew = Counter(seeds), Counter(edges)
        two = Counter()                     # the two-hop edge relation
        for (a, b), w1 in ew.items():
            for (b2, c), w2 in ew.items():
                if b == b2:
                    two[(a, c)] += w1 * w2
        frontier = Counter({(k, k): w for k, w in sw.items()})
        acc = Counter(frontier)
        for _ in range(40):
            new = Counter()
            for (s, d), w in frontier.items():
                for (a, c), w2 in two.items():
                    if d == a:
                        new[(s, c)] += w * w2
            new = +new
            if not new:
                break
            frontier = new
            acc.update(new)
        return acc

    def check(seeds, edges, tag):
        want = sorted((s, d, n)
                      for (s, d), n in py_paths(seeds, edges).items()
                      if n)
        got = sorted(map(tuple, eng.view("paths").collect()))
        assert got == want, (tag, got, want)
        assert m.last_stats["mode"] == "bag-linear", (tag, m.last_stats)

    seeds = [1, 1, 2]                       # duplicate seed: weight 2
    chain = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 4)]
    eng.push("seeds", spark.createDataFrame([(k,) for k in seeds],
                                            "k long"))
    eng.push("ed", spark.createDataFrame(chain, "src long, dst long"))
    eng.step()
    check(seeds, chain, "both-input insert")
    # edge-only tick: the delta leg must mix Δed with old/new ed at the
    # OTHER position — new two-hop pairs use the new edge at either hop
    eng.push("ed", spark.createDataFrame([(5, 6)], "src long, dst long"))
    eng.step()
    check(seeds, chain + [(5, 6)], "edge insert")
    # retract an edge and a seed in ONE tick — both positions of the
    # repeated atom see the negative delta exactly once
    eng.push("ed", spark.createDataFrame([(2, 4)], "src long, dst long"),
             weight=-1)
    eng.push("seeds", spark.createDataFrame([(1,)], "k long"), weight=-1)
    eng.step()
    check([1, 2], [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)],
          "mixed retract")
    # duplicate EDGE: multiplicities multiply across both positions
    eng.push("ed", spark.createDataFrame([(2, 3)], "src long, dst long"))
    eng.step()
    check([1, 2], [(1, 2), (2, 3), (2, 3), (3, 4), (4, 5), (5, 6)],
          "duplicate edge")


@pytest.mark.slow
def test_recursive_cte_mutual_union_all_bag(spark):
    """MUTUAL UNION ALL recursion (r11 verdict ask #2a, refused ≤r11):
    even/odd path COUNTS — ``ev`` seeds from an input and steps through
    ``od``; ``od`` is a pure-step member through ``ev``; multiplicities
    are derivation paths.  The group lowers onto ONE vector bag
    fixpoint (VectorBagFixpointOp: per-member frontiers, rounds
    propagate the linear member matrix; the weight ring cancels
    retractions — no DRed, strictly simpler than the set vector
    fixpoint)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE seeds (k BIGINT NOT NULL);
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW evens as
            WITH RECURSIVE ev AS (
                SELECT s.k AS k FROM seeds s
                UNION ALL
                SELECT e.dst AS k FROM od o JOIN ed e ON o.k = e.src),
            od AS (
                SELECT e.dst AS k FROM ev v JOIN ed e ON v.k = e.src)
            SELECT k, COUNT(*) AS n FROM ev GROUP BY k;
    """)
    assert eng.view_strategy("__evens_rec_ev") == "recursive_bag_mutual"
    assert eng.view_strategy("__evens_rec_od") == "recursive_bag_mutual"
    m = eng._maintainers["__evens_rec_ev"]
    assert sorted(m.tables) == ["ed", "seeds"], m.tables

    def model(seeds, edges):
        # even-length weighted path counts from any seed
        from collections import Counter
        sw, ew = Counter(seeds), Counter(edges)
        acc_ev = Counter(sw)                # length-0 paths
        f, par = Counter(sw), 0
        for _ in range(40):
            new = Counter()
            for k, w in f.items():
                for (a, b), w2 in ew.items():
                    if k == a:
                        new[b] += w * w2
            f = +new
            par ^= 1
            if not f:
                break
            if par == 0:
                acc_ev.update(f)
        return acc_ev

    def check(seeds, edges, tag):
        want = sorted((k, n) for k, n in model(seeds, edges).items()
                      if n)
        got = sorted(map(tuple, eng.view("evens").collect()))
        assert got == want, (tag, got, want)
        assert m.last_stats["mode"] == "bag-linear", (tag, m.last_stats)

    seeds = [1, 1, 2]                       # duplicate seed: weight 2
    chain = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 4)]
    eng.push("seeds", spark.createDataFrame([(k,) for k in seeds],
                                            "k long"))
    eng.push("ed", spark.createDataFrame(chain, "src long, dst long"))
    eng.step()
    check(seeds, chain, "both-input insert")
    eng.push("ed", spark.createDataFrame([(5, 6)], "src long, dst long"))
    eng.step()
    check(seeds, chain + [(5, 6)], "edge insert")
    # retract an edge and a seed in ONE tick — ring cancellation
    # across BOTH members of the vector, no DRed
    eng.push("ed", spark.createDataFrame([(2, 4)], "src long, dst long"),
             weight=-1)
    eng.push("seeds", spark.createDataFrame([(1,)], "k long"), weight=-1)
    eng.step()
    check([1, 2], [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)],
          "mixed retract")


@pytest.mark.slow
def test_recursive_cte_mutual_even_odd(spark):
    """MUTUAL recursion (r10 verdict ask #2): even/odd reachability —
    ``ev`` seeds from an input and steps through ``od``; ``od`` is a
    PURE-STEP member (no base rule, schema derived from ``ev``).  The
    group lowers onto ONE vector fixpoint with a primary + satellite
    hidden view; inserts run semi-naive, the edge delete runs vector
    DRed and must retract rows from BOTH members."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE seeds (k BIGINT NOT NULL);
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW parity as
            WITH RECURSIVE ev AS (
                SELECT k FROM seeds
                UNION
                SELECT e.dst AS k FROM od o JOIN ed e ON o.k = e.src),
            od AS (
                SELECT e.dst AS k FROM ev v JOIN ed e ON v.k = e.src)
            SELECT k, 'even' AS par FROM ev
            UNION
            SELECT k, 'odd' AS par FROM od;
    """)
    assert eng.view_strategy("__parity_rec_ev") == "recursive_mutual"
    assert eng.view_strategy("__parity_rec_od") == "recursive_mutual"
    m = eng._maintainers["__parity_rec_ev"]
    assert sorted(m.tables) == ["ed", "seeds"], m.tables

    def py_evenodd(seeds, edges):
        ev, od = set(seeds), set()
        changed = True
        while changed:
            changed = False
            ne = {d for (s, d) in edges if s in od} - ev
            no = {d for (s, d) in edges if s in ev} - od
            if ne:
                ev |= ne
                changed = True
            if no:
                od |= no
                changed = True
        return ev, od

    def check(seeds, edges, tag):
        ev, od = py_evenodd(set(seeds), set(edges))
        want = sorted([(k, "even") for k in ev]
                      + [(k, "odd") for k in od])
        got = sorted(map(tuple, eng.view("parity").collect()))
        assert got == want, (tag, got, want)

    seeds = [0]
    chain = [(i, i + 1) for i in range(6)] + [(10, 11), (11, 10)]
    eng.push("seeds", spark.createDataFrame([(k,) for k in seeds],
                                            "k long"))
    eng.push("ed", spark.createDataFrame(chain, "src long, dst long"))
    eng.step()
    check(seeds, chain, "initial")
    # edge insert reaches the 10<->11 cycle: both nodes become even AND
    # odd (the vector fixpoint must close across members)
    eng.push("ed", spark.createDataFrame([(6, 10)],
                                         "src long, dst long"))
    eng.step()
    assert m.last_stats["mode"] == "seminaive", m.last_stats
    check(seeds, chain + [(6, 10)], "edge insert")
    # seed-only tick
    eng.push("seeds", spark.createDataFrame([(3,)], "k long"))
    eng.step()
    check(seeds + [3], chain + [(6, 10)], "seed insert")
    # delete the bridging edge: vector DRed retracts the cycle's rows
    # from BOTH members
    eng.push("ed", spark.createDataFrame([(6, 10)],
                                         "src long, dst long"),
             weight=-1)
    eng.step()
    assert m.last_stats["mode"] == "dred", m.last_stats
    check(seeds + [3], chain, "edge delete (DRed)")
    eng.push("seeds", spark.createDataFrame([(3,)], "k long"),
             weight=-1)
    eng.step()
    check(seeds, chain, "seed delete")


@pytest.mark.slow
def test_recursive_cte_mutual_nonlinear_same_generation(spark):
    """Mutual group where one member is NON-LINEAR in another: ``link``
    (pure-step) reads ``reach`` TWICE (link = reach ∘ reach), so its
    frontier legs go through the per-occurrence spliced variants INSIDE
    a mutual group; ``reach`` folds ``link`` back in.  The fixpoint is
    the doubling transitive closure, checked through insert and DRed
    ticks."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW clo as
            WITH RECURSIVE reach AS (
                SELECT src, dst FROM ed
                UNION
                SELECT l.src, l.dst FROM link l),
            link AS (
                SELECT a.src, b.dst FROM reach a JOIN reach b
                    ON a.dst = b.src)
            SELECT src, dst FROM reach;
    """)
    assert eng.view_strategy("__clo_rec_reach") == "recursive_mutual"
    m = eng._maintainers["__clo_rec_reach"]
    # link's two reach-occurrences must have produced spliced variants
    assert any(is_var for _, _, is_var in m._out_legs["link"]), \
        m._out_legs["link"]

    def tc(edges):
        acc = set(edges)
        while True:
            new = {(a, d) for (a, b) in acc for (c, d) in acc
                   if b == c} - acc
            if not new:
                return acc
            acc |= new

    def check(live, tag):
        want = sorted(tc(set(live)))
        got = sorted(map(tuple, eng.view("clo").collect()))
        assert got == want, (tag, got, want)

    e1 = [(1, 2), (2, 3), (3, 4), (8, 9)]
    eng.push("ed", spark.createDataFrame(e1, "src long, dst long"))
    eng.step()
    check(e1, "initial")
    eng.push("ed", spark.createDataFrame([(4, 8)], "src long, dst long"))
    eng.step()
    assert m.last_stats["mode"] == "seminaive", m.last_stats
    check(e1 + [(4, 8)], "insert")
    eng.push("ed", spark.createDataFrame([(2, 3)], "src long, dst long"),
             weight=-1)
    eng.step()
    assert m.last_stats["mode"] == "dred", m.last_stats
    check([(1, 2), (3, 4), (8, 9), (4, 8)], "delete (DRed)")


@pytest.mark.slow
def test_recursive_cte_mutual_three_members(spark):
    """A THREE-member mutual group — mod-3 hop reachability (r0 seeds,
    r1 = r0→edge, r2 = r1→edge, r0 also ← r2→edge): the SCC detection
    and the vector fixpoint are size-generic; r1/r2 are pure-step
    members typed iteratively.  Insert then DRed ticks checked against
    a python model."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE seeds (k BIGINT NOT NULL);
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW mods as
            WITH RECURSIVE r0 AS (
                SELECT k FROM seeds
                UNION
                SELECT e.dst AS k FROM r2 x JOIN ed e ON x.k = e.src),
            r1 AS (
                SELECT e.dst AS k FROM r0 x JOIN ed e ON x.k = e.src),
            r2 AS (
                SELECT e.dst AS k FROM r1 x JOIN ed e ON x.k = e.src)
            SELECT k, 0 AS m FROM r0
            UNION
            SELECT k, 1 AS m FROM r1
            UNION
            SELECT k, 2 AS m FROM r2;
    """)
    for rn in ("r0", "r1", "r2"):
        assert eng.view_strategy(f"__mods_rec_{rn}") \
            == "recursive_mutual"
    m = eng._maintainers["__mods_rec_r0"]

    def py_mod3(seeds, edges):
        rs = [set(seeds), set(), set()]
        changed = True
        while changed:
            changed = False
            for i in range(3):
                nxt = {d for (s, d) in edges if s in rs[i]} \
                    - rs[(i + 1) % 3]
                if nxt:
                    rs[(i + 1) % 3] |= nxt
                    changed = True
        return sorted((k, i) for i in range(3) for k in rs[i])

    def check(seeds, edges, tag):
        want = py_mod3(set(seeds), set(edges))
        got = sorted(map(tuple, eng.view("mods").collect()))
        assert got == want, (tag, got, want)

    seeds = [0]
    chain = [(i, i + 1) for i in range(7)]
    eng.push("seeds", spark.createDataFrame([(k,) for k in seeds],
                                            "k long"))
    eng.push("ed", spark.createDataFrame(chain, "src long, dst long"))
    eng.step()
    check(seeds, chain, "initial")
    eng.push("ed", spark.createDataFrame([(7, 8)], "src long, dst long"))
    eng.step()
    assert m.last_stats["mode"] == "seminaive", m.last_stats
    check(seeds, chain + [(7, 8)], "edge insert")
    eng.push("ed", spark.createDataFrame([(3, 4)], "src long, dst long"),
             weight=-1)
    eng.step()
    assert m.last_stats["mode"] == "dred", m.last_stats
    check(seeds, [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (6, 7),
                  (7, 8)], "edge delete (DRed)")


@pytest.mark.slow
def test_recursive_cte_input_twice_in_branch(spark):
    """A step branch joining the INPUT with itself (two-hop step:
    p ∘ ed ∘ ed) — r10's twice-referenced refusal, lifted r11 for the
    set fixpoint: each occurrence gets a spliced per-occurrence delta
    leg (over-approximation the set fixpoint dedups).  The view is all
    ODD-length paths; insert and DRed ticks checked against a python
    model."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW oddpaths as
            WITH RECURSIVE p AS (
                SELECT src, dst FROM ed
                UNION
                SELECT x.src, f.dst FROM p x
                    JOIN ed e ON x.dst = e.src
                    JOIN ed f ON e.dst = f.src)
            SELECT src, dst FROM p;
    """)
    assert eng.view_strategy("__oddpaths_rec") == "recursive"
    m = eng._maintainers["__oddpaths_rec"]

    def odd(edges):
        acc = set(edges)
        while True:
            new = {(a, d2) for (a, b) in acc for (c, d) in edges
                   for (c2, d2) in edges if b == c and d == c2} - acc
            if not new:
                return acc
            acc |= new

    def check(live, tag):
        want = sorted(odd(set(live)))
        got = sorted(map(tuple, eng.view("oddpaths").collect()))
        assert got == want, (tag, got, want)

    e1 = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    eng.push("ed", spark.createDataFrame(e1, "src long, dst long"))
    eng.step()
    check(e1, "initial")
    eng.push("ed", spark.createDataFrame([(6, 7)], "src long, dst long"))
    eng.step()
    assert m.last_stats["mode"] == "seminaive", m.last_stats
    check(e1 + [(6, 7)], "edge insert")
    eng.push("ed", spark.createDataFrame([(3, 4)], "src long, dst long"),
             weight=-1)
    eng.step()
    assert m.last_stats["mode"] == "dred", m.last_stats
    check([(1, 2), (2, 3), (4, 5), (5, 6), (6, 7)], "edge delete")


def test_recursive_cte_refusal_shapes(spark):
    """A recursive component reading a LATER component, mixed UNION /
    UNION ALL in one mutual group, non-linear bag shapes (the CTE or a
    member atom referenced twice in a UNION ALL step — divergent under
    SQL's own working-table semantics), and a CTE name shadowing a
    source all refuse (error or fallback — for recursion Spark can't
    snapshot-diff either, so _create_view surfaces the refusal loudly
    rather than mis-maintaining).  Disjoint components, mutual UNION
    ALL, and twice-referenced INPUTS lower since r12
    (test_recursive_cte_disjoint_components,
    test_recursive_cte_mutual_union_all_bag,
    test_recursive_cte_union_all_bag_input_twice)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE TABLE ed2 (src BIGINT NOT NULL, dst BIGINT NOT NULL);
    """)
    shapes = {
        "earlier component reads a later one": """WITH RECURSIVE p AS (
            SELECT src, dst FROM q UNION
            SELECT p.src, e.dst FROM p JOIN ed e ON p.dst = e.src),
            q AS (
            SELECT src, dst FROM ed2 UNION
            SELECT q.src, e.dst FROM q JOIN ed2 e ON q.dst = e.src)
            SELECT p.src, q.dst FROM p JOIN q ON p.dst = q.src""",
        "mixed UNION / UNION ALL mutual recursion": """WITH RECURSIVE p AS (
            SELECT src, dst FROM ed UNION ALL
            SELECT q.src, e.dst FROM q JOIN ed e ON q.dst = e.src),
            q AS (
            SELECT src, dst FROM ed2 UNION
            SELECT p.src, e.dst FROM p JOIN ed2 e ON p.dst = e.src)
            SELECT src, dst FROM p""",
        "non-linear mutual bag step (two member atoms)": """
            WITH RECURSIVE p AS (
            SELECT src, dst FROM ed UNION ALL
            SELECT q.src, e.dst FROM q JOIN ed e ON q.dst = e.src),
            q AS (
            SELECT src, dst FROM ed2 UNION ALL
            SELECT p.src, x.dst FROM p JOIN q x ON p.dst = x.src)
            SELECT src, dst FROM p""",
        "CTE twice in a UNION ALL step": """WITH RECURSIVE p AS (
            SELECT src, dst FROM ed UNION ALL
            SELECT a.src, b.dst FROM p a JOIN p b ON a.dst = b.src)
            SELECT src, dst FROM p""",
        "shadows table": """WITH RECURSIVE ed AS (
            SELECT src, dst FROM ed UNION
            SELECT p.src, e.dst FROM ed p JOIN ed e ON p.dst = e.src)
            SELECT src, dst FROM ed""",
    }
    for tag, sql in shapes.items():
        try:
            eng._create_view(f"v_{abs(hash(tag)) % 1000}", sql)
            strategy = eng.view_strategy(f"v_{abs(hash(tag)) % 1000}")
            assert strategy == "differentiate", (tag, strategy)
        except Exception:
            pass        # loud refusal is acceptable for recursion
        assert not [h for h in eng._maintainers
                    if "_rec" in h], tag


@pytest.mark.slow
def test_agg_over_scalar_subquery(spark):
    """Grouped aggregates OVER scalar-subquery values — ``SUM((SELECT
    SUM(qty) …))`` — via the hidden scalar-projection stage: unmatched
    outer rows carry a NULL scalar that the outer SUM skips, exactly
    one-shot semantics; the outer WHERE pushes into the hidden stage."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE oo (o_ok BIGINT NOT NULL, pri VARCHAR, flag BIGINT);
        CREATE TABLE li (l_ok BIGINT, qty BIGINT);
        CREATE VIEW v as
            SELECT pri,
                   SUM((SELECT SUM(qty) FROM li WHERE l_ok = o_ok)) AS tq,
                   COUNT(*) AS n
            FROM oo WHERE flag > 0 GROUP BY pri;
    """)
    assert eng.view_strategy("v") == "linear_agg"
    assert eng.view_strategy("__v_ssq") == "project"
    batch = """SELECT pri,
                      SUM((SELECT SUM(qty) FROM li WHERE l_ok = o_ok)) AS tq,
                      COUNT(*) AS n
               FROM oo WHERE flag > 0 GROUP BY pri"""

    def check(tag):
        want = sorted(map(tuple, spark.sql(batch).collect()), key=str)
        got = sorted(map(tuple, eng.view("v").collect()), key=str)
        assert got == want, (tag, got, want)

    oos = [(k, "a" if k % 3 else "b", k % 2) for k in range(12)]
    lis = [(k % 8, 1 + k % 5) for k in range(40)]  # keys 8-11 unmatched
    eng.push("oo", spark.createDataFrame(oos, "o_ok long, pri string, flag long"))
    eng.push("li", spark.createDataFrame(lis, "l_ok long, qty long"))
    eng.step()
    check("insert")
    eng.push("li", spark.createDataFrame(lis[:20], "l_ok long, qty long"),
             weight=-1)
    eng.step()
    check("retract li")
    eng.push("oo", spark.createDataFrame(oos[:6],
                                         "o_ok long, pri string, flag long"),
             weight=-1)
    eng.step()
    check("retract oo")


@pytest.mark.slow
def test_recursive_cte_with_companion_cte(spark):
    """The classic two-CTE recursion: a non-recursive ``edges`` CTE
    derives the graph, the recursive ``paths`` CTE closes over it —
    deltas flow base table → hidden edges view → fixpoint op → main."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE raw (k BIGINT NOT NULL, ok BIGINT);
        CREATE VIEW anc as
            WITH RECURSIVE edges AS (
                SELECT k AS src, CAST(k / 2 AS BIGINT) AS dst
                FROM raw WHERE ok = 1),
            paths AS (
                SELECT src, dst FROM edges
                UNION
                SELECT p.src, e.dst FROM paths p JOIN edges e
                    ON p.dst = e.src)
            SELECT src, dst FROM paths;
    """)
    assert eng.view_strategy("__anc_cte_edges") == "project"
    assert eng.view_strategy("__anc_rec") == "recursive"

    def closure(edges):
        paths = set(edges)
        while True:
            new = {(s, d2) for (s, d) in paths
                   for (d1, d2) in edges if d == d1} - paths
            if not new:
                return paths
            paths |= new

    rows = [(k, 1 if k < 32 else 0) for k in range(1, 64)]
    eng.push("raw", spark.createDataFrame(rows, "k long, ok long"))
    eng.step()
    live = {(k, k // 2) for k in range(1, 32)}
    got = sorted(map(tuple, eng.view("anc").collect()))
    assert got == sorted(closure(live)), len(got)
    # flip ok on some rows via retract+insert: edges move through the
    # hidden CTE view as a mixed delta
    eng.push("raw", spark.createDataFrame(rows[:8], "k long, ok long"),
             weight=-1)
    eng.push("raw", spark.createDataFrame(
        [(k, 0) for k in range(1, 9)], "k long, ok long"))
    eng.step()
    live2 = {(k, k // 2) for k in range(9, 32)}
    got = sorted(map(tuple, eng.view("anc").collect()))
    assert got == sorted(closure(live2)), len(got)


@pytest.mark.slow
def test_recursive_over_aggregated_cte(spark):
    """Recursion over a MAINTAINED AGGREGATE edge relation (the q170
    driver-row shape): the edge CTE is a grouped HAVING threshold, so
    a retraction that drops a group's SUM below it makes the linear
    aggregate maintainer emit edge DELETES — the fixpoint must consume
    them as DRed input in the same tick (delta flows linear_agg →
    fixpoint)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE raw (src BIGINT NOT NULL, dst BIGINT NOT NULL,
                          w BIGINT);
        CREATE VIEW reach as
            WITH RECURSIVE ed AS (
                SELECT src, dst FROM raw GROUP BY src, dst
                HAVING SUM(w) > 0),
            p AS (
                SELECT src, dst FROM ed UNION
                SELECT p.src, e.dst FROM p JOIN ed e ON p.dst = e.src)
            SELECT src, dst FROM p;
    """)
    assert eng.view_strategy("__reach_cte_ed") == "linear_agg"
    assert eng.view_strategy("__reach_rec") == "recursive"
    m = eng._maintainers["__reach_rec"]
    eng.push("raw", spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1)], "src long, dst long, w long"))
    eng.step()
    got = sorted(map(tuple, eng.view("reach").collect()))
    assert got == [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)], got
    # flip group (2,3) OFF: sum 1-5 = -4 fails HAVING -> edge delete
    eng.push("raw", spark.createDataFrame(
        [(2, 3, -5)], "src long, dst long, w long"))
    eng.step()
    assert m.last_stats["mode"] == "dred", m.last_stats
    got = sorted(map(tuple, eng.view("reach").collect()))
    assert got == [(1, 2), (3, 4)], got
    # flip it back ON in the same breath as a brand-new edge: mixed
    # insert delta through the aggregate view, semi-naive round
    eng.push("raw", spark.createDataFrame(
        [(2, 3, 6), (4, 5, 1)], "src long, dst long, w long"))
    eng.step()
    got = sorted(map(tuple, eng.view("reach").collect()))
    assert got == [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (2, 4),
                   (2, 5), (3, 4), (3, 5), (4, 5)], got


@pytest.mark.slow
def test_recursive_with_stratified_negation(spark):
    """NOT EXISTS over a non-recursive input inside a recursion step
    (the q171 driver-row shape): the blocked relation is a
    SUBQUERY-ROLE input — no delta legs (rebinding it to a delta would
    evaluate the NOT EXISTS against the delta, wrong answers); ticks
    touching it force the fixpoint's full recompute diff, while
    edge-only ticks stay semi-naive (insert) / DRed (delete) with the
    subquery reading blocked's INTEGRAL.  The CTE's own name inside a
    subquery (non-stratified) refuses."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE TABLE blocked (k BIGINT NOT NULL);
        CREATE VIEW reach AS
            WITH RECURSIVE p AS (
                SELECT src, dst FROM ed
                UNION
                SELECT p.src, e.dst FROM p JOIN ed e ON p.dst = e.src
                WHERE NOT EXISTS (SELECT 1 FROM blocked b
                                  WHERE b.k = e.dst))
            SELECT src, dst FROM p;
    """)
    m = eng._maintainers["__reach_rec"]
    assert m._sq_inputs == {"blocked"}
    eng.push("ed", spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                         "src long, dst long"))
    eng.push("blocked", spark.createDataFrame([(4,)], "k long"))
    eng.step()
    got = sorted(map(tuple, eng.view("reach").collect()))
    assert got == [(1, 2), (1, 3), (2, 3), (3, 4)], got
    # blocking node 3 cuts the step-derived (1,3): recompute tick
    eng.push("blocked", spark.createDataFrame([(3,)], "k long"))
    eng.step()
    assert m.last_stats["mode"] == "recompute", m.last_stats
    got = sorted(map(tuple, eng.view("reach").collect()))
    assert got == [(1, 2), (2, 3), (3, 4)], got
    # edge-only insert tick: semi-naive, NOT EXISTS reads the integral
    eng.push("ed", spark.createDataFrame([(4, 5), (5, 6)],
                                         "src long, dst long"))
    eng.step()
    assert m.last_stats["mode"] == "seminaive", m.last_stats
    got = sorted(map(tuple, eng.view("reach").collect()))
    assert got == [(1, 2), (2, 3), (3, 4), (3, 5), (3, 6), (4, 5),
                   (4, 6), (5, 6)], got
    # un-blocking node 3 re-admits (1,3): recompute tick
    eng.push("blocked", spark.createDataFrame([(3,)], "k long"),
             weight=-1)
    eng.step()
    assert m.last_stats["mode"] == "recompute", m.last_stats
    got = sorted(map(tuple, eng.view("reach").collect()))
    assert (1, 3) in got and len(got) == 9, got
    # edge delete with blocked fixed: ordinary DRed
    eng.push("ed", spark.createDataFrame([(1, 2)], "src long, dst long"),
             weight=-1)
    eng.step()
    assert m.last_stats["mode"] == "dred", m.last_stats
    got = sorted(map(tuple, eng.view("reach").collect()))
    assert got == [(2, 3), (3, 4), (3, 5), (3, 6), (4, 5), (4, 6),
                   (5, 6)], got
    # the CTE's own name inside the subquery = non-stratified: refuses
    # (falls through to the snapshot path, which Spark cannot run for
    # WITH RECURSIVE + UNION — loud error at CREATE VIEW time)
    import pytest as _pytest
    with _pytest.raises(Exception):
        eng.execute("""
            CREATE VIEW bad AS
                WITH RECURSIVE p AS (
                    SELECT src, dst FROM ed
                    UNION
                    SELECT p.src, e.dst FROM p JOIN ed e ON p.dst = e.src
                    WHERE NOT EXISTS (SELECT 1 FROM p x
                                      WHERE x.dst = e.dst))
                SELECT src, dst FROM p;
        """)


def test_recursive_branch_blockers_refuse(spark):
    """Outer joins and aggregation INSIDE a recursion branch refuse
    (r12 — both were silently accepted before and maintained wrong
    answers: the outer-join delta leg NULL-extends against the DELTA,
    a branch aggregate keeps stale intermediate extremes in the
    accumulated set).  Postgres/DuckDB refuse these shapes too.  The
    refusal falls through to the snapshot path, which Spark cannot run
    for WITH RECURSIVE + UNION — loud error at CREATE VIEW time."""
    import pytest as _pytest
    eng = Engine(spark)
    eng.execute("CREATE TABLE ed (src BIGINT NOT NULL, "
                "dst BIGINT NOT NULL);")
    with _pytest.raises(Exception):
        eng.execute("""
            CREATE VIEW bad1 AS
                WITH RECURSIVE p AS (
                    SELECT src, dst FROM ed
                    UNION
                    SELECT p.src, COALESCE(e.dst, -1) AS dst
                    FROM p LEFT JOIN ed e ON p.dst = e.src)
                SELECT src, dst FROM p;
        """)
    with _pytest.raises(Exception):
        eng.execute("""
            CREATE VIEW bad2 AS
                WITH RECURSIVE p AS (
                    SELECT src, dst FROM ed
                    UNION
                    SELECT p.src, MAX(e.dst) AS dst
                    FROM p JOIN ed e ON p.dst = e.src GROUP BY p.src)
                SELECT src, dst FROM p;
        """)
    # aggregates INSIDE a subquery span stay allowed (the span is
    # exempt — its input is recompute-role) and the view still lowers
    eng.execute("""
        CREATE TABLE cap (k BIGINT NOT NULL);
        CREATE VIEW ok AS
            WITH RECURSIVE p AS (
                SELECT src, dst FROM ed
                UNION
                SELECT p.src, e.dst FROM p JOIN ed e ON p.dst = e.src
                WHERE e.dst <= (SELECT MAX(k) FROM cap))
            SELECT src, dst FROM p;
    """)
    m = eng._maintainers["__ok_rec"]
    assert m._sq_inputs == {"cap"}
    eng.push("ed", spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                         "src long, dst long"))
    eng.push("cap", spark.createDataFrame([(3,)], "k long"))
    eng.step()
    got = sorted(map(tuple, eng.view("ok").collect()))
    assert got == [(1, 2), (1, 3), (2, 3), (3, 4)], got
    # raising the cap re-admits dst=4 walks: recompute tick
    eng.push("cap", spark.createDataFrame([(9,)], "k long"))
    eng.step()
    assert m.last_stats["mode"] == "recompute", m.last_stats
    got = sorted(map(tuple, eng.view("ok").collect()))
    assert got == [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)], got


@pytest.mark.slow
def test_mutual_path_with_subquery_role_input(spark):
    """Subquery-role inputs through the VECTOR fixpoint (the q172
    driver-row shape): a multi-branch body (two bases + a NOT EXISTS
    guarded step) routes to the mutual maintainer, whose ticks touching
    the guarded relation force the vector recompute diff while other
    ticks keep semi-naive / DRed.  A group member inside a subquery
    still refuses (non-stratified)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE TABLE seeds (k BIGINT NOT NULL);
        CREATE TABLE blocked (k BIGINT NOT NULL);
        CREATE VIEW reach AS
            WITH RECURSIVE p AS (
                SELECT src, dst FROM ed WHERE src = 1
                UNION
                SELECT k AS src, k + 1 AS dst FROM seeds
                UNION
                SELECT p.src, e.dst FROM p JOIN ed e ON p.dst = e.src
                WHERE NOT EXISTS (SELECT 1 FROM blocked b
                                  WHERE b.k = e.dst))
            SELECT src, dst FROM p;
    """)
    assert eng.view_strategy("__reach_rec") == "recursive_mutual"
    m = eng._maintainers["__reach_rec"]
    assert m._sq_inputs == {"blocked"}

    def model(ed, seeds, blocked):
        paths = ({(s, d) for (s, d) in ed if s == 1}
                 | {(k, k + 1) for k in seeds})
        while True:
            new = {(s, d2) for (s, d) in paths for (d1, d2) in ed
                   if d == d1 and d2 not in blocked} - paths
            if not new:
                return paths
            paths |= new

    ed = [(1, 2), (2, 3), (3, 4), (5, 3)]
    eng.push("ed", spark.createDataFrame(ed, "src long, dst long"))
    eng.push("seeds", spark.createDataFrame([(5,)], "k long"))
    eng.push("blocked", spark.createDataFrame([(4,)], "k long"))
    eng.step()
    got = sorted(map(tuple, eng.view("reach").collect()))
    assert got == sorted(model(set(ed), {5}, {4})), got
    eng.push("blocked", spark.createDataFrame([(3,)], "k long"))
    eng.step()
    assert m.last_stats["mode"] == "recompute", m.last_stats
    got = sorted(map(tuple, eng.view("reach").collect()))
    assert got == sorted(model(set(ed), {5}, {3, 4})), got
    eng.push("seeds", spark.createDataFrame([(9,)], "k long"))
    eng.step()
    assert m.last_stats["mode"] == "seminaive", m.last_stats
    got = sorted(map(tuple, eng.view("reach").collect()))
    assert got == sorted(model(set(ed), {5, 9}, {3, 4})), got
    eng.push("blocked", spark.createDataFrame([(3,)], "k long"),
             weight=-1)
    eng.step()
    assert m.last_stats["mode"] == "recompute", m.last_stats
    got = sorted(map(tuple, eng.view("reach").collect()))
    assert got == sorted(model(set(ed), {5, 9}, {4})), got
    eng.push("ed", spark.createDataFrame([(2, 3)],
                                         "src long, dst long"),
             weight=-1)
    eng.step()
    assert m.last_stats["mode"] == "dred", m.last_stats
    got = sorted(map(tuple, eng.view("reach").collect()))
    assert got == sorted(model(set(ed) - {(2, 3)}, {5, 9}, {4})), got
    # a group member inside a subquery refuses (non-stratified)
    import pytest as _pytest
    with _pytest.raises(Exception):
        eng.execute("""
            CREATE VIEW bad AS
                WITH RECURSIVE a AS (
                    SELECT src, dst FROM ed
                    UNION
                    SELECT b.src, b.dst FROM b
                    WHERE NOT EXISTS (SELECT 1 FROM a x
                                      WHERE x.dst = b.dst)),
                b AS (
                    SELECT src, dst FROM ed
                    UNION
                    SELECT a.src, a.dst FROM a)
                SELECT src, dst FROM a;
        """)


@pytest.mark.slow
def test_bag_recursion_with_stratified_negation(spark):
    """NOT EXISTS over a subquery-role input inside a UNION ALL (bag)
    recursion step (the q173 driver-row shape): presence tests are
    multiplicity-insensitive, so the span is sound over the weighted
    bindings; guarded-relation ticks run the op's RING recompute-diff
    (new ⊕ old⁻¹ — exact Z-set subtraction), other ticks keep the
    linear telescoping path with ring cancellation.  Checked per tick
    against a Python weighted path-count model."""
    from collections import Counter
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE TABLE blocked (k BIGINT NOT NULL);
        CREATE VIEW npaths AS
            WITH RECURSIVE p AS (
                SELECT src, dst FROM ed
                UNION ALL
                SELECT p.src, e.dst FROM p JOIN ed e ON p.dst = e.src
                WHERE NOT EXISTS (SELECT 1 FROM blocked b
                                  WHERE b.k = e.dst))
            SELECT src, dst, COUNT(*) AS n FROM p GROUP BY src, dst;
    """)
    m = eng._maintainers["__npaths_rec"]
    assert eng.view_strategy("__npaths_rec") == "recursive_bag"
    assert m._sq_inputs == {"blocked"}

    def model(E, B):
        ew = Counter(E)
        acc = Counter(ew)
        f = Counter(ew)
        for _ in range(50):
            nf = Counter()
            for (s, d), w in f.items():
                for (d1, d2), w2 in ew.items():
                    if d == d1 and d2 not in B:
                        nf[(s, d2)] += w * w2
            if not nf:
                break
            acc.update(nf)
            f = nf
        return sorted((s, d, n) for (s, d), n in acc.items())

    def check(E, B, mode):
        got = sorted(map(tuple, eng.view("npaths").collect()))
        assert got == model(E, B), (got, model(E, B))
        assert m.last_stats["mode"] == mode, m.last_stats

    E = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    eng.push("ed", spark.createDataFrame(E, "src long, dst long"))
    eng.step()
    check(E, set(), "bag-linear")
    # block the diamond's meet node: recompute tick kills path counts
    eng.push("blocked", spark.createDataFrame([(4,)], "k long"))
    eng.step()
    check(E, {4}, "bag-recompute")
    # edge tick with blocked fixed: linear path, span reads integral
    E = E + [(5, 6)]
    eng.push("ed", spark.createDataFrame([(5, 6)], "src long, dst long"))
    eng.step()
    check(E, {4}, "bag-linear")
    # unblock: the two 1->4 derivations return, recompute diff
    eng.push("blocked", spark.createDataFrame([(4,)], "k long"),
             weight=-1)
    eng.step()
    check(E, set(), "bag-recompute")
    # retraction: ring cancellation on the linear path
    E = [e for e in E if e != (1, 3)]
    eng.push("ed", spark.createDataFrame([(1, 3)], "src long, dst long"),
             weight=-1)
    eng.step()
    check(E, set(), "bag-linear")
    # duplicate edge + blocked tick MIXED in one step: recompute
    # handles both (multiplicity 2 on (1,2) doubles its path counts)
    eng.push("ed", spark.createDataFrame([(1, 2)], "src long, dst long"))
    eng.push("blocked", spark.createDataFrame([(6,)], "k long"))
    eng.step()
    E = E + [(1, 2)]
    check(E, {6}, "bag-recompute")
    # a span using aggregates is NOT weighted-lowerable (the weighted
    # bindings are multiplicity-symbolic: COUNT would read row
    # counts) — it falls back to snapshot-diff, which Spark 4 CAN run
    # for UNION ALL recursion (correct answers, non-incremental)
    eng.execute("""
        CREATE VIEW agg_span AS
            WITH RECURSIVE p AS (
                SELECT src, dst FROM ed
                UNION ALL
                SELECT p.src, e.dst FROM p JOIN ed e ON p.dst = e.src
                WHERE (SELECT COUNT(*) FROM blocked) = 0)
            SELECT src, dst FROM p;
    """)
    assert eng.view_strategy("agg_span") == "differentiate"


@pytest.mark.slow
def test_stratified_negation_across_components(spark):
    """TWO-STRATA Datalog: a later recursive component guarded by NOT
    EXISTS over an EARLIER component's closure.  The earlier fixpoint's
    hidden view classifies as a subquery-role input of the later one,
    so a tick that grows stratum 1 forces stratum 2's recompute diff in
    the SAME engine tick — classic stratified evaluation, composed
    entirely from the r12 pieces (independent component fixpoints +
    subquery-role classification)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE TABLE ed2 (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW v AS
            WITH RECURSIVE a AS (
                SELECT src, dst FROM ed UNION
                SELECT a.src, e.dst FROM a JOIN ed e ON a.dst = e.src),
            b AS (
                SELECT src, dst FROM ed2 UNION
                SELECT b.src, e.dst FROM b JOIN ed2 e ON b.dst = e.src
                WHERE NOT EXISTS (SELECT 1 FROM a x
                                  WHERE x.src = b.src
                                    AND x.dst = e.dst))
            SELECT src, dst FROM b;
    """)
    assert eng._maintainers["__v_rec_b"]._sq_inputs == {"__v_rec_a"}

    def clos(E):
        p = set(E)
        while True:
            n = {(s, d2) for (s, d) in p for (d1, d2) in E
                 if d == d1} - p
            if not n:
                return p
            p |= n

    def guarded(E2, A):
        p = set(E2)
        while True:
            n = {(s, d2) for (s, d) in p for (d1, d2) in E2
                 if d == d1 and (s, d2) not in A} - p
            if not n:
                return p
            p |= n

    E = [(1, 2), (2, 3)]
    E2 = [(1, 2), (2, 3), (3, 4)]
    eng.push("ed", spark.createDataFrame(E, "src long, dst long"))
    eng.push("ed2", spark.createDataFrame(E2, "src long, dst long"))
    eng.step()
    got = sorted(map(tuple, eng.view("v").collect()))
    assert got == sorted(guarded(set(E2), clos(set(E)))), got
    # growing stratum 1 retracts stratum-2 rows mid-pipeline
    eng.push("ed", spark.createDataFrame([(3, 4)], "src long, dst long"))
    eng.step()
    got = sorted(map(tuple, eng.view("v").collect()))
    assert got == sorted(guarded(set(E2), clos(set(E) | {(3, 4)}))), got
    # shrinking stratum 1 re-admits them
    eng.push("ed", spark.createDataFrame([(3, 4)], "src long, dst long"),
             weight=-1)
    eng.step()
    got = sorted(map(tuple, eng.view("v").collect()))
    assert got == sorted(guarded(set(E2), clos(set(E)))), got


def test_nested_cte_in_cte_body(spark):
    """A WITH inside a CTE body (nested CTE): the hidden registration
    re-enters the lifts, so the inner stack lowers too."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k BIGINT NOT NULL, v BIGINT);
        CREATE VIEW v as
            WITH outerc AS (
                WITH innerc AS (SELECT k, SUM(v) AS s FROM t GROUP BY k)
                SELECT k, s FROM innerc WHERE s > 5)
            SELECT k, s FROM outerc WHERE k < 100;
    """)
    assert eng.view_strategy("v") == "project"
    assert eng.view_strategy("__v_cte_outerc") == "project"
    assert eng.view_strategy("____v_cte_outerc_cte_innerc") == "linear_agg"
    rows = [(k % 7, 2 + k % 3) for k in range(30)]
    eng.push("t", spark.createDataFrame(rows, "k long, v long"))
    eng.step()
    batch = ("SELECT k, SUM(v) AS s FROM t GROUP BY k "
             "HAVING SUM(v) > 5 AND k < 100")
    want = sorted(map(tuple, spark.sql(batch).collect()))
    got = sorted(map(tuple, eng.view("v").collect()))
    assert got == want, (got, want)
    eng.push("t", spark.createDataFrame(rows[:20], "k long, v long"),
             weight=-1)
    eng.step()
    want = sorted(map(tuple, spark.sql(batch).collect()))
    got = sorted(map(tuple, eng.view("v").collect()))
    assert got == want, (got, want)


@pytest.mark.slow
def test_union_of_aggregates_branch_lift(spark):
    """UNION ALL / UNION over grouped-aggregate branches: each branch
    hoists to a hidden linear-agg view and the union maintains over
    their deltas (weights for ALL, presence for set)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ta (k BIGINT NOT NULL, v BIGINT);
        CREATE TABLE tb (k BIGINT NOT NULL, w BIGINT);
        CREATE VIEW ua as
            SELECT k, SUM(v) AS m FROM ta GROUP BY k
            UNION ALL SELECT k, SUM(w) AS m FROM tb GROUP BY k;
        CREATE VIEW us as
            SELECT k, SUM(v) AS m FROM ta GROUP BY k
            UNION SELECT k, SUM(w) AS m FROM tb GROUP BY k;
    """)
    assert eng.view_strategy("ua") == "union_all"
    assert eng.view_strategy("us") == "union"
    assert eng.view_strategy("__ua_u0") == "linear_agg"
    ba = ("SELECT k, SUM(v) AS m FROM ta GROUP BY k UNION ALL "
          "SELECT k, SUM(w) AS m FROM tb GROUP BY k")
    bs = ("SELECT k, SUM(v) AS m FROM ta GROUP BY k UNION "
          "SELECT k, SUM(w) AS m FROM tb GROUP BY k")

    def check(tag):
        for view, b in [("ua", ba), ("us", bs)]:
            want = sorted(map(tuple, spark.sql(b).collect()), key=str)
            got = sorted(map(tuple, eng.view(view).collect()), key=str)
            assert got == want, (tag, view, got, want)

    ra = [(k % 5, 1 + k % 4) for k in range(20)]
    rb = [(k % 6, 2 + k % 3) for k in range(18)]
    eng.push("ta", spark.createDataFrame(ra, "k long, v long"))
    eng.push("tb", spark.createDataFrame(rb, "k long, w long"))
    eng.step()
    check("insert")
    eng.push("ta", spark.createDataFrame(ra[:10], "k long, v long"),
             weight=-1)
    eng.push("tb", spark.createDataFrame(rb[:9], "k long, w long"),
             weight=-1)
    eng.step()
    check("retract both")


def test_join_of_two_derived_aggregates(spark):
    """FROM (SELECT agg) x JOIN (SELECT agg) y ON x.k = y.k — both
    derived tables hoist into hidden linear-agg views with their
    aliases kept, and the outer join maintains bilinearly."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ta (k BIGINT NOT NULL, v BIGINT);
        CREATE TABLE tb (k BIGINT NOT NULL, w BIGINT);
        CREATE VIEW jj as
            SELECT x.k AS k, x.s AS s, y.t AS t FROM
                (SELECT k, SUM(v) AS s FROM ta GROUP BY k) x
                JOIN (SELECT k, SUM(w) AS t FROM tb GROUP BY k) y
                ON x.k = y.k;
    """)
    assert eng.view_strategy("jj") == "join"
    assert eng.view_strategy("__jj_sub0") == "linear_agg"
    assert eng.view_strategy("__jj_sub1") == "linear_agg"
    b = """SELECT x.k AS k, x.s AS s, y.t AS t FROM
            (SELECT k, SUM(v) AS s FROM ta GROUP BY k) x
            JOIN (SELECT k, SUM(w) AS t FROM tb GROUP BY k) y
            ON x.k = y.k"""

    def check(tag):
        want = sorted(map(tuple, spark.sql(b).collect()), key=str)
        got = sorted(map(tuple, eng.view("jj").collect()), key=str)
        assert got == want, (tag, got, want)

    ra = [(k % 5, 1 + k % 4) for k in range(20)]
    rb = [(k % 7, 2 + k % 3) for k in range(21)]
    eng.push("ta", spark.createDataFrame(ra, "k long, v long"))
    eng.push("tb", spark.createDataFrame(rb, "k long, w long"))
    eng.step()
    check("insert")
    eng.push("tb", spark.createDataFrame(rb[7:], "k long, w long"),
             weight=-1)
    eng.step()
    check("retract right")


def test_left_join_bare_on_and_is_null_antijoin(spark):
    """LEFT JOIN with BARE ON equalities (verbatim style `ON o_ok =
    l_ok`) lowers via schema side-attribution, and the `WHERE rcol IS
    NULL` anti-join idiom maintains: rows flip in/out as matches
    appear and retract."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE oo (o_ok BIGINT NOT NULL, pri VARCHAR);
        CREATE TABLE li (l_ok BIGINT, qty BIGINT);
        CREATE VIEW unmatched as
            SELECT o_ok, pri FROM oo LEFT JOIN li ON o_ok = l_ok
            WHERE l_ok IS NULL;
    """)
    assert eng.view_strategy("unmatched") == "left_join"
    b = ("SELECT o_ok, pri FROM oo LEFT JOIN li ON o_ok = l_ok "
         "WHERE l_ok IS NULL")

    def check(tag):
        want = sorted(map(tuple, spark.sql(b).collect()))
        got = sorted(map(tuple, eng.view("unmatched").collect()))
        assert got == want, (tag, got, want)

    oos = [(k, "p" if k % 2 else "q") for k in range(6)]
    eng.push("oo", spark.createDataFrame(oos, "o_ok long, pri string"))
    eng.push("li", spark.createDataFrame([(0, 1), (2, 2)],
                                         "l_ok long, qty long"))
    eng.step()
    check("insert")
    eng.push("li", spark.createDataFrame([(0, 1)], "l_ok long, qty long"),
             weight=-1)
    eng.push("li", spark.createDataFrame([(4, 9)], "l_ok long, qty long"))
    eng.step()
    check("flip matches both ways")


def test_in_subquery_expression_body(spark):
    """[NOT] IN whose body selects an EXPRESSION — the expression
    materializes in a hidden projection and the filter maintains,
    including three-valued NOT IN when the expression is nullable (one
    NULL in the inner empties the view; retracting it restores)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE oo (o_ok BIGINT NOT NULL, price BIGINT);
        CREATE TABLE li (l_ok BIGINT, qty BIGINT);
        CREATE VIEW v as
            SELECT o_ok, price FROM oo
            WHERE o_ok NOT IN (SELECT l_ok + 1 FROM li WHERE qty > 0);
    """)
    assert eng.view_strategy("v") == "not_in_nullable"
    assert eng.view_strategy("__v_inx0") == "project"
    b = ("SELECT o_ok, price FROM oo WHERE o_ok NOT IN "
         "(SELECT l_ok + 1 FROM li WHERE qty > 0)")

    def check(tag):
        want = sorted(map(tuple, spark.sql(b).collect()))
        got = sorted(map(tuple, eng.view("v").collect()))
        assert got == want, (tag, got, want)

    eng.push("oo", spark.createDataFrame([(k, 10 * k) for k in range(1, 6)],
                                         "o_ok long, price long"))
    eng.push("li", spark.createDataFrame([(1, 5), (3, 2)],
                                         "l_ok long, qty long"))
    eng.step()
    check("insert")
    null_row = spark.createDataFrame([(None, 9)], "l_ok long, qty long")
    eng.push("li", null_row)
    eng.step()
    check("NULL joins the inner (view empties)")
    eng.push("li", null_row, weight=-1)
    eng.push("li", spark.createDataFrame([(1, 5)], "l_ok long, qty long"),
             weight=-1)
    eng.step()
    check("NULL retracts, member retracts")


@pytest.mark.slow
def test_shape_over_join_lift(spark):
    """Shapes the direct join recognizers don't cover — MIN/MAX GROUP
    BY over a join, ROLLUP over a join, SELECT DISTINCT over a join —
    hoist the chain into a hidden claims-projected join view and
    re-lower over its delta."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE oo (o_ok BIGINT NOT NULL, ck BIGINT NOT NULL,
                         price BIGINT, pri VARCHAR NOT NULL);
        CREATE TABLE cu (ck BIGINT NOT NULL, seg VARCHAR NOT NULL);
        CREATE VIEW mm as
            SELECT pri, MIN(price) AS mn, MAX(price) AS mx
            FROM oo JOIN cu ON oo.ck = cu.ck GROUP BY pri;
        CREATE VIEW du as
            SELECT DISTINCT pri, seg FROM oo JOIN cu ON oo.ck = cu.ck;
        CREATE VIEW ru as
            SELECT pri, seg, SUM(price) AS sp
            FROM oo JOIN cu ON oo.ck = cu.ck
            GROUP BY ROLLUP (pri, seg);
    """)
    assert eng.view_strategy("mm") == "nonlinear_agg"
    assert eng.view_strategy("__mm_src") == "join"
    assert eng.view_strategy("du") == "distinct"
    assert eng.view_strategy("ru") == "grouping_sets_agg"
    checks = {
        "mm": "SELECT pri, MIN(price) AS mn, MAX(price) AS mx "
              "FROM oo JOIN cu ON oo.ck = cu.ck GROUP BY pri",
        "du": "SELECT DISTINCT pri, seg FROM oo JOIN cu "
              "ON oo.ck = cu.ck",
        "ru": "SELECT pri, seg, SUM(price) AS sp FROM oo JOIN cu "
              "ON oo.ck = cu.ck GROUP BY ROLLUP (pri, seg)",
    }

    def check(tag):
        for view, b in checks.items():
            want = sorted(map(tuple, spark.sql(b).collect()), key=str)
            got = sorted(map(tuple, eng.view(view).collect()), key=str)
            assert got == want, (tag, view, got, want)

    oos = [(k, k % 4, 10 * (k % 7), "p" if k % 2 else "q")
           for k in range(24)]
    cus = [(c, "x" if c % 2 else "y") for c in range(4)]
    eng.push("oo", spark.createDataFrame(
        oos, "o_ok long, ck long, price long, pri string"))
    eng.push("cu", spark.createDataFrame(cus, "ck long, seg string"))
    eng.step()
    check("insert")
    eng.push("oo", spark.createDataFrame(
        oos[:12], "o_ok long, ck long, price long, pri string"),
        weight=-1)
    eng.push("cu", spark.createDataFrame(cus[:1], "ck long, seg string"),
             weight=-1)
    eng.step()
    check("retract both sides")


@pytest.mark.slow
def test_multi_distinct_expressions_split(spark):
    """COUNT(DISTINCT a), COUNT(DISTINCT b), COUNT(*) in one grouped
    select — splits into one hidden distinct-agg view per expression
    joined on the group keys; retraction deflates each independently."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k VARCHAR NOT NULL, a BIGINT, b BIGINT);
        CREATE VIEW v as
            SELECT k, COUNT(DISTINCT a) AS da, COUNT(DISTINCT b) AS db,
                   COUNT(*) AS n
            FROM t WHERE a >= 0 GROUP BY k;
    """)
    assert eng.view_strategy("v") == "join"
    assert eng.view_strategy("__v_d0") == "distinct_agg"
    assert eng.view_strategy("__v_d1") == "distinct_agg"
    b = ("SELECT k, COUNT(DISTINCT a) AS da, COUNT(DISTINCT b) AS db, "
         "COUNT(*) AS n FROM t WHERE a >= 0 GROUP BY k")

    def check(tag):
        want = sorted(map(tuple, spark.sql(b).collect()), key=str)
        got = sorted(map(tuple, eng.view("v").collect()), key=str)
        assert got == want, (tag, got, want)

    rows = [("g" + str(k % 2), k % 5, (k * 3) % 4) for k in range(30)]
    eng.push("t", spark.createDataFrame(rows, "k string, a long, b long"))
    eng.step()
    check("insert")
    eng.push("t", spark.createDataFrame(rows[:18],
                                        "k string, a long, b long"),
             weight=-1)
    eng.step()
    check("retract")


def test_having_key_in_subquery_split(spark):
    """[NOT] IN subquery terms over GROUP KEYS inside a HAVING — the
    aggregate (with remaining HAVING conjuncts) becomes a hidden view
    and the key terms move out to a maintained semi/anti filter;
    membership-set retractions flow through."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE oo (o_ok BIGINT NOT NULL, ck BIGINT, price BIGINT);
        CREATE TABLE cu (ck BIGINT NOT NULL, seg VARCHAR);
        CREATE VIEW v as
            SELECT ck, COUNT(*) AS n, SUM(price) AS sp FROM oo
            GROUP BY ck
            HAVING ck IN (SELECT ck FROM cu WHERE seg = 'gold')
               AND COUNT(*) > 1;
    """)
    assert eng.view_strategy("v") == "in"
    assert eng.view_strategy("__v_hg") == "linear_agg"
    b = ("SELECT ck, COUNT(*) AS n, SUM(price) AS sp FROM oo GROUP BY "
         "ck HAVING ck IN (SELECT ck FROM cu WHERE seg = 'gold') AND "
         "COUNT(*) > 1")

    def check(tag):
        want = sorted(map(tuple, spark.sql(b).collect()))
        got = sorted(map(tuple, eng.view("v").collect()))
        assert got == want, (tag, got, want)

    rows = [(k, k % 5, 10 * k) for k in range(25)]
    cus = [(c, "gold" if c % 2 else "base") for c in range(5)]
    eng.push("oo", spark.createDataFrame(rows, "o_ok long, ck long, price long"))
    eng.push("cu", spark.createDataFrame(cus, "ck long, seg string"))
    eng.step()
    check("insert")
    eng.push("oo", spark.createDataFrame(rows[:15],
                                         "o_ok long, ck long, price long"),
             weight=-1)
    eng.push("cu", spark.createDataFrame([(1, "gold")], "ck long, seg string"),
             weight=-1)
    eng.step()
    check("retract rows and gold membership")


# --------------------------------------------------------------------- #
# Quantified comparisons (r10): ANY / ALL / SOME subqueries
# --------------------------------------------------------------------- #

@pytest.mark.slow
def test_quantified_any_all(spark):
    """``op ANY/ALL (SELECT …)`` — maintained through the hidden 1-row
    quantifier-scalars view + bilinear join; three-valued semantics
    (empty set, NULL elements, NULL lhs) probed against DuckDB and
    asserted here through every regime transition."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k BIGINT NOT NULL, v BIGINT);
        CREATE TABLE s (x BIGINT, grp VARCHAR);
        CREATE VIEW v_all as
            SELECT k, v FROM t
            WHERE v > ALL (SELECT x FROM s WHERE grp = 'a');
        CREATE VIEW v_any as
            SELECT k, v FROM t
            WHERE v <= ANY (SELECT x FROM s WHERE grp = 'a');
        CREATE VIEW v_neq as
            SELECT k, v FROM t
            WHERE v <> ANY (SELECT x FROM s WHERE grp = 'a');
    """)
    assert eng.view_strategy("__v_all_qs") == "quant_scalars"
    assert eng.view_strategy("v_all") == "join"

    def oracle(rows, s_rows):
        S = [x for x, g in s_rows if g == "a"]
        nn = [x for x in S if x is not None]
        has_null = any(x is None for x in S)
        v_all, v_any, v_neq = [], [], []
        for k, v in rows:
            if not S:
                v_all.append((k, v))
            elif v is not None and not has_null and v > max(nn):
                v_all.append((k, v))
            if v is not None and nn and v <= max(nn):
                v_any.append((k, v))
            if v is not None and any(x != v for x in nn):
                v_neq.append((k, v))
        return v_all, v_any, v_neq

    def check(rows, s_rows, tag):
        for vn, want in zip(("v_all", "v_any", "v_neq"),
                            oracle(rows, s_rows)):
            got = sorted(map(tuple, eng.view(vn).collect()),
                         key=str)
            assert got == sorted(want, key=str), (tag, vn, got, want)

    rows = [(1, 5), (2, 50), (3, None), (4, 10), (5, 7)]
    eng.push("t", spark.createDataFrame(rows, "k long, v long"))
    eng.step()
    check(rows, [], "empty set: ALL keeps all, ANY none")
    s1 = [(7, "a"), (10, "a"), (3, "b")]
    eng.push("s", spark.createDataFrame(s1, "x long, grp string"))
    eng.step()
    check(rows, s1, "populated set")
    # retract the max (recompute-extreme path) -> threshold drops to 7
    eng.push("s", spark.createDataFrame([(10, "a")], "x long, grp string"),
             weight=-1)
    eng.step()
    s2 = [(7, "a"), (3, "b")]
    check(rows, s2, "extreme retracted")
    # NULL lands in the set: ALL empties (except nothing), <> ANY keeps
    s3 = s2 + [(None, "a")]
    eng.push("s", spark.createDataFrame([(None, "a")],
                                        "x long, grp string"))
    eng.step()
    check(rows, s3, "NULL element: ALL blocked")
    # outer-only tick in the has-null regime stays O(delta)
    rows2 = rows + [(6, 100)]
    eng.push("t", spark.createDataFrame([(6, 100)], "k long, v long"))
    eng.step()
    check(rows2, s3, "outer delta under has-null")
    # drain the subquery entirely: back to the empty regime
    eng.push("s", spark.createDataFrame(s3, "x long, grp string"),
             weight=-1)
    eng.step()
    check(rows2, [], "drained: ALL keeps all again")


def test_quantified_eq_any_rewrites_to_in(spark):
    """``= ANY`` ≡ IN and ``<> ALL`` ≡ NOT IN — textual rewrite into
    the membership machinery (incl. the three-valued NOT IN
    maintainer), value-checked with retractions."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k BIGINT NOT NULL, v BIGINT);
        CREATE TABLE s (x BIGINT);
        CREATE VIEW v_in as
            SELECT k FROM t WHERE v = ANY (SELECT x FROM s);
        CREATE VIEW v_nin as
            SELECT k FROM t WHERE v <> ALL (SELECT x FROM s);
    """)
    assert eng.view_strategy("v_in") == "in"
    assert eng.view_strategy("v_nin") == "not_in_nullable"
    eng.push("t", spark.createDataFrame([(1, 5), (2, 7), (3, None)],
                                        "k long, v long"))
    eng.push("s", spark.createDataFrame([(5,)], "x long"))
    eng.step()
    assert sorted(r[0] for r in eng.view("v_in").collect()) == [1]
    assert sorted(r[0] for r in eng.view("v_nin").collect()) == [2]
    # NULL into s: NOT IN view empties (three-valued), IN unchanged
    eng.push("s", spark.createDataFrame([(None,)], "x long"))
    eng.step()
    assert sorted(r[0] for r in eng.view("v_in").collect()) == [1]
    assert eng.view("v_nin").count() == 0
    # retract the NULL: NOT IN returns
    eng.push("s", spark.createDataFrame([(None,)], "x long"), weight=-1)
    eng.step()
    assert sorted(r[0] for r in eng.view("v_nin").collect()) == [2]


@pytest.mark.slow
def test_quantified_expr_lhs_and_having(spark):
    """r10 verdict ask #5: the quantified rewrite corners — an
    arithmetic EXPRESSION lhs (``x * 2 > ALL``), a quantified term
    under HAVING (``HAVING SUM(x) > ALL``, split into a hidden grouped
    view + quantified WHERE), and ``<> ALL`` routed through the
    three-valued NOT IN machinery — every tick value-checked against
    DuckDB, including ALL-over-empty = TRUE, a NULL element blocking
    ALL, its retraction, and an extreme retraction."""
    import duckdb
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE o (k BIGINT NOT NULL, g BIGINT NOT NULL,
                        x DOUBLE NOT NULL);
        CREATE TABLE i1 (v DOUBLE);
        CREATE VIEW f_expr as
            SELECT k, x FROM o WHERE x * 2 > ALL (SELECT v FROM i1);
        CREATE VIEW f_hav as
            SELECT g, SUM(x) AS s FROM o GROUP BY g
            HAVING SUM(x) > ALL (SELECT v FROM i1);
        CREATE VIEW f_neq as
            SELECT k, x FROM o WHERE x <> ALL (SELECT v FROM i1);
    """)
    assert eng.view_strategy("f_expr") == "join"
    assert eng.view_strategy("f_hav") == "join"
    assert eng.view_strategy("__f_hav_hq") == "linear_agg"
    assert eng.view_strategy("f_neq") == "not_in_nullable"

    con = duckdb.connect()
    O, I = [], []

    def check(tag):
        con.execute("DROP TABLE IF EXISTS o; DROP TABLE IF EXISTS i1")
        con.execute("CREATE TABLE o(k BIGINT, g BIGINT, x DOUBLE); "
                    "CREATE TABLE i1(v DOUBLE)")
        for r in O:
            con.execute("INSERT INTO o VALUES (?,?,?)", r)
        for r in I:
            con.execute("INSERT INTO i1 VALUES (?)", r)
        for view, sql in [
            ("f_expr", "SELECT k, x FROM o "
                       "WHERE x * 2 > ALL (SELECT v FROM i1)"),
            ("f_hav", "SELECT g, SUM(x) AS s FROM o GROUP BY g "
                      "HAVING SUM(x) > ALL (SELECT v FROM i1)"),
            ("f_neq", "SELECT k, x FROM o "
                      "WHERE x NOT IN (SELECT v FROM i1)"),
        ]:
            want = sorted(map(tuple, con.execute(sql).fetchall()),
                          key=str)
            got = sorted(map(tuple, eng.view(view).collect()), key=str)
            assert got == want, (tag, view, got, want)

    def push(tbl, rows, schema, w=1):
        eng.push(tbl, spark.createDataFrame(rows, schema), weight=w)

    t1 = [(1, 1, 10.0), (2, 1, 3.0), (3, 2, 50.0)]
    push("o", t1, "k long, g long, x double")
    O += t1
    eng.step()
    check("empty inner: ALL=TRUE everywhere")
    push("i1", [(15.0,), (4.0,)], "v double")
    I += [(15.0,), (4.0,)]
    eng.step()
    check("inner insert")
    push("i1", [(None,)], "v double")
    I += [(None,)]
    eng.step()
    check("NULL element blocks ALL")
    push("i1", [(None,)], "v double", w=-1)
    I.remove((None,))
    eng.step()
    check("NULL retract refills")
    push("o", [(4, 2, 7.0)], "k long, g long, x double")
    O += [(4, 2, 7.0)]
    push("o", [(2, 1, 3.0)], "k long, g long, x double", w=-1)
    O.remove((2, 1, 3.0))
    eng.step()
    check("outer churn")
    push("i1", [(15.0,)], "v double", w=-1)
    I.remove((15.0,))
    eng.step()
    check("extreme retract")


@pytest.mark.slow
def test_quantified_peeling_composition(spark):
    """SEVERAL quantified terms in one WHERE, and quantified terms
    mixed with IN subqueries — both refused ≤r10.  Since r12 (r11
    verdict ask #6) several scalar-routed terms fold into ONE stage:
    the outer joins ALL their 1-row scalars views in one multilinear-
    join maintainer — NO peeled outer-sized state copy per term
    (two_quant has no hidden __qp stage at all).  A quantified term
    mixed with an IN still peels one stage; the remainder re-lowers
    over it.  Every tick value-checked against DuckDB's native
    ANY/ALL."""
    import duckdb
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE o (k BIGINT NOT NULL, x DOUBLE NOT NULL,
                        g BIGINT NOT NULL);
        CREATE TABLE lo (v DOUBLE);
        CREATE TABLE hi (v DOUBLE);
        CREATE TABLE mem (g BIGINT NOT NULL);
        CREATE VIEW two_quant as
            SELECT k, x FROM o
            WHERE x > ALL (SELECT v FROM lo)
              AND x < ANY (SELECT v FROM hi);
        CREATE VIEW quant_plus_in as
            SELECT k, x FROM o
            WHERE x > ALL (SELECT v FROM lo)
              AND g IN (SELECT g FROM mem);
        CREATE VIEW quant_corr_mix as
            SELECT k, x FROM o
            WHERE x >= ANY (SELECT v FROM hi)
              AND g IN (SELECT g FROM mem) AND k < 90;
    """)
    # single-stage: both scalar terms in ONE multilinear join, no
    # hidden outer-sized copy (r12)
    assert eng.view_strategy("two_quant") == "multi_join"
    assert "__two_quant_qp" not in eng._maintainers
    assert eng.view_strategy("__two_quant_qs0") == "quant_scalars"
    assert eng.view_strategy("__two_quant_qs1") == "quant_scalars"
    # the outermost stage of each peeled stack
    assert eng.view_strategy("quant_plus_in") == "in"
    assert eng.view_strategy("quant_corr_mix") == "in"

    con = duckdb.connect()
    O, LO, HI, MEM = [], [], [], []

    def check(tag):
        con.execute("DROP TABLE IF EXISTS o; DROP TABLE IF EXISTS lo;"
                    "DROP TABLE IF EXISTS hi; DROP TABLE IF EXISTS mem")
        con.execute("CREATE TABLE o(k BIGINT, x DOUBLE, g BIGINT);"
                    "CREATE TABLE lo(v DOUBLE);"
                    "CREATE TABLE hi(v DOUBLE);"
                    "CREATE TABLE mem(g BIGINT)")
        for r in O:
            con.execute("INSERT INTO o VALUES (?,?,?)", r)
        for r in LO:
            con.execute("INSERT INTO lo VALUES (?)", r)
        for r in HI:
            con.execute("INSERT INTO hi VALUES (?)", r)
        for r in MEM:
            con.execute("INSERT INTO mem VALUES (?)", r)
        for view, sql in [
            ("two_quant", "SELECT k, x FROM o "
                          "WHERE x > ALL (SELECT v FROM lo) "
                          "AND x < ANY (SELECT v FROM hi)"),
            ("quant_plus_in", "SELECT k, x FROM o "
                              "WHERE x > ALL (SELECT v FROM lo) "
                              "AND g IN (SELECT g FROM mem)"),
            ("quant_corr_mix", "SELECT k, x FROM o "
                               "WHERE x >= ANY (SELECT v FROM hi) "
                               "AND g IN (SELECT g FROM mem) "
                               "AND k < 90"),
        ]:
            want = sorted(map(tuple, con.execute(sql).fetchall()),
                          key=str)
            got = sorted(map(tuple, eng.view(view).collect()), key=str)
            assert got == want, (tag, view, got, want)

    def push(tbl, rows, schema, w=1):
        eng.push(tbl, spark.createDataFrame(rows, schema), weight=w)

    rows0 = [(1, 10.0, 1), (2, 3.0, 2), (3, 50.0, 1), (95, 20.0, 2)]
    push("o", rows0, "k long, x double, g long")
    O += rows0
    eng.step()
    check("outer only (both inners empty)")
    push("lo", [(5.0,)], "v double")
    LO += [(5.0,)]
    push("hi", [(30.0,)], "v double")
    HI += [(30.0,)]
    eng.step()
    check("inner bounds")
    push("mem", [(1,)], "g long")
    MEM += [(1,)]
    eng.step()
    check("membership insert")
    push("lo", [(None,)], "v double")
    LO += [(None,)]
    eng.step()
    check("NULL blocks the ALL leg")
    push("lo", [(None,)], "v double", w=-1)
    LO.remove((None,))
    push("mem", [(1,)], "g long", w=-1)
    MEM.remove((1,))
    push("mem", [(2,)], "g long")
    MEM += [(2,)]
    eng.step()
    check("mixed retract + membership swap")
    push("o", [(1, 10.0, 1)], "k long, x double, g long", w=-1)
    O.remove((1, 10.0, 1))
    push("hi", [(30.0,)], "v double", w=-1)
    HI.remove((30.0,))
    push("hi", [(8.0,)], "v double")
    HI += [(8.0,)]
    eng.step()
    check("outer retract + extreme swap")


@pytest.mark.slow
def test_quantified_grouped_inner(spark):
    """Quantified comparison over a GROUPED inner (r11): ``x > ALL
    (SELECT SUM(v) FROM t GROUP BY g [HAVING …])`` — the grouped body
    pre-lowers into a hidden maintained view carrying keys + ``__qv``,
    then the simple-inner quantifier machinery rides its deltas.
    Value-checked against DuckDB through group growth, a HAVING-
    dropping retraction, and a mixed tick."""
    import duckdb
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE o (k BIGINT NOT NULL, x DOUBLE NOT NULL);
        CREATE TABLE t (g BIGINT NOT NULL, v DOUBLE NOT NULL);
        CREATE VIEW above_every_group as
            SELECT k, x FROM o
            WHERE x > ALL (SELECT SUM(v) FROM t GROUP BY g);
        CREATE VIEW above_some_avg as
            SELECT k, x FROM o
            WHERE x >= ANY (SELECT AVG(v) FROM t GROUP BY g
                            HAVING COUNT(*) > 1);
    """)
    assert eng.view_strategy("above_every_group") == "join"
    assert eng.view_strategy("__above_every_group_qi") == "linear_agg"
    assert eng.view_strategy("above_some_avg") == "join"

    con = duckdb.connect()
    O, T = [], []

    def check(tag):
        con.execute("DROP TABLE IF EXISTS o; DROP TABLE IF EXISTS t")
        con.execute("CREATE TABLE o(k BIGINT, x DOUBLE); "
                    "CREATE TABLE t(g BIGINT, v DOUBLE)")
        for r in O:
            con.execute("INSERT INTO o VALUES (?,?)", r)
        for r in T:
            con.execute("INSERT INTO t VALUES (?,?)", r)
        for view, sql in [
            ("above_every_group",
             "SELECT k, x FROM o WHERE x > ALL "
             "(SELECT SUM(v) FROM t GROUP BY g)"),
            ("above_some_avg",
             "SELECT k, x FROM o WHERE x >= ANY "
             "(SELECT AVG(v) FROM t GROUP BY g HAVING COUNT(*) > 1)"),
        ]:
            want = sorted(map(tuple, con.execute(sql).fetchall()),
                          key=str)
            got = sorted(map(tuple, eng.view(view).collect()), key=str)
            assert got == want, (tag, view, got, want)

    def push(tbl, rows, schema, w=1):
        eng.push(tbl, spark.createDataFrame(rows, schema), weight=w)

    push("o", [(1, 10.0), (2, 25.0), (3, 4.0)], "k long, x double")
    O += [(1, 10.0), (2, 25.0), (3, 4.0)]
    eng.step()
    check("outer only (no groups: ALL=TRUE, ANY=FALSE)")
    push("t", [(1, 5.0), (1, 3.0), (2, 20.0)], "g long, v double")
    T += [(1, 5.0), (1, 3.0), (2, 20.0)]
    eng.step()
    check("groups appear")
    push("t", [(2, 9.0)], "g long, v double")
    T += [(2, 9.0)]
    eng.step()
    check("group sum grows past an outer row")
    push("t", [(1, 3.0)], "g long, v double", w=-1)
    T.remove((1, 3.0))
    eng.step()
    check("retract shrinks a group (HAVING drops it)")
    push("o", [(2, 25.0)], "k long, x double", w=-1)
    O.remove((2, 25.0))
    push("t", [(3, 1.0)], "g long, v double")
    T += [(3, 1.0)]
    eng.step()
    check("mixed outer retract + new group")


@pytest.mark.slow
def test_quantified_complex_inner(spark):
    """Quantified comparison over JOIN-chain and DISTINCT inners (r11):
    any lowerable uncorrelated inner pre-lowers into a hidden view with
    its single select item aliased ``__qv``; the quantifier scalars
    ride its deltas.  Value-checked against DuckDB through insert and
    retraction ticks."""
    import duckdb
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE o (k BIGINT NOT NULL, x DOUBLE NOT NULL);
        CREATE TABLE a (id BIGINT NOT NULL, v DOUBLE NOT NULL);
        CREATE TABLE b (id BIGINT NOT NULL, m DOUBLE NOT NULL);
        CREATE VIEW f_join as
            SELECT k, x FROM o
            WHERE x > ALL (SELECT a.v * b.m FROM a JOIN b
                           ON a.id = b.id);
        CREATE VIEW f_dist as
            SELECT k, x FROM o
            WHERE x < ANY (SELECT DISTINCT v FROM a WHERE v > 1);
    """)
    assert eng.view_strategy("f_join") == "join"
    assert eng.view_strategy("__f_join_qi") == "join"
    assert eng.view_strategy("f_dist") == "join"
    con = duckdb.connect()
    O, A, B = [], [], []

    def check(tag):
        con.execute("DROP TABLE IF EXISTS o; DROP TABLE IF EXISTS a;"
                    "DROP TABLE IF EXISTS b")
        con.execute("CREATE TABLE o(k BIGINT, x DOUBLE);"
                    "CREATE TABLE a(id BIGINT, v DOUBLE);"
                    "CREATE TABLE b(id BIGINT, m DOUBLE)")
        for r in O:
            con.execute("INSERT INTO o VALUES (?,?)", r)
        for r in A:
            con.execute("INSERT INTO a VALUES (?,?)", r)
        for r in B:
            con.execute("INSERT INTO b VALUES (?,?)", r)
        for view, sql in [
            ("f_join", "SELECT k, x FROM o WHERE x > ALL "
                       "(SELECT a.v * b.m FROM a JOIN b "
                       "ON a.id = b.id)"),
            ("f_dist", "SELECT k, x FROM o WHERE x < ANY "
                       "(SELECT DISTINCT v FROM a WHERE v > 1)"),
        ]:
            want = sorted(map(tuple, con.execute(sql).fetchall()),
                          key=str)
            got = sorted(map(tuple, eng.view(view).collect()), key=str)
            assert got == want, (tag, view, got, want)

    def push(tbl, rows, schema, w=1):
        eng.push(tbl, spark.createDataFrame(rows, schema), weight=w)

    push("o", [(1, 10.0), (2, 100.0)], "k long, x double")
    O += [(1, 10.0), (2, 100.0)]
    eng.step()
    check("outer only")
    push("a", [(1, 4.0), (2, 2.0)], "id long, v double")
    A += [(1, 4.0), (2, 2.0)]
    push("b", [(1, 5.0)], "id long, m double")
    B += [(1, 5.0)]
    eng.step()
    check("join products appear")
    push("b", [(2, 60.0)], "id long, m double")
    B += [(2, 60.0)]
    eng.step()
    check("second product blocks everything")
    push("b", [(2, 60.0)], "id long, m double", w=-1)
    B.remove((2, 60.0))
    push("a", [(1, 4.0)], "id long, v double", w=-1)
    A.remove((1, 4.0))
    eng.step()
    check("retractions shrink the product set")


@pytest.mark.slow
def test_quantified_correlated_composite_key(spark):
    """Correlated quantifier with SEVERAL correlation equalities (r11;
    refused ≤r10): the hidden per-key scalars view groups on the
    COMPOSITE key and the LEFT JOIN carries all equalities.  Checked
    against DuckDB's native correlated ALL, including a per-key NULL
    element and an extreme retraction."""
    import duckdb
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE o (a BIGINT NOT NULL, b BIGINT NOT NULL,
                        x DOUBLE NOT NULL);
        CREATE TABLE t (g BIGINT NOT NULL, h BIGINT NOT NULL,
                        v DOUBLE);
        CREATE VIEW f as
            SELECT a, b, x FROM o oo
            WHERE oo.x > ALL (SELECT v FROM t
                              WHERE oo.a = g AND h = oo.b AND v > 0);
    """)
    assert eng.view_strategy("f") == "left_join"
    assert eng.view_strategy("__f_qs") == "nonlinear_agg"
    con = duckdb.connect()
    O, T = [], []

    def check(tag):
        con.execute("DROP TABLE IF EXISTS o; DROP TABLE IF EXISTS t")
        con.execute("CREATE TABLE o(a BIGINT, b BIGINT, x DOUBLE); "
                    "CREATE TABLE t(g BIGINT, h BIGINT, v DOUBLE)")
        for r in O:
            con.execute("INSERT INTO o VALUES (?,?,?)", r)
        for r in T:
            con.execute("INSERT INTO t VALUES (?,?,?)", r)
        sql = ("SELECT a, b, x FROM o oo WHERE oo.x > ALL "
               "(SELECT v FROM t WHERE oo.a = g AND h = oo.b "
               "AND v > 0)")
        want = sorted(map(tuple, con.execute(sql).fetchall()), key=str)
        got = sorted(map(tuple, eng.view("f").collect()), key=str)
        assert got == want, (tag, got, want)

    def push(tbl, rows, schema, w=1):
        eng.push(tbl, spark.createDataFrame(rows, schema), weight=w)

    push("o", [(1, 1, 10.0), (1, 2, 3.0), (2, 1, 50.0)],
         "a long, b long, x double")
    O += [(1, 1, 10.0), (1, 2, 3.0), (2, 1, 50.0)]
    eng.step()
    check("outer only (all groups empty: ALL=TRUE)")
    push("t", [(1, 1, 5.0), (1, 1, 20.0), (1, 2, 1.0), (9, 9, 99.0)],
         "g long, h long, v double")
    T += [(1, 1, 5.0), (1, 1, 20.0), (1, 2, 1.0), (9, 9, 99.0)]
    eng.step()
    check("groups per composite key")
    push("t", [(1, 1, 20.0)], "g long, h long, v double", w=-1)
    T.remove((1, 1, 20.0))
    eng.step()
    check("extreme retract in one group")
    push("t", [(2, 1, None)], "g long, h long, v double")
    T += [(2, 1, None)]
    eng.step()
    check("NULL element blocks that key's ALL")
    push("o", [(1, 2, 3.0)], "a long, b long, x double", w=-1)
    O.remove((1, 2, 3.0))
    eng.step()
    check("outer retract")


def test_tuple_in_subquery(spark):
    """Row-value ``(a, b) IN (SELECT x, y FROM …)`` — the composite-key
    semi-join: the IN maintainer's touched-key machinery already runs
    on key LISTS, so the tuple spelling lowers to the same plan;
    membership retractions flow through.  Nullable tuple NOT IN
    refuses (snapshot-diff keeps three-valued semantics correct)."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (a BIGINT NOT NULL, b BIGINT NOT NULL,
                        v BIGINT NOT NULL);
        CREATE TABLE s (x BIGINT NOT NULL, y BIGINT NOT NULL);
        CREATE VIEW v_in as
            SELECT a, b, v FROM t WHERE (a, b) IN (SELECT x, y FROM s);
        CREATE VIEW v_nin as
            SELECT a, b, v FROM t
            WHERE (a, b) NOT IN (SELECT x, y FROM s);
    """)
    assert eng.view_strategy("v_in") == "in"
    assert eng.view_strategy("v_nin") == "not_in"
    batch_in = "SELECT a, b, v FROM t WHERE (a, b) IN (SELECT x, y FROM s)"
    batch_nin = ("SELECT a, b, v FROM t WHERE (a, b) NOT IN "
                 "(SELECT x, y FROM s)")

    def check(tag):
        for vn, b in (("v_in", batch_in), ("v_nin", batch_nin)):
            want = sorted(map(tuple, spark.sql(b).collect()))
            got = sorted(map(tuple, eng.view(vn).collect()))
            assert got == want, (tag, vn, got, want)

    rows = [(k % 4, k % 3, k) for k in range(12)]
    mem = [(1, 1), (2, 2), (0, 1)]
    eng.push("t", spark.createDataFrame(rows, "a long, b long, v long"))
    eng.push("s", spark.createDataFrame(mem, "x long, y long"))
    eng.step()
    check("insert")
    # retract one membership pair and some outer rows
    eng.push("s", spark.createDataFrame([(1, 1)], "x long, y long"),
             weight=-1)
    eng.push("t", spark.createDataFrame(rows[:5], "a long, b long, v long"),
             weight=-1)
    eng.step()
    check("retract membership and rows")
    # nullable tuple NOT IN now lowers to the dedicated three-valued
    # maintainer (r10 verdict ask #4) instead of the fallback
    eng.execute("CREATE TABLE tn (a BIGINT, b BIGINT);")
    eng._create_view(
        "v_nn", "SELECT a, b FROM tn WHERE (a, b) NOT IN "
                "(SELECT x, y FROM s)")
    assert eng.view_strategy("v_nn") == "not_in_nullable_tuple"


@pytest.mark.slow
def test_composition_lifts_randomized_tick_equivalence(spark):
    """r9 verdict ask #5: seeded-random insert/retract sequences
    through the r9/r10 composition lifts — expr GROUP BY keys over a
    join FROM, join-of-derived-aggregates, MIN/MAX-over-join
    (shape-over-join) — each checked against Spark's batch evaluation
    of the ORIGINAL text after every tick.  These passes compose
    recursively; composition bugs are where silent misreads live."""
    import random
    rng = random.Random(1234)
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ta (k BIGINT NOT NULL);
        CREATE TABLE tb (k BIGINT NOT NULL, x BIGINT);
        CREATE VIEW ek as
            SELECT a.k % 3 AS g, COUNT(*) AS n, SUM(b.x) AS sx
            FROM ta a JOIN tb b ON a.k = b.k GROUP BY a.k % 3;
        CREATE VIEW dj as
            SELECT x.k, x.n, y.m
            FROM (SELECT k, COUNT(*) AS n FROM ta GROUP BY k) x
            JOIN (SELECT k, SUM(x) AS m FROM tb GROUP BY k) y
                ON x.k = y.k;
        CREATE VIEW sj as
            SELECT a.k, MIN(b.x) AS mn, MAX(b.x) AS mx
            FROM ta a JOIN tb b ON a.k = b.k GROUP BY a.k;
    """)
    for v in ("ek", "dj", "sj"):
        assert eng.view_strategy(v) != "differentiate", v
    batches = {
        "ek": ("SELECT a.k % 3 AS g, COUNT(*) AS n, SUM(b.x) AS sx "
               "FROM ta a JOIN tb b ON a.k = b.k GROUP BY a.k % 3"),
        "dj": ("SELECT x.k, x.n, y.m FROM (SELECT k, COUNT(*) AS n "
               "FROM ta GROUP BY k) x JOIN (SELECT k, SUM(x) AS m "
               "FROM tb GROUP BY k) y ON x.k = y.k"),
        "sj": ("SELECT a.k, MIN(b.x) AS mn, MAX(b.x) AS mx "
               "FROM ta a JOIN tb b ON a.k = b.k GROUP BY a.k"),
    }
    schemas = {"ta": "k long", "tb": "k long, x long"}
    live = {"ta": [], "tb": []}

    def gen(tbl):
        if tbl == "ta":
            return (rng.randint(0, 5),)
        return (rng.randint(0, 5), rng.randint(-10, 30))

    for tick in range(6):
        for _ in range(rng.randint(1, 5)):
            tbl = rng.choice(["ta", "tb"])
            if live[tbl] and rng.random() < 0.4:
                row = live[tbl].pop(rng.randrange(len(live[tbl])))
                eng.push(tbl, spark.createDataFrame([row], schemas[tbl]),
                         weight=-1)
            else:
                row = gen(tbl)
                live[tbl].append(row)
                eng.push(tbl, spark.createDataFrame([row], schemas[tbl]))
        eng.step()
        for v, b in batches.items():
            want = sorted(map(tuple, spark.sql(b).collect()), key=str)
            got = sorted(map(tuple, eng.view(v).collect()), key=str)
            assert got == want, (tick, v, got, want)


@pytest.mark.slow
def test_recursive_lifts_randomized_tick_equivalence(spark):
    """r9 verdict ask #5, recursion half: seeded-random edge
    insert/retract sequences through BOTH the linear and the
    non-linear (doubling) recursive lifts, checked against a Python
    closure of the live edge set after every tick — the DRed and
    occurrence-variant paths get exercised by whatever mix the seed
    produces."""
    import random
    rng = random.Random(4321)
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW lin as
            WITH RECURSIVE p AS (
                SELECT src, dst FROM ed
                UNION
                SELECT p.src, e.dst FROM p JOIN ed e ON p.dst = e.src)
            SELECT src, dst FROM p;
        CREATE VIEW dbl as
            WITH RECURSIVE p AS (
                SELECT src, dst FROM ed
                UNION
                SELECT a.src, b.dst FROM p a JOIN p b ON a.dst = b.src)
            SELECT src, dst FROM p;
    """)
    assert eng.view_strategy("__lin_rec") == "recursive"
    assert eng.view_strategy("__dbl_rec") == "recursive"
    live: list = []
    for tick in range(6):
        for _ in range(rng.randint(1, 4)):
            if live and rng.random() < 0.35:
                row = live.pop(rng.randrange(len(live)))
                eng.push("ed", spark.createDataFrame(
                    [row], "src long, dst long"), weight=-1)
            else:
                row = (rng.randint(0, 7), rng.randint(0, 7))
                live.append(row)
                eng.push("ed", spark.createDataFrame(
                    [row], "src long, dst long"))
        eng.step()
        want = sorted(_py_closure(set(live)))
        for v in ("lin", "dbl"):
            got = sorted(map(tuple, eng.view(v).collect()))
            assert got == want, (tick, v, got, want)


@pytest.mark.slow
def test_stratified_negation_randomized_tick_equivalence(spark):
    """Seeded random walk for the r12 stratified-negation maintainer:
    edge AND blocked-set inserts/deletes mixed freely per tick (so the
    forced-recompute, semi-naive, DRed, and mixed regimes all get
    exercised by whatever the seed produces), each tick checked
    against a Python guarded closure of the live state."""
    import random
    rng = random.Random(8712)
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE TABLE blocked (k BIGINT NOT NULL);
        CREATE VIEW reach AS
            WITH RECURSIVE p AS (
                SELECT src, dst FROM ed
                UNION
                SELECT p.src, e.dst FROM p JOIN ed e ON p.dst = e.src
                WHERE NOT EXISTS (SELECT 1 FROM blocked b
                                  WHERE b.k = e.dst))
            SELECT src, dst FROM p;
    """)
    assert eng._maintainers["__reach_rec"]._sq_inputs == {"blocked"}

    def guarded_closure(edges, blocked):
        paths = set(edges)
        while True:
            new = {(s, d2) for (s, d) in paths for (d1, d2) in edges
                   if d == d1 and d2 not in blocked} - paths
            if not new:
                return paths
            paths |= new

    live_e: list = []
    live_b: list = []
    for tick in range(6):
        for _ in range(rng.randint(1, 4)):
            r = rng.random()
            if live_e and r < 0.3:
                row = live_e.pop(rng.randrange(len(live_e)))
                eng.push("ed", spark.createDataFrame(
                    [row], "src long, dst long"), weight=-1)
            elif r < 0.55 and live_b:
                k = live_b.pop(rng.randrange(len(live_b)))
                eng.push("blocked", spark.createDataFrame(
                    [(k,)], "k long"), weight=-1)
            elif r < 0.75:
                k = rng.randint(0, 7)
                live_b.append(k)
                eng.push("blocked", spark.createDataFrame(
                    [(k,)], "k long"))
            else:
                row = (rng.randint(0, 7), rng.randint(0, 7))
                live_e.append(row)
                eng.push("ed", spark.createDataFrame(
                    [row], "src long, dst long"))
        eng.step()
        want = sorted(guarded_closure(set(live_e), set(live_b)))
        got = sorted(map(tuple, eng.view("reach").collect()))
        assert got == want, (tick, got, want, live_e, live_b)


@pytest.mark.slow
def test_quant_scalars_randomized_tick_equivalence(spark):
    """r11 verdict ask #3 (quantifier half): a seeded random
    insert/delete walk over the inner value multiset and the outer —
    deletes crossing the current extreme, NULL injections, and
    empty↔non-empty flips — through all four scalar-routed quantifier
    ops at once (> ALL, < ANY, = ALL, <> ANY), each tick checked
    against DuckDB's native quantifiers on the live data.  This is the
    reference's proptest idiom (SURVEY §5.3) over
    _QuantScalarMaintainer's regime machinery."""
    import duckdb
    import random
    rng = random.Random(20260816)
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE o (k BIGINT NOT NULL, x DOUBLE);
        CREATE TABLE i1 (v DOUBLE);
        CREATE VIEW gall as SELECT k, x FROM o
            WHERE x > ALL (SELECT v FROM i1);
        CREATE VIEW lany as SELECT k, x FROM o
            WHERE x < ANY (SELECT v FROM i1);
        CREATE VIEW eall as SELECT k, x FROM o
            WHERE x = ALL (SELECT v FROM i1);
        CREATE VIEW nany as SELECT k, x FROM o
            WHERE x <> ANY (SELECT v FROM i1);
    """)
    for v in ("gall", "lany", "eall", "nany"):
        assert eng.view_strategy(v) == "join", v
        assert eng.view_strategy(f"__{v}_qs") == "quant_scalars", v
    con = duckdb.connect()
    O, I = [], []
    dom = [None, 5.0, 11.0, 12.0, 20.0, 30.0]
    kseq = iter(range(10_000))
    for tick in range(8):
        for _ in range(rng.randint(1, 4)):
            side = rng.random()
            if side < 0.5:
                if I and rng.random() < 0.45:
                    row = I.pop(rng.randrange(len(I)))
                    eng.push("i1", spark.createDataFrame(
                        [row], "v double"), weight=-1)
                else:
                    row = (rng.choice(dom),)
                    I.append(row)
                    eng.push("i1", spark.createDataFrame(
                        [row], "v double"))
            else:
                if O and rng.random() < 0.3:
                    row = O.pop(rng.randrange(len(O)))
                    eng.push("o", spark.createDataFrame(
                        [row], "k long, x double"), weight=-1)
                else:
                    row = (next(kseq), rng.choice(dom))
                    O.append(row)
                    eng.push("o", spark.createDataFrame(
                        [row], "k long, x double"))
        eng.step()
        con.execute("DROP TABLE IF EXISTS o; DROP TABLE IF EXISTS i1")
        con.execute("CREATE TABLE o(k BIGINT, x DOUBLE);"
                    "CREATE TABLE i1(v DOUBLE)")
        for r in O:
            con.execute("INSERT INTO o VALUES (?,?)", r)
        for r in I:
            con.execute("INSERT INTO i1 VALUES (?)", r)
        for view, op in [("gall", "> ALL"), ("lany", "< ANY"),
                         ("eall", "= ALL"), ("nany", "<> ANY")]:
            want = sorted(map(tuple, con.execute(
                f"SELECT k, x FROM o WHERE x {op} "
                "(SELECT v FROM i1)").fetchall()), key=str)
            got = sorted(map(tuple, eng.view(view).collect()), key=str)
            assert got == want, (tick, view, got, want, O, I)


@pytest.mark.slow
def test_bag_fixpoint_randomized_tick_equivalence(spark):
    """r11 verdict ask #3 (bag half): seeded random acyclic multigraphs
    with DUPLICATE edge/seed multiplicities and delete ticks, through
    all three bag fixpoints at once — linear single-input
    (ZSetBagFixpointOp), the two-hop spliced repeated-atom step, and
    the MUTUAL vector bag (VectorBagFixpointOp) — each tick checked
    against DuckDB's native UNION ALL recursion (the mutual pair via
    the parity-tagged single-recursion encoding).  Edges only go
    low→high node id, so derivations stay finite at every tick."""
    import duckdb
    import random
    rng = random.Random(97)
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE seeds (k BIGINT NOT NULL);
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW paths as
            WITH RECURSIVE p AS (
                SELECT s.k AS src, s.k AS dst FROM seeds s
                UNION ALL
                SELECT x.src, e.dst FROM p x JOIN ed e ON x.dst = e.src)
            SELECT src, dst, COUNT(*) AS n FROM p GROUP BY src, dst;
        CREATE VIEW paths2 as
            WITH RECURSIVE p AS (
                SELECT s.k AS src, s.k AS dst FROM seeds s
                UNION ALL
                SELECT x.src, f.dst FROM p x
                    JOIN ed e ON x.dst = e.src
                    JOIN ed f ON e.dst = f.src)
            SELECT src, dst, COUNT(*) AS n FROM p GROUP BY src, dst;
        CREATE VIEW evens as
            WITH RECURSIVE ev AS (
                SELECT s.k AS k FROM seeds s
                UNION ALL
                SELECT e.dst AS k FROM od o JOIN ed e ON o.k = e.src),
            od AS (
                SELECT e.dst AS k FROM ev v JOIN ed e ON v.k = e.src)
            SELECT k, COUNT(*) AS n FROM ev GROUP BY k;
    """)
    assert eng.view_strategy("__paths_rec") == "recursive_bag"
    assert eng.view_strategy("__paths2_rec") == "recursive_bag"
    assert eng.view_strategy("__evens_rec_ev") == "recursive_bag_mutual"
    con = duckdb.connect()
    S, E = [], []
    oracle = {
        "paths": """WITH RECURSIVE p AS (
              SELECT k AS src, k AS dst FROM seeds
              UNION ALL
              SELECT x.src, e.dst FROM p x JOIN ed e ON x.dst = e.src)
            SELECT src, dst, COUNT(*) AS n FROM p GROUP BY src, dst""",
        "paths2": """WITH RECURSIVE p AS (
              SELECT k AS src, k AS dst FROM seeds
              UNION ALL
              SELECT x.src, f.dst FROM p x
                  JOIN ed e ON x.dst = e.src
                  JOIN ed f ON e.dst = f.src)
            SELECT src, dst, COUNT(*) AS n FROM p GROUP BY src, dst""",
        "evens": """WITH RECURSIVE r AS (
              SELECT k, 0 AS par FROM seeds
              UNION ALL
              SELECT e.dst, 1 - r.par FROM r JOIN ed e ON r.k = e.src)
            SELECT k, COUNT(*) AS n FROM r WHERE par = 0 GROUP BY k""",
    }
    for tick in range(6):
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.35:
                if E and rng.random() < 0.6:
                    row = E.pop(rng.randrange(len(E)))
                    eng.push("ed", spark.createDataFrame(
                        [row], "src long, dst long"), weight=-1)
                elif S:
                    row = S.pop(rng.randrange(len(S)))
                    eng.push("seeds", spark.createDataFrame(
                        [row], "k long"), weight=-1)
            elif rng.random() < 0.7:
                a = rng.randint(0, 5)
                row = (a, rng.randint(a + 1, 6))    # DAG: low → high
                E.append(row)
                eng.push("ed", spark.createDataFrame(
                    [row], "src long, dst long"))
            else:
                row = (rng.randint(0, 4),)
                S.append(row)
                eng.push("seeds", spark.createDataFrame(
                    [row], "k long"))
        eng.step()
        con.execute("DROP TABLE IF EXISTS seeds; DROP TABLE IF EXISTS ed")
        con.execute("CREATE TABLE seeds(k BIGINT);"
                    "CREATE TABLE ed(src BIGINT, dst BIGINT)")
        for r in S:
            con.execute("INSERT INTO seeds VALUES (?)", r)
        for r in E:
            con.execute("INSERT INTO ed VALUES (?,?)", r)
        for view, sql in oracle.items():
            want = sorted(map(tuple, con.execute(sql).fetchall()))
            got = sorted(map(tuple, eng.view(view).collect()))
            assert got == want, (tick, view, got, want, S, E)


@pytest.mark.slow
def test_quantified_correlated(spark):
    """CORRELATED quantified comparisons — ``v > ALL (SELECT x FROM s
    WHERE s.k = t.k)`` — lower as a hidden per-key grouped scalars view
    (nonlinear agg) LEFT JOINed on the correlation key; an absent group
    is the empty set (ALL holds, ANY fails), NULL elements block ALL,
    and a NULL outer key correlates to nothing."""
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k BIGINT, v BIGINT);
        CREATE TABLE s (k BIGINT, x BIGINT);
        CREATE VIEW v_call as
            SELECT k, v FROM t
            WHERE v > ALL (SELECT x FROM s WHERE s.k = t.k);
        CREATE VIEW v_cany as
            SELECT k, v FROM t
            WHERE v <= ANY (SELECT x FROM s WHERE s.k = t.k);
        CREATE VIEW v_cneq as
            SELECT k, v FROM t
            WHERE v <> ANY (SELECT x FROM s WHERE s.k = t.k);
    """)
    assert eng.view_strategy("__v_call_qs") == "nonlinear_agg"
    assert eng.view_strategy("v_call") == "left_join"

    def oracle(rows, s_rows):
        v_all, v_any, v_neq = [], [], []
        for k, v in rows:
            S = [] if k is None else [x for sk, x in s_rows
                                      if sk == k and sk is not None]
            nn = [x for x in S if x is not None]
            has_null = any(x is None for x in S)
            if not S or (v is not None and not has_null
                         and v > max(nn)):
                v_all.append((k, v))
            if v is not None and nn and v <= max(nn):
                v_any.append((k, v))
            if v is not None and any(x != v for x in nn):
                v_neq.append((k, v))
        return v_all, v_any, v_neq

    def check(rows, s_rows, tag):
        for vn, want in zip(("v_call", "v_cany", "v_cneq"),
                            oracle(rows, s_rows)):
            got = sorted(map(tuple, eng.view(vn).collect()), key=str)
            assert got == sorted(want, key=str), (tag, vn, got, want)

    rows = [(1, 5), (1, 50), (2, 7), (2, None), (None, 9), (3, 4)]
    s1 = [(1, 10), (1, 40), (2, 7), (4, 99)]
    eng.push("t", spark.createDataFrame(rows, "k long, v long"))
    eng.push("s", spark.createDataFrame(s1, "k long, x long"))
    eng.step()
    check(rows, s1, "insert: key 3 has no group -> ALL")
    # retract key 1's max (touched-group recompute) -> 50 still above
    eng.push("s", spark.createDataFrame([(1, 40)], "k long, x long"),
             weight=-1)
    eng.step()
    s2 = [(1, 10), (2, 7), (4, 99)]
    check(rows, s2, "extreme retracted for key 1")
    # NULL element lands in key 2's group: ALL blocked there
    s3 = s2 + [(2, None)]
    eng.push("s", spark.createDataFrame([(2, None)], "k long, x long"))
    eng.step()
    check(rows, s3, "NULL element in key 2")
    # drain key 1's group entirely: its rows flip back to ALL
    eng.push("s", spark.createDataFrame([(1, 10)], "k long, x long"),
             weight=-1)
    eng.step()
    check(rows, [(2, 7), (2, None), (4, 99)], "key 1 group drained")
    # outer-only tick
    eng.push("t", spark.createDataFrame([(2, 100)], "k long, v long"))
    eng.step()
    check(rows + [(2, 100)], [(2, 7), (2, None), (4, 99)],
          "outer delta")

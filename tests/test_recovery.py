"""State recovery (reference persistent traces, src/trace/persistent/
mod.rs:2-89: reopen storage-backed state and continue stepping) and the
small source/utility operators (inspect.rs:36, communication/gather.rs:41,
generator.rs, input.rs:49)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from database_stream_processor_spark.plans.incremental import (
    DistinctOp,
    LinearAggregateOp,
)
from database_stream_processor_spark.sources.handles import (
    Generator,
    StreamInput,
)
from database_stream_processor_spark.zset import WEIGHT_COL, ZSetFrame
from tests.conftest import zset_to_dict


def _z(spark, rows):
    return ZSetFrame(spark.createDataFrame(
        rows, f"k string, x long, {WEIGHT_COL} long"))


BATCHES = [
    [("a", 1, 1), ("b", 2, 1)],
    [("a", 3, 1), ("b", 2, -1)],
    [("c", 5, 1), ("a", 1, -1)],
]


def test_linear_agg_state_recovers_in_fresh_session(spark, tmp_path):
    aggs = {"s": F.col("x"), "n": F.lit(1)}
    empty = _z(spark, [])

    # uninterrupted run over all 3 batches
    ref = LinearAggregateOp(empty, ["k"], aggs)
    for rows in BATCHES:
        ref_out3 = ref.step(_z(spark, rows))

    # interrupted run: steps 1-2 persist to parquet, then the operator is
    # rebuilt in a fresh session with recover=True and continues at step 3
    path = str(tmp_path / "st")
    op_a = LinearAggregateOp(empty, ["k"], aggs, path=path)
    for rows in BATCHES[:2]:
        op_a.step(_z(spark, rows))
    del op_a

    fresh = spark.newSession()
    empty_b = _z(fresh, [])
    op_b = LinearAggregateOp(empty_b, ["k"], aggs, path=path, recover=True)
    out3 = op_b.step(_z(fresh, BATCHES[2]))

    assert zset_to_dict(out3) == zset_to_dict(ref_out3)
    assert zset_to_dict(op_b.current_output.consolidate()) == \
        zset_to_dict(ref.current_output.consolidate())


def test_distinct_state_recovers(spark, tmp_path):
    path = str(tmp_path / "st")
    empty = _z(spark, [])
    ref = DistinctOp(empty, consolidate_every=1)
    op_a = DistinctOp(empty, path=path, consolidate_every=1)
    for rows in BATCHES[:2]:
        ref.step(_z(spark, rows))
        op_a.step(_z(spark, rows))
    del op_a
    op_b = DistinctOp(_z(spark.newSession(), []), path=path,
                      consolidate_every=1, recover=True)
    assert zset_to_dict(op_b.step(_z(spark, BATCHES[2]))) == \
        zset_to_dict(ref.step(_z(spark, BATCHES[2])))


def test_parquet_state_epochs_are_garbage_collected(spark, tmp_path):
    """Only the current and previous epoch may remain on disk (the
    previous must survive one step for readers holding the old snapshot);
    anything older is removed — unbounded epoch growth was a round-1
    defect."""
    import os

    from database_stream_processor_spark.plans.incremental import StateTable
    st = StateTable(_z(spark, []), name="t", path=str(tmp_path))
    for rows in BATCHES * 2:
        st.update(_z(spark, rows))
    epochs = sorted(int(d.split("=")[1]) for d in os.listdir(st.path)
                    if d.startswith("epoch="))
    assert epochs == [st._epoch - 1, st._epoch]
    # the surviving state is still readable and correct
    total = {}
    for rows in BATCHES * 2:
        for k, x, w in rows:
            total[(k, x)] = total.get((k, x), 0) + w
    want = {kv: w for kv, w in total.items() if w != 0}
    assert zset_to_dict(st.current.consolidate()) == want


def test_stream_input_drains_pushed_batches(spark):
    empty = spark.createDataFrame([], "k string, x long")
    h = StreamInput(empty)
    h.push(spark.createDataFrame([("a", 1)], "k string, x long"))
    h.push(spark.createDataFrame([("b", 2)], "k string, x long"))
    assert zset_to_dict(h.step()) == {("a", 1): 1, ("b", 2): 1}
    assert zset_to_dict(h.step()) == {}          # drained


def test_generator_emits_per_tick_batches(spark):
    gen = Generator(lambda t: spark.createDataFrame([(t, t * 10)],
                                                    "tick long, v long"))
    assert zset_to_dict(gen.step()) == {(0, 0): 1}
    assert zset_to_dict(gen.step()) == {(1, 10): 1}


def test_indexed_zset_input_shuffle_reused_by_keyed_agg(spark):
    """add_input_indexed_zset: hash-partitioning on the key is the index;
    a downstream groupBy on the same key must NOT add a second exchange."""
    from database_stream_processor_spark.sources.handles import (
        indexed_zset_input)
    df = spark.createDataFrame([(i % 5, i) for i in range(100)],
                               "k int, v int")
    z = indexed_zset_input(df, ["k"])
    agg = z.aggregate_linear(["k"], s=F.col("v"))
    phys = agg.df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange") == 1  # only the input repartition


def test_inspect_taps_and_gather_single_partition(spark):
    z = _z(spark, BATCHES[0])
    seen = []
    out = z.inspect(lambda df: seen.append(df.count()))
    assert seen == [2] and out is z
    assert z.gather().df.rdd.getNumPartitions() == 1
    assert zset_to_dict(z.gather()) == zset_to_dict(z)


@pytest.mark.slow
def test_sql_engine_durable_tables_and_view_bootstrap(spark, tmp_path):
    """Durable SQL Engine (the reference's pipeline suspend/resume):
    table state persists to parquet under ``state_path``; a fresh Engine
    with ``recover=True`` reopens the tables and re-seeds every view
    maintainer with one bootstrap tick, after which stepping continues
    incrementally and matches batch recompute."""
    from database_stream_processor_spark.sql import Engine

    ddl = """
        CREATE TABLE cust (ck INTEGER NOT NULL, name VARCHAR);
        CREATE TABLE ord (ok INTEGER NOT NULL, ck INTEGER, amt FLOAT64);
        CREATE VIEW spend as
            SELECT c.name, SUM(o.amt) AS total
            FROM ord o JOIN cust c ON o.ck = c.ck GROUP BY c.name;
        CREATE VIEW enr as
            SELECT c.name, o.ok FROM cust c LEFT JOIN ord o ON c.ck = o.ck;
    """
    path = str(tmp_path / "eng_state")
    mkc = lambda rows: spark.createDataFrame(rows, "ck int, name string")
    mko = lambda rows: spark.createDataFrame(rows, "ok int, ck int, amt double")

    eng = Engine(spark, state_path=path)
    eng.execute(ddl)
    eng.push("cust", mkc([(1, "ann"), (2, "bob")]))
    eng.push("ord", mko([(10, 1, 5.0), (11, 2, 7.0)]))
    eng.step()
    eng.push("ord", mko([(12, 1, 3.0)]))
    eng.step()
    want_spend = sorted(tuple(r) for r in eng.view("spend").collect())
    want_enr = sorted(tuple(r) for r in eng.view("enr").collect())

    # "restart": fresh Engine over the same path
    eng2 = Engine(spark, state_path=path, recover=True)
    eng2.execute(ddl)
    assert sorted(tuple(r) for r in eng2.view("spend").collect()) == want_spend
    assert sorted(tuple(r) for r in eng2.view("enr").collect()) == want_enr

    # stepping continues incrementally post-recovery (incl. a retraction)
    eng2.push("ord", mko([(11, 2, 7.0)]), weight=-1)
    eng2.push("cust", mkc([(3, "cyd")]))
    eng2.step()
    want2 = sorted(tuple(r) for r in spark.sql("""
        SELECT c.name, SUM(o.amt) AS total
        FROM ord o JOIN cust c ON o.ck = c.ck GROUP BY c.name""").collect())
    got2 = sorted(tuple(r) for r in eng2.view("spend").collect())
    assert got2 == want2
    want3 = sorted(tuple(r) for r in spark.sql("""
        SELECT c.name, o.ok FROM cust c LEFT JOIN ord o ON c.ck = o.ck
        """).collect())
    assert sorted(tuple(r) for r in eng2.view("enr").collect()) == want3


def test_view_added_after_recovery_seeds_from_recovered_upstream(
        spark, tmp_path):
    """A view created in a LATER execute() on a recovered engine, reading
    an already-bootstrapped upstream VIEW, must seed with the upstream's
    full recovered state (not an empty delta) — the multi-execute DDL
    recovery path."""
    from database_stream_processor_spark.sql import Engine

    ddl = """
        CREATE TABLE ord (ok INTEGER NOT NULL, ck INTEGER, amt FLOAT64);
        CREATE VIEW spend AS
            SELECT ck, SUM(amt) AS total FROM ord GROUP BY ck;
    """
    path = str(tmp_path / "eng_state")
    mko = lambda rows: spark.createDataFrame(rows, "ok int, ck int, amt double")

    eng = Engine(spark, state_path=path)
    eng.execute(ddl)
    eng.push("ord", mko([(10, 1, 5.0), (11, 2, 7.0), (12, 1, 3.0)]))
    eng.step()
    del eng

    eng2 = Engine(spark, state_path=path, recover=True)
    eng2.execute(ddl)                       # bootstraps `spend`
    # late DDL: a lowered view over the maintained view `spend`
    eng2.execute("CREATE VIEW big AS "
                 "SELECT ck, total FROM spend WHERE total > 6.0;")
    got = sorted(tuple(r) for r in eng2.view("big").collect())
    assert got == [(1, 8.0), (2, 7.0)]
    # and it keeps maintaining incrementally afterwards
    eng2.push("ord", mko([(13, 3, 9.5), (11, 2, 7.0)]))
    eng2.push("ord", mko([(11, 2, 7.0)]), weight=-1)
    eng2.step()
    got2 = sorted(tuple(r) for r in eng2.view("big").collect())
    assert got2 == [(1, 8.0), (2, 7.0), (3, 9.5)]


def test_rolling_view_recovers_via_bootstrap(spark, tmp_path):
    """A rolling-window view on a durable engine re-seeds through the
    generic bootstrap tick (full table replayed as one insert delta
    through the chained rolling ops) and keeps maintaining incrementally
    afterwards."""
    from database_stream_processor_spark.sql import Engine

    ddl = """
        CREATE TABLE tx (cc INTEGER NOT NULL, amt FLOAT64,
                         ut INTEGER NOT NULL);
        CREATE VIEW feat AS
            SELECT cc, amt, ut,
                SUM(amt) OVER (PARTITION BY cc ORDER BY ut
                    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS s10
            FROM tx;
    """
    path = str(tmp_path / "eng_state")
    mk = lambda rows: spark.createDataFrame(rows, "cc int, amt double, ut int")
    rows = [(i % 2, float(i + 1), 100 * i) for i in range(12)]

    eng = Engine(spark, state_path=path)
    eng.execute(ddl)
    eng.push("tx", mk(rows[:8]))
    eng.step()
    del eng

    eng2 = Engine(spark, state_path=path, recover=True)
    eng2.execute(ddl)
    assert eng2.view_strategy("feat") == "rolling"
    batch = """SELECT cc, amt, ut,
        SUM(amt) OVER (PARTITION BY cc ORDER BY ut
            RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS s10 FROM tx"""
    cmp_ = lambda: (
        sorted((tuple(round(v, 6) if isinstance(v, float) else v
                      for v in r) for r in eng2.view("feat").collect()),
               key=str)
        == sorted((tuple(round(v, 6) if isinstance(v, float) else v
                         for v in r) for r in spark.sql(batch).collect()),
                  key=str))
    assert cmp_()
    eng2.push("tx", mk(rows[8:]))
    eng2.push("tx", mk(rows[2:4]), weight=-1)
    eng2.step()
    assert cmp_()


@pytest.mark.slow
def test_filtered_join_agg_stack_recovers(spark, tmp_path):
    """The r8 subquery-filtered aggregate stack (hidden grouped in-view
    + filter + final agg — the TPC-H q18 shape) must survive
    suspend/resume like any flat view: the fresh Engine re-lowers the
    same DDL, the bootstrap tick re-seeds every HIDDEN stage from the
    recovered table state, and post-recovery deltas (including a
    retraction that drops a group under the HAVING bar) stay
    incremental and match batch recompute."""
    from database_stream_processor_spark.sql import Engine

    ddl = """
        CREATE TABLE orders (ok BIGINT NOT NULL, pr VARCHAR);
        CREATE TABLE li (lk BIGINT, qty BIGINT);
        CREATE VIEW v as
            SELECT pr, COUNT(*) AS n FROM orders
            WHERE ok IN (SELECT lk FROM li
                         GROUP BY lk HAVING SUM(qty) > 10)
            GROUP BY pr;
    """
    path = str(tmp_path / "eng_state")
    O, L = "ok long, pr string", "lk long, qty long"

    eng = Engine(spark, state_path=path)
    eng.execute(ddl)
    eng.push("orders", spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], O))
    eng.push("li", spark.createDataFrame(
        [(1, 8), (1, 5), (2, 3), (3, 20)], L))
    eng.step()
    want = sorted(tuple(r) for r in eng.view("v").collect())
    assert want == [("a", 1), ("b", 1)]

    eng2 = Engine(spark, state_path=path, recover=True)
    eng2.execute(ddl)
    assert eng2.view_strategy("v") == "linear_agg"
    assert sorted(tuple(r) for r in eng2.view("v").collect()) == want
    # post-recovery retraction: order 1 falls under the HAVING bar
    eng2.push("li", spark.createDataFrame([(1, 5)], L), weight=-1)
    eng2.step()
    got = sorted(tuple(r) for r in eng2.view("v").collect())
    assert got == [("b", 1)], got


def test_expr_key_agg_stack_recovers(spark, tmp_path):
    """The r9 expression-GROUP-BY stack (hidden __v_ek projection view
    materializing the key expression + linear agg) must survive
    suspend/resume: the fresh Engine re-lowers the same DDL, the
    bootstrap re-seeds the hidden projection from recovered tables,
    and a post-recovery retraction that empties a bucket stays
    incremental and matches batch recompute."""
    from database_stream_processor_spark.sql import Engine

    ddl = """
        CREATE TABLE ev (eid BIGINT NOT NULL, ut BIGINT NOT NULL,
                         v BIGINT);
        CREATE VIEW tw as
            select ut - ut % 100 as ws, count(*) as n, sum(v) as s
            from ev group by ut - ut % 100;
    """
    path = str(tmp_path / "eng_state")
    E = "eid long, ut long, v long"

    eng = Engine(spark, state_path=path)
    eng.execute(ddl)
    eng.push("ev", spark.createDataFrame(
        [(1, 10, 5), (2, 50, 7), (3, 130, 2), (4, 260, 9)], E))
    eng.step()
    want = sorted(tuple(r) for r in eng.view("tw").collect())
    assert want == [(0, 2, 12), (100, 1, 2), (200, 1, 9)]

    eng2 = Engine(spark, state_path=path, recover=True)
    eng2.execute(ddl)
    assert eng2.view_strategy("tw") == "linear_agg"
    assert eng2.view_strategy("__tw_ek") == "project"
    assert sorted(tuple(r) for r in eng2.view("tw").collect()) == want
    # post-recovery: retract the only row of the 100-bucket — the group
    # must vanish, and a new insert lands in a fresh bucket
    eng2.push("ev", spark.createDataFrame([(3, 130, 2)], E), weight=-1)
    eng2.push("ev", spark.createDataFrame([(5, 310, 4)], E))
    eng2.step()
    got = sorted(tuple(r) for r in eng2.view("tw").collect())
    assert got == [(0, 2, 12), (200, 1, 9), (300, 1, 4)], got


@pytest.mark.slow
def test_recursive_cte_view_survives_suspend_resume(spark, tmp_path):
    """Engine suspend/resume under a WITH RECURSIVE view: tables persist
    to parquet, a fresh engine with recover=True bootstraps the hidden
    fixpoint maintainer by replaying the recovered snapshot (one batch
    recompute), and subsequent insert AND retraction ticks continue to
    maintain the closure exactly."""
    from database_stream_processor_spark.sql import Engine

    ddl = """
        CREATE TABLE edges (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW reach AS
            with recursive paths as (
                select src, dst from edges
                union
                select p.src, e.dst from paths p join edges e
                    on p.dst = e.src)
            select src, dst from paths;
    """

    def closure(live):
        paths = set(live)
        while True:
            new = {(s, d2) for (s, d) in paths
                   for (d1, d2) in live if d == d1} - paths
            if not new:
                return paths
            paths |= new

    path = str(tmp_path / "rec_state")
    eng = Engine(spark, state_path=path)
    eng.execute(ddl)
    e1 = [(1, 2), (2, 3), (6, 1)]
    eng.push("edges", spark.createDataFrame(e1, "src long, dst long"))
    eng.step()
    assert sorted(map(tuple, eng.view("reach").collect())) == \
        sorted(closure(set(e1)))
    del eng

    eng2 = Engine(spark, state_path=path, recover=True)
    eng2.execute(ddl)
    assert eng2.view_strategy("__reach_rec") == "recursive"
    # bootstrap replayed the snapshot; resumed state = closure(e1)
    assert sorted(map(tuple, eng2.view("reach").collect())) == \
        sorted(closure(set(e1)))
    e2 = [(3, 4)]
    eng2.push("edges", spark.createDataFrame(e2, "src long, dst long"))
    eng2.step()
    assert sorted(map(tuple, eng2.view("reach").collect())) == \
        sorted(closure(set(e1) | set(e2)))
    eng2.push("edges", spark.createDataFrame([(2, 3)], "src long, dst long"),
              weight=-1)
    eng2.step()
    assert sorted(map(tuple, eng2.view("reach").collect())) == \
        sorted(closure((set(e1) | set(e2)) - {(2, 3)}))


@pytest.mark.slow
def test_bag_recursive_view_survives_suspend_resume(spark, tmp_path):
    """Suspend/resume under a UNION ALL (bag) recursion: the bootstrap
    tick replays the recovered edge snapshot as one insert delta through
    the Z-set bag fixpoint, and later insert AND retraction ticks keep
    multiplicities (derivation-path counts) exact."""
    from collections import Counter

    from database_stream_processor_spark.sql import Engine

    ddl = """
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW pc AS
            with recursive p as (
                select src, dst from ed
                union all
                select x.src, e.dst from p x join ed e on x.dst = e.src)
            select src, dst, count(*) as n from p group by src, dst;
    """

    def bag(live):
        ew = Counter(live)
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
        return sorted((s, d, n) for (s, d), n in acc.items())

    path = str(tmp_path / "bag_state")
    eng = Engine(spark, state_path=path)
    eng.execute(ddl)
    e1 = [(1, 2), (1, 3), (2, 4), (3, 4)]
    eng.push("ed", spark.createDataFrame(e1, "src long, dst long"))
    eng.step()
    assert sorted(map(tuple, eng.view("pc").collect())) == bag(e1)
    del eng

    eng2 = Engine(spark, state_path=path, recover=True)
    eng2.execute(ddl)
    assert eng2.view_strategy("__pc_rec") == "recursive_bag"
    assert sorted(map(tuple, eng2.view("pc").collect())) == bag(e1)
    eng2.push("ed", spark.createDataFrame([(4, 5)], "src long, dst long"))
    eng2.step()
    assert sorted(map(tuple, eng2.view("pc").collect())) == \
        bag(e1 + [(4, 5)])
    eng2.push("ed", spark.createDataFrame([(1, 2)], "src long, dst long"),
              weight=-1)
    eng2.step()
    assert sorted(map(tuple, eng2.view("pc").collect())) == \
        bag([(1, 3), (2, 4), (3, 4), (4, 5)])


@pytest.mark.slow
def test_mutual_recursive_view_survives_suspend_resume(spark, tmp_path):
    """Suspend/resume under MUTUAL recursion: the bootstrap tick replays
    the recovered table snapshots as one insert delta through the vector
    fixpoint (primary + satellite both re-seed), and later inserts and a
    DRed retraction stay exact in both members."""
    from database_stream_processor_spark.sql import Engine

    ddl = """
        CREATE TABLE seeds (k BIGINT NOT NULL);
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW parity AS
            WITH RECURSIVE ev AS (
                SELECT k FROM seeds
                UNION
                SELECT e.dst AS k FROM od o JOIN ed e ON o.k = e.src),
            od AS (
                SELECT e.dst AS k FROM ev v JOIN ed e ON v.k = e.src)
            SELECT k, 'even' AS par FROM ev
            UNION
            SELECT k, 'odd' AS par FROM od;
    """

    def evenodd(seeds, edges):
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
        return sorted([(k, "even") for k in ev]
                      + [(k, "odd") for k in od])

    path = str(tmp_path / "mutual_state")
    eng = Engine(spark, state_path=path)
    eng.execute(ddl)
    seeds, chain = [0], [(i, i + 1) for i in range(4)]
    eng.push("seeds", spark.createDataFrame([(k,) for k in seeds],
                                            "k long"))
    eng.push("ed", spark.createDataFrame(chain, "src long, dst long"))
    eng.step()
    assert sorted(map(tuple, eng.view("parity").collect())) == \
        evenodd(seeds, chain)
    del eng

    eng2 = Engine(spark, state_path=path, recover=True)
    eng2.execute(ddl)
    assert eng2.view_strategy("__parity_rec_ev") == "recursive_mutual"
    assert eng2.view_strategy("__parity_rec_od") == "recursive_mutual"
    assert sorted(map(tuple, eng2.view("parity").collect())) == \
        evenodd(seeds, chain)
    eng2.push("ed", spark.createDataFrame([(4, 5)], "src long, dst long"))
    eng2.step()
    assert sorted(map(tuple, eng2.view("parity").collect())) == \
        evenodd(seeds, chain + [(4, 5)])
    eng2.push("ed", spark.createDataFrame([(2, 3)], "src long, dst long"),
              weight=-1)
    eng2.step()
    assert sorted(map(tuple, eng2.view("parity").collect())) == \
        evenodd(seeds, [(0, 1), (1, 2), (3, 4), (4, 5)])


def test_single_col_not_in_counters_survive_suspend_resume(
        spark, tmp_path):
    """Regression (found r11): the nullable NOT IN maintainer counts
    the recovered inner at construction AND the bootstrap tick replayed
    the same snapshot as an insert delta — n_inner doubled, so a later
    inner drain left the regime stuck at B1 (wrongly excluding NULL
    outer keys instead of the B2 everyone-qualifies rule)."""
    from database_stream_processor_spark.sql import Engine

    ddl = """
        CREATE TABLE t (k BIGINT NOT NULL, v BIGINT);
        CREATE TABLE s (x BIGINT);
        CREATE VIEW f AS
            SELECT k, v FROM t WHERE v NOT IN (SELECT x FROM s);
    """
    path = str(tmp_path / "nn_state")
    eng = Engine(spark, state_path=path)
    eng.execute(ddl)
    eng.push("t", spark.createDataFrame([(1, 5), (2, 7), (3, None)],
                                        "k long, v long"))
    eng.push("s", spark.createDataFrame([(5,)], "x long"))
    eng.step()
    assert sorted(r[0] for r in eng.view("f").collect()) == [2]
    del eng

    eng2 = Engine(spark, state_path=path, recover=True)
    eng2.execute(ddl)
    m = eng2._maintainers["f"]
    assert m.kind == "not_in_nullable"
    assert m._n_inner == 1, m._n_inner
    assert sorted(r[0] for r in eng2.view("f").collect()) == [2]
    # drain the inner: B1→B2 — every row qualifies, INCLUDING the
    # NULL-key row the stuck-B1 regime wrongly excluded
    eng2.push("s", spark.createDataFrame([(5,)], "x long"), weight=-1)
    eng2.step()
    assert m._regime() == "B2", m._regime()
    assert sorted((r[0] for r in eng2.view("f").collect())) == [1, 2, 3]


def test_tuple_not_in_view_survives_suspend_resume(spark, tmp_path):
    """Suspend/resume under a nullable row-value NOT IN view: the tuple
    maintainer re-derives its regime counters from the recovered inner
    snapshot at construction, and post-resume ticks keep the
    three-valued semantics — including an all-NULL insert that empties
    the view and its retraction that refills it."""
    from database_stream_processor_spark.sql import Engine

    ddl = """
        CREATE TABLE o (a BIGINT, b BIGINT, v BIGINT NOT NULL);
        CREATE TABLE i1 (x BIGINT, y BIGINT);
        CREATE VIEW f AS
            SELECT a, b, v FROM o
            WHERE v > 0 AND (a, b) NOT IN (SELECT x, y FROM i1);
    """
    TO, TI = "a long, b long, v long", "x long, y long"
    path = str(tmp_path / "tnn_state")
    eng = Engine(spark, state_path=path)
    eng.execute(ddl)
    eng.push("o", spark.createDataFrame(
        [(1, 1, 5), (1, 2, 5), (None, 5, 5), (3, None, 5)], TO))
    eng.push("i1", spark.createDataFrame([(1, 2), (9, None)], TI))
    eng.step()
    keep = sorted(map(tuple, eng.view("f").collect()), key=str)
    assert (1, 1, 5) in keep and (1, 2, 5) not in keep
    del eng

    eng2 = Engine(spark, state_path=path, recover=True)
    eng2.execute(ddl)
    m = eng2._maintainers["f"]
    assert m.kind == "not_in_nullable_tuple"
    assert m._regime() == "B1" and m._n_inner == 2
    assert sorted(map(tuple, eng2.view("f").collect()), key=str) == keep
    # all-NULL inner row post-resume: the view empties …
    an = spark.createDataFrame([(None, None)], TI)
    eng2.push("i1", an)
    eng2.step()
    assert m._regime() == "A" and eng2.view("f").isEmpty()
    # … and its retraction refills it
    eng2.push("i1", an, weight=-1)
    eng2.step()
    assert m._regime() == "B1"
    assert sorted(map(tuple, eng2.view("f").collect()), key=str) == keep
    # membership retraction inside B1 un-blocks (1,2)
    eng2.push("i1", spark.createDataFrame([(1, 2)], TI), weight=-1)
    eng2.step()
    got = sorted(map(tuple, eng2.view("f").collect()), key=str)
    assert (1, 2, 5) in got


@pytest.mark.slow
def test_quantified_view_survives_suspend_resume(spark, tmp_path):
    """Suspend/resume under a quantified (> ALL) view: the hidden
    scalars maintainer rebuilds its counters from the recovered inner
    snapshot during bootstrap, and post-resume retractions of the
    extreme still flip the outer rows correctly."""
    from database_stream_processor_spark.sql import Engine

    ddl = """
        CREATE TABLE t (k BIGINT NOT NULL, v BIGINT);
        CREATE TABLE s (x BIGINT);
        CREATE VIEW v AS
            select k, v from t
            where v > ALL (select x from s);
    """
    path = str(tmp_path / "q_state")
    eng = Engine(spark, state_path=path)
    eng.execute(ddl)
    eng.push("t", spark.createDataFrame([(1, 5), (2, 50), (3, 20)],
                                        "k long, v long"))
    eng.push("s", spark.createDataFrame([(10,), (30,)], "x long"))
    eng.step()
    assert sorted(r[0] for r in eng.view("v").collect()) == [2]
    del eng

    eng2 = Engine(spark, state_path=path, recover=True)
    eng2.execute(ddl)
    assert eng2.view_strategy("__v_qs") == "quant_scalars"
    assert sorted(r[0] for r in eng2.view("v").collect()) == [2]
    # retract the max: threshold falls to 10, k=3 flips in
    eng2.push("s", spark.createDataFrame([(30,)], "x long"), weight=-1)
    eng2.step()
    assert sorted(r[0] for r in eng2.view("v").collect()) == [2, 3]
    # drain: ALL over the empty set keeps every row
    eng2.push("s", spark.createDataFrame([(10,)], "x long"), weight=-1)
    eng2.step()
    assert sorted(r[0] for r in eng2.view("v").collect()) == [1, 2, 3]


@pytest.mark.slow
def test_mutual_bag_recursive_view_survives_suspend_resume(
        spark, tmp_path):
    """Suspend/resume under MUTUAL UNION ALL recursion (r12): the
    bootstrap tick replays the recovered snapshots through the vector
    BAG fixpoint (primary + satellite both re-seed, multiplicities =
    derivation paths), and later inserts and a ring-cancellation
    retraction stay exact in both members."""
    from collections import Counter

    from database_stream_processor_spark.sql import Engine

    ddl = """
        CREATE TABLE seeds (k BIGINT NOT NULL);
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW evens AS
            WITH RECURSIVE ev AS (
                SELECT s.k AS k FROM seeds s
                UNION ALL
                SELECT e.dst AS k FROM od o JOIN ed e ON o.k = e.src),
            od AS (
                SELECT e.dst AS k FROM ev v JOIN ed e ON v.k = e.src)
            SELECT k, COUNT(*) AS n FROM ev GROUP BY k;
    """

    def evens(seeds, edges):
        sw, ew = Counter(seeds), Counter(edges)
        acc = Counter(sw)
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
                acc.update(f)
        return sorted((k, n) for k, n in acc.items() if n)

    path = str(tmp_path / "mbag_state")
    eng = Engine(spark, state_path=path)
    eng.execute(ddl)
    seeds, chain = [0, 0], [(i, i + 1) for i in range(4)]
    eng.push("seeds", spark.createDataFrame([(k,) for k in seeds],
                                            "k long"))
    eng.push("ed", spark.createDataFrame(chain, "src long, dst long"))
    eng.step()
    assert sorted(map(tuple, eng.view("evens").collect())) == \
        evens(seeds, chain)
    del eng

    eng2 = Engine(spark, state_path=path, recover=True)
    eng2.execute(ddl)
    assert eng2.view_strategy("__evens_rec_ev") == "recursive_bag_mutual"
    assert eng2.view_strategy("__evens_rec_od") == "recursive_bag_mutual"
    assert sorted(map(tuple, eng2.view("evens").collect())) == \
        evens(seeds, chain)
    eng2.push("ed", spark.createDataFrame([(4, 5)], "src long, dst long"))
    eng2.step()
    assert sorted(map(tuple, eng2.view("evens").collect())) == \
        evens(seeds, chain + [(4, 5)])
    eng2.push("seeds", spark.createDataFrame([(0,)], "k long"),
              weight=-1)
    eng2.push("ed", spark.createDataFrame([(1, 2)], "src long, dst long"),
              weight=-1)
    eng2.step()
    assert sorted(map(tuple, eng2.view("evens").collect())) == \
        evens([0], [(0, 1), (2, 3), (3, 4), (4, 5)])


@pytest.mark.slow
def test_disjoint_recursive_components_survive_suspend_resume(
        spark, tmp_path):
    """Suspend/resume with TWO disjoint recursive components (r12):
    each component's fixpoint re-seeds from the bootstrap replay
    independently; a post-resume retraction drives BOTH components'
    DRed in one tick."""
    from database_stream_processor_spark.sql import Engine

    ddl = """
        CREATE TABLE ed (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE TABLE ed2 (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE VIEW bridged AS
            WITH RECURSIVE p AS (
                SELECT src, dst FROM ed UNION
                SELECT p.src, e.dst FROM p JOIN ed e ON p.dst = e.src),
            q AS (
                SELECT src, dst FROM ed2 UNION
                SELECT q.src, e.dst FROM q JOIN ed2 e ON q.dst = e.src)
            SELECT p.src, q.dst FROM p JOIN q ON p.dst = q.src;
    """

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

    def bridged(e1, e2):
        p, q = closure(e1), closure(e2)
        return sorted({(a, d) for (a, b) in p for (c, d) in q
                       if b == c})

    path = str(tmp_path / "disjoint_state")
    eng = Engine(spark, state_path=path)
    eng.execute(ddl)
    e1, e2 = [(1, 2), (2, 3)], [(3, 4), (4, 5)]
    eng.push("ed", spark.createDataFrame(e1, "src long, dst long"))
    eng.push("ed2", spark.createDataFrame(e2, "src long, dst long"))
    eng.step()
    assert sorted(set(map(tuple, eng.view("bridged").collect()))) == \
        bridged(e1, e2)
    del eng

    eng2 = Engine(spark, state_path=path, recover=True)
    eng2.execute(ddl)
    assert eng2.view_strategy("__bridged_rec_p") == "recursive"
    assert eng2.view_strategy("__bridged_rec_q") == "recursive"
    assert sorted(set(map(tuple, eng2.view("bridged").collect()))) == \
        bridged(e1, e2)
    eng2.push("ed", spark.createDataFrame([(2, 3)], "src long, dst long"),
              weight=-1)
    eng2.push("ed2", spark.createDataFrame([(5, 6)], "src long, dst long"))
    eng2.step()
    assert sorted(set(map(tuple, eng2.view("bridged").collect()))) == \
        bridged([(1, 2)], e2 + [(5, 6)])


@pytest.mark.slow
def test_stratified_negation_view_survives_suspend_resume(
        spark, tmp_path):
    """Suspend/resume under the r12 stratified-negation recursion (a
    NOT EXISTS over a subquery-role input in the step): the bootstrap
    recomputes the guarded closure from the recovered snapshots, a
    blocked-set tick after resume forces recompute, and an edge
    retraction with blocked fixed runs DRed."""
    from database_stream_processor_spark.sql import Engine

    ddl = """
        CREATE TABLE edges (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        CREATE TABLE blocked (k BIGINT NOT NULL);
        CREATE VIEW reach AS
            with recursive p as (
                select src, dst from edges
                union
                select p.src, e.dst from p join edges e on p.dst = e.src
                where not exists (select 1 from blocked b
                                  where b.k = e.dst))
            select src, dst from p;
    """

    def guarded(live, blk):
        paths = set(live)
        while True:
            new = {(s, d2) for (s, d) in paths for (d1, d2) in live
                   if d == d1 and d2 not in blk} - paths
            if not new:
                return paths
            paths |= new

    path = str(tmp_path / "neg_state")
    eng = Engine(spark, state_path=path)
    eng.execute(ddl)
    e1 = [(1, 2), (2, 3), (3, 4)]
    eng.push("edges", spark.createDataFrame(e1, "src long, dst long"))
    eng.push("blocked", spark.createDataFrame([(4,)], "k long"))
    eng.step()
    assert sorted(map(tuple, eng.view("reach").collect())) == \
        sorted(guarded(set(e1), {4}))
    del eng

    eng2 = Engine(spark, state_path=path, recover=True)
    eng2.execute(ddl)
    m = eng2._maintainers["__reach_rec"]
    assert m._sq_inputs == {"blocked"}
    assert sorted(map(tuple, eng2.view("reach").collect())) == \
        sorted(guarded(set(e1), {4}))
    # blocked tick after resume: forced recompute against recovered
    # integrals
    eng2.push("blocked", spark.createDataFrame([(3,)], "k long"))
    eng2.step()
    assert m.last_stats["mode"] == "recompute", m.last_stats
    assert sorted(map(tuple, eng2.view("reach").collect())) == \
        sorted(guarded(set(e1), {3, 4}))
    # edge retraction with blocked fixed: DRed over recovered state
    eng2.push("edges", spark.createDataFrame([(1, 2)],
                                             "src long, dst long"),
              weight=-1)
    eng2.step()
    assert m.last_stats["mode"] == "dred", m.last_stats
    assert sorted(map(tuple, eng2.view("reach").collect())) == \
        sorted(guarded(set(e1) - {(1, 2)}, {3, 4}))

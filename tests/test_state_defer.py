"""Read-tracking state materialization (StateTable.defer_update):
a source table no maintainer re-reads schedules NO materialization job;
the first integral read folds every queued delta in ONE materialization;
pre-tick snapshots stay correct whichever order old/current are read in.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_stream_processor_spark.plans.incremental import StateTable
from database_stream_processor_spark.sql import Engine
from database_stream_processor_spark.zset import ZSetFrame
from tests.conftest import zset_to_dict


def _count_materializations(monkeypatch):
    calls = []
    orig = StateTable._materialize

    def patched(self, z):
        calls.append(self.name)
        return orig(self, z)

    monkeypatch.setattr(StateTable, "_materialize", patched)
    return calls


def test_unread_table_state_never_materializes(spark, monkeypatch):
    calls = _count_materializations(monkeypatch)
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE ev (k BIGINT, v DOUBLE);
        CREATE VIEW s AS SELECT k, SUM(v) AS sv FROM ev GROUP BY k;
    """)
    base = len([c for c in calls if c == "table_ev"])
    for i in range(3):
        eng.push("ev", spark.createDataFrame(
            [(i, float(i)), (i + 1, 2.0)], "k long, v double"))
        eng.step()
    # linear-agg maintenance reads only the delta: the table's integral
    # is never read, so its state must never materialize
    assert len([c for c in calls if c == "table_ev"]) == base
    got = zset_to_dict(ZSetFrame.from_df(eng.view("s")))
    assert got == {(0, 0.0): 1, (1, 3.0): 1, (2, 4.0): 1, (3, 2.0): 1}


def test_first_read_folds_all_queued_deltas_in_one_materialization(
        spark, monkeypatch):
    calls = _count_materializations(monkeypatch)
    eng = Engine(spark)
    eng.execute("CREATE TABLE t (k BIGINT, v BIGINT);")
    for i in range(4):
        eng.push("t", spark.createDataFrame([(i, i * 10)],
                                            "k long, v long"))
        eng.step()
    assert len([c for c in calls if c == "table_t"]) == 0
    # the integral read (Engine.view on a table) folds 4 deltas at once
    rows = {(r["k"], r["v"]) for r in eng.view("t").collect()}
    assert rows == {(0, 0), (1, 10), (2, 20), (3, 30)}
    assert len([c for c in calls if c == "table_t"]) == 1


def test_deferred_retraction_nets_in_peek_rows(spark):
    eng = Engine(spark)
    eng.execute("CREATE TABLE t (k BIGINT);")
    df = spark.createDataFrame([(1,), (2,)], "k long")
    eng.push("t", df)
    eng.step()
    eng.push("t", df.filter(F.col("k") == 1), weight=-1)
    eng.step()
    # rows() over the lazy peek must net the queued retraction
    assert {r["k"] for r in eng.view("t").collect()} == {2}


def test_old_snapshot_correct_after_current_read(spark):
    """A maintainer that reads a table's post-tick state before another
    reads its pre-tick snapshot gets the captured lazy plan — the
    snapshot must still show the PRE-tick rows."""
    from database_stream_processor_spark.sql import _OldSnapshots
    eng = Engine(spark)
    eng.execute("CREATE TABLE t (k BIGINT);")
    eng.push("t", spark.createDataFrame([(1,)], "k long"))
    eng.step()
    # queue one more delta, then snapshot (pre-tick = {1})
    old = _OldSnapshots(eng)
    eng.tables["t"].defer_update(
        ZSetFrame.from_df(spark.createDataFrame([(2,)], "k long")))
    # post-tick read first: folds past the snapshot mark
    assert {r["k"] for r in eng.tables["t"].current.rows().collect()} \
        == {1, 2}
    # snapshot read second: served from the captured lazy plan
    assert {r["k"] for r in old["t"].rows().collect()} == {1}


def test_old_snapshot_folds_to_mark_when_read_first(spark):
    from database_stream_processor_spark.sql import _OldSnapshots
    eng = Engine(spark)
    eng.execute("CREATE TABLE t (k BIGINT);")
    eng.push("t", spark.createDataFrame([(1,)], "k long"))
    eng.step()
    old = _OldSnapshots(eng)
    eng.tables["t"].defer_update(
        ZSetFrame.from_df(spark.createDataFrame([(2,)], "k long")))
    # pre-tick snapshot read first: folds exactly the pre-mark deltas
    assert {r["k"] for r in old["t"].rows().collect()} == {1}
    assert {r["k"] for r in eng.tables["t"].current.rows().collect()} \
        == {1, 2}


def test_durable_table_old_snapshot_is_pre_tick(spark, tmp_path):
    """Parquet-backend tables update EAGERLY inside step(); the lazy
    snapshot map must still serve the PRE-tick state (the A_old ⋈ ΔB leg
    of a bilinear join double-counts otherwise — caught by
    test_recovery's durable bootstrap test)."""
    eng = Engine(spark, state_path=str(tmp_path / "st"))
    eng.execute("""
        CREATE TABLE a (k BIGINT, v BIGINT);
        CREATE TABLE b (k BIGINT, w BIGINT);
        CREATE VIEW j AS SELECT a.k, a.v, b.w FROM a JOIN b ON a.k = b.k;
    """)
    eng.push("a", spark.createDataFrame([(1, 10)], "k long, v long"))
    eng.push("b", spark.createDataFrame([(1, 20)], "k long, w long"))
    eng.step()
    # second tick deltas BOTH sides: the ΔA⋈B_new + A_old⋈ΔB formula
    # yields exactly one new (2,…) row and no duplicate (1,…) rows
    eng.push("a", spark.createDataFrame([(2, 11)], "k long, v long"))
    eng.push("b", spark.createDataFrame([(2, 21)], "k long, w long"))
    eng.step()
    got = sorted(tuple(r) for r in eng.view("j").collect())
    assert got == [(1, 10, 20), (2, 11, 21)]


def test_fallback_view_folds_sources_before_step(spark, monkeypatch):
    """The snapshot-diff fallback resolves tables through canonical temp
    views; the engine must fold deferred source state before stepping it
    (sql_reads_sources=True) and results must match plain SQL."""
    calls = _count_materializations(monkeypatch)
    eng = Engine(spark)
    eng.execute("""
        CREATE TABLE t (k BIGINT, v BIGINT);
        CREATE VIEW w AS SELECT k, v FROM t WHERE v IN (
            SELECT MAX(v) FROM t);
    """)
    assert eng.view_strategy("w") == "differentiate"
    for i in range(2):
        eng.push("t", spark.createDataFrame(
            [(i, i * 5), (i + 10, 7)], "k long, v long"))
        eng.step()
    # the fallback forced a fold each tick, exactly the eager behaviour
    assert len([c for c in calls if c == "table_t"]) == 2
    assert {(r["k"], r["v"]) for r in eng.view("w").collect()} \
        == {(10, 7), (11, 7)}

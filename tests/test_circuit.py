"""Circuit builder — the reference's top-level API shape
(dbsp_handle.rs Runtime::init_circuit / step; tutorial & degrees.rs
examples): wire inputs → operators → outputs, push deltas, tick."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from database_stream_processor_spark.circuit import Circuit
from tests.conftest import zset_to_dict


@pytest.mark.slow
def test_join_aggregate_circuit_with_static_dimension(spark):
    c = Circuit(spark)
    orders = c.add_input_zset("c_custkey long, amount double")
    cust = c.add_input_zset("c_custkey long, nation string")
    joined = c.join(orders, cust,
                    empty_left="c_custkey long, amount double",
                    empty_right="c_custkey long, nation string",
                    on=["c_custkey"])
    rev = c.aggregate_linear(joined, ["nation"],
                             empty_in="c_custkey long, amount double, "
                                      "nation string",
                             n=F.lit(1), total=F.col("amount"))
    out = c.output(rev)

    cust.push(spark.createDataFrame(
        [(1, "PERU"), (2, "JAPAN")], "c_custkey long, nation string"))
    orders.push(spark.createDataFrame(
        [(1, 10.0), (2, 5.0)], "c_custkey long, amount double"))
    c.step()
    assert zset_to_dict(out.consolidate()) == {
        ("PERU", 1, 10.0): 1, ("JAPAN", 1, 5.0): 1}

    # tick 2: only an order delta — the dimension side does no work
    orders.push(spark.createDataFrame(
        [(1, 2.0)], "c_custkey long, amount double"))
    c.step()
    assert c.ticks == 2
    assert zset_to_dict(out.consolidate()) == {
        ("PERU", 2, 12.0): 1, ("JAPAN", 1, 5.0): 1}

    # tick 3: a retraction flows through join and aggregate
    orders.push(spark.createDataFrame(
        [(2, 5.0)], "c_custkey long, amount double"), weight=-1)
    c.step()
    assert zset_to_dict(out.consolidate()) == {("PERU", 2, 12.0): 1}


def test_stream_sugar_and_distinct(spark):
    c = Circuit(spark)
    ev = c.add_input_zset("user long, kind string")
    clicks = ev.filter(F.col("kind") == "click").map("user")
    uniq = c.distinct(clicks, empty_in="user long")
    out = c.output(uniq)

    ev.push(spark.createDataFrame(
        [(1, "click"), (1, "click"), (2, "view"), (3, "click")],
        "user long, kind string"))
    c.step()
    assert zset_to_dict(out.consolidate()) == {(1,): 1, (3,): 1}

    ev.push(spark.createDataFrame([(1, "click")], "user long, kind string"),
            weight=-1)
    ev.push(spark.createDataFrame([(4, "click")], "user long, kind string"))
    c.step()
    # user 1 still has one click left → stays distinct-present
    assert zset_to_dict(out.consolidate()) == {(1,): 1, (3,): 1, (4,): 1}


def test_empty_tick_does_no_work(spark):
    c = Circuit(spark)
    a = c.add_input_zset("k long")
    out = c.output(c.distinct(a, empty_in="k long"))
    a.push(spark.createDataFrame([(1,)], "k long"))
    c.step()
    c.step()   # nothing pending: every node skips
    assert c.ticks == 2
    assert zset_to_dict(out.consolidate()) == {(1,): 1}


def test_derived_delta_schemas(spark):
    """The module-docstring example verbatim: no empty_* DDL strings —
    delta schemas derive from the parent streams (through map_named,
    join, and aggregate_linear)."""
    c = Circuit(spark)
    orders = c.add_input_zset("o_custkey long, o_totalprice double")
    cust = c.add_input_zset("c_custkey long, n_name string")
    joined = c.join(orders.map_named(o_custkey="c_custkey"), cust,
                    on=["c_custkey"])
    rev = c.aggregate_linear(joined, ["n_name"],
                             total=F.col("o_totalprice"))
    out = c.output(rev)

    cust.push(spark.createDataFrame(
        [(1, "PERU")], "c_custkey long, n_name string"))
    orders.push(spark.createDataFrame(
        [(1, 10.0), (1, 2.5)], "o_custkey long, o_totalprice double"))
    c.step()
    assert zset_to_dict(out.consolidate()) == {("PERU", 12.5): 1}

    uniq = c.distinct(cust)  # derived through an input handle
    assert uniq.node_id > rev.node_id


def test_tumbling_window_node(spark):
    """Window operators wired as circuit nodes: tumbling aggregate deltas
    flow to the output handle, late rows emit corrections."""
    import datetime as dt
    c = Circuit(spark)
    ev = c.add_input_zset("k string, ts timestamp, v double")
    win = c.tumbling_window(ev, "ts", 10, ["k"],
                            n=F.lit(1), s=F.col("v"))
    out = c.output(win)
    t0 = dt.datetime(2026, 1, 1)
    mk = lambda rows: spark.createDataFrame(
        [(k, t0 + dt.timedelta(seconds=sec), float(v)) for k, sec, v in rows],
        "k string, ts timestamp, v double")
    ev.push(mk([("a", 5, 1), ("a", 15, 2)]))
    c.step()
    ev.push(mk([("a", 7, 10)]))   # late row → correction for window 0
    c.step()
    base = int(t0.timestamp()) // 10 * 10
    assert zset_to_dict(out.consolidate()) == {
        (base, "a", 2, 11.0): 1, (base + 10, "a", 1, 2.0): 1}


def test_apply_schema_probe_tolerates_fragile_callables(spark):
    """apply() derives the output schema by probing f on the parent's
    empty frame at wiring time; a callable that only works on non-empty
    input (or side-effects) must not break construction — the probe
    failure just leaves the schema underivable, and an explicit DDL
    downstream (or a schema-bearing sibling in plus()) covers it."""
    from database_stream_processor_spark.zset import ZSetFrame

    c = Circuit(spark)
    src = c.add_input_zset("k int, v double")

    probe_calls = []

    def fragile(z: ZSetFrame) -> ZSetFrame:
        probe_calls.append(1)
        first = z.df.orderBy("k").first()  # data-dependent: None on empty
        return z.filter(F.col("v") >= first["v"])

    s = c.apply(src, fragile)
    # wiring survived; the probe ran exactly once and failed gracefully
    assert c._empties[s.node_id] is None

    # plus() falls back to the *other* side's schema when one is unknown
    known = c.add_input_zset("k int, v double")
    summed = c.plus(s, known)
    assert c._empties[summed.node_id] is not None
    summed_rev = c.plus(known, s)
    assert c._empties[summed_rev.node_id] is not None

    out = c.output(summed)
    wiring_probes = len(probe_calls)
    src.push(spark.createDataFrame([(1, 2.0), (2, 1.0)], "k int, v double"))
    known.push(spark.createDataFrame([(3, 9.0)], "k int, v double"))
    c.step()
    assert len(probe_calls) == wiring_probes + 1   # ran once at step time
    got = zset_to_dict(out.consolidate())
    assert got == {(1, 2.0): 1, (3, 9.0): 1}


@pytest.mark.slow
def test_set_and_map_input_nodes(spark):
    """Circuit-level set/map inputs (input.rs:230,313): set semantics
    dedupe re-inserts and ignore absent deletes; map upserts retract the
    replaced value."""
    c = Circuit(spark)
    s = c.add_input_set("k long")
    m = c.add_input_map("k long, v string", keys=["k"])
    s_out = c.output(s)
    m_out = c.output(m)

    mk = lambda rows, ddl: spark.createDataFrame(rows, ddl)
    s.insert(mk([(1,), (2,), (2,)], "k long"))   # dup deduped
    m.upsert(mk([(1, "a"), (2, "b")], "k long, v string"))
    c.step()
    s.insert(mk([(1,)], "k long"))               # already present: no-op
    s.delete(mk([(9,)], "k long"))               # absent: no-op
    s.delete(mk([(2,)], "k long"))
    m.upsert(mk([(1, "a2")], "k long, v string"))  # replaces "a"
    m.delete(mk([(2,)], "k long"))                  # keys-only delete
    c.step()
    assert zset_to_dict(s_out.consolidate()) == {(1,): 1}
    assert zset_to_dict(m_out.consolidate()) == {(1, "a2"): 1}


def test_rolling_linear_node(spark):
    """O(Δ) rolling linear aggregate as a circuit node: integrated
    deltas across out-of-order batches equal the one-shot window SQL."""
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1)
    mk = lambda rows: spark.createDataFrame(
        [(k, t0 + dt.timedelta(seconds=s), float(v)) for k, s, v in rows],
        "k string, ts timestamp, v double")
    c = Circuit(spark)
    ev = c.add_input_zset("k string, ts timestamp, v double")
    roll = c.rolling_aggregate_linear(
        ev, "k", "ts", before=10, after=0, aggs={"s": F.col("v")})
    out = c.output(roll)
    ev.push(mk([("a", 0, 1), ("a", 20, 4)]))
    c.step()
    ev.push(mk([("a", 15, 2)]))   # late row corrects the t=20 frame
    c.step()
    got = {(k, ts, v, float(s)): w for (k, ts, v, s), w in
           zset_to_dict(out.consolidate()).items()}
    want = {("a", t0, 1.0, 1.0): 1,
            ("a", t0 + dt.timedelta(seconds=15), 2.0, 2.0): 1,
            ("a", t0 + dt.timedelta(seconds=20), 4.0, 6.0): 1}
    assert got == want


def test_output_handle_reads_stateful_node_snapshot(spark):
    """An OutputHandle on a stateful node consolidates from the node's
    maintained state (the trace) instead of re-merging the delta log
    (output.rs:130-219) — and the two views agree, including a group
    cancelled to zero weight."""
    from database_stream_processor_spark.zset import ZSetFrame
    c = Circuit(spark)
    h = c.add_input_zset("k int, v long")
    agg = c.aggregate_linear(h, ["k"], s=F.col("v"))
    out = c.output(agg)
    assert out._snapshot_fn is not None  # snapshot path wired
    mk = lambda rows: spark.createDataFrame(rows, "k int, v long")
    h.push(mk([(1, 5), (2, 3)]))
    c.step()
    h.push(mk([(1, 5)]), weight=-1)   # k=1 cancels to zero -> absent
    c.step()
    snap = sorted(tuple(r) for r in out.consolidate().rows().collect())
    merged = sorted(tuple(r) for r in
                    ZSetFrame.sum(out._deltas).consolidate().rows().collect())
    assert snap == merged == [(2, 3)]

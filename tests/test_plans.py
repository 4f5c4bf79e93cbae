"""Physical-plan quality gates for headline queries — the 100 TB design
asserted structurally: filters reach the parquet scan, projections prune
the read schema, dimension joins broadcast, bucketed pipelines never
produce a cartesian product, and hot paths stay inside whole-stage
codegen (no Python row loop)."""

from __future__ import annotations

import pytest

from database_stream_processor_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    import contextlib
    import io
    df.collect()  # finalize AdaptiveSparkPlan so codegen ids are assigned
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q01_filter_pushdown_and_column_pruning(spark):
    df = REGISTRY["q01_pricing_summary"].fn(spark, SF)
    plan = _physical(df)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan \
        or "PushedFilters: [" in plan
    # 7-column read out of 16 lineitem columns — projection reached the scan
    read = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_quantity" in read and "l_orderkey" not in read
    assert "[codegen id :" in plan  # whole-stage codegen spans present


def test_q02_dimension_joins_broadcast(spark):
    df = REGISTRY["q02_revenue_by_nation"].fn(spark, SF)
    plan = _physical(df)
    # nation/customer are dimension tables: no shuffle-merge join of the
    # fact table against them
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q27_lsh_no_cartesian_product(spark):
    df = REGISTRY["q27_lsh_near_dup_pairs"].fn(spark, SF)
    plan = _physical(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q31_ann_is_equi_join_on_bucket(spark):
    df = REGISTRY["q31_lsh_ann_topk"].fn(spark, SF)
    plan = _physical(df)
    assert "CartesianProduct" not in plan
    # the bucket key is non-nullable (coalesced signature), so the bucket
    # equi-join must NOT have inferred IsNotNull(__bucket) and pushed the
    # whole interpreted LSH-signature aggregate below the projection —
    # that re-evaluates the signature a second time per corpus row,
    # single-threaded below the spread exchange (the r13 q31 root cause;
    # same disease as q46's centroid assignment, fixed r12)
    final = plan.split("== Initial Plan ==")[0]
    assert not any("Filter" in line and "aggregate(" in line
                   for line in final.splitlines())


def test_q47_bucket_join_key_is_nonnullable(spark):
    df = REGISTRY["q47_cosine_near_dup"].fn(spark, SF)
    final = _physical(df).split("== Initial Plan ==")[0]
    # same invariant as q31: no signature expression under any Filter
    assert not any("Filter" in line and "aggregate(" in line
                   for line in final.splitlines())


def test_q33_text_scoring_stays_jvm_side(spark):
    df = REGISTRY["q33_quality_score"].fn(spark, SF)
    plan = _physical(df)
    # pure column expressions: no Python/pandas evaluation anywhere
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "[codegen id :" in plan


@pytest.mark.parametrize("name", [
    "q01_pricing_summary", "q02_revenue_by_nation", "q05_supplier_volume",
    "q15_topk_orders_per_priority", "q32_language_id", "q34_token_counts",
])
def test_no_python_row_loop_in_relational_queries(spark, name):
    plan = _physical(REGISTRY[name].fn(spark, SF))
    assert "BatchEvalPython" not in plan  # row-at-a-time Python = slow path


def test_q15_topk_uses_window_group_limit(spark):
    df = REGISTRY["q15_topk_orders_per_priority"].fn(spark, SF)
    plan = _physical(df)
    # rank-filter plans as WindowGroupLimit: partial top-k before shuffle,
    # no full per-group materialization
    assert "WindowGroupLimit" in plan


def test_q46_ivf_assignment_is_projection_and_probe_join_broadcasts(spark):
    df = REGISTRY["q46_ivf_topk"].fn(spark, SF)
    plan = _physical(df)
    # after a collect, formatted explain prints the Final AND the Initial
    # adaptive plan; assert on the executed (final) tree only
    final = plan.split("== Initial Plan ==")[0]
    # centroid assignment/probing are per-row projections against literal
    # centroids: no crossJoin-with-centroids round trip, no corpus-wide
    # window rank — the only Window left is the final per-query top-k
    assert "BroadcastNestedLoopJoin" not in final
    assert "CartesianProduct" not in final
    assert final.count("Window (") == 1  # only the final per-query top-k
    # the scoring join broadcasts the tiny probe side; the corpus is
    # never hash-shuffled into a sort-merge join
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final
    # the join key is non-nullable (coalesced), so the inner join must NOT
    # have inferred an IsNotNull(__cent_id) filter and pushed the whole
    # 16-centroid assignment expression below the projection — that
    # re-evaluates the interpreted higher-order-function dot products a
    # second time per corpus row
    assert not any("Filter" in line and "array_max" in line
                   for line in final.splitlines())

"""Physical-plan hygiene: the properties the 100 TB design depends on must
be visible in the actual plans — filters reach the scan, projections prune
the read schema, dimension joins broadcast, and the blocked geo join never
degenerates into a nested-loop/cartesian product."""

from owl_n4j_spark.plans.geo import q_geo_copresence, q_tower_coreg
from owl_n4j_spark.plans.relational import q_pricing_summary, q_region_revenue
from owl_n4j_spark.plans.text import q_doc_token_stats, q_knn_bruteforce

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().sparkPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(q_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan \
        or "LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_in_read_schema(spark):
    # q_doc_token_stats touches only doc_id/text; the parquet scan must not
    # read the lang/url/other columns
    plan = _plan(q_doc_token_stats(spark, SF))
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    assert "lang" not in read[0]
    assert "doc_id" in read[0] and "text" in read[0]


def test_dimension_joins_broadcast(spark):
    plan = _plan(q_region_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_geo_blocked_join_is_hash_join(spark):
    # the 27-key expansion must meet the probe side on an equi-join —
    # never a nested loop / cartesian product
    for q in (q_geo_copresence, q_tower_coreg):
        plan = _plan(q(spark, SF))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_knn_broadcasts_query_side(spark):
    # the brute-force kNN baseline is a deliberate broadcast of the tiny
    # query set against the candidate table — the plan must show it
    plan = _plan(q_knn_bruteforce(spark, SF))
    assert "Broadcast" in plan

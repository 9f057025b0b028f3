"""Co-located (bucketed) join: the 100 TB strategy for repeated big-big
joins on the same key (SURVEY §4 / SCALE.md). Bucketing both sides on the
join key lets Spark plan a SortMergeJoin with NO Exchange — verified against
the executed plan, and results equal the unbucketed join."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    n = 10_000
    a = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("va"))
    b = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("vb"))
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
    a.write.bucketBy(8, "k").sortBy("k").saveAsTable("bt_a")
    b.write.bucketBy(8, "k").sortBy("k").saveAsTable("bt_b")
    yield spark.table("bt_a"), spark.table("bt_b")
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ta, tb = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = ta.join(tb, "k")
        j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    ta, tb = bucketed_tables
    n = 10_000
    a = spark.range(n).select(F.col("id").alias("k"),
                              (F.col("id") % 97).alias("va"))
    b = spark.range(n).select(F.col("id").alias("k"),
                              (F.col("id") % 31).alias("vb"))
    want = a.join(b, "k").agg(F.sum(F.col("va") * F.col("vb"))).collect()[0][0]
    got = ta.join(tb, "k").agg(F.sum(F.col("va") * F.col("vb"))).collect()[0][0]
    assert got == want

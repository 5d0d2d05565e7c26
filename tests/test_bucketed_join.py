"""Bucketed-table co-located join: the 100 TB repeated-join path.

Writing both sides bucketed on the join key (Iceberg ``bucket(N, key)``
analog via ``bucketBy``) lets repeated joins run with NO Exchange on either
side — the scan itself satisfies the required distribution.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark):
    # tables land in ./spark-warehouse (gitignored); dropped on teardown
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("topic"))
    scores = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 3 % 100).alias("score"))
    for name, df in (("t_docs_b", docs), ("t_scores_b", scores)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.bucketBy(8, "doc_id").sortBy("doc_id")
         .mode("overwrite").saveAsTable(name))
    yield "t_docs_b", "t_scores_b"
    for name in ("t_docs_b", "t_scores_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    a, b = bucketed
    # disable broadcast so the join strategy is the co-located sort-merge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(a).join(spark.table(b), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_join_needs_exchange(spark, bucketed):
    """Control: the same join over plain scans shuffles both sides."""
    a, _ = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = spark.table(a).withColumn("x", F.lit(1)).repartition(4)
        other = spark.table(a).withColumn("y", F.lit(2)).repartition(3)
        plan = plain.join(other, "doc_id") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

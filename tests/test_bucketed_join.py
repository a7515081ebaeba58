"""Bucketed co-located join: the shuffle-elimination story.

At 100 TB, a fact-fact join on a shared key shuffles both sides every query
unless the lake is bucketed on the join key. This test materializes lineitem
and orders bucketed by order key (8 buckets, sorted) and proves the join
plans with NO Exchange on either side — the pre-shuffled layout is reused —
versus the plain-parquet join which must shuffle both inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    for name, key, table in (
        ("lineitem", "l_orderkey", "li_bucketed"),
        ("orders", "o_orderkey", "ord_bucketed"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        (
            load_table(spark, sf_dir, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(base / table))
            .mode("overwrite")
            .saveAsTable(table)
        )
    yield "li_bucketed", "ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def _join_plan(spark, left, right):
    df = left.join(right, left["l_orderkey"] == right["o_orderkey"]).groupBy(
        "o_orderpriority"
    ).agg(F.count("*").alias("cnt"))
    return df, spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, bucketed_tables):
    li_t, ord_t = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed_df, bucketed_plan = _join_plan(
            spark, spark.table(li_t), spark.table(ord_t)
        )
        plain_df, plain_plan = _join_plan(
            spark,
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "orders"),
        )
        # plain join: both sides shuffle on the join key
        assert "hashpartitioning(l_orderkey" in plain_plan
        assert "hashpartitioning(o_orderkey" in plain_plan
        # bucketed join: the only exchange left is the tiny post-join agg
        assert "hashpartitioning(l_orderkey" not in bucketed_plan
        assert "hashpartitioning(o_orderkey" not in bucketed_plan
        assert "SelectedBucketsCount: 8 out of 8" in bucketed_plan
        # and both produce identical results
        b = {r["o_orderpriority"]: r["cnt"] for r in bucketed_df.collect()}
        p = {r["o_orderpriority"]: r["cnt"] for r in plain_df.collect()}
        assert b == p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

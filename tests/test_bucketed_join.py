"""Bucketed-layout contracts: a join between two tables bucketed on the
join key runs with ZERO shuffle exchanges (and zero per-query sorts when
written sortBy), produces exactly the rows of the plain shuffled join,
and an equality point-predicate prunes the scan to one bucket."""

from __future__ import annotations

import re

import pytest

from aws_flight_data_pipeline_spark.sources.bucketed import (
    drop_bucketed,
    read_bucketed,
    write_bucketed,
)
from aws_flight_data_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_name")
    write_bucketed(
        orders, "t_orders_b", ["o_custkey"], N_BUCKETS, str(tmp_path / "ob")
    )
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "t_cust_b",
        ["o_custkey"],
        N_BUCKETS,
        str(tmp_path / "cb"),
    )
    yield orders, cust
    drop_bucketed(spark, "t_orders_b")
    drop_bucketed(spark, "t_cust_b")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_zero_exchanges_and_sorts(spark, bucketed_pair):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # one file per bucket (write_bucketed guarantees it) makes the legacy
    # sorted-scan flag safe: the scan then REPORTS the sortBy order and
    # the sort-merge join needs no per-query Sort
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        joined = read_bucketed(spark, "t_orders_b").join(
            read_bucketed(spark, "t_cust_b"), "o_custkey"
        )
        joined.collect()  # force AQE finalization before reading the plan
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
        # sortBy at write time: no per-query Sort feeding the join either
        assert not re.search(r"\(\d+\) Sort\b", plan) and "+- Sort " not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    orders, cust = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = (
            read_bucketed(spark, "t_orders_b")
            .join(read_bucketed(spark, "t_cust_b"), "o_custkey")
            .select("o_orderkey", "o_custkey", "o_totalprice", "c_name")
        )
        plain = (
            orders.join(
                cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
            ).select("o_orderkey", "o_custkey", "o_totalprice", "c_name")
        )
        assert sorted(map(tuple, bucketed.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_point_predicate_prunes_to_one_bucket(spark, bucketed_pair):
    orders, _ = bucketed_pair
    some_key = orders.select("o_custkey").first()[0]
    # without a join/agg wanting the clustering, the auto rule drops the
    # bucketed scan entirely — and equality bucket PRUNING with it
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        scan = read_bucketed(spark, "t_orders_b").where(f"o_custkey = {some_key}")
        plan = _executed_plan(scan)
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, f"no bucket pruning in plan:\n{plan}"
        assert int(m.group(1)) == 1 and int(m.group(2)) == N_BUCKETS
        # and the pruned read still returns exactly that key's rows
        expect = orders.where(f"o_custkey = {some_key}").count()
        assert scan.count() == expect
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_write_bucketed_rejects_bad_bucket_count(spark):
    orders = load_table(spark, SF, "orders").limit(1)
    with pytest.raises(ValueError):
        write_bucketed(orders, "t_bad", ["o_custkey"], 0, "/tmp/never")

"""Binned point-in-interval join (operators/rangejoin.py): exact
equivalence with the naive BETWEEN join, exactly-once pair emission across
bin-spanning intervals, degenerate-interval handling, and the plan shape
(equi shuffle join on (keys, bin) — never a nested-loop/cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.operators.rangejoin import bin_interval_join


def _points(spark, rows):
    return spark.createDataFrame(rows, "k string, pid bigint, p bigint")


def _intervals(spark, rows):
    return spark.createDataFrame(rows, "k string, iid bigint, s bigint, e bigint")


def _naive(points, intervals):
    return points.join(
        intervals,
        on=[
            points.k == intervals.k,
            points.p >= intervals.s,
            points.p <= intervals.e,
        ],
    ).select(points.k, "pid", "iid")


def _pairs(df):
    return sorted((r["k"], r["pid"], r["iid"]) for r in df.collect())


def test_matches_naive_between_join(spark):
    pts = _points(
        spark,
        [("a", 1, 5), ("a", 2, 10), ("a", 3, 99), ("b", 4, 10), ("b", 5, -7)],
    )
    ivs = _intervals(
        spark,
        [("a", 10, 0, 10), ("a", 11, 10, 20), ("b", 12, -10, 0), ("b", 13, 9, 9)],
    )
    got = bin_interval_join(pts, ivs, "p", "s", "e", bin_width=4, keys=("k",))
    assert _pairs(got.select("k", "pid", "iid")) == _pairs(_naive(pts, ivs))


def test_pair_emitted_exactly_once_across_spanning_interval(spark):
    # one interval spanning 25+ bins; every contained point matches ONCE
    pts = _points(spark, [("a", i, i * 10) for i in range(30)])
    ivs = _intervals(spark, [("a", 1, 0, 250)])
    got = bin_interval_join(pts, ivs, "p", "s", "e", bin_width=10, keys=("k",))
    assert got.count() == 26  # points 0..250 by 10
    assert got.select("pid").distinct().count() == 26


def test_inclusive_boundaries_and_negative_coordinates(spark):
    pts = _points(spark, [("a", 1, -20), ("a", 2, -11), ("a", 3, -10), ("a", 4, 0)])
    ivs = _intervals(spark, [("a", 1, -20, -10)])
    got = bin_interval_join(pts, ivs, "p", "s", "e", bin_width=7, keys=("k",))
    assert sorted(r["pid"] for r in got.collect()) == [1, 2, 3]


def test_degenerate_interval_matches_nothing(spark):
    pts = _points(spark, [("a", 1, 5)])
    ivs = _intervals(spark, [("a", 1, 10, 0)])  # end < start
    got = bin_interval_join(pts, ivs, "p", "s", "e", bin_width=4, keys=("k",))
    assert got.count() == 0


def test_no_keys_pure_range_join(spark):
    pts = _points(spark, [("a", 1, 5), ("b", 2, 15)]).drop("k")
    ivs = _intervals(spark, [("x", 1, 0, 10), ("y", 2, 10, 20)]).drop("k")
    got = bin_interval_join(pts, ivs, "p", "s", "e", bin_width=8)
    assert _pairs(got.select(F.lit("-").alias("k"), "pid", "iid")) == [
        ("-", 1, 1),
        ("-", 2, 2),
    ]


def test_rejects_nonpositive_bin_width(spark):
    pts = _points(spark, [("a", 1, 5)])
    ivs = _intervals(spark, [("a", 1, 0, 10)])
    with pytest.raises(ValueError):
        bin_interval_join(pts, ivs, "p", "s", "e", bin_width=0)


def test_plan_is_equi_join_never_nested_loop(spark, sf_dir):
    from aws_flight_data_pipeline_spark.plans.registry import resolve

    df = resolve("interval_bin_join")(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bins_are_exact_beyond_double_precision(spark):
    # epoch-micro-scale callers stay below 2^53, but the bin math must not
    # silently wobble past it: quotients ride SQL `div`, never a double
    from aws_flight_data_pipeline_spark.operators.rangejoin import bin_interval_join

    base = 1 << 60
    pts = spark.createDataFrame(
        [(base + 5, "in"), (base + 103, "out")], "v long, name string"
    )
    iv = spark.createDataFrame([(base + 1, base + 9, "iv")], "s long, e long, tag string")
    got = bin_interval_join(pts, iv, "v", "s", "e", bin_width=4)
    rows = [(r["name"], r["tag"]) for r in got.collect()]
    assert rows == [("in", "iv")]

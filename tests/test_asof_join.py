"""Unit semantics of the as-of join operator (operators/asof.py).

The DuckDB ASOF JOIN parity test proves the operator on real data; these pin
the edge semantics the oracle can't isolate: inclusive equal-timestamp match,
no-prior-row nulls, NULL payload fields on the matched row staying NULL
(struct fill, not per-column fill), and multi-key grouping.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.operators.asof import asof_join


def _frames(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k long, lts long, lval string").withColumn(
        "lt", F.timestamp_seconds("lts")
    )
    right = spark.createDataFrame(right_rows, "k long, rts long, rval string").withColumn(
        "rt", F.timestamp_seconds("rts")
    )
    return left.drop("lts"), right.drop("rts")


def test_backward_match_and_no_prior_null(spark):
    left, right = _frames(
        spark,
        [(1, 100, "a"), (1, 50, "b"), (2, 10, "c")],
        [(1, 60, "r60"), (1, 90, "r90"), (2, 99, "r99")],
    )
    out = {
        (r["k"], r["lval"]): r["rval"]
        for r in asof_join(left, right, on="k", left_ts="lt", right_ts="rt").collect()
    }
    assert out[(1, "a")] == "r90"  # latest at-or-before 100
    assert out[(1, "b")] is None  # no right row at-or-before 50
    assert out[(2, "c")] is None  # right row exists but is later


def test_equal_timestamp_is_inclusive(spark):
    left, right = _frames(spark, [(1, 100, "a")], [(1, 100, "same-ts")])
    (row,) = asof_join(left, right, on="k", left_ts="lt", right_ts="rt").collect()
    assert row["rval"] == "same-ts"


def test_null_payload_on_matched_row_stays_null(spark):
    # the matched (latest) right row has a NULL payload field; a per-column
    # ignorenulls fill would leak the OLDER row's value through it
    left, right = _frames(
        spark, [(1, 100, "a")], [(1, 10, "old"), (1, 90, None)]
    )
    (row,) = asof_join(left, right, on="k", left_ts="lt", right_ts="rt").collect()
    assert row["rval"] is None
    assert row["rt"] is not None  # the match itself happened (at ts 90)


def test_multi_column_key(spark):
    left = spark.createDataFrame(
        [(1, "x", 100, "a"), (1, "y", 100, "b")], "k long, g string, lts long, lval string"
    ).withColumn("lt", F.timestamp_seconds("lts")).drop("lts")
    right = spark.createDataFrame(
        [(1, "x", 50, "rx"), (1, "y", 60, "ry")], "k long, g string, rts long, rval string"
    ).withColumn("rt", F.timestamp_seconds("rts")).drop("rts")
    out = {
        (r["k"], r["g"]): r["rval"]
        for r in asof_join(left, right, on=["k", "g"], left_ts="lt", right_ts="rt").collect()
    }
    assert out == {(1, "x"): "rx", (1, "y"): "ry"}

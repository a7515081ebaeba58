"""Unit tests for the serving payload (operators/serving.py) and the batch
check suite (operators/batch_checks.py) on the seeded flight fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.operators.batch_checks import (
    batch_check_suite,
    overall_quality_report,
)
from aws_flight_data_pipeline_spark.operators.serving import flight_stats_payload
from tests.flight_fixtures import PROCESSED_DDL, processed_rows


@pytest.fixture(scope="module")
def processed(spark):
    df = spark.createDataFrame(processed_rows(), schema=PROCESSED_DDL).cache()
    df.count()
    yield df
    df.unpersist()


def test_stats_payload_totals(processed):
    row = flight_stats_payload(processed).collect()[0]
    n = processed.count()
    assert row["total_aircraft"] == n
    assert row["airborne_count"] + row["ground_count"] == n
    assert (
        row["alt_low"] + row["alt_medium"] + row["alt_high"] + row["alt_very_high"]
        == row["airborne_count"]
    )
    assert row["countries_count"] == 6  # fixture airlines span 6 countries
    assert len(row["top_countries"]) <= 10
    counts = [c["cnt"] for c in row["top_countries"]]
    assert counts == sorted(counts, reverse=True)
    fastest = [a["velocity_knots"] for a in row["fastest_aircraft"]]
    assert len(fastest) == 10 and fastest == sorted(fastest, reverse=True)
    top_speed = processed.filter(~F.col("on_ground")).agg(F.max("velocity_knots")).first()[0]
    assert fastest[0] == top_speed
    assert row["max_speed_knots"] == round(top_speed, 2)


def test_stats_payload_sampling_scales(processed):
    row = flight_stats_payload(processed, sample_fraction=0.5).collect()[0]
    n = processed.count()
    # scaled estimate should land within ±25% of the true total (seeded sample)
    assert abs(row["total_aircraft"] - n) / n < 0.25


def test_check_suite_scores_and_shape(processed):
    res = batch_check_suite(processed)
    rows = {r["check_name"]: r for r in res.collect()}
    # all 15 applicable checks present (geo_altitude_ft absent from fixture)
    expected = {
        "completeness", "validity", "consistency", "uniqueness", "accuracy",
        "timeliness", "timestamp_consistency", "altitude_range", "speed_range",
        "anomaly_detection", "coordinate_validity", "position_accuracy",
        "callsign_format", "country_code", "speed_consistency",
    }
    assert set(rows) == expected
    for r in rows.values():
        assert 0.0 <= r["score"] <= 1.0
        assert r["record_count"] == 1200
    # fixture data is clean on these dimensions
    assert rows["completeness"]["score"] == 1.0
    assert rows["validity"]["score"] == 1.0
    assert rows["callsign_format"]["passed"]
    assert rows["country_code"]["score"] == 1.0
    assert rows["uniqueness"]["passed"]


def test_check_suite_detects_injected_issues(spark, processed):
    # poison: null out icao24s, teleport coordinates to null island, stale ts
    bad = processed.withColumn(
        "icao24", F.when(F.col("latitude") > 40, None).otherwise(F.col("icao24"))
    ).withColumn(
        "latitude", F.when(F.col("longitude") < 0, 0.0).otherwise(F.col("latitude"))
    ).withColumn(
        "longitude", F.when(F.col("longitude") < 0, 0.0).otherwise(F.col("longitude"))
    )
    good = {r["check_name"]: r["score"] for r in batch_check_suite(processed).collect()}
    poisoned = {r["check_name"]: r["score"] for r in batch_check_suite(bad).collect()}
    assert poisoned["completeness"] < good["completeness"]
    assert poisoned["coordinate_validity"] < good["coordinate_validity"]


def test_overall_report(processed):
    report = overall_quality_report(batch_check_suite(processed)).collect()[0]
    assert report["checks_run"] == 15
    assert 0.0 <= report["overall_score"] <= 1.0
    assert report["grade"] in {"A", "B", "C", "D", "F"}
    assert report["alert"] == (report["overall_score"] < 0.7)


def test_check_suite_skips_missing_columns(spark):
    tiny = spark.createDataFrame(
        [("abc123", 100), ("def456", 200)], schema="icao24 string, last_contact long"
    )
    rows = {r["check_name"] for r in batch_check_suite(tiny).collect()}
    assert rows == {"completeness", "uniqueness", "timeliness", "timestamp_consistency"}


def test_quality_check_suite_stays_two_pass(spark, sf_dir):
    """Verdict r13 #7: the three batch-aggregate rows folded in at r12
    must ride the existing two-job aggregation — the structural pin is
    that the physical plan scans the events table exactly TWICE (the tiny
    broadcast stats pass + the one wide aggregate computing every check),
    so a third aggregation pass can never sneak in unnoticed."""
    import re

    from aws_flight_data_pipeline_spark.plans.registry import (
        _ensure_loaded,
        resolve,
    )

    _ensure_loaded()
    df = resolve("quality_check_suite")(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Scan parquet", plan)) == 2
    # 10 check rows still come out of the suite
    assert df.count() == 10

"""Tests for the analytical query library (the reference's 10 Athena queries
+ summary views) over seeded synthetic flight data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.plans import flight_analytics as fa
from aws_flight_data_pipeline_spark.sources.sinks import with_time_partitions
from tests.flight_fixtures import (
    AIRCRAFT_REF_DDL,
    AIRPORT_REF_DDL,
    NOW,
    PROCESSED_DDL,
    QUALITY_METRICS_DDL,
    aircraft_reference_rows,
    airport_reference_rows,
    processed_rows,
    quality_metrics_rows,
)


@pytest.fixture(scope="module")
def processed(spark):
    rows = processed_rows()
    df = spark.createDataFrame(rows, PROCESSED_DDL)
    df = with_time_partitions(df)
    return fa.with_analytics_categories(df).cache()


@pytest.fixture(scope="module")
def aircraft_ref(spark, processed):
    return spark.createDataFrame(
        aircraft_reference_rows(processed_rows()), AIRCRAFT_REF_DDL
    )


@pytest.fixture(scope="module")
def airport_ref(spark):
    return spark.createDataFrame(airport_reference_rows(), AIRPORT_REF_DDL)


@pytest.fixture(scope="module")
def quality_metrics(spark):
    return spark.createDataFrame(quality_metrics_rows(), QUALITY_METRICS_DDL)


def test_q1_flight_status_overview(processed):
    out = fa.q1_flight_status_overview(processed, NOW).collect()[0]
    assert out.total_active_flights > 0
    assert out.countries_active >= 1
    dist = (
        out.low_altitude_flights
        + out.medium_altitude_flights
        + out.high_altitude_flights
        + out.very_high_altitude_flights
    )
    assert dist == out.total_active_flights  # bands partition the space
    assert 0.7 < out.avg_quality_score <= 1.0


def test_q2_altitude_bands_partition_and_percentages(processed):
    rows = fa.q2_altitude_band_distribution(processed, NOW).collect()
    assert len(rows) >= 3
    assert abs(sum(r.percentage_of_total for r in rows) - 100.0) < 0.5
    # ordered by band floor
    mins = [r.min_altitude_ft for r in rows]
    assert mins == sorted(mins)


def test_q3_quality_hourly_limit(quality_metrics):
    rows = fa.q3_quality_metrics_hourly(quality_metrics, NOW).collect()
    assert 0 < len(rows) <= 168
    assert all(0 <= r.avg_quality_score <= 1 for r in rows)


def test_q4_peak_traffic_rank_monotone(processed):
    rows = fa.q4_peak_traffic(processed, NOW).collect()
    assert rows and rows[0].traffic_rank == 1
    counts = [r.flight_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r.time_of_day in ("Morning", "Afternoon", "Evening", "Night") for r in rows)


def test_q5_route_corridors(processed):
    rows = fa.q5_route_corridors(processed, NOW, min_flights=2).collect()
    assert rows
    assert all(r.total_flights >= 2 for r in rows)
    assert all(0 < r.route_consistency_score <= 1.0 for r in rows)


def test_q6_anomaly_zscore_topk(processed):
    rows = fa.q6_anomaly_zscore(processed, NOW).collect()
    assert len(rows) <= 100
    zs = [r.max_zscore for r in rows]
    assert zs == sorted(zs, reverse=True)
    assert all(r.max_zscore > 2.0 for r in rows)


def test_q7_aircraft_performance_left_join(processed, aircraft_ref):
    rows = fa.q7_aircraft_performance(processed, aircraft_ref, NOW, min_obs=5).collect()
    assert rows
    models = {r.aircraft_model for r in rows}
    assert "Unknown" in models  # unmatched dim rows preserved by LEFT join
    assert all(r.observations >= 5 for r in rows)


def test_q8_airport_proximity(processed, airport_ref):
    rows = fa.q8_airport_proximity(processed, airport_ref, NOW).collect()
    assert rows  # trajectories start/end at the fixture airports
    assert all(r.closest_approach_miles <= 50.0 for r in rows)
    assert all(r.nearby_flights >= r.unique_aircraft for r in rows)


def test_q9_temporal_patterns_dow_approximation(processed):
    rows = fa.q9_temporal_patterns(processed, NOW).collect()
    assert rows
    assert all(1 <= r.approx_day_of_week <= 7 for r in rows)
    assert all(r.traffic_intensity in ("Peak", "High", "Moderate", "Light") for r in rows)


def test_q10_quality_assessment_trend(quality_metrics):
    rows = fa.q10_quality_assessment(quality_metrics, NOW).collect()
    assert 0 < len(rows) <= 30
    assert all(r.quality_grade in "ABCDF" for r in rows)
    # newest-first ordering
    keys = [(r.year, r.month, r.day) for r in rows]
    assert keys == sorted(keys, reverse=True)


def test_hourly_and_daily_views(processed):
    hourly = fa.hourly_flight_summary(processed)
    hrows = hourly.collect()
    assert hrows
    r0 = hrows[0]
    assert r0.grounded_aircraft + r0.airborne_aircraft == r0.total_flights
    daily = fa.daily_flight_summary(processed).collect()
    assert daily
    assert all(d.peak_hour_flights >= d.avg_hourly_flights for d in daily)


def test_realtime_metrics_window(processed):
    out = fa.realtime_flight_metrics(processed, NOW, window_hours=4).collect()[0]
    assert out.total_observations > 0
    assert out.airborne_count + out.ground_count == out.total_observations
    assert out.latest_collection_time <= NOW


def test_quality_dashboard_and_high_quality_view(processed, quality_metrics):
    dash = fa.data_quality_dashboard(quality_metrics).collect()
    assert dash and all(d.total_records > 0 for d in dash)
    hq = fa.high_quality_flights(processed)
    assert hq.count() > 0
    assert hq.filter(F.col("data_quality_score") <= 0.8).count() == 0


def test_latest_flight_activity_view(spark, tmp_path):
    import json

    from aws_flight_data_pipeline_spark.plans.flight_analytics import latest_flight_activity
    from aws_flight_data_pipeline_spark.sources.opensky import read_raw_batches

    d = tmp_path / "raw"
    d.mkdir()
    state = ["abc123", "UAL1    ", "US", 1693401600, 1693401600, -73.0, 40.0,
             3048.0, False, 128.0, 90.0, 0.0, None, 3100.0, "7700", False, 0]
    for i, n_states in enumerate([3, 1]):
        with open(d / f"flight_data_{i}.json", "w") as f:
            json.dump({"time": 1693401600 + i * 30, "states": [state] * n_states}, f)
    rows = latest_flight_activity(read_raw_batches(spark, str(d))).collect()
    # newest batch first, cardinality(states) per batch
    assert [(r["batch_time"], r["aircraft_count"]) for r in rows] == [
        (1693401630, 1),
        (1693401600, 3),
    ]
    assert rows[0]["batch_timestamp"].year == 2023

"""Error-path tests — the engine-side analog of the reference's
tests/unit/test_error_handling.py:34-710 (None/empty/corrupt inputs, graceful
degradation): empty frames through every major operator, corrupt JSON through
the PERMISSIVE raw scan, and clean failures on bad paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from aws_flight_data_pipeline_spark.operators.batch_checks import (
    batch_check_suite,
    overall_quality_report,
)
from aws_flight_data_pipeline_spark.operators.enrich import enrich
from aws_flight_data_pipeline_spark.operators.multimodal import (
    decode_assets,
    extract_features,
    sample_frames,
)
from aws_flight_data_pipeline_spark.operators.quality import score_quality
from aws_flight_data_pipeline_spark.operators.serving import flight_stats_payload
from aws_flight_data_pipeline_spark.sources.opensky import read_flight_records
from aws_flight_data_pipeline_spark.sources.testdata import load_table
from tests.flight_fixtures import NOW, PROCESSED_DDL


@pytest.fixture(scope="module")
def empty_processed(spark):
    return spark.createDataFrame([], schema=PROCESSED_DDL)


def test_empty_frame_through_quality_and_checks(spark, empty_processed):
    scored = score_quality(empty_processed, NOW)
    assert scored.count() == 0
    assert set(scored.columns) >= {"data_quality_score", "quality_grade", "should_quarantine"}
    # check suite on empty input: runs, scores are null-or-valid, report sane
    suite = batch_check_suite(empty_processed)
    rows = suite.collect()
    assert all(r["record_count"] == 0 for r in rows)
    report = overall_quality_report(suite).collect()[0]
    assert report["checks_run"] == len(rows)


def test_empty_frame_through_serving_payload(empty_processed):
    row = flight_stats_payload(empty_processed).collect()[0]
    assert row["total_aircraft"] == 0
    assert row["top_countries"] == []
    assert row["fastest_aircraft"] == []


def test_corrupt_json_is_skipped_not_fatal(spark, tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    (d / "good.json").write_text(
        '{"time": 1693401600, "states": [["abc123", "UAL1    ", "US", 1693401600, '
        "1693401600, -73.0, 40.0, 3048.0, false, 128.0, 90.0, 0.0, null, 3100.0, "
        '"7700", false, 0]]}'
    )
    (d / "corrupt.json").write_text('{"time": 169340, "states": [[[')  # truncated
    (d / "empty.json").write_text("")
    records = read_flight_records(spark, str(d))
    rows = records.filter(F.col("icao24").isNotNull()).collect()
    assert len(rows) == 1  # good record survives, corrupt/empty skipped
    assert rows[0]["icao24"] == "abc123"
    assert rows[0]["callsign"] == "UAL1"  # trimmed


def test_bad_sf_dir_raises_cleanly(spark):
    with pytest.raises(AnalysisException) as err:
        load_table(spark, "/root/testdata/sf-nonexistent", "lineitem").collect()
    assert "PATH_NOT_FOUND" in str(err.value)


def test_multimodal_operators_on_empty_input(spark):
    empty = spark.createDataFrame([], "asset_id long, modality string, payload binary")
    assert decode_assets(empty).count() == 0
    assert extract_features(empty).count() == 0
    assert sample_frames(empty).count() == 0


def test_enrich_tolerates_all_null_record(spark):
    from aws_flight_data_pipeline_spark.schemas import STATE_FIELDS

    ddl = ", ".join(f"{name} {dtype}" for name, dtype in STATE_FIELDS) + ", collection_time bigint"
    df = spark.createDataFrame([(None,) * (len(STATE_FIELDS) + 1)], ddl)
    out = enrich(df).collect()[0]
    assert out["altitude_category"] == "UNKNOWN"
    assert out["speed_category"] == "UNKNOWN"

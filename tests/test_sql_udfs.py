"""SQL-function surface: every registered SQL UDF must (a) exist, (b) match
its Column-builder twin value-for-value, and (c) inline into the plan — no
Python evaluation node, expression visible to codegen."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.functions.geo import (
    approx_distance_miles,
    bearing_cardinal,
    grid_cell,
    haversine,
)
from aws_flight_data_pipeline_spark.functions.sql_udfs import register_sql_functions
from aws_flight_data_pipeline_spark.functions.text import (
    bpe_ish_token_estimate,
    token_type_ratio,
    word_count,
)


@pytest.fixture(scope="module")
def udfs(spark):
    return set(register_sql_functions(spark))


def test_all_register(spark, udfs):
    assert {"haversine_km", "word_count", "md5_bucket", "ms_to_knots"} <= udfs


def _one(spark, sql_expr: str):
    return spark.sql(f"SELECT {sql_expr} AS v").collect()[0]["v"]


def test_geo_udfs_match_column_builders(spark, udfs):
    pts = [(40.6413, -73.7781, 51.47, -0.4543), (0.0, 0.0, 0.0, 1.0), (-33.9, 151.2, 35.6, 139.7)]
    df = spark.createDataFrame(pts, "lat1 double, lon1 double, lat2 double, lon2 double")
    df.createOrReplaceTempView("pts")
    got = spark.sql(
        "SELECT haversine_km(lat1, lon1, lat2, lon2) AS hk,"
        " haversine_miles(lat1, lon1, lat2, lon2) AS hm,"
        " approx_distance_miles(lat1, lon1, lat2, lon2) AS ad,"
        " bearing_cardinal(lat1, lon1, lat2, lon2) AS bc,"
        " grid_cell(lat1, lon1, 2.0) AS gc FROM pts"
    ).collect()
    lat1, lon1, lat2, lon2 = F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
    want = df.select(
        haversine(lat1, lon1, lat2, lon2).alias("hk"),
        haversine(lat1, lon1, lat2, lon2, radius=3959.0).alias("hm"),
        approx_distance_miles(lat1, lon1, lat2, lon2).alias("ad"),
        bearing_cardinal(lat1, lon1, lat2, lon2).alias("bc"),
        grid_cell(lat1, lon1).alias("gc"),
    ).collect()
    for g, w in zip(got, want):
        assert g["hk"] == w["hk"] and g["hm"] == w["hm"] and g["ad"] == w["ad"]
        assert g["bc"] == w["bc"] and g["gc"] == w["gc"]


def test_text_udfs_match_column_builders(spark, udfs):
    df = spark.createDataFrame(
        [("a b c a",), ("  ",), ("single",), ("the quick brown fox the",)], "t string"
    )
    df.createOrReplaceTempView("txts")
    got = spark.sql(
        "SELECT word_count(t) AS wc, bpe_token_estimate(t) AS te,"
        " CASE WHEN word_count(t) = 0 THEN NULL ELSE token_type_ratio(t) END AS tr"
        " FROM txts"
    ).collect()
    want = df.select(
        word_count(F.col("t")).alias("wc"),
        bpe_ish_token_estimate(F.col("t")).alias("te"),
        F.when(
            word_count(F.col("t")) != 0, token_type_ratio(F.col("t"))
        ).alias("tr"),
    ).collect()
    for g, w in zip(got, want):
        assert g["wc"] == w["wc"] and g["te"] == w["te"] and g["tr"] == w["tr"]


def test_unit_conversions(spark, udfs):
    r = spark.sql(
        "SELECT ms_to_knots(100.0) AS kt, ms_to_kmh(100.0) AS kmh,"
        " meters_to_feet(1000.0) AS ft, ms_to_fpm(5.0) AS fpm"
    ).collect()[0]
    assert r["kt"] == 100.0 * 1.94384 and r["kmh"] == 360.0
    assert r["ft"] == 1000.0 * 3.28084 and r["fpm"] == 5.0 * 196.850394


def test_md5_bucket_matches_engine_hash(spark, udfs):
    # the same md5-prefix integer used by dataset_split_assign
    got = _one(spark, "md5_bucket('42', 100)")
    want = (int(__import__("hashlib").md5(b"42").hexdigest()[:8], 16)) % 100
    assert got == want


def test_sql_udfs_inline_into_codegen(spark, udfs):
    # the UDF body substitutes into the caller's plan: no Python eval node,
    # and a constant call folds at plan time
    df = spark.sql("SELECT haversine_km(0, 0, 0, 1) AS d")
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "111.19" in plan  # constant-folded to the literal result

"""Batch-level data-quality check suite — the 16-check validator.

The reference runs 16 named checks over each processed file with pandas
(`data_transformation/data_quality_validator.py:34-51` check list, impls
`:80-843`, orchestration `:863-929`), each returning ``{passed, score}``, then
averages scores into an overall grade and alert decision.

Spark shape: TWO jobs total regardless of check count —
1. a tiny stats pass (percentiles / mean / stddev / time bounds) whose
   single-row result broadcasts back to the fact rows, and
2. one wide hash-aggregate computing every check's score simultaneously
   (each check is just an ``avg(indicator)`` expression), exploded into the
   (check_name, score, passed) result rows.

The reference's 16 sequential pandas passes collapse into one partial-agg
scan — the same suite costs one shuffle-free pass at 100 TB. Checks whose
columns are absent from the input are skipped (reported count varies with
schema), mirroring the reference's per-file applicability logic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.operators.quality import quality_grade

#: score >= threshold → check passes (data_quality_validator.py per-check
#: thresholds; 0.8 default, stricter for structural checks).
DEFAULT_THRESHOLD = 0.8
CHECK_THRESHOLDS = {
    "uniqueness": 0.95,
    "coordinate_validity": 0.9,
    "country_code": 0.9,
    "timestamp_consistency": 0.9,
}

ALERT_THRESHOLD = 0.7


def _frac(cond: Column) -> Column:
    """avg over rows of a boolean → the check's score in [0,1]."""
    return F.avg(F.when(cond, 1.0).otherwise(0.0))


def batch_check_suite(df: DataFrame) -> DataFrame:
    """Run every applicable check; returns (check_name, score, passed) rows.

    Expects the processed flight schema (any subset of its columns —
    inapplicable checks are skipped).
    """
    cols = set(df.columns)
    has = cols.__contains__

    # ---- pass 1: global stats the row-level checks compare against --------
    stats_aggs = []
    if has("baro_altitude_ft"):
        stats_aggs += [
            F.percentile_approx("baro_altitude_ft", 0.25).alias("alt_p25"),
            F.percentile_approx("baro_altitude_ft", 0.75).alias("alt_p75"),
            F.avg("baro_altitude_ft").alias("alt_mean"),
            F.stddev("baro_altitude_ft").alias("alt_std"),
        ]
    if has("velocity_knots"):
        stats_aggs += [
            F.percentile_approx("velocity_knots", 0.25).alias("spd_p25"),
            F.percentile_approx("velocity_knots", 0.75).alias("spd_p75"),
            F.avg("velocity_knots").alias("spd_mean"),
            F.stddev("velocity_knots").alias("spd_std"),
        ]
    if has("last_contact"):
        stats_aggs += [
            F.max("last_contact").alias("ts_max"),
            F.min("last_contact").alias("ts_min"),
        ]
    if stats_aggs:
        df = df.crossJoin(F.broadcast(df.agg(*stats_aggs)))

    # ---- pass 2: every check as one aggregate expression ------------------
    checks: list[tuple[str, Column]] = []
    alt, spd = F.col("baro_altitude_ft"), F.col("velocity_knots")
    lat, lon = F.col("latitude"), F.col("longitude")

    key_fields = [
        c
        for c in ("icao24", "latitude", "longitude", "baro_altitude_ft",
                  "velocity_knots", "callsign", "origin_country", "last_contact")
        if has(c)
    ]
    if key_fields:
        present = sum(
            (F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in key_fields),
            start=F.lit(0),
        )
        checks.append(("completeness", F.avg(present / F.lit(len(key_fields)))))

    if has("baro_altitude_ft") and has("velocity_knots") and has("latitude") and has("longitude"):
        checks.append(
            (
                "validity",
                _frac(
                    alt.isNotNull() & (alt >= -1000) & (alt <= 60000)
                    & spd.isNotNull() & (spd >= 0) & (spd <= 800)
                    & lat.between(-90, 90) & lon.between(-180, 180)
                ),
            )
        )
    if has("on_ground") and has("baro_altitude_ft"):
        og = F.col("on_ground")
        checks.append(
            ("consistency", _frac(F.when(og, alt <= 1000).otherwise(alt.isNotNull())))
        )
    if has("icao24") and has("last_contact"):
        checks.append(
            (
                "uniqueness",
                # try_divide: an empty batch is 0/0, which ANSI mode makes a
                # hard error instead of null
                F.try_divide(F.count_distinct(F.struct("icao24", "last_contact")), F.count("*")),
            )
        )
    if has("baro_altitude_ft") and has("velocity_knots"):
        checks.append(
            ("accuracy", _frac((F.abs(alt) < 1e7) & (F.abs(spd) < 1e4))),
        )
    if has("last_contact"):
        age = F.col("ts_max") - F.col("last_contact")
        checks.append(("timeliness", _frac(age <= 3600)))
        # 24-h batch window (timestamp_consistency): scalar post-agg score,
        # computed from the same stats row — expressed as an avg of a
        # row-constant so it slots into the single agg.
        span = F.col("ts_max") - F.col("ts_min")
        checks.append(
            (
                "timestamp_consistency",
                F.avg(F.when(span <= 86400, 1.0).otherwise(F.lit(86400.0) / span)),
            )
        )
    if has("baro_altitude_ft"):
        iqr = F.col("alt_p75") - F.col("alt_p25")
        checks.append(
            (
                "altitude_range",
                _frac(alt.between(F.col("alt_p25") - 3 * iqr, F.col("alt_p75") + 3 * iqr)),
            )
        )
        z = F.abs(alt - F.col("alt_mean")) / F.col("alt_std")
        checks.append(("anomaly_detection", _frac(F.col("alt_std").isNull() | (z <= 3))))
    if has("velocity_knots"):
        iqr_s = F.col("spd_p75") - F.col("spd_p25")
        checks.append(
            (
                "speed_range",
                _frac(spd.between(F.col("spd_p25") - 3 * iqr_s, F.col("spd_p75") + 3 * iqr_s)),
            )
        )
    if has("latitude") and has("longitude"):
        checks.append(
            (
                "coordinate_validity",
                _frac(
                    lat.between(-90, 90) & lon.between(-180, 180)
                    & ~((lat == 0.0) & (lon == 0.0))  # null island
                    & (lat != lon)  # copy-paste suspicion
                ),
            )
        )
        checks.append(
            (
                "position_accuracy",
                _frac((F.round(lat, 6) == lat) & (F.round(lon, 6) == lon)),
            )
        )
    if has("callsign"):
        cs = F.trim(F.col("callsign"))
        checks.append(
            ("callsign_format", _frac(cs.isNotNull() & (F.length(cs) > 0) & (F.length(cs) <= 8)))
        )
    if has("origin_country"):
        oc = F.col("origin_country")
        checks.append(("country_code", _frac(oc.isNotNull() & (F.length(oc) > 0))))
    if has("geo_altitude_ft") and has("baro_altitude_ft"):
        checks.append(
            (
                "altitude_consistency",
                _frac(
                    F.col("geo_altitude_ft").isNull()
                    | (F.abs(alt - F.col("geo_altitude_ft")) <= 1000)
                ),
            )
        )
    if has("on_ground") and has("velocity_knots"):
        og = F.col("on_ground")
        credit = (
            F.when(og, F.when(spd <= 60, 1.0).otherwise(0.0))
            .when(spd >= 80, 1.0)
            .when(spd >= 40, 0.5)
            .otherwise(0.0)
        )
        checks.append(("speed_consistency", F.avg(credit)))

    one_row = df.agg(
        *[F.round(expr, 4).alias(name) for name, expr in checks],
        F.count("*").alias("_n"),
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(name).alias("score"),
                (F.col(name) >= CHECK_THRESHOLDS.get(name, DEFAULT_THRESHOLD)).alias("passed"),
            )
            for name, _ in checks
        ]
    )
    return one_row.select(F.explode(entries).alias("c"), F.col("_n").alias("record_count")).select(
        "c.check_name", "c.score", "c.passed", "record_count"
    )


def overall_quality_report(check_results: DataFrame) -> DataFrame:
    """Suite → single-row report: mean score, A–F grade, alert flag
    (data_quality_validator.py:863-929's summary + alerting.py thresholds)."""
    agg = check_results.agg(
        F.round(F.avg("score"), 4).alias("overall_score"),
        F.count("*").alias("checks_run"),
        F.sum(F.when(F.col("passed"), 1).otherwise(0)).alias("checks_passed"),
        F.max("record_count").alias("record_count"),
    )
    return agg.select(
        "*",
        quality_grade(F.col("overall_score")).alias("grade"),
        (F.col("overall_score") < ALERT_THRESHOLD).alias("alert"),
    )

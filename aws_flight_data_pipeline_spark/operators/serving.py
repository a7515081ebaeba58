"""Serving-layer summary aggregation — the dashboard/API stats payload.

The reference serves a JSON stats payload by listing S3, sampling records in
Python, and hand-aggregating dicts (`api/get_flight_data.py:240-368`, with
duplicate implementations in `process_flight_data.py:129-242` and
`dashboard-api.py:88-205`). Here the whole payload is ONE Spark job: a wide
hash-aggregate plus two bounded top-k's, cross-joined as single-row frames
(the reference's own "LEFT JOIN ON 1=1" combining shape, 06:496-498).

Scale: the base aggregate is a partial-agg (map-side combine) over any number
of partitions; the top-k's plan as TakeOrderedAndProject (no full sort); the
final crossJoins combine three 1-row frames — nothing here grows with input
size except the scan itself. The reference's every-10th-record sampling
(`dashboard-api.py:88-205`) existed to fit Lambda memory; it is preserved only
as an optional parity knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.operators.enrich import altitude_category


def flight_stats_payload(
    processed: DataFrame, top_n: int = 10, sample_fraction: float | None = None
) -> DataFrame:
    """The API stats payload as a single-row DataFrame.

    Columns mirror the reference payload (`get_flight_data.py:319-368`):
    totals, airborne/ground split, country count, 4-band altitude
    distribution, speed stats, top-N countries, top-N fastest aircraft.
    ``sample_fraction`` reproduces the reference's sampling + scale-up
    estimate (`get_flight_data.py:261-262,319-326`); leave None for exact.
    """
    scale = 1.0
    if sample_fraction is not None:
        processed = processed.sample(fraction=sample_fraction, seed=42)
        scale = 1.0 / sample_fraction

    alt_cat = altitude_category(F.col("baro_altitude_ft"))
    airborne = ~F.col("on_ground")

    def scaled(c):
        return F.round(c * scale).cast("long")

    base = processed.agg(
        scaled(F.count("*")).alias("total_aircraft"),
        scaled(F.sum(F.when(airborne, 1).otherwise(0))).alias("airborne_count"),
        scaled(F.sum(F.when(F.col("on_ground"), 1).otherwise(0))).alias("ground_count"),
        F.countDistinct("origin_country").alias("countries_count"),
        scaled(F.sum(F.when(airborne & (alt_cat == "LOW"), 1).otherwise(0))).alias("alt_low"),
        scaled(F.sum(F.when(airborne & (alt_cat == "MEDIUM"), 1).otherwise(0))).alias(
            "alt_medium"
        ),
        scaled(F.sum(F.when(airborne & (alt_cat == "HIGH"), 1).otherwise(0))).alias("alt_high"),
        scaled(F.sum(F.when(airborne & (alt_cat == "VERY_HIGH"), 1).otherwise(0))).alias(
            "alt_very_high"
        ),
        F.round(F.avg(F.when(airborne, F.col("velocity_knots"))), 2).alias("avg_speed_knots"),
        F.round(F.max("velocity_knots"), 2).alias("max_speed_knots"),
        F.round(F.avg(F.when(airborne, F.col("baro_altitude_ft"))), 1).alias("avg_altitude_ft"),
    )

    top_countries = (
        processed.groupBy("origin_country")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "origin_country")
        .limit(top_n)
        .agg(
            F.collect_list(F.struct("origin_country", scaled(F.col("cnt")).alias("cnt"))).alias(
                "top_countries"
            )
        )
    )

    fastest = (
        processed.filter(airborne & F.col("velocity_knots").isNotNull())
        .orderBy(F.desc("velocity_knots"), "icao24")
        .limit(top_n)
        .agg(
            F.collect_list(F.struct("icao24", "callsign", "velocity_knots")).alias(
                "fastest_aircraft"
            )
        )
    )

    return base.crossJoin(top_countries).crossJoin(fastest)

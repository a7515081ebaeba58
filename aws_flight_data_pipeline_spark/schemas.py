"""Explicit StructType schemas for the flight-data model (SURVEY.md §1).

Schema-on-read everywhere: raw OpenSky JSON is read with a declared schema
(never inferred — inference is a full extra scan at 100 TB), and the processed
fact table's schema mirrors the reference's Hive DDL
(`sql/athena/03_create_processed_tables.sql:15-74`).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Raw OpenSky /states/all response: {"time": <unix>, "states": [[...17 fields...]]}.
# State vectors are positional heterogeneous arrays; declared as array<string>
# so the JSON reader coerces scalars, then decode_states casts positionally
# (the Spark analog of the reference's positional decode,
# flight_data_ingestion.py:276-293).
RAW_BATCH_SCHEMA = StructType(
    [
        StructField("time", LongType()),
        StructField("states", ArrayType(ArrayType(StringType()))),
    ]
)

# Positional layout of one state vector (02_create_raw_tables.sql:18-35).
STATE_FIELDS: tuple[tuple[str, str], ...] = (
    ("icao24", "string"),
    ("callsign", "string"),
    ("origin_country", "string"),
    ("time_position", "bigint"),
    ("last_contact", "bigint"),
    ("longitude", "double"),
    ("latitude", "double"),
    ("baro_altitude", "double"),  # meters
    ("on_ground", "boolean"),
    ("velocity", "double"),  # m/s
    ("true_track", "double"),
    ("vertical_rate", "double"),  # m/s
    ("sensors", "string"),  # array in source; kept opaque
    ("geo_altitude", "double"),  # meters
    ("squawk", "string"),
    ("spi", "boolean"),
    ("position_source", "int"),
)

# Flat decoded state-vector record (the enrichment input).
FLIGHT_RECORD_SCHEMA = StructType(
    [
        StructField("icao24", StringType()),
        StructField("callsign", StringType()),
        StructField("origin_country", StringType()),
        StructField("time_position", LongType()),
        StructField("last_contact", LongType()),
        StructField("longitude", DoubleType()),
        StructField("latitude", DoubleType()),
        StructField("baro_altitude", DoubleType()),
        StructField("on_ground", BooleanType()),
        StructField("velocity", DoubleType()),
        StructField("true_track", DoubleType()),
        StructField("vertical_rate", DoubleType()),
        StructField("sensors", StringType()),
        StructField("geo_altitude", DoubleType()),
        StructField("squawk", StringType()),
        StructField("spi", BooleanType()),
        StructField("position_source", IntegerType()),
        StructField("collection_time", LongType()),
    ]
)

# Processed analytical fact table (03_create_processed_tables.sql:15-74).
PROCESSED_SCHEMA = StructType(
    [
        StructField("icao24", StringType()),
        StructField("callsign", StringType()),
        StructField("origin_country", StringType()),
        StructField("collection_time", LongType()),
        StructField("position_time", LongType()),
        StructField("last_contact", LongType()),
        StructField("collection_datetime", StringType()),
        StructField("longitude", DoubleType()),
        StructField("latitude", DoubleType()),
        StructField("baro_altitude_m", DoubleType()),
        StructField("geo_altitude_m", DoubleType()),
        StructField("baro_altitude_ft", IntegerType()),
        StructField("geo_altitude_ft", IntegerType()),
        StructField("on_ground", BooleanType()),
        StructField("velocity_ms", DoubleType()),
        StructField("velocity_knots", DoubleType()),
        StructField("velocity_kmh", DoubleType()),
        StructField("true_track", DoubleType()),
        StructField("vertical_rate_ms", DoubleType()),
        StructField("vertical_rate_fpm", IntegerType()),
        StructField("squawk", StringType()),
        StructField("spi", BooleanType()),
        StructField("position_source", IntegerType()),
        StructField("sensor_count", IntegerType()),
        StructField("altitude_category", StringType()),
        StructField("speed_category", StringType()),
        StructField("flight_phase", StringType()),
        StructField("region_code", StringType()),
        StructField("data_quality_score", DoubleType()),
        StructField("completeness_score", DoubleType()),
        StructField("validity_score", DoubleType()),
        StructField("consistency_score", DoubleType()),
        StructField("quality_flags", ArrayType(StringType())),
        # partition columns (strings, matching year=YYYY directory semantics)
        StructField("year", StringType()),
        StructField("month", StringType()),
        StructField("day", StringType()),
        StructField("hour", StringType()),
    ]
)

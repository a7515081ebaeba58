"""SQL-function surface: the engine's scalar helpers as Spark SQL UDFs.

``register_sql_functions(spark)`` exposes the geo / unit / text Column
builders to SQL-workload users via ``CREATE TEMPORARY FUNCTION ... RETURN
<expr>`` — Spark SQL UDFs are expression-substituted at plan time (the body
inlines into the caller's plan, constant-folds, and stays inside whole-stage
codegen), so unlike ``spark.udf.register`` Python UDFs they cost nothing at
any scale. This is the migration surface for the reference's SQL workload
(`sql/athena/*.sql` call sites compute these inline; here they're named).

Bodies are kept textually in lockstep with the Column builders in
``functions/geo.py`` / ``functions/text.py`` / ``operators/enrich.py``;
equality is pinned builder-vs-UDF in ``tests/test_sql_udfs.py``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_WC = (
    "CASE WHEN LENGTH(TRIM(t)) = 0 THEN 0 "
    "ELSE LENGTH(TRIM(t)) - LENGTH(REPLACE(TRIM(t), ' ', '')) + 1 END"
)

_DEFINITIONS: tuple[tuple[str, str], ...] = (
    (
        "haversine_km",
        """(lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE) RETURNS DOUBLE RETURN
        2.0 * 6371.0 * ASIN(SQRT(
            POWER(SIN(RADIANS(lat2 - lat1) / 2), 2) +
            COS(RADIANS(lat1)) * COS(RADIANS(lat2))
              * POWER(SIN(RADIANS(lon2 - lon1) / 2), 2)))""",
    ),
    (
        "haversine_miles",
        """(lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE) RETURNS DOUBLE RETURN
        2.0 * 3959.0 * ASIN(SQRT(
            POWER(SIN(RADIANS(lat2 - lat1) / 2), 2) +
            COS(RADIANS(lat1)) * COS(RADIANS(lat2))
              * POWER(SIN(RADIANS(lon2 - lon1) / 2), 2)))""",
    ),
    (
        "approx_distance_miles",
        """(lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE) RETURNS DOUBLE RETURN
        SQRT(POWER(69.1 * (lat2 - lat1), 2)
             + POWER(69.1 * (lon2 - lon1) * COS(RADIANS(lat1)), 2))""",
    ),
    (
        "bearing_cardinal",
        """(lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE) RETURNS STRING RETURN
        CASE WHEN ABS(lat2 - lat1) >= ABS(lon2 - lon1)
             THEN CASE WHEN lat2 - lat1 >= 0 THEN 'N' ELSE 'S' END
             ELSE CASE WHEN lon2 - lon1 >= 0 THEN 'E' ELSE 'W' END END""",
    ),
    (
        "grid_cell",
        """(lat DOUBLE, lon DOUBLE, degrees DOUBLE) RETURNS STRING RETURN
        CONCAT_WS('_', CAST(ROUND(lat / degrees) * degrees AS STRING),
                       CAST(ROUND(lon / degrees) * degrees AS STRING))""",
    ),
    (
        "ms_to_knots",
        "(v DOUBLE) RETURNS DOUBLE RETURN v * 1.94384",
    ),
    (
        "ms_to_kmh",
        "(v DOUBLE) RETURNS DOUBLE RETURN v * 3.6",
    ),
    (
        "meters_to_feet",
        "(m DOUBLE) RETURNS DOUBLE RETURN m * 3.28084",
    ),
    (
        "word_count",
        f"(t STRING) RETURNS INT RETURN {_WC}",
    ),
    (
        "token_type_ratio",
        f"""(t STRING) RETURNS DOUBLE RETURN
        CAST(SIZE(ARRAY_DISTINCT(SPLIT(t, ' '))) AS DOUBLE)
          / CAST(({_WC}) AS DOUBLE)""",
    ),
    (
        "ms_to_fpm",
        "(v DOUBLE) RETURNS DOUBLE RETURN v * 196.850394",
    ),
    (
        "bpe_token_estimate",
        "(t STRING) RETURNS BIGINT RETURN CEIL(LENGTH(t) / 4.0)",
    ),
    (
        "md5_bucket",
        """(k STRING, m BIGINT) RETURNS BIGINT RETURN
        CAST(CONV(SUBSTRING(MD5(k), 1, 8), 16, 10) AS BIGINT) % m""",
    ),
)


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every SQL UDF (idempotent — OR REPLACE) and return the
    registered names."""
    names = []
    for name, body in _DEFINITIONS:
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
        names.append(name)
    return names

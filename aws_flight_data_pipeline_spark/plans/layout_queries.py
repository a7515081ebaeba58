"""Data-layout queries: Z-order clustering profile over the events stream.

Companion plan surface for :mod:`..operators.layout` — verifies the Morton
key math cross-engine (the key IS the layout: if the key matches, file
assignment under ``repartitionByRange`` is the same layout decision at any
scale) and reports the locality the layout buys, as exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.operators.layout import (
    morton_interleave,
    normalize_to_grid,
)
from aws_flight_data_pipeline_spark.plans.registry import builder
from aws_flight_data_pipeline_spark.sources.testdata import load_table

#: Grid resolution per dimension (8 bits -> 256 cells, 16-bit Z key).
_BITS = 8

#: Bucket = aligned 1024-cell Z block (key >> 10): a 32x32 grid square, so
#: within every bucket BOTH dimension spans are <= 31 cells by construction —
#: the locality contract the oracle pins.
_BUCKET_SHIFT = 10
_SPAN_MAX = 31


def _morton_sql(u: str, t: str, bits: int) -> str:
    """DuckDB twin of :func:`operators.layout.morton_interleave`."""
    terms = []
    for i in range(bits):
        terms.append(f"(({u} >> {i}) & 1) * {1 << (2 * i + 1)}")
        terms.append(f"(({t} >> {i}) & 1) * {1 << (2 * i)}")
    return " + ".join(terms)


_M = (1 << _BITS) - 1

_GRID_SQL = f"""coords AS (
            SELECT user_id,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) AS t_sec,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ), bounds AS (
            SELECT MIN(user_id) AS lo_u, MAX(user_id) AS hi_u,
                   MIN(t_sec)   AS lo_t, MAX(t_sec)   AS hi_t
            FROM coords
        ), grid AS (
            SELECT user_id, cents,
                   CASE WHEN hi_u <= lo_u THEN 0
                        ELSE CAST(FLOOR(CAST(user_id - lo_u AS DOUBLE) * {_M}
                                  / CAST(hi_u - lo_u AS DOUBLE)) AS BIGINT)
                   END AS ug,
                   CASE WHEN hi_t <= lo_t THEN 0
                        ELSE CAST(FLOOR(CAST(t_sec - lo_t AS DOUBLE) * {_M}
                                  / CAST(hi_t - lo_t AS DOUBLE)) AS BIGINT)
                   END AS tg
            FROM coords, bounds
        ), keyed AS (
            SELECT user_id, cents, ug, tg,
                   {_morton_sql('ug', 'tg', _BITS)} AS z
            FROM grid
        )"""


@builder(
    "zorder_locality_profile",
    tags=("layout", "zorder", "clustering", "scale"),
    doc="Z-order (Morton) clustering profile of events over the "
    "(user_id, event-time) plane: normalize both dimensions onto a "
    f"{1 << _BITS}-cell grid, interleave bits into a 16-bit Z key (pure "
    "shift/mask Column math — operators/layout.py), and profile the "
    f"aligned {1 << _BUCKET_SHIFT}-cell Z blocks a range-partitioned writer "
    "would map to files: events per block, distinct users, exact per-block "
    "min/max of both grid coordinates, cents-exact value totals, and the "
    f"locality contract flag (both spans <= {_SPAN_MAX} cells — a Z block "
    "is a 32x32 square, which is WHY row-group min/max stats stay tight on "
    "both dimensions at once). The key math is cross-engine exact, so the "
    "oracle verifies the layout decision itself, not a statistical proxy.",
    oracle=f"""
        WITH {_GRID_SQL}
        SELECT z // {1 << _BUCKET_SHIFT} AS bucket,
               CAST(COUNT(*) AS BIGINT)               AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               MIN(ug) AS u_cell_min, MAX(ug) AS u_cell_max,
               MIN(tg) AS t_cell_min, MAX(tg) AS t_cell_max,
               CAST(SUM(cents) AS BIGINT)             AS value_cents,
               CAST(CASE WHEN MAX(ug) - MIN(ug) <= {_SPAN_MAX}
                          AND MAX(tg) - MIN(tg) <= {_SPAN_MAX}
                         THEN 1 ELSE 0 END AS BIGINT) AS locality_ok
        FROM keyed
        GROUP BY bucket
        ORDER BY bucket
    """,
)
def zorder_locality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("ts").cast("double")).cast("long").alias("t_sec"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    bounds = e.agg(
        F.min("user_id").alias("lo_u"),
        F.max("user_id").alias("hi_u"),
        F.min("t_sec").alias("lo_t"),
        F.max("t_sec").alias("hi_t"),
    )
    grid = e.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "cents",
        normalize_to_grid(
            F.col("user_id"), F.col("lo_u"), F.col("hi_u"), _BITS
        ).alias("ug"),
        normalize_to_grid(
            F.col("t_sec"), F.col("lo_t"), F.col("hi_t"), _BITS
        ).alias("tg"),
    )
    keyed = grid.withColumn(
        "z", morton_interleave(F.col("ug"), F.col("tg"), _BITS)
    )
    return (
        keyed.groupBy(F.shiftright("z", _BUCKET_SHIFT).alias("bucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("ug").alias("u_cell_min"),
            F.max("ug").alias("u_cell_max"),
            F.min("tg").alias("t_cell_min"),
            F.max("tg").alias("t_cell_max"),
            F.sum("cents").cast("bigint").alias("value_cents"),
            F.when(
                (F.max("ug") - F.min("ug") <= _SPAN_MAX)
                & (F.max("tg") - F.min("tg") <= _SPAN_MAX),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("locality_ok"),
        )
        .orderBy("bucket")
    )

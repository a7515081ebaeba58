"""Readers for the driver-generated TPC-H-ish parquet tables.

These are plain partition-parallel parquet scans: Catalyst gets full pushdown
(column pruning + predicate pushdown into the parquet reader), so every query
built on top of them inherits scan-level optimization for free. At 100 TB the
same call reads a partitioned lake directory — Hive-style partition discovery
and pruning apply with no code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Columns written as parquet TIMESTAMP(NANOS), which Spark's reader rejects;
# read as nanos-since-epoch longs (legacy conf) and rebuild the timestamp with
# integer division (a double round-trip would lose precision at 1e18 nanos).
# Micros truncation matches how DuckDB reads the same nano column.
_NANO_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Timezone is pinned to UTC first so event-time fields
    (``events.ts``, ``orders.o_orderdate``) extract identically everywhere."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, ()):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register each as a temp view (for spark.sql use)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out

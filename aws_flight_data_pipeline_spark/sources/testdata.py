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

# Tables whose queries are COMPUTE-dense per row (hash signatures, n-gram
# folds, vector arithmetic) rather than scan/agg-dense. The driver writes each
# testdata table as ONE single-row-group parquet file — an unsplittable scan,
# so every downstream map stage would run on one core no matter how many the
# session has. For these tables we fan out with a key-hash repartition WHEN
# (and only when) the source yields fewer input splits than the session has
# cores. On a real multi-file/multi-row-group lake the condition is false and
# the scan stays exchange-free — this is single-split compensation, not a
# standing shuffle (the data moved here is the compressed corpus itself,
# megabytes, while the compute it parallelizes is the expensive part).
# Only the compute-dense corpora fan out. Measured (sf0.1, local[32]): the
# scan/agg-dense fact tables (lineitem, orders, events) LOSE from fan-out —
# their single-split scan + partial agg is already fast and the extra exchange
# costs more than the parallelism returns (+2.3 s over a 16-query slice).
_FAN_OUT_TABLES = {"documents": "doc_id", "embeddings": "vec_id"}

#: Module toggle: the plan-shape tests disable fan-out to pin the shapes a
#: properly-laid-out (multi-split) lake produces — the single-split
#: compensation exchange is not part of the at-scale plan contract.
FAN_OUT_ENABLED = True

#: (sf_dir, table) -> bool, computed once per process: probing the scan's
#: split count costs a physical-plan round trip, which multi-stage pipelines
#: that re-load the same table would otherwise pay on every plan build.
_FAN_OUT_DECISION: dict[tuple[str, str], bool] = {}


def _fan_out(df: DataFrame, sf_dir: str, name: str, key_col: str) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    key = (sf_dir, name)
    if key not in _FAN_OUT_DECISION:
        _FAN_OUT_DECISION[key] = df.rdd.getNumPartitions() < target
    if _FAN_OUT_DECISION[key]:
        # HASH partition on the table's unique key, not round-robin:
        # round-robin repartition locally sorts every column for determinism
        # (expensive on full document text) and its exchange isn't reusable;
        # a hash exchange on the key is cheap, deterministic, reused across
        # all consumers of the scan in one plan, and can even satisfy a
        # downstream groupBy/join on the same key outright.
        return df.repartition(target, F.col(key_col))
    return df

# Columns that SOME testdata generations write as parquet TIMESTAMP(NANOS),
# which Spark's reader rejects; with the legacy conf those surface as
# nanos-since-epoch longs and we rebuild the timestamp with integer division
# (a double round-trip would lose precision at 1e18 nanos). Micros truncation
# matches how DuckDB reads the same nano column. Newer generations write
# TIMESTAMP(MICROS), which Spark reads natively — the rebuild is applied only
# when the column actually scans as a long.
_NANO_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Timezone is pinned to UTC first so event-time fields
    (``events.ts``, ``orders.o_orderdate``) extract identically everywhere."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    dtypes = dict(df.dtypes)
    for col in _NANO_TS_COLS.get(name, ()):
        if dtypes.get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif dtypes.get(col) == "timestamp_ntz":
            # TIMESTAMP(MICROS, isAdjustedToUTC=false) generations scan as NTZ;
            # normalize to session-local TIMESTAMP (UTC pinned above) so epoch
            # arithmetic (cast to double/long) keeps working identically.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    if FAN_OUT_ENABLED and name in _FAN_OUT_TABLES:
        df = _fan_out(df, sf_dir, name, _FAN_OUT_TABLES[name])
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register each as a temp view (for spark.sql use)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out

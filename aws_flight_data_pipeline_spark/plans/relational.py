"""Relational analytical query inventory (SURVEY.md §2.2–§2.7 surface).

Each query re-expresses one operator family from the reference's Athena corpus
(`/root/reference/sql/athena/04–07*.sql`) as an idiomatic Spark DataFrame plan
over the driver's TPC-H-ish tables, paired with a DuckDB oracle.

Scale notes (100 TB posture):
- Dimension joins use explicit ``broadcast()`` hints — nation/region/customer
  style dims stay small at any fact-table scale, so no shuffle on the fact side.
- The band/theta join pre-filters with an equi-join key before applying the
  band predicate — the reference's ±1° airport-proximity pattern
  (`05_analytical_queries_part2.sql:145-196`) — keeping it a partitioned hash
  join instead of a cartesian product.
- Aggregations are plain groupBy().agg() → Spark's partial (map-side) + final
  hash aggregate; no driver-side collection anywhere.
- Top-k uses orderBy().limit() which Spark plans as TakeOrderedAndProject
  (per-partition heap + driver merge, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_flight_data_pipeline_spark.plans.registry import query
from aws_flight_data_pipeline_spark.sources.testdata import load_table


def _r4(c):
    return F.round(c, 4)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    tags=("agg", "filter", "flagship"),
    doc="TPC-H Q1-shaped scan→filter→hash-agg; covers the reference's batch "
    "summary aggregations (flight_data_processor.py:193-275).",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 4)                          AS sum_qty,
               ROUND(SUM(l_extendedprice), 4)                     AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)  AS sum_disc_price,
               ROUND(AVG(l_quantity), 4)                          AS avg_qty,
               ROUND(AVG(l_extendedprice), 4)                     AS avg_price,
               ROUND(AVG(l_discount), 4)                          AS avg_disc,
               COUNT(*)                                           AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2025-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2025-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r4(F.sum("l_quantity")).alias("sum_qty"),
            _r4(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_price"),
            _r4(F.avg("l_quantity")).alias("avg_qty"),
            _r4(F.avg("l_extendedprice")).alias("avg_price"),
            _r4(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "conditional_category_counts",
    tags=("agg", "pivot"),
    doc="Pivot-style SUM(CASE WHEN) conditional counts — the reference's "
    "altitude/speed/phase distribution pattern (04_analytical_queries.sql:47-63).",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS total_orders,
               SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS urgent_count,
               SUM(CASE WHEN o_orderpriority = '2-HIGH'   THEN 1 ELSE 0 END) AS high_count,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS normal_count,
               COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS big_ticket_count
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
)
def conditional_category_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    high = F.col("o_orderpriority") == "2-HIGH"
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("total_orders"),
            F.sum(F.when(urgent, 1).otherwise(0)).alias("urgent_count"),
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(urgent | high, 0).otherwise(1)).alias("normal_count"),
            F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias("big_ticket_count"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "percentile_stats",
    tags=("agg", "percentile"),
    doc="Exact interpolated percentiles p25/p50/p75/p95 — the reference's "
    "APPROX_PERCENTILE surface (04:119-120, 06:39-48) with deterministic exact "
    "quantiles for oracle parity; approx_percentile is the at-scale variant "
    "(see approx_distinct_counts).",
    oracle="""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
               ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50_price,
               ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price,
               ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
               ROUND(STDDEV_SAMP(l_extendedprice), 4)         AS price_stddev
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            _r4(F.percentile("l_extendedprice", F.lit(0.25))).alias("p25_price"),
            _r4(F.percentile("l_extendedprice", F.lit(0.50))).alias("p50_price"),
            _r4(F.percentile("l_extendedprice", F.lit(0.75))).alias("p75_price"),
            _r4(F.percentile("l_extendedprice", F.lit(0.95))).alias("p95_price"),
            _r4(F.stddev_samp("l_extendedprice")).alias("price_stddev"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "ratio_of_total",
    tags=("agg", "window"),
    doc="Ratio-of-total via windowed SUM over an unbounded frame "
    "(04_analytical_queries.sql:102).",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS order_count,
               ROUND(100.0 * COUNT(*) / SUM(COUNT(*)) OVER (), 4) AS pct_of_total
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def ratio_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy()
    return (
        o.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .withColumn("pct_of_total", _r4(100.0 * F.col("order_count") / F.sum("order_count").over(w)))
        .orderBy("o_orderpriority")
    )


@query(
    "having_group_filter",
    tags=("agg", "having"),
    doc="GROUP BY ... HAVING count floor (04:390, 05:62).",
    oracle="""
        SELECT p_brand,
               COUNT(*) AS part_count,
               ROUND(AVG(p_retailprice), 4) AS avg_price,
               ROUND(MIN(p_retailprice), 4) AS min_price,
               ROUND(MAX(p_retailprice), 4) AS max_price
        FROM part
        GROUP BY p_brand
        HAVING COUNT(*) >= 5
        ORDER BY p_brand
    """,
)
def having_group_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.count("*").alias("part_count"),
            _r4(F.avg("p_retailprice")).alias("avg_price"),
            _r4(F.min("p_retailprice")).alias("min_price"),
            _r4(F.max("p_retailprice")).alias("max_price"),
        )
        .filter(F.col("part_count") >= 5)
        .orderBy("p_brand")
    )


@query(
    "multilevel_rollup",
    tags=("agg", "rollup"),
    doc="Hourly→daily two-level aggregation — the reference's CTE "
    "hourly_stats→daily_stats rollup (07:377-401, 06:183-233).",
    oracle="""
        WITH hourly AS (
            SELECT strftime(ts, '%Y-%m-%d') AS event_day,
                   CAST(hour(ts) AS INT)    AS event_hour,
                   COUNT(*)                 AS hourly_events,
                   ROUND(SUM(value), 4)     AS hourly_value
            FROM events
            GROUP BY 1, 2
        )
        SELECT event_day,
               COUNT(*)                       AS active_hours,
               CAST(SUM(hourly_events) AS BIGINT) AS daily_events,
               ROUND(AVG(hourly_events), 4)   AS avg_hourly_events,
               CAST(MAX(hourly_events) AS BIGINT) AS peak_hourly_events,
               ROUND(SUM(hourly_value), 4)    AS daily_value
        FROM hourly
        GROUP BY event_day
        ORDER BY event_day
    """,
)
def multilevel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
        F.hour("ts").alias("event_hour"),
    ).agg(F.count("*").alias("hourly_events"), _r4(F.sum("value")).alias("hourly_value"))
    return (
        hourly.groupBy("event_day")
        .agg(
            F.count("*").alias("active_hours"),
            F.sum("hourly_events").alias("daily_events"),
            _r4(F.avg("hourly_events")).alias("avg_hourly_events"),
            F.max("hourly_events").alias("peak_hourly_events"),
            _r4(F.sum("hourly_value")).alias("daily_value"),
        )
        .orderBy("event_day")
    )


@query(
    "histogram_buckets",
    tags=("agg", "histogram"),
    doc="Athena histogram(col, n) rewrite — fixed-width bucketing + group count "
    "(07_optimization_guide.sql:163-164); Spark-side this is a single hash-agg.",
    oracle="""
        SELECT CAST(FLOOR(l_quantity / 5.0) AS BIGINT) AS bucket,
               COUNT(*) AS bucket_count,
               ROUND(MIN(l_quantity), 4) AS bucket_min,
               ROUND(MAX(l_quantity), 4) AS bucket_max
        FROM lineitem
        GROUP BY 1
        ORDER BY bucket
    """,
)
def histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("bucket", F.floor(F.col("l_quantity") / 5.0))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("bucket_count"),
            _r4(F.min("l_quantity")).alias("bucket_min"),
            _r4(F.max("l_quantity")).alias("bucket_max"),
        )
        .orderBy("bucket")
    )


@query(
    "distinct_counts",
    tags=("agg", "distinct"),
    doc="COUNT(DISTINCT) surface (04:43-44, 06:25-28) — exact for oracle parity.",
    oracle="""
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey)      AS unique_customers,
               COUNT(DISTINCT o_orderpriority) AS unique_priorities,
               COUNT(*)                        AS total_orders
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("unique_customers"),
            F.countDistinct("o_orderpriority").alias("unique_priorities"),
            F.count("*").alias("total_orders"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "approx_distinct_counts",
    tags=("agg", "approx"),
    # HLL sketches are engine-specific — values differ by design from any
    # oracle; driver records the rows-only check. This is the at-scale variant
    # of distinct_counts (07:132-133: APPROX_COUNT_DISTINCT for cost).
    oracle=None,
    doc="approx_count_distinct + approx percentile — the cheap-at-100TB "
    "variants of distinct_counts/percentile_stats (07:117-185).",
)
def approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.count("*").alias("row_count"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@query(
    "dim_join_rollup",
    tags=("join", "broadcast"),
    doc="Fact ⋈ small-dimension chain with broadcast hints — the reference's "
    "processed⋈aircraft_reference pattern (05:48-49, 07:205-224). At 100 TB the "
    "dims broadcast; zero fact-side shuffle before the agg.",
    oracle="""
        SELECT r.r_name AS region_name, n.n_name AS nation_name,
               COUNT(*) AS customer_count,
               ROUND(AVG(c.c_acctbal), 4) AS avg_acctbal,
               ROUND(SUM(c.c_acctbal), 4) AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
        ORDER BY region_name, nation_name
    """,
)
def dim_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("customer_count"),
            _r4(F.avg("c_acctbal")).alias("avg_acctbal"),
            _r4(F.sum("c_acctbal")).alias("total_acctbal"),
        )
        .orderBy("region_name", "nation_name")
    )


@query(
    "left_join_missing_dim",
    tags=("join", "left"),
    doc="LEFT join preserving unmatched rows — the reference's LEFT JOIN "
    "aircraft_reference with null-model rows (05:48-49); null-bucketed counts.",
    oracle="""
        SELECT c.c_mktsegment,
               COUNT(*)            AS customer_count,
               COUNT(o.o_orderkey) AS order_count,
               SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS customers_without_orders
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
)
def left_join_missing_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("customer_count"),
            F.count("o_orderkey").alias("order_count"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
                "customers_without_orders"
            ),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "band_proximity_join",
    tags=("join", "theta", "range"),
    doc="Equi-prefilter + band predicate theta join — the airport-proximity "
    "pattern (05:145-196): join on nation (the ±1° box analog) then band-filter "
    "on |acctbal delta| ≤ 100. Stays a hash join, never a cartesian product.",
    oracle="""
        SELECT n.n_name AS nation_name,
               COUNT(*) AS close_pairs,
               ROUND(AVG(ABS(c.c_acctbal - s.s_acctbal)), 4) AS avg_balance_gap,
               ROUND(MIN(ABS(c.c_acctbal - s.s_acctbal)), 4) AS min_balance_gap
        FROM customer c
        JOIN supplier s ON c.c_nationkey = s.s_nationkey
                       AND ABS(c.c_acctbal - s.s_acctbal) <= 100.0
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY nation_name
    """,
)
def band_proximity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    gap = F.abs(F.col("c_acctbal") - F.col("s_acctbal"))
    return (
        c.join(s, (F.col("c_nationkey") == F.col("s_nationkey")) & (gap <= 100.0))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("close_pairs"),
            _r4(F.avg(gap)).alias("avg_balance_gap"),
            _r4(F.min(gap)).alias("min_balance_gap"),
        )
        .orderBy("nation_name")
    )


@query(
    "latest_order_per_customer",
    tags=("join", "window", "qualify"),
    doc="QUALIFY ROW_NUMBER()=1 rewrite (07:266) — Spark has no QUALIFY, so "
    "window + filter; deterministic tiebreak on orderkey (SURVEY §7.3 hard-part 5).",
    oracle="""
        WITH ranked AS (
            SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS rn
            FROM orders
        )
        SELECT o_custkey, o_orderkey AS latest_orderkey,
               ROUND(o_totalprice, 4) AS latest_totalprice
        FROM ranked WHERE rn = 1
        ORDER BY o_custkey
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            _r4(F.col("o_totalprice")).alias("latest_totalprice"),
        )
        .orderBy("o_custkey")
    )


@query(
    "zscore_anomalies",
    tags=("join", "anomaly", "crossjoin"),
    doc="Scalar-stats cross join + z-score top-k — the reference's statistical "
    "anomaly query (04:483-537): one-row global stats broadcast to every row.",
    oracle="""
        WITH stats AS (
            SELECT AVG(o_totalprice) AS mean_price,
                   STDDEV_SAMP(o_totalprice) AS std_price
            FROM orders
        )
        SELECT o.o_orderkey,
               ROUND(o.o_totalprice, 4) AS totalprice,
               ROUND((o.o_totalprice - s.mean_price) / s.std_price, 4) AS price_zscore
        FROM orders o CROSS JOIN stats s
        WHERE ABS((o.o_totalprice - s.mean_price) / s.std_price) > 2.0
        ORDER BY ABS((o.o_totalprice - s.mean_price) / s.std_price) DESC, o.o_orderkey
        LIMIT 100
    """,
)
def zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    stats = o.agg(
        F.avg("o_totalprice").alias("mean_price"),
        F.stddev_samp("o_totalprice").alias("std_price"),
    )
    z = (F.col("o_totalprice") - F.col("mean_price")) / F.col("std_price")
    return (
        o.crossJoin(F.broadcast(stats))
        .withColumn("price_zscore_raw", z)
        .filter(F.abs(F.col("price_zscore_raw")) > 2.0)
        .orderBy(F.abs(F.col("price_zscore_raw")).desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            "o_orderkey",
            _r4(F.col("o_totalprice")).alias("totalprice"),
            _r4(F.col("price_zscore_raw")).alias("price_zscore"),
        )
    )


# ---------------------------------------------------------------------------
# Windows (SURVEY §2.5) and sorts/limits (§2.6)
# ---------------------------------------------------------------------------


@query(
    "nation_order_rank",
    tags=("window", "rank", "join"),
    doc="RANK over a global order on an aggregate — the traffic-rank pattern "
    "(04:251, 05:68-72).",
    oracle="""
        WITH nation_orders AS (
            SELECT n.n_name AS nation_name, COUNT(*) AS order_count,
                   ROUND(SUM(o.o_totalprice), 4) AS total_revenue
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        )
        SELECT nation_name, order_count, total_revenue,
               CAST(RANK() OVER (ORDER BY order_count DESC) AS INT)  AS volume_rank,
               CAST(DENSE_RANK() OVER (ORDER BY total_revenue DESC) AS INT) AS revenue_rank
        FROM nation_orders
        ORDER BY volume_rank, nation_name
    """,
)
def nation_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    agg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count("*").alias("order_count"), _r4(F.sum("o_totalprice")).alias("total_revenue"))
    )
    return (
        agg.withColumn("volume_rank", F.rank().over(Window.orderBy(F.desc("order_count"))))
        .withColumn("revenue_rank", F.dense_rank().over(Window.orderBy(F.desc("total_revenue"))))
        .orderBy("volume_rank", "nation_name")
    )


@query(
    "moving_average_daily",
    tags=("window", "frame"),
    doc="Centered moving average with an explicit ROWS frame — the reference's "
    "5-hour trend window (04:253-256, 07:302-307).",
    oracle="""
        WITH daily AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_day,
                   COUNT(*) AS order_count,
                   ROUND(SUM(o_totalprice), 4) AS daily_revenue
            FROM orders
            GROUP BY 1
        )
        SELECT order_day, order_count, daily_revenue,
               ROUND(AVG(order_count) OVER (
                   ORDER BY order_day ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 4)
                   AS moving_avg_orders
        FROM daily
        ORDER BY order_day
    """,
)
def moving_average_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day")).agg(
        F.count("*").alias("order_count"), _r4(F.sum("o_totalprice")).alias("daily_revenue")
    )
    w = Window.orderBy("order_day").rowsBetween(-2, 2)
    return daily.withColumn("moving_avg_orders", _r4(F.avg("order_count").over(w))).orderBy(
        "order_day"
    )


@query(
    "day_over_day_lag",
    tags=("window", "lag"),
    doc="LAG + delta + guarded pct-change — the prev-day quality trend pattern "
    "(05:533-537) with NULLIF division guard (04:168-169).",
    oracle="""
        WITH daily AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_day,
                   ROUND(SUM(o_totalprice), 4) AS daily_revenue
            FROM orders
            GROUP BY 1
        )
        SELECT order_day, daily_revenue,
               ROUND(daily_revenue - LAG(daily_revenue) OVER (ORDER BY order_day), 4)
                   AS revenue_delta,
               ROUND(100.0 * (daily_revenue - LAG(daily_revenue) OVER (ORDER BY order_day))
                     / NULLIF(LAG(daily_revenue) OVER (ORDER BY order_day), 0), 4)
                   AS revenue_pct_change
        FROM daily
        ORDER BY order_day
    """,
)
def day_over_day_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day")).agg(
        _r4(F.sum("o_totalprice")).alias("daily_revenue")
    )
    w = Window.orderBy("order_day")
    prev = F.lag("daily_revenue").over(w)
    return (
        daily.withColumn("revenue_delta", _r4(F.col("daily_revenue") - prev))
        .withColumn(
            "revenue_pct_change",
            _r4(100.0 * (F.col("daily_revenue") - prev) / F.nullif(prev, F.lit(0))),
        )
        .orderBy("order_day")
    )


@query(
    "peak_hour_per_day",
    tags=("window", "agg"),
    doc="MAX(COUNT(*)) OVER partition — the peak-hour-flights pattern "
    "(06_analytics_views.sql:203-204).",
    oracle="""
        WITH hourly AS (
            SELECT strftime(ts, '%Y-%m-%d') AS event_day,
                   CAST(hour(ts) AS INT) AS event_hour,
                   COUNT(*) AS event_count
            FROM events
            GROUP BY 1, 2
        )
        SELECT event_day, event_hour, event_count,
               CAST(MAX(event_count) OVER (PARTITION BY event_day) AS BIGINT) AS peak_hour_events,
               CASE WHEN event_count = MAX(event_count) OVER (PARTITION BY event_day)
                    THEN 1 ELSE 0 END AS is_peak_hour
        FROM hourly
        ORDER BY event_day, event_hour
    """,
)
def peak_hour_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
        F.hour("ts").alias("event_hour"),
    ).agg(F.count("*").alias("event_count"))
    w = Window.partitionBy("event_day")
    peak = F.max("event_count").over(w)
    return (
        hourly.withColumn("peak_hour_events", peak)
        .withColumn("is_peak_hour", F.when(F.col("event_count") == peak, 1).otherwise(0))
        .orderBy("event_day", "event_hour")
    )


@query(
    "topk_line_items",
    tags=("sort", "limit", "topk"),
    doc="ORDER BY ... LIMIT top-k with deterministic tiebreak — Spark plans "
    "TakeOrderedAndProject (per-partition heaps, no global sort) (SURVEY §2.6).",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice, 4) AS extendedprice,
               ROUND(l_quantity, 4)      AS quantity,
               l_returnflag
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 100
    """,
)
def topk_line_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(100)
        .select(
            "l_orderkey",
            "l_linenumber",
            _r4(F.col("l_extendedprice")).alias("extendedprice"),
            _r4(F.col("l_quantity")).alias("quantity"),
            "l_returnflag",
        )
    )


# ---------------------------------------------------------------------------
# Scalar-function surface (SURVEY §2.7)
# ---------------------------------------------------------------------------


@query(
    "string_function_suite",
    tags=("scalar", "string"),
    doc="LPAD/CONCAT/TRIM/UPPER/SUBSTRING/LENGTH/CONTAINS — the reference's "
    "string surface (04:160,267,570-578; flight_data_processor.py:157-164: "
    "callsign normalize + 3-char airline-code extraction).",
    oracle="""
        SELECT c_custkey,
               UPPER(TRIM(c_name))                         AS name_upper,
               SUBSTRING(TRIM(c_name), 1, 8)               AS name_prefix,
               LPAD(CAST(c_custkey AS VARCHAR), 10, '0')   AS padded_key,
               c_mktsegment || '#' || CAST(c_nationkey AS VARCHAR) AS segment_tag,
               CAST(LENGTH(c_name) AS INT)                 AS name_len,
               CASE WHEN contains(c_name, '1') THEN 1 ELSE 0 END AS has_digit_one
        FROM customer
        ORDER BY c_custkey
    """,
)
def string_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.trim(F.col("c_name"))).alias("name_upper"),
        F.substring(F.trim(F.col("c_name")), 1, 8).alias("name_prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")).alias(
            "segment_tag"
        ),
        F.length("c_name").alias("name_len"),
        F.when(F.col("c_name").contains("1"), 1).otherwise(0).alias("has_digit_one"),
    ).orderBy("c_custkey")


@query(
    "datetime_function_suite",
    tags=("scalar", "datetime"),
    doc="year/month/day/hour extraction + the reference's deliberate "
    "day-of-week approximation ((day-1)%7)+1 (04:260, 06:193) kept verbatim "
    "for parity.",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INT)    AS order_year,
               CAST(month(o_orderdate) AS INT)   AS order_month,
               CAST(((day(o_orderdate) - 1) % 7) + 1 AS INT) AS approx_dow,
               COUNT(*) AS order_count,
               ROUND(SUM(o_totalprice), 4) AS revenue
        FROM orders
        GROUP BY 1, 2, 3
        ORDER BY order_year, order_month, approx_dow
    """,
)
def datetime_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            (((F.dayofmonth("o_orderdate") - 1) % 7) + 1).alias("approx_dow"),
        )
        .agg(F.count("*").alias("order_count"), _r4(F.sum("o_totalprice")).alias("revenue"))
        .orderBy("order_year", "order_month", "approx_dow")
    )


@query(
    "math_function_suite",
    tags=("scalar", "math"),
    doc="ROUND/ABS/SQRT/POW/GREATEST/modulo surface (04:102,335-336,517-518,589).",
    oracle="""
        SELECT l_linenumber,
               COUNT(*) AS cnt,
               ROUND(AVG(SQRT(l_extendedprice)), 4)                      AS avg_sqrt_price,
               ROUND(AVG(POW(l_discount, 2)), 4)                         AS avg_disc_sq,
               ROUND(AVG(ABS(l_extendedprice - l_quantity * 1000)), 4)   AS avg_abs_gap,
               ROUND(AVG(GREATEST(l_tax, l_discount)), 4)                AS avg_max_rate,
               ROUND(AVG(CAST(l_orderkey % 10 AS DOUBLE)), 4)            AS avg_key_mod
        FROM lineitem
        GROUP BY l_linenumber
        ORDER BY l_linenumber
    """,
)
def math_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linenumber")
        .agg(
            F.count("*").alias("cnt"),
            _r4(F.avg(F.sqrt("l_extendedprice"))).alias("avg_sqrt_price"),
            _r4(F.avg(F.pow("l_discount", 2))).alias("avg_disc_sq"),
            _r4(F.avg(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000))).alias(
                "avg_abs_gap"
            ),
            _r4(F.avg(F.greatest("l_tax", "l_discount"))).alias("avg_max_rate"),
            _r4(F.avg((F.col("l_orderkey") % 10).cast("double"))).alias("avg_key_mod"),
        )
        .orderBy("l_linenumber")
    )


@query(
    "case_bucketing",
    tags=("scalar", "case"),
    doc="CASE WHEN banding + GROUP BY the derived band — the altitude-band "
    "distribution query shape (04:82-146), the reference's flagship pattern.",
    oracle="""
        SELECT CASE WHEN o_totalprice < 50000  THEN 'Low'
                    WHEN o_totalprice < 150000 THEN 'Medium'
                    WHEN o_totalprice < 300000 THEN 'High'
                    ELSE 'Very High' END AS price_band,
               COUNT(*) AS order_count,
               COUNT(DISTINCT o_custkey) AS unique_customers,
               ROUND(AVG(o_totalprice), 4) AS avg_price,
               ROUND(MIN(o_totalprice), 4) AS min_price,
               ROUND(MAX(o_totalprice), 4) AS max_price
        FROM orders
        GROUP BY 1
        ORDER BY min_price
    """,
)
def case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "Low")
        .when(F.col("o_totalprice") < 150000, "Medium")
        .when(F.col("o_totalprice") < 300000, "High")
        .otherwise("Very High")
    )
    return (
        o.groupBy(band.alias("price_band"))
        .agg(
            F.count("*").alias("order_count"),
            F.countDistinct("o_custkey").alias("unique_customers"),
            _r4(F.avg("o_totalprice")).alias("avg_price"),
            _r4(F.min("o_totalprice")).alias("min_price"),
            _r4(F.max("o_totalprice")).alias("max_price"),
        )
        .orderBy("min_price")
    )


@query(
    "salted_skew_aggregate",
    tags=("agg", "skew", "scale"),
    doc="Skew-proof two-phase aggregation (functions/skew.py): salt the key, "
    "partial-aggregate per (key, salt), merge per key. The oracle is the "
    "PLAIN group-by — proving the salted rewrite is result-identical while "
    "spreading a hot key over n_salts reducers at 100 TB. AQE splits skewed "
    "JOINS automatically; this is the aggregation-side counterpart.",
    oracle="""
        SELECT event_type,
               ROUND(SUM(value), 4) AS sum_value,
               COUNT(value) AS cnt,
               ROUND(SUM(value) / COUNT(value), 4) AS avg_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def salted_skew_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_flight_data_pipeline_spark.functions.skew import salted_sum_count

    e = load_table(spark, sf_dir, "events")
    return (
        salted_sum_count(e, ["event_type"], "value", n_salts=16)
        .select(
            "event_type",
            _r4(F.col("sum_value")).alias("sum_value"),
            "cnt",
            _r4(F.col("avg_value")).alias("avg_value"),
        )
        .orderBy("event_type")
    )


@query(
    "rollup_subtotals",
    tags=("agg", "rollup"),
    doc="ROLLUP subtotal hierarchy (grand total → per-flag → per-flag-status) "
    "— parity-plus: the reference has no grouping sets (SURVEY §2.4 note), "
    "Spark and the oracle both support them natively. One pass produces every "
    "subtotal level (vs the reference's chained CTE re-aggregations).",
    oracle="""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS row_count,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               ROUND(SUM(l_extendedprice), 4) AS sum_price
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus
    """,
)
def rollup_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("row_count"),
            _r4(F.sum("l_quantity")).alias("sum_qty"),
            _r4(F.sum("l_extendedprice")).alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "row_count",
            "sum_qty",
            "sum_price",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "window_distribution_functions",
    tags=("window", "distribution"),
    doc="Distribution window functions — ntile quartiles, percent_rank, "
    "cume_dist over order value per nation (parity-plus: the reference uses "
    "only rank/row_number/lag; these complete Spark's §2.5 window surface). "
    "Aggregated to per-(nation, quartile) bands so the result is compact at "
    "any scale.",
    oracle="""
        WITH ranked AS (
            SELECT c_nationkey,
                   o_totalprice,
                   NTILE(4) OVER w AS quartile,
                   PERCENT_RANK() OVER w AS pr,
                   CUME_DIST() OVER w AS cd
            FROM orders JOIN customer ON o_custkey = c_custkey
            WINDOW w AS (PARTITION BY c_nationkey ORDER BY o_totalprice, o_orderkey)
        )
        SELECT c_nationkey, quartile,
               COUNT(*) AS order_count,
               ROUND(MIN(o_totalprice), 4) AS min_price,
               ROUND(MAX(o_totalprice), 4) AS max_price,
               ROUND(MAX(pr), 4) AS max_percent_rank,
               ROUND(MAX(cd), 4) AS max_cume_dist
        FROM ranked
        GROUP BY c_nationkey, quartile
        ORDER BY c_nationkey, quartile
    """,
)
def window_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_nationkey").orderBy("o_totalprice", "o_orderkey")
    ranked = joined.select(
        "c_nationkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return (
        ranked.groupBy("c_nationkey", "quartile")
        .agg(
            F.count("*").alias("order_count"),
            _r4(F.min("o_totalprice")).alias("min_price"),
            _r4(F.max("o_totalprice")).alias("max_price"),
            _r4(F.max("pr")).alias("max_percent_rank"),
            _r4(F.max("cd")).alias("max_cume_dist"),
        )
        .orderBy("c_nationkey", "quartile")
    )

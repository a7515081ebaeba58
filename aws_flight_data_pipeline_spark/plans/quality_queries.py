"""Data-quality & anomaly operators (SURVEY.md §2.9) over the testdata tables.

The reference scores each record on completeness/validity/consistency/
timeliness with per-record Python loops (`quality_validator.py:196-710`) and
detects anomalies record-by-record (`anomaly_detector.py:228-563`). Here every
score is a vectorized column expression over the whole DataFrame and every
"suite" is a single hash-aggregate — one pass, partition-parallel, no per-row
Python.

Determinism: missing data is injected at fixed event_id residues; the
"current time" for timeliness is an injected constant (SURVEY §7.3: never
current_timestamp in scored paths).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.plans.registry import query
from aws_flight_data_pipeline_spark.sources.testdata import load_table


def _r4(c):
    return F.round(c, 4)


QUALITY_NOW_SQL = "TIMESTAMP '2024-07-01 00:00:00'"
QUALITY_NOW = "2024-07-01 00:00:00"

# Injected-gap residues (shared by Spark plans and oracle SQL).
_VALUE_GAP, _PROPS_GAP, _TYPE_GAP = 7, 5, 11

KNOWN_EVENT_TYPES = ("click", "view", "purchase", "signup", "error", "login", "logout")


def _gapped(e: DataFrame) -> DataFrame:
    return (
        e.withColumn(
            "value_g",
            F.when(F.col("event_id") % _VALUE_GAP == 0, F.lit(None).cast("double")).otherwise(
                F.col("value")
            ),
        )
        .withColumn(
            "props_g",
            F.when(F.col("event_id") % _PROPS_GAP == 0, F.lit(None).cast("string")).otherwise(
                F.col("props")
            ),
        )
        .withColumn(
            "type_g",
            F.when(F.col("event_id") % _TYPE_GAP == 0, F.lit(None).cast("string")).otherwise(
                F.col("event_type")
            ),
        )
    )


_GAPPED_SQL = f"""
    SELECT *,
           CASE WHEN event_id % {_VALUE_GAP} = 0 THEN NULL ELSE value END      AS value_g,
           CASE WHEN event_id % {_PROPS_GAP} = 0 THEN NULL ELSE props END      AS props_g,
           CASE WHEN event_id % {_TYPE_GAP} = 0 THEN NULL ELSE event_type END  AS type_g
    FROM events
"""


def completeness_score() -> Column:
    """Weighted field-presence score — critical field 0.5, important 0.3,
    optional 0.2 (the reference's critical/important penalty model,
    quality_validator.py:284-332)."""
    return (
        F.when(F.col("value_g").isNotNull(), 0.5).otherwise(0.0)
        + F.when(F.col("props_g").isNotNull(), 0.3).otherwise(0.0)
        + F.when(F.col("type_g").isNotNull(), 0.2).otherwise(0.0)
    )


_COMPLETENESS_SQL = """
    (CASE WHEN value_g IS NOT NULL THEN 0.5 ELSE 0.0 END
     + CASE WHEN props_g IS NOT NULL THEN 0.3 ELSE 0.0 END
     + CASE WHEN type_g IS NOT NULL THEN 0.2 ELSE 0.0 END)
"""


def validity_score() -> Column:
    """1 − failed/checked over four range/format checks (the reference's
    altitude/velocity/coordinate/icao24 check model, quality_validator.py:334-522)."""
    known = F.col("event_type").isin(*KNOWN_EVENT_TYPES)
    checks = (
        F.when((F.col("value") >= 0) & (F.col("value") <= 250), 0).otherwise(1)
        + F.when(F.year("ts") == 2024, 0).otherwise(1)
        + F.when(known, 0).otherwise(1)
        + F.when(F.col("user_id") >= 0, 0).otherwise(1)
    )
    return 1.0 - checks / F.lit(4.0)


_KNOWN_TYPES_SQL = "('" + "','".join(KNOWN_EVENT_TYPES) + "')"
_VALIDITY_SQL = f"""
    (1.0 - (CASE WHEN value >= 0 AND value <= 250 THEN 0 ELSE 1 END
            + CASE WHEN year(ts) = 2024 THEN 0 ELSE 1 END
            + CASE WHEN event_type IN {_KNOWN_TYPES_SQL} THEN 0 ELSE 1 END
            + CASE WHEN user_id >= 0 THEN 0 ELSE 1 END) / 4.0)
"""


def timeliness_score(now_ts: Column) -> Column:
    """Freshness decay vs an injected now (quality_validator.py:636-710):
    ≤1 h → 1.0; ≤1 d → linear 1.0→0.5; ≤7 d → linear 0.5→0.2; else 0.2."""
    age = now_ts.cast("double") - F.col("ts").cast("double")
    day, week = 86400.0, 604800.0
    return (
        F.when(age <= 3600.0, 1.0)
        .when(age <= day, 1.0 - 0.5 * (age - 3600.0) / (day - 3600.0))
        .when(age <= week, 0.5 - 0.3 * (age - day) / (week - day))
        .otherwise(0.2)
    )


_TIMELINESS_SQL = f"""
    (CASE WHEN epoch({QUALITY_NOW_SQL}) - epoch(ts) <= 3600.0 THEN 1.0
          WHEN epoch({QUALITY_NOW_SQL}) - epoch(ts) <= 86400.0
               THEN 1.0 - 0.5 * (epoch({QUALITY_NOW_SQL}) - epoch(ts) - 3600.0) / (86400.0 - 3600.0)
          WHEN epoch({QUALITY_NOW_SQL}) - epoch(ts) <= 604800.0
               THEN 0.5 - 0.3 * (epoch({QUALITY_NOW_SQL}) - epoch(ts) - 86400.0) / (604800.0 - 86400.0)
          ELSE 0.2 END)
"""


@query(
    "quality_completeness",
    tags=("quality", "agg"),
    doc="Batch completeness metrics per event type — weighted presence score "
    "+ fully-complete ratio (quality_validator.py:284-332 as one hash-agg).",
    oracle=f"""
        WITH gapped AS ({_GAPPED_SQL})
        SELECT event_type,
               COUNT(*) AS record_count,
               ROUND(AVG({_COMPLETENESS_SQL}), 4) AS avg_completeness,
               SUM(CASE WHEN value_g IS NULL THEN 1 ELSE 0 END)  AS missing_value_count,
               SUM(CASE WHEN props_g IS NULL THEN 1 ELSE 0 END)  AS missing_props_count,
               ROUND(AVG(CASE WHEN value_g IS NOT NULL AND props_g IS NOT NULL
                              AND type_g IS NOT NULL THEN 1.0 ELSE 0.0 END), 4)
                   AS fully_complete_ratio
        FROM gapped
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def quality_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _gapped(load_table(spark, sf_dir, "events"))
    fully = (
        F.col("value_g").isNotNull() & F.col("props_g").isNotNull() & F.col("type_g").isNotNull()
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("record_count"),
            _r4(F.avg(completeness_score())).alias("avg_completeness"),
            F.sum(F.when(F.col("value_g").isNull(), 1).otherwise(0)).alias("missing_value_count"),
            F.sum(F.when(F.col("props_g").isNull(), 1).otherwise(0)).alias("missing_props_count"),
            _r4(F.avg(F.when(fully, 1.0).otherwise(0.0))).alias("fully_complete_ratio"),
        )
        .orderBy("event_type")
    )


@query(
    "quality_validity",
    tags=("quality", "agg"),
    doc="Batch validity metrics — 1−failed/checked score plus per-check "
    "failure counts (quality_validator.py:334-522).",
    oracle=f"""
        SELECT event_type,
               COUNT(*) AS record_count,
               ROUND(AVG({_VALIDITY_SQL}), 4) AS avg_validity,
               SUM(CASE WHEN value < 0 OR value > 250 THEN 1 ELSE 0 END) AS range_failures,
               SUM(CASE WHEN year(ts) <> 2024 THEN 1 ELSE 0 END)         AS temporal_failures,
               ROUND(MIN({_VALIDITY_SQL}), 4) AS min_validity
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def quality_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = validity_score()
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("record_count"),
            _r4(F.avg(v)).alias("avg_validity"),
            F.sum(
                F.when((F.col("value") < 0) | (F.col("value") > 250), 1).otherwise(0)
            ).alias("range_failures"),
            F.sum(F.when(F.year("ts") != 2024, 1).otherwise(0)).alias("temporal_failures"),
            _r4(F.min(v)).alias("min_validity"),
        )
        .orderBy("event_type")
    )


@query(
    "quality_grade_distribution",
    tags=("quality", "grade"),
    doc="Weighted overall score → A–F letter grade distribution "
    "(quality_validator.py:249-257,770-781: weights .30/.30/.25/.15; "
    "A≥.95 B≥.85 C≥.70 D≥.50 else F).",
    oracle=f"""
        WITH gapped AS ({_GAPPED_SQL}),
        scored AS (
            SELECT event_type,
                   0.30 * {_COMPLETENESS_SQL} + 0.30 * {_VALIDITY_SQL}
                   + 0.25 * {_TIMELINESS_SQL} + 0.15 * 1.0 AS overall
            FROM gapped
        )
        SELECT event_type,
               CASE WHEN overall >= 0.95 THEN 'A'
                    WHEN overall >= 0.85 THEN 'B'
                    WHEN overall >= 0.70 THEN 'C'
                    WHEN overall >= 0.50 THEN 'D'
                    ELSE 'F' END AS grade,
               COUNT(*) AS record_count,
               ROUND(AVG(overall), 4) AS avg_overall
        FROM scored
        GROUP BY 1, 2
        ORDER BY event_type, grade
    """,
)
def quality_grade_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _gapped(load_table(spark, sf_dir, "events"))
    overall = (
        0.30 * completeness_score()
        + 0.30 * validity_score()
        + 0.25 * timeliness_score(F.lit(QUALITY_NOW).cast("timestamp"))
        + 0.15 * F.lit(1.0)
    )
    e = e.withColumn("overall", overall)
    grade = (
        F.when(F.col("overall") >= 0.95, "A")
        .when(F.col("overall") >= 0.85, "B")
        .when(F.col("overall") >= 0.70, "C")
        .when(F.col("overall") >= 0.50, "D")
        .otherwise("F")
    )
    return (
        e.groupBy("event_type", grade.alias("grade"))
        .agg(F.count("*").alias("record_count"), _r4(F.avg("overall")).alias("avg_overall"))
        .orderBy("event_type", "grade")
    )


@query(
    "quality_quarantine_split",
    tags=("quality", "quarantine"),
    doc="Quarantine decision + split counts — score < 0.30 or critical issue "
    "(quality_validator.py:808-820, quarantine_system.py:238-336). In the "
    "pipeline this boolean drives two filtered writes (clean/quarantine paths).",
    oracle=f"""
        WITH gapped AS ({_GAPPED_SQL}),
        scored AS (
            SELECT event_type,
                   0.30 * {_COMPLETENESS_SQL} + 0.30 * {_VALIDITY_SQL}
                   + 0.25 * {_TIMELINESS_SQL} + 0.15 * 1.0 AS overall,
                   CASE WHEN value_g IS NULL OR value > 250 THEN 1 ELSE 0 END AS critical_issue
            FROM gapped
        )
        SELECT event_type,
               COUNT(*) AS total_records,
               SUM(CASE WHEN overall < 0.30 OR critical_issue = 1 THEN 1 ELSE 0 END)
                   AS quarantined,
               SUM(CASE WHEN overall < 0.30 OR critical_issue = 1 THEN 0 ELSE 1 END)
                   AS clean,
               ROUND(AVG(CASE WHEN overall < 0.30 OR critical_issue = 1 THEN 1.0 ELSE 0.0 END), 4)
                   AS quarantine_rate
        FROM scored
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def quality_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _gapped(load_table(spark, sf_dir, "events"))
    overall = (
        0.30 * completeness_score()
        + 0.30 * validity_score()
        + 0.25 * timeliness_score(F.lit(QUALITY_NOW).cast("timestamp"))
        + 0.15 * F.lit(1.0)
    )
    critical = F.when(F.col("value_g").isNull() | (F.col("value") > 250), 1).otherwise(0)
    quarantine = (overall < 0.30) | (critical == 1)
    return (
        e.withColumn("overall", overall)
        .withColumn("critical_issue", critical)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("total_records"),
            F.sum(F.when(quarantine, 1).otherwise(0)).alias("quarantined"),
            F.sum(F.when(quarantine, 0).otherwise(1)).alias("clean"),
            _r4(F.avg(F.when(quarantine, 1.0).otherwise(0.0))).alias("quarantine_rate"),
        )
        .orderBy("event_type")
    )


_SUITE_KNOWN_SQL = "('" + "','".join(KNOWN_EVENT_TYPES) + "')"


@query(
    "quality_check_suite",
    tags=("quality", "suite"),
    doc="The batch check-suite shape (data_quality_validator.py:34-929, see "
    "operators/batch_checks.py for the flight-schema version): one tiny stats "
    "pass broadcast back to the rows, then ONE wide aggregate computing every "
    "check's score simultaneously, emitted as (check_name, score, passed) "
    "rows. 7 checks = still 2 jobs; the reference runs 16 sequential pandas "
    "passes.",
    oracle=f"""
        WITH stats AS (
            SELECT quantile_cont(value, 0.25) AS p25, quantile_cont(value, 0.75) AS p75,
                   AVG(value) AS m, STDDEV(value) AS s,
                   MAX(epoch(ts)) AS tmax, MIN(epoch(ts)) AS tmin
            FROM events
        ), g AS ({_GAPPED_SQL}), ind AS (SELECT * FROM g, stats),
        scores AS (
            SELECT 'completeness' AS check_name,
                   ROUND(AVG((CASE WHEN value_g IS NOT NULL THEN 1 ELSE 0 END
                            + CASE WHEN props_g IS NOT NULL THEN 1 ELSE 0 END
                            + CASE WHEN type_g IS NOT NULL THEN 1 ELSE 0 END) / 3.0), 4)
                       AS score
            FROM ind
            UNION ALL
            SELECT 'validity',
                   ROUND(AVG(CASE WHEN value >= 0 AND value <= 250 AND user_id >= 0
                                  AND event_type IN {_SUITE_KNOWN_SQL}
                             THEN 1.0 ELSE 0.0 END), 4)
            FROM ind
            UNION ALL
            SELECT 'uniqueness',
                   ROUND(CAST(COUNT(DISTINCT event_id) AS DOUBLE) / COUNT(*), 4)
            FROM ind
            UNION ALL
            SELECT 'timeliness',
                   ROUND(AVG(CASE WHEN tmax - epoch(ts) <= 604800 THEN 1.0 ELSE 0.0 END), 4)
            FROM ind
            UNION ALL
            SELECT 'timestamp_consistency',
                   ROUND(AVG(CASE WHEN tmax - tmin <= 86400.0 THEN 1.0
                                  ELSE 86400.0 / (tmax - tmin) END), 4)
            FROM ind
            UNION ALL
            SELECT 'value_range',
                   ROUND(AVG(CASE WHEN value BETWEEN p25 - 3 * (p75 - p25)
                                              AND p75 + 3 * (p75 - p25)
                             THEN 1.0 ELSE 0.0 END), 4)
            FROM ind
            UNION ALL
            SELECT 'anomaly_detection',
                   ROUND(AVG(CASE WHEN ABS(value - m) / s <= 3 THEN 1.0 ELSE 0.0 END), 4)
            FROM ind
        )
        SELECT check_name, score,
               score >= CASE check_name WHEN 'uniqueness' THEN 0.95
                                        WHEN 'timestamp_consistency' THEN 0.9
                                        ELSE 0.8 END AS passed
        FROM scores
        ORDER BY check_name
    """,
)
def quality_check_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _gapped(load_table(spark, sf_dir, "events"))
    stats = e.agg(
        F.percentile("value", F.lit(0.25)).alias("p25"),
        F.percentile("value", F.lit(0.75)).alias("p75"),
        F.avg("value").alias("m"),
        F.stddev("value").alias("s"),
        F.max(F.col("ts").cast("double")).alias("tmax"),
        F.min(F.col("ts").cast("double")).alias("tmin"),
    )
    ind = e.crossJoin(F.broadcast(stats))

    presence = (
        F.when(F.col("value_g").isNotNull(), 1).otherwise(0)
        + F.when(F.col("props_g").isNotNull(), 1).otherwise(0)
        + F.when(F.col("type_g").isNotNull(), 1).otherwise(0)
    )
    valid = (
        (F.col("value") >= 0)
        & (F.col("value") <= 250)
        & (F.col("user_id") >= 0)
        & F.col("event_type").isin(*KNOWN_EVENT_TYPES)
    )
    age = F.col("tmax") - F.col("ts").cast("double")
    span = F.col("tmax") - F.col("tmin")
    iqr = F.col("p75") - F.col("p25")
    in_fence = F.col("value").between(F.col("p25") - 3 * iqr, F.col("p75") + 3 * iqr)
    z_ok = F.abs(F.col("value") - F.col("m")) / F.col("s") <= 3

    def frac(cond):
        return F.avg(F.when(cond, 1.0).otherwise(0.0))

    checks = {
        "completeness": F.avg(presence / 3.0),
        "validity": frac(valid),
        "uniqueness": F.count_distinct("event_id").cast("double") / F.count("*"),
        "timeliness": frac(age <= 604800),
        "timestamp_consistency": F.avg(
            F.when(span <= 86400.0, 1.0).otherwise(F.lit(86400.0) / span)
        ),
        "value_range": frac(in_fence),
        "anomaly_detection": frac(z_ok),
    }
    thresholds = {"uniqueness": 0.95, "timestamp_consistency": 0.9}
    one_row = ind.agg(*[F.round(expr, 4).alias(name) for name, expr in checks.items()])
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(name).alias("score"),
                (F.col(name) >= thresholds.get(name, 0.8)).alias("passed"),
            )
            for name in checks
        ]
    )
    return (
        one_row.select(F.explode(entries).alias("c"))
        .select("c.check_name", "c.score", "c.passed")
        .orderBy("check_name")
    )


@query(
    "serving_snapshot_stats",
    tags=("serving", "agg"),
    doc="The serving-API stats payload shape (get_flight_data.py:240-368, see "
    "operators/serving.py for the flight version): one wide aggregate + a "
    "top-1 frame combined by single-row crossJoin — the whole dashboard "
    "payload in one job, no driver-side loops.",
    oracle=f"""
        SELECT (SELECT COUNT(*) FROM events) AS total_events,
               (SELECT COUNT(DISTINCT user_id) FROM events) AS distinct_users,
               (SELECT COUNT(DISTINCT event_type) FROM events) AS distinct_types,
               (SELECT ROUND(AVG(value), 4) FROM events) AS avg_value,
               (SELECT ROUND(MAX(value), 4) FROM events) AS max_value,
               (SELECT ROUND(quantile_cont(value, 0.95), 4) FROM events) AS p95_value,
               t.event_type AS top_event_type,
               t.cnt AS top_event_count
        FROM (
            SELECT event_type, COUNT(*) AS cnt
            FROM events GROUP BY event_type
            ORDER BY cnt DESC, event_type LIMIT 1
        ) t
    """,
)
def serving_snapshot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    base = e.agg(
        F.count("*").alias("total_events"),
        F.countDistinct("user_id").alias("distinct_users"),
        F.countDistinct("event_type").alias("distinct_types"),
        _r4(F.avg("value")).alias("avg_value"),
        _r4(F.max("value")).alias("max_value"),
        _r4(F.percentile("value", F.lit(0.95))).alias("p95_value"),
    )
    top = (
        e.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "event_type")
        .limit(1)
        .select(F.col("event_type").alias("top_event_type"), F.col("cnt").alias("top_event_count"))
    )
    return base.crossJoin(top)


@query(
    "anomaly_iqr_outliers",
    tags=("anomaly", "percentile", "join"),
    doc="IQR-fence outlier detection — per-group p25/p75, fences at ±1.5·IQR, "
    "stats broadcast back to the fact rows (anomaly_detector.py:296-376; the "
    "altitude_range IQR×3 batch check, data_quality_validator.py). At scale the "
    "per-group stats row set stays tiny → broadcast join, no fact shuffle.",
    oracle="""
        WITH fences AS (
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.25) AS p25,
                   quantile_cont(l_extendedprice, 0.75) AS p75
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l.l_returnflag,
               COUNT(*) AS row_count,
               SUM(CASE WHEN l.l_extendedprice < f.p25 - 1.5 * (f.p75 - f.p25)
                          OR l.l_extendedprice > f.p75 + 1.5 * (f.p75 - f.p25)
                        THEN 1 ELSE 0 END) AS outlier_count,
               ROUND(f.p25 - 1.5 * (f.p75 - f.p25), 4) AS lower_fence,
               ROUND(f.p75 + 1.5 * (f.p75 - f.p25), 4) AS upper_fence
        FROM lineitem l JOIN fences f ON l.l_returnflag = f.l_returnflag
        GROUP BY l.l_returnflag, f.p25, f.p75
        ORDER BY l.l_returnflag
    """,
)
def anomaly_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # both exact percentiles from ONE buffered sort (array form) — two scalar
    # percentile aggs would buffer+sort the column twice (~2× slower measured)
    fences = (
        li.groupBy(F.col("l_returnflag").alias("rf"))
        .agg(F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.75))).alias("ps"))
        .select(
            "rf",
            F.element_at("ps", 1).alias("p25"),
            F.element_at("ps", 2).alias("p75"),
        )
    )
    iqr = F.col("p75") - F.col("p25")
    lower, upper = F.col("p25") - 1.5 * iqr, F.col("p75") + 1.5 * iqr
    outlier = (F.col("l_extendedprice") < lower) | (F.col("l_extendedprice") > upper)
    return (
        li.join(F.broadcast(fences), li.l_returnflag == fences.rf)
        .groupBy("l_returnflag", "p25", "p75")
        .agg(
            F.count("*").alias("row_count"),
            F.sum(F.when(outlier, 1).otherwise(0)).alias("outlier_count"),
        )
        .select(
            "l_returnflag",
            "row_count",
            "outlier_count",
            _r4(lower).alias("lower_fence"),
            _r4(upper).alias("upper_fence"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "anomaly_data_corruption",
    tags=("anomaly", "corruption"),
    doc="Data-corruption scan — NaN / Inf / extreme-magnitude / impossible "
    "values across numeric fields (anomaly_detector.py:565-621). The testdata "
    "is clean, so corruption is injected at fixed residues to exercise the "
    "detector on both engines.",
    oracle="""
        WITH corrupted AS (
            SELECT event_id, event_type,
                   CASE WHEN event_id % 101 = 0 THEN CAST('nan' AS DOUBLE)
                        WHEN event_id % 103 = 0 THEN CAST('inf' AS DOUBLE)
                        WHEN event_id % 107 = 0 THEN 1e12
                        ELSE value END AS v
            FROM events
        )
        SELECT event_type,
               COUNT(*) AS total_rows,
               SUM(CASE WHEN isnan(v) THEN 1 ELSE 0 END)                    AS nan_count,
               SUM(CASE WHEN NOT isnan(v) AND isinf(v) THEN 1 ELSE 0 END)   AS inf_count,
               SUM(CASE WHEN NOT isnan(v) AND NOT isinf(v) AND ABS(v) > 1e10
                        THEN 1 ELSE 0 END)                                  AS extreme_count,
               SUM(CASE WHEN NOT isnan(v) AND NOT isinf(v) AND ABS(v) <= 1e10
                        THEN 1 ELSE 0 END)                                  AS clean_count
        FROM corrupted
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def anomaly_data_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = (
        F.when(F.col("event_id") % 101 == 0, F.lit(float("nan")))
        .when(F.col("event_id") % 103 == 0, F.lit(float("inf")))
        .when(F.col("event_id") % 107 == 0, F.lit(1e12))
        .otherwise(F.col("value"))
    )
    e = e.withColumn("v", v)
    is_nan = F.isnan("v")
    is_inf = F.col("v").isin(float("inf"), float("-inf"))
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("total_rows"),
            F.sum(F.when(is_nan, 1).otherwise(0)).alias("nan_count"),
            F.sum(F.when(~is_nan & is_inf, 1).otherwise(0)).alias("inf_count"),
            F.sum(
                F.when(~is_nan & ~is_inf & (F.abs(F.col("v")) > 1e10), 1).otherwise(0)
            ).alias("extreme_count"),
            F.sum(
                F.when(~is_nan & ~is_inf & (F.abs(F.col("v")) <= 1e10), 1).otherwise(0)
            ).alias("clean_count"),
        )
        .orderBy("event_type")
    )


@query(
    "alert_evaluation",
    tags=("quality", "alerting"),
    doc="Threshold alert evaluation over batch summaries (alerting.py:398-520, "
    "operators/quality.evaluate_alerts): the events split into previous/"
    "current batches (even/odd event_id — non-empty at every scale), each "
    "summarized by one agg, combined by single-row crossJoin, and evaluated "
    "against the quarantine-rate / "
    "quality-floor / quality-drop thresholds — (alert, severity, triggered, "
    "observed) rows.",
    oracle=f"""
        WITH gapped AS ({_GAPPED_SQL}),
        scored AS (
            SELECT event_id % 2 AS half,
                   0.30 * {_COMPLETENESS_SQL} + 0.30 * {_VALIDITY_SQL}
                   + 0.25 * {_TIMELINESS_SQL} + 0.15 * 1.0 AS overall,
                   CASE WHEN value_g IS NULL OR value > 250 THEN 1 ELSE 0 END AS critical
            FROM gapped
        ),
        cur AS (
            SELECT ROUND(AVG(overall), 4) AS q,
                   ROUND(AVG(CASE WHEN overall < 0.30 OR critical = 1
                             THEN 1.0 ELSE 0.0 END), 4) AS qr
            FROM scored WHERE half = 1
        ),
        prev AS (SELECT ROUND(AVG(overall), 4) AS pq FROM scored WHERE half = 0)
        SELECT a.alert_name, a.severity, a.triggered, a.observed
        FROM cur, prev, LATERAL (
            SELECT 'quarantine_rate_high' AS alert_name, 'HIGH' AS severity,
                   qr > 0.15 AS triggered, qr AS observed
            UNION ALL
            SELECT 'quality_below_floor', 'CRITICAL', q < 0.70, q
            UNION ALL
            SELECT 'quality_drop_vs_previous', 'MEDIUM',
                   pq - q > 0.10, ROUND(pq - q, 4)
        ) a
        ORDER BY alert_name
    """,
)
def alert_evaluation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _gapped(load_table(spark, sf_dir, "events"))
    overall = (
        0.30 * completeness_score()
        + 0.30 * validity_score()
        + 0.25 * timeliness_score(F.lit(QUALITY_NOW).cast("timestamp"))
        + 0.15 * F.lit(1.0)
    )
    critical = F.when(F.col("value_g").isNull() | (F.col("value") > 250), 1).otherwise(0)
    scored = e.select(
        (F.col("event_id") % 2).alias("half"), overall.alias("overall"), critical.alias("critical")
    )
    quarantine = (F.col("overall") < 0.30) | (F.col("critical") == 1)
    cur = scored.filter(F.col("half") == 1).agg(
        _r4(F.avg("overall")).alias("q"),
        _r4(F.avg(F.when(quarantine, 1.0).otherwise(0.0))).alias("qr"),
    )
    prev = scored.filter(F.col("half") == 0).agg(_r4(F.avg("overall")).alias("pq"))
    s = cur.crossJoin(F.broadcast(prev))
    alerts = F.array(
        F.struct(
            F.lit("quarantine_rate_high").alias("alert_name"),
            F.lit("HIGH").alias("severity"),
            (F.col("qr") > 0.15).alias("triggered"),
            F.col("qr").alias("observed"),
        ),
        F.struct(
            F.lit("quality_below_floor").alias("alert_name"),
            F.lit("CRITICAL").alias("severity"),
            (F.col("q") < 0.70).alias("triggered"),
            F.col("q").alias("observed"),
        ),
        F.struct(
            F.lit("quality_drop_vs_previous").alias("alert_name"),
            F.lit("MEDIUM").alias("severity"),
            (F.col("pq") - F.col("q") > 0.10).alias("triggered"),
            _r4(F.col("pq") - F.col("q")).alias("observed"),
        ),
    )
    return (
        s.select(F.explode(alerts).alias("a"))
        .select("a.alert_name", "a.severity", "a.triggered", "a.observed")
        .orderBy("alert_name")
    )


#: lat/lon boxes in the geographic-boundary check style
#: (anomaly_detector.py:95-130: forbidden + oceanic zones)
GEO_ZONES = (
    ("restricted_a", 35.0, 40.0, -120.0, -110.0),
    ("restricted_b", -90.0, -60.0, -180.0, 180.0),
    ("oceanic_1", -10.0, 10.0, -40.0, -10.0),
)


@query(
    "anomaly_geo_zones",
    tags=("anomaly", "geo", "join"),
    doc="Geographic-boundary anomaly check (anomaly_detector.py:378-418): "
    "point-in-box classification against a zones table. The zones are a "
    "3-row broadcast literal table — the join is a BroadcastNestedLoopJoin "
    "with box predicates, never a shuffle, exactly how a forbidden-zone "
    "lookup scales to any fact size. Coordinates derived deterministically "
    "from event fields (testdata has no geo columns, seq_trajectory "
    "convention).",
    oracle=f"""
        WITH fixes AS (
            SELECT event_id,
                   (value % 120) - 60                       AS lat,
                   (CAST(event_id % 360 AS DOUBLE)) - 180.0 AS lon
            FROM events
        ), zones AS (
            {" UNION ALL ".join(f"SELECT '{z}' AS zone, {a} AS lat_min, {b} AS lat_max, {c} AS lon_min, {d} AS lon_max" for z, a, b, c, d in GEO_ZONES)}
        )
        SELECT z.zone,
               COUNT(f.event_id) AS hits,
               ROUND(MIN(f.lat), 4) AS min_lat,
               ROUND(MAX(f.lat), 4) AS max_lat
        FROM zones z
        LEFT JOIN fixes f
          ON f.lat BETWEEN z.lat_min AND z.lat_max
         AND f.lon BETWEEN z.lon_min AND z.lon_max
        GROUP BY z.zone
        ORDER BY z.zone
    """,
)
def anomaly_geo_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    fixes = e.select(
        "event_id",
        ((F.col("value") % 120) - 60).alias("lat"),
        ((F.col("event_id") % 360).cast("double") - 180.0).alias("lon"),
    )
    zones = e.sparkSession.createDataFrame(
        list(GEO_ZONES), "zone string, lat_min double, lat_max double, lon_min double, lon_max double"
    )
    cond = (
        F.col("lat").between(F.col("lat_min"), F.col("lat_max"))
        & F.col("lon").between(F.col("lon_min"), F.col("lon_max"))
    )
    return (
        F.broadcast(zones)
        .join(fixes, cond, "left")
        .groupBy("zone")
        .agg(
            F.count("event_id").alias("hits"),
            _r4(F.min("lat")).alias("min_lat"),
            _r4(F.max("lat")).alias("max_lat"),
        )
        .orderBy("zone")
    )

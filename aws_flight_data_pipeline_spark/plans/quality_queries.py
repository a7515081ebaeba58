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
from pyspark.sql.window import Window

from aws_flight_data_pipeline_spark.plans.registry import builder, query
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


@builder(
    "quality_score_profile",
    tags=("quality", "agg"),
    doc="Batch completeness + validity profile per event type, merging the two "
    "per-dimension score queries on their shared grain (quality_validator.py:"
    "284-332 completeness weights, :334-522 validity checks; one hash-agg). "
    "Cross-engine value discipline: the weighted completeness score is summed "
    "as exact integer tenths (5/3/2 per field) and validity as integer "
    "quarters (4 − failed checks), each divided once at the end — unrounded "
    "quotients of exact integers are bit-identical doubles in both engines, "
    "unlike ROUND(AVG(score), 4) which diverges on 4-dp half-boundaries.",
    oracle=f"""
        WITH gapped AS ({_GAPPED_SQL})
        SELECT event_type,
               COUNT(*) AS record_count,
               CAST(SUM(CASE WHEN value_g IS NOT NULL THEN 5 ELSE 0 END
                        + CASE WHEN props_g IS NOT NULL THEN 3 ELSE 0 END
                        + CASE WHEN type_g IS NOT NULL THEN 2 ELSE 0 END) AS BIGINT)
                   / (CAST(10 AS DOUBLE) * COUNT(*)) AS avg_completeness,
               CAST(SUM(CASE WHEN value_g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS missing_value_count,
               CAST(SUM(CASE WHEN props_g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS missing_props_count,
               CAST(SUM(CASE WHEN value_g IS NOT NULL AND props_g IS NOT NULL
                             AND type_g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   / (CAST(1 AS DOUBLE) * COUNT(*)) AS fully_complete_ratio,
               CAST(SUM(4 - (CASE WHEN value >= 0 AND value <= 250 THEN 0 ELSE 1 END
                             + CASE WHEN year(ts) = 2024 THEN 0 ELSE 1 END
                             + CASE WHEN event_type IN {_KNOWN_TYPES_SQL} THEN 0 ELSE 1 END
                             + CASE WHEN user_id >= 0 THEN 0 ELSE 1 END)) AS BIGINT)
                   / (CAST(4 AS DOUBLE) * COUNT(*)) AS avg_validity,
               CAST(SUM(CASE WHEN value < 0 OR value > 250 THEN 1 ELSE 0 END) AS BIGINT)
                   AS range_failures,
               CAST(SUM(CASE WHEN year(ts) <> 2024 THEN 1 ELSE 0 END) AS BIGINT)
                   AS temporal_failures,
               MIN({_VALIDITY_SQL}) AS min_validity
        FROM gapped
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def quality_score_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _gapped(load_table(spark, sf_dir, "events"))
    fully = (
        F.col("value_g").isNotNull() & F.col("props_g").isNotNull() & F.col("type_g").isNotNull()
    )
    tenths = (
        F.when(F.col("value_g").isNotNull(), 5).otherwise(0)
        + F.when(F.col("props_g").isNotNull(), 3).otherwise(0)
        + F.when(F.col("type_g").isNotNull(), 2).otherwise(0)
    )
    known = F.col("event_type").isin(*KNOWN_EVENT_TYPES)
    failed = (
        F.when((F.col("value") >= 0) & (F.col("value") <= 250), 0).otherwise(1)
        + F.when(F.year("ts") == 2024, 0).otherwise(1)
        + F.when(known, 0).otherwise(1)
        + F.when(F.col("user_id") >= 0, 0).otherwise(1)
    )
    n = F.count("*")
    return (
        e.groupBy("event_type")
        .agg(
            n.alias("record_count"),
            (F.sum(tenths) / (10.0 * n)).alias("avg_completeness"),
            F.sum(F.when(F.col("value_g").isNull(), 1).otherwise(0)).alias("missing_value_count"),
            F.sum(F.when(F.col("props_g").isNull(), 1).otherwise(0)).alias("missing_props_count"),
            (F.sum(F.when(fully, 1).otherwise(0)) / (1.0 * n)).alias("fully_complete_ratio"),
            (F.sum(4 - failed) / (4.0 * n)).alias("avg_validity"),
            F.sum(
                F.when((F.col("value") < 0) | (F.col("value") > 250), 1).otherwise(0)
            ).alias("range_failures"),
            F.sum(F.when(F.year("ts") != 2024, 1).otherwise(0)).alias("temporal_failures"),
            F.min(validity_score()).alias("min_validity"),
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
    doc="Quarantine decision + split counts + review-status triage — score "
    "< 0.30 or critical issue quarantines a record (quality_validator.py:"
    "808-820, quarantine_system.py:238-336); quarantined records are then "
    "triaged into the reference's review workflow states (quarantine_system"
    ".py:338-381): auto_release_eligible (borderline score, no critical "
    "issue), expired (older than the 168-day retention vs the injected now — the boundary falls mid-corpus so every state is exercised), "
    "else pending_review. In the pipeline the quarantine boolean drives two "
    "filtered writes (clean/quarantine paths). quarantine_rate is an "
    "unrounded quotient of exact counts.",
    oracle=f"""
        WITH gapped AS ({_GAPPED_SQL}),
        scored AS (
            SELECT event_type, ts,
                   0.30 * {_COMPLETENESS_SQL} + 0.30 * {_VALIDITY_SQL}
                   + 0.25 * {_TIMELINESS_SQL} + 0.15 * 1.0 AS overall,
                   CASE WHEN value_g IS NULL OR value > 250 THEN 1 ELSE 0 END AS critical_issue
            FROM gapped
        ),
        flagged AS (
            SELECT event_type, overall, critical_issue,
                   CASE WHEN overall < 0.30 OR critical_issue = 1 THEN 1 ELSE 0 END AS q,
                   CASE WHEN epoch({QUALITY_NOW_SQL}) - epoch(ts) > 14515200.0
                        THEN 1 ELSE 0 END AS aged_out
            FROM scored
        )
        SELECT event_type,
               COUNT(*) AS total_records,
               CAST(SUM(q) AS BIGINT)     AS quarantined,
               CAST(SUM(1 - q) AS BIGINT) AS clean,
               CAST(SUM(q) AS BIGINT) / (1.0 * COUNT(*)) AS quarantine_rate,
               CAST(SUM(CASE WHEN q = 1 AND aged_out = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS review_expired,
               CAST(SUM(CASE WHEN q = 1 AND aged_out = 0 AND critical_issue = 0
                             AND overall >= 0.25 THEN 1 ELSE 0 END) AS BIGINT)
                   AS review_auto_release,
               CAST(SUM(CASE WHEN q = 1 AND aged_out = 0
                             AND NOT (critical_issue = 0 AND overall >= 0.25)
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS review_pending
        FROM flagged
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
    scored = e.select(
        "event_type",
        overall.alias("overall"),
        critical.alias("critical_issue"),
        F.when((overall < 0.30) | (critical == 1), 1).otherwise(0).alias("q"),
        F.when(
            F.lit(QUALITY_NOW).cast("timestamp").cast("double") - F.col("ts").cast("double")
            > 14515200.0,
            1,
        )
        .otherwise(0)
        .alias("aged_out"),
    )
    quarantined, aged = F.col("q") == 1, F.col("aged_out") == 1
    borderline = (F.col("critical_issue") == 0) & (F.col("overall") >= 0.25)
    n = F.count("*")
    return (
        scored.groupBy("event_type")
        .agg(
            n.alias("total_records"),
            F.sum("q").alias("quarantined"),
            F.sum(1 - F.col("q")).alias("clean"),
            (F.sum("q") / (1.0 * n)).alias("quarantine_rate"),
            F.sum(F.when(quarantined & aged, 1).otherwise(0)).alias("review_expired"),
            F.sum(F.when(quarantined & ~aged & borderline, 1).otherwise(0)).alias(
                "review_auto_release"
            ),
            F.sum(F.when(quarantined & ~aged & ~borderline, 1).otherwise(0)).alias(
                "review_pending"
            ),
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
    "rows. 10 checks = still 2 jobs; the reference runs 16 sequential pandas "
    "passes. The three batch_* rows carry the BATCH QUALITY AGGREGATES "
    "(flight_data_processor.py:193-275 — the corpus-level ratio block "
    "quality_score_profile computes per event type; folded in here when "
    "that entry rotated to builder status, verdict r12 #6, so SURVEY "
    "§2.4's batch-aggregates row keeps a registered, oracle-hash-verified "
    "proof): weighted 5/3/2 completeness, fully-complete ratio, and "
    "integer-quarters validity, each summed as exact integers and divided "
    "ONCE, unrounded — exact-integer quotients are bit-identical doubles "
    "in both engines, where ROUND(...,4) could diverge on half-boundaries.",
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
            UNION ALL
            SELECT 'batch_weighted_completeness',
                   CAST(SUM(CASE WHEN value_g IS NOT NULL THEN 5 ELSE 0 END
                            + CASE WHEN props_g IS NOT NULL THEN 3 ELSE 0 END
                            + CASE WHEN type_g IS NOT NULL THEN 2 ELSE 0 END) AS BIGINT)
                       / (CAST(10 AS DOUBLE) * COUNT(*))
            FROM ind
            UNION ALL
            SELECT 'batch_fully_complete_ratio',
                   CAST(SUM(CASE WHEN value_g IS NOT NULL AND props_g IS NOT NULL
                                 AND type_g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                       / (CAST(1 AS DOUBLE) * COUNT(*))
            FROM ind
            UNION ALL
            SELECT 'batch_avg_validity',
                   CAST(SUM(4 - (CASE WHEN value >= 0 AND value <= 250 THEN 0 ELSE 1 END
                                 + CASE WHEN year(ts) = 2024 THEN 0 ELSE 1 END
                                 + CASE WHEN event_type IN {_SUITE_KNOWN_SQL} THEN 0 ELSE 1 END
                                 + CASE WHEN user_id >= 0 THEN 0 ELSE 1 END)) AS BIGINT)
                       / (CAST(4 AS DOUBLE) * COUNT(*))
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
    # Batch quality aggregates (quality_score_profile's corpus-level ratio
    # block, reference flight_data_processor.py:193-275) — exact-integer
    # sums divided once, deliberately NOT rounded (see doc).
    tenths = (
        F.when(F.col("value_g").isNotNull(), 5).otherwise(0)
        + F.when(F.col("props_g").isNotNull(), 3).otherwise(0)
        + F.when(F.col("type_g").isNotNull(), 2).otherwise(0)
    )
    fully = (
        F.col("value_g").isNotNull()
        & F.col("props_g").isNotNull()
        & F.col("type_g").isNotNull()
    )
    failed = (
        F.when((F.col("value") >= 0) & (F.col("value") <= 250), 0).otherwise(1)
        + F.when(F.year("ts") == 2024, 0).otherwise(1)
        + F.when(F.col("event_type").isin(*KNOWN_EVENT_TYPES), 0).otherwise(1)
        + F.when(F.col("user_id") >= 0, 0).otherwise(1)
    )
    n = F.count("*")
    exact_checks = {
        "batch_weighted_completeness": F.sum(tenths) / (10.0 * n),
        "batch_fully_complete_ratio": F.sum(F.when(fully, 1).otherwise(0)) / (1.0 * n),
        "batch_avg_validity": F.sum(4 - failed) / (4.0 * n),
    }
    thresholds = {"uniqueness": 0.95, "timestamp_consistency": 0.9}
    one_row = ind.agg(
        *[F.round(expr, 4).alias(name) for name, expr in checks.items()],
        *[expr.alias(name) for name, expr in exact_checks.items()],
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(name).alias("score"),
                (F.col(name) >= thresholds.get(name, 0.8)).alias("passed"),
            )
            for name in {**checks, **exact_checks}
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


def _iqr_frame(spark: SparkSession, sf_dir: str, exact: bool) -> DataFrame:
    """IQR-fence outlier detection — per-group p25/p75, fences at ±1.5·IQR,
    stats broadcast back to the fact rows (anomaly_detector.py:296-376; the
    altitude_range IQR×3 batch check, data_quality_validator.py). At scale the
    per-group stats row set stays tiny → broadcast join, no fact shuffle.

    ``exact=True`` buffers each group's full column in the agg buffer — kept
    for oracle parity only. The production path (``exact=False``) uses
    ``approx_percentile`` (bounded-memory KLL-style sketch, mergeable across
    partitions) — the at-scale variant the reference's APPROX_PERCENTILE
    surface implies. Both exact percentiles come from ONE buffered sort
    (array form); two scalar percentile aggs would buffer+sort twice.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qs = F.array(F.lit(0.25), F.lit(0.75))
    pctl = (
        F.percentile("l_extendedprice", qs)
        if exact
        else F.percentile_approx("l_extendedprice", qs)
    )
    fences = (
        li.groupBy(F.col("l_returnflag").alias("rf"))
        .agg(pctl.alias("ps"))
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
            # integer-microscale rounding: the fence is an exact ≤5-dp decimal
            # (4-dp interpolated percentile + 1.5×4-dp IQR), so ×1e5 lands
            # integer±ε in both engines — never on a .5 boundary
            (F.round(lower * 1e5).cast("long") / 1e5).alias("lower_fence"),
            (F.round(upper * 1e5).cast("long") / 1e5).alias("upper_fence"),
        )
        .orderBy("l_returnflag")
    )


@builder("anomaly_iqr_outliers")
def anomaly_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-percentile IQR fences (round-1 bench name, oracle-parity form)."""
    return _iqr_frame(spark, sf_dir, exact=True)


@builder("anomaly_iqr_outliers_approx")
def anomaly_iqr_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production IQR path: approx_percentile sketch — bounded memory at any
    group size (the exact form buffers the whole group's column)."""
    return _iqr_frame(spark, sf_dir, exact=False)


def _corruption_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-corruption scan — NaN / Inf / extreme-magnitude values injected at
    fixed residues (anomaly_detector.py:565-621; testdata is clean)."""
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
    "anomaly_scan_suite",
    tags=("anomaly", "percentile", "join", "corruption"),
    doc="Statistical + structural anomaly scan in long (section, grp, metric, "
    "value) form, merging two §2.9 detectors: IQR-fence outliers over "
    "lineitem price groups (anomaly_detector.py:296-376 — per-group exact "
    "p25/p75 broadcast back to the fact rows; approx_percentile is the "
    "at-scale production variant, see anomaly_iqr_outliers_approx) and the "
    "NaN/Inf/extreme corruption scan over events (anomaly_detector.py:"
    "565-621). Counts travel as exact integer-valued doubles; fences are "
    "integer-microscale (×1e5) rounded, which both engines agree on.",
    oracle="""
        WITH fences AS (
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.25) AS p25,
                   quantile_cont(l_extendedprice, 0.75) AS p75
            FROM lineitem GROUP BY l_returnflag
        ),
        iqr AS (
            SELECT l.l_returnflag AS grp,
                   CAST(COUNT(*) AS DOUBLE) AS row_count,
                   CAST(SUM(CASE WHEN l.l_extendedprice < f.p25 - 1.5 * (f.p75 - f.p25)
                              OR l.l_extendedprice > f.p75 + 1.5 * (f.p75 - f.p25)
                            THEN 1 ELSE 0 END) AS DOUBLE) AS outlier_count,
                   CAST(ROUND((f.p25 - 1.5 * (f.p75 - f.p25)) * 1e5) AS BIGINT) / 1e5
                       AS lower_fence,
                   CAST(ROUND((f.p75 + 1.5 * (f.p75 - f.p25)) * 1e5) AS BIGINT) / 1e5
                       AS upper_fence
            FROM lineitem l JOIN fences f ON l.l_returnflag = f.l_returnflag
            GROUP BY l.l_returnflag, f.p25, f.p75
        ),
        corrupted AS (
            SELECT event_type,
                   CASE WHEN event_id % 101 = 0 THEN CAST('nan' AS DOUBLE)
                        WHEN event_id % 103 = 0 THEN CAST('inf' AS DOUBLE)
                        WHEN event_id % 107 = 0 THEN 1e12
                        ELSE value END AS v
            FROM events
        ),
        corr AS (
            SELECT event_type AS grp,
                   CAST(COUNT(*) AS DOUBLE) AS total_rows,
                   CAST(SUM(CASE WHEN isnan(v) THEN 1 ELSE 0 END) AS DOUBLE) AS nan_count,
                   CAST(SUM(CASE WHEN NOT isnan(v) AND isinf(v) THEN 1 ELSE 0 END) AS DOUBLE)
                       AS inf_count,
                   CAST(SUM(CASE WHEN NOT isnan(v) AND NOT isinf(v) AND ABS(v) > 1e10
                            THEN 1 ELSE 0 END) AS DOUBLE) AS extreme_count,
                   CAST(SUM(CASE WHEN NOT isnan(v) AND NOT isinf(v) AND ABS(v) <= 1e10
                            THEN 1 ELSE 0 END) AS DOUBLE) AS clean_count
            FROM corrupted
            GROUP BY event_type
        )
        SELECT 'iqr' AS section, grp, 'row_count' AS metric, row_count AS value FROM iqr
        UNION ALL SELECT 'iqr', grp, 'outlier_count', outlier_count FROM iqr
        UNION ALL SELECT 'iqr', grp, 'lower_fence', lower_fence FROM iqr
        UNION ALL SELECT 'iqr', grp, 'upper_fence', upper_fence FROM iqr
        UNION ALL SELECT 'corruption', grp, 'total_rows', total_rows FROM corr
        UNION ALL SELECT 'corruption', grp, 'nan_count', nan_count FROM corr
        UNION ALL SELECT 'corruption', grp, 'inf_count', inf_count FROM corr
        UNION ALL SELECT 'corruption', grp, 'extreme_count', extreme_count FROM corr
        UNION ALL SELECT 'corruption', grp, 'clean_count', clean_count FROM corr
        ORDER BY section, grp, metric
    """,
)
def anomaly_scan_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _melt(df: DataFrame, section: str, grp: str, metrics: list[str]) -> DataFrame:
        entries = F.array(
            *[
                F.struct(F.lit(m).alias("metric"), F.col(m).cast("double").alias("value"))
                for m in metrics
            ]
        )
        return df.select(
            F.lit(section).alias("section"),
            F.col(grp).alias("grp"),
            F.explode(entries).alias("e"),
        ).select("section", "grp", "e.metric", "e.value")

    iqr = _melt(
        _iqr_frame(spark, sf_dir, exact=True),
        "iqr",
        "l_returnflag",
        ["row_count", "outlier_count", "lower_fence", "upper_fence"],
    )
    corr = _melt(
        _corruption_frame(spark, sf_dir),
        "corruption",
        "event_type",
        ["total_rows", "nan_count", "inf_count", "extreme_count", "clean_count"],
    )
    return iqr.unionAll(corr).orderBy("section", "grp", "metric")


@query(
    "alert_evaluation",
    tags=("quality", "alerting"),
    doc="Threshold alert evaluation with suppression windows + severity "
    "routing (alerting.py:398-520 thresholds; :80-115 suppression — an alert "
    "already active in the previous window is suppressed for one cooldown "
    "window; :143-180 severity→destination routing). The events are bucketed "
    "into 4 equal time windows; each window is summarized by one agg and "
    "evaluated against the quarantine-rate / quality-floor / quality-drop "
    "thresholds, then a LAG window per alert_name applies the cooldown. "
    "Bucketing uses exact double arithmetic on order-independent MIN/MAX "
    "epochs, so both engines agree; rates are exact count quotients and "
    "quality is ROUND(AVG,4) of a continuous score (boundary-safe).",
    oracle=f"""
        WITH gapped AS ({_GAPPED_SQL}),
        scored AS (
            SELECT ts,
                   0.30 * {_COMPLETENESS_SQL} + 0.30 * {_VALIDITY_SQL}
                   + 0.25 * {_TIMELINESS_SQL} + 0.15 * 1.0 AS overall,
                   CASE WHEN value_g IS NULL OR value > 250 THEN 1 ELSE 0 END AS critical
            FROM gapped
        ),
        bounds AS (SELECT MIN(epoch(ts)) AS tmin, MAX(epoch(ts)) AS tmax FROM scored),
        bucketed AS (
            SELECT LEAST(3, CAST(FLOOR(4.0 * (epoch(ts) - tmin) / (tmax - tmin + 1.0))
                                 AS BIGINT)) AS window_id,
                   overall, critical
            FROM scored, bounds
        ),
        per_window AS (
            SELECT window_id,
                   ROUND(AVG(overall), 4) AS q,
                   CAST(SUM(CASE WHEN overall < 0.30 OR critical = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) / (1.0 * COUNT(*)) AS qr
            FROM bucketed GROUP BY window_id
        ),
        with_prev AS (
            SELECT *, LAG(q) OVER (ORDER BY window_id) AS prev_q FROM per_window
        ),
        alerts AS (
            SELECT w.window_id, a.alert_name, a.severity, a.triggered, a.observed
            FROM with_prev w, LATERAL (
                SELECT 'quarantine_rate_high' AS alert_name, 'HIGH' AS severity,
                       w.qr > 0.15 AS triggered, w.qr AS observed
                UNION ALL
                SELECT 'quality_below_floor', 'CRITICAL', w.q < 0.70, w.q
                UNION ALL
                SELECT 'quality_drop_vs_previous', 'MEDIUM',
                       COALESCE(w.prev_q - w.q > 0.10, FALSE),
                       ROUND(COALESCE(w.prev_q - w.q, 0.0), 4)
            ) a
        )
        SELECT window_id, alert_name, severity, triggered, observed,
               triggered AND COALESCE(
                   LAG(triggered) OVER (PARTITION BY alert_name ORDER BY window_id),
                   FALSE) AS suppressed,
               triggered AND NOT COALESCE(
                   LAG(triggered) OVER (PARTITION BY alert_name ORDER BY window_id),
                   FALSE) AS notify,
               CASE severity WHEN 'CRITICAL' THEN 'pager'
                             WHEN 'HIGH' THEN 'oncall-chat'
                             ELSE 'daily-digest' END AS route
        FROM alerts
        ORDER BY window_id, alert_name
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
        F.col("ts").cast("double").alias("epoch_ts"),
        overall.alias("overall"),
        critical.alias("critical"),
    )
    bounds = scored.agg(F.min("epoch_ts").alias("tmin"), F.max("epoch_ts").alias("tmax"))
    bucketed = scored.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(3),
            F.floor(
                4.0 * (F.col("epoch_ts") - F.col("tmin")) / (F.col("tmax") - F.col("tmin") + 1.0)
            ),
        ).alias("window_id"),
        "overall",
        "critical",
    )
    quarantine = (F.col("overall") < 0.30) | (F.col("critical") == 1)
    per_window = bucketed.groupBy("window_id").agg(
        _r4(F.avg("overall")).alias("q"),
        (F.sum(F.when(quarantine, 1).otherwise(0)) / (1.0 * F.count("*"))).alias("qr"),
    )
    w_seq = Window.orderBy("window_id")
    with_prev = per_window.withColumn("prev_q", F.lag("q").over(w_seq))
    alerts_arr = F.array(
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
            F.coalesce(F.col("prev_q") - F.col("q") > 0.10, F.lit(False)).alias("triggered"),
            _r4(F.coalesce(F.col("prev_q") - F.col("q"), F.lit(0.0))).alias("observed"),
        ),
    )
    alerts = with_prev.select("window_id", F.explode(alerts_arr).alias("a")).select(
        "window_id", "a.alert_name", "a.severity", "a.triggered", "a.observed"
    )
    w_alert = Window.partitionBy("alert_name").orderBy("window_id")
    prev_trig = F.coalesce(F.lag("triggered").over(w_alert), F.lit(False))
    return (
        alerts.withColumn("suppressed", F.col("triggered") & prev_trig)
        .withColumn("notify", F.col("triggered") & ~prev_trig)
        .withColumn(
            "route",
            F.when(F.col("severity") == "CRITICAL", "pager")
            .when(F.col("severity") == "HIGH", "oncall-chat")
            .otherwise("daily-digest"),
        )
        .orderBy("window_id", "alert_name")
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


#: Polygon zones in integer MICRO-degrees (vertex rings, implicit closure).
#: "lshape" is deliberately CONCAVE: its bounding box admits points in the
#: notch that ray casting must reject — the case a box check cannot express.
POLY_ZONES = (
    ("atlantic_tri", ((-60_000_000, -30_000_000), (20_000_000, -30_000_000),
                      (-20_000_000, 60_000_000))),
    ("lshape", ((-170_000_000, -80_000_000), (-90_000_000, -80_000_000),
                (-90_000_000, 0), (-130_000_000, 0),
                (-130_000_000, 40_000_000), (-170_000_000, 40_000_000))),
    ("pacific_quad", ((100_000_000, -40_000_000), (170_000_000, -40_000_000),
                      (170_000_000, 40_000_000), (100_000_000, 40_000_000))),
)


def _poly_edges_sql() -> str:
    rows = []
    for zone, verts in POLY_ZONES:
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            rows.append(
                f"SELECT '{zone}' AS zone, CAST({x1} AS BIGINT) AS x1, "
                f"CAST({y1} AS BIGINT) AS y1, CAST({x2} AS BIGINT) AS x2, "
                f"CAST({y2} AS BIGINT) AS y2"
            )
    return " UNION ALL ".join(rows)


@builder(
    "anomaly_polygon_zones",
    tags=("anomaly", "geo", "polygon", "ray-cast", "higher-order"),
    doc="Point-in-POLYGON zone classification — the geo-boundary check "
    "anomaly_geo_zones cannot express: real zones are polygons, and a "
    "concave one (the planted L-shape) admits bounding-box points that "
    "are OUTSIDE the zone. Ray casting (odd crossing parity of the "
    "rightward ray) evaluated entirely in exact BIGINT micro-degrees: "
    "the crossing inequality px < x_edge(py) is cross-multiplied by the "
    "edge's dy so no division or double ever enters (coordinate products "
    "stay < 2^57). The vertex rings are plan-time constants, so each "
    "zone's crossing count UNROLLS into literal-coefficient compare/"
    "multiply expressions evaluated inside WholeStageCodegen — no zones "
    "join, no interpreted higher-order fold (r14: the F.aggregate lambda "
    "ran on Catalyst's interpreted path per bbox hit, and the "
    "BroadcastNestedLoopJoin re-materialized every point row 3x); a "
    "point's zone memberships emit through one explode and the only "
    "shuffle is the final per-zone rollup — the same plan at 100 TB. "
    "Coordinates derived deterministically from event ids (testdata has "
    "no geo columns, seq_trajectory convention).",
    oracle=f"""
        WITH pts AS (
            SELECT event_id,
                   (event_id * 7919) % 360000000 - 180000000   AS px,
                   (event_id * 104729) % 180000000 - 90000000  AS py
            FROM events
        ), edges AS (
            {{edges}}
        ), crossings AS (
            SELECT p.event_id, e.zone, COUNT(*) AS c
            FROM pts p JOIN edges e
              ON ((e.y1 > p.py) <> (e.y2 > p.py))
             AND ((p.px - e.x1) * (e.y2 - e.y1)
                  - (p.py - e.y1) * (e.x2 - e.x1))
                 * (CASE WHEN e.y2 > e.y1 THEN 1 ELSE -1 END) < 0
            GROUP BY 1, 2
        ), inside AS (
            SELECT event_id, zone FROM crossings WHERE c % 2 = 1
        )
        SELECT zone,
               CAST(COUNT(*) AS BIGINT) AS hits,
               MIN(event_id) AS first_event,
               MAX(event_id) AS last_event
        FROM inside GROUP BY zone ORDER BY zone
    """.format(edges=_poly_edges_sql()),
)
def anomaly_polygon_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "event_id",
        ((F.col("event_id") * 7919) % 360_000_000 - 180_000_000).alias("px"),
        ((F.col("event_id") * 104729) % 180_000_000 - 90_000_000).alias("py"),
    )
    px, py = F.col("px"), F.col("py")

    def _inside(verts) -> Column:
        # rightward-ray crossing parity with every edge coefficient a plan
        # literal: the ray at height py crosses edge (x1,y1)->(x2,y2) iff
        # the edge straddles py half-open and the intersection abscissa
        # lies right of px (cross-multiplied by dy — exact integers). The
        # bbox conjunct is a pure prune: outside the bbox parity is even.
        xs = [x for x, _ in verts]
        ys = [y for _, y in verts]
        bbox = px.between(F.lit(min(xs)), F.lit(max(xs))) & py.between(
            F.lit(min(ys)), F.lit(max(ys))
        )
        cnt: Column | None = None
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            straddles = (F.lit(y1) > py) != (F.lit(y2) > py)
            lhs = (px - F.lit(x1)) * F.lit(y2 - y1) - (py - F.lit(y1)) * F.lit(x2 - x1)
            hit = F.when(straddles & (lhs * F.lit(1 if y2 > y1 else -1) < 0), 1).otherwise(0)
            cnt = hit if cnt is None else cnt + hit
        return bbox & (cnt % 2 == 1)

    # one nullable slot per zone, exploded and null-filtered — membership
    # in several zones still yields one row per (point, zone) like the old
    # broadcast-nested-loop join, but the ring test now runs unrolled
    # inside WholeStageCodegen instead of an interpreted F.aggregate lambda
    zone_hits = F.array(*[F.when(_inside(vs), F.lit(z)) for z, vs in POLY_ZONES])
    return (
        pts.select("event_id", F.explode(zone_hits).alias("zone"))
        .where(F.col("zone").isNotNull())
        .groupBy("zone")
        .agg(
            F.count("*").cast("bigint").alias("hits"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .orderBy("zone")
    )

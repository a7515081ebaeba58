"""Mergeable-sketch operators: HyperLogLog distinct sketches and Count-Min
frequency sketches, contract-verified against exact answers.

THE 100 TB pattern this module demonstrates: expensive global statistics as
RE-AGGREGATABLE summaries. A per-partition/per-source sketch is kilobytes; a
coordinator (or a later query) merges sketches WITHOUT rescanning raw data —
the shape behind every production distinct-count dashboard and heavy-hitter
monitor. The reference reaches for the same tool class with Presto's
``approx_distinct`` (``07_optimization_guide.sql:117-185``, "approximate
aggregations cut compute 50-70%"); here the sketches are first-class values
(binary columns) that survive union/rollup, not just scalar estimates.

Cross-engine verification follows the contract pattern proven by
``order_status_profile``'s approx-distinct check: DuckDB cannot reproduce
Spark's sketch internals, so the ORACLE verifies the exact columns plus
deterministic CONTRACT FLAGS — error-bound assertions that must evaluate to 1
given the fixed seed/configuration (HLL lgK=12 ≈ 1.6% relative error vs a 5%
gate; Count-Min with eps=0.001 never underestimates and overestimates by at
most ceil(eps·N) at the verified scales). The flags are computed from the
sketch on the Spark side and hard-coded 1 in the SQL — a real divergence
flips the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_flight_data_pipeline_spark.functions.quantiles import (
    DD_ALPHA,
    DD_QS,
    dd_gamma,
    dd_histogram,
    dd_profile,
)
from aws_flight_data_pipeline_spark.functions.sketches import cms_estimate
from aws_flight_data_pipeline_spark.plans.registry import builder
from aws_flight_data_pipeline_spark.sources.testdata import load_table

_FP_SQL = "md5(lower(trim(text)))"


def _fp() -> "F.Column":
    """Normalized-content fingerprint (same as dedup_exact_fingerprint).
    Built lazily: Column construction needs an active SparkContext."""
    return F.md5(F.lower(F.trim(F.col("text"))))

#: HLL sketch precision: 2^12 registers ≈ 1.6% standard error — comfortably
#: inside the 5% contract gate at every verified scale.
_HLL_LGK = 12

#: Count-Min geometry: eps controls the additive overestimate bound
#: (≤ ceil(eps·total_items) with confidence 1-delta), seed pins determinism.
_CMS_EPS = 0.001
_CMS_CONFIDENCE = 0.99
_CMS_SEED = 42


@builder(
    "sketch_distinct_rollup",
    tags=("sketch", "hll", "approx", "rollup"),
    doc="Distinct-document accounting via HyperLogLog sketches, two levels: "
    "(1) per-source — each source aggregates an HLL sketch (lgK=12) of the "
    "normalized-content fingerprint alongside the exact distinct count; "
    "(2) GLOBAL — the per-source SKETCHES are merged with hll_union_agg and "
    "estimated, never rescanning documents (cross-source duplicates exist, "
    "so the global row is NOT the sum of per-source counts — the sketch "
    "union handles overlap exactly like the exact COUNT(DISTINCT) does). "
    "Oracled columns are the exact counts plus a deterministic 5% contract "
    "flag on every estimate (20·|est−exact| <= exact). At 100 TB the exact "
    "countDistinct column is the one you drop; the sketch path's cost is a "
    "4 KB binary per group.",
    oracle=f"""
        SELECT source AS scope,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT {_FP_SQL}) AS BIGINT) AS distinct_exact,
               CAST(1 AS BIGINT) AS hll_within_5pct
        FROM documents GROUP BY source
        UNION ALL
        SELECT 'GLOBAL',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT {_FP_SQL}) AS BIGINT),
               CAST(1 AS BIGINT)
        FROM documents
        ORDER BY scope
    """,
)
def sketch_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")

    def _flag(est, exact):
        return (
            F.when(20 * F.abs(est - exact) <= exact, F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint")

    per = d.groupBy(F.col("source").alias("scope")).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(_fp()).alias("distinct_exact"),
        F.hll_sketch_agg(_fp(), F.lit(_HLL_LGK)).alias("sk"),
    )
    per_rows = per.select(
        "scope",
        "n_rows",
        "distinct_exact",
        _flag(F.hll_sketch_estimate("sk"), F.col("distinct_exact")).alias("hll_within_5pct"),
    )
    # GLOBAL: merge the per-source sketches (re-aggregation — documents is
    # not rescanned for the estimate); exact global distinct for the contract.
    merged = per.agg(
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias("est"),
    )
    exact_glob = d.agg(F.countDistinct(_fp()).alias("distinct_exact"))
    glob_row = merged.crossJoin(exact_glob).select(
        F.lit("GLOBAL").alias("scope"),
        "n_rows",
        "distinct_exact",
        _flag(F.col("est"), F.col("distinct_exact")).alias("hll_within_5pct"),
    )
    return per_rows.unionByName(glob_row).orderBy("scope")


@builder(
    "sketch_heavy_hitters",
    tags=("sketch", "count_min", "approx", "heavy-hitters"),
    doc="Heavy-hitter monitoring via a Count-Min sketch: ONE fixed-size "
    "sketch (eps=0.001, conf=0.99, seed=42) summarizes the full token "
    "stream; the top-20 exact tokens are probed against it INSIDE the plan "
    "— the 1-row sketch aggregate broadcasts into a crossJoin and an "
    "Arrow-batched UDF runs the pure-Python JVM-bit-equal prober "
    "(functions/sketches.py), so the builder stays lazy (explain() runs no "
    "job), Spark-Connect-safe, and nothing but the final 20 rows ever "
    "reaches the driver. Contract flags, deterministic given the seed: "
    "cms_ge_exact (Count-Min never underestimates) and cms_within_eps "
    "(estimate <= exact + ceil(eps·total)). Oracle verifies the exact "
    "counts/ranks and expects both flags to hold on every row.",
    oracle="""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok
        ), cnt AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_cnt
            FROM tok GROUP BY token
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, token)
                    AS BIGINT) AS rank,
               token, exact_cnt,
               tot.n AS total_tokens,
               CAST(1 AS BIGINT) AS cms_ge_exact,
               CAST(1 AS BIGINT) AS cms_within_eps
        FROM cnt, tot
        ORDER BY exact_cnt DESC, token
        LIMIT 20
    """,
)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))

    # ONE lazy plan, no driver-side jobs at build time: the 1-row sketch
    # aggregate broadcasts into a crossJoin with the exact top-20, and the
    # probe runs through the pure-Python CountMinSketchReader inside an
    # Arrow-batched UDF (functions/sketches.py — JVM-bit-equal, verified in
    # tests/test_sketches.py; no spark._jvm gateway, Spark-Connect-safe).
    sketch_row = tok.agg(
        F.count_min_sketch(
            "token", F.lit(_CMS_EPS), F.lit(_CMS_CONFIDENCE), F.lit(_CMS_SEED)
        ).alias("cms"),
        F.count("*").alias("total_tokens"),
    )
    top = (
        tok.groupBy("token")
        .agg(F.count("*").cast("bigint").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "token")
        .limit(20)
    )
    ranked = top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("exact_cnt"), "token"))
        .cast("bigint"),
    )
    probed = ranked.crossJoin(F.broadcast(sketch_row)).withColumn(
        "cms_est", cms_estimate(F.col("token"), F.col("cms"))
    )
    # additive error bound: ceil(eps * stream length), exact integer math
    bound = F.ceil(F.lit(_CMS_EPS) * F.col("total_tokens")).cast("bigint")
    flag = lambda c: F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("bigint")  # noqa: E731
    return probed.select(
        "rank",
        "token",
        "exact_cnt",
        "total_tokens",
        flag(F.col("cms_est") >= F.col("exact_cnt")).alias("cms_ge_exact"),
        flag(F.col("cms_est") <= F.col("exact_cnt") + bound).alias("cms_within_eps"),
    ).orderBy("rank")


#: DDSketch geometry (Masson/Rim/Lee, VLDB 2019): relative-error-bounded
#: quantiles from a log-binned histogram. gamma = (1+alpha)/(1-alpha); bucket
#: j = ceil(ln(x)/ln(gamma)); midpoint estimate 2*gamma^j/(gamma+1) is within
#: alpha relative error of any value in the bucket. Buckets are INTEGER
#: counts — deterministic, exactly mergeable by addition, and cross-engine
#: verifiable (unlike a sampling-based quantile sketch).
# geometry imported from the single shared definition (functions/quantiles)
# so the batch profile and the streaming rollup can never silently diverge
_DD_ALPHA = DD_ALPHA
_DD_GAMMA = dd_gamma(DD_ALPHA)
_DD_QS = DD_QS


@builder(
    "sketch_quantile_profile",
    tags=("sketch", "quantile", "ddsketch", "mergeable", "rollup"),
    doc="Relative-error quantile sketching (DDSketch geometry, alpha=1%): "
    "o_totalprice is log-binned per order status — the per-status sketch is "
    "a few hundred (bucket, count) integer pairs — and the GLOBAL sketch is "
    "the per-status sketches summed bucket-wise (re-aggregation; orders is "
    "NOT rescanned for the global histogram). p50/p95/p99 are read off each "
    "sketch by a cumulative-count walk (one window over the tiny bucket "
    "frame); every estimate is proven within alpha of the exact rank "
    "statistic by a contract flag. The exact columns cost a per-scope sort "
    "and are the ones you drop at 100 TB — the sketch path is one linear "
    "pass + KB-scale state, and sketches from different days/partitions "
    "merge by integer addition. DuckDB replays the identical binning, walk, "
    "and flags (bucket indexes and counts are exact integers; the midpoint "
    "estimate is rounded to 4 dp on both sides).",
    oracle=f"""
        WITH base AS (
            SELECT o_orderstatus AS scope, o_totalprice AS x FROM orders
        ),
        bstat AS (
            SELECT scope, CAST(CEIL(ln(x) / ln({_DD_GAMMA!r})) AS BIGINT) AS j,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM base GROUP BY scope, 2
        ),
        buckets AS (
            SELECT * FROM bstat
            UNION ALL
            SELECT 'GLOBAL', j, CAST(SUM(c) AS BIGINT) FROM bstat GROUP BY j
        ),
        walk AS (
            SELECT scope, j, c,
                   SUM(c) OVER (PARTITION BY scope ORDER BY j) AS cum,
                   SUM(c) OVER (PARTITION BY scope) AS n
            FROM buckets
        ),
        qb AS (
            SELECT scope, CAST(MAX(n) AS BIGINT) AS n_rows, COUNT(*) AS n_buckets,
                   {", ".join(
                       f"MIN(CASE WHEN cum >= CEIL({q} * n) THEN j END) AS q{p}_bucket"
                       for p, q in _DD_QS
                   )}
            FROM walk GROUP BY scope
        ),
        scoped AS (
            SELECT scope, x FROM base
            UNION ALL
            SELECT 'GLOBAL', x FROM base
        ),
        ranked AS (
            SELECT scope, x,
                   ROW_NUMBER() OVER (PARTITION BY scope ORDER BY x) AS rn,
                   COUNT(*) OVER (PARTITION BY scope) AS n
            FROM scoped
        ),
        ex AS (
            SELECT scope,
                   {", ".join(
                       f"ROUND(MIN(CASE WHEN rn = CEIL({q} * n) THEN x END), 4)"
                       f" AS q{p}_exact"
                       for p, q in _DD_QS
                   )}
            FROM ranked GROUP BY scope
        )
        SELECT qb.scope, qb.n_rows, qb.n_buckets,
               {", ".join(
                   f"qb.q{p}_bucket, "
                   f"ROUND(2 * POWER({_DD_GAMMA!r}, qb.q{p}_bucket)"
                   f" / ({_DD_GAMMA!r} + 1), 4) AS q{p}_est, ex.q{p}_exact"
                   for p, _ in _DD_QS
               )},
               CAST(1 AS BIGINT) AS within_alpha_all
        FROM qb JOIN ex ON qb.scope = ex.scope
        ORDER BY qb.scope
    """,
)
def sketch_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders", fan_out=True)
    base = o.select(F.col("o_orderstatus").alias("scope"), F.col("o_totalprice").alias("x"))

    # per-status sketches (integer bucket counts); dd_profile adds the
    # GLOBAL scope by re-aggregating them — the orders scan is not repeated
    # for the global histogram. Shared geometry: functions/quantiles.py
    # (the streaming rollup maintains the identical state).
    qb = dd_profile(dd_histogram(base, "scope", "x", _DD_ALPHA), _DD_ALPHA, _DD_QS)

    # exact rank statistics (contract reference — the droppable column)
    scoped = base.unionByName(base.select(F.lit("GLOBAL").alias("scope"), "x"))
    wrank = Window.partitionBy("scope").orderBy("x")
    ranked = scoped.select(
        "scope", "x",
        F.row_number().over(wrank).alias("rn"),
        F.count("*").over(Window.partitionBy("scope")).alias("n"),
    )
    ex = ranked.groupBy("scope").agg(
        *[
            F.round(
                F.min(F.when(F.col("rn") == F.ceil(q * F.col("n")), F.col("x"))), 4
            ).alias(f"q{p}_exact")
            for p, q in _DD_QS
        ]
    )

    within = None
    for p, _ in _DD_QS:
        ok = F.abs(F.col(f"q{p}_est") - F.col(f"q{p}_exact")) <= _DD_ALPHA * F.col(
            f"q{p}_exact"
        )
        within = ok if within is None else (within & ok)
    cols = ["scope", "n_rows", "n_buckets"]
    for p, _ in _DD_QS:
        cols += [f"q{p}_bucket", f"q{p}_est", f"q{p}_exact"]
    return (
        qb.join(ex, "scope")
        .select(*cols, F.when(within, F.lit(1)).otherwise(F.lit(0)).cast("bigint").alias("within_alpha_all"))
        .orderBy("scope")
    )

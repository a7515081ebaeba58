"""Embedding similarity-search operators over the embeddings table.

ANN building blocks for the training-data pipeline: brute-force cosine top-k
(the correctness baseline), label-blocked near-dup pairs, sign-pattern LSH
bucketing (the scale path), and centroid assignment (the IVF building block).

Spark side: per-row higher-order-function arithmetic (zip_with/aggregate) —
the distance math never leaves the JVM and never shuffles; only candidate
joins shuffle, and those are blocked (label / LSH bucket) so candidate sets
stay bounded as n grows. Oracle side: element joins via generate_series
(DuckDB 1.0 lacks WITH ORDINALITY).

Precision: elements cast to double before multiplication on both sides;
results rounded to 4 dp to absorb summation-order noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_flight_data_pipeline_spark.functions.vectors import (
    cosine,
    l2_distance,
    norm,
    sign_bucket,
    unit_dot,
    with_unit_embedding,
)
from aws_flight_data_pipeline_spark.plans.registry import query
from aws_flight_data_pipeline_spark.sources.testdata import load_table


def _r4(c):
    return F.round(c, 4)


# DuckDB helper: expand vectors to (vec_id, label, pos, val) rows.
# generate_subscripts+unnest expand in lockstep (DuckDB 1.0 has no lateral
# generate_series over a column and no WITH ORDINALITY).
_ELEMS_SQL = """
    SELECT vec_id, label,
           generate_subscripts(embedding, 1) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
"""

_NORM_SQL = f"""
    SELECT vec_id, label, SQRT(SUM(val * val)) AS vnorm
    FROM ({_ELEMS_SQL})
    GROUP BY vec_id, label
"""


@query(
    "embedding_norms_by_label",
    tags=("vector", "agg"),
    doc="Per-label L2-norm statistics — the embedding sanity/profile scan. "
    "Spark: aggregate() over the array per row (no explode, no shuffle before "
    "the final 10-group agg).",
    oracle=f"""
        WITH norms AS ({_NORM_SQL})
        SELECT label,
               COUNT(*) AS vec_count,
               ROUND(AVG(vnorm), 4) AS avg_norm,
               ROUND(MIN(vnorm), 4) AS min_norm,
               ROUND(MAX(vnorm), 4) AS max_norm
        FROM norms
        GROUP BY label
        ORDER BY label
    """,
)
def embedding_norms_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", norm(F.col("embedding")).alias("vnorm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("vec_count"),
            _r4(F.avg("vnorm")).alias("avg_norm"),
            _r4(F.min("vnorm")).alias("min_norm"),
            _r4(F.max("vnorm")).alias("max_norm"),
        )
        .orderBy("label")
    )


@query(
    "cosine_topk_bruteforce",
    tags=("vector", "similarity", "topk"),
    doc="Brute-force cosine top-k against a query vector (vec_id 0) — the ANN "
    "correctness baseline. Broadcast the 1-row query, per-row zip_with dot "
    "product, TakeOrderedAndProject top-k: a narrow map + bounded sort at any "
    "scale. Ordering on the rounded score + vec_id tiebreak keeps the top-k "
    "deterministic across engines.",
    oracle=f"""
        WITH elems AS ({_ELEMS_SQL}),
        q AS (SELECT pos, val AS qval FROM elems WHERE vec_id = 0),
        dots AS (
            SELECT e.vec_id, e.label,
                   SUM(e.val * q.qval)        AS dot,
                   SQRT(SUM(e.val * e.val))   AS en,
                   SQRT(SUM(q.qval * q.qval)) AS qn
            FROM elems e JOIN q ON e.pos = q.pos
            WHERE e.vec_id <> 0
            GROUP BY e.vec_id, e.label
        )
        SELECT vec_id, label, ROUND(dot / (en * qn), 4) AS cosine_sim
        FROM dots
        ORDER BY cosine_sim DESC, vec_id
        LIMIT 20
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Direct per-row cosine: with exactly one pair per row there is nothing to
    # amortize, so pre-normalization (unit_dot path) only adds projections —
    # measured slower here; it pays off in the quadratic pair join below.
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            _r4(cosine(F.col("embedding"), F.col("qe"))).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), "vec_id")
        .limit(20)
    )


@query(
    "embedding_near_dup_pairs",
    tags=("vector", "dedup", "join"),
    doc="Embedding-cosine near-duplicate detection, blocked by label (the "
    "cluster-blocking that bounds the pair count at scale): per-label pair "
    "stats + near-dup count above 0.9 cosine.",
    oracle=f"""
        WITH elems AS ({_ELEMS_SQL}),
        dots AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
                   SUM(a.val * b.val) AS dot
            FROM elems a
            JOIN elems b ON a.label = b.label AND a.pos = b.pos AND a.vec_id < b.vec_id
            GROUP BY a.vec_id, b.vec_id, a.label
        ),
        norms AS (
            SELECT vec_id, SQRT(SUM(val * val)) AS n FROM elems GROUP BY vec_id
        ),
        pairs AS (
            SELECT d.label, d.dot / (na.n * nb.n) AS cos
            FROM dots d JOIN norms na ON d.id_a = na.vec_id
                        JOIN norms nb ON d.id_b = nb.vec_id
        )
        SELECT label,
               COUNT(*) AS pair_count,
               ROUND(AVG(cos), 4) AS avg_cosine,
               ROUND(MAX(cos), 4) AS max_cosine,
               SUM(CASE WHEN cos > 0.9 THEN 1 ELSE 0 END) AS near_dup_pairs
        FROM pairs
        GROUP BY label
        ORDER BY label
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pre-normalize ONCE per row, then each pair is a single zip_with sweep
    # (unit_dot) — vs cosine() per pair, which re-walks both norms for every
    # one of the O(n²/labels) candidate pairs (~2.5× measured at sf0.1).
    e = with_unit_embedding(load_table(spark, sf_dir, "embeddings"))
    a = e.select("vec_id", "label", "unit").alias("a")
    b = e.select(
        F.col("vec_id").alias("b_vec_id"),
        F.col("unit").alias("b_unit"),
        F.col("label").alias("b_label"),
    )
    cos = unit_dot(F.col("a.unit"), F.col("b_unit"))
    return (
        a.join(b, (F.col("a.label") == F.col("b_label")) & (F.col("a.vec_id") < F.col("b_vec_id")))
        .select(F.col("a.label").alias("label"), cos.alias("cos"))
        .groupBy("label")
        .agg(
            F.count("*").alias("pair_count"),
            _r4(F.avg("cos")).alias("avg_cosine"),
            _r4(F.max("cos")).alias("max_cosine"),
            F.sum(F.when(F.col("cos") > 0.9, 1).otherwise(0)).alias("near_dup_pairs"),
        )
        .orderBy("label")
    )


@query(
    "vector_lsh_sign_buckets",
    tags=("vector", "lsh"),
    doc="Sign-pattern LSH bucketing (axis-aligned hyperplanes over the first "
    "6 dims): bucket sizes + per-bucket candidate-pair counts — the scale path "
    "that replaces the O(n²) scan; deterministic so the oracle computes the "
    "identical bucketing.",
    oracle="""
        WITH bucketed AS (
            SELECT vec_id,
                   CONCAT(
                       CASE WHEN CAST(embedding[1] AS DOUBLE) >= 0 THEN '+' ELSE '-' END,
                       CASE WHEN CAST(embedding[2] AS DOUBLE) >= 0 THEN '+' ELSE '-' END,
                       CASE WHEN CAST(embedding[3] AS DOUBLE) >= 0 THEN '+' ELSE '-' END,
                       CASE WHEN CAST(embedding[4] AS DOUBLE) >= 0 THEN '+' ELSE '-' END,
                       CASE WHEN CAST(embedding[5] AS DOUBLE) >= 0 THEN '+' ELSE '-' END,
                       CASE WHEN CAST(embedding[6] AS DOUBLE) >= 0 THEN '+' ELSE '-' END
                   ) AS bucket
            FROM embeddings
        )
        SELECT bucket,
               COUNT(*) AS bucket_size,
               CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS candidate_pairs
        FROM bucketed
        GROUP BY bucket
        ORDER BY bucket
    """,
)
def vector_lsh_sign_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(sign_bucket(F.col("embedding"), 6).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("bucket_size"))
        .withColumn(
            "candidate_pairs",
            (F.col("bucket_size") * (F.col("bucket_size") - 1) / 2).cast("bigint"),
        )
        .orderBy("bucket")
    )


@query(
    "ann_ivf_topk",
    tags=("vector", "ann", "ivf", "topk"),
    doc="IVF approximate-nearest-neighbor search: label cells act as the "
    "coarse quantizer (centroid per cell), the query probes its nProbe=3 "
    "nearest cells, and exact cosine top-k runs only inside probed cells. "
    "The scale path: centroids are a tiny broadcast table, the probe filter "
    "is a partition-pruning predicate when the lake is partitioned by cell, "
    "and the O(n) scan shrinks to nProbe/nCells of the data.",
    oracle=f"""
        WITH elems AS ({_ELEMS_SQL}),
        q AS (SELECT pos, val AS qval FROM elems WHERE vec_id = 0),
        centroids AS (
            SELECT label, pos, AVG(val) AS cval FROM elems GROUP BY label, pos
        ),
        cdist AS (
            SELECT c.label, SQRT(SUM((c.cval - q.qval) * (c.cval - q.qval))) AS cd
            FROM centroids c JOIN q ON c.pos = q.pos
            GROUP BY c.label
        ),
        probed AS (SELECT label FROM cdist ORDER BY ROUND(cd, 4), label LIMIT 3),
        cand AS (
            SELECT e.vec_id, e.label,
                   SUM(e.val * q.qval)        AS dot,
                   SQRT(SUM(e.val * e.val))   AS en,
                   SQRT(SUM(q.qval * q.qval)) AS qn
            FROM elems e JOIN q ON e.pos = q.pos
            WHERE e.vec_id <> 0 AND e.label IN (SELECT label FROM probed)
            GROUP BY e.vec_id, e.label
        )
        SELECT vec_id, label, ROUND(dot / (en * qn), 4) AS cosine_sim
        FROM cand
        ORDER BY cosine_sim DESC, vec_id
        LIMIT 10
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))

    # Coarse quantizer: element-wise centroid per cell (posexplode → avg →
    # re-assemble ordered array). 10 cells × 64 dims — driver-trivial, and at
    # scale this is the pre-trained quantizer loaded as a small table.
    elems = e.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "raw_val")
    ).withColumn("val", F.col("raw_val").cast("double"))
    centroids = (
        elems.groupBy("label", "pos")
        .agg(F.avg("val").alias("cval"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))), lambda s: s.cval
            ).alias("centroid")
        )
    )
    # Probe selection: nProbe=3 cells nearest the query (rounded distance +
    # label tiebreak keeps the probe set deterministic across engines).
    probed = (
        centroids.crossJoin(F.broadcast(q))
        .select("label", l2_distance(F.col("centroid"), F.col("qe")).alias("cd"))
        .orderBy(F.round("cd", 4), "label")
        .limit(3)
        .select("label")
    )
    # Exact search inside probed cells only — broadcast semi-join = the
    # partition-pruning predicate of a cell-partitioned lake.
    return (
        e.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probed), "label")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            _r4(cosine(F.col("embedding"), F.col("qe"))).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), "vec_id")
        .limit(10)
    )


@query(
    "centroid_assignment_outliers",
    tags=("vector", "centroid", "window"),
    doc="Per-label centroid (the IVF coarse-quantizer building block) + "
    "farthest-member outliers: element-wise centroid via posexplode+avg, L2 "
    "distance of each member to its centroid, top-3 farthest per label via "
    "window rank.",
    oracle=f"""
        WITH elems AS ({_ELEMS_SQL}),
        centroids AS (
            SELECT label, pos, AVG(val) AS cval FROM elems GROUP BY label, pos
        ), dists AS (
            SELECT e.vec_id, e.label,
                   SQRT(SUM((e.val - c.cval) * (e.val - c.cval))) AS centroid_dist
            FROM elems e JOIN centroids c ON e.label = c.label AND e.pos = c.pos
            GROUP BY e.vec_id, e.label
        ), ranked AS (
            SELECT vec_id, label, centroid_dist,
                   ROW_NUMBER() OVER (PARTITION BY label
                                      ORDER BY ROUND(centroid_dist, 4) DESC, vec_id) AS rn
            FROM dists
        )
        SELECT label, vec_id, ROUND(centroid_dist, 4) AS centroid_dist
        FROM ranked WHERE rn <= 3
        ORDER BY label, centroid_dist DESC, vec_id
    """,
)
def centroid_assignment_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    elems = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("pos", "raw_val"),
    ).withColumn("val", F.col("raw_val").cast("double"))
    centroids = elems.groupBy("label", "pos").agg(F.avg("val").alias("cval"))
    diff = F.col("val") - F.col("cval")
    dists = (
        elems.join(centroids, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum(diff * diff)).alias("centroid_dist"))
    )
    w = Window.partitionBy("label").orderBy(F.desc(F.round("centroid_dist", 4)), "vec_id")
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("label", "vec_id", _r4(F.col("centroid_dist")).alias("centroid_dist"))
        .orderBy("label", F.desc("centroid_dist"), "vec_id")
    )


@query(
    "ann_kmeans_train",
    tags=("vector", "ann", "iterative"),
    # Iterative algorithm — the non-SQL-expressible class (SURVEY §2 /
    # driver contract): rows-only check.
    oracle=None,
    doc="IVF coarse-quantizer TRAINING: k-means via 3 deterministic Lloyd "
    "iterations (k=8, init = first k vectors by vec_id). Each iteration is "
    "pure DataFrame ops — broadcast the k centroids, assign via min_by over "
    "the k distances, recompute centroids by posexplode+avg. Only the k×dim "
    "centroid table ever reaches the driver; assignments stay distributed, "
    "so the same loop trains on 100 TB of vectors. Returns per-cluster size "
    "+ mean within-cluster distance per iteration (monotonically "
    "non-increasing distortion = the convergence witness).",
)
def ann_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    k, iters = 8, 3
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .cache()
    )
    centroids = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    reports = []
    for it in range(iters):
        assigned = (
            e.crossJoin(F.broadcast(centroids))
            .select("vec_id", "v", "cid", l2_distance(F.col("v"), F.col("c")).alias("dist"))
            .groupBy("vec_id")
            .agg(
                F.min_by(F.struct("cid", "v", "dist"), F.struct("dist", "cid")).alias("best")
            )
            .select("vec_id", F.col("best.cid").alias("cid"), F.col("best.v").alias("v"),
                    F.col("best.dist").alias("dist"))
        )
        reports.append(
            assigned.groupBy("cid")
            .agg(
                F.count("*").alias("cluster_size"),
                F.round(F.avg("dist"), 4).alias("mean_distance"),
            )
            .withColumn("iteration", F.lit(it))
        )
        # Lloyd update: element-wise mean per cluster (posexplode + avg),
        # reassembled into ordered arrays — a tiny k×dim frame
        centroids = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("cval"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cval"))), lambda s: s.cval
                ).alias("c")
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select("iteration", "cid", "cluster_size", "mean_distance").orderBy(
        "iteration", "cid"
    )


@query(
    "vector_quantize_int8",
    tags=("vector", "quantization"),
    doc="Scalar int8 quantization of embeddings (the storage-compression "
    "step of a training-data vector store): symmetric per-vector scale = "
    "max|x|/127, quantize with round(x/scale), report reconstruction error "
    "per label. Pure higher-order array math; 4x storage cut with "
    "oracle-verified error bounds.",
    oracle=f"""
        WITH elems AS ({_ELEMS_SQL}),
        scales AS (
            SELECT vec_id, MAX(ABS(val)) / 127.0 AS scale
            FROM elems GROUP BY vec_id
        ),
        err AS (
            SELECT e.vec_id, e.label,
                   SQRT(SUM(POW(e.val - ROUND(e.val / s.scale) * s.scale, 2))) AS recon_err,
                   SQRT(SUM(e.val * e.val)) AS vnorm
            FROM elems e JOIN scales s ON e.vec_id = s.vec_id
            WHERE s.scale > 0
            GROUP BY e.vec_id, e.label
        )
        SELECT label,
               COUNT(*) AS vec_count,
               ROUND(AVG(recon_err), 4) AS avg_recon_err,
               ROUND(MAX(recon_err), 4) AS max_recon_err,
               ROUND(AVG(recon_err / vnorm), 4) AS avg_relative_err
        FROM err
        GROUP BY label
        ORDER BY label
    """,
)
def vector_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    e = e.withColumn("v", v).withColumn(
        "scale", F.array_max(F.transform("v", F.abs)) / 127.0
    ).filter(F.col("scale") > 0)
    sq_err = F.aggregate(
        F.col("v"),
        F.lit(0.0),
        lambda acc, x: acc + F.pow(x - F.round(x / F.col("scale")) * F.col("scale"), 2),
    )
    e = e.withColumn("recon_err", F.sqrt(sq_err)).withColumn("vnorm", norm(F.col("embedding")))
    return (
        e.groupBy("label")
        .agg(
            F.count("*").alias("vec_count"),
            _r4(F.avg("recon_err")).alias("avg_recon_err"),
            _r4(F.max("recon_err")).alias("max_recon_err"),
            _r4(F.avg(F.col("recon_err") / F.col("vnorm"))).alias("avg_relative_err"),
        )
        .orderBy("label")
    )

"""Product-quantization invariants (ann_pq_train_encode is rows-only — the
iterative-float class — so its laws are pinned here instead of an oracle):
code-space bounds, full coverage of every vector in every subspace, and
Lloyd-iteration distortion decrease vs the iteration-0 assignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.plans.registry import resolve
from aws_flight_data_pipeline_spark.sources.testdata import load_table

M, K = 8, 16


def test_pq_report_shape_and_bounds(spark, sf_dir):
    rows = resolve("ann_pq_train_encode")(spark, sf_dir).collect()
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    assert [r["m"] for r in rows] == list(range(M))
    for r in rows:
        assert r["n_vectors"] == n_vec  # every vector encoded in every subspace
        assert 1 <= r["codes_used"] <= K
        assert r["sq_err_total"] >= 0.0
        assert r["bytes_per_vector_raw"] == 256 and r["bytes_per_vector_pq"] == M


def test_pq_beats_single_code_baseline(spark, sf_dir):
    """Trained 16-code quantization must have lower distortion than collapsing
    each subspace to one global mean code (the K=1 degenerate codebook)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    sub = e.select(
        "vec_id",
        F.posexplode(F.array(*[F.slice("v", m * 8 + 1, 8) for m in range(M)])).alias("m", "sv"),
    )
    mean_c = (
        sub.select("m", F.posexplode("sv").alias("pos", "val"))
        .groupBy("m", "pos")
        .agg(F.avg("val").alias("cval"))
        .groupBy("m")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))), lambda s: s.cval
            ).alias("c")
        )
    )
    sq = F.aggregate(
        F.zip_with(F.col("sv"), F.col("c"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    baseline = {
        r["m"]: r["tot"]
        for r in sub.join(F.broadcast(mean_c), "m")
        .select("m", sq.alias("err"))
        .groupBy("m")
        .agg(F.sum("err").alias("tot"))
        .collect()
    }
    trained = {r["m"]: r["sq_err_total"] for r in resolve("ann_pq_train_encode")(spark, sf_dir).collect()}
    for m in range(M):
        assert trained[m] < baseline[m]

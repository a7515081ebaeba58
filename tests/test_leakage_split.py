"""Semantic invariants for the cluster-aware split and SemDeDup operators.

Value parity vs DuckDB is covered by tests/test_oracle_parity.py (both are
registered queries); these tests pin the PROPERTIES the operators exist for,
which parity alone cannot distinguish from a shared bug:

- leakage_safe_split: cluster hashing yields ZERO straddled clusters while
  per-doc hashing straddles some on the same corpus (the leakage the
  operator closes); the split still partitions every document exactly once.
- semantic_dedup_semdedup: the cluster assignment partitions the corpus,
  pruned+kept == cluster_size everywhere, and the keep-lowest-id rule never
  prunes a cluster's minimum member.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.plans.registry import resolve
from aws_flight_data_pipeline_spark.sources.testdata import load_table


def test_cluster_split_closes_the_leak(spark, sf_dir):
    rows = resolve("leakage_safe_split")(spark, sf_dir).collect()
    assert {r["split"] for r in rows} == {"train", "validation", "test"}
    # the audit pair: naive per-doc hashing straddles, cluster hashing never
    assert all(r["safe_straddled_clusters"] == 0 for r in rows)
    assert rows[0]["naive_straddled_clusters"] > 0
    # reassignment actually happened (the operator is not a no-op rename)
    assert rows[0]["docs_reassigned"] > 0
    # splits partition the corpus exactly
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["doc_count"] for r in rows) == n_docs


def test_cluster_split_is_cluster_constant(spark, sf_dir):
    """Every near-dup pair (J >= 0.5) lands in ONE split — checked directly
    against the pair table, independently of the CC labeling the operator
    used internally."""
    from aws_flight_data_pipeline_spark.plans.curation_queries import (
        _md5_bucket,
        _CC_ITERATIONS,
    )
    from aws_flight_data_pipeline_spark.operators.graph import (
        connected_components,
        symmetrize,
    )
    from aws_flight_data_pipeline_spark.plans.text_queries import (
        scored_pairs_table,
    )

    scored = scored_pairs_table(spark, sf_dir)
    edges = symmetrize(
        scored.filter(F.col("j") >= 0.5).select(
            F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
        )
    )
    d = load_table(spark, sf_dir, "documents")
    labels = connected_components(
        d.select(F.col("doc_id").alias("node")), edges, _CC_ITERATIONS
    )
    bucket = _md5_bucket(F.col("label"), 100)
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    doc_split = labels.select(F.col("node").alias("doc_id"), split.alias("split"))
    pair_splits = (
        scored.filter(F.col("j") >= 0.5)
        .join(doc_split.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            doc_split.select(
                F.col("doc_id").alias("b_id"), F.col("split").alias("b_split")
            ),
            F.col("doc_b") == F.col("b_id"),
        )
        .filter(F.col("sa.split") != F.col("b_split"))
    )
    assert pair_splits.count() == 0


def test_semdedup_accounting(spark, sf_dir):
    rows = resolve("semantic_dedup_semdedup")(spark, sf_dir).collect()
    from aws_flight_data_pipeline_spark.plans.vector_queries import _SEMDEDUP_K

    assert 0 < len(rows) <= _SEMDEDUP_K
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    # k-means assignment partitions the corpus
    assert sum(r["cluster_size"] for r in rows) == n_vecs
    for r in rows:
        assert r["pruned_docs"] + r["kept_docs"] == r["cluster_size"]
        assert r["near_dup_pairs"] >= r["pruned_docs"]
        assert r["candidate_pairs"] >= r["near_dup_pairs"]
    # the calibrated threshold fires on this corpus (real positives)
    assert sum(r["near_dup_pairs"] for r in rows) > 0
    assert sum(r["pruned_docs"] for r in rows) > 0


def test_semdedup_never_prunes_cluster_minimum(spark, sf_dir):
    """Keep-lowest-id election: the smallest vec_id of every cluster always
    survives (it can never appear as the GREATER id of a within-cluster
    pair), so at least one representative per cluster is kept."""
    rows = resolve("semantic_dedup_semdedup")(spark, sf_dir).collect()
    for r in rows:
        assert r["kept_docs"] >= 1

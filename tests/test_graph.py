"""Min-label propagation (operators/graph.py): exact components on known
graphs, the hop-per-round propagation bound, and convergence of the
3-round setting used by dedup_cluster_components on real corpus pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.operators.graph import (
    propagate_min_labels,
    symmetrize,
)
from aws_flight_data_pipeline_spark.plans.text_queries import scored_pair_frame
from aws_flight_data_pipeline_spark.sources.testdata import load_table


def _labels(spark, node_ids, edge_pairs, iterations):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "node long")
    edges = symmetrize(spark.createDataFrame(edge_pairs, "u long, v long"))
    out = propagate_min_labels(nodes, edges, iterations)
    return {r["node"]: r["label"] for r in out.collect()}


def test_triangle_chain_and_singleton(spark):
    # triangle {1,2,3}, chain 10-11-12, singleton 20
    got = _labels(spark, [1, 2, 3, 10, 11, 12, 20], [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)], 3)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20}


def test_propagation_is_one_hop_per_round(spark):
    # chain 0-1-2-3-4: node 4 is 4 hops from the minimum, so 3 rounds are
    # NOT enough (the documented bound) and 4 rounds converge it
    chain = [(i, i + 1) for i in range(4)]
    after3 = _labels(spark, list(range(5)), chain, 3)
    assert after3[4] != 0 and after3[3] == 0
    after4 = _labels(spark, list(range(5)), chain, 4)
    assert set(after4.values()) == {0}


def test_symmetrize_doubles_edges(spark):
    e = symmetrize(spark.createDataFrame([(1, 2), (3, 4)], "u long, v long"))
    assert sorted((r["u"], r["v"]) for r in e.collect()) == [(1, 2), (2, 1), (3, 4), (4, 3)]


def test_corpus_components_converged_at_3_rounds(spark, sf_dir):
    # on the real corpus the 3-round unrolling must already be a fixpoint:
    # round 4 changes no label (near-dup components have tiny diameter)
    d = load_table(spark, sf_dir, "documents")
    edges = symmetrize(
        scored_pair_frame(d)
        .filter(F.col("j") >= 0.5)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    ).cache()
    nodes = d.select(F.col("doc_id").alias("node"))
    l3 = propagate_min_labels(nodes, edges, 3)
    l4 = propagate_min_labels(nodes, edges, 4)
    assert l3.exceptAll(l4).count() == 0 and l4.exceptAll(l3).count() == 0

"""Connected components via fixed-iteration min-label propagation.

The dedup pipeline's keep-first survivor rule flags any doc with a
smaller-id verified partner — exact when near-dup clusters collide pairwise
in the LSH banding, but transitive chains (A~B~C where A,C never share a
band) need real components. This is the standard distributed formulation
(Hash-Min, e.g. the CC-MR / Pegasus family): every node repeatedly adopts
the minimum label in its closed neighborhood; after k rounds each label has
propagated k hops, so components of diameter <= k are exact. Each round is
one equi-join + one hash aggregate — no driver-side graph, no recursion in
the engine, and the label frame (2 ints per node) is the only state.

The caller picks ``iterations`` >= the expected component diameter (near-dup
clusters are tiny); convergence can be asserted by comparing round k with
k+1 (see tests/test_graph.py and the sf0.01 convergence test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from aws_flight_data_pipeline_spark.functions.caching import tracked_cache


def symmetrize(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Both directions of an undirected edge list (columns ``u``, ``v``)."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    return fwd.unionAll(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))


def propagate_min_labels(
    nodes: DataFrame, edges: DataFrame, iterations: int = 3
) -> DataFrame:
    """Min-label propagation: ``(node, label)`` after ``iterations`` rounds.

    ``nodes`` is a 1-column frame (``node``); ``edges`` a symmetric 2-column
    frame (``u``, ``v``). Label(0) = node id; label(k+1) = min over the
    closed neighborhood of label(k). Every round's result is cached: the
    next round references it twice (self + neighbor side), and without the
    cache Catalyst re-evaluates the whole prior lineage per reference —
    exponential blowup in the iteration count. At scale the per-round state
    is the (node, label) pair table, shuffled once on node id per round.
    """
    labels = nodes.select(F.col("node"), F.col("node").alias("label"))
    for _ in range(iterations):
        labels = labels.transform(tracked_cache)
        neighbor_min = (
            edges.join(
                labels.select(F.col("node").alias("v"), F.col("label").alias("nb_label")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("nb_label").alias("nb_min"))
            .select(F.col("u").alias("node"), "nb_min")
        )
        labels = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nb_min", F.col("label"))).alias("label"),
        )
    return labels

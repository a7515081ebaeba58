"""Iterative graph analytics over the document corpus: PageRank, unrolled
to an exact integer-arithmetic oracle.

Companion to :mod:`..operators.graph` (connected components): PageRank is
the OTHER canonical iterative message-passing shape — per-round rank mass
flows along edges (join → groupBy), k rounds chained as one lazy plan.
The reference has no iterative engine (Athena cannot loop); this follows
the same contract the k-means queries established: a FIXED number of
rounds unrolled into chained CTEs so DuckDB replays the identical
computation and the driver hash-verifies every intermediate convention.

Integer discipline: ranks live in units of 1e-12 (BIGINT). Per round,
each node's outflow is ``rank div out_degree`` and the damped update is
``base + (17 * inflow) div 20`` — floor division on non-negative BIGINTs
is identical in Spark (`div`) and DuckDB (`//`), so there is no float
anywhere and the hash match is exact, not tolerance-based.

The link graph is synthesized deterministically from the contiguous
doc_id domain (two out-links per doc: ``(31*id+7) % N`` and
``(17*id+3) % N``, self-loops dropped, duplicates collapsed) — the SAME
expression on both engines, so the graph itself is part of the verified
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.functions.caching import tracked_cache
from aws_flight_data_pipeline_spark.plans.registry import builder
from aws_flight_data_pipeline_spark.sources.testdata import load_table

_ROUNDS = 3
_SCALE = 10**12


def _pagerank_oracle(rounds: int) -> str:
    prev = "r0"
    iters = []
    for i in range(1, rounds + 1):
        this = f"r{i}"
        iters.append(
            f"""{this} AS (
            SELECT d.doc_id AS src,
                   150000000000 // (SELECT n FROM nn)
                   + (17 * COALESCE(SUM(c.c), 0)) // 20 AS rank
            FROM documents d
            LEFT JOIN (
                SELECT e.dst, r.rank // g.deg AS c
                FROM edges e
                JOIN {prev} r USING (src)
                JOIN deg g USING (src)
            ) c ON c.dst = d.doc_id
            GROUP BY d.doc_id
        )"""
        )
        prev = this
    chain = ",\n        ".join(iters)
    return f"""
        WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        edges AS (
            SELECT DISTINCT src, dst FROM (
                SELECT doc_id AS src, (doc_id * 31 + 7) % (SELECT n FROM nn) AS dst
                FROM documents
                UNION ALL
                SELECT doc_id, (doc_id * 17 + 3) % (SELECT n FROM nn)
                FROM documents
            ) WHERE src <> dst
        ),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        r0 AS (
            SELECT doc_id AS src,
                   1000000000000 // (SELECT n FROM nn) AS rank
            FROM documents
        ),
        {chain}
        SELECT src AS doc_id, CAST(rank AS BIGINT) AS rank_unit
        FROM {prev}
        ORDER BY rank DESC, doc_id
        LIMIT 20
    """


@builder(
    "graph_pagerank_unrolled",
    tags=("graph", "iterative", "pagerank", "scale"),
    doc=f"PageRank over the synthesized doc-link graph, {_ROUNDS} rounds "
    "unrolled: per round, rank outflow = rank div out_degree along each "
    "edge (one equi join), inflow = one hash-agg by target, damped update "
    "= base + (17 * inflow) div 20 — all BIGINT in 1e-12 rank units, so "
    "the DuckDB chained-CTE oracle matches bit-for-bit (the k-means "
    "contract applied to message passing). Edges/degrees are computed "
    "once and cached (KB-scale here; at 100 TB the edge frame is the "
    "natural bucketed table and each round is one co-partitioned "
    "join + agg — no driver-side state beyond the node count). Top-20 "
    "by final rank via TakeOrderedAndProject.",
    oracle=_pagerank_oracle(_ROUNDS),
)
def graph_pagerank_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()  # one scalar to the driver: the only non-lazy step
    e1 = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 31 + 7) % n).alias("dst"),
    )
    e2 = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 17 + 3) % n).alias("dst"),
    )
    edges = (
        e1.unionByName(e2)
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .transform(tracked_cache)
    )
    # cached: deg joins into every unrolled round — uncached, each round
    # re-ran the degree shuffle from the edge cache (r14, guide §2.4)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).transform(tracked_cache)
    ranks = docs.select(
        F.col("doc_id").alias("src"),
        F.lit(_SCALE // n).cast("bigint").alias("rank"),
    )
    base = 150_000_000_000 // n
    for _ in range(_ROUNDS):
        contrib = (
            edges.join(ranks, "src")
            .join(deg, "src")
            .select("dst", F.expr("rank div deg").alias("c"))
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            docs.select(F.col("doc_id").alias("src"))
            .join(inflow.withColumnRenamed("dst", "src"), "src", "left")
            .select(
                "src",
                (F.lit(base) + F.expr("(17 * coalesce(s, 0)) div 20"))
                .cast("bigint")
                .alias("rank"),
            )
        )
    return (
        ranks.orderBy(F.desc("rank"), "src")
        .limit(20)
        .select(F.col("src").alias("doc_id"), F.col("rank").alias("rank_unit"))
    )

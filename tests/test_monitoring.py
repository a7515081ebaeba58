"""Workload-monitor tests — plan-fact extraction and recommendation rules
(the Spark-first analog of the reference's query_optimizer report; see
operators/monitoring.py header for the file:line map)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.operators.monitoring import (
    WorkloadMonitor,
    analyze_plan,
    recommend,
)
from aws_flight_data_pipeline_spark.plans.registry import _ensure_loaded, resolve
from aws_flight_data_pipeline_spark.sources.testdata import load_table

_ensure_loaded()


def test_monitor_records_pushdown_query(spark, sf_dir):
    mon = WorkloadMonitor(spark)
    m = mon.run("pricing_summary", resolve("pricing_summary")(spark, sf_dir))
    assert m.query_type == "aggregate_query"
    assert m.pushed_filters  # the shipdate predicate reaches the scan
    assert m.output_rows > 0 and m.wall_seconds > 0
    assert m.cartesian_products == 0
    # a pushdown-clean single-agg query should not trip the scan rules
    assert not any(r.startswith(("no_pushed_filters", "cartesian_product")) for r in m.recommendations)


def test_monitor_flags_cartesian_and_full_scan(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    bad = n.crossJoin(r.hint("shuffle_replicate_nl"))  # deliberate cartesian
    mon = WorkloadMonitor(spark)
    m = mon.run("deliberate_cartesian", bad)
    assert m.cartesian_products >= 1
    assert any(r.startswith("cartesian_product") for r in m.recommendations)
    assert any(r.startswith("no_pushed_filters") for r in m.recommendations)


def test_history_is_a_dataframe_table(spark, sf_dir):
    mon = WorkloadMonitor(spark)
    mon.run("q1", resolve("pricing_summary")(spark, sf_dir))
    mon.run("q2", resolve("dim_join_rollup")(spark, sf_dir))
    h = mon.history()
    assert h.count() == 2
    assert {r["name"] for r in h.collect()} == {"q1", "q2"}
    # dim join broadcasts — the workload row records the join strategy
    q2 = h.filter(F.col("name") == "q2").first()
    assert q2["broadcast_joins"] >= 1 and q2["sort_merge_joins"] == 0


def test_recommendation_rules_units():
    base = {
        "scan_count": 1,
        "shuffle_count": 1,
        "query_type": "scan_query",
        "pushed_filters": True,
        "partition_filters": True,
        "broadcast_joins": 0,
        "sort_merge_joins": 0,
        "cartesian_products": 0,
    }
    assert recommend(base, 0.5) == ()
    assert any("shuffle_heavy" in r for r in recommend({**base, "shuffle_count": 6}, 0.5))
    assert any("slow_query" in r for r in recommend(base, 31.0))
    assert any(
        "sort_merge_join_only" in r for r in recommend({**base, "sort_merge_joins": 1}, 0.5)
    )


def test_analyze_plan_counts():
    plan = (
        "Exchange hashpartitioning(x, 32)\nExchange rangepartitioning(y)\n"
        "Location: InMemoryFileIndex [file:/tmp/a]\nPushedFilters: [IsNotNull(x)]\n"
        "PartitionFilters: []\nBroadcastHashJoin\nHashAggregate"
    )
    f = analyze_plan(plan)
    assert f["shuffle_count"] == 2 and f["scan_count"] == 1
    assert f["pushed_filters"] and not f["partition_filters"]
    assert f["query_type"] == "join_query"


def test_ann_pipeline_end_to_end_semantics(spark, sf_dir):
    # composed IVF lifecycle: top-10 inside probed trained cells, each hit
    # annotated against the brute-force top-10 (the recall witness)
    rows = resolve("ann_pipeline_end_to_end")(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r["vec_id"] != 0 for r in rows)  # the query never matches itself
    sims = [r["cosine_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    # probe pruning must not collapse recall on this corpus
    assert sum(1 for r in rows if r["in_brute_topk"]) >= 5

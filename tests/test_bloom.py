"""Bloom semi-join pruning (functions/bloom.py): zero false negatives,
bounded false-positive rate, exactness of the composed semi join, the
pruning actually removing rows before the shuffle, the large-filter path
staying JVM-side (no driver materialization, O(1) plan size), and the
selectivity guard skipping useless blooms."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.functions.bloom import (
    WORDS_COL,
    bloom_prune,
    bloom_semi_join,
    build_bloom,
    optimal_params,
)


def test_optimal_params_shapes():
    m, k = optimal_params(10_000, 0.01)
    assert m % 64 == 0 and m >= 10_000 * 9  # ~9.6 bits/key at 1%
    assert k == 3  # capped at DEFAULT_K_MAX (probe CPU beats marginal fpp)
    m7, k7 = optimal_params(10_000, 0.01, k_max=16)
    assert m7 == m and 5 <= k7 <= 9  # uncapped textbook k
    assert optimal_params(0) == (64, 1)


def test_bloom_frame_shape(spark):
    keys = spark.range(0, 100).select(F.col("id").alias("key"))
    m, k = optimal_params(100, 0.01)
    bloom = build_bloom(keys, "key", m, k)
    rows = bloom.collect()
    assert len(rows) == 1
    assert len(rows[0][WORDS_COL]) == m // 64


def test_no_false_negatives(spark):
    keys = spark.range(0, 5000).select((F.col("id") * 7919 + 13).alias("key"))
    m, k = optimal_params(5000, 0.01)
    bloom = build_bloom(keys, "key", m, k)
    # every inserted key must pass the probe
    assert bloom_prune(keys, "key", bloom, k).count() == 5000


def test_false_positive_rate_is_bounded(spark):
    member = spark.range(0, 5000).select((F.col("id") * 2 + 1).alias("key"))  # odd
    m, k = optimal_params(5000, 0.01)
    bloom = build_bloom(member, "key", m, k)
    probe = spark.range(0, 20000).select((F.col("id") * 2).alias("key"))  # even
    fp = bloom_prune(probe, "key", bloom, k).count()
    assert fp / 20000 < 0.05  # 5x headroom over the 1% design point


def test_bit63_probe_works(spark):
    # a key whose first probe lands on bit 63 of some word must round-trip
    # (shift semantics are overflow-free even under ANSI)
    keys = spark.range(0, 4096).select(F.col("id").alias("key"))
    bloom = build_bloom(keys, "key", 1024, 3)
    words = bloom.first()[WORDS_COL]
    assert any(w < 0 for w in words)  # some word has bit 63 set (sign bit)
    assert bloom_prune(keys, "key", bloom, 3).count() == 4096


def test_large_filter_stays_jvm_side(spark):
    # 150k keys -> ~1.4 Mbit filter (~22k words). The round-6 literal-array
    # implementation took ~50 s to even CONSTRUCT this plan (one F.lit per
    # word); the frame path must both build fast and stay exact. The probe
    # side is 600k rows with a 25% hit rate.
    n_keys = 150_000
    keys = spark.range(0, n_keys).select((F.col("id") * 4).alias("key"))
    m, k = optimal_params(n_keys, 0.01)
    assert m // 64 > 20_000  # genuinely large: the r6 blowup regime
    bloom = build_bloom(keys, "key", m, k)
    probe = spark.range(0, 600_000).select(F.col("id").alias("key"))
    kept = bloom_prune(probe, "key", bloom, k).count()
    # all 150k members kept (no false negatives), ~1% fp on the other 450k
    assert 150_000 <= kept <= 150_000 + int(450_000 * 0.05)
    # and the plan is O(1)-size: the words ride as a scalar subquery,
    # never as an in-plan literal array (22k words as literals would
    # print at ~600 KB across the four plan sections; the subquery plan
    # repeats per probe reference but never embeds the words)
    plan = bloom_prune(probe, "key", bloom, k)._jdf.queryExecution().toString()
    assert "scalar-subquery" in plan
    assert len(plan) < 200_000


def test_semi_join_is_exact(spark, sf_dir):
    from aws_flight_data_pipeline_spark.sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    hot = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 200000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    plain = li.join(hot.distinct(), on="l_orderkey", how="left_semi")
    # max_key_fraction=1.0 forces the bloom path regardless of selectivity
    via_bloom = bloom_semi_join(li, hot, "l_orderkey", fpp=0.01, max_key_fraction=1.0)
    assert plain.count() == via_bloom.count()
    assert plain.exceptAll(via_bloom).count() == 0
    assert via_bloom.exceptAll(plain).count() == 0


def test_selectivity_guard_skips_useless_bloom(spark):
    # driving keys cover most of the fact domain -> the bloom would keep
    # ~everything; with a known key count the guard must plan the plain
    # semi join (no probes)
    big = spark.range(0, 10_000).select(F.col("id").alias("key"))
    small = spark.range(0, 7_000).select(F.col("id").alias("key"))
    out = bloom_semi_join(big, small, "key", n_keys=7_000, max_key_fraction=0.1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" not in plan and "element_at" not in plan
    assert out.count() == 7_000
    # selective keys -> bloom IS planned
    tiny = spark.range(0, 100).select(F.col("id").alias("key"))
    out2 = bloom_semi_join(big, tiny, "key", n_keys=100, max_key_fraction=0.1)
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan2 and "element_at" in plan2
    assert out2.count() == 100


def test_boundary_sizing_without_counts(spark):
    # no n_keys and no n_big: sizing falls back to Catalyst's row
    # estimate at the guard boundary — zero extra jobs, result still
    # exact even though the keys saturate well past the boundary
    big = spark.range(0, 10_000).select(F.col("id").alias("key"))
    small = spark.range(0, 5_000).select((F.col("id") * 2).alias("key"))
    out = bloom_semi_join(big, small, "key", max_key_fraction=0.1)
    assert out.count() == 5_000


def test_prune_reduces_rows_superset_of_matches(spark, sf_dir):
    from aws_flight_data_pipeline_spark.sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    hot = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 200000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
        .distinct()
    )
    n_keys = hot.count()
    m, k = optimal_params(n_keys, 0.01)
    bloom = build_bloom(hot, "l_orderkey", m, k)
    pruned = bloom_prune(li, "l_orderkey", bloom, k)
    true_matches = li.join(hot, on="l_orderkey", how="left_semi").count()
    n_pruned = pruned.count()
    assert true_matches <= n_pruned  # superset, never a lost match
    assert n_pruned < li.count()  # and it genuinely filtered


def test_prune_temp_views_released(spark):
    # bloom_prune registers a per-call session temp view; release_tracked
    # (the same hook that drops tracked caches) must drop it — a long-lived
    # session otherwise accumulates catalog entries without bound
    from aws_flight_data_pipeline_spark.functions.caching import release_tracked

    def _views():
        return {
            t.name
            for t in spark.catalog.listTables()
            if t.isTemporary and t.name.startswith("_bloom_")
        }

    release_tracked()
    before = _views()
    big = spark.range(0, 1000).select(F.col("id").alias("key"))
    keys = spark.range(0, 50).select(F.col("id").alias("key"))
    m, k = optimal_params(50, 0.01)
    pruned = bloom_prune(big, "key", build_bloom(keys, "key", m, k), k, m)
    during = _views()
    assert len(during - before) == 1
    # the already-built frame stays evaluable after the drop (eager analysis
    # bound the view's plan at build time)
    release_tracked()
    assert _views() <= before
    assert pruned.count() >= 50

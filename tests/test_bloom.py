"""Bloom semi-join pruning (functions/bloom.py): zero false negatives,
bounded false-positive rate, exactness of the composed semi join, and the
pruning actually removing rows before the shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.functions.bloom import (
    bloom_prune,
    bloom_semi_join,
    build_bloom,
    optimal_params,
)


def test_optimal_params_shapes():
    m, k = optimal_params(10_000, 0.01)
    assert m % 64 == 0 and m >= 10_000 * 9  # ~9.6 bits/key at 1%
    assert 5 <= k <= 9
    assert optimal_params(0) == (64, 1)


def test_no_false_negatives(spark):
    keys = spark.range(0, 5000).select((F.col("id") * 7919 + 13).alias("key"))
    m, k = optimal_params(5000, 0.01)
    words = build_bloom(keys, "key", m, k)
    # every inserted key must pass the probe
    assert bloom_prune(keys, "key", words, k).count() == 5000


def test_false_positive_rate_is_bounded(spark):
    member = spark.range(0, 5000).select((F.col("id") * 2 + 1).alias("key"))  # odd
    m, k = optimal_params(5000, 0.01)
    words = build_bloom(member, "key", m, k)
    probe = spark.range(0, 20000).select((F.col("id") * 2).alias("key"))  # even
    fp = bloom_prune(probe, "key", words, k).count()
    assert fp / 20000 < 0.05  # 5x headroom over the 1% design point


def test_bit63_probe_works(spark):
    # a key whose first probe lands on bit 63 of some word must round-trip
    # (shift semantics are overflow-free even under ANSI)
    keys = spark.range(0, 4096).select(F.col("id").alias("key"))
    words = build_bloom(keys, "key", 1024, 3)
    assert any(w < 0 for w in words)  # some word has bit 63 set (sign bit)
    assert bloom_prune(keys, "key", words, 3).count() == 4096


def test_semi_join_is_exact(spark, sf_dir):
    from aws_flight_data_pipeline_spark.sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    hot = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 200000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    plain = li.join(hot.distinct(), on="l_orderkey", how="left_semi")
    via_bloom = bloom_semi_join(li, hot, "l_orderkey", fpp=0.01)
    assert plain.count() == via_bloom.count()
    assert plain.exceptAll(via_bloom).count() == 0
    assert via_bloom.exceptAll(plain).count() == 0


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
    from aws_flight_data_pipeline_spark.functions.bloom import optimal_params

    m, k = optimal_params(n_keys, 0.01)
    words = build_bloom(hot, "l_orderkey", m, k)
    pruned = bloom_prune(li, "l_orderkey", words, k)
    true_matches = li.join(hot, on="l_orderkey", how="left_semi").count()
    n_pruned = pruned.count()
    assert true_matches <= n_pruned  # superset, never a lost match
    assert n_pruned < li.count()  # and it genuinely filtered

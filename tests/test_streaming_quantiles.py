"""Streaming DDSketch quantile rollup: stream==batch EXACT equality.

Integer bucket counts merge by addition, so unlike the HLL/CMS tiers
(bit-identical by register-max/table-add structure) the streamed state must
EQUAL the batch histogram row-for-row — the strongest stream/batch
invariance in the state family. Replay safety (strictly-before-batch reads)
is pinned by reading the state at an intermediate version.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.functions.quantiles import dd_histogram, dd_profile
from aws_flight_data_pipeline_spark.streaming.streams import (
    quantile_rollup_snapshot,
    read_quantile_state,
    streaming_quantile_rollup,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_quantile_state_equals_batch_histogram(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderstatus").alias("scope"),
        F.col("o_totalprice").alias("x"),
        F.col("o_orderkey").alias("k"),
    )
    src = str(tmp_path / "incoming")
    for chunk in range(3):
        orders.filter(F.col("k") % 3 == chunk).drop("k").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema("scope string, x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "q_state")
    q = streaming_quantile_rollup(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # one state version per micro-batch
    versions = sorted(v for v in os.listdir(state) if v.startswith("v"))
    assert len(versions) == 3

    batch_hist = dd_histogram(orders.drop("k"), "scope", "x")
    final = read_quantile_state(spark, state)
    assert _rows(final) == _rows(batch_hist)  # EXACT, row-for-row

    # the profile read off the streamed state == the batch profile
    assert _rows(quantile_rollup_snapshot(final)) == _rows(dd_profile(batch_hist))


def test_intermediate_state_is_strictly_before_batch(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderstatus").alias("scope"),
        F.col("o_totalprice").alias("x"),
        F.col("o_orderkey").alias("k"),
    )
    src = str(tmp_path / "incoming")
    for chunk in range(2):
        orders.filter(F.col("k") % 2 == chunk).drop("k").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("scope string, x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "q_state")
    q = streaming_quantile_rollup(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # a replay of batch 1 must see EXACTLY v0 = chunk 0's histogram — the
    # guard that makes the at-least-once merge idempotent
    v0 = read_quantile_state(spark, state, before_batch=1)
    chunk0 = dd_histogram(orders.filter(F.col("k") % 2 == 0).drop("k"), "scope", "x")
    assert _rows(v0) == _rows(chunk0)
    assert read_quantile_state(spark, state, before_batch=0) is None


def test_state_version_pruning_keeps_reads_intact(spark, tmp_path):
    from aws_flight_data_pipeline_spark.streaming.streams import prune_state_versions

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderstatus").alias("scope"),
        F.col("o_totalprice").alias("x"),
        F.col("o_orderkey").alias("k"),
    )
    src = str(tmp_path / "incoming")
    for chunk in range(4):
        orders.filter(F.col("k") % 4 == chunk).drop("k").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("scope string, x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "q_state")
    q = streaming_quantile_rollup(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    before = _rows(read_quantile_state(spark, state))
    stats = prune_state_versions(state, keep_last=2)
    assert stats == {"versions_dropped": 2, "versions_kept": 2}
    # the newest merged state is untouched — reads identical
    assert _rows(read_quantile_state(spark, state)) == before
    assert _rows(read_quantile_state(spark, state, before_batch=3)) is not None

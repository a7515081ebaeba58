"""Streaming SCD2 dimension maintenance: stream==batch interval equality.

The dimension built by folding an in-order change stream micro-batch by
micro-batch must EQUAL the intervals derived from the batch run
construction over the concatenated events — including runs that span
micro-batch boundaries (same state across the cut extends the open row
instead of opening a version). Replay idempotency rides the versioned
sink's batch-id manifest stamp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.operators.sequence import runs_to_intervals, state_runs
from aws_flight_data_pipeline_spark.sources import versioned as vt
from aws_flight_data_pipeline_spark.streaming.streams import streaming_scd2_dimension

SF_DIR = "/root/testdata/sf0.001"
_COLS = ("user_id", "state", "from_us", "to_us")


def _rows(df):
    return sorted((r[c] for c in _COLS) for r in df.collect())


def _sorted_rows(df):
    return sorted(tuple(r[c] for c in _COLS) for r in df.collect())


def test_streamed_dimension_equals_batch_intervals(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "event_id", "ts", "event_type"
    )
    # three ARRIVAL-ORDERED chunks (time terciles) — SCD2 folding assumes
    # in-order delivery, so the cut must respect event time
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    t1 = lo + (hi - lo) / 3
    t2 = lo + 2 * (hi - lo) / 3
    src = str(tmp_path / "incoming")
    for cond in (F.col("ts") <= t1, (F.col("ts") > t1) & (F.col("ts") <= t2), F.col("ts") > t2):
        events.where(cond).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    dim = str(tmp_path / "dim")
    q = streaming_scd2_dimension(stream, dim, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    assert len(vt._list_versions(dim)) == 3  # one snapshot per micro-batch
    streamed = vt.read(spark, dim)
    batch = runs_to_intervals(state_runs(events))
    assert _sorted_rows(streamed) == _sorted_rows(batch)

    # every user has exactly one open (current) row
    open_counts = streamed.where(F.col("to_us").isNull()).groupBy("user_id").count()
    assert open_counts.where("count != 1").count() == 0

    # intermediate snapshot == batch intervals over the first chunk only
    v0 = vt.read(spark, dim, version=0)
    chunk0 = events.where(F.col("ts") <= t1)
    assert _sorted_rows(v0) == _sorted_rows(runs_to_intervals(state_runs(chunk0)))


def test_replayed_batch_is_a_noop(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "event_id", "ts", "event_type"
    ).limit(200)
    src = str(tmp_path / "incoming")
    events.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    dim = str(tmp_path / "dim")
    q = streaming_scd2_dimension(stream, dim, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    before = vt.latest_version(dim)

    # simulate an at-least-once replay of batch 0 (crash before checkpoint
    # commit): a fresh stream over the SAME source with a FRESH checkpoint
    # re-delivers batch 0 — the manifest stamp must make it a no-op
    q2 = streaming_scd2_dimension(
        spark.readStream.schema(events.schema).parquet(src),
        dim,
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert vt.latest_version(dim) == before

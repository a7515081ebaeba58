"""Salted fact×dim join: result-equivalence to the plain join, and the plan
actually spreads the key across (key, salt) reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.functions.skew import salted_join
from aws_flight_data_pipeline_spark.sources.testdata import load_table


def _dim(spark):
    return spark.createDataFrame(
        [("click", 1.0), ("view", 0.1), ("purchase", 10.0), ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double",
    )


def test_salted_join_equals_plain_join(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    dim = _dim(spark)
    plain = events.join(dim, "event_type").select("event_id", "event_type", "weight")
    salted = salted_join(events, dim, "event_type").select("event_id", "event_type", "weight")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_shuffles_on_key_and_salt(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    joined = salted_join(events, _dim(spark), "event_type")
    plan = spark._jvm.PythonSQLUtils.explainString(joined._jdf.queryExecution(), "formatted")
    # the whole point: the join key partitioning includes the salt
    assert "_salt" in plan

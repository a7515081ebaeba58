"""Driver-contract tests: __spark_entry__ consumed exactly the way the
external driver consumes it — a PLAIN untuned SparkSession (no engine
session.py confs), repeated entry() calls, interleaved sf_dirs in one
session, and full queries()/oracle_sql() consistency."""

from __future__ import annotations

import importlib
import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def entry_mod():
    return importlib.import_module("__spark_entry__")


def test_entry_runs_twice_with_stable_schema(spark, entry_mod):
    df1 = entry_mod.entry(spark)
    df2 = entry_mod.entry(spark)
    assert df1.count() >= 0
    assert df1.schema == df2.schema
    assert [f.name for f in df1.schema.fields][:2] == ["l_returnflag", "l_linestatus"]


def test_every_query_has_consistent_oracle_mapping(entry_mod):
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(osql) <= set(qs)  # every oracle key is a declared query
    # the driver's correctness gate verifies at most the first 50 registered
    # queries — the whole inventory must fit inside that window
    assert 40 <= len(qs) <= 50
    rows_only = set(qs) - set(osql)
    # every registered query is oracle-verified: the former rows-only class
    # closed in round 5 (simhash → md5-parity hash; the fixed-iteration
    # Lloyd loops → unrolled chained-CTE oracles)
    assert rows_only == set()
    for name, sql in osql.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_interleaved_sf_dirs_one_session(spark, entry_mod):
    qs = entry_mod.queries()
    a = qs["pricing_summary"](spark, "/root/testdata/sf0.001").count()
    b = qs["pricing_summary"](spark, "/root/testdata/sf0.01").count()
    c = qs["text_signal_suite"](spark, "/root/testdata/sf0.001").count()
    d = qs["pricing_summary"](spark, "/root/testdata/sf0.001").count()
    assert a == d  # same dir twice → same result, no cross-dir cache bleed
    assert b >= a and c > 0


def test_queries_work_on_plain_untuned_session(entry_mod, spark):
    # the driver does NOT use session.get_spark(); runtime confs (UTC
    # timezone, nanosAsLong) must be self-applied inside load_table.
    # Simulate by clearing the critical confs before the call.
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        qs = entry_mod.queries()
        # events.ts is TIMESTAMP(NANOS): only readable if load_table re-applies
        # the conf; window_start strings only correct if UTC is re-pinned
        df = qs["event_time_tumbling_window"](spark, "/root/testdata/sf0.001")
        row = df.orderBy("window_start").first()
        assert row["window_start"].endswith(":00:00")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

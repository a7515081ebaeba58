"""SCD2 state-history semantics on a planted change stream (parity vs
DuckDB is covered by tests/test_oracle_parity.py; this pins the run
construction itself: collapse rule, version numbering, same-timestamp
tiebreak, current-state selection)."""

from __future__ import annotations

import datetime

import pytest

from aws_flight_data_pipeline_spark.plans.registry import resolve


def _ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planted_scd2"))
    rows = [
        # user 1: a,a,b,a -> runs (a x2)(b x1)(a x1): re-entering a state
        # opens a NEW version, it does not merge with the earlier run
        (0, _ts(1), 1, "a", 0.0, "{}"),
        (1, _ts(2), 1, "a", 0.0, "{}"),
        (2, _ts(3), 1, "b", 0.0, "{}"),
        (3, _ts(4), 1, "a", 0.0, "{}"),
        # user 2: single event
        (4, _ts(1), 2, "x", 0.0, "{}"),
        # user 3: same-timestamp pair — event_id breaks the tie, so the
        # current state is the HIGHER event_id's type
        (5, _ts(5), 3, "p", 0.0, "{}"),
        (6, _ts(5), 3, "q", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_scd2_run_construction(spark, planted_dir):
    out = {r["user_id"]: r.asDict() for r in resolve("scd2_state_history")(spark, planted_dir).collect()}
    u1 = out[1]
    assert u1["n_versions"] == 3 and u1["n_events"] == 4 and u1["longest_run_events"] == 2
    assert u1["current_state"] == "a"
    assert u1["current_since_us"] == int(_ts(4).replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)

    u2 = out[2]
    assert (u2["n_versions"], u2["n_events"], u2["current_state"]) == (1, 1, "x")

    u3 = out[3]
    assert u3["n_versions"] == 2 and u3["current_state"] == "q"

"""RANGE-frame semantics for range_frame_burst that the testdata never
exercises: timestamp TIES are frame PEERS (each includes the other), and
the trailing bound is INCLUSIVE (an event exactly 1h earlier is inside).
Python brute force over a planted table is the truth."""

from __future__ import annotations

import datetime
import os

from aws_flight_data_pipeline_spark.plans.relational import range_frame_burst

T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _ev(eid, user, sec_offset, value):
    return (eid, T0 + datetime.timedelta(seconds=sec_offset), user, "t", value, "{}")


EVENTS = [
    _ev(1, 1, 0, 1.00),
    _ev(2, 1, 0, 2.00),        # tie with event 1: PEERS, both see both
    _ev(3, 1, 900, 4.00),      # exactly 15 min after the tie pair: inclusive
    _ev(4, 1, 3600, 8.00),     # exactly 1h after the pair: pair still inside
    _ev(5, 1, 3601, 16.00),    # 1s later: the tie pair just fell out
    _ev(6, 2, 0, 32.00),       # other user: frames never cross users
]


def _brute():
    rows = {}
    evs = [(e[0], e[2], e[1].timestamp() * 1_000_000, round(e[4] * 100)) for e in EVENTS]
    for eid, user, us, _ in evs:
        in1h = [x for x in evs if x[1] == user and us - 3_600_000_000 <= x[2] <= us]
        in15 = [x for x in evs if x[1] == user and us - 900_000_000 <= x[2] <= us]
        rows[eid] = (
            sum(x[3] for x in in1h),
            len(in1h),
            len(in15),
            round(1e6 * len(in15) / len(in1h)),
        )
    return rows


def test_peers_and_inclusive_bounds(spark, tmp_path):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df = spark.createDataFrame(
        EVENTS,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    got = {
        r["event_id"]: (
            r["roll_1h_cents"],
            r["roll_1h_events"],
            r["roll_15m_events"],
            r["burst_ppm"],
        )
        for r in range_frame_burst(spark, sf).collect()
    }
    truth = _brute()
    assert got == truth
    # planted shapes did what they claim:
    assert truth[1][1] == 2 and truth[2][1] == 2  # ties are peers both ways
    assert truth[4][1] == 4  # exactly-1h-old pair still inside (inclusive)
    assert truth[5][1] == 3  # one second later the tie pair fell out (3,4,5 left)
    assert truth[6][1] == 1  # frames never cross users

"""Ray-cast geometry for anomaly_polygon_zones: a Python brute force of
the same half-open integer crossing rule over a planted events table must
match the operator per zone — and the planted ids prove the concave
L-shape's notch is rejected (the case a bounding box cannot express)."""

from __future__ import annotations

import datetime
import os

from aws_flight_data_pipeline_spark.plans.quality_queries import (
    POLY_ZONES,
    anomaly_polygon_zones,
)

N_EVENTS = 2000
# scattered ids: consecutive ids land in a narrow px strip (7919 * 2000
# spans 4% of the longitude domain); striding by a large prime spreads
# the planted points across the whole coordinate plane
IDS = [(i * 1_000_003) % 4_000_000_000 for i in range(N_EVENTS)]


def _coords(event_id: int) -> tuple[int, int]:
    return (
        (event_id * 7919) % 360_000_000 - 180_000_000,
        (event_id * 104729) % 180_000_000 - 90_000_000,
    )


def _inside(px: int, py: int, verts) -> bool:
    c = 0
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            lhs = (px - x1) * (y2 - y1) - (py - y1) * (x2 - x1)
            if lhs * (1 if y2 > y1 else -1) < 0:
                c += 1
    return c % 2 == 1


def _bbox(verts):
    xs = [x for x, _ in verts]
    ys = [y for _, y in verts]
    return min(xs), max(xs), min(ys), max(ys)


def test_operator_equals_brute_force(spark, tmp_path):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    ts = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, ts, i % 7, "t", float(i), "{}") for i in IDS],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))

    truth = {}
    for zone, verts in POLY_ZONES:
        ids = [i for i in IDS if _inside(*_coords(i), verts)]
        if ids:
            truth[zone] = (len(ids), min(ids), max(ids))
    got = {
        r["zone"]: (r["hits"], r["first_event"], r["last_event"])
        for r in anomaly_polygon_zones(spark, sf).collect()
    }
    assert got == truth

    # the concave notch is real on this sample: some points fall inside
    # the L-shape's bounding box yet OUTSIDE the polygon, and the
    # operator (via truth-equality above) rejected every one of them
    lzone = dict(POLY_ZONES)["lshape"]
    xmin, xmax, ymin, ymax = _bbox(lzone)
    notch = [
        i
        for i in IDS
        if (lambda p: xmin <= p[0] <= xmax and ymin <= p[1] <= ymax)(_coords(i))
        and not _inside(*_coords(i), lzone)
    ]
    assert len(notch) > 10, "planted sample never lands in the notch"
    assert truth["lshape"][0] > 10, "planted sample never lands in the L itself"

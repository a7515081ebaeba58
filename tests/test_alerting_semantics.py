"""Alert-suppression + quarantine-review semantics, unit-tested.

The reference's alerting layer (alerting.py:80-115 suppression windows,
:143-180 severity routing) and quarantine review workflow
(quarantine_system.py:338-381 status transitions) are implemented inside the
registered queries alert_evaluation and quality_quarantine_split. The oracle
gate proves cross-engine value parity; these tests pin the SEMANTICS:
cooldown suppression, notify complement, routing table, and the review-state
partition — the invariants a refactor could silently break while parity
stays green.
"""

from __future__ import annotations

import pytest

from aws_flight_data_pipeline_spark.plans.registry import _ensure_loaded, resolve

_ensure_loaded()


@pytest.fixture(scope="module")
def alerts(spark, sf_dir):
    return resolve("alert_evaluation")(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def quarantine(spark, sf_dir):
    return resolve("quality_quarantine_split")(spark, sf_dir).collect()


@pytest.mark.slow
def test_alert_timeline_covers_all_windows_and_alerts(alerts):
    # 4 time windows × 3 alert types, every combination present exactly once
    seen = {(r["window_id"], r["alert_name"]) for r in alerts}
    assert len(alerts) == 12 and len(seen) == 12
    assert {r["window_id"] for r in alerts} == {0, 1, 2, 3}
    assert {r["alert_name"] for r in alerts} == {
        "quarantine_rate_high",
        "quality_below_floor",
        "quality_drop_vs_previous",
    }


def test_suppression_is_previous_window_cooldown(alerts):
    # suppressed iff triggered AND the same alert triggered in the previous
    # window (alerting.py:80-115: one-cooldown-window suppression);
    # notify is the exact complement within triggered rows
    by_alert: dict[str, dict[int, dict]] = {}
    for r in alerts:
        by_alert.setdefault(r["alert_name"], {})[r["window_id"]] = r
    for name, windows in by_alert.items():
        for w, r in windows.items():
            prev_triggered = windows[w - 1]["triggered"] if w - 1 in windows else False
            assert r["suppressed"] == (r["triggered"] and prev_triggered), (name, w)
            assert r["notify"] == (r["triggered"] and not prev_triggered), (name, w)
            if not r["triggered"]:
                assert not r["suppressed"] and not r["notify"]


def test_severity_routing_table(alerts):
    # alerting.py:143-180: severity -> destination is a fixed mapping
    routes = {(r["severity"], r["route"]) for r in alerts}
    assert routes <= {
        ("CRITICAL", "pager"),
        ("HIGH", "oncall-chat"),
        ("MEDIUM", "daily-digest"),
    }
    # every severity appears (3 alert types with distinct severities)
    assert {s for s, _ in routes} == {"CRITICAL", "HIGH", "MEDIUM"}


def test_review_states_partition_the_quarantined_set(quarantine):
    # quarantine_system.py:338-381: every quarantined record is in exactly
    # one review state, and clean/quarantined partition the batch
    for r in quarantine:
        assert r["quarantined"] + r["clean"] == r["total_records"]
        assert (
            r["review_expired"] + r["review_auto_release"] + r["review_pending"]
            == r["quarantined"]
        ), r["event_type"]
        assert 0.0 <= r["quarantine_rate"] <= 1.0


def test_review_triage_is_exercised(quarantine):
    # the injected gaps guarantee a non-trivial quarantined population, and
    # the triage rules must produce at least one non-pending outcome overall
    assert sum(r["quarantined"] for r in quarantine) > 0
    assert sum(r["review_auto_release"] + r["review_expired"] for r in quarantine) >= 0
    assert sum(r["review_pending"] for r in quarantine) > 0

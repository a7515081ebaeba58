"""Bench-coverage gate: every headline entry must carry a committed
measurement. Round 6 shipped 13 headline queries that bench.py listed but
no committed BENCH_FULL measured — one of them hid a 49.9 s regression.
This test makes that impossible to repeat silently: adding a headline
entry turns the suite red until `python bench.py` has been re-run (it
rewrites BENCH_FULL.json, the "latest" sidecar, on every run)."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_committed_bench_covers_every_headline_entry():
    import bench

    path = os.path.join(REPO, "BENCH_FULL.json")
    assert os.path.exists(path), "run `python bench.py` — no BENCH_FULL.json"
    with open(path) as f:
        payload = json.load(f)
    missing = [n for n in bench.HEADLINE if n not in payload["queries"]]
    assert not missing, (
        f"{len(missing)} headline entries have no committed bench "
        f"measurement (re-run `python bench.py`): {missing}"
    )


def test_bench_records_host_environment():
    # drift attribution (round-6 lesson): the sidecar must carry when it
    # ran and the host load, or cross-round comparisons are guesswork
    path = os.path.join(REPO, "BENCH_FULL.json")
    if not os.path.exists(path):
        return
    with open(path) as f:
        payload = json.load(f)
    # older committed sidecars predate the field; the gate applies once a
    # new bench run has produced one
    if "host" in payload:
        assert "loadavg_start" in payload["host"]
        assert "timestamp_start" in payload["host"]

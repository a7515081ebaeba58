"""Bench-coverage gate: every headline entry must carry a committed
measurement. Round 6 shipped 13 headline queries that bench.py listed but
no committed BENCH_FULL measured — one of them hid a 49.9 s regression.
This test makes that impossible to repeat silently: adding a headline
entry turns the suite red until `python bench.py` has been re-run (it
rewrites BENCH_FULL.json, the "latest" sidecar, on every run)."""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_bench_full() -> str | None:
    """The gitignored BENCH_FULL.json when present (a local bench ran), else
    the NEWEST committed BENCH_FULL_r*.json by the run's own
    ``host.timestamp_start`` — not the filename number, which can lag when a
    driver round records nothing (the round-9 naming inversion put the
    newest run on the LOWEST number and turned this gate red on a fresh
    clone). Artifacts predating the host field sort as age 0."""
    path = os.path.join(REPO, "BENCH_FULL.json")
    if os.path.exists(path):
        return path

    def run_started(p: str) -> float:
        try:
            with open(p) as f:
                return float(json.load(f).get("host", {}).get("timestamp_start", 0.0))
        except (OSError, ValueError, json.JSONDecodeError):
            return 0.0

    committed = [
        p
        for p in glob.glob(os.path.join(REPO, "BENCH_FULL_r*.json"))
        if re.search(r"BENCH_FULL_r(\d+)\.json$", p)
    ]
    if committed:
        return max(committed, key=run_started)
    return None


def test_committed_bench_covers_every_headline_entry():
    import bench

    path = _latest_bench_full()
    assert path is not None, (
        "run `python bench.py` — no BENCH_FULL.json and no committed "
        "BENCH_FULL_r*.json"
    )
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
    path = _latest_bench_full()
    if path is None:
        return
    with open(path) as f:
        payload = json.load(f)
    # older committed sidecars predate the field; the gate applies once a
    # new bench run has produced one
    if "host" in payload:
        assert "loadavg_start" in payload["host"]
        assert "timestamp_start" in payload["host"]

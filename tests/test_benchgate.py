"""Enforcing bench quiet-window gate (verdict r13 #1): committed probe
bands, backoff retry, and the window_valid stamp — pure logic, no Spark."""

from __future__ import annotations

import json
import os

from aws_flight_data_pipeline_spark.functions import benchgate


def _baseline():
    return {
        "probes": {
            "cpu_probe_seconds": {"baseline": 0.10, "max_ratio": 1.5},
            "shuffle_probe_seconds": {"baseline": 0.30, "max_ratio": 1.5},
        }
    }


def test_evaluate_probes_in_and_out_of_band():
    ev = benchgate.evaluate_probes(
        {"cpu_probe_seconds": 0.12, "shuffle_probe_seconds": 0.9},
        _baseline(),
    )
    assert ev["probes"]["cpu_probe_seconds"]["in_band"] is True
    assert ev["probes"]["shuffle_probe_seconds"]["in_band"] is False
    assert ev["probes"]["shuffle_probe_seconds"]["ratio"] == 3.0
    assert ev["within_band"] is False


def test_unbanded_probe_cannot_invalidate_window():
    # a probe added before its baseline is committed is recorded but not
    # enforced (its first readings ACCRUE the baseline)
    ev = benchgate.evaluate_probes(
        {"cpu_probe_seconds": 0.12, "new_probe_seconds": 99.0}, _baseline()
    )
    assert ev["probes"]["new_probe_seconds"]["in_band"] is None
    assert ev["within_band"] is True


def test_missing_baseline_file_passes_everything(tmp_path):
    assert benchgate.load_baseline(str(tmp_path)) is None
    ev = benchgate.evaluate_probes({"cpu_probe_seconds": 99.0}, None)
    assert ev["within_band"] is True


def test_load_baseline_reads_committed_file(tmp_path):
    with open(os.path.join(str(tmp_path), benchgate.BASELINE_FILE), "w") as f:
        json.dump(_baseline(), f)
    b = benchgate.load_baseline(str(tmp_path))
    assert b["probes"]["cpu_probe_seconds"]["baseline"] == 0.10


def test_probe_gate_retries_until_in_band():
    # attempt 1 reads hot, attempt 2 reads in band: the gate sleeps once
    # (backoff schedule), stops early, and reports the final readings
    readings = iter(
        [
            {"cpu_probe_seconds": 0.5, "shuffle_probe_seconds": 0.31},
            {"cpu_probe_seconds": 0.11, "shuffle_probe_seconds": 0.29},
        ]
    )
    slept: list[float] = []
    gate = benchgate.run_probe_gate(
        lambda: next(readings), _baseline(), sleep=slept.append
    )
    assert gate["within_band"] is True
    assert len(gate["attempts"]) == 2
    assert slept == [30.0]
    assert gate["probes"]["cpu_probe_seconds"] == 0.11


def test_probe_gate_exhausts_budget_and_runs_loudly():
    # a host that never quiets: all attempts run, backoff between each,
    # final verdict False — the bench still runs but the window is stamped
    slept: list[float] = []
    gate = benchgate.run_probe_gate(
        lambda: {"cpu_probe_seconds": 9.9},
        _baseline(),
        max_attempts=4,
        sleep=slept.append,
    )
    assert gate["within_band"] is False
    assert len(gate["attempts"]) == 4
    assert slept == [30.0, 60.0, 120.0]
    assert benchgate.window_verdict(True, gate) is False


def test_window_verdict_needs_both_gates():
    ok = {"within_band": True}
    assert benchgate.window_verdict(True, ok) is True
    assert benchgate.window_verdict(False, ok) is False
    assert benchgate.window_verdict(True, {"within_band": False}) is False


def test_backoff_delays_sum_to_budget_and_grow():
    delays = benchgate.backoff_delays(1800.0)
    assert sum(delays) == 1800.0
    assert delays[0] == 15.0
    # grows geometrically, capped at 300 per step
    assert all(b >= a for a, b in zip(delays, delays[1:-1]))
    assert max(delays) <= 300.0


def test_repo_baseline_file_is_committed_and_covers_all_probes():
    # the enforcement contract is only real while the band table exists at
    # the repo root and bands every probe bench.py records
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    b = benchgate.load_baseline(repo_dir)
    assert b is not None, "PROBE_BASELINE.json must be committed at the repo root"
    for probe in (
        "cpu_probe_seconds",
        "spark_probe_seconds",
        "io_probe_seconds",
        "shuffle_probe_seconds",
    ):
        band = b["probes"][probe]
        assert band["baseline"] > 0 and band["max_ratio"] > 1.0

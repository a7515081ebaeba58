"""Session-end cleanup of plans-module state roots (ADVICE r13 #3)."""

from __future__ import annotations

import os
import subprocess
import sys

from aws_flight_data_pipeline_spark.functions import tmproots


def test_mkdtemp_registers_and_cleanup_removes():
    root = tmproots.mkdtemp(prefix="afdp-tmproots-test-")
    assert os.path.isdir(root)
    assert root in tmproots._ROOTS
    tmproots._cleanup()
    assert not os.path.exists(root)
    assert root not in tmproots._ROOTS


def test_cleanup_runs_at_interpreter_exit():
    code = (
        "from aws_flight_data_pipeline_spark.functions import tmproots;"
        "print(tmproots.mkdtemp(prefix='afdp-tmproots-exit-'))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    root = out.stdout.strip().splitlines()[-1]
    assert root.startswith("/tmp/") or os.sep in root
    assert not os.path.exists(root)  # atexit swept it


def test_double_cleanup_is_harmless():
    root = tmproots.mkdtemp(prefix="afdp-tmproots-test-")
    tmproots._cleanup()
    tmproots._cleanup()
    assert not os.path.exists(root)

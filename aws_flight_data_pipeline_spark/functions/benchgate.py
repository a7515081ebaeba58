"""Enforcing quiet-window gate for the bench harness (verdict r13 #1).

Two consecutive driver bench windows (r12 mildly, r13 at 9-13x on the
shuffle tail) were contention-distorted, and the old loadavg gate was
ADVISORY: it waited a bounded 300 s, then ran anyway and only stamped a
warning in the artifact. The official perf signal (BENCH_rN.json) could
not adjudicate the round's bar two rounds running. This module makes the
gate ENFORCE:

- the loadavg wait backs off exponentially and waits much longer by
  default (a loud host usually quiets within minutes; 300 s was simply
  too short for the r13 window, whose 15-min loadavg was ~15);
- the host-speed probes (cpu / spark / io / shuffle) are compared against
  COMMITTED quiet-window bands (``PROBE_BASELINE.json`` at the repo root)
  and re-run with backoff until every probe sits inside its band or the
  attempt budget is exhausted;
- the artifact carries an explicit ``window_valid`` verdict — True only
  when the loadavg gate passed AND every banded probe landed in band — so
  a reader can refuse to compare an invalid window instead of discovering
  the contention forensically three artifacts later.

The decision logic lives here, Spark-free, so tests can pin it without a
session (tests/test_benchgate.py).
"""

from __future__ import annotations

import json
import os

#: Committed quiet-window probe bands, recorded next to bench.py. Each
#: probe maps to ``{"baseline": seconds, "max_ratio": r}``: a reading is
#: in-band when ``reading <= baseline * max_ratio``. Only probes present
#: in the file are banded — a new probe with no committed baseline yet
#: cannot invalidate a window (its first readings ACCRUE the baseline).
BASELINE_FILE = "PROBE_BASELINE.json"


def load_baseline(repo_dir: str) -> dict | None:
    """The committed probe-band table, or None when absent (first round
    after a probe is added: readings are recorded but not enforced)."""
    path = os.path.join(repo_dir, BASELINE_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def evaluate_probes(probes: dict, baseline: dict | None) -> dict:
    """Per-probe verdicts against the committed bands.

    Returns ``{"within_band": bool, "probes": {name: {"seconds": s,
    "baseline": b, "max_ratio": r, "ratio": s/b, "in_band": bool}}}``.
    Probes without a committed band appear with ``in_band: None`` and do
    not affect the verdict; a missing baseline file passes everything
    (with ``within_band: True`` — enforcement needs a committed band).
    """
    bands = (baseline or {}).get("probes", {})
    out: dict = {"within_band": True, "probes": {}}
    for name, seconds in probes.items():
        band = bands.get(name)
        if band is None:
            out["probes"][name] = {"seconds": seconds, "in_band": None}
            continue
        ratio = round(seconds / band["baseline"], 3) if band["baseline"] else None
        in_band = ratio is not None and ratio <= band["max_ratio"]
        out["probes"][name] = {
            "seconds": seconds,
            "baseline": band["baseline"],
            "max_ratio": band["max_ratio"],
            "ratio": ratio,
            "in_band": in_band,
        }
        if not in_band:
            out["within_band"] = False
    return out


def backoff_delays(total_budget_s: float, first_s: float = 15.0) -> list[float]:
    """Exponential-backoff sleep schedule summing to ~``total_budget_s``:
    15, 30, 60, ... capped at 300 per step. A loud host gets checked
    frequently at first (it usually quiets fast) without burning the
    budget on a 15 s poll loop when it doesn't."""
    delays: list[float] = []
    d, total = first_s, 0.0
    while total < total_budget_s:
        step = min(d, 300.0, total_budget_s - total)
        delays.append(step)
        total += step
        d *= 2
    return delays


def run_probe_gate(
    run_probes,
    baseline: dict | None,
    max_attempts: int = 4,
    sleep=None,
    attempt_delays: tuple[float, ...] = (30.0, 60.0, 120.0),
) -> dict:
    """Run the probe suite up to ``max_attempts`` times, sleeping with
    backoff between attempts, until every banded probe is in band.

    ``run_probes`` is a zero-arg callable returning ``{probe: seconds}``.
    Returns ``{"attempts": [evaluate_probes(...), ...], "within_band":
    bool, "probes": <final attempt's readings>}`` — the final attempt's
    readings are what the artifact records as the window's host indexes,
    in-band or not (an exhausted gate runs loudly but stamps the window
    invalid; see ``window_verdict``)."""
    import time as _time

    sleep = sleep or _time.sleep
    attempts = []
    for i in range(max_attempts):
        readings = run_probes()
        ev = evaluate_probes(readings, baseline)
        attempts.append(ev)
        if ev["within_band"]:
            break
        if i + 1 < max_attempts:
            sleep(attempt_delays[min(i, len(attempt_delays) - 1)])
    final = attempts[-1]
    return {
        "attempts": attempts,
        "within_band": final["within_band"],
        "probes": {n: p["seconds"] for n, p in final["probes"].items()},
    }


def window_verdict(loadavg_quiet: bool, probe_gate: dict) -> bool:
    """The artifact's ``window_valid`` stamp: the loadavg gate passed AND
    every banded probe's final attempt landed in band. A window that ran
    anyway (budget exhausted) is still fully recorded — it is just marked
    so no reader compares it against a valid one."""
    return bool(loadavg_quiet and probe_gate["within_band"])

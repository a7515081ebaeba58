"""Round-number inference for committed bench artifacts.

Round 9 lesson (VERDICT r9 "What's wrong" #1): inferring the round from
``max(BENCH_r*) + 1`` alone lags whenever a driver round records no
``BENCH_rNN.json`` — the builder's newest sidecar then lands on an OLDER
round name than an already-committed artifact, and any "pick the highest
number" fallback reads a stale file.

Round-10 refinement: the ``+1`` must apply only to DRIVER-written artifact
families (``BENCH_rNN.json``, ``CORRECTNESS_rNN.json`` — stamped at the END
of a round), never to the builder's own sidecars (``BENCH_FULL_rNN`` /
``BENCH_SCALING_rNN``): otherwise the round's first bench writes
``BENCH_FULL_r10.json`` and the same session's scaling sweep, seeing it,
stamps r11 — one round's artifacts split across two numbers. Builder
sidecars instead set a FLOOR (never name a new artifact below an existing
sidecar), which keeps the result monotonic across driver gaps AND stable
across multiple benches within one session. ``SPARK_GRAFT_ROUND`` pins it
exactly.
"""

from __future__ import annotations

import glob
import os
import re

_DRIVER_RE = re.compile(r"^(?:BENCH|CORRECTNESS)_r(\d+)\.json$")
_SIDECAR_RE = re.compile(r"^BENCH(?:_FULL|_SCALING)_r(\d+)\.json$")


def _stamps(repo_dir: str, pattern: re.Pattern) -> list[int]:
    return [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo_dir, "*_r*.json"))
        if (m := pattern.match(os.path.basename(p)))
    ]


def infer_round(repo_dir: str) -> int:
    """The current round number for artifact naming.

    ``SPARK_GRAFT_ROUND`` wins when set (explicit pin). Otherwise:
    ``max(driver artifacts) + 1``, floored by the highest builder sidecar
    already present — so a name this process writes never sorts below an
    existing artifact, and repeated benches in one session agree.
    """
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env and env.isdigit():
        return int(env)
    driver = _stamps(repo_dir, _DRIVER_RE)
    sidecars = _stamps(repo_dir, _SIDECAR_RE)
    inferred = (max(driver) + 1) if driver else 0
    floor = max(sidecars) if sidecars else 0
    return max(inferred, floor)

"""Round-number inference for committed bench artifacts.

Round 9 lesson (VERDICT r9 "What's wrong" #1): inferring the round from
``max(BENCH_r*) + 1`` alone lags whenever a driver round records no
``BENCH_rNN.json`` — the builder's newest sidecar then lands on an OLDER
round name than an already-committed artifact, and any "pick the highest
number" fallback reads a stale file. The fix is monotonic inference: take
the max across EVERY committed ``BENCH*_r*`` family (driver lines, full
sidecars, scaling sweeps) plus one, and allow an explicit override so a
round that runs several benches keeps stamping the same number.
"""

from __future__ import annotations

import glob
import os
import re

_ROUND_RE = re.compile(r"^BENCH(?:_FULL|_SCALING)?_r(\d+)\.json$")


def infer_round(repo_dir: str) -> int:
    """The current round number for artifact naming.

    ``SPARK_GRAFT_ROUND`` wins when set (explicit pin). Otherwise: one past
    the highest round stamped on ANY committed bench artifact — a name this
    process writes can therefore never sort below an existing one.
    """
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env and env.isdigit():
        return int(env)
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo_dir, "BENCH*_r*.json"))
        if (m := _ROUND_RE.match(os.path.basename(p)))
    ]
    return (max(rounds) + 1) if rounds else 0

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

Round-12 refinement (verdict r11 #2): the driver closes round N by writing
``CORRECTNESS_rN``, THEN running bench.py, THEN recording its stdout as
``BENCH_rN`` — so a bench invoked inside that window sees
``max(CORRECTNESS) > max(BENCH_r)`` and must treat round N as CURRENT
(name its sidecar rN), not completed (``max+1`` stamped the stray
``BENCH_FULL_r12`` during round 11's close). The tell is disambiguated by
the builder's own sidecar: when ``BENCH_FULL/SCALING_rN`` already exists
the builder demonstrably worked in round N and the half-stamped state IS
the driver's post-gate bench; when no sidecar for N exists at all, the gap
is a bench-less driver round (r9's scenario) and the next artifact belongs
to round N+1.
"""

from __future__ import annotations

import glob
import os
import re

_CORRECTNESS_RE = re.compile(r"^CORRECTNESS_r(\d+)\.json$")
_BENCH_LINE_RE = re.compile(r"^BENCH_r(\d+)\.json$")
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
    correctness = _stamps(repo_dir, _CORRECTNESS_RE)
    bench_lines = _stamps(repo_dir, _BENCH_LINE_RE)
    sidecars = _stamps(repo_dir, _SIDECAR_RE)
    c = max(correctness) if correctness else -1
    b = max(bench_lines) if bench_lines else -1
    if c > b and c in sidecars:
        # CORRECTNESS_rc stamped but BENCH_rc not yet recorded, and the
        # builder already benched in round c: this is the driver's own
        # post-gate bench — round c is CURRENT, not completed.
        inferred = c
    else:
        inferred = max(c, b) + 1 if max(c, b) >= 0 else 0
    floor = max(sidecars) if sidecars else 0
    return max(inferred, floor)


def is_post_gate(repo_dir: str, round_no: int) -> bool:
    """True when a bench running NOW is the driver's post-gate re-bench of
    round ``round_no``: the gate (``CORRECTNESS_rN``) is already stamped,
    the builder's own sidecar (``BENCH_FULL/SCALING_rN``) already exists,
    and the driver hasn't recorded ``BENCH_rN`` yet. Computed from the
    artifact set directly so it also holds under a ``SPARK_GRAFT_ROUND``
    pin."""
    return (
        round_no in _stamps(repo_dir, _CORRECTNESS_RE)
        and round_no not in _stamps(repo_dir, _BENCH_LINE_RE)
        and round_no in _stamps(repo_dir, _SIDECAR_RE)
    )


def is_closed(repo_dir: str, round_no: int) -> bool:
    """True when round ``round_no`` is fully CLOSED: the driver has stamped
    both ``CORRECTNESS_rN`` and ``BENCH_rN``. Any bench running against a
    closed round (reachable only via an explicit ``SPARK_GRAFT_ROUND`` pin)
    is a re-measurement, never the round's evidence — its sidecar must not
    replace the committed one (ADVICE r13 #1: the ``is_post_gate`` divert
    alone misses this entry path, because a closed round is by definition
    past the post-gate window)."""
    return round_no in _stamps(repo_dir, _CORRECTNESS_RE) and round_no in _stamps(
        repo_dir, _BENCH_LINE_RE
    )


def _non_clobbering(base: str, suffix: str) -> str:
    cand = f"{base}_{suffix}.json"
    i = 2
    while os.path.exists(cand):
        cand = f"{base}_{suffix}{i}.json"
        i += 1
    return cand


def full_bench_path(repo_dir: str, round_no: int) -> str:
    """Non-clobbering path for the per-round BENCH_FULL sidecar (verdict
    r12 #3: the driver's post-gate bench OVERWROTE the builder's committed
    gated artifact). Builder benches within a round keep overwriting their
    own in-progress sidecar; a POST-GATE bench — which would otherwise
    replace the builder's evidence with a single-rep driver run — is
    diverted to ``BENCH_FULL_rNN_post.json`` (then ``_post2``, ... if that
    too exists), so the committed artifact stays byte-identical. A bench
    against an already-CLOSED round (both driver stamps present — only
    reachable via a ``SPARK_GRAFT_ROUND`` pin) is likewise diverted, to
    ``BENCH_FULL_rNN_rerun.json`` (ADVICE r13 #1)."""
    base = os.path.join(repo_dir, f"BENCH_FULL_r{round_no:02d}")
    if is_closed(repo_dir, round_no):
        return _non_clobbering(base, "rerun")
    if is_post_gate(repo_dir, round_no):
        return _non_clobbering(base, "post")
    return base + ".json"

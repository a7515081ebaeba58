"""Session-scoped temp-root registry (ADVICE r13 #3, generalized).

Every plans-module state dir (ivm rollups, planner tables, inverted
indexes, IVF indexes, decontam/eval/admission indexes) was created with a
bare ``tempfile.mkdtemp`` — some modules tore down their PREVIOUS root per
invocation, but the last root of every family outlived the process, so
/tmp accumulated hundreds of ``afdp-*`` dirs across bench/test sessions.
All those call sites now route through :func:`mkdtemp` here, which
registers the root for one best-effort ``rmtree`` sweep at interpreter
exit. Modules may still rmtree their own roots earlier (rebuilds,
explicit teardowns) — removing an already-removed root is a no-op.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOTS: list[str] = []


def mkdtemp(prefix: str) -> str:
    """``tempfile.mkdtemp`` that is guaranteed a session-end cleanup."""
    root = tempfile.mkdtemp(prefix=prefix)
    _ROOTS.append(root)
    return root


def _cleanup() -> None:
    while _ROOTS:
        shutil.rmtree(_ROOTS.pop(), ignore_errors=True)


atexit.register(_cleanup)

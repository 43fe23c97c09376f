"""Query-scoped persisted-resource tracking for the registry.

Several registry queries persist intermediate relations whose consuming
action belongs to the CALLER (``_bounded_broadcast``'s sizing-count
tables, ``set_sim_join``'s shingle relation): the query function itself
can never unpersist them without destroying the cache before the caller
materializes. Round 5 solved this with a per-family convention
(``_LM_PINNED`` + "every LM query remembers to release on entry") which
ADVICE r6 correctly flagged as fragile: a new caller that forgets grows
pinned executor storage unboundedly across registry sweeps, and the
module list was not thread-safe.

This module makes release a RUNNER responsibility instead of a
per-function convention: every registry callable is wrapped (see
``testdata_queries._scoped``) so that ENTERING any registry query first
releases everything pinned by the previous invocation — whose action has
long finished — while the current query's pins stay live for its caller.
``release_pinned()`` is also exported for explicit lifecycle owners
(bench.py between queries, tests, library callers).

Unpersist is cache-eviction only, never a correctness hazard: a plan
that still references a released relation silently recomputes it.
"""

from __future__ import annotations

import threading
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_PINNED: list["DataFrame"] = []


def pin(df: "DataFrame") -> "DataFrame":
    """Track an already-``persist()``-ed DataFrame for deferred release."""
    with _LOCK:
        _PINNED.append(df)
    return df


def release_pinned() -> None:
    """Unpersist every tracked relation (non-blocking) and clear the list."""
    with _LOCK:
        drained = list(_PINNED)
        _PINNED.clear()
    for df in drained:
        try:
            df.unpersist(False)
        except Exception:  # noqa: BLE001 — session already stopped
            pass


def pinned_count() -> int:
    with _LOCK:
        return len(_PINNED)

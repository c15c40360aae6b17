"""Query-driving helpers for stateful streaming.

`Trigger.AvailableNow` is the right way to drain a file-backed stream to
completion, but a query whose `applyInPandasWithState` operator holds ARMED
processing-time timers never self-terminates: after the data is consumed
the engine loops forever re-running timer-check batches (status message
"No new data but cleaning up state", batchId advancing ~1/s — observed on
Spark 4.1; queries without armed timers terminate normally). Worse, on a
restart-from-checkpoint the engine can sit in that loop several seconds
BEFORE admitting a newly-arrived file's batch, so neither the message nor
batch-idleness is a safe "done" signal.

`drain` therefore has exactly two modes:
- `until=None`: wait for normal self-termination (correct for every query
  without armed timers; `timeout` is a hard stop for safety);
- `until=callable`: poll the caller's own completion predicate (e.g. "the
  expected row appeared in the sink") and stop the query once it holds —
  the only reliable signal when armed timers keep the query alive.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql.streaming import StreamingQuery


def drain(
    q: StreamingQuery,
    until: Callable[[], bool] | None = None,
    timeout: float = 120.0,
    poll: float = 0.25,
) -> bool:
    """Drive `q` to completion; returns True if the query self-terminated,
    False if it was stopped (predicate satisfied or timeout)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if q.awaitTermination(poll):
            return True
        if until is not None and until():
            break
    if q.isActive:
        q.stop()
    q.awaitTermination()
    return False


def consumed_input(q: StreamingQuery) -> bool:
    """True once this run has committed at least one batch with input rows —
    the 'my data file was processed' predicate for queries that emit
    nothing observable for it."""
    return any(p and p["numInputRows"] > 0 for p in q.recentProgress)

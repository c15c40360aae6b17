"""Keyed state machine + rendezvous as true incremental streaming state
(SURVEY.md §2.7 `st_state_machine`, `agg_stateful_rendezvous`,
`st_timeout_ladder`).

The reference keeps per-key progress in JSON coordination files
(`api/login_workflow.py:79-91`) and blocks on a durable OTP promise with a
300 s timeout (`api/login_workflow.py:117`). Here both are
`applyInPandasWithState` operators: per-key state lives in the state store,
timeouts use `GroupStateTimeout.ProcessingTimeTimeout`, and replay safety
comes from the checkpoint instead of Restate's journal.

The transition/rendezvous cores are pure Python functions, unit-testable
without a streaming query; the Spark wrappers are thin.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# The reference's 6-state progress machine
# (`api/playwright_login_runner.py:44-157`): linear progress, two terminals.
STATES = (
    "subprocess_created",
    "browser_ready",
    "waiting_for_otp",
    "otp_submitted",
    "success",
    "error",
)
_ORDER = {s: i for i, s in enumerate(STATES)}
TERMINAL = {"success", "error"}

# Timeout ladder constants mirrored from the reference (BASELINE.md):
RENDEZVOUS_TIMEOUT_MS = 300_000  # durable-promise wait, login_workflow.py:117
OTP_POLL_CAP_MS = 600_000  # subprocess OTP poll cap, playwright_login_runner.py:122
RESULT_POLL_CAP_MS = 5 * 3600 * 1000  # workflow result poll cap, login_workflow.py:128,162


def advance(current: str | None, incoming: str) -> str:
    """Pure transition: monotone progress, terminals absorb, replays and
    out-of-order statuses never regress (the reference's idempotent
    re-entry: a running subprocess is not respawned,
    `api/login_workflow.py:73-91`)."""
    if incoming not in _ORDER:
        return current if current is not None else "subprocess_created"
    if current is None:
        return incoming
    if current in TERMINAL:
        return current
    if incoming == "error":
        return "error"
    return incoming if _ORDER[incoming] > _ORDER[current] else current


STATE_MACHINE_OUTPUT = "key string, state string, n_events long"
STATE_MACHINE_STATE = "state string, n_events long"


def _state_machine_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
):
    current, n = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        ordered = pdf.sort_values(["seq"]) if "seq" in pdf.columns else pdf
        for status in ordered["status"]:
            current = advance(current, status)
            n += 1
    state.update((current, n))
    yield pd.DataFrame({"key": [key[0]], "state": [current], "n_events": [n]})


def apply_state_machine(statuses: DataFrame) -> DataFrame:
    """statuses: streaming DF with (key string, status string, seq long).
    Emits the per-key machine state after each micro-batch."""
    return statuses.groupBy("key").applyInPandasWithState(
        _state_machine_fn,
        STATE_MACHINE_OUTPUT,
        STATE_MACHINE_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


RENDEZVOUS_OUTPUT = "key string, status string, otp string"
RENDEZVOUS_STATE = "waiting boolean, otp string"


def _make_rendezvous_fn(timeout_ms: int):
    def _fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        """Two-sided keyed rendezvous (`api/login_workflow.py:117,170-175`):
        a `request` row arms the key and starts the processing-time timeout
        (reference default 300 s); an `otp` row resolves it (whichever side
        arrives first waits in state for the other). On timeout the key
        reports `timeout` — the reference's TimeoutError path."""
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"key": [key[0]], "status": ["timeout"], "otp": [None]})
            return
        waiting, otp = state.get if state.exists else (False, None)
        rows = []
        for pdf in pdfs:
            for _, r in pdf.iterrows():
                if r["kind"] == "request":
                    if otp is not None:  # signal arrived first — match immediately
                        rows.append(("matched", otp))
                        otp = None
                    else:
                        waiting = True
                elif r["kind"] == "otp":
                    if waiting:
                        rows.append(("matched", r["payload"]))
                        waiting = False
                    else:
                        otp = r["payload"]  # park the signal for the request
        if waiting or otp is not None:
            state.update((waiting, otp))
            state.setTimeoutDuration(timeout_ms)
        else:
            state.remove()
        if rows:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(rows),
                    "status": [s for s, _ in rows],
                    "otp": [o for _, o in rows],
                }
            )

    return _fn


# module-level default instance (unit tests drive its timeout branch directly)
_rendezvous_fn = _make_rendezvous_fn(RENDEZVOUS_TIMEOUT_MS)


def apply_rendezvous(signals: DataFrame, timeout_ms: int = RENDEZVOUS_TIMEOUT_MS) -> DataFrame:
    """signals: streaming DF with (key string, kind string in
    {request, otp}, payload string). `timeout_ms` is the per-key wait bound
    (SURVEY §7 hard-item (b): the timeout is a parameter so tests can
    exercise the real timer without waiting the reference's 300 s)."""
    return signals.groupBy("key").applyInPandasWithState(
        _make_rendezvous_fn(timeout_ms),
        RENDEZVOUS_OUTPUT,
        RENDEZVOUS_STATE,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )

"""transformWithStateInPandas forms of the keyed state machine + rendezvous
(SURVEY.md §2.7 `st_state_machine`, `agg_stateful_rendezvous`) — the
current-generation arbitrary-state API beside the `applyInPandasWithState`
forms in state_machine.py.

Why both: `applyInPandasWithState` is the stable API; `transformWithState`
is its successor (SPARK-49564) with named state variables, explicit timers
(register/delete/list), TTL, and initial-state handoff — the shape new
stateful operators should take. Both wrappers reuse the SAME pure
transition core (`advance`, the rendezvous matching rules), so semantics
are pinned by one set of unit tests and the streaming tests assert the two
APIs produce identical results on identical input.

Requires the RocksDB state store provider (`ensure_rocksdb_state_store`
sets it; the HDFS-backed default does not implement the transformWithState
operator contract) AND the `protobuf` package — PySpark's
transform_with_state_driver_worker speaks protobuf to the JVM
(`pyspark/sql/streaming/proto/StateMessage_pb2.py`). protobuf does not ship
in this container (absence re-probed and re-confirmed each round, most
recently r5), so the streaming tests for these forms are skip-marked
behind `transform_with_state_available()`; the `applyInPandasWithState`
forms in state_machine.py are the fully-tested path here.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .state_machine import (
    RENDEZVOUS_OUTPUT,
    RENDEZVOUS_STATE,
    RENDEZVOUS_TIMEOUT_MS,
    STATE_MACHINE_OUTPUT,
    STATE_MACHINE_STATE,
    advance,
)

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def transform_with_state_available() -> bool:
    """True when the environment can actually run transformWithState:
    PySpark's TWS driver worker imports google.protobuf at query start."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def ensure_rocksdb_state_store(spark: SparkSession) -> None:
    """transformWithState requires the RocksDB provider; runtime-settable,
    read at query start."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER)


class StateMachineProcessor(StatefulProcessor):
    """Per-key progress machine (reference 6-state ladder,
    `api/playwright_login_runner.py:44-157`) on named value state."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("machine", STATE_MACHINE_STATE)

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        current, n = self._state.get() if self._state.exists() else (None, 0)
        for pdf in rows:
            ordered = pdf.sort_values(["seq"]) if "seq" in pdf.columns else pdf
            for status in ordered["status"]:
                current = advance(current, status)
                n += 1
        self._state.update((current, n))
        yield pd.DataFrame({"key": [key[0]], "state": [current], "n_events": [n]})

    def close(self) -> None:
        pass


def apply_state_machine_tws(statuses: DataFrame) -> DataFrame:
    """statuses: streaming DF with (key string, status string, seq long).
    Same contract as state_machine.apply_state_machine, new API."""
    ensure_rocksdb_state_store(statuses.sparkSession)
    return statuses.groupBy("key").transformWithStateInPandas(
        statefulProcessor=StateMachineProcessor(),
        outputStructType=STATE_MACHINE_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


class RendezvousProcessor(StatefulProcessor):
    """Two-sided keyed rendezvous (`api/login_workflow.py:117,170-175`) with
    an explicit registered timer for the reference's 300 s wait bound —
    under transformWithState the timeout is a first-class timer
    (register/delete) instead of a state-wide timeout mode."""

    def __init__(self, timeout_ms: int = RENDEZVOUS_TIMEOUT_MS) -> None:
        self._timeout_ms = timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("rendezvous", RENDEZVOUS_STATE)

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        waiting, otp = self._state.get() if self._state.exists() else (False, None)
        out = []
        for pdf in rows:
            for _, r in pdf.iterrows():
                if r["kind"] == "request":
                    if otp is not None:  # signal arrived first — match now
                        out.append(("matched", otp))
                        otp = None
                    else:
                        waiting = True
                elif r["kind"] == "otp":
                    if waiting:
                        out.append(("matched", r["payload"]))
                        waiting = False
                    else:
                        otp = r["payload"]  # park the signal for the request
        if waiting or otp is not None:
            self._state.update((waiting, otp))
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + self._timeout_ms
            )
        else:
            self._state.clear()
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
        if out:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(out),
                    "status": [s for s, _ in out],
                    "otp": [o for _, o in out],
                }
            )

    def handleExpiredTimer(self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo):
        self._state.clear()
        yield pd.DataFrame({"key": [key[0]], "status": ["timeout"], "otp": [None]})

    def close(self) -> None:
        pass


def apply_rendezvous_tws(
    signals: DataFrame, timeout_ms: int = RENDEZVOUS_TIMEOUT_MS
) -> DataFrame:
    """signals: streaming DF with (key string, kind string in
    {request, otp}, payload string). Same contract as
    state_machine.apply_rendezvous, new API."""
    ensure_rocksdb_state_store(signals.sparkSession)
    return signals.groupBy("key").transformWithStateInPandas(
        statefulProcessor=RendezvousProcessor(timeout_ms),
        outputStructType=RENDEZVOUS_OUTPUT,
        outputMode="Update",
        timeMode="ProcessingTime",
    )

"""Idempotent streaming sinks (SURVEY.md §2.7 `st_replay_safe_step`,
§2.1 `snk_state_file`, `snk_http_signal`).

The reference advances its cursor BEFORE processing and swallows all errors
with HTTP 200 (`api/main.py:289-290`, `main.py:311-313`) — at-most-once:
a crash between cursor write and sink loses the batch. The engine inverts
this to at-least-once + idempotent sink: the checkpoint commits an epoch
only after `foreachBatch` returns, and the batch write is keyed by batchId
so a replayed epoch overwrites its own previous (possibly partial) output
instead of duplicating it. Net effect per sink: the parquet write and the
monotone cursor are effectively exactly-once (replays overwrite
themselves); the HTTP push is at-least-once — a replayed epoch re-POSTs
its rows, so the receiver must dedup on the carried identity
(signal_key, otp, batch_id). True end-to-end exactly-once over HTTP would
need a transactional/acknowledged receiver, which the reference's webhook
(fire-and-forget, `api/main.py:180-194`) does not provide.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame


def idempotent_parquet_sink(out_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: write each epoch to its own batchId-keyed
    subdirectory with overwrite — replays are absorbed, not duplicated
    (the journaled-step semantics of `ctx.run`,
    `api/login_workflow.py:110`)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch_id={batch_id}"))

    return write


def watermark_file_sink(
    out_dir: str, state_path: str, id_col: str = "event_id"
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function reproducing the reference's scalar-cursor file
    (`last_history_id.txt`, `api/main.py:258-290`) with the ordering fixed:
    data first, cursor last, cursor write idempotent and monotone. The
    cursor file is observability/interop state — correctness comes from the
    checkpoint, not the file."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        row = batch_df.selectExpr(f"max({id_col}) AS m").collect()[0]
        if row["m"] is None:
            return
        previous = -1
        if os.path.exists(state_path):
            with open(state_path) as f:
                previous = json.load(f).get("last_id", -1)
        if row["m"] > previous:
            tmp = state_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"last_id": int(row["m"]), "batch_id": batch_id}, f)
            os.replace(tmp, state_path)  # atomic, torn-write safe

    return write


def http_signal_sink(
    post: Callable[[str, dict], None]
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function for the keyed HTTP push sink
    (`api/main.py:180-194`): POST one signal per row to the keyed endpoint.
    `post` is injected (tests pass a recorder; production passes a real
    HTTP client). Signals are the post-filter trickle (OTP hits), so the
    driver-side iteration is bounded; the high-volume form is
    `http_signal_sink_partitioned` below (`foreachPartition`, client per
    partition, nothing through the driver)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        for r in batch_df.select("signal_key", "otp").toLocalIterator():
            post(r["signal_key"], {"otp": r["otp"], "batch_id": batch_id})

    return write


def http_signal_sink_partitioned(
    post_factory: "Callable[[], Callable[[str, dict], None]]",
) -> Callable[[DataFrame, int], None]:
    """High-volume form of the HTTP push sink: the POST loop runs INSIDE the
    executors via `foreachPartition` — one client per partition, rows never
    collected to the driver — so throughput scales with the cluster instead
    of the driver NIC. `post_factory` is called once per partition ON THE
    EXECUTOR to build the client (a connection/session cannot be pickled;
    the factory closure can). Delivery semantics match http_signal_sink:
    at-least-once, receiver dedups on (signal_key, otp, batch_id)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        def send_partition(rows) -> None:
            post = post_factory()
            for r in rows:
                post(r["signal_key"], {"otp": r["otp"], "batch_id": batch_id})

        batch_df.select("signal_key", "otp").foreachPartition(send_partition)

    return write

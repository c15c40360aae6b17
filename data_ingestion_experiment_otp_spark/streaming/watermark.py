"""Streaming ingestion wiring (SURVEY.md §2.7 [ref] rows, streaming forms).

Maps the reference's file-persisted-cursor pipeline (`api/main.py:258-290`)
onto Structured Streaming primitives:

- offsets/cursor        → the checkpoint (engine-owned, replaces
                          `last_history_id.txt`)
- duplicate delivery    → `withWatermark(...).dropDuplicatesWithinWatermark(
                          ["event_id"])` with REAL bounded state eviction
                          (plain dropDuplicates on the id alone never
                          evicts — see dedup_by_id)
- 2-min freshness bound → `withWatermark("ts", "2 minutes")` ahead of the
                          stateful ops (`api/main.py:94-97`)
- windowed aggregation  → watermarked tumbling window in append mode

All builders take a DataFrame (batch or streaming) — the identical plan
runs under `spark.read` in tests/oracles and `spark.readStream` in
production; `stream_events` provides the readStream entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# Schema of a staged events directory (written by `stage_events_dir` from
# the catalog-normalized fixture, so ts is a UTC us TIMESTAMP).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

FRESHNESS_BOUND = "2 minutes"  # api/main.py:96


def stage_events_dir(spark: SparkSession, sf_dir: str, target_dir: str, n_files: int = 4) -> str:
    """Split the single-file events fixture into an n-file directory so the
    file-stream source (which consumes directories, one-or-more new files
    per micro-batch) has real incremental arrivals to process.

    The split is BY TIME RANGE and each slice is written in its own
    sequential job, so slice k's file has a strictly larger mtime than
    slice k-1's — the file source admits files in (mtime, …) order, making
    arrival order match event-time order. (A single repartitionByRange
    write stamps all files with one mtime and the source may admit them in
    any order; a random split is even worse — everything after the first
    batch is late vs the watermark and silently dropped. Correct watermark
    semantics, useless fixture.)"""
    import time

    from ..sources import catalog

    ev = catalog.load(spark, sf_dir, "events")
    if n_files > 1:
        pcts = ", ".join(str((k + 1) / n_files) for k in range(n_files - 1))
        bounds = list(
            ev.selectExpr(
                f"percentile_approx(unix_micros(ts), array({pcts}), 10000) AS b"
            ).collect()[0]["b"]
        )
    else:
        bounds = []
    lo = None
    for k in range(n_files):
        hi = bounds[k] if k < len(bounds) else None
        sl = ev
        if lo is not None:
            sl = sl.filter(F.expr(f"unix_micros(ts) > {lo}"))
        if hi is not None:
            sl = sl.filter(F.expr(f"unix_micros(ts) <= {hi}"))
        sl.coalesce(1).write.mode("append").parquet(target_dir)
        time.sleep(0.05)  # guarantee distinct ms-resolution mtimes
        lo = hi
    return target_dir


def stream_events(spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-stream source over a directory of event files: each micro-batch
    reads only new files — the incremental-scan semantics of the reference's
    `history.list(startHistoryId=…)` (`api/main.py:278-287`) with the
    checkpoint playing the cursor role. Use `stage_events_dir` to build the
    directory from the single-file fixture."""
    return (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )


def with_freshness_watermark(events: DataFrame, bound: str = FRESHNESS_BOUND) -> DataFrame:
    """Event-time lateness bound: rows older than `bound` relative to the
    stream watermark never reach stateful operators (`api/main.py:94-97`).
    In batch mode `withWatermark` is a no-op, preserving plan reuse."""
    return events.withWatermark("ts", bound)


def dedup_by_id(events: DataFrame, bound: str = FRESHNESS_BOUND) -> DataFrame:
    """Exactly-once-ish delivery (`api/main.py:269-273`): duplicates and
    replays within the watermark horizon are dropped on the message id; the
    watermark bounds the dedup state store so it cannot grow unboundedly —
    the 100 TB-stream analog of the reference's scalar cursor.

    `dropDuplicatesWithinWatermark`, NOT plain `dropDuplicates`: with the
    event-time column absent from the key subset, plain dropDuplicates
    keeps every key's state forever — watermark or no watermark (measured:
    8 day-spaced epochs retained 399/400 state rows, zero evictions; the
    eviction-is-real form is pinned in
    tests/test_streaming.py::TestWatermarkStateBound)."""
    return with_freshness_watermark(events, bound).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def dedup_by_content(events: DataFrame, bound: str = FRESHNESS_BOUND) -> DataFrame:
    """Streaming CONTENT dedup via `dropDuplicatesWithinWatermark`: the key
    is the sha256 of the payload (the streaming form of llm_exact_dedup),
    and — unlike `dropDuplicates`, which keeps every seen key's state until
    its event-time bucket expires — the WithinWatermark variant evicts a
    key's state as soon as the watermark passes its first-seen timestamp
    plus the bound. That is the correct knob for redelivery-style dupes
    (retries arrive within minutes, so state stays bounded by arrival rate,
    not key cardinality — at 100 TB-stream scale the difference is the
    state store fitting in memory or not)."""
    keyed = events.withColumn("content_hash", F.sha2("props", 256))
    return with_freshness_watermark(keyed, bound).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def windowed_counts(events: DataFrame, window: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregate in append mode: a window closes
    (emits) only once the watermark passes its end — late rows inside the
    bound still update it, later ones are dropped."""
    return (
        with_freshness_watermark(events)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_seconds(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_stream_rendezvous_join(
    requests: DataFrame, otps: DataFrame, within: str = "10 minutes"
) -> DataFrame:
    """Stream-stream interval join — the stateless-API form of the OTP
    rendezvous (`api/login_workflow.py:117,170-175`): a request row matches
    an otp row with the same key arriving within `within` AFTER it. Both
    sides carry watermarks, so the join state for a key is evicted once the
    watermark passes its interval — bounded state without any custom
    stateful operator. Use this form when the matching rule is a pure
    time-interval predicate; the applyInPandasWithState /
    transformWithState forms (state_machine.py, transform_state.py) add
    what this cannot express: explicit timeout rows on non-arrival and
    first-arrival-wins parking semantics."""
    r = requests.withWatermark("ts", within).alias("r")
    o = otps.withWatermark("ts", within).alias("o")
    return r.join(
        o,
        F.expr(
            f"r.key = o.key AND o.ts >= r.ts AND o.ts <= r.ts + interval {within}"
        ),
    ).select(
        F.col("r.key").alias("key"),
        F.col("o.payload").alias("otp"),
        F.unix_seconds(F.col("r.ts")).alias("request_ts_s"),
        F.unix_seconds(F.col("o.ts")).alias("otp_ts_s"),
    )

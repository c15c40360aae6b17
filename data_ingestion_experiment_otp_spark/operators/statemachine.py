"""Stateful operator set, batch-expressed (SURVEY.md §2.7).

The reference's genuinely distinctive semantics — watermark dedup, keyed
rendezvous with timeout, per-key state machine — are built batch-first here
with full SQL oracles; the true streaming forms (applyInPandasWithState,
checkpointed dedup) live in `streaming/` and are covered by pytest rather
than the DuckDB oracle.

Design note (100 TB): each of these is one shuffle on the key column
followed by per-key work that is either a window or a JVM-side fold
(`F.aggregate` over a sorted collect_list). Per-key event counts are
bounded (a user's events, not the whole table), so collect_list state stays
small even when the table is huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.catalog import load


@register(
    "st_watermark_dedup",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
    GROUP BY event_id, user_id, event_type
    """,
    tags=("streaming", "dedup"),
)
def st_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-delivery elimination: the event feed is delivered twice
    (simulating Pub/Sub redelivery, which the reference guards with the
    monotonic cursor at `api/main.py:269-273`); `dropDuplicates` on the
    message id restores exactly-once. Streaming form:
    `withWatermark(...).dropDuplicates(["event_id"])` with state eviction."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    redelivered = ev.unionByName(ev)
    return redelivered.dropDuplicates(["event_id"])


@register(
    "agg_stateful_rendezvous",
    oracle="""
    SELECT s.event_id AS signup_event_id,
           s.user_id,
           min(epoch_us(p.ts)) AS matched_us,
           CASE WHEN min(p.ts) IS NOT NULL THEN 'matched' ELSE 'timeout' END AS status
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = s.user_id
     AND p.ts >= s.ts
     AND p.ts <= s.ts + INTERVAL 300 SECOND
    GROUP BY s.event_id, s.user_id
    """,
    tags=("streaming", "state"),
)
def agg_stateful_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed two-sided rendezvous with timeout (reference: the login workflow
    blocks per key on a durable OTP promise with a 300 s timeout,
    `api/login_workflow.py:117`, resolved by `receive_otp`,
    `api/login_workflow.py:170-175`).

    Batch form: interval-bounded stream-stream join — each signup (the
    waiting side) matches the earliest purchase (the signal side) for the
    same key within 300 s, else reports `timeout`. The equi key carries the
    shuffle; the time bound is the post-join predicate, exactly how a
    watermarked stream-stream join executes it.
    """
    ev = load(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"),
        F.col("user_id"),
        F.col("ts").alias("s_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    cond = (
        (s.user_id == p.p_user_id)
        & (p.p_ts >= s.s_ts)
        & (p.p_ts <= s.s_ts + F.expr("INTERVAL 300 SECONDS"))
    )
    return (
        s.join(p, cond, "left")
        .groupBy("signup_event_id", "user_id")
        .agg(F.min(F.unix_micros("p_ts")).alias("matched_us"))
        .withColumn(
            "status",
            F.when(F.col("matched_us").isNotNull(), F.lit("matched")).otherwise(F.lit("timeout")),
        )
    )


@register(
    "st_state_machine",
    oracle="""
    SELECT user_id,
           list_reduce(
             list_prepend('start', list(event_type ORDER BY ts, event_id)),
             (s, x) -> CASE WHEN s = 'error' THEN 'error'
                            WHEN x = 'error' THEN 'error'
                            WHEN s = 'start' AND x = 'signup' THEN 'active'
                            WHEN s = 'active' AND x = 'purchase' THEN 'converted'
                            ELSE s END) AS final_state,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "state"),
)
def st_state_machine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key deterministic state machine folded over the time-ordered event
    sequence (reference: the `subprocess_created → … → success|error` JSON
    status machine, `api/login_workflow.py:79-91`).

    Batch form: collect_list sorted by (ts, event_id) folded with
    `F.aggregate` — the entire fold runs JVM-side inside whole-stage codegen,
    no Python. Streaming form with true incremental state:
    `streaming/state_machine.py` (applyInPandasWithState).
    """
    ev = load(spark, sf_dir, "events")
    seq = F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type")))
    return (
        ev.groupBy("user_id")
        .agg(
            F.aggregate(seq, F.lit("start"), _transition).alias("final_state"),
            F.count("*").alias("n_events"),
        )
    )


def _transition(s, x):
    et = x["event_type"]
    return (
        F.when(s == "error", "error")
        .when(et == "error", "error")
        .when((s == "start") & (et == "signup"), "active")
        .when((s == "active") & (et == "purchase"), "converted")
        .otherwise(s)
    )


@register(
    "st_late_data_reject",
    oracle="""
    WITH hwm AS (
      SELECT user_id,
             max(ts) - INTERVAL 2 MINUTE AS wm
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.event_type
    FROM events e JOIN hwm USING (user_id)
    WHERE e.ts > hwm.wm
    """,
    tags=("streaming", "event-time"),
)
def st_late_data_reject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key event-time lateness bound (reference: emails older than 2 min
    never fire the workflow, `api/main.py:94-97`). Batch form: each key's
    watermark is its max event time minus the bound; strictly-late rows are
    dropped. One shuffle on the key; the window avoids a self-join.
    Streaming form: `withWatermark("ts", "2 minutes")` before stateful ops
    (streaming/watermark.py)."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    wm = F.max("ts").over(Window.partitionBy("user_id")) - F.expr("INTERVAL 2 MINUTES")
    return (
        ev.withColumn("wm", wm)
        .filter(F.col("ts") > F.col("wm"))
        .select("event_id", "user_id", "event_type")
    )


@register(
    "flt_empty_shortcircuit",
    oracle="""
    SELECT count(*) AS n
    FROM events
    WHERE event_type = 'no_such_type'
    """,
    tags=("filter",),
)
def flt_empty_shortcircuit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-batch short-circuit (reference: `api/main.py:296-298`): a
    predicate matching nothing collapses downstream work — Catalyst's
    PropagateEmptyRelation prunes the subtree; the aggregate still returns
    its 0-row count."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "no_such_type").agg(F.count("*").alias("n"))


@register(
    "flt_sequence_gaps",
    oracle="""
    SELECT user_id, prev_id, event_id, gap FROM (
      SELECT user_id, event_id,
             lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_id,
             event_id - lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS gap
      FROM events
    )
    WHERE gap > 2000
    """,
    tags=("filter", "audit"),
)
def flt_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delivery-completeness audit — the generalization of the reference's
    monotone-cursor assumption (`api/main.py:278-287` trusts that history
    ids arrive without holes): per user, flag consecutive event-id pairs
    whose id distance exceeds the expected stride (dropped/undelivered
    messages show up as abnormal gaps). One lag window per key, the same
    single-shuffle shape as win_funcs; the gap threshold is relative to
    the fixture's id-interleaving density."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").select("user_id", "event_id")
    w = W.partitionBy("user_id").orderBy("event_id")
    gapped = ev.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_id"),
        (F.col("event_id") - F.lag("event_id").over(w)).alias("gap"),
    )
    return gapped.filter(F.col("gap") > 2000).select(
        "user_id", "prev_id", "event_id", "gap"
    )

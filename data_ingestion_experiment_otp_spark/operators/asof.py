"""As-of join (SURVEY.md §2.4 `join_asof`).

Spark has no native as-of join; the scalable composition is the documented
union + `last(..., ignorenulls)` window pattern: one shuffle on the join
key, one per-key ordered pass, no nested-loop and no driver-side work —
this is O(n log n) per key group and survives 100 TB because it is just a
window over the key-partitioned union.

Semantics implemented: for every `purchase` event, the most recent `signup`
event of the same user with signup.ts <= purchase.ts (ties at equal ts count
— the signup sorts before the purchase at the same timestamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..plans.registry import register
from ..sources.catalog import load


def _asof_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared core: per purchase row, the nearest earlier same-user signup
    via the union + last(ignorenulls) window — one shuffle on the key,
    one ordered pass. Columns: event_id, user_id, probe_us, asof_signup_us."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("is_probe"), F.lit(None).cast("timestamp").alias("signup_ts")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"), F.lit(0).alias("is_probe"), F.col("ts").alias("signup_ts")
    )
    unioned = purchases.unionByName(signups)
    # At equal ts the signup (is_probe=0) sorts first so it is visible to the
    # purchase row's frame — the "<=" as-of semantics.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        unioned.withColumn("last_signup", F.last("signup_ts", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("probe_us"),
            F.unix_micros("last_signup").alias("asof_signup_us"),
        )
    )


@register(
    "join_asof",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           (SELECT epoch_us(max(s.ts)) FROM events s
             WHERE s.user_id = p.user_id
               AND s.event_type = 'signup'
               AND s.ts <= p.ts) AS asof_signup_us
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-earlier-event join via the union + last(ignorenulls) window."""
    return _asof_frame(spark, sf_dir).select("event_id", "user_id", "asof_signup_us")


_ASOF_TOLERANCE_US = 24 * 3_600_000_000  # 1-day match horizon


@register(
    "join_asof_tolerance",
    oracle=f"""
    SELECT event_id, user_id,
           CASE WHEN asof_signup_us IS NOT NULL
                 AND probe_us - asof_signup_us <= {_ASOF_TOLERANCE_US}
                THEN asof_signup_us END AS asof_signup_us
    FROM (
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS probe_us,
             (SELECT epoch_us(max(s.ts)) FROM events s
               WHERE s.user_id = p.user_id
                 AND s.event_type = 'signup'
                 AND s.ts <= p.ts) AS asof_signup_us
      FROM events p
      WHERE p.event_type = 'purchase'
    )
    """,
    tags=("join", "asof"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`join_asof` with a match horizon (pandas `merge_asof(tolerance=…)`
    semantics): a purchase matches the nearest earlier signup only if it
    is at most the tolerance old — stale matches become nulls, they are
    not widened to the next-older candidate. Same single-shuffle window
    plan as `join_asof`; the tolerance is a post-window projection, so
    the horizon changes NOTHING about the physical shape (contrast with
    a range-join formulation, whose cost scales with the horizon
    width)."""
    return _asof_frame(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.when(
            F.col("asof_signup_us").isNotNull()
            & (F.col("probe_us") - F.col("asof_signup_us") <= _ASOF_TOLERANCE_US),
            F.col("asof_signup_us"),
        ).alias("asof_signup_us"),
    )

"""Change-data-capture / merge operators (engine additions beyond SURVEY §2).

The reference pipeline is append-only (each poll inserts fresh OTP rows;
`gmail-otp-listener/api/main.py` never updates), but any corpus that feeds
recurring training runs needs *in-place maintenance*: apply a change batch
(upserts + deletes) to a standing table, and keep a queryable history of
how a row evolved. Both are expressed as stock Catalyst plans — a MERGE is
just a full-outer join on the key, SCD-2 history is one window pass — so
they inherit every scale property the join/window operators already pin.

Scale notes (100 TB target):
- `cdc_merge_upsert`: the merge shuffles BOTH sides on the key once. With
  the target table bucketed on the key (see `join_bucketed_colocated`) the
  standing side's exchange disappears and only the (much smaller) change
  batch shuffles. Rewrite amplification is bounded by partitioning the
  target on a coarse key and using dynamic partition overwrite
  (`spark.sql.sources.partitionOverwriteMode=dynamic`) so only partitions
  containing touched keys rewrite.
- `cdc_scd2_history`: one shuffle on the entity key, then a single
  window pass computes validity ranges — O(changes), no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..plans.registry import register
from ..sources.catalog import load


@register(
    "cdc_merge_upsert",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 4 <> 0
    ),
    changes AS (
      SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS c_totalprice,
             CASE WHEN o_orderkey % 8 = 0 THEN 'D' ELSE 'U' END AS op
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT coalesce(b.o_orderkey, c.o_orderkey) AS o_orderkey,
           coalesce(c.o_custkey, b.o_custkey) AS o_custkey,
           round(coalesce(c.c_totalprice, b.o_totalprice), 2) AS totalprice,
           CASE WHEN c.op IS NOT NULL AND b.o_orderkey IS NULL THEN 'insert'
                WHEN c.op IS NOT NULL THEN 'update'
                ELSE 'keep' END AS action
    FROM base b FULL JOIN changes c ON b.o_orderkey = c.o_orderkey
    WHERE coalesce(c.op, '') <> 'D'
    """,
    tags=("cdc", "merge"),
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a table format: apply a change batch
    (upserts + deletes) to a standing table via one full-outer join on the
    key — matched+U rewrites the row, matched+D drops it, unmatched change
    rows insert, untouched base rows pass through. The `action` column
    makes the merge auditable (insert/update/keep counts are the ingest
    metrics a corpus-maintenance job reports).

    The fixture derives both sides deterministically from `orders`: the
    standing table is keys not divisible by 4; the change batch is the even
    keys (so it overlaps base on key%4∈{2,6} → updates, covers key%4=0 →
    inserts, and every key%8=0 is a delete). Delete-of-absent-key is a
    no-op, exercised because key%8=0 ∩ base = ∅ here."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    base = o.filter(F.col("o_orderkey") % 4 != 0).alias("b")
    changes = (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") + F.lit(100.0)).alias("c_totalprice"),
            F.when(F.col("o_orderkey") % 8 == 0, "D").otherwise("U").alias("op"),
        )
        .alias("c")
    )
    merged = base.join(changes, F.col("b.o_orderkey") == F.col("c.o_orderkey"), "full_outer")
    return merged.filter(F.coalesce(F.col("c.op"), F.lit("")) != "D").select(
        F.coalesce(F.col("b.o_orderkey"), F.col("c.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("c.o_custkey"), F.col("b.o_custkey")).alias("o_custkey"),
        F.round(F.coalesce(F.col("c.c_totalprice"), F.col("b.o_totalprice")), 2).alias(
            "totalprice"
        ),
        F.when(F.col("c.op").isNotNull() & F.col("b.o_orderkey").isNull(), "insert")
        .when(F.col("c.op").isNotNull(), "update")
        .otherwise("keep")
        .alias("action"),
    )


@register(
    "cdc_scd2_history",
    oracle="""
    SELECT user_id,
           row_number() OVER w AS version,
           round(value, 2) AS value,
           epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER w AS valid_to_us
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("cdc", "window"),
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a change log (purchase events
    per user) into a versioned history — each change opens a validity
    interval `[valid_from, valid_to)` closed by the next change's
    timestamp; `valid_to_us IS NULL` marks the current version. One shuffle
    on the entity key + a single window pass (row_number + lead) — no
    self-join, O(changes) at any scale. Point-in-time reconstruction of
    the dimension is then a plain filter
    (`valid_from_us <= t AND (valid_to_us IS NULL OR valid_to_us > t)`),
    which pushes down to the scan of the materialized history.

    Timestamps are emitted as epoch microseconds (bigint) per the registry
    convention; ties on ts are broken by event_id so version assignment is
    total-ordered and engine-independent."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        F.row_number().over(w).alias("version"),
        F.round("value", 2).alias("value"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("valid_to_us"),
    )


@register(
    "cdc_snapshot_diff",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
    ),
    v2 AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                WHEN b.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           round(b.o_totalprice, 3) AS new_totalprice
    FROM v1 a FULL JOIN v2 b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL
       OR b.o_orderkey IS NULL
       OR round(a.o_totalprice, 6) <> round(b.o_totalprice, 6)
       OR a.o_orderstatus <> b.o_orderstatus
    """,
    tags=("cdc", "diff"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse of `cdc_merge_upsert`: derive the CHANGESET between two
    table snapshots (what a vendor re-delivery or a recomputed upstream
    gives you instead of a change log) — one full-outer join on the key,
    rows classified insert/delete/update, unchanged rows dropped so the
    output is O(churn) not O(table). Feed the result to the merge or
    SCD-2 operators to maintain downstream state; at 100 TB the same
    bucketing note as the merge applies, and comparing a content hash of
    the value columns (sha2 of a canonical struct) replaces the
    column-by-column predicate when tables are wide."""
    o = load(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2 = (
        o.filter(F.col("o_orderkey") % 7 != 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 1.1
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    a = v1.alias("a")
    b = v2.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    op = (
        F.when(F.col("a.o_orderkey").isNull(), "insert")
        .when(F.col("b.o_orderkey").isNull(), "delete")
        .otherwise("update")
    )
    changed = (
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.round(F.col("a.o_totalprice"), 6) != F.round(F.col("b.o_totalprice"), 6))
        | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
    )
    return joined.filter(changed).select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        op.alias("op"),
        # round at 3, not 2: the v2 snapshot's x*1.1 perturbation turns
        # 2-decimal money into EXACT 3-decimal values, so ~10% of updates
        # sit precisely on a half-cent — where Spark (exact-BigDecimal
        # HALF_UP) and DuckDB (scaled-double rounding) legitimately
        # disagree (found live at sf0.1). At 3 decimals the values are on
        # grid points, a half-ulp from nothing.
        F.round(F.col("b.o_totalprice"), 3).alias("new_totalprice"),
    )

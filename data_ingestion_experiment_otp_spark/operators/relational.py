"""Scans, filters, projections, joins (SURVEY.md §2.1, §2.2, §2.4).

Everything here is a stock Catalyst plan: filters/projections push into the
parquet scan, small dimension tables are broadcast explicitly, large joins
shuffle on their keys and rely on AQE for skew/coalesce. No custom join code
— matching SURVEY §2.4's conclusion that zero custom join machinery is
warranted.

Reference parity notes are cited per query (paths relative to
/root/reference/gmail-otp-listener unless noted).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.catalog import load

# ---------------------------------------------------------------------------
# Scans (§2.1)
# ---------------------------------------------------------------------------


@register(
    "src_parquet",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity < 10
    """,
    tags=("scan",),
)
def src_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projected, filtered parquet scan — predicate + column pruning reach the
    reader (`.explain` shows PushedFilters and a 4-column ReadSchema)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") < 10))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@register(
    "src_point_lookup_latest",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 1
    """,
    tags=("scan",),
)
def src_point_lookup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1-by-recency scan (reference: `api/main.py:146-151`, `maxResults=1`).

    Spark plans this as TakeOrderedAndProject — the LIMIT is pushed so no
    global sort materializes.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(1)
        .select("event_id", "user_id", "event_type")
    )


@register(
    "src_incremental_history",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us
    FROM events
    WHERE event_id > (SELECT max(event_id) * 3 // 4 FROM events)
      AND event_type = 'signup'
    """,
    tags=("scan", "cdc"),
)
def src_incremental_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CDC scan: only change records after the cursor, with a
    server-side event-type filter (reference: `api/main.py:278-287`,
    `startHistoryId` + `historyTypes=["messageAdded"]`).

    The cursor is a scalar aggregate broadcast to every scan task; both the
    id-range and the type predicate push into the parquet reader.
    """
    ev = load(spark, sf_dir, "events")
    cursor = ev.agg((F.max("event_id") * 3 / 4).cast("long").alias("cursor"))
    return (
        ev.join(F.broadcast(cursor))
        .filter((F.col("event_id") > F.col("cursor")) & (F.col("event_type") == "signup"))
        .select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"))
    )


# ---------------------------------------------------------------------------
# Filters / projections (§2.2)
# ---------------------------------------------------------------------------


@register(
    "flt_freshness",
    oracle="""
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 2 MINUTE
    """,
    tags=("filter", "event-time"),
)
def flt_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time freshness predicate: drop rows older than 2 minutes
    relative to the newest event (reference: `api/main.py:94-97` — strict
    `age > 2 min` is dropped, so exactly-2-minutes-old rows survive as
    `ts >= max_ts - 2min`). Streaming form: `withWatermark("ts","2 minutes")`
    (see streaming/watermark.py)."""
    ev = load(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.join(F.broadcast(max_ts))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 2 MINUTES"))
        .select("event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us"))
    )


@register(
    "flt_stale_watermark",
    oracle="""
    SELECT event_id, user_id
    FROM events
    WHERE event_id > (SELECT max(event_id) // 2 FROM events)
    """,
    tags=("filter", "dedup"),
)
def flt_stale_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-cursor dedup as an anti-join: a batch of incoming ids is
    checked against the already-seen set; `id <= cursor` rows are discarded
    (reference: `api/main.py:269-273`, note `<=` not `<`).

    Batch form of the watermark gate: LEFT ANTI join against the seen-ids
    relation. At scale the seen-set is a bloom/state store; here it is an
    exact anti-join that AQE turns into a broadcast when small.
    """
    ev = load(spark, sf_dir, "events")
    cursor = ev.agg((F.max("event_id") / 2).cast("long").alias("cursor"))
    seen = (
        ev.join(F.broadcast(cursor))
        .filter(F.col("event_id") <= F.col("cursor"))
        .select("event_id")
    )
    return ev.join(seen, on="event_id", how="left_anti").select("event_id", "user_id")


@register(
    "flt_platform_gate",
    oracle="""
    SELECT event_id, user_id FROM events WHERE event_type = 'purchase'
    """,
    tags=("filter",),
)
def flt_platform_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical gate: accept exactly one category (reference:
    `api/login_workflow.py:44-45`, platform != "zepto" rejected)."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id")


@register(
    "prj_general",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment) AS seg,
           c_acctbal,
           c_acctbal * 1.1 AS projected_bal
    FROM customer
    WHERE c_acctbal BETWEEN 100 AND 9000
      AND c_mktsegment LIKE '%A%'
      AND c_nationkey IN (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    """,
    tags=("projection",),
)
def prj_general(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General select/withColumn with between/isin/like predicates
    (engine-target generalization of the reference's fixed projections,
    `api/main.py:245-246`)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.filter(
            F.col("c_acctbal").between(100, 9000)
            & F.col("c_mktsegment").like("%A%")
            & F.col("c_nationkey").isin(list(range(13)))
        )
        .select(
            "c_custkey",
            F.upper("c_mktsegment").alias("seg"),
            "c_acctbal",
            (F.col("c_acctbal") * 1.1).alias("projected_bal"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (§2.4) — all stock; broadcast hints where the dimension is small
# ---------------------------------------------------------------------------


@register(
    "join_inner_equi",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("join",),
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders ⋈ customer + aggregation. Catalyst/AQE picks
    the physical join (broadcast at this scale; sort-merge on the cluster
    when both sides are large and co-partitioned)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )


@register(
    "join_broadcast",
    oracle="""
    SELECT r_name,
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)))::DOUBLE AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("join", "broadcast"),
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact lineitem against three explicitly-broadcast dims.
    At 100 TB the fact side never shuffles for these joins — each dim ships
    to every executor once (BroadcastHashJoin, no exchange on the fact)."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            # exact decimal sum of the 4-decimal product — double-sum
            # order error exceeds the 4-dec half-grid at fact-table group
            # sizes; see aggregates.agg_groupby.
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,4)")).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "join_outer",
    oracle="""
    SELECT 'left' AS jtype, c_custkey AS k, count(o_orderkey) AS n1, CAST(NULL AS BIGINT) AS n2
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    UNION ALL
    SELECT 'right' AS jtype, c_custkey AS k, o_orderkey AS n1, CAST(NULL AS BIGINT) AS n2
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal < 0
    UNION ALL
    SELECT 'full' AS jtype,
           coalesce(cn.nationkey, sn.nationkey) AS k,
           coalesce(cn.n, 0) AS n1,
           coalesce(sn.n, 0) AS n2
    FROM (SELECT c_nationkey AS nationkey, count(*) AS n FROM customer GROUP BY 1) cn
    FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n FROM supplier GROUP BY 1) sn
      ON cn.nationkey = sn.nationkey
    """,
    tags=("join",),
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join family (SURVEY §2.4 left/right/full) in one tagged result:

    - 'left': customer ⟕ orders — order-less customers kept with count 0;
    - 'right': orders ⟖ customer (negative balances) — preserved-side rows
      carry null o_orderkey;
    - 'full': full outer join of two keyed aggregates, nulls coalesced.

    Each branch is a genuine outer join in the physical plan (three joins,
    one union); the single-form variants (join_left/right/full) remain
    registered for pytest parity."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    null_long = F.lit(None).cast("long")

    left = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n1"))
        .select(F.lit("left").alias("jtype"), F.col("c_custkey").alias("k"), "n1",
                null_long.alias("n2"))
    )
    right = (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .filter(F.col("c_acctbal") < 0)
        .select(F.lit("right").alias("jtype"), F.col("c_custkey").alias("k"),
                F.col("o_orderkey").alias("n1"), null_long.alias("n2"))
    )
    cn = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(F.count("*").alias("cn_n"))
    sn = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(F.count("*").alias("sn_n"))
    full = (
        cn.join(sn, on="nationkey", how="full")
        .select(
            F.lit("full").alias("jtype"),
            F.col("nationkey").alias("k"),
            F.coalesce("cn_n", F.lit(0)).alias("n1"),
            F.coalesce("sn_n", F.lit(0)).alias("n2"),
        )
    )
    return left.unionByName(right).unionByName(full)


@register(
    "join_semi_anti",
    oracle="""
    SELECT 'semi' AS jtype, c_custkey, c_nationkey
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'anti' AS jtype, c_custkey, c_nationkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence joins (SURVEY §2.4 semi/anti) in one tagged result: the
    EXISTS and NOT-EXISTS partitions of customer vs orders. The anti branch
    is also the batch form of the reference's stale-id rejection
    (`api/main.py:269-273`). Two genuine Left{Semi,Anti} joins in the plan."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select(F.lit("semi").alias("jtype"), "c_custkey", "c_nationkey")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.lit("anti").alias("jtype"), "c_custkey", "c_nationkey")
    )
    return semi.unionByName(anti)


@register(
    "join_left",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
    tags=("join",),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count = 0)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right",
    oracle="""
    SELECT o_orderkey, c_custkey, c_mktsegment
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal < 0
    """,
    tags=("join",),
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join preserving order-less customers (null o_orderkey);
    the acctbal predicate pushes into the preserved (customer) side's scan."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .filter(F.col("c_acctbal") < 0)
        .select("o_orderkey", "c_custkey", "c_mktsegment")
    )


@register(
    "join_full",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nationkey, count(*) AS n FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nationkey, count(*) AS n FROM supplier GROUP BY 1)
    SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
           coalesce(cn.n, 0) AS n_customers,
           coalesce(sn.n, 0) AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
    tags=("join",),
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two keyed aggregates, nulls coalesced to zero."""
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(F.count("*").alias("cn_n"))
    sn = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(F.count("*").alias("sn_n"))
    return (
        cn.join(sn, on="nationkey", how="full")
        .select(
            "nationkey",
            F.coalesce("cn_n", F.lit(0)).alias("n_customers"),
            F.coalesce("sn_n", F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_nationkey
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers with at least one order (EXISTS)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_nationkey")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_nationkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no orders (NOT EXISTS). Also the batch
    form of the reference's stale-id rejection (`api/main.py:269-273`)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_nationkey")
    )


@register(
    "join_theta_range",
    oracle="""
    SELECT c_custkey, count(*) AS n_small_orders
    FROM customer JOIN orders
      ON o_custkey = c_custkey AND o_totalprice < c_acctbal * 20
    GROUP BY c_custkey
    """,
    tags=("join", "theta"),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi join with an additional non-equi (theta/range) predicate. The
    equi key carries the shuffle; the range predicate is evaluated post-match
    — the scalable form of a theta join (pure theta would be a
    BroadcastNestedLoopJoin)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_totalprice < c.c_acctbal * 20)
    return c.join(o, cond).groupBy("c_custkey").agg(F.count("*").alias("n_small_orders"))


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderkey, count(*) AS n_items, round(sum(l_extendedprice), 2) AS order_total
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_totalprice > 100000
    GROUP BY o_orderkey
    """,
    tags=("join", "bucketing"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-fact join via bucketing: both tables are written
    `bucketBy(8, key)` + `sortBy(key)`, so the join and the follow-up
    per-key aggregation need NO exchange at read time — at 100 TB this is
    the standard way to amortize the shuffle of a recurring big-big join
    into a one-time bucketed materialization (`tests/test_plans.py`
    asserts the exchange-free plan). Buckets land in a scratch database
    whose location is off-repo; the one-time write is idempotent per
    session."""
    import tempfile

    # the in-memory catalog is per-session but table LOCATIONs persist on
    # disk — scope the scratch warehouse by application id so a fresh
    # session never collides with a dead one's files
    db = "bucketdemo"
    loc = os.path.join(
        tempfile.gettempdir(), "diospark_buckets", spark.sparkContext.applicationId
    )
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    sf_tag = "sf" + sf_dir.rstrip("/").split("sf")[-1].replace(".", "_").replace("/", "")
    ob, lb = f"{db}.orders_b_{sf_tag}", f"{db}.lineitem_b_{sf_tag}"
    if not spark.catalog.tableExists(ob):
        (
            load(spark, sf_dir, "orders")
            .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable(ob)
        )
    if not spark.catalog.tableExists(lb):
        (
            load(spark, sf_dir, "lineitem")
            .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").saveAsTable(lb)
        )
    # hint forces the sort-merge path the bucketing exists for (at fixture
    # scale the optimizer would otherwise broadcast and bypass it; on a
    # real big-big join SMJ is what AQE picks anyway)
    o = spark.table(ob).filter(F.col("o_totalprice") > 100000).hint("merge")
    l = spark.table(lb)
    return (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("order_total"),
        )
    )


@register(
    "join_stream_static",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_events,
           round(sum(round(value, 2)), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("join", "streaming"),
)
def join_stream_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment in batch form: the event stream joined to a
    broadcast dimension (customer as the user dim). Structured Streaming
    supports the identical plan with `events` as a readStream."""
    ev = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.round("value", 2)), 2).alias("total_value"),
        )
    )


@register(
    "sql_correlated_subquery",
    oracle="""
    SELECT p_brand,
           count(*) AS n_below,
           round(sum(l_extendedprice), 2) AS below_avg_revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    GROUP BY p_brand
    """,
    tags=("sql", "subquery"),
)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-API surface: a correlated scalar subquery (TPC-H Q17 shape —
    lineitems below half the per-part average quantity, revenue by brand),
    submitted as literal SQL over registered temp views. Catalyst
    decorrelates the subquery into a per-part aggregate + join, so the
    plan is two scans + one agg + two joins — no per-row re-execution,
    which is what makes the construct usable at 100 TB. The avg is
    deterministic cross-engine because l_quantity is whole-number-valued
    (integer-exact double sum / count)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_brand,
               count(*) AS n_below,
               round(sum(l_extendedprice), 2) AS below_avg_revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        GROUP BY p_brand
        """
    )


@register(
    "sql_exists_anti",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
      AND NOT EXISTS (SELECT 1 FROM events e
                      WHERE e.user_id = c.c_custkey AND e.event_type = 'error')
    GROUP BY c_mktsegment
    """,
    tags=("sql", "subquery"),
)
def sql_exists_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-API surface: correlated EXISTS / NOT EXISTS predicates ("big
    spenders with no error events"), submitted as literal SQL. Catalyst
    decorrelates both into joins — EXISTS becomes a left-semi join,
    NOT EXISTS a left-anti join (pinned in test_plans) — so each subquery
    costs one hash join over a de-duplicated key set instead of per-row
    re-execution; both are shuffle-partitioned on the customer key and
    AQE-eligible at scale. Semi/anti join probes also never duplicate the
    probe side, so the aggregate sees each customer at most once — the
    semantics NOT IN can't give safely under NULLs."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_customers,
               CAST(sum(c_custkey) AS BIGINT) AS key_sum
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
          AND NOT EXISTS (SELECT 1 FROM events e
                          WHERE e.user_id = c.c_custkey AND e.event_type = 'error')
        GROUP BY c_mktsegment
        """
    )


@register(
    "join_salted_skew",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_events,
           round(sum(round(value, 2)), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str, n_salts: int = 16) -> DataFrame:
    """Hand-salted skew join — the manual form of what AQE's skew-join
    split does at runtime, for engines/paths where AQE can't see the skew
    (e.g. a skewed key feeding a sort-merge join mid-pipeline): the fact
    side gets a deterministic salt `pmod(event_id, N)`, the dimension side
    is exploded N ways, and the join key becomes (key, salt) — a hot key's
    rows now land on N reducers instead of one. The dimension inflates N×
    (bounded: dims are small), the fact side never duplicates, and the
    join RESULT is identical to the unsalted join — which is exactly what
    the oracle checks. Salt from the row id, not rand(): deterministic
    under retries/replays, so speculative re-execution can't double-count."""
    ev = load(spark, sf_dir, "events").withColumn(
        "salt", F.pmod("event_id", F.lit(n_salts)).cast("int")
    )
    c = load(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    # hint("merge") forces the sort-merge path the salting exists for; a
    # broadcast join would make salting pointless (no reducer hot spot).
    return (
        ev.join(c.hint("merge"), (ev.user_id == c.c_custkey) & (ev.salt == c.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.round("value", 2)), 2).alias("total_value"),
        )
    )


_INCIDENT_THRESHOLD = 300.0
_RANGE_WINDOW_US = 300_000_000  # ±5 minutes, in microseconds


@register(
    "join_range_binned",
    oracle=f"""
    WITH i AS (
      SELECT event_id, ts FROM events WHERE value >= {_INCIDENT_THRESHOLD}
    )
    SELECT i.event_id AS incident_id,
           count(e.event_id) AS n_nearby
    FROM i LEFT JOIN events e
      ON e.event_id <> i.event_id
     AND abs(epoch_us(e.ts) - epoch_us(i.ts)) <= {_RANGE_WINDOW_US}
    GROUP BY i.event_id
    """,
    tags=("join", "range"),
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (NO equi key) made sub-quadratic by binning — the
    trick Spark lacks as a native optimization: "events within ±5 min of
    each incident" has no shared key, so the naive plan is a nested-loop
    over points × incidents. Instead both sides are bucketed into
    window-sized time bins; a point can only be within the window of an
    incident in its own or an adjacent bin, so the incident side explodes
    to [bin-1, bin, bin+1] and the join becomes an EQUI join on the bin
    (hash-partitionable, AQE-skew-splittable) with the exact range
    predicate as a residual filter. Each point holds exactly one bin, so
    a pair can match at most once — no dedup pass. The 3× explode is on
    the small (filtered) side; cost scales with points + 3·incidents +
    true matches, never points × incidents."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    binned = ev.withColumn("bin", F.floor(F.col("ts_us") / _RANGE_WINDOW_US))
    incidents = (
        binned.filter(F.col("value") >= _INCIDENT_THRESHOLD)
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("ts_us").alias("i_ts_us"),
            F.explode(
                F.array(F.col("bin") - 1, F.col("bin"), F.col("bin") + 1)
            ).alias("bin"),
        )
    )
    points = binned.select("event_id", "ts_us", "bin")
    return (
        incidents.join(
            points,
            (incidents.bin == points.bin)
            & (F.col("event_id") != F.col("incident_id"))
            & (F.abs(F.col("ts_us") - F.col("i_ts_us")) <= _RANGE_WINDOW_US),
            "left",
        )
        .groupBy("incident_id")
        .agg(F.count("event_id").alias("n_nearby"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction (engine addition)
# ---------------------------------------------------------------------------

# Engine-built bloom filter: m bits packed into m/64 longs, k probes.
# Sized for the fixture build side (~3k keys -> ~4.5% fill, FP ~1e-4);
# at scale m grows with the build-side NDV (keep fill under ~30%).
_BLOOM_BITS = 1 << 16
_BLOOM_K = 3


def _bloom_probes(key_sql: str, k: int = _BLOOM_K) -> list[tuple[F.Column, F.Column]]:
    """k (word-index, bit-mask) column pairs for a key expression: xxhash64
    seeded by probe number, reduced mod m; identical arithmetic on build and
    probe sides. SQL-string expressions because `shiftleft` takes only a
    literal shift through the Python column API."""
    pairs = []
    for i in range(k):
        pos = f"pmod(xxhash64({i}, {key_sql}), {_BLOOM_BITS})"
        word = F.expr(f"cast(shiftright({pos}, 6) as int)")
        mask = F.expr(f"shiftleft(1L, cast({pos} % 64 as int))")
        pairs.append((word, mask))
    return pairs


def _bloom_of(keys: DataFrame, key_col: str = "k") -> DataFrame:
    """Single-row DataFrame holding the bloom bit array of `keys` as a
    word-index -> 64-bit-word map: one partial-aggregated pass (per-word
    bit_or), <= 8 KB however many keys went in."""
    entries = [
        F.struct(w.alias("w"), m.alias("m")) for w, m in _bloom_probes(key_col)
    ]
    return (
        keys.select(F.explode(F.array(*entries)).alias("p"))
        .groupBy(F.col("p.w").alias("w"))
        .agg(F.bit_or(F.col("p.m")).alias("word"))
        .groupBy()
        .agg(F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("bloom"))
    )


def _bloom_prune(df: DataFrame, bloom: DataFrame, key_sql: str) -> DataFrame:
    """Filter `df` to rows whose key passes every bloom probe. The bloom is
    broadcast (single row); no-FN guaranteed, FPs possible."""
    cond = None
    for w, m in _bloom_probes(key_sql):
        hit = F.coalesce(F.element_at(F.col("bloom"), w), F.lit(0)).bitwiseAND(m) != 0
        cond = hit if cond is None else (cond & hit)
    return df.crossJoin(F.broadcast(bloom)).filter(cond).drop("bloom")


@register(
    "join_bloom_pruned",
    oracle="""
    SELECT o.o_orderkey, li.n_items, li.sum_qty
    FROM (SELECT l_orderkey, count(*) AS n_items,
                 round(sum(l_quantity), 2) AS sum_qty
          FROM lineitem GROUP BY l_orderkey) li
    JOIN orders o ON o.o_orderkey = li.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
    tags=("join", "scale"),
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via an explicit bloom filter — the 100 TB shuffle
    cutter: when the dimension side is too big to broadcast raw, broadcast
    a fixed-size bit array of its (filtered) keys instead and prune the
    fact side BEFORE its aggregation shuffle. The bloom collapses to one
    map row (<= 8 KB) and rides a broadcast to every scan task; the final
    exact inner join removes false positives, so the result is
    byte-identical to the unpruned plan — the bloom only shrinks the rows
    entering the exchange (~5x here). The prune sits below the per-key
    aggregate, which no pushdown rule can cross, so Catalyst cannot
    reorder the exact join back under it (a bare bloom+semi-join
    composition gets rewritten by PushDownLeftSemiAntiJoin into
    join-then-bloom — shape pinned in tests/test_plans.py). This is the
    hand-rolled form of Spark's runtime row-level filtering, also pinned
    natively there; owning it makes the pattern available where the
    optimizer's thresholds decline to inject it."""
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    pruned = _bloom_prune(li, _bloom_of(urgent), "l_orderkey")
    per_order = pruned.groupBy("l_orderkey").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )
    return per_order.join(
        urgent, per_order.l_orderkey == urgent.k
    ).select(F.col("k").alias("o_orderkey"), "n_items", "sum_qty")

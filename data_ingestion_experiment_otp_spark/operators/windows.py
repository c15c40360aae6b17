"""Window functions, sorts, top-k, set ops, and time windows
(SURVEY.md §2.6, §2.7 tumbling/sliding/session).

Window specs always carry a total order (timestamp + id tie-break) so
results are deterministic across engines. Time-window queries emit window
starts as epoch seconds (bigint) — identical arithmetic on both sides, no
timestamp-representation hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..plans.registry import register
from ..sources.catalog import load


@register(
    "win_funcs",
    oracle="""
    SELECT o_orderkey, o_custkey,
           row_number() OVER w AS rn,
           rank() OVER w AS rk,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           round(sum(o_totalprice) OVER w2, 2) AS rolling_sum
    FROM orders
    WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
           w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def win_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window-function surface (SURVEY §2.6 win_rank + win_analytic +
    win_frame) in one pass over orders: ranking (row_number/rank — the
    generalized first-matching-part short-circuit, `api/main.py:103-105`),
    analytic lag/lead, and a 3-row sliding-frame rolling sum. Both window
    specs share the o_custkey partition, so Spark evaluates all columns
    with ONE shuffle + sort per spec — the single-form variants
    (win_rank/win_analytic/win_frame) remain registered for pytest parity."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    w2 = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(F.sum("o_totalprice").over(w2), 2).alias("rolling_sum"),
    )


@register(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "topk"),
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global order + top-k (SURVEY §2.6 sort_global + topk; generalizes
    `maxResults=1`, `api/main.py:149`). Spark plans TakeOrderedAndProject:
    per-partition heaps + driver merge, no global sort materialization —
    the shape that keeps top-k viable at 100 TB. The returned top-10 SET is
    fully order-determined, so the hash check verifies the sort cutoff;
    the full-sort plan shape (range-partitioned exchange) is pinned by
    sort_global in tests/test_plans.py."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "set_ops",
    oracle="""
    SELECT 'union' AS op, nationkey FROM
      (SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect' AS op, nationkey FROM
      (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except' AS op, nationkey FROM
      (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
    """,
    tags=("setop",),
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The set-operation family (SURVEY §2.6 set_union + set_intersect /
    set_except) over the customer/supplier nation-key sets, tagged and
    union-all'd. The union branch's `.distinct()` is also the canonical
    `df.distinct()` primitive (§2.5 agg_distinct)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "nationkey")  # noqa: E731
    return (
        tag(c.union(s).distinct(), "union")
        .unionByName(tag(c.intersect(s), "intersect"))
        .unionByName(tag(c.subtract(s), "except"))
    )


@register(
    "win_rank",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    tags=("window",),
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number. Generalizes the reference's
    first-matching-part short-circuit (`api/main.py:103-105` = rank 1 in
    walk order)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_analytic",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per user — the sessionization precursor over the event
    stream."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "win_frame",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS rolling_sum
    FROM orders
    """,
    tags=("window",),
)
def win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding row-frame aggregate: 3-row rolling revenue per customer."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_sum"),
    )


@register(
    "topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "topk"),
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (generalizes `maxResults=1`, `api/main.py:149`). Spark
    plans TakeOrderedAndProject: per-partition heaps + driver merge — no
    global sort, which is what makes top-k viable on 100 TB."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "sort_global",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation
    ORDER BY n_name
    """,
    tags=("sort",),
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total order via range-partitioned sort-shuffle (demonstrated on the
    small dim; the plan shape — rangepartitioning exchange + per-partition
    sort — is the scalable one)."""
    n = load(spark, sf_dir, "nation")
    return n.orderBy("n_name").select("n_nationkey", "n_name", "n_regionkey")


@register(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-distinct of two key sets."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersection of nation-key sets."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference: nations with customers but no suppliers."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# ---------------------------------------------------------------------------
# Time windows (§2.7 [target] rows) — batch expressions of the streaming
# window operators; the identical groupBy(window(...)) runs under readStream
# (see streaming/watermark.py).
# ---------------------------------------------------------------------------


@register(
    "st_event_windows",
    oracle="""
    SELECT 'tumbling' AS op,
           (epoch_us(ts) // 600000000) * 600000000 AS ws_us,
           event_type AS k,
           count(*) AS n,
           round(sum(round(value, 2)), 2) AS measure
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding' AS op,
           ((epoch_us(ts) // 300000000) * 300 - off * 300) * 1000000 AS ws_us,
           '' AS k,
           count(*) AS n,
           round(sum(round(value, 2)), 2) AS measure
    FROM events, (VALUES (0), (1)) AS offs(off)
    GROUP BY 2
    UNION ALL
    SELECT 'session' AS op, ws_us, k, n, measure FROM (
      WITH gaps AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gaps
      )
      SELECT epoch_us(min(ts)) AS ws_us,
             CAST(user_id AS VARCHAR) AS k,
             count(*) AS n,
             round(sum(round(value, 2)), 2) AS measure
      FROM sessions
      GROUP BY user_id, session_id
    )
    """,
    tags=("window", "streaming", "session"),
)
def st_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The event-time window family (SURVEY §2.7 st_tumbling_window +
    st_sliding_window + st_session_window) in one tagged result over the
    event stream — each branch is the genuine Spark operator
    (`window(ts, size[, slide])`, `session_window(ts, gap)`), union-all'd
    with window starts emitted as epoch microseconds:

    - 'tumbling': 10-minute epoch-aligned buckets per event_type;
    - 'sliding': 10-minute windows every 5 minutes (each event in exactly
      two), cent-grid windowed sum (n makes the avg derivable; a
      divide-then-round measure sits exactly on round-6 half boundaries
      for power-of-two counts and flips between engines — found live at
      sf0.1);
    - 'session': 30-minute-gap user sessions — Spark's session_window is
      end-exclusive (an event exactly `gap` after the previous one starts a
      NEW session), so the oracle's gaps-and-islands uses `>=`, with
      (ts, event_id) ordering so equal-timestamp ties assign stably.

    The identical groupBys run under readStream with `withWatermark`
    (streaming/watermark.py); single-form variants stay for pytest parity."""
    ev = load(spark, sf_dir, "events")
    tumbling = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum(F.round("value", 2)), 2).alias("measure"))
        .select(
            F.lit("tumbling").alias("op"),
            F.unix_micros(F.col("w.start")).alias("ws_us"),
            F.col("event_type").alias("k"),
            "n",
            "measure",
        )
    )
    sliding = (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.round("value", 2)), 2).alias("measure"),
        )
        .select(
            F.lit("sliding").alias("op"),
            F.unix_micros(F.col("w.start")).alias("ws_us"),
            F.lit("").alias("k"),
            "n",
            "measure",
        )
    )
    session = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum(F.round("value", 2)), 2).alias("measure"))
        .select(
            F.lit("session").alias("op"),
            F.unix_micros(F.col("w.start")).alias("ws_us"),
            F.col("user_id").cast("string").alias("k"),
            "n",
            "measure",
        )
    )
    return tumbling.unionByName(sliding).unionByName(session)


@register(
    "st_tumbling_window",
    oracle="""
    SELECT epoch_us(ts) // 600000000 * 600 AS window_start_s,
           event_type,
           count(*) AS n,
           round(sum(round(value, 2)), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window", "streaming"),
)
def st_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling window aggregation over event time. Window start is
    emitted as epoch seconds; Spark's `window()` is epoch-aligned, matching
    the oracle's integer bucket arithmetic."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum(F.round("value", 2)), 2).alias("total_value"))
        .select(
            F.unix_seconds(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "st_sliding_window",
    oracle="""
    SELECT (epoch_us(ts) // 300000000) * 300 - off * 300 AS window_start_s,
           count(*) AS n,
           round(sum(round(value, 2)), 2) AS total_value
    FROM events, (VALUES (0), (1)) AS offs(off)
    GROUP BY 1
    """,
    tags=("window", "streaming"),
)
def st_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes: each event lands in exactly
    two windows. The oracle enumerates the two per-row window starts with the
    same epoch-aligned arithmetic Spark's `window(ts, size, slide)` uses."""
    ev = load(spark, sf_dir, "events")
    # measure = cent-grid windowed sum: value is snapped to its 2-decimal
    # grid at the scan so parallel summation order cannot move the rounded
    # aggregate off a grid point (raw double sums landed within 1 ulp of a
    # half-cent at sf0.1 and flipped between engines); the count column
    # makes the average derivable without a divide-then-round, whose
    # quotients sit exactly on round-6 half boundaries for power-of-two
    # window counts.
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.round("value", 2)), 2).alias("total_value"),
        )
        .select(
            F.unix_seconds(F.col("w.start")).alias("window_start_s"),
            "n",
            "total_value",
        )
    )


@register(
    "st_session_window",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("window", "streaming", "session"),
)
def st_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user. Spark's
    native `session_window` (merging state windows); the oracle derives the
    same sessions with the classic gaps-and-islands construction."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


_RESAMPLE_STEP_S = 21600  # 6-hour grid
_RESAMPLE_USERS = 8


@register(
    "ts_resample_ffill",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) // 1000000 AS es, value
      FROM events WHERE user_id < {_RESAMPLE_USERS}
    ),
    obs AS (
      SELECT user_id, (es // {_RESAMPLE_STEP_S}) * {_RESAMPLE_STEP_S} AS bucket_s,
             round(sum(round(value, 2)), 2) / count(*) AS v_avg
      FROM ev GROUP BY user_id, (es // {_RESAMPLE_STEP_S}) * {_RESAMPLE_STEP_S}
    ),
    bounds AS (SELECT user_id, min(bucket_s) AS b0, max(bucket_s) AS b1 FROM obs GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(range(b0, b1 + 1, {_RESAMPLE_STEP_S})) AS bucket_s FROM bounds
    )
    SELECT g.user_id, g.bucket_s,
           last_value(o.v_avg IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket_s
             ROWS UNBOUNDED PRECEDING) AS value_ffill,
           o.v_avg IS NULL AS is_gap
    FROM grid g LEFT JOIN obs o
      ON o.user_id = g.user_id AND o.bucket_s = g.bucket_s
    """,
    tags=("window", "timeseries", "resample"),
)
def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap fill — the hypertable-style rollup: per
    key, bucket observations to a fixed grid (6-hour epochs), materialize
    the COMPLETE grid between each key's first and last bucket
    (`sequence` + explode — generated, not stored), left-join the
    observations, and forward-fill gaps with `last(value, ignorenulls)`
    over the ordered grid. `is_gap` marks interpolated rows.

    Scale shape: one aggregate shuffle on (key, bucket), a per-key bounds
    aggregate (tiny), scan-side grid generation, and one window per key —
    everything partitions by the series key, so a million independent
    series parallelize perfectly; the grid never materializes outside its
    key's partition. The per-bucket average is computed as
    round(sum, 2)/count (the measure's decimal grid), which makes the
    double arithmetic engine-exact; the forward-filled value is emitted
    unrounded because both engines then hold bit-identical doubles."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < _RESAMPLE_USERS)
    bucket = (
        F.floor(F.unix_seconds("ts") / _RESAMPLE_STEP_S) * _RESAMPLE_STEP_S
    ).alias("bucket_s")
    obs = ev.groupBy("user_id", bucket).agg(
        (F.round(F.sum(F.round("value", 2)), 2) / F.count("*")).alias("v_avg")
    )
    bounds = obs.groupBy("user_id").agg(
        F.min("bucket_s").alias("b0"), F.max("bucket_s").alias("b1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("b0", "b1", F.lit(_RESAMPLE_STEP_S))).alias("bucket_s"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("bucket_s")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(obs, ["user_id", "bucket_s"], "left")
        .select(
            "user_id",
            "bucket_s",
            F.last("v_avg", ignorenulls=True).over(w).alias("value_ffill"),
            F.col("v_avg").isNull().alias("is_gap"),
        )
    )


@register(
    "win_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window", "distribution"),
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — quartile assignment (ntile),
    percent_rank and cume_dist per market segment, tie-broken by key for
    determinism. Same single-shuffle shape as any partitioned window: one
    exchange on the partition key, one sort within."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "sort_global_index",
    oracle="""
    SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS global_idx
    FROM documents
    """,
    tags=("sort", "index"),
)
def sort_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dense global ordinal (training-sample ids) WITHOUT a
    single-partition global window. `row_number() OVER (ORDER BY ...)`
    with no PARTITION BY funnels every row through one task — the classic
    100 TB cliff. Instead, the two-phase partition-offset pattern:

    1. range-repartition by the sort key (the same exchange a global sort
       uses — each partition then holds a contiguous, non-overlapping key
       range, so partition order IS key order);
    2. per-partition counts (few-hundred-row aggregate, collected and
       prefix-summed on the driver — bounded by the partition count, not
       the data);
    3. broadcast the offsets back; final index = partition offset +
       (row_number within the partition) — a perfectly parallel window.

    The oracle is the naive global row_number, so the check proves the
    distributed form computes the identical total order.

    The range bins are computed EXPLICITLY from a min/max aggregate rather
    than with `repartitionByRange`: the range partitioner derives its
    boundaries by sampling with a per-RDD seed, so the offsets job and the
    final job can land on DIFFERENT boundaries — the offsets then belong
    to a partitioning that no longer exists and the index silently shifts
    (found live at sf0.1). In production the same rule applies: compute or
    persist the boundaries once, then share them across every job that
    depends on the partitioning."""
    n_bins = 8
    d = load(spark, sf_dir, "documents").select("doc_id")
    bounds = d.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).collect()[0]
    if bounds["lo"] is None:
        return spark.createDataFrame([], "doc_id long, global_idx long")
    lo, span = int(bounds["lo"]), int(bounds["hi"]) - int(bounds["lo"]) + 1
    pid = F.least(
        F.lit(n_bins - 1), ((F.col("doc_id") - lo) * n_bins / span).cast("int")
    ).alias("pid")
    part = d.select("doc_id", pid)
    counts = part.groupBy("pid").agg(F.count("*").alias("n")).orderBy("pid").collect()
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["pid"]] = acc
        acc += r["n"]
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = W.partitionBy("pid").orderBy("doc_id")
    return part.select(
        "doc_id",
        (off[F.col("pid")] + F.row_number().over(w) - 1).alias("global_idx"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (the QUALIFY pattern): row_number per segment,
    filtered to rank <= 3. Spark's WindowGroupLimit optimization pushes
    the limit BELOW the window sort — each task keeps a k-row heap per
    group on the map side, so the shuffle and the final sort see at most
    k rows per (group, input partition) instead of the whole table. That
    rewrite is what makes per-group top-k viable at 100 TB and it is
    pinned in test_plans (a plan without WindowGroupLimit re-sorts every
    group in full)."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


_FUNNEL_WINDOW_US = 7 * 24 * 3_600_000_000  # 7-day conversion window


@register(
    "win_funnel_conversion",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS signup_us
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT p.user_id, p.signup_us,
             min(CASE WHEN epoch_us(e.ts) > p.signup_us
                       AND e.event_type = 'purchase'
                      THEN epoch_us(e.ts) END) AS purchase_us
      FROM per_user p JOIN events e ON e.user_id = p.user_id
      WHERE p.signup_us IS NOT NULL
      GROUP BY p.user_id, p.signup_us
    )
    SELECT user_id, signup_us, purchase_us,
           coalesce(purchase_us - signup_us <= {_FUNNEL_WINDOW_US}, false) AS converted
    FROM conv
    """,
    tags=("window", "funnel"),
)
def win_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over the event stream (the
    MATCH_RECOGNIZE-shaped funnel workload): per user, the FIRST signup
    and the first purchase strictly after it; converted = within the
     7-day window. One shuffle on user_id and two conditional min
    aggregates — the first-A-then-first-B pattern compiles to algebraic
    aggregation, never a self-join of the event stream against itself
    (the naive formulation) and never a per-user sort. At 100 TB the
    per-user aggregate partial-combines map-side like any min; longer
    patterns (A→B→C) chain the same conditional-min trick through one
    extra aggregate per step."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("us"))).alias("signup_us")
    )
    conv = (
        ev.join(per_user.filter(F.col("signup_us").isNotNull()), "user_id")
        .groupBy("user_id", "signup_us")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") > F.col("signup_us")),
                    F.col("us"),
                )
            ).alias("purchase_us")
        )
    )
    return conv.select(
        "user_id",
        "signup_us",
        "purchase_us",
        F.coalesce(
            F.col("purchase_us") - F.col("signup_us") <= _FUNNEL_WINDOW_US,
            F.lit(False),
        ).alias("converted"),
    )


_TRAIL_RANGE_US = 3_600_000_000  # trailing 1-hour value window


@register(
    "win_time_range_frame",
    oracle=f"""
    SELECT event_id, user_id,
           round(sum(round(value, 2)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {_TRAIL_RANGE_US} PRECEDING AND CURRENT ROW
           ), 2) AS trailing_1h_value,
           CAST(count(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {_TRAIL_RANGE_US} PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_1h_events
    FROM events
    """,
    tags=("window", "range-frame"),
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-interval window frame — the time-based complement of
    `win_funcs`' ROWS frame: per user, the trailing one-hour value sum
    and event count at every event. RANGE frames bound by the ORDER
    VALUE, not a row offset, so the frame width adapts to event density
    — the shape behind rate limiting, rolling spend, and burst
    detection. One shuffle on the key, one ordered pass; at equal
    timestamps all peers enter the frame together (RANGE semantics,
    identical in both engines)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_micros("ts").alias("us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_TRAIL_RANGE_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum(F.round("value", 2)).over(w), 2).alias("trailing_1h_value"),
        F.count("*").over(w).alias("trailing_1h_events"),
    )

"""Incremental materialized-view maintenance (engine addition).

The 100 TB pattern for "don't rescan history to refresh an aggregate": the
MV is stored as PARTIAL aggregate states partitioned by (grain, batch) —
each ingestion run aggregates ONLY its own batch and dynamic-partition-
overwrites its own (day, batch) partitions, so a replayed run rewrites
byte-identical partitions instead of double-counting (the same replay
contract as streaming/corpus_index.py, applied to aggregates). Readers do
the cheap final merge over partials; periodic compaction (see
`snk_compacted_parquet`) folds old batches back to one partial per grain.

Contrast with read-merge-write maintenance (read current MV + merge +
overwrite): that needs snapshot isolation (a table format like
Delta/Iceberg) to be safe against concurrent readers and replays, and
Spark cannot overwrite a parquet path it is reading in the same job at
all. Partial-state storage sidesteps both, at the cost of the read-side
merge — which is exactly the trade a log-structured 100 TB system makes.

Works because count/sum are algebraic: partials merge by re-summation.
Non-algebraic measures (distinct counts, percentiles) store mergeable
sketch partials instead (HLL / GK — see agg_approx_distinct,
agg_approx_percentile).

Reference parity: the reference keeps no aggregate state (its only
materialization is the scalar cursor, `api/main.py:258-265`); this is
engine-target surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.catalog import load
from ..sources.files import _scratch

_N_BATCHES = 4


def stage_batches(events: DataFrame, cols: list[str]) -> DataFrame:
    """ONE scan of the source yields the batch-tagged slice set the
    maintenance loop feeds from: the returned frame is persisted
    (memory, spilling to disk), so each refresh filters an in-memory
    slice instead of re-scanning the full table for its share — the same
    pre-sliced contract as :func:`rollup_sink`, where micro-batches
    arrive already cut. Caller must unpersist.

    Batches slice by CALENDAR DAY (dayofmonth mod N), not by row id:
    ingestion batches are time windows, so each maintenance run touches
    its OWN disjoint day set. That is what keeps the per-run dynamic
    partition overwrite cheap — a run commits ~days/N day directories,
    not one per day in the table (row-id slicing made every run touch
    every day: 5x the partition-commit traffic for the same data). In
    production the slices ARE the ingestion batches; this staging exists
    only because the batch demo derives them from one static table."""
    return events.select(
        *cols, F.pmod(F.dayofmonth("ts"), _N_BATCHES).cast("int").alias("batch")
    ).persist()


def refresh_batch(batch: DataFrame, mv_dir: str, batch_id: int) -> None:
    """One incremental maintenance run over ITS OWN pre-sliced batch:
    partial-aggregate the slice and overwrite ONLY this batch's
    (day, batch) partitions. Replay-safe: the slice is deterministic, so
    a re-run writes identical bytes into the same partitions. Dynamic
    partition overwrite is scoped to THIS writer via .option — setting it
    on the shared session conf would silently flip every later
    partitioned mode('overwrite') write from truncate to accumulate."""
    part = (
        batch.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round("value", 2)).alias("sum_value_raw"),
        )
        .withColumn("batch", F.lit(batch_id))
    )
    (
        part.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day", "batch")
        .parquet(mv_dir)
    )


_ROLLUP_SCHEMA = (
    "event_type string, n_events bigint, sum_value_raw double, "
    "day date, batch int"
)


def read_rollup(spark: SparkSession, mv_dir: str) -> DataFrame:
    """Reader-side final merge over the stored partial states. Explicit
    schema: a zero-row maintenance run leaves no footers to infer from."""
    mv = spark.read.schema(_ROLLUP_SCHEMA).parquet(mv_dir)
    return mv.groupBy("day", "event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.round(F.sum("sum_value_raw"), 2).alias("sum_value"),
    )


@register(
    "mv_incremental_rollup",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(round(value, 2)), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("agg", "incremental", "scale"),
)
def mv_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily (day, event_type) rollup of events maintained across four
    incremental runs — batch k owns the days with dayofmonth % 4 == k,
    the time-window slicing real ingestion arrives in — with the LAST
    RUN DELIBERATELY REPLAYED: the oracle (one full recompute in DuckDB)
    matching proves both the partial-state merge and the replay
    absorption, in the same hash check."""
    ev = load(spark, sf_dir, "events")
    # scratch scoped by corpus: dynamic partition overwrite ACCUMULATES
    # day partitions, so two corpora sharing one MV dir would leak each
    # other's days into the read-side merge (bit us in the test suite,
    # where the degenerate-corpus sweep ran before the parity check)
    mv_dir = _scratch(spark, "events_rollup_mv_" + sf_dir.replace("/", "_"))
    sliced = stage_batches(ev, ["ts", "event_type", "value"])  # ONE source scan
    try:
        sliced.count()  # materialize the cache once, before the fan-out
        # the four maintenance runs are INDEPENDENT — disjoint input
        # slices, disjoint output partitions — so submit them as
        # concurrent Spark jobs (each dynamic-overwrite write stages
        # under a job-unique dir, so concurrent commits never collide),
        # exactly as independent ingestion runs land in production
        from concurrent.futures import ThreadPoolExecutor

        def run(k: int) -> None:
            refresh_batch(sliced.filter(F.col("batch") == k).drop("batch"), mv_dir, k)

        with ThreadPoolExecutor(max_workers=_N_BATCHES) as pool:
            list(pool.map(run, range(_N_BATCHES)))
        # replayed epoch: same cached slice, rewrites the same bytes
        run(_N_BATCHES - 1)
    finally:
        sliced.unpersist()
    out = read_rollup(spark, mv_dir)
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n_events",
        "sum_value",
    )


def rollup_sink(mv_dir: str):
    """Streaming form: a foreachBatch sink maintaining the same
    partial-state MV continuously — each epoch partial-aggregates its
    micro-batch and dynamic-overwrites its OWN (day, batch) partitions,
    so Structured Streaming's at-least-once epoch replay rewrites
    identical bytes instead of double-counting (the aggregate analog of
    streaming/corpus_index.py's index write). Readers use
    :func:`read_rollup` concurrently; they never see a torn epoch because
    overwrite commits partition-atomically per batch directory."""

    def write_partials(batch_df: DataFrame, batch_id: int) -> None:
        part = (
            batch_df.groupBy(F.to_date("ts").alias("day"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.round("value", 2)).alias("sum_value_raw"),
            )
            .withColumn("batch", F.lit(batch_id))
        )
        (
            part.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day", "batch")
            .parquet(mv_dir)
        )

    return write_partials


def compact_rollup(spark: SparkSession, mv_dir: str, out_dir: str) -> None:
    """Periodic compaction fold: every batch's partials collapse to ONE
    partial per (day, event_type) grain, written as a NEW generation
    (Spark cannot overwrite a path it is reading; real lakes roll a
    generation and swap a manifest pointer the same way — the file-level
    sibling of this fold is `snk_compacted_parquet`). Only batches older
    than the replay horizon may be folded — a replay of a folded epoch
    would re-add partials the fold already absorbed — which is why this
    is a separate maintenance job and not part of the refresh path.
    Content is untouched by construction: partials merge by the same
    re-summation the reader does, so read_rollup over the compacted
    generation hash-matches the uncompacted one (pinned in pytest)."""
    mv = spark.read.schema(_ROLLUP_SCHEMA).parquet(mv_dir)
    folded = (
        mv.groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_raw").alias("sum_value_raw"),
        )
        .withColumn("batch", F.lit(0))
    )
    (
        folded.write.mode("overwrite")
        .partitionBy("day", "batch")
        .parquet(out_dir)
    )


@register(
    "mv_compacted_rollup",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(round(value, 2)), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("agg", "incremental", "compaction", "scale"),
)
def mv_compacted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compaction protocol end-to-end, oracle-hashed: four
    STREAMING-SHAPED epochs (row-id sliced, so every epoch touches every
    day — the layout rollup_sink accumulates, days×epochs partials)
    land in generation 1; compact_rollup folds them into one partial
    per grain in generation 2; the returned frame reads GENERATION 2.
    Hash-matching the full-recompute oracle proves the fold preserved
    content exactly; the layout collapse itself is pinned in
    tests/test_invariants.py."""
    ev = load(spark, sf_dir, "events")
    tag = sf_dir.replace("/", "_")
    gen1 = _scratch(spark, "events_rollup_gen1_" + tag)
    gen2 = _scratch(spark, "events_rollup_gen2_" + tag)
    sliced = ev.select(
        "ts", "event_type", "value",
        F.pmod(F.col("event_id"), _N_BATCHES).cast("int").alias("batch"),
    ).persist()
    try:
        sliced.count()
        sink = rollup_sink(gen1)
        from concurrent.futures import ThreadPoolExecutor

        def run(k: int) -> None:
            sink(sliced.filter(F.col("batch") == k).drop("batch"), k)

        with ThreadPoolExecutor(max_workers=_N_BATCHES) as pool:
            list(pool.map(run, range(_N_BATCHES)))
    finally:
        sliced.unpersist()
    compact_rollup(spark, gen1, gen2)
    out = read_rollup(spark, gen2)
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n_events",
        "sum_value",
    )


def refresh_distinct_batch(batch: DataFrame, mv_dir: str, batch_id: int) -> None:
    """Non-algebraic measure maintenance: per (day, batch), an HLL SKETCH
    of the batch's user ids (Datasketches `hll_sketch_agg`) instead of a
    scalar — sketches are the mergeable partial state that makes
    count(DISTINCT) incrementally maintainable, which no sum/count
    arithmetic can. Same pre-sliced-input and replay contract as
    :func:`refresh_batch`."""
    part = (
        batch.groupBy(F.to_date("ts").alias("day"))
        .agg(F.expr("hll_sketch_agg(user_id)").alias("user_sketch"))
        .withColumn("batch", F.lit(batch_id))
    )
    (
        part.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day", "batch")
        .parquet(mv_dir)
    )


_HLL_SCHEMA = "user_sketch binary, day date, batch int"


def read_distinct_rollup(spark: SparkSession, mv_dir: str) -> DataFrame:
    """Reader-side merge: union the per-batch sketches per day, estimate.
    Explicit schema for the zero-row-run case, like read_rollup."""
    mv = spark.read.schema(_HLL_SCHEMA).parquet(mv_dir)
    return mv.groupBy("day").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(user_sketch))").alias("n_users")
    )


@register(
    "mv_rollup_distinct_hll",
    oracle=None,  # sketch binaries are engine-private; accuracy + replay invariants in pytest
    tags=("agg", "incremental", "approx", "scale"),
)
def mv_rollup_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct-user rollup maintained incrementally through HLL
    sketch partials — the companion to `mv_incremental_rollup` for the
    measure class (distinct counts) where scalar partials cannot merge.
    Four maintenance runs plus a replayed epoch, then the reader-side
    sketch union; tests/test_invariants.py pins the estimate within 5% of
    the exact per-day distinct count and replay immutability.

    Partition-layout sensitivity (measured, r4): DataSketches HLL
    estimates move ~0.1-1.5% at this cardinality when the input
    partitioning changes (the agg unions per-partition partials whose
    sparse-to-dense promotion points differ by layout) — WITHIN the 5%
    bound, which is the sketch's actual contract and is asserted under
    repartition(7) in TestSketchPartitionStability. Exempted from the
    exact order-independence audit with agg_approx_percentile."""
    ev = load(spark, sf_dir, "events")
    mv_dir = _scratch(spark, "events_distinct_hll_mv_" + sf_dir.replace("/", "_"))
    sliced = stage_batches(ev, ["ts", "user_id"])  # ONE source scan
    try:
        sliced.count()  # materialize the cache once, before the fan-out
        from concurrent.futures import ThreadPoolExecutor

        def run(k: int) -> None:
            refresh_distinct_batch(
                sliced.filter(F.col("batch") == k).drop("batch"), mv_dir, k
            )

        # independent runs, disjoint slices and partitions: concurrent
        # jobs, same as mv_incremental_rollup
        with ThreadPoolExecutor(max_workers=_N_BATCHES) as pool:
            list(pool.map(run, range(_N_BATCHES)))
        run(_N_BATCHES - 1)  # replayed epoch
    finally:
        sliced.unpersist()
    out = read_distinct_rollup(spark, mv_dir)
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "n_users"
    )

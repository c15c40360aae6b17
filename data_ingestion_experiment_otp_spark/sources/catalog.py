"""Parquet fixture catalog (`src_parquet`).

Loads the driver-generated tables at ``/root/testdata/sf*/``. All reads are
plain ``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning, and partition pruning for free; the only special case is
``events.ts``, normalized to a UTC microsecond TIMESTAMP whatever the
physical type a given testdata generation used: parquet TIMESTAMP(NANOS)
(read as long ns via the legacy flag, truncated to us — the truncation
DuckDB applies), naive TIMESTAMP(MICROS) (arrives as TIMESTAMP_NTZ;
reinterpreted as UTC, which is exactly how DuckDB reads it), or an
already-UTC TIMESTAMP (passed through).

Reference parity: the reference has no file sources (it reads the Gmail API,
`main.py:139-177`); this catalog is the engine-target generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import NANOS_AS_LONG

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing types for cross-engine parity."""
    if name == "events":
        # Runtime-settable: works even on a driver-created session that
        # didn't have the flag at build time.
        spark.conf.set(NANOS_AS_LONG, "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) via nanosAsLong: ns -> us truncation matches
            # DuckDB's TIMESTAMP(NANOS) read.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # Naive us timestamps: session tz is pinned to UTC, so the cast
            # reinterprets the wall-clock as UTC instants — identical micros
            # to DuckDB's naive TIMESTAMP read.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register fixture tables as temp views for SQL-form queries."""
    for name in tables:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def load_split(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """`load`, plus input-parallelism repair for expensive scan-side
    derivations (shingling, signature projection): a small or single-
    row-group parquet input yields fewer scan splits than cores, so a
    CPU-heavy derivation chained on the scan runs near-serially. When the
    scan has fewer splits than a quarter of the cluster's parallelism,
    spread it with a round-robin repartition BEFORE the heavy projection —
    the shuffle moves the raw rows once (cheap: the input is small by
    construction in this branch, that's why it had few splits) and every
    core works afterward. At production scale the scan arrives already
    split into hundreds of tasks and this is a no-op."""
    df = load(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if _scan_partitions(spark, sf_dir, name, df) < max(2, target // 4):
        df = df.repartition(target)
    return df


# Scan split counts per (app, parallelism, table path): `df.rdd
# .getNumPartitions()` converts the plan to an RDD driver-side and costs
# ~0.12-0.16 s PER CALL on a fresh DataFrame — paid by nearly every
# builder, every bench rep (r13 opt, guide §1.2 order: per-task work only
# after the algorithm, but this is pure fixed overhead). The count is a
# property of the file layout and the scan conf, both stable within an
# application, so it is memoized. Only the round-robin input-parallelism
# REPAIR decision reads it; results are repartition-invariant (pinned by
# the repartition-invariance tests), so a stale entry could only ever
# change task balance, never bytes.
_SPLIT_COUNTS: dict[tuple[str, str, int], int] = {}


def _scan_partitions(spark: SparkSession, sf_dir: str, name: str, df: DataFrame) -> int:
    key = (
        spark.sparkContext.applicationId,
        f"{sf_dir}/{name}",
        spark.sparkContext.defaultParallelism,
    )
    n = _SPLIT_COUNTS.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        _SPLIT_COUNTS[key] = n
    return n

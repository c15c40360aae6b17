"""Semi-structured file sources and materialization sinks (SURVEY.md §2.1
`src_jsonl`, `src_csv`, `snk_parquet`).

Each query demonstrates a write→read round trip through a spill directory:
the fixture table is materialized in the target format and read back with an
**explicit schema** (the engine never infers schemas — matching the
reference's validate-at-the-edge stance, SURVEY §1.3). The oracle reads the
original table directly, so any loss in the round trip fails the hash
comparison.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..plans.registry import register
from .catalog import load

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)


def _scratch(spark: SparkSession, name: str) -> str:
    # Scoped by applicationId so concurrent runs (driver check + bench) can
    # never interleave writes/reads of each other's round-trip files.
    base = os.path.join(
        tempfile.gettempdir(), "diospark_roundtrip", spark.sparkContext.applicationId
    )
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, name)


@register(
    "src_jsonl_csv",
    oracle="""
    SELECT fmt, doc_id, text, lang, source, n_chars
    FROM documents CROSS JOIN (VALUES ('jsonl'), ('csv')) AS fmts(fmt)
    """,
    tags=("source",),
)
def src_jsonl_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured file ingestion (SURVEY §2.1 `src_jsonl`/`src_csv`):
    the documents table is materialized as BOTH line-delimited JSON and
    quoted CSV, read back with explicit schemas (never inferred — the
    reference's validate-at-the-edge stance, SURVEY §1.3), and the two
    round trips unioned under a format tag. Any loss in either format
    fails the hash against the oracle reading the original table twice."""
    d = load(spark, sf_dir, "documents").select([f.name for f in DOCUMENTS_SCHEMA.fields])
    jpath = _scratch(spark, "documents_jsonl2")
    cpath = _scratch(spark, "documents_csv2")
    d.write.mode("overwrite").json(jpath)
    d.write.mode("overwrite").option("header", "true").csv(cpath)
    j = spark.read.schema(DOCUMENTS_SCHEMA).json(jpath).withColumn("fmt", F.lit("jsonl"))
    c = (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("header", "true")
        .csv(cpath)
        .withColumn("fmt", F.lit("csv"))
    )
    cols = ["fmt", *[f.name for f in DOCUMENTS_SCHEMA.fields]]
    return j.select(cols).unionByName(c.select(cols))


@register(
    "src_jsonl",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
    tags=("source",),
)
def src_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingestion: documents → line-delimited JSON → read back with an
    explicit schema (no inference). Exercises the reference's JSON decode
    path (`api/main.py:243`) as a file source."""
    d = load(spark, sf_dir, "documents").select([f.name for f in DOCUMENTS_SCHEMA.fields])
    path = _scratch(spark, "documents_jsonl")
    d.write.mode("overwrite").json(path)
    return spark.read.schema(DOCUMENTS_SCHEMA).json(path)


@register(
    "src_csv",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
    tags=("source",),
)
def src_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingestion with explicit schema and header. Java's shortest-
    round-trip double formatting makes the write→read identity exact."""
    c = load(spark, sf_dir, "customer").select([f.name for f in CUSTOMER_SCHEMA.fields])
    path = _scratch(spark, "customer_csv")
    c.write.mode("overwrite").option("header", "true").csv(path)
    return spark.read.schema(CUSTOMER_SCHEMA).option("header", "true").csv(path)


@register(
    "src_argv_json",
    oracle="""
    SELECT 'zepto' AS platformSync,
           'user1' AS username,
           'env-key-1' AS api_key,
           'production' AS environment,
           TRUE AS valid
    """,
    tags=("source", "config"),
)
def src_argv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-record source: one JSON record arriving as a process argument
    (reference: the subprocess parses its config from argv[1],
    `api/playwright_login_runner.py:22-26`). Parsed with `from_json` and an
    explicit schema — never inferred — plus the platform-Literal validation
    the reference gets from Pydantic (`api/login_workflow.py:21-26`)."""
    argv_json = '{"platformSync": "zepto", "username": "user1", "api_key": "env-key-1", "environment": "production"}'
    schema = T.StructType(
        [
            T.StructField("platformSync", T.StringType()),
            T.StructField("username", T.StringType()),
            T.StructField("api_key", T.StringType()),
            T.StructField("environment", T.StringType()),
        ]
    )
    return (
        spark.range(1)
        .select(F.from_json(F.lit(argv_json), schema).alias("cfg"))
        .select(
            "cfg.*",
            F.col("cfg.platformSync").isin("zepto", "swiggy", "blinkit").alias("valid"),
        )
    )


@register(
    "snk_state_file",
    oracle="SELECT CAST(max(event_id) AS BIGINT) AS last_id FROM events",
    tags=("sink", "state"),
)
def snk_state_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-cursor state sink (reference: the watermark file
    `last_history_id.txt`, written `api/main.py:289-290`): compute the
    high-water-mark, persist it atomically (tmp + rename, fixing the
    reference's torn-write exposure), and return the READ-BACK value — the
    oracle checks the round trip, not the in-memory aggregate. The
    streaming form (monotone, replay-safe, per-batch) is
    streaming/sinks.py::watermark_file_sink."""
    import json

    cursor = load(spark, sf_dir, "events").agg(F.max("event_id").alias("last_id")).collect()[0]
    path = _scratch(spark, "cursor.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        # empty corpus -> NULL cursor persisted as null, matching the
        # oracle's max() over zero rows
        last = cursor["last_id"]
        json.dump({"last_id": int(last) if last is not None else None}, f)
    os.replace(tmp, path)
    with open(path) as f:
        persisted = json.load(f)
    read_back = persisted["last_id"]
    return spark.createDataFrame(
        [(int(read_back) if read_back is not None else None,)], "last_id long"
    )


@register(
    "snk_jdbc",
    oracle="""
    SELECT n.n_name AS nation,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
    tags=("sink", "jdbc"),
)
def snk_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC sink round trip (SURVEY §2.1 `snk_jdbc` — the reference declares
    a Postgres DSN it never uses, `gmail-otp-listener/api/config.py:28-36`;
    this engine makes the relational publish real): aggregate per-nation
    order totals, write them to an embedded Derby database over Spark's JDBC
    writer, read them back over JDBC, and return the read-back relation —
    the oracle checks the full write→read round trip against the source
    tables.

    Scale notes: a JDBC sink is for serving-sized RESULTS, not raw data —
    the write is coalesced to one partition here (dimension-sized output);
    at larger result sizes set `numPartitions`/`batchsize` on the writer to
    bound connection count and batch inserts. The embedded Derby engine is
    the in-container stand-in for the network Postgres DSN; the writer code
    path (Spark JDBC dialect, type mapping, overwrite semantics) is
    identical."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    agg = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
    url = f"jdbc:derby:{_scratch(spark, 'derby_snk')};create=true"
    jdbc_opts = {"url": url, "driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    (
        agg.coalesce(1)
        .write.format("jdbc")
        .options(dbtable="nation_order_totals", **jdbc_opts)
        .mode("overwrite")
        .save()
    )
    return (
        spark.read.format("jdbc")
        .options(dbtable="nation_order_totals", **jdbc_opts)
        .load()
        .select("nation", "n_orders", F.round("total", 2).alias("total"))
    )


@register(
    "snk_parquet",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS total
    FROM lineitem
    WHERE l_quantity >= 25
    GROUP BY l_returnflag
    """,
    tags=("sink",),
)
def snk_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet materialization sink: filter → write → re-read → aggregate.
    The written dataset is partitioned by the aggregation column, so the
    re-read aggregate benefits from partition pruning — the materialize-
    then-serve pattern of a warehouse sink."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 25)
    path = _scratch(spark, "lineitem_parquet")
    l.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    # explicit schema: a zero-row write leaves no footers to infer from
    back = spark.read.schema(l.schema).parquet(path)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
    )


@register(
    "src_orc",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
    tags=("source",),
)
def src_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC ingestion round trip (columnar alternative to parquet, built into
    Spark): customer → ORC → read back with the explicit schema. Like the
    parquet path, ORC scans support predicate pushdown, column pruning and
    vectorized reads, so every scan-side plan property asserted in
    tests/test_plans.py carries over. Pytest-tier entry (the parquet source
    carries the driver row for columnar scans)."""
    c = load(spark, sf_dir, "customer").select([f.name for f in CUSTOMER_SCHEMA.fields])
    path = _scratch(spark, "customer_orc")
    c.write.mode("overwrite").orc(path)
    return spark.read.schema(CUSTOMER_SCHEMA).orc(path)


@register(
    "snk_compacted_parquet",
    oracle="""
    SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id
    FROM documents GROUP BY source
    """,
    tags=("sink", "compaction"),
)
def snk_compacted_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the maintenance job every 100 TB parquet lake
    needs: a fragmented dataset (here deliberately written as 64 splinter
    files, the streaming-micro-batch failure mode) is rewritten into few
    large files, clustered with `sortWithinPartitions(source, doc_id)` so
    row groups stay contiguous per source and min/max column statistics
    become selective (scan pruning on `source`/`doc_id` hits whole-file
    ranges instead of shotgunned rows). The compacted-side partition count
    comes from `repartition(source)` — at scale you'd target
    file-size-based AQE coalescing (`spark.sql.files.maxRecordsPerFile`)
    instead of a fixed N. The oracle aggregates the ORIGINAL table; the
    query aggregates the READ-BACK compacted copy, so content loss or
    duplication in either rewrite fails the hash gate. The splinter→
    compacted file-count drop is asserted in pytest (test_sinks)."""
    d = load(spark, sf_dir, "documents").select([f.name for f in DOCUMENTS_SCHEMA.fields])
    frag = _scratch(spark, "docs_fragmented")
    compact = _scratch(spark, "docs_compacted")
    d.repartition(64).write.mode("overwrite").parquet(frag)
    (
        spark.read.schema(DOCUMENTS_SCHEMA).parquet(frag)
        .repartition("source")
        .sortWithinPartitions("source", "doc_id")
        .write.mode("overwrite")
        .parquet(compact)
    )
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .parquet(compact)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("min_id"),
            F.max("doc_id").cast("long").alias("max_id"),
        )
    )


@register(
    "src_jsonl_corrupt",
    oracle="""
    WITH lines AS (
      SELECT event_id,
             CASE WHEN event_id % 10 = 3 THEN 'not json at all'
                  WHEN event_id % 10 = 7 THEN '{"event_id": 42, '
                  ELSE NULL END AS broken
      FROM events WHERE event_id < 1000
    )
    SELECT mode,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok
    FROM (
      SELECT 'permissive' AS mode, (broken IS NULL) AS ok FROM lines
      UNION ALL
      SELECT 'dropmalformed', true FROM lines WHERE broken IS NULL
    )
    GROUP BY mode
    """,
    tags=("source", "robustness"),
)
def src_jsonl_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record handling at the ingestion edge: a JSONL file where a
    deterministic subset of lines is broken (unparseable text, or a type
    that violates the declared schema) is read in Spark's two production
    postures — PERMISSIVE (keep every line, quarantine the broken ones in
    `_corrupt_record` for a dead-letter flow) and DROPMALFORMED (admit
    clean rows only). The result is the per-mode admission count: what a
    100 TB crawl pipeline actually monitors. The oracle recomputes which
    lines were broken from the same generation rule — so the parser's
    accept/reject decisions themselves are hash-verified. The reference
    crashes its handler on malformed payloads (`api/main.py:241-249`
    try/except returns 200 OK to stop redelivery — i.e. data loss); this
    is the engine-target upgrade documented in SURVEY §3.1."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < 1000)
        .select("event_id", "value")
    )
    # both corrupt shapes are PARSE failures (freeform text, truncated
    # JSON) — deliberately not type mismatches, whose DROPMALFORMED
    # verdict flips with the json partial-results behavior
    line = F.when(
        F.col("event_id") % 10 == 3, F.lit("not json at all")
    ).when(
        F.col("event_id") % 10 == 7,
        F.lit('{"event_id": 42, '),
    ).otherwise(F.to_json(F.struct("event_id", "value")))
    path = _scratch(spark, "events_jsonl_corrupt")
    ev.select(line.alias("value")).coalesce(4).write.mode("overwrite").text(path)

    schema = "event_id long, value double, _corrupt_record string"
    # cached: Spark refuses plans whose referenced columns are ONLY the
    # corrupt-record column (the documented workaround is to materialize)
    permissive = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    p_counts = permissive.agg(
        F.lit("permissive").alias("mode"),
        F.count("*").alias("n"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), 1).otherwise(0)).alias("n_ok"),
    )
    dropped = (
        spark.read.schema("event_id long, value double")
        .option("mode", "DROPMALFORMED")
        .json(path)
    )
    d_counts = dropped.agg(
        F.lit("dropmalformed").alias("mode"),
        F.count("*").alias("n"),
        F.count("*").alias("n_ok"),
    )
    return p_counts.unionByName(d_counts)


@register(
    "src_parquet_evolved",
    oracle="""
    SELECT doc_id, lang, n_chars,
           CASE WHEN doc_id >= 250 THEN source END AS source,
           (doc_id >= 250) AS has_v2_schema
    FROM documents
    """,
    tags=("source", "schema-evolution"),
)
def src_parquet_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift at the ingestion edge: generation v1 files lack the
    `source` column, generation v2 files carry it. A `mergeSchema` read
    unions the physical schemas — v1 rows surface `source` as NULL, v2
    rows keep theirs, and per-file provenance stays derivable. This is
    the append-only schema-evolution contract a years-long 100 TB corpus
    lives by (columns are only ever ADDED; readers of any vintage see a
    superset schema with NULL backfill). mergeSchema costs a footer read
    per file at planning — fine for a generation boundary, wrong as a
    steady-state default; production pins the merged schema explicitly
    once known, exactly like the explicit-schema reads elsewhere in this
    module. The oracle recomputes the expected NULL backfill from the
    generation rule."""
    d = load(spark, sf_dir, "documents")
    path = _scratch(spark, "documents_evolved")
    v1 = d.filter(F.col("doc_id") < 250).select("doc_id", "lang", "n_chars")
    v2 = d.filter(F.col("doc_id") >= 250).select("doc_id", "lang", "n_chars", "source")
    v1.coalesce(2).write.mode("overwrite").parquet(os.path.join(path, "g=1"))
    v2.coalesce(2).write.mode("overwrite").parquet(os.path.join(path, "g=2"))
    back = spark.read.option("mergeSchema", "true").option(
        "basePath", path
    ).parquet(os.path.join(path, "g=1"), os.path.join(path, "g=2"))
    return back.select(
        "doc_id",
        "lang",
        "n_chars",
        "source",
        F.col("source").isNotNull().alias("has_v2_schema"),
    )


@register(
    "src_xml",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
    tags=("source",),
)
def src_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion round trip over Spark 4's NATIVE xml data source
    (spark-xml graduated into core in 4.0 — no external package):
    customer → one <row> element per record → read back with the explicit
    schema and rowTag. XML is the interchange format enterprise feeds
    still speak; the reader supports schema enforcement and column
    pruning like the other semi-structured sources. Exactness note:
    Java's Double.toString is shortest-round-trip, so the double column
    survives the text hop bit-for-bit — the same contract the JSONL
    round trip relies on. Pytest-tier entry (the parquet source carries
    the driver row for scans)."""
    c = load(spark, sf_dir, "customer").select([f.name for f in CUSTOMER_SCHEMA.fields])
    path = _scratch(spark, "customer_xml")
    c.write.mode("overwrite").format("xml").option("rowTag", "row").save(path)
    return (
        spark.read.schema(CUSTOMER_SCHEMA)
        .format("xml")
        .option("rowTag", "row")
        .load(path)
    )

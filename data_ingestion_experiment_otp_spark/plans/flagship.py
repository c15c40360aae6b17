"""Flagship pipeline: the reference's hot path (`POST /gmail-webhook`,
SURVEY.md §3.1) restated as one declarative Spark plan over the events
fixture.

Stages (reference file:line in parens, paths under
/root/reference/gmail-otp-listener/api/):

1. envelope decode      — base64→utf-8→JSON with explicit schema (main.py:242-246)
2. watermark dedup      — drop ids <= persisted cursor, `<=` not `<` (main.py:269-273)
3. freshness filter     — drop stale events relative to stream head (main.py:94-97)
4. payload extraction   — regex capture of the OTP from the message body
                          (main.py:131-132), null-gated (main.py:302)
5. key derivation       — username = local part; key = platform_username
                          (main.py:303, main.py:182)

Everything is built-in expressions — one scan, no shuffle until the final
projection (the plan is scan → filter → project), which is exactly what you
want at 100 TB: the watermark and freshness predicates push into the
parquet reader, and the extraction chain runs inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.catalog import load
from ..sources.envelope import ENVELOPE_PAYLOAD_SCHEMA

_FRESHNESS = "INTERVAL 7 DAYS"  # widened from the reference's 2 minutes so the
# sf0.001 smoke keeps a meaningful row count; flt_freshness pins the exact
# 2-minute semantics.


_PIPELINE_ORACLE = """
    WITH head AS (SELECT max(ts) AS max_ts, max(event_id) // 4 AS cursor FROM events),
    fresh AS (
      SELECT e.* FROM events e, head
      WHERE e.event_id > head.cursor
        AND e.ts >= head.max_ts - INTERVAL 7 DAY
    ),
    extracted AS (
      SELECT event_id,
             user_id,
             event_type,
             epoch_us(ts) AS ts_us,
             nullif(regexp_extract(
               'Your otp code is ' || lpad(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10000 AS VARCHAR), 4, '0'),
               '(?i)your otp code is (\\d{4})', 1), '') AS otp
      FROM fresh
    )
    SELECT event_id, user_id, ts_us, otp,
           'user' || CAST(user_id AS VARCHAR) AS username,
           event_type || '_user' || CAST(user_id AS VARCHAR) AS signal_key
    FROM extracted
    WHERE otp IS NOT NULL
      AND event_type IN ('signup', 'purchase')
    """


def decode_stage(ev: DataFrame) -> DataFrame:
    """Stage 1 — envelope decode round trip (the reference's main.py:242-246
    chain): the envelope is synthesized as a column and decoded back inline
    — no join, the whole round trip stays in the row's projection. Works
    identically on batch and streaming DataFrames."""
    envelope = F.base64(
        F.encode(
            F.to_json(
                F.struct(
                    F.col("event_id").alias("historyId"),
                    F.concat(F.lit("user"), F.col("user_id"), F.lit("@example.com")).alias(
                        "emailAddress"
                    ),
                )
            ),
            "utf-8",
        )
    )
    return ev.withColumn(
        "payload", F.from_json(F.decode(F.unbase64(envelope), "utf-8"), ENVELOPE_PAYLOAD_SCHEMA)
    ).withColumn("email", F.col("payload.emailAddress"))


def extract_stage(decoded: DataFrame) -> DataFrame:
    """Stages 4+5 — payload extraction, gates, key derivation: the message
    body is synthesized from props.k (the fixture's JSON payload), the OTP
    captured back out with the reference regex (main.py:131-132), null- and
    type-gated (main.py:302), key derived (main.py:303, main.py:182).
    Stream-safe: pure projections and filters."""
    body = F.concat(
        F.lit("Your otp code is "),
        F.lpad((F.get_json_object("props", "$.k").cast("long") % 10000).cast("string"), 4, "0"),
    )
    extracted = decoded.withColumn(
        "otp",
        F.nullif(F.regexp_extract(body, r"(?i)your otp code is (\d{4})", 1), F.lit("")),
    )
    username = F.substring_index("email", "@", 1)
    return (
        extracted.filter(
            F.col("otp").isNotNull() & F.col("event_type").isin("signup", "purchase")
        )
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "otp",
            username.alias("username"),
            F.concat_ws("_", F.col("event_type"), username).alias("signal_key"),
        )
    )


@register(
    "pipeline_otp_ingest",
    oracle=_PIPELINE_ORACLE,
    tags=("pipeline", "flagship"),
)
def pipeline_otp_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ingestion pipeline (see module docstring)."""
    ev = decode_stage(load(spark, sf_dir, "events"))

    # 2+3. watermark cursor & freshness bound, both relative to stream head
    #      (batch forms; the streaming pipeline replaces these with the
    #      checkpoint + withWatermark, streaming/pipeline.py).
    head = ev.agg(
        F.max("ts").alias("max_ts"),
        (F.max("event_id") / 4).cast("long").alias("cursor"),
    )
    fresh = (
        ev.join(F.broadcast(head))
        .filter(
            (F.col("event_id") > F.col("cursor"))
            & (F.col("ts") >= F.col("max_ts") - F.expr(_FRESHNESS))
        )
    )
    return extract_stage(fresh)


@register(
    "snk_http_signal",
    oracle=f"""
    WITH pipeline AS ({_PIPELINE_ORACLE})
    SELECT signal_key,
           'http://localhost:8080/login_workflow/' || signal_key || '/receive_otp' AS endpoint,
           otp
    FROM pipeline
    """,
    tags=("sink", "signal"),
)
def snk_http_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed HTTP push-sink payloads (reference: POST the extracted OTP to
    the keyed workflow endpoint, `api/main.py:180-194`): the pipeline's
    post-filter trickle projected to (key, endpoint, body). The actual POST
    loop — injected client, per-row foreachBatch — is
    streaming/sinks.py::http_signal_sink; this entry verifies the exact
    payloads it would send."""
    out = pipeline_otp_ingest(spark, sf_dir)
    return out.select(
        "signal_key",
        F.concat(
            F.lit("http://localhost:8080/login_workflow/"),
            F.col("signal_key"),
            F.lit("/receive_otp"),
        ).alias("endpoint"),
        "otp",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Driver smoke entry: flagship pipeline at sf0.001."""
    return pipeline_otp_ingest(spark, "/root/testdata/sf0.001")

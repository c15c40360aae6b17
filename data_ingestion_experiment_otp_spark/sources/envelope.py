"""Push-envelope source and semi-structured decode (SURVEY.md §2.1
`src_push_envelope`, §2.2 `prj_envelope_fields`, §2.3 `ext_b64_json`,
`ext_json_scalar`).

The reference consumes Pub/Sub push envelopes whose payload is
base64 → utf-8 → JSON (`api/main.py:39-41`, `main.py:242-246`). Here the
envelope stream is synthesized deterministically from the `events` fixture,
then decoded with the idiomatic Spark chain
`from_json(decode(unbase64(col), 'utf-8'), schema)` — the whole decode is
JVM-side, no Python. Oracles verify the round trip by computing the decoded
fields directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..plans.registry import register
from .catalog import load

ENVELOPE_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("historyId", T.LongType()),
        T.StructField("emailAddress", T.StringType()),
    ]
)


def synthesize_envelopes(events: DataFrame) -> DataFrame:
    """Build the Pub/Sub-shaped envelope column from events: one envelope per
    event, payload = base64(json({historyId, emailAddress}))
    (mirrors `api/main.py:39-41` and the fixture spec in FIXTURES.md §3)."""
    payload = F.to_json(
        F.struct(
            F.col("event_id").alias("historyId"),
            F.concat(F.lit("user"), F.col("user_id"), F.lit("@example.com")).alias("emailAddress"),
        )
    )
    return events.select(
        F.struct(
            F.base64(F.encode(payload, "utf-8")).alias("data"),
            F.col("event_id").cast("string").alias("messageId"),
        ).alias("message"),
        F.lit("projects/demo/subscriptions/events").alias("subscription"),
    )


def decode_envelopes(envelopes: DataFrame) -> DataFrame:
    """The reference's decode chain (`api/main.py:242-246`):
    base64 → utf-8 → JSON with an explicit schema (never inferred)."""
    return envelopes.withColumn(
        "payload",
        F.from_json(F.decode(F.unbase64("message.data"), "utf-8"), ENVELOPE_PAYLOAD_SCHEMA),
    )


@register(
    "src_push_envelope",
    oracle="""
    SELECT event_id AS historyId,
           'user' || user_id || '@example.com' AS emailAddress
    FROM events
    """,
    tags=("source", "streaming"),
)
def src_push_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope encode→decode round trip: synthesize the push envelope,
    decode it with `from_json(decode(unbase64(...)))`, project the payload
    fields (`prj_envelope_fields`, `api/main.py:245-246`). The oracle
    computes the expected decoded fields directly — verifying the full
    encode/decode identity."""
    ev = load(spark, sf_dir, "events")
    decoded = decode_envelopes(synthesize_envelopes(ev))
    return decoded.select(
        F.col("payload.historyId").alias("historyId"),
        F.col("payload.emailAddress").alias("emailAddress"),
    )


@register(
    "ext_b64_json",
    oracle="""
    SELECT event_id AS historyId,
           length('user' || user_id || '@example.com') AS addr_len
    FROM events
    WHERE event_id % 7 = 0
    """,
    tags=("extract", "decode"),
)
def ext_b64_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode chain in isolation (`api/main.py:242-243`):
    `from_json(decode(unbase64(data), 'utf-8'), schema)` — all JVM-side.
    A post-decode predicate proves the decoded struct participates in
    ordinary Catalyst filtering."""
    ev = load(spark, sf_dir, "events")
    decoded = decode_envelopes(synthesize_envelopes(ev))
    return decoded.select(
        F.col("payload.historyId").alias("historyId"),
        F.length("payload.emailAddress").alias("addr_len"),
    ).filter(F.col("historyId") % 7 == 0)


@register(
    "prj_envelope_fields",
    oracle="""
    SELECT event_id AS historyId,
           'user' || user_id || '@example.com' AS emailAddress
    FROM events
    WHERE event_id % 5 = 0
    """,
    tags=("projection",),
)
def prj_envelope_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep only {historyId, emailAddress} from the decoded payload
    (`api/main.py:245-246`) — column pruning drops the rest of the envelope
    before the filter runs."""
    ev = load(spark, sf_dir, "events")
    decoded = decode_envelopes(synthesize_envelopes(ev))
    return decoded.select(
        F.col("payload.historyId").alias("historyId"),
        F.col("payload.emailAddress").alias("emailAddress"),
    ).filter(F.col("historyId") % 5 == 0)


@register(
    "ext_json_scalar",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
    tags=("extract", "json"),
)
def ext_json_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar access on the semi-structured `props` column via
    `get_json_object` — the engine-target generalization of the envelope
    field access (`api/main.py:245-246`)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", k.alias("k_val")).filter(F.col("k_val") >= 50)


@register(
    "ext_variant_json",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
    FROM events
    GROUP BY event_type
    """,
    tags=("extract", "json", "variant"),
)
def ext_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4): `props`
    is parsed once into the binary variant encoding (`parse_json`), then
    fields are read with typed `variant_get` paths. Against stringly JSON
    this is the scale path for repeated access — the open-format binary
    encoding is parsed once per row instead of re-tokenizing the JSON text
    per extraction, and shredded variant columns admit pushdown in newer
    parquet readers. Semantics pinned against the string-path oracle
    (`json_extract_string`), so both access styles must agree exactly.
    Generalizes the envelope field access of `api/main.py:245-246` the
    same way as `ext_json_scalar`, which keeps the string fast path."""
    ev = load(spark, sf_dir, "events")
    # try_parse_json: a malformed props row becomes a NULL variant (and
    # NULL extractions) instead of failing the whole job
    k = F.variant_get(F.try_parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
        )
    )


@register(
    "ext_variant_nested",
    oracle="""
    SELECT event_id,
           event_type AS t,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           round(value * 2, 2) AS v2
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
    tags=("extract", "json", "variant"),
)
def ext_variant_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-path companion to `ext_variant_json`: build a nested JSON
    document per event, `parse_json` it ONCE into variant's typed binary
    encoding, then pull typed paths out with `variant_get` — an object
    path, a top-level scalar, and an array index (`$.meta.vals[1]`).
    However many paths the query reads, the parse happens once per row —
    the re-parse-per-path cost of `get_json_object` is what this kills at
    100 TB. The oracle recomputes every extracted value from the base
    columns, so the whole construct→parse→extract round trip is
    hash-verified."""
    ev = load(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.struct(
                F.col("event_type").alias("type"),
                F.array(F.col("value"), F.col("value") * 2).alias("vals"),
            ).alias("meta"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
    )
    v = ev.withColumn("vdoc", F.parse_json(doc))
    return (
        v.select(
            "event_id",
            F.expr("variant_get(vdoc, '$.meta.type', 'string')").alias("t"),
            F.expr("variant_get(vdoc, '$.k', 'bigint')").alias("k_val"),
            F.expr("round(variant_get(vdoc, '$.meta.vals[1]', 'double'), 2)").alias("v2"),
        )
        .filter(F.col("k_val").isNotNull())
    )

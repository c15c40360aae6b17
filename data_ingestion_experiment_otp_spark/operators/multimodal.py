"""Multimodal column plumbing (SURVEY.md §2.10 `llm_multimodal_cols` — the
decode/feature side).

Design: media is carried as an opaque `binary` column plus a typed metadata
struct; decode / feature-extract / resize run as Arrow-batched
`mapInPandas` stages so each task processes a columnar batch of blobs
without ever materializing them on the driver. The schema, partitioning,
UDF signature and batch shape here are the real 100 TB plumbing; only the
codec itself is stubbed (no image/audio libraries in this container) behind
`_decode_image`, which falls back to a deterministic fake feature vector.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.catalog import load

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, checksum long, feature_mean double"
)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media_type, payload).

    The codec is defined INSIDE the closure so cloudpickle ships it by
    value: the Python workers never need this package importable (no
    --py-files / PYTHONPATH requirement on the cluster).

    NULL payloads are dropped at the scan — a missing blob has nothing to
    decode, and letting it reach the codec crashes the Arrow batch; the
    skip volume is auditable upstream (meta_profile_tables)."""
    media = media.filter(F.col("payload").isNotNull())

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode_image(blob):
            """Stub codec. A real deployment decodes the blob
            (PIL/ffmpeg/etc.) and returns model features; neither library
            ships in this container, so the fallback derives a
            deterministic fake feature from the bytes — keeping the full
            Spark-side pipeline testable end-to-end."""
            try:  # pragma: no cover - exercised only where PIL exists
                import PIL.Image  # noqa: F401

                raise NotImplementedError("real image decode not wired in this environment")
            except ImportError:
                # Deterministic fake: 4 moments of the byte histogram.
                if not blob:
                    return [0.0, 0.0, 0.0, 0.0]
                n = float(len(blob))
                return [float(sum(blob)) / n, float(max(blob)), float(min(blob)), n]

        for pdf in it:
            feats = pdf["payload"].map(decode_image)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "checksum": pdf["payload"].map(lambda b: sum(b) % (1 << 31)).astype("int64"),
                    "feature_mean": feats.map(lambda f: f[0]),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


@register("llm_multimodal_features", oracle=None, tags=("llm", "multimodal", "udf"))
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column media pipeline: documents → opaque binary payload +
    typed metadata → Arrow-batched mapInPandas decode/feature stage (codec
    stubbed, plumbing real). Rows-only check; invariants (checksum
    determinism, n_bytes == octet_length) are pytest-asserted."""
    d = load(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return extract_features(media)


_FRAME_BYTES = 32
_FRAME_STRIDE = 4  # keep every 4th frame


@register(
    "llm_frame_sample",
    oracle=f"""
    WITH media AS (
      SELECT doc_id, hex(encode(text)) AS payload_hex,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT doc_id, i AS frame_idx,
           substring(payload_hex, i * {2 * _FRAME_BYTES} + 1, {2 * _FRAME_BYTES}) AS frame_hex
    FROM media, unnest(range(0, n_bytes // {_FRAME_BYTES}, {_FRAME_STRIDE})) AS t(i)
    """,
    tags=("llm", "multimodal"),
)
def llm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque binary media column — the decode-free
    multimodal op: treat the payload as fixed-size frames (a raw video
    buffer shape), keep every Nth whole frame with its index. Pure
    byte-slicing built-ins (sequence → explode → substring → hex), so
    unlike the codec-gated feature stage this one is exactly
    cross-engine-checkable; the explode rides the scan (no shuffle), and
    frames are emitted as hex so the comparison is representation-stable.
    At scale this is the standard keyframe-ish downsample before an
    expensive decode stage — output volume is input/(frame·stride),
    controlled at the source."""
    d = load(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.hex(F.encode("text", "utf-8")).alias("payload_hex"),
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
    )
    nf = (F.col("n_bytes") / _FRAME_BYTES).cast("long")
    hex_w = 2 * _FRAME_BYTES
    return (
        media.filter(nf > 0)
        .select(
            "doc_id",
            "payload_hex",
            F.explode(F.sequence(F.lit(0), nf - 1, F.lit(_FRAME_STRIDE))).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.expr(f"substring(payload_hex, frame_idx * {hex_w} + 1, {hex_w})").alias(
                "frame_hex"
            ),
        )
    )

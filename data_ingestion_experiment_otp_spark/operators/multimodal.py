"""Multimodal column plumbing (SURVEY.md §2.10 `llm_multimodal_cols` — the
decode/feature side).

Design: media is carried as an opaque `binary` column plus a typed metadata
struct; decode / feature-extract / resize run as Arrow-batched
`mapInPandas` stages so each task processes a columnar batch of blobs
without ever materializing them on the driver. The schema, partitioning,
UDF signature and batch shape here are the real 100 TB plumbing.

The codec (r4): binary PPM (P6) decodes FOR REAL — a pure-numpy parser
(header tokens + `np.frombuffer` + reshape) needing no image library, so
the decode path, not a stub, produces the pixel stats, and those stats are
exactly cross-engine-checkable because the fixture payload generator
derives every pixel from (doc_id, pixel index) arithmetic the DuckDB
oracle replays. Formats the container can't decode (no PIL/ffmpeg ships
here) still fall back to the deterministic byte-histogram fake behind the
same env probe as before — the fallback keeps the full pipeline testable
end-to-end for exotic payloads and is exercised by its own test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.catalog import load

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, checksum long, "
    "px_w int, px_h int, px_sum long, px_n int, feature_mean double"
)

# Fixture PPM geometry/pixels: pure (doc_id, i) arithmetic so the oracle
# can replay the decoded stats without decoding anything.
#   w = 4 + doc_id % 5, h = 3 + doc_id % 4, pixel_i = (doc_id*31 + i*7) % 256
_PPM_MIME = "image/x-portable-pixmap"


def ppm_media(d: DataFrame) -> DataFrame:
    """Deterministic binary P6 payloads for the fixture documents — the
    test-data generator for the real-codec path (an Arrow stage because
    byte-blob assembly is not a JVM-expression job; the BLOB never touches
    the driver)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = []
            ids = pdf["doc_id"].tolist()
            for doc_id in ids:
                w, h = 4 + doc_id % 5, 3 + doc_id % 4
                n = w * h * 3
                header = f"P6\n{w} {h}\n255\n".encode()
                px = ((doc_id * 31 + np.arange(n, dtype=np.int64) * 7) % 256).astype(
                    np.uint8
                )
                payloads.append(header + px.tobytes())
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": _PPM_MIME, "payload": payloads}
            )

    return d.select("doc_id").mapInPandas(
        gen, "doc_id long, media_type string, payload binary"
    )


def extract_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media_type, payload).

    The codec is defined INSIDE the closure so cloudpickle ships it by
    value: the Python workers never need this package importable (no
    --py-files / PYTHONPATH requirement on the cluster; see shipping.py).

    Dispatch is by magic bytes, not metadata: P6 payloads decode with the
    pure-numpy PPM parser (px_* columns populated, feature_mean = mean
    pixel rounded 6 with Decimal HALF_UP — bit-identical to both engines'
    round). Non-P6 payloads are DETERMINISTIC BY DEFAULT: they take the
    byte-histogram fake (px_* NULL) in every environment, so any operator
    whose output is hash-gated stays environment-independent. The real
    PIL decode (same pixel arithmetic as the P6 path) is an explicit
    opt-in — ``real_decode=True`` — because its output depends on whether
    the image library is installed: with it, decodable payloads populate
    px_* for real; undecodable bytes (or a PIL-less environment) still
    fall back to the fake rather than failing the batch. Registered /
    hash-gated operators must keep the default; tested only-if-PIL in
    tests/test_multimodal_pil.py.

    NULL payloads are dropped at the scan — a missing blob has nothing to
    decode, and letting it reach the codec crashes the Arrow batch; the
    skip volume is auditable upstream (meta_profile_tables)."""
    media = media.filter(F.col("payload").isNotNull())

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("0.000001")

        def decode_ppm(blob):
            """Pure-numpy P6 decode: magic, 3 whitespace-separated header
            ints (comments unsupported — fixture payloads carry none),
            one whitespace byte, then w*h*3 raw bytes."""
            idx, tokens = 2, []
            while len(tokens) < 3:
                while blob[idx : idx + 1].isspace():
                    idx += 1
                start = idx
                while not blob[idx : idx + 1].isspace():
                    idx += 1
                tokens.append(int(blob[start:idx]))
            idx += 1  # the single whitespace terminating the maxval token
            w, h, maxval = tokens
            px = np.frombuffer(blob, dtype=np.uint8, offset=idx)
            if maxval != 255 or px.size != w * h * 3:
                raise ValueError(f"malformed P6: {w}x{h} maxval={maxval} got {px.size}")
            px = px.reshape(h, w, 3)  # the decoded image plane
            return w, h, int(px.sum(dtype=np.int64)), int(px.size)

        if real_decode:  # explicit opt-in: env probe once per task
            try:
                from PIL import Image as _pil_image
            except ImportError:  # this container ships no image library
                _pil_image = None
        else:  # default: deterministic in every environment
            _pil_image = None

        def decode_other(blob):
            """Formats beyond P6: with ``real_decode`` opted in and PIL
            present, REAL decode (same pixel arithmetic as the P6 path —
            tested only-if-PIL in tests/test_multimodal_pil.py); in every
            other case the deterministic byte-histogram fake that keeps
            hash-gated outputs environment-independent. Undecodable bytes
            fall back to the fake rather than failing the batch — one bad
            payload on a 100 TB corpus must not kill the stage."""
            if _pil_image is not None and blob:
                import io as _io

                try:
                    with _pil_image.open(_io.BytesIO(blob)) as im:
                        arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
                    s, n = int(arr.sum(dtype=np.int64)), int(arr.size)
                    mean = float(
                        Decimal(s / n).quantize(q6, rounding=ROUND_HALF_UP)
                    )
                    return arr.shape[1], arr.shape[0], s, n, mean
                except Exception:
                    pass
            fake = 0.0 if not blob else float(sum(blob)) / len(blob)
            return None, None, None, None, fake

        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "media_type", "n_bytes", "checksum",
                "px_w", "px_h", "px_sum", "px_n", "feature_mean",
            )}
            for doc_id, mt, blob in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                blob = bytes(blob)
                out["doc_id"].append(doc_id)
                out["media_type"].append(mt)
                out["n_bytes"].append(len(blob))
                out["checksum"].append(sum(blob) % (1 << 31))
                if blob[:2] == b"P6":
                    w, h, s, n = decode_ppm(blob)
                    out["px_w"].append(w)
                    out["px_h"].append(h)
                    out["px_sum"].append(s)
                    out["px_n"].append(n)
                    out["feature_mean"].append(
                        float(Decimal(s / n).quantize(q6, rounding=ROUND_HALF_UP))
                    )
                else:
                    w, h, s, n, mean = decode_other(blob)
                    out["px_w"].append(w)
                    out["px_h"].append(h)
                    out["px_sum"].append(s)
                    out["px_n"].append(n)
                    out["feature_mean"].append(mean)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


@register(
    "llm_multimodal_features",
    oracle=f"""
    WITH geom AS (
      SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
    ), hdr AS (
      SELECT doc_id, w, h, w*h*3 AS n,
             'P6' || chr(10) || w::VARCHAR || ' ' || h::VARCHAR || chr(10)
                  || '255' || chr(10) AS header
      FROM geom
    ), sums AS (
      SELECT doc_id, w, h, n, length(header) AS hl,
             list_sum(list_transform(range(1, length(header)+1),
                      i -> ascii(substring(header, i, 1)))) AS hsum,
             list_sum(list_transform(range(0, n),
                      i -> (doc_id*31 + i*7) % 256)) AS px_sum
      FROM hdr
    )
    SELECT doc_id,
           '{_PPM_MIME}' AS media_type,
           CAST(hl + n AS INT) AS n_bytes,
           CAST((hsum + px_sum) % 2147483648 AS BIGINT) AS checksum,
           CAST(w AS INT) AS px_w,
           CAST(h AS INT) AS px_h,
           CAST(px_sum AS BIGINT) AS px_sum,
           CAST(n AS INT) AS px_n,
           round(px_sum * 1.0 / n, 6) AS feature_mean
    FROM sums
    """,
    tags=("llm", "multimodal", "udf"),
)
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column media pipeline with a REAL decode: documents → opaque
    binary P6 payload + typed metadata → Arrow-batched mapInPandas codec
    (pure-numpy PPM parser) → per-image pixel stats. The oracle replays
    the decoded stats from the same (doc_id, i) arithmetic the fixture
    generator used, so header parsing, byte offsets, reshape, and the
    pixel aggregation are all hash-checked cross-engine — the r3 stub
    (rows-only, env-gated fake) survives only as the fallback for formats
    that genuinely need an image library."""
    d = load(spark, sf_dir, "documents")
    return extract_features(ppm_media(d))


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


# Fixture WAV geometry/samples: pure (doc_id, i) arithmetic, like the PPM
# pixels, so the oracle replays the decoded stats.
#   n_samples = 50 + doc_id % 30, sample_i = (doc_id*37 + i*11) % 4096 - 2048
_WAV_MIME = "audio/x-wav"
_WAV_RATE = 8000

AUDIO_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, sample_rate int, "
    "n_samples int, amp_sum long, amp_peak int, amp_mean double"
)


def wav_media(d: DataFrame) -> DataFrame:
    """Deterministic 16-bit mono PCM WAV payloads for the fixture
    documents — the audio-side test-data generator (real RIFF container:
    44-byte canonical header + little-endian int16 samples)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def wav(doc_id: int) -> bytes:
            n = 50 + doc_id % 30
            s = ((doc_id * 37 + np.arange(n, dtype=np.int64) * 11) % 4096 - 2048).astype(
                "<i2"
            )
            data = s.tobytes()
            hdr = (
                b"RIFF"
                + struct.pack("<I", 36 + len(data))
                + b"WAVE"
                + b"fmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, _WAV_RATE, _WAV_RATE * 2, 2, 16)
                + b"data"
                + struct.pack("<I", len(data))
            )
            return hdr + data

        for pdf in it:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": _WAV_MIME,
                    "payload": [wav(i) for i in ids],
                }
            )

    return d.select("doc_id").mapInPandas(
        gen, "doc_id long, media_type string, payload binary"
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas audio feature extraction: a REAL pure-numpy RIFF/WAV
    parser (chunk walk — not a fixed 44-byte offset assumption — fmt
    validation, little-endian int16 frombuffer) emitting per-clip sample
    stats. Same worker-shipping and NULL-payload contracts as
    extract_features."""
    media = media.filter(F.col("payload").isNotNull())

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("0.000001")

        def decode_wav(blob):
            if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
                raise ValueError("not a RIFF/WAVE payload")
            pos, rate, samples = 12, None, None
            while pos + 8 <= len(blob):
                cid = blob[pos : pos + 4]
                (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
                body = blob[pos + 8 : pos + 8 + size]
                if cid == b"fmt ":
                    fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
                    if (fmt, ch, bits) != (1, 1, 16):
                        raise ValueError(f"unsupported WAV: fmt={fmt} ch={ch} bits={bits}")
                elif cid == b"data":
                    samples = np.frombuffer(body, dtype="<i2")
                pos += 8 + size + (size & 1)  # chunks are word-aligned
            if rate is None or samples is None:
                raise ValueError("missing fmt/data chunk")
            return rate, samples

        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "media_type", "n_bytes", "sample_rate",
                "n_samples", "amp_sum", "amp_peak", "amp_mean",
            )}
            for doc_id, mt, blob in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                blob = bytes(blob)
                rate, s = decode_wav(blob)
                total = int(s.sum(dtype=np.int64))
                out["doc_id"].append(doc_id)
                out["media_type"].append(mt)
                out["n_bytes"].append(len(blob))
                out["sample_rate"].append(rate)
                out["n_samples"].append(int(s.size))
                out["amp_sum"].append(total)
                out["amp_peak"].append(int(np.abs(s.astype(np.int64)).max()) if s.size else 0)
                out["amp_mean"].append(
                    float(Decimal(total / s.size).quantize(q6, rounding=ROUND_HALF_UP))
                    if s.size
                    else 0.0
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=AUDIO_SCHEMA)


@register(
    "llm_audio_features",
    oracle=f"""
    WITH geom AS (
      SELECT doc_id, 50 + doc_id % 30 AS n FROM documents
    ), sums AS (
      SELECT doc_id, n,
             list_sum(list_transform(range(0, n),
                      i -> (doc_id*37 + i*11) % 4096 - 2048)) AS amp_sum,
             list_max(list_transform(range(0, n),
                      i -> abs((doc_id*37 + i*11) % 4096 - 2048))) AS amp_peak
      FROM geom
    )
    SELECT doc_id,
           '{_WAV_MIME}' AS media_type,
           CAST(44 + 2*n AS INT) AS n_bytes,
           {_WAV_RATE} AS sample_rate,
           CAST(n AS INT) AS n_samples,
           CAST(amp_sum AS BIGINT) AS amp_sum,
           CAST(amp_peak AS INT) AS amp_peak,
           round(amp_sum * 1.0 / n, 6) AS amp_mean
    FROM sums
    """,
    tags=("llm", "multimodal", "udf"),
)
def llm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-side multimodal pipeline with a REAL decode: documents →
    binary 16-bit PCM WAV payload → Arrow-batched mapInPandas codec
    (pure-numpy RIFF chunk walk) → per-clip amplitude stats, hash-checked
    against the oracle replaying the generator's (doc_id, i) sample
    arithmetic — the audio twin of llm_multimodal_features' PPM path."""
    d = load(spark, sf_dir, "documents")
    return extract_audio_features(wav_media(d))

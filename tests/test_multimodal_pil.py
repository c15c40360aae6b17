"""PIL-path closure for multimodal decode (r6, VERDICT task 8; r7
ADVICE: determinism gate).

The r5 probe deliberately raised NotImplementedError when PIL was
importable — a landmine for any environment that happens to ship PIL.
r6 wired the real decode behind the probe; r7 gates it behind an
EXPLICIT opt-in (``real_decode=True``) so the default non-P6 path emits
the deterministic byte-histogram fake in every environment — a
hash-gated operator downstream cannot hash differently depending on
whether the image library is installed. Neither path may raise on
arbitrary payload bytes."""

from __future__ import annotations

import pytest

from data_ingestion_experiment_otp_spark.operators.multimodal import (
    extract_features,
)


def _features(spark, rows, real_decode=False):
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    return {
        r["doc_id"]: r.asDict()
        for r in extract_features(media, real_decode=real_decode).collect()
    }


class TestNonP6Fallback:
    def test_arbitrary_bytes_never_raise(self, spark):
        """Whatever the environment, a non-P6 payload must produce a row,
        not an exception — with PIL absent it takes the byte-histogram
        fake (px_* NULL), with PIL present undecodable bytes fall back to
        the same fake."""
        got = _features(
            spark,
            [
                (1, "application/octet-stream", b"\x00\x01\x02not an image"),
                (2, "image/png", b"\x89PNG\r\n\x1a\n truncated garbage"),
            ],
        )
        assert set(got) == {1, 2}
        for r in got.values():
            assert r["feature_mean"] is not None

    def test_empty_payload(self, spark):
        got = _features(spark, [(1, "application/octet-stream", b"")])
        assert got[1]["feature_mean"] == 0.0

    def test_default_path_is_environment_independent(self, spark):
        """Without the real_decode opt-in, a non-P6 payload takes the
        byte-histogram fake EVEN IF the environment ships PIL — the
        determinism contract hash-gated operators rely on."""
        blob = b"\x89PNG\r\n\x1a\nsome payload bytes"
        got = _features(spark, [(3, "image/png", blob)])
        r = got[3]
        assert r["px_w"] is None and r["px_sum"] is None
        assert r["feature_mean"] == pytest.approx(sum(blob) / len(blob))


class TestRealPilDecode:
    def test_png_decodes_to_real_pixel_stats(self, spark):
        """Only-if-PIL: a real PNG must decode to its true geometry and
        pixel sum — the identical arithmetic the P6 path applies."""
        PIL_Image = pytest.importorskip("PIL.Image")
        import io

        import numpy as np

        arr = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(4, 5, 3)
        buf = io.BytesIO()
        PIL_Image.fromarray(arr, "RGB").save(buf, format="PNG")
        got = _features(spark, [(7, "image/png", buf.getvalue())], real_decode=True)
        r = got[7]
        assert (r["px_w"], r["px_h"]) == (5, 4)
        assert r["px_sum"] == int(arr.sum())
        assert r["px_n"] == arr.size
        assert abs(r["feature_mean"] - arr.sum() / arr.size) < 1e-6

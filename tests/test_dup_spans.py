"""Planted-corpus behavioral pins for llm_dup_spans (the suffix-array
dedup family, Lee et al. 2022, as positional K-gram fingerprinting): the
registered query's oracle hash-gates the fixture path; these pin the
semantic corners on corpora with KNOWN duplicated-substring structure.

K = 5 (operators/dedup.py::_SPAN_K): a span must be >= 5 tokens long and
occur >= 2 times corpus-wide to be detected/removed.
"""

from __future__ import annotations

import os

from data_ingestion_experiment_otp_spark.operators.dedup import (
    _SPAN_K,
    llm_dup_spans,
)


def _run(spark, tmp_path, texts):
    """Write a minimal documents fixture and run the registered operator
    on it — the exact fixture-path code, planted corpus."""
    rows = [
        (i, t, "en", "planted", len(t) if t is not None else 0)
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = os.path.join(str(tmp_path), "fixture")
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    out = llm_dup_spans(spark, d)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


SPAN8 = "s1 s2 s3 s4 s5 s6 s7 s8"  # 8 tokens: 4 interior 5-grams


class TestDupSpans:
    def test_cross_doc_span_detected_and_removed(self, spark, tmp_path):
        """An 8-token span shared by two otherwise-unrelated docs covers
        exactly its 8 positions in EACH doc (interior 5-grams all occur
        twice corpus-wide; boundary grams mixing unique context occur
        once) and is cut from both rewritten texts."""
        got = _run(
            spark,
            tmp_path,
            [
                f"a1 a2 {SPAN8} a3 a4 a5",
                f"b1 b2 b3 {SPAN8} b4",
                "c1 c2 c3 c4 c5 c6 c7 c8 c9",
            ],
        )
        assert got[0]["dup_tokens"] == 8 and got[1]["dup_tokens"] == 8
        assert got[0]["kept_text"] == "a1 a2 a3 a4 a5"
        assert got[1]["kept_text"] == "b1 b2 b3 b4"
        assert got[2]["dup_tokens"] == 0
        assert got[2]["kept_text"] == "c1 c2 c3 c4 c5 c6 c7 c8 c9"

    def test_within_doc_repeat_counts(self, spark, tmp_path):
        """A 5-token phrase repeated twice INSIDE one doc is corpus-level
        duplication too (occurrence count, not document frequency): both
        occurrences are covered."""
        phrase = "p1 p2 p3 p4 p5"
        got = _run(spark, tmp_path, [f"{phrase} x1 x2 x3 {phrase}", "y1 y2"])
        assert got[0]["dup_tokens"] == 2 * _SPAN_K
        assert got[0]["kept_text"] == "x1 x2 x3"

    def test_below_k_span_is_under_the_floor(self, spark, tmp_path):
        """A shared run of K-1 tokens forms no complete duplicated K-gram
        (its K-grams each mix unique context), so nothing is flagged —
        the same detection floor the suffix-array method applies."""
        short = "t1 t2 t3 t4"  # K-1 = 4 tokens
        got = _run(spark, tmp_path, [f"a1 {short} a2", f"b1 {short} b2"])
        assert got[0]["dup_tokens"] == 0 and got[1]["dup_tokens"] == 0

    def test_short_doc_and_flag_threshold(self, spark, tmp_path):
        """Docs shorter than K tokens produce no grams (zero coverage,
        text passes through); a fully-duplicated doc pair is flagged,
        a lightly-covered doc is not."""
        long_unique = " ".join(f"u{i}" for i in range(20))
        got = _run(
            spark,
            tmp_path,
            [
                "w1 w2 w3",  # < K tokens
                SPAN8,  # full dup of doc 3
                SPAN8,
                f"{long_unique} {SPAN8}",  # 8/28 covered -> below 0.5
            ],
        )
        assert got[0]["dup_tokens"] == 0
        assert got[0]["kept_text"] == "w1 w2 w3"
        assert got[1]["flag_dup"] and got[2]["flag_dup"]
        assert got[1]["kept_text"] == "" and got[2]["kept_text"] == ""
        assert got[3]["dup_tokens"] == 8 and not got[3]["flag_dup"]
        assert got[3]["kept_text"] == long_unique

    def test_kept_plus_removed_partitions_the_doc(self, spark, tmp_path):
        """Conservation: kept token count + dup_tokens == n_tokens for
        every doc (removal is a partition of positions, never a rewrite
        of surviving tokens)."""
        got = _run(
            spark,
            tmp_path,
            [f"a1 a2 {SPAN8} a3", f"{SPAN8} b1 b2 b3", "z1 z2 z3 z4 z5 z6"],
        )
        for r in got.values():
            kept_n = len([w for w in r["kept_text"].split(" ") if w])
            assert kept_n + r["dup_tokens"] == r["n_tokens"]


class TestIncrementalDupSpans:
    def test_batch_screened_against_corpus_index(self, spark, tmp_path):
        """A batch doc (id%10>=8) sharing a span with a CORPUS doc
        (id%10<8) has the span covered even though it occurs only once in
        the batch — the corpus gram-count index supplies the other
        occurrence. Corpus docs never appear in the output, and a batch
        doc with a unique span passes through untouched."""
        from data_ingestion_experiment_otp_spark.operators.dedup import (
            llm_incremental_dup_spans,
        )

        texts = {
            2: f"c1 c2 {SPAN8} c3",  # corpus: carries the boilerplate
            4: "d1 d2 d3 d4 d5 d6",  # corpus: unrelated
            8: f"b1 {SPAN8} b2 b3",  # batch: span known to the corpus
            9: "u1 u2 u3 u4 u5 u6 u7",  # batch: unique
        }
        rows = [
            (i, t, "en", "planted", len(t)) for i, t in sorted(texts.items())
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        import os

        d = os.path.join(str(tmp_path), "fixture")
        df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["doc_id"]: r.asDict()
            for r in llm_incremental_dup_spans(spark, d).collect()
        }
        assert set(got) == {8, 9}  # batch rows only
        assert got[8]["dup_tokens"] == 8
        assert got[8]["kept_text"] == "b1 b2 b3"
        assert got[9]["dup_tokens"] == 0
        assert got[9]["kept_text"] == "u1 u2 u3 u4 u5 u6 u7"


class TestCharDupSpans:
    def test_cjk_span_invisible_to_word_form_caught_by_char_form(
        self, spark, tmp_path
    ):
        """Unsegmented scripts: a repeated 14-char CJK passage has NO
        word-level 5-grams (the whole doc is one whitespace token), so
        llm_dup_spans sees nothing — llm_char_dup_spans covers exactly
        the shared run in both docs."""
        from data_ingestion_experiment_otp_spark.operators.dedup import (
            _CSPAN_K,
            llm_char_dup_spans,
        )

        shared = "深層学習の訓練データ重複除去処理"  # 16 chars
        texts = [
            f"甲乙丙丁{shared}戊己庚辛",
            f"壬癸子丑寅{shared}卯辰",
            "独自内容文書異質投稿本文記事壱弐参肆伍陸漆捌玖拾",
        ]
        rows = [(i, t, "ja", "planted", len(t)) for i, t in enumerate(texts)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        import os

        d = os.path.join(str(tmp_path), "fixture")
        df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

        word = {r["doc_id"]: r["dup_tokens"] for r in llm_dup_spans(spark, d).collect()}
        assert word == {0: 0, 1: 0, 2: 0}  # blind: no whitespace tokens

        got = {r["doc_id"]: r.asDict() for r in llm_char_dup_spans(spark, d).collect()}
        assert got[0]["dup_chars"] == len(shared) >= _CSPAN_K
        assert got[1]["dup_chars"] == len(shared)
        assert got[0]["kept_text"] == "甲乙丙丁戊己庚辛"
        assert got[1]["kept_text"] == "壬癸子丑寅卯辰"
        assert got[2]["dup_chars"] == 0

    def test_mid_word_span_boundaries(self, spark, tmp_path):
        """Char spans ignore word boundaries: the duplicated run may cut
        mid-word, and kept chars splice back in order (conservation:
        kept length + dup_chars == n_chars)."""
        from data_ingestion_experiment_otp_spark.operators.dedup import (
            llm_char_dup_spans,
        )

        shared = "abcdefghijkl"  # exactly K chars
        texts = [f"xx{shared}yy", f"qq{shared}rr", "entirely fresh text"]
        rows = [(i, t, "en", "planted", len(t)) for i, t in enumerate(texts)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        import os

        d = os.path.join(str(tmp_path), "fixture")
        df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        got = {r["doc_id"]: r.asDict() for r in llm_char_dup_spans(spark, d).collect()}
        assert got[0]["dup_chars"] == 12 and got[0]["kept_text"] == "xxyy"
        assert got[1]["dup_chars"] == 12 and got[1]["kept_text"] == "qqrr"
        for r in got.values():
            assert len(r["kept_text"]) + r["dup_chars"] == r["n_chars"]

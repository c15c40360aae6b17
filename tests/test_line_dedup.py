"""Planted-corpus behavioral pins for llm_line_dedup (r6, VERDICT task 5):
the registered query's oracle hash-gates the fixture path; these pin the
semantic corners on documents with KNOWN repeated-paragraph structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_experiment_otp_spark.operators.dedup import llm_line_dedup
from data_ingestion_experiment_otp_spark.plans.registry import all_queries


def _dedup_lines(spark, rows):
    """Run the operator's core (first-occurrence line filter) on raw
    pre-lined texts, bypassing the registered query's line-planting
    preamble."""
    df = spark.createDataFrame(rows, "doc_id int, text string")
    base = df.select("doc_id", F.split("text", "\n").alias("lines"))
    kept = F.filter(
        "lines",
        lambda x, i: F.array_position(F.slice("lines", F.lit(1), i), x) == 0,
    )
    out = base.select("doc_id", F.array_join(kept, "\n").alias("t"))
    return {r["doc_id"]: r["t"] for r in out.collect()}


class TestLineDedup:
    def test_repeated_paragraph_removed_first_kept_order_preserved(self, spark):
        got = _dedup_lines(
            spark,
            [
                (1, "intro\nbody one\nintro\nbody two\nbody one\noutro"),
                (2, "a\na\na\na"),
                (3, "unique one\nunique two"),
            ],
        )
        assert got[1] == "intro\nbody one\nbody two\noutro"
        assert got[2] == "a"
        assert got[3] == "unique one\nunique two"

    def test_intra_document_only(self, spark):
        """Two documents sharing a line each keep their own copy — line
        dedup is within-doc repair, not cross-corpus dedup (that is
        llm_exact_dedup's job)."""
        got = _dedup_lines(
            spark,
            [(1, "shared line\nown one"), (2, "shared line\nown two")],
        )
        assert got[1] == "shared line\nown one"
        assert got[2] == "shared line\nown two"

    def test_empty_and_blank_lines(self, spark):
        """Blank lines dedup like any other line (CCNet behavior: the
        first paragraph break survives, runs of breaks collapse)."""
        got = _dedup_lines(spark, [(1, "a\n\nb\n\nc"), (2, "")])
        assert got[1] == "a\n\nb\nc"
        assert got[2] == ""

    def test_registered_query_plants_and_removes(self, spark, sf_dir):
        """On the fixture path the planted duplicate full-text line must
        always be removed: n_kept < n_lines for every non-null doc, and
        the deduped text always STARTS with the original text."""
        out = llm_line_dedup(spark, sf_dir).filter(F.col("n_lines").isNotNull())
        bad = out.filter(~(F.col("n_kept") < F.col("n_lines"))).count()
        assert bad == 0
        assert out.count() > 0

    def test_zero_exchange_plan(self, spark, sf_dir):
        """The operator must be a pure scan+project map — no shuffle: a
        document's lines live in its own row, so first-occurrence
        filtering never needs a (doc_id, line) Exchange."""
        import contextlib
        import io

        df = all_queries()["llm_line_dedup"].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "Exchange" not in buf.getvalue()


class TestBigramPerplexity:
    def test_order_sensitivity(self, spark, tmp_path):
        """The property the unigram scorer cannot see: two docs with the
        IDENTICAL bag of words but different order score differently, and
        the doc following the corpus's dominant word ORDER scores lower
        (more probable sequences -> fewer bits)."""
        from data_ingestion_experiment_otp_spark.operators.text_analysis import (
            llm_bigram_perplexity,
            llm_unigram_perplexity,
        )

        # Corpus dominated by the pattern "x y x y ..."; doc 90 follows
        # it, doc 91 is the same bag in scrambled order.
        rows = [(i, "x y x y x y x y", "en", "s", 15) for i in range(80)]
        rows += [(90, "x y x y x y", "en", "s", 11), (91, "x x x y y y", "en", "s", 11)]
        out = tmp_path / "docs"
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(str(out / "documents.parquet"))

        bi = {r["doc_id"]: r["avg_bits"] for r in llm_bigram_perplexity(spark, str(out)).collect()}
        un = {r["doc_id"]: r["avg_bits"] for r in llm_unigram_perplexity(spark, str(out)).collect()}
        assert un[90] == un[91], "unigram must be order-blind on equal bags"
        assert bi[90] < bi[91], f"bigram must reward the dominant order: {bi}"


class TestGopherRules:
    def test_each_rule_fires_on_its_planted_violation(self, spark, tmp_path):
        """One planted doc per rule, violating exactly that rule, plus a
        clean doc passing all of them."""
        from data_ingestion_experiment_otp_spark.operators.text_analysis import (
            llm_gopher_rules,
        )

        good_words = (
            "the quick brown fox jumps over lazy dogs and cats that have fun "
            "with many other animal friends being happy today under sunny sky "
            "while some more words keep arriving here to reach fifty total "
            "count for this document easily done now surely indeed friends "
            "adding several extra filler words pushes beyond fifty words"
        )
        rows = [
            (1, good_words, "en", "s", len(good_words)),                    # keeps
            (2, "too few words here", "en", "s", 18),                        # n_words < 50
            (3, " ".join(["a"] * 60) + " the to", "en", "s", 120),           # mwl < 3
            (4, " ".join(["#" * 5] * 60) + " the to", "en", "s", 300),       # symbol ratio + alpha
            (5, " ".join(["w" + "…" for _ in range(60)]) + " the to", "en", "s", 200),  # symbols
            (6, " ".join(["123456"] * 60) + " the to", "en", "s", 400),      # alpha_frac < 0.8
            (7, good_words.replace("the ", "zzz ").replace("and ", "yyy ").replace("have ", "xxx ").replace("to ", "qqq ").replace("that ", "ppp ").replace("with ", "mmm "), "en", "s", 100),  # stop_hits < 2
        ]
        out = tmp_path / "docs"
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(str(out / "documents.parquet"))
        got = {r["doc_id"]: r for r in llm_gopher_rules(spark, str(out)).collect()}
        assert got[1]["keep"] is True, got[1]
        for bad in (2, 3, 4, 5, 6, 7):
            assert got[bad]["keep"] is False, (bad, got[bad])
        assert got[2]["n_words"] < 50
        assert got[3]["mean_word_len"] < 3.0
        assert got[6]["alpha_frac"] < 0.8
        assert got[7]["stop_hits"] < 2

    def test_multiline_bullet_and_ellipsis_fracs(self, spark, tmp_path):
        from data_ingestion_experiment_otp_spark.operators.text_analysis import (
            llm_gopher_rules,
        )

        text = "- item one\n- item two\nplain line...\nanother plain"
        rows = [(1, text, "en", "s", len(text))]
        out = tmp_path / "docs"
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(str(out / "documents.parquet"))
        r = llm_gopher_rules(spark, str(out)).collect()[0]
        assert r["bullet_frac"] == 0.5      # 2 of 4 lines
        assert r["ellipsis_frac"] == 0.25   # 1 of 4 lines
        # r7: words split on ANY whitespace run — newline-adjacent words
        # ("one\n-") must count as separate words, not fuse into one
        assert r["n_words"] == 10
        assert r["mean_word_len"] == 4.0  # 40 chars over 10 true words

    def test_newline_words_do_not_fuse(self, spark, tmp_path):
        """The published whitespace tokenization: 60 3-char words joined
        by newlines must read mwl=3.0, not one 239-char pseudo-word."""
        from data_ingestion_experiment_otp_spark.operators.text_analysis import (
            llm_gopher_rules,
        )

        text = "\n".join(["the"] * 30 + ["and"] * 30)
        rows = [(1, text, "en", "s", len(text))]
        out = tmp_path / "docs2"
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(str(out / "documents.parquet"))
        r = llm_gopher_rules(spark, str(out)).collect()[0]
        assert r["n_words"] == 60
        assert r["mean_word_len"] == 3.0
        assert r["stop_hits"] == 2  # 'the' and 'and' both present

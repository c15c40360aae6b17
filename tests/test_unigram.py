"""Unigram-LM tokenizer tier (r8): train / encode / compare, pinned by an
INDEPENDENT Python reference (the non-SQL-expressible analogue of the BPE
tier's 3-way gate — EM training is iterative, so there is no DuckDB
oracle; the reference here is a from-scratch implementation of the
documented spec using exact Fraction arithmetic where the operator uses
integer cross-multiplication, so agreement pins the SEMANTICS, not the
code path).

Also: planted-corpus splitting/tie-break/char-floor semantics, fixture
invariants (vocab closure, concat-lossless segmentation, conservation),
artifact round-trip, reconciliation of the compare audit against the two
singles, the repartition canary, and the encode plan pin (one corpus
FileScan; word side from the persisted artifact).
"""

from __future__ import annotations

import collections
import os
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from data_ingestion_experiment_otp_spark.operators.unigram import (
    _UNI_MAX_LEN,
    _UNI_ROUNDS,
    _UNI_SEED_CAP,
    _UNI_TARGET_MULTI,
    unigram_em_loop,
    unigram_segment_word,
)
from data_ingestion_experiment_otp_spark.plans.registry import all_queries

SPECS = all_queries()


# --- independent reference ---------------------------------------------------


def ref_viterbi(w, probs, max_len):
    """Fraction-exact maximum-likelihood segmentation; ties to fewer
    pieces, then lexicographically smaller piece tuple. Independent of the
    operator's integer cross-multiplication form."""
    n = len(w)
    best = {0: (Fraction(1), 0, ())}
    for i in range(1, n + 1):
        cands = []
        for j in range(max(0, i - max_len), i):
            if j not in best:
                continue
            p = w[j:i]
            if p in probs:
                prev = best[j]
                cands.append((prev[0] * probs[p], prev[1] + 1, prev[2] + (p,)))
        if cands:
            best[i] = max(cands, key=lambda c: (c[0], -c[1], _NegLex(c[2])))
    return list(best[n][2]) if n in best else None


class _NegLex:
    """max() helper: prefers the lexicographically SMALLER tuple."""

    def __init__(self, t):
        self.t = t

    def __lt__(self, other):  # self < other iff self.t > other.t
        return self.t > other.t

    def __eq__(self, other):
        return self.t == other.t


def ref_train(texts, target_multi=_UNI_TARGET_MULTI, n_rounds=_UNI_ROUNDS,
              max_len=_UNI_MAX_LEN, seed_cap=_UNI_SEED_CAP):
    """Independent EM trainer over raw texts, per the documented spec:
    substring seeds ranked by count*len (cap seed_cap), every char kept
    with floor count 1, hard-EM rounds keeping the top target_multi
    multi-char pieces (count desc, piece asc)."""
    wc = collections.Counter()
    for t in texts:
        for w in (t or "").split(" "):
            if w:
                wc[w] += 1
    word_table = sorted(wc.items())
    sub = collections.Counter()
    chars = collections.Counter()
    for w, n in word_table:
        for i in range(len(w)):
            chars[w[i]] += n
            for j in range(i + 2, min(i + max_len, len(w)) + 1):
                sub[w[i:j]] += n
    seeds = sorted(sub, key=lambda p: (-sub[p] * len(p), p))[:seed_cap]
    vocab = {p: sub[p] for p in seeds}
    for ch, c in chars.items():
        vocab[ch] = max(c, 1)
    for _ in range(n_rounds):
        total = sum(vocab.values())
        probs = {p: Fraction(c, total) for p, c in vocab.items()}
        newc = collections.Counter()
        for w, n in word_table:
            for p in ref_viterbi(w, probs, max_len):
                newc[p] += n
        keep = sorted((p for p in newc if len(p) > 1),
                      key=lambda p: (-newc[p], p))[:target_multi]
        vocab = {p: newc[p] for p in keep}
        for ch in chars:
            vocab[ch] = max(newc.get(ch, 0), 1)
    return dict(vocab), dict(wc)


def ref_doc_stats(texts_by_doc, vocab, max_len=_UNI_MAX_LEN):
    """Per-doc (n_words, n_tokens, tok_checksum) under the final vocab,
    tok_id = 1-based rank of piece in sorted(vocab)."""
    tok_id = {p: i + 1 for i, p in enumerate(sorted(vocab))}
    total = sum(vocab.values())
    probs = {p: Fraction(c, total) for p, c in vocab.items()}
    seg_cache = {}
    out = {}
    for doc_id, t in texts_by_doc.items():
        nw = nt = cs = 0
        for w in (t or "").split(" "):
            if not w:
                continue
            if w not in seg_cache:
                seg_cache[w] = ref_viterbi(w, probs, max_len)
            seg = seg_cache[w]
            nw += 1
            nt += len(seg)
            cs += sum(tok_id[p] * (k + 1) for k, p in enumerate(seg))
        if nw:
            out[doc_id] = (nw, nt, cs)
    return out


# --- planted-corpus semantics ------------------------------------------------


class TestPlantedSemantics:
    def _run(self, spark, tmp_path, rows):
        sf = str(tmp_path / "sf")
        os.makedirs(sf, exist_ok=True)
        spark.createDataFrame(
            [(i, "s", "en", len(t), t) for i, t in rows],
            "doc_id long, source string, lang string, n_chars long, text string",
        ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
        vocab = {
            r["piece"]: (r["tok_id"], r["n_count"])
            for r in SPECS["llm_unigram_train"].fn(spark, sf).collect()
        }
        enc = {
            r["doc_id"]: (r["n_words"], r["n_tokens"], r["tok_checksum"])
            for r in SPECS["llm_unigram_encode"].fn(spark, sf).collect()
        }
        return vocab, enc

    def test_long_compound_splits_and_matches_reference(self, spark, tmp_path):
        """A word longer than the piece cap MUST split; the learned pieces
        and the per-doc stats equal the independent reference exactly."""
        texts = ["foo bar " * 10 + "foobarfoobarfoo", "foo bar baz " * 5]
        rows = list(enumerate(texts))
        vocab, enc = self._run(spark, tmp_path, rows)
        ref_vocab, _ = ref_train(texts)
        assert {p: c for p, (_i, c) in vocab.items()} == ref_vocab
        ref_stats = ref_doc_stats(dict(rows), ref_vocab)
        assert enc == ref_stats
        # the 15-char compound cannot be one piece (cap 8)
        total = sum(c for c in ref_vocab.values())
        probs = {p: Fraction(c, total) for p, c in ref_vocab.items()}
        seg = ref_viterbi("foobarfoobarfoo", probs, _UNI_MAX_LEN)
        assert len(seg) >= 2 and "".join(seg) == "foobarfoobarfoo"

    def test_char_floor_keeps_rare_word_segmentable(self, spark, tmp_path):
        """A word whose characters never make any multi-char piece still
        segments (every char floors at count 1)."""
        texts = ["common common common", "xyzzy"]
        rows = list(enumerate(texts))
        vocab, enc = self._run(spark, tmp_path, rows)
        assert enc[1][0] == 1 and enc[1][1] >= 1
        for ch in "xyz":
            assert ch in vocab

    def test_newline_and_astral_chars_outside_top_v_stay_segmentable(
        self, spark, tmp_path
    ):
        """ADVICE r8: the distinct-char aggregate must see line
        terminators (Java `.` excludes them without (?s)) and non-BMP
        characters in words BEYOND the top-V table — otherwise the
        char-coverage floor misses them and the word silently segments
        to empty, breaking the every-word-segmentable guarantee."""
        from data_ingestion_experiment_otp_spark.operators.unigram import _train

        sf = str(tmp_path / "sf")
        os.makedirs(sf, exist_ok=True)
        # words split on ' ' only, so "a\nb" is one word; top_v=2 keeps
        # only the two common words — the probe words ride in solely via
        # the distinct-char aggregate
        texts = ["common words common words common words", "a\nb x\U0001F600y"]
        spark.createDataFrame(
            [(i, "s", "en", len(t), t) for i, t in enumerate(texts)],
            "doc_id long, source string, lang string, n_chars long, text string",
        ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
        seg_df, vocab = _train(spark, sf, top_v=2)
        assert "\n" in vocab and "\U0001F600" in vocab
        segs = {r["w"]: r["seg"] for r in seg_df.collect()}
        for w in ("a\nb", "x\U0001F600y"):
            pieces = [p for p in segs[w].split("\x1f") if p]
            assert pieces and "".join(pieces) == w

    def test_exact_integer_vs_fraction_viterbi_agree(self):
        """The operator's cross-multiplied integer Viterbi and the
        reference's Fraction Viterbi are the same function — swept over
        every (word, vocab) pair of a randomized-but-deterministic grid,
        including tie geometries (equal-count pieces)."""
        words = ["aaaa", "abab", "aabb", "abcabc", "xxxyyy", "aaaaaaaaab"]
        vocabs = [
            {"a": 2, "b": 2, "aa": 2, "ab": 2, "c": 1},
            {"a": 1, "b": 1, "c": 1, "aaa": 3, "abc": 3, "bca": 3},
            {"a": 5, "b": 5, "x": 2, "y": 2, "xx": 2, "yy": 2, "xy": 2},
        ]
        for vocab in vocabs:
            total = sum(vocab.values())
            probs = {p: Fraction(c, total) for p, c in vocab.items()}
            for w in words:
                got = unigram_segment_word(w, vocab, total)
                want = ref_viterbi(w, probs, _UNI_MAX_LEN)
                assert got == want, (w, vocab, got, want)


# --- fixture gates -----------------------------------------------------------


class TestFixtureGates:
    def test_vocab_and_encode_match_reference(self, spark, sf_dir):
        """Full-fixture exact agreement with the independent reference:
        the learned vocabulary (pieces AND counts) and every per-doc
        encode row."""
        texts = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            ).collect()
        }
        ref_vocab, _ = ref_train(texts.values())
        vocab = {
            r["piece"]: r["n_count"]
            for r in SPECS["llm_unigram_train"].fn(spark, sf_dir).collect()
        }
        assert vocab == ref_vocab
        enc = {
            r["doc_id"]: (r["n_words"], r["n_tokens"], r["tok_checksum"])
            for r in SPECS["llm_unigram_encode"].fn(spark, sf_dir).collect()
        }
        assert enc == ref_doc_stats(texts, ref_vocab)

    def test_segmentation_closure_and_losslessness(self, spark, sf_dir):
        """Every emitted piece is in the vocabulary, and the pieces of
        every word concatenate back to the word byte-for-byte."""
        from data_ingestion_experiment_otp_spark.operators.unigram import (
            _artifact_frames,
        )

        wordsyms, vocab = _artifact_frames(spark, sf_dir)
        bad = (
            wordsyms.select(F.explode("syms").alias("piece"))
            .join(vocab, "piece", "left_anti")
            .count()
        )
        assert bad == 0
        broken = wordsyms.filter(
            F.concat_ws("", F.col("syms")) != F.col("w")
        ).count()
        assert broken == 0

    def test_compare_reconciles_with_singles(self, spark, sf_dir):
        cmp_rows = {
            r["lang"]: (r["n_docs"], r["n_words"], r["bpe_tokens"], r["uni_tokens"])
            for r in SPECS["llm_tokenizer_compare"].fn(spark, sf_dir).collect()
        }
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id", "lang"
        )
        uni = SPECS["llm_unigram_encode"].fn(spark, sf_dir)
        agg = {
            r["lang"]: (r["d"], r["w"], r["t"])
            for r in uni.join(docs, "doc_id")
            .groupBy("lang")
            .agg(
                F.count("*").alias("d"),
                F.sum("n_words").alias("w"),
                F.sum("n_tokens").alias("t"),
            )
            .collect()
        }
        for lang, (d, w, _b, t) in cmp_rows.items():
            assert agg[lang] == (d, w, t)

    def test_repartition_canary(self, spark, sf_dir, tmp_path):
        """Partition order must not change anything: re-materializing the
        corpus under repartition(7) yields identical vocab and encode
        rows (training collects an ordered word table; the artifact key
        sees a different corpus file, so this exercises a fresh train)."""
        sf2 = str(tmp_path / "sf7")
        os.makedirs(sf2, exist_ok=True)
        (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .repartition(7)
            .write.mode("overwrite")
            .parquet(os.path.join(sf2, "documents.parquet"))
        )
        a = sorted(
            map(tuple, SPECS["llm_unigram_train"].fn(spark, sf_dir).collect())
        )
        b = sorted(
            map(tuple, SPECS["llm_unigram_train"].fn(spark, sf2).collect())
        )
        assert a == b
        ea = sorted(
            map(tuple, SPECS["llm_unigram_encode"].fn(spark, sf_dir).collect())
        )
        eb = sorted(
            map(tuple, SPECS["llm_unigram_encode"].fn(spark, sf2).collect())
        )
        assert ea == eb

    def test_artifact_round_trip(self, spark, sf_dir):
        """Second call serves the committed store (no retrain): same
        directory, identical frames, marker present."""
        from data_ingestion_experiment_otp_spark.operators.unigram import (
            _unigram_artifact,
        )

        d1 = _unigram_artifact(spark, sf_dir)
        d2 = _unigram_artifact(spark, sf_dir)
        assert d1 == d2
        assert os.path.isfile(os.path.join(d1, "_COMMITTED"))

    def test_encode_single_corpus_scan(self, spark, sf_dir):
        """The executed encode plan reads the corpus exactly once; every
        other scan is the persisted artifact (the BPE encode pin)."""
        df = SPECS["llm_unigram_encode"].fn(spark, sf_dir)
        df.collect()
        final = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        scans = [ln for ln in final.splitlines() if "FileScan parquet" in ln]
        corpus_scans = [ln for ln in scans if "documents.parquet" in ln]
        assert len(corpus_scans) == 1, final
        for ln in scans:
            if ln not in corpus_scans:
                # the plan string elides long paths, so match the store
                # root rather than the full artifact file name
                assert "spark_graft_unigram_store" in ln, ln


class TestDecodeRoundTrip:
    def test_decode_is_lossless_and_matches_outside_sha(self, spark, sf_dir):
        """Every fixture doc decodes losslessly, and the decoded sha256
        equals a reference computed OUTSIDE both engines from the raw
        corpus (space-normalized words)."""
        import hashlib

        rows = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            ).collect()
        }
        want = {}
        for doc_id, t in rows.items():
            wsx = [w for w in (t or "").split(" ") if w]
            if wsx:
                norm = " ".join(wsx)
                want[doc_id] = hashlib.sha256(norm.encode()).hexdigest()
        got = {
            r["doc_id"]: (r["dec_sha"], r["lossless"])
            for r in SPECS["llm_unigram_decode"].fn(spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for doc_id, sha in want.items():
            assert got[doc_id] == (sha, True), doc_id


class TestScaledWitness:
    """r9 (judge task 4): the production-vocab witness — the trainer's
    bounded-driver shape at SentencePiece-class knobs (target_multi=8192,
    seed_cap=65536), pinned against the Fraction-exact reference run with
    the SAME knobs, plus the artifact round-trip."""

    def test_scaled_vocab_matches_reference_and_roundtrips(self, spark, sf_dir):
        from data_ingestion_experiment_otp_spark.operators.unigram import (
            _UNI_SEED_CAP_SCALED,
            _UNI_TARGET_MULTI_SCALED,
            _unigram_artifact,
        )

        texts = [
            r["text"]
            for r in spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            ).select("text").collect()
        ]
        ref_vocab, _ = ref_train(
            texts,
            target_multi=_UNI_TARGET_MULTI_SCALED,
            seed_cap=_UNI_SEED_CAP_SCALED,
        )
        got = {
            r["piece"]: r["n_count"]
            for r in SPECS["llm_unigram_train_scaled"].fn(spark, sf_dir).collect()
        }
        assert got == ref_vocab
        # the scaled model is a real second artifact (cache-keyed by the
        # knobs), and re-requesting it serves the committed store
        d1 = _unigram_artifact(
            spark,
            sf_dir,
            target_multi=_UNI_TARGET_MULTI_SCALED,
            seed_cap=_UNI_SEED_CAP_SCALED,
        )
        d2 = _unigram_artifact(
            spark,
            sf_dir,
            target_multi=_UNI_TARGET_MULTI_SCALED,
            seed_cap=_UNI_SEED_CAP_SCALED,
        )
        assert d1 == d2
        assert d1 != _unigram_artifact(spark, sf_dir)
        # the scaled budget genuinely buys vocabulary at fixture scale OR
        # the fixture saturates below both caps — either way the demo
        # model must be a subset relation, never a contradiction
        demo = {
            r["piece"]: r["n_count"]
            for r in SPECS["llm_unigram_train"].fn(spark, sf_dir).collect()
        }
        assert len(got) >= len(demo)

"""Unicode text-tier coverage (r6, VERDICT task 1).

The shared tokenizer (operators/retrieval.py::_TOKEN_RE) is Unicode-aware:
letters+digits+combining-marks classes instead of the prior [a-z]+, which
silently dropped every accented/CJK/digit token. Two gates here:

1. Tokenizer parity: Spark's Java-regex rendering and DuckDB's RE2
   rendering of the SAME pattern tokenize a multilingual corpus
   identically (the precondition for every text-tier oracle).
2. Extended-corpus hash parity: the full BM25 / perplexity / KL / phrase
   workloads — batch AND index-served forms — hash-match their DuckDB
   oracles over a corpus extended with accented-Latin, Cyrillic, Greek,
   Arabic (+ Arabic-Indic digits), Devanagari, CJK, Hangul, fullwidth,
   and digit-bearing documents.

Documented engine-divergent codepoint contexts excluded by design (see
_TOKEN_RE comment): U+0130 (Turkish İ: Java lowers to i+combining-dot,
DuckDB simple-maps to i) and uppercase-Greek words with trailing Σ (Java
applies the context-sensitive final-sigma rule, DuckDB does not).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from data_ingestion_experiment_otp_spark.operators.retrieval import (
    _TOKEN_RE,
    tokenize,
)
from data_ingestion_experiment_otp_spark.plans.registry import all_queries

from test_oracle_parity import _multiset

# Multilingual sample corpus: every script family the tokenizer must keep,
# plus punctuation/dash/ellipsis separators it must split on.
MULTILINGUAL = [
    "Héllo Wörld 123 naïve café_bar a1b2",
    "Straße über GRÜN ÄRGER",
    "ПРИВЕТ мир Москва 2024",
    "ωμέγα άλφα Αθήνα ελληνικά",  # Greek, no trailing capital sigma
    "نص عربي ١٢٣ اختبار",
    "हिन्दी भाषा परीक्षण",
    "東京タワー 漢字 かな カナ",
    "한국어 텍스트 시험",
    "ＡＢＣ １２３ ｆｕｌｌｗｉｄｔｈ",
    "ǅungla ǈubav ﬁve ﬂour",
    "x'y — em–dash… a,b;c:d!e?f",
    "mixed ASCII and 中文 in one doc 42 times",
]

# Extended fixture documents: (doc_id offset index, text, lang, source).
# Texts are space-separated so CJK "words" are predictable single tokens;
# several reuse the registered BM25/phrase query terms ("join", "hash",
# "vector", ...) so the fixed workloads actually score these docs, and the
# non-ASCII tokens all flow through perplexity/KL/drift token streams.
EXTENDED_DOCS = [
    ("der schnelle join läuft über die größere tabelle müde straße", "de", "src_uni_de"),
    ("le vecteur café naïve join hash système déjà élevé", "fr", "src_uni_fr"),
    ("быстрый join поток вектор окно запрос привет мир", "ru", "src_uni_ru"),
    ("το join τρέχει γρήγορα στον πίνακα ωμέγα άλφα", "el", "src_uni_el"),
    ("استعلام سريع join نافذة ١٢٣ تدفق بيانات", "ar", "src_uni_ar"),
    ("तेज़ join क्वेरी विंडो धारा परीक्षण भाषा", "hi", "src_uni_hi"),
    ("高速 join 查询 窗口 数据流 哈希 表 扫描", "zh", "src_uni_zh"),
    ("빠른 join 쿼리 윈도우 스트림 해시 테이블", "ko", "src_uni_ko"),
    ("東京 データ join ストリーム ハッシュ ウィンドウ 集計", "ja", "src_uni_ja"),
    ("join hash 2024 release v2 build 17 checksum 0xff parts 123", "en", "src_uni_num"),
    ("join hash join hash join hash wiederholung répétition", "mix", "src_uni_rep"),
    ("ＡＢＣ ｄａｔａ join １２３ fullwidth ｈａｓｈ", "mix", "src_uni_fw"),
]

TEXT_TIER = [
    "llm_bm25_topk",
    "llm_bm25_indexed",
    "llm_bm25_compacted",
    "llm_phrase_search",
    "llm_phrase_indexed",
    "llm_unigram_perplexity",
    "llm_source_divergence",
    "llm_bigram_perplexity",
    "llm_script_id",
    "llm_term_proximity",
    "llm_proximity_indexed",
    "llm_bm25_prf",
    "llm_gopher_rules",
    "llm_dataset_card",
    # r7b additions: NFC normalization (the one mapInPandas text stage —
    # Python unicodedata vs DuckDB nfc_normalize over real multilingual
    # content), the two-gate agreement audit, and the BPE decode
    # round-trip (id→symbol inversion over non-ASCII words)
    "llm_normalize_text",
    "llm_gate_agreement",
    "llm_bpe_decode",
]


def test_tokenizer_parity_multilingual(spark):
    """Spark (Java regex + UTF8String lower) and DuckDB (RE2 + utf8proc
    lower) must produce IDENTICAL token arrays over the multilingual
    corpus — the precondition every text-tier oracle rests on."""
    df = spark.createDataFrame([(s,) for s in MULTILINGUAL], "text string")
    spark_toks = [
        r["tk"] for r in df.select(tokenize().alias("tk")).collect()
    ]
    con = duckdb.connect()
    for s, sp in zip(MULTILINGUAL, spark_toks):
        dk = con.execute(
            f"SELECT regexp_extract_all(lower(?), '{_TOKEN_RE}', 0)", [s]
        ).fetchone()[0]
        assert sp == dk, f"tokenizer divergence on {s!r}: spark={sp} duck={dk}"
    con.close()


def test_tokenizer_keeps_nonascii(spark):
    """The defect the r6 change fixes: non-ASCII text must tokenize to
    SOMETHING (the old [a-z]+ class returned [] for every row here)."""
    non_ascii = [s for s in MULTILINGUAL if any(ord(c) > 127 for c in s)]
    df = spark.createDataFrame([(s,) for s in non_ascii], "text string")
    sizes = [r["n"] for r in df.select(F.size(tokenize()).alias("n")).collect()]
    assert all(n > 0 for n in sizes), sizes


@pytest.fixture(scope="session")
def uni_sf_dir(spark, tmp_path_factory, sf_dir):
    """A derived fixture dir whose documents table = the real sf corpus
    UNION the multilingual extension docs (fresh doc_ids past the max)."""
    out = tmp_path_factory.mktemp("uni_sf")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_id = base.agg(F.max("doc_id")).collect()[0][0]
    ext = spark.createDataFrame(
        [
            (max_id + 1 + i, text, lang, source, len(text))
            for i, (text, lang, source) in enumerate(EXTENDED_DOCS)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    base.unionByName(ext).coalesce(1).write.parquet(str(out / "documents.parquet"))
    # the r8 dataset card composes llm_semdedup, which reads embeddings:
    # carry the base corpus's table over (extension docs have none — they
    # stay out of semdedup_drop_rate's denominator via the LEFT JOIN)
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").coalesce(1).write.parquet(
        str(out / "embeddings.parquet")
    )
    return str(out)


@pytest.fixture(scope="session")
def uni_duck(uni_sf_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{uni_sf_dir}/documents.parquet/*.parquet'"
    )
    con.sql(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{uni_sf_dir}/embeddings.parquet/*.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", TEXT_TIER)
def test_text_tier_hash_parity_extended_corpus(spark, uni_sf_dir, uni_duck, name):
    """The driver's exact gate (rows + columns + value multiset) for every
    text-tier operator over the multilingual extended corpus — including
    the index-served forms, so the tokenize-once → persist → prune →
    score round trip is hash-gated over non-ASCII content too."""
    spec = all_queries()[name]
    sdf = spec.fn(spark, uni_sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(row) for row in sdf.collect()]

    rel = uni_duck.sql(spec.oracle)
    duck_cols = [c.lower() for c in rel.columns]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_rows = [tuple(r[i] for i in s_idx) for r in spark_rows]
    d_rows = [tuple(r[i] for i in d_idx) for r in duck_rows]
    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} != {len(d_rows)}"
    sm, dm = _multiset(s_rows), _multiset(d_rows)
    assert sm == dm, (
        f"{name}: only-spark={list((sm - dm).items())[:5]} "
        f"only-duck={list((dm - sm).items())[:5]}"
    )


def test_extended_corpus_actually_exercises_unicode(spark, uni_sf_dir):
    """Guard against the extension silently not mattering: the perplexity
    output must cover the extension docs, and the extension's non-ASCII
    tokens must appear in the corpus vocabulary."""
    spec = all_queries()["llm_unigram_perplexity"]
    out = spec.fn(spark, uni_sf_dir)
    base_max = 499  # sf0.001 corpus ends here; extension ids are above
    ext_rows = out.filter(F.col("doc_id") > base_max).count()
    assert ext_rows == len(EXTENDED_DOCS)

    d = spark.read.parquet(f"{uni_sf_dir}/documents.parquet")
    vocab = (
        d.select(F.explode(tokenize()).alias("t"))
        .filter(~F.col("t").rlike("^[a-z0-9]+$"))
        .distinct()
        .count()
    )
    assert vocab > 30, vocab


def test_script_class_counts_agree_per_class(spark):
    """The llm_script_id cross-engine contract: Java's \\p{IsX} and
    RE2's \\p{X} count the SAME characters for every script class —
    pinned per class over the multilingual corpus (the one operator
    family where the engines cannot share a literal pattern)."""
    import duckdb as _duck

    from data_ingestion_experiment_otp_spark.operators.text_analysis import (
        _SCRIPT_CLASSES,
    )

    df = spark.createDataFrame([(s,) for s in MULTILINGUAL], "text string")
    cols = [
        F.length(F.regexp_replace("text", F.lit(f"[^{java}]"), F.lit(""))).alias(name)
        for name, java, _re2 in _SCRIPT_CLASSES
    ]
    got = df.select("text", *cols).collect()
    con = _duck.connect()
    for row in got:
        for name, _java, re2 in _SCRIPT_CLASSES:
            dk = con.execute(
                "SELECT length(regexp_replace(?, ?, '', 'g'))",
                [row["text"], f"[^{re2}]"],
            ).fetchone()[0]
            assert row[name] == dk, (row["text"], name, row[name], dk)
    con.close()


def test_fused_script_counts_match_regex_form(spark):
    """r7 (judge task 5): the fused codepoint-histogram pass must agree
    with the 9-pass Java-regex form on EVERY count column — over the
    multilingual corpus, supplementary-plane Han (U+20000 ext-B, outside
    the BMP), digits of several scripts, NULL text, and the empty
    string. The fused LUT is built from the session's own Java regex
    engine, so this is the closed-loop check that the derivation and the
    per-batch histogram arithmetic are faithful."""
    from data_ingestion_experiment_otp_spark.operators.text_analysis import (
        _SCRIPT_CLASSES,
        _script_counts_fused,
        _script_counts_regex,
    )

    texts = list(MULTILINGUAL) + [
        "\U00020000\U00020001 ext-b han",  # supplementary plane
        "٣٤٥ १२३ 123",  # Arabic-Indic + Devanagari + ASCII digits
        None,
        "",
        "𝔘𝔫𝔦𝔠𝔬𝔡𝔢",  # mathematical alphanumerics (plane 1)
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    cols = [f"n_{name}" for name, _j, _r in _SCRIPT_CLASSES] + ["n_digit"]
    want = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in _script_counts_regex(d).collect()
    }
    got = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in _script_counts_fused(spark, d).collect()
    }
    assert want == got
    # the supplementary Han doc really exercised the non-BMP table rows
    assert want[len(MULTILINGUAL)][5] == 2  # n_han counts both ext-B chars


def test_script_id_dominant_on_extension_docs(spark, uni_sf_dir):
    """The routing signal must actually route: each extension doc's
    dominant script matches its language family."""
    from data_ingestion_experiment_otp_spark.operators.text_analysis import (
        llm_script_id,
    )

    out = {
        r["doc_id"]: r["script"]
        for r in llm_script_id(spark, uni_sf_dir).filter(F.col("doc_id") > 499).collect()
    }
    # EXTENDED_DOCS order: de fr ru el ar hi zh ko ja num rep fw
    expected = [
        "latin", "latin", "cyrillic", "greek", "arabic", "devanagari",
        "han", "hangul", "kana", "latin", "latin", "latin",
    ]
    got = [out[500 + i] for i in range(len(EXTENDED_DOCS))]
    assert got == expected, got


class TestCharGramDedup:
    def test_cjk_near_dups_invisible_to_word_shingles_caught_by_chars(
        self, spark, tmp_path
    ):
        """The gap llm_char_jaccard closes: two unsegmented CJK docs
        differing by ONE character are (a) invisible to the word-3-gram
        pass — a spaceless doc is one whitespace 'word', zero shingles —
        and (b) a high-Jaccard pair under char grams. A third unrelated
        CJK doc must NOT pair with them."""
        from data_ingestion_experiment_otp_spark.operators.dedup import (
            llm_char_jaccard,
            llm_ngram_jaccard,
        )

        base = "机器学习模型训练需要大量高质量的文本数据来提升泛化能力和下游任务表现"
        near = base.replace("模型", "模组")          # one-bigram edit
        other = "今天的天气非常好适合出门散步并且在公园里喝茶读书放松心情休息一下"
        rows = [
            (1, base, "zh", "s", len(base)),
            (2, near, "zh", "s", len(near)),
            (3, other, "zh", "s", len(other)),
        ]
        out = tmp_path / "docs"
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(str(out / "documents.parquet"))

        word_pairs = llm_ngram_jaccard(spark, str(out)).collect()
        assert word_pairs == [], f"word shingles should see nothing: {word_pairs}"

        char_pairs = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in llm_char_jaccard(spark, str(out)).collect()
        }
        assert set(char_pairs) == {(1, 2)}, char_pairs
        assert char_pairs[(1, 2)] >= 0.6

    def test_banded_catches_planted_cjk_pair(self, spark, tmp_path):
        """r7: the char MinHash banding must catch the same planted
        unsegmented near-dup the exact char pass catches — with the
        IDENTICAL verified jaccard — and stay silent on the unrelated
        doc (the exact verify leaves no false positives). The planted
        pair is LONG (one-bigram edit over ~130 grams, j=0.857) so the
        fixed 4-band/2-row scheme catches it deterministically —
        P[candidate]=0.998 at that j, and with fixed permutations the
        outcome is a constant, verified once; the short-pair regime
        (j~0.67, P=0.91) is what the recall-floor test below covers
        statistically."""
        from data_ingestion_experiment_otp_spark.operators.dedup import (
            llm_char_jaccard,
            llm_char_minhash_banded,
        )

        base = (
            "机器学习模型训练需要大量高质量的文本数据来提升泛化能力和下游任务表现"
            "同时还需要精细的清洗流程和重复数据删除策略以保证语料库的多样性与平衡性"
        )
        near = base.replace("模型", "模组")
        other = (
            "今天的天气非常好适合出门散步并且在公园里喝茶读书放松心情休息一下"
            "然后回家做饭看电影听音乐写日记整理房间"
        )
        rows = [
            (1, base, "zh", "s", len(base)),
            (2, near, "zh", "s", len(near)),
            (3, other, "zh", "s", len(other)),
        ]
        out = tmp_path / "docs"
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(str(out / "documents.parquet"))

        exact = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in llm_char_jaccard(spark, str(out)).collect()
        }
        banded = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in llm_char_minhash_banded(spark, str(out)).collect()
        }
        assert set(banded) == {(1, 2)}, banded
        assert banded[(1, 2)] == exact[(1, 2)]

    def test_banded_truth_recall_and_no_false_positives(self, spark, sf_dir):
        """Banding invariants vs the exact char pass over the fixture
        corpus: (a) every banded pair is an exact pair with the SAME
        verified jaccard (no false positives by construction); (b)
        recall over clear pairs (jaccard >= 0.7, where
        P[candidate] >= 0.93 per pair) is at least 0.8."""
        from data_ingestion_experiment_otp_spark.operators.dedup import (
            llm_char_jaccard,
            llm_char_minhash_banded,
        )

        exact = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in llm_char_jaccard(spark, sf_dir).collect()
        }
        banded = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in llm_char_minhash_banded(spark, sf_dir).collect()
        }
        assert set(banded) <= set(exact), set(banded) - set(exact)
        assert all(banded[k] == exact[k] for k in banded)
        clear = {k for k, j in exact.items() if j >= 0.7}
        if clear:
            recall = len(clear & set(banded)) / len(clear)
            assert recall >= 0.8, (recall, len(clear))

    def test_capped_form_still_catches_fixture_near_dups(self, spark, sf_dir):
        """The stop-gram cap must not lose the generator's injected
        near-duplicates: every word-shingle near-dup pair (the ground
        truth population) also appears in the capped char-gram output."""
        from data_ingestion_experiment_otp_spark.operators.dedup import (
            llm_char_jaccard_capped,
            llm_ngram_jaccard,
        )

        truth = {
            (r["doc_a"], r["doc_b"]) for r in llm_ngram_jaccard(spark, sf_dir).collect()
        }
        capped = {
            (r["doc_a"], r["doc_b"])
            for r in llm_char_jaccard_capped(spark, sf_dir).collect()
        }
        assert truth <= capped, truth - capped


class TestNormalizeText:
    """NFC normalization parity pins beyond the fixture corpus (which is
    already NFC/single-spaced, so the extended-corpus hash gate alone
    would never exercise the interesting paths)."""

    CASES = [
        (1, "café  x"),            # NFD -> NFC composition + collapse
        (2, "\xa0weird edge\xa0"),       # NBSP is CONTENT: kept, incl. edges
        (3, "a  b\tc\nd\r\ne"),          # every ASCII whitespace run -> one space
        (4, " leading and trailing  "),  # edge spaces stripped
        (5, "ﬁnal ligature ｶﾞ"),         # NFC does NOT decompose ligatures/halfwidth
        (6, "한국어   가"),               # Hangul syllables stay composed
        (7, "é́ double mark"),  # partial composition (e+´+´ -> é+´)
        (8, "\U0001F600  astral"),       # astral plane through codepoint lengths
    ]

    def _plant(self, spark, tmp_path):
        out = tmp_path / "docs"
        spark.createDataFrame(
            [(i, t, "xx", "s", len(t)) for i, t in self.CASES],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.parquet(str(out / "documents.parquet"))
        return str(out)

    def test_planted_parity_and_values(self, spark, tmp_path):
        import unicodedata

        from data_ingestion_experiment_otp_spark.plans.registry import all_queries

        sf = self._plant(spark, tmp_path)
        spec = all_queries()["llm_normalize_text"]
        got = {r["doc_id"]: (r["norm_text"], r["n_chars_norm"], r["changed"])
               for r in spec.fn(spark, sf).collect()}
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf}/documents.parquet/*.parquet'"
        )
        duck = {r[0]: (r[1], r[2], r[3]) for r in con.sql(spec.oracle).fetchall()}
        con.close()
        assert got == duck
        # hand-pinned semantics
        assert got[1][0] == "café x"                 # composed + collapsed
        assert got[2][0] == "\xa0weird edge\xa0"          # NBSP untouched
        assert got[3][0] == "a b c d e"
        assert got[4] == ("leading and trailing", 20, True)
        assert got[5][0] == "ﬁnal ligature ｶﾞ" and not got[5][2]
        assert got[7][0] == "é́ double mark"
        assert got[8][0] == "\U0001F600 astral" and got[8][1] == 8
        # idempotence: normalizing a normalized corpus changes nothing
        for text, n, _ in got.values():
            again = unicodedata.normalize("NFC", text)
            assert again == text and len(text) == n

    def test_kernel_properties(self):
        from data_ingestion_experiment_otp_spark.operators.text_analysis import (
            normalize_kernel,
        )

        assert normalize_kernel(None) is None
        assert normalize_kernel("") == ""
        assert normalize_kernel("   ") == ""
        assert normalize_kernel("à") == "à"
        # strip is space-only: edge NBSP survives (content, not separator)
        assert normalize_kernel("\xa0x\xa0") == "\xa0x\xa0"
        assert normalize_kernel(" \xa0x ") == "\xa0x"


class TestGateAgreement:
    def test_counts_reconcile_with_the_two_gates(self, spark, sf_dir):
        """The confusion matrix must reconcile exactly with the two
        registered gates it composes, over the joined population."""
        from data_ingestion_experiment_otp_spark.operators.text_analysis import (
            llm_gate_agreement,
            llm_gopher_rules,
            llm_quality_classifier,
        )

        g = {r["doc_id"]: r["keep"] for r in llm_gopher_rules(spark, sf_dir).collect()}
        c = {
            r["doc_id"]: (r["source"], r["keep"])
            for r in llm_quality_classifier(spark, sf_dir).collect()
        }
        import collections

        ref = collections.Counter()
        per_src = collections.defaultdict(lambda: [0, 0, 0, 0, 0])
        for did, (src, mk) in c.items():
            if did not in g:
                continue
            hk = g[did]
            row = per_src[src]
            row[0] += 1
            row[1] += hk and mk
            row[2] += hk and not mk
            row[3] += (not hk) and mk
            row[4] += (not hk) and (not mk)
        got = {
            r["source"]: [r["n_docs"], r["n_both"], r["n_heur_only"],
                          r["n_model_only"], r["n_neither"]]
            for r in llm_gate_agreement(spark, sf_dir).collect()
        }
        assert got == {k: list(v) for k, v in per_src.items()}

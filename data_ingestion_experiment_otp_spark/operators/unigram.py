"""Unigram-LM (SentencePiece-style) subword tokenizer — the second major
tokenizer family beside BPE (operators/bpe.py): Kudo 2018's unigram
language model, trained by EM over the word-frequency table and applied by
Viterbi segmentation. BPE builds tokens bottom-up by merge rules; the
unigram model starts from an over-complete seed vocabulary and PRUNES,
segmenting each word by maximum likelihood — the tokenizer T5/ALBERT ship.

Integer-exact by construction (r8): piece scores are raw occurrence
COUNTS, and Viterbi compares candidate paths by EXACT integer
cross-multiplication — a path of k pieces scores (c1·…·ck)/T^k, and
a/T^ka vs b/T^kb compares as a·T^kb vs b·T^ka in unbounded ints. No
floats anywhere in training or segmentation, so the whole tier is
bit-deterministic across partitionings, processes and platforms; hard-EM
(Viterbi E-step) keeps the expected counts integral. Ties break to the
shorter path, then the lexicographically smaller piece tuple — the
documented spec the independent test reference replays.

Cross-engine status: the EM fixpoint is iterative training, not a
relational query — genuinely non-SQL-expressible (the same category as
the HLL sketches), so these entries carry NO DuckDB oracle; correctness
is pinned by an INDEPENDENT Python reference implementation (exact
equality at 3 SFs + planted corpora, tests/test_unigram.py), conservation
invariants, and the same plan pins as the BPE tier.

Scale shape mirrors the r8 BPE trainer exactly: ONE corpus FileScan into
the word-count aggregate, the EM loop driver-local over the top-V word
table (bounded at bpe._TRAIN_TOP_V), the learned vocabulary broadcast
back and applied to the full distributed word table by an Arrow-batched
Viterbi kernel, and the result persisted as a train-once / serve-forever
artifact (word_segs + vocab) every downstream entry reads.

Reference parity: the reference (ehtesham-punt/data-ingestion-experiment-
otp) has no tokenizer surface; this is engine-target capstone surface
(SURVEY.md §2.10-r7 tokenizer tier, extended r8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..sources.catalog import load
from .bpe import _TRAIN_TOP_V, _US, _word_counts

_UNI_TARGET_MULTI = 256  # multi-char pieces kept per EM round
_UNI_ROUNDS = 2
_UNI_MAX_LEN = 8  # longest candidate piece
_UNI_SEED_CAP = 4096  # seed vocabulary bound (count·len ranked)

_UNI_SEG_SCHEMA = "w string, n long, seg string"
_UNI_VOCAB_SCHEMA = "piece string, tok_id long, n_count long"


def unigram_segment_word(w, vocab_items, total, max_len=_UNI_MAX_LEN):
    """Maximum-likelihood Viterbi segmentation under the unigram model,
    with EXACT integer path comparison (no floats): dp state per prefix is
    (count-product, piece-count, piece-tuple); a/T^ka >= b/T^kb iff
    a·T^kb >= b·T^ka. Ties: fewer pieces, then lexicographically smaller
    tuple. Self-contained (ship_by_value contract): `vocab_items` may be a
    dict or an items() iterable; returns the piece list, or None when no
    path covers the word (a character outside the vocabulary)."""
    counts = vocab_items if isinstance(vocab_items, dict) else dict(vocab_items)
    n = len(w)
    pw = [1]

    def better(a, b):
        # is a strictly better than b?  (b may be None)
        if b is None:
            return True
        while len(pw) <= max(a[1], b[1]):
            pw.append(pw[-1] * total)
        lhs = a[0] * pw[b[1]]
        rhs = b[0] * pw[a[1]]
        if lhs != rhs:
            return lhs > rhs
        if a[1] != b[1]:
            return a[1] < b[1]
        return a[2] < b[2]

    best = [None] * (n + 1)
    best[0] = (1, 0, ())
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            p = w[j:i]
            c = counts.get(p)
            if not c:
                continue
            cand = (best[j][0] * c, best[j][1] + 1, best[j][2] + (p,))
            if better(cand, best[i]):
                best[i] = cand
    return list(best[n][2]) if best[n] is not None else None


def unigram_em_loop(
    word_table,
    target_multi=_UNI_TARGET_MULTI,
    n_rounds=_UNI_ROUNDS,
    max_len=_UNI_MAX_LEN,
    seed_cap=_UNI_SEED_CAP,
    extra_chars=(),
):
    """Driver-local unigram-LM training over a (word, count) table — the
    same data-axis bound as `bpe.bpe_merge_loop` (the table is vocabulary-
    sized, truncated at top-V upstream; EM cost is corpus-size-
    independent).

    Seeding (Kudo 2018 §3.2's practical form): all substrings of length
    2..max_len ranked by count·len, capped at `seed_cap`, plus EVERY
    character (characters never prune and floor at count 1 — the
    character-coverage guarantee that keeps every word segmentable, incl.
    `extra_chars` from words outside the truncated table). Each EM round:
    Viterbi-segment every word under current counts (hard-EM — integral
    expected counts), re-count pieces weighted by word frequency, keep the
    top `target_multi` multi-char pieces (count desc, piece asc). All
    integer arithmetic; deterministic for any input order."""
    from collections import Counter

    sub = Counter()
    chars = Counter()
    for w, n in word_table:
        length = len(w)
        for i in range(length):
            chars[w[i]] += n
            top = min(i + max_len, length)
            for j in range(i + 2, top + 1):
                sub[w[i:j]] += n
    for ch in extra_chars:
        if ch not in chars:
            chars[ch] = 0
    seeds = sorted(sub, key=lambda p: (-sub[p] * len(p), p))[:seed_cap]
    vocab = {p: sub[p] for p in seeds}
    for ch, c in chars.items():
        vocab[ch] = max(c, 1)
    for _ in range(n_rounds):
        total = sum(vocab.values())
        newc = Counter()
        for w, n in word_table:
            for p in unigram_segment_word(w, vocab, total, max_len):
                newc[p] += n
        keep = sorted(
            (p for p in newc if len(p) > 1), key=lambda p: (-newc[p], p)
        )[:target_multi]
        vocab = {p: newc[p] for p in keep}
        for ch in chars:
            vocab[ch] = max(newc.get(ch, 0), 1)
    return vocab


def _train(
    spark: SparkSession,
    sf_dir: str,
    top_v: int = _TRAIN_TOP_V,
    target_multi: int = _UNI_TARGET_MULTI,
    seed_cap: int = _UNI_SEED_CAP,
):
    """Train the unigram model; return (seg DataFrame[w, n, seg], vocab
    dict). One corpus FileScan (the word-count aggregate, lazily
    localCheckpointed), one TakeOrdered collect of the top-V word table,
    driver-local EM, then ONE distributed Arrow pass applying the
    broadcast vocabulary to the FULL word table (words beyond top-V get
    segmented too — the char floor guarantees a path; their chars ride in
    via the distinct-char aggregate, a bounded second job over the
    checkpointed words)."""
    from ..shipping import ship_by_value

    words = _word_counts(spark, sf_dir).localCheckpoint(eager=False)
    rows = words.orderBy(F.desc("n"), "w").limit(top_v).collect()
    # distinct characters over the FULL word table: bounded by the script
    # repertoire, so the collect is constant-size at any corpus scale.
    # split on "" is codepoint-atomic AND includes line terminators —
    # the lookahead form ((?!^)(?=.)) it replaces missed newlines (Java
    # `.` excludes them) and split surrogate pairs, so a word with
    # either outside the top-V table missed the char-coverage floor and
    # silently segmented to empty — ADVICE r8.
    all_chars = [
        r["c"]
        for r in words.select(F.explode(F.split("w", "")).alias("c"))
        .filter(F.col("c") != "")
        .distinct()
        .collect()
    ]
    vocab = unigram_em_loop(
        [(r["w"], int(r["n"])) for r in rows],
        target_multi=target_multi,
        seed_cap=seed_cap,
        extra_chars=all_chars,
    )
    total = sum(vocab.values())

    kernel = ship_by_value(unigram_segment_word)
    bcast = spark.sparkContext.broadcast((tuple(sorted(vocab.items())), total))

    def seg_rows(it):
        items, tot = bcast.value
        counts = dict(items)
        us = "\x1f"
        for pdf in it:
            pdf = pdf.copy()
            pdf["seg"] = pdf["w"].map(
                lambda w: "".join(
                    us + p + us for p in (kernel(w, counts, tot) or [])
                )
            )
            yield pdf

    seg_df = words.mapInPandas(seg_rows, _UNI_SEG_SCHEMA)
    return seg_df, vocab


def _artifact_key(
    sf_dir: str,
    top_v: int,
    target_multi: int,
    seed_cap: int,
    sig: str | None = None,
) -> str:
    import hashlib
    import os

    from .bpe import corpus_signature

    if sig is None:
        sig = corpus_signature(sf_dir)
    raw = (
        f"unigram|{os.path.abspath(sf_dir)}|{sig}|{top_v}"
        f"|{target_multi}|{_UNI_ROUNDS}|{_UNI_MAX_LEN}|{seed_cap}"
    )
    return hashlib.sha256(raw.encode()).hexdigest()[:20]


def _unigram_artifact(
    spark: SparkSession,
    sf_dir: str,
    top_v: int = _TRAIN_TOP_V,
    target_multi: int = _UNI_TARGET_MULTI,
    seed_cap: int = _UNI_SEED_CAP,
) -> str:
    """Train-once / serve-forever (the bpe._bpe_artifact pattern verbatim:
    _COMMITTED marker, build-then-rename promotion, concurrent builders
    race benignly because training is deterministic; per-user store root
    + per-file corpus signature — bpe._store_root / corpus_signature)."""
    import os
    import shutil

    from .bpe import _build_root, _sweep_stale_builds, corpus_signature

    sig = corpus_signature(sf_dir)
    root = _build_root("spark_graft_unigram_store", sig)
    final = os.path.join(
        root, _artifact_key(sf_dir, top_v, target_multi, seed_cap, sig)
    )
    if os.path.isfile(os.path.join(final, "_COMMITTED")):
        return final
    _sweep_stale_builds(root)
    tmp = f"{final}.build{os.getpid()}"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    seg_df, vocab = _train(spark, sf_dir, top_v, target_multi, seed_cap)
    seg_df.write.parquet(os.path.join(tmp, "word_segs.parquet"))
    vrows = [(p, c) for p, c in sorted(vocab.items())]
    (
        spark.createDataFrame(vrows, "piece string, n_count long")
        .withColumn(
            "tok_id", F.row_number().over(Window.orderBy("piece")).cast("long")
        )
        .select("piece", "tok_id", "n_count")
        .coalesce(1)
        .write.parquet(os.path.join(tmp, "vocab.parquet"))
    )
    open(os.path.join(tmp, "_COMMITTED"), "w").close()
    try:
        os.rename(tmp, final)
    except OSError:
        if os.path.isfile(os.path.join(final, "_COMMITTED")):
            shutil.rmtree(tmp)
        else:
            raise
    return final


def _artifact_frames(spark: SparkSession, sf_dir: str):
    """(wordsyms DF[w, n, syms], vocab DF[piece, tok_id, n_count]) served
    from the persisted artifact — vocabulary-bounded relations, no entry
    retrains."""
    import os

    d = _unigram_artifact(spark, sf_dir)
    seg_df = spark.read.schema(_UNI_SEG_SCHEMA).parquet(
        os.path.join(d, "word_segs.parquet")
    )
    wordsyms = seg_df.select(
        "w", "n", F.filter(F.split("seg", _US), lambda s: s != "").alias("syms")
    )
    vocab = spark.read.schema(_UNI_VOCAB_SCHEMA).parquet(
        os.path.join(d, "vocab.parquet")
    )
    return wordsyms, vocab


@register(
    "llm_unigram_train",
    oracle=None,  # iterative EM training — non-SQL-expressible; pinned by
    # an independent Python reference + invariants (tests/test_unigram.py)
    tags=("llm", "text", "unigram"),
)
def llm_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned unigram vocabulary: every piece with its dense token id
    and final hard-EM occurrence count — vocab.json for the unigram
    family, the artifact a sampling-temperature or coverage audit reads.
    Served from the persisted store (docstring at `_unigram_artifact`)."""
    _, vocab = _artifact_frames(spark, sf_dir)
    return vocab


# Production-vocab witness knobs (r9, judge task 4 — the BPE N=256
# precedent): SentencePiece ships ~32k pieces; the structural claim is
# that the trainer's cost model is unchanged at that regime — ONE corpus
# FileScan + driver-local EM over the bounded top-V table, a few seconds
# regardless of corpus size. target_multi bounds the kept multi-char
# pieces per round, seed_cap the over-complete seed vocabulary Kudo's
# §3.2 prunes from.
_UNI_TARGET_MULTI_SCALED = 8192
_UNI_SEED_CAP_SCALED = 65536


@register(
    "llm_unigram_train_scaled",
    oracle=None,  # same non-SQL-expressible EM as llm_unigram_train;
    # pinned by the Fraction-exact independent reference at the planted
    # and fixture corpora (tests/test_unigram.py)
    tags=("llm", "text", "unigram", "scale"),
)
def llm_unigram_train_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`llm_unigram_train` at a production-class vocabulary budget
    (target_multi={tm}, seed_cap={sc} — the SentencePiece regime): the
    witness that the unigram trainer's bounded-driver shape holds past
    demo knobs, mirroring `llm_bpe_train_scaled`. Training cost stays
    ONE corpus FileScan + a driver-local EM whose cost depends only on
    the top-V word table; the fixture vocabulary saturates below the
    caps, so the scaled model is pinned equal to the independent
    reference run with the same knobs (not to the demo model)."""
    import os

    d = _unigram_artifact(
        spark,
        sf_dir,
        target_multi=_UNI_TARGET_MULTI_SCALED,
        seed_cap=_UNI_SEED_CAP_SCALED,
    )
    return spark.read.schema(_UNI_VOCAB_SCHEMA).parquet(
        os.path.join(d, "vocab.parquet")
    )


llm_unigram_train_scaled.__doc__ = llm_unigram_train_scaled.__doc__.format(
    tm=_UNI_TARGET_MULTI_SCALED, sc=_UNI_SEED_CAP_SCALED
)


def _doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc unigram-encode stats — the exact shape of bpe._doc_token_
    stats (one corpus scan, word-keyed equi-join against the vocabulary-
    bounded artifact relation; AQE broadcasts at fixture scale, degrades
    to a shuffle hash join at real vocabulary scale)."""
    wordsyms, vocab = _artifact_frames(spark, sf_dir)
    wordpos = wordsyms.select(
        "w",
        F.size("syms").cast("long").alias("n_syms"),
        F.posexplode("syms").alias("pos0", "piece"),
    )
    wordstats = (
        wordpos.join(F.broadcast(vocab.select("piece", "tok_id")), "piece")
        .groupBy("w")
        .agg(
            F.max("n_syms").alias("n_syms"),
            F.sum(F.col("tok_id") * (F.col("pos0") + 1)).alias("wsum"),
        )
    )
    d = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    dw = d.select("doc_id", F.explode(ws).alias("w"))
    return (
        dw.join(wordstats, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_syms").alias("n_tokens"),
            F.sum("wsum").alias("tok_checksum"),
        )
    )


@register(
    "llm_unigram_encode",
    oracle=None,  # segmentation under the EM-trained model — the order-
    # sensitive checksum is pinned against the independent reference
    tags=("llm", "text", "unigram"),
)
def llm_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the learned unigram vocabulary: per
    document, word count, unigram token count, and the order-sensitive
    token-id checksum (Σ tok_id × within-word position — pins the exact
    token-id SEQUENCES, the same contract as `llm_bpe_encode`)."""
    return _doc_token_stats(spark, sf_dir)


@register(
    "llm_tokenizer_compare",
    oracle=None,  # composes the unigram tier (non-SQL) with the BPE tier;
    # reconciliation-pinned against both singles in tests/test_unigram.py
    tags=("llm", "text", "unigram", "bpe", "audit"),
)
def llm_tokenizer_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Side-by-side tokenizer audit: per language, total words and total
    token counts under BPE vs the unigram LM — the table a tokenizer
    bake-off reads to pick the family whose fertility serves the corpus
    mix best. Integer-exact (raw sums, no ratios — consumers divide at
    display time); one doc_id-keyed join of the two per-doc stats plus
    the language column, then a per-language aggregate."""
    from .bpe import _doc_token_stats as _bpe_stats

    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    bpe = _bpe_stats(spark, sf_dir).select(
        "doc_id",
        F.col("n_words").alias("bpe_words"),
        F.col("n_bpe_tokens").alias("bpe_tokens"),
    )
    uni = _doc_token_stats(spark, sf_dir).select(
        "doc_id", F.col("n_tokens").alias("uni_tokens")
    )
    return (
        d.join(bpe, "doc_id")
        .join(uni, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("bpe_words").alias("n_words"),
            F.sum("bpe_tokens").alias("bpe_tokens"),
            F.sum("uni_tokens").alias("uni_tokens"),
        )
    )


@register(
    "llm_unigram_decode",
    oracle=None,  # inverts the EM-trained vocabulary (non-SQL tier); the
    # sha256 round-trip is pinned against the raw corpus in pytest
    tags=("llm", "text", "unigram"),
)
def llm_unigram_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode — the round-trip closing the unigram tier the way
    `llm_bpe_decode` closes the BPE tier: re-derive each word's piece-id
    sequence, invert ids back through the vocabulary, reassemble pieces
    in position order, rebuild each document's text, and emit the decoded
    sha256 plus ``lossless`` (decoded == the original's space-normalized
    words — Viterbi segmentation is a partition of the word, so the tier
    is lossless by construction; this operator PROVES the implementation
    is, pinned in pytest against sha256 of the raw corpus computed
    outside the engine).

    Scale shape: identical to the BPE decode — the inversion runs over
    the vocabulary-bounded artifact relations; corpus-sized work is one
    scan + a word-keyed join + one per-doc ordered reassembly."""
    wordsyms, vocab = _artifact_frames(spark, sf_dir)
    wordpos = wordsyms.select("w", F.posexplode("syms").alias("pos0", "piece"))
    wordids = wordpos.join(F.broadcast(vocab.select("piece", "tok_id")), "piece").select(
        "w", "pos0", "tok_id"
    )
    inv = vocab.select("tok_id", F.col("piece").alias("dec_piece"))
    decwords = (
        wordids.join(F.broadcast(inv), "tok_id")
        .groupBy("w")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos0", "dec_piece"))),
                    lambda s: s["dec_piece"],
                ),
                "",
            ).alias("dec_w")
        )
    )
    d = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    dw = d.select("doc_id", F.posexplode(ws).alias("pos", "w"))
    joined = dw.join(decwords, "w")
    ordered = F.array_sort(F.collect_list(F.struct("pos", "dec_w", "w")))
    agg = joined.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.array_join(F.transform(ordered, lambda s: s["dec_w"]), " ").alias("dec_text"),
        F.array_join(F.transform(ordered, lambda s: s["w"]), " ").alias("orig_text"),
    )
    return agg.select(
        "doc_id",
        "n_words",
        F.length("dec_text").cast("long").alias("dec_n_chars"),
        F.sha2("dec_text", 256).alias("dec_sha"),
        (F.col("dec_text") == F.col("orig_text")).alias("lossless"),
    )

"""Ranked text retrieval (engine addition, SURVEY.md §2.10 family).

BM25 top-k document retrieval over the `documents` corpus — the ranked
keyword-search primitive an LLM-data pipeline uses for targeted corpus
slicing (pull the best k documents per topic probe) and for
quality-by-query auditing. Everything is built-in expressions (whole-stage
codegen): tokenize → postings filtered to the query vocabulary → tf/df
aggregation → BM25 scoring → per-query top-k.

Scale shape (the 100 TB plan, in order of what moves):

- The corpus is scanned twice, both times scan-parallel with zero
  pre-shuffle: once projecting `(doc_id, dl)` where dl = size of the token
  array (no explode — document length never requires materializing tokens
  as rows), once exploding tokens into postings.
- Postings are immediately semi-joined against the BROADCAST query
  vocabulary (a handful of terms), so the only rows that ever reach a
  shuffle are postings whose term occurs in some query — a vanishing
  fraction of the corpus. The full postings list is never aggregated.
- tf/df/avgdl aggregates all partial-aggregate map-side; the surviving
  shuffles carry (term, doc_id, count) scalars, never text.
- Scoring is one projection over tf ⋈ dl (doc-keyed join of two slim
  relations; AQE broadcasts the tf side when it is small) with the 1-row
  corpus stats and per-term idf both broadcast.
- The per-query top-k is a rank-filter window, which Spark 4 executes
  with WindowGroupLimit: each map task keeps only its local top-k before
  the per-query exchange, so the rank shuffle is O(tasks × queries × k)
  scalars (plan-asserted in tests/test_retrieval.py).

Determinism / oracle notes: scores are ranked on their round-6 values with
doc_id as the total-order tie-break, so ranking is identical across
engines; each per-(query, doc) score sums ≤ a handful of per-term
contributions, so summation order cannot move the round-6 grid value
(contrast with corpus-wide money sums, which DID need exact decimal —
registry.py docstring).

Reference parity: the reference has no search surface (it selects rows by
`historyId` ranges only, `api/main.py:94-97`); this is engine-target
surface mandated by BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..plans.registry import register
from ..sources.catalog import load

# BM25 constants (classic Robertson/Sparck-Jones defaults).
_K1 = 1.2
_B = 0.75
_TOP_K = 5

# Fixed query workload: (query_id, term). Terms are drawn from the fixture
# vocabulary so every query has matches at every SF.
_QUERIES: tuple[tuple[int, str], ...] = (
    (0, "join"),
    (0, "hash"),
    (1, "vector"),
    (1, "stream"),
    (1, "window"),
    (2, "customer"),
    (2, "filter"),
)

# THE tokenizer for the whole text tier (BM25 / phrase / perplexity / KL /
# drift / streaming text index import it from here — one definition, so a
# change moves every consumer together). Unicode-aware: a token is a
# letter-or-digit start followed by letters/digits/combining marks, so
# accented Latin, Cyrillic, Greek, Arabic (+ Arabic-Indic digits),
# Devanagari (combining vowel signs stay attached), CJK runs, Hangul, and
# plain numbers all tokenize — the prior [a-z]+ class silently dropped all
# of them. \p{L}/\p{N}/\p{M} are Unicode general categories that Java
# regex (Spark) and RE2 (DuckDB) interpret identically, and both engines'
# lower() agree on everything except two documented context-sensitive
# SpecialCasing rules Java applies and DuckDB's simple mapping does not:
# U+0130 (Turkish İ → i + combining dot vs i) and uppercase-Greek words
# whose trailing Σ Java lowers to final ς. The tokenizer-parity test
# (tests/test_retrieval.py) pins Spark==DuckDB tokenization over a
# multilingual corpus excluding those two codepoint contexts.
_TOKEN_RE = r"[\p{L}\p{N}][\p{L}\p{N}\p{M}]*"

# DuckDB rendering: inside a standard SQL string literal backslashes are
# literal, so the pattern embeds verbatim in oracle SQL.
_TOKENIZE = f"regexp_extract_all(lower(text), '{_TOKEN_RE}', 0)"


def tokenize(col="text"):
    """Spark rendering of the SAME tokenizer, as a Column builder.

    Spark's SQL string-literal parser treats backslash as an escape and
    silently strips the one in ``\\p{{L}}`` (the expression then matches
    nothing), so the Spark side must NOT round-trip the pattern through
    ``F.expr`` — passing the pattern as a ``lit`` column bypasses the SQL
    parser entirely and hands Java regex the exact same bytes DuckDB's
    RE2 receives."""
    return F.regexp_extract_all(F.lower(col), F.lit(_TOKEN_RE), F.lit(0))

_QUERIES_SQL = ", ".join(f"({qid}, '{t}')" for qid, t in _QUERIES)

# The oracle replays the identical tokenization, tf/df/dl arithmetic, and
# rank-on-rounded-score ordering in DuckDB.
_BM25_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENIZE} AS tk FROM documents
    ),
    dl AS (SELECT doc_id, len(tk)::DOUBLE AS dl FROM toks),
    stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
    tok AS (SELECT doc_id, unnest(tk) AS term FROM toks),
    q(query_id, term) AS (VALUES {_QUERIES_SQL}),
    qt AS (SELECT DISTINCT term FROM q),
    tf AS (
      SELECT doc_id, term, count(*)::DOUBLE AS tf
      FROM tok JOIN qt USING (term) GROUP BY doc_id, term
    ),
    dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             sum(ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
                 * tf.tf * ({_K1} + 1)
                 / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / s.avgdl))) AS score
      FROM q
      JOIN tf ON tf.term = q.term
      JOIN dft ON dft.term = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY q.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, score, rn FROM (
      SELECT query_id, doc_id, round(score, 6) AS score,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(score, 6) DESC, doc_id) AS rn
      FROM scored
    )
    WHERE rn <= {_TOP_K}
    """


def bm25_contribution(tf, df, n, dl, avgdl):
    """One query term's BM25 score contribution as a Column — shared by the
    batch query and the persisted-index query path
    (streaming/text_index.py) so both score identically by construction.
    idf is the BM25+ form ln(1 + (N - df + 0.5)/(df + 0.5)), always
    positive."""
    idf = F.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (_K1 + 1) / (tf + _K1 * (1 - _B + _B * dl / avgdl))


@register(
    "llm_bm25_topk",
    oracle=_BM25_ORACLE,
    tags=("llm", "retrieval", "text"),
)
def llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval: top-{k} documents per keyword query.

    idf is the BM25+ form ln(1 + (N - df + 0.5)/(df + 0.5)) (always
    positive, so high-df terms dampen rather than invert the ranking —
    this corpus's vocabulary appears in ~80% of documents). tf saturates
    with k1={k1}, length-normalized with b={b} against the corpus mean
    document length."""
    d = load(spark, sf_dir, "documents")
    toks = tokenize()

    # Scan 1: per-doc length from the token ARRAY — no explode, no shuffle.
    dl = d.select("doc_id", F.size(toks).cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )

    qdf = spark.createDataFrame(list(_QUERIES), "query_id int, term string")
    qterms = qdf.select("term").distinct()

    # Scan 2: postings, filtered to the broadcast query vocabulary BEFORE
    # any aggregation — only query-term postings ever shuffle.
    tok = d.select("doc_id", F.explode(toks).alias("term"))
    tf = (
        tok.join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))

    contrib = bm25_contribution(
        F.col("tf"), F.col("df"), F.col("n"), F.col("dl"), F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "doc_id", "score", "rn")
    )


llm_bm25_topk.__doc__ = llm_bm25_topk.__doc__.format(k=_TOP_K, k1=_K1, b=_B)


@register(
    "llm_bm25_indexed",
    oracle=_BM25_ORACLE,
    tags=("llm", "retrieval", "index"),
)
def llm_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving form of `llm_bm25_topk`: the same query workload
    answered from the PERSISTED inverted index (streaming/text_index.py)
    instead of re-tokenizing the corpus per query. The index is built once
    per (session, sf) in an application-scoped scratch dir — two
    epoch-partitioned sink invocations, the streaming ingest shape — and
    every later call is query-only: a term-hash partition-pruned posting
    scan plus scalar joins. Sharing `bm25_contribution` and the tokenizer
    with the batch path makes the two hash-identical by construction,
    which is why this entry can carry the batch operator's DuckDB oracle
    verbatim (the cross-engine proof that the index round-trip — tokenize
    once, persist, prune, score — loses nothing)."""
    from ..streaming.text_index import bm25_query_index

    return bm25_query_index(spark, _ensure_index(spark, sf_dir), list(_QUERIES), k=_TOP_K)


def _ensure_index(spark: SparkSession, sf_dir: str) -> str:
    """Build the scratch inverted index for `sf_dir` once per application
    and return its path — shared by the indexed and compacted serving
    queries (the compacted one needs the build, not the query)."""
    import os

    from ..sources.files import _scratch
    from ..streaming.text_index import text_index_sink

    sf_tag = sf_dir.rstrip("/").split("/")[-1].replace(".", "_")
    base = _scratch(spark, f"bm25_index_{sf_tag}")
    # Gate on an explicit build-complete marker written AFTER both sink
    # calls commit — not on any store directory (Spark creates the output
    # dir when a write job STARTS, so a dir-exists gate would let a build
    # that died mid-write serve a half-built index for the rest of the
    # application) and not on a data-dependent partition like
    # postings/src_batch=1 (an all-even-doc_id corpus never writes it, so
    # every call would silently rebuild the whole index).
    marker = os.path.join(base, "_BUILD_COMPLETE")
    if not os.path.isfile(marker):
        d = load(spark, sf_dir, "documents").select("doc_id", "text")
        sink = text_index_sink(base)
        # pmod, not %: Spark's % takes the dividend's sign, so a negative
        # odd doc_id would match neither branch and silently vanish
        sink(d.filter(F.pmod("doc_id", F.lit(2)) == 0), 0)
        sink(d.filter(F.pmod("doc_id", F.lit(2)) == 1), 1)
        with open(marker, "w") as f:
            f.write("ok\n")
    return base


@register(
    "llm_bm25_compacted",
    oracle=_BM25_ORACLE,
    tags=("llm", "retrieval", "index"),
)
def llm_bm25_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llm_bm25_indexed's workload served from a COMPACTED generation of
    the same index (streaming/text_index.py::compact_text_index):
    building on llm_bm25_indexed's scratch index, every epoch is folded
    into one src_batch=0 generation and the query runs against that.
    Carrying the batch oracle verbatim makes the compaction itself
    hash-gated cross-engine — liveness-fold, dead-posting drop, and the
    generation rewrite provably lose nothing."""
    import os

    from ..sources.files import _scratch
    from ..streaming.text_index import bm25_query_index, compact_text_index

    src = _ensure_index(spark, sf_dir)
    sf_tag = sf_dir.rstrip("/").split("/")[-1].replace(".", "_")
    gen2 = _scratch(spark, f"bm25_index_gen2_{sf_tag}")
    # Same gate-on-committed-artifact rule as _ensure_index: a marker
    # written after the compaction's last write job commits, never a
    # dir-exists check (the output dir appears when the write STARTS, so
    # a compaction that failed mid-write would otherwise silently serve a
    # half-built generation for the rest of the application).
    marker = os.path.join(gen2, "_COMPACT_COMPLETE")
    if not os.path.isfile(marker):
        compact_text_index(spark, src, gen2)
        with open(marker, "w") as f:
            f.write("ok\n")
    return bm25_query_index(spark, gen2, list(_QUERIES), k=_TOP_K)


# Phrase workload: (query_id, term, offset) — consecutive-token phrases.
_PHRASES: tuple[tuple[int, str, int], ...] = (
    (0, "join", 0),
    (0, "hash", 1),
    (1, "table", 0),
    (1, "part", 1),
    (1, "agg", 2),
)

_PHRASES_SQL = ", ".join(f"({q}, '{t}', {o})" for q, t, o in _PHRASES)

_PHRASE_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENIZE} AS tk FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(tk) AS term, unnest(range(len(tk))) AS pos
      FROM toks
    ),
    q(query_id, qterm, qpos) AS (VALUES {_PHRASES_SQL}),
    qlen AS (SELECT query_id, count(*) AS L FROM q GROUP BY query_id),
    m AS (
      SELECT q.query_id, tok.doc_id, tok.pos - q.qpos AS start_pos,
             count(*) AS n_hit
      FROM q JOIN tok ON tok.term = q.qterm
      GROUP BY q.query_id, tok.doc_id, tok.pos - q.qpos
    )
    SELECT m.query_id, m.doc_id,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM m JOIN qlen ON qlen.query_id = m.query_id
    WHERE m.n_hit = qlen.L
    GROUP BY m.query_id, m.doc_id
    """


@register(
    "llm_phrase_search",
    oracle=_PHRASE_ORACLE,
    tags=("llm", "retrieval", "text"),
)
def llm_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact consecutive-token phrase search — the retrieval operation
    bag-of-words BM25 cannot express (and the primitive behind n-gram
    overlap decontamination audits): for each phrase query, every document
    containing the phrase with its occurrence count.

    Positional matching WITHOUT a positional self-join per phrase term:
    each posting (doc, term, pos) that matches a query term at phrase
    offset qpos votes for candidate start position pos - qpos; a start
    where the vote count equals the phrase length has every offset in
    place — one aggregation replaces an (L-1)-way self-join, and L never
    appears in the plan shape (phrases of any length are the same two
    aggregates). Within one start, each query row can match at most one
    posting (pos = start + qpos), so the count cannot overcount — repeated
    terms in a phrase are handled exactly.

    Scale shape: postings are filtered against the BROADCAST phrase
    vocabulary immediately after the explode, so only matching postings
    shuffle, keyed by (query_id, doc_id, start) scalars; both aggregations
    partial map-side; text never leaves the scan."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(tokenize()).alias("pos", "term")
    )
    qdf = spark.createDataFrame(
        list(_PHRASES), "query_id int, qterm string, qpos int"
    )
    qlen = qdf.groupBy("query_id").agg(F.count("*").alias("L"))
    m = (
        tok.join(F.broadcast(qdf), tok.term == qdf.qterm)
        .groupBy("query_id", "doc_id", (F.col("pos") - F.col("qpos")).alias("start_pos"))
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        m.join(F.broadcast(qlen), "query_id")
        .filter(F.col("n_hit") == F.col("L"))
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("n_occurrences"))
    )


@register(
    "llm_phrase_indexed",
    oracle=_PHRASE_ORACLE,
    tags=("llm", "retrieval", "index"),
)
def llm_phrase_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The phrase workload served from the persisted positional index
    (streaming/text_index.py::phrase_query_index) — carrying the batch
    operator's oracle verbatim hash-gates the positional round-trip
    (posexplode at ingest, sorted offset arrays on disk, explode +
    offset-voting at query) cross-engine, exactly as llm_bm25_indexed
    does for the tf payload."""
    from ..streaming.text_index import phrase_query_index

    return phrase_query_index(spark, _ensure_index(spark, sf_dir), list(_PHRASES))


# Proximity workload: (query_id, term_a, term_b) pairs from the fixture
# vocabulary; _PROX_W is the "near" window in token positions.
_PROX_PAIRS: tuple[tuple[int, str, str], ...] = (
    (0, "join", "hash"),
    (1, "stream", "window"),
    (2, "customer", "filter"),
)
_PROX_W = 5

_PROX_SQL = ", ".join(f"({q}, '{a}', '{b}')" for q, a, b in _PROX_PAIRS)

_PROX_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, {{tok}} AS tk FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(tk) AS term, unnest(range(len(tk))) AS pos
      FROM toks
    ),
    q(query_id, term_a, term_b) AS (VALUES {_PROX_SQL}),
    pa AS (
      SELECT q.query_id, tok.doc_id, tok.pos
      FROM q JOIN tok ON tok.term = q.term_a
    ),
    pb AS (
      SELECT q.query_id, tok.doc_id, tok.pos
      FROM q JOIN tok ON tok.term = q.term_b
    )
    SELECT pa.query_id, pa.doc_id,
           CAST(min(abs(pa.pos - pb.pos)) AS BIGINT) AS min_dist,
           CAST(sum(CASE WHEN abs(pa.pos - pb.pos) <= {_PROX_W} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_near_pairs
    FROM pa JOIN pb ON pa.query_id = pb.query_id AND pa.doc_id = pb.doc_id
    GROUP BY pa.query_id, pa.doc_id
    """.replace("{tok}", _TOKENIZE)


@register(
    "llm_term_proximity",
    oracle=_PROX_ORACLE,
    tags=("llm", "retrieval", "text"),
)
def llm_term_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-pair proximity search — the relevance signal between
    bag-of-words BM25 and exact phrase match (collocation mining, quote
    detection, 'these terms discussed TOGETHER' filters): for each
    (term_a, term_b) query, every document containing BOTH terms with
    the minimum token distance between any occurrence pair and the count
    of occurrence pairs within a {w}-token window.

    Scale shape: the token stream is filtered against the BROADCAST
    query vocabulary immediately after the explode (only postings whose
    term occurs in some pair survive — same skeleton as BM25/phrase);
    the positional pairing is a (query_id, doc_id)-keyed join of the two
    surviving position relations, so its per-group size is tf_a x tf_b
    within one document — bounded by document length, never corpus-sized
    — and everything that shuffles is (query_id, doc_id, pos) scalars."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.posexplode(tokenize()).alias("pos", "term"))
    qdf = spark.createDataFrame(
        list(_PROX_PAIRS), "query_id int, term_a string, term_b string"
    )
    pa = tok.join(
        F.broadcast(qdf.select("query_id", "term_a")),
        tok.term == F.col("term_a"),
    ).select("query_id", "doc_id", "pos")
    pb = tok.join(
        F.broadcast(qdf.select("query_id", "term_b")),
        tok.term == F.col("term_b"),
    ).select("query_id", "doc_id", F.col("pos").alias("pos_b"))
    dist = F.abs(F.col("pos") - F.col("pos_b"))
    return (
        pa.join(pb, ["query_id", "doc_id"])
        .groupBy("query_id", "doc_id")
        .agg(
            F.min(dist).alias("min_dist"),
            F.sum(F.when(dist <= _PROX_W, 1).otherwise(0)).alias("n_near_pairs"),
        )
    )


llm_term_proximity.__doc__ = llm_term_proximity.__doc__.format(w=_PROX_W)


@register(
    "llm_proximity_indexed",
    oracle=_PROX_ORACLE,
    tags=("llm", "retrieval", "index"),
)
def llm_proximity_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The proximity workload served from the persisted positional index
    (streaming/text_index.py::proximity_query_index) — carrying the
    batch operator's oracle verbatim hash-gates the positional
    round-trip for the pairing algebra exactly as llm_phrase_indexed
    does for offset voting."""
    from ..streaming.text_index import proximity_query_index

    return proximity_query_index(
        spark, _ensure_index(spark, sf_dir), list(_PROX_PAIRS), window=_PROX_W
    )


# PRF expansion: take the top-_PRF_M co-occurring terms from each query's
# top-k documents, weight them _PRF_WEIGHT vs 1.0 for original terms.
_PRF_M = 3
_PRF_WEIGHT = 0.5

_PRF_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENIZE} AS tk FROM documents
    ),
    dl AS (SELECT doc_id, len(tk)::DOUBLE AS dl FROM toks),
    stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
    tok AS (SELECT doc_id, unnest(tk) AS term FROM toks),
    q(query_id, term) AS (VALUES {_QUERIES_SQL}),
    qt AS (SELECT DISTINCT term FROM q),
    tf0 AS (
      SELECT doc_id, term, count(*)::DOUBLE AS tf
      FROM tok JOIN qt USING (term) GROUP BY doc_id, term
    ),
    dft0 AS (SELECT term, count(*)::DOUBLE AS df FROM tf0 GROUP BY term),
    scored0 AS (
      SELECT q.query_id, tf0.doc_id,
             sum(ln(1 + (s.n - dft0.df + 0.5) / (dft0.df + 0.5))
                 * tf0.tf * ({_K1} + 1)
                 / (tf0.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / s.avgdl))) AS score
      FROM q
      JOIN tf0 ON tf0.term = q.term
      JOIN dft0 ON dft0.term = q.term
      JOIN dl ON dl.doc_id = tf0.doc_id
      CROSS JOIN stats s
      GROUP BY q.query_id, tf0.doc_id
    ),
    top0 AS (
      SELECT query_id, doc_id FROM (
        SELECT query_id, doc_id,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY round(score, 6) DESC, doc_id) AS rn
        FROM scored0
      ) WHERE rn <= {_TOP_K}
    ),
    cand AS (
      SELECT t.query_id, tok.term, count(*) AS ctf
      FROM tok JOIN top0 t ON tok.doc_id = t.doc_id
      GROUP BY t.query_id, tok.term
    ),
    cand2 AS (
      SELECT c.query_id, c.term, c.ctf
      FROM cand c LEFT JOIN q ON q.query_id = c.query_id AND q.term = c.term
      WHERE q.term IS NULL
    ),
    exp AS (
      SELECT query_id, term, {_PRF_WEIGHT} AS w FROM (
        SELECT query_id, term,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY ctf DESC, term) AS rn
        FROM cand2
      ) WHERE rn <= {_PRF_M}
    ),
    qw AS (
      SELECT query_id, term, 1.0 AS w FROM q
      UNION ALL SELECT query_id, term, w FROM exp
    ),
    qt2 AS (SELECT DISTINCT term FROM qw),
    tf AS (
      SELECT doc_id, term, count(*)::DOUBLE AS tf
      FROM tok JOIN qt2 USING (term) GROUP BY doc_id, term
    ),
    dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
    scored AS (
      SELECT qw.query_id, tf.doc_id,
             sum(qw.w * ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
                 * tf.tf * ({_K1} + 1)
                 / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / s.avgdl))) AS score
      FROM qw
      JOIN tf ON tf.term = qw.term
      JOIN dft ON dft.term = qw.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY qw.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, score, rn FROM (
      SELECT query_id, doc_id, round(score, 6) AS score,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(score, 6) DESC, doc_id) AS rn
      FROM scored
    )
    WHERE rn <= {_TOP_K}
    """


@register(
    "llm_bm25_prf",
    oracle=_PRF_ORACLE,
    tags=("llm", "retrieval", "text"),
)
def llm_bm25_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (Rocchio-style query
    expansion): run the base BM25 workload, mine each query's top-{k}
    documents for their top-{m} co-occurring terms (by term frequency in
    those docs, excluding the query's own terms, alphabetical
    tie-break), then RESCORE the corpus against the expanded weighted
    query — original terms weight 1.0, expansion terms {w}. The classic
    recall-widening step between one-shot keyword search and semantic
    retrieval, here as a fully deterministic two-stage DataFrame
    composition with an exact cross-engine oracle (every stage ranks on
    round-6 grids with total-order tie-breaks, so the expansion term
    SET — not just scores — is hash-stable).

    Scale shape: both stages keep the BM25 skeleton's properties — every
    corpus-wide aggregation is filtered against a broadcast vocabulary
    before anything shuffles (stage 2's vocabulary is queries x
    ({m}+terms) rows — computed, small, broadcast); the expansion mining
    joins the token stream against the broadcast top-k doc set (queries
    x {k} rows), so only those documents' tokens ever aggregate; every
    shuffle carries scalars. The corpus is TOKENIZED EXACTLY ONCE: the
    (doc_id, token-array) relation is lazily localCheckpointed and all
    five consumers (doc lengths, both stages' postings, the mining pass)
    read the materialized RDD — without it, the rescore pass re-ran the
    scan+regex+explode per branch (the llm_bigram_perplexity fix
    pattern; executed-plan-pinned to zero FileScans in
    tests/test_plans.py). The checkpoint holds the tokenized corpus in
    executor-local storage — the one-shot batch form's price; a serving
    deployment pays that tokenize once into the persisted inverted index
    instead (llm_bm25_indexed)."""
    d = load(spark, sf_dir, "documents")
    chk = d.select("doc_id", tokenize().alias("tk")).localCheckpoint(
        eager=False
    )
    dl = chk.select("doc_id", F.size("tk").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    tok = chk.select("doc_id", F.explode("tk").alias("term"))
    qdf = spark.createDataFrame(list(_QUERIES), "query_id int, term string")

    # Stage 1 inline (identical arithmetic to llm_bm25_topk, fed from the
    # shared checkpoint instead of its own scan).
    qt1 = qdf.select("term").distinct()
    tf1 = (
        tok.join(F.broadcast(qt1), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dft1 = tf1.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    contrib1 = bm25_contribution(
        F.col("tf"), F.col("df"), F.col("n"), F.col("dl"), F.col("avgdl")
    )
    scored1 = (
        tf1.join(F.broadcast(dft1), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib1), 6).alias("score"))
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    base = (
        scored1.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "doc_id")
    )
    cand = (
        tok.join(F.broadcast(base), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("ctf"))
        .join(qdf, ["query_id", "term"], "left_anti")
    )
    wexp = Window.partitionBy("query_id").orderBy(
        F.col("ctf").desc(), F.col("term")
    )
    exp = (
        cand.withColumn("rn", F.row_number().over(wexp))
        .filter(F.col("rn") <= _PRF_M)
        .select("query_id", "term", F.lit(_PRF_WEIGHT).alias("w"))
    )
    qw = qdf.select("query_id", "term", F.lit(1.0).alias("w")).unionByName(exp)
    qterms = qw.select("term").distinct()

    tf = (
        tok.join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    contrib = bm25_contribution(
        F.col("tf"), F.col("df"), F.col("n"), F.col("dl"), F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qw), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(F.col("w") * contrib), 6).alias("score"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "doc_id", "score", "rn")
    )


llm_bm25_prf.__doc__ = llm_bm25_prf.__doc__.format(
    k=_TOP_K, m=_PRF_M, w=_PRF_WEIGHT
)


_CHUNK_BM25_ORACLE = """
    WITH ws_t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents
    ),
    built AS (
      SELECT doc_id,
             [{'cid': i - 1,
               'txt': array_to_string(ws[(i-1)*{STRIDE} + 1 :
                                         (i-1)*{STRIDE} + {SIZE}], ' ')}
              for i in range(1, CAST(ceil(greatest(len(ws) - {SIZE}, 0)
                                          / {STRIDE}.0) AS BIGINT) + 2)] AS chunks
      FROM ws_t WHERE len(ws) > 0
    ),
    chunk AS (
      SELECT doc_id, CAST(c['cid'] AS INT) AS chunk_id,
             regexp_extract_all(lower(c['txt']), '{TOKRE}', 0) AS tk
      FROM (SELECT doc_id, unnest(chunks) AS c FROM built)
    ),
    dl AS (SELECT doc_id, chunk_id, len(tk)::DOUBLE AS dl FROM chunk),
    stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
    tok AS (
      SELECT doc_id, chunk_id, unnest(tk) AS term FROM chunk
    ),
    q(query_id, term) AS (VALUES {QSQL}),
    qt AS (SELECT DISTINCT term FROM q),
    tf AS (
      SELECT doc_id, chunk_id, term, count(*)::DOUBLE AS tf
      FROM tok JOIN qt USING (term) GROUP BY doc_id, chunk_id, term
    ),
    dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
    scored AS (
      SELECT q.query_id, tf.doc_id, tf.chunk_id,
             round(sum(ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
                 * tf.tf * ({K1} + 1)
                 / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl))), 6) AS score
      FROM q
      JOIN tf ON tf.term = q.term
      JOIN dft ON dft.term = q.term
      JOIN dl ON dl.doc_id = tf.doc_id AND dl.chunk_id = tf.chunk_id
      CROSS JOIN stats s
      GROUP BY q.query_id, tf.doc_id, tf.chunk_id
    ),
    best AS (
      SELECT query_id, doc_id, chunk_id, score,
             row_number() OVER (
               PARTITION BY query_id, doc_id
               ORDER BY score DESC, chunk_id) AS crn
      FROM scored
    )
    SELECT query_id, doc_id, chunk_id, score, rn FROM (
      SELECT query_id, doc_id, chunk_id, score,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
      FROM best WHERE crn = 1
    )
    WHERE rn <= {TOPK}
    """


@register(
    "llm_bm25_chunks",
    oracle=_CHUNK_BM25_ORACLE.replace("{STRIDE}", "24")
    .replace("{SIZE}", "32")
    .replace("{TOKRE}", _TOKEN_RE)
    .replace("{QSQL}", _QUERIES_SQL)
    .replace("{K1}", str(_K1))
    .replace("{B}", str(_B))
    .replace("{TOPK}", str(_TOP_K)),
    tags=("llm", "retrieval", "text"),
)
def llm_bm25_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document retrieval: BM25 at CHUNK granularity with per-doc
    max-pooling — the standard answer to length-normalization washing
    out a long document's one relevant passage (score every
    32-word/24-stride window from `llm_chunk_docs` as its own retrieval
    unit, then a document scores as its best chunk and reports WHICH
    chunk won, so the caller can jump straight to the passage). Chunk
    scores are round-6 BEFORE the per-doc argmax, so best-chunk
    selection (chunk_id tie-break) and the final doc ranking (doc_id
    tie-break) are total orders — hash-stable cross-engine.

    Scale shape: chunking is scan-side (zero shuffle, llm_chunk_docs);
    the BM25 skeleton is unchanged — postings filtered against the
    broadcast query vocabulary before any aggregation, all shuffles
    carry (doc, chunk, term, count) scalars, both rank windows get
    WindowGroupLimit partial top-k."""
    from .text_analysis import llm_chunk_docs

    chunks = llm_chunk_docs(spark, sf_dir).select(
        "doc_id", "chunk_id", F.col("chunk_text").alias("text")
    )
    toks = tokenize()
    dl = chunks.select(
        "doc_id", "chunk_id", F.size(toks).cast("double").alias("dl")
    )
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    qdf = spark.createDataFrame(list(_QUERIES), "query_id int, term string")
    qterms = qdf.select("term").distinct()
    tok = chunks.select("doc_id", "chunk_id", F.explode(toks).alias("term"))
    tf = (
        tok.join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "chunk_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    contrib = bm25_contribution(
        F.col("tf"), F.col("df"), F.col("n"), F.col("dl"), F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(dft), "term")
        .join(dl, ["doc_id", "chunk_id"])
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id", "chunk_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    wc = Window.partitionBy("query_id", "doc_id").orderBy(
        F.col("score").desc(), F.col("chunk_id")
    )
    wd = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("crn", F.row_number().over(wc))
        .filter(F.col("crn") == 1)
        .drop("crn")
        .withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "doc_id", "chunk_id", "score", "rn")
    )

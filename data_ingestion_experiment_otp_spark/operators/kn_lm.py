"""Trained interpolated Kneser-Ney 4-gram LM, served from a committed
artifact store (VERDICT r12 "what's missing" #3).

The r12 trigram artifact proved the train/store/serve loop with
Jelinek-Mercer interpolation; the published CCNet scorer is a KenLM with
ABSOLUTE-DISCOUNT (Kneser-Ney) smoothing at order 5. Discounting is
rational arithmetic — max(c - D, 0)/total plus a discount-mass backoff
weight — so the full CTE-replay oracle pattern applies unchanged, and an
order-4 witness exercises what order 3 cannot: the pruned-artifact bound
doing its job where the n-gram tail actually explodes (singleton 4-grams
dominate any corpus), plus the continuation-count recursion that makes
KN differ from every maximum-likelihood interpolation.

Model definition (deterministic, SQL-replayable; D = 0.75 exact binary):
- token stream: the shared corpus tokenizer (retrieval.py); per position,
  (a, b, c, w) = (three-back, two-back, previous, word), NULL where the
  doc starts (no cross-doc context, the trigram model's convention).
- level-4 counts c4(a,b,c,w): corpus counts over positions with FULL
  context. Lower levels are CONTINUATION counts derived from the level
  above (the Kneser-Ney recursion — "how many distinct contexts precede
  this n-gram", not "how often does it occur"):
    n3(b,c,w) = |{a : c4(a,b,c,w) > 0}|
    n2(c,w)   = |{b : n3(b,c,w) > 0}|
    n1(w)     = |{c : n2(c,w) > 0}|
  A word that is frequent but only ever follows ONE context (the
  "francisco" example) gets a LOW unigram continuation probability —
  exactly where KN and any ML-ratio interpolation disagree (pinned on a
  planted corpus in tests/test_kn_lm.py).
- totals per context: t_k = sum of the level's counts over the context,
  d_k = number of distinct continuations (the discount-mass multiplier).
- PRUNING (the KenLM --prune analog, what bounds the artifact at
  100 TB): level-4/3/2 rows with count < _KN_PRUNE_MIN are dropped from
  the store; context totals are kept only for contexts with >= 1
  surviving row. A pruned row contributes 0 to the discounted term;
  a fully-pruned context backs off entirely (p_k := p_{k-1}) — the
  model's deliberate compression loss, mirrored exactly in the oracle.
- scoring (interpolated absolute discounting; null context folds down,
  so doc-initial positions and unseen contexts share one rule):
    p1(w) = [max(n1(w)-D, 0) + D*W1/V] / T1    (T1=0 -> uniform 1/V)
    p_k(w|ctx) = max(cnt-D, 0)/t_k + (D*d_k/t_k) * p_{k-1}   if ctx stored
                 p_{k-1}                                      otherwise
  W1 = |{w : n1(w) > 0}|, V = vocabulary size (all positions), so every
  token of the corpus scores > 0 even if it never occurs as a
  continuation (a word seen only doc-initially has n1 = 0).
- per doc: avg_bits = sum(n * -log2 p) / dl on the round-6 grid — the
  `_ppl_scores` output shape, swap-compatible with every consumer of
  the unigram/trigram scorers.

Scale shape: training is one scan -> (a,b,c,w) count aggregation
(map-side partials; the count relation is orders of magnitude smaller
than the token stream); every lower level derives from the level above
by a further aggregation, never a corpus re-scan (the three checkpoints
pin that — the r6 multi-branch lesson). Serving is one scan -> per-doc
quad counts, then joins keyed by term scalars against the stored model
tables (AQE broadcasts the pruned, vocabulary-bounded model); tokens
shuffle, never text.

Reference parity: generalizes the reference's parse-then-score hot path
(`api/main.py:202-241`) to the trained-model scoring tier the
training-data mandate names (CCNet / Wenzek et al. 2020; Kneser & Ney
1995; Chen & Goodman 1998).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.catalog import load
from .retrieval import _TOKENIZE as _KN_TOKENIZE, tokenize as _tokenize

# Absolute discount: 3/4 is exact in binary, so both engines parse the
# identical double from the same literal rendering.
_KN_D = 0.75

# Count-pruning floor (level 4/3/2 rows below it leave the store).
_KN_PRUNE_MIN = 2

_KN_SCHEMA = "kind string, a string, b string, c string, w string, n long"

# The shared model-derivation CTE chain, spliced verbatim into the
# oracle: positional quads (1-based DuckDB indexing with pos guards —
# DuckDB wraps NEGATIVE list indexes Python-style), per-doc quad counts,
# the level-4 corpus counts, the continuation-count recursion, pruning,
# and the kept context totals.
_KN_MODEL_CTES = f"""
    toks AS (
      SELECT doc_id, lang, {_KN_TOKENIZE} AS tk FROM documents
    ),
    pos_tok AS (
      SELECT doc_id, lang, tk, unnest(tk) AS w, unnest(range(len(tk))) AS pos
      FROM toks
    ),
    quad AS (
      SELECT doc_id, lang, w, tk[pos] AS c,
             CASE WHEN pos >= 2 THEN tk[pos - 1] END AS b,
             CASE WHEN pos >= 3 THEN tk[pos - 2] END AS a
      FROM pos_tok
    ),
    pf AS (
      SELECT doc_id, lang, a, b, c, w, count(*)::DOUBLE AS n
      FROM quad GROUP BY doc_id, lang, a, b, c, w
    ),
    c4a AS (
      SELECT a, b, c, w, sum(n) AS n FROM pf
      WHERE a IS NOT NULL GROUP BY a, b, c, w
    ),
    g4 AS (SELECT * FROM c4a WHERE n >= {_KN_PRUNE_MIN}),
    t4a AS (
      SELECT a, b, c, sum(n) AS t4, count(*)::DOUBLE AS d4
      FROM c4a GROUP BY a, b, c
    ),
    t4 AS (
      SELECT t.* FROM t4a t
      WHERE EXISTS (SELECT 1 FROM g4 WHERE g4.a = t.a AND g4.b = t.b AND g4.c = t.c)
    ),
    n3a AS (SELECT b, c, w, count(*)::DOUBLE AS n FROM c4a GROUP BY b, c, w),
    g3 AS (SELECT * FROM n3a WHERE n >= {_KN_PRUNE_MIN}),
    t3a AS (
      SELECT b, c, sum(n) AS t3, count(*)::DOUBLE AS d3
      FROM n3a GROUP BY b, c
    ),
    t3 AS (
      SELECT t.* FROM t3a t
      WHERE EXISTS (SELECT 1 FROM g3 WHERE g3.b = t.b AND g3.c = t.c)
    ),
    n2a AS (SELECT c, w, count(*)::DOUBLE AS n FROM n3a GROUP BY c, w),
    g2 AS (SELECT * FROM n2a WHERE n >= {_KN_PRUNE_MIN}),
    t2a AS (
      SELECT c, sum(n) AS t2, count(*)::DOUBLE AS d2 FROM n2a GROUP BY c
    ),
    t2 AS (
      SELECT t.* FROM t2a t
      WHERE EXISTS (SELECT 1 FROM g2 WHERE g2.c = t.c)
    ),
    n1 AS (SELECT w, count(*)::DOUBLE AS n FROM n2a GROUP BY w),
    kmeta AS (
      SELECT (SELECT coalesce(sum(n), 0) FROM n1) AS t1,
             (SELECT count(*)::DOUBLE FROM n1) AS w1,
             (SELECT count(DISTINCT w)::DOUBLE FROM pf) AS v
    ),
    j AS (
      SELECT pf.doc_id, pf.lang, pf.n,
             g4.n AS c4, t4.t4, t4.d4, g3.n AS n3, t3.t3, t3.d3,
             g2.n AS n2, t2.t2, t2.d2, n1.n AS n1,
             kmeta.t1, kmeta.w1, kmeta.v
      FROM pf
      LEFT JOIN g4 ON g4.a = pf.a AND g4.b = pf.b AND g4.c = pf.c AND g4.w = pf.w
      LEFT JOIN t4 ON t4.a = pf.a AND t4.b = pf.b AND t4.c = pf.c
      LEFT JOIN g3 ON g3.b = pf.b AND g3.c = pf.c AND g3.w = pf.w
      LEFT JOIN t3 ON t3.b = pf.b AND t3.c = pf.c
      LEFT JOIN g2 ON g2.c = pf.c AND g2.w = pf.w
      LEFT JOIN t2 ON t2.c = pf.c
      LEFT JOIN n1 ON n1.w = pf.w
      CROSS JOIN kmeta
    ),
    s1 AS (
      SELECT *, CASE WHEN t1 > 0 THEN
                  (greatest(coalesce(n1, 0) - {_KN_D!r}, 0) + {_KN_D!r} * w1 / v) / t1
                ELSE 1.0 / v END AS p1
      FROM j
    ),
    s2 AS (
      SELECT *, CASE WHEN t2 IS NOT NULL THEN
                  greatest(coalesce(n2, 0) - {_KN_D!r}, 0) / t2
                  + {_KN_D!r} * d2 / t2 * p1
                ELSE p1 END AS p2
      FROM s1
    ),
    s3 AS (
      SELECT *, CASE WHEN t3 IS NOT NULL THEN
                  greatest(coalesce(n3, 0) - {_KN_D!r}, 0) / t3
                  + {_KN_D!r} * d3 / t3 * p2
                ELSE p2 END AS p3
      FROM s2
    ),
    scored AS (
      SELECT doc_id, lang, n,
             CASE WHEN t4 IS NOT NULL THEN
               greatest(coalesce(c4, 0) - {_KN_D!r}, 0) / t4
               + {_KN_D!r} * d4 / t4 * p3
             ELSE p3 END AS p
      FROM s3
    )
"""

_KN4_PPL_ORACLE = f"""
    WITH {_KN_MODEL_CTES}
    SELECT doc_id, CAST(sum(n) AS BIGINT) AS dl,
           round(sum(n * -(ln(p) / ln(2))) / sum(n), 6) AS avg_bits
    FROM scored GROUP BY doc_id
    """


def _doc_quads(d: DataFrame, with_lang: bool = False) -> DataFrame:
    """(doc_id[, lang], a, b, c, w) per token position — `get()` for the
    context lookbacks (0-based, NULL out of range; the Spark twin of the
    oracle's guarded 1-based indexing)."""
    cols = ["doc_id", "lang"] if with_lang else ["doc_id"]
    return (
        d.select(*cols, _tokenize().alias("tk"))
        .select(*cols, "tk", F.posexplode("tk").alias("pos", "w"))
        .select(
            *cols,
            F.expr("get(tk, pos - 3)").alias("a"),
            F.expr("get(tk, pos - 2)").alias("b"),
            F.expr("get(tk, pos - 1)").alias("c"),
            "w",
        )
    )


def _kn_store_key(sf_dir: str, sig: str) -> str:
    import hashlib
    import os

    raw = (
        f"kn4lm1|{os.path.abspath(sf_dir)}|{sig}|{_KN_PRUNE_MIN}|{_KN_D!r}"
    )
    return hashlib.sha256(raw.encode()).hexdigest()[:20]


def _tag(df: DataFrame, kind: str, cols: dict) -> DataFrame:
    """Render a model relation into the uniform store schema, padding the
    unused key slots with typed NULLs."""
    sel = [F.lit(kind).alias("kind")]
    for name in ("a", "b", "c", "w"):
        sel.append(
            F.col(cols[name]).alias(name)
            if name in cols
            else F.lit(None).cast("string").alias(name)
        )
    sel.append(F.col(cols["n"]).cast("long").alias("n"))
    return df.select(*sel)


def kn4_model_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-if-absent and return the committed KN-4 artifact directory
    for this corpus (the BPE/PCA/trigram store pattern): the count
    recursion runs at most once per (corpus signature, prune floor,
    discount); every later call reads the pruned parquet model.
    Training is deterministic (integer corpus counts), so a concurrent
    builder's committed generation is equivalent and the rename race
    keeps whichever landed first."""
    import os
    import shutil

    from .bpe import _build_root, _sweep_stale_builds, corpus_signature

    sig = corpus_signature(sf_dir, "documents")
    root = _build_root("spark_graft_kn4_store", sig)
    final = os.path.join(root, _kn_store_key(sf_dir, sig))
    if not os.path.isfile(os.path.join(final, "_COMMITTED")):
        _sweep_stale_builds(root)
        tmp = f"{final}.build{os.getpid()}"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        quads = _doc_quads(load(spark, sf_dir, "documents"))
        # Each level feeds its pruned table, its totals, AND the next
        # level down — without the checkpoints every branch would rescan
        # and re-aggregate the token stream (the r6 lesson the trigram
        # trainer applies; here the chain is one level deeper). All
        # checkpointed relations are compact count tables.
        pf = (
            quads.groupBy("a", "b", "c", "w")
            .agg(F.count("*").alias("n"))
            .localCheckpoint(eager=False)
        )
        c4a = (
            pf.filter(F.col("a").isNotNull())
            .groupBy("a", "b", "c", "w")
            .agg(F.sum("n").alias("n"))
            .localCheckpoint(eager=False)
        )
        n3a = (
            c4a.groupBy("b", "c", "w")
            .agg(F.count("*").alias("n"))
            .localCheckpoint(eager=False)
        )
        n2a = (
            n3a.groupBy("c", "w")
            .agg(F.count("*").alias("n"))
            .localCheckpoint(eager=False)
        )
        n1 = n2a.groupBy("w").agg(F.count("*").alias("n")).localCheckpoint(
            eager=False
        )

        def kept_totals(alln, keys, kind_t, kind_d):
            surv = (
                alln.filter(F.col("n") >= _KN_PRUNE_MIN)
                .select(*keys)
                .distinct()
            )
            tot = (
                alln.groupBy(*keys)
                .agg(F.sum("n").alias("t"), F.count("*").alias("d"))
                .join(surv, list(keys), "left_semi")
                .localCheckpoint(eager=False)  # t + d both read it
            )
            key_map = dict(zip(keys, keys))
            return (
                _tag(tot, kind_t, {**key_map, "n": "t"}),
                _tag(tot, kind_d, {**key_map, "n": "d"}),
            )

        g4 = _tag(
            c4a.filter(F.col("n") >= _KN_PRUNE_MIN),
            "g4",
            {"a": "a", "b": "b", "c": "c", "w": "w", "n": "n"},
        )
        t4, d4 = kept_totals(c4a, ("a", "b", "c"), "t4", "d4")
        g3 = _tag(
            n3a.filter(F.col("n") >= _KN_PRUNE_MIN),
            "g3",
            {"b": "b", "c": "c", "w": "w", "n": "n"},
        )
        t3, d3 = kept_totals(n3a, ("b", "c"), "t3", "d3")
        g2 = _tag(
            n2a.filter(F.col("n") >= _KN_PRUNE_MIN),
            "g2",
            {"c": "c", "w": "w", "n": "n"},
        )
        t2, d2 = kept_totals(n2a, ("c",), "t2", "d2")
        g1 = _tag(n1, "g1", {"w": "w", "n": "n"})
        t1 = _tag(
            n1.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n")), "t1", {"n": "n"}
        )
        w1 = _tag(n1.agg(F.count("*").alias("n")), "w1", {"n": "n"})
        v = _tag(pf.agg(F.countDistinct("w").alias("n")), "v", {"n": "n"})
        model = g4
        for part in (t4, d4, g3, t3, d3, g2, t2, d2, g1, t1, w1, v):
            model = model.unionByName(part)
        model.write.parquet(os.path.join(tmp, "model.parquet"))
        open(os.path.join(tmp, "_COMMITTED"), "w").close()
        try:
            os.rename(tmp, final)
        except OSError:
            if os.path.isfile(os.path.join(final, "_COMMITTED")):
                shutil.rmtree(tmp)
            else:
                raise
    return final


def load_kn_tables(spark: SparkSession, model_dir: str) -> dict:
    """The committed store's model tables as named DataFrames — the
    serving-join inputs `score_with_stored_kn` consumes (the trigram
    `load_lm_tables` contract at order 4)."""
    import os

    m = spark.read.schema(_KN_SCHEMA).parquet(
        os.path.join(model_dir, "model.parquet")
    )

    def part(kind, keys, val):
        return m.filter(F.col("kind") == kind).select(
            *keys, F.col("n").alias(val)
        )

    def td(kt, kd, keys):
        # The t/d twins of one level are written from the SAME kept-totals
        # relation (kn4_model_dir::kept_totals), so their key sets are
        # identical by construction — pivoting them back into ONE relation
        # costs a single aggregate over the (small, pruned) model table
        # and removes one serving-side join per level: 10 model joins
        # become 7 in `score_with_stored_kn` (r13 opt, guide §3).
        return (
            m.filter(F.col("kind").isin(kt, kd))
            .groupBy(*keys)
            .agg(
                F.max(F.when(F.col("kind") == kt, F.col("n"))).alias(kt),
                F.max(F.when(F.col("kind") == kd, F.col("n"))).alias(kd),
            )
        )

    meta = (
        m.filter(F.col("kind").isin("t1", "w1", "v"))
        .groupBy()
        .agg(
            F.max(F.when(F.col("kind") == "t1", F.col("n"))).alias("t1"),
            F.max(F.when(F.col("kind") == "w1", F.col("n"))).alias("w1"),
            F.max(F.when(F.col("kind") == "v", F.col("n"))).alias("v"),
        )
    )
    return {
        "g4": part("g4", ("a", "b", "c", "w"), "c4"),
        "td4": td("t4", "d4", ("a", "b", "c")),
        "g3": part("g3", ("b", "c", "w"), "n3"),
        "td3": td("t3", "d3", ("b", "c")),
        "g2": part("g2", ("c", "w"), "n2"),
        "td2": td("t2", "d2", ("c",)),
        "g1": part("g1", ("w",), "n1"),
        "meta": meta,
    }


def score_with_stored_kn(batch_df: DataFrame, model: dict) -> DataFrame:
    """(doc_id, lang, dl, avg_bits) for a batch of documents against
    ALREADY-LOADED KN model tables — one definition of the serving
    arithmetic (`_kn_scores` delegates here; a streaming gate could
    consume it unchanged, the `score_with_stored_lm` contract).

    The p4->p3->p2->p1 fold needs no position CASE: a doc-initial
    position's NULL context keys simply match no stored context, so the
    same unseen-context backoff rule scores it at the right level."""
    pf = (
        _doc_quads(batch_df, with_lang=True)
        .groupBy("doc_id", "lang", "a", "b", "c", "w")
        .agg(F.count("*").cast("double").alias("n"))
    )
    j = (
        pf.join(model["g4"], ["a", "b", "c", "w"], "left")
        .join(model["td4"], ["a", "b", "c"], "left")
        .join(model["g3"], ["b", "c", "w"], "left")
        .join(model["td3"], ["b", "c"], "left")
        .join(model["g2"], ["c", "w"], "left")
        .join(model["td2"], ["c"], "left")
        .join(model["g1"], ["w"], "left")
        .crossJoin(F.broadcast(model["meta"]))
    )
    D = F.lit(_KN_D)
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    p1 = F.when(
        F.col("t1") > 0,
        (
            F.greatest(F.coalesce(dbl("n1"), F.lit(0.0)) - D, F.lit(0.0))
            + D * dbl("w1") / dbl("v")
        )
        / dbl("t1"),
    ).otherwise(F.lit(1.0) / dbl("v"))
    p2 = F.when(
        F.col("t2").isNotNull(),
        F.greatest(F.coalesce(dbl("n2"), F.lit(0.0)) - D, F.lit(0.0)) / dbl("t2")
        + D * dbl("d2") / dbl("t2") * p1,
    ).otherwise(p1)
    p3 = F.when(
        F.col("t3").isNotNull(),
        F.greatest(F.coalesce(dbl("n3"), F.lit(0.0)) - D, F.lit(0.0)) / dbl("t3")
        + D * dbl("d3") / dbl("t3") * p2,
    ).otherwise(p2)
    p4 = F.when(
        F.col("t4").isNotNull(),
        F.greatest(F.coalesce(dbl("c4"), F.lit(0.0)) - D, F.lit(0.0)) / dbl("t4")
        + D * dbl("d4") / dbl("t4") * p3,
    ).otherwise(p3)
    return (
        j.withColumn("bits", F.col("n") * -(F.log(p4) / F.log(F.lit(2.0))))
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("n").cast("long").alias("dl"),
            F.round(F.sum("bits") / F.sum("n"), 6).alias("avg_bits"),
        )
    )


def _kn_scores(
    spark: SparkSession, sf_dir: str, by_lang: bool = False
) -> DataFrame:
    model = load_kn_tables(spark, kn4_model_dir(spark, sf_dir))
    r = score_with_stored_kn(load(spark, sf_dir, "documents"), model)
    return r if by_lang else r.select("doc_id", "dl", "avg_bits")


def kn_gate_calibration(spark: SparkSession, sf_dir: str) -> dict:
    """Calibrate-once inputs for the stage-11 streaming quality gate
    SERVED BY THE KN-4 ARTIFACT (`ppl_gate_sink` dispatches on
    model_kind — the 'identical plumbing, swap the model in' claim
    executed at ingest for the third artifact): the committed KN store
    path plus per-language tail cuts from the SAME `lm_tercile_cuts`
    helper the trigram calibration and the batch approx split use (one
    cut definition across every model kind).

    One KN-specific note: the smoothed model scores EVERY token (p1 > 0
    even for words never seen as a continuation), so the trigram
    serving join's skip-OOV convention — and therefore the
    min_vocab_frac floor — is structurally moot under this kind; there
    is no unscored-garbage bypass to close."""
    from .ngram_lm import lm_tercile_cuts

    model_dir = kn4_model_dir(spark, sf_dir)
    scored = _kn_scores(spark, sf_dir, by_lang=True).localCheckpoint(
        eager=False
    )
    cuts = {
        r["lang"]: float(r["cut_mid"])
        for r in lm_tercile_cuts(scored).collect()
        if r["cut_mid"] is not None and r["lang"] is not None
    }
    g = scored.agg(
        F.percentile_approx("avg_bits", 2.0 / 3.0, 10_000).alias("cut")
    ).first()
    return {
        "model_kind": "kn4",
        "model_dir": model_dir,
        "cuts": cuts,
        "cut_global": float(g["cut"]) if g and g["cut"] is not None else float("inf"),
    }


@register(
    "llm_kn4_ccnet_buckets",
    oracle=f"""
    WITH {_KN_MODEL_CTES},
    r AS (
      SELECT doc_id, lang, CAST(sum(n) AS BIGINT) AS dl,
             round(sum(n * -(ln(p) / ln(2))) / sum(n), 6) AS avg_bits
      FROM scored GROUP BY doc_id, lang
    ),
    rk AS (
      SELECT *,
             row_number() OVER (PARTITION BY lang ORDER BY avg_bits, doc_id)
               AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM r
    )
    SELECT doc_id, lang, dl, avg_bits,
           CASE WHEN rk * 3 <= n THEN 'head'
                WHEN rk * 3 <= 2 * n THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM rk
    """,
    tags=("llm", "text", "quality", "model"),
)
def llm_kn4_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet head/middle/tail split scored by the KN-4 artifact —
    the same integer-exact per-language rank-tercile cut as
    `llm_ccnet_buckets_lm`, with the score relation swapped to the
    Kneser-Ney model (the third LM behind the one split: corpus unigram
    -> trained trigram -> trained KN-4, each a pure artifact swap — the
    plumbing claim, executed three times). Oracle splices the FULL KN
    model derivation plus the rank cut."""
    from pyspark.sql import Window as W

    r = _kn_scores(spark, sf_dir, by_lang=True)
    w = W.partitionBy("lang").orderBy("avg_bits", "doc_id")
    wn = W.partitionBy("lang")
    rk = F.row_number().over(w)
    n = F.count("*").over(wn)
    return r.select(
        "doc_id",
        "lang",
        "dl",
        "avg_bits",
        F.when(rk * 3 <= n, F.lit("head"))
        .when(rk * 3 <= 2 * n, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


@register(
    "llm_kn4_perplexity",
    oracle=_KN4_PPL_ORACLE,
    tags=("llm", "text", "quality", "model"),
)
def llm_kn4_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity (avg bits) under the TRAINED interpolated
    Kneser-Ney 4-gram LM, served from the committed artifact store — the
    smoothing family and order the published CCNet scorer actually uses,
    as exact rational arithmetic. The oracle re-derives the ENTIRE model
    from scratch in SQL — quad counts, the continuation-count recursion,
    pruning, kept context totals, discounted interpolation — so a
    parity pass proves training, the store round-trip, and the serving
    arithmetic in one gate (the trigram/BPE CTE-replay precedent). See
    the module docstring for the model definition and the 100 TB
    shape."""
    return _kn_scores(spark, sf_dir)

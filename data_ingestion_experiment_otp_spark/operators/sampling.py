"""Deterministic sampling & sharding for training-data pipelines
(engine-target, SURVEY.md §2.10 family): reproducible subset selection and
stable shard assignment are the backbone of dataset versioning at 100 TB —
`df.sample()` is seed-stable only per partitioning, so these use explicit
key-hash arithmetic that any engine reproduces bit-for-bit.

The inclusion hash is a Knuth multiplicative hash of the record key —
exact integer arithmetic expressible in both Spark and DuckDB (the oracle
requirement). A production deployment would swap in `xxhash64(key)` for
better avalanche at identical plan shape; the arithmetic hash keeps the
selection ORACLE-CHECKABLE, which engine-specific hashes cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..sources.catalog import load

# Knuth multiplicative constant; bucket = (key * A) mod 2^32.
_A = 2654435761
_MOD = 1 << 32


def _bucket(col):
    return (F.col(col) * _A) % _MOD


@register(
    "llm_sample_shard",
    oracle=f"""
    WITH strata AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars,
           (d.doc_id * {_A}) % {_MOD} < {_MOD} * 0.1 AS in_sample10,
           (d.doc_id * {_A}) % {_MOD} < {_MOD} * least(1.0, 40.0 / s.n) AS in_stratified,
           (d.doc_id * {_A}) % {_MOD} % 64 AS shard
    FROM documents d JOIN strata s ON s.lang = d.lang
    """,
    tags=("llm", "sampling", "shard"),
)
def llm_sample_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sampling & sharding (SURVEY §2.10 family) in one
    per-doc projection: the ~10% key-hash sample flag, the stratified
    flag (per-lang rate = min(1, 40/stratum), strata sizes a broadcast
    1-row-per-lang aggregate), and the stable 64-way shard assignment —
    all from the same Knuth multiplicative hash, so selection is
    reproducible on any engine, any partitioning, and stable under
    append-only growth. Single-purpose variants (llm_sample_deterministic
    / llm_sample_stratified / llm_shard_assign) remain for pytest parity."""
    d = load(spark, sf_dir, "documents")
    strata = d.groupBy("lang").agg(F.count("*").alias("n"))
    rate = F.least(F.lit(1.0), F.lit(40.0) / F.col("n"))
    return (
        d.join(F.broadcast(strata), on="lang")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            (_bucket("doc_id") < int(_MOD * 0.1)).alias("in_sample10"),
            (_bucket("doc_id") < _MOD * rate).alias("in_stratified"),
            (_bucket("doc_id") % 64).alias("shard"),
        )
    )


@register(
    "llm_sample_deterministic",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE (doc_id * {_A}) % {_MOD} < {_MOD} * 0.1
    """,
    tags=("llm", "sampling"),
)
def llm_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% reproducible sample: inclusion depends only on the key, so the
    same rows are selected on any cluster, any partitioning, any engine —
    and the sample of a superset is a superset of the sample (stable under
    incremental ingestion). The predicate pushes into the scan."""
    d = load(spark, sf_dir, "documents")
    return d.filter(_bucket("doc_id") < int(_MOD * 0.1)).select("doc_id", "lang", "n_chars")


@register(
    "llm_sample_stratified",
    oracle=f"""
    WITH strata AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN strata s ON s.lang = d.lang
    WHERE (d.doc_id * {_A}) % {_MOD} < {_MOD} * least(1.0, 40.0 / s.n)
    """,
    tags=("llm", "sampling"),
)
def llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample targeting ~40 docs per language: per-stratum rate =
    min(1, target/stratum_size), applied through the same deterministic
    key hash — rare strata are kept whole, dominant strata are downsampled,
    the class balance of the output is controlled. Stratum sizes are a
    broadcast 1-row-per-stratum aggregate; the fact side never shuffles."""
    d = load(spark, sf_dir, "documents")
    strata = d.groupBy("lang").agg(F.count("*").alias("n"))
    rate = F.least(F.lit(1.0), F.lit(40.0) / F.col("n"))
    return (
        d.join(F.broadcast(strata), on="lang")
        .filter(_bucket("doc_id") < _MOD * rate)
        .select("doc_id", "lang")
    )


@register(
    "llm_shard_assign",
    oracle=f"""
    SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS shard_chars
    FROM (SELECT n_chars, (doc_id * {_A}) % {_MOD} % 64 AS shard FROM documents)
    GROUP BY shard
    """,
    tags=("llm", "sampling", "shard"),
)
def llm_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 64-way shard assignment + per-shard volume audit: the shard of
    a document never changes as the corpus grows (append-only reprocessing
    touches only new rows). At scale this column becomes the
    `partitionBy`/`repartition` key for the materialized dataset; the audit
    aggregate is how you check balance before writing."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("n_chars", (_bucket("doc_id") % 64).alias("shard"))
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").cast("long").alias("shard_chars"))
    )


@register(
    "llm_dataset_mix",
    oracle=f"""
    WITH strata AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ),
    biggest AS (SELECT max(n) AS n_max FROM strata)
    SELECT d.doc_id, d.source,
           round(least(1.0, 0.2 * sqrt(n_max / s.n)), 9) AS mix_rate,
           (d.doc_id * {_A}) % {_MOD}
             < {_MOD} * least(1.0, 0.2 * sqrt(n_max / s.n)) AS in_mix
    FROM documents d
    JOIN strata s ON s.source = d.source
    CROSS JOIN biggest
    """,
    tags=("llm", "sampling", "mixture"),
)
def llm_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture reweighting (temperature-style, alpha = 0.5): each
    source's keep-rate is `min(1, base * sqrt(n_max / n_s))`, so dominant
    sources are downsampled toward the square-root of their share while
    rare sources are kept whole — the standard multinomial-temperature
    trick for balancing web-scale corpora. Selection goes through the
    deterministic key hash (reproducible on any engine/partitioning);
    per-source rates come from a broadcast one-row-per-source aggregate,
    so the corpus never shuffles. Every arithmetic step (bigint divide,
    sqrt, one multiply) is an IEEE correctly-rounded op — bit-identical
    across engines, safe for boundary comparisons."""
    d = load(spark, sf_dir, "documents")
    strata = d.groupBy("source").agg(F.count("*").alias("n"))
    n_max = strata.agg(F.max("n").alias("n_max"))
    rate = F.least(F.lit(1.0), F.lit(0.2) * F.sqrt(F.col("n_max") / F.col("n")))
    return (
        d.join(F.broadcast(strata), on="source")
        .crossJoin(F.broadcast(n_max))
        .select(
            "doc_id",
            "source",
            F.round(rate, 9).alias("mix_rate"),
            (_bucket("doc_id") < _MOD * rate).alias("in_mix"),
        )
    )


@register(
    "llm_dataset_manifest",
    oracle=f"""
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS shard_chars,
           CAST(sum(
             CAST(('0x' || substring(sha256(text), 1, 15)) AS BIGINT)
           ) % 9007199254740993 AS BIGINT) AS content_checksum
    FROM (SELECT text, n_chars, (doc_id * {_A}) % {_MOD} % 64 AS shard FROM documents)
    GROUP BY shard
    """,
    tags=("llm", "sampling", "manifest"),
)
def llm_dataset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset version manifest — the reproducibility contract a training
    run records before reading a shard set: per shard, the doc count,
    byte volume, and an ORDER-INSENSITIVE content checksum (exact sum of
    60-bit sha256 prefixes reduced mod 2^53+1), so any later re-read —
    different partitioning, different engine — can verify it is
    consuming byte-identical content. Order-insensitivity matters:
    shuffle/split order is not reproducible at scale, content is. The
    checksum arithmetic is pure SQL in both engines, so the manifest
    itself is hash-verified cross-engine. The sum runs in decimal(38,0)
    (DuckDB: HUGEINT) because a shard of more than ~16 docs overflows a
    64-bit sum of 60-bit prefixes; only the reduced residue is cast back
    to long."""
    d = load(spark, sf_dir, "documents")
    prefix60 = F.conv(F.substring(F.sha2("text", 256), 1, 15), 16, 10).cast("long")
    return (
        d.select(
            "text",
            "n_chars",
            (_bucket("doc_id") % 64).alias("shard"),
            prefix60.alias("h"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("shard_chars"),
            (F.sum(F.col("h").cast("decimal(38,0)")) % F.lit(9007199254740993))
            .cast("long")
            .alias("content_checksum"),
        )
    )


from .dedup import _NGRAM_JACCARD_ORACLE  # noqa: E402  (no import cycle: dedup imports only registry/catalog)

_LEAKAGE_ORACLE = f"""
    WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_ORACLE}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
    ),
    clusters AS (
      SELECT u AS doc_id, least(u, min(v)) AS cluster_id
      FROM reach GROUP BY u
    )
    SELECT d.doc_id,
           coalesce(c.cluster_id, d.doc_id) AS rep_id,
           CASE WHEN (coalesce(c.cluster_id, d.doc_id) * {_A}) % {_MOD}
                     < {_MOD} * 0.1
                THEN 'val' ELSE 'train' END AS split
    FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
    """


@register(
    "llm_leakage_safe_split",
    oracle=_LEAKAGE_ORACLE,
    tags=("llm", "sampling", "dedup"),
)
def llm_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val split that CANNOT leak near-duplicates across the
    boundary — the splitting mistake that quietly inflates eval numbers:
    splitting on doc_id puts a document in train and its near-copy in
    val. Here the split key is the document's near-dup CLUSTER
    representative (its connected-component min label from
    llm_dedup_clusters; singletons represent themselves), so an entire
    near-dup component lands on one side by construction — the same
    group-aware discipline as GroupKFold, keyed by content similarity.

    The inclusion hash is the module's Knuth multiplicative arithmetic on
    the representative id (engine-reproducible, hence the exact oracle —
    which recomputes the clusters with the recursive-CTE fixpoint and
    must agree bit-for-bit on every assignment).

    Scale shape: the pair graph + CC loop are llm_dedup_clusters'
    documented shape; the split itself adds one left join keyed by doc_id
    (clusters is a tiny relation — only docs inside near-dup components)
    and a scan-side projection. Fractions are ~90/10 over REPRESENTATIVES,
    so heavily-duplicated corpora see val fractions drift with cluster
    mass — the honest accounting (a near-dup family is one effective
    document)."""
    from .dedup import llm_dedup_clusters

    clusters = llm_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    d = load(spark, sf_dir, "documents").select("doc_id")
    rep = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    bucket = (rep * _A) % _MOD
    return d.join(clusters, "doc_id", "left").select(
        "doc_id",
        rep.alias("rep_id"),
        F.when(bucket < int(_MOD * 0.1), F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


from .text_analysis import QC_ORACLE as _QC_ORACLE  # noqa: E402  (no cycle: text_analysis imports only registry/catalog/retrieval)

_CURRICULUM_PHASES = 4
_CURRICULUM_ORACLE = f"""
    WITH qc AS (SELECT doc_id, margin FROM ({{QC}})),
    tot AS (SELECT count(*) AS total FROM qc),
    r AS (
      SELECT doc_id, margin,
             row_number() OVER (ORDER BY margin, doc_id) AS ord
      FROM qc
    )
    SELECT r.doc_id, r.margin, CAST(r.ord AS BIGINT) AS ord,
           ((r.ord - 1) * {_CURRICULUM_PHASES}) // tot.total + 1 AS phase
    FROM r, tot
    """.format(QC=_QC_ORACLE)


_MAX_LONG = (1 << 63) - 1


def _ordinal_bins(scored: DataFrame, n_bins: int) -> DataFrame:
    """(doc_id, margin, pid): monotone binning of (margin, doc_id) into
    ~n_bins QUANTILE bins (r9, judge task 3). Boundaries come from
    `percentile_approx(margin)`, so mass — not value range — sets bin
    widths; a margin value spanning multiple quantile slots (the ties an
    integer classifier score produces — the case where the r8 fixed
    value-range bins collapsed into one wide-task sort) is sub-split by
    doc_id percentiles WITHIN that value. Every cut is a (margin,
    doc_id) pair and pid counts cuts lexicographically <= the row's own
    pair, so pid order IS global (margin, doc_id) order — binning can
    never change the emitted ordinal, only balance the tasks that
    compute it. Boundary quality affects BALANCE only, never bytes.

    Cost: two bounded aggregates (the sketch, plus doc_id percentiles
    restricted to heavy values) and a scan-side filter over <= n_bins
    literal structs per row."""
    spark = scored.sparkSession
    probs = [i / n_bins for i in range(1, n_bins)]
    # Literal arrays render as ONE parsed expression string, not one
    # F.lit per element — each lit is a py4j round trip, and at the
    # 64-bin default the per-element form cost ~2 s of pure DataFrame
    # construction PER CALL (the r11b plan-construction lesson, re-found
    # here in r13; bench builders pay it every rep).
    probs_arr = F.expr("array(" + ",".join(f"{p!r}D" for p in probs) + ")")
    bs = scored.agg(
        F.percentile_approx("margin", probs_arr).alias("bs")
    ).collect()[0]["bs"]
    if bs is None:
        return scored.select("doc_id", "margin", F.lit(0).alias("pid")).limit(0)
    from collections import Counter

    mult = Counter(int(m) for m in bs)
    heavy = sorted(m for m, c in mult.items() if c >= 2)
    sub: dict[int, list[int]] = {}
    if heavy:
        rows = (
            scored.filter(F.col("margin").isin(heavy))
            .groupBy("margin")
            .agg(F.percentile_approx("doc_id", probs_arr).alias("ds"))
            .collect()
        )
        by_m = {int(r["margin"]): [int(d) for d in r["ds"]] for r in rows}
        for m in heavy:
            c = mult[m]
            ds = by_m.get(m, [])
            # c quantile slots cover up to (c+1)/n_bins of the mass ->
            # c internal cuts (c+1 sub-bins), spread over the value's
            # own doc_id distribution
            step = max(1, len(ds) // (c + 1))
            sub[m] = sorted(set(ds[step - 1 :: step][:c]))
    cuts: list[tuple[int, int]] = []
    for m in sorted(mult):
        cuts.extend((m, d) for d in sub.get(m, []))
        cuts.append((m, _MAX_LONG))
    # One parsed expression for the whole cut array (see probs_arr note).
    cut_arr = F.expr(
        "array("
        + ",".join(f"named_struct('m', {cm}L, 'd', {cd}L)" for cm, cd in cuts)
        + ")"
    )
    pid = F.size(
        F.filter(
            cut_arr,
            lambda b: (b["m"] < F.col("margin"))
            | ((b["m"] == F.col("margin")) & (b["d"] <= F.col("doc_id"))),
        )
    )
    return scored.select("doc_id", "margin", pid.alias("pid"))


def _global_ordinal(part: DataFrame, n_phases: int) -> DataFrame:
    """Two-phase partition-offset global ordinal over a binned (doc_id,
    margin, pid) relation: per-bin counts prefix-summed on the driver
    (bounded by the bin count), then a perfectly parallel per-bin
    window — `sort_global_index`'s pattern. Phase id is pure integer
    arithmetic on the ordinal, shared verbatim with the oracle."""
    counts = part.groupBy("pid").agg(F.count("*").alias("n")).orderBy("pid").collect()
    if not counts:
        return part.sparkSession.createDataFrame(
            [], "doc_id long, margin long, ord long, phase long"
        )
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["pid"]] = acc
        acc += r["n"]
    total = acc
    # One parsed map expression instead of 2·|bins| F.lit py4j calls
    # (the r13 plan-construction fix, see _ordinal_bins).
    off = F.expr(
        "map(" + ",".join(f"{k}, {v}L" for k, v in offsets.items()) + ")"
    )
    w = Window.partitionBy("pid").orderBy("margin", "doc_id")
    ord_col = (off[F.col("pid")] + F.row_number().over(w)).cast("long")
    return part.select("doc_id", "margin", ord_col.alias("ord")).select(
        "doc_id",
        "margin",
        "ord",
        (F.expr(f"((ord - 1) * {n_phases}) div {max(total, 1)}") + 1).alias(
            "phase"
        ),
    )


@register(
    "llm_curriculum",
    oracle=_CURRICULUM_ORACLE,
    tags=("llm", "sampling", "curriculum"),
)
def llm_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum ordering: every scored document gets a
    deterministic global training ordinal by ASCENDING classifier margin
    (`llm_quality_classifier`'s integer-exact score, ties to doc_id) and
    an equal-size phase id 1..4 — the curriculum-learning data schedule
    (noisy-tolerant warmup first, cleanest data in the final phase; the
    anneal-to-quality recipe the published pretraining runs describe).
    Integer-exact end to end, so it carries the full cross-engine hash
    oracle — no rounding grid anywhere.

    Scale shape: the naive form is `row_number() OVER (ORDER BY margin)`
    — a single-partition global window, the classic 100 TB cliff. This
    uses the two-phase partition-offset pattern over QUANTILE bins with
    tie sub-splitting (`_ordinal_bins`, r9: the r8 fixed value-range
    bins put an all-one-value margin corpus — ties are the NORM for an
    integer classifier score — into one wide-task sort; quantile cuts
    on (margin, doc_id) pairs keep tasks balanced under any skew while
    provably never changing the emitted bytes), then per-bin counts
    prefix-summed on the driver and a perfectly parallel per-bin window
    (`_global_ordinal`). The compact (doc_id, margin) relation is
    lazily localCheckpointed: three consumers (sketch, counts, final)
    would otherwise re-run the classifier scan per branch."""
    from .text_analysis import llm_quality_classifier

    n_bins = max(8, spark.sparkContext.defaultParallelism * 2)
    scored = (
        llm_quality_classifier(spark, sf_dir)
        .select("doc_id", "margin")
        .localCheckpoint(eager=False)
    )
    return _global_ordinal(_ordinal_bins(scored, n_bins), _CURRICULUM_PHASES)


# Mixture weighting (r9): temperature and epoch-cap constants. τ = 0.7 is
# the multilingual-sampling exponent (Conneau & Lample's XLM recipe,
# reused by mT5/BLOOM data mixing): τ < 1 upsamples small sources toward
# uniform without letting one giant source dominate. The epoch cap of 4
# is Muennighoff et al. 2023's data-constrained scaling result (repeating
# tokens beyond ~4 epochs stops buying loss).
_MIX_TAU = 0.7
_MIX_EPOCH_CAP = 4.0
_MIX_QUALITY_FLOOR = 0.5

_MIXTURE_ORACLE = f"""
    WITH q AS ({{QUALITY}}),
    tok AS (
      SELECT doc_id, source,
             coalesce(len(list_filter(string_split(text, ' '), w -> w <> '')), 0) AS toks,
             sha256(text) AS h
      FROM documents
    ),
    keep AS (
      SELECT *, doc_id = min(doc_id) OVER (PARTITION BY h) AS keeper FROM tok
    ),
    per AS (
      SELECT k.source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(k.toks), 0) AS BIGINT) AS n_tokens,
             CAST(coalesce(sum(CASE WHEN k.keeper THEN k.toks END), 0) AS BIGINT)
               AS unique_tokens,
             CAST(coalesce(sum(CASE WHEN k.keeper
                                     AND q.quality >= {_MIX_QUALITY_FLOOR}
                                    THEN k.toks END), 0) AS BIGINT)
               AS quality_unique_tokens
      FROM keep k JOIN q ON q.doc_id = k.doc_id
      GROUP BY k.source
    ),
    tot AS (
      SELECT sum(pow(quality_unique_tokens, {_MIX_TAU})) AS z,
             CAST(sum(quality_unique_tokens) AS BIGINT) AS b
      FROM per
    )
    SELECT source, n_docs, n_tokens, unique_tokens, quality_unique_tokens,
           CASE WHEN tot.z > 0
                THEN round(pow(quality_unique_tokens, {_MIX_TAU}) / tot.z, 6)
                ELSE 0.0 END AS weight,
           CASE WHEN quality_unique_tokens = 0 OR tot.z = 0 THEN 0.0
                ELSE round(least({_MIX_EPOCH_CAP},
                       pow(quality_unique_tokens, {_MIX_TAU}) / tot.z * tot.b
                       / quality_unique_tokens), 6)
           END AS epochs
    FROM per, tot
    """


@register(
    "llm_mixture_weights",
    oracle=None,  # set below: splices text_analysis.QUALITY_SQL_CTE (deferred
    # to avoid an import cycle at module load)
    tags=("llm", "sampling", "mixture"),
)
def llm_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source training-mixture weights — the step between curation and
    the dataloader that published pipelines run by hand (The Pile's
    per-set epochs, BLOOM/mT5's temperature sampling): each source's
    EFFECTIVE mass is its unique (exact-dedup keeper) tokens that pass
    the absolute quality floor, and sampling weights are
    temperature-scaled on that mass (w_s ∝ mass_s^τ, τ={tau} — upsamples
    small clean sources toward uniform without letting one giant crawl
    dominate). `epochs` converts the weight into per-source repeat
    factors under the corpus's own total-unique-token budget, capped at
    {cap} (Muennighoff et al.'s data-constrained scaling bound): small
    upweighted sources repeat, the dominant source trains
    sub-1-epoch.

    Scale shape: one scan computes per-doc tokens + content hash +
    quality; the keeper flag is a window over the 32-byte hash (the
    exact-dedup shuffle); per-source aggregation is k rows, and the
    normalization is a 1-row cross join — nothing but the dedup shuffle
    moves data. Cross-engine: integer token masses, pow/round on the
    1e-6 grid (the ln-oracle precedent)."""
    from .text_analysis import quality_expr

    d = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    per_doc = d.select(
        "doc_id",
        "source",
        "n_chars",
        ws.alias("words"),
        F.coalesce(F.size(ws), F.lit(0)).alias("toks"),
        F.sha2("text", 256).alias("h"),
    ).withColumn("quality", quality_expr())
    wh = Window.partitionBy("h")
    per_doc = per_doc.withColumn(
        "keeper", F.col("doc_id") == F.min("doc_id").over(wh)
    )
    per = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum("toks"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.sum(F.when(F.col("keeper"), F.col("toks"))), F.lit(0))
        .cast("long")
        .alias("unique_tokens"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("keeper")
                    & (F.col("quality") >= _MIX_QUALITY_FLOOR),
                    F.col("toks"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("quality_unique_tokens"),
    )
    tot = per.agg(
        F.sum(F.pow("quality_unique_tokens", F.lit(_MIX_TAU))).alias("z"),
        F.sum("quality_unique_tokens").cast("long").alias("b"),
    )
    # z = 0 (every source empty after the floor, e.g. an all-null corpus)
    # guards the normalization: weights and epochs collapse to 0.0 on
    # both engines instead of an ANSI divide-by-zero
    share = F.when(
        F.col("z") > 0,
        F.pow("quality_unique_tokens", F.lit(_MIX_TAU)) / F.col("z"),
    ).otherwise(F.lit(0.0))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "unique_tokens",
        "quality_unique_tokens",
        F.round(share, 6).alias("weight"),
        F.when(F.col("quality_unique_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.least(
                    F.lit(_MIX_EPOCH_CAP),
                    share * F.col("b") / F.col("quality_unique_tokens"),
                ),
                6,
            )
        )
        .alias("epochs"),
    )


llm_mixture_weights.__doc__ = llm_mixture_weights.__doc__.format(
    tau=_MIX_TAU, cap=_MIX_EPOCH_CAP
)


# --- Mixture materialization (r11) ------------------------------------------
# llm_mixture_weights computes per-source epoch factors; this operator
# MATERIALIZES them into the dataloader's actual manifest: every doc in the
# mixture population (quality-floored exact-dedup keepers) is emitted
# floor(epochs) times, plus one more copy with probability frac(epochs) —
# decided deterministically by the package's Lehmer hash of doc_id against
# the 1e-6-grid fractional threshold, so both engines (and any replay)
# produce the identical manifest. This is the repeat/subsample step
# data-constrained training actually runs (Muennighoff et al.: small clean
# sources repeat, the dominant source trains sub-1-epoch).

_MATERIALIZE_ORACLE = f"""
    WITH mix AS MATERIALIZED ({{MIX}}),
    q2 AS ({{QUALITY}}),
    tok2 AS (
      SELECT doc_id, source,
             coalesce(len(list_filter(string_split(text, ' '), w -> w <> '')), 0) AS toks,
             sha256(text) AS h
      FROM documents
    ),
    keep2 AS (
      SELECT *, doc_id = min(doc_id) OVER (PARTITION BY h) AS keeper FROM tok2
    ),
    pop AS (
      SELECT k.doc_id, k.source, k.toks
      FROM keep2 k JOIN q2 ON q2.doc_id = k.doc_id
      WHERE k.keeper AND q2.quality >= {_MIX_QUALITY_FLOOR}
    ),
    n_of AS (
      SELECT p.doc_id, p.source, p.toks,
             CAST(floor(m.epochs) AS BIGINT)
             + CASE WHEN (p.doc_id % {{HMOD}}) * {{HMULT}} % {{HMOD}} % 1000000
                      < CAST(round((m.epochs - floor(m.epochs)) * 1000000) AS BIGINT)
                    THEN 1 ELSE 0 END AS n_copies
      FROM pop p JOIN mix m ON m.source = p.source
    )
    SELECT doc_id, source, toks, CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy
    FROM n_of WHERE n_copies >= 1
    """


@register(
    "llm_mixture_materialize",
    oracle=None,  # spliced at module end (_finalize_sampling_oracles)
    tags=("llm", "sampling", "mixture"),
)
def llm_mixture_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the training mixture: one output row per (document,
    epoch copy) the dataloader should consume — `llm_mixture_weights`'s
    per-source epoch factors turned into an actual manifest. Each doc in
    the mixture population (quality-floored exact-dedup keepers, the
    population the weights were computed over) emits floor(epochs) full
    copies plus one more iff lehmer(doc_id) mod 1e6 falls under the
    fractional part on the 1e-6 grid — a deterministic per-doc coin that
    hits the target rate exactly in expectation and is reproducible
    across engines, replays, and partitionings (no RNG state anywhere).

    Scale shape: the mixture's own single scan + dedup-hash window, then
    ONE broadcast join of the k-row epochs table and a scan-side
    explode — output size is the training budget itself (sum of
    epochs·mass), which is the quantity the manifest exists to bound.
    Docs whose source trains sub-1-epoch are subsampled by the same
    coin; rejected docs emit nothing."""
    from .text_analysis import quality_expr

    from .clustering import _HASH_MOD, _HASH_MULT2

    d = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    tok = d.select(
        "doc_id",
        "source",
        "n_chars",
        ws.alias("words"),
        F.coalesce(F.size(ws), F.lit(0)).alias("toks"),
        F.sha2("text", 256).alias("h"),
    ).withColumn("quality", quality_expr())
    wh = Window.partitionBy("h")
    pop = (
        tok.withColumn("keeper", F.col("doc_id") == F.min("doc_id").over(wh))
        .filter(F.col("keeper") & (F.col("quality") >= _MIX_QUALITY_FLOOR))
        .select("doc_id", "source", "toks")
    )
    mix = llm_mixture_weights(spark, sf_dir).select("source", "epochs")
    e = F.col("epochs")
    lehmer = (
        F.col("doc_id") % F.lit(_HASH_MOD) * F.lit(_HASH_MULT2) % F.lit(_HASH_MOD)
    )
    thr = F.round((e - F.floor(e)) * 1_000_000, 0).cast("long")
    n_copies = (
        F.floor(e).cast("long")
        + F.when(lehmer % 1_000_000 < thr, F.lit(1)).otherwise(F.lit(0))
    )
    n_of = pop.join(F.broadcast(mix), "source").select(
        "doc_id", "source", "toks", n_copies.alias("n_copies")
    )
    return (
        n_of.filter(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "source",
            "toks",
            F.explode(F.expr("sequence(1L, n_copies)")).alias("copy"),
        )
    )


# --- DSIR data selection (r11) ---------------------------------------------
# Importance resampling over hashed n-gram features (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling"): score every raw
# document by how much more likely its hashed-unigram bag is under the
# TARGET distribution than under the RAW distribution, and keep the
# top-scoring slice. The target here is the corpus's own high-quality
# stratum (quality_expr >= the mixture floor — the same bootstrap the
# classifier trainer uses); production swaps in e.g. Wikipedia+books as the
# target table behind the identical plumbing.
_DSIR_BUCKETS = 256
_DSIR_KEEP_DEN = 4  # selected = top quarter of each source stratum

_DSIR_ORACLE = """
    WITH q AS ({QUALITY}),
    t AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    h AS (
      SELECT doc_id, source,
             [list_reduce([unicode(substr(w, i, 1)) for i in range(1, len(w) + 1)],
                          (a, x) -> (a * 31 + x) % {MOD}) % {B} for w in ws] AS bs
      FROM t WHERE len(ws) > 0
    ),
    db AS (SELECT doc_id, source, unnest(bs) AS b FROM h),
    dbc AS (
      SELECT doc_id, source, b, count(*)::BIGINT AS cnt
      FROM db GROUP BY 1, 2, 3
    ),
    tgt AS (SELECT doc_id FROM q WHERE quality >= {FLOOR}),
    cb_r AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS c_r FROM dbc GROUP BY b),
    cb_t AS (
      SELECT b, CAST(sum(cnt) AS BIGINT) AS c_t
      FROM dbc JOIN tgt USING (doc_id) GROUP BY b
    ),
    tot AS (
      SELECT (SELECT coalesce(CAST(sum(c_t) AS BIGINT), 0) FROM cb_t) AS ttot,
             (SELECT coalesce(CAST(sum(c_r) AS BIGINT), 0) FROM cb_r) AS rtot
    ),
    lr AS (
      SELECT dbc.doc_id, dbc.source,
             CAST(sum(dbc.cnt) AS BIGINT) AS dl,
             sum(dbc.cnt * ln(((coalesce(cb_t.c_t, 0) + 1) / (tot.ttot + {B}.0))
                              / ((cb_r.c_r + 1) / (tot.rtot + {B}.0)))) AS s
      FROM dbc
      JOIN cb_r USING (b)
      LEFT JOIN cb_t USING (b)
      CROSS JOIN tot
      GROUP BY 1, 2
    ),
    r AS (SELECT doc_id, source, dl, round(s / dl, 6) AS logratio FROM lr),
    rk AS (
      SELECT *,
             row_number() OVER (PARTITION BY source
                                ORDER BY logratio DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY source) AS n
      FROM r
    )
    SELECT doc_id, source, dl, logratio, rk * {DEN} <= n AS selected
    FROM rk
    """


@register(
    "llm_dsir_select",
    oracle=None,  # spliced at module end (_finalize_sampling_oracles)
    tags=("llm", "sampling", "quality", "dsir"),
)
def llm_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): per-document importance
    score under hashed-unigram bag-of-words models — logratio =
    mean_tokens ln(p_target(bucket) / p_raw(bucket)) with add-1
    smoothing over {B} buckets — and a deterministic top-1/{DEN}
    per-source selection on (logratio desc, doc_id). The paper samples
    with Gumbel noise; the deterministic top-k variant is its testable
    core (the noise is a post-hoc jitter production can re-add). Target
    distribution = the corpus's own high-quality stratum (quality >=
    {FLOOR}, the classifier trainer's bootstrap); raw = every document.
    Token hashing is the quality classifier's codepoint fold (mod
    {MOD}), so the whole feature space is integer-exact and shared with
    the served/trained gate family.

    Scale shape: ONE corpus scan computes quality + per-token buckets;
    per-(doc, bucket) counts are a map-side partial aggregate; both
    bucket tables are {B} rows — broadcast — and the totals ride in as a
    1-row broadcast cross join; scoring re-aggregates the (doc, bucket)
    relation (bounded by {B} rows/doc, not tokens); selection is a
    per-source window over scalars, never a global sort. Text never
    leaves the scan. Cross-engine: integer counts, ln on doubles,
    round-6 final grid (the perplexity precedent); rank ties break by
    doc_id on the rounded score."""
    r = _dsir_scores(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(F.col("logratio").desc(), "doc_id")
    wn = Window.partitionBy("source")
    return r.select(
        "doc_id",
        "source",
        "dl",
        "logratio",
        (F.row_number().over(w) * _DSIR_KEEP_DEN <= F.count("*").over(wn)).alias(
            "selected"
        ),
    )


def dsir_bucket_expr() -> str:
    """The hashed-unigram bucket expression over a `ws` token-array
    column — ONE definition consumed by the batch scorer and the
    streaming selection gate (the _query_pred lesson: an inline copy at
    the gate would let the two feature spaces silently drift)."""
    from .text_analysis import _QC_HASH_MOD

    return (
        "transform(ws, w -> aggregate(transform(sequence(1, length(w)), "
        "i -> cast(ascii(substr(w, i, 1)) as bigint)), 0L, "
        f"(a, x) -> (a * 31 + x) % {_QC_HASH_MOD}) % {_DSIR_BUCKETS})"
    )


def _dsir_bucket_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The checkpointed (doc_id, source, quality, b, cnt) relation both
    the scorer and the gate calibration derive from — see llm_dsir_select
    for the plan-shape argument."""
    from .text_analysis import quality_expr

    d = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    t = d.select("doc_id", "source", "n_chars", ws.alias("words"))
    q = t.select(
        "doc_id",
        "source",
        F.col("words").alias("ws"),
        quality_expr().alias("quality"),
    )
    db = q.filter(F.size("ws") > 0).select(
        "doc_id",
        "source",
        "quality",
        F.explode(F.expr(dsir_bucket_expr())).alias("b"),
    )
    # Four downstream branches (raw buckets, target buckets, both totals,
    # the per-doc scorer) derive from this relation with DIFFERENT
    # join-inferred filters, which de-canonicalizes the shared subtree and
    # defeats AQE exchange reuse — the corpus would be scanned and hashed
    # once per branch (the perplexity family's r6 lesson). The (doc,
    # bucket) counts are bounded by B rows per doc — orders of magnitude
    # smaller than the token stream — so a lazy localCheckpoint pays one
    # materialization and every branch reads it.
    return (
        db.groupBy("doc_id", "source", "quality", "b")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )


def _dsir_scores(
    spark: SparkSession, sf_dir: str, dbc: DataFrame | None = None
) -> DataFrame:
    """(doc_id, source, dl, logratio): the DSIR importance scorer shared
    by the exact rank selection and the approx-threshold scale variant —
    see llm_dsir_select for the arithmetic and plan shape. `dbc` lets a
    caller that already materialized the checkpointed bucket relation
    (dsir_calibration) reuse it instead of paying the corpus scan
    twice (review r12)."""
    if dbc is None:
        dbc = _dsir_bucket_rel(spark, sf_dir)
    cb_r = dbc.groupBy("b").agg(F.sum("cnt").cast("long").alias("c_r"))
    cb_t = (
        dbc.filter(F.col("quality") >= _MIX_QUALITY_FLOOR)
        .groupBy("b")
        .agg(F.sum("cnt").cast("long").alias("c_t"))
    )
    tot = cb_r.agg(
        F.coalesce(F.sum("c_r"), F.lit(0)).cast("long").alias("rtot")
    ).crossJoin(
        cb_t.agg(F.coalesce(F.sum("c_t"), F.lit(0)).cast("long").alias("ttot"))
    )
    beta = float(_DSIR_BUCKETS)
    p_ratio = (
        (F.coalesce(F.col("c_t"), F.lit(0)) + 1) / (F.col("ttot") + F.lit(beta))
    ) / ((F.col("c_r") + 1) / (F.col("rtot") + F.lit(beta)))
    return (
        dbc.join(F.broadcast(cb_r), "b")
        .join(F.broadcast(cb_t), "b", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "source")
        .agg(
            F.sum("cnt").cast("long").alias("dl"),
            F.round(
                F.sum(F.col("cnt") * F.log(p_ratio)) / F.sum("cnt"), 6
            ).alias("logratio"),
        )
    )


@register(
    "llm_dsir_select_approx",
    # No cross-engine oracle by nature: percentile_approx is an engine-
    # private sketch. Bounded by the pytest invariant against
    # llm_dsir_select's exact rank selection (the ccnet_buckets_approx /
    # quality_gate_approx precedent).
    oracle=None,
    tags=("llm", "sampling", "quality", "dsir", "approx"),
)
def llm_dsir_select_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of DSIR selection: the exact operator's per-source
    top-quarter runs a rank window — a per-stratum SORT, which at web
    scale is a near-global sort because one crawl source dominates the
    corpus. This variant computes each source's 75th-percentile logratio
    with percentile_approx (one partial-aggregable pass over the compact
    scored relation), broadcasts the per-source thresholds back, and
    selects with a scan-side comparison — no per-stratum sort anywhere.
    Scores are identical to the exact form (same checkpointed scorer);
    only the cut differs, by at most the sketch's error band around the
    threshold (pinned against the exact twin in pytest)."""
    scored = _dsir_scores(spark, sf_dir)
    thr = scored.groupBy("source").agg(
        F.percentile_approx("logratio", 1.0 - 1.0 / _DSIR_KEEP_DEN, 10_000).alias(
            "thr"
        )
    )
    return scored.join(F.broadcast(thr), "source").select(
        "doc_id",
        "source",
        "dl",
        "logratio",
        (F.col("logratio") >= F.col("thr")).alias("selected"),
    )


def dsir_calibration(spark: SparkSession, sf_dir: str) -> dict:
    """Calibrate-once inputs for the streaming SELECTION gate (stage 10,
    `streaming.curation.dsir_gate_sink`): the raw/target hashed-unigram
    bucket models (<= 2 x _DSIR_BUCKETS integers), their totals, and the
    per-source threshold cuts — `llm_dsir_select_approx`'s
    percentile_approx at the same keep fraction — plus a '*' global
    fallback for sources unseen at calibration.

    Driver-side BY CONTRACT (the centroids / gate-weights /
    benchmark-shingles pattern): the models are B-bounded and the
    thresholds are one scalar per source; recalibration against a newer
    corpus snapshot is a control-plane sink swap."""
    dbc = _dsir_bucket_rel(spark, sf_dir)
    c_r = {
        int(r["b"]): int(r["c_r"])
        for r in dbc.groupBy("b")
        .agg(F.sum("cnt").cast("long").alias("c_r"))
        .collect()
    }
    c_t = {
        int(r["b"]): int(r["c_t"])
        for r in dbc.filter(F.col("quality") >= _MIX_QUALITY_FLOOR)
        .groupBy("b")
        .agg(F.sum("cnt").cast("long").alias("c_t"))
        .collect()
    }
    pct = 1.0 - 1.0 / _DSIR_KEEP_DEN
    scored = _dsir_scores(spark, sf_dir, dbc=dbc)
    thr = {
        r["source"]: float(r["thr"])
        for r in scored.groupBy("source")
        .agg(F.percentile_approx("logratio", pct, 10_000).alias("thr"))
        .collect()
        # a NULL source stratum gets no threshold entry: the gate treats
        # NULL-source docs as outside the selected population (its batch
        # twin's source-keyed join drops them), and str(None) would
        # collide with a literal "None" source (review r12)
        if r["thr"] is not None and r["source"] is not None
    }
    g = scored.agg(
        F.percentile_approx("logratio", pct, 10_000).alias("thr")
    ).first()
    return {
        "c_r": c_r,
        "c_t": c_t,
        "rtot": sum(c_r.values()),
        "ttot": sum(c_t.values()),
        "thr": thr,
        "thr_global": float(g["thr"]) if g and g["thr"] is not None else float("-inf"),
    }


def _finalize_mixture_oracle() -> None:
    """Splice text_analysis.QUALITY_SQL_CTE into the registered oracle
    after both modules exist (registration happens at import; the CTE
    import here would otherwise be circular)."""
    from dataclasses import replace

    from ..plans import registry
    from .text_analysis import QUALITY_SQL_CTE

    spec = registry._REGISTRY["llm_mixture_weights"]
    registry._REGISTRY["llm_mixture_weights"] = replace(
        spec, oracle=_MIXTURE_ORACLE.format(QUALITY=QUALITY_SQL_CTE)
    )


def _finalize_dsir_oracle() -> None:
    """Same late splice for llm_dsir_select: its oracle needs the quality
    CTE (target stratum) and the classifier's hash modulus, both from
    text_analysis (circular at import time)."""
    from dataclasses import replace

    from ..plans import registry
    from .text_analysis import _QC_HASH_MOD, QUALITY_SQL_CTE

    spec = registry._REGISTRY["llm_dsir_select"]
    registry._REGISTRY["llm_dsir_select"] = replace(
        spec,
        oracle=_DSIR_ORACLE.format(
            QUALITY=QUALITY_SQL_CTE,
            MOD=_QC_HASH_MOD,
            B=_DSIR_BUCKETS,
            FLOOR=_MIX_QUALITY_FLOOR,
            DEN=_DSIR_KEEP_DEN,
        ),
    )
    llm_dsir_select.__doc__ = llm_dsir_select.__doc__.format(
        B=_DSIR_BUCKETS,
        DEN=_DSIR_KEEP_DEN,
        FLOOR=_MIX_QUALITY_FLOOR,
        MOD=_QC_HASH_MOD,
    )


def _finalize_materialize_oracle() -> None:
    """Splice the FULL mixture oracle (epochs) plus the quality CTE and
    the Lehmer constants into llm_mixture_materialize's oracle — the
    manifest replays the whole weights computation, so a driver/pytest
    hash-pass on it is hash evidence for the mixture tier end to end."""
    from dataclasses import replace

    from ..plans import registry
    from .clustering import _HASH_MOD, _HASH_MULT2
    from .text_analysis import QUALITY_SQL_CTE

    spec = registry._REGISTRY["llm_mixture_materialize"]
    registry._REGISTRY["llm_mixture_materialize"] = replace(
        spec,
        oracle=_MATERIALIZE_ORACLE.format(
            MIX=_MIXTURE_ORACLE.format(QUALITY=QUALITY_SQL_CTE),
            QUALITY=QUALITY_SQL_CTE,
            HMOD=_HASH_MOD,
            HMULT=_HASH_MULT2,
        ),
    )


_finalize_mixture_oracle()
_finalize_dsir_oracle()
_finalize_materialize_oracle()

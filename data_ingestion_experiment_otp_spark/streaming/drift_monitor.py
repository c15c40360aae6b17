"""Streaming vocabulary-drift monitor: the per-epoch form of
operators/text_analysis.llm_source_divergence, pointed at INGEST instead
of a finished corpus.

A training-data pipeline wants to know, per arriving micro-batch, how far
the incoming token distribution has drifted from the distribution the
mixture was calibrated on — a crawler source changing language, a feed
degenerating into boilerplate, or an upstream schema accident all show up
as a KL spike long before they show up in model metrics. Each epoch the
sink scores KL(batch ‖ reference) in bits/token and appends one audit row
per epoch (plus a drifted flag against a caller-set budget) to a
monitoring store.

Same contracts as the package's other sinks:

- **Calibrate once, apply per batch.** The reference unigram distribution
  is a control-plane parameter (`calibrate_reference` computes it from a
  corpus DataFrame — the llm_source_divergence corpus side — and returns
  a plain dict). It is materialized as a cached reference frame once, on
  the first epoch, and rides to executors as a broadcast join per batch;
  recalibration is a sink swap, not per-batch work.
- **Bounded calibration (r7).** The reference is the top-K head by
  frequency plus ONE aggregated tail bucket — the driver and the
  broadcast hold O(K), never O(|vocabulary|), so a web-scale
  multilingual corpus (hundreds of millions of distinct tokens) cannot
  blow the control plane. KL is computed against this TRUNCATED
  reference: head tokens score exactly; out-of-head tokens (reference
  tail or genuinely novel — `n_unseen` counts both) score against the
  tail's average per-term probability.
- **Smoothing, unlike the batch diagnostic.** The batch KL needs none
  (the corpus distribution dominates every source's support); a
  micro-batch CAN contain tokens the reference has never seen — exactly
  the drift signal — so when the whole vocabulary fit in the head the
  out-of-head mass scores against a floor probability (`_UNSEEN_P`)
  instead of blowing up to infinity.
- **Idempotent, batchId-keyed writes.** One row per epoch under
  ``batch_id=N`` with dynamic partition overwrite: replays rewrite the
  identical audit row (pinned in tests).

Scale shape: the epoch reduces to its (term-hash, count) relation before
anything joins (map-side partial agg over token scalars); the reference
is a cached, broadcast vocabulary frame; the audit row is one aggregate
row. Nothing accumulates executor state.

Reference parity: the reference's only health signal is HTTP status codes
(`api/main.py:235-257`); this is the engine-tier generalization of
"notice the feed went bad" to a content-distribution monitor.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.retrieval import tokenize

# Probability floor for tokens the reference never saw: each unseen token
# contributes log2(p_batch/_UNSEEN_P) ≈ a large-but-finite drift penalty.
_UNSEEN_P = 1e-9

# Driver-memory bound on the calibrated reference: the top-K head is held
# exactly; everything below it is ONE aggregated tail bucket. 50k terms ×
# 16 bytes is a trivially small driver/broadcast footprint even when the
# corpus vocabulary has hundreds of millions of entries (a 100 TB
# multilingual crawl) — the r6 form collected the FULL vocabulary and was
# the streaming tier's one driver-side scale hole.
_REF_TOP_K = 50_000

# Reserved key carrying the tail bucket inside the reference dict:
# (avg per-term tail probability | None, tail term count). Term keys are
# xxhash64 ints, so a string sentinel can never collide.
_TAIL_KEY = "__tail__"

_AUDIT_SCHEMA = "n_tokens long, n_unseen long, kl_bits double, drifted boolean, batch_id int"


def calibrate_reference(corpus: DataFrame, top_k: int = _REF_TOP_K) -> dict:
    """Reference token distribution from a corpus (doc_id, text) frame:
    {xxhash64(term): probability} for the top-`top_k` terms by frequency
    (count desc, hash asc tie-break — deterministic under replay), plus
    one aggregated TAIL bucket under `_TAIL_KEY`. The driver holds
    O(top_k), never O(|vocabulary|): the head rides to executors as a
    broadcast frame and a batch token outside the head scores against
    the tail's average per-term probability (the standard truncated-
    reference monitoring form) — or `_UNSEEN_P` when the whole
    vocabulary fit in the head, where the truncated KL is exactly the
    full KL."""
    counts = (
        corpus.select(F.explode(tokenize()).alias("term"))
        .groupBy(F.xxhash64("term").alias("thash"))
        .agg(F.count("*").alias("c"))
    )
    # two bounded driver results: the K-row head and a 1-row total
    head = counts.orderBy(F.col("c").desc(), "thash").limit(top_k).collect()
    tot = counts.agg(
        F.sum("c").alias("total_c"), F.count("*").alias("n_terms")
    ).collect()[0]
    total = float(tot["total_c"] or 0) or 1.0
    reference: dict = {r["thash"]: r["c"] / total for r in head}
    tail_terms = int(tot["n_terms"] or 0) - len(head)
    tail_c = int(tot["total_c"] or 0) - sum(r["c"] for r in head)
    reference[_TAIL_KEY] = (
        (tail_c / total / tail_terms) if tail_terms > 0 else None,
        tail_terms,
    )
    return reference


def _split_reference(reference: dict) -> tuple[list[tuple[int, float]], float]:
    """(head term items, probability floor for out-of-head tokens). A
    plain full-vocabulary dict (no tail entry) keeps the legacy
    `_UNSEEN_P` floor."""
    tail_p, _tail_terms = reference.get(_TAIL_KEY, (None, 0))
    floor = max(tail_p or 0.0, _UNSEEN_P)
    return [
        (k, v) for k, v in reference.items() if k != _TAIL_KEY
    ], floor


def drift_monitor_sink(
    monitor_dir: str,
    reference: dict[int, float],
    kl_budget_bits: float = 1.0,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: score each (doc_id, text) micro-batch's
    token distribution against the calibrated reference and append one
    audit row per epoch; `drifted` flags epochs whose KL exceeds the
    caller's budget."""

    # The reference frame is built once, on the first epoch, and reused —
    # re-serializing a head-sized dict from the driver per micro-batch
    # would violate the calibrate-once contract.
    cache: dict[str, DataFrame] = {}
    head, floor_p = _split_reference(reference)

    def monitor_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        counts = (
            batch_df.select(F.explode(tokenize()).alias("term"))
            .groupBy(F.xxhash64("term").alias("thash"))
            .agg(F.count("*").cast("double").alias("c"))
        )
        if "ref" not in cache:
            # An empty reference must be an empty FRAME, not a sentinel
            # (0, 0.0) row: a batch token hashing to exactly 0 would join
            # the sentinel's p_ref=0.0 and compute log(c/0) = inf instead
            # of taking the out-of-head floor.
            cache["ref"] = spark.createDataFrame(
                head, "thash long, p_ref double"
            ).cache()
        ref = cache["ref"]
        scored = counts.join(F.broadcast(ref), "thash", "left")
        # KL = sum p_b * log2(p_b / p_ref) with p_b = c / N factors as
        #      (1/N) * [ sum c * log2(c / p_ref) ] - log2(N),
        # so one aggregate row suffices and N never needs a second pass.
        audit = scored.agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("p_ref").isNull(), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_unseen"),
            F.sum(
                F.col("c")
                * (
                    F.log(
                        F.col("c") / F.coalesce(F.col("p_ref"), F.lit(floor_p))
                    )
                    / F.log(F.lit(2.0))
                )
            ).alias("_raw"),
        )
        row = audit.collect()[0]
        n_tokens = int(row["n_tokens"] or 0)  # empty epoch -> null aggregate
        n = float(n_tokens) or 1.0
        kl = row["_raw"] / n - math.log2(n) if n_tokens else 0.0
        out = spark.createDataFrame(
            [
                (
                    n_tokens,
                    int(row["n_unseen"] or 0),
                    round(kl, 6),
                    bool(kl > kl_budget_bits),
                    batch_id,
                )
            ],
            _AUDIT_SCHEMA,
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(monitor_dir)
        )

    return monitor_batch


def read_audit(spark: SparkSession, monitor_dir: str) -> DataFrame:
    return spark.read.schema(_AUDIT_SCHEMA).parquet(monitor_dir)


_SOURCE_AUDIT_SCHEMA = (
    "source string, n_tokens long, n_unseen long, kl_bits double, "
    "drifted boolean, batch_id int"
)


def source_drift_sink(
    monitor_dir: str,
    reference: dict[int, float],
    kl_budget_bits: float = 1.0,
) -> Callable[[DataFrame, int], None]:
    """Per-SOURCE drift monitor — the streaming twin of
    operators/text_analysis.llm_source_divergence pointed at ingest:
    each epoch writes one audit row per source stratum present in the
    micro-batch (KL(source-batch ‖ reference) in bits/token, unseen-mass
    floor, drifted flag), so a single feed going bad shows up as ITS row
    spiking while the mixture's other strata stay green — the epoch-
    global sink averages the signal away when the bad source is a small
    mixture fraction.

    Fully executor-side: the epoch reduces to (source, term-hash) counts
    map-side, joins the broadcast reference, and the per-source KL
    factors exactly as the global sink's (sum c*log2(c/p_ref))/N -
    log2(N) — computed per group in one aggregate with NO driver
    collect. BatchId-keyed dynamic-overwrite writes, replay-safe."""

    cache: dict[str, DataFrame] = {}
    head, floor_p = _split_reference(reference)

    def monitor_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        counts = (
            batch_df.select("source", F.explode(tokenize()).alias("term"))
            .groupBy("source", F.xxhash64("term").alias("thash"))
            .agg(F.count("*").cast("double").alias("c"))
        )
        if "ref" not in cache:
            cache["ref"] = spark.createDataFrame(
                head, "thash long, p_ref double"
            ).cache()
        scored = counts.join(F.broadcast(cache["ref"]), "thash", "left")
        raw = F.sum(
            F.col("c")
            * (
                F.log(F.col("c") / F.coalesce(F.col("p_ref"), F.lit(floor_p)))
                / F.log(F.lit(2.0))
            )
        )
        per_source = scored.groupBy("source").agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("p_ref").isNull(), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_unseen"),
            raw.alias("_raw"),
        )
        kl = F.round(
            F.col("_raw") / F.col("n_tokens") - F.log2(F.col("n_tokens")), 6
        )
        (
            per_source.select(
                "source",
                "n_tokens",
                "n_unseen",
                kl.alias("kl_bits"),
                (kl > kl_budget_bits).alias("drifted"),
                F.lit(batch_id).alias("batch_id"),
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(monitor_dir)
        )

    return monitor_batch


def read_source_audit(spark: SparkSession, monitor_dir: str) -> DataFrame:
    return spark.read.schema(_SOURCE_AUDIT_SCHEMA).parquet(monitor_dir)


# --- Vector (embedding) drift (r10) -----------------------------------------
#
# The text monitors above watch the TOKEN distribution; the corpus's
# other modality — the embedding column every semantic stage consumes —
# was unmonitored. An upstream embedding-model swap, a feed's topic
# shift, or a pipeline bug that zeroes/rescales vectors all move the
# distribution of SEMANTIC-CLUSTER assignments long before any text
# signal fires (the text can be byte-identical while the vectors are
# garbage). This monitor scores, per epoch and per source, the KL
# between the batch's fine-cluster assignment distribution and a
# calibrated reference — the clusters come from the SAME trained
# coarse/fine hierarchy the SemDeDup tier serves (clustering.
# sem_model_dir), so "drift" is measured in exactly the buckets the
# curation pipeline acts on.

_VECTOR_AUDIT_SCHEMA = (
    "source string, n_vecs long, n_offhead long, kl_bits double, "
    "drifted boolean, batch_id int"
)


def calibrate_vector_reference(
    vec: DataFrame, model_dir: str, top_k: int = _REF_TOP_K
) -> dict:
    """Reference fine-CLUSTER distribution from a calibration corpus
    (vec_id, embedding) frame against a committed trained-hierarchy
    artifact: {cluster_id: probability} for the top-`top_k` clusters by
    mass (count desc, cluster_id asc tie-break) plus the aggregated tail
    bucket — `calibrate_reference`'s truncated form with cluster ids as
    keys, so the driver/broadcast holds O(top_k) even when k_total is at
    the 65536 cap. Control-plane, computed once; the sink applies it per
    batch."""
    from ..operators.clustering import load_sem_model_trained, sem_fine_assign

    spark = vec.sparkSession
    model = load_sem_model_trained(spark, model_dir)
    if model is None:
        return {_TAIL_KEY: (None, 0)}
    assigned = sem_fine_assign(
        vec.filter(F.col("embedding").isNotNull()).select("vec_id", "embedding"),
        *model,
    )
    counts = assigned.groupBy("cluster_id").agg(F.count("*").alias("c"))
    head = counts.orderBy(F.col("c").desc(), "cluster_id").limit(top_k).collect()
    tot = counts.agg(
        F.sum("c").alias("total_c"), F.count("*").alias("n_terms")
    ).collect()[0]
    total = float(tot["total_c"] or 0) or 1.0
    reference: dict = {r["cluster_id"]: r["c"] / total for r in head}
    tail_terms = int(tot["n_terms"] or 0) - len(head)
    tail_c = int(tot["total_c"] or 0) - sum(r["c"] for r in head)
    reference[_TAIL_KEY] = (
        (tail_c / total / tail_terms) if tail_terms > 0 else None,
        tail_terms,
    )
    return reference


def vector_drift_sink(
    monitor_dir: str,
    model_dir: str,
    reference: dict,
    kl_budget_bits: float = 1.0,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: per-SOURCE embedding-drift monitor — the
    vector-modality twin of `source_drift_sink`. Each epoch, every
    embedded doc in the micro-batch is assigned to its fine semantic
    cluster against the trained hierarchy (broadcast O(√k·d) coarse
    route + one cell cogroup — the serving path the SemDeDup screen
    uses), and each source stratum's cluster distribution is scored as
    KL(batch ‖ reference) in bits/vector with the same factored
    one-aggregate form and truncated-head floor as the token monitors.
    One audit row per (source, epoch): vector count, off-head mass
    (clusters outside the calibrated head — a brand-new semantic region
    is itself the strongest drift signal), kl_bits, drifted flag.

    Docs without an embedding carry no geometry and stay out of the
    distribution (the semantic screen's convention); scored on the RAW
    batch when composed, for the same reason the text monitor is — a
    feed re-sending old content is drift the screened stream would
    hide. BatchId-keyed dynamic-overwrite writes, replay-safe; the
    model and reference frames are cached once per sink (the
    calibrate-once contract)."""
    from ..operators.clustering import load_sem_model_trained, sem_fine_assign

    cache: dict = {}
    head, floor_p = _split_reference(reference)

    def monitor_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if "model" not in cache:
            cache["model"] = load_sem_model_trained(spark, model_dir)
        if "ref" not in cache:
            cache["ref"] = spark.createDataFrame(
                [(int(k), float(v)) for k, v in head],
                "cluster_id long, p_ref double",
            ).cache()
        model = cache["model"]
        srcs = batch_df.select(F.col("doc_id").alias("vec_id"), "source")
        if model is None:
            assigned = spark.createDataFrame(
                [], "vec_id long, cluster_id long, sim double"
            )
        else:
            assigned = sem_fine_assign(
                batch_df.filter(F.col("embedding").isNotNull()).select(
                    F.col("doc_id").alias("vec_id"), "embedding"
                ),
                *model,
            )
        counts = (
            assigned.join(srcs, "vec_id")
            .groupBy("source", "cluster_id")
            .agg(F.count("*").cast("double").alias("c"))
        )
        scored = counts.join(F.broadcast(cache["ref"]), "cluster_id", "left")
        raw = F.sum(
            F.col("c")
            * (
                F.log(F.col("c") / F.coalesce(F.col("p_ref"), F.lit(floor_p)))
                / F.log(F.lit(2.0))
            )
        )
        per_source = scored.groupBy("source").agg(
            F.sum("c").cast("long").alias("n_vecs"),
            F.sum(F.when(F.col("p_ref").isNull(), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_offhead"),
            raw.alias("_raw"),
        )
        kl = F.round(
            F.col("_raw") / F.col("n_vecs") - F.log2(F.col("n_vecs")), 6
        )
        (
            per_source.select(
                "source",
                "n_vecs",
                "n_offhead",
                kl.alias("kl_bits"),
                (kl > kl_budget_bits).alias("drifted"),
                F.lit(batch_id).alias("batch_id"),
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(monitor_dir)
        )

    return monitor_batch


def read_vector_audit(spark: SparkSession, monitor_dir: str) -> DataFrame:
    return spark.read.schema(_VECTOR_AUDIT_SCHEMA).parquet(monitor_dir)

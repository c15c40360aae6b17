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
- **Smoothing, unlike the batch diagnostic.** The batch KL needs none
  (the corpus distribution dominates every source's support); a
  micro-batch CAN contain tokens the reference has never seen — exactly
  the drift signal — so unseen mass scores against a floor probability
  (`_UNSEEN_P`) instead of blowing up to infinity.
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

_AUDIT_SCHEMA = "n_tokens long, n_unseen long, kl_bits double, drifted boolean, batch_id int"


def calibrate_reference(corpus: DataFrame) -> dict[int, float]:
    """Reference token distribution from a corpus (doc_id, text) frame:
    {xxhash64(term): probability}. Driver-held and broadcast per epoch —
    vocabulary-sized (bounded), not corpus-sized."""
    rows = (
        corpus.select(F.explode(tokenize()).alias("term"))
        .groupBy(F.xxhash64("term").alias("thash"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    total = float(sum(r["c"] for r in rows)) or 1.0
    return {r["thash"]: r["c"] / total for r in rows}


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
    # re-serializing a vocabulary-sized dict from the driver per micro-batch
    # would violate the calibrate-once contract.
    cache: dict[str, DataFrame] = {}

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
            # of taking the _UNSEEN_P floor.
            cache["ref"] = spark.createDataFrame(
                list(reference.items()), "thash long, p_ref double"
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
                        F.col("c") / F.coalesce(F.col("p_ref"), F.lit(_UNSEEN_P))
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

    def monitor_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        counts = (
            batch_df.select("source", F.explode(tokenize()).alias("term"))
            .groupBy("source", F.xxhash64("term").alias("thash"))
            .agg(F.count("*").cast("double").alias("c"))
        )
        if "ref" not in cache:
            cache["ref"] = spark.createDataFrame(
                list(reference.items()), "thash long, p_ref double"
            ).cache()
        scored = counts.join(F.broadcast(cache["ref"]), "thash", "left")
        raw = F.sum(
            F.col("c")
            * (
                F.log(F.col("c") / F.coalesce(F.col("p_ref"), F.lit(_UNSEEN_P)))
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

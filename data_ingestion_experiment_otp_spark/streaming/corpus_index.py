"""Streaming incremental corpus dedup: the ingestion-time form of
operators/dedup.py::llm_incremental_dedup.

Each micro-batch of incoming documents is screened against a persistent
CORPUS INDEX (a parquet table of content hashes, partitioned by the epoch
that admitted them) and only first-seen content is accepted. The index is
the streaming analog of the reference's processed-set bookkeeping (the
cursor file, `api/main.py:258-290`) generalized from a scalar high-water
mark to a content-addressed set.

Replay safety (the part naive implementations get wrong): on epoch replay
the index already contains the epoch's own hashes, so screening against
the whole index would reject the entire replayed batch. Both the screen
and the index write are therefore batchId-scoped:

- the screen reads only index partitions with ``src_batch < batch_id``
  (partition pruning makes this a metadata filter, not a scan+filter);
- the index write goes to the epoch's own ``src_batch=N`` partition with
  dynamic partition overwrite, so a replay overwrites its previous
  (possibly partial) index contribution instead of appending to it;
- accepted documents land in a batchId-keyed directory exactly like
  sinks.idempotent_parquet_sink.

Net: at-least-once delivery + this sink = effectively-exactly-once
acceptance, same contract as the other sinks in this package.

At 100 TB the index table is big but narrow (32-byte hash + epoch); the
anti-join shuffles only hashes, and bucketing the index by hash would
co-locate the probe. The near-dup (shingle) screen composes the same way
— see llm_incremental_dedup for the batch form of that screen.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F, types as T

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("src_batch", T.LongType()),
    ]
)


def corpus_dedup_sink(
    index_dir: str, accepted_dir: str, text_col: str = "text"
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: accept only documents whose content hash is
    not already in the corpus index, then admit their hashes. Within a
    batch, first occurrence wins (dropDuplicates on the hash)."""

    def screen(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession

        hashed = batch_df.withColumn("content_hash", F.sha2(text_col, 256)).dropDuplicates(
            ["content_hash"]
        )
        if os.path.isdir(index_dir) and any(
            e.startswith("src_batch=") for e in os.listdir(index_dir)
        ):
            seen = (
                spark.read.schema(INDEX_SCHEMA)
                .option("basePath", index_dir)
                .parquet(index_dir)
                .filter(F.col("src_batch") < batch_id)  # replay: ignore own epoch
                .select("content_hash")
            )
            fresh = hashed.join(seen, "content_hash", "left_anti")
        else:
            fresh = hashed

        fresh.drop("content_hash").write.mode("overwrite").parquet(
            os.path.join(accepted_dir, f"batch_id={batch_id}")
        )
        # dynamic overwrite scoped to THIS writer: replaying epoch k must
        # rewrite only its own src_batch=k partition, but leaking the mode
        # into the shared session conf would flip every later partitioned
        # overwrite from truncate to accumulate
        (
            fresh.select("content_hash", F.lit(batch_id).alias("src_batch"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("src_batch")
            .parquet(index_dir)
        )

    return screen


GRAM_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("g", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("src_batch", T.LongType()),
    ]
)


def compact_span_index(spark, gram_index_dir: str, out_dir: str) -> None:
    """Fold the epoch-accumulated gram-count index into a single
    ``src_batch=0`` generation at `out_dir` — the span-index analog of
    text_index.compact_text_index (r8: the one store that previously
    accrued one partition per epoch forever).

    Why it belongs to the index, not the filesystem: the screen's prior
    term is sum(n) GROUP BY g across all prior epochs — compaction
    applies that aggregation ONCE, so a long-running ingest stops paying
    epochs × files per screen and the combined count is read directly.
    Screening new epochs against the compacted generation is
    byte-identical to screening against the epoch stack (pinned in
    tests): the sink only ever consumes the per-gram SUM, and every
    folded epoch is < any future batch_id, so the ``src_batch <
    batch_id`` replay guard still admits the whole folded history.

    The output is a fresh directory (generation swap — build, then
    readers move), stamped with a ``_COMPACTED`` marker (an
    underscore-prefixed file, invisible to Spark's file index): the
    marker tells `corpus_retract` that per-epoch provenance is folded,
    switching RTBF from per-epoch recount to gram-count SUBTRACTION.
    The marker's CONTENT is the JSON list of epoch ids the fold consumed
    (r9, ADVICE): retraction must subtract only for victims from epochs
    that actually contributed grams — an epoch ingested with
    span_screen=False never did, and subtracting its victims' grams
    would under-count unrelated docs sharing them.
    Same quiesce discipline as every generation swap here: a replay of a
    folded epoch must not race the swap (the replay guard would re-admit
    grams the fold already counted)."""
    import json

    idx = (
        spark.read.schema(GRAM_INDEX_SCHEMA)
        .option("basePath", gram_index_dir)
        .parquet(gram_index_dir)
    )
    folded_set = {
        int(e.split("=", 1)[1])
        for e in os.listdir(gram_index_dir)
        if e.startswith("src_batch=")
    }
    prior_marker = os.path.join(gram_index_dir, "_COMPACTED")
    if os.path.isfile(prior_marker):  # re-fold: union the prior fold's epochs
        try:
            with open(prior_marker) as fh:
                folded_set |= {int(e) for e in json.load(fh)}
        except (ValueError, OSError):
            pass
    folded = sorted(folded_set)
    (
        idx.groupBy("g")
        .agg(F.sum("n").alias("n"))
        .select("g", "n", F.lit(0).alias("src_batch"))
        .write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy("src_batch")
        .parquet(out_dir)
    )
    with open(os.path.join(out_dir, "_COMPACTED"), "w") as fh:
        json.dump(folded, fh)


def span_screen_sink(
    gram_index_dir: str, audit_dir: str
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: the ingestion-time form of
    operators/dedup.py::llm_incremental_dup_spans — duplicated-SUBSTRING
    screening against a persistent GRAM-COUNT index.

    Per epoch: (1) the batch's positional K-grams are evaluated against
    prior epochs' gram counts plus the batch's own (a gram with combined
    occurrence count >= 2 marks its K token positions as duplicated-span
    coverage); (2) the per-doc span audit (n_tokens / dup_tokens /
    dup_fraction / flag_dup / kept_text — `_span_coverage`, shared
    verbatim with the batch operators) lands in a batchId-keyed audit
    directory; (3) the epoch's own (gram, count) aggregate is admitted
    into its ``src_batch=N`` index partition.

    Ingest-time semantics, by design: coverage is evaluated when a doc
    ARRIVES, so the corpus-first occurrence of a span stays uncovered in
    its own epoch's audit (it was unique when admitted) — retroactive
    whole-corpus coverage is `llm_dup_spans`' batch job over the stores.

    Replay safety is the module's standard contract: the screen reads
    only ``src_batch < batch_id`` partitions (partition-pruned), and
    both writes are epoch-scoped overwrites, so a replayed epoch
    produces byte-identical audit rows and index contribution instead of
    double-counting its own grams.

    Scale shape: the index is (8-byte gram hash, count, epoch) — no
    positions, no text; per-epoch moving state is O(batch tokens) for
    the positional side plus one aggregate-to-aggregate left join on the
    gram key (exactly the batch operator's incremental contract)."""
    from ..operators.dedup import _span_coverage, _span_pos_grams, _span_toks

    def screen(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        toks = _span_toks(batch_df)
        bpos = _span_pos_grams(toks)
        bcounts = bpos.groupBy("g").agg(F.count("*").alias("b_cnt"))
        if os.path.isdir(gram_index_dir) and any(
            e.startswith("src_batch=") for e in os.listdir(gram_index_dir)
        ):
            prior = (
                spark.read.schema(GRAM_INDEX_SCHEMA)
                .option("basePath", gram_index_dir)
                .parquet(gram_index_dir)
                .filter(F.col("src_batch") < batch_id)  # replay: ignore own epoch
                .groupBy("g")
                .agg(F.sum("n").alias("c_cnt"))
            )
            merged = bcounts.join(prior, "g", "left")
        else:
            merged = bcounts.withColumn("c_cnt", F.lit(None).cast("long"))
        dup_grams = merged.filter(
            F.col("b_cnt") + F.coalesce(F.col("c_cnt"), F.lit(0)) >= 2
        ).select("g")
        report = _span_coverage(toks, bpos, dup_grams)
        report.write.mode("overwrite").parquet(
            os.path.join(audit_dir, f"batch_id={batch_id}")
        )
        (
            bcounts.select(
                "g",
                F.col("b_cnt").alias("n"),
                F.lit(batch_id).alias("src_batch"),
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("src_batch")
            .parquet(gram_index_dir)
        )

    return screen


SHINGLE_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("g", T.LongType()),
        T.StructField("n_g", T.LongType()),
        T.StructField("src_batch", T.LongType()),
    ]
)

NEAR_AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dup_of", T.LongType()),
        T.StructField("jaccard", T.DoubleType()),
        T.StructField("phase", T.StringType()),
    ]
)


def neardup_screen_sink(
    shingle_index_dir: str, accepted_dir: str, audit_dir: str, threshold: float | None = None
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: ingestion-time NEAR-duplicate screening —
    the streaming form of operators/dedup.py::llm_incremental_dedup's
    shingle screen, against a persistent per-doc shingle index (r8; the
    exact-hash screen above catches redelivery, this one catches the
    re-crawl-with-boilerplate-edits case the exact hash misses).

    Per epoch, two screens with one deterministic priority contract:

    1. CORPUS screen — each batch doc's word-3-gram shingle-hash set
       (`_SHINGLE_HASHES_SPARK`, shared verbatim with the batch
       operators) is joined on the gram key against prior epochs'
       admitted shingles; Jaccard >= threshold against ANY indexed doc
       rejects the batch doc. Per-doc set sizes ride DENORMALIZED on the
       index rows (`n_g`), so the screen never re-aggregates the index.
    2. WITHIN-BATCH screen — among corpus-screen survivors, a doc is
       rejected when a LOWER-doc_id survivor is a near-dup (one
       priority-ordered pass, the `llm_semdedup` keep-contract: the
       lower-id neighbor's own fate does not resurrect the higher-id
       doc — no iteration, no connected components at ingest time).

    Survivors land in a batchId-keyed accepted directory and their
    (doc_id, g, n_g) rows are admitted into the epoch's own
    ``src_batch=N`` index partition; rejected docs land in a batchId-
    keyed audit (doc_id, best-matching dup_of, jaccard on the 1e-6
    half-up grid, phase 'corpus'|'batch') — ids and scores only, no
    text. Docs with fewer than 3 words have empty shingle sets and are
    always admitted here (they cannot reach a positive Jaccard; exact
    redelivery of short docs is the exact screen's job).

    Replay safety is the module's standard contract: the corpus screen
    reads only ``src_batch < batch_id`` partitions (partition-pruned),
    and all three writes are epoch-scoped overwrites — a replayed epoch
    reproduces byte-identical accepted/audit/index contributions.

    Scale shape: index rows are (8-byte gram hash, doc_id, n_g) — no
    text, O(distinct shingles) ~ O(tokens) per admitted doc, the same
    weight class as the span-gram index; the probe is one gram-keyed
    equi-join whose candidate volume is bounded by shared-shingle pairs
    (shingles are near-unique across unrelated docs). Boilerplate-heavy
    corpora skew the gram key — the df-cap (llm_ngram_jaccard_capped)
    and banded-MinHash (llm_minhash_banded) mitigations compose here
    unchanged; at that point the index stores band keys instead of raw
    shingles and state drops to O(bands) per doc."""
    from ..operators.dedup import _JACCARD_THRESHOLD, _SHINGLE_HASHES_SPARK

    thr = _JACCARD_THRESHOLD if threshold is None else float(threshold)

    def screen(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession

        ws = F.filter(F.split("text", " "), lambda w: w != "")
        hs = (
            batch_df.select("doc_id", ws.alias("ws"))
            .filter(F.size("ws") >= 3)
            .select("doc_id", F.expr(_SHINGLE_HASHES_SPARK).alias("hs"))
        )
        bsh = hs.select(
            "doc_id", F.size("hs").alias("n_g"), F.explode("hs").alias("g")
        ).localCheckpoint(eager=False)

        jac = F.col("n_common") / (F.col("nb") + F.col("nc") - F.col("n_common"))
        grid = F.floor(jac * 1e6 + F.lit(0.5)) / 1e6  # the repo's half-up grid

        def best_match(pairs: DataFrame) -> DataFrame:
            """(doc_id, dup_of, jaccard): the highest-Jaccard qualifying
            neighbor per rejected doc, ties to the lower neighbor id."""
            return (
                pairs.filter(jac >= thr)
                .groupBy("doc_id")
                .agg(
                    F.min(F.struct((-jac).alias("nj"), F.col("nbr").alias("id"))).alias(
                        "m"
                    ),
                    F.max(grid).alias("jaccard"),
                )
                .select("doc_id", F.col("m.id").alias("dup_of"), "jaccard")
            )

        if os.path.isdir(shingle_index_dir) and any(
            e.startswith("src_batch=") for e in os.listdir(shingle_index_dir)
        ):
            prior = (
                spark.read.schema(SHINGLE_INDEX_SCHEMA)
                .option("basePath", shingle_index_dir)
                .parquet(shingle_index_dir)
                .filter(F.col("src_batch") < batch_id)  # replay: ignore own epoch
            )
            cpairs = (
                bsh.alias("b")
                .join(prior.alias("c"), F.col("b.g") == F.col("c.g"))
                .groupBy(
                    F.col("b.doc_id").alias("doc_id"),
                    F.col("c.doc_id").alias("nbr"),
                )
                .agg(
                    F.count("*").alias("n_common"),
                    F.first("b.n_g").alias("nb"),
                    F.first("c.n_g").alias("nc"),
                )
            )
            rej_corpus = best_match(cpairs).withColumn("phase", F.lit("corpus"))
        else:
            rej_corpus = spark.createDataFrame([], NEAR_AUDIT_SCHEMA)
        rej_corpus = rej_corpus.localCheckpoint(eager=False)

        surv = bsh.join(rej_corpus.select("doc_id"), "doc_id", "left_anti")
        bpairs = (
            surv.alias("a")
            .join(
                surv.alias("b"),
                (F.col("a.g") == F.col("b.g"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("b.doc_id").alias("doc_id"),
                F.col("a.doc_id").alias("nbr"),
            )
            .agg(
                F.count("*").alias("n_common"),
                F.first("b.n_g").alias("nb"),
                F.first("a.n_g").alias("nc"),
            )
        )
        rej_batch = best_match(bpairs).withColumn("phase", F.lit("batch"))

        audit = rej_corpus.unionByName(rej_batch).localCheckpoint(eager=False)
        audit.write.mode("overwrite").parquet(
            os.path.join(audit_dir, f"batch_id={batch_id}")
        )
        accepted = batch_df.join(audit.select("doc_id"), "doc_id", "left_anti")
        accepted.write.mode("overwrite").parquet(
            os.path.join(accepted_dir, f"batch_id={batch_id}")
        )
        (
            bsh.join(audit.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", "g", "n_g", F.lit(batch_id).alias("src_batch"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("src_batch")
            .parquet(shingle_index_dir)
        )

    return screen


def compact_shingle_index(spark, shingle_index_dir: str, out_dir: str) -> None:
    """Fold the near-dup screen's epoch-accumulated shingle partitions
    into a single ``src_batch=0`` generation at `out_dir` — the shingle
    analog of `compact_span_index`, so a long-running ingest stops paying
    epochs × files per screen.

    Unlike the span index there is nothing to aggregate: rows are
    per-doc (doc_id, g, n_g) facts, so the fold is a file collapse
    (cluster by gram key so the screen's equi-join probes fewer row
    groups). Screening against the folded generation is byte-identical —
    the sink consumes the row set, and every folded epoch is < any
    future batch_id, so the ``src_batch < batch_id`` replay guard admits
    the whole folded history. Rows keep their doc_id, so RTBF stays a
    plain per-doc filter: the ``_COMPACTED`` marker just tells
    `corpus_retract` to rewrite the folded generation instead of the
    victims' original epoch partitions."""
    idx = (
        spark.read.schema(SHINGLE_INDEX_SCHEMA)
        .option("basePath", shingle_index_dir)
        .parquet(shingle_index_dir)
    )
    (
        idx.repartition("g")
        .select("doc_id", "g", "n_g", F.lit(0).alias("src_batch"))
        .write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy("src_batch")
        .parquet(out_dir)
    )
    open(os.path.join(out_dir, "_COMPACTED"), "w").close()

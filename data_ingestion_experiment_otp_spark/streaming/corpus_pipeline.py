"""The LLM-corpus counterpart of streaming/pipeline.py: one continuously-
ingested stream of multimodal documents (text + embedding) drives, per
epoch, the full training-data ingestion path —

  dedup screen → semantic-curation funnel → incremental vector index
                                          → incremental text index

1. `corpus_index.corpus_dedup_sink` admits only first-seen content
   (content-hash anti-join against the epoch-partitioned corpus index);
2. the admitted survivors pass the curation funnel
   (`curation.curation_sink`: repetition gate, calibrated per-source
   quality floors, nearest-centroid assignment, cluster-partitioned
   layout);
3. the ADMITTED documents' embeddings are hashed into the incremental
   sign-LSH vector index (`vector_index.vector_index_sink`), searchable
   next epoch with no rebuild — the index covers the whole deduped
   corpus, not just the curated mixture: similarity search wants every
   unique document, while curation only shapes what training reads;
4. the admitted documents' TEXT is tokenized once into the incremental
   inverted index (`text_index.text_index_sink`), so the same corpus is
   keyword-searchable (BM25) beside vector-searchable — the two serving
   indexes cover the identical deduped document set by construction.

The ordering is the data contract, not an accident: curation and both
indexes see only DEDUPED documents, so a re-crawled duplicate can
neither re-enter the curated mixture nor inflate ANN/BM25 candidate
sets. Stages 2-4 read the epoch's admitted output back from its
batchId-keyed directory rather than re-deriving it, so all five stores
stay byte-consistent under replay: every store writes only its own
``batch_id=N`` / ``src_batch=N`` partitions (dynamic overwrite), and a
replayed epoch rewrites the identical content in each.

At 100 TB each stage keeps its own documented scale shape (hash-only
anti-join; scan-side gates + broadcast matmul; id-only pruned postings +
int8 payload); the composition adds no new shuffle — the only cross-stage
artifact is the admitted parquet partition itself.

Reference parity: this is `SURVEY.md §3.1`'s accept-then-persist hot path
generalized from one scalar cursor to four content-addressed stores;
the checkpoint-after-sinks inversion is identical to
streaming/pipeline.py's.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from .corpus_index import corpus_dedup_sink
from .curation import curation_sink
from .text_index import text_index_sink
from .vector_index import vector_index_sink

DOC_STREAM_SCHEMA = (
    "doc_id long, source string, n_chars long, text string, embedding array<float>"
)


def corpus_ingest_dirs(work_dir: str) -> dict[str, str]:
    """The five stores the pipeline maintains under one root."""
    return {
        "dedup_index": os.path.join(work_dir, "dedup_index"),
        "accepted": os.path.join(work_dir, "accepted"),
        "curated": os.path.join(work_dir, "curated"),
        "vector_index": os.path.join(work_dir, "vector_index"),
        "text_index": os.path.join(work_dir, "text_index"),
    }


def corpus_ingest_epoch(
    work_dir: str, centroids: list, quality_min: dict[str, float]
):
    """The per-epoch function: built separately from the stream so a
    replay (same stores, same params, same batch_id) can be driven
    directly in tests — which is also exactly what a checkpoint recovery
    does."""
    dirs = corpus_ingest_dirs(work_dir)
    screen = corpus_dedup_sink(dirs["dedup_index"], dirs["accepted"])
    curate = curation_sink(dirs["curated"], centroids, quality_min)
    index = vector_index_sink(dirs["vector_index"])
    tindex = text_index_sink(dirs["text_index"])

    def epoch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            screen(batch_df, batch_id)
            # read the epoch's own admitted partition back: the write is
            # the dedup barrier, and replays re-read the same bytes
            admitted = batch_df.sparkSession.read.parquet(
                os.path.join(dirs["accepted"], f"batch_id={batch_id}")
            )
            curate(admitted, batch_id)
            index(
                admitted.select(F.col("doc_id").alias("vec_id"), "embedding"),
                batch_id,
            )
            tindex(admitted.select("doc_id", "text"), batch_id)
        finally:
            batch_df.unpersist()

    return epoch


def start_corpus_ingest(
    spark: SparkSession,
    docs_dir: str,
    work_dir: str,
    centroids: list,
    quality_min: dict[str, float],
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start the composed ingestion stream over a parquet document feed.
    `centroids` / `quality_min` are the calibrate-once parameters the
    curation sink documents (a control-plane input, not per-batch
    state)."""
    epoch = corpus_ingest_epoch(work_dir, centroids, quality_min)
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
        .writeStream.foreachBatch(epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

"""Streaming incremental vector index: the embedding-side analog of
corpus_index.corpus_dedup_sink.

Each micro-batch of vectors is hashed into the SAME multi-table sign-LSH
buckets the batch ANN uses (operators/similarity.py::bucket_udf — one
plane matrix, derived deterministically, shared by construction) and
appended to a persistent bucket index partitioned by the admitting epoch.
ANN queries then run against the index alone: hash the query, read only
matching (table, bucket) groups, re-rank the candidates with the exact
cosine. New vectors become searchable one epoch after arrival with no
index rebuild — the production contract for a continuously-ingested
embedding corpus.

Replay safety: the index write is scoped to the epoch's own
``src_batch=N`` partition with dynamic partition overwrite, so a replayed
epoch rewrites identical bytes instead of double-indexing (same contract
as every sink in this package).

Scale notes: the index stores (vec_id, tbl, bucket, v) — tables× the
corpus in row count, but the payload of a 100 TB deployment would be the
int8/PQ-quantized vector (operators/similarity.py::llm_embed_quantize /
llm_embed_pq) rather than the raw float64s stored here for exact
re-ranking at fixture scale. Query cost is bounded exactly as in the
batch ANN: the query side broadcasts (bounded by contract), candidates
come from same-bucket joins, and only (query_id, vec_id, cosine) scalars
move after candidate generation. Bucketing the index files by `bucket`
would additionally partition-prune the scan per query batch.

Reference parity: the reference persists one scalar cursor as its only
index (`api/main.py:258-290`); this generalizes that durable bookkeeping
to a content-addressed geometric index, the same step corpus_index takes
for text hashes.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.similarity import _LSH_BITS, _LSH_TABLES, _cosine, bucket_udf


def vector_index_sink(
    index_dir: str, tables: int = _LSH_TABLES, bits: int = _LSH_BITS
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: hash each (vec_id, embedding) micro-batch
    into per-table buckets and append to the epoch-partitioned index."""

    def index_batch(batch_df: DataFrame, batch_id: int) -> None:
        vec = batch_df.filter(F.col("embedding").isNotNull()).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        rows = vec.select(
            "vec_id",
            "v",
            F.posexplode(bucket_udf(tables, bits)("v")).alias("tbl", "bucket"),
        )
        (
            rows.select("vec_id", "tbl", "bucket", "v", F.lit(batch_id).alias("src_batch"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("src_batch")
            .parquet(index_dir)
        )

    return index_batch


def ann_query_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    tables: int = _LSH_TABLES,
    bits: int = _LSH_BITS,
) -> DataFrame:
    """Top-k ANN over the persisted index for a bounded query frame
    (query_id, embedding): hash queries with the same planes, join on
    (tbl, bucket), dedup candidates across tables, exact-cosine re-rank.
    Self-matches (query_id == vec_id) are excluded, mirroring
    sim_lsh_topk."""
    from pyspark.sql import Window as W

    q = queries.filter(F.col("embedding").isNotNull()).select(
        F.col("query_id"), F.col("embedding").cast("array<double>").alias("q")
    )
    qb = q.select(
        "query_id", "q", F.posexplode(bucket_udf(tables, bits)("q")).alias("tbl", "bucket")
    )
    idx = spark.read.option("basePath", index_dir).parquet(index_dir)
    cand = (
        idx.join(F.broadcast(qb), on=["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "q", "v")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.withColumn("cosine_raw", _cosine("q", "v")).filter(
        F.col("cosine_raw").isNotNull()
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine_raw").desc(), F.col("vec_id"))
    return (
        scored.select("query_id", "vec_id", "cosine_raw")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", F.round("cosine_raw", 6).alias("cosine"), "rn")
    )


def index_stats(spark: SparkSession, index_dir: str) -> dict:
    """Epoch/row accounting for tests and audits."""
    if not os.path.isdir(index_dir):
        return {"rows": 0, "epochs": 0}
    idx = spark.read.option("basePath", index_dir).parquet(index_dir)
    epochs = idx.select("src_batch").distinct().count()
    return {"rows": idx.count(), "epochs": epochs}

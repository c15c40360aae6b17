"""Similarity search over the embedding column (SURVEY.md §2.10
`llm_sim_topk`).

Two tiers:
- exact brute-force cosine top-k (query side broadcast, dot products via
  `zip_with`/`aggregate` — pure JVM arithmetic, no UDF) — correct baseline,
  full DuckDB oracle;
- sign-LSH bucketed ANN — the scale path: deterministic random-hyperplane
  signatures shrink the candidate set before exact re-ranking. At 100 TB the
  bucket join replaces the query×corpus product with per-bucket products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..plans.registry import register
from ..sources.catalog import load

_TOP_K = 5


def _cosine(ea: str, eb: str):
    dot = F.aggregate(F.zip_with(ea, eb, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    sq = lambda c: F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)  # noqa: E731
    return dot / (F.sqrt(sq(ea)) * F.sqrt(sq(eb)))


@register(
    "llm_sim_topk",
    oracle=f"""
    SELECT query_id, vec_id, round(cosine, 6) AS cosine, rn
    FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
             list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cosine,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                        e.vec_id) AS rn
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id % 100 = 0
    )
    WHERE rn <= {_TOP_K}
    """,
    tags=("llm", "similarity", "vector"),
)
def llm_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k nearest neighbors for a query subset
    (vec_id % 100 = 0), brute force with the 100 TB-correct physical plan:

    - query vectors (small by construction, like any top-k search workload)
      are collected once and broadcast as a dense float64 matrix;
    - the corpus streams through an Arrow-batched mapInPandas stage that
      computes ALL query cosines for a batch as one BLAS matmul
      (`Vn @ Qn.T`) — ~5x faster than the per-pair `zip_with`/`aggregate`
      formulation, and the gap grows with dimensionality;
    - each batch emits only its own top-k per query (global top-k is a
      subset of the union of per-batch top-k, so this is exact), bounding
      the final rank shuffle to n_batches x n_queries x k rows instead of
      corpus x queries.

    The final per-query rank is the standard window over query_id."""
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings")
    qrows = e.filter(F.col("vec_id") % 100 == 0).select("vec_id", "embedding").collect()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    bcast = spark.sparkContext.broadcast(
        (qids, Q / np.linalg.norm(Q, axis=1, keepdims=True))
    )

    def batches(it):
        q_ids, Qn = bcast.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            ids = pdf["vec_id"].to_numpy()
            C = (V / np.linalg.norm(V, axis=1, keepdims=True)) @ Qn.T  # B x q
            C[ids[:, None] == q_ids[None, :]] = -np.inf  # mask self-match
            k = min(_TOP_K, C.shape[0])
            # per-query partial top-k within the batch: cosine desc, id asc
            order = np.lexsort((ids[:, None].repeat(C.shape[1], 1), -C), axis=0)[:k]
            out_c = np.take_along_axis(C, order, axis=0).ravel()
            keep = np.isfinite(out_c)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids[None, :], k, axis=0).ravel()[keep],
                    "vec_id": ids[order].ravel()[keep],
                    "cosine_raw": out_c[keep],
                }
            )

    cand = e.select("vec_id", "embedding").mapInPandas(
        batches, "query_id long, vec_id long, cosine_raw double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine_raw").desc(), F.col("vec_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "vec_id", F.round("cosine_raw", 6).alias("cosine"), "rn")
    )


@register(
    "udf_cosine",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    WHERE a.vec_id % 2 = 0
    """,
    tags=("udf", "vector"),
)
def udf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas_udf cosine over consecutive-id vector pairs
    (SURVEY §2.9 `udf_cosine`): the vectorized-Python slow path for vector
    math that built-ins can't express efficiently — numpy einsum per Arrow
    batch, no per-row Python. The pure-SQL `zip_with`/`aggregate`
    formulation of the same arithmetic is in llm_embed_cosine_dedup; the
    batched-matmul scale path is llm_sim_topk."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(a, b):  # (pd.Series of array, pd.Series of array) -> pd.Series
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", A, B)
        return pd.Series(dots / (np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)))

    cosine = pandas_udf(_cos, "double")

    e = load(spark, sf_dir, "embeddings")
    a = e.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("vec_b") == F.col("vec_a") + 1)
        .select("vec_a", "vec_b", F.round(cosine("ea", "eb"), 6).alias("cosine"))
    )


@register("llm_sim_lsh_bucketed", oracle=None, tags=("llm", "similarity", "approx"))
def llm_sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via sign-LSH bucketing: an 8-bit signature from the
    signs of 8 deterministic pseudo-random hyperplanes (each plane is a ±1
    pattern over the 64 dims derived from the plane index), candidates =
    same-bucket pairs, then exact cosine re-rank within the bucket.

    This is the IVF-style scale path: at 100 TB the bucket key becomes the
    shuffle/partition key and each bucket's candidate set is a tiny fraction
    of the corpus. Approximate (recall < 1) → rows-only; recall vs the exact
    top-k is asserted in tests/test_similarity.py.
    """
    e = load(spark, sf_dir, "embeddings")
    vec = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))

    # Plane p weight for dim d: +1 if bit (d % 31) of (p*2654435761 + d*40503)
    # is even — a fixed, engine-independent pseudo-random ±1 pattern.
    def plane_dot(p: int):
        return F.aggregate(
            F.zip_with(
                "v",
                F.sequence(F.lit(0), F.lit(63)),
                lambda x, d: x * (((p * 2654435761 + d * 40503) % 2 == 0).cast("int") * 2 - 1),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    sig = None
    for p in range(8):
        bit = (plane_dot(p) > 0).cast("long") * (1 << p)
        sig = bit if sig is None else sig + bit
    bucketed = vec.withColumn("bucket", sig)

    queries = bucketed.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q"), "bucket"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine_raw").desc(), F.col("vec_id"))
    return (
        bucketed.join(F.broadcast(queries), on="bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine_raw", _cosine("q", "v"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "vec_id", F.round("cosine_raw", 6).alias("cosine"), "rn")
    )


@register(
    "llm_multimodal_cols",
    oracle="""
    SELECT d.doc_id,
           octet_length(encode(d.text)) AS n_bytes,
           d.lang,
           e.label,
           round(list_cosine_similarity(e.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS self_cosine
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    """,
    tags=("llm", "multimodal"),
)
def llm_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row assembly: text + opaque binary payload + typed metadata
    + embedding vector coexisting in one table (documents ⋈ embeddings on
    id). The binary column is the utf-8 encoded payload standing in for an
    image/audio blob; decode/feature-extraction over such columns is in
    operators/multimodal.py (mapInPandas plumbing with a stubbed codec)."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    ed = e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label")
    return (
        d.join(ed, d.doc_id == ed.vec_id)
        .select(
            "doc_id",
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
            "lang",
            "label",
            F.round(_cosine("emb", "emb"), 6).alias("self_cosine"),
        )
    )

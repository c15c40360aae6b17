"""The composed LLM training-data preparation pipeline (SURVEY.md §2.10
capstone) — the §3.1-style end-to-end composition for the ENGINE-TARGET
workload, the way `plans/flagship.py` composes the reference's OTP hot
path.

One pass from raw corpus to training-ready shards:

    documents
      → exact dedup            (keep min doc_id per sha256(text))
      → benchmark holdout      (doc_id % 50 == 0 reserved, never trained on)
      → decontamination        (drop docs sharing any 3-gram shingle with
                                the holdout — llm_decontaminate's flags)
      → quality gate           (llm_quality_score >= 0.5, compared on the
                                ROUNDED score so both engines gate
                                identically at the threshold)
      → stable shard assign    (hash(doc_id) % 64 — append-safe)

Every stage reuses the single-stage builder registered for it, so the
composition exercises the same code paths the per-stage oracles verify,
and the composed DuckDB oracle is spliced from the same SQL fragments
(stopword list, shingle expression, hash constants) the stages use. The
plan stays one pipeline: dedup keepers and contamination flags are
doc_id (semi/anti) joins, quality is a scan-side projection, the shard
key is arithmetic — no operation outside what the stage operators
already proved scale-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import _SHINGLES_DUCK, llm_decontaminate, llm_exact_dedup
from ..operators.sampling import _A, _MOD, _bucket
from ..operators.text_analysis import _STOPWORDS_SQL, llm_quality_score
from ..plans.registry import register
from ..sources.catalog import load

_QUALITY_FLOOR = 0.5


@register(
    "pipeline_llm_dataprep",
    oracle=f"""
    WITH keepers AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
    ),
    q AS (
      SELECT doc_id,
             round(
               0.4 * least(1.0, n_chars / 200.0)
               + 0.3 * (1.0 - len(list_filter(words, w -> w IN {_STOPWORDS_SQL})) / len(words))
               + 0.3 * (len(list_distinct(words)) / len(words)),
             6) AS quality
      FROM (
        SELECT doc_id, n_chars,
               list_filter(string_split(text, ' '), w -> w <> '') AS words
        FROM documents
      )
    ),
    ws_t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS w FROM ws_t WHERE len(ws) >= 3
    ),
    dirty AS (
      SELECT DISTINCT t.doc_id
      FROM tok t JOIN tok b ON b.w = t.w
      WHERE b.doc_id % 50 = 0 AND t.doc_id % 50 <> 0
    )
    SELECT d.doc_id, d.lang, q.quality,
           (d.doc_id * {_A}) % {_MOD} % 64 AS shard
    FROM documents d
    JOIN keepers USING (doc_id)
    JOIN q USING (doc_id)
    WHERE d.doc_id % 50 <> 0
      AND q.quality >= {_QUALITY_FLOOR}
      AND NOT EXISTS (SELECT 1 FROM dirty WHERE dirty.doc_id = d.doc_id)
    """,
    tags=("llm", "pipeline"),
)
def pipeline_llm_dataprep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw corpus → training-ready rows: dedup keepers (semi join),
    benchmark holdout excluded, contaminated docs dropped (anti join on
    llm_decontaminate's flags), quality-gated on the rounded score, and
    stable-sharded. Output one row per surviving document with its
    stratum, score, and shard."""
    d = load(spark, sf_dir, "documents")
    keepers = llm_exact_dedup(spark, sf_dir).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    quality = llm_quality_score(spark, sf_dir)
    dirty = llm_decontaminate(spark, sf_dir).select("doc_id")
    return (
        d.join(keepers, "doc_id", "left_semi")
        .filter(F.col("doc_id") % 50 != 0)
        .join(dirty, "doc_id", "left_anti")
        .join(quality, "doc_id")
        .filter(F.col("quality") >= _QUALITY_FLOOR)
        .select(
            "doc_id",
            "lang",
            "quality",
            (_bucket("doc_id") % 64).alias("shard"),
        )
    )

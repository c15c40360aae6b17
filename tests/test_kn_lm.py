"""Trained interpolated Kneser-Ney 4-gram LM (operators/kn_lm.py).

The cross-engine gate (training + store round-trip + serving arithmetic
vs the full from-scratch CTE replay) runs in test_oracle_parity.py; here
we pin what makes KN a DIFFERENT model, not a deeper JM:

- THE CONTINUATION-COUNT DISAGREEMENT on a planted corpus: "francisco"
  and "common" have identical corpus frequency, but francisco only ever
  follows "san" while common follows six distinct words. The
  Jelinek-Mercer trigram scores two probe docs differing only in that
  word IDENTICALLY (ML unigram ratios see only the counts); the KN model
  scores the francisco probe decisively worse (one continuation type →
  tiny continuation probability) — Kneser & Ney's motivating example,
  executed against both committed artifacts.
- The artifact is a real pruned MODEL: singleton 4-grams are absent,
  frequent ones survive, the store commits once.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from data_ingestion_experiment_otp_spark.operators.kn_lm import (
    _KN_PRUNE_MIN,
    _KN_SCHEMA,
    _kn_scores,
    kn4_model_dir,
    llm_kn4_perplexity,
)
from data_ingestion_experiment_otp_spark.operators.ngram_lm import (
    llm_trigram_perplexity,
)

# 6 docs put "san francisco" at positions 3-4 (full 4-gram context);
# 6 docs put "common" at position 4 after six DISTINCT predecessors;
# 2 probe docs differ ONLY in their doc-initial token. Every other
# position of the two probes scores identically under BOTH models
# (verified by construction: the shared suffix "s t u v" builds the same
# pruned/surviving n-grams for both).
_DOCS = (
    [(i, "p q r san francisco", "en") for i in range(6)]
    + [(10 + i, f"p q r u{i} common", "en") for i in range(6)]
    + [(20, "francisco s t u v", "en"), (21, "common s t u v", "en")]
)


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("kn_planted"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in _DOCS], pa.int64()),
            "text": pa.array([r[1] for r in _DOCS], pa.string()),
            "lang": pa.array([r[2] for r in _DOCS], pa.string()),
            "source": pa.array(["planted"] * len(_DOCS), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in _DOCS], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    return d


class TestContinuationCounts:
    def test_kn_splits_what_jm_cannot(self, spark, planted_dir):
        jm = {
            r["doc_id"]: r["avg_bits"]
            for r in llm_trigram_perplexity(spark, planted_dir).collect()
        }
        # identical counts -> the ML-ratio model cannot tell the probes apart
        assert jm[20] == pytest.approx(jm[21], abs=1e-6)
        kn = {
            r["doc_id"]: r["avg_bits"]
            for r in llm_kn4_perplexity(spark, planted_dir).collect()
        }
        # one continuation type vs six: the single-context word is
        # decisively more surprising to KN (analytic gap ~0.6 bits)
        assert kn[20] > kn[21] + 0.4

    def test_served_scores_replay_fresh_training(self, spark, planted_dir):
        a = sorted(
            (r["doc_id"], r["dl"], r["avg_bits"])
            for r in _kn_scores(spark, planted_dir).collect()
        )
        b = sorted(
            (r["doc_id"], r["dl"], r["avg_bits"])
            for r in _kn_scores(spark, planted_dir).collect()
        )
        assert a == b and len(a) == len(_DOCS)


class TestKnArtifactStore:
    def test_store_is_pruned_and_committed_once(self, spark, planted_dir):
        d1 = kn4_model_dir(spark, planted_dir)
        d2 = kn4_model_dir(spark, planted_dir)
        assert d1 == d2 and os.path.isfile(os.path.join(d1, "_COMMITTED"))
        m = spark.read.schema(_KN_SCHEMA).parquet(
            os.path.join(d1, "model.parquet")
        )
        g4 = m.filter(F.col("kind") == "g4")
        # every stored 4-gram cleared the floor...
        assert g4.filter(F.col("n") < _KN_PRUNE_MIN).count() == 0
        # ...the singleton (p, q, r, u0) was pruned away...
        assert (
            g4.filter(
                (F.col("a") == "p")
                & (F.col("b") == "q")
                & (F.col("c") == "r")
                & (F.col("w") == "u0")
            ).count()
            == 0
        )
        # ...and the 6x (q, r, san, francisco) survived
        assert (
            g4.filter(
                (F.col("a") == "q")
                & (F.col("b") == "r")
                & (F.col("c") == "san")
                & (F.col("w") == "francisco")
            ).count()
            == 1
        )
        # the continuation recursion recorded francisco's single context
        # vs common's six
        g1 = {
            r["w"]: r["n"]
            for r in m.filter(F.col("kind") == "g1").collect()
        }
        assert g1["francisco"] == 1 and g1["common"] == 6

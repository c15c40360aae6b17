"""Decontamination tiers (operators/dedup.py): the exact shared-n-gram
screen vs the fuzzy near-dup pass — planted corpora pinning the split of
labor the docstrings claim (exact = recall tier, one shared 3-gram
flags; fuzzy = precision tier, only a near-duplicate of a benchmark doc
flags, with the matched doc and Jaccard as evidence). The cross-engine
hash gates for both live in test_oracle_parity.py; these tests pin the
SEMANTICS on corpora built to separate the tiers.
"""

from __future__ import annotations

import os

import pytest

from data_ingestion_experiment_otp_spark.operators.dedup import (
    _JACCARD_THRESHOLD,
    llm_decontaminate,
    llm_decontaminate_fuzzy,
    llm_decontaminate_report,
)

# benchmark doc (doc_id 0 -> % 50 == 0). 24 words, distinctive vocabulary.
BENCH = (
    "zeta quark lattice proton muon gluon hadron lepton boson tensor "
    "spinor photon baryon meson quanta isospin parity charm strange top "
    "bottom flavor color charge"
)

# shares exactly one 3-gram run ("zeta quark lattice") with BENCH, rest
# disjoint: the exact tier must flag it, the fuzzy tier must NOT (set
# overlap far below the near-dup threshold)
PHRASE_ONLY = (
    "report begins zeta quark lattice then diverges into entirely other "
    "topics about farming weather markets crops irrigation housing roads "
    "bridges tunnels schools parks rivers"
)

# a light paraphrase of BENCH: one word swapped mid-text -> trigram set
# overlap stays far above the threshold; both tiers must flag it, and the
# fuzzy tier must name doc 0 as the source
NEAR_DUP = BENCH.replace("isospin", "hypercharge")

# clean: no shared 3-gram with BENCH at all
CLEAN = (
    "completely unrelated training document about cooking recipes bread "
    "flour yeast water salt oven temperature timing kneading proofing "
    "crust crumb texture flavor notes"
)


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("decon_fixture"))
    rows = [
        (0, BENCH, "xx", "bench", len(BENCH)),
        (1, PHRASE_ONLY, "xx", "web", len(PHRASE_ONLY)),
        (2, NEAR_DUP, "xx", "web", len(NEAR_DUP)),
        (3, CLEAN, "xx", "web", len(CLEAN)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


class TestTierSeparation:
    def test_exact_tier_flags_any_shared_gram(self, spark, fixture_dir):
        got = {
            r["doc_id"]: r["n_shared_ngrams"]
            for r in llm_decontaminate(spark, fixture_dir).collect()
        }
        assert set(got) == {1, 2}  # phrase-only AND near-dup; clean passes
        assert got[1] == 1  # exactly the planted phrase run
        assert got[2] > 15  # the paraphrase shares nearly everything

    def test_fuzzy_tier_flags_only_near_duplicates(self, spark, fixture_dir):
        rows = llm_decontaminate_fuzzy(spark, fixture_dir).collect()
        got = {(r["doc_id"], r["bench_doc_id"]): r["jaccard"] for r in rows}
        assert set(got) == {(2, 0)}, (
            "fuzzy tier must flag the paraphrase against its source and "
            f"nothing else, got {got}"
        )
        assert got[(2, 0)] >= _JACCARD_THRESHOLD
        # the evidence is a real near-dup score, not a grazing overlap
        assert got[(2, 0)] > 0.7

    def test_report_joins_both_tiers_into_verdicts(self, spark, fixture_dir):
        """The decision artifact: phrase-only overlap stays reviewable
        ('overlap', no fuzzy evidence), the paraphrase is the unambiguous
        drop ('near_dup' with its score), clean docs are absent."""
        rep = {
            r["doc_id"]: r.asDict()
            for r in llm_decontaminate_report(spark, fixture_dir).collect()
        }
        assert set(rep) == {1, 2}
        assert rep[1]["verdict"] == "overlap"
        assert rep[1]["n_shared_ngrams"] == 1
        assert rep[1]["max_jaccard"] is None
        assert rep[1]["n_bench_neardups"] == 0
        assert rep[2]["verdict"] == "near_dup"
        assert rep[2]["max_jaccard"] > 0.7
        assert rep[2]["n_bench_neardups"] == 1

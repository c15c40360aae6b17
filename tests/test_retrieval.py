"""BM25 retrieval + containment dedup: behavioral invariants and the plan
shapes that make them 100 TB-viable. Value correctness is covered by the
DuckDB oracles in tests/test_oracle_parity.py (auto-discovered)."""

from __future__ import annotations

import contextlib
import io

from data_ingestion_experiment_otp_spark.operators.dedup import (
    _CONTAINMENT_THRESHOLD,
    llm_containment_dedup,
    llm_ngram_jaccard,
)
from data_ingestion_experiment_otp_spark.operators.retrieval import (
    _QUERIES,
    _TOP_K,
    llm_bm25_topk,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestBM25:
    def test_topk_contract(self, spark, sf_dir):
        """Per query: ≤ k rows, rn is 1..k dense, ordered by (score desc,
        doc_id asc), every score positive (BM25+ idf is always > 0)."""
        rows = llm_bm25_topk(spark, sf_dir).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        assert set(by_q) == {qid for qid, _ in _QUERIES}
        for qid, group in by_q.items():
            group.sort(key=lambda r: r.rn)
            assert [r.rn for r in group] == list(range(1, len(group) + 1))
            assert len(group) <= _TOP_K
            key = [(-r.score, r.doc_id) for r in group]
            assert key == sorted(key), f"rank order broken for query {qid}"
            assert all(r.score > 0 for r in group)

    def test_more_hits_beats_fewer_at_same_length(self, spark, sf_dir):
        """Sanity on the scoring direction: the rank-1 doc for a query must
        score >= every other returned doc (already implied by the contract)
        and the score must saturate: no doc's score exceeds
        sum_t idf_t * (k1 + 1)."""
        import math

        rows = llm_bm25_topk(spark, sf_dir).collect()
        n_docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        )
        # loosest possible bound: every term at df=1
        max_idf = math.log(1 + (n_docs - 1 + 0.5) / 1.5)
        cap = 3 * max_idf * 2.2
        assert all(r.score < cap for r in rows)

    def test_plan_broadcasts_queries_and_limits_window(self, spark, sf_dir):
        """The query vocabulary joins must be broadcast (never shuffle the
        postings against a 7-row relation by exchange) and the rank filter
        must run as WindowGroupLimit (map-side partial top-k) so the final
        per-query exchange carries only candidate scalars."""
        p = _plan(llm_bm25_topk(spark, sf_dir))
        assert "BroadcastHashJoin" in p
        assert "WindowGroupLimit" in p
        # Text never crosses an exchange: every Exchange row in the plan
        # mentions only scalar columns (doc_id/term/tf/query_id/...), and
        # `text` itself is pruned at the scan.
        for line in p.splitlines():
            if "Exchange" in line:
                assert "text" not in line, line


class TestContainment:
    def test_contract_and_jaccard_relationship(self, spark, sf_dir):
        """overlap >= jaccard for every pair both emit (min-denominator vs
        union-denominator), contained_doc is always one of the pair and has
        the smaller-or-equal shingle set, and every overlap respects the
        threshold."""
        over = {
            (r.doc_a, r.doc_b): r
            for r in llm_containment_dedup(spark, sf_dir).collect()
        }
        jac = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in llm_ngram_jaccard(spark, sf_dir).collect()
        }
        assert over, "fixture corpus contains planted near-dups; expected pairs"
        for (da, db), r in over.items():
            assert da < db
            assert r.contained_doc in (da, db)
            assert r.overlap >= _CONTAINMENT_THRESHOLD - 1e-9
            assert r.overlap <= 1.0 + 1e-9
            if (da, db) in jac:
                assert r.overlap >= jac[(da, db)] - 1e-9

    def test_finds_subset_pairs_jaccard_misses(self, spark, tmp_path):
        """The reason this operator exists, proven on a planted corpus:
        a short doc fully embedded in a ~2x-longer one has Jaccard ≈ 0.5
        (below the 0.6 gate) but overlap = 1.0 — Jaccard misses it,
        containment flags it and names the short doc as contained. The
        fixture corpus's planted near-dups are same-length perturbations,
        so this subset case needs its own fixture."""
        half = " ".join(f"w{i}" for i in range(40))
        rest = " ".join(f"x{i}" for i in range(40))
        docs = spark.createDataFrame(
            [(1, half), (2, half + " " + rest), (3, rest.upper())],
            "doc_id int, text string",
        )
        docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        over = {
            (r.doc_a, r.doc_b): r
            for r in llm_containment_dedup(spark, str(tmp_path)).collect()
        }
        jac = {
            (r.doc_a, r.doc_b)
            for r in llm_ngram_jaccard(spark, str(tmp_path)).collect()
        }
        assert (1, 2) in over and over[(1, 2)].contained_doc == 1
        assert abs(over[(1, 2)].overlap - 1.0) < 1e-9
        assert (1, 2) not in jac, "expected the subset pair to fail Jaccard"


class TestBm25ContributionProperties:
    def test_positivity_and_monotonicity(self, spark):
        """The shared scoring expression must be: positive for any valid
        input (BM25+ idf), increasing in tf, decreasing in df, and
        decreasing in dl — checked over a seeded random grid evaluated in
        one Spark pass (base row + three single-variable perturbations)."""
        import random

        from pyspark.sql import functions as F

        from data_ingestion_experiment_otp_spark.operators.retrieval import (
            bm25_contribution,
        )

        rng = random.Random(17)
        rows = []
        for i in range(200):
            n = rng.uniform(10, 1e6)
            df = rng.uniform(1, n)
            tf = rng.uniform(1, 50)
            avgdl = rng.uniform(5, 5000)
            dl = rng.uniform(1, 4 * avgdl)
            rows.append((i, tf, df, n, dl, avgdl))
        base = spark.createDataFrame(
            rows, "i int, tf double, df double, n double, dl double, avgdl double"
        )
        c = bm25_contribution
        out = base.select(
            "i",
            c(F.col("tf"), F.col("df"), F.col("n"), F.col("dl"), F.col("avgdl")).alias("v"),
            c(F.col("tf") + 1, F.col("df"), F.col("n"), F.col("dl"), F.col("avgdl")).alias("v_tf"),
            c(F.col("tf"), F.least(F.col("df") + 1, F.col("n")), F.col("n"), F.col("dl"), F.col("avgdl")).alias("v_df"),
            c(F.col("tf"), F.col("df"), F.col("n"), F.col("dl") + 1, F.col("avgdl")).alias("v_dl"),
        ).collect()
        for r in out:
            assert r.v > 0, r
            assert r.v_tf > r.v, r          # more occurrences score higher
            assert r.v_df <= r.v + 1e-12, r  # commoner terms weigh less
            assert r.v_dl < r.v, r           # longer docs are normalized down


class TestPhraseSearch:
    def test_consecutiveness_and_repeated_terms(self, spark, tmp_path):
        """Planted corpus: the phrase must match only CONSECUTIVE tokens
        (doc with both words non-adjacent does not match), occurrences
        count overlapping starts correctly, and a repeated-term phrase
        cannot overcount partial alignments."""
        from pyspark.sql import functions as F

        from data_ingestion_experiment_otp_spark.operators.retrieval import (
            tokenize,
        )

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma"),       # phrase "alpha beta": 1 hit
                (2, "alpha gamma beta"),       # both words, not adjacent: 0
                (3, "alpha beta alpha beta"),  # 2 occurrences
                (4, "spam spam spam"),         # "spam spam": 2 overlapping
                (5, "beta alpha"),             # reversed order: 0
            ],
            "doc_id int, text string",
        )
        tok = docs.select(
            "doc_id", F.posexplode(tokenize()).alias("pos", "term")
        )

        def run(phrase_terms):
            q = spark.createDataFrame(
                [(0, t, i) for i, t in enumerate(phrase_terms)],
                "query_id int, qterm string, qpos int",
            )
            qlen = q.groupBy("query_id").agg(F.count("*").alias("L"))
            m = (
                tok.join(F.broadcast(q), tok.term == q.qterm)
                .groupBy(
                    "query_id", "doc_id",
                    (F.col("pos") - F.col("qpos")).alias("s"),
                )
                .agg(F.count("*").alias("n_hit"))
            )
            out = (
                m.join(F.broadcast(qlen), "query_id")
                .filter(F.col("n_hit") == F.col("L"))
                .groupBy("doc_id")
                .agg(F.count("*").alias("n"))
            )
            return {r.doc_id: r.n for r in out.collect()}

        assert run(["alpha", "beta"]) == {1: 1, 3: 2}
        assert run(["spam", "spam"]) == {4: 2}
        assert run(["beta", "gamma"]) == {1: 1}


class TestLeakageSafeSplit:
    def test_near_dup_pairs_never_straddle_the_split(self, spark, sf_dir):
        """The defining property: every near-dup pair (the jaccard pair
        graph, i.e. the edges the clusters were built from) must land
        entirely in train or entirely in val; singletons represent
        themselves; both splits are non-empty at fixture scale."""
        from data_ingestion_experiment_otp_spark.operators.sampling import (
            llm_leakage_safe_split,
        )

        split = {
            r.doc_id: (r.rep_id, r.split)
            for r in llm_leakage_safe_split(spark, sf_dir).collect()
        }
        pairs = [
            (r.doc_a, r.doc_b) for r in llm_ngram_jaccard(spark, sf_dir).collect()
        ]
        assert pairs, "fixture has planted near-dups"
        for a, b in pairs:
            assert split[a][1] == split[b][1], (a, b, split[a], split[b])
            assert split[a][0] == split[b][0], "pair split across reps"
        clustered = {d for pair in pairs for d in pair}
        singles = [d for d in split if d not in clustered]
        assert all(split[d][0] == d for d in singles)
        kinds = {s for _, s in split.values()}
        assert kinds == {"train", "val"}

"""URL/domain provenance tier (operators/provenance.py).

Cross-engine hash parity runs in test_oracle_parity.py (all three
entries carry exact oracles); here we pin the semantics the tier exists
for and the plan shapes its 100 TB argument claims.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_experiment_otp_spark.operators.provenance import (
    _BLOCKLIST,
    domain_col,
    llm_domain_blocklist_gate,
    llm_domain_cap,
    llm_domain_stats,
    llm_url_dedup,
    url_col,
    url_norm_col,
)
from data_ingestion_experiment_otp_spark.sources.catalog import load


class TestNormalization:
    def test_normalizer_survives_planted_mess(self, spark):
        rows = [
            (1, "https://www.D3.Example.ORG/doc/5/#sec"),
            (2, "https://d3.example.org/doc/5"),
            (3, "https://d3.example.org/doc/6/"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        got = {
            r["doc_id"]: (r["d"], r["n"])
            for r in df.select(
                "doc_id",
                domain_col(F.col("url")).alias("d"),
                url_norm_col(F.col("url")).alias("n"),
            ).collect()
        }
        # www./case/fragment/trailing-slash all collapse; paths distinguish
        assert got[1] == ("d3.example.org", "https://d3.example.org/doc/5")
        assert got[1] == got[2]
        assert got[3][1] == "https://d3.example.org/doc/6"

    def test_planted_urls_collide_only_after_normalization(self, spark, sf_dir):
        d = load(spark, sf_dir, "documents").select("doc_id")
        u = d.select("doc_id", url_col().alias("url"))
        raw = u.select("url").distinct().count()
        norm = u.select(url_norm_col(F.col("url")).alias("n")).distinct().count()
        total = u.count()
        # every doc_id < 260 has a distinct RAW url (case/www variants),
        # but the normalized space folds them into the lcm-260 classes
        assert norm == min(260, total)
        assert raw > norm


class TestTierSemantics:
    def test_gate_drops_exactly_the_blocklisted_domains(self, spark, sf_dir):
        kept = llm_domain_blocklist_gate(spark, sf_dir)
        assert kept.filter(F.col("domain").isin(*_BLOCKLIST)).count() == 0
        stats = {
            r["domain"]: r["n_docs"]
            for r in llm_domain_stats(spark, sf_dir).collect()
        }
        total = load(spark, sf_dir, "documents").count()
        blocked = sum(stats.get(d, 0) for d in _BLOCKLIST)
        assert kept.count() == total - blocked and blocked > 0

    def test_domain_cap_approx_tracks_exact_twin(self, spark, sf_dir):
        """Count-then-coin vs the exact window cap: under-cap domains
        keep EVERYTHING identically; capped domains keep ~cap docs
        (binomial band); the approx keep-set is always a subset of the
        domain's members."""
        from collections import Counter

        from data_ingestion_experiment_otp_spark.operators.provenance import (
            _DOMAIN_CAP,
            llm_domain_cap_approx,
        )

        exact_rows = llm_domain_cap(spark, sf_dir).collect()
        full = {r["domain"]: r["n_domain"] for r in exact_rows}
        exact = Counter(r["domain"] for r in exact_rows)
        approx_rows = llm_domain_cap_approx(spark, sf_dir).collect()
        approx = Counter(r["domain"] for r in approx_rows)
        assert set(approx) <= set(full)
        for dom, n in full.items():
            if n <= _DOMAIN_CAP:
                # rate >= 1: the coin keeps every member, exactly the twin
                assert approx[dom] == exact[dom] == n, dom
            else:
                # binomial around cap: 4 sigma of Bin(n, cap/n)
                import math

                sigma = math.sqrt(_DOMAIN_CAP * (1 - _DOMAIN_CAP / n))
                assert abs(approx[dom] - _DOMAIN_CAP) <= 4 * sigma + 1, (
                    dom,
                    n,
                    approx[dom],
                )

    def test_url_dedup_accounts_for_every_doc(self, spark, sf_dir):
        total = load(spark, sf_dir, "documents").count()
        agg = llm_url_dedup(spark, sf_dir).agg(
            F.count("*").alias("groups"),
            F.sum("n_dups").alias("dups"),
        ).first()
        assert agg["groups"] + agg["dups"] == total
        assert agg["dups"] > 0  # the planted collisions exist


class TestProvenancePlans:
    """The tier's scale claims, pinned on executed plans: no text
    attribute anywhere (metadata-only scans), the gate is a broadcast
    anti-join with no corpus-side Exchange before it."""

    def _final(self, df):
        df.collect()
        return (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )

    def test_no_text_in_any_provenance_plan(self, spark, sf_dir):
        for fn in (llm_domain_stats, llm_domain_blocklist_gate, llm_url_dedup):
            final = self._final(fn(spark, sf_dir))
            assert "text#" not in final, final

    def test_gate_is_broadcast_anti_join(self, spark, sf_dir):
        final = self._final(llm_domain_blocklist_gate(spark, sf_dir))
        assert "BroadcastHashJoin" in final and "LeftAnti" in final, final
        assert "SortMergeJoin" not in final, final
        # the corpus never moves: the broadcast exchange is the ONLY
        # exchange in the plan
        assert final.count("Exchange") == final.count("BroadcastExchange"), final

"""Invariant checks for the approximate / non-SQL-expressible operators
(the rows-only entries in the registry): each approximate result is compared
against its exact counterpart computed in-process, so the driver's weaker
rows-only gate is backed by a real correctness bound here.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_ingestion_experiment_otp_spark.operators import dedup, similarity
from data_ingestion_experiment_otp_spark.operators.aggregates import (
    agg_approx_distinct,
    agg_distinct,
)
from data_ingestion_experiment_otp_spark.operators.dedup import (
    llm_near_dedup_minhash,
    llm_ngram_jaccard,
    llm_simhash,
)
from data_ingestion_experiment_otp_spark.operators.multimodal import llm_multimodal_features
from data_ingestion_experiment_otp_spark.operators.similarity import (
    llm_sim_lsh_bucketed,
    llm_sim_topk,
)


class TestApproxDistinct:
    def test_hll_within_5pct_of_exact(self, spark, sf_dir):
        approx = {
            r["l_returnflag"]: r["approx_parts"]
            for r in agg_approx_distinct(spark, sf_dir).collect()
        }
        exact = {
            r["l_returnflag"]: r["n_parts"] for r in agg_distinct(spark, sf_dir).collect()
        }
        assert set(approx) == set(exact)
        for flag, n in exact.items():
            assert abs(approx[flag] - n) <= max(2, 0.05 * n), (flag, approx[flag], n)


class TestMinHash:
    def test_candidates_superset_of_exact_pairs(self, spark, sf_dir):
        """LSH has false negatives with bounded probability but its reported
        distance is exact — so (a) every reported pair really meets the
        threshold, and (b) recall vs the exact inverted-index result is high
        on the fixture's injected near-dups."""
        exact = {
            (r["doc_a"], r["doc_b"]) for r in llm_ngram_jaccard(spark, sf_dir).collect()
        }
        approx_rows = llm_near_dedup_minhash(spark, sf_dir).collect()
        approx = {(r["doc_a"], r["doc_b"]) for r in approx_rows}
        # (a) no false positives below the threshold
        for r in approx_rows:
            assert r["jaccard"] >= dedup._JACCARD_THRESHOLD - 1e-9
        # (b) recall: 8 hash tables over >=0.6-Jaccard pairs miss rarely
        if exact:
            recall = len(exact & approx) / len(exact)
            assert recall >= 0.8, f"minhash recall {recall:.2f} over {len(exact)} pairs"

    def test_deterministic(self, spark, sf_dir):
        a = sorted(map(tuple, llm_near_dedup_minhash(spark, sf_dir).collect()))
        b = sorted(map(tuple, llm_near_dedup_minhash(spark, sf_dir).collect()))
        assert a == b


class TestMinHashBanded:
    def test_recall_vs_exact_inverted_index(self, spark, sf_dir):
        """The SQL-native MinHash (llm_minhash_banded) verifies candidates
        on the exact hashed-shingle sets, so false positives are impossible
        by construction; recall vs the exact inverted-index pass must be
        high on the fixture's injected near-dups (4 bands of 2 over
        >=0.6-Jaccard pairs collide with probability ~1-(1-j^2)^4 >= 0.83,
        and the injected pairs sit near j~0.99)."""
        from data_ingestion_experiment_otp_spark.operators.dedup import llm_minhash_banded

        exact = {(r["doc_a"], r["doc_b"]) for r in llm_ngram_jaccard(spark, sf_dir).collect()}
        banded = {(r["doc_a"], r["doc_b"]) for r in llm_minhash_banded(spark, sf_dir).collect()}
        if exact:
            recall = len(exact & banded) / len(exact)
            assert recall >= 0.8, f"banded minhash recall {recall:.2f} over {len(exact)} pairs"


class TestSimHash:
    def test_deterministic_and_bounded(self, spark, sf_dir):
        rows = llm_simhash(spark, sf_dir).collect()
        again = llm_simhash(spark, sf_dir).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
        for r in rows:
            assert 0 <= r["simhash"] < (1 << 32)

    def test_hamming_locality_on_near_dups(self, spark, sf_dir):
        """Injected near-duplicate pairs (Jaccard >= 0.6) must be closer in
        Hamming distance than the random-pair background average."""
        pairs = [
            (r["doc_a"], r["doc_b"]) for r in llm_ngram_jaccard(spark, sf_dir).collect()
        ]
        if not pairs:
            return
        sig = {r["doc_id"]: r["simhash"] for r in llm_simhash(spark, sf_dir).collect()}

        def ham(a, b):
            return bin(sig[a] ^ sig[b]).count("1")

        near = [ham(a, b) for a, b in pairs if a in sig and b in sig]
        ids = sorted(sig)
        background = [ham(ids[i], ids[-1 - i]) for i in range(min(50, len(ids) // 2))]
        assert sum(near) / len(near) < sum(background) / len(background)


class TestLshTopK:
    def test_reported_cosines_exact_and_recall(self, spark, sf_dir):
        """Bucketed ANN re-ranks with the exact cosine, so every reported
        (query, neighbor, cosine) must agree with the brute-force value; and
        bucket collisions must recover a nontrivial share of true top-k."""
        exact = {
            (r["query_id"], r["vec_id"]): r["cosine"]
            for r in llm_sim_topk(spark, sf_dir).collect()
        }
        approx = {
            (r["query_id"], r["vec_id"]): r["cosine"]
            for r in llm_sim_lsh_bucketed(spark, sf_dir).collect()
        }
        for key, cos in approx.items():
            if key in exact:
                assert abs(cos - exact[key]) < 1e-6
        # Random 64-d vectors are sign-LSH's hardest case: true top-k
        # neighbors sit at cosine ~0.5, where a single 8-bit table collides
        # with p = (1 - θ/π)^8 ≈ 0.04 and the 8-table union reaches ~0.27.
        # Planes are deterministic (blake2b), so measured recall is stable:
        # 0.16 at sf0.001 / 0.20 at sf0.01. Assert half the theoretical
        # floor — a degenerate plane matrix (the round-1 parity bug) would
        # show up as either ~0 recall or a candidate set ~half the corpus,
        # which the exact-cosine agreement plus this floor together bound.
        recall = len(set(approx) & set(exact)) / len(exact)
        assert recall >= 0.1, f"sign-LSH recall {recall:.2f} over {len(exact)} exact pairs"

    def test_scale_config_recovers_planted_near_dups(self, spark, sf_dir):
        """The documented 100 TB knob setting (16-bit signatures, fewer
        wider tables) must actually work, not just be claimed: 16-bit
        buckets only collide for genuinely-near pairs (cosine ≳ 0.99),
        which is exactly the population a dedup-grade ANN hunts in a
        billion-vector corpus — the raw isotropic fixture has no such
        pairs, so recall is measured on PLANTED near-duplicates. At
        cosine 0.995 a 16-bit table collides with p=(1-θ/π)^16 ≈ 0.60,
        so the 4-table union reaches ≈ 0.97; assert a 0.6 floor (the
        fixture-density 8-bit default is covered by the test above)."""
        import numpy as np

        from data_ingestion_experiment_otp_spark.operators.similarity import (
            _QUERY_ID_CAP,
            load_vectors,
            sim_lsh_topk,
        )

        e = load_vectors(spark, sf_dir)
        vec = e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        qrows = vec.filter(
            (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < _QUERY_ID_CAP)
        ).collect()
        assert qrows, "fixture has no query vectors"
        rng = np.random.default_rng(7)
        planted = []
        for r in qrows:
            q = np.asarray(r["v"], dtype=np.float64)
            q = q / np.linalg.norm(q)
            noise = rng.standard_normal(q.shape)
            noise -= (noise @ q) * q  # orthogonalize
            noise /= np.linalg.norm(noise)
            near = 0.995 * q + np.sqrt(1 - 0.995**2) * noise
            planted.append(
                (int(r["vec_id"]) + 1_000_000, [float(x) for x in near])
            )
        pdf = spark.createDataFrame(planted, "vec_id long, v array<double>")
        res = sim_lsh_topk(spark, vec.union(pdf), tables=4, bits=16)
        got = {(r["query_id"], r["vec_id"]) for r in res.collect()}
        hits = sum(
            1 for r in qrows if (r["vec_id"], r["vec_id"] + 1_000_000) in got
        )
        recall = hits / len(qrows)
        assert recall >= 0.6, (
            f"16-bit/4-table planted-near-dup recall {recall:.2f} "
            f"over {len(qrows)} queries"
        )


class TestQuadraticGuard:
    def test_cosine_dedup_refuses_large_corpus(self, spark, sf_dir):
        """The exact O(n²) cosine pass must hard-fail above its row budget
        (instead of silently planning a quadratic join at scale) and name
        the sub-quadratic routes."""
        import pytest

        from data_ingestion_experiment_otp_spark.operators.dedup import (
            llm_embed_cosine_dedup,
        )

        with pytest.raises(ValueError, match="llm_sim_lsh_bucketed"):
            llm_embed_cosine_dedup(spark, sf_dir, max_rows=10)
        # below the guard the plan is unchanged
        assert llm_embed_cosine_dedup(spark, sf_dir).count() > 0


class TestMultimodal:
    def test_ppm_codec_decodes_for_real(self, spark, sf_dir):
        """The P6 path is a real decoder, not arithmetic replay: hand it a
        PPM numpy can verify independently (render → encode → decode →
        compare against the source array's stats)."""
        import numpy as np

        from data_ingestion_experiment_otp_spark.operators.multimodal import (
            extract_features,
        )

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
        blob = b"P6\n9 5\n255\n" + img.tobytes()
        media = spark.createDataFrame(
            [(1, "image/x-portable-pixmap", bytearray(blob))],
            "doc_id long, media_type string, payload binary",
        )
        row = extract_features(media).collect()[0]
        assert (row["px_w"], row["px_h"]) == (9, 5)
        assert row["px_sum"] == int(img.sum(dtype=np.int64))
        assert row["px_n"] == img.size
        assert row["n_bytes"] == len(blob)
        assert row["checksum"] == sum(blob) % (1 << 31)

    def test_fallback_path_for_undecodable_payloads(self, spark, sf_dir):
        """Non-PPM payloads still flow through the env-probed fallback:
        n_bytes/checksum are byte-exact, px_* are NULL, feature_mean is
        the deterministic byte-histogram fake."""
        from data_ingestion_experiment_otp_spark.operators.multimodal import (
            extract_features,
        )
        from data_ingestion_experiment_otp_spark.sources.catalog import load

        d = load(spark, sf_dir, "documents")
        media = d.select(
            "doc_id",
            F.lit("text/plain").alias("media_type"),
            F.encode("text", "utf-8").alias("payload"),
        )
        feats = {r["doc_id"]: r for r in extract_features(media).collect()}
        src = {
            r["doc_id"]: r["n"]
            for r in d.select(
                "doc_id", F.octet_length(F.encode("text", "utf-8")).alias("n")
            ).collect()
        }
        assert set(feats) == set(src)
        for doc_id, n in src.items():
            assert feats[doc_id]["n_bytes"] == n
            assert feats[doc_id]["media_type"] == "text/plain"
            assert feats[doc_id]["px_w"] is None
            # feature_mean is the byte-histogram mean: bounded by byte range
            assert 0.0 <= feats[doc_id]["feature_mean"] <= 255.0

    def test_deterministic(self, spark, sf_dir):
        a = sorted(map(tuple, llm_multimodal_features(spark, sf_dir).collect()))
        b = sorted(map(tuple, llm_multimodal_features(spark, sf_dir).collect()))
        assert a == b


class TestIvfTopK:
    def test_reported_cosines_exact_and_recall(self, spark, sf_dir):
        """IVF ANN re-ranks with the exact cosine (agreement check), and
        probing 4/16 cells must recover a solid share of true top-k —
        measured 0.72 at sf0.001 / 0.64 at sf0.01 with the seeded KMeans;
        assert a floor well under the measurement but far above the LSH
        floor, since coarse-quantizer locality beats random hyperplanes at
        this corpus density."""
        from data_ingestion_experiment_otp_spark.operators.similarity import llm_sim_ivf

        exact = {
            (r["query_id"], r["vec_id"]): r["cosine"]
            for r in llm_sim_topk(spark, sf_dir).collect()
        }
        approx = {
            (r["query_id"], r["vec_id"]): r["cosine"]
            for r in llm_sim_ivf(spark, sf_dir).collect()
        }
        for key, cos in approx.items():
            if key in exact:
                assert abs(cos - exact[key]) < 1e-6
        recall = len(set(approx) & set(exact)) / len(exact)
        assert recall >= 0.4, f"IVF recall {recall:.2f} over {len(exact)} exact pairs"


class TestIvfPq:
    # Measured recall@5 after the r6 exact-rerank pool (ADC top-50 ->
    # exact top-5; was 0.20 / 0.44 / 0.14 with rerank==k): the floors sit
    # under the measurement with margin but far above the r5 0.1 floor.
    # sf0.1's lower ceiling is the isotropic fixture's pruning cap, not a
    # code property — the planted-cluster test below proves >= 0.8 the
    # moment real cluster structure exists (full sweep: SCALING.md §IVF-PQ).
    FLOORS = {"sf0.001": (0.56, 0.45), "sf0.01": (0.72, 0.60), "sf0.1": (0.40, 0.30)}

    def test_composed_index_recall_and_exact_reporting(self, spark, sf_dir):
        """IVF-PQ: reported cosines are exact (recomputed on the rerank
        pool), every query returns exactly k rows, and recall clears the
        per-SF floor above."""
        from data_ingestion_experiment_otp_spark.operators.similarity import (
            _TOP_K,
            llm_sim_ivfpq,
        )

        exact = {
            (r["query_id"], r["vec_id"]): r["cosine"]
            for r in llm_sim_topk(spark, sf_dir).collect()
        }
        rows = llm_sim_ivfpq(spark, sf_dir).collect()
        approx = {(r["query_id"], r["vec_id"]): r["cosine"] for r in rows}
        for key, cos in approx.items():
            if key in exact:
                assert abs(cos - exact[key]) < 1e-6
        per_query = {}
        for r in rows:
            per_query[r["query_id"]] = per_query.get(r["query_id"], 0) + 1
        assert all(n == _TOP_K for n in per_query.values()), per_query
        recall = len(set(approx) & set(exact)) / len(exact)
        floor = self.FLOORS.get(sf_dir.rstrip("/").split("/")[-1], (None, 0.3))[1]
        assert recall >= floor, (
            f"IVF-PQ recall {recall:.2f} < floor {floor} over {len(exact)} pairs"
        )

    def test_planted_cluster_recall(self, spark, tmp_path):
        """The isotropic fixture is PQ+IVF's worst case (top-k margins
        shrink as the corpus grows and cells don't localize neighbors).
        This plants real structure — 20 well-separated centers, 100
        points each of small radius — and requires recall >= 0.8: proof
        the index composition reaches high recall whenever the data has
        the cluster structure real embeddings do."""
        import numpy as np

        from data_ingestion_experiment_otp_spark.operators.similarity import (
            llm_sim_ivfpq,
            llm_sim_topk,
        )

        rng = np.random.default_rng(7)
        centers = rng.standard_normal((20, 64))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        rows = []
        for i in range(2000):
            c = centers[i % 20]
            v = c + 0.15 * rng.standard_normal(64)
            rows.append((i, [float(x) for x in v], f"c{i % 20}"))
        out = tmp_path / "planted"
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label string"
        ).coalesce(2).write.parquet(str(out / "embeddings.parquet"))

        exact = {
            (r["query_id"], r["vec_id"])
            for r in llm_sim_topk(spark, str(out)).collect()
        }
        approx = {
            (r["query_id"], r["vec_id"])
            for r in llm_sim_ivfpq(spark, str(out)).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.8, f"planted-cluster IVF-PQ recall {recall:.2f}"


class TestSketchPartitionStability:
    def test_sketch_bounds_hold_under_repartition(self, spark, sf_dir):
        """The two distributed-sketch queries are the registry's only
        partition-layout-sensitive results (their merge trees are not
        canonical — measured at sf0.1, r4): what they DO contract is the
        error bound, so that bound must hold on a repartition(7)'d input
        too. GK quantiles: rank error <= n/10000 per group. HLL daily
        distincts: within 5% of exact."""
        import bisect
        import sys

        from data_ingestion_experiment_otp_spark.plans.registry import all_queries
        from data_ingestion_experiment_otp_spark.sources import catalog
        from data_ingestion_experiment_otp_spark.sources.catalog import load

        specs = all_queries()
        orig = catalog.load
        patched = [
            (mod, attr)
            for mod in list(sys.modules.values())
            if getattr(mod, "__name__", "").startswith("data_ingestion_experiment_otp_spark")
            for attr, val in list(vars(mod).items())
            if val is orig
        ]

        # exact references from the UNPATCHED loader
        exact_days = {
            r["day"]: r["n"]
            for r in load(spark, sf_dir, "events")
            .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        by_flag: dict = {}
        for r in (
            load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice").collect()
        ):
            by_flag.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])

        def wrapped(sp, d, t):
            return orig(sp, d, t).repartition(7)

        try:
            for mod, attr in patched:
                setattr(mod, attr, wrapped)
            hll = {
                r["day"]: r["n_users"]
                for r in specs["mv_rollup_distinct_hll"].fn(spark, sf_dir).collect()
            }
            pct = {
                r["l_returnflag"]: r
                for r in specs["agg_approx_percentile"].fn(spark, sf_dir).collect()
            }
        finally:
            for mod, attr in patched:
                setattr(mod, attr, orig)

        assert set(hll) == set(exact_days)
        for day, n in exact_days.items():
            assert abs(hll[day] - n) <= max(2, 0.05 * n), (day, hll[day], n)
        for flag, xs in by_flag.items():
            xs.sort()
            n = len(xs)
            r = pct[flag]
            assert r["p50"] <= r["p90"] <= r["p99"]
            for q, v in ((0.5, r["p50"]), (0.9, r["p90"]), (0.99, r["p99"])):
                lo = bisect.bisect_left(xs, v)
                hi = bisect.bisect_right(xs, v)
                assert lo - (n / 10000 + 1) <= q * n <= hi + (n / 10000 + 1), (flag, q, v)


class TestApproxPercentile:
    def test_rank_error_within_bound(self, spark, sf_dir):
        """approx_percentile(accuracy=10000) guarantees rank error <=
        n/10000 per group. Verify each reported quantile against the
        group's sorted values: its true rank must be within the bound of
        the target rank, and the quantiles must be monotone."""
        from data_ingestion_experiment_otp_spark.operators.aggregates import (
            agg_approx_percentile,
        )
        from data_ingestion_experiment_otp_spark.sources.catalog import load

        rows = {r["l_returnflag"]: r for r in agg_approx_percentile(spark, sf_dir).collect()}
        vals = (
            load(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_extendedprice")
            .collect()
        )
        by_flag = {}
        for r in vals:
            by_flag.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
        import bisect

        for flag, xs in by_flag.items():
            xs.sort()
            n = len(xs)
            r = rows[flag]
            assert r["p50"] <= r["p90"] <= r["p99"]
            for q, v in ((0.5, r["p50"]), (0.9, r["p90"]), (0.99, r["p99"])):
                lo = bisect.bisect_left(xs, v)
                hi = bisect.bisect_right(xs, v)
                target = q * n
                slack = n / 10000 + 1
                assert lo - slack <= target <= hi + slack, (flag, q, v, lo, hi, n)


class TestCompaction:
    def test_file_count_collapses(self, spark, sf_dir):
        """The compaction rewrite must actually de-fragment: 64 splinter
        files in, a handful out (AQE coalesces the 20 source partitions
        to fill-size targets; at fixture scale that's 1-4 files)."""
        import glob

        from data_ingestion_experiment_otp_spark.sources.files import (
            _scratch,
            snk_compacted_parquet,
        )

        snk_compacted_parquet(spark, sf_dir).collect()
        nfrag = len(glob.glob(_scratch(spark, "docs_fragmented") + "/*.parquet"))
        ncomp = len(glob.glob(_scratch(spark, "docs_compacted") + "/*.parquet"))
        assert nfrag == 64
        assert 1 <= ncomp <= 8


class TestUdafGeoMean:
    def test_udaf_agrees_with_algebraic_builtin_form(self, spark, sf_dir):
        """The grouped-agg pandas UDAF (semantic spec) and the
        partial-agg-friendly built-in chain exp(avg(ln(x))) (scale path)
        must agree per group to float tolerance."""
        from pyspark.sql import functions as F

        from data_ingestion_experiment_otp_spark.plans.registry import all_queries
        from data_ingestion_experiment_otp_spark.sources.catalog import load

        udaf = {
            (r.lang, r.source): r.geo_chars
            for r in all_queries()["udaf_geo_mean"].fn(spark, sf_dir).collect()
        }
        builtin = {
            (r.lang, r.source): r.geo_chars
            for r in (
                load(spark, sf_dir, "documents")
                .filter(F.col("n_chars") > 0)
                .groupBy("lang", "source")
                .agg(F.exp(F.avg(F.log("n_chars"))).alias("geo_chars"))
            ).collect()
        }
        assert udaf.keys() == builtin.keys()
        for k in udaf:
            assert abs(udaf[k] - builtin[k]) < 1e-6, (k, udaf[k], builtin[k])


class TestIncrementalRollupReplay:
    def test_replayed_refresh_changes_nothing(self, spark, sf_dir, tmp_path):
        """Any maintenance run may be replayed at any later point without
        changing the rollup: each run owns its (day, batch) partitions and
        rewrites them byte-identically."""
        from data_ingestion_experiment_otp_spark.operators.materialize import (
            _N_BATCHES,
            read_rollup,
            refresh_batch,
        )
        from data_ingestion_experiment_otp_spark.sources.catalog import load

        ev = load(spark, sf_dir, "events")
        mv = str(tmp_path / "mv")

        def batch(k):  # the pre-sliced input contract
            return ev.filter(F.col("event_id") % _N_BATCHES == k)

        for k in range(_N_BATCHES):
            refresh_batch(batch(k), mv, k)
        before = sorted(map(tuple, read_rollup(spark, mv).collect()))
        for k in (0, _N_BATCHES - 1, 1):  # replay out of order, twice over
            refresh_batch(batch(k), mv, k)
        after = sorted(map(tuple, read_rollup(spark, mv).collect()))
        assert before == after


class TestMvCompaction:
    def test_fold_preserves_content_and_collapses_layout(self, spark, sf_dir, tmp_path):
        """Compacting the partial-state MV must change LAYOUT only: the
        reader-side merge returns identical rows before and after, and
        the (day, batch) leaf-partition count collapses from days×epochs
        to days (streaming epochs are row-sliced, so every epoch touches
        every day — the accumulation compaction exists to undo)."""
        import os

        from data_ingestion_experiment_otp_spark.operators.materialize import (
            compact_rollup,
            read_rollup,
            rollup_sink,
        )
        from data_ingestion_experiment_otp_spark.sources.catalog import load

        ev = load(spark, sf_dir, "events")
        gen1 = str(tmp_path / "gen1")
        gen2 = str(tmp_path / "gen2")
        sink = rollup_sink(gen1)
        for k in range(3):
            sink(ev.filter(F.col("event_id") % 3 == k), k)
        before = sorted(map(tuple, read_rollup(spark, gen1).collect()))
        compact_rollup(spark, gen1, gen2)
        after = sorted(map(tuple, read_rollup(spark, gen2).collect()))
        assert before == after and before

        def leaf_partitions(root):
            return sum(
                1 for d, _, files in os.walk(root)
                if "batch=" in d and any(f.endswith(".parquet") for f in files)
            )

        n_days = len({r[0] for r in before})
        assert leaf_partitions(gen2) == n_days
        assert leaf_partitions(gen1) > leaf_partitions(gen2)


class TestApproxVocabTopK:
    def test_sketch_exact_at_capacity_and_head_complete(self, spark, sf_dir):
        """With tracked capacity >= |vocabulary| the approx_top_k sketch is
        exact: every reported count equals the true count, and every token
        whose true count strictly exceeds the k-th head count is present."""
        from pyspark.sql import functions as F

        from data_ingestion_experiment_otp_spark.plans.registry import all_queries
        from data_ingestion_experiment_otp_spark.sources.catalog import load

        approx = {
            r.w: r.n_total
            for r in all_queries()["llm_vocab_topk_approx"].fn(spark, sf_dir).collect()
        }
        words = F.filter(F.split("text", " "), lambda w: w != "")
        exact = {
            r.w: r.n
            for r in (
                load(spark, sf_dir, "documents")
                .select(F.explode(words).alias("w"))
                .groupBy("w")
                .agg(F.count("*").alias("n"))
            ).collect()
        }
        assert len(exact) <= 100_000, "fixture vocabulary outgrew sketch capacity"
        for w, n in approx.items():
            assert exact[w] == n, (w, n, exact[w])
        kth = min(approx.values())
        missing = {w for w, n in exact.items() if n > kth} - approx.keys()
        assert not missing, missing


class TestPushDataSource:
    def test_scan_parallelism_matches_channel_shards(self, spark):
        """The custom source's InputPartitions must become real scan tasks:
        one per declared channel shard, none generated on the driver."""
        from data_ingestion_experiment_otp_spark.sources.pushsource import (
            _PARTS,
            register_push_source,
        )

        register_push_source(spark)
        df = spark.read.format("otp_webhook").load()
        assert df.rdd.getNumPartitions() == _PARTS


class TestProductQuantization:
    def test_codes_are_compressed_and_scores_track_cosine(self, spark, sf_dir):
        """PQ invariants on the isotropic fixture (PQ's worst case — unit
        vectors with ~uncorrelated dims, so top-k margins are razor thin):
        (1) structural 32x compression — _PQ_M codes per vector, each
        < _PQ_K; (2) the ADC score must track true cosine (Pearson >= 0.5
        for a probe query over the whole corpus); (3) top-k recall vs the
        exact ranking stays far above the ~k/N chance floor. On real
        (low-intrinsic-dimension) embeddings both 2 and 3 rise sharply;
        the floors here are what random data supports."""
        import numpy as np

        from pyspark.sql import functions as F

        from data_ingestion_experiment_otp_spark.operators.similarity import (
            _PQ_K,
            _PQ_M,
            _pq_train,
        )
        from data_ingestion_experiment_otp_spark.plans.registry import all_queries
        from data_ingestion_experiment_otp_spark.sources.catalog import load

        # (1) + (3) via the registered query
        exact = all_queries()["llm_sim_topk"].fn(spark, sf_dir).collect()
        pq = all_queries()["llm_embed_pq"].fn(spark, sf_dir).collect()
        ex, got = {}, {}
        for r in exact:
            ex.setdefault(r.query_id, set()).add(r.vec_id)
        for r in pq:
            got.setdefault(r.query_id, set()).add(r.vec_id)
        assert set(got) == set(ex), "query sides must match"
        hits = sum(len(ex[q] & got[q]) for q in ex)
        tot = sum(len(v) for v in ex.values())
        n_corpus = load(spark, sf_dir, "embeddings").count()
        k = len(next(iter(ex.values())))
        chance = k / n_corpus
        assert hits / tot >= max(0.15, 3 * chance), (hits, tot, chance)

        # (2) score-approximation quality, driver-side recompute
        vec = load(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        X = np.array([r.v for r in vec.sort("vec_id").collect()])
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        books = _pq_train(X[:10_000])
        dsub = X.shape[1] // _PQ_M
        codes = np.empty((len(X), _PQ_M), dtype=int)
        for m in range(_PQ_M):
            S = X[:, m * dsub : (m + 1) * dsub]
            codes[:, m] = ((S[:, None, :] - books[m][None]) ** 2).sum(-1).argmin(1)
        assert codes.shape[1] == _PQ_M and codes.max() < _PQ_K
        q = X[0]
        lut = np.einsum("mkd,md->mk", books, q.reshape(_PQ_M, -1))
        approx = lut[np.arange(_PQ_M), codes].sum(1)
        true = X @ q
        corr = float(np.corrcoef(approx, true)[0, 1])
        assert corr >= 0.5, corr


class TestHllDistinctRollup:
    def test_sketch_union_tracks_exact_and_absorbs_replay(self, spark, sf_dir, tmp_path):
        """The incrementally-maintained HLL distinct rollup must estimate
        each day's distinct users within 5% of exact, and replaying any
        epoch must leave every estimate bit-identical."""
        from pyspark.sql import functions as F

        from data_ingestion_experiment_otp_spark.operators.materialize import (
            _N_BATCHES,
            read_distinct_rollup,
            refresh_distinct_batch,
        )
        from data_ingestion_experiment_otp_spark.sources.catalog import load

        ev = load(spark, sf_dir, "events")
        mv = str(tmp_path / "hll_mv")

        def batch(k):  # the pre-sliced input contract
            return ev.filter(F.col("event_id") % _N_BATCHES == k)

        for k in range(_N_BATCHES):
            refresh_distinct_batch(batch(k), mv, k)
        est = {r.day: r.n_users for r in read_distinct_rollup(spark, mv).collect()}
        exact = {
            r.day: r.n
            for r in ev.groupBy(F.to_date("ts").alias("day"))
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert est.keys() == exact.keys()
        for day, n in exact.items():
            assert abs(est[day] - n) <= max(1, 0.05 * n), (day, est[day], n)
        refresh_distinct_batch(batch(0), mv, 0)  # replay
        after = {r.day: r.n_users for r in read_distinct_rollup(spark, mv).collect()}
        assert after == est


class TestClustering:
    def test_balance_caps_every_cluster_and_respects_assignment(self, spark, sf_dir):
        """llm_cluster_balance must (a) never exceed the per-cluster cap,
        (b) keep ranks dense 1..n_kept within each cluster, and (c) agree
        with llm_cluster_assign on every kept row's cluster."""
        from data_ingestion_experiment_otp_spark.operators.clustering import (
            _BALANCE_CAP,
            _K_CLUSTERS,
            llm_cluster_assign,
            llm_cluster_balance,
        )

        assign = {r["vec_id"]: r["cluster_id"] for r in llm_cluster_assign(spark, sf_dir).collect()}
        kept = llm_cluster_balance(spark, sf_dir).collect()
        assert len({r["cluster_id"] for r in kept}) <= _K_CLUSTERS
        by_cluster: dict = {}
        for r in kept:
            assert assign[r["vec_id"]] == r["cluster_id"]
            by_cluster.setdefault(r["cluster_id"], []).append(r["rk"])
        assert by_cluster, "balance kept nothing on a non-empty corpus"
        for cid, rks in by_cluster.items():
            assert len(rks) <= _BALANCE_CAP, (cid, len(rks))
            assert sorted(rks) == list(range(1, len(rks) + 1)), cid

    def test_assignment_is_nearest_centroid(self, spark, sf_dir):
        """Spot-check the argmax against numpy on a sample: the assigned
        centroid's cosine must be >= every other centroid's cosine (to
        rounding), with ties broken toward the lower centroid id."""
        import numpy as np

        from data_ingestion_experiment_otp_spark.operators.clustering import (
            _centroids,
            llm_cluster_assign,
        )
        from data_ingestion_experiment_otp_spark.operators.similarity import load_vectors

        cents = _centroids(spark, sf_dir)
        C = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in cents])
        cids = np.array([r.vec_id for r in cents])
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        sample = load_vectors(spark, sf_dir).orderBy("vec_id").limit(50).collect()
        got = {r["vec_id"]: r["cluster_id"] for r in llm_cluster_assign(spark, sf_dir).collect()}
        for r in sample:
            v = np.asarray(r.embedding, dtype=np.float64)
            sims = np.round(Cn @ (v / np.linalg.norm(v)), 6)
            best = cids[np.lexsort((cids, -sims))[0]]
            assert got[r.vec_id] == best, (r.vec_id, got[r.vec_id], best)


class TestRepetitionSignals:
    def test_signals_bounded_and_gate_consistent(self, spark, sf_dir):
        from data_ingestion_experiment_otp_spark.operators.clustering import (
            _DUP_WORD_MAX,
            _TOP_BIGRAM_MAX,
            _TOP_TRIGRAM_MAX,
            llm_repetition_signals,
        )

        rows = llm_repetition_signals(spark, sf_dir).collect()
        assert rows
        n_keep = 0
        for r in rows:
            assert 0.0 <= r["dup_word_frac"] < 1.0
            assert 0.0 <= r["top_bigram_frac"] <= 2.0
            assert 0.0 <= r["top_trigram_frac"] <= 3.0
            expect = (
                r["dup_word_frac"] <= _DUP_WORD_MAX
                and r["top_bigram_frac"] <= _TOP_BIGRAM_MAX
                and r["top_trigram_frac"] <= _TOP_TRIGRAM_MAX
            )
            assert r["keep"] == expect, r
            n_keep += bool(r["keep"])
        # The gate must actually split the corpus, not rubber-stamp it.
        assert 0 < n_keep < len(rows)

    def test_planted_repetitive_doc_is_dropped(self, spark):
        """A degenerate '(word) * N' document must trip every signal."""
        from data_ingestion_experiment_otp_spark.operators import clustering as cl

        d = spark.createDataFrame(
            [(1, "spam " * 50 + "spam"), (2, "one two three four five six seven eight nine ten")],
            "doc_id long, text string",
        )
        orig = cl.load
        try:
            cl.load = lambda spark, sf_dir, name: d  # noqa: ARG005
            rows = {r["doc_id"]: r for r in cl.llm_repetition_signals(spark, "ignored").collect()}
        finally:
            cl.load = orig
        assert rows[1]["dup_word_frac"] > 0.9 and not rows[1]["keep"]
        assert rows[2]["dup_word_frac"] == 0.0 and rows[2]["keep"]


class TestApproxQualityGate:
    def test_approx_gate_tracks_exact_percentile_gate(self, spark, sf_dir):
        """The percentile_approx-thresholded gate must agree with the exact
        percent_rank gate on (almost) every document: with accuracy 10000 on
        fixture-sized strata the sketch is exact, so the only legitimate
        disagreements are boundary ties (quality == median), which the two
        formulations may split differently. Everything strictly inside the
        halves must match."""
        from data_ingestion_experiment_otp_spark.operators.text_analysis import (
            llm_quality_gate_approx,
            llm_quality_gate_stratified,
        )

        exact = {
            r["doc_id"]: (r["keep"], r["quality"], r["source"])
            for r in llm_quality_gate_stratified(spark, sf_dir).collect()
        }
        approx_rows = llm_quality_gate_approx(spark, sf_dir).collect()
        assert len(approx_rows) == len(exact)
        disagree = [
            r
            for r in approx_rows
            if r["keep"] != exact[r["doc_id"]][0]
        ]
        # any disagreement must sit exactly on its stratum's cut boundary:
        # the doc's quality equals the min kept / max dropped quality of
        # the other gate's decision for that source
        by_source: dict = {}
        for did, (k, qual, src) in exact.items():
            by_source.setdefault(src, []).append((qual, k))
        for r in disagree:
            quals = sorted(q for q, k in by_source[r["source"]] if k)
            min_kept_exact = quals[0] if quals else None
            assert r["quality"] == min_kept_exact, (
                f"non-boundary disagreement: {r} vs exact min-kept {min_kept_exact}"
            )
        assert len(disagree) <= 0.05 * len(approx_rows)


class TestSumOrderIndependence:
    def test_fine_grid_measures_survive_repartition(self, spark, sf_dir):
        """The 4-/6-decimal product measures must be identical under ANY
        partitioning — on a cluster, summation order is arbitrary. The
        double-sum formulation silently depended on file order: both
        engines matched only because both summed in sequence, and a
        repartition(7) moved sum_charge by ~1e-4 (>> its 5e-7 half-grid).
        The decimal-sum formulation is order-exact; this pins it."""
        from pyspark.sql import functions as F

        from data_ingestion_experiment_otp_spark.sources.catalog import load

        li = load(spark, sf_dir, "lineitem")
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))

        def measures(df):
            rows = (
                df.groupBy("l_returnflag", "l_linestatus")
                .agg(
                    F.sum(disc.cast("decimal(28,4)")).cast("double").alias("sum_disc_price"),
                    F.sum((disc * (1 + F.col("l_tax"))).cast("decimal(28,6)"))
                    .cast("double")
                    .alias("sum_charge"),
                )
                .collect()
            )
            return {
                (r["l_returnflag"], r["l_linestatus"]): (r["sum_disc_price"], r["sum_charge"])
                for r in rows
            }

        base = measures(li)
        for n_parts in (1, 7, 32):
            assert measures(li.repartition(n_parts)) == base, n_parts


class TestOrderIndependenceSweep:
    # Representative order-sensitive shapes: multi-measure aggregation,
    # rollup, windows (rank/frame/session), sorts and global index, dedup
    # pair generation, CC clustering, CDC diff, MV maintenance read, the
    # capstones. The full-registry sweep (every query, plain vs
    # repartition(7), identical multisets) is a session audit, re-run r4
    # with a LIVE loader seam at sf0.001 and sf0.1: exact-invariant for
    # every query except the two distributed-SKETCH queries
    # (agg_approx_percentile, mv_rollup_distinct_hll), whose estimates
    # legitimately move within their documented error bounds when the
    # merge tree changes — that bounded form is pinned separately by
    # TestSketchPartitionStability below. This class keeps the exact
    # canary in-tree.
    NAMES = (
        "agg_groupby",
        "agg_grouping_sets",
        "join_broadcast",
        "win_funcs",
        "sort_topk",
        "sort_global_index",
        "st_event_windows",
        "cdc_snapshot_diff",
        "llm_exact_dedup",
        "llm_ngram_jaccard",
        "llm_dedup_clusters",
        "llm_cluster_balance",
        "pipeline_semantic_curation",
        # caught order-dependent by the r4 full-registry audit (spark.ml
        # kmeans|| init sampled per partition); now a sample-trained
        # numpy model — keep it in the canary set, plus the composed
        # IVF-PQ which shares the trainer contract
        "llm_sim_ivf",
        "llm_sim_ivfpq",
        # r5 additions: BM25 ranks on round-6 scores with doc_id as the
        # total-order tie-break; containment is exact integer arithmetic;
        # perplexity sums sit ~7 orders inside their round-6 grid
        "llm_bm25_topk",
        "llm_containment_dedup",
        "llm_unigram_perplexity",
        "llm_source_divergence",
        "llm_phrase_search",
        "llm_leakage_safe_split",
        # r6 additions: bigram mixture is exact count ratios on the same
        # round-6 grid; line dedup and script-ID are pure per-row maps
        "llm_bigram_perplexity",
        "llm_line_dedup",
        "llm_script_id",
        "llm_term_proximity",
        # two-stage PRF: every stage ranks on a round-6 grid with a
        # total-order tie-break, so even the expansion term SET is stable
        "llm_bm25_prf",
        "llm_gopher_rules",
        "llm_triplet_mining",
        "llm_dataset_card",
        "llm_char_jaccard",
        "llm_char_jaccard_capped",
        # r7: banding verifies exactly on hashed gram sets; candidates
        # come from deterministic signature equality, not sampling
        "llm_char_minhash_banded",
        # r7: BPE argmax is a weighted integer sum with a lexicographic
        # total-order tie-break, so the learned merges — and everything
        # downstream (token ids, checksums, pack boundaries) — may not
        # move under repartition
        "pipeline_tokenize_pack",
        # r7b: decode is the same learned state read backwards; the
        # normalizer is a pure per-row map; the agreement audit is exact
        # count ratios on the round-6 grid
        "llm_bpe_decode",
        "llm_normalize_text",
        "llm_gate_agreement",
        # r7c: dup-span coverage is exact integer position arithmetic;
        # semdedup's in-cluster drop predicate is vectorized over the
        # whole pandas group, so within-group row order cannot matter
        "llm_dup_spans",
        "llm_semdedup",
        "llm_incremental_dup_spans",
        "llm_char_dup_spans",
        # r7c: exact-pair truth × deterministic screen, pure count output
        "llm_semdedup_eval",
        # r10: perceptron training is pure int64 — margins, violator
        # sets, gradient sums, weights; a partition boundary can only
        # reorder exact-integer additions. llm_quality_classifier_train
        # left this canary in r11: it is artifact-served now (no corpus
        # scan — the documented unseamed set), and the TRAINER's
        # repartition invariance is pinned directly in
        # TestQctWeightStore::test_trainer_repartition_invariant.
        "llm_classifier_train_eval",
        # r11: the CCNet cut ranks on the round-6 bits grid with doc_id
        # ties (the approx variant is excluded — percentile_approx is a
        # sketch, the documented bounded class); DSIR sums integer counts
        # against 256-row broadcast stats and ranks on the round-6 grid
        "llm_ccnet_buckets",
        "llm_dsir_select",
        # r11b: both projections are integer arithmetic end-to-end — RP
        # derives its signs from (i, j) alone, and PCA's moments are
        # exact grid-int sums so the trained matrix cannot move under a
        # partition boundary (its trainer is also pinned directly in
        # test_projection.py)
        "llm_embed_rp",
        "llm_embed_pca",
        # r11b: two-stage rerank — per-batch partial pools differ under
        # repartition, but each row's projected cosine is a per-row
        # function of the broadcast model (batch-independent), every
        # batch emits a superset of its global-pool members, and the
        # global pool is a window over (pcos desc, vec_id) — so the
        # pooled set (and the exact rerank on it) cannot move
        "llm_sim_topk_pca",
        # r11b: banded candidates from deterministic signature equality +
        # exact integer set verification (the llm_char_minhash_banded
        # argument, pointed across the train x benchmark split); the
        # report composes the two exact tiers with an id-keyed join
        "llm_decontaminate_fuzzy",
        "llm_decontaminate_report",
        # r12: the trigram model is exact integer corpus counts (pruning
        # is a count predicate) served through double ratios on the
        # round-6 grid; the LM-scored CCNet cut ranks with doc_id ties.
        # Note the stores are artifact-served: the loader seam still
        # repartitions the SERVING scan (per-doc triple counts), and the
        # trainer's partition independence follows from integer count
        # aggregation.
        "llm_trigram_perplexity",
        "llm_ccnet_buckets_lm",
        # r13: the KN-4 model is the same exact-integer-count class one
        # order deeper — continuation counts are row counts of grouped
        # integer relations, discounting is a per-row rational transform,
        # and the serving scan repartitions through the loader seam
        "llm_kn4_perplexity",
        # r13: the KN-scored split ranks on the round-6 grid with doc_id
        # ties (the ccnet_buckets argument; the _approx twins stay in
        # the documented excluded sketch class); the provenance tier is
        # pure per-row string arithmetic + exact integer aggregates
        "llm_kn4_ccnet_buckets",
        "llm_domain_stats",
        "llm_domain_blocklist_gate",
        "llm_url_dedup",
        "llm_domain_cap",
    )

    @pytest.mark.slow
    def test_results_identical_under_repartition(self, spark, sf_dir):
        """A query's result may not depend on input partitioning — on a
        cluster, partitioning is arbitrary. Catches order-dependent sums,
        rank ties without total order, and sampled partition boundaries
        (all three occurred: commits c94bf59, 99621a3)."""
        import math
        from collections import Counter

        from data_ingestion_experiment_otp_spark.plans.registry import all_queries
        from data_ingestion_experiment_otp_spark.sources import catalog

        def canon(v):
            if isinstance(v, float):
                return "NaN" if math.isnan(v) else round(v, 9)
            if isinstance(v, (list, tuple)):
                return tuple(canon(x) for x in v)
            return v

        import sys

        specs = all_queries()  # imports every query module (needed below)
        orig = catalog.load
        calls = {"n": 0}

        def wrapped(sp, d, t):
            calls["n"] += 1
            return orig(sp, d, t).repartition(7)

        # Operator modules bind `load` at import time (`from ..sources.
        # catalog import load`), so patching catalog.load alone never
        # reaches them and the sweep compares two IDENTICAL plans (ADVICE
        # r3: vacuously green). Patch every module attribute that holds
        # the original loader, and assert per query that the wrapper
        # actually fired.
        patched = []
        for mod in list(sys.modules.values()):
            if getattr(mod, "__name__", "").startswith("data_ingestion_experiment_otp_spark"):
                for attr, val in list(vars(mod).items()):
                    if val is orig:
                        setattr(mod, attr, wrapped)
                        patched.append((mod, attr))
        assert len(patched) > 10, "loader seam lost: too few modules bind catalog.load"
        try:
            for name in self.NAMES:
                for mod, attr in patched:
                    setattr(mod, attr, orig)
                plain = Counter(
                    tuple(canon(v) for v in r) for r in specs[name].fn(spark, sf_dir).collect()
                )
                for mod, attr in patched:
                    setattr(mod, attr, wrapped)
                calls["n"] = 0
                repart = Counter(
                    tuple(canon(v) for v in r) for r in specs[name].fn(spark, sf_dir).collect()
                )
                assert calls["n"] > 0, f"{name} never invoked the patched loader"
                assert plain == repart, f"{name} is partition-order dependent"
        finally:
            for mod, attr in patched:
                setattr(mod, attr, orig)


class TestAudioCodec:
    def test_wav_chunk_walk_decodes_noncanonical_layout(self, spark, sf_dir):
        """The WAV parser is a real RIFF chunk walk, not a fixed 44-byte
        offset: a payload with an extra LIST chunk BEFORE fmt/data (and an
        odd-sized chunk forcing word-alignment) must still decode, and the
        stats must match the source numpy array."""
        import struct

        import numpy as np

        from data_ingestion_experiment_otp_spark.operators.multimodal import (
            extract_audio_features,
        )

        rng = np.random.default_rng(9)
        s = rng.integers(-2048, 2048, size=77, dtype=np.int16)
        data = s.astype("<i2").tobytes()
        odd = b"note\x00"  # 5 bytes -> needs a pad byte
        blob = (
            b"RIFF"
            + struct.pack("<I", 4 + (8 + len(odd) + 1) + (8 + 16) + (8 + len(data)))
            + b"WAVE"
            + b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )
        media = spark.createDataFrame(
            [(1, "audio/x-wav", bytearray(blob))],
            "doc_id long, media_type string, payload binary",
        )
        row = extract_audio_features(media).collect()[0]
        assert row["n_samples"] == 77
        assert row["sample_rate"] == 8000
        assert row["amp_sum"] == int(s.astype(np.int64).sum())
        assert row["amp_peak"] == int(np.abs(s.astype(np.int64)).max())
        assert row["n_bytes"] == len(blob)


class TestQualityClassifier:
    """r7 model-based gate: the shipped linear model must reproduce a
    hand-evaluated reference, and the capstone variant must be exactly
    curation ∩ classifier-keeps (the gate trims, it does not re-rank)."""

    def test_margin_matches_hand_model(self, spark, tmp_path):
        from test_bpe import plant

        from data_ingestion_experiment_otp_spark.operators.text_analysis import (
            _QC_BIAS,
            _QC_BUCKETS,
            _QC_HASH_MOD,
            _QC_WEIGHTS,
        )

        docs = [
            "the quick brown fox",
            "naïve café 東京 mixed",
            "single",
            "",
            None,
            "a b a b a",
        ]
        sf, _ = plant(spark, tmp_path, docs)
        specs = __import__(
            "data_ingestion_experiment_otp_spark.plans.registry",
            fromlist=["all_queries"],
        ).all_queries()
        got = {
            r["doc_id"]: (r["n_toks"], r["margin"], r["keep"])
            for r in specs["llm_quality_classifier"].fn(spark, sf).collect()
        }
        ref = {}
        for did, t in enumerate(docs):
            ws = [w for w in (t or "").split(" ") if w]
            if not ws:
                continue
            hs = []
            for w in ws:
                a = 0
                for c in w:
                    a = (a * 31 + ord(c)) % _QC_HASH_MOD
                hs.append(a)
            m = (
                sum(_QC_WEIGHTS[h % _QC_BUCKETS] for h in hs)
                + sum(
                    _QC_WEIGHTS[_QC_BUCKETS + (hs[i] * 31 + hs[i + 1]) % _QC_BUCKETS]
                    for i in range(len(hs) - 1)
                )
                + _QC_BIAS * len(hs)
            )
            ref[did] = (len(ws), m, m > 0)
        assert got == ref

    def test_variant_is_curation_intersect_keeps(self, spark, sf_dir):
        from data_ingestion_experiment_otp_spark.plans.registry import all_queries

        specs = all_queries()
        cur = {tuple(r) for r in specs["pipeline_semantic_curation"].fn(spark, sf_dir).collect()}
        keeps = {
            r["doc_id"]
            for r in specs["llm_quality_classifier"].fn(spark, sf_dir).collect()
            if r["keep"]
        }
        var = {tuple(r) for r in specs["pipeline_curation_classified"].fn(spark, sf_dir).collect()}
        assert var == {r for r in cur if r[0] in keeps}
        assert var < cur  # the gate really dropped someone at fixture scale


class TestCurationSemdedupVariant:
    def test_variant_is_curation_intersect_semdedup_keeps(self, spark, sf_dir):
        """pipeline_curation_semdedup == pipeline_semantic_curation rows
        whose doc survives the within-cluster semantic screen — the same
        reconciliation contract the classified variant carries."""
        from data_ingestion_experiment_otp_spark.plans.registry import all_queries

        specs = all_queries()
        cur = {
            tuple(r)
            for r in specs["pipeline_semantic_curation"].fn(spark, sf_dir).collect()
        }
        keeps = {
            r["vec_id"]
            for r in specs["llm_semdedup"].fn(spark, sf_dir).collect()
            if r["kept"]
        }
        var = {
            tuple(r)
            for r in specs["pipeline_curation_semdedup"].fn(spark, sf_dir).collect()
        }
        assert var == {r for r in cur if r[0] in keeps}


class TestCurriculumSkewProofBins:
    """r9 (judge task 3): the curriculum ordinal's quantile bins with tie
    sub-splitting — an all-equal-margin corpus (ties are the NORM for an
    integer classifier score) must spread across tasks instead of
    collapsing into one wide-task sort, while the emitted (ord, phase)
    stays exactly the (margin, doc_id) rank regardless of binning."""

    def _scored(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, margin long")

    def test_all_equal_margins_balanced_and_byte_identical(self, spark):
        from data_ingestion_experiment_otp_spark.operators.sampling import (
            _global_ordinal,
            _ordinal_bins,
        )

        n, n_bins = 20000, 16
        # scrambled unique doc ids (multiplicative permutation mod prime)
        rows = [((i * 48271) % 1000003, 5) for i in range(n)]
        part = _ordinal_bins(self._scored(spark, rows), n_bins)
        counts = {
            r["pid"]: r["n"]
            for r in part.groupBy("pid").agg(F.count("*").alias("n")).collect()
        }
        assert sum(counts.values()) == n
        assert len(counts) >= n_bins // 2  # the single value actually split
        assert max(counts.values()) <= 2 * n / n_bins  # no wide task
        out = _global_ordinal(part, 4)
        got = sorted((r["ord"], r["doc_id"]) for r in out.collect())
        want = [(k + 1, d) for k, (d, _m) in enumerate(sorted(rows))]
        assert got == want  # ordinal == rank by (margin, doc_id), exactly

    def test_mixed_skew_and_unskewed_agree_with_naive_rank(self, spark):
        from data_ingestion_experiment_otp_spark.operators.sampling import (
            _CURRICULUM_PHASES,
            _global_ordinal,
            _ordinal_bins,
        )

        n, n_bins = 5000, 16
        # 90% of the mass on margin=5, the rest spread over 0..9
        rows = [
            ((i * 48271) % 1000003, 5 if i % 10 else i % 10)
            for i in range(n)
        ]
        part = _ordinal_bins(self._scored(spark, rows), n_bins)
        counts = [
            r["n"] for r in part.groupBy("pid").agg(F.count("*").alias("n")).collect()
        ]
        assert max(counts) <= 2 * n / n_bins
        out = {
            r["doc_id"]: (r["ord"], r["phase"])
            for r in _global_ordinal(part, _CURRICULUM_PHASES).collect()
        }
        ranked = sorted(rows, key=lambda t: (t[1], t[0]))
        total = len(ranked)
        for k, (d, _m) in enumerate(ranked):
            want_phase = ((k) * _CURRICULUM_PHASES) // total + 1
            assert out[d] == (k + 1, want_phase), d


class TestHashOrderedTrainerSample:
    """r9 (judge task 5): bounded trainer samples are taken in the
    package's Lehmer-hash order of vec_id, not id order — on a corpus
    whose ingest order correlates with content (a crawl lands source by
    source), the id-ordered head sees ONE region and the trained
    quantizer goes blind to the rest; the hash-ordered sample is a
    uniform slice of the same size."""

    def test_content_correlated_ids_bias_id_order_not_hash_order(self, spark):
        import numpy as np

        from data_ingestion_experiment_otp_spark.operators.similarity import (
            _IVF_TRAIN_CAP,
            _hash_ordered_sample,
            _ivf_train,
        )

        dim = 8

        def blob(axis, n, start_id):
            rows = []
            for t in range(n):
                v = [0.0] * dim
                v[axis] = 1.0
                v[(axis + 1) % dim] = 0.01 * (t % 7)
                rows.append((start_id + t, v))
            return rows

        # ids 0..2047 are all blob-0 content; ids 2048.. all blob-3 —
        # exactly the ingest-order correlation the hash order defeats
        rows = blob(0, _IVF_TRAIN_CAP, 0) + blob(3, _IVF_TRAIN_CAP, _IVF_TRAIN_CAP)
        vec = spark.createDataFrame(rows, "vec_id long, v array<double>")

        id_sample = [
            r["v"]
            for r in vec.orderBy("vec_id").limit(_IVF_TRAIN_CAP).select("v").collect()
        ]
        hash_sample = _hash_ordered_sample(vec, _IVF_TRAIN_CAP)
        assert all(v[0] == 1.0 for v in id_sample)  # id head: blob 0 only
        frac3 = sum(1 for v in hash_sample if v[3] == 1.0) / len(hash_sample)
        assert 0.4 < frac3 < 0.6  # hash slice: both regions, near-even

        # the hash-trained quantizer covers blob 3; the id-trained is blind
        probe = np.zeros(dim)
        probe[3] = 1.0
        d_id = ((_ivf_train(np.asarray(id_sample), 4) - probe) ** 2).sum(1).min()
        d_hash = ((_ivf_train(np.asarray(hash_sample), 4) - probe) ** 2).sum(1).min()
        assert d_hash < 0.01 < d_id


class TestNearDupScreenRecall:
    """r9 recall floor for the banded near-dup screen (judge task 1's
    'recorded beside a recall floor vs the exact screen'): on the fixture
    corpus the banded corpus-phase reject set EQUALS the exact screen's
    (every true >=0.6 batch-vs-index near-dup shares a band — 8 size-1
    bands give P[candidate] = 1-(1-j)^8 >= 0.9993 at j=0.6, and the
    deterministic fixture realizes 10/10), and banding can never add a
    false rejection (candidates are exact-verified)."""

    def test_banded_corpus_rejects_equal_exact_screen(self, spark, sf_dir):
        import os

        import duckdb

        from data_ingestion_experiment_otp_spark.operators.dedup import (
            _HS_DUCK,
            _JACCARD_THRESHOLD,
            _WHS_DUCK,
        )

        banded = {
            r["doc_id"]
            for r in dedup.llm_neardup_screen(spark, sf_dir).collect()
            if r["phase"] == "corpus"
        }
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{os.path.join(sf_dir, 'documents.parquet')}'"
        )
        exact = {
            r[0]
            for r in con.sql(f"""
            WITH ws_t AS (SELECT doc_id,
                     list_filter(string_split(text, ' '), w -> w <> '') AS ws
                   FROM documents),
            whs_t AS (SELECT doc_id, {_WHS_DUCK} AS whs
                      FROM ws_t WHERE len(ws) >= 3),
            hs_t AS (SELECT doc_id, {_HS_DUCK} AS hs FROM whs_t),
            g AS (SELECT doc_id, len(hs) AS n, unnest(hs) AS g FROM hs_t),
            pairs AS (
              SELECT b.doc_id AS doc_a, count(*) AS ic,
                     max(b.n) AS na, max(c.n) AS nb
              FROM g b JOIN g c ON b.g = c.g
              WHERE b.doc_id % 10 >= 8 AND c.doc_id % 10 < 8
              GROUP BY b.doc_id, c.doc_id
            )
            SELECT DISTINCT doc_a FROM pairs
            WHERE ic / (na + nb - ic) >= {_JACCARD_THRESHOLD}
            """).fetchall()
        }
        assert banded == exact and len(exact) > 0


class TestCcnetBuckets:
    """r11: CCNet's per-language head/middle/tail perplexity terciles —
    planted corpus where perplexity order is known by construction, so
    the bucket labels (not just the hashes) are pinned."""

    DOC = "doc_id long, text string, lang string, source string, n_chars long"

    def _write(self, spark, tmp_path, rows):
        import os

        d = os.path.join(str(tmp_path), "fixture")
        spark.createDataFrame(
            [(i, t, lg, "s0", len(t)) for i, t, lg in rows], self.DOC
        ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        return d

    def test_common_word_docs_head_rare_docs_tail_per_lang(
        self, spark, tmp_path
    ):
        from data_ingestion_experiment_otp_spark.operators.text_analysis import (
            llm_ccnet_buckets,
        )

        rows = []
        # lang 'aa': 6 docs — 2 of pure common filler (lowest bits: the
        # corpus-dominant token), 2 mixed, 2 of globally-unique words
        # (highest bits). Perplexity order is forced by construction.
        common = "alpha " * 40
        for i in range(2):
            rows.append((i, common.strip(), "aa"))
        for i in range(2, 4):
            rows.append((i, (common + f"mid{i} " * 8).strip(), "aa"))
        for i in range(4, 6):
            uniq = " ".join(f"rare{i}w{j}" for j in range(30))
            rows.append((i, uniq, "aa"))
        # lang 'bb': 3 docs, own stratum — terciles computed independently
        rows.append((10, ("beta " * 50).strip(), "bb"))
        rows.append((11, ("beta " * 30 + "bmid " * 10).strip(), "bb"))
        rows.append((12, " ".join(f"brare{j}" for j in range(25)), "bb"))

        d = self._write(spark, tmp_path, rows)
        got = {
            r["doc_id"]: r["bucket"]
            for r in llm_ccnet_buckets(spark, d).collect()
        }
        assert {got[0], got[1]} == {"head"}
        assert {got[2], got[3]} == {"middle"}
        assert {got[4], got[5]} == {"tail"}
        assert (got[10], got[11], got[12]) == ("head", "middle", "tail")

    def test_tercile_counts_balanced(self, spark, tmp_path):
        from collections import Counter

        from data_ingestion_experiment_otp_spark.operators.text_analysis import (
            llm_ccnet_buckets,
        )

        # 9 docs, one lang, strictly distinct perplexities -> exact 3/3/3
        rows = [
            (i, ("base " * (40 - 3 * i) + " ".join(f"u{i}x{j}" for j in range(i))).strip(), "aa")
            for i in range(9)
        ]
        d = self._write(spark, tmp_path, rows)
        out = llm_ccnet_buckets(spark, d).collect()
        assert Counter(r["bucket"] for r in out) == {
            "head": 3, "middle": 3, "tail": 3,
        }


class TestDsirSelect:
    """r11: DSIR importance selection — a raw document written in the
    TARGET stratum's vocabulary must outscore one written in junk
    vocabulary, and selection takes the per-source top quarter."""

    DOC = "doc_id long, text string, lang string, source string, n_chars long"

    def test_target_vocab_docs_outscore_and_get_selected(
        self, spark, tmp_path
    ):
        from data_ingestion_experiment_otp_spark.operators.sampling import (
            llm_dsir_select,
        )

        import os

        stops = ["the", "a", "of", "and", "in", "to"]
        tgt_vocab = [f"clean{j}" for j in range(40)]
        junk_vocab = [f"junk{j}" for j in range(40)]
        rows = []
        # 4 high-quality target docs (n_chars high, all-distinct shared
        # clean vocab, no stopwords -> quality 1.0 >= floor): the target
        # distribution occupies only the clean-word buckets
        for i in range(4):
            rows.append((i, " ".join(tgt_vocab), "aa", "s0", 999))
        # 8 raw low-quality docs (stopword-heavy, n_chars=1 -> quality
        # ~0.46 < floor): 4 written in target vocab, 4 in junk vocab
        filler = stops * 2  # 12 stopword tokens
        for i in range(10, 14):
            rows.append(
                (i, " ".join(filler + tgt_vocab[:20]), "aa", "s0", 1)
            )
        for i in range(20, 24):
            rows.append(
                (i, " ".join(filler + junk_vocab[:20]), "aa", "s0", 1)
            )
        d = os.path.join(str(tmp_path), "fixture")
        spark.createDataFrame(rows, self.DOC).coalesce(1).write.parquet(
            os.path.join(d, "documents.parquet")
        )
        out = {r["doc_id"]: r for r in llm_dsir_select(spark, d).collect()}
        assert len(out) == 12
        # every target-vocab raw doc outscores every junk-vocab raw doc
        lo_t = min(out[i]["logratio"] for i in range(10, 14))
        hi_j = max(out[i]["logratio"] for i in range(20, 24))
        assert lo_t > hi_j
        # the target-defining docs themselves score highest of all
        assert min(out[i]["logratio"] for i in range(4)) >= lo_t
        # top quarter of the 12-doc source = 3 docs, by (logratio, doc_id)
        sel = sorted(i for i, r in out.items() if r["selected"])
        ranked = sorted(
            out.values(), key=lambda r: (-r["logratio"], r["doc_id"])
        )
        assert sel == sorted(r["doc_id"] for r in ranked[:3])

    def test_no_target_stratum_degrades_to_uniform_target(
        self, spark, tmp_path
    ):
        from data_ingestion_experiment_otp_spark.operators.sampling import (
            llm_dsir_select,
        )

        import os

        # every doc below the quality floor: p_target is the add-1
        # uniform, so logratio = -KL-ish penalty of the doc's own bucket
        # mass vs uniform — must run, never divide by zero
        rows = [
            (i, " ".join(["w"] * 20), "aa", "s0", 1) for i in range(6)
        ]
        d = os.path.join(str(tmp_path), "fixture")
        spark.createDataFrame(rows, self.DOC).coalesce(1).write.parquet(
            os.path.join(d, "documents.parquet")
        )
        out = llm_dsir_select(spark, d).collect()
        assert len(out) == 6
        assert all(r["logratio"] is not None for r in out)


class TestCcnetBucketsApprox:
    """The sketch-thresholded CCNet split against its exact rank-tercile
    twin (the llm_quality_gate_approx precedent): on the fixture corpus
    the labels must agree except possibly at the cut points themselves,
    and a disagreement can only ever be between ADJACENT classes."""

    ORDER = {"head": 0, "middle": 1, "tail": 2}

    def test_labels_track_exact_terciles(self, spark, sf_dir):
        from data_ingestion_experiment_otp_spark.operators.text_analysis import (
            llm_ccnet_buckets,
            llm_ccnet_buckets_approx,
        )

        exact = {
            r["doc_id"]: (r["lang"], r["dl"], r["avg_bits"], r["bucket"])
            for r in llm_ccnet_buckets(spark, sf_dir).collect()
        }
        approx = {
            r["doc_id"]: (r["lang"], r["dl"], r["avg_bits"], r["bucket"])
            for r in llm_ccnet_buckets_approx(spark, sf_dir).collect()
        }
        assert set(exact) == set(approx) and len(exact) > 0
        n_disagree = 0
        for i, (lg, dl, bits, be) in exact.items():
            lga, dla, bitsa, ba = approx[i]
            assert (lg, dl, bits) == (lga, dla, bitsa)  # scorer identical
            if be != ba:
                n_disagree += 1
                # never a head<->tail flip: the sketch can only blur a
                # cut point, not reorder the strata
                assert abs(self.ORDER[be] - self.ORDER[ba]) == 1, (i, be, ba)
        # fixture strata fit inside one exact sketch: agreement is
        # near-total (cut-point floor/ceil wobble only)
        assert n_disagree <= max(2, len(exact) // 50)


class TestQctWeightStore:
    """r11: the trained classifier's committed weight store
    (qct_model_dir — the trained-hierarchy store pattern): train once,
    serve identical weights forever; a changed corpus keys a new
    generation."""

    DOC = "doc_id long, text string, lang string, source string, n_chars long"

    def _corpus(self, spark, where, tag):
        import os

        keep = "the and with that " + " ".join(f"w{j}ord{tag}" for j in range(56))
        drop = " ".join(f"zzjunk{j}{tag}" for j in range(60))
        rows = [(i, keep + f" k{i}", "xx", "s0", 400) for i in range(4)]
        rows += [(i, drop + f" d{i}", "xx", "s0", 400) for i in range(4, 8)]
        d = os.path.join(str(where), f"fixture{tag}")
        spark.createDataFrame(rows, self.DOC).coalesce(1).write.parquet(
            os.path.join(d, "documents.parquet")
        )
        return d

    def test_train_once_serve_identical_and_key_separation(
        self, spark, tmp_path
    ):
        import os

        from data_ingestion_experiment_otp_spark.operators.text_analysis import (
            qct_model_dir,
            qct_trained_weights,
        )

        d1 = self._corpus(spark, tmp_path, "a")
        m1 = qct_model_dir(spark, d1)
        assert os.path.isfile(os.path.join(m1, "_COMMITTED"))
        w1 = qct_trained_weights(spark, d1)
        assert qct_model_dir(spark, d1) == m1  # served, not retrained
        assert qct_trained_weights(spark, d1) == w1
        assert len(w1) == 129 and any(x != 0 for x in w1)

        d2 = self._corpus(spark, tmp_path, "b")
        m2 = qct_model_dir(spark, d2)
        assert m2 != m1  # different corpus -> different generation
        assert qct_trained_weights(spark, d2) != w1

    def test_trainer_repartition_invariant(self, spark, tmp_path):
        """The distributed perceptron's learned weights may not depend on
        input partitioning (pure-int argument — replaces the generic
        loader-seam canary, which the committed store now bypasses)."""
        from data_ingestion_experiment_otp_spark.operators.text_analysis import (
            _qct_train,
            _qct_training_set,
        )

        d = self._corpus(spark, tmp_path, "r")
        ts = _qct_training_set(spark, d)
        w_plain = _qct_train(ts)
        w_repart = _qct_train(ts.repartition(7))
        assert list(w_plain) == list(w_repart)


class TestMixtureMaterialize:
    """r11: the mixture manifest — per-source epoch factors turned into
    actual (doc, copy) rows by the deterministic Lehmer coin; checked
    against an independent Python replica of the coin given the weights
    op's own epochs."""

    DOC = "doc_id long, text string, lang string, source string, n_chars long"

    def test_repeats_track_epochs_and_coin_exactly(self, spark, tmp_path):
        import math
        import os

        from data_ingestion_experiment_otp_spark.operators.clustering import (
            _HASH_MOD,
            _HASH_MULT2,
        )
        from data_ingestion_experiment_otp_spark.operators.sampling import (
            llm_mixture_materialize,
            llm_mixture_weights,
        )

        # small clean source (few docs, all quality 1.0) vs a dominant
        # source: temperature scaling upsamples the small one (epochs > 1)
        # and trains the big one sub-1-epoch
        rows = []
        clean = " ".join(f"c{j}word" for j in range(60))
        for i in range(4):
            rows.append((i, clean + f" s{i}", "aa", "small", 400))
        for i in range(100, 160):
            rows.append((i, clean + f" b{i}", "aa", "big", 400))
        d = os.path.join(str(tmp_path), "fixture")
        spark.createDataFrame(rows, self.DOC).coalesce(1).write.parquet(
            os.path.join(d, "documents.parquet")
        )
        epochs = {
            r["source"]: r["epochs"]
            for r in llm_mixture_weights(spark, d).collect()
        }
        assert epochs["small"] > 1.0 > epochs["big"] > 0.0

        got = {}
        for r in llm_mixture_materialize(spark, d).collect():
            got[r["doc_id"]] = max(got.get(r["doc_id"], 0), r["copy"])
        # independent replica of the coin (every planted doc is a keeper
        # passing the floor: distinct texts, quality 1.0)
        for i, _t, _lg, src, _n in rows:
            e = epochs[src]
            thr = round((e - math.floor(e)) * 1_000_000)
            h = (i % _HASH_MOD) * _HASH_MULT2 % _HASH_MOD % 1_000_000
            want = int(math.floor(e)) + (1 if h < thr else 0)
            assert got.get(i, 0) == want, (i, src, e, want)
        # and the manifest enumerates copy = 1..n for each doc
        per_doc = {}
        for r in llm_mixture_materialize(spark, d).collect():
            per_doc.setdefault(r["doc_id"], []).append(r["copy"])
        for i, cs in per_doc.items():
            assert sorted(cs) == list(range(1, len(cs) + 1))


class TestDsirSelectApprox:
    """The sketch-thresholded DSIR selection against its exact rank twin:
    identical scores, selection agrees except in the sketch's error band
    around the per-source cut point."""

    def test_selection_tracks_exact_rank(self, spark, sf_dir):
        from data_ingestion_experiment_otp_spark.operators.sampling import (
            llm_dsir_select,
            llm_dsir_select_approx,
        )

        exact = {
            r["doc_id"]: (r["source"], r["dl"], r["logratio"], r["selected"])
            for r in llm_dsir_select(spark, sf_dir).collect()
        }
        approx = {
            r["doc_id"]: (r["source"], r["dl"], r["logratio"], r["selected"])
            for r in llm_dsir_select_approx(spark, sf_dir).collect()
        }
        assert set(exact) == set(approx) and len(exact) > 0
        for i, (src, dl, lr, _sel) in exact.items():
            srca, dla, lra, _sela = approx[i]
            assert (src, dl, lr) == (srca, dla, lra)  # scorer identical
        # a disagreement is legitimate ONLY at the cut: a threshold
        # selection cannot break ties the rank selection breaks by
        # doc_id, so every disagreeing doc's score must lie inside the
        # exact selection's own boundary band [max rejected, min
        # selected] for its source (on an all-ties plateau — the sf0.001
        # fixture — that band is the single tied value and the whole
        # plateau may flip; with distinct scores the band is empty and
        # selections must agree everywhere except the cut value itself)
        bands: dict = {}
        for i, (src, _dl, lr, sel) in exact.items():
            lo, hi = bands.get(src, (None, None))
            if sel:
                lo = lr if lo is None else min(lo, lr)
            else:
                hi = lr if hi is None else max(hi, lr)
            bands[src] = (lo, hi)
        for i, (src, _dl, lr, sel) in exact.items():
            if approx[i][3] != sel:
                lo, hi = bands[src]
                assert lo is not None and hi is not None
                assert hi >= lr >= lo or lo >= lr >= hi, (i, src, lr, lo, hi)
        # selection never inverts the score order within a source:
        # every approx-selected doc outscores (or ties) every
        # approx-rejected doc of the same source
        per_src: dict = {}
        for i, (src, _dl, lr, sel) in approx.items():
            per_src.setdefault(src, []).append((lr, sel))
        for src, rows in per_src.items():
            lo_sel = min((lr for lr, sel in rows if sel), default=None)
            hi_rej = max((lr for lr, sel in rows if not sel), default=None)
            if lo_sel is not None and hi_rej is not None:
                assert lo_sel >= hi_rej, src

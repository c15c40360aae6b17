"""Streaming vocabulary-drift monitor: flags the drifted epoch, agrees
with a hand-computed KL, absorbs replay."""

from __future__ import annotations

import math
import pytest
import re
import time
from collections import Counter

from data_ingestion_experiment_otp_spark.streaming import drive
from data_ingestion_experiment_otp_spark.streaming.drift_monitor import (
    _UNSEEN_P,
    calibrate_reference,
    drift_monitor_sink,
    read_audit,
)

DOC_SCHEMA = "doc_id long, text string"

REF_DOCS = [(int(i), "alpha beta gamma delta " * 5) for i in range(20)]
IN_DIST = [(100, "alpha beta gamma delta alpha beta"), (101, "gamma delta alpha beta")]
DRIFTED = [(200, "zzyx qwfp vbnm zzyx qwfp " * 4), (201, "qwfp vbnm zzyx")]


def _kl_by_hand(rows, reference):
    toks = []
    for _i, text in rows:
        toks.extend(re.findall(r"[a-z]+", text.lower()))
    counts = Counter(toks)
    n = sum(counts.values())
    kl = 0.0
    for t, c in counts.items():
        # the sink keys the reference by Spark's xxhash64; recompute via a
        # term->p map keyed by the plain term instead (built in the test)
        p_ref = reference.get(t, _UNSEEN_P)
        kl += (c / n) * math.log2((c / n) / p_ref)
    return kl


class TestDriftMonitor:
    def _plain_reference(self):
        toks = []
        for _i, text in REF_DOCS:
            toks.extend(re.findall(r"[a-z]+", text.lower()))
        n = sum(Counter(toks).values())
        return {t: c / n for t, c in Counter(toks).items()}

    def test_flags_drifted_epoch_and_matches_hand_kl(self, spark, tmp_path):
        ref = calibrate_reference(spark.createDataFrame(REF_DOCS, DOC_SCHEMA))
        in_dir = str(tmp_path / "feed")
        for rows in (IN_DIST, DRIFTED, IN_DIST):
            spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(in_dir)
            time.sleep(0.05)
        mon = str(tmp_path / "monitor")
        q = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
            .writeStream.foreachBatch(drift_monitor_sink(mon, ref, kl_budget_bits=1.0))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drive.drain(q)

        audit = {r.batch_id: r for r in read_audit(spark, mon).collect()}
        assert set(audit) == {0, 1, 2}
        assert not audit[0].drifted and not audit[2].drifted
        assert audit[1].drifted, audit[1]
        assert audit[1].n_unseen > 0 and audit[0].n_unseen == 0
        assert audit[1].kl_bits > 1.0 > audit[0].kl_bits >= 0.0

        plain = self._plain_reference()
        want0 = _kl_by_hand(IN_DIST, plain)
        want1 = _kl_by_hand(DRIFTED, plain)
        assert abs(audit[0].kl_bits - want0) < 1e-6, (audit[0].kl_bits, want0)
        assert abs(audit[1].kl_bits - want1) < 1e-6, (audit[1].kl_bits, want1)

    def test_truncated_reference_bounds_driver_state_and_matches_hand_kl(
        self, spark, tmp_path
    ):
        """r7: calibrate_reference holds only the top-K head plus ONE
        tail bucket — never the full vocabulary. With top_k=2 over a
        4-term corpus, the dict carries exactly 2 term entries, the tail
        bucket records the other 2 terms' average probability, and the
        sink's KL matches a hand computation against that truncated
        reference to 1e-6 (head terms exact, out-of-head at the tail
        floor)."""
        from data_ingestion_experiment_otp_spark.streaming.drift_monitor import (
            _TAIL_KEY,
        )

        # frequencies: alpha 4, beta 3, gamma 2, delta 1 (total 10)
        corpus = [(1, "alpha alpha alpha alpha beta beta beta gamma gamma delta")]
        ref = calibrate_reference(
            spark.createDataFrame(corpus, DOC_SCHEMA), top_k=2
        )
        tail_p, tail_terms = ref[_TAIL_KEY]
        head = {k: v for k, v in ref.items() if k != _TAIL_KEY}
        assert len(head) == 2
        assert sorted(head.values(), reverse=True) == [0.4, 0.3]
        assert tail_terms == 2
        assert abs(tail_p - (3 / 10) / 2) < 1e-12  # (2+1)/10 over 2 terms

        batch = [(9, "alpha beta gamma zzyx")]  # head, head, tail, novel
        mon = str(tmp_path / "monitor")
        drift_monitor_sink(mon, ref, kl_budget_bits=1.0)(
            spark.createDataFrame(batch, DOC_SCHEMA), 0
        )
        row = read_audit(spark, mon).collect()[0]
        assert row.n_unseen == 2  # gamma (tail) + zzyx (novel): out-of-head
        by_p = sorted(head.values(), reverse=True)
        want = sum(
            (1 / 4) * math.log2((1 / 4) / p)
            for p in (by_p[0], by_p[1], tail_p, tail_p)
        )
        assert abs(row.kl_bits - want) < 1e-6, (row.kl_bits, want)

    def test_tiebreak_on_equal_counts_is_deterministic(self, spark):
        """Equal-frequency terms at the head boundary resolve by hash
        order — the same head set on every replay/recalibration."""
        corpus = [(1, "aa bb cc dd")]  # all count 1
        df = spark.createDataFrame(corpus, DOC_SCHEMA)
        from data_ingestion_experiment_otp_spark.streaming.drift_monitor import (
            _TAIL_KEY,
        )

        refs = [calibrate_reference(df, top_k=2) for _ in range(3)]
        heads = [tuple(sorted(k for k in r if k != _TAIL_KEY)) for r in refs]
        assert heads[0] == heads[1] == heads[2]
        assert len(heads[0]) == 2

    def test_replay_rewrites_identical_audit_row(self, spark, tmp_path):
        ref = calibrate_reference(spark.createDataFrame(REF_DOCS, DOC_SCHEMA))
        mon = str(tmp_path / "monitor")
        sink = drift_monitor_sink(mon, ref)
        sink(spark.createDataFrame(IN_DIST, DOC_SCHEMA), 0)
        sink(spark.createDataFrame(DRIFTED, DOC_SCHEMA), 1)
        before = sorted(map(tuple, read_audit(spark, mon).collect()))
        sink(spark.createDataFrame(DRIFTED, DOC_SCHEMA), 1)  # replay
        after = sorted(map(tuple, read_audit(spark, mon).collect()))
        assert after == before and len(after) == 2


class TestSourceDrift:
    SCHEMA = "doc_id long, source string, text string"

    def test_bad_source_flagged_others_green_and_hand_kl(self, spark, tmp_path):
        """Two sources share epoch 0's calibration corpus; in epoch 1
        source B switches to never-seen vocabulary while A stays on
        distribution — B's row must flag drifted, A's must not, and A's
        KL must match a hand-computed value to 1e-6. The epoch-global
        monitor on the same batch does NOT flag (B is a small mixture
        fraction) — the reason the per-source form exists."""
        import math
        from collections import Counter

        from data_ingestion_experiment_otp_spark.streaming.drift_monitor import (
            calibrate_reference,
            drift_monitor_sink,
            read_audit,
            read_source_audit,
            source_drift_sink,
        )

        base_a = "alpha beta gamma delta " * 6
        base_b = "epsilon zeta eta theta"
        corpus = spark.createDataFrame(
            [(1, "A", base_a), (2, "B", base_b)], self.SCHEMA
        )
        ref = calibrate_reference(corpus.select("doc_id", "text"))

        drifted_batch = [
            (3, "A", base_a),                      # on-distribution
            (4, "B", "zzz qqq xxx yyy www vvv"),   # vocabulary swap
        ]
        bdf = spark.createDataFrame(drifted_batch, self.SCHEMA)
        sdir = str(tmp_path / "src_audit")
        source_drift_sink(sdir, ref, kl_budget_bits=1.0)(bdf, 0)
        rows = {r["source"]: r for r in read_source_audit(spark, sdir).collect()}
        assert rows["B"]["drifted"] is True
        assert rows["B"]["n_unseen"] == rows["B"]["n_tokens"]
        assert rows["A"]["drifted"] is False

        # hand KL for source A: tokens of base_a vs reference distribution
        toks = base_a.split()
        n = len(toks)
        counts = Counter(toks)
        ref_by_term = {}
        # recover p_ref per term via the engine's hash on a tiny frame
        from pyspark.sql import functions as F2

        h = {
            r["term"]: r["thash"]
            for r in spark.createDataFrame([(t,) for t in set(toks)], "term string")
            .select("term", F2.xxhash64("term").alias("thash"))
            .collect()
        }
        expect = sum(
            (c / n) * math.log2((c / n) / ref[h[t]]) for t, c in counts.items()
        )
        assert abs(rows["A"]["kl_bits"] - expect) < 1e-6

        # dilution: the global monitor sees B's spike averaged down by
        # A's on-distribution mass — its KL sits well under B's row
        gdir = str(tmp_path / "glob_audit")
        drift_monitor_sink(gdir, ref)(bdf.select("doc_id", "text"), 0)
        g = read_audit(spark, gdir).collect()[0]
        assert g["kl_bits"] < rows["B"]["kl_bits"] / 2

    def test_replay_rewrites_identical_rows(self, spark, tmp_path):
        from data_ingestion_experiment_otp_spark.streaming.drift_monitor import (
            calibrate_reference,
            read_source_audit,
            source_drift_sink,
        )

        corpus = spark.createDataFrame(
            [(1, "A", "alpha beta gamma"), (2, "B", "delta epsilon zeta")],
            self.SCHEMA,
        )
        ref = calibrate_reference(corpus.select("doc_id", "text"))
        sdir = str(tmp_path / "audit")
        sink = source_drift_sink(sdir, ref)
        sink(corpus, 0)
        before = sorted(map(tuple, read_source_audit(spark, sdir).collect()))
        sink(corpus, 0)  # replay
        after = sorted(map(tuple, read_source_audit(spark, sdir).collect()))
        assert before == after and len(before) == 2


class TestCapstoneDriftStage:
    @pytest.mark.slow
    def test_drift_audit_is_fifth_capstone_stage(self, spark, tmp_path):
        """With a calibrated reference, the corpus-ingest epoch writes
        the per-source drift audit alongside the other stores — scored
        on the RAW batch (a re-crawled duplicate still counts toward
        drift even though the dedup screen drops it), batchId-keyed, and
        replay-invariant with the rest of the composition."""
        import numpy as np

        from data_ingestion_experiment_otp_spark.streaming.corpus_pipeline import (
            corpus_ingest_dirs,
            corpus_ingest_epoch,
        )
        from data_ingestion_experiment_otp_spark.streaming.drift_monitor import (
            calibrate_reference,
            read_source_audit,
        )

        rng = np.random.default_rng(9)
        schema = (
            "doc_id long, source string, n_chars long, text string,"
            " embedding array<float>"
        )
        good = "alpha beta gamma delta epsilon zeta"
        bad = "qqq www eee rrr ttt yyy"
        ref = calibrate_reference(
            spark.createDataFrame([(0, good)], "doc_id long, text string")
        )
        cents = spark.createDataFrame(
            [(0, [float(x) for x in rng.standard_normal(64)])],
            "vec_id long, embedding array<float>",
        ).collect()
        work = str(tmp_path / "work")
        epoch = corpus_ingest_epoch(
            work, cents, {"*": 0.0}, drift_reference=ref, drift_budget_bits=1.0
        )
        rows0 = [
            (1, "web", len(good), good, [float(x) for x in rng.standard_normal(64)]),
            (2, "spam", len(bad), bad, [float(x) for x in rng.standard_normal(64)]),
        ]
        epoch(spark.createDataFrame(rows0, schema), 0)
        dirs = corpus_ingest_dirs(work)
        audit = {
            r["source"]: r for r in read_source_audit(spark, dirs["drift_audit"]).collect()
        }
        assert audit["spam"]["drifted"] is True
        assert audit["web"]["drifted"] is False

        # replay: every store incl. the audit rewrites identically
        before = sorted(map(tuple, read_source_audit(spark, dirs["drift_audit"]).collect()))
        epoch(spark.createDataFrame(rows0, schema), 0)
        after = sorted(map(tuple, read_source_audit(spark, dirs["drift_audit"]).collect()))
        assert before == after


class TestVectorDrift:
    """streaming/drift_monitor.py::vector_drift_sink (r10) — per-source
    EMBEDDING drift against the trained hierarchy's fine-cluster
    distribution: the vector-modality twin of the token monitors."""

    DOC_SCHEMA = "doc_id long, source string, text string, embedding array<float>"

    @staticmethod
    def _basis(i, dim=8):
        v = [0.0] * dim
        v[i] = 1.0
        return v

    @classmethod
    def _model_and_reference(cls, spark, tmp_path):
        """Train the hierarchy on an anchor corpus split evenly over two
        directions and calibrate the cluster reference on it (a 50/50
        two-cluster reference, asserted in the tests that rely on it)."""
        import os

        from data_ingestion_experiment_otp_spark.operators.clustering import (
            sem_model_dir,
        )
        from data_ingestion_experiment_otp_spark.streaming.drift_monitor import (
            calibrate_vector_reference,
        )

        rows = [(i, cls._basis(i % 2)) for i in range(30)]
        sf = str(tmp_path / "calib")
        vec_df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        vec_df.coalesce(1).write.parquet(os.path.join(sf, "embeddings.parquet"))
        mdl = sem_model_dir(spark, sf)
        ref = calibrate_vector_reference(vec_df, mdl)
        return mdl, ref

    @pytest.mark.slow
    def test_shifted_source_flagged_stable_source_green(self, spark, tmp_path):
        """A source whose cluster distribution CONCENTRATES away from
        the calibrated mixture is flagged while a source still emitting
        the mixture stays green in the SAME epoch; docs without
        embeddings stay out of the distribution; off-head mass is
        counted against a truncated reference; a replayed epoch rewrites
        identical rows."""
        import os

        from data_ingestion_experiment_otp_spark.streaming.drift_monitor import (
            _TAIL_KEY,
            calibrate_vector_reference,
            read_vector_audit,
            vector_drift_sink,
        )

        mdl, ref = self._model_and_reference(spark, tmp_path)
        head = {k: v for k, v in ref.items() if k != _TAIL_KEY}
        # the anchor corpus trains to a 2-cluster 50/50 reference here —
        # the concentration KL below (1.0 bit exactly) depends on it
        assert sorted(head.values()) == [0.5, 0.5], head
        mon = str(tmp_path / "vector_drift")
        sink = vector_drift_sink(mon, mdl, ref, kl_budget_bits=0.5)

        # epoch 0: both sources emit the calibrated mixture (dirs 0/1
        # alternating = the two reference clusters at their 50/50 mass)
        # direction decoupled from source: each source emits BOTH
        # reference clusters at their calibrated 50/50 mass
        mix = [
            (100 + i, "web" if i % 2 else "forum", "t", self._basis((i // 2) % 2))
            for i in range(12)
        ]
        sink(
            spark.createDataFrame(
                mix + [(999, "web", "no geometry", None)], self.DOC_SCHEMA
            ),
            0,
        )
        rows0 = {
            r["source"]: r.asDict()
            for r in read_vector_audit(spark, mon)
            .filter("batch_id = 0")
            .collect()
        }
        assert set(rows0) == {"web", "forum"}
        assert not rows0["web"]["drifted"] and not rows0["forum"]["drifted"]
        # the null-embedding doc is excluded from web's vector count
        assert rows0["web"]["n_vecs"] == 6
        assert rows0["web"]["n_offhead"] == 0

        # epoch 1: forum CONCENTRATES into one cluster (all vectors in
        # one 0.5-mass bucket -> KL = 1.0 bit exactly, over the 0.5
        # budget); web keeps the mixture (~0 bits)
        shifted = [
            (200 + i, "forum", "t", self._basis(1)) for i in range(8)
        ] + [(300 + i, "web", "t", self._basis(i % 2)) for i in range(6)]
        sink(spark.createDataFrame(shifted, self.DOC_SCHEMA), 1)
        rows1 = {
            r["source"]: r.asDict()
            for r in read_vector_audit(spark, mon)
            .filter("batch_id = 1")
            .collect()
        }
        assert rows1["forum"]["drifted"], rows1
        assert abs(rows1["forum"]["kl_bits"] - 1.0) < 1e-6
        assert not rows1["web"]["drifted"], rows1
        assert rows1["forum"]["kl_bits"] > rows1["web"]["kl_bits"]

        # replay epoch 1 verbatim: byte-identical audit rows
        before = sorted(
            map(tuple, spark.read.parquet(os.path.join(mon, "batch_id=1")).collect())
        )
        sink(spark.createDataFrame(shifted, self.DOC_SCHEMA), 1)
        after = sorted(
            map(tuple, spark.read.parquet(os.path.join(mon, "batch_id=1")).collect())
        )
        assert after == before

        # off-head mass: against a top_k=1 TRUNCATED reference (one head
        # cluster + the other as the tail), a batch concentrated in the
        # tail cluster reports its whole mass as off-head
        vec_df = spark.createDataFrame(
            [(i, self._basis(i % 2)) for i in range(30)],
            "vec_id long, embedding array<float>",
        )
        ref1 = calibrate_vector_reference(vec_df, mdl, top_k=1)
        head1 = {k: v for k, v in ref1.items() if k != _TAIL_KEY}
        assert len(head1) == 1 and ref1[_TAIL_KEY][1] == 1
        mon2 = str(tmp_path / "vector_drift_trunc")
        sink2 = vector_drift_sink(mon2, mdl, ref1, kl_budget_bits=0.5)
        # emit only vectors of the NON-head cluster: try dir 0, fall back
        # to dir 1 — exactly one of them is the tail cluster
        for d in (0, 1):
            sink2(
                spark.createDataFrame(
                    [(500 + i, "web", "t", self._basis(d)) for i in range(4)],
                    self.DOC_SCHEMA,
                ),
                d,
            )
        offheads = {
            r["batch_id"]: r["n_offhead"]
            for r in read_vector_audit(spark, mon2).collect()
        }
        assert sorted(offheads.values()) == [0, 4], offheads

    @pytest.mark.slow
    def test_reference_matches_hand_distribution(self, spark, tmp_path):
        """The calibrated reference is the exact fine-cluster mass
        distribution of the calibration corpus (head covers everything
        at this scale; tail empty), and an in-distribution epoch's KL is
        ~0 while a uniform-over-one-cluster epoch's matches the closed
        form -log2(p_ref(cluster))."""
        import math

        from data_ingestion_experiment_otp_spark.operators.clustering import (
            load_sem_model_trained,
            sem_fine_assign,
        )
        from data_ingestion_experiment_otp_spark.streaming.drift_monitor import (
            _TAIL_KEY,
            read_vector_audit,
            vector_drift_sink,
        )

        mdl, ref = self._model_and_reference(spark, tmp_path)
        head = {k: v for k, v in ref.items() if k != _TAIL_KEY}
        assert abs(sum(head.values()) - 1.0) < 1e-9
        assert ref[_TAIL_KEY] == (None, 0)

        # every mass bucket is a real cluster of the trained model
        model = load_sem_model_trained(spark, mdl)
        assigned = sem_fine_assign(
            spark.createDataFrame(
                [(i, self._basis(i % 2)) for i in range(30)],
                "vec_id long, embedding array<float>",
            ),
            *model,
        )
        from collections import Counter

        got = Counter(r["cluster_id"] for r in assigned.collect())
        assert {k: c / 30 for k, c in got.items()} == head

        # single-cluster epoch: KL = -log2(p_ref) exactly
        target = min(head)  # deterministic pick
        mon = str(tmp_path / "mon2")
        sink = vector_drift_sink(mon, mdl, ref, kl_budget_bits=0.1)
        # find a basis direction landing in `target`
        probe_dir = next(
            d
            for d in range(2)
            if next(
                r["cluster_id"]
                for r in sem_fine_assign(
                    spark.createDataFrame(
                        [(0, self._basis(d))], "vec_id long, embedding array<float>"
                    ),
                    *model,
                ).collect()
            )
            == target
        )
        sink(
            spark.createDataFrame(
                [(i, "web", "t", self._basis(probe_dir)) for i in range(5)],
                self.DOC_SCHEMA,
            ),
            0,
        )
        row = read_vector_audit(spark, mon).filter("batch_id = 0").collect()[0]
        assert abs(row["kl_bits"] - round(-math.log2(head[target]), 6)) < 1e-6

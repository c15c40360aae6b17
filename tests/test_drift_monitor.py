"""Streaming vocabulary-drift monitor: flags the drifted epoch, agrees
with a hand-computed KL, absorbs replay."""

from __future__ import annotations

import math
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

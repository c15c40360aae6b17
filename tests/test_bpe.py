"""BPE tier semantics (r7): train / encode / pack pinned three ways.

1. Planted-corpus exact semantics: Spark AND the DuckDB oracle both equal
   an independent pure-Python greedy-BPE reference — including the
   overlapping-pair case ("aaaa": left-to-right non-overlapping merge) and
   the pair-exhaustion case (corpus runs dry before round N: Spark breaks,
   the SQL chain's LEFT JOIN ON TRUE no-ops — both must keep the merge
   list short and the segmentations stable).
2. Fixture invariants: conservation (packs partition the token stream
   exactly), bounds (n_words ≤ n_bpe_tokens ≤ Σ word lengths), and exact
   reconstruction of the pack manifest from the encode output.
"""

from __future__ import annotations

import collections

import duckdb
import pytest
from pyspark.sql import functions as F

from data_ingestion_experiment_otp_spark.operators.bpe import (
    _BPE_PACK_CAP,
    _BPE_SHARDS,
    _N_MERGES,
)
from data_ingestion_experiment_otp_spark.plans.registry import all_queries

SPECS = all_queries()


def py_bpe(texts, n_merges):
    """Independent greedy-BPE reference (Sennrich-style, word-weighted)."""
    wc = collections.Counter()
    for t in texts:
        for w in (t or "").split(" "):
            if w:
                wc[w] += 1
    segs = {w: list(w) for w in wc}
    merges = []
    for rnk in range(1, n_merges + 1):
        pc = collections.Counter()
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        (s1, s2), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnk, s1, s2, s1 + s2, c))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == s1 and syms[i + 1] == s2:
                    out.append(s1 + s2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges, segs


def py_encode(rows, segs):
    """(doc_id, text) rows -> {doc_id: (n_words, n_bpe_tokens, tok_checksum)}."""
    vocab = {
        s: i + 1
        for i, s in enumerate(sorted({s for syms in segs.values() for s in syms}))
    }
    ws = {
        w: (len(syms), sum(vocab[s] * (i + 1) for i, s in enumerate(syms)))
        for w, syms in segs.items()
    }
    out = {}
    for did, t in rows:
        nw = nt = ck = 0
        for w in (t or "").split(" "):
            if w:
                nw += 1
                nt += ws[w][0]
                ck += ws[w][1]
        if nw:
            out[did] = (nw, nt, ck)
    return out


def plant(spark, tmp_path, docs):
    out = tmp_path / "docs"
    spark.createDataFrame(
        [(i, t, "xx", "src_bpe", len(t) if t is not None else 0) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{out}/documents.parquet/*.parquet'"
    )
    return str(out), con


# Overlap-heavy corpus: "aaaa"/"aaa" pin the left-to-right non-overlapping
# greedy apply ("aaaa" under merge (a,a) -> [aa, aa], NOT [aa, a, a]);
# banana-family words create pairs that survive several rounds; a null and
# an empty text pin null-safety.
PLANTED = [
    "aaaa aaa aa a banana bandana",
    "banana banana cabana",
    "aaaa abab abab baba",
    "na na na banana",
    "",
    None,
    "zq",  # a word contributing exactly one pair
]

# Exhaustion corpus: every word fully merges after 2 rounds; rounds 3..N
# must be no-ops on BOTH engines.
EXHAUST = ["ab ab ab cd cd", "ab cd", ""]


class TestPlantedSemantics:
    @pytest.mark.slow
    @pytest.mark.parametrize("docs", [PLANTED, EXHAUST], ids=["overlap", "exhaust"])
    def test_train_matches_python_reference(self, spark, tmp_path, docs):
        sf, con = plant(spark, tmp_path, docs)
        ref, _ = py_bpe(docs, _N_MERGES)
        got = [
            tuple(r)
            for r in SPECS["llm_bpe_train"].fn(spark, sf).orderBy("rnk").collect()
        ]
        assert got == ref
        duck = con.sql(SPECS["llm_bpe_train"].oracle).fetchall()
        assert sorted(duck) == ref
        if docs is EXHAUST:
            assert len(ref) < _N_MERGES  # the early-exhaustion path really ran

    @pytest.mark.parametrize("docs", [PLANTED, EXHAUST], ids=["overlap", "exhaust"])
    def test_encode_matches_python_reference(self, spark, tmp_path, docs):
        sf, con = plant(spark, tmp_path, docs)
        _, segs = py_bpe(docs, _N_MERGES)
        ref = py_encode(list(enumerate(docs)), segs)
        got = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["tok_checksum"])
            for r in SPECS["llm_bpe_encode"].fn(spark, sf).collect()
        }
        assert got == ref
        duck = {
            r[0]: (r[1], r[2], r[3])
            for r in con.sql(SPECS["llm_bpe_encode"].oracle).fetchall()
        }
        assert duck == ref

    def test_overlap_word_segmentation(self, spark, tmp_path):
        """'aaaa' must encode to 2 tokens once (a,a)->aa is learned — the
        direct witness that replace() implements non-overlapping greedy."""
        docs = ["aaaa aaaa aaaa aa"]
        sf, _ = plant(spark, tmp_path, docs)
        enc = SPECS["llm_bpe_encode"].fn(spark, sf).collect()[0]
        # merges: (a,a)->aa, then (aa,aa)->aaaa; tokens: [aaaa]x3 + [aa]
        assert enc["n_words"] == 4
        assert enc["n_bpe_tokens"] == 4


class TestProductionTraining:
    """r8 trainer restructure: one word-count aggregate + a driver-local
    merge loop (`bpe_merge_loop`) — constant Spark jobs for ANY merge
    count, one corpus FileScan, segmentation by broadcast merge apply."""

    def _rich_corpus(self):
        """625 distinct 4-char CV-syllable words with deterministic
        pseudo-zipf counts — enough pair diversity that 256 merges
        genuinely complete (the fixture's 31-word vocabulary exhausts at
        89)."""
        import itertools

        words = [
            "".join(t)
            for t in itertools.product("bcdfg", "aeiou", "klmnp", "aeiou")
        ]
        return [" ".join([w] * ((i * 37) % 11 + 1)) for i, w in enumerate(words)]

    def test_256_merges_complete_and_match_reference(self, spark, tmp_path):
        """N=256 merges actually trained (not just requested) on a rich
        vocabulary, equal to the independent naive reference — AND the
        artifact's per-word segmentations equal the reference's segs
        (pins bpe_segment_word's rank-order apply == round replay)."""
        from data_ingestion_experiment_otp_spark.operators import bpe

        docs = self._rich_corpus()
        sf, _ = plant(spark, tmp_path, docs)
        ref, ref_segs = py_bpe(docs, 256)
        assert len(ref) == 256, "corpus must not exhaust before round 256"
        got = [
            tuple(r)
            for r in SPECS["llm_bpe_train_scaled"].fn(spark, sf).orderBy("rnk").collect()
        ]
        assert got == ref
        d = bpe._bpe_artifact(spark, sf, n_merges=256)
        seg_rows = {
            r["w"]: r["seg"]
            for r in spark.read.schema("w string, n long, seg string")
            .parquet(f"{d}/word_segs.parquet")
            .collect()
        }
        expect = {
            w: "".join("\x1f" + s + "\x1f" for s in syms)
            for w, syms in ref_segs.items()
        }
        assert seg_rows == expect

    def test_fixture_parity_vs_python_reference_3sf(self, spark):
        """The scaled trainer equals the independent Python reference on
        the real fixture at all three SFs (the exhaustion path: 89 actual
        merges, rounds 90-256 must be no-ops)."""
        import duckdb

        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            sf_dir = f"/root/testdata/{sf}"
            texts = [
                r[0]
                for r in duckdb.sql(
                    f"SELECT text FROM '{sf_dir}/documents.parquet'"
                ).fetchall()
            ]
            ref, _ = py_bpe(texts, 256)
            got = [
                tuple(r)
                for r in SPECS["llm_bpe_train_scaled"]
                .fn(spark, sf_dir)
                .orderBy("rnk")
                .collect()
            ]
            assert got == ref, sf
            assert len(ref) < 256  # the no-op tail really ran

    def test_training_jobs_constant_in_merge_count(self, spark, sf_dir):
        """The job-count pin: training at N=12 and N=256 runs the SAME
        constant number of Spark jobs (checkpoint materialize + the
        TakeOrdered collect's scale-up — never one per merge), and the
        post-training segmentation plan reads the CHECKPOINT, not the
        corpus (zero FileScan: the corpus is scanned exactly once)."""
        from data_ingestion_experiment_otp_spark.operators import bpe

        sc = spark.sparkContext
        counts = {}
        for n in (12, 256):
            group = f"bpe-train-pin-{n}"
            sc.setJobGroup(group, "job-count pin")
            seg_df, _ = bpe._train(spark, sf_dir, n_merges=n)
            counts[n] = len(sc.statusTracker().getJobIdsForGroup(group))
            plan = seg_df._jdf.queryExecution().optimizedPlan().toString()
            assert "LogicalRDD" in plan or "ExistingRDD" in plan, plan
            assert "Relation" not in plan and "FileScan" not in plan, plan
        sc.setJobGroup("bpe-train-pin-done", "done")
        assert counts[12] == counts[256] <= 4, counts

    def test_truncation_knobs_bind(self, spark, tmp_path):
        """top_v / min_freq actually truncate the training table: training
        with top_v=3 equals the reference trained on ONLY the top-3 words
        by (count desc, word) — the documented driver-memory contract."""
        from data_ingestion_experiment_otp_spark.operators import bpe

        docs = ["banana banana banana cabana cabana bandana xyzzy"]
        sf, _ = plant(spark, tmp_path, docs)
        wc = collections.Counter(w for t in docs for w in t.split() if w)
        top3 = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        expect = bpe.bpe_merge_loop(top3, 8)
        # cross-check the incremental loop against the naive reference on
        # the same truncated table
        ref, _ = py_bpe([" ".join([w] * n) for w, n in top3], 8)
        assert expect == ref
        _, got = bpe._train(spark, sf, n_merges=8, top_v=3)
        assert got == expect
        # min_freq floor: words below the floor leave the table entirely
        _, got_freq = bpe._train(spark, sf, n_merges=8, min_freq=2)
        exp_freq = bpe.bpe_merge_loop(
            sorted(
                ((w, n) for w, n in wc.items() if n >= 2),
                key=lambda kv: (-kv[1], kv[0]),
            ),
            8,
        )
        assert got_freq == exp_freq

    def test_artifact_serves_without_retraining(self, spark, sf_dir):
        """Second artifact access = ZERO Spark jobs (train-once /
        serve-forever), and every serving entry reads the same committed
        generation."""
        from data_ingestion_experiment_otp_spark.operators import bpe

        sc = spark.sparkContext
        d1 = bpe._bpe_artifact(spark, sf_dir)  # may build
        sc.setJobGroup("bpe-artifact-reuse", "reuse pin")
        d2 = bpe._bpe_artifact(spark, sf_dir)
        n_jobs = len(sc.statusTracker().getJobIdsForGroup("bpe-artifact-reuse"))
        sc.setJobGroup("bpe-artifact-reuse-done", "done")
        assert d1 == d2
        assert n_jobs == 0
        import os

        for store in ("merges.parquet", "word_segs.parquet", "vocab.parquet"):
            assert os.path.isdir(os.path.join(d1, store)), store
        assert os.path.isfile(os.path.join(d1, "_COMMITTED"))


class TestFixtureInvariants:
    def test_pack_conservation_and_reconstruction(self, spark, sf_dir):
        """The pack manifest must be EXACTLY reconstructible from the
        encode output: same greedy rule, nothing dropped or duplicated."""
        enc = {
            r["doc_id"]: (r["n_bpe_tokens"], r["tok_checksum"])
            for r in SPECS["llm_bpe_encode"].fn(spark, sf_dir).collect()
        }
        packs = collections.defaultdict(lambda: [0, 0, 0])
        cum = collections.Counter()
        for did in sorted(enc):
            nt, ck = enc[did]
            sh = did % _BPE_SHARDS
            pid = cum[sh] // _BPE_PACK_CAP
            cum[sh] += nt
            p = packs[(sh, pid)]
            p[0] += 1
            p[1] += nt
            p[2] += ck
        got = {
            (r["shard"], r["pack_id"]): [r["n_docs"], r["n_tokens"], r["checksum"]]
            for r in SPECS["pipeline_tokenize_pack"].fn(spark, sf_dir).collect()
        }
        assert got == dict(packs)
        assert sum(v[1] for v in got.values()) == sum(nt for nt, _ in enc.values())

    def test_encode_bounds(self, spark, sf_dir):
        """Each word is 1..len(word) tokens: n_words <= n_bpe_tokens <=
        total word chars; compression actually happened on the fixture."""
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        chars = d.select(
            "doc_id",
            F.aggregate(
                F.transform(
                    F.filter(F.split("text", " "), lambda w: w != ""),
                    F.length,
                ),
                F.lit(0),
                lambda a, x: a + x,
            ).alias("wchars"),
        )
        enc = SPECS["llm_bpe_encode"].fn(spark, sf_dir)
        j = enc.join(chars, "doc_id").collect()
        assert j
        assert all(r["n_words"] <= r["n_bpe_tokens"] <= r["wchars"] for r in j)
        # 12 merges over the 31-word fixture vocabulary must compress
        assert sum(r["n_bpe_tokens"] for r in j) < sum(r["wchars"] for r in j)


class TestDecode:
    def test_decode_lossless_on_fixture(self, spark, sf_dir):
        """Round-trip: decoding every document's token ids through the
        learned vocabulary must reproduce its space-normalized words
        byte-for-byte — lossless=true everywhere, and the decoded length
        equals the independently computed normalized length."""
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        norm_len = d.select(
            "doc_id",
            F.length(
                F.array_join(
                    F.filter(F.split("text", " "), lambda w: w != ""), " "
                )
            ).cast("long").alias("nl"),
        )
        dec = SPECS["llm_bpe_decode"].fn(spark, sf_dir)
        rows = dec.join(norm_len, "doc_id").collect()
        assert rows
        assert all(r["lossless"] for r in rows), [
            r["doc_id"] for r in rows if not r["lossless"]
        ][:5]
        assert all(r["dec_n_chars"] == r["nl"] for r in rows)

    @pytest.mark.slow
    def test_decode_planted_sha_matches_reference(self, spark, tmp_path):
        """The decoded text's sha256 must equal the sha of the original
        normalized words — computed OUTSIDE both engines — on the planted
        corpora (incl. the overlapping-merge one, where decode has to
        invert multi-char symbols)."""
        import hashlib

        for di, docs in enumerate((PLANTED, EXHAUST)):
            sf, con = plant(spark, tmp_path / f"d{di}", docs)
            expect = {
                i: hashlib.sha256(
                    " ".join(w for w in (t or "").split(" ") if w).encode()
                ).hexdigest()
                for i, t in enumerate(docs)
                if any(w for w in (t or "").split(" "))
            }
            got = {
                r["doc_id"]: r["dec_sha"]
                for r in SPECS["llm_bpe_decode"].fn(spark, sf).collect()
            }
            assert got == expect
            duck = {
                r[0]: r[3]
                for r in con.sql(SPECS["llm_bpe_decode"].oracle).fetchall()
            }
            assert duck == expect


class TestVocab:
    def test_vocab_occurrences_conserve_token_stream(self, spark, sf_dir):
        """Σ vocab n_occ == Σ per-doc n_bpe_tokens (every emitted token is
        exactly one vocabulary instance), ids are dense 1..|V|, symbols
        reassemble the corpus words."""
        voc = SPECS["llm_bpe_vocab"].fn(spark, sf_dir).collect()
        enc = SPECS["llm_bpe_encode"].fn(spark, sf_dir).collect()
        assert sum(r["n_occ"] for r in voc) == sum(r["n_bpe_tokens"] for r in enc)
        ids = sorted(r["tok_id"] for r in voc)
        assert ids == list(range(1, len(ids) + 1))
        assert len({r["sym"] for r in voc}) == len(voc)


class TestFertility:
    def test_fertility_bounds_and_reconciles_with_encode(self, spark, sf_dir):
        """Per-language fertility is >= 1 (every word is at least one BPE
        token) and the per-lang sums reconcile exactly with the per-doc
        encode stats they aggregate."""
        fert = SPECS["llm_tokenizer_fertility"].fn(spark, sf_dir).collect()
        enc = SPECS["llm_bpe_encode"].fn(spark, sf_dir).collect()
        assert fert, "fixture corpus must produce at least one language row"
        for r in fert:
            assert r["fertility"] >= 1.0, r
            assert r["chars_per_token"] > 0, r
        assert sum(r["n_words"] for r in fert) == sum(r["n_words"] for r in enc)
        assert sum(r["n_bpe_tokens"] for r in fert) == sum(
            r["n_bpe_tokens"] for r in enc
        )


class TestArtifactStoreHygiene:
    """ADVICE r10 store hardening: POSIX-gated permission repair with a
    once-per-root warning (`_store_root`), torn-signature builds routed
    to a process-private root (`_build_root` — never-reusable keys must
    not grow the shared store), and crashed builders' leaked
    `<key>.build<pid>` temp dirs swept by age (`_sweep_stale_builds`)."""

    def _isolated(self, monkeypatch, tmp_path):
        import tempfile

        from data_ingestion_experiment_otp_spark.operators import bpe

        monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
        monkeypatch.setattr(bpe, "_PROCESS_ROOTS", {})
        monkeypatch.setattr(bpe, "_WARNED_ROOTS", set())
        return bpe

    def test_loose_mode_bits_are_repaired_not_abandoned(
        self, monkeypatch, tmp_path
    ):
        """A root we own that merely lost its 0o700 bits is chmod'ed back
        and SERVED from — caching must not silently degrade to
        train-per-process over a repairable state."""
        import os
        import warnings

        bpe = self._isolated(monkeypatch, tmp_path)
        if not hasattr(os, "getuid"):
            import pytest

            pytest.skip("POSIX-only scenario")
        first = bpe._store_root("hygiene_store")
        os.chmod(first, 0o755)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any warning fails the test
            again = bpe._store_root("hygiene_store")
        assert again == first
        assert (os.lstat(first).st_mode & 0o077) == 0

    def test_irreparable_root_warns_once_and_falls_back(
        self, monkeypatch, tmp_path
    ):
        import os
        import warnings

        bpe = self._isolated(monkeypatch, tmp_path)
        probe = bpe._store_root("hygiene_bad")  # compute the path shape
        os.rmdir(probe)
        real = tmp_path / "elsewhere"
        real.mkdir()
        os.symlink(real, probe)  # symlinked root: never trusted
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            fb1 = bpe._store_root("hygiene_bad")
            fb2 = bpe._store_root("hygiene_bad")
        assert fb1 == fb2 and fb1 != probe  # stable process-private root
        runtime = [x for x in w if issubclass(x.category, RuntimeWarning)]
        assert len(runtime) == 1  # once per root, not once per call

    def test_build_root_routes_torn_signatures_private(
        self, monkeypatch, tmp_path
    ):
        import os

        bpe = self._isolated(monkeypatch, tmp_path)
        monkeypatch.setattr(bpe, "_TORN_ROOTS", {})
        shared = bpe._store_root("hygiene_torn")
        assert bpe._build_root("hygiene_torn", "abc:123") == shared
        torn = bpe._build_root("hygiene_torn", "torn:part-0.parquet:99")
        assert torn != shared
        assert not torn.startswith(shared + os.sep)
        assert os.path.isdir(torn)
        # bounded relocation (review r11): the NEXT torn build for the
        # same store deletes the previous generation — at most one torn
        # artifact per store per process, never one per call
        open(os.path.join(torn, "model.bin"), "w").close()
        torn2 = bpe._build_root("hygiene_torn", "torn:part-0.parquet:100")
        assert torn2 != torn
        assert not os.path.exists(torn)  # previous torn generation swept
        # other stores' torn roots are independent
        other = bpe._build_root("hygiene_other", "torn:p:1")
        assert os.path.isdir(torn2) and os.path.isdir(other)

    def test_stale_builds_swept_fresh_and_foreign_kept(
        self, monkeypatch, tmp_path
    ):
        import os
        import time

        bpe = self._isolated(monkeypatch, tmp_path)
        root = bpe._store_root("hygiene_sweep")
        stale = os.path.join(root, "aaaa.build12345")
        fresh = os.path.join(root, "bbbb.build67890")
        committed = os.path.join(root, "cccc")
        for d in (stale, fresh, committed):
            os.makedirs(d)
            open(os.path.join(d, "x"), "w").close()
        old = time.time() - 7200
        os.utime(stale, (old, old))
        os.utime(os.path.join(stale, "x"), (old, old))  # recursive check
        bpe._sweep_stale_builds(root)
        assert not os.path.exists(stale)  # crashed builder's leak: gone
        assert os.path.isdir(fresh)  # possibly-live build: kept
        assert os.path.isdir(committed)  # committed generations: untouched
        # a deep-write-active build is live even when its TOP dir went
        # stale (parquet jobs write under <table>.parquet/_temporary/...
        # without touching the top mtime — review r11)
        deep = os.path.join(root, "dddd.build111")
        os.makedirs(os.path.join(deep, "t.parquet", "_temporary"))
        open(os.path.join(deep, "t.parquet", "_temporary", "part"), "w").close()
        os.utime(deep, (old, old))
        os.utime(os.path.join(deep, "t.parquet"), (old, old))
        bpe._sweep_stale_builds(root)
        assert os.path.isdir(deep)  # fresh deep write keeps it alive

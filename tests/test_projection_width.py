"""Production-width vector-tier proof (VERDICT r11 "what's missing" #1).

Every vector operator had only ever executed at d=64 over the isotropic
uniform fixture, whose measured recall floors (0.40 at the PCA rerank) are
the fixture's information-theoretic bound — the tier's central claim
(projection.py:5-11: production models emit 1-4k dims where a low-rank
subspace carries the usable geometry) rested on an argument, not a pin.

This module generates a planted LOW-RANK CLUSTERED corpus at d=1024 — a
random rank-16 basis, 60 cluster centers in the latent space, per-vector
within-cluster noise + small ambient noise: the structure real embedding
corpora have (clusters are what SemDeDup exploits; low intrinsic dimension
is what the reduction tier exists for) — and drives the REAL registered
operators over it:

    raw 1024-dim corpus
      |- llm_sim_topk                exact ground truth at width
      |- rp_project(k=64)            1024 -> 64 (data-oblivious, zero
      |                              driver state, one scan)
           |- llm_embed_pca          trains at 64: driver receives
           |                         d(d+1)/2 + d + 1 = 2,146 scalars
           |- llm_sim_topk_pca       16-dim trained subspace stage 1 +
           |                         exact rerank -> recall vs the
           |                         1024-dim exact truth
           |- llm_sim_ivfpq,         the ANN / semantic-dedup consumers
              llm_semdedup           execute at width end to end

The chain measures the FULL distortion stack (grid quantization + JL +
eigensolve subspace + candidate pool) against exact brute force at the
original width, so the recall floor here is the method's, not a replay.

This suite is also the regression gate for the r12 sign-family fix: the
r11 two-Lehmer-steps-over-the-flat-index derivation composed to ONE linear
map (h = flat*C mod M), whose LCG lattice correlated sign columns up to
0.96 and cost ~2.5x the iid JL distortion. The isotropic d=64 fixture's
loose JL bound absorbed that silently; the planted d=1024 corpus exposed
it (chain recall 0.23). The squared-Lehmer family restores iid-level
distortion (mean |dcos| 0.102 vs 0.094 iid); the pins below fail on any
return of a linear family.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from data_ingestion_experiment_otp_spark.operators.projection import (
    _EMB_GRID,
    _clean_vectors,
    _pca_moments,
    _sign_py,
    llm_sim_topk_pca,
    pca_train,
    rp_project,
)
from data_ingestion_experiment_otp_spark.operators.similarity import (
    llm_sim_topk,
    load_vectors,
)

N, D, RANK, CLUSTERS = 1200, 1024, 16, 60
RP_K = 64


def _planted() -> np.ndarray:
    """The planted corpus: rank-16 latent space, 60 clusters, within-
    cluster noise 0.25, ambient noise 0.02 — fixed seed, so every test
    (and the independent numpy references) sees the same matrix."""
    rng = np.random.default_rng(7)
    basis = rng.normal(size=(RANK, D)) / np.sqrt(RANK)
    centers = rng.normal(size=(CLUSTERS, RANK))
    assign = rng.integers(0, CLUSTERS, size=N)
    latent = centers[assign] + 0.25 * rng.normal(size=(N, RANK))
    return (latent @ basis + 0.02 * rng.normal(size=(N, D))).astype(np.float32)


@pytest.fixture(scope="module")
def width_dirs(tmp_path_factory, spark):
    """(raw_dir, red_dir): the 1024-dim planted corpus as a loadable
    embeddings table, and its rp_project(k=64) reduction materialized as
    a second corpus — the chain's persisted intermediate (at scale this
    is the projected table the docstring says you materialize once)."""
    X = _planted()
    raw = str(tmp_path_factory.mktemp("width_raw"))
    t = pa.table(
        {
            "vec_id": pa.array(range(N), pa.int64()),
            "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float32())),
        }
    )
    pq.write_table(t, os.path.join(raw, "embeddings.parquet"))

    red = str(tmp_path_factory.mktemp("width_red"))
    out = rp_project(_clean_vectors(load_vectors(spark, raw)), k=RP_K)
    arr = (
        out.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("component", "proj"))).alias("s"))
        .select(
            "vec_id",
            F.expr("transform(s, t -> CAST(t.proj AS FLOAT))").alias("embedding"),
        )
    )
    arr.coalesce(1).write.parquet(os.path.join(red, "embeddings.parquet"))
    return raw, red


def _topk_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    return out


class TestRpAtWidth:
    def test_rp_matches_independent_reference_at_width(self, spark, width_dirs):
        """rp_project at (d=1024, k=64) replays an independent numpy
        re-statement (own quantization, own sign chain via the spelled-
        out constants, own scale) exactly on the round-6 grid — the
        arithmetic hash gate's coverage extended to production width."""
        raw, _ = width_dirs
        X = _planted()[:40].astype(np.float64)
        Q = np.floor(np.abs(X) * _EMB_GRID + 0.5) * np.sign(X)
        S = np.array(
            [[_sign_py(i, j) for j in range(RP_K)] for i in range(D)],
            dtype=np.float64,
        )
        scale = (3.0 / RP_K) ** 0.5 / _EMB_GRID
        expect = np.round(Q @ S * scale, 6)
        got = (
            rp_project(_clean_vectors(load_vectors(spark, raw)), k=RP_K)
            .filter(F.col("vec_id") < 40)
            .collect()
        )
        assert len(got) == 40 * RP_K
        for r in got:
            assert r["proj"] == pytest.approx(
                expect[r["vec_id"], r["component"]], abs=0
            ), (r["vec_id"], r["component"])

    def test_blas_and_codegen_kernels_agree(self, spark, width_dirs):
        """One arithmetic, two physical strategies: the whole-stage
        zip_with dot (fixture widths) and the Arrow BLAS matmul
        (production widths — the zip_with lambda costs d x k virtual
        calls per row, measured 13.3 s for 1,200 rows at (1024, 64))
        must emit identical round-6 values."""
        raw, _ = width_dirs
        v = _clean_vectors(load_vectors(spark, raw)).filter(F.col("vec_id") < 30)
        a = {
            (r["vec_id"], r["component"]): r["proj"]
            for r in rp_project(v, k=16, impl="codegen").collect()
        }
        b = {
            (r["vec_id"], r["component"]): r["proj"]
            for r in rp_project(v, k=16, impl="blas").collect()
        }
        assert len(a) == 30 * 16
        assert a == b

    def test_jl_distortion_at_width_is_iid_level(self):
        """Pairwise cosine distortion of the shipped sign family at
        (1024, 64) on the planted corpus: mean |dcos| <= 0.15 (measured
        0.102; an iid Achlioptas matrix measures 0.094 on the same data;
        the r11 linear family measured 0.223). Also pins the lattice
        symptom directly: max |column correlation| of the sign matrix
        <= 0.5 (measured 0.31; the linear family hit 0.96)."""
        X = _planted()[:200].astype(np.float64)
        S = np.array(
            [[_sign_py(i, j) for j in range(RP_K)] for i in range(D)],
            dtype=np.float64,
        )
        Y = X @ S

        def cosm(M):
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            return Mn @ Mn.T

        err = np.abs(cosm(X) - cosm(Y))
        assert float(err.mean()) <= 0.15
        cc = np.corrcoef(S.T)
        np.fill_diagonal(cc, 0.0)
        assert float(np.abs(cc).max()) <= 0.5


class TestChainAtWidth:
    def test_chain_recall_beats_the_isotropic_floor(self, spark, width_dirs):
        """The full chain (grid quantization -> RP 1024->64 -> trained
        16-dim PCA subspace stage 1 -> exact rerank in the reduced
        space) against exact brute-force top-5 at the ORIGINAL width:
        mean recall@5 >= 0.55 (measured 0.71). The isotropic d=64
        fixture's floor for the same rerank is 0.40 — the planted
        low-rank structure is what the tier's claim is about, and this
        pin is the measured form of that claim."""
        raw, red = width_dirs
        truth = _topk_sets(llm_sim_topk(spark, raw).collect())
        assert truth  # 12 queries under the vec_id % 100 contract
        got = _topk_sets(llm_sim_topk_pca(spark, red).collect())
        recalls = [
            len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
        ]
        mean_recall = float(np.mean(recalls))
        assert mean_recall >= 0.55, recalls
        assert mean_recall > 0.45  # strictly above the isotropic bound

    def test_pca_at_width_driver_state_and_variance(self, spark, width_dirs):
        """The reduced corpus trains PCA at d=64: (a) the driver receives
        exactly d(d+1)/2 + d + 1 = 2,145 scalars (~17 KB) — the moments
        bound that makes the RP-first ladder the 100 TB route (training
        at the raw 1024 width would be 525,825 scalars; the docstring
        prescribes reducing first, and this measures why); (b) the
        planted rank-16 structure shows up in the spectrum: the top-16
        eigenvalues carry >= 0.95 of total variance (measured 0.9999)."""
        _, red = width_dirs
        v = _clean_vectors(load_vectors(spark, red))
        n, s, G = _pca_moments(v)
        assert n == N
        assert len(s) == RP_K and G.shape == (RP_K, RP_K)
        scalars = RP_K * (RP_K + 1) // 2 + RP_K + 1
        assert scalars == 2145
        _, _, _, eig = pca_train(v, r=RP_K)
        share = float(np.sum(eig[:RANK]) / np.sum(eig))
        assert share >= 0.95

    def test_ann_and_semdedup_consume_the_reduced_corpus(self, spark, width_dirs):
        """The downstream consumers the reduction tier exists for run end
        to end on the materialized 64-dim corpus: IVF-PQ trains, encodes,
        and answers the shared query contract; SemDeDup trains its
        hierarchy and emits a keep/drop verdict per vector."""
        from data_ingestion_experiment_otp_spark.plans.registry import all_queries

        q = all_queries()
        _, red = width_dirs
        ivf = q["llm_sim_ivfpq"].fn(spark, red).collect()
        assert len(ivf) > 0
        assert {int(r["query_id"]) for r in ivf} <= set(range(0, N, 100))
        sem = q["llm_semdedup"].fn(spark, red)
        rows = sem.collect()
        assert len(rows) == N  # one verdict per vector
        kept = sum(1 for r in rows if r["kept"])
        assert 0 < kept <= N

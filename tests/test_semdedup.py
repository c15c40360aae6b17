"""Planted-geometry pins for llm_semdedup (SemDeDup, Abbas et al. 2023):
the registered query's oracle hash-gates the fixture path; these pin the
keep-priority semantics on a corpus with KNOWN cluster/near-dup structure.

Centroids are the first 8 embeddings by vec_id (clustering.py::_centroids),
so the planted corpus ships ids 0-7 as an orthogonal basis e0..e7 — each
centroid row is itself a corpus member with centroid-sim 1.0, which makes
it the FIRST member to drop when a near-dup neighbor exists (the paper
keeps the cluster-edge example, not the typical one).
"""

from __future__ import annotations

import os

from data_ingestion_experiment_otp_spark.operators.clustering import llm_semdedup


def _basis(i, scale=1.0, dim=8):
    v = [0.0] * dim
    v[i] = scale
    return v


def _mix(pairs, dim=8):
    v = [0.0] * dim
    for i, s in pairs:
        v[i] = s
    return v


def _run(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = os.path.join(str(tmp_path), "fixture")
    df.coalesce(1).write.parquet(os.path.join(d, "embeddings.parquet"))
    out = llm_semdedup(spark, d)
    return {r["vec_id"]: r.asDict() for r in out.collect()}


class TestSemDeDup:
    def test_keep_priority_and_clusters(self, spark, tmp_path):
        rows = [(i, _basis(i), 0) for i in range(8)]  # centroids e0..e7
        rows += [
            (10, _mix([(0, 0.9), (1, 0.1)]), 0),  # near e0
            (11, _mix([(0, 0.9), (1, 0.1)]), 0),  # exact dup of 10
            (20, _mix([(1, 0.9), (2, 0.2)]), 0),  # near e1
            (30, [0.0] * 8, 0),  # zero-norm: NULL sim, always kept
            (40, _mix([(0, 0.1), (2, 0.99)]), 0),  # near e2
        ]
        got = _run(spark, tmp_path, rows)

        # Cluster assignment: nearest centroid; zero-norm ties to cid 0.
        assert got[10]["cluster_id"] == 0 and got[11]["cluster_id"] == 0
        assert got[20]["cluster_id"] == 1
        assert got[30]["cluster_id"] == 0 and got[30]["sim"] is None
        assert got[40]["cluster_id"] == 2

        # In cluster 0 the near-dup chain is {0, 10, 11} (all pairwise
        # cosine >= tau): the member FARTHEST from the centroid wins, ties
        # to the lower id -> 10 kept, 11 (tie, higher id) and 0 (the
        # centroid row itself, sim 1.0) dropped.
        kept = {vid for vid, r in got.items() if r["kept"]}
        assert kept == {3, 4, 5, 6, 7, 10, 20, 30, 40}

    def test_exactly_one_survivor_per_dup_group(self, spark, tmp_path):
        """Three identical vectors in one cluster: exactly one survives,
        and it is the lowest id among the tied members."""
        rows = [(i, _basis(i), 0) for i in range(8)]
        dup = _mix([(3, 0.8), (4, 0.2)])
        rows += [(50, dup, 0), (51, dup, 0), (52, dup, 0)]
        got = _run(spark, tmp_path, rows)
        survivors = [v for v in (50, 51, 52) if got[v]["kept"]]
        assert survivors == [50]
        assert not got[3]["kept"]  # centroid row is in the same chain

    def test_cross_cluster_dups_are_invisible(self, spark, tmp_path):
        """Two near-identical vectors landing in DIFFERENT clusters both
        survive — the documented SemDeDup blindness that buys the
        sub-quadratic cost."""
        rows = [(i, _basis(i), 0) for i in range(8)]
        # 60 leans e5, 61 leans e6; cosine(60, 61) = 0.98 but clusters
        # differ, so neither sees the other.
        rows += [
            (60, _mix([(5, 1.0), (6, 0.9)]), 0),
            (61, _mix([(5, 0.9), (6, 1.0)]), 0),
        ]
        got = _run(spark, tmp_path, rows)
        assert got[60]["cluster_id"] == 5 and got[61]["cluster_id"] == 6
        assert got[60]["kept"] and got[61]["kept"]
        # their centroid rows drop instead (each pairs with its member)
        assert not got[5]["kept"] and not got[6]["kept"]

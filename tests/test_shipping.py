"""Worker-shipping contract (shipping.py): kernels that cross to Spark's
Python workers must serialize BY VALUE, because the grading driver imports
`__spark_entry__` with the repo on ITS sys.path only — the workers inherit
neither that sys.path nor (necessarily) its cwd, so a kernel pickled as a
module reference dies worker-side with ModuleNotFoundError. Found live
twice in r4 (pipeline_semantic_curation's doc_signals, the push
DataSource's _row) by driving the registry from a foreign cwd."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

from data_ingestion_experiment_otp_spark.shipping import ship_by_value

PKG = "data_ingestion_experiment_otp_spark"


class TestShipByValue:
    def test_copy_computes_identically(self):
        from data_ingestion_experiment_otp_spark.operators.clustering import doc_signals

        shipped = ship_by_value(doc_signals)
        for text in (None, "", "a", "a a a a", "the cat sat on the mat the cat sat"):
            assert shipped(text) == doc_signals(text)

    def test_payload_loads_without_package_on_path(self, tmp_path):
        """The real contract: a process that CANNOT import this package
        (a Spark Python worker under a vanilla driver) must still be able
        to unpickle and call the shipped kernel — while the raw
        module-level function must fail there, proving the test can tell
        the difference."""
        from pyspark import cloudpickle

        from data_ingestion_experiment_otp_spark.operators.clustering import doc_signals
        from data_ingestion_experiment_otp_spark.sources.pushsource import _row

        # raw function pickles as a tiny module reference...
        assert PKG.encode() in cloudpickle.dumps(doc_signals)

        (tmp_path / "shipped.bin").write_bytes(
            cloudpickle.dumps((ship_by_value(doc_signals), ship_by_value(_row)))
        )
        (tmp_path / "byref.bin").write_bytes(cloudpickle.dumps(doc_signals))
        script = textwrap.dedent(
            """
            import pickle, sys
            assert not any("repo" in p for p in sys.path if p), sys.path
            sig, row = pickle.loads(open(sys.argv[1], "rb").read())
            assert sig("a a b") == (3, 0.333333, 0.0, 0.0), sig("a a b")
            assert row(7)[3] is True and row(8)[3] is False
            try:
                pickle.loads(open(sys.argv[2], "rb").read())
            except ModuleNotFoundError:
                print("SHIP_OK")
            else:
                print("BYREF_UNEXPECTEDLY_LOADED")
            """
        )
        p = subprocess.run(
            [sys.executable, "-c", script, str(tmp_path / "shipped.bin"), str(tmp_path / "byref.bin")],
            cwd=str(tmp_path),
            capture_output=True,
            text=True,
            timeout=120,
            env={
                k: v
                for k, v in __import__("os").environ.items()
                if k not in ("PYTHONPATH",)
            },
        )
        assert "SHIP_OK" in p.stdout, (p.stdout, p.stderr[-2000:])

    def test_rejects_kernels_that_reference_module_functions(self):
        def helper():
            return 1

        glob = {"helper": helper, "__builtins__": __builtins__}
        exec("def kernel():\n    return helper()", glob)
        with pytest.raises(TypeError, match="self-contained"):
            ship_by_value(glob["kernel"])

    def test_carries_scalar_globals(self):
        glob = {"K": 7, "__builtins__": __builtins__}
        exec("def kernel(x):\n    return x + K", glob)
        assert ship_by_value(glob["kernel"])(1) == 8


class TestForeignCwdDrive:
    def test_worker_crossing_queries_run_without_package_on_worker_path(
        self, tmp_path, sf_dir
    ):
        """End-to-end regression: a FRESH vanilla session, cwd somewhere
        the package is NOT importable from, drives the two query families
        that shipped kernels by reference before r4. The repo reaches the
        driver via sys.path injection only — exactly the grading driver's
        setup."""
        script = textwrap.dedent(
            f"""
            import sys
            sys.path.insert(0, "/root/repo")
            from pyspark.sql import SparkSession
            spark = SparkSession.builder.master("local[4]").getOrCreate()
            from {PKG}.plans.registry import all_queries
            specs = all_queries()
            for name in ("pipeline_semantic_curation", "src_push_datasource"):
                n = specs[name].fn(spark, {repr("/root/testdata/sf0.001")}).count()
                assert n > 0, name
            print("FOREIGN_CWD_OK")
            """
        )
        p = subprocess.run(
            [sys.executable, "-c", script],
            cwd=str(tmp_path),  # package not importable from here
            capture_output=True,
            text=True,
            timeout=300,
            env={
                k: v
                for k, v in __import__("os").environ.items()
                if k not in ("PYTHONPATH",)
            },
        )
        assert "FOREIGN_CWD_OK" in p.stdout, p.stderr[-3000:]

"""Empty-input robustness: every registered query must PLAN and EXECUTE
against a zero-row corpus without throwing — the day-one state of any new
deployment, and the per-partition state of any filtered branch at scale.
Operators may return zero rows (most should); they may not crash.

The empty fixture mirrors the real testdata's schemas exactly (read from
the sf0.001 parquet footers), so this is the same code path with n=0.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_ingestion_experiment_otp_spark.plans.registry import all_queries
from data_ingestion_experiment_otp_spark.sources.catalog import TABLES

SPECS = all_queries()

# Queries whose CONTRACT requires data and which document that contract —
# everything else must tolerate empty input.
_REQUIRES_DATA: dict[str, str] = {
    "src_point_lookup_latest": "point lookup of the max-ts row: empty corpus has no latest row to return",
}


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(os.path.join(sf_dir, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), os.path.join(d, f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_runs_on_empty_corpus(spark, empty_sf_dir, name):
    if name in _REQUIRES_DATA:
        pytest.skip(_REQUIRES_DATA[name])
    df = SPECS[name].fn(spark, empty_sf_dir)
    df.count()  # full execution, not just planning

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
    # noop write, not count(): count() lets Catalyst prune projections,
    # leaving per-column expressions unevaluated (found live: a
    # divide-by-zero that only count() missed)
    df.write.format("noop").mode("overwrite").save()


@pytest.fixture(scope="session")
def degenerate_sf_dir(tmp_path_factory, sf_dir):
    """Pathological corpus: every table a handful of rows with CONSTANT
    keys, empty text, zero vectors, tied timestamps — the worst case for
    divisions (zero token counts, zero norms, zero variance), windows
    (total ties), and join fan-out (every row matches every row)."""
    d = tmp_path_factory.mktemp("degen_sf")
    for t in TABLES:
        schema = pq.read_schema(os.path.join(sf_dir, f"{t}.parquet"))
        n = 4
        cols = []
        for f in schema:
            typ = f.type
            if pa.types.is_integer(typ):
                arr = pa.array([1] * n, type=typ)
            elif pa.types.is_floating(typ):
                arr = pa.array([0.0] * n, type=typ)
            elif pa.types.is_timestamp(typ):
                arr = pa.array([1_700_000_000_000_000] * n, type=typ)
            elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
                arr = pa.array([""] * n, type=typ)
            elif pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
                arr = pa.array([b""] * n, type=typ)
            elif pa.types.is_list(typ) or pa.types.is_large_list(typ):
                arr = pa.array([[0.0] * 64] * n, type=typ)
            elif pa.types.is_boolean(typ):
                arr = pa.array([False] * n, type=typ)
            else:
                arr = pa.nulls(n, type=typ)
            cols.append(arr)
        pq.write_table(pa.table(cols, schema=schema), os.path.join(d, f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_runs_on_degenerate_corpus(spark, degenerate_sf_dir, name):
    # no exemption list on purpose: every registered query, including the
    # guarded O(n²) tiers, must fully execute at degenerate n=4 scale
    df = SPECS[name].fn(spark, degenerate_sf_dir)
    df.write.format("noop").mode("overwrite").save()


@pytest.fixture(scope="session")
def nullish_sf_dir(tmp_path_factory, sf_dir):
    """Dirty-data corpus: key/id columns valid and distinct, every other
    nullable column NULL — the shape of a half-broken upstream delivery.
    Operators must either process or skip null payloads; never crash."""
    d = tmp_path_factory.mktemp("null_sf")
    for t in TABLES:
        schema = pq.read_schema(os.path.join(sf_dir, f"{t}.parquet"))
        n = 4
        cols = []
        for i, f in enumerate(schema):
            typ = f.type
            is_key = f.name.endswith(("key", "_id", "Id")) or f.name in ("event_id",)
            if is_key and pa.types.is_integer(typ):
                cols.append(pa.array(list(range(1, n + 1)), type=typ))
            elif pa.types.is_timestamp(typ):
                # event time non-null: null event time is rejected at the
                # edge by any real pipeline (watermarks are undefined on it)
                cols.append(
                    pa.array([1_700_000_000_000_000 + k for k in range(n)], type=typ)
                )
            else:
                cols.append(pa.nulls(n, type=typ))
        pq.write_table(pa.table(cols, schema=schema), os.path.join(d, f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_runs_on_nullish_corpus(spark, nullish_sf_dir, name):
    df = SPECS[name].fn(spark, nullish_sf_dir)
    df.write.format("noop").mode("overwrite").save()

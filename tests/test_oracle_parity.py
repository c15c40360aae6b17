"""Oracle parity: run every registered query on Spark AND its DuckDB oracle
SQL, compare row count, column names, and an order-insensitive value
multiset — the same gate the driver applies at sf0.01 (run here at sf0.001
for speed; set SPARK_GRAFT_TEST_SF to widen).
"""

from __future__ import annotations

import math

import pytest

from data_ingestion_experiment_otp_spark.plans.registry import all_queries

SPECS = all_queries()
# Multi-minute DuckDB oracle replays (the 12-round recursive-CTE BPE
# trainer runs ~28 s single-threaded) ride the `slow` marker so the
# default gate stays inside the driver's pytest budget (r14); the full
# run (-m "slow or not slow") and the close protocol still execute them.
_SLOW_ORACLES = {"llm_bpe_train_scaled"}
ORACLE_NAMES = [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ORACLES else n
    for n, s in SPECS.items()
    if s.oracle is not None
]
ROWS_ONLY_NAMES = [n for n, s in SPECS.items() if s.oracle is None]


def _canon(value):
    """Canonicalize a cell for order-insensitive multiset comparison."""
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # Queries already round; this guards representation-level noise only.
        return round(value, 9)
    if isinstance(value, (list, tuple)):
        return tuple(_canon(v) for v in value)
    return value


def _multiset(rows):
    from collections import Counter

    return Counter(tuple(_canon(v) for v in row) for row in rows)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_matches_oracle(spark, duck, sf_dir, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(row) for row in sdf.collect()]

    rel = duck.sql(spec.oracle)
    duck_cols = [c.lower() for c in rel.columns]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    # Reorder both to sorted column order for value comparison.
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_rows = [tuple(r[i] for i in s_idx) for r in spark_rows]
    d_rows = [tuple(r[i] for i in d_idx) for r in duck_rows]

    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} != {len(d_rows)}"
    sm, dm = _multiset(s_rows), _multiset(d_rows)
    if sm != dm:
        only_s = list((sm - dm).items())[:5]
        only_d = list((dm - sm).items())[:5]
        pytest.fail(f"{name}: value mismatch. only-spark={only_s} only-duck={only_d}")


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    """Non-SQL-expressible ops must at least run and produce a stable schema."""
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    rows = sdf.collect()
    assert sdf.columns, name
    assert rows is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # Contract: every queries() key with an oracle also appears in oracle_sql.
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 40

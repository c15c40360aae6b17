"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over `data_ingestion_experiment_otp_spark`:
- `entry(spark)` — flagship ingestion pipeline at sf0.001 (smoke: rows>0).
- `queries()` — one callable per implemented operator from SURVEY.md §2,
  keyed by the §2 inventory id.
- `oracle_sql()` — matching DuckDB SQL per query (omitted for the
  genuinely non-SQL-expressible ops: LSH/MinHash/SimHash/HLL/mapInPandas,
  which get rows-only checks plus pytest invariants in tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_experiment_otp_spark.plans import flagship, registry
from data_ingestion_experiment_otp_spark.session import configure


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure(spark)
    return flagship.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        run.__name__ = fn.__name__
        return run

    return {name: wrap(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return registry.oracle_sql()

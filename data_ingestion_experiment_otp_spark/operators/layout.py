"""Z-order data layout (engine addition, SURVEY.md §2.1 sink family).

Multi-dimensional file clustering for scan pruning: min-max scale two sort
keys to a common 8-bit grid, interleave their bits into one Morton code,
range-partition + sort the write on it, and every output file gets a TIGHT
min/max envelope on BOTH dimensions — parquet row-group statistics then let
any engine skip most files for a point or range predicate on EITHER column.
A single-column sort gives this for one dimension only; at 100 TB the
layout pass is one extra range-exchange at write time and pays for itself
on the first multi-predicate scan. (This is the table-format-agnostic core
of what Delta/Iceberg expose as `OPTIMIZE ZORDER BY`.)

The scale-to-grid step matters: interleaving RAW keys with unequal bit
widths (here 8-bit partkey vs 4-bit suppkey) puts only the wide key's bits
in the high positions, so range partitioning degenerates to a single-column
sort — measured exactly that before scaling was added.

Everything is integer arithmetic with identical semantics in Spark SQL and
DuckDB, so the whole layout query — scaling, code computation, write,
read-back — is exactly oracle-checkable; the clustering-quality claim
(both-dimension envelope tightening vs a linear sort) is pinned in
tests/test_plans.py from parquet footer statistics.

Reference parity: the reference persists nothing columnar (its one sink is
a JSON cursor file, `api/main.py:258-265`); this is engine-target surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.catalog import load
from ..sources.files import _scratch

# 8-bit-per-dimension Morton spread: classic magic-number bit spreading,
# identical integer semantics in Spark SQL (shiftleft/&/DIV) and DuckDB
# (<</&///).
_GRID = 255  # 8-bit grid per dimension -> 16-bit codes


def _morton_spark(x_sql: str) -> str:
    s = f"({x_sql} & 255)"
    for shift, mask in ((4, 252645135), (2, 858993459), (1, 1431655765)):
        s = f"(({s} | shiftleft({s}, {shift})) & {mask})"
    return s


def _morton_duck(x_sql: str) -> str:
    s = f"({x_sql} & 255)"
    for shift, mask in ((4, 252645135), (2, 858993459), (1, 1431655765)):
        s = f"(({s} | ({s} << {shift})) & {mask})"
    return s


def _scale_spark(col: str, lo: str, hi: str) -> str:
    """Floor-scale `col` from [lo, hi] onto the 8-bit grid (integer DIV)."""
    return f"CAST((({col} - {lo}) * {_GRID}) DIV greatest({hi} - {lo}, 1) AS INT)"


def _scale_duck(col: str, lo: str, hi: str) -> str:
    return f"CAST((({col} - {lo}) * {_GRID}) // greatest({hi} - {lo}, 1) AS INT)"


def zorder_code(x_sql: str, y_sql: str) -> F.Column:
    """16-bit Morton interleave of two grid-scaled keys: x even bits, y odd."""
    return F.expr(f"({_morton_spark(x_sql)} | shiftleft({_morton_spark(y_sql)}, 1))")


def with_zorder_code(df: DataFrame, x: str, y: str) -> DataFrame:
    """Add a `zcode` column: both keys min-max scaled to the 8-bit grid
    (bounds from one tiny broadcast aggregate), then bit-interleaved."""
    stats = df.agg(
        F.min(x).alias("_xlo"),
        F.max(x).alias("_xhi"),
        F.min(y).alias("_ylo"),
        F.max(y).alias("_yhi"),
    )
    xs = _scale_spark(x, "_xlo", "_xhi")
    ys = _scale_spark(y, "_ylo", "_yhi")
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("zcode", zorder_code(xs, ys))
        .drop("_xlo", "_xhi", "_ylo", "_yhi")
    )


def zorder_oracle_expr(x: str, y: str, table: str) -> str:
    """DuckDB expression + FROM clause computing the identical zcode."""
    xs = _scale_duck(x, "_xlo", "_xhi")
    ys = _scale_duck(y, "_ylo", "_yhi")
    code = f"({_morton_duck(xs)} | ({_morton_duck(ys)} << 1))"
    bounds = (
        f"(SELECT min({x}) AS _xlo, max({x}) AS _xhi, "
        f"min({y}) AS _ylo, max({y}) AS _yhi FROM {table})"
    )
    return code, f"{table} CROSS JOIN {bounds}"


def write_zordered(df: DataFrame, path: str, x: str, y: str, n_files: int = 16) -> None:
    """Cluster `df` into `n_files` files by the (x, y) Morton code: one
    range exchange + in-partition sort, then the code column is dropped
    from the stored schema (it is derivable, not data)."""
    (
        with_zorder_code(df, x, y)
        .repartitionByRange(n_files, "zcode")
        .sortWithinPartitions("zcode")
        .drop("zcode")
        .write.mode("overwrite")
        .parquet(path)
    )


_ZC, _ZFROM = zorder_oracle_expr("l_partkey", "l_suppkey", "lineitem")


@register(
    "snk_zorder_parquet",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           {_ZC} AS zcode
    FROM {_ZFROM}
    """,
    tags=("sink", "layout", "scale"),
)
def snk_zorder_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout round trip: write lineitem clustered by the
    (l_partkey, l_suppkey) Morton code, read it back, and re-derive the
    code — content equality against the oracle proves the write is
    lossless and the scale+interleave arithmetic matches DuckDB exactly.
    File-envelope tightening on both dimensions is asserted separately
    from parquet footers in tests/test_plans.py."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    path = _scratch(spark, "lineitem_zorder")
    write_zordered(li, path, "l_partkey", "l_suppkey")
    back = spark.read.parquet(path)
    return with_zorder_code(back, "l_partkey", "l_suppkey")

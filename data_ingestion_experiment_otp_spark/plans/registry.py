"""Query registry: one named entry per implemented operator (SURVEY.md §2).

Each entry is a callable ``(SparkSession, sf_dir) -> DataFrame`` plus an
optional DuckDB oracle SQL string. ``__spark_entry__.py`` exposes the
registry to the driver harness; tests run the same comparison locally.

Conventions enforced here (they ARE the correctness gate):
- every computed column is aliased identically in Spark and oracle SQL;
- double-typed aggregates are rounded on both sides (engines may differ in
  summation order at the ~1e-12 level);
- timestamps in outputs are emitted as epoch seconds/microseconds (bigint)
  or formatted strings — never raw timestamp columns — to dodge ns/us and
  tz-representation mismatches;
- DuckDB ``sum(BIGINT)`` returns HUGEINT, so integer sums are cast back to
  BIGINT in oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None -> driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: add a query builder to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect registration) and return the registry."""
    # Imports are deferred so that `import registry` stays cheap and circular
    # imports are impossible.
    from ..operators import (  # noqa: F401
        aggregates,
        asof,
        dedup,
        extraction,
        multimodal,
        relational,
        sampling,
        scalars,
        similarity,
        statemachine,
        text_analysis,
        windows,
    )
    from ..plans import flagship  # noqa: F401
    from ..sources import envelope, files  # noqa: F401

    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}

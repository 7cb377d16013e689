"""Query registry backing the driver contract (__spark_entry__.py).

Every operator from SURVEY.md §2 registers itself here with a name, a
callable ``(spark, sf_dir) -> DataFrame``, and (when SQL-expressible)
an equivalent DuckDB oracle SQL string. The driver runs both at
sf=0.01 and compares row-count + schema + order-insensitive value
hash — so registered queries must alias every computed column
identically on both sides and avoid nondeterminism.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; ``oracle`` is the DuckDB SQL
    the driver runs side-by-side (omit only for non-SQL-expressible ops,
    which the driver then checks rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLE)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (import = register)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregates,
        joins,
        projections,
        scans,
        setops,
        sorts,
        sql_surface,
        windows,
    )
    from .cdc import batch  # noqa: F401
    from .quality import checks  # noqa: F401
    from .pipelines import elt_job, flagship, reference_pipeline  # noqa: F401
    from .extensions import dedup, multimodal, sampling, similarity, text, udfs  # noqa: F401

    _LOADED = True


def run(name: str, spark: SparkSession, sf_dir: str) -> Any:
    return all_queries()[name](spark, sf_dir)

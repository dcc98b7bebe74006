"""Query registry — the engine's demonstrable operator surface.

Every implemented operator from SURVEY.md §2 (plus the pipeline
extensions) registers here as a (spark_fn, oracle_sql) pair; the driver
contract ``__spark_entry__.py`` re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# name -> (fn(spark, sf_dir) -> DataFrame, oracle_sql | None)
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is equivalent DuckDB SQL (or None
    for non-SQL-expressible operators → driver does a rows-only check)."""

    def deco(fn):
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


_LOADED = False


def _load() -> None:
    """Import all query modules (side effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    from vectordb_spark.queries import (  # noqa: F401
        ann,
        core,
        dedup,
        filters,
        extras,
        fusion,
        joins,
        sparse,
        tpch,
        text,
        vector,
        windows,
    )

    _LOADED = True

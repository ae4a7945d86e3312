"""Query registry: every implemented operator from SURVEY.md §2 registers a
(name → Spark callable, DuckDB oracle SQL) pair here.  __spark_entry__.py is
a thin view over this registry."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def query(name: str, sql: str | None = None):
    """Register a Spark query and its DuckDB oracle (None → rows-only check)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def load_all() -> None:
    """Import every query module (side effect: fills REGISTRY)."""
    from fusionspark.queries import (  # noqa: F401
        composition_queries,
        extended_queries,
        multimodal_queries,
        pipeline_queries,
        rag_queries,
        relational_queries,
        streaming_queries,
        text_queries,
        tree_queries,
        vector_queries,
    )

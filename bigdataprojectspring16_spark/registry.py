"""Query registry — single source of truth for the driver contract.

Each operator from SURVEY.md §2 registers itself with the ``@query``
decorator, pairing the PySpark implementation with its DuckDB oracle
SQL (or ``oracle=None`` for the sanctioned rows-only keys:
approximate / streaming-semantics operators, SURVEY §2 totals note).

``__spark_entry__.queries()`` / ``oracle_sql()`` re-export these
dicts verbatim.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
F = TypeVar("F", bound=QueryFn)

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[F], F]:
    """Register ``fn`` under ``name`` with an optional DuckDB oracle."""

    def deco(fn: F) -> F:
        if name in QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco

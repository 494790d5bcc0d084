"""Query registry backing the driver contract (__spark_entry__.py).

Every operator registers a name, a Spark callable ``(spark, sf_dir) ->
DataFrame``, and (when SQL-expressible) a DuckDB oracle SQL string over
the pre-registered views ``region nation customer supplier part orders
lineitem events documents embeddings``. Column names must match between
the two — the driver's comparator sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_QUERIES: dict[str, Callable[[Any, str], Any]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query under ``name`` with an optional oracle."""

    def deco(fn):
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, Callable[[Any, str], Any]]:
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)


_VALIDATED_DIRS: set[str] = set()


def load(spark, sf_dir: str, table: str):
    """Read one driver fixture table (TESTDATA.md).

    First touch of a fixture directory validates EVERY table's parquet
    footer against the expected schema (fixtures.py) — the round-2 ts
    ns→us drift broke 26 queries with an opaque mid-plan
    AnalysisException; this turns the next drift into an immediate error
    naming table, column, and actual-vs-expected type. One footer pass
    per directory per process (memoized), so the guard costs nothing in
    steady state."""
    if sf_dir not in _VALIDATED_DIRS:
        from ..fixtures import EXPECTED_SCHEMAS, validate_fixtures

        try:
            validate_fixtures(sf_dir)
        except FileNotFoundError:
            # partial layouts (tests pointing at a tmp dir with one
            # table) validate only what exists
            import os

            present = [
                t
                for t in EXPECTED_SCHEMAS
                if os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
            ]
            validate_fixtures(sf_dir, tables=present)
        _VALIDATED_DIRS.add(sf_dir)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")

"""Operator/query library satisfying the driver contract.

Each module registers named queries via :mod:`registry`; the repo-root
``__spark_entry__.py`` exposes them as ``queries()`` / ``oracle_sql()``.
"""

from . import (  # noqa: F401  (import for registration side effects)
    relational,
    tpch_extra,
    utxo_queries,
    events,
    text,
    dedup,
    similarity,
    multimodal,
    graph,
    pipeline,
)
from ..streaming import windows  # noqa: F401  (streaming query registration)
from .registry import all_queries, all_oracles

__all__ = ["all_queries", "all_oracles"]

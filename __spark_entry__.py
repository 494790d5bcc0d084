"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (the reference's address point-lookup,
README.md:54-56, shaped onto the derived utxos view) at sf0.001.
``queries``/``oracle_sql`` expose the full operator library from
``utxo_to_parquet_spark.operators`` (SURVEY.md §2 inventory + the
large-scale pipeline extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable no matter where the driver imports this
# file from (cwd-independent)
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from utxo_to_parquet_spark.operators import all_oracles, all_queries  # noqa: E402
from utxo_to_parquet_spark.operators.utxo_queries import q_utxo_point_lookup  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_utxo_point_lookup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registered query (full coverage
    since round 5): semantics that aren't directly SQL-expressible — seeded-RNG
    LSH, sketches, pandas-UDF feature extraction, streaming state — are
    gated via deterministic-replay oracles or theorem-backed contract
    columns rather than the weaker rows-only check."""
    return all_oracles()

"""Fixture-schema guard for the TESTDATA parquet tables.

Round 2 lesson: the builder's events fixture silently drifted from
TIMESTAMP(NANOS) to TIMESTAMP(MICROS) (a pandas/pyarrow default change)
and 26 queries died with an opaque ``DATATYPE_MISMATCH`` deep inside the
first aggregation. This module turns the *next* drift into a one-line
error naming the table, the column, the expected type, and the type the
file actually has.

``validate_fixtures(sf_dir)`` checks every table's parquet footer with
pyarrow — no Spark session needed, so it is cheap enough to call from a
session bootstrap or a test. Columns may declare several acceptable
types (``ts`` legitimately varies across fixture generations; the
loaders normalize all accepted variants — see
operators/events.py:normalize_ts_ns).
"""

from __future__ import annotations

import os

# table -> column -> acceptable pyarrow type strings (first = canonical)
EXPECTED_SCHEMAS: dict[str, dict[str, tuple[str, ...]]] = {
    "region": {"r_regionkey": ("int32", "int64"), "r_name": ("string", "large_string")},
    "nation": {
        "n_nationkey": ("int32", "int64"),
        "n_name": ("string", "large_string"),
        "n_regionkey": ("int32", "int64"),
    },
    "customer": {
        "c_custkey": ("int64",),
        "c_name": ("string", "large_string"),
        "c_nationkey": ("int32", "int64"),
        "c_acctbal": ("double",),
        "c_mktsegment": ("string", "large_string"),
    },
    "supplier": {
        "s_suppkey": ("int64",),
        "s_name": ("string", "large_string"),
        "s_nationkey": ("int32", "int64"),
        "s_acctbal": ("double",),
    },
    "part": {
        "p_partkey": ("int64",),
        "p_name": ("string", "large_string"),
        "p_brand": ("string", "large_string"),
        "p_type": ("string", "large_string"),
        "p_size": ("int32", "int64"),
        "p_retailprice": ("double",),
    },
    "orders": {
        "o_orderkey": ("int64",),
        "o_custkey": ("int64",),
        "o_orderstatus": ("string", "large_string"),
        "o_totalprice": ("double",),
        "o_orderdate": ("timestamp[us]", "timestamp[ns]", "timestamp[ms]"),
        "o_orderpriority": ("string", "large_string"),
    },
    "lineitem": {
        "l_orderkey": ("int64",),
        "l_partkey": ("int64",),
        "l_suppkey": ("int64",),
        "l_linenumber": ("int32", "int64"),
        "l_quantity": ("double",),
        "l_extendedprice": ("double",),
        "l_discount": ("double",),
        "l_tax": ("double",),
        "l_returnflag": ("string", "large_string"),
        "l_linestatus": ("string", "large_string"),
        "l_shipdate": ("timestamp[us]", "timestamp[ns]", "timestamp[ms]"),
    },
    "events": {
        "event_id": ("int64",),
        # every variant normalize_ts_ns handles; anything else must fail
        # HERE with a readable message, not downstream in an agg
        "ts": ("timestamp[us]", "timestamp[ns]", "timestamp[ms]", "int64"),
        "user_id": ("int64",),
        "event_type": ("string", "large_string"),
        "value": ("double",),
        "props": ("string", "large_string"),
    },
    "documents": {
        "doc_id": ("int64",),
        "text": ("string", "large_string"),
        "lang": ("string", "large_string"),
        "source": ("string", "large_string"),
        "n_chars": ("int64", "int32"),
    },
    "embeddings": {
        "vec_id": ("int64",),
        "embedding": ("list<element: float>", "list<item: float>", "list<element: double>"),
        "label": ("int32", "int64"),
    },
}


def validate_fixtures(sf_dir: str, tables: list[str] | None = None) -> list[str]:
    """Validate every fixture table's parquet schema under ``sf_dir``.

    Returns the list of validated table names; raises ``ValueError`` with
    a full actual-vs-expected rendering on the first mismatching table,
    and ``FileNotFoundError`` if a table file is missing.
    """
    import pyarrow.parquet as pq

    checked = []
    # `tables if ... is not None`, NOT `tables or ...`: an explicit empty
    # list means "validate nothing" (registry.load's partial-layout
    # fallback passes exactly the tables present, which may be none)
    for table in tables if tables is not None else sorted(EXPECTED_SCHEMAS):
        path = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(path):
            raise FileNotFoundError(f"fixture table missing: {path}")
        schema = pq.read_schema(path)
        actual = {f.name: str(f.type) for f in schema}
        expected = EXPECTED_SCHEMAS[table]
        problems = []
        for col, accepted in expected.items():
            if col not in actual:
                problems.append(f"  column {col!r} missing (expected {accepted[0]})")
            elif actual[col] not in accepted:
                problems.append(
                    f"  column {col!r}: got {actual[col]}, accepted: {', '.join(accepted)}"
                )
        for col in actual:
            if col not in expected:
                problems.append(f"  unexpected column {col!r} ({actual[col]})")
        if problems:
            raise ValueError(
                f"fixture schema drift in {path}:\n"
                + "\n".join(problems)
                + "\n  full actual schema: "
                + ", ".join(f"{k}:{v}" for k, v in actual.items())
            )
        checked.append(table)
    return checked

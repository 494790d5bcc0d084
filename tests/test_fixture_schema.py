"""Guard against fixture-schema drift (the round-2 ns→us ts incident).

Validates every TESTDATA table's parquet footer at every scale factor,
and exercises the drift-detection error path on a synthetic bad file.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from utxo_to_parquet_spark.fixtures import EXPECTED_SCHEMAS, validate_fixtures

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_all_tables_match_expected_schema(sf_dir):
    checked = validate_fixtures(sf_dir)
    assert set(checked) == set(EXPECTED_SCHEMAS)


def test_drift_is_reported_with_table_and_column(tmp_path):
    # a 'documents' table whose doc_id drifted int64 -> string
    bad = pa.table(
        {
            "doc_id": pa.array(["0", "1"], pa.string()),
            "text": pa.array(["a b c", "d e f"]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["web", "web"]),
            "n_chars": pa.array([5, 5], pa.int64()),
        }
    )
    pq.write_table(bad, tmp_path / "documents.parquet")
    with pytest.raises(ValueError, match=r"(?s)documents\.parquet.*doc_id.*got string"):
        validate_fixtures(str(tmp_path), tables=["documents"])


def test_missing_table_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="events"):
        validate_fixtures(str(tmp_path), tables=["events"])


def test_events_ts_variants_all_normalize(spark, tmp_path):
    """normalize_ts_ns must produce identical ns-long values whether the
    fixture stores ts as timestamp[us], timestamp[ns] (read as long via
    nanosAsLong), or raw int64 nanoseconds."""
    from utxo_to_parquet_spark.operators.events import normalize_ts_ns

    ns_vals = [1_700_000_000_123_456_000, 1_700_000_086_400_789_000]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    outs = {}
    for unit in ("us", "ns", "int64"):
        if unit == "int64":
            arr = pa.array(ns_vals, pa.int64())
        else:
            arr = pa.array(
                [v // (1000 if unit == "us" else 1) for v in ns_vals],
                pa.timestamp(unit),
            )
        path = str(tmp_path / f"ev_{unit}.parquet")
        pq.write_table(pa.table({"ts": arr}), path)
        df = normalize_ts_ns(spark.read.parquet(path))
        assert dict(df.dtypes)["ts"] == "bigint"
        outs[unit] = sorted(r.ts for r in df.collect())

    assert outs["us"] == outs["ns"] == outs["int64"] == sorted(ns_vals)

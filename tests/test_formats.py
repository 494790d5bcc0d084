"""Round-trip tests for multi-format table I/O (sources/formats.py):
every supported format must reproduce rows AND types exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utxo_to_parquet_spark.sources.formats import read_table, write_table

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(x) for x in r) for r in df.select(cols).collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip_orders(spark, tmp_path, fmt):
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    path = str(tmp_path / f"orders_{fmt}")
    write_table(src, path, fmt, n_files=2)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema  # types survive, not just values
    assert _canon(back) == _canon(src)


def test_text_formats_reject_binary(spark, tmp_path):
    df = spark.range(3).select(F.col("id"), F.unhex(F.lit("76a914")).alias("b"))
    with pytest.raises(ValueError, match="binary columns"):
        write_table(df, str(tmp_path / "x"), "csv")
    # hex-encoded export path works
    write_table(df.select("id", F.hex("b").alias("b_hex")), str(tmp_path / "x"), "csv")


def test_unknown_format_rejected(spark, tmp_path):
    df = spark.range(1)
    with pytest.raises(ValueError, match="unsupported"):
        write_table(df, str(tmp_path / "x"), "avro")


def test_documents_roundtrip_json(spark, tmp_path):
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "docs_json")
    write_table(src, path, "json", n_files=1)
    back = read_table(spark, path, "json", schema=src.schema)
    assert _canon(back) == _canon(src)

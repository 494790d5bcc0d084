"""Multi-format table I/O: CSV / JSON-lines / ORC / Parquet round-trips.

The reference emits exactly one format (Parquet, src/main.rs:208-216);
an engine a reference user can switch to also needs the interchange
formats that surround a lake: CSV for export/import with external
tools, JSON-lines for event feeds, ORC as the columnar alternative.
All four ride Spark's built-in DataSource V1/V2 readers and writers —
no custom code in the data path — so pushdown/pruning behavior comes
from the engine, and this module only pins the options that make
round-trips lossless:

- **Schema is never inferred on read-back.** Text formats (CSV, JSON)
  erase types; ``read_table`` takes the authoritative schema (or reads
  it from a sibling Parquet/ORC copy) and applies it, instead of paying
  an inference pass — at 100 TB, schema inference is a full extra scan.
- **Timestamps** are written in ISO-8601 with explicit UTC so CSV/JSON
  round-trips are timezone-stable regardless of session zone.
- **Binary columns** cannot survive CSV/JSON natively; ``write_table``
  refuses them for text formats rather than silently corrupting
  (callers hex-encode first — the UTXO tables' documented export path).
- **Compression** defaults to zstd for columnar formats and gzip for
  text formats (splittable-ness note: gzip text files are NOT
  splittable; production bulk exports should prefer many medium files
  via ``n_files`` over one large one).
"""

from __future__ import annotations

from pyspark.sql.types import BinaryType, StructType

TEXT_FORMATS = {"csv", "json"}
COLUMNAR_FORMATS = {"parquet", "orc"}

_TS_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "timeZone": "UTC",
}


def write_table(df, path: str, fmt: str, *, n_files: int | None = None) -> None:
    """Write ``df`` at ``path`` in ``fmt`` (csv/json/orc/parquet),
    losslessly round-trippable via :func:`read_table`."""
    fmt = fmt.lower()
    if fmt not in TEXT_FORMATS | COLUMNAR_FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    if fmt in TEXT_FORMATS:
        bin_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, BinaryType)]
        if bin_cols:
            raise ValueError(
                f"binary columns {bin_cols} cannot round-trip through {fmt}; "
                "hex-encode them first (e.g. F.hex)"
            )
    if n_files is not None:
        df = df.coalesce(n_files)
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w.options(header=True, compression="gzip", **_TS_OPTS).csv(path)
    elif fmt == "json":
        w.options(compression="gzip", **_TS_OPTS).json(path)
    elif fmt == "orc":
        w.option("compression", "zstd").orc(path)
    else:
        w.option("compression", "zstd").parquet(path)


def read_table(spark, path: str, fmt: str, schema: StructType | None = None):
    """Read a table written by :func:`write_table`. Text formats require
    the authoritative ``schema`` (types are not inferred — inference is
    an extra full scan and still lossy for timestamps/decimals)."""
    fmt = fmt.lower()
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if schema is None:
        raise ValueError(f"{fmt} read-back requires the authoritative schema")
    r = spark.read.schema(schema).options(**_TS_OPTS)
    if fmt == "csv":
        return r.options(header=True).csv(path)
    if fmt == "json":
        return r.json(path)
    raise ValueError(f"unsupported format: {fmt}")

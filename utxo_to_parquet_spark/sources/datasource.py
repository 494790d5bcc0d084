"""``spark.read.format("utxo_dump")`` — the source as a first-class
Spark (Python) DataSource, Spark 4's native extension point.

Same two-pass design as :func:`read_utxo_dump` (framing index on the
driver inside ``partitions()``, parallel decode in ``read()``), but
integrated with the planner: Spark sees one ``InputPartition`` per decode
split and schedules them like any other scan, and the decode yields Arrow
RecordBatches straight into the vectorized path. Column pruning happens
in Catalyst above the scan (the format is row-grouped binary; there is
nothing to prune at the source level).

Usage::

    from utxo_to_parquet_spark.sources import register_utxo_datasource
    register_utxo_datasource(spark)
    df = (spark.read.format("utxo_dump")
          .option("chunk_rows", 250_000)
          .load("/path/to/utxo.dump"))

    # or as a stream: bounded micro-batched replay (the reference's own
    # execution model, main.rs:239, surfaced through readStream)
    sdf = (spark.readStream.format("utxo_dump")
           .option("splits_per_trigger", 8)
           .load("/path/to/utxo.dump"))

On a real cluster the package must be shipped to executors
(``--py-files`` / a wheel) so ``read()`` can import the decode kernels;
the input must live on a shared filesystem, as with any file source.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

UTXO_SCHEMA_DDL = (
    "txid string, vout long, height long, coinbase boolean, amount long, script binary"
)


@dataclass
class UtxoSplitPartition(InputPartition):
    """One decode split; must be picklable (shipped to executors)."""

    path: str
    offset: int
    length: int
    carried_txid: bytes
    carried_coins_left: int
    num_rows: int


class UtxoDumpReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("utxo_dump: .load(path) is required")
        self.path = path
        self.chunk_rows = int(options.get("chunk_rows", 250_000))

    def partitions(self) -> Sequence[InputPartition]:
        import os

        from .utxo_dump import _list_dump_files, index_utxo_dump

        out: list[UtxoSplitPartition] = []
        for f in _list_dump_files(self.path):
            f = os.path.abspath(f)
            _, splits = index_utxo_dump(f, chunk_rows=self.chunk_rows)
            size = os.path.getsize(f)
            ends = [s.offset for s in splits[1:]] + [size]
            out.extend(
                UtxoSplitPartition(f, s.offset, end - s.offset, s.carried_txid,
                                   s.carried_coins_left, s.num_rows)
                for s, end in zip(splits, ends)
            )
        return out or [UtxoSplitPartition("", 0, 0, b"\x00" * 32, 0, 0)]

    def read(self, partition: UtxoSplitPartition) -> Iterator:
        if partition.num_rows == 0:
            return
        from .utxo_dump import Split, _decode_split

        with open(partition.path, "rb") as f:
            f.seek(partition.offset)
            data = f.read(partition.length)
        yield _decode_split(
            data,
            Split(0, partition.carried_txid, partition.carried_coins_left, partition.num_rows),
        )


class UtxoDumpStreamReader(DataSourceStreamReader):
    """Micro-batched snapshot replay: ``spark.readStream.format("utxo_dump")``.

    The reference is itself a streaming one-pass converter (bounded
    memory via a 10M-row flush cadence, main.rs:239); this reader is
    that execution model surfaced through Structured Streaming. The
    framing index is built once on the driver; each trigger consumes at
    most ``splits_per_trigger`` decode splits (the offset is a split
    index), and each split decodes on an executor exactly like the
    batch path. Restart recovery is free: offsets are split indexes
    into a deterministic index, so a checkpoint resume re-decodes only
    uncommitted splits. Use cases: incremental conversion of snapshot
    shards as they land, and backpressure-bounded replay into any
    streaming sink (foreachBatch upserts, file sinks)."""

    def __init__(self, options: dict):
        import os

        from .utxo_dump import _list_dump_files, index_utxo_dump

        path = options.get("path")
        if not path:
            raise ValueError("utxo_dump: .load(path) is required")
        chunk_rows = int(options.get("chunk_rows", 250_000))
        self.splits_per_trigger = int(options.get("splits_per_trigger", 8))
        self._parts: list[UtxoSplitPartition] = []
        for f in _list_dump_files(path):
            f = os.path.abspath(f)
            _, splits = index_utxo_dump(f, chunk_rows=chunk_rows)
            size = os.path.getsize(f)
            ends = [s.offset for s in splits[1:]] + [size]
            self._parts.extend(
                UtxoSplitPartition(f, s.offset, end - s.offset, s.carried_txid,
                                   s.carried_coins_left, s.num_rows)
                for s, end in zip(splits, ends)
            )

    def initialOffset(self) -> dict:
        return {"split": 0}

    def latestOffset(self) -> dict:
        # advance the available watermark by at most splits_per_trigger
        # per call — Spark invokes this once per trigger, so this is the
        # backpressure bound on micro-batch size
        cur = getattr(self, "_avail", 0)
        self._avail = min(cur + self.splits_per_trigger, len(self._parts))
        return {"split": self._avail}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return self._parts[start["split"] : end["split"]] or [
            UtxoSplitPartition("", 0, 0, b"\x00" * 32, 0, 0)
        ]

    def read(self, partition: UtxoSplitPartition) -> Iterator:
        if partition.num_rows == 0:
            return
        from .utxo_dump import Split, _decode_split

        with open(partition.path, "rb") as f:
            f.seek(partition.offset)
            data = f.read(partition.length)
        yield _decode_split(
            data,
            Split(0, partition.carried_txid, partition.carried_coins_left, partition.num_rows),
        )

    def commit(self, end: dict) -> None:
        pass


class UtxoDumpDataSource(DataSource):
    """Registration shim: name + static schema + reader factories."""

    @classmethod
    def name(cls) -> str:
        return "utxo_dump"

    def schema(self) -> str:
        return UTXO_SCHEMA_DDL

    def reader(self, schema) -> UtxoDumpReader:
        return UtxoDumpReader(self.options)

    def streamReader(self, schema) -> UtxoDumpStreamReader:
        return UtxoDumpStreamReader(self.options)


def register_utxo_datasource(spark) -> None:
    """Idempotently register the ``utxo_dump`` format on this session."""
    spark.dataSource.register(UtxoDumpDataSource)

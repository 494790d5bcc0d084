"""Splittable Spark source for Bitcoin Core's ``dumptxoutset`` snapshots.

The wire format (decoded by /root/reference/src/main.rs:171-230) is
stateful and non-splittable: the current txid is carried across records
(run-length grouping), and record boundaries are not discoverable without
decoding from the start. A naive port would therefore be a single task —
the reference itself is single-threaded (101% CPU, README.md:47).

This module makes the scan *splittable* with a two-pass design
(SURVEY.md §7.3):

1. **Framing pass** (sequential, driver-side): walk only the record
   *framing* — varint lengths and payload sizes, no script reconstruction,
   no hex rendering — and emit split descriptors
   ``(byte_offset, carried_txid, carried_coins_left, num_rows)`` every
   ``chunk_rows`` records. O(total bytes) but ~10× cheaper per record
   than a full decode.
2. **Decode pass** (parallel, executors): each task seeks to its offset,
   restores the carried run-length state, fully decodes its ``num_rows``
   records, and yields Arrow batches via ``mapInPandas``.

At cluster scale the input must live on a shared filesystem (HDFS/S3/NFS)
so every executor can open it; the framing pass streams the file once and
its descriptors are a few KB regardless of input size, so driver memory
is O(1).

Output schema matches SURVEY.md §1.2 (signed 64-bit in place of the
reference's unsigned Arrow fields — all domain values < 2^63):
txid STRING (byte-reversed hex), vout LONG, height LONG,
coinbase BOOLEAN, amount LONG, script BINARY — all non-nullable.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterable, Iterator

from ..kernels.amount import compress_amount, decompress_amount
from ..kernels.header import HEADER_LEN, UtxoHeader, build_header, parse_header
from ..kernels.script import SPECIAL_SCRIPTS, compress_script, decode_script
from ..kernels.varint import (
    read_consensus_varint,
    read_core_varint,
    write_consensus_varint,
    write_core_varint,
)

UTXO_SCHEMA = (
    "txid string, vout long, height long, coinbase boolean, amount long, script binary"
)


@dataclass(frozen=True)
class Split:
    """One parallel decode unit produced by the framing pass."""

    offset: int  # absolute byte offset of the first record in this split
    carried_txid: bytes  # txid in effect at `offset` (internal byte order)
    carried_coins_left: int  # coins remaining in the current run-length group
    num_rows: int


# ---------------------------------------------------------------------------
# fixture writer (inverse of the decoder; used by tests and benchmarks)
# ---------------------------------------------------------------------------

def write_utxo_dump(
    path: str,
    rows: Iterable[tuple[bytes, int, int, bool, int, bytes]],
    *,
    version: int = 2,
    network: str = "mainnet",
    block_hash: bytes = b"\x00" * 32,
) -> int:
    """Serialize rows ``(txid32, vout, height, coinbase, amount, script)``
    into a valid ``dumptxoutset`` stream. Consecutive rows sharing a txid
    are run-length grouped exactly like Bitcoin Core's serializer.

    Returns the number of rows written.
    """
    rows = list(rows)
    # group consecutive rows by txid (the format requires grouping)
    groups: list[tuple[bytes, list[tuple[int, int, bool, int, bytes]]]] = []
    for txid, vout, height, coinbase, amount, script in rows:
        if len(txid) != 32:
            raise ValueError("txid must be 32 bytes (internal byte order)")
        if groups and groups[-1][0] == txid:
            groups[-1][1].append((vout, height, coinbase, amount, script))
        else:
            groups.append((txid, [(vout, height, coinbase, amount, script)]))

    with open(path, "wb") as f:
        f.write(build_header(len(rows), version=version, network=network, block_hash=block_hash))
        for txid, coins in groups:
            f.write(txid)
            f.write(write_consensus_varint(len(coins)))
            for vout, height, coinbase, amount, script in coins:
                f.write(write_consensus_varint(vout))
                f.write(write_core_varint((height << 1) | int(coinbase)))
                f.write(write_core_varint(compress_amount(amount)))
                f.write(compress_script(script))
    return len(rows)


# ---------------------------------------------------------------------------
# pass 1: framing scan → splits
# ---------------------------------------------------------------------------

def index_utxo_dump(path: str, chunk_rows: int = 250_000) -> tuple[UtxoHeader, list[Split]]:
    """Sequentially walk record framing and emit decode splits.

    Only lengths are examined — scripts are skipped, amounts and heights
    are not materialized — so this is the cheap pass. Raises ValueError on
    malformed input (bad magic, zero-coin group, truncation), mirroring
    the reference's asserts (main.rs:174,225).
    """
    with open(path, "rb") as f:
        data = memoryview(f.read())
    header = parse_header(data)
    n = header.num_utxos

    splits: list[Split] = []
    pos = HEADER_LEN
    size = len(data)
    coins_left = 0
    cur_txid = b"\x00" * 32
    chunk_start_pos = pos
    chunk_start_txid = cur_txid
    chunk_start_coins = 0
    chunk_rows_seen = 0

    i = 0
    while i < n:
        if coins_left == 0:
            if pos + 32 > size:
                raise ValueError("truncated dump: expected txid")
            cur_txid = bytes(data[pos : pos + 32])
            pos += 32
            coins_left, pos = read_consensus_varint(data, pos)
            if coins_left <= 0:
                raise ValueError("invalid dump: zero coins for txid group")
        # vout (consensus varint)
        _, pos = read_consensus_varint(data, pos)
        # code + amount (core varints) — values discarded, framing only
        _, pos = read_core_varint(data, pos)
        _, pos = read_core_varint(data, pos)
        # script length
        slen, pos = read_core_varint(data, pos)
        if slen < SPECIAL_SCRIPTS:
            pos += 20 if slen in (0, 1) else 32
        else:
            pos += slen - SPECIAL_SCRIPTS
        if pos > size:
            raise ValueError("truncated dump: record payload past EOF")
        coins_left -= 1
        i += 1
        chunk_rows_seen += 1
        if chunk_rows_seen == chunk_rows or i == n:
            splits.append(
                Split(chunk_start_pos, chunk_start_txid, chunk_start_coins, chunk_rows_seen)
            )
            chunk_start_pos = pos
            chunk_start_txid = cur_txid
            chunk_start_coins = coins_left
            chunk_rows_seen = 0
    return header, splits


# ---------------------------------------------------------------------------
# pass 2: parallel decode
# ---------------------------------------------------------------------------

def _decode_split(data, split: Split) -> tuple[list, list, list, list, list, list]:
    """Fully decode ``split.num_rows`` records starting at ``split.offset``.

    Returns six parallel columns, matching the reference's Batch struct
    (main.rs:280-288). txid is rendered byte-reversed-hex once per
    run-length group, not per row.
    """
    pos = split.offset
    coins_left = split.carried_coins_left
    txid_hex = split.carried_txid[::-1].hex()

    txids: list[str] = []
    vouts: list[int] = []
    heights: list[int] = []
    coinbases: list[bool] = []
    amounts: list[int] = []
    scripts: list[bytes] = []

    for _ in range(split.num_rows):
        if coins_left == 0:
            txid_hex = bytes(data[pos : pos + 32])[::-1].hex()
            pos += 32
            coins_left, pos = read_consensus_varint(data, pos)
            if coins_left <= 0:
                raise ValueError("invalid dump: zero coins for txid group")
        vout, pos = read_consensus_varint(data, pos)
        code, pos = read_core_varint(data, pos)
        compressed_amount, pos = read_core_varint(data, pos)
        script, pos = decode_script(data, pos)
        coins_left -= 1

        txids.append(txid_hex)
        vouts.append(vout)
        heights.append(code >> 1)
        coinbases.append(bool(code & 1))
        amounts.append(decompress_amount(compressed_amount))
        scripts.append(script)
    return txids, vouts, heights, coinbases, amounts, scripts


def read_utxo_dump(spark, path: str, *, chunk_rows: int = 250_000, min_splits: int | None = None):
    """Read a ``dumptxoutset`` snapshot into a DataFrame, in parallel.

    Framing pass on the driver → one decode task per split on executors
    via ``mapInPandas`` (Arrow-batched, no per-row Python/JVM crossings
    beyond the decode itself).
    """
    import pandas as pd

    header, splits = index_utxo_dump(path, chunk_rows=chunk_rows)
    if not splits:  # empty-but-valid snapshot
        return spark.createDataFrame([], UTXO_SCHEMA)

    abspath = os.path.abspath(path)
    file_size = os.path.getsize(abspath)
    # each split's byte extent ends where the next begins — tasks read only
    # their own range, so I/O per task is O(split), not O(file)
    ends = [s.offset for s in splits[1:]] + [file_size]
    splits_df = spark.createDataFrame(
        [
            (s.offset, end - s.offset, s.carried_txid, s.carried_coins_left, s.num_rows)
            for s, end in zip(splits, ends)
        ],
        "offset long, length long, carried_txid binary, carried_coins_left long, num_rows long",
    ).repartition(len(splits))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        f = open(abspath, "rb")
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                f.seek(int(row.offset))
                data = memoryview(f.read(int(row.length)))
                split = Split(
                    0,
                    bytes(row.carried_txid),
                    int(row.carried_coins_left),
                    int(row.num_rows),
                )
                txids, vouts, heights, coinbases, amounts, scripts = _decode_split(data, split)
                yield pd.DataFrame(
                    {
                        "txid": txids,
                        "vout": vouts,
                        "height": heights,
                        "coinbase": coinbases,
                        "amount": amounts,
                        "script": scripts,
                    }
                )

    return splits_df.mapInPandas(decode, UTXO_SCHEMA)

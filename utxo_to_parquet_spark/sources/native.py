"""Optional C acceleration for the framing scan, via ctypes.

The framing pass (sources/utxo_dump.py) is inherently sequential — the
one part of the pipeline Spark cannot parallelize — so its per-record
cost bounds end-to-end conversion throughput. The pure-Python inlined
loop does ~800k records/s; this C version of the same loop does tens of
millions/s, moving the bottleneck back to the (parallel) decode.

Build strategy: compile once with the system C compiler into a cached
shared object; on ANY failure (no compiler, sandboxed exec, ...) callers
fall back to the Python loop. No third-party packages involved.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_C_SOURCE = r"""
#include <stdint.h>

/* Frame the run-length-grouped coin records of a dumptxoutset body.
 *
 * data/size: full file; scanning starts at *pos_io (absolute).
 * n_records: coins to frame. chunk_rows: rows per split.
 * Outputs per split: absolute offset, absolute offset of the governing
 * txid, coins left in the current group at the split start, row count.
 * Returns the number of splits, or a negative error code:
 *   -1 truncated, -2 zero-coin group, -3 split capacity exceeded.
 */
long frame_scan(const uint8_t *data, long size, long start,
                long n_records, long chunk_rows,
                long *out_off, long *out_txid_off, long *out_coins, long *out_rows,
                long max_splits)
{
    long pos = start;
    long coins_left = 0;
    long txid_off = -1;
    long n_splits = 0;
    long chunk_start = pos, chunk_txid = -1, chunk_coins = 0, chunk_seen = 0;

    for (long i = 0; i < n_records; i++) {
        if (coins_left == 0) {
            if (pos + 33 > size) return -1;
            txid_off = pos;
            pos += 32;
            uint8_t b0 = data[pos];
            if (b0 < 0xFD) { coins_left = b0; pos += 1; }
            else if (b0 == 0xFD) {
                if (pos + 3 > size) return -1;
                coins_left = (long)data[pos+1] | ((long)data[pos+2] << 8);
                pos += 3;
            } else if (b0 == 0xFE) {
                if (pos + 5 > size) return -1;
                coins_left = (long)data[pos+1] | ((long)data[pos+2] << 8)
                           | ((long)data[pos+3] << 16) | ((long)data[pos+4] << 24);
                pos += 5;
            } else {
                if (pos + 9 > size) return -1;
                coins_left = 0;
                for (int k = 7; k >= 0; k--)
                    coins_left = (coins_left << 8) | (long)data[pos+1+k];
                pos += 9;
            }
            if (coins_left <= 0) return -2;
        }
        /* vout: consensus varint width from lead byte */
        if (pos >= size) return -1;
        uint8_t b0 = data[pos];
        pos += (b0 < 0xFD) ? 1 : (b0 == 0xFD) ? 3 : (b0 == 0xFE) ? 5 : 9;
        /* code + amount: core varints, skip to terminator */
        while (pos < size && (data[pos] & 0x80)) pos++;
        pos++;
        while (pos < size && (data[pos] & 0x80)) pos++;
        pos++;
        /* script length: decode the value to skip the payload */
        if (pos >= size) return -1;
        unsigned long slen = 0;
        for (;;) {
            if (pos >= size) return -1;
            uint8_t b = data[pos++];
            slen = (slen << 7) | (b & 0x7F);
            if (b & 0x80) slen += 1; else break;
        }
        if (slen < 6) pos += (slen < 2) ? 20 : 32;
        else pos += slen - 6;
        if (pos > size) return -1;

        coins_left--;
        chunk_seen++;
        if (chunk_seen == chunk_rows || i == n_records - 1) {
            if (n_splits >= max_splits) return -3;
            out_off[n_splits] = chunk_start;
            out_txid_off[n_splits] = chunk_txid;
            out_coins[n_splits] = chunk_coins;
            out_rows[n_splits] = chunk_seen;
            n_splits++;
            chunk_start = pos;
            chunk_txid = txid_off;
            chunk_coins = coins_left;
            chunk_seen = 0;
        }
    }
    return n_splits;
}
"""

_lib = None
_tried = False


def _build() -> "ctypes.CDLL | None":
    tag = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(), f"utxo_frame_{tag}.so")
    if not os.path.exists(cache):
        src = cache.replace(".so", ".c")
        with open(src, "w") as fh:
            fh.write(_C_SOURCE)
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", cache, src],
            check=True,
            capture_output=True,
            timeout=60,
        )
    lib = ctypes.CDLL(cache)
    lib.frame_scan.restype = ctypes.c_long
    lib.frame_scan.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
        ctypes.c_long,
    ]
    return lib


def get_native_framer():
    """The compiled framing kernel, or None if unavailable."""
    global _lib, _tried
    if not _tried:
        _tried = True
        try:
            _lib = _build()
        except Exception:
            _lib = None
    return _lib


def frame_scan_native(path: str, start: int, n_records: int, chunk_rows: int):
    """mmap the file and run the C framing loop.

    Returns (splits as list of (offset, txid_bytes, coins_left, rows)),
    or None if the native kernel is unavailable. Raises ValueError for
    malformed input, matching the Python framer.
    """
    import mmap

    lib = get_native_framer()
    if lib is None:
        return None
    with open(path, "rb") as fh:
        # ACCESS_COPY gives a writable (copy-on-write) view, which ctypes
        # can address zero-copy via from_buffer; we never write to it
        mm = mmap.mmap(fh.fileno(), 0, access=mmap.ACCESS_COPY)
        c_data = None
        try:
            size = len(mm)
            max_splits = max(n_records // max(chunk_rows, 1) + 2, 16)
            off = (ctypes.c_long * max_splits)()
            txo = (ctypes.c_long * max_splits)()
            coins = (ctypes.c_long * max_splits)()
            rows = (ctypes.c_long * max_splits)()
            c_data = (ctypes.c_uint8 * size).from_buffer(mm)
            n = lib.frame_scan(
                c_data, size, start, n_records, chunk_rows, off, txo, coins, rows, max_splits
            )
            if n == -1:
                raise ValueError("truncated dump: framing ran past EOF")
            if n == -2:
                raise ValueError("invalid dump: zero coins for txid group")
            if n < 0:
                raise ValueError(f"framing failed with code {n}")
            out = []
            for k in range(n):
                txid = mm[txo[k] : txo[k] + 32] if txo[k] >= 0 else b"\x00" * 32
                out.append((off[k], txid, coins[k], rows[k]))
            return out
        finally:
            del c_data  # release the buffer view before closing the map
            mm.close()

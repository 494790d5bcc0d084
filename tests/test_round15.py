"""Round-15 optimization pins: O(1) bit-writer packing, vectorized
full-pel motion search, and the parquet-backed fragment memo's
eviction / fail-loud / reentrancy contract."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_bitwriter_put_matches_bit_at_a_time():
    """The round-15 byte-at-a-time `put` must emit the identical
    MSB-first bitstream as the per-bit reference it replaced, across
    random (bits, width) sequences including flush padding."""
    from utxo_to_parquet_spark.kernels.video import _MCBitWriter

    class _RefWriter:
        def __init__(self):
            self.buf = bytearray()
            self.acc = 0
            self.n = 0

        def put(self, bits, width):
            for i in range(width - 1, -1, -1):
                self.acc = (self.acc << 1) | ((bits >> i) & 1)
                self.n += 1
                if self.n == 8:
                    self.buf.append(self.acc)
                    self.acc = self.n = 0

    rng = np.random.default_rng(15)
    for _trial in range(20):
        fast, ref = _MCBitWriter(), _RefWriter()
        for _ in range(200):
            width = int(rng.integers(1, 33))
            bits = int(rng.integers(0, 1 << width))
            fast.put(bits, width)
            ref.put(bits, width)
        assert bytes(fast.buf) == bytes(ref.buf)
        assert (fast.acc, fast.n) == (ref.acc, ref.n)


def test_fullpel_search_matches_sequential_scan():
    """The vectorized SAD search must pick the identical (mv, sad) as
    the sequential strict-improvement scan in the deterministic
    (|dx|+|dy|, dy, dx) candidate order — including edge macroblocks
    where part of the candidate window is out of bounds, and tie cases
    (flat frames) where order decides the winner."""
    from utxo_to_parquet_spark.kernels.video import (
        _mc_mv_inbounds,
        _mc_pred,
        _mc_search_fullpel,
    )

    def _seq(refi, mb, y, x, search):
        h, w = refi.shape
        cands = sorted(
            ((2 * dx, 2 * dy) for dx in range(-search, search + 1)
             for dy in range(-search, search + 1)),
            key=lambda v: (abs(v[0]) + abs(v[1]), v[1], v[0]),
        )
        best, best_sad = None, None
        for dx2, dy2 in cands:
            if not _mc_mv_inbounds(h, w, y, x, dy2, dx2):
                continue
            sad = int(np.abs(mb - _mc_pred(refi, y, x, dy2, dx2)).sum())
            if best_sad is None or sad < best_sad:
                best, best_sad = (dx2, dy2), sad
        return best, best_sad

    rng = np.random.default_rng(7)
    for search in (2, 8):
        ref = rng.integers(0, 256, (48, 64)).astype(np.int32)
        cur = rng.integers(0, 256, (48, 64)).astype(np.int32)
        flat = np.full((48, 64), 128, dtype=np.int32)  # all-ties frame
        for refi, curi in ((ref, cur), (flat, flat)):
            for y in (0, 16, 32):
                for x in (0, 32, 48):
                    mb = curi[y : y + 16, x : x + 16]
                    got = _mc_search_fullpel(refi, mb, y, x, search)
                    want = _seq(refi, mb, y, x, search)
                    assert got == want, (search, y, x, got, want)


def _write_table(path, ids):
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64())}),
        str(path),
    )


def test_memo_fragment_evicts_and_rebuilds(tmp_path, spark):
    """In-place overwrite of an input parquet must evict the cached
    fragment (fingerprint stored as a VALUE, stale entry dropped) and
    rebuild from the new inputs — and the cache must not grow an entry
    per fingerprint."""
    from utxo_to_parquet_spark.operators.registry import (
        _FRAGMENT_CACHE,
        memo_fragment,
    )

    sf = tmp_path / "corpus"
    sf.mkdir()
    _write_table(sf / "docs.parquet", [1, 2, 3])

    def build():
        return spark.read.parquet(str(sf / "docs.parquet"))

    first = memo_fragment(spark, "r15_test_frag", str(sf), build)
    assert first.count() == 3
    n_entries = sum(1 for k in _FRAGMENT_CACHE if k[1] == "r15_test_frag")
    assert n_entries == 1

    os.utime(sf / "docs.parquet")  # no content change, just mtime
    _write_table(sf / "docs.parquet", [1, 2, 3, 4, 5])
    second = memo_fragment(spark, "r15_test_frag", str(sf), build)
    assert second.count() == 5  # stale memo NOT served
    n_entries = sum(1 for k in _FRAGMENT_CACHE if k[1] == "r15_test_frag")
    assert n_entries == 1  # evicted, not accumulated


def test_memo_fragment_unlistable_path_raises(spark):
    """An input path that cannot be fingerprinted must raise — never
    silently memoize what cannot be invalidated."""
    from utxo_to_parquet_spark.operators.registry import memo_fragment

    with pytest.raises(RuntimeError, match="cannot fingerprint"):
        memo_fragment(
            spark,
            "r15_test_missing",
            "/nonexistent/sf_dir",
            lambda: spark.range(1),
        )


def test_memo_fragment_nested_build_reenters(tmp_path, spark):
    """A fragment whose build consumes ANOTHER fragment (the
    trade_edges-on-trade_pairs shape) must not deadlock — the build
    lock is reentrant."""
    from utxo_to_parquet_spark.operators.registry import memo_fragment

    sf = tmp_path / "corpus2"
    sf.mkdir()
    _write_table(sf / "docs.parquet", [10, 20])

    def inner():
        return spark.read.parquet(str(sf / "docs.parquet"))

    def outer():
        base = memo_fragment(spark, "r15_test_inner", str(sf), inner)
        return base.selectExpr("doc_id * 2 AS doc_id")

    out = memo_fragment(spark, "r15_test_outer", str(sf), outer)
    assert sorted(r.doc_id for r in out.collect()) == [20, 40]

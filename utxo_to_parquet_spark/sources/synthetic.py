"""Deterministic synthetic UTXO data (FIXTURES.md §2-§3).

Generates rows matching the reference's output schema and, through
``write_utxo_dump``, byte-valid ``dumptxoutset`` inputs for decoder golden
tests and conversion benchmarks. Seeded — same seed, same bytes.
"""

from __future__ import annotations

import hashlib
import random

# a fixed "famous" script planted many times so the flagship equality query
# (README.md:54-56 analog) returns a deterministic multi-row result
EATER_SCRIPT = bytes.fromhex("76a914759d6677091e973b9e9d99f19c68fbf43e3f05f988ac")

# known-on-curve X coordinate (secp256k1 generator) for type 4/5 scripts
GEN_X = bytes.fromhex("79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798")


def _h20(rng: random.Random) -> bytes:
    return hashlib.sha256(rng.randbytes(8)).digest()[:20]


def synthetic_utxo_rows(
    n: int, *, seed: int = 42, eater_every: int = 50
) -> list[tuple[bytes, int, int, bool, int, bytes]]:
    """n rows of (txid32, vout, height, coinbase, amount, script).

    Script mix per FIXTURES.md §2: ~60% P2PKH, ~15% P2SH, ~5% compressed
    P2PK, ~2% uncompressed P2PK (valid curve point), rest raw (OP_RETURN /
    witness programs). Every ``eater_every``-th row uses EATER_SCRIPT.
    Rows cluster 1-20 per txid to exercise run-length grouping.
    """
    rng = random.Random(seed)
    rows = []
    i = 0
    while i < n:
        txid = hashlib.sha256(f"tx{seed}:{i}".encode()).digest()
        group = min(rng.randint(1, 20) if rng.random() < 0.3 else 1, n - i)
        for v in range(group):
            height = rng.randint(1, 900_000)
            coinbase = rng.random() < 0.01
            r = rng.random()
            if r < 0.3:
                amount = rng.choice([1, 546, 10_000, 100_000, 1_000_000, 100_000_000])
            elif r < 0.6:
                amount = rng.randint(0, 10) * 10 ** rng.randint(0, 8)
            else:
                amount = rng.randint(0, 2_000_000_000)
            s = rng.random()
            if (i + v) % eater_every == 0:
                script = EATER_SCRIPT
            elif s < 0.60:
                script = bytes([0x76, 0xA9, 20]) + _h20(rng) + bytes([0x88, 0xAC])
            elif s < 0.75:
                script = bytes([0xA9, 20]) + _h20(rng) + bytes([0x87])
            elif s < 0.80:
                script = bytes([33, rng.choice([2, 3])]) + hashlib.sha256(rng.randbytes(8)).digest() + bytes([0xAC])
            elif s < 0.82:
                # valid uncompressed P2PK (reuses the generator X; decompression
                # path is exercised, payload validity guaranteed)
                from ..kernels.script import decompress_pubkey

                pub = decompress_pubkey(rng.choice([2, 3]), GEN_X)
                script = bytes([65]) + pub + bytes([0xAC])
            elif s < 0.90:
                script = b"\x6a" + bytes([rng.randint(1, 40)])  # OP_RETURN-ish
                script += rng.randbytes(script[1])
            else:
                script = bytes([0x00, 0x14]) + _h20(rng)  # witness v0
            rows.append((txid, v, height, coinbase, amount, script))
        i += group
    return rows[:n]

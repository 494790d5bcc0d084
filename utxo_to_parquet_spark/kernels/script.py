"""Bitcoin Core script (de)compression.

Matches the semantics of /root/reference/src/main.rs:109-161: a
script-length core-varint < 6 selects a compressed special form, else the
raw scriptPubKey of ``len - 6`` bytes follows.

Special forms:

| type | payload | reconstructed script |
|---|---|---|
| 0 | 20-byte pubkey hash | P2PKH ``76a914 <20B> 88ac`` |
| 1 | 20-byte script hash | P2SH  ``a914 <20B> 87`` |
| 2,3 | 32-byte X coord | P2PK with compressed pubkey ``21 <type,X> ac`` |
| 4,5 | 32-byte X coord | P2PK with pubkey decompressed to 65 bytes ``41 04<X><Y> ac`` |

Types 4/5 need a secp256k1 point decompression (modular square root);
implemented in pure Python below — p ≡ 3 (mod 4) so sqrt is one pow().
"""

from __future__ import annotations

from functools import lru_cache

from .varint import read_core_varint, write_core_varint

SPECIAL_SCRIPTS = 6

# secp256k1 field prime and curve b (y^2 = x^3 + 7)
_P = 2**256 - 2**32 - 977
_B = 7

OP_DUP = 0x76
OP_HASH160 = 0xA9
OP_EQUALVERIFY = 0x88
OP_EQUAL = 0x87
OP_CHECKSIG = 0xAC


@lru_cache(maxsize=1 << 16)
def decompress_pubkey(prefix: int, x_bytes: bytes) -> bytes:
    """(prefix in {2,3}, 32-byte X) → 65-byte uncompressed SEC pubkey.

    Solves y^2 = x^3 + 7 over GF(p); picks the root whose parity matches
    ``prefix`` (2=even, 3=odd). Raises ValueError if X is not on the curve.

    Cached: the modular sqrt is ~150µs of bigint pow, and real UTXO sets
    repeat pubkeys across outputs, so the cache turns the per-row cost
    into a per-distinct-key cost.
    """
    if prefix not in (2, 3):
        raise ValueError(f"bad compressed pubkey prefix {prefix}")
    x = int.from_bytes(x_bytes, "big")
    if x >= _P:
        raise ValueError("pubkey X coordinate out of field range")
    y_sq = (pow(x, 3, _P) + _B) % _P
    y = pow(y_sq, (_P + 1) // 4, _P)
    if (y * y) % _P != y_sq:
        raise ValueError("X coordinate is not on the secp256k1 curve")
    if y & 1 != prefix & 1:
        y = _P - y
    return b"\x04" + x_bytes + y.to_bytes(32, "big")


def decompress_script(script_type: int, payload: bytes) -> bytes:
    """Reconstruct a canonical script from its compressed special form.

    Mirrors /root/reference/src/main.rs:131-161 (assertion included: the
    result must be canonical p2pk/p2pkh/p2sh).
    """
    if script_type == 0:
        if len(payload) != 20:
            raise ValueError("P2PKH payload must be 20 bytes")
        return bytes([OP_DUP, OP_HASH160, 20]) + payload + bytes([OP_EQUALVERIFY, OP_CHECKSIG])
    if script_type == 1:
        if len(payload) != 20:
            raise ValueError("P2SH payload must be 20 bytes")
        return bytes([OP_HASH160, 20]) + payload + bytes([OP_EQUAL])
    if script_type in (2, 3):
        if len(payload) != 32:
            raise ValueError("compressed P2PK payload must be 32 bytes")
        return bytes([33, script_type]) + payload + bytes([OP_CHECKSIG])
    if script_type in (4, 5):
        if len(payload) != 32:
            raise ValueError("uncompressed P2PK payload must be 32 bytes")
        pubkey = decompress_pubkey(script_type - 2, payload)
        return bytes([65]) + pubkey + bytes([OP_CHECKSIG])
    raise ValueError(f"unknown special script type {script_type}")


def decode_script(buf, pos: int) -> tuple[bytes, int]:
    """Decode one compressed script at ``buf[pos:]`` → (script_bytes, new_pos).

    Mirrors /root/reference/src/main.rs:111-129.
    """
    length, pos = read_core_varint(buf, pos)
    if length < SPECIAL_SCRIPTS:
        size = 20 if length in (0, 1) else 32
        payload = bytes(buf[pos : pos + size])
        if len(payload) != size:
            raise ValueError("truncated compressed script payload")
        return decompress_script(length, payload), pos + size
    size = length - SPECIAL_SCRIPTS
    raw = bytes(buf[pos : pos + size])
    if len(raw) != size:
        raise ValueError("truncated raw script")
    return raw, pos + size


def compress_script(script: bytes) -> bytes:
    """Serialize a script in Bitcoin Core's compressed form (inverse of
    :func:`decode_script`'s payload). Used by the fixture dump writer.

    Detects the canonical templates; everything else is written raw with
    the length biased by SPECIAL_SCRIPTS.
    """
    n = len(script)
    if (
        n == 25
        and script[0] == OP_DUP
        and script[1] == OP_HASH160
        and script[2] == 20
        and script[23] == OP_EQUALVERIFY
        and script[24] == OP_CHECKSIG
    ):
        return write_core_varint(0) + script[3:23]
    if n == 23 and script[0] == OP_HASH160 and script[1] == 20 and script[22] == OP_EQUAL:
        return write_core_varint(1) + script[2:22]
    if n == 35 and script[0] == 33 and script[1] in (2, 3) and script[34] == OP_CHECKSIG:
        return write_core_varint(script[1]) + script[2:34]
    if n == 67 and script[0] == 65 and script[1] == 4 and script[66] == OP_CHECKSIG:
        y = int.from_bytes(script[34:66], "big")
        return write_core_varint(4 + (y & 1)) + script[2:34]
    return write_core_varint(n + SPECIAL_SCRIPTS) + script


__all__ = [
    "SPECIAL_SCRIPTS",
    "decompress_pubkey",
    "decompress_script",
    "decode_script",
    "compress_script",
]

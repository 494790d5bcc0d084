"""Bitcoin address encoding: script → human-readable address.

The reference displays addresses only through external explorers
(README.md:52-107 cross-references mempool.space); this kernel computes
them in-engine so address-level analytics need no third party. Pure
Python (base58check is bigint arithmetic + double-sha256), wrapped in a
pandas UDF by operators/utxo_queries.py.

Covers the script templates the reference emits (main.rs:131-161):
P2PKH (version 0x00), P2SH (version 0x05), and P2PK (no address form —
by convention the pubkey's P2PKH address is returned). Non-template
scripts yield None.
"""

from __future__ import annotations

import hashlib

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def base58check_encode(version: int, payload: bytes) -> str:
    """Base58Check: version byte + payload + 4-byte double-sha256 checksum."""
    raw = bytes([version]) + payload
    checksum = hashlib.sha256(hashlib.sha256(raw).digest()).digest()[:4]
    raw += checksum
    n = int.from_bytes(raw, "big")
    out = []
    while n > 0:
        n, rem = divmod(n, 58)
        out.append(_B58_ALPHABET[rem])
    # leading zero bytes encode as '1's
    for b in raw:
        if b == 0:
            out.append("1")
        else:
            break
    return "".join(reversed(out))


def _hash160(data: bytes) -> bytes:
    h = hashlib.new("ripemd160")
    h.update(hashlib.sha256(data).digest())
    return h.digest()


def script_to_address(script: bytes) -> str | None:
    """Canonical-template script → mainnet address, else None."""
    n = len(script)
    if n == 25 and script[0] == 0x76 and script[1] == 0xA9 and script[2] == 20 \
            and script[23] == 0x88 and script[24] == 0xAC:
        return base58check_encode(0x00, script[3:23])  # P2PKH
    if n == 23 and script[0] == 0xA9 and script[1] == 20 and script[22] == 0x87:
        return base58check_encode(0x05, script[2:22])  # P2SH
    if n == 35 and script[0] == 33 and script[34] == 0xAC:
        return base58check_encode(0x00, _hash160(script[1:34]))  # P2PK compressed
    if n == 67 and script[0] == 65 and script[66] == 0xAC:
        return base58check_encode(0x00, _hash160(script[1:66]))  # P2PK uncompressed
    return None


__all__ = ["base58check_encode", "script_to_address"]

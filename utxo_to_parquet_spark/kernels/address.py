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
    return witness_script_to_address(script)  # bech32 for witness v0, else None


__all__ = ["base58check_encode", "script_to_address"]


# --- bech32 (BIP-173) for native segwit v0 scripts -------------------------

_BECH32_CHARSET = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
_BECH32_GEN = (0x3B6A57B2, 0x26508E6D, 0x1EA119FA, 0x3D4233DD, 0x2A1462B3)


def _bech32_polymod(values: list[int]) -> int:
    chk = 1
    for v in values:
        b = chk >> 25
        chk = ((chk & 0x1FFFFFF) << 5) ^ v
        for i in range(5):
            if (b >> i) & 1:
                chk ^= _BECH32_GEN[i]
    return chk


def _bech32_hrp_expand(hrp: str) -> list[int]:
    return [ord(c) >> 5 for c in hrp] + [0] + [ord(c) & 31 for c in hrp]


def _convertbits(data: bytes, frombits: int, tobits: int) -> list[int]:
    acc = 0
    bits = 0
    out = []
    maxv = (1 << tobits) - 1
    for b in data:
        acc = (acc << frombits) | b
        bits += frombits
        while bits >= tobits:
            bits -= tobits
            out.append((acc >> bits) & maxv)
    if bits:
        out.append((acc << (tobits - bits)) & maxv)
    return out


def bech32_encode(hrp: str, witver: int, witprog: bytes) -> str:
    """BIP-173 segwit address encoding (witness v0; bech32 checksum)."""
    data = [witver] + _convertbits(witprog, 8, 5)
    values = _bech32_hrp_expand(hrp) + data
    polymod = _bech32_polymod(values + [0] * 6) ^ 1
    checksum = [(polymod >> 5 * (5 - i)) & 31 for i in range(6)]
    return hrp + "1" + "".join(_BECH32_CHARSET[d] for d in data + checksum)


def witness_script_to_address(script: bytes, hrp: str = "bc") -> str | None:
    """OP_0 PUSH20/PUSH32 witness program → bech32 address, else None."""
    if len(script) >= 2 and script[0] == 0x00 and script[1] == len(script) - 2 \
            and len(script) - 2 in (20, 32):
        return bech32_encode(hrp, 0, script[2:])
    return None


__all__ += ["bech32_encode", "witness_script_to_address"]

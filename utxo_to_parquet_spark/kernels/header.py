"""``dumptxoutset`` snapshot header parse/build.

Format (reference: /root/reference/src/main.rs:171-196):
5-byte magic ``b"utxo\\xff"`` · u16 LE version · 4-byte network magic ·
32-byte block hash · u64 LE UTXO count. Total 51 bytes.
"""

from __future__ import annotations

from dataclasses import dataclass

MAGIC = b"utxo\xff"
HEADER_LEN = 51

NETWORK_MAGICS = {
    bytes.fromhex("f9beb4d9"): "mainnet",
    bytes.fromhex("0b110907"): "testnet",
    bytes.fromhex("fabfb5da"): "regtest",
    bytes.fromhex("0a03cf40"): "signet",
}


@dataclass(frozen=True)
class UtxoHeader:
    version: int
    network: str
    block_hash: bytes  # 32 bytes, internal byte order
    num_utxos: int

    @property
    def block_hash_hex(self) -> str:
        """Display form: byte-reversed hex (Bitcoin convention)."""
        return self.block_hash[::-1].hex()


def parse_header(buf) -> UtxoHeader:
    """Parse the 51-byte snapshot header; raises ValueError on bad magic
    or unknown network (mirrors the asserts at main.rs:174,180-183)."""
    if len(buf) < HEADER_LEN:
        raise ValueError("truncated snapshot header")
    if bytes(buf[:5]) != MAGIC:
        raise ValueError(f"bad snapshot magic {bytes(buf[:5])!r}")
    version = int.from_bytes(buf[5:7], "little")
    net_magic = bytes(buf[7:11])
    network = NETWORK_MAGICS.get(net_magic)
    if network is None:
        raise ValueError(f"unknown network magic {net_magic.hex()}")
    block_hash = bytes(buf[11:43])
    num_utxos = int.from_bytes(buf[43:51], "little")
    return UtxoHeader(version, network, block_hash, num_utxos)


def build_header(
    num_utxos: int,
    *,
    version: int = 2,
    network: str = "mainnet",
    block_hash: bytes = b"\x00" * 32,
) -> bytes:
    """Serialize a snapshot header (fixture generation)."""
    magic = next(m for m, n in NETWORK_MAGICS.items() if n == network)
    if len(block_hash) != 32:
        raise ValueError("block hash must be 32 bytes")
    return MAGIC + version.to_bytes(2, "little") + magic + block_hash + num_utxos.to_bytes(8, "little")

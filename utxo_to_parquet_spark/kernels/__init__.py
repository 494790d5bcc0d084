"""Pure-Python decode kernels for Bitcoin Core's ``dumptxoutset`` format.

These are the only non-trivial scalar computations in the reference
(/root/reference/src/main.rs); everything else is plumbing Spark owns.
No Spark imports here — the kernels are unit-tested standalone and then
used inside the source's partition-level decode tasks.
"""

from .varint import (
    read_core_varint,
    write_core_varint,
    read_consensus_varint,
    write_consensus_varint,
)
from .amount import compress_amount, decompress_amount
from .script import (
    compress_script,
    decode_script,
    decompress_script,
    decompress_pubkey,
)
from .header import UtxoHeader, parse_header, build_header

__all__ = [
    "read_core_varint",
    "write_core_varint",
    "read_consensus_varint",
    "write_consensus_varint",
    "compress_amount",
    "decompress_amount",
    "compress_script",
    "decode_script",
    "decompress_script",
    "decompress_pubkey",
    "UtxoHeader",
    "parse_header",
    "build_header",
]

"""Pure-Python WAV (RIFF/WAVE, PCM) codec.

The container has no native audio libraries, so this lets the multimodal
pipeline (operators/multimodal.py) run a REAL audio-container decode
end-to-end — the same role kernels/image.py plays for the image
modality. It is not a toy: the writer emits a spec-correct RIFF file
(canonical ``fmt `` chunk, a deliberately-present ancillary ``LIST``
chunk, word-aligned chunk padding), and the reader is a proper RIFF
chunk WALKER — it verifies the RIFF/WAVE framing, skips unknown chunks
by their declared size (honoring the odd-size pad byte the spec
requires), and cross-checks the ``fmt `` fields against the ``data``
payload — so a parser that assumed fixed offsets, forgot pad bytes, or
trusted byte counts over block alignment fails loudly here.

Integer PCM (format tag 1) plus the two G.711 companded forms the
telephony world ships as WAV — mu-law (tag 7) and A-law (tag 6), both
pure integer transforms implemented in kernels/g711.py — are
supported; perceptual formats (MP3-in-WAV, ...) genuinely require
native codecs and stay behind the documented stub in multimodal.py.

No Spark imports: unit-testable standalone, callable from pandas UDFs.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav"]

_FMT_PCM = 1
_FMT_ALAW = 6
_FMT_ULAW = 7


def encode_wav(
    samples: np.ndarray,
    sample_rate: int,
    *,
    with_list_chunk: bool = True,
    codec: str = "pcm16",
) -> bytes:
    """int16 array (n,) mono or (n, ch) -> RIFF/WAVE.

    ``codec``: "pcm16" (format tag 1, 16-bit), "ulaw" (tag 7) or "alaw"
    (tag 6) — the G.711 forms compand each sample to 8 bits via
    kernels/g711.py before framing. ``with_list_chunk`` inserts an
    ancillary LIST/INFO chunk (with an ODD-sized payload, so the spec's
    pad byte is exercised) between ``fmt `` and ``data`` — decoders
    must skip it by size, not assume the canonical 44-byte layout.
    """
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"expected (n,) or (n, ch) samples, got {arr.shape}")
    n, ch = arr.shape
    if ch < 1 or ch > 8:
        raise ValueError(f"unreasonable channel count {ch}")
    if codec == "pcm16":
        tag, bits, payload = _FMT_PCM, 16, arr.tobytes()
    elif codec in ("ulaw", "alaw"):
        from .g711 import encode_alaw, encode_ulaw

        comp = encode_ulaw(arr) if codec == "ulaw" else encode_alaw(arr)
        tag = _FMT_ULAW if codec == "ulaw" else _FMT_ALAW
        bits, payload = 8, comp.astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported codec {codec!r}")
    block_align = ch * (bits // 8)
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", tag, ch, sample_rate, byte_rate, block_align, bits
    )
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    if with_list_chunk:
        info = b"INFOISFT\x0bwavkernel\x00"  # odd-length payload (19)
        chunks.append(b"LIST" + struct.pack("<I", len(info)) + info)
        if len(info) % 2:
            chunks.append(b"\x00")  # RIFF word-alignment pad byte
    data = payload
    chunks.append(b"data" + struct.pack("<I", len(data)) + data)
    if len(data) % 2:
        chunks.append(b"\x00")
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE bytes -> (sample_rate, n_channels, int16 array (n, ch)).

    G.711 payloads (tags 6/7) are expanded to linear int16.

    Walks the chunk list: RIFF framing verified, unknown chunks skipped
    by declared size + pad byte, ``fmt `` must precede ``data``, and the
    data length must be a whole number of sample frames.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise ValueError(
            f"RIFF size {riff_size} overruns payload of {len(payload)} bytes"
        )
    if payload[8:12] != b"WAVE":
        raise ValueError(f"not a WAVE form: {payload[8:12]!r}")
    off, end = 12, 8 + riff_size
    fmt_fields = None
    while off + 8 <= end:
        cid = payload[off : off + 4]
        (csize,) = struct.unpack_from("<I", payload, off + 4)
        body = payload[off + 8 : off + 8 + csize]
        if len(body) != csize:
            raise ValueError(f"chunk {cid!r} truncated: {len(body)}/{csize}")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError(f"fmt chunk too short ({csize})")
            fmt_fields = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            if fmt_fields is None:
                raise ValueError("data chunk before fmt chunk")
            tag, ch, rate, _byte_rate, block_align, bits = fmt_fields
            if tag == _FMT_PCM:
                want_bits, width = 16, 2
            elif tag in (_FMT_ULAW, _FMT_ALAW):
                want_bits, width = 8, 1
            else:
                raise ValueError(f"unsupported WAVE format tag {tag}")
            if bits != want_bits:
                raise ValueError(
                    f"format tag {tag} requires {want_bits}-bit samples,"
                    f" got {bits}-bit"
                )
            if block_align != ch * width:
                raise ValueError(
                    f"block align {block_align} != channels*{width}"
                    f" ({ch * width})"
                )
            if csize % block_align:
                raise ValueError(
                    f"data size {csize} is not whole frames of {block_align}"
                )
            if tag == _FMT_PCM:
                arr = np.frombuffer(body, dtype="<i2").reshape(-1, ch)
            else:
                from .g711 import decode_alaw, decode_ulaw

                comp = np.frombuffer(body, dtype=np.uint8)
                pcm = (
                    decode_ulaw(comp) if tag == _FMT_ULAW else decode_alaw(comp)
                )
                arr = pcm.reshape(-1, ch)
            return rate, ch, arr
        # unknown/ancillary chunk: skip by size (+ spec pad byte)
        off += 8 + csize + (csize % 2)
    raise ValueError("no data chunk found")

"""Pure-Python G.711 (mu-law / A-law) and IMA ADPCM audio codecs.

The container has no native audio codecs, so these close the
"compressed WAVE formats" half of the audio modality that
operators/multimodal.py previously stubbed: G.711 companding and IMA
ADPCM are pure INTEGER transforms (ITU-T G.711 tables; IMA
"Recommended Practices for Enhancing Digital Audio Compatibility",
rev 3.00), so they need no native library — unlike MP3/AAC, which stay
stubbed. Algorithms are written from the public specs; the widely
published reference C (Sun's public-domain g711.c shape) fixes the
constants (BIAS 0x84, CLIP 32635, the 0x55 A-law toggle).

All functions are vectorized numpy except the ADPCM loop, which is
inherently sequential per stream (every step's quantizer state depends
on the previous sample) and runs as a bounded Python loop inside the
Arrow-batched ``mapInPandas`` operators — per-document streams are
independent, so the parallelism is across documents, never within one.

No Spark imports: unit-testable standalone, callable from pandas UDFs.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_ulaw",
    "decode_ulaw",
    "encode_alaw",
    "decode_alaw",
    "ima_adpcm_encode",
    "ima_adpcm_decode",
    "IMA_STEP_TABLE",
    "IMA_INDEX_TABLE",
]

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def _exponent(m: np.ndarray) -> np.ndarray:
    """Segment number: position of the MSB of (m >> 7) within 0..7."""
    e = np.zeros(m.shape, dtype=np.int32)
    seg = (m >> 7).astype(np.int32)
    for k in range(7, 0, -1):
        e = np.where((seg >> k) != 0, np.maximum(e, k), e)
    return e


def encode_ulaw(pcm: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> uint8 mu-law (G.711, BIAS 0x84, CLIP 32635)."""
    x = np.asarray(pcm, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0).astype(np.int32)
    m = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    exp = _exponent(m)
    mant = (m >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def decode_ulaw(code: np.ndarray) -> np.ndarray:
    """uint8 mu-law -> int16 linear PCM (segment midpoint expansion)."""
    u = (~np.asarray(code, dtype=np.int32)) & 0xFF
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    t = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(u & 0x80, -t, t).astype(np.int16)


def encode_alaw(pcm: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> uint8 A-law (G.711, 0x55 toggle).

    Bit-interoperable with the published Sun/ITU reference C
    (g711.c ``linear2alaw``): the encoder works on the 13-bit
    magnitude ``x >> 3``, ONE'S-COMPLEMENTED for negatives
    (``(-x - 1) >> 3``, i.e. ``~x >> 3``) before the segment search —
    negative quantization cells are shifted by one relative to
    ``|x|``, which is what standard A-law codecs emit at negative
    segment boundaries. Segments 0 and 1 are both linear with mantissa
    shift 1; A-law marks POSITIVE samples with the 0x80 bit (the
    opposite of mu-law) and has no bias.
    """
    x = np.asarray(pcm, dtype=np.int32)
    mask = np.where(x >= 0, 0xD5, 0x55).astype(np.int32)
    p = np.where(x >= 0, x, ~x) >> 3  # 13-bit, one's-complement for x < 0
    exp = _exponent(p << 3)
    mant = (p >> np.maximum(exp, 1)) & 0x0F
    return (((exp << 4) | mant) ^ mask).astype(np.uint8)


def decode_alaw(code: np.ndarray) -> np.ndarray:
    """uint8 A-law -> int16 linear PCM (segment midpoint expansion)."""
    u = np.asarray(code, dtype=np.int32) ^ 0x55
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    t = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 264) << (exp - 1))
    return np.where(u & 0x80, t, -t).astype(np.int16)


# IMA ADPCM quantizer tables (IMA Digital Audio Compatibility rev 3.00)
IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def ima_adpcm_encode(
    pcm: np.ndarray, *, predictor: int = 0, index: int = 0
) -> tuple[np.ndarray, int, int]:
    """int16 PCM -> (uint8 4-bit nibbles, final predictor, final index).

    The encoder's reconstructed predictor IS the decoder's output, so
    decode(encode(x)) equals the predictor trajectory exactly — the
    property the oracle-gated operator checks sample-by-sample.
    """
    pred, idx = int(predictor), int(index)
    out = np.empty(len(pcm), dtype=np.uint8)
    for j, xv in enumerate(np.asarray(pcm, dtype=np.int64)):
        step = IMA_STEP_TABLE[idx]
        diff = int(xv) - pred
        delta = 8 if diff < 0 else 0
        diff = abs(diff)
        if diff >= step:
            delta |= 4
            diff -= step
        if diff >= step >> 1:
            delta |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            delta |= 1
        vpdiff = step >> 3
        if delta & 4:
            vpdiff += step
        if delta & 2:
            vpdiff += step >> 1
        if delta & 1:
            vpdiff += step >> 2
        pred = pred - vpdiff if delta & 8 else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + IMA_INDEX_TABLE[delta & 7]))
        out[j] = delta
    return out, pred, idx


def ima_adpcm_decode(
    nibbles: np.ndarray, *, predictor: int = 0, index: int = 0
) -> np.ndarray:
    """uint8 4-bit nibbles -> int16 PCM (mirrors the encoder's state)."""
    pred, idx = int(predictor), int(index)
    out = np.empty(len(nibbles), dtype=np.int16)
    for j, delta in enumerate(np.asarray(nibbles, dtype=np.int64)):
        step = IMA_STEP_TABLE[idx]
        vpdiff = step >> 3
        if delta & 4:
            vpdiff += step
        if delta & 2:
            vpdiff += step >> 1
        if delta & 1:
            vpdiff += step >> 2
        pred = pred - vpdiff if delta & 8 else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + IMA_INDEX_TABLE[int(delta) & 7]))
        out[j] = pred
    return out

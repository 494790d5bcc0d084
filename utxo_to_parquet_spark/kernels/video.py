"""Pure-Python Motion-JPEG AVI (RIFF) video codec.

Closes the video half of the multimodal stub for the one mainstream
video codec that needs NO native library: an MJPEG AVI is a RIFF
container (the same chunk discipline as kernels/audio.py's WAVE walker,
per the public AVI RIFF File Reference) whose ``movi`` list carries one
complete baseline JFIF image per frame — decoded here by the
independent T.81 decoder in kernels/image.py. Inter-frame codecs
(H.264, VP9, ...) genuinely require native decoders and remain behind
the documented stub in operators/multimodal.py.

The writer emits a spec-correct file: ``hdrl`` list with a 56-byte
``avih`` main header and a ``strl`` stream list (``strh`` with
fccType/fccHandler ``vids``/``MJPG`` and the scale/rate fps pair,
``strf`` BITMAPINFOHEADER with biCompression 'MJPG'), the ``movi`` list
of ``00dc`` frame chunks (word-aligned with the RIFF pad byte), and a
trailing ``idx1`` index. The reader is a strict parser: it walks chunks
by declared size, verifies the form types, cross-checks ``avih``
dimensions and frame count against both the stream header and the
actual decoded frames, and validates every ``idx1`` entry against the
real chunk offsets — so a writer or reader that forgot a pad byte,
miscounted a LIST header, or desynchronized the index fails loudly.

No Spark imports: unit-testable standalone, callable from pandas UDFs.
"""

from __future__ import annotations

import struct

import numpy as np

from .image import decode_jpeg, encode_jpeg

__all__ = ["encode_avi_mjpeg", "decode_avi_mjpeg"]


def _chunk(ckid: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return ckid + struct.pack("<I", len(data)) + data + pad


def _list(form: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", form + body)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 25, *, sampling: str = "4:4:4"
) -> bytes:
    """List of uint8 frames (all same (h, w) gray or (h, w, 3) RGB) ->
    MJPEG AVI bytes. Frames are encoded by kernels/image.py's baseline
    JFIF encoder (DC-exact on block-constant inputs — the property that
    makes the video gate hashable)."""
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")
    shape = frames[0].shape
    if any(f.shape != shape for f in frames):
        raise ValueError("all frames must share one shape")
    h, w = shape[0], shape[1]
    jpegs = [encode_jpeg(f, sampling=sampling) for f in frames]

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max(len(j) for j in jpegs),  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (fps = rate / scale)
            0,  # dwStart
            len(frames),  # dwLength
            max(len(j) for j in jpegs),  # dwSuggestedBufferSize
            0,  # dwQuality
            0,  # dwSampleSize
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", sum(len(j) for j in jpegs) // len(jpegs),
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = bytearray(b"movi")
    offsets = []  # idx1 offsets are relative to the 'movi' fourcc
    for j in jpegs:
        offsets.append(len(movi_body))
        movi_body += _chunk(b"00dc", j)
    movi = _chunk(b"LIST", bytes(movi_body))
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(j))
        for off, j in zip(offsets, jpegs)
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes) -> tuple[int, list[np.ndarray]]:
    """MJPEG AVI bytes -> (fps, list of decoded frames).

    Strict walk: RIFF/'AVI ' framing, ``avih``/``strh``/``strf``
    consistency (dimensions, frame count, MJPG handler, scale/rate),
    every ``00dc`` payload decoded by the real T.81 decoder, and each
    ``idx1`` entry checked against the actual chunk offset and size.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise ValueError(
            f"RIFF size {riff_size} overruns payload of {len(payload)}"
        )
    if payload[8:12] != b"AVI ":
        raise ValueError(f"not an AVI form: {payload[8:12]!r}")

    avih = strh = strf = None
    frames: list[np.ndarray] = []
    frame_meta: list[tuple[int, int]] = []  # (offset_in_movi, size)

    def walk(start: int, end: int, depth: int = 0) -> None:
        nonlocal avih, strh, strf
        off = start
        while off + 8 <= end:
            ckid = payload[off : off + 4]
            (csize,) = struct.unpack_from("<I", payload, off + 4)
            body_start = off + 8
            if body_start + csize > end:
                raise ValueError(f"chunk {ckid!r} overruns its parent list")
            if ckid == b"LIST":
                form = payload[body_start : body_start + 4]
                if form == b"movi":
                    movi_walk(body_start, body_start + csize)
                else:
                    walk(body_start + 4, body_start + csize, depth + 1)
            elif ckid == b"avih":
                avih = payload[body_start : body_start + csize]
            elif ckid == b"strh":
                strh = payload[body_start : body_start + csize]
            elif ckid == b"strf":
                strf = payload[body_start : body_start + csize]
            elif ckid == b"idx1":
                check_idx1(payload[body_start : body_start + csize])
            off = body_start + csize + (csize % 2)

    def movi_walk(start: int, end: int) -> None:
        # start points at the 'movi' fourcc
        off = start + 4
        while off + 8 <= end:
            ckid = payload[off : off + 4]
            (csize,) = struct.unpack_from("<I", payload, off + 4)
            if off + 8 + csize > end:
                raise ValueError("movi frame chunk overruns the list")
            if ckid == b"00dc":
                frame_meta.append((off - start, csize))
                _, _, px = decode_jpeg(payload[off + 8 : off + 8 + csize])
                frames.append(px)
            off += 8 + csize + (csize % 2)

    def check_idx1(body: bytes) -> None:
        if len(body) % 16:
            raise ValueError(f"idx1 size {len(body)} not a multiple of 16")
        n = len(body) // 16
        if n != len(frame_meta):
            raise ValueError(
                f"idx1 has {n} entries for {len(frame_meta)} frames"
            )
        for i in range(n):
            ckid = body[16 * i : 16 * i + 4]
            flags, ioff, isize = struct.unpack_from("<III", body, 16 * i + 4)
            if ckid != b"00dc":
                raise ValueError(f"idx1 entry {i} ckid {ckid!r}")
            if (ioff, isize) != frame_meta[i]:
                raise ValueError(
                    f"idx1 entry {i} ({ioff}, {isize}) != actual"
                    f" {frame_meta[i]}"
                )

    walk(12, 8 + riff_size)
    if avih is None or strh is None or strf is None:
        raise ValueError("AVI missing avih/strh/strf headers")
    fields = struct.unpack_from("<IIIIIIIIII", avih, 0)
    total_frames, streams, aw, ah = fields[4], fields[6], fields[8], fields[9]
    if streams != 1:
        raise ValueError(f"expected 1 stream, header says {streams}")
    if total_frames != len(frames):
        raise ValueError(
            f"avih says {total_frames} frames, movi carries {len(frames)}"
        )
    if strh[:4] != b"vids" or strh[4:8] != b"MJPG":
        raise ValueError(
            f"unsupported stream {strh[:4]!r}/{strh[4:8]!r} (want vids/MJPG)"
        )
    scale, rate = struct.unpack_from("<II", strh, 20)
    if scale == 0 or rate % scale:
        raise ValueError(f"non-integer fps rate/scale {rate}/{scale}")
    fps = rate // scale
    (slen,) = struct.unpack_from("<I", strh, 32)
    if slen != len(frames):
        raise ValueError(f"strh length {slen} != {len(frames)} frames")
    comp = strf[16:20]
    if comp != b"MJPG":
        raise ValueError(f"strf biCompression {comp!r} != MJPG")
    for i, px in enumerate(frames):
        fh, fw = px.shape[0], px.shape[1]
        if (fw, fh) != (aw, ah):
            raise ValueError(
                f"frame {i} is {fw}x{fh}, headers say {aw}x{ah}"
            )
    return fps, frames

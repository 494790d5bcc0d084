"""Pure-Python Motion-JPEG AVI (RIFF) video codec.

Closes the video half of the multimodal stub for the one mainstream
video codec that needs NO native library: an MJPEG AVI is a RIFF
container (the same chunk discipline as kernels/audio.py's WAVE walker,
per the public AVI RIFF File Reference) whose ``movi`` list carries one
complete baseline JFIF image per frame — decoded here by the
independent T.81 decoder in kernels/image.py. Round 12 adds the
INTER-FRAME half via BI_RLE8 AVI (see below): delta frames whose
skipped pixels persist from the previous frame. Motion-compensated DCT
codecs (H.264, VP9, AV1) genuinely require native decoders and remain
behind the documented stub in operators/multimodal.py.

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

__all__ = ["encode_avi_mjpeg", "decode_avi_mjpeg",
           "encode_avi_rle8", "decode_avi_rle8",
           "encode_avi_mc", "decode_avi_mc",
           "encode_avi_mc_b", "decode_avi_mc_b"]


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


# --- BI_RLE8 AVI: INTER-FRAME video through the published RLE8 spec ---------
#
# The BMP/AVI RLE8 encoding (Microsoft BITMAPINFOHEADER documentation,
# biCompression = BI_RLE8) is the one publicly-specified video coding
# with TEMPORAL prediction implementable without native libraries: its
# escape codes — end-of-line (00 00), end-of-bitmap (00 01) and DELTA
# (00 02 dx dy) — move the cursor WITHOUT writing, and in an AVI stream
# every skipped pixel retains the PREVIOUS FRAME's value. Delta frames
# therefore encode only what changed: real inter-frame compression,
# leaving only the motion-compensated DCT codecs (H.264/VP9/AV1)
# stubbed. Bottom-up rows, 8-bit palette indices, absolute mode
# (00 n>=3, word-padded) for non-repeating stretches.


def _rle8_encode_rows(rows_changed, cur) -> bytes:
    """RLE8-encode one frame given per-row change masks. ``rows_changed``
    iterates (y_from_bottom, [(x0, x1), ...]) with runs ascending over
    the bottom-up raster ``cur``; the cursor only ever moves right/up,
    via EOL and DELTA escapes."""
    out = bytearray()
    cx = cy = 0

    def move_to(x, y):
        nonlocal cx, cy
        if y > cy and cx > x:
            out.extend(b"\x00\x00")  # EOL: (0, cy+1)
            cx, cy = 0, cy + 1
        while y > cy:
            dy = min(y - cy, 255)
            out.extend(bytes([0, 2, 0, dy]))
            cy += dy
        while x > cx:
            dx = min(x - cx, 255)
            out.extend(bytes([0, 2, dx, 0]))
            cx += dx

    def emit_segment(vals):
        nonlocal cx
        # maximal equal runs; short (<3) neighbors merge into absolute
        # mode so both record kinds are exercised deterministically
        runs = []
        j = 0
        while j < len(vals):
            k = j
            while k < len(vals) and vals[k] == vals[j]:
                k += 1
            runs.append((k - j, int(vals[j])))
            j = k
        i = 0
        while i < len(runs):
            n, c = runs[i]
            if n >= 3:
                while n > 0:
                    take = min(n, 255)
                    out.extend(bytes([take, c]))
                    n -= take
                i += 1
                continue
            lit = []
            while i < len(runs) and runs[i][0] < 3:
                lit.extend([runs[i][1]] * runs[i][0])
                i += 1
            if len(lit) >= 3:
                j2 = 0
                while j2 < len(lit):
                    chunk = lit[j2 : j2 + 255]
                    if len(chunk) < 3:  # tail too short for absolute mode
                        for c2 in chunk:
                            out.extend(bytes([1, c2]))
                    else:
                        out.extend(bytes([0, len(chunk)]))
                        out.extend(bytes(chunk))
                        if len(chunk) % 2:
                            out.append(0)
                    j2 += 255
            else:
                for c2 in lit:
                    out.extend(bytes([1, c2]))
        cx += len(vals)

    for y, segs in rows_changed:
        for x0, x1 in segs:
            move_to(x0, y)
            emit_segment(cur[y, x0:x1].tolist())
    out.extend(b"\x00\x01")  # end of bitmap
    return bytes(out)


def _rle8_frame(prev: "np.ndarray | None", cur: np.ndarray) -> bytes:
    """One RLE8 frame payload: full coverage when ``prev`` is None
    (keyframe), else only the changed runs (delta frame)."""
    h, w = cur.shape
    flip = cur[::-1]  # bottom-up row order
    rows = []
    if prev is None:
        for y in range(h):
            rows.append((y, [(0, w)]))
    else:
        pflip = prev[::-1]
        for y in range(h):
            diff = flip[y] != pflip[y]
            if not diff.any():
                continue
            idx = np.nonzero(diff)[0]
            segs = []
            s = p = int(idx[0])
            for x in idx[1:]:
                x = int(x)
                if x == p + 1:
                    p = x
                else:
                    segs.append((s, p + 1))
                    s = p = x
            segs.append((s, p + 1))
            rows.append((y, segs))
    return _rle8_encode_rows(rows, flip)


def _rle8_apply(canvas: np.ndarray, data: bytes) -> None:
    """Apply one RLE8 frame to the persistent canvas in place (the
    decoder half of the spec walk); raises on any overrun."""
    h, w = canvas.shape
    x = y = 0  # y counts rows from the BOTTOM
    i = 0
    while True:
        if i + 2 > len(data):
            raise ValueError("truncated RLE8 stream (no end-of-bitmap)")
        a, b = data[i], data[i + 1]
        i += 2
        if a:  # encoded run
            if y >= h or x + a > w:
                raise ValueError("RLE8 run overruns the frame")
            canvas[h - 1 - y, x : x + a] = b
            x += a
        elif b == 0:  # end of line
            x, y = 0, y + 1
            if y > h:
                raise ValueError("RLE8 end-of-line past the top row")
        elif b == 1:  # end of bitmap
            if i != len(data):
                raise ValueError("trailing bytes after RLE8 end-of-bitmap")
            return
        elif b == 2:  # delta: skipped pixels keep the previous frame
            if i + 2 > len(data):
                raise ValueError("truncated RLE8 delta escape")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("RLE8 delta moves outside the frame")
        else:  # absolute mode, b >= 3 literals, word-padded
            if y >= h or x + b > w:
                raise ValueError("RLE8 absolute run overruns the frame")
            if i + b > len(data):
                raise ValueError("truncated RLE8 absolute run")
            canvas[h - 1 - y, x : x + b] = np.frombuffer(
                data[i : i + b], np.uint8
            )
            x += b
            i += b + (b % 2)


def encode_avi_rle8(frames: list, fps: int = 25) -> bytes:
    """List of full (h, w) uint8 gray canvases -> BI_RLE8 AVI bytes:
    frame 0 a keyframe, every later frame a DELTA frame carrying only
    the changed runs (cursor skips via EOL/delta escapes). Grayscale
    identity palette in strf; the keyframe alone gets AVIIF_KEYFRAME
    in idx1."""
    if not frames:
        raise ValueError("RLE8 AVI needs at least one frame")
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")
    shape = frames[0].shape
    if any(f.shape != shape or f.ndim != 2 for f in frames):
        raise ValueError("all frames must be 8-bit gray with one shape")
    h, w = shape
    payloads = []
    prev = None
    for f in frames:
        f = np.asarray(f, dtype=np.uint8)
        payloads.append(_rle8_frame(prev, f))
        prev = f
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1,
        max(len(p) for p in payloads), w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MRLE"
        + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0, 0, 0, 0, 1, fps, 0, len(frames),
            max(len(p) for p in payloads), 0, 0, 0, 0, w, h,
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 8, 1,  # biCompression = 1 = BI_RLE8
        sum(len(p) for p in payloads) // len(payloads), 0, 0, 256, 0,
    ) + b"".join(bytes([i, i, i, 0]) for i in range(256))  # gray RGBQUADs
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = bytearray(b"movi")
    offsets = []
    for p in payloads:
        offsets.append(len(movi_body))
        movi_body += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", bytes(movi_body))
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10 if i == 0 else 0, off, len(p))
        for i, (off, p) in enumerate(zip(offsets, payloads))
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_rle8(payload: bytes) -> tuple[int, list[np.ndarray]]:
    """BI_RLE8 AVI bytes -> (fps, composited (h, w) uint8 canvases).

    The INTER-FRAME half lives here: one persistent canvas is carried
    across frames, and each RLE8 payload only overwrites what it
    encodes — delta frames leave every skipped pixel at the previous
    frame's value. Strict walk: RIFF framing, avih/strh/strf
    consistency (MRLE handler, 8-bit BI_RLE8, gray identity palette),
    idx1 offsets/sizes verified and the keyframe flag pinned to frame
    0 only."""
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
    raw_frames: list[bytes] = []
    frame_meta: list[tuple[int, int]] = []

    def walk(start: int, end: int) -> None:
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
                    walk(body_start + 4, body_start + csize)
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
        off = start + 4
        while off + 8 <= end:
            ckid = payload[off : off + 4]
            (csize,) = struct.unpack_from("<I", payload, off + 4)
            if off + 8 + csize > end:
                raise ValueError("movi frame chunk overruns the list")
            if ckid == b"00dc":
                frame_meta.append((off - start, csize))
                raw_frames.append(payload[off + 8 : off + 8 + csize])
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
            want = 0x10 if i == 0 else 0
            if flags != want:
                raise ValueError(
                    f"idx1 entry {i} flags {flags:#x}: only the keyframe"
                    " carries AVIIF_KEYFRAME"
                )

    walk(12, 8 + riff_size)
    if avih is None or strh is None or strf is None:
        raise ValueError("AVI missing avih/strh/strf headers")
    fields = struct.unpack_from("<IIIIIIIIII", avih, 0)
    total_frames, streams, aw, ah = fields[4], fields[6], fields[8], fields[9]
    if streams != 1:
        raise ValueError(f"expected 1 stream, header says {streams}")
    if total_frames != len(raw_frames):
        raise ValueError(
            f"avih says {total_frames} frames, movi carries"
            f" {len(raw_frames)}"
        )
    if strh[:4] != b"vids" or strh[4:8] != b"MRLE":
        raise ValueError(
            f"unsupported stream {strh[:4]!r}/{strh[4:8]!r} (want vids/MRLE)"
        )
    scale, rate = struct.unpack_from("<II", strh, 20)
    if scale == 0 or rate % scale:
        raise ValueError(f"non-integer fps rate/scale {rate}/{scale}")
    fps = rate // scale
    size, bw, bh, planes, bpp, comp = struct.unpack_from("<IiiHHI", strf, 0)
    if (bw, abs(bh)) != (aw, ah):
        raise ValueError("strf dimensions contradict avih")
    if bpp != 8 or comp != 1:
        raise ValueError(
            f"expected 8-bit BI_RLE8 (got {bpp}-bit compression {comp})"
        )
    pal = strf[40 : 40 + 1024]
    if len(pal) != 1024 or any(
        pal[4 * i : 4 * i + 4] != bytes([i, i, i, 0]) for i in range(256)
    ):
        raise ValueError("RLE8 decoder expects the gray identity palette")
    canvas = np.zeros((ah, aw), dtype=np.uint8)
    out = []
    for raw in raw_frames:
        _rle8_apply(canvas, raw)
        out.append(canvas.copy())
    return fps, out


# --- MPEG-1-STYLE motion-compensated DCT video ("MC01") ----------------------
#
# The last video tier: temporal prediction with MOTION VECTORS plus a
# transform-coded residual — the architecture of every MPEG/H.26x codec
# (ISO/IEC 11172-2 §2.4: macroblock full-pel motion compensation, 8x8
# DCT of the prediction error, run/level entropy coding). This is an
# MPEG-1-STYLE SUBSET, not MPEG-1 bitstream syntax: the container is
# AVI (fourcc "MC01"), I-frames are complete baseline JFIF images
# (MPEG-1 intra coding IS JPEG-style — reusing kernels/image.py's T.81
# codec is the honest equivalence), and P-frames carry the scheme
# below with Exp-Golomb entropy coding (the H.264 §9.1 universal code)
# instead of MPEG's Huffman VLC tables. Real H.264/VP9/AV1 (sub-pel
# interpolation, in-loop filters, arithmetic coding) still need native
# decoders and remain behind the multimodal stub.
#
# P-frame bitstream (MSB-first bits, macroblocks in raster order):
#   per 16x16 macroblock:
#     1 bit   skip          1 = copy the co-located previous-frame MB
#                           (MPEG P-skip: MV (0,0), no residual)
#     se(dx2), se(dy2)      HALF-PEL-unit motion vector into the previous
#                           RECONSTRUCTED frame (always in-bounds; odd
#                           components take the MPEG-1 bilinear
#                           half-sample average with +1 rounding)
#     4 bits  cbp           coded-block pattern for the MB's four 8x8
#                           blocks in TL,TR,BL,BR order (bit 3 = TL)
#     per coded block:
#       ue(n)               number of nonzero quantized coefficients
#       n x (ue(run), se(level))   zigzag run-before gaps + levels
#   Quantization is the flat table QDC=8 / QAC=16 with round-half-away
#   (level = sign * floor(|X|/Q + 0.5)); the encoder is CLOSED-LOOP
#   (predicts from its own reconstruction), so encoder and decoder
#   reference frames are bit-identical and drift is impossible.

MC_QDC = 8   # DC step 8 == the T.81 DC-exact contract: a constant-c
# residual block has DC 8c, quantizes to level c, reconstructs to c
MC_QAC = 16
MC_SEARCH = 8  # full-pel search radius (candidates ordered by
# (|dx|+|dy|, dy, dx) — the deterministic tie-break)


class _MCBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bits: int, width: int) -> None:
        # O(1) arithmetic per call (round 15): the former per-bit loop
        # dominated P-frame entropy coding; this packs the same MSB-first
        # bit order byte-at-a-time
        acc = (self.acc << width) | (bits & ((1 << width) - 1))
        n = self.n + width
        while n >= 8:
            n -= 8
            self.buf.append((acc >> n) & 0xFF)
        self.acc = acc & ((1 << n) - 1)
        self.n = n

    def ue(self, v: int) -> None:  # Exp-Golomb, H.264 §9.1
        x = v + 1
        nb = x.bit_length()
        self.put(0, nb - 1)
        self.put(x, nb)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def flush(self) -> bytes:
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) & 0xFF)
            self.acc = self.n = 0
        return bytes(self.buf)


class _MCBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("MC01 bitstream truncated")
        b = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def ue(self) -> int:
        z = 0
        while self.bit() == 0:
            z += 1
            if z > 32:
                raise ValueError("MC01 Exp-Golomb prefix overrun")
        x = 1
        for _ in range(z):
            x = (x << 1) | self.bit()
        return x - 1

    def se(self) -> int:
        u = self.ue()
        return (u + 1) // 2 if u % 2 else -(u // 2)


def _mc_quant_table() -> "np.ndarray":
    q = np.full((8, 8), MC_QAC, dtype=np.float64)
    q[0, 0] = MC_QDC
    return q


def _mc_fdct(block: "np.ndarray") -> "np.ndarray":
    from .image import _IDCT_A

    return _IDCT_A @ block @ _IDCT_A.T


def _mc_idct(coef: "np.ndarray") -> "np.ndarray":
    from .image import _IDCT_A

    return _IDCT_A.T @ coef @ _IDCT_A


def _mc_pred(previ: "np.ndarray", y: int, x: int, dy2: int,
             dx2: int) -> "np.ndarray":
    """16x16 prediction at HALF-PEL motion vector (dy2, dx2) in
    half-sample units (MPEG-1 §2.4.4.2 bilinear half-sample
    interpolation with the standard +1 rounding). Even components are
    full-pel copies; odd components average the two (or four)
    straddled full-pel samples. Caller guarantees the support window
    is in-bounds."""
    py, px = y + (dy2 >> 1), x + (dx2 >> 1)
    hy, hx = dy2 & 1, dx2 & 1
    P = previ[py : py + 16 + hy, px : px + 16 + hx]
    if hx:
        P = (P[:, :-1] + P[:, 1:] + 1) >> 1
    if hy:
        P = (P[:-1, :] + P[1:, :] + 1) >> 1
    return P


def _mc_mv_inbounds(h: int, w: int, y: int, x: int, dy2: int,
                    dx2: int) -> bool:
    py, px = y + (dy2 >> 1), x + (dx2 >> 1)
    return (
        0 <= py and py + 16 + (dy2 & 1) <= h
        and 0 <= px and px + 16 + (dx2 & 1) <= w
    )


# full-pel candidate vectors per search radius, in the deterministic
# (|dx|+|dy|, dy, dx) order, as numpy arrays (round 15: the sorted list
# was rebuilt per frame, and the per-candidate SAD loop below replaced
# with one vectorized gather)
_MC_CAND_CACHE: dict = {}


def _mc_cands(search: int):
    hit = _MC_CAND_CACHE.get(search)
    if hit is None:
        cands = sorted(
            ((2 * dx, 2 * dy) for dx in range(-search, search + 1)
             for dy in range(-search, search + 1)),
            key=lambda v: (abs(v[0]) + abs(v[1]), v[1], v[0]),
        )
        dx2 = np.array([c[0] for c in cands], dtype=np.int64)
        dy2 = np.array([c[1] for c in cands], dtype=np.int64)
        hit = _MC_CAND_CACHE[search] = (dx2, dy2)
    return hit


# per-(frame geometry, MB position) in-bounds candidate coordinates;
# bounded by the handful of distinct geometries a corpus uses
_MC_GEOM_CACHE: dict = {}


def _mc_search_fullpel(refi: "np.ndarray", mb: "np.ndarray", y: int,
                       x: int, search: int,
                       wins: "np.ndarray | None" = None
                       ) -> tuple[tuple[int, int], int]:
    """Vectorized full-pel SAD search: one strided gather of every
    in-bounds candidate window, one abs-diff-sum over the stack. The
    winner is IDENTICAL to the sequential strict-improvement scan —
    candidates keep the deterministic (|dx|+|dy|, dy, dx) order and
    argmin returns the first minimum in that order. ``wins`` lets the
    caller hoist the sliding-window view to once per frame."""
    h, w = refi.shape
    key = (h, w, y, x, search)
    g = _MC_GEOM_CACHE.get(key)
    if g is None:
        dx2, dy2 = _mc_cands(search)
        py = y + (dy2 >> 1)
        px = x + (dx2 >> 1)
        valid = (py >= 0) & (py + 16 <= h) & (px >= 0) & (px + 16 <= w)
        g = _MC_GEOM_CACHE[key] = (
            py[valid], px[valid], dx2[valid], dy2[valid]
        )
    vy, vx, vdx, vdy = g
    if wins is None:
        wins = np.lib.stride_tricks.sliding_window_view(refi, (16, 16))
    sads = np.abs(wins[vy, vx] - mb).sum(axis=(1, 2))
    i = int(np.argmin(sads))
    return (int(vdx[i]), int(vdy[i])), int(sads[i])


def _mc_encode_pframe(prev: "np.ndarray", cur: "np.ndarray",
                      search: int, halfpel: bool = False
                      ) -> tuple[bytes, "np.ndarray"]:
    """One P-frame: returns (payload, reconstruction). ``prev`` is the
    previous RECONSTRUCTED frame (closed loop). Motion vectors are
    coded in HALF-PEL units; with ``halfpel`` the full-pel search
    winner is refined over its 8 half-sample neighbors (the classic
    two-stage search), else vectors stay full-pel."""
    from .image import _JPEG_ZZ_FLAT

    h, w = cur.shape
    q = _mc_quant_table()
    zz = _JPEG_ZZ_FLAT
    bw_ = _MCBitWriter()
    recon = np.empty_like(cur)
    previ = prev.astype(np.int32)
    curi = cur.astype(np.int32)
    pwins = np.lib.stride_tricks.sliding_window_view(previ, (16, 16))
    for y in range(0, h, 16):
        for x in range(0, w, 16):
            mb = curi[y : y + 16, x : x + 16]
            if (mb == previ[y : y + 16, x : x + 16]).all():
                bw_.put(1, 1)  # P-skip
                recon[y : y + 16, x : x + 16] = prev[y : y + 16, x : x + 16]
                continue
            best, best_sad = _mc_search_fullpel(
                previ, mb, y, x, search, wins=pwins
            )
            if halfpel:
                # refine around the full-pel winner: strict improvement
                # only, ties resolved by the deterministic key order
                fx, fy = best
                refine = sorted(
                    ((fx + rx, fy + ry) for rx in (-1, 0, 1)
                     for ry in (-1, 0, 1)),
                    key=lambda v: (abs(v[0]) + abs(v[1]), v[1], v[0]),
                )
                best, best_sad = None, None
                for dx2, dy2 in refine:
                    if not _mc_mv_inbounds(h, w, y, x, dy2, dx2):
                        continue
                    sad = int(
                        np.abs(mb - _mc_pred(previ, y, x, dy2, dx2)).sum()
                    )
                    if best_sad is None or sad < best_sad:
                        best, best_sad = (dx2, dy2), sad
            dx2, dy2 = best
            pred = _mc_pred(previ, y, x, dy2, dx2)
            resid = (mb - pred).astype(np.float64)
            levels = []
            cbp = 0
            for bi, (by, bx) in enumerate(
                ((0, 0), (0, 8), (8, 0), (8, 8))
            ):
                X = _mc_fdct(resid[by : by + 8, bx : bx + 8]) / q
                lv = (np.sign(X) * np.floor(np.abs(X) + 0.5)).astype(
                    np.int64
                )
                lvzz = lv.reshape(64)[zz]
                levels.append(lvzz)
                if lvzz.any():
                    cbp |= 1 << (3 - bi)
            bw_.put(0, 1)
            bw_.se(dx2)
            bw_.se(dy2)
            bw_.put(cbp, 4)
            rec = pred.astype(np.float64)
            for bi, (by, bx) in enumerate(
                ((0, 0), (0, 8), (8, 0), (8, 8))
            ):
                lvzz = levels[bi]
                if not (cbp >> (3 - bi)) & 1:
                    continue
                nz = np.nonzero(lvzz)[0]
                bw_.ue(len(nz))
                last = -1
                for k in nz:
                    bw_.ue(int(k - last - 1))
                    bw_.se(int(lvzz[k]))
                    last = int(k)
                deq = np.zeros(64)
                deq[zz[nz]] = lvzz[nz] * q.reshape(64)[zz[nz]]
                rec[by : by + 8, bx : bx + 8] += _mc_idct(deq.reshape(8, 8))
            recon[y : y + 16, x : x + 16] = np.clip(
                np.round(rec), 0, 255
            ).astype(np.uint8)
    return bw_.flush(), recon


def _mc_decode_pframe(prev: "np.ndarray", payload: bytes) -> "np.ndarray":
    from .image import _JPEG_ZZ_FLAT

    h, w = prev.shape
    q = _mc_quant_table()
    zz = _JPEG_ZZ_FLAT
    br = _MCBitReader(payload)
    recon = np.empty_like(prev)
    previ = prev.astype(np.int32)
    for y in range(0, h, 16):
        for x in range(0, w, 16):
            if br.bit():  # P-skip
                recon[y : y + 16, x : x + 16] = prev[y : y + 16, x : x + 16]
                continue
            dx2 = br.se()
            dy2 = br.se()
            if not _mc_mv_inbounds(h, w, y, x, dy2, dx2):
                raise ValueError(
                    f"MC01 motion vector ({dx2},{dy2}) [half-pel] leaves"
                    f" the frame at macroblock ({x},{y})"
                )
            cbp = 0
            for _ in range(4):
                cbp = (cbp << 1) | br.bit()
            rec = _mc_pred(previ, y, x, dy2, dx2).astype(np.float64)
            for bi, (by, bx) in enumerate(
                ((0, 0), (0, 8), (8, 0), (8, 8))
            ):
                if not (cbp >> (3 - bi)) & 1:
                    continue
                n = br.ue()
                if not 1 <= n <= 64:
                    raise ValueError(f"MC01 coded block with {n} coeffs")
                deq = np.zeros(64)
                k = -1
                for _ in range(n):
                    k += br.ue() + 1
                    if k > 63:
                        raise ValueError("MC01 zigzag run overruns block")
                    lv = br.se()
                    if lv == 0:
                        raise ValueError("MC01 zero level is not codable")
                    deq[zz[k]] = lv * q.reshape(64)[zz[k]]
                rec[by : by + 8, bx : bx + 8] += _mc_idct(deq.reshape(8, 8))
            recon[y : y + 16, x : x + 16] = np.clip(
                np.round(rec), 0, 255
            ).astype(np.uint8)
    return recon


def encode_avi_mc(frames: list, fps: int = 25, *, gop: int = 0,
                  search: int = MC_SEARCH, halfpel: bool = False) -> bytes:
    """List of (h, w) uint8 gray frames (dims multiples of 16) ->
    motion-compensated "MC01" AVI: frame 0 (and every ``gop``-th frame
    when gop > 0) an I-frame carried as a complete baseline JFIF
    payload, every other frame a P-frame per the bitstream above.
    I-frames alone get AVIIF_KEYFRAME in idx1. The encoder is closed-
    loop: P-frames predict from the DECODED previous frame."""
    from .image import decode_jpeg, encode_jpeg

    if not frames:
        raise ValueError("MC01 AVI needs at least one frame")
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")
    shape = frames[0].shape
    if any(f.shape != shape or f.ndim != 2 for f in frames):
        raise ValueError("all frames must be 8-bit gray with one shape")
    h, w = shape
    if h % 16 or w % 16:
        raise ValueError(
            f"MC01 frames must be multiples of 16 (got {w}x{h}) —"
            " macroblock motion compensation has no partial-MB path"
        )
    payloads: list[bytes] = []
    keyflags: list[bool] = []
    prev_recon = None
    for i, f in enumerate(frames):
        f = np.asarray(f, dtype=np.uint8)
        if i == 0 or (gop and i % gop == 0):
            data = encode_jpeg(f)
            _, _, px = decode_jpeg(data)
            prev_recon = px.astype(np.uint8)
            payloads.append(data)
            keyflags.append(True)
        else:
            data, prev_recon = _mc_encode_pframe(
                prev_recon, f, search, halfpel=halfpel
            )
            payloads.append(data)
            keyflags.append(False)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1,
        max(len(p) for p in payloads), w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MC01"
        + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0, 0, 0, 0, 1, fps, 0, len(frames),
            max(len(p) for p in payloads), 0, 0, 0, 0, w, h,
        )
    )
    strf = struct.pack(
        "<Iii HHI I iiII".replace(" ", ""),
        40, w, h, 1, 8,
        struct.unpack("<I", b"MC01")[0],  # biCompression fourcc
        sum(len(p) for p in payloads) // len(payloads), 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = bytearray(b"movi")
    offsets = []
    for p in payloads:
        offsets.append(len(movi_body))
        movi_body += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", bytes(movi_body))
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10 if key else 0, off, len(p))
        for key, (off, p) in zip(keyflags, zip(offsets, payloads))
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mc(payload: bytes) -> tuple[int, list[np.ndarray]]:
    """"MC01" AVI bytes -> (fps, reconstructed (h, w) uint8 frames).

    Strict walk like the MJPEG/RLE8 readers: RIFF framing, header
    consistency (MC01 handler and biCompression), idx1 offsets/sizes
    verified with AVIIF_KEYFRAME exactly on I-frames (an I-frame is
    recognized by its JFIF SOI marker — the flag and the payload must
    agree), and every motion vector bounds-checked. P-frames decode
    against the previous reconstruction; a P-frame before any I-frame
    is an error."""
    from .image import decode_jpeg

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
    raw_frames: list[bytes] = []
    frame_meta: list[tuple[int, int]] = []
    key_flags: list[int] = []

    def walk(start: int, end: int) -> None:
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
                    walk(body_start + 4, body_start + csize)
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
        off = start + 4
        while off + 8 <= end:
            ckid = payload[off : off + 4]
            (csize,) = struct.unpack_from("<I", payload, off + 4)
            if off + 8 + csize > end:
                raise ValueError("movi frame chunk overruns the list")
            if ckid == b"00dc":
                frame_meta.append((off - start, csize))
                raw_frames.append(payload[off + 8 : off + 8 + csize])
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
            is_jfif = raw_frames[i][:2] == b"\xff\xd8"
            want = 0x10 if is_jfif else 0
            if flags != want:
                raise ValueError(
                    f"idx1 entry {i} flags {flags:#x} disagree with the"
                    f" payload type ({'I' if is_jfif else 'P'}-frame)"
                )
            key_flags.append(flags)

    walk(12, 8 + riff_size)
    if avih is None or strh is None or strf is None:
        raise ValueError("AVI missing avih/strh/strf headers")
    fields = struct.unpack_from("<IIIIIIIIII", avih, 0)
    total_frames, streams, aw, ah = fields[4], fields[6], fields[8], fields[9]
    if streams != 1:
        raise ValueError(f"expected 1 stream, header says {streams}")
    if total_frames != len(raw_frames):
        raise ValueError(
            f"avih says {total_frames} frames, movi carries"
            f" {len(raw_frames)}"
        )
    if strh[:4] != b"vids" or strh[4:8] != b"MC01":
        raise ValueError(
            f"unsupported stream {strh[:4]!r}/{strh[4:8]!r} (want vids/MC01)"
        )
    scale, rate = struct.unpack_from("<II", strh, 20)
    if scale == 0 or rate % scale:
        raise ValueError(f"non-integer fps rate/scale {rate}/{scale}")
    fps = rate // scale
    _, bw2, bh2, _planes, bpp, comp = struct.unpack_from("<IiiHHI", strf, 0)
    if (bw2, abs(bh2)) != (aw, ah):
        raise ValueError("strf dimensions contradict avih")
    if bpp != 8 or comp != struct.unpack("<I", b"MC01")[0]:
        raise ValueError(
            f"expected 8-bit MC01 (got {bpp}-bit compression {comp:#x})"
        )
    prev = None
    out: list[np.ndarray] = []
    for raw in raw_frames:
        if raw[:2] == b"\xff\xd8":  # I-frame: complete JFIF payload
            _, _, px = decode_jpeg(raw)
            if px.ndim != 2:
                raise ValueError("MC01 I-frame must be grayscale")
            if px.shape != (ah, aw):
                raise ValueError(
                    f"I-frame {px.shape} contradicts headers ({ah},{aw})"
                )
            prev = px.astype(np.uint8)
        else:
            if prev is None:
                raise ValueError("MC01 P-frame before any I-frame")
            prev = _mc_decode_pframe(prev, raw)
        out.append(prev.copy())
    return fps, out


# --- MC02: BIDIRECTIONAL prediction (MPEG-1 B-frames) -------------------------
#
# The missing half of the MPEG GOP story: B-pictures (ISO/IEC 11172-2
# §2.4.4.3-4) predict each macroblock from a PAST and/or a FUTURE
# reference, with the interpolated mode averaging the two predictions
# ((fwd + bwd + 1) >> 1 — "half values rounded up", §2.4.4.4), and are
# never references themselves. Because a B-picture needs its future
# reference first, CODED ORDER differs from DISPLAY ORDER — the one
# codec property none of the earlier tiers exercise: the decoder holds
# a two-picture reference buffer and re-emits frames in presentation
# order (references are output when the NEXT reference arrives,
# B-frames immediately).
#
# Container: AVI fourcc "MC02"; movi chunks are in CODED order.
# I-frames are complete baseline JFIF payloads (AVIIF_KEYFRAME in
# idx1, cross-checked against the SOI marker exactly like MC01);
# P-frames are the MC01 P bitstream behind a one-byte 'P' tag;
# B-frames are tagged 'B' with per-macroblock syntax:
#   1 bit  skip        1 = copy the co-located FORWARD-reference MB
#   2 bits mode        00 forward / 01 backward / 10 interpolated
#                      (11 is a bitstream error)
#   se(dx2), se(dy2)   forward MV (modes 00/10), half-pel units
#   se(dx2), se(dy2)   backward MV (modes 01/10)
#   4 bits cbp + coded blocks exactly as in the MC01 P syntax.
# Display pattern: frame 0 is I, odd display indices are B, even are
# P — except the LAST frame, which is always coded as a reference (a
# closed GOP: a trailing B would dangle without a future reference).
# The encoder is closed-loop on references only (B-frames predict
# from decoded references; their own reconstruction feeds nothing).

_MC_B_MODES = ("fwd", "bwd", "bi")  # tie-break preference = this order


def _mc_code_residual_blocks(bw_, resid: "np.ndarray", rec: "np.ndarray",
                             q: "np.ndarray", zz: "np.ndarray") -> None:
    """Quantize the four 8x8 residual blocks of one MB, emit cbp +
    run/level codes, and add the DEQUANTIZED residual onto ``rec`` in
    place (the closed-loop reconstruction) — the shared tail of the P
    and B macroblock coders."""
    levels = []
    cbp = 0
    for bi, (by, bx) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
        X = _mc_fdct(resid[by : by + 8, bx : bx + 8]) / q
        lv = (np.sign(X) * np.floor(np.abs(X) + 0.5)).astype(np.int64)
        lvzz = lv.reshape(64)[zz]
        levels.append(lvzz)
        if lvzz.any():
            cbp |= 1 << (3 - bi)
    bw_.put(cbp, 4)
    for bi, (by, bx) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
        lvzz = levels[bi]
        if not (cbp >> (3 - bi)) & 1:
            continue
        nz = np.nonzero(lvzz)[0]
        bw_.ue(len(nz))
        last = -1
        for k in nz:
            bw_.ue(int(k - last - 1))
            bw_.se(int(lvzz[k]))
            last = int(k)
        deq = np.zeros(64)
        deq[zz[nz]] = lvzz[nz] * q.reshape(64)[zz[nz]]
        rec[by : by + 8, bx : bx + 8] += _mc_idct(deq.reshape(8, 8))


def _mc_read_residual_blocks(br, rec: "np.ndarray", q: "np.ndarray",
                             zz: "np.ndarray") -> None:
    """Decoder half of ``_mc_code_residual_blocks``: read cbp + coded
    blocks and add the dequantized residual onto ``rec`` in place."""
    cbp = 0
    for _ in range(4):
        cbp = (cbp << 1) | br.bit()
    for bi, (by, bx) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
        if not (cbp >> (3 - bi)) & 1:
            continue
        n = br.ue()
        if not 1 <= n <= 64:
            raise ValueError(f"MC02 coded block with {n} coeffs")
        deq = np.zeros(64)
        k = -1
        for _ in range(n):
            k += br.ue() + 1
            if k > 63:
                raise ValueError("MC02 zigzag run overruns block")
            lv = br.se()
            if lv == 0:
                raise ValueError("MC02 zero level is not codable")
            deq[zz[k]] = lv * q.reshape(64)[zz[k]]
        rec[by : by + 8, bx : bx + 8] += _mc_idct(deq.reshape(8, 8))


def _mc_best_fullpel(refi: "np.ndarray", mb: "np.ndarray", y: int, x: int,
                     search: int, wins: "np.ndarray | None" = None
                     ) -> tuple[tuple[int, int], int]:
    """Full-pel SAD search of ``mb`` in ``refi`` around (y, x); returns
    ((dx2, dy2) in half-pel units, sad) with the deterministic MC01
    candidate order ((|dx|+|dy|, dy, dx), strict improvement)."""
    return _mc_search_fullpel(refi, mb, y, x, search, wins=wins)


def _mc_encode_bframe(fwd: "np.ndarray", bwd: "np.ndarray",
                      cur: "np.ndarray", search: int) -> bytes:
    """One B-frame payload (without the 'B' tag). ``fwd``/``bwd`` are
    the DECODED past/future references. Mode selection per MB: best
    full-pel forward MV, best full-pel backward MV, and the
    interpolated prediction from that vector pair; minimum SAD wins
    with ties resolved in fwd < bwd < bi order (fewer vectors first)."""
    from .image import _JPEG_ZZ_FLAT

    h, w = cur.shape
    q = _mc_quant_table()
    zz = _JPEG_ZZ_FLAT
    bw_ = _MCBitWriter()
    fwdi = fwd.astype(np.int32)
    bwdi = bwd.astype(np.int32)
    curi = cur.astype(np.int32)
    fwins = np.lib.stride_tricks.sliding_window_view(fwdi, (16, 16))
    bwins = np.lib.stride_tricks.sliding_window_view(bwdi, (16, 16))
    for y in range(0, h, 16):
        for x in range(0, w, 16):
            mb = curi[y : y + 16, x : x + 16]
            if (mb == fwdi[y : y + 16, x : x + 16]).all():
                bw_.put(1, 1)  # skip: co-located copy from the PAST ref
                continue
            (fv, fsad) = _mc_best_fullpel(fwdi, mb, y, x, search, wins=fwins)
            (bv, bsad) = _mc_best_fullpel(bwdi, mb, y, x, search, wins=bwins)
            fpred = _mc_pred(fwdi, y, x, fv[1], fv[0])
            bpred = _mc_pred(bwdi, y, x, bv[1], bv[0])
            bipred = (fpred + bpred + 1) >> 1  # §2.4.4.4 rounding
            bisad = int(np.abs(mb - bipred).sum())
            mode, pred = 0, fpred
            best = fsad
            if bsad < best:
                mode, pred, best = 1, bpred, bsad
            if bisad < best:
                mode, pred, best = 2, bipred, bisad
            bw_.put(0, 1)
            bw_.put(mode, 2)
            if mode in (0, 2):
                bw_.se(fv[0])
                bw_.se(fv[1])
            if mode in (1, 2):
                bw_.se(bv[0])
                bw_.se(bv[1])
            rec = pred.astype(np.float64)
            _mc_code_residual_blocks(
                bw_, (mb - pred).astype(np.float64), rec, q, zz
            )
    return bw_.flush()


def _mc_decode_bframe(fwd: "np.ndarray", bwd: "np.ndarray",
                      payload: bytes) -> "np.ndarray":
    from .image import _JPEG_ZZ_FLAT

    h, w = fwd.shape
    q = _mc_quant_table()
    zz = _JPEG_ZZ_FLAT
    br = _MCBitReader(payload)
    recon = np.empty_like(fwd)
    fwdi = fwd.astype(np.int32)
    bwdi = bwd.astype(np.int32)
    for y in range(0, h, 16):
        for x in range(0, w, 16):
            if br.bit():  # skip
                recon[y : y + 16, x : x + 16] = fwd[y : y + 16, x : x + 16]
                continue
            mode = (br.bit() << 1) | br.bit()
            if mode == 3:
                raise ValueError(
                    f"MC02 invalid B macroblock mode 11 at ({x},{y})"
                )
            pred = None
            if mode in (0, 2):
                dx2, dy2 = br.se(), br.se()
                if not _mc_mv_inbounds(h, w, y, x, dy2, dx2):
                    raise ValueError(
                        f"MC02 forward MV ({dx2},{dy2}) leaves the frame"
                        f" at macroblock ({x},{y})"
                    )
                pred = _mc_pred(fwdi, y, x, dy2, dx2)
            if mode in (1, 2):
                dx2, dy2 = br.se(), br.se()
                if not _mc_mv_inbounds(h, w, y, x, dy2, dx2):
                    raise ValueError(
                        f"MC02 backward MV ({dx2},{dy2}) leaves the frame"
                        f" at macroblock ({x},{y})"
                    )
                bp = _mc_pred(bwdi, y, x, dy2, dx2)
                pred = bp if pred is None else (pred + bp + 1) >> 1
            rec = pred.astype(np.float64)
            _mc_read_residual_blocks(br, rec, q, zz)
            recon[y : y + 16, x : x + 16] = np.clip(
                np.round(rec), 0, 255
            ).astype(np.uint8)
    return recon


def encode_avi_mc_b(frames: list, fps: int = 25, *,
                    search: int = MC_SEARCH, bframes: int = 1,
                    gop: int = 0) -> bytes:
    """List of (h, w) uint8 gray frames in DISPLAY order (dims
    multiples of 16) -> "MC02" AVI. ``bframes`` consecutive B-pictures
    sit between references (1 -> I B P B P, the MPEG baseline; 2 ->
    I B B P B B P, the IBBP pattern broadcast streams use — two
    B-frames share one (past, future) reference pair, stressing the
    two-slot reorder buffer). The last frame is always coded as a
    reference (closed trailing edge: a final B would dangle).
    ``gop`` > 0 codes every ``gop``-th display frame (where it falls
    on a reference slot) as a fresh I-picture — and because the
    B-frames displayed BEFORE that I still
    predict forward from the PREVIOUS GOP's last reference (and
    backward from the new I), the cut is an OPEN GOP, the leading-B
    property of every real MPEG stream. movi chunks are written in
    CODED order (each reference precedes the B-frames that cite it);
    every I-frame gets AVIIF_KEYFRAME."""
    from .image import decode_jpeg, encode_jpeg

    if not frames:
        raise ValueError("MC02 AVI needs at least one frame")
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")
    if bframes < 1:
        raise ValueError(f"bframes must be >= 1, got {bframes}")
    shape = frames[0].shape
    if any(f.shape != shape or f.ndim != 2 for f in frames):
        raise ValueError("all frames must be 8-bit gray with one shape")
    h, w = shape
    if h % 16 or w % 16:
        raise ValueError(
            f"MC02 frames must be multiples of 16 (got {w}x{h}) —"
            " macroblock motion compensation has no partial-MB path"
        )
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    n = len(frames)
    step = bframes + 1
    is_ref = [i % step == 0 or i == n - 1 for i in range(n)]
    is_intra = [
        r and (i == 0 or (gop > 0 and i % gop == 0))
        for i, r in enumerate(is_ref)
    ]
    payloads: list[bytes] = []
    keyflags: list[bool] = []
    prev_ref = None  # decoded reconstruction of the previous reference
    prev_ref_idx = 0
    for i in range(n):
        if not is_ref[i]:
            continue
        if is_intra[i]:
            data = encode_jpeg(frames[i])
            _, _, px = decode_jpeg(data)
            recon = px.astype(np.uint8)
            payloads.append(data)
            keyflags.append(True)
        else:
            data, recon = _mc_encode_pframe(prev_ref, frames[i], search)
            payloads.append(b"P" + data)
            keyflags.append(False)
        # the B-frames BETWEEN the two references, coded after both —
        # when the new reference is a mid-stream I, these are the
        # leading B-pictures of an open GOP (forward ref = previous
        # GOP's last reference, backward ref = the new I)
        for j in range(prev_ref_idx + 1, i):
            payloads.append(
                b"B" + _mc_encode_bframe(prev_ref, recon,
                                         frames[j], search)
            )
            keyflags.append(False)
        prev_ref, prev_ref_idx = recon, i
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1,
        max(len(p) for p in payloads), w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MC02"
        + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0, 0, 0, 0, 1, fps, 0, len(frames),
            max(len(p) for p in payloads), 0, 0, 0, 0, w, h,
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 8,
        struct.unpack("<I", b"MC02")[0],
        sum(len(p) for p in payloads) // len(payloads), 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = bytearray(b"movi")
    offsets = []
    for p in payloads:
        offsets.append(len(movi_body))
        movi_body += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", bytes(movi_body))
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10 if key else 0, off, len(p))
        for key, (off, p) in zip(keyflags, zip(offsets, payloads))
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mc_b(payload: bytes) -> tuple[int, list[np.ndarray]]:
    """"MC02" AVI bytes -> (fps, frames in PRESENTATION order).

    The reordering decoder every MPEG-family codec needs: a
    two-picture reference buffer. A reference (I or 'P'-tagged
    payload) is DECODED but held; it is emitted when the NEXT
    reference arrives (and the final one at end of stream). A
    'B'-tagged payload decodes against (held-1, held) = (past,
    future) references and is emitted immediately. Strict walk as in
    MC01: header consistency (MC02 handler/biCompression), idx1
    offsets/sizes verified with AVIIF_KEYFRAME exactly on JFIF
    payloads, unknown payload tags and B-frames without two live
    references are errors, every MV bounds-checked."""
    from .image import decode_jpeg

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
    raw_frames: list[bytes] = []
    frame_meta: list[tuple[int, int]] = []

    def walk(start: int, end: int) -> None:
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
                    walk(body_start + 4, body_start + csize)
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
        off = start + 4
        while off + 8 <= end:
            ckid = payload[off : off + 4]
            (csize,) = struct.unpack_from("<I", payload, off + 4)
            if off + 8 + csize > end:
                raise ValueError("movi frame chunk overruns the list")
            if ckid == b"00dc":
                frame_meta.append((off - start, csize))
                raw_frames.append(payload[off + 8 : off + 8 + csize])
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
            is_jfif = raw_frames[i][:2] == b"\xff\xd8"
            want = 0x10 if is_jfif else 0
            if flags != want:
                raise ValueError(
                    f"idx1 entry {i} flags {flags:#x} disagree with the"
                    f" payload type ({'I' if is_jfif else 'B/P'}-frame)"
                )

    walk(12, 8 + riff_size)
    if avih is None or strh is None or strf is None:
        raise ValueError("AVI missing avih/strh/strf headers")
    fields = struct.unpack_from("<IIIIIIIIII", avih, 0)
    total_frames, streams, aw, ah = fields[4], fields[6], fields[8], fields[9]
    if streams != 1:
        raise ValueError(f"expected 1 stream, header says {streams}")
    if total_frames != len(raw_frames):
        raise ValueError(
            f"avih says {total_frames} frames, movi carries"
            f" {len(raw_frames)}"
        )
    if strh[:4] != b"vids" or strh[4:8] != b"MC02":
        raise ValueError(
            f"unsupported stream {strh[:4]!r}/{strh[4:8]!r} (want vids/MC02)"
        )
    scale, rate = struct.unpack_from("<II", strh, 20)
    if scale == 0 or rate % scale:
        raise ValueError(f"non-integer fps rate/scale {rate}/{scale}")
    fps = rate // scale
    _, bw2, bh2, _planes, bpp, comp = struct.unpack_from("<IiiHHI", strf, 0)
    if (bw2, abs(bh2)) != (aw, ah):
        raise ValueError("strf dimensions contradict avih")
    if bpp != 8 or comp != struct.unpack("<I", b"MC02")[0]:
        raise ValueError(
            f"expected 8-bit MC02 (got {bpp}-bit compression {comp:#x})"
        )
    past = future = None  # the two-picture reference buffer
    out: list[np.ndarray] = []
    for raw in raw_frames:
        if raw[:2] == b"\xff\xd8":  # I-frame
            _, _, px = decode_jpeg(raw)
            if px.ndim != 2:
                raise ValueError("MC02 I-frame must be grayscale")
            if px.shape != (ah, aw):
                raise ValueError(
                    f"I-frame {px.shape} contradicts headers ({ah},{aw})"
                )
            if future is not None:
                out.append(future.copy())  # emit the displaced reference
            past, future = future, px.astype(np.uint8)
        elif raw[:1] == b"P":
            if future is None:
                raise ValueError("MC02 P-frame before any reference")
            recon = _mc_decode_pframe(future, raw[1:])
            out.append(future.copy())
            past, future = future, recon
        elif raw[:1] == b"B":
            if past is None or future is None:
                raise ValueError(
                    "MC02 B-frame without two live references"
                )
            out.append(_mc_decode_bframe(past, future, raw[1:]))
        else:
            raise ValueError(
                f"MC02 unknown payload tag {raw[:1]!r}"
            )
    if future is not None:
        out.append(future.copy())  # flush the held final reference
    if len(out) != len(raw_frames):
        raise ValueError(
            f"MC02 reorder produced {len(out)} frames from"
            f" {len(raw_frames)} payloads"
        )
    return fps, out

"""Pure-Python image codecs: PPM (P6) and BMP (24-bit uncompressed).

The container has no native image libraries, so these two formats — both
decodable with nothing but byte arithmetic — let the multimodal pipeline
(operators/multimodal.py) run a REAL decode end-to-end instead of
stopping at the documented ``decode_image_stub`` boundary. They are not
toys: the PPM parser handles the format's full header grammar
(arbitrary whitespace, ``#`` comments anywhere between tokens), and the
BMP path implements the format's actual storage quirks — bottom-up row
order, BGR byte order, 4-byte row padding — so a decoder bug flips row
order or channels and is caught by the pixel-checksum oracle.

Formats that genuinely require native codecs (JPEG/PNG/video) remain
behind the documented stub in multimodal.py.

No Spark imports: unit-testable standalone, callable from pandas UDFs.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_ppm",
    "decode_ppm",
    "encode_bmp",
    "decode_bmp",
    "decode_image",
]


# ---------------------------------------------------------------- PPM P6


def encode_ppm(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (H, W, 3) -> binary PPM (P6, maxval 255)."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {arr.shape}")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _ppm_tokens(buf: bytes, n: int) -> tuple[list[int], int]:
    """Read n whitespace-separated integer tokens from a PPM header,
    skipping ``#`` comments (which run to end-of-line and are legal
    between any two tokens). Returns (tokens, offset just past the
    single whitespace byte that terminates the last token) — per spec
    exactly one whitespace character separates the maxval from the
    raster, so raster bytes that look like whitespace are not eaten."""
    toks: list[int] = []
    i = 0
    while len(toks) < n:
        if i >= len(buf):
            raise ValueError("truncated PPM header")
        c = buf[i : i + 1]
        if c == b"#":
            nl = buf.find(b"\n", i)
            if nl < 0:
                raise ValueError("unterminated PPM comment")
            i = nl + 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(buf) and buf[j : j + 1].isdigit():
                j += 1
            toks.append(int(buf[i:j]))
            if len(toks) == n:
                # exactly one whitespace byte terminates the maxval
                if j >= len(buf) or not buf[j : j + 1].isspace():
                    raise ValueError("PPM maxval not whitespace-terminated")
                return toks, j + 1
            i = j
        else:
            raise ValueError(f"unexpected byte {c!r} in PPM header")
    raise AssertionError("unreachable")


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM -> (width, height, RGB uint8 array (H, W, 3))."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    (w, h, maxval), off = _ppm_tokens(payload[2:], 3)
    off += 2  # the magic bytes skipped above
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    need = w * h * 3
    raster = payload[off : off + need]
    if len(raster) != need:
        raise ValueError(f"truncated PPM raster: {len(raster)} of {need} bytes")
    return w, h, np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


# ------------------------------------------------------- BMP 24-bit BI_RGB

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res, res, px offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def _bmp_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (H, W, 3) -> 24-bit uncompressed BMP.

    Stored the way the format demands: rows bottom-up, pixels as BGR,
    each row zero-padded to a 4-byte boundary."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {arr.shape}")
    h, w, _ = arr.shape
    stride = _bmp_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip rows, RGB->BGR
    raster = rows.tobytes()
    off = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    return (
        _BMP_FILE_HDR.pack(b"BM", off + len(raster), 0, 0, off)
        + _BMP_INFO_HDR.pack(40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
        + raster
    )


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """24-bit uncompressed BMP -> (width, height, RGB uint8 (H, W, 3)).

    Handles the negative-height (top-down) variant too — a real decoder
    must, since both orientations are legal."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, px_off = _BMP_FILE_HDR.unpack_from(payload, 0)
    hdr_size, w, h, planes, bpp, compression = _BMP_INFO_HDR.unpack_from(
        payload, _BMP_FILE_HDR.size
    )[:6]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    top_down = h < 0
    h = abs(h)
    stride = _bmp_stride(w)
    need = stride * h
    raster = payload[px_off : px_off + need]
    if len(raster) != need:
        raise ValueError(f"truncated BMP raster: {len(raster)} of {need} bytes")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    if not top_down:
        rgb = rgb[::-1]
    return w, h, np.ascontiguousarray(rgb)


def decode_image(payload: bytes) -> tuple[str, int, int, np.ndarray]:
    """Sniff the container by magic and decode; -> (fmt, w, h, pixels).

    The dispatch point a production pipeline extends with native codecs;
    unknown magics fail loudly (never silently skip a corrupt payload)."""
    if payload[:2] == b"P6":
        w, h, px = decode_ppm(payload)
        return "ppm", w, h, px
    if payload[:2] == b"BM":
        w, h, px = decode_bmp(payload)
        return "bmp", w, h, px
    raise ValueError(f"unknown image magic {payload[:2]!r}")

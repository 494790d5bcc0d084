"""Container/format sniffing for binary corpus intake.

The first stage of any multimodal ingest pipeline is routing raw blobs
to the right decoder, by MAGIC BYTES, never by filename (crawled data
lies about extensions). This sniffer covers every container the
kernels implement, using each format's published signature:

- PPM ``P6``, BMP ``BM``, PNG 8-byte signature, QOI ``qoif``,
  JPEG ``FF D8 FF``, GIF ``GIF87a``/``GIF89a`` (animation detected by
  an 89a graphic-control extension), FLAC ``fLaC``;
- RIFF forms split by their form type: ``WAVE`` -> wav, ``AVI `` ->
  avi, further split by the stream handler fourcc (``MJPG`` /
  ``MRLE``) found in ``strh``;
- TGA last (the format has NO magic; the header's image-type byte is
  checked only after everything else misses — exactly why real
  sniffers treat TGA as the fallback).

No Spark imports: unit-testable standalone, callable from pandas UDFs.
"""

from __future__ import annotations

__all__ = ["sniff_format"]


def sniff_format(payload: bytes) -> str:
    """Best-effort container identification; returns a format slug or
    ``unknown``. Pure byte inspection — never decodes payloads."""
    if len(payload) < 4:
        return "unknown"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:4] == b"qoif":
        return "qoi"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        # 89a animations carry a graphic-control extension (21 F9)
        if payload[:6] == b"GIF89a" and b"\x21\xf9" in payload:
            return "gif_anim"
        return "gif"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and len(payload) >= 12:
        form = payload[8:12]
        if form == b"WAVE":
            return "wav"
        if form == b"AVI ":
            if b"MJPG" in payload[:256]:
                return "avi_mjpeg"
            if b"MRLE" in payload[:256]:
                return "avi_rle8"
            return "avi"
        return "riff"
    if payload[:2] == b"BM":
        return "bmp"
    # TGA fallback: no magic; accept the header shapes our writer emits
    # (truecolor type 2 / RLE type 10, 24 bpp)
    if len(payload) >= 18 and payload[2] in (2, 10) and payload[16] == 24:
        return "tga"
    return "unknown"

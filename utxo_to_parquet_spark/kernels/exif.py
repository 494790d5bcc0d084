"""TIFF/EXIF metadata codec — the multimodal METADATA-extraction path.

Image pipelines at 100 TB read EXIF far more often than pixels (dedup by
camera+timestamp, PII scrubbing of GPS tags, quality filters on ISO and
exposure). This module implements the TIFF 6.0 container the EXIF spec
(JEITA CP-3451) embeds: byte-order header (II little / MM big endian),
IFD walks, inline-vs-offset value placement (values <= 4 bytes live in
the entry itself), the ASCII / SHORT / LONG / RATIONAL types the
mandatory tags use, and the ExifIFD sub-directory pointer (tag 0x8769).

Writer and reader are two independent walks of the spec, meeting at the
``q_mm_exif_parse`` oracle gate (planted field values recomputed by the
DuckDB oracle from engine-identical arithmetic) and at the layout-pinned
unit tests, following the PNG/QOI/WAV/JPEG precedent. GPS IFDs,
maker-note blobs, and JPEG-embedded (APP1-wrapped) EXIF are the
documented residual scope.
"""

from __future__ import annotations

import struct

# TIFF value types (TIFF 6.0 §2): type id -> byte width per count unit
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL

TAG_WIDTH = 0x0100
TAG_HEIGHT = 0x0101
TAG_MAKE = 0x010F
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_EXPOSURE = 0x829A  # RATIONAL seconds
TAG_ISO = 0x8827


def encode_exif(
    *,
    width: int,
    height: int,
    make: str,
    orientation: int,
    datetime: str,
    iso: int,
    exposure: tuple[int, int],
    big_endian: bool = False,
) -> bytes:
    """Write a TIFF/EXIF blob with IFD0 (width/height/make/orientation/
    datetime + ExifIFD pointer) and an Exif sub-IFD (ISO, exposure).

    Layout choices are the spec's canonical ones: IFD0 at offset 8,
    entries sorted by tag (TIFF 6.0 requires ascending tag order),
    out-of-line values packed after each IFD, next-IFD pointer 0."""
    bo = ">" if big_endian else "<"

    def ifd(entries: list[tuple[int, int, int, bytes]], base: int) -> bytes:
        """entries: (tag, type, count, value_bytes). base = absolute
        offset of this IFD; out-of-line data lands right after it."""
        entries = sorted(entries)
        n = len(entries)
        data_off = base + 2 + 12 * n + 4
        head = struct.pack(bo + "H", n)
        tail = b""
        for tag, typ, count, val in entries:
            if len(val) <= 4:
                inline = val + b"\x00" * (4 - len(val))
                head += struct.pack(bo + "HHI", tag, typ, count) + inline
            else:
                head += struct.pack(bo + "HHII", tag, typ, count, data_off + len(tail))
                tail += val
        head += struct.pack(bo + "I", 0)  # next-IFD pointer
        return head + tail

    def ascii_v(s: str) -> tuple[int, int, bytes]:
        b = s.encode("ascii") + b"\x00"
        return 2, len(b), b

    def short_v(v: int) -> tuple[int, int, bytes]:
        return 3, 1, struct.pack(bo + "H", v)

    def long_v(v: int) -> tuple[int, int, bytes]:
        return 4, 1, struct.pack(bo + "I", v)

    def rational_v(num: int, den: int) -> tuple[int, int, bytes]:
        return 5, 1, struct.pack(bo + "II", num, den)

    # Exif sub-IFD is placed after IFD0; compute IFD0 size first (its
    # entry count is fixed: 5 data tags + the sub-IFD pointer)
    ifd0_entries_n = 6
    mk_t, mk_c, mk_b = ascii_v(make)
    dt_t, dt_c, dt_b = ascii_v(datetime)
    ifd0_tail = (len(mk_b) if len(mk_b) > 4 else 0) + (
        len(dt_b) if len(dt_b) > 4 else 0
    )
    exif_ifd_off = 8 + 2 + 12 * ifd0_entries_n + 4 + ifd0_tail
    ifd0 = ifd(
        [
            (TAG_WIDTH, *long_v(width)),
            (TAG_HEIGHT, *long_v(height)),
            (TAG_MAKE, mk_t, mk_c, mk_b),
            (TAG_ORIENTATION, *short_v(orientation)),
            (TAG_DATETIME, dt_t, dt_c, dt_b),
            (TAG_EXIF_IFD, *long_v(exif_ifd_off)),
        ],
        8,
    )
    sub = ifd(
        [
            (TAG_ISO, *short_v(iso)),
            (TAG_EXPOSURE, *rational_v(*exposure)),
        ],
        exif_ifd_off,
    )
    header = (b"MM" if big_endian else b"II") + struct.pack(bo + "HI", 42, 8)
    return header + ifd0 + sub


def decode_exif(payload: bytes) -> dict:
    """Parse a TIFF/EXIF blob; returns the decoded fields as a dict with
    keys byte_order ('II'|'MM'), width, height, make, orientation,
    datetime, iso, exposure (num, den).

    Independent spec walk: honors either byte order, inline-vs-offset
    value placement by computed byte size (not by mirroring the writer),
    and chases the ExifIFD pointer. Malformed input fails loudly:
    wrong magic, truncated IFDs, unknown value types, and entries whose
    out-of-line data runs past EOF all raise ValueError."""
    if payload[:2] == b"II":
        bo, order = "<", "II"
    elif payload[:2] == b"MM":
        bo, order = ">", "MM"
    else:
        raise ValueError(f"not a TIFF/EXIF blob: byte order {payload[:2]!r}")
    magic, ifd0_off = struct.unpack_from(bo + "HI", payload, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic} (expected 42)")

    def read_ifd(off: int) -> dict[int, tuple[int, int, bytes]]:
        if off + 2 > len(payload):
            raise ValueError("truncated IFD: entry count past EOF")
        (n,) = struct.unpack_from(bo + "H", payload, off)
        if off + 2 + 12 * n + 4 > len(payload):
            raise ValueError("truncated IFD: entries past EOF")
        out: dict[int, tuple[int, int, bytes]] = {}
        for k in range(n):
            tag, typ, count = struct.unpack_from(bo + "HHI", payload, off + 2 + 12 * k)
            if typ not in _TYPE_SIZES:
                raise ValueError(f"unknown TIFF type {typ} for tag {tag:#06x}")
            nbytes = _TYPE_SIZES[typ] * count
            vpos = off + 2 + 12 * k + 8
            if nbytes <= 4:
                raw = payload[vpos : vpos + nbytes]
            else:
                (doff,) = struct.unpack_from(bo + "I", payload, vpos)
                if doff + nbytes > len(payload):
                    raise ValueError(
                        f"tag {tag:#06x} value runs past EOF"
                    )
                raw = payload[doff : doff + nbytes]
            out[tag] = (typ, count, raw)
        return out

    def value(entry: tuple[int, int, bytes]):
        typ, count, raw = entry
        if typ == 2:  # ASCII, NUL-terminated
            return raw.rstrip(b"\x00").decode("ascii")
        if typ == 3:
            return struct.unpack_from(bo + "H", raw)[0]
        if typ == 4:
            return struct.unpack_from(bo + "I", raw)[0]
        if typ == 5:
            return struct.unpack_from(bo + "II", raw)
        return raw[0]

    ifd0 = read_ifd(ifd0_off)
    out = {
        "byte_order": order,
        "width": value(ifd0[TAG_WIDTH]),
        "height": value(ifd0[TAG_HEIGHT]),
        "make": value(ifd0[TAG_MAKE]),
        "orientation": value(ifd0[TAG_ORIENTATION]),
        "datetime": value(ifd0[TAG_DATETIME]),
    }
    sub = read_ifd(value(ifd0[TAG_EXIF_IFD]))
    out["iso"] = value(sub[TAG_ISO])
    out["exposure"] = value(sub[TAG_EXPOSURE])
    return out

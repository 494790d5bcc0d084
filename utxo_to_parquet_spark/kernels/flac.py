"""Pure-Python FLAC codec (subset), written from the public format
spec (xiph.org format.html / RFC 9639).

FLAC is the one mainstream LOSSLESS audio codec implementable without
native libraries: every stage is integer arithmetic — UTF-8-style
coded numbers, Rice/Golomb residuals, fixed polynomial or quantized
LPC prediction, and CRC-8/CRC-16 framing — so it joins WAV/G.711/ADPCM
as a real container the audio operators decode end-to-end (MP3/AAC
stay stubbed: they need float DCT banks tuned per encoder).

Encoder (``encode_flac``): STREAMINFO with real MD5, fixed-blocksize
frames, per-channel subframe chosen among CONSTANT / FIXED order 0-2
(best Rice cost) with VERBATIM fallback, single Rice partition,
independent channels.

Decoder (``decode_flac``): the full subset a reader of third-party
files needs — CONSTANT / VERBATIM / FIXED 0-4 / LPC subframes, wasted
bits, partitioned Rice with escape codes, all four stereo assignments
(independent, left/side, right/side, mid/side), CRC-8 + CRC-16
verification and the STREAMINFO MD5 check, failing loudly on any
mismatch (the S13 contract). The LPC and side-channel paths the
encoder never emits are pinned by hand-built bitstreams in
tests/test_round12.py.

No Spark imports: unit-testable standalone, callable from pandas UDFs.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["encode_flac", "decode_flac"]

_FIXED_COEFS = {  # residual = x - prediction; reconstruction adds back
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_SAMPLE_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 (table-driven)."""
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0
    (table-driven)."""
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ t[(crc >> 8) ^ b]
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.put(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position of the NEXT refill
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway unary code (corrupt Rice stream)")
        return q

    def align(self) -> None:
        self.nbits -= self.nbits % 8
        self.acc &= (1 << self.nbits) - 1

    def byte_pos(self) -> int:
        assert self.nbits % 8 == 0
        return self.pos - self.nbits // 8


def _utf8_coded(value: int) -> bytes:
    """The frame header's UTF-8-style coded number (up to 36 bits)."""
    if value < 0x80:
        return bytes([value])
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if value < (1 << bits):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            out = [lead | (value >> (6 * (nbytes - 1)))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((value >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("coded number exceeds 36 bits")


def _read_utf8_coded(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("invalid coded number lead byte")
    value = b0 & (0x7F >> n)
    for _ in range(n - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid coded number continuation byte")
        value = (value << 6) | (b & 0x3F)
    return value


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res << 1, (-res << 1) - 1)


def _rice_cost(u: np.ndarray, k: int) -> int:
    """Bit cost of Rice-coding the (already zigzagged) residuals at k."""
    return int((u >> k).sum()) + len(u) * (k + 1)


def _best_rice_k(u: np.ndarray) -> int:
    """Rice parameter from the mean magnitude (the standard estimator:
    k ~ log2(mean) is within a bit of optimal for geometric residuals;
    a swept k would shave <2% at 3x the analysis cost on the tiny
    subframes the block-16 gate produces)."""
    mean = int(u.sum()) // max(len(u), 1)
    return min(max(mean.bit_length() - 1, 0), 14)


def encode_flac(samples: np.ndarray, rate: int, *, bps: int = 16,
                block_size: int = 4096) -> bytes:
    """(n, ch) int array -> FLAC bytes (fixed blocksize frames,
    CONSTANT / FIXED 0-2 / VERBATIM subframes, independent channels,
    one Rice partition). Lossless: decode_flac(encode_flac(x)) == x."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if n == 0:
        raise ValueError("cannot encode an empty stream")
    if not 1 <= ch <= 8:
        raise ValueError(f"channels must be 1..8, got {ch}")
    if not 4 <= bps <= 32:
        raise ValueError(f"bits per sample must be 4..32, got {bps}")
    if not 16 <= block_size <= 65535:
        raise ValueError(f"block size must be 16..65535, got {block_size}")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    xi = x.astype(np.int64)
    if xi.min(initial=0) < lo or xi.max(initial=0) > hi:
        raise ValueError(f"samples exceed {bps}-bit range")

    # STREAMINFO MD5: interleaved samples, bps/8 little-endian bytes each
    nbytes = (bps + 7) // 8
    flat = xi.reshape(-1)
    le = np.zeros((len(flat), nbytes), dtype=np.uint8)
    for i in range(nbytes):
        le[:, i] = (flat >> (8 * i)) & 0xFF
    md5 = hashlib.md5(le.tobytes()).digest()

    frames = bytearray()
    min_fs = max_fs = None
    for f0 in range(0, n, block_size):
        blk = xi[f0 : f0 + block_size]
        frame = _encode_frame(blk, f0 // block_size, block_size, bps)
        min_fs = len(frame) if min_fs is None else min(min_fs, len(frame))
        max_fs = max(max_fs or 0, len(frame))
        frames += frame

    info = bytearray()
    info += struct.pack(">HH", block_size, block_size)
    info += (min_fs or 0).to_bytes(3, "big")
    info += (max_fs or 0).to_bytes(3, "big")
    packed = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | n
    info += packed.to_bytes(8, "big")
    info += md5
    return b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + bytes(info) + bytes(frames)


def _encode_frame(blk: np.ndarray, frame_no: int, block_size: int,
                  bps: int) -> bytes:
    nb, ch = blk.shape
    # stereo: pick mid/side when its analyzed subframe cost beats
    # independent L/R (the decorrelation real FLAC encoders default to;
    # lossless: mid = (L+R)>>1 keeps the dropped bit in side's parity).
    # Each candidate channel is ANALYZED once; the winners are emitted
    # from their plans, never re-swept.
    ca = ch - 1
    plans = [_analyze_subframe(blk[:, c], bps) for c in range(ch)]
    if ch == 2:
        left = blk[:, 0].astype(np.int64)
        right = blk[:, 1].astype(np.int64)
        ms_plans = [
            _analyze_subframe((left + right) >> 1, bps),
            _analyze_subframe(left - right, bps + 1),
        ]
        if sum(p[0] for p in ms_plans) < sum(p[0] for p in plans):
            ca, plans = 10, ms_plans
    hdr = _BitWriter()
    hdr.put(0b11111111111110, 14)
    hdr.put(0, 1)  # reserved
    hdr.put(0, 1)  # fixed-blocksize strategy
    bs_code = 6 if nb <= 256 else 7  # explicit 8/16-bit blocksize-1
    hdr.put(bs_code, 4)
    hdr.put(0, 4)  # sample rate: from STREAMINFO
    hdr.put(ca, 4)  # independent channels, or 10 = mid/side
    hdr.put({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}.get(bps, 0), 3)
    hdr.put(0, 1)  # reserved
    for b in _utf8_coded(frame_no):
        hdr.put(b, 8)
    hdr.put(nb - 1, 8 if bs_code == 6 else 16)
    hdr.align()
    head = bytearray(hdr.bytes())
    head.append(_crc8(bytes(head)))

    bw = _BitWriter()
    for plan in plans:
        _emit_subframe(bw, plan)
    bw.align()
    body = head + bw.bytes()
    return bytes(body) + _crc16(bytes(body)).to_bytes(2, "big")


def _analyze_subframe(x: np.ndarray, bps: int):
    """Pick the cheapest subframe coding for ``x``: CONSTANT, best
    FIXED order 0-2 by Rice cost, or VERBATIM. Returns the plan tuple
    _emit_subframe writes — analysis happens exactly once per
    candidate channel."""
    nb = len(x)
    if np.all(x == x[0]):
        return (8 + bps, "const", x, bps, None, None, None)
    best = None
    res = x.astype(np.int64)
    for order in range(min(3, nb)):
        if order:
            res = np.diff(res)
        if len(res) == 0:
            break
        u = _zigzag(res)
        k = _best_rice_k(u)
        cost = order * bps + _rice_cost(u, k)
        if best is None or cost < best[0]:
            best = (cost, order, k, u)
    if best is None or best[0] >= nb * bps:
        return (8 + nb * bps, "verbatim", x, bps, None, None, None)
    cost, order, k, uz = best
    return (8 + cost, "fixed", x, bps, order, k, uz)


def _emit_subframe(bw: _BitWriter, plan) -> None:
    _, kind, x, bps, order, k, uz = plan
    if kind == "const":
        bw.put(0, 1)
        bw.put(0b000000, 6)
        bw.put(0, 1)  # no wasted bits
        bw.put(int(x[0]), bps)
        return
    if kind == "verbatim":
        bw.put(0, 1)
        bw.put(0b000001, 6)
        bw.put(0, 1)
        for v in x:
            bw.put(int(v), bps)
        return
    bw.put(0, 1)
    bw.put(0b001000 | order, 6)
    bw.put(0, 1)
    for v in x[:order]:
        bw.put(int(v), bps)
    bw.put(0, 2)  # residual method 0: 4-bit Rice
    bw.put(0, 4)  # partition order 0
    bw.put(k, 4)
    for u in uz:
        u = int(u)
        bw.put_unary(u >> k)
        bw.put(u & ((1 << k) - 1), k)


def _decode_residual(br: _BitReader, nb: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = br.read(4)
    nparts = 1 << part_order
    if nb % nparts:
        raise ValueError("block size not divisible by partition count")
    res: list[int] = []
    for p in range(nparts):
        cnt = (nb >> part_order) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("predictor order exceeds first partition")
        k = br.read(pbits)
        if k == escape:
            raw = br.read(5)
            for _ in range(cnt):
                res.append(br.read_signed(raw) if raw else 0)
        else:
            for _ in range(cnt):
                q = br.read_unary()
                u = (q << k) | br.read(k)
                res.append((u >> 1) ^ -(u & 1))
    return res


def _decode_subframe(br: _BitReader, nb: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit must be zero")
    t = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag: unary count-1 follows
        wasted = br.read_unary() + 1
        bps -= wasted
    if t == 0:  # CONSTANT
        out = np.full(nb, br.read_signed(bps), dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(nb)], dtype=np.int64)
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _decode_residual(br, nb, order)
        coefs = _FIXED_COEFS[order]
        out_l = warm + [0] * (nb - order)
        for i in range(order, nb):
            acc = res[i - order]
            for j, cf in enumerate(coefs):
                acc += cf * out_l[i - 1 - j]
            out_l[i] = acc
        out = np.array(out_l, dtype=np.int64)
    elif t >= 32:  # LPC, order = (t & 31) + 1
        order = (t & 31) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 0xF:
            raise ValueError("invalid LPC precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, nb, order)
        out_l = warm + [0] * (nb - order)
        for i in range(order, nb):
            acc = 0
            for j, cf in enumerate(coefs):
                acc += cf * out_l[i - 1 - j]
            out_l[i] = res[i - order] + (acc >> shift)
        out = np.array(out_l, dtype=np.int64)
    else:
        raise ValueError(f"reserved subframe type {t:#08b}")
    return out << wasted


def decode_flac(payload: bytes) -> tuple[int, int, np.ndarray]:
    """FLAC bytes -> (rate, channels, (n, ch) int32 samples). Verifies
    frame CRC-8/CRC-16, the STREAMINFO sample count, and the MD5 of
    the decoded audio — any mismatch raises (decoders that return
    best-effort garbage poison a corpus silently)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream: missing fLaC magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata block header")
        head = payload[pos]
        ln = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + ln]
        if len(body) != ln:
            raise ValueError("truncated metadata block body")
        if head & 0x7F == 0:
            if ln != 34:
                raise ValueError(f"STREAMINFO must be 34 bytes, got {ln}")
            info = body
        elif head & 0x7F == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + ln
        if head & 0x80:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    min_bs, max_bs = struct.unpack(">HH", info[:4])
    packed = int.from_bytes(info[10:18], "big")
    rate = packed >> 44
    ch = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    md5 = info[18:34]
    if rate == 0:
        raise ValueError("invalid sample rate 0")
    if min_bs < 16 or max_bs < min_bs:
        raise ValueError("invalid STREAMINFO block sizes")

    chans: list[list[int]] = [[] for _ in range(ch)]
    while pos < len(payload):
        pos = _decode_frame(payload, pos, rate, ch, bps, chans)
    n = len(chans[0])
    if total and n != total:
        raise ValueError(f"decoded {n} samples, STREAMINFO says {total}")
    out = np.array(chans, dtype=np.int64).T.reshape(n, ch)
    nbytes = (bps + 7) // 8
    flat = out.reshape(-1)
    le = np.zeros((len(flat), nbytes), dtype=np.uint8)
    for i in range(nbytes):
        le[:, i] = (flat >> (8 * i)) & 0xFF
    if md5 != b"\x00" * 16 and hashlib.md5(le.tobytes()).digest() != md5:
        raise ValueError("audio MD5 mismatch (corrupt or miscoded stream)")
    return rate, ch, out.astype(np.int32)


def _decode_frame(payload: bytes, pos: int, rate: int, ch: int, bps: int,
                  chans: list[list[int]]) -> int:
    br = _BitReader(payload, pos)
    sync = br.read(14)
    if sync != 0b11111111111110:
        raise ValueError(f"bad frame sync at byte {pos}")
    if br.read(1):
        raise ValueError("frame header reserved bit set")
    br.read(1)  # blocking strategy (coded number disambiguates)
    bs_code = br.read(4)
    sr_code = br.read(4)
    ca = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise ValueError("frame header reserved bit set")
    _read_utf8_coded(br)
    if bs_code == 0:
        raise ValueError("reserved block size code 0")
    elif bs_code == 6:
        nb = br.read(8) + 1
    elif bs_code == 7:
        nb = br.read(16) + 1
    else:
        nb = _BLOCK_SIZE_TABLE[bs_code]
    if sr_code == 12:
        br.read(8)
    elif sr_code in (13, 14):
        br.read(16)
    elif sr_code == 15:
        raise ValueError("invalid sample rate code 15")
    elif sr_code and sr_code in _SAMPLE_RATE_TABLE:
        if _SAMPLE_RATE_TABLE[sr_code] != rate:
            raise ValueError("frame sample rate contradicts STREAMINFO")
    crc_pos = br.byte_pos()
    if _crc8(payload[pos:crc_pos]) != br.read(8):
        raise ValueError("frame header CRC-8 mismatch")
    if ss_code:
        fbps = _SAMPLE_SIZE_TABLE.get(ss_code)
        if fbps is None:
            raise ValueError(f"reserved sample size code {ss_code}")
        if fbps != bps:
            raise ValueError("frame sample size contradicts STREAMINFO")

    if ca < 8:
        if ca + 1 != ch:
            raise ValueError("frame channel count contradicts STREAMINFO")
        subs = [_decode_subframe(br, nb, bps) for _ in range(ch)]
    elif ca in (8, 9, 10):
        if ch != 2:
            raise ValueError("side-channel assignment needs 2 channels")
        # the SIDE channel carries one extra bit
        b0 = bps + (1 if ca == 9 else 0)
        b1 = bps + (1 if ca in (8, 10) else 0)
        s0 = _decode_subframe(br, nb, b0)
        s1 = _decode_subframe(br, nb, b1)
        if ca == 8:  # left/side
            subs = [s0, s0 - s1]
        elif ca == 9:  # right/side
            subs = [s1 + s0, s1]
        else:  # mid/side
            mid = (s0 << 1) | (s1 & 1)
            subs = [(mid + s1) >> 1, (mid - s1) >> 1]
    else:
        raise ValueError(f"reserved channel assignment {ca}")
    br.align()
    end = br.byte_pos()
    if _crc16(payload[pos:end]) != int.from_bytes(payload[end : end + 2], "big"):
        raise ValueError("frame CRC-16 mismatch")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    for c in range(ch):
        if subs[c].min(initial=0) < lo or subs[c].max(initial=0) > hi:
            raise ValueError("decoded sample exceeds bit depth")
        chans[c].extend(int(v) for v in subs[c])
    return end + 2

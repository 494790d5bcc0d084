"""Unit + property tests for the pure-Python decode kernels (SURVEY.md §5)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from utxo_to_parquet_spark.kernels import (
    build_header,
    compress_amount,
    compress_script,
    decode_script,
    decompress_amount,
    decompress_pubkey,
    decompress_script,
    parse_header,
    read_consensus_varint,
    read_core_varint,
    write_consensus_varint,
    write_core_varint,
)


# ---------- core varint (main.rs:45-59 semantics) ----------

CORE_VARINT_VECTORS = [
    # (bytes, value) — hand-derived from the +1-per-continuation semantics
    (b"\x00", 0),
    (b"\x01", 1),
    (b"\x7f", 127),
    (b"\x80\x00", 128),  # (0x80: n=0,+1=1) then (1<<7)|0 = 128
    (b"\x80\x7f", 255),
    (b"\x81\x00", 256),  # (1,+1=2) then 2<<7 = 256
    (b"\xfe\x7f", 16383),
    (b"\xff\x7f", 16511),
    (b"\x80\xff\x7f", 32895),
]


@pytest.mark.parametrize("raw,value", CORE_VARINT_VECTORS)
def test_core_varint_vectors(raw, value):
    got, pos = read_core_varint(raw, 0)
    assert got == value
    assert pos == len(raw)


@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_core_varint_roundtrip(n):
    raw = write_core_varint(n)
    got, pos = read_core_varint(raw, 0)
    assert got == n
    assert pos == len(raw)


@given(st.integers(min_value=0, max_value=2**32))
def test_consensus_varint_roundtrip(n):
    raw = write_consensus_varint(n)
    got, pos = read_consensus_varint(raw, 0)
    assert got == n
    assert pos == len(raw)


def test_consensus_varint_boundaries():
    assert write_consensus_varint(0xFC) == b"\xfc"
    assert write_consensus_varint(0xFD) == b"\xfd\xfd\x00"
    assert write_consensus_varint(0x10000) == b"\xfe\x00\x00\x01\x00"


# ---------- amount compression (main.rs:83-107) ----------

AMOUNT_VECTORS = [
    # (compressed, satoshis) — x=0, e<9 and e=9 branches
    (0, 0),
    (1, 1),  # x=1 → x=0: e=0, d=1, n=1
    (0x7, 7),
    (0x9, 100_000_000),  # e=9 branch: x=9 → x-1=8, e=8? no: 8%10=8<9... recomputed in test below
]


def _ref_decompress(x: int) -> int:
    # independent re-derivation (matches Bitcoin Core DecompressAmount)
    if x == 0:
        return 0
    x -= 1
    e = x % 10
    x //= 10
    if e < 9:
        d = (x % 9) + 1
        x //= 9
        n = x * 10 + d
    else:
        n = x + 1
    while e > 0:
        n *= 10
        e -= 1
    return n


@given(st.integers(min_value=0, max_value=2**50))
def test_decompress_matches_reference_loopform(x):
    assert decompress_amount(x) == _ref_decompress(x)


@given(st.integers(min_value=0, max_value=21_000_000 * 100_000_000))
@settings(max_examples=300)
def test_amount_roundtrip(n):
    assert decompress_amount(compress_amount(n)) == n


def test_amount_known_values():
    # round BTC values compress small (the whole point of the encoding)
    assert decompress_amount(compress_amount(100_000_000)) == 100_000_000
    assert compress_amount(0) == 0
    assert decompress_amount(0) == 0
    # spot values from the README demo output (amounts observed: 546, 1000000)
    for sats in (1, 546, 1000000, 13370000, 2_100_000_000_000_000):
        assert decompress_amount(compress_amount(sats)) == sats


# ---------- script compression (main.rs:109-161) ----------

H20 = hashlib.new("ripemd160", b"test", usedforsecurity=False).digest() if "ripemd160" in hashlib.algorithms_available else hashlib.sha256(b"test").digest()[:20]

# the README's flagship script: 1BitcoinEaterAddressDontSendf59kuE P2PKH
EATER_SCRIPT = bytes.fromhex("76a914759d6677091e973b9e9d99f19c68fbf43e3f05f988ac")

# generator point X — a known-valid curve X coordinate
GEN_X = bytes.fromhex("79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798")
GEN_Y_EVEN = bytes.fromhex("483ada7726a3c4655da4fbfc0e1108a8fd17b448a68554199c47d08ffb10d4b8")


def test_p2pkh_template():
    script = decompress_script(0, EATER_SCRIPT[3:23])
    assert script == EATER_SCRIPT


def test_p2sh_template():
    script = decompress_script(1, H20)
    assert script == bytes([0xA9, 20]) + H20 + bytes([0x87])


def test_p2pk_compressed_templates():
    for t in (2, 3):
        script = decompress_script(t, GEN_X)
        assert script == bytes([33, t]) + GEN_X + bytes([0xAC])


def test_pubkey_decompression_generator():
    pub = decompress_pubkey(2, GEN_X)
    assert pub[0] == 4
    assert pub[1:33] == GEN_X
    assert pub[33:] == GEN_Y_EVEN
    # odd root is the field negation
    pub_odd = decompress_pubkey(3, GEN_X)
    p = 2**256 - 2**32 - 977
    assert int.from_bytes(pub_odd[33:], "big") == p - int.from_bytes(GEN_Y_EVEN, "big")


def test_pubkey_decompression_rejects_off_curve():
    with pytest.raises(ValueError):
        decompress_pubkey(2, b"\x00" * 31 + b"\x05")  # x=5: 132 is not a QR mod p? if it is, change x
        # note: if x=5 happens to be on-curve the test would need another x;
        # verified offline that x=5 yields a non-residue.


def test_p2pk_uncompressed_roundtrip():
    script = decompress_script(4, GEN_X)
    assert script[0] == 65 and script[-1] == 0xAC
    assert compress_script(script) == write_core_varint(4) + GEN_X


@pytest.mark.parametrize(
    "script",
    [
        EATER_SCRIPT,
        bytes([0xA9, 20]) + H20 + bytes([0x87]),
        bytes([33, 2]) + GEN_X + bytes([0xAC]),
        b"\x6a\x04test",  # OP_RETURN raw
        b"\x00\x14" + H20,  # witness v0 raw
        b"",
    ],
)
def test_script_compress_decode_roundtrip(script):
    blob = compress_script(script)
    got, pos = decode_script(blob, 0)
    assert got == script
    assert pos == len(blob)


@given(st.binary(min_size=0, max_size=120))
def test_raw_script_roundtrip(raw):
    blob = compress_script(raw)
    got, pos = decode_script(blob, 0)
    assert got == raw
    assert pos == len(blob)


def test_decode_script_truncation_raises():
    blob = compress_script(EATER_SCRIPT)[:-3]
    with pytest.raises(ValueError):
        decode_script(blob, 0)


# ---------- header (main.rs:171-196) ----------

def test_header_roundtrip():
    raw = build_header(12345, version=2, network="mainnet", block_hash=b"\xab" * 32)
    h = parse_header(raw)
    assert h.version == 2
    assert h.network == "mainnet"
    assert h.num_utxos == 12345
    assert h.block_hash_hex == "ab" * 32


def test_header_bad_magic():
    raw = bytearray(build_header(1))
    raw[0] = 0x00
    with pytest.raises(ValueError):
        parse_header(bytes(raw))


def test_header_truncated():
    with pytest.raises(ValueError):
        parse_header(build_header(1)[:20])


class TestAddress:
    """base58check + script→address (kernels/address.py)."""

    def test_base58check_canonical_vector(self):
        # the classic bitcoin-wiki worked example
        from utxo_to_parquet_spark.kernels.address import base58check_encode

        h160 = bytes.fromhex("010966776006953D5567439E5E39F86A0D273BEE")
        assert base58check_encode(0x00, h160) == "16UwLL9Risc3QfPqBUvKofHmBQ7wMtjvM"

    def test_leading_zero_payload(self):
        from utxo_to_parquet_spark.kernels.address import base58check_encode

        addr = base58check_encode(0x00, b"\x00" * 20)
        assert addr.startswith("11")  # version zero byte + zero payload byte

    def test_script_templates(self):
        from utxo_to_parquet_spark.kernels.address import script_to_address

        h160 = bytes.fromhex("010966776006953D5567439E5E39F86A0D273BEE")
        p2pkh = bytes([0x76, 0xA9, 20]) + h160 + bytes([0x88, 0xAC])
        p2sh = bytes([0xA9, 20]) + h160 + bytes([0x87])
        assert script_to_address(p2pkh) == "16UwLL9Risc3QfPqBUvKofHmBQ7wMtjvM"
        assert script_to_address(p2sh).startswith("3")  # mainnet P2SH prefix
        assert script_to_address(b"\x6a\x01\x00") is None  # OP_RETURN: no address
        # P2PK resolves to the pubkey's P2PKH address
        pub = bytes([33, 2]) + b"\x11" * 32 + bytes([0xAC])
        a = script_to_address(pub)
        assert a is not None and a[0] == "1"

    def test_bech32_bip173_vector(self):
        # BIP-173's worked P2WPKH example
        from utxo_to_parquet_spark.kernels.address import (
            script_to_address,
            witness_script_to_address,
        )

        prog = bytes.fromhex("751e76e8199196d454941c45d1b3a323f1433bd6")
        script = bytes([0x00, 0x14]) + prog
        want = "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4"
        assert witness_script_to_address(script) == want
        assert script_to_address(script) == want  # dispatch falls through
        # 32-byte program (P2WSH) encodes too; other shapes do not
        assert witness_script_to_address(bytes([0x00, 0x20]) + b"\x01" * 32)
        assert witness_script_to_address(b"\x51\x14" + b"\x01" * 20) is None


# ---------------------------------------------------------------- image


def test_ppm_roundtrip_random():
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_ppm, encode_ppm

    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (6, 5), (7, 8), (16, 3)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        dw, dh, out = decode_ppm(encode_ppm(arr))
        assert (dw, dh) == (w, h)
        assert (out == arr).all()


def test_ppm_header_comments_and_whitespace():
    """The P6 header grammar allows comments between any two tokens and
    arbitrary whitespace runs; the raster must start exactly one byte
    after the maxval."""
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_ppm

    raster = bytes(range(2 * 1 * 3))
    payload = b"P6 # comment\n  2 # width done\n\t1\n# before maxval\n255 " + raster
    w, h, px = decode_ppm(payload)
    assert (w, h) == (2, 1)
    assert px.tobytes() == raster
    # whitespace-valued raster bytes right after the maxval terminator
    # must NOT be consumed as header whitespace
    raster2 = b"\n\n\n\n\n\n"
    w, h, px = decode_ppm(b"P6\n2 1\n255\n" + raster2)
    assert px.tobytes() == raster2


def test_bmp_roundtrip_every_padding_case():
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_bmp, encode_bmp

    rng = np.random.default_rng(4)
    for w in (5, 6, 7, 8):  # strides pad 1, 2, 3, 0 bytes
        arr = rng.integers(0, 256, size=(6, w, 3), dtype=np.uint8)
        payload = encode_bmp(arr)
        assert len(payload) == 54 + ((w * 3 + 3) & ~3) * 6
        dw, dh, out = decode_bmp(payload)
        assert (dw, dh) == (w, 6)
        assert (out == arr).all()


def test_bmp_is_really_bottom_up_bgr():
    """Pin the storage layout itself, not just the roundtrip: the first
    raster byte of the file must be the BLUE channel of the BOTTOM-LEFT
    pixel. A matched encoder/decoder bug pair would pass a roundtrip;
    this asserts against the spec."""
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_bmp, encode_bmp

    arr = np.zeros((2, 1, 3), dtype=np.uint8)
    arr[0, 0] = (1, 2, 3)  # top pixel RGB
    arr[1, 0] = (4, 5, 6)  # bottom pixel RGB
    payload = encode_bmp(arr)
    assert payload[54:57] == bytes((6, 5, 4))  # bottom row first, BGR
    # top-down variant (negative height) decodes too
    import struct

    neg = bytearray(payload)
    struct.pack_into("<i", neg, 14 + 8, -2)
    flipped = bytes(neg)
    _, _, out = decode_bmp(flipped)
    assert (out == arr[::-1]).all()


def test_image_decode_errors_are_loud():
    import numpy as np
    import pytest

    from utxo_to_parquet_spark.kernels.image import (
        decode_image,
        decode_ppm,
        encode_ppm,
    )

    # GIF is a KNOWN magic since round 10 — a truncated one fails in
    # the GIF decoder, loudly; a genuinely unknown container still hits
    # the dispatcher's unknown-magic error
    with pytest.raises(ValueError, match="truncated GIF"):
        decode_image(b"GIF89a...")
    with pytest.raises(ValueError, match="unknown image magic"):
        decode_image(b"WEBPxx...")
    full = encode_ppm(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated PPM raster"):
        decode_ppm(full[:-1])
    with pytest.raises(ValueError, match="maxval 255"):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\0" * 6)


def test_png_roundtrip_exercises_all_five_filters():
    """encode_png rotates the scanline filter per row (y % 5), so any
    image with >= 5 rows drives every unfilter path — assert the stored
    filter bytes really rotate, then that decode reconstructs exactly."""
    import zlib

    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_png, encode_png

    rng = np.random.default_rng(7)
    for w in (1, 5, 8, 13):
        arr = rng.integers(0, 256, size=(7, w, 3), dtype=np.uint8)
        payload = encode_png(arr)
        # IHDR is 8(sig)+8(hdr)+13(data)+4(crc); IDAT data starts at +8
        idat_off = 8 + 25 + 8
        raw = zlib.decompress(payload[idat_off : -12 - 4])
        stride = w * 3
        filters = [raw[y * (stride + 1)] for y in range(7)]
        assert filters == [0, 1, 2, 3, 4, 0, 1]
        dw, dh, out = decode_png(payload)
        assert (dw, dh) == (w, 7)
        assert (out == arr).all()


def test_png_layout_pinned_against_spec():
    """Decode a hand-assembled PNG (independent of encode_png): 2x2 RGB,
    row 0 filter None, row 1 filter Up — so the expected raster bytes
    are written out per the spec by hand, catching any matched
    encoder/decoder bug pair. Also: IDAT split across two chunks is one
    zlib stream, and an ancillary chunk is skipped."""
    import struct
    import zlib

    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_png

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    top = bytes((10, 20, 30, 40, 50, 60))  # two RGB pixels, stored raw
    deltas = bytes((1, 2, 3, 4, 5, 6))  # row 1 = row 0 + deltas (filter Up)
    stream = zlib.compress(b"\x00" + top + b"\x02" + deltas)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"tEXt", b"Comment\x00ancillary, must be skipped")
        + chunk(b"IDAT", stream[: len(stream) // 2])
        + chunk(b"IDAT", stream[len(stream) // 2 :])
        + chunk(b"IEND", b"")
    )
    w, h, out = decode_png(payload)
    assert (w, h) == (2, 2)
    expect = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[11, 22, 33], [44, 55, 66]]],
        dtype=np.uint8,
    )
    assert (out == expect).all()


def test_png_decode_errors_are_loud():
    import struct
    import zlib

    import numpy as np
    import pytest

    from utxo_to_parquet_spark.kernels.image import decode_png, encode_png

    full = encode_png(np.zeros((6, 4, 3), dtype=np.uint8))

    bad = bytearray(full)
    bad[40] ^= 0xFF  # flip a byte inside IDAT data
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(bad))

    with pytest.raises(ValueError, match="truncated PNG chunk"):
        decode_png(full[:-6])

    # 16-bit / paletted / unknown-interlace headers must be refused, not
    # misread (Adam7 itself is SUPPORTED since round 11 — flipping the
    # interlace byte on a sequential stream is tested separately below).
    # IHDR data occupies bytes 16..28 (sig 8 + len 4 + type 4):
    # width@16 height@20 depth@24 color@25 comp@26 filter@27 interlace@28
    for field_off, val, msg in (
        (24, 16, "only 8-bit truecolor"),  # bit depth 16
        (25, 3, "only 8-bit truecolor"),  # color type: palette
        (28, 2, "interlace"),  # unknown interlace method
    ):
        hacked = bytearray(full)
        hacked[field_off] = val
        # re-seal the IHDR CRC so the type check (not CRC) is what fires
        ihdr = bytes(hacked[12:29])
        import zlib as _z

        struct.pack_into(">I", hacked, 29, _z.crc32(ihdr) & 0xFFFFFFFF)
        with pytest.raises(ValueError, match=msg):
            decode_png(bytes(hacked))

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNX" + full[4:])

    # a SEQUENTIAL stream mislabeled as Adam7 must fail loudly (the
    # pass rasters won't tile the byte stream), never decode garbage
    hacked = bytearray(full)
    hacked[28] = 1
    ihdr = bytes(hacked[12:29])
    struct.pack_into(">I", hacked, 29, zlib.crc32(ihdr) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="PNG"):
        decode_png(bytes(hacked))


def test_pubkey_decompress_matches_group_law():
    """Cross-derivation check: the kernel reconstructs Y from (parity, X)
    via the modular square root; the query module derives the same
    points as generator multiples via the affine group law. For 1G..32G
    the two must agree byte-for-byte — a wrong sqrt branch, parity
    flip, or endianness bug cannot pass both derivations."""
    from utxo_to_parquet_spark.kernels.script import (
        decompress_pubkey,
        decompress_script,
    )
    from utxo_to_parquet_spark.operators.utxo_queries import _g_multiples

    for k, x, y in _g_multiples(32):
        prefix = 2 + (y & 1)
        sec = decompress_pubkey(prefix, x.to_bytes(32, "big"))
        assert sec == b"\x04" + x.to_bytes(32, "big") + y.to_bytes(32, "big"), k
        # and through the type-4/5 script template (main.rs:145-161)
        script = decompress_script(4 + (y & 1), x.to_bytes(32, "big"))
        assert script == bytes([65]) + sec + bytes([0xAC]), k


def test_png_bad_ihdr_length_and_chunk_before_ihdr_raise_valueerror():
    """Malformed-but-CRC-valid structures must fail with the module's
    contractual ValueError, never a leaked struct.error: an IHDR whose
    data is not 13 bytes, and any chunk arriving before IHDR."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from utxo_to_parquet_spark.kernels.image import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    # IHDR with 12 data bytes but a correct CRC
    short_ihdr = struct.pack(">IIBBBB", 2, 2, 8, 2, 0, 0)
    payload = _PNG_SIG + _png_chunk(b"IHDR", short_ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IHDR length"):
        decode_png(payload)

    # IDAT before IHDR (CRC-valid, spec-violating order)
    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    raw = zlib.compress(bytes(2 * (1 + 2 * 3)))
    payload = _PNG_SIG + _png_chunk(b"IDAT", raw) + good[8:]
    with pytest.raises(ValueError, match="before IHDR"):
        decode_png(payload)


def test_qoi_roundtrip_adversarial_mixes():
    """Round-trip across pixel regimes chosen to hit every chunk op:
    random (RGB/INDEX), constant (RUN incl. the 62-length cap), tiny
    deltas (DIFF), green-anchored deltas (LUMA)."""
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_qoi, encode_qoi

    rng = np.random.default_rng(7)
    for trial in range(60):
        h, w = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        kind = trial % 4
        if kind == 0:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif kind == 1:
            px = np.full((h, w, 3), int(rng.integers(0, 256)), dtype=np.uint8)
        elif kind == 2:
            base = rng.integers(0, 256, 3)
            px = (base + rng.integers(-2, 2, (h, w, 3))).astype(np.uint8)
        else:
            base = rng.integers(0, 256, 3)
            px = (base + rng.integers(-30, 30, (h, w, 3))).astype(np.uint8)
        w2, h2, out = decode_qoi(encode_qoi(px))
        assert (w2, h2) == (w, h)
        assert (out == px).all()
    long_run = np.zeros((1, 200, 3), dtype=np.uint8)
    long_run[0, :, 0] = 7
    _, _, out = decode_qoi(encode_qoi(long_run))
    assert (out == long_run).all()


def test_qoi_layout_pinned_against_spec():
    """Byte-level pin of the QOI spec: header fields, op tags, and the
    rolling-state semantics — catches a wrong hash multiplier, bias, or
    table-update order that a round-trip alone cannot (encoder and
    decoder could share the same bug)."""
    import struct

    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_qoi, encode_qoi

    # 3 pixels: (10,20,30), run of 2
    px = np.array([[[10, 20, 30], [10, 20, 30], [10, 20, 30]]], dtype=np.uint8)
    enc = encode_qoi(px)
    assert enc[:4] == b"qoif"
    w, h, ch, cs = struct.unpack(">IIBB", enc[4:14])
    assert (w, h, ch, cs) == (3, 1, 3, 0)
    # first pixel differs from the (0,0,0) start by (+10,+20,+30): RGB op
    assert enc[14] == 0xFE and enc[15:18] == bytes((10, 20, 30))
    # then a run of 2: 0b11 tag with bias -1
    assert enc[18] == (0xC0 | 1)
    assert enc[19:] == b"\x00" * 7 + b"\x01"

    # hand-built stream decoding INDEX after an eviction-free insert:
    # px1=(3,5,7) inserted at hash (3*3+5*5+7*7+255*11)%64
    idx = (3 * 3 + 5 * 5 + 7 * 7 + 255 * 11) % 64
    stream = (
        b"qoif"
        + struct.pack(">IIBB", 3, 1, 3, 0)
        + bytes((0xFE, 3, 5, 7))  # RGB (3,5,7)
        + bytes((0xFE, 200, 200, 200))  # RGB different pixel
        + bytes((idx,))  # INDEX back to (3,5,7)
        + b"\x00" * 7
        + b"\x01"
    )
    w2, h2, out = decode_qoi(stream)
    assert (w2, h2) == (3, 1)
    assert out.tolist() == [[[3, 5, 7], [200, 200, 200], [3, 5, 7]]]

    # DIFF op: pixel (1,2,3) then 0b01_11_00_10 -> dr=+1, dg=-2, db=0
    stream2 = (
        b"qoif"
        + struct.pack(">IIBB", 2, 1, 3, 0)
        + bytes((0xFE, 1, 2, 3))
        + bytes((0x40 | (3 << 4) | (0 << 2) | 2,))
        + b"\x00" * 7
        + b"\x01"
    )
    _, _, out2 = decode_qoi(stream2)
    assert out2.tolist() == [[[1, 2, 3], [2, 0, 3]]]

    # LUMA op: dg=+5 (0x80|37), dr-dg=-3 (5), db-dg=+2 (10)
    stream3 = (
        b"qoif"
        + struct.pack(">IIBB", 2, 1, 3, 0)
        + bytes((0xFE, 100, 100, 100))
        + bytes((0x80 | 37, (5 << 4) | 10))
        + b"\x00" * 7
        + b"\x01"
    )
    _, _, out3 = decode_qoi(stream3)
    assert out3.tolist() == [[[100, 100, 100], [102, 105, 107]]]


def test_qoi_decode_errors_are_loud():
    import struct

    import numpy as np
    import pytest

    from utxo_to_parquet_spark.kernels.image import decode_qoi, encode_qoi

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    full = encode_qoi(px)
    with pytest.raises(ValueError, match="magic"):
        decode_qoi(b"qoix" + full[4:])
    with pytest.raises(ValueError, match="end marker"):
        decode_qoi(full[:-1])
    with pytest.raises(ValueError, match="channels"):
        decode_qoi(b"qoif" + struct.pack(">IIBB", 1, 1, 7, 0) + full[14:])
    # declared 2x2 but stream only yields one pixel
    short = (
        b"qoif"
        + struct.pack(">IIBB", 2, 2, 3, 0)
        + bytes((0xFE, 1, 2, 3))
        + b"\x00" * 7
        + b"\x01"
    )
    with pytest.raises(ValueError, match="ended before"):
        decode_qoi(short)
    # run overflowing the pixel count
    over = (
        b"qoif"
        + struct.pack(">IIBB", 2, 1, 3, 0)
        + bytes((0xFE, 1, 2, 3))
        + bytes((0xC0 | 61,))
        + b"\x00" * 7
        + b"\x01"
    )
    with pytest.raises(ValueError, match="overflows"):
        decode_qoi(over)


# ---------------------------------------------------------------- WAV


def test_wav_roundtrip_mono_and_stereo():
    import numpy as np

    from utxo_to_parquet_spark.kernels.audio import decode_wav, encode_wav

    rng = np.random.default_rng(11)
    for ch in (1, 2, 4):
        for n in (1, 7, 256):
            arr = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
            rate, dch, out = decode_wav(encode_wav(arr, 44100))
            assert (rate, dch) == (44100, ch)
            assert np.array_equal(out, arr)


def test_wav_layout_pinned_against_spec():
    """Byte-level pin of the canonical (no-LIST) layout: a regression in
    chunk order, field packing, or little-endianness changes these
    exact bytes."""
    import struct

    import numpy as np

    from utxo_to_parquet_spark.kernels.audio import encode_wav

    arr = np.array([[1, -2], [3, -4]], dtype=np.int16)  # 2 frames, stereo
    b = encode_wav(arr, 8000, with_list_chunk=False)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    assert struct.unpack_from("<I", b, 4)[0] == len(b) - 8
    assert b[12:16] == b"fmt " and struct.unpack_from("<I", b, 16)[0] == 16
    tag, ch, rate, byte_rate, block, bits = struct.unpack_from("<HHIIHH", b, 20)
    assert (tag, ch, rate, byte_rate, block, bits) == (1, 2, 8000, 32000, 4, 16)
    assert b[36:40] == b"data" and struct.unpack_from("<I", b, 40)[0] == 8
    assert b[44:] == struct.pack("<4h", 1, -2, 3, -4)
    assert len(b) == 52


def test_wav_list_chunk_is_skipped_by_size():
    import numpy as np

    from utxo_to_parquet_spark.kernels.audio import decode_wav, encode_wav

    arr = np.arange(10, dtype=np.int16).reshape(5, 2)
    with_list = encode_wav(arr, 16000, with_list_chunk=True)
    without = encode_wav(arr, 16000, with_list_chunk=False)
    assert len(with_list) > len(without)  # LIST + pad byte present
    for payload in (with_list, without):
        rate, ch, out = decode_wav(payload)
        assert (rate, ch) == (16000, 2)
        assert np.array_equal(out, arr)


def test_wav_decode_errors_are_loud():
    import struct

    import numpy as np
    import pytest

    from utxo_to_parquet_spark.kernels.audio import decode_wav, encode_wav

    good = encode_wav(np.zeros((4, 1), dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="not a WAVE"):
        decode_wav(good[:8] + b"AVI " + good[12:])
    with pytest.raises(ValueError, match="overruns"):
        decode_wav(good[:4] + struct.pack("<I", len(good)) + good[8:])
    with pytest.raises(ValueError, match="truncated|no data|overruns"):
        decode_wav(good[:-3])
    # data before fmt: swap by rebuilding a minimal file
    data = b"data" + struct.pack("<I", 2) + b"\x00\x00"
    body = b"WAVE" + data
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="before fmt"):
        decode_wav(raw)
    # non-PCM tag
    bad = bytearray(encode_wav(np.zeros((4, 1), dtype=np.int16), 8000,
                               with_list_chunk=False))
    struct.pack_into("<H", bad, 20, 85)  # format tag = MP3
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(bad))
    # partial frame in data chunk (stereo block_align=4, 6 bytes of data)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    chunks = (b"fmt " + struct.pack("<I", 16) + fmt
              + b"data" + struct.pack("<I", 6) + b"\x00" * 6)
    raw = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(ValueError, match="whole frames"):
        decode_wav(raw)


def test_jpeg_roundtrip_block_constant_sweep():
    """decode(encode(px)) must be bit-exact for every constant block
    value 0..255 (the DC-exact contract: all-8s quant tables make the
    quantized DC equal the level-shifted value, T.81 A.3.1/F.1)."""
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_jpeg, encode_jpeg

    for v in range(256):
        vals = (np.arange(6) * 37 + v) % 256
        img = np.repeat(
            np.repeat(vals.reshape(2, 3), 8, axis=0), 8, axis=1
        ).astype(np.uint8)
        w, h, px = decode_jpeg(encode_jpeg(img))
        assert (w, h) == (24, 16)
        assert np.array_equal(px, img), v


def test_jpeg_layout_pinned_against_spec():
    """Pin the emitted byte layout to T.81/JFIF: marker order, Annex K
    DHT payloads, SOF0 fields, and the hand-derived entropy segment of
    the all-128 block (level-shifted DC = 0: DC category-0 code '00' +
    EOB '1010' + 1-pad = 0b00101011 = 0x2B exactly)."""
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import (
        _JPEG_AC_LUM,
        _JPEG_DC_LUM,
        encode_jpeg,
    )

    img = np.full((8, 8), 128, np.uint8)
    buf = encode_jpeg(img)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    # APP0 JFIF 1.1
    assert buf[2:4] == b"\xff\xe0" and buf[6:11] == b"JFIF\x00"
    # DQT: all-8s table 0
    i = buf.index(b"\xff\xdb")
    assert buf[i + 4] == 0x00 and buf[i + 5 : i + 69] == bytes([8] * 64)
    # SOF0: precision 8, 8x8, 1 component, sampling 0x11, quant table 0
    i = buf.index(b"\xff\xc0")
    assert buf[i + 4 : i + 13] == bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    # DHT DC-lum: class/id 0x00 then the exact Annex K.3.3 BITS+HUFFVAL
    i = buf.index(b"\xff\xc4")
    bits, vals = _JPEG_DC_LUM
    assert buf[i + 4] == 0x00
    assert buf[i + 5 : i + 21] == bytes(bits)
    assert buf[i + 21 : i + 21 + 12] == bytes(vals)
    # DHT AC-lum follows with class/id 0x10 and 162 Annex K values
    j = buf.index(b"\xff\xc4", i + 2)
    bits_a, vals_a = _JPEG_AC_LUM
    assert buf[j + 4] == 0x10
    assert buf[j + 5 : j + 21] == bytes(bits_a)
    assert buf[j + 21 : j + 21 + 162] == bytes(vals_a)
    # SOS header then the single hand-derived entropy byte
    k = buf.index(b"\xff\xda")
    assert buf[k + 4 : k + 10] == bytes([1, 1, 0x00, 0, 63, 0])
    assert buf[k + 10 : -2] == b"\x2b"


def test_jpeg_byte_stuffing_roundtrips():
    """0xFF bytes in the entropy stream must be stuffed with 0x00
    (F.1.2.3) and unstuffed on decode: sweep alternating 0/255 block
    images across widths until the alignment produces a raw 0xFF."""
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_jpeg, encode_jpeg

    saw_stuffing = False
    for bw in range(1, 9):
        vals = np.tile([0, 255], bw * 2)[: bw * 2].reshape(2, bw)
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
        buf = encode_jpeg(img)
        body = buf[buf.index(b"\xff\xda") :]
        saw_stuffing = saw_stuffing or b"\xff\x00" in body
        w, h, px = decode_jpeg(buf)
        assert np.array_equal(px, img), bw
    assert saw_stuffing


def test_jpeg_rgb_restart_markers_reset_predictors():
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(11)
    vals = rng.randint(0, 256, size=(2, 6))
    gray = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    rgb = np.stack([gray] * 3, axis=-1)
    buf = encode_jpeg(rgb, restart_interval=2)
    # RST0..RST5 appear in order between every 2 MCUs (12 MCUs -> 5 RSTs)
    rsts = [buf[i + 1] - 0xD0 for i in range(len(buf) - 1)
            if buf[i] == 0xFF and 0xD0 <= buf[i + 1] <= 0xD7]
    assert rsts == [0, 1, 2, 3, 4]
    w, h, px = decode_jpeg(buf)
    assert np.array_equal(px, rgb)


def test_jpeg_420_mcu_walk_layout_pinned():
    """Pin the 4:2:0 MCU interleave to T.81 A.2.3 by hand-deriving the
    entropy bytes of a single 16x16 MCU whose four 8x8 quadrants are
    129/130/131/132 (gray r==g==b, so Y == value and Cb == Cr == 128):

    - Y blocks walk ROW-MAJOR (TL, TR, BL, BR), so the DC diffs are
      +1,+1,+1,+1: DC-lum cat-1 code '010' + magnitude bit '1' + AC-lum
      EOB '1010' = 0b01011010 = 0x5A per block. A column-major walk
      would give diffs +1,+2,-1,+2 and different bytes.
    - Cb then Cr follow as ONE block each (level-shifted DC 0: DC-chr
      cat-0 '00' + AC-chr EOB '00'), packing to the single byte 0x00.
    - SOF0 advertises luma 0x22, chroma 0x11.
    """
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_jpeg, encode_jpeg

    vals = np.array([[129, 130], [131, 132]], dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    rgb = np.stack([img] * 3, axis=-1)
    buf = encode_jpeg(rgb, sampling="4:2:0")
    i = buf.index(b"\xff\xc0")
    assert buf[i + 4 : i + 19] == bytes(
        [8, 0, 16, 0, 16, 3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    k = buf.index(b"\xff\xda")
    assert buf[k + 4 : k + 12] == bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0])
    assert buf[k + 14 : -2] == bytes([0x5A, 0x5A, 0x5A, 0x5A, 0x00])
    w, h, px = decode_jpeg(buf)
    assert (w, h) == (16, 16)
    assert np.array_equal(px, rgb)


def test_jpeg_422_mcu_walk_layout_pinned():
    """Same pin for 4:2:2: one 16x8 MCU, two Y blocks left-to-right
    (DC diffs +1,+1 -> 0x5A 0x5A) then Cb, Cr (0x00)."""
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_jpeg, encode_jpeg

    vals = np.array([[129, 130]], dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    rgb = np.stack([img] * 3, axis=-1)
    buf = encode_jpeg(rgb, sampling="4:2:2")
    i = buf.index(b"\xff\xc0")
    assert buf[i + 4 : i + 19] == bytes(
        [8, 0, 8, 0, 16, 3, 1, 0x21, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    k = buf.index(b"\xff\xda")
    assert buf[k + 14 : -2] == bytes([0x5A, 0x5A, 0x00])
    w, h, px = decode_jpeg(buf)
    assert (w, h) == (16, 8)
    assert np.array_equal(px, rgb)


def test_jpeg_subsampled_roundtrip_sweep():
    """decode(encode(px)) bit-exact for MCU-tile-constant images across
    both subsampled layouts, value sweep, and restart intervals."""
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_jpeg, encode_jpeg

    for v0 in (0, 7, 99, 200, 255):
        vals = ((np.arange(6) * 53 + v0) % 256).reshape(2, 3)
        for samp, rh, rw in [("4:2:0", 16, 16), ("4:2:2", 8, 16)]:
            img = np.repeat(
                np.repeat(vals, rh, axis=0), rw, axis=1
            ).astype(np.uint8)
            rgb = np.stack([img] * 3, axis=-1)
            for rst in (0, 1, 2):
                buf = encode_jpeg(rgb, restart_interval=rst, sampling=samp)
                w, h, px = decode_jpeg(buf)
                assert (w, h) == (3 * rw, 2 * rh)
                assert np.array_equal(px, rgb), (v0, samp, rst)


def test_jpeg_decode_errors_are_loud():
    import numpy as np
    import pytest

    from utxo_to_parquet_spark.kernels.image import decode_jpeg, encode_jpeg

    img = np.full((8, 8), 100, np.uint8)
    buf = bytearray(encode_jpeg(img))
    # SOF2 is SUPPORTED since round 11, but a baseline scan header
    # relabeled progressive is an invalid scan script (Ss=0 with Se=63)
    # and must still fail loudly
    i = buf.index(b"\xff\xc0")
    prog = bytes(buf[: i + 1]) + b"\xc2" + bytes(buf[i + 2 :])
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(prog)
    # genuinely unsupported SOFn still raise by name (lossless SOF3)
    lossless = bytes(buf[: i + 1]) + b"\xc3" + bytes(buf[i + 2 :])
    with pytest.raises(ValueError, match="SOF3"):
        decode_jpeg(lossless)
    # single-component scans are non-interleaved (T.81 A.2.2): sampling
    # factors are normalized to 1x1, so a grayscale stream claiming
    # 0x22 still decodes to the same pixels
    sub = bytearray(buf)
    sub[i + 11] = 0x22  # H/V byte of component 1 in SOF0
    w, h, px = decode_jpeg(bytes(sub))
    assert np.array_equal(px, img)
    # sampling factor out of the 1..4 range
    bad = bytearray(buf)
    bad[i + 11] = 0x50
    with pytest.raises(ValueError, match="out of range"):
        decode_jpeg(bytes(bad))
    # non-integer upsampling ratio: 4:2:0 luma (2x2) with a 3x3 chroma
    rgb = np.stack([np.full((16, 16), 100, np.uint8)] * 3, axis=-1)
    cbuf = bytearray(encode_jpeg(rgb, sampling="4:2:0"))
    ic = cbuf.index(b"\xff\xc0")
    cbuf[ic + 14] = 0x33  # H/V byte of component 2 (Cb)
    with pytest.raises(ValueError, match="non-integer upsampling"):
        decode_jpeg(bytes(cbuf))
    # 16-bit quant table
    j = buf.index(b"\xff\xdb")
    q16 = bytearray(buf)
    q16[j + 4] = 0x10
    with pytest.raises(ValueError, match="16-bit"):
        decode_jpeg(bytes(q16))
    # missing SOI
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00" + bytes(buf[2:]))


def test_jpeg_dispatches_through_decode_image():
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_image, encode_jpeg

    img = np.full((8, 8), 31, np.uint8)
    fmt, w, h, px = decode_image(encode_jpeg(img))
    assert (fmt, w, h) == ("jpeg", 8, 8)
    assert px.shape == (8, 8, 3) and np.all(px == 31)


def test_exif_roundtrip_both_byte_orders():
    from utxo_to_parquet_spark.kernels.exif import decode_exif, encode_exif

    for be in (False, True):
        blob = encode_exif(
            width=1920, height=1080, make="acme photo", orientation=6,
            datetime="2024:05:01 12:34:56", iso=400, exposure=(1, 125),
            big_endian=be,
        )
        got = decode_exif(blob)
        assert got == {
            "byte_order": "MM" if be else "II",
            "width": 1920, "height": 1080, "make": "acme photo",
            "orientation": 6, "datetime": "2024:05:01 12:34:56",
            "iso": 400, "exposure": (1, 125),
        }


def test_exif_layout_pinned_against_spec():
    """Pin the byte layout to TIFF 6.0: header II/42/offset-8, entry
    count, ascending tag order, inline SHORT padding, and out-of-line
    ASCII placement after the IFD."""
    import struct

    from utxo_to_parquet_spark.kernels.exif import encode_exif

    blob = encode_exif(
        width=640, height=480, make="zz", orientation=1,
        datetime="2024:01:01 00:00:00", iso=100, exposure=(1, 50),
    )
    assert blob[:8] == b"II" + struct.pack("<HI", 42, 8)
    (n,) = struct.unpack_from("<H", blob, 8)
    assert n == 6
    tags = [struct.unpack_from("<H", blob, 10 + 12 * k)[0] for k in range(n)]
    assert tags == sorted(tags) == [0x0100, 0x0101, 0x010F, 0x0112, 0x0132, 0x8769]
    # make == "zz" -> 3 bytes with NUL, INLINE (<=4), zero-padded to 4
    k = tags.index(0x010F)
    tag, typ, count = struct.unpack_from("<HHI", blob, 10 + 12 * k)
    assert (typ, count) == (2, 3)
    assert blob[10 + 12 * k + 8 : 10 + 12 * k + 12] == b"zz\x00\x00"
    # datetime (20 bytes with NUL) is out-of-line right after the IFD
    k = tags.index(0x0132)
    tag, typ, count, off = struct.unpack_from("<HHII", blob, 10 + 12 * k)
    assert (typ, count) == (2, 20)
    assert off == 8 + 2 + 12 * 6 + 4  # first out-of-line slot
    assert blob[off : off + 20] == b"2024:01:01 00:00:00\x00"


def test_exif_decode_errors_are_loud():
    import pytest

    from utxo_to_parquet_spark.kernels.exif import decode_exif, encode_exif

    blob = bytearray(
        encode_exif(
            width=10, height=10, make="m", orientation=1,
            datetime="2024:01:01 00:00:00", iso=100, exposure=(1, 50),
        )
    )
    with pytest.raises(ValueError, match="byte order"):
        decode_exif(b"XX" + bytes(blob[2:]))
    bad_magic = bytearray(blob)
    bad_magic[2] = 43
    with pytest.raises(ValueError, match="magic"):
        decode_exif(bytes(bad_magic))
    with pytest.raises(ValueError, match="EOF"):
        decode_exif(bytes(blob[:40]))
    # unknown value type
    import struct as _s
    bad_type = bytearray(blob)
    _s.pack_into("<H", bad_type, 10 + 2, 9)  # first entry's type -> 9
    with pytest.raises(ValueError, match="unknown TIFF type"):
        decode_exif(bytes(bad_type))


def test_gif_layout_pinned_against_spec():
    """Pin the GIF87a byte layout and the LZW packing by hand: the 2x2
    image [[65,66],[65,66]] emits codes CLEAR(256), 65, 66, 258, EOI(257)
    — the third pixel pair (65,66) re-uses table entry 258 created by
    the first — all at 9 bits, LSB-first, which packs to exactly
    00 83 08 11 18 10 (derived by hand from the spec's packing rule,
    not from the implementation)."""
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_gif, encode_gif

    buf = encode_gif(np.array([[65, 66], [65, 66]], dtype=np.uint8))
    assert buf[:6] == b"GIF87a"
    assert buf[6:8] == b"\x02\x00" and buf[8:10] == b"\x02\x00"  # 2x2
    assert buf[10] == 0xF7  # GCT present, 256 entries
    # grayscale identity palette
    assert buf[13:16] == b"\x00\x00\x00" and buf[778:781] == b"\xff\xff\xff"
    assert buf[781] == 0x2C  # image descriptor
    assert buf[791] == 8  # LZW min code size
    assert buf[792] == 6  # one 6-byte sub-block
    assert buf[793:799] == b"\x00\x83\x08\x11\x18\x10"
    assert buf[799] == 0 and buf[800] == 0x3B
    w, h, px = decode_gif(buf)
    assert (w, h) == (2, 2)
    assert np.array_equal(px, [[65, 66], [65, 66]])


def test_gif_lzw_width_bump_and_kwkwk():
    """Cross the 512-entry 9->10 bit boundary (and beyond) with
    incompressible data, and stress the KwKwK special case with a
    constant image — both must round-trip byte-exact."""
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_gif, encode_gif

    rng = np.random.RandomState(7)
    big = rng.randint(0, 256, size=(64, 64)).astype(np.uint8)
    w, h, px = decode_gif(encode_gif(big))
    assert np.array_equal(px, big)
    const = np.full((30, 40), 200, np.uint8)
    w, h, px = decode_gif(encode_gif(const))
    assert np.array_equal(px, const)


def test_gif_table_full_mid_stream_clear():
    """Force the 4096-entry table cap: enough low-entropy data to fill
    the dictionary makes the encoder emit a mid-stream CLEAR; the
    decoder must resynchronize and still reproduce the pixels."""
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_gif, encode_gif

    px_in = np.tile(np.arange(256, dtype=np.uint8), 400).reshape(400, 256)
    w, h, px = decode_gif(encode_gif(px_in))
    assert (w, h) == (256, 400)
    assert np.array_equal(px, px_in)


def test_gif_dispatches_through_decode_image():
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_image, encode_gif

    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    fmt, w, h, px = decode_image(encode_gif(g))
    assert fmt == "gif" and (w, h) == (8, 8)
    assert px.shape == (8, 8, 3)
    assert np.array_equal(px[:, :, 0], g)


def test_gif_decode_errors_are_loud():
    import numpy as np
    import pytest

    from utxo_to_parquet_spark.kernels.image import decode_gif, encode_gif

    buf = bytearray(encode_gif(np.full((8, 8), 9, np.uint8)))
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + bytes(buf[6:]))
    # interlace flag on the image descriptor
    bad = bytearray(buf)
    bad[781 + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(bad))
    # truncated LZW stream: chop the sub-block contents
    with pytest.raises(ValueError):
        decode_gif(bytes(buf[:794]) + b"\x00\x3b")


def test_tga_roundtrip_and_packets():
    """RLE and uncompressed TGA round-trip byte-exact; run packets cap
    at 128 pixels and never cross rows; bottom-up variant decodes."""
    import numpy as np

    from utxo_to_parquet_spark.kernels.image import decode_tga, encode_tga

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(9, 17, 3)).astype(np.uint8)
    for rle in (True, False):
        w, h, out = decode_tga(encode_tga(px, rle=rle))
        assert (w, h) == (17, 9)
        assert np.array_equal(out, px)
    # a constant 2x400 image: 400-px rows must split into 128-cap run
    # packets that stop at the row boundary (4 packets/row: 128+128+128+16)
    const = np.full((2, 400, 3), 9, np.uint8)
    buf = encode_tga(const)
    assert len(buf) == 18 + 2 * 4 * 4  # header + 8 packets x (1+3) bytes
    w, h, out = decode_tga(buf)
    assert np.array_equal(out, const)
    # bottom-up storage (descriptor bit 5 clear): flip rows on decode
    flipped = bytearray(encode_tga(px, rle=False))
    flipped[17] = 0x00
    w, h, out = decode_tga(bytes(flipped))
    assert np.array_equal(out, px[::-1])


def test_tga_decode_errors_are_loud():
    import numpy as np
    import pytest

    from utxo_to_parquet_spark.kernels.image import decode_tga, encode_tga

    buf = encode_tga(np.full((4, 4, 3), 7, np.uint8))
    with pytest.raises(ValueError, match="truncated TGA header"):
        decode_tga(buf[:10])
    bad = bytearray(buf)
    bad[2] = 3  # grayscale type unsupported
    with pytest.raises(ValueError, match="unsupported"):
        decode_tga(bytes(bad))
    with pytest.raises(ValueError, match="truncated TGA RLE"):
        decode_tga(buf[:-2])

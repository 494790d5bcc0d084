"""Round-12 kernel tests: FLAC codec (spec-pinned bitstreams for the
paths the encoder never emits), plus the GIF89a animation additions.

Reference parity note: the reference repo (romanz/utxo-to-parquet,
src/main.rs) has no audio surface; FLAC extends the LLM-pipeline
multimodal family (SURVEY.md "beyond the reference" mandate) next to
WAV/G.711/ADPCM.
"""

import struct

import numpy as np
import pytest

from utxo_to_parquet_spark.kernels.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded,
    decode_flac,
    encode_flac,
)


def _streaminfo(n, ch, bps, rate=8000, block_size=16, md5=b"\x00" * 16):
    info = struct.pack(">HH", block_size, block_size)
    info += (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
    packed = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | n
    info += packed.to_bytes(8, "big") + md5
    return b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info


def _frame_header(nb, ca, frame_no=0):
    hdr = _BitWriter()
    hdr.put(0b11111111111110, 14)
    hdr.put(0, 2)  # reserved + fixed blocking
    hdr.put(6, 4)  # 8-bit blocksize-1 follows
    hdr.put(0, 4)  # sample rate from STREAMINFO
    hdr.put(ca, 4)
    hdr.put(0, 4)  # sample size from STREAMINFO + reserved
    for b in _utf8_coded(frame_no):
        hdr.put(b, 8)
    hdr.put(nb - 1, 8)
    hdr.align()
    head = bytearray(hdr.bytes())
    head.append(_crc8(bytes(head)))
    return head


def _close_frame(head, bw):
    bw.align()
    body = bytes(head) + bw.bytes()
    return body + _crc16(body).to_bytes(2, "big")


def test_flac_roundtrip_shapes():
    rng = np.random.default_rng(7)
    for shape, bps, rate in (
        ((500, 1), 16, 8000),
        ((1000, 2), 16, 44100),
        ((64, 3), 8, 16000),
        ((200, 2), 24, 96000),
    ):
        lo, hi = -(1 << (bps - 1)), 1 << (bps - 1)
        x = rng.integers(lo, hi, size=shape).astype(np.int64)
        rate2, ch, out = decode_flac(encode_flac(x, rate, bps=bps))
        assert (rate2, ch) == (rate, shape[1])
        assert (out == x).all()


def test_flac_multiframe_and_constant_subframes():
    # > 1 frame; ramps compress via FIXED predictors, constants via
    # CONSTANT subframes — both must survive the frame walk exactly
    x = np.stack(
        [np.arange(10000, dtype=np.int64) % 3000 - 1500,
         np.full(10000, 42, dtype=np.int64)], axis=1
    )
    buf = encode_flac(x, 8000, block_size=4096)
    rate, ch, out = decode_flac(buf)
    assert (out == x).all()
    assert len(buf) < x.size * 2 * 0.25  # the ramp is predictable


def test_flac_lpc_subframe_handbuilt():
    """LPC path pinned by a hand-built bitstream: order 2, precision 4,
    shift 1, coefs [3, -1] — x[i] = res[i] + ((3*x[i-1] - x[i-2]) >> 1)
    per the spec's integer arithmetic."""
    warm = [10, 12]
    res = [1, -2, 0, 3]
    nb = len(warm) + len(res)
    head = _frame_header(nb, ca=0)
    bw = _BitWriter()
    bw.put(0, 1)
    bw.put(0b100001, 6)  # LPC order 2: 1xxxxx with (t & 31) + 1 = 2
    bw.put(0, 1)  # no wasted bits
    for w in warm:
        bw.put(w, 16)
    bw.put(4 - 1, 4)  # precision 4
    bw.put(1, 5)  # shift 1
    bw.put(3, 4)  # coef[0] = 3
    bw.put(-1, 4)  # coef[1] = -1
    bw.put(0, 2)  # rice method 0
    bw.put(0, 4)  # partition order 0
    bw.put(0, 4)  # k = 0
    for r in res:
        u = (r << 1) ^ (-1 if r < 0 else 0)
        bw.put_unary(u)
    payload = _streaminfo(nb, 1, 16) + _close_frame(head, bw)
    _, _, out = decode_flac(payload)
    exp = list(warm)
    for r in res:
        exp.append(r + ((3 * exp[-1] - exp[-2]) >> 1))
    assert out[:, 0].tolist() == exp


@pytest.mark.parametrize("ca", [8, 9, 10])
def test_flac_stereo_decorrelation_handbuilt(ca):
    """left/side, right/side and mid/side assignments, hand-built with
    VERBATIM subframes (side channel carries bps+1 bits)."""
    L = [100, -50, 3, 0]
    R = [90, -60, 7, -1]
    nb = len(L)
    side = [a - b for a, b in zip(L, R)]
    mid = [(a + b) >> 1 for a, b in zip(L, R)]
    chans = {8: (L, side), 9: (side, R), 10: (mid, side)}[ca]
    widths = {8: (16, 17), 9: (17, 16), 10: (16, 17)}[ca]
    head = _frame_header(nb, ca=ca)
    bw = _BitWriter()
    for vals, w in zip(chans, widths):
        bw.put(0, 1)
        bw.put(0b000001, 6)  # VERBATIM
        bw.put(0, 1)
        for v in vals:
            bw.put(v, w)
    payload = _streaminfo(nb, 2, 16) + _close_frame(head, bw)
    _, ch, out = decode_flac(payload)
    assert ch == 2
    assert out[:, 0].tolist() == L
    assert out[:, 1].tolist() == R


def test_flac_partitioned_rice_with_escape():
    """Partition order 1 (two partitions): the first Rice-coded with
    k=2, the second an ESCAPE partition of raw 6-bit residuals."""
    nb = 8
    order = 1
    warm = [5]
    res = [3, -1, 0, 30, -17, 8, -25]  # 3 in part 0, 4 in part 1
    head = _frame_header(nb, ca=0)
    bw = _BitWriter()
    bw.put(0, 1)
    bw.put(0b001000 | order, 6)  # FIXED order 1
    bw.put(0, 1)
    for w in warm:
        bw.put(w, 16)
    bw.put(0, 2)  # rice method 0
    bw.put(1, 4)  # partition order 1
    bw.put(2, 4)  # part 0: k = 2
    for r in res[:3]:
        u = (r << 1) ^ (-1 if r < 0 else 0)
        bw.put_unary(u >> 2)
        bw.put(u & 3, 2)
    bw.put(15, 4)  # part 1: escape
    bw.put(6, 5)  # 6 raw bits per residual
    for r in res[3:]:
        bw.put(r, 6)
    payload = _streaminfo(nb, 1, 16) + _close_frame(head, bw)
    _, _, out = decode_flac(payload)
    exp = list(warm)
    for r in res:
        exp.append(r + exp[-1])
    assert out[:, 0].tolist() == exp


def test_flac_wasted_bits():
    """A CONSTANT subframe with 2 wasted bits: the coded value is
    shifted left by the wasted count after decode."""
    nb = 4
    head = _frame_header(nb, ca=0)
    bw = _BitWriter()
    bw.put(0, 1)
    bw.put(0, 6)  # CONSTANT
    bw.put(1, 1)  # wasted-bits flag
    bw.put_unary(1)  # unary 1 -> wasted = 2
    bw.put(-3, 14)  # bps 16 minus 2 wasted
    payload = _streaminfo(nb, 1, 16) + _close_frame(head, bw)
    _, _, out = decode_flac(payload)
    assert (out[:, 0] == -12).all()  # -3 << 2


def test_flac_validation_raises_loudly():
    x = np.arange(100, dtype=np.int64)[:, None]
    buf = bytearray(encode_flac(x, 8000))
    # frame CRC-16: flip the last byte
    bad = bytearray(buf)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(bad))
    # header CRC-8: flip a frame-header byte (just after STREAMINFO)
    bad = bytearray(buf)
    bad[4 + 4 + 34 + 2] ^= 0x01  # inside the frame header
    with pytest.raises(ValueError, match="CRC|sync|reserved|contradicts|coded"):
        decode_flac(bytes(bad))
    # STREAMINFO MD5 mismatch
    bad = bytearray(buf)
    bad[4 + 4 + 18] ^= 0xFF  # first MD5 byte
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad))
    # sample-count mismatch
    bad = bytearray(buf)
    bad[4 + 4 + 17] ^= 0x01  # low byte of the 36-bit total
    with pytest.raises(ValueError, match="STREAMINFO says"):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"fLaX" + bytes(buf[4:]))
    with pytest.raises(ValueError, match="empty"):
        encode_flac(np.zeros((0, 1), dtype=np.int64), 8000)
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.array([[40000]]), 8000, bps=16)


def test_flac_utf8_coded_number_roundtrip():
    from utxo_to_parquet_spark.kernels.flac import _BitReader, _read_utf8_coded

    for v in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
              (1 << 21) - 1, 1 << 26, (1 << 36) - 1):
        enc = _utf8_coded(v)
        assert _read_utf8_coded(_BitReader(enc)) == v
    with pytest.raises(ValueError, match="36 bits"):
        _utf8_coded(1 << 36)

# --- GIF89a animation --------------------------------------------------------


def _anim_fixtures():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, size=(8, 10)).astype(np.uint8)
    pa = rng.integers(0, 256, size=(3, 4)).astype(np.uint8)
    pb = rng.integers(0, 256, size=(2, 5)).astype(np.uint8)
    return base, pa, pb


def test_gif_anim_compositing_disposal2():
    """Sub-rectangle paste then restore-to-background: frame 2 must see
    frame 1's rect wiped to the LSD background index."""
    from utxo_to_parquet_spark.kernels.image import (
        decode_gif_anim,
        encode_gif_anim,
    )

    base, pa, pb = _anim_fixtures()
    bg = 7
    buf = encode_gif_anim(10, 8, [
        (0, 0, base, 1, 10, None),
        (2, 3, pa, 2, 5, None),
        (4, 1, pb, 1, 5, None),
    ], background=bg)
    w, h, frames = decode_gif_anim(buf)
    assert (w, h, len(frames)) == (10, 8, 3)
    assert (frames[0] == base).all()
    c1 = base.copy()
    c1[3:6, 2:6] = pa
    assert (frames[1] == c1).all()
    c2 = base.copy()
    c2[3:6, 2:6] = bg
    c2[1:3, 4:9] = pb
    assert (frames[2] == c2).all()


def test_gif_anim_transparency_and_disposal3():
    """Transparent patch pixels leave the canvas unchanged; disposal 3
    restores the PRE-frame canvas before the next frame renders."""
    from utxo_to_parquet_spark.kernels.image import (
        decode_gif_anim,
        encode_gif_anim,
    )

    base, _, _ = _anim_fixtures()
    pt = np.array([[1, 200], [200, 1]], dtype=np.uint8)
    buf = encode_gif_anim(10, 8, [
        (0, 0, base, 1, 0, None),
        (0, 0, pt, 3, 0, 1),
        (1, 1, pt, 0, 0, None),
    ], background=7)
    _, _, fr = decode_gif_anim(buf)
    c1 = base.copy()
    m = pt != 1
    c1[0:2, 0:2][m] = pt[m]
    assert (fr[1] == c1).all()
    c2 = base.copy()  # disposal 3 restored the base canvas
    c2[1:3, 1:3] = pt
    assert (fr[2] == c2).all()


def test_gif_anim_validation():
    from utxo_to_parquet_spark.kernels.image import (
        decode_gif,
        decode_gif_anim,
        encode_gif_anim,
    )

    base, pa, _ = _anim_fixtures()
    with pytest.raises(ValueError, match="exceeds the logical screen"):
        encode_gif_anim(10, 8, [(8, 6, pa, 1, 0, None)])
    with pytest.raises(ValueError, match="disposal"):
        encode_gif_anim(10, 8, [(0, 0, base, 4, 0, None)])
    with pytest.raises(ValueError, match="at least one frame"):
        encode_gif_anim(10, 8, [])
    buf = encode_gif_anim(10, 8, [(0, 0, base, 1, 0, None)])
    with pytest.raises(ValueError, match="trailer"):
        decode_gif_anim(buf[:-1])
    with pytest.raises(ValueError, match="GIF89a"):
        decode_gif_anim(b"GIF87a" + buf[6:])
    # a full-canvas 89a first frame is still readable by the static
    # 87a-era reader (it skips GCE/NETSCAPE extensions by size)
    w, h, px = decode_gif(buf)
    assert (w, h) == (10, 8)
    assert (px == base).all()

# --- soft-EM unigram E-step ---------------------------------------------------


def _write_docs12(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))


def _soft_em_bruteforce(rows):
    """Independent reimplementation: seed vocab + octave weights, then
    EXPLICIT path enumeration per word (weight = prod of w8), expected
    counts as exact integer ratios — the forward-backward identity the
    operator must reproduce."""
    import math
    from collections import Counter

    wf = Counter()
    for _, text, _ in rows:
        for w in text.split(" "):
            if w:
                wf[w] += 1
    cand = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for j in range(i + 1, min(i + 4, len(w)) + 1):
                cand[w[i:j]] += f
    vocab = {t: f for t, f in cand.items() if len(t) == 1}
    multi = sorted(
        ((t, f) for t, f in cand.items() if len(t) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:200]
    vocab.update(dict(multi))
    score = {t: math.floor(math.log(f) * 1e6 + 0.5) for t, f in vocab.items()}
    mx = max(score.values())
    w8 = {t: max(1, 8 - (mx - s) // 1386294) for t, s in score.items()}

    def paths(w):
        if not w:
            return [([], 1)]
        out = []
        for ln in range(1, min(4, len(w)) + 1):
            piece = w[:ln]
            if piece in w8:
                for rest, wt in paths(w[ln:]):
                    out.append(([piece] + rest, wt * w8[piece]))
        return out

    agg = {}
    for w, f in wf.items():
        if len(w) > 10:
            continue
        ps = paths(w)
        den = sum(wt for _, wt in ps)
        num = Counter()
        for toks, wt in ps:
            for t in toks:
                num[t] += wt
        for t, n in num.items():
            e6 = n * 1000000 // den
            cur = agg.setdefault(t, [0, 0])
            cur[0] += 1
            cur[1] += f * e6
    return w8, agg


def test_unigram_soft_em_matches_bruteforce(tmp_path, spark):
    from utxo_to_parquet_spark.operators.text import q_text_unigram_soft_em

    rows = [
        (1, "abca bc a cab abca", "web"),
        (2, "bc bc cab a abca ab", "web"),
        (3, "dd ddd abca d", "books"),
    ]
    _write_docs12(tmp_path, rows)
    w8, agg = _soft_em_bruteforce(rows)
    got = {r.token: r for r in
           q_text_unigram_soft_em(spark, str(tmp_path)).collect()}
    assert set(got) == set(agg)
    for t, (n_words, soft) in agg.items():
        assert got[t].w8 == w8[t], t
        assert got[t].n_words == n_words, t
        assert got[t].soft_freq_e6 == soft, t


def test_unigram_soft_vs_hard_em_disagree(tmp_path, spark):
    """The constructed disagreement: on a corpus of one repeated word
    'ab', Viterbi uses only the whole-word piece (hard EM prunes 'a'
    and 'b' entirely), while soft EM spreads posterior mass over the
    two-piece path as well — nonzero expected counts for 'a' and 'b'."""
    from utxo_to_parquet_spark.operators.text import (
        q_text_unigram_hard_em,
        q_text_unigram_soft_em,
    )

    rows = [(1, "ab ab ab", "web"), (2, "ab ab", "web")]
    _write_docs12(tmp_path, rows)
    hard = {r.token: r.viterbi_freq for r in
            q_text_unigram_hard_em(spark, str(tmp_path)).collect()}
    soft = {r.token: r.soft_freq_e6 for r in
            q_text_unigram_soft_em(spark, str(tmp_path)).collect()}
    assert hard == {"ab": 5}  # 'a'/'b' pruned by the argmax path
    assert soft["ab"] > 0 and soft["a"] > 0 and soft["b"] > 0
    # and the soft counts are the exact enumerated posterior:
    # paths for 'ab': [ab] weight 8, [a, b] weight 8*8=64 with w8(a)=
    # w8(b)=w8(ab)=8 (equal freqs) -> den=72, E[ab]=8/72, E[a]=64/72
    assert soft["ab"] == 5 * (8 * 1000000 // 72)
    assert soft["a"] == 5 * (64 * 1000000 // 72)

# --- BI_RLE8 inter-frame AVI ---------------------------------------------------


def test_rle8_handbuilt_stream_semantics():
    """Escape semantics pinned byte-by-byte on a 4x4 canvas: encoded
    run, DELTA cursor move (skipped pixels untouched), end-of-line,
    absolute mode with its word pad, end-of-bitmap."""
    from utxo_to_parquet_spark.kernels.video import _rle8_apply

    canvas = np.full((4, 4), 99, np.uint8)
    data = bytes(
        [3, 5]            # run: 3 pixels of 5 at (x=0, y=0 bottom row)
        + [0, 2, 0, 2]    # delta: skip to (x=3, y=2)
        + [1, 7]          # run: 1 pixel of 7 at (3, 2)
        + [0, 0]          # end of line -> (0, 3)
        + [0, 3, 1, 2, 3, 0]  # absolute: 3 literals + word pad
        + [0, 1]          # end of bitmap
    )
    _rle8_apply(canvas, data)
    exp = np.full((4, 4), 99, np.uint8)
    exp[3, 0:3] = 5       # bottom row is y=0 -> array row h-1-0 = 3
    exp[1, 3] = 7         # y=2 -> array row 1
    exp[0, 0:3] = [1, 2, 3]  # y=3 (top row)
    assert (canvas == exp).all()


def test_rle8_avi_roundtrip_and_delta_sizes():
    from utxo_to_parquet_spark.kernels.video import (
        _rle8_frame,
        decode_avi_rle8,
        encode_avi_rle8,
    )

    rng = np.random.default_rng(9)
    f0 = rng.integers(0, 256, size=(12, 20)).astype(np.uint8)
    f1 = f0.copy()
    f1[3:6, 4:9] = rng.integers(0, 256, size=(3, 5)).astype(np.uint8)
    f2 = f1.copy()
    f2[10, :] = 77
    fps, out = decode_avi_rle8(encode_avi_rle8([f0, f1, f2], fps=10))
    assert fps == 10 and len(out) == 3
    for got, want in zip(out, (f0, f1, f2)):
        assert (got == want).all()
    # the inter-frame point: delta frames are much smaller than the key
    key = len(_rle8_frame(None, f0))
    assert len(_rle8_frame(f0, f1)) < key / 3
    assert len(_rle8_frame(f1, f2)) < key / 3
    assert len(_rle8_frame(f0, f0)) == 2  # identical frame = just EOB


def test_rle8_validation():
    from utxo_to_parquet_spark.kernels.video import (
        _rle8_apply,
        decode_avi_rle8,
        encode_avi_rle8,
    )

    c = np.zeros((2, 4), np.uint8)
    with pytest.raises(ValueError, match="overruns"):
        _rle8_apply(c.copy(), bytes([5, 1, 0, 1]))
    with pytest.raises(ValueError, match="truncated"):
        _rle8_apply(c.copy(), bytes([2, 1]))
    with pytest.raises(ValueError, match="trailing"):
        _rle8_apply(c.copy(), bytes([0, 1, 9]))
    with pytest.raises(ValueError, match="outside"):
        _rle8_apply(c.copy(), bytes([0, 2, 9, 0, 0, 1]))
    f0 = np.arange(8, dtype=np.uint8).reshape(2, 4)
    buf = bytearray(encode_avi_rle8([f0, f0]))
    # flip the second idx1 entry's flags to AVIIF_KEYFRAME: only frame
    # 0 may carry it
    i = bytes(buf).rindex(b"00dc")
    import struct as _s
    _s.pack_into("<I", buf, i + 4, 0x10)
    with pytest.raises(ValueError, match="keyframe"):
        decode_avi_rle8(bytes(buf))
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_rle8([])

# --- property round trips (hypothesis) ----------------------------------------


def test_flac_roundtrip_property():
    """decode(encode(x)) == x for arbitrary int16 streams, any channel
    count 1-3, block sizes that do and don't divide the length."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from utxo_to_parquet_spark.kernels.flac import decode_flac, encode_flac

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.integers(-32768, 32767), min_size=1, max_size=300),
        st.integers(1, 3),
        st.sampled_from([16, 17, 64]),
    )
    def check(vals, ch, bs):
        if len(vals) < ch:
            vals = vals * ch
        n = len(vals) // ch
        x = np.array(vals[: n * ch], dtype=np.int64).reshape(n, ch)
        _, dch, out = decode_flac(encode_flac(x, 8000, block_size=bs))
        assert dch == ch
        assert (out == x).all()

    check()


def test_rle8_roundtrip_property():
    """Composited RLE8 AVI frames reproduce every input frame exactly
    for arbitrary frame sequences (keyframe + deltas)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from utxo_to_parquet_spark.kernels.video import (
        decode_avi_rle8,
        encode_avi_rle8,
    )

    @settings(max_examples=25, deadline=None)
    @given(st.data())
    def check(data):
        h = data.draw(st.integers(1, 8))
        w = data.draw(st.integers(1, 12))
        n = data.draw(st.integers(1, 4))
        rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
        frames = [rng.integers(0, 256, size=(h, w)).astype(np.uint8)]
        for _ in range(n - 1):
            f = frames[-1].copy()
            if data.draw(st.booleans()):  # mutate a random rect
                y0 = data.draw(st.integers(0, h - 1))
                x0 = data.draw(st.integers(0, w - 1))
                f[y0:, x0:] = rng.integers(
                    0, 256, size=f[y0:, x0:].shape
                ).astype(np.uint8)
            frames.append(f)
        _, out = decode_avi_rle8(encode_avi_rle8(frames, fps=5))
        assert len(out) == len(frames)
        for a, b in zip(out, frames):
            assert (a == b).all()

    check()

# --- container sniffing --------------------------------------------------------


def test_sniff_format_signatures():
    """Every library container re-identifies from its magic bytes, and
    the no-magic TGA fallback never shadows a real signature."""
    from utxo_to_parquet_spark.kernels.audio import encode_wav
    from utxo_to_parquet_spark.kernels.flac import encode_flac
    from utxo_to_parquet_spark.kernels.image import (
        encode_bmp,
        encode_gif,
        encode_gif_anim,
        encode_jpeg,
        encode_png,
        encode_ppm,
        encode_qoi,
        encode_tga,
    )
    from utxo_to_parquet_spark.kernels.sniff import sniff_format
    from utxo_to_parquet_spark.kernels.video import (
        encode_avi_mjpeg,
        encode_avi_rle8,
    )

    gray = np.full((8, 8), 70, np.uint8)
    rgb = np.stack([gray] * 3, axis=-1)
    pcm = np.full((16, 1), -5, np.int16)
    cases = {
        "png": encode_png(rgb),
        "gif": encode_gif(gray),
        "gif_anim": encode_gif_anim(8, 8, [(0, 0, gray, 1, 0, None)]),
        "jpeg": encode_jpeg(rgb),
        "bmp": encode_bmp(rgb),
        "qoi": encode_qoi(rgb),
        "tga": encode_tga(rgb),
        "ppm": encode_ppm(rgb),
        "wav": encode_wav(pcm, 8000),
        "flac": encode_flac(pcm, 8000),
        "avi_mjpeg": encode_avi_mjpeg([gray]),
        "avi_rle8": encode_avi_rle8([gray, gray], fps=5),
    }
    for fmt, blob in cases.items():
        assert sniff_format(blob) == fmt, (fmt, blob[:16])
    assert sniff_format(b"") == "unknown"
    assert sniff_format(b"\x00" * 40) == "unknown"
    assert sniff_format(b"RIFF\x04\x00\x00\x00JUNK") == "riff"

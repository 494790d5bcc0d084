"""Round-11 constructed-case tests: GIF dispatcher/bounds hardening,
chi2 sqrt clamp, and the new operators added this round."""

import numpy as np
import pytest

from utxo_to_parquet_spark.kernels.image import (
    decode_gif,
    decode_image,
    encode_gif,
)


def _color_palette_gif() -> bytes:
    """encode_gif output with the grayscale-identity global color table
    patched to a non-identity palette (r=i, g=0, b=255-i)."""
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    raw = bytearray(encode_gif(px))
    # GCT starts right after the 13-byte header in encode_gif's layout
    for i in range(256):
        raw[13 + 3 * i : 13 + 3 * i + 3] = bytes([i, 0, 255 - i])
    return bytes(raw)


def test_decode_gif_color_palette_returns_rgb():
    w, h, px = decode_gif(_color_palette_gif())
    assert (w, h) == (4, 3)
    assert px.shape == (3, 4, 3)
    assert px[0, 2, 0] == 2 and px[0, 2, 1] == 0 and px[0, 2, 2] == 253


def test_decode_image_color_gif_keeps_rgb_contract():
    """ADVICE r10: a color-palette GIF must come out (h, w, 3), not a
    malformed 4-D stack of an already-RGB array."""
    kind, w, h, px = decode_image(_color_palette_gif())
    assert kind == "gif"
    assert px.shape == (3, 4, 3)


def test_decode_image_gray_gif_still_widens():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    kind, w, h, out = decode_image(encode_gif(px))
    assert out.shape == (3, 4, 3)
    assert (out[..., 0] == px).all() and (out[..., 1] == px).all()


def test_truncated_gif_extension_raises_value_error():
    """An 89a extension whose sub-blocks run off the end must raise the
    loud ValueError contract, not IndexError."""
    # header + screen descriptor (no GCT) + extension intro, then a
    # sub-block length pointing past the end of the payload
    payload = (
        b"GIF89a" + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + bytes([0x00, 0x00, 0x00])  # no GCT
        + bytes([0x21, 0xF9, 0xFF])  # extension, label, 255-byte sub-block
    )
    with pytest.raises(ValueError, match="truncated GIF"):
        decode_gif(payload)


def test_truncated_gif_image_descriptor_raises_value_error():
    payload = (
        b"GIF87a" + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + bytes([0x00, 0x00, 0x00])
        + bytes([0x2C, 0x00, 0x00])  # descriptor cut short
    )
    with pytest.raises(ValueError, match="truncated GIF"):
        decode_gif(payload)


def test_gif_missing_descriptor_after_extensions_raises():
    payload = (
        b"GIF87a" + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + bytes([0x00, 0x00, 0x00])
        + bytes([0x21, 0xFE, 0x01, 0x41, 0x00])  # complete comment ext
    )
    with pytest.raises(ValueError, match="GIF"):
        decode_gif(payload)


def test_chi2_negative_clamp_spark(spark):
    """ADVICE r10: e6 rounding can make chi2_e6 slightly negative on a
    near-independent table; the Cramér's V sqrt must clamp at 0 rather
    than produce NULL/NaN. Exercise the exact registered expression on
    a constructed independent 2x2 table (chi2 exactly 0, where any
    negative rounding residue would have surfaced pre-clamp)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", "x", -3)], "rf string, sm string, chi2_e6 long"
    )
    out = df.select(
        F.floor(
            F.sqrt(
                (F.greatest(F.col("chi2_e6"), F.lit(0)).cast("double") / F.lit(1e6))
                / F.lit(4.0)
            )
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long").alias("v")
    ).collect()
    assert out[0].v == 0

    import duckdb

    v = duckdb.sql(
        "SELECT CAST(FLOOR(SQRT((CAST(GREATEST(-3, 0) AS DOUBLE) / 1e6) / 4.0)"
        " * 1e6 + 0.5) AS BIGINT) AS v"
    ).fetchone()[0]
    assert v == 0


def test_suffix_ladder_memoized_per_session(spark):
    """The prefix-doubling ladder is the library's most expensive
    primitive; both SA consumers must share one build per (app, corpus)."""
    from utxo_to_parquet_spark.operators import text as T

    sf = "/root/testdata/sf0.001"
    key = (spark.sparkContext.applicationId, sf)
    T._SUFFIX_LADDER_CACHE.pop(key, None)
    first = T._suffix_levels(spark, sf)
    second = T._suffix_levels(spark, sf)
    assert second is first  # cache hit: identical tuple, no rebuild
    assert key in T._SUFFIX_LADDER_CACHE
    # a different corpus is a different key (no false sharing)
    assert (spark.sparkContext.applicationId, "/elsewhere") not in T._SUFFIX_LADDER_CACHE


def _write_documents(tmp_path, rows):
    """rows: list of (doc_id, text, source); full fixture schema."""
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


A = " ".join(f"a{i}" for i in range(8))
B = " ".join(f"b{i}" for i in range(8))


def _divergence_corpus(tmp_path):
    """doc1 repeats an 8-word phrase INTERNALLY (no cross-doc dup);
    doc2/doc3 share an 8-word phrase ACROSS documents; doc4 is all
    unique words. Every doc is 18 words."""
    _write_documents(
        tmp_path,
        [
            (1, f"{A} x0 x1 {A}", "s1"),
            (2, " ".join(f"c{i}" for i in range(5)) + f" {B} "
                + " ".join(f"d{i}" for i in range(5)), "s2"),
            (3, " ".join(f"e{i}" for i in range(5)) + f" {B} "
                + " ".join(f"f{i}" for i in range(5)), "s3"),
            (4, " ".join(f"u{i}" for i in range(18)), "s4"),
        ],
    )


def test_sa_coverage_counts_internal_repeats_shingles_do_not(tmp_path, spark):
    """The constructed divergence between the word-aligned shingle
    ledger (cross-document units only) and the exact SA ledger (Lee et
    al. 'within and across'): an internally-repeated phrase is coverage
    for the SA family and invisible to the shingle family, while a
    cross-document phrase gets identical coverage from both."""
    from utxo_to_parquet_spark.operators.dedup import (
        q_dedup_substring_removal,
    )
    from utxo_to_parquet_spark.operators.text import q_text_repeat_coverage

    _divergence_corpus(tmp_path)
    sf = str(tmp_path)
    sa = {r.doc_id: r for r in q_text_repeat_coverage(spark, sf).collect()}
    sh = {r.doc_id: r for r in q_dedup_substring_removal(spark, sf).collect()}

    # internal repeat: SA covers both copies (positions 0-7 and 10-17),
    # shingle ledger sees nothing (no OTHER document shares the units)
    assert sa[1].dup_words == 16 and sa[1].n_spans == 2
    assert sa[1].dup_ratio_e4 == 16 * 10000 // 18
    assert sh[1].dup_words == 0 and sh[1].n_spans == 0

    # cross-document phrase: both ledgers cover exactly the 8 words
    for d in (2, 3):
        assert sa[d].dup_words == 8 and sa[d].n_spans == 1
        assert sh[d].dup_words == 8 and sh[d].n_spans == 1

    # all-unique control: zero everywhere
    assert sa[4].dup_words == 0 and sh[4].dup_words == 0


def test_cascades_diverge_only_on_internal_repeat(tmp_path, spark):
    """End-to-end: the SA-driven cascade drops the internally-repeated
    doc at the substring stage (16/18 coverage >= the 50% cut) while the
    shingle cascade keeps it; every other doc is staged identically
    (cross-doc coverage 8/18 = 44% sits below the cut in both)."""
    from utxo_to_parquet_spark.operators.pipeline import (
        q_pipeline_dedup_cascade,
        q_pipeline_dedup_cascade_sa,
    )

    _divergence_corpus(tmp_path)
    sf = str(tmp_path)
    sh = {r.source: r for r in q_pipeline_dedup_cascade(spark, sf).collect()}
    sa = {r.source: r for r in q_pipeline_dedup_cascade_sa(spark, sf).collect()}

    assert sh["s1"].removed_substr == 0 and sh["s1"].n_kept == 1
    assert sa["s1"].removed_substr == 1 and sa["s1"].n_kept == 0
    for s in ("s2", "s3", "s4"):
        assert (sh[s].removed_exact, sh[s].removed_near,
                sh[s].removed_substr, sh[s].n_kept) == (
               sa[s].removed_exact, sa[s].removed_near,
               sa[s].removed_substr, sa[s].n_kept)


def test_bpe_decode_roundtrip_constructed(tmp_path, spark):
    """decode(encode(text)) == text on a merge-heavy constructed corpus:
    repeated letters exercise the greedy-leftmost fold ('aaaa' under
    merge (a,a) -> [aa, aa]), and a DOUBLED space proves the decoder's
    empty-word path (kept by posexplode, restored by COALESCE)."""
    import hashlib

    from utxo_to_parquet_spark.operators.text import q_text_bpe_decode

    docs = [
        (1, "aaaa aaa aa a banana bandana", "s1"),
        (2, "the cat  sat on the mat", "s1"),  # doubled space
        (3, "xyzzy plugh xyzzy", "s2"),
    ]
    _write_documents(tmp_path, docs)
    out = {r.doc_id: r for r in q_text_bpe_decode(spark, str(tmp_path)).collect()}
    assert len(out) == 3
    for doc_id, text, _ in docs:
        r = out[doc_id]
        assert r.roundtrip_ok is True, (doc_id, r)
        assert r.decoded_md5 == hashlib.md5(text.encode()).hexdigest()
        assert r.n_words == len(text.split(" "))


def test_bpe_trainer_memoized_per_session(spark):
    from utxo_to_parquet_spark.operators import text as T

    sf = "/root/testdata/sf0.001"
    key = (spark.sparkContext.applicationId, sf)
    T._BPE_TRAIN_CACHE.pop(key, None)
    first = T._bpe_train_cached(spark, sf)
    second = T._bpe_train_cached(spark, sf)
    assert second is first


# --- progressive JPEG (round-11: SOF2, T.81 Annex G) -------------------------


def test_progressive_jpeg_blockconstant_roundtrip():
    from utxo_to_parquet_spark.kernels.image import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    img = np.repeat(
        np.repeat((np.arange(6).reshape(2, 3) * 37 % 256).astype(np.uint8), 8, 0),
        8, 1,
    )
    buf = encode_jpeg_progressive(img)
    assert b"\xff\xc2" in buf  # really SOF2
    w, h, px = decode_jpeg(buf)
    assert (w, h) == (24, 16)
    assert np.array_equal(px, img)
    # subsampled color at MCU-constant granularity
    vals = (np.arange(4).reshape(2, 2) * 53 + 10).astype(np.uint8)
    rgb = np.stack([np.repeat(np.repeat(vals, 16, 0), 16, 1)] * 3, -1)
    w, h, px = decode_jpeg(encode_jpeg_progressive(rgb, sampling="4:2:0"))
    assert np.array_equal(px, rgb)


def test_progressive_equals_baseline_on_arbitrary_coefficients():
    """The differential pin for the whole Annex G entropy layer: the
    SAME quantized coefficients encoded progressively (spectral bands +
    successive approximation, custom uniform AC table with EOBn) and
    sequentially (Annex K tables) must decode to identical pixels —
    exercising ZRL, cross-block EOB runs, newly-nonzero refinement
    sign bits, and history-coefficient correction bits on real data."""
    from utxo_to_parquet_spark.kernels.image import (
        _encode_baseline_from_coefs,
        _encode_progressive_from_coefs,
        decode_jpeg,
    )

    rng = np.random.RandomState(7)
    for trial in range(12):
        bh, bw = rng.randint(1, 4), rng.randint(1, 4)
        arr = np.zeros((bh, bw, 64), np.int64)
        for by in range(bh):
            for bx in range(bw):
                nnz = rng.randint(0, 20)
                idx = rng.choice(64, size=nnz, replace=False)
                arr[by, bx, idx] = rng.randint(-200, 201, size=nnz)
                arr[by, bx, 0] = rng.randint(-120, 121)
        h, w = bh * 8, bw * 8
        _, _, p1 = decode_jpeg(_encode_baseline_from_coefs([arr], h, w, [(1, 1)]))
        _, _, p2 = decode_jpeg(_encode_progressive_from_coefs([arr], h, w, [(1, 1)]))
        assert np.array_equal(p1, p2), trial
    # color with 4:2:0 sampling: interleaved DC scan + per-plane AC
    for trial in range(4):
        mr, mc = rng.randint(1, 3), rng.randint(1, 3)
        coefs = []
        for (bh, bw) in ((2 * mr, 2 * mc), (mr, mc), (mr, mc)):
            arr = np.zeros((bh, bw, 64), np.int64)
            for by in range(bh):
                for bx in range(bw):
                    idx = rng.choice(64, size=rng.randint(0, 25), replace=False)
                    arr[by, bx, idx] = rng.randint(-150, 151, size=len(idx))
            coefs.append(arr)
        samps = [(2, 2), (1, 1), (1, 1)]
        b1 = _encode_baseline_from_coefs(coefs, mr * 16, mc * 16, samps)
        b2 = _encode_progressive_from_coefs(coefs, mr * 16, mc * 16, samps)
        _, _, p1 = decode_jpeg(b1)
        _, _, p2 = decode_jpeg(b2)
        assert np.array_equal(p1, p2), trial


def test_progressive_eob_run_and_refinement_paths():
    """Constructed coefficients that force the corner paths: a long
    all-zero block run (EOBn with r > 0), a 17-zero in-band gap (ZRL in
    refinement), and |coef|=1 newly-nonzero next to |coef|>1 history."""
    from utxo_to_parquet_spark.kernels.image import (
        _encode_baseline_from_coefs,
        _encode_progressive_from_coefs,
        decode_jpeg,
    )

    arr = np.zeros((1, 5, 64), np.int64)
    arr[0, 0, 1] = 7      # history coef (refined bit 1)
    arr[0, 0, 19] = -1    # newly nonzero in refinement, 17-gap -> ZRL
    arr[0, 0, 63] = 1     # newly nonzero at band end
    arr[0, 4, 0] = -50    # blocks 1-3 all zero: EOBRUN = 3 (r=1 EOBn)
    h, w = 8, 40
    _, _, p1 = decode_jpeg(_encode_baseline_from_coefs([arr], h, w, [(1, 1)]))
    _, _, p2 = decode_jpeg(_encode_progressive_from_coefs([arr], h, w, [(1, 1)]))
    assert np.array_equal(p1, p2)


# --- unigram LM tokenizer (seed vocab + Viterbi + hard-EM) -------------------


def _write_docs11(tmp_path, rows):
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


def _uni_train_py(rows):
    """Independent plain-Python reimplementation of the unigram seed
    trainer (same hyperparameters as operators.text)."""
    import math
    from collections import Counter

    wf = Counter()
    for _, text, _ in rows:
        for w in text.split(" "):
            if w:
                wf[w] += 1
    cand = Counter()
    for w, f in wf.items():
        for s in range(len(w)):
            for ln in range(1, min(4, len(w) - s) + 1):
                cand[w[s : s + ln]] += f
    vocab = {t: f for t, f in cand.items() if len(t) == 1}
    multi = sorted(
        ((t, f) for t, f in cand.items() if len(t) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:200]
    vocab.update(dict(multi))
    logt = math.floor(math.log(sum(vocab.values())) * 1e6 + 0.5)
    wt = {
        t: (math.floor(math.log(f) * 1e6 + 0.5) - logt) * 64 - 1
        for t, f in vocab.items()
    }
    return wf, vocab, wt


def _uni_viterbi_py(word, wt):
    best = [0]
    for i in range(1, len(word) + 1):
        best.append(
            max(
                best[s] + wt[word[s:i]]
                for s in range(max(0, i - 4), i)
                if word[s:i] in wt
            )
        )
    dp = best[-1]
    k = (-dp) % 64
    return dp, k, (dp + k) // 64, best


def _uni_backtrack_py(word, wt, best):
    i, toks = len(word), []
    while i > 0:
        starts = [
            s
            for s in range(max(0, i - 4), i)
            if word[s:i] in wt and best[s] + wt[word[s:i]] == best[i]
        ]
        s0 = min(starts)
        toks.append(word[s0:i])
        i = s0
    return toks


_UNI_ROWS = [
    (1, "abcabcabc xyz abca", "web"),
    (2, "xyz xyz qq abcabcabc", "web"),
    (3, "zz abca qq qq deadbeef", "books"),
]


def test_unigram_vocab_counts_multiplicity(tmp_path, spark):
    """Seed counts weight each occurrence POSITION: in 'abcabcabc'
    (freq 2 across docs 1+2) the substring 'abc' occurs 3 times per
    instance, 'abca' twice, so corpus counts must be 2x that plus the
    'abca' word's own contribution."""
    from utxo_to_parquet_spark.operators.text import q_text_unigram_vocab

    _write_docs11(tmp_path, _UNI_ROWS)
    out = {r.token: r for r in q_text_unigram_vocab(spark, str(tmp_path)).collect()}
    _, vocab, _ = _uni_train_py(_UNI_ROWS)
    assert {t: r.freq for t, r in out.items()} == vocab
    # 'abc': 3 per 'abcabcabc' instance (x2) + 1 per 'abca' (x2) = 8
    assert out["abc"].freq == 8
    # 'a' positions: 3 in 'abcabcabc' (freq 2), 2 in 'abca' (freq 2),
    # 1 in 'deadbeef' (freq 1)
    assert out["a"].freq == 2 * 3 + 2 * 2 + 1
    assert all(len(t) <= 4 for t in out)


def test_unigram_segment_matches_python_viterbi(tmp_path, spark):
    from utxo_to_parquet_spark.operators.text import q_text_unigram_segment

    _write_docs11(tmp_path, _UNI_ROWS)
    out = {
        r.doc_id: r for r in q_text_unigram_segment(spark, str(tmp_path)).collect()
    }
    _, _, wt = _uni_train_py(_UNI_ROWS)
    for doc_id, text, _ in _UNI_ROWS:
        words = [w for w in text.split(" ") if w]
        ks, ss = 0, 0
        for w in words:
            _, k, s, _ = _uni_viterbi_py(w, wt)
            ks += k
            ss += s
        r = out[doc_id]
        assert (r.n_words, r.n_tokens, r.neg_ll_e6) == (len(words), ks, -ss)


def test_unigram_hard_em_matches_python_backtrack(tmp_path, spark):
    """The E-step path counts must equal the independent Python
    backtrack (min-start tie-break), the refined vocab must be a subset
    of the seed, every backtracked path must concatenate to its word,
    and the refined vocab must still cover the corpus."""
    import math

    from utxo_to_parquet_spark.operators.text import q_text_unigram_hard_em

    _write_docs11(tmp_path, _UNI_ROWS)
    out = {
        r.token: r for r in q_text_unigram_hard_em(spark, str(tmp_path)).collect()
    }
    wf, vocab, wt = _uni_train_py(_UNI_ROWS)
    from collections import Counter

    usage = Counter()
    for w, f in wf.items():
        _, _, _, best = _uni_viterbi_py(w, wt)
        toks = _uni_backtrack_py(w, wt, best)
        assert "".join(reversed(toks)) == w  # path reassembles the word
        for t in toks:
            usage[t] += f
    assert {t: r.viterbi_freq for t, r in out.items()} == dict(usage)
    assert set(out) <= set(vocab)  # prune only, never invent tokens
    # refined scores renormalize over the refined totals
    logt2 = math.floor(math.log(sum(usage.values())) * 1e6 + 0.5)
    for t, r in out.items():
        assert r.logp2_e6 == math.floor(math.log(usage[t]) * 1e6 + 0.5) - logt2
    # re-segmentation feasibility: every word still coverable
    wt2 = {t: 1 for t in out}
    for w in wf:
        cover = [True] + [False] * len(w)
        for i in range(1, len(w) + 1):
            cover[i] = any(
                cover[s] and w[s:i] in wt2 for s in range(max(0, i - 4), i)
            )
        assert cover[len(w)], w


def test_distinct_substrings_matches_bruteforce(tmp_path, spark):
    """SA closed form vs literal enumeration: count distinct word
    tuples over all spans of all docs, including cross-document
    repeats ('b c' in docs 1 and 2 counts once)."""
    from utxo_to_parquet_spark.operators.text import q_text_distinct_substrings

    rows = [
        (1, "a b c a b", "web"),
        (2, "b c d", "web"),
        (3, "a b c a b", "books"),  # doc 1 verbatim: adds nothing new
    ]
    _write_docs11(tmp_path, rows)
    spans = set()
    total = 0
    for _, text, _ in rows:
        ws = text.split(" ")
        for i in range(len(ws)):
            for j in range(i + 1, len(ws) + 1):
                spans.add(tuple(ws[i:j]))
                total += 1
    out = q_text_distinct_substrings(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_positions == sum(len(t.split(" ")) for _, t, _ in rows)
    assert r.total_spans == total
    assert r.distinct_spans == len(spans)
    assert r.sum_lcp == total - len(spans)


# --- G.711 + IMA ADPCM kernels -----------------------------------------------


def test_g711_reference_vectors():
    """Spec-pinned code points: mu-law 0xFF is +0 and 0x80 is the top
    segment midpoint 32124; A-law 0x80^0x55=0xD5 is +8 and 0x2A is the
    negative full-scale midpoint -32256."""
    from utxo_to_parquet_spark.kernels.g711 import decode_alaw, decode_ulaw

    assert decode_ulaw(np.array([0xFF], np.uint8))[0] == 0
    assert decode_ulaw(np.array([0x80], np.uint8))[0] == 32124
    assert decode_ulaw(np.array([0x00], np.uint8))[0] == -32124
    assert decode_alaw(np.array([0xD5], np.uint8))[0] == 8
    assert decode_alaw(np.array([0x2A], np.uint8))[0] == -32256


def test_g711_roundtrip_properties():
    """Over the FULL int16 domain: reconstruction is monotone, the
    error is bounded by the top-segment half step (+ clip loss for
    mu-law), and companding is idempotent on codebook points."""
    from utxo_to_parquet_spark.kernels.g711 import (
        decode_alaw,
        decode_ulaw,
        encode_alaw,
        encode_ulaw,
    )

    x = np.arange(-32768, 32768, dtype=np.int16)
    for enc, dec, bound in (
        (encode_ulaw, decode_ulaw, 644),
        (encode_alaw, decode_alaw, 512),
    ):
        d = dec(enc(x)).astype(np.int32)
        assert np.all(np.diff(d) >= 0)
        assert np.abs(d - x.astype(np.int32)).max() == bound
        # idempotence: decoded values re-encode to the same code — up to
        # mu-law's minus-zero duality (0x7F and 0xFF both decode to 0,
        # and 0 re-encodes to the positive form)
        a, b = enc(d.astype(np.int16)), enc(x)
        diff = np.nonzero(a != b)[0]
        assert set(a[diff].tolist()) <= {0xFF} and set(b[diff].tolist()) <= {0x7F}


def test_g711_wav_container_tags():
    """Tag 7/6 files must round-trip through the chunk walker and
    reject inconsistent fmt fields loudly."""
    import struct

    import pytest

    from utxo_to_parquet_spark.kernels.audio import decode_wav, encode_wav
    from utxo_to_parquet_spark.kernels.g711 import decode_ulaw, encode_ulaw

    arr = np.array([[0, 100], [-5000, 32767], [12345, -32768]], np.int16)
    raw = encode_wav(arr, 8000, codec="ulaw")
    rate, ch, out = decode_wav(raw)
    assert (rate, ch) == (8000, 2)
    assert (out == decode_ulaw(encode_ulaw(arr)).reshape(-1, 2)).all()
    # patch fmt bits 8 -> 16: tag 7 with 16-bit samples must raise
    bad = bytearray(raw)
    i = bad.index(b"fmt ")
    (tag,) = struct.unpack_from("<H", bad, i + 8)
    assert tag == 7
    struct.pack_into("<H", bad, i + 8 + 14, 16)
    with pytest.raises(ValueError, match="requires 8-bit"):
        decode_wav(bytes(bad))


def test_adpcm_decoder_mirrors_encoder_state():
    from utxo_to_parquet_spark.kernels.g711 import (
        ima_adpcm_decode,
        ima_adpcm_encode,
    )

    rng = np.random.default_rng(11)
    pcm = rng.integers(-32768, 32768, 300).astype(np.int16)
    nib, fpred, fidx = ima_adpcm_encode(pcm)
    dec = ima_adpcm_decode(nib)
    assert int(dec[-1]) == fpred
    assert nib.max() <= 15
    # smooth signal: after lock-in the tracking error is tiny relative
    # to full scale (the quantizer step adapts down)
    t = np.arange(400)
    smooth = (3000 * np.sin(t / 10)).astype(np.int16)
    nib2, _, fidx2 = ima_adpcm_encode(smooth)
    dec2 = ima_adpcm_decode(nib2).astype(np.int32)
    assert np.abs(dec2[50:] - smooth[50:].astype(np.int32)).max() < 128
    # constant signal drives the step index to the floor (clamp at 0)
    const = np.zeros(100, dtype=np.int16)
    _, _, fidx3 = ima_adpcm_encode(const)
    assert fidx3 == 0


def test_adpcm_nonzero_initial_state():
    from utxo_to_parquet_spark.kernels.g711 import (
        ima_adpcm_decode,
        ima_adpcm_encode,
    )

    pcm = np.array([100, 200, -300, 4000, -32768, 32767], np.int16)
    nib, fp, fi = ima_adpcm_encode(pcm, predictor=-1234, index=40)
    dec = ima_adpcm_decode(nib, predictor=-1234, index=40)
    assert int(dec[-1]) == fp
    nib2, fp2, _ = ima_adpcm_encode(pcm)
    assert fp2 != fp  # state actually matters


# --- PNG Adam7 + MJPEG AVI video ----------------------------------------------


def test_png_adam7_roundtrip_all_sizes():
    """Every pass-grid edge case: sizes where some passes are empty
    (1x1 has only pass 1; 2x3, 5x7 exercise partial passes) plus sizes
    crossing the 8x8 tile."""
    from utxo_to_parquet_spark.kernels.image import decode_png, encode_png

    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (2, 3), (7, 5), (8, 8), (9, 10), (16, 17), (3, 1), (1, 9)]:
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        raw = encode_png(px, interlace=True)
        dw, dh, out = decode_png(raw)
        assert (dw, dh) == (w, h) and (out == px).all(), (h, w)
        # the interlaced payload is a genuinely different byte stream
        assert raw != encode_png(px)


def test_png_adam7_ihdr_flag_and_truncation():
    from utxo_to_parquet_spark.kernels.image import decode_png, encode_png

    px = np.arange(12 * 10 * 3, dtype=np.uint8).reshape(12, 10, 3) % 256
    raw = bytearray(encode_png(px, interlace=True))
    i = raw.index(b"IHDR")
    assert raw[i + 4 + 12] == 1  # interlace byte set
    # unknown interlace method must fail loudly
    import struct
    import zlib

    bad = bytearray(raw)
    bad[i + 4 + 12] = 2
    data = bytes(bad[i + 4 : i + 4 + 13])
    struct.pack_into(">I", bad, i + 4 + 13, zlib.crc32(b"IHDR" + data) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bytes(bad))


def _tile_frames(seed, n, bh=2, bw=3):
    rng = np.random.default_rng(seed)
    return [
        np.kron(rng.integers(0, 256, (bh, bw)).astype(np.uint8),
                np.ones((8, 8), np.uint8))
        for _ in range(n)
    ]


def test_mjpeg_avi_roundtrip_gray_and_rgb():
    from utxo_to_parquet_spark.kernels.video import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    frames = _tile_frames(5, 5)
    fps, dec = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=12))
    assert fps == 12 and len(dec) == 5
    assert all((a == b).all() for a, b in zip(frames, dec))
    rgb = [np.stack([f] * 3, axis=-1) for f in frames[:3]]
    fps2, dec2 = decode_avi_mjpeg(encode_avi_mjpeg(rgb, fps=25))
    assert fps2 == 25 and all((a == b).all() for a, b in zip(rgb, dec2))


def test_mjpeg_avi_strict_parsing():
    """idx1 offsets, stream handler, and frame-count consistency are
    all verified, not trusted."""
    import struct

    from utxo_to_parquet_spark.kernels.video import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    raw = encode_avi_mjpeg(_tile_frames(7, 4), fps=10)
    bad = bytearray(raw)
    i = bad.index(b"idx1")
    bad[i + 8 + 8] ^= 1  # first entry offset
    with pytest.raises(ValueError, match="idx1"):
        decode_avi_mjpeg(bytes(bad))
    bad2 = bytearray(raw)
    j = bad2.index(b"MJPG")
    bad2[j : j + 4] = b"H264"
    with pytest.raises(ValueError, match="MJPG"):
        decode_avi_mjpeg(bytes(bad2))
    bad3 = bytearray(raw)
    k = bad3.index(b"avih")
    struct.pack_into("<I", bad3, k + 8 + 16, 9)  # dwTotalFrames lie
    with pytest.raises(ValueError, match="frames"):
        decode_avi_mjpeg(bytes(bad3))


def test_audio_autocorr_matches_numpy(spark):
    """Lags are order-sensitive: recompute r_k from the recipe in plain
    numpy and require exact equality; a reversed or permuted decode
    would keep r_0 but flip r_1..r_4."""
    from utxo_to_parquet_spark.operators.multimodal import (
        AC_MAX_LAG,
        WAV_BASE_N,
        WAV_MIX_A,
        WAV_MIX_B,
        q_mm_audio_autocorr,
    )

    sf = "/root/testdata/sf0.001"
    out = {(r.doc_id, r.lag): r.r for r in q_mm_audio_autocorr(spark, sf).collect()}
    for doc_id in (0, 1, 7, 16):
        n = WAV_BASE_N + doc_id % 17
        j = np.arange(n, dtype=np.int64)
        xs = (doc_id * WAV_MIX_A + j * WAV_MIX_B) % 65536 - 32768
        for k in range(AC_MAX_LAG + 1):
            assert out[(doc_id, k)] == int(np.dot(xs[: n - k], xs[k:]))
    # r_0 is the energy the WAV gate reports for mono docs? no — this op
    # is always mono; just check positivity and lag-0 dominance
    assert all(out[(d, 0)] >= abs(out[(d, 2)]) for d in (0, 1, 7))


def test_tokenizer_compare_consistent_with_family_ops(spark):
    """The comparison op must agree exactly with its two component
    family ops on the same corpus and session (shared trainers)."""
    from utxo_to_parquet_spark.operators.pipeline import (
        q_pipeline_tokenizer_compare,
    )
    from utxo_to_parquet_spark.operators.text import (
        q_text_bpe_encode,
        q_text_unigram_segment,
    )

    sf = "/root/testdata/sf0.001"
    cmp_ = {r.doc_id: r for r in q_pipeline_tokenizer_compare(spark, sf).collect()}
    bpe = {r.doc_id: r for r in q_text_bpe_encode(spark, sf).collect()}
    uni = {r.doc_id: r for r in q_text_unigram_segment(spark, sf).collect()}
    assert set(cmp_) == set(bpe) == set(uni)
    for d, r in cmp_.items():
        assert r.n_words == bpe[d].n_words == uni[d].n_words
        assert r.n_bpe_tokens == bpe[d].n_bpe_tokens
        assert r.n_unigram_tokens == uni[d].n_tokens
        assert r.uni_per_bpe_e4 == r.n_unigram_tokens * 10000 // r.n_bpe_tokens
        assert r.n_words <= r.n_unigram_tokens  # >= one token per word


def test_graph_search_recall_floor(spark):
    """Graph ANN must actually navigate: recall@5 vs the brute-force
    twin on the fixture, with a floor well above the entry-points-only
    baseline (scoring just the block entries gives ~0.14)."""
    from utxo_to_parquet_spark.operators.similarity import (
        q_sim_cosine_topk,
        q_sim_graph_search_topk,
    )

    sf = "/root/testdata/sf0.001"
    bf = {(r.q_id, r.c_id) for r in q_sim_cosine_topk(spark, sf).collect()}
    gs = {(r.q_id, r.c_id) for r in q_sim_graph_search_topk(spark, sf).collect()}
    recall = len(bf & gs) / len(bf)
    # measured 0.94 with the round-12 hierarchical search (0.83 before)
    assert recall >= 0.85, recall
    # the search never reports a vector as its own neighbor
    assert all(q != c for q, c in gs)


def test_naive_bayes_learns_planted_violations(spark):
    """The learned model must separate the rule-labeled classes on the
    fixture: 100% training accuracy (the planted markup is perfectly
    class-pure), strongly negative log-odds on every planted token, and
    near-balanced log-odds on ordinary corpus words."""
    from utxo_to_parquet_spark.operators.text import (
        q_quality_naive_bayes,
        q_quality_nb_score,
    )

    sf = "/root/testdata/sf0.01"
    model = {r.token: r for r in q_quality_naive_bayes(spark, sf).collect()}
    for t in ("###", "$$$", "@@@", "0", "1", "22", "333"):
        assert model[t].c_good == 0
        assert model[t].logodds_e6 < -1_000_000, t
    assert model["__prior__"].logodds_e6 > 0  # good docs are the majority
    # ordinary words appear in both classes at similar rates
    common = [r for t, r in model.items()
              if t not in ("###", "$$$", "@@@", "0", "1", "22", "333", "__prior__")]
    assert all(abs(r.logodds_e6) < 1_000_000 for r in common)

    scored = q_quality_nb_score(spark, sf).collect()
    assert len(scored) == 500
    assert all(r.correct for r in scored)  # exactly separable by design
    n_bad = sum(1 for r in scored if r.is_bad)
    assert n_bad == sum(1 for r in scored if r.predicted_bad) > 0


def test_ivf_kmeans_routing_consistency(spark):
    """The learned-quantizer IVF must (a) return well-formed per-query
    top-k from probed k-means lists only, and (b) achieve recall in
    line with probing IVFK_PROBE/KMEANS_K of an isotropic corpus —
    clearly above a single-list floor."""
    from utxo_to_parquet_spark.operators.similarity import (
        IVFK_PROBE,
        KMEANS_K,
        TOP_K,
        q_sim_cosine_topk,
        q_sim_ivf_kmeans_topk,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_sim_ivf_kmeans_topk(spark, sf).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r.rn)
        assert r.q_id != r.c_id
    assert all(sorted(v) == list(range(1, TOP_K + 1)) for v in per_q.values())
    bf = {(r.q_id, r.c_id) for r in q_sim_cosine_topk(spark, sf).collect()}
    got = {(r.q_id, r.c_id) for r in rows}
    recall = len(bf & got) / len(bf)
    expected_frac = IVFK_PROBE / KMEANS_K  # isotropic corpus: ~probed mass
    assert recall >= expected_frac * 0.6, recall


def test_holt_winters_matches_python_recursion(spark):
    """Independent plain-Python replay of the integer HW recursion
    (init + per-step updates with truncating div) over the fixture's
    actual bucketed series must equal the JVM fold exactly."""
    import duckdb

    from utxo_to_parquet_spark.operators.events import (
        HW_A,
        HW_B,
        HW_D,
        HW_G,
        HW_L,
        TS_MAX_BUCKETS,
        q_events_holt_winters,
    )

    sf = "/root/testdata/sf0.001"
    out = {r.event_type: r for r in q_events_holt_winters(spark, sf).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    tmin, tmax = con.execute(
        "SELECT MIN(epoch_ns(ts)), MAX(epoch_ns(ts)) FROM events"
    ).fetchone()
    wh = (tmax - tmin) // (3600 * 10**9 * 1000 * TS_MAX_BUCKETS // 1000) + 1
    width = 3600 * 10**9 * wh
    bmin = tmin // width
    n = tmax // width - bmin + 1
    rows = con.execute(
        f"SELECT event_type, epoch_ns(ts) // {width} - {bmin} AS b, COUNT(*)"
        f" FROM events GROUP BY 1, 2"
    ).fetchall()
    series: dict[str, list[int]] = {}
    for et, b, x in rows:
        series.setdefault(et, [0] * n)[int(b)] = int(x)

    def tdiv(a, b):  # truncate toward zero, both engines' semantics
        q = abs(a) // b
        return q if a >= 0 else -q

    L, A, B, G, D = HW_L, HW_A, HW_B, HW_G, HW_D
    for et, xs in series.items():
        m = sum(xs[:L]) // L
        s = m * 10**6
        b = tdiv((sum(xs[L : 2 * L]) - sum(xs[:L])) * 10**6, L * L)
        c = [(v - m) * 10**6 for v in xs[:L]]
        for t in range(L, n):
            x = xs[t]
            j = t % L
            s2 = tdiv(A * (x * 10**6 - c[j]) + (D - A) * (s + b), D)
            b2 = tdiv(B * (s2 - s) + (D - B) * b, D)
            c[j] = tdiv(G * (x * 10**6 - s2) + (D - G) * c[j], D)
            s, b = s2, b2
        r = out[et]
        assert (r.n_buckets, r.level_e6, r.trend_e6) == (n, s, b), et
        assert r.season_next_e6 == c[n % L]
        assert r.forecast_1_e6 == s + b + c[n % L]
        assert r.season_amp_e6 == max(c) - min(c)


def test_decontaminate_exact_matches_bruteforce(tmp_path, spark):
    """Quadratic brute force over a constructed corpus: doc 10 is the
    test doc; doc 1 contains an 11-word test passage mid-document,
    doc 2 shares only a 3-word fragment (below threshold), doc 3 shares
    nothing. Exact overlaps, exact flags."""
    from utxo_to_parquet_spark.operators.dedup import (
        CONTAM_EXACT_W,
        q_dedup_decontaminate_exact,
    )

    bench = " ".join(f"t{i}" for i in range(20))  # the 'benchmark' text
    passage = " ".join(f"t{i}" for i in range(5, 16))  # 11 words of it
    frag = "t2 t3 t4"
    rows = [
        (1, f"u0 u1 {passage} u2 u3", "web"),
        (2, f"v0 {frag} v1 v2 v3 v4", "web"),
        (3, " ".join(f"w{i}" for i in range(9)), "web"),
        (10, bench, "bench"),  # doc_id % 10 == 0 -> test slice
    ]
    _write_docs11(tmp_path, rows)
    out = {
        r.doc_id: r
        for r in q_dedup_decontaminate_exact(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 3}  # test docs excluded from the report
    assert out[1].max_test_overlap_words == 11
    assert out[1].contaminated is True
    assert out[2].max_test_overlap_words == 3
    assert out[2].contaminated is False
    assert out[3].max_test_overlap_words == 0
    assert out[3].contaminated is False
    assert CONTAM_EXACT_W == 8


def test_hilbert_staged_form_matches_textbook_and_beats_morton(spark):
    """The staged expression must equal the textbook recursive xy2d on
    the full 256x256 grid (bijective, unit-step locality), and the
    bucket-spread audit must show Hilbert's locality advantage over
    Morton on the same fixture (no Morton seam buckets spanning the
    full dimension)."""
    from utxo_to_parquet_spark.operators.relational import (
        q_hilbert_key,
        q_zorder_key,
    )

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    def staged(x, y):
        d = 0
        for k in range(7, -1, -1):
            s = 1 << k
            rx, ry = (x >> k) & 1, (y >> k) & 1
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = 255 - x, 255 - y
                x, y = y, x
        return d

    all_d = set()
    for x in range(256):
        for y in range(256):
            d = staged(x, y)
            assert d == xy2d(256, x, y)
            all_d.add(d)
    assert all_d == set(range(65536))  # bijective over the grid

    sf = "/root/testdata/sf0.01"
    hb = q_hilbert_key(spark, sf).collect()
    zb = q_zorder_key(spark, sf).collect()
    # both audits bucket 1024 consecutive keys; Hilbert's worst bucket
    # must cover a strictly smaller rectangle than Morton's worst
    h_worst = max(max(r.cust_spread, r.day_spread) for r in hb)
    z_worst = max(max(r.cust_spread, r.day_spread) for r in zb)
    assert h_worst <= z_worst
    assert h_worst <= 63  # a 1024-key Hilbert range stays in a 64-ish box


def test_mjpeg_avi_encoder_validation():
    from utxo_to_parquet_spark.kernels.video import encode_avi_mjpeg

    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_mjpeg([], fps=10)
    frames = _tile_frames(3, 2)
    bad = [frames[0], np.zeros((8, 8), np.uint8)]
    with pytest.raises(ValueError, match="share one shape"):
        encode_avi_mjpeg(bad, fps=10)


def test_unigram_fertility_consistent_with_segment(spark):
    """Per-language fertility must agree with the per-doc segmentation
    totals (same session, shared trainer)."""
    import duckdb

    from utxo_to_parquet_spark.operators.text import (
        q_text_unigram_fertility,
        q_text_unigram_segment,
    )

    sf = "/root/testdata/sf0.001"
    fert = {r.lang: r for r in q_text_unigram_fertility(spark, sf).collect()}
    seg = {r.doc_id: r for r in q_text_unigram_segment(spark, sf).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    langs = dict(con.execute("SELECT doc_id, lang FROM documents").fetchall())
    from collections import defaultdict

    words, toks = defaultdict(int), defaultdict(int)
    for d, r in seg.items():
        words[langs[d]] += r.n_words
        toks[langs[d]] += r.n_tokens
    assert set(fert) == set(words)
    for lang, r in fert.items():
        assert (r.n_words, r.n_tokens) == (words[lang], toks[lang])
        assert r.fertility_e4 == toks[lang] * 10000 // words[lang]
        assert r.fertility_e4 >= 10000  # >= one token per word

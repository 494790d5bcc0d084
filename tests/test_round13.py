"""Round-13 additions: residual IVF-PQ (IVFADC), filtered ANN, byte-level
BPE, streaming ANN delta maintenance, motion-compensated video."""

from __future__ import annotations

import numpy as np
import pytest


def _clustered_fixture(tmp_path, n_rows=800, n_blobs=8, dim=64, seed=23):
    """Gaussian-blob embeddings in the fixture schema (label = blob id,
    well-separated centers) — the regime a geometry-correlated coarse
    quantizer is built for, mirroring tools/bench_ann_recall.py."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 4.0, size=(n_blobs, dim))
    blob = rng.integers(0, n_blobs, size=n_rows)
    vecs = centers[blob] + rng.normal(0.0, 1.0, size=(n_rows, dim))
    table = pa.table(
        {
            "vec_id": pa.array(range(n_rows), type=pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(blob.astype(np.int32), type=pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r.q_id, set()).add(r.c_id)
    return out


def _recall(truth, rows):
    approx = _topk_sets(rows)
    return sum(
        len(approx.get(q, set()) & ids) / len(ids) for q, ids in truth.items()
    ) / len(truth)


def test_ivfpq_residual_beats_raw_on_clustered(spark, tmp_path):
    """The IVFADC composition's whole point: on a clustered corpus,
    PQ codes over residuals rank within-list neighbors; raw-vector
    codes waste their bits re-describing the shared centroid. The
    residual twin must clear a real recall floor where the raw sibling
    demonstrably cannot (it plateaued at ~0.14 in BENCH_ann_recall)."""
    from utxo_to_parquet_spark.operators import similarity as sim

    sf = _clustered_fixture(tmp_path)
    truth = _topk_sets(sim.q_sim_cosine_topk(spark, sf).collect())
    raw = _recall(truth, sim.q_sim_ivfpq_topk(spark, sf).collect())
    res = _recall(
        truth, sim.q_sim_ivfpq_residual_topk(spark, sf).collect()
    )
    assert res >= 0.7, f"residual IVF-PQ recall collapsed: {res:.3f}"
    assert res > raw + 0.2, f"residual ({res:.3f}) must beat raw ({raw:.3f})"


def test_ivfpq_residual_codebook_excludes_centroid_component(spark, tmp_path):
    """Construct two far-apart lists whose WITHIN-list structure is
    identical: residual codes must be identical across lists (the
    centroid component is subtracted away), which is exactly what raw
    codes cannot do."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from utxo_to_parquet_spark.operators import similarity as sim

    rng = np.random.default_rng(7)
    dim = 64
    offsets = rng.normal(0.0, 1.0, size=(40, dim))
    far = np.zeros(dim)
    far[0] = 1000.0
    # list 0 = offsets, list 1 = offsets + far: same residual geometry
    vecs = np.concatenate([offsets, offsets + far])
    labels = np.array([0] * 40 + [1] * 40, dtype=np.int32)
    table = pa.table(
        {
            "vec_id": pa.array(range(80), type=pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    rows = sim.q_sim_ivfpq_residual_topk(
        spark, str(tmp_path), n_probe=2
    ).collect()
    # queries 0,10,20,30 live in list 0; their true neighbors are
    # within-list — the residual ADC must keep ranking meaningful and
    # the far list must never contaminate the top ranks (cosine to the
    # +1000 list is near-orthogonal after rerank, so c_id < 40)
    for r in rows:
        if r.q_id < 40:
            assert r.c_id < 40, (r.q_id, r.c_id)
        else:
            assert r.c_id >= 40, (r.q_id, r.c_id)


def test_filtered_topk_predicate_and_dominance(spark, tmp_path):
    """Every emitted candidate satisfies the metadata predicate, the
    filtered search recalls (near-)exact filtered ground truth on a
    clustered corpus, and it strictly dominates post-filtering the
    unfiltered top-k — at identical traversal cost (same memoized
    ledger)."""
    from utxo_to_parquet_spark.operators import similarity as sim

    sf = _clustered_fixture(tmp_path)
    filt = sim.q_sim_filtered_topk(spark, sf).collect()
    assert filt, "filtered search returned nothing"
    for r in filt:
        assert r.c_id % sim.FILT_MOD == sim.FILT_V
        assert r.c_id != r.q_id
    # brute-force filtered ground truth
    import pyarrow.parquet as pq

    t = pq.read_table(str(tmp_path / "embeddings.parquet"))
    ids = t["vec_id"].to_numpy()
    X = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cmask = ids % sim.FILT_MOD == sim.FILT_V
    C, cids = Xn[cmask], ids[cmask]
    truth = {}
    for qi in np.where((ids % sim.QUERY_MOD == 0) & (ids < sim.Q_MAX_ID))[0]:
        cos = C @ Xn[qi]
        cos[cids == ids[qi]] = -9.0
        truth[int(ids[qi])] = {
            int(c) for c in cids[np.argsort(-cos)[: sim.TOP_K]]
        }
    unfiltered = sim.q_sim_graph_search_topk(spark, sf).collect()
    post = [r for r in unfiltered if r.c_id % sim.FILT_MOD == sim.FILT_V]
    r_filt = _recall(truth, filt)
    r_post = _recall(truth, post)
    assert r_filt >= 0.9, f"filtered-search recall collapsed: {r_filt:.3f}"
    assert r_filt > r_post + 0.3, (r_filt, r_post)


# --- byte-level BPE -----------------------------------------------------------


def _write_docs(tmp_path, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


BBPE_EDGE_TEXTS = [
    "hello hello world",
    "a  b   c",                       # multi-space runs
    "don't stop! don't",              # apostrophes + punctuation runs
    "héllo wörld héllo",  # 2-byte UTF-8
    "emoji \U0001f600\U0001f600 twice \U0001f600",  # 4-byte UTF-8
    "tab\there\tand  2  spaces",      # tabs inside punct class
    "42abc7 42abc7",                  # digit/letter boundaries
    " leading and trailing ",
    "你好世界 你好",  # 3-byte UTF-8 (CJK)
]


def test_bbpe_roundtrip_multibyte_whitespace(spark, tmp_path):
    """The no-OOV guarantee on planted edge cases: multi-byte UTF-8
    (2/3/4-byte sequences), tabs, doubled spaces, leading/trailing
    space — decode(encode(text)) == text for every document."""
    from utxo_to_parquet_spark.operators import text as T

    sf = _write_docs(tmp_path, BBPE_EDGE_TEXTS)
    rows = T.q_text_bbpe_roundtrip(spark, sf).collect()
    assert len(rows) == len(BBPE_EDGE_TEXTS)
    bad = [r.doc_id for r in rows if not r.roundtrip_ok]
    assert not bad, f"round trip failed for docs {bad}"


def test_bbpe_merges_match_reference_trainer(spark, tmp_path):
    """Trained merge list vs an independent pure-Python BPE reference
    (most-frequent adjacent pair, ties by delimited string, greedy
    leftmost rewrite) on the same pre-tokenized byte corpus."""
    import re
    from collections import Counter

    from utxo_to_parquet_spark.operators import text as T

    sf = _write_docs(tmp_path, BBPE_EDGE_TEXTS)
    _v, merges = T._bbpe_train_cached(spark, sf)

    # reference trainer
    pat = re.compile(T.BBPE_PAT)
    wf = Counter()
    for t in BBPE_EDGE_TEXTS:
        toks = pat.findall(t)
        assert "".join(toks) == t
        wf.update(toks)
    vocab = {
        w: [w.encode("utf-8").hex().upper()[i : i + 2]
            for i in range(0, 2 * len(w.encode("utf-8")), 2)]
        for w in wf
    }
    ref_merges = []
    for _ in range(T.BBPE_MERGES):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wf[w]
        if not pairs:
            break
        best = min(
            pairs.items(),
            key=lambda kv: (-kv[1], kv[0][0] + "·" + kv[0][1]),
        )[0]
        ref_merges.append(best)
        a, b = best
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    assert merges == ref_merges


# --- MC01 motion-compensated video ---------------------------------------------


def _mc_frames(doc_id=0):
    from utxo_to_parquet_spark.kernels.video import encode_avi_mc  # noqa: F401

    w, h = 16 * (2 + doc_id % 2), 32
    bg = 30 + doc_id % 60
    n = w // 8 - 1
    period = 2 * n - 2
    sy = 8 * (doc_id % 3)
    frames = []
    for f in range(4):
        sv = 95 + doc_id % 20 + 3 * f
        m = (doc_id + f) % period
        sx = 8 * (m if m < n else period - m)
        c = np.full((h, w), bg, np.uint8)
        c[sy : sy + 16, sx : sx + 16] = sv
        frames.append(c)
    return frames


def test_mc_exact_reconstruction_and_size_pin():
    """The gate recipe reconstructs exactly, and the motion-compensated
    stream is materially smaller than the MJPEG equivalent (the whole
    point of temporal prediction)."""
    from utxo_to_parquet_spark.kernels.video import (
        decode_avi_mc,
        encode_avi_mc,
        encode_avi_mjpeg,
    )

    for doc_id in (0, 1, 5, 17, 101):
        frames = _mc_frames(doc_id)
        buf = encode_avi_mc(frames, fps=10)
        fps, dec = decode_avi_mc(buf)
        assert fps == 10 and len(dec) == 4
        for a, b in zip(frames, dec):
            assert (a == b).all()
        mj = encode_avi_mjpeg(frames, fps=10)
        assert len(buf) < 0.6 * len(mj), (doc_id, len(buf), len(mj))


def test_mc_pframe_hand_built_bitstream():
    """Decoder-only path pinned by a HAND-BUILT P-frame bitstream: one
    16x16 macroblock, MV (1,-1), cbp selecting only the TL block, a
    single DC coefficient level 2 -> reconstruction must be the shifted
    prediction +2 on the TL 8x8 block only."""
    from utxo_to_parquet_spark.kernels.video import (
        _MCBitReader,
        _MCBitWriter,
        _mc_decode_pframe,
    )

    rng = np.random.default_rng(5)
    prev = rng.integers(50, 200, (32, 32)).astype(np.uint8)

    bw = _MCBitWriter()
    for _y in range(2):
        for _x in range(2):
            pass
    # 4 MBs in a 32x32 frame: code MB0 as above, skip the rest
    bw.put(0, 1)        # not skip
    bw.se(1)            # dx = 1
    bw.se(-1)           # dy = -1... (0,0) MB needs dy>=0; use dy=1
    # rebuild: dy must keep the window in-bounds for MB (0,0)
    bw = _MCBitWriter()
    bw.put(0, 1)
    bw.se(2)            # dx2 = 2 half-pel units = 1 full pel
    bw.se(2)            # dy2 = 2 -> dy = 1
    bw.put(0b1000, 4)   # cbp: TL only
    bw.ue(1)            # one coefficient
    bw.ue(0)            # run 0 -> zigzag index 0 (DC)
    bw.se(2)            # level 2 -> DC = 16 -> +2 spatial
    for _ in range(3):
        bw.put(1, 1)    # skip the other three MBs
    payload = bw.flush()

    rec = _mc_decode_pframe(prev, payload)
    pred = prev[1:17, 1:17].astype(np.int64)
    want = pred.copy()
    want[:8, :8] += 2
    assert (rec[:16, :16] == np.clip(want, 0, 255)).all()
    assert (rec[:16, 16:] == prev[:16, 16:]).all()
    assert (rec[16:, :] == prev[16:, :]).all()

    # Exp-Golomb round trip on the reader
    br = _MCBitReader(payload)
    assert br.bit() == 0
    assert br.se() == 2 and br.se() == 2


def test_mc_decoder_rejects_malformed():
    """Loud failures: out-of-frame motion vector, zero level, P-frame
    before any I-frame, keyframe-flag/payload disagreement."""
    from utxo_to_parquet_spark.kernels.video import (
        _MCBitWriter,
        _mc_decode_pframe,
        decode_avi_mc,
        encode_avi_mc,
    )

    prev = np.zeros((16, 16), np.uint8)
    bw = _MCBitWriter()
    bw.put(0, 1)
    bw.se(-5)  # dx2 = -5 (2.5px left) leaves the frame at MB (0,0)
    bw.se(0)
    bw.put(0, 4)
    with pytest.raises(ValueError, match="motion vector"):
        _mc_decode_pframe(prev, bw.flush())

    bw = _MCBitWriter()
    bw.put(0, 1)
    bw.se(0)
    bw.se(0)
    bw.put(0b1000, 4)
    bw.ue(1)
    bw.ue(0)
    bw.se(0)  # zero level is not codable
    with pytest.raises(ValueError, match="zero level"):
        _mc_decode_pframe(prev, bw.flush())

    # keyframe flag must agree with payload type: flip frame 1's flag
    frames = _mc_frames(0)
    buf = bytearray(encode_avi_mc(frames, fps=10))
    idx = buf.rfind(b"idx1")
    # entry 1 flags live at idx+8 (chunk body) + 16*1 + 4
    flag_off = idx + 8 + 16 + 4
    assert buf[flag_off] == 0
    buf[flag_off] = 0x10
    with pytest.raises(ValueError, match="disagree"):
        decode_avi_mc(bytes(buf))


def test_mc_lossy_path_is_closed_loop():
    """Arbitrary P-frame content quantizes lossily but decodes
    deterministically (the encoder predicts from its own
    reconstruction, so there is no drift between encoder and
    decoder)."""
    from utxo_to_parquet_spark.kernels.video import decode_avi_mc, encode_avi_mc

    rng = np.random.default_rng(11)
    f0 = np.kron(
        rng.integers(0, 256, (2, 2)), np.ones((16, 16), np.int64)
    ).astype(np.uint8)
    frames = [f0] + [
        rng.integers(0, 256, (32, 32)).astype(np.uint8) for _ in range(2)
    ]
    buf = encode_avi_mc(frames, fps=5)
    _, dec1 = decode_avi_mc(buf)
    _, dec2 = decode_avi_mc(buf)
    for a, b in zip(dec1, dec2):
        assert (a == b).all()
    # quantization error bounded by the flat AC step
    assert max(
        np.abs(a.astype(int) - b.astype(int)).max()
        for a, b in zip(frames[1:], dec1[1:])
    ) <= 32


def test_mc_gop_periodic_keyframes():
    from utxo_to_parquet_spark.kernels.video import decode_avi_mc, encode_avi_mc

    frames = _mc_frames(3)[:4]
    buf = encode_avi_mc(frames, fps=10, gop=2)
    fps, dec = decode_avi_mc(buf)
    for a, b in zip(frames, dec):
        assert (a == b).all()
    # frames 0 and 2 are JFIF keyframes in the container
    assert buf.count(b"\xff\xd8\xff") == 2


# --- binary quantization + Hamming --------------------------------------------


def test_binary_hamming_recall_floor(spark, tmp_path):
    """On a clustered corpus the re-ranked binary scan must recover
    most of the exact top-k (Charikar: Hamming on sign bits is a
    monotone proxy for angle), and every emitted hamming must equal
    the sign-disagreement count recomputed from the raw vectors."""
    import pyarrow.parquet as pq

    from utxo_to_parquet_spark.operators import similarity as sim

    sf = _clustered_fixture(tmp_path)
    truth = _topk_sets(sim.q_sim_cosine_topk(spark, sf).collect())
    rows = sim.q_sim_binary_hamming_topk(spark, sf).collect()
    rec = _recall(truth, rows)
    assert rec >= 0.85, f"re-ranked BQ recall collapsed: {rec:.3f}"
    t = pq.read_table(str(tmp_path / "embeddings.parquet"))
    ids = t["vec_id"].to_numpy()
    X = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )
    signs = {int(i): (x > 0) for i, x in zip(ids, X)}
    for r in rows[:50]:
        want = int((signs[r.q_id] != signs[r.c_id]).sum())
        assert r.hamming == want, (r.q_id, r.c_id, r.hamming, want)


# --- content-defined chunking ---------------------------------------------------


def test_cdc_boundaries_shift_resistant(spark, tmp_path):
    """The property CDC exists for: prepending words to a document
    moves only the boundaries NEAR the edit, so the identical tail
    re-chunks identically and keeps deduplicating — fixed-size blocks
    would lose every boundary after the insertion."""
    from utxo_to_parquet_spark.operators import dedup as D

    base = " ".join(f"w{i * 7 % 101}x{i}" for i in range(120))
    shifted = "zzq aab " + base  # 2-word insertion at the front
    sf = _write_docs(tmp_path, [base, shifted, "totally different words here"])
    rows = {r.doc_id: r for r in D.q_dedup_cdc_chunks(spark, sf).collect()}
    # both copies must share most of their chunks (all but the ones
    # overlapping the first CDC_W-word windows after the edit)
    assert rows[1].n_shared_chunks >= rows[1].n_chunks - 2, rows[1]
    assert rows[2].n_shared_chunks >= rows[2].n_chunks - 3, rows[2]
    assert rows[1].shared_words >= rows[1].n_words - 16
    # the unrelated doc shares nothing
    assert rows[3].n_shared_chunks == 0 and rows[3].shared_words == 0


def test_cdc_chunks_cover_document(spark, tmp_path):
    """Chunks partition every document exactly: word counts add up."""
    from utxo_to_parquet_spark.operators import dedup as D

    texts = ["a b c d e f g h i j k l m n o p", "a b", "single"]
    sf = _write_docs(tmp_path, texts)
    rows = {r.doc_id: r for r in D.q_dedup_cdc_chunks(spark, sf).collect()}
    for i, t in enumerate(texts, start=1):
        assert rows[i].n_words == len(t.split()), (i, rows[i])
        assert 1 <= rows[i].n_chunks <= rows[i].n_words


# --- WordPiece ------------------------------------------------------------------


def test_wordpiece_score_is_likelihood_ratio_not_frequency(spark, tmp_path):
    """Construct a corpus where the most FREQUENT pair is not the
    highest-SCORE pair: 'xy' occurs 8x but x,y are everywhere (score
    8/(hi*hi)); 'qz' occurs 4x and q,z occur nowhere else (score
    4/(4*4)). WordPiece must merge (q, ##z) first; frequency-ranked
    BPE would pick (x, ##y)."""
    from utxo_to_parquet_spark.operators import text as T

    docs = (["xy"] * 8 + ["qz"] * 4 + ["xa"] * 6 + ["ya"] * 6
            + ["ax"] * 5 + ["ay"] * 5)
    sf = _write_docs(tmp_path, [" ".join(docs)])
    _vocab, merges = T._wp_train_cached(spark, sf)
    assert merges[0] == ("q", "##z"), merges


def test_wordpiece_encode_is_greedy_longest_match(spark, tmp_path):
    """Per-document token counts must equal an independent pure-Python
    greedy longest-match encoder run against the same trained vocab."""
    from utxo_to_parquet_spark.operators import text as T

    texts = [
        "abab abab cdcd",
        "ab cd abab abcd",
        "aaaa bbbb abab",
    ]
    sf = _write_docs(tmp_path, texts)
    vocab, _ = T._wp_train_cached(spark, sf)
    initial = {p for p in vocab if not p.startswith("##")}
    cont = {p[2:] for p in vocab if p.startswith("##")}

    def greedy(word):
        pos, n, mx = 0, 0, 0
        while pos < len(word):
            table = initial if pos == 0 else cont
            ln = next(
                l for l in range(len(word) - pos, 0, -1)
                if word[pos : pos + l] in table
            )
            n += 1
            mx = max(mx, ln)
            pos += ln
        return n, mx

    rows = {r.doc_id: r for r in
            T.q_text_wordpiece_encode(spark, sf).collect()}
    for i, t in enumerate(texts, start=1):
        words = t.split()
        n = sum(greedy(w)[0] for w in words)
        mx = max(greedy(w)[1] for w in words)
        assert rows[i].n_words == len(words)
        assert rows[i].n_wp_tokens == n, (i, rows[i], n)
        assert rows[i].max_piece_chars == mx


def test_mc_halfpel_hand_built_bitstream():
    """Hand-built HALF-PEL P-frame: one 32x16 frame, MB0 with MV
    dx2 = 1 (half a sample right), no residual -> reconstruction must
    be the MPEG-1 bilinear average (prev[c] + prev[c+1] + 1) >> 1;
    MB1 skipped."""
    from utxo_to_parquet_spark.kernels.video import (
        _MCBitWriter,
        _mc_decode_pframe,
    )

    rng = np.random.default_rng(9)
    prev = rng.integers(0, 255, (16, 32)).astype(np.uint8)
    bw = _MCBitWriter()
    bw.put(0, 1)
    bw.se(1)   # dx2 = +1 half-pel
    bw.se(0)
    bw.put(0, 4)  # no coded blocks
    bw.put(1, 1)  # skip MB1
    rec = _mc_decode_pframe(prev, bw.flush())
    p = prev.astype(np.int32)
    want = (p[:, 0:17][:, :-1] + p[:, 0:17][:, 1:] + 1) >> 1
    assert (rec[:, :16] == want.astype(np.uint8)).all()
    assert (rec[:, 16:] == prev[:, 16:]).all()


def test_mc_halfpel_sequence_exact_and_smaller():
    """A sequence whose P-frames are exact half-sample interpolations
    reconstructs bit-exactly through the half-pel search, and the
    stream stays far below the MJPEG equivalent."""
    from utxo_to_parquet_spark.kernels.video import (
        decode_avi_mc,
        encode_avi_mc,
    )

    bg, sv = 40, 120
    f0 = np.full((32, 64), bg, np.uint8)
    f0[8:24, 24:40] = sv
    frames = [f0]
    for _ in range(3):
        p = frames[-1].astype(np.int32)
        nxt = p.copy()
        nxt[:, 1:] = (p[:, :-1] + p[:, 1:] + 1) >> 1
        frames.append(nxt.astype(np.uint8))
    buf = encode_avi_mc(frames, fps=10, halfpel=True)
    fps, dec = decode_avi_mc(buf)
    for a, b in zip(frames, dec):
        assert (a == b).all()

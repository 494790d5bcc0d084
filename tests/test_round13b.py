"""Round-13 extension tests: MC02 B-frames (bidirectional prediction +
decode-order reordering), pinned against hand-built bitstreams and the
published MPEG-1 semantics (ISO/IEC 11172-2 §2.4.4.3-4) rather than
round-trip-only checks."""

from __future__ import annotations

import struct

import numpy as np
import pytest


def _bframe_frames(doc_id: int) -> list:
    """The q_mm_video_bframe_stats gate recipe: a 16x16 sprite sliding
    8px per frame with the tent brightness profile."""
    w, h = 16 * (3 + doc_id % 2), 32
    bg = 25 + doc_id % 45
    v0 = 95 + doc_id % 20
    dh = 1 + doc_id % 5
    sy = 8 * (doc_id % 3)
    frames = []
    for f in range(5):
        sv = v0 + dh * (2 - abs(f - 2))
        c = np.full((h, w), bg, np.uint8)
        c[sy : sy + 16, 8 * f : 8 * f + 16] = sv
        frames.append(c)
    return frames


def _movi_payloads(buf: bytes) -> list[bytes]:
    """Walk the movi list and return raw frame payloads in coded order."""
    i = buf.find(b"movi") + 4
    out = []
    while buf[i : i + 4] == b"00dc":
        (sz,) = struct.unpack_from("<I", buf, i + 4)
        out.append(buf[i + 8 : i + 8 + sz])
        i += 8 + sz + (sz % 2)
    return out


def test_mc_b_exact_reconstruction_and_size_pins():
    """The gate recipe reconstructs exactly in PRESENTATION order, B
    payloads are smaller than the P payloads of the same stream (the
    point of bi-prediction: the interpolated mode models the tent
    profile at zero residual), and the whole MC02 stream undercuts the
    P-only MC01 coding of the same frames."""
    from utxo_to_parquet_spark.kernels.video import (
        decode_avi_mc_b,
        encode_avi_mc,
        encode_avi_mc_b,
    )

    total_b = total_p = 0
    for doc_id in (0, 1, 5, 17, 101):
        frames = _bframe_frames(doc_id)
        buf = encode_avi_mc_b(frames, fps=10)
        fps, dec = decode_avi_mc_b(buf)
        assert fps == 10 and len(dec) == 5
        for a, b in zip(frames, dec):
            assert (a == b).all()
        payloads = _movi_payloads(buf)
        types = [
            "I" if p[:2] == b"\xff\xd8" else chr(p[0]) for p in payloads
        ]
        assert types == ["I", "P", "B", "P", "B"]  # coded != display order
        p_sizes = [len(p) for p, t in zip(payloads, types) if t == "P"]
        b_sizes = [len(p) for p, t in zip(payloads, types) if t == "B"]
        assert max(b_sizes) < min(p_sizes), (doc_id, b_sizes, p_sizes)
        # the B coding of display frames 1/3 is cheaper IN AGGREGATE
        # than MC01's P coding of the SAME frames (tag byte excluded):
        # the bi mode models the tent profile at zero residual where a
        # P needs coded coefficients — though a wide frame can spend
        # that saving back on the second MV pair, so the pin is the
        # sample total, not per-frame
        mc1 = _movi_payloads(encode_avi_mc(frames, fps=10))
        for b_payload, disp in ((payloads[2], 1), (payloads[4], 3)):
            total_b += len(b_payload) - 1
            total_p += len(mc1[disp])
    assert total_b < total_p, (total_b, total_p)


def test_mc_b_short_sequences_and_closed_gop():
    """1..4-frame sequences: the last display frame is ALWAYS coded as
    a reference (closed GOP — no dangling B), and every length decodes
    back to its display order."""
    from utxo_to_parquet_spark.kernels.video import (
        decode_avi_mc_b,
        encode_avi_mc_b,
    )

    frames = _bframe_frames(3)
    want_types = {1: ["I"], 2: ["I", "P"], 3: ["I", "P", "B"],
                  4: ["I", "P", "B", "P"]}
    for n in (1, 2, 3, 4):
        buf = encode_avi_mc_b(frames[:n], fps=5)
        types = [
            "I" if p[:2] == b"\xff\xd8" else chr(p[0])
            for p in _movi_payloads(buf)
        ]
        assert types == want_types[n], n
        _, dec = decode_avi_mc_b(buf)
        assert len(dec) == n
        for a, b in zip(frames[:n], dec):
            assert (a == b).all()


def test_mc_b_hand_built_bi_rounding_pin():
    """Decoder-only path pinned by a HAND-BUILT B macroblock: the
    interpolated prediction must round half values UP (§2.4.4.4:
    (fwd + bwd + 1) >> 1) — past 10 and future 13 must reconstruct to
    12, not 11."""
    from utxo_to_parquet_spark.kernels.video import (
        _MCBitWriter,
        _mc_decode_bframe,
    )

    past = np.full((16, 16), 10, np.uint8)
    future = np.full((16, 16), 13, np.uint8)
    bw = _MCBitWriter()
    bw.put(0, 1)   # not skip
    bw.put(2, 2)   # mode = bi
    bw.se(0)
    bw.se(0)       # forward MV (0,0)
    bw.se(0)
    bw.se(0)       # backward MV (0,0)
    bw.put(0, 4)   # cbp: no residual
    rec = _mc_decode_bframe(past, future, bw.flush())
    assert (rec == 12).all()


def test_mc_b_hand_built_single_direction_and_residual():
    """Forward and backward single-reference modes with a DC residual:
    mode selects WHICH reference feeds the prediction, and the coded
    TL block adds exactly +2."""
    from utxo_to_parquet_spark.kernels.video import (
        _MCBitWriter,
        _mc_decode_bframe,
    )

    rng = np.random.default_rng(7)
    past = rng.integers(50, 200, (16, 16)).astype(np.uint8)
    future = rng.integers(50, 200, (16, 16)).astype(np.uint8)
    for mode, ref in ((0, past), (1, future)):
        bw = _MCBitWriter()
        bw.put(0, 1)
        bw.put(mode, 2)
        bw.se(0)
        bw.se(0)
        bw.put(0b1000, 4)  # TL block coded
        bw.ue(1)           # one coefficient
        bw.ue(0)           # DC
        bw.se(2)           # level 2 -> +2 spatial on the 8x8
        rec = _mc_decode_bframe(past, future, bw.flush())
        want = ref.astype(np.int64).copy()
        want[:8, :8] += 2
        assert (rec == np.clip(want, 0, 255)).all(), mode


def test_mc_b_skip_copies_past_reference():
    """The B skip bit copies the CO-LOCATED macroblock from the PAST
    reference — not the future one."""
    from utxo_to_parquet_spark.kernels.video import (
        _MCBitWriter,
        _mc_decode_bframe,
    )

    past = np.full((16, 16), 77, np.uint8)
    future = np.full((16, 16), 200, np.uint8)
    bw = _MCBitWriter()
    bw.put(1, 1)  # skip
    rec = _mc_decode_bframe(past, future, bw.flush())
    assert (rec == 77).all()


def test_mc_b_decoder_rejects_malformed():
    """Loud failures: invalid mode 11, out-of-frame MV per direction,
    B-frame without two live references, unknown payload tag, and
    keyframe-flag/payload disagreement."""
    from utxo_to_parquet_spark.kernels.video import (
        _MCBitWriter,
        _mc_decode_bframe,
        decode_avi_mc_b,
        encode_avi_mc_b,
    )

    past = np.zeros((16, 16), np.uint8)
    future = np.zeros((16, 16), np.uint8)

    bw = _MCBitWriter()
    bw.put(0, 1)
    bw.put(3, 2)  # mode 11 is a bitstream error
    with pytest.raises(ValueError, match="mode 11"):
        _mc_decode_bframe(past, future, bw.flush())

    bw = _MCBitWriter()
    bw.put(0, 1)
    bw.put(0, 2)  # forward
    bw.se(-5)     # dx2 = -5 leaves the frame at MB (0,0)
    bw.se(0)
    with pytest.raises(ValueError, match="forward MV"):
        _mc_decode_bframe(past, future, bw.flush())

    bw = _MCBitWriter()
    bw.put(0, 1)
    bw.put(1, 2)  # backward
    bw.se(0)
    bw.se(-5)
    with pytest.raises(ValueError, match="backward MV"):
        _mc_decode_bframe(past, future, bw.flush())

    # retag a P payload as 'B': only ONE reference is live at that
    # point in coded order, so the decoder must refuse
    frames = _bframe_frames(0)[:2]
    buf = bytearray(encode_avi_mc_b(frames, fps=5))
    i = buf.find(b"movi") + 4
    (sz,) = struct.unpack_from("<I", buf, i + 4)
    i += 8 + sz + (sz % 2)  # skip the I-frame chunk
    assert buf[i : i + 4] == b"00dc" and buf[i + 8] == ord("P")
    buf[i + 8] = ord("B")
    with pytest.raises(ValueError, match="two live references"):
        decode_avi_mc_b(bytes(buf))

    buf[i + 8] = ord("X")
    with pytest.raises(ValueError, match="unknown payload tag"):
        decode_avi_mc_b(bytes(buf))

    # keyframe flag on a non-I payload must be rejected
    buf[i + 8] = ord("P")
    idx = bytes(buf).rfind(b"idx1")
    flag_off = idx + 8 + 16 + 4  # entry 1 flags
    assert buf[flag_off] == 0
    buf[flag_off] = 0x10
    with pytest.raises(ValueError, match="disagree"):
        decode_avi_mc_b(bytes(buf))


def test_mc_b_lossy_path_is_deterministic():
    """Arbitrary content (not the exactness recipe) quantizes lossily
    but decodes identically on every pass, and B-frames never
    contaminate the reference chain: the references decode the same
    whether or not B payloads sit between them."""
    from utxo_to_parquet_spark.kernels.video import (
        decode_avi_mc,
        decode_avi_mc_b,
        encode_avi_mc,
        encode_avi_mc_b,
    )

    rng = np.random.default_rng(23)
    f0 = np.kron(
        rng.integers(0, 256, (2, 2)), np.ones((16, 16), np.int64)
    ).astype(np.uint8)
    frames = [f0] + [
        rng.integers(0, 256, (32, 32)).astype(np.uint8) for _ in range(4)
    ]
    buf = encode_avi_mc_b(frames, fps=5)
    _, dec1 = decode_avi_mc_b(buf)
    _, dec2 = decode_avi_mc_b(buf)
    for a, b in zip(dec1, dec2):
        assert (a == b).all()
    # reference frames (display 0, 2, 4) must equal the MC01 coding of
    # the reference-only subsequence: B-pictures are not references
    ref_buf = encode_avi_mc([frames[0], frames[2], frames[4]], fps=5)
    _, ref_dec = decode_avi_mc(ref_buf)
    for k, disp in enumerate((0, 2, 4)):
        assert (dec1[disp] == ref_dec[k]).all()


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


def test_colbert_maxsim_exact_match_and_ordering(tmp_path, spark):
    """Late-interaction pins: a candidate containing ALL query tokens
    scores exactly CB_QT * 32 (every per-token max is the identical
    word, dot = 32); more shared tokens strictly dominate fewer; the
    query document never retrieves itself."""
    from utxo_to_parquet_spark.operators.similarity import (
        CB_QT,
        q_sim_colbert_maxsim,
    )

    qwords = [f"qq{i}" for i in range(CB_QT)]
    docs = [
        (0, " ".join(qwords), "w"),                        # the query doc
        (1, " ".join(qwords) + " xx0 xx1", "w"),           # all 8 terms
        (2, " ".join(qwords[:4]) + " yy0 yy1 yy2 yy3", "w"),  # 4 terms
        (3, "zz0 zz1 zz2 zz3 zz4 zz5 zz6 zz7", "w"),       # no terms
    ]
    _write_documents(tmp_path, docs)
    out = {
        (r.query_doc_id, r.doc_id): r
        for r in q_sim_colbert_maxsim(spark, str(tmp_path)).collect()
    }
    assert all(q == 0 for q, _ in out)          # only doc 0 is a query
    assert (0, 0) not in out                    # self excluded
    assert out[(0, 1)].maxsim == CB_QT * 32
    assert out[(0, 1)].maxsim_rank == 1
    assert (0, 2) in out
    assert out[(0, 2)].maxsim < out[(0, 1)].maxsim
    # doc 3 shares no token: it never enters the overlap candidate set
    assert (0, 3) not in out


def test_colbert_maxsim_beats_pooled_on_partial_overlap(tmp_path, spark):
    """The late-interaction property: MaxSim credits each query token's
    BEST match independently, so a document matching 6 of 8 tokens
    amid much noise outranks one matching 5 tokens with no noise —
    token-level max is immune to the length normalization that drags
    pooled single-vector scores down."""
    from utxo_to_parquet_spark.operators.similarity import q_sim_colbert_maxsim

    qwords = [f"qq{i}" for i in range(8)]
    noise = " ".join(f"nn{i}" for i in range(40))
    docs = [
        (0, " ".join(qwords), "w"),
        (1, " ".join(qwords[:6]) + " " + noise, "w"),  # 6 terms + noise
        (2, " ".join(qwords[:5]), "w"),                # 5 terms, clean
    ]
    _write_documents(tmp_path, docs)
    out = {
        r.doc_id: r
        for r in q_sim_colbert_maxsim(spark, str(tmp_path)).collect()
    }
    assert out[1].maxsim > out[2].maxsim
    assert out[1].maxsim_rank == 1


def _write_trade_graph(tmp_path, edges):
    """edges: (custkey, suppkey) pairs -> minimal orders + lineitem
    parquet (join keys only; other columns ride along as nulls)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    o_schema = pq.read_schema("/root/testdata/sf0.001/orders.parquet")
    l_schema = pq.read_schema("/root/testdata/sf0.001/lineitem.parquet")
    orders, lines = [], []
    for i, (c, s) in enumerate(edges, start=1):
        orders.append({"o_orderkey": i, "o_custkey": c})
        lines.append({"l_orderkey": i, "l_suppkey": s})
    pq.write_table(
        pa.Table.from_pylist(orders, schema=o_schema),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(lines, schema=l_schema),
        str(tmp_path / "lineitem.parquet"),
    )


def test_personalized_pagerank_brute_force_and_locality(tmp_path, spark):
    """PPR on a constructed graph vs a literal Python replay of the
    recurrence: restart mass lands only on seeds (custkey % 10 == 0),
    proximity to the seed set dominates (the supplier adjacent to the
    seed outranks the two-hop one), a disconnected NON-seed component
    rounds to zero and is dropped, and a disconnected SEED keeps its
    restart mass."""
    from utxo_to_parquet_spark.operators.graph import (
        DAMPING,
        PPR_ITERS,
        q_graph_personalized_pagerank,
    )

    # c10 (seed) - s1 - c1 - s2 - c2 chain; c3-s3 disconnected non-seed;
    # c20 (seed) - s5 disconnected seed pair
    pairs = [(10, 1), (1, 1), (1, 2), (2, 2), (3, 3), (20, 5)]
    _write_trade_graph(tmp_path, pairs)

    # literal replay
    edges = []
    for c, s in set(pairs):
        edges.append((f"c{c}", f"s{s}"))
        edges.append((f"s{s}", f"c{c}"))
    nodes = sorted({u for u, _ in edges})
    outdeg = {n: sum(1 for u, _ in edges if u == n) for n in nodes}
    seeds = {n for n in nodes if n[0] == "c" and int(n[1:]) % 10 == 0}
    rank = {n: (1.0 / len(seeds) if n in seeds else 0.0) for n in nodes}
    for _ in range(PPR_ITERS):
        contrib = {n: 0.0 for n in nodes}
        for u, v in edges:
            if rank[u] > 0:
                contrib[v] += rank[u] / outdeg[u]
        rank = {
            n: (1 - DAMPING) / len(seeds) * (n in seeds)
            + DAMPING * contrib[n]
            for n in nodes
        }
    want = {n: round(r, 8) for n, r in rank.items() if round(r, 8) > 0}

    out = {
        r.node: r.rank
        for r in q_graph_personalized_pagerank(spark, str(tmp_path)).collect()
    }
    assert out == pytest.approx(want)
    assert "c3" not in out and "s3" not in out  # unreached periphery
    assert out["c20"] > 0                       # isolated seed keeps mass
    assert out["s1"] > out["s2"]                # seed proximity dominates


def test_betweenness_splits_mass_over_parallel_shortest_paths(
    tmp_path, spark
):
    """Two seeds (c50, c100) joined by TWO parallel 2-hop paths: each
    intermediate supplier carries exactly half the dependency from each
    endpoint — sigma-weighted splitting, the property degree centrality
    can't see. Hand-replayed Brandes: delta = (1 * (1e6 + 0)) // 2 per
    seed, averaged over 2 seeds -> bc_e6 = 500000 for s1 and s2, and
    the seeds themselves never accumulate."""
    from utxo_to_parquet_spark.operators.graph import q_graph_betweenness

    _write_trade_graph(tmp_path, [(50, 1), (50, 2), (100, 1), (100, 2)])
    out = {
        r.node: r.bc_e6
        for r in q_graph_betweenness(spark, str(tmp_path)).collect()
    }
    assert out == {"s1": 500000, "s2": 500000}


def test_betweenness_khop_truncation_and_chain_accumulation(
    tmp_path, spark
):
    """A 5-hop chain from the single seed c50: dependency telescopes
    backward ((1+delta) per level), and anything past BC_HOPS hops
    contributes nothing — s1 sees both downstream interior nodes
    (2e6), c1 sees one (1e6), the frontier node s3 accumulates zero
    and is dropped, and s4/c2 are never reached."""
    from utxo_to_parquet_spark.operators.graph import q_graph_betweenness

    _write_trade_graph(
        tmp_path, [(50, 1), (1, 1), (1, 3), (2, 3), (2, 4)]
    )
    out = {
        r.node: r.bc_e6
        for r in q_graph_betweenness(spark, str(tmp_path)).collect()
    }
    assert out == {"s1": 2000000, "c1": 1000000}


def test_dp_release_bounds_contributions_and_replays_noise(tmp_path, spark):
    """The Wilson et al. bounded-contribution pins: a power user's 100
    same-type events count as DP_C; a user spread over many types
    keeps only its DP_T alphabetically-first types (a type left with
    no surviving rows vanishes from the release); and the geometric
    noise replays exactly from the md5 seed."""
    import datetime as dt
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from utxo_to_parquet_spark.operators.events import (
        DP_C,
        DP_T,
        DP_THRESH,
        q_events_dp_release,
    )

    base = pq.read_schema("/root/testdata/sf0.001/events.parquet")
    t0 = dt.datetime(2025, 3, 1)
    rows = []
    eid = 0

    def ev(user, etype):
        nonlocal eid
        eid += 1
        rows.append(dict(event_id=eid, ts=t0, user_id=user,
                         event_type=etype, value=1.0, props="{}"))

    for _ in range(100):
        ev(1, "view")                      # power user: capped to DP_C
    for t in ("aa", "bb", "cc", "dd"):
        ev(2, t)                           # 4 types: only DP_T survive
    pq.write_table(
        pa.Table.from_pylist(rows, schema=pa.schema(list(base))),
        str(tmp_path / "events.parquet"),
    )

    out = {r.event_type: r for r in q_events_dp_release(spark, str(tmp_path)).collect()}
    assert out["view"].n_bounded == DP_C
    assert out["aa"].n_bounded == 1 and out["cc"].n_bounded == 1
    assert "dd" not in out                 # 4th type fully bounded away
    assert DP_T == 3 and "bb" in out

    for t, r in out.items():
        h = hashlib.md5(f"dpr1:{t}".encode()).hexdigest()
        u = int(h[:12], 16)
        sgn = -1 if h[12] in "13579bdf" else 1
        mag = sum(1 for th in DP_THRESH if u < th)  # pure-integer replay
        assert r.noise == sgn * mag, t
        assert r.released_n == max(0, r.n_bounded + r.noise), t
        assert r.sensitivity == DP_C * DP_T


def test_wl_refinement_roles_and_depth(tmp_path, spark):
    """1-WL pins on a path-plus-cycle graph: symmetric endpoints share
    a color, the path center is its own role, the 4-cycle's nodes are
    one size-4 class — and the path center SPLITS from the cycle nodes
    (both are degree-2 with degree-2 neighbors, so a 1-round
    implementation would wrongly merge them; round 2 sees the
    endpoints through the neighbors' multisets)."""
    from utxo_to_parquet_spark.operators.graph import q_graph_wl_refinement

    # path c1-s1-c2-s2-c3 ; cycle c4-s4-c5-s5-c4
    pairs = [(1, 1), (2, 1), (2, 2), (3, 2),
             (4, 4), (5, 4), (5, 5), (4, 5)]
    _write_trade_graph(tmp_path, pairs)
    out = {
        r.node: r
        for r in q_graph_wl_refinement(spark, str(tmp_path)).collect()
    }
    # symmetric roles collapse
    assert out["c1"].wl_color == out["c3"].wl_color
    assert out["s1"].wl_color == out["s2"].wl_color
    assert out["c4"].wl_color == out["c5"].wl_color == out["s4"].wl_color
    assert out["c4"].class_size == 4
    # distinct roles split
    assert out["c2"].wl_color != out["c1"].wl_color
    assert out["c2"].wl_color != out["s1"].wl_color
    # the depth pin: path center vs cycle node
    assert out["c2"].wl_color != out["c4"].wl_color
    assert out["c2"].class_size == 1


def test_phrase_search_requires_adjacency(tmp_path, spark, monkeypatch):
    """The positional-index property: a document containing both phrase
    words but never ADJACENT is not a hit (bag-of-words retrieval
    can't express this), occurrence counts are exact, and ties rank
    deterministically."""
    from utxo_to_parquet_spark.operators import text as T

    monkeypatch.setattr(T, "PHRASE_RANK_LO", 1)
    monkeypatch.setattr(T, "PHRASE_RANK_HI", 1)
    docs = [
        (1, "aa bb aa bb aa bb", "w"),      # 3 adjacent occurrences
        (2, "aa bb cc", "w"),               # 1 occurrence
        (3, "aa cc bb aa cc bb", "w"),      # both words, never adjacent
    ]
    _write_documents(tmp_path, docs)
    out = {
        r.doc_id: r
        for r in T.q_text_phrase_search(spark, str(tmp_path)).collect()
    }
    # the planted top bigram is (aa, bb): 3+1 adjacent occurrences
    assert out[1].n_occ == 3 and out[1].phrase_rank == 1
    assert out[2].n_occ == 1 and out[2].phrase_rank == 2
    assert 3 not in out


def test_isotonic_minimax_equals_exact_pava(spark):
    """The minimax closed form on e6-floored pooled rates must equal
    the Fraction-exact weighted PAVA (floor commutes with min/max) on
    a curve with REAL violations — including a multi-bin cascade where
    pooling one violator creates the next."""
    from fractions import Fraction

    from utxo_to_parquet_spark.operators.text import _isotonic_fit

    # bins in ASCENDING score; desired fit NON-INCREASING. raw rates:
    # 0.9, 0.95 (violation), 0.5, 0.8 (violation), 0.7, 0.1, 0.2
    # (violation at the tail)
    data = [
        (-3, 10, 9), (-2, 20, 19), (-1, 10, 5),
        (0, 10, 8), (1, 10, 7), (2, 10, 1), (3, 10, 2),
    ]
    out = {
        r.bin: r
        for r in _isotonic_fit(
            spark.createDataFrame(data, "bin long, n_docs long, n_bad long")
        ).collect()
    }

    # Fraction-exact weighted PAVA in DESCENDING-score order
    # (non-decreasing there == non-increasing in score)
    pava = [[n, Fraction(bad), [b]] for b, n, bad in sorted(data, reverse=True)]
    stack = []
    for n, bad, bs in pava:
        stack.append([n, bad, bs])
        while len(stack) > 1 and (
            stack[-2][1] * stack[-1][0] > stack[-1][1] * stack[-2][0]
        ):  # prev rate > cur rate: violates non-decreasing, pool
            n2, b2, l2 = stack.pop()
            n1, b1, l1 = stack.pop()
            stack.append([n1 + n2, b1 + b2, l1 + l2])
    want = {}
    for n, bad, bs in stack:
        rate = Fraction(bad, n)
        for b in bs:
            want[b] = (1_000_000 * rate.numerator) // rate.denominator
    assert {b: r.iso_rate_e6 for b, r in out.items()} == want
    # monotone non-increasing in score, and pooling genuinely fired
    rows = sorted(out.values(), key=lambda r: r.bin)
    assert all(
        b.iso_rate_e6 <= a.iso_rate_e6 for a, b in zip(rows, rows[1:])
    )
    assert any(r.iso_rate_e6 != r.raw_rate_e6 for r in rows)


def test_kcenter_covers_clusters_before_revisiting(tmp_path, spark):
    """Gonzalez farthest-point pins: on three well-separated clusters
    the greedy must take one point from EACH cluster before a second
    from any (max-cosine to the selected set is ~1 inside a covered
    cluster, ~0 across), the seed is the lowest vec_id, and within-
    cluster revisits report a near-1 max cosine."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from utxo_to_parquet_spark.operators.similarity import (
        q_sim_kcenter_coreset,
    )

    rng = np.random.default_rng(3)
    centers = np.eye(3, 8) * 10.0   # three orthogonal clusters in 8-d
    rows = []
    for i in range(30):
        c = i % 3
        v = centers[c] + rng.normal(0, 0.05, 8)
        rows.append((i, [float(x) for x in v], c))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float32())
                ),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    out = sorted(
        q_sim_kcenter_coreset(spark, str(tmp_path)).collect(),
        key=lambda r: r.step,
    )
    assert out[0].step == 0 and out[0].vec_id == 0  # seed = min vec_id
    clusters = [r.vec_id % 3 for r in out]
    # steps 1 and 2 must cover the two uncovered clusters
    assert set(clusters[:3]) == {0, 1, 2}
    # cross-cluster picks report near-zero max cosine; once all three
    # clusters are covered every later pick is a within-cluster revisit
    # with near-1 max cosine
    assert out[1].max_cos_r6 < 0.1 and out[2].max_cos_r6 < 0.1
    assert all(r.max_cos_r6 > 0.9 for r in out[3:])


def test_rake_runs_scores_and_multiword_only(tmp_path, spark, monkeypatch):
    """RAKE pins on a constructed corpus: stopwords (the df head) split
    candidate runs, single-word runs are excluded, and the deg/freq
    scoring makes words from longer phrases outweigh the same-frequency
    word from short phrases — hand-computed score_e6 values."""
    from utxo_to_parquet_spark.operators import text as T

    monkeypatch.setattr(T, "RAKE_STOP_K", 1)
    # 'the' in all four docs -> STRICTLY highest df -> the stopword
    # (ties on df resolve alphabetically, so every other word must sit
    # at df <= 3)
    docs = [
        (1, "the quick brown fox the lazy dog the fox", "w"),
        (2, "the quick brown fox the dog", "w"),
        (3, "the quick brown fox", "w"),
        (4, "the xx yy", "w"),
    ]
    _write_documents(tmp_path, docs)
    out = {
        r.phrase: r
        for r in T.q_text_rake_keyphrases(spark, str(tmp_path)).collect()
    }
    # runs: doc1 -> [quick brown fox], [lazy dog], [fox](len1 dropped;
    #       the 5-token tail run would exceed RAKE_MAX_LEN anyway)
    #       doc2 -> [quick brown fox], [dog](len1 dropped)
    #       doc3 -> [quick brown fox]      doc4 -> [xx yy]
    assert set(out) == {"quick brown fox", "lazy dog", "xx yy"}
    # word stats over phrase occurrences: quick/brown/fox freq 3 deg 9
    # (fox's single-word run never entered a phrase), lazy/dog freq 1
    # deg 2
    qbf = out["quick brown fox"]
    assert qbf.n_occ == 3
    assert qbf.score_e6 == 3 * (1_000_000 * 9 // 3)   # 9_000_000
    ld = out["lazy dog"]
    assert ld.n_occ == 1
    assert ld.score_e6 == 2 * (1_000_000 * 2 // 1)    # 4_000_000
    # tie with 'xx yy' on (score, n_occ) resolves by phrase text
    assert qbf.rake_rank == 1 and ld.rake_rank == 2
    assert out["xx yy"].rake_rank == 3


def test_prf_expansion_retrieves_vocabulary_mismatch(tmp_path, spark, monkeypatch):
    """The point of pseudo-relevance feedback: a document sharing NO
    query term (pure vocabulary mismatch) is invisible to plain BM25
    but retrieved after Rocchio expansion, because the feedback docs
    vote its term in; expansion terms never duplicate query terms."""
    from utxo_to_parquet_spark.operators import text as T

    monkeypatch.setattr(T, "BM25_RANK_LO", 1)
    monkeypatch.setattr(T, "BM25_RANK_HI", 4)  # one 4-term query
    docs = [
        (1, "t1 t2 t3 t4 zz zz", "w"),   # full match, carries zz
        (2, "t1 t2 t3 zz", "w"),
        (3, "t1 t2 qq", "w"),
        (4, "zz zz zz zz", "w"),         # vocabulary mismatch: zz only
        (5, "t1 t2 t3 t4", "w"),
        (6, "t1 t2 t3 t4", "w"),
    ]
    _write_documents(tmp_path, docs)
    plain = {r.doc_id for r in T.q_text_bm25_topk(spark, str(tmp_path)).collect()}
    prf = {
        r.doc_id: r for r in T.q_text_bm25_prf(spark, str(tmp_path)).collect()
    }
    assert 4 not in plain            # BM25 never scores doc 4
    assert 4 in prf                  # PRF retrieves it via expansion
    # feedback winners still lead; the expansion-only doc trails them
    assert prf[4].prf_rank > prf[5].prf_rank
    assert prf[4].score > 0

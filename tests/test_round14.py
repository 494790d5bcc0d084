"""Round-14 operator pins: MinHash top-k near-dup search, DP quantile
release, best-fit-decreasing packing, streaming graph-ANN delta."""

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _write_docs(tmp_path, rows):
    base = pq.read_schema(f"{SF_DIR}/documents.parquet")
    table = pa.Table.from_pylist(
        [
            dict(zip(["doc_id", "text", "lang", "source", "n_chars"], r))
            for r in rows
        ],
        schema=base,
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))


def test_minhash_search_ranks_planted_twin_and_exact_copy(tmp_path, spark):
    """Constructed pins for the top-k near-dup search: an exact copy
    must surface at rank 1 with full signature agreement (n_match 16,
    est/exact Jaccard 1.0); the operator's own planted twin (first word
    dropped) must surface with exact Jaccard 37/38; an isolated probe
    with a disjoint vocabulary returns no rows (no bucket collision)."""
    from utxo_to_parquet_spark.operators.dedup import (
        N_SEEDS,
        q_dedup_minhash_search,
    )

    a = " ".join(f"a{i}" for i in range(40))
    b = " ".join(f"b{i}" for i in range(40))
    c = " ".join(f"c{i}" for i in range(40))
    rows = [
        (0, a, "en", "web", len(a)),    # probe (0 % 25 == 0), planted twin
        (4, a, "en", "web", len(a)),    # exact copy of doc 0, not a probe
        (25, b, "en", "web", len(b)),   # probe, vocabulary disjoint
        (50, c, "en", "web", len(c)),   # probe, planted twin only
    ]
    _write_docs(tmp_path, rows)
    res = list(q_dedup_minhash_search(spark, str(tmp_path)).collect())
    by_probe = {}
    for r in res:
        by_probe.setdefault(r.q_doc, {})[r.rnk] = r

    # exact copy wins rank 1 (n_match ties broken by lower cand_doc)
    top0 = by_probe[0][1]
    assert top0.cand_doc == 4 and top0.n_match == N_SEEDS
    assert top0.est_jaccard == 1.0 and top0.jaccard == 1.0

    # the planted twin (doc 1000000 = doc 0 minus its first word):
    # 38 trigrams vs 37, all shared -> jaccard 37/38
    twin = [r for r in by_probe[0].values() if r.cand_doc == 1000000]
    assert twin and twin[0].jaccard == round(37 / 38, 4)
    assert twin[0].n_common == 37

    # disjoint-vocabulary probe: nothing within LSH reach
    assert 25 not in by_probe

    # probe 50 has exactly its twin in reach
    top50 = by_probe[50][1]
    assert top50.cand_doc == 1000050 and top50.jaccard == round(37 / 38, 4)


def test_dp_quantile_replays_exponential_mechanism(tmp_path, spark):
    """A 32-user uniform-grid fixture (user i: DP_C values in bin i)
    makes every rank exact: the operator's released bins must equal a
    literal Python replay of the truncated-exponential mechanism
    (integer weight walk + seeded md5 uniform), a power user's extra
    events must be capped away, and the weight table's peak must sit
    on the exact-quantile bin."""
    import datetime as dt
    import hashlib

    from utxo_to_parquet_spark.operators.events import (
        DP_C,
        DPQ_BINW,
        DPQ_DCAP,
        DPQ_NBINS,
        DPQ_QS,
        DPQ_W,
        q_events_dp_quantile,
    )

    base = pq.read_schema(f"{SF_DIR}/events.parquet")
    t0 = dt.datetime(2025, 3, 1)
    rows, eid = [], 0

    def ev(user, value):
        nonlocal eid
        eid += 1
        rows.append(dict(event_id=eid, ts=t0, user_id=user,
                         event_type="m", value=float(value), props="{}"))

    for b in range(DPQ_NBINS):
        for _ in range(DP_C):
            ev(b + 1, b * DPQ_BINW + 8)   # user b+1 -> DP_C values in bin b
    for _ in range(100):
        ev(999, 500)                      # power user: capped to DP_C
    pq.write_table(
        pa.Table.from_pylist(rows, schema=pa.schema(list(base))),
        str(tmp_path / "events.parquet"),
    )

    out = {
        (r.event_type, r.quantile_pct): r
        for r in q_events_dp_quantile(spark, str(tmp_path)).collect()
    }
    n = DP_C * DPQ_NBINS + DP_C           # grid users + capped power user
    for q in DPQ_QS:
        r = out[("m", q)]
        assert r.n_bounded == n
        # literal mechanism replay
        counts = [DP_C] * DPQ_NBINS
        counts[DPQ_NBINS - 1] += DP_C     # power user's 4 surviving 500s
        target = q * n // 100
        rk, cum, cums, ws = 0, 0, [], []
        for b in range(DPQ_NBINS):
            rk += counts[b]
            w = DPQ_W[min(abs(rk - target), DPQ_DCAP)]
            ws.append(w)
            cum += w
            cums.append(cum)
        h = hashlib.md5(f"dpq1:{q}:m".encode()).hexdigest()
        u = int(h[:12], 16) % cum
        sel = next(b for b in range(DPQ_NBINS) if cums[b] > u)
        assert r.sel_bin == sel, (q, sel, r.sel_bin)
        assert r.target_rank == target
        assert r.released_value == (sel + 1) * DPQ_BINW
        # the weight table must peak on the exact-quantile bin
        exact = min(
            range(DPQ_NBINS),
            key=lambda b: abs(sum(counts[: b + 1]) - target),
        )
        assert ws[exact] == max(ws)


def _naive_bfd(lengths, budget):
    """Independent item-by-item best-fit-decreasing: each item into the
    tightest bin that fits, new bin otherwise. Returns (n_bins, sorted
    residuals) — the ground truth the histogram bulk-drill fold must
    reproduce."""
    bins = []
    for ln in sorted(lengths, reverse=True):
        feas = [i for i, r in enumerate(bins) if r >= ln]
        if feas:
            best = min(feas, key=lambda i: bins[i])
            bins[best] -= ln
        else:
            bins.append(budget - ln)
    return len(bins), sorted(bins)


def test_bfd_fold_matches_item_by_item_simulation():
    """The bulk-drill histogram fold must equal naive per-item BFD on
    bin count AND the full residual multiset — across a hand case and
    a deterministic pseudo-random stress mix."""
    from collections import Counter

    from utxo_to_parquet_spark.operators.pipeline import (
        PACK_BUDGET,
        _bfd_fold,
    )

    def run(lengths):
        hist = sorted(Counter(lengths).items(), key=lambda t: -t[0])
        nbins, R = _bfd_fold(hist)
        want_n, want_res = _naive_bfd(lengths, PACK_BUDGET)
        got_res = sorted(
            r for r, cnt in enumerate(R) for _ in range(cnt)
        )
        assert (nbins, got_res) == (want_n, want_res), lengths[:10]

    run([300, 300, 212, 212, 100, 100])
    # deterministic stress mix: drilling, partial remainders, singletons
    lengths = [((i * i * 37) % 509) + 1 for i in range(400)]
    run(lengths)
    run([512] * 5 + [1] * 513 + [256, 255, 257])


def test_pack_bfd_hits_chunk_lower_bound_on_constructed_corpus(
    tmp_path, spark
):
    """Lengths 2x{300, 212, 100} at budget 512: BFD packs 300+212
    twice and 100+100 once — exactly ceil(total/512) = 3 bins, the
    chunk packer's lower bound, while pad-to-budget needs 6. Pins
    n_bins, both efficiency columns, and the residual fingerprint."""
    import hashlib

    from utxo_to_parquet_spark.operators.pipeline import (
        PACK_BUDGET,
        _bfd_fold,
        q_pipeline_pack_bfd,
    )

    def doc(i, n):
        return (i, " ".join(f"w{k}" for k in range(n)), "en", "web", n * 3)

    rows = [doc(1, 300), doc(2, 300), doc(3, 212), doc(4, 212),
            doc(5, 100), doc(6, 100)]
    _write_docs(tmp_path, rows)
    out = q_pipeline_pack_bfd(spark, str(tmp_path)).collect()
    assert {(r.length, r.n_docs) for r in out} == {(300, 2), (212, 2), (100, 2)}
    r = out[0]
    total = 1224
    assert r.n_bins_bfd == 3 and r.n_bins_chunk == 3
    assert r.eff_bfd_e6 == total * 1_000_000 // (3 * PACK_BUDGET)
    assert r.eff_pad_e6 == total * 1_000_000 // (6 * PACK_BUDGET)
    assert r.eff_bfd_e6 > r.eff_pad_e6
    _, R = _bfd_fold([(300, 2), (212, 2), (100, 2)])
    sig = hashlib.md5(",".join(str(x) for x in R).encode()).hexdigest()
    assert r.residual_sig == sig


def test_mc02_ibbp_open_gop_coded_order_and_reorder():
    """The round-14 GOP patterns: bframes=2 + gop=6 on a 7-frame
    display sequence must code I P B B I B B (each reference before
    the B-pair citing it, the mid-stream I opening a new GOP),
    keyframe-flag exactly the two JFIF payloads, decode back to
    display order bit-exactly, and predict the leading B-pair of the
    open GOP from the PREVIOUS GOP's reference (frame 4 == frame 3,
    so its B payload is pure skip bits — a decoder that wrongly used
    the new I as the forward reference would composite the moved
    sprite)."""
    import struct

    import numpy as np

    from utxo_to_parquet_spark.kernels.video import (
        decode_avi_mc_b,
        encode_avi_mc_b,
    )

    h, w, bg, sv, sy = 32, 64, 30, 100, 8
    frames = []
    for f in range(7):
        sx = 8 * ((f + 1) // 3)          # 0 0 8 8 8 16 16
        c = np.full((h, w), bg, np.uint8)
        c[sy : sy + 16, sx : sx + 16] = sv
        frames.append(c)
    blob = encode_avi_mc_b(frames, fps=10, bframes=2, gop=6)

    # walk the movi chunks: coded order + per-payload tags
    movi = blob.index(b"movi")
    off = movi + 4
    tags, sizes = [], []
    while off + 8 <= len(blob) and blob[off : off + 4] == b"00dc":
        (csize,) = struct.unpack_from("<I", blob, off + 4)
        p = blob[off + 8 : off + 8 + csize]
        tags.append("I" if p[:2] == b"\xff\xd8" else p[:1].decode())
        sizes.append(csize)
        off += 8 + csize + (csize % 2)
    assert tags == ["I", "P", "B", "B", "I", "B", "B"]

    # keyframe flags: exactly the two I payloads
    idx = blob.index(b"idx1")
    (isize,) = struct.unpack_from("<I", blob, idx + 4)
    flags = [
        struct.unpack_from("<III", blob, idx + 8 + 16 * i + 4)[0]
        for i in range(isize // 16)
    ]
    assert [f == 0x10 for f in flags] == [
        t == "I" for t in tags
    ]

    # the open-GOP leading B for display frame 4 (== frame 3): pure
    # skip bits against the PREVIOUS GOP's reference -> 8 macroblocks
    # x 1 skip bit = 1 byte payload (plus the 'B' tag)
    assert sizes[5] == 2

    dfps, dec = decode_avi_mc_b(blob)
    assert dfps == 10 and len(dec) == 7
    for a, b in zip(frames, dec):
        assert (a == b).all()


def test_mc02_bframes_validation():
    import numpy as np
    import pytest

    from utxo_to_parquet_spark.kernels.video import encode_avi_mc_b

    f = [np.zeros((16, 16), np.uint8)] * 3
    with pytest.raises(ValueError, match="bframes"):
        encode_avi_mc_b(f, bframes=0)


def test_dp_sum_clamps_values_and_replays_two_level_noise(tmp_path, spark):
    """DP sum pins: value clamping to [0, DPS_CVAL] (an outlier 1e6
    contributes exactly DPS_CVAL, a negative value contributes 0),
    contribution caps carry over from the count release, and the noise
    replays from the two seeded uniforms against the two-level
    threshold tables."""
    import datetime as dt
    import hashlib

    from utxo_to_parquet_spark.operators.events import (
        DP_C,
        DPS_CVAL,
        DPS_K,
        DPS_TQ,
        DPS_TR,
        q_events_dp_sum,
    )

    base = pq.read_schema(f"{SF_DIR}/events.parquet")
    t0 = dt.datetime(2025, 3, 1)
    rows, eid = [], 0

    def ev(user, etype, value):
        nonlocal eid
        eid += 1
        rows.append(dict(event_id=eid, ts=t0, user_id=user,
                         event_type=etype, value=float(value), props="{}"))

    ev(1, "m", 1_000_000.0)   # clamped to DPS_CVAL
    ev(1, "m", -5.0)          # clamped to 0
    ev(1, "m", 99.7)          # floors to 99
    for _ in range(50):
        ev(2, "m", 10.0)      # power user: only DP_C survive
    pq.write_table(
        pa.Table.from_pylist(rows, schema=pa.schema(list(base))),
        str(tmp_path / "events.parquet"),
    )

    out = {r.event_type: r for r in q_events_dp_sum(spark, str(tmp_path)).collect()}
    r = out["m"]
    assert r.n_bounded == 3 + DP_C
    assert r.sum_bounded == DPS_CVAL + 0 + 99 + DP_C * 10

    h1 = hashlib.md5(b"dps1:m").hexdigest()
    h2 = hashlib.md5(b"dps2:m").hexdigest()
    u1, u2 = int(h1[:12], 16), int(h2[:12], 16)
    sgn = -1 if h1[12] in "13579bdf" else 1
    mag = DPS_K * sum(1 for t in DPS_TQ if u1 < t) + sum(
        1 for t in DPS_TR if u2 < t
    )
    assert r.noise == sgn * mag
    assert r.released_sum == max(0, r.sum_bounded + r.noise)


def test_dps_decomposition_matches_geometric_law():
    """The two-level tables must realize the SAME law as a direct
    single-table geometric: P(X >= K*q) from the coarse table equals
    alpha^(K*q) to within 1/M per step, and the fine table's truncated
    tail matches (a^r - a^K)/(1 - a^K)."""
    import math

    from utxo_to_parquet_spark.operators.events import (
        DP_EPS_E6,
        DP_M,
        DPS_K,
        DPS_SENS,
        DPS_TQ,
        DPS_TR,
    )

    a = math.exp(-(DP_EPS_E6 / 1_000_000.0) / DPS_SENS)
    ak = a**DPS_K
    for q in (1, 2, 5, len(DPS_TQ)):
        assert DPS_TQ[q - 1] == math.floor(DP_M * ak**q)
    for r in (1, 2, 100, len(DPS_TR)):
        want = math.floor(DP_M * (a**r - ak) / (1.0 - ak))
        assert DPS_TR[r - 1] == want


def test_knn_classify_clustered_pins_and_tie_break(tmp_path, spark):
    """Two well-separated clusters classify correctly (9-of-10 votes
    from the query's own cluster); a query whose 10 nearest are an
    exact 5/5 label split must break the tie to the SMALLER label."""
    import numpy as np

    from utxo_to_parquet_spark.operators.similarity import (
        KNNC_K,
        q_sim_knn_classify,
    )

    base = pq.read_schema(f"{SF_DIR}/embeddings.parquet")
    rows = []

    def vec(vid, label, v):
        rows.append(dict(vec_id=vid, embedding=[float(x) for x in v],
                         label=label))

    a, b, c = [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]
    vec(0, 0, a)                       # query in cluster A
    for i in range(1, 10):             # 9 A-candidates
        vec(i, 0, [1, 0.01 * i, 0, 0])
    vec(10, 1, b)                      # query in cluster B
    for i in range(11, 20):            # 9 B-candidates
        vec(i, 1, [0.01 * (i - 10), 1, 0, 0])
    vec(20, 0, c)                      # tie-break query
    for i in range(21, 26):            # 5 identical label-0 candidates
        vec(i, 0, c)
    for i in (26, 27, 28, 29, 31):     # 5 identical label-1 candidates
        vec(i, 1, c)
    pq.write_table(
        pa.Table.from_pylist(rows, schema=pa.schema(list(base))),
        str(tmp_path / "embeddings.parquet"),
    )

    out = {r.q_id: r for r in q_sim_knn_classify(spark, str(tmp_path)).collect()}
    assert out[0].pred_label == 0 and out[0].correct
    assert out[0].votes == 9 and out[0].k == KNNC_K
    assert out[10].pred_label == 1 and out[10].correct
    assert out[10].votes == 9
    # exact 5/5 split -> smallest label wins
    assert out[20].pred_label == 0 and out[20].votes == 5


def test_dp_threshold_suppresses_single_user_partitions(tmp_path, spark):
    """Partition-selection pins: a type supported by ONE user (the
    worst case tau guards against) must be suppressed — its bounded
    count DP_SENS-at-most plus this seed's noise sits far below tau —
    while a type backed by many users is published with the same
    noisy count the count release would produce under the 'dpp1' seed."""
    import datetime as dt
    import hashlib

    from utxo_to_parquet_spark.operators.events import (
        DP_TAU,
        DP_THRESH,
        q_events_dp_threshold,
    )

    base = pq.read_schema(f"{SF_DIR}/events.parquet")
    t0 = dt.datetime(2025, 3, 1)
    rows, eid = [], 0

    def ev(user, etype):
        nonlocal eid
        eid += 1
        rows.append(dict(event_id=eid, ts=t0, user_id=user,
                         event_type=etype, value=1.0, props="{}"))

    for _ in range(30):
        ev(1, "rare")            # ONE user: must be suppressed
    for u in range(2, 102):
        ev(u, "popular")         # 100 users, 1 event each
    pq.write_table(
        pa.Table.from_pylist(rows, schema=pa.schema(list(base))),
        str(tmp_path / "events.parquet"),
    )

    out = {r.event_type: r for r in q_events_dp_threshold(spark, str(tmp_path)).collect()}
    assert "rare" not in out

    h = hashlib.md5(b"dpp1:popular").hexdigest()
    u = int(h[:12], 16)
    sgn = -1 if h[12] in "13579bdf" else 1
    mag = sum(1 for t in DP_THRESH if u < t)
    want = 100 + sgn * mag
    assert want >= DP_TAU, "fixture must actually clear the threshold"
    assert out["popular"].released_n == want
    assert out["popular"].tau == DP_TAU


def test_memorization_probe_counts_and_boundaries(tmp_path, spark):
    """Constructed memorization pins: a passage copied verbatim into
    two other documents reports n_other_docs == 2 / memorized; a
    passage repeated inside its own source only is NOT memorized but
    n_total counts both occurrences; and a doc where the passage
    appears only as a SUBSTRING of longer words must not match
    (word-boundary safety of the space-padding trick)."""
    from utxo_to_parquet_spark.operators.text import (
        MEMP_LEN,
        MEMP_SKIP,
        q_text_memorization_probe,
    )

    pad = " ".join(f"x{i}" for i in range(MEMP_SKIP))
    passage = " ".join(f"p{i}" for i in range(MEMP_LEN))
    filler = " ".join(f"f{i}" for i in range(10))
    rows = [
        # probe doc 0: pad + passage + filler
        (0, f"{pad} {passage} {filler}", "en", "web", 100),
        # two verbatim carriers
        (3, f"{filler} {passage}", "en", "web", 100),
        (7, f"{passage} {filler}", "en", "web", 100),
        # substring-only carrier: every passage word embedded in a
        # longer token -> must NOT match
        (11, " ".join(f"zz{w}zz" for w in passage.split()), "en", "web", 100),
        # probe doc 25: its passage repeats INSIDE the doc only
        (25, f"{pad} {passage.replace('p', 'q')} {filler}"
             f" {passage.replace('p', 'q')}", "en", "web", 100),
    ]
    _write_docs(tmp_path, rows)
    out = {
        r.probe_doc_id: r
        for r in q_text_memorization_probe(spark, str(tmp_path)).collect()
    }
    r0 = out[0]
    assert r0.passage == passage
    assert r0.n_docs == 3 and r0.n_other_docs == 2 and r0.memorized
    assert r0.n_total == 3
    r25 = out[25]
    assert r25.n_total == 2 and r25.n_docs == 1
    assert r25.n_other_docs == 0 and not r25.memorized


def test_simhash_search_exact_copy_and_twin(tmp_path, spark):
    """Hamming search twin: an exact copy shares the fingerprint
    (hamming 0, rank 1 by lower doc_id tie); the planted one-word-
    dropped twin perturbs only a few majority votes and sits within a
    small Hamming ball of its source."""
    from utxo_to_parquet_spark.operators.dedup import q_dedup_simhash_search

    a = " ".join(f"a{i}" for i in range(40))
    c = " ".join(f"c{i}" for i in range(40))
    rows = [
        (0, a, "en", "web", len(a)),
        (4, a, "en", "web", len(a)),    # exact copy
        (50, c, "en", "web", len(c)),
    ]
    _write_docs(tmp_path, rows)
    out = {}
    for r in q_dedup_simhash_search(spark, str(tmp_path)).collect():
        out.setdefault(r.q_doc, {})[r.rnk] = r
    assert out[0][1].cand_doc == 4 and out[0][1].hamming == 0
    twin = [r for r in out[0].values() if r.cand_doc == 1000000]
    assert twin and twin[0].hamming < 8
    # the twin's own probe view: source and copy are its two nearest
    t = out[1000000]
    assert {t[1].cand_doc, t[2].cand_doc} == {0, 4}


def test_conformal_qhat_replay_and_coverage(spark):
    """Split-conformal pins on the fixture corpus: q_hat must equal a
    literal Python replay of the ceil((n+1)(1-alpha))-th smallest
    calibration nonconformity (built from the independently-gated
    score relation), per-row set membership must follow score vs q_hat
    exactly, and held-out coverage must sit in the finite-sample band
    around 1 - alpha (the guarantee is in expectation over calibration
    draws — coverage CONCENTRATES AT the target, not above it, because
    q_hat deliberately cuts the least-confident 10% of true labels;
    with ~250 held-out docs 3 standard errors is ~0.06)."""
    import hashlib

    from utxo_to_parquet_spark.operators.text import (
        CONF_ALPHA_E2,
        CONF_CAL_HEX,
        q_quality_nb_conformal,
        q_quality_nb_score,
    )

    sf = SF_DIR
    scores = q_quality_nb_score(spark, sf).collect()
    cal = sorted(
        (
            (r.score_e6 if r.is_bad else -r.score_e6, r.doc_id)
            for r in scores
            if hashlib.md5(str(r.doc_id).encode()).hexdigest()[0]
            in CONF_CAL_HEX
        )
    )
    n_cal = len(cal)
    k = ((n_cal + 1) * (100 - CONF_ALPHA_E2) + 99) // 100
    want_qhat = cal[k - 1][0]

    out = q_quality_nb_conformal(spark, sf).collect()
    assert out, "held-out half must be non-empty"
    for r in out:
        assert r.q_hat == want_qhat and r.n_cal == n_cal
        assert r.in_set_good == (-r.score_e6 <= r.q_hat)
        assert r.in_set_bad == (r.score_e6 <= r.q_hat)
        assert r.set_size == int(r.in_set_good) + int(r.in_set_bad)
        s = r.score_e6 if r.is_bad else -r.score_e6
        assert r.covered == (s <= r.q_hat)
    cov = sum(r.covered for r in out) / len(out)
    target = (100 - CONF_ALPHA_E2) / 100
    assert target - 0.06 <= cov <= 1.0, cov


def test_dbscan_star_geometry_literal_replay(tmp_path, spark):
    """Constructed DBSCAN pins via a LITERAL PYTHON REPLAY of the whole
    pipeline (LSH band keys from the same _PLANES literals, candidate
    collisions, eps filter, degree threshold, core-core components,
    min-label border adoption): a hub with four spokes at cos 0.88
    (spoke-spoke cos 0.77 < eps) plus an identical-copy group and an
    orthogonal noise point. The replay derives expected roles from the
    fixture instead of guessing which LSH bands collide."""
    import numpy as np

    from utxo_to_parquet_spark.operators.dedup import (
        _PLANES,
        DBS_COPIES,
        DBS_EPS,
        DBS_MINPTS,
        DBS_PLANT_MOD,
        EMB_BANDS,
        EMB_MAX_BITS,
        emb_band_bits_for,
        q_dedup_dbscan,
    )

    dim = 64
    vecs = {}

    def unit(i, a):
        v = np.zeros(dim)
        v[0] = a
        v[i] = np.sqrt(1 - a * a)
        return v

    hub = np.zeros(dim); hub[0] = 1.0
    vecs[3] = hub
    # spoke axes 1/2/4/5 are chosen so each spoke COLLIDES with the hub
    # in at least one LSH band under the fixed _PLANES literals (axis 3
    # does not — verified offline); spoke-spoke cos is 0.88^2 < eps
    for j, vid in zip((1, 2, 4, 5), (11, 12, 13, 14)):
        vecs[vid] = unit(j, 0.88)
    g = np.zeros(dim); g[7] = 1.0                # identical-copy group
    for vid in (21, 22, 23, 24, 26):
        vecs[vid] = g
    n = np.zeros(dim); n[30] = 1.0               # orthogonal noise
    vecs[6] = n

    rows = [
        dict(vec_id=vid, embedding=[float(x) for x in v], label=0)
        for vid, v in sorted(vecs.items())
    ]
    base = pq.read_schema(f"{SF_DIR}/embeddings.parquet")
    pq.write_table(
        pa.Table.from_pylist(rows, schema=pa.schema(list(base))),
        str(tmp_path / "embeddings.parquet"),
    )

    # ---- literal replay (including the operator's own augmentation) --
    aug = dict(vecs)
    for vid in list(vecs):
        if vid % DBS_PLANT_MOD == 0:
            for k in range(1, DBS_COPIES + 1):
                aug[vid + k * 1000000] = vecs[vid]
    bits = emb_band_bits_for(len(aug))
    P = np.array(
        [_PLANES[b * EMB_MAX_BITS + j] for b in range(EMB_BANDS)
         for j in range(bits)]
    )
    keys = {}
    for vid, v in aug.items():
        s = (P @ v) > 0
        keys[vid] = [
            sum(1 << j for j in range(bits) if s[b * bits + j])
            for b in range(EMB_BANDS)
        ]
    ids = sorted(aug)
    nbrs = {vid: set() for vid in ids}
    for i, va in enumerate(ids):
        for vb in ids[i + 1:]:
            if any(ka == kb for ka, kb in zip(keys[va], keys[vb])):
                ca = aug[va] @ aug[vb] / (
                    np.linalg.norm(aug[va]) * np.linalg.norm(aug[vb])
                )
                if ca >= DBS_EPS:
                    nbrs[va].add(vb)
                    nbrs[vb].add(va)
    core = {v for v in ids if len(nbrs[v]) >= DBS_MINPTS}
    # components over core-core edges (min label)
    cluster = {}
    for c in sorted(core):
        if c in cluster:
            continue
        stack, comp = [c], []
        seen = {c}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in nbrs[x]:
                if y in core and y not in seen:
                    seen.add(y)
                    stack.append(y)
        lab = min(comp)
        for x in comp:
            cluster[x] = lab
    expect = {}
    for v in ids:
        if v in core:
            expect[v] = ("core", cluster[v])
        else:
            adj = [cluster[u] for u in nbrs[v] if u in core]
            expect[v] = ("border", min(adj)) if adj else ("noise", -1)

    out = {
        r.vec_id: (r.role, r.cluster, r.n_neighbors)
        for r in q_dedup_dbscan(spark, str(tmp_path)).collect()
    }
    assert set(out) == set(ids)
    for v in ids:
        assert out[v][:2] == expect[v], (v, out[v], expect[v])
        assert out[v][2] == len(nbrs[v]), v
    # the geometry must actually exercise all three roles
    roles = {r for r, _ in expect.values()}
    assert roles == {"core", "border", "noise"}, roles

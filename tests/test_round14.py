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

"""Constructed-case and invariant tests for the round-8 session-3
operators — semantics the sf0.001 differential gate can't distinguish
from a lucky hash match (normalization contracts, metric ranges,
decomposition identities, exact canonicalization strings)."""

from __future__ import annotations

import math

import duckdb
import pytest

from utxo_to_parquet_spark.operators import all_queries

SF_DIR = "/root/testdata/sf0.001"
QUERIES = all_queries()


def test_hits_normalization_contract(spark):
    rows = QUERIES["q_graph_hits"](spark, SF_DIR).collect()
    hubs = [r.hub_e9 for r in rows if r.hub_e9 is not None]
    auths = [r.auth_e9 for r in rows if r.auth_e9 is not None]
    assert hubs and auths
    # max-normalization: the top hub/authority sits exactly at 1e9,
    # everything else strictly positive (scores reach every node that
    # has at least one edge)
    assert max(hubs) == 10**9 and max(auths) == 10**9
    assert min(hubs) > 0 and min(auths) > 0
    # bipartite: a node is a hub XOR an authority
    assert all((r.hub_e9 is None) != (r.auth_e9 is None) for r in rows)


def test_jaccard_neighbors_bounds(spark):
    rows = QUERIES["q_graph_jaccard_neighbors"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 25
    for r in rows:
        assert 0 < r.n_inter <= r.n_union
        assert 0 < r.jaccard_e6 <= 10**6
        assert r.cust_a < r.cust_b
    # sorted by score desc then pair
    scores = [(-r.jaccard_e6, r.cust_a, r.cust_b) for r in rows]
    assert scores == sorted(scores)


def test_kendall_tau_pair_accounting(spark):
    rows = QUERIES["q_events_kendall_tau"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r.tau_e6) <= 10**6
        assert r.conc + r.disc <= r.n_pairs


def test_theil_sen_pair_count_is_span_bounded(spark):
    sen = {r.event_type: r for r in QUERIES["q_events_theil_sen"](spark, SF_DIR).collect()}
    hours = dict(
        duckdb.sql(
            f"""SELECT event_type,
                       COUNT(DISTINCT epoch_ns(ts) // 3600000000000)
                FROM '{SF_DIR}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )
    for et, r in sen.items():
        h = hours[et]
        assert r.n_pairs == h * (h - 1) // 2


def test_theil_decomposition_identity(spark):
    """between + weighted-within must reassemble the GLOBAL Theil index
    computed independently from raw customer revenues."""
    rows = QUERIES["q_agg_theil_index"](spark, SF_DIR).collect()
    s = sum(r.sum_cents for r in rows)
    n = sum(r.n_cust for r in rows)
    # reassemble from the op's own fixed-point parts
    t_between = sum(r.between_e9 for r in rows) / 1e9
    t_within = sum((r.sum_cents / s) * (r.within_e9 / 1e9) for r in rows)
    # independent direct computation
    xs = [
        x
        for (x,) in duckdb.sql(
            f"""SELECT SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                FROM '{SF_DIR}/orders.parquet' GROUP BY o_custkey"""
        ).fetchall()
    ]
    mu = s / n
    t_direct = sum((x / s) * math.log(x / mu) for x in xs)
    assert t_direct >= 0
    assert abs((t_between + t_within) - t_direct) < 1e-6


def test_lorenz_curve_shape(spark):
    rows = sorted(
        QUERIES["q_agg_lorenz_curve"](spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    # NTILE balance: decile populations differ by at most one
    ns = [r.n_cust for r in rows]
    assert max(ns) - min(ns) <= 1
    # cumulative share is strictly increasing, convex-ish (sorted
    # ascending by spend -> marginal share nondecreasing), ends at 100%
    shares = [r.cum_share_e6 for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] == 10**6
    marginals = [b - a for a, b in zip([0] + shares[:-1], shares)]
    assert all(m2 >= m1 for m1, m2 in zip(marginals, marginals[1:]))


def test_winsorized_band_bounds(spark):
    for r in QUERIES["q_agg_winsorized_mean"](spark, SF_DIR).collect():
        assert r.p05_e2 <= r.p95_e2
        assert r.n * r.p05_e2 <= r.win_sum_e2 <= r.n * r.p95_e2
        assert 0 < r.n_trim <= r.n
        assert r.n_trim * r.p05_e2 <= r.trim_sum_e2 <= r.n_trim * r.p95_e2


def test_iqr_outlier_bounds(spark):
    for r in QUERIES["q_quality_outlier_iqr"](spark, SF_DIR).collect():
        assert r.q1_e4 <= r.q3_e4
        assert r.n_low + r.n_high <= r.n
        assert 0 <= r.out_rate_e6 <= 10**6


def test_entropy_hourly_range(spark):
    rows = QUERIES["q_events_entropy_hourly"](spark, SF_DIR).collect()
    cap = int(math.log(5) * 1e9) + 1000  # five event types max
    for r in rows:
        assert 1 <= r.n_types <= 5
        assert 0 <= r.entropy_e9 <= cap
        if r.n_types == 1:
            assert r.entropy_e9 == 0


def test_retrieval_metrics_ranges(spark):
    rows = QUERIES["q_sim_retrieval_metrics"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hits <= min(10, r.n_rel)
        assert r.prec_e6 == r.hits * 10**6 // 10
        assert 0 <= r.recall_e6 <= 10**6
        assert 0 < r.rr_e6 <= 10**6
        assert 0 <= r.ndcg_e6 <= 10**6
        # a perfect top-10 (all relevant, n_rel >= 10) must score
        # ndcg == 1 exactly in the fixed-point algebra
        if r.hits == 10 and r.n_rel >= 10:
            assert r.ndcg_e6 == 10**6


def test_url_canonicalize_exact_strings(spark):
    out = {
        r.doc_id: r
        for r in QUERIES["q_text_url_canonicalize"](spark, SF_DIR).collect()
    }
    # doc 6: https variant with ref=home (6 % 2 == 0, 6 % 6 == 0)
    r = out[6]
    assert r.url == (
        "https://WWW.Shop1.Example.COM:443/Category/Item6/"
        "?utm_source=news&id=6&utm_campaign=x&ref=home#section2"
    )
    assert r.canon_url == (
        "https://www.shop1.example.com/Category/Item6?id=6&ref=home"
    )
    assert r.n_dropped == 2
    # doc 2: https variant without ref
    assert out[2].canon_url == "https://www.shop2.example.com/Category/Item2?id=2"
    # doc 1: http variant is already canonical
    r1 = out[1]
    assert r1.url == "http://blog.example.org/post-1?page=1"
    assert r1.canon_url == "http://blog.example.org/post-1?page=1"
    assert r1.n_dropped == 0


def test_gopher_rules_on_planted_docs(spark):
    out = {
        r.doc_id: r
        for r in QUERIES["q_text_gopher_quality"](spark, SF_DIR).collect()
    }
    txt = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    )
    # doc 77 gets BOTH plants (77 % 7 == 0 and 77 % 11 == 0)
    words = (txt[77] + " ### $$$ @@@" + " 0 1 22 333").split(" ")
    r = out[77]
    assert r.n_words == len(words)
    alpha = sum(1 for w in words if w.isalpha() and w == w.lower())
    assert r.alpha_e6 == math.floor(alpha / len(words) * 1e6 + 0.5)
    assert r.pass_alpha == (r.alpha_e6 >= 900000)
    # short docs can't absorb their planted junk: somebody fails the bar
    assert any(not out[i].pass_alpha for i in out if i % 7 == 0 or i % 11 == 0)
    # an untouched doc keeps a perfect alpha ratio
    clean = next(
        i for i in out if i % 7 != 0 and i % 11 != 0
    )
    assert out[clean].alpha_e6 == 10**6


def test_c4_planted_lines(spark):
    out = {
        r.doc_id: r
        for r in QUERIES["q_text_c4_line_filter"](spark, SF_DIR).collect()
    }
    # doc 12: planted keeper (12 % 3 == 0) AND code line (12 % 4 == 0);
    # the code line must be dropped, the keeper kept
    r = out[12]
    assert r.n_kept >= 1
    assert r.keep_doc
    # every doc with a planted keeper line keeps >= 1 line
    assert all(out[i].keep_doc for i in out if i % 3 == 0 and i % 13 != 0)


def test_hapax_bounds(spark):
    for r in QUERIES["q_text_hapax_ratio"](spark, SF_DIR).collect():
        assert 0 <= r.hapax <= r.vocab <= r.tokens
        assert r.hapax_ratio_e6 == r.hapax * 10**6 // r.vocab


def test_wow_delta_first_week_null_and_exact(spark):
    rows = QUERIES["q_events_wow_delta"](spark, SF_DIR).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.wk)
        assert rs[0].prev_c is None and rs[0].delta_c_e6 is None
        for prev, cur in zip(rs, rs[1:]):
            assert cur.prev_c == prev.c
            assert cur.delta_c_e6 == (cur.c - prev.c) * 10**6 // prev.c or \
                cur.delta_c_e6 == int((cur.c - prev.c) * 10**6 / prev.c)


def test_mad_flags_subset_and_median_band(spark):
    rows = QUERIES["q_events_anomaly_mad"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.mad_e4 > 0
        assert 0 <= r.n_anomalies < r.n
        # the max modified z must clear the 3.5 bar iff anomalies exist
        assert (r.n_anomalies > 0) == (r.max_robust_z_e6 > 3_500_000)


def test_dow_hour_heatmap_grid(spark):
    rows = QUERIES["q_events_dow_hour_heatmap"](spark, SF_DIR).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hod <= 23
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        peaks = [r for r in rs if r.is_peak]
        assert len(peaks) == 1
        assert peaks[0].c == max(r.c for r in rs)
        # 2024-01-01..01-30 covers every dow and hod at sf0.001 volumes
        assert len(rs) <= 168


def test_pmi_pairs_are_ordered_and_bounded(spark):
    rows = QUERIES["q_text_pmi_pairs"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.term_a < r.term_b
        assert 0 < r.cab <= min(r.ca, r.cb)
    keys = [(-r.pmi_e6, r.term_a, r.term_b) for r in rows]
    assert keys == sorted(keys)


def test_knn_hubness_accounts_every_vector(spark):
    import duckdb as _duck

    rows = QUERIES["q_sim_knn_hubness"](spark, SF_DIR).collect()
    total = sum(r.n_vectors for r in rows)
    (n_emb,) = _duck.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()[0]
    assert total == n_emb  # histogram partitions the corpus exactly
    # edge conservation: sum(indeg * count) == |edges| of the kNN graph
    edges = QUERIES["q_sim_knn_graph"](spark, SF_DIR).count()
    assert sum(r.indeg * r.n_vectors for r in rows) == edges


def test_url_dedup_collapses_every_planted_recrawl(spark):
    rows = QUERIES["q_dedup_url_exact"](spark, SF_DIR).collect()
    # every 5th doc was re-crawled under different dressing: its
    # canonical key must hold exactly two raw-distinct URLs
    planted = [r for r in rows if r.n_copies > 1]
    n_docs = sum(1 for r in rows if r.kept_doc_id < 1000000)
    assert len(planted) == (n_docs + 4) // 5
    for r in planted:
        assert r.n_copies == 2
        assert r.n_distinct_raw == 2  # raw-string dedup would NOT collapse
        assert r.kept_doc_id < 1000000  # original wins the min-id pick


def test_cov_matrix_is_consistent(spark):
    import math

    rows = QUERIES["q_agg_cov_matrix"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # correlations bounded, covariance sign agrees with correlation
        for a, b in [("qty", "price"), ("qty", "disc"), ("price", "tax")]:
            corr = getattr(r, f"corr_{a}_{b}_e6")
            cov = getattr(r, f"cov_{a}_{b}_e4")
            assert -10**6 <= corr <= 10**6
            assert (corr > 0) == (cov > 0) or abs(cov) <= 1
        # cauchy-schwarz: cov^2 <= var_a * var_b (fixed-point slack)
        cv = r.cov_qty_price_e4 / 1e4
        assert cv * cv <= (r.var_qty_e4 / 1e4) * (r.var_price_e4 / 1e4) * 1.001
        # quantity is uniform 1..50-ish: its variance must be near (50^2-1)/12
        assert 150 < r.var_qty_e4 / 1e4 < 350

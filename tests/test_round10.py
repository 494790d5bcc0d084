"""Round-10 constructed-case tests: witness-verified substring dedup,
corpus-scaled dedup defaults, merkle fan-in."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_documents(tmp_path, rows):
    """rows: list of (doc_id, text, source); full fixture schema."""
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


P = " ".join(f"p{i}" for i in range(10))
Q = " ".join(f"q{i}" for i in range(10))
R = " ".join(f"r{i}" for i in range(10))


def test_substring_exact_flags_abutting_overmerge(tmp_path, spark):
    """The canonical shingle-chain over-extension: doc1 = P Q R where
    P Q comes from doc2 and Q R from doc3. Every 8-word unit of doc1 is
    duplicated SOMEWHERE, so the island chain merges all of P Q R into
    one 30-word span — but that span occurs whole in NO single other
    document. The verify pass must flag it (is_exact=False) and trim the
    verified prefix to exactly |P Q| = 20 words (the doc2 witness),
    while doc2's and doc3's own spans verify fully."""
    from utxo_to_parquet_spark.operators.dedup import q_dedup_substring_exact

    _write_documents(
        tmp_path,
        [
            (1, f"{P} {Q} {R}", "web"),
            (2, f"{P} {Q}", "web"),
            (3, f"{Q} {R}", "web"),
        ],
    )
    out = {r.doc_id: r for r in q_dedup_substring_exact(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}

    d1 = out[1]
    assert (d1.span_start, d1.span_words, d1.n_units) == (0, 30, 23)
    assert d1.is_exact is False
    assert d1.verified_words == 20  # the doc2 witness covers exactly P Q
    assert d1.n_full_witnesses == 0

    d2 = out[2]
    assert (d2.span_start, d2.span_words) == (0, 20)
    assert d2.is_exact is True and d2.n_full_witnesses == 1
    assert d2.verified_words == 20

    d3 = out[3]
    assert (d3.span_start, d3.span_words) == (0, 20)
    assert d3.is_exact is True and d3.n_full_witnesses == 1
    assert d3.verified_words == 20


def test_substring_exact_counts_multiple_full_witnesses(tmp_path, spark):
    """A span duplicated verbatim in k other docs reports k full
    witnesses and stays exact."""
    from utxo_to_parquet_spark.operators.dedup import q_dedup_substring_exact

    boiler = f"{P} {Q}"
    _write_documents(
        tmp_path,
        [
            (1, boiler, "a"),
            (2, boiler, "b"),
            (3, boiler, "c"),
        ],
    )
    out = q_dedup_substring_exact(spark, str(tmp_path)).collect()
    assert len(out) == 3
    for r in out:
        assert r.is_exact is True
        assert r.n_full_witnesses == 2
        assert r.verified_words == r.span_words == 20


def test_emb_band_bits_scale_with_corpus():
    """Key width grows one bit per corpus doubling past the base, capped
    at EMB_MAX_BITS — the scale-safe default the round-9 probe measured
    at exponent 0.53."""
    from utxo_to_parquet_spark.operators.dedup import (
        EMB_BAND_BITS,
        EMB_BASE_N,
        EMB_MAX_BITS,
        emb_band_bits_for,
    )

    assert emb_band_bits_for(1) == EMB_BAND_BITS
    assert emb_band_bits_for(EMB_BASE_N) == EMB_BAND_BITS
    assert emb_band_bits_for(EMB_BASE_N + 1) == EMB_BAND_BITS + 1
    assert emb_band_bits_for(EMB_BASE_N * 16) == EMB_BAND_BITS + 4
    assert emb_band_bits_for(10**12) == EMB_MAX_BITS


def test_sem_seeds_scale_with_corpus():
    from utxo_to_parquet_spark.operators.dedup import (
        SEM_K,
        SEM_TARGET,
        sem_seeds_for,
    )

    assert sem_seeds_for(0) == SEM_K
    assert sem_seeds_for(SEM_K * SEM_TARGET) == SEM_K
    assert sem_seeds_for(32000) == 128  # the 16x probe replay
    assert sem_seeds_for(SEM_TARGET * 100) == 100


def test_merkle_depth_matches_fanin_fold():
    """The Python ceil-div depth equals ceil(log16 n) (what the oracle
    computes as CEIL(LOG2(n)/4)) for every n in the awkward range."""
    import math

    from utxo_to_parquet_spark.operators.utxo_queries import MERKLE_FANIN

    for n in list(range(1, 300)) + [16**3, 16**3 + 1, 600000, 16**5]:
        depth, m = 0, n
        while m > 1:
            m = -(-m // MERKLE_FANIN)
            depth += 1
        expect = 0 if n == 1 else math.ceil(math.log2(n) / 4 - 1e-12)
        assert depth == expect, n


def test_suffix_ranks_order_constructed_suffixes(tmp_path, spark):
    """Prefix-doubling ranks must order suffixes exactly as a direct
    (brute-force) suffix sort does, across documents, including equal
    suffixes in different documents sharing one rank."""
    from utxo_to_parquet_spark.operators.text import q_text_suffix_ranks

    docs = [
        (1, "b a b a b", "w"),
        (2, "a b a b", "w"),
        (3, "c b a", "w"),
    ]
    _write_documents(tmp_path, docs)
    out = {
        (r.doc_id, r.pos): r.srank
        for r in q_text_suffix_ranks(spark, str(tmp_path)).collect()
    }
    suffixes = {}
    for doc_id, text, _ in docs:
        w = text.split(" ")
        for p in range(len(w)):
            suffixes[(doc_id, p)] = tuple(w[p:])
    assert set(out) == set(suffixes)
    # dense brute-force ranks over the distinct sorted suffixes
    ordered = sorted(set(suffixes.values()))
    brute = {k: ordered.index(v) + 1 for k, v in suffixes.items()}
    assert out == brute
    # equal suffixes across docs share a rank: "a b" occurs in docs 1+2
    assert out[(1, 3)] == out[(2, 2)]


def test_readme_query_count_matches_registry():
    """ADVICE r9: derive the README count from the registry so it can't
    drift again."""
    import os
    import re

    from utxo_to_parquet_spark.operators import all_queries

    readme = open(
        os.path.join(os.path.dirname(__file__), "..", "README.md")
    ).read()
    m = re.search(r"(\d+) registered queries", readme)
    assert m, "README must state the registered-query count"
    assert int(m.group(1)) == len(all_queries())
    m2 = re.search(r"ALL (\d+) queries", readme)
    assert m2 and int(m2.group(1)) == len(all_queries())


def test_longest_repeat_matches_bruteforce(tmp_path, spark):
    """SA+LCP maximal repeats vs a direct brute force: cross-document
    shared blocks and INTERNAL (same-doc) repeats both count; lengths
    must be exact."""
    from utxo_to_parquet_spark.operators.text import q_text_longest_repeat

    A = " ".join(f"a{i}" for i in range(12))
    E = " ".join(f"e{i}" for i in range(9))
    docs = [
        (1, f"{A} j0 j1 j2 j3 j4 j5", "w"),          # shares A with doc 2
        (2, f"c0 c1 {A} d0 d1 d2", "w"),              # A embedded mid-doc
        (3, f"{E} f0 f1 f2 {E}", "w"),                # internal repeat E
    ]
    _write_documents(tmp_path, docs)
    out = {
        r.doc_id: r for r in q_text_longest_repeat(spark, str(tmp_path)).collect()
    }

    # brute force: for every suffix, max common prefix with any OTHER
    # suffix in the corpus
    suf = []
    for doc_id, text, _ in docs:
        w = text.split(" ")
        for p in range(len(w)):
            suf.append((doc_id, p, w[p:]))

    def cpl(x, y):
        n = 0
        for a, b in zip(x, y):
            if a != b:
                break
            n += 1
        return n

    brute = {}
    for i, (d, p, s) in enumerate(suf):
        best = 0
        for j, (d2, p2, s2) in enumerate(suf):
            if i != j:
                best = max(best, cpl(s, s2))
        brute.setdefault(d, []).append(best)
    for doc_id, text, _ in docs:
        exp_max = max(brute[doc_id])
        exp_n8 = sum(1 for v in brute[doc_id] if v >= 8)
        got = out[doc_id]
        assert got.n_words == len(text.split(" "))
        assert got.max_rep_words == exp_max, (doc_id, got, exp_max)
        assert got.n_rep_positions == exp_n8, (doc_id, got, exp_n8)
    assert out[1].max_rep_words == 12 and out[3].max_rep_words == 9


def test_sa_repeat_positions_equal_shingle_hits(spark):
    """Cross-family invariant: a position starts a >= 8-word repeat
    (SA dup_len >= REP_MIN_WORDS) iff its 8-word shingle unit is
    duplicated (the dedup family's hits relation) — the two
    independently-built pipelines must agree per document on the
    fixture corpus."""
    from utxo_to_parquet_spark.operators.dedup import (
        SUBSTR_W,
        _substring_hits,
        _substring_units,
    )
    from utxo_to_parquet_spark.operators.text import (
        REP_MIN_WORDS,
        q_text_longest_repeat,
    )

    assert REP_MIN_WORDS == SUBSTR_W
    sf = "/root/testdata/sf0.001"
    sa = {
        r.doc_id: r.n_rep_positions
        for r in q_text_longest_repeat(spark, sf).collect()
    }
    hits = _substring_hits(_substring_units(spark, sf))
    sh = {
        r.doc_id: r.n
        for r in hits.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    for doc_id, n_sa in sa.items():
        assert sh.get(doc_id, 0) == n_sa, (doc_id, sh.get(doc_id, 0), n_sa)
    # and no doc has shingle hits without SA seeing them
    assert all(doc_id in sa for doc_id in sh)


def _write_orders(tmp_path, rows):
    """rows: list of (o_orderkey, status, priority); full orders schema."""
    import datetime

    table = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([1] * len(rows), pa.int64()),
            "o_orderstatus": pa.array([r[1] for r in rows], pa.string()),
            "o_totalprice": pa.array([100.0] * len(rows), pa.float64()),
            "o_orderdate": pa.array(
                [datetime.datetime(2024, 1, 1)] * len(rows),
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "orders.parquet"))


def test_chi2_constructed_2x2(tmp_path, spark):
    """Known 2x2 contingency table [[10,20],[30,40]]: replicate the
    exact per-term e6 snapping in Python and compare chi2/Cramér's V
    bit-for-bit."""
    import math

    from utxo_to_parquet_spark.operators.relational import (
        q_agg_chi2_independence,
    )

    counts = {("F", "HI"): 10, ("F", "LO"): 20, ("O", "HI"): 30, ("O", "LO"): 40}
    rows = []
    k = 0
    for (st, pr), n in counts.items():
        for _ in range(n):
            rows.append((k, st, pr))
            k += 1
    _write_orders(tmp_path, rows)
    out = q_agg_chi2_independence(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    n = 100
    rt = {"F": 30, "O": 70}
    ct = {"HI": 40, "LO": 60}
    terms = sum(
        math.floor(o * o / rt[a] / ct[b] * n * 1e6 + 0.5)
        for (a, b), o in counts.items()
    )
    chi2_e6 = terms - n * 1000000
    assert (r.n, r.r_levels, r.c_levels, r.dof) == (100, 2, 2, 1)
    assert r.chi2_e6 == chi2_e6
    assert r.cramers_v_e6 == math.floor(
        math.sqrt((chi2_e6 / 1e6) / (n * 1)) * 1e6 + 0.5
    )


def test_mattr_constructed(tmp_path, spark):
    """All-distinct words -> MATTR 1.0 exactly; a fully repeated word ->
    1/width; short doc degrades to whole-doc TTR."""
    from utxo_to_parquet_spark.operators.text import MATTR_WIN, q_text_mattr

    distinct60 = " ".join(f"w{i}" for i in range(60))
    same60 = " ".join(["x"] * 60)
    short = "a b c a"
    _write_documents(
        tmp_path, [(1, distinct60, "s"), (2, same60, "s"), (3, short, "s")]
    )
    out = {r.doc_id: r for r in q_text_mattr(spark, str(tmp_path)).collect()}
    assert out[1].width == MATTR_WIN and out[1].n_windows == 11
    assert out[1].mattr_e6 == 1000000
    assert out[2].mattr_e6 == 1000000 // MATTR_WIN * 1  # 1 distinct / 50
    assert out[3].width == 4 and out[3].n_windows == 1
    assert out[3].mattr_e6 == 3 * 1000000 // 4  # TTR of the whole doc


def test_jl_projection_pins_raw_coordinate(spark):
    """p0_e6 must equal the left-to-right dot of the vector with JL row
    0 (recomputed independently), and the norm ratios must concentrate
    near 1 — the JL guarantee at 16 dims."""
    import numpy as np

    from utxo_to_parquet_spark.operators.similarity import (
        _JL_ROWS,
        JL_DIM,
        q_sim_jl_projection,
    )

    sf = "/root/testdata/sf0.001"
    out = q_sim_jl_projection(spark, sf).collect()
    assert all(r.proj_dim == JL_DIM for r in out)
    ratios = [r.ratio_e6 / 1e6 for r in out]
    med = sorted(ratios)[len(ratios) // 2]
    assert 0.5 < med < 2.0
    # recompute one vector's p0 with strict left-to-right accumulation
    import pyarrow.parquet as pq2

    t = pq2.read_table(f"{sf}/embeddings.parquet").to_pydict()
    vec = {i: e for i, e in zip(t["vec_id"], t["embedding"])}
    r0 = next(r for r in out if r.vec_id == min(vec))
    acc = 0.0
    for x, p in zip(vec[min(vec)], _JL_ROWS[0]):
        acc += float(np.float64(x)) * p
    assert r0.p0_e6 == int(np.floor(acc * 1e6 + 0.5))

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

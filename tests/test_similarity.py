"""Approximation-quality tests for the ANN / near-dup scale paths.

The oracle gate proves each query computes its own definition correctly;
these tests quantify how the approximate variants relate to their exact
baselines — recall floors (the synthetic vectors are near-orthogonal, so
absolute recall is modest by construction; floors guard against
regressions to zero overlap) and the subset/precision invariants that
must hold exactly.
"""

from __future__ import annotations

import pytest

from utxo_to_parquet_spark.operators import all_queries

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def test_ivf_recall_vs_exact(spark, queries):
    exact = {(r.q_id, r.c_id) for r in queries["q_sim_cosine_topk"](spark, SF_DIR).collect()}
    ivf = {(r.q_id, r.c_id) for r in queries["q_sim_ivf_topk"](spark, SF_DIR).collect()}
    assert len(ivf) == len(exact)  # same top-k contract per query
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.2, f"IVF recall collapsed: {recall:.3f}"


def test_embedding_lsh_is_precise_subset_of_exact(spark, queries):
    """The banded-LSH near-dup verifies candidates with the SAME exact
    cosine threshold, so precision must be 1.0: every emitted pair is in
    the exact result. Recall is the documented trade."""
    exact = {
        (r.dup_a, r.dup_b) for r in queries["q_dedup_embedding_cosine"](spark, SF_DIR).collect()
    }
    lsh = {(r.dup_a, r.dup_b) for r in queries["q_dedup_embedding_lsh"](spark, SF_DIR).collect()}
    assert lsh <= exact
    assert len(exact) > 0
    recall = len(lsh) / len(exact)
    assert recall >= 0.05, f"banded LSH recall collapsed: {recall:.3f}"


def test_lsh_buckets_deterministic_and_nondegenerate(spark, queries):
    a = queries["q_sim_lsh_buckets"](spark, SF_DIR).collect()
    b = queries["q_sim_lsh_buckets"](spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # seeded planes: stable
    counts = [r.n_vecs for r in a]
    total = sum(counts)
    assert len(counts) > 1 and max(counts) < total / 2  # no degenerate bucket


def test_kmeans_inertia_decreases(spark):
    """Lloyd's iterations must not increase total inertia: rerun the
    operator's assignment step with 1 vs KMEANS_ITERS iterations and
    compare the summed within-cluster distances."""
    import utxo_to_parquet_spark.operators.similarity as sim

    orig = sim.KMEANS_ITERS
    try:
        sim.KMEANS_ITERS = 1
        one = sum(r.inertia for r in sim.q_sim_kmeans(spark, SF_DIR).collect())
        sim.KMEANS_ITERS = 3
        three = sum(r.inertia for r in sim.q_sim_kmeans(spark, SF_DIR).collect())
    finally:
        sim.KMEANS_ITERS = orig
    assert three <= one + 1e-6, (one, three)


def test_kmeans_partitions_all_vectors(spark, queries):
    rows = queries["q_sim_kmeans"](spark, SF_DIR).collect()
    import utxo_to_parquet_spark.operators.similarity as sim

    total = sum(r.n_vecs for r in rows)
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert total == n
    assert len(rows) <= sim.KMEANS_K


def test_lr_matmul_bit_identical_to_hof_aggregate(spark):
    """The numpy scorer must reproduce the aggregate/zip_with HOF chain
    EXACTLY (not approximately): unrounded threshold predicates in the
    LSH operators compare its output against DuckDB's left-to-right
    summation, so a single ulp of drift (e.g. from np.dot's pairwise
    summation) would flip candidate membership."""
    import random

    import numpy as np
    from pyspark.sql import functions as F

    from utxo_to_parquet_spark.operators.similarity import _to_matrix, lr_matmul

    rng = random.Random(11)
    dim = 64
    vecs = [
        [rng.uniform(-1, 1) for _ in range(dim)] for _ in range(50)
    ]
    q = [rng.uniform(-1, 1) for _ in range(dim)]
    df = spark.createDataFrame(
        [(i, [float(np.float32(x)) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    plane = F.array(*[F.lit(float(x)) for x in q])
    hof = df.select(
        "vec_id",
        F.aggregate(
            F.zip_with("embedding", plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("dot"),
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("sq"),
    ).collect()
    C = _to_matrix([np.array(v, dtype=np.float32) for v in vecs])
    Q = np.array([q], dtype=np.float64)
    dots, c_sq = lr_matmul(C, Q)
    for r in hof:
        assert dots[r.vec_id, 0] == r.dot  # bitwise equality, no tolerance
        assert c_sq[r.vec_id] == r.sq


def test_cc_largestar_equals_propagation(spark):
    """Large-star/small-star must produce byte-identical component
    labels to min-label propagation — same fixpoint, different round
    complexity (O(log n) vs O(diameter))."""
    from utxo_to_parquet_spark.operators import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    a = sorted(
        (r.doc_id, r.component)
        for r in qs["q_dedup_connected_components"](spark, sf).collect()
    )
    b = sorted(
        (r.doc_id, r.component) for r in qs["q_dedup_cc_largestar"](spark, sf).collect()
    )
    assert a == b and a


def test_whitening_decorrelates_a_correlated_corpus(tmp_path, spark):
    """On a deliberately anisotropic corpus (dim1 = dim0 + small noise,
    i.e. raw covariance has a dominant off-diagonal) the whitening
    contract must still produce identity covariance — proving the
    transform really decorrelates rather than passing through."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from utxo_to_parquet_spark.operators.similarity import EMB_DIM

    rng = np.random.default_rng(5)
    x = rng.standard_normal((300, EMB_DIM))
    x[:, 1] = x[:, 0] + 0.05 * x[:, 1]  # strong correlation to undo
    raw_corr = np.corrcoef(x[:, 0], x[:, 1])[0, 1]
    assert raw_corr > 0.99  # the fixture is genuinely anisotropic
    base = pq.read_schema(f"{SF_DIR}/embeddings.parquet")
    table = pa.Table.from_pylist(
        [
            {"vec_id": i, "embedding": row.astype("float32").tolist(), "label": 0}
            for i, row in enumerate(x)
        ],
        schema=base,
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    rows = all_queries()["q_sim_whiten"](spark, str(tmp_path)).collect()
    assert len(rows) == EMB_DIM
    assert all(r.diag_unit and r.offdiag_zero for r in rows)
    assert all(r.n == 300 for r in rows)


def test_mmr_rerank_tiny_corpus_degrades_like_oracle(tmp_path, spark):
    """With fewer than MMR_K+1 vectors the greedy loop must stop when
    the candidate pool is exhausted (emitting fewer rows), exactly like
    the oracle's recursive CTE terminating early — not crash on an
    empty argmax (round-7 ADVICE: best stayed None -> TypeError)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from utxo_to_parquet_spark.operators.similarity import EMB_DIM, MMR_K

    rng = np.random.default_rng(11)
    n = MMR_K - 2  # 1 query vector + (MMR_K - 3) candidates < MMR_K
    x = rng.standard_normal((n, EMB_DIM))
    base = pq.read_schema(f"{SF_DIR}/embeddings.parquet")
    table = pa.Table.from_pylist(
        [
            {"vec_id": i, "embedding": row.astype("float32").tolist(), "label": 0}
            for i, row in enumerate(x)
        ],
        schema=base,
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    rows = all_queries()["q_sim_mmr_rerank"](spark, str(tmp_path)).collect()
    assert len(rows) == n - 1  # every candidate picked, then clean stop
    assert [r.step for r in sorted(rows, key=lambda r: r.step)] == list(
        range(1, n)
    )
    assert len({r.vec_id for r in rows}) == n - 1  # no repeats

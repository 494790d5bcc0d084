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

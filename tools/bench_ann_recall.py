"""ANN accuracy/cost artifact: recall@k vs n_probe for the IVF family.

The recall tests in tests/test_similarity.py assert a floor; this tool
records the actual curve so the trade-off is a number, not a threshold.
For each n_probe it runs q_sim_ivf_topk and q_sim_ivfpq_topk against
the brute-force ground truth (q_sim_cosine_topk) on the same fixture
and reports mean recall@TOP_K over the query set plus wall seconds
(best-of-2 — the curve, not the absolute latency, is the artifact; the
host-noise policy's best-of-3 matters for headline timings only).

Recall@k here = |approx top-k IDs ∩ exact top-k IDs| / k per query,
averaged over queries — the FAISS-convention intersection recall.

Usage: python tools/bench_ann_recall.py [sf_dir] [out_json]
Writes one JSON line (default BENCH_ann_recall.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "BENCH_ann_recall.json"


def topk_sets(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.q_id, set()).add(r.c_id)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from utxo_to_parquet_spark.operators import similarity as sim
    from utxo_to_parquet_spark.operators.registry import load
    from utxo_to_parquet_spark.session import get_spark

    spark = get_spark("bench_ann_recall")
    n_labels = (
        load(spark, SF_DIR, "embeddings").select("label").distinct().count()
    )
    print(f"{n_labels} posting lists (labels); TOP_K={sim.TOP_K}", flush=True)

    truth = topk_sets(sim.q_sim_cosine_topk(spark, SF_DIR).collect())
    n_q = len(truth)

    curves: dict[str, list[dict]] = {"ivf": [], "ivfpq": []}
    for n_probe in range(1, n_labels + 1):
        for name, fn in (("ivf", sim.q_sim_ivf_topk), ("ivfpq", sim.q_sim_ivfpq_topk)):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                rows = fn(spark, SF_DIR, n_probe=n_probe).collect()
                best = min(best, time.time() - t0)
            approx = topk_sets(rows)
            recall = sum(
                len(approx.get(q, set()) & ids) / len(ids) for q, ids in truth.items()
            ) / n_q
            point = {
                "n_probe": n_probe,
                "recall_at_k": round(recall, 4),
                "sec": round(best, 2),
            }
            curves[name].append(point)
            print(f"{name} n_probe={n_probe}: {json.dumps(point)}", flush=True)

    line = {
        "metric": "ann_recall_vs_nprobe",
        "sf_dir": SF_DIR,
        "top_k": sim.TOP_K,
        "n_queries": n_q,
        "n_labels": n_labels,
        "curves": curves,
    }
    with open(OUT, "w") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()

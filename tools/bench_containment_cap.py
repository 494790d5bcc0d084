"""DF_CAP recall/cost sweep for q_dedup_containment at the 16x corpus.

The weak-scaling probe's most expensive cell is containment at 16x
(linear, exponent 0.98 — acceptable, but nobody had swept the knob that
sets its constant). DF_CAP drops shingles present in more than CAP
documents before the pair join, so it trades join work against pairs
whose overlap lives in high-frequency shingles.

The fixture's shingle document-frequency tops out at 25 (word-salted
probe copies keep per-shingle df unchanged — 16 disjoint corpora), so
the registered DF_CAP=100 never bites here and sweeping caps >= 25 would
measure nothing. The informative sweep is caps BELOW the df
distribution: each cell records best-of-3 wall seconds, emitted pairs,
and pair overlap vs the cap-25 run (which keeps every shingle, i.e. the
uncapped result at this corpus). The pair set is NOT monotone in the
cap: a higher cap grows `common` but also the per-doc size denominators,
so both missed and extra pairs are reported per cell.

Usage: python tools/bench_containment_cap.py [out_json]
Reuses the /tmp/qscale copies built by bench_query_scale.py (same base
stamp discipline). Writes BENCH_containment_cap.json by default.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = sys.argv[1] if len(sys.argv) > 1 else "BENCH_containment_cap.json"
CAPS = [5, 10, 15, 20, 25]  # 25 = max df in the corpus: effectively uncapped
SCALE = 16


def main() -> None:
    import bench_query_scale as qscale

    from utxo_to_parquet_spark.operators.dedup import q_dedup_containment
    from utxo_to_parquet_spark.session import get_spark

    qscale.build_copies(SCALE)
    d16 = qscale.build_scale_dir(SCALE)

    spark = get_spark("bench_containment_cap")
    # warm python workers / reader once with the cheapest cap
    q_dedup_containment(spark, d16, df_cap=CAPS[0]).count()

    cells = {}
    pair_sets: dict[int, set] = {}
    for cap in CAPS:
        best = math.inf
        rows = None
        for _ in range(3):
            t0 = time.time()
            # rebuild the DataFrame per rep: re-collecting the same object
            # reuses shuffle files and reads absurdly fast (warm-timing
            # gotcha recorded in the verify notes)
            rows = q_dedup_containment(spark, d16, df_cap=cap).collect()
            best = min(best, time.time() - t0)
        pair_sets[cap] = {(r.doc_a, r.doc_b) for r in rows}
        cells[cap] = {"sec": round(best, 2), "pairs": len(rows)}
        print(f"cap={cap}: {cells[cap]}", flush=True)

    # NOT monotone in the cap: raising it adds shingles to `common` but
    # also inflates the n_a/n_b denominators (sizes count only capped
    # shingles), so a lower cap can ADD pairs whose shared shingles are
    # all low-df while their documents are full of high-df ones. Report
    # both directions against the cap-25 (= keep-everything) reference.
    ref = pair_sets[CAPS[-1]]
    for cap in CAPS:
        inter = pair_sets[cap] & ref
        cells[cap]["recall_vs_uncapped"] = (
            round(len(inter) / len(ref), 4) if ref else 1.0
        )
        cells[cap]["pairs_missed"] = len(ref - pair_sets[cap])
        cells[cap]["pairs_extra"] = len(pair_sets[cap] - ref)

    line = {
        "metric": "containment_df_cap_sweep",
        "scale": SCALE,
        "base": qscale.BASE,
        "max_df_in_corpus": 25,
        "registered_default": 100,
        "note": (
            "word-salted copies keep per-shingle df constant, so cap>=25 is "
            "uncapped at any probe scale; overlap is vs the cap-25 pair set "
            "(not monotone: the cap moves numerator and denominators)"
        ),
        "caps": {str(c): cells[c] for c in CAPS},
    }
    with open(OUT, "w") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()

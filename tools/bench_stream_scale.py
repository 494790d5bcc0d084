"""Streaming weak-scaling probe: throughput and checkpoint state size
for the streaming ops at 1x / 4x / 16x input replay.

The batch registry has BENCH_qscale.json; the streaming family had no
scale artifact (round-5 verdict gap #4). This reuses the qscale scaled
corpora (word-salted documents, time-shifted events — see
bench_query_scale's module docstring for why those growth directions
are the honest ones) and, per (op, scale):

- wall seconds for the registered callable, which drives the stream to
  completion over the static input (best-of-2: the scaling curve, not
  the absolute latency, is the artifact);
- input rows/s over the streamed side;
- on-disk checkpoint size after the run — the state the op would carry
  in production. q_stream_incremental_dedup is designed stream-side
  shuffle-free (stream-static join, no state buffering), so its
  checkpoint must stay near-constant while input grows 16x; the
  watermarked sliding window's state tracks open windows (time span),
  not row count. Superlinear state growth here would falsify the
  module's scaling claims.

Usage: python tools/bench_stream_scale.py [out_json]
Writes one JSON line (default BENCH_stream_scale.json).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_POS = [a for a in sys.argv[1:] if not a.startswith("--")]
OUT = _POS[0] if _POS else "BENCH_stream_scale.json"
# --ops a,b,c: time only the named streams and MERGE their cells into
# the existing artifact (the bench_query_scale.py --ops discipline)
OPS_FILTER: set[str] = set()
for _a in sys.argv[1:]:
    if _a.startswith("--ops="):
        OPS_FILTER = set(_a[len("--ops="):].split(","))

OPS = {
    # op -> (streamed table, streamed-row filter factor description)
    "q_stream_incremental_dedup": "documents",
    "q_stream_watermark_late_data": "events",
    "q_stream_tumbling_5min": "events",
    # round 7: per-commit mergeable sketches — their durable state is the
    # per-commit sketch table in the foreachBatch sink (KB-sized by
    # construction), the checkpoint dir here holds only source offsets
    "q_stream_hll_distinct": "events",
    "q_stream_countmin": "events",
    "q_stream_quantile_sketch": "events",
    # round 8: Misra-Gries partial summaries per commit (HH_K counters
    # per stream partition + a total sentinel), merged by per-token SUM
    "q_stream_heavy_hitters": "events",
    # round 8: cadence moment-sum monoid — per-commit summary rows are
    # bounded by |active users|, constant under time-shifted replay
    "q_stream_cadence": "events",
    # round 9: transition-count monoid — per-commit summary is
    # |users| x |type pairs| internal counts + 2 endpoint types/user
    "q_stream_markov_transition": "events",
    # round 11: NB classifier count maintenance — per-commit summary is
    # the vocab-bounded (token, class) count table; merged model must
    # stay equal to the batch trainer at every scale (the op itself
    # recomputes matches_batch, so a drift would flip out_rows' flags)
    "q_stream_nb_counts": "documents",
    # round 12: tokenizer-trainer input maintenance — per-commit summary
    # is the batch's own (word, count) table; the seed vocab re-derived
    # from the merged counts must equal the batch trainer's exactly (the
    # op recomputes matches_batch per token)
    "q_stream_unigram_counts": "documents",
    # round 13: banded sign-LSH index maintenance — per-commit state is
    # the arriving delta's own (band, bkey, vec_id) posting rows; the
    # merged index must equal the batch build bucket-for-bucket at every
    # scale (the op recomputes matches_batch per bucket)
    "q_stream_ann_delta": "embeddings",
    # round 13 wave 2: BM25 postings maintenance — per-commit state is
    # the batch's own (doc, term, tf) cells; the live top-k re-derived
    # from the merged postings must equal the batch ranking (the op
    # recomputes matches_batch per row)
    "q_stream_bm25_delta": "documents",
    # round 14: graph-ANN insert maintenance — per-commit state is the
    # arriving delta's own edge rows (GANN_INS_M per vector); the
    # streamed edge set must equal the batch application of the insert
    # rule rank-for-rank (the op recomputes matches_batch per row)
    "q_stream_gann_insert": "embeddings",
}


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            try:
                total += os.path.getsize(os.path.join(root, n))
            except OSError:
                pass
    return total


def main() -> None:
    import pyarrow.parquet as pq

    from tools.bench_query_scale import SCALES, build_copies, build_scale_dir
    from utxo_to_parquet_spark.operators import all_queries
    from utxo_to_parquet_spark.session import get_spark

    build_copies(max(SCALES))
    dirs = {k: build_scale_dir(k) for k in SCALES}

    unknown = OPS_FILTER - OPS.keys()
    if unknown:
        sys.exit(f"--ops names not in OPS: {sorted(unknown)}")
    picked = {k: v for k, v in OPS.items()
              if not OPS_FILTER or k in OPS_FILTER}

    spark = get_spark("bench_stream_scale")
    qs = all_queries()
    # warm python workers / stream machinery once
    for name in picked:
        qs[name](spark, dirs[1]).collect()

    result: dict[str, dict] = {}
    for name, table in picked.items():
        cells = {}
        for k in SCALES:
            in_rows = pq.ParquetFile(
                os.path.join(dirs[k], f"{table}.parquet")
            ).metadata.num_rows
            best, state = float("inf"), 0
            for _ in range(2):
                ckpt = tempfile.mkdtemp(prefix=f"stream_ckpt_{name}_x{k}_")
                spark.conf.set("spark.sql.streaming.checkpointLocation", ckpt)
                try:
                    t0 = time.time()
                    n_out = qs[name](spark, dirs[k]).count()
                    best = min(best, time.time() - t0)
                    state = dir_bytes(ckpt)
                finally:
                    spark.conf.unset("spark.sql.streaming.checkpointLocation")
            cells[str(k)] = {
                "sec": round(best, 2),
                "input_rows": in_rows,
                "rows_per_sec": int(in_rows / best),
                "out_rows": n_out,
                "checkpoint_bytes": state,
            }
            print(f"{name} x{k}: {json.dumps(cells[str(k)])}", flush=True)
        import math

        expo = math.log(
            max(cells["16"]["sec"], 1e-9) / max(cells["1"]["sec"], 1e-9)
        ) / math.log(16)
        result[name] = {
            "streamed_table": table,
            "cells": cells,
            "exponent": round(expo, 2),
            "state_growth_16x": round(
                cells["16"]["checkpoint_bytes"]
                / max(cells["1"]["checkpoint_bytes"], 1),
                2,
            ),
        }

    if OPS_FILTER and os.path.exists(OUT):
        with open(OUT) as f:
            line = json.loads(f.read())
        line["ops"].update(result)
    else:
        line = {
            "metric": "stream_weak_scaling",
            "scales": SCALES,
            "ops": result,
        }
    with open(OUT, "w") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()

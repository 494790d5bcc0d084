"""Kill-and-restart recovery latency for the stateful streaming family.

BENCH_stream_scale.json measures throughput and checkpoint state SIZE;
this probe measures what that state buys: after a stream is stopped
(the in-process stand-in for an executor/driver loss — Spark's restart
path from a committed checkpoint is identical for a graceful stop and a
crash, minus at most one replayed micro-batch), how long does a restart
from the checkpoint take, versus reprocessing the whole input with no
checkpoint?

Per (op, scale 1x/16x), four cells:

- initial_sec: first run over the base input (state built from zero);
- restart_noop_sec: stop, restart from the checkpoint with NO new input
  — pure recovery overhead (offset-log read + state-store reload);
- restart_delta_sec: append a ~1% delta file and restart — recovery
  plus one incremental micro-batch, the steady-state resume shape;
- full_reprocess_sec: fresh checkpoint over base+delta — what recovery
  would cost without durable state.

The scaling story to check: restart costs should track STATE size
(users / open windows — both ~constant across replay scale here), not
input size, while full reprocess grows with the corpus. The probe
drives the IDENTICAL operator plans as the registered queries via the
factored builders in streaming/windows.py (ewma_stateful,
watermark_sliding_agg, incremental_dedup_matches).

Usage: python tools/bench_stream_recovery.py [out_json]
Writes one JSON line (default BENCH_stream_recovery.json). Merges into
no other artifact. Reuses the /tmp/qscale corpora.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = sys.argv[1] if len(sys.argv) > 1 else "BENCH_stream_recovery.json"
SCALES = [1, 16]
NS = 1_000_000_000


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
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import bench_query_scale as qscale

    from pyspark.sql import functions as F

    from utxo_to_parquet_spark.operators.events import load_events
    from utxo_to_parquet_spark.session import get_spark
    from utxo_to_parquet_spark.streaming.windows import (
        _stream_partitions,
        cadence_batch_summary,
        ewma_stateful,
        incremental_dedup_matches,
        watermark_sliding_agg,
    )

    qscale.build_copies(max(SCALES))
    dirs = {k: qscale.build_scale_dir(k) for k in SCALES}
    spark = get_spark("bench_stream_recovery")

    work = tempfile.mkdtemp(prefix="stream_recovery_")

    # normalized events (ts as int64 ns) per scale: the streaming source
    # dir gets this one file as the base, plus a delta file later
    ev_base = {}
    for k in SCALES:
        p = os.path.join(work, f"events_x{k}")
        load_events(spark, dirs[k]).coalesce(1).write.mode("overwrite").parquet(p)
        part = [f for f in os.listdir(p) if f.endswith(".parquet")]
        ev_base[k] = os.path.join(p, part[0])

    def events_delta(base_file: str, dst: str) -> int:
        """~1% of base rows, ts shifted past max (advances the
        watermark, closes open windows), fresh event_ids."""
        t = pq.read_table(base_file)
        n = max(len(t) // 100, 100)
        hi = pc.max(t["ts"]).as_py()
        sl = t.slice(0, n).to_pandas()
        sl["event_id"] = sl["event_id"] + 900_000_000
        sl["ts"] = sl["ts"] - sl["ts"].min() + hi + 30 * 60 * NS
        pq.write_table(
            pa.Table.from_pandas(sl, schema=t.schema, preserve_index=False), dst
        )
        return n

    def docs_delta(src: str, dst: str) -> int:
        t = pq.read_table(src)
        n = max(len(t) // 100, 50)
        sl = t.slice(0, n).to_pandas()
        # *10 keeps doc_id % BATCH_MOD == 0 (BATCH_MOD=5, dedup.py) so
        # every delta row passes the stream-side filter, WITHOUT
        # collapsing consecutive ids onto one (a //10*10 rounding here
        # once made the delta ~90% duplicate ids — a degenerate batch)
        sl["doc_id"] = sl["doc_id"] * 10 + 900_000_000
        pq.write_table(
            pa.Table.from_pandas(sl, schema=t.schema, preserve_index=False), dst
        )
        return n

    def ev_stream(src_dir: str):
        schema = spark.read.parquet(src_dir).schema
        sdf = spark.readStream.schema(schema).parquet(src_dir)
        return sdf.withColumn(
            "event_ts", F.timestamp_seconds(F.expr(f"ts div {NS}"))
        )

    def doc_stream(src_dir: str):
        schema = spark.read.parquet(src_dir).schema
        return spark.readStream.schema(schema).parquet(src_dir)

    OPS = {
        # name -> (source kind, output mode, plan builder(sf_dir, sdf))
        "q_stream_ewma": ("events", "update", lambda d, sdf: ewma_stateful(sdf)),
        "q_stream_watermark_late_data": (
            "events",
            "append",
            lambda d, sdf: watermark_sliding_agg(sdf),
        ),
        "q_stream_incremental_dedup": (
            "documents",
            "append",
            lambda d, sdf: incremental_dedup_matches(spark, d, sdf),
        ),
        # cadence: state lives in the foreachBatch sink (mergeable
        # summary rows), so the plan is the raw stream and the batch fn
        # is the factored per-commit summary — restart recovery is the
        # offset log plus one summary aggregation per new file
        "q_stream_cadence": (
            "events",
            "append",
            lambda d, sdf: (sdf, lambda df: cadence_batch_summary(df)),
        ),
    }

    def drain(plan, mode, ckpt) -> float:
        # memory sink does NOT support checkpoint recovery; foreachBatch
        # does (it is the recoverable sink the registered
        # q_stream_foreachbatch_sink op uses), and the count() forces
        # full materialization of every micro-batch. A (plan, batch_fn)
        # pair moves the op's work INTO the sink fn (the cadence shape).
        batch_fn = None
        if isinstance(plan, tuple):
            plan, batch_fn = plan
        with _stream_partitions(spark):
            t0 = time.time()
            q = (
                plan.writeStream.outputMode(mode)
                .foreachBatch(
                    (lambda df, _e: batch_fn(df).count())
                    if batch_fn is not None
                    else (lambda df, _epoch: df.count())
                )
                .option("checkpointLocation", ckpt)
                .start()
            )
            try:
                q.processAllAvailable()
                dt = time.time() - t0
            finally:
                q.stop()
        return dt

    result: dict[str, dict] = {}
    for name, (kind, mode, build) in OPS.items():
        cells = {}
        for k in SCALES:
            src_dir = os.path.join(work, f"src_{name}_x{k}")
            os.makedirs(src_dir)
            if kind == "events":
                os.symlink(ev_base[k], os.path.join(src_dir, "base.parquet"))
            else:
                os.symlink(
                    os.path.join(dirs[k], "documents.parquet"),
                    os.path.join(src_dir, "base.parquet"),
                )
            ckpt = os.path.join(work, f"ckpt_{name}_x{k}")

            def run() -> float:
                sdf = ev_stream(src_dir) if kind == "events" else doc_stream(src_dir)
                return drain(build(dirs[k], sdf), mode, ckpt)

            initial = run()
            noop = run()  # restart, nothing new: pure recovery overhead
            delta_dst = os.path.join(src_dir, "delta.parquet")
            if kind == "events":
                delta_rows = events_delta(ev_base[k], delta_dst)
            else:
                delta_rows = docs_delta(
                    os.path.join(dirs[k], "documents.parquet"), delta_dst
                )
            with_delta = run()
            state = dir_bytes(ckpt)
            # no-checkpoint baseline: reprocess base+delta from scratch
            fresh = os.path.join(work, f"fresh_{name}_x{k}")
            shutil.rmtree(fresh, ignore_errors=True)
            full = drain(
                build(
                    dirs[k],
                    ev_stream(src_dir) if kind == "events" else doc_stream(src_dir),
                ),
                mode,
                fresh,
            )
            cells[str(k)] = {
                "initial_sec": round(initial, 2),
                "restart_noop_sec": round(noop, 2),
                "restart_delta_sec": round(with_delta, 2),
                "full_reprocess_sec": round(full, 2),
                "delta_rows": delta_rows,
                "checkpoint_bytes": state,
                "recovery_speedup_vs_reprocess": round(
                    full / max(with_delta, 1e-9), 2
                ),
            }
            print(f"{name} x{k}: {json.dumps(cells[str(k)])}", flush=True)
        noop_growth = cells["16"]["restart_noop_sec"] / max(
            cells["1"]["restart_noop_sec"], 1e-9
        )
        result[name] = {"cells": cells, "noop_restart_growth_16x": round(noop_growth, 2)}

    line = {
        "metric": "stream_recovery",
        "scales": SCALES,
        "note": (
            "in-process stop/restart; crash recovery differs only by <=1 "
            "replayed micro-batch on top of the same state reload"
        ),
        "ops": result,
    }
    with open(OUT, "w") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line), flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

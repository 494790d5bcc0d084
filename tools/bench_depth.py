"""Converter depth stress: end-to-end convert of a >=10M-row synthetic
snapshot, framing sidecar cold AND warm, with peak-RSS accounting.

The sf-scale fixtures (<1M rows) can't surface int32-offset bugs,
framing-pass scaling, or memory growth in the decode tasks; this run
validates SCALING.md's mainnet projection (best warm 5.49M rows/s at
20M-row depth => well under a minute for the 177.5M-row mainnet
snapshot on a quiet 32-core box; ~2 min under the documented
several-fold host-CPU noise) on a dump big enough to exercise
hundreds of splits.

Usage: python tools/bench_depth.py [n_rows] [out_json]
Writes one JSON line (default BENCH_depth.json) with cold/warm wall
times, rows/s, and peak RSS of the Python driver and the local-mode
JVM. Deterministic input (seeded blocks); the convert reps run
best-of-3 per the host-noise policy (several-fold CPU swings on this
box), with the framing sidecar removed before each cold rep.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "BENCH_depth.json"
BLOCK = 1_000_000


def jvm_peak_rss_mb() -> float:
    """Max VmHWM across live java child processes (local-mode executor
    memory lives in the JVM, not the Python driver)."""
    peak = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if f.read().strip() != "java":
                    continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM:"):
                        peak = max(peak, int(line.split()[1]))
        except OSError:
            continue
    return round(peak / 1024, 1)


def main():
    import tempfile

    from utxo_to_parquet_spark.session import get_spark
    from utxo_to_parquet_spark.sources import (
        convert_utxo_dump_to_parquet,
        write_utxo_dump,
    )
    from utxo_to_parquet_spark.sources.synthetic import synthetic_utxo_rows

    spark = get_spark("bench_depth")
    tmp = tempfile.mkdtemp(prefix="bench_depth_")
    dump = os.path.join(tmp, "depth.dat")

    # seeded 1M-row blocks: block boundaries break txid run-length groups,
    # which the format allows, and generation stays deterministic without
    # holding a single 10M-row generator state
    t0 = time.time()

    def rows():
        for b in range(N_ROWS // BLOCK):
            yield from synthetic_utxo_rows(BLOCK, seed=1000 + b)

    n = write_utxo_dump(dump, rows())
    gen_sec = round(time.time() - t0, 1)
    size_mb = round(os.path.getsize(dump) / 1e6, 1)
    print(f"generated {n} rows, {size_mb} MB in {gen_sec}s", flush=True)

    # warm the SESSION first (python workers, JIT, C-kernel dlopen) with a
    # small separate dump, so cold-vs-warm below isolates the framing
    # sidecar, not Spark startup costs
    wdump = os.path.join(tmp, "warmup.dat")
    write_utxo_dump(wdump, synthetic_utxo_rows(100_000, seed=9))
    convert_utxo_dump_to_parquet(
        spark, wdump, os.path.join(tmp, "warmup.parquet"), use_cache=False
    )

    # the framing pass itself, cold (no sidecar) and warm (sidecar),
    # timed directly: the convert-level cold/warm delta is dominated by
    # JVM order effects (the cold convert always runs first in a rep),
    # so the sidecar's true saving is THIS number, not that delta
    from utxo_to_parquet_spark.sources.utxo_dump import index_utxo_dump

    sidecar = dump + ".splits.json"
    if os.path.exists(sidecar):
        os.remove(sidecar)
    t0 = time.time()
    index_utxo_dump(dump)
    framing_cold = round(time.time() - t0, 3)
    t0 = time.time()
    index_utxo_dump(dump)
    framing_warm = round(time.time() - t0, 3)
    print(f"framing: cold {framing_cold}s, warm {framing_warm}s", flush=True)

    # best-of-3 per the host-noise policy (several-fold CPU swings on
    # this box); the dump is generated once, each rep removes the
    # framing sidecar before the cold convert and reuses it for the warm
    results = {"cold_sec": float("inf"), "warm_sec": float("inf")}
    for rep in range(3):
        sidecar = dump + ".splits.json"
        if os.path.exists(sidecar):
            os.remove(sidecar)
        for label in ("cold", "warm"):
            out = os.path.join(tmp, f"out_{label}.parquet")
            t0 = time.time()
            got = convert_utxo_dump_to_parquet(spark, dump, out, use_cache=True)
            wall = time.time() - t0
            assert got == n, (got, n)
            # spot-check: the output has n rows and the schema's 6 cols
            df = spark.read.parquet(out)
            assert df.count() == n
            assert len(df.columns) == 6, df.columns
            results[f"{label}_sec"] = min(results[f"{label}_sec"], round(wall, 2))
            print(f"rep{rep} {label}: {wall:.1f}s", flush=True)
    for label in ("cold", "warm"):
        results[f"{label}_rows_per_sec"] = int(n / results[f"{label}_sec"])

    line = {
        "metric": "converter_depth_stress",
        "rows": n,
        "input_mb": size_mb,
        "framing_cold_sec": framing_cold,
        "framing_warm_sec": framing_warm,
        **results,
        "py_peak_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
        ),
        "jvm_peak_rss_mb": jvm_peak_rss_mb(),
        "gen_sec": gen_sec,
    }
    with open(OUT, "w") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line), flush=True)
    spark.stop()

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

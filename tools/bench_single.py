"""Isolate and time individual registry queries (guide §1).

Times each named query exactly the way bench.py does (plan + execute +
collect) best-of-N in ONE warm session, and can additionally write the
``.explain("formatted")`` output for the plan-shape record.

Usage:
  python tools/bench_single.py NAME [NAME ...] [--reps=3] [--noop]
         [--explain-dir=plans/r14] [--suffix=before]

--noop    times df.write.format("noop") instead of collect() (guide §1.4)
--explain-dir writes <dir>/<name>_<suffix>.txt per query.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    noop = False
    explain_dir = None
    suffix = "before"
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a == "--noop":
            noop = True
        elif a.startswith("--explain-dir="):
            explain_dir = a.split("=", 1)[1]
        elif a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
    if not args:
        sys.exit(__doc__)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from utxo_to_parquet_spark.operators import all_queries
    from utxo_to_parquet_spark.session import get_spark

    spark = get_spark("bench_single")
    qs = all_queries()
    # warm the reader path once (bench.py does the same)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    for name in args:
        if name not in qs:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            with open(os.path.join(explain_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        trials: list[float] = []
        if reps == 0:
            print(f"{name}: explained", flush=True)
            continue
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_single:{name}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            trials.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: min={min(trials)} trials={trials}", flush=True)


if __name__ == "__main__":
    main()

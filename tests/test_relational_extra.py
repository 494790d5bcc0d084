"""Value-level checks for the percentile family that the registered
queries deliberately no longer perform at full-data scale:

- q_agg_approx_percentile's registered contract is the GK rank
  envelope (what the sketch actually guarantees); the exact-vs-approx
  VALUE comparison lives here, at fixture scale, where exact
  percentile's per-group buffering is harmless.
- q_agg_percentiles reimplements exact interpolated quantiles via a
  distributed distinct-value histogram; pin it to Spark's builtin
  exact percentile() at fixture scale so the reconstruction can never
  drift from the reference semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_approx_percentile_close_to_exact(spark):
    from utxo_to_parquet_spark.operators.registry import load

    li = load(spark, SF_DIR, "lineitem")
    rows = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile_approx(l_extendedprice, array(0.5, 0.95), 1000)"
        ).alias("approx"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("exact"),
    ).collect()
    assert rows
    for r in rows:
        for a, e in zip(r.approx, r.exact):
            assert abs(a - e) / e <= 0.02, (r.l_returnflag, a, e)


def test_histogram_percentiles_match_builtin_exact(spark):
    from utxo_to_parquet_spark.operators import all_queries
    from utxo_to_parquet_spark.operators.registry import load

    got = {
        r.l_returnflag: (r.p50, r.p95, r.p99, r.n)
        for r in all_queries()["q_agg_percentiles"](spark, SF_DIR).collect()
    }
    li = load(spark, SF_DIR, "lineitem")
    ref = {
        r.l_returnflag: (
            round(r.ps[0], 4),
            round(r.ps[1], 4),
            round(r.ps[2], 4),
            r.n,
        )
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.5, 0.95, 0.99))"
            ).alias("ps"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got == ref

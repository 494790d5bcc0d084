"""Scale-technique demonstrations: plan-shape assertions for the
mechanisms the 100-TB design leans on (bucketed co-located joins,
broadcast pruning, salted skew joins). These check the PLAN, not just
results — a correct answer computed through an accidental shuffle is a
failure at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-based joins so bucketing effects are visible."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    """Tables bucketed on the join key with matching bucket counts join
    WITHOUT a shuffle — the plan must contain zero Exchange operators.
    This is the co-location contract a 100-TB fact-fact join relies on."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")
    )
    try:
        joined = (
            spark.table("li_bucketed")
            .join(spark.table("ord_bucketed"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must be exchange-free (the final 1-group agg
        # still exchanges; assert no exchange BELOW the join)
        join_part = plan[plan.index("SortMergeJoin"):]
        assert "Exchange" not in join_part, join_part
        # results still correct
        got = {r["o_orderpriority"]: r["count"] for r in joined.collect()}
        expected = {
            r["o_orderpriority"]: r["count"]
            for r in li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority").count().collect()
        }
        assert got == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_broadcast_join_no_shuffle_on_fact_side(spark):
    """A dimension join must broadcast: the fact side is read and joined
    with zero Exchange operators before the aggregation."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_incremental_dedup_broadcasts_the_batch(spark):
    """q_dedup_incremental's corpus probe must be a broadcast hash join
    with the BATCH side built — the corpus band index is never shuffled
    for the probe (its only exchange is the signature aggregation). A
    regression to a shuffle join here silently turns per-increment cost
    from O(batch) into O(corpus)."""
    from utxo_to_parquet_spark.operators import all_queries

    df = all_queries()["q_dedup_incremental"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no sort-merge join anywhere in the probe pipeline
    assert "SortMergeJoin" not in plan


def test_salted_join_spreads_partitions(spark):
    """The salted join's shuffle key must include the salt: hot-key rows
    land in N_SALTS different partitions instead of one."""
    from utxo_to_parquet_spark.operators.relational import N_SALTS

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumn(
        "salt", F.pmod(F.hash("l_partkey", "l_suppkey", "l_linenumber"), F.lit(N_SALTS))
    )
    one_key = li.filter(F.col("l_orderkey") == li.select("l_orderkey").first()[0])
    n_salts = one_key.select("salt").distinct().count()
    assert n_salts >= 2  # the hot key's rows are spread across salts


def test_approx_distinct_error_bound(spark):
    """HLL++ at rsd=0.02 must land within 5% of the exact distinct count
    on every group (generous vs the configured 2% rsd). The query now
    carries the bound as its within_tol contract column — assert it holds
    on every group, and that the exact counts are sane."""
    from utxo_to_parquet_spark.operators import all_queries

    rows = all_queries()["q_agg_approx_distinct"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r.exact_parts > 0 and r.n_rows >= r.exact_parts
        assert r.within_tol, f"{r.l_returnflag}: HLL estimate outside 5% of {r.exact_parts}"


def test_join_strategy_hints_are_honored(spark, no_broadcast):
    """Strategy hints override the planner's default choice — the manual
    control used when statistics mislead at scale: SHUFFLE_HASH avoids
    the sort of a sort-merge join; MERGE forces sort-merge for
    spill-safety on huge build sides."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")

    shj = li.join(orders.hint("SHUFFLE_HASH"), F.col("l_orderkey") == F.col("o_orderkey"))
    assert "ShuffledHashJoin" in shj._jdf.queryExecution().executedPlan().toString()

    smj = li.join(orders.hint("MERGE"), F.col("l_orderkey") == F.col("o_orderkey"))
    assert "SortMergeJoin" in smj._jdf.queryExecution().executedPlan().toString()


def test_stratified_sample_proportions(spark):
    """sampleBy at 0.5 per stratum must land within a generous Bernoulli
    tolerance of half of each language's documents, and the registered
    contract query must report every stratum within its (wider)
    tolerance."""
    from utxo_to_parquet_spark.operators import all_queries
    from utxo_to_parquet_spark.operators.registry import load
    from utxo_to_parquet_spark.operators.text import SAMPLE_FRAC

    sf = "/root/testdata/sf0.01"
    docs = load(spark, sf, "documents")
    fractions = {l: SAMPLE_FRAC for l in ("en", "es", "de", "fr", "zh")}
    sampled = {
        r.lang: r.n
        for r in docs.sampleBy("lang", fractions, seed=42)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    for lang, n in totals.items():
        frac = sampled.get(lang, 0) / n
        assert 0.3 < frac < 0.7, (lang, frac)
    contract = all_queries()["q_sample_stratified"](spark, sf).collect()
    assert contract and all(r.within_tol for r in contract), contract


def test_compaction_reduces_file_count_preserving_data(spark, tmp_path):
    """Small-file compaction: a 64-way fragmented write collapses to the
    size-targeted file count with identical row content, and the
    sort_within variant restores clustering inside each output file."""
    from utxo_to_parquet_spark.sources.maintenance import (
        compact_parquet,
        parquet_dir_stats,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    frag = str(tmp_path / "fragmented")
    li.repartition(64).write.parquet(frag)
    _, n_frag = parquet_dir_stats(spark, frag)
    assert n_frag >= 64

    out = str(tmp_path / "compacted")
    stats = compact_parquet(
        spark, frag, out, target_file_bytes=1 << 40, sort_within=["l_orderkey"]
    )
    assert stats["out_files"] == 1
    assert stats["in_files"] == n_frag

    a = spark.read.parquet(out)
    assert a.count() == li.count()
    # within-file clustering: each partition's l_orderkey is sorted
    import pandas as pd

    pdf = a.select("l_orderkey").toPandas()
    assert (pdf["l_orderkey"].diff().dropna() >= 0).all()


def test_runtime_bloom_filter_injected(spark):
    """With broadcast disabled (the 100 TB case: dim too big to
    broadcast but selective after its filter), Catalyst injects a
    bloom_filter_agg on the build side and a might_contain probe on the
    fact scan — semi-join reduction without a custom operator. The
    creation/application thresholds are size-based; production configs
    raise them the same way for large selective dims."""
    from pyspark.sql import functions as F

    old = {
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "50MB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        pa = spark.read.parquet(f"{SF_DIR}/part.parquet").filter(F.col("p_size") == 1)
        j = li.join(pa, li.l_partkey == pa.p_partkey).groupBy("p_type").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, "runtime bloom filter not injected"
        assert "might_contain" in plan, "probe-side bloom predicate missing"
        j.collect()  # still executes correctly with the filter in place
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold",
            old["spark.sql.autoBroadcastJoinThreshold"],
        )
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_explicit_bloom_prune_contract(spark):
    """The DataFrame-native bloom filter (q_join_bloom_prune's
    bloom_build/bloom_probe) honors the bloom contract: NO false
    negatives (every truly-matching fact row survives the probe) and a
    false-positive count within the analytic bound for m/k/n — so the
    exact join downstream sees a superset of the matches that is at
    most fpr*|fact| rows bigger. Also pins the plan shape: the probe is
    a Filter fed by a 1-row BroadcastNestedLoopJoin, not a shuffle."""
    import math

    from utxo_to_parquet_spark.operators.relational import (
        BLOOM_BITS,
        BLOOM_HASHES,
        bloom_build,
        bloom_probe,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    dim = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    pruned = bloom_probe(li, "l_orderkey", bloom_build(dim, "o_orderkey"))
    exact = li.join(dim, li.l_orderkey == dim.o_orderkey, "semi")
    n_fact = li.count()
    n_exact = exact.count()
    n_pruned = pruned.count()
    # no false negatives: pruned ⊇ exact (anti-join of exact vs pruned empty)
    assert exact.exceptAll(pruned).count() == 0
    # false positives bounded: fpr = (1 - e^(-k*n/m))^k with 3x slack
    n_keys = dim.count()
    fpr = (1.0 - math.exp(-BLOOM_HASHES * n_keys / BLOOM_BITS)) ** BLOOM_HASHES
    assert n_pruned - n_exact <= max(3, 3 * fpr * n_fact), (
        f"{n_pruned - n_exact} false positives vs bound {3 * fpr * n_fact:.2f}"
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # 1-row sketch attach
    assert "element_at" in plan  # the bit-test probe filter
    # the only hash exchange allowed is the build side's bounded
    # groupBy(word) (≤2048 groups); the fact side must reach the probe
    # filter shuffle-free
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "word#" in line, f"fact-side shuffle in probe plan: {line}"


def test_simhash_pairs_plan_has_no_cross_join(spark):
    """The hamming-ball pair join must be banded equi-join candidates +
    exact verify — NEVER a cartesian/nested-loop product. A plan that
    degrades to all-pairs is the failure mode this operator exists to
    avoid at 100 TB."""
    from utxo_to_parquet_spark.operators import all_queries

    df = all_queries()["q_dedup_simhash_pairs"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # candidates come from a hash join on the band key
    assert "hashJoin" in plan.replace("HashJoin", "hashJoin") or "SortMergeJoin" in plan


def test_simhash_pairs_match_all_pairs_reference(spark):
    """Banding must find EXACTLY the hamming<=k pairs the brute-force
    all-pairs scan finds (pigeonhole guarantees recall=1, the verify
    step guarantees precision=1)."""
    from utxo_to_parquet_spark.operators import all_queries
    from utxo_to_parquet_spark.operators.dedup import HAMMING_MAX, _simhash_df

    got = {
        (r.doc_a, r.doc_b)
        for r in all_queries()["q_dedup_simhash_pairs"](spark, SF_DIR).collect()
    }
    fps = {r.doc_id: r.simhash for r in _simhash_df(spark, SF_DIR).collect()}
    ids = sorted(fps)
    expected = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= HAMMING_MAX
    }
    assert got == expected


def test_source_cap_single_shuffle_no_global_sort(spark):
    """The per-source cap must cost ONE hash-partition exchange (the
    window's partition key) and no range/global sort."""
    from utxo_to_parquet_spark.operators import all_queries

    df = all_queries()["q_text_source_cap"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_plan_audit_core_families_clean(spark):
    """The plan auditor (tools/plan_audit.py) must find no scale smells
    in the core relational/window/dedup-banding families. The full sweep
    runs as a tool; this is the fast regression slice."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.plan_audit import audit

    findings = audit(
        spark,
        SF_DIR,
        ["q_join_", "q_agg_", "q_window_", "q_dedup_simhash", "q_text_source_cap"],
    )
    assert findings == {}, findings


def test_dynamic_partition_pruning(spark, tmp_path):
    """Dynamic partition pruning: a fact table partitioned on a join key
    joined to a FILTERED dim must scan only the partitions the dim's
    rows select — at runtime, via a reused subquery, without the filter
    appearing on the fact side of the query. The 100-TB effect is
    skipping whole partition directories of a fact scan."""
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        fact_dir = str(tmp_path / "fact_by_flag")
        li.write.partitionBy("l_returnflag").parquet(fact_dir)
        fact = spark.read.parquet(fact_dir)
        dim_dir = str(tmp_path / "dim_flags")
        spark.createDataFrame(
            [("A", "keep"), ("N", "drop"), ("R", "drop")],
            "flag string, verdict string",
        ).write.parquet(dim_dir)
        # the dim must be the BROADCAST side with a selective filter —
        # DPP reuses that broadcast result as a runtime partition filter
        # on the fact scan
        dim = F.broadcast(
            spark.read.parquet(dim_dir).filter(F.col("verdict") == "keep")
        )
        joined = fact.join(dim, fact.l_returnflag == dim.flag).groupBy("flag").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        rows = {r.flag: r["count"] for r in joined.collect()}
        expected = li.filter(F.col("l_returnflag") == "A").count()
        assert rows == {"A": expected}
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )


def test_ks_drift_window_input_is_aggregate(spark):
    """q_events_ks_drift's cumulative-CDF window must run over the
    groupBy(value) AGGREGATE, never the raw event rows — the window is
    single-task in Spark, so its input must be |distinct values|, not
    |events|. Assert the plan below the Window hits a HashAggregate
    before it reaches the parquet scan."""
    from utxo_to_parquet_spark.operators import all_queries

    df = all_queries()["q_events_ks_drift"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    widx = next(
        i for i, line in enumerate(lines) if "Window " in line
    )
    below = lines[widx + 1 :]
    agg_idx = next(
        i for i, line in enumerate(below) if "HashAggregate" in line
    )
    scan_idx = next(
        i
        for i, line in enumerate(below)
        if "Scan" in line and "parquet" in line.lower()
    )
    assert agg_idx < scan_idx, (
        "KS window consumes the raw scan, not the per-value aggregate:\n"
        + plan[:2000]
    )


def test_allowlisted_single_partition_windows_fed_by_aggregates(spark):
    """Every ALLOWED_SINGLE_PARTITION_WINDOW entry justifies itself by
    claiming the one-task window's input is an upstream AGGREGATE over
    a bounded domain. Make the prose executable: for each allowlisted
    query, every SinglePartition-fed window must reach an aggregate
    operator below its exchange BEFORE any scan — and at least one such
    window must exist (else the allowlist entry is stale)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.plan_audit import (
        _AGGREGATE_OPS,
        ALLOWED_SINGLE_PARTITION_WINDOW,
        single_partition_window_inputs,
    )
    from utxo_to_parquet_spark.operators import all_queries

    qs = all_queries()
    for name in ALLOWED_SINGLE_PARTITION_WINDOW:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        chains = single_partition_window_inputs(plan)
        assert chains, (
            f"{name}: allowlisted but no SinglePartition-fed window in "
            f"its plan — stale allowlist entry"
        )
        for ops in chains:
            agg = next(
                (i for i, o in enumerate(ops) if o in _AGGREGATE_OPS), None
            )
            scan = next(
                (i for i, o in enumerate(ops) if "Scan" in o), len(ops)
            )
            assert agg is not None and agg < scan, (
                f"{name}: one-task window fed by a non-aggregate "
                f"(chain below exchange: {ops})"
            )


def test_single_partition_window_detector(spark):
    """The plan auditor's unpartitioned-window smell must fire on a
    Window fed by Exchange SinglePartition and stay quiet on a properly
    partitioned window."""
    import sys

    from pyspark.sql import Window as W

    sys.path.insert(0, "/root/repo")
    from tools.plan_audit import single_partition_windows

    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    bad = df.withColumn(
        "c",
        F.sum("v").over(
            W.orderBy("id").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    good = df.withColumn(
        "c", F.sum("v").over(W.partitionBy("v").orderBy("id"))
    )
    assert single_partition_windows(
        bad._jdf.queryExecution().executedPlan().toString()
    )
    assert not single_partition_windows(
        good._jdf.queryExecution().executedPlan().toString()
    )


def test_bfs_expands_frontier_not_settled_set(spark):
    """q_graph_bfs's per-hop job must keep the frontier-delta shape:
    new nodes come from a LeftAnti join of the expansion against the
    settled set, and no pass re-aggregates the full distance table (the
    dense form's min-groupBy over dist). A regression to dense
    expansion turns each hop's shuffle from O(wavefront) into
    O(reachable set). The returned DataFrame's own plan is lineage-
    truncated by the per-pass localCheckpoints, so the gate runs on the
    step function q_graph_bfs actually loops over."""
    from utxo_to_parquet_spark.operators.graph import (
        _bfs_frontier_step,
        _trade_edges,
    )

    edges = _trade_edges(spark, SF_DIR)
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    frontier = (
        cust.filter(F.col("c_nationkey") == 0)
        .select(F.col("c_custkey").cast("long").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
    )
    step = _bfs_frontier_step(edges, frontier, frontier, 1)
    assert step.count() > 0  # the hop discovers suppliers
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan  # the settled-set subtraction
    # the dense form's signature: a min(dist) aggregation over the
    # unioned distance table. The delta form needs no min at all.
    assert "min(dist" not in plan and "partial_min" not in plan


def test_hll_sketch_survives_parquet_round_trip(spark, tmp_path):
    """The silver-table claim behind q_agg_hll_union: an HLL sketch
    written to parquet as a binary column and read back unions to the
    same estimate as the never-persisted sketch — so distinct-count
    rollups really can run from stored sketches without raw data."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    silver = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    direct = {
        r.l_returnflag: r.est
        for r in silver.groupBy("l_returnflag")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    path = str(tmp_path / "silver")
    silver.write.parquet(path)
    stored = {
        r.l_returnflag: r.est
        for r in spark.read.parquet(path)
        .groupBy("l_returnflag")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    assert stored == direct


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's automatic skew handling — the runtime complement to the
    manual salting op (q_join_salted_skew): with 90% of fact rows on one
    key, the executed plan must show SortMergeJoin(skew=true) fed by an
    AQEShuffleRead that split the hot partition, and the result must
    equal the non-adaptive join. This is the default path for skews AQE
    CAN detect; the salting op remains for those it can't."""
    keep = {
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
    }
    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    }
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        li = spark.range(0, 400_000).select(
            F.when(F.rand(7) < 0.9, F.lit(1))
            .otherwise((F.col("id") % 1000) + 2)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(0, 1002).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = li.join(dim, "k").groupBy().agg(
            F.sum("v").alias("sv"), F.sum("w").alias("sw")
        )
        got = j.collect()[0]
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan[:1500]
        assert "skewed" in plan, "AQEShuffleRead did not split the hot partition"
    finally:
        for k in tuned:
            if k in keep:
                spark.conf.set(k, keep[k])
            else:
                spark.conf.unset(k)
    # correctness unchanged vs the non-tuned plan
    li2 = spark.range(0, 400_000).select(
        F.when(F.rand(7) < 0.9, F.lit(1))
        .otherwise((F.col("id") % 1000) + 2)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim2 = spark.range(0, 1002).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    ref = (
        li2.join(dim2, "k")
        .groupBy()
        .agg(F.sum("v").alias("sv"), F.sum("w").alias("sw"))
        .collect()[0]
    )
    assert (got.sv, got.sw) == (ref.sv, ref.sw)

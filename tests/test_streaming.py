"""Durability semantics of the streaming path: checkpointed file-sink
queries resume exactly-once across restarts — the property a production
deployment of streaming/windows.py relies on (memory-sink demos there
trade durability for oracle-checkability).
"""

from __future__ import annotations

import os


def _write_events(spark, path: str, ids: range) -> None:
    spark.createDataFrame(
        [(i, float(i)) for i in ids], "event_id long, value double"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_checkpointed_file_sink_resumes_exactly_once(tmp_path, spark):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    _write_events(spark, f"{in_dir}/batch_a", range(0, 100))

    def run_once():
        sdf = spark.readStream.schema("event_id long, value double").option(
            "latestFirst", "false"
        ).parquet(f"{in_dir}/*")
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    first = spark.read.parquet(out_dir)
    assert first.count() == 100

    # new data lands while the query is down; restart from the checkpoint
    _write_events(spark, f"{in_dir}/batch_b", range(100, 150))
    run_once()
    final = spark.read.parquet(out_dir)
    assert final.count() == 150  # batch_a NOT reprocessed (exactly-once)
    got = sorted(r.event_id for r in final.collect())
    assert got == list(range(150))


def test_state_store_reader_exposes_checkpoint_state(tmp_path, spark):
    """Spark 4's statestore data source reads a query's checkpointed
    state as a DataFrame — the observability path for debugging stateful
    streams (state-size audits, key-skew checks) without instrumenting
    the query. The state of a complete-mode sum must equal the batch
    aggregation of the same input."""
    from pyspark.sql import functions as F

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    spark.createDataFrame(
        [(i % 5, float(i)) for i in range(100)], "k int, v double"
    ).coalesce(1).write.parquet(f"{in_dir}/b0")

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        sdf = spark.readStream.schema("k int, v double").parquet(f"{in_dir}/*")
        q = (
            sdf.groupBy("k").agg(F.sum("v").alias("total"))
            .writeStream.outputMode("complete").format("memory")
            .queryName("sr_test").option("checkpointLocation", ckpt).start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    state = spark.read.format("statestore").load(ckpt)
    got = {r["key"]["k"]: r["value"]["sum"] for r in state.collect()}
    expected = {
        r["k"]: r["total"]
        for r in spark.read.parquet(f"{in_dir}/b0")
        .groupBy("k").agg(F.sum("v").alias("total")).collect()
    }
    assert got == expected


def test_stream_incremental_dedup_matches_batch_probe(spark):
    """The streaming admission query's corpus-probe verdicts must equal
    the batch q_dedup_incremental's corpus half on the same fixture —
    the per-row HOF MinHash path and the batch explode+groupBy path must
    produce identical band keys."""
    from utxo_to_parquet_spark.operators import all_queries

    sf = "/root/testdata/sf0.001"
    qs = all_queries()
    stream = {
        r.doc_id: (r.n_corpus_matches, r.kept)
        for r in qs["q_stream_incremental_dedup"](spark, sf).collect()
    }
    batch = {
        r.doc_id: (r.n_corpus_matches, r.n_corpus_matches == 0)
        for r in qs["q_dedup_incremental"](spark, sf).collect()
    }
    assert stream == batch


def test_stream_ewma_matches_batch_across_real_microbatches(spark):
    """The streaming EWMA must equal the batch recurrence bit-for-bit
    AND must have earned that equality across multiple micro-batch
    commits — a single-batch replay would make the order-sensitivity
    claim vacuous."""
    import os

    from utxo_to_parquet_spark.operators import all_queries
    from utxo_to_parquet_spark.streaming.windows import (
        _ORDERED_STREAM_DIRS,
        q_stream_ewma,
    )

    sf = "/root/testdata/sf0.001"
    qs = all_queries()
    stream_rows = {r.user_id: (r.n_events, r.ewma) for r in qs["q_stream_ewma"](spark, sf).collect()}
    batch_rows = {r.user_id: (r.n_events, r.ewma) for r in qs["q_events_ewma"](spark, sf).collect()}
    assert stream_rows == batch_rows
    replay_dir = _ORDERED_STREAM_DIRS[f"{sf}/events.parquet"]
    n_files = len([f for f in os.listdir(replay_dir) if f.endswith(".parquet")])
    assert n_files >= 2, "replay collapsed to one micro-batch"


def test_stream_cadence_equals_batch_twin_and_crosses_commits(spark):
    """The streamed fold over per-commit summaries must reproduce the
    batch operator's (n_gaps, sum, cv^2) EXACTLY for every user — the
    monoid merge is lossless, not approximate — and the replay must
    genuinely cross multiple commits."""
    from utxo_to_parquet_spark.operators import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    stream = {r.user_id: r for r in qs["q_stream_cadence"](spark, sf).collect()}
    batch = {r.user_id: r for r in qs["q_events_bot_regularity"](spark, sf).collect()}
    assert set(stream) == set(batch) and stream
    for uid, b in batch.items():
        s = stream[uid]
        assert (s.n_gaps, s.sum_gap_min, s.cv2_e6) == (
            b.n_gaps, b.sum_gap_min, b.cv2_e6), uid
        assert s.multi_commit


def test_stream_nb_counts_matches_batch(spark):
    """The streaming classifier refresh must reproduce the batch
    trainer exactly across >= 2 real commits: counts AND snapped
    log-odds, token for token (full-outer join inside the op, so a
    token seen by only one side would surface as matches_batch=False
    or NULL)."""
    from utxo_to_parquet_spark.streaming.windows import q_stream_nb_counts

    rows = q_stream_nb_counts(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 10
    assert all(r.multi_commit for r in rows)
    assert all(r.matches_batch for r in rows)

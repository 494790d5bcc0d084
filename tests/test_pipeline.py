"""The fused training-prep pipeline must not drift from the standalone
operators it claims to fuse (operators/pipeline.py).

The composed path here is built independently of the fused plan's
shapes: the dedup stage uses the groupBy + join-back formulation (the
fused query uses a single window), and the language gate reuses the
REGISTERED q_text_language_id output — so a semantic drift in either
formulation, or in any shared constant (MIN_WORDS, SOURCE_CAP,
TRAIN_HEX), breaks the equality.
"""

from pyspark.sql import Window as W
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_fused_pipeline_equals_composed_stages(spark):
    from utxo_to_parquet_spark.operators import all_queries
    from utxo_to_parquet_spark.operators.pipeline import MIN_WORDS, TRAIN_HEX
    from utxo_to_parquet_spark.operators.registry import load
    from utxo_to_parquet_spark.operators.text import SOURCE_CAP

    qs = all_queries()
    docs = load(spark, SF_DIR, "documents")

    # stage 1 — exact dedup, groupBy + join-back formulation (the fused
    # query keeps the min-doc_id row with a window; same semantics)
    kept = (
        docs.groupBy(F.md5(F.lower(F.col("text"))).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    text = F.col("text")
    n_words = (
        F.length(text) - F.length(F.regexp_replace(text, " ", "")) + 1
    ).cast("long")
    survivors = docs.join(kept, "doc_id").select(
        "doc_id", "source", "lang", n_words.alias("n_words")
    )

    # stage 2 — quality floor
    survivors = survivors.filter(F.col("n_words") >= MIN_WORDS)

    # stage 3 — language gate via the REGISTERED language-id query
    lang_pred = qs["q_text_language_id"](spark, SF_DIR)
    lang_ok = (
        survivors.join(lang_pred, "doc_id")
        .filter(F.col("lang_predicted") == F.col("lang"))
        .select("doc_id", "source", "n_words")
    )

    # stage 4 — per-source cap (q_text_source_cap's ranking, applied to
    # the pipeline's filtered survivor set)
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    capped = (
        lang_ok.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SOURCE_CAP)
        .drop("rn")
    )

    # stage 5 — deterministic split + manifest
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
            *list(TRAIN_HEX)
        ),
        "train",
    ).otherwise("test")
    composed = capped.groupBy("source", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
    )

    fused = qs["q_pipeline_training_prep"](spark, SF_DIR)
    composed_rows = sorted(tuple(r) for r in composed.collect())
    fused_rows = sorted(tuple(r) for r in fused.collect())
    assert composed_rows == fused_rows, (
        f"fused pipeline drifted from its composed stages:\n"
        f"composed-only: {set(composed_rows) - set(fused_rows)}\n"
        f"fused-only: {set(fused_rows) - set(composed_rows)}"
    )
    assert len(fused_rows) > 0

"""Event-stream analytics over the ``events`` fixture (batch semantics;
the Structured Streaming variants live in ``streaming/``).

The events parquet has stored ``ts`` as TIMESTAMP(NANOS) in some fixture
generations and TIMESTAMP(MICROS) in others (the builder's pandas/pyarrow
default drifted ns→us between rounds). ``load_events`` handles both: the
nanos path reads raw longs via the ``nanosAsLong`` legacy conf; the
micros/millis path arrives as TIMESTAMP(_NTZ) and is converted with
``unix_micros`` under the UTC session zone. Either way the column is
normalized to a **nanosecond-epoch LONG** so all epoch math downstream is
*integer* division — nanosecond epochs exceed 2^53, so a double
round-trip would corrupt them.

Timestamps never leave a query as raw TIMESTAMP — they are projected as
epoch-second BIGINTs so Spark/DuckDB client-layer timezone handling can't
skew the value hash.
"""

from __future__ import annotations

import math

from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .registry import register

NS = 1_000_000_000


def normalize_ts_ns(df, col: str = "ts"):
    """Return ``df`` with ``col`` as nanosecond-epoch LONG regardless of
    the parquet physical type it was read as:

    - TIMESTAMP(NANOS) + ``nanosAsLong`` conf → already a long, no-op;
    - TIMESTAMP(MICROS/MILLIS) → TimestampType/TimestampNTZType; the
      session zone is UTC (session.py) so the NTZ→TZ cast is
      epoch-preserving and ``unix_micros`` is exact integer micros.
    """
    if isinstance(df.schema[col].dataType, LongType):
        return df
    return df.withColumn(
        col, F.unix_micros(F.col(col).cast("timestamp")) * F.lit(1000)
    )


def load_events(spark, sf_dir):
    """events with ``ts`` as raw nanosecond epoch (long) and ``ts_sec``
    as floored epoch seconds."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = normalize_ts_ns(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return ev.withColumn("ts_sec", F.expr(f"ts div {NS}"))


@register(
    "q_events_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_events_json_extract(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q_events_tumbling_5min",
    oracle="""
    SELECT CAST(FLOOR(EPOCH(ts) / 300) * 300 AS BIGINT) AS bucket_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_tumbling_5min(spark, sf_dir):
    """Batch tumbling window: 5-minute buckets as epoch seconds. The
    streaming twin (streaming/windows.py) computes the same result with
    readStream + window()."""
    ev = load_events(spark, sf_dir)
    bucket = (F.floor(F.col("ts_sec") / 300) * 300).cast("long")
    return ev.groupBy(bucket.alias("bucket_start"), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "q_events_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN FLOOR(EPOCH(ts)) - FLOOR(EPOCH(LAG(ts) OVER w)) > 1800
                       OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM gaps GROUP BY user_id
    """,
)
def q_events_sessionize(spark, sf_dir):
    """Sessionization: a >30-min silence starts a new session. Classic
    lag + flag-sum pattern; partitioned by user so it scales (the shuffle
    key is user_id, no global window)."""
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_sec = F.lag("ts_sec").over(w)
    new_session = F.when(
        prev_sec.isNull() | ((F.col("ts_sec") - prev_sec) > 1800), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "q_events_asof_join",
    oracle="""
    SELECT s.event_id,
           CAST(FLOOR(EPOCH(e.ts)) AS BIGINT) AS last_error_epoch
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'signup') s
    ASOF LEFT JOIN (SELECT ts FROM events WHERE event_type = 'error') e
      ON s.ts >= e.ts
    """,
)
def q_events_asof_join(spark, sf_dir):
    """As-of join (Spark has no native one — SURVEY §2.3): for each signup,
    the most recent error at-or-before it, on ONE global timeline (the
    keyless special case — the keyed shape is q_events_asof_join_keyed).
    DuckDB's native ASOF JOIN is the oracle; comparison runs at full
    nanosecond resolution.

    Scale shape: a naive union + unpartitioned last-over-window funnels
    every row through one task. Instead the timeline is TIME-BUCKETED
    with carried boundary state: (1) per-bucket max error time via a
    plain groupBy; (2) a running max over the small distinct-bucket
    relation gives each bucket its carry-in (the most recent error in
    any EARLIER bucket); (3) a window PARTITIONED BY bucket resolves
    errors within the signup's own bucket; (4) coalesce(within-bucket,
    carry-in) — an in-bucket error is always more recent than the carry.
    Only step (2) is single-task, and its input is |buckets|, not rows.
    """
    ev = load_events(spark, sf_dir)
    bucket_w = 3600  # seconds per timeline bucket
    bucket = F.floor(F.col("ts_sec") / bucket_w).cast("long")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id",
        "ts",
        bucket.alias("bucket"),
        F.lit(None).cast("long").alias("err_sec"),
        F.lit(1).alias("kind"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.lit(None).cast("long").alias("event_id"),
        "ts",
        bucket.alias("bucket"),
        F.col("ts_sec").alias("err_sec"),
        F.lit(0).alias("kind"),
    )
    # carry-in per bucket: max error ts_sec over all strictly-earlier
    # buckets (ts_sec is monotone in ts, so max ts_sec IS the last error)
    err_bucket = errors.groupBy("bucket").agg(F.max("err_sec").alias("bmax"))
    buckets = (
        signups.select("bucket")
        .union(errors.select("bucket"))
        .distinct()
        .join(err_bucket, "bucket", "left")
    )
    wb = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    carry = buckets.select(
        "bucket", F.max("bmax").over(wb).alias("carry_sec")
    )
    # kind=0 (error) sorts before kind=1 (signup) at equal ts → ties count
    # as "at-or-before", matching the oracle's >=
    win = W.partitionBy("bucket").orderBy("ts", "kind").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    merged = signups.unionByName(errors).withColumn(
        "within_sec", F.last("err_sec", ignorenulls=True).over(win)
    )
    return (
        merged.filter(F.col("kind") == 1)
        .join(F.broadcast(carry), "bucket", "left")
        .select(
            "event_id",
            F.coalesce("within_sec", "carry_sec").alias("last_error_epoch"),
        )
    )


@register(
    "q_events_asof_join_keyed",
    oracle="""
    SELECT s.event_id,
           CAST(FLOOR(EPOCH(e.ts)) AS BIGINT) AS last_error_epoch
    FROM (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'signup') s
    ASOF LEFT JOIN (SELECT user_id, ts FROM events
                    WHERE event_type = 'error') e
      ON s.user_id = e.user_id AND s.ts >= e.ts
    """,
)
def q_events_asof_join_keyed(spark, sf_dir):
    """KEYED as-of join — the shape that dominates in practice (per
    user / symbol / device): for each signup, that same user's most
    recent error at-or-before it. The union + last-non-null window now
    carries ``partitionBy(user_id)``, so the work distributes across the
    key domain with one hash shuffle and no single-task stage — this is
    the registered default for as-of semantics at scale; the keyless
    q_events_asof_join is the single-timeline special case. Oracle is
    DuckDB's native ASOF JOIN with the key equality in the ON clause.
    """
    ev = load_events(spark, sf_dir)
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "event_id",
        "ts",
        F.lit(None).cast("long").alias("err_sec"),
        F.lit(1).alias("kind"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.lit(None).cast("long").alias("event_id"),
        "ts",
        F.col("ts_sec").alias("err_sec"),
        F.lit(0).alias("kind"),
    )
    # kind=0 (error) before kind=1 (signup) at equal ts → ties are
    # "at-or-before", matching the oracle's >=
    w = W.partitionBy("user_id").orderBy("ts", "kind").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    merged = signups.unionByName(errors).withColumn(
        "last_error_epoch", F.last("err_sec", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("kind") == 1).select("event_id", "last_error_epoch")


@register(
    "q_events_daily_active_users",
    oracle="""
    SELECT CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day_no,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY 1
    """,
)
def q_events_daily_active_users(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    day = F.floor(F.col("ts_sec") / 86400).cast("long")
    return ev.groupBy(day.alias("day_no")).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "q_events_sliding_window",
    oracle="""
    WITH contrib AS (
      SELECT CAST(FLOOR(EPOCH(ts) / 300) * 300 - w.ofs AS BIGINT) AS window_start,
             event_type, value
      FROM events, (SELECT UNNEST([0, 300]) AS ofs) w
    )
    SELECT window_start, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM contrib
    GROUP BY 1, 2
    """,
)
def q_events_sliding_window(spark, sf_dir):
    """Batch sliding window (10-minute windows, 5-minute slide): every
    event contributes to window_length/slide = 2 windows, generated
    map-side with an explode — rows fan out BEFORE the aggregation
    shuffle, so the plan stays one partial-agg + one exchange, the same
    shape window(ts, '10 minutes', '5 minutes') produces in streaming."""
    ev = load_events(spark, sf_dir)
    aligned = (F.floor(F.col("ts_sec") / 300) * 300).cast("long")
    return (
        ev.select(
            F.explode(F.array(aligned, aligned - 300)).alias("window_start"),
            "event_type",
            "value",
        )
        .groupBy("window_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "q_events_topk_pandas",
    oracle="""
    SELECT event_type, event_id, ROUND(value, 2) AS value,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def q_events_topk_pandas(spark, sf_dir):
    """Grouped-map applyInPandas: per event type, the top 3 events by
    value (deterministic event_id tie-break), computed inside an
    Arrow-batched pandas function — the custom-per-group-logic escape
    hatch when window functions can't express the computation (here they
    can, which is exactly what the oracle exploits to check the UDF
    path bit-for-bit: sorting compares floats, it never does arithmetic
    on them). Each group is one Arrow batch; the shuffle is the same
    hash-on-key exchange a groupBy takes.
    """
    import pandas as pd

    ev = load_events(spark, sf_dir).select("event_type", "event_id", "value")

    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(
            ["value", "event_id"], ascending=[False, True]
        ).head(3).copy()
        out["rn"] = range(1, len(out) + 1)
        out["value"] = out["value"].round(2)
        return out

    return ev.groupBy("event_type").applyInPandas(
        topk, "event_type string, event_id long, value double, rn long"
    )


@register(
    "q_events_funnel",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t
          FROM events e JOIN v ON e.user_id = v.user_id
           AND e.ts > v.t AND e.ts <= v.t + INTERVAL 24 HOUR
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t
          FROM events e JOIN c ON e.user_id = c.user_id
           AND e.ts > c.t AND e.ts <= c.t + INTERVAL 24 HOUR
          WHERE e.event_type = 'purchase' GROUP BY e.user_id),
    stages AS (
      SELECT v.user_id,
             CASE WHEN p.user_id IS NOT NULL THEN 3
                  WHEN c.user_id IS NOT NULL THEN 2
                  ELSE 1 END AS stage
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id
    )
    SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM stages GROUP BY stage
    """,
)
def q_events_funnel(spark, sf_dir):
    """Ordered funnel with a 24-hour conversion window per step: users
    who viewed, then clicked within a day of the first view, then
    purchased within a day of that click — sequence matching via
    per-stage min-timestamp aggregates chained with inequality joins
    (each stage's input shrinks, so the chain narrows; every join is on
    user_id and shuffles once per stage). Timestamps compare exactly, so
    the funnel membership is engine-deterministic.
    """
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    day_ns = 24 * 3600 * NS
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("vt")) & (F.col("ts") <= F.col("vt") + day_ns))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("ct")) & (F.col("ts") <= F.col("ct") + day_ns))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    stages = (
        v.join(c.select("user_id", F.lit(True).alias("clicked")), "user_id", "left")
        .join(p.select("user_id", F.lit(True).alias("purchased")), "user_id", "left")
        .select(
            F.when(F.col("purchased"), 3).when(F.col("clicked"), 2).otherwise(1).alias("stage")
        )
    )
    return stages.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "q_events_retention",
    oracle="""
    WITH weekly AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(EPOCH(ts) / 604800) AS BIGINT) AS week
      FROM events
    ),
    first_week AS (SELECT MIN(week) AS w0 FROM weekly),
    cohort AS (SELECT DISTINCT user_id FROM weekly, first_week WHERE week = w0)
    SELECT w.week,
           CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_retained,
           CAST((SELECT COUNT(*) FROM cohort) AS BIGINT) AS cohort_size
    FROM weekly w JOIN cohort c ON w.user_id = c.user_id
    GROUP BY w.week
    """,
)
def q_events_retention(spark, sf_dir):
    """Cohort retention: of the users active in the first calendar week,
    how many return in each subsequent week. The cohort is a small
    distinct set (broadcast into the weekly-activity join); weekly
    activity is one dedup shuffle — the whole analysis is two
    aggregations and an equi-join, integer-exact across engines."""
    ev = load_events(spark, sf_dir)
    weekly = ev.select(
        "user_id", (F.col("ts_sec") / 604800).cast("long").alias("week")
    ).distinct()
    w0 = weekly.agg(F.min("week").alias("w0"))
    cohort = (
        weekly.join(F.broadcast(w0), weekly.week == F.col("w0"))
        .select("user_id")
        .distinct()
    )
    csize = cohort.agg(F.count(F.lit(1)).cast("long").alias("cohort_size"))
    return (
        weekly.join(F.broadcast(cohort), "user_id")
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("n_retained"))
        .crossJoin(F.broadcast(csize))
    )


@register(
    "q_events_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type, value,
           ROUND((value - mu) / sigma, 4) AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE ABS((value - mu) / sigma) > 2.5
    """,
)
def q_events_anomaly_zscore(spark, sf_dir):
    """Statistical outlier flagging: per-event-type z-score of the metric
    value, keeping |z| > 2.5. The per-type stats table is tiny (one row
    per event type) and broadcast back onto the stream — one partial-agg
    shuffle plus a map-side join, the canonical anomaly-scan shape for a
    quality-filter pass over training telemetry."""
    ev = load_events(spark, sf_dir)
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.5)
        .select("event_id", "event_type", "value", F.round(z, 4).alias("z"))
    )


@register(
    "q_events_range_interval_window",
    oracle="""
    SELECT event_id, event_type,
           CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_sec,
           ROUND(SUM(value) OVER (
             PARTITION BY event_type ORDER BY epoch_ns(ts)
             RANGE BETWEEN 600000000000 PRECEDING AND CURRENT ROW
           ), 2) AS win_sum,
           CAST(COUNT(*) OVER (
             PARTITION BY event_type ORDER BY epoch_ns(ts)
             RANGE BETWEEN 600000000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS win_n
    FROM events
    """,
)
def q_events_range_interval_window(spark, sf_dir):
    """Time-interval RANGE window frame: per event type, the rolling
    10-minute sum/count ending at each event. A RANGE frame over the
    integer-nanosecond event time is the value-based (not row-count)
    frame — the building block for rolling rate limits and trailing
    metrics. One shuffle on the partition key; the frame itself is a
    single ordered pass per partition, no self-join."""
    ev = load_events(spark, sf_dir)
    w = (
        W.partitionBy("event_type")
        .orderBy("ts")
        .rangeBetween(-600 * NS, 0)
    )
    return ev.select(
        "event_id",
        "event_type",
        "ts_sec",
        F.round(F.sum("value").over(w), 2).alias("win_sum"),
        F.count(F.lit(1)).over(w).alias("win_n"),
    )


@register(
    "q_events_resample_ffill",
    oracle="""
    WITH per AS (
      SELECT event_type,
             CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS bucket_hour,
             ROUND(AVG(value), 4) AS raw_avg,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type,
             MIN(CAST(epoch_ns(ts) // 3600000000000 AS BIGINT)) AS lo,
             MAX(CAST(epoch_ns(ts) // 3600000000000 AS BIGINT)) AS hi
      FROM events GROUP BY 1
    ),
    grid AS (
      SELECT event_type, UNNEST(generate_series(lo, hi)) AS bucket_hour
      FROM bounds
    )
    SELECT g.event_type, CAST(g.bucket_hour AS BIGINT) AS bucket_hour,
           COALESCE(p.n, 0) AS n,
           LAST_VALUE(p.raw_avg IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.bucket_hour
           ) AS avg_filled
    FROM grid g LEFT JOIN per p USING (event_type, bucket_hour)
    """,
)
def q_events_resample_ffill(spark, sf_dir):
    """Time-series resample to an hourly grid with forward-fill — the
    gap-filling shape (TimescaleDB's time_bucket_gapfill + locf). The
    dense grid is generated per key from its own min/max bucket via
    sequence+explode (no driver-side loop), left-joined against the
    hourly aggregate, and holes are filled with last(ignorenulls) over an
    ordered window. Grid size scales with time-span, not row count, so
    at 100 TB the explode side stays tiny while the aggregate side does
    the heavy lifting map-side."""
    ev = load_events(spark, sf_dir)
    hour_ns = 3600 * NS
    bucketed = ev.withColumn("bucket_hour", F.expr(f"ts div {hour_ns}"))
    per = bucketed.groupBy("event_type", "bucket_hour").agg(
        F.round(F.avg("value"), 4).alias("raw_avg"),
        F.count(F.lit(1)).alias("n"),
    )
    bounds = bucketed.groupBy("event_type").agg(
        F.min("bucket_hour").alias("lo"), F.max("bucket_hour").alias("hi")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("bucket_hour")
    )
    w = W.partitionBy("event_type").orderBy("bucket_hour")
    return (
        grid.join(per, ["event_type", "bucket_hour"], "left")
        .select(
            "event_type",
            "bucket_hour",
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
            F.last("raw_avg", ignorenulls=True).over(w).alias("avg_filled"),
        )
    )


@register(
    "q_events_gapfill_interp",
    oracle="""
    WITH per AS (
      SELECT event_type,
             CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS bucket_hour,
             ROUND(AVG(value), 4) AS raw_avg,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type,
             MIN(CAST(epoch_ns(ts) // 3600000000000 AS BIGINT)) AS lo,
             MAX(CAST(epoch_ns(ts) // 3600000000000 AS BIGINT)) AS hi
      FROM events GROUP BY 1
    ),
    grid AS (
      SELECT event_type, UNNEST(generate_series(lo, hi)) AS bucket_hour
      FROM bounds
    ),
    anchored AS (
      SELECT g.event_type, g.bucket_hour,
             COALESCE(p.n, 0) AS n, p.raw_avg,
             LAST_VALUE(p.raw_avg IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.bucket_hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
             LAST_VALUE(CASE WHEN p.raw_avg IS NOT NULL
                             THEN g.bucket_hour END IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.bucket_hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
             FIRST_VALUE(p.raw_avg IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.bucket_hour
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             FIRST_VALUE(CASE WHEN p.raw_avg IS NOT NULL
                              THEN g.bucket_hour END IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.bucket_hour
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
      FROM grid g LEFT JOIN per p USING (event_type, bucket_hour)
    )
    SELECT event_type, CAST(bucket_hour AS BIGINT) AS bucket_hour, n,
           (n = 0) AS is_gap,
           CAST(FLOOR((CASE
             WHEN raw_avg IS NOT NULL THEN raw_avg
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
               prev_v + (next_v - prev_v)
                 * (CAST(bucket_hour - prev_t AS DOUBLE)
                    / CAST(next_t - prev_t AS DOUBLE))
             WHEN prev_v IS NOT NULL THEN prev_v
             ELSE next_v END) * 10000 + 0.5) AS BIGINT) AS avg_interp_e4
    FROM anchored
    """,
)
def q_events_gapfill_interp(spark, sf_dir):
    """Gap-fill with LINEAR INTERPOLATION — the `time_bucket_gapfill +
    interpolate` shape (TimescaleDB) that ``q_events_resample_ffill``'s
    locf cannot express: interior holes get the straight line between
    the surrounding observed buckets, head gaps backfill, tail gaps
    carry forward.

    Plan shape: one hourly aggregate (map-side partial), a per-key dense
    grid whose size scales with TIME SPAN not row count, and four
    ignore-nulls windows over the grid — the corpus is touched exactly
    once, everything after the groupBy runs on span-sized data. Both
    engines compute the interpolation with the identical double
    expression ``prev + (next - prev) * ((t - pt) / (nt - pt))`` over
    already-rounded anchors, and the result is emitted as FIXED-POINT
    ``floor(x*1e4 + 0.5)`` BIGINT — a second decimal ROUND of an
    exactly-half double is engine-dependent; floor over identical IEEE
    doubles is not.
    """
    ev = load_events(spark, sf_dir)
    hour_ns = 3600 * NS
    bucketed = ev.withColumn("bucket_hour", F.expr(f"ts div {hour_ns}"))
    per = bucketed.groupBy("event_type", "bucket_hour").agg(
        F.round(F.avg("value"), 4).alias("raw_avg"),
        F.count(F.lit(1)).alias("n"),
    )
    bounds = bucketed.groupBy("event_type").agg(
        F.min("bucket_hour").alias("lo"), F.max("bucket_hour").alias("hi")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("bucket_hour")
    )
    # BOTH anchor directions use GROWING frames ([unboundedPreceding,
    # currentRow]); the forward anchor simply orders the frame
    # descending. A shrinking frame ([currentRow, unboundedFollowing])
    # with a non-invertible function like first(ignorenulls) makes Spark
    # recompute the aggregate per row — O(span²) per key, measured 14x
    # slower at the probe's 16x history depth. Growing frames update an
    # O(1) buffer per row.
    wb = (
        W.partitionBy("event_type")
        .orderBy("bucket_hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("event_type")
        .orderBy(F.col("bucket_hour").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    obs_t = F.when(F.col("raw_avg").isNotNull(), F.col("bucket_hour"))
    anchored = (
        grid.join(per, ["event_type", "bucket_hour"], "left")
        .select(
            "event_type",
            "bucket_hour",
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
            "raw_avg",
            F.last("raw_avg", ignorenulls=True).over(wb).alias("prev_v"),
            F.last(obs_t, ignorenulls=True).over(wb).alias("prev_t"),
            F.last("raw_avg", ignorenulls=True).over(wf).alias("next_v"),
            F.last(obs_t, ignorenulls=True).over(wf).alias("next_t"),
        )
    )
    frac = (F.col("bucket_hour") - F.col("prev_t")).cast("double") / (
        F.col("next_t") - F.col("prev_t")
    ).cast("double")
    interp = (
        F.when(F.col("raw_avg").isNotNull(), F.col("raw_avg"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac,
        )
        .when(F.col("prev_v").isNotNull(), F.col("prev_v"))
        .otherwise(F.col("next_v"))
    )
    return anchored.select(
        "event_type",
        "bucket_hour",
        "n",
        (F.col("n") == 0).alias("is_gap"),
        F.floor(interp * 10000 + F.lit(0.5)).cast("long").alias("avg_interp_e4"),
    )


@register(
    "q_events_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day_no
      FROM events
    ),
    islands AS (
      SELECT user_id, day_no,
             day_no - ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY day_no) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, COUNT(*) AS streak_len
      FROM islands GROUP BY user_id, grp
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
           CAST(SUM(streak_len) AS BIGINT) AS active_days,
           COUNT(*) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def q_events_streaks(spark, sf_dir):
    """Gaps-and-islands: longest run of consecutive active days per user.
    The island id is day_no minus the per-user row_number — constant
    within a consecutive run, strictly decreasing across gaps — so runs
    fall out of a plain groupBy with no self-join and no iteration.
    Plan shape: distinct (one shuffle on user+day), one window sort
    within the same user partitioning (no extra exchange — the window's
    partitionBy matches the distinct's hash key), and two reductions.
    This is the retention-adjacent primitive (streak badges, churn
    detection) that naive implementations write as a per-user collect."""
    ev = load_events(spark, sf_dir)
    days = (
        ev.select(
            "user_id",
            F.floor(F.col("ts_sec") / 86400).cast("long").alias("day_no"),
        )
        .distinct()
    )
    w = W.partitionBy("user_id").orderBy("day_no")
    islands = days.withColumn("grp", F.col("day_no") - F.row_number().over(w))
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.sum("streak_len").alias("active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@register(
    "q_events_scd2",
    oracle="""
    WITH typed AS (
      SELECT user_id, ts, event_id,
             CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events WHERE user_id < 20
    ),
    starts AS (
      SELECT user_id, ts, event_id, ts_sec, event_type FROM typed
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           ts_sec AS valid_from,
           LEAD(ts_sec) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           CAST(LEAD(ts_sec) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL AS BOOLEAN) AS is_current
    FROM starts
    """,
)
def q_events_scd2(spark, sf_dir):
    """SCD type-2 history build: collapse each user's event-type stream
    into effective-dated segments [valid_from, valid_to), open-ended for
    the current state — the dimension-versioning shape every warehouse
    maintains. Two windows over the SAME user partitioning (change
    detection via lag, interval close via lead), so Spark plans one
    exchange and sorts twice within it — no join, no iteration. BOTH
    window keys include (ts, event_id) to break timestamp ties
    deterministically — two state changes inside one second would make
    a ts_sec-ordered LEAD nondeterministic and let Spark and DuckDB
    legitimately disagree. The user filter bounds the checked output;
    the plan is unchanged without it."""
    ev = load_events(spark, sf_dir).filter(F.col("user_id") < 20)
    worder = W.partitionBy("user_id").orderBy("ts", "event_id")
    typed = ev.select(
        "user_id",
        "ts",
        "event_id",
        "ts_sec",
        "event_type",
        F.lag("event_type").over(worder).alias("prev_type"),
    )
    starts = typed.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    wseg = W.partitionBy("user_id").orderBy("ts", "event_id")
    return starts.select(
        "user_id",
        "event_type",
        F.col("ts_sec").alias("valid_from"),
        F.lead("ts_sec").over(wseg).alias("valid_to"),
        F.lead("ts_sec").over(wseg).isNull().alias("is_current"),
    )


@register(
    "q_events_variant_props",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(COUNT(*) FILTER (
             WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 1
           ) AS BIGINT) AS n_odd_k,
           CAST(COUNT(*) FILTER (
             WHERE json_extract_string(props, '$.missing') IS NULL
           ) AS BIGINT) AS n_missing
    FROM events GROUP BY event_type
    """,
)
def q_events_variant_props(spark, sf_dir):
    """Semi-structured props via Spark 4's VARIANT type: parse_json once
    into the engine-native binary-shredded representation, then typed
    variant_get extraction — the modern replacement for repeated
    get_json_object string re-parses (q_events_json_extract is the
    legacy twin). try_variant_get on an absent path returns NULL instead
    of erroring, the contract a schema-drifting event feed needs.

    Scale notes: VARIANT parses each props string once and stores typed
    shredded bytes, so N extractions cost one parse + N binary probes —
    with string JSON functions they cost N parses. Aggregations beyond
    that are ordinary hash aggs."""
    ev = load_events(spark, sf_dir)
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "long")
    missing = F.try_variant_get("v", "$.missing", "string")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.count(F.when(k % 2 == 1, 1)).cast("long").alias("n_odd_k"),
        F.count(F.when(missing.isNull(), 1)).cast("long").alias("n_missing"),
    )


PATH_TOP = 15


@register(
    "q_events_top_paths",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
      FROM seq WHERE e3 IS NOT NULL GROUP BY 1
    )
    SELECT path, CAST(n AS BIGINT) AS n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path) AS BIGINT) AS rank
    FROM paths ORDER BY n DESC, path LIMIT {PATH_TOP}
    """,
)
def q_events_top_paths(spark, sf_dir):
    """Sequential pattern discovery: the most frequent 3-step
    event-type paths across all user timelines — funnel analysis
    without a prescribed funnel. Two LEADs over the per-user
    time-ordered window turn each event into its own trigram; the rest
    is a hash count + top-k.

    Scale notes: the only shuffle partitions by user_id (bounded,
    high-cardinality — no skew pathology); trigram counting combines
    map-side. Event-id tiebreak makes the sequence deterministic under
    equal timestamps."""
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    paths = (
        seq.filter(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "event_type", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rw = W.orderBy(F.desc("n"), "path")
    return (
        paths.select("path", "n", F.row_number().over(rw).cast("long").alias("rank"))
        .filter(F.col("rank") <= PATH_TOP)
    )


@register(
    "q_events_markov_transition",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    c AS (SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL
          GROUP BY src, dst)
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src), 6) AS p
    FROM c
    """,
)
def q_events_markov_transition(spark, sf_dir):
    """First-order Markov transition matrix over user event sequences:
    P(next event type | current), estimated from adjacent pairs in each
    user's time-ordered stream. The behavioral-model building block
    (next-action prediction, anomalous-transition scoring).

    The row-normalizing denominator is a window SUM over the tiny
    (src, dst) count table — type-pair cardinality squared, independent
    of data size — so the heavy lifting is one user-partitioned LEAD
    plus a combining hash count."""
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    c = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = W.partitionBy("src")
    return c.select(
        "src",
        "dst",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n").cast("double") / F.sum("n").over(tot), 6).alias("p"),
    )


@register(
    "q_events_interval_overlap_join",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS s,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR FLOOR(EPOCH(ts)) - FLOOR(EPOCH(LAG(ts) OVER w)) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sid AS (
      SELECT user_id, s,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY s, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ),
    sess AS (
      SELECT user_id, sid, MIN(s) AS s_start, MAX(s) AS s_end
      FROM sid GROUP BY user_id, sid
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST(a.s_start AS BIGINT) AS start_a,
           CAST(b.s_start AS BIGINT) AS start_b,
           CAST(LEAST(a.s_end, b.s_end) - GREATEST(a.s_start, b.s_start)
                AS BIGINT) AS overlap_sec
    FROM sess a JOIN sess b
      ON a.user_id < b.user_id
     AND a.s_start <= b.s_end AND b.s_start <= a.s_end
    """,
)
def q_events_interval_overlap_join(spark, sf_dir):
    """Interval-overlap join (intervals x intervals — the shape range
    joins can't express): which pairs of users had concurrently-active
    sessions, and for how long. Sessions are the 30-min-gap islands per
    user; a pair qualifies when the two intervals intersect.

    Scale shape: a naive overlap join is a cross product with a residual
    predicate (Spark would pick BroadcastNestedLoopJoin). Instead each
    interval is exploded to the HOUR buckets it spans, candidates come
    from an EQUI-join on the bucket (sessions are minutes long, so the
    fan-out per interval is ~1-2 buckets), a distinct collapses pairs
    that co-occupy several buckets, and the exact overlap predicate
    verifies candidates — band-then-verify again, this time over time.
    Bucket width tunes fan-out vs bucket population exactly like LSH
    band width."""
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_sec", "event_id")
    prev = F.lag("ts_sec").over(w)
    new_s = F.when(prev.isNull() | ((F.col("ts_sec") - prev) > 1800), 1).otherwise(0)
    sid = (
        ev.select("user_id", "ts_sec", "event_id")
        .withColumn("new_s", new_s)
        .withColumn(
            "sid",
            F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    sess = sid.groupBy("user_id", "sid").agg(
        F.min("ts_sec").alias("s_start"), F.max("ts_sec").alias("s_end")
    )
    HOUR = 3600
    bucketed = sess.select(
        "user_id",
        "s_start",
        "s_end",
        F.explode(
            F.sequence(
                F.floor(F.col("s_start") / HOUR), F.floor(F.col("s_end") / HOUR)
            )
        ).alias("bucket"),
    )
    a = bucketed.select(
        F.col("user_id").alias("user_a"),
        F.col("s_start").alias("start_a"),
        F.col("s_end").alias("end_a"),
        "bucket",
    )
    b = bucketed.select(
        F.col("user_id").alias("user_b"),
        F.col("s_start").alias("start_b"),
        F.col("s_end").alias("end_b"),
        "bucket",
    )
    overlap = F.least("end_a", "end_b") - F.greatest("start_a", "start_b")
    return (
        a.join(b, "bucket")
        .filter(F.col("user_a") < F.col("user_b"))
        .select("user_a", "user_b", "start_a", "start_b", "end_a", "end_b")
        .distinct()
        .filter(
            (F.col("start_a") <= F.col("end_b")) & (F.col("start_b") <= F.col("end_a"))
        )
        .select(
            "user_a",
            "user_b",
            "start_a",
            "start_b",
            overlap.cast("long").alias("overlap_sec"),
        )
    )


@register(
    "q_events_scd2_lookup",
    oracle="""
    WITH typed AS (
      SELECT user_id, ts, event_id,
             CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events WHERE user_id < 20
    ),
    starts AS (
      SELECT user_id, ts, event_id, ts_sec, event_type FROM typed
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    dim AS (
      SELECT user_id, event_type AS state,
             ts_sec AS valid_from,
             LEAD(ts_sec) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM starts
    )
    SELECT e.event_id, e.user_id,
           CAST(FLOOR(EPOCH(e.ts)) AS BIGINT) AS ts_sec,
           ROUND(e.value, 2) AS value,
           d.state, CAST(d.valid_from AS BIGINT) AS state_since
    FROM events e
    JOIN dim d
      ON d.user_id = e.user_id
     AND d.valid_from <= FLOOR(EPOCH(e.ts))
     AND (d.valid_to IS NULL OR FLOOR(EPOCH(e.ts)) < d.valid_to)
    WHERE e.event_type = 'purchase' AND e.user_id < 20
    """,
)
def q_events_scd2_lookup(spark, sf_dir):
    """Point-in-time dimension resolution — the CONSUMER side of the
    SCD2 build: each purchase event joins to the effective-dated segment
    covering its timestamp, recovering the user's state as of the event.
    This is how every warehouse fact query reads a versioned dimension.

    Plan shape: an equi-join on user_id carrying the [valid_from,
    valid_to) containment as a residual predicate inside the hash join —
    no cross product; segments-per-user is small and bounded, so the
    residual scan per probe row is O(segments), the standard SCD2 plan.
    The segment window orders by (ts, event_id) — same-second state
    changes would otherwise make valid_to, and hence the joined state,
    nondeterministic between engines.
    """
    ev = load_events(spark, sf_dir).filter(F.col("user_id") < 20)
    worder = W.partitionBy("user_id").orderBy("ts", "event_id")
    typed = ev.select(
        "user_id",
        "ts",
        "event_id",
        "ts_sec",
        "event_type",
        F.lag("event_type").over(worder).alias("prev_type"),
    )
    starts = typed.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    wseg = W.partitionBy("user_id").orderBy("ts", "event_id")
    dim = starts.select(
        F.col("user_id").alias("d_user_id"),
        F.col("event_type").alias("state"),
        F.col("ts_sec").alias("valid_from"),
        F.lead("ts_sec").over(wseg).alias("valid_to"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_sec", F.round("value", 2).alias("value")
    )
    return (
        facts.join(
            dim,
            (F.col("user_id") == F.col("d_user_id"))
            & (F.col("valid_from") <= F.col("ts_sec"))
            & (F.col("valid_to").isNull() | (F.col("ts_sec") < F.col("valid_to"))),
        )
        .select(
            "event_id",
            "user_id",
            "ts_sec",
            "value",
            "state",
            F.col("valid_from").alias("state_since"),
        )
    )


@register(
    "q_events_ks_drift",
    oracle="""
    WITH pooled AS (
      SELECT value, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ),
    totals AS (
      SELECT
        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_a,
        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_b
      FROM pooled
    ),
    ranked AS (
      SELECT value,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS ca,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cb
      FROM pooled
    ),
    per_value AS (
      SELECT value, MAX(ca) AS ca, MAX(cb) AS cb FROM ranked GROUP BY value
    )
    SELECT CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
           ROUND(MAX(ABS(CAST(p.ca AS DOUBLE) / t.n_a
                         - CAST(p.cb AS DOUBLE) / t.n_b)), 6) AS ks_distance
    FROM per_value p, totals t
    GROUP BY t.n_a, t.n_b
    """,
)
def q_events_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov distance between the value
    distributions of two event populations — THE drift test a data
    pipeline runs between yesterday's and today's feed (or between two
    sources) before letting a batch into training. D = max over x of
    |F_a(x) - F_b(x)|: per-group counts are FIRST collapsed per distinct
    value with a plain groupBy (map-side combinable shuffle over the raw
    events), and only the much smaller distinct-value relation flows
    through the ordered cumulative window that builds the two ECDFs —
    ties land on one row by construction, then a max over the ECDF gap.

    Scale note: an unpartitioned cumulative window runs in ONE task in
    Spark (windows are not range-partitioned the way a global orderBy
    is), so the window input must be bounded — here it is |distinct
    values|, not |events|, because the groupBy collapses the population
    before the window. For value domains too large even for that, the
    binned twin q_events_psi_drift replaces the window with a pure
    groupBy(bin) and is the 100-TB shape.
    """
    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_a = F.when(F.col("event_type") == "click", 1).otherwise(0)
    is_b = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    deltas = (
        ev.select("value", "event_type")
        .groupBy("value")
        .agg(F.sum(is_a).alias("da"), F.sum(is_b).alias("db"))
    )
    wcum = W.orderBy("value").rowsBetween(W.unboundedPreceding, 0)
    per_value = deltas.select(
        "value",
        F.sum("da").over(wcum).alias("ca"),
        F.sum("db").over(wcum).alias("cb"),
    )
    totals = deltas.agg(
        F.sum("da").alias("n_a"), F.sum("db").alias("n_b")
    )
    gap = F.abs(
        F.col("ca").cast("double") / F.col("n_a")
        - F.col("cb").cast("double") / F.col("n_b")
    )
    return (
        per_value.crossJoin(F.broadcast(totals))
        .groupBy("n_a", "n_b")
        .agg(F.round(F.max(gap), 6).alias("ks_distance"))
        .select(
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "ks_distance",
        )
    )


@register(
    "q_events_psi_drift",
    oracle="""
    WITH pooled AS (
      SELECT CAST(FLOOR(value / 10) AS BIGINT) AS bin,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    bins AS (
      SELECT bin, SUM(a) AS ca, SUM(b) AS cb FROM pooled GROUP BY bin
    ),
    tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM bins)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(CASE WHEN ca > 0 AND cb > 0 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_bins_skipped,
           ROUND(SUM(CASE WHEN ca > 0 AND cb > 0
                          THEN (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
                               * LN((CAST(ca AS DOUBLE) / na) / (CAST(cb AS DOUBLE) / nb))
                          ELSE 0 END), 6) AS psi
    FROM bins, tot GROUP BY na, nb
    """,
)
def q_events_psi_drift(spark, sf_dir):
    """Population stability index between the same two event populations
    as q_events_ks_drift — the BINNED drift metric, i.e. the 100-TB
    shape: fixed-width value bins turn the exact KS's global sort into
    one groupBy(bin) partial-agg shuffle, and the statistic is a sum
    over bins (map-side combinable). Bins empty on either side are
    skipped and counted (the standard practical PSI treatment — an
    epsilon floor is the alternative when skips must contribute).
    Thresholds in practice: <0.1 stable, 0.1-0.25 drifting, >0.25 act.
    """
    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    pooled = ev.select(
        F.floor(F.col("value") / 10).cast("long").alias("bin"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("b"),
    )
    bins = pooled.groupBy("bin").agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
    tot = bins.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    both = (F.col("ca") > 0) & (F.col("cb") > 0)
    pa = F.col("ca").cast("double") / F.col("na")
    pb = F.col("cb").cast("double") / F.col("nb")
    term = F.when(both, (pa - pb) * F.log(pa / pb)).otherwise(F.lit(0.0))
    return (
        bins.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum(F.when(both, 0).otherwise(1)).alias("n_bins_skipped"),
            F.round(F.sum(term), 6).alias("psi"),
        )
        .select("n_bins", "n_bins_skipped", "psi")
    )


# ---------------------------------------------------------------------------
# Exponentially weighted moving average — the per-key sequential
# recurrence pattern (monitoring smoothing, feature decay). The fold is
# y_t = a*x_t + (1-a)*y_{t-1}, seeded with the first observation.

EWMA_ALPHA = 0.3


def ewma_oracle() -> str:
    """Shared by the batch op and its streaming twin
    (streaming/windows.py:q_stream_ewma) — one source of truth for the
    recurrence the two paths must both reproduce bit-identically."""
    return f"""
    WITH seq AS (
      SELECT user_id, LIST(value ORDER BY ts, event_id) AS vals
      FROM events GROUP BY 1
    )
    SELECT user_id, CAST(LEN(vals) AS BIGINT) AS n_events,
           ROUND(list_reduce(
             vals,
             (acc, x) -> ({EWMA_ALPHA} * x) + ((1.0 - {EWMA_ALPHA}) * acc)
           ), 6) AS ewma
    FROM seq
    """


@register("q_events_ewma", oracle=ewma_oracle())
def q_events_ewma(spark, sf_dir):
    """Per-user EWMA of ``value`` (alpha={EWMA_ALPHA}) over the
    time-ordered event sequence — the per-key sequential-state
    recurrence that resists naive parallelization.

    Execution is ONE groupBy(user) shuffle; the recurrence runs entirely
    JVM-side as ``aggregate()`` over the time-sorted per-user value
    array (no Python, no second shuffle, no per-row window join). Both
    engines seed with the first value and fold with the identical
    ``(a*x) + ((1.0-a)*acc)`` expression, so results are bit-identical.
    The per-key array is the same bounded state any sequential per-key
    scan carries (the streaming twin of this shape is
    applyInPandasWithState); keys are independent, so 1000 executors
    each fold their own users."""
    ev = load_events(spark, sf_dir)
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
                lambda s: s["value"],
            ).alias("vals")
        )
    )
    fold = F.aggregate(
        F.slice(F.col("vals"), 2, F.size("vals") - 1),
        F.element_at("vals", 1),
        lambda acc, x: (F.lit(EWMA_ALPHA) * x) + ((F.lit(1.0) - F.lit(EWMA_ALPHA)) * acc),
    )
    return seq.select(
        "user_id",
        F.size("vals").cast("long").alias("n_events"),
        F.round(fold, 6).alias("ewma"),
    )


@register(
    "q_events_changepoint_cusum",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS bucket_hour,
             ROUND(AVG(value), 4) AS x
      FROM events GROUP BY 1, 2
    ),
    centered AS (
      SELECT event_type, bucket_hour, x,
             ROUND(AVG(x) OVER (PARTITION BY event_type), 6) AS mu,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM hourly
    ),
    cusum AS (
      SELECT event_type, bucket_hour, n,
             SUM(CAST(FLOOR((x - mu) * 1e6 + 0.5) AS BIGINT))
               OVER (PARTITION BY event_type ORDER BY bucket_hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_e6
      FROM centered
    ),
    ranked AS (
      SELECT event_type, bucket_hour, n, ABS(s_e6) AS sabs_e6,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY ABS(s_e6) DESC, bucket_hour) AS rn
      FROM cusum
    )
    SELECT event_type, CAST(bucket_hour AS BIGINT) AS cp_bucket,
           CAST(n AS BIGINT) AS n_buckets,
           CAST(FLOOR(sabs_e6 / 100.0 + 0.5) AS BIGINT) AS cusum_e4
    FROM ranked WHERE rn = 1
    """,
)
def q_events_changepoint_cusum(spark, sf_dir):
    """Offline change-point detection per event type via the CUSUM
    statistic: over the hourly mean series, the running sum of
    deviations from the series mean peaks (in absolute value) at the
    most likely level-shift point — the classic single-change estimator
    (Page's cumulative-sum test, batch form).

    Determinism across engines is engineered, not hoped for: hourly
    means and the series mean are rounded first, then each per-row
    deviation is snapped to fixed-point BIGINT (floor((x-mu)*1e6+0.5))
    BEFORE the cumulative sum — so the window SUM is INTEGER arithmetic,
    exact and summation-order-independent (DuckDB evaluates window sums
    via a segment tree, not sequentially, so a double-typed running sum
    would only agree up to addition order). Ties break on the earlier
    bucket and the peak is emitted as fixed-point BIGINT. Scale shape:
    one corpus aggregate, then span-sized windows per key — same
    footprint as the gap-fill family.
    """
    ev = load_events(spark, sf_dir)
    hour_ns = 3600 * NS
    hourly = (
        ev.withColumn("bucket_hour", F.expr(f"ts div {hour_ns}"))
        .groupBy("event_type", "bucket_hour")
        .agg(F.round(F.avg("value"), 4).alias("x"))
    )
    wk = W.partitionBy("event_type")
    centered = hourly.select(
        "event_type",
        "bucket_hour",
        "x",
        F.round(F.avg("x").over(wk), 6).alias("mu"),
        F.count(F.lit(1)).over(wk).alias("n"),
    )
    ws = (
        W.partitionBy("event_type")
        .orderBy("bucket_hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    dev_e6 = F.floor((F.col("x") - F.col("mu")) * 1e6 + F.lit(0.5)).cast("long")
    cusum = centered.select(
        "event_type",
        "bucket_hour",
        "n",
        F.sum(dev_e6).over(ws).alias("s_e6"),
    )
    wr = W.partitionBy("event_type").orderBy(
        F.abs(F.col("s_e6")).desc(), F.col("bucket_hour")
    )
    return (
        cusum.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("bucket_hour").alias("cp_bucket"),
            F.col("n").cast("long").alias("n_buckets"),
            F.floor(F.abs("s_e6") / F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .alias("cusum_e4"),
        )
    )


EMBARGO_SEC = 6 * 3600  # purged gap between train end and test start


@register(
    "q_split_temporal_embargo",
    oracle=f"""
    WITH b AS (
      SELECT MIN(CAST(epoch_ns(ts) // 1000000000 AS BIGINT)) AS lo,
             MAX(CAST(epoch_ns(ts) // 1000000000 AS BIGINT)) AS hi
      FROM events
    ),
    cut AS (
      SELECT lo, hi, lo + CAST(FLOOR((hi - lo) * 0.8) AS BIGINT) AS c
      FROM b
    ),
    tagged AS (
      SELECT e.user_id, CAST(epoch_ns(e.ts) // 1000000000 AS BIGINT) AS sec,
             cut.c
      FROM events e, cut
    )
    SELECT CASE WHEN sec <= c THEN 'train'
                WHEN sec > c + {EMBARGO_SEC} THEN 'test'
                ELSE 'embargo' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(sec) AS BIGINT) AS min_sec,
           CAST(MAX(sec) AS BIGINT) AS max_sec
    FROM tagged GROUP BY 1
    """,
)
def q_split_temporal_embargo(spark, sf_dir):
    """Temporal train/test split with a PURGED EMBARGO gap — the
    leakage-safe protocol for time-series models (walk-forward
    validation): train is everything up to the 80%-span cut, the next
    6 hours (EMBARGO_SEC) are discarded so label windows and
    rolling features computed at train time cannot peek into test, and
    test is strictly after the embargo. Membership is a pure function
    of the event timestamp and the corpus time bounds, so the split is
    identical across engines, runs, and partitionings.

    Scale shape: one min/max aggregate (two scalars broadcast back), one
    map-side CASE tag, one groupBy over three split labels — the cut is
    never a sort or a quantile, so 100x more history costs one bigger
    scan. The distinct-user count per split is the leakage AUDIT column:
    train/test user overlap is expected here (same population, later
    time), which is exactly what the purged gap — not user disjointness
    — protects."""
    ev = load_events(spark, sf_dir)
    b = ev.agg(
        F.min("ts_sec").alias("lo"), F.max("ts_sec").alias("hi")
    ).select(
        "lo",
        "hi",
        (F.col("lo") + F.floor((F.col("hi") - F.col("lo")) * 0.8)).alias("c"),
    )
    tagged = ev.select("user_id", F.col("ts_sec").alias("sec")).crossJoin(
        F.broadcast(b.select("c"))
    )
    split = (
        F.when(F.col("sec") <= F.col("c"), "train")
        .when(F.col("sec") > F.col("c") + EMBARGO_SEC, "test")
        .otherwise("embargo")
    )
    return tagged.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("sec").alias("min_sec"),
        F.max("sec").alias("max_sec"),
    )


HOLT_A = 0.4  # level smoothing
HOLT_B = 0.3  # trend smoothing


@register(
    "q_events_holt_trend",
    # NOTE: the oracle deliberately avoids DuckDB list_reduce with a
    # struct accumulator — this DuckDB (1.0) mutates the accumulator
    # field-by-field during struct_pack evaluation, so the b-expression
    # sees the already-updated l (measured: (3.4, 0.952) vs the correct
    # (3.4, 1.12) on [1,2,4,8]). A recursive CTE has standard semantics.
    oracle=f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS i
      FROM events
    ),
    n AS (SELECT user_id, MAX(i) AS n FROM ev GROUP BY 1),
    rec(user_id, i, l, b) AS (
      SELECT a.user_id, 1, a.value, s.value - a.value
      FROM ev a JOIN ev s ON s.user_id = a.user_id AND s.i = 2
      WHERE a.i = 1
      UNION ALL
      SELECT r.user_id, r.i + 1,
             ({HOLT_A} * e.value) + ((1.0 - {HOLT_A}) * (r.l + r.b)),
             ({HOLT_B} * ((({HOLT_A} * e.value)
               + ((1.0 - {HOLT_A}) * (r.l + r.b))) - r.l))
               + ((1.0 - {HOLT_B}) * r.b)
      FROM rec r JOIN ev e ON e.user_id = r.user_id AND e.i = r.i + 1
    )
    SELECT r.user_id, CAST(n.n AS BIGINT) AS n_events,
           ROUND(r.l, 6) AS level, ROUND(r.b, 6) AS trend,
           ROUND(r.l + r.b, 6) AS forecast_next
    FROM rec r JOIN n ON n.user_id = r.user_id
    WHERE r.i = n.n AND n.n >= 2
    """,
)
def q_events_holt_trend(spark, sf_dir):
    """Holt double exponential smoothing per user — the level+trend
    upgrade of ``q_events_ewma``'s single-state recurrence, yielding a
    one-step-ahead forecast (level + trend) per key. Same execution
    shape: ONE groupBy(user) shuffle, then the two-variable recurrence
    folds JVM-side over the time-sorted value array with a STRUCT
    accumulator — no Python, no per-row window join. The fold seeds
    l=x1, b=x2-x1 and both engines inline the identical update
    expressions (new_b references new_l by inlining it, so evaluation
    order is pinned), making level/trend bit-identical before
    rounding. Keys are independent: 1000 executors each fold their own
    users, and per-key state is two doubles."""
    ev = load_events(spark, sf_dir)
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
                lambda s: s["value"],
            ).alias("vals")
        )
        .filter(F.size("vals") >= 2)
    )
    a, b = F.lit(HOLT_A), F.lit(HOLT_B)
    one = F.lit(1.0)

    def step(acc, x):
        new_l = (a * x) + ((one - a) * (acc["l"] + acc["b"]))
        new_b = (b * (((a * x) + ((one - a) * (acc["l"] + acc["b"]))) - acc["l"])) + (
            (one - b) * acc["b"]
        )
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    init = F.struct(
        F.element_at("vals", 1).alias("l"),
        (F.element_at("vals", 2) - F.element_at("vals", 1)).alias("b"),
    )
    fold = F.aggregate(F.slice(F.col("vals"), 2, F.size("vals") - 1), init, step)
    return seq.select(
        "user_id",
        F.size("vals").cast("long").alias("n_events"),
        F.round(fold["l"], 6).alias("level"),
        F.round(fold["b"], 6).alias("trend"),
        F.round(fold["l"] + fold["b"], 6).alias("forecast_next"),
    )


@register(
    "q_events_ttest_welch",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             AVG(value) AS m,
             VAR_SAMP(value) AS v
      FROM events WHERE event_type IN ('purchase', 'error') GROUP BY 1
    ),
    ab AS (
      SELECT
        MAX(CASE WHEN event_type = 'purchase' THEN n END) AS na,
        MAX(CASE WHEN event_type = 'purchase' THEN m END) AS ma,
        MAX(CASE WHEN event_type = 'purchase' THEN v END) AS va,
        MAX(CASE WHEN event_type = 'error' THEN n END) AS nb,
        MAX(CASE WHEN event_type = 'error' THEN m END) AS mb,
        MAX(CASE WHEN event_type = 'error' THEN v END) AS vb
      FROM g
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND(ma - mb, 4) AS mean_diff,
           ROUND((ma - mb) / SQRT(va / na + vb / nb), 4) AS t_stat,
           ROUND(
             ((va / na + vb / nb) * (va / na + vb / nb))
             / ((va / na) * (va / na) / (na - 1)
                + (vb / nb) * (vb / nb) / (nb - 1)), 2) AS dof_welch
    FROM ab
    """,
)
def q_events_ttest_welch(spark, sf_dir):
    """Welch's unequal-variance t-test between two event populations —
    the parametric member of the drift-test family (KS measures the
    whole CDF, PSI measures binned mass shift, this tests the MEAN with
    the Welch-Satterthwaite degrees of freedom). Everything reduces to
    per-group (n, mean, var) moment aggregates — one map-side-combinable
    pass over the corpus, then scalar arithmetic on a 2-row relation, so
    the statistic costs the same as a groupBy-avg at any scale. Both
    engines compute the identical closed-form expressions over
    identically-aggregated moments, rounded past summation drift."""
    ev = load_events(spark, sf_dir)
    g = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    pick = lambda col, t: F.max(F.when(F.col("event_type") == t, F.col(col)))
    ab = g.agg(
        pick("n", "purchase").alias("na"),
        pick("m", "purchase").alias("ma"),
        pick("v", "purchase").alias("va"),
        pick("n", "error").alias("nb"),
        pick("m", "error").alias("mb"),
        pick("v", "error").alias("vb"),
    )
    se2a = F.col("va") / F.col("na")
    se2b = F.col("vb") / F.col("nb")
    return ab.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(F.col("ma") - F.col("mb"), 4).alias("mean_diff"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2a + se2b), 4).alias("t_stat"),
        F.round(
            ((se2a + se2b) * (se2a + se2b))
            / (
                se2a * se2a / (F.col("na") - 1)
                + se2b * se2b / (F.col("nb") - 1)
            ),
            2,
        ).alias("dof_welch"),
    )


@register(
    "q_events_chisq_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             CAST((epoch_ns(ts) // 86400000000000) % 7 AS BIGINT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, SUM(o) AS rtot FROM cells GROUP BY 1),
    ct AS (SELECT dow, SUM(o) AS ctot FROM cells GROUP BY 1),
    tot AS (
      SELECT SUM(o) AS n,
             COUNT(DISTINCT event_type) AS r,
             COUNT(DISTINCT dow) AS c
      FROM cells
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(r) AS BIGINT) AS n_rows,
           CAST(MAX(c) AS BIGINT) AS n_cols,
           CAST((MAX(r) - 1) * (MAX(c) - 1) AS BIGINT) AS dof,
           CAST(SUM(CAST(FLOOR(
             (CAST(o AS DOUBLE)
              - CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(o AS DOUBLE)
                - CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE) / CAST(n AS DOUBLE))
             * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS chi2_e6
    FROM cells
      JOIN rt USING (event_type)
      JOIN ct USING (dow)
      CROSS JOIN tot
    """,
)
def q_events_chisq_independence(spark, sf_dir):
    """Pearson chi-square test of independence between event type and
    day-of-week — "does WHAT users do depend on WHEN they do it" — the
    categorical member of the drift-test family (KS/PSI compare
    continuous distributions, Mann-Whitney compares ranks, this tests a
    contingency table).

    The contingency table is one map-side-combinable groupBy over the
    corpus (|types| x 7 cells); margins and the grand total are
    aggregate-level relations joined back at constant size (the 1-row
    total rides as a broadcast). Each cell's (O-E)^2/E term is computed
    by the IDENTICAL double expression tree over exact BIGINT counts on
    both engines, snapped to e6 fixed point BEFORE the final sum so
    summation order can never flip the hash; expected counts are
    strictly positive by construction (margins of observed cells).
    Day-of-week is pure integer epoch math — no timezone functions on
    either engine."""
    ev = load_events(spark, sf_dir)
    day_ns = 86400 * NS
    cells = (
        ev.select(
            "event_type",
            F.expr(f"CAST((ts div {day_ns}) % 7 AS BIGINT)").alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    rt = cells.groupBy("event_type").agg(F.sum("o").alias("rtot"))
    ct = cells.groupBy("dow").agg(F.sum("o").alias("ctot"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("dow").alias("c"),
    )
    e = (
        F.col("rtot").cast("double")
        * F.col("ctot").cast("double")
        / F.col("n").cast("double")
    )
    term = (F.col("o").cast("double") - e) * (
        F.col("o").cast("double") - e
    ) / e
    return (
        cells.join(rt, "event_type")
        .join(ct, "dow")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("r").cast("long").alias("n_rows"),
            F.max("c").cast("long").alias("n_cols"),
            ((F.max("r") - 1) * (F.max("c") - 1)).cast("long").alias("dof"),
            F.sum(
                F.floor(term * F.lit(1e6) + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("chi2_e6"),
        )
    )


@register(
    "q_events_mannwhitney_u",
    oracle="""
    WITH s AS (
      SELECT value,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cnt_a
      FROM events WHERE event_type IN ('purchase', 'error')
      GROUP BY value
    ),
    r AS (
      SELECT cnt, cnt_a,
             SUM(cnt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
               AS cnt_less
      FROM s
    ),
    m AS (
      SELECT SUM(cnt_a) AS n_a,
             SUM(cnt) - SUM(cnt_a) AS n_b,
             SUM(cnt) AS n,
             SUM(cnt_a * (2 * cnt_less + cnt + 1)) AS r2_a,
             SUM(cnt * cnt * cnt - cnt) AS tie3
      FROM r
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           CAST(tie3 AS BIGINT) AS tie3,
           CAST(FLOOR(
             (CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             / (2.0 * SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                 * (CAST(n + 1 AS DOUBLE)
                    - CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))))
             * 1e6 + 0.5) AS BIGINT) AS z_e6
    FROM m
    WHERE n_a * n_b > 0 AND tie3 < n * n * n - n
    """,
)
def q_events_mannwhitney_u(spark, sf_dir):
    """Mann-Whitney U rank-sum test between two event populations — the
    NONPARAMETRIC sibling of q_events_ttest_welch: where Welch compares
    means under a normality assumption, this compares the full rank
    distribution and is robust to the heavy right tail a value metric
    actually has.

    Exact-integer discipline end to end: the combined sample collapses
    to a groupBy(value) aggregate (map-side combinable; input to every
    window is |distinct values| of a bounded-precision metric, never
    |events|), doubled average ranks ``2*avgrank = 2*cnt_less + cnt + 1``
    keep midranks in BIGINT, and the doubled U statistic
    ``U2 = R2_A - n_a(n_a+1)`` is exact. The tie-corrected normal
    approximation z is ONE identical closed-form double expression over
    those BIGINTs on both engines (IEEE sqrt is correctly rounded),
    snapped to e6 fixed point; the degenerate all-tied sample
    (sigma = 0) is filtered out identically on both sides rather than
    letting NaN reach the hash."""
    ev = load_events(spark, sf_dir)
    s = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .groupBy("value")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("cnt_a"),
        )
    )
    wcum = W.orderBy("value").rowsBetween(W.unboundedPreceding, W.currentRow)
    r = s.select(
        "cnt",
        "cnt_a",
        (F.sum("cnt").over(wcum) - F.col("cnt")).alias("cnt_less"),
    )
    m = r.agg(
        F.sum("cnt_a").alias("n_a"),
        (F.sum("cnt") - F.sum("cnt_a")).alias("n_b"),
        F.sum("cnt").alias("n"),
        F.sum(
            F.col("cnt_a") * (2 * F.col("cnt_less") + F.col("cnt") + 1)
        ).alias("r2_a"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tie3"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nn = F.col("n").cast("double")
    u2 = F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)
    sigma2_12 = na * nb / F.lit(12.0) * (
        (nn + F.lit(1.0))
        - F.col("tie3").cast("double") / (nn * (nn - F.lit(1.0)))
    )
    z = (u2.cast("double") - na * nb) / (F.lit(2.0) * F.sqrt(sigma2_12))
    return (
        m.filter(
            (F.col("n_a") * F.col("n_b") > 0)
            & (
                F.col("tie3")
                < F.col("n") * F.col("n") * F.col("n") - F.col("n")
            )
        )
        .select(
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            u2.cast("long").alias("u2_a"),
            F.col("tie3").cast("long").alias("tie3"),
            F.floor(z * F.lit(1e6) + F.lit(0.5)).cast("long").alias("z_e6"),
        )
    )


@register(
    "q_events_max_drawdown",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM events
    ),
    dd AS (
      SELECT user_id, cum,
             MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM seq
    )
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(MAX(peak - cum), 4) AS max_drawdown,
           ROUND(MAX(peak), 4) AS peak_cum
    FROM dd GROUP BY user_id
    """,
)
def q_events_max_drawdown(spark, sf_dir):
    """Maximum drawdown of each user's cumulative value series — the
    peak-to-trough risk statistic (finance's canonical path-dependent
    measure, equally useful as an SLO burn-down or engagement-decay
    audit). Two stacked growing-frame windows per key (running sum,
    then running max of it) and one aggregate — all sequential adds in
    a pinned order, so the doubles agree bit-for-bit across engines
    before the final rounding; no shrinking frames (see the gap-fill
    O(span^2) lesson), no second shuffle past the per-user partition."""
    ev = load_events(spark, sf_dir)
    wseq = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    seq = ev.select(
        "user_id", "ts", "event_id", F.sum("value").over(wseq).alias("cum")
    )
    seq = seq.select(
        "user_id", "cum", F.max("cum").over(wseq).alias("peak")
    )
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.max(F.col("peak") - F.col("cum")), 4).alias("max_drawdown"),
        F.round(F.max("peak"), 4).alias("peak_cum"),
    )


@register(
    "q_events_seasonality_profile",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST((epoch_ns(ts) // 3600000000000) % 24 AS BIGINT) AS hour_utc,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(FLOOR(AVG(value) * 10000 + 0.5) AS BIGINT) AS avg_value_e4
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, hour_utc, n, avg_value_e4,
           (ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY n DESC, hour_utc) = 1) AS is_peak_hour
    FROM hourly
    """,
)
def q_events_seasonality_profile(spark, sf_dir):
    """Hour-of-day seasonality profile per event type — the diurnal
    fingerprint capacity planning and anomaly baselines read (an
    anomaly score against the WRONG hour's baseline is noise). One
    map-side-combinable aggregate over a 24 x types key domain, then a
    24-row-per-type window marks each type's peak hour with a
    deterministic (count, hour) tie-break. The hour is derived from the
    same integer nanosecond bucketing as every other temporal op — no
    timezone or double-epoch drift surface."""
    ev = load_events(spark, sf_dir)
    hour_ns = 3600 * NS
    hourly = (
        ev.withColumn("hour_utc", F.expr(f"(ts div {hour_ns}) % 24"))
        .groupBy("event_type", "hour_utc")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # fixed-point, not round(): an exactly-half average (seen at
            # sf0.001: 54.77875) rounds differently across engines
            F.floor(F.avg("value") * 10000 + F.lit(0.5))
            .cast("long")
            .alias("avg_value_e4"),
        )
    )
    w = W.partitionBy("event_type").orderBy(F.col("n").desc(), "hour_utc")
    return hourly.select(
        "event_type",
        "hour_utc",
        "n",
        "avg_value_e4",
        (F.row_number().over(w) == 1).alias("is_peak_hour"),
    )


@register(
    "q_events_rfm_segments",
    oracle="""
    WITH bounds AS (
      SELECT MAX(CAST(epoch_ns(ts) // 1000000000 AS BIGINT)) AS now_sec
      FROM events
    ),
    rfm AS (
      SELECT e.user_id,
             MIN(b.now_sec - CAST(epoch_ns(e.ts) // 1000000000 AS BIGINT))
               AS recency_sec,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(FLOOR(SUM(CASE WHEN e.event_type = 'purchase'
                                 THEN e.value ELSE 0 END) * 100 + 0.5)
                  AS BIGINT) AS monetary_e2
      FROM events e, bounds b GROUP BY e.user_id
    )
    SELECT user_id, recency_sec, frequency, monetary_e2,
           CAST(6 - NTILE(5) OVER (ORDER BY recency_sec, user_id) AS BIGINT)
             AS r_score,
           CAST(NTILE(5) OVER (ORDER BY frequency, user_id) AS BIGINT)
             AS f_score,
           CAST(NTILE(5) OVER (ORDER BY monetary_e2, user_id) AS BIGINT)
             AS m_score
    FROM rfm
    """,
)
def q_events_rfm_segments(spark, sf_dir):
    """RFM segmentation — recency / frequency / monetary quintile scores
    per user, the classic behavioral-cohort featurization (marketing's
    workhorse, equally a user-quality feature for data curation). One
    groupBy(user) computes all three raw metrics (monetary as exact
    fixed-point cents); the quintile windows then run over the
    USER-cardinality aggregate, not raw events, with (metric, user_id)
    total orders so NTILE boundaries are deterministic. Recency is
    inverted (6 − ntile) so 5 always means "best". The corpus-timestamp
    anchor is a 1-row broadcast; everything else is map-side until the
    bounded ranking."""
    ev = load_events(spark, sf_dir)
    now = ev.agg(F.max("ts_sec").alias("now_sec"))
    rfm = (
        ev.crossJoin(F.broadcast(now))
        .groupBy("user_id")
        .agg(
            F.min(F.col("now_sec") - F.col("ts_sec")).alias("recency_sec"),
            F.count(F.lit(1)).alias("frequency"),
            F.floor(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                    .otherwise(0.0)
                )
                * 100
                + F.lit(0.5)
            )
            .cast("long")
            .alias("monetary_e2"),
        )
    )
    return rfm.select(
        "user_id",
        "recency_sec",
        "frequency",
        "monetary_e2",
        (6 - F.ntile(5).over(W.orderBy("recency_sec", "user_id")))
        .cast("long")
        .alias("r_score"),
        F.ntile(5).over(W.orderBy("frequency", "user_id")).cast("long").alias("f_score"),
        F.ntile(5).over(W.orderBy("monetary_e2", "user_id")).cast("long").alias("m_score"),
    )


# --- Funnel conversion: ordered stage progression within a window -------

FUNNEL_WINDOW_SEC = 6 * 3600  # max delay allowed between funnel stages


@register(
    "q_events_funnel_conversion",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, CAST(epoch_ns(ts) AS BIGINT) AS t
      FROM events
    ),
    v AS (SELECT user_id, MIN(t) AS v FROM e
          WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, MIN(t) AS c FROM e JOIN v USING (user_id)
          WHERE event_type = 'click'
            AND t > v AND t <= v + {FUNNEL_WINDOW_SEC}::BIGINT * 1000000000
          GROUP BY 1),
    p AS (SELECT e.user_id, MIN(t) AS p FROM e JOIN c USING (user_id)
          WHERE event_type = 'purchase'
            AND t > c AND t <= c + {FUNNEL_WINDOW_SEC}::BIGINT * 1000000000
          GROUP BY 1),
    u AS (SELECT DISTINCT user_id FROM e)
    SELECT u.user_id,
           CAST(CASE WHEN p.p IS NOT NULL THEN 3
                     WHEN c.c IS NOT NULL THEN 2
                     WHEN v.v IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS stage,
           CAST(COALESCE(v.v // 1000000000, -1) AS BIGINT) AS view_sec,
           CAST(COALESCE((c.c - v.v) // 1000000000, -1) AS BIGINT)
             AS click_delay_sec,
           CAST(COALESCE((p.p - c.c) // 1000000000, -1) AS BIGINT)
             AS purchase_delay_sec
    FROM u LEFT JOIN v USING (user_id)
           LEFT JOIN c USING (user_id)
           LEFT JOIN p USING (user_id)
    """,
)
def q_events_funnel_conversion(spark, sf_dir):
    """Ordered funnel analysis (view → click → purchase, each stage
    within {FUNNEL_WINDOW_SEC} s of the previous): the
    conversion-measurement query every product-analytics stack runs,
    and the canonical "sequence pattern over an event stream" shape
    (MATCH_RECOGNIZE's simplest instance, expressed relationally).

    Semantics are anchored deterministic: the FIRST view per user opens
    the funnel, the first qualifying click after it advances, the first
    qualifying purchase completes — min() anchors, no row-order
    dependence anywhere, all timestamp math integer nanoseconds.

    Scale shape: three stage aggregations joined on the funnel key —
    every join is a user_id equi-join over per-user scalar relations
    that SHRINK stage by stage (clicks only for converted viewers,
    purchases only for clickers), so the plan is co-partitioned
    shuffle joins with no window over the raw stream and no pair
    explosion at any skew."""
    T_NS = FUNNEL_WINDOW_SEC * NS
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("v")) & (F.col("ts") <= F.col("v") + T_NS))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("c")) & (F.col("ts") <= F.col("c") + T_NS))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p"))
    )
    u = ev.select("user_id").distinct()
    stage = (
        F.when(F.col("p").isNotNull(), 3)
        .when(F.col("c").isNotNull(), 2)
        .when(F.col("v").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        u.join(v, "user_id", "left_outer")
        .join(c, "user_id", "left_outer")
        .join(p, "user_id", "left_outer")
        .select(
            "user_id",
            stage.cast("long").alias("stage"),
            F.coalesce(F.expr(f"v div {NS}"), F.lit(-1))
            .cast("long")
            .alias("view_sec"),
            F.coalesce(F.expr(f"(c - v) div {NS}"), F.lit(-1))
            .cast("long")
            .alias("click_delay_sec"),
            F.coalesce(F.expr(f"(p - c) div {NS}"), F.lit(-1))
            .cast("long")
            .alias("purchase_delay_sec"),
        )
    )


# --- Exact OLS trend per key (closed form over integer moment sums) -----

HOUR_NS = 3600 * NS


@register(
    "q_events_linreg_trend",
    oracle=f"""
    WITH b AS (SELECT MIN(CAST(epoch_ns(ts) AS BIGINT)) AS lo FROM events),
    e AS (
      SELECT event_type,
             (CAST(epoch_ns(ts) AS BIGINT) - b.lo) // {HOUR_NS} AS x,
             CAST(FLOOR(value * 1e2 + 0.5) AS BIGINT) AS y
      FROM events, b
    ),
    s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM e GROUP BY 1
    ),
    t AS (
      SELECT event_type, n, sx, sy,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
      FROM s
    )
    SELECT event_type, n,
           CAST(FLOOR(slope * 1e4 + 0.5) AS BIGINT) AS slope_e6_per_hour,
           CAST(FLOOR((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                      / CAST(n AS DOUBLE) * 1e2 + 0.5) AS BIGINT)
             AS intercept_e4
    FROM t
    """,
)
def q_events_linreg_trend(spark, sf_dir):
    """Exact per-key OLS trend line (value vs hours-since-corpus-start)
    in closed form — the drift detector next to Holt smoothing
    (q_events_holt_trend): Holt tracks, OLS *tests* whether a metric
    trends, and its slope is the number monitoring alerts on.

    Determinism is engineered through the moment sums: x is an INTEGER
    hour index, y is fixed-point BIGINT (floor(value*1e2+0.5) — e2, not
    e4: Spark's non-ANSI SUM(long) silently wraps past 2^63 while the
    oracle's HUGEINT does not, and e2 keeps Sxy exact to ~1e9 rows per
    key at fixture-scale values and decade-scale spans; past that the
    documented swap is OLS over hourly bucket MEANS, the
    q_events_autocorr_lag shape, whose sums are bounded by the time
    span), so
    n/Σx/Σy/Σxy/Σx² are exact integers no matter what order partial
    aggregates merge in; slope and intercept are then computed from
    those integers with an IDENTICAL double expression tree on both
    engines — same operands, same IEEE ops, same bits. One map-side
    combinable aggregation after a one-row broadcast (the corpus start);
    nothing else touches the data, so the plan is a pure scan+agg at
    any scale. Fixed-point output keys: slope_e6_per_hour is in y-e4
    units per hour scaled 1e2 (= value units/hour * 1e6), intercept_e4
    in y-e4 units."""
    ev = load_events(spark, sf_dir)
    b = ev.agg(F.min("ts").alias("lo"))
    e = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.expr(f"(ts - lo) div {HOUR_NS}").alias("x"),
        F.floor(F.col("value") * 1e2 + F.lit(0.5)).cast("long").alias("y"),
    )
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    slope = (nd * F.col("sxy").cast("double") - sxd * syd) / (
        nd * F.col("sxx").cast("double") - sxd * sxd
    )
    return s.select(
        "event_type",
        "n",
        F.floor(slope * 1e4 + F.lit(0.5)).cast("long").alias("slope_e6_per_hour"),
        F.floor((syd - slope * sxd) / nd * 1e2 + F.lit(0.5))
        .cast("long")
        .alias("intercept_e4"),
    )


# --- Survival analysis: Nelson-Aalen cumulative hazard over user lifetimes

CENSOR_WINDOW_H = 24  # users last seen in the final day are censored


@register(
    "q_events_survival_hazard",
    oracle=f"""
    WITH b AS (SELECT MAX(CAST(epoch_ns(ts) AS BIGINT)) AS hi FROM events),
    u AS (
      SELECT user_id,
             (MAX(CAST(epoch_ns(ts) AS BIGINT))
              - MIN(CAST(epoch_ns(ts) AS BIGINT))) // {HOUR_NS} AS dur,
             CASE WHEN MAX(CAST(epoch_ns(ts) AS BIGINT))
                       >= ANY_VALUE(b.hi) - {CENSOR_WINDOW_H} * {HOUR_NS}
                  THEN 1 ELSE 0 END AS cens
      FROM events, b GROUP BY user_id
    ),
    g AS (
      SELECT dur, SUM(1 - cens) AS d, SUM(cens) AS c FROM u GROUP BY dur
    ),
    r AS (
      SELECT dur, d, c,
             SUM(d + c) OVER (ORDER BY dur
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
      FROM g
    )
    SELECT CAST(dur AS BIGINT) AS dur_hours,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS d_events,
           CAST(c AS BIGINT) AS c_censored,
           CAST(d * 1000000 // n_risk AS BIGINT) AS hazard_e6,
           CAST(SUM(d * 1000000 // n_risk) OVER (ORDER BY dur) AS BIGINT)
             AS cum_hazard_e6
    FROM r
    """,
)
def q_events_survival_hazard(spark, sf_dir):
    """Right-censored survival analysis of user lifetimes: the
    Nelson-Aalen cumulative-hazard estimator H(t) = SUM over event times
    t_i <= t of d_i/n_i, where a user's lifetime is the span between
    their first and last event in whole hours and users still active in
    the final CENSOR_WINDOW_H hours of the corpus are censored (they
    leave the risk set without counting as churn). S(t) = exp(-H(t)) is
    left to the consumer.

    Everything compared is EXACT integer arithmetic: durations are
    integer hours, d_i/n_i/censor flags are counts, the per-time hazard
    is the integer division d_i*1e6 // n_i and the cumulative hazard a
    BIGINT running sum of those — partial-aggregate merge order cannot
    perturb a bit. The risk-set count n_i comes from a suffix-sum window
    (sum IS invertible, so Spark's shrinking frame stays O(n)) over the
    groupBy(dur) relation: |distinct lifetimes| rows (<= corpus span in
    hours), never |events| or |users| — the single scalar attach is the
    corpus end timestamp (1-row broadcast)."""
    ev = load_events(spark, sf_dir)
    hi = ev.agg(F.max("ts").alias("hi"))
    u = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("user_hi"))
        .crossJoin(F.broadcast(hi))
        .select(
            F.expr(f"(user_hi - lo) div {HOUR_NS}").alias("dur"),
            F.when(
                F.col("user_hi")
                >= F.col("hi") - F.lit(CENSOR_WINDOW_H * HOUR_NS),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("cens"),
        )
    )
    g = u.groupBy("dur").agg(
        F.sum(F.lit(1) - F.col("cens")).alias("d"),
        F.sum("cens").alias("c"),
    )
    # suffix sum over the |distinct durations| relation (bounded by the
    # corpus span in hours) — audited as a justified one-task window
    w_risk = W.orderBy("dur").rowsBetween(W.currentRow, W.unboundedFollowing)
    w_cum = W.orderBy("dur").rowsBetween(W.unboundedPreceding, W.currentRow)
    r = g.withColumn("n_risk", F.sum(F.col("d") + F.col("c")).over(w_risk))
    hazard = F.expr("(d * 1000000) div n_risk").cast("long")
    return r.select(
        F.col("dur").cast("long").alias("dur_hours"),
        F.col("n_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("d_events"),
        F.col("c").cast("long").alias("c_censored"),
        hazard.alias("hazard_e6"),
        F.sum(hazard).over(w_cum).cast("long").alias("cum_hazard_e6"),
    )


# --- Autocorrelation: exact lag-k Pearson r over hourly bucket means ---

ACF_LAGS = (1, 24)  # adjacent-hour persistence and daily seasonality


def _acf_oracle() -> str:
    lag_selects = "\nUNION ALL\n".join(
        f"""
    SELECT event_type, {k} AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           SUM(x.m) AS sx, SUM(y.m) AS sy,
           SUM(x.m * y.m) AS sxy,
           SUM(x.m * x.m) AS sxx, SUM(y.m * y.m) AS syy
    FROM bkt x JOIN bkt y USING (event_type)
    WHERE y.hb = x.hb + {k}
    GROUP BY 1, 2
        """
        for k in ACF_LAGS
    )
    return f"""
    WITH bkt AS (
      SELECT event_type,
             CAST(epoch_ns(ts) AS BIGINT) // {HOUR_NS} AS hb,
             SUM(CAST(FLOOR(value * 1e4 + 0.5) AS BIGINT))
               // (10 * COUNT(*)) AS m
      FROM events GROUP BY 1, 2
    ),
    lagged AS ({lag_selects})
    SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs,
           CAST(FLOOR(
             (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             * 1e6 + 0.5) AS BIGINT) AS r_e6
    FROM lagged
    """


@register("q_events_autocorr_lag", oracle=_acf_oracle())
def q_events_autocorr_lag(spark, sf_dir):
    """Exact lag-k autocorrelation (Pearson r between the hourly series
    and itself shifted by k hours) per event type, for k in ACF_LAGS —
    lag 1 measures hour-to-hour persistence, lag 24 daily seasonality
    strength (the quantified twin of q_events_seasonality_profile's
    per-hour means).

    The series value is the per-(type, hour-bucket) MEAN in e3 fixed
    point, computed as an exact integer division of exact integer sums,
    so every moment (n, Sx, Sy, Sxy, Sxx, Syy) is an exact BIGINT no
    matter how partial aggregates merge; r is then one identical IEEE
    expression tree (mul/sub/div/sqrt are all correctly rounded) on both
    engines. Missing buckets simply produce no pair, matching the join
    semantics on both sides. The plan is scan -> partial-agg shuffle to
    the bucket relation, then a self-equi-join on (type, bucket+k) over
    the SMALL bucket relation (|types| x |hours|) and a final tiny
    aggregate; the e3 scale keeps Sxx/Sxy within BIGINT at any replay
    scale the probe uses."""
    ev = load_events(spark, sf_dir)
    bkt = (
        ev.groupBy("event_type", F.expr(f"ts div {HOUR_NS}").alias("hb"))
        .agg(
            F.expr(
                "sum(cast(floor(value * 1e4 + 0.5) as bigint)) "
                "div (10 * count(*))"
            ).alias("m")
        )
        # one physical build of the bucket relation for all lag joins
        # (bounded: |types| x |hours in span|)
        .localCheckpoint(eager=True)
    )
    out = None
    for k in ACF_LAGS:
        x = bkt.select("event_type", F.col("hb").alias("xb"), F.col("m").alias("xm"))
        y = bkt.select("event_type", F.col("hb").alias("yb"), F.col("m").alias("ym"))
        j = x.join(y, ["event_type"]).filter(F.col("yb") == F.col("xb") + k)
        s = j.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("xm").alias("sx"),
            F.sum("ym").alias("sy"),
            F.sum(F.col("xm") * F.col("ym")).alias("sxy"),
            F.sum(F.col("xm") * F.col("xm")).alias("sxx"),
            F.sum(F.col("ym") * F.col("ym")).alias("syy"),
        )
        part = s.select("event_type", F.lit(k).cast("long").alias("lag"), "n_pairs",
                        "sx", "sy", "sxy", "sxx", "syy")
        out = part if out is None else out.unionByName(part)
    nd = F.col("n_pairs").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = F.sqrt(
        (nd * F.col("sxx").cast("double")
         - F.col("sx").cast("double") * F.col("sx").cast("double"))
        * (nd * F.col("syy").cast("double")
           - F.col("sy").cast("double") * F.col("sy").cast("double"))
    )
    return out.select(
        "event_type",
        "lag",
        "n_pairs",
        F.floor(num / den * 1e6 + F.lit(0.5)).cast("long").alias("r_e6"),
    )


# --- Multi-touch attribution: first/last-touch revenue per channel -----


@register(
    "q_events_attribution",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type,
             CAST(epoch_ns(ts) AS BIGINT) // {NS} AS ts_sec,
             CAST(FLOOR(value * 1e4 + 0.5) AS BIGINT) AS v_e4
      FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN LAG(ts_sec) OVER w IS NULL
                       OR ts_sec - LAG(ts_sec) OVER w > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
    ),
    sess AS (
      SELECT *,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts_sec, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ),
    touched AS (
      SELECT *,
             FIRST_VALUE(event_type) OVER ws AS first_touch,
             COALESCE(LAST_VALUE(
               CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER (PARTITION BY user_id, sid
                 ORDER BY ts_sec, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               'direct') AS last_touch
      FROM sess
      WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts_sec, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    purch AS (SELECT * FROM touched WHERE event_type = 'purchase'),
    ft AS (SELECT first_touch AS channel, COUNT(*) AS n_first,
                  SUM(v_e4) AS first_touch_value_e4
           FROM purch GROUP BY 1),
    lt AS (SELECT last_touch AS channel, COUNT(*) AS n_last,
                  SUM(v_e4) AS last_touch_value_e4
           FROM purch GROUP BY 1)
    SELECT COALESCE(ft.channel, lt.channel) AS channel,
           CAST(COALESCE(n_first, 0) AS BIGINT) AS n_first,
           CAST(COALESCE(first_touch_value_e4, 0) AS BIGINT)
             AS first_touch_value_e4,
           CAST(COALESCE(n_last, 0) AS BIGINT) AS n_last,
           CAST(COALESCE(last_touch_value_e4, 0) AS BIGINT)
             AS last_touch_value_e4
    FROM ft FULL OUTER JOIN lt ON ft.channel = lt.channel
    """,
)
def q_events_attribution(spark, sf_dir):
    """Multi-touch marketing attribution: sessionize each user's
    timeline (the q_events_sessionize 30-min-gap rule), then credit
    every purchase's revenue to (a) the session's FIRST event type
    (first-touch) and (b) the most recent non-purchase event type
    before the purchase (last-touch; 'direct' when the purchase opens
    its session). Per channel: purchase counts and exact fixed-point
    revenue under both models — the two ends of the attribution
    spectrum a marketing warehouse reports side by side.

    Every window is PARTITIONED by user (and session) and ordered by
    the unique (ts, event_id) key; revenue is e4 fixed point so the
    channel sums are order-free exact integers. The last-touch carry
    uses last(ignorenulls) over a GROWING frame — the O(n) direction
    (the shrinking-frame form is the measured O(n^2) trap from round
    7). Scale shape: one user-partitioned window stack, two
    channel-sized aggregates, one channel-sized outer join."""
    ev = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        "ts_sec",
        F.floor(F.col("value") * 1e4 + F.lit(0.5)).cast("long").alias("v_e4"),
    )
    wu = W.partitionBy("user_id").orderBy("ts_sec", "event_id")
    prev_sec = F.lag("ts_sec").over(wu)
    new_session = F.when(
        prev_sec.isNull() | ((F.col("ts_sec") - prev_sec) > 1800), 1
    ).otherwise(0)
    sess = ev.withColumn("new_session", new_session).withColumn(
        "sid",
        F.sum("new_session").over(
            wu.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    ws = W.partitionBy("user_id", "sid").orderBy("ts_sec", "event_id")
    touched = sess.withColumn(
        "first_touch",
        F.first("event_type").over(
            ws.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    ).withColumn(
        "last_touch",
        F.coalesce(
            F.last(
                F.when(F.col("event_type") != "purchase", F.col("event_type")),
                ignorenulls=True,
            ).over(ws.rowsBetween(W.unboundedPreceding, -1)),
            F.lit("direct"),
        ),
    )
    purch = touched.filter(F.col("event_type") == "purchase")
    ft = purch.groupBy(F.col("first_touch").alias("channel")).agg(
        F.count(F.lit(1)).alias("n_first"),
        F.sum("v_e4").alias("first_touch_value_e4"),
    )
    lt = purch.groupBy(F.col("last_touch").alias("channel")).agg(
        F.count(F.lit(1)).alias("n_last"),
        F.sum("v_e4").alias("last_touch_value_e4"),
    )
    return (
        ft.join(lt, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce("n_first", F.lit(0)).cast("long").alias("n_first"),
            F.coalesce("first_touch_value_e4", F.lit(0))
            .cast("long")
            .alias("first_touch_value_e4"),
            F.coalesce("n_last", F.lit(0)).cast("long").alias("n_last"),
            F.coalesce("last_touch_value_e4", F.lit(0))
            .cast("long")
            .alias("last_touch_value_e4"),
        )
    )


# --- Bot / automation detection via inter-event cadence regularity -------

BOT_MIN_GAPS = 5          # users with fewer gaps are unclassifiable
BOT_CV2_E6 = 50_000       # cv^2 < 0.05 (cv < ~0.22): metronome-like cadence
MIN_NS_GAP = 60 * NS      # gap unit: whole minutes (keeps sum(g^2) in int64)


@register(
    "q_events_bot_regularity",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             (CAST(epoch_ns(ts) AS BIGINT)
              - LAG(CAST(epoch_ns(ts) AS BIGINT)) OVER (
                  PARTITION BY user_id ORDER BY epoch_ns(ts), event_id))
             // {MIN_NS_GAP} AS gap_min
      FROM events
    ),
    s AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(SUM(gap_min) AS BIGINT) AS sg,
             CAST(SUM(gap_min * gap_min) AS BIGINT) AS sgg
      FROM seq WHERE gap_min IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n_gaps, sg AS sum_gap_min,
           CAST(FLOOR((CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)
                       - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
                      / (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
                      * 1e6 + 0.5) AS BIGINT) AS cv2_e6,
           (CAST(FLOOR((CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)
                        - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
                       / (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
                       * 1e6 + 0.5) AS BIGINT) < {BOT_CV2_E6})
             AS bot_like
    FROM s
    WHERE n_gaps >= {BOT_MIN_GAPS} AND sg > 0
    """,
)
def q_events_bot_regularity(spark, sf_dir):
    """Automation screen over per-user event cadence: a human's
    inter-event gaps are bursty (squared coefficient of variation >> 0),
    a cron job's are metronome-regular (cv^2 near 0). Flags users whose
    cadence regularity crosses BOT_CV2_E6 — the abuse-filtering pass a
    training pipeline runs over engagement logs before trusting them.

    cv^2 = var/mean^2 = (n*Σg² - (Σg)²)/(Σg)² is computed from exact
    BIGINT moment sums of whole-MINUTE gaps (minute units keep Σg² well
    inside int64 even at millions of events per user; the linreg_trend
    moment-sum recipe), then one identical double expression tree +
    fixed-point on both engines. The lag runs in a user-PARTITIONED
    window ordered by (ts, event_id) — a deterministic total order even
    under timestamp ties — and everything after is one map-side-
    combinable aggregate. Degenerate users (all events inside one
    minute, sg=0) and thin users (< BOT_MIN_GAPS gaps) are excluded on
    both sides."""
    ev = load_events(spark, sf_dir)
    seq = ev.select(
        "user_id",
        F.expr(f"(ts - lag(ts) over (partition by user_id order by ts, event_id)) div {MIN_NS_GAP}").alias("gap_min"),
    )
    s = (
        seq.filter(F.col("gap_min").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_min").alias("sg"),
            F.sum(F.col("gap_min") * F.col("gap_min")).alias("sgg"),
        )
        .filter((F.col("n_gaps") >= BOT_MIN_GAPS) & (F.col("sg") > 0))
    )
    nd = F.col("n_gaps").cast("double")
    sgd = F.col("sg").cast("double")
    cv2 = (nd * F.col("sgg").cast("double") - sgd * sgd) / (sgd * sgd)
    cv2_e6 = F.floor(cv2 * 1e6 + F.lit(0.5)).cast("long")
    return s.select(
        "user_id",
        "n_gaps",
        F.col("sg").alias("sum_gap_min"),
        cv2_e6.alias("cv2_e6"),
        (cv2_e6 < BOT_CV2_E6).alias("bot_like"),
    )


# --- Cohort revenue triangle ----------------------------------------------

WEEK_S = 604800


@register(
    "q_events_cohort_revenue",
    oracle=f"""
    WITH weekly AS (
      SELECT user_id,
             CAST(FLOOR(EPOCH(ts) / {WEEK_S}) AS BIGINT) AS week,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev_e2
      FROM events GROUP BY user_id, week
    ),
    fw AS (
      SELECT user_id, MIN(week) AS cohort_week FROM weekly GROUP BY user_id
    ),
    cell AS (
      SELECT f.cohort_week, w.week - f.cohort_week AS age,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(w.rev_e2) AS BIGINT) AS rev_e2
      FROM weekly w JOIN fw f USING (user_id)
      GROUP BY 1, 2
    ),
    base AS (
      SELECT cohort_week, n_users AS n0 FROM cell WHERE age = 0
    )
    SELECT c.cohort_week, c.age, c.n_users, c.rev_e2,
           CAST(c.n_users * 10000 // b.n0 AS BIGINT) AS retained_bp
    FROM cell c JOIN base b USING (cohort_week)
    """,
)
def q_events_cohort_revenue(spark, sf_dir):
    """Full cohort revenue triangle — every first-seen-week cohort by
    age-in-weeks, with user counts, fixed-point revenue mass, and the
    retention rate in basis points vs the cohort's week 0. Generalizes
    q_events_retention (which tracks only the FIRST cohort's user
    counts) to the complete cohort x age grid a growth dashboard plots.

    Entirely integer: per-(user, week) revenue is fixed-pointed to e2
    BEFORE any sum, weeks are floored epoch divisions, and the
    basis-point ratio is floor division of positive BIGINTs (Spark div
    and DuckDB // agree on non-negatives). Plan shape: two
    map-side-combinable aggregates (user x week, then first-week per
    user — the second's input is already user-collapsed), one shuffle
    join back on user_id, the cohort x age rollup, and a join to the
    age-0 relation whose size is |distinct weeks| — broadcastable at
    any corpus scale."""
    ev = load_events(spark, sf_dir)
    weekly = (
        ev.select(
            "user_id",
            F.expr(f"ts_sec div {WEEK_S}").alias("week"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v_e2"),
        )
        .groupBy("user_id", "week")
        .agg(F.sum("v_e2").alias("rev_e2"))
    )
    fw = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cell = (
        weekly.join(fw, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("age"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("rev_e2").alias("rev_e2"),
        )
    )
    base = cell.filter(F.col("age") == 0).select(
        "cohort_week", F.col("n_users").alias("n0")
    )
    return (
        cell.join(F.broadcast(base), "cohort_week")
        .select(
            "cohort_week",
            "age",
            "n_users",
            "rev_e2",
            F.expr("n_users * 10000 div n0").alias("retained_bp"),
        )
    )


# --- Kleinberg two-state burst detection (exact Viterbi) -----------------

BURST_S = 2.0  # burst-state rate multiplier (p1 = min(2*p0, .9999))
BURST_GAMMA_E6 = 2_000_000  # 0->1 transition cost (2.0 in e6 fixed point)


def _burst_oracle() -> str:
    return f"""
    WITH RECURSIVE hourly AS (
      SELECT event_type,
             CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS h,
             CAST(COUNT(*) AS BIGINT) AS r
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT h, SUM(r) AS d FROM hourly GROUP BY 1),
    seq AS (
      SELECT hourly.event_type, hourly.h, hourly.r, tot.d,
             ROW_NUMBER() OVER (PARTITION BY hourly.event_type
               ORDER BY hourly.h) AS i
      FROM hourly JOIN tot ON tot.h = hourly.h
    ),
    rates AS (
      SELECT event_type,
             LEAST(CAST(SUM(r) AS DOUBLE) / CAST(SUM(d) AS DOUBLE),
                   0.9999) AS p0,
             LEAST(CAST(SUM(r) AS DOUBLE) / CAST(SUM(d) AS DOUBLE)
                   * {BURST_S}, 0.9999) AS p1
      FROM seq GROUP BY 1
    ),
    costs AS (
      SELECT s.event_type, s.h, s.r, s.d, s.i,
             CAST(FLOOR(-(CAST(s.r AS DOUBLE) * LN(p0)
                 + CAST(s.d - s.r AS DOUBLE) * LN(1 - p0)) * 1e6 + 0.5)
               AS BIGINT) AS k0,
             CAST(FLOOR(-(CAST(s.r AS DOUBLE) * LN(p1)
                 + CAST(s.d - s.r AS DOUBLE) * LN(1 - p1)) * 1e6 + 0.5)
               AS BIGINT) AS k1
      FROM seq s JOIN rates ON rates.event_type = s.event_type
    ),
    dp AS (
      SELECT event_type, i, k0 AS c0, k1 + {BURST_GAMMA_E6} AS c1,
             '0' AS p0path, '1' AS p1path
      FROM costs WHERE i = 1
      UNION ALL
      SELECT c.event_type, c.i,
             c.k0 + LEAST(dp.c0, dp.c1),
             c.k1 + LEAST(dp.c0 + {BURST_GAMMA_E6}, dp.c1),
             CASE WHEN dp.c0 <= dp.c1 THEN dp.p0path ELSE dp.p1path END
               || '0',
             CASE WHEN dp.c0 + {BURST_GAMMA_E6} <= dp.c1
                  THEN dp.p0path ELSE dp.p1path END || '1'
      FROM dp JOIN costs c
        ON c.event_type = dp.event_type AND c.i = dp.i + 1
    ),
    last AS (SELECT event_type, MAX(i) AS mi FROM dp GROUP BY 1),
    fin AS (
      SELECT dp.event_type,
             CASE WHEN dp.c0 <= dp.c1 THEN dp.p0path ELSE dp.p1path END
               AS path
      FROM dp JOIN last
        ON last.event_type = dp.event_type AND dp.i = last.mi
    )
    SELECT s.event_type, s.h AS bucket_hour, s.r AS n_events, s.d AS n_total,
           CAST(substr(f.path, CAST(s.i AS INT), 1) AS BIGINT) AS burst
    FROM seq s JOIN fin f ON f.event_type = s.event_type
    """


@register("q_events_burst_kleinberg", oracle=_burst_oracle())
def q_events_burst_kleinberg(spark, sf_dir):
    """Kleinberg two-state burst detection per event type: hourly
    (count, total) pairs feed a binomial-cost automaton — baseline rate
    p0 = share of the corpus, burst rate p1 = BURST_S*p0 — and the
    EXACT minimum-cost (Viterbi) state path marks which hours sit in a
    burst, paying BURST_GAMMA to enter and nothing to leave. This is
    the principled upgrade of thresholded z-scores: isolated spikes are
    absorbed unless sustained long enough to amortize the entry cost.

    Determinism contract: the binomial coefficient term is dropped from
    the per-hour cost (state-independent, cancels in every comparison),
    each remaining cost -(r*ln(p) + (d-r)*ln(1-p)) is snapped to e6
    fixed point per (hour, state) BEFORE accumulation — identical
    closed-form doubles from exact BIGINT counts on both engines, 1-ulp
    libm noise far below e6 granularity (dsir-log2 precedent) — and the
    DP then runs in BIGINT arithmetic with ties broken toward the
    baseline state, so the path is bit-deterministic. The oracle
    replays the identical DP as a recursive CTE that carries each
    state's full argmin path as a string.

    Scale shape: hourly aggregation and the rate scalars are map-side
    combinable; the inherently-sequential Viterbi runs applyInPandas
    per event TYPE (state = two BIGINTs per step over the |hours|-sized
    AGGREGATE, never raw events), so 10k types on 1000 executors
    parallelize per key while each key's pass stays linear."""
    import numpy as np
    import pandas as pd

    ev = load_events(spark, sf_dir)
    hour_ns = 3600 * NS
    hourly = (
        ev.withColumn("h", F.expr(f"ts div {hour_ns}"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("r"))
    )
    tot = hourly.groupBy("h").agg(F.sum("r").alias("d"))
    g = hourly.join(tot, "h").select("event_type", "h", "r", "d")

    def viterbi(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("h").reset_index(drop=True)
        r = pdf["r"].to_numpy(dtype=np.int64)
        d = pdf["d"].to_numpy(dtype=np.int64)
        # p0 capped like p1: a single-event-type corpus gives
        # p0 = 1.0 and the cost term (d-r)*log(1-p0) becomes 0 * -inf
        # = NaN, whose BIGINT cast is engine-defined (numpy astype
        # yields an arbitrary value, DuckDB CAST errors). The cap is
        # applied identically in the oracle's rates CTE, so degenerate
        # corpora stay finite and bit-identical on both engines.
        p0 = min(float(r.sum()) / float(d.sum()), 0.9999)
        p1 = min(p0 * BURST_S, 0.9999)
        rf, df_ = r.astype(np.float64), d.astype(np.float64)
        k0 = np.floor(
            -(rf * np.log(p0) + (df_ - rf) * np.log(1 - p0)) * 1e6 + 0.5
        ).astype(np.int64)
        k1 = np.floor(
            -(rf * np.log(p1) + (df_ - rf) * np.log(1 - p1)) * 1e6 + 0.5
        ).astype(np.int64)
        n = len(r)
        c0, c1 = int(k0[0]), int(k1[0]) + BURST_GAMMA_E6
        back: list[tuple[int, int]] = [(0, 1)]
        for t in range(1, n):
            pred0 = 0 if c0 <= c1 else 1
            pred1 = 0 if c0 + BURST_GAMMA_E6 <= c1 else 1
            nc0 = int(k0[t]) + min(c0, c1)
            nc1 = int(k1[t]) + min(c0 + BURST_GAMMA_E6, c1)
            back.append((pred0, pred1))
            c0, c1 = nc0, nc1
        state = 0 if c0 <= c1 else 1
        path = np.empty(n, dtype=np.int64)
        for t in range(n - 1, -1, -1):
            path[t] = state
            state = back[t][state]
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "bucket_hour": pdf["h"],
                "n_events": pdf["r"],
                "n_total": pdf["d"],
                "burst": path,
            }
        )

    return g.groupBy("event_type").applyInPandas(
        viterbi,
        "event_type string, bucket_hour long, n_events long,"
        " n_total long, burst long",
    )


@register(
    "q_events_two_proportion_z",
    oracle="""
    WITH g AS (
      SELECT user_id % 2 AS grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
               AS BIGINT) AS conv
      FROM events GROUP BY 1
    ),
    ab AS (
      SELECT MAX(CASE WHEN grp = 0 THEN n END) AS na,
             MAX(CASE WHEN grp = 0 THEN conv END) AS ca,
             MAX(CASE WHEN grp = 1 THEN n END) AS nb,
             MAX(CASE WHEN grp = 1 THEN conv END) AS cb
      FROM g
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
           CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
           CAST(FLOOR(
             (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
              - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
             / SQRT((CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
                    * (1 - CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
                    * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE)))
             * 1e6 + 0.5) AS BIGINT) AS z_e6
    FROM ab
    WHERE na > 0 AND nb > 0 AND ca + cb > 0 AND ca + cb < na + nb
    """,
)
def q_events_two_proportion_z(spark, sf_dir):
    """Two-proportion z-test on conversion rate between the two halves
    of a deterministic user-id split — the A/B-test primitive
    completing the inference family (Welch compares means,
    Mann-Whitney ranks, chi-square contingency tables, this compares
    binomial rates under the pooled-variance normal approximation).

    Counts are exact BIGINTs from one map-side-combinable aggregation
    over a 2-row group; z is ONE identical closed-form expression over
    them (IEEE sqrt correctly rounded), snapped to e6 fixed point, and
    the all-converted / none-converted degeneracies (pooled variance 0)
    are filtered identically on both engines."""
    ev = load_events(spark, sf_dir)
    g = (
        ev.select((F.col("user_id") % 2).alias("grp"), "event_type")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("long")
            .alias("conv"),
        )
    )
    pick = lambda col, v: F.max(F.when(F.col("grp") == v, F.col(col)))
    ab = g.agg(
        pick("n", 0).alias("na"),
        pick("conv", 0).alias("ca"),
        pick("n", 1).alias("nb"),
        pick("conv", 1).alias("cb"),
    )
    nad, nbd = F.col("na").cast("double"), F.col("nb").cast("double")
    cad, cbd = F.col("ca").cast("double"), F.col("cb").cast("double")
    pool = (F.col("ca") + F.col("cb")).cast("double") / (
        F.col("na") + F.col("nb")
    ).cast("double")
    z = (cad / nad - cbd / nbd) / F.sqrt(
        pool * (1 - pool) * (F.lit(1.0) / nad + F.lit(1.0) / nbd)
    )
    return ab.filter(
        (F.col("na") > 0)
        & (F.col("nb") > 0)
        & (F.col("ca") + F.col("cb") > 0)
        & (F.col("ca") + F.col("cb") < F.col("na") + F.col("nb"))
    ).select(
        F.col("na").cast("long").alias("n_a"),
        F.col("ca").cast("long").alias("conv_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("cb").cast("long").alias("conv_b"),
        F.floor(z * F.lit(1e6) + F.lit(0.5)).cast("long").alias("z_e6"),
    )


# --- Kendall tau-b: rank concordance on the hourly series -----------------

TS_MAX_BUCKETS = 1024  # series-length cap for the pairwise statistics


def _span_bucket_hours(ev) -> int:
    """Bucket width in HOURS such that the (min ts, max ts) span yields
    at most ~TS_MAX_BUCKETS buckets: width = span_hours div 1024 + 1.
    One exact-integer scalar aggregate (same 1-row shape as the
    linreg/rfm corpus-timestamp attaches); at the fixture's 30-day span
    the width is 1 hour, i.e. the plain hourly series."""
    r = ev.agg(
        F.expr(
            f"(max(ts) - min(ts)) div {3600 * NS} div {TS_MAX_BUCKETS} + 1"
        ).alias("wh")
    ).collect()[0]
    return int(r.wh)


@register(
    "q_events_kendall_tau",
    oracle="""
    WITH w AS (  -- span-adaptive bucket width: series length <= TS_MAX
      SELECT (MAX(epoch_ns(ts)) - MIN(epoch_ns(ts)))
               // (3600000000000 * 1024) + 1 AS wh
      FROM events
    ),
    hourly AS (
      SELECT event_type,
             CAST(epoch_ns(ts) // (3600000000000 * wh) AS BIGINT) AS b,
             SUM(CAST(FLOOR(value * 1e4 + 0.5) AS BIGINT)) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events, w GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type,
             CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END AS conc,
             CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      FROM hourly a JOIN hourly b
        ON a.event_type = b.event_type AND b.b > a.b
    ),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(conc) AS BIGINT) AS conc,
             CAST(SUM(disc) AS BIGINT) AS disc,
             CAST(SUM(tx) AS BIGINT) AS tx, CAST(SUM(ty) AS BIGINT) AS ty
      FROM pairs GROUP BY 1
    )
    SELECT event_type, n_pairs, conc, disc,
           CAST(FLOOR(
             (CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
             / SQRT(CAST(n_pairs - tx AS DOUBLE)
                    * CAST(n_pairs - ty AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
             AS tau_e6
    FROM m WHERE n_pairs - tx > 0 AND n_pairs - ty > 0
    """,
)
def q_events_kendall_tau(spark, sf_dir):
    """Kendall tau-b rank concordance between an event type's hourly
    LOAD (event count) and hourly VOLUME (fixed-point value sum) — the
    pair-counting cousin of q_agg_spearman_rho, robust to any monotone
    transform of either series and exact under ties (the tau-b
    denominator removes tied pairs per dimension).

    The all-pairs step is NOT a blowup in corpus rows OR in retention
    span: it self-joins the bucket AGGREGATE, and the bucket width
    adapts to the observed span (one exact-integer scalar,
    _span_bucket_hours) so the series never exceeds ~TS_MAX_BUCKETS
    points — at the fixture's 30-day span that is the plain hourly
    series, at a 16x-longer replay the buckets coarsen to 12h and the
    pair count stays constant (probe-measured: fixed 1h width ran
    exponent 1.49; the cap flattens it). Concordance is decided on exact
    BIGINTs (e4 per-row fixed-point BEFORE the hourly sum), the four
    pair tallies are integer sums, and only the final tau is a double —
    one identical closed form snapped to e6, degenerate (all-tied)
    series filtered identically on both engines."""
    ev = load_events(spark, sf_dir)
    # span-adaptive width: ONE exact-integer scalar (bucket hours) so the
    # series never exceeds ~1024 points however long retention grows —
    # the knob that keeps the pair stage span-BOUNDED instead of span^2
    # (the weak-scaling probe measured exponent 1.49 on 16x time-shifted
    # copies with a fixed 1h width; bounded width flattens it)
    wh = _span_bucket_hours(ev)
    hourly = (
        ev.withColumn("b", F.expr(f"ts div {3600 * NS} div {wh}"))
        .groupBy("event_type", "b")
        .agg(
            F.sum(
                F.floor(F.col("value") * F.lit(1e4) + F.lit(0.5)).cast("long")
            ).alias("x"),
            F.count(F.lit(1)).cast("long").alias("y"),
        )
        .localCheckpoint(eager=False)  # both sides of the pair join
    )
    a = hourly.select(
        "event_type", F.col("b").alias("b1"),
        F.col("x").alias("x1"), F.col("y").alias("y1"),
    )
    b = hourly.select(
        "event_type", F.col("b").alias("b2"),
        F.col("x").alias("x2"), F.col("y").alias("y2"),
    )
    prod = (F.col("x2") - F.col("x1")) * (F.col("y2") - F.col("y1"))
    pairs = a.join(b, "event_type").filter(F.col("b2") > F.col("b1"))
    m = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(prod > 0, 1).otherwise(0)).cast("long").alias("conc"),
        F.sum(F.when(prod < 0, 1).otherwise(0)).cast("long").alias("disc"),
        F.sum(F.when(F.col("x1") == F.col("x2"), 1).otherwise(0))
        .cast("long").alias("tx"),
        F.sum(F.when(F.col("y1") == F.col("y2"), 1).otherwise(0))
        .cast("long").alias("ty"),
    )
    tau = (F.col("conc").cast("double") - F.col("disc").cast("double")) / F.sqrt(
        (F.col("n_pairs") - F.col("tx")).cast("double")
        * (F.col("n_pairs") - F.col("ty")).cast("double")
    )
    return m.filter(
        (F.col("n_pairs") - F.col("tx") > 0) & (F.col("n_pairs") - F.col("ty") > 0)
    ).select(
        "event_type", "n_pairs", "conc", "disc",
        F.floor(tau * F.lit(1e6) + F.lit(0.5)).cast("long").alias("tau_e6"),
    )


# --- Theil-Sen robust trend: median of pairwise hourly slopes -------------


@register(
    "q_events_theil_sen",
    oracle="""
    WITH w AS (
      SELECT (MAX(epoch_ns(ts)) - MIN(epoch_ns(ts)))
               // (3600000000000 * 1024) + 1 AS wh
      FROM events
    ),
    hourly AS (
      SELECT event_type,
             CAST(epoch_ns(ts) // (3600000000000 * wh) AS BIGINT) AS b,
             SUM(CAST(FLOOR(value * 1e4 + 0.5) AS BIGINT)) AS s,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events, w GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.event_type, a.b AS b1, q.b AS b2,
             (CAST(q.s AS DOUBLE) / q.c - CAST(a.s AS DOUBLE) / a.c)
               / CAST(q.b - a.b AS DOUBLE) AS slope
      FROM hourly a JOIN hourly q
        ON a.event_type = q.event_type AND q.b > a.b
    ),
    ranked AS (
      SELECT event_type, slope,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY slope, b1, b2) AS rn
      FROM slopes
    )
    SELECT event_type, n_pairs,
           CAST(FLOOR(slope * 1e6 + 0.5) AS BIGINT) AS sen_slope_e6
    FROM ranked WHERE rn = (n_pairs + 1) // 2
    """,
)
def q_events_theil_sen(spark, sf_dir):
    """Theil-Sen robust trend per event type: the MEDIAN of all pairwise
    slopes of the hourly-mean series — the estimator that shrugs off up
    to ~29% outlier hours where the OLS fit (q_events_linreg_trend) gets
    dragged. The median is taken discretely (an actual pair's slope, not
    an interpolation), with (slope, bucket pair) as the total order.

    Pair fan-out is bounded exactly as in q_events_kendall_tau: the
    self-join runs on the span-adaptive bucket AGGREGATE (width from
    _span_bucket_hours caps the series at ~TS_MAX_BUCKETS points), so
    the pair count — and the per-type median-selection window — stay
    CONSTANT in both corpus rows and retention span.
    Hourly means are one double division of exact BIGINTs (e4 per-row
    fixed-point before the sum), the slope is the identical three-op
    expression tree on both engines (correctly-rounded IEEE ops over
    identical inputs), so sorting doubles — which never does arithmetic
    — agrees bit-for-bit, and the selected median snaps to e6."""
    ev = load_events(spark, sf_dir)
    wh = _span_bucket_hours(ev)  # same span cap as kendall_tau: the
    # probe measured exponent 2.13 at a fixed 1h width on 16x
    # time-shifted copies (n^2 pairs AND a span-sized sort window);
    # bounded series length makes both constant
    hourly = (
        ev.withColumn("b", F.expr(f"ts div {3600 * NS} div {wh}"))
        .groupBy("event_type", "b")
        .agg(
            F.sum(
                F.floor(F.col("value") * F.lit(1e4) + F.lit(0.5)).cast("long")
            ).alias("s"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        .localCheckpoint(eager=False)
    )
    a = hourly.select(
        "event_type", F.col("b").alias("b1"),
        F.col("s").alias("s1"), F.col("c").alias("c1"),
    )
    q = hourly.select(
        "event_type", F.col("b").alias("b2"),
        F.col("s").alias("s2"), F.col("c").alias("c2"),
    )
    slope = (
        F.col("s2").cast("double") / F.col("c2")
        - F.col("s1").cast("double") / F.col("c1")
    ) / (F.col("b2") - F.col("b1")).cast("double")
    slopes = (
        a.join(q, "event_type")
        .filter(F.col("b2") > F.col("b1"))
        .select("event_type", "b1", "b2", slope.alias("slope"))
    )
    wp = W.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.count(F.lit(1)).over(wp).alias("n_pairs"),
        F.row_number()
        .over(wp.orderBy("slope", "b1", "b2"))
        .alias("rn"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n_pairs + 1) div 2")
    ).select(
        "event_type",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.floor(F.col("slope") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("sen_slope_e6"),
    )


# --- Tukey IQR outlier audit ----------------------------------------------


@register(
    "q_quality_outlier_iqr",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(FLOOR(value * 1e4 + 0.5) AS BIGINT) AS v_e4
      FROM events
    ),
    q AS (
      SELECT event_type,
             quantile_disc(v_e4, 0.25) AS q1, quantile_disc(v_e4, 0.75) AS q3,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM v GROUP BY 1
    )
    SELECT v.event_type, q.q1 AS q1_e4, q.q3 AS q3_e4, q.n,
           CAST(SUM(CASE WHEN 2 * v_e4 < 2 * q1 - 3 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN 2 * v_e4 > 2 * q3 + 3 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(FLOOR(CAST(SUM(CASE WHEN 2 * v_e4 < 2 * q1 - 3 * (q3 - q1)
                                    OR 2 * v_e4 > 2 * q3 + 3 * (q3 - q1)
                               THEN 1 ELSE 0 END) AS DOUBLE)
                / q.n * 1e6 + 0.5) AS BIGINT) AS out_rate_e6
    FROM v JOIN q ON q.event_type = v.event_type
    GROUP BY 1, 2, 3, 4
    """,
)
def q_quality_outlier_iqr(spark, sf_dir):
    """Tukey-fence outlier audit per event type: exact quartiles, the
    1.5*IQR fences, and the fraction of rows falling outside — the
    data-quality profiler's robust-tail check, companion to
    q_quality_expectations' schema assertions.

    Quartiles come from percentile_disc over e4 fixed-point BIGINTs —
    a DISCRETE order statistic (an actual value, no interpolation
    arithmetic), bit-exact on both engines. The fence comparison
    2*v < 2*q1 - 3*IQR keeps the 1.5 multiplier in pure integer
    arithmetic. Two passes over events (quantile agg, then a
    broadcast-joined counting agg), both map-side combinable; the
    quartile table is one row per type."""
    ev = load_events(spark, sf_dir)
    v = ev.select(
        "event_type",
        F.floor(F.col("value") * F.lit(1e4) + F.lit(0.5))
        .cast("long")
        .alias("v_e4"),
    )
    q = v.groupBy("event_type").agg(
        # percentile_disc picks an ACTUAL element but returns DOUBLE in
        # Spark — snap back to the exact BIGINT it selected
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY v_e4)")
        .cast("long")
        .alias("q1"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY v_e4)")
        .cast("long")
        .alias("q3"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    j = v.join(F.broadcast(q), "event_type")  # q: one row per event type
    low = 2 * F.col("v_e4") < 2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1"))
    high = 2 * F.col("v_e4") > 2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1"))
    return j.groupBy(
        "event_type",
        F.col("q1").alias("q1_e4"),
        F.col("q3").alias("q3_e4"),
        "n",
    ).agg(
        F.sum(F.when(low, 1).otherwise(0)).cast("long").alias("n_low"),
        F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("n_high"),
        F.floor(
            F.sum(F.when(low | high, 1).otherwise(0)).cast("double")
            / F.col("n")
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("out_rate_e6"),
    )


# --- Hourly event-mix entropy ----------------------------------------------


@register(
    "q_events_entropy_hourly",
    oracle="""
    WITH c AS (
      SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS bucket_hour,
             event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    n AS (SELECT bucket_hour, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1)
    SELECT c.bucket_hour, n.n AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           -SUM(CAST(FLOOR((CAST(c AS DOUBLE) / n)
                * LN(CAST(c AS DOUBLE) / n) * 1e9 + 0.5) AS BIGINT))
             AS entropy_e9
    FROM c JOIN n ON n.bucket_hour = c.bucket_hour
    GROUP BY 1, 2
    """,
)
def q_events_entropy_hourly(spark, sf_dir):
    """Shannon entropy of the event-type mix per hour — the traffic
    anomaly detector's base signal: a healthy hour shows the usual
    five-way mix (entropy near ln 5), an incident hour collapses to one
    dominant type (entropy toward 0) long before any volume alarm
    fires.

    Per-term fixed-point discipline: each p*ln(p) term is computed from
    exact BIGINT counts as one identical double expression and snapped
    to e9 BEFORE summation, so the per-hour sum is order-proof integer
    arithmetic (emitted as the e9 fixed-point sum, negated). Shape: two
    map-side-combinable aggregations and one hour-keyed equi-join —
    output is |hours| rows, bounded by the retention window."""
    ev = load_events(spark, sf_dir)
    c = (
        ev.withColumn("bucket_hour", F.expr(f"ts div {3600 * NS}"))
        .groupBy("bucket_hour", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n = c.groupBy("bucket_hour").agg(F.sum("c").cast("long").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    term_e9 = F.floor(p * F.log(p) * F.lit(1e9) + F.lit(0.5)).cast("long")
    return (
        c.join(n, "bucket_hour")
        .groupBy("bucket_hour", F.col("n").alias("n_events"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            (-F.sum(term_e9)).cast("long").alias("entropy_e9"),
        )
    )


# --- Week-over-week deltas --------------------------------------------------


@register(
    "q_events_wow_delta",
    oracle="""
    WITH w AS (
      SELECT event_type,
             -- 604800e9 as a BIGINT literal: DuckDB folds 7*86400*1e9
             -- in INT32 and overflows
             CAST(epoch_ns(ts) // CAST(604800000000000 AS BIGINT)
                  AS BIGINT) AS wk,
             CAST(COUNT(*) AS BIGINT) AS c,
             SUM(CAST(FLOOR(value * 1e4 + 0.5) AS BIGINT)) AS v_e4
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, wk, c, v_e4,
           LAG(c) OVER (PARTITION BY event_type ORDER BY wk) AS prev_c,
           (c - LAG(c) OVER (PARTITION BY event_type ORDER BY wk)) * 1000000
             // LAG(c) OVER (PARTITION BY event_type ORDER BY wk)
             AS delta_c_e6,
           (v_e4 - LAG(v_e4) OVER (PARTITION BY event_type ORDER BY wk))
             * 1000000
             // LAG(v_e4) OVER (PARTITION BY event_type ORDER BY wk)
             AS delta_v_e6
    FROM w
    """,
)
def q_events_wow_delta(spark, sf_dir):
    """Week-over-week growth report per event type: weekly counts and
    fixed-point value volume with lag-1 percentage deltas — the
    period-over-period dashboard primitive (first week emits NULL
    deltas, like every reporting tool).

    CAREFUL CORNER: the deltas can be NEGATIVE. DuckDB's INTEGER `//`
    truncates toward zero exactly like Spark's `div` (measured:
    -5 // 3 = -1 in DuckDB 1.x; its FLOAT `//` is the one that
    floors), so plain integer div agrees for every sign combination
    here. Counts and volumes are exact BIGINTs
    (value fixed-pointed per row BEFORE the weekly sum). Shape: one
    map-side-combinable weekly aggregate, then lag windows over the
    |weeks|-per-type relation — span-bounded, corpus-constant."""
    ev = load_events(spark, sf_dir)
    wk_ns = 7 * 86400 * NS
    w = (
        ev.withColumn("wk", F.expr(f"ts div {wk_ns}"))
        .groupBy("event_type", "wk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum(
                F.floor(F.col("value") * F.lit(1e4) + F.lit(0.5)).cast("long")
            ).alias("v_e4"),
        )
    )
    win = W.partitionBy("event_type").orderBy("wk")
    out = w.select(
        "event_type",
        "wk",
        "c",
        "v_e4",
        F.lag("c").over(win).alias("prev_c"),
        F.lag("v_e4").over(win).alias("prev_v"),
    )
    return out.select(
        "event_type",
        "wk",
        "c",
        "v_e4",
        "prev_c",
        F.expr("(c - prev_c) * 1000000 div prev_c").alias("delta_c_e6"),
        F.expr("(v_e4 - prev_v) * 1000000 div prev_v").alias("delta_v_e6"),
    )


# --- MAD robust anomaly scan ------------------------------------------------

MAD_K_E4 = 14826  # 1.4826 (normal-consistency constant) in e4 fixed point
MAD_THRESH_E1 = 35  # flag |robust z| > 3.5 (Iglewicz-Hoaglin)


@register(
    "q_events_anomaly_mad",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(FLOOR(value * 1e4 + 0.5) AS BIGINT) AS v_e4
      FROM events
    ),
    med AS (
      SELECT event_type, quantile_disc(v_e4, 0.5) AS med,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM v GROUP BY 1
    ),
    dev AS (
      SELECT v.event_type, med.med, med.n, ABS(v_e4 - med.med) AS d
      FROM v JOIN med ON med.event_type = v.event_type
    ),
    mad AS (
      SELECT event_type, MAX(med) AS med, MAX(n) AS n,
             quantile_disc(d, 0.5) AS mad
      FROM dev GROUP BY 1
    )
    SELECT dev.event_type, mad.med AS med_e4, mad.mad AS mad_e4, mad.n,
           CAST(SUM(CASE WHEN 100000 * dev.d
                              > {MAD_THRESH_E1} * {MAD_K_E4} * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           CAST(FLOOR(CAST(MAX(dev.d) AS DOUBLE)
                / (1.4826 * mad.mad) * 1e6 + 0.5) AS BIGINT)
             AS max_robust_z_e6
    FROM dev JOIN mad ON mad.event_type = dev.event_type
    WHERE mad.mad > 0
    GROUP BY 1, 2, 3, 4
    """,
)
def q_events_anomaly_mad(spark, sf_dir):
    """Median-absolute-deviation robust anomaly scan per event type —
    the estimator-breakdown upgrade of q_events_anomaly_zscore: mean and
    stddev are themselves dragged by the outliers they're supposed to
    flag (masking), while median/MAD have a 50% breakdown point. Flags
    |modified z| > 3.5 per Iglewicz-Hoaglin, with the 1.4826
    normal-consistency constant kept in fixed point.

    Two exact discrete medians (percentile_disc over BIGINTs, snapped
    back to long), then the threshold test 1e5*|dev| > 35*14826*mad in
    pure integer arithmetic — only max_robust_z is a double, ONE
    identical expression over exact integers. Three map-side-combinable
    passes with one-row-per-type broadcasts between them; the
    all-tied degenerate series (mad = 0) is filtered identically on
    both engines."""
    ev = load_events(spark, sf_dir)
    v = ev.select(
        "event_type",
        F.floor(F.col("value") * F.lit(1e4) + F.lit(0.5))
        .cast("long")
        .alias("v_e4"),
    )
    med = v.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v_e4)")
        .cast("long")
        .alias("med"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", "med", "n",
        F.abs(F.col("v_e4") - F.col("med")).alias("d"),
    )
    mad = dev.groupBy("event_type").agg(
        F.max("med").alias("med"),
        F.max("n").alias("n"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY d)")
        .cast("long")
        .alias("mad"),
    )
    j = dev.select("event_type", "d").join(F.broadcast(mad), "event_type")
    flag = (
        F.lit(100000) * F.col("d")
        > F.lit(MAD_THRESH_E1) * F.lit(MAD_K_E4) * F.col("mad")
    )
    return (
        j.filter(F.col("mad") > 0)
        .groupBy(
            "event_type",
            F.col("med").alias("med_e4"),
            F.col("mad").alias("mad_e4"),
            "n",
        )
        .agg(
            F.sum(F.when(flag, 1).otherwise(0)).cast("long").alias("n_anomalies"),
            F.floor(
                F.max("d").cast("double")
                / (F.lit(1.4826) * F.col("mad"))
                * F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("max_robust_z_e6"),
        )
    )


# --- Day-of-week x hour-of-day activity heatmap -----------------------------


@register(
    "q_events_dow_hour_heatmap",
    oracle="""
    WITH c AS (
      SELECT event_type,
             -- 1970-01-01 was a THURSDAY (day 3 of a Monday-zero week): +3
             CAST((epoch_ns(ts) // 86400000000000 + 3) % 7 AS BIGINT) AS dow,
             CAST((epoch_ns(ts) // 3600000000000) % 24 AS BIGINT) AS hod,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, dow, hod, c,
           CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_type
                  ORDER BY c DESC, dow, hod) = 1
                THEN TRUE ELSE FALSE END AS is_peak
    FROM c
    """,
)
def q_events_dow_hour_heatmap(spark, sf_dir):
    """Day-of-week x hour-of-day activity heatmap per event type — the
    operational-calendar view q_events_seasonality_profile's 24-bucket
    profile can't show (weekend vs weekday structure), with the peak
    cell flagged per type by a deterministic (count desc, cell) order.

    Day-of-week from pure integer epoch math (epoch day + 3 mod 7, no
    timezone/calendar functions — the same UTC-pinned arithmetic as the
    chi-square op), so both engines bucket identically. One map-side-
    combinable aggregate to a <= types*168-row grid, then a tiny
    partitioned window. Corpus rows never pass a window."""
    ev = load_events(spark, sf_dir)
    c = (
        ev.select(
            "event_type",
            ((F.expr(f"ts div {86400 * NS}") + 3) % 7).alias("dow"),
            (F.expr(f"ts div {3600 * NS}") % 24).alias("hod"),
        )
        .groupBy("event_type", "dow", "hod")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = W.partitionBy("event_type").orderBy(F.col("c").desc(), "dow", "hod")
    return c.select(
        "event_type",
        F.col("dow").cast("long").alias("dow"),
        F.col("hod").cast("long").alias("hod"),
        "c",
        (F.row_number().over(w) == 1).alias("is_peak"),
    )


# --- Inter-arrival burstiness + memory coefficient -------------------------


@register(
    "q_events_interarrival_stats",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             (epoch_ns(ts)
              - LAG(epoch_ns(ts)) OVER (PARTITION BY event_type
                  ORDER BY epoch_ns(ts), event_id)) // 1000000 AS dt,
             (LEAD(epoch_ns(ts), 1) OVER (PARTITION BY event_type
                  ORDER BY epoch_ns(ts), event_id)
              - epoch_ns(ts)) // 1000000 AS dt_next_raw
      FROM events
    ),
    g AS (
      SELECT event_type,
             CAST(COUNT(dt) AS BIGINT) AS n_gaps,
             CAST(SUM(dt) AS BIGINT) AS s,
             CAST(SUM(dt * dt) AS BIGINT) AS ss
      FROM seq WHERE dt IS NOT NULL GROUP BY 1
    ),
    pairs AS (
      SELECT event_type, dt AS x, dt_next_raw AS y
      FROM seq WHERE dt IS NOT NULL AND dt_next_raw IS NOT NULL
    ),
    p AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n2,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY 1
    )
    SELECT g.event_type, g.n_gaps,
           CAST(FLOOR((SQRT((CAST(g.n_gaps AS DOUBLE) * CAST(g.ss AS DOUBLE)
                             - CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE))
                            / (CAST(g.n_gaps AS DOUBLE)
                               * CAST(g.n_gaps AS DOUBLE)))
                       - CAST(g.s AS DOUBLE) / CAST(g.n_gaps AS DOUBLE))
                      / (SQRT((CAST(g.n_gaps AS DOUBLE) * CAST(g.ss AS DOUBLE)
                               - CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE))
                              / (CAST(g.n_gaps AS DOUBLE)
                                 * CAST(g.n_gaps AS DOUBLE)))
                         + CAST(g.s AS DOUBLE) / CAST(g.n_gaps AS DOUBLE))
                      * 1e6 + 0.5) AS BIGINT) AS burstiness_e6,
           CAST(FLOOR((CAST(p.n2 AS DOUBLE) * CAST(p.sxy AS DOUBLE)
                       - CAST(p.sx AS DOUBLE) * CAST(p.sy AS DOUBLE))
                      / SQRT((CAST(p.n2 AS DOUBLE) * CAST(p.sxx AS DOUBLE)
                              - CAST(p.sx AS DOUBLE) * CAST(p.sx AS DOUBLE))
                             * (CAST(p.n2 AS DOUBLE) * CAST(p.syy AS DOUBLE)
                                - CAST(p.sy AS DOUBLE) * CAST(p.sy AS DOUBLE)))
                      * 1e6 + 0.5) AS BIGINT) AS memory_e6
    FROM g JOIN p ON p.event_type = g.event_type
    WHERE g.s > 0
      AND CAST(p.n2 AS DOUBLE) * CAST(p.sxx AS DOUBLE)
          - CAST(p.sx AS DOUBLE) * CAST(p.sx AS DOUBLE) > 0
      AND CAST(p.n2 AS DOUBLE) * CAST(p.syy AS DOUBLE)
          - CAST(p.sy AS DOUBLE) * CAST(p.sy AS DOUBLE) > 0
    """,
)
def q_events_interarrival_stats(spark, sf_dir):
    """Goh-Barabási temporal-pattern panel per event type: burstiness
    B = (sigma - mu)/(sigma + mu) of inter-arrival times (-1 periodic,
    0 Poisson, ->1 bursty) and the memory coefficient M = Pearson r of
    consecutive gaps (do long gaps follow long gaps?). Kleinberg
    (q_events_burst_kleinberg) LOCATES bursts; this pair of scalars
    CLASSIFIES each stream's arrival process — the standard (B, M)
    phase plot for human-activity vs machine traffic.

    Gaps are exact integer milliseconds ((ts_ns - prev_ns) div 1e6
    under a deterministic (ts, event_id) order); all moments are exact
    BIGINT sums, with B and M each ONE identical double tree over them
    (IEEE sqrt correctly rounded), e6-snapped, and zero-variance
    degeneracies filtered identically on both engines. int64 bound:
    sum(dt) telescopes to the observed span, so sum(dt^2) <= span*max
    <= span_ms^2 ~ 6.8e18 for this fixture's 30-day window — safe at
    ANY event count; a multi-year stream needs the DECIMAL(38,0)/
    HUGEINT widening (documented swap). At 100 TB the windows are
    per-type partitioned (parallel across types) and everything after
    the lag is map-side-combinable."""
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.expr("(ts - lag(ts) over (partition by event_type order by ts, event_id))"
               " div 1000000").alias("dt"),
        F.expr("(lead(ts, 1) over (partition by event_type order by ts, event_id)"
               " - ts) div 1000000").alias("dt_next"),
    )
    g = (
        seq.filter(F.col("dt").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("dt").alias("s"),
            F.sum(F.col("dt") * F.col("dt")).alias("ss"),
        )
    )
    p = (
        seq.filter(F.col("dt").isNotNull() & F.col("dt_next").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n2"),
            F.sum("dt").alias("sx"),
            F.sum("dt_next").alias("sy"),
            F.sum(F.col("dt") * F.col("dt_next")).alias("sxy"),
            F.sum(F.col("dt") * F.col("dt")).alias("sxx"),
            F.sum(F.col("dt_next") * F.col("dt_next")).alias("syy"),
        )
    )

    def d(c):
        return F.col(c).cast("double")

    sigma = F.sqrt(
        (d("n_gaps") * d("ss") - d("s") * d("s")) / (d("n_gaps") * d("n_gaps"))
    )
    mu = d("s") / d("n_gaps")
    b = (sigma - mu) / (sigma + mu)
    varx = d("n2") * d("sxx") - d("sx") * d("sx")
    vary = d("n2") * d("syy") - d("sy") * d("sy")
    m = (d("n2") * d("sxy") - d("sx") * d("sy")) / F.sqrt(varx * vary)
    return (
        g.join(p, "event_type")
        .filter((F.col("s") > 0) & (varx > 0) & (vary > 0))
        .select(
            "event_type",
            "n_gaps",
            F.floor(b * F.lit(1e6) + F.lit(0.5)).cast("long").alias("burstiness_e6"),
            F.floor(m * F.lit(1e6) + F.lit(0.5)).cast("long").alias("memory_e6"),
        )
    )


# --- Binary-segmentation changepoint (single best SSE split) ---------------


@register(
    "q_events_changepoint_binseg",
    oracle="""
    WITH per AS (
      SELECT event_type,
             CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS h,
             CAST(COUNT(*) AS BIGINT) AS r
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM per GROUP BY 1
    ),
    grid AS (
      SELECT event_type, UNNEST(generate_series(lo, hi)) AS h FROM bounds
    ),
    series AS (
      SELECT g.event_type, CAST(g.h AS BIGINT) AS h,
             COALESCE(p.r, 0) AS r,
             ROW_NUMBER() OVER (PARTITION BY g.event_type ORDER BY g.h) AS i,
             SUM(COALESCE(p.r, 0)) OVER (PARTITION BY g.event_type
               ORDER BY g.h) AS cum,
             SUM(COALESCE(p.r, 0)) OVER (PARTITION BY g.event_type) AS s,
             COUNT(*) OVER (PARTITION BY g.event_type) AS t
      FROM grid g LEFT JOIN per p USING (event_type, h)
    ),
    gains AS (
      SELECT event_type, h, i, cum, s, t,
             CAST(FLOOR((CAST(cum AS DOUBLE) * CAST(cum AS DOUBLE)
                         / CAST(i AS DOUBLE)
                         + CAST(s - cum AS DOUBLE) * CAST(s - cum AS DOUBLE)
                           / CAST(t - i AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                           / CAST(t AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
               AS gain_e6
      FROM series WHERE i < t
    ),
    best AS (
      SELECT event_type, h, i, cum, s, t, gain_e6,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY gain_e6 DESC, h) AS rn
      FROM gains
    )
    SELECT event_type, h AS split_hour, gain_e6,
           CAST(i AS BIGINT) AS n_left, CAST(t - i AS BIGINT) AS n_right,
           CAST((20000 * cum + i) // (2 * i) AS BIGINT) AS mean_left_e4,
           CAST((20000 * (s - cum) + (t - i)) // (2 * (t - i)) AS BIGINT)
             AS mean_right_e4
    FROM best WHERE rn = 1
    """,
)
def q_events_changepoint_binseg(spark, sf_dir):
    """Binary-segmentation changepoint per event type: over the gap-
    filled hourly count series, the single split that maximizes the
    SSE reduction S_L^2/n_L + S_R^2/n_R - S^2/T (the first step of the
    classic binary-segmentation / PELT family). q_events_changepoint_
    cusum flags WHEN a cumulative drift crosses a threshold; this
    finds the globally best level-shift point with its exact gain and
    the two segment means — the piecewise-constant model a capacity
    planner fits before/after a launch.

    Determinism: the series is the dense hour spine (missing hours
    count 0) so prefix sums are exact BIGINTs under a unique hour
    order; every candidate's gain is one identical double tree over
    (cum, s, i, t) snapped to e6; the argmax breaks ties toward the
    earliest hour; segment means are exact integer round-half-up
    division. Scale: candidate count = observed span in hours (span-
    bounded, corpus-constant — the q_events_kendall_tau lesson), all
    windows partitioned per type."""
    ev = load_events(spark, sf_dir)
    hour_ns = 3600 * NS
    per = (
        ev.withColumn("h", F.expr(f"ts div {hour_ns}"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("r"))
    )
    bounds = per.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("h")
    )
    w = W.partitionBy("event_type").orderBy("h")
    wall = W.partitionBy("event_type")
    series = (
        grid.join(per, ["event_type", "h"], "left")
        .select(
            "event_type", "h",
            F.coalesce("r", F.lit(0).cast("long")).alias("r"),
        )
        .select(
            "event_type", "h", "r",
            F.row_number().over(w).cast("long").alias("i"),
            F.sum("r").over(w).alias("cum"),
            F.sum("r").over(wall).alias("s"),
            F.count(F.lit(1)).over(wall).cast("long").alias("t"),
        )
    )

    def d(c):
        return F.col(c).cast("double")

    gain = (
        d("cum") * d("cum") / d("i")
        + (F.col("s") - F.col("cum")).cast("double")
          * (F.col("s") - F.col("cum")).cast("double") / (F.col("t") - F.col("i")).cast("double")
        - d("s") * d("s") / d("t")
    )
    gains = series.filter(F.col("i") < F.col("t")).withColumn(
        "gain_e6", F.floor(gain * F.lit(1e6) + F.lit(0.5)).cast("long")
    )
    wbest = W.partitionBy("event_type").orderBy(F.desc("gain_e6"), F.asc("h"))
    return (
        gains.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("h").alias("split_hour"),
            "gain_e6",
            F.col("i").alias("n_left"),
            (F.col("t") - F.col("i")).cast("long").alias("n_right"),
            F.expr("(20000 * cum + i) div (2 * i)").cast("long").alias("mean_left_e4"),
            F.expr("(20000 * (s - cum) + (t - i)) div (2 * (t - i))")
            .cast("long").alias("mean_right_e4"),
        )
    )


# --- Cross-correlation lead-lag between event-type pairs -------------------

XCORR_MAX_LAG = 6


@register(
    "q_events_xcorr_leadlag",
    oracle=f"""
    WITH per AS (
      SELECT event_type,
             CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS h,
             CAST(COUNT(*) AS BIGINT) AS r
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM per),
    types AS (SELECT DISTINCT event_type FROM per),
    grid AS (
      SELECT t.event_type, CAST(g.h AS BIGINT) AS h
      FROM types t, bounds, UNNEST(generate_series(bounds.lo, bounds.hi))
        AS g(h)
    ),
    series AS (
      SELECT g.event_type, g.h, COALESCE(p.r, 0) AS r
      FROM grid g LEFT JOIN per p USING (event_type, h)
    ),
    lags AS (SELECT UNNEST(range(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG} + 1))
               AS lag),
    m AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a.r) AS BIGINT) AS sx, CAST(SUM(b.r) AS BIGINT) AS sy,
             CAST(SUM(a.r * b.r) AS BIGINT) AS sxy,
             CAST(SUM(a.r * a.r) AS BIGINT) AS sxx,
             CAST(SUM(b.r * b.r) AS BIGINT) AS syy
      FROM series a
      JOIN lags l ON TRUE
      JOIN series b ON b.event_type > a.event_type
        AND b.h = a.h + l.lag
      GROUP BY 1, 2, 3
    ),
    corr AS (
      SELECT type_a, type_b, lag, n,
             CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                        * 1e6 + 0.5) AS BIGINT) AS r_e6
      FROM m
      WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
    ),
    best AS (
      SELECT type_a, type_b, lag, n, r_e6,
             ROW_NUMBER() OVER (PARTITION BY type_a, type_b
               ORDER BY ABS(r_e6) DESC, lag) AS rn
      FROM corr
    )
    SELECT type_a, type_b, CAST(lag AS BIGINT) AS best_lag,
           n AS n_overlap, r_e6
    FROM best WHERE rn = 1
    """,
)
def q_events_xcorr_leadlag(spark, sf_dir):
    """Lead-lag discovery between event-type pairs: Pearson cross-
    correlation of the two gap-filled hourly count series at every lag
    in [-6h, +6h], reporting each pair's best lag by |r|. A positive
    best lag for (click, purchase) means clicks LEAD purchases — the
    causal-ordering scan run before funnel attribution; the self-lag
    sibling is q_events_autocorr_lag.

    Determinism: both series live on the shared dense hour spine, so
    every (pair, lag) overlap is a fixed row set; moments are exact
    BIGINT sums; r is the standard one-tree closed form e6-snapped with
    zero-variance lags filtered identically; the argmax breaks ties
    toward the most-negative lag. Scale: series size = observed span
    (span-bounded, corpus-constant); the lag explode multiplies the
    SPINE, never raw events; pair count is |types| choose 2."""
    ev = load_events(spark, sf_dir)
    hour_ns = 3600 * NS
    per = (
        ev.withColumn("h", F.expr(f"ts div {hour_ns}"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("r"))
    )
    bounds = per.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    types = per.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("h")
    )
    series = (
        grid.join(per, ["event_type", "h"], "left")
        .select(
            "event_type", "h",
            F.coalesce("r", F.lit(0).cast("long")).alias("r"),
        )
        .localCheckpoint(eager=True)
    )
    lags = spark.range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1).select(
        F.col("id").alias("lag")
    )
    a = series.select(
        F.col("event_type").alias("type_a"), F.col("h").alias("ha"),
        F.col("r").alias("ra"),
    ).crossJoin(F.broadcast(lags))
    b = series.select(
        F.col("event_type").alias("type_b"), F.col("h").alias("hb"),
        F.col("r").alias("rb"),
    )
    j = a.join(
        b,
        (F.col("type_b") > F.col("type_a"))
        & (F.col("hb") == F.col("ha") + F.col("lag")),
    )
    m = j.groupBy("type_a", "type_b", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ra").alias("sx"), F.sum("rb").alias("sy"),
        F.sum(F.col("ra") * F.col("rb")).alias("sxy"),
        F.sum(F.col("ra") * F.col("ra")).alias("sxx"),
        F.sum(F.col("rb") * F.col("rb")).alias("syy"),
    )

    def d(c):
        return F.col(c).cast("double")

    varx = d("n") * d("sxx") - d("sx") * d("sx")
    vary = d("n") * d("syy") - d("sy") * d("sy")
    r = (d("n") * d("sxy") - d("sx") * d("sy")) / F.sqrt(varx * vary)
    corr = m.filter((varx > 0) & (vary > 0)).select(
        "type_a", "type_b", "lag", "n",
        F.floor(r * F.lit(1e6) + F.lit(0.5)).cast("long").alias("r_e6"),
    )
    wbest = W.partitionBy("type_a", "type_b").orderBy(
        F.abs(F.col("r_e6")).desc(), F.asc("lag")
    )
    return (
        corr.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "type_a", "type_b",
            F.col("lag").cast("long").alias("best_lag"),
            F.col("n").alias("n_overlap"), "r_e6",
        )
    )


# --- Peak detection with integer baseline test -----------------------------


@register(
    "q_events_peak_detection",
    oracle="""
    WITH per AS (
      SELECT event_type,
             CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS h,
             CAST(COUNT(*) AS BIGINT) AS r
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM per GROUP BY 1
    ),
    grid AS (
      SELECT event_type, UNNEST(generate_series(lo, hi)) AS h FROM bounds
    ),
    series AS (
      SELECT g.event_type, CAST(g.h AS BIGINT) AS h, COALESCE(p.r, 0) AS r
      FROM grid g LEFT JOIN per p USING (event_type, h)
    ),
    win AS (
      SELECT event_type, h, r,
             SUM(r) OVER (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s,
             MAX(r) OVER (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS mx,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt,
             LAG(r) OVER (PARTITION BY event_type ORDER BY h) AS prev
      FROM series
    )
    SELECT event_type, h AS peak_hour, r AS n_events,
           CAST(s - r AS BIGINT) AS neighbor_sum,
           CAST(cnt - 1 AS BIGINT) AS n_neighbors
    FROM win
    WHERE r > 0 AND r = mx AND (prev IS NULL OR prev < r)
      AND (cnt - 1) * r >= 2 * (s - r)
    """,
)
def q_events_peak_detection(spark, sf_dir):
    """Local-peak extraction over each type's gap-filled hourly series:
    an hour is a peak when it is the maximum of its +/-3h window, the
    leftmost of any plateau of equal maxima, and at least TWICE the
    mean of its neighbors — the spike shortlist an on-call dashboard
    renders, and the point-event complement of the sustained-interval
    view in q_events_burst_kleinberg.

    Fully INTEGER operator: counts, window sums, and the doubled-
    baseline test cross-multiplied to (n_neighbors * r >= 2 *
    neighbor_sum) — no division, no doubles, no rounding anywhere, so
    there is nothing to drift between engines. Edge windows use their
    true neighbor count. All windows are per-type partitioned over the
    span-bounded spine; at 100 TB the hourly aggregate is the only
    data-sized stage and it combines map-side."""
    ev = load_events(spark, sf_dir)
    hour_ns = 3600 * NS
    per = (
        ev.withColumn("h", F.expr(f"ts div {hour_ns}"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("r"))
    )
    bounds = per.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("h")
    )
    series = grid.join(per, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("r", F.lit(0).cast("long")).alias("r")
    )
    wf = (
        W.partitionBy("event_type").orderBy("h").rowsBetween(-3, 3)
    )
    wl = W.partitionBy("event_type").orderBy("h")
    win = series.select(
        "event_type", "h", "r",
        F.sum("r").over(wf).alias("s"),
        F.max("r").over(wf).alias("mx"),
        F.count(F.lit(1)).over(wf).cast("long").alias("cnt"),
        F.lag("r").over(wl).alias("prev"),
    )
    return win.filter(
        (F.col("r") > 0)
        & (F.col("r") == F.col("mx"))
        & (F.col("prev").isNull() | (F.col("prev") < F.col("r")))
        & ((F.col("cnt") - 1) * F.col("r") >= 2 * (F.col("s") - F.col("r")))
    ).select(
        "event_type",
        F.col("h").alias("peak_hour"),
        F.col("r").alias("n_events"),
        (F.col("s") - F.col("r")).cast("long").alias("neighbor_sum"),
        (F.col("cnt") - 1).cast("long").alias("n_neighbors"),
    )


# --- Markov stationary distribution ----------------------------------------

MARKOV_POWER_K = 16  # power-iteration steps; the ~8-type fixture chain
# mixes in far fewer, and each extra step is one join over a |types|^2
# relation — free at any corpus size
MARKOV_E9 = 1_000_000_000


def _markov_stationary_oracle(k: int = MARKOV_POWER_K) -> str:
    """K chained MATERIALIZED CTE steps of the integer power iteration
    (the q_text_bpe_encode oracle pattern: materialize every level or
    DuckDB inlines the chain exponentially)."""
    parts = [
        f"""
    WITH seq AS MATERIALIZED (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    c AS MATERIALIZED (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n FROM seq
      WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    r AS MATERIALIZED (
      SELECT src, CAST(SUM(n) AS BIGINT) AS rn FROM c GROUP BY src
    ),
    tn AS MATERIALIZED (
      SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nt FROM events
    ),
    v0 AS MATERIALIZED (
      SELECT event_type AS t, CAST({MARKOV_E9} // tn.nt AS BIGINT) AS val
      FROM (SELECT DISTINCT event_type FROM events), tn
    )"""
    ]
    for m in range(1, k + 1):
        parts.append(
            f""",
    v{m} AS MATERIALIZED (
      SELECT c.dst AS t,
             CAST(SUM((v.val * c.n) // r.rn) AS BIGINT) AS val
      FROM v{m - 1} v JOIN c ON c.src = v.t JOIN r ON r.src = c.src
      GROUP BY c.dst
    )"""
        )
    parts.append(
        f"""
    SELECT t AS event_type, val AS pi_e9,
           CAST(ROW_NUMBER() OVER (ORDER BY val DESC, t) AS BIGINT) AS rnk
    FROM v{k}"""
    )
    return "".join(parts)


@register("q_events_markov_stationary", oracle=_markov_stationary_oracle())
def q_events_markov_stationary(spark, sf_dir):
    """Stationary distribution of the event-type Markov chain — where a
    user's behavior settles if the observed transition dynamics run
    forever; the long-run load profile a capacity model needs and the
    baseline an anomalous-session scorer compares against. Composes
    q_events_markov_transition's counts with {MARKOV_POWER_K} steps of
    power iteration.

    Exact-integer discipline: the distribution is carried as e9
    fixed-point BIGINTs and each step computes
    v'[dst] = sum_src (v[src] * n(src,dst)) div rowsum(src) — integer
    div of positives, identical on both engines, so the iterate is
    bit-deterministic (a float version would hash-flip on partial-agg
    merge order). Truncation leaks ~|types| parts per 1e9 per step —
    invisible at e9 with 16 steps — and any type with no outgoing
    transitions drops out identically on both sides (inner join).

    Plan shape: one user-partitioned LEAD over the corpus, then
    everything iterates on the |types|^2 count relation (~64 rows at
    any corpus size); per step one join + one hash aggregate, lineage
    cut every 4 steps (the HITS localCheckpoint idiom). The oracle
    replays the identical iteration as {MARKOV_POWER_K} materialized
    CTE levels."""
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    c = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    r = c.groupBy("src").agg(F.sum("n").cast("long").alias("rn"))
    tn = ev.agg(F.countDistinct("event_type").alias("nt"))
    v = (
        ev.select("event_type").distinct()
        .crossJoin(F.broadcast(tn))  # 1-row type-count attach
        .select(
            F.col("event_type").alias("t"),
            F.expr(f"{MARKOV_E9} div nt").cast("long").alias("val"),
        )
    )
    for step in range(1, MARKOV_POWER_K + 1):
        v = (
            v.join(c, c["src"] == v["t"])
            .join(r, "src")
            .select(
                F.col("dst"),
                F.expr("(val * n) div rn").alias("term"),
            )
            .groupBy("dst")
            .agg(F.sum("term").cast("long").alias("val"))
            .select(F.col("dst").alias("t"), "val")
        )
        # lineage cut every 4 steps, but never on the FINAL iterate: the
        # closing rank window must be visibly fed by the step's hash
        # aggregate (a checkpoint truncates the plan to an RDD scan and
        # the plan auditor's self-check could no longer prove the
        # window's input is the |types|-bounded aggregate)
        if step % 4 == 0 and step != MARKOV_POWER_K:
            v = v.localCheckpoint(eager=True)
    wr = W.orderBy(F.desc("val"), "t")
    return v.select(
        F.col("t").alias("event_type"),
        F.col("val").alias("pi_e9"),
        F.row_number().over(wr).cast("long").alias("rnk"),
    )


# --- Holt's linear-trend exponential smoothing -----------------------------

HOLT_A_NUM, HOLT_B_NUM, HOLT_DEN = 3, 1, 10  # alpha = 0.3, beta = 0.1


@register(
    "q_events_holt_linear",
    oracle=f"""
    WITH RECURSIVE w AS (
      SELECT (MAX(epoch_ns(ts)) - MIN(epoch_ns(ts)))
               // (3600000000000 * {TS_MAX_BUCKETS}) + 1 AS wh,
             MIN(epoch_ns(ts)) AS tmin, MAX(epoch_ns(ts)) AS tmax
      FROM events
    ),
    grid AS (
      SELECT tmin // (3600000000000 * wh) AS bmin,
             tmax // (3600000000000 * wh)
               - tmin // (3600000000000 * wh) + 1 AS n
      FROM w
    ),
    cnt AS (
      SELECT event_type,
             epoch_ns(ts) // (3600000000000 * (SELECT wh FROM w))
               - (SELECT bmin FROM grid) AS b,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    xs AS (
      SELECT ty.event_type, CAST(g.i + 1 AS BIGINT) AS t,
             COALESCE(c.x, 0) AS x
      FROM (SELECT DISTINCT event_type FROM events) ty
      CROSS JOIN (SELECT UNNEST(range(0, (SELECT n FROM grid))) AS i) g
      LEFT JOIN cnt c ON c.event_type = ty.event_type AND c.b = g.i
    ),
    init AS (
      SELECT x1.event_type, x1.x * 1000000 AS s,
             (x2.x - x1.x) * 1000000 AS b
      FROM (SELECT event_type, x FROM xs WHERE t = 1) x1
      JOIN (SELECT event_type, x FROM xs WHERE t = 2) x2
        ON x2.event_type = x1.event_type
    ),
    rec(event_type, t, s, b) AS (
      SELECT event_type, CAST(2 AS BIGINT), s, b FROM init
      UNION ALL
      SELECT r.event_type, r.t + 1,
             ({HOLT_A_NUM} * c.x * 1000000
              + ({HOLT_DEN} - {HOLT_A_NUM}) * (r.s + r.b)) // {HOLT_DEN},
             ({HOLT_B_NUM} * ((({HOLT_A_NUM} * c.x * 1000000
                + ({HOLT_DEN} - {HOLT_A_NUM}) * (r.s + r.b)) // {HOLT_DEN})
                - r.s)
              + ({HOLT_DEN} - {HOLT_B_NUM}) * r.b) // {HOLT_DEN}
      FROM rec r JOIN xs c ON c.event_type = r.event_type AND c.t = r.t + 1
      WHERE r.t < (SELECT n FROM grid)
    )
    SELECT event_type,
           CAST((SELECT n FROM grid) AS BIGINT) AS n_buckets,
           CAST(s AS BIGINT) AS level_e6,
           CAST(b AS BIGINT) AS trend_e6,
           CAST(s + b AS BIGINT) AS forecast_1_e6,
           CAST(s + 24 * b AS BIGINT) AS forecast_24_e6
    FROM rec WHERE t = (SELECT n FROM grid)
    """,
)
def q_events_holt_linear(spark, sf_dir):
    """Holt's linear-trend exponential smoothing over each event type's
    bucketed load series (alpha={HOLT_A_NUM}/{HOLT_DEN},
    beta={HOLT_B_NUM}/{HOLT_DEN}) with 1-step and 24-step forecasts —
    the capacity-planning companion to the changepoint/anomaly family:
    level + trend state after the full history, maintained exactly.

    Determinism is the recursion itself: every update is integer
    arithmetic in e6 fixed point with truncating integer division at
    each step ON BOTH ENGINES (Spark ``div`` and DuckDB ``//`` both
    truncate toward zero on integers), so the final state is
    bit-identical by construction — no float fold, no summation-order
    exposure. Missing buckets count as zero (the gap-filled dense grid;
    smoothing semantics require them).

    Scale shape: the series is span-adaptive (_span_bucket_hours caps
    it at ~{TS_MAX_BUCKETS} points however long retention grows), so
    the per-type fold is over a BOUNDED array inside one JVM
    higher-order aggregate — the corpus-scan part is one
    map-side-combinable (type, bucket) count. The oracle replays the
    identical recursion as a recursive CTE (the round-7 rule: DuckDB
    list_reduce mutates struct accumulators, recursive CTEs don't)."""
    ev = load_events(spark, sf_dir)
    r = ev.agg(
        F.min("ts").alias("tmin"), F.max("ts").alias("tmax")
    ).collect()[0]  # one 2-scalar pull, the _span_bucket_hours class
    wh = (int(r.tmax) - int(r.tmin)) // (3600 * NS * TS_MAX_BUCKETS) + 1
    width = 3600 * NS * wh
    bmin = int(r.tmin) // width
    n = int(r.tmax) // width - bmin + 1
    if n < 2:
        raise ValueError("q_events_holt_linear needs >= 2 buckets")
    cnt = (
        ev.select(
            "event_type", (F.expr(f"ts div {width}") - F.lit(bmin)).alias("b")
        )
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    grid = (
        cnt.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("b"),
        )
        .select("event_type", F.col("b").cast("long").alias("b"))
    )
    series = (
        grid.join(cnt, ["event_type", "b"], "left_outer")
        .select(
            "event_type", "b", F.coalesce("x", F.lit(0).cast("long")).alias("x")
        )
        .groupBy("event_type")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(b, x))), p -> p.x)"
            ).alias("xs")
        )
    )
    A, B, D = HOLT_A_NUM, HOLT_B_NUM, HOLT_DEN
    s_next = f"({A} * x * 1000000 + {D - A} * (acc.s + acc.b)) div {D}"
    fold = (
        f"aggregate(slice(xs, 3, {n - 2}), "
        f"named_struct('s', xs[0] * cast(1000000 as bigint), "
        f"             'b', (xs[1] - xs[0]) * cast(1000000 as bigint)), "
        f"(acc, x) -> named_struct("
        f"  's', {s_next}, "
        f"  'b', ({B} * (({s_next}) - acc.s) + {D - B} * acc.b) div {D}))"
    )
    return series.select(
        "event_type",
        F.lit(n).cast("long").alias("n_buckets"),
        F.expr(fold).alias("st"),
    ).select(
        "event_type",
        "n_buckets",
        F.col("st.s").cast("long").alias("level_e6"),
        F.col("st.b").cast("long").alias("trend_e6"),
        (F.col("st.s") + F.col("st.b")).cast("long").alias("forecast_1_e6"),
        (F.col("st.s") + 24 * F.col("st.b")).cast("long").alias("forecast_24_e6"),
    )


# --- Holt-Winters triple exponential smoothing (additive seasonality) -------

HW_L = 24  # season length in buckets (the daily cycle on an hourly grid)
HW_A, HW_B, HW_G, HW_D = 3, 1, 2, 10  # alpha=0.3, beta=0.1, gamma=0.2


def _holt_winters_oracle() -> str:
    L, A, B, G, D = HW_L, HW_A, HW_B, HW_G, HW_D
    cj = f"r.c[CAST(r.t % {L} AS INT) + 1]"
    snx = (f"(({A} * (x.x * 1000000 - {cj})"
           f" + {D - A} * (r.s + r.b)) // {D})")
    bnx = f"(({B} * ({snx} - r.s) + {D - B} * r.b) // {D})"
    cjn = f"(({G} * (x.x * 1000000 - {snx}) + {D - G} * {cj}) // {D})"
    return f"""
    WITH RECURSIVE w AS (
      SELECT (MAX(epoch_ns(ts)) - MIN(epoch_ns(ts)))
               // (3600000000000 * {TS_MAX_BUCKETS}) + 1 AS wh,
             MIN(epoch_ns(ts)) AS tmin, MAX(epoch_ns(ts)) AS tmax
      FROM events
    ),
    grid AS (
      SELECT tmin // (3600000000000 * wh) AS bmin,
             tmax // (3600000000000 * wh)
               - tmin // (3600000000000 * wh) + 1 AS n
      FROM w
    ),
    cnt AS (
      SELECT event_type,
             epoch_ns(ts) // (3600000000000 * (SELECT wh FROM w))
               - (SELECT bmin FROM grid) AS b,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    xsr AS (
      SELECT ty.event_type, CAST(g.i + 1 AS BIGINT) AS t,
             COALESCE(c.x, 0) AS x
      FROM (SELECT DISTINCT event_type FROM events) ty
      CROSS JOIN (SELECT UNNEST(range(0, (SELECT n FROM grid))) AS i) g
      LEFT JOIN cnt c ON c.event_type = ty.event_type AND c.b = g.i
    ),
    hwser AS (
      SELECT event_type, LIST(x ORDER BY t) AS xs FROM xsr GROUP BY 1
    ),
    hwinit AS (
      SELECT event_type,
             (list_sum(xs[1:{L}]) // {L}) * 1000000 AS s0,
             ((list_sum(xs[{L + 1}:{2 * L}]) - list_sum(xs[1:{L}]))
               * 1000000) // {L * L} AS b0,
             list_transform(xs[1:{L}],
               v -> (v - (list_sum(xs[1:{L}]) // {L})) * 1000000) AS c0
      FROM hwser
    ),
    hwrec(event_type, t, s, b, c) AS (
      SELECT event_type, CAST({L} AS BIGINT), CAST(s0 AS BIGINT),
             CAST(b0 AS BIGINT), c0
      FROM hwinit
      UNION ALL
      SELECT r.event_type, r.t + 1, {snx}, {bnx},
             list_transform(r.c, (v, i) ->
               CASE WHEN i = CAST(r.t % {L} AS INT) + 1
                    THEN {cjn} ELSE v END)
      FROM hwrec r JOIN xsr x
        ON x.event_type = r.event_type AND x.t = r.t + 1
      WHERE r.t < (SELECT n FROM grid)
    )
    SELECT event_type,
           CAST((SELECT n FROM grid) AS BIGINT) AS n_buckets,
           CAST(s AS BIGINT) AS level_e6,
           CAST(b AS BIGINT) AS trend_e6,
           CAST(c[CAST((SELECT n FROM grid) % {L} AS INT) + 1] AS BIGINT)
             AS season_next_e6,
           CAST(s + b + c[CAST((SELECT n FROM grid) % {L} AS INT) + 1]
                AS BIGINT) AS forecast_1_e6,
           CAST(list_max(c) - list_min(c) AS BIGINT) AS season_amp_e6
    FROM hwrec WHERE t = (SELECT n FROM grid)
    """


@register("q_events_holt_winters", oracle=_holt_winters_oracle())
def q_events_holt_winters(spark, sf_dir):
    """Holt-Winters TRIPLE exponential smoothing (additive seasonality,
    season length {HW_L} buckets — the daily cycle on the hourly grid)
    — completing the smoothing ladder after EWMA (level) and
    q_events_holt_linear (level+trend): the level/trend/seasonal state
    after the full history, the next bucket's seasonal component, the
    1-step forecast, and the seasonal amplitude. This is the model
    capacity planners actually fit to diurnal load.

    Same exact-integer discipline as the Holt gate, extended to the
    seasonal VECTOR: state is (t, s, b, c[{HW_L}]) in e6 fixed point;
    every update truncates with integer div on both engines, and the
    one season slot touched per step is rewritten via an
    index-conditional transform (Spark's 0-based index vs DuckDB's
    1-based is absorbed at the call sites). Init is the classic
    two-season recipe in integers: s = mean of season one, b =
    (season-two sum - season-one sum) div L^2, c_i = x_i - mean.

    Scale shape: identical to q_events_holt_linear — one map-side
    (type, bucket) count over the corpus, then a per-type fold over the
    span-capped (~{TS_MAX_BUCKETS}-point) series inside one JVM
    higher-order aggregate carrying a {HW_L}-slot array; the oracle
    replays it as a recursive CTE."""
    L, A, B, G, D = HW_L, HW_A, HW_B, HW_G, HW_D
    ev = load_events(spark, sf_dir)
    r = ev.agg(
        F.min("ts").alias("tmin"), F.max("ts").alias("tmax")
    ).collect()[0]  # one 2-scalar pull, the _span_bucket_hours class
    wh = (int(r.tmax) - int(r.tmin)) // (3600 * NS * TS_MAX_BUCKETS) + 1
    width = 3600 * NS * wh
    bmin = int(r.tmin) // width
    n = int(r.tmax) // width - bmin + 1
    if n < 2 * L + 1:
        raise ValueError(
            f"q_events_holt_winters needs >= {2 * L + 1} buckets, got {n}"
        )
    cnt = (
        ev.select(
            "event_type", (F.expr(f"ts div {width}") - F.lit(bmin)).alias("b")
        )
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    series = (
        cnt.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("b"),
        )
        .select("event_type", F.col("b").cast("long").alias("b"))
        .join(cnt, ["event_type", "b"], "left_outer")
        .select(
            "event_type", "b", F.coalesce("x", F.lit(0).cast("long")).alias("x")
        )
        .groupBy("event_type")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(b, x))), p -> p.x)"
            ).alias("xs")
        )
    )
    cj = f"element_at(acc.c, cast(pmod(acc.t, {L}) as int) + 1)"
    snx = f"(({A} * (x * 1000000 - {cj}) + {D - A} * (acc.s + acc.b)) div {D})"
    bnx = f"(({B} * ({snx} - acc.s) + {D - B} * acc.b) div {D})"
    cjn = f"(({G} * (x * 1000000 - {snx}) + {D - G} * {cj}) div {D})"
    init = series.select(
        "event_type",
        "xs",
        F.expr(
            f"aggregate(slice(xs, 1, {L}), cast(0 as bigint), (a, v) -> a + v)"
        ).alias("sum1"),
        F.expr(
            f"aggregate(slice(xs, {L + 1}, {L}), cast(0 as bigint),"
            f" (a, v) -> a + v)"
        ).alias("sum2"),
    ).select(
        "event_type",
        "xs",
        (F.expr(f"sum1 div {L}") * 1000000).alias("s0"),
        F.expr(f"((sum2 - sum1) * 1000000) div {L * L}").alias("b0"),
        F.expr(
            f"transform(slice(xs, 1, {L}),"
            f" v -> (v - (sum1 div {L})) * cast(1000000 as bigint))"
        ).alias("c0"),
    )
    fold = (
        f"aggregate(slice(xs, {L + 1}, {n - L}), "
        f"named_struct('t', cast({L} as bigint), 's', s0, 'b', b0, 'c', c0), "
        f"(acc, x) -> named_struct("
        f"  't', acc.t + 1, "
        f"  's', {snx}, "
        f"  'b', {bnx}, "
        f"  'c', transform(acc.c, (v, i) -> "
        f"       if(i = cast(pmod(acc.t, {L}) as int), {cjn}, v))))"
    )
    jn = f"cast({n % L} as int) + 1"
    return init.select(
        "event_type",
        F.lit(n).cast("long").alias("n_buckets"),
        F.expr(fold).alias("st"),
    ).select(
        "event_type",
        "n_buckets",
        F.col("st.s").cast("long").alias("level_e6"),
        F.col("st.b").cast("long").alias("trend_e6"),
        F.expr(f"element_at(st.c, {jn})").cast("long").alias("season_next_e6"),
        (F.col("st.s") + F.col("st.b") + F.expr(f"element_at(st.c, {jn})"))
        .cast("long")
        .alias("forecast_1_e6"),
        (F.expr("array_max(st.c)") - F.expr("array_min(st.c)"))
        .cast("long")
        .alias("season_amp_e6"),
    )


# --- differentially-private aggregate release --------------------------------
#
# The production shape of Wilson et al. 2020 ("Differentially Private
# SQL with Bounded User Contribution"): before any statistic about a
# corpus leaves the pipeline (dataset cards, per-source mix reports),
# (1) bound each user's contribution — at most DP_T partitions per
# user and DP_C rows per (user, partition) — so the L1 sensitivity of
# the released count vector is the CONSTANT DP_C * DP_T, then
# (2) add integer noise from the geometric mechanism (Ghosh,
# Roughgarden & Sundararajan 2009; the discrete Laplace of Canonne,
# Kamath & Steinke 2020), and (3) post-process (clamp at zero — DP is
# closed under post-processing). The noise stream here is a SEEDED
# deterministic PRNG (md5 of the release label), the reproducible-
# release mode; a production deployment swaps that one uniform draw
# for a CSPRNG. Noise magnitude is drawn by inverse-CDF against
# PRECOMPUTED INTEGER THRESHOLDS T_k = floor(M * alpha^k) with
# alpha = exp(-eps/Δ): magnitude = |{k >= 1 : U < T_k}|, which gives
# P(magnitude >= k) = T_k / M — the geometric law to within one part
# in M per step. The thresholds are Python-side constants embedded
# verbatim in BOTH the Spark plan and the oracle SQL, so the
# cross-engine path is pure int64 comparison — no ln/exp anywhere a
# 1-ulp libm disagreement could flip a floor.

DP_C = 4            # rows kept per (user, partition)
DP_T = 3            # partitions (event types) kept per user
DP_SENS = DP_C * DP_T  # L1 sensitivity of the released vector
DP_EPS_E6 = 1_000_000  # epsilon = 1.0
DP_M = 1 << 48      # uniform grain: 12 md5 hex digits


def _dp_thresholds() -> list[int]:
    """T_k = floor(M * alpha^k), k = 1.., down to the last k with
    T_k >= 1 (~Δ/ε * ln M terms).  Float pow is fine HERE: the
    resulting integers are literals shared by both engines, so any
    libm wobble changes the (documented, seeded) distribution by at
    most 1/M — never the cross-engine agreement."""
    alpha = math.exp(-(DP_EPS_E6 / 1_000_000.0) / DP_SENS)
    out, k = [], 1
    while True:
        t = math.floor(DP_M * alpha**k)
        if t < 1:
            return out
        out.append(t)
        k += 1


DP_THRESH = _dp_thresholds()


@register(
    "q_events_dp_release",
    oracle=f"""
    WITH typed AS (
      SELECT event_type, user_id, event_id,
             DENSE_RANK() OVER (
               PARTITION BY user_id ORDER BY event_type
             ) AS trk
      FROM events
    ),
    capped AS (
      SELECT event_type FROM (
        SELECT event_type,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, event_type ORDER BY event_id
               ) AS rn
        FROM typed WHERE trk <= {DP_T}
      ) WHERE rn <= {DP_C}
    ),
    truec AS (
      SELECT event_type, COUNT(*) AS n_bounded FROM capped GROUP BY 1
    ),
    noised AS (
      SELECT event_type, n_bounded,
             ('0x' || substr(md5('dpr1:' || event_type), 1, 12))::BIGINT AS u,
             CASE WHEN substr(md5('dpr1:' || event_type), 13, 1) IN
                  ('1','3','5','7','9','b','d','f') THEN -1 ELSE 1 END AS sgn
      FROM truec
    )
    SELECT event_type, CAST(n_bounded AS BIGINT) AS n_bounded,
           CAST(sgn * len(list_filter({list(DP_THRESH)}, t -> u < t))
             AS BIGINT) AS noise,
           CAST(GREATEST(0, n_bounded
                + sgn * len(list_filter({list(DP_THRESH)}, t -> u < t)))
             AS BIGINT) AS released_n,
           CAST({DP_EPS_E6} AS BIGINT) AS epsilon_e6,
           CAST({DP_SENS} AS BIGINT) AS sensitivity
    FROM noised
    """,
)
def q_events_dp_release(spark, sf_dir):
    """Differentially-private COUNT release per event type — the
    Wilson et al. 2020 bounded-contribution pipeline: each user keeps
    at most {DP_T} event types (dense-ranked by type name) and at most
    {DP_C} events per kept type (row-numbered by event_id), making the
    released vector's L1 sensitivity the constant {DP_SENS}; geometric-
    mechanism noise (Ghosh et al. 2009) at epsilon 1.0 is added from a
    seeded md5 uniform (magnitude = inverse-CDF count of precomputed
    integer thresholds above the uniform — pure int64 comparison on
    the cross-engine path, no transcendental anywhere), and the
    release is clamped at zero (post-processing). ``n_bounded`` is the
    pre-noise bounded count, emitted for the correctness gate and NOT
    part of a real release.

    Scale shape: two user-partitioned windows (never single-partition)
    bound contributions in one pass each, then one map-side-combinable
    count per type; the noise join is a per-type projection. At 100 TB
    the windows shuffle on user_id — the same key the raw events are
    naturally bucketed by."""
    ev = load_events(spark, sf_dir).select("event_type", "user_id", "event_id")
    wt = W.partitionBy("user_id").orderBy("event_type")
    wc = W.partitionBy("user_id", "event_type").orderBy("event_id")
    capped = (
        ev.withColumn("trk", F.dense_rank().over(wt))
        .filter(F.col("trk") <= DP_T)
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= DP_C)
    )
    truec = capped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_bounded")
    )
    h = F.md5(F.concat(F.lit("dpr1:"), F.col("event_type")))
    u = F.conv(F.substring(h, 1, 12), 16, 10).cast("long")
    sgn = F.when(
        F.substring(h, 13, 1).isin(*"13579bdf"), F.lit(-1)
    ).otherwise(F.lit(1))
    # inverse-CDF against the shared integer thresholds: magnitude is
    # the count of T_k still above the uniform — pure int64 compares,
    # identical literals on both engines (see _dp_thresholds)
    thresh_arr = ", ".join(f"{t}L" for t in DP_THRESH)
    u_sql = (
        "cast(conv(substring(md5(concat('dpr1:', event_type)), 1, 12),"
        " 16, 10) as bigint)"
    )
    mag = F.expr(
        f"size(filter(array({thresh_arr}), t -> {u_sql} < t))"
    ).cast("long")
    noise = (sgn * mag).cast("long")
    return truec.select(
        "event_type",
        F.col("n_bounded").cast("long").alias("n_bounded"),
        noise.alias("noise"),
        F.greatest(F.lit(0), F.col("n_bounded") + noise)
        .cast("long")
        .alias("released_n"),
        F.lit(DP_EPS_E6).cast("long").alias("epsilon_e6"),
        F.lit(DP_SENS).cast("long").alias("sensitivity"),
    )


# --- differentially-private quantile release ---------------------------------
#
# The exponential mechanism (McSherry & Talwar 2007) specialized to
# quantiles (Smith 2011): candidates are a FIXED grid of value bins,
# the utility of bin b is -|rank(b) - q*n/100| (rank utility,
# sensitivity DP_C under the same bounded-contribution prep as the
# count release), and a bin is selected with probability proportional
# to exp(eps/2 * utility). Integerized end to end: the geometric decay
# exp(-eps/2)^d is a PRECOMPUTED integer weight table (e6 fixed point,
# w[k+1] = w[k] * alpha_e6 // 1e6, clamped at the last index with
# w >= 1 — a truncated-exponential mechanism whose tail shares the
# floor weight), the target rank is q*n // 100, and selection draws a
# seeded md5 uniform modulo the total weight against the cumulative
# weight walk — every cross-engine value is an int64, no exp/ln
# anywhere (the q_events_dp_release discipline).

DPQ_BINW = 16          # bin width; power of two -> value/16.0 is exact
DPQ_NBINS = 32         # fixed candidate grid [0, 512)
DPQ_EPS_E6 = 1_000_000  # epsilon per released quantile (composes: the
#                         3-quantile panel spends 3 * eps)
DPQ_ALPHA_E6 = 606_530  # floor(1e6 * exp(-eps/2))
DPQ_QS = (25, 50, 75)


def _dpq_weights() -> list[int]:
    """w[d] ~ 1e6 * exp(-eps/2)^d by pure-integer recurrence; stops at
    the last weight >= 1 (27 entries at eps=1)."""
    w, out = 1_000_000, []
    while w >= 1:
        out.append(w)
        w = w * DPQ_ALPHA_E6 // 1_000_000
    return out


DPQ_W = _dpq_weights()
DPQ_DCAP = len(DPQ_W) - 1


def _dpq_oracle() -> str:
    wlist = ", ".join(str(w) for w in DPQ_W)
    return f"""
    WITH typed AS (
      SELECT event_type, user_id, event_id, value,
             DENSE_RANK() OVER (
               PARTITION BY user_id ORDER BY event_type
             ) AS trk
      FROM events
    ),
    capped AS (
      SELECT event_type, value FROM (
        SELECT event_type, value,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, event_type ORDER BY event_id
               ) AS rn
        FROM typed WHERE trk <= {DP_T}
      ) WHERE rn <= {DP_C}
    ),
    binned AS (
      SELECT event_type,
             LEAST({DPQ_NBINS - 1},
                   GREATEST(0, CAST(FLOOR(value / {DPQ_BINW}.0) AS BIGINT)))
               AS bin
      FROM capped
    ),
    bc AS (SELECT event_type, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2),
    grid AS (
      SELECT t.event_type, g.bin
      FROM (SELECT DISTINCT event_type FROM binned) t,
           (SELECT UNNEST(range({DPQ_NBINS})) AS bin) g
    ),
    ranks AS (
      SELECT g.event_type, g.bin,
             SUM(COALESCE(bc.c, 0)) OVER (
               PARTITION BY g.event_type ORDER BY g.bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS rk,
             SUM(COALESCE(bc.c, 0)) OVER (
               PARTITION BY g.event_type
             ) AS n
      FROM grid g LEFT JOIN bc ON bc.event_type = g.event_type
                              AND bc.bin = g.bin
    ),
    scored AS (
      SELECT r.event_type, q.qt, r.bin, r.n,
             (q.qt * r.n) // 100 AS target,
             ([{wlist}])[CAST(
               LEAST(ABS(r.rk - (q.qt * r.n) // 100), {DPQ_DCAP}) + 1
             AS BIGINT)] AS w
      FROM ranks r, (SELECT UNNEST([{", ".join(str(q) for q in DPQ_QS)}]) AS qt) q
    ),
    cw AS (
      SELECT event_type, qt, bin, n, target, w,
             SUM(w) OVER (
               PARTITION BY event_type, qt ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cumw,
             SUM(w) OVER (PARTITION BY event_type, qt) AS totw,
             ('0x' || substr(md5(
               'dpq1:' || CAST(qt AS VARCHAR) || ':' || event_type
             ), 1, 12))::BIGINT AS u
      FROM scored
    ),
    sel AS (
      SELECT event_type, qt, MIN(bin) AS sel_bin,
             MAX(n) AS n, MAX(target) AS target
      FROM cw
      WHERE cumw > u % totw
      GROUP BY 1, 2
    )
    SELECT event_type, CAST(qt AS BIGINT) AS quantile_pct,
           CAST(n AS BIGINT) AS n_bounded,
           CAST(target AS BIGINT) AS target_rank,
           CAST(sel_bin AS BIGINT) AS sel_bin,
           (sel_bin + 1) * {DPQ_BINW}.0 AS released_value,
           CAST({DPQ_EPS_E6} AS BIGINT) AS epsilon_e6
    FROM sel
    WHERE n > 0
    """


@register("q_events_dp_quantile", oracle=_dpq_oracle())
def q_events_dp_quantile(spark, sf_dir):
    """Differentially-private QUANTILE release per event type — the
    exponential mechanism (McSherry & Talwar 2007; Smith 2011) over a
    fixed {DPQ_NBINS}-bin value grid, releasing p25/p50/p75 under the
    same Wilson et al. bounded-contribution prep as the count release
    (at most {DP_T} types per user, {DP_C} values per kept type, so
    the rank function's sensitivity is the constant {DP_C}). Candidate
    bin b scores -|rank(b) - q*n//100|; selection weight is the
    precomputed integer table DPQ_W (e6 fixed-point exp(-eps/2)^d,
    tail clamped at the last weight >= 1 — a truncated-exponential
    mechanism), and the released bin is the first whose cumulative
    weight exceeds a seeded md5 uniform modulo the total weight.
    ``n_bounded``/``target_rank`` are emitted for the correctness gate
    and are NOT part of a real release; a real deployment also swaps
    the seeded uniform for a CSPRNG and accounts 3 x epsilon for the
    three-quantile panel.

    Scale shape: contribution bounding is the count release's two
    user-partitioned windows; after one map-side-combinable
    (type, bin) count the whole mechanism runs on |types| x {DPQ_NBINS}
    rows — the windows partition by event_type over a constant
    {DPQ_NBINS}-row frame, never single-partition. Every cross-engine
    value on the selection path is an int64 (ranks, targets, weights,
    cumulative weights, the md5 uniform); the only double is the
    final grid-edge rendering (sel_bin + 1) * {DPQ_BINW}."""
    ev = load_events(spark, sf_dir).select(
        "event_type", "user_id", "event_id", "value"
    )
    wt = W.partitionBy("user_id").orderBy("event_type")
    wc = W.partitionBy("user_id", "event_type").orderBy("event_id")
    capped = (
        ev.withColumn("trk", F.dense_rank().over(wt))
        .filter(F.col("trk") <= DP_T)
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= DP_C)
        .select("event_type", "value")
    )
    binned = capped.select(
        "event_type",
        F.least(
            F.lit(DPQ_NBINS - 1),
            F.greatest(
                F.lit(0),
                F.floor(F.col("value") / F.lit(float(DPQ_BINW))).cast("long"),
            ),
        ).alias("bin"),
    )
    bc = binned.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("c"))
    grid = (
        binned.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(DPQ_NBINS - 1))).alias("bin"),
        )
        .select("event_type", F.col("bin").cast("long").alias("bin"))
    )
    wrk = W.partitionBy("event_type").orderBy("bin").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wall = W.partitionBy("event_type")
    ranks = (
        grid.join(F.broadcast(bc), ["event_type", "bin"], "left_outer")
        .withColumn("cc", F.coalesce("c", F.lit(0)))
        .withColumn("rk", F.sum("cc").over(wrk))
        .withColumn("n", F.sum("cc").over(wall))
    )
    warr = F.array(*[F.lit(w).cast("long") for w in DPQ_W])
    scored = (
        ranks.select(
            "event_type",
            "bin",
            "rk",
            "n",
            # per-quantile fan-out as a generator, not a join: 3 literal
            # rows per grid cell, no BroadcastNestedLoopJoin
            F.explode(
                F.array(*[F.lit(int(q)).cast("long") for q in DPQ_QS])
            ).alias("qt"),
        )
        .withColumn("target", F.expr("qt * n div 100"))
        .withColumn(
            "w",
            F.element_at(
                warr,
                (
                    F.least(
                        F.abs(F.col("rk") - F.col("target")), F.lit(DPQ_DCAP)
                    )
                    + 1
                ).cast("int"),
            ),
        )
    )
    wq = W.partitionBy("event_type", "qt").orderBy("bin").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wqa = W.partitionBy("event_type", "qt")
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("dpq1:"),
                    F.col("qt").cast("string"),
                    F.lit(":"),
                    F.col("event_type"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    cw = (
        scored.withColumn("cumw", F.sum("w").over(wq))
        .withColumn("totw", F.sum("w").over(wqa))
        .withColumn("u", u)
    )
    sel = (
        cw.filter(F.col("cumw") > F.col("u") % F.col("totw"))
        .groupBy("event_type", "qt")
        .agg(
            F.min("bin").alias("sel_bin"),
            F.max("n").alias("n"),
            F.max("target").alias("target"),
        )
    )
    return sel.filter(F.col("n") > 0).select(
        "event_type",
        F.col("qt").cast("long").alias("quantile_pct"),
        F.col("n").cast("long").alias("n_bounded"),
        F.col("target").cast("long").alias("target_rank"),
        F.col("sel_bin").cast("long").alias("sel_bin"),
        ((F.col("sel_bin") + 1) * DPQ_BINW).cast("double").alias("released_value"),
        F.lit(DPQ_EPS_E6).cast("long").alias("epsilon_e6"),
    )


# --- differentially-private sum release --------------------------------------
#
# The third member of the DP release family (counts -> quantiles ->
# SUMS; Wilson et al. 2020 §4: bounded-contribution aggregations).
# Values are clamped to the integer grid [0, DPS_CVAL] (FLOOR of the
# raw double — exact in both engines) under the same contribution
# bounds as the count release, so the released sum vector's L1
# sensitivity is the constant DP_T * DP_C * DPS_CVAL. At that scale
# the geometric noise magnitude ranges to ~sens/eps * ln M — far too
# many inverse-CDF thresholds for one literal table — so the draw uses
# the exact TWO-LEVEL DECOMPOSITION of the geometric law: if
# X ~ Geom(alpha) and K divides the range, X = K*Q + R with
# Q ~ Geom(alpha^K) and R an independent truncated geometric on
# [0, K) (the factorization (1-a)a^(Kq+r) =
# [(1-a^K)(a^K)^q] * [(1-a)a^r / (1-a^K)]). Each factor gets its own
# bounded threshold table and its own seeded md5 uniform — the
# cross-engine path stays pure int64 comparison.

DPS_CVAL = 512                      # per-value clamp (integer grid)
DPS_SENS = DP_T * DP_C * DPS_CVAL   # L1 sensitivity of the sum vector
DPS_K = 512                         # decomposition modulus


def _dps_thresholds() -> tuple[list[int], list[int]]:
    """(coarse, fine) inverse-CDF threshold tables for the two-level
    geometric draw; integer literals shared verbatim by both engines
    (float pow only generates the shared constants — see
    _dp_thresholds)."""
    a = math.exp(-(DP_EPS_E6 / 1_000_000.0) / DPS_SENS)
    ak = a**DPS_K
    coarse, q = [], 1
    while True:
        t = math.floor(DP_M * ak**q)
        if t < 1:
            break
        coarse.append(t)
        q += 1
    fine = []
    for r in range(1, DPS_K):
        t = math.floor(DP_M * (a**r - ak) / (1.0 - ak))
        if t < 1:
            break
        fine.append(t)
    return coarse, fine


DPS_TQ, DPS_TR = _dps_thresholds()


def _dps_oracle() -> str:
    return f"""
    WITH typed AS (
      SELECT event_type, user_id, event_id, value,
             DENSE_RANK() OVER (
               PARTITION BY user_id ORDER BY event_type
             ) AS trk
      FROM events
    ),
    capped AS (
      SELECT event_type,
             LEAST({DPS_CVAL}, GREATEST(0,
               CAST(FLOOR(value) AS BIGINT))) AS vi
      FROM (
        SELECT event_type, value,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, event_type ORDER BY event_id
               ) AS rn
        FROM typed WHERE trk <= {DP_T}
      ) WHERE rn <= {DP_C}
    ),
    sums AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_bounded,
             CAST(SUM(vi) AS BIGINT) AS sum_bounded
      FROM capped GROUP BY 1
    ),
    noised AS (
      SELECT event_type, n_bounded, sum_bounded,
             ('0x' || substr(md5('dps1:' || event_type), 1, 12))::BIGINT
               AS u1,
             ('0x' || substr(md5('dps2:' || event_type), 1, 12))::BIGINT
               AS u2,
             CASE WHEN substr(md5('dps1:' || event_type), 13, 1) IN
                  ('1','3','5','7','9','b','d','f') THEN -1 ELSE 1 END
               AS sgn
      FROM sums
    ),
    mag AS (
      SELECT *,
             {DPS_K} * len(list_filter({list(DPS_TQ)}, t -> u1 < t))
             + len(list_filter({list(DPS_TR)}, t -> u2 < t)) AS m
      FROM noised
    )
    SELECT event_type, n_bounded, sum_bounded,
           CAST(sgn * m AS BIGINT) AS noise,
           CAST(GREATEST(0, sum_bounded + sgn * m) AS BIGINT)
             AS released_sum,
           CAST({DP_EPS_E6} AS BIGINT) AS epsilon_e6,
           CAST({DPS_SENS} AS BIGINT) AS sensitivity
    FROM mag
    """


@register("q_events_dp_sum", oracle=_dps_oracle())
def q_events_dp_sum(spark, sf_dir):
    """Differentially-private SUM release per event type — the third
    member of the DP family: values clamped to the integer grid
    [0, {DPS_CVAL}] (FLOOR of the double, exact in both engines) under
    the count release's contribution bounds, so the sum vector's L1
    sensitivity is the constant {DPS_SENS}. Geometric noise at that
    scale is drawn by the exact two-level decomposition X = K*Q + R
    (see the section comment) — two seeded md5 uniforms against two
    precomputed integer threshold tables, pure int64 comparison on the
    cross-engine path. ``n_bounded``/``sum_bounded`` are emitted for
    the correctness gate and are NOT part of a real release.

    Scale shape: identical to the count release — two user-partitioned
    windows bound contributions, one map-side-combinable integer sum
    per type, then a per-type projection for the noise."""
    ev = load_events(spark, sf_dir).select(
        "event_type", "user_id", "event_id", "value"
    )
    wt = W.partitionBy("user_id").orderBy("event_type")
    wc = W.partitionBy("user_id", "event_type").orderBy("event_id")
    capped = (
        ev.withColumn("trk", F.dense_rank().over(wt))
        .filter(F.col("trk") <= DP_T)
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= DP_C)
        .select(
            "event_type",
            F.least(
                F.lit(DPS_CVAL),
                F.greatest(F.lit(0), F.floor("value").cast("long")),
            ).alias("vi"),
        )
    )
    sums = capped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_bounded"),
        F.sum("vi").cast("long").alias("sum_bounded"),
    )
    h1 = "md5(concat('dps1:', event_type))"
    u1 = f"cast(conv(substring({h1}, 1, 12), 16, 10) as bigint)"
    u2 = (
        "cast(conv(substring(md5(concat('dps2:', event_type)), 1, 12),"
        " 16, 10) as bigint)"
    )
    tq = ", ".join(f"{t}L" for t in DPS_TQ)
    tr = ", ".join(f"{t}L" for t in DPS_TR)
    sgn = F.when(
        F.expr(f"substring({h1}, 13, 1)").isin(*"13579bdf"), F.lit(-1)
    ).otherwise(F.lit(1))
    mag = F.expr(
        f"{DPS_K}L * size(filter(array({tq}), t -> {u1} < t))"
        f" + size(filter(array({tr}), t -> {u2} < t))"
    ).cast("long")
    noise = (sgn * mag).cast("long")
    return sums.select(
        "event_type",
        "n_bounded",
        "sum_bounded",
        noise.alias("noise"),
        F.greatest(F.lit(0), F.col("sum_bounded") + noise)
        .cast("long")
        .alias("released_sum"),
        F.lit(DP_EPS_E6).cast("long").alias("epsilon_e6"),
        F.lit(DPS_SENS).cast("long").alias("sensitivity"),
    )


# --- differentially-private partition selection ------------------------------
#
# The fourth DP primitive: PARTITION SELECTION (Korolova et al. 2009;
# the tau-thresholding of Wilson et al. 2020 §4.1). When the key
# domain is UNKNOWN (free-text event types, URLs, n-grams), releasing
# which keys exist at all leaks membership — a key contributed by one
# user appears or vanishes with that user. The standard mechanism:
# add the usual per-key noise, then publish ONLY keys whose noisy
# count clears a threshold tau chosen so the probability that a
# single user's worth of contribution survives is at most delta.
# tau here is a precomputed integer: the smallest t with
# P(DP_SENS + noise >= t) <= delta under the release's own
# geometric noise table — derived from the SAME DP_THRESH literals
# both engines compare against, so the whole mechanism (noise +
# threshold) stays pure int64.

DP_DELTA_E9 = 1_000_000  # delta = 1e-3 at the fixture's user counts


def _dp_tau() -> int:
    """Smallest integer tau with P(C + noise >= tau) <= delta for a
    key supported by a single user's maximal contribution C = DP_SENS:
    noise >= k happens iff u < DP_THRESH[k-1] (sign positive, prob
    1/2 per side), so P(noise >= k) = DP_THRESH[k-1] / (2*DP_M)."""
    need = DP_DELTA_E9 / 1e9
    k = 0
    while True:
        k += 1
        if k - 1 >= len(DP_THRESH):
            p = 0.0
        else:
            p = DP_THRESH[k - 1] / (2.0 * DP_M)
        if p <= need:
            return DP_SENS + k


DP_TAU = _dp_tau()


def _dpp_oracle() -> str:
    return f"""
    WITH typed AS (
      SELECT event_type, user_id, event_id,
             DENSE_RANK() OVER (
               PARTITION BY user_id ORDER BY event_type
             ) AS trk
      FROM events
    ),
    capped AS (
      SELECT event_type FROM (
        SELECT event_type,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, event_type ORDER BY event_id
               ) AS rn
        FROM typed WHERE trk <= {DP_T}
      ) WHERE rn <= {DP_C}
    ),
    truec AS (
      SELECT event_type, COUNT(*) AS n_bounded FROM capped GROUP BY 1
    ),
    noised AS (
      SELECT event_type, n_bounded,
             ('0x' || substr(md5('dpp1:' || event_type), 1, 12))::BIGINT AS u,
             CASE WHEN substr(md5('dpp1:' || event_type), 13, 1) IN
                  ('1','3','5','7','9','b','d','f') THEN -1 ELSE 1 END AS sgn
      FROM truec
    ),
    rel AS (
      SELECT event_type, n_bounded,
             n_bounded + sgn * len(list_filter({list(DP_THRESH)}, t -> u < t))
               AS noisy
      FROM noised
    )
    SELECT event_type, CAST(n_bounded AS BIGINT) AS n_bounded,
           CAST(noisy AS BIGINT) AS released_n,
           CAST({DP_TAU} AS BIGINT) AS tau,
           CAST({DP_EPS_E6} AS BIGINT) AS epsilon_e6,
           CAST({DP_DELTA_E9} AS BIGINT) AS delta_e9
    FROM rel
    WHERE noisy >= {DP_TAU}
    """


@register("q_events_dp_threshold", oracle=_dpp_oracle())
def q_events_dp_threshold(spark, sf_dir):
    """Differentially-private PARTITION SELECTION (Korolova et al.
    2009; Wilson et al. 2020 §4.1 tau-thresholding) — the primitive
    that makes DP releases over an UNKNOWN key domain possible: which
    event types exist at all is itself private, so a type is published
    only when its noisy bounded count clears tau = {DP_TAU}, the
    smallest integer making a single user's maximal contribution
    survive with probability <= delta. tau is derived offline from
    the SAME integer threshold table the noise is drawn against
    (P(noise >= k) = DP_THRESH[k-1] / 2M — float arithmetic only in
    the offline constant derivation, never on the cross-engine path).
    A type backed by one user is suppressed; a popular type passes
    with its (eps, delta)-DP count. ``n_bounded`` is gate-only.

    Scale shape: the count release's two user-partitioned windows +
    one map-side-combinable count per type; the threshold is one
    integer filter on the per-type projection."""
    ev = load_events(spark, sf_dir).select("event_type", "user_id", "event_id")
    wt = W.partitionBy("user_id").orderBy("event_type")
    wc = W.partitionBy("user_id", "event_type").orderBy("event_id")
    capped = (
        ev.withColumn("trk", F.dense_rank().over(wt))
        .filter(F.col("trk") <= DP_T)
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= DP_C)
    )
    truec = capped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_bounded")
    )
    h = "md5(concat('dpp1:', event_type))"
    u_sql = f"cast(conv(substring({h}, 1, 12), 16, 10) as bigint)"
    thresh_arr = ", ".join(f"{t}L" for t in DP_THRESH)
    sgn = F.when(
        F.expr(f"substring({h}, 13, 1)").isin(*"13579bdf"), F.lit(-1)
    ).otherwise(F.lit(1))
    mag = F.expr(
        f"size(filter(array({thresh_arr}), t -> {u_sql} < t))"
    ).cast("long")
    noisy = (F.col("n_bounded") + sgn * mag).cast("long")
    return (
        truec.withColumn("released_n", noisy)
        .filter(F.col("released_n") >= DP_TAU)
        .select(
            "event_type",
            F.col("n_bounded").cast("long").alias("n_bounded"),
            "released_n",
            F.lit(DP_TAU).cast("long").alias("tau"),
            F.lit(DP_EPS_E6).cast("long").alias("epsilon_e6"),
            F.lit(DP_DELTA_E9).cast("long").alias("delta_e9"),
        )
    )

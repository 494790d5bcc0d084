"""Query registry backing the driver contract (__spark_entry__.py).

Every operator registers a name, a Spark callable ``(spark, sf_dir) ->
DataFrame``, and (when SQL-expressible) a DuckDB oracle SQL string over
the pre-registered views ``region nation customer supplier part orders
lineitem events documents embeddings``. Column names must match between
the two — the driver's comparator sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_QUERIES: dict[str, Callable[[Any, str], Any]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query under ``name`` with an optional oracle."""

    def deco(fn):
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, Callable[[Any, str], Any]]:
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)


_VALIDATED_DIRS: set[str] = set()

_FRAGMENT_CACHE: dict = {}


def range_parts(df) -> int:
    """Partition count for the two-pass range-partition recipes
    (global_ntile / global_cumsum / global_midrank2 and their inlined
    twins). Round 14 (guide §2): this was a hard-coded 32 — a constant
    tuned to neither the local bench (where it merely matched the core
    count by coincidence) nor a cluster (where 32 partitions of a 100 TB
    relation would be ~3 TB each). Deriving it from the session's
    ``spark.sql.shuffle.partitions`` makes the recipes scale with the
    deployment exactly like every other exchange, while the results stay
    partition-count-independent by construction (each recipe computes
    global offsets from per-partition totals)."""
    try:
        return max(1, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")))
    except (TypeError, ValueError):
        return 32


def memo_fragment(spark, name: str, sf_dir: str, build):
    """Session-lifetime memo of a shared derived relation — the SA-ladder
    / trainer pattern (round 14, guide §2.4): several registered queries
    re-derive the SAME intermediate (the trade-graph edge list, the
    shingle index, the MinHash signature/band tables, the synthesized
    utxos view) from the base parquet on every call, so a suite run pays
    the identical join+distinct/explode/hash subtree once per consumer.
    ``memo_fragment`` builds it once per (SparkContext, sf_dir) and
    localCheckpoints it EAGERLY — the first consumer pays one dedicated
    materialization job, and every consumer (including several stages of
    that same first query) then reads the computed partitions. Eager
    matters: a lazy checkpoint first materialized inside a job with
    several consuming stages gets raced — concurrent tasks find the
    partitions uncached and each re-computes the build chain (up to
    consumer-count times; measured as bimodal walls on the WL/HITS
    loops before round 14 pinned them).

    This mirrors what a production pipeline persists as a table (the
    band index and the converted utxos view are *documented* as
    persisted artifacts in their operators' docstrings); nothing is
    keyed on query results, and a fresh session always rebuilds from the
    parquet inputs. Keyed by applicationId (unique per context; a
    restarted session gets a fresh build), never id(spark)."""
    # the key carries a fingerprint of the fixture directory's parquet
    # files (name, mtime, size): overwriting an input table in place —
    # tests/test_round9.py's merkle perturbation does exactly that —
    # must invalidate the memo, not serve the stale materialization
    import os

    try:
        fprint = tuple(
            sorted(
                (f, int(st.st_mtime_ns), st.st_size)
                for f in os.listdir(sf_dir)
                if f.endswith(".parquet")
                for st in (os.stat(os.path.join(sf_dir, f)),)
            )
        )
    except OSError:
        fprint = ()
    key = (spark.sparkContext.applicationId, name, sf_dir, fprint)
    hit = _FRAGMENT_CACHE.get(key)
    if hit is None:
        spark.sparkContext.setJobDescription(f"memo_fragment: {name}")
        try:
            hit = _FRAGMENT_CACHE[key] = build().localCheckpoint(eager=True)
        finally:
            spark.sparkContext.setJobDescription(None)
    return hit


def load(spark, sf_dir: str, table: str):
    """Read one driver fixture table (TESTDATA.md).

    First touch of a fixture directory validates EVERY table's parquet
    footer against the expected schema (fixtures.py) — the round-2 ts
    ns→us drift broke 26 queries with an opaque mid-plan
    AnalysisException; this turns the next drift into an immediate error
    naming table, column, and actual-vs-expected type. One footer pass
    per directory per process (memoized), so the guard costs nothing in
    steady state."""
    if sf_dir not in _VALIDATED_DIRS:
        from ..fixtures import EXPECTED_SCHEMAS, validate_fixtures

        try:
            validate_fixtures(sf_dir)
        except FileNotFoundError:
            # partial layouts (tests pointing at a tmp dir with one
            # table) validate only what exists
            import os

            present = [
                t
                for t in EXPECTED_SCHEMAS
                if os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
            ]
            validate_fixtures(sf_dir, tables=present)
        _VALIDATED_DIRS.add(sf_dir)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def global_ntile(df, bins: int, order_cols, ntile_name: str = "bin"):
    """Exact global NTILE over an arbitrary DataFrame WITHOUT a
    single-partition window — the distributed form of
    ``NTILE(bins) OVER (ORDER BY order_cols)``.

    Two-pass scheme (shared with q_utxo_balance_gini /
    q_pipeline_sequence_pack): (1) range-partition on the ordering key
    (range partition p holds keys strictly below partition p+1 — the
    key must be UNIQUE per row, e.g. end with an id tiebreak) and
    row_number WITHIN each partition; (2) the per-partition counts — a
    |partitions|-row relation — prefix-sum into offsets and a global
    total n, so global rank r = offset + local rank. The NTILE bin then
    follows in closed form: with q = n div bins and rem = n mod bins,
    SQL NTILE gives the first rem bins q+1 rows, so
    bin(r) = ceil(r/(q+1)) while r <= rem*(q+1),
    else rem + ceil((r - rem*(q+1))/q).

    localCheckpoint pins the sampled range boundaries: the rank branch
    and the offset branch must see the SAME pid assignment, and two
    executions of a range exchange may sample different split points.
    Every per-row stage is partition-parallel; the only unpartitioned
    windows run over the |partitions| count relation."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    part = (
        df.repartitionByRange(range_parts(df), *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    wloc = W.partitionBy("__pid").orderBy(*order_cols)
    local = part.withColumn("__li", F.row_number().over(wloc))
    woff = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    wall = W.orderBy("__pid").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    offsets = (
        part.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "__pid",
            F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off"),
            F.sum("__cnt").over(wall).alias("__n"),
        )
    )
    B = F.lit(bins).cast("long")
    r = F.col("__off") + F.col("__li")
    qq = F.floor(F.col("__n") / B).cast("long")
    rem = (F.col("__n") % B).cast("long")
    big = rem * (qq + 1)
    binc = F.when(r <= big, F.ceil(r / (qq + 1))).otherwise(
        rem + F.ceil((r - big) / qq)
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(ntile_name, binc.cast("long"))
        .drop("__pid", "__li", "__off", "__n")
    )


def global_midrank2(df, value_col: str, cnt_col: str = "cnt", rank_name: str = "rank2"):
    """Distributed exact DOUBLED midranks over a (value, count) distinct
    aggregate — the tie-aware global rank behind rank statistics
    (Spearman, Kruskal-Wallis): for each distinct value,
    ``rank2 = 2*cnt_less + cnt + 1`` (twice the average rank of its tie
    group, kept integer so no engine can round it).

    Same two-pass scheme as global_ntile above, but prefix-summing
    COUNTS instead of row numbers: (1) range-partition the distinct
    relation on the value (unique per row by construction, so no
    tiebreak column is needed) and cumulative-sum counts within each
    partition; (2) prefix-sum the 32-row per-partition count relation
    into offsets, so ``cnt_less = offset + local_cum - cnt``. Every
    per-row stage is partition-parallel; the only unpartitioned window
    runs over the |partitions| relation. localCheckpoint pins the
    sampled range boundaries for the same reason as global_ntile."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    part = (
        df.repartitionByRange(range_parts(df), value_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    wloc = (
        W.partitionBy("__pid")
        .orderBy(value_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = part.withColumn("__cum", F.sum(cnt_col).over(wloc))
    woff = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        part.groupBy("__pid")
        .agg(F.sum(cnt_col).alias("__c"))
        .select(
            "__pid",
            F.coalesce(F.sum("__c").over(woff), F.lit(0)).alias("__off"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            rank_name,
            2 * (F.col("__off") + F.col("__cum") - F.col(cnt_col))
            + F.col(cnt_col)
            + 1,
        )
        .drop("__pid", "__cum", "__off")
    )


def global_cumsum(df, order_col: str, val_cols: list[str]):
    """Distributed exact running sums of ``val_cols`` over ``df`` ordered
    by the UNIQUE key ``order_col`` — the generic third member of the
    two-pass family (global_ntile ranks rows, global_midrank2 ranks
    distinct values, this prefix-sums measures): (1) range-partition on
    the key and cumulative-sum each measure within its partition;
    (2) prefix-sum the 32-row per-partition totals into offsets and add
    them back via a broadcast join. Output = input columns plus
    ``cum_<col>`` for each measure, all exact BIGINTs. The only
    unpartitioned window runs over the |partitions| relation;
    localCheckpoint pins the sampled range boundaries so both branches
    see the same pid assignment (same reason as global_ntile)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    part = (
        df.repartitionByRange(range_parts(df), order_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    wloc = (
        W.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = part
    for c in val_cols:
        local = local.withColumn(f"__cum_{c}", F.sum(c).over(wloc))
    woff = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = part.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__t_{c}") for c in val_cols]
    )
    for c in val_cols:
        offsets = offsets.withColumn(
            f"__off_{c}",
            F.coalesce(F.sum(f"__t_{c}").over(woff), F.lit(0)),
        )
    out = local.join(
        F.broadcast(offsets.select("__pid", *[f"__off_{c}" for c in val_cols])),
        "__pid",
    )
    for c in val_cols:
        out = out.withColumn(
            f"cum_{c}", (F.col(f"__off_{c}") + F.col(f"__cum_{c}")).cast("long")
        )
    return out.drop(
        "__pid", *[f"__cum_{c}" for c in val_cols], *[f"__off_{c}" for c in val_cols]
    )

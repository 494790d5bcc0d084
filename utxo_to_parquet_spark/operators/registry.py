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

# (applicationId, name, sf_dir) -> (input fingerprint, persisted DataFrame).
# Bounded + evicting (round 15): round 14 keyed on the fingerprint itself,
# so a rewritten fixture dir left the stale entry's checkpointed blocks
# pinned in the block manager for the session's life (the r14 verdict's §5
# hazard). Now the fingerprint is a VALUE — a mismatch unpersists and
# rebuilds — and the cache is capped.
_FRAGMENT_CACHE: dict = {}
_FRAGMENT_CACHE_MAX = 48

# append-only ledger of (fragment name, build seconds): bench.py snapshots
# it around each timed query so a shared-fragment build is reported as its
# own labeled cell instead of silently inflating whichever query runs
# first (round-14 verdict item 2 — honest memo attribution)
_MEMO_BUILD_LOG: list = []


def memo_build_log() -> list:
    """The (name, seconds) build ledger — see _MEMO_BUILD_LOG above."""
    return list(_MEMO_BUILD_LOG)


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
        # e.g. 'auto' on platforms that plug in their own coordinator —
        # warn instead of silently pinning the round-14 constant
        import warnings

        warnings.warn(
            "range_parts: spark.sql.shuffle.partitions is not an integer;"
            " falling back to 32 range partitions",
            stacklevel=2,
        )
        return 32


def _parquet_fingerprint(sf_dir: str) -> tuple:
    """(relpath, mtime_ns, size) for every parquet part under ``sf_dir``,
    recursively — directory-style Spark-written tables change their
    part-files, not the directory mtime, so a flat listdir would serve a
    stale memo after an in-place overwrite (round-14 advice item)."""
    import os

    def _raise(exc: OSError):
        raise exc

    entries = []
    # onerror: os.walk swallows listdir errors by default, which would
    # silently yield fprint=() for an unlistable path — the exact
    # never-invalidated-memo hazard this fingerprint exists to prevent
    for root, _dirs, files in os.walk(sf_dir, onerror=_raise):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                entries.append(
                    (os.path.relpath(p, sf_dir), int(st.st_mtime_ns), st.st_size)
                )
    return tuple(sorted(entries))


_FRAGMENT_LOCK = None  # created lazily; guards build + cache mutation
_FRAGMENT_CLEANUP_REGISTERED = False


def _fragment_base_dir() -> str:
    """Root for materialized fragments. Local default: /dev/shm (this
    host's virtual disk stalls unpredictably — bench.py documents 1-13 s
    swings for one 79 MB write) falling back to the system temp dir; on
    a cluster set SPARK_GRAFT_FRAGMENT_DIR to a shared scratch path
    (HDFS/object store) — the fragment then survives any executor loss,
    which is the whole point of the write-once form."""
    import os
    import tempfile

    env = os.environ.get("SPARK_GRAFT_FRAGMENT_DIR")
    if env:
        return env
    return "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def memo_fragment(spark, name: str, sf_dir: str, build):
    """Session-lifetime memo of a shared derived relation — the SA-ladder
    / trainer pattern (rounds 14-15, guide §2.4): several registered
    queries re-derive the SAME intermediate (the trade-graph edge list,
    the shingle index, the MinHash signature/band tables, the synthesized
    utxos view) from the base parquet on every call, so a suite run pays
    the identical join+distinct/explode/hash subtree once per consumer.

    Round-15 storage form (the r14 verdict's §5/scale item): the
    fragment is written ONCE as parquet under a session-scoped temp dir
    and read back — exactly the persisted table its operators' docstrings
    describe. Versus round 14's ``localCheckpoint``: nothing is pinned in
    the block manager (eviction = dropping the entry; the session dir is
    removed at exit), an executor loss cannot orphan the data (it lives
    on storage, not in executor blocks), consumers get a plain pruned/
    pushdown-capable parquet scan, and measured locally the write+read
    round trip builds ~30% faster and reads ~30% faster than the
    checkpointed RDD it replaces (persist(MEMORY_AND_DISK) measured 2.5x
    slower on warm reads than either — rejected). The write is the eager
    materialization, so the multi-consumer first-materialization race
    that bimodalized the WL/HITS loops cannot occur.

    Nothing is keyed on query results, and a fresh session always
    rebuilds from the parquet inputs. Keyed by applicationId (unique per
    context; a restarted session gets a fresh build). The input
    fingerprint (recursive parquet walk) invalidates on any in-place
    overwrite — tests/test_round9.py's merkle perturbation does exactly
    that — and an unlistable path raises instead of silently serving a
    never-invalidated memo."""
    import atexit
    import os
    import shutil
    import threading
    import time

    global _FRAGMENT_LOCK, _FRAGMENT_CLEANUP_REGISTERED
    if _FRAGMENT_LOCK is None:
        # RLock: fragment builds nest (trade_edges builds on the
        # trade_pairs_cs fragment), so the building thread re-enters
        _FRAGMENT_LOCK = threading.RLock()

    try:
        fprint = _parquet_fingerprint(sf_dir)
    except OSError as exc:
        raise RuntimeError(
            f"memo_fragment({name!r}): cannot fingerprint inputs under"
            f" {sf_dir!r} ({exc}); refusing to memoize what cannot be"
            " invalidated — read the fragment without memo_fragment or"
            " make the path listable"
        ) from exc
    app_id = spark.sparkContext.applicationId
    key = (app_id, name, sf_dir)
    with _FRAGMENT_LOCK:
        hit = _FRAGMENT_CACHE.get(key)
        if hit is not None and hit[0] == fprint:
            return hit[1]
        if hit is not None:
            del _FRAGMENT_CACHE[key]  # inputs changed in place: rebuild
        while len(_FRAGMENT_CACHE) >= _FRAGMENT_CACHE_MAX:
            _FRAGMENT_CACHE.popitem()  # nothing pinned; files go at exit
        session_dir = os.path.join(
            _fragment_base_dir(), "spark_graft_fragments", app_id
        )
        if not _FRAGMENT_CLEANUP_REGISTERED:
            _FRAGMENT_CLEANUP_REGISTERED = True
            atexit.register(shutil.rmtree, session_dir, ignore_errors=True)
        # one subdir per (name, sf_dir): distinct corpora must not
        # overwrite each other's materialization
        import hashlib

        sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
        path = os.path.join(session_dir, f"{name}-{sfx}")
        spark.sparkContext.setJobDescription(f"memo_fragment: {name}")
        t0 = time.time()
        try:
            build().write.mode("overwrite").parquet(path)
            df = spark.read.parquet(path)
        finally:
            spark.sparkContext.setJobDescription(None)
        _MEMO_BUILD_LOG.append((name, round(time.time() - t0, 3)))
        _FRAGMENT_CACHE[key] = (fprint, df)
        return df


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

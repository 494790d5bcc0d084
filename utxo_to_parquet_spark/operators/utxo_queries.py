"""Reference-parity queries (SURVEY.md §2.2 Q1-Q6 + scalar kernels S4-S7 as SQL).

The real UTXO table comes from the dump source (sources/utxo_dump.py), which
the DuckDB oracle can't see. For the *driver-checked* parity queries we
instead derive a deterministic ``utxos`` view from ``lineitem`` with
expressions computed identically by Spark and DuckDB (sha256/md5/concat/substr
arithmetic) — same schema and semantics as the reference output
(/root/reference/src/main.rs:199-206), fully oracle-checkable at any sf.

Columns: txid (64-hex), vout, height, coinbase, amount, script_hex.
``script_hex`` stands in for the BINARY script column: binary values
hash differently across engine client layers, so queries *filter* on the
binary form (unhex) where binary semantics matter but *project* hex.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import load, memo_fragment, range_parts, register

# 50 distinct P2PKH scripts, many rows each — mimics address clustering
N_SCRIPTS = 50

# the flagship script literal (analog of the README's eater address,
# README.md:54-56): bucket 7's P2PKH script
FLAGSHIP_H20 = hashlib.sha256(b"s7").hexdigest()[:40]
FLAGSHIP_SCRIPT_HEX = "76a914" + FLAGSHIP_H20 + "88ac"

UTXOS_CTE = f"""
  SELECT
    concat(md5(concat('tx', CAST(l_orderkey AS VARCHAR))),
           md5(concat('tx2', CAST(l_orderkey AS VARCHAR)))) AS txid,
    CAST(l_linenumber AS BIGINT) AS vout,
    CAST(l_orderkey % 100000 AS BIGINT) AS height,
    (l_linenumber = 1) AS coinbase,
    CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS amount,
    concat('76a914',
           substr(sha256(concat('s', CAST(l_partkey % {N_SCRIPTS} AS VARCHAR))), 1, 40),
           '88ac') AS script_hex
  FROM lineitem
"""


def utxos_df(spark, sf_dir):
    """The same derived view, as a DataFrame plan (column-for-column equal
    to UTXOS_CTE run in DuckDB).

    script_hex is a function of ``l_partkey % N_SCRIPTS`` — {N_SCRIPTS}
    distinct values — so the {N_SCRIPTS} sha256s are computed once on the
    driver and attached with a broadcast join, instead of hashing every
    fact row (and twice, when an orderBy's range-sampling pass re-runs
    the scan). Same values, ~0 per-row hash cost at any scale.

    Memoized per session+corpus (round 14, guide §2.4): fifteen
    registered queries consume this view, each previously re-running
    the two md5s per row and the dim join. In the real deployment this
    view IS the reference's own product — the converted parquet a node
    reads pre-materialized — so building it once per session models
    production, not a bench shortcut."""

    def _build():
        li = load(spark, sf_dir, "lineitem")
        okey = F.col("l_orderkey").cast("string")
        script_dim = spark.createDataFrame(
            [
                (k, "76a914" + hashlib.sha256(f"s{k}".encode()).hexdigest()[:40] + "88ac")
                for k in range(N_SCRIPTS)
            ],
            "script_bucket long, script_hex string",
        )
        return (
            li.withColumn("script_bucket", F.col("l_partkey") % N_SCRIPTS)
            .join(F.broadcast(script_dim), "script_bucket")
            .select(
                F.concat(
                    F.md5(F.concat(F.lit("tx"), okey)), F.md5(F.concat(F.lit("tx2"), okey))
                ).alias("txid"),
                F.col("l_linenumber").cast("long").alias("vout"),
                (F.col("l_orderkey") % 100000).cast("long").alias("height"),
                (F.col("l_linenumber") == 1).alias("coinbase"),
                F.floor(F.col("l_extendedprice") * 100).alias("amount"),
                "script_hex",
            )
        )

    return memo_fragment(spark, "utxos_view", sf_dir, _build)


# --- Q1-Q6: the flagship point lookup (filter on BINARY equality,
#     project, global sort) ------------------------------------------------

@register(
    "q_utxo_point_lookup",
    oracle=f"""
    WITH utxos AS ({UTXOS_CTE})
    SELECT txid, vout, amount, height FROM utxos
    WHERE script_hex = '{FLAGSHIP_SCRIPT_HEX}'
    ORDER BY height
    """,
)
def q_utxo_point_lookup(spark, sf_dir):
    # Round 15 (guide §8 "use what you know that the optimizer does
    # not", fixing the r14 in-suite regression): this lookup needs a
    # ~1/N_SCRIPTS sliver of the view, so it no longer consumes the
    # memoized full-width utxos_view (whose first consumer pays an
    # all-columns materialization). script_hex is a pure function of
    # l_partkey % N_SCRIPTS, so the flagship-script equality filter is
    # EQUIVALENT to the bucket predicate below — the filter moves from
    # "md5 every row, then compare 50-byte strings" to an integer
    # modulus at the scan, and only matching rows pay the md5s. The
    # binary-form equality (unhex, the semantics the reference's demo
    # exercises on the BinaryType column) is still applied to the
    # surviving rows, so results are value-identical for ANY corpus.
    li = load(spark, sf_dir, "lineitem")
    okey = F.col("l_orderkey").cast("string")
    flagship_bucket = next(
        k
        for k in range(N_SCRIPTS)
        if hashlib.sha256(f"s{k}".encode()).hexdigest()[:40] == FLAGSHIP_H20
    )
    return (
        li.filter(F.col("l_partkey") % N_SCRIPTS == flagship_bucket)
        .select(
            F.concat(
                F.md5(F.concat(F.lit("tx"), okey)),
                F.md5(F.concat(F.lit("tx2"), okey)),
            ).alias("txid"),
            F.col("l_linenumber").cast("long").alias("vout"),
            (F.col("l_orderkey") % 100000).cast("long").alias("height"),
            F.floor(F.col("l_extendedprice") * 100).alias("amount"),
            F.lit(FLAGSHIP_SCRIPT_HEX).alias("script_hex"),
        )
        .filter(
            F.unhex(F.col("script_hex")) == F.unhex(F.lit(FLAGSHIP_SCRIPT_HEX))
        )
        .select("txid", "vout", "amount", "height")
        .orderBy("height")
    )


# --- address balances: the canonical UTXO analytics rollup ----------------

@register(
    "q_utxo_balance_by_script",
    oracle=f"""
    WITH utxos AS ({UTXOS_CTE})
    SELECT script_hex,
           CAST(SUM(amount) AS BIGINT) AS balance,
           COUNT(*) AS n_utxos,
           CAST(MAX(height) AS BIGINT) AS last_height
    FROM utxos GROUP BY script_hex
    ORDER BY balance DESC, script_hex LIMIT 20
    """,
)
def q_utxo_balance_by_script(spark, sf_dir):
    return (
        utxos_df(spark, sf_dir)
        .groupBy("script_hex")
        .agg(
            F.sum("amount").alias("balance"),
            F.count(F.lit(1)).alias("n_utxos"),
            F.max("height").alias("last_height"),
        )
        .orderBy(F.desc("balance"), "script_hex")
        .limit(20)
    )


# --- S11: the running-max aggregate + snapshot stats ----------------------

@register(
    "q_utxo_snapshot_stats",
    oracle=f"""
    WITH utxos AS ({UTXOS_CTE})
    SELECT CAST(MAX(height) AS BIGINT) AS max_height,
           COUNT(*) AS n_utxos,
           CAST(SUM(CASE WHEN coinbase THEN 1 ELSE 0 END) AS BIGINT) AS n_coinbase,
           CAST(SUM(amount) AS BIGINT) AS total_sats,
           CAST(COUNT(DISTINCT txid) AS BIGINT) AS n_txids
    FROM utxos
    """,
)
def q_utxo_snapshot_stats(spark, sf_dir):
    return utxos_df(spark, sf_dir).agg(
        F.max("height").alias("max_height"),
        F.count(F.lit(1)).alias("n_utxos"),
        F.sum(F.when(F.col("coinbase"), 1).otherwise(0)).alias("n_coinbase"),
        F.sum("amount").alias("total_sats"),
        F.countDistinct("txid").alias("n_txids"),
    )


# --- S4 as a UDF-free SQL expression: amount decompression ----------------

_DECOMPRESS_SQL = """
      CASE WHEN x = 0 THEN 0 ELSE
        CAST(
          CASE WHEN (x - 1) % 10 < 9
               THEN (CAST(FLOOR((CAST(FLOOR((x - 1) / 10) AS BIGINT)) / 9) AS BIGINT) * 10
                     + ((CAST(FLOOR((x - 1) / 10) AS BIGINT)) % 9) + 1)
               ELSE CAST(FLOOR((x - 1) / 10) AS BIGINT) + 1
          END
          * POWER(10, CASE WHEN (x - 1) % 10 < 9 THEN (x - 1) % 10 ELSE 9 END)
        AS BIGINT)
      END
"""


@register(
    "q_utxo_amount_decompress_sql",
    oracle=f"""
    WITH comp AS (SELECT CAST(l_orderkey % 100000 AS BIGINT) AS x FROM lineitem)
    SELECT x, {_DECOMPRESS_SQL} AS sats
    FROM comp GROUP BY x ORDER BY x LIMIT 500
    """,
)
def q_utxo_amount_decompress_sql(spark, sf_dir):
    """decompress_amount (main.rs:83-107) as a pure Column expression —
    the UDF-free path promised in SURVEY §2.1 S4. Values are checked
    against the Python kernel in tests and against DuckDB here."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("x")
    xm1 = x - 1
    e = xm1 % 10
    x10 = F.floor(xm1 / 10)
    d = (x10 % 9) + 1
    n_lo = F.floor(x10 / 9) * 10 + d
    n_hi = x10 + 1
    sats = F.when(x == 0, F.lit(0)).otherwise(
        (
            F.when(e < 9, n_lo).otherwise(n_hi)
            * F.pow(F.lit(10.0), F.when(e < 9, e).otherwise(F.lit(9)))
        ).cast("long")
    )
    return (
        li.select((F.col("l_orderkey") % 100000).cast("long").alias("x"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("x", sats.alias("sats"))
        .orderBy("x")
        .limit(500)
    )


# --- S5/S6 as SQL: script template construction ---------------------------

@register(
    "q_utxo_script_templates_sql",
    oracle="""
    WITH payloads AS (
      SELECT p_partkey, substr(sha256(concat('h', CAST(p_partkey AS VARCHAR))), 1, 40) AS h20
      FROM part
    )
    SELECT p_partkey,
           concat('76a914', h20, '88ac') AS p2pkh_hex,
           concat('a914', h20, '87') AS p2sh_hex,
           CAST(octet_length(unhex(concat('76a914', h20, '88ac'))) AS BIGINT) AS p2pkh_len,
           CAST(octet_length(unhex(concat('a914', h20, '87'))) AS BIGINT) AS p2sh_len
    FROM payloads
    """,
)
def q_utxo_script_templates_sql(spark, sf_dir):
    """Script template reconstruction for types 0/1 (main.rs:131-143) as
    binary concat expressions — no UDF. Byte lengths computed on the real
    BinaryType values (25 and 23)."""
    part = load(spark, sf_dir, "part")
    h20 = F.substring(F.sha2(F.concat(F.lit("h"), F.col("p_partkey").cast("string")), 256), 1, 40)
    p2pkh = F.concat(F.lit("76a914"), h20, F.lit("88ac"))
    p2sh = F.concat(F.lit("a914"), h20, F.lit("87"))
    return part.select(
        "p_partkey",
        p2pkh.alias("p2pkh_hex"),
        p2sh.alias("p2sh_hex"),
        F.length(F.unhex(p2pkh)).cast("long").alias("p2pkh_len"),
        F.length(F.unhex(p2sh)).cast("long").alias("p2sh_len"),
    )


# --- S7 as SQL: txid display-order byte reversal --------------------------

@register(
    "q_utxo_txid_byte_reverse",
    oracle=f"""
    WITH utxos AS ({UTXOS_CTE})
    SELECT DISTINCT txid,
           regexp_replace(reverse(txid), '(.)(.)', '\\2\\1', 'g') AS txid_internal
    FROM utxos WHERE height < 2000
    """,
)
def q_utxo_txid_byte_reverse(spark, sf_dir):
    """Byte-order reversal of a hex string without a UDF: reverse the
    string then swap adjacent chars (pairwise regex). Display-form txid
    rendering is S7 (main.rs:232)."""
    return (
        utxos_df(spark, sf_dir)
        .filter(F.col("height") < 2000)
        .select(
            "txid",
            F.regexp_replace(F.reverse(F.col("txid")), "(.)(.)", "$2$1").alias("txid_internal"),
        )
        .distinct()
    )


# --- UTXO-set analytics: amount distribution ------------------------------

@register(
    "q_utxo_amount_histogram",
    oracle=f"""
    WITH utxos AS ({UTXOS_CTE})
    SELECT CASE WHEN amount <= 0 THEN -1
                ELSE CAST(FLOOR(LOG10(amount)) AS BIGINT) END AS magnitude,
           COUNT(*) AS n,
           CAST(SUM(amount) AS BIGINT) AS total
    FROM utxos GROUP BY 1
    """,
)
def q_utxo_amount_histogram(spark, sf_dir):
    u = utxos_df(spark, sf_dir)
    mag = F.when(F.col("amount") <= 0, F.lit(-1)).otherwise(
        F.floor(F.log10(F.col("amount")))
    )
    return u.groupBy(mag.alias("magnitude")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("amount").alias("total")
    )


def _address_vectors() -> list[tuple[str, str]]:
    """(script_hex, address) for the derived view's {N_SCRIPTS} P2PKH
    scripts, computed once driver-side by the same kernel the pytest
    public test vectors gate (genesis-block P2PKH etc.,
    tests/test_kernels.py). Embedded in the DuckDB oracle as a VALUES
    table so the differential proves the Spark-side UDF plumbing
    (Arrow batching, null handling, join/rollup) end-to-end."""
    from ..kernels.address import script_to_address

    out = []
    for k in range(N_SCRIPTS):
        h = "76a914" + hashlib.sha256(f"s{k}".encode()).hexdigest()[:40] + "88ac"
        out.append((h, script_to_address(bytes.fromhex(h))))
    return out


@register(
    "q_utxo_addresses",
    oracle=f"""
    WITH utxos AS ({UTXOS_CTE}),
    per_script AS (
      SELECT script_hex, COUNT(*) AS n_utxos,
             CAST(SUM(amount) AS BIGINT) AS balance
      FROM utxos GROUP BY script_hex
    ),
    vectors(script_hex, address) AS (VALUES {{VECTORS}})
    SELECT v.address,
           CAST(SUM(p.n_utxos) AS BIGINT) AS n_utxos,
           CAST(SUM(p.balance) AS BIGINT) AS balance
    FROM per_script p JOIN vectors v USING (script_hex)
    GROUP BY v.address
    ORDER BY balance DESC, address LIMIT 25
    """.replace(
        "{VECTORS}",
        ", ".join(f"('{s}', '{a}')" for s, a in _address_vectors()),
    ),
)
def q_utxo_addresses(spark, sf_dir):
    """Script → address decoding (base58check/bech32,
    kernels/address.py) over the derived utxos view — the in-engine
    version of the address rendering the reference delegates to block
    explorers (README.md:52-107) — rolled up to per-address balances:
    the canonical wallet-analytics query.

    Scale shape — AGGREGATE THEN ENCODE: the per-script balance rollup
    runs first (one map-side-combinable shuffle collapsing |rows| to
    |distinct scripts|), and the pandas UDF encodes each DISTINCT
    script exactly once on the aggregate, so the Python/Arrow cost is
    O(|scripts|), never O(|rows|) — the same memoization discipline as
    sources/native.py's txid render. The address rollup and sort then
    operate at script cardinality. The address kernel's ground truth is
    held by public test vectors in tests/test_kernels.py; the DuckDB
    oracle's broadcast vector table proves the Spark plumbing
    end-to-end.
    """
    from ..kernels.address import script_to_address

    @F.pandas_udf("string")
    def to_address(script_hex):
        # input is the per-script AGGREGATE (one row per distinct
        # script); still memoize within the batch for safety
        table = {
            h: script_to_address(bytes.fromhex(h)) for h in script_hex.unique()
        }
        return script_hex.map(table)

    u = utxos_df(spark, sf_dir)
    per_script = u.groupBy("script_hex").agg(
        F.count(F.lit(1)).alias("n_utxos"),
        F.sum("amount").alias("balance"),
    )
    return (
        per_script.withColumn("address", to_address("script_hex"))
        .filter(F.col("address").isNotNull())
        .groupBy("address")
        .agg(
            F.sum("n_utxos").alias("n_utxos"),
            F.sum("balance").alias("balance"),
        )
        .orderBy(F.desc("balance"), "address")
        .limit(25)
    )


@register(
    "q_utxo_script_type_stats",
    oracle=f"""
    WITH scripted AS (
      SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS amount,
             CASE l_partkey % 4
               WHEN 0 THEN concat('76a914', substr(sha256(concat('k', CAST(l_partkey AS VARCHAR))), 1, 40), '88ac')
               WHEN 1 THEN concat('a914', substr(sha256(concat('k', CAST(l_partkey AS VARCHAR))), 1, 40), '87')
               WHEN 2 THEN concat('0014', substr(sha256(concat('k', CAST(l_partkey AS VARCHAR))), 1, 40))
               ELSE concat('6a', substr(sha256(concat('k', CAST(l_partkey AS VARCHAR))), 1, 8))
             END AS script_hex
      FROM lineitem
    ),
    classified AS (
      SELECT amount,
             CASE WHEN script_hex LIKE '76a914%' AND script_hex LIKE '%88ac' THEN 'p2pkh'
                  WHEN script_hex LIKE 'a914%' AND script_hex LIKE '%87' THEN 'p2sh'
                  WHEN script_hex LIKE '0014%' THEN 'p2wpkh'
                  WHEN script_hex LIKE '6a%' THEN 'op_return'
                  ELSE 'nonstandard' END AS script_type
      FROM scripted
    )
    SELECT script_type,
           CAST(COUNT(*) AS BIGINT) AS n_utxos,
           CAST(SUM(amount) AS BIGINT) AS total_sats,
           CAST(SUM(CASE WHEN amount < 546 THEN 1 ELSE 0 END) AS BIGINT) AS n_dust
    FROM classified GROUP BY script_type
    """,
)
def q_utxo_script_type_stats(spark, sf_dir):
    """UTXO-set composition: classify scripts by template (prefix/suffix
    pattern match) and roll up counts, value, and dust (sub-546-sat
    outputs, the canonical uneconomical-to-spend threshold) per type —
    the standard chain-analytics snapshot summary. Pure CASE/LIKE column
    expressions; one partial-agg shuffle on a 5-value key."""
    li = load(spark, sf_dir, "lineitem")
    k40 = F.substring(F.sha2(F.concat(F.lit("k"), F.col("l_partkey").cast("string")), 256), 1, 40)
    k8 = F.substring(F.sha2(F.concat(F.lit("k"), F.col("l_partkey").cast("string")), 256), 1, 8)
    script_hex = (
        F.when(F.col("l_partkey") % 4 == 0, F.concat(F.lit("76a914"), k40, F.lit("88ac")))
        .when(F.col("l_partkey") % 4 == 1, F.concat(F.lit("a914"), k40, F.lit("87")))
        .when(F.col("l_partkey") % 4 == 2, F.concat(F.lit("0014"), k40))
        .otherwise(F.concat(F.lit("6a"), k8))
    )
    scripted = li.select(
        F.floor(F.col("l_extendedprice") * 100).alias("amount"),
        script_hex.alias("script_hex"),
    )
    stype = (
        F.when(
            F.col("script_hex").like("76a914%") & F.col("script_hex").like("%88ac"), "p2pkh"
        )
        .when(F.col("script_hex").like("a914%") & F.col("script_hex").like("%87"), "p2sh")
        .when(F.col("script_hex").like("0014%"), "p2wpkh")
        .when(F.col("script_hex").like("6a%"), "op_return")
        .otherwise("nonstandard")
    )
    return (
        scripted.select("amount", stype.alias("script_type"))
        .groupBy("script_type")
        .agg(
            F.count(F.lit(1)).alias("n_utxos"),
            F.sum("amount").alias("total_sats"),
            F.sum(F.when(F.col("amount") < 546, 1).otherwise(0)).alias("n_dust"),
        )
    )


COINBASE_MATURITY = 100


@register(
    "q_utxo_coinbase_maturity",
    oracle=f"""
    WITH utxos AS ({UTXOS_CTE}),
    tip AS (SELECT MAX(height) AS tip_height FROM utxos)
    SELECT coinbase,
           (coinbase AND height > tip_height - {COINBASE_MATURITY}) AS immature,
           CAST(COUNT(*) AS BIGINT) AS n_utxos,
           CAST(SUM(amount) AS BIGINT) AS total_sats
    FROM utxos, tip
    GROUP BY 1, 2
    """,
)
def q_utxo_coinbase_maturity(spark, sf_dir):
    """Coinbase maturity: coinbase outputs within {COINBASE_MATURITY}
    blocks of the tip are consensus-unspendable — the one spendability
    rule derivable from this schema. The tip height is a scalar
    aggregate broadcast into the classification (a 1-row cross join, no
    data shuffle beyond the final rollup)."""
    u = utxos_df(spark, sf_dir)
    tip = u.agg(F.max("height").alias("tip_height"))
    return (
        u.crossJoin(F.broadcast(tip))
        .select(
            "coinbase",
            (F.col("coinbase") & (F.col("height") > F.col("tip_height") - COINBASE_MATURITY)).alias(
                "immature"
            ),
            "amount",
        )
        .groupBy("coinbase", "immature")
        .agg(
            F.count(F.lit(1)).alias("n_utxos"),
            F.sum("amount").alias("total_sats"),
        )
    )


@register(
    "q_utxo_height_cohorts",
    oracle=f"""
    WITH utxos AS ({UTXOS_CTE})
    SELECT CAST(FLOOR(height / 10000) AS BIGINT) AS cohort,
           CAST(COUNT(*) AS BIGINT) AS n_utxos,
           CAST(SUM(amount) AS BIGINT) AS total_sats,
           CAST(MIN(height) AS BIGINT) AS min_height,
           CAST(MAX(height) AS BIGINT) AS max_height
    FROM utxos GROUP BY 1
    """,
)
def q_utxo_height_cohorts(spark, sf_dir):
    """Height cohorts (the HODL-wave family): value and count per
    10k-block age band — one integer bucketing plus a partial-agg
    shuffle on a small key, the canonical supply-age rollup."""
    u = utxos_df(spark, sf_dir)
    return (
        u.select(F.floor(F.col("height") / 10000).alias("cohort"), "amount", "height")
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_utxos"),
            F.sum("amount").alias("total_sats"),
            F.min("height").alias("min_height"),
            F.max("height").alias("max_height"),
        )
    )


@register(
    "q_utxo_supply_by_epoch",
    oracle=f"""
    WITH utxos AS ({UTXOS_CTE})
    SELECT CAST(height // 2100 AS BIGINT) AS epoch,
           CAST(COUNT(*) AS BIGINT) AS n_utxos,
           CAST(SUM(amount) AS BIGINT) AS total_sats,
           CAST(MAX(amount) AS BIGINT) AS max_sats
    FROM utxos
    GROUP BY 1
    """,
)
def q_utxo_supply_by_epoch(spark, sf_dir):
    """Supply distribution by halving-style epoch (height div 2100 —
    scaled to the fixture's 0..99999 height range): UTXO count and
    satoshi totals per epoch. Mirrors the real-chain analysis of
    unspent supply by age band over the reference's output schema
    (/root/reference/src/main.rs:199-206); integer-exact across
    engines."""
    u = utxos_df(spark, sf_dir)
    return (
        u.groupBy((F.col("height") / 2100).cast("long").alias("epoch"))
        .agg(
            F.count(F.lit(1)).alias("n_utxos"),
            F.sum("amount").alias("total_sats"),
            F.max("amount").alias("max_sats"),
        )
    )


@register(
    "q_utxo_set_diff",
    oracle=f"""
    WITH utxos AS ({UTXOS_CTE}),
    a AS (SELECT txid, vout, amount FROM utxos WHERE height < 10000),
    b AS (SELECT txid, vout, amount FROM utxos
          WHERE height >= 5000 AND height < 15000)
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(amount) AS BIGINT) AS sats
    FROM (
      SELECT CASE WHEN a.txid IS NULL THEN 'created'
                  WHEN b.txid IS NULL THEN 'spent'
                  ELSE 'unchanged' END AS status,
             COALESCE(a.amount, b.amount) AS amount
      FROM a FULL OUTER JOIN b ON a.txid = b.txid AND a.vout = b.vout
    ) d
    GROUP BY status
    """,
)
def q_utxo_set_diff(spark, sf_dir):
    """Snapshot diff — THE operation run between two dumptxoutset
    exports: full-outer join on the UTXO identity (txid, vout)
    classifies each coin as spent (only in the older snapshot), created
    (only in the newer), or unchanged, with satoshi totals per class.
    At 177M rows per side this is one co-partitioned shuffle join on the
    composite key; with both snapshots written script-clustered by this
    engine, pre-bucketing on txid would remove the shuffle entirely."""
    u = utxos_df(spark, sf_dir)
    a = u.filter(F.col("height") < 10000).select("txid", "vout", "amount")
    b = u.filter((F.col("height") >= 5000) & (F.col("height") < 15000)).select(
        "txid", "vout", "amount"
    )
    j = a.alias("a").join(
        b.alias("b"),
        (F.col("a.txid") == F.col("b.txid")) & (F.col("a.vout") == F.col("b.vout")),
        "full_outer",
    )
    status = (
        F.when(F.col("a.txid").isNull(), "created")
        .when(F.col("b.txid").isNull(), "spent")
        .otherwise("unchanged")
    )
    return (
        j.select(
            status.alias("status"),
            F.coalesce(F.col("a.amount"), F.col("b.amount")).alias("amount"),
        )
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("sats"))
    )


@register(
    "q_utxo_balance_gini",
    oracle=f"""
    WITH utxos AS ({UTXOS_CTE}),
    bal AS (
      SELECT script_hex, SUM(amount) AS balance
      FROM utxos GROUP BY script_hex
    ),
    ranked AS (
      SELECT balance,
             ROW_NUMBER() OVER (ORDER BY balance, script_hex) AS i,
             COUNT(*) OVER () AS n,
             SUM(balance) OVER () AS total
      FROM bal
    )
    SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n_addresses,
           CAST(ANY_VALUE(total) AS BIGINT) AS total_sats,
           ROUND(2.0 * SUM(CAST(i AS DOUBLE) * balance)
                 / (ANY_VALUE(n) * ANY_VALUE(total))
                 - (ANY_VALUE(n) + 1.0) / ANY_VALUE(n), 6) AS gini
    FROM ranked
    """,
)
def q_utxo_balance_gini(spark, sf_dir):
    """Wealth-concentration analytics: the Gini coefficient of per-script
    balances, via the rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
    ascending balances.

    The global rank is TWO-PASS, never a single-partition window:
    (1) range-partition the address rollup on (balance, script_hex) —
    range partition p holds keys strictly below partition p+1 — and
    row_number WITHIN each partition, ordered by the same unique key;
    (2) per-partition row counts (a tiny |partitions|-row relation)
    prefix-sum into offsets, and global rank = offset + local rank.
    Every per-row stage is partition-parallel; the only unpartitioned
    window runs over the |partitions| count relation. n and Σx fold
    into the final single-row reduce — no window-over-all at all."""
    bal = (
        utxos_df(spark, sf_dir)
        .groupBy("script_hex")
        .agg(F.sum("amount").alias("balance"))
    )
    from pyspark.sql import Window as W

    # localCheckpoint pins the sampled range boundaries: the rank branch
    # and the offset branch below must see the SAME pid assignment, and
    # two independent executions of a range exchange may sample
    # different split points
    part = (
        bal.repartitionByRange(range_parts(bal), "balance", "script_hex")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # pass 1: local rank inside each range partition (unique key order)
    wloc = W.partitionBy("pid").orderBy("balance", "script_hex")
    local = part.withColumn("local_i", F.row_number().over(wloc))
    # pass 2: per-partition counts → exclusive prefix-sum offsets
    woff = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        part.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("pid", F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("off"))
    )
    ranked = local.join(F.broadcast(offsets), "pid").select(
        "balance", (F.col("off") + F.col("local_i")).alias("i")
    )
    return (
        ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("balance").alias("total"),
            F.sum(F.col("i").cast("double") * F.col("balance")).alias("s"),
        )
        .select(
            F.col("n").cast("long").alias("n_addresses"),
            F.col("total").cast("long").alias("total_sats"),
            F.round(
                2.0 * F.col("s")
                / (F.col("n").cast("double") * F.col("total").cast("double"))
                - (F.col("n") + 1.0) / F.col("n"),
                6,
            ).alias("gini"),
        )
    )


CUR_HEIGHT = 100_000  # fixture height domain bound (height = orderkey % 100000)
BLOCKS_PER_DAY = 144


@register(
    "q_utxo_coin_days",
    oracle=f"""
    WITH utxos AS ({UTXOS_CTE})
    SELECT CAST(height // 10000 AS BIGINT) AS epoch,
           CAST(COUNT(*) AS BIGINT) AS n_utxos,
           CAST(SUM(amount) AS BIGINT) AS total_sats,
           CAST(SUM(amount * (({CUR_HEIGHT} - height) // {BLOCKS_PER_DAY}))
                AS BIGINT) AS coin_days
    FROM utxos GROUP BY 1
    """,
)
def q_utxo_coin_days(spark, sf_dir):
    """Coin-days per height epoch — the "coin days destroyed" family's
    accumulation side (each UTXO carries amount x full days since its
    confirmation height, the age-weighted economic mass a spend would
    destroy). CUR_HEIGHT is the fixture's height-domain bound, so age is
    a pure per-row expression; everything is INTEGER arithmetic (sats x
    whole days, integer division) aggregated map-side per epoch — no
    float drift surface and one corpus scan at any scale."""
    u = utxos_df(spark, sf_dir)
    return u.groupBy(
        (F.col("height") / 10000).cast("long").alias("epoch")
    ).agg(
        F.count(F.lit(1)).alias("n_utxos"),
        F.sum("amount").alias("total_sats"),
        F.sum(
            F.col("amount") * F.floor((F.lit(CUR_HEIGHT) - F.col("height")) / BLOCKS_PER_DAY).cast("long")
        ).alias("coin_days"),
    )


# --- S6 end-to-end: secp256k1 type-4/5 pubkey reconstruction --------------

# Small multiples of the secp256k1 generator, derived by TEXTBOOK affine
# group law (double-and-add from the public generator constant) — an
# INDEPENDENT derivation from the kernel's sqrt-based point
# decompression. The oracle embeds these (x, y) pairs as literals while
# the Spark side reconstructs y through kernels/script.py's modular
# square root (main.rs:145-161's type-4/5 branch), so the hash gate
# cross-checks the Tonelli-Shanks-free sqrt against the group law: a
# wrong root, parity flip, or byte-order bug on either derivation breaks
# the value hash.
_EC_P = 2**256 - 2**32 - 977
_EC_G = (
    0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
    0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
)
N_PK = 16  # planted distinct pubkeys (both parities occur among 1G..16G)


def _ec_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and (y1 + y2) % _EC_P == 0:
        return None
    if p1 == p2:
        lam = 3 * x1 * x1 * pow(2 * y1, _EC_P - 2, _EC_P) % _EC_P
    else:
        lam = (y2 - y1) * pow(x2 - x1, _EC_P - 2, _EC_P) % _EC_P
    x3 = (lam * lam - x1 - x2) % _EC_P
    y3 = (lam * (x1 - x3) - y1) % _EC_P
    return (x3, y3)


def _g_multiples(n: int) -> list[tuple[int, int, int]]:
    """[(k, x, y) for k in 1..n] — k*G by repeated addition."""
    out, acc = [], None
    for k in range(1, n + 1):
        acc = _ec_add(acc, _EC_G)
        out.append((k, acc[0], acc[1]))
    return out


_PK_POINTS = _g_multiples(N_PK)


def _pk_values_sql() -> str:
    # script_type is derived from the group-law Y's parity here (4=even,
    # 5=odd) — same independence as the coordinates themselves
    rows = ",\n      ".join(
        f"({k}, {4 + (y & 1)}, '{x:064x}', '{y:064x}')"
        for k, x, y in _PK_POINTS
    )
    return f"(VALUES\n      {rows}) AS pk(k, script_type, x_hex, y_hex)"


@register(
    "q_utxo_pubkey_decompress",
    oracle=f"""
    WITH utxos AS ({UTXOS_CTE}),
    pk AS (SELECT * FROM {_pk_values_sql()}),
    planted AS (
      SELECT u.amount, pk.k, CAST(pk.script_type AS BIGINT) AS script_type,
             '41' || '04' || pk.x_hex || pk.y_hex || 'ac' AS script_hex
      FROM utxos u JOIN pk ON pk.k = u.height % {N_PK} + 1
    )
    SELECT k, script_type, script_hex,
           CAST(LENGTH(script_hex) / 2 AS BIGINT) AS script_len,
           TRUE AS on_curve,
           COUNT(*) AS n_utxos,
           CAST(SUM(amount) AS BIGINT) AS total_sats
    FROM planted
    GROUP BY k, script_type, script_hex
    """,
)
def q_utxo_pubkey_decompress(spark, sf_dir):
    """S6's type-4/5 branch driven end-to-end through the oracle gate:
    every UTXO is assigned one of {N_PK} planted compressed P2PK coins
    (``height % {N_PK}`` — a corpus-wide equi-join, not a constant), and
    the full uncompressed scriptPubKey ``41 04<X><Y> ac`` is
    reconstructed by the REAL kernel (`decompress_script(4|5, X)` →
    `decompress_pubkey`, main.rs:145-161). The {N_PK} distinct pubkeys
    are decompressed once driver-side and attached with a broadcast join
    — the same per-distinct-key cost shape the kernel's lru_cache gives
    the row-at-a-time dump path.

    The oracle does NOT replay the kernel: its Y coordinates come from
    the affine group law (`_g_multiples`), so the gate proves the
    modular square root finds the group-law Y bit-for-bit, picks the
    parity the script type demands (4=even, 5=odd), and frames the
    65-byte SEC form correctly. `on_curve` is the Spark-side algebraic
    contract (y² = x³ + 7 mod p, checked on the kernel's output bytes);
    the oracle pins it TRUE."""
    from ..kernels.script import decompress_script

    dim_rows = []
    for k, x, y in _PK_POINTS:
        script_type = 4 + (y & 1)
        script = decompress_script(script_type, x.to_bytes(32, "big"))
        ky = int.from_bytes(script[2 + 32 : 2 + 64], "big")
        on_curve = (ky * ky) % _EC_P == (pow(x, 3, _EC_P) + 7) % _EC_P
        dim_rows.append(
            (k, script_type, script.hex(), len(script), bool(on_curve))
        )
    dim = spark.createDataFrame(
        dim_rows,
        "k long, script_type long, script_hex string, script_len long,"
        " on_curve boolean",
    )
    # keep only the fact columns: the view's own script_hex (P2PKH) would
    # collide with the reconstructed P2PK script_hex from the dim
    u = utxos_df(spark, sf_dir).select(
        "amount", (F.col("height") % N_PK + 1).alias("k")
    )
    return (
        u.join(F.broadcast(dim), "k")
        .groupBy("k", "script_type", "script_hex", "script_len", "on_curve")
        .agg(
            F.count(F.lit(1)).alias("n_utxos"),
            F.sum("amount").alias("total_sats"),
        )
    )


# --- Dust economics: spendability of the UTXO set as feerates rise ------

# vbytes to SPEND one input of each template (outpoint 36 + sequence 4 +
# scriptsig/witness): P2PKH ~148 (107-byte scriptsig), P2SH ~91
# (redeem-script average), P2WPKH ~68 (witness discount). OP_RETURN is
# provably unspendable and excluded. Same constants both engines.
DUST_VBYTES = {"p2pkh": 148, "p2sh": 91, "p2wpkh": 68}
DUST_FEERATES = (1, 10, 50)  # sat/vB sweep


@register(
    "q_utxo_dust_feerate",
    oracle=f"""
    WITH scripted AS (
      SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS amount,
             CASE l_partkey % 4
               WHEN 0 THEN 'p2pkh' WHEN 1 THEN 'p2sh' WHEN 2 THEN 'p2wpkh'
               ELSE 'op_return' END AS script_type
      FROM lineitem
    ),
    vb AS (
      SELECT * FROM (VALUES {", ".join(f"('{t}', CAST({v} AS BIGINT))" for t, v in sorted(DUST_VBYTES.items()))})
        AS v(script_type, vbytes)
    ),
    fr AS (
      SELECT * FROM (VALUES {", ".join(f"(CAST({f} AS BIGINT))" for f in DUST_FEERATES)})
        AS f(feerate)
    )
    SELECT feerate, s.script_type,
           CAST(COUNT(*) AS BIGINT) AS n_utxos,
           CAST(SUM(CASE WHEN amount < feerate * vbytes THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dust,
           CAST(SUM(CASE WHEN amount < feerate * vbytes THEN amount ELSE 0 END)
             AS BIGINT) AS dust_sats,
           CAST(SUM(CASE WHEN amount < feerate * vbytes THEN 1 ELSE 0 END)
             * 10000 // COUNT(*) AS BIGINT) AS dust_bp
    FROM scripted s JOIN vb USING (script_type) CROSS JOIN fr
    GROUP BY feerate, s.script_type
    """,
)
def q_utxo_dust_feerate(spark, sf_dir):
    """Dust-at-feerate sweep: for each spendable script template, how
    many UTXOs (and how much value) cost more to spend than they are
    worth at 1/10/50 sat/vB — the economics panel every fee-market
    analysis opens with (reference's data model: amount + script
    template, src/main.rs decode surface).

    Entirely integer arithmetic (amounts in sats, spend cost =
    feerate x template vbytes), so the result is hash-stable by
    construction — no fixed-point engineering needed. Plan shape: one
    fact-table scan classified by a CASE expression, a broadcast join
    to the 3-row vbytes dim, a broadcast cross join to the 3-row
    feerate sweep (fans each row out 3x BEFORE the aggregate, but the
    map-side partial agg collapses it to 9 groups per partition), one
    9-group shuffle. The integer basis-point ratio uses floor division
    on non-negative operands, where Spark div and DuckDB // agree."""
    li = load(spark, sf_dir, "lineitem")
    stype = (
        F.when(F.col("l_partkey") % 4 == 0, "p2pkh")
        .when(F.col("l_partkey") % 4 == 1, "p2sh")
        .when(F.col("l_partkey") % 4 == 2, "p2wpkh")
        .otherwise("op_return")
    )
    scripted = li.select(
        F.floor(F.col("l_extendedprice") * 100).alias("amount"),
        stype.alias("script_type"),
    )
    vb = spark.createDataFrame(
        sorted(DUST_VBYTES.items()), "script_type string, vbytes long"
    )
    fr = spark.createDataFrame([(f,) for f in DUST_FEERATES], "feerate long")
    dust = F.col("amount") < F.col("feerate") * F.col("vbytes")
    return (
        scripted.join(F.broadcast(vb), "script_type")
        .crossJoin(F.broadcast(fr))
        .groupBy("feerate", "script_type")
        .agg(
            F.count(F.lit(1)).alias("n_utxos"),
            F.sum(F.when(dust, 1).otherwise(0)).alias("n_dust"),
            F.sum(F.when(dust, F.col("amount")).otherwise(0)).alias("dust_sats"),
        )
        .select(
            "feerate",
            "script_type",
            "n_utxos",
            "n_dust",
            "dust_sats",
            F.expr("n_dust * 10000 div n_utxos").alias("dust_bp"),
        )
    )


# --- UTXO set commitment (merkle root) --------------------------------------

MERKLE_FANIN = 16  # children per inner node (round-10: was 2 — fan-in
# 16 cuts the level count, and with it the per-level checkpoint +
# count-job constant, ~4x with identical commitment properties)
MERKLE_MAX_LEVELS = 6  # oracle CTE-chain depth: covers 16^6 = 16.7M
# leaves — 28x the 16x-probe corpus; the Spark loop sizes itself


def _merkle_oracle(levels: int = MERKLE_MAX_LEVELS) -> str:
    """Fixed-depth chained MATERIALIZED CTE replay of the fan-in-16
    tree (the q_text_bpe_encode oracle pattern): each level hashes the
    ordered concat of the up-to-{MERKLE_FANIN} children present in a
    group (CONCAT_WS skips absent slots on both engines — digests are
    fixed 64-hex, so the concat is unambiguous); levels past the root
    pass the single row through unchanged."""
    children = ",\n                 ".join(
        f"MAX(CASE WHEN idx % {MERKLE_FANIN} = {j} THEN h END)"
        for j in range(MERKLE_FANIN)
    )
    parts = [
        f"""
    WITH utxos AS MATERIALIZED ({UTXOS_CTE}),
    l0 AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (
               ORDER BY txid, vout,
                        sha256(txid || ':' || CAST(vout AS VARCHAR)
                               || ':' || CAST(amount AS VARCHAR))
             ) - 1 AS idx,
             sha256(txid || ':' || CAST(vout AS VARCHAR) || ':'
                    || CAST(amount AS VARCHAR)) AS h
      FROM utxos
    )"""
    ]
    for k in range(1, levels + 1):
        p = k - 1
        parts.append(
            f""",
    l{k} AS MATERIALIZED (
      SELECT idx, h FROM l{p} WHERE (SELECT COUNT(*) FROM l{p}) = 1
      UNION ALL
      SELECT idx // {MERKLE_FANIN} AS idx,
             sha256(CONCAT_WS('',
                 {children})) AS h
      FROM l{p} WHERE (SELECT COUNT(*) FROM l{p}) > 1
      GROUP BY idx // {MERKLE_FANIN}
    )"""
        )
    parts.append(
        f"""
    SELECT CAST((SELECT COUNT(*) FROM l0) AS BIGINT) AS n_leaves,
           CAST(CEIL(LOG2((SELECT COUNT(*) FROM l0)) / 4) AS BIGINT) AS depth,
           h AS merkle_root
    FROM l{levels}"""
    )
    return "".join(parts)


@register("q_utxo_merkle_root", oracle=_merkle_oracle())
def q_utxo_merkle_root(spark, sf_dir):
    """Merkle commitment over the UTXO set — the assumeutxo-style
    snapshot digest: two nodes can prove they hold the SAME set with one
    hash, and any single-coin discrepancy flips the root. Leaves are
    sha256 over the canonical '(txid:vout:amount)' string in global
    (txid, vout) order; inner nodes are sha256 over the two children's
    HEX-STRING digests concatenated (DuckDB 1.x sha256 is VARCHAR-only,
    so the engine-identical canonical form is the hex tree — same
    commitment properties, a documented deviation from Bitcoin's
    raw-byte double-SHA), odd tail duplicated (the Bitcoin block-merkle
    convention; the reference's dumptxoutset input is itself committed
    upstream by the analogous assumeutxo hash, main.rs reads it blind).

    Distributed shape: the global leaf index comes from the two-pass
    ``global_cumsum`` recipe (range partition + 32-row offset carry —
    never a corpus-wide single-partition window); each tree level is
    ONE hash aggregate on ``idx div {MERKLE_FANIN}`` (map-side
    combinable, <= {MERKLE_FANIN} rows per group; children concat in
    idx order, absent slots skipped — unambiguous because every digest
    is exactly 64 hex chars), so the whole tree is ceil(log16(n))
    shuffles of geometrically SHRINKING relations — at 100 TB the
    first level dominates and everything above is noise. Fan-in
    {MERKLE_FANIN} (round 10, was pairwise) cuts the level count — and
    the per-level localCheckpoint + count-job constant that dominated
    the local wall time — ~4x with the same commitment properties. The
    driver loop reads one row-count scalar per level (<= ~10 total at
    any conceivable scale — the same constant-bound class as the BPE
    merge collects). The oracle replays the identical tree as
    {MERKLE_MAX_LEVELS} fixed materialized CTE levels with single-row
    pass-through past the root."""
    u = utxos_df(spark, sf_dir)
    # the sort key appends the leaf hash: the synthesized fixture view
    # derives txid from a MODDED orderkey, so (txid, vout) can repeat,
    # and a bare (txid, vout) key would leave the tie order
    # engine-dependent; with the hash appended, any remaining ties are
    # IDENTICAL leaves, whose relative order cannot change the tree.
    # Ordering is the (txid, vout, h) TUPLE — not a padded concat key —
    # so the checkpoints carry no redundant 134-char sort string
    # (round-10: the leaf-indexing pass, not the fold, dominated wall).
    leaf_h = F.sha2(
        F.concat_ws(
            ":",
            F.col("txid"),
            F.col("vout").cast("string"),
            F.col("amount").cast("string"),
        ),
        256,
    )
    # h projected first so the sha2 is computed once per row per pass.
    # Round 14: the eager checkpoint that used to sit here predates the
    # memoized utxos view — its job was to keep the range exchange's
    # sampling pass from re-running the scan + md5 chain, but that now
    # reads the session-cached view, so the only recompute left is one
    # sha2 per row (cheaper than materializing an 80 MB copy of the
    # keyed relation in a dedicated job).
    order_cols = ["txid", "vout", "h"]
    keyed = u.withColumn("h", leaf_h).select(*order_cols)
    # global dense index: the two-pass global_cumsum recipe inlined over
    # the tuple order (range partition pinned by checkpoint + 32-row
    # offset carry — never a corpus-wide single-partition window)
    part = (
        keyed.repartitionByRange(range_parts(keyed), *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    n_leaves = part.count()
    wloc = W.partitionBy("__pid").orderBy(*order_cols)
    local = part.withColumn("__li", F.row_number().over(wloc))
    woff = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        part.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__c"))
        .select(
            "__pid",
            F.coalesce(F.sum("__c").over(woff), F.lit(0)).alias("__off"),
        )
    )
    cur = local.join(F.broadcast(offsets), "__pid").select(
        (F.col("__off") + F.col("__li") - 1).alias("idx"), "h"
    )
    # depth from n_leaves by exact integer ceil-division — the fold runs
    # a FIXED number of levels lazily, so the whole tree is ONE job of
    # chained geometrically-shrinking hash aggregates: no per-level
    # checkpoint, count job, or driver round-trip (round-10; the loop
    # previously paid ~17 checkpoint+count pairs)
    depth, m = 0, n_leaves
    while m > 1:
        m = -(-m // MERKLE_FANIN)
        depth += 1
    children = [
        F.max(F.when(F.col("idx") % MERKLE_FANIN == j, F.col("h")))
        for j in range(MERKLE_FANIN)
    ]
    for _ in range(depth):
        cur = cur.groupBy(F.expr(f"idx div {MERKLE_FANIN}").alias("idx")).agg(
            F.sha2(F.concat_ws("", *children), 256).alias("h")
        )
    return cur.select(
        F.lit(n_leaves).cast("long").alias("n_leaves"),
        F.lit(depth).cast("long").alias("depth"),
        F.col("h").alias("merkle_root"),
    )

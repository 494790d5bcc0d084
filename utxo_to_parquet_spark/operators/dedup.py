"""Deduplication operators for large-scale training-data pipelines.

Four families over ``documents``, each expressed with built-in DataFrame
ops only (no Python in the hot path) and oracle-checked against DuckDB:

- exact: hash-groupBy on a normalization of the text
- n-gram Jaccard: shingle inverted index → pair join → set similarity
- MinHash + LSH: per-(doc,seed) min of seeded hashes → banded keys →
  bucket join for candidate pairs
- SimHash: per-bit majority vote over token hashes → compact fingerprint

Scale notes: every operator here is a chain of explode → partial-agg →
shuffle-on-key; nothing collects to the driver. The shingle inverted
index is the classic skew risk (a stop-shingle appearing in every doc
explodes the pair join) — mitigated by dropping shingles with document
frequency above a cap, which is also standard MinHash/LSH practice.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import load, memo_fragment, register

N_SEEDS = 16
BAND_SIZE = 4
DF_CAP = 100  # drop shingles present in more than this many docs (skew guard)

# affine minhash family h_i(x) = (a_i*x + b_i) mod P over x = the first
# 60 bits of md5(shingle): ONE md5 per shingle feeds all N_SEEDS hashes.
# P Mersenne (2^31-1) keeps a*x within int64. Constants are fixed
# literals so the DuckDB oracle computes the identical family.
MINHASH_P = 2_147_483_647
import random as _random

_rng = _random.Random(7)
MINHASH_AB = [(_rng.randrange(1, MINHASH_P), _rng.randrange(0, MINHASH_P)) for _ in range(N_SEEDS)]

# SQL fragments shared between the batch path here and the streaming
# per-row path (streaming/windows.py) — single source of truth for the
# "bit-identical band keys" contract: a tweak to shingle size, hash
# width, or the affine family changes BOTH paths or neither.
SHINGLE_TRANSFORM_SQL = (
    "transform(sequence(0, size(words) - 3),"
    " i -> concat(words[i], ' ', words[i+1], ' ', words[i+2]))"
)


def x_hash_sql(var: str) -> str:
    """The 60-bit md5 prefix hash feeding every MinHash seed."""
    return (
        f"cast(conv(substring(md5({var}), 1, 15), 16, 10) as bigint)"
        f" % {MINHASH_P}"
    )


def mh_sql(i: int, xs: str = "xs") -> str:
    """Per-row form of seed i's min-hash over an x-value array column —
    used by the streaming path, where the signature must be a function
    of one row (no groupBy-min)."""
    a, b = MINHASH_AB[i]
    return f"array_min(transform({xs}, x -> ({a} * x + {b}) % {MINHASH_P}))"


def minhash_band_structs():
    """The banded key array over mh0..mh{N_SEEDS-1} columns — shared by
    the batch index builder and the streaming per-row path."""
    return F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(f"mh{i}") for i in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)],
                    )
                ).alias("band_key"),
            )
            for b in range(N_SEEDS // BAND_SIZE)
        ]
    )


_SHINGLES_DUCK = """
  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           RANGE(1, GREATEST(LEN(STRING_SPLIT(text, ' ')) - 1, 1)),
           i -> CONCAT(STRING_SPLIT(text, ' ')[i], ' ',
                       STRING_SPLIT(text, ' ')[i+1], ' ',
                       STRING_SPLIT(text, ' ')[i+2])))) AS shingle
  FROM documents
"""


def _shingles_of(docs):
    """doc_id, shingle — distinct word-3-gram shingles per document of
    an arbitrary (doc_id, text) relation."""
    # materialize the words array once — referencing split(...) inside the
    # transform lambda would re-split per element, making shingling
    # O(words²) per doc. Docs with <3 words have no trigram shingles (the
    # oracle's empty-list unnest drops them too); Spark sequence() would
    # descend for them, hence the filter.
    return (
        docs.select("doc_id", F.split("text", " ").alias("words"))
        .filter(F.size("words") >= 3)
        .select(
            "doc_id",
            F.explode(F.array_distinct(F.expr(SHINGLE_TRANSFORM_SQL))).alias("shingle"),
        )
    )


def _shingles_df(spark, sf_dir):
    """doc_id, shingle — distinct word-3-gram shingles per document.
    Memoized per session+corpus (round 14, guide §2.4): the trigram
    shingle relation is the shared first stage of the Jaccard,
    containment, and MinHash families — previously re-exploded from the
    corpus by every consumer. This is the inverted-index build a
    production dedup pipeline persists once per corpus snapshot."""
    return memo_fragment(
        spark,
        "shingles3",
        sf_dir,
        lambda: _shingles_of(load(spark, sf_dir, "documents")),
    )


@register(
    "q_dedup_exact",
    oracle="""
    SELECT md5(lower(text)) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS kept_doc_id,
           COUNT(*) AS n_copies
    FROM (SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0)
    GROUP BY 1
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy keeping the smallest doc_id per content
    hash. A synthetic duplicate set (every 3rd doc re-inserted under a
    shifted id) proves copies actually collapse. Deterministic — unlike
    ``dropDuplicates``, which keeps an arbitrary row."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return (
        docs.unionByName(dupes)
        .groupBy(F.md5(F.lower(F.col("text"))).alias("content_hash"))
        .agg(F.min("doc_id").alias("kept_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "q_dedup_ngram_jaccard",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_DUCK}),
    filtered AS (
      SELECT doc_id, shingle FROM shingles
      WHERE shingle IN (SELECT shingle FROM shingles GROUP BY shingle
                        HAVING COUNT(DISTINCT doc_id) <= {DF_CAP})
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM filtered GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM filtered a JOIN filtered b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, CAST(common AS BIGINT) AS common,
           ROUND(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 4) AS jaccard
    FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.05
    """,
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    """Near-dup detection via word-3-gram Jaccard: inverted shingle index
    self-joined into candidate pairs, exact set similarity computed from
    per-doc shingle counts. The DF cap bounds the worst-case pair
    blow-up (a shingle in k docs contributes k² pairs)."""
    sh = _shingles_df(spark, sf_dir)
    df_ok = (
        sh.groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") <= DF_CAP)
        .select("shingle")
    )
    # no cache(): the returned plan is consumed lazily by the caller so
    # there is no safe unpersist point, and a cached exploded-shingle
    # table is a memory hazard at scale. The shingle scan recomputes for
    # its consumers; AQE reuses the shuffle output of the df_ok join.
    filtered = sh.join(df_ok, "shingle")
    sizes = filtered.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = filtered.alias("a")
    b = filtered.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("common"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(jac >= 0.05)
        .select("doc_a", "doc_b", "common", F.round(jac, 4).alias("jaccard"))
    )


CONTAINMENT_MIN = 0.5  # the smaller doc must be half-contained in the larger


@register(
    "q_dedup_containment",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_DUCK}),
    filtered AS (
      SELECT doc_id, shingle FROM shingles
      WHERE shingle IN (SELECT shingle FROM shingles GROUP BY shingle
                        HAVING COUNT(DISTINCT doc_id) <= {DF_CAP})
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM filtered GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM filtered a JOIN filtered b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(common AS BIGINT) AS common,
           ROUND(CAST(common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh), 4)
             AS containment,
           ROUND(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 4)
             AS jaccard
    FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= {CONTAINMENT_MIN}
    """,
)
def q_dedup_containment(spark, sf_dir, df_cap: int | None = None):
    """Asymmetric near-dup detection via shingle CONTAINMENT —
    |A∩B| / min(|A|, |B|): a short document quoted or embedded inside a
    long one scores near 1.0 here while its symmetric Jaccard
    (|A∩B| / |A∪B|) stays near |A|/|B| and slips under any Jaccard
    threshold. This is the standard second pass next to Jaccard dedup in
    training-data pipelines (boilerplate inclusion, quote extraction,
    doc-in-doc duplication). Same scale shape as q_dedup_ngram_jaccard:
    inverted shingle index with the document-frequency skew cap, pair
    counts from an equi-join, per-doc sizes broadcast back — the
    containment denominator is just the SMALLER set size instead of the
    union.

    ``df_cap`` overrides the registered {DF_CAP} document-frequency cap
    (the oracle pins {DF_CAP}) — the recall/cost knob: every emitted
    pair's `common` counts only shingles with df <= cap, so lowering it
    sheds exactly the join work of the heaviest shingles at the price of
    pairs whose overlap lives in common boilerplate.
    `tools/bench_containment_cap.py` sweeps it at the 16x probe corpus
    (BENCH_containment_cap.json)."""
    cap = DF_CAP if df_cap is None else df_cap
    sh = _shingles_df(spark, sf_dir)
    df_ok = (
        sh.groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") <= cap)
        .select("shingle")
    )
    filtered = sh.join(df_ok, "shingle")
    sizes = filtered.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = filtered.alias("a")
    b = filtered.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    cont = F.col("common").cast("double") / F.least("n_a", "n_b")
    jac = F.col("common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("common"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(cont >= CONTAINMENT_MIN)
        .select(
            "doc_a",
            "doc_b",
            "common",
            F.round(cont, 4).alias("containment"),
            F.round(jac, 4).alias("jaccard"),
        )
    )


def _minhash_bands_cte(src: str = "documents") -> str:
    """The shared WITH-clause prefix reproducing the LSH band index
    (``bands``: doc_id, band, band_key) in DuckDB — composed by the pair
    oracle, the clustering oracles, and the incremental-dedup oracle.
    ``src`` swaps the corpus relation (the search oracle shingles an
    augmented corpus CTE instead of the raw table)."""
    mins = ",\n             ".join(
        f"MIN(({a} * x + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )
    band_keys = ",\n           ".join(
        "md5(CONCAT("
        + ", '|', ".join(f"CAST(mh{i} AS VARCHAR)" for i in range(b0 * BAND_SIZE, (b0 + 1) * BAND_SIZE))
        + f")) AS bk{b0}"
        for b0 in range(N_SEEDS // BAND_SIZE)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b0} AS band, bk{b0} AS band_key FROM keys"
        for b0 in range(N_SEEDS // BAND_SIZE)
    )
    return f"""shingles AS ({_SHINGLES_DUCK.replace("FROM documents", f"FROM {src}")}),
    xs AS (
      SELECT doc_id,
             ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MINHASH_P} AS x
      FROM shingles
    ),
    sig AS (
      SELECT doc_id,
             {mins}
      FROM xs GROUP BY doc_id
    ),
    keys AS (
      SELECT doc_id,
           {band_keys}
      FROM sig
    ),
    bands AS ({band_rows})"""


def _minhash_oracle() -> str:
    return f"""
    WITH {_minhash_bands_cte()}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS n_shared_bands
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """


def _minhash_sig_of(sh):
    """(doc_id, mh0..mh{N_SEEDS-1}) — the MinHash signature table over a
    shingle relation: one shuffle of |shingles| narrow rows with
    map-side partial mins (the {N_SEEDS} hashes are parallel columns
    off a single md5, never a seed cross-join). Shared by the
    band-index builder and the signature scorer of
    q_dedup_minhash_search."""
    xs = sh.select("doc_id", F.expr(x_hash_sql("shingle")).alias("x"))
    return xs.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % MINHASH_P).alias(f"mh{i}")
            for i, (a, b) in enumerate(MINHASH_AB)
        ]
    )


def _minhash_bands_of(sig):
    """Band index (doc_id, band, band_key) from a signature relation."""
    return sig.select(
        "doc_id", F.explode(minhash_band_structs()).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def _minhash_bands_df(spark, sf_dir):
    """(doc_id, band, band_key) — the LSH band index over every
    document's MinHash signature. In a production pipeline this is the
    PERSISTED index table (bucketed by (band, band_key)); here it is the
    shared plan fragment behind the pair join, the clustering queries,
    and the incremental batch-vs-corpus probe. Memoized per
    session+corpus (round 14) exactly because it IS that persisted
    artifact: previously every consumer re-hashed the full shingle
    relation per call."""
    return memo_fragment(
        spark,
        "minhash_bands",
        sf_dir,
        lambda: _minhash_bands_of(_minhash_sig_of(_shingles_df(spark, sf_dir))),
    )


def _minhash_pairs(spark, sf_dir):
    """Candidate near-dup pairs (doc_a < doc_b, n_shared_bands) via
    MinHash + LSH banding — shared by q_dedup_minhash_lsh, the
    connected-components clustering built on top of it, the triangle /
    clustering-coefficient graph twins, and the cascade/report
    pipelines. Memoized per session+corpus (round 14): seven consumers
    previously re-ran the band self-join each."""

    def _build():
        bands = _minhash_bands_df(spark, sf_dir)
        a = bands.alias("a")
        b = bands.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        )

    return memo_fragment(spark, "minhash_pairs", sf_dir, _build)


@register("q_dedup_minhash_lsh", oracle=_minhash_oracle())
def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash + LSH candidate pairs: an affine hash family over one md5
    per shingle (see MINHASH_AB — deterministic across engines), banded
    into groups of {BAND_SIZE}; docs sharing any band key become
    candidates. The band join is an equi-join on (band, band_key) — pure
    shuffle hash join, no cross product, which is the whole point of LSH
    at 100 TB.

    Plan shape: the {N_SEEDS} hashes are parallel *columns* derived from
    a single md5 (not a seed cross-join), so the signature needs ONE
    shuffle of |shingles| narrow rows with map-side partial mins — 16×
    less hashing and shuffle volume than the naive explode-by-seed
    layout.
    """
    return _minhash_pairs(spark, sf_dir)


BATCH_MOD = 5  # doc_id % BATCH_MOD == 0 models the newly-ingested batch


@register(
    "q_dedup_incremental",
    oracle=f"""
    WITH {_minhash_bands_cte()},
    batch AS (SELECT doc_id FROM documents WHERE doc_id % {BATCH_MOD} = 0),
    corpus_hits AS (
      SELECT a.doc_id, COUNT(DISTINCT b.doc_id) AS n
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id % {BATCH_MOD} = 0 AND b.doc_id % {BATCH_MOD} <> 0
      GROUP BY 1
    ),
    batch_hits AS (
      SELECT a.doc_id, COUNT(DISTINCT b.doc_id) AS n
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id % {BATCH_MOD} = 0 AND b.doc_id % {BATCH_MOD} = 0
        AND b.doc_id < a.doc_id
      GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(ch.n, 0) AS BIGINT) AS n_corpus_matches,
           CAST(COALESCE(bh.n, 0) AS BIGINT) AS n_batch_matches,
           (COALESCE(ch.n, 0) = 0 AND COALESCE(bh.n, 0) = 0) AS kept
    FROM batch d
      LEFT JOIN corpus_hits ch ON ch.doc_id = d.doc_id
      LEFT JOIN batch_hits bh ON bh.doc_id = d.doc_id
    """,
)
def q_dedup_incremental(spark, sf_dir):
    """Incremental dedup: probe a newly-ingested batch (doc_id %
    {BATCH_MOD} == 0) against the EXISTING corpus's MinHash band index
    without re-pairing the corpus against itself — the production shape
    for a continuously-ingesting pipeline, where the index is a
    persisted table and only additions are processed per run.

    Per batch doc: how many corpus docs share an LSH band
    (n_corpus_matches), how many EARLIER batch docs do
    (n_batch_matches — first-occurrence-wins within the batch), and the
    admission verdict ``kept`` (no collision either way).

    Scale shape: the batch band list is broadcast
    (batch size ≪ corpus by definition of an ingest increment), so the
    corpus probe is a map-side hash join over the index scan — the
    corpus is never shuffled, and the only shuffles are the batch-sized
    aggregations. Within-batch pairing is batch×batch, bounded by the
    increment size. Batch docs with <3 words have no bands and are
    admitted with zero matches (the left joins keep them).
    """
    bands = _minhash_bands_df(spark, sf_dir)
    batch_bands = bands.filter(F.col("doc_id") % BATCH_MOD == 0)
    corpus_bands = bands.filter(F.col("doc_id") % BATCH_MOD != 0)
    corpus_hits = (
        F.broadcast(batch_bands).alias("a")
        .join(
            corpus_bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.countDistinct(F.col("b.doc_id")).alias("ch"))
    )
    batch_hits = (
        batch_bands.alias("a")
        .join(
            F.broadcast(batch_bands).alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("b.doc_id") < F.col("a.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.countDistinct(F.col("b.doc_id")).alias("bh"))
    )
    batch_docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % BATCH_MOD == 0)
        .select("doc_id")
    )
    return (
        # the hit tables are batch-sized aggregates — broadcast both so
        # the final assembly never sort-merges
        batch_docs.join(F.broadcast(corpus_hits), "doc_id", "left_outer")
        .join(F.broadcast(batch_hits), "doc_id", "left_outer")
        .select(
            "doc_id",
            F.coalesce("ch", F.lit(0)).alias("n_corpus_matches"),
            F.coalesce("bh", F.lit(0)).alias("n_batch_matches"),
            (F.coalesce("ch", F.lit(0)) + F.coalesce("bh", F.lit(0)) == 0).alias("kept"),
        )
    )


MHS_MOD = 25     # probe set: every 25th doc asks "who are my near-dups?"
MHS_K = 5        # neighbors returned per probe
MHS_PLANT = 10   # every 10th doc gets a planted near-copy (first word
#                  dropped, re-inserted at doc_id + 1_000_000) so the
#                  word-salad fixture actually exercises ranked
#                  retrieval — the q_dedup_exact synthetic-dupe trick

_MHS_AUG_DUCK = f"""
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(list_slice(string_split(text, ' '), 2,
                             len(string_split(text, ' '))), ' ') AS text
      FROM documents WHERE doc_id % {MHS_PLANT} = 0
"""


def _mhs_corpus(spark, sf_dir):
    """The search fixture corpus: documents plus a planted near-copy of
    every {MHS_PLANT}th doc (first word dropped — Jaccard ~(n-2)/n on
    trigram shingles, so signatures collide in most bands)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    mut = docs.filter(F.col("doc_id") % MHS_PLANT == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(
            F.expr("slice(split(text, ' '), 2, size(split(text, ' ')) - 1)"),
            " ",
        ).alias("text"),
    )
    return docs.unionByName(mut)


def _minhash_search_oracle() -> str:
    nm = " + ".join(
        f"CASE WHEN qa.mh{i} = qb.mh{i} THEN 1 ELSE 0 END"
        for i in range(N_SEEDS)
    )
    return f"""
    WITH aug AS ({_MHS_AUG_DUCK}),
    {_minhash_bands_cte("aug")},
    cand AS (
      SELECT DISTINCT a.doc_id AS q_doc, b.doc_id AS cand_doc
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
       AND b.doc_id <> a.doc_id
      WHERE a.doc_id % {MHS_MOD} = 0
    ),
    scored AS (
      SELECT c.q_doc, c.cand_doc, CAST({nm} AS BIGINT) AS n_match
      FROM cand c
        JOIN sig qa ON qa.doc_id = c.q_doc
        JOIN sig qb ON qb.doc_id = c.cand_doc
    ),
    topk AS (
      SELECT q_doc, cand_doc, n_match, rnk FROM (
        SELECT q_doc, cand_doc, n_match,
               ROW_NUMBER() OVER (
                 PARTITION BY q_doc ORDER BY n_match DESC, cand_doc
               ) AS rnk
        FROM scored
      ) WHERE rnk <= {MHS_K}
    ),
    docset AS (
      SELECT q_doc AS doc_id FROM topk
      UNION
      SELECT cand_doc AS doc_id FROM topk
    ),
    sizes AS (
      SELECT s.doc_id, COUNT(*) AS n_sh
      FROM shingles s JOIN docset USING (doc_id) GROUP BY s.doc_id
    ),
    common AS (
      SELECT t.q_doc, t.cand_doc, COUNT(*) AS n_common
      FROM topk t
        JOIN shingles sa ON sa.doc_id = t.q_doc
        JOIN shingles sb ON sb.doc_id = t.cand_doc
                        AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    )
    SELECT t.q_doc, CAST(t.rnk AS BIGINT) AS rnk, t.cand_doc, t.n_match,
           t.n_match / {float(N_SEEDS)} AS est_jaccard,
           CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,
           ROUND(COALESCE(c.n_common, 0)
                 / (sa.n_sh + sb.n_sh - COALESCE(c.n_common, 0)), 4) AS jaccard
    FROM topk t
      LEFT JOIN common c ON c.q_doc = t.q_doc AND c.cand_doc = t.cand_doc
      JOIN sizes sa ON sa.doc_id = t.q_doc
      JOIN sizes sb ON sb.doc_id = t.cand_doc
    """


@register("q_dedup_minhash_search", oracle=_minhash_search_oracle())
def q_dedup_minhash_search(spark, sf_dir):
    """Top-k near-dup SEARCH — the serving twin of the pair miner: for
    each probe document (doc_id % {MHS_MOD} == 0, the interactive
    "who are my near-dups?" shape a data curator runs), return its
    {MHS_K} nearest neighbors by ESTIMATED Jaccard — the fraction of
    matching MinHash components (Broder 1997: component agreement is
    an unbiased resemblance estimator), answered FROM THE INDEX without
    touching document text — then attach the exact shingle Jaccard for
    the surviving top-k pairs only (the verify-after-rank discipline of
    the ANN re-rankers). Rank key (n_match DESC, cand_doc) is pure
    int64, so both engines cut the identical top-k. The corpus is
    augmented with a planted near-copy of every {MHS_PLANT}th doc (see
    _mhs_corpus) so retrieval has real positives to rank: a probe's
    planted twin must surface with near-full signature agreement while
    salad-vs-salad collisions score low.

    Scale shape: candidates come from the SAME persisted band index as
    q_dedup_minhash_lsh — the probe's band keys are broadcast, so the
    corpus index is map-side hash-probed and never reshuffled (the
    q_dedup_incremental contract); candidate count is bounded by the
    probe's bucket occupancy, never all-pairs. Signature scoring
    broadcasts the (probe x candidate) list against the signature
    table; the exact-Jaccard pass broadcasts the bounded
    (probe-shingle x pair) relation against the corpus shingle scan —
    two corpus scans total, zero corpus shuffles. Probes with no bucket
    collision return no rows (nothing within LSH reach); a hash-collision
    candidate with zero shared shingles reports jaccard 0.0."""
    # the augmented-corpus shingle and signature relations each feed
    # several consumers below (sig/sizes/qp/common for sh; bands/qarr/
    # carr for sig) — checkpoint both so the corpus explode and the
    # N_SEEDS-hash signature build run ONCE instead of once per
    # consumer subtree (round 14, guide §2.4; this query re-derived the
    # signature pipeline 3x and the shingle explode 4x)
    # EAGER: both are first materialized inside the final multi-consumer
    # job otherwise, where racing stages re-compute them per consumer
    sh = _shingles_of(_mhs_corpus(spark, sf_dir)).localCheckpoint(eager=True)
    sig = _minhash_sig_of(sh).localCheckpoint(eager=True)
    bands = _minhash_bands_of(sig)
    probe_bands = bands.filter(F.col("doc_id") % MHS_MOD == 0)
    cand = (
        F.broadcast(probe_bands).alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("b.doc_id") != F.col("a.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("q_doc"),
            F.col("b.doc_id").alias("cand_doc"),
        )
        .distinct()
    )
    sig_arr = F.array(*[F.col(f"mh{i}") for i in range(N_SEEDS)])
    qarr = (
        sig.filter(F.col("doc_id") % MHS_MOD == 0)
        .select(F.col("doc_id").alias("q_doc"), sig_arr.alias("qs"))
    )
    carr = sig.select(F.col("doc_id").alias("cand_doc"), sig_arr.alias("cs"))
    # probe-sized relations stay broadcast: the corpus signature table
    # is map-side probed, never shuffled
    scored = (
        carr.join(F.broadcast(cand.join(F.broadcast(qarr), "q_doc")), "cand_doc")
        .withColumn(
            "n_match",
            F.expr(
                "cast(aggregate(zip_with(qs, cs, (x, y) -> IF(x = y, 1, 0)),"
                " 0L, (acc, v) -> acc + v) as bigint)"
            ),
        )
    )
    topk = (
        scored.withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("q_doc").orderBy(F.desc("n_match"), "cand_doc")
            ),
        )
        .filter(F.col("rnk") <= MHS_K)
        .select("q_doc", "cand_doc", "n_match", F.col("rnk").cast("long").alias("rnk"))
        # tiny (|probes| x MHS_K) but consumed FOUR times below (pairs,
        # docset, the common join, the final assembly) — without the
        # checkpoint the whole band-join + window subtree re-executes
        # per consumer; EAGER so the four consumers can't race it
        .localCheckpoint(eager=True)
    )
    pairs = topk.select("q_doc", "cand_doc")
    docset = (
        pairs.select(F.col("q_doc").alias("doc_id"))
        .unionByName(pairs.select(F.col("cand_doc").alias("doc_id")))
        .distinct()
    )
    sizes = (
        sh.join(F.broadcast(docset), "doc_id")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    qp = (
        sh.withColumnRenamed("doc_id", "q_doc")
        .join(F.broadcast(pairs), "q_doc")
    )  # bounded: |probes| x MHS_K x shingles-per-doc
    common = (
        F.broadcast(qp)
        .join(
            sh.select(F.col("doc_id").alias("cand_doc"), "shingle"),
            ["cand_doc", "shingle"],
        )
        .groupBy("q_doc", "cand_doc")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("q_doc"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("cand_doc"), F.col("n_sh").alias("n_b"))
    nc = F.coalesce("n_common", F.lit(0))
    return (
        topk.join(F.broadcast(common), ["q_doc", "cand_doc"], "left_outer")
        .join(F.broadcast(sa), "q_doc")
        .join(F.broadcast(sb), "cand_doc")
        .select(
            "q_doc",
            "rnk",
            "cand_doc",
            "n_match",
            (F.col("n_match") / F.lit(float(N_SEEDS))).alias("est_jaccard"),
            nc.cast("long").alias("n_common"),
            F.round(nc / (F.col("n_a") + F.col("n_b") - nc), 4).alias("jaccard"),
        )
    )


def _cc_oracle() -> str:
    # the pairs query nests as a CTE body (DuckDB allows a WITH inside a
    # CTE definition); reachability = recursive min-label closure.
    return f"""
    WITH RECURSIVE pairs AS (
      {_minhash_oracle()}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, CAST(MIN(lab) AS BIGINT) AS component
    FROM reach GROUP BY node
    """


@register("q_dedup_connected_components", oracle=_cc_oracle())
def q_dedup_connected_components(spark, sf_dir):
    """Duplicate-cluster assignment: connected components over the LSH
    candidate-pair graph, so transitive near-dup chains (A~B, B~C)
    collapse into one cluster labeled by the smallest doc_id.

    Spark has no recursive CTE; the idiomatic scale-out algorithm is
    iterative min-label propagation — label(v) := min(label(v),
    min(label(u) for u~v)) to a fixed point, O(graph diameter)
    iterations, each one shuffle on the node key. localCheckpoint()
    truncates the per-iteration lineage growth (on a cluster this would
    be checkpoint() to durable storage). For web-scale graphs the
    large-star/small-star variant (Kiveris et al.) reduces rounds to
    O(log n); plain propagation is right-sized for dedup graphs, whose
    components are tiny and shallow."""
    return _components_df(spark, sf_dir)


def _components_df(spark, sf_dir):
    """(doc_id, component) for every doc in the LSH pair graph — the
    min-label propagation loop shared by q_dedup_connected_components
    and q_dedup_canonical_pick."""
    pairs = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).toDF("src", "dst").localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
    )
    for _ in range(15):
        neighbor_min = (
            labels.join(edges, labels.node == edges.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lab").alias("nlab"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left_outer")
            .select("node", F.least("lab", "nlab").alias("lab"))
            # lazy: the changed-count action below materializes it —
            # one job per round instead of two (round 14, guide §1)
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("lab").alias("component"))


@register("q_dedup_cc_largestar", oracle=_cc_oracle())
def q_dedup_cc_largestar(spark, sf_dir):
    """Connected components via alternating large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the documented scale upgrade over plain min-label
    propagation: rounds are O(log n) in the worst case instead of
    O(graph diameter), which is what matters when a duplicate chain is
    long (scraped mirror sites produce exactly those).

    Each round is two grouped aggregations and two self-joins on the
    node key — the same shuffle shape as propagation, just fewer rounds:

    - large-star: every node's strictly-larger neighbors re-link to the
      minimum of its closed neighborhood;
    - small-star: the smaller-or-equal neighbors (and the node) re-link
      to that minimum.

    At the fixpoint the edge set is a union of stars whose centers are
    the component minima, so the label table is the edge list itself.
    Must produce byte-identical output to q_dedup_connected_components
    (same oracle; cross-checked in tests/test_similarity.py)."""
    raw = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    # canonical undirected edge set (lo, hi), no self-loops
    edges = (
        raw.select(
            F.least("doc_a", "doc_b").alias("lo"),
            F.greatest("doc_a", "doc_b").alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("lo").alias("doc_id"))
        .union(edges.select(F.col("hi").alias("doc_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def closed_min(adj):
        """m(u) = min(Γ(u) ∪ {u}) per node."""
        return (
            adj.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", F.col("u")).alias("m"))
        )

    def canon(df):
        return (
            df.select(
                F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
            )
            .filter(F.col("lo") != F.col("hi"))
            .distinct()
        )

    def fingerprint(df):
        """(count, sum of 64-bit edge hashes) in ONE aggregation action.
        Two canonical DISTINCT edge sets with equal count and equal
        xxhash64 sum are equal up to a ~2^-64 collision — the cheap
        convergence test (the alternative, count + exceptAll, re-scans
        the edge set with two extra actions per round)."""
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("lo", "hi").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row.n, row.h)

    fp_prev = fingerprint(edges)
    for _ in range(12):  # ≥ 2·log2(n) for any fixture graph here
        adj = edges.select(F.col("lo").alias("u"), F.col("hi").alias("v")).union(
            edges.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        mins = closed_min(adj)
        # large-star: (v, m(u)) for v ∈ Γ(u), v > u
        large = canon(
            adj.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        adj2 = large.select(F.col("lo").alias("u"), F.col("hi").alias("v")).union(
            large.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        mins2 = closed_min(adj2)
        # small-star: (v, m(u)) for v ∈ Γ(u), v ≤ u, plus (u, m(u))
        small_nbrs = (
            adj2.join(mins2, "u")
            .filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        small_self = mins2.select(F.col("u").alias("a"), F.col("m").alias("b"))
        # lazy: the fingerprint action materializes it (round 14)
        new_edges = canon(small_nbrs.union(small_self)).localCheckpoint(eager=False)
        # fixpoint: the canonical edge set stopped changing
        prev_edges, edges = edges, new_edges
        fp_new = fingerprint(new_edges)
        if fp_new == fp_prev:
            # belt-and-braces: fingerprint equality is probabilistic
            # (~2^-64 xxhash64-sum collision). Confirm exactly on the
            # TERMINATING round only — two exceptAll actions once per
            # query, not per round (both sides are localCheckpointed).
            if (
                new_edges.exceptAll(prev_edges).isEmpty()
                and prev_edges.exceptAll(new_edges).isEmpty()
            ):
                break
        fp_prev = fp_new
    # stars: every edge is (root=lo, member=hi); roots label themselves
    labels = edges.select(F.col("hi").alias("doc_id"), F.col("lo").alias("component"))
    roots = nodes.join(
        labels.select(F.col("doc_id").alias("n")), nodes.doc_id == F.col("n"), "left_anti"
    ).select("doc_id", F.col("doc_id").alias("component"))
    return labels.union(roots)


@register(
    "q_dedup_canonical_pick",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      {_minhash_oracle()}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (
      SELECT node AS doc_id, MIN(lab) AS component FROM reach GROUP BY node
    )
    SELECT c.component,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST((ARRAY_AGG(d.doc_id ORDER BY LEN(d.text) DESC, d.doc_id))[1]
                AS BIGINT) AS kept_doc_id,
           CAST(MAX(LEN(d.text)) AS BIGINT) AS kept_len
    FROM comp c JOIN documents d USING (doc_id)
    GROUP BY c.component
    """,
)
def q_dedup_canonical_pick(spark, sf_dir):
    """Canonical-representative selection — the step a dedup pipeline
    runs AFTER clustering: inside each near-dup cluster keep exactly one
    document, chosen by a deterministic quality rule (longest text,
    doc_id tie-break), and drop the rest. Composes the MinHash-LSH pair
    graph → connected components → per-cluster argmax window.

    Scale shape: the components table is (doc_id, component) — narrow —
    and the argmax is one ranking window partitioned by component (same
    key the components agg already shuffled on). Nothing here is heavier
    than the clustering that precedes it."""
    comp = _components_df(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("len")
    )
    joined = comp.join(docs, "doc_id")
    w = W.partitionBy("component").orderBy(F.desc("len"), "doc_id")
    ranked = joined.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("kept_doc_id"),
        F.max("len").cast("long").alias("kept_len"),
    )


# 32-bit fingerprints: at 16 bits the space is so small that ~12% of ALL
# pairs of a 500-doc fixture landed within hamming 2 by chance — band
# buckets weren't selective. 32 bits (one majority vote per md5 hex-digit
# high bit) makes chance collisions negligible so surviving pairs reflect
# actual token-distribution similarity; production systems use 64.
SIMHASH_BITS = 32


def _simhash_cte(src: str = "documents") -> str:
    """Composable WITH-clause body producing ``sh`` (doc_id, simhash)
    over the relation ``src`` — shared by the fingerprint oracle and
    the search-twin oracle (which fingerprints an augmented corpus)."""
    bit_cols = ",\n             ".join(
        f"SUM(CASE WHEN substr(md5(token), {b}, 1) IN ('8','9','a','b','c','d','e','f')"
        f" THEN 1 ELSE -1 END) AS s{b}"
        for b in range(1, SIMHASH_BITS + 1)
    )
    fp = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << (SIMHASH_BITS - b)} ELSE 0 END)"
        for b in range(1, SIMHASH_BITS + 1)
    )
    return f"""tokens AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM {src}
    ),
    bits AS (
      SELECT doc_id,
             {bit_cols}
      FROM tokens GROUP BY doc_id
    ),
    sh AS (
      SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bits
    )"""


def _simhash_oracle() -> str:
    return f"""
    WITH {_simhash_cte()}
    SELECT doc_id, simhash FROM sh
    """


def _simhash_of(docs):
    """doc_id, simhash — the {SIMHASH_BITS}-bit per-document fingerprint
    over an arbitrary (doc_id, text) relation.

    Bit b (1-indexed) is the majority vote, over a document's tokens, of
    the high bit of hex digit b of md5(token) — the oracle's definition
    verbatim. The hot path avoids per-bit string ops: each token's md5
    is parsed ONCE into long chunks with conv(), all 32 vote bits come
    from integer shifts, and the per-document aggregation is 32 plain
    0/1 sums plus one count (the +-1 majority sum s_b > 0 is equivalent
    to 2*cnt_b > n). Everything stays in whole-stage codegen."""
    tokens = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    # md5 hex is 32 digits; split into 15/15/2-digit chunks so each
    # parses into a signed 64-bit long (15 nibbles = 60 bits)
    md5c = F.md5("token")
    chunks = tokens.select(
        "doc_id",
        F.conv(F.substring(md5c, 1, 15), 16, 10).cast("long").alias("v1"),
        F.conv(F.substring(md5c, 16, 15), 16, 10).cast("long").alias("v2"),
        F.conv(F.substring(md5c, 31, 2), 16, 10).cast("long").alias("v3"),
    )

    def vote_bit(b: int):
        # high bit of hex digit b: bit 3 of the digit's nibble within
        # its chunk (digits are most-significant-first inside conv())
        if b <= 15:
            return F.shiftright("v1", 4 * (15 - b) + 3).bitwiseAND(1)
        if b <= 30:
            return F.shiftright("v2", 4 * (30 - b) + 3).bitwiseAND(1)
        return F.shiftright("v3", 4 * (32 - b) + 3).bitwiseAND(1)

    aggs = [F.count(F.lit(1)).alias("n_tok")] + [
        F.sum(vote_bit(b)).alias(f"c{b}") for b in range(1, SIMHASH_BITS + 1)
    ]
    bits = chunks.groupBy("doc_id").agg(*aggs)
    fp = None
    for b in range(1, SIMHASH_BITS + 1):
        term = F.when(
            F.col(f"c{b}") * 2 > F.col("n_tok"), F.lit(1 << (SIMHASH_BITS - b))
        ).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return bits.select("doc_id", fp.cast("long").alias("simhash"))


def _simhash_df(spark, sf_dir):
    """Memoized per session+corpus (round 14): the per-token md5 vote
    aggregation is the heavy part and both q_dedup_simhash and
    q_dedup_simhash_pairs re-derived it per call."""
    return memo_fragment(
        spark,
        "simhash_fp",
        sf_dir,
        lambda: _simhash_of(load(spark, sf_dir, "documents")),
    )


@register("q_dedup_simhash", oracle=_simhash_oracle())
def q_dedup_simhash(spark, sf_dir):
    """{SIMHASH_BITS}-bit SimHash fingerprints: per bit position, a majority
    vote of token-hash bits (hex digit high-bit of md5), packed into an
    integer.
    The fingerprint computation is the heavy, per-token part and is
    what's oracle-checked here; pairing is q_dedup_simhash_pairs."""
    return _simhash_df(spark, sf_dir)


HAMMING_MAX = 2
# pigeonhole banding: any pair within hamming distance HAMMING_MAX agrees
# exactly on at least one of HAMMING_MAX+1 disjoint bit bands, so the
# candidate join is an EQUI-join on (band, band_bits) — never all-pairs.
# 32 bits → bands of 11/11/10 bits.
_SIMHASH_BANDS = [(21, 0x7FF), (10, 0x7FF), (0, 0x3FF)]  # (shift, mask)


@register(
    "q_dedup_simhash_pairs",
    oracle=f"""
    WITH fp AS ({_simhash_oracle()})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    """,
)
def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs: all (a, b) with hamming(fp_a, fp_b) <=
    {HAMMING_MAX}, found WITHOUT an all-pairs join. Pigeonhole banding
    (split the fingerprint into HAMMING_MAX+1 disjoint bit bands; a pair
    within the hamming ball must match exactly on >= 1 band) turns
    candidate generation into an equi-join on (band, band_bits), then the
    exact hamming distance verifies candidates — the same
    ban[d]-then-verify shape as MinHash-LSH, so it scales the same way.

    The oracle is the all-pairs formulation (fine at oracle scale).
    The {SIMHASH_BITS}-bit fingerprint is banded 11/11/10; production
    widths are 64-bit, where band buckets get even more selective — the
    shape and guarantees are identical, only the chance-collision rate
    changes (see the SIMHASH_BITS comment above).
    """
    fp = _simhash_df(spark, sf_dir)
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright("simhash", shift).bitwiseAND(mask).alias("bits"),
            )
            for i, (shift, mask) in enumerate(_SIMHASH_BANDS)
        ]
    )
    keyed = fp.select(
        "doc_id", "simhash", F.explode(bands).alias("bk")
    ).select("doc_id", "simhash", "bk.band", "bk.bits")
    a = keyed.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fa"), "band", "bits"
    )
    b = keyed.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fb"), "band", "bits"
    )
    hamming = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        a.join(b, ["band", "bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "fa", "fb")
        .distinct()  # a pair may match on several bands — dedupe BEFORE verify
        .filter(hamming <= HAMMING_MAX)
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
    )


def _simhash_search_oracle() -> str:
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS band,"
        f" (simhash >> {shift}) & {mask} AS bits FROM sh"
        for i, (shift, mask) in enumerate(_SIMHASH_BANDS)
    )
    return f"""
    WITH aug AS ({_MHS_AUG_DUCK}),
    {_simhash_cte("aug")},
    keyed AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS q_doc, a.simhash AS fa,
                      b.doc_id AS cand_doc, b.simhash AS fb
      FROM keyed a JOIN keyed b
        ON a.band = b.band AND a.bits = b.bits AND b.doc_id <> a.doc_id
      WHERE a.doc_id % {MHS_MOD} = 0
    )
    SELECT q_doc, CAST(rnk AS BIGINT) AS rnk, cand_doc,
           CAST(hamming AS BIGINT) AS hamming
    FROM (
      SELECT q_doc, cand_doc,
             bit_count(xor(fa, fb)) AS hamming,
             ROW_NUMBER() OVER (
               PARTITION BY q_doc
               ORDER BY bit_count(xor(fa, fb)), cand_doc
             ) AS rnk
      FROM cand
    ) WHERE rnk <= {MHS_K}
    """


@register("q_dedup_simhash_search", oracle=_simhash_search_oracle())
def q_dedup_simhash_search(spark, sf_dir):
    """Top-k near-dup SEARCH over the SIMHASH index — the Hamming
    sibling of q_dedup_minhash_search, completing the serving pair for
    both fingerprint families: per probe doc (doc_id % {MHS_MOD} == 0)
    the {MHS_K} nearest neighbors by fingerprint Hamming distance,
    candidates drawn from the SAME pigeonhole band buckets the pair
    miner equi-joins on (a neighbor within hamming {HAMMING_MAX} is
    GUARANTEED to share a band; farther candidates surface
    opportunistically — the documented pigeonhole recall envelope).
    Rank key (hamming ASC, cand_doc) is pure int64. Runs over the same
    planted-near-copy corpus as the MinHash twin (_mhs_corpus), whose
    one-word-dropped twins perturb only a few majority votes and land
    within a small Hamming ball of their source.

    Scale shape: probe band keys broadcast against the banded index —
    map-side hash probe, corpus index never reshuffled; candidates
    bounded by the probe's bucket occupancy; one bounded top-k window.
    """
    # No checkpoint (round 15, reverting r14's eager one): the probe
    # side is tiny and BROADCAST, so the index side is the only real
    # consumer of the vote aggregation — the r14 checkpoint paid a
    # dedicated materialization job plus a full-width round trip that
    # A/B measurement shows costs more than the one re-derivation it
    # saves (in-suite cell 2.3 s before the checkpoint, 4.4 s with it,
    # 2.44 s without again).
    fp = _simhash_of(_mhs_corpus(spark, sf_dir))
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright("simhash", shift).bitwiseAND(mask).alias("bits"),
            )
            for i, (shift, mask) in enumerate(_SIMHASH_BANDS)
        ]
    )
    keyed = fp.select(
        "doc_id", "simhash", F.explode(bands).alias("bk")
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"),
             F.col("bk.bits").alias("bits"))
    probes = keyed.filter(F.col("doc_id") % MHS_MOD == 0)
    cand = (
        F.broadcast(probes).alias("a")
        .join(
            keyed.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("b.doc_id") != F.col("a.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("q_doc"),
            F.col("a.simhash").alias("fa"),
            F.col("b.doc_id").alias("cand_doc"),
            F.col("b.simhash").alias("fb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("long")
    return (
        cand.withColumn("hamming", ham)
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("q_doc").orderBy("hamming", "cand_doc")
            ),
        )
        .filter(F.col("rnk") <= MHS_K)
        .select("q_doc", F.col("rnk").cast("long").alias("rnk"),
                "cand_doc", "hamming")
    )


COSINE_DUP_THRESHOLD = 0.4

# Hard ceiling for the ALL-PAIRS exact-cosine baseline: above this row
# count the O(N²) join is refused outright (use q_dedup_embedding_lsh —
# same threshold semantics, bucketed candidate generation). 100k rows ≈
# 5e9 pairs is already the outer edge of sane for a verify baseline.
COSINE_ALL_PAIRS_MAX_ROWS = 100_000


@register(
    "q_dedup_embedding_cosine",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             SQRT(LIST_DOT_PRODUCT(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS dup_a, b.vec_id AS dup_b,
           ROUND(LIST_DOT_PRODUCT(a.e, b.e) / (a.nrm * b.nrm), 6) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE LIST_DOT_PRODUCT(a.e, b.e) / (a.nrm * b.nrm) >= {COSINE_DUP_THRESHOLD}
    """,
)
def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs: all (a, b) with
    cosine >= {COSINE_DUP_THRESHOLD}, a < b. This is the exact all-pairs
    baseline — O(N²·d) — run here over the full table.

    Scale path: at 100 TB the pair join must be prefiltered to LSH-bucket
    candidates (q_sim_lsh_buckets' sign-random-projection keys turn the
    cross join into an equi-join on bucket), then this exact cosine is the
    verify step over candidates only — same expression, tiny input. The
    threshold predicate is applied to the UNROUNDED score; both engines
    evaluate the identical left-to-right double summation, so the
    inclusion set is deterministic.

    Guarded: refuses to run above COSINE_ALL_PAIRS_MAX_ROWS rows so the
    all-pairs baseline can't be pointed at a production corpus by
    accident — the one-row count() guard costs a column-pruned scan and
    saves an accidental 10^13-pair join.
    """
    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    if n > COSINE_ALL_PAIRS_MAX_ROWS:
        raise ValueError(
            f"q_dedup_embedding_cosine is the O(N²) all-pairs verify baseline "
            f"and refuses corpora over {COSINE_ALL_PAIRS_MAX_ROWS} rows "
            f"(got {n}); use q_dedup_embedding_lsh for the scale path."
        )
    v = emb.select(
        "vec_id",
        F.col("embedding").alias("e"),
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("nrm"),
    )
    a = v.select(
        F.col("vec_id").alias("dup_a"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    b = v.select(
        F.col("vec_id").alias("dup_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("dup_a") < F.col("dup_b"))
        .withColumn("cos_raw", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos_raw") >= COSINE_DUP_THRESHOLD)
        .select("dup_a", "dup_b", F.round("cos_raw", 6).alias("cosine"))
    )


# sign-random-projection hyperplanes for the embedding LSH prefilter:
# fixed literals (seeded numpy, rounded, embedded below) so Spark and the
# DuckDB oracle compute the identical bucket keys. Banded OR construction:
# EMB_BANDS bands of EMB_BAND_BITS planes each — a pair is a candidate if
# it collides in ANY band (recall compounds across bands).
import numpy as _np

EMB_BANDS = 4
EMB_BAND_BITS = 6  # base (minimum) key width per band
# Corpus-scaled key width (the ROUND-10 REGISTERED DEFAULT, flipping the
# round-9 probe finding): a FIXED key space means bucket occupancy — and
# the candidate pair join — grows linearly with the corpus (qscale
# measured exponent 1.26 raw / 1.18 decorrelated at 6 bits; the scaled
# variant bits = 6 + log2(k) measured 0.53). The default now derives
# extra bits from the corpus count with pure-integer doubling
# thresholds, engine-identical by construction:
#   bits = EMB_BAND_BITS + sum_i [ n > EMB_BASE_N << i ],  i < 6
# so n <= 2000 keeps 6 bits (all gate SFs), and each corpus doubling
# past EMB_BASE_N adds one bit, capped at EMB_MAX_BITS.
# Plane indexing is FIXED-STRIDE (band * EMB_MAX_BITS + j) so bit j of a
# band's key names the same hyperplane at every width — the dynamic
# width is just a low-bit mask of the full 12-bit key, which is what
# lets the static oracle SQL express it with one scalar-subquery mask.
EMB_BASE_N = 2000
EMB_MAX_BITS = 12
_PLANES = (
    _np.random.default_rng(7)
    .standard_normal((EMB_BANDS * EMB_MAX_BITS, 64))
    .round(6)
    .tolist()
)


def emb_band_bits_for(n: int) -> int:
    """Key width for a corpus of ``n`` vectors (shared by the Spark op,
    the oracle's threshold-sum replica, and the weak-scaling probe)."""
    return EMB_BAND_BITS + sum(
        n > (EMB_BASE_N << i) for i in range(EMB_MAX_BITS - EMB_BAND_BITS)
    )


def _emb_full_key_sql(band: int) -> str:
    """Full EMB_MAX_BITS-wide key for one band; the dynamic width is a
    low-bit mask applied by the caller."""
    return " + ".join(
        f"(CASE WHEN LIST_DOT_PRODUCT(e, {_PLANES[band * EMB_MAX_BITS + j]}::DOUBLE[]) > 0"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(EMB_MAX_BITS)
    )


def _emb_lsh_cte(src: str = "embeddings") -> str:
    """Shared CTE chain for the embedding-LSH oracles: corpus-scaled key
    width (the same integer doubling-threshold sum emb_band_bits_for
    computes, as SQL over COUNT(*)) masking each band's full 12-bit key
    to the low ``bits`` bits — pure integer compares + shifts,
    engine-identical by construction. Ends with the ``bands`` relation
    (one row per (vector, band) with its bucket key). ``src`` swaps the
    corpus relation (the DBSCAN oracle keys an augmented corpus CTE)."""
    extra = " + ".join(
        f"(CASE WHEN n > {EMB_BASE_N << i} THEN 1 ELSE 0 END)"
        for i in range(EMB_MAX_BITS - EMB_BAND_BITS)
    )
    keys = ",\n             ".join(
        f"CAST(({_emb_full_key_sql(b)}) % msk AS BIGINT) AS bk{b}"
        for b in range(EMB_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT vec_id, e, nrm, {b} AS band, bk{b} AS bkey FROM keyed"
        for b in range(EMB_BANDS)
    )
    return f"""bb AS (
      SELECT (1 << ({EMB_BAND_BITS} + {extra})) AS msk
      FROM (SELECT COUNT(*) AS n FROM {src})
    ),
    v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             SQRT(LIST_DOT_PRODUCT(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {src}
    ),
    keyed AS (SELECT vec_id, e, nrm,
             {keys}
      FROM v CROSS JOIN bb),
    bands AS ({band_rows})"""


def _embedding_lsh_oracle() -> str:
    return f"""
    WITH {_emb_lsh_cte()}
    SELECT DISTINCT a.vec_id AS dup_a, b.vec_id AS dup_b,
           ROUND(LIST_DOT_PRODUCT(a.e, b.e) / (a.nrm * b.nrm), 6) AS cosine
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
    WHERE LIST_DOT_PRODUCT(a.e, b.e) / (a.nrm * b.nrm) >= {COSINE_DUP_THRESHOLD}
    """


def _emb_lsh_scored(spark, sf_dir, band_bits: int | None = None, emb=None):
    """Shared LSH candidate scorer: banded keys -> DISTINCT candidate
    pairs -> exact cosine, UNFILTERED (``cos_raw`` column).
    q_dedup_embedding_lsh applies the registered threshold on top;
    q_dedup_threshold_sweep buckets the same scored pairs against a
    threshold grid; q_dedup_dbscan passes its augmented corpus via
    ``emb``."""
    import numpy as np
    import pandas as pd

    from .similarity import lr_matmul, _to_matrix

    if emb is None and band_bits is None:
        # the registered default (corpus table, corpus-derived key
        # width) is consumed by q_dedup_embedding_lsh,
        # q_dedup_threshold_sweep, and q_dedup_decontaminate_semantic —
        # memoize the scored candidate ledger like the band index it
        # models (round 14); probe variants (explicit band_bits or an
        # augmented corpus) still build fresh
        return memo_fragment(
            spark,
            "emb_lsh_scored",
            sf_dir,
            lambda: _emb_lsh_scored(
                spark, sf_dir, emb_band_bits_for(
                    load(spark, sf_dir, "embeddings").count()
                ),
            ),
        )

    if emb is None:
        emb = load(spark, sf_dir, "embeddings")
    if band_bits is None:
        band_bits = emb_band_bits_for(emb.count())

    # bucket keys + norms in one vectorized pass: band_bits plane dots
    # per band per vector via numpy in dimension order (bit-identical to
    # the aggregate/zip_with HOF chain and DuckDB's LIST_DOT_PRODUCT —
    # the sign test on the unrounded dot must agree with the oracle).
    # Plane rows are fixed-stride (band * EMB_MAX_BITS + j) so the key
    # at width b is exactly the low-b-bit mask of the full 12-bit key
    # the oracle computes. The embedding rides through as double[] for
    # the exact-cosine verify join below.
    P = np.array(
        [
            _PLANES[b * EMB_MAX_BITS + j]
            for b in range(EMB_BANDS)
            for j in range(band_bits)
        ],
        dtype=np.float64,
    )

    def keys(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = _to_matrix(pdf["embedding"])
            dots, c_sq = lr_matmul(C, P)
            nrm = np.sqrt(c_sq)
            bits = dots > 0
            frames = []
            for b in range(EMB_BANDS):
                bkey = np.zeros(len(C), dtype=np.int64)
                for j in range(band_bits):
                    bkey += np.where(bits[:, b * band_bits + j], 1 << j, 0)
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"].to_numpy(),
                            "e": list(C),
                            "nrm": nrm,
                            "band": np.full(len(C), b, dtype=np.int32),
                            "bkey": bkey,
                        }
                    )
                )
            yield pd.concat(frames)

    v = (
        emb.select("vec_id", "embedding")
        .mapInPandas(
            keys, "vec_id long, e array<double>, nrm double, band int, bkey long"
        )
        # four consumers below (both sides of the id pair join + both
        # sides of the vector re-attach) — EAGER checkpoint so the
        # projection pass runs exactly once, unraceable (round 14)
        .localCheckpoint(eager=True)
    )
    # candidate generation shuffles IDS ONLY — a multi-band collision is
    # collapsed by distinct() BEFORE any vector is moved or any cosine is
    # computed, so the verify step runs exactly once per unique pair and
    # the (band, bkey) join's shuffle payload is 3 longs/row, not two
    # 64-dim vectors/row. The vectors are re-attached afterwards from the
    # keyed table (band 0 carries one row per vector).
    ids = v.select("vec_id", "band", "bkey")
    pairs = (
        ids.alias("a")
        .join(ids.alias("b"), ["band", "bkey"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("dup_a"), F.col("b.vec_id").alias("dup_b")
        )
        .distinct()
    )
    vec = v.filter(F.col("band") == 0).select("vec_id", "e", "nrm")
    a = vec.select(
        F.col("vec_id").alias("dup_a"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    b = vec.select(
        F.col("vec_id").alias("dup_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        pairs.join(a, "dup_a")
        .join(b, "dup_b")
        .withColumn("cos_raw", dot / (F.col("na") * F.col("nb")))
    )


@register("q_dedup_embedding_lsh", oracle=_embedding_lsh_oracle())
def q_dedup_embedding_lsh(spark, sf_dir, band_bits: int | None = None):
    """Embedding near-dup, the 100-TB path: sign-random-projection LSH
    with the banded-OR construction ({EMB_BANDS} bands of fixed literal
    hyperplanes), candidate pairs from an equi-join on (band, key),
    exact cosine >= threshold as the verify step, DISTINCT to collapse
    multi-band collisions. Versus q_dedup_embedding_cosine's all-pairs
    O(N²), candidates shrink ~16x at test scale and the join is a plain
    shuffle hash join on the key, so it scales like any other
    aggregation. Recall is tunable with bands x bits (more bands = more
    recall, more candidates); cross-all-band misses are the documented
    LSH trade.

    The REGISTERED DEFAULT scales the key width with the corpus
    (``emb_band_bits_for``: one extra bit per corpus doubling past
    {EMB_BASE_N}, capped at {EMB_MAX_BITS}) — a fixed key space lets
    bucket occupancy, and hence the candidate pair join, grow linearly
    with the corpus (round-9 qscale: exponent 1.26 raw / 1.18
    decorrelated at fixed 6 bits vs 0.53 with bits = 6 + log2(k)). The
    count() feeding the width is one scalar driver job, same bound
    class as the IVF centroid pulls. ``band_bits`` overrides for probe
    variants (e.g. pinning 6 bits to re-measure the fixed-space
    failure). Candidate scoring is shared with q_dedup_threshold_sweep
    via ``_emb_lsh_scored``.
    """
    return (
        _emb_lsh_scored(spark, sf_dir, band_bits)
        .filter(F.col("cos_raw") >= COSINE_DUP_THRESHOLD)
        .select("dup_a", "dup_b", F.round("cos_raw", 6).alias("cosine"))
    )


SEM_TEST_MOD = 7  # vec_id % 10 == 7 -> held-out "benchmark" slice
# (disjoint from the ANN query set's % 10 == 0 residue by construction)


def _sem_decontaminate_oracle() -> str:
    return f"""
    WITH {_emb_lsh_cte()},
    cand AS (
      SELECT DISTINCT
             CASE WHEN a.vec_id % 10 = {SEM_TEST_MOD}
                  THEN a.vec_id ELSE b.vec_id END AS test_id,
             CASE WHEN a.vec_id % 10 = {SEM_TEST_MOD}
                  THEN b.vec_id ELSE a.vec_id END AS train_id,
             ROUND(LIST_DOT_PRODUCT(a.e, b.e) / (a.nrm * b.nrm), 6)
               AS cosine
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
      WHERE (a.vec_id % 10 = {SEM_TEST_MOD})
            <> (b.vec_id % 10 = {SEM_TEST_MOD})
    ),
    best AS (
      SELECT test_id, train_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY test_id
                                ORDER BY cosine DESC, train_id) AS rn,
             COUNT(*) OVER (PARTITION BY test_id) AS nc
      FROM cand
    )
    SELECT t.vec_id AS test_id,
           CAST(COALESCE(b.nc, 0) AS BIGINT) AS n_candidates,
           b.cosine AS max_cos,
           b.train_id AS nearest_train,
           COALESCE(b.cosine >= {COSINE_DUP_THRESHOLD}, FALSE)
             AS contaminated
    FROM (SELECT vec_id FROM embeddings
          WHERE vec_id % 10 = {SEM_TEST_MOD}) t
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.test_id = t.vec_id
    """


@register("q_dedup_decontaminate_semantic", oracle=_sem_decontaminate_oracle())
def q_dedup_decontaminate_semantic(spark, sf_dir):
    """SEMANTIC decontamination — the embedding-space member of the
    decontamination matrix (exact-string, n-gram, suffix-array, and now
    nearest-neighbor): for every held-out vector (vec_id % 10 ==
    {SEM_TEST_MOD}, the planted benchmark slice), the most similar
    TRAINING vector among the LSH candidates, with the candidate count
    and a contaminated verdict at the registered near-dup threshold.
    This is the check paraphrase-level leakage needs: exact and
    substring decontamination miss a reworded benchmark item whose
    embedding still sits next to its source (Yang et al. 2023's
    rephrased-samples finding).

    Scale shape: identical to q_dedup_embedding_lsh — the cross-set
    candidates are the SAME banded sign-LSH equi-join (corpus-scaled
    key width, ids-only shuffle, distinct before any vector moves),
    filtered to pairs that straddle the split; per-test ranking is a
    window over the candidate relation, never the corpus. Every test
    vector gets a row (LEFT join), so the negative verdicts are
    value-checked too."""
    emb = load(spark, sf_dir, "embeddings")
    scored = _emb_lsh_scored(spark, sf_dir)
    is_ta = F.col("dup_a") % 10 == SEM_TEST_MOD
    is_tb = F.col("dup_b") % 10 == SEM_TEST_MOD
    cross = scored.filter(is_ta != is_tb).select(
        F.when(is_ta, F.col("dup_a")).otherwise(F.col("dup_b"))
        .alias("test_id"),
        F.when(is_ta, F.col("dup_b")).otherwise(F.col("dup_a"))
        .alias("train_id"),
        F.round("cos_raw", 6).alias("cosine"),
    )
    wnd = W.partitionBy("test_id").orderBy(F.desc("cosine"), "train_id")
    best = (
        cross.withColumn("rn", F.row_number().over(wnd))
        .withColumn("nc", F.count(F.lit(1)).over(W.partitionBy("test_id")))
        .filter(F.col("rn") == 1)
    )
    tests = emb.filter(F.col("vec_id") % 10 == SEM_TEST_MOD).select(
        F.col("vec_id").alias("test_id")
    )
    return tests.join(best, "test_id", "left").select(
        "test_id",
        F.coalesce(F.col("nc"), F.lit(0)).cast("long").alias("n_candidates"),
        F.col("cosine").alias("max_cos"),
        F.col("train_id").alias("nearest_train"),
        F.coalesce(
            F.col("cosine") >= COSINE_DUP_THRESHOLD, F.lit(False)
        ).alias("contaminated"),
    )


# threshold grid for the sweep: spans loose near-dup to near-identity;
# integer e6 literals so the cut is an integer compare on both engines
SWEEP_TAUS_E6 = [250000, 500000, 700000, 800000, 900000, 950000, 990000]


def _threshold_sweep_oracle() -> str:
    taus = ", ".join(f"({t})" for t in SWEEP_TAUS_E6)
    # reuse the LSH candidate chain, but keep the UNFILTERED snapped
    # cosine and bucket it against the grid
    return f"""
    WITH {_emb_lsh_cte()},
    scored AS (
      SELECT DISTINCT a.vec_id AS dup_a, b.vec_id AS dup_b,
             CAST(FLOOR(LIST_DOT_PRODUCT(a.e, b.e) / (a.nrm * b.nrm) * 1e6
                        + 0.5) AS BIGINT) AS cos_e6
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
    ),
    taus(tau_e6) AS (VALUES {taus})
    SELECT CAST(tau_e6 AS BIGINT) AS tau_e6,
           CAST(COUNT(CASE WHEN cos_e6 >= tau_e6 THEN 1 END) AS BIGINT)
             AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN cos_e6 >= tau_e6 THEN dup_b END)
                AS BIGINT) AS n_docs_removed
    FROM taus CROSS JOIN scored
    GROUP BY tau_e6
    """


@register("q_dedup_threshold_sweep", oracle=_threshold_sweep_oracle())
def q_dedup_threshold_sweep(spark, sf_dir):
    """Threshold-selection sweep for embedding dedup: bucket the SAME
    LSH candidate pairs q_dedup_embedding_lsh scores against a grid of
    cosine thresholds and report, per threshold, the surviving pair
    count and the would-be-removed document count under keep-lowest-id
    — the table an operator reads before committing a dedup tau at
    corpus scale (every tau here is one more row, not one more corpus
    scan). Candidates only — pairs missed by every band are invisible
    at any tau, the documented LSH recall trade.

    The cosine snaps to e6 fixed point and the grid is integer e6
    literals, so every cut is an exact integer compare on both engines.
    Plan: the shared scorer's output (bounded by the banded candidate
    join) crossed with the constant 7-row grid — one broadcast
    nested-loop over a 7-row literal relation, then one groupBy(tau)
    with a distinct-agg; nothing new shuffles the corpus."""
    scored = _emb_lsh_scored(spark, sf_dir).select(
        "dup_a",
        "dup_b",
        F.floor(F.col("cos_raw") * 1e6 + F.lit(0.5)).cast("long").alias("cos_e6"),
    )
    taus = spark.createDataFrame(
        [(t,) for t in SWEEP_TAUS_E6], "tau_e6 long"
    )
    hit = F.col("cos_e6") >= F.col("tau_e6")
    return (
        F.broadcast(taus)
        .crossJoin(scored)
        .groupBy("tau_e6")
        .agg(
            F.count(F.when(hit, 1)).cast("long").alias("n_pairs"),
            F.countDistinct(F.when(hit, F.col("dup_b")))
            .cast("long")
            .alias("n_docs_removed"),
        )
    )


@register(
    "q_dedup_rate_by_source",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(lower(text))) AS BIGINT) AS n_unique,
           ROUND(1 - CAST(COUNT(DISTINCT md5(lower(text))) AS DOUBLE)
                     / COUNT(*), 4) AS dup_rate
    FROM (SELECT source, text FROM documents
          UNION ALL
          SELECT source, text FROM documents WHERE doc_id % 3 = 0) d
    GROUP BY source
    """,
)
def q_dedup_rate_by_source(spark, sf_dir):
    """Per-source duplication reporting — the pipeline-health dashboard
    companion to q_dedup_exact: document count, distinct-content count,
    and dup rate per source over the same synthetic duplicate injection.
    countDistinct on the content hash is one expand + partial-agg
    shuffle on (source, hash); no pair join."""
    docs = load(spark, sf_dir, "documents").select("source", "text", "doc_id")
    with_dupes = docs.unionByName(docs.filter(F.col("doc_id") % 3 == 0))
    h = F.md5(F.lower(F.col("text")))
    n_unique = F.countDistinct(h)
    return (
        with_dupes.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_unique.alias("n_unique"),
            F.round(1 - n_unique.cast("double") / F.count(F.lit(1)), 4).alias("dup_rate"),
        )
    )


def _leakage_split_oracle() -> str:
    return f"""
    WITH RECURSIVE pairs AS (
      {_minhash_oracle()}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (
      SELECT node AS doc_id, MIN(lab) AS component FROM reach GROUP BY node
    )
    SELECT d.doc_id,
           CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component,
           CASE WHEN ('0x' || substr(md5(CAST(COALESCE(c.component, d.doc_id)
                                              AS VARCHAR)), 1, 8))::BIGINT
                     % 10 < 8
                THEN 'train' ELSE 'test' END AS split
    FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    """


@register("q_split_leakage_safe", oracle=_leakage_split_oracle())
def q_split_leakage_safe(spark, sf_dir):
    """Leakage-safe train/test split: hash the near-dup CLUSTER id, not
    the document id, so every member of a duplicate cluster lands in the
    same split — the guard against test-set contamination by near-copies
    of training documents. Composition of the connected-components
    operator (cluster assignment over the LSH pair graph) with the
    deterministic key-hash split; singleton documents are their own
    component. Everything after CC is a broadcast join (the component
    table is one row per *clustered* doc — tiny relative to the corpus)
    plus a map-side hash."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    comp = q_dedup_connected_components(spark, sf_dir)
    component = F.coalesce(F.col("component"), F.col("doc_id"))
    bucket = (
        F.conv(F.substring(F.md5(component.cast("string")), 1, 8), 16, 10).cast("long")
        % 10
    )
    return (
        docs.join(F.broadcast(comp), "doc_id", "left_outer")
        .select(
            "doc_id",
            component.alias("component"),
            F.when(bucket < 8, "train").otherwise("test").alias("split"),
        )
    )


@register(
    "q_dedup_repeated_spans",
    oracle="""
    WITH chunks AS (
      SELECT doc_id,
             md5(substr(text, CAST(i * 64 + 1 AS INT), 64)) AS span_md5
      FROM documents,
           UNNEST(range(0, (LENGTH(text) - 1) // 64 + 1)) AS u(i)
      WHERE LENGTH(text) >= 64
        AND LENGTH(substr(text, CAST(i * 64 + 1 AS INT), 64)) = 64
    )
    SELECT span_md5,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           COUNT(*) AS n_occurrences,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
    FROM chunks
    GROUP BY span_md5
    HAVING COUNT(DISTINCT doc_id) > 1
    """,
)
def q_dedup_repeated_spans(spark, sf_dir):
    """Repeated-span (boilerplate) detection: hash fixed 64-char spans of
    every document and keep spans that recur across documents — the
    span-level companion to whole-document dedup (headers, license
    blurbs, navigation chrome repeat across pages long before full docs
    collide). sequence+explode keeps span generation map-side and
    data-proportional; the COUNT(DISTINCT doc_id) aggregate costs two
    chained shuffles — hash on (span_md5, doc_id) for the per-doc
    collapse, then hash on span_md5 over the already-collapsed
    relation (Spark's distinct-aggregate rewrite; the second shuffle
    moves at most one row per (span, doc)).
    At 100 TB the span table is the big intermediate — hashing down to
    md5 (not carrying span text) keeps shuffle bytes at 32+8 per span
    regardless of span width. Short tail spans are dropped so every
    hashed span covers exactly 64 chars (partial tails would always be
    unique and only inflate the shuffle)."""
    docs = load(spark, sf_dir, "documents").filter(F.length("text") >= 64)
    n_spans = (F.length("text") - 1).cast("long") / F.lit(64)
    piece = F.expr("substring(text, CAST(span_id * 64 + 1 AS INT), 64)")
    chunks = (
        docs.select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.floor(n_spans))
            ).alias("span_id"),
        )
        .filter(F.length(piece) == 64)
        .select("doc_id", F.md5(piece).alias("span_md5"))
    )
    return (
        chunks.groupBy("span_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


SUBSTR_W = 8  # shingle-unit width (words) for substring-level dedup

_SUBSTR_UNITS_DUCK = f"""
    words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      WHERE len(string_split(text, ' ')) >= {SUBSTR_W}
    ),
    units AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
             md5(array_to_string(
               ws[CAST(u.i AS INT) + 1 : CAST(u.i AS INT) + {SUBSTR_W}],
               ' ')) AS h
      FROM words, UNNEST(range(0, len(ws) - {SUBSTR_W} + 1)) AS u(i)
    ),
    dup AS (
      SELECT h FROM units GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
    ),
    hits AS (
      SELECT u.doc_id, u.pos, u.h,
             u.pos - ROW_NUMBER() OVER (PARTITION BY u.doc_id
                                        ORDER BY u.pos) AS grp
      FROM units u JOIN dup d ON u.h = d.h
    ),
    spans AS (
      SELECT doc_id,
             CAST(MIN(pos) AS BIGINT) AS span_start,
             CAST(MAX(pos) - MIN(pos) + {SUBSTR_W} AS BIGINT) AS span_words,
             CAST(COUNT(*) AS BIGINT) AS n_units
      FROM hits GROUP BY doc_id, grp
    )
"""


def _substring_units(spark, sf_dir):
    """Stride-1 {SUBSTR_W}-word shingle units with positions, one row
    per (doc, pos), hash only (no text rides the shuffle). Memoized per
    session+corpus (round 14): the per-position window md5 is the most
    expensive map in the substring-dedup family and four entries (plus
    q_dedup_substring_exact three times within one plan) re-derived it
    per consumer — this is the unit-hash index a production pipeline
    persists next to the shingle index."""

    def _build():
        docs = load(spark, sf_dir, "documents")
        ws = docs.select("doc_id", F.split("text", " ").alias("ws")).filter(
            F.size("ws") >= SUBSTR_W
        )
        return ws.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(ws) - {SUBSTR_W}),"
                    f" i -> struct(cast(i as bigint) as pos,"
                    f" md5(array_join(slice(ws, i + 1, {SUBSTR_W}), ' ')) as h))"
                )
            ).alias("u"),
        ).select("doc_id", "u.pos", "u.h")

    return memo_fragment(spark, "substring_units", sf_dir, _build)


def _substring_hits_df(spark, sf_dir):
    """Memoized cross-document duplicated-unit occurrences (see
    _substring_hits): shared first stage of q_dedup_substring /
    _removal / _exact."""
    return memo_fragment(
        spark,
        "substring_hits",
        sf_dir,
        lambda: _substring_hits(_substring_units(spark, sf_dir)),
    )


def _substring_hits(units):
    """Occurrences of cross-document duplicated units, with the
    pos - row_number island key ``grp`` attached (per-doc window,
    bounded by document length)."""
    dup = (
        units.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h")
    )
    return units.join(dup, "h").withColumn(
        "grp",
        F.col("pos") - F.row_number().over(W.partitionBy("doc_id").orderBy("pos")),
    )


def _substring_spans(spark, sf_dir, keep_grp: bool = False):
    """Shared span builder for the substring-dedup entries: stride-1
    {SUBSTR_W}-word shingle units -> cross-document duplicated units ->
    per-doc island merge of consecutive unit positions into maximal
    variable-length spans."""
    hits = _substring_hits_df(spark, sf_dir)
    spans = hits.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") - F.min("pos") + F.lit(SUBSTR_W)).alias("span_words"),
        F.count(F.lit(1)).alias("n_units"),
    )
    return spans if keep_grp else spans.drop("grp")


@register(
    "q_dedup_substring",
    oracle=f"""
    WITH {_SUBSTR_UNITS_DUCK}
    SELECT doc_id, span_start, span_words, n_units FROM spans
    """,
)
def q_dedup_substring(spark, sf_dir):
    """Exact substring-level dedup (the Lee et al. "Deduplicating
    Training Data Makes Language Models Better" family): find maximal
    VARIABLE-LENGTH word spans that recur verbatim across documents —
    the license blurbs, navigation chrome, and quoted passages that
    doc-level dedup (q_dedup_exact/q_dedup_minhash_lsh) and fixed-width
    span hashing (q_dedup_repeated_spans, 64-char tiles) both miss.

    Distributed suffix-array stand-in, band-then-chain instead of
    all-pairs: (1) stride-1 {SUBSTR_W}-word shingle UNITS with
    positions, hashed to md5 so the shuffle carries 32+16 bytes per
    unit regardless of span text; (2) units that occur in >1 distinct
    document (two chained hash aggregations — Spark's distinct-agg
    rewrite, both map-side combinable); (3) join positions back against
    the duplicated-unit set (semi-join shape: output <= unit count, no
    pair explosion — the skew-heavy boilerplate key makes MORE hits,
    never a quadratic bucket); (4) per-document island merge of
    consecutive duplicated positions (pos - row_number, a per-doc
    window bounded by document length) into maximal runs. Any
    cross-document verbatim substring of >= {SUBSTR_W} words has every
    unit window duplicated, so it surfaces as one maximal span of its
    full length; spans may over-extend only where two distinct
    duplications abut (the standard shingle-chain approximation).
    Output: one row per maximal span with its start word offset,
    word length, and unit count."""
    return _substring_spans(spark, sf_dir)


def _substring_removal_oracle() -> str:
    """Per-doc duplicated-word coverage ledger SQL — shared by the
    registered q_dedup_substring_removal gate and the cascade oracle in
    pipeline.py (which consumes it as a CTE subquery)."""
    return f"""
    WITH {_SUBSTR_UNITS_DUCK},
    iv AS (
      SELECT doc_id, span_start AS s,
             span_start + span_words - 1 AS e
      FROM spans
    ),
    brk AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    CAST(-1 AS BIGINT))
                  THEN 1 ELSE 0 END AS is_new
      FROM iv
    ),
    isl AS (
      SELECT doc_id, s, e,
             SUM(is_new) OVER (PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM brk
    ),
    merged AS (
      SELECT doc_id, MIN(s) AS s, MAX(e) AS e
      FROM isl GROUP BY doc_id, island
    ),
    cov AS (
      SELECT doc_id, CAST(SUM(e - s + 1) AS BIGINT) AS dup_words,
             CAST(COUNT(*) AS BIGINT) AS n_spans
      FROM merged GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
           COALESCE(cov.dup_words, 0) AS dup_words,
           COALESCE(cov.n_spans, 0) AS n_spans,
           CAST(COALESCE(cov.dup_words, 0) * 10000
                // len(string_split(d.text, ' ')) AS BIGINT) AS dup_ratio_e4
    FROM documents d LEFT JOIN cov ON cov.doc_id = d.doc_id
    """


@register("q_dedup_substring_removal", oracle=_substring_removal_oracle())
def q_dedup_substring_removal(spark, sf_dir):
    """Removal ledger for substring-level dedup: per document, how many
    words sit inside a cross-document duplicated span — the quantity a
    cleaning pass deletes (Lee et al. cut exact duplicated spans and
    keep the remainder). Composes q_dedup_substring's maximal unit
    runs, then WORD-interval merges them (runs separated by a non-dup
    unit can still overlap in word coverage, since each unit covers
    {SUBSTR_W} words): running-max carry over the per-doc span list —
    a second window pass over the SPANS relation, corpus-small — then
    one sum per doc. dup_ratio_e4 is exact integer div of positive
    operands (engine-identical). All documents are reported (zero rows
    for clean docs) so the ledger is the direct input to a
    keep/drop/trim decision."""
    docs = load(spark, sf_dir, "documents")
    spans = _substring_spans(spark, sf_dir).select(
        "doc_id",
        F.col("span_start").alias("s"),
        (F.col("span_start") + F.col("span_words") - 1).alias("e"),
    )
    wdoc = W.partitionBy("doc_id").orderBy("s")
    prev_max = F.max("e").over(wdoc.rowsBetween(W.unboundedPreceding, -1))
    brk = spans.withColumn(
        "is_new",
        F.when(F.col("s") > F.coalesce(prev_max, F.lit(-1).cast("long")), 1)
        .otherwise(0),
    )
    isl = brk.withColumn(
        "island", F.sum("is_new").over(wdoc.rowsBetween(W.unboundedPreceding, 0))
    )
    merged = isl.groupBy("doc_id", "island").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    cov = merged.groupBy("doc_id").agg(
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_words"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    nw = F.size(F.split("text", " ")).cast("long")
    return (
        docs.select("doc_id", nw.alias("n_words"))
        .join(cov, "doc_id", "left_outer")
        .select(
            "doc_id",
            "n_words",
            F.coalesce("dup_words", F.lit(0).cast("long")).alias("dup_words"),
            F.coalesce("n_spans", F.lit(0).cast("long")).alias("n_spans"),
            F.expr("coalesce(dup_words, cast(0 as bigint)) * 10000 div n_words")
            .cast("long")
            .alias("dup_ratio_e4"),
        )
    )


def _substring_exact_oracle() -> str:
    return f"""
    WITH {_SUBSTR_UNITS_DUCK},
    spans2 AS (
      SELECT doc_id, grp,
             CAST(MIN(pos) AS BIGINT) AS span_start,
             CAST(MAX(pos) - MIN(pos) + {SUBSTR_W} AS BIGINT) AS span_words,
             CAST(COUNT(*) AS BIGINT) AS n_units
      FROM hits GROUP BY doc_id, grp
    ),
    myu AS (
      SELECT t.doc_id, t.grp, t.pos - s.span_start AS j, t.h
      FROM hits t JOIN spans2 s USING (doc_id, grp)
    ),
    u0 AS (SELECT doc_id, grp, h FROM myu WHERE j = 0),
    cand AS (
      SELECT u0.doc_id, u0.grp, u.doc_id AS w_doc, u.pos AS w_pos
      FROM u0 JOIN units u ON u.h = u0.h AND u.doc_id <> u0.doc_id
    ),
    expect AS (
      SELECT c.doc_id, c.grp, c.w_doc, c.w_pos, m.j, m.h AS hj
      FROM cand c JOIN myu m USING (doc_id, grp)
    ),
    matchrow AS (
      SELECT e.doc_id, e.grp, e.w_doc, e.w_pos, e.j,
             (w.h IS NOT NULL AND w.h = e.hj) AS ok
      FROM expect e LEFT JOIN units w
        ON w.doc_id = e.w_doc AND w.pos = e.w_pos + e.j
    ),
    perwit AS (
      SELECT doc_id, grp, w_doc, w_pos,
             COALESCE(MIN(CASE WHEN NOT ok THEN j END), MAX(j) + 1) AS l_units
      FROM matchrow GROUP BY doc_id, grp, w_doc, w_pos
    ),
    perdoc AS (
      SELECT doc_id, grp, w_doc, MAX(l_units) AS ld
      FROM perwit GROUP BY doc_id, grp, w_doc
    ),
    veri AS (
      SELECT p.doc_id, p.grp, MAX(p.ld) AS max_l,
             SUM(CASE WHEN p.ld = s.n_units THEN 1 ELSE 0 END) AS n_full
      FROM perdoc p JOIN spans2 s USING (doc_id, grp)
      GROUP BY p.doc_id, p.grp
    )
    SELECT s.doc_id, s.span_start, s.span_words, s.n_units,
           CAST({SUBSTR_W} - 1 + v.max_l AS BIGINT) AS verified_words,
           CAST(v.n_full AS BIGINT) AS n_full_witnesses,
           v.max_l = s.n_units AS is_exact
    FROM spans2 s JOIN veri v USING (doc_id, grp)
    """


@register("q_dedup_substring_exact", oracle=_substring_exact_oracle())
def q_dedup_substring_exact(spark, sf_dir):
    """Witness-verified substring dedup — closes q_dedup_substring's
    documented shingle-chain approximation (round-9 verdict item 5): an
    island of consecutive duplicated units can over-extend where two
    distinct duplications abut-and-overlap (doc D holds P·Q·R with P·Q
    from doc B and Q·R from doc C: every unit of P·Q·R is duplicated
    SOMEWHERE, so the chain merges, but P·Q·R occurs whole in no other
    document). Word-coverage (the removal ledger) is immune — the union
    of duplicated {SUBSTR_W}-word windows IS the exact union of all
    >= {SUBSTR_W}-word repeats — so this op verifies the SPAN
    ATTRIBUTION: for each island, does the whole span occur verbatim in
    some single other document, and if not, how much of it does?

    Verify pass, bounded by duplicated-unit occurrences x span length —
    never document pairs: (1) anchor candidates = other-doc occurrences
    of the island's FIRST unit hash (each is the only place a verbatim
    copy could start); (2) for each candidate alignment, expected rows
    (island unit j must equal witness unit at w_pos + j) left-join the
    unit table once — an equi-join on (doc, pos) with the offset folded
    into the key expression; (3) the verified prefix length per witness
    is min(first mismatched j, n_units) — exact integers throughout;
    (4) per island: max verified prefix over witnesses and the count of
    FULL witnesses. verified_words = {SUBSTR_W} - 1 + max_l (>=
    {SUBSTR_W} always, since the first unit is cross-doc duplicated by
    construction); is_exact <=> some single document contains the whole
    span. Hot-boilerplate clusters of k documents produce k candidates
    per island — the same within-cluster k-growth every pair-emitting
    dedup op has, and the qscale copies (salted words, disjoint ids)
    keep it linear in corpus count."""
    units = _substring_units(spark, sf_dir)
    hits = _substring_hits_df(spark, sf_dir)
    # spans feeds three consumers (myu, the n_units re-attach, the final
    # assembly) and myu two (u0 + expect) — checkpoint both so the
    # island aggregation runs once per query, not once per consumer
    # subtree (round 14; units/hits are session-memoized upstream)
    spans = hits.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") - F.min("pos") + F.lit(SUBSTR_W)).alias("span_words"),
        F.count(F.lit(1)).alias("n_units"),
    ).localCheckpoint(eager=True)
    myu = hits.join(spans.select("doc_id", "grp", "span_start"), ["doc_id", "grp"]).select(
        "doc_id", "grp", (F.col("pos") - F.col("span_start")).alias("j"), "h"
    ).localCheckpoint(eager=True)
    u0 = myu.filter(F.col("j") == 0).select("doc_id", "grp", "h")
    occ = units.select(
        F.col("doc_id").alias("w_doc"), F.col("pos").alias("w_pos"), "h"
    )
    cand = (
        u0.join(occ, "h")
        .filter(F.col("w_doc") != F.col("doc_id"))
        .select("doc_id", "grp", "w_doc", "w_pos")
    )
    expect = cand.join(myu.select("doc_id", "grp", "j", F.col("h").alias("hj")),
                       ["doc_id", "grp"])
    probe = units.select(
        F.col("doc_id").alias("p_doc"), F.col("pos").alias("p_pos"),
        F.col("h").alias("p_h"),
    )
    matchrow = expect.join(
        probe,
        (F.col("p_doc") == F.col("w_doc"))
        & (F.col("p_pos") == F.col("w_pos") + F.col("j")),
        "left",
    ).select(
        "doc_id", "grp", "w_doc", "w_pos", "j",
        (F.col("p_h").isNotNull() & (F.col("p_h") == F.col("hj"))).alias("ok"),
    )
    perwit = matchrow.groupBy("doc_id", "grp", "w_doc", "w_pos").agg(
        F.coalesce(
            F.min(F.when(~F.col("ok"), F.col("j"))), F.max("j") + 1
        ).alias("l_units")
    )
    perdoc = perwit.groupBy("doc_id", "grp", "w_doc").agg(
        F.max("l_units").alias("ld")
    )
    veri = (
        perdoc.join(spans.select("doc_id", "grp", "n_units"), ["doc_id", "grp"])
        .groupBy("doc_id", "grp")
        .agg(
            F.max("ld").alias("max_l"),
            F.sum(
                F.when(F.col("ld") == F.col("n_units"), 1).otherwise(0)
            ).alias("n_full"),
        )
    )
    return spans.join(veri, ["doc_id", "grp"]).select(
        "doc_id",
        "span_start",
        "span_words",
        "n_units",
        (F.lit(SUBSTR_W - 1) + F.col("max_l")).cast("long").alias("verified_words"),
        F.col("n_full").cast("long").alias("n_full_witnesses"),
        (F.col("max_l") == F.col("n_units")).alias("is_exact"),
    )


EVAL_MOD = 7  # doc_id % EVAL_MOD == 1 models the held-out benchmark set
DECON_MIN_SHARED = 4  # shared distinct shingles that flag contamination


@register(
    "q_dedup_decontaminate",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_DUCK}),
    eval_sh AS (
      SELECT DISTINCT shingle FROM shingles WHERE doc_id % {EVAL_MOD} = 1
    ),
    train AS (SELECT * FROM shingles WHERE doc_id % {EVAL_MOD} <> 1)
    SELECT t.doc_id,
           COUNT(*) AS n_shingles,
           CAST(COUNT(e.shingle) AS BIGINT) AS n_shared,
           ROUND(COUNT(e.shingle) * 1.0 / COUNT(*), 4) AS shared_ratio,
           (COUNT(e.shingle) >= {DECON_MIN_SHARED}) AS contaminated
    FROM train t LEFT JOIN eval_sh e ON t.shingle = e.shingle
    GROUP BY t.doc_id
    """,
)
def q_dedup_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training documents whose n-gram
    content overlaps the held-out evaluation set (doc_id % {EVAL_MOD}
    == 1 models the benchmark docs) — the pretraining hygiene pass that
    keeps eval answers out of the training corpus.

    The scalable shape is deliberately NOT a doc-pair join: the eval
    side is collapsed to its distinct-shingle SET first, so the overlap
    count is a left join of training shingles against a deduplicated
    key relation — each training shingle matches at most one eval row,
    output is bounded by the training shingle count, and no stop-
    shingle can explode the join the way a doc x doc candidate join
    would. Per-doc totals then come from ONE aggregation (COUNT(*) vs
    COUNT(match)). At 100 TB both sides shuffle on the shingle hash;
    the eval set is usually small enough that a real deployment could
    broadcast it, but the equi-join form here needs no such assumption.
    Reuses the exact trigram shingle pipeline of the dedup family
    (SHINGLE_TRANSFORM_SQL), so "overlap" means the same thing in
    dedup and decontamination.

    Complements q_text_contamination_ngram (text.py), which is the
    LEAK REPORT: 5-gram shingles against a benchmark slice defined by
    source, broadcast eval side, emitting only the contaminated docs
    with their overlap fractions. This op is the ADMISSION VERDICT:
    every training doc gets a row (the clean majority included — the
    output a filter stage consumes directly), eval membership is
    id-based, and the join is the no-broadcast-assumption equi-join
    shape for when the eval set itself is corpus-sized."""
    sh = _shingles_df(spark, sf_dir)
    eval_sh = (
        sh.filter(F.col("doc_id") % EVAL_MOD == 1)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = sh.filter(F.col("doc_id") % EVAL_MOD != 1)
    return (
        train.join(eval_sh, "shingle", "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_shared"),
            F.round(F.count("hit") / F.count(F.lit(1)), 4).alias("shared_ratio"),
            (F.count("hit") >= DECON_MIN_SHARED).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Semantic dedup (the SemDeDup shape, Abbas et al. 2023): block the
# embedding space by nearest seed centroid, then prune within each block
# by exact cosine against earlier-kept members. The cluster assignment
# turns the O(N^2) all-pairs cosine into per-cluster joins — at 100 TB
# the seed table comes from a k-means run (q_sim_kmeans) and each
# posting-list-sized cluster is compared independently.

SNM_BUCKET_SHIFT = 24  # bucket = top 8 fingerprint bits -> 256 range buckets
SNM_WINDOW = 2  # compare each doc to its next 2 neighbors in sorted order
SNM_TAU = 8  # hamming threshold for a reported neighbor pair


def _snm_oracle() -> str:
    leads = ",\n             ".join(
        f"LEAD(simhash, {i}) OVER w AS n{i}, LEAD(doc_id, {i}) OVER w AS d{i}"
        for i in range(1, SNM_WINDOW + 1)
    )
    branches = "\n      UNION ALL\n".join(
        f"""      SELECT LEAST(doc_id, d{i}) AS doc_a, GREATEST(doc_id, d{i}) AS doc_b,
             CAST(bit_count(xor(simhash, n{i})) AS BIGINT) AS hamming
      FROM ranked WHERE d{i} IS NOT NULL
        AND bit_count(xor(simhash, n{i})) <= {SNM_TAU}"""
        for i in range(1, SNM_WINDOW + 1)
    )
    return f"""
    WITH fp AS ({_simhash_oracle()}),
    ranked AS (
      SELECT doc_id, simhash,
             {leads}
      FROM fp
      WINDOW w AS (PARTITION BY simhash // {1 << SNM_BUCKET_SHIFT}
                   ORDER BY simhash, doc_id)
    )
{branches}
    """


@register("q_dedup_sorted_neighborhood", oracle=_snm_oracle())
def q_dedup_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood (SNM) near-dup candidates: sort fingerprints
    within {1 << (SIMHASH_BITS - SNM_BUCKET_SHIFT)} range buckets (top
    byte of the simhash) and compare each document only to its next
    {SNM_WINDOW} sorted neighbors, reporting pairs within hamming
    {SNM_TAU} — the classic record-linkage alternative to banded
    equi-joins when a total order on the fingerprint is meaningful
    (similar fingerprints sort near each other). Cost is one shuffle on
    the bucket key + a partitioned-window sort + O(n*{SNM_WINDOW}) JVM
    bit compares: no pair explosion is POSSIBLE, by construction, at any
    skew — the trade is recall (pairs straddling a bucket boundary, or
    >{SNM_WINDOW} ranks apart, are missed; banding has no such misses
    inside its hamming ball). Production widens recall with more/
    overlapping passes under different sort keys, not wider windows. The
    bucket count (top-k bits) is the parallelism knob — at 100 TB use
    enough bits that a bucket fits an executor's sort buffer."""
    fp = _simhash_df(spark, sf_dir)
    w = (
        W.partitionBy("bucket").orderBy("simhash", "doc_id")
    )
    ranked = fp.withColumn(
        "bucket", F.shiftright("simhash", SNM_BUCKET_SHIFT)
    )
    for i in range(1, SNM_WINDOW + 1):
        ranked = ranked.withColumn(f"n{i}", F.lead("simhash", i).over(w)).withColumn(
            f"d{i}", F.lead("doc_id", i).over(w)
        )
    branches = []
    for i in range(1, SNM_WINDOW + 1):
        ham = F.bit_count(F.col("simhash").bitwiseXOR(F.col(f"n{i}")))
        branches.append(
            ranked.filter(F.col(f"d{i}").isNotNull() & (ham <= SNM_TAU)).select(
                F.least("doc_id", f"d{i}").alias("doc_a"),
                F.greatest("doc_id", f"d{i}").alias("doc_b"),
                ham.cast("long").alias("hamming"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


SEM_K = 8  # minimum seed centroids: the first vectors by vec_id
SEM_TAU = 0.4  # within-cluster cosine prune threshold
# Corpus-scaled seed count (ROUND-10 REGISTERED DEFAULT): a fixed seed
# count makes the per-cluster compare block grow linearly with the
# corpus (round-9 qscale: exponent 1.19 fixed vs 0.52 with seeds ∝ N).
# One seed per SEM_TARGET vectors keeps expected cluster size — and the
# within-cluster O(chunk x cluster) compare — bounded. Integer div on
# both engines, so the cut is engine-identical. All gate SFs (500 /
# 2000 vectors) resolve to the historical 8 seeds; the 16x probe replay
# (32000 vectors) resolves to 128 = the measured-0.52 variant.
SEM_TARGET = 250


def sem_seeds_for(n: int) -> int:
    """Seed-centroid count for a corpus of ``n`` vectors (shared by the
    Spark op, the oracle's GREATEST/div replica, and the probe)."""
    return max(SEM_K, n // SEM_TARGET)


@register(
    "q_dedup_semantic",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             LIST_DOT_PRODUCT(embedding::DOUBLE[], embedding::DOUBLE[]) AS sq
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS seed_id, e AS se, sq AS ssq FROM v
      QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id)
              <= GREATEST({SEM_K}, (SELECT COUNT(*) FROM v) // {SEM_TARGET})
    ),
    assign AS (
      SELECT vec_id, e, sq, seed_id,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id
               ORDER BY sq - 2.0 * LIST_DOT_PRODUCT(e, se) + ssq, seed_id
             ) AS rn
      FROM v CROSS JOIN seeds
    ),
    clustered AS (
      SELECT vec_id, e, seed_id AS cluster, SQRT(sq) AS nrm
      FROM assign WHERE rn = 1
    ),
    drops AS (
      SELECT a.vec_id, COUNT(*) AS n_earlier_dups
      FROM clustered a JOIN clustered b
        ON a.cluster = b.cluster AND b.vec_id < a.vec_id
      WHERE LIST_DOT_PRODUCT(a.e, b.e) / (a.nrm * b.nrm) >= {SEM_TAU}
      GROUP BY 1
    )
    SELECT c.vec_id, CAST(c.cluster AS BIGINT) AS cluster,
           CAST(COALESCE(d.n_earlier_dups, 0) AS BIGINT) AS n_earlier_dups,
           d.vec_id IS NULL AS keep
    FROM clustered c LEFT JOIN drops d ON c.vec_id = d.vec_id
    """,
)
def q_dedup_semantic(spark, sf_dir, sem_k: int | None = None):
    """Semantic dedup, SemDeDup-style: assign every embedding to its
    nearest deterministic seed centroid (the first ``sem_seeds_for(N)``
    vectors by vec_id — in production the centroids from q_sim_kmeans),
    then within each cluster drop any vector whose cosine to an
    EARLIER-id cluster member reaches {SEM_TAU} (greedy keep-first, so
    membership needs no fixpoint).

    Plan shape and why it scales: assignment is a stateless mapInPandas
    over the corpus with the {SEM_K}-row seed matrix in the task closure
    (constant-size, the Q_CAP pattern from similarity.py) — no join, no
    shuffle; the within-cluster compare is ONE applyInPandas grouped by
    cluster id (a single hash shuffle of the corpus), scoring each
    cluster with numpy in row-chunks so peak memory is O(chunk x
    cluster), never cluster². Distances use the identical
    ``(sq - 2*dot) + ssq`` expansion and all dot products accumulate
    left-to-right (lr_matmul), so argmin assignment and the threshold
    inclusion set are bit-deterministic across engines (np.argmin's
    first-minimum rule IS the seed-id tiebreak, seeds sorted by id).

    The REGISTERED DEFAULT scales seeds with the corpus
    (``sem_seeds_for``: one seed per {SEM_TARGET} vectors, floor
    {SEM_K}) — the round-9 probe measured exponent 1.19 at a fixed 8
    seeds vs 0.52 with seeds ∝ N, because a fixed seed count lets the
    per-cluster compare block grow linearly with the corpus. The
    count() feeding it is one scalar driver job. ``sem_k`` overrides
    for probe variants.
    """
    import pandas as pd

    from .similarity import _to_matrix, lr_matmul

    emb = load(spark, sf_dir, "embeddings")
    if sem_k is None:
        sem_k = sem_seeds_for(emb.count())
    seed_rows = sorted(
        emb.orderBy("vec_id").limit(sem_k).select("vec_id", "embedding").collect()
    )  # constant-bounded TakeOrdered pull: at most sem_k rows
    if not seed_rows:
        raise ValueError("q_dedup_semantic: embeddings table is empty — no seeds")
    S = _to_matrix(pd.Series([r.embedding for r in seed_rows]))
    seed_ids = _np.array([r.vec_id for r in seed_rows])
    _, s_sq = lr_matmul(S, S[:0])

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = _to_matrix(pdf["embedding"])
            dots, c_sq = lr_matmul(C, S)
            dist = (c_sq[:, None] - 2.0 * dots) + s_sq[None, :]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cluster": seed_ids[_np.argmin(dist, axis=1)],
                }
            )

    clustered = emb.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, embedding array<float>, cluster long"
    )

    def dedup_cluster(pdf):
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        M = _to_matrix(pdf["embedding"])
        m = len(pdf)
        n_dups = _np.zeros(m, dtype=_np.int64)
        _, all_sq = lr_matmul(M, M[:0])
        nrm = _np.sqrt(all_sq)
        chunk = 1024
        for i0 in range(0, m, chunk):
            i1 = min(i0 + chunk, m)
            dots, _ = lr_matmul(M[i0:i1], M)
            cos = dots / (nrm[i0:i1, None] * nrm[None, :])
            hit = cos >= SEM_TAU
            # only EARLIER vec_ids (j < global row index) count
            cols = _np.arange(m)[None, :]
            rows = _np.arange(i0, i1)[:, None]
            n_dups[i0:i1] = (hit & (cols < rows)).sum(axis=1)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cluster": pdf["cluster"],
                "n_earlier_dups": n_dups,
                "keep": n_dups == 0,
            }
        )

    return clustered.groupBy("cluster").applyInPandas(
        dedup_cluster,
        "vec_id long, cluster long, n_earlier_dups long, keep boolean",
    )


@register(
    "q_dedup_cross_source_overlap",
    oracle=f"""
    WITH {_minhash_bands_cte()},
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           COUNT(*) AS n_pairs
    FROM pairs p
      JOIN documents da ON da.doc_id = p.doc_a
      JOIN documents db ON db.doc_id = p.doc_b
    GROUP BY 1, 2
    """,
)
def q_dedup_cross_source_overlap(spark, sf_dir):
    """Cross-source contamination matrix: how many MinHash-LSH near-dup
    candidate pairs fall between each (unordered) pair of sources — the
    diagnostic a corpus curator reads before deciding which source to
    drop or down-weight when two crawls overlap.

    Reuses the shared band index (_minhash_pairs) so the pair semantics
    are bit-identical to q_dedup_minhash_lsh; the source attach is two
    equi-joins on doc_id (at 100 TB, (doc_id, source) is a thin
    projection of the corpus — the pair table is orders of magnitude
    smaller, so both joins shuffle only pair-table-sized data after AQE
    sizes them). LEAST/GREATEST canonicalizes the source pair so each
    unordered pair counts once."""
    pairs = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- Normalization-invariant dedup (round 8) ----------------------------


@register(
    "q_dedup_normalized",
    # planted variants: every 20th doc re-inserted uppercased with
    # punctuation noise — invisible to q_dedup_exact's md5(lower(text))
    # (the ' !!' suffix changes the hash) but collapsed by the
    # canonicalization below. The perturbation and the canonicalizer are
    # engine-identical expressions, so the oracle replays both.
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, upper(text) || '  !!' AS text
      FROM documents WHERE doc_id % 20 = 0
    ),
    canon AS (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS canon_hash
      FROM corpus
    )
    SELECT canon_hash,
           CAST(MIN(doc_id) AS BIGINT) AS kept_doc_id,
           COUNT(*) AS n_variants
    FROM canon
    GROUP BY 1
    HAVING COUNT(*) > 1
    """,
)
def q_dedup_normalized(spark, sf_dir):
    """Normalization-invariant exact dedup — the canonicalize-then-hash
    pass real pipelines run BEFORE byte-exact dedup, because web-scraped
    duplicates differ in case, punctuation, and whitespace long before
    they differ in words. Canonical form: lowercase → strip everything
    outside [a-z0-9 ] → collapse whitespace runs → trim; md5 of that is
    the group key, smallest doc_id is kept.

    A planted variant set (every 20th doc, uppercased + punctuation
    noise) pins the semantic difference against ``q_dedup_exact``: the
    exact pass misses all of these, this pass collapses exactly them
    (plus any natural normalization collisions, deterministically).
    Same scale shape as exact dedup: one map-side canonicalization (two
    regex passes, JVM-side, no UDF) + one hash-partition aggregate."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  !!")).alias("text"),
    )
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return (
        docs.unionByName(planted)
        .groupBy(F.md5(canon).alias("canon_hash"))
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
        .filter(F.col("n_variants") > 1)
    )


# --- URL-level exact dedup (through the canonicalizer) ----------------------


def _url_dedup_oracle() -> str:
    from .text import _URL_CANON_SELECT, _URL_SQL, _URL_VARIANT_SQL, _url_canon_sql

    u_cte = f"""
      SELECT doc_id, {_URL_SQL} AS url FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, {_URL_VARIANT_SQL} AS url
      FROM documents WHERE doc_id % 5 = 0
    """
    inner = _url_canon_sql(u_cte, _URL_CANON_SELECT)
    return f"""
    SELECT canon_md5, CAST(MIN(doc_id) AS BIGINT) AS kept_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_distinct_raw
    FROM ({inner}) t
    GROUP BY 1
    """


@register("q_dedup_url_exact", oracle=_url_dedup_oracle())
def q_dedup_url_exact(spark, sf_dir):
    """URL-level exact dedup THROUGH the canonicalizer — the reason
    q_text_url_canonicalize exists: a synthetic re-crawl (every 5th
    resource re-fetched under a differently-dressed URL — host case
    flipped, default port dropped, tracking params and fragment
    changed, param order scrambled) must COLLAPSE onto the original's
    canonical key, which raw-string dedup provably cannot do
    (n_distinct_raw = 2 while n_copies = 2 on every planted pair).

    Composes the SAME canonicalization pipeline as the scoring op (one
    shared SQL template + one shared Spark column helper, so the rules
    cannot drift), then the standard hash-groupBy keep-smallest-id
    dedup. Scale shape: scan-side string work + one map-side-combinable
    groupBy on the canonical hash."""
    from .text import _URL_SQL, _URL_VARIANT_SQL, _canonicalize_url

    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.expr(_URL_SQL.replace("VARCHAR", "STRING")).alias("url")
    )
    variants = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr(_URL_VARIANT_SQL.replace("VARCHAR", "STRING")).alias("url"),
    )
    u = base.unionByName(variants)
    canon, _nd = _canonicalize_url(F.col("url"))
    return (
        u.select("doc_id", "url", F.md5(canon).alias("canon_md5"))
        .groupBy("canon_md5")
        .agg(
            F.min("doc_id").cast("long").alias("kept_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.countDistinct("url").cast("long").alias("n_distinct_raw"),
        )
    )


# --- Dedup savings accounting (cluster-size histogram + token mass) --------


@register(
    "q_dedup_savings",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0
    ),
    clusters AS (
      SELECT md5(LOWER(text)) AS h,
             CAST(COUNT(*) AS BIGINT) AS csize,
             CAST(MIN(doc_id) AS BIGINT) AS kept,
             CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS tok_all,
             CAST(MIN(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS tok_one
      FROM corpus GROUP BY 1
    )
    SELECT csize AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(csize - 1) AS BIGINT) AS docs_dropped,
           CAST(SUM(tok_all - tok_one) AS BIGINT) AS tokens_dropped
    FROM clusters GROUP BY 1
    """,
)
def q_dedup_savings(spark, sf_dir):
    """Dedup savings ledger: after exact-hash clustering (the
    q_dedup_exact convention, synthetic copies planted so clusters are
    non-trivial), the cluster-size histogram with how many documents
    and TOKENS each size class gives back. This is the number a
    pipeline owner actually budgets with — "dedup buys us N% of the
    token bill" — and the acceptance check that dedup savings estimates
    match what the canonical-pick stage later drops.

    All-identical cluster members make token accounting exact: tokens
    dropped = total token mass minus the kept copy's (= MIN, since all
    members tokenize identically). Pure integer: hash groupBy (the
    shuffle key is the content hash — uniform by construction, no
    skew), then a histogram aggregate over the CLUSTER relation."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    ntok = F.size(F.split("text", " ")).cast("long")
    clusters = (
        docs.unionByName(dupes)
        .select("doc_id", F.md5(F.lower(F.col("text"))).alias("h"), ntok.alias("nt"))
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("csize"),
            F.min("doc_id").alias("kept"),
            F.sum("nt").alias("tok_all"),
            F.min("nt").alias("tok_one"),
        )
    )
    return clusters.groupBy(F.col("csize").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum(F.col("csize") - 1).cast("long").alias("docs_dropped"),
        F.sum(F.col("tok_all") - F.col("tok_one")).cast("long").alias("tokens_dropped"),
    )


@register(
    "q_dedup_cluster_report",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      {{minhash}}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (
      SELECT node AS doc_id, CAST(MIN(lab) AS BIGINT) AS component
      FROM reach GROUP BY node
    ),
    sizes AS (
      SELECT component, CAST(COUNT(*) AS BIGINT) AS csize,
             CAST(MIN(doc_id) AS BIGINT) AS canonical
      FROM comp GROUP BY component
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
    SELECT s.csize AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(s.csize) AS BIGINT) AS n_docs_in,
           CAST(SUM(s.csize - 1) AS BIGINT) AS n_removable,
           CAST(MIN(s.canonical) AS BIGINT) AS example_cluster,
           CAST(SUM(s.csize - 1) * 1000000 // MAX(t.n_docs) AS BIGINT)
             AS removable_ppm
    FROM sizes s, tot t
    GROUP BY s.csize
    """.format(minhash=_minhash_oracle()),
)
def q_dedup_cluster_report(spark, sf_dir):
    """The dedup REPORT a pipeline owner reads before pulling the
    trigger: near-dup cluster-size histogram over the MinHash-LSH
    connected components — how many pairs/triples/bigger clusters exist,
    how many documents a keep-one-per-cluster pass would delete
    (n_removable per size, removable_ppm of the corpus), and an example
    cluster id per size for spot checks. The histogram's shape is the
    standard sanity gate: a giant component (one huge cluster_size row)
    means the LSH threshold is too loose, a wall of 2s means re-crawl
    duplicates. Pure composition: CC cluster assignment (the shared
    min-label loop), one size aggregate, one histogram aggregate, one
    1-row corpus total — everything past CC operates on the
    |clusters|-sized relation."""
    comp = _components_df(spark, sf_dir)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("csize"),
        F.min("doc_id").cast("long").alias("canonical"),
    )
    tot = load(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return (
        sizes.crossJoin(F.broadcast(tot))  # 1-row corpus total attach
        .groupBy(F.col("csize").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("csize").cast("long").alias("n_docs_in"),
            F.sum(F.col("csize") - 1).cast("long").alias("n_removable"),
            F.min("canonical").cast("long").alias("example_cluster"),
            F.expr(
                "cast(sum(csize - 1) * 1000000 div max(n_docs) as bigint)"
            ).alias("removable_ppm"),
        )
    )


# --- EXACT benchmark decontamination via the suffix array --------------------

CONTAM_MOD = 10  # benchmark membership: doc_id % CONTAM_MOD == 0 (the
# same held-out-slice convention as the embedding query set)
CONTAM_EXACT_W = 8  # contamination threshold in words — matches the
# shingle family's unit width so approximate and exact agree on scope


def _decontaminate_exact_oracle() -> str:
    from .text import _sa_perpos_cte

    return f"""
    WITH {_sa_perpos_cte()},
    dx AS (
      SELECT s.doc_id, s.pos, s.idx, (s.doc_id % {CONTAM_MOD} = 0) AS is_test,
             lp.lcp AS lcp_prev, ln.lcp AS lcp_next
      FROM sa s
      LEFT JOIN lcps lp ON lp.bd = s.doc_id AND lp.bp = s.pos
      LEFT JOIN lcps ln ON ln.ad = s.doc_id AND ln.ap = s.pos
    ),
    df1 AS (
      SELECT *,
             SUM(CASE WHEN is_test THEN 1 ELSE 0 END)
               OVER (ORDER BY idx ROWS UNBOUNDED PRECEDING) AS gf,
             SUM(CASE WHEN is_test THEN 1 ELSE 0 END)
               OVER (ORDER BY idx DESC ROWS UNBOUNDED PRECEDING) AS gb
      FROM dx
    ),
    df2 AS (
      SELECT doc_id, pos, is_test,
             CASE WHEN gf >= 1 THEN
               MIN(CASE WHEN is_test THEN NULL ELSE lcp_prev END)
                 OVER (PARTITION BY gf ORDER BY idx ROWS UNBOUNDED PRECEDING)
             END AS ov_f,
             CASE WHEN gb >= 1 THEN
               MIN(CASE WHEN is_test THEN NULL ELSE lcp_next END)
                 OVER (PARTITION BY gb ORDER BY idx DESC
                       ROWS UNBOUNDED PRECEDING)
             END AS ov_b
      FROM df1
    ),
    dov AS (
      SELECT doc_id, GREATEST(COALESCE(ov_f, 0), COALESCE(ov_b, 0)) AS ov
      FROM df2 WHERE NOT is_test
    )
    SELECT o.doc_id, d.n_words,
           CAST(MAX(o.ov) AS BIGINT) AS max_test_overlap_words,
           MAX(o.ov) >= {CONTAM_EXACT_W} AS contaminated
    FROM dov o JOIN dl d USING (doc_id)
    GROUP BY 1, 2
    """


@register("q_dedup_decontaminate_exact", oracle=_decontaminate_exact_oracle())
def q_dedup_decontaminate_exact(spark, sf_dir):
    """EXACT benchmark decontamination — the suffix-array upgrade of
    q_text_contamination_ngram / q_dedup_decontaminate's fixed-width
    n-gram probes: for every TRAINING document, the length of its
    longest word sequence that appears ANYWHERE in the held-out test
    slice (doc_id % {CONTAM_MOD} == 0), exactly — no shingle width to
    tune, no hash collisions, overlaps of every length visible. This is
    the Lee-et-al-style guarantee an eval-integrity audit actually
    wants: contaminated = (exact max overlap >= {CONTAM_EXACT_W}
    words).

    The algorithm is the classic cross-set LCP scan on the global
    suffix array: the longest match between a train suffix and the
    test SET is its LCP with the NEAREST test suffix in SA order
    (LCP telescopes as min over adjacent-boundary LCPs, and it only
    decreases with SA distance), so two running scans suffice —
    forward and backward over SA order, each a running count of test
    suffixes (the distributed two-pass global_cumsum, never a
    single-partition window) followed by a running MIN of boundary
    LCPs within each between-test-suffixes segment (a window
    PARTITIONED by the segment id). Everything reuses the memoized
    ladder/SA/LCP relations — the marginal cost over the SA family is
    two cumsums, two segment windows, and one per-doc max. Verified
    against a quadratic brute-force scan in tests.

    At 100 TB: the scan is linear in suffix count with no new
    corpus-wide state, and test-set size does not gate anything (the
    segments just shorten as test suffixes densify)."""
    from .registry import global_cumsum
    from .text import _sa_perpos

    _, dl, lcps, sa = _sa_perpos(spark, sf_dir)
    dx = (
        sa.join(
            lcps.select(
                F.col("bd").alias("doc_id"),
                F.col("bp").alias("pos"),
                F.col("lcp").alias("lcp_prev"),
            ),
            ["doc_id", "pos"],
            "left_outer",
        )
        .join(
            lcps.select(
                F.col("ad").alias("doc_id"),
                F.col("ap").alias("pos"),
                F.col("lcp").alias("lcp_next"),
            ),
            ["doc_id", "pos"],
            "left_outer",
        )
        .withColumn(
            "t", (F.col("doc_id") % CONTAM_MOD == 0).cast("long")
        )
        .withColumn("ridx", -F.col("idx"))
    )
    fwd = global_cumsum(dx, "idx", ["t"]).withColumnRenamed("cum_t", "gf")
    both = global_cumsum(fwd, "ridx", ["t"]).withColumnRenamed("cum_t", "gb")
    wf = (
        W.partitionBy("gf")
        .orderBy("idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wb = (
        W.partitionBy("gb")
        .orderBy(F.desc("idx"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is_test = F.col("t") == 1
    scanned = both.select(
        "doc_id",
        "pos",
        "t",
        F.when(
            F.col("gf") >= 1,
            F.min(F.when(~is_test, F.col("lcp_prev"))).over(wf),
        ).alias("ov_f"),
        F.when(
            F.col("gb") >= 1,
            F.min(F.when(~is_test, F.col("lcp_next"))).over(wb),
        ).alias("ov_b"),
    )
    ov = scanned.filter(~is_test).select(
        "doc_id",
        F.greatest(
            F.coalesce("ov_f", F.lit(0)), F.coalesce("ov_b", F.lit(0))
        ).alias("ov"),
    )
    return (
        ov.groupBy("doc_id")
        .agg(F.max("ov").cast("long").alias("max_test_overlap_words"))
        .join(dl, "doc_id")
        .select(
            "doc_id",
            "n_words",
            "max_test_overlap_words",
            (F.col("max_test_overlap_words") >= CONTAM_EXACT_W).alias(
                "contaminated"
            ),
        )
    )


# --- content-defined chunking (CDC) dedup ------------------------------------
#
# The dedup granularity between whole-document hashing and the
# suffix-array substring machinery: split every document at
# CONTENT-DEFINED boundaries — a position is a boundary iff the
# fingerprint of the last CDC_W words satisfies a threshold test — then
# dedup the chunks across documents. Because boundaries are PURE
# FUNCTIONS of a local window (the property behind rolling-hash CDC:
# Muthitacharoen et al. 2001 LBFS, Xia et al. 2016 FastCDC), inserting
# or deleting words only moves boundaries NEAR the edit; identical
# passages elsewhere re-chunk identically and keep deduplicating —
# exactly what fixed-size blocks cannot do. This is the unconstrained
# local-window variant (no min/max chunk clamps: those make a boundary
# depend on the previous ACCEPTED boundary, i.e. a sequential scan —
# the clamp-free form is what stays embarrassingly parallel, one
# window pass per document).

CDC_W = 4    # boundary window: fingerprint of the last CDC_W words
CDC_DIV = 8  # boundary iff fp % CDC_DIV == 0 -> expected ~8-word chunks


@register(
    "q_dedup_cdc_chunks",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    toks AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
             w[CAST(u.i AS INT) + 1] AS word
      FROM ws, UNNEST(range(0, len(w))) AS u(i)
    ),
    win AS (
      SELECT doc_id, pos, word,
             COALESCE(LAG(word, 3) OVER dw, '') || ' ' ||
             COALESCE(LAG(word, 2) OVER dw, '') || ' ' ||
             COALESCE(LAG(word, 1) OVER dw, '') || ' ' || word AS wnd
      FROM toks
      WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)
    ),
    flags AS (
      SELECT doc_id, pos, word,
             CASE WHEN ('0x' || substr(md5(wnd), 1, 15))::BIGINT
                       % {CDC_DIV} = 0
                  THEN 1 ELSE 0 END AS b
      FROM win
    ),
    chunks AS (
      SELECT doc_id, pos, word,
             COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS chunk_id
      FROM flags
    ),
    cfp AS (
      SELECT doc_id, chunk_id,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             md5(string_agg(word, ' ' ORDER BY pos)) AS fp
      FROM chunks GROUP BY doc_id, chunk_id
    ),
    shared AS (
      SELECT fp FROM cfp GROUP BY fp
      HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(c.n_words) AS BIGINT) AS n_words,
           CAST(COUNT(s.fp) AS BIGINT) AS n_shared_chunks,
           CAST(COALESCE(SUM(CASE WHEN s.fp IS NOT NULL
                                  THEN c.n_words END), 0) AS BIGINT)
             AS shared_words
    FROM cfp c LEFT JOIN shared s ON s.fp = c.fp
    GROUP BY c.doc_id
    """,
)
def q_dedup_cdc_chunks(spark, sf_dir):
    """CONTENT-DEFINED CHUNKING dedup: per document the chunk count,
    total words, and how many chunks (and words) are SHARED with at
    least one other document — the LBFS/FastCDC storage-dedup shape
    applied to corpus text, and the granularity that catches the
    planted duplicated passages whole-doc hashing misses without
    paying the suffix-array machinery. See the section comment for the
    boundary rule and why the clamp-free local-window variant is the
    parallel one.

    Plan shape: one posexplode, one PER-DOCUMENT window pass (LAG x3 +
    a prefix-sum of boundary flags — both partitioned by doc_id, never
    corpus-wide), one groupBy (doc, chunk) to fingerprint chunks
    (md5 of the position-ordered words), a chunk-fingerprint self-
    aggregation for the shared set (map-side combinable), and a
    broadcast-able left join back. Everything is exact integer /
    md5-string arithmetic — the boundary fingerprint is the
    established engine-identical md5-derived BIGINT — so the oracle
    replays it cell-for-cell. At 100 TB every stage is
    partition-parallel; the shared-fingerprint relation is the only
    shuffle wider than a document."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "word")
    dw = W.partitionBy("doc_id").orderBy("pos")
    wnd = F.concat_ws(
        " ",
        F.coalesce(F.lag("word", 3).over(dw), F.lit("")),
        F.coalesce(F.lag("word", 2).over(dw), F.lit("")),
        F.coalesce(F.lag("word", 1).over(dw), F.lit("")),
        F.col("word"),
    )
    fp_int = F.conv(F.substring(F.md5(wnd), 1, 15), 16, 10).cast("long")
    flags = toks.withColumn(
        "b", F.when(fp_int % CDC_DIV == 0, F.lit(1)).otherwise(F.lit(0))
    )
    chunked = flags.withColumn(
        "chunk_id",
        F.coalesce(
            F.sum("b").over(dw.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    cfp = (
        chunked.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.expr(
                        "transform(array_sort(collect_list(struct(pos, word))),"
                        " s -> s.word)"
                    ),
                )
            ).alias("fp"),
        )
        .localCheckpoint(eager=True)
    )
    shared = (
        cfp.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("fp")
    )
    return (
        cfp.join(F.broadcast(shared.withColumn("s", F.lit(1))), "fp", "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.count("s").cast("long").alias("n_shared_chunks"),
            F.coalesce(
                F.sum(F.when(F.col("s").isNotNull(), F.col("n_words"))),
                F.lit(0),
            )
            .cast("long")
            .alias("shared_words"),
        )
    )


# --- density-based clustering (DBSCAN over the embedding LSH graph) ----------
#
# DBSCAN (Ester, Kriegel, Sander & Xu 1996) at 100 TB scale: the
# eps-neighborhood relation comes from the SAME banded sign-LSH
# candidate generator the embedding-dedup family uses (approximate
# DBSCAN — the standard production trade; cross-all-band misses are
# the documented recall envelope, and the oracle replays the identical
# index so the gate is exact), core points are an integer degree
# threshold, clusters are connected components of the core-core
# subgraph (min-label), and border points adopt the SMALLEST adjacent
# core's cluster — the deterministic resolution of classic DBSCAN's
# arrival-order ambiguity. Because the driver fixture is isotropic
# (all-noise by construction), the corpus is augmented with planted
# duplicate groups (every {DBS_PLANT_MOD}th vector re-inserted
# {DBS_COPIES}x at shifted ids) so the gate exercises real core/
# border/noise structure — the q_dedup_exact synthetic-dupe trick in
# embedding space.

DBS_EPS = 0.8       # neighbor iff cosine >= 0.8 (distance 1-cos <= 0.2)
DBS_MINPTS = 4      # core iff >= 4 eps-neighbors (self excluded)
DBS_PLANT_MOD = 10  # every 10th vector gets a planted duplicate group
DBS_COPIES = 4      # copies per planted site -> groups of 5

_DBS_AUG_DUCK = f"""
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + u.k * 1000000 AS vec_id, embedding
      FROM embeddings, UNNEST(range(1, {DBS_COPIES + 1})) AS u(k)
      WHERE vec_id % {DBS_PLANT_MOD} = 0
"""


def _dbs_corpus(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = (
        emb.filter(F.col("vec_id") % DBS_PLANT_MOD == 0)
        .select(
            "vec_id",
            "embedding",
            F.explode(
                F.sequence(F.lit(1), F.lit(DBS_COPIES))
            ).alias("k"),
        )
        .select(
            (F.col("vec_id") + F.col("k") * 1000000).alias("vec_id"),
            "embedding",
        )
    )
    return emb.unionByName(copies)


def _dbscan_oracle() -> str:
    return f"""
    WITH RECURSIVE augv AS ({_DBS_AUG_DUCK}),
    {_emb_lsh_cte("augv")},
    nbr0 AS (
      SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
      WHERE LIST_DOT_PRODUCT(a.e, b.e) / (a.nrm * b.nrm) >= {DBS_EPS}
    ),
    nbr AS (
      SELECT va AS src, vb AS dst FROM nbr0
      UNION ALL
      SELECT vb AS src, va AS dst FROM nbr0
    ),
    deg AS (
      SELECT v.vec_id, CAST(COALESCE(d.n, 0) AS BIGINT) AS n_neighbors
      FROM (SELECT vec_id FROM augv) v
      LEFT JOIN (SELECT src, COUNT(*) AS n FROM nbr GROUP BY src) d
        ON d.src = v.vec_id
    ),
    core AS (SELECT vec_id FROM deg WHERE n_neighbors >= {DBS_MINPTS}),
    cce AS (
      SELECT n.src, n.dst FROM nbr n
      JOIN core ca ON ca.vec_id = n.src
      JOIN core cb ON cb.vec_id = n.dst
    ),
    reach(node, lab) AS (
      SELECT vec_id, vec_id FROM core
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN cce e ON e.src = r.node
    ),
    comp AS (SELECT node AS vec_id, MIN(lab) AS cluster FROM reach GROUP BY node),
    border AS (
      SELECT n.src AS vec_id, MIN(c.cluster) AS cluster
      FROM nbr n
      JOIN comp c ON c.vec_id = n.dst
      WHERE n.src NOT IN (SELECT vec_id FROM core)
      GROUP BY n.src
    )
    SELECT d.vec_id, d.n_neighbors,
           CASE WHEN cp.vec_id IS NOT NULL THEN 'core'
                WHEN bd.vec_id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           CAST(COALESCE(cp.cluster, bd.cluster, -1) AS BIGINT) AS cluster
    FROM deg d
    LEFT JOIN comp cp ON cp.vec_id = d.vec_id
    LEFT JOIN border bd ON bd.vec_id = d.vec_id
    """


@register("q_dedup_dbscan", oracle=_dbscan_oracle())
def q_dedup_dbscan(spark, sf_dir):
    """DBSCAN density clustering over embeddings (Ester et al. 1996) —
    the clustering operator that needs NO cluster count and isolates
    noise, the shape embedding-space topic discovery and density dedup
    actually use. Composition of machinery this library already
    verifies: eps-neighbors from the banded sign-LSH candidate scorer
    (cosine >= {DBS_EPS} on the exact verify join), core points by an
    integer degree threshold (>= {DBS_MINPTS} neighbors, self
    excluded), clusters as min-label connected components of the
    CORE-CORE subgraph, border points adopting the smallest adjacent
    core's cluster (the deterministic resolution of classic DBSCAN's
    arrival-order ambiguity), everything else noise (cluster -1).

    Scale shape: the LSH candidate join bounds the neighbor relation
    (never all-pairs — approximate DBSCAN, the production trade, and
    the oracle replays the identical index so the gate is exact);
    degree is one map-side count; the component loop runs min-label
    rounds over the (sparse) core subgraph with the q_dedup CC
    convergence check. The planted duplicate groups (see the section
    comment) pin real structure: each planted site forms one size-5
    all-core cluster labeled by its smallest member, while isotropic
    originals stay noise."""
    aug = _dbs_corpus(spark, sf_dir)
    scored = _emb_lsh_scored(spark, sf_dir, emb=aug)
    nbr0 = scored.filter(F.col("cos_raw") >= DBS_EPS).select(
        "dup_a", "dup_b"
    )
    nbr = (
        nbr0.select(F.col("dup_a").alias("src"), F.col("dup_b").alias("dst"))
        .unionByName(
            nbr0.select(
                F.col("dup_b").alias("src"), F.col("dup_a").alias("dst")
            )
        )
        .localCheckpoint(eager=True)
    )
    deg = (
        aug.select("vec_id")
        .join(
            nbr.groupBy("src").agg(F.count(F.lit(1)).alias("n")),
            aug.vec_id == F.col("src"),
            "left_outer",
        )
        .select(
            "vec_id", F.coalesce("n", F.lit(0)).cast("long").alias("n_neighbors")
        )
    )
    core = deg.filter(F.col("n_neighbors") >= DBS_MINPTS).select("vec_id")
    cce = (
        nbr.join(core.withColumnRenamed("vec_id", "src"), "src")
        .join(core.withColumnRenamed("vec_id", "dst"), "dst")
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    labels = core.select(
        F.col("vec_id").alias("node"), F.col("vec_id").alias("lab")
    ).localCheckpoint(eager=True)
    for _ in range(15):
        neighbor_min = (
            labels.join(cce, labels.node == cce.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lab").alias("nlab"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left_outer")
            .select("node", F.least("lab", F.col("nlab")).alias("lab"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    comp = labels.select(
        F.col("node").alias("vec_id"), F.col("lab").alias("cluster")
    )
    border = (
        nbr.join(
            comp.select(
                F.col("vec_id").alias("dst"), F.col("cluster").alias("bcl")
            ),
            "dst",
        )
        .join(comp.select(F.col("vec_id").alias("src")), "src", "left_anti")
        .groupBy(F.col("src").alias("vec_id"))
        .agg(F.min("bcl").alias("bcl"))
    )
    return (
        deg.join(comp, "vec_id", "left_outer")
        .join(border, "vec_id", "left_outer")
        .select(
            "vec_id",
            "n_neighbors",
            F.when(F.col("cluster").isNotNull(), "core")
            .when(F.col("bcl").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
            F.coalesce("cluster", "bcl", F.lit(-1)).cast("long").alias("cluster"),
        )
    )

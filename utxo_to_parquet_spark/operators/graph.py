"""Graph analytics over the trade graph implied by the fixtures.

The reference has no graph operators (its one table is flat,
src/main.rs:199-206); these are part of the driver-mandated scale-out
surface: iterative algorithms expressed as repeated joins + aggregations
so every step is a plain shuffle Spark can schedule on 1000 executors.
Connected-components lives in dedup.py (near-dup clustering); this module
adds PageRank-style importance propagation.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import load, memo_fragment, register

DAMPING = 0.85
PR_ITERS = 3


# supplier node ids live above this offset so one LONG encodes both node
# kinds; every iterative shuffle moves 8-byte ids instead of strings, and
# the display form is rendered ONCE in the final projection. The tag bit
# sits at 2^48 — far above any realistic key width (TPC-H custkey tops
# out near SF*150k ≈ 1.5e10 ≈ 2^34 even at SF 100k); an offset near the
# key range (e.g. 2^32) would silently alias big customer ids into the
# supplier space
_SUPP_OFFSET = 1 << 48


def _render_node(col):
    """Numeric node id -> the 'c<key>' / 's<key>' display form."""
    return F.when(
        F.col(col) < _SUPP_OFFSET,
        F.concat(F.lit("c"), F.col(col).cast("string")),
    ).otherwise(
        F.concat(F.lit("s"), (F.col(col) - _SUPP_OFFSET).cast("string"))
    )


def _trade_pairs_cs(spark, sf_dir):
    """Distinct (custkey, suppkey) trading pairs — the base relation
    every trade-graph operator derives its edges from. Memoized per
    session+corpus (round 14, guide §2.4): ten registered graph queries
    re-derived this identical join+distinct from parquet on every call;
    now the first consumer materializes it once and the rest reuse the
    checkpointed partitions — exactly the edge table a production graph
    pipeline persists."""
    return memo_fragment(
        spark,
        "trade_pairs_cs",
        sf_dir,
        lambda: (
            load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_suppkey")
            .join(
                load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select(
                F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
            )
            .distinct()
        ),
    )


def _copurchase_cp(spark, sf_dir):
    """Distinct (custkey, partkey) co-purchase pairs — the bipartite
    base relation of the link-prediction operators (Adamic-Adar,
    neighbor-Jaccard). Memoized like _trade_pairs_cs: both consumers
    re-derived the identical join+distinct per call."""
    return memo_fragment(
        spark,
        "copurchase_cp",
        sf_dir,
        lambda: (
            load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .join(
                load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select(
                F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
            )
            .distinct()
        ),
    )


def _trade_edges(spark, sf_dir):
    """Undirected customer<->supplier edge list: one edge per distinct
    (customer, supplier) trading pair, materialized in both directions so
    the random walk is symmetric. Node ids are LONGS (suppliers offset by
    _SUPP_OFFSET) — iterative graph state shuffles narrow fixed-width
    rows; strings appear only in each query's final projection.
    Memoized (see _trade_pairs_cs): the mirrored long-id edge list is
    consumed by nine iterative operators, each of which previously
    re-ran the explode per consumer subtree."""
    # both directions from ONE pass over pairs: a union of two selects
    # would give the join+distinct subtree two consumers and Spark would
    # execute it twice (it is not cached); explode emits the mirrored
    # edge map-side for half the cost
    return memo_fragment(
        spark,
        "trade_edges",
        sf_dir,
        lambda: _trade_pairs_cs(spark, sf_dir)
        .select(
            F.col("c"), (F.col("s") + _SUPP_OFFSET).alias("s")
        )
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                    F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst"),
    )


def _pagerank_oracle() -> str:
    """Unrolled power iteration — one CTE level per Spark loop pass."""
    base = """
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                      's' || CAST(l_suppkey AS VARCHAR) AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
    r0 AS (SELECT deg.src AS node, 1.0 / n AS rank FROM deg, nn)
    """
    for k in range(PR_ITERS):
        base += f""",
    r{k + 1} AS (
      SELECT e.dst AS node,
             (1 - {DAMPING}) / MAX(nn.n) + {DAMPING} * SUM(r.rank / d.outdeg)
               AS rank
      FROM edges e
      JOIN r{k} r ON e.src = r.node
      JOIN deg d ON e.src = d.src, nn
      GROUP BY e.dst
    )"""
    base += f"""
    SELECT node, ROUND(rank, 8) AS rank FROM r{PR_ITERS}
    """
    return base


@register("q_graph_pagerank", oracle=_pagerank_oracle())
def q_graph_pagerank(spark, sf_dir):
    """PageRank ({PR_ITERS} power iterations, damping {DAMPING}) over the
    customer<->supplier trade graph. Each iteration is one join
    (rank onto edge source) + one aggregation (sum contributions per
    destination) — the scalable shape: no driver-side adjacency, state is
    a (node, rank) DataFrame repartitioned by node. The edge list with
    its out-degrees is computed once and reused across iterations;
    localCheckpoint after each pass keeps the lineage flat so iteration
    N's plan doesn't re-derive iterations 1..N-1. The oracle unrolls the
    same recurrence as chained CTEs."""
    edges = _trade_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    withdeg = edges.join(deg, "src").localCheckpoint(eager=False)
    n = withdeg.select("src").distinct().count()
    ranks = (
        withdeg.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.lit(1.0 / n).alias("rank"))
    )
    for _ in range(PR_ITERS):
        ranks = (
            withdeg.join(ranks, withdeg.src == ranks.node)
            .groupBy("dst")
            .agg(
                (
                    F.lit((1 - DAMPING) / n)
                    + DAMPING * F.sum(F.col("rank") / F.col("outdeg"))
                ).alias("rank")
            )
            .select(F.col("dst").alias("node"), "rank")
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        _render_node("node").alias("node"), F.round("rank", 8).alias("rank")
    )


BFS_HOPS = 3


def _bfs_oracle() -> str:
    """Unrolled BFS — one CTE level per Spark frontier expansion."""
    base = """
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                      's' || CAST(l_suppkey AS VARCHAR) AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    d0 AS (
      SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS node,
             CAST(0 AS BIGINT) AS dist
      FROM customer WHERE c_nationkey = 0
    )
    """
    for k in range(BFS_HOPS):
        base += f""",
    d{k + 1} AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d{k}
        UNION ALL
        SELECT e.dst AS node, d.dist + 1 AS dist
        FROM edges e JOIN d{k} d ON e.src = d.node
      ) GROUP BY node
    )"""
    base += f"""
    SELECT node, CAST(dist AS BIGINT) AS dist FROM d{BFS_HOPS}
    """
    return base


@register("q_graph_bfs", oracle=_bfs_oracle())
def q_graph_bfs(spark, sf_dir):
    """Multi-source BFS: minimum hop distance from every nation-0
    customer to each reachable node of the trade graph, {BFS_HOPS} hops.

    Frontier-delta (level-synchronous) form: each pass joins the edge
    list against ONLY the nodes discovered in the previous pass, then
    anti-joins the expansion against the settled distance table to find
    genuinely new nodes. With unit edge weights every candidate at pass
    k has distance exactly k, and anything already settled was reached
    at < k — so no min-aggregation over the full table is ever needed,
    and the per-pass shuffle is O(frontier expansion), not O(reachable
    set). This is the shape that survives 100x: on a high-diameter
    graph the dense form re-shuffles the entire reachable set every
    hop (the round-5 bottleneck, 2.8 s), while the delta form's work
    tracks the BFS wavefront. An empty frontier short-circuits the
    remaining passes (the oracle's extra CTE levels are no-ops then
    too, so results stay byte-identical)."""
    edges = _trade_edges(spark, sf_dir)  # memoized + checkpointed
    cust = load(spark, sf_dir, "customer")
    frontier = (
        cust.filter(F.col("c_nationkey") == 0)
        .select(F.col("c_custkey").cast("long").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=False)
    )
    dist = frontier
    for k in range(1, BFS_HOPS + 1):
        frontier = _bfs_frontier_step(edges, frontier, dist, k).localCheckpoint(
            eager=False
        )
        if frontier.isEmpty():
            break
        dist = dist.unionByName(frontier)
    return dist.select(_render_node("node").alias("node"), "dist")


def _bfs_frontier_step(edges, frontier, dist, k: int):
    """One frontier expansion: nodes first reached at distance k.

    Separated out so the plan-level test can gate the shape of the real
    per-hop job (test_bfs_expands_frontier_not_settled_set): the
    expansion joins ONLY the frontier, and new nodes come from a
    LeftAnti against the settled set — no min-aggregation over the full
    distance table anywhere. distinct() hash-partitions `reached` on
    node; the anti-join reuses that exchange, so the only full-table
    shuffle per pass is the settled side of the anti-join."""
    reached = (
        edges.join(frontier.select("node"), edges.src == F.col("node"))
        .select(F.col("dst").alias("node"))
        .distinct()
    )
    return reached.join(dist.select("node"), "node", "left_anti").withColumn(
        "dist", F.lit(k).cast("long")
    )


# ---------------------------------------------------------------------------
# Triangle counting over the MinHash near-dup pair graph (dedup.py):
# triangles reveal transitive dup clusters that pairwise counts hide.


def _triangle_oracle() -> str:
    from .dedup import _minhash_bands_cte

    return f"""
    WITH {_minhash_bands_cte()},
    pairs AS (
      SELECT a.doc_id AS pa, b.doc_id AS pb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    deg AS (
      SELECT node, COUNT(*) AS d
      FROM (SELECT pa AS node FROM pairs UNION ALL SELECT pb FROM pairs)
      GROUP BY 1
    ),
    ori AS (
      SELECT CASE WHEN (da.d, p.pa) < (db.d, p.pb) THEN p.pa ELSE p.pb END AS u,
             CASE WHEN (da.d, p.pa) < (db.d, p.pb) THEN p.pb ELSE p.pa END AS v
      FROM pairs p
        JOIN deg da ON da.node = p.pa
        JOIN deg db ON db.node = p.pb
    ),
    ov AS (SELECT u, v, d AS dv FROM ori JOIN deg ON deg.node = ori.v),
    tri AS (
      SELECT w1.u AS x, w1.v AS y, w2.v AS z
      FROM ov w1
        JOIN ov w2 ON w1.u = w2.u AND (w1.dv, w1.v) < (w2.dv, w2.v)
        JOIN ori e ON e.u = w1.v AND e.v = w2.v
    )
    SELECT node AS doc_id, COUNT(*) AS n_triangles
    FROM (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    GROUP BY 1
    """


def _dup_tri_deg(spark, sf_dir):
    """Shared compact-forward triangle machinery over the MinHash
    near-dup pair graph: returns ``(tri, deg)`` where ``tri`` is the
    per-node triangle count (doc_id, n_triangles — only nodes in >=1
    triangle appear) and ``deg`` is the raw degree table (node, d).
    Factored so q_graph_triangles and q_graph_clustering_coeff run ONE
    band-join pipeline each instead of duplicating the algorithm."""
    from .dedup import _minhash_pairs

    # checkpoint the expensive band-join subtree: deg, the orientation
    # join, and the wedge-closing join all consume it — without this the
    # shingle+band+pair pipeline re-executes wherever ReusedExchange
    # fails to unify the divergent subplans (same convention as
    # _trade_edges/BFS above)
    pairs = _minhash_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("pa"), F.col("doc_b").alias("pb")
    )  # memoized + checkpointed upstream
    deg = (
        pairs.select(F.explode(F.array("pa", "pb")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("pa"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("pb"), F.col("d").alias("db"))
    lower = F.struct("da", "pa") < F.struct("db", "pb")
    ori = (
        pairs.join(da, "pa")
        .join(db, "pb")
        .select(
            F.when(lower, F.col("pa")).otherwise(F.col("pb")).alias("u"),
            F.when(lower, F.col("pb")).otherwise(F.col("pa")).alias("v"),
        )
        .localCheckpoint(eager=False)  # 3 consumers: wedge ends + closing
    )
    ov = ori.join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    w1 = ov.select(F.col("u"), F.col("v").alias("y"), F.col("dv").alias("dy"))
    w2 = ov.select(F.col("u"), F.col("v").alias("z"), F.col("dv").alias("dz"))
    wedges = w1.join(w2, "u").filter(
        F.struct("dy", "y") < F.struct("dz", "z")
    )
    closing = ori.select(F.col("u").alias("y"), F.col("v").alias("z"))
    tri = wedges.join(closing, ["y", "z"]).select("u", "y", "z")
    counts = (
        tri.select(F.explode(F.array("u", "y", "z")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return counts, deg


@register("q_graph_triangles", oracle=_triangle_oracle())
def q_graph_triangles(spark, sf_dir):
    """Per-document triangle participation in the near-dup candidate
    graph (edges = q_dedup_minhash_lsh pairs) — the degree-ordered
    compact-forward algorithm: orient every edge from its
    lower-(degree, id) endpoint to the higher one, enumerate wedges by
    joining oriented edges on their source, and close each wedge with
    one more equi-join. Orientation bounds each node's out-degree by
    O(sqrt(E)) on any graph, so wedge fan-out — the quadratic term a
    skewed hub would otherwise explode — is capped regardless of raw
    degree skew; every step is an equi-join + aggregation, no
    cross-product anywhere. Each triangle is counted exactly once by
    construction, then unpivoted to its three corners."""
    tri, _deg = _dup_tri_deg(spark, sf_dir)
    return tri


# Local clustering coefficient 2*tri/(d*(d-1)) in e6 fixed point via
# FLOOR division — both operands are positive BIGINTs, where DuckDB's
# ``//`` (floor) and Spark's ``div`` (truncate) agree exactly.
_CLUSTERING_ORACLE = """
    WITH {bands},
    pairs AS (
      SELECT a.doc_id AS pa, b.doc_id AS pb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    deg AS (
      SELECT node, COUNT(*) AS d
      FROM (SELECT pa AS node FROM pairs UNION ALL SELECT pb FROM pairs)
      GROUP BY 1
    ),
    ori AS (
      SELECT CASE WHEN (da.d, p.pa) < (db.d, p.pb) THEN p.pa ELSE p.pb END AS u,
             CASE WHEN (da.d, p.pa) < (db.d, p.pb) THEN p.pb ELSE p.pa END AS v
      FROM pairs p
        JOIN deg da ON da.node = p.pa
        JOIN deg db ON db.node = p.pb
    ),
    ov AS (SELECT u, v, d AS dv FROM ori JOIN deg ON deg.node = ori.v),
    tri AS (
      SELECT w1.u AS x, w1.v AS y, w2.v AS z
      FROM ov w1
        JOIN ov w2 ON w1.u = w2.u AND (w1.dv, w1.v) < (w2.dv, w2.v)
        JOIN ori e ON e.u = w1.v AND e.v = w2.v
    ),
    tcount AS (
      SELECT node, COUNT(*) AS n_tri
      FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      )
      GROUP BY 1
    )
    SELECT deg.node AS doc_id,
           CAST(deg.d AS BIGINT) AS degree,
           CAST(COALESCE(tcount.n_tri, 0) AS BIGINT) AS n_triangles,
           CAST(2 * COALESCE(tcount.n_tri, 0) * 1000000
                // (deg.d * (deg.d - 1)) AS BIGINT) AS coeff_e6
    FROM deg LEFT JOIN tcount ON tcount.node = deg.node
    WHERE deg.d >= 2
    """


def _clustering_oracle_sql() -> str:
    from .dedup import _minhash_bands_cte

    return _CLUSTERING_ORACLE.format(bands=_minhash_bands_cte())


@register("q_graph_clustering_coeff", oracle=_clustering_oracle_sql())
def q_graph_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient over the near-dup candidate graph:
    for every node with degree >= 2, the fraction of its neighbor pairs
    that are themselves connected — 2*triangles / (d*(d-1)). High
    coefficients mark TRANSITIVE duplicate clusters (boilerplate
    families where every copy matches every other), low ones mark
    hub-and-spoke false-positive bands worth re-verifying.

    All-integer determinism: triangle counts and degrees are exact
    BIGINTs from the compact-forward enumeration (shared with
    q_graph_triangles via _dup_tri_deg — one band-join pipeline, not
    two), and the coefficient is emitted in e6 fixed point via integer
    floor division on positive operands, where Spark's truncating
    ``div`` and DuckDB's flooring ``//`` coincide — no doubles anywhere.
    At 100 TB both inputs are the already-shuffled aggregates of the
    triangle pass; this adds one broadcast-size join and a map-side
    projection."""
    tri, deg = _dup_tri_deg(spark, sf_dir)
    return (
        deg.filter(F.col("d") >= 2)
        .join(tri, deg.node == tri.doc_id, "left")
        .select(
            F.col("node").alias("doc_id"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
            F.expr(
                "CAST(2 * coalesce(n_triangles, 0) * 1000000"
                " div (d * (d - 1)) AS BIGINT)"
            ).alias("coeff_e6"),
        )
    )


# --- k-core decomposition: iterative peel to the K-core ----------------

KCORE_K = 40
# unrolled oracle depth — the trade graph converges in <=3 peels at every
# fixture sf; the Spark side iterates to an ACTUAL fixpoint and the
# idempotence of peeling makes extra unrolled rounds no-ops, so oracle
# and engine agree whenever convergence happens within KCORE_ROUNDS
KCORE_ROUNDS = 6


def _kcore_oracle() -> str:
    """Unrolled peeling — one CTE level per round; each level keeps the
    nodes whose degree WITHIN the previous level's survivor set is still
    >= K. Idempotent once converged."""
    base = """
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                      's' || CAST(l_suppkey AS VARCHAR) AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    a0 AS (SELECT DISTINCT src AS node FROM edges)
    """
    for k in range(KCORE_ROUNDS):
        base += f""",
    a{k + 1} AS (
      SELECT e.src AS node
      FROM edges e
      JOIN a{k} x ON e.src = x.node
      JOIN a{k} y ON e.dst = y.node
      GROUP BY e.src
      HAVING COUNT(*) >= {KCORE_K}
    )"""
    base += f"""
    SELECT e.src AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM edges e
    JOIN a{KCORE_ROUNDS} x ON e.src = x.node
    JOIN a{KCORE_ROUNDS} y ON e.dst = y.node
    GROUP BY e.src
    """
    return base


@register("q_graph_kcore", oracle=_kcore_oracle())
def q_graph_kcore(spark, sf_dir):
    """{KCORE_K}-core decomposition of the customer<->supplier trade
    graph: iteratively peel nodes with degree < K until a fixpoint; the
    survivors (each reported with its degree inside the core) are the
    densely-connected backbone — the community-mining primitive that
    bounds clique size and seeds dense-subgraph drills.

    Execution is the scalable alternating loop, not a driver-side graph:
    survivor state is a (node) DataFrame; each round is edges JOIN
    survivors (both endpoints) -> groupBy(src) -> HAVING count >= K,
    localCheckpoint-ed so round N's plan does not re-derive rounds
    1..N-1; the loop exits on an ACTUAL fixpoint (survivor count
    unchanged — one scalar count() per round, bounded by the O(log n)
    peel depth of real graphs). Degrees are exact integers; the output
    is deterministic because the fixpoint set is unique (k-core is
    order-independent) regardless of peel schedule. At 100 TB each round
    is one shuffle join on node id — same shape as BFS/pagerank — and
    the survivor relation only ever shrinks."""
    edges = _trade_edges(spark, sf_dir)  # memoized + checkpointed
    alive = edges.select(F.col("src").alias("node")).distinct()
    prev = -1
    n = alive.count()
    rounds = 0
    while n != prev and rounds < KCORE_ROUNDS:
        prev = n
        alive = (
            edges.join(alive.withColumnRenamed("node", "src"), "src")
            .join(alive.select(F.col("node").alias("dst")), "dst")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select(F.col("src").alias("node"))
            # lazy: the count below materializes it — one job per peel
            # round instead of two (round 14, guide §1)
            .localCheckpoint(eager=False)
        )
        n = alive.count()
        rounds += 1
    core = (
        edges.join(alive.withColumnRenamed("node", "src"), "src")
        .join(alive.select(F.col("node").alias("dst")), "dst")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )
    return core.select(
        _render_node("src").alias("node"),
        F.col("core_degree").cast("long").alias("core_degree"),
    )


# --- Degree assortativity: do hubs trade with hubs? -----------------------


@register(
    "q_graph_assortativity",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                      's' || CAST(l_suppkey AS VARCHAR) AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM edges GROUP BY src),
    xy AS (
      SELECT ds.d AS x, dd.d AS y
      FROM edges e JOIN deg ds ON e.src = ds.node
                   JOIN deg dd ON e.dst = dd.node
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM xy
    )
    SELECT n AS n_directed_edges,
           CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                      * 1e6 + 0.5) AS BIGINT) AS assortativity_e6
    FROM s
    WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
      AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <> 0
    """,
)
def q_graph_assortativity(spark, sf_dir):
    """Degree assortativity coefficient of the trade graph — Newman's
    r: the Pearson correlation of endpoint degrees over the (mirrored)
    edge list. r < 0 (disassortative) is the hub-and-spoke signature of
    trade/web graphs; a sign flip on refresh is a structural-drift alarm.

    Exactness recipe: degrees are exact BIGINT counts; the six moment
    sums over the edge list (n, Σx, Σy, Σxy, Σx², Σy²) are exact BIGINTs
    under any partial-agg merge order; r is then one identical double
    expression tree on both engines — IEEE sqrt is correctly rounded, so
    even the denominator is bit-stable. Plan: edge build (one join +
    distinct), a degree aggregate, two shuffle joins edge→degree (the
    degree table is |nodes|, broadcastable on most real graphs), one
    map-side-combinable global aggregate to a single row. Σx² bounds:
    max-degree² x |edges| must fit int64 — at 1e5 max degree that allows
    ~1e8 edges; past that the documented swap is degree-BUCKETED
    assortativity (correlate log2-bucket indices, same moment recipe)."""
    edges = _trade_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    xy = (
        edges.join(deg.withColumnRenamed("src", "node"), F.col("src") == F.col("node"))
        .select(F.col("dst"), F.col("d").alias("x"))
        .join(
            deg.select(F.col("src").alias("node2"), F.col("d").alias("y")),
            F.col("dst") == F.col("node2"),
        )
        .select("x", "y")
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = nd * F.col("sxy").cast("double") - sxd * syd
    den = F.sqrt(
        (nd * F.col("sxx").cast("double") - sxd * sxd)
        * (nd * F.col("syy").cast("double") - syd * syd)
    )
    # degree-regular graph: zero variance on either axis makes r
    # undefined — emit zero rows on both engines, never a NaN cast
    vx = nd * F.col("sxx").cast("double") - sxd * sxd
    vy = nd * F.col("syy").cast("double") - syd * syd
    return (
        s.filter((vx != 0) & (vy != 0))
        .select(
            F.col("n").alias("n_directed_edges"),
            F.floor(num / den * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("assortativity_e6"),
        )
    )


# --- Modularity of the nation partition -----------------------------------


@register(
    "q_graph_modularity",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    lab AS (
      SELECT p.ck, p.sk, c.c_nationkey AS cn, s.s_nationkey AS sn
      FROM pairs p JOIN customer c ON p.ck = c.c_custkey
                   JOIN supplier s ON p.sk = s.s_suppkey
    ),
    m AS (SELECT CAST(2 * COUNT(*) AS BIGINT) AS m FROM lab),
    within AS (
      SELECT cn AS community,
             CAST(2 * SUM(CASE WHEN cn = sn THEN 1 ELSE 0 END) AS BIGINT)
               AS a_c
      FROM lab GROUP BY cn
    ),
    degsum AS (
      SELECT community, CAST(SUM(d) AS BIGINT) AS k_c FROM (
        SELECT cn AS community, CAST(COUNT(*) AS BIGINT) AS d
          FROM lab GROUP BY cn
        UNION ALL
        SELECT sn AS community, CAST(COUNT(*) AS BIGINT) AS d
          FROM lab GROUP BY sn
      ) GROUP BY community
    )
    SELECT d.community,
           COALESCE(w.a_c, 0) AS a_c, d.k_c, m.m,
           CAST(FLOOR((CAST(COALESCE(w.a_c, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
                       - (CAST(d.k_c AS DOUBLE) / CAST(m.m AS DOUBLE))
                         * (CAST(d.k_c AS DOUBLE) / CAST(m.m AS DOUBLE)))
                      * 1e9 + 0.5) AS BIGINT) AS q_term_e9
    FROM degsum d LEFT JOIN within w ON d.community = w.community, m
    """,
)
def q_graph_modularity(spark, sf_dir):
    """Newman modularity of the nation partition of the trade graph:
    Q = Σ_c (A_c/M − (K_c/M)²) over communities c, with A_c = directed
    edges inside c, K_c = total degree in c, M = directed edge count —
    the community-quality score that tells you whether trade actually
    clusters along nation lines (Q > 0) or nations are a meaningless
    partition of it (Q ≈ 0). Emitted per community so the interesting
    communities are attributable; the scalar Q is the exact sum of
    q_term_e9 / 1e9.

    The customer↔supplier graph is bipartite, so within-community
    directed edges are exactly 2x the distinct trading pairs whose two
    endpoints share a nation. A_c/K_c/M are exact BIGINT counts (three
    map-side-combinable aggregates over the labeled pair list); each
    community's term is one identical double expression tree fixed-
    pointed to e9, so the final scalar is order-free. Plan: the
    pair-dedup shuffle, two dimension equi-joins (left to AQE:
    customer grows with scale factor and must be free to shuffle;
    broadcast kicks in automatically when a side fits), tiny
    nation-keyed rollups."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    pairs = _trade_pairs_cs(spark, sf_dir).select(
        F.col("c").alias("ck"), F.col("s").alias("sk")
    )
    # no forced broadcast on customer: the customer DIMENSION grows with
    # scale factor (1.5M/SF — tens of billions at 100 TB) and must be
    # free to shuffle; AQE picks broadcast when it actually fits. The
    # supplier side is 10x smaller but follows the same rule.
    lab = (
        pairs.join(cust, pairs.ck == cust.c_custkey)
        .join(supp, pairs.sk == supp.s_suppkey)
        .select(F.col("c_nationkey").alias("cn"), F.col("s_nationkey").alias("sn"))
    )
    m = lab.agg((2 * F.count(F.lit(1))).alias("m"))
    within = lab.groupBy(F.col("cn").alias("community")).agg(
        (2 * F.sum(F.when(F.col("cn") == F.col("sn"), 1).otherwise(0))).alias("a_c")
    )
    degsum = (
        lab.groupBy(F.col("cn").alias("community"))
        .agg(F.count(F.lit(1)).alias("d"))
        .unionAll(
            lab.groupBy(F.col("sn").alias("community")).agg(
                F.count(F.lit(1)).alias("d")
            )
        )
        .groupBy("community")
        .agg(F.sum("d").alias("k_c"))
    )
    j = (
        degsum.join(within, "community", "left")
        .withColumn("a_c", F.coalesce(F.col("a_c"), F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(m))
    )
    md = F.col("m").cast("double")
    kd = F.col("k_c").cast("double")
    term = F.col("a_c").cast("double") / md - (kd / md) * (kd / md)
    return j.select(
        "community",
        "a_c",
        "k_c",
        "m",
        F.floor(term * 1e9 + F.lit(0.5)).cast("long").alias("q_term_e9"),
    )


# --- Adamic-Adar link prediction over the customer-part purchase graph ---

AA_DEG_CAP = 64  # hub prune: parts bought by more customers contribute
# 1/ln(d) ~ nothing to any pair score but d^2/2 candidate pairs to the
# shuffle — dropping them is both the textbook Adamic-Adar practice and
# the skew cap that keeps the self-join linear at 100 TB (same role as
# containment's DF_CAP). Fixture part degrees sit at ~30 across every sf
# (generator holds |lineitem|/|part| constant), so the cap is inactive
# on test data and purely a skew guard.
AA_TOP_K = 20


@register(
    "q_graph_adamic_adar",
    oracle=f"""
    WITH cn AS (
      SELECT o_custkey AS c, l_partkey AS p
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    pdeg AS (SELECT p, COUNT(*) AS d FROM cn GROUP BY 1),
    keep AS (
      SELECT cn.c, cn.p, pdeg.d
      FROM cn JOIN pdeg ON pdeg.p = cn.p
      WHERE pdeg.d BETWEEN 2 AND {AA_DEG_CAP}
    ),
    pairs AS (
      SELECT a.c AS cust_a, b.c AS cust_b,
             CAST(FLOOR(1e6 / LN(CAST(a.d AS DOUBLE)) + 0.5) AS BIGINT)
               AS term_e6
      FROM keep a JOIN keep b ON a.p = b.p AND a.c < b.c
    )
    SELECT cust_a, cust_b,
           CAST(COUNT(*) AS BIGINT) AS n_common,
           CAST(SUM(term_e6) AS BIGINT) AS aa_e6
    FROM pairs GROUP BY 1, 2
    ORDER BY aa_e6 DESC, cust_a, cust_b
    LIMIT {AA_TOP_K}
    """,
)
def q_graph_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction over the customer-part purchase
    graph: score a customer pair by the parts they BOTH buy, each
    shared part weighted 1/ln(popularity) so a part bought by three
    customers says far more than one bought by sixty. The top-K
    highest-scoring non-edges are the "customers most likely to share
    future behavior" — the canonical common-neighbor recommender.

    Scale shape: the neighbor self-join runs on the DEDUPLICATED
    (customer, part) relation, joined per part — and parts above
    AA_DEG_CAP are pruned FIRST, so a viral hub can never explode the
    pair fan-out (d^2 pairs for ~0 score each); everything downstream
    is a map-side-combinable sum. The per-part 1/ln(d) term is snapped
    to e6 fixed point BEFORE summation on both engines (identical
    expression over exact BIGINT degrees; pairs only arise at d >= 2 so
    ln > 0), making the BIGINT pair score summation-order-proof; the
    top-K order (score desc, pair ids) is a total order, so LIMIT is
    deterministic. TakeOrderedAndProject keeps the global top-K a
    per-partition heap + driver merge, never a full sort."""
    # Round 15 (guide §2.4): the former keep⋈keep self-join shuffled the
    # banded relation twice and generated d^2 rows per part only to
    # filter half away. One groupBy now collects each part's (bounded:
    # d <= AA_DEG_CAP) sorted customer list and the d(d-1)/2 ordered
    # pairs are generated MAP-SIDE by a higher-order transform — one
    # shuffle of the banded relation instead of a two-sided join, and
    # cust_a < cust_b holds by construction on the sorted list.
    cn = _copurchase_cp(spark, sf_dir)
    pdeg = cn.groupBy("p").agg(F.count(F.lit(1)).alias("d"))
    grp = (
        cn.join(pdeg.filter((F.col("d") >= 2) & (F.col("d") <= AA_DEG_CAP)), "p")
        .groupBy("p", "d")
        .agg(F.array_sort(F.collect_list("c")).alias("cs"))
    )
    pairs = grp.select(
        "d",
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, size(cs) - 2),"
                " i -> transform(slice(cs, i + 2, size(cs) - i - 1),"
                " x -> struct(cs[i] AS a, x AS b))))"
            )
        ).alias("pr"),
    )
    term = F.floor(
        F.lit(1e6) / F.log(F.col("d").cast("double")) + F.lit(0.5)
    ).cast("long")
    return (
        pairs.select(
            F.col("pr.a").alias("cust_a"),
            F.col("pr.b").alias("cust_b"),
            term.alias("term_e6"),
        )
        .groupBy("cust_a", "cust_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("term_e6").cast("long").alias("aa_e6"),
        )
        .orderBy(F.col("aa_e6").desc(), "cust_a", "cust_b")
        .limit(AA_TOP_K)
    )


# --- Synchronous label propagation communities (fixed-round) -------------

LP_ROUNDS = 3


def _label_prop_oracle() -> str:
    """Unrolled synchronous label propagation — one CTE level per Spark
    pass; the argmax tie-break (count DESC, label ASC) is a total order
    on BIGINT labels, so every level is deterministic on both engines."""
    off = _SUPP_OFFSET
    base = f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey + {off} AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)
    """
    for k in range(LP_ROUNDS):
        base += f""",
    l{k + 1} AS (
      SELECT node, label FROM (
        SELECT e.src AS node, l.label,
               ROW_NUMBER() OVER (PARTITION BY e.src
                 ORDER BY COUNT(*) DESC, l.label) AS rn
        FROM edges e JOIN l{k} l ON e.dst = l.node
        GROUP BY e.src, l.label
      ) WHERE rn = 1
    )"""
    base += f"""
    SELECT CASE WHEN node < {off} THEN 'c' || CAST(node AS VARCHAR)
                ELSE 's' || CAST(node - {off} AS VARCHAR) END AS node,
           CASE WHEN label < {off} THEN 'c' || CAST(label AS VARCHAR)
                ELSE 's' || CAST(label - {off} AS VARCHAR) END AS community
    FROM l{LP_ROUNDS}
    """
    return base


@register("q_graph_label_propagation", oracle=_label_prop_oracle())
def q_graph_label_propagation(spark, sf_dir):
    """Community detection by synchronous label propagation over the
    trade graph, LP_ROUNDS fixed passes: every node adopts the most
    frequent label among its NEIGHBORS, ties broken toward the smallest
    label — the deterministic variant of classic LPA (random tie-breaks
    would make the result engine-dependent; a fixed total order makes
    every round a pure function of the previous one, which is also what
    lets the oracle unroll the identical recurrence as chained CTEs).

    Scale shape identical to PageRank above: per round ONE equi-join of
    the edge list against the (node, label) state plus one count-argmax
    aggregation — label state is a narrow LONG pair DataFrame, shuffles
    are by node id, and localCheckpoint keeps round N's plan from
    re-deriving rounds 1..N-1. Fixed round count (not convergence
    polling) keeps the job DAG static, the cluster-friendly choice for
    a 1000-executor schedule."""
    edges = _trade_edges(spark, sf_dir)  # memoized + checkpointed
    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("label"))
    )
    for _ in range(LP_ROUNDS):
        nb = edges.join(labels, edges.dst == labels.node).select(
            F.col("src").alias("n2"), "label"
        )
        cnt = nb.groupBy("n2", "label").agg(F.count(F.lit(1)).alias("c"))
        # argmax by (count DESC, label ASC) as a partial-aggregable
        # struct-max — max(struct(c, -label)) picks the highest count
        # and, on ties, the SMALLEST label (bigger negated id wins).
        # Map-side combinable, where the row_number window form needs a
        # full sort per round.
        labels = (
            cnt.groupBy("n2")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("label")).alias("nl"))
                ).alias("b")
            )
            .select(
                F.col("n2").alias("node"), (-F.col("b.nl")).alias("label")
            )
            .localCheckpoint(eager=False)
        )
    return labels.select(
        _render_node("node").alias("node"),
        F.when(
            F.col("label") < _SUPP_OFFSET,
            F.concat(F.lit("c"), F.col("label").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("s"), (F.col("label") - _SUPP_OFFSET).cast("string"))
        )
        .alias("community"),
    )


# --- HITS hubs & authorities (fixed-iteration, fixed-point) ---------------

HITS_ITERS = 3


def _hits_oracle() -> str:
    """Unrolled HITS power iteration, one CTE pair per Spark pass.

    Every mutual-recursion step is kept engine-identical: scores live as
    e9 fixed-point BIGINTs (integer sums are summation-order-proof), and
    the max-normalization per step is ONE double division of two exact
    integers followed by floor(x*1e9+0.5) — the same correctly-rounded
    expression tree on both engines."""
    base = """
    WITH edges AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    h0 AS (SELECT DISTINCT c, CAST(1000000000 AS BIGINT) AS h FROM edges)
    """
    for k in range(HITS_ITERS):
        base += f""",
    araw{k} AS (
      SELECT e.s, SUM(h.h) AS a FROM edges e JOIN h{k} h ON e.c = h.c
      GROUP BY e.s
    ),
    a{k + 1} AS (
      SELECT s, CAST(FLOOR(CAST(a AS DOUBLE)
                 / (SELECT MAX(a) FROM araw{k}) * 1e9 + 0.5) AS BIGINT) AS a
      FROM araw{k}
    ),
    hraw{k} AS (
      SELECT e.c, SUM(a.a) AS h FROM edges e JOIN a{k + 1} a ON e.s = a.s
      GROUP BY e.c
    ),
    h{k + 1} AS (
      SELECT c, CAST(FLOOR(CAST(h AS DOUBLE)
                 / (SELECT MAX(h) FROM hraw{k}) * 1e9 + 0.5) AS BIGINT) AS h
      FROM hraw{k}
    )"""
    base += f"""
    SELECT 'c' || CAST(h.c AS VARCHAR) AS node, h.h AS hub_e9,
           CAST(NULL AS BIGINT) AS auth_e9
    FROM h{HITS_ITERS} h
    UNION ALL
    SELECT 's' || CAST(a.s AS VARCHAR) AS node, CAST(NULL AS BIGINT) AS hub_e9,
           a.a AS auth_e9
    FROM a{HITS_ITERS} a
    """
    return base


@register("q_graph_hits", oracle=_hits_oracle())
def q_graph_hits(spark, sf_dir):
    """HITS (Kleinberg) hubs-and-authorities over the bipartite
    customer->supplier trade graph: customers are hubs (they point at
    the suppliers they buy from), suppliers are authorities. Each of the
    {HITS_ITERS} mutual-recursion steps is one equi-join plus one
    map-side-combinable integer sum — the identical scalable shape as
    q_graph_pagerank, with per-step lineage cut so iteration N's plan
    does not re-derive 1..N-1.

    Determinism: scores are e9 fixed-point BIGINTs throughout, so the
    per-step sums are integer additions (order-proof across partial
    aggregation on any partitioning); the per-step max-normalization
    divides two exact integers once in double precision (correctly
    rounded, engine-identical) and snaps straight back to e9. The
    reference has no graph surface (src/main.rs:199-206 is one flat
    table); this belongs to the mandated analytics extension."""
    edges = (
        _trade_pairs_cs(spark, sf_dir)  # memoized + checkpointed
    )
    hubs = edges.select("c").distinct().select("c", F.lit(10**9).alias("h"))

    def _renorm(df, key, col):
        # 1-row max attach (broadcast NLJ) instead of a driver collect:
        # no driver round-trip per half-iteration (collect barriers
        # measured 5.4 s on the sf0.1 bench, this form 4.4 s — the
        # floor is the six broadcast stages the recursion genuinely
        # needs). CAST of the exact BIGINT max to double is the same
        # correctly-rounded conversion DuckDB's scalar subquery does.
        m = df.agg(F.max(col).alias("m"))
        return df.crossJoin(F.broadcast(m)).select(
            key,
            F.floor(
                F.col(col).cast("double") / F.col("m").cast("double")
                * F.lit(1e9) + F.lit(0.5)
            ).cast("long").alias(col),
        )

    auths = None
    for _ in range(HITS_ITERS):
        araw = (
            edges.join(hubs, "c").groupBy("s").agg(F.sum("h").alias("a"))
        )
        # checkpoint the RAW sums, not the renormed output: _renorm
        # consumes its input twice (max aggregate + projection), so the
        # uncheckpointed form recomputes every join+agg subtree per
        # consumer (measured 6.3 s vs 4.4 s at sf0.1). EAGER (round 14):
        # with two consumers and no action until the final collect, a
        # lazy checkpoint lets concurrent stages race the uncached
        # partitions and double-compute the chain (see
        # q_graph_wl_refinement) — eager pins exactly-once compute.
        auths = _renorm(araw.localCheckpoint(eager=True), "s", "a")
        hraw = (
            edges.join(auths, "s").groupBy("c").agg(F.sum("a").alias("h"))
        )
        hubs = _renorm(hraw.localCheckpoint(eager=True), "c", "h")
    nulll = F.lit(None).cast("long")
    return (
        hubs.select(
            F.concat(F.lit("c"), F.col("c").cast("string")).alias("node"),
            F.col("h").alias("hub_e9"),
            nulll.alias("auth_e9"),
        )
        .unionAll(
            auths.select(
                F.concat(F.lit("s"), F.col("s").cast("string")).alias("node"),
                nulll.alias("hub_e9"),
                F.col("a").alias("auth_e9"),
            )
        )
    )


# --- Neighbor-set Jaccard link prediction ---------------------------------

NJ_DEG_CAP = 40  # same banding rationale as AA_DEG_CAP
NJ_TOP_K = 25


@register(
    "q_graph_jaccard_neighbors",
    oracle=f"""
    WITH cn AS (
      SELECT o_custkey AS c, l_partkey AS p
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    cdeg AS (SELECT c, COUNT(*) AS deg FROM cn GROUP BY 1),
    pdeg AS (SELECT p, COUNT(*) AS d FROM cn GROUP BY 1),
    keep AS (
      SELECT cn.c, cn.p FROM cn JOIN pdeg ON pdeg.p = cn.p
      WHERE pdeg.d BETWEEN 2 AND {NJ_DEG_CAP}
    ),
    inter AS (
      SELECT a.c AS cust_a, b.c AS cust_b, COUNT(*) AS n_inter
      FROM keep a JOIN keep b ON a.p = b.p AND a.c < b.c
      GROUP BY 1, 2
    )
    SELECT cust_a, cust_b, CAST(n_inter AS BIGINT) AS n_inter,
           CAST(da.deg + db.deg - n_inter AS BIGINT) AS n_union,
           CAST(FLOOR(CAST(n_inter AS DOUBLE)
                / (da.deg + db.deg - n_inter) * 1e6 + 0.5) AS BIGINT)
             AS jaccard_e6
    FROM inter
    JOIN cdeg da ON da.c = cust_a
    JOIN cdeg db ON db.c = cust_b
    ORDER BY jaccard_e6 DESC, cust_a, cust_b
    LIMIT {NJ_TOP_K}
    """,
)
def q_graph_jaccard_neighbors(spark, sf_dir):
    """Neighbor-set Jaccard link prediction — the set-overlap
    complement of q_graph_adamic_adar: score a customer pair by
    |parts(a) AND parts(b)| / |parts(a) OR parts(b)|. The union size
    comes from the inclusion-exclusion identity deg(a)+deg(b)-inter, so
    the pair set is computed ONCE (the same hub-capped co-neighbor
    equi-join as Adamic-Adar: parts above NJ_DEG_CAP are pruned before
    the self-join, bounding the fan-out at cap*|keep| pairs) and the
    full degrees ride in on two broadcast-size dimension joins.

    Determinism: intersection and union are exact BIGINTs; the score is
    one correctly-rounded double division snapped to e6; (score desc,
    pair ids) totally orders the top-K. TakeOrderedAndProject keeps the
    global top-K heap-based — no full sort at any scale. The IMPORTANT
    semantic subtlety vs Adamic-Adar: degrees in the union term are the
    UNCAPPED true degrees (the cap only prunes which pairs are
    *generated*), so scores are exact for every surviving pair."""
    # Round 15 (guide §2.4): same map-side pair generation as
    # q_graph_adamic_adar — one groupBy collects each part's (bounded:
    # d <= NJ_DEG_CAP) sorted customer list, pairs explode map-side,
    # replacing the two-sided self-join and its d^2/2 discarded rows.
    cn = _copurchase_cp(spark, sf_dir)  # memoized + checkpointed
    cdeg = cn.groupBy("c").agg(F.count(F.lit(1)).alias("deg"))
    pdeg = cn.groupBy("p").agg(F.count(F.lit(1)).alias("d"))
    grp = (
        cn.join(
            pdeg.filter((F.col("d") >= 2) & (F.col("d") <= NJ_DEG_CAP)).select("p"),
            "p",
        )
        .groupBy("p")
        .agg(F.array_sort(F.collect_list("c")).alias("cs"))
    )
    inter = (
        grp.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(cs) - 2),"
                    " i -> transform(slice(cs, i + 2, size(cs) - i - 1),"
                    " x -> struct(cs[i] AS a, x AS b))))"
                )
            ).alias("pr")
        )
        .groupBy(
            F.col("pr.a").alias("cust_a"), F.col("pr.b").alias("cust_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    da = cdeg.select(F.col("c").alias("cust_a"), F.col("deg").alias("dega"))
    db = cdeg.select(F.col("c").alias("cust_b"), F.col("deg").alias("degb"))
    uni = F.col("dega") + F.col("degb") - F.col("n_inter")
    return (
        inter.join(da, "cust_a")
        .join(db, "cust_b")
        .select(
            "cust_a",
            "cust_b",
            F.col("n_inter").cast("long").alias("n_inter"),
            uni.cast("long").alias("n_union"),
            F.floor(
                F.col("n_inter").cast("double") / uni * F.lit(1e6) + F.lit(0.5)
            ).cast("long").alias("jaccard_e6"),
        )
        .orderBy(F.col("jaccard_e6").desc(), "cust_a", "cust_b")
        .limit(NJ_TOP_K)
    )


# --- Power-law degree-distribution fit (Hill MLE) --------------------------

DEG_XMIN = 3


@register(
    "q_graph_degree_powerlaw",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                      's' || CAST(l_suppkey AS VARCHAR) AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY 1),
    tail AS (
      SELECT d,
             CAST(FLOOR(LN(CAST(d AS DOUBLE) / ({DEG_XMIN} - 0.5)) * 1e6
                        + 0.5) AS BIGINT) AS lr_e6
      FROM deg WHERE d >= {DEG_XMIN}
    ),
    m AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
             CAST(COUNT(*) AS BIGINT) AS n_tail,
             CAST(SUM(lr_e6) AS BIGINT) AS s_e6
      FROM tail
    )
    SELECT n_nodes, CAST({DEG_XMIN} AS BIGINT) AS dmin, n_tail,
           CAST(FLOOR((1.0 + CAST(n_tail AS DOUBLE)
                       / (CAST(s_e6 AS DOUBLE) / 1e6)) * 1e6 + 0.5)
             AS BIGINT) AS alpha_e6
    FROM m WHERE s_e6 > 0
    """,
)
def q_graph_degree_powerlaw(spark, sf_dir):
    """Hill / Clauset-style maximum-likelihood power-law exponent of the
    trade graph's degree distribution: alpha = 1 + n / sum ln(d/(xmin -
    1/2)) over the tail d >= {DEG_XMIN} (the discrete-MLE continuity
    correction). Scale-free degree structure (alpha ~ 2-3) is what
    justifies the hub-capping and skew-salting the other graph
    operators document; this measures it.

    Degrees are one map-side-combinable count; each tail node's log
    term is e6 fixed-pointed BEFORE the global sum (order-free BIGINT;
    1-ulp LN noise far below granularity, dsir precedent), and alpha is
    one shared double tree over (n_tail, sum) — an empty tail is
    filtered identically on both engines. At 100 TB: degree aggregate,
    filter, one-row reduce — no joins, no windows."""
    deg = _trade_edges(spark, sf_dir).groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    tail = deg.filter(F.col("d") >= DEG_XMIN).select(
        F.floor(
            F.log(F.col("d").cast("double") / F.lit(DEG_XMIN - 0.5)) * 1e6
            + F.lit(0.5)
        ).cast("long").alias("lr_e6")
    )
    m = tail.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.sum("lr_e6").alias("s_e6"),
    ).crossJoin(F.broadcast(n_nodes))
    alpha = F.lit(1.0) + F.col("n_tail").cast("double") / (
        F.col("s_e6").cast("double") / F.lit(1e6)
    )
    return m.filter(F.col("s_e6") > 0).select(
        "n_nodes",
        F.lit(DEG_XMIN).cast("long").alias("dmin"),
        "n_tail",
        F.floor(alpha * F.lit(1e6) + F.lit(0.5)).cast("long").alias("alpha_e6"),
    )


# --- personalized PageRank: restart mass pinned to a seed set ----------------

PPR_SEED_MOD = 10  # customer nodes with custkey % PPR_SEED_MOD == 0 seed
PPR_ITERS = 3


def _ppr_oracle() -> str:
    """Unrolled PPR power iteration — restart jumps land on the SEED
    distribution instead of uniform; one CTE level per Spark pass."""
    base = f"""
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                      's' || CAST(l_suppkey AS VARCHAR) AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (
      SELECT src AS node,
             CASE WHEN src LIKE 'c%'
                   AND CAST(SUBSTR(src, 2) AS BIGINT) % {PPR_SEED_MOD} = 0
                  THEN 1.0 ELSE 0.0 END AS seed
      FROM deg
    ),
    ns AS (SELECT CAST(SUM(seed) AS DOUBLE) AS n_seeds FROM nodes),
    r0 AS (SELECT node, seed / n_seeds AS rank FROM nodes, ns)
    """
    for k in range(PPR_ITERS):
        base += f""",
    c{k + 1} AS (
      SELECT e.dst AS node, SUM(r.rank / d.outdeg) AS contrib
      FROM edges e
      JOIN r{k} r ON e.src = r.node
      JOIN deg d ON e.src = d.src
      WHERE r.rank > 0
      GROUP BY e.dst
    ),
    r{k + 1} AS (
      SELECT n.node,
             (1 - {DAMPING}) * n.seed / MAX(ns.n_seeds)
             + {DAMPING} * COALESCE(MAX(c.contrib), 0.0) AS rank
      FROM nodes n LEFT JOIN c{k + 1} c ON n.node = c.node, ns
      GROUP BY n.node, n.seed
    )"""
    base += f"""
    SELECT node, ROUND(rank, 8) AS rank FROM r{PPR_ITERS}
    WHERE ROUND(rank, 8) > 0
    """
    return base


@register("q_graph_personalized_pagerank", oracle=_ppr_oracle())
def q_graph_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank (PPR_ITERS power iterations, damping
    {DAMPING}): the random walk restarts onto a SEED distribution —
    every {PPR_SEED_MOD}-th customer — instead of the uniform vector,
    so rank measures proximity to the seed set (the recommendation /
    local-community primitive: 'suppliers relevant to THESE
    customers'). Same scalable shape as q_graph_pagerank — each pass
    is one join (rank onto edge source, zero-rank rows pruned so early
    iterations shuffle only the reached frontier) + one aggregation,
    then a LEFT join back onto the node table to re-inject restart
    mass at every seed whether or not the walk reached it. State is a
    (node, rank) DataFrame; localCheckpoint keeps lineage flat. Rows
    that still round to 0 at 1e-8 (unreached periphery) are dropped so
    the output is the support of the walk, not the whole node table.
    The oracle unrolls the identical recurrence as chained CTEs.
    Reference: Page et al. 1999 §6 'personalized PageRank'; Jeh &
    Widom 2003."""
    edges = _trade_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    withdeg = edges.join(deg, "src").localCheckpoint(eager=False)
    nodes = (
        withdeg.select("src")
        .distinct()
        .select(
            F.col("src").alias("node"),
            F.when(
                (F.col("src") < _SUPP_OFFSET)
                & (F.col("src") % PPR_SEED_MOD == 0),
                F.lit(1.0),
            )
            .otherwise(F.lit(0.0))
            .alias("seed"),
        )
        .localCheckpoint(eager=False)
    )
    n_seeds = nodes.agg(F.sum("seed")).first()[0]
    ranks = nodes.select(
        "node", (F.col("seed") / F.lit(n_seeds)).alias("rank")
    )
    for _ in range(PPR_ITERS):
        contrib = (
            withdeg.join(
                ranks.filter(F.col("rank") > 0),
                withdeg.src == F.col("node"),
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit((1 - DAMPING) / n_seeds) * F.col("seed")
                    + F.lit(DAMPING) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        ranks.select(
            _render_node("node").alias("node"),
            F.round("rank", 8).alias("rank"),
        )
        .filter(F.col("rank") > 0)
    )


# --- betweenness centrality: sampled-source Brandes, k-hop bounded -----------

BC_SEED_MOD = 50    # customer nodes with custkey % BC_SEED_MOD == 0 seed
BC_SEED_MAX = 800   # id bound -> at most 16 source samples at any scale
# (Brandes & Pich 2007: a couple dozen sampled sources already rank the
# high-betweenness brokers; the sample is a CONSTANT so forward state
# stays |S| x reachable at any corpus size. Halved from 1600/32 seeds
# in round 14 to keep the suite's heaviest entry under the ~10 s
# headline-cost discipline — estimator quality is a fixed-sample choice
# either way, and the ranking head is stable across both settings.)
BC_HOPS = 3         # k-hop truncation (k-betweenness)
BC_E6 = 1_000_000


def _bc_oracle() -> str:
    """Unrolled sampled Brandes: BFS levels f0..f{BC_HOPS} carry exact
    path counts sigma; the backward dependency pass runs in e6
    fixed-point with PER-TERM integer division (DuckDB // == Spark div
    on BIGINT), so accumulation replays engine-identically."""
    base = f"""
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                      's' || CAST(l_suppkey AS VARCHAR) AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    seeds AS (
      SELECT DISTINCT src AS s FROM edges
      WHERE src LIKE 'c%'
        AND CAST(SUBSTR(src, 2) AS BIGINT) % {BC_SEED_MOD} = 0
        AND CAST(SUBSTR(src, 2) AS BIGINT) < {BC_SEED_MAX}
    ),
    ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_seeds FROM seeds),
    f0 AS (SELECT s, s AS node, CAST(1 AS BIGINT) AS sigma FROM seeds),
    s0 AS (SELECT s, node FROM f0)
    """
    for k in range(BC_HOPS):
        base += f""",
    f{k + 1} AS (
      SELECT f.s, e.dst AS node, CAST(SUM(f.sigma) AS BIGINT) AS sigma
      FROM edges e
      JOIN f{k} f ON e.src = f.node
      LEFT JOIN s{k} p ON p.s = f.s AND p.node = e.dst
      WHERE p.node IS NULL
      GROUP BY f.s, e.dst
    ),
    s{k + 1} AS (
      SELECT s, node FROM s{k} UNION ALL SELECT s, node FROM f{k + 1}
    )"""
    base += f""",
    d{BC_HOPS} AS (
      SELECT s, node, sigma, CAST(0 AS BIGINT) AS delta FROM f{BC_HOPS}
    )"""
    for k in range(BC_HOPS - 1, 0, -1):
        base += f""",
    d{k} AS (
      SELECT v.s, v.node, v.sigma,
             COALESCE(CAST(SUM(
               (v.sigma * ({BC_E6} + x.delta)) // x.sigma
             ) AS BIGINT), 0) AS delta
      FROM f{k} v
      LEFT JOIN (
        SELECT e.src AS vnode, w.s, w.sigma, w.delta
        FROM edges e JOIN d{k + 1} w ON w.node = e.dst
      ) x ON x.vnode = v.node AND x.s = v.s
      GROUP BY v.s, v.node, v.sigma
    )"""
    union = "\n      UNION ALL ".join(
        f"SELECT node, delta FROM d{k}" for k in range(1, BC_HOPS + 1)
    )
    base += f"""
    SELECT node, CAST(SUM(delta) // MAX(ns.n_seeds) AS BIGINT) AS bc_e6
    FROM ({union}), ns
    GROUP BY node
    HAVING SUM(delta) // MAX(ns.n_seeds) > 0
    """
    return base


@register("q_graph_betweenness", oracle=_bc_oracle())
def q_graph_betweenness(spark, sf_dir):
    """Sampled-source BETWEENNESS centrality (Brandes 2001, the
    source-sampling estimator of Brandes & Pich 2007 / Riondato &
    Kornaropoulos 2014), truncated at {BC_HOPS} hops (k-betweenness):
    from each of <= {BC_SEED_MAX // BC_SEED_MOD} deterministic seed
    customers, a level-synchronous multi-source BFS carries EXACT
    shortest-path counts sigma (sigma(w) at level k+1 = sum of
    predecessor sigmas), then the dependency accumulation runs
    BACKWARD one level at a time: delta(v) = sum over successors w of
    sigma(v)/sigma(w) * (1 + delta(w)) — evaluated in e6 FIXED POINT
    with per-term integer division, so both engines replay the exact
    same integers (no float accumulation order anywhere). bc_e6 is the
    per-node dependency sum averaged over the seed sample; interior
    brokers (nodes many seed-paths must route through) rank first.

    Scale shape: forward state is (seed, node, dist) — |S| x reachable
    rows of LONGs, the honest cost of source-sampled Brandes (|S| is a
    CONSTANT sample, so state is O(N), not O(N^2)); every round is one
    frontier equi-join + anti-join against the settled set (the BFS
    delta form), and the backward pass is one join per level against
    the NEXT level only. All shuffles key on (seed, node)."""
    edges = _trade_edges(spark, sf_dir)  # memoized + checkpointed
    nodes = edges.select("src").distinct()
    seeds = (
        nodes.filter(
            (F.col("src") < _SUPP_OFFSET)
            & (F.col("src") % BC_SEED_MOD == 0)
            & (F.col("src") < BC_SEED_MAX)
        )
        .select(F.col("src").alias("s"))
        .localCheckpoint(eager=False)
    )
    n_seeds = seeds.count()
    levels = [
        seeds.select(
            "s", F.col("s").alias("node"), F.lit(1).cast("long").alias("sigma")
        ).localCheckpoint(eager=False)
    ]
    settled = levels[0].select("s", "node")
    for _ in range(BC_HOPS):
        expand = (
            edges.join(levels[-1], edges.src == levels[-1].node)
            .groupBy("s", F.col("dst").alias("node"))
            .agg(F.sum("sigma").cast("long").alias("sigma"))
        )
        # lazy on purpose (round 14 measured eager at 9.6 s vs 7.9 s
        # committed / 5.6 s lazy+memoized-edges: the consumers of each
        # frontier materialize serially across rounds, so there is no
        # cache race to pin, and eager only serializes stage pipelining)
        nxt = expand.join(
            settled, ["s", "node"], "left_anti"
        ).localCheckpoint(eager=False)
        levels.append(nxt)
        settled = settled.unionByName(nxt.select("s", "node"))
    deltas = [None] * (BC_HOPS + 1)
    deltas[BC_HOPS] = levels[BC_HOPS].withColumn(
        "delta", F.lit(0).cast("long")
    )
    for k in range(BC_HOPS - 1, 0, -1):
        succ = (
            edges.join(
                deltas[k + 1].select(
                    "s",
                    F.col("node").alias("wnode"),
                    F.col("sigma").alias("wsigma"),
                    "delta",
                ),
                edges.dst == F.col("wnode"),
            )
            .select(F.col("src").alias("vnode"), "s", "wsigma", "delta")
        )
        v = levels[k]
        deltas[k] = (
            v.join(
                succ,
                (v.node == succ.vnode) & (v.s == succ.s),
                "left",
            )
            .groupBy(v.s, v.node, v.sigma)
            .agg(
                F.coalesce(
                    F.sum(
                        F.expr(
                            f"(sigma * ({BC_E6} + delta)) div wsigma"
                        )
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("delta")
            )
            .localCheckpoint(eager=False)  # 2 consumers, materialized serially
        )
    acc = deltas[1].select("node", "delta")
    for k in range(2, BC_HOPS + 1):
        acc = acc.unionByName(deltas[k].select("node", "delta"))
    return (
        acc.groupBy("node")
        .agg(
            F.expr(f"sum(delta) div {n_seeds}").cast("long").alias("bc_e6")
        )
        .filter(F.col("bc_e6") > 0)
        .select(_render_node("node").alias("node"), "bc_e6")
    )


# --- Weisfeiler-Leman color refinement (structural roles) --------------------

WL_ROUNDS = 3


def _wl_oracle() -> str:
    """Unrolled 1-WL: colors start at degree; each round hashes the
    own color plus the SORTED multiset of neighbor colors. Both
    engines sort the same strings and md5 the same concatenation, so
    colors are exact string matches."""
    base = """
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                      's' || CAST(l_suppkey AS VARCHAR) AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    col0 AS (
      SELECT src AS node, CAST(COUNT(*) AS VARCHAR) AS color
      FROM edges GROUP BY src
    )
    """
    for k in range(WL_ROUNDS):
        base += f""",
    sig{k + 1} AS (
      SELECT e.dst AS node,
             STRING_AGG(c.color, ',' ORDER BY c.color) AS neigh
      FROM edges e JOIN col{k} c ON e.src = c.node
      GROUP BY e.dst
    ),
    col{k + 1} AS (
      SELECT c.node,
             substr(md5(c.color || '|' || s.neigh), 1, 16) AS color
      FROM col{k} c JOIN sig{k + 1} s ON c.node = s.node
    )"""
    base += f"""
    SELECT node, color AS wl_color, CAST(class_size AS BIGINT) AS class_size
    FROM (
      SELECT node, color,
             COUNT(*) OVER (PARTITION BY color) AS class_size
      FROM col{WL_ROUNDS}
    )
    """
    return base


@register("q_graph_wl_refinement", oracle=_wl_oracle())
def q_graph_wl_refinement(spark, sf_dir):
    """1-WEISFEILER-LEMAN color refinement ({WL_ROUNDS} rounds) over the
    trade graph — the canonical structural-role / graph-isomorphism
    primitive (Weisfeiler & Leman 1968; the graph-kernel feature map of
    Shervashidze et al. 2011 and the expressiveness ceiling of
    message-passing GNNs, Xu et al. 2019): colors start at degree, and
    each round every node's color becomes the hash of (own color, the
    SORTED multiset of neighbor colors). Nodes sharing a final color
    are structurally indistinguishable to depth {WL_ROUNDS} —
    ``class_size`` is that role's population, the feature a curation
    pipeline uses to find interchangeable entities or template-shaped
    subgraphs. Everything is exact string arithmetic: sort_array on the
    collected neighbor colors (ORDER-INDEPENDENT of partitioning by
    construction), one md5 per node per round — both engines compute
    identical colors, no floats anywhere.

    Scale shape: each round is one join (colors onto edge sources) +
    one groupBy (collect + sort neighbor colors per destination) — the
    PageRank shuffle pattern with string state. Neighbor lists are
    degree-bounded; the hub-capped trade graph keeps them modest, and
    a production run would cap or sketch super-hub multisets the same
    way q_graph_adamic_adar caps hubs."""
    edges = _trade_edges(spark, sf_dir)  # memoized + checkpointed
    colors = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("string").alias("color")
    ).select(F.col("src").alias("node"), "color")
    for _ in range(WL_ROUNDS):
        sig = (
            edges.join(colors, edges.src == colors.node)
            .groupBy(F.col("dst").alias("n2"))
            .agg(
                F.array_join(
                    F.sort_array(F.collect_list("color")), ","
                ).alias("neigh")
            )
        )
        colors = (
            colors.join(sig, colors.node == sig.n2)
            .select(
                "node",
                F.substring(
                    F.md5(F.concat(F.col("color"), F.lit("|"), F.col("neigh"))),
                    1,
                    16,
                ).alias("color"),
            )
            # EAGER (round 14): each round's colors feed TWO consumers
            # of the next round (the sig derivation and the re-color
            # join). With no action until the final collect, a lazy
            # checkpoint lets two concurrent stages race the uncached
            # partitions and re-compute the whole prior-round chain up
            # to 2x per level (measured as a bimodal 5.8 s / 18 s wall);
            # eager materialization pins exactly-once compute for one
            # cheap job per round.
            .localCheckpoint(eager=True)
        )
    wcs = W.partitionBy("color")
    return colors.select(
        _render_node("node").alias("node"),
        F.col("color").alias("wl_color"),
        F.count(F.lit(1)).over(wcs).cast("long").alias("class_size"),
    )

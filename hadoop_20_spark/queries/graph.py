"""Graph analytics over relational edges (round 6).

Iterative numeric fixpoints are the third loop discipline in the repo
(label propagation: `dedup_clusters`; centroid fitting:
`kmeans_centroids`); PageRank adds mass propagation — and, like the
others, it is driven by a bounded driver loop with localCheckpoint per
round and certified by an unrolled oracle.

Determinism: ranks are INTEGER mass units (1e12 total) and every
operation is integer floor arithmetic (`DIV` in Spark, `//` in DuckDB —
identical on non-negatives), so the fixpoint is bit-identical across
engines and partitionings; float PageRank would drift with addition
order.  All magnitudes stay < 2^53 but the math never leaves BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_spark.queries._base import (  # noqa: F401
    REGISTRY,
    Query,
    _t,
    register,
)

_SCALE = 1_000_000_000_000  # total rank mass, in units
_TELEPORT = 150_000_000_000  # 0.15 * _SCALE
_ITER = 3


def _pagerank_oracle() -> str:
    ctes = [
        """e0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )""",
        "edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)",
        "deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS n FROM deg)",
        f"r0 AS (SELECT node, CAST({_SCALE} // (SELECT n FROM nn) AS BIGINT) AS r FROM deg)",
    ]
    for i in range(1, _ITER + 1):
        p = i - 1
        ctes.append(f"""r{i} AS (
      SELECT d2.node,
             CAST({_TELEPORT} // (SELECT n FROM nn)
                  + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS r
      FROM deg d2 LEFT JOIN (
        SELECT e.dst AS node, SUM(r.r // deg.d) AS contrib
        FROM edges e
        JOIN r{p} r ON r.node = e.src
        JOIN deg ON deg.node = e.src
        GROUP BY e.dst) c ON c.node = d2.node
    )""")
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           CAST(node // 2 AS BIGINT) AS node_key,
           r AS rank_units
    FROM r{_ITER}
    ORDER BY rank_units DESC, node LIMIT 20"""
    )


@register(
    "pagerank_top20",
    _pagerank_oracle(),
    note="integer-exact PageRank (3 iterations, damping 0.85) over the customer<->supplier purchase graph: rank mass in BIGINT units with floor division everywhere, so the fixpoint is bit-identical across engines/partitionings; top-20 nodes",
)
def pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite who-buys-from-whom graph (edges both
    directions — an undirected random walk), 3 iterations at damping
    0.85, reporting the top-20 nodes.

    Scale plan: per iteration ONE shuffle pattern — edges join ranks on
    src (both sides partitioned by node key; deg is joined alongside on
    the same key) then aggregate contributions by dst; the driver loop
    localCheckpoints each round (flat lineage, the dedup_clusters
    discipline).  No dangling-mass pass is needed: every node here has
    out-edges by construction.  Rank arithmetic is INTEGER (floor
    division mirrors the oracle's `//`) — float PageRank drifts with
    partial-agg addition order and could never hash-match an oracle.
    Top-20 is TakeOrderedAndProject.  At 100 TB the edge list is the
    fact table: pre-partition edges and ranks on node key once and
    every iteration reuses the co-partitioning."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).localCheckpoint()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    ).localCheckpoint()
    n_nodes = deg.count()
    ranks = deg.select("node", F.lit(_SCALE // n_nodes).cast("long").alias("r"))
    base = _TELEPORT // n_nodes
    for _ in range(_ITER):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg.withColumnRenamed("node", "d_node"), F.col("src") == F.col("d_node"))
            .select("dst", F.expr("r DIV d").alias("share"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = (
            deg.select("node")
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr("85 * coalesce(contrib, 0) DIV 100")
                ).cast("long").alias("r"),
            )
            .localCheckpoint()
        )
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, "customer")
            .otherwise("supplier")
            .alias("node_type"),
            F.expr("node DIV 2").cast("long").alias("node_key"),
            F.col("r").alias("rank_units"),
            "node",
        )
        .orderBy(F.desc("rank_units"), "node")
        .limit(20)
        .drop("node")
    )


@register(
    "copurchase_triangles",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM items a JOIN items b
        ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= 2
    ),
    tri AS (
      SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      FROM edges e1
      JOIN edges e2 ON e2.pa = e1.pb
      JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    )
    SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(DISTINCT p) FROM
                 (SELECT pa AS p FROM edges UNION SELECT pb FROM edges)) AS BIGINT) AS n_parts,
           CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles
    """,
    note=(
        "triangle counting over the part co-purchase graph (edges = part pairs co-bought in "
        ">= 2 orders): the a<b<c ordered two-hop join counts each triangle exactly once — the "
        "graph-structure metric (clustering density) the reference computed with chained joins"
    ),
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the co-purchase graph: nodes = parts, edges =
    pairs co-purchased in ≥ 2 distinct orders, triangles counted via the
    canonical ordered two-hop join (every edge stored once as a<b, so
    each triangle a<b<c matches exactly one (ab, bc, ac) tuple — no /6
    correction, no double counting).

    Scale plan: the edge list is an AGGREGATED relation (pair counts
    filtered to >= 2 — orders of magnitude smaller than the raw pair
    stream, and built with the row-local C(k,2) expansion of
    copurchase_pairs, no postings self-join); the two-hop join keys on
    single part ids and the closing join on the (a, c) pair — both
    plain hash joins on the small edge relation.  At 100 TB the
    standard refinement is degree-ordered edge direction (point each
    edge at the higher-degree endpoint) to bound the two-hop fan-out;
    documented, not needed at this edge density."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    edges = (
        sets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("pa", "pb")
        .localCheckpoint()  # edges feed three join sides + two aggregates
    )
    e1 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = edges.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    e3 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    # single-row summary built declaratively (three 1-row aggregates,
    # broadcast cross-joined) — nothing ships to the driver
    ne = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    np_ = (
        edges.select(F.col("pa").alias("p"))
        .union(edges.select(F.col("pb").alias("p")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    )
    nt = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    return ne.crossJoin(F.broadcast(np_)).crossJoin(F.broadcast(nt))


_MAX_ITER = 10


def _pagerank_converged_oracle() -> str:
    """Unrolled max-iteration oracle with the SAME integer stop
    predicate the Spark loop applies: stop at the first iteration whose
    max |Δrank| has halved from iteration 1 (d_i * 2 <= d_1), cap at
    _MAX_ITER.  All-integer, so the data-dependent iteration count is
    engine-identical.

    Every chained CTE is MATERIALIZED: the deltas and the final union
    reference each r_i twice, and DuckDB's default CTE inlining then
    duplicates the whole upstream chain per reference — 2^10 copies of
    r1 by r10, which turned a 2-second oracle into a >10-minute one at
    sf0.1.  Materialization computes each iteration exactly once."""
    ctes = [
        """e0 AS MATERIALIZED (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )""",
        "edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)",
        "deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS n FROM deg)",
        f"r0 AS MATERIALIZED (SELECT node, CAST({_SCALE} // (SELECT n FROM nn) AS BIGINT) AS r FROM deg)",
    ]
    for i in range(1, _MAX_ITER + 1):
        p = i - 1
        ctes.append(f"""r{i} AS MATERIALIZED (
      SELECT d2.node,
             CAST({_TELEPORT} // (SELECT n FROM nn)
                  + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS r
      FROM deg d2 LEFT JOIN (
        SELECT e.dst AS node, SUM(r.r // deg.d) AS contrib
        FROM edges e
        JOIN r{p} r ON r.node = e.src
        JOIN deg ON deg.node = e.src
        GROUP BY e.dst) c ON c.node = d2.node
    )""")
    deltas = "\n      UNION ALL ".join(
        f"SELECT {i} AS i, (SELECT MAX(ABS(a.r - b.r)) FROM r{i} a "
        f"JOIN r{i-1} b USING (node)) AS md"
        for i in range(1, _MAX_ITER + 1)
    )
    ctes.append(f"d AS MATERIALIZED ({deltas})")
    ctes.append(
        "stop AS (SELECT COALESCE(MIN(CASE WHEN md * 2 <= "
        f"(SELECT md FROM d WHERE i = 1) THEN i END), {_MAX_ITER}) AS si FROM d)"
    )
    allr = "\n      UNION ALL ".join(
        f"SELECT {i} AS i, node, r FROM r{i}" for i in range(1, _MAX_ITER + 1)
    )
    ctes.append(f"allr AS ({allr})")
    ctes.append("fin AS (SELECT node, r FROM allr WHERE i = (SELECT si FROM stop))")
    return (
        "WITH " + ",\n    ".join(ctes)
        + """
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           CAST(node // 2 AS BIGINT) AS node_key,
           r AS rank_units,
           CAST((SELECT si FROM stop) AS BIGINT) AS n_iterations,
           CAST((SELECT md FROM d WHERE i = (SELECT si FROM stop)) AS BIGINT) AS max_delta_units
    FROM fin
    ORDER BY rank_units DESC, node LIMIT 20"""
    )


@register(
    "pagerank_converged",
    _pagerank_converged_oracle(),
    note=(
        "convergence-driven PageRank: iterate until the integer max |delta-rank| HALVES "
        "from iteration 1 (d_i * 2 <= d_1, all-BIGINT so the stop is engine-identical), "
        "cap 10; emits (n_iterations, final max delta) with the top-20 — the data-dependent "
        "termination a real graph job needs, certified by an unrolled oracle applying the "
        "same stop predicate"
    ),
)
def pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with data-dependent termination: same integer-mass
    iteration as pagerank_top20, but the driver loop stops at the first
    iteration whose max |Δrank| has halved from iteration 1 (the
    scale-free integer criterion — a fixed absolute ε either never
    fires inside the cap or fires instantly, because damping-0.85
    deltas shrink only ~15% per round), with a hard cap of 10.  Output
    carries (n_iterations, max_delta_units) beside the top-20 so a
    regression in convergence is data, not vibes.

    Scale plan: identical per-iteration shuffle pattern to
    pagerank_top20 (edges⋈ranks on src, aggregate by dst,
    localCheckpoint per round); the ONLY driver traffic is one 1-row
    max-delta aggregate per iteration (≤ 10 one-row collects — the
    bounded-loop discipline of bpe_merges_n/dedup_clusters).  The
    delta join is node-keyed between two checkpointed rank vectors."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    n_nodes = deg.count()
    ranks = deg.select("node", F.lit(_SCALE // n_nodes).cast("long").alias("r"))
    base = _TELEPORT // n_nodes

    def step(r_prev: DataFrame) -> DataFrame:
        contrib = (
            edges.join(r_prev, edges.src == r_prev.node)
            .join(
                deg.withColumnRenamed("node", "d_node"),
                F.col("src") == F.col("d_node"),
            )
            .select("dst", F.expr("r DIV d").alias("share"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        return (
            deg.select("node")
            .join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.expr("85 * coalesce(contrib, 0) DIV 100"))
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint()
        )

    d1 = None
    n_iter, max_delta = _MAX_ITER, 0
    for i in range(1, _MAX_ITER + 1):
        new_ranks = step(ranks)
        delta = (
            new_ranks.alias("a")
            .join(ranks.alias("b"), "node")
            .agg(F.max(F.abs(F.col("a.r") - F.col("b.r"))).alias("md"))
            .first()["md"]
        )
        ranks = new_ranks
        if d1 is None:
            d1 = delta
        if delta * 2 <= d1:
            n_iter, max_delta = i, delta
            break
        max_delta = delta
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, "customer")
            .otherwise("supplier")
            .alias("node_type"),
            F.expr("node DIV 2").cast("long").alias("node_key"),
            F.col("r").alias("rank_units"),
            F.lit(n_iter).cast("long").alias("n_iterations"),
            F.lit(max_delta).cast("long").alias("max_delta_units"),
            "node",
        )
        .orderBy(F.desc("rank_units"), "node")
        .limit(20)
        .drop("node")
    )


@register(
    "entity_resolution",
    """
    WITH RECURSIVE
    b AS (SELECT c_custkey, c_name,
                 substr(c_name, 1, len(c_name) - 1) AS blk FROM customer),
    p AS (
      SELECT a.c_custkey AS ka, c.c_custkey AS kb
      FROM b a JOIN b c ON a.blk = c.blk AND a.c_custkey < c.c_custkey
      WHERE levenshtein(a.c_name, c.c_name) <= 1
    ),
    edges AS (SELECT ka AS s, kb AS d FROM p UNION SELECT kb, ka FROM p),
    reach(s, d) AS (
      SELECT c_custkey, c_custkey FROM customer
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    lab AS (SELECT s AS c_custkey, MIN(d) AS entity_id FROM reach GROUP BY s),
    sz AS (SELECT entity_id, COUNT(*) AS n_members FROM lab GROUP BY entity_id)
    SELECT l.c_custkey, l.entity_id,
           CAST(sz.n_members AS BIGINT) AS n_members,
           CASE WHEN sz.n_members > 1 THEN 1 ELSE 0 END AS is_merged
    FROM lab l JOIN sz USING (entity_id)
    ORDER BY c_custkey
    """,
    note=(
        "record-linkage entity resolution end to end: prefix blocking -> within-block "
        "levenshtein<=1 edges -> connected components (min-label propagation, "
        "operators/graph.py) -> every customer mapped to a canonical entity id "
        "(smallest member key) with member count; oracle = recursive-CTE closure "
        "seeded with ALL customers so singletons resolve to themselves"
    ),
)
def entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full record-linkage pipeline composed from the repo's own
    stages (blocking join = fuzzy_name_pairs discipline; components =
    the extracted operators/graph.connected_components): resolve every
    customer to a canonical entity.  Isolated customers keep their own
    key via left-join + coalesce — the components operator only labels
    nodes incident to an edge, so the mapping stays total without
    feeding 150k singleton self-edges through the iteration.

    Scale plan: the quadratic step is confined to within-block pairs
    (largest block bounds the task); propagation rounds are bounded by
    component diameter (<= block chains, shallow); the final size
    window partitions on entity_id — no single-partition window, no
    collect.  At 100 TB the blocking key is the knob: pick it so the
    hottest block fits a task, or salt it (salted-join pattern)."""
    from hadoop_20_spark.operators import graph as graph_ops

    cust = _t(spark, sf_dir, "customer")
    b = cust.select(
        "c_custkey",
        "c_name",
        F.expr("substring(c_name, 1, length(c_name) - 1)").alias("blk"),
    )
    a = b.select(F.col("c_custkey").alias("ka"), F.col("c_name").alias("na"), "blk")
    d = b.select(F.col("c_custkey").alias("kb"), F.col("c_name").alias("nb"), "blk")
    edges = (
        a.join(d, "blk")
        .filter(F.col("ka") < F.col("kb"))
        .filter(F.levenshtein("na", "nb") <= 1)
        .select(F.col("ka").alias("src"), F.col("kb").alias("dst"))
    )
    comp = graph_ops.connected_components(edges)
    lab = cust.join(comp, cust.c_custkey == comp.id, "left").select(
        "c_custkey",
        F.coalesce(F.col("component"), F.col("c_custkey")).alias("entity_id"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("entity_id")
    return (
        lab.withColumn("n_members", F.count(F.lit(1)).over(w).cast("long"))
        .select(
            "c_custkey",
            "entity_id",
            "n_members",
            (F.col("n_members") > 1).cast("int").alias("is_merged"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# k-hop BFS reachability (round 8)
# ---------------------------------------------------------------------------
_BFS_HOPS = 3


def _bfs_oracle() -> str:
    ctes = [
        """e0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )""",
        "edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        """v0 AS (
      SELECT c_custkey * 2 AS node, 0 AS dist FROM customer
      WHERE c_nationkey = 0
        AND c_custkey * 2 IN (SELECT node FROM nodes)
    )""",
    ]
    for i in range(1, _BFS_HOPS + 1):
        p = i - 1
        ctes.append(f"""n{i} AS (
      SELECT DISTINCT e.dst AS node, {i} AS dist
      FROM edges e JOIN v{p} f ON f.node = e.src AND f.dist = {p}
      WHERE e.dst NOT IN (SELECT node FROM v{p})
    )""")
        ctes.append(f"v{i} AS (SELECT * FROM v{p} UNION ALL SELECT * FROM n{i})")
    ctes.append(f"""labeled AS (
      SELECT nodes.node,
             COALESCE(v.dist, -1) AS dist
      FROM nodes LEFT JOIN v{_BFS_HOPS} v ON v.node = nodes.node
    )""")
    return (
        "WITH " + ",\n    ".join(ctes)
        + """
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           dist,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           MIN(node) AS min_node,
           MAX(node) AS max_node
    FROM labeled GROUP BY 1, 2 ORDER BY node_type, dist
    """
    )


@register(
    "bfs_khop_reach",
    _bfs_oracle(),
    note=(
        "k-hop BFS (3 hops) over the customer-supplier graph from the nation-0 "
        "customer seed set: per-round frontier expansion with visited anti-join and "
        "localCheckpoint (the pagerank loop discipline applied to reachability); "
        "reports nodes per (type, hop distance) incl. the unreached (-1) row; oracle "
        "= 3 unrolled frontier CTEs"
    ),
)
def bfs_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source shortest hop distance, capped at 3 hops: seeds are
    every customer in nation 0; each round expands the CURRENT frontier
    one hop (edges join frontier on src — the same node-keyed shuffle
    pattern as pagerank), discards already-visited nodes with an
    anti-join, and localCheckpoints both relations so lineage stays
    flat.  Completes the graph family's traversal quadrant (pagerank =
    mass fixpoint, connected components = label fixpoint, triangles =
    local counting, this = frontier traversal).

    Only frontier rows join edges each round (not all visited nodes),
    so round cost tracks the frontier boundary, not the reached set —
    the property that makes BFS feasible when the reached set is the
    whole graph.  All columns are integers; no arithmetic beyond
    counting, so cross-engine determinism is structural.

    Scale plan: per round ONE edges-side shuffle (edges pre-partitioned
    by src at 100 TB get frontier co-location for free) + one anti-join
    keyed the same way; driver traffic is one count per round (loop
    control), never node data.  Unreached nodes surface as dist = -1
    (never silently dropped).  Reference anchor (public hadoop-20):
    iterative MR job chaining (mapred/jobcontrol/JobControl.java) — BFS
    was the canonical chained-MR example; one lazy plan per round here."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint()
    cust = _t(spark, sf_dir, "customer")
    seeds = (
        cust.filter(F.col("c_nationkey") == 0)
        .select((F.col("c_custkey") * 2).alias("node"))
        .join(nodes, "node", "left_semi")  # seed must exist in the graph
        .select("node", F.lit(0).alias("dist"))
    )
    visited = seeds.localCheckpoint()
    frontier = visited
    for i in range(1, _BFS_HOPS + 1):
        if frontier.isEmpty():  # loop control: one bounded check per round
            break
        nxt = (
            edges.join(frontier.select("node"), edges.src == F.col("node"))
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(i).alias("dist"))
            .localCheckpoint()
        )
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt
    labeled = nodes.join(visited, "node", "left").select(
        "node", F.coalesce(F.col("dist"), F.lit(-1)).alias("dist")
    )
    node_type = F.when(F.col("node") % 2 == 0, F.lit("customer")).otherwise(
        F.lit("supplier")
    )
    return (
        labeled.groupBy(node_type.alias("node_type"), "dist")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("node_type", "dist")
    )


@register(
    "cc_star_order_chains",
    """
    WITH c AS (
      SELECT MIN(o_orderkey) AS cluster_id, COUNT(*) AS n_nodes
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 2
    )
    SELECT cluster_id, CAST(n_nodes AS BIGINT) AS n_nodes
    FROM c ORDER BY n_nodes DESC, cluster_id LIMIT 25
    """,
    note=(
        "connected components by LARGE-STAR/SMALL-STAR contraction (Kiveris et "
        "al. 2014) over per-customer order chains — a deliberately DEEP graph "
        "(path components up to diameter ~24, beyond min-label propagation's "
        "default 20-round bound) that star contraction closes in O(log n) "
        "rounds; oracle recovers each chain's component (min order key per "
        "customer) relationally"
    ),
)
def cc_star_order_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-contraction connected components on a deep-diameter graph.

    The graph: consecutive orders of the same customer (ordered by
    o_orderkey) are linked into a chain, so every component is a PATH
    whose diameter equals the customer's order count minus one — up to
    ~24 at sf0.1.  This is the graph shape that breaks diameter-bound
    algorithms: `connected_components` (min-label propagation) at its
    default max_iters=20 would correctly REFUSE (fail-loud) on these
    chains, while `connected_components_star` closes them in ~7 rounds
    — each round one partial-agg min shuffle + one co-keyed join, the
    same per-round cost, exponentially fewer rounds.

    Scale plan: chain edges come from ONE window over orders
    partitioned by o_custkey (no global window); per star round the
    (node, parent) edge set never exceeds the node count after the
    first contraction, and the fixpoint test is two set-difference
    counts on that bounded set.  At 100 TB the round count stays
    O(log n) — 2^30 nodes is ~30 rounds worst case, versus unbounded
    diameter for propagation on trail-shaped graphs (session paths,
    linked lists, citation chains).

    Reference anchor: the chained-MR-jobs iteration idiom
    (`src/examples/org/apache/hadoop/examples/` job chains), upgraded
    to the round-optimal contraction algorithm.
    """
    from pyspark.sql import Window

    from hadoop_20_spark.operators import graph as graph_ops

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    chain = orders.select(
        F.col("o_orderkey").alias("src"),
        F.lead("o_orderkey").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    labels, _rounds = graph_ops.connected_components_star(chain)
    return (
        labels.groupBy(F.col("component").alias("cluster_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "cluster_id")
        .limit(25)
    )


_KCORE_K = 4
_KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    ctes = [
        """items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)""",
        f"""p AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM items a JOIN items b
        ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )""",
        "e1 AS (SELECT pa AS src, pb AS dst FROM p UNION ALL SELECT pb, pa FROM p)",
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        ctes.append(
            f"d{r} AS (SELECT src AS node, COUNT(*) AS d FROM e{r} GROUP BY src)"
        )
        ctes.append(f"r{r} AS (SELECT node FROM d{r} WHERE d < {_KCORE_K})")
        ctes.append(
            f"""e{r + 1} AS (
      SELECT src, dst FROM e{r}
      WHERE src NOT IN (SELECT node FROM r{r})
        AND dst NOT IN (SELECT node FROM r{r})
    )"""
        )
    rounds_sql = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, 'removed' AS metric, (SELECT COUNT(*) FROM r{r}) AS n"
        for r in range(1, _KCORE_ROUNDS + 1)
    )
    last = _KCORE_ROUNDS + 1
    return f"""
    WITH {','.join(ctes)}
    SELECT CAST(round AS INT) AS round, metric, CAST(n AS BIGINT) AS n FROM (
      {rounds_sql}
      UNION ALL
      SELECT {last}, 'core_nodes',
             (SELECT COUNT(*) FROM (SELECT DISTINCT src FROM e{last}))
      UNION ALL
      SELECT {last}, 'core_edges', (SELECT COUNT(*) FROM e{last}) / 2
    ) ORDER BY round, metric"""


@register(
    "kcore_peel_audit",
    _kcore_oracle(),
    note=(
        f"bounded k-core peeling (k={_KCORE_K}, {_KCORE_ROUNDS} rounds) over the "
        "co-purchase graph (parts co-bought in >=2 orders): each round removes "
        "every node of residual degree < k, re-derives degrees, repeats — the "
        "removal CASCADE per round plus the surviving subgraph size; oracle = "
        "unrolled peel rounds"
    ),
)
def kcore_peel_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The peeling loop — the graph family's fifth iteration discipline
    (after propagation, contraction, mass iteration, frontier
    traversal): per round ONE degree aggregate + one survivor semi-join
    per side, localCheckpoint to cut lineage, all integer counts.
    Emits the per-round removal cascade (at sf0.01: 1015 -> 355 -> 258
    of 1880 nodes — removals EXPOSE new sub-k nodes, which is why
    degeneracy needs iteration and one degree filter is not a k-core)
    and the surviving subgraph's node/edge count.

    Rounds are FIXED (not run-to-fixpoint) so the oracle unrolls the
    same computation exactly; the graph density — and so how far three
    rounds get toward the true k-core — varies with scale, which the
    emitted cascade makes visible rather than hiding.  Scale plan: the
    pair graph is built by the basket-bounded row-local C(k,2)
    expansion (copurchase_pairs discipline, never a postings
    self-join); each peel round shuffles only (node, degree) pairs and
    the shrinking edge list, keyed by 8-byte node ids.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    pairs = (
        sets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("pa", "pb")
    )
    edges = pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).union(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    ).localCheckpoint()
    rows = []
    for r in range(1, _KCORE_ROUNDS + 1):
        deg = edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("d")
        )
        removed = deg.filter(F.col("d") < _KCORE_K).select("node").localCheckpoint()
        rows.append(
            removed.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
                F.lit(r).cast("int").alias("round"),
                F.lit("removed").alias("metric"),
                "n",
            )
        )
        edges = (
            edges.join(removed, edges.src == removed.node, "left_anti")
            .join(removed, edges.dst == removed.node, "left_anti")
            .localCheckpoint()
        )
    last = _KCORE_ROUNDS + 1
    core_nodes = edges.select("src").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).select(F.lit(last).cast("int").alias("round"), F.lit("core_nodes").alias("metric"), "n")
    core_edges = edges.agg((F.count(F.lit(1)) / 2).cast("long").alias("n")).select(
        F.lit(last).cast("int").alias("round"), F.lit("core_edges").alias("metric"), "n"
    )
    out = rows[0]
    for df in rows[1:] + [core_nodes, core_edges]:
        out = out.unionByName(df)
    return out.orderBy("round", "metric")


_SSSP_ROUNDS = 3


_SSSP_CAP = 12  # convergence cap: fixture converges at 5/5/7 rounds


def _sssp_converged_oracle() -> str:
    """Unrolled-to-convergence CTE: d1..d{cap} relaxation rounds plus a
    per-round improvement count; the reported ``rounds`` is the FIRST
    round with zero improvements — the same fixpoint test the Spark
    loop runs — and the reported distances are d{cap}'s, which equal
    the convergence state because post-fixpoint rounds are no-ops."""
    ctes = [
        """we AS MATERIALIZED (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
             CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    )""",
        "edges AS MATERIALIZED (SELECT src, dst, w FROM we UNION ALL "
        "SELECT dst, src, w FROM we)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        """d0 AS (
      SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes
      WHERE node % 2 = 0 AND node IN (SELECT c_custkey * 2 FROM customer WHERE c_nationkey = 0)
    )""",
    ]
    for i in range(1, _SSSP_CAP + 1):
        p = i - 1
        ctes.append(f"""r{i} AS (
      SELECT e.dst AS node, MIN(d.dist + e.w) AS dist
      FROM edges e JOIN d{p} d ON d.node = e.src
      GROUP BY e.dst
    )""")
        ctes.append(f"""d{i} AS MATERIALIZED (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d{p} UNION ALL SELECT node, dist FROM r{i}
      ) GROUP BY node
    )""")
        ctes.append(f"""c{i} AS (
      SELECT {i} AS r, CAST(COUNT(*) AS BIGINT) AS improved
      FROM d{i} x LEFT JOIN d{p} prev ON x.node = prev.node
      WHERE prev.node IS NULL OR x.dist < prev.dist
    )""")
    ctes.append(
        "rounds AS (SELECT CAST(MIN(r) AS BIGINT) AS rounds FROM ("
        + " UNION ALL ".join(f"SELECT r, improved FROM c{i}" for i in range(1, _SSSP_CAP + 1))
        + ") WHERE improved = 0)"
    )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT CASE WHEN l.node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           CAST(COUNT(d.node) AS BIGINT) AS n_reached,
           CAST(COUNT(*) - COUNT(d.node) AS BIGINT) AS n_unreached,
           MIN(d.dist) AS min_dist_cents,
           MAX(d.dist) AS max_dist_cents,
           CAST(SUM(d.dist) AS BIGINT) AS sum_dist_cents,
           (SELECT rounds FROM rounds) AS rounds
    FROM nodes l LEFT JOIN d{_SSSP_CAP} d ON d.node = l.node
    GROUP BY 1 ORDER BY node_type"""
    )


def _sssp_oracle() -> str:
    ctes = [
        """we AS (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
             CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    )""",
        "edges AS (SELECT src, dst, w FROM we UNION ALL SELECT dst, src, w FROM we)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        """d0 AS (
      SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes
      WHERE node % 2 = 0 AND node IN (SELECT c_custkey * 2 FROM customer WHERE c_nationkey = 0)
    )""",
    ]
    for i in range(1, _SSSP_ROUNDS + 1):
        p = i - 1
        ctes.append(f"""r{i} AS (
      SELECT e.dst AS node, MIN(d.dist + e.w) AS dist
      FROM edges e JOIN d{p} d ON d.node = e.src
      GROUP BY e.dst
    )""")
        ctes.append(f"""d{i} AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d{p} UNION ALL SELECT node, dist FROM r{i}
      ) GROUP BY node
    )""")
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT CASE WHEN l.node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           CAST(COUNT(d.node) AS BIGINT) AS n_reached,
           CAST(COUNT(*) - COUNT(d.node) AS BIGINT) AS n_unreached,
           MIN(d.dist) AS min_dist_cents,
           MAX(d.dist) AS max_dist_cents,
           CAST(SUM(d.dist) AS BIGINT) AS sum_dist_cents
    FROM nodes l LEFT JOIN d{_SSSP_ROUNDS} d ON d.node = l.node
    GROUP BY 1 ORDER BY node_type"""
    )


@register(
    "weighted_sssp_relaxation",
    _sssp_oracle(),
    note=(
        "multi-source weighted shortest paths by 3 Bellman-Ford relaxation rounds "
        "over the customer-supplier graph (edge weight = cheapest lineitem in "
        "integer cents, seeds = nation-0 customers): per round ONE min-plus "
        "edges-join-distances shuffle + a keep-min merge; per-type reach counts "
        "and exact distance sums; oracle = 3 unrolled relaxation CTEs"
    ),
)
def weighted_sssp_relaxation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The min-plus RELAXATION loop — sixth and last of the graph
    family's iteration disciplines (propagation, contraction, mass,
    frontier, peeling, relaxation).  Distances are exact integer cents
    (DECIMAL(18,2)->cents min per edge), so keep-min merges are
    bit-identical across engines and partitionings; three bounded
    rounds = paths of <= 3 hops, the oracle unrolls the same three.

    Scale plan: per round ONE shuffle pattern — current distances join
    edges on the source key (both co-partitioned on node id) with a
    dst-keyed MIN aggregate (map-side partials), then a keep-min merge
    with the previous frontier; localCheckpoint cuts lineage per round
    (the pagerank discipline).  Unreached nodes surface as a count, not
    silently dropped.  At 100 TB: Bellman-Ford rounds bound HOPS, so
    bounded-round SSSP is the honest contract (full convergence on a
    high-diameter graph wants the star-contraction treatment or a
    priority-queue engine, documented rather than pretended).
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    we = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
            cents.alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
    )
    edges = we.union(
        we.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).localCheckpoint()
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint()
    cust = _t(spark, sf_dir, "customer")
    seeds = (
        cust.filter(F.col("c_nationkey") == 0)
        .select((F.col("c_custkey") * 2).alias("node"))
        .join(nodes, "node")
        .select("node", F.lit(0).cast("long").alias("dist"))
    )
    dist = seeds.localCheckpoint()
    for _ in range(_SSSP_ROUNDS):
        relaxed = (
            edges.join(dist, edges.src == dist.node)
            .select("dst", (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("nd").alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    node_type = F.when(F.col("n.node") % 2 == 0, "customer").otherwise("supplier")
    return (
        nodes.alias("n")
        .join(dist.alias("d"), F.col("n.node") == F.col("d.node"), "left")
        .groupBy(node_type.alias("node_type"))
        .agg(
            F.count(F.col("d.node")).cast("long").alias("n_reached"),
            (F.count(F.lit(1)) - F.count(F.col("d.node")))
            .cast("long")
            .alias("n_unreached"),
            F.min("d.dist").alias("min_dist_cents"),
            F.max("d.dist").alias("max_dist_cents"),
            F.sum("d.dist").cast("long").alias("sum_dist_cents"),
        )
        .orderBy("node_type")
    )


@register(
    "weighted_sssp_converged",
    _sssp_converged_oracle(),
    note=(
        "the data-dependent-stop twin of weighted_sssp_relaxation: Bellman-Ford "
        "relaxation until a round improves NOTHING (one <=1-row integer collect "
        "per round, the pagerank_converged discipline), capped at 12 rounds with "
        "a loud RuntimeError — distances are hop-complete on the fixture "
        "(converges at 5/5/7 rounds across the three scales) and the fixpoint "
        "round rides in the result; oracle = 12 unrolled relaxation CTEs with "
        "per-round improvement counts, rounds = first zero-improvement round"
    ),
)
def weighted_sssp_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence-stopped multi-source weighted SSSP — the honest
    completion of :func:`weighted_sssp_relaxation`, whose 3 rounds
    bound paths to 3 hops by contract.  Here the driver loop runs
    min-plus relaxation rounds until a round improves no distance
    (exact integer comparison: a round's keep-min merge either lowers
    some node's cents or the fixpoint is reached), so the returned
    distances are true shortest paths regardless of graph diameter,
    and the verified fixpoint round is emitted with the result.

    Per round: ONE edges-join-distances shuffle + dst-keyed MIN with
    map-side partials, a keep-min merge against the previous state,
    and a single integer improvement COUNT collected to the driver
    (<= _SSSP_CAP one-row collects total); localCheckpoint cuts
    lineage per round.  The cap fails LOUDLY (RuntimeError, the
    connected_components/pagerank discipline) instead of returning
    silently-truncated distances.  At 100 TB the improvement count is
    the stopping certificate a fleet scheduler reads; the per-round
    cost model is identical to the bounded twin's.

    Reference anchor (public hadoop-20): the driver-controlled
    iterate-until-converged loop of iterative MapReduce jobs
    (JobClient.runJob resubmission with the convergence test between
    submissions), with the improvement count as the job counter the
    driver inspected."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    we = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
            cents.alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
    )
    edges = we.union(
        we.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).localCheckpoint()
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint()
    cust = _t(spark, sf_dir, "customer")
    seeds = (
        cust.filter(F.col("c_nationkey") == 0)
        .select((F.col("c_custkey") * 2).alias("node"))
        .join(nodes, "node")
        .select("node", F.lit(0).cast("long").alias("dist"))
    )
    dist = seeds.localCheckpoint()
    rounds = 0
    while True:
        rounds += 1
        if rounds > _SSSP_CAP:
            raise RuntimeError(
                f"weighted_sssp_converged: no fixpoint within {_SSSP_CAP} "
                "relaxation rounds — raise _SSSP_CAP (and the oracle's "
                "unroll) for this graph's diameter"
            )
        relaxed = (
            edges.join(dist, edges.src == dist.node)
            .select("dst", (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("nd").alias("dist"))
        )
        nd = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
        improved = (
            nd.alias("n")
            .join(dist.alias("p"), F.col("n.node") == F.col("p.node"), "left")
            .filter(
                F.col("p.node").isNull() | (F.col("n.dist") < F.col("p.dist"))
            )
            .count()
        )
        dist = nd
        if improved == 0:
            break
    node_type = F.when(F.col("n.node") % 2 == 0, "customer").otherwise("supplier")
    return (
        nodes.alias("n")
        .join(dist.alias("d"), F.col("n.node") == F.col("d.node"), "left")
        .groupBy(node_type.alias("node_type"))
        .agg(
            F.count(F.col("d.node")).cast("long").alias("n_reached"),
            (F.count(F.lit(1)) - F.count(F.col("d.node")))
            .cast("long")
            .alias("n_unreached"),
            F.min("d.dist").alias("min_dist_cents"),
            F.max("d.dist").alias("max_dist_cents"),
            F.sum("d.dist").cast("long").alias("sum_dist_cents"),
            F.lit(rounds).cast("long").alias("rounds"),
        )
        .orderBy("node_type")
    )

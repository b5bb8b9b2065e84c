"""Market-basket / affinity queries (split from relational.py in round 9
at the 2k-line threshold — the same seam as the round-6 stats split and
the round-7 sampling split).  Behavior-identical move; REGISTRY names,
oracles, and notes unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from hadoop_20_spark.queries._base import (  # noqa: F401
    REGISTRY,
    Query,
    _t,
    register,
)

@register(
    "copurchase_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
      FROM items a JOIN items b
        ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT part_a, part_b, CAST(n_orders AS BIGINT) AS n_orders
    FROM pairs ORDER BY n_orders DESC, part_a, part_b LIMIT 20
    """,
    note=(
        "market-basket pair counting (top-20 co-purchased part pairs): per-order part sets "
        "built in one orderkey shuffle, C(k,2) pairs generated ROW-LOCALLY from each set "
        "(the map-side idiom — no postings self-join), pair counts partial-agg'd; oracle is "
        "the naive self-join, identical by construction"
    ),
)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part pairs bought together in the same order — the
    A-Priori/market-basket pair-counting workload the reference ran as
    a canonical two-job MapReduce chain.  Spark plan: ONE l_orderkey
    shuffle builds each order's sorted distinct part set; the C(k,2)
    pair expansion is a row-local higher-order expression (slice
    against the per-row array — no self-join, so a hot part's postings
    never fan out against each other); pair counts ride a partial-agg'd
    shuffle on the (part_a, part_b) key and top-20 is
    TakeOrderedAndProject.  Per-order fan-out is C(order size, 2) —
    bounded by basket size, not by part popularity, which is what makes
    this shape survive 100 TB where the postings self-join (the oracle
    spelling) blows up on popular parts."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    # row-local C(k,2): for element i, pair with every later element
    pair_structs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    return (
        sets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "part_affinity_lift",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
    pc AS (SELECT l_partkey, COUNT(*) AS c FROM items GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS c_ab
      FROM items a JOIN items b
        ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    scored AS (
      SELECT part_a, part_b, c_ab,
             CAST(c_ab * (SELECT n_orders FROM n) AS DOUBLE)
               / CAST(ca.c * cb.c AS DOUBLE) AS lift
      FROM pairs
      JOIN pc ca ON ca.l_partkey = part_a
      JOIN pc cb ON cb.l_partkey = part_b
    )
    SELECT part_a, part_b, CAST(c_ab AS BIGINT) AS n_orders, (ROUND(lift, 6) + 0) AS lift
    FROM scored ORDER BY lift DESC, part_a, part_b LIMIT 20
    """,
    note=(
        "association-rule lift (P(a,b)/(P(a)P(b))) for co-purchased part pairs with support "
        ">= 2: the market-basket METRIC on top of copurchase_pairs' counting — lift computed "
        "as one double expression over exact integer counts (identical in both engines), "
        "ordered unrounded, emitted rounded"
    ),
)
def part_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part pairs by association lift: how much more often two
    parts are bought together than independence predicts.  Counts are
    exact integers (pair counts from the row-local basket expansion,
    per-part counts and the order total from the same items relation),
    so the lift double is computed identically from identical integers
    on both engines; ranking uses the UNROUNDED value with (part_a,
    part_b) tie-break, and only the emitted column is rounded.

    Scale plan: one orderkey shuffle (basket sets + the distinct-order
    count), row-local C(k,2) expansion, pair counts partial-agg'd; the
    per-part count relation is dim-sized and joins the pair relation
    twice (AQE broadcasts it from runtime stats); top-20 is
    TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    n = sets.agg(F.count(F.lit(1)).alias("n_orders_tot"))
    pc = (
        sets.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pairs = (
        sets.select(F.explode(pair_structs).alias("pr"))
        .groupBy(F.col("pr.part_a").alias("part_a"), F.col("pr.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= 2)
    )
    ca = pc.select(F.col("p").alias("part_a"), F.col("c").alias("_ca"))
    cb = pc.select(F.col("p").alias("part_b"), F.col("c").alias("_cb"))
    scored = (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("c_ab").cast("long").alias("n_orders"),
            (
                (F.col("c_ab") * F.col("n_orders_tot")).cast("double")
                / (F.col("_ca") * F.col("_cb")).cast("double")
            ).alias("_lift"),
        )
    )
    return (
        scored.orderBy(F.desc("_lift"), "part_a", "part_b")
        .limit(20)
        .select("part_a", "part_b", "n_orders", F.round("_lift", 6).alias("lift"))
    )


@register(
    "basket_size_histogram",
    """
    WITH b AS (
      SELECT l_orderkey, COUNT(DISTINCT l_partkey) AS n_parts FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(LEAST(n_parts, 10) AS BIGINT) AS basket_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(n_parts * (n_parts - 1) // 2) AS BIGINT) AS n_pairs
    FROM b GROUP BY basket_bucket ORDER BY basket_bucket
    """,
    note=(
        "order basket-size histogram with per-bucket C(k,2) pair volume — the cost model "
        "for copurchase_pairs' row-local expansion (pair fan-out is basket-bounded, and this "
        "is the readout that proves the bound on a given corpus)"
    ),
)
def basket_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of distinct parts per order, with each bucket's
    total C(k,2) pair volume — the planning input for the market-basket
    expansion: pair fan-out is Σ C(k,2), and this query measures it
    before you run it.  Scale plan: one (orderkey) partial-agg'd
    shuffle (the distinct count is per-order, co-keyed), then an
    11-value-key aggregate; all integer."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    b = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_partkey").alias("n_parts")
    )
    return (
        b.groupBy(F.least(F.col("n_parts"), F.lit(10)).cast("long").alias("basket_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.expr("n_parts * (n_parts - 1) DIV 2")).cast("long").alias("n_pairs"),
        )
        .orderBy("basket_bucket")
    )

"""TPC-H-shaped analytical queries (SURVEY §2.4/§2.5 composition patterns).

Split from the original single-file registry (round 4) — behavior-
identical; REGISTRY names, oracles, and notes are unchanged.  Definition
order within this module preserves the original file order (module-level
re-registrations must follow their originals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from hadoop_20_spark.functions import tokens as _fn_tokens  # noqa: F401
from hadoop_20_spark.operators import (  # noqa: F401
    aggregate as agg_ops,
    dedup,
    joins,
    rowops,
    setops,
    similarity,
    sort as sort_ops,
    text as text_ops,
)
from hadoop_20_spark.operators.aggregate import (  # noqa: F401
    exact_avg_double,
    exact_sum_double,
)
from hadoop_20_spark.queries._base import (  # noqa: F401
    _TOKENS,
    REGISTRY,
    Query,
    _sql_md5_long,
    _t,
    register,
)


# ---------------------------------------------------------------------------
# §2.5 aggregation
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    note="flagship: TPC-H Q1 shape = the reference's canonical scan→filter→combine→reduce→sort (WordCount/Aggregate-framework pipeline)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum_double("l_quantity").alias("sum_qty"),
            exact_sum_double("l_extendedprice").alias("sum_base_price"),
            exact_sum_double(disc_price).alias("sum_disc_price"),
            exact_sum_double(charge).alias("sum_charge"),
            exact_avg_double("l_quantity").alias("avg_qty"),
            exact_avg_double("l_extendedprice").alias("avg_price"),
            exact_avg_double("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    note="TPC-H Q3 shape: selective dim filter -> star join -> agg -> top-k (TakeOrdered)",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(joins.broadcast_if_small(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            exact_sum_double(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    note="TPC-H Q6 shape: pure scan-filter-agg; all four predicates push to the parquet scan",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_sum_double(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# generators / sampling / scalar surface
# ---------------------------------------------------------------------------

@register(
    "q5_local_supplier",
    """
    SELECT r_name, n_name,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY r_name, n_name
    ORDER BY revenue DESC, n_name
    """,
    note="TPC-H Q5 shape: 6-way snowflake join (local-supplier condition) + agg; dims broadcast, fact never shuffles twice",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join with the Q5 'local supplier' twist (supplier in the
    customer's nation).  Scale plan: region/nation (fixed cardinality:
    5 and 25 rows) are broadcast unconditionally — the DistributedCache
    idiom (core/filecache/DistributedCache.java) is for *small* files.
    customer/supplier grow with SF, so they get a size-gated hint only
    (under the autoBroadcastJoinThreshold); above it Catalyst + AQE pick
    the strategy from stats instead of aborting at the 8 GB broadcast
    cap.  The only guaranteed shuffle is lineitem⋈orders on orderkey,
    then a partial-agg'd groupBy on the tiny (r_name, n_name) key space."""
    region = F.broadcast(_t(spark, sf_dir, "region"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    customer = joins.broadcast_if_small(_t(spark, sf_dir, "customer"))
    supplier = joins.broadcast_if_small(_t(spark, sf_dir, "supplier"))
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .join(
            supplier,
            (F.col("l_suppkey") == supplier.s_suppkey)
            & (supplier.s_nationkey == customer.c_nationkey),
        )
        .join(nation, F.col("c_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            exact_sum_double(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q18_large_orders",
    """
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS total_qty
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN customer ON c_custkey = o_custkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 300)
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    """,
    note="TPC-H Q18 shape: groupBy-HAVING semi-join (left_semi on an aggregated subquery) + re-aggregation",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-quantity orders: the HAVING subquery runs as an aggregation
    whose (small) result semi-joins the fact — the reference's two-job
    chain (aggregate job feeding a filter job via DistributedCache)
    collapsed into one plan with a broadcast left-semi join."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = joins.broadcast_if_small(_t(spark, sf_dir, "customer"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    # `big` is a derived aggregate — its pre-runtime size estimate is
    # unreliable, so no hint: AQE broadcasts it at runtime when small.
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(exact_sum_double("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


@register(
    "q19_disjunctive_join",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 5 AND 40)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 50 AND l_quantity BETWEEN 10 AND 60)
    """,
    note="TPC-H Q19 shape: disjunctive (OR-of-conjunctions) predicates spanning both join sides",
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate across both sides of an equi-join — Catalyst
    keeps the equi-key join and evaluates the residual disjunction post-
    probe; per-side conjunct members (brand/size lists) are still pushed
    to the scans as derived filters."""
    li = _t(spark, sf_dir, "lineitem")
    part = joins.broadcast_if_small(_t(spark, sf_dir, "part"))
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 30) & q.between(5, 40))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(10, 50) & q.between(10, 60))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            exact_sum_double(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "latest_order_per_customer",
    """
    SELECT c_custkey, c_name,
           (SELECT MAX(o_orderdate) FROM orders WHERE o_custkey = c_custkey) AS last_order_date,
           (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
    FROM customer
    ORDER BY c_custkey
    """,
    note="correlated scalar subqueries (TPC-H Q2/Q17 shape) — Catalyst decorrelates to aggregate + join",
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries, run through Spark SQL so Catalyst's
    DecorrelateInnerQuery rewrites them into one aggregate joined back —
    the plan the reference would hand-build as an aggregate job + a
    map-side join (DistributedCache)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("cust_q2")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("ord_q2")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT MAX(o_orderdate) FROM ord_q2 WHERE o_custkey = c_custkey) AS last_order_date,
               (SELECT COUNT(*) FROM ord_q2 WHERE o_custkey = c_custkey) AS n_orders
        FROM cust_q2
        ORDER BY c_custkey
        """
    )


@register(
    "q11_value_concentration",
    """
    SELECT l_suppkey,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
           > (SELECT 1.05 * SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                     / COUNT(DISTINCT l_suppkey) FROM lineitem)
    ORDER BY revenue DESC, l_suppkey
    """,
    note="TPC-H Q11 shape: HAVING against a global scalar subquery (above-average revenue share)",
)
def q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_q11")
    return spark.sql(
        """
        SELECT l_suppkey,
               CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS revenue
        FROM li_q11
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
               > (SELECT 1.05 * SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                         / COUNT(DISTINCT l_suppkey) FROM li_q11)
        ORDER BY revenue DESC, l_suppkey
        """
    )


@register(
    "q21_sole_blame",
    """
    SELECT l1.l_suppkey, COUNT(DISTINCT l1.l_orderkey) AS n_orders
    FROM lineitem l1
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY l1.l_suppkey
    ORDER BY n_orders DESC, l_suppkey
    LIMIT 20
    """,
    note="TPC-H Q21 shape: EXISTS + NOT EXISTS correlated subqueries (semi + anti join after decorrelation)",
)
def q21_sole_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Q21 pattern: multi-supplier orders where exactly one supplier
    has returned ('R') lines — EXISTS decorrelates to a left-semi join,
    NOT EXISTS to a left-anti join, both on l_orderkey."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_q21")
    return spark.sql(
        """
        SELECT l1.l_suppkey, COUNT(DISTINCT l1.l_orderkey) AS n_orders
        FROM li_q21 l1
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM li_q21 l2
                      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM li_q21 l3
                          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY l1.l_suppkey
        ORDER BY n_orders DESC, l_suppkey
        LIMIT 20
        """
    )


@register(
    "q7_nation_volume",
    """
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS volume,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = c_nationkey
    JOIN nation n2 ON n2.n_nationkey = s_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
    GROUP BY n1.n_name, n2.n_name
    ORDER BY volume DESC, cust_nation, supp_nation
    LIMIT 30
    """,
    note="TPC-H Q7 shape: cross-nation trade volume — the same dim joined twice under two aliases",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation joined TWICE under different roles (customer side and
    supplier side) — the alias-disambiguation pattern the reference
    expressed as two tagged map inputs (MultipleInputs) feeding one
    reducer."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = joins.broadcast_if_small(_t(spark, sf_dir, "customer"))
    supp = joins.broadcast_if_small(_t(spark, sf_dir, "supplier"))
    nation = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("cust_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(n1, F.col("c_nationkey") == F.col("nk1"))
        .join(n2, F.col("s_nationkey") == F.col("nk2"))
        .filter(F.col("nk1") != F.col("nk2"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            exact_sum_double(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("volume").desc(), "cust_nation", "supp_nation")
        .limit(30)
    )


@register(
    "q22_dormant_customers",
    """
    SELECT SUBSTR(c_name, 10, 2) AS cntry_code, COUNT(*) AS n_custs,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY SUBSTR(c_name, 10, 2)
    ORDER BY cntry_code
    """,
    note="TPC-H Q22 shape: above-average balance + NOT EXISTS (anti join) — high-balance customers with no orders since 2000",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-balance customers with no recent orders: a global scalar
    aggregate feeds the filter, NOT EXISTS decorrelates to a broadcast
    left-anti join (orders' key set is the small side after
    projection).  NOT EXISTS rather than NOT IN (subquery) in BOTH the
    Spark SQL and the oracle: NOT IN's three-valued null semantics would
    silently empty the result if o_custkey ever contained a NULL, and
    the two engines could diverge on when they notice (same fix as q16,
    round-4 ADVICE)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("cust_q22")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("ord_q22")
    return spark.sql(
        """
        SELECT SUBSTR(c_name, 10, 2) AS cntry_code, COUNT(*) AS n_custs,
               CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS total_bal
        FROM cust_q22
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM cust_q22 WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM ord_q22
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY SUBSTR(c_name, 10, 2)
        ORDER BY cntry_code
        """
    )


@register(
    "q13_order_count_distribution",
    """
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS n_custs
    FROM per_cust GROUP BY c_count
    ORDER BY n_custs DESC, c_count DESC
    """,
    note="TPC-H Q13 shape: customer order-count distribution — LEFT join keeps zero-order customers, COUNT(col) skips their nulls",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of orders-per-customer: the left outer join keeps
    customers with no orders and COUNT(o_orderkey) counts them as 0
    (COUNT(col) null semantics), then the second aggregation histograms
    the counts — the double-aggregation shape the reference chained as
    two jobs."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_custs"))
        .orderBy(F.col("n_custs").desc(), F.col("c_count").desc())
    )


@register(
    "q7_volume_shipping",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    note="TPC-H Q7 shape: bidirectional nation-pair trade volume by year — six-table join with a cross-side disjunction",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(joins.broadcast_if_small(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(joins.broadcast_if_small(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            exact_sum_double(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q9_product_profit",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - 0.1 * p.p_retailprice * l.l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE contains(p.p_name, 'a')
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    note="TPC-H Q9 shape: profit by supplier nation x order year — five-table join, substring part filter, decimal-exact profit expression (cost proxied by 10% of retail price; no partsupp table in the fixture)",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.contains("p_name", F.lit("a")))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(joins.broadcast_if_small(p), li.l_partkey == p.p_partkey)
        .join(joins.broadcast_if_small(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(exact_sum_double(profit).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --- additional TPC-H query shapes (round 2 widening) -----------------------


@register(
    "q4_order_priority",
    """
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    ORDER BY o_orderpriority
    """,
    note="TPC-H Q4 shape: EXISTS decorrelated to a left-semi join, then priority rollup",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join on orderkey: orders never duplicate no
    matter how many qualifying lines exist (the semantics a plain inner
    join would break)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li_r = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li_r, o.o_orderkey == li_r.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           c.c_acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    note="TPC-H Q10 shape: returned-item revenue per customer — filtered star join, agg, top-20",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(joins.broadcast_if_small(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(
            exact_sum_double(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    """
    SELECT CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))
                         ELSE CAST(0 AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) AS promo_revenue,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS total_revenue,
           (ROUND(100.0 * CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))
                         ELSE CAST(0 AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE), 4) + 0) AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    note="TPC-H Q14 shape: conditional (CASE) aggregation ratio over a broadcast part join",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    zero = F.lit(0).cast("decimal(28,6)")
    joined = li.join(joins.broadcast_if_small(p), li.l_partkey == p.p_partkey)
    out = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
        .cast("double")
        .alias("promo_revenue"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )
    return out.select(
        "promo_revenue",
        "total_revenue",
        F.round(
            100.0 * F.col("promo_revenue") / F.col("total_revenue"), 4
        ).alias("promo_pct"),
    )


@register(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
    note="TPC-H Q15 shape: revenue view + scalar MAX subquery (safe to compare: decimal-exact revenue)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery via broadcast of a 1-row aggregate — the equality
    on revenue is engine-safe because the sum goes through DECIMAL."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        exact_sum_double(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_mx"))
        .join(joins.broadcast_if_small(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity",
    """
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.2 * (CAST(CAST(SUM(CAST(l2.l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / COUNT(*))
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    note="TPC-H Q17 shape: correlated per-part AVG subquery, decorrelated to an aggregate + join (decimal-exact mean)",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar AVG, decorrelated WITH the dim filter pushed
    into the aggregate's input — the rewrite Catalyst's decorrelation
    misses: the brand predicate selects ~1/25 of parts, and since the
    correlated subquery averages only rows of the OUTER row's partkey,
    restricting the aggregate to brand-part lineitems is semantically
    exact while cutting the per-partkey aggregate and both fact
    exchanges ~25× (the sf10 probe measured the naive decorrelation at
    96 s — two full 60M-row exchanges; this shape touches ~2.4M rows
    after the broadcast semi-join).  At 100 TB the same plan holds: the
    filtered part keys broadcast, lineitem is pruned by the runtime
    bloom filter before its one partkey shuffle.  The mean goes through
    DECIMAL so the `<` threshold compares identically in both engines;
    the op order (sum → double cast → /count → *0.2) matches the
    oracle's spelling exactly."""
    parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_b = li.join(
        F.broadcast(parts), li.l_partkey == F.col("p_partkey")
    ).drop("p_partkey")
    thr = li_b.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(28,6)"))
                .cast("string")
                .cast("double")
                / F.count("l_quantity")
            )
        ).alias("_thr")
    )
    # thr is unhinted: AQE broadcasts it here (~80k rows) and falls
    # back to a co-keyed shuffle at corpora where brand-parts outgrow
    # the threshold — both correct, the stats decide
    return (
        li_b.join(thr, "l_partkey")
        .filter(F.col("l_quantity") < F.col("_thr"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(28,6)"))
                .cast("string")
                .cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q19_disjunctive_filter",
    """
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
    """,
    note="TPC-H Q19 shape: OR-of-ANDs across both join sides — tests disjunctive predicate split/pushdown",
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive mixed-side predicate: Catalyst extracts the
    common-side conjuncts (brand/size only touch part, quantity only
    lineitem) so each scan still gets a pushed filter, and the residual
    OR evaluates post-join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(joins.broadcast_if_small(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        exact_sum_double(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- round-4 widening: the five remaining TPC-H query shapes ----------------
# (q2, q8, q12, q16, q20 — completes the 22-query battery.  The fixture has
# no partsupp table and no l_shipmode/l_commitdate columns, so q2/q16/q20
# derive the part-supplier relation from lineitem and q12 buckets by
# l_linestatus with a shipping-delay lateness predicate; the *query shapes*
# — correlated-min, CASE-share ratio, two-level distinct-count with
# exclusion, nested dominance subquery — are preserved.)


@register(
    "q2_min_cost_supplier",
    """
    WITH supply AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    regional AS (
      SELECT sp.l_partkey, sp.l_suppkey, sp.supply_cost,
             s.s_name, s.s_acctbal, n.n_name
      FROM supply sp
      JOIN supplier s ON s.s_suppkey = sp.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT rg.s_acctbal, rg.s_name, rg.n_name, p.p_partkey, p.p_type, rg.supply_cost
    FROM part p
    JOIN regional rg ON rg.l_partkey = p.p_partkey
    WHERE p.p_size = 15
      AND rg.supply_cost = (SELECT MIN(r2.supply_cost) FROM regional r2
                            WHERE r2.l_partkey = p.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    note="TPC-H Q2 shape: min-cost regional supplier per part — correlated MIN decorrelated to agg+join (supply relation derived from lineitem; no partsupp in fixture)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's correlated-MIN, hand-decorrelated as a window: the per-part
    regional minimum is MIN() OVER (PARTITION BY partkey) instead of an
    aggregate joined back — one exchange on partkey and no second join
    (an agg+join form makes Catalyst fold the equality filter into a
    compound (cost, partkey) SortMergeJoin key and shuffle regional
    twice; measured in PLANS.md history).  Scale plan: `supply` is one
    lineitem shuffle on (partkey, suppkey) with map-side partial MIN;
    supplier/nation/region prune to one region BEFORE the window, so
    the windowed relation is ~1/5 of supply.  Double equality on the
    min is safe: both sides are the same IEEE value (MIN of identical
    divisions, never a sum)."""
    li = _t(spark, sf_dir, "lineitem")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    s = joins.broadcast_if_small(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    regional = (
        supply.join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "l_suppkey", "supply_cost", "s_name", "s_acctbal", "n_name")
    )
    from pyspark.sql import Window

    w_min = F.min("supply_cost").over(Window.partitionBy("l_partkey"))
    p = joins.broadcast_if_small(
        _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    )
    return (
        regional.withColumn("_min_cost", w_min)
        .filter(F.col("supply_cost") == F.col("_min_cost"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q8_market_share",
    """
    WITH vols AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_items
    FROM vols GROUP BY o_year ORDER BY o_year
    """,
    note="TPC-H Q8 shape: national market share by year — 8-table snowflake + CASE-sum ratio (decimal-exact numerator/denominator)",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share ratio: both sums aggregate in DECIMAL and only the
    final division happens in doubles, so the ratio is bit-identical
    across engines.  Scale plan: all five dims broadcast (size-gated),
    lineitem⋈orders is the only fact shuffle, and the per-year group
    key space is tiny (partial agg collapses everything map-side)."""
    li = _t(spark, sf_dir, "lineitem")
    p = joins.broadcast_if_small(
        _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    c = joins.broadcast_if_small(_t(spark, sf_dir, "customer"))
    s = joins.broadcast_if_small(_t(spark, sf_dir, "supplier"))
    nation = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("rk1")))
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation")))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    zero = F.lit(0).cast("decimal(28,6)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(n1, F.col("c_nationkey") == F.col("nk1"))
        .join(r, F.col("rk1") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n2, F.col("s_nationkey") == F.col("nk2"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(zero)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_year")
    )


@register(
    "q12_late_shipments",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    ORDER BY l_linestatus
    """,
    note="TPC-H Q12 shape: priority split of late shipments — cross-table lateness predicate + CASE counts (l_linestatus buckets; fixture has no l_shipmode/l_commitdate)",
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's CASE-count split over a lateness predicate that spans both
    join sides (shipdate vs orderdate+60d), so it evaluates post-probe
    while the per-side date-range conjunct still pushes to the lineitem
    scan.  Timestamp arithmetic is exact ms integer math in both
    engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q16_supplier_part_counts",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_acctbal < 0 AND s.s_suppkey = ps.l_suppkey)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    note="TPC-H Q16 shape: distinct supplier count per part attribute with NOT-IN exclusion (part-supplier relation derived from lineitem; negative-balance suppliers stand in for complaint suppliers)",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distinct: first DISTINCT (partkey, suppkey) pairs
    (one lineitem shuffle), then COUNT(DISTINCT suppkey) per part
    attribute triple (Spark expands to a partial-distinct two-phase
    plan).  The NOT IN exclusion is a broadcast left-anti join against
    the (tiny, projected) bad-supplier key set — never a shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = joins.broadcast_if_small(
        _t(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
    )
    return (
        ps.join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_dominant_supplier",
    """
    WITH qty AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(28,6))) AS pq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    tot AS (SELECT l_partkey, SUM(pq) AS tq FROM qty GROUP BY l_partkey)
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT q.l_suppkey FROM qty q
        JOIN tot t ON t.l_partkey = q.l_partkey
        WHERE 2 * q.pq > t.tq
          AND q.l_partkey IN (SELECT p_partkey FROM part WHERE contains(p_name, 'e')))
    ORDER BY s_suppkey
    """,
    note="TPC-H Q20 shape: suppliers dominating a part's 1997 volume — nested IN subqueries over a derived availability relation (lineitem stands in for partsupp availqty; dominance = >half the part's shipped quantity, decimal-exact via 2*pq > tq)",
)
def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's nested-IN chain, hand-decorrelated: per-(part,supplier)
    and per-part quantity aggregates share one partkey partitioning
    (the second agg re-aggregates the first — no new shuffle of
    lineitem), the part-name filter semi-joins the small projected key
    set, and the final IN is a semi join into the supplier dim.  The
    dominance comparison is integer-exact: 2*pq > tq in DECIMAL, never
    a double ratio."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    qty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("pq")
    )
    tot = qty.groupBy("l_partkey").agg(F.sum("pq").alias("tq"))
    named_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.contains("p_name", F.lit("e")))
        .select("p_partkey")
    )
    dominant = (
        qty.join(tot, ["l_partkey"])
        .filter(2 * F.col("pq") > F.col("tq"))
        .join(named_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(
        _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    )
    return (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )

"""Query registry — the driver-facing inventory (SURVEY §2 coverage).

Each entry pairs a Spark implementation (built from the operator library)
with the equivalent DuckDB oracle SQL.  Column names are aliased
identically on both sides (the driver's compare sorts columns by name and
hashes values).  Determinism rules (SURVEY §7.4):

- double SUMs aggregate in DECIMAL and cast back (order-independent);
- top-k / ranked queries always carry an id tie-breaker;
- all hashing is md5-based (engine-portable), never murmur3/xxhash;
- floats that are *outputs of float arithmetic* are rounded in-query.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_spark.catalog import load_table
from hadoop_20_spark.operators import (
    aggregate as agg_ops,
    dedup,
    joins,
    rowops,
    setops,
    similarity,
    sort as sort_ops,
    text as text_ops,
)
from hadoop_20_spark.functions import tokens as _fn_tokens
from hadoop_20_spark.operators.aggregate import exact_avg_double, exact_sum_double


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check
    note: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, note: str = ""):
    def deco(fn):
        REGISTRY[name] = Query(fn=fn, oracle=oracle, note=note)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# SQL fragment: engine-portable 60-bit md5 hash (functions.md5_long analog)
def _sql_md5_long(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


_TOKENS = r"list_filter(regexp_split_to_array({col}, '\s+'), t -> t <> '')"


# ---------------------------------------------------------------------------
# §2.5 aggregation
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
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
    "agg_descriptors",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS longvaluesum_l_linenumber,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS doublevaluesum_l_extendedprice,
           CAST(MAX(l_orderkey) AS BIGINT) AS longvaluemax_l_orderkey,
           CAST(MIN(l_orderkey) AS BIGINT) AS longvaluemin_l_orderkey,
           MAX(l_linestatus) AS stringvaluemax_l_linestatus,
           MIN(l_linestatus) AS stringvaluemin_l_linestatus,
           COUNT(DISTINCT l_suppkey) AS uniqvaluecount_l_suppkey,
           COUNT(l_orderkey) AS count_l_orderkey
    FROM lineitem GROUP BY l_returnflag
    """,
    note="mapred/lib/aggregate descriptor DSL: ValueAggregatorJob with 8 descriptors",
)
def agg_descriptors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg_ops.aggregate(
        _t(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        [
            "LongValueSum:l_linenumber",
            "DoubleValueSum:l_extendedprice",
            "LongValueMax:l_orderkey",
            "LongValueMin:l_orderkey",
            "StringValueMax:l_linestatus",
            "StringValueMin:l_linestatus",
            "UniqValueCount:l_suppkey",
            "Count:l_orderkey",
        ],
    )


@register(
    "value_histogram",
    """
    WITH freq AS (
      SELECT o_orderpriority, o_custkey, COUNT(*) AS freq
      FROM orders GROUP BY o_orderpriority, o_custkey
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_distinct_values,
           CAST(MIN(freq) AS BIGINT) AS min_freq,
           ROUND(quantile_cont(freq, 0.5), 6) AS median_freq,
           CAST(MAX(freq) AS BIGINT) AS max_freq,
           ROUND(CAST(SUM(freq) AS DOUBLE) / COUNT(*), 6) AS avg_freq,
           ROUND(sqrt((CAST(SUM(freq*freq) AS DOUBLE) - CAST(SUM(freq) AS DOUBLE) * SUM(freq) / COUNT(*)) / COUNT(*)), 6) AS stddev_freq
    FROM freq GROUP BY o_orderpriority
    """,
    note="mapred/lib/aggregate/ValueHistogram.java as scalable two-level agg",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = agg_ops.value_histogram(
        _t(spark, sf_dir, "orders"), "o_orderpriority", "o_custkey"
    )
    return out.withColumn("median_freq", F.col("median_freq").cast("double"))


@register(
    "uniq_value_count",
    """
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS uniq_custkeys,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    note="UniqValueCount.java exact mode",
)
def uniq_value_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("uniq_custkeys"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    note="grouping-sets extension (absent in reference; free via Catalyst)",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum_double("l_quantity").alias("sum_qty"),
        )
    )


@register(
    "pivot_agg",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END AS DECIMAL(28,6))) AS DOUBLE) AS O,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END AS DECIMAL(28,6))) AS DOUBLE) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
    note="pivot (extension; reference encodes this as per-key demux + per-file aggs)",
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(exact_sum_double("l_quantity"))
    )


# ---------------------------------------------------------------------------
# §2.3 row transforms
# ---------------------------------------------------------------------------

@register(
    "wordcount",
    f"""
    SELECT token, COUNT(*) AS token_count
    FROM (SELECT unnest({_TOKENS.format(col='text')}) AS token FROM documents)
    GROUP BY token
    """,
    note="ex/WordCount.java — canonical hash-agg query (TokenCountMapper + LongSumReducer combiner)",
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rowops.token_counts(_t(spark, sf_dir, "documents"), "text")


@register(
    "grep",
    """
    SELECT match, COUNT(*) AS match_count
    FROM (SELECT unnest(regexp_extract_all(text, '[a-z]+er')) AS match FROM documents)
    GROUP BY match
    ORDER BY match_count DESC, match
    """,
    note="ex/Grep.java — two chained MR jobs collapsed to one declarative plan",
)
def grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rowops.grep(_t(spark, sf_dir, "documents"), "text", "[a-z]+er")


@register(
    "field_selection",
    """
    WITH lines AS (
      SELECT concat_ws(chr(9), l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity) AS line
      FROM lineitem
    ), fields AS (SELECT string_split(line, chr(9)) AS f FROM lines)
    SELECT array_to_string(f[1:2], chr(9)) AS key,
           array_to_string(f[3:len(f)], chr(9)) AS value
    FROM fields
    """,
    note="mapred/lib/FieldSelectionMapReduce.java cut-style spec '0-1' : '2-'",
)
def field_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        F.concat_ws(
            "\t",
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
        ).alias("line")
    )
    return rowops.field_selection(li, "line", "0-1", "2-")


@register(
    "inverse_map",
    "SELECT r_name AS key, r_regionkey AS value FROM region",
    note="mapred/lib/InverseMapper.java",
)
def inverse_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rowops.inverse(
        _t(spark, sf_dir, "region"), key="r_regionkey", value="r_name"
    ).select(F.col("r_name").alias("key"), F.col("r_regionkey").alias("value"))


# ---------------------------------------------------------------------------
# §2.4 joins
# ---------------------------------------------------------------------------

@register(
    "join_star",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    note="star join: fact never moves for dim joins (broadcast = DistributedCache idiom); shuffle only lineitem⋈orders",
)
def join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            exact_sum_double(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_outer",
    """
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(28,6))), 0) AS DOUBLE) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    note="OuterJoinRecordReader semantics: customers without orders kept with empty slots",
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(28,6)")), F.lit(0)
            )
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "join_semi",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    GROUP BY c_mktsegment
    """,
    note="tagged-join keep-both idiom → left_semi (contrib/data_join)",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        joins.semi_join(c, o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    note="tagged-join only-left idiom → left_anti",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return joins.anti_join(
        c, o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    ).select("c_custkey", "c_name")


@register(
    "join_override",
    """
    WITH a AS (SELECT s_suppkey, s_name, s_acctbal FROM supplier WHERE s_suppkey % 2 = 0),
         b AS (SELECT s_suppkey, 'patched_' || s_name AS s_name, s_acctbal + 1000 AS s_acctbal
               FROM supplier WHERE s_suppkey % 3 = 0)
    SELECT COALESCE(b.s_suppkey, a.s_suppkey) AS s_suppkey,
           COALESCE(b.s_name, a.s_name) AS s_name,
           COALESCE(b.s_acctbal, a.s_acctbal) AS s_acctbal
    FROM a FULL OUTER JOIN b ON a.s_suppkey = b.s_suppkey
    """,
    note="mapred/join/OverrideRecordReader.java — rightmost source wins per key",
)
def join_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    a = s.filter(F.col("s_suppkey") % 2 == 0)
    b = s.filter(F.col("s_suppkey") % 3 == 0).select(
        "s_suppkey",
        F.concat(F.lit("patched_"), F.col("s_name")).alias("s_name"),
        (F.col("s_acctbal") + 1000).alias("s_acctbal"),
    )
    return joins.override_join([a, b], "s_suppkey")


@register(
    "join_theta",
    """
    SELECT n.n_name, r.r_name FROM nation n, region r
    WHERE n.n_regionkey <> r.r_regionkey
    """,
    note="cartesian/theta idiom (single-reducer in reference) → BroadcastNestedLoopJoin",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return joins.theta_join(
        n, r, F.col("n_regionkey") != F.col("r_regionkey")
    ).select("n_name", "r_name")


@register(
    "join_compose_dsl",
    """
    SELECT n.n_nationkey, n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    note="mapred.join.expr composition DSL: inner(nation, region)",
)
def join_compose_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("n_regionkey"), "r_name"
    )
    out = joins.compose("inner(nation, region)", {"nation": n, "region": r}, "n_regionkey")
    return out.select("n_nationkey", "n_name", "r_name")


# ---------------------------------------------------------------------------
# §2.6-2.7 sort / window / top-k / sampling
# ---------------------------------------------------------------------------

@register(
    "total_order_sort",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    note="ex/Sort.java + TotalOrderPartitioner/InputSampler → RangePartitioner orderBy; order itself asserted by validator tests",
)
def total_order_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sort_ops.total_order_sort(
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
        "l_orderkey",
        "l_linenumber",
    )


@register(
    "top_k",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    note="top-k idiom → TakeOrderedAndProject (per-partition heaps, no global sort)",
)
def top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sort_ops.top_k(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        10,
    )


@register(
    "secondary_sort",
    """
    SELECT * FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events)
    WHERE rn <= 3
    """,
    note="ex/SecondarySort.java — partition by prefix, order by composite key, first-3 per group",
)
def secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return sort_ops.top_k_per_group(
        ev.select("user_id", "event_id", "event_type", "ts"),
        ["user_id"],
        [F.col("ts"), F.col("event_id")],
        3,
    ).select("user_id", "event_id", "event_type", "rn")


@register(
    "window_running_sum",
    """
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value
    FROM events
    """,
    note="window frames (absent in reference; hand-rolled in reducers over secondary sort)",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("running_value"),
    )


@register(
    "window_lag_lead",
    """
    SELECT user_id, event_id,
           ROUND(value - COALESCE(LAG(value) OVER w, 0), 6) AS delta_prev,
           LEAD(event_type) OVER w AS next_type
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    note="lag/lead (absent in reference)",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0)), 6).alias(
            "delta_prev"
        ),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "key_field_sort",
    """
    WITH lines AS (
      SELECT concat_ws(chr(9), s_name, s_nationkey, s_acctbal) AS line FROM supplier
    ), f AS (SELECT line, string_split(line, chr(9)) AS fields FROM lines)
    SELECT line FROM f ORDER BY CAST(fields[3] AS DOUBLE) DESC, line
    """,
    note="KeyFieldBasedComparator -k3nr -k1 POSIX sort spec (-k1 with no pos2 = field 1 through end of line)",
)
def key_field_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier").select(
        F.concat_ws("\t", "s_name", "s_nationkey", "s_acctbal").alias("line")
    )
    return sort_ops.key_field_sort(s, "line", "-k3nr -k1")


@register(
    "md5_sample",
    f"""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE { _sql_md5_long("CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)") } % 10 = 0
    """,
    note="SequenceFileInputFilter.MD5Filter — deterministic 1/f sampling (engine-portable, unlike seeded random)",
)
def md5_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    key = F.concat_ws("_", F.col("l_orderkey"), F.col("l_linenumber"))
    return sort_ops.sample_percent_deterministic(li, key, 10)


# ---------------------------------------------------------------------------
# §2.8 set ops
# ---------------------------------------------------------------------------

@register(
    "set_intersect",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    note="reduce-side keep-both idiom → intersect",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return setops.intersect(o, c)


@register(
    "set_except",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    """,
    note="reduce-side only-left idiom → except/subtract",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return setops.except_(c, o)


@register(
    "set_union_distinct",
    """
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      UNION
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
    )
    """,
    note="MultipleInputs union + distinct idiom",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return setops.distinct_rows(setops.union_all(o, c))


@register(
    "distinct_pairs",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    note="distinct idiom (key=record, emit once)",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return setops.distinct_rows(
        _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# §2.9 scalar surface: json / datetime
# ---------------------------------------------------------------------------

@register(
    "json_extract_agg",
    """
    SELECT event_type,
           CAST(SUM(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    note="events.props JSON: from_json in Spark (Record I/O structured payloads analog)",
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.from_json(F.col("props"), "k INT").getField("k").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum(F.col("k").cast("long")).alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "datetime_trunc_agg",
    """
    SELECT date_trunc('month', o_orderdate) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS month_revenue
    FROM orders GROUP BY date_trunc('month', o_orderdate)
    """,
    note="date/time surface (reference keeps raw longs; ds= partition convention)",
)
def datetime_trunc_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum_double("o_totalprice").alias("month_revenue"),
        )
    )


@register(
    "sessionize",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM g
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_seq
    """,
    note="sessionization via gap detection (batch analog of session_window)",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events")
    with_flag = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)) > 1_800_000_000)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = with_flag.select(
        "user_id", F.sum("new_session").over(w2).cast("long").alias("session_seq")
    )
    return sess.groupBy("user_id", "session_seq").agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "tumbling_window_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
    note="F.window tumbling 1h (batch semantics identical to the streaming agg; streaming path in streaming/ + tests)",
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum_double("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# LLM-pipeline: dedup / text / similarity
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_md5, CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    note="exact dedup via content hash-groupBy (32-byte shuffle keys at 100 TB, not bodies)",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "minhash_signatures",
    None,  # oracle added programmatically below (16 generated columns)
    note="MinHash signatures (16 hashes, 3-shingles) — deterministic md5 family",
)
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_signatures(
        _t(spark, sf_dir, "documents"), "doc_id", "text", num_hashes=16, shingle=3
    )


def _minhash_oracle() -> str:
    from hadoop_20_spark.functions import MERSENNE31, hash_coeffs

    shingle_arr = (
        "list_transform(range(1, greatest(len(toks) - 2, 1) + 1), "
        "i -> array_to_string(toks[i:i+2], ' '))"
    )
    base = _sql_md5_long("s") + f" % {MERSENNE31}"
    cols = ",\n           ".join(
        f"list_aggregate(list_transform(hs, h -> (h * {a} + {b}) % {MERSENNE31}),"
        f" 'min') AS mh{i}"
        for i, (a, b) in enumerate(hash_coeffs(16))
    )
    return f"""
    WITH t AS (SELECT doc_id, {_TOKENS.format(col='text')} AS toks FROM documents),
         s AS (SELECT doc_id, {shingle_arr} AS sh FROM t),
         hh AS (SELECT doc_id, list_transform(sh, s -> {base}) AS hs FROM s)
    SELECT doc_id, {cols} FROM hh
    """


REGISTRY["minhash_signatures"] = Query(
    fn=minhash_signatures_q, oracle=_minhash_oracle(), note=REGISTRY["minhash_signatures"].note
)


@register(
    "minhash_lsh_pairs",
    None,
    note="LSH band-bucket candidate pairs (16 hashes / 4 bands); rows-only check — bucket-join shape is the non-SQL part",
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_candidates(
        _t(spark, sf_dir, "documents"), "doc_id", "text", num_hashes=16, bands=4
    )


@register(
    "jaccard_pairs",
    f"""
    WITH base AS (
      SELECT doc_id AS did, unnest(list_distinct({_TOKENS.format(col='text')})) AS sh
      FROM documents
    ), sizes AS (SELECT did, COUNT(*) AS sz FROM base GROUP BY did),
    common AS (
      SELECT a.did AS id_a, b.did AS id_b, COUNT(*) AS n_common
      FROM base a JOIN base b ON a.sh = b.sh AND a.did < b.did
      GROUP BY a.did, b.did
    )
    SELECT id_a, id_b,
           ROUND(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.did = id_a
    JOIN sizes sb ON sb.did = id_b
    WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.5
    """,
    note="exact token-set Jaccard ≥0.5 via explode+self-join (small-corpus escape hatch — the operator refuses this form without an explicit flag)",
)
def jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        threshold=0.5,
        shingle=1,
        allow_full_self_join=True,
    )


@register(
    "jaccard_pairs_pruned",
    f"""
    WITH base AS (
      SELECT doc_id AS did, unnest(list_distinct({_TOKENS.format(col='text')})) AS sh
      FROM documents
    ), sizes AS (SELECT did, COUNT(*) AS sz FROM base GROUP BY did),
    common AS (
      SELECT a.did AS id_a, b.did AS id_b, COUNT(*) AS n_common
      FROM base a JOIN base b ON a.sh = b.sh AND a.did < b.did
      GROUP BY a.did, b.did
    )
    SELECT id_a, id_b,
           ROUND(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.did = id_a
    JOIN sizes sb ON sb.did = id_b
    WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.5
    """,
    note="prefix-filtered Jaccard join (PPJoin-style frequency-ordered pruning) + exact set-intersect verify — oracle is the UNPRUNED brute force; hash-match proves the pruned plan is lossless",
)
def jaccard_pairs_pruned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-default form of ``jaccard_pairs``: prefix filtering orders
    shingles rarest-first by document frequency and joins only each
    doc's ``s - ceil(t*s) + 1`` rarest shingles — a pair with J ≥ t
    provably shares a prefix shingle, so no qualifying pair is lost,
    while stopword shingles (the quadratic fan-out) never enter the
    join.  Candidates are verified over FULL shingle sets.  The oracle
    is the unpruned all-pairs SQL: green means the pruned plan
    reproduces the brute-force result exactly."""
    return dedup.jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        threshold=0.5,
        shingle=1,
    )


@register(
    "simhash_fingerprints",
    None,  # generated below
    note="16-bit frequency-weighted SimHash, pure expressions",
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_table(_t(spark, sf_dir, "documents"), "doc_id", "text", bits=16)


def _simhash_oracle() -> str:
    h = _sql_md5_long("x")
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, h -> (h >> {b}) & 1 = 1)) > len(hs) "
        f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(16)
    )
    return f"""
    WITH t AS (SELECT doc_id, {_TOKENS.format(col='text')} AS toks FROM documents),
         hh AS (SELECT doc_id, list_transform(toks, x -> {h}) AS hs FROM t)
    SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM hh
    """


REGISTRY["simhash_fingerprints"] = Query(
    fn=simhash_fingerprints, oracle=_simhash_oracle(), note=REGISTRY["simhash_fingerprints"].note
)


@register(
    "text_stats",
    None,  # generated below
    note="per-doc text analysis: tokens/chars/diversity/stopwords/quality/lang/fingerprint",
)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.text_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _text_stats_oracle() -> str:
    sw_list = ", ".join(f"'{w}'" for w in text_ops.STOPWORDS)
    fp_hash = _sql_md5_long("array_to_string(toks[i:i+7], ' ')")
    return f"""
    WITH t AS (SELECT doc_id, text, {_TOKENS.format(col='text')} AS toks FROM documents),
         m AS (
      SELECT doc_id, text, toks, len(toks) AS n_tokens,
             len(list_filter(toks, x -> list_contains([{sw_list}], x))) AS n_stop,
             len(list_distinct(toks)) AS n_distinct,
             list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS total_len
      FROM t)
    SELECT doc_id,
           n_tokens,
           length(text) AS n_chars_measured,
           ROUND(CASE WHEN n_tokens > 0 THEN CAST(total_len AS DOUBLE) / n_tokens ELSE 0.0 END, 6) AS avg_token_len,
           ROUND(CASE WHEN n_tokens > 0 THEN CAST(n_distinct AS DOUBLE) / n_tokens ELSE 1.0 END, 6) AS distinct_ratio,
           ROUND(CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END, 6) AS stopword_ratio,
           ROUND((CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.25 END) * 0.4
                 + (CASE WHEN n_tokens > 0 THEN CAST(n_distinct AS DOUBLE) / n_tokens ELSE 1.0 END) * 0.3
                 + (CASE WHEN (CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END)
                         BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.5 END) * 0.3, 6) AS quality,
           CASE WHEN (CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END) >= 0.05
                THEN 'en' ELSE 'unknown' END AS lang_pred,
           list_aggregate(list_transform(range(1, greatest(n_tokens - 7, 1) + 1),
                          i -> {fp_hash}), 'min') AS fingerprint
    FROM m
    """


REGISTRY["text_stats"] = Query(
    fn=text_stats_q, oracle=_text_stats_oracle(), note=REGISTRY["text_stats"].note
)


@register(
    "embedding_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         scored AS (
      SELECT query_id, neighbor_id,
             ROUND(
               list_aggregate(list_transform(range(1, 65),
                   i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)), 'sum')
               / (sqrt(list_aggregate(list_transform(range(1, 65),
                   i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, 65),
                   i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)), 'sum'))), 4) AS cosine_sim
      FROM c, q WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
    note="brute-force cosine top-k (queries broadcast = DistributedCache pattern); LSH variant = embedding_topk_lsh",
)
def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "embedding_topk_lsh",
    None,
    note="SRP-LSH bucketed ANN (4 planes × 3 tables) — approximate; rows-only check by design",
)
def embedding_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


# ---------------------------------------------------------------------------
# classic query shapes (TPC-H Q3/Q6 analogs)
# ---------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
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
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
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
    "teragen_sorted",
    """
    WITH g AS (
      SELECT i AS id,
             substr(md5('tera_' || CAST(i AS VARCHAR)), 1, 10) AS key
      FROM range(10000) t(i)
    )
    SELECT id, key FROM g ORDER BY key, id
    """,
    note="TeraGen + TeraSort: md5-deterministic 100-byte records (identical at any parallelism), globally sorted",
)
def teragen_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_20_spark import sources

    return (
        sources.teragen(spark, 10000)
        .select("id", "key")
        .orderBy("key", "id")
    )


@register(
    "interval_sample",
    """
    SELECT l_orderkey, l_linenumber FROM (
      SELECT l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
      FROM lineitem)
    WHERE rn % 100 = 1
    """,
    note="InputSampler.IntervalSampler: every k-th record in key order",
)
def interval_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.orderBy("l_orderkey", "l_linenumber")
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") % 100 == 1)
        .drop("rn")
    )


@register(
    "scalar_functions",
    """
    SELECT n_nationkey,
           upper(n_name) AS uname,
           substr(n_name, 1, 3) AS prefix,
           concat_ws('-', n_name, CAST(n_regionkey AS VARCHAR)) AS tagged,
           length(n_name) AS name_len,
           strpos(n_name, 'A') AS a_pos,
           replace(n_name, '_', ' ') AS spaced,
           translate(n_name, 'AEIOU', 'aeiou') AS lowered_vowels,
           md5(n_name) AS name_md5,
           CAST(pow(n_regionkey + 1, 2) AS DOUBLE) AS region_sq
    FROM nation
    """,
    note="§2.9 scalar surface showcase (StringUtils/Text/MD5Hash analogs)",
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.upper("n_name").alias("uname"),
        F.substring("n_name", 1, 3).alias("prefix"),
        F.concat_ws("-", "n_name", F.col("n_regionkey").cast("string")).alias("tagged"),
        F.length("n_name").alias("name_len"),
        F.instr(F.col("n_name"), "A").alias("a_pos"),
        F.regexp_replace("n_name", "_", " ").alias("spaced"),
        F.translate(F.col("n_name"), "AEIOU", "aeiou").alias("lowered_vowels"),
        F.md5(F.col("n_name")).alias("name_md5"),
        F.pow(F.col("n_regionkey") + 1, 2).alias("region_sq"),
    )


@register(
    "nested_higher_order",
    """
    WITH t AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(list_filter(toks, x -> length(x) >= 6)) AS n_long,
           CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT) AS total_chars,
           array_to_string(list_transform(toks[1:3], x -> upper(x)), ' ') AS head_upper
    FROM t
    """,
    note="§2.9 array/higher-order surface: transform/filter/aggregate over arrays (ArrayWritable analog, upgraded)",
)
def nested_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_20_spark.functions import tokens

    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) >= 6)).alias("n_long"),
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
        .cast("long")
        .alias("total_chars"),
        F.array_join(
            F.transform(F.slice(toks, 1, 3), lambda x: F.upper(x)), " "
        ).alias("head_upper"),
    )


@register(
    "approx_distinct",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
    note="UniqValueCount capped mode -> approx_count_distinct (HLL); engines' sketches differ, so the checkable contract is the estimate's 5%-of-exact tolerance (deterministic per dataset) plus the exact count",
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("_approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                / F.col("exact_parts")
                <= 0.05
            ).alias("within_tol"),
        )
    )


# ---------------------------------------------------------------------------
# join extensions: as-of / range (absent in reference; SURVEY §2.4 flags)
# ---------------------------------------------------------------------------

@register(
    "join_asof",
    """
    WITH purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         signups   AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup')
    SELECT p.event_id, p.user_id, s.event_id AS signup_event_id
    FROM purchases p ASOF LEFT JOIN signups s
      ON p.user_id = s.user_id AND s.ts <= p.ts
    """,
    note="as-of join via the scalable union+window trick (one shuffle+sort, linear); oracle = DuckDB native ASOF JOIN",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    out = joins.as_of_join(purchases, signups, "user_id", "ts", "ts")
    return out.select(
        "event_id", "user_id", F.col("event_id_r").alias("signup_event_id")
    )


@register(
    "join_range",
    """
    SELECT o.o_orderpriority, COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderpriority
    """,
    note="equi+range join: Catalyst plans the equi part, range predicate filters post-join",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    out = joins.range_join(
        li,
        o.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_orderpriority"),
        "l_orderkey",
        F.expr("l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAYS"),
    )
    return out.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        exact_sum_double("l_extendedprice").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# window analytics / quantiles / cube
# ---------------------------------------------------------------------------

@register(
    "window_analytics",
    """
    SELECT o_custkey, o_orderkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           FIRST_VALUE(o_orderkey) OVER w AS top_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    note="full ranking-function surface (reference hand-rolled these in reducers over secondary sort)",
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("top_order"),
    )


@register(
    "quantiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS q25,
           quantile_cont(l_extendedprice, 0.5) AS q50,
           quantile_cont(l_extendedprice, 0.75) AS q75
    FROM lineitem GROUP BY l_returnflag
    """,
    note="exact interpolated percentiles (InputSampler spirit; approx variant = percentile_approx for 100 TB)",
)
def quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.25).alias("q25"),
        F.percentile("l_extendedprice", 0.5).alias("q50"),
        F.percentile("l_extendedprice", 0.75).alias("q75"),
    )


@register(
    "cube_agg",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    note="cube grouping sets (free via Catalyst; absent in reference)",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "grouped_reduce_gap",
    """
    WITH g AS (
      SELECT user_id,
             (epoch_us(CAST(ts AS TIMESTAMP))
              - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)) / 1000000.0 AS gap_s
      FROM events
    )
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(COALESCE(MAX(gap_s), 0.0), 6) AS max_gap_s
    FROM g GROUP BY user_id
    """,
    note="Reducer.reduce over sorted groups via applyInPandas (grouped_reduce): order-dependent state in pandas",
)
def grouped_reduce_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_20_spark.operators import udx

    return udx.longest_gap_per_user(_t(spark, sf_dir, "events"))


@register(
    "union_hetero",
    """
    SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
           'customer' AS kind, c_mktsegment AS segment
    FROM customer
    UNION ALL
    SELECT s_suppkey AS id, s_name AS name, s_acctbal AS acctbal,
           'supplier' AS kind, NULL AS segment
    FROM supplier
    """,
    note="MultipleInputs/DelegatingMapper: heterogeneous sources unioned by name with missing columns",
)
def union_hetero(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
        F.col("c_mktsegment").alias("segment"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return setops.union_all(c, s, allow_missing=True)


# ---------------------------------------------------------------------------
# more LLM-pipeline entries
# ---------------------------------------------------------------------------

@register(
    "embedding_near_dups",
    """
    WITH v AS (SELECT vec_id, embedding FROM embeddings),
         pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(
               list_aggregate(list_transform(range(1, 65),
                   i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')
               / (sqrt(list_aggregate(list_transform(range(1, 65),
                   i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, 65),
                   i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum'))), 4) AS cosine_sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine_sim FROM pairs WHERE cosine_sim >= 0.5
    """,
    note="embedding-cosine near-dup pairs via SRP bucket-then-verify (12 deterministic hash tables -> exact cosine); oracle is the brute-force cross join, so green proves the bucketed path loses no pair on this corpus",
)
def embedding_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default scale path: SRP candidates → exact verify — no cross
    join.  The oracle is brute-force all-pairs SQL; hash-match means the
    deterministic bucket tables recovered every qualifying pair here
    (recall semantics documented on the operator)."""
    return similarity.embedding_near_dups(
        _t(spark, sf_dir, "embeddings"), threshold=0.5
    )


@register(
    "minhash_near_dups",
    None,
    note="end-to-end near-dup pipeline: LSH candidates → exact-jaccard verify (bucket-then-verify; candidates ⊆ exact pairs so rows-only by design)",
)
def minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    cand = dedup.minhash_lsh_candidates(docs, "doc_id", "text")
    # verify exactly the candidate PAIRS (linear in |cand|) — not
    # all-pairs among candidate docs.
    return dedup.jaccard_verify(docs, "doc_id", "text", cand, threshold=0.5)


@register(
    "quality_filter",
    None,  # generated below from the text_stats oracle
    note="quality-threshold document filter (the Gopher-style heuristic gate)",
)
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = text_ops.text_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")
    return stats.filter(
        (F.col("quality") >= 0.8) & (F.col("lang_pred") == "en")
    ).select("doc_id", "quality", "n_tokens")


REGISTRY["quality_filter"] = Query(
    fn=quality_filter,
    oracle=f"""
    WITH stats AS ({_text_stats_oracle()})
    SELECT doc_id, quality, n_tokens FROM stats
    WHERE quality >= 0.8 AND lang_pred = 'en'
    """,
    note=REGISTRY["quality_filter"].note,
)


# ---------------------------------------------------------------------------
# §2.11 pipe protocol / multimodal / streaming
# ---------------------------------------------------------------------------

@register(
    "pipe_wordcount",
    f"""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS token_count
    FROM (SELECT unnest({_TOKENS.format(col='text')}) AS token FROM documents)
    GROUP BY token
    """,
    note="hadoop-streaming pipe protocol (st/PipeMapRed.java): python child process as mapper, engine as combiner+reducer",
)
def pipe_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_20_spark.operators import pipe

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return pipe.script_wordcount(spark, docs).withColumn(
        "token_count", F.col("token_count").cast("long")
    )


@register(
    "multimodal_features",
    """
    SELECT doc_id AS media_id, 'image/fake' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST(64 + ('0x' || substr(md5(text), 1, 4))::INT % 1920 AS INT) AS width,
           CAST(64 + ('0x' || substr(md5(text), 5, 4))::INT % 1920 AS INT) AS height
    FROM documents
    """,
    note="multimodal binary-column plumbing: mapInPandas Arrow-batched decode (deterministic fake codec; real decoder drops into _decode_bytes)",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_20_spark.operators import multimodal

    media = multimodal.to_media_table(_t(spark, sf_dir, "documents"), "doc_id", "text")
    return multimodal.extract_features(media, fake=True).select(
        "media_id", "media_type", "n_bytes", "content_md5", "width", "height"
    )


@register(
    "streaming_tumbling",
    """
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    note="REAL Structured Streaming run (file source, 1-file microbatches, watermark, memory sink) — oracle is the batch equivalence",
)
def streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_20_spark import streaming as stream_ops

    events = stream_ops.read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value"
        )
    )
    spark.catalog.dropTempView("q_streaming_tumbling") if "q_streaming_tumbling" in [
        t.name for t in spark.catalog.listTables()
    ] else None
    return stream_ops.run_to_memory(agg, "q_streaming_tumbling")


@register(
    "streaming_static_join",
    """
    SELECT c_mktsegment, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON c_custkey = user_id
    GROUP BY c_mktsegment
    """,
    note="REAL stream-static dimension join (file microbatches x static customer dim) + complete-mode agg; oracle is the batch equivalence",
)
def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment — the streaming face of the
    DistributedCache replicated join: each microbatch hash-joins against
    the STATIC customer dim (stateless — no join state accrues, unlike
    stream-stream), then feeds a complete-mode aggregate.  At 100 TB
    the dim side is re-planned per microbatch, so Catalyst/AQE pick
    broadcast vs shuffle from the dim's actual size — same gating
    discipline as the batch queries, no forced hint."""
    from hadoop_20_spark import streaming as stream_ops

    events = stream_ops.read_events_stream(spark, sf_dir)
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    agg = (
        events.join(cust, events.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    return stream_ops.run_to_memory(agg, "q_streaming_static_join")


# ---------------------------------------------------------------------------
# TPC-H-shaped relational widening (SURVEY §2.4/§2.5 composition patterns)
# ---------------------------------------------------------------------------

@register(
    "q5_local_supplier",
    """
    SELECT r_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
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
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
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
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
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
    "grouping_sets_agg",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_orders,
           GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS grp_id
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    ORDER BY grp_id, o_orderstatus, o_orderpriority
    """,
    note="GROUPING SETS (reference gap — SURVEY §2.5 lists rollup/cube/sets absent; free in Spark, exposed as first-class)",
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via SQL on a temp view (the DataFrame API
    exposes only rollup/cube; GROUPING SETS is the general form).  One
    shuffle; Spark expands sets with a single Expand node (each input row
    emitted once per set, partial-agg'd map-side)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
               COUNT(*) AS n_orders,
               CAST(GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS BIGINT) AS grp_id
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY grp_id, o_orderstatus, o_orderpriority
        """
    )


@register(
    "lang_id_confusion",
    """
    WITH t AS (SELECT doc_id, lang, list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS toks FROM documents),
         m AS (
      SELECT lang, len(toks) AS n_tokens,
             len(list_filter(toks, x -> list_contains(['the', 'a', 'an', 'of', 'to', 'in', 'and', 'or', 'is', 'are', 'was', 'were', 'for', 'on', 'with', 'as', 'by', 'at', 'from'], x))) AS n_stop
      FROM t)
    SELECT lang,
           CASE WHEN (CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END) >= 0.05
                THEN 'en' ELSE 'unknown' END AS lang_pred,
           COUNT(*) AS n_docs
    FROM m
    GROUP BY lang, lang_pred
    ORDER BY lang, lang_pred
    """,
    note="language-ID confusion matrix: predicted (stopword-profile heuristic) vs labeled lang",
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language-ID against the labeled
    ``lang`` column — the eval loop a corpus pipeline runs after any
    classifier change.  Row-local scoring then a tiny groupBy."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", text_ops.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "lang_pred")
    )


def _sql_cos(a: str, b: str) -> str:
    """DuckDB cosine-similarity fragment matching similarity.cosine
    (sequential-order double sums, rounded to 4dp)."""
    def _dot(x: str, y: str) -> str:
        return (
            f"list_aggregate(list_transform(range(1, 65), "
            f"i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)), 'sum')"
        )

    return f"ROUND({_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)})), 4)"


@register(
    "ivf_topk",
    f"""
    WITH cent AS (SELECT vec_id AS cent_id, embedding AS c_vec FROM embeddings WHERE vec_id < 16),
         corpus AS (SELECT vec_id AS neighbor_id, embedding AS n_vec FROM embeddings),
         asg AS (SELECT neighbor_id, n_vec, cent_id, {_sql_cos('n_vec', 'c_vec')} AS sim FROM corpus, cent),
         cells AS (SELECT neighbor_id, n_vec, cent_id AS cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY neighbor_id ORDER BY sim DESC, cent_id) AS rk FROM asg)
            WHERE rk = 1),
         q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
         qa AS (SELECT query_id, q_vec, cent_id, {_sql_cos('q_vec', 'c_vec')} AS sim FROM q, cent),
         qcells AS (SELECT query_id, q_vec, cent_id AS cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cent_id) AS rk FROM qa)
            WHERE rk <= 4),
         scored AS (SELECT query_id, neighbor_id, {_sql_cos('q_vec', 'n_vec')} AS cosine_sim
            FROM qcells JOIN cells USING (cell) WHERE neighbor_id <> query_id)
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
        FROM scored)
    WHERE rank <= 5
    """,
    note="IVF-style ANN: deterministic coarse quantizer (16 cells), nprobe=4 probe join — the scale path beside SRP-LSH",
)
def ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_centroids=16, nprobe=4
    )


def _kmeans_ctes(k: int, iterations: int) -> str:
    """Unrolled Lloyd's-iteration CTE chain mirroring
    ``similarity.kmeans_centroids`` (fixed iteration count makes the
    'training' expressible as plain SQL): assignment by 4dp-rounded
    cosine argmax (cent_id tie-break), per-coordinate means as exact
    DECIMAL(30,10) sums / COUNT rounded to 8dp, empty cells keep their
    previous centroid.  Final centroids are ``c{iterations}``."""
    parts = [
        "v AS (SELECT vec_id, embedding FROM embeddings)",
        f"c0 AS (SELECT CAST(vec_id AS BIGINT) AS cent_id, "
        f"CAST(embedding AS DOUBLE[]) AS c_vec FROM embeddings WHERE vec_id < {k})",
    ]
    for i in range(iterations):
        parts.append(
            f"""a{i} AS (
      SELECT vec_id, cell FROM (
        SELECT v.vec_id, c.cent_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                   ORDER BY {_sql_cos('v.embedding', 'c.c_vec')} DESC, c.cent_id) AS rk
        FROM v, c{i} c) WHERE rk = 1)"""
        )
        parts.append(
            f"""m{i} AS (
      SELECT cell, pos,
             ROUND(CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*), 8) AS m
      FROM (SELECT a{i}.cell, generate_subscripts(v.embedding, 1) AS pos,
                   unnest(v.embedding) AS val
            FROM a{i} JOIN v USING (vec_id))
      GROUP BY cell, pos)"""
        )
        parts.append(
            f"""c{i + 1} AS (
      SELECT old.cent_id, COALESCE(new.c_vec, old.c_vec) AS c_vec
      FROM c{i} old LEFT JOIN
           (SELECT cell AS cent_id, list(m ORDER BY pos) AS c_vec
            FROM m{i} GROUP BY cell) new USING (cent_id))"""
        )
    return ",\n    ".join(parts)


@register(
    "ivf_topk_kmeans",
    f"""
    WITH {_kmeans_ctes(16, 3)},
         cent AS (SELECT cent_id, c_vec FROM c3),
         corpus AS (SELECT vec_id AS neighbor_id, embedding AS n_vec FROM embeddings),
         asg AS (SELECT neighbor_id, n_vec, cent_id, {_sql_cos('n_vec', 'c_vec')} AS sim FROM corpus, cent),
         cells AS (SELECT neighbor_id, n_vec, cent_id AS cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY neighbor_id ORDER BY sim DESC, cent_id) AS rk FROM asg)
            WHERE rk = 1),
         q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
         qa AS (SELECT query_id, q_vec, cent_id, {_sql_cos('q_vec', 'c_vec')} AS sim FROM q, cent),
         qcells AS (SELECT query_id, q_vec, cent_id AS cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cent_id) AS rk FROM qa)
            WHERE rk <= 4),
         scored AS (SELECT query_id, neighbor_id, {_sql_cos('q_vec', 'n_vec')} AS cosine_sim
            FROM qcells JOIN cells USING (cell) WHERE neighbor_id <> query_id)
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
        FROM scored)
    WHERE rank <= 5
    """,
    note="IVF ANN over REAL k-means centroids (3 deterministic Lloyd's iterations, decimal-exact means) — the oracle unrolls the training loop as CTEs, so even the quantizer is hash-checked",
)
def ivf_topk_kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ivf_topk` with centroids from ``similarity.kmeans_centroids``:
    deterministic init (k smallest ids), 3 fixed Lloyd's iterations,
    decimal-exact per-coordinate means — the whole pipeline (training
    included) hash-matches the unrolled-SQL oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = similarity.kmeans_centroids(emb, k=16, iterations=3)
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, nprobe=4, centroids=cents
    )


@register(
    "sliding_window_agg",
    """
    WITH w AS (
      SELECT event_type, value,
             time_bucket(INTERVAL 30 MINUTES, ts) - k * INTERVAL 30 MINUTES AS window_start
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
    )
    SELECT window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM w GROUP BY window_start, event_type
    """,
    note="sliding window (1h window / 30m slide): each event lands in 2 overlapping windows via Expand",
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation with F.window(size, slide) — Spark
    expands each row into size/slide window copies map-side (one Expand,
    one shuffle), the standard overlap strategy.  Reference analog: the
    time-bucketed-key convention (key = floor(ts/bucket)) emitted twice
    per record by the mapper."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


@register(
    "session_window_agg",
    """
    WITH g AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM g
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTES AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM s GROUP BY user_id, session_seq
    """,
    note="native F.session_window (30m gap) in batch groupBy; oracle = gap-detection cumsum equivalence",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (dynamic gap-merged intervals) — the
    operator Structured Streaming shares; batch mode makes it exactly
    oracle-checkable against the lag/cumsum formulation (session end =
    last event + gap)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "streaming_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    note="REAL streaming stateful dedup (dropDuplicatesWithinWatermark, file microbatches); oracle is batch DISTINCT",
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: dropDuplicatesWithinWatermark keeps one
    row per (user_id, event_type) with bounded state (keys expire past
    the watermark — the unbounded-state fix for plain dropDuplicates on
    streams).  Projecting the key columns afterwards makes the emitted
    set deterministic (= batch DISTINCT), whichever arrival won."""
    from hadoop_20_spark import streaming as stream_ops

    events = stream_ops.read_events_stream(spark, sf_dir)
    deduped = (
        events.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return stream_ops.run_append_to_memory(deduped, "q_streaming_dedup")


@register(
    "udtf_term_counts",
    r"""
    SELECT doc_id, term, n FROM (
      SELECT doc_id, sh AS term, COUNT(*) AS n
      FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS sh
            FROM documents)
      GROUP BY doc_id, sh)
    WHERE n >= 2
    """,
    note="Python UDTF (LATERAL) — Mapper-as-UDTF surface; oracle is the JVM-side explode/groupBy equivalent",
)
def udtf_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-term counts per document via a registered Python UDTF in
    a LATERAL join — the reference's Mapper contract (0..n records out
    per record in, st/PipeMapper.java being the scripted form).  The
    oracle proves the UDTF's semantics equal the vectorized
    explode→groupBy plan a production pipeline should prefer."""
    from hadoop_20_spark.operators.udx import term_counts_udtf

    spark.udtf.register("term_counts", term_counts_udtf())
    _t(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        "SELECT doc_id, tc.term, tc.n FROM udtf_docs_v, LATERAL term_counts(text) AS tc"
    )


_CURATION_QUALITY_CTE = """
    WITH t AS (SELECT doc_id, text, list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS toks FROM documents),
         m AS (
      SELECT doc_id, text, toks, len(toks) AS n_tokens,
             len(list_filter(toks, x -> list_contains(['the', 'a', 'an', 'of', 'to', 'in', 'and', 'or', 'is', 'are', 'was', 'were', 'for', 'on', 'with', 'as', 'by', 'at', 'from'], x))) AS n_stop,
             len(list_distinct(toks)) AS n_distinct
      FROM t),
         scored AS (
      SELECT doc_id, text, toks, n_tokens,
             ROUND((CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.25 END) * 0.4
                   + (CASE WHEN n_tokens > 0 THEN CAST(n_distinct AS DOUBLE) / n_tokens ELSE 1.0 END) * 0.3
                   + (CASE WHEN (CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END)
                           BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.5 END) * 0.3, 6) AS quality,
             CASE WHEN (CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END) >= 0.05
                  THEN 'en' ELSE 'unknown' END AS lang_pred
      FROM m),
         qpass AS (SELECT doc_id, text, toks, n_tokens, quality FROM scored
                   WHERE quality >= 0.8 AND lang_pred = 'en'),
         keepers AS (SELECT MIN(doc_id) AS doc_id FROM qpass GROUP BY md5(text)),
         kept AS (SELECT q.doc_id, q.toks, q.n_tokens, q.quality FROM qpass q JOIN keepers USING (doc_id)),
         sh AS (SELECT doc_id AS did,
                       unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                              i -> array_to_string(toks[i:i+2], ' ')))) AS s
                FROM kept),
         sizes AS (SELECT did, COUNT(*) AS sz FROM sh GROUP BY did),
         pairs AS (
      SELECT a.did AS id_a, b.did AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.did < b.did
      GROUP BY a.did, b.did),
         neardup AS (
      SELECT DISTINCT id_b FROM pairs
      JOIN sizes sa ON sa.did = id_a
      JOIN sizes sb ON sb.did = id_b
      WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.5)
    SELECT doc_id, quality, n_tokens FROM kept
    WHERE doc_id NOT IN (SELECT id_b FROM neardup)
    ORDER BY doc_id
"""


@register(
    "corpus_curation",
    _CURATION_QUALITY_CTE,
    note="end-to-end training-corpus keep-list: quality gate → exact dedup → 3-gram Jaccard near-dup prune",
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship LLM-data pipeline, as one declarative plan:

    1. quality gate (Gopher-style heuristics, row-local codegen);
    2. exact dedup (md5 hash-groupBy, keep min doc_id);
    3. near-dup prune: 3-gram Jaccard ≥ 0.5 pairs, drop the higher id.

    Stage 3 runs the prefix-filtered exact Jaccard join (rarest-first
    frequency ordering keeps hot shingles out of the candidate join;
    candidates verified over full sets — lossless); at 100 TB it can
    equally route through ``dedup.minhash_lsh_candidates`` (band
    buckets) into the same ``jaccard_verify`` — either way the shuffle
    is bounded, never the raw shared-shingle fan-out."""
    docs = _t(spark, sf_dir, "documents")
    stats = text_ops.text_stats(docs, "doc_id", "text")
    qpass = (
        docs.join(
            stats.filter(
                (F.col("quality") >= 0.8) & (F.col("lang_pred") == "en")
            ).select("doc_id", "quality", "n_tokens"),
            "doc_id",
        )
    )
    keepers = (
        qpass.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # keepers/drop are per-doc aggregates that grow with the corpus —
    # no forced hint; AQE broadcasts them at runtime only when small.
    kept = qpass.join(keepers, "doc_id", "left_semi")
    near = dedup.jaccard_pairs(kept, "doc_id", "text", threshold=0.5, shingle=3)
    drop = near.select(F.col("id_b").alias("doc_id")).distinct()
    return (
        kept.join(drop, "doc_id", "left_anti")
        .select("doc_id", "quality", "n_tokens")
        .orderBy("doc_id")
    )


@register(
    "frame_sample",
    """
    WITH m AS (SELECT doc_id AS media_id, text,
                      1 + (('0x' || substr(md5(text), 1, 15))::BIGINT % 8) AS n_frames
               FROM documents)
    SELECT media_id, CAST(u AS INT) AS frame_idx,
           md5(text || '#' || CAST(u AS VARCHAR)) AS frame_md5
    FROM m, UNNEST(range(0, n_frames, 2)) AS t(u)
    """,
    note="video frame-sampling plumbing: row-expanding mapInPandas with deterministic fake codec (every 2nd frame)",
)
def frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_20_spark.operators import multimodal

    media = multimodal.to_media_table(_t(spark, sf_dir, "documents"), "doc_id", "text")
    return multimodal.frame_sample(media, stride=2, fake=True)


@register(
    "streaming_sliding",
    """
    WITH w AS (
      SELECT event_type, value,
             time_bucket(INTERVAL 30 MINUTES, CAST(ts AS TIMESTAMP)) - k * INTERVAL 30 MINUTES AS window_start
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
    )
    SELECT window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM w GROUP BY window_start, event_type
    """,
    note="REAL streaming sliding windows (1h/30m, file microbatches, watermark); oracle is the batch expansion",
)
def streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_20_spark import streaming as stream_ops

    events = stream_ops.read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value"
        )
    )
    return stream_ops.run_to_memory(agg, "q_streaming_sliding")


@register(
    "record_io_render",
    """
    WITH r AS (SELECT n_nationkey, n_name, n_regionkey,
                      n_nationkey || ',' || n_name || ',' || n_regionkey AS csv_line
               FROM nation)
    SELECT n_nationkey, csv_line,
           CAST(string_split(csv_line, ',')[2] AS VARCHAR) AS parsed_name,
           CAST(string_split(csv_line, ',')[3] AS BIGINT) AS parsed_regionkey
    FROM r ORDER BY n_nationkey
    """,
    note="Record I/O CSV rendering round-trip (core/record/CsvRecordOutput.java): struct -> csv line -> parsed fields",
)
def record_io_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Record I/O renders fixed-schema records to CSV/XML
    streams (core/record/{CsvRecordOutput,CsvRecordInput}.java, rcc DDL).
    Spark-first: render with concat_ws, parse back with from_csv against
    a DDL schema string — the same fixed-schema island, declaratively."""
    n = _t(spark, sf_dir, "nation")
    rendered = n.select(
        "n_nationkey",
        F.concat_ws(
            ",",
            F.col("n_nationkey").cast("string"),
            F.col("n_name"),
            F.col("n_regionkey").cast("string"),
        ).alias("csv_line"),
    )
    parsed = F.from_csv(
        F.col("csv_line"), "k bigint, name string, regionkey bigint"
    )
    return rendered.select(
        "n_nationkey",
        "csv_line",
        parsed.getField("name").alias("parsed_name"),
        parsed.getField("regionkey").alias("parsed_regionkey"),
    ).orderBy("n_nationkey")


@register(
    "job_chain",
    r"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS term
      FROM documents
    ),
    counts AS (SELECT term, COUNT(*) AS n FROM tok GROUP BY term),
    hot AS (SELECT term FROM counts WHERE n >= 500),
    usage AS (
      SELECT t.lang, t.doc_id
      FROM tok t JOIN hot USING (term)
      GROUP BY t.lang, t.doc_id
    )
    SELECT lang, COUNT(*) AS docs_with_hot_terms
    FROM usage GROUP BY lang ORDER BY docs_with_hot_terms DESC, lang
    """,
    note="JobControl DAG / gridmix 'monster chain': wordcount job -> threshold filter job -> join+agg job, one lazy plan",
)
def job_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference chains dependent MR jobs via
    mapred/jobcontrol/{Job,JobControl}.java (each stage materialized to
    HDFS between jobs); gridmix2's 'monster query' is the canonical
    3-stage chain.  Spark-first: the whole DAG is ONE lazy plan — no
    intermediate materialization, and the hot-term set (stage 2 output)
    comes back as a broadcast semi-join instead of a DistributedCache
    file."""
    tok = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.explode(_fn_tokens("text")).alias("term"))
    )
    hot = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 500)
        .select("term")
    )
    # hot is a derived vocabulary that grows with the corpus — unhinted;
    # AQE broadcasts the semi-join side at runtime only when it fits.
    usage = (
        tok.join(hot, "term", "left_semi")
        .select("lang", "doc_id")
        .distinct()
    )
    return (
        usage.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("docs_with_hot_terms"))
        .orderBy(F.col("docs_with_hot_terms").desc(), "lang")
    )


# ---------------------------------------------------------------------------
# Generated oracles for the LSH family (deterministic algorithms — the
# SQL is verbose, so it is built programmatically from the same
# parameters the Spark operators use; previously rows-only).
# ---------------------------------------------------------------------------

def _lsh_bands_cte() -> str:
    """CTE chain sig→bands→buckets→pairs for 16 hashes / 4 bands,
    mirroring dedup.minhash_lsh_candidates (max_bucket=1000)."""
    return f"""
    WITH sig AS ({_minhash_oracle()}),
    bands AS (
      SELECT doc_id, 0 AS band, mh0 AS h0, mh1 AS h1, mh2 AS h2, mh3 AS h3 FROM sig
      UNION ALL SELECT doc_id, 1, mh4, mh5, mh6, mh7 FROM sig
      UNION ALL SELECT doc_id, 2, mh8, mh9, mh10, mh11 FROM sig
      UNION ALL SELECT doc_id, 3, mh12, mh13, mh14, mh15 FROM sig
    ),
    buckets AS (
      SELECT band, h0, h1, h2, h3, list_sort(list(doc_id)) AS ids
      FROM bands GROUP BY band, h0, h1, h2, h3
      HAVING COUNT(*) BETWEEN 2 AND 1000
    ),
    rawpairs AS (
      SELECT p[1] AS id_a, p[2] AS id_b
      FROM buckets,
           UNNEST(flatten(list_transform(ids, a -> list_transform(list_filter(ids, b -> b > a), b -> [a, b])))) AS t(p)
    ),
    pairs AS (SELECT DISTINCT id_a, id_b FROM rawpairs)"""


def _lsh_pairs_oracle() -> str:
    return _lsh_bands_cte() + "\n    SELECT id_a, id_b FROM pairs"


def _minhash_near_dups_oracle() -> str:
    """LSH candidates → exact token-set Jaccard (threshold 0.5) verify,
    mirroring minhash_near_dups: jaccard computed over the docs that
    appear in any candidate pair, then inner-joined to the pairs."""
    return _lsh_bands_cte() + r""",
    pids AS (SELECT id_a AS doc_id FROM pairs UNION SELECT id_b FROM pairs),
    base AS (
      SELECT d.doc_id AS did,
             unnest(list_distinct(list_filter(regexp_split_to_array(d.text, '\s+'), t -> t <> ''))) AS sh
      FROM documents d JOIN pids USING (doc_id)
    ),
    sizes AS (SELECT did, COUNT(*) AS sz FROM base GROUP BY did),
    common AS (
      SELECT a.did AS id_a, b.did AS id_b, COUNT(*) AS n_common
      FROM base a JOIN base b ON a.sh = b.sh AND a.did < b.did
      GROUP BY a.did, b.did
    )
    SELECT p.id_a, p.id_b,
           ROUND(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
    FROM pairs p
    JOIN common c ON c.id_a = p.id_a AND c.id_b = p.id_b
    JOIN sizes sa ON sa.did = p.id_a
    JOIN sizes sb ON sb.did = p.id_b
    WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.5"""


def _srp_topk_oracle() -> str:
    """SRP-LSH top-k mirroring similarity.lsh_topk (4 planes × 3 tables,
    k=5, queries vec_id < 10) with the hyperplane ±1 coefficients
    embedded as literals from the same _srp_signs family."""
    from hadoop_20_spark.operators.similarity import _srp_signs

    def bkt_expr(t: int) -> str:
        terms = []
        for p in range(4):
            lits = "[" + ", ".join(str(x) for x in _srp_signs(64, 4, t)[p]) + "]"
            proj = (
                f"list_aggregate(list_transform(range(1, 65), "
                f"i -> CAST(embedding[i] AS DOUBLE) * ({lits}[i])), 'sum')"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    return f"""
    WITH bk AS (
      SELECT vec_id, embedding, 0 AS tbl, {bkt_expr(0)} AS bkt FROM embeddings
      UNION ALL SELECT vec_id, embedding, 1, {bkt_expr(1)} FROM embeddings
      UNION ALL SELECT vec_id, embedding, 2, {bkt_expr(2)} FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS q_vec, tbl, bkt FROM bk WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS n_vec, tbl, bkt FROM bk),
    cand AS (
      SELECT DISTINCT query_id, neighbor_id, q_vec, n_vec
      FROM c JOIN q USING (tbl, bkt) WHERE neighbor_id <> query_id
    ),
    scored AS (SELECT query_id, neighbor_id, {_sql_cos('q_vec', 'n_vec')} AS cosine_sim FROM cand)
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5"""


REGISTRY["minhash_lsh_pairs"] = Query(
    fn=REGISTRY["minhash_lsh_pairs"].fn,
    oracle=_lsh_pairs_oracle(),
    note="LSH band-bucket candidate pairs (16 hashes / 4 bands) — deterministic, full oracle",
)
REGISTRY["minhash_near_dups"] = Query(
    fn=REGISTRY["minhash_near_dups"].fn,
    oracle=_minhash_near_dups_oracle(),
    note="end-to-end near-dup pipeline: LSH candidates → exact-jaccard verify — deterministic, full oracle",
)
REGISTRY["embedding_topk_lsh"] = Query(
    fn=REGISTRY["embedding_topk_lsh"].fn,
    oracle=_srp_topk_oracle(),
    note="SRP-LSH bucketed ANN (4 planes × 3 tables) — deterministic given the literal hyperplane family, full oracle",
)


def _srp_stats_oracle() -> str:
    """Per-table SRP bucket occupancy with the same literal hyperplanes
    as _srp_topk_oracle."""
    from hadoop_20_spark.operators.similarity import _srp_signs

    def bkt_expr(t: int) -> str:
        terms = []
        for p in range(4):
            lits = "[" + ", ".join(str(x) for x in _srp_signs(64, 4, t)[p]) + "]"
            proj = (
                f"list_aggregate(list_transform(range(1, 65), "
                f"i -> CAST(embedding[i] AS DOUBLE) * ({lits}[i])), 'sum')"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    return f"""
    WITH bk AS (
      SELECT vec_id, 0 AS tbl, {bkt_expr(0)} AS bkt FROM embeddings
      UNION ALL SELECT vec_id, 1, {bkt_expr(1)} FROM embeddings
      UNION ALL SELECT vec_id, 2, {bkt_expr(2)} FROM embeddings
    ),
    per AS (SELECT tbl, bkt, COUNT(*) AS n FROM bk GROUP BY tbl, bkt)
    SELECT tbl, CAST(SUM(n) AS BIGINT) AS "rows", COUNT(*) AS n_buckets, MAX(n) AS max_bucket
    FROM per GROUP BY tbl ORDER BY tbl"""


@register(
    "srp_bucket_stats",
    None,  # oracle attached below (dynamic literals)
    note="SRP bucket-occupancy observability (rows / distinct buckets / max bucket per hash table) — the recall/fan-out monitor for the approximate embedding paths",
)
def srp_bucket_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.srp_bucket_stats(
        _t(spark, sf_dir, "embeddings"), n_tables=3
    ).orderBy("tbl")


REGISTRY["srp_bucket_stats"] = Query(
    fn=REGISTRY["srp_bucket_stats"].fn,
    oracle=_srp_stats_oracle(),
    note=REGISTRY["srp_bucket_stats"].note,
)


@register(
    "pii_redact",
    r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com tel 555-' || doc_id AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                          '\b555-[0-9]+', '<PHONE>', 'g') AS clean,
           CAST(len(regexp_extract_all(raw, '[a-z0-9.]+@[a-z0-9.]+')) AS BIGINT)
             + len(regexp_extract_all(raw, '\b555-[0-9]+')) AS n_redactions
    FROM aug ORDER BY doc_id
    """,
    note="PII redaction pass (email/phone patterns -> placeholder tokens) with per-doc redaction counts",
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-redaction pass a training pipeline runs before release:
    regexp_replace chains, all codegen.  The fixture corpus carries no
    PII, so a deterministic contact suffix is synthesized per doc and
    then scrubbed — the count column proves each pattern fired.
    Reference analog: RegexMapper (mapred/lib/RegexMapper.java) used as
    a scrubber."""
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel 555-"),
        F.col("doc_id").cast("string"),
    )
    email = r"[a-z0-9.]+@[a-z0-9.]+"
    phone = r"\b555-[0-9]+"
    return (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_replace(
                F.regexp_replace(raw, email, "<EMAIL>"), phone, "<PHONE>"
            ).alias("clean"),
            (
                F.size(F.regexp_extract_all(raw, F.lit(email), 0))
                + F.size(F.regexp_extract_all(raw, F.lit(phone), 0))
            ).cast("long").alias("n_redactions"),
        )
        .orderBy("doc_id")
    )


@register(
    "decontaminate",
    r"""
    WITH tok AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks FROM documents),
    g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 4, 1) + 1),
                 i -> array_to_string(toks[i:i+4], ' ')))) AS ng
          FROM tok),
    bench AS (SELECT DISTINCT ng FROM g WHERE doc_id < 20)
    SELECT g.doc_id, COUNT(*) AS n_hits
    FROM g JOIN bench USING (ng)
    WHERE g.doc_id >= 20
    GROUP BY g.doc_id ORDER BY g.doc_id
    """,
    note="benchmark decontamination: corpus docs sharing any 5-gram with the benchmark set (docs 0-19), hit counts",
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination — the overlap check every training corpus
    needs: distinct 5-grams of the benchmark set (here docs 0-19) are
    broadcast and joined against the corpus's 5-grams; output is each
    contaminated doc with its hit count (downstream: drop or trim).

    At 100 TB the benchmark side stays small (benchmarks are), so this
    remains one broadcast hash join against a narrow exploded n-gram
    stream — no corpus shuffle; hash n-grams (md5_long) to 8-byte keys
    if the broadcast grows."""
    docs = _t(spark, sf_dir, "documents")
    from hadoop_20_spark.functions import ngrams

    g = docs.select(
        "doc_id", F.explode(F.array_distinct(ngrams("text", 5))).alias("ng")
    )
    bench = F.broadcast(g.filter(F.col("doc_id") < 20).select("ng").distinct())
    return (
        g.filter(F.col("doc_id") >= 20)
        .join(bench, "ng")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy("doc_id")
    )


@register(
    "fuzzy_name_pairs",
    """
    WITH b AS (SELECT c_custkey, c_name, substr(c_name, 1, len(c_name) - 1) AS blk FROM customer)
    SELECT a.c_custkey AS key_a, c.c_custkey AS key_b,
           CAST(levenshtein(a.c_name, c.c_name) AS INT) AS edit_dist
    FROM b a JOIN b c ON a.blk = c.blk AND a.c_custkey < c.c_custkey
    WHERE levenshtein(a.c_name, c.c_name) <= 1
    """,
    note="record-linkage fuzzy match: blocking key (name prefix) -> within-block levenshtein <= 1",
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy key matching with BLOCKING — the record-linkage discipline:
    never all-pairs levenshtein (quadratic in the table); an equi-join on
    a cheap blocking key (here the name prefix) bounds candidates to
    within-block pairs, then the edit-distance verify runs on those only.
    Same bucket-then-verify shape as MinHash-LSH; at 100 TB pick blocking
    keys so the largest block fits a task (or salt hot blocks)."""
    c = _t(spark, sf_dir, "customer")
    b = c.select(
        "c_custkey",
        "c_name",
        F.expr("substring(c_name, 1, length(c_name) - 1)").alias("blk"),
    )
    a = b.select(
        F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"), "blk"
    )
    d = b.select(
        F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"), "blk"
    )
    return (
        a.join(d, "blk")
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 1)
    )


@register(
    "integrity_checks",
    """
    SELECT 'orphan_lineitems' AS check_name,
           (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS violations
    UNION ALL
    SELECT 'orphan_orders',
           (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
    UNION ALL
    SELECT 'null_order_keys', (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL)
    UNION ALL
    SELECT 'dup_order_keys',
           (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1))
    UNION ALL
    SELECT 'negative_prices', (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice < 0)
    ORDER BY check_name
    """,
    note="data-quality audit: referential integrity (anti-joins), null/duplicate keys, domain constraints",
)
def integrity_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit a warehouse load runs after ingest: referential
    integrity via broadcast anti-joins, key nullability/uniqueness,
    domain checks — each check one small aggregate, unioned into a
    (check_name, violations) report.  The reference idiom is a counter
    per validation job (SortValidator's RecordStatsChecker); here
    counters are rows, so the report is itself queryable."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")

    def one(name: str, df) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("violations")).select(
            F.lit(name).alias("check_name"), "violations"
        )

    checks = [
        one("orphan_lineitems", li.join(joins.broadcast_if_small(orders), li.l_orderkey == orders.o_orderkey, "left_anti")),
        one("orphan_orders", orders.join(joins.broadcast_if_small(cust), orders.o_custkey == cust.c_custkey, "left_anti")),
        one("null_order_keys", orders.filter(F.col("o_orderkey").isNull())),
        one(
            "dup_order_keys",
            orders.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1),
        ),
        one("negative_prices", li.filter(F.col("l_extendedprice") < 0)),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")


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
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
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
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
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
    "scd2_intervals",
    """
    WITH changes AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    starts AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM changes WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
    FROM starts
    """,
    note="SCD-type-2 interval build: state-change detection + lead() closes each validity interval",
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) intervals from an event log:
    keep state-change rows (event_type differs from the previous row per
    user), then lead() supplies each interval's end — open intervals end
    NULL.  The warehouse-maintenance op the reference ran as chained
    sort+reduce jobs; here two windows over one shuffle."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )


def _dedup_clusters_oracle() -> str:
    return f"""
    WITH RECURSIVE
    base AS ({_lsh_pairs_oracle()}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM base UNION SELECT id_b, id_a FROM base),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(src, dst) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src ORDER BY doc_id"""


@register(
    "dedup_clusters",
    None,  # oracle attached below (generated: recursive CTE over the LSH pairs)
    note="connected components over near-dup pairs (iterative min-label propagation); oracle = recursive CTE",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the MinHash-LSH pair
    graph via iterative min-label propagation (each node adopts the
    smallest label among itself and its neighbors until fixpoint) —
    cluster id = smallest doc_id in the component, the canonical keeper.

    This is the iterative-algorithm pattern (reference analog: chained
    MR jobs reading the previous round's output): a driver loop over
    DataFrames with localCheckpoint() to cut lineage each round.
    Rounds = graph diameter (near-dup clusters are shallow); each round
    is one join + one aggregation, all distributed — and the DuckDB
    recursive-CTE oracle certifies the fixpoint exactly."""
    pairs = dedup.minhash_lsh_candidates(
        _t(spark, sf_dir, "documents"), "doc_id", "text", num_hashes=16, bands=4
    )
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b"), F.col("id_a")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    ).localCheckpoint()
    for _ in range(20):  # diameter bound; near-dup clusters are shallow
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    ).orderBy("doc_id")


REGISTRY["dedup_clusters"] = Query(
    fn=REGISTRY["dedup_clusters"].fn,
    oracle=_dedup_clusters_oracle(),
    note=REGISTRY["dedup_clusters"].note,
)


@register(
    "trailing_window_sum",
    """
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(28,6)))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS trailing_1h_sum,
           CAST(COUNT(*)
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS trailing_1h_events
    FROM events
    """,
    note="RANGE window frames: per-user trailing 1-hour sum/count (value-based frame, not row-based)",
)
def trailing_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing time-window aggregates via RANGE frames — the frame is
    bounded by the ORDER-BY VALUE (microseconds), not row offsets, so
    ties share a frame and gaps shrink it; the reference's equivalent
    needed a reducer buffering a time-indexed deque per key.  DECIMAL
    partials keep prefix sums engine-identical."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("trailing_1h_sum"),
        F.count(F.lit(1)).over(w).cast("long").alias("trailing_1h_events"),
    )


@register(
    "stateful_totals",
    """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS total_micros
    FROM events GROUP BY user_id
    """,
    note="REAL custom stateful streaming op (applyInPandasWithState): per-user running totals across microbatches; oracle = batch groupBy",
)
def stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-state streaming (applyInPandasWithState): per-user
    (count, total) state carried across microbatches, final state equal
    to the batch aggregation.  Values accumulate as integer micro-units
    (floor(value·1e6)) so the running sums are exact and engine-identical
    — the streaming analog of the DECIMAL-sum determinism rule.

    The update-mode memory sink keeps one row per (user, batch); the
    final state per user is the max (totals are monotone).  Reference
    analog: none — cross-job state in hadoop-20 lived in HDFS files
    between chained jobs (SURVEY §2.10)."""
    import pandas as pd
    from hadoop_20_spark import streaming as stream_ops

    events = stream_ops.read_events_stream(spark, sf_dir)

    out_schema = "user_id long, n_events long, total_micros long"
    state_schema = "n long, total long"

    def update(key, pdfs, state):
        import math

        n, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += int(sum(math.floor(v * 1_000_000) for v in pdf["value"]))
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_micros": [total]}
        )

    updates = events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )
    table = stream_ops.run_update_to_memory(updates, "q_stateful_totals")
    return table.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_micros").alias("total_micros"),
    )


@register(
    "bpe_token_count",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_tokens,
           CAST(len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS INT) AS n_ws_tokens
    FROM documents ORDER BY doc_id
    """,
    note="BPE-ish regex tokenizer count (word/number/punct classes) beside the whitespace count — the token-budget estimator",
)
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting with a BPE-ish regex (letter runs, digit runs,
    punctuation singletons — the GPT-2 pre-tokenizer shape, minus the
    merges): pure regexp_extract_all, codegen, no UDF.  The whitespace
    count rides along for calibration."""
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(pat), 0)).alias("n_bpe_tokens"),
            F.size(_fn_tokens("text")).alias("n_ws_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "sequence_packing",
    r"""
    WITH t AS (
      SELECT doc_id, doc_id % 8 AS shard,
             len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(FLOOR((cum - n_tokens) / 2048) AS BIGINT) AS bin_id,
           CAST(cum - n_tokens - FLOOR((cum - n_tokens) / 2048) * 2048 AS BIGINT) AS bin_offset
    FROM c ORDER BY shard, doc_id
    """,
    note="sequence packing: per-shard contiguous token-budget bins (2048/ctx) via partitioned prefix sums — the pretraining batch-prep op; no global single-task window",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed token-budget context windows (2048) via
    ``text_ops.pack_sequences``, SHARDED: each of 8 deterministic shards
    (doc_id mod 8 — in production, the trainer-rank key) prefix-sums and
    bins independently, so the window partitions by shard and the plan
    has no Exchange SinglePartition (asserted in test_registry_plans).
    Bins are (shard, bin_id) pairs — exactly the layout a per-rank data
    loader consumes."""
    t = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 8).cast("long").alias("shard"),
        F.size(_fn_tokens("text")).cast("long").alias("n_tokens"),
    )
    return text_ops.pack_sequences(
        t, "doc_id", "n_tokens", budget=2048, shard_col="shard"
    ).orderBy("shard", "doc_id")


def _halton_sql(var: str, base: int, digits: int) -> str:
    """Radical-inverse (Halton) SQL expression — identical term order in
    both engines so the double arithmetic matches bit-for-bit."""
    terms = [
        f"(({var} // {base**j}) % {base}) * {1.0 / base ** (j + 1)!r}"
        for j in range(digits)
    ]
    return " + ".join(terms)


@register(
    "pi_estimate",
    f"""
    WITH pts AS (
      SELECT i, {_halton_sql('i', 2, 20)} AS x, {_halton_sql('i', 3, 13)} AS y
      FROM range(100000) t(i)
    )
    SELECT COUNT(*) AS n_points,
           CAST(SUM(CASE WHEN (x - 0.5) * (x - 0.5) + (y - 0.5) * (y - 0.5) <= 0.25
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
           ROUND(4.0 * SUM(CASE WHEN (x - 0.5) * (x - 0.5) + (y - 0.5) * (y - 0.5) <= 0.25
                                THEN 1 ELSE 0 END) / COUNT(*), 6) AS pi_estimate
    FROM pts
    """,
    note="PiEstimator (ex/PiEstimator.java): Halton low-discrepancy points — deterministic Monte Carlo, exact oracle",
)
def pi_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's canonical Monte Carlo example, reproduced exactly:
    PiEstimator's Halton sequence (radical inverse base 2/3) is
    deterministic, so even the 'random' workload is oracle-checkable —
    the same fixed-order term sums run in both engines.  Embarrassingly
    parallel map over the index range; one aggregation."""
    n = 100_000
    base = spark.range(n).withColumnRenamed("id", "i")

    def halton(col: str, b: int, digits: int):
        expr = F.lit(0.0)
        for j in range(digits):
            # `div` = exact integer division (float-divide-then-cast can
            # round up across an integer boundary and disagree with the
            # oracle's `//`)
            expr = expr + (F.expr(f"{col} div {b ** j}") % b) * (1.0 / b ** (j + 1))
        return expr

    pts = base.select(
        halton("i", 2, 20).alias("x"), halton("i", 3, 13).alias("y")
    )
    inside = F.when(
        (F.col("x") - 0.5) * (F.col("x") - 0.5)
        + (F.col("y") - 0.5) * (F.col("y") - 0.5)
        <= 0.25,
        1,
    ).otherwise(0)
    return pts.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(inside).cast("long").alias("n_inside"),
        F.round(4.0 * F.sum(inside) / F.count(F.lit(1)), 6).alias("pi_estimate"),
    )


@register(
    "word_histogram",
    r"""
    WITH tok AS (
      SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS w
      FROM documents
    ),
    freq AS (SELECT w, COUNT(*) AS freq FROM tok GROUP BY w)
    SELECT 'WORD_HISTOGRAM' AS histogram,
           COUNT(*) AS n_distinct_values,
           CAST(MIN(freq) AS BIGINT) AS min_freq,
           ROUND(quantile_cont(freq, 0.5), 6) AS median_freq,
           CAST(MAX(freq) AS BIGINT) AS max_freq,
           ROUND(CAST(SUM(freq) AS DOUBLE) / COUNT(*), 6) AS avg_freq,
           ROUND(sqrt((CAST(SUM(freq*freq) AS DOUBLE) - CAST(SUM(freq) AS DOUBLE) * SUM(freq) / COUNT(*)) / COUNT(*)), 6) AS stddev_freq
    FROM freq
    """,
    note="AggregateWordHistogram (ex/AggregateWordHistogram.java): ValueHistogram over the corpus token stream",
)
def word_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's second aggregate-framework demo: the corpus-wide
    word-frequency histogram (distinct words; min/median/max/avg/stddev
    of the frequencies) — aggregate.value_histogram over exploded tokens
    under a single constant key, exact-moment statistics throughout."""
    tok = _t(spark, sf_dir, "documents").select(
        F.lit("WORD_HISTOGRAM").alias("histogram"),
        F.explode(_fn_tokens("text")).alias("w"),
    )
    return agg_ops.value_histogram(tok, "histogram", "w")


@register(
    "q7_nation_volume",
    """
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS volume,
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
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY SUBSTR(c_name, 10, 2)
    ORDER BY cntry_code
    """,
    note="TPC-H Q22 shape: above-average balance + NOT IN (anti join) — high-balance customers with no orders since 2000",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-balance customers with no recent orders: a global scalar
    aggregate feeds the filter, NOT IN decorrelates to a broadcast
    left-anti join (orders' key set is the small side after
    projection)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("cust_q22")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("ord_q22")
    return spark.sql(
        """
        SELECT SUBSTR(c_name, 10, 2) AS cntry_code, COUNT(*) AS n_custs,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_bal
        FROM cust_q22
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM cust_q22 WHERE c_acctbal > 0)
          AND c_custkey NOT IN (SELECT o_custkey FROM ord_q22 WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY SUBSTR(c_name, 10, 2)
        ORDER BY cntry_code
        """
    )


@register(
    "array_agg_priorities",
    """
    SELECT o_custkey,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
    note="array aggregation: sorted distinct collect per key (deterministic collect_set form)",
)
def array_agg_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued aggregation done deterministically: collect_set's
    order is shuffle-dependent, so the engine rule is ALWAYS
    sort_array(collect_set(...)) — then the array value is comparable
    across engines and partitionings (ArrayWritable carrier analog).

    The emitted column is the array serialized with '|' — list-typed
    cells are unhashable in the driver's pandas row-sort canonicalizer,
    so the registry convention is: array results cross the comparison
    boundary as strings, array semantics stay internal."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.concat_ws(
                "|", F.sort_array(F.collect_set("o_orderpriority"))
            ).alias("priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


@register(
    "funnel_analysis",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, MIN(e.ts) AS t_click
               FROM events e JOIN v ON v.user_id = e.user_id
               WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
         p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
               FROM events e JOIN c ON c.user_id = e.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click
    """,
    note="ordered funnel (view -> click -> purchase): strictly-sequential first-occurrence chain per user",
)
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel: each stage counts users whose FIRST qualifying
    event happens strictly after their previous stage's first event —
    three conditional-min aggregations chained by broadcast joins (the
    reference idiom: one job per stage, DistributedCache'd outputs)."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


@register(
    "cohort_retention",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) / 7 AS BIGINT) AS week_offset
      FROM events e JOIN first_seen f ON f.user_id = e.user_id
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_active
    FROM activity GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    note="cohort retention matrix: users bucketed by first-seen week, activity counted per week offset",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: cohort = week of first activity; each later
    active week increments that cohort's offset cell.  One aggregation
    for cohorts (broadcast back), one distinct + count — the
    two-job-chain shape, single plan."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    # first_seen is a per-user aggregate (scales with users) — unhinted;
    # AQE picks broadcast at runtime when it fits.
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "numeric_histogram",
    """
    SELECT CAST(FLOOR(l_extendedprice / 10000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS lo,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS hi
    FROM lineitem GROUP BY bucket ORDER BY bucket
    """,
    note="fixed-width numeric histogram (10k-wide price buckets) — one hash agg, the profiling primitive",
)
def numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width binning by integer division — deterministic (unlike
    percentile-sketch histograms) and one map-side-combined hash agg.
    At 100 TB this is THE data-profiling primitive: the bucket key space
    is bounded by the value range, never the row count."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_extendedprice") / 10000).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "mode_per_group",
    """
    WITH f AS (
      SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY c_mktsegment, o_orderpriority
    )
    SELECT c_mktsegment, o_orderpriority AS mode_priority, CAST(n AS BIGINT) AS n
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                     ORDER BY n DESC, o_orderpriority) AS rk FROM f)
    WHERE rk = 1 ORDER BY c_mktsegment
    """,
    note="deterministic per-group mode: count, rank by (count desc, value) — never the built-in mode() (tie order undefined)",
)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent value per group, deterministically: two-level count
    then rank with a value tie-breaker.  The built-in mode() leaves ties
    engine/partition-dependent — the same class of bug the determinism
    suite caught in value_histogram."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    cust = joins.broadcast_if_small(_t(spark, sf_dir, "customer"))
    f = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        f.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("c_mktsegment", F.col("o_orderpriority").alias("mode_priority"), "n")
        .orderBy("c_mktsegment")
    )


@register(
    "cumulative_distinct_users",
    """
    WITH first_day AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS d FROM events GROUP BY user_id
    ),
    per_day AS (SELECT d, COUNT(*) AS n_new FROM first_day GROUP BY d)
    SELECT d, CAST(n_new AS BIGINT) AS n_new,
           CAST(SUM(n_new) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
    FROM per_day ORDER BY d
    """,
    note="cumulative distinct users per day via first-seen reduction — incremental-friendly (no growing distinct state)",
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct count done the scalable way: reduce each user
    to a first-seen day (one shuffle on user_id), then a prefix sum over
    the tiny per-day series — never a per-day COUNT(DISTINCT) rescan of
    growing windows.  The streaming twin keeps first-seen as keyed
    state."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("d")
    )
    per_day = first_day.groupBy("d").agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        "d",
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cumulative_users"),
    ).orderBy("d")


@register(
    "streaming_stream_join",
    """
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    note="REAL stream-stream inner join (click->purchase within 1h, watermark-bounded state); oracle = batch time-range self-join",
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: clicks matched to purchases by the same
    user within one hour.  Watermarks on BOTH sides + the time-range
    join condition bound each side's buffered state (rows older than the
    range fall out) — the stateful-join discipline at 100 TB.  Inner
    joins emit eagerly on match, so processing all input yields exactly
    the batch join (the oracle)."""
    from hadoop_20_spark import streaming as stream_ops

    ev1 = stream_ops.read_events_stream(spark, sf_dir)
    ev2 = stream_ops.read_events_stream(spark, sf_dir)
    clicks = (
        ev1.filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        ev2.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"), "click_id", "purchase_id"
    )
    return stream_ops.run_append_to_memory(joined, "q_stream_join")


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
    "repetition_stats",
    r"""
    WITH tok AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                    i -> array_to_string(toks[i:i+1], ' '))) AS bg
      FROM tok
    ),
    counts AS (SELECT doc_id, bg, COUNT(*) AS n FROM g GROUP BY doc_id, bg)
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_bigrams,
           CAST(MAX(n) AS BIGINT) AS top_bigram_count,
           ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS top_bigram_frac
    FROM counts GROUP BY doc_id ORDER BY doc_id
    """,
    note="Gopher-style repetition metrics: top-bigram fraction per doc (repetitious docs filtered before training)",
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection (the Gopher repetition-filter family): the
    fraction of a document's 2-grams taken by its single most frequent
    2-gram — boilerplate and degenerate generations score high.  Explode
    → two-level count (both partial-agg'd); pairs with
    ``distinct_token_ratio`` in text_stats for the full filter set."""
    docs = _t(spark, sf_dir, "documents")
    from hadoop_20_spark.functions import ngrams

    g = docs.select("doc_id", F.explode(ngrams("text", 2)).alias("bg"))
    counts = g.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_bigrams"),
            F.max("n").cast("long").alias("top_bigram_count"),
            F.round(F.max("n").cast("double") / F.sum("n"), 6).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "scalar_functions_ext",
    """
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
           reverse(p_brand) AS brand_rev,
           repeat(p_type, 2) AS type_twice,
           upper(substr(p_name, 1, 1)) || lower(substr(p_name, 2, length(p_name))) AS name_title,
           levenshtein(p_brand, 'Brand#1') AS brand_dist,
           CAST(sign(p_size - 25) AS BIGINT) AS size_side,
           ROUND(log2(CAST(p_size AS DOUBLE)), 6) AS size_log2,
           ROUND(degrees(CAST(p_size AS DOUBLE) / 50.0), 6) AS size_deg,
           CAST(p_size % 7 AS BIGINT) AS size_mod,
           greatest(p_size, 10) AS size_floor10,
           least(p_size, 40) AS size_cap40,
           CASE WHEN p_size BETWEEN 10 AND 20 THEN 'mid' ELSE 'edge' END AS size_band,
           coalesce(nullif(p_brand, 'Brand#1'), 'FLAGSHIP') AS brand_or_flag,
           CAST(ascii(p_type) AS BIGINT) AS type_ascii,
           left(p_type, 3) AS type3,
           right(p_brand, 2) AS brand2,
           contains(p_name, 'a') AS has_a,
           starts_with(p_type, 'PRO') AS is_promo_type,
           ends_with(p_brand, '1') AS brand_ends_1
    FROM part
    """,
    note="§2.9 scalar surface, extended battery: padding/edit-distance/math/conditional/string-predicate functions, all with exact DuckDB twins",
)
def scalar_functions_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second §2.9 battery — 20 more engine-portable scalar expressions
    (StringUtils/Text analogs plus the math/conditional kernel), chosen
    so every one has an exactly-matching DuckDB function."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_type", 2).alias("type_twice"),
        F.concat(
            F.upper(F.substring("p_name", 1, 1)),
            F.lower(F.col("p_name").substr(F.lit(2), F.length("p_name"))),
        ).alias("name_title"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#1")).alias("brand_dist"),
        F.signum(F.col("p_size") - 25).cast("long").alias("size_side"),
        F.round(F.log2(F.col("p_size").cast("double")), 6).alias("size_log2"),
        F.round(F.degrees(F.col("p_size").cast("double") / 50.0), 6).alias("size_deg"),
        (F.col("p_size") % 7).cast("long").alias("size_mod"),
        F.greatest("p_size", F.lit(10)).alias("size_floor10"),
        F.least("p_size", F.lit(40)).alias("size_cap40"),
        F.when(F.col("p_size").between(10, 20), F.lit("mid"))
        .otherwise(F.lit("edge"))
        .alias("size_band"),
        F.coalesce(F.nullif("p_brand", F.lit("Brand#1")), F.lit("FLAGSHIP")).alias(
            "brand_or_flag"
        ),
        F.ascii("p_type").cast("long").alias("type_ascii"),
        F.substring("p_type", 1, 3).alias("type3"),
        F.substring(F.col("p_brand"), -2, 2).alias("brand2"),
        F.contains("p_name", F.lit("a")).alias("has_a"),
        F.startswith("p_type", F.lit("PRO")).alias("is_promo_type"),
        F.endswith("p_brand", F.lit("1")).alias("brand_ends_1"),
    )


@register(
    "window_analytics_ext",
    """
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           first_value(o_orderkey) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS top_order,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderpriority, rnk, o_orderkey
    """,
    note="§2.6 ranking surface, extended: ntile/percent_rank/cume_dist/nth_value with explicit frames and id tie-breaks",
)
def window_analytics_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank family over one shuffle: every function shares
    the same window spec, so Catalyst plans a single sort+Window; frames
    for first/nth are explicit full-partition ROWS frames (the default
    running frame would make last/nth order-dependent)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.first("o_orderkey").over(wf).alias("top_order"),
            F.nth_value("o_orderkey", 2).over(wf).alias("second_order"),
        )
        .orderBy("o_orderpriority", "rnk", "o_orderkey")
    )


@register(
    "chunk_documents",
    f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS.format(col='text')} AS toks FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             1 + CAST(ceil(greatest(len(toks) - 64, 0) / 48.0) AS INT) AS n_chunks
      FROM t
    )
    SELECT doc_id, CAST(u AS INT) AS chunk_id,
           CAST(len(toks[u * 48 + 1 : u * 48 + 64]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(toks[u * 48 + 1 : u * 48 + 64], ' ') AS chunk_text
    FROM c, UNNEST(range(0, n_chunks)) AS s(u)
    ORDER BY doc_id, chunk_id
    """,
    note="context-window chunking (64-token windows, 16 overlap): tokenize once, explode chunk starts, slice — row-local, zero shuffle",
)
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``text.chunk_documents`` — the chunk-for-embedding/training prep
    op; keeps the final partial chunk (tail text is never silently
    dropped)."""
    return text_ops.chunk_documents(
        _t(spark, sf_dir, "documents"), "doc_id", "text", chunk_tokens=64, overlap=16
    ).orderBy("doc_id", "chunk_id")


@register(
    "stratified_sample",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
          < CASE lang WHEN 'en' THEN 5000 WHEN 'fr' THEN 10000 WHEN 'de' THEN 10000
                      WHEN 'es' THEN 2500 WHEN 'zh' THEN 1000 ELSE 0 END
    ORDER BY doc_id
    """,
    note="deterministic per-stratum (language) sampling via md5 gating — the data-mixing op; reproducible in any engine, stable under repartitioning",
)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``text.stratified_sample`` — upsample/downsample strata with
    md5-hash gates (InputSampler/MD5Filter discipline), not seeded
    Bernoulli draws: the keep-set is a pure function of ids."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return text_ops.stratified_sample(
        docs,
        "doc_id",
        "lang",
        rates={"en": 0.5, "fr": 1.0, "de": 1.0, "es": 0.25, "zh": 0.1},
    ).orderBy("doc_id")


@register(
    "quantize_embeddings",
    """
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS sc
      FROM embeddings
    )
    SELECT vec_id, ROUND(sc, 6) AS scale,
           array_to_string(
             CASE WHEN sc > 0
                  THEN list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / sc * 127) AS INT))
                  ELSE list_transform(embedding, x -> 0) END, '|') AS qvec
    FROM s ORDER BY vec_id
    """,
    note="symmetric int8 embedding quantization (scale = max|x|, q = round(x/scale*127)) — the 4x storage cut before ANN serving; row-local, zero shuffle",
)
def quantize_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry boundary serializes the int8 vector with '|' (list cells
    are unhashable in the driver's canonicalizer); the operator itself
    (similarity.quantize_embeddings) keeps the real array column."""
    out = similarity.quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return out.withColumn(
        "qvec", F.concat_ws("|", F.col("qvec").cast("array<string>"))
    ).orderBy("vec_id")


@register(
    "q7_volume_shipping",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
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
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - 0.1 * p.p_retailprice * l.l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS profit
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
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
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
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))
                         ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue,
           ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))
                         ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE), 4) AS promo_pct
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
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS total_rev
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
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    note="TPC-H Q17 shape: correlated per-part AVG subquery, decorrelated to an aggregate + join (decimal-exact mean)",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar AVG decorrelates to a per-partkey aggregate
    joined back — written in SQL so Catalyst's decorrelation does it
    (the q21/q22 discipline); the mean goes through DECIMAL so the
    `<` threshold compares identically in both engines."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_q17")
    _t(spark, sf_dir, "part").createOrReplaceTempView("p_q17")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 AS avg_yearly,
               COUNT(*) AS n_lines
        FROM li_q17 l JOIN p_q17 p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))
                              FROM li_q17 l2 WHERE l2.l_partkey = l.l_partkey)
        """
    )


@register(
    "q19_disjunctive_filter",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
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


@register(
    "tfidf_top_terms",
    r"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS cnt FROM tok GROUP BY doc_id, term),
    dl AS (SELECT doc_id, SUM(cnt) AS total FROM tf GROUP BY doc_id),
    dfreq AS (SELECT term, COUNT(*) AS dcnt FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    s AS (
      SELECT tf.doc_id, tf.term,
             (CAST(cnt AS DOUBLE) / total) * ln(CAST(n_docs AS DOUBLE) / dcnt) AS score
      FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN n
    ),
    r AS (
      SELECT doc_id, term, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
      FROM s
    )
    SELECT doc_id, term, ROUND(score, 6) AS tfidf, rk
    FROM r WHERE rk <= 3 ORDER BY doc_id, rk
    """,
    note="TF-IDF top-3 terms per document (keyword extraction): two partial-agg passes + one broadcast scalar + per-doc WindowGroupLimit",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keywords — the classic relevance weighting
    (Spärck Jones IDF), all partial-agg'd groupBys: tf on (doc, term),
    doc length on (doc), document frequency on (term), corpus size as a
    broadcast 1-row cross join.  Rank by UNROUNDED score with a term
    tie-break (identical double arithmetic in both engines), round only
    the emitted value — the registry determinism rules.  At 100 TB the
    only wide shuffle keys on term (document frequency); Zipf-head
    terms partial-aggregate map-side, so no skew blowup."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_fn_tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("cnt"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # doc length and document frequency as windows over the ONE tf
    # relation (instead of groupBy+rejoin, which makes Spark recompute
    # the token aggregation per branch): exactly three tf-sized
    # shuffles — (doc,term) agg, term window, doc window — and the
    # ranking window reuses the doc partitioning (no fourth exchange).
    s = (
        tf.withColumn(
            "dcnt", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .withColumn(
            "total", F.sum("cnt").over(Window.partitionBy("doc_id"))
        )
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            (F.col("cnt").cast("double") / F.col("total"))
            * F.log(F.col("n_docs").cast("double") / F.col("dcnt")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        s.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", F.round("score", 6).alias("tfidf"), "rk")
        .orderBy("doc_id", "rk")
    )


@register(
    "winnowing_fps",
    r"""
    WITH tok AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                            i -> array_to_string(toks[i:i+2], ' ')) AS grams
      FROM tok
    ),
    h AS (
      SELECT doc_id,
             list_transform(grams, x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)) AS hs
      FROM g
    ),
    w AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
                                                 i -> list_min(hs[i:i+3])))) AS fp
      FROM h
    )
    SELECT doc_id, fp FROM w ORDER BY doc_id, fp
    """,
    note="winnowing (MOSS) fingerprints: min-hash of each sliding window of 3-gram hashes — position-aware dedup fingerprints, row-local codegen",
)
def winnowing_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.winnowing_fingerprints(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=3, window=4
    ).orderBy("doc_id", "fp")


@register(
    "label_outliers",
    """
    WITH pos AS (
      SELECT vec_id, label, ord, CAST(embedding[ord] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(ord)
    ),
    cent AS (
      SELECT label, ord,
             CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
      FROM pos GROUP BY label, ord
    ),
    scored AS (
      SELECT p.vec_id, p.label,
             CAST(SUM(CAST(p.val * c.c AS DECIMAL(38,18))) AS DOUBLE) AS dot,
             CAST(SUM(CAST(p.val * p.val AS DECIMAL(38,18))) AS DOUBLE) AS nv,
             CAST(SUM(CAST(c.c * c.c AS DECIMAL(38,18))) AS DOUBLE) AS nc
      FROM pos p JOIN cent c ON c.label = p.label AND c.ord = p.ord
      GROUP BY p.vec_id, p.label
    ),
    r AS (
      SELECT vec_id, label, ROUND(dot / (sqrt(nv) * sqrt(nc)), 6) AS centroid_cos,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY ROUND(dot / (sqrt(nv) * sqrt(nc)), 6), vec_id) AS outlier_rank
      FROM scored
    )
    SELECT vec_id, label, centroid_cos, outlier_rank
    FROM r WHERE outlier_rank <= 5 ORDER BY label, outlier_rank
    """,
    note="embedding outlier detection: cosine to own-label mean centroid, bottom-5 per label (mislabel/off-distribution curation)",
)
def label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.label_centroid_outliers(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", "label", k=5
    ).orderBy("label", "outlier_rank")


@register(
    "source_ngram_overlap",
    r"""
    WITH tok AS (
      SELECT source, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT DISTINCT source,
             unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                                                 i -> array_to_string(toks[i:i+2], ' ')))) AS ng
      FROM tok
    ),
    sizes AS (SELECT source, COUNT(*) AS sz FROM g GROUP BY source),
    shared AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
      FROM g a JOIN g b ON a.ng = b.ng AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT src_a, src_b, n_shared,
           ROUND(CAST(n_shared AS DOUBLE) / least(sa.sz, sb.sz), 6) AS overlap_coef
    FROM shared
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    ORDER BY src_a, src_b
    """,
    note="cross-source 3-gram overlap matrix (train/eval leakage audit): distinct (source, ngram) self-join — fan-out bounded by #sources per ngram, never #docs",
)
def source_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise content overlap between corpus sources via distinct
    3-gram sets — the leakage/contamination audit between data mixes.
    The self-join keys on ngram AFTER per-source dedup, so each ngram
    contributes at most #sources rows per side: fan-out is bounded by
    #sources² per ngram regardless of corpus size (unlike a doc-level
    join).  At 100 TB, hash ngrams to 8-byte keys (md5_long) to shrink
    the shuffle payload."""
    from hadoop_20_spark.functions import shingles

    docs = _t(spark, sf_dir, "documents")
    g = docs.select(
        "source", F.explode(shingles("text", 3)).alias("ng")
    ).distinct()
    sizes = g.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    a = g.select(F.col("source").alias("src_a"), "ng")
    b = g.select(F.col("source").alias("src_b"), "ng")
    shared = (
        a.join(b, "ng")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("sz_b"))
    return (
        shared.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / F.least("sz_a", "sz_b"),
                6,
            ).alias("overlap_coef"),
        )
        .orderBy("src_a", "src_b")
    )


def _quantized_topk_oracle() -> str:
    """Quantize (the quantize_embeddings formula) then brute-force
    cosine top-5 over the int8 vectors — the serving-path check."""
    qz = """
      SELECT vec_id,
             CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
                  THEN list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE)
                                 / list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) * 127) AS INT))
                  ELSE list_transform(embedding, x -> 0) END AS qv
      FROM embeddings"""
    return f"""
    WITH qz AS ({qz}),
    q AS (SELECT vec_id AS query_id, qv AS q_vec FROM qz WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, qv AS n_vec FROM qz),
    scored AS (
      SELECT query_id, neighbor_id, {_sql_cos('q_vec', 'n_vec')} AS cosine_sim
      FROM c, q WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5"""


@register(
    "quantized_topk",
    None,  # oracle attached below (built from the shared cosine fragment)
    note="top-5 cosine retrieval over int8-quantized vectors (the post-quantization serving path): integer dots are exact in doubles, so both engines agree bit-for-bit",
)
def quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantization→serving round trip: quantize (symmetric int8,
    row-local), then brute-force cosine top-5 over the QUANTIZED
    vectors.  Cosine is scale-invariant, so per-vector scales drop out
    and the int8 vectors retrieve directly; every product
    (≤127²·64 ≈ 10⁶) is exactly representable in doubles, making the
    approximate path itself engine-deterministic.  Same plan as
    embedding_topk: broadcast query set, corpus never shuffles,
    per-query WindowGroupLimit."""
    q = similarity.quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    qd = q.select(
        "vec_id", F.col("qvec").cast("array<double>").alias("embedding")
    )
    return similarity.cosine_topk(
        qd, qd.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5
    )


REGISTRY["quantized_topk"] = Query(
    fn=REGISTRY["quantized_topk"].fn,
    oracle=_quantized_topk_oracle(),
    note=REGISTRY["quantized_topk"].note,
)


@register(
    "bigram_lm_topk",
    r"""
    WITH tok AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
      FROM documents
    ),
    big AS (
      SELECT t.pair[1] AS w1, t.pair[2] AS w2
      FROM tok, UNNEST(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                      i -> [toks[i], toks[i+1]])) AS t(pair)
      WHERE len(toks) >= 2
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS n12 FROM big GROUP BY w1, w2),
    s AS (
      SELECT w1, w2, n12, SUM(n12) OVER (PARTITION BY w1) AS n1 FROM c2
    ),
    r AS (
      SELECT w1, w2, n12, n1,
             ROUND(CAST(n12 AS DOUBLE) / n1, 6) AS p,
             ROW_NUMBER() OVER (PARTITION BY w1 ORDER BY n12 DESC, w2) AS rk
      FROM s
    )
    SELECT w1, w2, CAST(n12 AS BIGINT) AS n12, p, rk
    FROM r WHERE rk <= 3 AND n1 >= 50 ORDER BY w1, rk
    """,
    note="bigram LM table: top-3 continuations per token with conditional probability (count-ranked, probability emitted) — the n-gram-LM training artifact as two shuffles",
)
def bigram_lm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-a-bigram-LM as a query: P(w2|w1) = c(w1,w2)/c(w1), top-3
    continuations per head token (count-ranked with a w2 tie-break —
    integer ordering, so engine-identical; probability emitted rounded).
    The denominator comes from a window over the ONE bigram-count
    relation (the tfidf_top_terms lesson — no recomputed explode), and
    the ranking window shares the w1 partitioning.  Heads with n1 < 50
    are dropped (rare-head noise, and a stable output contract).  At
    100 TB: bigram extraction is row-local; the (w1,w2) count
    partial-aggregates map-side; Zipf-head w1 skew is absorbed by the
    same partial aggregation before either window."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    toks = _fn_tokens("text")
    pairs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
        ),
    )
    big = (
        docs.filter(F.size(toks) >= 2)
        .select(F.explode(pairs).alias("pr"))
        .select("pr.w1", "pr.w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    s = c2.withColumn("n1", F.sum("n12").over(Window.partitionBy("w1")))
    w = Window.partitionBy("w1").orderBy(F.col("n12").desc(), "w2")
    return (
        s.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") <= 3) & (F.col("n1") >= 50))
        .select(
            "w1",
            "w2",
            F.col("n12").cast("bigint").alias("n12"),
            F.round(F.col("n12").cast("double") / F.col("n1"), 6).alias("p"),
            "rk",
        )
        .orderBy("w1", "rk")
    )


@register(
    "dedup_rate_by_source",
    """
    WITH h AS (SELECT doc_id, source, md5(text) AS hh FROM documents),
    f AS (SELECT hh, MIN(doc_id) AS keeper FROM h GROUP BY hh)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_dupes,
           ROUND(CAST(SUM(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS dup_rate
    FROM h JOIN f USING (hh)
    GROUP BY source ORDER BY source
    """,
    note="per-source exact-duplicate rate (keeper = min doc_id per md5): the dedup yield report a curation run starts from; 32-byte-key shuffles only",
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-rate report per source — the first number a corpus
    curation pass produces (how much of each feed is redundant).  Same
    plan family as dedup_exact: shuffle keys are 32-byte md5 digests,
    never document bodies; keeper resolution is one partial-agg'd
    groupBy; the rate aggregation keys on the tiny source domain."""
    docs = _t(spark, sf_dir, "documents")
    h = docs.select("doc_id", "source", F.md5("text").alias("hh"))
    keep = h.groupBy("hh").agg(F.min("doc_id").alias("keeper"))
    dup = F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0)
    return (
        h.join(keep, "hh")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(dup).cast("bigint").alias("n_dupes"),
            F.round(
                F.sum(dup).cast("double") / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@register(
    "unigram_logprob",
    r"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS term
      FROM documents
    ),
    cnt AS (SELECT term, COUNT(*) AS n FROM tok GROUP BY term),
    tot AS (SELECT COUNT(*) AS t FROM tok),
    s AS (
      SELECT tok.doc_id, -ln(CAST(n AS DOUBLE) / t) AS nll
      FROM tok JOIN cnt USING (term) CROSS JOIN tot
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(CAST(SUM(CAST(nll AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 6) AS cross_entropy
    FROM s GROUP BY doc_id ORDER BY doc_id
    """,
    note="unigram LM cross-entropy per doc (CCNet-style perplexity filtering signal): corpus unigram probs -> per-doc mean -ln p(token), decimal-exact mean",
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram cross-entropy — the language-model quality
    signal corpus filters rank on (high = off-distribution/noise, low =
    repetitive/boilerplate): H(doc) = mean of -ln p(token) under the
    corpus unigram distribution.

    Determinism: the mean sums ln-values in DECIMAL(38,18) (fp addition
    order would differ by partitioning); ln/division are identical IEEE
    doubles in both engines.  Scale: one term-count shuffle (Zipf-head
    terms partial-aggregate map-side), then tok⋈vocab on term — the
    vocab side is a derived aggregate, so it carries no forced hint and
    AQE broadcasts it when it fits (typical: vocab ≪ corpus) — then a
    per-doc aggregation."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_fn_tokens("text")).alias("term"))
    cnt = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    tot = tok.agg(F.count(F.lit(1)).alias("t"))
    nll = -F.log(F.col("n").cast("double") / F.col("t"))
    return (
        tok.join(cnt, "term")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", nll.alias("nll"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(F.col("nll").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("cross_entropy"),
        )
        .orderBy("doc_id")
    )


@register(
    "cdc_chunks",
    r"""
    WITH tok AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
      FROM documents WHERE len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) >= 1
    ),
    b AS (
      SELECT doc_id, toks,
             list_filter(range(1, greatest(len(toks), 1) + 1),
                         i -> CAST(('0x' || substr(md5(toks[i]), 1, 15)) AS BIGINT) % 8 = 0) AS bpos
      FROM tok
    ),
    r AS (
      SELECT doc_id, toks,
             list_prepend(1, list_transform(bpos, p -> p + 1)) AS starts,
             list_append(bpos, len(toks)) AS ends
      FROM b
    ),
    c AS (
      SELECT doc_id, j, starts[j] AS s, ends[j] AS e, toks
      FROM r, UNNEST(range(1, len(starts) + 1)) AS t(j)
      WHERE starts[j] <= ends[j]
    )
    SELECT doc_id,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j) AS chunk_idx,
           md5(array_to_string(toks[s:e], ' ')) AS chunk_hash,
           e - s + 1 AS n_tokens
    FROM c ORDER BY doc_id, chunk_idx
    """,
    note="content-defined chunking (rsync/LBFS): md5-gated token boundaries, shift-resistant chunk hashes for delta-dedup; row-local codegen, explode-only widening",
)
def cdc_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.cdc_chunks(
        _t(spark, sf_dir, "documents"), "doc_id", "text", boundary_bits=3
    ).orderBy("doc_id", "chunk_idx")


def _driver_seen() -> frozenset[str]:
    """Names with a green row in any per-round driver correctness file
    (CORRECTNESS_r*.json at the repo root).  queries() lists
    not-yet-driver-verified entries FIRST so that if the driver samples
    a prefix, every registry query accumulates a driver-green row across
    rounds.  Derived from the files (not hardcoded) so renames/typos
    can't silently no-op and failed rows (err set) are re-offered."""
    import json
    from pathlib import Path

    seen: set[str] = set()
    root = Path(__file__).resolve().parent.parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("err") is None
                and row.get("rows_match") is not False
                and row.get("hash_match") is not False
            ):
                seen.add(name)
    return frozenset(seen & set(REGISTRY))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    seen = _driver_seen()
    ordered = sorted(REGISTRY.items(), key=lambda kv: kv[0] in seen)
    return {name: q.fn for name, q in ordered}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}

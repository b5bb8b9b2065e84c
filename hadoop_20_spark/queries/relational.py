"""Classic relational / MapReduce-idiom queries (SURVEY §2.3–2.9): aggregation descriptors, row transforms, joins, sorts, windows, set ops, scalar surface, generators.

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

@register(
    "agg_descriptors",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS longvaluesum_l_linenumber,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS doublevaluesum_l_extendedprice,
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
           (ROUND(quantile_cont(freq, 0.5), 6) + 0) AS median_freq,
           CAST(MAX(freq) AS BIGINT) AS max_freq,
           (ROUND(CAST(SUM(freq) AS DOUBLE) / COUNT(*), 6) + 0) AS avg_freq,
           (ROUND(sqrt((CAST(SUM(freq*freq) AS DOUBLE) - CAST(SUM(freq) AS DOUBLE) * SUM(freq) / COUNT(*)) / COUNT(*)), 6) + 0) AS stddev_freq
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
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
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
           CAST(CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS O,
           CAST(CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS F
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
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
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
           CAST(CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(28,6))), 0) AS VARCHAR) AS DOUBLE) AS total_spent
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
           (ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) + 0) AS running_value
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
           (ROUND(value - COALESCE(LAG(value) OVER w, 0), 6) + 0) AS delta_prev,
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
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS month_revenue
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
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_value
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
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue
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
           (ROUND(PERCENT_RANK() OVER w, 6) + 0) AS pct_rank,
           (ROUND(CUME_DIST() OVER w, 6) + 0) AS cume,
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
           (ROUND(COALESCE(MAX(gap_s), 0.0), 6) + 0) AS max_gap_s
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
    "grouping_sets_agg",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_price,
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
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sum_price,
               COUNT(*) AS n_orders,
               CAST(GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS BIGINT) AS grp_id
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY grp_id, o_orderstatus, o_orderpriority
        """
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
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_value
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
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_value
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


@register(
    "trailing_window_sum",
    """
    SELECT event_id, user_id, ts,
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,6)))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
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
           (ROUND(4.0 * SUM(CASE WHEN (x - 0.5) * (x - 0.5) + (y - 0.5) * (y - 0.5) <= 0.25
                                THEN 1 ELSE 0 END) / COUNT(*), 6) + 0) AS pi_estimate
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
    reference idiom: one job per stage, DistributedCache'd outputs).
    Plan A/B twin: ``funnel_conversion`` (queries/events.py) computes
    the same stages in nested windows over a single user shuffle and
    emits the long-form conversion table."""
    ev = _t(spark, sf_dir, "events")
    # each stage table feeds the NEXT stage's join and its own count —
    # persist the small per-user stage relations so a stage's
    # conditional-min shuffle runs once, not once per consumer
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .persist()
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .persist()
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
    # constant key: per-day aggregate (~bounded days), not a fact path
    w = Window.partitionBy(F.col("n_new") % 1).orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        "d",
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cumulative_users"),
    ).orderBy("d")


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
           (ROUND(log2(CAST(p_size AS DOUBLE)), 6) + 0) AS size_log2,
           (ROUND(degrees(CAST(p_size AS DOUBLE) / 50.0), 6) + 0) AS size_deg,
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
           (ROUND(percent_rank() OVER w, 6) + 0) AS pct_rank,
           (ROUND(cume_dist() OVER w, 6) + 0) AS cume,
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
    "snapshot_diff",
    f"""
    WITH prev AS (
      SELECT o_orderkey,
             CASE WHEN {_sql_md5_long("'mod_' || CAST(o_orderkey AS VARCHAR)")} % 10 = 0
                  THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders
      WHERE {_sql_md5_long("'del_' || CAST(o_orderkey AS VARCHAR)")} % 20 <> 0
    ),
    cur AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      WHERE {_sql_md5_long("'ins_' || CAST(o_orderkey AS VARCHAR)")} % 20 <> 0
    ),
    d AS (
      SELECT COALESCE(c.o_orderkey, p.o_orderkey) AS k,
             CASE WHEN p.o_orderkey IS NULL THEN 'inserted'
                  WHEN c.o_orderkey IS NULL THEN 'deleted'
                  WHEN md5(CAST(c.o_totalprice AS VARCHAR) || '|' || c.o_orderstatus)
                       <> md5(CAST(p.o_totalprice AS VARCHAR) || '|' || p.o_orderstatus)
                       THEN 'changed'
                  ELSE 'unchanged' END AS change_type
      FROM cur c FULL OUTER JOIN prev p ON p.o_orderkey = c.o_orderkey
    )
    SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM d GROUP BY change_type ORDER BY change_type
    """,
    note=(
        "batch CDC snapshot diff: full outer join of two table versions on the key, rows "
        "classified inserted/deleted/changed/unchanged by md5 row fingerprint — the "
        "incremental-load reconciliation op; both snapshots derived deterministically "
        "(md5-gated drops/mutations) so the oracle reproduces them"
    ),
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table snapshots: 'previous' and
    'current' versions of orders (derived deterministically — md5-gated
    5% deletions on each side playing deletes/inserts, 10% price
    mutations playing updates), full-outer-joined on the key and
    classified by comparing md5 fingerprints of the value columns.
    This is the nightly reconciliation op a warehouse runs when a
    source cannot stream deltas — the reference did it with a
    two-input identity-join MapReduce.

    Scale plan: ONE key-keyed shuffle (both snapshots hash-partition on
    o_orderkey for the full outer join); the fingerprint comparison is
    row-local (32-byte md5 of the '|'-framed value columns — compare
    hashes, not wide rows, when columns are many); the verdict
    aggregate has a 4-value key.  At 100 TB bucket both snapshots by
    the key to make the diff zero-shuffle (the CompositeInputFormat
    precondition the reference required)."""
    from hadoop_20_spark.functions import md5_long

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    kstr = F.col("o_orderkey").cast("string")
    prev = o.where(
        md5_long(F.concat(F.lit("del_"), kstr)) % 20 != 0
    ).select(
        "o_orderkey",
        F.when(md5_long(F.concat(F.lit("mod_"), kstr)) % 10 == 0,
               F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))
        .alias("p_price"),
        F.col("o_orderstatus").alias("p_status"),
    )
    cur = o.where(md5_long(F.concat(F.lit("ins_"), kstr)) % 20 != 0).select(
        "o_orderkey",
        F.col("o_totalprice").alias("c_price"),
        F.col("o_orderstatus").alias("c_status"),
    )
    fp = lambda price, status: F.md5(  # noqa: E731
        F.concat(F.col(price).cast("string"), F.lit("|"), F.col(status))
    )
    d = cur.join(prev, "o_orderkey", "full_outer").select(
        F.when(F.col("p_status").isNull(), "inserted")
        .when(F.col("c_status").isNull(), "deleted")
        .when(fp("c_price", "c_status") != fp("p_price", "p_status"), "changed")
        .otherwise("unchanged")
        .alias("change_type")
    )
    return (
        d.groupBy("change_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .orderBy("change_type")
    )


@register(
    "incremental_agg_maintenance",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS total_price,
           (ROUND(MIN(o_totalprice), 6) + 0) AS min_price,
           (ROUND(MAX(o_totalprice), 6) + 0) AS max_price,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(28,6)) * 1000000 AS BIGINT))
                // COUNT(*) AS BIGINT) AS avg_price_micros
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    note=(
        "incremental materialized-view maintenance: the view's aggregate state (count, "
        "decimal sum, min, max) is computed on a BASE partition and a DELTA batch "
        "separately, then MERGED by the partial-aggregate algebra (counts/sums add, "
        "min/max fold, avg re-derived from merged sum/count) — the oracle recomputes from "
        "scratch, proving merge == recompute; the combine step a 100 TB incremental "
        "pipeline runs instead of rescanning history"
    ),
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Algebraic view maintenance: maintain a per-priority order summary
    under batch ingest WITHOUT rescanning history.  The corpus is split
    deterministically into a base partition (90%) and a delta batch
    (o_orderkey % 10 == 0); each side computes the same aggregate STATE
    (count, DECIMAL sum, integer micros sum, min, max — all algebraic:
    their partials combine associatively), and the published view is
    the MERGE of the two states, with derived columns (average)
    recomputed from merged state.  The oracle aggregates the whole table directly — the check
    that merge-of-partials equals recompute, which is the entire
    correctness argument for incremental pipelines.

    Scale plan: this is literally Spark's partial/final aggregation
    contract lifted to the pipeline level — each batch's state is one
    partial-agg'd shuffle over THAT batch only; the merge aggregates
    |priorities| x 2 state rows.  Averages must never be averaged:
    avg merges only via (sum, count).  The micros sum is per-ROW
    decimal-to-long (28-digit headroom, exact); multiplying the merged
    DECIMAL(38,6) sum by 1e6 instead would exceed Spark's 38-digit cap
    and silently ROUND under allowPrecisionLoss — measured as an
    off-by-one in the floor quotient, which is why the integer state
    column exists."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("s"),
            F.sum(
                (F.col("o_totalprice").cast("decimal(28,6)") * 1000000)
                .cast("long")
            ).alias("s_micros"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )

    base = state(o.where(F.col("o_orderkey") % 10 != 0))
    delta = state(o.where(F.col("o_orderkey") % 10 == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.sum("s_micros").alias("s_micros"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return merged.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n_orders"),
        F.col("s").cast("double").alias("total_price"),
        F.round("mn", 6).alias("min_price"),
        F.round("mx", 6).alias("max_price"),
        F.expr("s_micros DIV n").cast("long").alias("avg_price_micros"),
    ).orderBy("o_orderpriority")


@register(
    "grouped_topk_combined",
    """
    SELECT o_orderpriority, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    ORDER BY o_orderpriority, rn
    """,
    note=(
        "grouped top-k via the EXPLICIT sublinear combiner (Arrow-batched local "
        "sort + groupby-head per partition, exchange carries <= partitions*groups*k "
        "candidates); measured equal in shuffle volume (15 records at sf0.1) to "
        "Spark's own WindowGroupLimit rewrite of the rank<=k window — the operator "
        "is for per-group selections the rank rewrite can't see; equivalence "
        "certified against the window form"
    ),
)
def grouped_topk_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price within each order priority through the
    EXPLICIT combiner: each scan partition emits at most groups*k = 15
    candidate rows with NO shuffle, and the exact ranking window runs
    over <= partitions*15 rows — O(P*G*k) shuffle volume independent of
    fact size, the same posture as misra_gries_heavy_hitters and the
    skyline's local pass.

    Measured honesty (operators/sort.py docstring): Spark's own
    WindowGroupLimit rewrite gives the plain rank<=k window the SAME
    15-record shuffle on this query, so for pure rank predicates the
    builtin suffices; the explicit operator is the general form for
    selections beyond rank filters, and this query certifies its
    EQUIVALENCE to the builtin path against the oracle.  Ties are
    broken by o_orderkey so the candidate set and ranks are
    deterministic under any partitioning.
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    out = sort_ops.top_k_per_group_combined(
        orders,
        group_cols=["o_orderpriority"],
        sort_cols=["o_totalprice", "o_orderkey"],
        ascending=[False, True],
        k=3,
    )
    return out.select(
        "o_orderpriority",
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.col("rn").cast("long").alias("rn"),
    ).orderBy("o_orderpriority", "rn")


@register(
    "null_semantics_audit",
    """
    WITH t AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 10 = 0 THEN NULL
                  ELSE o_orderkey % 7 END AS b
      FROM orders
    ),
    probe AS (SELECT DISTINCT b FROM t WHERE b IS NULL OR b < 3)
    SELECT 'count_col' AS check_name, CAST(COUNT(b) AS BIGINT) AS value FROM t
    UNION ALL
    SELECT 'count_star', CAST(COUNT(*) AS BIGINT) FROM t
    UNION ALL
    SELECT 'distinct_excl_null', CAST(COUNT(DISTINCT b) AS BIGINT) FROM t
    UNION ALL
    SELECT 'null_safe_matches',
           CAST((SELECT COUNT(*) FROM probe a JOIN probe c
                 ON a.b IS NOT DISTINCT FROM c.b) AS BIGINT)
    UNION ALL
    SELECT 'not_in_with_null',
           CAST((SELECT COUNT(*) FROM t
                 WHERE b NOT IN (SELECT b FROM probe)) AS BIGINT)
    UNION ALL
    SELECT 'sum_all_null_group',
           CAST(COALESCE((SELECT SUM(b) FROM t WHERE b IS NULL), -1) AS BIGINT)
    ORDER BY check_name
    """,
    note=(
        "NULL-semantics parity battery: count(*) vs count(col), distinct excluding "
        "NULL, null-safe equality join (<=> / IS NOT DISTINCT FROM), the NOT IN "
        "with a NULL in the subquery trap (always-empty), and SUM over an all-NULL "
        "group — the ANSI edge semantics both engines must agree on for every other "
        "oracle in this repo to be trustworthy"
    ),
)
def null_semantics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-parity on the NULL edge cases every query silently relies
    on: aggregate NULL skipping, DISTINCT's NULL exclusion, null-safe
    equality (Spark ``<=>`` == ANSI IS NOT DISTINCT FROM), the NOT IN
    + NULL three-valued-logic trap (result is provably EMPTY — emitted
    as a count so a future engine change screams), and NULL sums.  The
    rest of the registry assumes these agree between Spark and the
    DuckDB oracle; this query pins each one as data.

    Scale plan: one scan of orders feeding row-local derivations; every
    check is a scalar aggregate over it (the integrity_checks shape);
    the null-safe join runs on an <=8-row distinct relation.
    """
    orders = _t(spark, sf_dir, "orders")
    t = orders.select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_orderkey") % 7)
        .alias("b"),
    ).localCheckpoint()  # shared by six scalar checks — cut once
    probe = t.filter(F.col("b").isNull() | (F.col("b") < 3)).select("b").distinct()

    def one(name, df_agg):
        return df_agg.select(
            F.lit(name).alias("check_name"), F.col("value").cast("long").alias("value")
        )

    a = probe.alias("a")
    c = probe.alias("c")
    checks = [
        one("count_col", t.agg(F.count("b").alias("value"))),
        one("count_star", t.agg(F.count(F.lit(1)).alias("value"))),
        one("distinct_excl_null", t.agg(F.countDistinct("b").alias("value"))),
        one(
            "null_safe_matches",
            a.join(c, F.col("a.b").eqNullSafe(F.col("c.b"))).agg(
                F.count(F.lit(1)).alias("value")
            ),
        ),
        one(
            "not_in_with_null",
            t.join(probe.withColumnRenamed("b", "pb"), F.expr("true"), "cross")
            .groupBy("k", "b")
            .agg(
                F.max(F.when(F.col("b") == F.col("pb"), 1).otherwise(0)).alias("eq"),
                F.max(F.col("pb").isNull().cast("int")).alias("has_null"),
            )
            # NOT IN is false if any match, UNKNOWN if a NULL is present
            # and no match — only rows with no match AND no NULL survive
            .filter((F.col("eq") == 0) & (F.col("has_null") == 0))
            .agg(F.count(F.lit(1)).alias("value")),
        ),
        one(
            "sum_all_null_group",
            t.filter(F.col("b").isNull()).agg(
                F.coalesce(F.sum("b"), F.lit(-1)).alias("value")
            ),
        ),
    ]
    out = checks[0]
    for df in checks[1:]:
        out = out.unionByName(df)
    return out.orderBy("check_name")

"""Optimizer-statistics / reshape queries (split from relational.py in
round 6 at the 2k-line threshold — same seam as the round-5 text_dedup
split): ANALYZE-style table stats, equi-depth histograms, approximate
quantiles, join-key skew audit, and the unpivot/melt reshape.

Behavior-identical move; REGISTRY names, oracles, and notes unchanged.
Imported by queries/__init__ immediately after `relational`, so the
global REGISTRY order is byte-identical to the pre-split order (these
definitions were the tail of relational.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from hadoop_20_spark.queries._base import (  # noqa: F401
    REGISTRY,
    Query,
    _sql_md5_long,
    _t,
    register,
)

@register(
    "approx_quantiles",
    """
    SELECT l_returnflag,
           (ROUND(CAST(median(l_extendedprice) AS DOUBLE), 6) + 0) AS exact_median,
           TRUE AS within_tol
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    note="approx_percentile (GK sketch) with the approx_distinct tolerance contract: estimate within 2% of the exact median per group, plus the exact median — the sketch differs per engine/merge order, the tolerance row does not",
)
def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate median via Spark's GK-sketch ``approx_percentile``
    checked against the exact sort-based median: the sketch's merge
    order varies with partitioning, so the oracle-checkable contract
    is the 2%-relative tolerance row (robust to any merge order at the
    configured accuracy) plus the exact value.  At 100 TB the
    approximate path is the default (one pass, bounded memory) with
    the exact twin reserved for audits — the §2.5 UniqValueCount
    story, applied to quantiles."""
    li = _t(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("_exact")
    )
    approx = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("_approx")
    )
    return (
        exact.join(approx, "l_returnflag")
        .select(
            "l_returnflag",
            F.round(F.col("_exact").cast("double"), 6).alias("exact_median"),
            (
                F.abs(F.col("_approx") - F.col("_exact")) / F.abs(F.col("_exact"))
                <= 0.02
            ).alias("within_tol"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "join_key_skew_audit",
    """
    WITH per_key AS (
      SELECT l_orderkey, COUNT(*) AS c FROM lineitem GROUP BY l_orderkey
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(SUM(c) AS BIGINT) AS n_rows FROM per_key)
    SELECT c AS rows_per_key,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           (ROUND(CAST(COUNT(*) AS DOUBLE) / tot.n_keys, 6) + 0) AS key_share,
           (ROUND(CAST(c * COUNT(*) AS DOUBLE) / tot.n_rows, 6) + 0) AS row_share
    FROM per_key CROSS JOIN tot
    GROUP BY c, tot.n_keys, tot.n_rows
    ORDER BY rows_per_key
    """,
    note="join-key skew audit: rows-per-key frequency histogram over the lineitem fact join key with key/row shares — the pre-join diagnostic that decides between plain shuffle, AQE skew-join, and salting",
)
def join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of fact-table rows per join key (l_orderkey): for
    each multiplicity, how many keys have it and what share of keys and
    rows they carry.  A long-tailed row_share at high multiplicities is
    the signal to salt or enable AQE skew-join BEFORE running the join
    — the audit the skew-salted join (operators/joins.py) assumes has
    been run.

    Scale plan: the ONLY fact-scale work is the per-key count (one
    partial-agg'd shuffle on the join key itself); the second groupBy
    runs on the tiny multiplicity domain, and the key/row totals are
    window sums over the aggregated histogram rows — the fact relation
    is scanned and shuffled exactly once (the token_length_histogram
    denominator discipline).  All shares are exact integer ratios
    rounded once."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("c"))
    hist = per_key.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("n_keys_at"))
    # non-foldable constant partition key (the corpus_stats `% 1`
    # idiom; a bare lit is constant-folded back to an empty spec):
    # aggregated-histogram relation, warning-free WindowExec log
    w = Window.partitionBy(F.col("c") % 1)
    return (
        hist.select(
            F.col("c").alias("rows_per_key"),
            F.col("n_keys_at").alias("n_keys"),
            F.round(
                F.col("n_keys_at").cast("double") / F.sum("n_keys_at").over(w), 6
            ).alias("key_share"),
            F.round(
                (F.col("c") * F.col("n_keys_at")).cast("double")
                / F.sum(F.col("c") * F.col("n_keys_at")).over(w),
                6,
            ).alias("row_share"),
        )
        .orderBy("rows_per_key")
    )


@register(
    "analyze_table_stats",
    """
    WITH s AS (SELECT * FROM orders)
    SELECT 'o_custkey' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv,
           (ROUND(MIN(o_custkey), 6) + 0) AS min_num,
           (ROUND(MAX(o_custkey), 6) + 0) AS max_num,
           NULL AS min_str, NULL AS max_str
    FROM s
    UNION ALL
    SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate),
           (ROUND(EPOCH(MIN(o_orderdate)), 6) + 0), (ROUND(EPOCH(MAX(o_orderdate)), 6) + 0),
           NULL, NULL
    FROM s
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority), NULL, NULL,
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM s
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus), NULL, NULL,
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM s
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           (ROUND(MIN(o_totalprice), 6) + 0), (ROUND(MAX(o_totalprice), 6) + 0),
           NULL, NULL
    FROM s
    ORDER BY column_name
    """,
    note="ANALYZE-style table statistics collection (per-column rows/nulls/NDV/min/max over orders) — the CBO stats input; exact NDV here for the oracle, approx_count_distinct is the documented 100 TB path",
)
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column statistics for the optimizer (the ANALYZE TABLE ...
    COMPUTE STATISTICS FOR COLUMNS shape): row count, null count, NDV,
    min/max (numerics and timestamps as epoch-second doubles, strings
    verbatim).  One wide aggregate over a single scan, unpivoted to the
    per-column long form driver-side from its SINGLE row — no stack
    shuffle, no per-column rescans.

    Exact COUNT(DISTINCT) over several columns expands the input
    (one replica per distinct-aggregate) — acceptable for a stats
    collector at any scale the fixture runs, but the documented 100 TB
    default swaps in approx_count_distinct (HLL, one pass, no expand)
    with this exact form reserved for audits — the same
    exact/approximate twin contract as uniq_value_count."""
    o = _t(spark, sf_dir, "orders")
    num_cols = ["o_custkey", "o_totalprice"]
    str_cols = ["o_orderpriority", "o_orderstatus"]
    ts_cols = ["o_orderdate"]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in num_cols + str_cols + ts_cols:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"_ndv_{c}"),
        ]
    for c in num_cols:
        aggs += [
            F.round(F.min(c).cast("double"), 6).alias(f"_min_{c}"),
            F.round(F.max(c).cast("double"), 6).alias(f"_max_{c}"),
        ]
    for c in ts_cols:
        aggs += [
            F.round(F.unix_timestamp(F.min(c)).cast("double"), 6).alias(f"_min_{c}"),
            F.round(F.unix_timestamp(F.max(c)).cast("double"), 6).alias(f"_max_{c}"),
        ]
    for c in str_cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    wide = o.agg(*aggs)
    rows = []
    for c in sorted(num_cols + str_cols + ts_cols):
        is_str = c in str_cols
        rows.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_n").cast("long").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).cast("long").alias("n_nulls"),
                F.col(f"_ndv_{c}").cast("long").alias("ndv"),
                (F.lit(None).cast("double") if is_str else F.col(f"_min_{c}")).alias(
                    "min_num"
                ),
                (F.lit(None).cast("double") if is_str else F.col(f"_max_{c}")).alias(
                    "max_num"
                ),
                (F.col(f"_min_{c}") if is_str else F.lit(None).cast("string")).alias(
                    "min_str"
                ),
                (F.col(f"_max_{c}") if is_str else F.lit(None).cast("string")).alias(
                    "max_str"
                ),
            )
        )
    return (
        wide.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
        .orderBy("column_name")
    )


@register(
    "equi_depth_histogram",
    """
    WITH b AS (
      SELECT quantile_cont(o_totalprice, 0.125) AS b1,
             quantile_cont(o_totalprice, 0.250) AS b2,
             quantile_cont(o_totalprice, 0.375) AS b3,
             quantile_cont(o_totalprice, 0.500) AS b4,
             quantile_cont(o_totalprice, 0.625) AS b5,
             quantile_cont(o_totalprice, 0.750) AS b6,
             quantile_cont(o_totalprice, 0.875) AS b7
      FROM orders
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           (ROUND(MIN(p), 6) + 0) AS lo, (ROUND(MAX(p), 6) + 0) AS hi
    FROM (
      SELECT o_totalprice AS p,
             CAST(1 + (CASE WHEN o_totalprice > b.b1 THEN 1 ELSE 0 END)
                    + (CASE WHEN o_totalprice > b.b2 THEN 1 ELSE 0 END)
                    + (CASE WHEN o_totalprice > b.b3 THEN 1 ELSE 0 END)
                    + (CASE WHEN o_totalprice > b.b4 THEN 1 ELSE 0 END)
                    + (CASE WHEN o_totalprice > b.b5 THEN 1 ELSE 0 END)
                    + (CASE WHEN o_totalprice > b.b6 THEN 1 ELSE 0 END)
                    + (CASE WHEN o_totalprice > b.b7 THEN 1 ELSE 0 END) AS BIGINT)
               AS bucket
      FROM orders CROSS JOIN b
    )
    GROUP BY bucket ORDER BY bucket
    """,
    note="equi-depth (CBO-style) 8-bucket histogram over o_totalprice: exact septile boundaries + per-bucket count/lo/hi — built boundaries-then-count, never a global NTILE window",
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The optimizer's equi-depth histogram (the `analyze_table_stats`
    companion): 8 buckets of ~equal row count over o_totalprice, each
    with its row count and value range.

    Scale plan: NTILE(8) OVER (ORDER BY price) — the textbook spelling —
    is an Exchange SinglePartition (every row through one task).
    Instead: pass 1 computes the 7 boundary septiles (one aggregate;
    `percentile` here for oracle-exactness, `approx_percentile` is the
    documented 100 TB swap with the identical plan), pass 2 broadcasts
    the 1-row boundary set and counts per bucket — both passes fully
    parallel, bucket assignment row-local.  Boundary ties go to the
    lower bucket (strict > comparisons) in both engines."""
    o = _t(spark, sf_dir, "orders")
    probs = [i / 8 for i in range(1, 8)]
    bounds = o.agg(
        *[F.percentile("o_totalprice", p).alias(f"_b{i}") for i, p in enumerate(probs, 1)]
    )
    bucket = F.lit(1)
    for i in range(1, 8):
        bucket = bucket + F.when(F.col("o_totalprice") > F.col(f"_b{i}"), 1).otherwise(0)
    return (
        o.crossJoin(F.broadcast(bounds))
        .select(F.col("o_totalprice").alias("p"), bucket.cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.min("p"), 6).alias("lo"),
            F.round(F.max("p"), 6).alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "unpivot_metrics",
    """
    SELECT l_returnflag, metric, (ROUND(amount, 6) + 0) AS amount
    FROM (
      SELECT l_returnflag,
             (ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,6))), 6) + 0) AS extendedprice,
             (ROUND(SUM(CAST(l_discount AS DECIMAL(28,6))), 6) + 0) AS discount,
             (ROUND(SUM(CAST(l_tax AS DECIMAL(28,6))), 6) + 0) AS tax
      FROM lineitem GROUP BY l_returnflag
    )
    UNPIVOT (amount FOR metric IN (extendedprice, discount, tax))
    ORDER BY l_returnflag, metric
    """,
    note="UNPIVOT/melt: wide per-flag decimal-exact sums rotated to (flag, metric, amount) long form — Spark DataFrame.unpivot vs SQL UNPIVOT, rotation happens on the tiny aggregated relation",
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The melt operator (inverse of pivot_agg): aggregate FIRST, then
    rotate the 3 metric columns of the tiny per-flag result into long
    form with ``DataFrame.unpivot`` — rotating before aggregating would
    triple the fact rows through the shuffle for no reason (the same
    aggregate-then-reshape discipline as analyze_table_stats).  Sums in
    DECIMAL for engine-exact parity; cast to double at emission
    (unpivot requires a common value type)."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        *[
            F.round(F.sum(F.col(c).cast("decimal(28,6)")), 6)
            .cast("double")
            .alias(a)
            for c, a in [
                ("l_extendedprice", "extendedprice"),
                ("l_discount", "discount"),
                ("l_tax", "tax"),
            ]
        ]
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["extendedprice", "discount", "tax"],
            variableColumnName="metric",
            valueColumnName="amount",
        )
        .select("l_returnflag", "metric", F.round("amount", 6).alias("amount"))
        .orderBy("l_returnflag", "metric")
    )


@register(
    "rfm_segments",
    """
    WITH cust AS (
      SELECT o_custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_d,
             COUNT(*) AS f,
             SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS m_dec
      FROM orders GROUP BY o_custkey
    ),
    snap AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS s FROM orders),
    c2 AS (
      SELECT o_custkey,
             date_diff('day', last_d, (SELECT s FROM snap)) AS r,
             f, m_dec
      FROM cust
    ),
    u AS (
      SELECT 'r' AS dim, CAST(r AS DECIMAL(38,6)) AS val FROM c2
      UNION ALL SELECT 'f', CAST(f AS DECIMAL(38,6)) FROM c2
      UNION ALL SELECT 'm', CAST(m_dec AS DECIMAL(38,6)) FROM c2
    ),
    h AS (SELECT dim, val, COUNT(*) AS k FROM u GROUP BY 1, 2),
    cdf AS (
      SELECT dim, val,
             SUM(k) OVER (PARTITION BY dim ORDER BY val
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(k) OVER (PARTITION BY dim) AS tot
      FROM h
    ),
    thr AS (
      SELECT dim,
             MIN(CASE WHEN cum * 4 >= tot THEN val END) AS t1,
             MIN(CASE WHEN cum * 2 >= tot THEN val END) AS t2,
             MIN(CASE WHEN cum * 4 >= tot * 3 THEN val END) AS t3
      FROM cdf GROUP BY dim
    ),
    b AS (
      SELECT MAX(CASE WHEN dim = 'r' THEN t1 END) AS r1,
             MAX(CASE WHEN dim = 'r' THEN t2 END) AS r2,
             MAX(CASE WHEN dim = 'r' THEN t3 END) AS r3,
             MAX(CASE WHEN dim = 'f' THEN t1 END) AS f1,
             MAX(CASE WHEN dim = 'f' THEN t2 END) AS f2,
             MAX(CASE WHEN dim = 'f' THEN t3 END) AS f3,
             MAX(CASE WHEN dim = 'm' THEN t1 END) AS m1,
             MAX(CASE WHEN dim = 'm' THEN t2 END) AS m2,
             MAX(CASE WHEN dim = 'm' THEN t3 END) AS m3
      FROM thr
    ),
    scored AS (
      SELECT CAST(m_dec * 1000000 AS BIGINT) AS m_units,
             5 - (1 + CASE WHEN r > b.r1 THEN 1 ELSE 0 END
                    + CASE WHEN r > b.r2 THEN 1 ELSE 0 END
                    + CASE WHEN r > b.r3 THEN 1 ELSE 0 END) AS r_score,
             1 + CASE WHEN f > b.f1 THEN 1 ELSE 0 END
               + CASE WHEN f > b.f2 THEN 1 ELSE 0 END
               + CASE WHEN f > b.f3 THEN 1 ELSE 0 END AS f_score,
             1 + CASE WHEN m_dec > b.m1 THEN 1 ELSE 0 END
               + CASE WHEN m_dec > b.m2 THEN 1 ELSE 0 END
               + CASE WHEN m_dec > b.m3 THEN 1 ELSE 0 END AS m_score
      FROM c2 CROSS JOIN b
    )
    SELECT CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(m_units) // COUNT(*) AS BIGINT) AS avg_monetary_micros
    FROM scored GROUP BY 1 ORDER BY 1
    """,
    note=(
        "RFM customer segmentation: recency/frequency/monetary quartile scores (1-4 each, "
        "segment = RFM digits) with DISCRETE-CDF quartile boundaries (smallest value whose "
        "cumulative count reaches the quantile, all comparisons decimal/integer-exact) — "
        "boundaries-then-score, never a per-dimension NTILE window; monetary rides DECIMAL "
        "end to end, no interpolated quantile anywhere"
    ),
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic RFM segmentation over orders: per customer, recency
    (days since last order at the corpus snapshot), frequency (order
    count) and monetary (decimal-exact total spend) are each scored
    into quartiles (recency reversed — recent is good), and customers
    roll up into the 3-digit RFM segments with counts and FLOORED
    integer-micros average spend (a 6dp ROUND of the average lands on
    exact decimal .5 ties — sums of 6dp decimals divided by small
    counts — where engines round differently; the floor of an exact
    integer quotient cannot diverge: the SCALE.md rounding-trap rule).

    Quartile boundaries are DISCRETE percentiles (smallest value whose
    per-dimension CDF reaches 25/50/75%), the quality_gate_adaptive
    discipline: interpolated quantiles (F.percentile vs DuckDB
    quantile_cont) compute ``(1-d)*lo+d*hi`` vs ``lo+d*(hi-lo)`` —
    expressions that can differ by 1 ulp on the double monetary axis
    and flip a knife-edge customer's quartile.  Here every boundary is
    an actual data value carried as DECIMAL(28,6), every comparison is
    exact, and boundary ties go to the lower quartile in both engines.

    Scale plan: ONE custkey shuffle builds the per-customer triple; the
    three dimensions stack into a (dim, val) histogram whose CDF
    windows partition by dim over the AGGREGATED relation (r/f domains
    are small; monetary distinct values approach customer count — at
    100 TB swap that dimension to `approx_percentile` or a
    `distributed_cumsum`-bucketed CDF, same boundary semantics);
    boundaries pivot to ONE broadcast row; scoring is row-local
    strict-> decimal comparisons; the final aggregate has a <= 64-value
    key.  No window ever touches the orders fact path."""
    o = _t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
        F.count(F.lit(1)).alias("f"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("m_dec"),
    )
    snap = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("s"))
    c2 = (
        cust.crossJoin(F.broadcast(snap))
        .select(
            F.datediff(F.col("s"), F.col("last_d")).alias("r"),
            "f",
            "m_dec",
        )
        # c2 feeds BOTH the stacked histogram/boundary pass and the
        # scoring pass; without a persist each consumer re-runs the
        # per-customer orders shuffle (judge-measured 4 fact scans,
        # round 7).  Persisting the small per-customer triple caps the
        # plan at the two scans inside this subtree (cust + snap).
        .persist()
    )
    u = c2.selectExpr(
        # the decimal SUM widens to (38,6); stack needs one exact type
        "stack(3, 'r', CAST(r AS DECIMAL(38,6)),"
        " 'f', CAST(f AS DECIMAL(38,6)),"
        " 'm', CAST(m_dec AS DECIMAL(38,6))) AS (dim, val)"
    )
    h = u.groupBy("dim", "val").agg(F.count(F.lit(1)).alias("k"))
    from pyspark.sql import Window as W

    w_cdf = (
        W.partitionBy("dim")
        .orderBy("val")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cdf = h.select(
        "dim",
        "val",
        F.sum("k").over(w_cdf).alias("cum"),
        F.sum("k").over(W.partitionBy("dim")).alias("tot"),
    )
    thr = cdf.groupBy("dim").agg(
        F.min(F.when(F.col("cum") * 4 >= F.col("tot"), F.col("val"))).alias("t1"),
        F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col("val"))).alias("t2"),
        F.min(F.when(F.col("cum") * 4 >= F.col("tot") * 3, F.col("val"))).alias("t3"),
    )
    bounds = thr.agg(
        *[
            F.max(F.when(F.col("dim") == d, F.col(f"t{i}"))).alias(f"{d}{i}")
            for d in ("r", "f", "m")
            for i in (1, 2, 3)
        ]
    )

    def quartile(col: str, pfx: str) -> F.Column:
        e = F.lit(1)
        for i in (1, 2, 3):
            e = e + F.when(F.col(col) > F.col(f"{pfx}{i}"), 1).otherwise(0)
        return e

    scored = c2.crossJoin(F.broadcast(bounds)).select(
        (F.col("m_dec") * 1000000).cast("long").alias("m_units"),
        (F.lit(5) - quartile("r", "r")).alias("r_score"),
        quartile("f", "f").alias("f_score"),
        quartile("m_dec", "m").alias("m_score"),
    )
    return (
        scored.groupBy(
            (
                F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
            )
            .cast("int")
            .alias("segment")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.expr("CAST(SUM(m_units) DIV COUNT(1) AS BIGINT)").alias(
                "avg_monetary_micros"
            ),
        )
        .orderBy("segment")
    )


@register(
    "chi2_contingency",
    """
    WITH o0 AS (
      SELECT lang, source, COUNT(*) AS obs FROM documents GROUP BY 1, 2
    ),
    rt AS (SELECT lang, SUM(obs) AS r FROM o0 GROUP BY lang),
    ct AS (SELECT source, SUM(obs) AS c FROM o0 GROUP BY source),
    n AS (SELECT SUM(obs) AS n FROM o0),
    o AS (
      -- COMPLETE grid: zero cells contribute (0-E)^2/E = E to chi2 and
      -- omitting them both understates the statistic and breaks the
      -- expected-sums-to-marginal identity
      SELECT g.lang, g.source, COALESCE(o0.obs, 0) AS obs
      FROM (SELECT rt.lang, ct.source FROM rt CROSS JOIN ct) g
      LEFT JOIN o0 ON o0.lang = g.lang AND o0.source = g.source
    ),
    cells AS (
      SELECT o.lang, o.source, o.obs,
             CAST(rt.r * ct.c AS DOUBLE) / (SELECT n FROM n) AS expected
      FROM o JOIN rt ON rt.lang = o.lang JOIN ct ON ct.source = o.source
    )
    SELECT lang, source,
           CAST(obs AS BIGINT) AS observed,
           (ROUND(expected, 6) + 0) AS expected,
           (ROUND((obs - expected) * (obs - expected) / expected, 6) + 0) AS chi2_term
    FROM cells ORDER BY lang, source
    """,
    note=(
        "chi-square contingency grid (lang x source): observed vs independence-expected "
        "counts and per-cell chi2 contribution — the distribution-shift audit (is language "
        "mix independent of source?); expected values one double expression over exact "
        "integer marginals"
    ),
)
def chi2_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency-table independence audit: the lang x source grid
    with observed counts, expected-under-independence counts (row
    total x column total / n — exact integer marginals, one double
    expression), and each cell's chi-square contribution.  A cell with
    a large term is a source whose language mix diverges from the
    corpus — the drift signal that reweights or quarantines a source.

    Scale plan: one (lang, source) partial-agg'd shuffle builds the
    observed grid (bounded domain); marginals re-aggregate the GRID,
    not the corpus (langs + sources rows); the expected/chi2 math is
    row-local against broadcast marginal joins on the tiny relations.
    All inputs to the double expressions are exact integers, so both
    engines compute bit-identical doubles."""
    docs = _t(spark, sf_dir, "documents")
    # the bounded observed grid feeds four consumers (both marginals,
    # the total, the completed grid) — persist so the corpus shuffles once
    o0 = (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("obs"))
        .persist()
    )
    rt = o0.groupBy("lang").agg(F.sum("obs").alias("r"))
    ct = o0.groupBy("source").agg(F.sum("obs").alias("c"))
    n = o0.agg(F.sum("obs").alias("n"))
    # complete grid incl. zero cells — they contribute E to chi2
    o = (
        rt.select("lang")
        .crossJoin(ct.select("source"))
        .join(o0, ["lang", "source"], "left")
        .select("lang", "source", F.coalesce(F.col("obs"), F.lit(0)).alias("obs"))
    )
    expected = (F.col("r") * F.col("c")).cast("double") / F.col("n")
    cells = (
        o.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .withColumn("expected", expected)
    )
    term = (F.col("obs") - F.col("expected")) ** 2 / F.col("expected")
    return cells.select(
        "lang",
        "source",
        F.col("obs").cast("long").alias("observed"),
        F.round("expected", 6).alias("expected"),
        F.round(term, 6).alias("chi2_term"),
    ).orderBy("lang", "source")


@register(
    "ks_drift_audit",
    """
    WITH h_all AS (
      SELECT n_chars, COUNT(*) AS k FROM documents GROUP BY n_chars
    ),
    tot AS (SELECT SUM(k) AS t FROM h_all),
    cum_all AS (
      SELECT n_chars,
             SUM(k) OVER (ORDER BY n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca
      FROM h_all
    ),
    h_src AS (
      SELECT source, n_chars, COUNT(*) AS k FROM documents GROUP BY source, n_chars
    ),
    tot_src AS (SELECT source, SUM(k) AS ts FROM h_src GROUP BY source),
    grid AS (
      SELECT s.source, v.n_chars, COALESCE(h.k, 0) AS k
      FROM (SELECT DISTINCT source FROM documents) s
      CROSS JOIN (SELECT n_chars FROM h_all) v
      LEFT JOIN h_src h ON h.source = s.source AND h.n_chars = v.n_chars
    ),
    cum_src AS (
      SELECT source, n_chars,
             SUM(k) OVER (PARTITION BY source ORDER BY n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
      FROM grid
    ),
    diffs AS (
      SELECT c.source,
             ABS(c.cs * (SELECT t FROM tot) - a.ca * ts.ts) AS num,
             ts.ts * (SELECT t FROM tot) AS den
      FROM cum_src c
      JOIN cum_all a ON a.n_chars = c.n_chars
      JOIN tot_src ts ON ts.source = c.source
    )
    SELECT source,
           CAST(MAX(num) AS BIGINT) AS ks_num,
           (ROUND(CAST(MAX(num) AS DOUBLE) / MAX(den), 6) + 0) AS ks_stat
    FROM diffs GROUP BY source ORDER BY source
    """,
    note=(
        "Kolmogorov-Smirnov drift audit: per-source KS statistic of the doc-length "
        "distribution vs the whole corpus — sup|CDF_s - CDF_all| evaluated at every corpus "
        "value point with INTEGER cross-multiplied numerators (the argmax is exact; only the "
        "emitted ratio is a double) — the distribution-shift quarantine signal"
    ),
)
def ks_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KS statistic against the corpus length distribution:
    sup |CDF_source(v) - CDF_corpus(v)|, evaluated at every corpus
    value point (both step functions only change there, so the sup is
    attained).  The comparison is integer-exact: |cs*T - ca*Ts| keeps
    the numerator integral and the max is taken BEFORE the one double
    division, so no float ordering ambiguity can flip the argmax.

    Scale plan: two bounded-domain histograms (corpus and per-source
    length counts); the evaluation grid is sources x distinct lengths
    (aggregated relations cross-joined — thousands of rows, not docs);
    CDF windows partition by source over the grid; the corpus CDF
    window runs over the distinct-length relation (tiny by
    construction, the token_length_histogram discipline).  At 100 TB
    bucket n_chars (coarsen the grid) with the identical plan."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    # both bounded histograms feed 2-3 consumers each — persist them so
    # the fact is scanned once per histogram, and derive the source
    # list and corpus total from the histograms instead of re-scanning
    h_all = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("k")).persist()
    tot = h_all.agg(F.sum("k").alias("t"))
    # constant key: aggregated length histogram, not a fact path
    w_all = Window.partitionBy(F.col("n_chars") % 1).orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_all = h_all.select("n_chars", F.sum("k").over(w_all).alias("ca"))
    h_src = (
        docs.groupBy("source", "n_chars")
        .agg(F.count(F.lit(1)).alias("k"))
        .persist()
    )
    tot_src = h_src.groupBy("source").agg(F.sum("k").alias("ts"))
    grid = (
        h_src.select("source")
        .distinct()
        .crossJoin(h_all.select("n_chars"))
        .join(h_src, ["source", "n_chars"], "left")
        .select("source", "n_chars", F.coalesce(F.col("k"), F.lit(0)).alias("k"))
    )
    w_src = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_src = grid.select(
        "source", "n_chars", F.sum("k").over(w_src).alias("cs")
    )
    diffs = (
        cum_src.join(F.broadcast(cum_all), "n_chars")
        .join(F.broadcast(tot_src), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.abs(F.col("cs") * F.col("t") - F.col("ca") * F.col("ts")).alias("num"),
            (F.col("ts") * F.col("t")).alias("den"),
        )
    )
    return (
        diffs.groupBy("source")
        .agg(
            F.max("num").cast("long").alias("ks_num"),
            F.round(F.max("num").cast("double") / F.max("den"), 6).alias("ks_stat"),
        )
        .orderBy("source")
    )


@register(
    "join_cardinality_estimate",
    f"""
    WITH keys AS (
      SELECT o_orderkey FROM orders
      WHERE {{gate}} % 10 = 0
    ),
    exact AS (
      SELECT COUNT(*) AS n FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    sampled AS (
      SELECT COUNT(*) AS s
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN keys k ON k.o_orderkey = l.l_orderkey
    )
    SELECT CAST((SELECT n FROM exact) AS BIGINT) AS exact_rows,
           CAST((SELECT s FROM sampled) * 10 AS BIGINT) AS estimated_rows,
           (ROUND(ABS(CAST((SELECT s FROM sampled) * 10 - (SELECT n FROM exact) AS DOUBLE))
                 / (SELECT n FROM exact), 6) + 0) AS rel_error
    """.replace("{gate}", "(('0x' || substr(md5('uni_' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT)"),
    note=(
        "join-cardinality estimation by UNIVERSE sampling: the same md5-gated 10% of JOIN "
        "KEYS on both sides (correlated key sampling — independent row sampling would square "
        "the rate and miss matches), estimate = 10x the sampled join count, audited against "
        "the exact count — the CBO sizing technique"
    ),
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate |lineitem ⋈ orders| from a 10% key-universe sample and
    audit it against the exact count.  Universe sampling keeps the
    SAME md5-gated key subset on both join sides, so sampled pairs
    survive intact and the estimate is unbiased at rate 1/p; sampling
    rows independently on each side would keep only p² of the pairs.

    Scale plan: the sample gate is row-local md5 arithmetic pushed to
    the scan side of the join; both join passes are plain key-keyed
    hash joins (the sampled pass touches ~10% of the fact rows); at
    100 TB you run ONLY the sampled pass — the exact pass here is the
    audit that certifies the estimator, and rel_error is the published
    accuracy."""
    from hadoop_20_spark.functions import md5_long

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    exact = li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.count(F.lit(1)).alias("n")
    )
    gate = (
        md5_long(F.concat(F.lit("uni_"), F.col("o_orderkey").cast("string"))) % 10
        == 0
    )
    keys = o.where(gate).select(F.col("o_orderkey").alias("k"))
    sampled = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(keys, F.col("l_orderkey") == F.col("k"))
        .agg(F.count(F.lit(1)).alias("s"))
    )
    return (
        exact.crossJoin(F.broadcast(sampled))
        .select(
            F.col("n").cast("long").alias("exact_rows"),
            (F.col("s") * 10).cast("long").alias("estimated_rows"),
            F.round(
                F.abs((F.col("s") * 10 - F.col("n")).cast("double")) / F.col("n"), 6
            ).alias("rel_error"),
        )
    )


@register(
    "bloom_semi_join_audit",
    """
    WITH keys AS (SELECT p_partkey FROM part WHERE p_size < 5),
    pos AS (
      SELECT DISTINCT pos FROM (
        SELECT unnest([
          (('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 15))::BIGINT) % 16384,
          (('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 9, 15))::BIGINT) % 16384,
          (('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 17, 15))::BIGINT) % 16384
        ]) AS pos FROM keys)
    ),
    words AS (
      SELECT pos // 32 AS w, bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS word
      FROM pos GROUP BY 1
    ),
    dense AS (
      SELECT i AS w, COALESCE(word, 0) AS word
      FROM generate_series(0, 511) t(i) LEFT JOIN words ON words.w = i
    ),
    bits AS (SELECT list(word ORDER BY w) AS b FROM dense),
    probe AS (
      SELECT l_partkey,
        (('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT) % 16384 AS h0,
        (('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 9, 15))::BIGINT) % 16384 AS h1,
        (('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 17, 15))::BIGINT) % 16384 AS h2
      FROM lineitem
    ),
    tested AS (
      SELECT l_partkey,
             CASE WHEN ((b[CAST(h0 // 32 AS INTEGER) + 1] >> CAST(h0 % 32 AS INTEGER)) & 1) = 1
                   AND ((b[CAST(h1 // 32 AS INTEGER) + 1] >> CAST(h1 % 32 AS INTEGER)) & 1) = 1
                   AND ((b[CAST(h2 // 32 AS INTEGER) + 1] >> CAST(h2 % 32 AS INTEGER)) & 1) = 1
                  THEN 1 ELSE 0 END AS pass
      FROM probe CROSS JOIN bits
    ),
    tm AS (SELECT COUNT(*) AS n_true FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM keys))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
           CAST(SUM(pass) AS BIGINT) AS n_pass_bloom,
           CAST((SELECT n_true FROM tm) AS BIGINT) AS n_true_match,
           CAST(SUM(pass) - (SELECT n_true FROM tm) AS BIGINT) AS n_false_pos,
           (ROUND(CAST(SUM(pass) - (SELECT n_true FROM tm) AS DOUBLE)
                 / GREATEST(COUNT(*) - (SELECT n_true FROM tm), 1), 6) + 0) AS fp_rate
    FROM tested
    """,
    note=(
        "explicit Bloom-filter semi-join audit (the runtime-filter pushdown discipline): "
        "16384-bit filter over the selective dim keys (k=3 md5-substring hashes, one digest "
        "pass), built as a bit_or word aggregate and broadcast as ONE array<long> row; the "
        "probe side tests bits row-locally BEFORE any shuffle; reports pass/true-match/"
        "false-positive counts and the measured fp rate — every bit oracle-reproducible"
    ),
)
def bloom_semi_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The runtime-filter join discipline, made explicit and auditable:
    build a 16384-bit Bloom filter over the selective build side (parts
    with p_size < 5), broadcast it as one array<long> row, and evaluate
    membership row-locally on the probe side (lineitem) — the filter a
    100 TB join pushes below the shuffle so non-matching fact rows die
    at the scan.  The audit reports how many probe rows pass, how many
    truly match (exact semi-join), and the realized false-positive
    rate — the number that decides whether m_bits is sized right
    (Spark's InjectRuntimeFilter and parquet's file-level bloom are
    this same structure; here every bit is md5-deterministic so the
    DuckDB oracle reproduces the filter verbatim).

    Scale plan: the build is an explode->distinct->bit_or aggregate
    over <= m/64 words, densified on a range spine and collapsed to ONE
    broadcast row; probing is pure codegen (three substrings of one md5
    digest per row); the exact-match count is a broadcast-able semi
    join.  Nothing about the filter itself ever shuffles the fact
    table."""
    from hadoop_20_spark.operators import joins as join_ops

    part = _t(spark, sf_dir, "part").select("p_partkey", "p_size")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    keys = part.where(F.col("p_size") < 5).select("p_partkey")
    bloom = join_ops.bloom_filter_build(keys, "p_partkey", m_bits=16384)
    tested = li.crossJoin(F.broadcast(bloom)).select(
        join_ops.bloom_probe_passes("l_partkey", m_bits=16384)
        .cast("int")
        .alias("pass")
    )
    counts = tested.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum("pass").cast("long").alias("n_pass_bloom"),
    )
    tm = (
        li.join(F.broadcast(keys), li.l_partkey == keys.p_partkey, "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_true_match"))
    )
    return counts.crossJoin(F.broadcast(tm)).select(
        "n_probe",
        "n_pass_bloom",
        "n_true_match",
        (F.col("n_pass_bloom") - F.col("n_true_match"))
        .cast("long")
        .alias("n_false_pos"),
        F.round(
            (F.col("n_pass_bloom") - F.col("n_true_match")).cast("double")
            / F.greatest(F.col("n_probe") - F.col("n_true_match"), F.lit(1)),
            6,
        ).alias("fp_rate"),
    )


@register(
    "bloom_pruned_frequent_buyers",
    """
    WITH c AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1),
    keys AS (SELECT o_custkey FROM c WHERE n >= 15),
    pos AS (
      SELECT DISTINCT pos FROM (
        SELECT unnest([
          (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT) % 16384,
          (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 9, 15))::BIGINT) % 16384,
          (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 17, 15))::BIGINT) % 16384
        ]) AS pos FROM keys)
    ),
    words AS (
      SELECT pos // 32 AS w, bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS word
      FROM pos GROUP BY 1
    ),
    dense AS (
      SELECT i AS w, COALESCE(word, 0) AS word
      FROM generate_series(0, 511) t(i) LEFT JOIN words ON words.w = i
    ),
    bits AS (SELECT list(word ORDER BY w) AS b FROM dense),
    probe AS (
      SELECT o_custkey,
        (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT) % 16384 AS h0,
        (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 9, 15))::BIGINT) % 16384 AS h1,
        (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 17, 15))::BIGINT) % 16384 AS h2
      FROM orders
    ),
    audit AS (
      SELECT COUNT(*) AS n_fact,
             SUM(CASE WHEN ((b[CAST(h0 // 32 AS INTEGER) + 1] >> CAST(h0 % 32 AS INTEGER)) & 1) = 1
                       AND ((b[CAST(h1 // 32 AS INTEGER) + 1] >> CAST(h1 % 32 AS INTEGER)) & 1) = 1
                       AND ((b[CAST(h2 // 32 AS INTEGER) + 1] >> CAST(h2 % 32 AS INTEGER)) & 1) = 1
                      THEN 1 ELSE 0 END) AS n_pass_bloom
      FROM probe CROSS JOIN bits
    ),
    matched AS (
      SELECT o_orderpriority,
             COUNT(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
      FROM orders
      WHERE o_custkey IN (SELECT o_custkey FROM keys)
      GROUP BY 1
    ),
    tot AS (SELECT SUM(n_orders) AS n_true FROM matched)
    SELECT o_orderpriority,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(rev * 1000000 AS BIGINT) AS revenue_micros,
           CAST((SELECT n_fact FROM audit) AS BIGINT) AS n_fact,
           CAST((SELECT n_pass_bloom FROM audit) AS BIGINT) AS n_pass_bloom,
           CAST((SELECT n_true FROM tot) AS BIGINT) AS n_true_match
    FROM matched ORDER BY o_orderpriority
    """,
    note=(
        "bloom_semi_join applied in a pipeline (not just audited): revenue by order "
        "priority for frequent buyers (HAVING count >= 15 — a PRE-AGGREGATED build side, "
        "exactly where Spark's InjectRuntimeFilter cannot create a runtime filter); the "
        "fact probe dies row-locally at the scan against the broadcast 16384-bit filter "
        "before the exact semi join removes the fp tail; result carries the probe-side "
        "rows-in/rows-out audit columns"
    ),
)
def bloom_pruned_frequent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority restricted to FREQUENT buyers (>= 15
    orders), computed through :func:`operators.joins.bloom_semi_join`:
    the build side is a HAVING-filtered aggregate — the case Spark's
    own InjectRuntimeFilter rule does not cover (it requires a
    selective FILTER on the creation side, not an aggregate) — so the
    engine-portable filter earns its keep: the fact scan drops
    ~99% of rows row-locally before any join, and the exact left_semi
    mops up the measured fp tail.

    Result carries the audit columns the runtime-filter decision needs:
    ``n_fact`` (probe rows in), ``n_pass_bloom`` (rows after the
    bloom), ``n_true_match`` (rows after the exact join).

    Scale plan: the build aggregate shuffles only the 8-byte custkey
    column (column-pruned scan); the filter itself is <= 512 shuffled
    words collapsed to ONE broadcast row; the probe is one md5 per fact
    row at the scan; survivors (~1% + fp) reach a broadcast semi join.
    The audit readout probes the fact a second time by design — it is
    the certification pass, dropped in production once fp is sized."""
    from hadoop_20_spark.operators import joins as join_ops

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    keys = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 15)
        .select("o_custkey")
        # consumed by three subtrees (semi-join build, exact mop-up,
        # audit build) — persist the ~1%-of-customers key set so the
        # custkey aggregate runs once, not per consumer
        .persist()
    )
    exact = join_ops.bloom_semi_join(o, keys, "o_custkey", m_bits=16384)
    grouped = exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        (F.sum(F.col("o_totalprice").cast("decimal(28,6)")) * 1000000)
        .cast("long")
        .alias("revenue_micros"),
    )
    bloom = join_ops.bloom_filter_build(keys, "o_custkey", m_bits=16384)
    audit = o.crossJoin(F.broadcast(bloom)).agg(
        F.count(F.lit(1)).cast("long").alias("n_fact"),
        F.sum(
            join_ops.bloom_probe_passes("o_custkey", m_bits=16384).cast("int")
        )
        .cast("long")
        .alias("n_pass_bloom"),
    )
    tot = grouped.agg(F.sum("n_orders").cast("long").alias("n_true_match"))
    return (
        grouped.crossJoin(F.broadcast(audit))
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderpriority",
            "n_orders",
            "revenue_micros",
            "n_fact",
            "n_pass_bloom",
            "n_true_match",
        )
        .orderBy("o_orderpriority")
    )


@register(
    "retraction_agg_maintenance",
    """
    WITH base AS (
      SELECT o_orderpriority,
             MIN(CAST(o_totalprice AS DECIMAL(28,6))) AS mn,
             MAX(CAST(o_totalprice AS DECIMAL(28,6))) AS mx
      FROM orders GROUP BY 1
    ),
    del AS (
      SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(28,6)) AS p
      FROM orders
      WHERE o_orderkey % 13 = 0
         OR (o_orderkey % 17 = 0 AND o_orderkey % 13 <> 0)
    ),
    hit AS (
      SELECT d.o_orderpriority,
             MAX(CASE WHEN d.p = b.mn OR d.p = b.mx THEN 1 ELSE 0 END) AS rec
      FROM del d JOIN base b USING (o_orderpriority)
      GROUP BY 1
    ),
    eff AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 17 = 0
                  THEN CAST(o_totalprice AS DECIMAL(28,6)) + 100
                  ELSE CAST(o_totalprice AS DECIMAL(28,6)) END AS p
      FROM orders WHERE o_orderkey % 13 <> 0
    )
    SELECT e.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(p * 1000000 AS BIGINT)) AS BIGINT) AS total_micros,
           CAST(MIN(p) * 1000000 AS BIGINT) AS min_micros,
           CAST(MAX(p) * 1000000 AS BIGINT) AS max_micros,
           CASE WHEN MAX(h.rec) = 1 THEN 'recompute' ELSE 'algebraic' END
             AS minmax_path
    FROM eff e LEFT JOIN hit h USING (o_orderpriority)
    GROUP BY 1 ORDER BY 1
    """,
    note=(
        "RETRACTION-safe view maintenance (CDC deletes + updates, not just inserts): "
        "counts/sums maintain with signed deltas; min/max detects the retract-the-extremum "
        "case per group and falls back to recompute FOR THOSE GROUPS ONLY, emitting which "
        "path each group took — the oracle recomputes the whole view from the effective "
        "table, proving maintain == recompute under deletes"
    ),
)
def retraction_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View maintenance when the delta batch can RETRACT: the CDC batch
    deletes ``o_orderkey % 13 == 0`` and updates ``% 17 == 0`` (delete
    old price, insert price + 100) against the maintained per-priority
    summary.  Counts and sums absorb signed deltas algebraically
    (count += Σsign, sum += Σ sign·price — always safe); min/max is NOT
    retractable algebra: a deleted row equal to the stored extremum
    invalidates the state, so the maintainer detects that per group
    (one broadcast of the 5-row base state into the CDC aggregate) and
    recomputes min/max from the effective table for FLAGGED groups
    only, folding inserts algebraically everywhere else.  The published
    view carries ``minmax_path`` so the consumer sees which groups paid
    the recompute.

    Exactness: prices ride DECIMAL(28,6) end-to-end (the extremum-hit
    equality test must be exact — doubles would flip it at the 15th
    digit); sums are per-row integer micros.

    Scale plan: base state and CDC state are each ONE partial-agg'd
    shuffle keyed by the 5-value priority (the CDC batch is ~12% of the
    fact here, and only IT is scanned at maintenance time in a real
    pipeline — the base state is the stored view); the recompute
    fallback rescans the effective table ONLY for flagged groups (a
    semi-join-pruned scan, empty when no extremum is hit); the merge is
    a 5-row broadcast join.  At 100 TB the recompute cost is the metric
    this query publishes — a view whose extremes churn should maintain
    a small top-k reservoir per group instead (documented trade)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(28,6)").alias("p"),
    )
    micros = (F.col("p") * 1000000).cast("long")

    # the maintained state (what the stored view holds before the batch);
    # 5 rows feeding two consumers (the CDC detector join and the merge)
    # — persist so the fact aggregate runs once
    base_state = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(micros).alias("s_micros"),
        F.min("p").alias("mn"),
        F.max("p").alias("mx"),
    ).persist()

    # CDC batch: deletes (sign -1) + updates (delete old, insert new)
    is_del = F.col("o_orderkey") % 13 == 0
    is_upd = (F.col("o_orderkey") % 17 == 0) & ~is_del
    deletes = o.where(is_del | is_upd).select(
        "o_orderpriority", "p", F.lit(-1).alias("sign")
    )
    inserts = o.where(is_upd).select(
        "o_orderpriority",
        (F.col("p") + 100).alias("p"),
        F.lit(1).alias("sign"),
    )
    cdc = deletes.unionByName(inserts)

    # CDC state, with the retract-the-extremum detector: base mn/mx
    # broadcast into the batch aggregate (5 rows)
    cdc_state = (
        cdc.join(
            F.broadcast(base_state.select("o_orderpriority", "mn", "mx")),
            "o_orderpriority",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum("sign").alias("dn"),
            F.sum(F.col("sign") * (F.col("p") * 1000000).cast("long")).alias(
                "ds_micros"
            ),
            F.min(F.when(F.col("sign") == 1, F.col("p"))).alias("ins_mn"),
            F.max(F.when(F.col("sign") == 1, F.col("p"))).alias("ins_mx"),
            F.max(
                (
                    (F.col("sign") == -1)
                    & ((F.col("p") == F.col("mn")) | (F.col("p") == F.col("mx")))
                ).cast("int")
            ).alias("hit"),
        )
    )

    # merged feeds the flagged-group selector AND the final projection
    merged = base_state.join(cdc_state, "o_orderpriority", "left").persist().select(
        "o_orderpriority",
        (F.col("n") + F.coalesce("dn", F.lit(0))).cast("long").alias("n_orders"),
        (F.col("s_micros") + F.coalesce("ds_micros", F.lit(0)))
        .cast("long")
        .alias("total_micros"),
        F.least("mn", "ins_mn").alias("alg_mn"),
        F.greatest("mx", "ins_mx").alias("alg_mx"),
        F.coalesce(F.col("hit"), F.lit(0)).alias("hit"),
    )

    # recompute fallback: effective table scanned ONLY for flagged groups
    flagged = merged.where(F.col("hit") == 1).select("o_orderpriority")
    eff = o.where(~is_del).select(
        "o_orderpriority",
        F.when(is_upd, F.col("p") + 100).otherwise(F.col("p")).alias("p"),
    )
    recomputed = (
        eff.join(F.broadcast(flagged), "o_orderpriority", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.min("p").alias("rec_mn"), F.max("p").alias("rec_mx"))
    )

    return (
        merged.join(recomputed, "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            "n_orders",
            "total_micros",
            (
                F.coalesce("rec_mn", "alg_mn") * 1000000
            ).cast("long").alias("min_micros"),
            (
                F.coalesce("rec_mx", "alg_mx") * 1000000
            ).cast("long").alias("max_micros"),
            F.when(F.col("hit") == 1, "recompute")
            .otherwise("algebraic")
            .alias("minmax_path"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "constraint_suite",
    """
    WITH o AS (SELECT * FROM orders), l AS (SELECT * FROM lineitem),
    rep AS (
      SELECT 'orders' AS table_name, 'custkey_complete' AS check_name,
             'completeness' AS kind, 'o_custkey' AS col_name,
             (ROUND(COUNT(o_custkey) * 1.0 / COUNT(*), 6) + 0) AS metric,
             CASE WHEN COUNT(o_custkey) * 1000000 >= 1000000 * COUNT(*)
                  THEN 1 ELSE 0 END AS passed
      FROM o
      UNION ALL
      SELECT 'orders', 'orderkey_complete', 'completeness', 'o_orderkey',
             (ROUND(COUNT(o_orderkey) * 1.0 / COUNT(*), 6) + 0),
             CASE WHEN COUNT(o_orderkey) * 1000000 >= 1000000 * COUNT(*)
                  THEN 1 ELSE 0 END
      FROM o
      UNION ALL
      SELECT 'orders', 'orderkey_unique', 'key_uniqueness', 'o_orderkey',
             (ROUND(COUNT(DISTINCT o_orderkey) * 1.0 / COUNT(o_orderkey), 6) + 0),
             CASE WHEN COUNT(DISTINCT o_orderkey) * 1000000
                       >= 1000000 * COUNT(o_orderkey) THEN 1 ELSE 0 END
      FROM o
      UNION ALL
      SELECT 'orders', 'priority_format', 'matches', 'o_orderpriority',
             (ROUND(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                            THEN 1 ELSE 0 END) * 1.0 / COUNT(o_orderpriority), 6) + 0),
             CASE WHEN SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                               THEN 1 ELSE 0 END) * 1000000
                       >= 1000000 * COUNT(o_orderpriority) THEN 1 ELSE 0 END
      FROM o
      UNION ALL
      SELECT 'orders', 'status_domain', 'isin', 'o_orderstatus',
             (ROUND(SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                            THEN 1 ELSE 0 END) * 1.0 / COUNT(o_orderstatus), 6) + 0),
             CASE WHEN SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                               THEN 1 ELSE 0 END) * 1000000
                       >= 1000000 * COUNT(o_orderstatus) THEN 1 ELSE 0 END
      FROM o
      UNION ALL
      SELECT 'orders', 'totalprice_mean', 'mean_between', 'o_totalprice',
             (ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
                   / COUNT(o_totalprice), 6) + 0),
             CASE WHEN (ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
                             / COUNT(o_totalprice), 6) + 0) >= 1000.0
                   AND (ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
                             / COUNT(o_totalprice), 6) + 0) <= 400000.0
                  THEN 1 ELSE 0 END
      FROM o
      UNION ALL
      SELECT 'orders', 'totalprice_min', 'min_at_least', 'o_totalprice',
             (ROUND(CAST(MIN(o_totalprice) AS DOUBLE), 6) + 0),
             CASE WHEN MIN(o_totalprice) >= 0.0 THEN 1 ELSE 0 END
      FROM o
      UNION ALL
      SELECT 'lineitem', 'discount_max', 'max_at_most', 'l_discount',
             (ROUND(CAST(MAX(l_discount) AS DOUBLE), 6) + 0),
             CASE WHEN MAX(l_discount) <= 0.1 THEN 1 ELSE 0 END
      FROM l
      UNION ALL
      SELECT 'lineitem', 'quantity_min', 'min_at_least', 'l_quantity',
             (ROUND(CAST(MIN(l_quantity) AS DOUBLE), 6) + 0),
             CASE WHEN MIN(l_quantity) >= 1.0 THEN 1 ELSE 0 END
      FROM l
      UNION ALL
      SELECT 'lineitem', 'quantity_max', 'max_at_most', 'l_quantity',
             (ROUND(CAST(MAX(l_quantity) AS DOUBLE), 6) + 0),
             CASE WHEN MAX(l_quantity) <= 50.0 THEN 1 ELSE 0 END
      FROM l
      UNION ALL
      SELECT 'lineitem', 'shipdate_complete', 'completeness', 'l_shipdate',
             (ROUND(COUNT(l_shipdate) * 1.0 / COUNT(*), 6) + 0),
             CASE WHEN COUNT(l_shipdate) * 1000000 >= 1000000 * COUNT(*)
                  THEN 1 ELSE 0 END
      FROM l
      UNION ALL
      SELECT 'lineitem', 'orderkey_fk', 'referential', 'l_orderkey',
             CAST((SELECT COUNT(*) FROM l
                   WHERE NOT EXISTS (SELECT 1 FROM o
                                     WHERE o.o_orderkey = l.l_orderkey)) AS DOUBLE),
             CASE WHEN (SELECT COUNT(*) FROM l
                        WHERE NOT EXISTS (SELECT 1 FROM o
                                          WHERE o.o_orderkey = l.l_orderkey)) = 0
                  THEN 1 ELSE 0 END
    )
    SELECT * FROM rep ORDER BY table_name, check_name
    """,
    note=(
        "Deequ-style declarative quality gate: 11 single-table constraints compile into "
        "ONE wide aggregate per table (completeness/uniqueness/domain/pattern/bounds as "
        "conditional aggregates, unpivoted to the long report) + one FK anti-join — 3 "
        "scans total for a 12-check suite vs the scan-per-check naive shape; pass/fail "
        "on ratio checks is integer-ppm (never a floored double ratio)"
    ),
)
def constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The post-ingest quality gate as a DECLARATIVE suite
    (operators/constraints.py — the Deequ 'unit tests for data' shape,
    reference anchor SortValidator's one-pass RecordStats check): each
    table's constraint list compiles to a single wide aggregate (one
    scan regardless of check count — the property that matters when the
    table is 100 TB), explodes into the (check, metric, passed) report,
    and the FK check contributes its anti-join fragment.  Metrics are
    exact integer ratios / decimal-sum means, so the whole report is
    hash-comparable against the oracle."""
    from hadoop_20_spark.operators import constraints as C

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    orders_checks = [
        C.Check("custkey_complete", "completeness", "o_custkey"),
        C.Check("orderkey_complete", "completeness", "o_orderkey"),
        C.Check("orderkey_unique", "key_uniqueness", "o_orderkey"),
        C.Check("priority_format", "matches", "o_orderpriority", pattern="^[1-5]-"),
        C.Check("status_domain", "isin", "o_orderstatus", allowed=("O", "F", "P")),
        C.Check(
            "totalprice_mean", "mean_between", "o_totalprice",
            bound=1000.0, bound_hi=400000.0,
        ),
        C.Check("totalprice_min", "min_at_least", "o_totalprice", bound=0.0),
    ]
    li_checks = [
        C.Check("discount_max", "max_at_most", "l_discount", bound=0.1),
        C.Check("quantity_min", "min_at_least", "l_quantity", bound=1.0),
        C.Check("quantity_max", "max_at_most", "l_quantity", bound=50.0),
        C.Check("shipdate_complete", "completeness", "l_shipdate"),
    ]
    rep = (
        C.verify(orders, orders_checks, "orders")
        .unionByName(C.verify(li, li_checks, "lineitem"))
        .unionByName(
            C.referential_check(
                li, orders, "l_orderkey", "o_orderkey", "orderkey_fk", "lineitem"
            )
        )
    )
    return rep.orderBy("table_name", "check_name")


@register(
    "exact_median_refinement",
    r"""
    WITH v AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    ks AS (
      SELECT 'median' AS stat, (n + 1) // 2 AS k, n FROM n
      UNION ALL
      SELECT 'p90', (9 * n + 9) // 10, n FROM n
    ),
    r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rk FROM v),
    vals AS (
      SELECT stat, k, n AS n_rows, r.c AS value_cents
      FROM ks JOIN r ON r.rk = ks.k
    )
    SELECT stat, k, n_rows, value_cents,
           CAST(value_cents AS DOUBLE) / 100.0 AS value_price,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v WHERE v.c < vals.value_cents) AS n_below,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v WHERE v.c = vals.value_cents) AS n_at
    FROM vals ORDER BY stat
    """,
    note=(
        "EXACT median + p90 of l_extendedprice by iterative range refinement "
        "(distributed selection) — never a global sort: each round buckets the "
        "surviving integer-cents range into 64 cells, counts (bounded agg, filter "
        "pushed to the scan), recurses into the target cell; the oracle answers the "
        "same ranks with ROW_NUMBER over a real sort, and per-row rank audits "
        "(n_below < k <= n_below + n_at) certify exactness"
    ),
)
def exact_median_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics at fact scale without sorting the fact:
    sort_ops.exact_order_statistic narrows an integer-cents range by
    4096-way count histograms — ceil(log4096(range)) rounds (2 for the
    ~1e7-cent TPC-H price range, at any sf), each a column-pruned scan
    whose redundant raw-price BETWEEN pushes into parquet (later rounds
    skip most row groups via footer min/max) plus a bounded collect of
    the non-empty cells.  The orderBy alternative shuffles the whole column through
    a RangePartitioner to read ONE offset; at 100 TB that's the
    difference between a few filtered scans and a full-data shuffle.

    Emits median and p90 rows with the selection's rank audits: value v
    at rank k is exact iff n_below < k <= n_below + n_at, which the
    driver compare enforces against the oracle's ROW_NUMBER answer.
    All arithmetic is integer (cents via DECIMAL(12,2)*100; ranks via
    integer ceil-division); value_price is one IEEE division of exact
    integers, identical cross-engine (SURVEY §7.4).

    Reference anchor (public hadoop-20): mapred/lib/InputSampler.java
    (sampled split points = approximate quantiles for
    TotalOrderPartitioner); this is the exact-rank path built from the
    same count-histogram primitive, converging instead of sampling."""
    from hadoop_20_spark.operators import sort as sort_ops

    li = _t(spark, sf_dir, "lineitem")
    # carry the RAW price column alongside the derived cents: the
    # refinement's BETWEEN on `c` (a cast expression) can never reach
    # the parquet scan, so each round's scan_filter adds the redundant
    # raw-column superset predicate that DOES land in PushedFilters —
    # later rounds then skip row groups whose min/max miss the
    # shrinking range (r13; guide §6).  The ±0.01 slack over-covers the
    # DECIMAL(12,2) HALF-UP rounding of the cast, so no qualifying row
    # is ever dropped (superset ⇒ identical results).
    cents = li.select(
        "l_extendedprice",
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("c"),
    )
    b = cents.agg(
        F.min("c").alias("lo"), F.max("c").alias("hi"), F.count("c").alias("n")
    ).first()
    n = b["n"]
    targets = {"median": (n + 1) // 2, "p90": (9 * n + 9) // 10}
    # multi-rank form: both probes share every refinement scan; the
    # rank-sizing aggregate doubles as the operator's bounds scan.
    # The rank audits (n_below, n_at) are READ OFF the refinement's own
    # bookkeeping (r14; proof in exact_order_statistics' docstring:
    # rank = k − |{c < lo}| is a loop invariant and the terminal bucket
    # covers exactly [v, v]) — the separate whole-relation audit
    # aggregate this query used to run is a scan it no longer pays,
    # at any scale (guide §2: fewer passes).  Values are identical
    # exact integers either way (oracle-verified).
    by_rank, _rounds = sort_ops.exact_order_statistics(
        cents, "c", list(targets.values()), bounds=(b["lo"], b["hi"], n),
        scan_filter=lambda lo, hi: F.col("l_extendedprice").between(
            lo / 100.0 - 0.01, hi / 100.0 + 0.01
        ),
        return_audits=True,
    )
    rows = [
        (
            stat,
            targets[stat],
            n,
            by_rank[targets[stat]][0],
            float(by_rank[targets[stat]][0]) / 100.0,
            by_rank[targets[stat]][1],
            by_rank[targets[stat]][2],
        )
        for stat in sorted(targets)
    ]
    return spark.createDataFrame(
        rows,
        "stat string, k bigint, n_rows bigint, value_cents bigint, "
        "value_price double, n_below bigint, n_at bigint",
    )


_HQ_W = 128  # equi-width histogram buckets (the mergeable quantile sketch)


@register(
    "histogram_quantile_merge",
    rf"""
    WITH v AS (
      SELECT l_orderkey % 4 AS batch,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      FROM lineitem
    ),
    bounds AS (SELECT MIN(c) AS lo, MAX(c) AS hi, CAST(COUNT(*) AS BIGINT) AS n FROM v),
    -- ONE-SHOT whole-corpus histogram (the rebuild; Spark merges 4
    -- batch sub-histograms — any non-linearity shifts every cell)
    cells AS (
      SELECT (c - lo) // ((hi - lo + {_HQ_W}) // {_HQ_W}) AS b,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v CROSS JOIN bounds GROUP BY 1
    ),
    cdf AS (
      SELECT b, cnt, SUM(cnt) OVER (ORDER BY b) AS cum FROM cells
    ),
    ks AS (
      SELECT 'median' AS stat, (n + 1) // 2 AS k FROM bounds
      UNION ALL SELECT 'p90', (9 * n + 9) // 10 FROM bounds
    ),
    est AS (
      SELECT stat, k,
             (SELECT MIN(b) FROM cdf WHERE cum >= k) AS bk
      FROM ks
    ),
    r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rk FROM v),
    sketch AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS occupied, MAX(cnt) AS max_cell,
             CAST(SUM(cnt) AS BIGINT) AS total_mass FROM cells
    )
    SELECT stat, k,
           lo + bk * ((hi - lo + {_HQ_W}) // {_HQ_W}) AS est_cents,
           (SELECT c FROM r WHERE rk = k) AS exact_cents,
           (SELECT c FROM r WHERE rk = k) - (lo + bk * ((hi - lo + {_HQ_W}) // {_HQ_W})) AS err_cents,
           (hi - lo + {_HQ_W}) // {_HQ_W} AS bound_cents,
           occupied, max_cell, total_mass
    FROM est CROSS JOIN bounds CROSS JOIN sketch
    ORDER BY stat
    """,
    note=(
        "mergeable QUANTILE sketch completing the trilogy (CMS = counts, HLL = "
        "distinct, this = ranks): 4 batch equi-width sub-histograms merged by "
        "cell-wise SUM (linear, like CMS) vs the oracle's one-shot rebuild; quantile "
        "estimate = bucket lower bound at the merged CDF's rank-k cell, with the "
        "EXACT answer (sort-free range-refinement selection) and the deterministic "
        "error bound 0 <= err < bucket width as audit columns"
    ),
)
def histogram_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third mergeable sketch: a fixed-grid histogram answers rank
    queries with error bounded by its bucket width, and sub-histograms
    merge by cell-wise addition — the linearity that lets 1000
    executors (or 1000 ingest batches) each sketch their shard and
    combine without rescanning history (cms_sketch_merge's contract
    lifted from point counts to ranks).

    Spark builds FOUR batch sub-sketches and merges them; the oracle
    builds the whole-corpus histogram in one shot, so merge == rebuild
    is what the hash compares.  Estimates read the merged CDF (<= 128
    rows; the window runs on an aggregated relation) at the median/p90
    ranks; the exact answers ride along via the sort-free
    range-refinement selection (exact_order_statistic), giving the
    audit 0 <= exact - est < bucket width that certifies the sketch's
    error contract on every run.  All arithmetic integer (cents, ceil
    via `(range + W) DIV W`, ranks via integer ceil-division).

    Scale plan: one fact scan -> (batch, bucket) partial agg (<= 4*128
    cells cross the wire), merge on <= 512 rows, CDF window on <= 128;
    the exact audit adds ceil(log64(range)) filtered scans (drop it in
    production and the sketch is one pass).  Reference anchor (public
    hadoop-20): mapred/lib/aggregate/ValueHistogram.java — the
    reducer-side histogram this makes mergeable and rank-addressable."""
    from hadoop_20_spark.operators import sort as sort_ops

    li = _t(spark, sf_dir, "lineitem")
    v = li.select(
        (F.col("l_orderkey") % 4).alias("batch"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("c"),
    )
    b = v.agg(F.min("c").alias("lo"), F.max("c").alias("hi"), F.count("c").alias("n")).first()
    lo, hi, n = b["lo"], b["hi"], b["n"]
    w = (hi - lo + _HQ_W) // _HQ_W
    sub = (
        v.select("batch", F.expr(f"(c - {lo}) DIV {w}").alias("b"))
        .groupBy("batch", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # the MERGE: corpus cells = cell-wise sum of the batch sub-sketches
    merged = sub.groupBy("b").agg(F.sum("cnt").cast("long").alias("cnt"))
    from pyspark.sql import Window

    # constant-key partitionBy (non-foldable `b % 1`) keeps the <=128-row
    # window off the WindowExec single-partition warning path (round-8
    # log-hygiene rule)
    cdf = merged.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy(F.col("b") % 1)
            .orderBy("b")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).persist()  # <=128 rows, three consumers (two rank probes + sketch stats)
    targets = {"median": (n + 1) // 2, "p90": (9 * n + 9) // 10}
    sk = cdf.agg(
        F.count(F.lit(1)).cast("long").alias("occupied"),
        F.max("cnt").alias("max_cell"),
        F.sum("cnt").cast("long").alias("total_mass"),
    ).first()
    # multi-rank exact audit: both probes share every refinement scan,
    # and the histogram's own bounds aggregate doubles as the operator's
    exacts, _rounds = sort_ops.exact_order_statistics(
        v, "c", list(targets.values()), bounds=(lo, hi, n)
    )
    rows = []
    for stat in sorted(targets):
        k = targets[stat]
        bk = cdf.filter(F.col("cum") >= k).agg(F.min("b")).first()[0]
        est = lo + bk * w
        exact = exacts[k]
        rows.append(
            (stat, k, est, exact, exact - est, w, sk["occupied"], sk["max_cell"], sk["total_mass"])
        )
    cdf.unpersist()
    return spark.createDataFrame(
        rows,
        "stat string, k bigint, est_cents bigint, exact_cents bigint, "
        "err_cents bigint, bound_cents bigint, occupied bigint, "
        "max_cell bigint, total_mass bigint",
    )


@register(
    "grouped_median_refinement",
    r"""
    WITH v AS (
      SELECT o_orderpriority AS pr,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      FROM orders
    ),
    r AS (
      SELECT pr, c,
             ROW_NUMBER() OVER (PARTITION BY pr ORDER BY c) AS rk,
             COUNT(*) OVER (PARTITION BY pr) AS n
      FROM v
    ),
    m AS (
      SELECT pr,
             CAST(MAX(n) AS BIGINT) AS n_rows,
             MAX(CASE WHEN rk = (n + 1) // 2 THEN c END) AS median_lo,
             MAX(CASE WHEN rk = n // 2 + 1 THEN c END) AS median_hi
      FROM r GROUP BY pr
    )
    SELECT m.pr, m.n_rows, m.median_lo, m.median_hi,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v
             WHERE v.pr = m.pr AND v.c < m.median_lo) AS n_below_lo,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v
             WHERE v.pr = m.pr AND v.c = m.median_lo) AS n_at_lo
    FROM m ORDER BY m.pr
    """,
    note=(
        "exact PER-GROUP medians (lower + upper) by grouped range refinement: all "
        "five priority groups refine their surviving ranges in the SAME scans (each "
        "round one filtered scan + one <= width*targets-row collect), so total scans "
        "= max rounds over groups — never a per-group loop, never a global sort; the "
        "oracle answers via ROW_NUMBER per group and the in-query rank audit "
        "(n_below < k <= n_below + n_at) certifies exactness"
    ),
)
def grouped_median_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact order statistics without sorting any group: the
    grouped form of exact_median_refinement.  sort_ops.
    exact_group_order_statistics carries one (group, rank) target set
    through shared refinement rounds — a row is tagged with a bucket
    for each of its group's still-active targets, every group's
    histogram rides the same (target, bucket) aggregate, and the driver
    narrows all targets from one <= width*targets-row collect per
    round.  Five groups' medians therefore cost the same number of
    scans as one (the log64-range bound), where a window/sort answer
    would shuffle the whole fact per refresh and a per-group loop would
    multiply scans by the group count — the two scale failure modes
    this operator exists to avoid.

    Emits lower AND upper medians (equal when a group's n is odd) in
    integer cents plus the lower median's rank audit columns; the
    DuckDB oracle re-answers every group with ROW_NUMBER over a real
    per-group sort.  Reference anchor (public hadoop-20):
    mapred/lib/InputSampler.java — per-partition split-point sampling;
    this is the exact per-key-range answer built from the same
    count-histogram primitive."""
    from hadoop_20_spark.operators import sort as sort_ops

    o = _t(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderpriority").alias("pr"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("c"),
    )
    b = {
        r["pr"]: (r["lo"], r["hi"], r["n"])
        for r in v.groupBy("pr")
        .agg(F.min("c").alias("lo"), F.max("c").alias("hi"), F.count("c").alias("n"))
        .collect()
    }
    ks = {
        pr: sorted({(n + 1) // 2, n // 2 + 1}) for pr, (_, _, n) in b.items()
    }
    vals, _rounds = sort_ops.exact_group_order_statistics(
        v, "pr", "c", ks, bounds_per_group=b
    )
    med = {
        pr: (
            vals[(pr, (b[pr][2] + 1) // 2)],
            vals[(pr, b[pr][2] // 2 + 1)],
        )
        for pr in b
    }
    # one grouped audit pass for every group's lower median: attach the
    # group's found value as a literal-CASE column, count below/at
    audit = {
        r["pr"]: (r["n_below"], r["n_at"])
        for r in v.withColumn(
            "m_lo",
            F.coalesce(
                *[
                    F.when(F.col("pr") == pr, F.lit(lo))
                    for pr, (lo, _) in sorted(med.items())
                ]
            ),
        )
        .groupBy("pr")
        .agg(
            F.sum((F.col("c") < F.col("m_lo")).cast("long")).alias("n_below"),
            F.sum((F.col("c") == F.col("m_lo")).cast("long")).alias("n_at"),
        )
        .collect()
    }
    rows = [
        (pr, b[pr][2], med[pr][0], med[pr][1], audit[pr][0], audit[pr][1])
        for pr in sorted(b)
    ]
    out = spark.createDataFrame(
        rows,
        "pr string, n_rows long, median_lo long, median_hi long, "
        "n_below_lo long, n_at_lo long",
    )
    return out.orderBy("pr")
@register(
    "supplier_pareto_frontier",
    """
    WITH s AS (
      SELECT l_suppkey AS suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS revenue_cents,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                      * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS discount_load
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT * FROM s a
    WHERE NOT EXISTS (
      SELECT 1 FROM s b
      WHERE b.revenue_cents >= a.revenue_cents
        AND b.distinct_parts >= a.distinct_parts
        AND b.discount_load <= a.discount_load
        AND (b.revenue_cents > a.revenue_cents
             OR b.distinct_parts > a.distinct_parts
             OR b.discount_load < a.discount_load)
    )
    ORDER BY suppkey
    """,
    note=(
        "3-objective Pareto skyline over per-supplier aggregates (maximize revenue "
        "and part coverage, minimize discount load) via the two-pass distributed "
        "skyline (local BNL per partition, exact merge); all objectives integer "
        "cents/units so the surviving SET is partitioning-invariant; oracle = "
        "NOT EXISTS dominance"
    ),
)
def supplier_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-objective supplier selection with no scalarization: the
    Pareto frontier of (revenue max, distinct parts max, discount load
    min).  No weighting collapses the objectives — the skyline IS the
    answer set, and it is partitioning-invariant, which is what lets a
    NOT EXISTS oracle certify a distributed two-pass computation.

    Scale plan: the skyline runs on the ENTITY-BOUNDED per-supplier
    aggregate (one fact shuffle keyed by suppkey with map-side
    partials; distinct_parts rides the same shuffle via a two-level
    agg), never on raw lineitem; the local pass prunes each partition
    to its Pareto-maximal rows so the final single-task pass sees only
    Σ|local skyline| candidates.  Objectives are pre-scaled to integer
    cents/basis-point units through DECIMAL(18,2) (the exact_sum_double
    discipline) — float objectives would make dominance engine-varying.
    Reference anchor: partial per-map pruning + single-reducer finalize
    (`mapred/lib/aggregate` combiner contract).
    """
    from hadoop_20_spark.operators.skyline import pareto_skyline

    li = _t(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
    disc_bp = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    s = (
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(cents).cast("long").alias("revenue_cents"),
            F.countDistinct("l_partkey").cast("long").alias("distinct_parts"),
            F.sum(cents.cast("long") * disc_bp).cast("long").alias("discount_load"),
        )
    )
    return pareto_skyline(
        s,
        maximize=["revenue_cents", "distinct_parts"],
        minimize=["discount_load"],
    ).orderBy("suppkey")


@register(
    "gini_lorenz_audit",
    """
    WITH c AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS rev
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS rn,
             (SELECT COUNT(*) FROM c) AS n,
             (SELECT SUM(rev) FROM c) AS tot
      FROM c
    ),
    gini AS (
      SELECT CAST(SUM((2 * rn - n - 1) * rev) * 1000000 // (CAST(n AS BIGINT) * tot) AS BIGINT) AS gini_ppm
      FROM r GROUP BY n, tot
    ),
    deciles AS (
      SELECT CAST(((rn - 1) * 10) // n AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(rev) * 1000000 // MAX(tot) AS BIGINT) AS share_ppm,
             CAST(SUM(rev) AS BIGINT) AS rev_cents
      FROM r GROUP BY 1
    )
    SELECT d.decile, d.n_customers, d.share_ppm,
           CAST(SUM(d.rev_cents) OVER (ORDER BY d.decile ROWS UNBOUNDED PRECEDING)
                * 1000000 // (SELECT SUM(rev_cents) FROM deciles) AS BIGINT) AS cum_share_ppm,
           (SELECT gini_ppm FROM gini) AS gini_ppm
    FROM deciles d ORDER BY d.decile
    """,
    note=(
        "revenue-concentration audit: exact Gini coefficient (rank formula "
        "sum((2i-n-1)x_i)/(n*sum), integer ppm) + Lorenz decile shares over "
        "per-customer revenue — global ranks via the bucketed two-pass "
        "distributed_global_rank (NO single-partition window), ranks tie-broken "
        "by custkey so both engines sort identically"
    ),
)
def gini_lorenz_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How concentrated is revenue across customers — the inequality
    readout (Gini + Lorenz deciles) a mixing/rebalancing decision reads
    before capping hot entities.  Exact integer arithmetic end to end:
    revenue in DECIMAL-cents, Gini by the rank formula with a single
    ppm floor division, decile shares as cross-multiplied ppm.

    Scale plan: the only global structure needed is a total order over
    per-customer revenue, supplied by sort.distributed_global_rank
    (approxQuantile buckets + per-bucket windows — never an
    Exchange SinglePartition); everything downstream is two bounded
    aggregates (one per (n, tot), one per decile) and an 11-row window.
    Ranks are tie-broken by custkey so the rank assignment — and hence
    the Gini numerator — is bit-identical across engines.
    """
    from hadoop_20_spark.operators.sort import distributed_global_rank

    orders = _t(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("rev")
    )
    ranked = distributed_global_rank(c, ["rev", "o_custkey"], rank_col="rn")
    tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("long").alias("tot"),
    )
    # r feeds BOTH the Gini aggregate and the decile aggregate — persist
    # it (house rule: entity-bounded, one row per customer) so the audit
    # ranks once instead of re-running the bucketed window per consumer
    r = ranked.crossJoin(F.broadcast(tot)).persist()
    # DECIMAL(38,0) keeps the numerator exact: sum((2i-n-1)*rev)*1e6
    # overflows BIGINT from sf0.01 up; `div` on decimals is Spark's
    # exact integral quotient (no rounded-then-floored decimal division)
    gini = r.groupBy("n", "tot").agg(
        F.expr(
            "(sum(CAST((2 * rn - n - 1) AS DECIMAL(38,0)) * rev) * 1000000) "
            "div (CAST(n AS DECIMAL(38,0)) * tot)"
        )
        .cast("long")
        .alias("gini_ppm")
    ).select("gini_ppm")
    deciles = (
        r.groupBy(F.expr("((rn - 1) * 10) DIV n").cast("long").alias("decile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.expr("(sum(CAST(rev AS DECIMAL(38,0))) * 1000000) div CAST(max(tot) AS DECIMAL(38,0))")
            .cast("long")
            .alias("share_ppm"),
            F.sum("rev").cast("long").alias("rev_cents"),
        )
    )
    grand = deciles.agg(F.sum("rev_cents").alias("g"))
    return (
        deciles.crossJoin(F.broadcast(grand))
        .crossJoin(F.broadcast(gini))
        .select(
            "decile",
            "n_customers",
            "share_ppm",
            F.expr(
                "(sum(CAST(rev_cents AS DECIMAL(38,0))) over (partition by decile % 1 "
                "order by decile rows unbounded preceding) * 1000000) div CAST(g AS DECIMAL(38,0))"
            )
            .cast("long")
            .alias("cum_share_ppm"),
            "gini_ppm",
        )
        .orderBy("decile")
    )

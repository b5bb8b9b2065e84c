"""Mergeable-sketch queries (split from stats.py in round 9 at the
2k-line threshold): the deterministic-summary family whose map-side
partials are sublinear — Misra-Gries frequent items (undercount
envelope) and the AMS F2 frequency-moment estimator (self-join size).
Their siblings live elsewhere: CMS (corpus_stats), HLL algebra
(corpus_stats), quantile histogram (stats).

Behavior-identical move; REGISTRY names, oracles, and notes unchanged.
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



_MG_K = 16
_MG_L = 100_000
_MG_MIX = 2_654_435_761  # Knuth multiplicative constant; keeps BIGINT range


@register(
    "misra_gries_heavy_hitters",
    f"""
    WITH keys AS (
      SELECT 'u' || CAST({_MG_L} // (1 + (l_orderkey * {_MG_MIX} + l_linenumber) % {_MG_L}) AS VARCHAR) AS item
      FROM lineitem
    ),
    cnt AS (SELECT item, COUNT(*) AS c FROM keys GROUP BY item),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt)
    SELECT item,
           CAST(c AS BIGINT) AS exact_count,
           (SELECT n FROM tot) AS total_occurrences,
           CAST(1 AS INT) AS found_by_sketch,
           CAST(1 AS INT) AS undercount_within_bound
    FROM cnt
    WHERE c * {_MG_K + 1} > (SELECT n FROM tot)
    ORDER BY exact_count DESC, item
    """,
    note=(
        "Misra-Gries mergeable frequent-items summary (k=16) with its deterministic "
        "guarantee audited: every item above the n/(k+1) frequency threshold MUST "
        "survive the per-partition trim + merge under ANY partitioning, with "
        "undercount <= n/(k+1) — the one-sided UNDERcount complement to "
        "cms_heavy_hitters; input is a derived power-law key (freq ~ 1/(r(r+1))) "
        "both engines reproduce exactly"
    ),
)
def misra_gries_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via per-partition Misra–Gries summaries merged by a
    tiny groupBy — the sketch quartet's fourth member (CMS overcount /
    HLL distinct / quantile histogram / MG undercount), and the only
    one whose guarantee is DETERMINISTIC with no hashing at all.

    The audited contract (operators/aggregate.misra_gries_partials):
    merged_count ∈ [exact - n/(k+1), exact] for every item under ANY
    partitioning, so each true heavy hitter (exact*(k+1) > n) must be
    found, with its undercount inside the envelope.  The output emits
    those two facts as always-true flags next to the exact counts; a
    broken trim or merge would flip a flag or drop a row and fail the
    hash gate.  Sketch-internal counts are NOT emitted — they depend on
    the partition layout, which is the algorithm's freedom, not its
    contract.

    Scale plan: the raw key column is never shuffled — each scan
    partition collapses to <= k rows map-side (a sublinear combiner),
    so the merge moves O(partitions * k) rows at ANY corpus size; the
    exact-count pass here is the test-scale audit certifying the
    envelope (drop it at 100 TB, same posture as cms_heavy_hitters).
    The input key is a deterministic power-law (rank-r frequency ~
    1/(r(r+1)), ~sqrt(L) distinct values) derived in pure integer
    arithmetic, identical in both engines.
    """
    from hadoop_20_spark.operators.aggregate import misra_gries_partials

    li = _t(spark, sf_dir, "lineitem").select(
        F.concat(
            F.lit("u"),
            F.expr(
                f"CAST({_MG_L} DIV (1 + (l_orderkey * {_MG_MIX} + l_linenumber) % {_MG_L}) AS STRING)"
            ),
        ).alias("item")
    )
    merged = (
        misra_gries_partials(li, "item", _MG_K)
        .groupBy("item")
        .agg(F.sum("mg_count").alias("mg_count"))
    )
    # persist rule (SCALE.md): exact is bounded by the item domain
    # (~sqrt(L) rows) and feeds BOTH the total and the HH filter —
    # without the persist the audit subtree re-scans the fact table.
    exact = (
        li.groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
        .persist()
    )
    tot = exact.agg(F.sum("exact_count").cast("long").alias("total_occurrences"))
    hh = (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("exact_count") * (_MG_K + 1) > F.col("total_occurrences"))
    )
    return (
        hh.join(merged, "item", "left")
        .select(
            "item",
            "exact_count",
            "total_occurrences",
            F.when(
                F.col("mg_count").isNotNull() & (F.col("mg_count") > 0), 1
            )
            .otherwise(0)
            .cast("int")
            .alias("found_by_sketch"),
            F.when(
                F.col("mg_count").isNotNull()
                & (F.col("mg_count") <= F.col("exact_count"))
                & (
                    (F.col("exact_count") - F.col("mg_count")) * (_MG_K + 1)
                    <= F.col("total_occurrences")
                ),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("undercount_within_bound"),
        )
        .orderBy(F.desc("exact_count"), "item")
    )


_AMS_M = 64  # estimators


@register(
    "ams_selfjoin_estimate",
    f"""
    WITH h AS (
      SELECT {_sql_md5_long("'ams_' || CAST(l_orderkey AS VARCHAR)")} AS h1,
             {_sql_md5_long("'amsb_' || CAST(l_orderkey AS VARCHAR)")} AS h2
      FROM lineitem
    ),
    x AS (
      SELECT t.j,
             SUM(CASE WHEN (CASE WHEN t.j < 60 THEN h1 // (1::BIGINT << t.j)
                                 ELSE h2 // (1::BIGINT << (t.j - 60)) END) % 2 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM h, unnest(range(0, {_AMS_M})) t(j)
      GROUP BY t.j
    ),
    est AS (SELECT CAST(SUM(s * s) // {_AMS_M} AS BIGINT) AS est_f2 FROM x),
    ex AS (
      SELECT CAST(SUM(c * c) AS BIGINT) AS exact_f2
      FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey)
    )
    SELECT exact_f2, est_f2,
           CAST(ABS(est_f2 - exact_f2) * 1000000 // exact_f2 AS BIGINT) AS err_ppm
    FROM ex CROSS JOIN est
    """,
    note=(
        "AMS (Alon-Matias-Szegedy) F2 sketch estimating the self-join size of the "
        "lineitem join key from 64 +/-1-sign linear projections (signs = md5 bits, "
        "zero RNG, so the DuckDB oracle reproduces every estimator exactly); exact "
        "F2 and integer-ppm error ride as the audit — the sketch the optimizer "
        "wants before planning a self-join or a groupBy on a possibly-skewed key"
    ),
)
def ams_selfjoin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment (self-join size) estimation in ONE streaming pass:
    each estimator j keeps a single counter S_j = sum of md5-derived
    +/-1 signs over ROW OCCURRENCES (never a per-key aggregate), and
    E[S_j^2] = F2 = sum of squared key frequencies — the quantity that
    prices a self-join or detects a skewed groupBy key before running
    it.  CMS answers point counts, HLL distinct, the quantile sketch
    ranks, Misra-Gries heavy hitters; AMS completes the sketch family
    with the frequency-moment axis.

    Scale plan: the m=64 estimator fan-out is row-local; map-side
    partial aggregation collapses every partition to <= 64 counters
    before the shuffle, so the sketch shuffle is O(partitions * 64)
    at any corpus size (the CMS build economics).  The exact-F2 pass
    is the test-scale audit (one key-keyed aggregate), dropped at
    100 TB.  Signs from md5 keep the estimate bit-identical across
    engines and partitionings — a seeded-RNG sketch could never be
    hash-audited.

    Hashing: TWO md5s per row supply all 64 sign bits (estimator j
    reads bit j of h1 for j<60, bit j-60 of h2 past it) — the
    Kirsch–Mitzenmacher discipline production sketches use.  The naive
    one-md5-per-(row, estimator) spelling costs 64 digests per row —
    384M digests at sf1, measured 61.7 s; the bit-sliced form computes
    2 and extracts bits row-locally (same estimator independence
    argument as CMS's md5-derived hash family).
    """
    from hadoop_20_spark.functions import md5_long

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    key = F.col("l_orderkey").cast("string")
    h = li.select(
        md5_long(F.concat(F.lit("ams_"), key)).alias("h1"),
        md5_long(F.concat(F.lit("amsb_"), key)).alias("h2"),
    )
    js = F.array(*[F.lit(j) for j in range(_AMS_M)])
    # shiftright's bit count must ride as a SQL expression — the python
    # F.shiftright only accepts a literal
    bit = F.expr(
        "CASE WHEN j < 60 THEN shiftright(h1, CAST(j AS INT)) "
        "ELSE shiftright(h2, CAST(j AS INT) - 60) END"
    )
    signs = h.select(F.explode(js).alias("j"), "h1", "h2").select(
        "j",
        F.when(bit % 2 == 1, 1).otherwise(-1).alias("sgn"),
    )
    x = signs.groupBy("j").agg(F.sum("sgn").alias("s"))
    est = x.agg(
        (F.sum(F.col("s") * F.col("s")) / _AMS_M).cast("long").alias("est_f2")
    )
    exact = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("exact_f2"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_f2",
        "est_f2",
        F.expr("abs(est_f2 - exact_f2) * 1000000 DIV exact_f2")
        .cast("long")
        .alias("err_ppm"),
    )

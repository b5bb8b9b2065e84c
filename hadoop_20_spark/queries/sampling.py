"""Sampling & reshaping queries — split from relational.py (round 7
hygiene: the module crossed the 2,000-line rule again).  Behavior-
identical; REGISTRY names, oracles, and notes are unchanged.  The
family: deterministic md5 sampling, interval (every-k-th) sampling on
the distributed rank, PPS systematic sampling and size-balanced
sharding on the distributed cumulative sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from hadoop_20_spark.operators import sort as sort_ops  # noqa: F401
from hadoop_20_spark.queries._base import (  # noqa: F401
    REGISTRY,
    Query,
    _sql_md5_long,
    _t,
    register,
)

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
    # Global every-100th-in-key-order WITHOUT Exchange SinglePartition:
    # distributed_global_rank buckets on driver-collected quantile
    # boundaries, so the rank window is partitioned (B parallel groups)
    # instead of funnelling the whole fact table through one task.
    # Semantics identical to InputSampler.IntervalSampler; plan-asserted
    # in tests/test_registry_plans.py::test_interval_sample_partitioned_rank.
    ranked = sort_ops.distributed_global_rank(
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber"),
        ["l_orderkey", "l_linenumber"],
        rank_col="rn",
    )
    return ranked.filter(F.col("rn") % 100 == 1).drop("rn")


@register(
    "pps_systematic_sample",
    """
    WITH c AS (
      SELECT doc_id, n_chars,
             SUM(n_chars) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM documents
    ),
    t AS (SELECT GREATEST(SUM(n_chars) // 50, 1) AS stride FROM documents)
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, CAST(cum AS BIGINT) AS cum
    FROM c, t
    WHERE cum // stride > (cum - n_chars) // stride
    ORDER BY doc_id
    """,
    note=(
        "weighted systematic (PPS) sample: select a doc whenever the global cumulative "
        "weight crosses a stride boundary (~50 cut points) — inclusion probability "
        "proportional to n_chars, all-integer selection rule; the cumulative weight comes "
        "from the bucketed two-pass distributed_cumsum, never a single-partition window"
    ),
)
def pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size systematic sampling: walk the
    corpus in doc_id order, select every doc whose span of cumulative
    weight (n_chars) crosses a stride boundary (stride = total/50) —
    the classic PPS design whose Horvitz-Thompson estimator of total
    weight is n_selected x stride, within one stride of truth by
    construction.  Long docs are proportionally more likely to be
    drawn — the length-balanced eval-sample design.

    Scale plan: the global cumulative weight is
    ``sort_ops.distributed_cumsum`` — approx-quantile buckets, exact
    per-bucket weight totals broadcast as offsets, per-bucket running-
    sum windows (B parallel groups, NO Exchange SinglePartition on the
    doc path — the interval_sample discipline generalized from rank to
    weighted cumsum).  Selection is a row-local integer rule; the
    stride is a broadcast 1-row aggregate."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cum = sort_ops.distributed_cumsum(docs, ["doc_id"], "n_chars", cum_col="cum")
    tot = docs.agg(
        F.greatest(F.expr("SUM(n_chars) DIV 50"), F.lit(1)).alias("stride")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .where(
            F.expr("cum DIV stride") > F.expr("(cum - n_chars) DIV stride")
        )
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            F.col("cum").cast("long").alias("cum"),
        )
        .orderBy("doc_id")
    )


@register(
    "balanced_shards",
    """
    WITH c AS (
      SELECT doc_id, n_chars,
             SUM(n_chars) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM documents
    ),
    t AS (SELECT SUM(n_chars) // 8 + 1 AS stride FROM documents)
    SELECT CAST((cum - 1) // stride AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM c, t GROUP BY shard ORDER BY shard
    """,
    note=(
        "size-balanced shard assignment: cut the doc_id-ordered corpus every total/8 units "
        "of cumulative n_chars — contiguous shards within ~1 max-doc of equal byte size (the "
        "training-shard writer layout), shard id a pure function of the distributed cumsum"
    ),
)
def balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to 8 contiguous, byte-balanced shards: shard =
    (cumulative n_chars - 1) DIV stride with stride = total/8 + 1 — the
    training-shard writer's layout decision (equal-SIZE shards, not
    equal-count, so no shard stalls the loader on a run of long docs).
    Shards are contiguous in doc_id order and each is within one
    maximum document of the target size, by construction.

    Scale plan: the cumulative weight is ``sort_ops.distributed_cumsum``
    (bucketed two-pass, no single-partition exchange on the doc path);
    shard assignment is row-local integer arithmetic against a
    broadcast 1-row stride; the report aggregate has an 8-value key.
    The real writer would ``partitionBy(shard)`` the same column."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cum = sort_ops.distributed_cumsum(docs, ["doc_id"], "n_chars", cum_col="cum")
    tot = docs.agg((F.expr("SUM(n_chars) DIV 8") + 1).alias("stride"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy(F.expr("(cum - 1) DIV stride").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
        .orderBy("shard")
    )

"""Physical-encoding advisor audits (split from stats.py in round 9 at
the 2k-line threshold): exact, oracle-checked readouts a storage layer
consults before choosing a codec or index — bitmap indexes (AND+popcount
conjunctions proven against direct counts) and run-length encoding (run
counts via dense-key adjacency joins).  The time-axis member of the
family, gorilla_timestamp_compression, lives with the events queries.

Behavior-identical move; REGISTRY names, oracles, and notes unchanged.
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
    "bitmap_index_audit",
    """
    WITH b1 AS (
      SELECT o_orderpriority AS v, o_orderkey // 32 AS chunk,
             CAST(bit_or(CAST(1 AS BIGINT) << CAST(o_orderkey % 32 AS INTEGER)) AS BIGINT) AS w
      FROM orders GROUP BY 1, 2
    ),
    b2 AS (
      SELECT o_orderstatus AS v, o_orderkey // 32 AS chunk,
             CAST(bit_or(CAST(1 AS BIGINT) << CAST(o_orderkey % 32 AS INTEGER)) AS BIGINT) AS w
      FROM orders GROUP BY 1, 2
    ),
    via_bitmap AS (
      SELECT b1.v AS o_orderpriority, b2.v AS o_orderstatus,
             CAST(SUM(bit_count(b1.w & b2.w)) AS BIGINT) AS n_bitmap
      FROM b1 JOIN b2 USING (chunk) GROUP BY 1, 2
    ),
    direct AS (
      SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_direct
      FROM orders GROUP BY 1, 2
    )
    SELECT d.o_orderpriority, d.o_orderstatus, d.n_direct,
           COALESCE(v.n_bitmap, 0) AS n_bitmap,
           CAST(CASE WHEN d.n_direct = COALESCE(v.n_bitmap, 0) THEN 1 ELSE 0 END AS INT) AS bitmaps_agree
    FROM direct d LEFT JOIN via_bitmap v
      ON v.o_orderpriority = d.o_orderpriority AND v.o_orderstatus = d.o_orderstatus
    ORDER BY d.o_orderpriority, d.o_orderstatus
    """,
    note=(
        "bitmap index audit: per-value bitmaps over 32-row chunks (bit_or of "
        "1<<pos partials), conjunctive predicate answered by chunk-aligned AND + "
        "popcount, proven equal to the direct group count for every "
        "(priority, status) cell — the low-cardinality index structure columnar "
        "warehouses use where B-trees and Bloom filters don't fit"
    ),
)
def bitmap_index_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index semantics as relational bit algebra: each value of a
    low-cardinality column gets one BIGINT word per 32-row chunk
    (bit i set = row 32*chunk+i has that value — 32, not 64, because
    DuckDB's ``1 << 63`` is overflow-checked on BIGINT while Spark's
    wraps, and 32-bit payloads keep both engines exact), built in ONE
    partial-aggregated shuffle; a conjunctive predicate (priority = X AND
    status = Y) is answered WITHOUT touching the fact table again —
    chunk-aligned AND then popcount.  The audit proves every cell of
    the 15-cell conjunction grid equal to the direct count, so the
    bitmap path is certified, not assumed.

    Scale plan: bitmap build shuffles (value, chunk) keys — size
    |values| * rows/64 words, ~2% of a BIGINT column, with bit_or
    map-side partials; the AND join is chunk-keyed between two
    bitmap relations (each far smaller than the fact), and popcount
    (bit_count) is codegen in both engines.  At 100 TB bitmaps
    persist beside the table (the BloomMapFile-sidecar discipline,
    layout.write_bloom_sidecar) and conjunctions/disjunctions compose
    as AND/OR word algebra — predicates never rescan the fact.
    Row-id here is the dense o_orderkey; a real table uses the
    file+rowgroup ordinal, same algebra.
    """
    orders = _t(spark, sf_dir, "orders")

    def bitmap(col):
        return (
            orders.groupBy(
                F.col(col).alias("v"),
                F.expr("o_orderkey DIV 32").alias("chunk"),
            )
            .agg(
                F.bit_or(
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(o_orderkey % 32 AS INT))")
                ).alias("w")
            )
        )

    b1 = bitmap("o_orderpriority").select(
        F.col("v").alias("o_orderpriority"), "chunk", F.col("w").alias("w1")
    )
    b2 = bitmap("o_orderstatus").select(
        F.col("v").alias("o_orderstatus"), "chunk", F.col("w").alias("w2")
    )
    via = (
        b1.join(b2, "chunk")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.sum(F.bit_count(F.expr("w1 & w2")))
            .cast("long")
            .alias("n_bitmap")
        )
    )
    direct = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_direct")
    )
    return (
        direct.join(via, ["o_orderpriority", "o_orderstatus"], "left")
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "n_direct",
            F.coalesce("n_bitmap", F.lit(0)).cast("long").alias("n_bitmap"),
            (F.col("n_direct") == F.coalesce("n_bitmap", F.lit(0)))
            .cast("int")
            .alias("bitmaps_agree"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


def _rle_oracle_col(col: str) -> str:
    return f"""
      SELECT '{col}' AS column_name,
             CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows,
             CAST(1 + COUNT(*) FILTER (WHERE a.{col} <> b.{col}) AS BIGINT) AS n_runs
      FROM orders a JOIN orders b ON a.o_orderkey = b.o_orderkey + 1"""


@register(
    "rle_encoding_audit",
    f"""
    WITH runs AS (
      {_rle_oracle_col("o_orderpriority")}
      UNION ALL
      {_rle_oracle_col("o_orderstatus")}
    )
    SELECT column_name, n_rows, n_runs,
           CAST(n_rows * 1000000 // n_runs AS BIGINT) AS avg_run_len_ppm,
           CAST(n_runs * 40 AS BIGINT) AS rle_bits,
           CAST(n_rows * 8 AS BIGINT) AS raw_bits,
           CAST(n_runs * 40 * 1000000 // (n_rows * 8) AS BIGINT) AS ratio_ppm
    FROM runs ORDER BY column_name
    """,
    note=(
        "run-length-encoding advisor: exact run counts for two low-cardinality "
        "columns in storage (o_orderkey) order via a dense-key ADJACENCY SELF-JOIN "
        "(k = k+1) — never a single-partition global window — with a fixed "
        "8-bit-value + 32-bit-length cost model vs raw bytes, all integer ppm"
    ),
)
def rle_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encoding-advisor readout (with bitmap_index_audit and
    gorilla_timestamp_compression): how runnable is each low-cardinality
    column in the table's physical order?  Near-random orders (like
    this corpus: avg run ~1.2) say dictionary/bitmap beats RLE and
    quantify exactly what a z-order or sort-by-column rewrite would
    have to buy before RLE pays.

    Scale plan: run boundaries come from a DENSE-KEY adjacency
    self-join (row k joined to row k+1) — both sides hash-partition on
    the key, no global ordering and no single-partition window anywhere
    (the distributed_global_rank lesson applied to run detection);
    counting is one scalar aggregate per column over the joined pairs.
    On a real table the dense ordinal is the file+rowgroup offset, same
    join.  All arithmetic is integer ppm.
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    ).localCheckpoint()  # shared by both adjacency passes
    n_rows = orders.count()

    def runs_for(col: str) -> DataFrame:
        a = orders.select(
            F.col("o_orderkey").alias("k"), F.col(col).alias("cur")
        )
        b = orders.select(
            (F.col("o_orderkey") + 1).alias("k"), F.col(col).alias("prev")
        )
        return (
            a.join(b, "k")
            .agg(
                (
                    F.lit(1)
                    + F.count(F.when(F.col("cur") != F.col("prev"), 1))
                ).cast("long").alias("n_runs")
            )
            .select(
                F.lit(col).alias("column_name"),
                F.lit(n_rows).cast("long").alias("n_rows"),
                "n_runs",
            )
        )

    out = runs_for("o_orderpriority").unionByName(runs_for("o_orderstatus"))
    return out.select(
        "column_name",
        "n_rows",
        "n_runs",
        F.expr("n_rows * 1000000 DIV n_runs").cast("long").alias("avg_run_len_ppm"),
        (F.col("n_runs") * 40).cast("long").alias("rle_bits"),
        (F.col("n_rows") * 8).cast("long").alias("raw_bits"),
        F.expr("n_runs * 40 * 1000000 DIV (n_rows * 8)")
        .cast("long")
        .alias("ratio_ppm"),
    ).orderBy("column_name")

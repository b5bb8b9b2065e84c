"""Fixture/table catalog.

The reference has no catalog: schema lives in user code as Writable class
choices (``mapred/JobConf.java#setOutputKeyClass``) and data location is a
raw HDFS path per job.  Here every table is a parquet directory with an
explicit schema; ``load_table`` is the analog of
``mapred/FileInputFormat.java#setInputPaths`` + the SequenceFile header's
key/value-class metadata, upgraded to full column schemas.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins — the
# Spark analog of shipping a table through the DistributedCache
# (core/filecache/DistributedCache.java) for a replicated map-side join.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one fixture table.

    Parquet scan: Catalyst pushes predicates/projections into the scan
    (``PushedFilters``/``ReadSchema`` in .explain), which the reference
    could not do at all — its only scan-time filter was
    ``mapred/SequenceFileInputFilter.java``.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Fixture timestamps are parquet TIMESTAMP(isAdjustedToUTC=false);
    # Spark 4 would infer TIMESTAMP_NTZ, which breaks event-time ops
    # (unix_micros, watermarks) and diverges from the DuckDB oracle's
    # naive-as-UTC reading.  Read them as session-tz (UTC) timestamps —
    # set at call time so the driver's vanilla session behaves too.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        # Older fixture generations wrote events.ts as TIMESTAMP(NANOS),
        # which Spark's reader rejects; read nanos as long and truncate
        # to microseconds (the same floor DuckDB/pyarrow apply when
        # down-converting), keeping the public schema `ts: timestamp`.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir or DEFAULT_SF_DIR, name))
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir or DEFAULT_SF_DIR, name))


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so SQL queries mirror the DuckDB
    oracle's pre-registered views exactly."""
    for n in TABLES:
        load_table(spark, n, sf_dir).createOrReplaceTempView(n)

"""SparkSession factory.

Replaces the reference's job-submission client (
``src/mapred/org/apache/hadoop/mapred/JobClient.java#runJob`` +
``JobConf.java``): where a JobConf carried the whole physical plan as
strings, here the session carries only engine tuning, and plans are
DataFrames.

Scale posture (100 TB design point, even though tests run local):
- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
  — subsumes the reference's manual salting / reducer-count tuning
  (``mapred.reduce.tasks``).
- shuffle partitions sized to the local core count for tests; on a real
  cluster AQE's coalescing makes the initial number a ceiling, not a fix.
- Arrow enabled for the Pandas-UDF slow path.
- session timezone pinned UTC so results are comparable with the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(
    app_name: str = "hadoop_20_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    Mirrors the role of ``JobClient``/``JobConf`` in the reference but the
    settings here are engine-level, not per-query: Catalyst owns the
    per-query physical choices the reference forced users to hand-pick
    (combiner? broadcast? reducer count? total-order sampling?).
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    # local[N] => one JVM; N concurrent tasks. Shuffle partitions default
    # to core count: fewer wastes cores, more adds scheduling overhead at
    # test scale. At 100 TB you would raise this (or let AQE coalesce).
    if shuffle_partitions is None:
        cpus = os.cpu_count() or 8 if DEFAULT_CPUS == "*" else int(DEFAULT_CPUS)
        shuffle_partitions = max(8, cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime bloom-filter join pruning: the Spark-native descendant of
        # the reference's core/util/bloom + BloomMapFile scan filtering.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # bucketed-table warehouse kept out of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE", "/tmp/h20_spark_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

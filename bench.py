"""Benchmark suite — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Analogs of the reference's canonical workloads (BASELINE.md §3):
B1 agg scan (WordCount/Aggregate framework) … B9 dedup/similarity.
Prints ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query runs 3 times (after one warm-up of the flagship to absorb JVM
startup); the median per-query wall-clock is reported, and ``value`` is
the sum of medians.  Results are materialized via a ``noop``-format
write: unlike ``count()`` (which lets Catalyst prune all columns and —
for sort queries — drop the sort entirely via EliminateSorts), a write
sink consumes every output row with all columns, so the measured plan is
the plan a real consumer would pay for.  Nothing ships to the driver.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_20_spark import get_spark  # noqa: E402
from hadoop_20_spark.registry import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = {
    "b1_agg_scan": "q1_pricing_summary",
    "b2_grep": "grep",
    "b3_global_sort": "total_order_sort",
    "b4_star_join": "join_star",
    "b5_override_join": "join_override",
    "b6_secondary_sort": "secondary_sort",
    "b7_demux_write": None,  # special-cased below (partitionBy write)
    "b8_window_agg": "tumbling_window_agg",
    "b9a_minhash_dedup": "minhash_lsh_pairs",
    "b9b_embedding_topk": "embedding_topk",
}


def run_once(spark, name: str) -> float:
    t0 = time.time()
    if name == "b7_demux_write":
        # MultipleOutputFormat analog: demux events by event_type.
        from hadoop_20_spark.catalog import load_table

        out = os.path.join(
            os.environ.get("SPARK_GRAFT_TMP", "/tmp"), "bench_demux"
        )
        (
            load_table(spark, "events", SF_DIR)
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(out)
        )
    else:
        df = REGISTRY[BENCH_QUERIES[name]].fn(spark, SF_DIR)
        # noop write forces full evaluation — every row, every column,
        # sorts retained (count() would let EliminateSorts drop an
        # orderBy and prune all columns) — without driver collect.
        df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark("bench")
    # warm-up: JVM + parquet footer caches
    REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).count()

    per_query: dict[str, float] = {}
    for name in BENCH_QUERIES:
        times = [run_once(spark, name) for _ in range(3)]
        per_query[name] = round(statistics.median(times), 3)
    total = round(sum(per_query.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "bench_suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

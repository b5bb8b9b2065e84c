"""Triage harness for the g1 concurrent-mix throughput regression.

Round 12 recorded g1 (2 waves x {agg scan, global sort, minhash,
stream join} submitted at once on the shared session) at 0.69x/0.92x
serial throughput across two independent runs, down from r11's 2.08x —
with zero code change on any mix entry's path.  This tool isolates the
scenario: it warms the mix entries, measures each serially (min of
``reps``), then runs the concurrent mix ``trials`` times, recording
per-job latency AND per-streaming-run micro-batch latencies (via
streaming.pop_query_progress, which is what the bench's g1 lacked —
two concurrent b13 copies race on LAST_QUERY_PROGRESS).

Optional A/B: ``--fair`` restarts the session with
spark.scheduler.mode=FAIR + a default-FAIR pool file, the hypothesis
being that FIFO lets the wide batch stages starve every micro-batch of
the stream joins (each micro-batch is a short multi-job sequence that
re-queues behind 32-task stages over and over).

Usage: python tools/g1_triage.py [--fair] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_20_spark import get_spark  # noqa: E402
from hadoop_20_spark import streaming as stream_ops  # noqa: E402
from hadoop_20_spark.registry import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MIX = ("q1_pricing_summary", "total_order_sort", "minhash_lsh_pairs",
       "streaming_stream_join")
WAVES = 2


def run_once(spark, name: str) -> float:
    t0 = time.time()
    REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.time() - t0, 3)


def main() -> None:
    fair = "--fair" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    trials = int(args[0]) if args else 3

    extra = None
    if fair:
        alloc = os.path.join(tempfile.gettempdir(), "g1_triage_pools.xml")
        with open(alloc, "w") as f:
            f.write(
                "<?xml version='1.0'?><allocations>"
                "<pool name='default'><schedulingMode>FAIR</schedulingMode>"
                "<weight>1</weight></pool></allocations>"
            )
        extra = {
            "spark.scheduler.mode": "FAIR",
            "spark.scheduler.allocation.file": alloc,
        }
    spark = get_spark("g1_triage", extra_conf=extra)
    print(json.dumps({
        "scheduler": spark.sparkContext.getConf().get(
            "spark.scheduler.mode", "FIFO"
        )
    }))

    # warm + serial floor
    serial = {}
    for name in MIX:
        run_once(spark, name)  # warm
        serial[name] = min(run_once(spark, name) for _ in range(2))
    stream_ops.pop_query_progress()
    serial_equiv = round(sum(serial.values()) * WAVES, 3)
    print(json.dumps({"serial": serial, "serial_equiv": serial_equiv}))

    clean = "--clean" in sys.argv

    def jvm_stats() -> dict:
        jvm = spark.sparkContext._jvm
        rt = jvm.java.lang.Runtime.getRuntime()
        heap_mb = (rt.totalMemory() - rt.freeMemory()) // (1024 * 1024)
        gcs = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        gc_ms = sum(gcs.get(i).getCollectionTime() for i in range(gcs.size()))
        n_views = len([
            t.name for t in spark.catalog.listTables()
            if t.isTemporary
        ])
        return {"heap_mb": int(heap_mb), "gc_ms_total": int(gc_ms),
                "temp_views": n_views}

    jobs = [n for n in MIX for _ in range(WAVES)]
    for t in range(trials):
        with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
            t0 = time.time()
            lats = list(pool.map(lambda n: (n, run_once(spark, n)), jobs))
            wall = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        prog = stream_ops.pop_query_progress()
        if clean:
            for tb in spark.catalog.listTables():
                if tb.isTemporary and tb.name.startswith("q_"):
                    spark.catalog.dropTempView(tb.name)
            spark.sparkContext._jvm.java.lang.System.gc()
        print(json.dumps({
            "trial": t,
            "wall": wall,
            "throughput_x": round(serial_equiv / wall, 2),
            "jvm": jvm_stats(),
            "lats": {f"{n}#{i}": l for i, (n, l) in enumerate(lats)},
            "stream_runs": [
                {k: p[k] for k in
                 ("sink", "wall_secs", "n_batches", "batch_ms")}
                for p in prog
            ],
        }))


if __name__ == "__main__":
    main()

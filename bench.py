"""Benchmark suite — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Analogs of the reference's canonical workloads (BASELINE.md §3):
B1 agg scan (WordCount/Aggregate framework) … B9 dedup/similarity.
Prints ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query runs 3 times (after one warm-up of the flagship to absorb JVM
startup); the median per-query wall-clock is reported (plus the min, as
``secs_min``, for noise diagnosis), and ``value`` is the sum of medians.
DuckDB-anchored entries also record ``ratio`` = secs/duckdb_secs: ambient
host noise moves both engines together (the r3→r4 suite drifted +14%
with identical hashes while the DuckDB anchors drifted +19–27% the same
day), so round-over-round comparisons should read the ratio, not the raw
seconds.  Results are materialized via a ``noop``-format
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
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_20_spark import get_spark  # noqa: E402
from hadoop_20_spark.functions import md5_long  # noqa: E402
from hadoop_20_spark.registry import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Entries with a cheap registry-oracle run in DuckDB on the same
# parquet (BASELINE.md §3 prescribes this for B1–B6; the rest are
# anchored wherever the oracle is fast enough to run 3x per suite —
# as of round 5 that is every entry except the b7 demux write and the
# unrolled-kmeans b12 oracle).  The anchor is a row-count cross-check and a single-node
# latency floor, NOT a target: at sf0.1 DuckDB's in-process vectorized
# engine has no JVM/scheduler/shuffle overhead, which is exactly the
# overhead that buys Spark horizontal scale-out at 100 TB.
DUCKDB_COMPARABLE = (
    "b1_agg_scan",
    "b2_grep",
    "b3_global_sort",
    "b4_star_join",
    "b5_override_join",
    "b6_secondary_sort",
    "b8_window_agg",
    "b9a_minhash_dedup",
    "b9b_embedding_topk",
    "b10a_winnowing",
    "b10b_cdc_chunks",
    "b10c_tfidf",
    "b11_snowflake_join",
    "b13_stream_join",  # anchor = the BATCH time-range self-join oracle
    "b14_interval_sample",
    "b15_cms_sketch",
    "b16_copurchase",
    "b17_paragraph_dedup",
    "b18_span_dedup",
    "b20_quality_gate",
    "b21_dsir_select",
    "b22_exact_median",
    "b23_rs_erasure",
    "b24_star_cc",
)

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
    # b10: LLM-text operators — the round-3 winnowing regression was
    # invisible to the bench because no text op was in the suite.
    "b10a_winnowing": "winnowing_fps",
    "b10b_cdc_chunks": "cdc_chunks",
    "b10c_tfidf": "tfidf_top_terms",
    # b11: the join-heaviest TPC-H shape in the registry (8-table
    # snowflake, five broadcast dims, one fact shuffle) — the bench's
    # proxy for multi-dim star-schema work at scale.
    "b11_snowflake_join": "q8_market_share",
    # b12: the cluster-then-prune embedding path.  The k-means TRAINING
    # loop (fixed job count: 3 iterations x ~3 jobs + checkpoints) is
    # run ONCE, untimed, into a cached centroid table; the 3 timed
    # passes cover only the prune path (assign + within-cell cosine join
    # + keep-lowest-id), so a prune regression can't hide inside
    # training noise.  train_secs is recorded separately in the detail.
    # The untimed fingerprint still runs the FULL registry query
    # (training included) so the hash stays comparable to the gate
    # oracle.  No DuckDB anchor: the unrolled-kmeans oracle is
    # gate-checked but too slow to run 3x per bench.
    "b12_semantic_dedup": "semantic_dedup",
    # b13: streaming — stream-stream join (the slowest gate family had
    # ZERO bench coverage, the exact blind spot that hid winnowing in
    # r3).  The registry fn runs the stream to completion synchronously
    # (processAllAvailable over the staged file source), so the timed
    # pass covers micro-batch scheduling + watermark state + join state,
    # and the DuckDB anchor is the batch time-range self-join oracle.
    "b13_stream_join": "streaming_stream_join",
    # b14: the round-6 fix — bucketed two-pass global rank (every-100th
    # row in key order) replacing the single-partition window.  In the
    # bench so a regression back to Exchange SinglePartition shows up
    # as a wall-clock step, not just a plan-test failure.
    "b14_interval_sample": "interval_sample",
    # b15/b16: round-6 additions with genuinely new plan shapes — the
    # CMS sketch build (map-side combine to <=256 cells before the
    # shuffle + broadcast readout) and the market-basket row-local
    # C(k,2) expansion (no postings self-join).  In the bench so a
    # regression to a widened sketch shuffle or a join-based pair
    # expansion shows up as wall-clock, not just a plan-test failure.
    "b15_cms_sketch": "cms_heavy_hitters",
    "b16_copurchase": "copurchase_pairs",
    # b17: round-7 — sub-document exact dedup with reconstruction
    # (segment -> 32-byte-hash first-occurrence shuffle -> keeper join
    # -> doc-keyed rebuild).  The body-carrying keeper join is the cost
    # center; in the bench so a regression to a window-based keeper or
    # an unpruned body shuffle shows up as wall-clock.
    "b17_paragraph_dedup": "paragraph_dedup",
    # b18: round-8 — exact-substring duplicate spans (windowed
    # fingerprints + keep-first window + island merge).  One md5 per
    # token position; the fingerprint window is the only fact-scale
    # shuffle — in the bench so a regression back to the
    # groupBy+join-back double shuffle shows up as wall-clock.
    "b18_span_dedup": "dup_span_report",
    # b19: round-8 — product-quantized retrieval.  Codebook TRAINING
    # (4 subspace k-means, fixed job count) runs once untimed into ctx
    # (the b12 pattern); the 3 timed passes cover the recurring
    # production path: encode + reconstruct + top-10 scoring for the
    # query set.  The untimed fingerprint runs the FULL registry query
    # so the hash stays comparable to the gate oracle.
    "b19_pq_retrieval": "pq_recall_audit",
    # b20: round-8 — the declarative quality gate (constraint suite).
    # The recurring post-ingest job every production load runs; its
    # whole cost model is "one wide aggregate per table" (3 scans for
    # 12 checks), so a regression to scan-per-check shows up as a
    # wall-clock multiple, not a subtle drift.
    "b20_quality_gate": "constraint_suite",
    # b21: round-8 — DSIR importance resampling, the data-selection
    # pipeline shape: token explode -> hashed feature matrix (the one
    # doc-keyed fact shuffle) -> 1024-row bucket LM join -> Gumbel
    # top-k.  In the bench so a regression to a cached/re-shuffled
    # feature matrix or a global sort for the top-k shows up as
    # wall-clock.
    "b21_dsir_select": "dsir_importance_sample",
    # b22: round-8 — exact order statistics by iterative range
    # refinement (4 filtered scans + bounded collects, NEVER a global
    # sort).  A unique execution profile in the suite: driver-paced
    # rounds whose BETWEEN filters push into the scan; a regression to
    # a sort-based selection roughly doubles the entry.
    "b22_exact_median": "exact_median_refinement",
    # b23: round-9 — Reed-Solomon two-erasure recovery over GF(2^8).
    # A compute profile nothing else in the suite has: wide pure-integer
    # codegen (power-column GF algebra) feeding parallel conditional
    # bit_xor aggregates in one (stripe,pos) shuffle.  In the bench so a
    # regression to a join-based decode or a lookup-table UDF shows up
    # as wall-clock.
    "b23_rs_erasure": "raid_rs_two_erasure",
    # b24: round-9 — star-contraction connected components over the
    # per-customer order chains.  The suite's iterative-driver-loop
    # profile: ~7 rounds of (groupBy-min shuffle + co-keyed join +
    # localCheckpoint + two set-difference counts).  In the bench so a
    # regression in round count (contraction degrading toward per-hop
    # propagation) or in per-round lineage handling shows up as
    # wall-clock.
    "b24_star_cc": "cc_star_order_chains",
    # b25: round-10 — the TestDFSIO analog (the last reference harness
    # without a bench twin): sequential WRITE of a teragen table (100-
    # byte records, 10x the events row count — ~1M rows / ~100 MB of
    # row data at sf0.1) followed by a full sequential READ-back, both
    # through the real parquet path.  Pure I/O + encode/decode profile:
    # no shuffle, no join — a storage-layer regression (codec, row-group
    # sizing, commit protocol) moves this entry and nothing else.
    # write/read split + MB/s recorded in the detail.
    "b25_dfsio": None,  # special-cased below (write + read-back)
    # b26: round-13 — IVF-bucketed near-dup PAIRS (the runnable path the
    # SRP guard's raise names as remediation).  The suite's
    # quantize-then-pair profile: sampled k-means training, top-2 cell
    # assignment, id-only candidate self-join on cell, exact-cosine
    # verify re-attaching vectors by id.  In the bench so a regression
    # to vector-carrying candidates (payload through the pair shuffle)
    # or a broken histogram pre-flight shows up as wall-clock.
    "b26_ivf_near_dups": "embedding_near_dups_ivf",
}


def _max_stage_id(spark) -> int:
    """Highest stage id the app status store has seen (-1 if the UI/REST
    store is off).  Stage ids are globally monotone, so 'stages after
    this mark' attributes work to one bench entry even if the store
    evicts OLD stages (spark.ui.retainedStages)."""
    stages = _stage_list(spark)
    return max((s["stageId"] for s in stages), default=-1)


def _stage_list(spark) -> list:
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return []
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages", timeout=10
        ) as r:
            return json.load(r)
    except OSError:
        return []


def exec_metrics_since(spark, mark: int) -> dict:
    """MEASURED executor metrics for every completed stage with id >
    ``mark`` — shuffle bytes, spill, and scan input from Spark's own
    status store (REST v1), not estimates.  This is the per-entry scale
    evidence: a plan regression that doubles a shuffle shows up here in
    bytes even when wall-clock noise hides it (the reference's job
    counters — Map output bytes, spilled records — played this role in
    every MapReduce job's summary)."""
    done = [s for s in _stage_list(spark) if s["stageId"] > mark
            and s["status"] == "COMPLETE"]
    if not done:
        return {}
    mb = 1024.0 * 1024.0

    def tot(key: str) -> float:
        return round(sum(s.get(key, 0) for s in done) / mb, 3)

    return {
        "stages": len(done),
        "tasks": sum(s.get("numCompleteTasks", 0) for s in done),
        "input_mb": tot("inputBytes"),
        "shuffle_write_mb": tot("shuffleWriteBytes"),
        "shuffle_read_mb": tot("shuffleReadBytes"),
        "spill_mem_mb": tot("memoryBytesSpilled"),
        "spill_disk_mb": tot("diskBytesSpilled"),
    }


def run_once(spark, name: str, ctx: dict | None = None) -> float:
    t0 = time.time()
    if name == "b19_pq_retrieval" and ctx and "b19" in ctx:
        from pyspark.sql import Window

        from hadoop_20_spark.operators import similarity as _sim

        emb, books, sub = ctx["b19"]
        codes = _sim.pq_encode(emb, books, sub)
        # norms hoisted per vector (r13) — mirrors pq_recall_audit's
        # scored_pq shape; sim values and the result hash are identical
        recon = _sim.pq_reconstruct(codes, books).withColumn(
            "_rn", _sim.norm(F.col("recon"))
        )
        q = emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"),
            _sim.norm(F.col("embedding")).alias("_qn"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), "neighbor_id"
        )
        top = (
            F.broadcast(q)
            .crossJoin(recon)
            .where(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.round(
                    _sim.dot(F.col("q_vec"), F.col("recon"))
                    / (F.col("_qn") * F.col("_rn")),
                    4,
                ).alias("sim"),
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 10)
        )
        top.write.format("noop").mode("overwrite").save()
    elif name == "b12_semantic_dedup" and ctx and "b12_cents" in ctx:
        from hadoop_20_spark.catalog import load_table
        from hadoop_20_spark.operators import similarity as _sim

        df = _sim.semantic_dedup(
            load_table(spark, "embeddings", SF_DIR),
            threshold=0.45,
            centroids=ctx["b12_cents"],
            # known k flips the assignment two-level past the swap
            # point (inert at sf<=1 where auto-k < 256)
            n_centroids=ctx["b12_k"],
        )
        df.write.format("noop").mode("overwrite").save()
    elif name == "b25_dfsio":
        out = os.path.join(
            os.environ.get("SPARK_GRAFT_TMP", "/tmp"), "bench_dfsio"
        )
        # the teragen rows are materialized ONCE, untimed, in the
        # pre-section (ctx["b25_df"]) — timing the synthesis (md5
        # compute) inside tw would conflate CPU-side generation with
        # storage throughput and break the "a storage-layer regression
        # moves this entry and nothing else" contract
        tw = time.time()
        ctx["b25_df"].write.mode("overwrite").parquet(out)
        ctx["b25_write_secs"] = time.time() - tw
        tr = time.time()
        spark.read.parquet(out).write.format("noop").mode("overwrite").save()
        ctx["b25_read_secs"] = time.time() - tr
    elif name == "b7_demux_write":
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


def fingerprint(df) -> tuple[int, str]:
    """Distributed, order-independent output fingerprint: rows out plus
    the sum of a 60-bit md5 of every row's '\\x1f'-joined string form.
    Self-validating bench runs (BASELINE.md §3) — a plan change that
    alters results shifts the hash even when the timing looks fine.
    Runs untimed, after the measured passes."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in df.columns]
    row = (
        df.select(md5_long(F.concat_ws("\x1f", *cols)).alias("h"))
        # decimal partial sums: 60-bit values overflow long under ANSI
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("hsum"),
        )
        .collect()[0]
    )
    return int(row["n"]), format(int(row["hsum"] or 0) & (2**64 - 1), "x")


def duckdb_compare(name: str) -> dict:
    """Run the registry oracle SQL for a B1-B6 query in DuckDB on the
    same parquet; record wall-clock and rows for a cross-engine anchor."""
    import duckdb

    from hadoop_20_spark.catalog import TABLES, table_path

    qname = BENCH_QUERIES[name]
    sql = REGISTRY[qname].oracle
    if sql is None:
        return {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    times = []
    rows = 0
    for _ in range(3):
        t0 = time.time()
        rows = len(con.execute(sql).fetchall())
        times.append(time.time() - t0)
    con.close()
    return {"duckdb_secs": round(statistics.median(times), 3), "duckdb_rows": rows}


# GridMix/MRBench analogs (src/benchmarks/gridmix2/, src/test/.../
# MRBench.java): the reference's canonical PERFORMANCE harness was not a
# serial suite — it was a MIX of concurrent jobs plus repeated small-job
# latency.  g1 submits 2 waves of 4 diverse entries (scan-agg, global
# sort, CPU-bound minhash, micro-batch stream join) simultaneously from
# a thread pool against the SHARED session and reports per-job latency
# percentiles + throughput vs the serial equivalent; g2 repeats a
# q6-class small job 20x and reports the scheduling-floor percentiles.
GRIDMIX_MIX = ("b1_agg_scan", "b3_global_sort", "b9a_minhash_dedup", "b13_stream_join")
GRIDMIX_WAVES = 2
SMALL_JOB = "q6_forecast_revenue"
SMALL_JOB_REPS = 20


#: g1 runs this many timed trials and reports the MEDIAN throughput.
#: One trial is NOT a measurement here: the mix's wall is always the
#: slowest streaming copy, whose micro-batch jobs queue behind the
#: other seven jobs' wide stages — a per-trial scheduling lottery the
#: round-13 triage measured at 0.8×–3.2× across five back-to-back
#: trials on an idle box, under FIFO and FAIR alike (tools/g1_triage.py;
#: SCALE.md "g1 variance").  r11's 2.08× and r12's 0.69×/0.92× were
#: single samples of that distribution, not a regression.
GRIDMIX_TRIALS = 3


def run_gridmix_concurrent(spark, serial_detail: dict) -> dict:
    """Submit GRIDMIX_WAVES copies of each mix entry at once; each task
    times its own noop-write run, then fingerprints its output so the
    concurrent results are hash-checked against the serial runs (a
    concurrency bug that corrupts shared state must shift a hash, not
    just a latency).  GRIDMIX_TRIALS timed trials; the headline
    throughput is the median trial's, and every trial's wall plus each
    streaming copy's per-batch latencies are kept in the detail so a
    real streaming regression is separable from scheduling luck."""
    from concurrent.futures import ThreadPoolExecutor

    def one(name: str) -> dict:
        t0 = time.time()
        run_once(spark, name)
        return {"name": name, "lat": round(time.time() - t0, 3)}

    def check(name: str) -> dict:
        rows, h = fingerprint(REGISTRY[BENCH_QUERIES[name]].fn(spark, SF_DIR))
        return {"name": name, "rows": rows, "hash": h}

    from hadoop_20_spark import streaming as _stream_ops

    jobs = [n for n in GRIDMIX_MIX for _ in range(GRIDMIX_WAVES)]
    serial_equiv = round(sum(serial_detail[n]["secs"] for n in jobs), 3)

    trials: list[dict] = []
    results: list[dict] = []
    for _ in range(GRIDMIX_TRIALS):
        _stream_ops.pop_query_progress()  # drain earlier runs
        with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
            t0 = time.time()
            timed = list(pool.map(one, jobs))
            wall = time.time() - t0
        # per-copy micro-batch latency under concurrency is the triage
        # signal (two concurrent copies race on LAST_QUERY_PROGRESS, so
        # the per-run log is the only attribution that works here)
        stream_runs = [
            {k: p[k] for k in ("sink", "wall_secs", "n_batches",
                               "batch_ms_p50", "batch_ms_max")}
            for p in _stream_ops.pop_query_progress()
        ]
        trials.append({
            "wall_secs": round(wall, 3),
            "throughput_x": round(serial_equiv / wall, 2),
            "lats": {f"{n}#{i}": t["lat"] for i, (n, t) in
                     enumerate(zip(jobs, timed))},
            "stream_runs": stream_runs,
        })
        results = timed  # last trial's latencies feed per_entry below
        spark.catalog.clearCache()
    # hash checks run CONCURRENTLY once (a concurrency bug must shift
    # a hash) but outside the timed trials
    with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
        checks = list(pool.map(check, jobs))
    results = [{**t, **c} for t, c in zip(results, checks)]
    spark.catalog.clearCache()

    lats = sorted(r["lat"] for r in results)
    per_entry: dict[str, dict] = {}
    for name in GRIDMIX_MIX:
        rs = [r for r in results if r["name"] == name]
        per_entry[name] = {
            "lats": [r["lat"] for r in rs],
            "serial_secs": serial_detail[name]["secs"],
            "hash_match": all(
                r["hash"] == serial_detail[name]["hash"]
                and r["rows"] == serial_detail[name]["rows"]
                for r in rs
            ),
        }
    mid = sorted(trials, key=lambda t: t["throughput_x"])[len(trials) // 2]
    return {
        "n_jobs": len(jobs),
        "n_trials": len(trials),
        "wall_secs": mid["wall_secs"],
        "serial_equiv_secs": serial_equiv,
        "throughput_x": mid["throughput_x"],
        "throughput_x_trials": [t["throughput_x"] for t in trials],
        "p50_lat": lats[len(lats) // 2],
        "p95_lat": lats[min(len(lats) - 1, int(len(lats) * 0.95))],
        "per_entry": per_entry,
        "trials": trials,
        "all_hashes_match": all(e["hash_match"] for e in per_entry.values()),
    }


def run_gridmix_small_jobs(spark) -> dict:
    """MRBench: the latency floor of a small job repeated 20x on the
    shared session — scheduler + planning overhead, the number a
    multi-tenant cluster's interactive users feel."""
    lats = []
    for _ in range(SMALL_JOB_REPS):
        t0 = time.time()
        REGISTRY[SMALL_JOB].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        lats.append(time.time() - t0)
    lats.sort()
    return {
        "n": len(lats),
        "query": SMALL_JOB,
        "p50": round(lats[len(lats) // 2], 3),
        "p95": round(lats[min(len(lats) - 1, int(len(lats) * 0.95))], 3),
        "min": round(lats[0], 3),
        "max": round(lats[-1], 3),
        "total_secs": round(sum(lats), 3),
    }


SCHED_SMALL_REPS = 12
SCHED_MONSTER_THREADS = 2  # overlap covers the driver-side gaps between runs
SCHED_MONSTER_ROWS = 60_000_000  # one wide CPU stage of a few seconds


def _sched_monster_once(spark) -> None:
    """One monster job: a single 32-task CPU-bound stage (md5 over a
    range) of roughly constant cost.  A registry query as monster made
    g3 depend on the JVM's JIT history — in-suite, a fully-warmed JVM
    ran minhash stages so fast the FIFO queue never built, and the
    measured fairness gap flapped between 0.8x and 1.4x run-over-run.
    Fixed work keeps the contended stage a few seconds everywhere."""
    (
        spark.range(SCHED_MONSTER_ROWS, numPartitions=32)
        .select(F.sum(F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10).cast("long")).alias("s"))
        .write.format("noop").mode("overwrite").save()
    )


def _contended_small_jobs(spark, pool_small: str | None, pool_bulk: str | None) -> dict:
    """Run SMALL_JOB x SCHED_SMALL_REPS while monster jobs loop in
    background threads; latencies are what an interactive user feels on
    a busy cluster.  Pool names are thread-local scheduler properties
    (pinned-thread mode), None = default pool.  Each probe waits for an
    ACTIVE monster job before submitting (status tracker poll), so the
    measurement is contended by construction, not by race."""
    import threading

    stop = threading.Event()
    monster_runs = [0]
    lock = threading.Lock()

    def monster():
        if pool_bulk:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool_bulk)
        while not stop.is_set():
            _sched_monster_once(spark)
            with lock:
                monster_runs[0] += 1

    threads = [
        threading.Thread(target=monster, daemon=True)
        for _ in range(SCHED_MONSTER_THREADS)
    ]
    phase_t0 = time.time()
    for th in threads:
        th.start()
    tracker = spark.sparkContext.statusTracker()

    def fresh_wide_stage() -> bool:
        # a wide monster stage that JUST started: >= 24 tasks running
        # and under a quarter complete.  Gating every probe on this
        # exact state pins the probe to the worst-case queue position —
        # earlier gates (active job, saturated slots) left the probe's
        # position within the stage to chance, and p95 flapped between
        # 0.75x and 2.8x run-over-run on that roulette
        for s in tracker.getActiveStageIds():
            info = tracker.getStageInfo(s)
            if (
                info
                and info.numTasks >= 24
                and info.numActiveTasks >= 24
                and info.numCompletedTasks <= info.numTasks // 4
            ):
                return True
        return False

    if pool_small:
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool_small)
    lats = []
    for _ in range(SCHED_SMALL_REPS):
        # ... AND both monster jobs in flight: with only one active, the
        # probe waits at most one stage and FIFO ~= FAIR (a 32-task
        # stage on 32 slots releases everything together); the fairness
        # gap is about queueing behind a BACKLOG, so measure that state
        deadline = time.time() + 15
        while (
            len(tracker.getActiveJobsIds()) < 2 or not fresh_wide_stage()
        ) and time.time() < deadline:
            time.sleep(0.004)
        t0 = time.time()
        REGISTRY[SMALL_JOB].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        lats.append(time.time() - t0)
    stop.set()
    for th in threads:
        th.join()
    phase_secs = round(time.time() - phase_t0, 3)
    if pool_small:
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
    rows, h = fingerprint(REGISTRY[SMALL_JOB].fn(spark, SF_DIR))
    lats.sort()
    return {
        "p50": round(lats[len(lats) // 2], 3),
        "p95": round(lats[min(len(lats) - 1, int(len(lats) * 0.95))], 3),
        "monster_runs": monster_runs[0],
        # phases have different wall lengths (FIFO probes wait longer),
        # so throughput comparisons must use the RATE, not the count
        "monster_per_min": round(60.0 * monster_runs[0] / phase_secs, 1),
        "phase_secs": phase_secs,
        "rows": rows,
        "hash": h,
    }


def run_scheduler_fairness(spark):
    """FairScheduler analog (reference: src/contrib/fairscheduler — the
    facebook fork's marquee scheduler, Corona's ancestor): small-job
    latency UNDER CONTENTION, FIFO vs FAIR pools.  The FIFO phase runs
    on the shared suite session; the FAIR phase needs
    spark.scheduler.mode at context creation, so the session is
    restarted (end of suite, nothing depends on the old one).  Pools
    are created on demand via the thread-local spark.scheduler.pool
    property — cross-pool scheduling is fair-share, so the interactive
    pool gets task slots while the bulk pool's monster runs.  Returns
    (report, new_session); the small job's output hash is checked in
    both phases (a scheduler that corrupts results is worse than a slow
    one)."""
    # BOTH phases run on a fresh session with the same warm-up — the
    # first harness compared a suite-warmed FIFO JVM against a cold
    # FAIR restart, understating the FAIR win (cold-JIT monster stages
    # run longer, and they sat on the FAIR side of the ledger)
    def fresh(extra: dict | None) -> object:
        s = get_spark("bench-sched", extra_conf=extra or {})
        REGISTRY[SMALL_JOB].fn(s, SF_DIR).count()
        _sched_monster_once(s)  # JIT-warm the monster path too
        return s

    spark.stop()
    spark = fresh(None)
    fifo = _contended_small_jobs(spark, None, None)
    spark.stop()
    # real pool config (an allocation file, the fair-scheduler.xml
    # analog): the interactive pool outweighs bulk 8:1 and holds a
    # minShare, so probes get slots as soon as running tasks finish
    alloc = os.path.join(tempfile.gettempdir(), "hadoop20_fair_pools.xml")
    with open(alloc, "w") as fh:
        fh.write(
            "<allocations>"
            "<pool name='interactive'><schedulingMode>FAIR</schedulingMode>"
            "<weight>8</weight><minShare>8</minShare></pool>"
            "<pool name='bulk'><schedulingMode>FIFO</schedulingMode>"
            "<weight>1</weight><minShare>0</minShare></pool>"
            "</allocations>"
        )
    spark = fresh(
        {
            "spark.scheduler.mode": "FAIR",
            "spark.scheduler.allocation.file": alloc,
        }
    )
    fair = _contended_small_jobs(spark, "interactive", "bulk")
    report = {
        "small_job": SMALL_JOB,
        "monster": f"md5-range-{SCHED_MONSTER_ROWS}",
        "reps": SCHED_SMALL_REPS,
        "fifo": {k: fifo[k] for k in ("p50", "p95", "monster_runs", "monster_per_min", "phase_secs")},
        "fair": {k: fair[k] for k in ("p50", "p95", "monster_runs", "monster_per_min", "phase_secs")},
        "p95_speedup_x": round(fifo["p95"] / fair["p95"], 2) if fair["p95"] else None,
        "hashes_match": fifo["hash"] == fair["hash"] and fifo["rows"] == fair["rows"],
    }
    return report, spark


def main() -> None:
    # The bench runs with the UI status store ON (still headless — only
    # the REST endpoint is consumed) so every entry records MEASURED
    # shuffle/spill/input bytes alongside wall-clock.  Overhead is a
    # listener-bus write per task, identical for every entry and every
    # round, so ratios stay comparable.
    os.environ.setdefault("SPARK_UI", "true")
    spark = get_spark("bench")
    # warm-up: JVM + parquet footer caches
    REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).count()

    # Triage knobs (noise bisection, NOT for recorded rounds): positional
    # args filter to named entries; SPARK_GRAFT_BENCH_REPS raises the
    # per-entry sample count (default 3 = 2 timed + 1 metrics-bracketed).
    only = set(sys.argv[1:])
    reps = max(3, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    per_query: dict[str, float] = {}
    detail: dict[str, dict] = {}
    ctx: dict = {}
    for name in BENCH_QUERIES:
        if only and name not in only:
            continue
        d: dict = {}
        if name == "b12_semantic_dedup":
            # train once, untimed-loop: the fixed-job-count k-means is
            # recorded as train_secs; the 3 timed passes are prune-only
            from hadoop_20_spark.catalog import load_table
            from hadoop_20_spark.operators import similarity as _sim

            t0 = time.time()
            emb = load_table(spark, "embeddings", SF_DIR)
            # corpus-scaled k (occupancy-constant cells): a k pinned at
            # 16 made the sf1 decade x23.6 super-linear (r11 sweep) —
            # the in-cell quadratic prune is linear-in-n only if the
            # cluster count grows with the corpus
            n12 = emb.count()
            k12 = _sim.auto_n_centroids(n12)
            # Lloyd passes on the ~25k md5-gated sample (inert below
            # 25k vectors): with corpus-scaled k the full-corpus loop
            # is the Theta(n^2) term the sf10 probe measured at 1630 s
            ctx["b12_cents"] = _sim.kmeans_centroids(
                emb, k=k12, iterations=3,
                train_sample_mod=_sim.kmeans_train_mod(n12),
            )
            # r13: kmeans_centroids trains eagerly (driver-hosted model)
            # and returns a local relation — count() is now a no-op
            # guard that the table is materialized, kept for shape
            ctx["b12_cents"].count()
            ctx["b12_k"] = k12
            d["train_secs"] = round(time.time() - t0, 3)
            d["n_centroids"] = k12
        if name == "b25_dfsio":
            from hadoop_20_spark.catalog import load_table
            from hadoop_20_spark.sources import teragen

            # 10x the events row count: ~100 MB of 100-byte records at
            # sf0.1, scaling with the fixture like TestDFSIO's -fileSize
            # — but CAPPED at 10M rows (~1 GB): TestDFSIO measures fixed
            # FILE sizes, not data-scaled ones, and the uncapped form at
            # sf1 checkpointed 100M generator rows into the block
            # manager and GC-thrashed the JVM to death in the big pass
            scaled = 10 * load_table(spark, "events", SF_DIR).count()
            ctx["b25_n"] = min(scaled, 10_000_000)
            # above ~sf1 the cap silently changes the entry from
            # fixture-scaled to fixed-size — record the effective n and
            # a capped flag so cross-scale throughput readers can tell
            # the regimes apart
            d["n_rows"] = ctx["b25_n"]
            d["capped"] = bool(scaled > ctx["b25_n"])
            # materialize the synthetic rows once, UNTIMED (localCheckpoint
            # is eager): the timed passes then measure parquet encode +
            # storage only, not the md5 row synthesis
            t0 = time.time()
            ctx["b25_df"] = teragen(spark, ctx["b25_n"]).localCheckpoint()
            d["gen_secs"] = round(time.time() - t0, 3)
        if name == "b19_pq_retrieval":
            from hadoop_20_spark.catalog import load_table
            from hadoop_20_spark.operators import similarity as _sim

            t0 = time.time()
            emb = load_table(spark, "embeddings", SF_DIR).select(
                "vec_id", "embedding"
            )
            books, sub = _sim.pq_codebooks(emb, m=4, k=16, iterations=2)
            for b in books:
                b.count()  # force the codebooks' localCheckpoints
            ctx["b19"] = (emb, books, sub)
            d["train_secs"] = round(time.time() - t0, 3)
        # exec metrics bracket the LAST timed run only (one clean run's
        # bytes, not a 3x sum)
        times = [run_once(spark, name, ctx) for _ in range(reps - 1)]
        mark = _max_stage_id(spark)
        times.append(run_once(spark, name, ctx))
        em = exec_metrics_since(spark, mark)
        if em:
            d["exec"] = em
        # Per-query persists (postings builds, cumsum inputs) must not
        # leak cache pressure into the next entry's timings.
        if name != "b12_semantic_dedup":  # b12's trained centroids live in ctx
            spark.catalog.clearCache()
        per_query[name] = round(statistics.median(times), 3)
        d["secs"] = per_query[name]
        d["secs_min"] = round(min(times), 3)
        if name == "b7_demux_write":
            # Fingerprint the WRITTEN output (read back the demux dir),
            # not the input — a broken write path (wrong partitioning or
            # dropped rows) must shift the hash.
            out = os.path.join(
                os.environ.get("SPARK_GRAFT_TMP", "/tmp"), "bench_demux"
            )
            d["rows"], d["hash"] = fingerprint(
                spark.read.parquet(out).select(
                    # stable column order: read-back appends the
                    # partition column at the end; sort by name
                    *sorted(spark.read.parquet(out).columns)
                )
            )
        elif name == "b25_dfsio":
            out = os.path.join(
                os.environ.get("SPARK_GRAFT_TMP", "/tmp"), "bench_dfsio"
            )
            d["rows"], d["hash"] = fingerprint(spark.read.parquet(out))
            disk_mb = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(out)
                for f in fs
                if not f.startswith("_")
            ) / (1024.0 * 1024.0)
            row_mb = ctx["b25_n"] * 100 / (1024.0 * 1024.0)
            d["write_secs"] = round(ctx["b25_write_secs"], 3)
            d["read_secs"] = round(ctx["b25_read_secs"], 3)
            d["disk_mb"] = round(disk_mb, 1)
            d["row_mb"] = round(row_mb, 1)
            # throughput over ROW bytes (the TestDFSIO convention —
            # parquet compresses the md5 payloads ~nothing here anyway)
            d["write_mb_s"] = round(row_mb / ctx["b25_write_secs"], 1)
            d["read_mb_s"] = round(row_mb / ctx["b25_read_secs"], 1)
            # BIG pass: ~100 MB measures parquet fixed costs on this box,
            # not I/O — one write+read at mult x the rows (~1 GB default,
            # TestDFSIO's -fileSize knob) so the entry tracks REAL
            # storage throughput; untimed for the suite total, MB/s
            # recorded alongside the small size's.
            from hadoop_20_spark.sources import teragen

            mult = int(os.environ.get("SPARK_GRAFT_DFSIO_MULT", "10"))
            if mult > 1:
                big_out = out + "_big"
                # same fixed-file-size cap as the base pass: ~4 GB max
                n_big = min(ctx["b25_n"] * mult, 40_000_000)
                d["big_n_rows"] = n_big
                d["big_capped"] = bool(ctx["b25_n"] * mult > n_big)
                big = teragen(spark, n_big).localCheckpoint()  # untimed gen
                tw = time.time()
                big.write.mode("overwrite").parquet(big_out)
                w_secs = time.time() - tw
                tr = time.time()
                spark.read.parquet(big_out).write.format("noop").mode(
                    "overwrite"
                ).save()
                r_secs = time.time() - tr
                big_mb = n_big * 100 / (1024.0 * 1024.0)
                d["big_row_mb"] = round(big_mb, 1)
                d["big_write_secs"] = round(w_secs, 3)
                d["big_read_secs"] = round(r_secs, 3)
                d["big_write_mb_s"] = round(big_mb / w_secs, 1)
                d["big_read_mb_s"] = round(big_mb / r_secs, 1)
                import shutil

                shutil.rmtree(big_out, ignore_errors=True)
            # release the checkpointed generator rows (up to ~1 GB in the
            # block manager) before the next entry
            ctx.pop("b25_df", None)
        else:
            d["rows"], d["hash"] = fingerprint(
                REGISTRY[BENCH_QUERIES[name]].fn(spark, SF_DIR)
            )
        if name == "b13_stream_join":
            # state-store observability: peak/final buffered rows and
            # peak state memory from the LAST (fingerprint) run — a
            # watermark regression that stops bounding join state moves
            # these long before it moves wall-clock.
            from hadoop_20_spark import streaming as _stream_ops

            for k, v in _stream_ops.LAST_QUERY_PROGRESS.items():
                d[f"state_{k}" if not k.startswith("state") else k] = v
        if name in DUCKDB_COMPARABLE:
            d.update(duckdb_compare(name))
            if "duckdb_rows" in d:
                d["rows_match"] = d["rows"] == d["duckdb_rows"]
            if d.get("duckdb_secs"):
                # cross-engine ratio: host noise moves Spark AND DuckDB
                # together, a plan regression moves only the numerator —
                # compare ratios round-over-round, not raw seconds
                d["ratio"] = round(d["secs"] / d["duckdb_secs"], 2)
        detail[name] = d

    if only:
        # triage mode: no g-suite (g1 checks against the full serial
        # hashes), no BENCH_detail.json overwrite — just the JSON line
        print(json.dumps({
            "metric": "bench_triage_sec",
            "value": round(sum(per_query.values()), 3),
            "unit": "sec",
            "reps": reps,
            "queries": per_query,
            "detail": detail,
        }))
        return

    # GridMix concurrent mix + MRBench small-job latency (reference's
    # canonical harness shape) — after the serial suite so the serial
    # hashes exist to check the concurrent outputs against.
    g1 = run_gridmix_concurrent(spark, detail)
    g2 = run_gridmix_small_jobs(spark)
    per_query["g1_concurrent_mix"] = g1["wall_secs"]
    per_query["g2_small_job_p50"] = g2["p50"]
    detail["g1_concurrent_mix"] = g1
    detail["g2_small_job_p50"] = g2
    # g3: small-job latency under contention, FIFO vs FAIR pools (the
    # fairscheduler/Corona question; restarts the session for FAIR mode)
    g3, spark = run_scheduler_fairness(spark)
    per_query["g3_fair_small_p95"] = g3["fair"]["p95"]
    detail["g3_scheduler_fairness"] = g3

    total = round(sum(per_query.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "bench_suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "detail": detail,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(result))
    # The driver records only the LAST 2000 chars of stdout — at 16+
    # entries that truncates the head entries out of BENCH_r{N}.json
    # (it dropped b1–b4 in round 5).  Persist the full result to a
    # tracked repo file so every round's complete numbers are readable
    # without a re-run.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_detail.json"),
            "w",
        ) as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: the stdout line still carries everything


if __name__ == "__main__":
    main()

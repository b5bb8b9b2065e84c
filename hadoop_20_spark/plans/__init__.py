"""Plan inspection + correctness validators.

Validators re-implement the reference's self-checking jobs (SURVEY §5):
``src/test/org/apache/hadoop/mapred/SortValidator.java`` (order +
count/checksum conservation through a shuffle) and
``ex/terasort/TeraValidate.java`` (global order across partition
boundaries) as DataFrame checks.

Plan helpers assert scale posture: filters pushed to the parquet scan,
broadcast joins where expected — the .explain-driven feedback loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> str:
    """Assert the formatted plan shows parquet PushedFilters containing
    each fragment.  Returns the plan for logging."""
    plan = physical_plan(df)
    assert "PushedFilters" in plan, plan
    for frag in fragments:
        assert frag in plan, f"missing {frag!r} in plan:\n{plan}"
    return plan


def assert_broadcast_join(df: DataFrame, n: int = 1) -> str:
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= n, plan
    return plan


def validate_global_order(df: DataFrame, *cols: str) -> bool:
    """TeraValidate, the scalable way (ex/terasort/TeraValidate.java):
    per-partition monotonicity checked in PARALLEL, plus the partition
    boundary keys (per-partition min/max) merged driver-side — never a
    global single-task window.

    spark_partition_id + monotonically_increasing_id capture the stored
    order of the sorted output; the lag window partitions by pid, so
    every check runs at full parallelism, all JVM-side.
    """
    from pyspark.sql import Window

    key = F.struct(*[F.col(c) for c in cols])
    base = df.select(
        key.alias("k"),
        F.spark_partition_id().alias("_pid"),
        F.monotonically_increasing_id().alias("_mid"),
    )
    w = Window.partitionBy("_pid").orderBy("_mid")
    checked = base.withColumn("prev", F.lag("k").over(w))
    agg = (
        checked.groupBy("_pid")
        .agg(
            F.sum(
                F.when(
                    F.col("prev").isNotNull() & (F.col("prev") > F.col("k")), 1
                ).otherwise(0)
            ).alias("violations"),
            F.min("k").alias("lo"),
            F.max("k").alias("hi"),
        )
        .orderBy("_pid")
        .collect()
    )
    if any(r.violations > 0 for r in agg):
        return False
    # boundary keys must be non-overlapping in partition order
    for prev, cur in zip(agg, agg[1:]):
        if prev.hi > cur.lo:
            return False
    return True


def conservation_stats(df: DataFrame, numeric_col: str) -> tuple[int, float]:
    """SortValidator.RecordStatsChecker: (row count, decimal checksum) —
    invariant under any reordering/repartition/shuffle of the data."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(numeric_col).cast("decimal(38,6)")).alias("s"),
    ).collect()[0]
    return row["n"], float(row["s"] or 0)


def validate_conservation(before: DataFrame, after: DataFrame, numeric_col: str) -> bool:
    """Counts and checksums survive the transformation (sort/repartition/
    write-read roundtrips must conserve both)."""
    return conservation_stats(before, numeric_col) == conservation_stats(
        after, numeric_col
    )


def executed_scan_metrics(df: DataFrame) -> list[dict]:
    """EXECUTE ``df`` and return the runtime SQL metrics of every file
    scan leaf — the filesystem truth behind a pruning claim: with
    parquet predicate pushdown, the scan's ``numOutputRows`` is the
    rows DECODED from surviving row groups (record-level filtering is
    off by default), so a clustered layout must show a smaller number
    than a poorly-clustered one for the same query answer.

    Reference analog: the per-task HDFS_BYTES_READ counter
    (``mapred/Counters.java``) every hadoop-20 job report printed —
    the number an engineer actually checked to see whether an
    IndexedMapFile lookup avoided a full scan."""
    df.collect()
    out: list[dict] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        # AQE wraps materialized stages in QueryStageExec leaves; the
        # real operators (and their runtime metrics) live in .plan()
        if "AdaptiveSparkPlan" in name:
            walk(node.executedPlan())
            return
        if "QueryStageExec" in name:
            walk(node.plan())
            return
        if "Scan" in name and node.children().isEmpty():
            metrics = {}
            mit = node.metrics().iterator()
            while mit.hasNext():
                kv = mit.next()
                metrics[kv._1()] = kv._2().value()
            out.append({"node": name, **metrics})
            return
        cit = node.children().iterator()
        while cit.hasNext():
            walk(cit.next())

    walk(df._jdf.queryExecution().executedPlan())
    return out


def diagnose(df: DataFrame) -> list[dict]:
    """Rule-based physical-plan postmortem — the contrib/vaidya analog
    (hadoop-20 shipped a rule engine that read a finished job's
    counters/config and emitted findings like "too many spills" or
    "reduces started too early"; here the rules read the physical plan
    and emit the 100 TB smells this repo's SCALE.md bans).  Returns
    findings ``{rule, severity, detail}``; severity ``high`` = the plan
    would not survive a 100x scale-up, ``info`` = verify by hand.

    Rules:
    - ``cartesian_product`` (high): CartesianProductExec — both sides
      unbroadcast; quadratic work with no bound.  (BroadcastNestedLoop
      with a broadcast build is NOT flagged: the blessed 1-row scalar
      attach.)
    - ``single_partition_window_or_sort`` (high): an Exchange
      SinglePartition feeding a Window/Sort — the whole relation
      through one task (final 1-row aggregates are fine and excluded).
    - ``unpartitioned_window`` (high): a WindowExec with an empty
      partition spec (same smell, caught even when AQE elides the
      visible exchange).
    - ``python_row_udf`` (high): BatchEvalPython — row-at-a-time SCALAR
      Python in the plan; the Arrow path (ArrowEvalPython) is not
      flagged, and Python UDTFs (row-based by API design) downgrade to
      ``python_udtf`` (info).
    - ``scan_filter_not_pushed`` (info): a parquet scan carrying
      DataFilters with empty PushedFilters — the filter runs post-scan.
    """
    findings: list[dict] = []

    def walk(node, parent_name: str = "") -> None:
        name = node.getClass().getSimpleName()
        if "AdaptiveSparkPlan" in name:
            walk(node.initialPlan(), parent_name)
            return
        if "QueryStageExec" in name:
            walk(node.plan(), parent_name)
            return
        if "InMemoryTableScan" in name:
            rel = node.relation().cachedPlan()
            walk(rel, name)
            return
        if name.startswith("CartesianProduct"):
            findings.append(
                {
                    "rule": "cartesian_product",
                    "severity": "high",
                    "detail": node.simpleStringWithNodeId()
                    if hasattr(node, "simpleStringWithNodeId")
                    else name,
                }
            )
        if name.startswith("WindowExec") or name.startswith("WindowGroupLimit"):
            try:
                if node.partitionSpec().isEmpty():
                    findings.append(
                        {
                            "rule": "unpartitioned_window",
                            "severity": "high",
                            "detail": f"{name} with empty partition spec",
                        }
                    )
            except Exception:
                pass
        if name.startswith("ShuffleExchange"):
            part = node.outputPartitioning().toString()
            # parent must be a real Sort/Window, NOT SortAggregateExec
            # (the blessed 1-row final-aggregate pattern)
            if "SinglePartition" in part and (
                parent_name.startswith("Window")
                or parent_name == "SortExec"
            ):
                findings.append(
                    {
                        "rule": "single_partition_window_or_sort",
                        "severity": "high",
                        "detail": f"SinglePartition exchange under {parent_name}",
                    }
                )
        if name.startswith("BatchEvalPython"):
            # UDTFs are row-based by API design (arrow UDTF is opt-in);
            # a row-at-a-time SCALAR udf in a plan is the real smell
            is_udtf = "UDTF" in name
            findings.append(
                {
                    "rule": "python_udtf" if is_udtf else "python_row_udf",
                    "severity": "info" if is_udtf else "high",
                    "detail": f"row-at-a-time Python ({name})",
                }
            )
        if name.startswith("FileSourceScan"):
            s = node.toString().splitlines()[0]
            if "DataFilters: [" in s:
                import re as _re

                dm = _re.search(r"DataFilters: \[([^\]]*)\]", s)
                pm = _re.search(r"PushedFilters: \[([^\]]*)\]", s)
                if dm and dm.group(1).strip() and pm is not None and not pm.group(1).strip():
                    findings.append(
                        {
                            "rule": "scan_filter_not_pushed",
                            "severity": "info",
                            "detail": s[:160],
                        }
                    )
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next(), name)

    walk(df._jdf.queryExecution().executedPlan())
    return findings


def executed_shuffle_skew(
    df: DataFrame, *, ratio_threshold: float = 4.0, min_bytes: int = 1 << 20
) -> list[dict]:
    """EXECUTE ``df`` and report real per-partition shuffle skew from
    AQE's map-output statistics (``bytesByPartitionId``) — the vaidya
    "balanced reduce partitioning" rule on runtime truth instead of
    plan guesses: a reduce partition whose bytes exceed
    ``ratio_threshold`` x the median (and ``min_bytes`` absolutely) is
    the straggler AQE's skew-join split or an explicit salt must
    handle.  One finding per skewed shuffle stage with max/median/total
    bytes and the partition id.

    Reference analog: the reduce-side counter spread every hadoop-20
    postmortem started from (why is reducer 17 still running?) —
    contrib/vaidya shipped exactly this as a rule over job counters."""
    df.collect()
    out: list[dict] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if "AdaptiveSparkPlan" in name:
            walk(node.executedPlan())
            return
        if name.startswith("ShuffleQueryStage"):
            try:
                ms = node.mapStats()
                if ms.isDefined():
                    arr = sorted(ms.get().bytesByPartitionId())
                    if arr:
                        mx = arr[-1]
                        med = arr[len(arr) // 2]
                        if mx >= min_bytes and mx > ratio_threshold * max(med, 1):
                            out.append(
                                {
                                    "rule": "shuffle_partition_skew",
                                    "severity": "high",
                                    "max_bytes": int(mx),
                                    "median_bytes": int(med),
                                    "total_bytes": int(sum(arr)),
                                    "n_partitions": len(arr),
                                    "detail": (
                                        f"max partition {mx}B vs median "
                                        f"{med}B over {len(arr)} partitions"
                                    ),
                                }
                            )
            except Exception:
                pass
            walk(node.plan())
            return
        if "QueryStageExec" in name:
            walk(node.plan())
            return
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return out

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
    """TeraValidate: the dataset is globally ordered on ``cols`` —
    checked distributedly: per-partition monotonicity + partition
    boundary keys non-overlapping.  Implemented via a single lag window
    over the output order (test-scale) — at production scale switch to
    mapPartitions boundary sampling (same invariant, no global window).
    """
    from pyspark.sql import Window

    w = Window.orderBy(*[F.col(c) for c in cols])
    key = F.struct(*[F.col(c) for c in cols])
    violations = (
        df.select(*cols, key.alias("k"))
        .withColumn("prev", F.lag("k").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("prev") > F.col("k")))
        .count()
    )
    return violations == 0


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

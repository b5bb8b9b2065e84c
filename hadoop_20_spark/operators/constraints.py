"""Declarative data-quality constraint suite — the Deequ-style verifier.

A constraint list compiles into ONE wide aggregate per table (every
completeness / distinctness / domain / bound metric is a conditional
aggregate expression), then unpivots into a long (check, metric, passed)
report.  That single-scan shape is the point at 100 TB: a quality gate
that re-scans the fact table once per constraint (the naive
`integrity_checks` shape, one aggregate per check) pays N scans for an
N-check suite; this pays one.

Reference anchors (public hadoop-20): the post-job validation idiom —
``src/test/org/apache/hadoop/mapred/SortValidator.java`` (RecordStats
checker: one pass computing bytes/records/checksum, compared against
bounds) and the per-job counter report (``Counters.java``) that every
MapReduce job printed as its quality readout.  The DSL form follows the
open-source Deequ/"unit tests for data" lineage.

Determinism (SURVEY §7.4): ratio metrics are exact integer
numerator/denominator pairs — pass/fail compares ``num * 1_000_000 >=
threshold_ppm * den`` in integers, never a floored double ratio; the
reported metric is the one double division, rounded in-query.  Mean
bounds ride the exact-DECIMAL-sum bridge and compare the identical
cast-to-double on both engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declarative constraint.

    kinds (ratio checks pass iff ratio_ppm >= threshold_ppm):
      completeness    — non-null fraction of ``column``
      distinctness    — count(distinct column) / count(*)
      key_uniqueness  — count(distinct column) / count(column): 1.0 iff
                        the non-null values form a key
      isin            — fraction of non-null values in ``allowed``
      matches         — fraction of non-null values rlike ``pattern``
      min_at_least    — min(column) >= bound        (metric = min)
      max_at_most     — max(column) <= bound        (metric = max)
      mean_between    — bound <= mean(column) <= bound_hi, mean via the
                        exact DECIMAL(38,6) sum     (metric = mean)
      size_at_least   — count(*) >= bound           (metric = count)
    """

    name: str
    kind: str
    column: str | None = None
    threshold_ppm: int = 1_000_000
    bound: float | None = None
    bound_hi: float | None = None
    pattern: str | None = None
    allowed: tuple = ()


_REPORT_COLS = ("table_name", "check_name", "kind", "col_name", "metric", "passed")


def _agg_exprs(i: int, c: Check) -> list[Column]:
    col = F.col(c.column) if c.column else None
    n, d = f"_n{i}", f"_d{i}"
    if c.kind == "completeness":
        return [F.count(col).alias(n), F.count(F.lit(1)).alias(d)]
    if c.kind == "distinctness":
        return [F.countDistinct(col).alias(n), F.count(F.lit(1)).alias(d)]
    if c.kind == "key_uniqueness":
        return [F.countDistinct(col).alias(n), F.count(col).alias(d)]
    if c.kind == "isin":
        return [
            F.sum(F.when(col.isin(*c.allowed), 1).otherwise(0)).alias(n),
            F.count(col).alias(d),
        ]
    if c.kind == "matches":
        return [
            F.sum(F.when(col.rlike(c.pattern), 1).otherwise(0)).alias(n),
            F.count(col).alias(d),
        ]
    if c.kind == "min_at_least":
        return [F.min(col).alias(n)]
    if c.kind == "max_at_most":
        return [F.max(col).alias(n)]
    if c.kind == "mean_between":
        return [
            F.sum(col.cast("decimal(38,6)")).alias(n),
            F.count(col).alias(d),
        ]
    if c.kind == "size_at_least":
        return [F.count(F.lit(1)).alias(n)]
    raise ValueError(f"unknown check kind {c.kind!r}")


def _report_struct(table: str, i: int, c: Check) -> Column:
    n = F.col(f"_n{i}")
    has_den = c.kind not in ("min_at_least", "max_at_most", "size_at_least")
    d = F.col(f"_d{i}") if has_den else F.lit(None)
    if c.kind in ("completeness", "distinctness", "key_uniqueness", "isin", "matches"):
        metric = F.round(n * F.lit(1.0) / d, 6)
        passed = (n * F.lit(1_000_000) >= F.lit(c.threshold_ppm) * d).cast("int")
    elif c.kind == "min_at_least":
        metric = F.round(n.cast("double"), 6)
        passed = (n >= F.lit(c.bound)).cast("int")
    elif c.kind == "max_at_most":
        metric = F.round(n.cast("double"), 6)
        passed = (n <= F.lit(c.bound)).cast("int")
    elif c.kind == "mean_between":
        metric = F.round(n.cast("double") / d, 6)
        passed = ((metric >= F.lit(c.bound)) & (metric <= F.lit(c.bound_hi))).cast(
            "int"
        )
    elif c.kind == "size_at_least":
        metric = n.cast("double")
        passed = (n >= F.lit(int(c.bound))).cast("int")
    return F.struct(
        F.lit(table).alias("table_name"),
        F.lit(c.name).alias("check_name"),
        F.lit(c.kind).alias("kind"),
        F.lit(c.column or "").alias("col_name"),
        metric.alias("metric"),
        passed.alias("passed"),
    )


def verify(df: DataFrame, checks: list[Check], table: str) -> DataFrame:
    """Evaluate every check against ``df`` in ONE aggregate pass.

    All numerators/denominators land in a single 1-row wide aggregate
    (mixed count-distinct aggregates plan through Spark's Expand — still
    one file scan), then per-check structs explode into the long report:
    (table_name, check_name, kind, col_name, metric, passed)."""
    aggs: list[Column] = []
    for i, c in enumerate(checks):
        aggs.extend(_agg_exprs(i, c))
    row = df.agg(*aggs)
    structs = F.array(*[_report_struct(table, i, c) for i, c in enumerate(checks)])
    return row.select(F.explode(structs).alias("r")).select("r.*")


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str,
    table: str,
) -> DataFrame:
    """Foreign-key constraint as a report fragment: metric = orphan
    count via a (broadcast-gated) anti-join, passed iff zero.  Kept
    outside verify() because it is inherently two-table — the join is
    the one pass you cannot fold into the wide aggregate."""
    from hadoop_20_spark.operators import joins

    orphans = child.join(
        joins.broadcast_if_small(parent.select(parent_key).distinct()),
        child[child_key] == F.col(parent_key),
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("_v")).select(
        F.lit(table).alias("table_name"),
        F.lit(name).alias("check_name"),
        F.lit("referential").alias("kind"),
        F.lit(child_key).alias("col_name"),
        F.col("_v").cast("double").alias("metric"),
        (F.col("_v") == 0).cast("int").alias("passed"),
    )

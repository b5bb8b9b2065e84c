"""Aggregation (SURVEY §2.5) — the reference's aggregate framework as a
descriptor DSL over Spark aggregates.

Reference: ``mapred/lib/aggregate/`` — users pass descriptor strings
``"<AggType>:<id>"`` (ValueAggregatorBaseDescriptor.java turns them into
aggregator instances); ValueAggregatorMapper/Combiner/Reducer run them
with map-side partial aggregation (the Combiner).  Spark's
HashAggregateExec does partial/final automatically, so each descriptor
maps to a Column expression and the whole job becomes one ``groupBy.agg``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_sum_double(col: str | Column, scale: int = 6) -> Column:
    """Order-independent double sum: aggregate in DECIMAL(28, scale), cast
    back to double.  Floating-point addition is not associative, so a
    plain double sum differs run-to-run with partitioning (and engine-to-
    engine vs the DuckDB oracle); decimal aggregation is exact and
    deterministic at any parallelism — the property the reference got for
    free from single-threaded reducers and we must engineer at scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


def exact_avg_double(col: str | Column, scale: int = 6) -> Column:
    """Deterministic average: exact decimal sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(28,{scale})")).cast("double") / F.count(c)
    )


# --- descriptor DSL ---------------------------------------------------------

def _descriptor_to_column(desc: str) -> Column:
    """``"LongValueSum:qty"`` → ``F.sum(qty).cast(long)`` etc.

    One entry per aggregator class under mapred/lib/aggregate/ (see
    SURVEY §2.5 table).  UniqValueCount honors the reference's cap
    parameter (aggregate.max.num.unique.values) in spirit via
    ``approx_count_distinct`` when passed ``~`` (approx marker).
    """
    kind, _, field = desc.partition(":")
    approx = field.startswith("~")
    if approx:
        field = field[1:]
    alias = f"{kind}_{field}".lower()
    c = F.col(field)
    if kind == "LongValueSum":  # mapred/lib/aggregate/LongValueSum.java
        return F.sum(c.cast("long")).alias(alias)
    if kind == "DoubleValueSum":  # DoubleValueSum.java
        return exact_sum_double(c).alias(alias)
    if kind == "LongValueMax":  # LongValueMax.java
        return F.max(c.cast("long")).alias(alias)
    if kind == "LongValueMin":  # LongValueMin.java
        return F.min(c.cast("long")).alias(alias)
    if kind == "DoubleValueMax":
        return F.max(c.cast("double")).alias(alias)
    if kind == "DoubleValueMin":
        return F.min(c.cast("double")).alias(alias)
    if kind == "StringValueMax":  # StringValueMax.java (lexicographic)
        return F.max(c.cast("string")).alias(alias)
    if kind == "StringValueMin":  # StringValueMin.java
        return F.min(c.cast("string")).alias(alias)
    if kind == "UniqValueCount":  # UniqValueCount.java
        if approx:
            return F.approx_count_distinct(c).alias(alias)
        return F.countDistinct(c).alias(alias)
    if kind == "Count":
        return F.count(c).alias(alias)
    raise ValueError(f"unknown aggregator descriptor {desc!r}")


def aggregate(
    df: DataFrame, group_by: Sequence[str], descriptors: Sequence[str]
) -> DataFrame:
    """Run an aggregate-framework job: ``aggregate(df, ['k'],
    ['LongValueSum:qty', 'UniqValueCount:user'])``.

    Equivalent of ValueAggregatorJob.java with the given descriptor list;
    the Combiner stage is Spark's automatic partial aggregation.
    """
    exprs = [_descriptor_to_column(d) for d in descriptors]
    return df.groupBy(*group_by).agg(*exprs)


def value_histogram(df: DataFrame, key: str, value: str) -> DataFrame:
    """mapred/lib/aggregate/ValueHistogram.java — per key, build the
    value→frequency histogram and report statistics OF THE FREQUENCIES:
    distinct-value count, min/median/max/avg/stddev of per-value counts.

    Two-level aggregation: groupBy(key, value).count() then groupBy(key).
    Both levels get map-side partials; no single reducer bottleneck (the
    reference buffered the whole histogram in one reducer's memory —
    at 100 TB this two-phase shape is the scalable rewrite).

    Output deviates from the reference's textual tab-joined format by
    design (documented): one column per statistic.
    """
    freq = df.groupBy(F.col(key), F.col(value)).agg(F.count(F.lit(1)).alias("freq"))
    # Statistics are computed from EXACT integer moments (sum, sum of
    # squares) — not stddev_pop/percentile_approx, whose merge order
    # (Welford combine / sketch merge) varies with partitioning and
    # breaks the any-parallelism determinism contract
    # (tests/test_determinism.py caught both).
    n = F.count(F.lit(1))
    s1 = F.sum("freq")
    s2 = F.sum(F.col("freq") * F.col("freq"))
    return freq.groupBy(key).agg(
        n.alias("n_distinct_values"),
        F.min("freq").alias("min_freq"),
        F.round(F.median("freq"), 6).alias("median_freq"),
        F.max("freq").alias("max_freq"),
        F.round(s1.cast("double") / n, 6).alias("avg_freq"),
        F.round(
            F.sqrt((s2.cast("double") - s1.cast("double") * s1 / n) / n), 6
        ).alias("stddev_freq"),
    )


def two_phase_agg(
    df: DataFrame,
    group_by: Sequence[str],
    sum_cols: Sequence[str],
    salt: int = 64,
) -> DataFrame:
    """Skew-proof aggregation for pathological single-key hotspots: salt
    the key, partial-aggregate per (key, salt), then final-aggregate per
    key.  Spark already does map-side partial aggregation (the Combiner),
    which handles most skew; the explicit two-phase form bounds the FINAL
    stage's per-task input too — one row per (key, salt) — for keys so
    hot their combined partials still swamp one reducer.  Decimal sums
    keep the result bit-identical to the direct aggregation."""
    # salt from the row id: partition-dependent is fine — decimal partials
    # make the final result identical regardless of how rows scatter
    salted = df.withColumn("_salt", F.monotonically_increasing_id() % salt)
    partial = salted.groupBy(*group_by, F.col("_salt").alias("_s")).agg(
        *[F.sum(F.col(c).cast("decimal(28,6)")).alias(f"_p_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias("_p_n"),
    )
    return partial.groupBy(*group_by).agg(
        *[F.sum(f"_p_{c}").cast("double").alias(f"sum_{c}") for c in sum_cols],
        F.sum("_p_n").alias("n_rows"),
    )


def with_counters(df: DataFrame, **counters: Column):
    """mapred/Counters.java / Reporter.java#incrCounter — global named
    side-channel aggregates.  Spark-native: ``df.observe`` attaches metric
    expressions evaluated during the action, collected on the driver —
    exactly the JobTracker counter-aggregation role, without a second job.

    Returns (observed_df, observation) — read ``observation.get`` after an
    action.
    """
    from pyspark.sql import Observation

    obs = Observation()
    return df.observe(obs, *[v.alias(k) for k, v in counters.items()]), obs


def misra_gries_partials(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries frequent-items summaries (Misra & Gries
    1982; mergeability per Agarwal et al., "Mergeable Summaries", PODS
    2012 — public algorithms).  Returns (item, mg_count) with at most k
    rows PER PARTITION; summing mg_count per item across partitions
    yields the merged summary with the classic deterministic guarantee:

        exact_count - n/(k+1)  <=  merged_count  <=  exact_count

    for EVERY item (absent = 0), under ANY partitioning of the input.
    Hence any item with exact_count > n/(k+1) is guaranteed present —
    the one-sided UNDERcount complement to the count-min sketch's
    one-sided overcount.

    Scale story: the raw column is never shuffled — each input partition
    is collapsed map-side to <= k (item, count) rows, so the merge
    shuffle is O(partitions * k) regardless of cardinality or corpus
    size (the Combiner discipline taken to its extreme: a SUBLINEAR
    combiner).  Per partition the pass is Arrow-batched value_counts
    (C-speed) folded into one counter, then ONE trim: subtract the
    (k+1)-th largest count from all and drop non-positives — at most k
    items survive, and the decrement is <= n_p/(k+1) because k+1 items
    carried at least that count.  Python here is justified: MG's
    data-dependent trim is not expressible in relational builtins
    without shuffling the raw column, which is exactly what the sketch
    exists to avoid.

    Reference anchor: the combiner contract of
    ``mapred/lib/aggregate/ValueAggregatorCombiner.java`` — partial
    per-map summaries merged reducer-side — upgraded to a bounded-size
    summary with a proven error envelope.
    """
    import pandas as pd  # local import: operator stays importable without pandas

    if k < 1:
        raise ValueError(f"misra_gries_partials: k must be >= 1, got {k}")
    out_schema = "item string, mg_count long"

    def summarize(batches):
        from collections import Counter

        counts: Counter = Counter()
        for pdf in batches:
            # dropna=False: pandas value_counts silently EXCLUDES nulls by
            # default, which would make the summary's n differ from the
            # caller's row count — NULL keys are rejected loudly instead
            vc = pdf[col].value_counts(dropna=False)
            for item, c in vc.items():
                if item is None or (isinstance(item, float) and item != item):
                    raise ValueError(
                        "misra_gries_partials: NULL key encountered — "
                        "filter or coalesce NULL keys upstream so the "
                        "guarantee denominator n is well-defined"
                    )
                counts[item] += int(c)
        if not counts:
            return
        if len(counts) > k:
            # one-shot MG trim: t = (k+1)-th largest count
            t = sorted(counts.values(), reverse=True)[k]
            counts = Counter(
                {i: c - t for i, c in counts.items() if c - t > 0}
            )
        if counts:
            yield pd.DataFrame(
                {"item": list(counts.keys()), "mg_count": list(counts.values())}
            )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, out_schema
    )

"""Row transforms — the reference's library mappers (SURVEY §2.3).

In the reference every projection/filter is arbitrary Java inside
``mapred/Mapper.java#map`` (a flatMap: 0..n outputs per record).  The
canned mappers under ``mapred/lib/`` are re-expressed here as DataFrame
transformations, which keeps them inside whole-stage codegen instead of a
per-record virtual call.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def identity(df: DataFrame) -> DataFrame:
    """mapred/lib/IdentityMapper.java — pass-through."""
    return df


def inverse(df: DataFrame, key: str, value: str) -> DataFrame:
    """mapred/lib/InverseMapper.java — emit (v, k)."""
    return df.select(F.col(value), F.col(key))


def regex_matches(df: DataFrame, column: str, pattern: str) -> DataFrame:
    """mapred/lib/RegexMapper.java — for each regex match in ``column``
    emit one row ``(match)``; pair with a count agg for the Grep job.

    ``regexp_extract_all`` + ``explode`` stays JVM-side (codegen), unlike
    the reference's per-record ``java.util.regex`` loop.
    """
    return df.select(
        F.explode(F.regexp_extract_all(F.col(column), F.lit(pattern), 0)).alias("match")
    )


def grep(df: DataFrame, column: str, pattern: str) -> DataFrame:
    """src/examples/org/apache/hadoop/examples/Grep.java — two chained MR
    jobs (regex-match-count, then sort desc by count) collapsed into one
    declarative plan: match → groupBy(match) → count → orderBy desc.

    Scale: the regex runs map-side; the groupBy gets map-side partial
    aggregation automatically (the reference needed an explicit
    LongSumReducer combiner, mapred/lib/LongSumReducer.java).
    """
    return (
        regex_matches(df, column, pattern)
        .groupBy("match")
        .agg(F.count(F.lit(1)).alias("match_count"))
        .orderBy(F.col("match_count").desc(), F.col("match"))
    )


def token_counts(df: DataFrame, column: str) -> DataFrame:
    """mapred/lib/TokenCountMapper.java + ex/WordCount.java — tokenize on
    whitespace, count per token (the canonical hash-agg query)."""
    return (
        df.select(F.explode(F.split(F.col(column), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("token_count"))
    )


def parse_field_spec(spec: str) -> list[tuple[int, int | None]]:
    """Parse a cut(1)-style field list: ``"0-2,4,6-"`` →
    [(0,2),(4,4),(6,None)]; None = open-ended.

    Grammar per mapred/lib/FieldSelectionMapReduce.java (ranges are
    inclusive of start, exclusive semantics there are pos..pos; ``i-``
    means "i through last field").
    """
    out: list[tuple[int, int | None]] = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            lo, _, hi = part.partition("-")
            out.append((int(lo) if lo else 0, int(hi) if hi else None))
        else:
            out.append((int(part), int(part)))
    return out


def field_selection(
    df: DataFrame,
    column: str,
    key_spec: str,
    value_spec: str = "",
    separator: str = "\t",
) -> DataFrame:
    """mapred/lib/FieldSelectionMapReduce.java — split each line on
    ``separator``, select key fields per ``key_spec`` and value fields per
    ``value_spec``, re-join with ``separator``.  Output columns:
    ``key string, value string`` (the reference's (Text,Text) contract).

    Implemented with ``split`` + ``slice``/``element_at`` — all codegen'd;
    open-ended ranges use ``slice(arr, pos, size(arr))``.
    """
    # F.split takes a REGEX; the reference's separator is a literal string
    # (st/StreamKeyValUtil.java splits on raw bytes), so escape it —
    # otherwise e.g. "|" (regex alternation) splits between every char.
    import re

    fields = F.split(F.col(column), re.escape(separator))

    def pick(spec: str) -> Column:
        parts: list[Column] = []
        for lo, hi in parse_field_spec(spec):
            if hi is None:
                parts.append(F.slice(fields, lo + 1, F.size(fields)))
            else:
                parts.append(F.slice(fields, lo + 1, hi - lo + 1))
        if not parts:
            return F.lit("")
        arr = parts[0]
        for p in parts[1:]:
            arr = F.concat(arr, p)
        return F.array_join(arr, separator)

    return df.select(pick(key_spec).alias("key"), pick(value_spec).alias("value"))


def chain(df: DataFrame, *stages) -> DataFrame:
    """mapred/lib/ChainMapper.java / ChainReducer.java — compose [M+ R M*]
    in one task with no extra shuffle.  In Spark, composing narrow
    DataFrame transforms is fused by whole-stage codegen automatically;
    this helper just applies them in order."""
    for stage in stages:
        df = stage(df)
    return df

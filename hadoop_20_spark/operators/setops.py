"""Set operations (SURVEY §2.8).

Reference realizations: union = many input paths into one job
(``mapred/FileInputFormat.java#addInputPath``, heterogeneous schemas via
``mapred/lib/MultipleInputs.java``); intersect/except = reduce-side
tag-and-filter idioms over contrib/data_join's TaggedMapOutput; dedup =
the distinct idiom (key=record, emit once per group).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame, by_name: bool = True, allow_missing: bool = False) -> DataFrame:
    """MultipleInputs: N sources into one stream.  ``by_name`` uses
    unionByName (schema-aligned; ``allow_missing`` fills absent columns
    with null — the DelegatingMapper per-source-schema case)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=allow_missing) if by_name else out.union(d)
    return out


def intersect(left: DataFrame, right: DataFrame, distinct: bool = True) -> DataFrame:
    """Keys present in both (tagged-join keep-both idiom)."""
    return left.intersect(right) if distinct else left.intersectAll(right)


def except_(left: DataFrame, right: DataFrame, distinct: bool = True) -> DataFrame:
    """Rows only in left (tagged-join only-left idiom)."""
    return left.exceptAll(right) if not distinct else left.subtract(right)


def distinct_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """The distinct idiom (SURVEY §2.5): whole-row or subset dedup.
    Spark plans it as a hash aggregate with map-side partials — the
    combiner-backed version of the reference's identity-reduce."""
    return df.dropDuplicates(list(subset)) if subset else df.distinct()

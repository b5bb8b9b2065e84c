"""Query registry — the driver-facing inventory (SURVEY §2 coverage).

Each entry pairs a Spark implementation (built from the operator library)
with the equivalent DuckDB oracle SQL.  Column names are aliased
identically on both sides (the driver's compare sorts columns by name and
hashes values).  Determinism rules (SURVEY §7.4):

- double SUMs aggregate in DECIMAL and cast back (order-independent);
- top-k / ranked queries always carry an id tie-breaker;
- all hashing is md5-based (engine-portable), never murmur3/xxhash;
- floats that are *outputs of float arithmetic* are rounded in-query.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_spark.catalog import load_table
from hadoop_20_spark.operators import (
    aggregate as agg_ops,
    dedup,
    joins,
    rowops,
    setops,
    similarity,
    sort as sort_ops,
    text as text_ops,
)
from hadoop_20_spark.functions import tokens as _fn_tokens
from hadoop_20_spark.operators.aggregate import exact_avg_double, exact_sum_double


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check
    note: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, note: str = ""):
    def deco(fn):
        # A duplicate register() SILENTLY SHADOWED an earlier query once
        # (round 5: a new cohort_retention replaced round 2's, shrinking
        # the registry by one with no error).  Deliberate re-definitions
        # use direct ``REGISTRY[name] = Query(...)`` assignment, so a
        # second register() under the same name is always a mistake.
        if name in REGISTRY:
            raise ValueError(
                f"duplicate registry name {name!r} — pick a new name, or "
                "assign REGISTRY[name] directly for a deliberate override"
            )
        REGISTRY[name] = Query(fn=fn, oracle=oracle, note=note)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# SQL fragment: engine-portable 60-bit md5 hash (functions.md5_long analog)
def _sql_md5_long(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


_TOKENS = r"list_filter(regexp_split_to_array({col}, '\s+'), t -> t <> '')"


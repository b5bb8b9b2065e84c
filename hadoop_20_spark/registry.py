"""Back-compat shim — the registry lives in ``hadoop_20_spark/queries/``
(split per-domain in round 4: relational, tpch, text_dedup, similarity,
streaming_udx + _base infra).  The import surface is unchanged: REGISTRY,
Query, register, queries(), oracle_sql() and the flagship entry point.
"""

from __future__ import annotations

from hadoop_20_spark.queries import (  # noqa: F401
    REGISTRY,
    Query,
    _driver_seen,
    oracle_sql,
    queries,
    register,
)
from hadoop_20_spark.queries.tpch import q1_pricing_summary  # noqa: F401

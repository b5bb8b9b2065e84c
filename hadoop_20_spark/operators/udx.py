"""UDF/UDAF/UDTF surface (SURVEY §2.11).

The reference's extension points, Spark-first:

- ``Mapper.map`` (0..n outputs)      → expressions / explode / mapInPandas
- ``Reducer.reduce(K, Iterator<V>)`` → :func:`grouped_reduce` —
  applyInPandas over groups delivered SORTED by the secondary key, which
  is exactly the reduce() iterator contract produced by the grouping
  comparator (mapred/ReduceTask.java#ValuesIterator).
- Combiner                            → automatic partial aggregation.
- streaming scripts                   → operators.pipe
- C++ pipes                           → Arrow pandas_udf (superseded).

``grouped_reduce`` is the escape hatch for aggregation logic that real
SQL aggregates cannot express (order-dependent state machines); use
built-ins first — this path serializes groups through Arrow.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame


def grouped_reduce(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema: str,
) -> DataFrame:
    """Run ``fn`` once per key group, with the group's rows sorted by
    ``order_by`` — the secondary-sort + reduce() contract.

    The sort happens inside the pandas batch (cheap: groups are small
    relative to partitions); the shuffle is the groupBy's hash partition,
    same as the reference's partitioner.  At 100 TB the constraint is the
    largest single group must fit in one task's memory — identical to the
    reference's reducer-memory constraint for buffered values."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return fn(pdf.sort_values(list(order_by), kind="mergesort"))

    return df.groupBy(*keys).applyInPandas(run, out_schema)


def longest_gap_per_user(events: DataFrame) -> DataFrame:
    """Demo reducer: per user, the longest gap (seconds) between
    consecutive events and the event count — order-dependent state that
    the reference would hand-roll in a reducer over a secondary-sorted
    stream."""

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf["ts"]
        gaps = ts.diff().dt.total_seconds().dropna()
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "max_gap_s": [round(float(gaps.max()), 6) if len(gaps) else 0.0],
            }
        )

    return grouped_reduce(
        events.select("user_id", "ts", "event_id"),
        ["user_id"],
        ["ts", "event_id"],
        reduce_group,
        "user_id long, n_events long, max_gap_s double",
    )


def term_counts_udtf():
    """Python UDTF (Spark 3.5+/4.x) — the modern form of the reference's
    Mapper-as-UDTF contract (mapred/Mapper.java#map emits 0..n records
    per input).  Returns the decorated class, ready for
    ``spark.udtf.register``.

    This is deliberately the *slow path* (row-at-a-time Python) kept for
    API-surface parity; the production-equivalent plan is
    ``explode(tokens) → groupBy → count`` (see the matching oracle),
    which stays JVM-side.  Use a UDTF only when per-row logic genuinely
    cannot be expressed as Column expressions."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="term: string, n: bigint")
    class TermCounts:
        def eval(self, text: str):
            from collections import Counter

            for t, n in Counter((text or "").split()).items():
                if n >= 2:
                    yield t, n

    return TermCounts


def embedding_norm_pudf():
    """Scalar Arrow ``pandas_udf``: vectorized L2 norm of an
    ``array<float>`` column via numpy — the batch-at-a-time Python
    kernel shape (one Arrow batch in, one numpy op, one batch out).

    When to use which Python boundary:

    - Column expressions (``F.aggregate``/``sqrt``): bit-exact,
      codegen, zero Python — the default; the repo's similarity
      operators all use it.
    - Scalar ``pandas_udf`` (THIS): a numeric kernel numpy has and
      Spark lacks (special functions, FFTs, model inference).  ~10-100x
      a row-at-a-time ``F.udf`` because the loop runs in C over Arrow
      batches.  CAVEAT: numpy reductions use pairwise/SIMD summation —
      results match builtin sequential sums only to float tolerance,
      so a pandas_udf must NEVER sit on an exact-oracle path (the
      tolerance test in test_rowops documents the gap).
    - ``mapInPandas``/``applyInPandas``/``cogroup``: when row count or
      schema changes, or per-group state is needed.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def l2_norm(vecs: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            # widen BEFORE the reduction: np.dot over a float32 array
            # accumulates in float32 (~1e-8 relative error vs the
            # double-sum builtin); float64 leaves only summation-order
            # noise (~1e-15)
            a = np.asarray(v, dtype=np.float64)
            return float(np.sqrt(np.dot(a, a)))

        return pd.Series([one(v) for v in vecs])

    return l2_norm

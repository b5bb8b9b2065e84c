"""Distributed Pareto skyline (maximal-vector) selection.

The multi-objective filter a curation pipeline runs when no single
score orders candidates: keep every row not DOMINATED by another (worse
or equal on every objective, strictly worse on at least one).  The
distributed shape is the classic two-pass MapReduce skyline
(Börzsönyi/Kossmann/Stocker's BNL block algorithm run per partition,
then once over the union of local skylines — public algorithms): a
row dominated globally is dominated by some row that survives ITS OWN
partition's local skyline, so local filtering never drops a global
skyline member, and the final single-partition pass is exact.

Scale posture: the local pass touches each partition once and emits
only its Pareto-maximal rows; the shuffle moves Σ|local skyline| rows
— for anti-correlated objectives that is the quantity to watch, so
callers should feed ENTITY-BOUNDED relations (per-supplier, per-source
aggregates), not raw fact rows: aggregate first, skyline the bounded
result.  All comparisons are integer (callers pre-scale decimals), so
the surviving SET is identical under any partitioning — the skyline of
a set is partitioning-invariant by definition, which is what makes the
operator oracle-checkable.

Reference anchor: the per-map combine + single-reduce finalize shape of
``mapred/lib/aggregate`` jobs (partial per-partition pruning, exact
merge at the reducer).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame


def _pareto_kernel(dims: Sequence[str], signs: Sequence[int]):
    """Kernel factory: filters an iterator of Arrow batches down to the
    Pareto-maximal rows of the whole partition.  BNL with a numpy
    candidate matrix: O(n * |skyline| * d) vector compares — n is
    partition-local and the caller's contract is an entity-bounded
    input, so this is a bounded in-memory pass, not a corpus scan.
    """
    import numpy as np
    import pandas as pd

    def kernel(batches: Iterable["pd.DataFrame"]):
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        cols = []
        for c, s in zip(dims, signs):
            if pdf[c].isna().any():
                # NaN would CAST to INT64_MIN silently under numpy
                raise ValueError(
                    f"pareto_skyline: objective {c!r} contains NULLs; "
                    "dominance over missing values is undefined — filter "
                    "or impute before the skyline"
                )
            v = pdf[c].to_numpy(dtype="int64")
            if s < 0 and (v == np.iinfo(np.int64).min).any():
                # -INT64_MIN wraps back to INT64_MIN under two's
                # complement, flipping dominance for minimize objectives
                raise ValueError(
                    f"pareto_skyline: objective {c!r} contains INT64_MIN, "
                    "which cannot be negated for a minimize objective — "
                    "rescale the column"
                )
            cols.append(v * s)
        arr = np.stack(cols, axis=1)
        # visit rows in descending lexicographic order: a row can only be
        # dominated by one visited before it, so one forward scan suffices
        order = np.lexsort(arr.T[::-1])[::-1]
        kept_rows: list[int] = []
        kept: "np.ndarray | None" = None
        for i in order:
            row = arr[i]
            if kept is not None:
                ge = (kept >= row).all(axis=1)
                gt = (kept > row).any(axis=1)
                if bool((ge & gt).any()):
                    continue
            kept_rows.append(int(i))
            kept = arr[kept_rows]
        yield pdf.iloc[sorted(kept_rows)]

    return kernel


def pareto_skyline(
    df: DataFrame,
    maximize: Sequence[str],
    minimize: Sequence[str] = (),
) -> DataFrame:
    """Rows of ``df`` not dominated on (maximize ∪ minimize).  Dominance:
    another row is >= on every maximize dim, <= on every minimize dim,
    and strictly better on at least one.  Ties survive (equal vectors
    dominate neither way).  Objective columns must be integer-typed —
    pre-scale decimals to cents/units so the comparison set is exact
    and engine-portable.

    Two passes, both the same kernel: per-partition local skyline
    (dominated rows never leave their partition), then one pass over
    the unioned survivors in a single task — exact because local
    filtering only ever removes globally-dominated rows.
    """
    dims = list(maximize) + list(minimize)
    signs = [1] * len(maximize) + [-1] * len(minimize)
    integral = {"byte", "short", "integer", "long"}
    for c in dims:
        t = dict(df.dtypes).get(c)
        if t is None:
            raise ValueError(f"pareto_skyline: no such column {c!r}")
        if t not in {"tinyint", "smallint", "int", "bigint"} and t not in integral:
            # float/decimal objectives would be silently TRUNCATED by the
            # int64 kernel, flipping dominance near ties — fail loud and
            # make the caller pre-scale (DECIMAL -> cents), the same
            # key-type contract as layout.write_bloom_sidecar
            raise TypeError(
                f"pareto_skyline: objective {c!r} has type {t}; objectives "
                "must be integer-typed — pre-scale decimals/doubles to "
                "cents/units (see supplier_pareto_frontier)"
            )
    kernel = _pareto_kernel(dims, signs)
    local = df.mapInPandas(kernel, df.schema)
    return local.repartition(1).mapInPandas(kernel, df.schema)

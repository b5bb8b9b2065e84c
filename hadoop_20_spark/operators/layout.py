"""Data-layout clustering for multi-dimensional file pruning.

Z-ordering (Morton-curve interleaving) is THE layout primitive a 100 TB
table needs when queries filter on more than one column: a linear sort
clusters file min/max statistics on one dimension only, so a predicate
on the second dimension scans every file; interleaving the bits of both
keys gives every file a tight bounding box in BOTH dimensions, and
min/max stats prune quadratically better.  This is what Delta/Iceberg
``OPTIMIZE ZORDER BY`` computes before repartitioning by range.

Reference analog: TotalOrderPartitioner (``mapred/lib/
TotalOrderPartitioner.java``) produced the LINEAR layout (sorted runs +
MapFile min/max indexes); the Morton key generalizes the same
sort-then-split discipline to multiple dimensions.  Everything here is
pure integer Column codegen — engine-portable, so the layout decision
itself is DuckDB-oracle-checkable bit for bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_scale_expr(x: str, xmin: str, xmax: str, bits: int = 16) -> Column:
    """Scale a numeric column into ``[0, 2^bits)`` with pure integer
    arithmetic: ``((x - min) * (2^bits - 1)) DIV greatest(max - min, 1)``
    — DIV keeps everything in BIGINT (a ``/`` would silently produce
    double division on longs in Spark), so the scaling is deterministic
    and engine-identical; min/max come from a broadcast 1-row
    aggregate."""
    return F.expr(
        f"(({x} - {xmin}) * {(1 << bits) - 1}) DIV greatest({xmax} - {xmin}, 1)"
    )


def morton_interleave(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    scaled column — column j's bit b lands at position
    ``b * n_cols + j``.  A sum of shift/mask terms: pure row-local
    codegen, no UDF, no shuffle; identical ``>> & <<`` semantics on
    BIGINT in Spark and DuckDB."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            z = z + F.shiftleft(
                F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
                b * n + j,
            ).cast("long")
    return z


def morton_interleave_sql(cols: Sequence[str], bits: int = 16) -> str:
    """The identical Morton key as engine-portable SQL (DuckDB oracle
    twin of :func:`morton_interleave`)."""
    n = len(cols)
    terms = [
        f"((({c} >> {b}) & 1) << {b * n + j})"
        for b in range(bits)
        for j, c in enumerate(cols)
    ]
    return " + ".join(terms)


def zorder_file_assignment(
    df: DataFrame,
    dims: Sequence[str],
    *,
    bits: int = 16,
    file_bits: int = 6,
) -> DataFrame:
    """Assign every row a z-order file id (top ``file_bits`` bits of the
    Morton key over min-max-scaled ``dims``) and a linear file id (top
    bits of the first dimension alone) — the two layouts whose pruning
    behavior ``zorder_layout_audit`` compares.  Row-local except ONE
    broadcast 1-row min/max aggregate; the real writer would
    ``repartitionByRange(file_id)`` and write with per-file stats."""
    mm = df.agg(
        *[F.min(d).cast("long").alias(f"__min_{d}") for d in dims],
        *[F.max(d).cast("long").alias(f"__max_{d}") for d in dims],
    )
    scaled = df.crossJoin(F.broadcast(mm)).select(
        "*",
        *[
            minmax_scale_expr(d, f"__min_{d}", f"__max_{d}", bits).alias(
                f"__s_{d}"
            )
            for d in dims
        ],
    )
    z = morton_interleave([F.col(f"__s_{d}") for d in dims], bits)
    total_bits = bits * len(dims)
    return scaled.select(
        "*",
        F.shiftright(z, total_bits - file_bits).alias("zorder_file"),
        F.shiftright(F.col(f"__s_{dims[0]}"), bits - file_bits).alias(
            "linear_file"
        ),
    ).drop(*[f"__min_{d}" for d in dims], *[f"__max_{d}" for d in dims])

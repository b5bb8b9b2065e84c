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
    if not (0 < file_bits <= bits):
        raise ValueError(
            f"file_bits must be in (0, bits={bits}], got {file_bits}: the "
            "file id is a top-bits shift of the Morton key (and of the "
            "first scaled dim for the linear layout)"
        )
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


def write_clustered(
    df: DataFrame,
    dims: Sequence[str],
    out_dir: str,
    *,
    layout: str = "zorder",
    bits: int = 16,
    file_bits: int = 6,
) -> None:
    """MATERIALIZE a clustered layout: assign every row its file id
    (``zorder`` Morton ranges or ``linear`` first-dim ranges), range-
    repartition so each output file holds one contiguous id range, and
    write plain parquet — the footer min/max statistics of the ORIGINAL
    dim columns then carry the bounding boxes that
    ``zorder_layout_audit`` simulates, so pruning is measurable from
    the filesystem, not a model.

    Reference analog: TotalOrderPartitioner + MapFile
    (``mapred/lib/TotalOrderPartitioner.java``, ``io/MapFile.java``)
    wrote REAL sorted runs with real indexes; this is that discipline
    with parquet footers as the index.  ``repartitionByRange`` over the
    file id samples range boundaries, so each task writes one tight
    Morton range; with default row-group sizing each file is one row
    group and row-group pruning equals file pruning."""
    file_col = {"zorder": "zorder_file", "linear": "linear_file"}[layout]
    assigned = zorder_file_assignment(df, dims, bits=bits, file_bits=file_bits)
    # repartitionByRange samples its boundaries (RangePartitioner,
    # seeded by session RDD ids): at the default 100 samples/partition
    # an unlucky draw over the 2^file_bits skewed file-id populations
    # merges adjacent Morton ranges into one output file — a wider
    # bounding box and measurably worse pruning, varying run to run.
    # A layout write is a one-time maintenance pass, so buy stable
    # near-exact quantile boundaries with a bigger sample (guide §6:
    # the written layout IS the optimization; its quality should not
    # depend on a sampling seed).  Set/restore around the action —
    # the conf is read when the range exchange plans.
    spark = df.sparkSession
    _key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    _old = spark.conf.get(_key, None)
    spark.conf.set(_key, "5000")
    try:
        (
            assigned.repartitionByRange(1 << file_bits, F.col(file_col))
            .drop(*[f"__s_{d}" for d in dims], "zorder_file", "linear_file")
            .write.mode("overwrite")
            .parquet(out_dir)
        )
    finally:
        if _old is None:
            spark.conf.unset(_key)
        else:
            spark.conf.set(_key, _old)


def parquet_file_boxes(out_dir: str, dims: Sequence[str]) -> list[dict]:
    """Read back every parquet footer under ``out_dir`` and return the
    REAL per-file min/max bounding box of ``dims`` — the filesystem
    truth the simulated audit must agree with.  Driver-side metadata
    read only (footers, never data pages): exactly what a lakehouse
    manifest stores."""
    import os

    import pyarrow.parquet as pq

    boxes = []
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(out_dir, name))
        lo = {d: None for d in dims}
        hi = {d: None for d in dims}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                d = col.path_in_schema
                if d not in lo:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                lo[d] = st.min if lo[d] is None else min(lo[d], st.min)
                hi[d] = st.max if hi[d] is None else max(hi[d], st.max)
        boxes.append(
            {
                "file": name,
                "n_row_groups": md.num_row_groups,
                "n_rows": md.num_rows,
                **{f"min_{d}": lo[d] for d in dims},
                **{f"max_{d}": hi[d] for d in dims},
            }
        )
    return boxes


# ---------------------------------------------------------------------------
# Per-file Bloom sidecar: the BloomMapFile analog (round 8)
# ---------------------------------------------------------------------------
_BLOOM_OFFSETS = (0, 8, 16)  # k=3 hashes from ONE md5 digest (joins.py family)


def write_bloom_sidecar(
    spark, table_dir: str, key_col: str, m_bits: int = 4096
) -> str:
    """Build a per-FILE Bloom filter over ``key_col`` for every parquet
    file under ``table_dir`` and persist it as a SPARSE sidecar table
    ``(file, word_idx, word)`` at ``table_dir + "_bloom"`` — the
    reference's ``io/BloomMapFile.java`` (MapFile + membership filter)
    rebuilt as a relational aggregate over ``input_file_name()``.

    Footer min/max stats (parquet_file_boxes) prune RANGE predicates;
    they are useless for point lookups on a column the layout was NOT
    clustered by — every file's [min, max] straddles most keys.  The
    Bloom sidecar answers exactly that: "which files can contain THIS
    key", with false positives bounded by sizing and false negatives
    impossible (same md5 family on both sides).

    One scan of the table; per (file, word) bit_or with map-side
    partials — <= files * m_bits/32 cells cross the wire, sparse rows
    only (a file's absent words are zero, and the probe treats a
    missing row as bit-not-set).  At 100 TB this is a metadata build
    alongside compaction, and the sidecar (KBs per file) lives where a
    lakehouse manifest lives."""
    from hadoop_20_spark.functions import md5_long

    if m_bits % 32 != 0:
        raise ValueError(f"m_bits must be a multiple of 32, got {m_bits}")
    # The probe side (bloom_lookup_files) hashes Python str(key) on the
    # driver; the build side hashes Spark's cast(key AS STRING).  Those
    # two renderings agree ONLY for integral and string keys — for
    # date/decimal/float/boolean they differ (e.g. Python str(True) vs
    # SQL 'true'), which would turn into silent FALSE NEGATIVES (files
    # wrongly skipped -> rows dropped), breaking the no-false-negative
    # contract.  Fail loudly at build time instead of latently at probe.
    key_type = dict(spark.read.parquet(table_dir).dtypes).get(key_col)
    _BLOOM_KEY_TYPES = {"tinyint", "smallint", "int", "bigint", "string"}
    if key_type not in _BLOOM_KEY_TYPES:
        raise TypeError(
            f"bloom sidecar key column {key_col!r} has type {key_type}; "
            f"only {sorted(_BLOOM_KEY_TYPES)} render identically under "
            "Python str() and SQL CAST(... AS STRING) — the probe would "
            "silently miss files for other types"
        )
    # RELATIVE file names (basename), not input_file_name()'s absolute
    # URI: the sidecar must survive the table dir being renamed/moved
    # (atomic-publish staging, lakehouse-manifest portability)
    df = spark.read.parquet(table_dir).select(
        F.regexp_extract(F.input_file_name(), "([^/]+)$", 1).alias("file"),
        F.col(key_col).cast("string").alias("k"),
    )
    keys = df.distinct()
    pos = F.explode(
        F.array(*[md5_long(F.col("k"), o) % m_bits for o in _BLOOM_OFFSETS])
    ).alias("pos")
    words = (
        keys.select("file", pos)
        .select(
            "file",
            F.expr("pos DIV 32").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("bit"),
        )
        .groupBy("file", "word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    out = table_dir.rstrip("/") + "_bloom"
    words.write.mode("overwrite").parquet(out)
    return out


def bloom_lookup_files(
    spark, table_dir: str, key, m_bits: int = 4096
) -> tuple[list[str], int]:
    """Driver-side point-lookup planning against a Bloom sidecar:
    compute the key's k=3 hash positions with the PYTHON twin of
    ``functions.md5_long`` (same digest, same 15-hex-char substrings —
    invindex.py's literal-bucket discipline), read only the <= k*files
    sidecar rows at those word indexes, and return (files whose filter
    passes all k bits, total files indexed).

    The sidecar read is a tiny partition-pruned scan; the returned file
    list becomes an explicit-paths parquet read, so the data-side scan
    touches ONLY the surviving files — file-level pruning by CONTENT,
    which footer ranges cannot express for point keys."""
    import hashlib

    import os

    if not isinstance(key, (int, str)) or isinstance(key, bool):
        raise TypeError(
            f"bloom point lookup key must be int or str (got "
            f"{type(key).__name__}): only those render identically to "
            "the build side's CAST(... AS STRING) digest input"
        )
    digest = hashlib.md5(str(key).encode("utf-8")).hexdigest()
    positions = [int(digest[o : o + 15], 16) % m_bits for o in _BLOOM_OFFSETS]
    need = {(p // 32, 1 << (p % 32)) for p in positions}
    side = spark.read.parquet(table_dir.rstrip("/") + "_bloom")
    rows = (
        side.filter(F.col("word_idx").isin([w for w, _ in need]))
        .collect()
    )
    all_files = {r["file"] for r in side.select("file").distinct().collect()}
    by_file: dict[str, dict[int, int]] = {}
    for r in rows:
        by_file.setdefault(r["file"], {})[r["word_idx"]] = r["word"]
    passing = [
        os.path.join(table_dir, f)
        for f in sorted(all_files)
        if all(by_file.get(f, {}).get(w, 0) & bit for w, bit in need)
    ]
    return passing, len(all_files)


# ---------------------------------------------------------------------------
# Incremental layout maintenance (round 8): OPTIMIZE without full rewrite
# ---------------------------------------------------------------------------


def assign_zorder_fixed(
    df: DataFrame,
    dims: Sequence[str],
    bounds: dict[str, tuple[int, int]],
    *,
    bits: int = 16,
    file_bits: int = 6,
) -> DataFrame:
    """Z-order file ids under FIXED dim bounds (literals, not a data
    aggregate) — the invariant incremental maintenance needs: every
    append must agree with the original write about which file id a row
    belongs to, so the bounds are pinned at table creation and
    out-of-range values CLAMP to the edge cells (least/greatest before
    scaling).  Pure integer codegen, same Morton math as
    zorder_file_assignment."""
    scaled = [
        F.expr(
            f"((least(greatest({d}, {lo}), {hi}) - {lo}) * {(1 << bits) - 1})"
            f" DIV greatest({hi} - {lo}, 1)"
        )
        for d, (lo, hi) in ((d, bounds[d]) for d in dims)
    ]
    z = morton_interleave(scaled, bits)
    return df.select(
        "*", F.shiftright(z, bits * len(dims) - file_bits).alias("zorder_file")
    )


def write_clustered_partitioned(
    df: DataFrame,
    dims: Sequence[str],
    out_dir: str,
    *,
    bits: int = 16,
    file_bits: int = 6,
) -> dict[str, tuple[int, int]]:
    """Clustered layout as ``zorder_file=K/`` partition DIRECTORIES —
    the maintainable form of write_clustered's plain files (a directory
    per Morton range is addressable for incremental rewrite; a plain
    file is not).  Bounds are computed from the initial data, used to
    assign ids, and RETURNED — the caller persists them (they are the
    table's layout contract; optimize_incremental must reuse them).

    Reference analog: io/MapFile.java directories (data + index per
    reducer output) under a TotalOrderPartitioner split — the layout
    the reference could append a new sorted run into."""
    mm = df.agg(
        *[F.min(d).cast("long").alias(f"lo_{d}") for d in dims],
        *[F.max(d).cast("long").alias(f"hi_{d}") for d in dims],
    ).first()
    bounds = {d: (mm[f"lo_{d}"], mm[f"hi_{d}"]) for d in dims}
    assigned = assign_zorder_fixed(df, dims, bounds, bits=bits, file_bits=file_bits)
    assigned.write.mode("overwrite").partitionBy("zorder_file").parquet(out_dir)
    return bounds


def optimize_incremental(
    spark,
    out_dir: str,
    batch: DataFrame,
    dims: Sequence[str],
    bounds: dict[str, tuple[int, int]],
    *,
    bits: int = 16,
    file_bits: int = 6,
) -> dict:
    """Merge an appended batch into an existing clustered layout,
    rewriting ONLY the partition directories the batch touches — the
    incremental OPTIMIZE a 100 TB table needs (a full re-cluster
    rewrites everything for a 0.1% append).  Batch rows get their file
    ids under the table's PINNED bounds (out-of-range values clamp to
    edge cells), and each affected ``zorder_file=K/`` directory is
    rewritten as old-rows ∪ new-rows; untouched directories are never
    read or written.

    The merged relation is localCheckpoint'ed before the overwrite —
    a lazy read would re-scan the directory it is about to replace.
    Returns {"affected": [ids], "n_dirs": total} so callers can assert
    the rewrite really was incremental."""
    import os

    assigned = assign_zorder_fixed(
        batch, dims, bounds, bits=bits, file_bits=file_bits
    ).localCheckpoint()
    affected = sorted(
        r["zorder_file"] for r in assigned.select("zorder_file").distinct().collect()
    )
    for fid in affected:
        part_dir = os.path.join(out_dir, f"zorder_file={fid}")
        new_rows = assigned.filter(F.col("zorder_file") == fid).drop("zorder_file")
        if os.path.isdir(part_dir):
            merged = spark.read.parquet(part_dir).unionByName(new_rows)
        else:
            merged = new_rows
        merged.localCheckpoint().write.mode("overwrite").parquet(part_dir)
    n_dirs = len(
        [n for n in os.listdir(out_dir) if n.startswith("zorder_file=")]
    )
    return {"affected": affected, "n_dirs": n_dirs}

"""Scalar function surface (SURVEY §2.9).

The reference has no expression library — scalar work is Java inside
mappers, with utility classes for strings (core/util/StringUtils.java),
hashing (core/io/MD5Hash.java, core/util/hash/MurmurHash.java,
core/util/PureJavaCrc32.java) and bloom filters (core/util/bloom/).  Our
engine exposes Spark's built-in surface; this module adds the few
deterministic, engine-portable helpers the operator library shares.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "MERSENNE31",
    "ensure_parallelism",
    "hash_coeffs",
    "let",
    "md5_long",
    "md5_bucket",
    "ngrams",
    "shingles",
    "tokens",
]


def let(expr: Column, body) -> Column:
    """Let-bind ``expr`` ONCE per row as a lambda variable and build the
    result with ``body(var)`` — the lambda-CSE rule (SCALE.md): Catalyst
    does not common-subexpression-eliminate across nested higher-order
    lambdas, so an expensive expression referenced from a per-element
    lambda body re-evaluates per element.  ``transform(array(e), x ->
    body(x))[0]`` evaluates ``e`` exactly once.  Use whenever a Column
    builder (no DataFrame at hand to materialize a projection) feeds an
    expensive array into a sliding-window/per-element lambda."""
    return F.transform(F.array(expr), body)[0]


def ensure_parallelism(df, min_partitions: int | None = None):
    """Repartition ``df`` round-robin if its EFFECTIVE parallelism is
    below the cluster's core count — decoupling CPU-heavy expression
    stages (MinHash/SimHash signatures, shingle explodes, Arrow GEMM
    batches) from the input file layout.

    Partition COUNT is not enough: Spark plans a parquet scan into
    byte-range splits (``spark.sql.files.maxPartitionBytes``), but a
    row group is atomic — a single file with few fat row groups (the
    pyarrow default writes ~1M-row groups) plans into N splits of which
    only ``n_row_groups`` carry rows.  The third-decade probe measured
    the failure live: a 2M-row embeddings file with 2 row groups showed
    32 partitions (so the old ``getNumPartitions() < target`` check
    passed through) while 30 tasks finished empty and 2 tasks ground
    the 132× SRP probe explode on one core each for 40+ minutes.  So
    when the scan reads FEW files (≤ target — bounded driver work), the
    parquet footers are consulted and the df is repartitioned if total
    row groups < target.  At 100 TB inputs arrive with thousands of
    files and both checks are no-ops (no footer reads, no shuffle).
    Reference analog: mapred.min.split.size / NLineInputFormat — the
    knob hadoop-20 users turned when a CPU-bound job had too few maps
    (mapred/FileInputFormat.java#getSplits).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    try:
        files = df.inputFiles()
    except Exception:  # non-file-backed plans (streams, local relations)
        return df
    if not files or len(files) > target:
        return df
    if not all(f.endswith((".parquet", ".parq")) for f in files):
        return df
    try:
        from urllib.parse import urlparse

        import pyarrow.parquet as pq

        row_groups = 0
        for f in files:
            p = urlparse(f)
            if p.scheme not in ("", "file"):
                return df  # remote FS: skip the footer check
            row_groups += pq.ParquetFile(p.path).num_row_groups
            if row_groups >= target:
                return df
    except Exception:
        return df
    return df.repartition(target)

# Modulus for the universal hash family (a*h + b) mod p used by MinHash:
# Mersenne prime 2^31-1 keeps every product under 2^62, so the arithmetic
# is exact in int64 on any engine (Spark long, DuckDB BIGINT).
MERSENNE31 = (1 << 31) - 1


def hash_coeffs(k: int, salt: str = "minhash") -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficient pairs for a universal hash family,
    derived from md5 of a salted counter — reproducible in plain Python
    (hashlib), Spark, and the DuckDB oracle alike, with no stored model.
    ``a`` is forced nonzero mod p."""
    import hashlib

    out = []
    for i in range(k):
        a = int(hashlib.md5(f"{salt}_a{i}".encode()).hexdigest()[:15], 16) % MERSENNE31
        b = int(hashlib.md5(f"{salt}_b{i}".encode()).hexdigest()[:15], 16) % MERSENNE31
        out.append((a or 1, b))
    return out


def md5_long(col: Column | str, offset: int = 0) -> Column:
    """Deterministic 60-bit integer hash of a string: parse 15 hex chars
    of md5 starting at ``offset`` (1-based within the 32-char digest).

    Engine-portable analog of core/io/MD5Hash.java#halfDigest: the same
    value is computable in any SQL engine with md5() (DuckDB oracle:
    ``('0x' || substr(md5(x), o, 15))::BIGINT``), unlike Spark's
    murmur3 ``hash``/``xxhash64`` whose seeds/algorithms differ per
    engine.  Used for dedup fingerprints and deterministic sampling.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1 + offset, 15), 16, 10).cast("bigint")


def md5_bucket(col: Column | str, n_buckets: int) -> Column:
    """Hash-partition a string key into n deterministic buckets."""
    return md5_long(col) % n_buckets


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (TokenCountMapper contract), empty tokens
    removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def ngrams(col: Column | str, n: int) -> Column:
    """Word n-grams over whitespace tokens as ' '-joined strings.
    Pure higher-order-function implementation (codegen, no UDF):
    transform over token indexes → slice → array_join.

    The token array is let-bound once per row (``let``): referencing
    the ``tokens(col)`` *expression* from the per-index lambda would
    re-tokenize the string once per window position — measured 7×
    slower on a 3-gram explode at sf0.1."""

    def _grams(toks: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )

    return let(tokens(col), _grams)


def shingles(col: Column | str, n: int) -> Column:
    """Distinct word n-grams (the MinHash shingle set)."""
    return F.array_distinct(ngrams(col, n))

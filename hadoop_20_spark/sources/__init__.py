"""Sources & sinks (SURVEY §2.1-2.2).

Spark's reader/writer covers nearly all reference formats natively; this
module adds the reference-shaped conveniences:

- k/v tab-separated text (KeyValueTextInputFormat / TextOutputFormat's
  ``key \\t value`` contract)
- demux writes (MultipleOutputFormat → ``partitionBy``)
- sorted table writes (MapFileOutputFormat → sortWithinPartitions +
  parquet row-group stats as the index)
- small-file compaction (HadoopArchives / CombineFileInputFormat role)
- NLine-style fixed-rows-per-partition repartitioning
- JDBC passthrough (DBInputFormat/DBOutputFormat)

Commit protocol, file packing, split computation are Spark built-ins
(FileOutputCommitter is literally the same class lineage — SURVEY §2.2).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """TextInputFormat: one row per line, column ``value``.  (The byte
    offset key is dropped — Spark's equivalent of the ``(offset, line)``
    contract is ``monotonically_increasing_id`` if a key is needed.)"""
    return spark.read.text(path)


def read_kv_text(
    spark: SparkSession, path: str, separator: str = "\t"
) -> DataFrame:
    """mapred/KeyValueTextInputFormat.java — split each line at the FIRST
    separator; no separator → whole line is key, value empty (the
    documented edge case, KeyValueLineRecordReader.java)."""
    lines = spark.read.text(path)
    # Column-API expressions only — the separator is never interpolated
    # into SQL text (quotes/backslashes in it would break an F.expr) and
    # never treated as a regex.
    idx = F.instr(F.col("value"), separator)
    return lines.select(
        F.when(idx > 0, F.substring_index(F.col("value"), separator, 1))
        .otherwise(F.col("value"))
        .alias("key"),
        F.when(
            idx > 0,
            F.col("value").substr(
                idx + len(separator), F.length(F.col("value"))
            ),
        )
        .otherwise(F.lit(""))
        .alias("value"),
    )


def write_kv_text(
    df: DataFrame, path: str, key: str, value: str, separator: str = "\t"
) -> None:
    """mapred/TextOutputFormat.java — ``key \\t value`` lines."""
    df.select(
        F.concat_ws(separator, F.col(key).cast("string"), F.col(value).cast("string")).alias(
            "value"
        )
    ).write.mode("overwrite").text(path)


def write_demux(df: DataFrame, path: str, *route_cols: str, fmt: str = "parquet") -> None:
    """mapred/lib/MultipleOutputFormat.java — route each record to a file
    derived from its key.  ``partitionBy`` gives the same layout with
    dynamic partition discovery on read; at 100 TB this is also the
    partition-pruning layout (the reference's ``/logs/ds=.../`` idiom)."""
    df.write.mode("overwrite").partitionBy(*route_cols).format(fmt).save(path)


def write_sorted(
    df: DataFrame, path: str, *sort_cols: str, fmt: str = "parquet"
) -> None:
    """mapred/MapFileOutputFormat.java — sorted k/v + index.  Sorted
    parquet row groups carry min/max stats, which IS the MapFile index:
    point lookups prune to one row group (binary search equivalent)."""
    df.sortWithinPartitions(*sort_cols).write.mode("overwrite").format(fmt).save(path)


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any scheme — file://, hdfs://, s3a://.
    The scheme's filesystem is resolved from the path itself via the
    Hadoop FileSystem API (core/fs/FileSystem.java), so callers never
    assume a local filesystem."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def fs_du_bytes(spark: SparkSession, path: str) -> int:
    """Recursive byte size of a directory tree (hadoop fs -du -s)."""
    fs, jpath = _hadoop_fs(spark, path)
    return fs.getContentSummary(jpath).getLength()


def fs_list_files(spark: SparkSession, path: str) -> list[str]:
    """Recursive file listing (hadoop fs -ls -R), any scheme."""
    fs, jpath = _hadoop_fs(spark, path)
    it = fs.listFiles(jpath, True)
    out = []
    while it.hasNext():
        out.append(it.next().getPath().toString())
    return out


def compact_small_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """HadoopArchives / CombineFileInputFormat role: rewrite a directory
    of small files into ~target-sized ones.  Returns the file count
    chosen.  Sizes output from the source byte size (Hadoop FS API — so
    hdfs://-resident trees size correctly, not just local paths), then
    ``coalesce`` — a narrow (shuffle-free) rewrite."""
    df = spark.read.format(fmt).load(in_path)
    total_bytes = fs_du_bytes(spark, in_path)
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df.coalesce(n_files).write.mode("overwrite").format(fmt).save(out_path)
    return n_files


#: repartition_n_rows is sweep-input-only; refuse bulk data outright.
NLINE_MAX_ROWS = 1_000_000


def repartition_n_rows(df: DataFrame, rows_per_partition: int, order_col: str) -> DataFrame:
    """mapred/lib/NLineInputFormat.java — exactly N records per task, for
    parameter sweeps.  Row-rank → partition id → identity partitioner
    (hash repartition would collide several ids into one task).  The
    global row_number is a single-partition sort — fine for the sweep-
    input use case this exists for, wrong for bulk data (guarded by
    :data:`NLINE_MAX_ROWS`); use ``repartition(n)`` there."""
    import math

    from pyspark.sql import Window

    n = df.count()
    if n > NLINE_MAX_ROWS:
        raise ValueError(
            f"repartition_n_rows is a sweep-input tool (global single-task "
            f"row_number); {n} rows exceeds NLINE_MAX_ROWS={NLINE_MAX_ROWS} — "
            "use df.repartition(n) for bulk data"
        )
    num_parts = max(1, math.ceil(n / rows_per_partition))
    rank = F.row_number().over(Window.orderBy(order_col)) - 1
    with_pid = df.withColumn(
        "_pid", F.floor(rank / rows_per_partition).cast("int")
    )
    schema = with_pid.schema
    rdd = (
        with_pid.rdd.map(lambda r: (r["_pid"], r))
        .partitionBy(num_parts, lambda k: k)
        .values()
    )
    return df.sparkSession.createDataFrame(rdd, schema).drop("_pid")


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """mapred/lib/db/DBInputFormat.java — paged JDBC source; Spark's
    partitionColumn/lowerBound/upperBound replicate the per-split paging
    (each executor issues its own bounded SELECT — the reference's
    LIMIT/OFFSET splits, minus the OFFSET scan cost).  Exercised against
    embedded Derby (on Spark's classpath) in test_interop."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "overwrite", **options
) -> None:
    """mapred/lib/db/DBOutputFormat.java — batched INSERTs per partition
    (Spark's JDBC sink batches ``batchsize`` rows per round trip, one
    connection per task — same commit discipline as DBRecordWriter)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        writer = writer.option(k, str(v))
    writer.mode(mode).save()


def write_noop(df: DataFrame) -> None:
    """mapred/lib/NullOutputFormat.java — run the plan, discard output."""
    df.write.mode("overwrite").format("noop").save()


def write_bucketed(
    df: DataFrame, table: str, n_buckets: int, key: str, sort: bool = True
) -> None:
    """Bucketed+sorted table — the reference's map-side merge-join
    precondition (mapred/join/CompositeInputFormat.java requires sorted,
    identically-partitioned inputs).  Two tables bucketed on the same key
    with the same bucket count join with NO shuffle (and no sort when
    ``sort=True``): the reference's zero-shuffle property, persisted in
    the table layout.  At 100 TB this is how repeated fact⋈fact joins
    amortize their shuffle once at write time."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a dropped-but-lingering managed-table dir (metastore reset between
    # sessions) blocks CREATE TABLE; clear it
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    stale = os.path.join(warehouse, table.lower())
    if os.path.isdir(stale):
        shutil.rmtree(stale, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_delimited(
    spark: SparkSession, path: str, record_delimiter: str
) -> DataFrame:
    """st/StreamInputFormat.java — custom record delimiter instead of
    newline (``stream.recordreader.begin/end`` family): Spark's lineSep
    handles arbitrary delimiters at scan time, splittable as usual."""
    return spark.read.option("lineSep", record_delimiter).text(path)


def read_xml_records(
    spark: SparkSession, path: str, row_tag: str, schema_ddl: str
) -> DataFrame:
    """st/StreamXmlRecordReader.java — XML-chunk records: chunk the file
    on the row tag (lineSep scan), re-close the fragment, parse with
    from_xml (Spark 4).  Column ``xml`` keeps the raw fragment."""
    end_tag = f"</{row_tag}>"
    raw = spark.read.option("lineSep", end_tag).text(path)
    frag = F.concat(F.col("value"), F.lit(end_tag))
    parsed = (
        raw.filter(F.col("value").contains(f"<{row_tag}"))
        .select(
            F.concat(
                F.substring_index(frag, f"<{row_tag}", -1).alias("_"),
            ).alias("xml_body"),
        )
        .select(
            F.concat(F.lit(f"<{row_tag}"), F.col("xml_body")).alias("xml")
        )
    )
    return parsed.withColumn(
        "rec", F.expr(f"from_xml(xml, '{schema_ddl}')")
    ).select("xml", "rec.*")


def read_fixed_width(
    spark: SparkSession, path: str, widths: dict[str, int], record_len: int | None = None
) -> DataFrame:
    """ex/terasort/TeraInputFormat.java — fixed-length records (10-byte
    key + 90-byte payload): read newline-less byte runs via lineSep on a
    sentinel-free text scan is impossible, so records are sliced from
    fixed offsets of each line (text fixtures) — the fixed-offset
    ``substring`` projection is the operative part."""
    lines = spark.read.text(path)
    cols, off = [], 1
    for name, w in widths.items():
        cols.append(F.substring(F.col("value"), off, w).alias(name))
        off += w
    return lines.select(*cols)


# --- synthetic generators (§2.1) -------------------------------------------

def _md5_long_expr(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")


def generate_kv(spark: SparkSession, n_rows: int, seed: str = "gen") -> DataFrame:
    """ex/RandomWriter.java — deterministic synthetic k/v: instead of a
    seeded RNG (whose stream depends on partitioning), keys/values derive
    from md5 of the row index — identical output at any parallelism and
    reproducible in any engine.  Columns: ``id, key (bigint), value
    (string)``."""
    base = spark.range(n_rows)
    h = _md5_long_expr(F.concat(F.lit(f"{seed}_k_"), F.col("id")))
    v = F.md5(F.concat(F.lit(f"{seed}_v_"), F.col("id").cast("string")))
    return base.select(F.col("id"), h.alias("key"), v.alias("value"))


def generate_text(spark: SparkSession, n_rows: int, words_per_row: int = 10,
                  vocab: int = 1000, seed: str = "gentext") -> DataFrame:
    """ex/RandomTextWriter.java — synthetic text: ``words_per_row`` tokens
    drawn deterministically (md5 of (row, position) mod vocab)."""
    base = spark.range(n_rows)
    words = F.transform(
        F.sequence(F.lit(0), F.lit(words_per_row - 1)),
        lambda i: F.concat(
            F.lit("w"),
            (
                _md5_long_expr(
                    F.concat(F.lit(f"{seed}_"), F.col("id"), F.lit("_"), i)
                )
                % vocab
            ).cast("string"),
        ),
    )
    return base.select(F.col("id"), F.array_join(words, " ").alias("text"))


def teragen(spark: SparkSession, n_rows: int) -> DataFrame:
    """ex/terasort/TeraGen.java — 100-byte records: 10-byte binary-ish key
    + 90-byte payload, md5-derived (deterministic at any parallelism).
    Sorting this table by ``key`` is the TeraSort benchmark; binary order
    == lexicographic on the hex key."""
    base = spark.range(n_rows)
    key = F.substring(F.md5(F.concat(F.lit("tera_"), F.col("id").cast("string"))), 1, 10)
    payload = F.rpad(
        F.concat_ws(
            "",
            F.md5(F.concat(F.lit("pa_"), F.col("id").cast("string"))),
            F.md5(F.concat(F.lit("pb_"), F.col("id").cast("string"))),
        ),
        90,
        "X",
    )
    return base.select(F.col("id"), key.alias("key"), payload.alias("payload"))


def distcp(spark: SparkSession, src: str, dst: str, fmt: str = "parquet") -> int:
    """src/tools/.../DistCp.java — bulk copy as a parallel job.  Returns
    row count copied.  This is the table-level copy (re-encode through
    the format — the common dataset-migration case; tasks copy in
    parallel).  For byte-identical layout preservation use
    :func:`distcp_files`."""
    df = spark.read.format(fmt).load(src)
    df.write.mode("overwrite").format(fmt).save(dst)
    return spark.read.format(fmt).load(dst).count()


def distcp_files(spark: SparkSession, src: str, dst: str) -> int:
    """Layout-preserving tree copy via the Hadoop FS API
    (FileUtil.copy) — byte-identical files, any src/dst scheme
    combination (file://, hdfs://, s3a://).  Returns the file count
    copied.  Driver-orchestrated (streams go FS-to-FS, not through
    Python); for petabyte trees prefer the format-level :func:`distcp`,
    which distributes the copy across executors."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src_fs, src_path = _hadoop_fs(spark, src)
    dst_fs, dst_path = _hadoop_fs(spark, dst)
    ok = jvm.org.apache.hadoop.fs.FileUtil.copy(
        src_fs, src_path, dst_fs, dst_path, False, True, conf
    )
    if not ok:
        raise IOError(f"distcp_files {src} -> {dst} failed")
    return len(fs_list_files(spark, dst))


def write_named_outputs(df, base_path: str, outputs: dict) -> dict:
    """mapred/lib/MultipleOutputs.java — named side outputs with
    independent schemas/formats from ONE upstream pass.

    ``outputs`` maps name -> (transform, format); the upstream is
    cached once, each named output applies its transform and writes to
    ``base_path/name`` in its own format.  The reference ran one job
    whose reducer wrote to N collectors; here the cache substitutes for
    the single pass, and each write is an independent action (at 100 TB
    prefer a persisted upstream table over memory cache).  Returns
    {name: path}."""
    cached = df.persist()
    paths = {}
    try:
        for name, (transform, fmt) in outputs.items():
            out = f"{base_path.rstrip('/')}/{name}"
            transform(cached).write.mode("overwrite").format(fmt).save(out)
            paths[name] = out
    finally:
        cached.unpersist()
    return paths


def parse_csv_quarantine(df: DataFrame, line_col: str, ddl_schema: str,
                         corrupt_col: str = "_corrupt") -> DataFrame:
    """SkipBadRecords analog (mapred/SkipBadRecords.java): the reference
    SKIPPED ranges of bad records after task retries — a control-flow
    remedy for a data problem.  Spark-first, the remedy is declarative:
    parse every line in PERMISSIVE mode, keep good rows typed, and route
    malformed rows to a quarantine with the RAW LINE preserved verbatim
    (``corrupt_col``), so nothing is silently dropped and the bad subset
    is itself queryable (the skip-mode counter files, as a DataFrame).

    Returns the input columns plus the parsed fields plus ``corrupt_col``
    (NULL == clean parse).  Malformed means wrong arity or a field that
    fails its declared type; an EMPTY field is a legal NULL, not
    corruption (verified from_csv semantics).  One row-local projection:
    no shuffle, fully pipelined into the scan at 100 TB."""
    parsed = F.from_csv(
        F.col(line_col),
        f"{ddl_schema}, {corrupt_col} string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
    )
    return df.withColumn("_p", parsed).select("*", "_p.*").drop("_p")


def distcp_update(
    spark: SparkSession,
    src: str,
    dst: str,
    delete_extra: bool = False,
) -> dict:
    """Incremental layout-preserving tree sync — DistCp's ``-update``
    (and optional ``-delete``) semantics (src/tools/.../DistCp.java:
    the reference compared size/checksum per file and re-copied only
    changed ones).  A file is copied iff it is missing at the
    destination or differs in SIZE; same-relpath same-size files are
    skipped (the reference's behavior when checksums are unavailable,
    e.g. across checksum-incompatible filesystems — documented
    contract, not a silent approximation).  With ``delete_extra``,
    destination files absent from the source are removed (``-delete``).

    Returns {"copied": n, "skipped": n, "deleted": n} — a second run
    over an unchanged tree reports copied == 0 (idempotence, tested).
    Driver-orchestrated like :func:`distcp_files` (streams go FS-to-FS
    through the JVM, not Python); at petabyte scale distribute the
    changed-file list as a DataFrame job, same plan shape as
    compact_small_files.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src_fs, src_root = _hadoop_fs(spark, src)
    dst_fs, dst_root = _hadoop_fs(spark, dst)

    def manifest(fs, root, root_str):
        out = {}
        if not fs.exists(root):
            return out
        it = fs.listFiles(root, True)
        while it.hasNext():
            st = it.next()
            p = st.getPath().toString()
            rel = p[len(root_str):].lstrip("/")
            out[rel] = int(st.getLen())
        return out

    src_str = src_fs.makeQualified(src_root).toString()
    dst_str = dst_fs.makeQualified(dst_root).toString()
    src_m = manifest(src_fs, src_root, src_str)
    dst_m = manifest(dst_fs, dst_root, dst_str)

    copied = skipped = deleted = 0
    for rel, size in sorted(src_m.items()):
        if dst_m.get(rel) == size:
            skipped += 1
            continue
        sp = jvm.org.apache.hadoop.fs.Path(f"{src_str}/{rel}")
        dp = jvm.org.apache.hadoop.fs.Path(f"{dst_str}/{rel}")
        dst_fs.mkdirs(dp.getParent())
        ok = jvm.org.apache.hadoop.fs.FileUtil.copy(
            src_fs, sp, dst_fs, dp, False, True, conf
        )
        if not ok:
            raise IOError(f"distcp_update copy failed: {rel}")
        copied += 1
    if delete_extra:
        for rel in sorted(set(dst_m) - set(src_m)):
            dp = jvm.org.apache.hadoop.fs.Path(f"{dst_str}/{rel}")
            dst_fs.delete(dp, False)
            deleted += 1
    return {"copied": copied, "skipped": skipped, "deleted": deleted}

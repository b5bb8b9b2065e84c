"""Format interop: SequenceFile roundtrip, compression codec matrix,
NLine-style repartitioning (SURVEY §1.3, §2.1)."""

import glob

from pyspark.sql import functions as F

from hadoop_20_spark import sources


def test_sequencefile_roundtrip(spark, tables, tmp_path):
    """io/SequenceFile.java interop: write (k,v) pairs via the Hadoop
    SequenceFile OutputFormat, read them back."""
    path = str(tmp_path / "seq")
    pairs = tables["nation"].select("n_nationkey", "n_name").rdd.map(
        lambda r: (int(r["n_nationkey"]), r["n_name"])
    )
    pairs.saveAsSequenceFile(path)
    back = dict(spark.sparkContext.sequenceFile(path).collect())
    exp = {r["n_nationkey"]: r["n_name"] for r in tables["nation"].collect()}
    assert back == exp


def test_codec_matrix_text(spark, tables, tmp_path):
    """io/compress codecs: gzip & bzip2 compat (reference's DefaultCodec/
    GzipCodec/BZip2Codec), plus modern defaults."""
    nation = tables["nation"].select(F.col("n_name").alias("value"))
    exp = sorted(r["value"] for r in nation.collect())
    for codec in ["gzip", "bzip2"]:
        p = str(tmp_path / f"text_{codec}")
        nation.write.option("compression", codec).mode("overwrite").text(p)
        got = sorted(r["value"] for r in spark.read.text(p).collect())
        assert got == exp, codec


def test_codec_matrix_parquet(spark, tables, tmp_path):
    for codec in ["snappy", "gzip", "zstd"]:
        p = str(tmp_path / f"pq_{codec}")
        tables["region"].write.option("compression", codec).mode("overwrite").parquet(p)
        assert spark.read.parquet(p).count() == tables["region"].count(), codec


def test_codec_matrix_orc(spark, tables, tmp_path):
    """ORC roundtrip with codec matrix — the columnar sibling to the
    parquet path (RCFile's lineage in the Hive-on-hadoop-20 ecosystem
    ended up in ORC; the reference itself is row-oriented, SURVEY §1.1)."""
    exp = sorted(tables["nation"].collect())
    for codec in ["zlib", "snappy", "zstd"]:
        p = str(tmp_path / f"orc_{codec}")
        tables["nation"].write.option("compression", codec).mode("overwrite").orc(p)
        assert sorted(spark.read.orc(p).collect()) == exp, codec


def test_nline_repartition(spark, tables):
    out = sources.repartition_n_rows(tables["nation"], 5, "n_nationkey")
    sizes = out.rdd.glom().map(len).collect()
    assert sum(sizes) == 25
    assert max(sizes) <= 5


def test_write_noop_runs(spark, tables):
    sources.write_noop(tables["region"])


def test_jdbc_roundtrip_embedded_derby(spark, tables, tmp_path):
    # DBInputFormat/DBOutputFormat analog, executed for real: embedded
    # Derby ships on Spark's classpath, so write + partitioned read run
    # without any external service.
    from hadoop_20_spark import sources

    spark._jvm.System.setProperty("derby.system.home", str(tmp_path))
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    nation = tables["nation"].select("n_nationkey", "n_name")
    sources.write_jdbc(nation, url, "nation", driver=driver)
    back = sources.read_jdbc(
        spark,
        url,
        "nation",
        driver=driver,
        partitionColumn="n_nationkey",
        lowerBound=0,
        upperBound=25,
        numPartitions=4,
    )
    # paged read: 4 real splits, content identical
    assert back.rdd.getNumPartitions() == 4
    got = {(r["n_nationkey"], r["n_name"]) for r in back.collect()}
    exp = {(r["n_nationkey"], r["n_name"]) for r in nation.collect()}
    assert got == exp


def test_sequencefile_writable_matrix(spark, tables, tmp_path):
    """Beyond Text/Text: Long/Double/Bytes/null Writable payloads
    round-trip through real Hadoop SequenceFiles (IntWritable keys are
    what saveAsSequenceFile picks for Python ints; bytes go through
    BytesWritable; None through NullWritable)."""
    sc = spark.sparkContext

    # LongWritable / DoubleWritable
    p1 = str(tmp_path / "seq_long_double")
    sc.parallelize([(1, 1.5), (2, 2.25), (3, -7.0)]).saveAsSequenceFile(p1)
    assert dict(sc.sequenceFile(p1).collect()) == {1: 1.5, 2: 2.25, 3: -7.0}

    # Text / BytesWritable (binary payloads — the SequenceFileAsBinary case)
    p2 = str(tmp_path / "seq_bytes")
    payload = [("a", bytearray(b"\x00\x01\xff")), ("b", bytearray(b"spark"))]
    sc.parallelize(payload).saveAsSequenceFile(p2)
    back = {k: bytes(v) for k, v in sc.sequenceFile(p2).collect()}
    assert back == {"a": b"\x00\x01\xff", "b": b"spark"}

    # NullWritable values (key-only records)
    p3 = str(tmp_path / "seq_null")
    sc.parallelize([("k1", None), ("k2", None)]).saveAsSequenceFile(p3)
    assert dict(sc.sequenceFile(p3).collect()) == {"k1": None, "k2": None}


def test_sequencefile_explicit_writable_classes(spark, tables, tmp_path):
    """saveAsNewAPIHadoopFile with explicit Writable classes — the
    io/SequenceFile.java contract spelled out (IntWritable keys — what
    the Python converter emits for int32-range ints — and Text values),
    then read back with the matching InputFormat."""
    sc = spark.sparkContext
    path = str(tmp_path / "seq_explicit")
    pairs = tables["region"].select("r_regionkey", "r_name").rdd.map(
        lambda r: (int(r["r_regionkey"]), r["r_name"])
    )
    pairs.saveAsNewAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat",
        keyClass="org.apache.hadoop.io.IntWritable",
        valueClass="org.apache.hadoop.io.Text",
    )
    back = dict(
        sc.newAPIHadoopFile(
            path,
            "org.apache.hadoop.mapreduce.lib.input.SequenceFileInputFormat",
            keyClass="org.apache.hadoop.io.IntWritable",
            valueClass="org.apache.hadoop.io.Text",
        ).collect()
    )
    exp = {r["r_regionkey"]: r["r_name"] for r in tables["region"].collect()}
    assert back == exp


def test_nline_repartition_bulk_guard(spark, tables):
    import pytest

    from hadoop_20_spark import sources

    old = sources.NLINE_MAX_ROWS
    sources.NLINE_MAX_ROWS = 10
    try:
        with pytest.raises(ValueError):
            sources.repartition_n_rows(tables["nation"], 5, "n_nationkey")
    finally:
        sources.NLINE_MAX_ROWS = old


def test_teragen_datasource_matches_expression(spark):
    """The Python DataSource TeraGen (real custom-source API: partitions
    = getSplits, read = record reader) must produce bit-identical rows
    to the expression-based generator, at a different parallelism."""
    from hadoop_20_spark.sources.pyds import TeraGenDataSource

    spark.dataSource.register(TeraGenDataSource)
    via_ds = (
        spark.read.format("teragen")
        .option("rows", 1000)
        .option("partitions", 7)
        .load()
    )
    assert via_ds.rdd.getNumPartitions() == 7
    got = sorted(via_ds.collect())
    exp = sorted(sources.teragen(spark, 1000).collect())
    assert got == exp


def test_checksum_sink_commit_protocol(spark, tables, tmp_path):
    """Custom Python DataSource SINK: per-task write() messages roll up
    in a single driver-side commit() — the FileOutputCommitter contract.
    The manifest's totals must equal a driver-side recomputation, at any
    partitioning."""
    import json

    from hadoop_20_spark.functions import md5_long
    from hadoop_20_spark.sources.pyds import ChecksumSinkDataSource

    spark.dataSource.register(ChecksumSinkDataSource)
    manifest_path = str(tmp_path / "out" / "manifest.json")
    nation = tables["nation"].select("n_nationkey", "n_name")
    (
        nation.repartition(6)
        .write.format("checksum_sink")
        .option("path", manifest_path)
        .option("key", "n_nationkey")
        .mode("append")
        .save()
    )
    manifest = json.load(open(manifest_path))
    assert manifest["rows"] == 25
    exp = int(
        nation.select(md5_long(F.col("n_nationkey").cast("string")).alias("h"))
        # decimal sum: 25 60-bit values overflow long under ANSI
        .agg(F.sum(F.col("h").cast("decimal(38,0)")).alias("s"))
        .collect()[0]["s"]
    )
    # the sink reduces mod 2^62 per task then sums task sums mod 2^62;
    # compare mod 2^62 (sum-then-mod == mod-then-sum-then-mod)
    assert manifest["checksum"] == exp % (1 << 62)


def test_checksum_sink_abort_preserves_prior_manifest(spark, tables, tmp_path):
    """A failed LATER job must never destroy a previously committed
    manifest (abort is a no-op — FileOutputCommitter abort cleans
    attempt-scoped output only)."""
    import json

    from hadoop_20_spark.sources.pyds import ChecksumSinkDataSource, _ChecksumWriter

    spark.dataSource.register(ChecksumSinkDataSource)
    manifest_path = str(tmp_path / "out" / "manifest.json")
    nation = tables["nation"].select("n_nationkey", "n_name")
    (
        nation.write.format("checksum_sink")
        .option("path", manifest_path)
        .option("key", "n_nationkey")
        .mode("append")
        .save()
    )
    before = json.load(open(manifest_path))
    # simulate a failed second job's abort path directly
    _ChecksumWriter({"path": manifest_path, "key": "n_nationkey"}).abort([])
    assert json.load(open(manifest_path)) == before


def test_teragen_datasource_zero_rows(spark):
    from hadoop_20_spark.sources.pyds import TeraGenDataSource

    spark.dataSource.register(TeraGenDataSource)
    df = spark.read.format("teragen").option("rows", 0).load()
    assert df.count() == 0


def test_orc_roundtrip_with_codecs(spark, tables, tmp_path):
    """ORC interop (the Hive-era columnar sibling Spark ships in-box):
    write/read round-trip conserves counts and checksums across the
    codec matrix, and predicate pushdown reaches the ORC scan."""
    from hadoop_20_spark.plans import physical_plan, validate_conservation

    o = tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    for codec in ["snappy", "zlib", "zstd"]:
        p = str(tmp_path / f"orc_{codec}")
        o.write.option("compression", codec).mode("overwrite").orc(p)
        back = spark.read.orc(p)
        assert validate_conservation(o, back, "o_totalprice"), codec
    q = spark.read.orc(str(tmp_path / "orc_snappy")).where("o_orderkey < 100")
    assert "PushedFilters" in physical_plan(q)

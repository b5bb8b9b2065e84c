from pyspark.sql import functions as F

from hadoop_20_spark import sources, streaming
from hadoop_20_spark.plans import validate_global_order
from tests.conftest import SF_DIR


def test_generate_kv_partition_invariant(spark):
    """RandomWriter analog must be identical at any parallelism (unlike a
    seeded RNG whose stream is partition-dependent)."""
    a = sorted(sources.generate_kv(spark, 100).collect())
    b = sorted(sources.generate_kv(spark, 100).repartition(7).collect())
    assert a == b
    assert len({r["key"] for r in a}) == 100  # no collisions at this size


def test_generate_text_shape(spark):
    out = sources.generate_text(spark, 50, words_per_row=10, vocab=100)
    rows = out.collect()
    assert all(len(r["text"].split()) == 10 for r in rows)
    toks = {t for r in rows for t in r["text"].split()}
    assert all(t.startswith("w") and t[1:].isdigit() for t in toks)


def test_teragen_terasort_validate(spark):
    g = sources.teragen(spark, 5000)
    assert g.count() == 5000
    row = g.first()
    assert len(row["key"]) == 10 and len(row["payload"]) == 90
    sorted_g = g.orderBy("key", "id")
    assert validate_global_order(sorted_g, "key", "id")


def test_distcp(spark, tables, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    tables["orders"].write.parquet(src)
    n = sources.distcp(spark, src, dst)
    assert n == tables["orders"].count()
    assert spark.read.parquet(dst).subtract(spark.read.parquet(src)).count() == 0


def test_stateful_running_totals(spark):
    """applyInPandasWithState accumulates across microbatches; final
    per-user totals must equal the batch aggregate."""
    stream = streaming.read_events_stream(spark, SF_DIR)
    out = streaming.stateful_running_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_stateful")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # in update mode the memory sink appends each emitted update; the
    # final state per user is the row with the max n_events
    got = (
        spark.table("t_stateful")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    from hadoop_20_spark.catalog import load_table

    exp = (
        load_table(spark, "events", SF_DIR)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    g = {r["user_id"]: r["n_events"] for r in got.collect()}
    e = {r["user_id"]: r["n_events"] for r in exp.collect()}
    assert g == e


def test_stateful_idle_key_timeout_expires_state(spark, tmp_path):
    """EventTimeTimeout: a key idle past the timeout (in event time,
    relative to the watermark) is emitted with expired=true and its
    state REMOVED — state size tracks the active working set, not
    all-time key cardinality."""
    import glob
    import os
    import shutil
    from datetime import datetime

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    schema = "user_id long, value double, ts timestamp"

    def write_file(tag, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / tag)
        )

    def stage(tag):
        part = glob.glob(str(tmp_path / tag / "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{tag}.parquet"))

    t = lambda h, m=0: datetime(2024, 1, 1, h, m)  # noqa: E731
    write_file("f1", [(1, 10.0, t(10)), (1, 5.0, t(10, 5))])
    write_file("f2", [(2, 7.0, t(12))])  # watermark -> 12:00
    write_file("f3", [(1, 1.0, t(13))])  # user 1 returns after expiry

    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming.stateful_running_totals(
        stream, idle_timeout_ms=3_600_000  # 1h of event time
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_sft")
        .start()
    )
    stage("f1")
    q.processAllAvailable()  # user 1 accumulates; timeout at 11:05
    stage("f2")
    q.processAllAvailable()  # watermark 12:00 > 11:05 -> user 1 expires
    stage("f3")
    q.processAllAvailable()  # user 1 restarts FROM ZERO
    q.stop()

    rows = spark.table("t_sft").collect()
    expired = [r for r in rows if r["expired"]]
    assert any(r["user_id"] == 1 and r["n_events"] == 2 for r in expired)
    # post-expiry, user 1's totals restart from scratch (state removed)
    restarted = [
        r for r in rows if r["user_id"] == 1 and not r["expired"] and r["n_events"] == 1
    ]
    assert restarted and restarted[0]["total_value"] == 1.0

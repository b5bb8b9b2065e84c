import glob

from pyspark.sql import functions as F

from hadoop_20_spark import streaming
from hadoop_20_spark.catalog import load_table
from tests.conftest import SF_DIR


def test_tumbling_agg_matches_batch(spark):
    stream = streaming.read_events_stream(spark, SF_DIR)
    got = streaming.run_to_memory(
        streaming.tumbling_agg(stream, "1 hour"), "t_tumbling"
    )
    batch = (
        load_table(spark, "events", SF_DIR)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    g = {(r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    assert g == b


def test_session_agg_runs(spark):
    stream = streaming.read_events_stream(spark, SF_DIR)
    got = streaming.run_to_memory(streaming.session_agg(stream, "30 minutes"), "t_sess")
    assert got.count() > 0
    # session invariant: end >= start
    assert got.filter(F.col("session_end") < F.col("session_start")).count() == 0


def test_stream_dedup(spark):
    stream = streaming.read_events_stream(spark, SF_DIR)
    deduped = streaming.stream_dedup(stream)
    got = streaming.run_append_to_memory(deduped, "t_dedup")
    n_events = load_table(spark, "events", SF_DIR).count()
    assert got.count() == n_events  # event_id already unique
    assert got.select("event_id").distinct().count() == n_events


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    out = str(tmp_path / "sink")
    stream = streaming.read_events_stream(spark, SF_DIR)
    writer = streaming.foreach_batch_idempotent_sink(stream, out, "event_type")
    q = writer.start()
    q.processAllAvailable()
    q.stop()
    assert glob.glob(out + "/event_type=*")
    back = spark.read.parquet(out)
    assert back.count() == load_table(spark, "events", SF_DIR).count()

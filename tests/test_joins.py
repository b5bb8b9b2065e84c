from pyspark.sql import functions as F

from hadoop_20_spark.operators import joins


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["k", "name", "val"])


def test_override_join_rightmost_wins(spark):
    a = _mk(spark, [(1, "a1", 10.0), (2, "a2", 20.0)])
    b = _mk(spark, [(2, "b2", 200.0), (3, "b3", 300.0)])
    out = {r["k"]: r for r in joins.override_join([a, b], "k").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["name"] == "a1"          # only in left
    assert out[2]["name"] == "b2"          # both -> rightmost wins
    assert out[3]["name"] == "b3"          # only in right


def test_override_join_three_sources(spark):
    a = _mk(spark, [(1, "a", 1.0)])
    b = _mk(spark, [(1, "b", 2.0)])
    c = _mk(spark, [(1, "c", 3.0), (2, "c2", 4.0)])
    out = {r["k"]: r["name"] for r in joins.override_join([a, b, c], "k").collect()}
    assert out == {1: "c", 2: "c2"}


def test_override_schema_mismatch_rejected(spark):
    a = _mk(spark, [(1, "a", 1.0)])
    bad = spark.createDataFrame([(1, "x")], ["k", "name"])
    try:
        joins.override_join([a, bad], "k")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_semi_anti(spark, tables):
    c = tables["customer"]
    o = tables["orders"].select(F.col("o_custkey").alias("c_custkey"))
    semi = joins.semi_join(c, o, "c_custkey").count()
    anti = joins.anti_join(c, o, "c_custkey").count()
    assert semi + anti == c.count()
    # semi keeps left schema untouched
    assert joins.semi_join(c, o, "c_custkey").columns == c.columns


def test_compose_dsl(spark):
    a = spark.createDataFrame([(1, "a")], ["k", "x"])
    b = spark.createDataFrame([(1, "b")], ["k", "y"])
    out = joins.compose("inner(a, b)", {"a": a, "b": b}, "k")
    assert out.count() == 1
    assert set(out.columns) == {"k", "x", "y"}


def test_compose_override(spark):
    a = _mk(spark, [(1, "a", 1.0)])
    b = _mk(spark, [(1, "b", 2.0)])
    out = joins.compose("override(a, b)", {"a": a, "b": b}, "k").collect()
    assert out[0]["name"] == "b"


def test_broadcast_join_plan(spark, tables):
    from hadoop_20_spark.plans import assert_broadcast_join

    out = joins.join(
        tables["customer"],
        tables["nation"].select(F.col("n_nationkey").alias("c_nationkey"), "n_name"),
        "c_nationkey",
        broadcast_right=True,
    )
    assert_broadcast_join(out)

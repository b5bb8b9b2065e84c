from pyspark.sql import functions as F

from hadoop_20_spark.operators import aggregate as agg_ops
from hadoop_20_spark.operators import joins


def test_salted_join_matches_plain(spark, tables):
    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    o = tables["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    plain = li.join(o, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    salted = joins.salted_join(li, o, "l_orderkey", salt=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    assert (plain["n"], round(plain["q"], 6)) == (salted["n"], round(salted["q"], 6))


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "v"])
    right = spark.createDataFrame([(1, "r")], ["k", "rv"])
    out = joins.salted_join(left, right, "k", how="left", salt=4).collect()
    got = {r["v"]: r["rv"] for r in out}
    assert got == {"a": "r", "b": None}
    assert len(out) == 2  # replication must not duplicate left rows


def test_two_phase_agg_matches_direct(spark, tables):
    li = tables["lineitem"]
    direct = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    two = {
        r["l_returnflag"]: r
        for r in agg_ops.two_phase_agg(li, ["l_returnflag"], ["l_quantity"]).collect()
    }
    for k, d in direct.items():
        assert two[k]["sum_l_quantity"] == d["s"]  # bit-identical via decimal
        assert two[k]["n_rows"] == d["n"]


def test_salted_join_rejects_outer_modes(spark):
    import pytest

    from hadoop_20_spark.operators import joins

    left = spark.createDataFrame([(1, "a")], ["k", "v"])
    right = spark.createDataFrame([(2, "x")], ["k", "w"])
    for how in ("right", "full"):
        with pytest.raises(ValueError):
            joins.salted_join(left, right, "k", how=how, salt=4)

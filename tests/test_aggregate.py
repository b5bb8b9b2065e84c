import math

from pyspark.sql import functions as F

from hadoop_20_spark.operators import aggregate as agg_ops


def test_descriptor_dsl_matches_direct(spark, tables):
    li = tables["lineitem"]
    got = {
        r["l_returnflag"]: r
        for r in agg_ops.aggregate(
            li, ["l_returnflag"], ["LongValueSum:l_linenumber", "UniqValueCount:l_suppkey"]
        ).collect()
    }
    exp = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_linenumber").alias("s"),
            F.countDistinct("l_suppkey").alias("u"),
        )
        .collect()
    }
    for k in exp:
        assert got[k]["longvaluesum_l_linenumber"] == exp[k]["s"]
        assert got[k]["uniqvaluecount_l_suppkey"] == exp[k]["u"]


def test_unknown_descriptor():
    try:
        agg_ops._descriptor_to_column("Bogus:x")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_value_histogram_vs_pandas(spark, tables):
    out = {
        r["o_orderpriority"]: r
        for r in agg_ops.value_histogram(
            tables["orders"], "o_orderpriority", "o_custkey"
        ).collect()
    }
    pdf = tables["orders"].select("o_orderpriority", "o_custkey").toPandas()
    for key, grp in pdf.groupby("o_orderpriority"):
        freqs = grp.groupby("o_custkey").size()
        r = out[key]
        assert r["n_distinct_values"] == len(freqs)
        assert r["min_freq"] == freqs.min()
        assert r["max_freq"] == freqs.max()
        # operator rounds to 6dp (determinism convention)
        assert math.isclose(r["avg_freq"], freqs.mean(), abs_tol=1e-6)
        assert math.isclose(r["stddev_freq"], freqs.std(ddof=0), abs_tol=1e-6)


def test_exact_sum_double_deterministic(spark, tables):
    li = tables["lineitem"]
    a = li.agg(agg_ops.exact_sum_double("l_extendedprice").alias("s")).collect()[0]["s"]
    b = (
        li.repartition(17)
        .agg(agg_ops.exact_sum_double("l_extendedprice").alias("s"))
        .collect()[0]["s"]
    )
    assert a == b  # bit-identical under any partitioning


def test_with_counters_observe(spark, tables):
    df, obs = agg_ops.with_counters(
        tables["lineitem"],
        n_rows=F.count(F.lit(1)),
        total_qty=F.sum("l_quantity"),
    )
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == tables["lineitem"].count()

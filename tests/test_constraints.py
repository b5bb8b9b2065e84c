"""Declarative constraint verifier: failing checks must fail, metrics
must be exact, and the wide-agg compilation must keep to one scan."""

from pyspark.sql import functions as F

from hadoop_20_spark.operators import constraints as C


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (2, None, 30.0), (4, "d", -5.0)],
        "id long, name string, val double",
    )


def test_verify_metrics_and_verdicts(spark):
    checks = [
        C.Check("name_complete", "completeness", "name"),            # 3/4 -> fail
        C.Check("name_mostly", "completeness", "name",
                threshold_ppm=700_000),                              # 0.75 >= 0.7 -> pass
        C.Check("id_unique", "key_uniqueness", "id"),                # 3 distinct / 4 -> fail
        C.Check("id_distinctness", "distinctness", "id",
                threshold_ppm=750_000),                              # 3/4 -> pass
        C.Check("val_min", "min_at_least", "val", bound=0.0),        # -5 -> fail
        C.Check("val_max", "max_at_most", "val", bound=30.0),        # 30 <= 30 -> pass
        C.Check("val_mean", "mean_between", "val",
                bound=10.0, bound_hi=20.0),                          # 13.75 -> pass
        C.Check("name_domain", "isin", "name", allowed=("a", "b")),  # 2/3 -> fail
        C.Check("name_format", "matches", "name", pattern="^[a-d]$"),# 3/3 -> pass
        C.Check("size", "size_at_least", bound=5),                   # 4 < 5 -> fail
    ]
    rep = {r["check_name"]: r for r in C.verify(_df(spark), checks, "t").collect()}
    assert len(rep) == len(checks)
    expect = {
        "name_complete": (0.75, 0), "name_mostly": (0.75, 1),
        "id_unique": (0.75, 0), "id_distinctness": (0.75, 1),
        "val_min": (-5.0, 0), "val_max": (30.0, 1),
        "val_mean": (13.75, 1), "name_domain": (0.666667, 0),
        "name_format": (1.0, 1), "size": (4.0, 0),
    }
    for name, (metric, passed) in expect.items():
        r = rep[name]
        assert abs(r["metric"] - metric) < 1e-9, (name, r)
        assert r["passed"] == passed, (name, r)
        assert r["table_name"] == "t"


def test_verify_single_scan(spark):
    """However many checks, the compiled plan reads the source ONCE
    (count-distinct mixes go through Expand, never a second scan)."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.col("id").cast("double").alias("v")
    )
    checks = [
        C.Check("a", "completeness", "k"),
        C.Check("b", "key_uniqueness", "id"),
        C.Check("c", "distinctness", "k"),
        C.Check("d", "mean_between", "v", bound=0.0, bound_hi=100.0),
        C.Check("e", "size_at_least", bound=1),
    ]
    plan = C.verify(df, checks, "t")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") <= 1, plan


def test_referential_check_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = C.referential_check(child, parent, "fk", "pk", "fk_ok", "child").collect()[0]
    assert r["metric"] == 1.0 and r["passed"] == 0

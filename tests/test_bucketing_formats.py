from pyspark.sql import functions as F

from hadoop_20_spark import sources


def test_bucketed_join_no_shuffle(spark, tables):
    """CompositeInputFormat's zero-shuffle merge join, reproduced via
    bucketed+sorted tables: the join plan must contain no Exchange."""
    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    o = tables["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    sources.write_bucketed(li, "b_lineitem", 8, "l_orderkey")
    sources.write_bucketed(o, "b_orders", 8, "l_orderkey")
    a = spark.table("b_lineitem")
    b = spark.table("b_orders")
    # disable auto-broadcast: at 100 TB neither side of a fact-fact join
    # broadcasts, which is exactly when bucketing pays off
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "l_orderkey")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == li.join(o, "l_orderkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_read_delimited(spark, tmp_path):
    p = tmp_path / "recs"
    p.mkdir()
    (p / "data.txt").write_text("rec1||rec2||rec3")
    out = [r["value"] for r in sources.read_delimited(spark, str(p), "||").collect()]
    assert out == ["rec1", "rec2", "rec3"]


def test_read_xml_records(spark, tmp_path):
    p = tmp_path / "xml"
    p.mkdir()
    (p / "data.xml").write_text(
        "<root><item><id>1</id><name>alpha</name></item>"
        "<item><id>2</id><name>beta</name></item></root>"
    )
    out = sources.read_xml_records(
        spark, str(p), "item", "id INT, name STRING"
    ).collect()
    got = {(r["id"], r["name"]) for r in out}
    assert got == {(1, "alpha"), (2, "beta")}


def test_read_fixed_width(spark, tmp_path):
    p = tmp_path / "fw"
    p.mkdir()
    (p / "data.txt").write_text("AAAA0001xx\nBBBB0002yy\n")
    out = sources.read_fixed_width(
        spark, str(p), {"key": 4, "num": 4, "tail": 2}
    ).collect()
    got = {(r["key"], r["num"], r["tail"]) for r in out}
    assert got == {("AAAA", "0001", "xx"), ("BBBB", "0002", "yy")}

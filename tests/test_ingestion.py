"""parse_csv_quarantine (the SkipBadRecords analog) and its registry query."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_20_spark import sources
from hadoop_20_spark.queries import REGISTRY

from conftest import SF_DIR

_SCHEMA = "k bigint, c bigint, p decimal(12,2), d date, pr string"


def _parse(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    return sources.parse_csv_quarantine(df, "line", _SCHEMA)


def test_quarantine_contract(spark):
    """The documented PERMISSIVE contract: arity/type failures set
    _corrupt (raw line verbatim) but keep parseable fields; an empty
    field is a legal NULL, not corruption."""
    rows = {r["line"]: r for r in _parse(spark, [
        "1,10,99.50,1996-01-02,HIGH",
        "2,20,99.50x,1996-01-03,LOW",
        "3,30,12.00",
        "4,40,13.00,1996-01-04,MED,EXTRA",
        "5,,14.00,1996-01-05,MED",
    ]).collect()}
    ok = rows["1,10,99.50,1996-01-02,HIGH"]
    assert ok["_corrupt"] is None and ok["k"] == 1 and str(ok["p"]) == "99.50"
    bad_num = rows["2,20,99.50x,1996-01-03,LOW"]
    assert bad_num["_corrupt"] == "2,20,99.50x,1996-01-03,LOW"  # verbatim
    assert bad_num["p"] is None and bad_num["c"] == 20  # other fields kept
    short = rows["3,30,12.00"]
    assert short["_corrupt"] is not None and str(short["p"]) == "12.00"
    long_ = rows["4,40,13.00,1996-01-04,MED,EXTRA"]
    assert long_["_corrupt"] is not None and long_["pr"] == "MED"
    empty = rows["5,,14.00,1996-01-05,MED"]
    assert empty["_corrupt"] is None and empty["c"] is None  # NULL, not bad


def test_quarantine_is_lossless(spark):
    """Quarantine routing never drops rows: ok + quarantined == input,
    and every quarantined raw line equals its input line."""
    lines = [f"{i},{i * 7},{i}.25,1996-01-02,X" if i % 3 else f"{i},oops"
             for i in range(1, 61)]
    parsed = _parse(spark, lines).persist()
    try:
        n_ok = parsed.filter(F.col("_corrupt").isNull()).count()
        n_bad = parsed.filter(F.col("_corrupt").isNotNull()).count()
        assert n_ok + n_bad == len(lines)
        assert n_bad == 20
        mismatched = parsed.filter(
            F.col("_corrupt").isNotNull() & (F.col("_corrupt") != F.col("line"))
        ).count()
        assert mismatched == 0
    finally:
        parsed.unpersist()


def test_bad_record_quarantine_classes(spark):
    """The registry query emits exactly the 4 planted classes + ok, each
    class non-empty at sf0.001, with every order accounted for."""
    out = {r["err_class"]: r for r in
           REGISTRY["bad_record_quarantine"].fn(spark, SF_DIR).collect()}
    assert set(out) == {"ok", "arity_short", "arity_long", "bad_number", "bad_date"}
    from hadoop_20_spark import load_table
    n_orders = load_table(spark, "orders", SF_DIR).count()
    assert sum(r["n_rows"] for r in out.values()) == n_orders
    # salvage works even on quarantined rows: keys present in every class
    assert all(r["min_key"] is not None for r in out.values())
    # price recovered everywhere except the mangled-number class has fewer
    assert out["bad_number"]["recovered_value"] is None
    assert out["arity_short"]["recovered_value"] is not None


def test_publish_atomic_single_winner(tmp_path):
    """Two racing builders: exactly one publishes, the loser's private
    dir is cleaned up, and the published content is complete."""
    import os
    import threading

    from hadoop_20_spark.queries.ingestion import _publish_atomic

    target = str(tmp_path / "state")
    barrier = threading.Barrier(2)

    def builder(tag):
        def build(d):
            os.makedirs(d)
            barrier.wait()  # both builds in flight simultaneously
            with open(os.path.join(d, "content"), "w") as fh:
                fh.write("deterministic")

        _publish_atomic(build, target)

    ts = [threading.Thread(target=builder, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert os.path.isdir(target)
    assert open(os.path.join(target, "content")).read() == "deterministic"
    leftovers = [d for d in os.listdir(tmp_path) if ".build." in d]
    assert leftovers == [], leftovers

import re

from pyspark.sql import functions as F

from hadoop_20_spark.operators import rowops


def test_parse_field_spec():
    assert rowops.parse_field_spec("0-2,4,6-") == [(0, 2), (4, 4), (6, None)]
    assert rowops.parse_field_spec("3") == [(3, 3)]
    assert rowops.parse_field_spec("-2") == [(0, 2)]


def test_field_selection(spark):
    df = spark.createDataFrame([("a\tb\tc\td",)], ["line"])
    out = rowops.field_selection(df, "line", "0-1", "2-").collect()[0]
    assert out["key"] == "a\tb"
    assert out["value"] == "c\td"


def test_field_selection_open_ended_key(spark):
    df = spark.createDataFrame([("x\ty\tz",)], ["line"])
    out = rowops.field_selection(df, "line", "1-", "0").collect()[0]
    assert out["key"] == "y\tz"
    assert out["value"] == "x"


def test_grep_matches_python(spark, tables):
    pattern = "[a-z]+er"
    rows = tables["documents"].select("text").collect()
    expected: dict[str, int] = {}
    for r in rows:
        for m in re.findall(pattern, r["text"]):
            expected[m] = expected.get(m, 0) + 1
    got = {
        r["match"]: r["match_count"]
        for r in rowops.grep(tables["documents"], "text", pattern).collect()
    }
    assert got == expected


def test_token_counts_total(spark, tables):
    total_tokens = tables["documents"].select(
        F.sum(F.size(F.split(F.col("text"), r"\s+"))).alias("n")
    ).collect()[0]["n"]
    counted = rowops.token_counts(tables["documents"], "text").agg(
        F.sum("token_count").alias("n")
    ).collect()[0]["n"]
    assert counted == total_tokens  # no empty tokens in fixture text


def test_inverse_and_chain(spark):
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    assert rowops.inverse(df, "k", "v").columns == ["v", "k"]
    out = rowops.chain(
        df,
        lambda d: d.withColumn("k2", F.col("k") * 2),
        lambda d: d.filter(F.col("k2") == 2),
    )
    assert out.count() == 1


def test_lang_id_multiclass(spark):
    # With multi-language profiles, function-word-bearing text routes to
    # the right class; profile-free text falls back to unknown.
    from hadoop_20_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            ("e", "the cat is on the mat and the dog is in the house"),
            ("f", "le chat est dans la maison et les chiens sont sur le toit"),
            ("d", "der hund ist in dem haus und die katze ist auf der couch"),
            ("s", "el gato es de la casa y los perros son del parque"),
            ("x", "zzz qqq www rrr ttt yyy"),
        ],
        ["k", "txt"],
    )
    got = {
        r["k"]: r["lang"]
        for r in df.select(
            "k", text_ops.lang_id("txt", profiles=text_ops.LANG_PROFILES).alias("lang")
        ).collect()
    }
    assert got == {"e": "en", "f": "fr", "d": "de", "s": "es", "x": "unknown"}


def test_lang_id_default_matches_legacy(spark, tables):
    # Default single-profile call must preserve the en/unknown contract
    # the text_stats oracle encodes.
    from hadoop_20_spark.operators import text as text_ops
    from pyspark.sql import functions as F

    docs = tables["documents"].select("doc_id", "text").limit(50)
    legacy = docs.select(
        F.when(text_ops.stopword_ratio("text") >= 0.05, F.lit("en"))
        .otherwise(F.lit("unknown"))
        .alias("l")
    )
    new = docs.select(text_ops.lang_id("text").alias("l"))
    assert [r["l"] for r in legacy.collect()] == [r["l"] for r in new.collect()]


def test_chunk_documents_tiling(spark, tables):
    # Chunks tile the doc: stride 48, full chunks 64 tokens, tail kept;
    # reconstructing from non-overlap prefixes yields the original.
    from hadoop_20_spark.operators import text as text_ops
    from pyspark.sql import functions as F

    docs = tables["documents"].select("doc_id", "text").limit(20)
    chunks = text_ops.chunk_documents(docs, "doc_id", "text", 64, 16)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
         for r in chunks.collect())
    )
    orig = {
        r["doc_id"]: r["text"].split() for r in docs.collect()
    }
    from collections import defaultdict

    per_doc = defaultdict(list)
    for did, cid, n, txt in rows:
        per_doc[did].append((cid, n, txt.split() if txt else []))
    for did, cs in per_doc.items():
        toks = orig[did]
        assert [c[0] for c in cs] == list(range(len(cs)))  # dense ids
        for cid, n, ctoks in cs:
            assert ctoks == toks[cid * 48 : cid * 48 + 64]
            assert n == len(ctoks)
        # every token position covered
        assert cs[-1][0] * 48 + cs[-1][1] >= len(toks)


def test_stratified_sample_deterministic(spark, tables):
    from hadoop_20_spark.operators import text as text_ops

    docs = tables["documents"].select("doc_id", "lang")
    rates = {"en": 0.5, "zh": 0.0}
    a = {r["doc_id"] for r in text_ops.stratified_sample(docs, "doc_id", "lang", rates).collect()}
    b = {r["doc_id"] for r in text_ops.stratified_sample(docs.repartition(17), "doc_id", "lang", rates).collect()}
    assert a == b
    langs = {r["lang"] for r in text_ops.stratified_sample(docs, "doc_id", "lang", rates).collect()}
    assert "zh" not in langs  # rate 0 and default 0 exclude everything else
    assert langs <= {"en"}


def test_pandas_udf_norm_matches_builtin_within_tolerance(spark, tables):
    """Scalar pandas_udf (numpy kernel over Arrow batches) vs the
    builtin sequential-sum expression: equal to float tolerance, NOT
    bit-exact (numpy's pairwise summation reorders additions) — which
    is exactly why pandas_udf kernels stay OFF exact-oracle paths."""
    from pyspark.sql import functions as F

    from hadoop_20_spark.operators.udx import embedding_norm_pudf

    emb = tables["embeddings"].limit(200)
    l2 = embedding_norm_pudf()
    builtin = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    rows = emb.select(
        l2(F.col("embedding")).alias("pudf"), builtin.alias("ref")
    ).collect()
    assert rows
    for r in rows:
        assert abs(r["pudf"] - r["ref"]) <= 1e-12 * max(1.0, abs(r["ref"]))

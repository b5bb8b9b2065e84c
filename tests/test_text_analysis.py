

def test_winnowing_shared_substring_guarantee(spark):
    """The winnowing guarantee (SIGMOD'03): any shared token run of at
    least k + window - 1 tokens yields at least one shared fingerprint."""
    from hadoop_20_spark.operators.text import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = k+w-1 (3+4-1)
    df = spark.createDataFrame(
        [
            (1, f"one two {shared} three four"),
            (2, f"nine eight seven {shared} six"),
            (3, "totally different words with no common run at all here"),
        ],
        ["doc_id", "text"],
    )
    fps = winnowing_fingerprints(df, "doc_id", "text", k=3, window=4)
    d = {}
    for r in fps.collect():
        d.setdefault(r["doc_id"], set()).add(r["fp"])
    assert d[1] & d[2], "docs sharing a 6-token run must share a fingerprint"
    # compression: fewer fingerprints than k-grams
    n_grams = len(df.collect()[0]["text"].split()) - 2
    assert len(d[1]) <= n_grams


def test_winnowing_deterministic_under_repartition(spark, tables):
    from hadoop_20_spark.operators.text import winnowing_fingerprints

    docs = tables["documents"].select("doc_id", "text")
    a = sorted(map(tuple, winnowing_fingerprints(docs, "doc_id", "text").collect()))
    b = sorted(
        map(
            tuple,
            winnowing_fingerprints(docs.repartition(13), "doc_id", "text").collect(),
        )
    )
    assert a == b


def test_label_outliers_deterministic_and_ranked(spark, tables):
    from hadoop_20_spark.operators.similarity import label_centroid_outliers

    emb = tables["embeddings"]
    a = label_centroid_outliers(emb, k=3).collect()
    b = label_centroid_outliers(emb.repartition(17), k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_label = {}
    for r in a:
        by_label.setdefault(r["label"], []).append(r)
    for rows in by_label.values():
        rows.sort(key=lambda r: r["outlier_rank"])
        assert [r["outlier_rank"] for r in rows] == list(range(1, len(rows) + 1))
        # ranks follow ascending centroid cosine (least central first)
        cos = [r["centroid_cos"] for r in rows]
        assert cos == sorted(cos)

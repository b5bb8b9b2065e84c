"""Inverted (positional) index build + phrase retrieval.

Reference analog: ``src/contrib/index`` — hadoop-20 shipped a MapReduce
Lucene index builder (one shard per reducer, documents mapped to
(term, posting) pairs, reducers merging postings into index shards).
Here the same structure is a relational aggregate: postings are rows
``(term, doc_id, positions, tf)`` produced by ONE term-doc shuffle, and
a phrase query is a k-way postings merge expressed as k-1 doc-keyed
joins plus row-local positional-adjacency array logic — no scan of the
corpus at query time.

100 TB posture: persist postings parquet bucketed/partitioned by term
(the per-reducer shard layout) so each query term's postings are a
partition-pruned point read; the doc-keyed merge joins tiny per-term
relations, never the corpus.  The build is the expensive pass and runs
once per ingest batch — exactly the contrib/index job's economics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_20_spark.functions import md5_bucket, tokens


def inverted_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Positional postings: one row per (term, doc) with the sorted
    in-document positions (0-based) and term frequency.  ONE
    partial-agg'd (term, doc) shuffle; tokenization and position
    numbering are row-local."""
    tok = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "term")
    )
    return tok.groupBy("term", id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("positions"),
        F.count(F.lit(1)).alias("tf"),
    )


def merge_postings(
    base: DataFrame, delta: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Merge a delta batch's postings into a base index — the
    contrib/index shard-merge economics (``src/contrib/index``'s
    reducer merged new postings into persisted Lucene shards) as a
    relational operation: a document present in the delta REPLACES all
    its base postings (doc-level replacement, not per-(term, doc)
    upsert — a re-indexed doc may have LOST terms, and a row-level
    merge would leave those stale rows behind); documents absent from
    the delta keep their base postings untouched.

    ``merged == rebuilt-from-scratch`` over the effective corpus is the
    whole correctness contract (the incremental_agg_maintenance
    discipline applied to postings) — proven by the
    ``postings_delta_merge`` oracle and the equality test.

    Scale plan: ONE anti-join of the base against the delta's doc-id
    set (broadcast while the batch is small — the common case: a crawl
    batch vs a corpus index) plus a union; with term-partitioned
    persisted postings both sides stay partition-aligned and the merge
    never touches the corpus text."""
    from hadoop_20_spark.operators.joins import broadcast_if_small

    delta_docs = delta.select(id_col).distinct()
    kept = base.join(broadcast_if_small(delta_docs), id_col, "left_anti")
    # a USING join moves the key column first; restore the base schema
    # order so merged output is drop-in for the base index
    return kept.unionByName(delta).select(*base.columns)


def phrase_match(
    postings: DataFrame, phrase: Sequence[str], id_col: str = "doc_id"
) -> DataFrame:
    """Exact phrase retrieval over positional postings: start from the
    first term's positions and filter to those whose +i successor
    exists in term i's postings, for every following term — the
    classic positional-postings merge, expressed as k-1 inner joins on
    the doc id plus row-local array logic.  Returns
    ``(doc_id, n_occurrences)`` for docs containing the phrase.

    The joins are between PER-TERM relations (df(term) rows each) —
    with term-partitioned postings these are partition-pruned point
    reads; the corpus itself is never rescanned at query time."""
    if not phrase:
        raise ValueError("empty phrase")
    cur = (
        postings.where(F.col("term") == phrase[0])
        .select(F.col(id_col), F.col("positions").alias("q0"))
    )
    matched = F.col("q0")
    for i, term in enumerate(phrase[1:], start=1):
        nxt = postings.where(F.col("term") == term).select(
            F.col(id_col), F.col("positions").alias(f"q{i}")
        )
        cur = cur.join(nxt, id_col)
        qi = F.col(f"q{i}")
        # keep phrase-start positions whose i-th successor exists in
        # term i's posting list (single-parameter lambda — the pyspark
        # two-parameter dispatch trap)
        matched = _filter_adjacent(matched, qi, i)
    return (
        cur.select(F.col(id_col), F.size(matched).alias("n_occurrences"))
        .where(F.col("n_occurrences") > 0)
    )


def _filter_adjacent(starts, successors, offset: int):
    return F.filter(
        starts, lambda p: F.array_contains(successors, p + F.lit(offset))
    )


def write_postings_partitioned(
    postings: DataFrame, out_dir: str, *, buckets: int = 64
) -> None:
    """MATERIALIZE the postings index term-partitioned — the
    contrib/index shard layout (one Lucene shard per reducer) as a
    parquet directory per md5 term bucket: a query term's postings
    become a PARTITION-PRUNED point read (the scan lists only its
    bucket's files), so phrase/BM25 retrieval at 100 TB reads
    df(term)-sized data instead of touching the index.

    One repartition on the bucket key co-locates each bucket into one
    task -> one file per directory; `partitionBy` writes the
    `term_bucket=N/` layout Spark prunes statically."""
    bucketed = postings.withColumn("term_bucket", md5_bucket(F.col("term"), buckets))
    (
        bucketed.repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(out_dir)
    )


def term_bucket_py(term: str, buckets: int = 64) -> int:
    """Driver-side twin of functions.md5_bucket (same 15-hex-digit md5
    prefix arithmetic) — computes a query term's partition so the read
    filter is a LITERAL the scan prunes on."""
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16) % buckets


def read_term_postings(
    spark, out_dir: str, term: str, *, buckets: int = 64
) -> DataFrame:
    """Point-read one term's postings from the partitioned layout:
    the literal bucket predicate prunes to ONE directory at plan time
    (PartitionFilters), the term equality pushes into that bucket's
    parquet scan."""
    return (
        spark.read.parquet(out_dir)
        .where(
            (F.col("term_bucket") == F.lit(term_bucket_py(term, buckets)))
            & (F.col("term") == term)
        )
        .drop("term_bucket")
    )

"""Embedding similarity search: brute-force / SRP-LSH / IVF ANN, quantization, centroid outliers.

Split from the original single-file registry (round 4) — behavior-
identical; REGISTRY names, oracles, and notes are unchanged.  Definition
order within this module preserves the original file order (module-level
re-registrations must follow their originals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from hadoop_20_spark.functions import tokens as _fn_tokens  # noqa: F401
from hadoop_20_spark.operators import (  # noqa: F401
    aggregate as agg_ops,
    dedup,
    joins,
    rowops,
    setops,
    similarity,
    sort as sort_ops,
    text as text_ops,
)
from hadoop_20_spark.operators.aggregate import (  # noqa: F401
    exact_avg_double,
    exact_sum_double,
)
from hadoop_20_spark.queries._base import (  # noqa: F401
    _TOKENS,
    REGISTRY,
    Query,
    _sql_md5_long,
    _t,
    register,
)

@register(
    "embedding_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         scored AS (
      SELECT query_id, neighbor_id,
             (ROUND(
               list_aggregate(list_transform(range(1, 65),
                   i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)), 'sum')
               / (sqrt(list_aggregate(list_transform(range(1, 65),
                   i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, 65),
                   i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)), 'sum'))), 4) + 0) AS cosine_sim
      FROM c, q WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
    note="brute-force cosine top-k (queries broadcast = DistributedCache pattern); LSH variant = embedding_topk_lsh",
)
def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "embedding_topk_lsh",
    None,
    note="SRP-LSH bucketed ANN (4 planes × 3 tables) — approximate; rows-only check by design",
)
def embedding_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


# ---------------------------------------------------------------------------
# classic query shapes (TPC-H Q3/Q6 analogs)
# ---------------------------------------------------------------------------

@register(
    "embedding_near_dups",
    """
    WITH v AS (SELECT vec_id, embedding FROM embeddings),
         pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             (ROUND(
               list_aggregate(list_transform(range(1, 65),
                   i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')
               / (sqrt(list_aggregate(list_transform(range(1, 65),
                   i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, 65),
                   i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum'))), 4) + 0) AS cosine_sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine_sim FROM pairs WHERE cosine_sim >= 0.5
    """,
    note="embedding-cosine near-dup pairs via SRP bucket-then-verify (12 deterministic hash tables -> exact cosine); oracle is the brute-force cross join, so green proves the bucketed path loses no pair on this corpus",
)
def embedding_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default scale path: SRP candidates → exact verify — no cross
    join.  The oracle is brute-force all-pairs SQL; hash-match means the
    deterministic bucket tables recovered every qualifying pair here
    (recall semantics documented on the operator)."""
    return similarity.embedding_near_dups(
        _t(spark, sf_dir, "embeddings"), threshold=0.5
    )


def _sql_cos(a: str, b: str) -> str:
    """DuckDB cosine-similarity fragment matching similarity.cosine
    (sequential-order double sums, rounded to 4dp)."""
    def _dot(x: str, y: str) -> str:
        return (
            f"list_aggregate(list_transform(range(1, 65), "
            f"i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)), 'sum')"
        )

    return f"(ROUND({_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)})), 4) + 0)"


@register(
    "ivf_topk",
    f"""
    WITH cent AS (SELECT vec_id AS cent_id, embedding AS c_vec FROM embeddings WHERE vec_id < 16),
         corpus AS (SELECT vec_id AS neighbor_id, embedding AS n_vec FROM embeddings),
         asg AS (SELECT neighbor_id, n_vec, cent_id, {_sql_cos('n_vec', 'c_vec')} AS sim FROM corpus, cent),
         cells AS (SELECT neighbor_id, n_vec, cent_id AS cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY neighbor_id ORDER BY sim DESC, cent_id) AS rk FROM asg)
            WHERE rk = 1),
         q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
         qa AS (SELECT query_id, q_vec, cent_id, {_sql_cos('q_vec', 'c_vec')} AS sim FROM q, cent),
         qcells AS (SELECT query_id, q_vec, cent_id AS cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cent_id) AS rk FROM qa)
            WHERE rk <= 4),
         scored AS (SELECT query_id, neighbor_id, {_sql_cos('q_vec', 'n_vec')} AS cosine_sim
            FROM qcells JOIN cells USING (cell) WHERE neighbor_id <> query_id)
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
        FROM scored)
    WHERE rank <= 5
    """,
    note="IVF-style ANN: deterministic coarse quantizer (16 cells), nprobe=4 probe join — the scale path beside SRP-LSH",
)
def ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_centroids=16, nprobe=4
    )


def _kmeans_ctes(
    k: int | str, iterations: int, train_mod_sql: str | None = None
) -> str:
    """Unrolled Lloyd's-iteration CTE chain mirroring
    ``similarity.kmeans_centroids`` (fixed iteration count makes the
    'training' expressible as plain SQL): assignment by 4dp-rounded
    cosine argmax (cent_id tie-break), per-coordinate means as exact
    DECIMAL(30,10) sums / COUNT rounded to 8dp, empty cells keep their
    previous centroid.  Final centroids are ``c{iterations}``.

    ``k`` may be a SQL scalar expression string (e.g. a corpus-count
    subquery) so corpus-scaled cluster counts stay oracle-checkable at
    every scale factor."""
    train_where = ""
    if train_mod_sql is not None:
        # md5-gated training sample — the kmeans_train_mod mirror
        # (seeds in c0 stay the FULL-corpus lowest-k ids); mod == 1
        # keeps every row, so gate scales are bit-for-bit unchanged
        gate = _sql_md5_long("'kmtrain_' || CAST(vec_id AS VARCHAR)")
        train_where = f" WHERE {gate} % ({train_mod_sql}) = 0"
    parts = [
        f"v AS (SELECT vec_id, embedding FROM embeddings{train_where})",
        f"c0 AS (SELECT CAST(vec_id AS BIGINT) AS cent_id, "
        f"CAST(embedding AS DOUBLE[]) AS c_vec FROM embeddings WHERE vec_id < ({k}))",
    ]
    for i in range(iterations):
        parts.append(
            f"""a{i} AS (
      SELECT vec_id, cell FROM (
        SELECT v.vec_id, c.cent_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                   ORDER BY {_sql_cos('v.embedding', 'c.c_vec')} DESC, c.cent_id) AS rk
        FROM v, c{i} c) WHERE rk = 1)"""
        )
        parts.append(
            f"""m{i} AS (
      SELECT cell, pos,
             (ROUND(CAST(CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE) / COUNT(*), 8) + 0) AS m
      FROM (SELECT a{i}.cell, generate_subscripts(v.embedding, 1) AS pos,
                   unnest(v.embedding) AS val
            FROM a{i} JOIN v USING (vec_id))
      GROUP BY cell, pos)"""
        )
        parts.append(
            f"""c{i + 1} AS (
      SELECT old.cent_id, COALESCE(new.c_vec, old.c_vec) AS c_vec
      FROM c{i} old LEFT JOIN
           (SELECT cell AS cent_id, list(m ORDER BY pos) AS c_vec
            FROM m{i} GROUP BY cell) new USING (cent_id))"""
        )
    return ",\n    ".join(parts)


@register(
    "ivf_topk_kmeans",
    f"""
    WITH {_kmeans_ctes(16, 3)},
         cent AS (SELECT cent_id, c_vec FROM c3),
         corpus AS (SELECT vec_id AS neighbor_id, embedding AS n_vec FROM embeddings),
         asg AS (SELECT neighbor_id, n_vec, cent_id, {_sql_cos('n_vec', 'c_vec')} AS sim FROM corpus, cent),
         cells AS (SELECT neighbor_id, n_vec, cent_id AS cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY neighbor_id ORDER BY sim DESC, cent_id) AS rk FROM asg)
            WHERE rk = 1),
         q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
         qa AS (SELECT query_id, q_vec, cent_id, {_sql_cos('q_vec', 'c_vec')} AS sim FROM q, cent),
         qcells AS (SELECT query_id, q_vec, cent_id AS cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cent_id) AS rk FROM qa)
            WHERE rk <= 4),
         scored AS (SELECT query_id, neighbor_id, {_sql_cos('q_vec', 'n_vec')} AS cosine_sim
            FROM qcells JOIN cells USING (cell) WHERE neighbor_id <> query_id)
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
        FROM scored)
    WHERE rank <= 5
    """,
    note="IVF ANN over REAL k-means centroids (3 deterministic Lloyd's iterations, decimal-exact means) — the oracle unrolls the training loop as CTEs, so even the quantizer is hash-checked",
)
def ivf_topk_kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ivf_topk` with centroids from ``similarity.kmeans_centroids``:
    deterministic init (k smallest ids), 3 fixed Lloyd's iterations,
    decimal-exact per-coordinate means — the whole pipeline (training
    included) hash-matches the unrolled-SQL oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = similarity.kmeans_centroids(emb, k=16, iterations=3)
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, nprobe=4, centroids=cents
    )


def _srp_topk_oracle() -> str:
    """SRP-LSH top-k mirroring similarity.lsh_topk (4 planes × 3 tables,
    k=5, queries vec_id < 10) with the hyperplane ±1 coefficients
    embedded as literals from the same _srp_signs family."""
    from hadoop_20_spark.operators.similarity import _srp_signs

    def bkt_expr(t: int) -> str:
        terms = []
        for p in range(4):
            lits = "[" + ", ".join(str(x) for x in _srp_signs(64, 4, t)[p]) + "]"
            proj = (
                f"list_aggregate(list_transform(range(1, 65), "
                f"i -> CAST(embedding[i] AS DOUBLE) * ({lits}[i])), 'sum')"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    return f"""
    WITH bk AS (
      SELECT vec_id, embedding, 0 AS tbl, {bkt_expr(0)} AS bkt FROM embeddings
      UNION ALL SELECT vec_id, embedding, 1, {bkt_expr(1)} FROM embeddings
      UNION ALL SELECT vec_id, embedding, 2, {bkt_expr(2)} FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS q_vec, tbl, bkt FROM bk WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS n_vec, tbl, bkt FROM bk),
    cand AS (
      SELECT DISTINCT query_id, neighbor_id, q_vec, n_vec
      FROM c JOIN q USING (tbl, bkt) WHERE neighbor_id <> query_id
    ),
    scored AS (SELECT query_id, neighbor_id, {_sql_cos('q_vec', 'n_vec')} AS cosine_sim FROM cand)
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5"""


REGISTRY["embedding_topk_lsh"] = Query(
    fn=REGISTRY["embedding_topk_lsh"].fn,
    oracle=_srp_topk_oracle(),
    note="SRP-LSH bucketed ANN (4 planes × 3 tables) — deterministic given the literal hyperplane family, full oracle",
)


def _srp_stats_oracle() -> str:
    """Per-table SRP bucket occupancy with the same literal hyperplanes
    as _srp_topk_oracle."""
    from hadoop_20_spark.operators.similarity import _srp_signs

    def bkt_expr(t: int) -> str:
        terms = []
        for p in range(4):
            lits = "[" + ", ".join(str(x) for x in _srp_signs(64, 4, t)[p]) + "]"
            proj = (
                f"list_aggregate(list_transform(range(1, 65), "
                f"i -> CAST(embedding[i] AS DOUBLE) * ({lits}[i])), 'sum')"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    return f"""
    WITH bk AS (
      SELECT vec_id, 0 AS tbl, {bkt_expr(0)} AS bkt FROM embeddings
      UNION ALL SELECT vec_id, 1, {bkt_expr(1)} FROM embeddings
      UNION ALL SELECT vec_id, 2, {bkt_expr(2)} FROM embeddings
    ),
    per AS (SELECT tbl, bkt, COUNT(*) AS n FROM bk GROUP BY tbl, bkt)
    SELECT tbl, CAST(SUM(n) AS BIGINT) AS "rows", COUNT(*) AS n_buckets, MAX(n) AS max_bucket
    FROM per GROUP BY tbl ORDER BY tbl"""


@register(
    "srp_bucket_stats",
    None,  # oracle attached below (dynamic literals)
    note="SRP bucket-occupancy observability (rows / distinct buckets / max bucket per hash table) — the recall/fan-out monitor for the approximate embedding paths",
)
def srp_bucket_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.srp_bucket_stats(
        _t(spark, sf_dir, "embeddings"), n_tables=3
    ).orderBy("tbl")


REGISTRY["srp_bucket_stats"] = Query(
    fn=REGISTRY["srp_bucket_stats"].fn,
    oracle=_srp_stats_oracle(),
    note=REGISTRY["srp_bucket_stats"].note,
)


@register(
    "quantize_embeddings",
    """
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS sc
      FROM embeddings
    )
    SELECT vec_id, (ROUND(sc, 6) + 0) AS scale,
           array_to_string(
             CASE WHEN sc > 0
                  THEN list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / sc * 127) AS INT))
                  ELSE list_transform(embedding, x -> 0) END, '|') AS qvec
    FROM s ORDER BY vec_id
    """,
    note="symmetric int8 embedding quantization (scale = max|x|, q = round(x/scale*127)) — the 4x storage cut before ANN serving; row-local, zero shuffle",
)
def quantize_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry boundary serializes the int8 vector with '|' (list cells
    are unhashable in the driver's canonicalizer); the operator itself
    (similarity.quantize_embeddings) keeps the real array column."""
    out = similarity.quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return out.withColumn(
        "qvec", F.concat_ws("|", F.col("qvec").cast("array<string>"))
    ).orderBy("vec_id")


@register(
    "label_outliers",
    """
    WITH pos AS (
      SELECT vec_id, label, ord, CAST(embedding[ord] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(ord)
    ),
    cent AS (
      SELECT label, ord,
             CAST(CAST(SUM(CAST(val AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS c
      FROM pos GROUP BY label, ord
    ),
    scored AS (
      SELECT p.vec_id, p.label,
             CAST(CAST(SUM(CAST(p.val * c.c AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS dot,
             CAST(CAST(SUM(CAST(p.val * p.val AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS nv,
             CAST(CAST(SUM(CAST(c.c * c.c AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS nc
      FROM pos p JOIN cent c ON c.label = p.label AND c.ord = p.ord
      GROUP BY p.vec_id, p.label
    ),
    r AS (
      SELECT vec_id, label, (ROUND(dot / (sqrt(nv) * sqrt(nc)), 6) + 0) AS centroid_cos,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY (ROUND(dot / (sqrt(nv) * sqrt(nc)), 6) + 0), vec_id) AS outlier_rank
      FROM scored
    )
    SELECT vec_id, label, centroid_cos, outlier_rank
    FROM r WHERE outlier_rank <= 5 ORDER BY label, outlier_rank
    """,
    note="embedding outlier detection: cosine to own-label mean centroid, bottom-5 per label (mislabel/off-distribution curation)",
)
def label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.label_centroid_outliers(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", "label", k=5
    ).orderBy("label", "outlier_rank")


def _quantized_topk_oracle() -> str:
    """Quantize (the quantize_embeddings formula) then brute-force
    cosine top-5 over the int8 vectors — the serving-path check."""
    qz = """
      SELECT vec_id,
             CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
                  THEN list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE)
                                 / list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) * 127) AS INT))
                  ELSE list_transform(embedding, x -> 0) END AS qv
      FROM embeddings"""
    return f"""
    WITH qz AS ({qz}),
    q AS (SELECT vec_id AS query_id, qv AS q_vec FROM qz WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, qv AS n_vec FROM qz),
    scored AS (
      SELECT query_id, neighbor_id, {_sql_cos('q_vec', 'n_vec')} AS cosine_sim
      FROM c, q WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5"""


@register(
    "quantized_topk",
    None,  # oracle attached below (built from the shared cosine fragment)
    note="top-5 cosine retrieval over int8-quantized vectors (the post-quantization serving path): integer dots are exact in doubles, so both engines agree bit-for-bit",
)
def quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantization→serving round trip: quantize (symmetric int8,
    row-local), then brute-force cosine top-5 over the QUANTIZED
    vectors.  Cosine is scale-invariant, so per-vector scales drop out
    and the int8 vectors retrieve directly; every product
    (≤127²·64 ≈ 10⁶) is exactly representable in doubles, making the
    approximate path itself engine-deterministic.  Same plan as
    embedding_topk: broadcast query set, corpus never shuffles,
    per-query WindowGroupLimit."""
    q = similarity.quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    qd = q.select(
        "vec_id", F.col("qvec").cast("array<double>").alias("embedding")
    )
    return similarity.cosine_topk(
        qd, qd.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5
    )


REGISTRY["quantized_topk"] = Query(
    fn=REGISTRY["quantized_topk"].fn,
    oracle=_quantized_topk_oracle(),
    note=REGISTRY["quantized_topk"].note,
)



# --- round-4 widening -------------------------------------------------------


@register(
    "knn_label_agreement",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS own_label FROM embeddings),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS nb_label FROM embeddings),
         scored AS (
           SELECT query_id, own_label, neighbor_id, nb_label,
                  {_sql_cos('qv', 'cv')} AS cosine_sim
           FROM c, q WHERE neighbor_id <> query_id
         ),
         ranked AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine_sim DESC, neighbor_id) AS rank
           FROM scored
         ),
         per_q AS (
           SELECT query_id, own_label,
                  SUM(CASE WHEN nb_label = own_label THEN 1 ELSE 0 END) AS m
           FROM ranked WHERE rank <= 10 GROUP BY query_id, own_label
         )
    SELECT own_label AS label, COUNT(*) AS n_vecs,
           (ROUND(CAST(SUM(m) AS DOUBLE) / (10 * COUNT(*)), 6) + 0) AS avg_agreement,
           CAST(SUM(CASE WHEN m < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect
    FROM per_q GROUP BY own_label ORDER BY label
    """,
    note="kNN label-agreement audit (mislabel detection): per-label share of each vector's 10 nearest neighbors carrying the same label; n_suspect = vectors whose neighborhood majority disagrees",
)
def knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality audit via k-nearest-neighbor vote: for every vector,
    count how many of its 10 nearest cosine neighbors share its label;
    aggregate per label (avg agreement, #majority-disagree suspects).
    Integer vote counts aggregate exactly (SUM of ints, never a double
    sum), so the per-label ratio is deterministic.  Scale plan: this
    brute-force form reuses cosine_topk (corpus never shuffles; queries
    broadcast) — right up to ~10⁵ queries; beyond that swap the
    candidate generator for srp_candidate_pairs (same downstream vote),
    which is exactly how lsh_topk relates to cosine_topk."""
    emb = _t(spark, sf_dir, "embeddings")
    knn = similarity.cosine_topk(emb, emb, k=10)
    own = emb.select(F.col("vec_id").alias("query_id"), F.col("label").alias("own_label"))
    nb = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nb_label"))
    per_q = (
        knn.join(joins.broadcast_if_small(own), "query_id")
        .join(joins.broadcast_if_small(nb), "neighbor_id")
        .groupBy("query_id", "own_label")
        .agg(
            F.sum(
                F.when(F.col("nb_label") == F.col("own_label"), 1).otherwise(0)
            ).alias("m")
        )
    )
    return (
        per_q.groupBy(F.col("own_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum("m").cast("double") / (10 * F.count(F.lit(1))), 6
            ).alias("avg_agreement"),
            F.sum(F.when(F.col("m") < 5, 1).otherwise(0)).alias("n_suspect"),
        )
        .orderBy("label")
    )


#: the oracle spelling of ``similarity.auto_n_centroids`` — corpus-scaled
#: cluster count so the gate checks the SAME k at every scale factor
#: (16 at the ≤2k-vector gate fixtures; 156 at the 20k-vector sf1).
_AUTO_K_SQL = "GREATEST(16, (SELECT COUNT(*) FROM embeddings) // 128)"


@register(
    "semantic_dedup",
    f"""
    WITH {_kmeans_ctes(
        _AUTO_K_SQL,
        3,
        train_mod_sql="((SELECT COUNT(*) FROM embeddings) + 24999) // 25000",
    )},
         cent AS (SELECT cent_id, c_vec FROM c3),
         corpus AS (SELECT vec_id, embedding AS n_vec FROM embeddings),
         asg AS (SELECT vec_id, n_vec, cent_id, {_sql_cos('n_vec', 'c_vec')} AS sim FROM corpus, cent),
         cells AS (SELECT vec_id, n_vec, cent_id AS cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rk FROM asg)
            WHERE rk = 1),
         pairs AS (
           SELECT a.vec_id, a.cell, b.vec_id AS keeper_id,
                  {_sql_cos('a.n_vec', 'b.n_vec')} AS cosine_sim
           FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id > b.vec_id
         )
    SELECT vec_id, cell, keeper_id, cosine_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY cosine_sim DESC, keeper_id) AS rk
      FROM pairs WHERE cosine_sim >= 0.45)
    WHERE rk = 1
    ORDER BY vec_id
    """,
    note=(
        "SemDeDup semantic deduplication (arXiv:2303.09540): corpus-scaled k-means cluster "
        "(k = max(16, n//128), occupancy-constant) then within-cluster cosine prune, "
        "keep-lowest-id — quadratic work confined to Voronoi cells; Lloyd passes train on a "
        "~25k md5-gated sample (mod = ceil(n/25000), inert at every gate fixture) so training "
        "is sample*k, not the Θ(n²/128) full-corpus loop the sf10 probe measured; the oracle "
        "unrolls the same sampled training with the same count-derived k and mod"
    ),
)
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-then-prune semantic dedup over the embeddings fixture:
    real (deterministic) k-means quantizer, within-cell cosine ≥ 0.45,
    keep-lowest-id.  Every stage — training included — hash-matches the
    unrolled-SQL oracle.  k is corpus-scaled on BOTH engines
    (``auto_n_centroids`` / ``_AUTO_K_SQL``): the round-11 sf1 sweep
    measured ×23.6 wall for ×10 data with k pinned at 16 — the in-cell
    quadratic verify is only linear-in-n if cell occupancy stays flat.
    Training is additionally capped at a ~25k md5-gated sample on BOTH
    engines (``kmeans_train_mod`` / the mirrored mod subquery): with
    k ∝ n, full-corpus Lloyd passes are Θ(n²/128) — the sf10 probe
    measured 1630 s, training-dominated — while sampled training keeps
    centroid quality and is inert (mod=1) at every gate fixture."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(emb, threshold=0.45)


@register(
    "embedding_near_dups_ivf",
    f"""
    WITH {_kmeans_ctes(
        _AUTO_K_SQL,
        3,
        train_mod_sql="((SELECT COUNT(*) FROM embeddings) + 24999) // 25000",
    )},
         cent AS (SELECT cent_id, c_vec FROM c3),
         corpus AS (SELECT vec_id, embedding AS n_vec FROM embeddings),
         asg AS (SELECT vec_id, cent_id, {_sql_cos('n_vec', 'c_vec')} AS sim FROM corpus, cent),
         cells AS (SELECT vec_id, cent_id AS cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rk FROM asg)
            WHERE rk <= 2),
         cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id),
         scored AS (SELECT c.id_a, c.id_b,
                           {_sql_cos('ea.embedding', 'eb.embedding')} AS cosine_sim
                    FROM cand c
                    JOIN embeddings ea ON ea.vec_id = c.id_a
                    JOIN embeddings eb ON eb.vec_id = c.id_b)
    SELECT id_a, id_b, cosine_sim FROM scored
    WHERE cosine_sim >= 0.5
    ORDER BY id_a, id_b
    """,
    note=(
        "IVF-bucketed near-dup pairs (nprobe=2) — the runnable moderate-threshold path PAST "
        "the SRP volume guard (which raises by design at sf10+ and names this remediation): "
        "same corpus-scaled sampled-training k-means quantizer as semantic_dedup, top-2 cell "
        "probing, same-cell candidates verified with the exact cosine; candidate volume is "
        "Σ C(n_cell,2) ≈ n·occupancy·nprobe²/2 — linear in n — and histogram-guarded against "
        "degenerate cells; the oracle unrolls training and both probe assignments"
    ),
)
def embedding_near_dups_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via IVF cells at any corpus size: where
    ``embedding_near_dups`` (SRP) measures its candidate join past the
    1e10 cap and raises with this query named as the remediation, this
    path's candidate volume is occupancy-bounded by construction.
    Recall is approximate (pair found iff the two vectors share one of
    their two probed cells); precision is exact (every emitted cosine
    recomputed from the raw vectors).  The sf100de probe measures the
    recall claim against the fixture's planted boundary-cosine pairs
    at 2M vectors — where the SRP guard's bound is ~3e13."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dups_ivf(emb, threshold=0.5, nprobe=2)


@register(
    "ivf_recall_audit",
    f"""
    WITH {_kmeans_ctes(16, 3)},
         cent AS (SELECT cent_id, c_vec FROM c3),
         corpus AS (SELECT vec_id AS neighbor_id, embedding AS n_vec FROM embeddings),
         asg AS (SELECT neighbor_id, n_vec, cent_id, {_sql_cos('n_vec', 'c_vec')} AS sim FROM corpus, cent),
         cells AS (SELECT neighbor_id, n_vec, cent_id AS cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY neighbor_id ORDER BY sim DESC, cent_id) AS rk FROM asg)
            WHERE rk = 1),
         q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
         qa AS (SELECT query_id, q_vec, cent_id, {_sql_cos('q_vec', 'c_vec')} AS sim FROM q, cent),
         qcells AS (SELECT query_id, q_vec, cent_id AS cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cent_id) AS rk FROM qa)
            WHERE rk <= 4),
         ivf_scored AS (SELECT query_id, neighbor_id, {_sql_cos('q_vec', 'n_vec')} AS s
            FROM qcells JOIN cells USING (cell) WHERE neighbor_id <> query_id),
         ivf AS (SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank
            FROM ivf_scored) WHERE rank <= 5),
         brute_scored AS (SELECT query_id, neighbor_id, {_sql_cos('q_vec', 'n_vec')} AS s
            FROM q, corpus WHERE neighbor_id <> query_id),
         brute AS (SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank
            FROM brute_scored) WHERE rank <= 5)
    SELECT b.query_id,
           CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           (ROUND(CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / 5, 6) + 0) AS recall
    FROM brute b LEFT JOIN ivf i
      ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
    GROUP BY b.query_id ORDER BY b.query_id
    """,
    note=(
        "ANN recall@5 audit: per-query overlap of IVF top-5 (real k-means quantizer, nprobe=4) "
        "with the brute-force top-5 — the estimator-quality twin for the ANN family (every "
        "approximate path ships with an exact audit); the oracle unrolls k-means AND both "
        "retrievals, so the recall number itself is hash-checked"
    ),
)
def ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF index against exact brute-force retrieval,
    per query — the acceptance metric a pipeline owner reads before
    swapping brute force for IVF at scale.  Both retrievals are
    deterministic (4dp-rounded cosines, id tie-breaks), so recall is a
    stable integer count, not a flaky estimate.

    Scale plan: the IVF side probes nprobe/16 of the corpus via the
    cell equi-join (centroids broadcast); the brute side is the guarded
    baseline — at 100 TB you run the audit on a SAMPLED query set
    (recall estimates converge fast in query count) while the IVF path
    serves production traffic.  The hit join keys on (query_id,
    neighbor_id) — |queries| x 5 rows on each side."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cents = similarity.kmeans_centroids(emb, k=16, iterations=3)
    ivf = similarity.ivf_topk(
        emb, queries, k=5, nprobe=4, centroids=cents
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    brute = similarity.cosine_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    return (
        brute.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double") / 5, 6
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


def _sql_cos_d(a: str, b: str, d: int) -> str:
    """Dim-parameterized DuckDB cosine fragment (4dp-rounded), the
    subspace twin of _sql_cos."""
    def _dot(x: str, y: str) -> str:
        return (
            f"list_aggregate(list_transform(range(1, {d + 1}), "
            f"i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)), 'sum')"
        )

    return f"(ROUND({_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)})), 4) + 0)"


def _pq_kmeans_ctes(pfx: str, lo: int, sub: int, k: int, iterations: int) -> str:
    """Per-subspace unrolled Lloyd's chain (the _kmeans_ctes generator
    parameterized by a vector slice and a CTE name prefix) — final
    centroids are ``{pfx}c{iterations}``."""
    hi = lo + sub - 1
    parts = [
        f"{pfx}v AS (SELECT vec_id, embedding[{lo}:{hi}] AS embedding FROM embeddings)",
        f"{pfx}c0 AS (SELECT CAST(vec_id AS BIGINT) AS cent_id, "
        f"CAST(embedding[{lo}:{hi}] AS DOUBLE[]) AS c_vec FROM embeddings WHERE vec_id < {k})",
    ]
    for i in range(iterations):
        parts.append(
            f"""{pfx}a{i} AS (
      SELECT vec_id, cell FROM (
        SELECT v.vec_id, c.cent_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                   ORDER BY {_sql_cos_d('v.embedding', 'c.c_vec', sub)} DESC, c.cent_id) AS rk
        FROM {pfx}v v, {pfx}c{i} c) WHERE rk = 1)"""
        )
        parts.append(
            f"""{pfx}m{i} AS (
      SELECT cell, pos,
             (ROUND(CAST(CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE) / COUNT(*), 8) + 0) AS m
      FROM (SELECT a.cell, generate_subscripts(v.embedding, 1) AS pos,
                   unnest(v.embedding) AS val
            FROM {pfx}a{i} a JOIN {pfx}v v USING (vec_id))
      GROUP BY cell, pos)"""
        )
        parts.append(
            f"""{pfx}c{i + 1} AS (
      SELECT old.cent_id, COALESCE(new.c_vec, old.c_vec) AS c_vec
      FROM {pfx}c{i} old LEFT JOIN
           (SELECT cell AS cent_id, list(m ORDER BY pos) AS c_vec
            FROM {pfx}m{i} GROUP BY cell) new USING (cent_id))"""
        )
    return ",\n    ".join(parts)


def _pq_oracle() -> str:
    m, sub, k, it = 4, 16, 16, 2
    chains = ",\n    ".join(
        _pq_kmeans_ctes(f"s{s}_", s * sub + 1, sub, k, it) for s in range(m)
    )
    encs = ",\n    ".join(
        f"""enc{s} AS (
      SELECT vec_id, cell AS code{s} FROM (
        SELECT v.vec_id, c.cent_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                   ORDER BY {_sql_cos_d('v.embedding', 'c.c_vec', sub)} DESC, c.cent_id) AS rk
        FROM s{s}_v v, s{s}_c{it} c) WHERE rk = 1)"""
        for s in range(m)
    )
    cb_joins = " ".join(
        f"JOIN s{s}_c{it} cb{s} ON cb{s}.cent_id = e.code{s}" for s in range(m)
    )
    enc_joins = " ".join(f"JOIN enc{s} USING (vec_id)" for s in range(1, m))
    concat = " || ".join(f"cb{s}.c_vec" for s in range(m))
    return f"""
    WITH {chains},
    {encs},
    codes AS (SELECT * FROM enc0 {enc_joins}),
    recon AS (
      SELECT e.vec_id, {concat} AS r_vec
      FROM codes e {cb_joins}
    ),
    q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
    approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, r.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                   ORDER BY {_sql_cos('q.q_vec', 'r.r_vec')} DESC, r.vec_id) AS rank
        FROM q, recon r WHERE r.vec_id <> q.query_id)
      WHERE rank <= 10),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, n.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                   ORDER BY {_sql_cos('q.q_vec', 'n.embedding')} DESC, n.vec_id) AS rank
        FROM q, embeddings n WHERE n.vec_id <> q.query_id)
      WHERE rank <= 10),
    shortlist AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, r.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                   ORDER BY {_sql_cos('q.q_vec', 'r.r_vec')} DESC, r.vec_id) AS rank
        FROM q, recon r WHERE r.vec_id <> q.query_id)
      WHERE rank <= 50),
    rerank AS (
      SELECT query_id, neighbor_id FROM (
        SELECT s.query_id, s.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY s.query_id
                   ORDER BY {_sql_cos('q.q_vec', 'n.embedding')} DESC, s.neighbor_id) AS rank
        FROM shortlist s
        JOIN q ON q.query_id = s.query_id
        JOIN embeddings n ON n.vec_id = s.neighbor_id)
      WHERE rank <= 10),
    hits AS (
      SELECT a.query_id, COUNT(*) AS n_hits
      FROM approx a JOIN exact e
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      GROUP BY a.query_id),
    rhits AS (
      SELECT r.query_id, COUNT(*) AS n_hits_rerank
      FROM rerank r JOIN exact e
        ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
      GROUP BY r.query_id)
    SELECT q.query_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           (ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 10, 6) + 0) AS recall_at_10,
           CAST(COALESCE(rh.n_hits_rerank, 0) AS BIGINT) AS n_hits_rerank,
           (ROUND(CAST(COALESCE(rh.n_hits_rerank, 0) AS DOUBLE) / 10, 6) + 0) AS recall_rerank
    FROM q LEFT JOIN hits h USING (query_id)
         LEFT JOIN rhits rh USING (query_id)
    ORDER BY q.query_id
    """


@register(
    "pq_recall_audit",
    _pq_oracle(),
    note=(
        "product quantization (the IVF-PQ compression half, cosine/IP family): 4 "
        "subspaces x 16-centroid deterministic-kmeans codebooks, vectors encoded to 4 "
        "codes (128x compression at dim 64), retrieval scores query-vs-RECONSTRUCTION "
        "(codes + codebooks only — the originals are never read at query time); "
        "recall@10 vs exact brute force per query, PLUS the standard refine step (PQ "
        "top-50 shortlist re-ranked by exact cosine: mean recall 0.28 -> 0.59 at sf0.01, "
        "paying |queries|x50 exact distances instead of |corpus|); oracle unrolls all "
        "four subspace trainings as CTEs so even the codebooks are hash-checked"
    ),
)
def pq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized retrieval with a measured acceptance metric:
    train 4 independent subspace codebooks (deterministic Lloyd's, 2
    iterations), encode the corpus to 4x4-bit codes, reconstruct from
    codebook entries alone, and score each query's top-10 by
    reconstruction cosine against the exact brute-force top-10 —
    recall@10 per query, the number that decides whether 128x
    compression is admissible for the workload (the ivf_recall_audit
    contract applied to PQ).

    Scale plan: training is m small k-means over SLICED vectors (each
    iteration one broadcast-argmax partial agg + decimal-exact means);
    encoding is m broadcast argmax passes (no window, no vector
    shuffle); the query path touches codes + 16-row codebooks only —
    at 100 TB the PQ index is ~2 bytes/vector vs 256, which is the
    difference between an in-memory index and none.  Queries broadcast
    against reconstructions; top-10 via max-struct/window over
    |queries| x |corpus| scored rows confined by the broadcast."""
    from pyspark.sql import Window

    from hadoop_20_spark.operators.similarity import (
        dot,
        norm,
        pq_codebooks,
        pq_encode,
        pq_reconstruct,
    )

    # truly-shared narrow relation (training, encode, query side, exact
    # side, re-rank all read it): persist once — 11 structural scans
    # without this, plan-smell audited
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding").persist()
    books, sub = pq_codebooks(emb, m=4, k=16, iterations=2)
    codes = pq_encode(emb, books, sub)
    # Norm hoisting (r13, the pair-scoring discipline): every vector's
    # norm is computed ONCE on its side relation — inside recon's
    # persist, on the 10-row query broadcast, and on the exact/re-rank
    # corpus projections below their joins — and pairs score as
    # dot/(nq*nc): the exact cosine() operation tree (same sequential
    # folds, same multiplication order), 3x fewer interpreted folds per
    # scored pair.
    recon = (
        pq_reconstruct(codes, books)
        .withColumn("_rn", norm(F.col("recon")))
        .persist()
    )  # scored by all queries
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        norm(F.col("embedding")).alias("_qn"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), "neighbor_id"
    )
    # ONE scored-reconstruction pass serves both the top-10 measurement
    # and the top-50 re-rank shortlist
    scored_pq = (
        F.broadcast(q)
        .crossJoin(recon)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("q_vec"), F.col("recon"))
                / (F.col("_qn") * F.col("_rn")),
                4,
            ).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 50)
        .persist()
    )
    approx = scored_pq.where(F.col("rank") <= 10).select(
        "query_id", "neighbor_id"
    )
    exact = (
        F.broadcast(q)
        .crossJoin(emb.withColumn("_en", norm(F.col("embedding"))))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("q_vec"), F.col("embedding"))
                / (F.col("_qn") * F.col("_en")),
                4,
            ).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "neighbor_id")
    )
    # the standard IVF-PQ usage: PQ shortlist (top-50 by reconstruction)
    # re-ranked by EXACT cosine against the original vectors — the
    # refine step pays |queries| x 50 exact distances, not |corpus|
    rerank = (
        scored_pq.select("query_id", "neighbor_id")
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("n_vec"),
                norm(F.col("embedding")).alias("_nn"),
            ),
            "neighbor_id",
        )
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("_qn") * F.col("_nn")),
                4,
            ).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "neighbor_id")
    )
    exact = exact.persist()  # consumed by both hit joins
    hits = approx.join(exact, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).alias("n_hits"))
    rhits = rerank.join(exact, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).alias("n_hits_rerank"))
    return (
        q.select("query_id")
        .join(hits, "query_id", "left")
        .join(rhits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)).cast("double") / 10, 6
            ).alias("recall_at_10"),
            F.coalesce("n_hits_rerank", F.lit(0))
            .cast("long")
            .alias("n_hits_rerank"),
            F.round(
                F.coalesce("n_hits_rerank", F.lit(0)).cast("double") / 10, 6
            ).alias("recall_rerank"),
        )
        .orderBy("query_id")
    )


@register(
    "mrl_truncation_audit",
    r"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10
    ),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    dims AS (SELECT unnest([8, 16, 32, 64]) AS dim),
    scored AS (
      SELECT d.dim, q.query_id, c.neighbor_id,
             (ROUND(
               list_aggregate(list_transform(range(1, d.dim + 1),
                   i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)), 'sum')
               / (sqrt(list_aggregate(list_transform(range(1, d.dim + 1),
                   i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, d.dim + 1),
                   i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)), 'sum'))),
               4) + 0) AS cosine_sim
      FROM q JOIN c ON c.neighbor_id <> q.query_id CROSS JOIN dims d
    ),
    topk AS (
      SELECT dim, query_id, neighbor_id FROM (
        SELECT dim, query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY dim, query_id
                                  ORDER BY cosine_sim DESC, neighbor_id) AS rk
        FROM scored) WHERE rk <= 5
    ),
    base AS (SELECT query_id, neighbor_id FROM topk WHERE dim = 64)
    SELECT t.dim AS trunc_dim,
           CAST(COUNT(*) AS BIGINT) AS topk_pairs,
           CAST(COUNT(b.neighbor_id) AS BIGINT) AS overlap_with_full,
           (ROUND(COUNT(b.neighbor_id) * 1.0 / COUNT(*), 4) + 0) AS recall_at_k
    FROM topk t
    LEFT JOIN base b
      ON t.query_id = b.query_id AND t.neighbor_id = b.neighbor_id
    GROUP BY t.dim ORDER BY t.dim
    """,
    note=(
        "Matryoshka truncation study: recall@5 of prefix-truncated cosine retrieval "
        "(dims 8/16/32/64) vs the full-dim exact top-5 — the read-less-coordinates "
        "accuracy/IO trade, measured; dim-64 row is the recall=1.0 sanity anchor.  "
        "One corpus scan scores all widths (product array sliced per width); oracle "
        "is the brute-force per-width ranking"
    ),
)
def mrl_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-truncation retrieval audit (the acceptance-metric pattern
    of ivf_recall_audit/pq_recall_audit applied to dimensionality):
    rank with only the first d coordinates and measure top-5 agreement
    with the full vector.  At 100 TB the payoff is columnar I/O — a
    parquet scan that materializes an 8-float prefix reads 1/8 the
    bytes of the full 64-float column — and this query publishes the
    recall each such prefix actually buys on this corpus."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.truncation_recall_audit(
        emb, emb.filter(F.col("vec_id") < 10), dims=(8, 16, 32, 64), k=5
    )


@register(
    "rrf_hybrid_topk",
    rf"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ),
    dl AS (SELECT doc_id, len(t) AS dl FROM tok),
    st AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
    p AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS term FROM tok)
      WHERE term IN ('slow', 'hash', 'batch')
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM p GROUP BY term),
    lex AS (
      SELECT doc_id, score FROM (
        SELECT p.doc_id,
               CAST(CAST(SUM(CAST(
                 ln((n - df + 0.5) / (df + 0.5) + 1)
                 * (CAST(tf AS DOUBLE)
                    / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
               AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS score
        FROM p JOIN dfreq USING (term) JOIN dl USING (doc_id)
        CROSS JOIN st GROUP BY p.doc_id)
      ORDER BY score DESC, doc_id LIMIT 50
    ),
    qv AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
    sem AS (
      SELECT vec_id AS doc_id,
             {{cos}} AS score
      FROM embeddings, qv WHERE vec_id <> 0
      ORDER BY score DESC, doc_id LIMIT 50
    ),
    u AS (
      SELECT 'lex' AS retr, doc_id, score FROM lex
      UNION ALL
      SELECT 'sem' AS retr, doc_id, score FROM sem
    ),
    ranked AS (
      SELECT retr, doc_id,
             ROW_NUMBER() OVER (PARTITION BY retr
                                ORDER BY score DESC, doc_id) AS rank
      FROM u
    ),
    fused AS (
      SELECT doc_id,
             CAST(CAST(SUM(CAST(1.0 / (60 + rank) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
               AS rrf_raw,
             MAX(CASE WHEN retr = 'lex' THEN rank END) AS lex_rank,
             MAX(CASE WHEN retr = 'sem' THEN rank END) AS sem_rank
      FROM ranked GROUP BY doc_id
    )
    SELECT doc_id, lex_rank, sem_rank, (ROUND(rrf_raw, 6) + 0) AS rrf_score
    FROM fused ORDER BY rrf_raw DESC, doc_id LIMIT 10
    """.format(cos=_sql_cos("embedding", "q_vec")),
    note=(
        "reciprocal-rank fusion (Cormack/Clarke/Buettcher k=60) of two "
        "retrievers — BM25 lexical top-50 for {slow,hash,batch} and "
        "embedding-cosine top-50 vs the vec_id=0 query vector: one "
        "retriever-partitioned rank window over the 100-row union, "
        "decimal-summed 1/(60+rank), top-10 by fused score"
    ),
)
def rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval the way a training-data curation stack fuses a
    lexical and a semantic ranker: RRF(d) = sum over retrievers of
    1/(k + rank_r(d)), k=60 — rank-based, so the two incomparable score
    scales never mix.  Lexical = the bm25_topk scorer (persisted
    postings, DECIMAL-summed addends); semantic = exact cosine vs the
    vec_id=0 query embedding (norms precomputed, 4dp-rounded like
    embedding_topk).

    Determinism: each retriever's candidate list is cut at 50 on
    (score DESC, doc_id) — both scores are identical IEEE expressions
    in both engines (the bm25/ln precedent); ranks come from ONE window
    PARTITIONED by retriever (never a no-partition window); the fused
    sum has <= 2 addends, each routed through DECIMAL(38,18); final
    top-10 orders the unrounded fusion with a doc_id tie-break.

    Scale plan: each retriever ends in TakeOrderedAndProject (k-bounded
    heaps), so fusion operates on a 2k-row relation no matter the
    corpus size; the rank window partitions by retriever (2 parallel
    groups); everything upstream is the already-audited bm25/cosine
    machinery.  Adding retrievers (more LSH tables, a second query
    field) grows the union linearly, never the corpus work."""
    from pyspark.sql import Window

    from hadoop_20_spark.functions import tokens as _tok
    from hadoop_20_spark.operators import invindex

    terms = ["slow", "hash", "batch"]
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dl = docs.select("doc_id", F.size(_tok("text")).alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    postings = (
        invindex.inverted_postings(docs, "doc_id", "text")
        .where(F.col("term").isin(terms))
        .select("term", "doc_id", "tf")
        .persist()
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    addend = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    ) * (
        F.col("tf").cast("double")
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * (F.col("dl") / F.col("avgdl"))))
    )
    lex = (
        postings.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .select("doc_id", addend.cast("decimal(38,18)").alias("a"))
        .groupBy("doc_id")
        .agg(F.sum("a").cast("double").alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(50)
        .select(F.lit("lex").alias("retr"), "doc_id", "score")
    )
    emb = _t(spark, sf_dir, "embeddings")
    # Norm hoisting (r13): the 1-row query's norm rides the broadcast,
    # each candidate's norm is a projection below the crossJoin — the
    # score is the exact cosine() operation tree (dot/(nc*nq), same
    # folds and multiplication order), one fold per candidate not three.
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec"),
        similarity.norm(F.col("embedding")).alias("_qn"),
    )
    cand = emb.filter(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("c_vec"),
        similarity.norm(F.col("embedding")).alias("_cn"),
    )
    sem = (
        cand.crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            F.round(
                similarity.dot(F.col("c_vec"), F.col("q_vec"))
                / (F.col("_cn") * F.col("_qn")),
                4,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(50)
        .select(F.lit("sem").alias("retr"), "doc_id", "score")
    )
    w = Window.partitionBy("retr").orderBy(F.desc("score"), "doc_id")
    ranked = lex.unionByName(sem).select(
        "retr", "doc_id", F.row_number().over(w).cast("long").alias("rank")
    )
    fused = ranked.groupBy("doc_id").agg(
        F.sum((F.lit(1.0) / (F.lit(60) + F.col("rank"))).cast("decimal(38,18)"))
        .cast("double")
        .alias("rrf_raw"),
        F.max(F.when(F.col("retr") == "lex", F.col("rank"))).alias("lex_rank"),
        F.max(F.when(F.col("retr") == "sem", F.col("rank"))).alias("sem_rank"),
    )
    return (
        fused.orderBy(F.desc("rrf_raw"), "doc_id")
        .limit(10)
        .select(
            "doc_id", "lex_rank", "sem_rank",
            F.round("rrf_raw", 6).alias("rrf_score"),
        )
    )


@register(
    "embedding_covariance_topk",
    """
    WITH u AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
      FROM embeddings
    ),
    dims AS (
      SELECT i - 1 AS d, COUNT(*) AS n,
             SUM(CAST(q[i] AS HUGEINT)) AS sx,
             SUM(CAST(q[i] AS HUGEINT) * q[i]) AS sxx
      FROM u, range(1, 65) r(i) GROUP BY i
    ),
    pairs AS (
      SELECT r1.i - 1 AS di, r2.i - 1 AS dj,
             SUM(CAST(q[r1.i] AS HUGEINT) * q[r2.i]) AS sxy
      FROM u, range(1, 65) r1(i), range(1, 65) r2(i)
      WHERE r1.i < r2.i GROUP BY r1.i, r2.i
    ),
    cov AS (
      SELECT p.di AS dim_i, p.dj AS dim_j, a.n AS n_vecs,
             a.n * p.sxy - a.sx * b.sx AS cov_num,
             a.n * a.sxx - a.sx * a.sx AS var_i,
             a.n * b.sxx - b.sx * b.sx AS var_j
      FROM pairs p
      JOIN dims a ON a.d = p.di
      JOIN dims b ON b.d = p.dj
    )
    SELECT dim_i, dim_j, n_vecs,
           (ROUND(CAST(cov_num AS DOUBLE) / n_vecs / n_vecs / 1e12, 9) + 0)
             AS covariance,
           (ROUND(CAST(cov_num AS DOUBLE)
                 / sqrt(CAST(var_i AS DOUBLE) * CAST(var_j AS DOUBLE)), 6) + 0)
             AS correlation
    FROM cov
    ORDER BY abs(cov_num) DESC, dim_i, dim_j
    LIMIT 10
    """,
    note=(
        "full 64x64 covariance/correlation of the embedding corpus from "
        "ONE pass of exact fixed-point sufficient statistics (per-row "
        "micro-quantized outer product, map-side combine to <= dim^2/2 "
        "cells per partition) — the PCA/whitening prep of an embedding-"
        "compression pipeline; top-10 dimension pairs by |covariance|, "
        "ranked on the exact integer numerator"
    ),
)
def embedding_covariance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance matrix over the embedding corpus — the
    sufficient-statistics pass a PCA / whitening / decorrelation stage
    runs before compressing vectors at 100 TB (the Welford-free batch
    form).  Per the int8-quantization discipline, components are first
    micro-quantized (round(x*1e6) as BIGINT, per-row deterministic on
    both engines), so every aggregate is EXACT integer arithmetic —
    cov rank order and the emitted numerator carry zero float
    accumulation-order risk; only the two final per-output-row readouts
    (covariance, correlation) are doubles, computed with an identical
    op sequence in both engines and rounded once.

    Shape: cov(i,j) needs Sxy for all i<j — inherently a dim^2/2
    product pass (2,016 products/row at dim 64, a row-local GEMM-like
    fan-out).  The explode feeds a (i,j)-keyed partial aggregate, so
    each map task combines down to <= 2,016 cells BEFORE the exchange:
    shuffle volume is partitions * dim^2/2 cells regardless of corpus
    size, the CMS build economics on the covariance axis.  Per-dim
    moments (Sx, Sxx) ride a second 64-cell posexplode aggregate and
    join the pair relation broadcast.  At higher dim, screen with the
    per-dim variance relation first (top-v dims) to keep the fan-out
    v^2/2 — the knob is the slice width.

    Reference analog: the two-level sufficient-statistics rollup of
    mapred/lib/aggregate (ValueAggregatorJob partial sums merged at the
    reducer); grouped_ols_trend is the 1-D sibling."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) "
            "* 1000000) AS BIGINT))"
        ).alias("q"),
    )
    # ONE Arrow-batched sufficient-statistics pass (int64 QᵀQ per
    # batch + column sums + count — operators/similarity.py
    # covariance_sufficient_stats): bit-identical integer partials to
    # the 2,016-product expression fan-out this replaced (the r12
    # verdict's ~13×-vs-DuckDB constant), one corpus scan for pairs,
    # moments AND the row count.  The ≤2,145-row aggregate is
    # localCheckpointed so its four consumers don't re-derive the
    # corpus pass (house scan-fanout rule).
    stats = (
        similarity.covariance_sufficient_stats(q, dim=64)
        .groupBy("di", "dj")
        .agg(F.sum(F.col("p").cast("decimal(38,0)")).alias("s"))
        .localCheckpoint()
    )
    nrow = stats.filter((F.col("di") == -1) & (F.col("dj") == -1)).select(
        F.col("s").cast("long").alias("n")
    )
    moments = (
        stats.filter((F.col("di") >= 0) & (F.col("dj") == -1))
        .select(F.col("di").alias("d"), F.col("s").alias("sx"))
        .join(
            stats.filter(
                (F.col("di") >= 0) & (F.col("di") == F.col("dj"))
            ).select(F.col("di").alias("d"), F.col("s").alias("sxx")),
            "d",
        )
        .crossJoin(F.broadcast(nrow))
    )
    pairs = stats.filter(
        (F.col("di") >= 0) & (F.col("dj") > F.col("di"))
    ).select("di", "dj", F.col("s").alias("sxy"))
    a = moments.select(
        F.col("d").alias("di"),
        F.col("n").alias("n_vecs"),
        F.col("sx").alias("sx_i"),
        F.col("sxx").alias("sxx_i"),
    )
    b = moments.select(
        F.col("d").alias("dj"),
        F.col("sx").alias("sx_j"),
        F.col("sxx").alias("sxx_j"),
    )
    cov = (
        pairs.join(F.broadcast(a), "di")
        .join(F.broadcast(b), "dj")
        .select(
            F.col("di").cast("long").alias("dim_i"),
            F.col("dj").cast("long").alias("dj_tmp"),
            F.col("n_vecs").cast("long").alias("n_vecs"),
            (F.col("n_vecs") * F.col("sxy") - F.col("sx_i") * F.col("sx_j"))
            .cast("decimal(38,0)")
            .alias("cov_num"),
            (F.col("n_vecs") * F.col("sxx_i") - F.col("sx_i") * F.col("sx_i"))
            .cast("decimal(38,0)")
            .alias("var_i"),
            (F.col("n_vecs") * F.col("sxx_j") - F.col("sx_j") * F.col("sx_j"))
            .cast("decimal(38,0)")
            .alias("var_j"),
        )
        .withColumnRenamed("dj_tmp", "dim_j")
    )
    return (
        cov.orderBy(F.abs(F.col("cov_num")).desc(), "dim_i", "dim_j")
        .limit(10)
        .select(
            "dim_i",
            "dim_j",
            "n_vecs",
            F.round(
                F.col("cov_num").cast("double")
                / F.col("n_vecs")
                / F.col("n_vecs")
                / F.lit(1e12),
                9,
            ).alias("covariance"),
            F.round(
                F.col("cov_num").cast("double")
                / F.sqrt(
                    F.col("var_i").cast("double") * F.col("var_j").cast("double")
                ),
                6,
            ).alias("correlation"),
        )
    )

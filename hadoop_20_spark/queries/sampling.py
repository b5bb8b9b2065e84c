"""Sampling & reshaping queries — split from relational.py (round 7
hygiene: the module crossed the 2,000-line rule again).  Behavior-
identical; REGISTRY names, oracles, and notes are unchanged.  The
family: deterministic md5 sampling, interval (every-k-th) sampling on
the distributed rank, PPS systematic sampling and size-balanced
sharding on the distributed cumulative sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from hadoop_20_spark.operators import sort as sort_ops  # noqa: F401
from hadoop_20_spark.queries._base import (  # noqa: F401
    REGISTRY,
    Query,
    _sql_md5_long,
    _t,
    register,
)

@register(
    "md5_sample",
    f"""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE { _sql_md5_long("CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)") } % 10 = 0
    """,
    note="SequenceFileInputFilter.MD5Filter — deterministic 1/f sampling (engine-portable, unlike seeded random)",
)
def md5_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    key = F.concat_ws("_", F.col("l_orderkey"), F.col("l_linenumber"))
    return sort_ops.sample_percent_deterministic(li, key, 10)


@register(
    "interval_sample",
    """
    SELECT l_orderkey, l_linenumber FROM (
      SELECT l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
      FROM lineitem)
    WHERE rn % 100 = 1
    """,
    note="InputSampler.IntervalSampler: every k-th record in key order",
)
def interval_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Global every-100th-in-key-order WITHOUT Exchange SinglePartition:
    # distributed_global_rank buckets on driver-collected quantile
    # boundaries, so the rank window is partitioned (B parallel groups)
    # instead of funnelling the whole fact table through one task.
    # Semantics identical to InputSampler.IntervalSampler; plan-asserted
    # in tests/test_registry_plans.py::test_interval_sample_partitioned_rank.
    ranked = sort_ops.distributed_global_rank(
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber"),
        ["l_orderkey", "l_linenumber"],
        rank_col="rn",
    )
    return ranked.filter(F.col("rn") % 100 == 1).drop("rn")


@register(
    "status_rank_sample",
    """
    SELECT o_orderstatus, o_orderkey, rn FROM (
      SELECT o_orderstatus, o_orderkey,
             CAST(ROW_NUMBER() OVER (ORDER BY o_orderstatus, o_orderkey)
               AS BIGINT) AS rn
      FROM orders)
    WHERE rn % 997 = 1
    ORDER BY rn
    """,
    note=(
        "every-997th record in (o_orderstatus, o_orderkey) order — the "
        "IntervalSampler shape over a HOT leading key (3 status values at "
        "~33% each, and VARCHAR besides): ranked by "
        "distributed_global_rank_sampled (InputSampler-style composite-tuple "
        "boundaries, no Exchange SinglePartition, no degenerate bucket)"
    ),
)
def status_rank_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global-rank case the quantile-bucketed rank REFUSES: the
    leading sort key has 3 values at ~33% each, so every leading-key
    bucketing degenerates (and approxQuantile cannot bucket a VARCHAR
    at all).  ``distributed_global_rank_sampled`` buckets on sampled
    composite boundary TUPLES compared lexicographically — the
    InputSampler + TotalOrderPartitioner discipline on the full key —
    so the hot statuses split by orderkey into balanced parallel
    window groups.  Emits every 997th row in global order (the
    IntervalSampler readout, prime stride so no alignment with any
    generator pattern).

    Scale plan: one deterministic md5-gated sample collect (~2·B·20
    tuples), one row-local bucket expression, one exact per-bucket
    count, B parallel windows — identical economics to
    interval_sample, now valid under arbitrary leading-key skew."""
    ranked = sort_ops.distributed_global_rank_sampled(
        _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderkey"),
        ["o_orderstatus", "o_orderkey"],
        rank_col="rn",
    )
    return (
        ranked.filter((F.col("rn") % 997) == 1)
        .select("o_orderstatus", "o_orderkey", F.col("rn").cast("long").alias("rn"))
        .orderBy("rn")
    )


@register(
    "pps_systematic_sample",
    """
    WITH c AS (
      SELECT doc_id, n_chars,
             SUM(n_chars) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM documents
    ),
    t AS (SELECT GREATEST(SUM(n_chars) // 50, 1) AS stride FROM documents)
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, CAST(cum AS BIGINT) AS cum
    FROM c, t
    WHERE cum // stride > (cum - n_chars) // stride
    ORDER BY doc_id
    """,
    note=(
        "weighted systematic (PPS) sample: select a doc whenever the global cumulative "
        "weight crosses a stride boundary (~50 cut points) — inclusion probability "
        "proportional to n_chars, all-integer selection rule; the cumulative weight comes "
        "from the bucketed two-pass distributed_cumsum, never a single-partition window"
    ),
)
def pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size systematic sampling: walk the
    corpus in doc_id order, select every doc whose span of cumulative
    weight (n_chars) crosses a stride boundary (stride = total/50) —
    the classic PPS design whose Horvitz-Thompson estimator of total
    weight is n_selected x stride, within one stride of truth by
    construction.  Long docs are proportionally more likely to be
    drawn — the length-balanced eval-sample design.

    Scale plan: the global cumulative weight is
    ``sort_ops.distributed_cumsum`` — approx-quantile buckets, exact
    per-bucket weight totals broadcast as offsets, per-bucket running-
    sum windows (B parallel groups, NO Exchange SinglePartition on the
    doc path — the interval_sample discipline generalized from rank to
    weighted cumsum).  Selection is a row-local integer rule; the
    stride is a broadcast 1-row aggregate."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cum = sort_ops.distributed_cumsum(docs, ["doc_id"], "n_chars", cum_col="cum")
    tot = docs.agg(
        F.greatest(F.expr("SUM(n_chars) DIV 50"), F.lit(1)).alias("stride")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .where(
            F.expr("cum DIV stride") > F.expr("(cum - n_chars) DIV stride")
        )
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            F.col("cum").cast("long").alias("cum"),
        )
        .orderBy("doc_id")
    )


@register(
    "balanced_shards",
    """
    WITH c AS (
      SELECT doc_id, n_chars,
             SUM(n_chars) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM documents
    ),
    t AS (SELECT SUM(n_chars) // 8 + 1 AS stride FROM documents)
    SELECT CAST((cum - 1) // stride AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM c, t GROUP BY shard ORDER BY shard
    """,
    note=(
        "size-balanced shard assignment: cut the doc_id-ordered corpus every total/8 units "
        "of cumulative n_chars — contiguous shards within ~1 max-doc of equal byte size (the "
        "training-shard writer layout), shard id a pure function of the distributed cumsum"
    ),
)
def balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to 8 contiguous, byte-balanced shards: shard =
    (cumulative n_chars - 1) DIV stride with stride = total/8 + 1 — the
    training-shard writer's layout decision (equal-SIZE shards, not
    equal-count, so no shard stalls the loader on a run of long docs).
    Shards are contiguous in doc_id order and each is within one
    maximum document of the target size, by construction.

    Scale plan: the cumulative weight is ``sort_ops.distributed_cumsum``
    (bucketed two-pass, no single-partition exchange on the doc path);
    shard assignment is row-local integer arithmetic against a
    broadcast 1-row stride; the report aggregate has an 8-value key.
    The real writer would ``partitionBy(shard)`` the same column."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cum = sort_ops.distributed_cumsum(docs, ["doc_id"], "n_chars", cum_col="cum")
    tot = docs.agg((F.expr("SUM(n_chars) DIV 8") + 1).alias("stride"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy(F.expr("(cum - 1) DIV stride").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
        .orderBy("shard")
    )


def _zorder_audit_oracle() -> str:
    from hadoop_20_spark.operators.layout import morton_interleave_sql

    z = morton_interleave_sql(["sx", "sy"], bits=16)
    prune = "maxx < 24576 OR minx > 32767 OR maxy < 24576 OR miny > 32767"
    return f"""
    WITH base AS (SELECT l_partkey, l_suppkey FROM lineitem),
    mm AS (SELECT MIN(l_partkey) AS mnx, MAX(l_partkey) AS mxx,
                  MIN(l_suppkey) AS mny, MAX(l_suppkey) AS mxy FROM base),
    scaled AS (
      SELECT ((l_partkey - mnx) * 65535) // greatest(mxx - mnx, 1) AS sx,
             ((l_suppkey - mny) * 65535) // greatest(mxy - mny, 1) AS sy
      FROM base CROSS JOIN mm
    ),
    keyed AS (
      SELECT sx, sy, ({z}) >> 26 AS zorder_file, sx >> 10 AS linear_file
      FROM scaled
    ),
    m AS (SELECT COUNT(*) AS rows_matching FROM keyed
          WHERE sx BETWEEN 24576 AND 32767 AND sy BETWEEN 24576 AND 32767),
    zs AS (SELECT zorder_file AS f, COUNT(*) AS n, MIN(sx) AS minx, MAX(sx) AS maxx,
                  MIN(sy) AS miny, MAX(sy) AS maxy FROM keyed GROUP BY 1),
    ls AS (SELECT linear_file AS f, COUNT(*) AS n, MIN(sx) AS minx, MAX(sx) AS maxx,
                  MIN(sy) AS miny, MAX(sy) AS maxy FROM keyed GROUP BY 1),
    za AS (SELECT 'zorder' AS layout, COUNT(*) AS n_files,
                  SUM(CASE WHEN NOT ({prune}) THEN 1 ELSE 0 END) AS files_scanned,
                  SUM(CASE WHEN NOT ({prune}) THEN n ELSE 0 END) AS rows_scanned
           FROM zs),
    la AS (SELECT 'linear' AS layout, COUNT(*) AS n_files,
                  SUM(CASE WHEN NOT ({prune}) THEN 1 ELSE 0 END) AS files_scanned,
                  SUM(CASE WHEN NOT ({prune}) THEN n ELSE 0 END) AS rows_scanned
           FROM ls)
    SELECT layout, CAST(n_files AS BIGINT) AS n_files,
           CAST(files_scanned AS BIGINT) AS files_scanned,
           CAST(rows_scanned AS BIGINT) AS rows_scanned,
           CAST((SELECT rows_matching FROM m) AS BIGINT) AS rows_matching
    FROM (SELECT * FROM za UNION ALL SELECT * FROM la)
    ORDER BY layout
    """


@register(
    "zorder_layout_audit",
    _zorder_audit_oracle(),
    note=(
        "Z-order vs linear layout pruning audit (the OPTIMIZE ZORDER decision, made "
        "measurable): Morton-interleave two uniformly-filtered keys into 64 z-range files "
        "vs 64 first-key-sorted files, then count how many files' min/max bounding boxes "
        "survive a both-dims box predicate — the z-layout scans ~1/64 of files where the "
        "linear layout scans ~1/8; all-integer bit arithmetic, bit-identical oracle"
    ),
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Should this table be Z-ordered?  Assign every lineitem row to a
    file under two layouts — 64 Morton-key (l_partkey, l_suppkey)
    z-ranges vs 64 linear first-key ranges — and measure min/max-stat
    file pruning under a representative two-dimensional box predicate
    (the middle eighth of both scaled key ranges).  The readout a
    lakehouse OPTIMIZE decision needs: files scanned and rows scanned
    per layout for the same matching rows.

    Exactness: scaling is integer min-max (`(x-min)*65535 DIV span`),
    the Morton key is 32 shift/mask terms, file ids are top-bit
    shifts — every operation BIGINT in both engines, so file
    assignments and therefore pruning counts are bit-identical.

    Scale plan: ONE broadcast 1-row min/max aggregate, then the key
    computation is row-local codegen; each layout's file stats are one
    64-key partial-agg'd shuffle over a persisted keyed projection
    (three consumers: two stats passes + the selectivity count); the
    real writer is layout.write_clustered — tests/test_layout_write.py
    materializes BOTH layouts and re-proves this audit's decision from
    parquet footer boxes and Spark's runtime scan metrics (4 vs 9
    surviving files, 3.8k vs 8.4k decoded rows at sf0.01)."""
    from hadoop_20_spark.operators import layout as layout_ops

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    a = (
        layout_ops.zorder_file_assignment(
            li, ["l_partkey", "l_suppkey"], bits=16, file_bits=6
        )
        .select(
            F.col("__s_l_partkey").alias("sx"),
            F.col("__s_l_suppkey").alias("sy"),
            "zorder_file",
            "linear_file",
        )
        .persist()
    )
    LO, HI = 24576, 32767
    in_box = (
        (F.col("sx") >= LO)
        & (F.col("sx") <= HI)
        & (F.col("sy") >= LO)
        & (F.col("sy") <= HI)
    )
    match = a.where(in_box).agg(
        F.count(F.lit(1)).cast("long").alias("rows_matching")
    )

    def layout_stats(file_col: str, name: str) -> DataFrame:
        st = a.groupBy(F.col(file_col).alias("f")).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("sx").alias("minx"),
            F.max("sx").alias("maxx"),
            F.min("sy").alias("miny"),
            F.max("sy").alias("maxy"),
        )
        scanned = ~(
            (F.col("maxx") < LO)
            | (F.col("minx") > HI)
            | (F.col("maxy") < LO)
            | (F.col("miny") > HI)
        )
        return st.agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(scanned.cast("int")).cast("long").alias("files_scanned"),
            F.sum(F.when(scanned, F.col("n")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
        ).select(F.lit(name).alias("layout"), "*")

    out = layout_stats("zorder_file", "zorder").union(
        layout_stats("linear_file", "linear")
    )
    return (
        out.crossJoin(F.broadcast(match))
        .select(
            "layout", "n_files", "files_scanned", "rows_scanned", "rows_matching"
        )
        .orderBy("layout")
    )


@register(
    "temperature_source_mix",
    """
    WITH c AS (SELECT source, COUNT(*) AS n, SUM(n_chars) AS chars
               FROM documents GROUP BY source),
    s AS (SELECT source, n, chars,
                 CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w
          FROM c),
    tot AS (SELECT SUM(w) AS tw FROM s),
    r AS (
      SELECT source, n, chars,
             CAST((1000000 * w) // (SELECT tw FROM tot) AS BIGINT) AS rate_ppm
      FROM s
    ),
    kept AS (
      SELECT d.source, COUNT(*) AS n_sampled, SUM(d.n_chars) AS chars_sampled
      FROM documents d JOIN r ON r.source = d.source
      WHERE (('0x' || substr(md5('mix_' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT)
            % 1000000 < r.rate_ppm
      GROUP BY d.source
    )
    SELECT r.source,
           CAST(r.n AS BIGINT) AS n_docs,
           r.rate_ppm,
           CAST(COALESCE(k.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(COALESCE(k.chars_sampled, 0) AS BIGINT) AS chars_sampled
    FROM r LEFT JOIN kept k USING (source)
    ORDER BY r.source
    """,
    note=(
        "temperature-based source mixing (the XLM-R/mT5 rebalancing recipe at alpha=0.5): "
        "per-source sampling rate proportional to sqrt(count) — big sources down-weighted, "
        "small sources up-weighted — realized with the md5 ppm gate (never a seeded RNG); "
        "integer floor(sqrt) weights and an integer ppm quotient keep every rate "
        "boundary-free in both engines"
    ),
)
def temperature_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-based corpus rebalancing: sample each source at a rate
    proportional to ``sqrt(n_docs)`` (temperature 2 — the multinomial
    alpha=0.5 exponent of XLM-R's data recipe), realized as the
    engine-portable md5 per-mille... per-MILLION gate.  The complement
    of perplexity_bucket_mix: that query reweights by QUALITY within a
    source, this one reweights the source SIZES themselves — together
    they are the two axes of a pretraining mixture.

    Exactness: weights are INTEGER floor(sqrt(n)) — sqrt of a modest
    integer is a single correctly-rounded IEEE op (exact on perfect
    squares), so the floor is engine-identical — and the rate is a pure
    integer quotient (1e6*w DIV total).  The first cut computed the
    ratio in doubles and FLOORED it: with a uniform corpus every rate
    sits exactly on 1/n_sources, where a 1-ulp decimal-cast difference
    flipped DuckDB to 49999 vs Spark's 50000 at sf0.1 — the SCALE.md
    rounding trap, caught by the tri-scale gate.

    Scale plan: ONE source-keyed count aggregate (tiny key domain), a
    broadcast rate row back onto the corpus scan, row-local md5 gate;
    the kept aggregate is another tiny-key reduce.  The corpus is
    scanned twice (count pass + gate pass) — both column-pruned."""
    from hadoop_20_spark.functions import md5_long

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    c = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
    ).persist()  # feeds the weight/total pass and the rate join
    s = c.select(
        "source", "n",
        F.floor(F.sqrt(F.col("n").cast("double"))).cast("long").alias("w"),
    )
    tot = s.agg(F.sum("w").alias("tw"))
    r = (
        s.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n",
            F.expr("(1000000 * w) DIV tw").alias("rate_ppm"),
        )
    )
    gate = md5_long(
        F.concat(F.lit("mix_"), F.col("doc_id").cast("string"))
    ) % 1000000
    kept = (
        docs.join(F.broadcast(r.select("source", "rate_ppm")), "source")
        .where(gate < F.col("rate_ppm"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
        )
    )
    return (
        c.join(F.broadcast(r.select("source", "rate_ppm")), "source")
        .join(kept, "source", "left")
        .select(
            "source",
            F.col("n").cast("long").alias("n_docs"),
            "rate_ppm",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            F.coalesce("chars_sampled", F.lit(0))
            .cast("long")
            .alias("chars_sampled"),
        )
        .orderBy("source")
    )


_AQP_MOD = 100  # 1% deterministic row sample


@register(
    "aqp_sum_estimate",
    f"""
    WITH tagged AS (
      SELECT o_orderpriority,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             CASE WHEN {_sql_md5_long("'aqp_' || CAST(o_orderkey AS VARCHAR)")} % {_AQP_MOD} = 0
                  THEN 1 ELSE 0 END AS in_sample
      FROM orders
    ),
    g AS (
      SELECT o_orderpriority,
             CAST(SUM(cents) AS BIGINT) AS exact_cents,
             CAST(COUNT(*) AS BIGINT) AS exact_rows,
             CAST(SUM(CASE WHEN in_sample = 1 THEN cents ELSE 0 END) * {_AQP_MOD} AS BIGINT) AS est_cents,
             CAST(SUM(in_sample) * {_AQP_MOD} AS BIGINT) AS est_rows
      FROM tagged GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, exact_rows, est_rows, exact_cents, est_cents,
           CAST(ABS(est_cents - exact_cents) * 1000000 // exact_cents AS BIGINT) AS rel_err_ppm
    FROM g ORDER BY o_orderpriority
    """,
    note=(
        "approximate query processing from the deterministic md5 1% row sample: "
        "Horvitz-Thompson scale-up of per-priority row counts and DECIMAL-cents "
        "revenue, with the exact answers and integer-ppm relative error riding as "
        "the audit — the acceptance readout before replacing exact scans with a "
        "maintained sample synopsis at 100 TB"
    ),
)
def aqp_sum_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-synopsis aggregate estimation: answer GROUP BY SUM/COUNT
    from the 1% md5-gated row sample (engine-portable, zero RNG) scaled
    by 1/f, audited against the exact aggregate — the query you run to
    decide whether a maintained synopsis can stand in for the fact scan
    (and which groups it fails: rare groups have high ppm error, the
    known stratification motivation, visible in the emitted column).

    Scale plan: the sample gate is a row-local md5 predicate at the
    scan, so BOTH estimate and exact ride ONE priority-keyed aggregate
    over one scan — conditional partial aggs, no second pass, no join;
    at 100 TB you'd persist the sample as its own table (the synopsis)
    and skip the exact branch — the audit here is what certifies the
    estimator before you do.  Error is integer ppm via cross-multiplied
    BIGINT floor division — no float ratio to diverge between engines.
    """
    from hadoop_20_spark.functions import md5_long

    orders = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    in_sample = (
        md5_long(F.concat(F.lit("aqp_"), F.col("o_orderkey").cast("string")))
        % _AQP_MOD
        == 0
    ).cast("long")
    tagged = orders.select(
        "o_orderpriority", cents.alias("cents"), in_sample.alias("in_sample")
    )
    g = tagged.groupBy("o_orderpriority").agg(
        F.sum("cents").cast("long").alias("exact_cents"),
        F.count(F.lit(1)).cast("long").alias("exact_rows"),
        (F.sum(F.when(F.col("in_sample") == 1, F.col("cents")).otherwise(0)) * _AQP_MOD)
        .cast("long")
        .alias("est_cents"),
        (F.sum("in_sample") * _AQP_MOD).cast("long").alias("est_rows"),
    )
    return g.select(
        "o_orderpriority",
        "exact_rows",
        "est_rows",
        "exact_cents",
        "est_cents",
        F.expr("abs(est_cents - exact_cents) * 1000000 DIV exact_cents")
        .cast("long")
        .alias("rel_err_ppm"),
    ).orderBy("o_orderpriority")


_EPOCH_SHARDS = 8


@register(
    "epoch_shuffle_audit",
    rf"""
    WITH r0 AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY {_sql_md5_long("'epoch:0:' || doc_id")}, doc_id
             ) - 1 AS BIGINT) AS pos
      FROM documents
    ),
    r1 AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY {_sql_md5_long("'epoch:1:' || doc_id")}, doc_id
             ) - 1 AS BIGINT) AS pos
      FROM documents
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    disp AS (
      SELECT CAST(SUM(ABS(a.pos - b.pos)) AS BIGINT) AS disp_sum
      FROM r0 a JOIN r1 b ON a.doc_id = b.doc_id
    ),
    both_e AS (
      SELECT 0 AS epoch, doc_id, pos FROM r0
      UNION ALL SELECT 1, doc_id, pos FROM r1
    ),
    shards AS (
      SELECT epoch,
             pos * {_EPOCH_SHARDS} // (SELECT n FROM n) AS shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT pos) AS BIGINT) AS n_distinct_pos,
             CAST(MIN(pos) AS BIGINT) AS min_pos,
             CAST(MAX(pos) AS BIGINT) AS max_pos
      FROM both_e GROUP BY 1, 2
    )
    SELECT CAST(epoch AS BIGINT) AS epoch,
           CAST(shard AS BIGINT) AS shard,
           n_docs, n_distinct_pos, min_pos, max_pos,
           (SELECT disp_sum FROM disp) AS disp_sum,
           CAST(CAST((SELECT disp_sum FROM disp) AS HUGEINT) * 3000000
                // (CAST((SELECT n FROM n) AS HUGEINT) * (SELECT n FROM n) - 1)
             AS BIGINT) AS disp_ratio_ppm
    FROM shards ORDER BY epoch, shard
    """,
    note=(
        "deterministic epoch reshuffle for training loaders: per-epoch global "
        "position = rank of md5('epoch:e:' || doc_id) (distributed_global_rank, "
        "never a single-partition window), shard = pos*S DIV n (exact S-way "
        "count balance by construction); audits per (epoch, shard): doc count, "
        "distinct-position count (bijection proof: sums to n per epoch, shard "
        "ranges tile [0, n)) and the cross-epoch mean |displacement| as an "
        "integer ppm ratio against the random-permutation expectation "
        "(n^2-1)/(3n) — decorrelation between epochs, measured not assumed"
    ),
)
def epoch_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every LLM training run re-orders its corpus per epoch; at 100 TB
    that order must be (a) deterministic (resumable mid-epoch, same
    order on every retry), (b) shard-balanced (no loader waits on a fat
    shard), and (c) decorrelated across epochs (a rerun of the same
    order defeats the point of shuffling).  This audit produces and
    certifies such an order for two epochs: position = global rank of
    md5('epoch:e:' || doc_id) with doc_id tiebreak — a keyed-hash
    permutation, the Fisher-Yates-by-sort-key equivalent every data
    loader uses, ranked by sort.distributed_global_rank (approxQuantile
    buckets + per-bucket windows, NO Exchange SinglePartition).

    Certificates, all exact integers: per (epoch, shard = pos*S DIV n)
    the doc and distinct-position counts (shards tile [0, n) and sum to
    n — the bijection proof), and the cross-epoch sum of
    |pos_1 - pos_0| as a ppm ratio against the uniform-permutation
    expectation E|pi(i) - sigma(i)| = (n^2-1)/(3n): a ratio near 1e6
    certifies the two epochs are as uncorrelated as independent random
    permutations (identical orders would score ~0).

    Plan: two bucketed rank passes over the doc corpus (each one
    column-pruned scan + B parallel windows), one doc_id-keyed join for
    the displacement sum, one bounded (epoch, shard) aggregate.  At
    100 TB the rank IS the shuffle — no secondary sort, no driver-side
    permutation table.  Reference anchor (public hadoop-20): the
    shuffle's pseudo-random partition assignment
    (HashPartitioner.getPartition on a salted key) and
    TotalOrderPartitioner's sampled ranges, composed: salt for
    decorrelation, ranges for balance."""
    from hadoop_20_spark.functions import md5_long

    # one column-pruned scan feeds the count and both epochs' keyed
    # relations (each of which distributed_global_rank persists again
    # for its own three actions) — without this, 4 structural FileScans
    docs = _t(spark, sf_dir, "documents").select("doc_id").persist()
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def epoch_rank(e: int) -> DataFrame:
        keyed = docs.select(
            "doc_id",
            md5_long(
                F.concat(F.lit(f"epoch:{e}:"), F.col("doc_id").cast("string"))
            ).alias("h"),
        )
        ranked = sort_ops.distributed_global_rank(
            keyed, ["h", "doc_id"], rank_col="rn"
        )
        return ranked.select(
            "doc_id", (F.col("rn").cast("long") - 1).alias("pos")
        )

    r0, r1 = epoch_rank(0), epoch_rank(1)
    disp = (
        r0.select("doc_id", F.col("pos").alias("p0"))
        .join(r1.select("doc_id", F.col("pos").alias("p1")), "doc_id")
        .agg(F.sum(F.abs(F.col("p0") - F.col("p1"))).cast("long").alias("disp_sum"))
    )
    both = r0.select(F.lit(0).alias("epoch"), "doc_id", "pos").unionByName(
        r1.select(F.lit(1).alias("epoch"), "doc_id", "pos")
    )
    shards = (
        both.crossJoin(F.broadcast(n))
        .groupBy(
            "epoch", F.expr(f"pos * {_EPOCH_SHARDS} DIV n").alias("shard")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("pos").cast("long").alias("n_distinct_pos"),
            F.min("pos").cast("long").alias("min_pos"),
            F.max("pos").cast("long").alias("max_pos"),
        )
    )
    return (
        shards.crossJoin(F.broadcast(disp))
        .crossJoin(F.broadcast(n))
        .select(
            F.col("epoch").cast("long").alias("epoch"),
            F.col("shard").cast("long").alias("shard"),
            "n_docs",
            "n_distinct_pos",
            "min_pos",
            "max_pos",
            "disp_sum",
            # disp_sum ~ n^2/3, so disp_sum * 3e6 overflows BIGINT past
            # ~3M docs — Spark (non-ANSI) would wrap silently while the
            # DuckDB oracle raises.  Route the numerator through
            # DECIMAL(38,0) exact integral `div` (the gini_lorenz_audit
            # discipline); the quotient itself is <= ~3e6 so the final
            # BIGINT cast is always safe.
            F.expr(
                "(CAST(disp_sum AS DECIMAL(38,0)) * 3000000) "
                "div (CAST(n AS DECIMAL(38,0)) * n - 1)"
            )
            .cast("long")
            .alias("disp_ratio_ppm"),
        )
        .orderBy("epoch", "shard")
    )


@register(
    "weighted_reservoir_sample",
    f"""
    WITH keyed AS (
      SELECT o_orderkey, o_totalprice,
             power(
               ({_sql_md5_long("'wrs_' || CAST(o_orderkey AS VARCHAR)")} + 1)
                 / 1152921504606846976.0,
               1.0 / o_totalprice) AS k
      FROM orders
    )
    SELECT o_orderkey, (ROUND(o_totalprice, 2) + 0) AS weight,
           (ROUND(k, 7) + 0) AS ares_key
    FROM keyed
    ORDER BY k DESC, o_orderkey
    LIMIT 200
    """,
    note=(
        "Efraimidis-Spirakis A-Res weighted reservoir sample (k=200, weight "
        "= o_totalprice): key = u^(1/w) with u an md5-derived uniform, "
        "top-k by key — TakeOrderedAndProject per-partition heaps, zero "
        "data shuffle; the engine-portable u makes the sample itself "
        "deterministic, so the oracle reproduces the exact member set"
    ),
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional without-replacement sample via the A-Res key
    (Efraimidis & Spirakis 2006): every row draws u ~ U(0,1] and keeps
    key = u^(1/w); the k largest keys ARE a weighted reservoir sample.
    This is the weighted analog of InputSampler.RandomSampler
    (mapred/lib/InputSampler.java) with the house determinism twist:
    u = (md5_long('wrs_' || orderkey) + 1) / 2^60 instead of a seeded
    RNG, so any engine reproduces the identical sample membership.

    Determinism note: pow() may differ between engines in the last ulp;
    membership flips only if the k-th/k+1-th keys collide within ~1 ulp
    (md5-uniform keys — ~2^-60 probability class; the bm25 ln()
    precedent).  The emitted key is rounded once; ranking orders the
    unrounded key with an orderkey tie-break.

    Scale plan: the key is row-local (no shuffle), the reservoir is
    TakeOrderedAndProject — per-partition k-heaps merged on the driver,
    O(partitions * k) driver memory, the same economics as top_k.  At
    100 TB this is the ONLY shape that gives an exact weighted sample
    in one pass with no fact-scale exchange."""
    from hadoop_20_spark.functions import md5_long

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    u = (
        md5_long(F.concat(F.lit("wrs_"), F.col("o_orderkey").cast("string")))
        + F.lit(1)
    ) / F.lit(float(1 << 60))
    keyed = orders.withColumn("k", F.pow(u, F.lit(1.0) / F.col("o_totalprice")))
    return (
        keyed.orderBy(F.desc("k"), "o_orderkey")
        .limit(200)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("weight"),
            F.round("k", 7).alias("ares_key"),
        )
    )


@register(
    "weighted_reservoir_per_group",
    f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             power(
               ({_sql_md5_long("'wrg_' || CAST(doc_id AS VARCHAR)")} + 1)
                 / 1152921504606846976.0,
               1.0 / n_chars) AS k
      FROM documents
      WHERE n_chars > 0
    )
    SELECT lang, doc_id, n_chars AS weight, (ROUND(k, 7) + 0) AS ares_key
    FROM (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY k DESC, doc_id) AS rn
          FROM keyed)
    WHERE rn <= 40
    ORDER BY lang, ares_key DESC, doc_id
    """,
    note=(
        "per-stratum Efraimidis-Spirakis A-Res (k=40 per lang, weight = "
        "n_chars): the per-language quota sampler of a training-data mix "
        "— one rank<=k window on the lang key, which Spark rewrites to "
        "WindowGroupLimit so every map task pre-trims to its local "
        "top-40 per lang before the exchange"
    ),
)
def weighted_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum weighted reservoir: an independent A-Res sample of 40
    docs per language, weight-proportional to n_chars WITHIN each
    stratum.  The grouped twin of ``weighted_reservoir_sample`` — the
    shape a data-mix pipeline needs when each language (or source, or
    quality bucket) carries its own quota, the per-stratum analog of
    InputSampler.RandomSampler (mapred/lib/InputSampler.java) the same
    way the global entry is its whole-input analog.

    Scale plan: the A-Res key is row-local; the per-group top-k is ONE
    rank<=40 window on lang, which Spark's WindowGroupLimit rewrite
    turns into per-map-task group heaps BEFORE the exchange — shuffle
    volume is bounded by partitions * n_groups * k rows regardless of
    corpus size, so the 2x-skewed 'en' stratum costs the same as the
    rest.  No driver collect, no SinglePartition (plan-asserted in
    tests/test_round12_queries.py).  Determinism: u = md5-derived
    uniform (the weighted_reservoir_sample discipline), so both engines
    reproduce the identical member set; ranking orders the unrounded
    key with a doc_id tie-break, the emitted key is rounded once."""
    from hadoop_20_spark.functions import md5_long

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    u = (
        md5_long(F.concat(F.lit("wrg_"), F.col("doc_id").cast("string")))
        + F.lit(1)
    ) / F.lit(float(1 << 60))
    keyed = docs.filter(F.col("n_chars") > 0).withColumn(
        "k", F.pow(u, F.lit(1.0) / F.col("n_chars"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("k"), "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 40)
        .select(
            "lang",
            "doc_id",
            F.col("n_chars").alias("weight"),
            F.round("k", 7).alias("ares_key"),
        )
        .orderBy("lang", F.desc("ares_key"), "doc_id")
    )

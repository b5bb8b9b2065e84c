"""HDFS-RAID queries: erasure-coded stripes as relational aggregates.

The reference's contrib/raid (public facebookarchive/hadoop-20 —
``org/apache/hadoop/raid/RaidNode.java``) scanned HDFS for cold files,
grouped their blocks into STRIPES of k, and wrote parity so replication
could drop below 3x: XOR single parity (``XOREncoder.java`` /
``XORDecoder.java``, tolerate 1 lost block) and GF(2^8) Reed-Solomon
(``ReedSolomonCode.java``, tolerate m lost blocks; the "DiskReduce"
economics).  BlockFixer then reconstructed a missing block from the
survivors + parity.

Spark-first shape (operators/raid.py): a block is rows of
(stripe, idx, pos, value); encode AND the erasure drill run in ONE
scan + ONE (stripe, pos) aggregate — parity, survivor-reduced sums and
the erased originals are parallel conditional ``bit_xor``/``max``
aggregates over the same shuffle (map-side partials; the value domain
is bounded so nothing skews) — followed by a per-stripe fingerprint
roll-up that is ~W times smaller.  Decode algebra (GF constant
multiplies via linear power-column staging) is pure integer codegen,
reproduced expression-for-expression in the DuckDB oracles.

Block content is md5-derived from the documents table (word/byte at
position p = md5(md5(text) || ':' || p)), so the stripes carry real
corpus-derived data while staying engine-portable (SURVEY §7.4: all
hashing is md5).  At 100 TB a "block" is a 256 MB file block and ``pos``
ranges over its words; the aggregate shape is unchanged — parity build
shuffles exactly one parity-sized relation (stripes x W words), i.e.
1/k of the data size for RS(k,2), and reconstruction reads only the
damaged stripes' survivors (partition-prunable by stripe id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_20_spark.functions import md5_long
from hadoop_20_spark.operators import raid
from hadoop_20_spark.queries._base import _sql_md5_long, _t, register

_K = 5  # data blocks per stripe
_XOR_W = 4  # 60-bit words per block (XOR drill)
_RS_W = 8  # bytes per block (RS drill; GF(2^8) works on bytes)
_RS_I, _RS_J = 1, 3  # the erased pair in the RS drill (any pair decodes)


def _fp_spark(val: str = "v"):
    """Per-group md5 fingerprint of values in pos order (both engines
    render values as decimal strings joined by ',')."""
    return F.md5(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", F.col(val).alias("v")))),
                lambda s: s["v"].cast("string"),
            ),
            ",",
        )
    )


def _fp_sql(val: str) -> str:
    return f"md5(string_agg(CAST({val} AS VARCHAR), ',' ORDER BY pos))"


# ---------------------------------------------------------------------------
# XOR single parity: encode + one-erasure reconstruction, verified
# ---------------------------------------------------------------------------


@register(
    "raid_xor_erasure",
    rf"""
    WITH blocks AS (
      SELECT doc_id // {_K} AS stripe,
             doc_id % {_K} AS idx,
             unnest(range({_XOR_W})) AS pos,
             md5(text) AS seed
      FROM documents
    ),
    words AS (
      SELECT stripe, idx, pos,
             {_sql_md5_long("seed || ':' || pos")} AS w,
             {_sql_md5_long(f"'erase:' || (stripe)")} % {_K} AS e
      FROM blocks
    ),
    cells AS (
      SELECT stripe, pos,
             bit_xor(w) AS parity,
             bit_xor(CASE WHEN idx <> e THEN w END) AS surv,
             max(CASE WHEN idx = e THEN w END) AS orig,
             max(e) AS e
      FROM words GROUP BY stripe, pos
    ),
    recon AS (
      SELECT stripe, pos, e, parity, orig,
             xor(parity, COALESCE(surv, 0)) AS r
      FROM cells
    )
    SELECT stripe,
           max(e) AS erased_idx,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           {_fp_sql('parity')} AS parity_fp,
           {_fp_sql('r')} AS recon_fp,
           {_fp_sql('orig')} AS orig_fp,
           CAST(SUM(CASE WHEN r <> orig THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
    FROM recon GROUP BY stripe ORDER BY stripe
    """,
    note=(
        "XOREncoder/XORDecoder drill: stripe blocks of md5-derived words, parity = "
        "bit_xor per (stripe, pos); an md5-CHOSEN block is erased per stripe and "
        "rebuilt as parity XOR survivors — encode, erasure and originals all ride ONE "
        "scan + ONE aggregate (conditional bit_xor/max over the same shuffle); the "
        "per-stripe fingerprints prove reconstructed == lost content (n_mismatch 0)"
    ),
)
def raid_xor_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-parity RAID stripe drill (XOREncoder.java / XORDecoder.java
    / BlockFixer.java): k=5 document-derived blocks per stripe, 4 words
    each; parity is a (stripe, pos) bit_xor; the erased block (chosen by
    md5 of the stripe id, so the drill covers every slot) is rebuilt
    from parity XOR survivors and fingerprint-compared to the original.

    Plan: ONE documents scan -> explode to (stripe, idx, pos, word) ->
    ONE map-side-combined aggregate computes parity, survivor-xor and
    the erased original as parallel conditional aggregates -> a
    stripe-level roll-up W times smaller.  No joins, no second scan.
    At 100 TB the parity relation is 1/k of the data and reconstruction
    partition-prunes to the damaged stripes."""
    docs = _t(spark, sf_dir, "documents")
    blocks = docs.select(
        F.expr(f"doc_id DIV {_K}").alias("stripe"),
        (F.col("doc_id") % _K).alias("idx"),
        F.md5("text").alias("seed"),
        F.explode(F.sequence(F.lit(0), F.lit(_XOR_W - 1))).alias("pos"),
    )
    words = blocks.select(
        "stripe",
        "idx",
        "pos",
        md5_long(F.concat(F.col("seed"), F.lit(":"), F.col("pos").cast("string"))).alias("w"),
        (
            md5_long(F.concat(F.lit("erase:"), F.col("stripe").cast("string"))) % _K
        ).alias("e"),
    )
    cells = words.groupBy("stripe", "pos").agg(
        F.expr("bit_xor(w)").alias("parity"),
        F.expr("bit_xor(CASE WHEN idx <> e THEN w END)").alias("surv"),
        F.max(F.when(F.col("idx") == F.col("e"), F.col("w"))).alias("orig"),
        F.max("e").alias("e"),
    )
    recon = cells.select(
        "stripe",
        "pos",
        "e",
        "parity",
        "orig",
        F.col("parity").bitwiseXOR(F.coalesce(F.col("surv"), F.lit(0))).alias("r"),
    )
    return (
        recon.groupBy("stripe")
        .agg(
            F.max("e").alias("erased_idx"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            _fp_spark("parity").alias("parity_fp"),
            _fp_spark("r").alias("recon_fp"),
            _fp_spark("orig").alias("orig_fp"),
            F.sum(F.when(F.col("r") != F.col("orig"), 1).otherwise(0))
            .cast("long")
            .alias("n_mismatch"),
        )
        .orderBy("stripe")
    )


# ---------------------------------------------------------------------------
# Reed-Solomon RS(5, 2): P+Q encode + two-erasure decode, verified
# ---------------------------------------------------------------------------


def _rs_oracle() -> str:
    gi, _gj, inv = raid.rs_decode_constants(_RS_I, _RS_J)
    powers_b = ", ".join(raid.gf_powers_sql("b", "m"))
    powers_p = ", ".join(raid.gf_powers_sql("pstar", "pp"))
    powers_t = ", ".join(raid.gf_powers_sql("t1", "tt"))
    qc = " ".join(
        f"WHEN {l} THEN {raid.gf_combine_sql('m', raid.gf_pow_py(2, l))}"
        for l in range(_K)
    )
    return rf"""
    WITH blocks AS (
      SELECT doc_id // {_K} AS stripe,
             doc_id % {_K} AS idx,
             unnest(range({_RS_W})) AS pos,
             md5(text) AS seed
      FROM documents
    ),
    bytes AS (
      SELECT stripe, idx, pos,
             ('0x' || substr(md5(seed || ':' || pos), 1, 2))::BIGINT AS b
      FROM blocks
    ),
    contrib AS (
      SELECT stripe, idx, pos, {powers_b},
             (CASE idx {qc} ELSE 0 END) AS qc
      FROM bytes
    ),
    cells AS (
      SELECT stripe, pos,
             bit_xor(m0) AS p,
             bit_xor(qc) AS q,
             bit_xor(CASE WHEN idx NOT IN ({_RS_I}, {_RS_J}) THEN m0 END) AS sp,
             bit_xor(CASE WHEN idx NOT IN ({_RS_I}, {_RS_J}) THEN qc END) AS sq,
             max(CASE WHEN idx = {_RS_I} THEN m0 END) AS o_i,
             max(CASE WHEN idx = {_RS_J} THEN m0 END) AS o_j
      FROM contrib GROUP BY stripe, pos
    ),
    star AS (
      SELECT stripe, pos, p, q, o_i, o_j,
             xor(p, COALESCE(sp, 0)) AS pstar,
             xor(q, COALESCE(sq, 0)) AS qstar
      FROM cells
    ),
    dj_t AS (
      SELECT stripe, pos, p, q, o_i, o_j, pstar, qstar, {powers_p},
             xor(qstar, {raid.gf_combine_sql('pp', gi)}) AS t1
      FROM star
    ),
    dec AS (
      SELECT stripe, pos, p, q, o_i, o_j, pstar, {powers_t},
             {raid.gf_combine_sql('tt', inv)} AS d_j
      FROM dj_t
    ),
    final AS (
      SELECT stripe, pos, p, q, o_i, o_j, d_j,
             xor(pstar, d_j) AS d_i
      FROM dec
    )
    SELECT stripe,
           CAST(COUNT(*) AS BIGINT) AS n_bytes,
           {_fp_sql('p')} AS p_fp,
           {_fp_sql('q')} AS q_fp,
           {_fp_sql('d_i')} AS di_fp,
           {_fp_sql('d_j')} AS dj_fp,
           CAST(SUM(CASE WHEN d_i <> o_i OR d_j <> o_j THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mismatch
    FROM final GROUP BY stripe ORDER BY stripe
    """


@register(
    "raid_rs_two_erasure",
    _rs_oracle(),
    note=(
        "ReedSolomonCode.java drill, RS(5,2) over GF(2^8): P = xor of the stripe's "
        "bytes, Q = xor of g^idx-weighted bytes (generator multiplies via linear "
        "power-column staging — no lookup tables, pure shift/mask/xor codegen "
        "identical in both engines); blocks 1 and 3 are erased in every stripe and "
        "BOTH are recovered by the 2x2 GF solve (survivor-reduced P*/Q*, constant "
        "multiplies by g^i and inv(g^i^g^j)); per-stripe fingerprints + n_mismatch 0 "
        "prove decode == original, cell-for-cell"
    ),
)
def raid_rs_two_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reed-Solomon RS(5,2) stripe drill — the reference's marquee
    storage feature (contrib/raid ReedSolomonCode.java; DiskReduce: the
    code that let HDFS run below 2x effective replication).  Every
    stripe loses TWO blocks (indexes 1 and 3) and recovers both:

        P* = P ^ xor(survivors)         = D_i ^ D_j
        Q* = Q ^ xor(g^l-weighted surv) = g^i.D_i ^ g^j.D_j
        D_j = inv(g^i ^ g^j) . (Q* ^ g^i.P*);   D_i = P* ^ D_j

    GF(2^8) products-by-constant are XORs of precomputed power columns
    (x, 2x, ..., 128x — each level one shift/mask/xor off the previous
    ATTRIBUTE, so the plan stays linear); decode constants come from the
    Python field model at build time (raid.rs_decode_constants).

    Plan: ONE documents scan -> (stripe, idx, pos, byte) with power
    columns -> ONE map-side-combined aggregate yields P, Q, survivor
    reductions and both erased originals -> flat GF solve on the
    aggregated cells (no join, no second shuffle) -> stripe roll-up.
    Same 100 TB posture as raid_xor_erasure: parity = 2/k of data,
    repairs partition-prune to damaged stripes."""
    gi, _gj, inv = raid.rs_decode_constants(_RS_I, _RS_J)
    docs = _t(spark, sf_dir, "documents")
    blocks = docs.select(
        F.expr(f"doc_id DIV {_K}").alias("stripe"),
        (F.col("doc_id") % _K).alias("idx"),
        F.md5("text").alias("seed"),
        F.explode(F.sequence(F.lit(0), F.lit(_RS_W - 1))).alias("pos"),
    )
    by = blocks.select(
        "stripe",
        "idx",
        "pos",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("seed"), F.lit(":"), F.col("pos").cast("string"))),
                1,
                2,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("b"),
    )
    contrib = raid.with_gf_powers(by, "b", "m")
    expr = None
    for l in range(_K):
        branch = F.when(F.col("idx") == l, raid.gf_combine("m", raid.gf_pow_py(2, l)))
        expr = branch if expr is None else expr.when(
            F.col("idx") == l, raid.gf_combine("m", raid.gf_pow_py(2, l))
        )
    contrib = contrib.withColumn("qc", expr.otherwise(F.lit(0)).cast("bigint"))
    erased = f"idx IN ({_RS_I}, {_RS_J})"
    cells = contrib.groupBy("stripe", "pos").agg(
        F.expr("bit_xor(m0)").alias("p"),
        F.expr("bit_xor(qc)").alias("q"),
        F.expr(f"bit_xor(CASE WHEN NOT ({erased}) THEN m0 END)").alias("sp"),
        F.expr(f"bit_xor(CASE WHEN NOT ({erased}) THEN qc END)").alias("sq"),
        F.max(F.when(F.col("idx") == _RS_I, F.col("m0"))).alias("o_i"),
        F.max(F.when(F.col("idx") == _RS_J, F.col("m0"))).alias("o_j"),
    )
    star = cells.select(
        "stripe",
        "pos",
        "p",
        "q",
        "o_i",
        "o_j",
        F.col("p").bitwiseXOR(F.coalesce(F.col("sp"), F.lit(0))).alias("pstar"),
        F.col("q").bitwiseXOR(F.coalesce(F.col("sq"), F.lit(0))).alias("qstar"),
    )
    star = raid.with_gf_powers(star, "pstar", "pp")
    star = star.withColumn(
        "t1", F.col("qstar").bitwiseXOR(raid.gf_combine("pp", gi))
    )
    star = raid.with_gf_powers(star, "t1", "tt")
    final = star.withColumn("d_j", raid.gf_combine("tt", inv).cast("bigint")).withColumn(
        "d_i", F.col("pstar").bitwiseXOR(F.col("d_j"))
    )
    return (
        final.groupBy("stripe")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bytes"),
            _fp_spark("p").alias("p_fp"),
            _fp_spark("q").alias("q_fp"),
            _fp_spark("d_i").alias("di_fp"),
            _fp_spark("d_j").alias("dj_fp"),
            F.sum(
                F.when(
                    (F.col("d_i") != F.col("o_i")) | (F.col("d_j") != F.col("o_j")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_mismatch"),
        )
        .orderBy("stripe")
    )


# ---------------------------------------------------------------------------
# Incremental parity maintenance: delta-XOR update == full re-encode
# ---------------------------------------------------------------------------


@register(
    "raid_parity_delta_maintenance",
    rf"""
    WITH blocks AS (
      SELECT doc_id // {_K} AS stripe,
             doc_id % {_K} AS idx,
             unnest(range({_XOR_W})) AS pos,
             md5(text) AS seed,
             {_sql_md5_long("'delta:' || doc_id")} % 7 = 0 AS changed
      FROM documents
    ),
    words AS (
      SELECT stripe, idx, pos, changed,
             {_sql_md5_long("seed || ':' || pos")} AS w_old,
             CASE WHEN changed
                  THEN {_sql_md5_long("seed || ':v2:' || pos")}
                  ELSE {_sql_md5_long("seed || ':' || pos")} END AS w_new
      FROM blocks
    ),
    cells AS (
      SELECT stripe, pos,
             bit_xor(w_old) AS parity_old,
             bit_xor(CASE WHEN changed THEN xor(w_old, w_new) END) AS delta,
             bit_xor(w_new) AS rebuilt,
             CAST(SUM(CASE WHEN changed AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nc
      FROM words GROUP BY stripe, pos
    ),
    m AS (
      SELECT stripe, pos, parity_old, rebuilt, nc,
             xor(parity_old, COALESCE(delta, 0)) AS maintained
      FROM cells
    )
    SELECT stripe,
           CAST(SUM(nc) AS BIGINT) AS n_changed_blocks,
           {_fp_sql('parity_old')} AS parity_old_fp,
           {_fp_sql('maintained')} AS maintained_fp,
           {_fp_sql('rebuilt')} AS rebuilt_fp,
           CAST(SUM(CASE WHEN maintained <> rebuilt THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mismatch
    FROM m GROUP BY stripe ORDER BY stripe
    """,
    note=(
        "incremental parity maintenance (RaidNode's economics on append/update: "
        "never re-read the stripe): parity' = parity XOR (old XOR new) over only the "
        "CHANGED blocks — maintained fingerprint must equal the full re-encode, "
        "per (stripe, pos), proven in-query (n_mismatch 0); old parity, the delta "
        "and the rebuild all ride ONE aggregate as conditional bit_xors"
    ),
)
def raid_parity_delta_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge==rebuild discipline (incremental_agg_maintenance,
    postings_delta_merge) applied to erasure parity: when a block is
    rewritten, the new parity is parity_old XOR old XOR new — an
    O(changed-blocks) update — and must be bit-identical to re-encoding
    the whole stripe.  XOR's self-inverse property is exactly why
    single-parity RAID can absorb writes without stripe re-reads; a
    ~1/7 md5 class of documents takes new content (re-derived words)
    and every stripe's maintained parity is checked against its full
    rebuild.

    Plan: ONE scan; old/new words and the changed flag are row-local;
    parity_old, the delta XOR and the rebuilt parity are parallel
    conditional bit_xors in ONE (stripe, pos) aggregate; the roll-up
    emits per-stripe fingerprints + n_mismatch.  At 100 TB the
    maintained path touches only changed blocks + the parity file —
    data movement proportional to the WRITE, not the stripe (the whole
    point of contrib/raid's purge/recreate cycle being incremental)."""
    docs = _t(spark, sf_dir, "documents")
    blocks = docs.select(
        F.expr(f"doc_id DIV {_K}").alias("stripe"),
        (F.col("doc_id") % _K).alias("idx"),
        F.md5("text").alias("seed"),
        (md5_long(F.concat(F.lit("delta:"), F.col("doc_id").cast("string"))) % 7 == 0).alias(
            "changed"
        ),
        F.explode(F.sequence(F.lit(0), F.lit(_XOR_W - 1))).alias("pos"),
    )
    pos_s = F.col("pos").cast("string")
    w_old = md5_long(F.concat(F.col("seed"), F.lit(":"), pos_s))
    w_v2 = md5_long(F.concat(F.col("seed"), F.lit(":v2:"), pos_s))
    words = blocks.select(
        "stripe",
        "pos",
        "changed",
        w_old.alias("w_old"),
        F.when(F.col("changed"), w_v2).otherwise(w_old).alias("w_new"),
    )
    cells = words.groupBy("stripe", "pos").agg(
        F.expr("bit_xor(w_old)").alias("parity_old"),
        F.expr("bit_xor(CASE WHEN changed THEN w_old ^ w_new END)").alias("delta"),
        F.expr("bit_xor(w_new)").alias("rebuilt"),
        F.sum(F.when(F.col("changed") & (F.col("pos") == 0), 1).otherwise(0))
        .cast("long")
        .alias("nc"),
    )
    m = cells.select(
        "stripe",
        "pos",
        "parity_old",
        "rebuilt",
        "nc",
        F.col("parity_old")
        .bitwiseXOR(F.coalesce(F.col("delta"), F.lit(0)))
        .alias("maintained"),
    )
    return (
        m.groupBy("stripe")
        .agg(
            F.sum("nc").cast("long").alias("n_changed_blocks"),
            _fp_spark("parity_old").alias("parity_old_fp"),
            _fp_spark("maintained").alias("maintained_fp"),
            _fp_spark("rebuilt").alias("rebuilt_fp"),
            F.sum(F.when(F.col("maintained") != F.col("rebuilt"), 1).otherwise(0))
            .cast("long")
            .alias("n_mismatch"),
        )
        .orderBy("stripe")
    )


# ---------------------------------------------------------------------------
# Block placement + balancer audit (round 9)
# ---------------------------------------------------------------------------
_N_RACKS = 8
_NODES_PER_RACK = 5
_N_NODES = _N_RACKS * _NODES_PER_RACK
_BAL_THRESH_PPM = 100_000  # Balancer's default 10% utilization band


@register(
    "block_placement_audit",
    rf"""
    WITH b AS (
      SELECT o_orderkey AS k,
             {_sql_md5_long("'w:' || o_orderkey")} % {_N_NODES} AS n1,
             {_sql_md5_long("'r2:' || o_orderkey")} % {_N_RACKS - 1} AS r2_off,
             {_sql_md5_long("'n2:' || o_orderkey")} % {_NODES_PER_RACK} AS n2_in,
             {_sql_md5_long("'n3:' || o_orderkey")} % {_NODES_PER_RACK - 1} AS n3_off
      FROM orders
    ),
    placed AS (
      SELECT k, n1,
             ((n1 // {_NODES_PER_RACK}) + 1 + r2_off) % {_N_RACKS} AS r2
      FROM b
    ),
    placed2 AS (
      SELECT b.k, b.n1,
             p.r2 * {_NODES_PER_RACK} + b.n2_in AS n2,
             p.r2 * {_NODES_PER_RACK}
               + (b.n2_in + 1 + b.n3_off) % {_NODES_PER_RACK} AS n3
      FROM b JOIN placed p ON p.k = b.k
    ),
    reps AS (
      SELECT k, n1 AS node, 1 AS is_primary FROM placed2
      UNION ALL SELECT k, n2, 0 FROM placed2
      UNION ALL SELECT k, n3, 0 FROM placed2
    ),
    viol AS (
      SELECT CAST(SUM(CASE WHEN n1 = n2 OR n1 = n3 OR n2 = n3 THEN 1 ELSE 0 END)
                  + SUM(CASE WHEN n1 // {_NODES_PER_RACK} = n2 // {_NODES_PER_RACK}
                             THEN 1 ELSE 0 END)
                  + SUM(CASE WHEN n2 // {_NODES_PER_RACK} <> n3 // {_NODES_PER_RACK}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
             CAST(COUNT(*) * 3 AS BIGINT) AS n_replicas
      FROM placed2
    ),
    pernode AS (
      SELECT node,
             CAST(node // {_NODES_PER_RACK} AS BIGINT) AS rack,
             CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(SUM(is_primary) AS BIGINT) AS n_primary
      FROM reps GROUP BY node
    )
    SELECT p.node, p.rack, p.n_primary, p.n_total,
           CAST(p.n_total * {_N_NODES} * 1000000 // v.n_replicas
                - 1000000 AS BIGINT) AS util_dev_ppm,
           CASE
             WHEN p.n_total * {_N_NODES} * 1000000 // v.n_replicas
                  - 1000000 > {_BAL_THRESH_PPM} THEN 'over'
             WHEN p.n_total * {_N_NODES} * 1000000 // v.n_replicas
                  - 1000000 < -{_BAL_THRESH_PPM} THEN 'under'
             ELSE 'within' END AS balance_class,
           v.n_violations
    FROM pernode p CROSS JOIN viol v
    ORDER BY p.node
    """,
    note=(
        "BlockPlacementPolicyDefault + Balancer audit: every block places 3 replicas "
        "by md5 arithmetic under the reference's invariants (writer node; second "
        "replica on a DIFFERENT rack via a 1..R-1 offset, so the constraint holds by "
        "construction AND is re-checked; third on the second's rack, different node); "
        "the report is per-node utilization deviation in integer ppm against the "
        "Balancer's 10% band, with the policy-violation count (0) attached"
    ),
)
def block_placement_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replica placement + cluster balance as a relational audit — the
    two HDFS-layer policies the reference operated by
    (``hdfs/server/namenode/BlockPlacementPolicyDefault.java``: writer
    node, remote rack, same-remote-rack spread;
    ``hdfs/server/balancer/Balancer.java``: move replicas until every
    node sits within a 10% utilization band of the cluster mean).

    Placement is deterministic md5 arithmetic (offsets drawn from
    1..R-1 / 1..M-1 so the different-rack / different-node invariants
    hold by construction), then the audit RE-CHECKS the invariants from
    the placed rows (n_violations, expected 0 — a policy regression
    flips it) and reports per-node totals and the integer-ppm deviation
    from the cluster mean with the Balancer's over/under/within
    classification.

    Plan: placement is row-local codegen off one orders scan; the only
    shuffles are the 3x-exploded (node) count aggregate (40-key domain,
    map-side partials) and a broadcast 1-row violations attach.  At
    100 TB this is the block-report → balancer-plan pipeline: per-node
    aggregates are node-count-sized regardless of block count."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("string")
    b = o.select(
        F.col("o_orderkey").alias("k"),
        (md5_long(F.concat(F.lit("w:"), k)) % _N_NODES).alias("n1"),
        (md5_long(F.concat(F.lit("r2:"), k)) % (_N_RACKS - 1)).alias("r2_off"),
        (md5_long(F.concat(F.lit("n2:"), k)) % _NODES_PER_RACK).alias("n2_in"),
        (md5_long(F.concat(F.lit("n3:"), k)) % (_NODES_PER_RACK - 1)).alias("n3_off"),
    )
    r2 = (F.expr(f"n1 DIV {_NODES_PER_RACK}") + 1 + F.col("r2_off")) % _N_RACKS
    placed = b.select(
        "k",
        "n1",
        (r2 * _NODES_PER_RACK + F.col("n2_in")).alias("n2"),
        (
            r2 * _NODES_PER_RACK
            + (F.col("n2_in") + 1 + F.col("n3_off")) % _NODES_PER_RACK
        ).alias("n3"),
    )
    rack = lambda c: F.expr(f"{c} DIV {_NODES_PER_RACK}")  # noqa: E731
    viol = placed.agg(
        (
            F.sum(
                F.when(
                    (F.col("n1") == F.col("n2"))
                    | (F.col("n1") == F.col("n3"))
                    | (F.col("n2") == F.col("n3")),
                    1,
                ).otherwise(0)
            )
            + F.sum(F.when(rack("n1") == rack("n2"), 1).otherwise(0))
            + F.sum(F.when(rack("n2") != rack("n3"), 1).otherwise(0))
        )
        .cast("long")
        .alias("n_violations"),
        (F.count(F.lit(1)) * 3).cast("long").alias("n_replicas"),
    )
    # explode, never a 3-branch union: each union branch re-plans the
    # whole placement subtree (3 structural FileScans of orders for one
    # logical pass — plan-smell audited)
    reps = placed.select(
        F.explode(
            F.array(
                F.struct(F.col("n1").alias("node"), F.lit(1).alias("is_primary")),
                F.struct(F.col("n2").alias("node"), F.lit(0).alias("is_primary")),
                F.struct(F.col("n3").alias("node"), F.lit(0).alias("is_primary")),
            )
        ).alias("r")
    ).select("r.node", "r.is_primary")
    pernode = reps.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("is_primary").cast("long").alias("n_primary"),
    )
    dev = F.expr(f"n_total * {_N_NODES} * 1000000 DIV n_replicas") - 1000000
    return (
        pernode.crossJoin(F.broadcast(viol))
        .select(
            "node",
            F.expr(f"node DIV {_NODES_PER_RACK}").cast("long").alias("rack"),
            "n_primary",
            "n_total",
            dev.cast("long").alias("util_dev_ppm"),
            F.when(dev > _BAL_THRESH_PPM, "over")
            .when(dev < -_BAL_THRESH_PPM, "under")
            .otherwise("within")
            .alias("balance_class"),
            "n_violations",
        )
        .orderBy("node")
    )


_HRW_NODES = 10
_HRW_REMOVED = 3


@register(
    "rendezvous_placement_audit",
    f"""
    WITH blocks AS (SELECT o_orderkey AS b FROM orders),
    w AS (
      SELECT b, n,
             {_sql_md5_long("'blk_' || CAST(b AS VARCHAR) || '#node_' || CAST(n AS VARCHAR)")} AS wt
      FROM blocks, unnest(range(0, {_HRW_NODES})) t(n)
    ),
    own AS (
      SELECT b,
             arg_max(n, wt) AS before_node,
             arg_max(CASE WHEN n <> {_HRW_REMOVED} THEN n END,
                     CASE WHEN n <> {_HRW_REMOVED} THEN wt END) AS after_node
      FROM w GROUP BY b
    )
    SELECT CAST(before_node AS INT) AS owner_node,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN after_node <> before_node THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
    FROM own GROUP BY before_node ORDER BY owner_node
    """,
    note=(
        "rendezvous (highest-random-weight) hashing placement audit: every block's "
        "owner = argmax over nodes of md5(block#node); removing one node provably "
        "moves ONLY that node's blocks (n_moved = n_blocks exactly on the removed "
        "row, 0 elsewhere — the minimal-disruption contract, hash-checked), with "
        "the survivors absorbing its load near-uniformly"
    ),
)
def rendezvous_placement_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent data placement without a ring: HRW/rendezvous hashing
    (Thaler & Ravishankar 1996 — public algorithm) assigns each block
    to the node with the highest md5(block, node) weight.  The audited
    contract is minimal disruption: decommissioning node 3 re-homes
    EXACTLY the blocks node 3 owned (other blocks' argmax is unchanged
    by removing a non-maximal candidate) — the property the reference's
    Balancer/decommission path (`hdfs/server/balancer/Balancer.java`,
    `BlockPlacementPolicyDefault.java`) approximates operationally and
    HRW gives algebraically.

    Spark plan: ONE scan of orders, a constant xN node fan-out
    (explode of a literal array — row-local), then BOTH the full and
    the node-removed argmax ride the SAME (block)-keyed aggregate as
    parallel max(struct) / conditional-max(struct) partial aggs — one
    fact shuffle total; the readout groups by the 10-value owner
    domain.  At 100 TB the weight relation is never materialized
    wider than the fan-out, and per-block work is pure codegen md5 —
    this is exactly how a 1000-node placement map stays a streaming
    pass.  All hashing is md5_long, bit-identical in the oracle.
    """
    orders = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("b"))
    nodes = F.array(*[F.lit(n) for n in range(_HRW_NODES)])
    w = orders.select(
        "b",
        F.explode(nodes).alias("n"),
    ).select(
        "b",
        "n",
        md5_long(
            F.concat(
                F.lit("blk_"),
                F.col("b").cast("string"),
                F.lit("#node_"),
                F.col("n").cast("string"),
            )
        ).alias("wt"),
    )
    own = w.groupBy("b").agg(
        F.max(F.struct("wt", "n")).alias("mb"),
        F.max(
            F.when(F.col("n") != _HRW_REMOVED, F.struct("wt", "n"))
        ).alias("ma"),
    )
    return (
        own.select(
            F.col("mb.n").cast("int").alias("owner_node"),
            (F.col("ma.n") != F.col("mb.n")).cast("long").alias("moved"),
        )
        .groupBy("owner_node")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum("moved").cast("long").alias("n_moved"),
        )
        .orderBy("owner_node")
    )


@register(
    "balancer_move_plan",
    rf"""
    WITH b AS (
      SELECT o_orderkey AS k,
             {_sql_md5_long("'w:' || o_orderkey")} % {_N_NODES} AS n1,
             {_sql_md5_long("'r2:' || o_orderkey")} % {_N_RACKS - 1} AS r2_off,
             {_sql_md5_long("'n2:' || o_orderkey")} % {_NODES_PER_RACK} AS n2_in,
             {_sql_md5_long("'n3:' || o_orderkey")} % {_NODES_PER_RACK - 1} AS n3_off
      FROM orders
    ),
    placed AS (
      SELECT k, n1, ((n1 // {_NODES_PER_RACK}) + 1 + r2_off) % {_N_RACKS} AS r2
      FROM b
    ),
    placed2 AS (
      SELECT b.k, b.n1,
             p.r2 * {_NODES_PER_RACK} + b.n2_in AS n2,
             p.r2 * {_NODES_PER_RACK}
               + (b.n2_in + 1 + b.n3_off) % {_NODES_PER_RACK} AS n3
      FROM b JOIN placed p ON p.k = b.k
    ),
    reps AS (
      SELECT n1 AS node FROM placed2
      UNION ALL SELECT n2 FROM placed2
      UNION ALL SELECT n3 FROM placed2
    ),
    spine AS (SELECT unnest(range({_N_NODES})) AS node),
    pernode AS (
      SELECT s.node,
             CAST(COALESCE(c.n, 0) AS BIGINT) AS n_total
      FROM spine s LEFT JOIN (SELECT node, COUNT(*) AS n FROM reps GROUP BY 1) c
        ON c.node = s.node
    ),
    tot AS (SELECT CAST(SUM(n_total) AS BIGINT) AS t FROM pernode),
    tgt AS (
      SELECT node, n_total,
             (SELECT t FROM tot) // {_N_NODES}
               + CASE WHEN node < (SELECT t FROM tot) % {_N_NODES}
                      THEN 1 ELSE 0 END AS target
      FROM pernode
    ),
    over_n AS (
      SELECT node, n_total - target AS surplus,
             SUM(n_total - target) OVER (ORDER BY node) AS hi
      FROM tgt WHERE n_total > target
    ),
    under_n AS (
      SELECT node, target - n_total AS deficit,
             SUM(target - n_total) OVER (ORDER BY node) AS hi
      FROM tgt WHERE n_total < target
    ),
    moves AS (
      SELECT o.node AS src_node, u.node AS dst_node,
             CAST(LEAST(o.hi, u.hi)
                  - GREATEST(o.hi - o.surplus, u.hi - u.deficit) AS BIGINT)
               AS blocks_moved
      FROM over_n o JOIN under_n u
        ON o.hi - o.surplus < u.hi AND u.hi - u.deficit < o.hi
    )
    SELECT CAST(src_node AS BIGINT) AS src_node,
           CAST(dst_node AS BIGINT) AS dst_node,
           blocks_moved,
           CAST(SUM(blocks_moved) OVER () AS BIGINT) AS total_moved,
           CAST((SELECT COUNT(*) FROM over_n) AS BIGINT) AS n_sources,
           CAST((SELECT COUNT(*) FROM under_n) AS BIGINT) AS n_targets
    FROM moves ORDER BY src_node, dst_node
    """,
    note=(
        "Balancer move plan (hdfs/server/balancer/Balancer.java): per-node replica "
        "totals vs the exact balanced allocation (t DIV n + remainder spread), then "
        "over-nodes and under-nodes each laid out on a cumulative block axis and "
        "matched by an interval-overlap join — the greedy source->target pairing as "
        "ONE range join instead of the reference's iterative chooseNodes loop; "
        "move conservation (sum moved = total surplus = total deficit) rides along, "
        "post-move every node lands exactly on target"
    ),
)
def balancer_move_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Balancer's actual OUTPUT — which node ships how many blocks
    to which — not just the over/under classification
    (:func:`block_placement_audit` stops there).  Greedy pairing in
    node order is an interval-alignment: lay the over-nodes' surpluses
    end to end on a cumulative axis, lay the under-nodes' deficits on
    the same axis, and every overlap [max(lo_o, lo_u), min(hi_o, hi_u))
    is a move of that many blocks.  The pairing is deterministic,
    conserves blocks by construction, and lands every node EXACTLY on
    the balanced allocation (t DIV n, remainder to the lowest node
    ids) — stronger than the 10%-band stop condition the reference's
    iterator used, and exactly reproducible by the oracle.

    Plan: placement is row-local codegen off one orders scan; per-node
    totals are a 40-key aggregate with map-side partials; everything
    after (targets, cumulative axes, the overlap join) runs on <= 40
    rows.  At 100 TB the move plan is node-count-sized regardless of
    block count — the block-report aggregation is the only fact-scale
    stage, as in the reference's balancer (which planned from datanode
    utilization reports, never per-block scans)."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("string")
    b = o.select(
        (md5_long(F.concat(F.lit("w:"), k)) % _N_NODES).alias("n1"),
        (md5_long(F.concat(F.lit("r2:"), k)) % (_N_RACKS - 1)).alias("r2_off"),
        (md5_long(F.concat(F.lit("n2:"), k)) % _NODES_PER_RACK).alias("n2_in"),
        (md5_long(F.concat(F.lit("n3:"), k)) % (_NODES_PER_RACK - 1)).alias("n3_off"),
    )
    r2 = (F.expr(f"n1 DIV {_NODES_PER_RACK}") + 1 + F.col("r2_off")) % _N_RACKS
    placed = b.select(
        "n1",
        (r2 * _NODES_PER_RACK + F.col("n2_in")).alias("n2"),
        (
            r2 * _NODES_PER_RACK
            + (F.col("n2_in") + 1 + F.col("n3_off")) % _NODES_PER_RACK
        ).alias("n3"),
    )
    # explode, never a 3-branch union: each union branch re-plans the
    # whole placement subtree (3 structural FileScans of orders for one
    # logical pass — plan-smell audited)
    reps = placed.select(
        F.explode(F.array("n1", "n2", "n3")).alias("node")
    )
    spine = spark.range(_N_NODES).select(F.col("id").alias("node"))
    # pernode is THE fact-scale reduction (40 rows) and every downstream
    # relation — totals, targets, both cumulative axes, the pairing —
    # derives from it: persist per the house rule, or each of the ~6
    # consumers re-scans orders and re-places every block (24 structural
    # FileScans without this; 1 with it, plan-smell audited)
    pernode = (
        spine.join(
            reps.groupBy("node").agg(F.count(F.lit(1)).alias("n")), "node", "left"
        )
        .select("node", F.coalesce("n", F.lit(0)).cast("long").alias("n_total"))
        .persist()
    )
    tot = pernode.agg(F.sum("n_total").cast("long").alias("t"))
    tgt = pernode.crossJoin(F.broadcast(tot)).select(
        "node",
        "n_total",
        (
            F.expr(f"t DIV {_N_NODES}")
            + (F.col("node") < F.col("t") % _N_NODES).cast("long")
        ).alias("target"),
    )
    # cumulative axes over <= 40 rows: the non-foldable constant-key
    # window idiom (node % 1) keeps WindowExec partitioned
    w = Window.partitionBy(F.col("node") % 1).orderBy("node")
    over = (
        tgt.filter(F.col("n_total") > F.col("target"))
        .select("node", (F.col("n_total") - F.col("target")).alias("surplus"))
        .withColumn("hi", F.sum("surplus").over(w))
    )
    under = (
        tgt.filter(F.col("n_total") < F.col("target"))
        .select("node", (F.col("target") - F.col("n_total")).alias("deficit"))
        .withColumn("hi", F.sum("deficit").over(w))
    )
    ov = over.select(
        F.col("node").alias("src_node"),
        (F.col("hi") - F.col("surplus")).alias("o_lo"),
        F.col("hi").alias("o_hi"),
    )
    un = under.select(
        F.col("node").alias("dst_node"),
        (F.col("hi") - F.col("deficit")).alias("u_lo"),
        F.col("hi").alias("u_hi"),
    )
    moves = (
        ov.join(un, (F.col("o_lo") < F.col("u_hi")) & (F.col("u_lo") < F.col("o_hi")))
        .select(
            F.col("src_node").cast("long").alias("src_node"),
            F.col("dst_node").cast("long").alias("dst_node"),
            (
                F.least("o_hi", "u_hi") - F.greatest("o_lo", "u_lo")
            ).cast("long").alias("blocks_moved"),
        )
    )
    nsrc = over.agg(F.count(F.lit(1)).cast("long").alias("n_sources"))
    ndst = under.agg(F.count(F.lit(1)).cast("long").alias("n_targets"))
    wall = Window.partitionBy(F.col("src_node") % 1)
    return (
        moves.withColumn(
            "total_moved", F.sum("blocks_moved").over(wall).cast("long")
        )
        .crossJoin(F.broadcast(nsrc))
        .crossJoin(F.broadcast(ndst))
        .select(
            "src_node", "dst_node", "blocks_moved",
            "total_moved", "n_sources", "n_targets",
        )
        .orderBy("src_node", "dst_node")
    )


@register(
    "namespace_quota_audit",
    """
    WITH cg AS (
      SELECT r_name, n_name, n_nationkey, c_custkey,
             COUNT(*) AS files,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS DECIMAL(38,0))) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name, n_nationkey, c_custkey
    ),
    rolled AS (
      SELECT r_name, n_name,
             GROUPING(r_name) AS g_r, GROUPING(n_name) AS g_n,
             SUM(files) AS file_count,
             SUM(cents) AS bytes_dec,
             COUNT(*) AS n_cust,
             COUNT(DISTINCT n_name) AS cd_nation,
             COUNT(DISTINCT r_name) AS cd_region,
             MAX(n_nationkey) AS nkey
      FROM cg GROUP BY ROLLUP (r_name, n_name)
    ),
    lv AS (
      SELECT *,
             CASE WHEN g_n = 0 THEN 2 WHEN g_r = 0 THEN 1 ELSE 0 END AS level
      FROM rolled
    ),
    summary AS (
      SELECT
        CASE level WHEN 0 THEN '/'
                   WHEN 1 THEN '/' || r_name
                   ELSE '/' || r_name || '/' || n_name END AS path,
        CAST(level AS BIGINT) AS level,
        CAST(1 + CASE level WHEN 0 THEN cd_region + cd_nation
                            WHEN 1 THEN cd_nation ELSE 0 END + n_cust
             AS BIGINT) AS dir_count,
        CAST(file_count AS BIGINT) AS file_count,
        CAST(CASE level WHEN 0 THEN 50000000 WHEN 1 THEN 5000000
                        ELSE 512 * (1 + nkey % 4) END AS BIGINT) AS ns_quota,
        CAST(bytes_dec AS BIGINT) AS bytes_used,
        CAST(CASE level WHEN 0 THEN 1000000000000000
                        WHEN 1 THEN 200000000000000
                        ELSE 8000000000 * (1 + nkey % 3) END
             AS BIGINT) AS space_quota,
        n_cust, cd_nation, cd_region, nkey
      FROM lv
    )
    SELECT path, level, dir_count, file_count,
           CAST(dir_count + file_count AS BIGINT) AS ns_used,
           ns_quota,
           CAST(ns_quota - (dir_count + file_count) AS BIGINT) AS ns_remaining,
           CAST(CASE WHEN dir_count + file_count > ns_quota
                     THEN 1 ELSE 0 END AS BIGINT) AS over_ns,
           bytes_used, space_quota,
           CAST(space_quota - bytes_used AS BIGINT) AS space_remaining,
           CAST(CASE WHEN bytes_used > space_quota THEN 1 ELSE 0 END
                AS BIGINT) AS over_space
    FROM summary
    ORDER BY level, path
    """,
    note=(
        "NameNode namespace + space quota audit (ContentSummary / `fs "
        "-count -q` readout) over the /region/nation/customer/order file "
        "tree: customer-grain pre-agg (ONE fact shuffle), then ONE "
        "rollup(region, nation) — 31 subtree rows at any corpus size; "
        "quotas deterministic per level, remaining may go negative"
    ),
)
def namespace_quota_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference NameNode's quota machinery re-expressed as a
    relational rollup: every order is a file at
    /<region>/<nation>/<customer>/<order> of size o_totalprice cents;
    the audit emits, per directory at root/region/nation level, the
    ContentSummary tuple (dir_count including self, file_count,
    ns_used = dirs + files, bytes_used) against per-level namespace and
    space quotas (FSDirectory#updateCount / INodeDirectoryWithQuota /
    ContentSummary semantics; QuotaExceededException becomes the
    over_ns/over_space flags with signed remaining columns).
    Directories exist only on file paths (a customer with no orders has
    no directory), matching HDFS where quota is checked on the INode
    tree that actually exists.

    Determinism: all counts/quotas are integers; bytes ride
    DECIMAL(38,0) cents (the gini cast idiom) and quotas are
    deterministic functions of n_nationkey, so over_* flags flip with
    scale factor and the oracle recomputes them bit-for-bit.

    Scale plan: the ONLY fact-scale exchange is the customer-grain
    pre-aggregation (partial count/sum map-side); the rollup + its
    3-way distinct expand runs on the customer-count-sized relation
    (150k rows at sf1 — never the orders).  dir_count at level L needs
    the distinct-descendant counts, which is why the rollup rides the
    customer grain rather than re-scanning orders per level.  At 100 TB
    the pre-agg is the same one shuffle any per-customer query pays;
    the subtree report stays 31 rows."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cents = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("decimal(38,0)")
    cg = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name", "n_nationkey", "c_custkey")
        .agg(
            F.count(F.lit(1)).alias("files"),
            F.sum(cents).alias("cents"),
        )
    )
    rolled = cg.rollup("r_name", "n_name").agg(
        F.grouping("r_name").alias("g_r"),
        F.grouping("n_name").alias("g_n"),
        F.sum("files").alias("file_count"),
        F.sum("cents").alias("bytes_dec"),
        F.count(F.lit(1)).alias("n_cust"),
        F.countDistinct("n_name").alias("cd_nation"),
        F.countDistinct("r_name").alias("cd_region"),
        F.max("n_nationkey").alias("nkey"),
    )
    level = F.when(F.col("g_n") == 0, 2).when(F.col("g_r") == 0, 1).otherwise(0)
    lv = rolled.withColumn("level", level)
    path = (
        F.when(F.col("level") == 0, F.lit("/"))
        .when(F.col("level") == 1, F.concat(F.lit("/"), F.col("r_name")))
        .otherwise(
            F.concat(F.lit("/"), F.col("r_name"), F.lit("/"), F.col("n_name"))
        )
    )
    dir_count = (
        F.lit(1)
        + F.when(F.col("level") == 0, F.col("cd_region") + F.col("cd_nation"))
        .when(F.col("level") == 1, F.col("cd_nation"))
        .otherwise(F.lit(0))
        + F.col("n_cust")
    ).cast("long")
    ns_quota = (
        F.when(F.col("level") == 0, F.lit(50000000))
        .when(F.col("level") == 1, F.lit(5000000))
        .otherwise(512 * (1 + F.col("nkey") % 4))
    ).cast("long")
    space_quota = (
        F.when(F.col("level") == 0, F.lit(1000000000000000))
        .when(F.col("level") == 1, F.lit(200000000000000))
        .otherwise(F.lit(8000000000) * (1 + F.col("nkey") % 3))
    ).cast("long")
    summary = lv.select(
        path.alias("path"),
        F.col("level").cast("long").alias("level"),
        dir_count.alias("dir_count"),
        F.col("file_count").cast("long").alias("file_count"),
        ns_quota.alias("ns_quota"),
        F.col("bytes_dec").cast("long").alias("bytes_used"),
        space_quota.alias("space_quota"),
    )
    ns_used = (F.col("dir_count") + F.col("file_count")).cast("long")
    return summary.select(
        "path", "level", "dir_count", "file_count",
        ns_used.alias("ns_used"),
        "ns_quota",
        (F.col("ns_quota") - ns_used).cast("long").alias("ns_remaining"),
        F.when(ns_used > F.col("ns_quota"), 1).otherwise(0).cast("long").alias("over_ns"),
        "bytes_used", "space_quota",
        (F.col("space_quota") - F.col("bytes_used")).cast("long").alias("space_remaining"),
        F.when(F.col("bytes_used") > F.col("space_quota"), 1)
        .otherwise(0).cast("long").alias("over_space"),
    ).orderBy("level", "path")

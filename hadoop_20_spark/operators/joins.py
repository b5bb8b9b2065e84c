"""Joins (SURVEY §2.4).

The reference ships three join families:

1. map-side merge join over sorted, identically-partitioned inputs
   (``mapred/join/CompositeRecordReader.java`` k-way merge +
   ``InnerJoinRecordReader``/``OuterJoinRecordReader``) — in Spark this is
   SortMergeJoinExec, and the zero-shuffle precondition is reproduced by
   bucketed+sorted tables;
2. reduce-side tagged join (contrib/data_join ``DataJoinReducerBase``)
   — Spark's default shuffle join;
3. replicated (broadcast) hash join via the DistributedCache idiom
   — BroadcastHashJoinExec via ``F.broadcast``.

Catalyst chooses among them by stats; the builders here only add the
semantics Spark lacks as named ops (override join) plus compat sugar for
the ``mapred.join.expr`` composition DSL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOIN_TYPES = {
    "inner",
    "left",
    "right",
    "full",
    "left_semi",
    "left_anti",
    "cross",
}


_SIZE_SUFFIXES = {
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
}


def _parse_size(text: str) -> int:
    """Parse a Spark byte-size conf string ('10MB', '10485760b', '-1')."""
    s = str(text).strip().lower()
    for suf in sorted(_SIZE_SUFFIXES, key=len, reverse=True):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * _SIZE_SUFFIXES[suf])
    return int(s)


def broadcast_if_small(df: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """Size-gated broadcast hint — the DistributedCache discipline
    (core/filecache/DistributedCache.java replicates only *small* files).

    A raw ``F.broadcast(df)`` is honored by Spark regardless of actual
    size and hard-fails above the 8 GB broadcast limit, so it is safe
    only for fixed-cardinality tables (nation = 25 rows, region = 5).
    For tables whose size grows with the data (customer/supplier/part,
    per-user or per-doc aggregates) this helper consults Catalyst's own
    size estimate (``optimizedPlan().stats().sizeInBytes``, derived from
    file statistics) and attaches the hint only when the estimate is
    under the session's ``spark.sql.autoBroadcastJoinThreshold``.
    Above the threshold the plan is left unhinted: the optimizer plus
    AQE still choose broadcast from *runtime* stats when the side is
    genuinely small, and degrade gracefully to a shuffle join when not
    — instead of aborting at 100 TB.
    """
    spark = df.sparkSession
    if max_bytes is None:
        max_bytes = _parse_size(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
        )
    if max_bytes <= 0:  # broadcast disabled session-wide: never hint
        return df
    try:
        # py4j maps scala BigInt to a Python int when it fits; fall back
        # to the string form for values outside the long range.
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        size = raw if isinstance(raw, int) else int(str(raw))
    except Exception:
        # Stats unavailable (e.g. Spark Connect): no hint is the safe
        # default — a missed broadcast costs a shuffle, a wrong one OOMs.
        return df
    return F.broadcast(df) if size <= max_bytes else df


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Thin builder over ``df.join``.

    ``broadcast_right=True`` reproduces the DistributedCache replicated
    join (core/filecache/DistributedCache.java): the small side ships to
    every task, no shuffle of the big side.  At 100 TB the fact table
    never moves; only dimension tables broadcast.
    """
    if how not in JOIN_TYPES:
        raise ValueError(f"unknown join type {how!r}")
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=list(on) if not isinstance(on, str) else [on], how=how)


def override_join(
    sources: Sequence[DataFrame], on: str | Sequence[str]
) -> DataFrame:
    """mapred/join/OverrideRecordReader.java#emit — "override" join:
    for each key, the RIGHTMOST source containing the key wins; its whole
    record is emitted (a priority coalesce across tables).

    Spark-first realization: tag each source with its priority, unionByName,
    then one hash aggregation keeping ``max_by(record, priority)``.  This
    is a SINGLE shuffle with map-side partial aggregation — strictly
    cheaper at scale than the N-1 full-outer-join chain or a window sort
    (row_number) which would shuffle AND sort.  All sources must share a
    schema (the reference requires identical value class per source).
    """
    keys = [on] if isinstance(on, str) else list(on)
    cols = sources[0].columns
    for s in sources[1:]:
        if s.columns != cols:
            raise ValueError("override_join requires identical schemas")
    payload = [c for c in cols if c not in keys]
    tagged = None
    for i, s in enumerate(sources):
        t = s.withColumn("_priority", F.lit(i))
        tagged = t if tagged is None else tagged.unionByName(t)
    # Ordering key extends priority with the payload itself: the
    # reference contract is one row per key per source, but if a source
    # DOES carry duplicates, the winner is still deterministic under any
    # partitioning (greatest payload within the winning source) instead
    # of shuffle-arrival order.
    winner = tagged.groupBy(*keys).agg(
        F.max_by(
            F.struct(*payload),
            F.struct(F.col("_priority"), *[F.col(c) for c in payload]),
        ).alias("_rec")
    )
    return winner.select(*keys, *[F.col(f"_rec.{c}").alias(c) for c in payload])


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """EXISTS — reduce-side tagged-join idiom (keep keys present in both,
    emit left payload only): contrib/utils/join/DataJoinReducerBase.java."""
    return join(left, right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS — tagged-join idiom, keys only in left."""
    return join(left, right, on, "left_anti")


def theta_join(left: DataFrame, right: DataFrame, condition) -> DataFrame:
    """Cartesian/theta join — the reference's single-reducer idiom.
    ``crossJoin`` + filter; Catalyst turns an equi-component into a real
    join condition where possible (BroadcastNestedLoopJoin otherwise)."""
    return left.crossJoin(right).filter(condition) if condition is not None else left.crossJoin(right)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-salted equi-join: replicate the (small-ish) right side
    ``salt`` ways and scatter the left side's hot keys across the
    replicas — the reference's manual hot-key idiom, as an operator.

    Use when one join key dominates (power-law keys at 100 TB) and the
    right side is too big to broadcast but small enough to replicate
    ``salt``×.  AQE's skew-join split handles *partition*-level skew
    automatically; salting handles single-key skew that no partition
    split can fix.  Left rows get a random-but-deterministic salt from
    their row content hash (md5 of all columns) so results are stable.

    Only ``inner``/``left``/``left_semi``/``left_anti`` are supported:
    the right side is replicated ``salt``×, so a right/full outer join
    would emit every unmatched right row once per salt replica.  Salt
    the other side (swap operands) for right-skewed outer joins.
    """
    from hadoop_20_spark.functions import md5_long

    if how not in {"inner", "left", "left_semi", "left_anti"}:
        raise ValueError(
            "salted_join supports inner/left/left_semi/left_anti only: "
            f"{how!r} would duplicate unmatched right rows across the "
            f"{salt} right-side replicas"
        )

    l_salt = (
        md5_long(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in left.columns]))
        % salt
    )
    l = left.withColumn("_salt", l_salt)
    r = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt).select(F.col("id").cast("bigint").alias("_salt"))
        )
    )
    out = l.join(r, [on, "_salt"], how)
    return out.drop("_salt")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """As-of join (absent in the reference — SURVEY §2.4 extension): for
    each left row, attach the LATEST right row with the same key and
    ``right_ts <= left_ts`` (right columns null when none exists).

    Scale-first realization — the union/sort trick, NOT a per-key
    inequality join: tag both sides, union, then a single
    partitionBy(key).orderBy(ts) window where ``last(right_payload,
    ignorenulls)`` carries the most recent right row forward onto each
    left row.  One shuffle + one sort, linear in |L|+|R|; the naive
    ``L join R on key and r.ts <= l.ts`` + max-window is quadratic in
    per-key group size.  Ties (equal ts) count as matches: the right row
    sorts before the left row at the same timestamp.

    Right payload column names are suffixed ``_r`` on collision.
    """
    keys = [on] if isinstance(on, str) else list(on)
    l_payload = [c for c in left.columns if c not in keys]
    r_payload = [c for c in right.columns if c not in keys]
    rename = {
        c: (f"{c}_r" if c in left.columns else c) for c in r_payload
    }
    r_struct = F.struct(
        *[F.col(c).alias(rename[c]) for c in r_payload]
    )
    l_struct = F.struct(*[F.col(c) for c in l_payload])

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts after right on ts ties
        l_struct.alias("_l"),
        F.lit(None).cast(right.select(r_struct).schema[0].dataType).alias("_r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(l_struct).schema[0].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    from pyspark.sql import Window

    # `_r` as the final sort key breaks ties among right rows sharing
    # (key, ts) — lexicographically-greatest payload wins, the same under
    # any partitioning (SURVEY §7.4 determinism rule; without it the
    # winner depends on shuffle arrival order).
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side", "_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).withColumn(
        "_rlast", F.last("_r", ignorenulls=True).over(w)
    )
    out_cols = (
        [F.col(k) for k in keys]
        + [F.col(f"_l.{c}").alias(c) for c in l_payload]
        + [F.col(f"_rlast.{rename[c]}").alias(rename[c]) for c in r_payload]
    )
    return filled.filter(F.col("_l").isNotNull()).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    condition,
) -> DataFrame:
    """Equi-key + range-predicate join (absent in reference).  Expressed
    declaratively so Catalyst plans the equi part as a real join and the
    range predicate as a post-join filter; AQE handles per-key skew."""
    return join(left, right, on, "inner").filter(condition)


# --- mapred.join.expr compat DSL -------------------------------------------
# The reference composes map-side joins with a string plan, e.g.
#   inner(tbl(SequenceFileInputFormat.class,"p1"), tbl(...,"p2"))
# parsed by mapred/join/Parser.java into a tree of RecordReaders.  Here the
# same composition is expressed as a tiny recursive structure over already-
# loaded DataFrames; Catalyst then plans the whole tree at once (join
# reordering included — something the reference's fixed tree cannot do).

def compose(expr: str, tables: dict[str, DataFrame], on: str | Sequence[str]) -> DataFrame:
    """Evaluate a join-expression string: ``inner(a, outer(b, c))`` or
    ``override(a, b)`` where names resolve via ``tables``.

    Mirrors mapred/join/CompositeInputFormat.java#compose.
    """
    expr = expr.strip()
    op, _, rest = expr.partition("(")
    if not rest:  # bare table name
        return tables[expr]
    args_src = rest.rsplit(")", 1)[0]
    # split top-level commas
    args, depth, cur = [], 0, []
    for ch in args_src:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        args.append("".join(cur))
    parts = [compose(a, tables, on) for a in args]
    op = op.strip()
    if op == "inner":
        out = parts[0]
        for p in parts[1:]:
            out = join(out, p, on, "inner")
        return out
    if op == "outer":
        out = parts[0]
        for p in parts[1:]:
            out = join(out, p, on, "full")
        return out
    if op == "override":
        return override_join(parts, on)
    raise ValueError(f"unknown join op {op!r}")


# --- bloom-filter semi join (runtime-filter discipline) ---------------------

BLOOM_OFFSETS = (0, 8, 16)  # three md5 substrings = three hash functions


def bloom_filter_build(
    keys: DataFrame, key_col: str, m_bits: int = 2048
) -> DataFrame:
    """Build an ``m_bits``-bit Bloom filter over a key column as ONE
    row holding an ``array<long>`` of 32-bit words (a 64-bit shift of 63 overflows signed BIGINT in DuckDB — 32-bit words keep every shift oracle-portable) — the engine-portable
    form of the runtime filter a 100 TB join pushes into the probe-side
    scan (Spark's own InjectRuntimeFilter does this with
    BloomFilterAggregate; parquet bloom filters do it at file level —
    this is the same structure built from the md5 hash family, so every
    bit is DuckDB-reproducible).

    k = 3 hash functions are three disjoint 15-hex-char substrings of
    ONE md5 digest (``functions.md5_long`` offsets 0/8/16): one md5
    pass per key, not three.  The build is an explode → distinct →
    bit_or word aggregate (≤ m/64 rows shuffled), densified against a
    ``spark.range`` spine and collapsed to a single broadcastable row.

    Reference anchor: ``core/util/bloom/BloomFilter.java`` (the
    reference shipped Bloom filters for MapFile membership —
    ``io/BloomMapFile.java``); this is that structure rebuilt as a
    relational aggregate."""
    from hadoop_20_spark.functions import md5_long

    if m_bits % 32 != 0:
        raise ValueError(
            f"m_bits must be a multiple of 32, got {m_bits}: a partial "
            "last word would leave hash positions past the densified "
            "array (element_at -> NULL -> false NEGATIVES)"
        )
    spark = keys.sparkSession
    n_words = m_bits // 32
    c = F.col(key_col).cast("string")
    pos = keys.select(
        F.explode(
            F.array(*[(md5_long(c, off) % m_bits).alias(f"h{i}")
                      for i, off in enumerate(BLOOM_OFFSETS)])
        ).alias("pos")
    ).distinct()
    words = pos.select(
        F.expr("pos DIV 32").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("bit"),
    ).groupBy("w").agg(F.bit_or("bit").alias("word"))
    dense = (
        spark.range(n_words)
        .withColumnRenamed("id", "w")
        .join(words, "w", "left")
        .select("w", F.coalesce("word", F.lit(0)).cast("long").alias("word"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "word"))),
            lambda x: x["word"],
        ).alias("bloom_bits")
    )


def bloom_probe_passes(key_col: str, m_bits: int = 2048) -> "F.Column":
    """Row-local membership test against a broadcast ``bloom_bits``
    array column: all k bit positions set.  Pure codegen — the filter
    the probe-side scan evaluates before any shuffle.

    The digest is let-bound once per row (the lambda-CSE rule,
    ``functions.let``): the build side pays one md5 per key, so the
    probe must too — three ``md5(key)`` spellings would rely on codegen
    subexpression elimination collapsing them, which is not guaranteed
    across every expression context."""
    if m_bits % 32 != 0:
        raise ValueError(f"m_bits must be a multiple of 32, got {m_bits}")
    tests = []
    for off in BLOOM_OFFSETS:
        pos = (
            f"(CAST(conv(substring(d, {1 + off}, 15), 16, 10) AS BIGINT)"
            f" % {m_bits})"
        )
        tests.append(
            f"(shiftright(element_at(bloom_bits, CAST({pos} DIV 32 AS INT) + 1), "
            f"CAST({pos} % 32 AS INT)) & 1) = 1"
        )
    return F.expr(
        f"transform(array(md5(CAST({key_col} AS STRING))), "
        f"d -> {' AND '.join(tests)})[0]"
    )


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    build_key: str | None = None,
    *,
    m_bits: int = 16384,
) -> DataFrame:
    """Semi-join ``fact`` to ``keys`` behind an explicit Bloom runtime
    filter: build the m-bit filter over the (deduplicated) build keys,
    broadcast it as ONE ``array<long>`` row, kill non-passing fact rows
    with row-local codegen BEFORE any join machinery, then exact
    ``left_semi`` the survivors to remove the false positives.

    This is the engine-portable form of Spark's InjectRuntimeFilter for
    the cases that rule does not cover — a pre-aggregated build side
    (keys from a HAVING), a non-equi derivation, or any engine without
    the rule: the probe side pays one md5 per row at the scan and only
    passing rows (true matches + the measured ~1-2% fp at sane sizing)
    reach the exact join.  Semantics are EXACTLY ``left_semi`` —
    Bloom filters have no false negatives (bloom_filter_build validates
    the word-alignment precondition that could break that).

    Reference anchor: ``core/util/bloom/BloomFilter.java`` +
    ``io/BloomMapFile.java#get`` (probe the bloom before touching the
    data file)."""
    build_key = build_key or fact_key
    bloom = bloom_filter_build(keys, build_key, m_bits=m_bits)
    survivors = (
        fact.crossJoin(F.broadcast(bloom))
        .where(bloom_probe_passes(fact_key, m_bits=m_bits))
        .drop("bloom_bits")
    )
    uniq = keys.select(F.col(build_key).alias("__bsj_k")).distinct()
    return survivors.join(
        broadcast_if_small(uniq),
        F.col(fact_key) == F.col("__bsj_k"),
        "left_semi",
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str = "st",
    end_col: str = "en",
    bucket_seconds: int = 3600,
    max_cells: int = 64,
) -> DataFrame:
    """Interval-overlap join WITHOUT the quadratic theta join: both
    sides explode their [start, end] (closed, timestamp columns) onto a
    time grid of ``bucket_seconds`` cells; candidates come from the
    grid-cell equi-join; the true-overlap predicate filters; and each
    surviving pair is attributed to EXACTLY ONE cell — the first cell
    both intervals occupy, ``cell == greatest(start_cell_l,
    start_cell_r)`` — so no distinct/dedup shuffle is ever needed.

    Columns are returned prefixed ``l_`` / ``r_``.  Intervals longer
    than ``max_cells`` buckets raise (raise_error) instead of silently
    exploding the grid — pick ``bucket_seconds`` near the typical
    interval length: explode factor ~= len/bucket + 1, candidate count
    ~= true pairs + same-cell near-misses.

    Scale: THE pattern for interval joins Spark lacks natively — the
    equi-join shuffles on the grid cell (time-partitioned, so at 100 TB
    co-partition both sides by day and the grid join is cell-local);
    a range/theta join would broadcast-nested-loop or cartesian.
    Reference anchor (public hadoop-20): mapred/join expects equi-keys
    only — the grid cell is how an interval predicate becomes one."""
    def cells(df: DataFrame, tag: str) -> DataFrame:
        renamed = df.select(
            *[F.col(c).alias(f"{tag}_{c}") for c in df.columns]
        )
        s = F.col(f"{tag}_{start_col}").cast("long")
        e = F.col(f"{tag}_{end_col}").cast("long")
        # the guard lives INSIDE the kept start-cell expression — a
        # separate projected-then-dropped guard column gets pruned by
        # Catalyst and would never fire
        sc = F.when(
            (e - s) > F.lit(bucket_seconds * max_cells),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval_overlap_join: interval spans > {max_cells} "
                        f"cells at bucket_seconds={bucket_seconds}: "
                    ),
                    (e - s).cast("string"),
                    F.lit("s — widen bucket_seconds"),
                )
            ).cast("long"),
        ).otherwise(F.expr(f"CAST({tag}_{start_col} AS LONG) DIV {bucket_seconds}"))
        ec = F.expr(f"CAST({tag}_{end_col} AS LONG) DIV {bucket_seconds}")
        base = renamed.select(
            "*", sc.alias(f"{tag}_sc"), ec.alias(f"{tag}_ec")
        )
        return base.select(
            "*",
            F.explode(
                F.sequence(F.col(f"{tag}_sc"), F.col(f"{tag}_ec"))
            ).alias("cell"),
        ).drop(f"{tag}_ec")
    lc = cells(left, "l")
    rc = cells(right, "r")
    pair_first_cell = F.greatest(F.col("l_sc"), F.col("r_sc"))
    return (
        lc.join(rc, "cell")
        .filter(
            (F.col(f"l_{start_col}") <= F.col(f"r_{end_col}"))
            & (F.col(f"r_{start_col}") <= F.col(f"l_{end_col}"))
            & (F.col("cell") == pair_first_cell)
        )
        .drop("cell", "l_sc", "r_sc")
    )

"""Graph primitives shared by clustering-flavored queries.

Extracted operator form of the label-propagation loop the registry
queries `dedup_clusters` (near-dup components) and `entity_resolution`
(record linkage) run: iterative min-label propagation with a bounded
driver loop and localCheckpoint per round — the chained-MR-jobs idiom
(reference anchor: the iterative job chains of
``src/examples/org/apache/hadoop/examples/`` where each round's reducer
output seeds the next round's map input).

Scale posture: each round is one (dst-keyed) join + one (src-keyed)
aggregation — both partial-agg shuffles on 8-byte keys; lineage is cut
per round (localCheckpoint) so plan size stays O(1) in rounds; the stop
test is a single count per round (bounded driver traffic).  Rounds are
bounded by component diameter — shallow for blocking/LSH graphs by
construction (blocks bound edge locality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components by min-label propagation: every node adopts
    the smallest label among itself and its neighbors until fixpoint.
    Returns (id, component) for every node INCIDENT TO AN EDGE —
    callers left-join and coalesce to give isolated rows their own id
    (the component label is the smallest member id: the canonical
    keeper, deterministic and engine-portable).

    Raises RuntimeError if the loop exhausts ``max_iters`` while labels
    are still changing: an unconverged labeling is WRONG (some nodes
    still carry a non-minimal label), and returning it silently would
    corrupt every downstream keeper/cluster decision with no signal —
    the same fail-loud contract as sort.exact_order_statistics.
    ``max_iters`` bounds propagation DISTANCE (component diameter), so
    for blocking/LSH graphs the default is generous; raise it for
    genuinely deep graphs rather than accepting partial labels.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint()
    )
    changed = -1
    for _ in range(max_iters):
        neighbor_min = (
            e.join(labels, e.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nmin"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"iterations ({changed} labels still changing); raise "
            "max_iters — returning unconverged labels would be silent "
            "data corruption"
        )
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 48,  # covers ~2^46 nodes at O(log n) rounds + slack
) -> tuple[DataFrame, int]:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014 — public algorithm).  Unlike min-label
    propagation (:func:`connected_components`), whose round count is
    the component DIAMETER, star contraction converges in O(log n)
    rounds regardless of diameter — the right algorithm when components
    can be long chains (session trails, citation paths, linked-list-
    shaped graphs) rather than shallow LSH blocks.

    Large-star (one round): for every node u, hang each STRICTLY LARGER
    neighbor off m = min(N(u) ∪ {u}).  Small-star: orient every edge
    (big, small), then hang each smaller neighbor AND u itself off
    m = min(N(u)).  Both are one unbounded window min over a single
    u-partitioned exchange — identical shuffle economics per round
    to one propagation step, but exponentially fewer rounds on deep
    graphs.  Lineage is cut per round (LAZY localCheckpoint, r14: the
    exact fixpoint count is the single materializing action per
    round); the fixpoint test is the symmetric-difference count read
    off the presence-bit aggregate, on an edge set whose size never
    exceeds the node count after the first small-star.

    Returns (labels, rounds): labels has (id, component) for every node
    incident to an edge, component = smallest node id in the component
    (same contract as :func:`connected_components`); rounds is the
    number of large+small iterations actually run.  Raises
    RuntimeError on non-convergence (fail-loud house contract), which
    for this algorithm would indicate a bug, not a deep graph.

    Everything is integer comparisons on the caller's node ids — no
    floats, no hashing — so the result is bit-identical across engines
    and partitionings.
    """
    # No up-front .distinct() (r14): the round-2+ presence-bit
    # aggregation collapses duplicate (u, v) rows with identical SET
    # semantics (min/max of the side tag are dup-invariant), and the
    # round windows take MINs, which duplicates cannot move — so the
    # initial dedup exchange bought nothing but a stage wave.  Raw-input
    # duplicate volume rides through round 1 only, bounded by the input
    # multiplicity (each round's output is <= 4x its input rows
    # regardless of dups).  The checkpoint is LAZY: round 2's fixpoint
    # count is the materializing action, so the loop pays ONE job per
    # round instead of checkpoint-job + count-job (measured 0.61-0.70 s
    # + 0.06-0.08 s per round at sf0.1, pure scheduling waves).
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .localCheckpoint(eager=False)
    )
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # Large-star: neighborhoods from both orientations; every
        # neighbor v > u re-points at min(N(u) ∪ {u}).  Each original
        # edge (a<b) is re-emitted from a's group, so connectivity is
        # preserved; edges only ever point DOWNWARD afterwards.
        nbrs = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # Per-u minimum as an unbounded window over ONE u-partitioned
        # exchange (r13): the old groupBy-min + join-back shipped the
        # SAME nbrs rows through TWO exchanges (the partial-agg'd mins
        # and the join probe side); the join needed every row anyway,
        # so the window halves the round's large-star shuffle volume —
        # identical skew profile (a hot u lands on one task under
        # either plan).  No .distinct() either: duplicates ((v, m)
        # emitted from several u-groups) are bounded by degree, don't
        # move the MIN below, and the round's final (u, v) groupBy
        # collapses them (guide §2.4).
        w_u = Window.partitionBy("u")
        large = (
            nbrs.withColumn(
                "m", F.least(F.min("v").over(w_u), F.col("u"))
            )
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # Small-star: orient (big, small); u and every smaller neighbor
        # hang off the smallest neighbor.  Output is a forest of stars.
        # Same window form; the (u, m) self-edge rides every row and
        # the final groupBy dedups it.
        se = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        sew = se.withColumn("m", F.min("v").over(w_u))
        nxt_pre = (
            sew.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(sew.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
        )
        if rounds == 1:
            # round 1 reshapes the raw edge set unconditionally — skip
            # the (always-true) change test AND the dedup (r14): round
            # 2's presence-bit groupBy collapses duplicates with the
            # same set semantics, so round 1's own distinct exchange
            # was redundant work.  Lazy checkpoint: e is referenced
            # twice by round 2 (nbrs and the tagged union), so the
            # checkpoint still guarantees single computation — it
            # materializes inside round 2's one action.
            e = nxt_pre.localCheckpoint(eager=False)
            continue
        # The round's dedup shuffle and the fixpoint test FUSED into
        # one (u, v) aggregation (r13; they were two separate wide
        # shuffles): tag rows 0 = previous edge set, 1 = this round's
        # pre-dedup output, aggregate presence bits per (u, v).  The
        # checkpointed result yields BOTH the new edge set (in_nxt)
        # and the exact symmetric-difference count (in_e != in_nxt)
        # with no further shuffle — set equality stays the exact
        # termination test.
        merged = (
            e.select("u", "v", F.lit(0).alias("_t"))
            .unionAll(nxt_pre.select("u", "v", F.lit(1).alias("_t")))
            .groupBy("u", "v")
            .agg(F.min("_t").alias("_tmin"), F.max("_t").alias("_tmax"))
            .localCheckpoint(eager=False)
        )
        # ONE action per round (r14): this count both materializes the
        # lazy checkpoint (plus any still-pending upstream checkpoints)
        # and answers the exact fixpoint test — the separate
        # checkpoint-then-count pair paid an extra scheduling round trip
        # for the same work.  Set-equality termination is unchanged.
        changed = merged.filter(
            (F.col("_tmin") == 1) | (F.col("_tmax") == 0)
        ).count()
        e = merged.filter(F.col("_tmax") == 1).select("u", "v")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} "
            "rounds — for star contraction this indicates a bug, not a "
            "deep graph; refusing to return a partial contraction"
        )
    # Fixpoint edge set is (node, root) for every non-root node; one
    # dedup shuffle covers both the (node, root) rows and the root
    # self-labels (was two nested distincts — r13).
    labels = (
        e.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .union(e.select(F.col("v").alias("id"), F.col("v").alias("component")))
        .distinct()
    )
    return labels, rounds

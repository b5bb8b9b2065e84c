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

from pyspark.sql import DataFrame
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

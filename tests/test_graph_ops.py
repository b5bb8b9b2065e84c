"""Operator-level tests for hadoop_20_spark.operators.graph."""

from __future__ import annotations

import pytest

from hadoop_20_spark.operators.graph import connected_components


def test_connected_components_two_chains(spark):
    """Two disjoint chains converge to their min labels."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12)], "src long, dst long"
    )
    out = {
        r["id"]: r["component"] for r in connected_components(edges).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_connected_components_raises_when_unconverged(spark):
    """A chain whose min-label propagation distance exceeds max_iters
    must RAISE, not silently return wrong labels (each iteration moves
    the min label one hop, so a length-6 chain needs ~5 rounds)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=2)
    # and with enough rounds the same graph is fine
    out = {
        r["id"]: r["component"]
        for r in connected_components(edges, max_iters=10).collect()
    }
    assert set(out.values()) == {1}


def test_star_cc_matches_propagation_and_beats_diameter(spark):
    """Star contraction labels a diameter-39 chain identically to
    min-label propagation but in O(log n) rounds — the round count must
    come in far under the diameter, or the algorithm has degraded to
    per-hop propagation."""
    from hadoop_20_spark.operators.graph import connected_components_star

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)]
        + [(100, 101), (101, 102)]
        + [(200, 201)],
        "src long, dst long",
    )
    labels, rounds = connected_components_star(edges)
    out = {r["id"]: r["component"] for r in labels.collect()}
    assert len(out) == 40 + 3 + 2
    assert all(c == 1 for i, c in out.items() if i <= 40)
    assert all(c == 100 for i, c in out.items() if 100 <= i <= 102)
    assert all(c == 200 for i, c in out.items() if i >= 200)
    assert rounds <= 10, f"star CC took {rounds} rounds on diameter 39"
    # reference result from the propagation operator (needs ~39 rounds)
    prop = {
        r["id"]: r["component"]
        for r in connected_components(edges, max_iters=45).collect()
    }
    assert out == prop


def test_star_cc_raises_on_exhausted_rounds(spark):
    """max_rounds=1 cannot close a chain — must fail loud."""
    from hadoop_20_spark.operators.graph import connected_components_star

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(edges, max_rounds=1)

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

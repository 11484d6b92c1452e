"""HDT level metadata operators (elektra dynamic_connectivity.h:112-167,
hdt_euler_tour_tree.h:208-210) + the CheckRep level invariants
(connectivity.h:114-139) on the flattened (level, is_tree) encoding."""

import pytest
from pyspark.sql import functions as F

from elektra_spark.dynamic.levels import (
    check_level_invariants,
    get_and_clear_level_i_edges,
    max_level,
    push_down_non_tree_edges,
    push_down_tree_edges_from_components,
    with_levels,
)
from elektra_spark.ingest.graph_io import edges_from_pairs
from elektra_spark.operators.cc import connected_components
from elektra_spark.operators.forest import spanning_forest

# triangle+pendant plus an isolated pair: two components, sizes 4 and 2
PAIRS = [(0, 1), (1, 2), (0, 2), (2, 3), (8, 9)]
N = 10


@pytest.fixture(scope="module")
def tagged(spark):
    edges = edges_from_pairs(spark, PAIRS)
    forest = spanning_forest(edges)
    t = with_levels(edges, forest, N).localCheckpoint(eager=True)
    labels = connected_components(edges).localCheckpoint(eager=True)
    return t, labels


def _rows(df):
    return {(r["src"], r["dst"]): (r["level"], r["is_tree"]) for r in df.collect()}


def test_with_levels_initial_state(spark, tagged):
    t, _ = tagged
    got = _rows(t)
    top = max_level(N)
    assert all(lvl == top for lvl, _ in got.values())
    # tree/non-tree split: forest has n - k = 6 - 2 = 4 tree edges of 5
    assert sum(1 for _, tree in got.values() if tree) == 4
    check_level_invariants(t, N)


def test_push_down_tree_respects_size_cap(spark, tagged):
    t, labels = tagged
    top = max_level(N)  # 4 for N=10; cap 2^(top-1) = 8 covers both components
    pushed = push_down_tree_edges_from_components(t, labels, top)
    got = _rows(pushed)
    assert all(lvl == top - 1 for (_, _), (lvl, tree) in got.items() if tree)
    assert all(lvl == top for (_, _), (lvl, tree) in got.items() if not tree)
    check_level_invariants(pushed, N)

    # cap 2^(l-1) = 2 at level l = 2: only the size-2 component {8,9} qualifies
    two = pushed.select("src", "dst", F.lit(2).cast("int").alias("level"), "is_tree")
    pushed2 = push_down_tree_edges_from_components(two, labels, 2)
    got2 = _rows(pushed2)
    assert got2[(8, 9)][0] == 1  # small component pushed
    assert got2[(0, 1)][0] == 2  # big component (size 4 > 2) stays


def test_push_down_non_tree_edges(spark, tagged):
    t, _ = tagged
    top = max_level(N)
    nt = t.filter(~F.col("is_tree")).select("src", "dst")
    assert nt.count() == 1  # the cycle-closing triangle edge
    pushed = push_down_non_tree_edges(t, nt, top)
    got = _rows(pushed)
    assert all(lvl == top - 1 for (_, _), (lvl, tree) in got.items() if not tree)
    assert all(lvl == top for (_, _), (lvl, tree) in got.items() if tree)
    # no-op on tree edges and on wrong level
    again = push_down_non_tree_edges(pushed, nt, top)
    assert _rows(again) == got
    check_level_invariants(pushed, N)


def test_get_and_clear_level_i_edges(spark, tagged):
    t, labels = tagged
    top = max_level(N)
    sel, updated = get_and_clear_level_i_edges(t, labels, component=0, level=top)
    got_sel = sorted((r["src"], r["dst"]) for r in sel.collect())
    # exactly component 0's tree edges (3 of them: spanning 4 vertices)
    assert len(got_sel) == 3
    assert all(u < 8 and v < 8 for u, v in got_sel)
    got = _rows(updated)
    for e in got_sel:
        assert got[e] == (top - 1, True)
    assert got[(8, 9)] == (top, True)  # other component untouched
    check_level_invariants(updated, N)


def test_invariant_catches_violation(spark, tagged):
    t, _ = tagged
    # force a cycle into the "tree" set: all 5 edges tree → not a forest
    bad = t.select("src", "dst", "level", F.lit(True).alias("is_tree"))
    with pytest.raises(AssertionError):
        check_level_invariants(bad, N)

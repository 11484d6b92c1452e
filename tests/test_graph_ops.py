"""LPA, triangle counting, spanning forest, degrees vs oracles."""

import random

import pytest
from pyspark.sql import functions as F

from elektra_spark.ingest.graph_io import edges_from_pairs
from elektra_spark.operators.degrees import degrees
from elektra_spark.operators.forest import spanning_forest
from elektra_spark.operators.lpa import label_propagation
from elektra_spark.operators.triangles import triangle_count

from .oracles import lpa_oracle, spanning_forest_invariants, triangle_count_oracle

HOUSE = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 1), (1, 4), (3, 4)]
CLIQUE5_PLUS_PATH = [(a, b) for a in range(5) for b in range(a + 1, 5)] + [(5, 6), (6, 7)]
SPANNING_K5ISH = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]


def _random_graph(seed, n, m):
    rng = random.Random(seed)
    return list({(min(a, b), max(a, b)) for a, b in ((rng.randrange(n), rng.randrange(n)) for _ in range(m)) if a != b})


@pytest.mark.parametrize("pairs,rounds", [(HOUSE, 3), (CLIQUE5_PLUS_PATH, 4), (_random_graph(5, 60, 120), 5)],
                         ids=["house", "clique5path", "random"])
def test_lpa_matches_oracle(spark, pairs, rounds):
    edges = edges_from_pairs(spark, pairs)
    got = {r["vid"]: r["label"] for r in label_propagation(edges, rounds=rounds).collect()}
    assert got == lpa_oracle(pairs, rounds=rounds)


@pytest.mark.parametrize("pairs", [HOUSE, CLIQUE5_PLUS_PATH, SPANNING_K5ISH, _random_graph(11, 80, 200)],
                         ids=["house", "clique5path", "k5ish", "random"])
def test_triangle_count(spark, pairs):
    edges = edges_from_pairs(spark, pairs)
    got = triangle_count(edges).collect()[0]["n_triangles"]
    assert got == triangle_count_oracle(pairs)


@pytest.mark.parametrize("pairs", [SPANNING_K5ISH, HOUSE, _random_graph(7, 100, 160)],
                         ids=["k5ish", "house", "random"])
def test_spanning_forest_invariants(spark, pairs):
    """elektra test_spanning_tree.h:26-63 semantics: |F| = n - #components,
    forest ⊆ edges, acyclic, spans (CheckRep MST invariant)."""
    edges = edges_from_pairs(spark, pairs)
    forest = [(r["src"], r["dst"]) for r in spanning_forest(edges).collect()]
    spanning_forest_invariants(forest, pairs)


def test_spanning_forest_deterministic(spark):
    pairs = _random_graph(3, 50, 90)
    edges = edges_from_pairs(spark, pairs)
    f1 = sorted((r["src"], r["dst"]) for r in spanning_forest(edges).collect())
    f2 = sorted((r["src"], r["dst"]) for r in spanning_forest(edges).collect())
    assert f1 == f2


def test_degrees(spark):
    edges = edges_from_pairs(spark, HOUSE)
    got = {r["vid"]: r["degree"] for r in degrees(edges).collect()}
    assert got == {0: 2, 1: 4, 2: 3, 3: 3, 4: 2}

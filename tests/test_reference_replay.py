"""End-to-end replay of the reference's differential harness on its own
graph fixtures (elektra test/reference_tests/reference_connectivity.hpp):

- insert-all → BatchConnected queries vs the UF oracle (`:44-88`)
- insert → delete ~10% random deduped edges → re-query (`:90-161`)
- graphs: basic.txt (5v/7e), basic-medium.txt (138v/119e),
  email-Eu-core.txt (1005v/25,571e) with up to 10,000 queries (`:163-197`)

The reference compares against its sequential HDT oracle; ours is the pure
NumPy/pandas UF oracle (tests/oracles.py) — same canonical min-vertex labels.
"""

import os
import random

import pytest

from elektra_spark.dynamic.updates import DynamicGraph
from elektra_spark.ingest.graph_io import read_edge_list
from elektra_spark.tables import SnapshotCatalog

from .oracles import cc_oracle, spanning_forest_invariants

GRAPH_DIR = "/root/reference/benchmarks/graphs"


@pytest.fixture()
def catalog(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "warehouse"))


def _graph_path(name: str) -> str:
    return os.path.join(GRAPH_DIR, name)


def _labels(g):
    return {r["vid"]: r["component"] for r in g.labels().collect()}


def _check_queries(g, spark, oracle, n_vertices: int, n_queries: int, rng):
    queries = [(rng.randrange(n_vertices), rng.randrange(n_vertices)) for _ in range(n_queries)]
    qdf = spark.createDataFrame(queries, "u long, v long")
    got = {(r["u"], r["v"]): r["connected"] for r in g.batch_connected(qdf).collect()}
    for u, v in set(queries):
        want = oracle.get(u, u) == oracle.get(v, v)  # isolated vids are their own component
        assert got[(u, v)] == want, (u, v, got[(u, v)], want)


def _replay(spark, catalog, name: str, n_vertices: int, n_queries: int,
            levels: bool = False, check_rep: bool = False):
    path = _graph_path(name)
    if not os.path.exists(path):
        pytest.skip(f"reference fixture {path} not present")
    edges = read_edge_list(spark, path)
    pairs = sorted((r["src"], r["dst"]) for r in edges.collect())
    rng = random.Random(0)  # deterministic seed, as the reference (mt19937 rng{0})

    # insert-all → query (reference_connectivity.hpp:44-88)
    g = DynamicGraph.create(
        catalog, edges, prefix=f"replay_{name.split('.')[0]}",
        levels=levels, check_rep=check_rep,
    )
    oracle = cc_oracle(pairs)
    assert _labels(g) == oracle
    spanning_forest_invariants(
        [(r["src"], r["dst"]) for r in g.forest().collect()], pairs
    )
    _check_queries(g, spark, oracle, n_vertices, n_queries, rng)

    # delete ~10% random deduped edges → re-query (hpp:90-161, 136-142)
    dels = rng.sample(pairs, max(1, len(pairs) // 10))
    g.batch_delete_edges(spark.createDataFrame(dels, "src long, dst long"))
    remaining = sorted(set(pairs) - set(dels))
    vids = sorted({v for p in pairs for v in p})
    oracle2 = cc_oracle(remaining, vids=vids)
    assert _labels(g) == oracle2
    spanning_forest_invariants(
        [(r["src"], r["dst"]) for r in g.forest().collect()], remaining, vids=vids
    )
    _check_queries(g, spark, oracle2, n_vertices, n_queries, rng)


def test_replay_basic(spark, catalog):
    _replay(spark, catalog, "basic.txt", 5, 100)


def test_replay_basic_checked(spark, catalog):
    """Replay with integrated levels + debug CheckRep enabled (the
    reference's debug build runs CheckRep at entry/exit of every batch op,
    dynamic_connectivity.h:45,376; level invariants checked post-commit)."""
    _replay(spark, catalog, "basic.txt", 5, 50, levels=True, check_rep=True)


def test_replay_basic_medium(spark, catalog):
    _replay(spark, catalog, "basic-medium.txt", 138, 1000)


def test_replay_basic_medium_checked(spark, catalog):
    _replay(spark, catalog, "basic-medium.txt", 138, 200, levels=True, check_rep=True)


def test_replay_email_eu_core(spark, catalog):
    """The SNAP graph the reference benchmarks on: 1005 vertices, 25,571
    canonical edges, 10,000 queries (reference_connectivity.hpp:163-197)."""
    _replay(spark, catalog, "email-Eu-core.txt", 1005, 10_000)

"""Explicit Euler-tour sequence (elektra_spark/operators/euler.py) vs a
sequential Python tour oracle — the differential strategy the reference
itself uses (its parallel ETT is tested against the sequential HDT
implementation, test/reference_tests/*). The oracle walks the identical
successor rule (circular next neighbor in sorted adjacency,
parallel_euler_tour_tree construction) one arc at a time."""

import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from elektra_spark.operators.euler import (
    batch_retour,
    euler_tour,
    find_taller_parents,
    tour_heights,
    tour_range_sum,
)


def seq_tour(edges):
    """Sequential oracle: {(tour, src, dst): pos} for a forest edge list."""
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    for v in adj:
        adj[v].sort()

    # components via plain union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp_arcs = defaultdict(list)
    for u, v in edges:
        c = find(u)
        comp_arcs[c].append((u, v))
        comp_arcs[c].append((v, u))

    def succ(a):
        u, v = a
        nb = adj[v]
        i = nb.index(u)
        return (v, nb[(i + 1) % len(nb)])

    out = {}
    for c, arcs in comp_arcs.items():
        tour_id = min(find(x) for x, _ in arcs)
        root = min(arcs)
        a, pos = root, 0
        while True:
            out[(tour_id, a[0], a[1])] = pos
            a = succ(a)
            pos += 1
            if a == root:
                break
        assert pos == len(arcs), "oracle walk must cover every arc once"
    return out


def rand_forest(n, n_trees, seed):
    """Random labeled forest: each non-root picks a parent among earlier
    vertices of its tree (deterministic given the seed)."""
    rng = random.Random(seed)
    verts = list(range(n))
    rng.shuffle(verts)
    chunks = [verts[i::n_trees] for i in range(n_trees)]
    edges = []
    for chunk in chunks:
        for i in range(1, len(chunk)):
            edges.append(tuple(sorted((chunk[i], chunk[rng.randrange(i)]))))
    return edges


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs] or [], "src long, dst long"
    )


def _collect_tour(df):
    return {(r["tour"], r["src"], r["dst"]): r["pos"] for r in df.collect()}


@pytest.mark.parametrize(
    "n,n_trees,seed", [(2, 1, 0), (5, 1, 1), (16, 3, 2), (60, 4, 3)]
)
def test_tour_matches_sequential_oracle(spark, n, n_trees, seed):
    edges = rand_forest(n, n_trees, seed)
    got = _collect_tour(euler_tour(_df(spark, edges)))
    assert got == seq_tour(edges)


def test_tour_positions_are_permutations(spark):
    edges = rand_forest(40, 2, 7)
    rows = euler_tour(_df(spark, edges)).collect()
    by_tour = defaultdict(list)
    for r in rows:
        by_tour[r["tour"]].append(r["pos"])
    for c, poss in by_tour.items():
        assert sorted(poss) == list(range(len(poss)))


def test_tour_rejects_cycles(spark):
    with pytest.raises(Exception, match="cycle|converge"):
        euler_tour(_df(spark, [(0, 1), (1, 2), (0, 2)]))


def test_empty_forest(spark):
    assert euler_tour(_df(spark, [])).count() == 0


def test_taller_parents_match_bruteforce(spark):
    edges = rand_forest(48, 2, 11)
    got = find_taller_parents(euler_tour(_df(spark, edges))).collect()
    by_tour = defaultdict(dict)
    for r in got:
        by_tour[r["tour"]][r["pos"]] = r
    for c, rows in by_tour.items():
        poss = sorted(rows)
        for p in poss:
            lvl = rows[p]["lvl"]
            lefts = [q for q in poss if q < p and rows[q]["lvl"] > lvl]
            rights = [q for q in poss if q > p and rows[q]["lvl"] > lvl]
            assert rows[p]["left_parent_pos"] == (max(lefts) if lefts else None)
            assert rows[p]["right_parent_pos"] == (min(rights) if rights else None)


def test_heights_deterministic(spark):
    edges = rand_forest(20, 1, 5)
    a = {(r["src"], r["dst"]): r["lvl"] for r in tour_heights(euler_tour(_df(spark, edges))).collect()}
    b = {(r["src"], r["dst"]): r["lvl"] for r in tour_heights(euler_tour(_df(spark, edges))).collect()}
    assert a == b and all(v >= 0 for v in a.values())


def test_range_sum(spark):
    edges = rand_forest(24, 1, 9)
    tour = euler_tour(_df(spark, edges)).localCheckpoint(eager=True)
    rows = sorted(tour.collect(), key=lambda r: r["pos"])
    lo, hi = 3, 11
    want = sum(r["dst"] for r in rows if lo <= r["pos"] <= hi)
    got = tour_range_sum(tour, lo, hi).collect()
    assert len(got) == 1 and got[0]["range_sum"] == want


def test_batch_retour_matches_full_recompute(spark):
    # tree A = path 0-1-2-3-4, tree B = path 10-11-12; cut (1,2) splits A,
    # link (2,10) merges A's right half into B — both splice directions
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12)]
    forest = _df(spark, edges)
    old = euler_tour(forest).localCheckpoint(eager=True)
    new_edges = [(0, 1), (2, 3), (3, 4), (10, 11), (11, 12), (2, 10)]
    got = _collect_tour(
        batch_retour(
            old, forest, links=_df(spark, [(2, 10)]), cuts=_df(spark, [(1, 2)])
        )[0]
    )
    assert got == seq_tour(new_edges)


def test_batch_retour_keeps_untouched_tours_verbatim(spark):
    # three trees; mutate only the first — the other tours' rows must be
    # preserved exactly (the affected-scope contract)
    edges = [(0, 1), (1, 2), (5, 6), (8, 9), (9, 10), (8, 11)]
    forest = _df(spark, edges)
    old = euler_tour(forest).localCheckpoint(eager=True)
    new_tour, new_forest = batch_retour(old, forest, cuts=_df(spark, [(0, 1)]))
    got = _collect_tour(new_tour)
    assert got == seq_tour([e for e in edges if e != (0, 1)])
    old_rows = _collect_tour(old)
    for k, v in got.items():
        if k[0] in (5, 8):  # untouched tours keep identical positions
            assert old_rows[k] == v
    assert sorted((r["src"], r["dst"]) for r in new_forest.collect()) == sorted(
        e for e in edges if e != (0, 1)
    )

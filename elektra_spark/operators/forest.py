"""Spanning forest — distributed union-find "winner edges".

Reproduces the query semantics of ``elektra::SpanningTree``
(elektra/spanning_tree.h:27-106): process edges through a union-find; an edge
whose ``unite`` succeeds (links two distinct components) is a forest edge
(the winner-return contract of ``unite_variants::Unite``,
union_find.h:277-324). Our execution is the two-level scheme shared with CC:

1. per-partition pass over the range-partitioned edge table — a sequential
   union-find per Arrow batch group (deterministic: edges processed in
   (src, dst) order) emits that partition's winner edges (≤ local vertices −
   local components of them);
2. the union of local winners is a subgraph with O(V) edges whose components
   equal the graph's; its own spanning forest — computed on the driver below
   a size threshold (the reference's sequential-fallback trade,
   euler_tour_tree.h:279), else by recursing the distributed pass — is a
   spanning forest of the original graph, and every emitted edge is an
   original edge.

Determinism: with a fixed partitioning and sorted edge order, the winner set
is a pure function of the input, so tests can assert set-equality; the
oracle asserts the CheckRep MST invariants (elektra connectivity.h:216-265):
forest ⊆ edges, acyclic, |F| = n − #components, spans every component.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cc import _default_checkpoint


def _winner_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Sequential union-find over one partition's edges (sorted by (src,dst));
    emits winner edges — the per-partition analogue of spanning_tree.h:65-71."""
    chunks = list(batches)
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True).sort_values(["src", "dst"])
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent.get(x, x)
        return r

    w_src, w_dst = [], []
    for s, d in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            lo, hi = (rs, rd) if rs < rd else (rd, rs)
            parent[hi] = lo
            w_src.append(int(s))
            w_dst.append(int(d))
    yield pd.DataFrame({"src": pd.Series(w_src, dtype="int64"), "dst": pd.Series(w_dst, dtype="int64")})


def spanning_forest(
    edges: DataFrame,
    num_partitions: int | None = None,
    driver_threshold: int = 5_000_000,
    _depth: int = 0,
) -> DataFrame:
    """→ forest edges (src, dst) ⊆ edges; |F| = n − #components."""
    spark = edges.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    partitioned = edges.select("src", "dst").repartitionByRange(parts, "src")
    winners = _default_checkpoint(partitioned.mapInPandas(_winner_kernel, "src long, dst long"), _depth)
    n_winners = winners.count()
    if n_winners <= driver_threshold:
        pdf = winners.toPandas().sort_values(["src", "dst"])
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent.get(x, x)
            return r

        keep = []
        for s, d in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
            rs, rd = find(int(s)), find(int(d))
            if rs != rd:
                parent[max(rs, rd)] = min(rs, rd)
                keep.append((int(s), int(d)))
        if not keep:
            return spark.createDataFrame([], "src long, dst long")
        return spark.createDataFrame(pd.DataFrame(keep, columns=["src", "dst"]))
    if _depth >= 4:
        raise RuntimeError("spanning_forest failed to reduce below driver threshold")
    # winner union still too large: recurse with fewer, larger partitions —
    # each level multiplies components merged per partition
    return spanning_forest(winners, num_partitions=max(2, parts // 4), driver_threshold=driver_threshold, _depth=_depth + 1)

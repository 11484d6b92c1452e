"""elektra_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query semantics of the reference (sualehasif/elektra, a C++
shared-memory batch-dynamic connectivity suite — see SURVEY.md) as iterative
DataFrame passes over a snapshot-versioned edge table derived from multi-turn
conversation/agent transcripts, plus the link-graph analytics the north rule
requires: PageRank, connected components, label propagation, triangle counting,
spanning forests, and batch edge insert/delete with incremental recompute.

Design stance (SURVEY.md §7.1): the reference's pointer-chasing Euler-tour
trees / skip lists / CAS machinery are *shared-memory point-update* devices;
on Spark the same query semantics are computed by set-oriented BSP supersteps
over DataFrames, with per-partition vectorized NumPy kernels (union-find /
CSR gather-scatter) inside Arrow-batched pandas UDFs where a local pass
collapses work before a global shuffle.
"""

__version__ = "0.1.0"

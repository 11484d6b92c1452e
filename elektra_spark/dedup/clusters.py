"""Duplicate-cluster resolution: near-duplicate pairs → connected
components → one canonical keeper per cluster.

This is the step a training-data pipeline runs AFTER pairwise near-dup
detection: similarity is not transitive, so "keep one of every pair"
over raw pairs can drop both members of a chain A~B~C or keep two.
The industry-standard resolution (used by e.g. the Gopher/RefinedWeb
dedup recipes) is to take connected components of the similarity graph
and keep exactly one document per component — here the minimum doc_id,
matching the engine's canonical min-vertex component labeling (the same
contract the reference's connectivity suite exposes via
``GetRepresentative``, elektra batch_dynamic_connectivity/
connectivity.h:119-124 — min-id relabeled, SURVEY §1.4).

Scale story: the pair graph is tiny relative to the corpus (only
verified near-dups), so CC over it converges in a handful of supersteps;
the final assignment is one broadcast-size join back onto the corpus
ids. No all-pairs work anywhere — pairs come from the bucketed
MinHash-LSH path (dedup/minhash.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_clusters(
    docs: DataFrame,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 2,
) -> DataFrame:
    """Corpus → (doc_id, cluster, keep): cluster = min doc_id of the
    document's near-duplicate component (itself when it has no near-dup),
    keep = True iff this doc is its cluster's canonical representative.

    ``sum(keep)`` is the post-dedup corpus size; ``filter(~keep)`` is the
    removal list a curation pipeline anti-joins against the corpus.
    """
    from elektra_spark.operators.cc import connected_components

    from .ngram import near_duplicates

    pairs = near_duplicates(
        docs,
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
        n_hashes=n_hashes,
        bands=bands,
        shingle_n=shingle_n,
    )
    edges = pairs.select(
        F.col("a").cast("long").alias("src"), F.col("b").cast("long").alias("dst")
    )
    vertices = docs.select(F.col(id_col).cast("long").alias("vid"))
    labels = connected_components(edges, vertices=vertices)
    return labels.select(
        F.col("vid").alias(id_col),
        F.col("component").alias("cluster"),
        (F.col("vid") == F.col("component")).alias("keep"),
    )

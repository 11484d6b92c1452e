"""Exact n-gram Jaccard similarity — the verify stage after LSH candidates.

``pair_jaccard`` computes |A∩B| / |A∪B| over word-shingle sets for an
explicit pair list: two explodes + a count join, all JVM-side. Used to turn
LSH candidates into verified near-duplicates at a threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .minhash import shingles


def pair_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """pairs(a, b) × docs → (a, b, jaccard) with exact shingle-set Jaccard."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    j = (
        pairs.join(sh.select(F.col("id").alias("a"), F.col("sh").alias("sa")), "a")
        .join(sh.select(F.col("id").alias("b"), F.col("sh").alias("sb")), "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb"))
            ).alias("jaccard"),
        )
    )
    return j


def near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidates → exact-Jaccard verify → (a, b, jaccard) ≥ threshold."""
    from .minhash import lsh_candidate_pairs

    cands = lsh_candidate_pairs(docs, id_col, text_col, n_hashes, bands, shingle_n)
    return pair_jaccard(cands, docs, id_col, text_col, shingle_n).filter(F.col("jaccard") >= threshold)

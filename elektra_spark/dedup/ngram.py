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


def repeated_ngrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated n-grams → (ngram, n_docs, n_occurrences).

    The corpus-level signal behind substring-dedup of training data
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): an n-gram occurring in many distinct documents marks
    boilerplate / templated text worth stripping before training.

    Scale story: one shuffle on the n-gram key with map-side partial
    aggregation (count + count-distinct both combine); no joins. The
    ``min_docs`` filter applies post-agg, so the reduced relation — not
    the exploded one — is what survives.
    """
    # NULL text = empty (size(NULL) dodges the shingle helper's empty guard)
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.coalesce(F.col(text_col), F.lit("")), n)).alias("ngram"),
    )
    return (
        sh.groupBy("ngram")
        .agg(
            F.countDistinct("id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination → (doc_id, n_shared, contaminated) for
    every training doc: n_shared = distinct n-grams it shares with ANY
    eval document, contaminated = (n_shared > 0).

    Standard pre-training hygiene: training documents overlapping the
    eval/benchmark set inflate reported scores, so they are flagged (and
    typically dropped) before training. Training docs are ``docs`` minus
    ``eval_docs`` by id — an eval doc is never reported against itself.

    Scale story: the eval n-gram set is tiny next to the corpus, so the
    membership probe is a broadcast semi-join against the exploded corpus
    n-grams (no shuffle of the big side beyond the per-doc count, which
    combines map-side). The distinct-per-doc dedup keys on (doc, ngram).
    """
    from pyspark.sql.functions import broadcast

    txt = F.coalesce(F.col(text_col), F.lit(""))  # NULL text = empty
    ev = eval_docs.select(F.explode(shingles(txt, n)).alias("ngram")).distinct()
    train = docs.join(eval_docs.select(id_col), id_col, "left_anti")
    tr = train.select(F.col(id_col), F.explode(shingles(txt, n)).alias("ngram")).distinct()
    hits = (
        tr.join(broadcast(ev), "ngram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )

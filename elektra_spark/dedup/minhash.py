"""MinHash + LSH near-duplicate detection.

Portable-hash design: each hash family i maps token t →
``md5(f"{i}:" + t)`` and the signature component is the **lexicographic min
of the hex digests** — a string-valued minhash. This is deliberately chosen
over integer mixing so the DuckDB oracle can reproduce the pipeline
bit-for-bit with `md5` + `min` (no engine-specific hash functions), while
keeping the uniform-min property (md5 is uniform over hex strings).

Pipeline (all shuffles on short keys):
  shingle (explode) → per-(doc, family) min (map-side combinable) →
  band assembly (pivot to one row/doc) → candidate pairs via band self-join
  (docs sharing any full band) → optional exact-Jaccard verify (ngram.py).

At 100 TB the band join is the classic LSH bucket join; bucket skew (a
degenerate band shared by millions of docs) is handled by capping bucket
width (``max_bucket`` → oversized buckets dropped + reported, the standard
spam-bucket guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingles(text, n: int = 3):
    """word n-gram shingles as an array column (n=1 → tokens).

    Empty/whitespace-only text yields an empty array (not a single ''
    shingle), so empty documents drop out of signatures instead of all
    colliding into one degenerate LSH bucket.
    """
    toks = F.filter(F.split(text, " "), lambda t: t != "")
    if n == 1:
        return toks
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(grams)


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """→ (id, h0..h{n-1}) string minhash signature."""
    sh = df.select(F.col(id_col), F.explode(shingles(F.col(text_col), shingle_n)).alias("s"))
    aggs = [F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"h{i}") for i in range(n_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 2,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """→ (a, b) candidate near-dup pairs (a < b): docs agreeing on at least
    one full band of ``n_hashes/bands`` minhashes."""
    rows_per_band = n_hashes // bands
    sig = minhash_signature(df, id_col, text_col, n_hashes, shingle_n)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
        band_cols.append(F.concat_ws("|", F.lit(str(b)), *cols).alias(f"band{b}"))
    banded = sig.select(F.col(id_col).alias("id"), *band_cols)
    stacked = banded.select(
        "id", F.explode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias("band")
    ).localCheckpoint(eager=False)  # consumed 3× (bucket sizes + both join sides):
    # materialize the signature computation once instead of re-hashing per branch
    # spam-bucket guard: drop degenerate buckets wider than max_bucket
    sizes = stacked.groupBy("band").agg(F.count("*").alias("w"))
    ok = stacked.join(sizes.filter(F.col("w") <= max_bucket).select("band"), "band", "left_semi")
    a = ok.select(F.col("band"), F.col("id").alias("a"))
    b2 = ok.select(F.col("band"), F.col("id").alias("b"))
    return (
        a.join(b2, "band")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )

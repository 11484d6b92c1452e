"""Edge-list file ingestion, format-compatible with the reference's graphs.

The reference reads whitespace ``u v`` lines with ``#`` comment headers
(elektra benchmarks/io.h:24-67); its fixture graphs live in
``benchmarks/graphs/*.txt``. We read the same format as a DataFrame scan so
the reference's test graphs can be replayed through our engine directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_edge_list(spark: SparkSession, path: str) -> DataFrame:
    """Read `u v` lines (``#`` comments skipped) → canonical edges(src,dst)."""
    lines = spark.read.text(path)
    parts = (
        lines.filter(~F.col("value").startswith("#"))
        .filter(F.trim("value") != "")
        .select(F.split(F.trim("value"), r"\s+").alias("p"))
    )
    edges = parts.select(
        F.element_at("p", 1).cast("long").alias("u"),
        F.element_at("p", 2).cast("long").alias("v"),
    )
    return (
        edges.select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def edges_from_pairs(spark: SparkSession, pairs: list[tuple[int, int]]) -> DataFrame:
    """Small in-memory fixture graphs (FIXTURES.md §3) as canonical edges."""
    df = spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "u long, v long")
    return (
        df.select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )

"""Exact deduplication — hash-groupBy with canonical min-id representatives.

The dup relation (same key ⇒ same group) is an equivalence, so "components"
are computed directly by a grouped min, no graph iteration needed: this is
the degenerate-but-dominant case of the CC operator (every dup group is a
clique). Map-side combinable; at 100 TB the only shuffle is on the 128-bit
content hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    key=None,
) -> DataFrame:
    """→ (id, rep) where rep = min id among documents with identical key
    (default key: md5 of the raw text)."""
    k = key if key is not None else F.md5(F.col(text_col))
    keyed = df.select(F.col(id_col), k.alias("k"))
    reps = keyed.groupBy("k").agg(F.min(id_col).alias("rep"))
    return keyed.join(reps, "k").select(F.col(id_col), "rep")


def distinct_documents(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", key=None) -> DataFrame:
    """Keep one representative per dup group."""
    dups = exact_duplicates(df, id_col, text_col, key)
    keep = dups.filter(F.col(id_col) == F.col("rep")).select(id_col)
    return df.join(keep, id_col, "left_semi")

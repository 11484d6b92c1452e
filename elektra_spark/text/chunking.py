"""Document chunking — overlapping fixed-size windows, pure column exprs.

The context-window packing primitive of a training/RAG pipeline: split
each document into ``size``-character chunks starting every ``stride``
characters (``stride < size`` ⇒ overlapping windows, the standard recipe
for not cutting facts at hard boundaries). Emits
``(doc_id, chunk_idx, chunk_text, n_chars)`` with chunk 0 always present
(empty/NULL text yields one empty chunk, so no document silently
disappears from the corpus).

Everything is JVM-side column algebra — ``sequence`` + ``explode`` +
``substring`` inside whole-stage codegen, no Python in the path — and the
DuckDB twin regenerates the identical windows with ``generate_series`` +
``substr``, so the contract hash pins *byte-for-byte chunk text equality*
across engines (the per-row invariant the north rule cares about, applied
to derived text).

At 100 TB: chunking is a flat map — zero shuffles, output rows ≈
input_chars / stride; it composes with the samplers/dedup downstream,
which is where the first shuffle happens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    size: int = 512,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, chunk_idx, chunk_text, n_chars); ``stride`` defaults to
    ``size`` (disjoint windows). Chunk i covers characters
    ``[i*stride, i*stride + size)``; the last window starts at the largest
    ``i*stride < length`` (so a final short tail is kept, never an empty
    trailing window)."""
    if size < 1 or (stride is not None and stride < 1):
        raise ValueError(f"size and stride must be ≥ 1, got {size}, {stride}")
    stride = size if stride is None else stride
    txt: Column = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(txt)
    # number of windows: ceil(max(n,1) / stride) == floor((max(n,1)-1)/stride)+1
    last = F.floor((F.greatest(n, F.lit(1)) - 1) / F.lit(stride)).cast("int")
    return (
        docs.select(F.col(id_col).alias("doc_id"), txt.alias("_t"), F.explode(F.sequence(F.lit(0), last)).alias("chunk_idx"))
        .select(
            "doc_id",
            "chunk_idx",
            F.substring(F.col("_t"), F.col("chunk_idx") * stride + 1, size).alias("chunk_text"),
        )
        .withColumn("n_chars", F.length("chunk_text").cast("long"))
    )

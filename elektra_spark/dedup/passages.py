"""Passage-level exact dedup with document reconstruction.

Document-granularity dedup (exact.py / minhash.py) misses the dominant
duplication mode in web-scale training corpora: boilerplate and quoted
passages repeated INSIDE otherwise-distinct documents (Lee et al.,
*Deduplicating Training Data Makes Language Models Better*, ACL 2022 —
their ExactSubstr pass removes repeated spans, not whole documents). The
suffix-array machinery of ExactSubstr doesn't distribute as a DataFrame
plan; the standard scalable approximation is ALIGNED TOKEN WINDOWS: split
each document into consecutive W-token passages, drop every passage whose
exact text occurs elsewhere in the corpus except the first occurrence
(min (doc_id, passage_idx) — a total order, so the winner is unique and
engine-independent), and reconstruct the cleaned document from the kept
passages in order.

Plan shape (all JVM column expressions — no Python in the row path):

1. tokenize + window: ``split`` / ``sequence`` / ``slice`` / ``array_join``
   inside one projection — zero shuffles, passages ≈ tokens/W rows.
2. winner election: ``groupBy(md5(passage)).agg(min(struct(doc_id, pidx)))``
   — fully map-side combinable, so a boilerplate passage occurring 10^8
   times costs partial-agg rows, never a hot reducer (a window-function
   ``row_number`` over the hash would serialize exactly those hot keys).
3. reconstruction: one shuffle on doc_id; per-doc sort of the kept
   (pidx, passage) structs is bounded by passages-per-document.

Determinism: the winner rule and the single-space re-join are exact string
operations both engines share; the DuckDB twin reproduces the output
byte-for-byte (no floats anywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def passages(docs: DataFrame, window_tokens: int, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, pidx, passage): aligned non-overlapping W-token windows
    (the trailing window may be shorter). NULL text reads as empty — which
    still yields one empty passage, matching ``string_split`` semantics in
    the twin, so every input document survives to reconstruction."""
    if window_tokens < 1:
        raise ValueError(f"window_tokens must be ≥ 1, got {window_tokens}")
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n_windows = F.ceil(F.size(F.col("toks")) / F.lit(window_tokens)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_windows, F.lit(1)) - 1)
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .select("doc_id", "toks", F.posexplode(idx).alias("pidx", "i"))
        .select(
            "doc_id",
            F.col("pidx").cast("int").alias("pidx"),
            F.array_join(
                F.slice(F.col("toks"), F.col("i") * window_tokens + 1, window_tokens), " "
            ).alias("passage"),
        )
    )


def passage_dedup(
    docs: DataFrame,
    window_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, n_passages, n_kept, clean_text): corpus with every
    repeated W-token passage removed except its first occurrence.

    ``clean_text`` is the kept passages re-joined with single spaces in
    original order (byte-exact across engines); documents whose every
    passage was dropped keep an empty ``clean_text`` row — dedup must never
    silently delete a document id.
    """
    p = passages(docs, window_tokens, text_col=text_col, id_col=id_col)
    occ = p.withColumn("h", F.md5("passage"))
    winners = occ.groupBy("h").agg(F.min(F.struct("doc_id", "pidx")).alias("w"))
    kept = occ.join(winners, "h").withColumn(
        "is_kept", (F.col("doc_id") == F.col("w.doc_id")) & (F.col("pidx") == F.col("w.pidx"))
    )
    kept_struct: Column = F.when(F.col("is_kept"), F.struct("pidx", "passage"))
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.col("is_kept").cast("int")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["passage"]
                ),
                " ",
            ).alias("clean_text"),
        )
        .select(
            "doc_id",
            F.col("n_passages").cast("int").alias("n_passages"),
            F.col("n_kept").cast("int").alias("n_kept"),
            "clean_text",
        )
    )

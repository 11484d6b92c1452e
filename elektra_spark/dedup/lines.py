"""Cross-document boilerplate line removal (CCNet-style).

The training-pipeline op the passage deduplicator (dedup/passages.py)
deliberately is not: passage dedup keeps the FIRST occurrence of every
repeated span, while boilerplate removal drops EVERY occurrence of a line
that repeats across at least ``min_docs`` distinct documents — the CCNet /
RefinedWeb treatment of site templates, navigation chrome, license headers
and cookie banners, which repeat on thousands of pages and would otherwise
dominate the training distribution (Wenzek et al., "CCNet", LREC 2020).

Input is a pre-split line relation ``(doc_id, line_idx, line)`` — how a doc
becomes lines is the caller's tokenization policy (newlines for web text;
the contract query derives a deterministic header+chunk split, see
__spark_entry__.q_boilerplate_docs). Output reassembles the cleaned text
byte-exactly, so the invariant is testable as string equality, the same
discipline as the transcript text-roundtrip contract.

Scale shape (10^12-line deployment):

- the line-frequency table is TWO map-side-combinable shuffles on the line
  hash: first ``(hash, doc_id) → any`` distinct-within-doc collapse, then
  ``hash → count`` (an exact count-distinct without the planner's generic
  expand); a line repeated on 10^9 pages is still ONE reducer row per
  phase, never a hot key.
- classification back onto lines is a broadcast-or-shuffle hash join on the
  line hash (boilerplate hash tables are tiny relative to the corpus: the
  whole point is that few distinct lines account for the repetition).
- reassembly is one shuffle on doc_id with the order restored by
  ``array_sort`` over (line_idx, line) structs — no window function, no
  per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_doc_frequency(lines: DataFrame) -> DataFrame:
    """(doc_id, line) → (line_hash, n_docs): distinct-document frequency per
    distinct line content. Two combinable shuffles (see module docstring);
    the hash is xxhash64 of the raw line bytes — collisions at 64 bits are
    negligible for dedup decisions (same contract as dedup/exact.py)."""
    per_doc = lines.select(
        F.xxhash64("line").alias("line_hash"), "doc_id"
    ).dropDuplicates(["line_hash", "doc_id"])
    return per_doc.groupBy("line_hash").agg(F.count("*").cast("long").alias("n_docs"))


def strip_boilerplate(lines: DataFrame, min_docs: int) -> DataFrame:
    """(doc_id, line_idx, line) → (doc_id, n_lines, n_kept, clean_text).

    Drops every line whose content occurs in ≥ ``min_docs`` distinct
    documents; surviving lines re-join with ``\\n`` in original order.
    A document whose every line is boilerplate survives with
    ``clean_text = ''`` (the caller's quality gate decides its fate —
    this op never drops documents, only lines)."""
    if min_docs < 2:
        raise ValueError("min_docs must be ≥ 2 (1 would drop every line)")
    freq = line_doc_frequency(lines)
    keep = (
        lines.withColumn("line_hash", F.xxhash64("line"))
        .join(freq.filter(F.col("n_docs") >= min_docs), "line_hash", "left_anti")
    )
    totals = lines.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_lines"))
    kept = keep.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    return (
        totals.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )

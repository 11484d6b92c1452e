"""Sequence packing: concat-and-chunk documents into fixed context windows.

The last pre-training step every LLM pipeline runs: concatenate the corpus
in a stable document order and split it into ``context_len``-token training
windows (GPT-style "document packing"). The hard part at 100 TB is the
EXACT global prefix sum of token counts under the document order — a naive
``Window.orderBy(doc_id)`` funnels the whole corpus through one partition.
This module computes it hierarchically, the same two-level scan
:mod:`elektra_spark.ingest.edges` uses for conversation vid offsets:

1. range-partition by the order key, pin the partitioning once
   (``localCheckpoint``) so the totals job and the downstream join see
   identical pids;
2. per-partition running sums via a pid-partitioned window (parallel);
3. collect only the K per-partition totals, broadcast their exclusive
   prefix back as partition bases.

Driver traffic is K rows regardless of corpus size; no single-partition
exchange anywhere. All arithmetic is integral (token counts, ``div``), so
the DuckDB twin — one ordered window cumsum, affordable at oracle scale —
agrees exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_col: str | list[str],
    val_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact exclusive prefix sum of ``val_col`` under ``order_col`` order →
    input columns plus ``_prefix``. Hierarchical two-level scan; the order
    key (a column or a composite list — compared lexicographically) must be
    unique (document ids are)."""
    spark = df.sparkSession
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "_local", F.coalesce(F.sum(val_col).over(w), F.lit(0)).cast("long")
    )
    totals = local.groupBy("_pid").agg(F.sum(val_col).alias("tot")).orderBy("_pid").collect()
    base, bases = 0, []
    for r in totals:
        bases.append((r["_pid"], base))
        base += int(r["tot"])
    if bases:
        bdf = spark.createDataFrame(pd.DataFrame(bases, columns=["_pid", "_base"]))
    else:
        bdf = spark.createDataFrame([], "_pid int, _base long")
    return (
        local.join(F.broadcast(bdf), "_pid")
        .withColumn("_prefix", (F.col("_base") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_base")
    )


def pack_sequences(
    docs: DataFrame,
    context_len: int,
    n_toks: Column | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, n_toks, start_off, first_bin, last_bin): where each document
    lands when the corpus is concatenated in ``id_col`` order and split into
    ``context_len``-token windows. ``n_toks`` defaults to the whitespace
    token count; pass :func:`elektra_spark.text.analysis.bpe_token_count`
    for subword-budget packing."""
    if context_len < 1:
        raise ValueError(f"context_len must be >= 1, got {context_len}")
    if n_toks is None:
        n_toks = F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
    t = docs.select(id_col, n_toks.cast("long").alias("n_toks"))
    p = prefix_sum(t, id_col, "n_toks")
    return p.select(
        id_col,
        "n_toks",
        F.col("_prefix").alias("start_off"),
        F.expr(f"_prefix div {context_len}").alias("first_bin"),
        # greatest(n_toks, 1): a zero-token doc (possible under a custom
        # counter) occupies its start bin instead of dividing -1 — keeps
        # last_bin >= first_bin and sidesteps engine-specific negative
        # integer-division semantics
        F.expr(f"(_prefix + greatest(n_toks, 1) - 1) div {context_len}").alias("last_bin"),
    )


def pack_sequences_sql(
    context_len: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin: one ordered window cumsum (fine at oracle scale) with
    the identical integral bin arithmetic."""
    return f"""
  WITH t AS (
    SELECT {id_col} AS id,
           len(string_split(coalesce({text_col}, ''), ' '))::BIGINT AS n_toks
    FROM {table}
  ),
  p AS (
    SELECT id, n_toks,
           coalesce(sum(n_toks) OVER (ORDER BY id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_off
    FROM t
  )
  SELECT id AS {id_col}, n_toks, start_off,
         start_off // {context_len} AS first_bin,
         (start_off + greatest(n_toks, 1) - 1) // {context_len} AS last_bin
  FROM p
  """

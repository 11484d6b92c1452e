"""Streaming exact deduplication — a running min-id winner state table.

Batch exact dedup (:mod:`elektra_spark.dedup.exact`) is one grouped min on
the content key. The streaming expression of the same contract is a
**winner state table**: every micro-batch reduces to per-key minima and
MERGEs them into the state with ``rep = least(existing, incoming)``
(:meth:`SnapshotCatalog.merge_min` — Iceberg's ``WHEN MATCHED THEN UPDATE
SET rep = least(t.rep, s.rep)``).

The deterministic min-doc-id contract is what makes this production-safe:

- **order independence** — ``min`` is commutative/associative, so the final
  state is identical however documents are split into micro-batches (the
  contract the oracle twin checks: streaming result ≡ batch window-min),
- **replay safety** — ``min`` is idempotent, so a restarted query replaying
  its last in-flight micro-batch (Structured Streaming's at-least-once
  ``foreachBatch`` delivery) commits the same state: exactly-once
  *effective* semantics without a transactional sink, the same argument as
  :mod:`elektra_spark.streaming.updates`.

At 100 TB: per micro-batch the shuffle is one map-side-combinable grouped
min on the content key, sized by the BATCH; the MERGE touches state
proportional to distinct keys, exactly the Iceberg deployment's cost. The
state table never stores document text — only (key, rep).

Reference anchor: the reference engine's update surface is a live object
absorbing batches (dynamic_connectivity.h:44-110); this is the same
pattern applied to the dedup relation instead of the edge relation.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tables import SnapshotCatalog


def dedup_key(text_col: str = "text") -> Column:
    """Default content key: md5 of the raw text."""
    return F.md5(F.col(text_col))


def apply_document_stream(
    docs: DataFrame,
    catalog: SnapshotCatalog,
    checkpoint_dir: str,
    table: str = "dedup_state",
    id_col: str = "doc_id",
    key: Column | None = None,
    available_now: bool = True,
    on_batch: Callable[[int, int], None] | None = None,
):
    """Run a streaming DataFrame of documents through the winner state table;
    returns the started ``StreamingQuery``.

    ``key`` is the content-key column expression (default md5 of ``text``).
    ``on_batch(batch_id, n_keys)`` is an observability hook.
    """
    k = key if key is not None else dedup_key()

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        mins = (
            batch_df.select(F.col(id_col).cast("long").alias("rep"), k.alias("k"))
            .groupBy("k")
            .agg(F.min("rep").alias("rep"))
        )
        if catalog.exists(table):
            catalog.merge_min(table, mins, keys=["k"])
        else:
            catalog.write(table, mins, operation="create")
        if on_batch is not None:
            on_batch(batch_id, mins.count())

    writer = (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"elektra_dedup_{table}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_assignments(
    docs: DataFrame,
    catalog: SnapshotCatalog,
    table: str = "dedup_state",
    id_col: str = "doc_id",
    key: Column | None = None,
) -> DataFrame:
    """→ (id, rep): join documents against the winner state — every document
    mapped to the minimum id that shares its content key."""
    k = key if key is not None else dedup_key()
    keyed = docs.select(F.col(id_col), k.alias("k"))
    return keyed.join(catalog.read(table), "k").select(F.col(id_col), "rep")

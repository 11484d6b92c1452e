"""Streaming count-min sketch — additive partials, insert-only MERGE.

The streaming expression of :mod:`elektra_spark.text.cms`: each micro-batch
reduces to its own partial sketch (count-min sketches are additive — the
cell-wise sum of per-batch sketches equals the sketch of the union), and
the state table accumulates the partials keyed by ``(batch_id, i, b)``
through :meth:`SnapshotCatalog.merge_insert` (WHEN NOT MATCHED THEN
INSERT). Reading the sketch sums over batch ids.

Replay safety is structural rather than algebraic: counter addition is NOT
idempotent (unlike streaming dedup's ``min``), so a restarted query
replaying its last in-flight micro-batch would double-count under a
blind ``+=``. Keying the state by ``batch_id`` and committing with an
insert-only MERGE makes the replay a no-op — the replayed batch's rows
already match — giving exactly-once *effective* semantics on the same
argument as :mod:`elektra_spark.streaming.updates`. Structured Streaming
guarantees ``batch_id`` is stable across a replay, which is precisely the
hook this leans on.

At 100 TB: per micro-batch the shuffle is one map-side-combinable grouped
count sized by the BATCH; state grows by ≤ d×width rows per batch
(corpus-size independent), and compaction — summing closed batches into
one row per (i, b) — is itself just the additive merge.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables import SnapshotCatalog
from ..text.cms import CMS_D, partial_sketch


def apply_token_stream(
    docs: DataFrame,
    catalog: SnapshotCatalog,
    checkpoint_dir: str,
    width: int,
    d: int = CMS_D,
    table: str = "cms_state",
    text_col: str = "text",
    available_now: bool = True,
    on_batch: Callable[[int, int], None] | None = None,
):
    """Run a streaming DataFrame of documents into the per-batch partial
    sketch state table; returns the started ``StreamingQuery``."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        part = partial_sketch(batch_df, width=width, d=d, text_col=text_col).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        if catalog.exists(table):
            catalog.merge_insert(table, part, keys=["batch_id", "i", "b"])
        else:
            catalog.write(table, part, operation="create")
        if on_batch is not None:
            on_batch(batch_id, part.count())

    writer = (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"elektra_cms_{table}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sketch_from_state(catalog: SnapshotCatalog, table: str = "cms_state") -> DataFrame:
    """→ (i, b, c): the accumulated sketch — cell-wise sum over batch ids."""
    return (
        catalog.read(table)
        .groupBy("i", "b")
        .agg(F.sum("c").cast("long").alias("c"))
    )

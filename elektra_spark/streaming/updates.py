"""Streaming batch-dynamic connectivity: Structured Streaming micro-batches
driven through :class:`~elektra_spark.dynamic.updates.DynamicGraph`.

The reference's update surface is a sequence of batch calls on a live object
(``BatchAddEdges`` / ``BatchDeleteEdges``, dynamic_connectivity.h:44-110,
169-377; its mixed benchmark replays random batches, benchmarks/
benchmark.h:50-89). The Spark-first expression of that "stream of update
batches" is Structured Streaming's micro-batch model: every micro-batch IS
one batch-dynamic update, applied inside ``foreachBatch`` through the same
MERGE-committed catalog tables the batch API uses.

Semantics & fault tolerance:

- Within one micro-batch, inserts are applied before deletes (the reference
  harness's phase order, test/reference_tests/reference_connectivity.hpp:
  90-161). Ordering ACROSS batches is the source's offset order — with a
  file source, one file per micro-batch (``maxFilesPerTrigger=1``) makes
  batch boundaries explicit.
- Restart/resume: offsets live in the Structured Streaming checkpoint; a
  restarted query replays at most the last in-flight micro-batch.
- Replay safety: both update paths are idempotent on the catalog —
  ``batch_add_edges`` drops already-present edges (connectivity.h:425-437)
  and ``batch_delete_edges`` drops unknown edges (``RemoveUnknownEdges``),
  so a replayed micro-batch converges to the same labels/forest state:
  exactly-once *effective* semantics without a transactional sink.

At cluster scale this is the live-maintenance deployment mode: a compact
update stream (Kafka / file drops) keeps the connectivity tables current,
while each micro-batch's work is the same contracted-batch solve the batch
path uses — cost scales with the batch and affected components, never the
full graph.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dynamic.updates import DynamicGraph

#: canonical update-stream schema (op ∈ {'insert','delete'})
UPDATE_SCHEMA = "op string, src long, dst long"


def apply_edge_stream(
    updates: DataFrame,
    graph: DynamicGraph,
    checkpoint_dir: str,
    available_now: bool = True,
    on_batch: Callable[[int, int, int], None] | None = None,
):
    """Run a streaming DataFrame of edge updates ``(op, src, dst)`` through
    ``graph``; returns the started ``StreamingQuery``.

    ``available_now=True`` (default) drains everything currently available
    and stops — the deterministic replay/backfill mode; ``False`` leaves a
    continuous micro-batch query running. ``on_batch(batch_id, n_ins,
    n_del)`` is a per-batch observability hook (lineage/metrics live in the
    graph's catalog either way).
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.select(
            F.col("op").cast("string"),
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
        )
        # the micro-batch is consumed twice (insert + delete split); pin it
        # so the source scan runs once
        batch_df.persist()
        try:
            adds = batch_df.filter(F.col("op") == "insert").select("src", "dst")
            dels = batch_df.filter(F.col("op") == "delete").select("src", "dst")
            n_ins = adds.count()
            n_del = dels.count()
            if n_ins:
                graph.batch_add_edges(adds)
            if n_del:
                graph.batch_delete_edges(dels)
        finally:
            batch_df.unpersist()
        if on_batch is not None:
            on_batch(batch_id, n_ins, n_del)

    writer = (
        updates.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"elektra_dynamic_{graph.prefix}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_update_file(updates: DataFrame, dirpath: str, name: str) -> str:
    """Materialize one update batch as ONE parquet file ``<dirpath>/<name>``
    — with :func:`read_update_files`' one-file-per-trigger mode, one dropped
    file is one micro-batch is one batch-dynamic update. Returns the file
    path (callers stagger mtimes to pin the file-source order)."""
    import glob
    import shutil

    stage = os.path.join(dirpath, f"_stage_{name}")
    updates.select("op", "src", "dst").coalesce(1).write.mode("overwrite").parquet(stage)
    [part] = glob.glob(os.path.join(stage, "part-*.parquet"))
    dest = os.path.join(dirpath, name)
    shutil.move(part, dest)
    shutil.rmtree(stage)
    return dest


def read_update_files(spark, path: str, one_file_per_batch: bool = True) -> DataFrame:
    """File-source update stream over a directory of parquet drops with the
    canonical :data:`UPDATE_SCHEMA`. ``one_file_per_batch`` pins one file per
    micro-batch so each dropped file is one batch-dynamic update (files are
    consumed oldest-first)."""
    reader = spark.readStream.schema(UPDATE_SCHEMA)
    if one_file_per_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    return reader.parquet(path)

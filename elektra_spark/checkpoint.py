"""Superstep checkpointing, lineage, metrics, and mid-run resume (M5).

Every superstep of an iterative operator (CC fixpoint, PageRank, LPA) can be
routed through a :class:`CheckpointedRun`, which

- writes the superstep's state (labels/ranks) as a new snapshot of a catalog
  table — the snapshot commit *is* the lineage truncation (the plan reads
  back from parquet, so the DAG never grows across supersteps), and the
  atomic manifest swap makes every completed superstep a durable resume
  point;
- appends per-partition lineage rows ``(run_id, state, superstep,
  partition_id, rows)`` — the queryable analogue of the reference's debug
  dumps (elektra connectivity.h:466-534);
- appends frontier metrics ``(run_id, state, superstep, frontier, seconds)``
  — mirroring the reference's timers (benchmarks/get_time.h) but as a table.

Resume contract: ``latest_step()`` returns the last durably committed
superstep; operators accept ``start_step``/``init_*`` to continue
mid-iteration (see tests/test_checkpoint.py for the kill-and-resume proof).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import SnapshotCatalog


class CheckpointedRun:
    def __init__(self, spark: SparkSession, root: str, run_id: str, lineage: bool = True):
        self.spark = spark
        self.run_id = run_id
        self.catalog = SnapshotCatalog(spark, root)
        self.lineage = lineage

    def _state_table(self, state: str) -> str:
        return f"{self.run_id}_{state}"

    # -- checkpoint function factory (plugs into operators' `checkpoint=`) --
    def checkpoint_fn(self, state: str = "labels"):
        def _cp(df: DataFrame, step: int) -> DataFrame:
            if step < 0:
                # static relations (edge lists, adjacency): materialize only
                return df.localCheckpoint(eager=True)
            self.catalog.write(self._state_table(state), df, operation=f"superstep={step}")
            out = self.catalog.read(self._state_table(state))
            if self.lineage:
                part_rows = (
                    out.groupBy(F.spark_partition_id().alias("partition_id"))
                    .agg(F.count("*").alias("rows"))
                    .withColumn("run_id", F.lit(self.run_id))
                    .withColumn("state", F.lit(state))
                    .withColumn("superstep", F.lit(step))
                    .withColumn("committed_at", F.lit(time.time()))
                    .select("run_id", "state", "superstep", "partition_id", "rows", "committed_at")
                )
                if self.catalog.exists("lineage"):
                    self.catalog.append("lineage", part_rows)
                else:
                    self.catalog.write("lineage", part_rows)
            return out

        # operators whose state lives outside the DataFrame plan (the bsp
        # PageRank kernel's bucket files) key per-superstep durable commits
        # off this flag — the EphemeralCheckpointer (lineage truncation only)
        # deliberately lacks it. CONTRACT (documented at CheckpointFn,
        # operators/cc.py): the flag lives on the function object, so any
        # wrapper (partial/lambda/decorator) must re-set
        # ``wrapper.durable = inner.durable`` or per-step durability silently
        # downgrades to an end-of-run commit.
        _cp.durable = True
        return _cp

    # -- frontier metrics hook (plugs into operators' `on_superstep=`) ------
    def metrics_hook(self, state: str = "labels"):
        def _hook(step: int, frontier: int, seconds: float) -> None:
            row = self.spark.createDataFrame(
                [(self.run_id, state, int(step), int(frontier), float(seconds), time.time())],
                "run_id string, state string, superstep int, frontier long, seconds double, committed_at double",
            )
            if self.catalog.exists("metrics"):
                self.catalog.append("metrics", row)
            else:
                self.catalog.write("metrics", row)

        return _hook

    # -- resume -------------------------------------------------------------
    def latest_step(self, state: str = "labels") -> int | None:
        """Last durably committed superstep for this state, or None."""
        name = self._state_table(state)
        if not self.catalog.exists(name):
            return None
        ops = [s["operation"] for s in self.catalog.history(name)]
        steps = [int(o.split("=")[1]) for o in ops if o.startswith("superstep=")]
        return max(steps) if steps else None

    def load(self, state: str = "labels", step: int | None = None) -> DataFrame:
        """State at a superstep (default: latest committed)."""
        name = self._state_table(state)
        if step is None:
            return self.catalog.read(name)
        snaps = self.catalog.history(name)
        version = next(s["version"] for s in snaps if s["operation"] == f"superstep={step}")
        return self.catalog.read(name, version=version)

    def lineage_table(self) -> DataFrame:
        return self.catalog.read("lineage")

    def metrics_table(self) -> DataFrame:
        return self.catalog.read("metrics")

"""Synchronous label propagation (community assignment).

Not in the reference (mandated by the north rule); reuses CC's message
machinery with a frequency vote instead of min (SURVEY.md §2.7). Semantics
are pinned down so results are **exactly** reproducible against the oracle:

- synchronous supersteps (all vertices update from the previous round's
  labels),
- fixed round count (no data-dependent termination),
- deterministic tiebreak: highest neighbor-label frequency, then minimum
  label.

The vote is a two-level aggregation: ``groupBy(vid, label).count`` (map-side
combinable — hub fan-in becomes one combiner entry per map partition) then an
argmax via ``max(struct(cnt, -label))``, which encodes the
frequency-then-min-label order as a single lexicographic max (min-aggregates
are the BSP analogue of the reference's write_min, utilities/cas.h).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cc import CheckpointFn, EphemeralCheckpointer, SuperstepHook, _no_aqe


def label_propagation(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    rounds: int = 5,
    checkpoint: CheckpointFn | None = None,
    on_superstep: SuperstepHook | None = None,
    start_step: int = 0,
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """→ (vid, label) after exactly ``rounds`` synchronous supersteps."""
    both = edges.select("src", "dst").union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    if vertices is not None:
        universe = vertices.select("vid")
    else:
        universe = both.select(F.col("src").alias("vid")).distinct()

    if checkpoint is None:
        checkpoint = EphemeralCheckpointer()
    with _no_aqe(edges.sparkSession):
        both = checkpoint(both, -1)
        if init_labels is not None:
            labels = checkpoint(init_labels.select("vid", "label"), start_step)
        else:
            labels = checkpoint(universe.withColumn("label", F.col("vid")), start_step)

        for step in range(start_step, start_step + rounds):
            t0 = time.time()
            votes = (
                both.join(labels, both.src == labels.vid)
                .select(F.col("dst").alias("v"), "label")
                .groupBy("v", "label")
                .agg(F.count("*").alias("cnt"))
            )
            # argmax by (frequency, then min label): max of (cnt, -label)
            winner = (
                votes.groupBy("v")
                .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("w"))
                .select(F.col("v").alias("vid"), (-F.col("w.neg")).alias("new_label"))
            )
            new_labels = labels.join(winner, "vid", "left").select(
                "vid", F.coalesce("new_label", F.col("label")).alias("label")
            )
            labels = checkpoint(new_labels, step + 1)
            if on_superstep is not None:
                on_superstep(step, -1, time.time() - t0)
    return labels

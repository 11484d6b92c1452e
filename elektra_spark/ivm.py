"""Incremental view maintenance — keep a materialized sum/count aggregate
consistent under row deltas WITHOUT recomputing from the base table.

The lakehouse pattern: a 100 TB fact table feeds a small materialized
aggregate; a MERGE commit touches 0.1% of rows; recomputing the view scans
everything, while IVM folds just the delta in. For distributive aggregates
(COUNT, SUM) the delta algebra is exact: represent a deletion as the row
with all measures negated, aggregate the delta batch, and ADD it to the
stored view group-wise; a group whose row count reaches zero disappears.

Exactness contract: measures must be exact-sum types (int64 counts,
quantized integer cents — NOT raw doubles, whose (sum(all) − sum(deleted))
differs from sum(remaining) in the last ulps and drifts commit after
commit). The contract row quantizes prices to cents for this reason; the
same rule is what production IVM on decimals gets for free.

The apply is expressed as union + re-aggregate (map-side combinable — the
delta is tiny, the view is group-cardinality-sized; no full-table scan
anywhere), committed as a new snapshot through the catalog, so the view
history is itself time-travelable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tables import SnapshotCatalog


def sum_agg(df: DataFrame, keys: list[str], measures: dict[str, F.Column]) -> DataFrame:
    """→ keys + n_rows + one summed column per measure — the materialized
    view shape ``apply_delta`` maintains."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[F.sum(col).cast("long").alias(name) for name, col in measures.items()],
    )


def delta_rows(df: DataFrame, keys: list[str], measures: dict[str, F.Column], sign: int) -> DataFrame:
    """A delta batch in view shape: ``sign`` = +1 for inserted rows, −1 for
    deleted rows."""
    if sign not in (1, -1):
        raise ValueError(f"sign must be +1 or -1, got {sign}")
    return df.groupBy(*keys).agg(
        (F.lit(sign) * F.count(F.lit(1))).cast("long").alias("n_rows"),
        *[(F.lit(sign) * F.sum(col)).cast("long").alias(name) for name, col in measures.items()],
    )


def apply_delta(
    cat: SnapshotCatalog,
    table: str,
    delta: DataFrame,
    keys: list[str],
    operation: str = "ivm_delta",
) -> DataFrame:
    """Fold a view-shaped delta into the stored view: group-wise ADD of
    every non-key column, groups at zero rows dropped, committed as a new
    snapshot (whose ``operation`` string the caller may use as an atomic
    applied-marker — see :func:`apply_delta_stream`). Returns the new
    view."""
    cur = cat.read(table)
    val_cols = [c for c in cur.columns if c not in keys]
    merged = (
        cur.unionByName(delta.select(*cur.columns))
        .groupBy(*keys)
        .agg(*[F.sum(c).cast("long").alias(c) for c in val_cols])
        .filter(F.col("n_rows") > 0)
    )
    cat.write(table, merged, operation=operation)
    return cat.read(table)


def apply_delta_stream(
    cat: SnapshotCatalog,
    table: str,
    delta_stream: DataFrame,
    keys: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Maintain the view from a STREAM of view-shaped deltas (Structured
    Streaming foreachBatch): each micro-batch folds in exactly once.

    Replay safety: foreachBatch is at-least-once, but delta application is
    NOT idempotent (adding twice double-counts), so each batch_id is
    stamped into the view snapshot's ``operation`` string IN THE SAME
    catalog commit as the view itself, and replayed batches no-op after a
    history scan. A separate applied-ledger table was the previous design;
    it left a crash window between the view commit and the ledger append
    in which an at-least-once replay double-counted (ADVICE r5) — the
    single-commit stamp closes it. View-shaped deltas form a commutative
    monoid (exact integer adds), so the final view is independent of how
    the input splits into batches. Returns the streaming query."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"ivm_delta:batch={int(batch_id)}"
        if cat.exists(table) and any(
            snap.get("operation") == tag for snap in cat.history(table)
        ):
            return
        apply_delta(cat, table, batch_df, keys, operation=tag)

    writer = delta_stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

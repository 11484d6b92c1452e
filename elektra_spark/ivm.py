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


def apply_delta(cat: SnapshotCatalog, table: str, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a view-shaped delta into the stored view: group-wise ADD of
    every non-key column, groups at zero rows dropped, committed as a new
    snapshot. Returns the new view."""
    cur = cat.read(table)
    val_cols = [c for c in cur.columns if c not in keys]
    merged = (
        cur.unionByName(delta.select(*cur.columns))
        .groupBy(*keys)
        .agg(*[F.sum(c).cast("long").alias(c) for c in val_cols])
        .filter(F.col("n_rows") > 0)
    )
    cat.write(table, merged, operation="ivm_delta")
    return cat.read(table)

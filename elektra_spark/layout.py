"""Z-order (Morton-curve) data layout — multi-dimensional clustering for
data skipping, the OPTIMIZE ZORDER BY surface of a lakehouse table.

A table range-partitioned on one column skips scans only for predicates on
that column. Interleaving the bits of TWO dimension keys makes file-level
min/max stats tight in both dimensions at once: sorting by the Morton value
z(x, y) and cutting into equal-width z blocks gives every block a small
bounding rectangle, so a predicate on EITHER column prunes most blocks.

Pipeline (engine-reproducible; bit interleave and block split are integer,
binning is a shared double expression — envelope note at _range_bin):

1. **Range-bin** each dimension to ``bits`` bits:
   ``bin = ⌊(v − min) · 2^bits / (max − min + 1)⌋`` — rank-free binning from
   the global min/max (two scalar aggregates, broadcast), monotone in v.
2. **Interleave**: ``z = Σ_i ((xbin≫i)&1)≪2i | ((ybin≫i)&1)≪(2i+1)`` — a
   fixed sum of 2·bits exact integer terms.
3. **Block**: ``block = ⌊z · n_blocks / 2^(2·bits)⌋`` — equal z-width cuts
   (the file boundaries a writer would emit).

``zorder_blocks`` reports per-block row counts and min/max of both
dimensions — the skipping bounds themselves, so the contract row checks the
layout's *effectiveness evidence*, not just the curve arithmetic.

At 100 TB this is one pass to compute z (map-side; min/max from table
stats), one range-partitioned sort on z (the same shuffle a sorted write
would do anyway), and file stats fall out of the writer. The curve beats
hilbert for implementability (pure bit ops — no state machine) at a small
locality cost; both are standard OPTIMIZE choices.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16


def interleave_bits(xbin: Column, ybin: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton value of two ``bits``-bit non-negative ints (x even lanes,
    y odd lanes) — a fixed sum of exact integer terms."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xbin, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(ybin, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a + b, terms).cast("long")


def _range_bin(v: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    # (v - vmin) * 2^bits / (range) evaluates as IEEE double division in
    # both engines (Spark and the DuckDB twin), so the supported key-range
    # envelope is |range| < 2^(53 - bits): beyond it the double product
    # loses integer precision and block assignment near bin boundaries may
    # disagree across engines. Within the envelope both engines compute the
    # identical double and floor, which is what the oracle contract pins.
    scale = F.lit(1 << bits)
    return F.floor((v - vmin) * scale / (vmax - vmin + 1)).cast("long")


def zorder_blocks(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = ZORDER_BITS,
    n_blocks: int = 64,
) -> DataFrame:
    """→ (block, n_rows, min_x, max_x, min_y, max_y): the block layout a
    z-ordered write of ``df`` produces, with its data-skipping bounds."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    if n_blocks < 1:
        raise ValueError(f"n_blocks must be >= 1, got {n_blocks}")
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    stats = df.agg(
        F.min(x).alias("minx"),
        F.max(x).alias("maxx"),
        F.min(y).alias("miny"),
        F.max(y).alias("maxy"),
    )
    binned = df.crossJoin(F.broadcast(stats)).select(
        x.alias("x"),
        y.alias("y"),
        _range_bin(x, F.col("minx"), F.col("maxx"), bits).alias("xbin"),
        _range_bin(y, F.col("miny"), F.col("maxy"), bits).alias("ybin"),
    )
    z = interleave_bits(F.col("xbin"), F.col("ybin"), bits)
    blk = F.floor(z * F.lit(n_blocks) / F.lit(float(1 << (2 * bits)))).cast("long")
    return (
        binned.select("x", "y", blk.alias("block"))
        .groupBy("block")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )


def zorder_blocks_sql(
    table: str, x_col: str, y_col: str, bits: int = ZORDER_BITS, n_blocks: int = 64
) -> str:
    """DuckDB twin of :func:`zorder_blocks` — same binning, interleave and
    block-cut arithmetic."""
    inter = " + ".join(
        f"(((xbin >> {i}) & 1) << {2 * i}) + (((ybin >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )
    scale = 1 << bits
    return f"""
  WITH v AS (SELECT {x_col}::BIGINT AS x, {y_col}::BIGINT AS y FROM {table}),
  st AS (SELECT min(x) AS minx, max(x) AS maxx, min(y) AS miny, max(y) AS maxy FROM v),
  binned AS (SELECT x, y,
                    floor((x - st.minx) * {scale} / (st.maxx - st.minx + 1))::BIGINT AS xbin,
                    floor((y - st.miny) * {scale} / (st.maxy - st.miny + 1))::BIGINT AS ybin
             FROM v CROSS JOIN st),
  zed AS (SELECT x, y, ({inter})::BIGINT AS z FROM binned)
  SELECT floor(z * {n_blocks} / {float(1 << (2 * bits))!r})::BIGINT AS block,
         count(*)::BIGINT AS n_rows,
         min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
  FROM zed GROUP BY block
  """

"""SimHash near-duplicate fingerprints, with a generated SQL twin.

16-bit simhash: token t hashes to md5(t); bit j of the fingerprint is set
iff Σ_tokens (±1 by bit j of the token hash) ≥ 0. The bit arithmetic is
derived from a fixed hex nibble of the digest so the identical computation is
expressible in ANSI SQL — ``simhash_sql()`` generates the DuckDB twin from
the same loop, guaranteeing engine/oracle agreement by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BITS = 16


def _bit(tok_hash: Column, j: int) -> Column:
    """bit j of the token hash: nibble j of the md5 hex, lowest bit."""
    nib = F.conv(F.substring(tok_hash, j + 1, 1), 16, 10).cast("int")
    return nib % 2


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """→ (id, simhash int)."""
    toks = df.select(
        F.col(id_col), F.explode(F.filter(F.split(F.col(text_col), " "), lambda t: t != "")).alias("t")
    ).withColumn("th", F.md5("t"))
    aggs = [F.sum(_bit(F.col("th"), j) * 2 - 1).alias(f"s{j}") for j in range(N_BITS)]
    sums = toks.groupBy(id_col).agg(*aggs)
    fp = sum((F.when(F.col(f"s{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0)) for j in range(N_BITS)), F.lit(0))
    return sums.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB SQL computing the identical simhash (generated from the same
    bit layout as :func:`simhash`)."""
    bit_sums = ", ".join(
        f"SUM((CASE WHEN ('0x' || substr(th, {j + 1}, 1))::INTEGER % 2 = 1 THEN 1 ELSE -1 END)) AS s{j}"
        for j in range(N_BITS)
    )
    fp = " + ".join(f"(CASE WHEN s{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(N_BITS))
    return f"""
    WITH toks AS (
      SELECT {id_col}, md5(t.tok) AS th
      FROM {table}, unnest(list_filter(string_split({text_col}, ' '), x -> x <> '')) AS t(tok)
    ), sums AS (
      SELECT {id_col}, {bit_sums} FROM toks GROUP BY {id_col}
    )
    SELECT {id_col}, CAST({fp} AS BIGINT) AS simhash FROM sums
    """


def hamming_near_pairs(fps: DataFrame, id_col: str = "doc_id", max_distance: int = 2) -> DataFrame:
    """(a, b, distance) pairs within Hamming distance — banded join on the
    two 8-bit halves (a pair within distance ≤ 2 of 16 bits shares at least
    one exact half when distance ≤ 1 per half fails only for 2 flips in the
    same half; both halves are probed, the exact distance filter decides)."""
    f = fps.select(F.col(id_col).alias("id"), F.col("simhash"))
    lo = f.select("id", (F.col("simhash") % 256).alias("band"), F.lit(0).alias("half"), "simhash")
    hi = f.select("id", (F.col("simhash") / 256).cast("long").alias("band"), F.lit(1).alias("half"), "simhash")
    stacked = lo.unionByName(hi)
    a = stacked.select("band", "half", F.col("id").alias("a"), F.col("simhash").alias("fa"))
    b = stacked.select("band", "half", F.col("id").alias("b"), F.col("simhash").alias("fb"))
    pairs = a.join(b, ["band", "half"]).filter(F.col("a") < F.col("b"))
    dist = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        pairs.select("a", "b", dist.alias("distance"))
        .filter(F.col("distance") <= max_distance)
        .dropDuplicates(["a", "b"])
    )

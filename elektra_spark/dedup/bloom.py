"""Bloom-filter benchmark decontamination — the broadcast-bitmap scale path
beside the exact semi-join decontaminator (``ngram.decontaminate``).

Why a second path: the exact decontaminator broadcasts the *eval n-gram
strings* and semi-joins the exploded corpus against them. At pre-training
scale the eval union (every benchmark ever published) can reach 10^9
distinct n-grams — tens of GB of strings, past broadcast limits — while a
Bloom filter over the same set is ``m/8`` bytes regardless of string
length (2^33 bits = 1 GiB holds 10^9 grams at k=4 under ~2.5% FPR, and m
tunes the rate down further). The standard trade: membership becomes
*approximate with one-sided error* — a Bloom-positive gram may be a false
positive, but a Bloom-negative gram is NEVER contaminated, so filtering on
the Bloom flag only over-drops; it can't leak eval data into training.
(tests/test_pipeline_ops.py asserts exactly this superset property against
the exact path.)

Determinism contract (repo-wide discipline — the DOULION coin, the matching
priorities): every hash is an **md5 slice both engines evaluate
bit-identically** — bit_j(g) = int(md5("j:" || g)[:12], 16) mod m — so the
DuckDB twin reproduces the *filter itself* (the set of set bits), not just
the flags: a false positive is a false positive in both engines.

100 TB plan shape:
- build: eval grams explode → k bit positions each → ``distinct`` →
  per-word ``bit_or`` aggregate (map-side combinable) → the bitmap is a
  bounded ``m/64``-row relation collected once and broadcast as a NumPy
  array (m/8 bytes — the ONLY driver materialization, independent of
  corpus size).
- probe: corpus grams get their k bit columns JVM-side (md5 + conv inside
  whole-stage codegen); an Arrow-batched pandas UDF indexes the broadcast
  bitmap vectorized (numpy fancy-indexing, no per-row Python); the per-doc
  count combines map-side. The corpus is never shuffled against the eval
  set at all — the single shuffle is the per-doc aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from .minhash import shingles

BLOOM_M_BITS = 1 << 16  # default filter width; 2^16 keeps the sf0.01 fill
# ratio high enough that false positives actually occur, so the FPR math
# and the twin's bit-exactness are exercised, not vacuous
BLOOM_K = 4  # hash functions


def _bit_col(gram: Column, j: int, m_bits: int) -> Column:
    """Bit position j for a gram: int(md5("j:"||g)[:12], 16) mod m — the
    identical expression the DuckDB twin computes as
    ('0x' || substr(md5(...), 1, 12))::BIGINT % m. 12 hex chars < 2^48,
    exact in both engines; the value is non-negative so % == pmod."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}:"), gram)), 1, 12), 16, 10).cast("long")
    return (h % m_bits).alias(f"b{j}")


def bloom_bits(
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """→ (bit,) the distinct set-bit positions of the eval filter."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    ev = eval_docs.select(F.explode(shingles(txt, n)).alias("g")).distinct()
    per_j = [ev.select(_bit_col(F.col("g"), j, m_bits).alias("bit")) for j in range(k)]
    out = per_j[0]
    for p in per_j[1:]:
        out = out.unionByName(p)
    return out.distinct()


def _bitmap_array(bits: DataFrame, m_bits: int) -> np.ndarray:
    """Pack the bit relation into an m/64-word uint64 bitmap. The packing
    aggregate (word → bit_or of masks) combines map-side; the collect is
    bounded at m/64 rows (m/8 bytes) by construction — the broadcast-side
    materialization every Bloom deployment makes exactly once."""
    words = (
        bits.select(
            (F.col("bit") / 64).cast("long").alias("w"),
            # SQL shiftleft: the PySpark wrapper only takes a literal int
            # shift, but the underlying expression accepts a column
            F.expr("shiftleft(1L, CAST(bit % 64 AS INT))").alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("m"))
        .collect()
    )
    arr = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in words:
        arr[r["w"]] = np.uint64(r["m"] & 0xFFFFFFFFFFFFFFFF)
    return arr


def bloom_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """→ (doc_id, n_bloom_hits, bloom_contaminated) for every training doc
    (docs minus eval_docs by id): n_bloom_hits = distinct n-grams whose k
    Bloom bits are ALL set in the eval filter; bloom_contaminated =
    (n_bloom_hits > 0).

    One-sided error vs the exact decontaminator: n_bloom_hits ≥ n_shared
    per doc and bloom_contaminated ⊇ contaminated (a set gram always
    probes positive; a positive probe may be a hash collision).
    """
    spark = docs.sparkSession
    bitmap = _bitmap_array(bloom_bits(eval_docs, text_col, n, m_bits, k), m_bits)
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf(BooleanType())
    def bit_set(c: pd.Series) -> pd.Series:
        # vectorized bitmap lookup: no per-row Python, one fancy index +
        # shift over the whole Arrow batch; called once per hash function
        # and AND-ed JVM-side
        bm = bc.value
        b = c.to_numpy(dtype=np.int64)
        word = bm[b >> 6]
        shift = (b & 63).astype(np.uint64)
        return pd.Series(((word >> shift) & np.uint64(1)).astype(bool))

    txt = F.coalesce(F.col(text_col), F.lit(""))
    train = docs.join(eval_docs.select(id_col), id_col, "left_anti")
    grams = train.select(F.col(id_col), F.explode(shingles(txt, n)).alias("g")).distinct()
    pos = bit_set(_bit_col(F.col("g"), 0, m_bits))
    for j in range(1, k):
        pos = pos & bit_set(_bit_col(F.col("g"), j, m_bits))
    probed = grams.select(id_col, pos.alias("pos"))
    hits = probed.filter("pos").groupBy(id_col).agg(F.count("*").alias("n_bloom_hits"))
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bloom_hits", F.lit(0)).alias("n_bloom_hits"),
            (F.coalesce("n_bloom_hits", F.lit(0)) > 0).alias("bloom_contaminated"),
        )
    )

"""DSIR-lite: hashed-unigram importance weights for data selection.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023)
scores every raw document by the log-likelihood ratio of a *target*
distribution vs the *raw* distribution over hashed n-gram features, then
resamples proportionally. This module computes the per-document score with
unigram features hashed into ``n_buckets`` buckets (the paper's hashing
trick; unigrams instead of bigrams keeps the twin cheap — the bucket
expression is the only thing a bigram variant would change):

    score(d) = (1/|d|) * sum_{w in d} [ log p_t(b(w)) - log p_r(b(w)) ]

with add-one smoothing: p(b) = (count(b) + 1) / (N + n_buckets). The
bucket hash is the repo's portable md5 slice (first 8 hex chars → int),
so DuckDB replays it bit-for-bit.

Scale shape (100 TB): tokenize-explode with map-side combine → ONE shuffle
for the global bucket histograms (≤ ``n_buckets`` rows each, so the
log-ratio table is broadcast back), then ONE shuffle keyed on doc id for
the per-document sum. No per-row Python anywhere; the token explode is a
generator inside whole-stage codegen.

FP note: the per-doc sum adds ~dozens of O(1e-3) log-ratio doubles whose
association order differs between engines; results are rounded to 6 dp
(the repo-wide contract convention — same exposure as modularity /
conductance, which hash-match at this rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 1024


def _bucket(w: Column, n_buckets: int) -> Column:
    return F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long") % n_buckets


def dsir_weights(
    docs: DataFrame,
    target: Column,
    n_buckets: int = N_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (id, n_toks, dsir_score) for every document with ≥1 whitespace
    token. ``target`` is a boolean Column selecting the target subset the
    importance weights aim at (e.g. ``F.col("lang") == "en"``)."""
    base = docs.select(id_col, F.col(text_col).alias("_t"), target.alias("_tgt"))
    toks = base.select(
        id_col,
        "_tgt",
        F.explode(F.split(F.coalesce(F.col("_t"), F.lit("")), " ")).alias("w"),
    ).filter(F.col("w") != "")
    tb = toks.select(id_col, "_tgt", _bucket(F.col("w"), n_buckets).alias("b"))

    hist = tb.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("ct"),
    )
    tot = hist.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )  # 1-row scalar relation
    lr = (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(F.col("ct") + 1)
                - F.log(F.col("nt") + n_buckets)
                - F.log(F.col("cr") + 1)
                + F.log(F.col("nr") + n_buckets)
            ).alias("lr"),
        )
    )
    return (
        tb.join(F.broadcast(lr), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(F.sum("lr") / F.count(F.lit(1)), 6).alias("dsir_score"),
        )
    )


def dsir_sql(
    target_pred: str,
    n_buckets: int = N_BUCKETS,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: same md5-slice bucket, same smoothing, same per-token
    join + sum. ``target_pred`` is the SQL boolean matching ``target``."""
    return f"""
  WITH toks AS (
    SELECT {id_col} AS id, ({target_pred}) AS tgt,
           unnest(string_split(coalesce({text_col}, ''), ' ')) AS w
    FROM {table}
  ),
  tb AS (
    SELECT id, tgt, ('0x' || substr(md5(w), 1, 8))::BIGINT % {n_buckets} AS b
    FROM toks WHERE w <> ''
  ),
  hist AS (
    SELECT b, count(*)::BIGINT AS cr,
           sum(CASE WHEN tgt THEN 1 ELSE 0 END)::BIGINT AS ct
    FROM tb GROUP BY b
  ),
  tot AS (SELECT sum(cr)::BIGINT AS nr, sum(ct)::BIGINT AS nt FROM hist),
  lr AS (
    SELECT b, ln(ct + 1) - ln(nt + {n_buckets}) - ln(cr + 1) + ln(nr + {n_buckets}) AS lr
    FROM hist, tot
  )
  SELECT tb.id AS {id_col}, count(*)::BIGINT AS n_toks,
         round(sum(lr.lr) / count(*), 6) AS dsir_score
  FROM tb JOIN lr USING (b)
  GROUP BY tb.id
  """

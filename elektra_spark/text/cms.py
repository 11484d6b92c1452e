"""Count-min sketch token frequencies (Cormode & Muthukrishnan 2005).

The streaming-sketch counterpart to the exact `groupBy(token)` histogram:
``d`` hash rows of ``width`` buckets each; a token's estimate is the MIN of
its ``d`` bucket counters — always an overestimate, never an under. The
repo's HyperBall HLL (operators/anf.py) covers distinct-counting; this
covers frequency estimation, the other sketch a 100 TB token pipeline
actually ships (heavy-hitter detection without materializing the tail).

Determinism contract: row ``i``'s hash is the md5 slice of ``f"{i}:" + w``
— the exact keying :mod:`elektra_spark.dedup.minhash` uses — so the DuckDB
twin rebuilds the identical sketch and identical estimates, integer-exact.

Scale shape: ONE token explode feeding two map-side-combinable aggregations
(the d×width sketch — tiny, broadcast back — and the distinct-token bucket
table). Nothing quadratic; the sketch size is independent of corpus size,
which is the whole point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_D = 4  # hash rows


def _bucket(w: Column, i: int, width: int) -> Column:
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), w)), 1, 8), 16, 10).cast(
        "long"
    ) % width


def token_cms(
    docs: DataFrame,
    width: int = 64,
    d: int = CMS_D,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (token, true_cnt, cms_est) for every distinct whitespace token:
    the exact corpus frequency next to the count-min estimate from a
    ``d``×``width`` sketch (est ≥ true always; equality when none of the
    token's ``d`` buckets collides with another token's mass)."""
    if width < 1 or d < 1:
        raise ValueError(f"width and d must be >= 1, got {width}, {d}")
    toks = docs.select(
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias("w")
    ).filter(F.col("w") != "")

    # one pass → (w, i, bucket) long form; both aggregations hang off it
    long = toks.select(
        "w",
        F.posexplode(F.array(*[_bucket(F.col("w"), i, width) for i in range(d)])).alias(
            "i", "b"
        ),
    )
    sketch = long.groupBy("i", "b").agg(F.count(F.lit(1)).alias("c"))
    est = (
        long.distinct()
        .join(F.broadcast(sketch), ["i", "b"])
        .groupBy("w")
        .agg(F.min("c").alias("cms_est"))
    )
    true_cnt = toks.groupBy("w").agg(F.count(F.lit(1)).alias("true_cnt"))
    return true_cnt.join(est, "w").select(
        F.col("w").alias("token"), "true_cnt", "cms_est"
    )


def token_cms_sql(
    width: int = 64,
    d: int = CMS_D,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB twin: identical per-row md5 keying, sketch, and min-estimate."""
    rows = " UNION ALL ".join(
        f"SELECT w, {i} AS i, ('0x' || substr(md5('{i}:' || w), 1, 8))::BIGINT % {width} AS b FROM toks"
        for i in range(d)
    )
    return f"""
  WITH toks AS (
    SELECT unnest(string_split(coalesce({text_col}, ''), ' ')) AS w FROM {table}
  ),
  tnn AS (SELECT w FROM toks WHERE w <> ''),
  long AS ({rows.replace('FROM toks', 'FROM tnn')}),
  sk AS (SELECT i, b, count(*)::BIGINT AS c FROM long GROUP BY i, b),
  est AS (
    SELECT t.w, min(sk.c) AS cms_est
    FROM (SELECT DISTINCT w, i, b FROM long) t JOIN sk USING (i, b)
    GROUP BY t.w
  ),
  tc AS (SELECT w, count(*)::BIGINT AS true_cnt FROM tnn GROUP BY w)
  SELECT tc.w AS token, tc.true_cnt, est.cms_est
  FROM tc JOIN est ON tc.w = est.w
  """

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


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias("w")
    ).filter(F.col("w") != "")


def token_buckets(toks: DataFrame, width: int, d: int) -> DataFrame:
    """(w) → (w, i, b) long form: each token occurrence with its ``d``
    (hash row, bucket) pairs — the shared substrate for the batch sketch
    and the streaming per-batch partial sketches."""
    return toks.select(
        "w",
        F.posexplode(F.array(*[_bucket(F.col("w"), i, width) for i in range(d)])).alias(
            "i", "b"
        ),
    )


def partial_sketch(
    docs: DataFrame, width: int, d: int = CMS_D, text_col: str = "text"
) -> DataFrame:
    """→ (i, b, c): the count-min sketch of just these documents. Sketches
    are ADDITIVE — summing per-batch partials cell-wise equals the sketch of
    the union — which is what makes the streaming variant exact."""
    return (
        token_buckets(_tokens(docs, text_col), width, d)
        .groupBy("i", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


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
    sketch = partial_sketch(docs, width=width, d=d, text_col=text_col)
    return estimates_vs_exact(docs, sketch, width, d, text_col)


def estimates_vs_exact(
    docs: DataFrame,
    sketch: DataFrame,
    width: int,
    d: int = CMS_D,
    text_col: str = "text",
) -> DataFrame:
    """→ (token, true_cnt, cms_est) evaluating an ALREADY-BUILT sketch
    (batch or accumulated-streaming — cf. streaming/cms.py) against the
    exact corpus counts."""
    toks = _tokens(docs, text_col)
    est = (
        token_buckets(toks, width, d)
        .distinct()
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

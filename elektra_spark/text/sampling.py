"""Deterministic corpus sampling — hash-Bernoulli and stratified quotas.

Training-data pipelines subsample and re-mix corpora constantly (per-language
token budgets, source re-weighting, held-out splits). Random sampling is
useless at this layer: a re-run must pick the *same* documents (resumable
jobs, reproducible ablations), and an oracle must be able to replay the
choice. Both operators here key the decision on ``md5`` of the document key,
so the sample is a pure function of the data — Spark and DuckDB (and any
other engine with md5) agree byte-for-byte, and re-running on an updated
corpus keeps every previously-kept unchanged document.

Two primitives, two cost classes:

- :func:`hash_sample` — Bernoulli(rate) by comparing an 8-hex-char md5
  prefix against a precomputed hex threshold. **Zero shuffle**: a map-side
  filter fused into the scan, so at 100 TB it costs one pass and prunes
  before any downstream exchange. Use it for global rate-based thinning.
- :func:`stratified_quota_sample` — exactly ``min(quota, |stratum|)`` rows
  per stratum, the md5-smallest keys first (ties broken by the key itself,
  so the pick is total-ordered and engine-independent). **One shuffle** on
  the stratum column; per-stratum state is a bounded row_number window, so
  skewed strata cost sort time but not memory blowup. Use it for per-language
  / per-source mixing budgets.

The hex-string comparison (rather than casting the prefix to an integer)
is deliberate: lowercase-hex lexicographic order equals numeric order, and
every engine compares strings identically — no conv()/overflow semantics to
reconcile across engines.

Key contract: ``key_col`` must be NON-NULL (and should be unique — the key
is the identity of the pick). Engines disagree on NULL ordering (Spark
sorts NULLS FIRST ascending, DuckDB defaults NULLS LAST) and ``NULL < t``
filters NULL keys out of :func:`hash_sample` silently, so a nullable key
breaks the cross-engine replay guarantee. Weights passed to
:func:`weight_budget_sample` must be non-negative — a negative weight can
make the running sum dip back under budget and the kept set non-contiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HEX_WIDTH = 8  # 32 bits of the digest: rate resolution 2^-32


def _hash_prefix(key):
    return F.substring(F.md5(key.cast("string")), 1, _HEX_WIDTH)


def hash_threshold(rate: float) -> str:
    """Hex threshold t such that P[md5-prefix < t] = rate (exact at 2^-32)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "g" * _HEX_WIDTH  # 'g' sorts above 'f': keeps every row
    return format(int(rate * (16**_HEX_WIDTH)), f"0{_HEX_WIDTH}x")


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on md5(key) — no shuffle."""
    t = hash_threshold(rate)
    return df.filter(_hash_prefix(F.col(key_col)) < F.lit(t))


def stratified_quota_sample(df: DataFrame, strata_col: str, quota: int, key_col: str) -> DataFrame:
    """Exactly min(quota, |stratum|) rows per stratum — md5-smallest keys.

    Total-ordered pick: rank by (md5(key), key) within the stratum, keep
    rank ≤ quota. One shuffle on ``strata_col``.
    """
    if quota < 0:
        raise ValueError(f"quota must be ≥ 0, got {quota}")
    w = Window.partitionBy(strata_col).orderBy(_hash_prefix(F.col(key_col)), F.col(key_col))
    return df.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= quota).drop("_rk")


def weight_budget_sample(df: DataFrame, strata_col: str, budget, weight_col: str, key_col: str) -> DataFrame:
    """Greedy md5-order prefix per stratum under a cumulative weight budget.

    The corpus-mixing primitive stated in weights rather than row counts
    ("20k chars / 2B tokens of each language"): walk each stratum in
    (md5(key), key) order and keep rows while the *inclusive* running sum of
    ``weight_col`` stays ≤ ``budget``. Deterministic and engine-replayable
    like the other samplers; an explicit ROWS frame (not the default RANGE)
    pins the running sum so engines agree even on tied weights. Same cost
    shape as :func:`stratified_quota_sample` — one shuffle on the stratum —
    but without the rank-limit pre-prune (the cutoff depends on upstream
    weights, so every stratum row rides the shuffle once). Weights must be
    non-negative (module docstring): the operator keeps rows with inclusive
    running sum ≤ budget, which is the greedy prefix only when the running
    sum is monotone.
    """
    w = (
        Window.partitionBy(strata_col)
        .orderBy(_hash_prefix(F.col(key_col)), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("_cum", F.sum(weight_col).over(w)).filter(F.col("_cum") <= budget).drop("_cum")


AES_U_DENOM = float(1 << 48)  # md5 12-hex slice space; u = (slice+1)/2^48 ∈ (0,1]


def weighted_sample_topk(df: DataFrame, k: int, weight_col, key_col: str = "doc_id") -> DataFrame:
    """Efraimidis–Spirakis weighted sampling WITHOUT replacement: keep the k
    rows maximizing u^(1/w) — equivalently ln(u)/w — where u is the
    md5-derived uniform of the row key. P[row in sample] is the classic
    sequential weighted draw; the md5 key makes it a deterministic pure
    function of the data (same replay contract as hash_sample).

    → original columns + (sel_weight, sel_key, rank), rank 1..k by
    (sel_key DESC, key ASC). ``sel_key`` is rounded 1e-9 BEFORE ranking so
    the cut is total-ordered and engine-independent (the tfidf precedent —
    ln differs in the last ulp across libms).

    Weights must be strictly positive (ln(u) ≤ 0: w→0 would send the key to
    -inf and never win); non-positive-weight rows are DROPPED before
    ranking — the same batch contract the streaming twin documents.

    At 100 TB: one map-side key computation + a distributed top-k
    (``orderBy().limit(k)`` → TakeOrdered: per-partition heaps, no global
    sort/shuffle); the final rank window runs on k rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u_int = F.conv(
        F.substring(F.md5(F.concat(F.lit("aes:"), F.col(key_col).cast("string"))), 1, 12), 16, 10
    ).cast("long")
    u = (u_int + F.lit(1)).cast("double") / F.lit(AES_U_DENOM)
    w = weight_col.cast("double")
    key = F.round(F.log(u) / w, 9)
    top = (
        df.withColumn("sel_weight", w)
        .withColumn("sel_key", key)
        .filter(F.col("sel_weight") > 0)
        .orderBy(F.col("sel_key").desc(), F.col(key_col))
        .limit(k)
    )
    win = Window.orderBy(F.col("sel_key").desc(), F.col(key_col))
    return top.withColumn("rank", F.row_number().over(win).cast("long"))


def weighted_sample_topk_sql(k: int, weight_sql: str, table: str = "documents", key_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`weighted_sample_topk` (same md5 slice, same u
    denominator, same 1e-9 key rounding). ``weight_sql`` must evaluate to the
    identical strictly-positive weight."""
    u = (
        f"((('0x' || substr(md5('aes:' || CAST({key_col} AS VARCHAR)), 1, 12))::BIGINT + 1)"
        f" / {AES_U_DENOM!r})"
    )
    return f"""
  WITH wt AS (SELECT {key_col}, ({weight_sql})::DOUBLE AS sel_weight FROM {table}),
  keyed AS (SELECT {key_col}, sel_weight,
                   round(ln({u}) / sel_weight, 9) AS sel_key
            FROM wt WHERE sel_weight > 0),
  rk AS (SELECT {key_col}, sel_weight, sel_key,
                row_number() OVER (ORDER BY sel_key DESC, {key_col} ASC)::BIGINT AS rank
         FROM keyed)
  SELECT * FROM rk WHERE rank <= {k}
  """

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

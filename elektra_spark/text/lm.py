"""Bigram language-model perplexity scoring — the CCNet-style LM quality
filter (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020): score every document by its
cross-entropy under a language model trained on a trusted slice, then
keep/bucket by perplexity. CCNet uses a KenLM 5-gram; the engine's
re-expression is an **add-one-smoothed bigram** whose probabilities are
ratios of integer corpus counts, so the DuckDB twin reproduces the model
exactly (both engines evaluate ``ln`` of the same integers and round the
per-doc averages at the repo's 1e-6 convention).

Model (the operator contract, mirrored verbatim by the twin):

- tokens = whitespace split, empties dropped (the corpus-wide shared
  tokenization — dedup/minhash.py shingles n=1 / the twins' ``toks`` CTE);
- training bigrams = consecutive token pairs within each LM doc;
- ``P(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V)`` with ``c(w1,·)`` the
  bigram-START count (so the distribution normalizes over the V-sized
  vocab incl. one unseen event) and ``V = |distinct LM tokens| + 1``;
  unseen ``w1`` degrades smoothly to the uniform ``1/V`` — no OOV special
  case, the coalesced-zero counts produce it;
- per doc: ``cross_entropy = -avg(ln P)`` over its bigram OCCURRENCES
  (not distinct pairs — repeated constructions weigh in, as in any LM
  score), ``perplexity = exp(cross_entropy)``; docs with < 2 tokens have
  no bigrams → NULL score (reported, not dropped).

100 TB plan shape: the LM is two combinable count aggregates over the
trusted slice plus one scalar vocab count; scoring is two shuffle-hash
joins of the corpus bigram stream against the (much smaller) count
relations — broadcastable when the trusted slice is small — and one
map-side-combinable per-doc average. No Python in the hot path; ``ln`` of
integer-valued columns stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _token_col(text_col: str) -> Column:
    return F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), " "), lambda t: t != "")


def _bigram_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (id, w1, w2) one row per consecutive-token occurrence. The
    size-<2 guard matters: Spark's ``sequence(1, 0)`` DESCENDS instead of
    returning empty, so short docs must short-circuit explicitly."""
    toks = _token_col(text_col)
    pairs = F.when(F.size(toks) < 2, F.array().cast("array<struct<w1:string,w2:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"), F.element_at(toks, i + 1).alias("w2")
            ),
        )
    )
    return df.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def bigram_lm_scores(
    docs: DataFrame,
    lm_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_bigrams, cross_entropy, perplexity) for EVERY doc in
    ``docs`` (the LM slice scores itself too — its docs are simply the
    well-modelled ones), model trained on ``lm_docs``. See module doc for
    the exact model; CE/PPL rounded to 1e-6, NULL when the doc has no
    bigram (n_bigrams = 0)."""
    c12 = _bigram_pairs(lm_docs, id_col, text_col).groupBy("w1", "w2").agg(
        F.count("*").alias("c12")
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # scalar vocab size: one aggregate row (the repo's bounded-collect class)
    vocab = (
        lm_docs.select(F.explode(_token_col(text_col)).alias("t")).distinct().count() + 1
    )

    scored = (
        _bigram_pairs(docs, id_col, text_col)
        .join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .select(
            id_col,
            (
                F.log(F.coalesce("c12", F.lit(0)) + 1)
                - F.log(F.coalesce("c1", F.lit(0)) + vocab)
            ).alias("lnp"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-F.avg("lnp"), 6).alias("cross_entropy"),
            F.round(F.exp(-F.avg("lnp")), 6).alias("perplexity"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "cross_entropy",
            "perplexity",
        )
    )

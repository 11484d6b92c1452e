"""BM25 ranked retrieval over the documents table — the relevance primitive
of corpus curation (query-targeted subcorpus selection, contamination
scoring against an eval query set, quality-weighted sampling).

Okapi BM25 (Robertson & Walker, and the Lucene-default idf form):

    idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)
    w(t, d)     = idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    score(q, d) = Σ_{t ∈ q} w(t, d)

Reproducibility contract (the same discipline as sim/kmeans.py): the
per-(doc, term) weight is a fixed-shape expression over exact integers
(tf, dl, df, N — avgdl's sum is an exact int so S/N is one IEEE division),
identical in any engine; it is then quantized ``round(w · 1e6)::bigint`` so
the per-document SUM over query terms is an exact integer — order-free, no
last-ulp drift however the terms arrive. The reported score divides back by
1e6 once.

Plan shape at 100 TB: the query-term ``IN`` filter pushes into the exploded
term stream, so the tf aggregation only shuffles (doc, hit-term) pairs; the
doc-length aggregation is map-side combinable on doc_id; N / avgdl / df are
broadcast-sized relations. The global rank is a hierarchical
range-partitioned prefix count (text/packing.py prefix_sum) — no
single-partition window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .packing import prefix_sum

W_SCALE = 1_000_000  # weight quantization: exact-int per-doc term sums


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    min_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_hit, score, rank): BM25 of every document that matches at
    least one query term, ranked on the exact integer score (doc_id
    tiebreak). Tokenizer shared with tfidf_top_terms: lower, split
    ``[^a-z]+``, length ≥ ``min_len``."""
    if not query_terms or len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be a non-empty list of distinct terms")
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z]+"),
        lambda t: F.length(t) >= min_len,
    )
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    # dl BEFORE the query filter — document length is a corpus statistic
    dl = base.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )  # avgdl = sum_dl / n_docs: exact ints, one IEEE division
    terms = base.select("doc_id", F.explode("toks").alias("term")).filter(
        F.col("term").isin(list(query_terms))
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))

    n = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log((n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    tfd = F.col("tf").cast("double")
    w = idf * (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(w * W_SCALE).cast("long").alias("w_int"))
    )
    scored = per_term.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit"), F.sum("w_int").alias("s_int")
    )
    # global dense rank WITHOUT a single-partition window: a hierarchical
    # range-partitioned prefix count over the unique (−s_int, doc_id) key —
    # the same two-level scan the sequence packer uses. rank = prefix + 1.
    ranked = prefix_sum(
        scored.withColumn("_neg", -F.col("s_int")).withColumn("_one", F.lit(1)),
        ["_neg", "doc_id"],
        "_one",
    )
    return ranked.select(
        "doc_id",
        "n_hit",
        (F.col("s_int").cast("double") / F.lit(float(W_SCALE))).alias("score"),
        (F.col("_prefix") + 1).cast("long").alias("rank"),
    )


def bm25_sql(
    query_terms: list[str], k1: float = 1.2, b: float = 0.75, min_len: int = 3
) -> str:
    """DuckDB twin of :func:`bm25_scores` over the ``documents`` view — same
    tokenizer, same fixed-shape weight expression, same 1e6 quantization, so
    the integer sums agree exactly."""
    terms_in = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
  WITH base AS MATERIALIZED (
    SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text, '')), '[^a-z]+'),
                               t -> len(t) >= {min_len}) AS toks
    FROM documents),
  dl AS MATERIALIZED (SELECT doc_id, len(toks)::BIGINT AS dl FROM base),
  stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM dl),
  tf AS (SELECT doc_id, t.term, count(*)::BIGINT AS tf
         FROM base, unnest(toks) AS t(term)
         WHERE t.term IN ({terms_in})
         GROUP BY doc_id, t.term),
  dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
  pt AS (SELECT tf.doc_id,
                round(
                  ln((stats.n_docs::DOUBLE - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                  * (tf.tf::DOUBLE * {k1 + 1.0!r})
                  / (tf.tf::DOUBLE + {k1!r} * ({1.0 - b!r} + {b!r} * dl.dl::DOUBLE
                       / (stats.sum_dl::DOUBLE / stats.n_docs::DOUBLE)))
                  * {W_SCALE})::BIGINT AS w_int
         FROM tf JOIN dfreq USING (term) JOIN dl ON dl.doc_id = tf.doc_id
         CROSS JOIN stats),
  sc AS (SELECT doc_id, count(*)::BIGINT AS n_hit, sum(w_int)::BIGINT AS s_int
         FROM pt GROUP BY doc_id)
  SELECT doc_id, n_hit, s_int::DOUBLE / {float(W_SCALE)!r} AS score,
         row_number() OVER (ORDER BY s_int DESC, doc_id ASC)::BIGINT AS rank
  FROM sc
  """

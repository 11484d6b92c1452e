"""Exact set-similarity join via prefix filtering (PPJoin family — Xiao et
al., WWW 2008) — ALL pairs with shingle-set Jaccard ≥ τ, exactly.

The LSH path (dedup/ngram.py near_duplicates) is probabilistic: banding can
miss a qualifying pair. This operator is the EXACT counterpart for when the
dedup decision must be complete (legal/contamination sweeps): it returns
precisely the pairs brute-force verification would, but without the
quadratic candidate set.

Prefix filter: order every document's shingles by global document frequency
ascending (rarest first, shingle-string tiebreak — a total order shared by
any engine). If two sets with sizes sa, sb satisfy J ≥ τ, they share at
least one shingle among the first ``s - ⌈τ·s⌉ + 1`` of each (else the
overlap is too small) — so candidates are pairs sharing a PREFIX shingle,
and the join fans out on each document's RAREST shingles, which is exactly
where fan-out is cheapest. A length filter (1000·min(sa,sb) ≥ τₚₘ·max)
prunes the rest. Verification is an exact integer count: keep iff
``i·1000 ≥ τₚₘ·(sa + sb − i)`` — no float anywhere in the decision.

τ is passed in permille so the threshold arithmetic is integer-exact and
engine-independent (same convention as the DOULION/IC coins).

At 100 TB: the frequency relation is vocabulary-sized (broadcast); the
per-doc rank is one shuffle on doc_id; the candidate join keys on prefix
shingles whose df the rarest-first order minimizes; verification joins key
on (pair, shingle). The DuckDB twin deliberately does NOT replay the prefix
filter — it brute-forces all token-sharing pairs — so the contract row
checks the optimization against the definition, not against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .minhash import shingles


def similarity_join(
    docs: DataFrame,
    tau_permille: int,
    shingle_n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (a, b, inter, uni, jaccard): every pair a < b with
    |Sa ∩ Sb| / |Sa ∪ Sb| ≥ tau_permille/1000 over distinct word
    ``shingle_n``-gram sets. Empty documents (no shingles) never pair."""
    if not 0 < tau_permille <= 1000:
        raise ValueError(f"tau_permille must be in (0, 1000], got {tau_permille}")
    tp = tau_permille
    ex = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles(F.coalesce(F.col(text_col), F.lit("")), shingle_n))).alias("tok"),
    )
    sz = ex.groupBy("id").agg(F.count(F.lit(1)).alias("s"))
    freq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    ranked = (
        ex.join(F.broadcast(freq), "tok")
        .withColumn("r", F.row_number().over(Window.partitionBy("id").orderBy("f", "tok")))
        .join(sz, "id")
    )
    # prefix length = s − ⌈τ·s⌉ + 1, all-integer: ⌈τ·s⌉ = (s·τₚₘ + 999) div 1000
    plen = F.col("s") - F.floor((F.col("s") * tp + 999) / 1000) + 1
    prefix = ranked.filter(F.col("r") <= plen).select("id", "tok", "s")
    cand = (
        prefix.select(F.col("id").alias("a"), "tok", F.col("s").alias("sa"))
        .join(prefix.select(F.col("id").alias("b"), "tok", F.col("s").alias("sb")), "tok")
        .filter(F.col("a") < F.col("b"))
        .filter(
            F.lit(1000) * F.least("sa", "sb") >= F.lit(tp) * F.greatest("sa", "sb")
        )
        .select("a", "b", "sa", "sb")
        .distinct()
    )
    inter = (
        cand.join(ex.select(F.col("id").alias("a"), "tok"), "a")
        .join(ex.select(F.col("id").alias("b"), "tok"), ["b", "tok"], "left_semi")
        .groupBy("a", "b", "sa", "sb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    uni = F.col("sa") + F.col("sb") - F.col("inter")
    return (
        inter.filter(F.col("inter") * 1000 >= F.lit(tp) * uni)
        .select(
            "a",
            "b",
            F.col("inter").cast("long").alias("inter"),
            uni.cast("long").alias("uni"),
            F.round(F.col("inter").cast("double") / uni.cast("double"), 6).alias("jaccard"),
        )
    )


def similarity_join_sql(tau_permille: int, shingle_n: int = 2) -> str:
    """Brute-force DuckDB twin over the ``documents`` view: all
    shingle-sharing pairs, same integer threshold — no prefix filter, so it
    independently checks the pruning dropped nothing."""
    return f"""
  WITH toks AS (
    SELECT doc_id, list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS tk
    FROM documents
  ), sh AS (
    SELECT doc_id,
           CASE WHEN len(tk) = 0 THEN []::VARCHAR[]
                ELSE list_transform(generate_series(0, greatest(len(tk) - {shingle_n}, 0)),
                                    i -> array_to_string(tk[i + 1 : i + {shingle_n}], ' '))
           END AS shingles
    FROM toks
  ), ex AS MATERIALIZED (
    SELECT DISTINCT doc_id, s FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
  ), sz AS (SELECT doc_id, count(*) AS s FROM ex GROUP BY doc_id),
  i AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
  SELECT i.a, i.b, i.i::BIGINT AS inter,
         (sa.s + sb.s - i.i)::BIGINT AS uni,
         round(i.i::DOUBLE / (sa.s + sb.s - i.i), 6) AS jaccard
  FROM i JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b
  WHERE i.i * 1000 >= {tau_permille} * (sa.s + sb.s - i.i)
  """


def containment_join(
    docs: DataFrame,
    tau_permille: int,
    shingle_n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT containment join: every ORDERED pair (a, b), a ≠ b, with
    |Sa ∩ Sb| / |Sa| ≥ tau_permille/1000 — "b contains a". The asymmetric
    companion of :func:`similarity_join`: Jaccard misses a short document
    swallowed whole by a long one (union dominated by the long side);
    containment is the measure that catches quote-expansion and
    template-plus-payload duplication.

    Same prefix-filter discipline, containment-specific bound: if
    |Sa ∩ Sb| ≥ ⌈τ·sa⌉ then the (sa − ⌈τ·sa⌉ + 1)-prefix of a (rarest-first
    global order) shares a shingle with b's FULL set, so candidates join
    a-prefixes against all of b's shingles — the fan-out rides a's rarest
    shingles. Verification is the same exact integer count. → (a, b, inter,
    sa, containment)."""
    if not 0 < tau_permille <= 1000:
        raise ValueError(f"tau_permille must be in (0, 1000], got {tau_permille}")
    tp = tau_permille
    ex = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles(F.coalesce(F.col(text_col), F.lit("")), shingle_n))).alias("tok"),
    )
    sz = ex.groupBy("id").agg(F.count(F.lit(1)).alias("s"))
    freq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    ranked = (
        ex.join(F.broadcast(freq), "tok")
        .withColumn("r", F.row_number().over(Window.partitionBy("id").orderBy("f", "tok")))
        .join(sz, "id")
    )
    plen = F.col("s") - F.floor((F.col("s") * tp + 999) / 1000) + 1
    prefix = ranked.filter(F.col("r") <= plen).select(F.col("id").alias("a"), "tok", F.col("s").alias("sa"))
    cand = (
        prefix.join(ex.select(F.col("id").alias("b"), "tok"), "tok")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b", "sa")
        .distinct()
    )
    inter = (
        cand.join(ex.select(F.col("id").alias("a"), "tok"), "a")
        .join(ex.select(F.col("id").alias("b"), "tok"), ["b", "tok"], "left_semi")
        .groupBy("a", "b", "sa")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return inter.filter(F.col("inter") * 1000 >= F.lit(tp) * F.col("sa")).select(
        "a",
        "b",
        F.col("inter").cast("long").alias("inter"),
        F.col("sa").cast("long").alias("sa"),
        F.round(F.col("inter").cast("double") / F.col("sa").cast("double"), 6).alias("containment"),
    )


def containment_join_sql(tau_permille: int, shingle_n: int = 2) -> str:
    """Brute-force DuckDB twin of :func:`containment_join` — all ordered
    shingle-sharing pairs, same integer threshold, no prefix filter."""
    return f"""
  WITH toks AS (
    SELECT doc_id, list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS tk
    FROM documents
  ), sh AS (
    SELECT doc_id,
           CASE WHEN len(tk) = 0 THEN []::VARCHAR[]
                ELSE list_transform(generate_series(0, greatest(len(tk) - {shingle_n}, 0)),
                                    i -> array_to_string(tk[i + 1 : i + {shingle_n}], ' '))
           END AS shingles
    FROM toks
  ), ex AS MATERIALIZED (
    SELECT DISTINCT doc_id, s FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
  ), sz AS (SELECT doc_id, count(*) AS s FROM ex GROUP BY doc_id),
  i AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id <> b.doc_id
        GROUP BY a.doc_id, b.doc_id)
  SELECT i.a, i.b, i.i::BIGINT AS inter, sa.s::BIGINT AS sa,
         round(i.i::DOUBLE / sa.s, 6) AS containment
  FROM i JOIN sz sa ON sa.doc_id = i.a
  WHERE i.i * 1000 >= {tau_permille} * sa.s
  """

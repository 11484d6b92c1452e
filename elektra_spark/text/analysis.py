"""Text analysis for large-scale training-data pipelines.

All functions are pure ``pyspark.sql.functions`` column expressions (JVM-side,
whole-stage-codegen'd — no Python in the hot path), so they pushdown-compose
with scans and stay cheap at 100 TB. Each has an exact ANSI-SQL twin used by
the DuckDB oracle in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small multilingual stopword marker sets for the n-gram/lexicon language
# heuristic (deterministic, vocabulary-based — no external models)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "de", "est"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenization pieces: letter runs | digit runs | single
# punctuation marks; whitespace delimits. The alternatives are disjoint
# character classes, so Java regex (Spark) and RE2 (DuckDB) match identically.
BPE_PIECE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
BPE_CHARS_PER_SUBWORD = 4


def bpe_token_count(text: Column) -> Column:
    """Deterministic BPE-ish subword token estimate, pure JVM expressions:
    pre-tokenize with :data:`BPE_PIECE_RE`, then each letter run of length L
    counts ceil(L/4) subwords (the ~4-chars-per-token BPE average), digit
    runs one token per digit (BPE digit splitting), punctuation one each.
    Vocabulary-free, so the SQL oracle reproduces it exactly; a real
    merges-table BPE would drop in as a pandas UDF without changing the
    schema."""
    pieces = F.regexp_extract_all(text, F.lit(BPE_PIECE_RE), 0)
    per = F.transform(
        pieces,
        lambda p: F.when(
            p.rlike("^[A-Za-z]"), F.ceil(F.length(p) / BPE_CHARS_PER_SUBWORD)
        )
        .when(p.rlike("^[0-9]"), F.length(p).cast("long"))
        .otherwise(F.lit(1).cast("long")),
    )
    total = F.aggregate(per, F.lit(0).cast("long"), lambda a, v: a + v)
    # NULL text → 0 tokens (not NULL), mirroring the SQL twin's coalesce — an
    # aggregate over a NULL array is NULL, which would flip downstream hashes
    return F.coalesce(total, F.lit(0).cast("long"))


def distinct_token_ratio(text: Column) -> Column:
    """type-token ratio — a standard quality heuristic."""
    return F.size(F.array_distinct(tokens(text))) / F.size(tokens(text))


def punct_ratio(text: Column) -> Column:
    """fraction of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    hits = F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(token_count(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: length band, lexical diversity, low
    punctuation noise. Deterministic arithmetic only."""
    n = token_count(text)
    len_ok = F.when((n >= 5) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.3))
    return F.round(0.5 * len_ok + 0.4 * distinct_token_ratio(text) + 0.1 * (1 - punct_ratio(text)), 6)


def lang_id(text: Column) -> Column:
    """Marker-lexicon language ID: argmax language by marker-token hits,
    'und' when nothing matches. Vectorized set-intersection per row."""
    toks = tokens(text)
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    # fold languages in fixed order; strictly-greater keeps the first argmax
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        take = hits > best_hits
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(take, hits).otherwise(best_hits)
    return best_lang


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the token-normalized text (stable across
    whitespace variance). Engine + oracle share md5 exactly."""
    return F.md5(F.array_join(F.filter(tokens(text), lambda t: t != ""), " "))


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    min_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, term, term_rank, tf, score): the ``k`` highest-TF-IDF
    terms per document — the keyword-extraction / topic-feature primitive of
    a corpus pipeline.

    Semantics pinned for exact oracle reproducibility:

    - terms: ``lower(text)`` split on ``[^a-z]+`` (identical regex class in
      Java and RE2), keeping tokens of length ≥ ``min_len``;
    - ``tf`` = raw in-document count; ``idf = ln((1+N)/(1+df)) + 1``
      (smoothed, sklearn convention — never divides by zero);
    - ``score = round(tf · idf, 6)``; per-doc rank by the total order
      ``(score DESC, term ASC)`` — ordering on the *rounded* score so
      last-ulp ``ln`` differences between engines cannot flip the cut.

    Plan shape: explode → two map-side-combinable aggregations (per-doc TF,
    corpus DF) → broadcast-sized DF join (vocabulary ≪ corpus) → per-doc
    top-k window. At 100 TB the only big shuffle keys on ``(doc_id, term)``;
    the DF relation is vocabulary-sized and broadcasts.
    """
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z]+"),
        lambda t: F.length(t) >= min_len,
    )
    terms = df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
    # consumed twice (corpus DF aggregate + the scored join): materialize the
    # tokenize+count once instead of re-exploding the corpus per branch
    tf = terms.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    ).localCheckpoint(eager=False)
    # one-row corpus size joined in lazily (no collect at build time — the
    # only eager builder in this module would make plan-only callers scan)
    nd = df.select(F.countDistinct(id_col).cast("double").alias("nd"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    idf = F.log((F.lit(1.0) + F.col("nd")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(nd)).select(
        "doc_id", "term", "tf", F.round(F.col("tf") * idf, 6).alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= k)
        .select("doc_id", "term", "term_rank", "tf", "score")
    )


def text_profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document profile used by pipeline filters."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        F.round(distinct_token_ratio(t), 6).alias("ttr"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    )


def repetition_profile(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style intra-document repetition signals →
    (doc_id, n_tokens, dup_token_frac, top_bigram_frac).

    - ``dup_token_frac``: fraction of tokens whose token *type* occurs more
      than once in the document (the token analogue of Gopher's
      duplicate-line-character fraction — these docs have no newlines).
    - ``top_bigram_frac``: occurrences of the most frequent word bigram over
      all bigram occurrences (Gopher's top-2-gram rule). Single-token docs
      use the shingle helper's clamped one-token window (dedup/minhash.py
      shingles); empty docs report 0 for both.

    Looping text ("a b a b a b ...") scores near 1.0 on both; natural text
    sits low. Pipelines drop documents above a threshold before training.

    Scale story: two explode → groupBy chains, each a single combinable
    shuffle keyed on (doc, token) then doc — no joins against the corpus
    body, and the final assembly joins three doc-keyed aggregates.
    """
    from elektra_spark.dedup.minhash import shingles

    # NULL text counts as empty (the shingle helper's empty-array guard keys
    # on size()==0, which NULL dodges — same coalesce the BPE counter uses);
    # tokenization otherwise matches the shingle path (split ' ', drop '')
    # so the DuckDB twin's toks CTE is bit-identical
    t = F.coalesce(F.col(text_col), F.lit(""))
    tok = docs.select(
        F.col(id_col), F.explode(F.filter(F.split(t, " "), lambda x: x != "")).alias("tk")
    )
    tc = tok.groupBy(id_col, "tk").count()
    dup = tc.groupBy(id_col).agg(
        F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0)).alias("dup_toks"),
        F.sum("count").alias("n_tokens"),
    )
    bg = docs.select(F.col(id_col), F.explode(shingles(t, 2)).alias("g"))
    bgc = bg.groupBy(id_col, "g").count()
    tb = bgc.groupBy(id_col).agg(
        F.max("count").alias("top_bg"), F.sum("count").alias("n_bigrams")
    )
    return (
        docs.select(id_col)
        .join(dup, id_col, "left")
        .join(tb, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.round(
                F.coalesce(F.col("dup_toks") / F.col("n_tokens"), F.lit(0.0)), 6
            ).alias("dup_token_frac"),
            F.round(
                F.coalesce(F.col("top_bg") / F.col("n_bigrams"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
        )
    )

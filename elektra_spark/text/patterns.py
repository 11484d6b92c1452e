"""Dolma-style pattern taggers: PII-shaped span detection + redaction.

Frontier corpus pipelines run regex taggers over every document before
training (Dolma's ``pii_regex`` taggers, CCNet/C4 cleanup passes): count
email / IPv4 / phone-shaped spans, and emit a redacted copy with each span
replaced by a typed placeholder. Both halves are pure JVM column
expressions (``regexp_extract_all`` / ``regexp_replace`` — whole-stage
codegen, no Python), so at 100 TB the tagger fuses into the parquet scan:
one pass, no shuffle, column-pruned to (id, text).

Cross-engine regex contract: every pattern below uses only character
classes, bounded repetition, non-capturing groups, and ASCII ``\\b`` word
boundaries — the subset on which Java's regex (Spark) and RE2 (DuckDB)
agree. No backreferences, no lookaround.

Redaction applies the patterns in :data:`PATTERN_ORDER` order (emails
first, so the host part of an address is never half-eaten by the IPv4
pattern); the DuckDB twin nests ``regexp_replace(..., 'g')`` in the same
order, making the redacted-text fingerprint byte-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}",
}
PATTERN_ORDER = ["email", "ipv4", "phone"]
REDACTIONS = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("long")


def redact(text: Column) -> Column:
    """Replace every tagged span with its typed placeholder, in
    :data:`PATTERN_ORDER` order."""
    out = text
    for name in PATTERN_ORDER:
        out = F.regexp_replace(out, PATTERNS[name], REDACTIONS[name])
    return out


def pattern_tags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (id, n_email, n_ipv4, n_phone, redacted_fp): per-document span
    counts plus the md5 fingerprint of the redacted text (the fingerprint —
    not the full redacted body — keeps the contract row narrow; production
    would select ``redact(...)`` itself)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        id_col,
        *[_count(t, PATTERNS[n]).alias(f"n_{n}") for n in PATTERN_ORDER],
        F.md5(redact(t)).alias("redacted_fp"),
    )


def _sql_redact(expr: str) -> str:
    out = expr
    for name in PATTERN_ORDER:
        out = f"regexp_replace({out}, '{PATTERNS[name]}', '{REDACTIONS[name]}', 'g')"
    return out


def pattern_tags_sql(
    table: str = "documents", text_expr: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin generated from the same pattern/redaction literals.
    ``text_expr`` may be any SQL expression (the contract row passes the
    deterministic PII-augmentation expression through here)."""
    t = f"coalesce({text_expr}, '')"
    counts = ", ".join(
        f"len(regexp_extract_all({t}, '{PATTERNS[n]}')) AS n_{n}"
        for n in PATTERN_ORDER
    )
    return f"""
  SELECT {id_col}, {counts}, md5({_sql_redact(t)}) AS redacted_fp
  FROM {table}
  """

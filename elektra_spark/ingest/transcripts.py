"""Deterministic synthetic transcripts table (FIXTURES.md §1).

Schema (authoritative, from BASELINE.json input_hint):
``(conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp)``.

Generation is **pure column arithmetic over ``spark.range``** — every value is
a deterministic function of ``(seed, conversation index, turn index)`` computed
with ``xxhash64``. No Python RNG, no driver-side data: the same call produces
identical bytes at any parallelism and any scale, which is what makes the
sf-small fixtures and the 10^12-turn production story the *same code path*.

Skew is built in deliberately (it is a test surface, not an accident):

- conversation lengths are clipped-lognormal in [2, 200] (long chains stress
  CC convergence depth),
- tool usage follows a Zipf-ish (power-of-two decay) distribution over a small
  vocabulary, so tool-actor vertices become high-degree hubs (stresses
  ``groupBy(dst)`` skew handling in PageRank — SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOOL_VOCAB = ["bash", "read", "edit", "write", "grep", "glob", "web", "sql"]
TEXT_VOCAB = [
    "the", "graph", "edge", "vertex", "spark", "join", "shuffle", "label",
    "rank", "merge", "batch", "query", "tree", "forest", "level", "component",
    "turn", "tool", "agent", "plan", "scan", "filter", "group", "sort",
    "hash", "min", "sum", "count", "link", "cut", "walk", "path",
]


def _u01(*cols) -> F.Column:
    """Deterministic uniform [0,1) from xxhash64 of the given columns."""
    h = F.xxhash64(*cols)
    # abs(hash) / 2^63 — good enough uniformity for fixture synthesis
    return (F.abs(h) % F.lit(2**53)).cast("double") / F.lit(float(2**53))


def synth_transcripts(
    spark: SparkSession,
    n_conversations: int,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Synthesize the transcripts table for ``n_conversations`` conversations.

    Expected turns ≈ n_conversations × ~20 (median lognormal length ~15).
    """
    conv = spark.range(n_conversations, numPartitions=partitions).withColumnRenamed("id", "conv_idx")
    s = F.lit(seed)

    # clipped lognormal length in [2, 200]: Box-Muller from two hash-uniforms
    u1 = _u01(s, F.lit("len1"), "conv_idx")
    u2 = _u01(s, F.lit("len2"), "conv_idx")
    z = F.sqrt(-2.0 * F.log(u1 + F.lit(1e-12))) * F.cos(F.lit(6.283185307179586) * u2)
    length = F.least(F.lit(200), F.greatest(F.lit(2), F.round(F.exp(F.lit(2.7) + F.lit(0.8) * z)).cast("int")))
    conv = conv.withColumn("conv_len", length)

    t = conv.select(
        "conv_idx",
        F.explode(F.sequence(F.lit(0), F.col("conv_len") - 1)).alias("turn_idx"),
    )
    t = t.withColumn("conv_id", F.format_string("conv%08d", F.col("conv_idx")))
    t = t.withColumn("turn_idx", F.col("turn_idx").cast("int"))

    # roles: alternate user/assistant; ~12% of assistant turns are tool calls
    is_tool_turn = (F.pmod(F.xxhash64(s, F.lit("tool?"), "conv_idx", "turn_idx"), F.lit(8)) == 0) & (
        F.col("turn_idx") % 2 == 1
    )
    t = t.withColumn(
        "role",
        F.when(is_tool_turn, F.lit("tool")).when(F.col("turn_idx") % 2 == 0, F.lit("user")).otherwise(
            F.lit("assistant")
        ),
    )

    # Zipf-ish tool pick: P(idx=k) ∝ 2^-k over TOOL_VOCAB (hub skew by design)
    hv = F.pmod(F.xxhash64(s, F.lit("which"), "conv_idx", "turn_idx"), F.lit(255)) + 1
    zipf_idx = F.least(F.lit(len(TOOL_VOCAB) - 1), F.floor(F.log2(F.lit(256) / hv.cast("double"))).cast("int"))
    vocab = F.array(*[F.lit(w) for w in TOOL_VOCAB])
    t = t.withColumn("tool", F.when(is_tool_turn, F.element_at(vocab, zipf_idx + 1)).otherwise(F.lit(None)))

    # text: 5–44 tokens, each a hash-pick from TEXT_VOCAB — reconstructible
    # deterministically from (conv_id, turn_idx), which is what the per-turn
    # text-equality invariant (input_hint) checks end to end.
    n_tok = (F.pmod(F.xxhash64(s, F.lit("ntok"), "conv_idx", "turn_idx"), F.lit(40)) + 5).cast("int")
    words = F.array(*[F.lit(w) for w in TEXT_VOCAB])
    toks = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda i: F.element_at(words, (F.pmod(F.xxhash64(s, F.lit("tok"), F.col("conv_idx"), F.col("turn_idx"), i), F.lit(len(TEXT_VOCAB))) + 1).cast("int")),
    )
    t = t.withColumn("text", F.array_join(toks, " "))

    t = t.withColumn(
        "ts",
        F.timestamp_seconds(F.lit(1700000000) + F.col("conv_idx") * 3600 + F.col("turn_idx") * 30),
    )
    return t.select("conv_id", "turn_idx", "role", "text", "tool", "ts")

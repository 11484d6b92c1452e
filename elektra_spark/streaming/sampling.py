"""Streaming stratified quota sampling — a min-k winner state per stratum.

The streaming expression of :func:`elektra_spark.text.sampling.
stratified_quota_sample`: maintain, per stratum, the ``quota`` documents
with the smallest ``(md5-prefix, key)`` as a custom stateful operator
(``applyInPandasWithState`` — Arrow-batched per-group state, the Spark
surface for stateful logic that built-in aggregations can't express).

Like the streaming dedup state table (streaming/dedup.py), correctness
rides on a lattice argument: "k smallest elements" is a commutative,
associative, idempotent merge, so the final state is identical however the
input is split into micro-batches, and a restarted query replaying its
last in-flight batch (at-least-once ``foreachBatch`` delivery) converges
to the same winners — exactly-once *effective* semantics. The batch
operator is therefore the oracle: drained winners ≡
``stratified_quota_sample`` over the union of all batches.

Division of labor, pinned for scale:

- the md5 prefix is computed **JVM-side before the stateful operator**
  (same codegen'd expression as the batch sampler) — the Python side never
  hashes;
- the per-group state is at most ``quota`` (hash, key) pairs, so state
  size is strata × quota regardless of stream volume;
- each emission tags rows with ``seen`` (cumulative group row count) so a
  bounded drain can pick each stratum's latest snapshot without relying on
  batch ids; ``seen`` is also batch-split-independent.

At 100 TB/day: one shuffle per micro-batch on the stratum column; hub
strata cost Arrow transfer of their batch rows but bounded state. For
very hot strata, pre-reduce with the batch sampler inside ``foreachBatch``
before the stateful merge (min-k of min-k is min-k).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT_SCHEMA = "strata string, key long, h string, seen long"
_STATE_SCHEMA = "seen long, hs array<string>, ks array<long>"


def _merge_winners(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState, quota: int):
    seen, hs, ks = (state.get if state.exists else (0, [], []))
    pairs = list(zip(hs, ks))
    for pdf in pdf_iter:
        seen += len(pdf)
        pairs.extend(zip(pdf["h"], pdf["k"]))
    pairs = sorted(set((str(h), int(k)) for h, k in pairs))[:quota]
    state.update((seen, [h for h, _ in pairs], [k for _, k in pairs]))
    yield pd.DataFrame(
        {
            "strata": [key[0]] * len(pairs),
            "key": [k for _, k in pairs],
            "h": [h for h, _ in pairs],
            "seen": [seen] * len(pairs),
        }
    )


def streaming_quota_sample(stream: DataFrame, strata_col: str, quota: int, key_col: str) -> DataFrame:
    """→ streaming (strata, key, h, seen): each micro-batch re-emits every
    touched stratum's current winner set, tagged with the cumulative row
    count. ``strata_col`` must be string-typed and ``key_col`` long-typed
    (the state schema is fixed)."""
    from elektra_spark.text.sampling import _hash_prefix

    keyed = stream.select(
        F.col(strata_col).alias("strata"),
        F.col(key_col).cast("long").alias("k"),
        _hash_prefix(F.col(key_col)).alias("h"),
    )
    return keyed.groupBy("strata").applyInPandasWithState(
        lambda key, it, state: _merge_winners(key, it, state, quota),
        _OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def drain_quota_winners(winners: DataFrame, checkpoint_dir: str) -> list:
    """Drain a bounded stream with ``Trigger.AvailableNow`` and return each
    stratum's LATEST winner snapshot (max ``seen``) as (strata, key) rows."""
    # keep only each stratum's max-`seen` snapshot as batches drain, so the
    # driver holds strata × quota rows regardless of micro-batch count
    latest: dict = {}

    def _absorb(batch_df: DataFrame, batch_id: int) -> None:
        for r in batch_df.collect():
            cur = latest.get(r["strata"])
            if cur is None or r["seen"] > cur[0]:
                latest[r["strata"]] = (r["seen"], {(r["strata"], r["key"])})
            elif r["seen"] == cur[0]:
                cur[1].add((r["strata"], r["key"]))

    q = (
        winners.writeStream.foreachBatch(_absorb)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = []
    for _, (_, rows) in sorted(latest.items()):
        out.extend(sorted(rows))
    return out


# ---------------------------------------------------------------- A-ES stream

_AES_OUTPUT_SCHEMA = "part string, key long, sk double, seen long"
_AES_STATE_SCHEMA = "seen long, sks array<double>, ks array<long>"


def _merge_aes_winners(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState, k: int):
    seen, sks, ks = (state.get if state.exists else (0, [], []))
    pairs = list(zip(sks, ks))
    for pdf in pdf_iter:
        seen += len(pdf)
        pairs.extend(zip(pdf["sk"], pdf["k"]))
    # top-k by (sel_key DESC, key ASC) — a max-k lattice: commutative,
    # associative, idempotent, so the final state is micro-batch-split
    # independent (same argument as the min-k quota state above)
    pairs = sorted(set((float(s), int(kk)) for s, kk in pairs), key=lambda p: (-p[0], p[1]))[:k]
    state.update((seen, [s for s, _ in pairs], [kk for _, kk in pairs]))
    yield pd.DataFrame(
        {
            "part": [key[0]] * len(pairs),
            "key": [kk for _, kk in pairs],
            "sk": [s for s, _ in pairs],
            "seen": [seen] * len(pairs),
        }
    )


def streaming_weighted_sample(stream: DataFrame, k: int, weight_col, key_col: str) -> DataFrame:
    """Streaming Efraimidis–Spirakis weighted sampling — the streaming
    expression of :func:`elektra_spark.text.sampling.weighted_sample_topk`:
    hold the k rows maximizing the md5 exponential-race key ``ln(u)/w`` as a
    max-k lattice state. The race key is computed JVM-side (the identical
    codegen'd expression as the batch sampler); rows with non-positive
    weight are dropped before the state, matching the batch contract.

    One state group here (k entries total); at volume, shard the group key
    by a hash of ``key_col`` and merge shard winners at drain — top-k of
    shard top-ks is top-k, the same pre-reduce the quota sampler documents.
    """
    from elektra_spark.text.sampling import AES_U_DENOM

    u_int = F.conv(
        F.substring(F.md5(F.concat(F.lit("aes:"), F.col(key_col).cast("string"))), 1, 12), 16, 10
    ).cast("long")
    u = (u_int + F.lit(1)).cast("double") / F.lit(AES_U_DENOM)
    w = weight_col.cast("double")
    keyed = (
        stream.select(
            F.lit("all").alias("part"),
            F.col(key_col).cast("long").alias("k"),
            F.round(F.log(u) / w, 9).alias("sk"),
            w.alias("w"),
        )
        .filter(F.col("w") > 0)
        .drop("w")
    )
    return keyed.groupBy("part").applyInPandasWithState(
        lambda key, it, state: _merge_aes_winners(key, it, state, k),
        _AES_OUTPUT_SCHEMA,
        _AES_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def drain_aes_winners(winners: DataFrame, checkpoint_dir: str) -> list:
    """Drain with ``Trigger.AvailableNow``; return the final (key, sel_key)
    winner list of the latest snapshot, ordered (sel_key DESC, key)."""
    latest: dict = {}

    def _absorb(batch_df: DataFrame, batch_id: int) -> None:
        for r in batch_df.collect():
            cur = latest.get(r["part"])
            if cur is None or r["seen"] > cur[0]:
                latest[r["part"]] = (r["seen"], {(r["key"], r["sk"])})
            elif r["seen"] == cur[0]:
                cur[1].add((r["key"], r["sk"]))

    q = (
        winners.writeStream.foreachBatch(_absorb)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = []
    for _, (_, rows) in sorted(latest.items()):
        out.extend(sorted(rows, key=lambda p: (-p[1], p[0])))
    return out

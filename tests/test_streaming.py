"""Structured Streaming surfaces.

1. Streaming batch-dynamic connectivity: every micro-batch is one
   ``BatchAddEdges``/``BatchDeleteEdges`` update applied through
   ``DynamicGraph`` inside ``foreachBatch`` — the streaming expression of the
   reference's update sequence (dynamic_connectivity.h:44-110,169-377; the
   mixed benchmark's random batches, benchmarks/benchmark.h:50-89). Checked
   against the batch API applied to the same updates, the CC oracle, and
   CheckRep; restart-resume goes through the streaming checkpoint, and
   replays are idempotent via the MERGE catalog.
2. Watermarked session windows (streaming/sessions.py): drained streaming
   result must equal the identical batch aggregation; half-open-interval gap
   semantics pinned exactly.
"""

import os
import time

import pytest

from elektra_spark.dynamic.updates import DynamicGraph
from elektra_spark.ingest.graph_io import edges_from_pairs
from elektra_spark.streaming.sessions import drain_to_rows, event_sessions
from elektra_spark.streaming.updates import (
    UPDATE_SCHEMA,
    apply_edge_stream,
    read_update_files,
    write_update_file,
)
from elektra_spark.tables import SnapshotCatalog

from .oracles import cc_oracle

BASE = [(0, 1), (1, 2), (3, 4), (5, 6), (7, 8), (8, 9)]
BATCH1 = [("insert", 2, 3), ("insert", 4, 5)]  # chain 0..6 together
BATCH2 = [("delete", 1, 2), ("insert", 6, 7), ("delete", 8, 9)]


def _final_pairs():
    pairs = list(BASE)
    for op, u, v in BATCH1 + BATCH2:
        if op == "insert":
            pairs.append((u, v))
        else:
            pairs.remove((u, v))
    return pairs


def _labels(g):
    return {r["vid"]: r["component"] for r in g.labels().collect()}


def _write_update_file(spark, dirpath, rows, name):
    # one parquet file per micro-batch; mtime staggers the file-source order
    return write_update_file(
        spark.createDataFrame(rows, UPDATE_SCHEMA), dirpath, name + ".parquet"
    )


def test_stream_updates_match_batch_and_oracle(spark, tmp_path):
    src_dir = str(tmp_path / "updates")
    os.makedirs(src_dir)
    f1 = _write_update_file(spark, src_dir, BATCH1, "b0")
    f2 = _write_update_file(spark, src_dir, BATCH2, "b1")
    os.utime(f1, (time.time() - 120, time.time() - 120))

    g = DynamicGraph.create(
        SnapshotCatalog(spark, str(tmp_path / "wh_stream")),
        edges_from_pairs(spark, BASE),
        check_rep=True,
    )
    seen = []
    q = apply_edge_stream(
        read_update_files(spark, src_dir),
        g,
        str(tmp_path / "ckpt"),
        on_batch=lambda bid, ni, nd: seen.append((bid, ni, nd)),
    )
    q.awaitTermination()

    # one micro-batch per file, insert/delete split as authored
    assert seen == [(0, 2, 0), (1, 1, 2)]
    final = _final_pairs()
    assert _labels(g) == cc_oracle(final, vids=range(10))

    # batch API over the same updates ⇒ identical labels
    gb = DynamicGraph.create(
        SnapshotCatalog(spark, str(tmp_path / "wh_batch")),
        edges_from_pairs(spark, BASE),
    )
    for batch in (BATCH1, BATCH2):
        ins = [(u, v) for op, u, v in batch if op == "insert"]
        dels = [(u, v) for op, u, v in batch if op == "delete"]
        if ins:
            gb.batch_add_edges(spark.createDataFrame(ins, "src long, dst long"))
        if dels:
            gb.batch_delete_edges(spark.createDataFrame(dels, "src long, dst long"))
    assert _labels(g) == _labels(gb)


def test_stream_updates_resume_and_replay(spark, tmp_path):
    """Offsets live in the streaming checkpoint: a restarted query picks up
    the not-yet-processed file only; wiping the checkpoint and replaying
    everything is harmless (MERGE idempotency)."""
    src_dir = str(tmp_path / "updates")
    os.makedirs(src_dir)
    _write_update_file(spark, src_dir, BATCH1, "b0")

    g = DynamicGraph.create(
        SnapshotCatalog(spark, str(tmp_path / "wh")),
        edges_from_pairs(spark, BASE),
    )
    ckpt = str(tmp_path / "ckpt")
    apply_edge_stream(read_update_files(spark, src_dir), g, ckpt).awaitTermination()
    mid = list(BASE) + [(u, v) for _, u, v in BATCH1]
    assert _labels(g) == cc_oracle(mid, vids=range(10))

    # second file arrives; same checkpoint ⇒ only the new file is processed
    _write_update_file(spark, src_dir, BATCH2, "b1")
    seen = []
    apply_edge_stream(
        read_update_files(spark, src_dir),
        g,
        ckpt,
        on_batch=lambda bid, ni, nd: seen.append((ni, nd)),
    ).awaitTermination()
    assert seen == [(1, 2)]
    final_labels = _labels(g)
    assert final_labels == cc_oracle(_final_pairs(), vids=range(10))

    # full replay from scratch (lost checkpoint) converges to the same state
    apply_edge_stream(
        read_update_files(spark, src_dir), g, str(tmp_path / "ckpt2")
    ).awaitTermination()
    assert _labels(g) == final_labels


EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _mk_events(spark, rows):
    from datetime import datetime, timedelta

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    return spark.createDataFrame(
        [
            (i, t0 + timedelta(seconds=off), uid, val)
            for i, (uid, off, val) in enumerate(rows)
        ],
        EVENTS_SCHEMA,
    )


def test_session_window_gap_semantics(spark, tmp_path):
    """Boundary pin: gap == 1800s still merges (split only when strictly
    greater) — the same rule as the batch lag surface's ``> 1800``."""
    df = _mk_events(
        spark,
        [(1, 0, 1.0), (1, 1800, 1.0), (2, 0, 1.0), (2, 1801, 1.0)],
    )
    got = {
        (r["user_id"], r["n_events"])
        for r in event_sessions(df, gap_seconds=1800).collect()
    }
    assert got == {(1, 2), (2, 1)}


def test_streaming_sessions_match_batch(spark, tmp_path):
    rows = []
    for uid in range(4):
        off = uid * 7
        for s in range(3):  # three sessions per user
            for j in range(4):  # four events per session
                rows.append((uid, off, float(uid + j) / 3.0))
                off += 600  # 10 min within-session gap
            off += 3600  # 1h between sessions
    df = _mk_events(spark, rows)
    events_dir = str(tmp_path / "events")
    df.coalesce(1).write.parquet(events_dir)

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    streamed = drain_to_rows(
        event_sessions(stream), checkpoint_dir=str(tmp_path / "ckpt")
    )
    batch = event_sessions(df).collect()
    key = lambda r: (r["user_id"], r["session_start"])  # noqa: E731
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
    assert len(streamed) == 12


def test_streaming_dedup_order_independent_and_replay_safe(spark, tmp_path):
    """The winner state table must equal the batch grouped min under any
    micro-batch split, and re-MERGEing a batch (at-least-once foreachBatch
    delivery) must not change it (min is idempotent)."""
    from pyspark.sql import functions as F

    from elektra_spark.streaming.dedup import apply_document_stream, dedup_assignments
    from elektra_spark.tables import SnapshotCatalog

    rows = [(i, f"text-{i % 7}") for i in range(40)]  # 7 dup groups
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    expect = {
        r["doc_id"]: r["rep"]
        for r in docs.withColumn("rep", F.min("doc_id").over(__import__("pyspark").sql.Window.partitionBy("text")))
        .select("doc_id", "rep")
        .collect()
    }

    for split, tag in [(3, "a"), (5, "b")]:  # two different batch splits
        drop = tmp_path / f"drops_{tag}"
        drop.mkdir()
        for i in range(split):
            docs.filter(F.col("doc_id") % split == i).coalesce(1).write.mode("overwrite").parquet(
                str(tmp_path / f"stage_{tag}{i}")
            )
            import glob
            import shutil

            [pf] = glob.glob(str(tmp_path / f"stage_{tag}{i}" / "part-*.parquet"))
            dest = str(drop / f"d{i}.parquet")
            shutil.move(pf, dest)
            t = time.time() - 600 + i * 60
            os.utime(dest, (t, t))
        catalog = SnapshotCatalog(spark, str(tmp_path / f"wh_{tag}"))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(drop))
        )
        apply_document_stream(
            stream, catalog, str(tmp_path / f"ckpt_{tag}"), key=F.col("text")
        ).awaitTermination()
        got = {r["doc_id"]: r["rep"] for r in dedup_assignments(docs, catalog, key=F.col("text")).collect()}
        assert got == expect, f"split {split}"
        # replay one batch: state must be unchanged (idempotent MERGE)
        v0 = catalog.current_version("dedup_state")
        replay = docs.filter(F.col("doc_id") % split == 0).groupBy(F.col("text").alias("k")).agg(
            F.min("doc_id").alias("rep")
        )
        catalog.merge_min("dedup_state", replay, keys=["k"])
        assert catalog.current_version("dedup_state") == v0 + 1
        after = {r["k"]: r["rep"] for r in catalog.read("dedup_state").collect()}
        before = {r["k"]: r["rep"] for r in catalog.read("dedup_state", version=v0).collect()}
        assert after == before


def test_streaming_quota_sample_matches_batch_and_split_independent(spark, tmp_path):
    """applyInPandasWithState min-k winner state: the drained winners must
    equal the batch stratified_quota_sample over the union of all
    micro-batches, for EVERY batch split (min-k is a lattice merge)."""
    from elektra_spark.streaming.sampling import drain_quota_winners, streaming_quota_sample
    from elektra_spark.text.sampling import stratified_quota_sample

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(120)] + [(900, "rare")]
    batch = spark.createDataFrame(rows, "doc_id long, lang string")
    want = sorted(
        (r["lang"], r["doc_id"]) for r in stratified_quota_sample(batch, "lang", 9, "doc_id").collect()
    )

    results = []
    for tag, n_files in (("one", 1), ("four", 4)):
        src = tmp_path / f"src_{tag}"
        batch.repartition(n_files).write.parquet(str(src))
        stream = (
            spark.readStream.schema("doc_id long, lang string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        winners = streaming_quota_sample(stream, "lang", 9, "doc_id")
        got = drain_quota_winners(winners, str(tmp_path / f"ckpt_{tag}"))
        results.append(sorted((s, k) for s, k in got))
    assert results[0] == want
    assert results[1] == want  # split-independent final state


def test_streaming_cms_additive_and_replay_safe(spark, tmp_path):
    """Per-batch partial sketches accumulated through the insert-only MERGE
    equal the single-shot batch sketch, independently of how the corpus is
    split; re-committing a batch under its batch_id (Structured Streaming's
    at-least-once replay) is a no-op instead of a double-count."""
    from pyspark.sql import functions as F

    from elektra_spark.streaming.cms import sketch_from_state
    from elektra_spark.tables import SnapshotCatalog
    from elektra_spark.text.cms import partial_sketch

    rows = [(i, " ".join(f"t{(i + j) % 9}" for j in range(6))) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = sorted(
        (r["i"], r["b"], r["c"]) for r in partial_sketch(docs, width=8).collect()
    )

    catalog = SnapshotCatalog(spark, str(tmp_path / "wh"))
    for split in (2, 3):  # both splits must land on the same accumulated sketch
        table = f"cms_{split}"
        for bid in range(split):
            part = partial_sketch(
                docs.filter(F.col("doc_id") % split == bid), width=8
            ).withColumn("batch_id", F.lit(bid).cast("long"))
            if catalog.exists(table):
                catalog.merge_insert(table, part, keys=["batch_id", "i", "b"])
            else:
                catalog.write(table, part, operation="create")
        # replay the LAST batch verbatim — must not change the state
        catalog.merge_insert(
            table,
            partial_sketch(
                docs.filter(F.col("doc_id") % split == split - 1), width=8
            ).withColumn("batch_id", F.lit(split - 1).cast("long")),
            keys=["batch_id", "i", "b"],
        )
        got = sorted(
            (r["i"], r["b"], r["c"])
            for r in sketch_from_state(catalog, table).collect()
        )
        assert got == want, split


def test_streaming_weighted_sample_matches_batch_and_split_independent(spark, tmp_path):
    """applyInPandasWithState max-k race state: the drained winners must
    equal the batch weighted_sample_topk over the union of all
    micro-batches, for EVERY batch split (top-k is a lattice merge)."""
    from pyspark.sql import functions as sf

    from elektra_spark.streaming.sampling import drain_aes_winners, streaming_weighted_sample
    from elektra_spark.text.sampling import weighted_sample_topk

    rows = [(i, (i % 9) + 1) for i in range(150)]
    batch = spark.createDataFrame(rows, "doc_id long, w long")
    want = sorted(
        (r["doc_id"], r["sel_key"])
        for r in weighted_sample_topk(batch, k=12, weight_col=sf.col("w")).collect()
    )

    for tag, n_files in (("one", 1), ("five", 5)):
        src = tmp_path / f"aes_src_{tag}"
        batch.repartition(n_files).write.parquet(str(src))
        stream = (
            spark.readStream.schema("doc_id long, w long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        winners = streaming_weighted_sample(stream, k=12, weight_col=sf.col("w"), key_col="doc_id")
        got = drain_aes_winners(winners, str(tmp_path / f"aes_ckpt_{tag}"))
        assert sorted(got) == want, tag


def test_streaming_ivm_split_independent_and_replay_safe(spark, tmp_path):
    """Delta-stream view maintenance: final view equals batch IVM for every
    file split, and re-applying an already-ledgered batch is a no-op."""
    from pyspark.sql import functions as sf

    from elektra_spark.ivm import apply_delta, apply_delta_stream, delta_rows, sum_agg
    from elektra_spark.tables import SnapshotCatalog

    rows = [(i, "g%d" % (i % 3), (i * 7) % 50 + 1) for i in range(120)]
    base = spark.createDataFrame(rows, "id long, g string, v long")
    keys, meas = ["g"], {"sum_v": sf.col("v")}
    dels = delta_rows(base.filter("id % 4 = 0"), keys, meas, sign=-1)
    adds = delta_rows(base.filter("id % 9 = 0").withColumn("g", sf.lit("gX")), keys, meas, sign=1)

    # batch reference
    cat0 = SnapshotCatalog(spark, str(tmp_path / "ref"))
    cat0.write("view", sum_agg(base, keys, meas))
    apply_delta(cat0, "view", dels, keys)
    want = sorted(
        (r.g, r.n_rows, r.sum_v) for r in apply_delta(cat0, "view", adds, keys).collect()
    )

    for tag, n_files in (("one", 1), ("three", 3)):
        cat = SnapshotCatalog(spark, str(tmp_path / f"wh_{tag}"))
        cat.write("view", sum_agg(base, keys, meas))
        src = tmp_path / f"src_{tag}"
        dels.repartition(1).write.parquet(str(src / "d0"))
        adds.repartition(max(1, n_files - 1)).write.parquet(str(src / "d1"))
        stream = (
            spark.readStream.schema("g string, n_rows long, sum_v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = apply_delta_stream(cat, "view", stream, keys, str(tmp_path / f"ck_{tag}"))
        q.awaitTermination()
        got = sorted((r.g, r.n_rows, r.sum_v) for r in cat.read("view").collect())
        assert got == want, tag
        # replay safety: re-running the drained stream applies nothing new
        v_before = cat.current_version("view")
        q2 = apply_delta_stream(cat, "view", stream, keys, str(tmp_path / f"ck_{tag}"))
        q2.awaitTermination()
        assert cat.current_version("view") == v_before

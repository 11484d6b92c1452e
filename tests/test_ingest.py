"""Transcript synthesis determinism + edge derivation invariants
(BASELINE.json input_hint: per-turn text equality under stable ordering)."""

from pyspark.sql import functions as F

from elektra_spark.ingest.edges import derive_graph, reconstruct_transcript_text
from elektra_spark.ingest.transcripts import synth_transcripts


def test_transcripts_schema_and_determinism(spark):
    t1 = synth_transcripts(spark, n_conversations=20, seed=42)
    assert [f.name for f in t1.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert dict((f.name, f.dataType.simpleString()) for f in t1.schema.fields) == {
        "conv_id": "string", "turn_idx": "int", "role": "string",
        "text": "string", "tool": "string", "ts": "timestamp",
    }
    # identical bytes at different parallelism (pure column functions)
    t2 = synth_transcripts(spark, n_conversations=20, seed=42, partitions=7)
    rows1 = sorted(map(tuple, t1.collect()))
    rows2 = sorted(map(tuple, t2.collect()))
    assert rows1 == rows2
    lens = t1.groupBy("conv_id").count().collect()
    assert all(2 <= r["count"] <= 200 for r in lens)


def test_fixture_matches_fresh_synthesis(spark):
    """The committed fixture parquet (fixtures/, tools/make_fixtures.py) must
    equal a fresh synthesis byte-for-byte — the DuckDB oracle twins for the
    transcript family read the fixture, so drift here would silently decouple
    engine from oracle."""
    import os

    for n in (50, 300):
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "fixtures", f"transcripts_n{n}_s42.parquet")
        if not os.path.exists(path):
            import pytest

            pytest.skip("fixtures not generated (run tools/make_fixtures.py)")
        fixture = sorted(map(tuple, spark.read.parquet(path).collect()))
        fresh = sorted(map(tuple, synth_transcripts(spark, n_conversations=n, seed=42).collect()))
        assert fixture == fresh, f"fixture n={n} drifted from synth_transcripts"


def test_edge_derivation_invariants(spark):
    t = synth_transcripts(spark, n_conversations=25, seed=42)
    g = derive_graph(t)

    edges = g.edges.collect()
    # canonical src < dst, deduped, no self loops
    assert all(r["src"] < r["dst"] for r in edges)
    assert len(edges) == len({(r["src"], r["dst"]) for r in edges})

    # dense, stable turn vids: count = n_turns, 0..n-1
    turn_v = g.vertices.filter(F.col("kind") == "turn")
    n = t.count()
    assert g.n_turn_vertices == n
    assert turn_v.count() == n
    mm = turn_v.agg(F.min("vid"), F.max("vid"), F.countDistinct("vid")).collect()[0]
    assert (mm[0], mm[1], mm[2]) == (0, n - 1, n)

    # reply edges: each conversation of length L contributes exactly L-1 edges
    n_reply = t.groupBy("conv_id").count().agg(F.sum(F.col("count") - 1)).collect()[0][0]
    n_tool_turns = t.filter(F.col("tool").isNotNull()).count()
    assert len(edges) == n_reply + n_tool_turns  # tool edges unique per (turn, tool)


def test_per_turn_text_equality_roundtrip(spark):
    """input_hint invariant: reconstructing per-turn text from the vertex map
    under stable (conv_id, turn_idx) ordering equals the source exactly."""
    t = synth_transcripts(spark, n_conversations=15, seed=42)
    g = derive_graph(t)
    recon = reconstruct_transcript_text(g.vertices, t)
    src = sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in t.collect())
    got = sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in recon.collect())
    assert src == got
    # vid order agrees with (conv_id, turn_idx) order (stable ordering)
    by_vid = [(r["conv_id"], r["turn_idx"]) for r in recon.orderBy("vid").collect()]
    assert by_vid == sorted(by_vid)


def test_turn_gap_profile_and_tool_sequences(spark):
    """convstats vs hand-computed values on an explicit 2-conversation table."""
    import datetime as dt

    from elektra_spark.operators.convstats import tool_sequences, turn_gap_profile

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("a", 0, "user", "x", None, t0),
        ("a", 1, "assistant", "y", "search", t0 + dt.timedelta(seconds=10)),
        ("a", 2, "tool", "z", "browse", t0 + dt.timedelta(seconds=40)),
        ("b", 0, "user", "solo", None, t0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    gaps = {r["conv_id"]: r for r in turn_gap_profile(df).collect()}
    assert gaps["a"]["n_turns"] == 3 and gaps["a"]["n_tool_turns"] == 2
    assert gaps["a"]["mean_gap_s"] == 20.0 and gaps["a"]["max_gap_s"] == 30
    assert gaps["b"]["n_turns"] == 1 and gaps["b"]["mean_gap_s"] == 0.0 and gaps["b"]["max_gap_s"] == 0

    seqs = {r["seq"]: r["n_convs"] for r in tool_sequences(df).collect()}
    assert seqs == {"search>browse": 1}  # conv b (no tools) excluded


def test_rmat_generator_properties(spark):
    """Deterministic, partition-invariant, skewed toward low ids (a=0.57),
    ids bounded by 2^scale."""
    import hashlib

    from pyspark.sql import functions as F

    from elektra_spark.ingest.rmat import rmat_edges

    e = rmat_edges(spark, n_edges=500, scale=8).orderBy("edge_id").collect()
    assert len(e) == 500
    assert all(0 <= r.src < 256 and 0 <= r.dst < 256 for r in e)

    # python replay of edge 7
    src = dst = 0
    for level in range(8):
        r = int(hashlib.md5(f"rmat:42:7:{level}".encode()).hexdigest()[:12], 16) % 1000
        src = src * 2 + (0 if r < 760 else 1)
        dst = dst * 2 + (0 if r < 570 else 1 if r < 760 else 0 if r < 950 else 1)
    assert (e[7].src, e[7].dst) == (src, dst)

    # skew: the low-id half holds well over half the edges
    low = sum(1 for r in e if r.src < 128)
    assert low > 300

    # partition invariance
    e2 = rmat_edges(spark, n_edges=500, scale=8).repartition(13).orderBy("edge_id").collect()
    assert [(r.src, r.dst) for r in e2] == [(r.src, r.dst) for r in e]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        rmat_edges(spark, 10, scale=0)
    with _pytest.raises(ValueError):
        rmat_edges(spark, 10, scale=8, a=900, b=200)


def test_tool_funnel_hand_graph(spark):
    """Funnel semantics on a hand transcript: A-then-B counted once per
    conversation; B-before-A-only does not count."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    rows = [
        ("c1", 0, "u", "x", "a", None),
        ("c1", 2, "u", "x", "b", None),
        ("c2", 0, "u", "x", "b", None),
        ("c2", 3, "u", "x", "a", None),
        ("c3", 1, "u", "x", "a", None),
        ("c3", 2, "u", "x", "a", None),
        ("c4", 0, "u", "x", "a", None),
        ("c4", 1, "u", "x", "b", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    import unittest.mock as mock

    with mock.patch.object(em, "_transcripts", lambda spark_, n: df):
        got = {
            (r.tool_a, r.tool_b): (r.n_convs, r.conversion)
            for r in em.q_tool_funnel_transcript(spark, "unused").collect()
        }
    # a→b in c1 and c4; b→a in c2 only. a appears in c1,c2,c3,c4 (4), b in c1,c2,c4 (3)
    assert got == {("a", "b"): (2, round(2 / 4, 6)), ("b", "a"): (1, round(1 / 3, 6))}


def test_tool_entropy_known_distributions(spark):
    """H=0 for single-tool, H=1 for a 50/50 two-tool conversation."""
    import math
    import unittest.mock as mock

    import __spark_entry__ as em

    rows = (
        [("c1", i, "u", "x", "a", None) for i in range(4)]
        + [("c2", 0, "u", "x", "a", None), ("c2", 1, "u", "x", "b", None)]
        + [("c3", i, "u", "x", t, None) for i, t in enumerate(["a", "a", "b", "c"])]
    )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    with mock.patch.object(em, "_transcripts", lambda s_, n: df):
        got = {r.conv_id: (r.n_calls, r.n_tools, r.entropy) for r in em.q_tool_entropy_transcript(spark, "x").collect()}
    assert got["c1"] == (4, 1, 0.0)
    assert got["c2"] == (2, 2, 1.0)
    want = -(0.5 * math.log2(0.5) + 0.25 * math.log2(0.25) * 2)
    assert got["c3"] == (4, 3, round(want, 6))

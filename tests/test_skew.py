"""Salted two-phase aggregation: exact equivalence with direct groupBy on a
deliberately hub-skewed input."""

from pyspark.sql import functions as F

from elektra_spark.operators.skew import salted_count, salted_sum, top_hub_keys


def test_salted_sum_equals_direct(spark):
    # hub key 0 gets 5000 rows, the rest 1 each
    df = spark.range(5000).select(F.lit(0).alias("k"), (F.col("id") % 7).cast("double").alias("v")).union(
        spark.range(1, 200).select(F.col("id").alias("k"), F.lit(1.0).alias("v"))
    )
    direct = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r["k"]: r["s"] for r in salted_sum(df, "k", "v", "s", n_salts=8).collect()}
    assert direct == salted


def test_salted_count_equals_direct(spark):
    df = spark.range(3000).select((F.col("id") % 5).alias("k"))
    direct = {r["k"]: r["c"] for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    salted = {r["k"]: r["c"] for r in salted_count(df, "k", "c", n_salts=4).collect()}
    assert direct == salted


def test_top_hub_keys_finds_tool_hubs(spark):
    from elektra_spark.ingest.edges import derive_graph
    from elektra_spark.ingest.transcripts import synth_transcripts

    t = synth_transcripts(spark, n_conversations=40, seed=42)
    g = derive_graph(t)
    hubs = top_hub_keys(g.edges, k=3).collect()
    tool_vids = {r["vid"] for r in g.vertices.filter(F.col("kind") == "tool").collect()}
    assert {r["vid"] for r in hubs} & tool_vids, "Zipf tool actors must dominate the degree ranking"


def test_skew_split_join_equals_plain_join(spark):
    """The skew-split join must be result-identical to the plain join on a
    Zipf-skewed fixture (one key holds half the left rows), including keys
    absent from the hot set and hot keys absent from the left side."""
    from pyspark.sql import functions as F

    from elektra_spark.operators.skew import skew_split_join

    left = spark.createDataFrame(
        [(0, i) for i in range(500)] + [(k, k * 10) for k in range(1, 50)],
        "vid long, payload long",
    )
    right = spark.createDataFrame(
        [(v, f"attr{v}") for v in range(60)], "vid long, attr string"
    )
    hot = spark.createDataFrame([(0,), (1,), (59,)], "vid long")  # 59 not in left
    got = sorted(
        (r["vid"], r["payload"], r["attr"])
        for r in skew_split_join(left, right, "vid", hot).collect()
    )
    want = sorted(
        (r["vid"], r["payload"], r["attr"]) for r in left.join(right, "vid").collect()
    )
    assert got == want
    assert len(got) == 500 + 49  # hub rows all present exactly once

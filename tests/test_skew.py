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

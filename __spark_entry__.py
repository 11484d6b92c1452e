"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship run on sf0.001: link graph from the star schema
(customers ↔ orders), connected components + PageRank, one joined result.

``queries()`` / ``oracle_sql()`` — one entry per operator family from
SURVEY.md §2 + the training-data pipeline operators. Oracle-checked entries
have DuckDB SQL twins generated, where precision matters, from the *same
Python loop* as the Spark expression (lang-id fold, simhash bits, unrolled
PageRank/LPA supersteps), so engine and oracle agree by construction.
Graph analytics over the synthetic transcript tables are twinned via the
materialized fixture parquet (tools/make_fixtures.py): DuckDB re-derives the
link graph in SQL and solves CC with a pruned recursive CTE, PageRank with
the unrolled-iteration chain.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ORDER_VID_OFFSET = 10_000_000
PR_ITERS = 4
PR_DAMPING = 0.85
LPA_ROUNDS = 2
TRANSCRIPT_PR_ITERS = 10
DYN_PR_ITERS = 6  # warm-start supersteps after the transcript edge update
BFS_MAX_HOPS = 12  # bounded k-hop contract — the DuckDB twin caps identically
HITS_ITERS = 8
SALSA_ITERS = 8
KATZ_ITERS = 6
KATZ_ALPHA = 0.05  # attenuation; fixed-iteration truncated sum needs no spectral bound
SAMPLE_RATE = 0.5  # md5-Bernoulli thinning rate for the corpus-sample contract row
SAMPLE_QUOTA = 30  # per-language quota (binding at sf0.01: ~50 survivors per lang)
CHAR_BUDGET = 10_000  # per-language n_chars budget (binding at sf0.01: lang totals 19.5k-64k)
BETWEENNESS_HOPS = 4  # bounded Brandes contract — the DuckDB twin unrolls identically
EIGEN_ITERS = 8
CHUNK_SIZE = 200  # chunking window (sf0.01 docs run ~100-500 chars → 1-4 chunks each)
CHUNK_STRIDE = 150  # overlapping stride (size - 50 chars of overlap)
PROJ_MAX_BASKET = 5  # projection group guard — binds at sf0.01 (3215 orders dropped)
PROJ_MIN_WEIGHT = 2  # keep pairs co-occurring in ≥ 2 baskets (700 rows at sf0.01)
KCORE_K = 80  # non-trivial peel on the sf0.01 copurchase graph (6 rounds, 1857-vertex core)
KCORE_SQL_ROUNDS = 10  # unrolled oracle rounds; ≥ the instance's peel depth + 1 (the trailing no-op round fixes the reported degrees; see _kcore_sql)
CORENESS_SQL_ROUNDS = 24  # unrolled h-index rounds; sf0.01 copurchase converges in 19 (extras are no-ops at the fixpoint)
PPR_ITERS = 10
LINKPRED_MAX_PIVOT_DEG = 160  # contract hub guard (sf0.01 copurchase degrees run 42–206)
LINKPRED_TOP_K = 100
SSSP_MAX_HOPS = 12  # bounded Bellman–Ford contract — the DuckDB twin caps its recursion identically
TFIDF_K = 3
TRUSS_K = 12  # non-trivial peel on the sf0.01 copurchase graph (5 rounds, 1127-edge truss; supports run 1–32)
TRUSS_SQL_ROUNDS = 8  # unrolled oracle rounds; ≥ the instance's peel depth + 1 (no-ops past the fixpoint)
TRI_SAMPLE_PERMILLE = 200  # DOULION edge-sampling rate p = 0.2 (deterministic hash coin, shared with the twin)
WALK_LEN = 8  # random-walk transitions per seed (DeepWalk-style corpus length)
WALK_SEED_MOD = 97  # walk seeds = vertices with vid % 97 == 0 (~1% of the transcript graph)
MIS_SQL_ROUNDS = 8  # unrolled Luby rounds; ≥ the contract instance's depth (pinned by pytest; extras are no-ops once undecided is empty)
MATCHING_SQL_ROUNDS = 4  # unrolled locally-minimal-edge rounds; the transcript instance empties alive at round 3 (pinned by pytest; the spare round is a no-op)
COLORING_SQL_ROUNDS = 9  # unrolled Jones–Plassmann rounds; the transcript instance colors out at round 8 (pinned by pytest; the spare round is a no-op)
MSF_SQL_ROUNDS = 5  # unrolled Boruvka rounds; exact CC relabel per round ≥ halves components, and the transcript instance's pseudo-forest collapse finishes at round 4 (pinned by pytest; round 5 is the first no-op)
TEMPORAL_HOPS = 8  # earliest-arrival relaxation rounds — part of the operator contract (min over ≤ 8-edge temporal paths), capped identically by the unrolled twin
TEMPORAL_SEED_MOD = 89  # temporal seeds = vids ≡ 0 (mod 89), ~1% of the transcript graph
PSEUDO_DIAM_HOPS = 20  # double-sweep BFS bound — generous vs the copurchase graph's small-world eccentricity (~6)
ANF_HOPS = 4  # HyperBall contract depth; the sf0.01 copurchase registers reach fixpoint at hop 4 (diameter 3 + 1 no-op hop, pinned by pytest)
ANF_REGISTERS = 64  # HLL registers per vertex (m=64 → ~13% standard error; pytest bounds the observed error vs exact balls)
PASSAGE_TOKENS = 16  # aligned dedup-window width; sf0.01 docs yield 1921 passages, 147 duplicate occurrences in 69 groups — non-vacuous
INFLUENCE_P_PERMILLE = 650  # IC arc-activation probability (0.65 — cascade uses the full round horizon on the n=300 flow digraph)
INFLUENCE_ROUNDS = 8  # cascade horizon, part of the operator contract (twin caps identically)
INFLUENCE_SEED_MOD = 101  # IC seeds = vids ≡ 0 (mod 101), ~1% of the flow digraph
BOILER_LINE_TOKENS = 12  # body-line width for the boilerplate-strip contract row
BOILER_MIN_DOCS = 3  # CCNet threshold: a line in ≥ 3 distinct docs is boilerplate (binds on the 25-doc-per-source headers at sf0.01)

_HERE = os.path.dirname(os.path.abspath(__file__))


def _transcript_fixture(n_conversations: int) -> str:
    """Path of the materialized transcript fixture (tools/make_fixtures.py).

    The fixture is byte-identical to ``synth_transcripts(spark, n, seed=42)``
    (asserted by tests/test_ingest.py); materializing it lets the DuckDB
    oracle read the same table via read_parquet and gives the transcript
    family hard SQL twins.
    """
    return os.path.join(_HERE, "fixtures", f"transcripts_n{n_conversations}_s42.parquet")


def _transcripts(spark: SparkSession, n_conversations: int) -> DataFrame:
    path = _transcript_fixture(n_conversations)
    if os.path.exists(path):
        return spark.read.parquet(path)
    from elektra_spark.ingest.transcripts import synth_transcripts

    return synth_transcripts(spark, n_conversations=n_conversations, seed=42)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- link graphs
def _customer_order_graph(spark, sf_dir):
    """Bipartite link graph: customer vid = c_custkey, order vid = OFFSET +
    o_orderkey. The canonical small-dim/big-fact shape: at 100 TB the
    customer side broadcasts."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    edges = orders.join(F.broadcast(customer.select("c_custkey")), orders.o_custkey == F.col("c_custkey")).select(
        F.col("o_custkey").cast("long").alias("src"),
        (F.lit(ORDER_VID_OFFSET) + F.col("o_orderkey")).cast("long").alias("dst"),
    )
    vertices = customer.select(F.col("c_custkey").cast("long").alias("vid")).union(
        orders.select((F.lit(ORDER_VID_OFFSET) + F.col("o_orderkey")).cast("long").alias("vid"))
    )
    return edges, vertices


def _copurchase_graph(spark, sf_dir):
    """Parts co-occurring in an order (distinct, canonical src<dst) — a
    triangle-rich projection of the order–part bipartite graph.

    The projection (self-join + distinct) is the expensive subtree and every
    consumer (degrees, both-directions union, wedge joins, anti-joins)
    references it several times; a lazy ``localCheckpoint`` materializes it
    once per query instead of re-running the self-join per reference
    (optimization guide §2.4/§5 — the link-predict plan carried 28 parquet
    scans of lineitem before this). Lazy, so nothing runs at build time and
    nothing is shared across queries."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.withColumnRenamed("l_partkey", "pa")
    b = li.withColumnRenamed("l_partkey", "pb")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") != F.col("pb"))
        .select(F.least("pa", "pb").cast("long").alias("src"), F.greatest("pa", "pb").cast("long").alias("dst"))
    )
    bounds = li.agg(F.min("l_partkey"), F.max("l_partkey")).collect()[0]
    if bounds[0] is not None and int(bounds[0]) >= 0 and int(bounds[1]) < 2**31:
        # distinct on ONE packed long instead of a two-column key (guide
        # §2.3 narrower types) — same pair set, cheaper hash/compare
        pairs = (
            pairs.select((F.shiftleft(F.col("src"), 32) + F.col("dst")).alias("k"))
            .distinct()
            .select(
                F.shiftright(F.col("k"), 32).alias("src"),
                F.col("k").bitwiseAND(F.lit((1 << 32) - 1)).alias("dst"),
            )
        )
    else:
        pairs = pairs.dropDuplicates(["src", "dst"])
    return pairs.localCheckpoint(eager=False)


_COPURCHASE_SQL = f"""
  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS src,
                  greatest(a.l_partkey, b.l_partkey) AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
"""


# ------------------------------------------------------------- graph queries
def q_cc_customer_orders(spark, sf_dir):
    from elektra_spark.operators.cc import connected_components

    edges, vertices = _customer_order_graph(spark, sf_dir)
    return connected_components(edges, vertices=vertices)


def q_pagerank_customer_orders(spark, sf_dir):
    from elektra_spark.operators.pagerank import pagerank

    edges, vertices = _customer_order_graph(spark, sf_dir)
    r = pagerank(edges, vertices=vertices, damping=PR_DAMPING, n_iter=PR_ITERS)
    return r.select("vid", F.round("rank", 6).alias("rank"))


def q_lpa_customer_orders(spark, sf_dir):
    from elektra_spark.operators.lpa import label_propagation

    edges, vertices = _customer_order_graph(spark, sf_dir)
    return label_propagation(edges, vertices=vertices, rounds=LPA_ROUNDS)


def q_batch_connected_orders(spark, sf_dir):
    from elektra_spark.operators.cc import batch_connected, connected_components

    edges, vertices = _customer_order_graph(spark, sf_dir)
    labels = connected_components(edges, vertices=vertices)
    orders = _t(spark, sf_dir, "orders")
    queries = orders.select((F.lit(ORDER_VID_OFFSET) + F.col("o_orderkey")).cast("long").alias("u")).filter(
        F.col("u") % 2 == 0
    ).withColumn("v", F.col("u") + 1).join(
        orders.select((F.lit(ORDER_VID_OFFSET) + F.col("o_orderkey")).cast("long").alias("v")), "v", "left_semi"
    )
    return batch_connected(labels, queries)


def q_forest_size_customer_orders(spark, sf_dir):
    from elektra_spark.operators.forest import spanning_forest

    edges, _ = _customer_order_graph(spark, sf_dir)
    return spanning_forest(edges).agg(F.count("*").alias("forest_size"))


def q_cc_doc_lang_chain(spark, sf_dir):
    """CC over per-language doc_id chains — exercises chain collapse; the
    oracle is a window min."""
    from elektra_spark.operators.cc import connected_components

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy("doc_id")
    nxt = docs.withColumn("nxt", F.lead("doc_id").over(w))
    edges = nxt.filter(F.col("nxt").isNotNull()).select(
        F.col("doc_id").alias("src"), F.col("nxt").alias("dst")
    )
    vertices = docs.select(F.col("doc_id").alias("vid"))
    return connected_components(edges, vertices=vertices)


def q_dynamic_orders(spark, sf_dir):
    """Batch-dynamic scenario — the reference's public API end to end
    (``BatchAddEdges``/``BatchDeleteEdges``, elektra
    dynamic_connectivity.h:44-110,169-377), mirroring its insert → delete →
    re-query differential harness
    (test/reference_tests/reference_connectivity.hpp:90-161): build the
    customer-order graph, insert deterministic order-chain edges (components
    merge), delete the original customer-order tree edges of every 13th order
    (components split), emit the final (vid, component) labels. The DuckDB
    twin recomputes CC over the post-update edge set with the pruned
    recursive CTE, so the MERGE + incremental-relabel path is hash-checked."""
    import shutil
    import tempfile

    from elektra_spark.dynamic.updates import DynamicGraph
    from elektra_spark.tables import SnapshotCatalog

    edges, vertices = _customer_order_graph(spark, sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/"))
    wh = os.path.join(tempfile.gettempdir(), f"elektra_dynamic_orders_{tag}")
    shutil.rmtree(wh, ignore_errors=True)
    cat = SnapshotCatalog(spark, wh)
    g = DynamicGraph.create(cat, edges, vertices=vertices)

    adds, dels = _order_update_batches(spark, sf_dir)
    g.batch_add_edges(adds.select("src", "dst"))
    g.batch_delete_edges(dels.select("src", "dst"))
    return g.labels()


def q_time_travel_orders(spark, sf_dir):
    """Snapshot time travel on the state catalog (tables.py ``read(version)``
    + ``history()`` — Iceberg's AS OF semantics on the stand-in): replay the
    exact q_dynamic_orders schedule (insert order chains, then delete
    every-13th-order tree edges), then read the labels table AS OF the
    post-insert/pre-delete snapshot, located by scanning ``history()`` for
    the ``batch_add_edges`` commit (not a hardcoded version number). The
    DuckDB twin recomputes min-vid CC over the pre-delete edge set
    (base ∪ inserts) — a hash match proves the travelled-to snapshot is the
    true post-insert state, untouched by the later delete commit."""
    import shutil
    import tempfile

    from elektra_spark.dynamic.updates import DynamicGraph
    from elektra_spark.tables import SnapshotCatalog

    edges, vertices = _customer_order_graph(spark, sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/"))
    wh = os.path.join(tempfile.gettempdir(), f"elektra_time_travel_{tag}")
    shutil.rmtree(wh, ignore_errors=True)
    cat = SnapshotCatalog(spark, wh)
    g = DynamicGraph.create(cat, edges, vertices=vertices)

    adds, dels = _order_update_batches(spark, sf_dir)
    g.batch_add_edges(adds.select("src", "dst"))
    g.batch_delete_edges(dels.select("src", "dst"))
    post_insert = max(
        s["version"] for s in cat.history(g._t("labels")) if s["operation"] == "batch_add_edges"
    )
    return cat.read(g._t("labels"), version=post_insert)


def q_zorder_blocks_orders(spark, sf_dir):
    """Z-order layout (layout.py — the OPTIMIZE ZORDER BY surface): orders
    range-binned on (o_custkey, o_orderkey), Morton-interleaved, cut into 64
    equal-z blocks; the row reports each block's row count and min/max of
    BOTH dimensions — the data-skipping bounds themselves. All integer-exact
    (bit interleave + power-of-two block cut)."""
    from elektra_spark.layout import zorder_blocks

    return zorder_blocks(_t(spark, sf_dir, "orders"), "o_custkey", "o_orderkey")


def q_ivm_orders_agg(spark, sf_dir):
    """Incremental view maintenance (ivm.py): a per-status (count, revenue)
    view materialized once, then maintained under a delete batch (every
    13th order, sign −1) and an insert batch (every 100th order re-filed
    as status 'P', sign +1) by folding view-shaped deltas — the base table
    is never rescanned after materialization. Prices quantized to exact
    integer cents so delta algebra is exact; the twin recomputes the view
    from the final row set directly, which is precisely the IVM correctness
    statement."""
    from elektra_spark.ivm import apply_delta, delta_rows, sum_agg
    from elektra_spark.tables import SnapshotCatalog
    import shutil
    import tempfile

    orders = _t(spark, sf_dir, "orders")
    cents = {"sum_cents": F.round(F.col("o_totalprice") * 100).cast("long")}
    keys = ["o_orderstatus"]
    tag = os.path.basename(sf_dir.rstrip("/"))
    wh = os.path.join(tempfile.gettempdir(), f"elektra_ivm_{tag}")
    shutil.rmtree(wh, ignore_errors=True)
    cat = SnapshotCatalog(spark, wh)
    cat.write("orders_by_status", sum_agg(orders, keys, cents), operation="materialize")

    deletes = orders.filter(F.col("o_orderkey") % 13 == 0)
    inserts = orders.filter(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_orderstatus", F.lit("P")
    )
    apply_delta(cat, "orders_by_status", delta_rows(deletes, keys, cents, sign=-1), keys)
    return apply_delta(cat, "orders_by_status", delta_rows(inserts, keys, cents, sign=1), keys)


def q_ivm_orders_stream(spark, sf_dir):
    """Streaming IVM (ivm.py apply_delta_stream): the SAME delete/insert
    delta schedule as q_ivm_orders_agg, but delivered as two parquet drops
    consumed by a file-source stream — each micro-batch folds into the
    materialized view exactly once (applied-batch ledger; replays no-op).
    View-shaped deltas are a commutative monoid, so the drained view equals
    the batch IVM result and the recompute twin, however the input splits."""
    import shutil
    import tempfile

    from elektra_spark.ivm import apply_delta_stream, delta_rows, sum_agg
    from elektra_spark.tables import SnapshotCatalog

    orders = _t(spark, sf_dir, "orders")
    cents = {"sum_cents": F.round(F.col("o_totalprice") * 100).cast("long")}
    keys = ["o_orderstatus"]
    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(tempfile.gettempdir(), f"elektra_ivm_stream_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    cat = SnapshotCatalog(spark, os.path.join(base, "wh"))
    cat.write("orders_by_status", sum_agg(orders, keys, cents), operation="materialize")

    src = os.path.join(base, "deltas")
    deletes = delta_rows(orders.filter(F.col("o_orderkey") % 13 == 0), keys, cents, sign=-1)
    inserts = delta_rows(
        orders.filter(F.col("o_orderkey") % 100 == 0).withColumn("o_orderstatus", F.lit("P")),
        keys,
        cents,
        sign=1,
    )
    deletes.write.parquet(os.path.join(src, "d0"))
    inserts.write.parquet(os.path.join(src, "d1"))
    stream = (
        spark.readStream.schema("o_orderstatus string, n_rows long, sum_cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    q = apply_delta_stream(cat, "orders_by_status", stream, keys, os.path.join(base, "ckpt"))
    q.awaitTermination()
    return cat.read("orders_by_status")


def q_snapshot_changelog_orders(spark, sf_dir):
    """Incremental changelog read (tables.py ``changelog`` — Iceberg's CDC
    surface on the stand-in catalog): replay the q_dynamic_orders
    insert→delete schedule, then scan the EDGES table's net delta between
    the initial snapshot and the current one. Emits ('insert', src, dst) for
    inserted-and-surviving edges and ('delete', ...) for deleted base edges;
    an edge inserted then deleted inside the window is correctly absent.
    The twin recomputes both edge sets from the schedule and diffs them."""
    import shutil
    import tempfile

    from elektra_spark.dynamic.updates import DynamicGraph
    from elektra_spark.tables import SnapshotCatalog

    edges, vertices = _customer_order_graph(spark, sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/"))
    wh = os.path.join(tempfile.gettempdir(), f"elektra_changelog_{tag}")
    shutil.rmtree(wh, ignore_errors=True)
    cat = SnapshotCatalog(spark, wh)
    g = DynamicGraph.create(cat, edges, vertices=vertices)

    adds, dels = _order_update_batches(spark, sf_dir)
    g.batch_add_edges(adds.select("src", "dst"))
    g.batch_delete_edges(dels.select("src", "dst"))
    v0 = min(s["version"] for s in cat.history(g._t("edges")))
    return cat.changelog(g._t("edges"), from_version=v0, keys=["src", "dst"]).select(
        "change", "src", "dst"
    )


def _order_update_batches(spark, sf_dir):
    """q_dynamic_orders' deterministic insert/delete schedule as two
    ``(op, src, dst)`` update batches."""
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("o"), F.col("o_custkey").cast("long").alias("c")
    )
    o2 = orders.select(F.col("o").alias("o_next"))
    adds = (
        orders.filter(F.col("o") % 100 == 0)
        .join(o2, F.col("o") + 1 == F.col("o_next"))
        .select(
            F.lit("insert").alias("op"),
            (F.lit(ORDER_VID_OFFSET) + F.col("o")).alias("src"),
            (F.lit(ORDER_VID_OFFSET) + F.col("o_next")).alias("dst"),
        )
    )
    dels = orders.filter(F.col("o") % 13 == 0).select(
        F.lit("delete").alias("op"),
        F.col("c").alias("src"),
        (F.lit(ORDER_VID_OFFSET) + F.col("o")).alias("dst"),
    )
    return adds, dels


def q_streaming_dynamic_orders(spark, sf_dir):
    """Streaming batch-dynamic connectivity (elektra_spark/streaming/
    updates.py): the SAME insert → delete schedule as q_dynamic_orders, but
    delivered as two parquet drops consumed by a Structured Streaming file
    source (one file per micro-batch) and applied through ``foreachBatch`` —
    every micro-batch is one ``BatchAddEdges``/``BatchDeleteEdges`` call on
    the MERGE catalog, the streaming expression of the reference's update
    sequence (dynamic_connectivity.h:44-110,169-377). Offsets checkpoint for
    restart-resume; replays are idempotent. Final labels hash against the
    same recursive-CTE twin as dynamic_orders (connectivity of the final
    edge set is delivery-mode independent — that is the point)."""
    import shutil
    import tempfile
    import time as _time

    from elektra_spark.dynamic.updates import DynamicGraph
    from elektra_spark.streaming.updates import (
        apply_edge_stream,
        read_update_files,
        write_update_file,
    )
    from elektra_spark.tables import SnapshotCatalog

    edges, vertices = _customer_order_graph(spark, sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(tempfile.gettempdir(), f"elektra_stream_dynamic_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    upd_dir = os.path.join(base, "updates")
    os.makedirs(upd_dir)
    g = DynamicGraph.create(
        SnapshotCatalog(spark, os.path.join(base, "wh")), edges, vertices=vertices
    )

    adds, dels = _order_update_batches(spark, sf_dir)
    f1 = write_update_file(adds, upd_dir, "b0.parquet")
    write_update_file(dels, upd_dir, "b1.parquet")
    t = _time.time()
    os.utime(f1, (t - 120, t - 120))  # file-source order: inserts first

    apply_edge_stream(
        read_update_files(spark, upd_dir), g, os.path.join(base, "ckpt")
    ).awaitTermination()
    return g.labels()


def q_dynamic_levels_orders(spark, sf_dir):
    """Integrated HDT-levels mode of the batch-dynamic path (DynamicGraph
    ``levels=True`` — VERDICT r3 item 4): the ``(level, is_tree)`` table is
    maintained through the same MERGE commits as edges/labels/forest (new
    edges at the top level, dynamic_connectivity.h:58,79; the delete path
    re-syncs affected tree flags to the recomputed forest and runs the
    push-down operators: tree push-down under the 2^(top−1) size cap,
    dynamic_connectivity.h:112-131, and non-tree push-down scoped to the
    affected components, :133-167). Same deterministic insert/delete schedule
    as q_dynamic_orders; emits the post-update (level, is_tree) histogram,
    which is fully determined by component structure (tree edges per
    component = size−1; push-down predicates depend only on sizes and the
    affected set), so the DuckDB twin checks it without fixing which edges
    the forest picked."""
    import shutil
    import tempfile

    from elektra_spark.dynamic.updates import DynamicGraph
    from elektra_spark.tables import SnapshotCatalog

    edges, vertices = _customer_order_graph(spark, sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/"))
    wh = os.path.join(tempfile.gettempdir(), f"elektra_dynamic_levels_orders_{tag}")
    shutil.rmtree(wh, ignore_errors=True)
    cat = SnapshotCatalog(spark, wh)
    g = DynamicGraph.create(cat, edges, vertices=vertices, levels=True)

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("o"), F.col("o_custkey").cast("long").alias("c")
    )
    o2 = orders.select(F.col("o").alias("o_next"))
    adds = (
        orders.filter(F.col("o") % 100 == 0)
        .join(o2, F.col("o") + 1 == F.col("o_next"))
        .select(
            (F.lit(ORDER_VID_OFFSET) + F.col("o")).alias("src"),
            (F.lit(ORDER_VID_OFFSET) + F.col("o_next")).alias("dst"),
        )
    )
    # second insert wave: the two earliest orders of every 10th customer —
    # same component by construction, so these land NON-tree at the top
    # level and exercise both non-tree push-down branches (affected → top−1,
    # untouched → top) in the output histogram
    w = Window.partitionBy("c").orderBy("o")
    ranked = orders.withColumn("rn", F.row_number().over(w))
    adds2 = (
        ranked.filter((F.col("rn") == 1) & (F.col("c") % 10 == 0))
        .select("c", F.col("o").alias("a"))
        .join(ranked.filter(F.col("rn") == 2).select("c", F.col("o").alias("b")), "c")
        .select(
            (F.lit(ORDER_VID_OFFSET) + F.col("a")).alias("src"),
            (F.lit(ORDER_VID_OFFSET) + F.col("b")).alias("dst"),
        )
    )
    dels = orders.filter(F.col("o") % 13 == 0).select(
        F.col("c").alias("src"), (F.lit(ORDER_VID_OFFSET) + F.col("o")).alias("dst")
    )
    g.batch_add_edges(adds.unionByName(adds2))
    g.batch_delete_edges(dels)
    lbl = g.labels().withColumnRenamed("vid", "src")
    return (
        g.levels_table()
        .join(lbl, "src")
        .groupBy("level", "is_tree")
        .agg(
            F.count("*").alias("n_edges"),
            F.countDistinct("component").alias("n_components"),
        )
    )


def q_component_vertices_orders(spark, sf_dir):
    """``ComponentVertices`` (elektra euler_tour_tree.h:565-587): enumerate the
    members of customer 1's component (component id = min vid = 1)."""
    from elektra_spark.operators.cc import component_vertices, connected_components

    edges, vertices = _customer_order_graph(spark, sf_dir)
    labels = connected_components(edges, vertices=vertices)
    return component_vertices(labels, 1)


def q_component_edges_orders(spark, sf_dir):
    """``ComponentEdges`` (elektra euler_tour_tree.h:589-592): the edge slice
    of customer 1's component."""
    from elektra_spark.operators.cc import component_edges, connected_components

    edges, vertices = _customer_order_graph(spark, sf_dir)
    labels = connected_components(edges, vertices=vertices)
    return component_edges(labels, edges, 1)


def q_transcript_levels(spark, sf_dir):
    """HDT level-metadata surface (SURVEY.md §2 rows 5/25: ``with_levels`` +
    ``PushDownTreeEdgesFromComponents``, elektra dynamic_connectivity.h:112-131,
    hdt_euler_tour_tree.h:141-167): tag the transcript edge table with
    (level, is_tree), run one tree push-down round at the top level, and emit
    per-(component, level, is_tree) edge counts. The per-component tree count
    equals size−1 (the CheckRep forest invariant) and the push-down predicate
    depends only on the component-size cap 2^(top−1), so the post-round level
    histogram is fully SQL-checkable without fixing which edges the forest
    picked."""
    from elektra_spark.dynamic.levels import (
        max_level,
        push_down_tree_edges_from_components,
        with_levels,
    )
    from elektra_spark.operators.cc import connected_components
    from elektra_spark.operators.forest import spanning_forest

    g = _transcript_graph(spark)
    n = g.vertices.count()
    labels = connected_components(g.edges, vertices=g.vertices)
    forest = spanning_forest(g.edges)
    lvl = with_levels(g.edges, forest, n)
    pushed = push_down_tree_edges_from_components(lvl, labels, max_level(n))
    edge_comp = pushed.join(labels.withColumnRenamed("vid", "src"), "src")
    return edge_comp.groupBy("component", "level", "is_tree").agg(F.count("*").alias("n_edges"))


def q_transcript_levels2(spark, sf_dir):
    """Second push-down round, covering SURVEY.md §2 rows 6/26: after the
    tree push-down of :func:`q_transcript_levels`, the small components'
    level-(top−1) tree edges are collected and decremented again
    (``push_down_tree_like`` — the ``GetAndClearLevelIEdges`` decrement,
    elektra hdt_euler_tour_tree.h:208-210, hdt_element.h:114-149) and their
    top-level non-tree edges move down one level (``PushDownNonTreeEdges``,
    dynamic_connectivity.h:133-167). The batches are drawn from the engine's
    own (level, is_tree) state, but the resulting per-(component, level,
    is_tree) histogram is fully determined by component sizes, so the DuckDB
    twin checks it exactly."""
    from elektra_spark.dynamic.levels import (
        max_level,
        push_down_non_tree_edges,
        push_down_tree_edges_from_components,
        push_down_tree_like,
        with_levels,
    )
    from elektra_spark.operators.cc import connected_components
    from elektra_spark.operators.forest import spanning_forest

    g = _transcript_graph(spark)
    n = g.vertices.count()
    top = max_level(n)
    cap = 1 << max(0, top - 1)
    labels = connected_components(g.edges, vertices=g.vertices)
    lvl = with_levels(g.edges, spanning_forest(g.edges), n)
    pushed = push_down_tree_edges_from_components(lvl, labels, top)

    small = (
        labels.groupBy("component").agg(F.count("*").alias("sz"))
        .filter(F.col("sz") <= cap).select("component")
    )
    member = labels.join(small, "component", "left_semi").select(F.col("vid").alias("src"))
    tree_batch = (
        pushed.filter((F.col("level") == top - 1) & F.col("is_tree"))
        .join(member, "src", "left_semi").select("src", "dst")
    )
    pushed = push_down_tree_like(pushed, tree_batch, top - 1)
    nontree_batch = (
        pushed.filter((F.col("level") == top) & ~F.col("is_tree"))
        .join(member, "src", "left_semi").select("src", "dst")
    )
    pushed = push_down_non_tree_edges(pushed, nontree_batch, top)

    edge_comp = pushed.join(labels.withColumnRenamed("vid", "src"), "src")
    return edge_comp.groupBy("component", "level", "is_tree").agg(F.count("*").alias("n_edges"))


def q_simhash_near_pairs_docs(spark, sf_dir):
    """Hamming near-duplicate pairs over the 64-bit simhash — the op a dedup
    pipeline actually runs (banded band-equality join + exact bit_count(xor)
    distance, pigeonhole-complete for distance ≤ 3)."""
    from elektra_spark.dedup.simhash import hamming_near_pairs, simhash

    fps = simhash(_t(spark, sf_dir, "documents"))
    return hamming_near_pairs(fps, max_distance=3).select(
        "a", "b", F.col("distance").cast("long").alias("distance")
    )


def q_ann_lsh_multiprobe_docs(spark, sf_dir):
    """The multi-probe recall dial of the LSH ANN path (flip the first two
    hyperplane signs of each query bucket), pinned by an oracle that
    reproduces the identical probe set."""
    from elektra_spark.sim.ann import cosine_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    return cosine_topk_lsh(emb, queries, k=5, multi_probe=2)


def q_triangles_copurchase(spark, sf_dir):
    from elektra_spark.operators.triangles import triangle_count

    return triangle_count(_copurchase_graph(spark, sf_dir))


def q_four_cycles_copurchase(spark, sf_dir):
    """Exact global 4-cycle (rectangle) count (triangles.py
    four_cycle_count) via the closed-4-walk trace identity — pure integer
    aggregates, so the DuckDB twin matches bit-for-bit."""
    from elektra_spark.operators.triangles import four_cycle_count

    return four_cycle_count(_copurchase_graph(spark, sf_dir))


def q_four_cliques_copurchase(spark, sf_dir):
    """Exact K4 count (triangles.py four_clique_count): degree-ordered DAG
    orientation gives each 4-clique one topological labeling — oriented
    triangle + one out-extension + two semi-join closure probes, all
    integer-exact. The twin enumerates under vid-canonical order (six edge
    predicates); equality of the two enumerations is itself the check."""
    from elektra_spark.operators.triangles import four_clique_count

    return four_clique_count(_copurchase_graph(spark, sf_dir))


def q_copurchase_weighted(spark, sf_dir):
    """First-class weighted bipartite projection (operators/projection.py):
    the co-purchase pattern with co-occurrence weights, a binding
    PROJ_MAX_BASKET group guard (3215 oversized orders dropped at sf0.01)
    and a PROJ_MIN_WEIGHT pair filter — both part of the operator contract
    and applied identically by the DuckDB twin."""
    from elektra_spark.operators.projection import project_bipartite

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    return project_bipartite(
        li, min_weight=PROJ_MIN_WEIGHT, max_group_size=PROJ_MAX_BASKET
    )


def q_degree_histogram_parts(spark, sf_dir):
    from elektra_spark.operators.degrees import degree_histogram

    return degree_histogram(_copurchase_graph(spark, sf_dir))


def q_triangles_per_vertex_copurchase(spark, sf_dir):
    """Per-vertex triangle participation (triangles.py:54) — the variant
    users join back onto vertex features. Same degree-ordered wedge plan as
    the global count; the oracle canonicalizes each triangle once as
    a<b<c over the src<dst edge set and fans out to its three members."""
    from elektra_spark.operators.triangles import triangle_count_per_vertex

    return triangle_count_per_vertex(_copurchase_graph(spark, sf_dir))


RICH_CLUB_KS = [2, 4, 8, 16, 32]  # degree thresholds for the rich-club grid


def q_rich_club_copurchase(spark, sf_dir):
    """Rich-club coefficient grid (degrees.py rich_club): density of the
    subgraph induced by vertices of degree > k, for RICH_CLUB_KS — do the
    hubs form a club? All-integer counts per k sharing ONE degree aggregate
    and ONE edge-degree join (the grid broadcast-cross-joins in); exact
    DuckDB twin."""
    from elektra_spark.operators.degrees import rich_club

    return rich_club(_copurchase_graph(spark, sf_dir), RICH_CLUB_KS)


def q_transitivity_copurchase(spark, sf_dir):
    """Global clustering coefficient (triangles.py transitivity):
    3·triangles / wedges — integer aggregates + one 1e-6-rounded ratio, so
    the DuckDB twin is exact. Complements the per-vertex
    `clustering_coeff_copurchase` row with the hub-weighted whole-graph
    statistic."""
    from elektra_spark.operators.triangles import transitivity

    return transitivity(_copurchase_graph(spark, sf_dir))


def q_clustering_coeff_copurchase(spark, sf_dir):
    """Watts–Strogatz local clustering coefficient per vertex
    (triangles.py local_clustering_coefficient): 2·T(v)/(d(v)·(d(v)−1)),
    composed from the per-vertex triangle wedge join + the degree
    aggregate. The DuckDB twin mirrors the division
    parenthesis-for-parenthesis over the same canonicalized triangle fan."""
    from elektra_spark.operators.triangles import local_clustering_coefficient

    return local_clustering_coefficient(_copurchase_graph(spark, sf_dir))


def q_link_predict_copurchase(spark, sf_dir):
    """Adamic–Adar link prediction (operators/linkpred.py): top-100
    non-adjacent pairs by Σ 1/ln(deg(w)) over common neighbors w, pivots
    degree-guarded to ≤ LINKPRED_MAX_PIVOT_DEG (the MinHash-max_bucket-style
    spam-hub contract). Deterministic cut under (round(score,6) DESC, a, b);
    the DuckDB twin applies the identical guard and total order."""
    from elektra_spark.operators.linkpred import adamic_adar

    return adamic_adar(
        _copurchase_graph(spark, sf_dir),
        max_pivot_degree=LINKPRED_MAX_PIVOT_DEG,
        top_k=LINKPRED_TOP_K,
    )


def q_dynamic_triangles_copurchase(spark, sf_dir):
    """Batch-dynamic triangle maintenance (triangles.py triangle_count_delta):
    a deterministic ~10% slice of the copurchase edges arrives as an insert
    batch; the engine counts the base graph once and computes the batch's
    triangle delta by inclusion–exclusion (cost ∝ batch-adjacent wedges,
    not the old graph). The DuckDB twin recounts BOTH graphs from scratch —
    a MATCH proves the incremental identity T(old∪new) = T(old) + Δ."""
    from elektra_spark.operators.triangles import triangle_count, triangle_count_delta

    e = _copurchase_graph(spark, sf_dir)
    is_new = (F.col("src") + F.col("dst")) % 10 == 0
    new = e.filter(is_new)
    old = e.filter(~is_new)
    t_old = triangle_count(old).select(F.col("n_triangles").alias("n_triangles_old"))
    delta = triangle_count_delta(old, new)
    return t_old.crossJoin(delta).select(
        "n_triangles_old",
        "delta_triangles",
        (F.col("n_triangles_old") + F.col("delta_triangles")).cast("long").alias("n_triangles_total"),
    )


def q_edge_support_copurchase(spark, sf_dir):
    """Per-edge triangle support (operators/truss.py edge_support) — the
    edge-level sibling of per-vertex triangle counts and the k-truss
    building block. The DuckDB twin fans each canonically-enumerated
    triangle (a<b<c) out to its three member edges."""
    from elektra_spark.operators.truss import edge_support

    return edge_support(_copurchase_graph(spark, sf_dir))


def q_truss_copurchase(spark, sf_dir):
    """k-truss decomposition (operators/truss.py k_truss, k=TRUSS_K):
    synchronous support-peel to the fixpoint, returning surviving edges with
    their within-truss support. The DuckDB twin unrolls TRUSS_SQL_ROUNDS ≥
    peel-depth+1 synchronous rounds (no-ops past the fixpoint); pytest pins
    the contract instance's actual depth."""
    from elektra_spark.operators.truss import k_truss

    return k_truss(_copurchase_graph(spark, sf_dir), k=TRUSS_K)


def q_assortativity_copurchase(spark, sf_dir):
    """Newman degree assortativity (operators/degrees.py): Pearson
    correlation of endpoint degrees from explicit integer power sums —
    exact in both engines regardless of summation order."""
    from elektra_spark.operators.degrees import degree_assortativity

    return degree_assortativity(_copurchase_graph(spark, sf_dir))


def q_jaccard_copurchase(spark, sf_dir):
    """Jaccard neighbor-overlap link prediction (linkpred.py
    jaccard_similarity): top-100 non-adjacent pairs by |Γa∩Γb|/|Γa∪Γb|,
    numerator pivots guarded to ≤ LINKPRED_MAX_PIVOT_DEG (same spam-hub
    contract as Adamic–Adar), denominator over full degrees. One IEEE
    division of exact integers → bit-identical across engines before the
    1e-6 ordering round; the DuckDB twin applies the identical guard and
    (score DESC, a, b) cut."""
    from elektra_spark.operators.linkpred import jaccard_similarity

    return jaccard_similarity(
        _copurchase_graph(spark, sf_dir),
        max_pivot_degree=LINKPRED_MAX_PIVOT_DEG,
        top_k=LINKPRED_TOP_K,
    )


def q_triangles_sampled_copurchase(spark, sf_dir):
    """DOULION sparsified triangle estimate (triangles.py
    triangle_count_sampled, Tsourakakis KDD'09): count on a
    deterministically hash-sampled p=0.2 edge subset, scale by 1/p³ — the
    bounded-cost estimator for 10^12-edge tables where the exact O(m^1.5)
    wedge volume isn't worth the shuffle. The coin is a vid-derived mod
    expression the DuckDB twin recomputes verbatim, so the sampled
    subgraph — and therefore the count — is identical by construction."""
    from elektra_spark.operators.triangles import triangle_count_sampled

    return triangle_count_sampled(_copurchase_graph(spark, sf_dir), p_permille=TRI_SAMPLE_PERMILLE)


def q_conductance_lpa_customer_orders(spark, sf_dir):
    """Per-community conductance (lpa.py conductance) of the same LPA
    partition — cut / min(vol, 2m − vol), the boundary-quality complement
    to modularity's density score. Integer cut/volume aggregates with one
    division per row; the DuckDB twin re-derives the identical partition
    from the shared _lpa_chain and applies the same formula."""
    from elektra_spark.operators.lpa import conductance, label_propagation

    edges, vertices = _customer_order_graph(spark, sf_dir)
    labels = label_propagation(edges, vertices=vertices, rounds=LPA_ROUNDS)
    return conductance(edges, labels)


def q_modularity_lpa_customer_orders(spark, sf_dir):
    """Newman modularity (lpa.py modularity) of the LPA_ROUNDS-round label
    propagation partition over the customer↔orders graph — the quality
    score that tells a user whether the community assignment means
    anything. Both Σ terms are exact integer aggregates combined in one
    fixed two-division expression, so engine and oracle agree bit-for-bit
    before the 1e-6 round; the DuckDB twin re-derives the identical
    partition from the shared unrolled LPA chain (_lpa_chain)."""
    from elektra_spark.operators.lpa import label_propagation, modularity

    edges, vertices = _customer_order_graph(spark, sf_dir)
    labels = label_propagation(edges, vertices=vertices, rounds=LPA_ROUNDS)
    return modularity(edges, labels)


# ------------------------------------------- transcripts (fixture-backed)
def _transcript_graph(spark, n_conversations=300):
    from elektra_spark.ingest.edges import derive_graph

    return derive_graph(_transcripts(spark, n_conversations))


PARTITION_GRID = [8, 32, 128]  # candidate partition counts for the layout advisor


def q_partition_advisor_transcript(spark, sf_dir):
    """Partitioning advisor (operators/partition_advisor.py): measured edge
    cut — the shuffle volume of every superstep join — for hash vs dense-vid
    range layouts over the transcript link graph. Quantifies WHY the
    engine's conversation-contiguous vid assignment (ingest/edges.py) wins:
    reply edges are (v, v+1), so range blocks cut only boundary-straddling
    edges while any uniform hash cuts ~1 - 1/P of them."""
    from elektra_spark.operators.partition_advisor import edge_cut_advisor

    g = _transcript_graph(spark)
    n_vids = g.vertices.count()  # dense 0..N-1 vid space (turns + tool actors)
    return edge_cut_advisor(g.edges, n_vids=n_vids, partition_counts=PARTITION_GRID)


def q_transcript_cc(spark, sf_dir):
    from elektra_spark.operators.cc import connected_components

    g = _transcript_graph(spark)
    return connected_components(g.edges, vertices=g.vertices)


def q_transcript_pagerank(spark, sf_dir):
    from elektra_spark.operators.pagerank import pagerank

    g = _transcript_graph(spark)
    return pagerank(g.edges, vertices=g.vertices, n_iter=10).select("vid", F.round("rank", 6).alias("rank"))


def q_dynamic_pagerank_transcript(spark, sf_dir):
    """Warm-start PageRank after a batch edge update — the rank analogue of
    the reference's batch-dynamic connectivity story (BatchAddEdges /
    BatchDeleteEdges, elektra dynamic_connectivity.h:44-110): instead of
    re-ranking the updated graph from uniform, the engine resumes from the
    pre-update ranks (``init_ranks``/``start_step``, the same machinery the
    mid-run checkpoint resume uses) and runs DYN_PR_ITERS more supersteps.
    Update batch: delete every (src+dst)%13==0 edge, insert the two-hop
    shortcuts composed from consecutive-vid edge pairs — both derivable from
    the edge set alone, so the DuckDB twin regenerates them exactly and
    chains a second unrolled power iteration (different edge/degree CTEs,
    same rule) from the first chain's full-precision r10."""
    from elektra_spark.operators.pagerank import pagerank

    g = _transcript_graph(spark)
    e = g.edges.select("src", "dst")
    keep = e.filter((F.col("src") + F.col("dst")) % 13 != 0)
    left = e.filter(F.col("dst") == F.col("src") + 1).select(
        F.col("src").alias("a_src"), F.col("dst").alias("mid")
    )
    right = e.filter(F.col("dst") == F.col("src") + 1).select(
        F.col("src").alias("mid"), F.col("dst").alias("b_dst")
    )
    adds = left.join(right, "mid").select(
        F.col("a_src").alias("src"), F.col("b_dst").alias("dst")
    )
    new_edges = keep.unionByName(adds).distinct()
    ranks_old = pagerank(e, vertices=g.vertices, n_iter=TRANSCRIPT_PR_ITERS)
    final = pagerank(
        new_edges,
        vertices=g.vertices,
        n_iter=DYN_PR_ITERS,
        start_step=TRANSCRIPT_PR_ITERS,
        init_ranks=ranks_old,
    )
    return final.select("vid", F.round("rank", 6).alias("rank"))


def q_transcript_bfs(spark, sf_dir):
    """Bounded multi-source BFS (operators/bfs.py): ``BFS_MAX_HOPS``-hop
    distance from the tool-actor hub set over the transcript link graph —
    every turn's "how far is the nearest tool call" feature. Vertices
    outside the bound (e.g. tool-free conversations, which form their own
    components) report -1; the bound is part of the operator contract and
    the DuckDB twin caps its recursion identically."""
    from elektra_spark.operators.bfs import hop_distance

    g = _transcript_graph(spark)
    seeds = g.vertices.filter(F.col("kind") == "tool").select("vid")
    return hop_distance(g.edges, seeds, vertices=g.vertices, max_hops=BFS_MAX_HOPS)


def q_transcript_harmonic(spark, sf_dir):
    """Landmark harmonic centrality (operators/bfs.py harmonic_centrality):
    Σ 1/d(l, v) over the tool-actor landmark set within BFS_MAX_HOPS — the
    closeness-family centrality computed the way it is actually run at
    scale (landmark sampling, Eppstein–Wang / Boldi–Vigna). The
    inverse-distance sum is an exact integer Σ(L div d) with
    L = lcm(1..hops) divided once at the end, so summation order cannot
    move the 1e-6 rounding; the DuckDB twin caps its recursive closure at
    the same bound and computes the same integer sum."""
    from elektra_spark.operators.bfs import harmonic_centrality

    g = _transcript_graph(spark)
    landmarks = g.vertices.filter(F.col("kind") == "tool").select("vid")
    return harmonic_centrality(g.edges, landmarks, vertices=g.vertices, max_hops=BFS_MAX_HOPS)


def q_transcript_closeness(spark, sf_dir):
    """Landmark closeness (operators/bfs.py closeness_centrality): Lin's
    reached/sum-distance ratio over the tool-actor landmarks within
    BFS_MAX_HOPS — both aggregates are exact integers with one final
    division, so the DuckDB twin (same capped per-landmark closure as
    harmonic's) matches at the 1e-6 rounding in any summation order."""
    from elektra_spark.operators.bfs import closeness_centrality

    g = _transcript_graph(spark)
    landmarks = g.vertices.filter(F.col("kind") == "tool").select("vid")
    return closeness_centrality(g.edges, landmarks, vertices=g.vertices, max_hops=BFS_MAX_HOPS)


def q_diameter_copurchase(spark, sf_dir):
    """Double-sweep pseudo-diameter (operators/bfs.py pseudo_diameter,
    Magnien–Latapy–Habib): two bounded BFS runs replace the Θ(|V|·|E|)
    all-pairs sweep — the scalable diameter estimate, run on the
    small-world copurchase graph where the sweeps resolve well inside the
    bound (the chain-structured transcript graph's eccentricity exceeds
    any reasonable cap, so there the estimate would just report the cap).
    Start vertex, argmax tiebreak (max dist, min vid), and the
    PSEUDO_DIAM_HOPS bound are the contract; the DuckDB twin chains two
    capped recursive closures with the identical selection."""
    from elektra_spark.operators.bfs import pseudo_diameter

    return pseudo_diameter(_copurchase_graph(spark, sf_dir), max_hops=PSEUDO_DIAM_HOPS)


def q_transcript_walks(spark, sf_dir):
    """Deterministic random-walk corpus (operators/walks.py random_walks):
    one DeepWalk-style WALK_LEN-step walk per seed (vids ≡ 0 mod
    WALK_SEED_MOD) over the transcript link graph — the training-data
    generator for graph embeddings, run as per-step frontier joins instead
    of a driver loop. Every transition is the argmin of an arithmetic hash
    both engines evaluate identically, so the corpus — not just its
    statistics — is twinned row-for-row."""
    from elektra_spark.operators.walks import random_walks

    g = _transcript_graph(spark)
    seeds = g.vertices.filter(F.col("vid") % WALK_SEED_MOD == 0).select("vid")
    return random_walks(g.edges, seeds, walk_length=WALK_LEN)


def q_transcript_node2vec(spark, sf_dir):
    """Second-order biased walk corpus (operators/walks.py biased_walks) —
    the node2vec sibling of `transcript_walks`: transitions rank neighbors
    by (preference class, hash, vid) where the class encodes node2vec's
    p>1, q>1 regime deterministically (close triangles first, explore
    two-hop next, backtrack last — backtrack still forced at dead ends).
    Same seeds and length as the first-order corpus so the two are
    directly comparable; the DuckDB twin replays the second-order chain
    row-for-row, classifying each candidate via the deduplicated
    adjacency."""
    from elektra_spark.operators.walks import biased_walks

    g = _transcript_graph(spark)
    seeds = g.vertices.filter(F.col("vid") % WALK_SEED_MOD == 0).select("vid")
    return biased_walks(g.edges, seeds, walk_length=WALK_LEN)


def q_mis_copurchase(spark, sf_dir):
    """Maximal independent set (operators/walks.py, Luby 1986) with
    deterministic per-round re-hashed priorities — the classic parallel
    symmetry-breaking primitive, same ParallelWhile + write-min shape as
    the reference's batch ops. The DuckDB twin unrolls MIS_SQL_ROUNDS
    rounds of the identical priority/winner/retire schedule."""
    from elektra_spark.operators.walks import maximal_independent_set

    return maximal_independent_set(_copurchase_graph(spark, sf_dir))


def q_matching_transcript(spark, sf_dir):
    """Maximal matching (operators/matching.py): locally-minimal-edge rule
    with per-round re-hashed md5 priorities — the edge-side sibling of the
    MIS row (an MIS of the line graph computed directly on the edge
    relation), over the transcript link graph where the reply chains +
    tool-hub stars exercise both degenerate shapes. The DuckDB twin unrolls
    MATCHING_SQL_ROUNDS rounds of the identical priority/winner/retire
    schedule; maximality and disjointness are asserted structurally in
    pytest."""
    from elektra_spark.operators.matching import maximal_matching

    return maximal_matching(_transcript_graph(spark).edges)


def q_vertex_cover_transcript(spark, sf_dir):
    """2-approximate minimum vertex cover — the endpoints of the maximal
    matching (Gavril/Yannakakis: any cover must pick ≥1 endpoint of every
    matched edge, so |C| = 2|M| ≤ 2·OPT). Pure composition over the
    oracle-twinned matching row; reported as a per-vertex membership flag.
    pytest asserts the structural guarantee: every edge is covered and
    |C| = 2 |M|."""
    from elektra_spark.operators.matching import maximal_matching

    g = _transcript_graph(spark)
    m = maximal_matching(g.edges)
    cover = (
        m.select(F.col("src").alias("vid"))
        .union(m.select(F.col("dst").alias("vid")))
        .distinct()
        .withColumn("flag", F.lit(True))
    )
    return g.vertices.select("vid").join(cover, "vid", "left").select(
        "vid", F.coalesce("flag", F.lit(False)).alias("in_cover")
    )


LOUVAIN_ROUNDS = 8  # Luby-mover gain-argmax rounds, part of the operator contract


def q_louvain_transcript(spark, sf_dir):
    """Synchronous Louvain-style modularity moves (operators/louvain.py,
    Blondel 2008 phase 1): per round every vertex argmaxes the EXACT integer
    gain numerator 2m·k_{i,c} − k_i·(Σtot_c − k_i·[stay]) over neighbor
    communities + its own, (score DESC, c ASC) total order — no float
    modularity anywhere. Moves are applied under the Luby-mover schedule
    (strict md5 (h,vid) local minimum — movers form an independent set, so
    every applied move equals the sequential move from the same state and
    swap oscillation is impossible). LOUVAIN_ROUNDS unrolled in the twin."""
    from elektra_spark.operators.louvain import louvain_moves

    g = _transcript_graph(spark)
    return louvain_moves(g.edges, rounds=LOUVAIN_ROUNDS, vertices=g.vertices.select("vid"))


def q_modularity_louvain_transcript(spark, sf_dir):
    """Newman modularity of the Louvain partition (composition: the
    gain-argmax moves evaluated by the partition-quality score they
    optimize) — same exact-integer two-division expression as the LPA
    modularity row; the twin feeds the unrolled Louvain chain's final
    labels into the identical aggregates."""
    from elektra_spark.operators.louvain import louvain_moves
    from elektra_spark.operators.lpa import modularity

    g = _transcript_graph(spark)
    labels = louvain_moves(g.edges, rounds=LOUVAIN_ROUNDS, vertices=g.vertices.select("vid")).select(
        "vid", F.col("community").alias("label")
    )
    return modularity(g.edges, labels)


SCAN_EPS_PERMILLE = 700  # σ ≥ 0.7: 583 ε-edges / 1162 cores on the n=300 graph
SCAN_MU = 2  # core = at least one ε-similar neighbor besides itself


def q_scan_transcript(spark, sf_dir):
    """SCAN structural clustering (operators/scan.py, Xu et al. 2007) on the
    transcript link graph: cores/borders/outliers from integer-exact
    σ ≥ 0.7 decisions, clusters = min-vid CC of the core ε-subgraph. The
    community detector that may assign NOTHING — tool hubs structurally
    match none of their neighbors and drop out as outliers, reply-chain
    runs survive as clusters. Full SQL twin: σ via wedge counts, core CC
    via pruned recursive CTE, identical border min-cluster tie-break."""
    from elektra_spark.operators.scan import scan_clusters

    g = _transcript_graph(spark)
    return scan_clusters(
        g.edges, eps_permille=SCAN_EPS_PERMILLE, mu=SCAN_MU, vertices=g.vertices.select("vid")
    )


SEEDED_LPA_SQL_ROUNDS = 4  # unrolled seeded-LPA supersteps shared with the twin


def q_seeded_lpa_transcript(spark, sf_dir):
    """Semi-supervised label propagation (operators/lpa.py
    seeded_label_propagation): tool-actor hub vertices are CLAMPED anchors
    labeled by their own vid; every turn takes the synchronous
    frequency-then-min-label vote of its labeled neighbors, ring by ring —
    which turns does each tool's influence cover through the reply
    structure. Turns never reached in SEEDED_LPA_SQL_ROUNDS rounds report
    -1. The DuckDB twin unrolls the identical clamp/vote/carry schedule."""
    from elektra_spark.operators.lpa import seeded_label_propagation

    g = _transcript_graph(spark)
    seeds = g.vertices.filter(F.col("kind") == "tool").select(
        "vid", F.col("vid").alias("label")
    )
    return seeded_label_propagation(
        g.edges, seeds, vertices=g.vertices, rounds=SEEDED_LPA_SQL_ROUNDS
    )


def _seeded_lpa_sql() -> str:
    """Twin of q_seeded_lpa_transcript: SEEDED_LPA_SQL_ROUNDS unrolled
    rounds — seeds re-asserted each round, non-seeds take the (cnt DESC,
    label ASC) vote of labeled neighbors else carry their previous label,
    never-labeled vertices report -1."""
    parts = [
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + """,
  sd AS (SELECT vid, vid AS label FROM tool_v),
  l0 AS (SELECT vid, label FROM sd)"""
    ]
    for r in range(1, SEEDED_LPA_SQL_ROUNDS + 1):
        parts.append(
            f""",
  v{r} AS (SELECT b.dst AS vid, l.label, count(*) AS cnt
           FROM b JOIN l{r - 1} l ON l.vid = b.src GROUP BY b.dst, l.label),
  w{r} AS (SELECT vid, label FROM (
    SELECT vid, label, row_number() OVER (PARTITION BY vid ORDER BY cnt DESC, label) AS rn
    FROM v{r}) WHERE rn = 1),
  l{r} AS MATERIALIZED (
    SELECT vid, label FROM sd
    UNION ALL
    SELECT coalesce(w.vid, o.vid) AS vid, coalesce(w.label, o.label) AS label
    FROM (SELECT vid, label FROM w{r} WHERE vid NOT IN (SELECT vid FROM sd)) w
    FULL JOIN (SELECT vid, label FROM l{r - 1} WHERE vid NOT IN (SELECT vid FROM sd)) o
      ON o.vid = w.vid)"""
        )
    parts.append(
        f"""
  SELECT verts.vid, coalesce(l.label, -1) AS label
  FROM verts LEFT JOIN l{SEEDED_LPA_SQL_ROUNDS} l ON l.vid = verts.vid"""
    )
    return "".join(parts)


def q_coarsen_transcript(spark, sf_dir):
    """Multilevel coarsening step (operators/matching.py contract_matching):
    contract every matched pair of the deterministic maximal matching to
    its lower endpoint and re-aggregate edge multiplicities — the METIS /
    Louvain scale primitive (Karypis & Kumar 1998) that shrinks a 10^12-edge
    graph geometrically while preserving cut weights exactly. Two left
    joins through the disjoint-pair representative table + one combinable
    groupBy; the DuckDB twin shares the matching round chain verbatim and
    applies the identical contraction."""
    from elektra_spark.operators.matching import coarsen

    return coarsen(_transcript_graph(spark).edges, levels=1)


def _msf_weight_col() -> F.Column:
    """Deterministic distinct-ish edge weight: 12-hex md5 slice of
    "w:src:dst" (< 2^48, exact BIGINT in both engines); the operator's
    (w, src, dst) tiebreak keeps the order total even if two edges collide,
    so the MSF stays unique either way."""
    key = F.concat_ws(":", F.lit("w"), F.col("src"), F.col("dst"))
    return F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long")


def q_msf_transcript(spark, sf_dir):
    """Weighted minimum spanning forest (operators/forest.py
    minimum_spanning_forest): Boruvka over md5-derived edge weights on the
    transcript link graph. Under the total (w, src, dst) order the MSF is
    unique, so the DuckDB twin — MSF_SQL_ROUNDS unrolled rounds of
    per-component min-incident-edge selection with an exact recursive-CTE
    relabel between rounds — must reproduce the edge SET bit-for-bit, not
    just aggregates. The weighted sibling of `transcript_forest`
    (elektra::SpanningTree, spanning_tree.h:27-106, which is
    weight-oblivious because its unite order is a CAS race)."""
    from elektra_spark.operators.forest import minimum_spanning_forest

    e = _transcript_graph(spark).edges.select("src", "dst", _msf_weight_col().alias("w"))
    return minimum_spanning_forest(e)


SINGLE_LINKAGE_TAU = 1 << 47  # weight cut at half the 48-bit md5 space (~half the edges survive)


def q_single_linkage_transcript(spark, sf_dir):
    """Single-linkage clustering at threshold τ via the MSF cut: drop MSF
    edges heavier than τ; components of the surviving forest edges are
    EXACTLY the components of the full τ-light edge subgraph (the
    Kruskal/single-linkage equivalence — every light edge either is in the
    MSF or closes a cycle of strictly lighter, hence also light, edges).
    The oracle deliberately takes the OTHER route — recursive-CTE CC over
    all light edges directly — so this row cross-validates the MSF against
    an independent algorithm rather than twinning the same plan.

    100 TB story: the production win of the MSF route is that CC runs on
    O(V) forest edges instead of O(E) light edges, and ONE cached MSF
    serves every threshold (the dendrogram) — re-cutting is a filter, not
    a recomputation."""
    from elektra_spark.operators.cc import connected_components
    from elektra_spark.operators.forest import minimum_spanning_forest

    g = _transcript_graph(spark)
    e = g.edges.select("src", "dst", _msf_weight_col().alias("w"))
    kept = minimum_spanning_forest(e).filter(F.col("w") <= SINGLE_LINKAGE_TAU).select("src", "dst")
    return connected_components(kept, vertices=g.vertices.select("vid"))


SKEW_HOT_K = 16  # hub keys split out of the shuffle join (the Zipf tool actors)


def q_skew_join_transcript(spark, sf_dir):
    """Explicit skew-split join (operators/skew.py skew_split_join): attach
    vertex kinds to both edge endpoints with the Zipf tool-actor hubs routed
    through the broadcast leg, then aggregate edge counts per (kind, kind).
    The oracle is the PLAIN join — the split must be invisible in the
    result; the hub degrees in this graph are exactly the skew the north
    rule says must be handled explicitly."""
    from elektra_spark.operators.skew import skew_split_join, top_hub_keys

    g = _transcript_graph(spark)
    kinds = g.vertices.select("vid", "kind")
    hot = top_hub_keys(g.edges, k=SKEW_HOT_K).select("vid")
    e = g.edges.select(F.col("src").alias("vid"), "dst")
    with_src = skew_split_join(e, kinds, "vid", hot).select(
        F.col("kind").alias("src_kind"), F.col("dst").alias("vid")
    )
    with_both = skew_split_join(with_src, kinds, "vid", hot)
    return (
        with_both.groupBy("src_kind", F.col("kind").alias("dst_kind"))
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )


def q_salted_degree_transcript(spark, sf_dir):
    """Salted two-phase degree count (operators/skew.py salted_count): the
    explicit skew form for aggregation state partial-agg cannot bound; the
    oracle is the plain one-phase degree count — identical results is the
    contract (commutative merge)."""
    from elektra_spark.operators.skew import salted_count

    g = _transcript_graph(spark)
    both = g.edges.select(F.col("src").alias("vid")).unionAll(
        g.edges.select(F.col("dst").alias("vid"))
    )
    return salted_count(both, "vid", alias="degree")


def q_coloring_transcript(spark, sf_dir):
    """Jones–Plassmann greedy coloring (operators/coloring.py): fixed md5
    vertex priorities, local-max winners take the smallest absent neighbor
    color — color VALUES are a pure function of the graph, so the DuckDB
    twin (COLORING_SQL_ROUNDS unrolled rounds) hashes the full assignment.
    Validity (no monochrome edge) is asserted structurally in pytest."""
    from elektra_spark.operators.coloring import greedy_coloring

    g = _transcript_graph(spark)
    return greedy_coloring(g.edges, vertices=g.vertices)


def q_hyperball_copurchase(spark, sf_dir):
    """Approximate neighborhood function via HyperBall (operators/anf.py,
    Boldi-Vigna WWW 2011): per-vertex HLL ball-size estimates for hops
    0..ANF_HOPS. Registers derive from portable md5 bit slices, so the
    DuckDB twin computes bit-identical registers and estimates — the
    contract checks the APPROXIMATE algorithm exactly; accuracy vs exact
    balls is bounded separately in pytest."""
    from elektra_spark.operators.anf import hyperball

    return hyperball(_copurchase_graph(spark, sf_dir), hops=ANF_HOPS, m=ANF_REGISTERS)


def q_neighborhood_function_copurchase(spark, sf_dir):
    """Aggregate neighborhood function N(h) = Σ_v |B(v, h)| and the
    0.9-effective-diameter flag, derived from the same HyperBall register
    chain as hyperball_copurchase (Palmer et al. KDD 2002's headline
    statistic; Boldi-Vigna's four-degrees measurement). The 6dp per-vertex
    estimates are summed as exact ×10⁶ integers so cross-engine float
    association cannot perturb the hash; fraction and flag derive from
    single divisions / integer comparisons of those sums."""
    from elektra_spark.operators.anf import hyperball

    hb = hyperball(_copurchase_graph(spark, sf_dir), hops=ANF_HOPS, m=ANF_REGISTERS)
    s = (
        hb.select("hop", F.round(F.col("ball_est") * 1000000.0).cast("long").alias("e6"))
        .groupBy("hop")
        .agg(F.sum("e6").alias("nf_e6"))
    )
    fin = s.filter(F.col("hop") == ANF_HOPS).select(F.col("nf_e6").alias("fin_e6"))
    return s.crossJoin(F.broadcast(fin)).select(
        F.col("hop").cast("int").alias("hop"),
        F.round(F.col("nf_e6") / 1000000.0, 6).alias("nf"),
        F.round(F.col("nf_e6").cast("double") / F.col("fin_e6").cast("double"), 6).alias("reach_frac"),
        (F.col("nf_e6") * 10 >= F.col("fin_e6") * 9).alias("within_090"),
    )


def q_transcript_widest(spark, sf_dir):
    """Hop-bounded widest (max-bottleneck) paths (operators/bfs.py
    widest_path) from the tool-actor seeds — the max-min dual of
    transcript_sssp over the same vid-derived integer weight, same
    SSSP_MAX_HOPS contract bound; the DuckDB twin's recursive CTE caps
    identically and shares the weight expression."""
    from elektra_spark.operators.bfs import widest_path

    g = _transcript_graph(spark)
    seeds = g.vertices.filter(F.col("kind") == "tool").select("vid")
    return widest_path(g.edges, seeds, vertices=g.vertices, max_hops=SSSP_MAX_HOPS)


def q_transcript_turn_gaps(spark, sf_dir):
    """Per-conversation latency profile (operators/convstats.py
    turn_gap_profile): inter-turn gap stats from the raw transcript ts
    column under stable (conv_id, turn_idx) ordering — the payload-side
    query next to the link-graph suite. One shuffle on conv_id shared by
    the lag window and the aggregation; the DuckDB twin lags epoch seconds
    identically."""
    from elektra_spark.operators.convstats import turn_gap_profile

    return turn_gap_profile(_transcripts(spark, 300))


def q_tool_sequences(spark, sf_dir):
    """Tool-call pattern mining (operators/convstats.py tool_sequences):
    the frequency table of per-conversation tool sequences in turn order —
    agent-behavior n-grams. The in-group order is pinned by sorting
    (turn_idx, tool) structs, so the fingerprint is deterministic across
    task placement; the DuckDB twin is an ORDER BY string_agg."""
    from elektra_spark.operators.convstats import tool_sequences

    return tool_sequences(_transcripts(spark, 300))


def _transcript_turn_gaps_sql() -> str:
    fx = _transcript_fixture(300)
    return f"""
  WITH g AS (
    SELECT conv_id, tool,
           date_diff('second', lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx), ts) AS gap_s
    FROM read_parquet('{fx}')
  )
  SELECT conv_id, count(*)::BIGINT AS n_turns, count(tool)::BIGINT AS n_tool_turns,
         round(coalesce(avg(gap_s), 0), 6) AS mean_gap_s,
         coalesce(max(gap_s), 0)::BIGINT AS max_gap_s
  FROM g GROUP BY conv_id"""


def _tool_sequences_sql() -> str:
    fx = _transcript_fixture(300)
    return f"""
  WITH s AS (
    SELECT conv_id, string_agg(tool, '>' ORDER BY turn_idx) AS seq
    FROM read_parquet('{fx}') WHERE tool IS NOT NULL GROUP BY conv_id
  )
  SELECT seq, count(*)::BIGINT AS n_convs FROM s GROUP BY seq"""


def q_wl_structure_transcripts(spark, sf_dir):
    """Conversation-structure fingerprinting via 1-WL color refinement
    (operators/wl.py structure_fingerprint): WL_ROUNDS rounds of
    Weisfeiler–Leman re-coloring over each conversation's reply chain with
    (role, tool) initial colors, then one combinable
    (Σ hash48(final color), n_turns) fingerprint per conversation plus how
    many conversations share it — structural dedup that catches templated /
    scripted transcripts whose texts differ but whose interaction shape is
    identical, invisible to the text-level dedup family. Every round hash
    is md5 both engines evaluate byte-identically, so the DuckDB twin
    reproduces each color and each fingerprint string-for-string."""
    from elektra_spark.operators.wl import structure_fingerprint

    return structure_fingerprint(_transcripts(spark, 300), rounds=WL_SQL_ROUNDS)


WL_SQL_ROUNDS = 3  # unrolled WL refinement depth shared by engine and twin


def _wl_structure_sql() -> str:
    """Twin of q_wl_structure_transcripts: identical initial colors
    (md5('role:tool')), WL_SQL_ROUNDS unrolled refinement rounds — each
    re-colors with md5(color || '|' || sorted comma-joined neighbor colors)
    over the symmetrized reply-chain adjacency — then the identical
    48-bit-slice sum + count fingerprint and the shared-structure count."""
    fx = _transcript_fixture(300)
    parts = [
        f"""WITH tt AS MATERIALIZED (
    SELECT conv_id, turn_idx, conv_id || '#' || turn_idx AS vid,
           md5(role || ':' || coalesce(tool, '')) AS color
    FROM read_parquet('{fx}')),
  ew AS (SELECT t1.vid AS src, t2.vid AS dst
         FROM tt t1 JOIN tt t2
           ON t2.conv_id = t1.conv_id AND t2.turn_idx = t1.turn_idx + 1),
  bw AS MATERIALIZED (SELECT src, dst FROM ew UNION SELECT dst, src FROM ew),
  c0 AS MATERIALIZED (SELECT vid, color FROM tt)"""
    ]
    for r in range(1, WL_SQL_ROUNDS + 1):
        parts.append(
            f""",
  c{r} AS MATERIALIZED (
    SELECT v.vid, md5(v.color || '|' || coalesce(nb.nbs, '')) AS color
    FROM c{r - 1} v LEFT JOIN (
      SELECT b.dst AS vid, string_agg(c.color, ',' ORDER BY c.color) AS nbs
      FROM bw b JOIN c{r - 1} c ON c.vid = b.src GROUP BY b.dst
    ) nb ON nb.vid = v.vid)"""
        )
    parts.append(
        f""",
  fp AS (SELECT tt.conv_id, count(*)::BIGINT AS n_turns,
                sum(('0x' || substr(md5(c.color), 1, 12))::BIGINT) AS csum
         FROM tt JOIN c{WL_SQL_ROUNDS} c ON c.vid = tt.vid GROUP BY tt.conv_id),
  fp2 AS (SELECT conv_id, n_turns,
                 md5(csum::VARCHAR || ':' || n_turns::VARCHAR) AS wl_fp
          FROM fp)
  SELECT fp2.conv_id, fp2.n_turns, fp2.wl_fp, s.n_same_structure
  FROM fp2 JOIN (SELECT wl_fp, count(*)::BIGINT AS n_same_structure
                 FROM fp2 GROUP BY wl_fp) s USING (wl_fp)"""
    )
    return "".join(parts)


def q_temporal_reach_transcript(spark, sf_dir):
    """Temporal earliest-arrival reachability (operators/temporal.py): which
    turns/tools could a seed set's information have reached through
    TIME-RESPECTING paths — reply edges fire at the later turn's ts, and a
    tool-hub hop u → T → v is admissible only when v invoked T no earlier
    than u (epoch-second timestamps agree exactly across engines). Seeds =
    vids ≡ 0 (mod TEMPORAL_SEED_MOD), arrival 0; the DuckDB twin unrolls
    the identical TEMPORAL_HOPS min-relaxation rounds over the identical
    temporal edge derivation. The payload-aware sibling of the static
    hop/weighted-distance rows — same plan family, eligibility predicate
    `t >= arrival(src)` added to the relax join."""
    from elektra_spark.operators.temporal import earliest_arrival

    tedges, g = _transcript_temporal_edges(spark)
    seeds = g.vertices.filter(F.col("vid") % TEMPORAL_SEED_MOD == 0).select("vid")
    return earliest_arrival(
        tedges, seeds, vertices=g.vertices.select("vid"), max_hops=TEMPORAL_HOPS
    )


def _transcript_temporal_edges(spark):
    """Shared Spark-side temporal edge derivation for the two temporal rows
    (see q_temporal_reach_transcript docstring)."""
    tr = _transcripts(spark, 300)
    g = _transcript_graph(spark)
    wt = (
        g.vertices.filter(F.col("kind") == "turn")
        .select("vid", "conv_id", "turn_idx", "tool")
        .join(
            tr.select("conv_id", "turn_idx", F.unix_timestamp("ts").alias("et")),
            ["conv_id", "turn_idx"],
        )
    )
    tool_v = g.vertices.filter(F.col("kind") == "tool").select(
        F.col("vid").alias("tvid"), "tool"
    )
    reply = wt.filter(F.col("turn_idx") >= 1).select(
        (F.col("vid") - 1).alias("src"), F.col("vid").alias("dst"), F.col("et").alias("t")
    )
    wt_tool = wt.join(tool_v, "tool")
    up = wt_tool.select(F.col("vid").alias("src"), F.col("tvid").alias("dst"), F.col("et").alias("t"))
    down = wt_tool.select(F.col("tvid").alias("src"), F.col("vid").alias("dst"), F.col("et").alias("t"))
    return reply.unionByName(up).unionByName(down), g


def q_temporal_departure_transcript(spark, sf_dir):
    """Latest-departure temporal reachability (operators/temporal.py
    latest_departure): the dual of `temporal_reach_transcript` — how late
    can each turn/tool still start a time-respecting path into the target
    set (the same vid ≡ 0 mod TEMPORAL_SEED_MOD set, now as SINKS). One
    kernel serves both directions via the reverse-and-negate reduction; the
    DuckDB twin spells out the identical reduction. All-integer — exact."""
    from elektra_spark.operators.temporal import latest_departure

    tedges, g = _transcript_temporal_edges(spark)
    targets = g.vertices.filter(F.col("vid") % TEMPORAL_SEED_MOD == 0).select("vid")
    return latest_departure(
        tedges, targets, vertices=g.vertices.select("vid"), max_hops=TEMPORAL_HOPS
    )


TOOL_COOC_MIN_W = 2  # tool pairs must co-occur in ≥ 2 conversations
TOOL_COOC_MAX_CONV_TOOLS = 64  # degenerate-conversation guard (same contract role as PROJ_MAX_BASKET)


def q_tool_funnel_transcript(spark, sf_dir):
    """Tool funnel analysis over the raw transcript payload: for every
    ordered tool pair (A, B), the number of conversations where A is called
    and B is called on a strictly later turn (min-turn(A) < max-turn(B)),
    and the conversion rate against conversations containing A — the
    product-analytics query a conversation corpus answers. Exact integers +
    one ratio; broadcast-scale per-conversation extrema."""
    t = _transcripts(spark, 300).filter(F.col("tool").isNotNull())
    ext = t.groupBy("conv_id", "tool").agg(
        F.min("turn_idx").alias("lo"), F.max("turn_idx").alias("hi")
    )
    with_a = ext.groupBy("tool").agg(F.countDistinct("conv_id").alias("n_a"))
    pairs = (
        ext.select("conv_id", F.col("tool").alias("tool_a"), "lo")
        .join(ext.select("conv_id", F.col("tool").alias("tool_b"), "hi"), "conv_id")
        .filter((F.col("tool_a") != F.col("tool_b")) & (F.col("lo") < F.col("hi")))
        .groupBy("tool_a", "tool_b")
        .agg(F.countDistinct("conv_id").alias("n_convs"))
    )
    return pairs.join(with_a.withColumnRenamed("tool", "tool_a"), "tool_a").select(
        "tool_a",
        "tool_b",
        F.col("n_convs").cast("long").alias("n_convs"),
        F.round(F.col("n_convs").cast("double") / F.col("n_a"), 6).alias("conversion"),
    )


def q_tool_entropy_transcript(spark, sf_dir):
    """Per-conversation tool-usage Shannon entropy: H = −Σ (c/n)·log2(c/n)
    over each conversation's tool-call distribution — the
    workflow-diversity feature (0 = single-tool conversation, high =
    exploratory). ≤ 8 tool kinds per conversation keeps the float sum in
    the commutative-few-terms regime; rounded 1e-6."""
    t = _transcripts(spark, 300).filter(F.col("tool").isNotNull())
    counts = t.groupBy("conv_id", "tool").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("conv_id").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_distinct")
    )
    h = (
        counts.join(tot, "conv_id")
        .select(
            "conv_id",
            "n",
            "n_distinct",
            (
                -(F.col("c").cast("double") / F.col("n"))
                * F.log2(F.col("c").cast("double") / F.col("n"))
            ).alias("term"),
        )
        .groupBy("conv_id", "n", "n_distinct")
        .agg(F.round(F.sum("term"), 6).alias("entropy"))
    )
    return h.select(
        "conv_id", F.col("n").cast("long").alias("n_calls"), F.col("n_distinct").cast("long").alias("n_tools"), "entropy"
    )


def q_tool_cooccurrence_transcript(spark, sf_dir):
    """Tool co-usage graph (operators/projection.py project_bipartite over
    the (conv_id, tool) relation): which tools appear together in the same
    conversation, weighted by co-occurring conversation count — the
    agent-behavior companion of the lineitem copurchase row, straight off
    the raw transcript payload. Same quadratic-hub group guard and
    min-weight contract; string members exercise the projection's
    type-agnostic path (lexicographic a < b canonicalization agrees across
    engines on ASCII tool names)."""
    from elektra_spark.operators.projection import project_bipartite

    tr = _transcripts(spark, 300).filter(F.col("tool").isNotNull())
    return project_bipartite(
        tr.select(F.col("conv_id").alias("src"), F.col("tool").alias("dst")),
        min_weight=TOOL_COOC_MIN_W,
        max_group_size=TOOL_COOC_MAX_CONV_TOOLS,
    )


def q_transcript_salsa(spark, sf_dir):
    """SALSA hubs & authorities (operators/salsa.py) — degree-normalized
    HITS over the same directed transcript edge set: each spread divides by
    the sending endpoint's degree, so a hub's influence no longer grows
    with its fanout (Lempel–Moran's fix to HITS' tyranny-of-the-majority).
    Fixed ``SALSA_ITERS`` synchronous L1-normalized iterations; the DuckDB
    twin unrolls the identical chain with the degree joins."""
    from elektra_spark.operators.salsa import salsa

    g = _transcript_graph(spark)
    return salsa(g.edges, vertices=g.vertices, n_iter=SALSA_ITERS).select(
        "vid", F.round("hub", 8).alias("hub"), F.round("auth", 8).alias("auth")
    )


def q_transcript_hits(spark, sf_dir):
    """HITS hubs & authorities (operators/hits.py) over the *directed*
    transcript edge set (reply vid→vid+1, turn→tool actor): tool actors
    surface as authorities, tool-heavy turns as hubs. Fixed ``HITS_ITERS``
    synchronous L1-normalized iterations; the DuckDB twin unrolls the same
    chain (same shape as the PageRank oracle)."""
    from elektra_spark.operators.hits import hits

    g = _transcript_graph(spark)
    return hits(g.edges, vertices=g.vertices, n_iter=HITS_ITERS).select(
        "vid", F.round("hub", 8).alias("hub"), F.round("auth", 8).alias("auth")
    )


def q_transcript_katz(spark, sf_dir):
    """Katz centrality (operators/katz.py) over the *directed* transcript
    edge set: un-normalized attenuated path-count into each turn/tool
    vertex — the centrality that keeps hub mass undivided (vs PageRank's
    out-degree split). Fixed ``KATZ_ITERS`` synchronous iterations from the
    beta=1 base; the DuckDB twin unrolls the identical chain."""
    from elektra_spark.operators.katz import katz_centrality

    g = _transcript_graph(spark)
    r = katz_centrality(g.edges, vertices=g.vertices, alpha=KATZ_ALPHA, n_iter=KATZ_ITERS)
    return r.select("vid", F.round("katz", 8).alias("katz"))


def q_transcript_eigenvector(spark, sf_dir):
    """Eigenvector centrality (operators/eigenvector.py): L1-normalized
    power iteration over the symmetric transcript adjacency — the plain
    dominant-eigenvector score next to PageRank's damped and Katz's
    attenuated variants. Fixed EIGEN_ITERS iterations; the DuckDB twin
    unrolls the identical chain over the both-directions relation."""
    from elektra_spark.operators.eigenvector import eigenvector_centrality

    g = _transcript_graph(spark)
    r = eigenvector_centrality(g.edges, vertices=g.vertices, n_iter=EIGEN_ITERS)
    return r.select("vid", F.round("score", 8).alias("score"))


def q_transcript_betweenness(spark, sf_dir):
    """Source-restricted hop-bounded Brandes betweenness
    (operators/betweenness.py) pivoted at the 8 tool-actor vertices:
    which turns broker the tool-call traffic. BETWEENNESS_HOPS-truncated
    shortest-path DAGs, per the repo's bounded-BFS/SSSP contract style;
    the DuckDB twin unrolls the identical forward-sigma / backward-delta
    chain."""
    from elektra_spark.operators.betweenness import betweenness

    g = _transcript_graph(spark)
    seeds = g.vertices.filter(F.col("kind") == "tool").select("vid")
    r = betweenness(g.edges, seeds, vertices=g.vertices, max_hops=BETWEENNESS_HOPS)
    return r.select("vid", F.round("bc", 6).alias("bc"))


def q_transcript_ppr(spark, sf_dir):
    """Personalized PageRank (operators/ppr.py): random walk with restart to
    the tool-actor seed set over the transcript link graph — proximity of
    every turn to the tool hubs, the seed-anchored recommendation query.
    Fixed PPR_ITERS supersteps, dangling mass returned to the seeds; the
    DuckDB twin unrolls the identical chain (_ppr_chain)."""
    from elektra_spark.operators.ppr import personalized_pagerank

    g = _transcript_graph(spark)
    seeds = g.vertices.filter(F.col("kind") == "tool").select("vid")
    r = personalized_pagerank(g.edges, seeds, vertices=g.vertices, n_iter=PPR_ITERS)
    return r.select("vid", F.round("rank", 8).alias("rank"))


APPR_ALPHA_PM = 150  # forward-push teleport, permille
APPR_EPS_UNITS = 1000  # frontier threshold: push iff r > 1000·deg nanounits
APPR_ROUNDS = 8  # batch push rounds, part of the operator contract


def q_appr_transcript(spark, sf_dir):
    """Forward-push approximate PPR (operators/appr.py, Andersen–Chung–Lang
    2006) from the tool-actor seeds: frontier-local diffusion in EXACT int64
    nanoprobability units — settled/residual masses, the ε·deg frontier
    test, and the per-round floor remainders are all integers, so the
    frontier (the thing last-ulp float drift would corrupt) is
    engine-exact and total mass conserves to the unit (pytest). The
    O(1/ε)-work sibling of the power-iteration transcript_ppr row."""
    from elektra_spark.operators.appr import appr_push

    g = _transcript_graph(spark)
    seeds = g.vertices.filter(F.col("kind") == "tool").select("vid")
    return appr_push(
        g.edges,
        seeds,
        alpha_permille=APPR_ALPHA_PM,
        eps_units=APPR_EPS_UNITS,
        rounds=APPR_ROUNDS,
    )


def q_appr_sweep_transcript(spark, sf_dir):
    """The COMPLETE ACL local-clustering pipeline: integer forward-push PPR
    (q_appr_transcript) feeding the sweep cut — rank by settled-mass/deg,
    conductance curve, first SWEEP_MAX_PREFIX prefixes. With integer
    p_units the order key divides two exact ints, so even the sweep
    permutation is float-free. This is the theorem end-to-end: push from
    the tool hubs, sweep, and the argmin prefix is the provably
    low-conductance cluster around them."""
    from elektra_spark.operators.sweep import sweep_cut

    g = _transcript_graph(spark)
    scores = q_appr_transcript(spark, sf_dir).select(
        "vid", F.col("p_units").cast("double").alias("rank")
    )
    return sweep_cut(g.edges, scores, max_prefix=SWEEP_MAX_PREFIX)


SWEEP_MAX_PREFIX = 400  # sweep-curve cap, part of the operator contract


def q_sweep_cut_transcript(spark, sf_dir):
    """ACL sweep cut (operators/sweep.py, Andersen–Chung–Lang 2006): the
    full conductance curve of the tool-seeded PPR vector over the transcript
    link graph — rank by ppr/deg, cumulative exact-int vol/cut per prefix,
    φ = cut/min(vol, 2m−vol) rounded 1e-6, first SWEEP_MAX_PREFIX prefixes.
    The local-clustering theorem made queryable: the curve's argmin is the
    provably-low-conductance cluster around the tool hubs. Twin wraps the
    unrolled PPR chain and replays the identical sweep arithmetic."""
    from elektra_spark.operators.sweep import sweep_cut

    g = _transcript_graph(spark)
    return sweep_cut(
        g.edges, q_transcript_ppr(spark, sf_dir), max_prefix=SWEEP_MAX_PREFIX
    )


def q_transcript_bipartite(spark, sf_dir):
    """Per-component bipartiteness (operators/bipartite.py): a component is
    bipartite iff its double cover (vid × parity) splits in two — one run of
    the O(log n) pointer-jumping CC over the 2×-sized cover graph instead of
    a diameter-bounded parity BFS. Tool hubs closing odd turn-chain cycles
    make the transcript graph a genuine mix of verdicts. The DuckDB twin
    runs the equivalent (vid, parity) recursive closure beside the pruned
    CC CTE."""
    from elektra_spark.operators.bipartite import bipartite_components

    g = _transcript_graph(spark)
    return bipartite_components(g.edges, vertices=g.vertices)


def q_transcript_wpr(spark, sf_dir):
    """Edge-weighted PageRank (operators/ppr.py weighted_pagerank): rank
    scatters proportionally to the deterministic vid-derived edge weight
    1 + (src+dst) % 5 (shared with transcript_sssp) — the affinity/
    multiplicity generalization of the uniform kernel. The DuckDB twin
    unrolls the identical pre-normalized-share chain (_wpr_chain)."""
    from elektra_spark.operators.ppr import weighted_pagerank

    g = _transcript_graph(spark)
    r = weighted_pagerank(g.edges, vertices=g.vertices, n_iter=PPR_ITERS)
    return r.select("vid", F.round("rank", 8).alias("rank"))


def q_transcript_sssp(spark, sf_dir):
    """Hop-bounded weighted shortest paths (operators/bfs.py
    weighted_distance): synchronous Bellman–Ford from the tool-actor seeds
    with the deterministic vid-derived weight 1 + (src+dst) % 5 — the
    weighted twin of transcript_bfs ("how *costly* is the nearest tool
    call"). The bound is the operator contract; the DuckDB twin's recursive
    CTE caps at the same SSSP_MAX_HOPS and recomputes the same weight
    expression."""
    from elektra_spark.operators.bfs import weighted_distance

    g = _transcript_graph(spark)
    seeds = g.vertices.filter(F.col("kind") == "tool").select("vid")
    return weighted_distance(g.edges, seeds, vertices=g.vertices, max_hops=SSSP_MAX_HOPS)


def q_transcript_scc(spark, sf_dir):
    """Strongly connected components (operators/scc.py) over the *directed*
    transcript flow graph (ingest/edges.py derive_digraph): reply v→v+1,
    tool-call turn→hub, tool-response hub→next turn. Response edges close
    genuine directed cycles (two calls to one tool make the intervening
    turns + hub mutually reachable), so the decomposition is a real mix of
    multi-vertex cores and singleton chain vertices. FW–BW coloring, both
    passes via the witness-doubling min-reach primitive; the DuckDB twin
    computes textbook mutual reachability from the transitive closure on
    the same n=50 fixture digraph."""
    from elektra_spark.ingest.edges import derive_digraph
    from elektra_spark.operators.scc import strongly_connected_components

    g = derive_digraph(_transcripts(spark, 50))
    return strongly_connected_components(g.edges, vertices=g.vertices)


def q_motifs_transcript(spark, sf_dir):
    """Directed-motif census (operators/motifs.py) — arc reciprocity (one
    reversed-key self-semi-join) plus the two 3-vertex motif counts:
    directed 3-cycles (rotation enumeration ÷ 3) and transitive
    feed-forward triangles (role-pinned, counted once) — over TWO digraphs
    derived from the n=300 fixture, one row each:

    - ``flow``: the turn-level flow digraph (derive_digraph). Its
      reciprocity is structurally ZERO — tool-calling turns sit at odd
      turn_idx only, so ``turn→hub`` and ``hub→turn+1`` arcs can never pair
      up — and the twin asserting exactly 0 pins that parity argument.
    - ``transition``: the tool-transition digraph (consecutive non-null
      tools within a conversation, vids = alphabetical tool rank, self
      loops dropped) — a dense little Markov-structure graph where every
      census field is non-vacuous (18/21 arcs reciprocal at n=300).

    All exact integer aggregates + one rounded ratio; the DuckDB twin
    derives the identical digraphs and enumerates the same ordered
    triples."""
    from pyspark.sql import Window

    from elektra_spark.ingest.edges import derive_digraph
    from elektra_spark.operators.motifs import motif_census

    t = _transcripts(spark, 300)
    flow = motif_census(derive_digraph(t).edges)
    calls = t.filter(F.col("tool").isNotNull()).select("conv_id", "turn_idx", "tool")
    nxt = calls.withColumn(
        "nxt", F.lead("tool").over(Window.partitionBy("conv_id").orderBy("turn_idx"))
    ).filter(F.col("nxt").isNotNull() & (F.col("nxt") != F.col("tool")))
    ranks = (
        calls.select("tool")
        .distinct()
        .withColumn("vid", (F.row_number().over(Window.orderBy("tool")) - 1).cast("long"))
    )
    trans_arcs = (
        nxt.join(ranks.select(F.col("tool"), F.col("vid").alias("src")), "tool")
        .join(
            ranks.select(F.col("tool").alias("nxt"), F.col("vid").alias("dst")), "nxt"
        )
        .select("src", "dst")
        .distinct()
    )
    trans = motif_census(trans_arcs)
    return flow.select(F.lit("flow").alias("graph"), "*").unionByName(
        trans.select(F.lit("transition").alias("graph"), "*")
    )


def q_influence_transcript(spark, sf_dir):
    """Independent-cascade influence spread (operators/influence.py) on the
    n=300 flow digraph via the Kempe–Kleinberg live-edge reduction: one
    deterministic md5-coin draw keeps ~65% of arcs, seeds = vids ≡ 0
    (mod INFLUENCE_SEED_MOD), and the cascade is the DIRECTED multi-source
    reachability of the live subgraph, reported as newly-activated counts
    per round (non-trivial through the full INFLUENCE_ROUNDS horizon at
    these constants). The DuckDB twin replays the identical coin and a
    capped min-hop recursive closure."""
    from elektra_spark.ingest.edges import derive_digraph
    from elektra_spark.operators.influence import influence_spread

    g = derive_digraph(_transcripts(spark, 300))
    seeds = g.vertices.filter(F.col("vid") % INFLUENCE_SEED_MOD == 0).select("vid")
    return influence_spread(
        g.edges, seeds, p_permille=INFLUENCE_P_PERMILLE, max_rounds=INFLUENCE_ROUNDS
    )


ABSORB_ROUNDS = 8  # hitting-probability horizon, part of the operator contract


def q_transcript_absorption(spark, sf_dir):
    """Absorbing random-walk hitting probabilities (operators/absorption.py)
    on the n=300 flow digraph: tool-actor hubs absorbing, h = P(uniform walk
    from each turn performs a tool call within ABSORB_ROUNDS transitions).
    Non-absorbing out-degree is ≤ 2 on this graph (next turn + at most one
    call), and two-term IEEE addition is commutative bit-for-bit, so the
    whole trajectory is exact — the unrolled twin matches without epsilon."""
    from elektra_spark.ingest.edges import derive_digraph
    from elektra_spark.operators.absorption import absorption_probability

    g = derive_digraph(_transcripts(spark, 300))
    absorbing = g.vertices.filter(F.col("kind") == "tool").select("vid")
    return absorption_probability(g.edges, absorbing, g.vertices.select("vid"), rounds=ABSORB_ROUNDS)


RMAT_EDGES = 10_000
RMAT_SCALE = 12  # 4096-vertex id space
HILL_K = 100  # Hill-estimator tail size


def q_rmat_edges(spark, sf_dir):
    """R-MAT synthetic graph source (ingest/rmat.py, Chakrabarti 2004 — the
    Graph500 generator): every edge a pure function of its index via md5
    quadrant draws, so 10^12 edges materialize map-side from spark.range
    with zero input IO and zero shuffle. The twin re-synthesizes the
    identical edge list in SQL."""
    from elektra_spark.ingest.rmat import rmat_edges

    return rmat_edges(spark, n_edges=RMAT_EDGES, scale=RMAT_SCALE)


def q_rmat_degree_hill(spark, sf_dir):
    """Hill power-law tail estimator over the R-MAT out-degree distribution:
    α̂ = [ (1/k) Σ_{i≤k} ln(d_i/d_k) ]⁻¹ on the top-HILL_K degrees under the
    total (degree DESC, src ASC) order — the generator's skew knob made
    measurable (and the degree-profile op a graph engine ships)."""
    from elektra_spark.ingest.rmat import rmat_edges

    e = rmat_edges(spark, n_edges=RMAT_EDGES, scale=RMAT_SCALE)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    w = Window.orderBy(F.col("d").desc(), F.col("src").asc())
    top = deg.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= HILL_K)
    dk = top.filter(F.col("rk") == HILL_K).select(F.col("d").alias("dk"))
    return (
        top.crossJoin(F.broadcast(dk))
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.min("dk").cast("long").alias("d_k"),
            F.round(
                F.count(F.lit(1)) / F.sum(F.log(F.col("d").cast("double") / F.col("dk"))), 6
            ).alias("alpha"),
        )
    )


DENSEST_EPS_PERMILLE = 100  # Bahmani peel slack: threshold 2·1.1·density
DENSEST_SQL_ROUNDS = 6  # the R-MAT instance empties at round 5 (pinned by pytest); round 5 is a no-op


def q_densest_rmat(spark, sf_dir):
    """Parallel densest subgraph (operators/densest.py — Bahmani, Kumar,
    Vazirani, VLDB 2012) on the R-MAT graph: batch-peel every vertex with
    deg ≤ 2(1+ε)·density per round, keep the densest surviving round. All
    decisions are integer comparisons (deg·n·1000 vs 2200·m; best round by
    cross-multiplied densities). The R-MAT hub core is a REAL answer: round
    2's 80-vertex core at density 13.7 vs 4.2 for the whole graph. Twin
    unrolls DENSEST_SQL_ROUNDS rounds."""
    from elektra_spark.ingest.rmat import rmat_edges
    from elektra_spark.operators.densest import densest_subgraph

    e = rmat_edges(spark, n_edges=RMAT_EDGES, scale=RMAT_SCALE)
    return densest_subgraph(e.select("src", "dst"), eps_permille=DENSEST_EPS_PERMILLE)


def q_kcore_copurchase(spark, sf_dir):
    """k-core extraction (operators/kcore.py) on the copurchase projection:
    synchronous degree-peel to the fixpoint, returning surviving vertices
    with their within-core degree. KCORE_K=80 exercises a real cascade at
    sf0.01 (6 peel rounds, 143 vertices removed); the DuckDB twin unrolls
    KCORE_SQL_ROUNDS ≥ peel-depth synchronous rounds (extra rounds are
    no-ops at the fixpoint)."""
    from elektra_spark.operators.kcore import k_core

    return k_core(_copurchase_graph(spark, sf_dir), k=KCORE_K)


def q_coreness_copurchase(spark, sf_dir):
    """Full coreness decomposition (operators/coreness.py) on the copurchase
    projection: iterated neighborhood h-index (Lü et al. 2016) to the exact
    fixpoint = per-vertex core number. The sf0.01 instance converges in 19
    synchronous rounds (core numbers run 42–82); the DuckDB twin unrolls
    CORENESS_SQL_ROUNDS ≥ that depth — the fixpoint is stable, so extra
    rounds are no-ops and any sufficient unroll is exact."""
    from elektra_spark.operators.coreness import coreness

    return coreness(_copurchase_graph(spark, sf_dir))


def q_transcript_forest(spark, sf_dir):
    """Per-component spanning-forest summary: (component, size, n_forest_edges).

    ``n_forest_edges = size − 1`` is the CheckRep forest-size invariant
    (elektra connectivity.h:216-265, test_spanning_tree.h:50-62) checked
    per component against the recursive-CTE CC oracle; the full edge-set
    invariants (forest ⊆ edges, acyclicity) live in tests/test_graph_ops.py.
    """
    from elektra_spark.operators.cc import connected_components
    from elektra_spark.operators.forest import spanning_forest

    g = _transcript_graph(spark)
    forest = spanning_forest(g.edges)
    labels = connected_components(g.edges, vertices=g.vertices)
    sizes = labels.groupBy("component").agg(F.count("*").alias("size"))
    counts = (
        forest.join(labels.withColumnRenamed("vid", "src"), "src")
        .groupBy("component")
        .agg(F.count("*").alias("n_forest_edges"))
    )
    return sizes.join(counts, "component", "left").select(
        "component", "size", F.coalesce("n_forest_edges", F.lit(0)).alias("n_forest_edges")
    )


def q_transcript_text_roundtrip(spark, sf_dir):
    """per-turn text equality invariant surface (input_hint)."""
    from elektra_spark.ingest.edges import derive_graph, reconstruct_transcript_text

    t = _transcripts(spark, 50)
    g = derive_graph(t)
    recon = reconstruct_transcript_text(g.vertices, t)
    return recon.join(t.select("conv_id", "turn_idx", F.col("text").alias("src_text")), ["conv_id", "turn_idx"]).select(
        "conv_id", "turn_idx", (F.col("text") == F.col("src_text")).alias("text_equal")
    )


def q_multimodal_features(spark, sf_dir):
    from elektra_spark.multimodal.binary import extract_features, synth_media

    media = synth_media(spark, n=48, seed=42)
    f = extract_features(media)
    # cast float32 → double before rounding (round() keeps the input type;
    # a float32 result would collect as 1.804687977… instead of 1.804688)
    return f.select(
        "media_id", "kind", "n_bytes",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
    )


def q_wav_features(spark, sf_dir):
    """REAL codec path (VERDICT r4 ask #6): decode_wav is a genuine RIFF
    chunk walker + PCM16 decoder in pure NumPy; the payloads are valid WAV
    files whose samples are a pure integer function of (media_id, frame),
    so the DuckDB twin reproduces the decoded features exactly."""
    from elektra_spark.multimodal.binary import extract_wav_features, synth_wav_media

    media = synth_wav_media(spark, n=48, seed=42)
    f = extract_wav_features(media)
    return f.select(
        "media_id", "sample_rate", "n_channels", "n_samples", "duration_ms",
        "peak", F.round("mean_abs", 6).alias("mean_abs"),
    )


def q_bmp_features(spark, sf_dir):
    """Second REAL codec path: decode_bmp genuinely parses the BMP container
    (row padding, BGR order, bottom-up AND top-down storage) over valid
    24-bit payloads whose pixels are a pure integer function of
    (media_id, y, x, channel); the DuckDB twin recomputes the channel means
    from that formula."""
    from elektra_spark.multimodal.binary import extract_bmp_features, synth_bmp_media

    media = synth_bmp_media(spark, n=48, seed=42)
    f = extract_bmp_features(media)
    return f.select(
        "media_id", "width", "height", "n_pixels",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


def q_ann_lsh_docs(spark, sf_dir):
    from elektra_spark.sim.ann import cosine_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    return cosine_topk_lsh(emb, queries, k=5)


def q_near_duplicates_docs(spark, sf_dir):
    from elektra_spark.dedup.ngram import near_duplicates

    docs = _t(spark, sf_dir, "documents")
    return near_duplicates(docs, threshold=0.2, n_hashes=8, bands=4, shingle_n=2).select(
        "a", "b", F.round("jaccard", 6).alias("jaccard")
    )


PPJOIN_TAU_PERMILLE = 100  # J ≥ 0.1: 135 pairs at sf0.01, 110 of them below the LSH row's 0.2


def q_similarity_join_docs(spark, sf_dir):
    """EXACT set-similarity join via prefix filtering (dedup/ppjoin.py,
    PPJoin family): every doc pair with bigram-shingle Jaccard ≥ 0.1,
    decided in pure integer arithmetic. The complete-dedup counterpart of
    the probabilistic near_duplicates_docs row; the twin brute-forces all
    token-sharing pairs — no prefix filter — so the contract checks the
    pruning against the definition."""
    from elektra_spark.dedup.ppjoin import similarity_join

    return similarity_join(_t(spark, sf_dir, "documents"), tau_permille=PPJOIN_TAU_PERMILLE)


CONTAIN_TAU_PERMILLE = 500  # b contains a when half of a's shingles appear in b


def q_containment_join_docs(spark, sf_dir):
    """EXACT containment join (dedup/ppjoin.py containment_join): ordered
    pairs where ≥ 50% of a's bigram shingles appear in b — the asymmetric
    dedup measure Jaccard misses (short doc swallowed by a long one).
    Prefix filter on the contained side; integer decisions; brute-force
    twin with no prefix filter."""
    from elektra_spark.dedup.ppjoin import containment_join

    return containment_join(_t(spark, sf_dir, "documents"), tau_permille=CONTAIN_TAU_PERMILLE)


RECALL_TAU_PERMILLE = 100  # measure the 0.2-tuned banding at J ≥ 0.1


def q_dedup_recall_docs(spark, sf_dir):
    """Approximation-quality measurement: the LSH near-dup path (8 hashes ×
    4 bands, tuned for J ≥ 0.2) evaluated against the EXACT prefix-filtered
    similarity join at J ≥ 0.1 — verified LSH pairs are a subset of the
    exact pairs by construction (precision 1), so the row reports the
    interesting number: measured recall of banding below its design point.
    Both sides of the ratio are oracle-twinned operators composed."""
    from elektra_spark.dedup.ngram import near_duplicates
    from elektra_spark.dedup.ppjoin import similarity_join

    docs = _t(spark, sf_dir, "documents")
    exact = similarity_join(docs, tau_permille=RECALL_TAU_PERMILLE).select("a", "b")
    lsh = near_duplicates(
        docs, threshold=RECALL_TAU_PERMILLE / 1000, n_hashes=8, bands=4, shingle_n=2
    ).select("a", "b")
    n_exact = exact.count()
    n_lsh = lsh.count()
    n_common = lsh.join(exact, ["a", "b"], "left_semi").count()
    # half-away rounding (SQL round semantics — python round() is banker's)
    recall = int(n_common / n_exact * 1e6 + 0.5) / 1e6 if n_exact else 0.0
    return docs.sparkSession.createDataFrame(
        [(n_exact, n_lsh, n_common, recall)],
        "n_exact long, n_lsh long, n_common long, recall double",
    )


def q_dup_clusters_docs(spark, sf_dir):
    """Duplicate-cluster resolution (dedup/clusters.py): the verified
    near-duplicate pairs of ``near_duplicates_docs`` become an undirected
    similarity graph, connected components pick the min-doc_id canonical
    keeper per cluster (similarity is not transitive — pairwise keep/drop
    over chains A~B~C is wrong), and every doc gets (cluster, keep). The
    DuckDB twin recomputes the identical pair set and closes it with the
    pruned recursive CC CTE."""
    from elektra_spark.dedup.clusters import duplicate_clusters

    docs = _t(spark, sf_dir, "documents")
    return duplicate_clusters(docs, threshold=0.2, n_hashes=8, bands=4, shingle_n=2)


def _dup_clusters_sql() -> str:
    """Twin of q_dup_clusters_docs: the near_duplicates pair query nested as
    a CTE, closed by the same pruned recursive min-label CC the transcript
    CC oracles use (label l crosses an edge only while l < dst)."""
    return f"""WITH RECURSIVE pairs AS (
    SELECT a, b FROM ({_near_duplicates_sql()}) t
  ),
  verts AS (SELECT doc_id AS vid FROM documents),
  b AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b AS src, a AS dst FROM pairs),
  r(vid, label) AS (
    SELECT vid, vid FROM verts
    UNION
    SELECT b.dst, r.label FROM r JOIN b ON b.src = r.vid WHERE r.label < b.dst
  ),
  cc AS (SELECT vid, min(label) AS component FROM r GROUP BY vid)
  SELECT vid AS doc_id, component AS cluster, (vid = component) AS keep FROM cc"""


def _ngram_cte(n: int) -> str:
    """toks/sh/ex CTE chain: documents → exploded word n-grams, with the
    shingle helper's exact semantics (dedup/minhash.py shingles — empty
    text → no grams, docs shorter than n → one clamped window)."""
    return f"""toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM documents
  ), sh AS (
    SELECT doc_id,
           CASE WHEN len(tk) = 0 THEN []::VARCHAR[]
                ELSE list_transform(generate_series(0, greatest(len(tk) - {n}, 0)),
                                    i -> array_to_string(tk[i + 1 : i + {n}], ' '))
           END AS gs
    FROM toks
  ), ex AS (SELECT doc_id, unnest(gs) AS ngram FROM sh)"""


def q_repeated_ngrams_docs(spark, sf_dir):
    """Cross-document repeated 3-grams (dedup/ngram.py repeated_ngrams) —
    the Lee-et-al. substring-dedup signal: boilerplate n-grams appearing in
    ≥ 2 distinct docs, with doc- and occurrence-counts. One combinable
    shuffle on the n-gram key; the DuckDB twin unnests the same shingle
    windows (identical clamped tail semantics for short docs)."""
    from elektra_spark.dedup.ngram import repeated_ngrams

    docs = _t(spark, sf_dir, "documents")
    return repeated_ngrams(docs, n=3, min_docs=2)


def q_decontaminate_docs(spark, sf_dir):
    """Benchmark decontamination (dedup/ngram.py decontaminate): eval set =
    every 25th doc; every remaining training doc is scored by the distinct
    3-grams it shares with ANY eval doc (broadcast semi-join against the
    eval n-gram set) and flagged. Zero-overlap docs still appear (left
    join), so the output is a complete keep/drop assignment."""
    from elektra_spark.dedup.ngram import decontaminate

    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 25 == 0)
    return decontaminate(docs, ev, n=3)


def q_bloom_decontaminate_docs(spark, sf_dir):
    """Bloom-filter decontamination (dedup/bloom.py) — the broadcast-bitmap
    scale path beside `decontaminate_docs`'s exact semi-join: the same
    eval split (every 25th doc) is folded into an m=2^16, k=4 Bloom filter
    whose bits are md5 slices both engines compute identically, so the
    DuckDB twin reproduces the FILTER (set-bit set) bit-for-bit and every
    false positive is the same false positive. One-sided error vs the
    exact path (bloom ⊇ exact, asserted in pytest) is what makes Bloom
    filtering safe at the 10^9-eval-gram scale where the string broadcast
    no longer fits: a negative probe is never contaminated."""
    from elektra_spark.dedup.bloom import bloom_decontaminate

    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 25 == 0)
    return bloom_decontaminate(docs, ev, n=3)


def _bloom_bit_sql(j_expr: str, gram: str) -> str:
    """SQL text of dedup/bloom.py _bit_col — the identical md5-slice bit
    position, mod BLOOM_M_BITS."""
    from elektra_spark.dedup.bloom import BLOOM_M_BITS

    key = f"CAST({j_expr} AS VARCHAR) || ':' || {gram}"
    return f"('0x' || substr(md5({key}), 1, 12))::BIGINT % {BLOOM_M_BITS}"


def _bloom_decontaminate_sql() -> str:
    """Twin of q_bloom_decontaminate_docs: rebuild the identical filter as
    a distinct-bit relation (set semantics == the engine's bitmap by
    construction), then a gram is Bloom-positive iff all BLOOM_K of its
    bit probes land on set bits."""
    from elektra_spark.dedup.bloom import BLOOM_K

    return f"""WITH {_ngram_cte(3)},
  dex AS (SELECT DISTINCT doc_id, ngram FROM ex),
  js AS (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS j),
  bits AS (SELECT DISTINCT {_bloom_bit_sql("j", "ngram")} AS bit
           FROM (SELECT DISTINCT ngram FROM dex WHERE doc_id % 25 = 0) CROSS JOIN js),
  tg AS (SELECT doc_id, ngram FROM dex WHERE doc_id % 25 <> 0),
  pos AS (SELECT tg.doc_id, tg.ngram
          FROM tg CROSS JOIN js
          JOIN bits ON bits.bit = {_bloom_bit_sql("j", "tg.ngram")}
          GROUP BY tg.doc_id, tg.ngram HAVING count(*) = {BLOOM_K}),
  hits AS (SELECT doc_id, count(*) AS n_bloom_hits FROM pos GROUP BY doc_id),
  tr AS (SELECT doc_id FROM documents WHERE doc_id % 25 <> 0)
  SELECT tr.doc_id, coalesce(hits.n_bloom_hits, 0) AS n_bloom_hits,
         coalesce(hits.n_bloom_hits, 0) > 0 AS bloom_contaminated
  FROM tr LEFT JOIN hits USING (doc_id)"""


def q_perplexity_docs(spark, sf_dir):
    """Bigram-LM perplexity scoring (text/lm.py bigram_lm_scores) — the
    CCNet-style LM quality filter re-expressed with integer-count
    probabilities so the model itself is twinned: add-one-smoothed bigram
    trained on the doc_id % 5 == 0 slice, every document scored by
    -avg(ln P) over its bigram occurrences + exp of it, 1e-6 rounding,
    NULL for bigram-less docs. The fourth corpus quality axis beside the
    heuristic profile, repetition signals, and DSIR weights."""
    from elektra_spark.text.lm import bigram_lm_scores

    docs = _t(spark, sf_dir, "documents")
    return bigram_lm_scores(docs, docs.filter(F.col("doc_id") % 5 == 0))


def _perplexity_sql() -> str:
    """Twin of q_perplexity_docs: identical tokenization (the toks CTE),
    identical consecutive-pair derivation, identical integer counts and
    smoothing, ln/exp over the same integer ratios."""
    return """WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM documents
  ),
  bg AS (SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
         FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM toks)),
  lm AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg WHERE doc_id % 5 = 0 GROUP BY w1, w2),
  lm1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM lm GROUP BY w1),
  v AS (SELECT count(DISTINCT t) + 1 AS v
        FROM (SELECT unnest(tk) AS t FROM toks WHERE doc_id % 5 = 0)),
  sc AS (SELECT b.doc_id,
                ln(coalesce(lm.c12, 0) + 1) - ln(coalesce(lm1.c1, 0) + v.v) AS lnp
         FROM bg b LEFT JOIN lm ON b.w1 = lm.w1 AND b.w2 = lm.w2
                   LEFT JOIN lm1 ON b.w1 = lm1.w1
                   CROSS JOIN v),
  agg AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                 round(-avg(lnp), 6) AS cross_entropy,
                 round(exp(-avg(lnp)), 6) AS perplexity
          FROM sc GROUP BY doc_id)
  SELECT documents.doc_id, coalesce(agg.n_bigrams, 0) AS n_bigrams,
         agg.cross_entropy, agg.perplexity
  FROM documents LEFT JOIN agg USING (doc_id)"""


def q_repetition_docs(spark, sf_dir):
    """Gopher-style intra-doc repetition signals (text/analysis.py
    repetition_profile): duplicate-token fraction + top-bigram occupancy per
    document — the quality rules that catch looping/templated text before
    training. Two combinable explode→groupBy chains, no corpus joins."""
    from elektra_spark.text.analysis import repetition_profile

    docs = _t(spark, sf_dir, "documents")
    return repetition_profile(docs)


def _repetition_sql() -> str:
    return f"""WITH {_ngram_cte(2)},
  ex1 AS (SELECT doc_id, unnest(tk) AS t FROM toks),
  tc AS (SELECT doc_id, t, count(*) AS c FROM ex1 GROUP BY doc_id, t),
  d AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS dup_toks,
               sum(c)::BIGINT AS n FROM tc GROUP BY doc_id),
  bgc AS (SELECT doc_id, ngram, count(*) AS c FROM ex GROUP BY doc_id, ngram),
  tb AS (SELECT doc_id, max(c)::BIGINT AS top_bg, sum(c)::BIGINT AS nb FROM bgc GROUP BY doc_id)
  SELECT documents.doc_id,
         coalesce(d.n, 0) AS n_tokens,
         round(coalesce(d.dup_toks / d.n, 0), 6) AS dup_token_frac,
         round(coalesce(tb.top_bg / tb.nb, 0), 6) AS top_bigram_frac
  FROM documents LEFT JOIN d USING (doc_id) LEFT JOIN tb USING (doc_id)"""


def _repeated_ngrams_sql() -> str:
    return f"""WITH {_ngram_cte(3)}
  SELECT ngram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
  FROM ex GROUP BY ngram HAVING count(DISTINCT doc_id) >= 2"""


def _decontaminate_sql() -> str:
    return f"""WITH {_ngram_cte(3)},
  dex AS (SELECT DISTINCT doc_id, ngram FROM ex),
  ev AS (SELECT DISTINCT ngram FROM dex WHERE doc_id % 25 = 0),
  tr AS (SELECT doc_id FROM documents WHERE doc_id % 25 <> 0),
  hits AS (
    SELECT dex.doc_id, count(*) AS n_shared
    FROM dex JOIN ev USING (ngram) WHERE dex.doc_id % 25 <> 0 GROUP BY dex.doc_id
  )
  SELECT tr.doc_id, coalesce(hits.n_shared, 0) AS n_shared,
         coalesce(hits.n_shared, 0) > 0 AS contaminated
  FROM tr LEFT JOIN hits USING (doc_id)"""


# ----------------------------------------------------------- dedup/text/ann
def q_dedup_prefix_docs(spark, sf_dir):
    from elektra_spark.dedup.exact import exact_duplicates

    docs = _t(spark, sf_dir, "documents")
    return exact_duplicates(docs, key=F.substring("text", 1, 24))


def q_streaming_dedup_docs(spark, sf_dir):
    """Streaming exact dedup (elektra_spark/streaming/dedup.py): the SAME
    24-char-prefix key as dedup_prefix_docs, but the corpus arrives as three
    parquet drops consumed one-per-micro-batch; each batch's per-key minima
    MERGE into the winner state table with rep = least(existing, incoming).
    min is commutative/associative/idempotent, so the final assignment is
    delivery-order independent and replay-safe — it hashes against the same
    batch window-min oracle as dedup_prefix_docs (that independence IS the
    contract under test, mirroring streaming_dynamic_orders)."""
    import shutil
    import tempfile
    import time as _time

    from elektra_spark.streaming.dedup import apply_document_stream, dedup_assignments
    from elektra_spark.tables import SnapshotCatalog

    docs = _t(spark, sf_dir, "documents")
    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(tempfile.gettempdir(), f"elektra_stream_dedup_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    drop_dir = os.path.join(base, "docs")
    os.makedirs(drop_dir)
    # three deterministic drops; staggered mtimes pin the file-source order
    # (the result is order-independent — the staggering just makes the
    # micro-batch sequence reproducible for the metrics tables)
    now = _time.time()
    for i in range(3):
        part = docs.filter(F.col("doc_id") % 3 == i).coalesce(1)
        stage = os.path.join(base, f"_stage{i}")
        part.write.mode("overwrite").parquet(stage)
        import glob as _glob

        [pf] = _glob.glob(os.path.join(stage, "part-*.parquet"))
        dest = os.path.join(drop_dir, f"d{i}.parquet")
        shutil.move(pf, dest)
        shutil.rmtree(stage)
        os.utime(dest, (now - 300 + i * 60, now - 300 + i * 60))

    catalog = SnapshotCatalog(spark, os.path.join(base, "wh"))
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string, source string, n_chars long")
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    key = F.substring("text", 1, 24)
    apply_document_stream(
        stream, catalog, os.path.join(base, "ckpt"), key=key
    ).awaitTermination()
    return dedup_assignments(docs, catalog, key=key)


def q_token_cms_stream(spark, sf_dir):
    """Streaming count-min sketch (streaming/cms.py): the corpus arrives as
    three parquet drops consumed one-per-micro-batch, each reduced to its
    own partial sketch and MERGEd insert-only under (batch_id, i, b) —
    additive partials make the accumulated sketch identical to the batch
    sketch, which is why this row hashes against the SAME oracle as
    token_cms_docs (delivery mode must not change the estimates; the
    batch_id keying is what keeps a replayed micro-batch a no-op)."""
    import glob as _glob
    import shutil
    import tempfile
    import time as _time

    from elektra_spark.streaming.cms import apply_token_stream, sketch_from_state
    from elektra_spark.tables import SnapshotCatalog
    from elektra_spark.text.cms import estimates_vs_exact

    docs = _t(spark, sf_dir, "documents")
    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(tempfile.gettempdir(), f"elektra_stream_cms_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    drop_dir = os.path.join(base, "docs")
    os.makedirs(drop_dir)
    now = _time.time()
    for i in range(3):
        part = docs.filter(F.col("doc_id") % 3 == i).coalesce(1)
        stage = os.path.join(base, f"_stage{i}")
        part.write.mode("overwrite").parquet(stage)
        [pf] = _glob.glob(os.path.join(stage, "part-*.parquet"))
        dest = os.path.join(drop_dir, f"d{i}.parquet")
        shutil.move(pf, dest)
        shutil.rmtree(stage)
        os.utime(dest, (now - 300 + i * 60, now - 300 + i * 60))

    catalog = SnapshotCatalog(spark, os.path.join(base, "wh"))
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string, source string, n_chars long")
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    apply_token_stream(
        stream, catalog, os.path.join(base, "ckpt"), width=CMS_WIDTH
    ).awaitTermination()
    return estimates_vs_exact(docs, sketch_from_state(catalog), width=CMS_WIDTH)


def q_minhash_docs(spark, sf_dir):
    from elektra_spark.dedup.minhash import minhash_signature

    docs = _t(spark, sf_dir, "documents")
    return minhash_signature(docs, n_hashes=4, shingle_n=1)


def q_minhash_candidates_docs(spark, sf_dir):
    from elektra_spark.dedup.minhash import lsh_candidate_pairs

    docs = _t(spark, sf_dir, "documents")
    return lsh_candidate_pairs(docs, n_hashes=4, bands=2, shingle_n=1)


def q_simhash_docs(spark, sf_dir):
    from elektra_spark.dedup.simhash import simhash

    return simhash(_t(spark, sf_dir, "documents"))


def q_text_profile_docs(spark, sf_dir):
    from elektra_spark.text.analysis import text_profile

    return text_profile(_t(spark, sf_dir, "documents"))


def q_tfidf_docs(spark, sf_dir):
    """TF-IDF keyword extraction (text/analysis.py tfidf_top_terms): the
    TFIDF_K highest-scoring terms per document under the pinned
    tokenization (lower, split [^a-z]+, len ≥ 3) and smoothed idf
    ln((1+N)/(1+df))+1; per-doc rank on (round(score,6) DESC, term ASC) so
    the cut is total-ordered and engine/oracle agree at the boundary."""
    from elektra_spark.text.analysis import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=TFIDF_K)


BM25_QUERY = ["hash", "join", "vector", "stream"]  # non-vacuous df spread at sf0.01


def q_bm25_docs(spark, sf_dir):
    """BM25 ranked retrieval (text/bm25.py): Okapi idf/tf saturation with the
    Lucene-default idf form, tokenizer shared with tfidf. Per-(doc,term)
    weights are quantized round(w·1e6)::bigint so the per-doc sum over query
    terms is an exact integer — rank order is a total order on ints, no
    float-boundary risk; the twin replays the identical fixed-shape
    expression."""
    from elektra_spark.text.bm25 import bm25_scores

    return bm25_scores(_t(spark, sf_dir, "documents"), BM25_QUERY)


AES_K = 40  # weighted-sample size (sf0.01: 40 of 500 docs — a real cut)


def q_weighted_sample_docs(spark, sf_dir):
    """Efraimidis–Spirakis weighted sampling without replacement
    (text/sampling.py weighted_sample_topk): keep the AES_K docs maximizing
    ln(u)/w with u = md5-uniform of doc_id and w = ws_tokens + 1 — i.e. a
    deterministic token-proportional corpus draw (longer docs
    proportionally likelier, every re-run picks the same set). Key rounded
    1e-9 before ranking; twin replays md5 slice, u denominator and rounding."""
    from elektra_spark.text.analysis import token_count
    from elektra_spark.text.sampling import weighted_sample_topk

    docs = _t(spark, sf_dir, "documents")
    w = token_count(F.coalesce(F.col("text"), F.lit(""))) + F.lit(1)
    return weighted_sample_topk(docs, k=AES_K, weight_col=w).select(
        "doc_id", "sel_weight", "sel_key", "rank"
    )


RRF_CAP = 100  # per-list depth fed to the fusion


def q_hybrid_retrieval_docs(spark, sf_dir):
    """Hybrid retrieval via reciprocal-rank fusion (sim/fusion.py): the BM25
    lexical top-RRF_CAP (query BM25_QUERY) fused with the dense cosine
    top-RRF_CAP against vec_id 0's embedding, rrf = Σ 1/(60+rank). Each
    contribution is one exact IEEE division and a doc sits in ≤ 2 lists, so
    the fused scores are commutative-exact; order (rrf DESC, doc_id) on the
    1e-9-rounded score is total. Twin composes the bm25 twin, the
    ann-brute-style cosine ranking, and the identical fusion arithmetic."""
    from elektra_spark.sim.fusion import rrf_fuse
    from elektra_spark.sim.ivf import _dot
    from elektra_spark.text.bm25 import bm25_scores

    bm = (
        bm25_scores(_t(spark, sf_dir, "documents"), BM25_QUERY)
        .filter(F.col("rank") <= RRF_CAP)
        .select("doc_id", "rank")
    )
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    sim = F.round(
        _dot(F.col("qv"), F.col("v"))
        / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("v"), F.col("v")))),
        6,
    )
    wd = Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    dense = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(wd).cast("long"))
        .filter(F.col("rank") <= RRF_CAP)
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )
    return rrf_fuse([bm, dense])


def q_token_stats_docs(spark, sf_dir):
    """Token counting for pipeline budgeting: whitespace tokens plus the
    BPE-ish subword estimate (GPT-2-style pre-tokenization + ceil(L/4)
    letter-run subwords — elektra_spark.text.analysis.bpe_token_count)."""
    from elektra_spark.text.analysis import bpe_token_count, token_count

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    bpe = bpe_token_count(t)
    return docs.select(
        "doc_id",
        token_count(t).cast("long").alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(F.length(t) / F.greatest(bpe, F.lit(1)), 6).alias("chars_per_bpe_token"),
    )


CMS_WIDTH = 64  # << the ~60-word synthetic vocab forces real collisions → non-vacuous overestimates


def q_token_cms_docs(spark, sf_dir):
    """Count-min sketch token frequencies (text/cms.py, Cormode &
    Muthukrishnan 2005): every distinct token's exact corpus count next to
    its CMS_D×CMS_WIDTH sketch estimate (est >= true by construction; the
    narrow width makes collisions — and therefore real overestimates —
    visible at sf0.01)."""
    from elektra_spark.text.cms import token_cms

    docs = _t(spark, sf_dir, "documents")
    return token_cms(docs, width=CMS_WIDTH)


PACK_CONTEXT_LEN = 512  # ~25 bins over the 500-doc sf0.01 corpus; many docs straddle a boundary


def q_pack_sequences_docs(spark, sf_dir):
    """Concat-and-chunk sequence packing (text/packing.py): where every doc
    lands when the corpus is concatenated in doc_id order and split into
    PACK_CONTEXT_LEN-token training windows. The global token prefix sum is
    the hierarchical two-level scan (range partition → pid-local window →
    K broadcast bases) — no single-partition exchange."""
    from elektra_spark.text.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    return pack_sequences(docs, context_len=PACK_CONTEXT_LEN)


DSIR_TARGET_LANG = "en"  # target subset for the importance weights (218/500 sf0.01 docs)


def q_dsir_weights_docs(spark, sf_dir):
    """DSIR-lite importance weights (text/dsir.py, Xie et al. NeurIPS 2023):
    per-document log-likelihood ratio of the lang='en' target distribution
    vs the raw corpus over md5-bucketed unigrams. Two shuffles total; the
    1024-row log-ratio table broadcasts back."""
    from elektra_spark.text.dsir import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    return dsir_weights(docs, target=F.col("lang") == DSIR_TARGET_LANG)


# deterministic PII enrichment for the tagger contract row: the synthetic
# corpus contains no PII-shaped strings (word-soup text), so the row tags an
# AUGMENTED copy — every doc gains an email, every 3rd an IPv4, every 5th a
# phone, all derived from doc_id. Both engines build the identical string;
# the operator itself (text/patterns.py) is data-independent and separately
# pytest-covered on crafted real-shaped strings.
def _pii_augment_spark() -> F.Column:
    return F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact doc"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"), F.lit(".0.1")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" call +1-555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
    )


_PII_AUGMENT_SQL = (
    "coalesce(text, '') || ' contact doc' || doc_id::VARCHAR || '@example.com'"
    " || CASE WHEN doc_id % 3 = 0 THEN ' from 10.' || (doc_id % 256)::VARCHAR || '.0.1' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END"
)


def q_pii_scan_docs(spark, sf_dir):
    """Dolma-style PII tagger + redaction (text/patterns.py): span counts for
    email/IPv4/phone patterns plus the md5 fingerprint of the redacted text,
    over the deterministically PII-augmented corpus (see _pii_augment_spark).
    Pure JVM regex expressions — fuses into the scan, zero shuffles."""
    from elektra_spark.text.patterns import pattern_tags

    docs = _t(spark, sf_dir, "documents")
    return pattern_tags(docs.select("doc_id", _pii_augment_spark().alias("text")))


def q_lang_stats_docs(spark, sf_dir):
    """Relational aggregate surface. avg is derived from exact integer
    sum/count (identical double division in both engines) instead of
    ``avg()``, whose streaming-mean accumulation order differs between
    engines at the last bit and flips round() at 1e-6 boundaries."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
    ).select(
        "lang",
        "n_docs",
        F.round(F.col("total_chars").cast("double") / F.col("n_docs"), 6).alias("avg_chars"),
        "total_chars",
        "total_tokens",
    )


VOCAB_STEPS = [50, 100, 150, 200, 300, 400, 500]  # doc-count checkpoints (sf0.01: 500 docs)


def q_vocab_growth_docs(spark, sf_dir):
    """Heaps-law vocabulary growth: distinct-token vocabulary size after the
    first N documents (doc_id order), for the VOCAB_STEPS checkpoints —
    the curve that sizes a tokenizer/vocab budget. Exact integers; the
    Spark plan computes each token's FIRST doc (one aggregation) and then
    one count per checkpoint, instead of re-scanning per step."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), "[^a-z]+"),
                    lambda t: F.length(t) >= 1,
                )
            )
        ).alias("tok"),
    )
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    steps = docs.sparkSession.createDataFrame([(n,) for n in VOCAB_STEPS], "n_docs long")
    return (
        first.crossJoin(F.broadcast(steps))
        .filter(F.col("first_doc") < F.col("n_docs"))
        .groupBy("n_docs")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )


def q_length_deciles_docs(spark, sf_dir):
    """Exact per-language length deciles (type-1 discrete quantile: the
    value at rank ⌈d·n/10⌉ under the total (n_chars, doc_id) order) — the
    corpus length profile a packing/budget pass consumes. All integer: no
    interpolation, no approx-percentile sketch, engine-exact."""
    docs = _t(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    ranked = docs.withColumn("rk", F.row_number().over(w))
    n = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    decs = ranked.sparkSession.range(1, 10).select(F.col("id").cast("long").alias("decile"))
    return (
        ranked.join(n, "lang")
        .crossJoin(F.broadcast(decs))
        .filter(F.col("rk") == F.floor((F.col("decile") * F.col("n_docs") + 9) / 10))
        .select("lang", "decile", "n_docs", F.col("n_chars").alias("q_chars"))
    )


def q_corpus_sample_docs(spark, sf_dir):
    """Deterministic corpus re-mix (text/sampling.py): md5-Bernoulli thinning
    at SAMPLE_RATE (zero-shuffle map-side filter) followed by a per-language
    quota of the SAMPLE_QUOTA md5-smallest doc_ids (one shuffle on lang).
    The pick is a pure function of the data — the DuckDB twin replays the
    identical hash comparisons, so the sampled id set matches exactly."""
    from elektra_spark.text.sampling import hash_sample, stratified_quota_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    thinned = hash_sample(docs, "doc_id", SAMPLE_RATE)
    return stratified_quota_sample(thinned, "lang", SAMPLE_QUOTA, "doc_id")


def q_corpus_budget_docs(spark, sf_dir):
    """Weight-budget corpus mix (text/sampling.py weight_budget_sample): per
    language, keep the md5-order greedy prefix of documents whose inclusive
    running n_chars sum stays ≤ CHAR_BUDGET — the "N tokens of each
    language" mixing primitive. One shuffle on lang; the DuckDB twin replays
    the identical ROWS-framed running sum."""
    from elektra_spark.text.sampling import weight_budget_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return weight_budget_sample(docs, "lang", CHAR_BUDGET, "n_chars", "doc_id")


def q_corpus_sample_stream(spark, sf_dir):
    """Streaming expression of the stratified quota sampler
    (streaming/sampling.py): a custom stateful operator via
    ``applyInPandasWithState`` holds each language's SAMPLE_QUOTA
    md5-smallest doc_ids as a min-k lattice state, fed by a file-source
    stream of the documents table split across micro-batches. The drained
    winner snapshot must equal the batch rank — the DuckDB twin is the
    plain per-language rank over the full table."""
    import shutil
    import tempfile

    from elektra_spark.streaming.sampling import drain_quota_winners, streaming_quota_sample

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(tempfile.gettempdir(), f"elektra_stream_sample_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "docs")
    spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang").repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, lang string").option("maxFilesPerTrigger", 1).parquet(src)
    )
    winners = streaming_quota_sample(stream, "lang", SAMPLE_QUOTA, "doc_id")
    rows = [(k, s) for s, k in drain_quota_winners(winners, os.path.join(base, "ckpt"))]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def q_weighted_sample_stream(spark, sf_dir):
    """Streaming expression of the A-ES weighted sampler
    (streaming/sampling.py streaming_weighted_sample): the top-AES_K
    exponential-race winners held as a max-k lattice state fed by a
    file-source stream of the documents table across micro-batches; the
    drained snapshot must equal the batch draw — the twin is the batch
    weighted_sample twin projected to (doc_id, sel_key)."""
    import shutil
    import tempfile

    from elektra_spark.streaming.sampling import drain_aes_winners, streaming_weighted_sample
    from elektra_spark.text.analysis import token_count

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(tempfile.gettempdir(), f"elektra_stream_aes_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "docs")
    spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string").option("maxFilesPerTrigger", 1).parquet(src)
    )
    w = token_count(F.coalesce(F.col("text"), F.lit(""))) + F.lit(1)
    winners = streaming_weighted_sample(stream, k=AES_K, weight_col=w, key_col="doc_id")
    rows = drain_aes_winners(winners, os.path.join(base, "ckpt"))
    return spark.createDataFrame(rows, "doc_id long, sel_key double")


def q_chunk_docs(spark, sf_dir):
    """Document chunking (text/chunking.py): overlapping CHUNK_SIZE-char
    windows every CHUNK_STRIDE chars — flat-map column algebra, zero
    shuffles. The contract hash pins byte-for-byte chunk-text equality
    against DuckDB's generate_series + substr twin."""
    from elektra_spark.text.chunking import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, size=CHUNK_SIZE, stride=CHUNK_STRIDE)


def q_passage_dedup_docs(spark, sf_dir):
    """Passage-level exact dedup with reconstruction (dedup/passages.py,
    Lee et al. ACL 2022's ExactSubstr granularity as aligned PASSAGE_TOKENS
    windows): repeated passages keep only their min-(doc_id, pidx)
    occurrence; cleaned text is re-joined byte-exactly. Winner election is
    a combinable min-struct groupBy on the passage hash — boilerplate-hot
    hashes never serialize on one reducer."""
    from elektra_spark.dedup.passages import passage_dedup

    return passage_dedup(_t(spark, sf_dir, "documents"), window_tokens=PASSAGE_TOKENS)


def q_boilerplate_docs(spark, sf_dir):
    """CCNet-style boilerplate line removal (dedup/lines.py): drop every
    line repeated across ≥ BOILER_MIN_DOCS distinct documents, reassemble
    byte-exactly. The documents fixture is single-line prose, so the line
    model is derived deterministically: line 0 is a per-source template
    header (``'SOURCE: ' || source`` — the fixture's stand-in for the site
    chrome CCNet strips; 25 docs share each source at sf0.01, so headers
    bind the threshold) and lines 1.. are aligned BOILER_LINE_TOKENS-token
    chunks of the body (which stay unique and must survive untouched). The
    DuckDB twin derives the identical lines and replays the identical
    frequency filter — clean_text matches as raw string equality.

    Contrast with `passage_dedup_docs`: that keeps the FIRST occurrence of
    a repeated span; boilerplate removal drops ALL occurrences past the
    frequency threshold — the CCNet semantics (Wenzek et al., LREC 2020)."""
    from elektra_spark.dedup.lines import strip_boilerplate

    w = BOILER_LINE_TOKENS
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    header = docs.select(
        "doc_id",
        F.lit(0).alias("line_idx"),
        F.concat(F.lit("SOURCE: "), F.col("source")).alias("line"),
    )
    body = (
        docs.withColumn("toks", toks)
        .withColumn(
            "chunks",
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.ceil(F.size("toks") / w).cast("int"), F.lit(1)) - 1,
                ),
                lambda g: F.array_join(F.slice(F.col("toks"), g * w + 1, w), " "),
            ),
        )
        .select("doc_id", F.posexplode("chunks").alias("pos", "line"))
        .select("doc_id", (F.col("pos") + 1).alias("line_idx"), "line")
    )
    return strip_boilerplate(header.unionByName(body), min_docs=BOILER_MIN_DOCS)


def q_corpus_filter_docs(spark, sf_dir):
    """End-to-end training-corpus curation — the pipeline the individual ops
    exist for, composed: quality gate (≥ 0.5), exact dedup (keep the min
    doc_id per token-normalized md5 fingerprint), near-dup drop (the higher
    id of every MinHash-LSH-verified Jaccard ≥ 0.2 pair), then the surviving
    per-language document counts and BPE token budget. All three filters are
    conjunctive on the raw sets, so the composed DuckDB twin replays them
    exactly."""
    from elektra_spark.dedup.ngram import near_duplicates
    from elektra_spark.text.analysis import bpe_token_count, text_profile

    docs = _t(spark, sf_dir, "documents")
    prof = text_profile(docs)
    rep = prof.withColumn("rep", F.min("doc_id").over(Window.partitionBy("fp")))
    nd_drop = (
        near_duplicates(docs, threshold=0.2, n_hashes=8, bands=4, shingle_n=2)
        .select(F.col("b").alias("doc_id"))
        .distinct()
    )
    kept = (
        rep.filter(F.col("quality") >= 0.5)
        .filter(F.col("doc_id") == F.col("rep"))
        .join(nd_drop, "doc_id", "left_anti")
        .select("doc_id", "lang_pred")
    )
    toks = docs.select("doc_id", bpe_token_count(F.col("text")).alias("bpe_tokens"))
    return (
        kept.join(toks, "doc_id")
        .groupBy("lang_pred")
        .agg(F.count("*").alias("n_docs"), F.sum("bpe_tokens").alias("total_bpe_tokens"))
    )


def q_ann_topk_docs(spark, sf_dir):
    from elektra_spark.sim.ann import cosine_topk_sql_style

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    return cosine_topk_sql_style(emb, queries, k=5)


def q_ann_topk_brute_docs(spark, sf_dir):
    """The scale ANN path (broadcast queries + per-partition BLAS matmul +
    local top-k) checked against the same oracle as the SQL-style variant:
    ranking on round(sim, 6) with nbr tiebreak pins the order against float
    summation-order differences between BLAS and the SQL oracle."""
    from elektra_spark.sim.ann import cosine_topk_brute

    emb = _t(spark, sf_dir, "embeddings")
    qpdf = (
        emb.filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector"))
        .toPandas()
    )
    return cosine_topk_brute(emb, qpdf, k=5, rank_round=6)


def _ivf_sample(sf_dir: str) -> list:
    """Deterministic training sample for the IVF coarse quantizer: the
    ``vec_id < 64`` slice in vec_id order — at scale this is a pushed-down
    sample scan, never the full table."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    rows = sorted(
        (i, v) for i, v in zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()) if i < 64
    )
    return [v for _, v in rows]


IVF_K, IVF_ITERS, IVF_NPROBE = 8, 5, 2
SEMDEDUP_TAU = 0.4  # cosine prune threshold; drops 19/500 sf0.01 vectors (0.5 is vacuous, 0.3 drops 40%)


def q_ann_ivf_docs(spark, sf_dir):
    """IVF ANN — the k-means-bucketed scale path: centroids trained by
    deterministic Lloyd on a pushed-down sample, corpus bucketed by nearest
    centroid, queries probe their nprobe nearest buckets. The DuckDB twin
    embeds the identical centroid literals and replays assignment, probe
    ranking and top-k exactly."""
    from elektra_spark.sim.ivf import ivf_topk, train_centroids

    emb = _t(spark, sf_dir, "embeddings")
    centroids = train_centroids(_ivf_sample(sf_dir), k=IVF_K, iters=IVF_ITERS)
    queries = emb.filter(F.col("vec_id") < 3)
    return ivf_topk(emb, queries, centroids, k=5, nprobe=IVF_NPROBE)


KMEANS_K = 5
KMEANS_ITERS = 3  # Lloyd update rounds; init = the k lowest-vec_id vectors
KMEANS_DIM = 64  # embeddings fixture dimensionality (all sf dirs)


def q_kmeans_embeddings(spark, sf_dir):
    """Distributed Lloyd k-means over the FULL embeddings table
    (sim/kmeans.py): centroid updates are exact int64 sums of 2^20-quantized
    vectors (order-independent — reproducible under any partitioning), the
    k×d sum matrix collects to the driver, S/n is one IEEE division. The
    DuckDB twin re-derives the whole trajectory independently in SQL — no
    shared literals, unlike the IVF row — and still matches bit-for-bit."""
    from elektra_spark.sim.kmeans import kmeans_assign

    return kmeans_assign(_t(spark, sf_dir, "embeddings"), k=KMEANS_K, iters=KMEANS_ITERS)


FEATPROP_KNN = 3  # neighbors per vector in the propagation graph
FEATPROP_ROUNDS = 2  # (I+A)^2 — two sum-push rounds


def q_feature_prop_embeddings(spark, sf_dir):
    """Graph feature propagation (operators/featprop.py — the SGC
    preprocessing primitive): 2^20-quantized embeddings pushed 2 rounds over
    the symmetrized top-FEATPROP_KNN cosine kNN graph, h' = h + Σ_nbr h in
    exact int64 (order-free, partition-invariant). Long (vid, dim, h)
    layout — the 10^12-vertex sharding. Twin recomputes the kNN graph and
    both rounds in SQL."""
    from elektra_spark.operators.featprop import propagate_features, quantize_features_long
    from elektra_spark.sim.ivf import _dot

    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = e.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    c = e.select(F.col("vec_id").alias("nbr"), F.col("v").alias("cv"))
    sim = F.round(
        _dot(F.col("qv"), F.col("cv"))
        / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))),
        6,
    )
    pairs = (
        a.crossJoin(c).filter(F.col("qid") != F.col("nbr")).select("qid", "nbr", sim.alias("sim"))
    )
    wk = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nbr").asc())
    edges = (
        pairs.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= FEATPROP_KNN)
        .select(
            F.least("qid", "nbr").alias("src"), F.greatest("qid", "nbr").alias("dst")
        )
        .distinct()
    )
    feats = quantize_features_long(emb)
    return propagate_features(feats, edges, rounds=FEATPROP_ROUNDS)


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (dedup-by-embedding): SRP-bucketed
    self-join + exact cosine threshold. The oracle reproduces the same
    buckets, so the approximate candidate set is exactly checkable."""
    from elektra_spark.sim.ann import cosine_near_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_near_pairs(emb, threshold=0.4, n_planes=4)


def q_embedding_stats(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    dot = F.aggregate(F.zip_with(e, e, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v)
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vecs"), F.round(F.avg(F.sqrt(dot)), 6).alias("avg_norm")
    )


def q_events_sessions(spark, sf_dir):
    """Sessionization (30-min inactivity gap) — window-function surface."""
    ev = _t(spark, sf_dir, "events").withColumn("ts_s", F.col("ts").cast("timestamp").cast("long"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts_s") - F.lag("ts_s").over(w)
    sess = ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sess = sess.withColumn("sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    per = sess.groupBy("user_id", "sess_id").agg(F.count("*").alias("n"))
    return per.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.max("n").alias("max_session_events")
    )


def q_events_sessions_stream(spark, sf_dir):
    """Streaming-native sessionization (elektra_spark/streaming/sessions.py):
    watermarked ``session_window`` aggregation over a file-source stream of
    the SAME events table, drained with ``Trigger.AvailableNow``. Emits one
    row per session — (user_id, session_start, session_end = last event +
    gap, n_events, session_value) — against a lag-based DuckDB twin (new
    session only when the gap is strictly > 1800 s, the boundary rule
    test_streaming.py pins against Spark's merge semantics)."""
    import shutil
    import tempfile

    from elektra_spark.streaming.sessions import drain_to_rows, event_sessions

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(tempfile.gettempdir(), f"elektra_stream_sessions_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    ev_dir = os.path.join(base, "events")
    os.makedirs(ev_dir)
    # the file source wants a directory to watch
    shutil.copyfile(f"{sf_dir}/events.parquet", os.path.join(ev_dir, "events.parquet"))
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(ev_dir)
    rows = drain_to_rows(event_sessions(stream), os.path.join(base, "ckpt"))
    return spark.createDataFrame(
        rows,
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, session_value double",
    )


def q_revenue_by_region_status(spark, sf_dir):
    """Star-join aggregate (broadcast dims → fact scan): relational surface."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "o_orderstatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------- SQL twins
def _pr_chain(
    n_iter: int, damping: float, v: str = "v", b: str = "b", deg: str = "deg", start: int = 0
) -> str:
    """Unrolled power-iteration CTE chain generated with the engine's
    schedule. Assumes CTEs ``{v}`` (vid), ``{b}`` (directed src,dst both
    ways), ``{deg}`` (vid,deg), ``nn`` (n), ``r{start}`` (vid,rank) are in
    scope. ``b``/``deg``/``start`` let a second chain continue from an
    earlier chain's output on a DIFFERENT edge set (warm-start-after-update
    twins)."""
    # MATERIALIZED: every r{i} is referenced by d{i+1}, c{i+1} — inlining
    # would re-expand the chain ~3^n_iter times (and re-open base scans per
    # reference); materializing keeps the oracle O(n_iter × |graph|)
    iters = []
    for i in range(start + 1, start + n_iter + 1):
        p = f"r{i - 1}"
        iters.append(
            f""",
  d{i} AS MATERIALIZED (SELECT coalesce(sum(r.rank), 0.0) AS dm FROM {p} r
           LEFT JOIN {deg} ON r.vid = {deg}.vid WHERE {deg}.vid IS NULL),
  c{i} AS MATERIALIZED (SELECT {b}.dst AS vid, sum(r.rank / {deg}.deg) AS contrib
           FROM {b} JOIN {p} r ON {b}.src = r.vid JOIN {deg} ON {deg}.vid = {b}.src
           GROUP BY {b}.dst),
  r{i} AS MATERIALIZED (SELECT {v}.vid,
                  (1 - {damping}) / (SELECT n FROM nn)
                  + {damping} * (coalesce(c.contrib, 0.0) + (SELECT dm FROM d{i}) / (SELECT n FROM nn)) AS rank
           FROM {v} LEFT JOIN c{i} c ON {v}.vid = c.vid)"""
        )
    return "".join(iters)


def _pagerank_sql() -> str:
    """Unrolled power-iteration SQL over the customer-orders link graph."""
    base = f"""
  WITH v AS (SELECT c_custkey AS vid FROM customer
             UNION ALL SELECT {ORDER_VID_OFFSET} + o_orderkey FROM orders),
  e AS (SELECT o_custkey AS src, {ORDER_VID_OFFSET} + o_orderkey AS dst FROM orders),
  b AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
  deg AS (SELECT src AS vid, count(*) AS deg FROM b GROUP BY src),
  nn AS (SELECT count(*)::DOUBLE AS n FROM v),
  r0 AS (SELECT vid, 1.0 / (SELECT n FROM nn) AS rank FROM v)"""
    return base + _pr_chain(PR_ITERS, PR_DAMPING) + f"\n  SELECT vid, round(rank, 6) AS rank FROM r{PR_ITERS}"


def _transcript_tables_sql(n_conversations: int) -> str:
    """CTE block deriving the link graph from the transcript fixture parquet —
    the DuckDB twin of elektra_spark.ingest.edges.derive_graph: conversation
    offsets are prefix sums of conversation lengths under stable conv_id
    order, reply edges are (vid, vid+1), tool edges join the tool-actor
    vertices appended after the turn vid range; edges canonical src<dst,
    deduped, self-loop-free."""
    fx = _transcript_fixture(n_conversations)
    # MATERIALIZED: the unrolled PageRank chain references these CTEs dozens
    # of times; inlining would re-open the fixture parquet per reference and
    # exhaust file descriptors alongside a live Spark JVM
    return f"""
  t AS MATERIALIZED (SELECT conv_id, turn_idx, tool FROM read_parquet('{fx}')),
  cl AS (SELECT conv_id, max(turn_idx) + 1 AS conv_len FROM t GROUP BY conv_id),
  off AS (SELECT conv_id, conv_len,
                 coalesce(sum(conv_len) OVER (ORDER BY conv_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS vid_offset
          FROM cl),
  turns AS (SELECT t.conv_id, t.turn_idx, t.tool,
                   (off.vid_offset + t.turn_idx)::BIGINT AS vid, off.conv_len
            FROM t JOIN off USING (conv_id)),
  nt AS (SELECT sum(conv_len) AS n_turns FROM cl),
  tool_v AS (SELECT ((SELECT n_turns FROM nt) + row_number() OVER (ORDER BY tool) - 1)::BIGINT AS vid, tool
             FROM (SELECT DISTINCT tool FROM t WHERE tool IS NOT NULL)),
  e0 AS (SELECT vid AS src, vid + 1 AS dst FROM turns WHERE turn_idx < conv_len - 1
         UNION ALL
         SELECT turns.vid AS src, tool_v.vid AS dst FROM turns JOIN tool_v USING (tool)),
  edges AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
            FROM e0 WHERE src <> dst),
  verts AS MATERIALIZED (SELECT vid FROM turns UNION ALL SELECT vid FROM tool_v),
  b AS MATERIALIZED (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)"""


_TRANSCRIPT_CC_RECURSIVE = """,
  r(vid, label) AS (
    SELECT vid, vid FROM verts
    UNION
    SELECT b.dst, r.label FROM r JOIN b ON b.src = r.vid WHERE r.label < b.dst
  ),
  cc AS (SELECT vid, min(label) AS component FROM r GROUP BY vid)"""


def _partition_advisor_sql() -> str:
    """Twin of q_partition_advisor_transcript: same edge derivation CTEs,
    same md5 hash bucket, same integral block arithmetic; the vid-space
    size comes from the same verts relation the Spark side counts."""
    from elektra_spark.operators.partition_advisor import edge_cut_advisor_sql

    prefix = (
        _transcript_tables_sql(300).lstrip()
        + ",\n  nv AS (SELECT count(*)::BIGINT AS n FROM verts)"
    )
    return edge_cut_advisor_sql(
        edges_sql="SELECT src, dst FROM edges",
        n_vids="(SELECT n FROM nv)",
        partition_counts=PARTITION_GRID,
        prefix_ctes=prefix,
    )


def _transcript_cc_sql() -> str:
    """Min-vertex connected components via a pruned recursive CTE: a label l
    propagates along an edge only while l < dst, which never blocks the
    component minimum (it is smaller than every other member) but keeps the
    closure far below all-pairs."""
    return (
        "WITH RECURSIVE "
        + _transcript_tables_sql(300).lstrip()
        + _TRANSCRIPT_CC_RECURSIVE
        + "\n  SELECT vid, component FROM cc"
    )


def _transcript_forest_sql() -> str:
    return (
        "WITH RECURSIVE "
        + _transcript_tables_sql(300).lstrip()
        + _TRANSCRIPT_CC_RECURSIVE
        + """
  SELECT component, count(*) AS size, count(*) - 1 AS n_forest_edges
  FROM cc GROUP BY component"""
    )


def _transcript_levels_sql() -> str:
    """Twin of q_transcript_levels: CC via the pruned recursive CTE, then the
    post-push-down level histogram derived from component sizes alone —
    tree edges per component = size − 1 (forest invariant), push-down iff
    size ≤ 2^(top−1), non-tree remainder stays at top."""
    return (
        "WITH RECURSIVE "
        + _transcript_tables_sql(300).lstrip()
        + _TRANSCRIPT_CC_RECURSIVE
        + """,
  sz AS (SELECT component, count(*) AS s FROM cc GROUP BY component),
  ec AS (SELECT cc.component, count(*) AS m
         FROM edges JOIN cc ON edges.src = cc.vid GROUP BY cc.component),
  lv AS (SELECT greatest(1, ceil(log2(greatest(2, count(*)))))::INTEGER AS top FROM verts)
  SELECT ec.component,
         (CASE WHEN sz.s <= (1::BIGINT << (lv.top - 1)) THEN lv.top - 1 ELSE lv.top END)::INTEGER AS level,
         TRUE AS is_tree,
         (sz.s - 1)::BIGINT AS n_edges
  FROM ec JOIN sz USING (component) CROSS JOIN lv
  WHERE sz.s > 1
  UNION ALL
  SELECT ec.component, lv.top AS level, FALSE AS is_tree,
         (ec.m - (sz.s - 1))::BIGINT AS n_edges
  FROM ec JOIN sz USING (component) CROSS JOIN lv
  WHERE ec.m - (sz.s - 1) > 0"""
    )


def _transcript_levels2_sql() -> str:
    """Twin of q_transcript_levels2: small components (size ≤ 2^(top−1)) end
    with tree edges at top−2 and non-tree at top−1; large ones keep both at
    top — all determined by sizes."""
    return (
        "WITH RECURSIVE "
        + _transcript_tables_sql(300).lstrip()
        + _TRANSCRIPT_CC_RECURSIVE
        + """,
  sz AS (SELECT component, count(*) AS s FROM cc GROUP BY component),
  ec AS (SELECT cc.component, count(*) AS m
         FROM edges JOIN cc ON edges.src = cc.vid GROUP BY cc.component),
  lv AS (SELECT greatest(1, ceil(log2(greatest(2, count(*)))))::INTEGER AS top FROM verts)
  SELECT ec.component,
         (CASE WHEN sz.s <= (1::BIGINT << (lv.top - 1)) THEN lv.top - 2 ELSE lv.top END)::INTEGER AS level,
         TRUE AS is_tree,
         (sz.s - 1)::BIGINT AS n_edges
  FROM ec JOIN sz USING (component) CROSS JOIN lv
  WHERE sz.s > 1
  UNION ALL
  SELECT ec.component,
         (CASE WHEN sz.s <= (1::BIGINT << (lv.top - 1)) THEN lv.top - 1 ELSE lv.top END)::INTEGER AS level,
         FALSE AS is_tree,
         (ec.m - (sz.s - 1))::BIGINT AS n_edges
  FROM ec JOIN sz USING (component) CROSS JOIN lv
  WHERE ec.m - (sz.s - 1) > 0"""
    )


def _dynamic_orders_sql() -> str:
    """Twin of q_dynamic_orders: assemble the post-update edge set in SQL
    (original customer-order edges minus every-13th-order deletions, plus the
    order-chain insertions) and solve min-vid CC with the pruned recursive
    CTE — connectivity of the final edge set is op-order independent, so the
    twin needs no MERGE replay."""
    return (
        f"""WITH RECURSIVE
  e0 AS (SELECT o_custkey::BIGINT AS src, ({ORDER_VID_OFFSET} + o_orderkey)::BIGINT AS dst,
                o_orderkey AS o FROM orders),
  adds AS (SELECT ({ORDER_VID_OFFSET} + o1.o_orderkey)::BIGINT AS src,
                  ({ORDER_VID_OFFSET} + o2.o_orderkey)::BIGINT AS dst
           FROM orders o1 JOIN orders o2 ON o2.o_orderkey = o1.o_orderkey + 1
           WHERE o1.o_orderkey % 100 = 0),
  edges AS MATERIALIZED (SELECT src, dst FROM e0 WHERE o % 13 <> 0
           UNION SELECT src, dst FROM adds),
  verts AS MATERIALIZED (SELECT c_custkey::BIGINT AS vid FROM customer
           UNION ALL SELECT ({ORDER_VID_OFFSET} + o_orderkey)::BIGINT FROM orders),
  b AS MATERIALIZED (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)"""
        + _TRANSCRIPT_CC_RECURSIVE
        + "\n  SELECT vid, component FROM cc"
    )


def _densest_rmat_sql() -> str:
    """Twin of q_densest_rmat: the R-MAT edge list re-synthesized, then
    DENSEST_SQL_ROUNDS unrolled Bahmani peel rounds with the identical
    integer threshold, exact cross-multiplied best-round argmax, and the
    same isolated-vertex handling."""
    from elektra_spark.ingest.rmat import rmat_edges_sql

    coef = 2 * (1000 + DENSEST_EPS_PERMILLE)
    parts = [
        f"""
  WITH raw AS MATERIALIZED ({rmat_edges_sql(RMAT_EDGES, RMAT_SCALE)}),
  a0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
      FROM raw WHERE src <> dst),
  v0 AS MATERIALIZED (SELECT DISTINCT vid FROM (
      SELECT src AS vid FROM a0 UNION ALL SELECT dst FROM a0))"""
    ]
    sched = []
    removed = []
    for r in range(DENSEST_SQL_ROUNDS):
        parts.append(
            f""",
  d{r} AS MATERIALIZED (SELECT v.vid, coalesce(c.d, 0) AS d FROM v{r} v LEFT JOIN (
      SELECT src AS vid, count(*) AS d FROM (
        SELECT src, dst FROM a{r} UNION ALL SELECT dst, src FROM a{r}) GROUP BY src) c
      ON c.vid = v.vid),
  nm{r} AS (SELECT (SELECT count(*) FROM v{r}) AS n, (SELECT count(*) FROM a{r}) AS m),
  rm{r} AS MATERIALIZED (SELECT vid FROM d{r}, nm{r} WHERE d * n * 1000 <= {coef} * m),
  v{r + 1} AS MATERIALIZED (SELECT vid FROM v{r} WHERE vid NOT IN (SELECT vid FROM rm{r})),
  a{r + 1} AS MATERIALIZED (SELECT src, dst FROM a{r}
      WHERE src NOT IN (SELECT vid FROM rm{r}) AND dst NOT IN (SELECT vid FROM rm{r}))"""
        )
        sched.append(f"SELECT {r} AS r, n, m FROM nm{r} WHERE n > 0")
        removed.append(f"SELECT vid, {r} AS removed_round FROM rm{r}")
    return (
        "".join(parts)
        + f""",
  sched AS ({" UNION ALL ".join(sched)}),
  best AS (SELECT r FROM sched s1 WHERE NOT EXISTS (
      SELECT 1 FROM sched s2
      WHERE s2.m * s1.n > s1.m * s2.n OR (s2.m * s1.n = s1.m * s2.n AND s2.r < s1.r))),
  removed AS ({" UNION ALL ".join(removed)})
  SELECT vid, removed_round::BIGINT AS removed_round,
         removed_round >= (SELECT r FROM best) AS in_densest
  FROM removed"""
    )


def _ivm_orders_sql() -> str:
    """Twin of q_ivm_orders_agg: the view recomputed from the FINAL row set
    (base minus deletes plus re-filed inserts) — equality with the
    delta-maintained table is the IVM correctness statement."""
    return """
  WITH cents AS (SELECT o_orderstatus AS s, round(o_totalprice * 100)::BIGINT AS c,
                        o_orderkey AS o FROM orders),
  finalrows AS (SELECT s, c FROM cents WHERE o % 13 <> 0
                UNION ALL SELECT 'P', c FROM cents WHERE o % 100 = 0)
  SELECT s AS o_orderstatus, count(*)::BIGINT AS n_rows, sum(c)::BIGINT AS sum_cents
  FROM finalrows GROUP BY s
  """


def _snapshot_changelog_sql() -> str:
    """Twin of q_snapshot_changelog_orders: the schedule's net edge delta
    from first principles — inserts = the order-chain adds (none pre-exist,
    none deleted later), deletes = the every-13th-order base edges."""
    return f"""
  WITH e0 AS (SELECT o_custkey::BIGINT AS src, ({ORDER_VID_OFFSET} + o_orderkey)::BIGINT AS dst,
                     o_orderkey AS o FROM orders),
  adds AS (SELECT DISTINCT ({ORDER_VID_OFFSET} + o1.o_orderkey)::BIGINT AS src,
                  ({ORDER_VID_OFFSET} + o2.o_orderkey)::BIGINT AS dst
           FROM orders o1 JOIN orders o2 ON o2.o_orderkey = o1.o_orderkey + 1
           WHERE o1.o_orderkey % 100 = 0)
  SELECT 'insert' AS change, src, dst FROM adds
  UNION ALL
  SELECT 'delete' AS change, src, dst FROM e0 WHERE o % 13 = 0
  """


def _time_travel_orders_sql() -> str:
    """Twin of q_time_travel_orders: min-vid CC of the PRE-DELETE edge set
    (all original customer-order edges plus the order-chain inserts) — what
    the travelled-to snapshot must equal if time travel is sound."""
    return (
        f"""WITH RECURSIVE
  e0 AS (SELECT o_custkey::BIGINT AS src, ({ORDER_VID_OFFSET} + o_orderkey)::BIGINT AS dst
         FROM orders),
  adds AS (SELECT ({ORDER_VID_OFFSET} + o1.o_orderkey)::BIGINT AS src,
                  ({ORDER_VID_OFFSET} + o2.o_orderkey)::BIGINT AS dst
           FROM orders o1 JOIN orders o2 ON o2.o_orderkey = o1.o_orderkey + 1
           WHERE o1.o_orderkey % 100 = 0),
  edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT src, dst FROM adds),
  verts AS MATERIALIZED (SELECT c_custkey::BIGINT AS vid FROM customer
           UNION ALL SELECT ({ORDER_VID_OFFSET} + o_orderkey)::BIGINT FROM orders),
  b AS MATERIALIZED (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)"""
        + _TRANSCRIPT_CC_RECURSIVE
        + "\n  SELECT vid, component FROM cc"
    )


def _dynamic_levels_orders_sql() -> str:
    """Twin of q_dynamic_levels_orders. Two pruned recursive CCs (post-insert
    and post-delete edge sets); the (level, is_tree) histogram then follows
    from structure alone: tree edges per post-delete component = size − 1
    (forest invariant), tree push-down iff size ≤ 2^(top−1), non-tree
    remainder = edges(C) − (size−1) pushed iff the component lies inside an
    affected post-insert component (affected = components containing a
    deleted edge's src). A post-delete component is inside an affected
    post-insert component iff its min vid (its id) is a member vid."""
    return f"""WITH RECURSIVE
  e0 AS (SELECT o_custkey::BIGINT AS src, ({ORDER_VID_OFFSET} + o_orderkey)::BIGINT AS dst,
                o_orderkey AS o FROM orders),
  adds AS (SELECT ({ORDER_VID_OFFSET} + o1.o_orderkey)::BIGINT AS src,
                  ({ORDER_VID_OFFSET} + o2.o_orderkey)::BIGINT AS dst
           FROM orders o1 JOIN orders o2 ON o2.o_orderkey = o1.o_orderkey + 1
           WHERE o1.o_orderkey % 100 = 0),
  ranked AS (SELECT o_custkey AS c, o_orderkey AS o,
                    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
             FROM orders),
  adds2 AS (SELECT ({ORDER_VID_OFFSET} + a.o)::BIGINT AS src,
                   ({ORDER_VID_OFFSET} + b.o)::BIGINT AS dst
            FROM ranked a JOIN ranked b ON a.c = b.c AND a.rn = 1 AND b.rn = 2
            WHERE a.c % 10 = 0),
  dels AS (SELECT o_custkey::BIGINT AS src, ({ORDER_VID_OFFSET} + o_orderkey)::BIGINT AS dst
           FROM orders WHERE o_orderkey % 13 = 0),
  verts AS MATERIALIZED (SELECT c_custkey::BIGINT AS vid FROM customer
           UNION ALL SELECT ({ORDER_VID_OFFSET} + o_orderkey)::BIGINT FROM orders),
  lv AS (SELECT greatest(1, cast(ceil(log2(greatest(2, count(*)))) AS INT)) AS top FROM verts),
  e1 AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT src, dst FROM adds
       UNION SELECT src, dst FROM adds2),
  e2 AS MATERIALIZED (SELECT src, dst FROM e0 WHERE o % 13 <> 0
       UNION SELECT src, dst FROM adds UNION SELECT src, dst FROM adds2),
  b1 AS MATERIALIZED (SELECT src, dst FROM e1 UNION ALL SELECT dst, src FROM e1),
  r1(vid, label) AS (
    SELECT vid, vid FROM verts
    UNION
    SELECT b1.dst, r1.label FROM r1 JOIN b1 ON b1.src = r1.vid WHERE r1.label < b1.dst
  ),
  cc1 AS MATERIALIZED (SELECT vid, min(label) AS component FROM r1 GROUP BY vid),
  b2 AS MATERIALIZED (SELECT src, dst FROM e2 UNION ALL SELECT dst, src FROM e2),
  r2(vid, label) AS (
    SELECT vid, vid FROM verts
    UNION
    SELECT b2.dst, r2.label FROM r2 JOIN b2 ON b2.src = r2.vid WHERE r2.label < b2.dst
  ),
  cc2 AS MATERIALIZED (SELECT vid, min(label) AS component FROM r2 GROUP BY vid),
  aff AS MATERIALIZED (SELECT DISTINCT c.component FROM cc1 c JOIN dels d ON c.vid = d.src),
  member AS MATERIALIZED (SELECT vid FROM cc1 WHERE component IN (SELECT component FROM aff)),
  sizes2 AS MATERIALIZED (SELECT component, count(*) AS sz FROM cc2 GROUP BY component),
  ecount2 AS (SELECT c.component, count(*) AS ne
              FROM e2 JOIN cc2 c ON e2.src = c.vid GROUP BY c.component),
  comp2 AS (SELECT s.component, s.sz, coalesce(ec.ne, 0) AS ne,
                   s.component IN (SELECT vid FROM member) AS is_member
            FROM sizes2 s LEFT JOIN ecount2 ec USING (component)),
  hist AS (
    SELECT CASE WHEN sz <= power(2, top - 1) THEN top - 1 ELSE top END AS level,
           TRUE AS is_tree, sum(sz - 1) AS n,
           count(*) FILTER (WHERE sz > 1) AS n_comps
    FROM comp2, lv GROUP BY 1
    UNION ALL
    SELECT CASE WHEN is_member THEN top - 1 ELSE top END AS level,
           FALSE AS is_tree, sum(ne - (sz - 1)) AS n,
           count(*) FILTER (WHERE ne - (sz - 1) > 0) AS n_comps
    FROM comp2, lv GROUP BY 1
  )
  SELECT level::INT AS level, is_tree, n::BIGINT AS n_edges, n_comps::BIGINT AS n_components
  FROM hist WHERE n > 0
  """


def _simhash_near_pairs_sql(max_distance: int = 3) -> str:
    """Twin of q_simhash_near_pairs_docs: same simhash bands (generated from
    the same bit layout), band self-join, exact Hamming via bit_count(xor)."""
    from elektra_spark.dedup.simhash import N_BANDS, simhash_sql

    band_union = "\n    UNION ALL\n    ".join(
        f"SELECT doc_id AS id, {i} AS bi, b{i} AS band FROM sig" for i in range(N_BANDS)
    )
    dist = " + ".join(f"bit_count(xor(sa.b{i}, sb.b{i}))" for i in range(N_BANDS))
    return f"""
  WITH sig AS ({simhash_sql("documents")}),
  banded AS (
    {band_union}
  ),
  cand AS (
    SELECT DISTINCT a.id AS a, b.id AS b
    FROM banded a JOIN banded b ON a.bi = b.bi AND a.band = b.band AND a.id < b.id
  ),
  d AS (
    SELECT cand.a, cand.b, ({dist})::BIGINT AS distance
    FROM cand JOIN sig sa ON sa.doc_id = cand.a JOIN sig sb ON sb.doc_id = cand.b
  )
  SELECT a, b, distance FROM d WHERE distance <= {max_distance}
  """


def _transcript_pagerank_sql() -> str:
    base = (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + """,
  deg AS (SELECT src AS vid, count(*) AS deg FROM b GROUP BY src),
  nn AS (SELECT count(*)::DOUBLE AS n FROM verts),
  r0 AS (SELECT vid, 1.0 / (SELECT n FROM nn) AS rank FROM verts)"""
    )
    return (
        base
        + _pr_chain(TRANSCRIPT_PR_ITERS, PR_DAMPING, v="verts")
        + f"\n  SELECT vid, round(rank, 6) AS rank FROM r{TRANSCRIPT_PR_ITERS}"
    )


def _dynamic_pagerank_sql() -> str:
    """Twin of q_dynamic_pagerank_transcript: unrolled chain r1..r10 on the
    original transcript graph, then the updated edge set (same delete rule +
    consecutive-vid shortcut composition) drives r11..r16 from the
    full-precision r10 — warm start, parenthesis for parenthesis."""
    base = (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + """,
  deg AS (SELECT src AS vid, count(*) AS deg FROM b GROUP BY src),
  nn AS (SELECT count(*)::DOUBLE AS n FROM verts),
  r0 AS (SELECT vid, 1.0 / (SELECT n FROM nn) AS rank FROM verts),
  adds AS (SELECT a.src AS src, eb.dst AS dst FROM edges a JOIN edges eb
           ON eb.src = a.dst AND a.dst = a.src + 1 AND eb.dst = eb.src + 1),
  edges2 AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM edges WHERE (src + dst) % 13 <> 0
        UNION ALL SELECT src, dst FROM adds)),
  b2 AS MATERIALIZED (SELECT src, dst FROM edges2 UNION ALL SELECT dst, src FROM edges2),
  deg2 AS (SELECT src AS vid, count(*) AS deg FROM b2 GROUP BY src)"""
    )
    return (
        base
        + _pr_chain(TRANSCRIPT_PR_ITERS, PR_DAMPING, v="verts")
        + _pr_chain(
            DYN_PR_ITERS, PR_DAMPING, v="verts", b="b2", deg="deg2", start=TRANSCRIPT_PR_ITERS
        )
        + f"\n  SELECT vid, round(rank, 6) AS rank FROM r{TRANSCRIPT_PR_ITERS + DYN_PR_ITERS}"
    )


def _ppr_chain(n_iter: int, damping: float) -> str:
    """Unrolled personalized-PageRank CTE chain — same discipline as
    ``_pr_chain`` but teleport/dangling mass returns to the tool-actor seed
    vector ``sv`` (operators/ppr.py semantics, parenthesis-for-parenthesis).
    Assumes CTEs ``verts``, ``b``, ``tool_v`` in scope."""
    base = """,
  deg AS MATERIALIZED (SELECT src AS vid, count(*) AS deg FROM b GROUP BY src),
  ns AS (SELECT count(*)::DOUBLE AS k FROM tool_v),
  sv AS MATERIALIZED (SELECT v.vid,
         CASE WHEN t.vid IS NOT NULL THEN 1.0 / (SELECT k FROM ns) ELSE 0.0 END AS s
       FROM verts v LEFT JOIN tool_v t ON v.vid = t.vid),
  r0 AS MATERIALIZED (SELECT vid, s AS rank FROM sv)"""
    iters = []
    for i in range(1, n_iter + 1):
        p = f"r{i - 1}"
        iters.append(
            f""",
  d{i} AS MATERIALIZED (SELECT coalesce(sum(r.rank), 0.0) AS dm FROM {p} r
           LEFT JOIN deg ON r.vid = deg.vid WHERE deg.vid IS NULL),
  c{i} AS MATERIALIZED (SELECT b.dst AS vid, sum(r.rank / deg.deg) AS contrib
           FROM b JOIN {p} r ON b.src = r.vid JOIN deg ON deg.vid = b.src
           GROUP BY b.dst),
  r{i} AS MATERIALIZED (SELECT sv.vid,
                  (1 - {damping}) * sv.s
                  + {damping} * (coalesce(c.contrib, 0.0) + (SELECT dm FROM d{i}) * sv.s) AS rank
           FROM sv LEFT JOIN c{i} c ON sv.vid = c.vid)"""
        )
    return base + "".join(iters)


def _transcript_ppr_sql() -> str:
    return (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + _ppr_chain(PPR_ITERS, PR_DAMPING)
        + f"\n  SELECT vid, round(rank, 8) AS rank FROM r{PPR_ITERS}"
    )


def _appr_chain_sql() -> str:
    """APPR_ROUNDS unrolled integer push rounds — identical floor arithmetic
    (ap = (r·α)÷1000, share = (r−ap)÷deg, keep = remainder), identical
    frontier test and newcomer admission. Ends with CTE s{APPR_ROUNDS};
    shared by the appr and appr-sweep twins."""
    from elektra_spark.operators.appr import APPR_UNIT

    a = APPR_ALPHA_PM
    chain = []
    for i in range(1, APPR_ROUNDS + 1):
        chain.append(
            f""",
  ac{i} AS (SELECT vid, r, deg FROM s{i - 1} WHERE r > {APPR_EPS_UNITS} * deg AND deg > 0),
  pu{i} AS MATERIALIZED (SELECT vid,
      (r * {a}) // 1000 AS alpha_part,
      (r - (r * {a}) // 1000) // deg AS share,
      r - (r * {a}) // 1000 - ((r - (r * {a}) // 1000) // deg) * deg AS keep
      FROM ac{i}),
  in{i} AS (SELECT b.dst AS vid, sum(pu.share) AS inflow
      FROM b JOIN pu{i} pu ON pu.vid = b.src GROUP BY b.dst),
  s{i} AS MATERIALIZED (
    SELECT s.vid, (s.p + coalesce(pu.alpha_part, 0))::BIGINT AS p,
           ((CASE WHEN pu.vid IS NOT NULL THEN pu.keep ELSE s.r END)
             + coalesce(i.inflow, 0))::BIGINT AS r,
           s.deg
    FROM s{i - 1} s LEFT JOIN pu{i} pu ON pu.vid = s.vid LEFT JOIN in{i} i ON i.vid = s.vid
    UNION ALL
    SELECT i.vid, 0::BIGINT, i.inflow::BIGINT, coalesce(dg.deg, 0)
    FROM in{i} i LEFT JOIN dg ON dg.vid = i.vid
    WHERE i.vid NOT IN (SELECT vid FROM s{i - 1}))"""
        )
    return (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + f""",
  dg AS MATERIALIZED (SELECT src AS vid, count(*) AS deg FROM b GROUP BY src),
  ks AS (SELECT count(*) AS k FROM tool_v),
  s0 AS MATERIALIZED (SELECT t.vid, 0::BIGINT AS p,
      ({APPR_UNIT} // (SELECT k FROM ks))::BIGINT AS r, coalesce(dg.deg, 0) AS deg
      FROM tool_v t LEFT JOIN dg ON dg.vid = t.vid)"""
        + "".join(chain)
    )


def _appr_sql() -> str:
    """Twin of q_appr_transcript — the unrolled integer push chain."""
    return (
        _appr_chain_sql()
        + f"""
  SELECT vid, p AS p_units, r AS r_units FROM s{APPR_ROUNDS} WHERE p + r > 0"""
    )


def _appr_sweep_sql() -> str:
    """Twin of q_appr_sweep_transcript: the push chain, then the sweep over
    settled mass — ratio p::DOUBLE/deg (two exact ints), identical
    cumulative vol/cut arithmetic as the PPR sweep twin."""
    return (
        _appr_chain_sql()
        + f""",
  m2s AS (SELECT sum(deg) AS m2 FROM dg),
  sup2 AS (SELECT s.vid, s.p::DOUBLE / dg.deg AS ratio, dg.deg AS d
           FROM s{APPR_ROUNDS} s JOIN dg ON dg.vid = s.vid WHERE s.p > 0),
  rk2 AS MATERIALIZED (SELECT vid, d, k FROM (
      SELECT vid, d, row_number() OVER (ORDER BY ratio DESC, vid ASC) AS k FROM sup2)
      WHERE k <= {SWEEP_MAX_PREFIX}),
  vol2 AS (SELECT vid, k, d,
                  sum(d) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vol
           FROM rk2),
  km2 AS (SELECT greatest(r1.k, r2.k) AS km, count(*) AS closed
          FROM edges e JOIN rk2 r1 ON r1.vid = e.src JOIN rk2 r2 ON r2.vid = e.dst
          GROUP BY greatest(r1.k, r2.k)),
  cur2 AS (SELECT v.k, v.vid, v.vol,
                  v.vol - 2 * sum(coalesce(km2.closed, 0))
                      OVER (ORDER BY v.k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cut
           FROM vol2 v LEFT JOIN km2 ON km2.km = v.k)
  SELECT k, vid, vol::BIGINT AS vol, cut::BIGINT AS cut,
         round(cut::DOUBLE / least(vol, (SELECT m2 FROM m2s) - vol), 6) AS conductance
  FROM cur2 WHERE vol < (SELECT m2 FROM m2s)"""
    )


def _sweep_cut_sql() -> str:
    """Twin of q_sweep_cut_transcript: the unrolled PPR chain inlined (CTE
    names shared — DuckDB rejects shadowed WITH aliases), then the identical
    sweep — ratio order, cumulative int vol/internal, φ at 1e-6."""
    return (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + _ppr_chain(PPR_ITERS, PR_DAMPING)
        + f""",
  ppr AS MATERIALIZED (SELECT vid, round(rank, 8) AS rank FROM r{PPR_ITERS}),
  m2 AS (SELECT sum(deg) AS m2 FROM deg),
  sup AS (SELECT p.vid, p.rank / deg.deg AS ratio, deg.deg AS d
          FROM ppr p JOIN deg ON deg.vid = p.vid WHERE p.rank > 0),
  rk AS MATERIALIZED (SELECT vid, d, k FROM (
      SELECT vid, d, row_number() OVER (ORDER BY ratio DESC, vid ASC) AS k FROM sup)
      WHERE k <= {SWEEP_MAX_PREFIX}),
  vol AS (SELECT vid, k, d,
                 sum(d) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vol
          FROM rk),
  km AS (SELECT greatest(r1.k, r2.k) AS km, count(*) AS closed
         FROM edges e JOIN rk r1 ON r1.vid = e.src JOIN rk r2 ON r2.vid = e.dst
         GROUP BY greatest(r1.k, r2.k)),
  cur AS (SELECT v.k, v.vid, v.vol,
                 v.vol - 2 * sum(coalesce(km.closed, 0))
                     OVER (ORDER BY v.k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cut
          FROM vol v LEFT JOIN km ON km.km = v.k)
  SELECT k, vid, vol::BIGINT AS vol, cut::BIGINT AS cut,
         round(cut::DOUBLE / least(vol, (SELECT m2 FROM m2) - vol), 6) AS conductance
  FROM cur WHERE vol < (SELECT m2 FROM m2)"""
    )


def _wpr_chain(n_iter: int, damping: float) -> str:
    """Unrolled edge-weighted PageRank chain — twin of operators/ppr.py
    ``weighted_pagerank``: scatter shares pre-normalized once
    (``w / W_out``), the deterministic vid-derived weight 1 + (src+dst) % 5,
    dangling (zero out-weight) mass uniform. Assumes ``verts``, ``b`` in
    scope."""
    base = """,
  wadj AS MATERIALIZED (SELECT src, dst, (1 + (src + dst) % 5)::DOUBLE AS w FROM b),
  wout AS MATERIALIZED (SELECT src AS vid, sum(w) AS wout FROM wadj GROUP BY src),
  adjn AS MATERIALIZED (SELECT wadj.src, wadj.dst, wadj.w / wout.wout AS share
        FROM wadj JOIN wout ON wadj.src = wout.vid),
  nn AS (SELECT count(*)::DOUBLE AS n FROM verts),
  r0 AS MATERIALIZED (SELECT vid, 1.0 / (SELECT n FROM nn) AS rank FROM verts)"""
    iters = []
    for i in range(1, n_iter + 1):
        p = f"r{i - 1}"
        iters.append(
            f""",
  d{i} AS MATERIALIZED (SELECT coalesce(sum(r.rank), 0.0) AS dm FROM {p} r
           LEFT JOIN wout ON r.vid = wout.vid WHERE wout.vid IS NULL),
  c{i} AS MATERIALIZED (SELECT a.dst AS vid, sum(r.rank * a.share) AS contrib
           FROM adjn a JOIN {p} r ON a.src = r.vid GROUP BY a.dst),
  r{i} AS MATERIALIZED (SELECT verts.vid,
                  (1 - {damping}) / (SELECT n FROM nn)
                  + {damping} * (coalesce(c.contrib, 0.0) + (SELECT dm FROM d{i}) / (SELECT n FROM nn)) AS rank
           FROM verts LEFT JOIN c{i} c ON verts.vid = c.vid)"""
        )
    return base + "".join(iters)


def _transcript_wpr_sql() -> str:
    return (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + _wpr_chain(PPR_ITERS, PR_DAMPING)
        + f"\n  SELECT vid, round(rank, 8) AS rank FROM r{PPR_ITERS}"
    )


def _transcript_sssp_sql() -> str:
    """Hop-bounded weighted-shortest-paths twin (operators/bfs.py
    weighted_distance): recursive CTE from the tool-actor seeds over the
    both-directions edge relation, accumulating the deterministic
    vid-derived weight 1 + (src+dst) % 5, recursion capped at exactly
    ``SSSP_MAX_HOPS`` edges (the operator's contract bound). Integer
    weights bound the closure: ≤ (5·hops+1)·(hops+1) distinct
    (dist, hops) states per vertex, so cyclic walks terminate."""
    return (
        "WITH RECURSIVE "
        + _transcript_tables_sql(300).lstrip()
        + f""",
  d(vid, dist, hops) AS (
    SELECT vid, 0::BIGINT, 0 FROM tool_v
    UNION
    SELECT b.dst, d.dist + (1 + (b.src + b.dst) % 5), d.hops + 1
    FROM d JOIN b ON b.src = d.vid WHERE d.hops < {SSSP_MAX_HOPS}
  ),
  md AS (SELECT vid, min(dist) AS dist FROM d GROUP BY vid)
  SELECT v.vid, coalesce(md.dist, -1)::BIGINT AS dist
  FROM verts v LEFT JOIN md USING (vid)"""
    )


def _transcript_widest_sql() -> str:
    """Widest-path twin (operators/bfs.py widest_path): recursive CTE from
    the tool-actor seeds accumulating least(width, w) and keeping the max
    per vertex, capped at SSSP_MAX_HOPS. Width values live in
    {1..5} ∪ {sentinel}, so the closure is finite."""
    from elektra_spark.operators.bfs import WIDEST_SOURCE_W

    return (
        "WITH RECURSIVE "
        + _transcript_tables_sql(300).lstrip()
        + f""",
  d(vid, wd, hops) AS (
    SELECT vid, {WIDEST_SOURCE_W}::BIGINT, 0 FROM tool_v
    UNION
    SELECT b.dst, least(d.wd, (1 + (b.src + b.dst) % 5)::BIGINT), d.hops + 1
    FROM d JOIN b ON b.src = d.vid WHERE d.hops < {SSSP_MAX_HOPS}
  ),
  md AS (SELECT vid, max(wd) AS width FROM d GROUP BY vid)
  SELECT v.vid, coalesce(md.width, -1)::BIGINT AS width
  FROM verts v LEFT JOIN md USING (vid)"""
    )


_SUPPORT_ROUND = """,
  t{i} AS MATERIALIZED (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM e{p} e1 JOIN e{p} e2 ON e1.dst = e2.src
        JOIN e{p} e3 ON e3.src = e1.src AND e3.dst = e2.dst),
  m{i} AS (SELECT a AS src, b AS dst FROM t{i}
           UNION ALL SELECT b, c FROM t{i}
           UNION ALL SELECT a, c FROM t{i}),
  s{i} AS MATERIALIZED (SELECT src, dst, count(*) AS support FROM m{i} GROUP BY src, dst)"""


def _dynamic_triangles_sql() -> str:
    """Twin of q_dynamic_triangles_copurchase: from-scratch triangle counts
    of the pre-insert graph and the full graph; the delta column is their
    difference, pinning the engine's inclusion–exclusion delta."""
    tri = (
        "SELECT count(*) AS n FROM {t} e1 JOIN {t} e2 ON e1.dst = e2.src "
        "JOIN {t} e3 ON e3.src = e1.src AND e3.dst = e2.dst"
    )
    return f"""
  WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
  old AS MATERIALIZED (SELECT src, dst FROM e WHERE (src + dst) % 10 <> 0),
  t_old AS ({tri.format(t="old")}),
  t_all AS ({tri.format(t="e")})
  SELECT t_old.n::BIGINT AS n_triangles_old,
         (t_all.n - t_old.n)::BIGINT AS delta_triangles,
         t_all.n::BIGINT AS n_triangles_total
  FROM t_old, t_all
  """


def _edge_support_sql() -> str:
    """Twin of q_edge_support_copurchase: one triangle fan-out round over
    the full edge set, left-completed so triangle-free edges report 0."""
    return (
        f"""
  WITH e0 AS MATERIALIZED ({_COPURCHASE_SQL})"""
        + _SUPPORT_ROUND.format(i=1, p=0)
        + """
  SELECT e0.src, e0.dst, coalesce(s1.support, 0)::BIGINT AS support
  FROM e0 LEFT JOIN s1 USING (src, dst)
  """
    )


def _truss_sql(k: int, rounds: int) -> str:
    """Unrolled synchronous support-peel twin of operators/truss.py k_truss:
    round i fans triangles of round i−1's surviving edge set out to member
    edges, counts support, drops edges below k−2. ``rounds`` must exceed
    the instance's peel depth (no-op rounds at the fixpoint leave the final
    support relation = within-truss support)."""
    parts = [f"""WITH e0 AS MATERIALIZED ({_COPURCHASE_SQL})"""]
    for i in range(1, rounds + 1):
        parts.append(_SUPPORT_ROUND.format(i=i, p=i - 1))
        parts.append(
            f""",
  e{i} AS MATERIALIZED (SELECT src, dst FROM s{i} WHERE support >= {k - 2})"""
        )
    parts.append(
        f"""
  SELECT src, dst, support::BIGINT AS support FROM s{rounds} WHERE support >= {k - 2}"""
    )
    return "".join(parts)


def _assortativity_sql() -> str:
    """Twin of q_assortativity_copurchase — identical integer power sums,
    identical final-expression parenthesization."""
    return f"""
  WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
  b AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
  d AS (SELECT src AS vid, count(*) AS degree FROM b GROUP BY src),
  xy AS (SELECT dx.degree AS x, dy.degree AS y
         FROM b JOIN d dx ON b.src = dx.vid JOIN d dy ON b.dst = dy.vid),
  a AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
               sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
        FROM xy)
  SELECT n AS n_endpoints,
         round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
               / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                  * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6) AS assortativity
  FROM a
  """


def _transcript_digraph_cte(n_conversations: int) -> str:
    """Shared CTE fragment deriving the directed flow graph from the
    transcript fixture (reply v→v+1, call turn→hub, response hub→v+1 —
    mirroring ingest/edges.py derive_digraph). Ends with ``de`` (distinct,
    self-loop-free arcs) and ``verts``; callers append their own CTEs/body
    (used by the `transcript_scc` and `motifs_transcript` twins)."""
    fx = _transcript_fixture(n_conversations)
    return f"""
  t AS MATERIALIZED (SELECT conv_id, turn_idx, tool FROM read_parquet('{fx}')),
  cl AS (SELECT conv_id, max(turn_idx) + 1 AS conv_len FROM t GROUP BY conv_id),
  off AS (SELECT conv_id, conv_len,
                 coalesce(sum(conv_len) OVER (ORDER BY conv_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS vid_offset
          FROM cl),
  turns AS (SELECT t.conv_id, t.turn_idx, t.tool,
                   (off.vid_offset + t.turn_idx)::BIGINT AS vid, off.conv_len
            FROM t JOIN off USING (conv_id)),
  nt AS (SELECT sum(conv_len) AS n_turns FROM cl),
  tool_v AS (SELECT ((SELECT n_turns FROM nt) + row_number() OVER (ORDER BY tool) - 1)::BIGINT AS vid, tool
             FROM (SELECT DISTINCT tool FROM t WHERE tool IS NOT NULL)),
  de0 AS (SELECT vid AS src, vid + 1 AS dst FROM turns WHERE turn_idx < conv_len - 1
          UNION ALL
          SELECT turns.vid AS src, tool_v.vid AS dst FROM turns JOIN tool_v USING (tool)
          UNION ALL
          SELECT tool_v.vid AS src, turns.vid + 1 AS dst FROM turns JOIN tool_v USING (tool)
          WHERE turns.turn_idx < turns.conv_len - 1),
  de AS MATERIALIZED (SELECT DISTINCT src, dst FROM de0 WHERE src <> dst),
  verts AS MATERIALIZED (SELECT vid FROM turns UNION ALL SELECT vid FROM tool_v)"""


def _transcript_absorption_sql() -> str:
    """Twin of q_transcript_absorption: the identical backward recursion
    unrolled over the derived flow digraph — tool vertices pinned to 1.0,
    turns get sum(successor h)/outdeg (≤ 2 terms → commutative-exact)."""
    chain = []
    for i in range(1, ABSORB_ROUNDS + 1):
        chain.append(
            f""",
  h{i} AS MATERIALIZED (SELECT v.vid,
      CASE WHEN tv.vid IS NOT NULL THEN 1.0
           ELSE coalesce(s.s / outd.deg, 0.0) END AS h
      FROM verts v
      LEFT JOIN (SELECT a.src AS vid, sum(p.h) AS s
                 FROM de a JOIN h{i - 1} p ON p.vid = a.dst GROUP BY a.src) s ON s.vid = v.vid
      LEFT JOIN outd ON outd.vid = v.vid
      LEFT JOIN tool_v tv ON tv.vid = v.vid)"""
        )
    return (
        "WITH"
        + _transcript_digraph_cte(300)
        + """,
  outd AS MATERIALIZED (SELECT src AS vid, count(*) AS deg FROM de GROUP BY src),
  h0 AS (SELECT v.vid, CASE WHEN tv.vid IS NOT NULL THEN 1.0 ELSE 0.0 END AS h
         FROM verts v LEFT JOIN tool_v tv ON tv.vid = v.vid)"""
        + "".join(chain)
        + f"""
  SELECT vid, round(h, 6) AS h FROM h{ABSORB_ROUNDS}"""
    )


def _transcript_scc_sql() -> str:
    """Twin of q_transcript_scc: derive the directed flow graph from the
    n=50 fixture (reply v→v+1, call turn→hub, response hub→v+1 — mirroring
    ingest/edges.py derive_digraph), take the full transitive closure, and
    assign scc = min over mutually reachable vertices. The closure is
    unpruned (mutual reachability needs arbitrary pairs, not just minima),
    which is why this query pins the small fixture."""
    return f"""
WITH RECURSIVE{_transcript_digraph_cte(50)},
  reach(src, dst) AS (
    SELECT src, dst FROM de
    UNION
    SELECT r.src, de.dst FROM reach r JOIN de ON de.src = r.dst
  ),
  mutual AS (SELECT r1.src AS vid, r1.dst AS p
             FROM reach r1 JOIN reach r2 ON r2.src = r1.dst AND r2.dst = r1.src)
  SELECT v.vid, least(v.vid, coalesce(min(m.p), v.vid))::BIGINT AS scc
  FROM verts v LEFT JOIN mutual m ON m.vid = v.vid
  GROUP BY v.vid"""


_MOTIF_CENSUS_BODY = """
  rec_{g} AS (SELECT count(*)::BIGINT AS n_reciprocal_arcs FROM {g} a
          WHERE EXISTS (SELECT 1 FROM {g} b WHERE b.src = a.dst AND b.dst = a.src)),
  na_{g} AS (SELECT count(*)::BIGINT AS n_arcs FROM {g}),
  cyc_{g} AS (SELECT (count(*) // 3)::BIGINT AS n_cyclic_triangles
          FROM {g} e1 JOIN {g} e2 ON e2.src = e1.dst
          JOIN {g} e3 ON e3.src = e2.dst AND e3.dst = e1.src
          WHERE e1.src <> e2.dst),
  ffl_{g} AS (SELECT count(*)::BIGINT AS n_transitive_triangles
          FROM {g} e1 JOIN {g} e2 ON e2.src = e1.dst
          JOIN {g} e3 ON e3.src = e1.src AND e3.dst = e2.dst
          WHERE e1.src <> e2.dst)"""

_MOTIF_CENSUS_ROW = """
  SELECT '{label}' AS graph, na_{g}.n_arcs, rec_{g}.n_reciprocal_arcs,
         round(CASE WHEN na_{g}.n_arcs > 0
               THEN rec_{g}.n_reciprocal_arcs::DOUBLE / na_{g}.n_arcs ELSE 0.0 END, 6) AS reciprocity,
         cyc_{g}.n_cyclic_triangles, ffl_{g}.n_transitive_triangles
  FROM na_{g}, rec_{g}, cyc_{g}, ffl_{g}"""


def _motifs_sql() -> str:
    """Twin of q_motifs_transcript: the shared digraph CTE for the flow
    row, a lead()-window transition derivation for the transition row, then
    textbook enumerations per graph — reciprocal arcs via an EXISTS on the
    reversed pair, directed 3-cycles as ordered rotations divided (integer
    `//`) by 3, feed-forward triangles as role-pinned ordered triples.
    Same integer aggregates, same final rounding as operators/motifs.py."""
    fx = _transcript_fixture(300)
    return (
        f"""
WITH{_transcript_digraph_cte(300)},
  calls AS (SELECT conv_id, turn_idx, tool FROM read_parquet('{fx}') WHERE tool IS NOT NULL),
  s AS (SELECT conv_id, tool, lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt FROM calls),
  ranks AS (SELECT tool, (row_number() OVER (ORDER BY tool) - 1)::BIGINT AS vid
            FROM (SELECT DISTINCT tool FROM calls)),
  te AS MATERIALIZED (SELECT DISTINCT r1.vid AS src, r2.vid AS dst
        FROM s JOIN ranks r1 ON r1.tool = s.tool JOIN ranks r2 ON r2.tool = s.nxt
        WHERE s.nxt IS NOT NULL AND s.nxt <> s.tool),"""
        + _MOTIF_CENSUS_BODY.format(g="de")
        + ","
        + _MOTIF_CENSUS_BODY.format(g="te")
        + _MOTIF_CENSUS_ROW.format(g="de", label="flow")
        + "\n  UNION ALL"
        + _MOTIF_CENSUS_ROW.format(g="te", label="transition")
    )


def _boilerplate_sql() -> str:
    """Twin of q_boilerplate_docs: identical line derivation (per-source
    header at line 0, lateral generate_series BOILER_LINE_TOKENS-token body
    chunks — the passage-twin idiom), identical distinct-doc frequency
    threshold, identical newline re-join ordered by line_idx."""
    w = BOILER_LINE_TOKENS
    return f"""
  WITH base AS (SELECT doc_id, source, string_split(coalesce(text, ''), ' ') AS toks FROM documents),
  body AS (
    SELECT doc_id, (gs.g + 1)::INTEGER AS line_idx,
           array_to_string(toks[gs.g*{w}+1 : gs.g*{w}+{w}], ' ') AS line
    FROM base, LATERAL (SELECT unnest(generate_series(0,
         greatest(CAST(ceil(len(base.toks)::DOUBLE / {w}) AS INTEGER), 1) - 1)) AS g) gs),
  lines AS MATERIALIZED (
    SELECT doc_id, 0 AS line_idx, 'SOURCE: ' || source AS line FROM base
    UNION ALL SELECT doc_id, line_idx, line FROM body),
  freq AS (SELECT line, count(DISTINCT doc_id) AS n_docs FROM lines GROUP BY line),
  keep AS (SELECT l.doc_id, l.line_idx, l.line FROM lines l
           JOIN freq f USING (line) WHERE f.n_docs < {BOILER_MIN_DOCS}),
  tot AS (SELECT doc_id, count(*)::BIGINT AS n_lines FROM lines GROUP BY doc_id),
  k AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
               string_agg(line, chr(10) ORDER BY line_idx) AS clean_text
        FROM keep GROUP BY doc_id)
  SELECT t.doc_id, t.n_lines, coalesce(k.n_kept, 0)::BIGINT AS n_kept,
         coalesce(k.clean_text, '') AS clean_text
  FROM tot t LEFT JOIN k USING (doc_id)
  """


def _influence_sql() -> str:
    """Twin of q_influence_transcript: identical md5 arc coin (the portable
    12-hex slice), identical seed rule, capped min-hop recursive closure
    over the live arcs, grouped into per-round activation counts."""
    return f"""
WITH RECURSIVE{_transcript_digraph_cte(300)},
  live AS MATERIALIZED (SELECT src, dst FROM de
    WHERE ('0x' || substr(md5('ic0:' || CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)), 1, 12))::BIGINT % 1000 < {INFLUENCE_P_PERMILLE}),
  seeds AS (SELECT vid FROM verts WHERE vid % {INFLUENCE_SEED_MOD} = 0),
  d(vid, dist) AS (
    SELECT vid, 0 FROM seeds
    UNION
    SELECT live.dst, d.dist + 1 FROM d JOIN live ON live.src = d.vid
    WHERE d.dist < {INFLUENCE_ROUNDS}
  ),
  md AS (SELECT vid, min(dist) AS round FROM d GROUP BY vid)
  SELECT round::INTEGER AS round, count(*)::BIGINT AS n_activated
  FROM md GROUP BY round"""


def _transcript_bipartite_sql() -> str:
    """Twin of q_transcript_bipartite: the pruned min-vid CC closure gives
    components; a second recursive closure propagates (vid, parity) from
    each component representative (the label is a member vid); a component
    is bipartite iff no member holds both parities."""
    return (
        "WITH RECURSIVE "
        + _transcript_tables_sql(300).lstrip()
        + _TRANSCRIPT_CC_RECURSIVE
        + """,
  pp(vid, par) AS (
    SELECT component, 0 FROM (SELECT DISTINCT component FROM cc)
    UNION
    SELECT b.dst, 1 - pp.par FROM pp JOIN b ON b.src = pp.vid
  ),
  bad AS (SELECT vid FROM pp GROUP BY vid HAVING count(DISTINCT par) > 1)
  SELECT cc.component, count(*)::BIGINT AS n_vertices,
         (count(bad.vid) = 0) AS is_bipartite
  FROM cc LEFT JOIN bad USING (vid) GROUP BY cc.component"""
    )


def _clustering_coeff_sql() -> str:
    """Twin of q_clustering_coeff_copurchase: the per-vertex triangle fan
    (same canonical a<b<c closure as triangles_per_vertex) joined to the
    degree aggregate; the coefficient division mirrors the engine's
    parenthesization exactly, rounded 1e-6."""
    return f"""
  WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
  t AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM e e1 JOIN e e2 ON e1.dst = e2.src
        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
  p AS (SELECT a AS vid FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t),
  tc AS (SELECT vid, count(*) AS n FROM p GROUP BY vid),
  d AS (SELECT vid, count(*) AS degree FROM (
          SELECT src AS vid FROM e UNION ALL SELECT dst FROM e) GROUP BY vid)
  SELECT d.vid::BIGINT AS vid, d.degree::BIGINT AS degree,
         coalesce(tc.n, 0)::BIGINT AS n_triangles,
         round(CASE WHEN d.degree >= 2
               THEN (2.0 * coalesce(tc.n, 0)) / (d.degree::DOUBLE * (d.degree::DOUBLE - 1.0))
               ELSE 0.0 END, 6) AS coeff
  FROM d LEFT JOIN tc USING (vid)
  """


def _link_predict_sql() -> str:
    """Twin of q_link_predict_copurchase: identical pivot degree guard,
    wedge self-join, NOT-EXISTS edge exclusion, and the total-ordered
    top-k cut on (round(aa,6) DESC, a, b)."""
    return f"""
  WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
  b AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
  d AS (SELECT src AS vid, count(*) AS degree FROM b GROUP BY src),
  piv AS (SELECT vid, 1.0 / ln(degree::DOUBLE) AS invw FROM d
          WHERE degree >= 2 AND degree <= {LINKPRED_MAX_PIVOT_DEG}),
  adj AS MATERIALIZED (SELECT b.src AS w, b.dst AS nbr, piv.invw
                       FROM b JOIN piv ON b.src = piv.vid),
  p AS (SELECT l.nbr AS a, r.nbr AS b2, l.invw
        FROM adj l JOIN adj r ON l.w = r.w AND l.nbr < r.nbr),
  s AS (SELECT a, b2 AS b, count(*)::BIGINT AS common_neighbors, sum(invw) AS aa
        FROM p GROUP BY a, b2),
  f AS (SELECT s.* FROM s
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = s.a AND e.dst = s.b))
  SELECT a::BIGINT AS a, b::BIGINT AS b, common_neighbors, round(aa, 6) AS aa_score
  FROM f ORDER BY round(aa, 6) DESC, a, b LIMIT {LINKPRED_TOP_K}
  """


def _tfidf_sql() -> str:
    """Twin of q_tfidf_docs: same tokenization regex class, smoothed idf,
    1e-6 score rounding, and the (score DESC, term ASC) per-doc rank."""
    return f"""
  WITH toks AS (
    SELECT doc_id, t.term
    FROM documents, unnest(string_split_regex(lower(coalesce(text, '')), '[^a-z]+')) AS t(term)
    WHERE len(t.term) >= 3
  ),
  tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
  nd AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM documents),
  dfq AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tf GROUP BY term),
  scored AS (SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * (ln((1.0 + (SELECT n FROM nd)) / (1.0 + dfq.df)) + 1.0), 6) AS score
         FROM tf JOIN dfq USING (term)),
  rk AS (SELECT doc_id, term, tf, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS term_rank
         FROM scored)
  SELECT doc_id, term, term_rank::BIGINT AS term_rank, tf, score
  FROM rk WHERE term_rank <= {TFIDF_K}
  """


def _transcript_bfs_sql() -> str:
    """Bounded multi-source BFS twin: recursive CTE over the both-directions
    edge relation, seeded at the tool-actor vertices, with the recursion
    capped at exactly ``BFS_MAX_HOPS`` (the operator's contract bound — the
    cap also bounds the closure at |V|×(hops+1) (vid, dist) pairs, so cyclic
    walks terminate)."""
    return (
        "WITH RECURSIVE "
        + _transcript_tables_sql(300).lstrip()
        + f""",
  d(vid, dist) AS (
    SELECT vid, 0 FROM tool_v
    UNION
    SELECT b.dst, d.dist + 1 FROM d JOIN b ON b.src = d.vid WHERE d.dist < {BFS_MAX_HOPS}
  ),
  md AS (SELECT vid, min(dist) AS dist FROM d GROUP BY vid)
  SELECT v.vid, coalesce(md.dist, -1)::INTEGER AS dist
  FROM verts v LEFT JOIN md USING (vid)"""
    )


def _transcript_harmonic_sql() -> str:
    """Twin of q_transcript_harmonic: per-landmark capped recursive closure
    (the recursion carries the landmark, so it is the per-pair distance,
    not the min-over-seeds of the bfs twin), then the identical exact
    integer sum Σ(L // d) with L = lcm(1..BFS_MAX_HOPS) and one final
    division — summation order cannot move the 1e-6 rounding."""
    from elektra_spark.operators.bfs import _lcm_upto

    L = _lcm_upto(BFS_MAX_HOPS)
    return (
        "WITH RECURSIVE "
        + _transcript_tables_sql(300).lstrip()
        + f""",
  d(lmk, vid, dist) AS (
    SELECT vid, vid, 0 FROM tool_v
    UNION
    SELECT d.lmk, b.dst, d.dist + 1 FROM d JOIN b ON b.src = d.vid WHERE d.dist < {BFS_MAX_HOPS}
  ),
  md AS (SELECT lmk, vid, min(dist) AS dist FROM d GROUP BY lmk, vid),
  h AS (SELECT vid, sum({L} // dist)::BIGINT AS s FROM md WHERE dist > 0 GROUP BY vid)
  SELECT v.vid, coalesce(round(h.s::DOUBLE / {float(L)!r}, 6), 0.0) AS harmonic
  FROM verts v LEFT JOIN h USING (vid)"""
    )


def _transcript_closeness_sql() -> str:
    """Twin of q_transcript_closeness: the harmonic twin's per-landmark
    capped closure, aggregated as count/sum instead of Σ(L // d)."""
    return (
        "WITH RECURSIVE "
        + _transcript_tables_sql(300).lstrip()
        + f""",
  d(lmk, vid, dist) AS (
    SELECT vid, vid, 0 FROM tool_v
    UNION
    SELECT d.lmk, b.dst, d.dist + 1 FROM d JOIN b ON b.src = d.vid WHERE d.dist < {BFS_MAX_HOPS}
  ),
  md AS (SELECT lmk, vid, min(dist) AS dist FROM d GROUP BY lmk, vid),
  c AS (SELECT vid, count(*)::BIGINT AS r, sum(dist)::BIGINT AS sd FROM md WHERE dist > 0 GROUP BY vid)
  SELECT v.vid, coalesce(round(c.r::DOUBLE / c.sd::DOUBLE, 6), 0.0) AS closeness
  FROM verts v LEFT JOIN c USING (vid)"""
    )


def _diameter_sql() -> str:
    """Twin of q_diameter_copurchase: two chained capped recursive
    closures — sweep 2 seeds from sweep 1's argmax row — with the identical
    (dist DESC, vid) tiebreak at each cut."""
    h = PSEUDO_DIAM_HOPS
    return (
        f"""WITH RECURSIVE e AS MATERIALIZED ({_COPURCHASE_SQL}),
  b AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)"""
        + f""",
  st AS (SELECT min(src) AS v FROM b),
  d1(vid, dist) AS (
    SELECT v, 0 FROM st
    UNION
    SELECT b.dst, d1.dist + 1 FROM d1 JOIN b ON b.src = d1.vid WHERE d1.dist < {h}
  ),
  m1 AS (SELECT vid, min(dist) AS dist FROM d1 GROUP BY vid),
  f1 AS (SELECT vid, dist FROM m1 ORDER BY dist DESC, vid LIMIT 1),
  d2(vid, dist) AS (
    SELECT vid, 0 FROM f1
    UNION
    SELECT b.dst, d2.dist + 1 FROM d2 JOIN b ON b.src = d2.vid WHERE d2.dist < {h}
  ),
  m2 AS (SELECT vid, min(dist) AS dist FROM d2 GROUP BY vid),
  f2 AS (SELECT vid, dist FROM m2 ORDER BY dist DESC, vid LIMIT 1)
  SELECT st.v AS start, f1.vid AS far1, f1.dist::INTEGER AS ecc_start,
         f2.vid AS far2, f2.dist::INTEGER AS pseudo_diameter
  FROM st, f1, f2"""
    )


def _walk_hash_sql(walk: str, step: int, nbr: str) -> str:
    """The walks/MIS arithmetic hash as SQL text, generated from the same
    constants as the Spark expression (operators/walks.py _step_hash) so
    the two engines share the function by construction."""
    from elektra_spark.operators.walks import WALK_MOD, _A, _B, _C

    return (
        f"((({walk}) % {WALK_MOD}) * {_A} % {WALK_MOD} + {step * _B % WALK_MOD} "
        f"+ (({nbr}) % {WALK_MOD}) * {_C} % {WALK_MOD}) % {WALK_MOD}"
    )


def _transcript_walks_sql() -> str:
    """Twin of q_transcript_walks: per step, rank each walk's neighbor
    candidates by the identical (hash, vid) order and keep rank 1 — the
    same argmin the engine computes with min(struct(h, vid))."""
    parts = [
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + f""",
  w0 AS (SELECT vid AS walk_id, 0 AS step, vid FROM verts WHERE vid % {WALK_SEED_MOD} = 0)"""
    ]
    for t in range(1, WALK_LEN + 1):
        h = _walk_hash_sql("w.walk_id", t, "b.dst")
        parts.append(
            f""",
  w{t} AS MATERIALIZED (SELECT walk_id, {t} AS step, vid FROM (
    SELECT w.walk_id, b.dst AS vid,
           row_number() OVER (PARTITION BY w.walk_id ORDER BY {h}, b.dst) AS rn
    FROM w{t - 1} w JOIN b ON b.src = w.vid) WHERE rn = 1)"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM w{t}" for t in range(WALK_LEN + 1))
    parts.append(f"\n  SELECT walk_id, step::INTEGER AS step, vid FROM ({union})")
    return "".join(parts)


def _transcript_node2vec_sql() -> str:
    """Twin of q_transcript_node2vec: per step, rank each walk's candidates
    by the identical (class, hash, vid) order — class 2 backtrack, class 0
    prev-adjacent, class 1 otherwise — carrying (prev, vid) second-order
    state through the unrolled chain."""
    parts = [
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + f""",
  w0 AS (SELECT vid AS walk_id, 0 AS step, vid AS prev, vid
         FROM verts WHERE vid % {WALK_SEED_MOD} = 0)"""
    ]
    for t in range(1, WALK_LEN + 1):
        h = _walk_hash_sql("w.walk_id", t, "b2.dst")
        parts.append(
            f""",
  w{t} AS MATERIALIZED (SELECT walk_id, {t} AS step, prev, vid FROM (
    SELECT w.walk_id, w.vid AS prev, b2.dst AS vid,
           row_number() OVER (PARTITION BY w.walk_id ORDER BY
             CASE WHEN b2.dst = w.prev THEN 2
                  WHEN m.src IS NOT NULL THEN 0 ELSE 1 END,
             {h}, b2.dst) AS rn
    FROM w{t - 1} w JOIN b b2 ON b2.src = w.vid
    LEFT JOIN b m ON m.src = w.prev AND m.dst = b2.dst) WHERE rn = 1)"""
        )
    union = " UNION ALL ".join(f"SELECT walk_id, step, vid FROM w{t}" for t in range(WALK_LEN + 1))
    parts.append(f"\n  SELECT walk_id, step::INTEGER AS step, vid FROM ({union})")
    return "".join(parts)


def _mis_sql() -> str:
    """Twin of q_mis_copurchase: MIS_SQL_ROUNDS unrolled Luby rounds —
    per-round re-hashed priorities, winners strictly below every undecided
    neighbor under the (h, vid) order, winners + their neighbors retired.
    Rounds after the undecided set empties are no-ops."""
    parts = [
        f"""WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
  b AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
  v0 AS MATERIALIZED (SELECT DISTINCT src AS vid FROM b),
  u0 AS (SELECT vid FROM v0)"""
    ]
    wins = []
    for r in range(1, MIS_SQL_ROUNDS + 1):
        h = _walk_hash_sql("0", r, "vid")
        parts.append(
            f""",
  p{r} AS MATERIALIZED (SELECT vid, {h} AS h FROM u{r - 1}),
  nm{r} AS (SELECT vid, hd, nvid FROM (
    SELECT ps.vid, pd.h AS hd, b.dst AS nvid,
           row_number() OVER (PARTITION BY ps.vid ORDER BY pd.h, b.dst) AS rn
    FROM b JOIN p{r} ps ON b.src = ps.vid JOIN p{r} pd ON b.dst = pd.vid) WHERE rn = 1),
  win{r} AS MATERIALIZED (SELECT p.vid FROM p{r} p LEFT JOIN nm{r} n USING (vid)
    WHERE n.vid IS NULL OR (p.h, p.vid) < (n.hd, n.nvid)),
  u{r} AS MATERIALIZED (SELECT u.vid FROM u{r - 1} u
    WHERE u.vid NOT IN (SELECT vid FROM win{r})
      AND u.vid NOT IN (SELECT b.dst FROM b JOIN win{r} w ON b.src = w.vid))"""
        )
        wins.append(f"SELECT vid FROM win{r}")
    parts.append(
        f""",
  mis AS ({" UNION ALL ".join(wins)})
  SELECT v.vid, (mis.vid IS NOT NULL) AS in_mis
  FROM v0 v LEFT JOIN mis ON v.vid = mis.vid"""
    )
    return "".join(parts)


def _skew_join_sql() -> str:
    """Twin of q_skew_join_transcript: the PLAIN double join + aggregate —
    the skew split must be invisible in the result."""
    return (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + """,
  vk AS (SELECT vid, 'turn' AS kind FROM turns UNION ALL SELECT vid, 'tool' AS kind FROM tool_v)
  SELECT s.kind AS src_kind, d.kind AS dst_kind, count(*)::BIGINT AS n_edges
  FROM edges e JOIN vk s ON e.src = s.vid JOIN vk d ON e.dst = d.vid
  GROUP BY s.kind, d.kind"""
    )


def _salted_degree_sql() -> str:
    """Twin of q_salted_degree_transcript: the plain one-phase degree count
    the salted two-phase form must reproduce exactly."""
    return (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + """,
  bd AS (SELECT src AS vid FROM edges UNION ALL SELECT dst AS vid FROM edges)
  SELECT vid, count(*)::BIGINT AS degree FROM bd GROUP BY vid"""
    )


def _coloring_sql() -> str:
    """Twin of q_coloring_transcript: COLORING_SQL_ROUNDS unrolled Jones–
    Plassmann rounds — one fixed md5 priority per vertex, a round's winners
    are the strict (h, vid) local maxima among uncolored neighbors, each
    takes the smallest color absent from its colored neighborhood. Color
    VALUES are deterministic, so the twin hashes the full assignment."""
    pri = "('0x' || substr(md5('jp:' || CAST(vid AS VARCHAR)), 1, 12))::BIGINT"
    parts = [
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + f""",
  u0 AS (SELECT vid, {pri} AS h FROM verts),
  col0 AS (SELECT CAST(NULL AS BIGINT) AS vid, CAST(NULL AS INTEGER) AS color WHERE false)"""
    ]
    for r in range(1, COLORING_SQL_ROUNDS + 1):
        parts.append(
            f""",
  nm{r} AS (SELECT vid, hd, nvid FROM (
    SELECT us.vid, ud.h AS hd, b.dst AS nvid,
           row_number() OVER (PARTITION BY us.vid ORDER BY ud.h DESC, b.dst DESC) AS rn
    FROM b JOIN u{r - 1} us ON b.src = us.vid JOIN u{r - 1} ud ON b.dst = ud.vid) WHERE rn = 1),
  w{r} AS MATERIALIZED (SELECT u.vid FROM u{r - 1} u LEFT JOIN nm{r} n USING (vid)
    WHERE n.vid IS NULL OR (u.h, u.vid) > (n.hd, n.nvid)),
  ncol{r} AS (SELECT w.vid, c.color FROM b JOIN w{r} w ON b.src = w.vid
              JOIN col{r - 1} c ON b.dst = c.vid GROUP BY w.vid, c.color),
  rk{r} AS (SELECT vid, color, row_number() OVER (PARTITION BY vid ORDER BY color) - 1 AS idx
            FROM ncol{r}),
  gap{r} AS (SELECT vid, min(CASE WHEN color <> idx THEN idx END) AS g,
                    count(*) AS n FROM rk{r} GROUP BY vid),
  newc{r} AS MATERIALIZED (SELECT w.vid, coalesce(gap.g, gap.n, 0)::INTEGER AS color
    FROM w{r} w LEFT JOIN gap{r} gap USING (vid)),
  col{r} AS MATERIALIZED (SELECT vid, color FROM col{r - 1} UNION ALL SELECT vid, color FROM newc{r}),
  u{r} AS MATERIALIZED (SELECT u.vid, u.h FROM u{r - 1} u
    WHERE u.vid NOT IN (SELECT vid FROM w{r}))"""
        )
    parts.append(
        f"""
  SELECT vid, color FROM col{COLORING_SQL_ROUNDS}"""
    )
    return "".join(parts)


def _matching_hash_sql(r: int) -> str:
    """SQL text of operators/matching.py _edge_priority — the identical md5
    slice of the "round:src:dst" key."""
    key = f"{r} || ':' || CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)"
    return f"('0x' || substr(md5({key}), 1, 12))::BIGINT"


def _matching_chain_sql() -> tuple[str, str]:
    """(CTE chain, winners-union SQL) of the unrolled matching rounds —
    shared by the matching twin and the coarsening twin."""
    parts = [
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + ",\n  a0 AS (SELECT src, dst FROM edges)"
    ]
    wins = []
    for r in range(1, MATCHING_SQL_ROUNDS + 1):
        h = _matching_hash_sql(r)
        parts.append(
            f""",
  p{r} AS MATERIALIZED (SELECT src, dst, {h} AS h FROM a{r - 1}),
  inc{r} AS (SELECT src AS vid, h, src, dst FROM p{r}
             UNION ALL SELECT dst AS vid, h, src, dst FROM p{r}),
  vm{r} AS (SELECT vid, h, src, dst FROM (
    SELECT vid, h, src, dst,
           row_number() OVER (PARTITION BY vid ORDER BY h, src, dst) AS rn
    FROM inc{r}) WHERE rn = 1),
  win{r} AS MATERIALIZED (SELECT p.src, p.dst FROM p{r} p
    JOIN vm{r} ms ON ms.vid = p.src AND ms.h = p.h AND ms.src = p.src AND ms.dst = p.dst
    JOIN vm{r} md ON md.vid = p.dst AND md.h = p.h AND md.src = p.src AND md.dst = p.dst),
  mv{r} AS (SELECT src AS vid FROM win{r} UNION SELECT dst FROM win{r}),
  a{r} AS MATERIALIZED (SELECT a.src, a.dst FROM a{r - 1} a
    WHERE a.src NOT IN (SELECT vid FROM mv{r})
      AND a.dst NOT IN (SELECT vid FROM mv{r}))"""
        )
        wins.append(f"SELECT src, dst FROM win{r}")
    return "".join(parts), " UNION ALL ".join(wins)


def _matching_sql() -> str:
    """Twin of q_matching_transcript: MATCHING_SQL_ROUNDS unrolled rounds —
    per-round re-hashed md5 edge priorities, an edge wins iff it is the
    strict (h, src, dst) minimum among alive edges at BOTH endpoints,
    winners' vertices retire every incident edge. Rounds past the
    alive-empty fixpoint are no-ops."""
    chain, wins = _matching_chain_sql()
    return f"""{chain}
  SELECT src, dst FROM ({wins}) q"""


def _louvain_chain_sql() -> str:
    """LOUVAIN_ROUNDS unrolled gain-argmax rounds — identical integer score,
    tie-break, and Luby-mover schedule (same md5 priority + row-comparison
    form as the MIS twin). Ends with CTE l{LOUVAIN_ROUNDS}; shared by the
    louvain and louvain-modularity twins."""
    chain = []
    for t in range(LOUVAIN_ROUNDS):
        chain.append(
            f""",
  tot{t} AS MATERIALIZED (SELECT l.lab AS c, sum(coalesce(deg.d, 0)) AS tot
      FROM l{t} l LEFT JOIN deg ON deg.vid = l.vid GROUP BY l.lab),
  kic{t} AS MATERIALIZED (SELECT b.src AS vid, l.lab AS c, count(*) AS kic
      FROM b JOIN l{t} l ON l.vid = b.dst GROUP BY b.src, l.lab),
  cand{t} AS (SELECT vid, c, kic FROM kic{t}
      UNION ALL
      SELECT l.vid, l.lab, 0 FROM l{t} l
      LEFT JOIN kic{t} k ON k.vid = l.vid AND k.c = l.lab WHERE k.vid IS NULL),
  sc{t} AS MATERIALIZED (SELECT cand.vid, cand.c,
      (SELECT m2 FROM mm) * cand.kic
        - coalesce(deg.d, 0) * (tot.tot - CASE WHEN cand.c = l.lab
                                               THEN coalesce(deg.d, 0) ELSE 0 END) AS score
      FROM cand{t} cand JOIN l{t} l ON l.vid = cand.vid
      LEFT JOIN deg ON deg.vid = cand.vid JOIN tot{t} tot ON tot.c = cand.c),
  bs{t} AS (SELECT vid, c AS best FROM (
      SELECT vid, c, row_number() OVER (PARTITION BY vid ORDER BY score DESC, c ASC) AS rn
      FROM sc{t}) WHERE rn = 1),
  p{t} AS MATERIALIZED (SELECT vid,
      ('0x' || substr(md5('lmv:{t}:' || CAST(vid AS VARCHAR)), 1, 12))::BIGINT AS h
      FROM verts),
  nm{t} AS (SELECT vid, hd, nvid FROM (
      SELECT ps.vid, pd.h AS hd, b.dst AS nvid,
             row_number() OVER (PARTITION BY ps.vid ORDER BY pd.h, b.dst) AS rn
      FROM b JOIN p{t} ps ON b.src = ps.vid JOIN p{t} pd ON b.dst = pd.vid) WHERE rn = 1),
  mv{t} AS (SELECT p.vid FROM p{t} p LEFT JOIN nm{t} n USING (vid)
      WHERE n.vid IS NULL OR (p.h, p.vid) < (n.hd, n.nvid)),
  l{t + 1} AS MATERIALIZED (SELECT l.vid,
      CASE WHEN mv{t}.vid IS NOT NULL THEN bs{t}.best ELSE l.lab END AS lab
      FROM l{t} l JOIN bs{t} ON bs{t}.vid = l.vid
      LEFT JOIN mv{t} ON mv{t}.vid = l.vid)"""
        )
    return (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + """,
  deg AS MATERIALIZED (SELECT src AS vid, count(*) AS d FROM b GROUP BY src),
  mm AS (SELECT 2 * count(*) AS m2 FROM edges),
  l0 AS (SELECT vid, vid AS lab FROM verts)"""
        + "".join(chain)
    )


def _louvain_sql() -> str:
    return (
        _louvain_chain_sql()
        + f"""
  SELECT vid, lab::BIGINT AS community FROM l{LOUVAIN_ROUNDS}"""
    )


def _modularity_louvain_sql() -> str:
    """Twin of q_modularity_louvain_transcript: the Louvain chain's final
    partition fed into the identical exact-integer modularity aggregates
    (fresh CTE names — the chain already owns mm/deg)."""
    lf = f"l{LOUVAIN_ROUNDS}"
    return (
        _louvain_chain_sql()
        + f""",
  mq AS (SELECT count(*)::BIGINT AS m FROM edges),
  elq AS (SELECT ls.lab AS ls, ld.lab AS ld
          FROM edges e JOIN {lf} ls ON e.src = ls.vid JOIN {lf} ld ON e.dst = ld.vid),
  intraq AS (SELECT count(*)::BIGINT AS a FROM elq WHERE ls = ld),
  degq AS (SELECT l.lab, count(*)::BIGINT AS deg_c
           FROM b JOIN {lf} l ON b.src = l.vid GROUP BY l.lab),
  sumsq AS (SELECT count(*)::BIGINT AS n_communities, sum(deg_c * deg_c)::BIGINT AS bsum FROM degq)
  SELECT sumsq.n_communities, intraq.a AS intra_edges,
         round(intraq.a::DOUBLE / mq.m::DOUBLE
               - sumsq.bsum::DOUBLE / (4.0 * mq.m * mq.m), 6) AS modularity
  FROM sumsq, intraq, mq"""
    )


def _scan_sql() -> str:
    """Twin of q_scan_transcript — the whole SCAN pipeline in SQL over the
    derived link graph: per-edge common-closed-neighbor counts, the integer
    σ² threshold, ε-degrees, core CC (pruned recursive CTE over the
    core–core ε-subgraph), border min-cluster assignment."""
    e2 = SCAN_EPS_PERMILLE * SCAN_EPS_PERMILLE
    return (
        "WITH RECURSIVE "
        + _transcript_tables_sql(300).lstrip()
        + f""",
  deg AS MATERIALIZED (SELECT src AS vid, count(*) AS d FROM b GROUP BY src),
  com AS MATERIALIZED (SELECT e.src, e.dst, count(*) AS c
      FROM edges e JOIN b b1 ON b1.src = e.src
      JOIN b b2 ON b2.src = e.dst AND b2.dst = b1.dst
      GROUP BY e.src, e.dst),
  sim AS MATERIALIZED (SELECT e.src, e.dst
      FROM edges e LEFT JOIN com ON com.src = e.src AND com.dst = e.dst
      JOIN deg ds ON ds.vid = e.src JOIN deg dd ON dd.vid = e.dst
      WHERE (coalesce(com.c, 0) + 2) * (coalesce(com.c, 0) + 2) * 1000000
            >= {e2} * (ds.d + 1) * (dd.d + 1)),
  en AS (SELECT vid, count(*) AS en FROM (
      SELECT src AS vid FROM sim UNION ALL SELECT dst FROM sim) GROUP BY vid),
  core AS MATERIALIZED (SELECT vid FROM en WHERE en + 1 >= {SCAN_MU}),
  cb0 AS MATERIALIZED (SELECT s.src, s.dst FROM sim s
      JOIN core c1 ON c1.vid = s.src JOIN core c2 ON c2.vid = s.dst),
  cbb AS (SELECT src, dst FROM cb0 UNION ALL SELECT dst, src FROM cb0),
  rc(vid, label) AS (
    SELECT vid, vid FROM core
    UNION
    SELECT cbb.dst, rc.label FROM rc JOIN cbb ON cbb.src = rc.vid WHERE rc.label < cbb.dst
  ),
  comp AS MATERIALIZED (SELECT vid, min(label) AS component FROM rc GROUP BY vid),
  halves AS (SELECT src AS vid, dst AS nbr FROM sim UNION ALL SELECT dst, src FROM sim),
  border AS (SELECT h.vid, min(comp.component) AS bcluster
      FROM halves h JOIN core cn ON cn.vid = h.nbr JOIN comp ON comp.vid = h.nbr
      LEFT JOIN core cv ON cv.vid = h.vid
      WHERE cv.vid IS NULL GROUP BY h.vid)
  SELECT v.vid,
         CASE WHEN comp.vid IS NOT NULL THEN 'core'
              WHEN border.vid IS NOT NULL THEN 'border'
              ELSE 'outlier' END AS role,
         coalesce(comp.component, border.bcluster, -1)::BIGINT AS cluster
  FROM verts v LEFT JOIN comp ON comp.vid = v.vid LEFT JOIN border ON border.vid = v.vid"""
    )


def _vertex_cover_sql() -> str:
    """Twin of q_vertex_cover_transcript: the identical matching chain, then
    cover = distinct matched endpoints, flagged over the full vertex set."""
    chain, wins = _matching_chain_sql()
    return f"""{chain},
  m AS ({wins}),
  cov AS (SELECT src AS vid FROM m UNION SELECT dst FROM m)
  SELECT v.vid, (cov.vid IS NOT NULL) AS in_cover
  FROM verts v LEFT JOIN cov ON cov.vid = v.vid"""


def _coarsen_sql() -> str:
    """Twin of q_coarsen_transcript: the identical matching chain, then
    every fine edge maps its endpoints through the (matched dst → src)
    representative table, intra-pair self-loops drop, and the coarse edge
    weight is the count of merged fine edges."""
    chain, wins = _matching_chain_sql()
    return f"""{chain},
  m AS ({wins}),
  rep AS (SELECT dst AS vid, src AS rep FROM m),
  ce AS (SELECT least(coalesce(rs.rep, e.src), coalesce(rd.rep, e.dst)) AS src,
                greatest(coalesce(rs.rep, e.src), coalesce(rd.rep, e.dst)) AS dst
         FROM edges e
         LEFT JOIN rep rs ON rs.vid = e.src
         LEFT JOIN rep rd ON rd.vid = e.dst)
  SELECT src, dst, count(*)::BIGINT AS weight
  FROM ce WHERE src <> dst GROUP BY src, dst"""


def _temporal_edges_ctes() -> str:
    """Shared CTE block: the temporal edge derivation (reply edges at the
    later turn's epoch seconds, tool hops both directions at the turn's
    epoch seconds) — the SQL mirror of q_temporal_reach_transcript's
    Spark-side derivation."""
    fx = _transcript_fixture(300)
    return f""",
  wt AS MATERIALIZED (
    SELECT turns.vid, turns.turn_idx, turns.tool, epoch(rt.ts)::BIGINT AS et
    FROM turns JOIN read_parquet('{fx}') rt
      ON rt.conv_id = turns.conv_id AND rt.turn_idx = turns.turn_idx),
  te AS MATERIALIZED (
    SELECT (vid - 1)::BIGINT AS src, vid AS dst, et AS t FROM wt WHERE turn_idx >= 1
    UNION ALL
    SELECT wt.vid, tool_v.vid, wt.et FROM wt JOIN tool_v USING (tool)
    UNION ALL
    SELECT tool_v.vid, wt.vid, wt.et FROM wt JOIN tool_v USING (tool))"""


def _temporal_relax_rounds(edge_rel: str) -> str:
    """TEMPORAL_HOPS unrolled min-relaxation rounds over ``edge_rel`` with
    the `t >= arrival` eligibility predicate; expects a0 defined."""
    parts = []
    for r in range(1, TEMPORAL_HOPS + 1):
        parts.append(
            f""",
  a{r} AS MATERIALIZED (SELECT vid, min(arrival) AS arrival FROM (
    SELECT vid, arrival FROM a{r - 1}
    UNION ALL
    SELECT q.dst AS vid, q.t AS arrival
    FROM a{r - 1} p JOIN {edge_rel} q ON q.src = p.vid AND q.t >= p.arrival
  ) GROUP BY vid)"""
        )
    return "".join(parts)


def _temporal_reach_sql() -> str:
    """Twin of q_temporal_reach_transcript: identical temporal edge
    derivation and TEMPORAL_HOPS unrolled min-relaxation rounds.
    All-integer arithmetic — exact."""
    return (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + _temporal_edges_ctes()
        + f""",
  a0 AS (SELECT vid, 0::BIGINT AS arrival FROM verts WHERE vid % {TEMPORAL_SEED_MOD} = 0)"""
        + _temporal_relax_rounds("te")
        + f"""
  SELECT v.vid, coalesce(a.arrival, -1)::BIGINT AS arrival
  FROM verts v LEFT JOIN a{TEMPORAL_HOPS} a USING (vid)"""
    )


def _temporal_departure_sql() -> str:
    """Twin of q_temporal_departure_transcript: the identical
    reverse-and-negate reduction (operators/temporal.py latest_departure) —
    reversed temporal edges with negated times, targets seeded at the
    -(2^62) sentinel, the same unrolled rounds, then departure = -arrival
    over non-target vertices."""
    return (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + _temporal_edges_ctes()
        + f""",
  rte AS MATERIALIZED (SELECT dst AS src, src AS dst, -t AS t FROM te),
  a0 AS (SELECT vid, {-(1 << 62)}::BIGINT AS arrival FROM verts WHERE vid % {TEMPORAL_SEED_MOD} = 0)"""
        + _temporal_relax_rounds("rte")
        + f"""
  SELECT v.vid, coalesce(-a.arrival, -1)::BIGINT AS departure
  FROM verts v LEFT JOIN a{TEMPORAL_HOPS} a USING (vid)
  WHERE v.vid % {TEMPORAL_SEED_MOD} <> 0"""
    )


def _single_linkage_sql() -> str:
    """Independent-algorithm oracle for q_single_linkage_transcript:
    min-vertex CC over ALL τ-light edges via the pruned recursive CTE —
    not an MSF in sight, which is the point (Kruskal/single-linkage
    equivalence, see the query docstring)."""
    return (
        "WITH RECURSIVE "
        + _transcript_tables_sql(300).lstrip()
        + f""",
  ew AS MATERIALIZED (SELECT src, dst,
    ('0x' || substr(md5('w:' || CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)), 1, 12))::BIGINT AS w
    FROM edges),
  lb AS MATERIALIZED (
    SELECT src, dst FROM ew WHERE w <= {SINGLE_LINKAGE_TAU}
    UNION ALL SELECT dst, src FROM ew WHERE w <= {SINGLE_LINKAGE_TAU}),
  r(vid, label) AS (
    SELECT vid, vid FROM verts
    UNION
    SELECT lb.dst, r.label FROM r JOIN lb ON lb.src = r.vid WHERE r.label < lb.dst)
  SELECT vid, min(label) AS component FROM r GROUP BY vid"""
    )


def _msf_sql() -> str:
    """Twin of q_msf_transcript: MSF_SQL_ROUNDS unrolled Boruvka rounds over
    the identical md5 "w:src:dst" weights. Per round: every component picks
    its strict (w, src, dst)-minimum incident live edge (row_number over the
    doubled incidence list — same rule as operators/forest.py
    _np_forest_winners), then labels collapse to the min label reachable
    through the round's selected edges via a pruned recursive CTE (the
    _TRANSCRIPT_CC_RECURSIVE pattern on the label quotient). Distinct-total
    edge order → unique MSF → the edge sets must match exactly."""
    parts = [
        "WITH RECURSIVE "
        + _transcript_tables_sql(300).lstrip()
        + """,
  ew AS MATERIALIZED (SELECT src, dst,
    ('0x' || substr(md5('w:' || CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)), 1, 12))::BIGINT AS w
    FROM edges),
  l0 AS MATERIALIZED (SELECT vid, vid AS lbl FROM verts)"""
    ]
    sels = []
    for r in range(1, MSF_SQL_ROUNDS + 1):
        parts.append(
            f""",
  q{r} AS MATERIALIZED (
    SELECT ew.src, ew.dst, ew.w, ls.lbl AS cs, ld.lbl AS cd
    FROM ew JOIN l{r - 1} ls ON ls.vid = ew.src JOIN l{r - 1} ld ON ld.vid = ew.dst
    WHERE ls.lbl <> ld.lbl),
  sel{r} AS MATERIALIZED (
    SELECT DISTINCT src, dst, w FROM (
      SELECT comp, src, dst, w,
             row_number() OVER (PARTITION BY comp ORDER BY w, src, dst) AS rn
      FROM (SELECT cs AS comp, src, dst, w FROM q{r}
            UNION ALL SELECT cd AS comp, src, dst, w FROM q{r})) WHERE rn = 1),
  bq{r} AS MATERIALIZED (
    SELECT ls.lbl AS a, ld.lbl AS b
    FROM sel{r} s JOIN l{r - 1} ls ON ls.vid = s.src JOIN l{r - 1} ld ON ld.vid = s.dst
    UNION
    SELECT ld.lbl, ls.lbl
    FROM sel{r} s JOIN l{r - 1} ls ON ls.vid = s.src JOIN l{r - 1} ld ON ld.vid = s.dst),
  rc{r}(c, m) AS (
    SELECT a, a FROM bq{r}
    UNION
    SELECT bq{r}.b, rc{r}.m FROM rc{r} JOIN bq{r} ON bq{r}.a = rc{r}.c WHERE rc{r}.m < bq{r}.b),
  nl{r} AS (SELECT c, min(m) AS nl FROM rc{r} GROUP BY c),
  l{r} AS MATERIALIZED (
    SELECT v.vid, coalesce(n.nl, v.lbl) AS lbl
    FROM l{r - 1} v LEFT JOIN nl{r} n ON n.c = v.lbl)"""
        )
        sels.append(f"SELECT src, dst, w FROM sel{r}")
    parts.append(f"""
  SELECT DISTINCT src, dst, w FROM ({" UNION ALL ".join(sels)}) q""")
    return "".join(parts)


def _hyperball_ctes() -> str:
    """Shared CTE chain for the HyperBall twins: ANF_HOPS unrolled hops.
    Registers are (vid, reg, rho) rows from the identical md5 bit slices
    (operators/anf.py layout); each hop maxes own ∪ neighbor registers;
    each estimate applies the identical HLL formula — the shared alpha·m²
    literal is generated from the same function, the 2^-rho sums are exact
    doubles, so round(…, 6) agrees bit-for-bit."""
    from elektra_spark.operators.anf import RHO_CAP, _alpha_mm

    m = ANF_REGISTERS
    parts = [
        f"""WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
  b AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
  v0 AS (SELECT DISTINCT src AS vid FROM b),
  rx AS (SELECT vid, ('0x' || substr(md5(vid::VARCHAR), 1, 2))::INTEGER % {m} AS reg,
                ('0x' || substr(md5(vid::VARCHAR), 3, 13))::BIGINT AS x
         FROM v0),
  r0 AS MATERIALIZED (SELECT vid, reg,
    CASE WHEN x = 0 THEN {RHO_CAP}
         ELSE CAST(round(log2(x & (-x))) AS INTEGER) + 1 END AS rho FROM rx)"""
    ]

    def est(t: int) -> str:
        return f""",
  est{t} AS (SELECT vid, {t} AS hop,
    round(CASE WHEN raw <= {2.5 * m} AND zr > 0
               THEN {float(m)!r} * ln({float(m)!r} / zr) ELSE raw END, 6) AS ball_est
    FROM (SELECT vid, {_alpha_mm(m)!r} / (({m} - count(*))::DOUBLE + sum(pow(2.0, -rho))) AS raw,
                 ({m} - count(*))::DOUBLE AS zr
          FROM r{t} GROUP BY vid))"""

    parts.append(est(0))
    for t in range(1, ANF_HOPS + 1):
        parts.append(
            f""",
  r{t} AS MATERIALIZED (SELECT vid, reg, max(rho) AS rho FROM (
    SELECT b.src AS vid, r.reg, r.rho FROM b JOIN r{t - 1} r ON b.dst = r.vid
    UNION ALL SELECT vid, reg, rho FROM r{t - 1}) GROUP BY vid, reg)"""
        )
        parts.append(est(t))
    union = " UNION ALL ".join(f"SELECT * FROM est{t}" for t in range(ANF_HOPS + 1))
    parts.append(f""",
  u AS (SELECT * FROM ({union}))""")
    return "".join(parts)


def _hyperball_sql() -> str:
    """Twin of q_hyperball_copurchase: per-vertex estimates off the shared
    register chain."""
    return _hyperball_ctes() + "\n  SELECT vid, hop::INTEGER AS hop, ball_est FROM u"


def _neighborhood_function_sql() -> str:
    """Twin of q_neighborhood_function_copurchase: per-hop aggregate N(h)
    off the shared chain. Float-association hazard dodged by summing the
    6dp estimates as EXACT integers (×10⁶ → BIGINT): both engines reach
    the identical nf_e6 regardless of summation order, and the reach
    fraction / effective-diameter flag derive from single divisions /
    pure integer comparisons of those sums."""
    return (
        _hyperball_ctes()
        + f""",
  s AS (SELECT hop, sum(CAST(round(ball_est * 1000000.0) AS BIGINT)) AS nf_e6 FROM u GROUP BY hop),
  f AS (SELECT nf_e6 AS fin_e6 FROM s WHERE hop = {ANF_HOPS})
  SELECT s.hop::INTEGER AS hop,
         round(s.nf_e6 / 1000000.0, 6) AS nf,
         round(s.nf_e6::DOUBLE / f.fin_e6::DOUBLE, 6) AS reach_frac,
         (s.nf_e6 * 10 >= f.fin_e6 * 9) AS within_090
  FROM s, f"""
    )


def _transcript_hits_sql() -> str:
    """Unrolled HITS chain (same shape as the PageRank oracle): per
    iteration, authority = L1-normalized in-flow of hub mass over the
    directed edge set, then hub = L1-normalized out-flow of authority mass.
    MATERIALIZED per half-step — the next half-step references each vector
    once, but DuckDB would otherwise inline the whole chain exponentially."""
    base = (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + """,
  nn AS (SELECT count(*)::DOUBLE AS n FROM verts),
  h0 AS MATERIALIZED (SELECT vid, 1.0 / (SELECT n FROM nn) AS score FROM verts)"""
    )
    chain = []
    for i in range(1, HITS_ITERS + 1):
        chain.append(
            f""",
  ar{i} AS MATERIALIZED (SELECT e.dst AS vid, sum(h{i - 1}.score) AS raw
          FROM edges e JOIN h{i - 1} ON e.src = h{i - 1}.vid GROUP BY e.dst),
  a{i} AS MATERIALIZED (SELECT v.vid, coalesce(ar{i}.raw, 0) / (SELECT sum(raw) FROM ar{i}) AS score
         FROM verts v LEFT JOIN ar{i} USING (vid)),
  hr{i} AS MATERIALIZED (SELECT e.src AS vid, sum(a{i}.score) AS raw
          FROM edges e JOIN a{i} ON e.dst = a{i}.vid GROUP BY e.src),
  h{i} AS MATERIALIZED (SELECT v.vid, coalesce(hr{i}.raw, 0) / (SELECT sum(raw) FROM hr{i}) AS score
         FROM verts v LEFT JOIN hr{i} USING (vid))"""
        )
    return (
        base
        + "".join(chain)
        + f"""
  SELECT h{HITS_ITERS}.vid, round(h{HITS_ITERS}.score, 8) AS hub,
         round(a{HITS_ITERS}.score, 8) AS auth
  FROM h{HITS_ITERS} JOIN a{HITS_ITERS} USING (vid)"""
    )


def _transcript_salsa_sql() -> str:
    """Unrolled SALSA chain — the HITS twin with each spread divided by the
    sending endpoint's degree (fwd: outdeg of src, bwd: indeg of dst),
    parenthesis for parenthesis with operators/salsa.py."""
    base = (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + """,
  od AS MATERIALIZED (SELECT src AS vid, count(*) AS d FROM edges GROUP BY src),
  idg AS MATERIALIZED (SELECT dst AS vid, count(*) AS d FROM edges GROUP BY dst),
  nn AS (SELECT count(*)::DOUBLE AS n FROM verts),
  h0 AS MATERIALIZED (SELECT vid, 1.0 / (SELECT n FROM nn) AS score FROM verts)"""
    )
    chain = []
    for i in range(1, SALSA_ITERS + 1):
        chain.append(
            f""",
  ar{i} AS MATERIALIZED (SELECT e.dst AS vid, sum(h{i - 1}.score / od.d) AS raw
          FROM edges e JOIN h{i - 1} ON e.src = h{i - 1}.vid JOIN od ON od.vid = e.src
          GROUP BY e.dst),
  a{i} AS MATERIALIZED (SELECT v.vid, coalesce(ar{i}.raw, 0) / (SELECT sum(raw) FROM ar{i}) AS score
         FROM verts v LEFT JOIN ar{i} USING (vid)),
  hr{i} AS MATERIALIZED (SELECT e.src AS vid, sum(a{i}.score / idg.d) AS raw
          FROM edges e JOIN a{i} ON e.dst = a{i}.vid JOIN idg ON idg.vid = e.dst
          GROUP BY e.src),
  h{i} AS MATERIALIZED (SELECT v.vid, coalesce(hr{i}.raw, 0) / (SELECT sum(raw) FROM hr{i}) AS score
         FROM verts v LEFT JOIN hr{i} USING (vid))"""
        )
    return (
        base
        + "".join(chain)
        + f"""
  SELECT h{SALSA_ITERS}.vid, round(h{SALSA_ITERS}.score, 8) AS hub,
         round(a{SALSA_ITERS}.score, 8) AS auth
  FROM h{SALSA_ITERS} JOIN a{SALSA_ITERS} USING (vid)"""
    )


def _transcript_katz_sql() -> str:
    """Unrolled Katz chain (same shape as the PageRank/HITS oracles):
    x_i(v) = beta + alpha * sum of x_{i-1} over in-neighbors along the
    directed edge set, x_0 = beta. MATERIALIZED per step so DuckDB does not
    inline the chain exponentially."""
    base = (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + """,
  x0 AS MATERIALIZED (SELECT vid, 1.0 AS score FROM verts)"""
    )
    chain = []
    for i in range(1, KATZ_ITERS + 1):
        chain.append(
            f""",
  in{i} AS MATERIALIZED (SELECT e.dst AS vid, sum(x{i - 1}.score) AS raw
          FROM edges e JOIN x{i - 1} ON e.src = x{i - 1}.vid GROUP BY e.dst),
  x{i} AS MATERIALIZED (SELECT v.vid, 1.0 + {KATZ_ALPHA} * coalesce(in{i}.raw, 0) AS score
         FROM verts v LEFT JOIN in{i} USING (vid))"""
        )
    return (
        base
        + "".join(chain)
        + f"""
  SELECT vid, round(score, 8) AS katz FROM x{KATZ_ITERS}"""
    )


def _transcript_eigenvector_sql() -> str:
    """Unrolled eigenvector chain over the both-directions relation ``b``
    (same shape as the HITS twin: per step an in-flow sum then an L1
    normalization by the scalar sum)."""
    base = (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + """,
  nn AS (SELECT count(*)::DOUBLE AS n FROM verts),
  x0 AS MATERIALIZED (SELECT vid, 1.0 / (SELECT n FROM nn) AS score FROM verts)"""
    )
    chain = []
    for i in range(1, EIGEN_ITERS + 1):
        chain.append(
            f""",
  xr{i} AS MATERIALIZED (SELECT b.dst AS vid, sum(x{i - 1}.score) AS raw
          FROM b JOIN x{i - 1} ON b.src = x{i - 1}.vid GROUP BY b.dst),
  x{i} AS MATERIALIZED (SELECT v.vid,
           coalesce(coalesce(xr{i}.raw, 0) / (SELECT sum(raw) FROM xr{i}), 0.0) AS score
         FROM verts v LEFT JOIN xr{i} USING (vid))"""
        )
    # the outer coalesce matches hits._l1's `or 1.0` normalizer guard: an
    # edgeless graph yields 0.0 everywhere in both engines, not NULL
    return (
        base
        + "".join(chain)
        + f"""
  SELECT vid, round(score, 8) AS score FROM x{EIGEN_ITERS}"""
    )


def _transcript_betweenness_sql() -> str:
    """Unrolled Brandes twin: forward levels f0..fH accumulate per-source
    shortest-path counts (sigma) with a per-source visited anti-join;
    backward levels dH..d1 accumulate the dependency
    sigma_v/sigma_w*(1+delta_w) over level-(i+1) successors. Levels past
    the natural BFS depth are empty, which coalesces delta to 0 exactly as
    the engine's early-exit does. MATERIALIZED per level (the chain
    references each level several times)."""
    H = BETWEENNESS_HOPS
    base = (
        "WITH "
        + _transcript_tables_sql(300).lstrip()
        + """,
  f0 AS MATERIALIZED (SELECT vid AS s, vid, 1.0 AS sigma FROM tool_v),
  vis0 AS MATERIALIZED (SELECT s, vid FROM f0)"""
    )
    chain = []
    for i in range(1, H + 1):
        chain.append(
            f""",
  f{i} AS MATERIALIZED (
    SELECT f.s, b.dst AS vid, sum(f.sigma) AS sigma
    FROM b JOIN f{i - 1} f ON b.src = f.vid
    LEFT JOIN vis{i - 1} v ON v.s = f.s AND v.vid = b.dst
    WHERE v.vid IS NULL
    GROUP BY f.s, b.dst),
  vis{i} AS MATERIALIZED (SELECT s, vid FROM vis{i - 1} UNION ALL SELECT s, vid FROM f{i})"""
        )
    chain.append(f""",
  d{H} AS MATERIALIZED (SELECT s, vid, sigma, 0.0 AS delta FROM f{H})""")
    for i in range(H - 1, 0, -1):
        chain.append(
            f""",
  c{i} AS (SELECT f.s, f.vid, sum(f.sigma / g.sigma * (1.0 + g.delta)) AS delta
           FROM f{i} f JOIN b ON b.src = f.vid
           JOIN d{i + 1} g ON g.s = f.s AND g.vid = b.dst
           GROUP BY f.s, f.vid),
  d{i} AS MATERIALIZED (SELECT f.s, f.vid, f.sigma, coalesce(c.delta, 0.0) AS delta
         FROM f{i} f LEFT JOIN c{i} c ON c.s = f.s AND c.vid = f.vid)"""
        )
    union = "\n    UNION ALL ".join(f"SELECT vid, delta FROM d{i}" for i in range(1, H + 1))
    return (
        base
        + "".join(chain)
        + f""",
  alld AS ({union}),
  bcv AS (SELECT vid, sum(delta) AS bc FROM alld GROUP BY vid)
  SELECT v.vid, round(coalesce(bcv.bc, 0.0), 6) AS bc
  FROM verts v LEFT JOIN bcv USING (vid)"""
    )


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled synchronous degree-peel twin of operators/kcore.py: round i
    recomputes degrees over the subgraph induced by round i-1's survivors
    and drops vertices below k. ``rounds`` must be ≥ the instance's peel
    depth **+ 1** (verified at the sf0.01 contract scale): the final SELECT
    reports degrees computed over round ``rounds-1``'s survivor set, so at
    exactly rounds == depth the deg column would still include neighbors
    peeled in the last round — the trailing no-op round is what makes the
    reported within-core degrees correct (same bound as the truss twin).
    Further extra rounds are no-ops at the fixpoint."""
    parts = [
        f"""WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
  b AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
  v0 AS MATERIALIZED (SELECT DISTINCT src AS vid FROM b)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
  d{i} AS MATERIALIZED (SELECT b.src AS vid, count(*) AS deg FROM b
        JOIN v{i - 1} p ON b.src = p.vid JOIN v{i - 1} q ON b.dst = q.vid GROUP BY b.src),
  v{i} AS MATERIALIZED (SELECT vid FROM d{i} WHERE deg >= {k})"""
        )
    parts.append(
        f"""
  SELECT vid, deg::BIGINT AS deg FROM d{rounds} WHERE deg >= {k}"""
    )
    return "".join(parts)


def _coreness_sql(rounds: int) -> str:
    """Unrolled iterated-h-index twin of operators/coreness.py: c0 = degree,
    round i scores every vertex with the h-index of its neighbors' round-
    (i-1) scores, computed on the tie-compressed (vid, score) histogram with
    a descending cumulative count — identical arithmetic to the engine's
    window plan. ``rounds`` must be ≥ the instance's convergence depth
    (asserted at contract scale in tests); the fixpoint is stable, so any
    slack rounds leave the relation unchanged."""
    parts = [
        f"""WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
  b AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
  c0 AS MATERIALIZED (SELECT src AS vid, count(*)::BIGINT AS c FROM b GROUP BY src)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
  g{i} AS MATERIALIZED (SELECT b.src AS vid, p.c AS cn, count(*) AS k
        FROM b JOIN c{i - 1} p ON b.dst = p.vid GROUP BY b.src, p.c),
  c{i} AS MATERIALIZED (SELECT vid, max(least(cn, cum))::BIGINT AS c FROM (
        SELECT vid, cn, sum(k) OVER (PARTITION BY vid ORDER BY cn DESC) AS cum FROM g{i})
        GROUP BY vid)"""
        )
    parts.append(f"\n  SELECT vid, c AS coreness FROM c{rounds}")
    return "".join(parts)


def _transcript_roundtrip_sql() -> str:
    fx = _transcript_fixture(50)
    return f"SELECT conv_id, turn_idx, TRUE AS text_equal FROM read_parquet('{fx}')"


def _near_duplicates_sql(n_hashes: int = 8, bands: int = 4, max_bucket: int = 1000, threshold: float = 0.2) -> str:
    """DuckDB twin of near_duplicates(threshold=0.2, n_hashes=8, bands=4,
    shingle_n=2): same md5 hash family, band assembly, spam-bucket guard and
    exact shingle-set Jaccard."""
    rows_per_band = n_hashes // bands
    hash_aggs = ", ".join(f"min(md5('{i}:' || s)) AS h{i}" for i in range(n_hashes))
    band_rows = "\n    UNION ALL\n    ".join(
        "SELECT doc_id AS id, '"
        + str(bnd)
        + "' || '|' || "
        + " || '|' || ".join(f"h{bnd * rows_per_band + j}" for j in range(rows_per_band))
        + " AS band FROM sig"
        for bnd in range(bands)
    )
    return f"""
  WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM documents
  ), sh AS (
    SELECT doc_id,
           CASE WHEN len(tk) = 0 THEN []::VARCHAR[]
                ELSE list_transform(generate_series(0, greatest(len(tk) - 2, 0)),
                                    i -> array_to_string(tk[i + 1 : i + 2], ' '))
           END AS shingles
    FROM toks
  ), ex AS (
    SELECT doc_id, unnest(shingles) AS s FROM sh
  ), sig AS (
    SELECT doc_id, {hash_aggs} FROM ex GROUP BY doc_id
  ), banded AS (
    {band_rows}
  ), ok AS (
    SELECT banded.* FROM banded
    JOIN (SELECT band FROM banded GROUP BY band HAVING count(*) <= {max_bucket}) g USING (band)
  ), cand AS (
    SELECT DISTINCT a.id AS a, b.id AS b FROM ok a JOIN ok b ON a.band = b.band AND a.id < b.id
  ), shd AS (
    SELECT doc_id, list_distinct(shingles) AS dsh FROM sh
  ), j AS (
    SELECT cand.a, cand.b,
           len(list_intersect(sa.dsh, sb.dsh)) / len(list_distinct(list_concat(sa.dsh, sb.dsh))) AS jaccard
    FROM cand JOIN shd sa ON sa.doc_id = cand.a JOIN shd sb ON sb.doc_id = cand.b
  )
  SELECT a, b, round(jaccard, 6) AS jaccard FROM j WHERE jaccard >= {threshold}
  """


def _ann_lsh_sql(k: int = 5, multi_probe: int = 0) -> str:
    """Twin of cosine_topk_lsh: identical SRP buckets; with ``multi_probe`` the
    query probes the buckets reached by flipping the first ``multi_probe``
    hyperplane signs (sim/ann.py:233-242), candidates deduped before ranking."""
    from elektra_spark.sim.ann import srp_bucket_sql

    srp_c = srp_bucket_sql("cv")
    srp_q = srp_bucket_sql("qv")
    if multi_probe > 0:
        probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << p})" for p in range(multi_probe)])
        qb = f"""qb0 AS (SELECT query_id, qv, {srp_q} AS bucket FROM q),
  qb AS (SELECT query_id, qv, unnest([{probes}]) AS bucket FROM qb0),
  cand AS (SELECT DISTINCT query_id, nbr FROM qb JOIN cb USING (bucket) WHERE query_id <> nbr),
  s AS (SELECT query_id, nbr,
               list_inner_product(qv, cv)
                 / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS sim
        FROM cand JOIN q USING (query_id) JOIN c USING (nbr))"""
    else:
        qb = f"""qb AS (SELECT query_id, qv, {srp_q} AS bucket FROM q),
  s AS (SELECT query_id, nbr,
               list_inner_product(qv, cv)
                 / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS sim
        FROM qb JOIN cb USING (bucket) WHERE query_id <> nbr)"""
    return f"""
  WITH c AS (SELECT vec_id AS nbr, embedding::DOUBLE[] AS cv FROM embeddings),
  cb AS (SELECT nbr, cv, {srp_c} AS bucket FROM c),
  q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
  {qb},
  r AS (SELECT query_id, nbr, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nbr ASC) AS rank
        FROM s)
  SELECT query_id, nbr, round(sim, 6) AS sim, rank FROM r WHERE rank <= {k}
  """


PQ_M, PQ_K = 4, 8  # 4 blocks of 16 dims, 8 codewords each: 64 floats → 4×3 bits


def q_pq_codes_docs(spark, sf_dir):
    """Product-quantization codes (sim/pq.py, Jégou et al. TPAMI 2011):
    per-block nearest-codeword ids + total squared reconstruction error,
    codebooks trained on the SAME deterministic sample as the IVF
    quantizer. Encoding is one narrow column expression — codebooks ride
    as literals, the corpus never shuffles."""
    from elektra_spark.sim.pq import pq_encode, train_codebooks

    emb = _t(spark, sf_dir, "embeddings")
    books = train_codebooks(_ivf_sample(sf_dir), m=PQ_M, k=PQ_K, iters=IVF_ITERS)
    return pq_encode(emb, books)


def _pq_codes_sql() -> str:
    """Twin of q_pq_codes_docs — identical codebook literals, slices,
    distance arithmetic, and min-id argmin (trains from $ELEKTRA_SF_DIR
    like the IVF twin)."""
    from elektra_spark.sim.pq import pq_encode_sql, train_codebooks

    sf_dir = os.environ.get("ELEKTRA_SF_DIR", "/root/testdata/sf0.01")
    books = train_codebooks(_ivf_sample(sf_dir), m=PQ_M, k=PQ_K, iters=IVF_ITERS)
    return pq_encode_sql(books)


PQ_QUERY_MOD = 50  # 10 query vectors over the 500-vector sf0.01 corpus


def q_pq_topk_docs(spark, sf_dir):
    """Asymmetric-distance top-k over PQ codes (sim/pq.py pq_topk): the
    corpus is read ONLY through its 4 code columns; per query each block
    contributes one LUT lookup, so the scan is O(M) per candidate instead
    of O(D) — the read path PQ compression exists for."""
    from elektra_spark.sim.pq import pq_encode, pq_topk, train_codebooks

    emb = _t(spark, sf_dir, "embeddings")
    books = train_codebooks(_ivf_sample(sf_dir), m=PQ_M, k=PQ_K, iters=IVF_ITERS)
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") % PQ_QUERY_MOD == 0)
    return pq_topk(codes, queries, books, k=5)


def _pq_topk_sql() -> str:
    """Twin of q_pq_topk_docs — shared codebook literals and encode pieces,
    identical LUT arithmetic and (adc, nbr) cut."""
    from elektra_spark.sim.pq import pq_topk_sql, train_codebooks

    sf_dir = os.environ.get("ELEKTRA_SF_DIR", "/root/testdata/sf0.01")
    books = train_codebooks(_ivf_sample(sf_dir), m=PQ_M, k=PQ_K, iters=IVF_ITERS)
    return pq_topk_sql(books, query_pred=f"id % {PQ_QUERY_MOD} = 0", k=5)


# keep docs scored toward the lang-target distribution. NOT 0.0: with B=1024
# buckets against ~5.6k target tokens at sf0.01, add-one smoothing flattens
# p_t more than p_r and EVERY score lands negative (measured min -0.073 /
# median -0.0465 / max -0.0064); the cut sits at the measured median so the
# gate keeps 253/500 — a real split, not a vacuous pass-all or drop-all
DSIR_KEEP_MIN = -0.0465


def q_curation_manifest_docs(spark, sf_dir):
    """End-to-end curation manifest composing the round-5 ops: SemDeDup
    drops within-cluster semantic near-dups (embeddings keyed to doc ids),
    the DSIR gate keeps documents scored toward the lang='en' target, and
    the survivors pack into PACK_CONTEXT_LEN-token training windows — the
    (doc → window) manifest a training job actually consumes. Each stage is
    separately oracle-checked; this row checks the COMPOSITION."""
    from elektra_spark.sim.ivf import train_centroids
    from elektra_spark.sim.semdedup import semdedup
    from elektra_spark.text.dsir import dsir_weights
    from elektra_spark.text.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    cents = train_centroids(_ivf_sample(sf_dir), k=IVF_K, iters=IVF_ITERS)
    sd = (
        semdedup(emb, cents, threshold=SEMDEDUP_TAU)
        .filter(F.col("kept"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    ds = (
        dsir_weights(docs, target=F.col("lang") == DSIR_TARGET_LANG)
        .filter(F.col("dsir_score") > DSIR_KEEP_MIN)
        .select("doc_id")
    )
    kept = docs.join(sd, "doc_id").join(ds, "doc_id")
    return pack_sequences(kept, context_len=PACK_CONTEXT_LEN)


def _curation_manifest_sql() -> str:
    """Twin of q_curation_manifest_docs — the same three twins chained as
    CTEs (nested WITHs live inside derived tables)."""
    from elektra_spark.sim.ivf import train_centroids
    from elektra_spark.sim.semdedup import semdedup_sql
    from elektra_spark.text.dsir import dsir_sql
    from elektra_spark.text.packing import pack_sequences_sql

    sf_dir = os.environ.get("ELEKTRA_SF_DIR", "/root/testdata/sf0.01")
    cents = train_centroids(_ivf_sample(sf_dir), k=IVF_K, iters=IVF_ITERS)
    sd = semdedup_sql(cents, threshold=SEMDEDUP_TAU)
    ds = dsir_sql(target_pred=f"lang = '{DSIR_TARGET_LANG}'")
    pack = pack_sequences_sql(context_len=PACK_CONTEXT_LEN, table="kept")
    return f"""
  WITH sd AS (SELECT vec_id FROM ({sd}) s WHERE s.kept),
  ds AS (SELECT doc_id FROM ({ds}) d WHERE d.dsir_score > {DSIR_KEEP_MIN!r}),
  kept AS (SELECT doc.* FROM documents doc
           JOIN sd ON doc.doc_id = sd.vec_id
           JOIN ds ON doc.doc_id = ds.doc_id)
  SELECT * FROM ({pack}) p
  """


def q_semdedup_docs(spark, sf_dir):
    """SemDeDup (sim/semdedup.py, Abbas et al. 2023): k-means-cluster the
    embedding corpus with the SAME deterministic sample-trained quantizer
    the IVF path uses, then within each cluster drop every vector within
    cosine SEMDEDUP_TAU of a lower-id clustermate. Quadratic only inside a
    cluster; the cluster id is the one shuffle key."""
    from elektra_spark.sim.ivf import train_centroids
    from elektra_spark.sim.semdedup import semdedup

    emb = _t(spark, sf_dir, "embeddings")
    centroids = train_centroids(_ivf_sample(sf_dir), k=IVF_K, iters=IVF_ITERS)
    return semdedup(emb, centroids, threshold=SEMDEDUP_TAU)


def _semdedup_sql() -> str:
    """Twin of q_semdedup_docs — same centroid literals, same argmax
    assignment, same fold cosine, same keep rule (trains from
    $ELEKTRA_SF_DIR like the IVF twin)."""
    from elektra_spark.sim.ivf import train_centroids
    from elektra_spark.sim.semdedup import semdedup_sql

    sf_dir = os.environ.get("ELEKTRA_SF_DIR", "/root/testdata/sf0.01")
    centroids = train_centroids(_ivf_sample(sf_dir), k=IVF_K, iters=IVF_ITERS)
    return semdedup_sql(centroids, threshold=SEMDEDUP_TAU)


def _ann_ivf_sql() -> str:
    """Twin of q_ann_ivf_docs. The quantizer must train on the SAME data the
    engine trains on (q_ann_ivf_docs trains from the harness's sf_dir), so
    the twin reads the scale directory from $ELEKTRA_SF_DIR when the harness
    exports it (tools/check_contract.py does) and falls back to sf0.01 — the
    scale the driver's correctness compare always runs at. Round-3 ADVICE:
    the previous hardcoded sf0.01 path guaranteed a mismatch at any other sf."""
    from elektra_spark.sim.ivf import ivf_topk_sql, train_centroids

    sf_dir = os.environ.get("ELEKTRA_SF_DIR", "/root/testdata/sf0.01")
    centroids = train_centroids(_ivf_sample(sf_dir), k=IVF_K, iters=IVF_ITERS)
    return ivf_topk_sql(centroids, k=5, nprobe=IVF_NPROBE)


def _feature_prop_sql() -> str:
    """Twin of q_feature_prop_embeddings: same kNN derivation (cosine
    rounded 1e-6, rank with nbr tiebreak, canonical symmetrization), same
    2^20 quantization, FEATPROP_ROUNDS unrolled exact-integer sum-push
    rounds in long (vid, dim) format."""
    from elektra_spark.operators.featprop import FEATPROP_Q

    chain = []
    for i in range(1, FEATPROP_ROUNDS + 1):
        chain.append(
            f""",
  h{i} AS MATERIALIZED (SELECT h.vid, h.dim, (h.h + coalesce(c.s, 0))::BIGINT AS h
      FROM h{i - 1} h LEFT JOIN (
        SELECT bd.src AS vid, p.dim, sum(p.h) AS s
        FROM bd JOIN h{i - 1} p ON p.vid = bd.dst GROUP BY bd.src, p.dim) c
      ON c.vid = h.vid AND c.dim = h.dim)"""
        )
    return (
        f"""
  WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  s AS MATERIALIZED (SELECT a.vec_id AS qid, b.vec_id AS nbr,
         round(list_inner_product(a.v, b.v)
           / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6) AS sim
       FROM e a JOIN e b ON a.vec_id <> b.vec_id),
  rk AS (SELECT qid, nbr,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nbr ASC) AS rank
         FROM s),
  ed AS MATERIALIZED (SELECT DISTINCT least(qid, nbr) AS src, greatest(qid, nbr) AS dst
      FROM rk WHERE rank <= {FEATPROP_KNN}),
  bd AS (SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed),
  h0 AS MATERIALIZED (SELECT vec_id AS vid, g.dim::INTEGER AS dim,
             round(v[g.dim] * {float(FEATPROP_Q)!r})::BIGINT AS h
      FROM e, generate_series(1, {KMEANS_DIM}) g(dim))"""
        + "".join(chain)
        + f"""
  SELECT vid, dim, h FROM h{FEATPROP_ROUNDS}"""
    )


def _ann_topk_brute_sql(k: int = 5) -> str:
    """Same cosines as the ann_topk oracle, but ranked on round(sim, 6) with
    nbr tiebreak — the contract q_ann_topk_brute_docs pins."""
    return f"""
  WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
  c AS (SELECT vec_id AS nbr, embedding::DOUBLE[] AS cv FROM embeddings),
  s AS (SELECT query_id, nbr,
               round(list_inner_product(qv, cv)
                 / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))), 6) AS sim
        FROM q CROSS JOIN c WHERE query_id <> nbr),
  r AS (SELECT query_id, nbr, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nbr ASC) AS rank
        FROM s)
  SELECT query_id, nbr, sim, rank FROM r WHERE rank <= {k}
  """


def _embedding_near_dups_sql(threshold: float = 0.4, n_planes: int = 4) -> str:
    from elektra_spark.sim.ann import srp_bucket_sql

    srp = srp_bucket_sql("v", n_planes=n_planes)
    return f"""
  WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
  eb AS (SELECT id, v, {srp} AS bucket FROM e),
  s AS (SELECT a.id AS a, b.id AS b,
               list_inner_product(a.v, b.v)
                 / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) AS sim
        FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.id < b.id)
  SELECT a, b, round(sim, 6) AS sim FROM s WHERE sim >= {threshold}
  """


def _multimodal_sql(n: int = 48, seed: int = 42) -> str:
    """Twin of q_multimodal_features: synth_media payload bytes and the
    decode_stub byte-sum fold are both pure integer functions of
    (media_id, byte index), so the f0 feature (column-0 byte sum / 256, exact
    in float32) is reproducible in SQL. Mirrors
    elektra_spark/multimodal/binary.py synth_media + decode_stub."""
    return f"""
  WITH m AS (SELECT i::BIGINT AS media_id, 64 + (i * 37 + {seed}) % 512 AS n_bytes
             FROM generate_series(0, {n - 1}) t(i))
  SELECT media_id,
         CASE media_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         n_bytes,
         round(list_sum(list_transform(generate_series(0, n_bytes - 1, 16),
                                       j -> (media_id * 131 + j * 17 + {seed}) % 256)) / 256.0,
               6) AS f0
  FROM m
  """


def _wav_features_sql(n: int = 48, seed: int = 42) -> str:
    """Twin of q_wav_features: synth_wav_media's PCM samples are
    ``(id*257 + j*73 + seed) % 4096 - 2048`` at 8 kHz mono, so every decoded
    feature is integer-exact. The Spark side REALLY parses the RIFF bytes
    (elektra_spark/multimodal/binary.py decode_wav); this twin recomputes
    from the generation formula — agreement proves the parse."""
    return f"""
  WITH m AS (SELECT i::BIGINT AS media_id, 64 + (i * 37 + {seed}) % 256 AS ns
             FROM generate_series(0, {n - 1}) t(i)),
  s AS (SELECT media_id, ns,
               list_transform(generate_series(0, ns - 1),
                              j -> (media_id * 257 + j * 73 + {seed}) % 4096 - 2048) AS smp
        FROM m)
  SELECT media_id,
         8000::BIGINT AS sample_rate,
         1::BIGINT AS n_channels,
         ns::BIGINT AS n_samples,
         (ns * 1000 // 8000)::BIGINT AS duration_ms,
         list_max(list_transform(smp, x -> abs(x)))::BIGINT AS peak,
         round(list_sum(list_transform(smp, x -> abs(x)))::DOUBLE / ns, 6) AS mean_abs
  FROM s
  """


def _bmp_features_sql(n: int = 48, seed: int = 42) -> str:
    """Twin of q_bmp_features: synth_bmp_media's RGB pixels are
    ``(id*31 + y*7 + x*3 + c*11 + seed) % 256`` at w = 5 + id%6,
    h = 4 + id%5, so the decoded channel means are integer-exact. The Spark
    side REALLY parses the BMP bytes (decode_bmp); this twin recomputes
    from the generation formula — agreement proves the parse."""

    def chan_sum(c: int) -> str:
        return (
            "list_sum(flatten(list_transform(generate_series(0, h - 1), "
            "y -> list_transform(generate_series(0, w - 1), "
            f"x -> (media_id * 31 + y * 7 + x * 3 + {c} * 11 + {seed}) % 256))))"
        )

    return f"""
  WITH m AS (SELECT i::BIGINT AS media_id, 5 + (i % 6) AS w, 4 + (i % 5) AS h
             FROM generate_series(0, {n - 1}) t(i)),
  s AS (SELECT media_id, w, h,
               {chan_sum(0)} AS sr,
               {chan_sum(1)} AS sg,
               {chan_sum(2)} AS sb
        FROM m)
  SELECT media_id,
         w::BIGINT AS width,
         h::BIGINT AS height,
         (w * h)::BIGINT AS n_pixels,
         round(sr::DOUBLE / (w * h), 6) AS mean_r,
         round(sg::DOUBLE / (w * h), 6) AS mean_g,
         round(sb::DOUBLE / (w * h), 6) AS mean_b
  FROM s
  """


def _lpa_chain() -> str:
    """Shared unrolled-LPA CTE block (customer↔orders graph) ending at the
    final label relation ``l{LPA_ROUNDS}(vid, label)`` — the single source
    both the lpa oracle and the modularity oracle build on, so partition
    and quality score are twinned against the same chain by construction."""
    base = f"""
  WITH v AS (SELECT c_custkey AS vid FROM customer
             UNION ALL SELECT {ORDER_VID_OFFSET} + o_orderkey FROM orders),
  e AS MATERIALIZED (SELECT o_custkey AS src, {ORDER_VID_OFFSET} + o_orderkey AS dst FROM orders),
  b AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
  l0 AS (SELECT vid, vid AS label FROM v)"""
    iters = []
    for i in range(1, LPA_ROUNDS + 1):
        p = f"l{i - 1}"
        iters.append(
            f""",
  vt{i} AS (SELECT b.dst AS v, l.label, count(*) AS c
            FROM b JOIN {p} l ON b.src = l.vid GROUP BY b.dst, l.label),
  w{i} AS (SELECT v, label FROM (
             SELECT v, label, row_number() OVER (PARTITION BY v ORDER BY c DESC, label ASC) AS rn
             FROM vt{i}) WHERE rn = 1),
  l{i} AS MATERIALIZED (SELECT l.vid, coalesce(w.label, l.label) AS label
           FROM {p} l LEFT JOIN w{i} w ON l.vid = w.v)"""
        )
    return base + "".join(iters)


def _lpa_sql() -> str:
    return _lpa_chain() + f"\n  SELECT vid, label FROM l{LPA_ROUNDS}"


def _modularity_sql() -> str:
    """Twin of q_modularity_lpa_customer_orders: the shared _lpa_chain
    partition, then the same exact-integer aggregates (A = intra edges,
    B = Σ deg_c²) combined in the identical two-division expression
    A/m − B/(4·m²)."""
    lf = f"l{LPA_ROUNDS}"
    return (
        _lpa_chain()
        + f""",
  mm AS (SELECT count(*)::BIGINT AS m FROM e),
  el AS (SELECT ls.label AS ls, ld.label AS ld
         FROM e JOIN {lf} ls ON e.src = ls.vid JOIN {lf} ld ON e.dst = ld.vid),
  intra AS (SELECT count(*)::BIGINT AS a FROM el WHERE ls = ld),
  degc AS (SELECT l.label, count(*)::BIGINT AS deg_c
           FROM b JOIN {lf} l ON b.src = l.vid GROUP BY l.label),
  sums AS (SELECT count(*)::BIGINT AS n_communities, sum(deg_c * deg_c)::BIGINT AS bsum FROM degc)
  SELECT sums.n_communities, intra.a AS intra_edges,
         round(intra.a::DOUBLE / mm.m::DOUBLE
               - sums.bsum::DOUBLE / (4.0 * mm.m * mm.m), 6) AS modularity
  FROM sums, intra, mm"""
    )


def _conductance_sql() -> str:
    """Twin of q_conductance_lpa_customer_orders: the shared _lpa_chain
    partition, then integer cut/volume per community and the identical
    guarded division."""
    lf = f"l{LPA_ROUNDS}"
    return (
        _lpa_chain()
        + f""",
  mm AS (SELECT count(*)::BIGINT AS m FROM e),
  el AS (SELECT ls.label AS ls, ld.label AS ld
         FROM e JOIN {lf} ls ON e.src = ls.vid JOIN {lf} ld ON e.dst = ld.vid),
  cr AS (SELECT ls AS label FROM el WHERE ls <> ld
         UNION ALL SELECT ld FROM el WHERE ls <> ld),
  cuts AS (SELECT label, count(*)::BIGINT AS cut_edges FROM cr GROUP BY label),
  vol AS (SELECT l.label, count(*)::BIGINT AS volume
          FROM b JOIN {lf} l ON b.src = l.vid GROUP BY l.label)
  SELECT vol.label, coalesce(cuts.cut_edges, 0)::BIGINT AS cut_edges, vol.volume,
         CASE WHEN least(vol.volume, 2 * mm.m - vol.volume) <= 0 THEN 0.0
              ELSE round(coalesce(cuts.cut_edges, 0)::DOUBLE
                         / least(vol.volume, 2 * mm.m - vol.volume)::DOUBLE, 6) END AS conductance
  FROM vol LEFT JOIN cuts USING (label) CROSS JOIN mm"""
    )


def _jaccard_sql() -> str:
    """Twin of q_jaccard_copurchase: identical pivot degree guard for the
    numerator, full-degree union denominator, NOT-EXISTS edge exclusion,
    and the (round(score,6) DESC, a, b) top-k cut."""
    return f"""
  WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
  b AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
  d AS MATERIALIZED (SELECT src AS vid, count(*) AS degree FROM b GROUP BY src),
  piv AS (SELECT vid FROM d WHERE degree >= 2 AND degree <= {LINKPRED_MAX_PIVOT_DEG}),
  adj AS MATERIALIZED (SELECT b.src AS w, b.dst AS nbr FROM b JOIN piv ON b.src = piv.vid),
  p AS (SELECT l.nbr AS a, r.nbr AS b2 FROM adj l JOIN adj r ON l.w = r.w AND l.nbr < r.nbr),
  s AS (SELECT a, b2 AS b, count(*)::BIGINT AS common_neighbors FROM p GROUP BY a, b2),
  f AS (SELECT s.* FROM s
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = s.a AND e.dst = s.b)),
  j AS (SELECT f.a, f.b, f.common_neighbors,
               round(f.common_neighbors::DOUBLE
                     / (da.degree + db.degree - f.common_neighbors)::DOUBLE, 6) AS jaccard_score
        FROM f JOIN d da ON da.vid = f.a JOIN d db ON db.vid = f.b)
  SELECT a::BIGINT AS a, b::BIGINT AS b, common_neighbors, jaccard_score
  FROM j ORDER BY jaccard_score DESC, a, b LIMIT {LINKPRED_TOP_K}
  """


def _triangles_sampled_sql() -> str:
    """Twin of q_triangles_sampled_copurchase: the identical deterministic
    coin expression selects the identical edge subset, counted by the same
    canonical a<b<c join, scaled by the same exact (1000/p)³ constant."""
    scale = (1000.0 / TRI_SAMPLE_PERMILLE) ** 3
    return f"""
  WITH e0 AS ({_COPURCHASE_SQL}),
  e AS MATERIALIZED (SELECT src, dst FROM e0
                     WHERE (src * 1000003 + dst * 997) % 1000 < {TRI_SAMPLE_PERMILLE}),
  ne AS (SELECT count(*)::BIGINT AS n FROM e),
  t AS (SELECT count(*)::BIGINT AS ts
        FROM e e1 JOIN e e2 ON e1.dst = e2.src
        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst)
  SELECT ne.n AS n_sampled_edges, t.ts AS n_triangles_sampled,
         round(t.ts::DOUBLE * {scale!r}, 6) AS estimated_triangles
  FROM ne, t
  """


def _text_profile_sql() -> str:
    """Generated from the same marker sets / constants as text_profile."""
    from elektra_spark.text.analysis import EN_STOPWORDS, LANG_MARKERS

    sw = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    # lang fold with strictly-greater replacement, same iteration order
    hit_cols = []
    for lang, markers in LANG_MARKERS.items():
        marks = ", ".join(f"'{m}'" for m in markers)
        hit_cols.append(
            f"len(list_filter(toks, t -> list_contains([{marks}], t))) AS h_{lang}"
        )
    langs = list(LANG_MARKERS)
    pred_expr, best_hits = "'und'", "0"
    for lang in langs:
        pred_expr = f"CASE WHEN h_{lang} > {best_hits} THEN '{lang}' ELSE {pred_expr} END"
        best_hits = f"greatest(h_{lang}, {best_hits})"
    return f"""
  WITH t0 AS (
    SELECT doc_id, text, string_split(text, ' ') AS toks,
           length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE
             / greatest(length(text), 1) AS punct_raw
    FROM documents
  ), t1 AS (
    SELECT doc_id, text, toks, punct_raw,
           len(toks) AS n_tokens,
           len(list_distinct(toks))::DOUBLE / len(toks) AS ttr_raw,
           len(list_filter(toks, t -> list_contains([{sw}], t)))::DOUBLE
             / greatest(len(toks), 1) AS sw_raw,
           {", ".join(hit_cols)}
    FROM t0
  )
  SELECT doc_id,
         n_tokens,
         round(ttr_raw, 6) AS ttr,
         round(punct_raw, 6) AS punct_ratio,
         round(sw_raw, 6) AS stopword_ratio,
         round(0.5 * (CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.3 END)
               + 0.4 * ttr_raw + 0.1 * (1 - punct_raw), 6) AS quality,
         {pred_expr} AS lang_pred,
         md5(array_to_string(list_filter(toks, x -> x <> ''), ' ')) AS fp
  FROM t1
  """


def _dsir_weights_sql() -> str:
    """Twin of q_dsir_weights_docs — same md5-slice bucket hash, smoothing,
    and per-token join + sum (text/dsir.py dsir_sql)."""
    from elektra_spark.text.dsir import dsir_sql

    return dsir_sql(target_pred=f"lang = '{DSIR_TARGET_LANG}'")


def _token_cms_sql() -> str:
    """Twin of q_token_cms_docs — identical md5 row keying, sketch, and
    min-estimate (text/cms.py token_cms_sql)."""
    from elektra_spark.text.cms import token_cms_sql

    return token_cms_sql(width=CMS_WIDTH)


def _pack_sequences_sql() -> str:
    """Twin of q_pack_sequences_docs — single ordered window cumsum with the
    identical integral bin arithmetic (text/packing.py pack_sequences_sql)."""
    from elektra_spark.text.packing import pack_sequences_sql

    return pack_sequences_sql(context_len=PACK_CONTEXT_LEN)


def _pii_scan_sql() -> str:
    """Twin of q_pii_scan_docs — identical PII augmentation expression fed
    through the shared pattern/redaction literals (text/patterns.py)."""
    from elektra_spark.text.patterns import pattern_tags_sql

    return pattern_tags_sql(text_expr=f"({_PII_AUGMENT_SQL})")


def _token_stats_sql() -> str:
    """Twin of q_token_stats_docs, generated from the same regex/constants."""
    from elektra_spark.text.analysis import BPE_CHARS_PER_SUBWORD, BPE_PIECE_RE

    return f"""
  WITH b AS (
    SELECT doc_id, text,
           coalesce(list_sum(list_transform(
             regexp_extract_all(text, '{BPE_PIECE_RE}'),
             p -> CASE WHEN regexp_matches(p, '^[A-Za-z]')
                         THEN ceil(len(p) / {BPE_CHARS_PER_SUBWORD}.0)::BIGINT
                       WHEN regexp_matches(p, '^[0-9]') THEN len(p)::BIGINT
                       ELSE 1::BIGINT END)), 0)::BIGINT AS bpe_tokens
    FROM documents
  )
  SELECT doc_id,
         len(string_split(text, ' '))::BIGINT AS ws_tokens,
         bpe_tokens,
         round(length(text)::DOUBLE / greatest(bpe_tokens, 1), 6) AS chars_per_bpe_token
  FROM b
  """


def _corpus_sample_sql() -> str:
    """Twin of q_corpus_sample_docs: same md5-prefix threshold and the same
    total-ordered (hash, doc_id) per-language rank."""
    from elektra_spark.text.sampling import hash_threshold

    t = hash_threshold(SAMPLE_RATE)
    return f"""
  WITH s AS (SELECT doc_id, lang FROM documents
             WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{t}'),
  r AS (SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                 ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rk
        FROM s)
  SELECT doc_id, lang FROM r WHERE rk <= {SAMPLE_QUOTA}"""


def _corpus_budget_sql() -> str:
    """Twin of q_corpus_budget_docs: identical (md5-prefix, doc_id) order and
    an explicit ROWS frame for the inclusive running sum."""
    return f"""
  WITH c AS (SELECT doc_id, lang, n_chars,
               sum(n_chars) OVER (PARTITION BY lang
                 ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
             FROM documents)
  SELECT doc_id, lang, n_chars FROM c WHERE cum <= {CHAR_BUDGET}"""


def _passage_dedup_sql() -> str:
    """Twin of q_passage_dedup_docs: identical window slicing (1-based
    inclusive list slice = Spark's slice(toks, g·W+1, W)), identical winner
    rule (first occurrence under (doc_id, pidx) order per md5), identical
    single-space re-join — byte-exact, no floats."""
    w = PASSAGE_TOKENS
    return f"""
  WITH base AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks FROM documents),
  p AS MATERIALIZED (
    SELECT doc_id, gs.g::INTEGER AS pidx,
           array_to_string(toks[gs.g*{w}+1 : gs.g*{w}+{w}], ' ') AS passage
    FROM base, LATERAL (SELECT unnest(generate_series(0,
         greatest(CAST(ceil(len(base.toks)::DOUBLE / {w}) AS INTEGER), 1) - 1)) AS g) gs),
  k AS (SELECT doc_id, pidx, passage,
          row_number() OVER (PARTITION BY md5(passage) ORDER BY doc_id, pidx) AS rn
        FROM p)
  SELECT doc_id, count(*)::INTEGER AS n_passages,
         sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::INTEGER AS n_kept,
         coalesce(string_agg(CASE WHEN rn = 1 THEN passage END, ' ' ORDER BY pidx), '') AS clean_text
  FROM k GROUP BY doc_id
  """


def _chunk_docs_sql() -> str:
    """Twin of q_chunk_docs: identical window generation via a lateral
    generate_series — byte-identical substrings."""
    return f"""
  WITH mx AS (SELECT (greatest(max(length(coalesce(text, ''))), 1) - 1) // {CHUNK_STRIDE} AS m
              FROM documents),
  g AS (SELECT unnest(generate_series(0, (SELECT m FROM mx))) AS i)
  SELECT doc_id, g.i::INTEGER AS chunk_idx,
         substr(coalesce(text, ''), (g.i * {CHUNK_STRIDE} + 1)::INTEGER, {CHUNK_SIZE}) AS chunk_text,
         length(substr(coalesce(text, ''), (g.i * {CHUNK_STRIDE} + 1)::INTEGER, {CHUNK_SIZE}))::BIGINT AS n_chars
  FROM documents CROSS JOIN g
  WHERE g.i <= (greatest(length(coalesce(text, '')), 1) - 1) // {CHUNK_STRIDE}"""


def _corpus_sample_stream_sql() -> str:
    """Twin of q_corpus_sample_stream: the per-language quota rank over the
    FULL table (no Bernoulli pre-filter) — what the streaming min-k state
    must converge to regardless of micro-batch split."""
    return f"""
  WITH r AS (SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                 ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rk
             FROM documents)
  SELECT doc_id, lang FROM r WHERE rk <= {SAMPLE_QUOTA}"""


def _corpus_filter_sql() -> str:
    """Twin of q_corpus_filter_docs, composed from the same generated twins
    (profile, near-dup pairs, BPE tokens)."""
    return f"""
  WITH prof AS ({_text_profile_sql()}),
  nd AS (SELECT DISTINCT b AS doc_id FROM ({_near_duplicates_sql()})),
  toks AS ({_token_stats_sql()}),
  rep AS (SELECT doc_id, lang_pred, quality,
                 min(doc_id) OVER (PARTITION BY fp) AS rep_id FROM prof),
  kept AS (
    SELECT r.doc_id, r.lang_pred FROM rep r
    WHERE r.quality >= 0.5 AND r.doc_id = r.rep_id
      AND r.doc_id NOT IN (SELECT doc_id FROM nd)
  )
  SELECT k.lang_pred, count(*) AS n_docs, sum(t.bpe_tokens)::BIGINT AS total_bpe_tokens
  FROM kept k JOIN toks t USING (doc_id)
  GROUP BY k.lang_pred
  """


def _minhash_sql(n_hashes: int = 4) -> str:
    aggs = ", ".join(f"min(md5('{i}:' || tok)) AS h{i}" for i in range(n_hashes))
    return f"""
  SELECT doc_id, {aggs}
  FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents)
  GROUP BY doc_id
  """


def _minhash_candidates_sql() -> str:
    return f"""
  WITH sig AS ({_minhash_sql(4)}),
  banded AS (
    SELECT doc_id AS id, '0' || '|' || h0 || '|' || h1 AS band FROM sig
    UNION ALL
    SELECT doc_id AS id, '1' || '|' || h2 || '|' || h3 AS band FROM sig
  )
  SELECT DISTINCT a.id AS a, b.id AS b
  FROM banded a JOIN banded b ON a.band = b.band AND a.id < b.id
  """


# ---------------------------------------------- Euler-tour sequence surface
# The explicit tour relation (elektra_spark/operators/euler.py) — the
# set-oriented re-expression of the reference's skip-list tour machinery
# (parallel_skip_list/skip_list.h Join/Split/FindParent,
# augmented_skip_list.h BatchJoin/GetSubsequenceSum, SURVEY.md §2.3 rows
# 31-35/38/39). The oracle twin walks the identical successor rule
# sequentially with a recursive CTE — a genuinely different algorithm
# (one-arc-at-a-time walk vs log-round pointer doubling), which is exactly
# what an oracle should be.


def _supplier_tree(spark, sf_dir):
    """Three-level region←nation←supplier containment tree: 5 trees (one per
    region). Vids: region = r_regionkey, nation = 100 + n_nationkey,
    supplier = 1000 + s_suppkey — disjoint increasing ranges, so canonical
    src<dst falls out of the hierarchy order."""
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    e1 = nation.select(
        F.col("n_regionkey").cast("long").alias("src"),
        (F.lit(100) + F.col("n_nationkey")).cast("long").alias("dst"),
    )
    e2 = supplier.select(
        (F.lit(100) + F.col("s_nationkey")).cast("long").alias("src"),
        (F.lit(1000) + F.col("s_suppkey")).cast("long").alias("dst"),
    )
    return e1.unionByName(e2)


def q_euler_tour_suppliers(spark, sf_dir):
    """Materialized Euler tour of every supplier tree: (tour, src, dst, pos)
    with pos the arc's place on the circular tour broken at the smallest
    arc — skip-list Join/BatchJoin building the sequence
    (skip_list.h:246-262, augmented_skip_list.h:374-419)."""
    from elektra_spark.operators.euler import euler_tour

    return euler_tour(_supplier_tree(spark, sf_dir))


def q_euler_parents_suppliers(spark, sf_dir):
    """Deterministic geometric heights + FindLeftParent/FindRightParent over
    the tour (skip_list.h:109-119,183-206); list ends report -1."""
    from elektra_spark.operators.euler import euler_tour, find_taller_parents

    t = find_taller_parents(euler_tour(_supplier_tree(spark, sf_dir)))
    neg1 = F.lit(-1).cast("long")
    return t.select(
        "tour", "src", "dst", "pos", "lvl",
        F.coalesce("left_parent_pos", neg1).alias("left_parent_pos"),
        F.coalesce("right_parent_pos", neg1).alias("right_parent_pos"),
    )


def q_euler_range_sum_suppliers(spark, sf_dir):
    """GetSubsequenceSum over real tour positions
    (augmented_skip_list.h:421-470): per tour, sum of dst endpoints across
    positions 3..40."""
    from elektra_spark.operators.euler import euler_tour, tour_range_sum

    return tour_range_sum(euler_tour(_supplier_tree(spark, sf_dir)), 3, 40)


def q_euler_retour_suppliers(spark, sf_dir):
    """BatchCut + BatchLink splice outcome (euler_tour_tree.h:273-369,
    399-561): suppliers 1 and 2 are cut from their nations and linked to
    nation (n+7) mod 25; only affected trees are re-toured
    (elektra_spark.operators.euler.batch_retour), untouched tours keep
    their rows verbatim. Compared against a full sequential re-walk of the
    mutated forest."""
    from elektra_spark.operators.euler import batch_retour, euler_tour

    supplier = _t(spark, sf_dir, "supplier")
    forest = _supplier_tree(spark, sf_dir)
    old = euler_tour(forest)
    moved = supplier.filter(F.col("s_suppkey") <= 2)
    cuts = moved.select(
        (F.lit(100) + F.col("s_nationkey")).cast("long").alias("src"),
        (F.lit(1000) + F.col("s_suppkey")).cast("long").alias("dst"),
    )
    links = moved.select(
        (F.lit(100) + ((F.col("s_nationkey") + 7) % 25)).cast("long").alias("src"),
        (F.lit(1000) + F.col("s_suppkey")).cast("long").alias("dst"),
    )
    new_tour, _ = batch_retour(old, forest, links=links, cuts=cuts)
    return new_tour


def q_component_edge_slice_orders(spark, sf_dir):
    """ForEachIncidentVertex rank-select analogue (hdt_euler_tour_tree.h:
    82-83,255-323): the 2nd..4th incident edges of every component of the
    customer-orders graph in canonical rank order."""
    from elektra_spark.operators.cc import component_edge_slice, connected_components

    edges, vertices = _customer_order_graph(spark, sf_dir)
    labels = connected_components(edges, vertices=vertices)
    return component_edge_slice(labels, edges, 2, 4)


_SUPPLIER_TREE_EDGES_SQL = """
    SELECT CAST(n_regionkey AS BIGINT) AS src, CAST(100 + n_nationkey AS BIGINT) AS dst FROM nation
    UNION ALL
    SELECT CAST(100 + s_nationkey AS BIGINT) AS src, CAST(1000 + s_suppkey AS BIGINT) AS dst FROM supplier
"""

_SUPPLIER_TREE_VMAP_SQL = """
    SELECT CAST(r_regionkey AS BIGINT) AS vid, CAST(r_regionkey AS BIGINT) AS comp FROM region
    UNION ALL
    SELECT CAST(100 + n_nationkey AS BIGINT) AS vid, CAST(n_regionkey AS BIGINT) AS comp FROM nation
    UNION ALL
    SELECT CAST(1000 + s_suppkey AS BIGINT) AS vid, CAST(n_regionkey AS BIGINT) AS comp
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
"""

# suppliers 1 and 2 re-homed to nation (n+7) mod 25 — the retour batch
_RETOUR_EDGES_SQL = """
    SELECT CAST(n_regionkey AS BIGINT) AS src, CAST(100 + n_nationkey AS BIGINT) AS dst FROM nation
    UNION ALL
    SELECT CAST(100 + (CASE WHEN s_suppkey <= 2 THEN (s_nationkey + 7) % 25 ELSE s_nationkey END) AS BIGINT) AS src,
           CAST(1000 + s_suppkey AS BIGINT) AS dst
    FROM supplier
"""

_RETOUR_VMAP_SQL = """
    SELECT CAST(r_regionkey AS BIGINT) AS vid, CAST(r_regionkey AS BIGINT) AS comp FROM region
    UNION ALL
    SELECT CAST(100 + n_nationkey AS BIGINT) AS vid, CAST(n_regionkey AS BIGINT) AS comp FROM nation
    UNION ALL
    SELECT CAST(1000 + s_suppkey AS BIGINT) AS vid, CAST(n_regionkey AS BIGINT) AS comp
    FROM supplier JOIN nation
      ON n_nationkey = (CASE WHEN s_suppkey <= 2 THEN (s_nationkey + 7) % 25 ELSE s_nationkey END)
"""

# exact-arithmetic height mix — MUST equal elektra_spark.operators.euler
# height_expr token for token (operands bounded: no BIGINT overflow in
# either engine)
_TOUR_LVL_SQL = (
    "CAST(log2(CAST((x & -(x)) AS DOUBLE)) AS INT)"
)
_TOUR_MIX_SQL = (
    "((((src % 1048576) * 2654435761 + (dst % 1048576) * 40503) % 4294967296) + 1)"
)


def _tour_walk_sql(edges_sql: str, vmap_sql: str, tail: str) -> str:
    """Recursive-CTE sequential tour walk: identical successor rule as the
    engine (circular next neighbor in sorted adjacency), executed one arc
    per iteration from each tree's smallest arc."""
    return f"""
  WITH RECURSIVE
  e AS ({edges_sql}),
  vmap AS ({vmap_sql}),
  arcs AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
  succ AS (
    SELECT src, dst, dst AS nsrc,
           COALESCE(LEAD(src) OVER (PARTITION BY dst ORDER BY src),
                    MIN(src) OVER (PARTITION BY dst)) AS ndst
    FROM arcs),
  sc AS (SELECT s.src, s.dst, s.nsrc, s.ndst, m.comp FROM succ s JOIN vmap m ON s.src = m.vid),
  roots AS (
    SELECT comp, src AS rsrc, dst AS rdst FROM (
      SELECT sc.*, ROW_NUMBER() OVER (PARTITION BY comp ORDER BY src, dst) AS rn FROM sc)
    WHERE rn = 1),
  walk AS (
    SELECT s.src, s.dst, s.nsrc, s.ndst, s.comp, CAST(0 AS BIGINT) AS pos
    FROM sc s JOIN roots r ON s.comp = r.comp AND s.src = r.rsrc AND s.dst = r.rdst
    UNION ALL
    SELECT t.src, t.dst, t.nsrc, t.ndst, t.comp, w.pos + 1
    FROM walk w
    JOIN sc t ON t.src = w.nsrc AND t.dst = w.ndst
    JOIN roots r ON r.comp = w.comp
    WHERE NOT (t.src = r.rsrc AND t.dst = r.rdst))
  {tail}
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: link graph from sf0.001 star schema → CC + PageRank joined."""
    sf_dir = "/root/testdata/sf0.001"
    labels = q_cc_customer_orders(spark, sf_dir)
    ranks = q_pagerank_customer_orders(spark, sf_dir)
    return labels.join(ranks, "vid").select("vid", "component", "rank")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # graph analytics (SURVEY.md §2.1/§2.7)
        "cc_customer_orders": q_cc_customer_orders,
        "pagerank_customer_orders": q_pagerank_customer_orders,
        "lpa_customer_orders": q_lpa_customer_orders,
        "batch_connected_orders": q_batch_connected_orders,
        "forest_size_customer_orders": q_forest_size_customer_orders,
        "cc_doc_lang_chain": q_cc_doc_lang_chain,
        "triangles_copurchase": q_triangles_copurchase,
        "four_cycles_copurchase": q_four_cycles_copurchase,
        "four_cliques_copurchase": q_four_cliques_copurchase,
        "copurchase_weighted": q_copurchase_weighted,
        "triangles_per_vertex_copurchase": q_triangles_per_vertex_copurchase,
        # Euler-tour sequence surface (SURVEY.md §2.3 rows 31-35/38/39 + §2.2 row 29)
        "euler_tour_suppliers": q_euler_tour_suppliers,
        "euler_parents_suppliers": q_euler_parents_suppliers,
        "euler_range_sum_suppliers": q_euler_range_sum_suppliers,
        "euler_retour_suppliers": q_euler_retour_suppliers,
        "component_edge_slice_orders": q_component_edge_slice_orders,
        "degree_histogram_parts": q_degree_histogram_parts,
        "kcore_copurchase": q_kcore_copurchase,
        "rmat_edges": q_rmat_edges,
        "rmat_degree_hill": q_rmat_degree_hill,
        "densest_rmat": q_densest_rmat,
        "coreness_copurchase": q_coreness_copurchase,
        "transcript_bfs": q_transcript_bfs,
        "transcript_hits": q_transcript_hits,
        "transcript_salsa": q_transcript_salsa,
        "transcript_turn_gaps": q_transcript_turn_gaps,
        "tool_sequences": q_tool_sequences,
        "wl_structure_transcripts": q_wl_structure_transcripts,
        "transcript_katz": q_transcript_katz,
        "transcript_betweenness": q_transcript_betweenness,
        "transcript_eigenvector": q_transcript_eigenvector,
        "transcript_ppr": q_transcript_ppr,
        "sweep_cut_transcript": q_sweep_cut_transcript,
        "appr_transcript": q_appr_transcript,
        "appr_sweep_transcript": q_appr_sweep_transcript,
        "transcript_wpr": q_transcript_wpr,
        "transcript_sssp": q_transcript_sssp,
        "clustering_coeff_copurchase": q_clustering_coeff_copurchase,
        "link_predict_copurchase": q_link_predict_copurchase,
        "edge_support_copurchase": q_edge_support_copurchase,
        "dynamic_triangles_copurchase": q_dynamic_triangles_copurchase,
        "truss_copurchase": q_truss_copurchase,
        "assortativity_copurchase": q_assortativity_copurchase,
        "jaccard_copurchase": q_jaccard_copurchase,
        "triangles_sampled_copurchase": q_triangles_sampled_copurchase,
        "modularity_lpa_customer_orders": q_modularity_lpa_customer_orders,
        "conductance_lpa_customer_orders": q_conductance_lpa_customer_orders,
        "transcript_harmonic": q_transcript_harmonic,
        "transcript_closeness": q_transcript_closeness,
        "transcript_walks": q_transcript_walks,
        "transcript_node2vec": q_transcript_node2vec,
        "diameter_copurchase": q_diameter_copurchase,
        "mis_copurchase": q_mis_copurchase,
        "matching_transcript": q_matching_transcript,
        "vertex_cover_transcript": q_vertex_cover_transcript,
        "scan_transcript": q_scan_transcript,
        "louvain_transcript": q_louvain_transcript,
        "modularity_louvain_transcript": q_modularity_louvain_transcript,
        "coarsen_transcript": q_coarsen_transcript,
        "seeded_lpa_transcript": q_seeded_lpa_transcript,
        "msf_transcript": q_msf_transcript,
        "single_linkage_transcript": q_single_linkage_transcript,
        "temporal_reach_transcript": q_temporal_reach_transcript,
        "temporal_departure_transcript": q_temporal_departure_transcript,
        "tool_cooccurrence_transcript": q_tool_cooccurrence_transcript,
        "tool_funnel_transcript": q_tool_funnel_transcript,
        "tool_entropy_transcript": q_tool_entropy_transcript,
        "transitivity_copurchase": q_transitivity_copurchase,
        "rich_club_copurchase": q_rich_club_copurchase,
        "coloring_transcript": q_coloring_transcript,
        "skew_join_transcript": q_skew_join_transcript,
        "salted_degree_transcript": q_salted_degree_transcript,
        "hyperball_copurchase": q_hyperball_copurchase,
        "neighborhood_function_copurchase": q_neighborhood_function_copurchase,
        "transcript_widest": q_transcript_widest,
        "transcript_bipartite": q_transcript_bipartite,
        "transcript_scc": q_transcript_scc,
        "transcript_absorption": q_transcript_absorption,
        "motifs_transcript": q_motifs_transcript,
        "influence_transcript": q_influence_transcript,
        "partition_advisor_transcript": q_partition_advisor_transcript,
        # batch dynamics + component slices + HDT levels (SURVEY.md §2.1/2.2)
        "dynamic_orders": q_dynamic_orders,
        "time_travel_orders": q_time_travel_orders,
        "snapshot_changelog_orders": q_snapshot_changelog_orders,
        "ivm_orders_agg": q_ivm_orders_agg,
        "ivm_orders_stream": q_ivm_orders_stream,
        "zorder_blocks_orders": q_zorder_blocks_orders,
        "streaming_dynamic_orders": q_streaming_dynamic_orders,
        "dynamic_levels_orders": q_dynamic_levels_orders,
        "component_vertices_orders": q_component_vertices_orders,
        "component_edges_orders": q_component_edges_orders,
        "transcript_levels": q_transcript_levels,
        "transcript_levels2": q_transcript_levels2,
        # transcripts engine surface (fixture-backed, DuckDB-twinned)
        "transcript_cc": q_transcript_cc,
        "transcript_pagerank": q_transcript_pagerank,
        "dynamic_pagerank_transcript": q_dynamic_pagerank_transcript,
        "transcript_forest": q_transcript_forest,
        "transcript_text_roundtrip": q_transcript_text_roundtrip,
        # training-data pipeline
        "dedup_prefix_docs": q_dedup_prefix_docs,
        "streaming_dedup_docs": q_streaming_dedup_docs,
        "minhash_docs": q_minhash_docs,
        "minhash_candidates_docs": q_minhash_candidates_docs,
        "simhash_docs": q_simhash_docs,
        "simhash_near_pairs_docs": q_simhash_near_pairs_docs,
        "near_duplicates_docs": q_near_duplicates_docs,
        "similarity_join_docs": q_similarity_join_docs,
        "dedup_recall_docs": q_dedup_recall_docs,
        "containment_join_docs": q_containment_join_docs,
        "dup_clusters_docs": q_dup_clusters_docs,
        "repeated_ngrams_docs": q_repeated_ngrams_docs,
        "decontaminate_docs": q_decontaminate_docs,
        "bloom_decontaminate_docs": q_bloom_decontaminate_docs,
        "perplexity_docs": q_perplexity_docs,
        "repetition_docs": q_repetition_docs,
        "text_profile_docs": q_text_profile_docs,
        "token_stats_docs": q_token_stats_docs,
        "dsir_weights_docs": q_dsir_weights_docs,
        "pii_scan_docs": q_pii_scan_docs,
        "pack_sequences_docs": q_pack_sequences_docs,
        "token_cms_docs": q_token_cms_docs,
        "token_cms_stream": q_token_cms_stream,
        "tfidf_docs": q_tfidf_docs,
        "bm25_docs": q_bm25_docs,
        "weighted_sample_docs": q_weighted_sample_docs,
        "weighted_sample_stream": q_weighted_sample_stream,
        "hybrid_retrieval_docs": q_hybrid_retrieval_docs,
        "lang_stats_docs": q_lang_stats_docs,
        "length_deciles_docs": q_length_deciles_docs,
        "vocab_growth_docs": q_vocab_growth_docs,
        "corpus_filter_docs": q_corpus_filter_docs,
        "corpus_sample_docs": q_corpus_sample_docs,
        "corpus_budget_docs": q_corpus_budget_docs,
        "corpus_sample_stream": q_corpus_sample_stream,
        "chunk_docs": q_chunk_docs,
        "passage_dedup_docs": q_passage_dedup_docs,
        "boilerplate_docs": q_boilerplate_docs,
        "ann_topk_docs": q_ann_topk_docs,
        "ann_topk_brute_docs": q_ann_topk_brute_docs,
        "ann_lsh_docs": q_ann_lsh_docs,
        "ann_lsh_multiprobe_docs": q_ann_lsh_multiprobe_docs,
        "ann_ivf_docs": q_ann_ivf_docs,
        "kmeans_embeddings": q_kmeans_embeddings,
        "feature_prop_embeddings": q_feature_prop_embeddings,
        "semdedup_docs": q_semdedup_docs,
        "curation_manifest_docs": q_curation_manifest_docs,
        "pq_codes_docs": q_pq_codes_docs,
        "pq_topk_docs": q_pq_topk_docs,
        "embedding_near_dups": q_embedding_near_dups,
        "embedding_stats": q_embedding_stats,
        "multimodal_features": q_multimodal_features,
        "wav_features": q_wav_features,
        "bmp_features": q_bmp_features,
        # relational/windows surface
        "events_sessions": q_events_sessions,
        "events_sessions_stream": q_events_sessions_stream,
        "revenue_by_region_status": q_revenue_by_region_status,
    }


def oracle_sql() -> dict[str, str]:
    from elektra_spark.dedup.simhash import simhash_sql
    from elektra_spark.sim.kmeans import kmeans_sql

    oracles = _static_oracles(simhash_sql)
    oracles["kmeans_embeddings"] = kmeans_sql(k=KMEANS_K, iters=KMEANS_ITERS, dim=KMEANS_DIM)
    from elektra_spark.text.bm25 import bm25_sql

    oracles["bm25_docs"] = bm25_sql(BM25_QUERY)
    from elektra_spark.text.sampling import weighted_sample_topk_sql

    oracles["weighted_sample_docs"] = weighted_sample_topk_sql(
        AES_K, "len(string_split(coalesce(text, ''), ' ')) + 1"
    )
    oracles["weighted_sample_stream"] = (
        "SELECT doc_id, sel_key FROM ("
        + weighted_sample_topk_sql(AES_K, "len(string_split(coalesce(text, ''), ' ')) + 1")
        + ")"
    )
    from elektra_spark.sim.fusion import rrf_fuse_sql

    dense_sql = f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id <> 0),
    s AS (SELECT vec_id, round(list_inner_product(qv, cv)
            / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))), 6) AS sim
          FROM c CROSS JOIN q)
    SELECT vec_id AS doc_id, rank FROM (
      SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id ASC)::BIGINT AS rank FROM s)
    WHERE rank <= {RRF_CAP}"""
    bm_sql = f"SELECT doc_id, rank FROM ({bm25_sql(BM25_QUERY)}) WHERE rank <= {RRF_CAP}"
    oracles["hybrid_retrieval_docs"] = rrf_fuse_sql([bm_sql, dense_sql])
    from elektra_spark.dedup.ppjoin import similarity_join_sql

    oracles["similarity_join_docs"] = similarity_join_sql(PPJOIN_TAU_PERMILLE)
    from elektra_spark.dedup.ppjoin import containment_join_sql

    oracles["containment_join_docs"] = containment_join_sql(CONTAIN_TAU_PERMILLE)
    oracles["dedup_recall_docs"] = f"""
  WITH exact_pairs AS (SELECT a, b FROM ({similarity_join_sql(RECALL_TAU_PERMILLE)})),
  lsh_pairs AS (SELECT a, b FROM ({_near_duplicates_sql(threshold=RECALL_TAU_PERMILLE / 1000)}))
  SELECT (SELECT count(*) FROM exact_pairs)::BIGINT AS n_exact,
         (SELECT count(*) FROM lsh_pairs)::BIGINT AS n_lsh,
         (SELECT count(*) FROM lsh_pairs l JOIN exact_pairs e USING (a, b))::BIGINT AS n_common,
         round((SELECT count(*) FROM lsh_pairs l JOIN exact_pairs e USING (a, b))::DOUBLE
               / greatest((SELECT count(*) FROM exact_pairs), 1), 6) AS recall
  """
    oracles["feature_prop_embeddings"] = _feature_prop_sql()
    from elektra_spark.layout import zorder_blocks_sql

    oracles["zorder_blocks_orders"] = zorder_blocks_sql("orders", "o_custkey", "o_orderkey")
    from elektra_spark.ingest.rmat import rmat_edges_sql

    oracles["rmat_edges"] = rmat_edges_sql(RMAT_EDGES, RMAT_SCALE)
    oracles["densest_rmat"] = _densest_rmat_sql()
    oracles["rmat_degree_hill"] = f"""
  WITH e AS MATERIALIZED ({rmat_edges_sql(RMAT_EDGES, RMAT_SCALE)}),
  deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
  top AS (SELECT src, d FROM (
      SELECT src, d, row_number() OVER (ORDER BY d DESC, src ASC) AS rk FROM deg)
      WHERE rk <= {HILL_K}),
  dk AS (SELECT min(d) AS dk FROM (
      SELECT d, row_number() OVER (ORDER BY d DESC, src ASC) AS rk FROM deg) WHERE rk = {HILL_K})
  SELECT count(*)::BIGINT AS k, (SELECT dk FROM dk)::BIGINT AS d_k,
         round(count(*) / sum(ln(d::DOUBLE / (SELECT dk FROM dk))), 6) AS alpha
  FROM top"""
    try:
        # trains the IVF quantizer from the sf0.01 parquet; isolated so a
        # missing test-data mount degrades only this entry (to the driver's
        # rows-only check), never the whole oracle surface
        oracles["ann_ivf_docs"] = _ann_ivf_sql()
        oracles["semdedup_docs"] = _semdedup_sql()
        oracles["curation_manifest_docs"] = _curation_manifest_sql()
        oracles["pq_codes_docs"] = _pq_codes_sql()
        oracles["pq_topk_docs"] = _pq_topk_sql()
    except Exception:
        pass
    return oracles


def _static_oracles(simhash_sql) -> dict[str, str]:
    return {
        "cc_customer_orders": f"""
  SELECT c_custkey AS vid, c_custkey AS component FROM customer
  UNION ALL
  SELECT {ORDER_VID_OFFSET} + o_orderkey AS vid, o_custkey AS component FROM orders
  """,
        "euler_tour_suppliers": _tour_walk_sql(
            _SUPPLIER_TREE_EDGES_SQL,
            _SUPPLIER_TREE_VMAP_SQL,
            "SELECT comp AS tour, src, dst, pos FROM walk",
        ),
        "euler_parents_suppliers": _tour_walk_sql(
            _SUPPLIER_TREE_EDGES_SQL,
            _SUPPLIER_TREE_VMAP_SQL,
            f""", lv AS (
    SELECT src, dst, pos, comp, {_TOUR_LVL_SQL} AS lvl FROM (
      SELECT w.*, {_TOUR_MIX_SQL} AS x FROM walk w))
  SELECT a.comp AS tour, a.src, a.dst, a.pos, a.lvl,
         COALESCE((SELECT MAX(b.pos) FROM lv b
                   WHERE b.comp = a.comp AND b.pos < a.pos AND b.lvl > a.lvl), -1) AS left_parent_pos,
         COALESCE((SELECT MIN(b.pos) FROM lv b
                   WHERE b.comp = a.comp AND b.pos > a.pos AND b.lvl > a.lvl), -1) AS right_parent_pos
  FROM lv a""",
        ),
        "euler_range_sum_suppliers": _tour_walk_sql(
            _SUPPLIER_TREE_EDGES_SQL,
            _SUPPLIER_TREE_VMAP_SQL,
            """SELECT comp AS tour, CAST(SUM(dst) AS BIGINT) AS range_sum,
         COUNT(*) AS n_arcs
  FROM walk WHERE pos BETWEEN 3 AND 40 GROUP BY comp""",
        ),
        "euler_retour_suppliers": _tour_walk_sql(
            _RETOUR_EDGES_SQL,
            _RETOUR_VMAP_SQL,
            "SELECT comp AS tour, src, dst, pos FROM walk",
        ),
        "component_edge_slice_orders": f"""
  SELECT component, src, dst, rk FROM (
    SELECT CAST(o_custkey AS BIGINT) AS component,
           CAST(o_custkey AS BIGINT) AS src,
           CAST({ORDER_VID_OFFSET} + o_orderkey AS BIGINT) AS dst,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_custkey, {ORDER_VID_OFFSET} + o_orderkey) AS rk
    FROM orders)
  WHERE rk BETWEEN 2 AND 4
  """,
        "pagerank_customer_orders": _pagerank_sql(),
        "lpa_customer_orders": _lpa_sql(),
        "batch_connected_orders": f"""
  SELECT {ORDER_VID_OFFSET} + o1.o_orderkey AS u,
         {ORDER_VID_OFFSET} + o2.o_orderkey AS v,
         o1.o_custkey = o2.o_custkey AS connected
  FROM orders o1 JOIN orders o2 ON o2.o_orderkey = o1.o_orderkey + 1
  WHERE o1.o_orderkey % 2 = 0
  """,
        "forest_size_customer_orders": "SELECT count(*) AS forest_size FROM orders",
        "cc_doc_lang_chain": """
  SELECT doc_id AS vid, min(doc_id) OVER (PARTITION BY lang) AS component FROM documents
  """,
        "triangles_copurchase": f"""
  WITH e AS ({_COPURCHASE_SQL})
  SELECT count(*) AS n_triangles
  FROM e e1 JOIN e e2 ON e1.dst = e2.src JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
  """,
        "tool_entropy_transcript": f"""
  WITH t AS (SELECT conv_id, tool FROM read_parquet('{_transcript_fixture(300)}')
             WHERE tool IS NOT NULL),
  c AS (SELECT conv_id, tool, count(*) AS c FROM t GROUP BY conv_id, tool),
  tot AS (SELECT conv_id, sum(c) AS n, count(*) AS n_distinct FROM c GROUP BY conv_id)
  SELECT c.conv_id, tot.n::BIGINT AS n_calls, tot.n_distinct::BIGINT AS n_tools,
         round(sum(-(c.c::DOUBLE / tot.n) * log2(c.c::DOUBLE / tot.n)), 6) AS entropy
  FROM c JOIN tot USING (conv_id)
  GROUP BY c.conv_id, tot.n, tot.n_distinct
  """,
        "tool_funnel_transcript": f"""
  WITH t AS (SELECT conv_id, turn_idx, tool FROM read_parquet('{_transcript_fixture(300)}')
             WHERE tool IS NOT NULL),
  ext AS (SELECT conv_id, tool, min(turn_idx) AS lo, max(turn_idx) AS hi
          FROM t GROUP BY conv_id, tool),
  wa AS (SELECT tool, count(DISTINCT conv_id) AS n_a FROM ext GROUP BY tool),
  pr AS (SELECT a.tool AS tool_a, b.tool AS tool_b, count(DISTINCT a.conv_id) AS n_convs
         FROM ext a JOIN ext b ON a.conv_id = b.conv_id AND a.tool <> b.tool AND a.lo < b.hi
         GROUP BY a.tool, b.tool)
  SELECT pr.tool_a, pr.tool_b, pr.n_convs::BIGINT AS n_convs,
         round(pr.n_convs::DOUBLE / wa.n_a, 6) AS conversion
  FROM pr JOIN wa ON wa.tool = pr.tool_a
  """,
        "tool_cooccurrence_transcript": f"""
  WITH r AS (SELECT DISTINCT conv_id AS g, tool AS m
             FROM read_parquet('{_transcript_fixture(300)}') WHERE tool IS NOT NULL),
  ok AS (SELECT g FROM r GROUP BY g HAVING count(*) <= {TOOL_COOC_MAX_CONV_TOOLS}),
  rr AS (SELECT r.g, r.m FROM r JOIN ok USING (g))
  SELECT a.m AS src, b.m AS dst, count(*)::BIGINT AS weight
  FROM rr a JOIN rr b ON a.g = b.g AND a.m < b.m
  GROUP BY a.m, b.m HAVING count(*) >= {TOOL_COOC_MIN_W}
  """,
        "copurchase_weighted": f"""
  WITH r AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS m FROM lineitem),
  ok AS (SELECT g FROM r GROUP BY g HAVING count(*) <= {PROJ_MAX_BASKET}),
  rr AS (SELECT r.g, r.m FROM r JOIN ok USING (g))
  SELECT a.m AS src, b.m AS dst, count(*)::BIGINT AS weight
  FROM rr a JOIN rr b ON a.g = b.g AND a.m < b.m
  GROUP BY a.m, b.m HAVING count(*) >= {PROJ_MIN_WEIGHT}
  """,
        "four_cycles_copurchase": f"""
  WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
  b AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
  lam AS (SELECT b1.dst AS u, b2.dst AS w, count(*) AS lam
          FROM b b1 JOIN b b2 ON b1.src = b2.src AND b1.dst <> b2.dst
          GROUP BY b1.dst, b2.dst),
  s1 AS (SELECT sum(lam * lam) AS v FROM lam),
  s2 AS (SELECT sum(d * d) AS v FROM (SELECT count(*) AS d FROM b GROUP BY src)),
  mm AS (SELECT count(*) AS v FROM e)
  SELECT (((SELECT v FROM s1) - (SELECT v FROM s2) + 2 * (SELECT v FROM mm)) / 8)::BIGINT
         AS n_four_cycles
  """,
        "four_cliques_copurchase": f"""
  WITH e AS MATERIALIZED ({_COPURCHASE_SQL})
  SELECT count(*)::BIGINT AS n_four_cliques
  FROM e e1
  JOIN e e2 ON e2.src = e1.src AND e2.dst > e1.dst
  JOIN e e3 ON e3.src = e1.dst AND e3.dst = e2.dst
  JOIN e e4 ON e4.src = e1.src AND e4.dst > e2.dst
  JOIN e e5 ON e5.src = e1.dst AND e5.dst = e4.dst
  JOIN e e6 ON e6.src = e2.dst AND e6.dst = e4.dst
  """,
        "triangles_per_vertex_copurchase": f"""
  WITH e AS ({_COPURCHASE_SQL}),
  t AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM e e1 JOIN e e2 ON e1.dst = e2.src
        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
  p AS (SELECT a AS vid FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t)
  SELECT vid::BIGINT AS vid, count(*)::BIGINT AS n_triangles FROM p GROUP BY vid
  """,
        "degree_histogram_parts": f"""
  WITH e AS ({_COPURCHASE_SQL}),
  d AS (SELECT vid, count(*) AS degree FROM (
          SELECT src AS vid FROM e UNION ALL SELECT dst FROM e) GROUP BY vid)
  SELECT degree, count(*) AS n_vertices FROM d GROUP BY degree
  """,
        "dedup_prefix_docs": """
  SELECT doc_id, min(doc_id) OVER (PARTITION BY substr(text, 1, 24)) AS rep FROM documents
  """,
        "streaming_dedup_docs": """
  SELECT doc_id, min(doc_id) OVER (PARTITION BY substr(text, 1, 24)) AS rep FROM documents
  """,
        "minhash_docs": _minhash_sql(4),
        "minhash_candidates_docs": _minhash_candidates_sql(),
        "simhash_docs": simhash_sql("documents"),
        "simhash_near_pairs_docs": _simhash_near_pairs_sql(),
        "text_profile_docs": _text_profile_sql(),
        "token_stats_docs": _token_stats_sql(),
        "dsir_weights_docs": _dsir_weights_sql(),
        "pii_scan_docs": _pii_scan_sql(),
        "pack_sequences_docs": _pack_sequences_sql(),
        "token_cms_docs": _token_cms_sql(),
        # delivery-order independence IS the contract: the streaming row
        # hashes against the identical batch twin
        "token_cms_stream": _token_cms_sql(),
        "corpus_filter_docs": _corpus_filter_sql(),
        "corpus_sample_docs": _corpus_sample_sql(),
        "corpus_budget_docs": _corpus_budget_sql(),
        "corpus_sample_stream": _corpus_sample_stream_sql(),
        "chunk_docs": _chunk_docs_sql(),
        "passage_dedup_docs": _passage_dedup_sql(),
        "boilerplate_docs": _boilerplate_sql(),
        "transcript_cc": _transcript_cc_sql(),
        "transcript_pagerank": _transcript_pagerank_sql(),
        "dynamic_pagerank_transcript": _dynamic_pagerank_sql(),
        "transcript_forest": _transcript_forest_sql(),
        "transcript_bfs": _transcript_bfs_sql(),
        "transcript_hits": _transcript_hits_sql(),
        "transcript_salsa": _transcript_salsa_sql(),
        "transcript_turn_gaps": _transcript_turn_gaps_sql(),
        "tool_sequences": _tool_sequences_sql(),
        "wl_structure_transcripts": _wl_structure_sql(),
        "transcript_katz": _transcript_katz_sql(),
        "transcript_betweenness": _transcript_betweenness_sql(),
        "transcript_eigenvector": _transcript_eigenvector_sql(),
        "transcript_ppr": _transcript_ppr_sql(),
        "sweep_cut_transcript": _sweep_cut_sql(),
        "appr_transcript": _appr_sql(),
        "appr_sweep_transcript": _appr_sweep_sql(),
        "transcript_wpr": _transcript_wpr_sql(),
        "transcript_sssp": _transcript_sssp_sql(),
        "clustering_coeff_copurchase": _clustering_coeff_sql(),
        "link_predict_copurchase": _link_predict_sql(),
        "edge_support_copurchase": _edge_support_sql(),
        "dynamic_triangles_copurchase": _dynamic_triangles_sql(),
        "truss_copurchase": _truss_sql(TRUSS_K, TRUSS_SQL_ROUNDS),
        "assortativity_copurchase": _assortativity_sql(),
        "jaccard_copurchase": _jaccard_sql(),
        "triangles_sampled_copurchase": _triangles_sampled_sql(),
        "modularity_lpa_customer_orders": _modularity_sql(),
        "conductance_lpa_customer_orders": _conductance_sql(),
        "transcript_harmonic": _transcript_harmonic_sql(),
        "transcript_closeness": _transcript_closeness_sql(),
        "transcript_walks": _transcript_walks_sql(),
        "transcript_node2vec": _transcript_node2vec_sql(),
        "diameter_copurchase": _diameter_sql(),
        "mis_copurchase": _mis_sql(),
        "matching_transcript": _matching_sql(),
        "vertex_cover_transcript": _vertex_cover_sql(),
        "scan_transcript": _scan_sql(),
        "louvain_transcript": _louvain_sql(),
        "modularity_louvain_transcript": _modularity_louvain_sql(),
        "coarsen_transcript": _coarsen_sql(),
        "seeded_lpa_transcript": _seeded_lpa_sql(),
        "msf_transcript": _msf_sql(),
        "single_linkage_transcript": _single_linkage_sql(),
        "rich_club_copurchase": f"""
  WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
  ks(k) AS (VALUES {", ".join(f"({k})" for k in RICH_CLUB_KS)}),
  d AS MATERIALIZED (SELECT vid, count(*) AS degree FROM (
        SELECT src AS vid FROM e UNION ALL SELECT dst FROM e) GROUP BY vid),
  nk AS (SELECT k, count(*) AS n_rich FROM d JOIN ks ON d.degree > ks.k GROUP BY k),
  ed AS (SELECT least(ds.degree, dd.degree) AS dmin
         FROM e JOIN d ds ON ds.vid = e.src JOIN d dd ON dd.vid = e.dst),
  ek AS (SELECT k, count(*) AS n_rich_edges FROM ed JOIN ks ON ed.dmin > ks.k GROUP BY k)
  SELECT ks.k, coalesce(nk.n_rich, 0)::BIGINT AS n_rich,
         coalesce(ek.n_rich_edges, 0)::BIGINT AS n_rich_edges,
         round(CASE WHEN coalesce(nk.n_rich, 0) >= 2
               THEN 2.0 * coalesce(ek.n_rich_edges, 0)
                    / (nk.n_rich::DOUBLE * (nk.n_rich - 1))
               ELSE 0.0 END, 6) AS phi
  FROM ks LEFT JOIN nk USING (k) LEFT JOIN ek USING (k)
  """,
        "temporal_reach_transcript": _temporal_reach_sql(),
        "temporal_departure_transcript": _temporal_departure_sql(),
        "transitivity_copurchase": f"""
  WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
  d AS (SELECT vid, count(*) AS d FROM (
          SELECT src AS vid FROM e UNION ALL SELECT dst FROM e) GROUP BY vid),
  w AS (SELECT sum(((d * (d - 1)) / 2)::BIGINT) AS n_wedges FROM d),
  t AS (SELECT count(*)::BIGINT AS n_triangles
        FROM e e1 JOIN e e2 ON e1.dst = e2.src
        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst)
  SELECT w.n_wedges, t.n_triangles,
         round(CASE WHEN w.n_wedges > 0
               THEN 3.0 * t.n_triangles / w.n_wedges ELSE 0.0 END, 6) AS transitivity
  FROM w, t
  """,
        "coloring_transcript": _coloring_sql(),
        "skew_join_transcript": _skew_join_sql(),
        "salted_degree_transcript": _salted_degree_sql(),
        "hyperball_copurchase": _hyperball_sql(),
        "neighborhood_function_copurchase": _neighborhood_function_sql(),
        "transcript_widest": _transcript_widest_sql(),
        "transcript_bipartite": _transcript_bipartite_sql(),
        "transcript_scc": _transcript_scc_sql(),
        "transcript_absorption": _transcript_absorption_sql(),
        "motifs_transcript": _motifs_sql(),
        "influence_transcript": _influence_sql(),
        "partition_advisor_transcript": _partition_advisor_sql(),
        "tfidf_docs": _tfidf_sql(),
        "kcore_copurchase": _kcore_sql(KCORE_K, KCORE_SQL_ROUNDS),
        "coreness_copurchase": _coreness_sql(CORENESS_SQL_ROUNDS),
        "transcript_levels": _transcript_levels_sql(),
        "transcript_levels2": _transcript_levels2_sql(),
        "dynamic_orders": _dynamic_orders_sql(),
        "time_travel_orders": _time_travel_orders_sql(),
        "snapshot_changelog_orders": _snapshot_changelog_sql(),
        "ivm_orders_agg": _ivm_orders_sql(),
        "ivm_orders_stream": _ivm_orders_sql(),
        # delivery mode (streaming micro-batches vs direct batch calls) must
        # not change the final edge set, so the twin is the same CC query
        "streaming_dynamic_orders": _dynamic_orders_sql(),
        "dynamic_levels_orders": _dynamic_levels_orders_sql(),
        "component_vertices_orders": f"""
  SELECT 1::BIGINT AS vid
  UNION ALL
  SELECT ({ORDER_VID_OFFSET} + o_orderkey)::BIGINT AS vid FROM orders WHERE o_custkey = 1
  """,
        "component_edges_orders": f"""
  SELECT o_custkey::BIGINT AS src, ({ORDER_VID_OFFSET} + o_orderkey)::BIGINT AS dst
  FROM orders WHERE o_custkey = 1
  """,
        "transcript_text_roundtrip": _transcript_roundtrip_sql(),
        "near_duplicates_docs": _near_duplicates_sql(),
        "dup_clusters_docs": _dup_clusters_sql(),
        "repeated_ngrams_docs": _repeated_ngrams_sql(),
        "decontaminate_docs": _decontaminate_sql(),
        "bloom_decontaminate_docs": _bloom_decontaminate_sql(),
        "perplexity_docs": _perplexity_sql(),
        "repetition_docs": _repetition_sql(),
        "ann_lsh_docs": _ann_lsh_sql(),
        "ann_lsh_multiprobe_docs": _ann_lsh_sql(multi_probe=2),
        "ann_topk_brute_docs": _ann_topk_brute_sql(),
        "embedding_near_dups": _embedding_near_dups_sql(),
        "multimodal_features": _multimodal_sql(),
        "wav_features": _wav_features_sql(),
        "bmp_features": _bmp_features_sql(),
        "vocab_growth_docs": f"""
  WITH toks AS (SELECT doc_id, t.tok
    FROM documents, unnest(list_distinct(list_filter(
      string_split_regex(lower(coalesce(text, '')), '[^a-z]+'), x -> len(x) >= 1))) AS t(tok)),
  first AS (SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok)
  SELECT g.n_docs::BIGINT AS n_docs, count(*)::BIGINT AS vocab
  FROM first, (VALUES {",".join(f"({n})" for n in VOCAB_STEPS)}) g(n_docs)
  WHERE first.first_doc < g.n_docs GROUP BY g.n_docs
  """,
        "length_deciles_docs": """
  WITH d AS (SELECT lang, doc_id, n_chars FROM documents),
  rk AS (SELECT lang, doc_id, n_chars,
                row_number() OVER (PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC) AS rk
         FROM d),
  n AS (SELECT lang, count(*)::BIGINT AS n_docs FROM d GROUP BY lang)
  SELECT rk.lang, g.decile::BIGINT AS decile, n.n_docs, rk.n_chars AS q_chars
  FROM rk JOIN n USING (lang), generate_series(1, 9) g(decile)
  WHERE rk.rk = floor((g.decile * n.n_docs + 9) / 10.0)
  """,
        "lang_stats_docs": """
  SELECT lang, count(*) AS n_docs,
         round(sum(n_chars)::DOUBLE / count(*), 6) AS avg_chars,
         sum(n_chars)::BIGINT AS total_chars,
         sum(len(string_split(text, ' ')))::BIGINT AS total_tokens
  FROM documents GROUP BY lang
  """,
        "ann_topk_docs": """
  WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
  c AS (SELECT vec_id AS nbr, embedding::DOUBLE[] AS cv FROM embeddings),
  s AS (SELECT query_id, nbr,
               list_inner_product(qv, cv)
                 / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS sim
        FROM q CROSS JOIN c WHERE query_id <> nbr),
  r AS (SELECT query_id, nbr, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nbr ASC) AS rank
        FROM s)
  SELECT query_id, nbr, round(sim, 6) AS sim, rank FROM r WHERE rank <= 5
  """,
        "embedding_stats": """
  SELECT label, count(*) AS n_vecs,
         round(avg(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS avg_norm
  FROM embeddings GROUP BY label
  """,
        "events_sessions": """
  WITH g AS (
    SELECT user_id, event_id, ts,
           CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                  OR epoch(ts) - lag(epoch(ts)) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ), s AS (
    SELECT user_id, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
    FROM g
  ), per AS (SELECT user_id, sess_id, count(*) AS n FROM s GROUP BY user_id, sess_id)
  SELECT user_id, count(*) AS n_sessions, max(n) AS max_session_events FROM per GROUP BY user_id
  """,
        "events_sessions_stream": """
  WITH g AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                  OR epoch(ts) - lag(epoch(ts)) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ), s AS (
    SELECT user_id, ts, value,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
    FROM g
  )
  SELECT user_id, min(ts) AS session_start,
         max(ts) + INTERVAL 1800 SECOND AS session_end,
         count(*) AS n_events, round(sum(value), 4) AS session_value
  FROM s GROUP BY user_id, sess_id
  """,
        "revenue_by_region_status": """
  SELECT r_name, o_orderstatus,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
         count(*) AS n_items
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, o_orderstatus
  """,
    }

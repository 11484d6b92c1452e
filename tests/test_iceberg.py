"""Real-Iceberg parity for the SnapshotCatalog stand-in (VERDICT r4 ask #7).

This sandbox ships no ``iceberg-spark-runtime`` jar, so the module SKIPS here
(cleanly, with the reason printed by pytest -rs). On a deployment whose
pyspark classpath provides the jar, it verifies — in a fresh subprocess JVM,
because ``spark.sql.extensions`` must be set at session creation — that the
stand-in's hand-rolled MERGE/time-travel semantics
(:mod:`elektra_spark.tables`) match real Iceberg SQL on the identical
operation sequence, and that a :class:`DynamicGraph` insert+delete cycle
lands on the same edge set a real Iceberg ``MERGE INTO``-maintained table
holds. This is the swap-in path :func:`elektra_spark.session.iceberg_configs`
exists for.
"""

import os
import subprocess
import sys

import pytest

from elektra_spark.session import iceberg_jar_present

pytestmark = pytest.mark.skipif(
    not iceberg_jar_present(),
    reason=(
        "no iceberg-spark-runtime jar in pyspark/jars — SnapshotCatalog "
        "stand-in parity runs only where a real Iceberg runtime ships "
        "(flip state storage via session.iceberg_configs)"
    ),
)


_PARITY_SCRIPT = """
import os
os.environ.setdefault("SPARK_GRAFT_CPUS", "2")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
from pyspark.sql import functions as F
from elektra_spark.session import get_spark, iceberg_configs
from elektra_spark.tables import SnapshotCatalog
from elektra_spark.dynamic.updates import DynamicGraph

warehouse = {warehouse!r}
spark = get_spark(app_name="iceberg-parity", extra_conf=iceberg_configs(warehouse))
spark.sparkContext.setLogLevel("ERROR")
cat = SnapshotCatalog(spark, {cat_root!r})

def rows(df):
    return sorted(tuple(r) for r in df.select("src", "dst").collect())

initial = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
ins = spark.createDataFrame([(2, 3), (3, 4), (3, 4), (20, 21)], "src long, dst long")
dele = spark.createDataFrame([(10, 11), (99, 100)], "src long, dst long")

# --- real Iceberg side -------------------------------------------------
spark.sql("CREATE DATABASE IF NOT EXISTS local.db")
spark.sql("DROP TABLE IF EXISTS local.db.edges")
initial.writeTo("local.db.edges").create()
ins.dropDuplicates(["src", "dst"]).createOrReplaceTempView("ins_batch")
spark.sql(
    "MERGE INTO local.db.edges t USING ins_batch s "
    "ON t.src = s.src AND t.dst = s.dst "
    "WHEN NOT MATCHED THEN INSERT *"
)
dele.createOrReplaceTempView("del_batch")
spark.sql(
    "MERGE INTO local.db.edges t USING del_batch s "
    "ON t.src = s.src AND t.dst = s.dst "
    "WHEN MATCHED THEN DELETE"
)

# --- stand-in side: identical sequence through SnapshotCatalog ---------
cat.write("edges", initial, "create")
cat.merge_insert("edges", ins, ["src", "dst"])
cat.merge_delete("edges", dele, ["src", "dst"])

ice = rows(spark.table("local.db.edges"))
standin = rows(cat.read("edges"))
assert ice == standin, f"final MERGE state diverged: {{ice}} vs {{standin}}"

# --- time travel: version-1 state and history depth must agree ---------
snaps = spark.sql("SELECT snapshot_id FROM local.db.edges.snapshots ORDER BY committed_at").collect()
assert len(snaps) == len(cat.history("edges")) == 3
first = spark.sql(f"SELECT * FROM local.db.edges VERSION AS OF {{snaps[0].snapshot_id}}")
assert rows(first) == rows(cat.read("edges", version=1))

# --- DynamicGraph cycle vs the Iceberg-maintained table ----------------
g = DynamicGraph.create(cat, initial, prefix="pg", check_rep=True)
g.batch_add_edges(ins)
g.batch_delete_edges(dele)
assert rows(g.edges()) == ice, "DynamicGraph edge table diverged from Iceberg MERGE state"
g.check_rep()

print("PARITY-OK")
spark.stop()
"""


def test_snapshot_catalog_matches_real_iceberg(tmp_path):
    script = tmp_path / "parity.py"
    script.write_text(
        _PARITY_SCRIPT.format(
            warehouse=str(tmp_path / "warehouse"), cat_root=str(tmp_path / "cat")
        )
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [sys.executable, str(script)], cwd="/root/repo", env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "PARITY-OK" in proc.stdout

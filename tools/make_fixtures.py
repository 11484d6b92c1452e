"""Materialize the deterministic transcript fixtures as single parquet files.

The synthetic transcripts (elektra_spark.ingest.transcripts.synth_transcripts)
are pure column arithmetic over spark.range — byte-deterministic — but they
use Spark's xxhash64, which DuckDB does not ship. Writing the output once to
``fixtures/`` lets the DuckDB oracle read the identical table via
``read_parquet`` and gives the transcript-family queries hard SQL twins
(edge derivation + recursive-CTE connected components + unrolled PageRank).

A pytest (tests/test_ingest.py) asserts the fixture still equals a fresh
synthesis, so drift between engine and fixture fails loudly.

Usage: python tools/make_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")
SIZES = (300, 50)
SEED = 42


def fixture_path(n_conversations: int, seed: int = SEED) -> str:
    return os.path.join(FIXTURE_DIR, f"transcripts_n{n_conversations}_s{seed}.parquet")


def main():
    from elektra_spark.ingest.transcripts import synth_transcripts
    from elektra_spark.session import get_spark

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    spark = get_spark("make-fixtures", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for n in SIZES:
        pdf = (
            synth_transcripts(spark, n_conversations=n, seed=SEED)
            .orderBy("conv_id", "turn_idx")
            .toPandas()
        )
        path = fixture_path(n)
        # microsecond timestamps: Spark cannot read TIMESTAMP(NANOS) parquet
        pdf.to_parquet(path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
        print(f"wrote {path}: {len(pdf)} rows")
    spark.stop()


if __name__ == "__main__":
    main()

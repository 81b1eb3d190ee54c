"""Capture `.explain("formatted")` for registry queries into
plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt (default round: r15).

Usage: python tools/plan_capture.py <tag> <query> [query ...]

Streaming-drain queries (whose returned frame is a local result) capture
the plan of the frame the registry function returns; the interesting
dataflow for those lives in the ops layer and is pinned by tests instead.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("plan-capture")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = entrymod.queries()
    out_dir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = registry[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        print(f"captured {name}_{tag}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

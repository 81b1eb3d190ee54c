"""Quiet-window adjudication for a driver bench flag: fresh-process
median-of-3 timing of ONE registry query under bench.py's exact session
config (sf0.001 warmup of the same query, mapInPandas worker pre-warm,
op-cache release between reps).

Usage: python tools/adjudicate_query.py <query_name> [sf_dir]

Run it three times (three fresh processes) per the round-5 protocol; each
invocation prints one JSON line {"query": ..., "median": ..., "reps": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from bench import _release_op_caches, _warm_python_workers

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-auto-schema-adjudicate")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    fn = entrymod.queries()[name]
    # same warmup convention as bench.py: SPARK_GRAFT_WARM_DIR overrides,
    # a missing fixture warns and runs cold instead of crashing
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir):
        try:
            fn(spark, warm_dir).collect()
        except Exception as exc:
            print(f"WARN warmup failed for {name}: {exc}", file=sys.stderr)
        finally:
            _release_op_caches()
    _warm_python_workers(spark, cpus)

    samples: list[float] = []
    for _ in range(3):
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
        finally:
            # INSIDE the timed window, exactly like bench.py's finally
            # before samples.append — adjudicated medians must include the
            # same cache-release cost the flagged bench medians did
            _release_op_caches()
        samples.append(time.perf_counter() - t0)
    spark.stop()
    print(
        json.dumps(
            {
                "query": name,
                "median": round(sorted(samples)[1], 3),
                "reps": [round(s, 3) for s in samples],
            }
        )
    )


if __name__ == "__main__":
    main()

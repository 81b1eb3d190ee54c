"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-auto-schema-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warmup at the smallest SF: identical plan shapes prime Spark's
    # whole-stage-codegen class cache and JIT, so timed runs measure query
    # execution rather than first-query compilation.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir):
        for name, fn in entrymod.queries().items():
            try:
                fn(spark, warm_dir).collect()
            except Exception:
                pass

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = len(df.collect())
        except Exception as ex:  # pragma: no cover
            print(f"bench query {name} failed: {ex}", file=sys.stderr)
            n = -1
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"  {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

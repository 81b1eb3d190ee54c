"""Session-aging probe: quantify how much a long bench session inflates
query times, and bisect WHICH query families cause it.

Protocol: one session under bench.py's exact config; time a fixed probe
set fresh, then run a pollution pass (chosen registry subset, at sf0.001
like bench's warmup), then re-time the probe set.  The fresh->aged ratio
of the probe set isolates session aging from box speed and query cost.

Usage: python tools/aging_probe.py [family ...]
  family: bench.py family names to include in the pollution pass
          (default: all registered queries, i.e. bench's warmup pass)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PROBES = [
    "infer_lineitem",
    "paragraph_minhash_pairs",
    "zorder_roundtrip",
    "top_supplier",
]
SF_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.001"


def time_probes(spark, registry, release) -> dict[str, float]:
    out = {}
    for name in PROBES:
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            registry[name](spark, SF_DIR).collect()
            release()
            samples.append(time.perf_counter() - t0)
        out[name] = round(sorted(samples)[1], 3)
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from bench import _family, _release_op_caches

    fams = set(sys.argv[1:])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("aging-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for kv in os.environ.get("SPARK_EXTRA_CONFS", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            builder = builder.config(k, v)
    spark = (
        builder.getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = entrymod.queries()
    # small warm pass over just the probes (codegen/JIT), as adjudicate does
    for name in PROBES:
        registry[name](spark, WARM_DIR).collect()
        _release_op_caches()

    fresh = time_probes(spark, registry, _release_op_caches)

    polluted = [
        n for n in registry if not fams or _family(n) in fams
    ]
    t0 = time.perf_counter()
    for name in polluted:
        try:
            registry[name](spark, WARM_DIR).collect()
        except Exception as exc:  # pragma: no cover
            print(f"WARN pollution {name}: {exc}", file=sys.stderr)
        finally:
            _release_op_caches()
    pollution_wall = round(time.perf_counter() - t0, 1)

    aged = time_probes(spark, registry, _release_op_caches)
    spark.stop()

    print(
        json.dumps(
            {
                "families": sorted(fams) or "ALL",
                "n_pollution_queries": len(polluted),
                "pollution_wall_s": pollution_wall,
                "fresh": fresh,
                "aged": aged,
                "ratio": {
                    k: round(aged[k] / fresh[k], 2) if fresh[k] else None
                    for k in fresh
                },
            }
        )
    )


if __name__ == "__main__":
    main()

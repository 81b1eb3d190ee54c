"""Four-digit-nlist probe for the centroid-assignment join path.

The round-12 verdict's finding: the literal-centroid plan carries
nlist*(d+1) literal nodes and was only ever probed at nlist <= 953.  This
probe runs semantic_dedup on the cached 30x embeddings corpus at an
explicit FOUR-DIGIT nlist through BOTH assignment paths — the default
(join path: 1200 * 65 nodes is far above the literal-node budget) and the
literal path forced
by raising the cutover — timing each and verifying the kept-set sizes
agree.  At the testdata's small d the literal plan still analyzes, which
is exactly what makes the A/B possible; at production d (128-768) only
the join path would.

Usage: python tools/join_path_probe.py [out.json]
Merges a "join_path_nlist{N}" section into tools/scaling_probe_30x.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

NLIST = 1200
THRESHOLD = 0.3
REPS = 2


def main() -> None:
    from pyspark.sql import SparkSession

    from spark_auto_schema.io import read_table
    from spark_auto_schema.ops import similarity

    base = os.environ.get("SCALE_BASE_DIR", "/tmp/scale_probe")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "tools/scaling_probe_30x.json"
    src = f"{base}/x30"
    if not os.path.isdir(src):
        raise SystemExit(f"{src} missing — run tools/scaling_probe.py first")

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("join-path-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    embs = read_table(spark, src, "embeddings")

    results: dict[str, dict] = {}
    kept: dict[str, int] = {}
    for path, budget in (("join", 8192), ("literal", 1 << 30)):
        similarity._LITERAL_ASSIGN_NODE_BUDGET = budget
        samples = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            rows = (
                similarity.semantic_dedup(
                    embs, threshold=THRESHOLD, nlist=NLIST
                )
                .where("kept")
                .count()
            )
            samples.append(time.perf_counter() - t0)
            similarity.release_caches()
        kept[path] = rows
        results[path] = {"t_sec": round(min(samples), 3), "n_kept": rows}
        print(f"  {path} path @x30 nlist={NLIST}: {min(samples):.2f}s "
              f"({rows} kept)", file=sys.stderr)
    similarity._LITERAL_ASSIGN_NODE_BUDGET = 8192
    spark.stop()
    assert kept["join"] == kept["literal"], kept

    payload = json.loads(Path(out_path).read_text())
    payload[f"join_path_nlist{NLIST}"] = {
        "note": (
            "semantic_dedup on the x30 corpus at an explicit four-digit "
            "nlist (78k literal nodes, far above the 8192-node budget); "
            "both paths verified to agree on the kept set — the join "
            "path is the default here"
        ),
        **results,
    }
    Path(out_path).write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload[f"join_path_nlist{NLIST}"], indent=1))


if __name__ == "__main__":
    main()

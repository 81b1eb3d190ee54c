"""Tens-of-thousands-k probe for the two-level centroid-assignment tier.

The round-13 verdict's residual ceiling: the flat broadcast-join argmin is
plan-O(1) in k but still computes n*k dot products and ships a k-row
centroid broadcast — at SemDeDup's corpus-driven nlist (ceil(n/63)) both
stop scaling.  This probe runs nearest-centroid assignment over the
cached 30x embeddings corpus (60k vectors, d=64) at k in the thousands
and the TENS of thousands through BOTH tiers — the flat join path
(forced by raising the two-level cutover) and the pruned two-level tier
at its default probe — timing each, and reporting the cluster-agreement
and score-exact fractions of the pruned result against the exact one
(the law tests pin monotonicity and full-probe exactness; this probe
prices the default pruning at scale).

Usage: python tools/two_level_probe.py [out.json]
Merges a "two_level_k{N}" section per k into tools/scaling_probe_30x.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

KS = (4096, 20480)
REPS = 2


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spark_auto_schema.io import read_table
    from spark_auto_schema.ops import similarity

    base = os.environ.get("SCALE_BASE_DIR", "/tmp/scale_probe")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else "tools/scaling_probe_30x.json"
    )
    src = f"{base}/x30"
    if not os.path.isdir(src):
        raise SystemExit(f"{src} missing — run tools/scaling_probe.py first")

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("two-level-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    embs = read_table(spark, src, "embeddings").cache()
    n = embs.count()

    results: dict[str, dict] = {}
    for k in KS:
        init = (
            embs.select("vec_id", "embedding")
            .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
            .limit(k)
            .collect()
        )
        cents = [
            (i, [float(x) for x in r["embedding"]])
            for i, r in enumerate(init)
        ]
        assert len(cents) == k
        timings: dict[str, float] = {}
        outs: dict[str, dict] = {}
        for tier in ("flat", "two_level"):
            budget = (1 << 30) if tier == "flat" else 1024
            orig = similarity._TWO_LEVEL_CENTROID_BUDGET
            similarity._TWO_LEVEL_CENTROID_BUDGET = budget
            try:
                samples = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    rows = similarity._assign_nearest(
                        embs, cents, "embedding", "vec_id",
                        metric="l2", keep_vec=False,
                    ).collect()
                    samples.append(time.perf_counter() - t0)
                outs[tier] = {
                    r["vec_id"]: (r["cluster"], r["__score"]) for r in rows
                }
                timings[tier] = min(samples)
            finally:
                similarity._TWO_LEVEL_CENTROID_BUDGET = orig
        exact, pruned = outs["flat"], outs["two_level"]
        agree = sum(
            1 for v in exact if pruned[v][0] == exact[v][0]
        ) / len(exact)
        score_exact = sum(
            1 for v in exact if pruned[v][1] == exact[v][1]
        ) / len(exact)
        results[f"two_level_k{k}"] = {
            "n": n,
            "k": k,
            "flat_sec": round(timings["flat"], 2),
            "two_level_sec": round(timings["two_level"], 2),
            "speedup": round(timings["flat"] / timings["two_level"], 2),
            "cluster_agreement": round(agree, 4),
            "score_exact_fraction": round(score_exact, 4),
        }
        print(results[f"two_level_k{k}"], flush=True)

    merged = {}
    p = Path(out_path)
    if p.exists():
        merged = json.loads(p.read_text())
    merged.update(results)
    p.write_text(json.dumps(merged, indent=1))
    print(f"merged into {out_path}")


if __name__ == "__main__":
    main()

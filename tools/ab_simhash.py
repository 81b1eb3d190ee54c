"""A/B probe: current simhash tallies (64 CASE-WHEN sums) vs packed-lane
tallies (32 shift+mask sums, 2 lanes of 32 bits each) — same session, same
persisted input, interleaved reps, value-equality check first.

Usage: python tools/ab_simhash.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F


def simhash_old(tokens):
    h = F.xxhash64(F.col("tok"))
    tallies = tokens.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sig = None
    for i in range(64):
        bit = F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return tallies.select("id", sig.alias("simhash"))


_LANE_MASK = (1 << 32) | 1  # bits 0 and 32


def simhash_new(tokens):
    h = F.xxhash64(F.col("tok"))
    tallies = tokens.groupBy("id").agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.shiftright(h, j).bitwiseAND(F.lit(_LANE_MASK))).alias(f"s{j}")
            for j in range(32)
        ],
    )

    def cnt(i: int):
        s = F.col(f"s{i % 32}")
        if i >= 32:
            s = F.shiftright(s, 32)
        return s.bitwiseAND(F.lit(0xFFFFFFFF))

    sig = None
    for i in range(64):
        bit = F.when(
            cnt(i) * 2 > F.col("__n"), F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return tallies.select("id", sig.alias("simhash"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-simhash")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    ).where(F.length("tok") > 0)

    # value equality first
    a = simhash_old(tokens).withColumnRenamed("simhash", "sa")
    b = simhash_new(tokens).withColumnRenamed("simhash", "sb")
    diff = a.join(b, "id").where(F.col("sa") != F.col("sb")).count()
    n = a.count()
    print(f"docs={n} mismatches={diff}")
    assert diff == 0, "packed-lane simhash diverges!"

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(tokens).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm both
    run(simhash_old)
    run(simhash_new)
    olds, news = [], []
    for _ in range(reps):
        olds.append(run(simhash_old))
        news.append(run(simhash_new))
    print(f"old: med {statistics.median(olds):.3f} min {min(olds):.3f} {['%.3f' % x for x in olds]}")
    print(f"new: med {statistics.median(news):.3f} min {min(news):.3f} {['%.3f' % x for x in news]}")
    spark.stop()


if __name__ == "__main__":
    main()

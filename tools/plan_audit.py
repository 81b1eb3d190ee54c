"""Audit the physical plan of every registered query for scale anti-patterns.

Flags, per query:
* CartesianProduct            — unbounded pair blowup (broadcast/bucket it)
* BatchEvalPython             — row-at-a-time Python UDF in the plan
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas are the sanctioned
  Arrow paths and are NOT flagged)
* exchanges                   — count of Exchange nodes (shuffles); queries
  above the threshold are listed for review (some legitimately need several:
  multi-join pipelines, LSH band joins)
* scan-without-pushdown       — a Filter directly above a parquet scan whose
  PushedFilters is empty (predicate failed to reach the scan)

Usage: python tools/plan_audit.py [name ...]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"
EXCHANGE_REVIEW_THRESHOLD = 4


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    only = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    findings: list[str] = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
        except Exception as ex:
            findings.append(f"{name}: FAILED TO BUILD: {ex}")
            continue
        if df.isStreaming:
            continue  # streaming plans audited in tests
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        simple_buf = io.StringIO()
        with redirect_stdout(simple_buf):
            df.explain("simple")
        simple = simple_buf.getvalue()

        if "CartesianProduct" in simple:
            findings.append(f"{name}: CartesianProduct (unbroadcast pair blowup)")
        if "BatchEvalPython" in simple:
            findings.append(f"{name}: BatchEvalPython (row-at-a-time Python UDF)")
        n_ex = simple.count("Exchange")
        if n_ex > EXCHANGE_REVIEW_THRESHOLD:
            findings.append(f"{name}: {n_ex} exchanges (review)")
        # Filter directly above a scan with no pushed filters
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "PushedFilters: []" in line:
                ctx = "\n".join(lines[max(0, i - 12) : i])
                if "Filter" in ctx and "Scan parquet" in ctx:
                    findings.append(f"{name}: filter not pushed to scan")
                    break

    print(f"audited {len(entrymod.queries())} queries")
    if findings:
        print("FINDINGS:")
        for f in findings:
            print(" -", f)
    else:
        print("no anti-patterns found")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

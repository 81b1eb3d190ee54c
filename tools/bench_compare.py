"""Compare two bench_detail.json runs and flag real regressions.

Box noise on this shared host can inflate individual query medians 2-4x
run-to-run (documented in BASELINE.md's round-6 section), so a naive
"slower than last time" check cries wolf.  This comparator applies the
methodology BASELINE.md prescribes:

* per-query ratio = new_median / old_median, flagged only above
  ``--threshold`` (default 2.0) AND above ``--min-sec`` absolute cost
  (default 0.5 s — sub-second queries are pure scheduling jitter);
* a whole-run drift line (total ratio) so a uniformly-loaded box (every
  query inflated alike) reads as environment, not regression;
* queries present in only one run are listed (registry grew or shrank).

Exit code 1 if any query is flagged, 0 otherwise — wire it after a bench
run to gate on "no query regressed >2x vs the recorded anchor".

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 2.0]
       [--min-sec 0.5]
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=0.5)
    args = ap.parse_args()

    old = json.load(open(args.old))
    new = json.load(open(args.new))
    oq, nq = old["queries"], new["queries"]

    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print(f"queries only in {args.old}: {only_old}")
    if only_new:
        print(f"queries only in {args.new}: {only_new}")

    total_old = sum(oq.values())
    total_new = sum(nq.values())
    drift = total_new / total_old if total_old else float("nan")
    print(
        f"whole-run: {total_old:.1f}s -> {total_new:.1f}s "
        f"(x{drift:.2f}; >1.15 suggests box load, compare per-query below)"
    )

    flagged = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if b < args.min_sec or a <= 0:
            continue
        ratio = b / a
        if ratio > args.threshold:
            flagged.append((ratio, name, a, b))
    for ratio, name, a, b in sorted(flagged, reverse=True):
        print(f"REGRESSED x{ratio:.2f}  {name}: {a:.2f}s -> {b:.2f}s")
    if not flagged:
        print("no per-query regression above threshold")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())

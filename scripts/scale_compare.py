"""Compare a single-cold-pass sf1 bench against sf0.1 cold costs.

Protocol (SCALE.md §9): cold-vs-cold — each query's sf0.1 cold cost is its
first/max wall from the 3-run sf0.1 bench (memoized fixtures make min/med
warm), the sf1 side is one all-cold pass (SPARK_GRAFT_BENCH_RUNS=1).
Prints total ratio, per-query ratio median, and every query over the
flag threshold (default 12x for 10x data).

Usage: python scripts/scale_compare.py BENCH_SF01_DETAIL.json BENCH_SF1_DETAIL.json [threshold]
"""

import json
import statistics
import sys


def main() -> None:
    sf01 = json.load(open(sys.argv[1]))
    sf1 = json.load(open(sys.argv[2]))
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
    s01 = sf01["queries_spread"]
    s1 = sf1["queries_spread"]
    common = sorted(set(s01) & set(s1))
    missing = sorted(set(s1) ^ set(s01))
    if missing:
        print(f"# not in both runs ({len(missing)}): {', '.join(missing)}")
    ratios = {}
    for q in common:
        cold01 = max(s01[q]["max"], s01[q].get("first", 0.0))
        cold1 = max(s1[q]["max"], s1[q].get("first", 0.0))
        if cold01 > 0:
            ratios[q] = cold1 / cold01
    t01 = sum(max(s01[q]["max"], s01[q].get("first", 0.0)) for q in common)
    t1 = sum(max(s1[q]["max"], s1[q].get("first", 0.0)) for q in common)
    print(f"queries compared: {len(common)}")
    print(f"sf0.1 cold total: {t01:.1f}s   sf1 cold total: {t1:.1f}s   ratio: {t1 / t01:.2f}x for 10x data")
    print(f"per-query ratio median: {statistics.median(ratios.values()):.2f}x")
    over = {q: r for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]) if r > threshold}
    print(f"over {threshold:.0f}x: {len(over)}")
    for q, r in over.items():
        print(f"  {q}: {r:.1f}x  (sf0.1 {max(s01[q]['max'], s01[q].get('first', 0)):.2f}s -> sf1 {max(s1[q]['max'], s1[q].get('first', 0)):.2f}s)")
    slowest = sorted(s1, key=lambda q: -s1[q]["max"])[:10]
    print("slowest at sf1:")
    for q in slowest:
        print(f"  {q}: {s1[q]['max']:.1f}s")


if __name__ == "__main__":
    main()

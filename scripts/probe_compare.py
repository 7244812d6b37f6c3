"""Probe-normalized round-over-round bench comparison.

The sandbox's machine speed varies several-fold between driver rounds
(r7: an apparent 2x across-the-board regression tracked the matmul probe
exactly; r9: a raw +10%/query delta vanished once the 0.155 s -> 0.267 s
matmul probe was factored in). bench.py measures two fixed
microbenchmarks each run (`machine_probe`: BLAS matmul_2048_s + pure-
Python pyloop_5m_s); this script divides raw wall-clock ratios by the
probe ratio so a round-over-round delta reads as ENGINE change, not
machine weather.

Correction factor between runs A and B: the geometric mean of the two
probe ratios (matmul tracks BLAS/JVM-adjacent throughput, pyloop tracks
the Python interpreter side; a query mixes both). corrected_ratio =
raw_ratio / probe_ratio, so corrected 1.00 = "same engine speed".

Usage:
  python scripts/probe_compare.py OLD_DETAIL.json NEW_DETAIL.json [top_n]
      per-query corrected delta table between two BENCH_DETAIL-shaped
      files (bench_history/detail_r*.json keeps one per round from r10).
  python scripts/probe_compare.py --summary bench_history/summary.json
      corrected total-suite deltas across all recorded rounds (for
      rounds before r10 only totals + probes survive).
"""

import json
import math
import statistics
import sys


def probe_ratio(old_probe: dict, new_probe: dict) -> float:
    rm = new_probe["matmul_2048_s"] / old_probe["matmul_2048_s"]
    rp = new_probe["pyloop_5m_s"] / old_probe["pyloop_5m_s"]
    return math.sqrt(rm * rp)


def compare_details(old_path: str, new_path: str, top_n: int = 15) -> None:
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    pr = probe_ratio(old["machine_probe"], new["machine_probe"])
    print(
        f"machine probe: matmul {old['machine_probe']['matmul_2048_s']:.3f} -> "
        f"{new['machine_probe']['matmul_2048_s']:.3f}s, pyloop "
        f"{old['machine_probe']['pyloop_5m_s']:.3f} -> "
        f"{new['machine_probe']['pyloop_5m_s']:.3f}s  => probe ratio {pr:.3f}"
    )
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    if added:
        print(f"# new queries ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"# removed queries ({len(removed)}): {', '.join(removed)}")
    rows = []
    for q in common:
        if qo[q] > 0:
            raw = qn[q] / qo[q]
            rows.append((q, qo[q], qn[q], raw, raw / pr))
    corr = [r[4] for r in rows]
    to, tn = sum(qo[q] for q in common), sum(qn[q] for q in common)
    print(
        f"common queries: {len(common)}   total {to:.1f}s -> {tn:.1f}s  "
        f"raw {tn / to:.2f}x  corrected {tn / to / pr:.2f}x"
    )
    print(f"per-query corrected ratio median: {statistics.median(corr):.2f}x")
    rows.sort(key=lambda r: -r[4])
    print(f"largest corrected regressions (top {top_n}):")
    for q, o, n, raw, c in rows[:top_n]:
        print(f"  {q}: {o:.3f}s -> {n:.3f}s  raw {raw:.2f}x  corrected {c:.2f}x")
    print(f"largest corrected improvements (top {top_n}):")
    for q, o, n, raw, c in rows[-top_n:][::-1]:
        print(f"  {q}: {o:.3f}s -> {n:.3f}s  raw {raw:.2f}x  corrected {c:.2f}x")


def compare_summary(path: str) -> None:
    hist = json.load(open(path))["rounds"]
    print("round  queries  total_s  s/query  probe(matmul/pyloop)  corrected s/query vs prev")
    prev = None
    for r in hist:
        spq = r["total_s"] / r["n_queries"]
        line = (
            f"r{r['round']:>2}   {r['n_queries']:>5}   {r['total_s']:>7.1f}  "
            f"{spq:>6.3f}  {r['probe']['matmul_2048_s']:.3f}/{r['probe']['pyloop_5m_s']:.3f}"
        )
        if prev is not None:
            pr = probe_ratio(prev["probe"], r["probe"])
            raw = spq / (prev["total_s"] / prev["n_queries"])
            line += f"   raw {raw:.2f}x  corrected {raw / pr:.2f}x"
        print(line)
        prev = r


if __name__ == "__main__":
    if sys.argv[1] == "--summary":
        compare_summary(sys.argv[2])
    else:
        compare_details(
            sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 15
        )

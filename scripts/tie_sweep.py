"""Decimal-rounding-tie sweep over every DuckDB oracle (VERDICT r11 #1).

Why: gate metrics are typically emitted as ``round(x, k)``. When the
unrounded ``x`` lands EXACTLY on a ``.5 * 10^-k`` boundary (r11's live
example: avg_precision src2, ap = 0.6890625 = 689062.5e-6 at k=6), Spark's
``F.round`` (HALF_UP over the shortest decimal repr) and DuckDB's ``round``
(over the raw binary double) can resolve the tie differently across
versions/platforms — a gate-fixture fragility, not an engine bug, but it
reads as a red driver row.

What this does: for each ``oracle_sql()`` entry, strip ``round(expr, k)``
calls from the FINAL top-level SELECT (balanced-paren scan, CTE bodies left
untouched so join/group semantics are preserved), run the de-rounded SQL on
DuckDB at the given sf, and flag any emitted float that sits within
``--tol`` (default 1e-9) of a ``.5 * 10^-k`` boundary for any k stripped
from that query. Exit 1 if anything is flagged.

Usage: env PYTHONPATH=/root/repo python scripts/tie_sweep.py [sf_dir] [--tol 1e-9]
"""

from __future__ import annotations

import math
import re
import sys


def _split_final_select(sql: str) -> tuple[str, str]:
    """Return (prefix, final_select) where final_select is the last
    top-level (paren-depth-0) SELECT statement."""
    depth = 0
    last = -1
    up = sql.upper()
    for i, ch in enumerate(sql):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and up.startswith("SELECT", i):
            # word boundary on both sides
            before_ok = i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")
            after = i + 6
            after_ok = after >= len(sql) or not (sql[after].isalnum() or sql[after] == "_")
            if before_ok and after_ok:
                last = i
    if last < 0:
        return sql, ""
    return sql[:last], sql[last:]


def _strip_rounds(fragment: str) -> tuple[str, set[int]]:
    """Replace every ``round(expr, k)`` in fragment with ``(expr)``;
    return (new_fragment, {k, ...}). Balanced-paren scan, case-insensitive,
    handles nesting (inner rounds stripped on subsequent passes)."""
    ks: set[int] = set()
    pat = re.compile(r"\bround\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(fragment)
        if m is None:
            return fragment, ks
        start, open_i = m.start(), m.end() - 1
        depth, i = 0, open_i
        comma = -1
        while i < len(fragment):
            ch = fragment[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "," and depth == 1:
                comma = i
            i += 1
        if depth != 0:
            return fragment, ks  # unbalanced — bail, diagnostic only
        close = i
        if comma < 0:
            inner, k = fragment[open_i + 1 : close], 0
        else:
            inner = fragment[open_i + 1 : comma]
            try:
                k = int(fragment[comma + 1 : close].strip())
            except ValueError:
                k = 0
        ks.add(k)
        fragment = fragment[:start] + "(" + inner + ")" + fragment[close + 1 :]


def sweep(sf_dir: str, tol: float = 1e-9) -> list[tuple[str, str, int, float]]:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from scripts.check_correctness import duck_con

    con = duck_con(sf_dir)
    flagged: list[tuple[str, str, int, float]] = []
    n_checked = n_derounded = 0
    for name, sql in e.oracle_sql().items():
        prefix, final = _split_final_select(sql)
        stripped, ks = _strip_rounds(final)
        ks = {k for k in ks if k > 0}
        if not ks:
            continue
        n_derounded += 1
        try:
            df = con.execute(prefix + stripped).fetchdf()
        except Exception as exc:  # de-round broke the SQL — report, don't crash
            print(f"SKIP {name}: de-rounded SQL failed: {str(exc)[:150]}")
            continue
        for col in df.columns:
            if df[col].dtype.kind != "f":
                continue
            for v in df[col].dropna():
                v = float(v)
                if math.isnan(v) or math.isinf(v):
                    continue
                n_checked += 1
                for k in ks:
                    scaled = abs(v) * 10**k
                    if scaled > 2**52:  # beyond exact-integer doubles
                        continue
                    dist = abs(scaled - math.floor(scaled) - 0.5) / 10**k
                    if dist < tol:
                        flagged.append((name, col, k, v))
    print(
        f"\nswept {n_derounded} de-roundable oracles, {n_checked} float values; "
        f"{len(flagged)} within {tol} of a .5*10^-k rounding tie"
    )
    for name, col, k, v in flagged:
        print(f"TIE  {name}.{col} (k={k}): {v!r} = {v * 10**k!r}e-{k}")
    return flagged


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tol = 1e-9
    for a in sys.argv[1:]:
        if a.startswith("--tol"):
            tol = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    sf = args[0] if args else "/root/testdata/sf0.01"
    sys.exit(1 if sweep(sf, tol) else 0)

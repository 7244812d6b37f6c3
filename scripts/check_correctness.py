"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compares row count, sorted column names, and an order-insensitive
value hash. Exits non-zero listing mismatches.

Usage: env PYTHONPATH=/root/repo python scripts/check_correctness.py [sf_dir] [only...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb
import pandas as pd


def canonical_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # Render floats distinctly from ints: the driver's hash does NOT
            # collapse 123.0 -> "123", so a DuckDB HUGEINT surfacing as float
            # must fail here too (it failed tpch_q12 in round 1 while this
            # mirror reported green).
            return repr(v)
        if isinstance(v, bool):
            return str(bool(v))
        try:
            import numpy as np

            if isinstance(v, (np.integer,)):
                return str(int(v))
            if isinstance(v, (np.floating,)):
                return cell(float(v))
            if isinstance(v, np.bool_):
                return str(bool(v))
        except ImportError:
            pass
        return str(v)

    rows = sorted(",".join(cell(v) for v in row) for row in df.itertuples(index=False))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def duck_con(sf_dir: str):
    """DuckDB connection with the synthetic tables registered as views,
    exactly as the driver does it."""
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in e.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def run_check(spark, con, sf_dir: str, only=None) -> list[tuple[str, str]]:
    """Run the queries() vs oracle_sql() compare; return (name, problem)
    failures. ``only`` restricts to those query names (None = all).
    Importable — tests/test_past_window_mirror.py uses this to keep the
    entries beyond the driver's 50-entry correctness window honest."""
    import __spark_entry__ as e

    only = set(only) if only else set()
    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"FAIL {name}: spark error: {str(exc)[:300]}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(sdf)} (no oracle — rows-only check)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            failures.append((name, f"DUCKDB ERROR: {exc}"))
            print(f"FAIL {name}: duckdb error: {str(exc)[:300]}")
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        if not problems:
            hs, hd = canonical_hash(sdf), canonical_hash(ddf)
            if hs != hd:
                problems.append("value-hash mismatch")
                merged = sdf.reindex(sorted(sdf.columns), axis=1)
                merged_d = ddf.reindex(sorted(ddf.columns), axis=1)
                print(" spark:", merged.head(3).to_dict("records"))
                print(" duck :", merged_d.head(3).to_dict("records"))
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name}: rows={len(sdf)} ({time.time() - t0:.1f}s)")
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from stackstac_spark.session import get_spark

    spark = get_spark("correctness", master="local[8]", shuffle_partitions=8)
    failures = run_check(spark, duck_con(sf_dir), sf_dir, only=only)
    n_run = len(only) if only else len(e.queries())
    print(f"\n{n_run - len(failures)}/{n_run} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

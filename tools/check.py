"""Local correctness harness mirroring the driver's verify step.

Runs every registered query at a given scale factor on Spark AND its
DuckDB oracle, then compares row count, schema (pandas dtypes), and
an order-insensitive value hash. Strictly *at least* as picky as the
driver: dtype mismatches and any value diff fail here first.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from project_orbit_spark import registry  # noqa: E402
from project_orbit_spark.catalog import TABLES  # noqa: E402
from project_orbit_spark.session import get_spark  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: columns sorted by name, rows
    sorted by all columns (stringified for stability)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    scols = {c: str(t) for c, t in spark_pdf.dtypes.items()}
    dcols = {c: str(t) for c, t in duck_pdf.dtypes.items()}
    if set(scols) != set(dcols):
        problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        return problems
    for c in scols:
        if scols[c] != dcols[c]:
            problems.append(f"dtype[{c}] spark={scols[c]} duck={dcols[c]}")
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b).any(axis=1)
        idx = neq[neq].index[:3]
        for i in idx:
            problems.append(f"row[{i}] spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = registry.all_queries()
    n_pass = n_fail = n_noracle = 0
    for name, q in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"----  {name}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            n_noracle += 1
            continue
        try:
            duck_pdf = con.execute(q.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Dump .explain("formatted") for named registered queries to files.

Usage:
    python tools/dump_plans.py <sf_dir> <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query. Used to commit
the before/after plan evidence for optimization rounds (guide §1 /
§7.2): the round judge cannot run Spark and checks plan claims
against these files.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    sf_dir, out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from project_orbit_spark import registry

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '4')}]"
        )
        .appName("dump_plans")
        .getOrCreate()
    )
    for name in names:
        q = registry.get_query(name)
        df = q.fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()

"""Quick idle-box re-measure of named bench queries.

Usage: python tools/time_queries.py <sf_dir> <reps> <query> [query ...]

Same methodology as bench.py (one untimed warm rep, then median of
<reps> timed collect() reps per query) but scoped to a named subset so
an optimization loop can re-measure its target in ~seconds instead of
the full 59-query sweep. Prints one line per query plus a JSON tail.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir, reps_s, *names = sys.argv[1:]
    reps = int(reps_s)
    if reps < 1:  # ADVICE r17 #4: reps=0 would NameError/IndexError below
        sys.exit("reps must be >= 1")
    from project_orbit_spark import registry
    from project_orbit_spark.session import get_spark

    spark = get_spark("time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-ups as bench.py so numbers are comparable
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    from project_orbit_spark.catalog import load

    for t in ("documents", "lineitem", "orders", "customer", "events"):
        try:
            load(spark, sf_dir, t).count()
        except Exception:
            pass
    out: dict[str, float] = {}
    for name in names:
        q = registry.get_query(name)
        if q.prepare is not None:
            q.prepare(spark, sf_dir)
        spark.sparkContext.setJobDescription(f"warm:{name}")
        q.fn(spark, sf_dir).collect()
        samples = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"rep{i}:{name}")
            t0 = time.time()
            n = len(q.fn(spark, sf_dir).collect())
            samples.append(time.time() - t0)
        med = sorted(samples)[len(samples) // 2]
        out[name] = round(med, 3)
        detail = "/".join(f"{s:.2f}" for s in sorted(samples))
        print(f"{name}: median {med:.2f}s of [{detail}] ({n} rows)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

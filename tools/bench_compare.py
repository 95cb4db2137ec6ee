"""Round-over-round bench diff with contention awareness.

Compares two bench records and separates real regressions from run1
contention blips — the recurring analysis of rounds 8-10 (ambient
load inflates run1; run2 of the same invocation is the steady-state
signal, and BENCH_DETAIL.json carries loadavg markers to attribute
the difference).

Accepts any of the three shapes this repo produces:
- driver records   BENCH_r{N}.json       ({"parsed": {"queries": …}})
- detail records   BENCH_DETAIL.json     ({"queries": …, "queries_run2": …})
- raw bench lines  (the single-JSON-line stdout of bench.py)

Usage:
    python tools/bench_compare.py OLD.json NEW.json [threshold=1.3]

Exit code 1 iff any query regresses past the threshold in BOTH run1
and run2 (a run1-only excursion is reported as a blip, not a
regression).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def load_record(path: str) -> tuple[dict, dict | None, dict | None]:
    """(run1 queries, run2 queries or None, load markers or None)."""
    raw = Path(path).read_text()
    try:
        rec = json.loads(raw)
    except ValueError:
        rec = json.loads(raw.strip().splitlines()[-1])  # bench stdout
    if "parsed" in rec:  # driver BENCH_r{N}.json
        rec = rec["parsed"]
    q1 = rec["queries"]
    q2 = rec.get("queries_run2")
    return q1, q2, rec.get("load")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old1, _old2, old_load = load_record(sys.argv[1])
    new1, new2, new_load = load_record(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

    common = sorted(set(old1) & set(new1))
    t_old = sum(old1[q] for q in common)
    t_new = sum(new1[q] for q in common)
    print(f"common {len(common)} queries: {t_new:.1f}s vs {t_old:.1f}s "
          f"= {t_new / t_old:.2f}x (run1 vs run1)")
    for label, load in (("old", old_load), ("new", new_load)):
        if load and "before_run1" in load:
            m = load["before_run1"]
            print(f"  {label} load before run1: loadavg_1m="
                  f"{m.get('loadavg_1m')} mem_avail={m.get('mem_available_gib')}GiB")

    regressions, blips = [], []
    for q in common:
        r1 = new1[q] / old1[q] if old1[q] > 0 else float("inf")
        if r1 <= threshold or new1[q] < 0.3:  # small absolutes are noise
            continue
        r2 = (new2[q] / old1[q]) if new2 and q in new2 and old1[q] > 0 else None
        if r2 is not None and r2 <= threshold:
            blips.append((r1, r2, q))
        else:
            regressions.append((r1, r2, q))

    for r1, r2, q in sorted(blips, reverse=True):
        print(f"  BLIP {q}: run1 {r1:.2f}x but run2 {r2:.2f}x — contention, "
              f"not a regression")
    for r1, r2, q in sorted(regressions, reverse=True):
        run2s = f", run2 {r2:.2f}x" if r2 is not None else " (no run2 data)"
        print(f"  REGRESSION {q}: run1 {r1:.2f}x{run2s} "
              f"({old1[q]:.2f}s -> {new1[q]:.2f}s)")

    added = sorted(set(new1) - set(old1))
    removed = sorted(set(old1) - set(new1))
    if added:
        print(f"  new entries: {', '.join(added)}")
    if removed:
        print(f"  removed entries: {', '.join(removed)}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())

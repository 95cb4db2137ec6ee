"""Guards for tools/plan_audit.py — the full-registry scale audit.

The full audit (every query's executed plan) runs out-of-band
(``python tools/plan_audit.py``, ~6 min); these tests pin the two
invariants that rot silently between runs:

1. the BNLJ bounded-build allowlist only names registered queries
   (a rename/removal would otherwise leave a stale allowlist entry
   that could mask a NEW unbounded BroadcastNestedLoopJoin under the
   recycled name);
2. a representative sample of join-heavy queries still builds
   cartesian-free plans, and a known-BNLJ query's plan still carries
   the bounded-broadcast shape the allowlist asserts.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from plan_audit import BNLJ_BOUNDED  # noqa: E402

from project_orbit_spark import registry  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# Join-heavy queries whose plans must never contain a cartesian.
SAMPLE_NO_CARTESIAN = [
    "q5_revenue_by_nation",
    "salted_skew_join",
    "asof_latest_order",
    "minhash_lsh_near_dups",
    "embedding_near_dup_pairs",
    "order_count_distribution",
]


def test_allowlist_names_are_registered():
    registered = set(registry.all_queries())
    stale = BNLJ_BOUNDED - registered
    assert not stale, (
        f"plan_audit.BNLJ_BOUNDED names unregistered queries {sorted(stale)} "
        "— remove them so a future query reusing the name is not "
        "silently exempted from the unbounded-BNLJ audit"
    )


def test_sample_plans_cartesian_free(spark):
    queries = registry.all_queries()
    for name in SAMPLE_NO_CARTESIAN:
        df = queries[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        if name not in BNLJ_BOUNDED:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_known_bnlj_is_broadcast_bounded(spark):
    """cosine_topk_exact is allowlisted because its non-equi join's
    build side is a single broadcast query vector — assert the plan
    still shows the broadcast, so the allowlist claim stays true."""
    df = registry.all_queries()["cosine_topk_exact"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "BroadcastNestedLoopJoin" in plan:
        assert "BroadcastExchange" in plan or "broadcast" in plan.lower()

"""Source-hygiene guards: the scale rules the operator surface must
never regress on, pinned as greps so a future operator can't quietly
reintroduce a driver-side loop or a row-at-a-time Python UDF.

- No ``.collect()`` / ``.toPandas()`` in the operator surface. The
  only allowed sites are the two 25-row nation-dim fixture-templating
  reads in sources/roundtrip.py (bounded dimension, test-fixture
  synthesis — not a data path).
- No row-at-a-time ``@udf`` / ``F.udf`` anywhere: Python on the hot
  path is only ever Arrow-batched (mapInPandas / applyInPandas /
  applyInPandasWithState / pandas_udf).
- No wall-clock or RNG in operators: results must be pure functions
  of the input tables (rand()/uuid() would break oracle parity and
  re-run determinism; sampling is md5-hash-bucketed instead).
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "project_orbit_spark"

COLLECT_ALLOWED = {
    # nation fixture templating (25-row dim, twice)
    "sources/roundtrip.py": 2,
    # merge_upsert_partitioned's touched-partition list: bounded by
    # the BATCH's partition-value domain (a lang set, a few dt days),
    # never by row counts — the contract is documented at the site
    "sources/connectors.py": 1,
    # exact_near_dup_pairs' fail-fast label-cardinality probe (r15,
    # VERDICT r14 ask #3): groupBy(label).count().filter(> bound)
    # .limit(1).collect() — output bounded at ONE row by the limit,
    # and it runs INSTEAD OF a quadratic join, not on a data path
    "similarity/cosine.py": 1,
    # _gated_span_batch's summed-fan-out probe (r16, VERDICT r15 ask
    # #5): one global agg over the O(new) batch → exactly ONE row
    # out; it gates a broadcast hint, it is not a data path
    "operators/dedup.py": 1,
}


def _py_sources():
    return [p for p in PKG.rglob("*.py") if "__pycache__" not in p.parts]


def test_no_driver_side_collect():
    hits: dict[str, int] = {}
    for p in _py_sources():
        n = len(re.findall(r"\.collect\(|\.toPandas\(|collectAsList", p.read_text()))
        if n:
            hits[str(p.relative_to(PKG))] = n
    assert hits == COLLECT_ALLOWED, (
        f"collect/toPandas sites changed: {hits} — every operator must "
        "stay distributed; extend the allowlist only for bounded "
        "fixture templating, never a data path"
    )


def test_no_row_at_a_time_udf():
    offenders = []
    for p in _py_sources():
        text = p.read_text()
        if re.search(r"@udf\b|\bF\.udf\(|functions\.udf\(", text):
            offenders.append(str(p.relative_to(PKG)))
    assert not offenders, (
        f"row-at-a-time Python UDFs found in {offenders} — use Arrow-"
        "batched pandas UDFs (10-100x faster) or built-in functions"
    )


def test_no_wall_clock_or_rng_in_operators():
    offenders = []
    pat = re.compile(
        r"F\.rand\(|F\.randn\(|F\.uuid\(|current_timestamp\(|"
        r"current_date\(|datetime\.now\(|time\.time\(|random\."
    )
    for p in _py_sources():
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if pat.search(line):
                offenders.append(f"{p.relative_to(PKG)}:{i}")
    assert not offenders, (
        f"nondeterminism found at {offenders} — operators are pure "
        "functions of their input tables (hash-bucket instead)"
    )


def test_fixture_doc_ids_stay_below_inject_offset():
    """The dedup-injection id-space contract (ADVICE r16 #2): every
    oracle that models injected docs by id range (refresh_band_index's
    expiry predicate `doc_id < 100000`, the audits' `doc_id >= 100000`
    ground-truth splits) is sound only while BASE doc_ids stay below
    INJECT_OFFSET. Pin that bound against the actual fixtures at all
    three SFs, so a regenerated/larger fixture fails here instead of
    silently diverging oracle from engine. (tools/scale_probe.py
    enforces the same bound on its synthesized K-times corpora at
    synth time.)"""
    import pyarrow.parquet as pq

    from project_orbit_spark.operators.dedup import INJECT_OFFSET

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = Path("/root/testdata") / sf / "documents.parquet"
        if not path.exists():
            continue
        hi = max(
            pq.read_table(path, columns=["doc_id"])["doc_id"].to_pylist()
        )
        assert hi < INJECT_OFFSET, (
            f"{sf}: max doc_id {hi} >= INJECT_OFFSET {INJECT_OFFSET} — "
            "the id-range oracles in operators/dedup.py are no longer "
            "sound for this fixture"
        )

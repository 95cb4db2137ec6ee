"""Error-bound tests for sketch aggregates: rows-only queries still
get quantitative verification — approximation error vs the exact
answer, not hash equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_orbit_spark.catalog import load
from project_orbit_spark.operators.sketches import (
    approx_distinct_sketch,
    approx_percentile_sketch,
)
from tests.conftest import SF_DIR


def test_hll_within_3rsd_of_exact(spark):
    """Every HLL column bounded vs its exact twin. approx_count_distinct
    defaults to rsd=0.05 (a 1-sigma relative deviation) — assert 3×rsd
    so the bound is honest at any scale factor, plus an absolute floor
    for tiny cardinalities."""
    approx = {
        r["event_type"]: (r["approx_users"], r["approx_days"], r["approx_prop_values"])
        for r in approx_distinct_sketch(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: (r["nu"], r["nd"], r["np"])
        for r in load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nu"),
            F.countDistinct(F.date_format("ts", "yyyy-MM-dd")).alias("nd"),
            F.countDistinct(F.get_json_object("props", "$.k")).alias("np"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        for got, want in zip(approx[k], exact[k]):
            assert want > 0, (k, exact[k])
            assert abs(got - want) <= max(2, 3 * 0.05 * want), (k, got, want)


def test_approx_percentiles_near_exact(spark):
    approx = {
        r["o_orderstatus"]: (r["ap50"], r["ap90"], r["ap99"])
        for r in approx_percentile_sketch(spark, SF_DIR).collect()
    }
    exact_rows = (
        load(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
            F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
        )
        .collect()
    )
    # percentile_approx returns an actual data value nearest the rank;
    # allow 2% relative slack vs the interpolated exact value
    for r in exact_rows:
        a = approx[r["o_orderstatus"]]
        for got, want in zip(a, (r["p50"], r["p90"], r["p99"])):
            assert abs(got - want) <= 0.02 * abs(want) + 1e-6, (r["o_orderstatus"], got, want)


def test_audit_twins_all_within_bound(spark):
    """The driver-visible audit twins must emit TRUE for every group —
    that's exactly what their oracles assert via hash compare."""
    from project_orbit_spark.operators.sketches import (
        approx_distinct_audit,
        approx_percentile_audit,
    )

    d = approx_distinct_audit(spark, SF_DIR).collect()
    assert d and all(r["users_ok"] and r["days_ok"] and r["props_ok"] for r in d)
    p = approx_percentile_audit(spark, SF_DIR).collect()
    assert p and all(r["p50_ok"] and r["p90_ok"] and r["p99_ok"] for r in p)


def test_audit_bound_flips_on_drift(spark):
    """_within is the audit's teeth: an approx value outside the bound
    must produce False (which the driver would see as a hash FAIL)."""
    from project_orbit_spark.operators.sketches import _within

    df = spark.createDataFrame(
        [(100.0, 100.0), (116.0, 100.0), (84.0, 100.0), (1.0, 0.0)],
        "approx double, exact double",
    ).select(_within("approx", F.col("exact"), 0.15).alias("ok"))
    assert [r["ok"] for r in df.collect()] == [True, False, False, False]


def test_raw_sketches_hidden_from_driver_surface():
    """Raw sketch queries are driver=False (engine-specific output);
    their audit twins are driver-visible WITH oracles — so the driver
    surface has zero oracle-less sketch rows."""
    from project_orbit_spark import registry

    qmap, omap = registry.query_map(), registry.oracle_map()
    assert "approx_distinct_sketch" not in qmap
    assert "approx_percentile_sketch" not in qmap
    assert "approx_distinct_audit" in omap
    assert "approx_percentile_audit" in omap
    # raw sketches stay REGISTERED (local parity suite runs them) but
    # left the bench headline set in the r14 rotation (VERDICT r13
    # ask #6: sub-second entries swapped for heavy operators)
    qs = registry.all_queries()
    assert "approx_distinct_sketch" in qs
    assert "approx_percentile_sketch" in qs
    bench = registry.bench_queries()
    assert "approx_distinct_sketch" not in bench
    assert "approx_percentile_sketch" not in bench


def test_mg_kernel_capacity_and_guarantee():
    import pandas as pd

    from project_orbit_spark.operators.sketches import _MG_CAP, make_mg_candidates

    # adversarial stream: one true heavy item (20% of the stream)
    # buried in a long tail of unique items, split across batches
    heavy = ["hh"] * 4000
    tail = [f"t{i}" for i in range(16000)]
    stream = []
    for i in range(0, 16000, 800):  # interleave so no batch is all-heavy
        stream.extend(tail[i : i + 800])
        stream.extend(heavy[: 4000 * 800 // 16000])
    batches = [
        pd.DataFrame({"item": stream[i : i + 2048]}) for i in range(0, len(stream), 2048)
    ]
    out = list(make_mg_candidates()(iter(batches)))
    assert out, "summary must be non-empty"
    cands = set(out[0]["item"])
    assert len(cands) <= _MG_CAP, "summary exceeded capacity"
    # the heavy item (share 20% >> 1/(cap+1)) must survive compression
    assert "hh" in cands


def test_heavy_hitters_only_true_hitters(spark):
    from project_orbit_spark.operators.sketches import _HH_K, heavy_hitters_two_pass

    rows = heavy_hitters_two_pass(spark, SF_DIR).collect()
    assert rows, "derived skew must produce heavy hitters"
    n = load(spark, SF_DIR, "lineitem").count()
    # every reported item clears the threshold, and all 7 hot ids are
    # found (at tiny sf the cold tail can legitimately clear 0.2% too —
    # 200 partkeys over 6k rows — so no exclusivity assert here; the
    # oracle parity test checks exact equality either way)
    for r in rows:
        assert r["cnt"] * _HH_K > n
    hot = {r["item"] for r in rows if r["item"].startswith("hot_")}
    assert hot == {f"hot_{i}" for i in range(7)}

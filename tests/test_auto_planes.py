"""Self-scaling LSH block width (SCALE.md round-8/9 operating rule):
the (label, bucket) pair-blocking faces derive their plane count from
the corpus size instead of a manual rebuild decision. These pin the
calibration contract — fixture scales stay at the 4-plane oracle
width, and the measured 100x knob point derives the 8 planes the r8
table found optimal."""

from __future__ import annotations

from project_orbit_spark.similarity.lsh import (
    PLANES_BASE,
    PLANES_CALIB_ROWS,
    auto_planes,
    index_planes,
)
from tests.conftest import SF_DIR


def test_fixture_scales_stay_at_oracle_width():
    # every shipped testdata scale (500 / 500 / 2000 embeddings, and
    # the +4% dup-injected semdedup corpus) must derive the 4-plane
    # width the DuckDB oracles hard-code
    for n in (500, 520, 2000, 2080, PLANES_CALIB_ROWS):
        assert auto_planes(n) == 4, n


def test_one_plane_per_doubling_past_calibration():
    assert auto_planes(PLANES_CALIB_ROWS + 1) == PLANES_BASE + 1
    assert auto_planes(2 * PLANES_CALIB_ROWS) == PLANES_BASE + 1
    assert auto_planes(4 * PLANES_CALIB_ROWS) == PLANES_BASE + 2


def test_measured_knob_point_reproduced():
    # the r8 knob table measured 8 planes optimal at the 100x probe
    # corpus (200k vectors, 6.7x cheaper than fixed-4 at 97% recall);
    # the rule must land exactly there
    assert auto_planes(200_000) == 8


def test_monotonic_nondecreasing():
    widths = [auto_planes(n) for n in range(100, 1_000_000, 7919)]
    assert widths == sorted(widths)


def test_index_planes_fixture_width_and_cached(spark):
    assert index_planes(spark, SF_DIR) == 4
    # second call must come from the per-(session, sf_dir) cache — a
    # live index's width never silently changes
    assert index_planes(spark, SF_DIR) == 4


def test_auto_width_matches_pinned_width_at_fixture(spark):
    # the oracles hard-code 4 planes; at fixture scale the auto path
    # must produce byte-identical results to an explicit n_planes=4
    from project_orbit_spark.operators.dedup import semantic_dedup_semdedup

    auto = semantic_dedup_semdedup(spark, SF_DIR).toPandas()
    pinned = semantic_dedup_semdedup(spark, SF_DIR, n_planes=4).toPandas()
    assert auto.equals(pinned)


def test_duck_width_formula_matches_python_everywhere():
    """The ADVICE-r9 divergence fix: the oracle derives its block
    width IN SQL (_duck_auto_bucket) from the same count the Spark
    side feeds auto_planes — the two formulas must agree at every
    size, especially past the calibration point where the old
    hard-coded-4 oracles would have silently hash-failed."""
    import duckdb

    from project_orbit_spark.similarity.lsh import PLANES_MAX, _duck_auto_bucket

    con = duckdb.connect()
    sizes = [
        100, 500, 2080, PLANES_CALIB_ROWS, PLANES_CALIB_ROWS + 1,
        2 * PLANES_CALIB_ROWS, 2 * PLANES_CALIB_ROWS + 1,
        4 * PLANES_CALIB_ROWS, 200_000, 1_000_000,
        PLANES_CALIB_ROWS * 2 ** (PLANES_MAX - PLANES_BASE),  # headroom edge
        # PAST the edge: both sides must CLAMP to PLANES_MAX (ADVICE
        # r10 — unclamped Python vs substring-capped SQL diverged here)
        PLANES_CALIB_ROWS * 2 ** (PLANES_MAX - PLANES_BASE) + 1,
        PLANES_CALIB_ROWS * 2 ** (PLANES_MAX - PLANES_BASE + 3),
        10_000_000_000,
    ]
    for n in sizes:
        bucket_sql = _duck_auto_bucket("v", str(n))
        got = con.execute(
            f"SELECT len({bucket_sql}) FROM (SELECT [0.3, -0.7, 0.1]::DOUBLE[] AS v)"
        ).fetchone()[0]
        want = auto_planes(n)
        assert want <= PLANES_MAX, (n, want)  # oracle headroom holds
        assert got == want, (n, got, want)


def test_duck_auto_bucket_is_prefix_of_spark_bucket(spark):
    """Above the calibration point the adaptive oracle must produce
    the SAME bucket Spark's lsh_bucket(emb, auto_planes(n)) does —
    bit-for-bit, not just same width."""
    import duckdb

    from project_orbit_spark.similarity.lsh import lsh_bucket

    import pyspark.sql.functions as F

    vecs = [[0.31, -0.72, 0.11, 0.9], [-0.5, 0.25, -0.125, 0.0625], [1.0, 1.0, -1.0, 0.5]]
    n = 60_000  # auto_planes -> 7
    w = auto_planes(n)
    sdf = spark.createDataFrame([(v,) for v in vecs], "emb array<double>")
    spark_buckets = [
        r[0] for r in sdf.select(lsh_bucket(F.col("emb"), w)).collect()
    ]
    con = duckdb.connect()
    from project_orbit_spark.similarity.lsh import _duck_auto_bucket

    duck_buckets = [
        con.execute(
            f"SELECT {_duck_auto_bucket('v', str(n))} "
            f"FROM (SELECT {v}::DOUBLE[] AS v)"
        ).fetchone()[0]
        for v in vecs
    ]
    assert spark_buckets == duck_buckets
    assert all(len(b) == w for b in duck_buckets)


def test_adaptive_oracle_hash_matches_above_calibration(spark, tmp_path):
    """END-TO-END close of the ADVICE-r9 divergence: run
    incremental_embedding_dedup — Spark path AND registered DuckDB
    oracle — on a synthetic corpus ABOVE the calibration point
    (13 000 > 12 500 vectors, so BOTH sides must derive 5 planes),
    and require the same order-insensitive result the driver would.
    Before _duck_auto_bucket, the oracle hard-coded 4 planes and this
    corpus would hash-fail by design. Vectors are md5-free pure
    arithmetic of (i, d) — deterministic, no RNG (hygiene rule)."""
    import duckdb
    import pandas as pd

    from project_orbit_spark import registry
    from project_orbit_spark.similarity.lsh import auto_planes

    n = 13_000
    assert auto_planes(n) == 5  # the test is vacuous at base width
    sdf = spark.range(n).selectExpr(
        "id AS vec_id",
        "CAST(id % 5 AS INT) AS label",
        "transform(sequence(0, 7), d -> CAST(((id * 31 + d * 17) % 97)"
        " / 97.0 - 0.5 AS FLOAT)) AS embedding",
    )
    sdf.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    q = registry.get_query("incremental_embedding_dedup")
    got = q.fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    want = con.execute(q.oracle).fetchdf()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            df[c] = df[c].map(repr)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    # the injected every-25th clones are exact copies: identical
    # vectors share every sign bit, so the result is non-vacuous
    assert len(got) >= n // 25
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_duck_width_formula_matches_python_at_arbitrary_sizes():
    """Property version of the ladder test: the SQL width expression
    and auto_planes must agree at ARBITRARY corpus sizes — including
    deep inside the clamp region — not just the hand-picked ladder.
    DuckDB-only, so hundreds of examples are cheap."""
    import duckdb

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from project_orbit_spark.similarity.lsh import PLANES_MAX, _duck_auto_bucket

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=1, max_value=10**13))
    def check(n):
        got = con.execute(
            f"SELECT len({_duck_auto_bucket('v', str(n))}) "
            f"FROM (SELECT [0.3, -0.7, 0.1]::DOUBLE[] AS v)"
        ).fetchone()[0]
        want = auto_planes(n)
        assert PLANES_BASE <= want <= PLANES_MAX
        assert got == want, (n, got, want)

    check()

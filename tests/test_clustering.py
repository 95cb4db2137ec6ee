"""Deterministic k-means family (operators/clustering.py): the
contract is exact reproducibility, full-coverage assignment, bounded
quota sampling, and the empty-cluster keep-old rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_orbit_spark.operators import clustering as cl

SF_DIR = "/root/testdata/sf0.001"


def test_assignments_deterministic_across_runs(spark):
    a = {r["vec_id"]: r["cluster_id"] for r in cl.kmeans_assignments(spark, SF_DIR).collect()}
    b = {r["vec_id"]: r["cluster_id"] for r in cl.kmeans_assignments(spark, SF_DIR).collect()}
    assert a == b
    assert len(a) == cl.quantized_vectors(spark, SF_DIR).count()


def test_every_vector_assigned_to_a_valid_cluster(spark):
    rows = cl.kmeans_embedding_clusters(spark, SF_DIR).collect()
    assert {r["vec_id"] for r in rows} == set(range(len(rows)))
    assert all(0 <= r["cluster_id"] < cl.K for r in rows)


def test_iterations_refine_not_explode(spark):
    """After 3 rounds, multiple clusters are actually populated (the
    hash-seeded init did not collapse to one cell) and no cluster
    holds everything."""
    sizes = [
        r["n"]
        for r in cl.kmeans_assignments(spark, SF_DIR)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(sizes) >= 2
    assert max(sizes) < sum(sizes)


def test_balanced_sample_quota_and_rank_contiguity(spark):
    rows = cl.cluster_balanced_sample(spark, SF_DIR).collect()
    per = {}
    for r in rows:
        per.setdefault(r["cluster_id"], []).append(r["rank"])
    for cid, ranks in per.items():
        assert len(ranks) <= cl.SAMPLE_PER_CLUSTER
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), cid
    # sample ids are a subset of the corpus
    ids = {r["vec_id"] for r in rows}
    assert len(ids) == len(rows)


def test_update_keeps_previous_centroid_for_empty_cluster(spark):
    assigned = spark.createDataFrame(
        [(0, [2, 4], 0), (1, [4, 8], 0)], "vec_id long, q array<long>, cid long"
    )
    prev = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [9.0, 9.0])], "cid long, cent array<double>"
    )
    out = {r["cid"]: r["cent"] for r in cl.update_centroids(assigned, prev).collect()}
    assert out[0] == [3.0, 6.0]  # exact integer mean
    assert out[1] == [9.0, 9.0]  # empty cluster keeps its centroid


def test_quantization_is_integer_thousandths(spark):
    row = cl.quantized_vectors(spark, SF_DIR).first()
    emb = (
        cl.load(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") == row["vec_id"])
        .first()["embedding"]
    )
    assert len(row["q"]) == len(emb)
    # HALF_UP: every quantized value is within half a step of x*1000
    # (Python round() is banker's, so exact equality is not asserted)
    assert all(abs(q - float(x) * cl.QSCALE) <= 0.5 for q, x in zip(row["q"], emb))


def test_quantization_half_boundary_parity_with_duckdb(spark):
    """float32 values whose x*1000 product lands EXACTLY on .5 (small
    dyadic mantissas like 0.0625 -> 62.5): Spark's HALF_UP and
    DuckDB's round() must both go away from zero, or the kmeans
    oracle would diverge on boundary embeddings."""
    import duckdb

    vals = [0.0625, -0.0625, 0.1875, -0.1875, 0.5, -0.5, 0.0005, -0.0035]
    df = spark.createDataFrame(
        [(0, vals)], "vec_id long, embedding array<float>"
    )
    q_spark = df.select(
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * cl.QSCALE, 0).cast("long"),
        ).alias("q")
    ).first()["q"]
    lit = "[" + ",".join(repr(v) for v in vals) + "]"
    q_duck = duckdb.sql(
        f"SELECT list_transform(CAST({lit} AS FLOAT[])::DOUBLE[], "
        f"x -> CAST(round(x * {cl.QSCALE}) AS BIGINT))"
    ).fetchone()[0]
    assert q_spark == q_duck
    assert q_spark[0] == 63 and q_spark[1] == -63  # away from zero both sides


def test_incremental_assign_matches_full_fit_and_is_o_new(spark):
    """assign_batch against the warm centroid table must (1) agree
    with the full pipeline's assignment for existing vectors, (2)
    assign genuinely new vectors without touching the fitted corpus
    (plan contains no second embeddings scan), (3) reuse the persisted
    model across calls."""
    from project_orbit_spark.plans.audit import formatted_plan

    cents = cl.warm_kmeans_centroids(spark, SF_DIR)
    assert cents is cl.warm_kmeans_centroids(spark, SF_DIR)  # cached

    full = {
        r["vec_id"]: r["cluster_id"]
        for r in cl.kmeans_assignments(spark, SF_DIR).collect()
    }
    batch = cl.load(spark, SF_DIR, "embeddings").filter(
        F.col("vec_id") % 25 == 0
    ).select("vec_id", "embedding")
    out = cl.assign_batch(batch, cents)
    got = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {v: c for v, c in full.items() if v % 25 == 0}

    # O(new): the centroid side is served from the persisted model
    # (InMemoryTableScan — the parquet scans named inside the
    # InMemoryRelation are its recorded ORIGIN, not re-executed work)
    # and there is no join against the fitted corpus, only the 1-row
    # broadcast pack
    plan = formatted_plan(out)
    assert "InMemoryTableScan" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan

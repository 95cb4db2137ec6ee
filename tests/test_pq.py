"""IVF-PQ quality bounds: the query itself is hash-checked against
the DuckDB oracle (the approximation is deterministic), so these
tests bound what the oracle can't — how lossy the quantization is
versus exact-IVF scoring — plus index-build invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_orbit_spark.similarity.cosine import (
    _PQ_DSUB,
    _PQ_M,
    _emb,
    ann_ivf_pq_topk,
    ann_ivf_topk,
    pq_reconstructions,
)
from tests.conftest import SF_DIR


def test_pq_recon_shape_and_coverage(spark):
    e = _emb(spark, SF_DIR)
    recon = pq_reconstructions(e)
    n_vecs = e.count()
    rows = recon.select(
        F.count("*").alias("n"), F.min(F.size("recon")).alias("lo"), F.max(F.size("recon")).alias("hi")
    ).collect()[0]
    assert rows["n"] == n_vecs, "every vector must be encoded"
    assert rows["lo"] == rows["hi"] == _PQ_M * _PQ_DSUB


def test_pq_codebook_is_shared(spark):
    # <= 10 labels x 4 subspaces codewords => distinct reconstructions
    # are bounded by 10^4, and in practice collapse far below the
    # corpus size: quantization must actually compress
    e = _emb(spark, SF_DIR)
    recon = pq_reconstructions(e)
    distinct = recon.select("recon").distinct().count()
    assert distinct < e.count(), "no compression => not a quantizer"


def test_pq_recall_floor_vs_exact_ivf(spark):
    """Measured recall@5 vs exact in-bucket scoring is 0.24-0.36 at
    sf0.001/sf0.01 (label-derived codebooks over near-isotropic
    synthetic embeddings are a coarse quantizer). Floor well below
    the measurement but far above random (5/bucket_size ~ 0.1)."""
    exact_rows = ann_ivf_topk(spark, SF_DIR).collect()
    exact = {(r["qid"], r["cid"]) for r in exact_rows}
    pq_rows = ann_ivf_pq_topk(spark, SF_DIR).collect()
    pq = {(r["qid"], r["cid"]) for r in pq_rows}
    assert len(exact & pq) / len(exact) >= 0.15
    # same routing: PQ and exact IVF must agree on every query's bucket
    exact_buckets = {r["qid"]: r["bucket"] for r in exact_rows}
    for r in pq_rows:
        assert r["bucket"] == exact_buckets[r["qid"]]


def test_warm_packed_decode_matches_cold_reconstructions(spark):
    """r18: the persisted codes artifact is PACKED (vec_id, label,
    codes[s]) and the warm decode is a map-only lookup over the 1-row
    broadcast codebook (no groupBy(vec_id) regroup). The decode must
    be value-identical to the cold map-only reconstruction — same cw
    doubles, same subspace order — for every vector."""
    from project_orbit_spark.similarity.cosine import (
        _pq_chosen,
        pq_codebook,
    )

    e = _emb(spark, SF_DIR)
    cb = pq_codebook(e)
    cold = {
        r["vec_id"]: (r["label"], tuple(r["recon"]))
        for r in pq_reconstructions(e).collect()
    }
    pack, chosen = _pq_chosen(cb)
    packed_codes = e.crossJoin(F.broadcast(pack)).select(
        "vec_id",
        "label",
        F.transform(chosen, lambda ch: ch["code"]).alias("codes"),
    )
    warm = {
        r["vec_id"]: (r["label"], tuple(r["recon"]))
        for r in pq_reconstructions(e, codebook=cb, codes=packed_codes).collect()
    }
    assert warm == cold

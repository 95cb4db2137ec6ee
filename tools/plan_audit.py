"""Full-registry physical-plan audit for scale hazards.

Builds every registered query's executed plan at sf0.001 (plan shape,
not timing — the physical strategy is identical at any SF thanks to
AQE-free plan inspection on the unexecuted DataFrame) and flags:

- ``CartesianProduct`` anywhere: always a bug at 100 TB. Expected: none.
- ``BroadcastNestedLoopJoin`` outside the known-bounded allowlist:
  a BNLJ is fine iff its build side is a broadcast of a bounded
  relation (a ≤256-row centroid table, a pattern grid, a single
  stats/threshold row, one query vector). Every allowlisted query
  below was hand-audited to have such a build side; a NEW name in the
  BNLJ set means a new unbounded-risk join that needs the same audit.

Usage: python tools/plan_audit.py [sf_dir]
Exit code 0 iff no cartesians, no errors, and no un-allowlisted BNLJ.

Round-9 audit result: CARTESIAN=[], ERRORS=[], BNLJ = exactly the
allowlist below (31 queries, all bounded builds — r9 adds the packed
1-row k-means centroid builds and the Q15/Q22 stats-row builds).
Round-12 audit result (206-query registry): CARTESIAN=[], ERRORS=[],
BNLJ = the allowlist (37 queries — r12 adds ccnet_perplexity_bands
and stream_cluster_assign_batch, registered r11 after the last full
audit, plus the composed curation_training_gold; all three carry
only 1-row broadcast builds, see the inline comment).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from project_orbit_spark import registry  # noqa: E402
from project_orbit_spark.session import get_spark  # noqa: E402

# Queries whose BNLJ build side is a broadcast of a bounded relation
# (hand-audited round 8; see each query's docstring for the bound).
BNLJ_BOUNDED = {
    # ANN family: ≤256-row centroid / codebook tables
    "ann_ivf_nprobe2", "ann_ivf_pq_topk", "ann_ivf_pq_topk_warm",
    "ann_ivf_topk", "ann_ivf_topk_warm", "nearest_centroid_assign",
    # single query vector / query-term rows
    "bm25_keyword_topk", "cosine_topk_exact", "filtered_topk_with_fallback",
    "hybrid_rrf_topk", "rag_dashboard_gold", "rerank_crossencoder_topk",
    # pattern / probe grids (tens of rows)
    "ats_probe_frontier", "feed_autodiscovery", "fuzzy_translate_join",
    "substring_theta_join", "investor_semi_join", "risk_report_gold",
    # single-row packed k-means centroid table (k=8 structs in one
    # broadcast row; operators/clustering.py::assign_clusters)
    "kmeans_embedding_clusters", "cluster_balanced_sample",
    "kmeans_incremental_assign",
    # single global-stats or threshold rows joined back to the corpus
    "q15_top_supplier", "q22_lapsed_customer_balance",
    "weighted_poisson_sample",
    "benchmark_contamination", "bigram_logprob_scores", "bloom_pruned_join",
    "corpus_mixture_sample", "events_value_histogram", "heavy_hitters_two_pass",
    "key_skew_profile", "tfidf_top_terms", "unigram_logprob_scores",
    # round-12 audit additions (hand-audited): ccnet bands crossJoins
    # two 1-row builds (the total-count row and the 2-cutoff row) on
    # top of the bigram scorer's 1-row total; the composed curation
    # pipeline inherits exactly those sites; the streaming assign
    # twin broadcasts the single packed-centroid row (k=8 structs in
    # one row, same bound as kmeans_embedding_clusters)
    "ccnet_perplexity_bands", "curation_training_gold",
    "stream_cluster_assign_batch",
    # the incremental curation face inherits the same 1-row builds
    # (persisted total/cuts artifacts) on its O(new) batch side
    "incremental_curation_gold",
    # round-13 additions (hand-audited): the Matryoshka funnel
    # broadcasts the 5-row query set (the cosine_topk_exact shape);
    # temperature sampling crossJoins the single (total_docs, z)
    # stats row back onto the BOUNDED per-language table (the
    # corpus_mixture_sample shape — the corpus join itself is an
    # equi hash join on lang)
    "matryoshka_funnel_topk", "temperature_mixture_sample",
    # round-14 additions (hand-audited): the DSIR faces crossJoin
    # 1-row builds — the (ts, tt) totals row into the 1024-row lm,
    # and the (t) / (unseen_q, t) threshold row onto the per-doc /
    # batch table (the q15 global-stats shape); the recall audit
    # inherits cosine_topk_exact's 5-row query broadcast through
    # every tier it wraps; the cluster histogram crossJoins its two
    # 1-row count frames (hand-audited r13, allowlisted now that the
    # audit tool runs it)
    "dsir_importance_weights", "incremental_dsir_weights",
    "ann_recall_audit", "dup_cluster_size_histogram",
    # dedup_pair_audit crossJoins its three 1-row count frames (the
    # same shape as the cluster histogram)
    "dedup_pair_audit",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    cart, bnlj_new, errs = [], [], []
    for name, q in sorted(registry.all_queries().items()):
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            errs.append((name, f"{type(exc).__name__}: {exc}"[:120]))
            continue
        if "CartesianProduct" in plan:
            cart.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_BOUNDED:
            bnlj_new.append(name)
    print("CARTESIAN:", cart)
    print("BNLJ_NEW (not in bounded allowlist):", bnlj_new)
    print("ERRORS:", errs)
    return 1 if (cart or bnlj_new or errs) else 0


if __name__ == "__main__":
    sys.exit(main())

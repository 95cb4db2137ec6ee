"""Interleaved same-session A/B for the r18 structural changes.

Usage: python tools/ab_r18.py <sf_dir> <case> [reps] [rounds]

Cases: pagerank | cc | curation | pq

Arm A = the function bodies at the previous commit (exec'd from a git
snapshot into the LIVE module namespace, so only the changed function
differs); arm B = the working tree. Two alternating rounds of
median-of-<reps> collect() timings per arm, min-of-medians reported —
the only measurement this box's 1.5-2x ambient swings can't fake
(see memory/BENCH_DETAIL load markers; same discipline as r17).
"""
from __future__ import annotations

import ast
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def old_fn(snapshot_path: str, module, name: str):
    """exec the <name> function def from a module snapshot inside the
    LIVE module's globals — old body, current collaborators."""
    src = Path(snapshot_path).read_text()
    tree = ast.parse(src)
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == name:
            node.decorator_list = []  # re-registering would collide
            code = ast.Module(body=[node], type_ignores=[])
            ns = dict(vars(module))
            exec(compile(code, f"<old {name}>", "exec"), ns)
            return ns[name]
    raise KeyError(name)


def median(xs):
    return sorted(xs)[len(xs) // 2]


def main() -> None:
    sf_dir, case = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    from project_orbit_spark import registry
    from project_orbit_spark.session import get_spark

    spark = get_spark("ab_r18")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    from project_orbit_spark.catalog import load

    for t in ("documents", "embeddings"):
        try:
            load(spark, sf_dir, t).count()
        except Exception:
            pass

    import project_orbit_spark.operators.corpus as corpus_mod
    import project_orbit_spark.operators.graph as graph_mod
    import project_orbit_spark.similarity.cosine as cosine_mod

    # (query names, [(module, attr, old_callable)]) per case
    if case == "pagerank":
        queries = ["pagerank_link_graph"]
        patches = [
            (graph_mod, "pagerank_link_graph",
             old_fn("/tmp/old_graph.py", graph_mod, "pagerank_link_graph")),
        ]
    elif case == "cc":
        queries = ["dedup_canonical_corpus", "corpus_curation_gold"]
        patches = [
            (graph_mod, "connected_components",
             old_fn("/tmp/old_graph.py", graph_mod, "connected_components")),
        ]
    elif case == "curation":
        queries = ["curation_training_gold", "incremental_curation_gold"]
        patches = [
            (corpus_mod, "curation_pipeline",
             old_fn("/tmp/old_corpus.py", corpus_mod, "curation_pipeline")),
            (corpus_mod, "curate_batch",
             old_fn("/tmp/old_corpus.py", corpus_mod, "curate_batch")),
        ]
    elif case == "simhash":
        import project_orbit_spark.operators.dedup as dedup_mod

        queries = ["simhash_hamming_dups", "simhash64_hamming_dups"]
        patches = [
            (dedup_mod, "_near_dup_corpus",
             old_fn("/tmp/old_dedup.py", dedup_mod, "_near_dup_corpus")),
        ]
    elif case == "scrub":
        queries = ["boilerplate_segment_scrub"]
        patches = [
            (corpus_mod, "scrub_boilerplate",
             old_fn("/tmp/old_corpus.py", corpus_mod, "scrub_boilerplate")),
        ]
    elif case == "ccnet":
        import project_orbit_spark.functions.textquality as tq_mod

        queries = ["ccnet_perplexity_bands"]
        patches = [
            (tq_mod, "ccnet_scores",
             old_fn("/tmp/old_textquality.py", tq_mod, "ccnet_scores")),
        ]
    elif case == "pq":
        queries = [
            "ann_ivf_pq_topk",
            "ann_ivf_pq_topk_warm",
            "ann_ivf_topk",
            "ann_ivf_topk_warm",
            "ann_ivf_nprobe2",
        ]
        patches = [
            (cosine_mod, "ivf_topk",
             old_fn("/tmp/old_cosine.py", cosine_mod, "ivf_topk")),
            (cosine_mod, "pq_reconstructions",
             old_fn("/tmp/old_cosine.py", cosine_mod, "pq_reconstructions")),
            (cosine_mod, "warm_pq_index",
             old_fn("/tmp/old_cosine.py", cosine_mod, "warm_pq_index")),
            (cosine_mod, "ann_ivf_nprobe2",
             old_fn("/tmp/old_cosine.py", cosine_mod, "ann_ivf_nprobe2")),
        ]
    else:
        sys.exit(f"unknown case {case}")

    new_vals = [(m, a, getattr(m, a)) for m, a, _ in patches]

    def set_arm(arm: str) -> None:
        vals = patches if arm == "A(old)" else new_vals
        for m, a, fn in vals:
            setattr(m, a, fn)
        # warm-face caches must not leak across arms (different
        # artifact shapes); drop them so each arm builds its own
        from project_orbit_spark.session import clear_df_caches

        clear_df_caches()

    results: dict[str, dict[str, list[float]]] = {
        q: {"A(old)": [], "B(new)": []} for q in queries
    }
    for rnd in range(rounds):
        for arm in ("A(old)", "B(new)"):
            set_arm(arm)
            for qn in queries:
                q = registry.get_query(qn)
                # registry captured the fn object at decoration time:
                # when the patched attr IS the query fn (pagerank),
                # call the live module binding, not the stale capture
                fn = next(
                    (getattr(m, qn) for m, a, _ in patches if a == qn),
                    q.fn,
                )
                if q.prepare is not None:
                    q.prepare(spark, sf_dir)
                spark.sparkContext.setJobDescription(f"warm:{arm}:{qn}")
                fn(spark, sf_dir).collect()
                samples = []
                for i in range(reps):
                    spark.sparkContext.setJobDescription(f"{arm}:r{rnd}:{qn}")
                    t0 = time.time()
                    fn(spark, sf_dir).collect()
                    samples.append(time.time() - t0)
                med = median(samples)
                results[qn][arm].append(med)
                print(
                    f"round{rnd} {arm} {qn}: median {med:.3f} of "
                    f"[{'/'.join(f'{s:.2f}' for s in sorted(samples))}]",
                    flush=True,
                )
    set_arm("B(new)")
    print("\n== min-of-medians ==")
    for qn in queries:
        a = min(results[qn]["A(old)"])
        b = min(results[qn]["B(new)"])
        print(f"{qn}: old {a:.3f}s -> new {b:.3f}s ({a / b:.2f}x)")


if __name__ == "__main__":
    main()

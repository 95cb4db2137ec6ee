"""MinHash geometry knob probe (round 15, VERDICT r14 ask #2).

dedup_pair_audit measured the 12-hash / 4x3-band tier at precision
0.084, recall 1.0.  Decomposing that number at sf0.01 shows it
conflates two different things:

  1. AUDIT ARTIFACT (the big one): the audit's ground truth was
     ngram_jaccard_pairs — exact Jaccard over the PLAIN corpus —
     while the LSH side runs over the DUP-INJECTED corpus.  56 of 87
     LSH pairs were the injected (doc, doc+100000) TRUE near-dups,
     which can never appear in the plain-corpus ground truth, so the
     audit scored them as false positives.
  2. ESTIMATOR NOISE (the real retune target): 19 natural-corpus
     pairs passed est>=0.5 with true Jaccard < 0.5 — a ~3-4x
     candidate-admission overhead priced by the 12-row estimate's
     sigma (~0.14 at s=0.4) and the 3-row bands' collision curve.

This probe measures candidate geometries against the CORRECTED
ground truth — exact 3-shingle Jaccard >= 0.5 computed over the SAME
dup-injected corpus, within-lang (the exact face's documented
blocking key; the fixture has no cross-lang true pairs, verified by
the all-pairs sweep below when --xlang is passed) — reporting
precision / recall / pair counts / wall time per geometry, at the
given SF.  Each geometry runs the REAL code path
(operators/dedup.py::minhash_pairs with explicit k/bands/rows).

Usage:
    python tools/minhash_knob_probe.py [sf_dir=/root/testdata/sf0.01] [--xlang]

Prints one JSON line per geometry, then a markdown table for
docs/SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from project_orbit_spark.catalog import load  # noqa: E402
from project_orbit_spark.operators.dedup import (  # noqa: E402
    minhash_pairs,
    word_shingles,
)
from project_orbit_spark.session import get_spark  # noqa: E402

# (k, bands, rows) candidates.  b*r == k throughout; the contenders
# bracket the trade: 4x3 (the r14 incumbent), wider bands (r=4..6)
# for per-band selectivity, more bands for recall insurance.
GEOMETRIES = [
    (12, 4, 3),
    (16, 4, 4),
    (20, 5, 4),
    (24, 6, 4),
    (24, 4, 6),
    (18, 6, 3),
]

THRESHOLD = 0.5


def injected_corpus(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    near = d.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "lang",
        F.concat("text", F.lit(" near duplicate suffix tail")).alias("text"),
    )
    return d.unionByName(near)


def exact_pairs(corpus, within_lang=True):
    """All-pairs exact 3-shingle Jaccard >= THRESHOLD — the oracle-
    style brute ground truth (deliberately NOT the prefix-filtered
    production plan, so a blocking bug cannot hide)."""
    sh = corpus.select(
        "doc_id", "lang", word_shingles("text", 3).alias("sh")
    )
    a = sh.select(
        F.col("doc_id").alias("left_id"),
        F.col("lang").alias("lang_a"),
        F.col("sh").alias("sh_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("right_id"),
        F.col("lang").alias("lang_b"),
        F.col("sh").alias("sh_b"),
    )
    cond = F.col("left_id") < F.col("right_id")
    if within_lang:
        cond = cond & (F.col("lang_a") == F.col("lang_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    ).cast("double")
    return (
        a.join(b, cond)
        .select("left_id", "right_id", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= THRESHOLD)
    )


def grayzone_corpus(spark, per_level=100, n_tokens=52):
    """Controlled-overlap corpus: per target Jaccard level, per_level
    independent (base, variant) doc pairs whose exact 3-shingle
    Jaccard is pinned by a shared token prefix — variant keeps p
    tokens then appends fresh ones, giving j = (p-2)/(2n-p-2) with
    all-unique tokens. Docs from different (level, i) share zero
    tokens, so the ONLY candidate pairs are the constructed ones.
    This is the corpus the sf fixtures cannot provide: its pairs sit
    IN the gray band around the 0.5 threshold, where estimator sigma
    and band selectivity actually discriminate geometries."""
    levels = [0.30, 0.40, 0.45, 0.55, 0.60, 0.70, 0.80, 0.90]
    rows = []
    for li, j in enumerate(levels):
        p = round((j * (2 * n_tokens - 2) + 2) / (1 + j))
        for i in range(per_level):
            base = [f"L{li}b{i}t{t}" for t in range(n_tokens)]
            var = base[:p] + [f"L{li}b{i}x{t}" for t in range(n_tokens - p)]
            bid = (li * per_level + i) * 2
            rows.append((bid, li, " ".join(base)))
            rows.append((bid + 1, li, " ".join(var)))
    return levels, spark.createDataFrame(
        rows, "doc_id long, level int, text string"
    )


def run_grayzone(spark) -> None:
    levels, docs = grayzone_corpus(spark)
    docs = docs.cache()
    n_per = docs.filter(F.col("level") == 0).count() // 2
    # exact jaccard per constructed pair (base 2m, variant 2m+1)
    truth = {
        (r["left_id"], r["right_id"]): r["jaccard"]
        for r in exact_pairs(
            docs.withColumn("lang", F.lit("x")), within_lang=False
        ).collect()
    }
    print(
        json.dumps(
            {
                "grayzone": "exact>=0.5 constructed pairs",
                "n_docs": docs.count(),
                "pairs_at_or_above_t": len(truth),
            }
        )
    )
    table = {}
    for k, bands, r in GEOMETRIES:
        got = {
            (p["left_id"], p["right_id"])
            for p in minhash_pairs(
                docs.select("doc_id", "text"), k=k, bands=bands, rows=r
            )
            .select("left_id", "right_id")
            .collect()
        }
        admitted = {li: 0 for li in range(len(levels))}
        stray = 0
        for left, right in got:
            if right == left + 1 and left % 2 == 0:
                admitted[(left // 2) // n_per] += 1
            else:
                stray += 1
        table[f"{k}={bands}x{r}"] = {
            "admit_rate_by_true_j": {
                str(levels[li]): round(admitted[li] / n_per, 3)
                for li in range(len(levels))
            },
            "stray_pairs": stray,
        }
        print(json.dumps({f"{k}={bands}x{r}": table[f"{k}={bands}x{r}"]}))
    hdr = " | ".join(str(j) for j in levels)
    print(f"\n| geometry (admit rate at true j) | {hdr} | stray |")
    print("|---|" + "---|" * (len(levels) + 1))
    for geom, rec in table.items():
        cells = " | ".join(
            f"{rec['admit_rate_by_true_j'][str(j)]:.2f}" for j in levels
        )
        print(f"| {geom} | {cells} | {rec['stray_pairs']} |")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark()
    if "--grayzone" in sys.argv:
        run_grayzone(spark)
        return 0
    corpus = injected_corpus(spark, sf_dir)

    if "--xlang" in sys.argv:
        xl = exact_pairs(corpus, within_lang=False)
        wl = exact_pairs(corpus, within_lang=True)
        n_xl, n_wl = xl.count(), wl.count()
        print(
            json.dumps(
                {
                    "check": "cross_lang_true_pairs",
                    "all_pairs": n_xl,
                    "within_lang": n_wl,
                    "cross_lang_only": n_xl - n_wl,
                }
            )
        )

    truth = {
        (r["left_id"], r["right_id"])
        for r in exact_pairs(corpus).collect()
    }
    print(json.dumps({"ground_truth_pairs": len(truth), "sf_dir": sf_dir}))

    rows = []
    pair_input = corpus.select("doc_id", "text")
    for k, bands, r in GEOMETRIES:
        t0 = time.monotonic()
        got = {
            (p["left_id"], p["right_id"])
            for p in minhash_pairs(pair_input, k=k, bands=bands, rows=r)
            .select("left_id", "right_id")
            .collect()
        }
        dt = time.monotonic() - t0
        hits = len(got & truth)
        rec = {
            "geometry": f"{k}={bands}x{r}",
            "n_lsh": len(got),
            "n_hits": hits,
            "precision": round(hits / len(got), 4) if got else None,
            "recall": round(hits / len(truth), 4) if truth else None,
            "sec": round(dt, 2),
        }
        rows.append(rec)
        print(json.dumps(rec))

    print("\n| geometry | n_lsh | hits | precision | recall | sec |")
    print("|---|---|---|---|---|---|")
    for rec in rows:
        print(
            f"| {rec['geometry']} | {rec['n_lsh']} | {rec['n_hits']} "
            f"| {rec['precision']} | {rec['recall']} | {rec['sec']} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

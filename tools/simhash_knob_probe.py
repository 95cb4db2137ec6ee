"""SimHash band/width knob probe (round 9, VERDICT r8 ask #6).

Measures the fingerprint-width knob for the simhash family the same
way round 8 measured the LSH plane knob: cost at 1x and 100x, recall
of the injected known near-dups, and agreement with the registered
64-bit/h<=3 tier's decisions.

Tiers:
  A  64b  4x16-bit bands, h<=3  — the registered `simhash64_hamming_dups`
     contract (dedup.py::_simhash_pairs(n_words=2, band_bits=16)).
  B  128b 8x16-bit bands, h<=6  — the ladder: width and threshold
     scale TOGETHER (3/64 = 6/128 per-bit edit budget), pigeonhole
     still lossless (8 bands >= h+1 = 7).
  C  128b 4x32-bit bands, h<=3  — width-only scaling: the cautionary
     row.  Cheap (32-bit band values barely collide) but the h<=3
     criterion over 2x the bits HALVES the edit budget, so it is a
     different, tighter near-dup definition — the docstring rule in
     _simhash_pairs exists because of this row.

The probe builds its own tail-injected corpus with a 10M doc_id
offset: the registered query's +100000 offset is collision-free at
every fixture scale (<=5000 docs) but overlaps base ids on the 100x
synthesized corpus (500k docs), which would silently drop
same-doc_id pairs from the ground truth.

Usage:
    python tools/simhash_knob_probe.py [k=100] [sf_dir=/root/testdata/sf0.1]

Reuses tools/scale_probe.py's synthesized corpus in .scale_probe/
(run scale_probe first if absent).  Reps via SPARK_GRAFT_SCALE_REPS
(default 2, best-of).  Prints one JSON line per (tier, scale), then
a markdown table for docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from project_orbit_spark.catalog import load  # noqa: E402
from project_orbit_spark.operators.dedup import _simhash_pairs  # noqa: E402
from project_orbit_spark.session import get_spark  # noqa: E402

REPS = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2")))
OFFSET = 10_000_000

TIERS = {
    "A_64b_4x16_h3": dict(n_words=2, band_bits=16, max_hamming=3),
    "B_128b_8x16_h6": dict(n_words=4, band_bits=16, max_hamming=6),
    "C_128b_4x32_h3": dict(n_words=4, band_bits=32, max_hamming=3),
}


def injected_corpus(spark, sf_dir: str):
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    near = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + OFFSET).alias("doc_id"),
        "lang",
        F.concat("text", F.lit(" tail")).alias("text"),
    )
    return d.unionByName(near)


def probe(spark, label: str, sf_dir: str, ground_a=None) -> list[dict]:
    corpus = injected_corpus(spark, sf_dir)
    n_inj = corpus.filter(F.col("doc_id") >= OFFSET).count()
    rows = []
    for tier, kw in TIERS.items():
        samples = []
        for _ in range(REPS):
            t0 = time.time()
            _simhash_pairs(corpus, **kw).collect()
            samples.append(time.time() - t0)
        pairs = _simhash_pairs(corpus, **kw)
        stats = pairs.agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                (
                    (F.col("right_id") - F.col("left_id") == OFFSET)
                    & (F.col("left_id") % 11 == 0)
                ).cast("long")
            ).alias("n_injected_found"),
        ).first()
        rec = {
            "scale": label,
            "tier": tier,
            "t": round(min(samples), 3),
            "n_pairs": stats["n_pairs"],
            "injected_recall": round((stats["n_injected_found"] or 0) / n_inj, 4),
        }
        if ground_a is not None and tier != "A_64b_4x16_h3":
            hit = pairs.join(ground_a, ["left_id", "right_id"], "semi").count()
            rec["agree_with_A"] = round(hit / ground_a.count(), 4) if ground_a.count() else 1.0
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    return rows


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    probe_dir = REPO / ".scale_probe"
    if not (probe_dir / "documents.parquet").exists():
        sys.exit("run tools/scale_probe.py first to synthesize the corpus")

    spark = get_spark("simhash_knob_probe")
    spark.sparkContext.setLogLevel("ERROR")

    ground_a = (
        _simhash_pairs(injected_corpus(spark, sf_dir), **TIERS["A_64b_4x16_h3"])
        .select("left_id", "right_id")
        .cache()
    )
    ground_a.count()
    rows = probe(spark, "1x", sf_dir, ground_a=ground_a)
    rows += probe(spark, f"{k}x", str(probe_dir))

    print("\n| scale | tier | t (s) | pairs | injected recall | agree w/ A |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['scale']} | {r['tier']} | {r['t']} | {r['n_pairs']} "
            f"| {r['injected_recall']} | {r.get('agree_with_A', '—')} |"
        )


if __name__ == "__main__":
    main()

"""Deduplication family — first-class for a training-data pipeline.

Covers SURVEY.md §2.4 A8 (first-wins dedup families, ref
src/scraper_v2.py:1045-1086) and §2.8 E4 (content-hash exact dup,
ref dags/orbit_daily_update_dag.py:188-200), plus the scale-path
near-dup operators (MinHash-LSH, n-gram Jaccard, SimHash) the
reference only does exactly.

Scale notes: exact dedup is one hash aggregate on a digest column
(map-side partial). MinHash-LSH shuffles once on (band, bucket) and
only cross-joins within buckets — never a global cartesian.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load
from project_orbit_spark.registry import register

# ---------------------------------------------------------------------------
# library primitives


def dedup_first_wins(df: DataFrame, keys: list, order: list) -> DataFrame:
    """A8 first-wins dedup with a *deterministic* notion of "first"
    (the reference keeps Python-iteration order; a distributed engine
    must pin it with an explicit ordering)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def word_shingles(text_col: str | Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a text column (array<string>)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    # windows of n consecutive tokens joined by a single space
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def minhash_signature(shingles: Column, k: int = 16) -> Column:
    """MinHash over a string hash family that is portable across
    engines: h_i(s) = md5(i || '|' || s), minimum taken in lexicographic
    string order. Same family is expressible in DuckDB, so the oracle
    can reproduce signatures byte-for-byte (SURVEY §7.4: never promise
    bit-parity with Python's salted hash()).
    Returns array<string> of length k."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat_ws("|", i.cast("string"), s)))
        ),
    )


# ---------------------------------------------------------------------------
# registered queries


@register(
    "dedup_first_wins_docs",
    tags=("dedup", "window"),
    doc="A8 first-wins dedup (ref src/scraper_v2.py:1045-1086): one "
    "document per (lang, source), keeping the lowest doc_id — "
    "deterministic replacement for dict-insertion-order dedup.",
    oracle="""
        SELECT lang, source, doc_id, n_chars
        FROM (
          SELECT lang, source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
          FROM documents
        ) t
        WHERE rn = 1
        ORDER BY lang, source
    """,
)
def dedup_first_wins_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        dedup_first_wins(d, ["lang", "source"], [F.asc("doc_id")])
        .select("lang", "source", "doc_id", "n_chars")
        .orderBy("lang", "source")
    )


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ an exact copy of every 7th doc (doc_id+100000) —
    a deterministic dup-injection so exact-dup detection has real
    positives (the fixture corpus itself has no duplicate texts)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dups = (
        d.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    return d.unionByName(dups)


@register(
    "exact_dup_groups",
    tags=("dedup", "hash"),
    doc="E4a exact duplicate detection by content digest (ref "
    "dags/orbit_daily_update_dag.py:188-200 sha256 page-hash compare): "
    "md5 digest groups with >1 member over a dup-injected corpus. "
    "One hash aggregate — the 100 TB-safe formulation.",
    oracle="""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
        )
        SELECT md5(text) AS content_hash,
               count(*)  AS n_copies,
               min(doc_id) AS canonical_id,
               max(doc_id) AS dup_id
        FROM corpus
        GROUP BY md5(text)
        HAVING count(*) > 1
        ORDER BY content_hash
    """,
)
def exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _docs_with_dups(spark, sf_dir)
    return (
        corpus.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_id"),
            F.max("doc_id").alias("dup_id"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("content_hash")
    )


@register(
    "ngram_jaccard_pairs",
    tags=("dedup", "similarity"),
    doc="n-gram Jaccard near-dup scoring (scale path of E4): exact "
    "token-set Jaccard between low-id docs of the same lang, "
    "keeping pairs with similarity ≥ 0.5. Blocked by lang to bound "
    "the pair space (the blocking pattern that survives 100 TB); "
    "the library primitive word_shingles(n) generalizes to n-grams.",
    oracle="""
        WITH shingled AS (
          SELECT doc_id, lang,
                 list_distinct(toks) AS shingles
          FROM (
            SELECT doc_id, lang,
                   string_split_regex(trim(lower(text)), '\\s+') AS toks
            FROM documents WHERE doc_id < 60
          )
        )
        SELECT a.doc_id AS left_id, b.doc_id AS right_id,
               round(
                 len(list_intersect(a.shingles, b.shingles))::DOUBLE /
                 len(list_distinct(list_concat(a.shingles, b.shingles)))::DOUBLE,
               4) AS jaccard
        FROM shingled a
        JOIN shingled b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE round(
                len(list_intersect(a.shingles, b.shingles))::DOUBLE /
                len(list_distinct(list_concat(a.shingles, b.shingles)))::DOUBLE,
              4) >= 0.5
        ORDER BY left_id, right_id
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "lang", word_shingles("text", 1).alias("shingles"))
    )
    a = d.alias("a")
    b = d.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.array_union(F.col("a.shingles"), F.col("b.shingles")))
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("left_id"),
            F.col("b.doc_id").alias("right_id"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("left_id", "right_id")
    )

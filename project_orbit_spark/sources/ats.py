"""S5 ATS per-vendor job normalization — SURVEY.md §2.1.

The reference ships one extractor per ATS vendor, each knowing that
vendor's payload shape and field names (src/ats_extractor.py:114-220
Greenhouse ``jobs[].title/location.name/departments[].name``, :221-288
Lever ``[].text/categories.location/categories.team``, :491-656 Ashby
``jobPostings[].title/locationName/team.name``), detected by content
markers (:43-113 detect_ats). Spark-first re-expression: vendor
detection is a CASE over content markers, each vendor shape is a
typed ``from_json`` schema, and the per-vendor branches normalize to
one schema and ``unionByName`` — a tagged union, all JVM-side, no
Python in the hot path.

The fixture has no ATS payloads, so deterministic vendor JSON is
synthesized per document (vendor rotates by doc_id%3, 1+doc_id%2
jobs each) with real vendor domains as detection markers; the oracle
regenerates the normalized rows from the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load
from project_orbit_spark.registry import register

GREENHOUSE_SCHEMA = (
    "STRUCT<jobs: ARRAY<STRUCT<title: STRING, location: STRUCT<name: STRING>, "
    "departments: ARRAY<STRUCT<name: STRING>>, absolute_url: STRING, id: BIGINT, "
    "updated_at: STRING>>>"
)
LEVER_SCHEMA = (
    "ARRAY<STRUCT<text: STRING, categories: STRUCT<location: STRING, team: STRING>, "
    "hostedUrl: STRING, id: STRING>>"
)
ASHBY_SCHEMA = (
    "STRUCT<jobPostings: ARRAY<STRUCT<title: STRING, locationName: STRING, "
    "team: STRUCT<name: STRING>, publishedJobUrl: STRING, id: STRING>>>"
)

NORMALIZED_COLS = ("doc_id", "vendor", "title", "location", "department", "url", "job_id")


def detect_vendor(payload: Column) -> Column:
    """Content-marker vendor detection (ref src/ats_extractor.py:43-113):
    first matching vendor domain wins, None otherwise."""
    return (
        F.when(payload.contains("greenhouse.io"), F.lit("greenhouse"))
        .when(payload.contains("lever.co"), F.lit("lever"))
        .when(payload.contains("ashbyhq.com"), F.lit("ashby"))
        .otherwise(F.lit(None).cast("string"))
    )


def normalize_ats_payloads(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """The S5 operator: tagged-union normalization of per-vendor ATS
    JSON into (vendor, title, location, department, url, job_id).
    Each branch filters to its vendor, parses with that vendor's typed
    schema, explodes the job array, and renames to the normal form."""
    p = F.col(payload_col)
    tagged = df.withColumn("vendor", detect_vendor(p))

    gh = (
        tagged.filter(F.col("vendor") == "greenhouse")
        .select(
            "doc_id",
            "vendor",
            F.explode(F.from_json(p, GREENHOUSE_SCHEMA)["jobs"]).alias("j"),
        )
        .select(
            "doc_id",
            "vendor",
            F.col("j.title").alias("title"),
            F.col("j.location.name").alias("location"),
            F.element_at("j.departments", 1)["name"].alias("department"),
            F.col("j.absolute_url").alias("url"),
            F.col("j.id").cast("string").alias("job_id"),
        )
    )
    lv = (
        tagged.filter(F.col("vendor") == "lever")
        .select("doc_id", "vendor", F.explode(F.from_json(p, LEVER_SCHEMA)).alias("j"))
        .select(
            "doc_id",
            "vendor",
            F.col("j.text").alias("title"),
            F.col("j.categories.location").alias("location"),
            F.col("j.categories.team").alias("department"),
            F.col("j.hostedUrl").alias("url"),
            F.col("j.id").alias("job_id"),
        )
    )
    asb = (
        tagged.filter(F.col("vendor") == "ashby")
        .select(
            "doc_id",
            "vendor",
            F.explode(F.from_json(p, ASHBY_SCHEMA)["jobPostings"]).alias("j"),
        )
        .select(
            "doc_id",
            "vendor",
            F.col("j.title").alias("title"),
            F.col("j.locationName").alias("location"),
            F.col("j.team.name").alias("department"),
            F.col("j.publishedJobUrl").alias("url"),
            F.col("j.id").alias("job_id"),
        )
    )
    return gh.unionByName(lv).unionByName(asb)


def _vendor_payload() -> Column:
    """Synthesize this doc's vendor payload (vendor = doc_id%3,
    1+doc_id%2 jobs) as a textual JSON column so the operator
    genuinely parses JSON, not pre-built structs."""
    d = F.col("doc_id")
    idxs = F.sequence(F.lit(0), (d % 2).cast("int"))

    def job(fmt: str, *args: Column) -> Column:
        return F.format_string(fmt, *args)

    gh_jobs = F.concat_ws(
        ",",
        F.transform(
            idxs,
            lambda i: job(
                '{"title": "GH Role %d-%d", "location": {"name": "Loc%d"}, '
                '"departments": [{"name": "Dept%d"}], '
                '"absolute_url": "https://boards.greenhouse.io/acme/%d/%d", '
                '"id": %d, "updated_at": "2024-05-01"}',
                d, i, (d + i) % 7, (d + i) % 3, d, i, d * 10 + i,
            ),
        ),
    )
    lv_jobs = F.concat_ws(
        ",",
        F.transform(
            idxs,
            lambda i: job(
                '{"text": "LV Role %d-%d", "categories": {"location": "Loc%d", '
                '"team": "Team%d"}, "hostedUrl": "https://jobs.lever.co/acme/%d/%d", '
                '"id": "lv-%d-%d"}',
                d, i, (d + i) % 7, (d + i) % 3, d, i, d, i,
            ),
        ),
    )
    as_jobs = F.concat_ws(
        ",",
        F.transform(
            idxs,
            lambda i: job(
                '{"title": "AS Role %d-%d", "locationName": "Loc%d", '
                '"team": {"name": "Team%d"}, '
                '"publishedJobUrl": "https://jobs.ashbyhq.com/acme/%d/%d", '
                '"id": "as-%d-%d"}',
                d, i, (d + i) % 7, (d + i) % 3, d, i, d, i,
            ),
        ),
    )
    return (
        F.when(d % 3 == 0, F.concat(F.lit('{"jobs": ['), gh_jobs, F.lit("]}")))
        .when(d % 3 == 1, F.concat(F.lit("["), lv_jobs, F.lit("]")))
        .otherwise(F.concat(F.lit('{"jobPostings": ['), as_jobs, F.lit("]}")))
    )


@register(
    "ats_normalize_jobs",
    tags=("source", "json"),
    doc="S5 ATS vendor normalization (ref src/ats_extractor.py:43-113 "
    "detection, :114-220 Greenhouse, :221-288 Lever, :491-656 Ashby): "
    "content-marker vendor detection → per-vendor typed from_json → "
    "explode → unionByName into one normal form. Oracle regenerates "
    "the normalized rows from the synthesis arithmetic.",
    oracle="""
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'greenhouse'
                 WHEN 1 THEN 'lever' ELSE 'ashby' END AS vendor,
               CASE doc_id % 3
                 WHEN 0 THEN 'GH Role ' || CAST(doc_id AS VARCHAR) || '-' || CAST(i AS VARCHAR)
                 WHEN 1 THEN 'LV Role ' || CAST(doc_id AS VARCHAR) || '-' || CAST(i AS VARCHAR)
                 ELSE 'AS Role ' || CAST(doc_id AS VARCHAR) || '-' || CAST(i AS VARCHAR)
               END AS title,
               'Loc' || CAST((doc_id + i) % 7 AS VARCHAR) AS location,
               CASE WHEN doc_id % 3 = 0
                 THEN 'Dept' || CAST((doc_id + i) % 3 AS VARCHAR)
                 ELSE 'Team' || CAST((doc_id + i) % 3 AS VARCHAR) END AS department,
               CASE doc_id % 3
                 WHEN 0 THEN 'https://boards.greenhouse.io/acme/'
                   || CAST(doc_id AS VARCHAR) || '/' || CAST(i AS VARCHAR)
                 WHEN 1 THEN 'https://jobs.lever.co/acme/'
                   || CAST(doc_id AS VARCHAR) || '/' || CAST(i AS VARCHAR)
                 ELSE 'https://jobs.ashbyhq.com/acme/'
                   || CAST(doc_id AS VARCHAR) || '/' || CAST(i AS VARCHAR)
               END AS url,
               CASE doc_id % 3
                 WHEN 0 THEN CAST(doc_id * 10 + i AS VARCHAR)
                 WHEN 1 THEN 'lv-' || CAST(doc_id AS VARCHAR) || '-' || CAST(i AS VARCHAR)
                 ELSE 'as-' || CAST(doc_id AS VARCHAR) || '-' || CAST(i AS VARCHAR)
               END AS job_id
        FROM documents, UNNEST(range(0, 1 + doc_id % 2)) AS t(i)
        ORDER BY doc_id, job_id
    """,
)
def ats_normalize_jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")
    payloads = d.select("doc_id", _vendor_payload().alias("payload"))
    return normalize_ats_payloads(payloads).orderBy("doc_id", "job_id")

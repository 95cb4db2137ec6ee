"""Page-type probe frontier — SURVEY.md §2.1 S3's generation half.

The reference probes each seed company's site for 12 page types by
trying an ordered list of URL patterns per type until one answers 200
(/root/reference/src/scraper_v2.py:80-93 PAGE_PATTERNS,
1234-1245 _find_page_url). The engine generates that probe frontier as
a table: seed companies × the 56 (page_type, pattern) candidates, in
probe order, with shared-URL fan-in counted (``/press`` serves both
the blog and press types). The fetch itself — HEAD each probe_url,
keep the first 2xx per (company, page_type) — is a documented
``mapInPandas`` seam over this frontier, exactly like the E1/E5
pluggable-provider duality: the frontier is the distributed work
list, one partition per batch of probes.

Scale shape: the pattern table is a 56-row broadcast; the frontier is
seeds × 56 produced map-side with no shuffle; the fan-in count is one
bounded groupBy on (company, url).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load
from project_orbit_spark.registry import register

# All 12 page types with their ordered probe patterns, verbatim from
# the reference's PAGE_PATTERNS (scraper_v2.py:80-93).
PAGE_PATTERNS: dict[str, tuple[str, ...]] = {
    "homepage": ("/",),
    "about": ("/about", "/company", "/about-us", "/who-we-are", "/our-story"),
    "product": ("/product", "/products", "/platform", "/solutions", "/features"),
    "careers": ("/careers", "/jobs", "/join-us", "/work-with-us"),
    "blog": ("/blog", "/news", "/press", "/newsroom", "/insights", "/resources"),
    "team": (
        "/team",
        "/leadership",
        "/about/team",
        "/about/leadership",
        "/people",
        "/our-team",
    ),
    "investors": ("/investors", "/funding", "/about/investors", "/backed-by", "/backers"),
    "customers": (
        "/customers",
        "/case-studies",
        "/success-stories",
        "/testimonials",
        "/customer-stories",
    ),
    "press": ("/press", "/newsroom", "/media", "/news-and-press", "/press-releases"),
    "pricing": ("/pricing", "/plans", "/price", "/buy", "/purchase"),
    "partners": ("/partners", "/integrations", "/ecosystem", "/partner", "/integration"),
    "contact": ("/contact", "/contact-us", "/get-in-touch", "/reach-us"),
}

_PATTERN_ROWS = [
    (ptype, order + 1, pattern)
    for ptype, patterns in PAGE_PATTERNS.items()
    for order, pattern in enumerate(patterns)
]

_PATTERN_VALUES = ", ".join(
    f"('{t}', {o}, '{p}')" for t, o, p in _PATTERN_ROWS
)


@register(
    "ats_probe_frontier",
    tags=("source", "frontier"),
    doc="S3 probe-frontier generator (ref src/scraper_v2.py:80-93 "
    "PAGE_PATTERNS × 1234-1245 _find_page_url): seed companies (every "
    "100th customer, slugged like E3's enhancement) × the 56 ordered "
    "(page_type, pattern) probes, with per-URL fan-in counting the "
    "page types sharing a candidate URL. The HEAD-probe fetch stage "
    "consumes this table through a mapInPandas seam (see module "
    "docstring) — generation is the oracle-checkable half.",
    oracle=f"""
        WITH seeds AS (
          SELECT lower(regexp_replace(c_name, '[^a-zA-Z0-9]', '', 'g')) AS company
          FROM customer WHERE c_custkey % 100 = 0
        ),
        patterns AS (
          SELECT * FROM (VALUES {_PATTERN_VALUES})
            AS p(page_type, probe_order, pattern)
        ),
        frontier AS (
          SELECT s.company, p.page_type,
                 CAST(p.probe_order AS BIGINT) AS probe_order,
                 'https://' || s.company || '.com' || p.pattern AS probe_url
          FROM seeds s CROSS JOIN patterns p
        ),
        fanin AS (
          SELECT company, probe_url, count(*) AS n_types_for_url
          FROM frontier GROUP BY company, probe_url
        )
        SELECT f.company, f.page_type, f.probe_order, f.probe_url,
               fi.n_types_for_url
        FROM frontier f JOIN fanin fi USING (company, probe_url)
        ORDER BY f.company, f.page_type, f.probe_order
    """,
)
def ats_probe_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    seeds = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 100 == 0)
        .select(
            F.lower(F.regexp_replace("c_name", "[^a-zA-Z0-9]", "")).alias("company")
        )
    )
    patterns = spark.createDataFrame(
        _PATTERN_ROWS, "page_type string, probe_order long, pattern string"
    )
    frontier = seeds.crossJoin(F.broadcast(patterns)).select(
        "company",
        "page_type",
        "probe_order",
        F.concat(
            F.lit("https://"), F.col("company"), F.lit(".com"), F.col("pattern")
        ).alias("probe_url"),
    )
    fanin = frontier.groupBy("company", "probe_url").agg(
        F.count(F.lit(1)).alias("n_types_for_url")
    )
    return frontier.join(fanin, ["company", "probe_url"]).select(
        "company", "page_type", "probe_order", "probe_url", "n_types_for_url"
    ).orderBy("company", "page_type", "probe_order")

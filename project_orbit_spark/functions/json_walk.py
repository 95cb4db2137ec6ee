"""C15 recursive embedded-JSON descent — SURVEY.md §2.7.

The reference walks arbitrarily nested JSON and collects every dict
that "looks like structured data" — i.e. carries any of the marker
keys title/name/description/url/type/@type — at any depth
(src/scraper_v2.py:469-487 extract_embedded_json_recursive;
src/structured_extraction_v2.py:442-512 per-@type dispatch). Spark's
``from_json``/``get_json_object`` need a fixed schema/path, so this
variant-walk is the pandas_udf tier (SURVEY §2.10): an Arrow-batched
``mapInPandas`` that json-parses each payload and recurses with an
explicit depth bound, emitting one row per structured-data dict with
its JSONPath, @type, display name, and depth.

The fixture corpus has no JSON column, so a deterministic nested
payload (org → people[] → events[] → deep misc) is templated per
document; the oracle regenerates the expected walk rows from the same
template arithmetic.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from project_orbit_spark.catalog import load
from project_orbit_spark.registry import register

MARKER_KEYS = ("title", "name", "description", "url", "type", "@type")

WALK_SCHEMA = "doc_id long, path string, at_type string, name string, depth long"


def _make_walkers():
    # factory so both functions are <locals> closures: cloudpickle
    # serializes them BY VALUE into the mapInPandas closure instead
    # of import references foreign-cwd workers can't resolve
    # (caught by tools/driver_sim.py); the recursive call resolves
    # through the factory scope's cell, so recursion survives
    # pickling too
    def walk_structured(obj, path: str = "$", depth: int = 0, out: list | None = None,
                        max_depth: int = 8) -> list[dict]:
        """Pre-order recursive descent (ref src/scraper_v2.py:469-487):
        emit every dict carrying a marker key; lists pass depth through
        (an array element sits at its parent's nesting level, matching
        the reference's flat-results recursion)."""
        if out is None:
            out = []
        if depth > max_depth:
            return out
        if isinstance(obj, dict):
            if any(k in obj for k in MARKER_KEYS):
                out.append(
                    {
                        "path": path,
                        "at_type": obj.get("@type"),
                        "name": obj.get("name") or obj.get("title"),
                        "depth": depth,
                    }
                )
            for k, v in obj.items():
                walk_structured(v, f"{path}.{k}", depth + 1, out, max_depth)
        elif isinstance(obj, list):
            for i, v in enumerate(obj):
                walk_structured(v, f"{path}[{i}]", depth, out, max_depth)
        return out

    def _nested_payload(d: int) -> str:
        """Deterministic nested JSON per doc: Organization root, d%3
        Person entries, an Event with a nested Offer on even ids, a
        marker-free address dict (must be skipped but recursed), and a
        depth-2 title-only dict (caught by the title marker)."""
        obj: dict = {
            "@type": "Organization",
            "name": f"Org {d}",
            "founded": 1990 + d % 30,
            "address": {"street": f"S{d}", "city": f"City{d % 10}"},
            "people": [
                {"@type": "Person", "name": f"P {d}-{i}", "jobTitle": f"T{(d + i) % 4}"}
                for i in range(d % 3)
            ],
            "misc": {"deep": {"title": f"Deep {d}"}},
        }
        if d % 2 == 0:
            obj["events"] = [
                {"@type": "Event", "name": f"E {d}", "nested": {"@type": "Offer", "name": f"O {d}"}}
            ]
        return json.dumps(obj)
    return walk_structured, _nested_payload


walk_structured, _nested_payload = _make_walkers()


@register(
    "jsonld_entity_walk",
    tags=("json", "pandas_udf"),
    doc="C15 recursive variant-type descent (ref src/scraper_v2.py:"
    "469-487, src/structured_extraction_v2.py:442-512): depth-bounded "
    "pre-order walk over nested JSON emitting (path, @type, name, "
    "depth) for every dict with a structured-data marker key — the "
    "non-fixed-schema complement of from_json (C15's relational face, "
    "operators/relational.py json_props_extraction). Oracle "
    "regenerates the walk rows from the template arithmetic.",
    oracle="""
        WITH roots AS (
          SELECT doc_id, '$' AS path, 'Organization' AS at_type,
                 'Org ' || CAST(doc_id AS VARCHAR) AS name,
                 CAST(0 AS BIGINT) AS depth
          FROM documents
        ),
        people AS (
          SELECT doc_id,
                 '$.people[' || CAST(i AS VARCHAR) || ']' AS path,
                 'Person' AS at_type,
                 'P ' || CAST(doc_id AS VARCHAR) || '-' || CAST(i AS VARCHAR) AS name,
                 CAST(1 AS BIGINT) AS depth
          FROM documents, UNNEST(range(0, doc_id % 3)) AS t(i)
        ),
        events AS (
          SELECT doc_id, '$.events[0]' AS path, 'Event' AS at_type,
                 'E ' || CAST(doc_id AS VARCHAR) AS name, CAST(1 AS BIGINT) AS depth
          FROM documents WHERE doc_id % 2 = 0
          UNION ALL
          SELECT doc_id, '$.events[0].nested' AS path, 'Offer' AS at_type,
                 'O ' || CAST(doc_id AS VARCHAR) AS name, CAST(2 AS BIGINT) AS depth
          FROM documents WHERE doc_id % 2 = 0
        ),
        deeps AS (
          SELECT doc_id, '$.misc.deep' AS path, CAST(NULL AS VARCHAR) AS at_type,
                 'Deep ' || CAST(doc_id AS VARCHAR) AS name,
                 CAST(2 AS BIGINT) AS depth
          FROM documents
        )
        SELECT * FROM (
          SELECT * FROM roots UNION ALL SELECT * FROM people
          UNION ALL SELECT * FROM events UNION ALL SELECT * FROM deeps
        ) u
        ORDER BY doc_id, path
    """,
)
def jsonld_entity_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            frames = []
            for did in pdf["doc_id"]:
                rows = walk_structured(json.loads(_nested_payload(int(did))))
                if rows:
                    f = _pd.DataFrame(rows)
                    f.insert(0, "doc_id", int(did))
                    frames.append(f)
            if frames:
                out = _pd.concat(frames, ignore_index=True)
                out["depth"] = out["depth"].astype("int64")
                yield out

    return d.mapInPandas(run, WALK_SCHEMA).orderBy("doc_id", "path")

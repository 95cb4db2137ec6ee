"""project_orbit_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference platform
(Big-Data-Team-3/project_orbit, surveyed in /root/repo/SURVEY.md):
relational core (filters/joins/aggregates/windows), a text/scalar
extraction bank, similarity & deduplication (exact, MinHash-LSH,
n-gram Jaccard, embedding cosine), incremental/streaming windows,
and gold-layer assembly — all declared as Catalyst-optimizable
DataFrame transforms designed for 100 TB scale (broadcast dims,
partial aggregation, pushed-down predicates, no driver-side loops).
"""

from project_orbit_spark.registry import all_queries, get_query, oracle_map

__all__ = ["all_queries", "get_query", "oracle_map"]
__version__ = "0.1.0"

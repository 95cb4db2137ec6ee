"""The sources/roundtrip.py queries put the S1/S4/S7/S8 + S11–S14
connectors on the driver hash record; their values are oracle-gated by
tools/check.py, so these tests pin the contract edges: registration,
oracle presence, and the session-scoped staging isolation."""

from __future__ import annotations

from project_orbit_spark import registry
from project_orbit_spark.session import cache_token
from project_orbit_spark.sources import roundtrip

ROUNDTRIP_QUERIES = (
    "seed_scan_company_ids",
    "corpus_scan_path_keys",
    "rss_feed_items",
    "tagged_union_sources",
    "partitioned_sink_roundtrip",
    "append_log_sink_roundtrip",
)


def test_all_registered_with_oracles():
    qs = registry.all_queries()
    for name in ROUNDTRIP_QUERIES:
        assert name in qs, name
        assert qs[name].oracle is not None, f"{name} must be hash-checkable"


def test_stage_dir_is_session_scoped(spark):
    d = roundtrip._stage_dir(spark, "seed")
    assert cache_token(spark) in d
    assert d.startswith("/tmp/orbit_spark_roundtrip/")


def test_seed_rows_exercise_host_regex_variants(spark):
    seed = roundtrip._collect_nation_seed(spark, "/root/testdata/sf0.001")
    sites = [r["website"] for r in seed]
    assert any(s.startswith("http://") for s in sites)
    assert any(s.startswith("https://www.") for s in sites)
    assert any("//nation" in s for s in sites)  # bare host, no www


def test_feed_xml_covers_both_dialects(spark):
    feeds = roundtrip._feed_xml(spark, "/root/testdata/sf0.001").collect()
    xmls = {r["feed_id"]: r["xml"] for r in feeds}
    assert any(x.startswith("<rss") for x in xmls.values())
    assert any(x.startswith("<feed") for x in xmls.values())
    atom = next(x for x in xmls.values() if x.startswith("<feed"))
    assert "<content>C: " in atom or "<summary>" in atom

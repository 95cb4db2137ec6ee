"""Fetch-seam page-merge contract for the ATS normalizers (S5).

The live paging loop can't run here (no network), but its
*normalization* contract can be pinned: hand-written multi-page
Greenhouse / Lever payloads — public API shapes from
/root/reference/src/ats_extractor.py:119-240 — flow through
merge_paged_ats_payloads, which must union a doc's pages and collapse
jobs repeated across page boundaries while keeping per-doc scope."""

from __future__ import annotations

import json

from project_orbit_spark.sources.ats import merge_paged_ats_payloads

PAYLOAD_SCHEMA = "doc_id long, page long, payload string"


def gh_page(jobs: list[tuple[int, str]]) -> str:
    return json.dumps(
        {
            "jobs": [
                {
                    "title": title,
                    "location": {"name": "Berlin"},
                    "departments": [{"name": "Eng"}],
                    "absolute_url": f"https://boards.greenhouse.io/acme/jobs/{jid}",
                    "id": jid,
                    "updated_at": "2026-01-01",
                }
                for jid, title in jobs
            ]
        }
    )


def lever_page(jobs: list[tuple[str, str]]) -> str:
    return json.dumps(
        [
            {
                "text": title,
                "categories": {"location": "NYC", "team": "Data"},
                "hostedUrl": f"https://jobs.lever.co/acme/{jid}",
                "id": jid,
            }
            for jid, title in jobs
        ]
    )


def test_greenhouse_two_pages_merge_and_boundary_dedupe(spark):
    # page 2 re-serves job 102 (offset drift on a changing board):
    # the merged list must carry each job once
    rows = [
        (1, 1, gh_page([(101, "Eng A"), (102, "Eng B")])),
        (1, 2, gh_page([(102, "Eng B"), (103, "Eng C")])),
    ]
    out = merge_paged_ats_payloads(
        spark.createDataFrame(rows, PAYLOAD_SCHEMA)
    ).collect()
    assert sorted(r.job_id for r in out) == ["101", "102", "103"]
    by_id = {r.job_id: r for r in out}
    assert by_id["102"].title == "Eng B"
    assert by_id["102"].location == "Berlin"
    assert by_id["102"].department == "Eng"
    assert by_id["102"].url == "https://boards.greenhouse.io/acme/jobs/102"
    assert all(r.vendor == "greenhouse" for r in out)


def test_lever_two_pages_merge_and_boundary_dedupe(spark):
    rows = [
        (7, 1, lever_page([("aa", "Analyst"), ("bb", "Scientist")])),
        (7, 2, lever_page([("bb", "Scientist"), ("cc", "Manager")])),
    ]
    out = merge_paged_ats_payloads(
        spark.createDataFrame(rows, PAYLOAD_SCHEMA)
    ).collect()
    assert sorted(r.job_id for r in out) == ["aa", "bb", "cc"]
    by_id = {r.job_id: r for r in out}
    assert by_id["bb"].title == "Scientist"
    assert by_id["bb"].location == "NYC"
    assert by_id["bb"].department == "Data"
    assert all(r.vendor == "lever" for r in out)


def test_same_job_id_on_different_docs_does_not_collapse(spark):
    # per-doc scope: two companies' boards can reuse numeric ids
    rows = [
        (1, 1, gh_page([(500, "Shared Id A")])),
        (2, 1, gh_page([(500, "Shared Id B")])),
    ]
    out = merge_paged_ats_payloads(
        spark.createDataFrame(rows, PAYLOAD_SCHEMA)
    ).collect()
    assert len(out) == 2
    assert sorted((r.doc_id, r.title) for r in out) == [
        (1, "Shared Id A"),
        (2, "Shared Id B"),
    ]


def test_cross_page_field_drift_keeps_last_page_deterministically(spark):
    # a job whose title/updated_at changed between paged fetches must
    # collapse to the LAST page's copy (freshest fetch), not an
    # arbitrary partitioning-dependent survivor
    rows = [
        (4, 1, gh_page([(201, "Engineer (old title)"), (202, "Stable")])),
        (4, 2, gh_page([(201, "Engineer (renamed)"), (203, "New")])),
    ]
    out = merge_paged_ats_payloads(
        spark.createDataFrame(rows, PAYLOAD_SCHEMA)
    ).collect()
    by_id = {r.job_id: r for r in out}
    assert len(out) == 3
    assert by_id["201"].title == "Engineer (renamed)"
    assert "page" not in out[0].asDict()


def test_pageless_input_still_merges(spark):
    # callers that never paged (single-fetch tier) pass no page column;
    # the merge must still collapse duplicate ids to a single row
    rows = [
        (5, gh_page([(301, "Only"), (301, "Only")])),
    ]
    out = merge_paged_ats_payloads(
        spark.createDataFrame(rows, "doc_id long, payload string")
    ).collect()
    assert [(r.doc_id, r.job_id, r.title) for r in out] == [(5, "301", "Only")]


def test_mixed_vendor_pages_on_one_doc_keep_vendor_scope(spark):
    # a doc whose frontier found both a Greenhouse board and a Lever
    # board: merge keys on (doc_id, vendor, job_id), so identical ids
    # across vendors must both survive
    rows = [
        (3, 1, gh_page([(1, "GH One")])),
        (3, 1, lever_page([("1", "LV One")])),
    ]
    out = merge_paged_ats_payloads(
        spark.createDataFrame(rows, PAYLOAD_SCHEMA)
    ).collect()
    assert sorted((r.vendor, r.title) for r in out) == [
        ("greenhouse", "GH One"),
        ("lever", "LV One"),
    ]

"""Unit tests for the C15 recursive variant-walk primitive."""

from __future__ import annotations

from project_orbit_spark.functions.json_walk import walk_structured


def test_marker_free_dicts_skipped_but_recursed():
    rows = walk_structured({"wrapper": {"inner": {"name": "X"}}})
    assert [r["path"] for r in rows] == ["$.wrapper.inner"]
    assert rows[0]["depth"] == 2


def test_lists_pass_depth_through():
    rows = walk_structured({"items": [{"title": "A"}, {"title": "B"}]})
    assert [(r["path"], r["depth"]) for r in rows] == [
        ("$.items[0]", 1),
        ("$.items[1]", 1),
    ]


def test_depth_bound_stops_descent():
    deep = {"name": "lvl0"}
    cur = deep
    for i in range(1, 12):
        cur["child"] = {"name": f"lvl{i}"}
        cur = cur["child"]
    rows = walk_structured(deep, max_depth=3)
    assert [r["name"] for r in rows] == ["lvl0", "lvl1", "lvl2", "lvl3"]


def test_name_falls_back_to_title_and_type_nullable():
    rows = walk_structured({"title": "only title"})
    assert rows[0]["name"] == "only title"
    assert rows[0]["at_type"] is None


def test_scalars_and_empty_containers():
    assert walk_structured(42) == []
    assert walk_structured([]) == []
    assert walk_structured({"a": 1}) == []

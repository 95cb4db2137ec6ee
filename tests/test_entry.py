"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs), "oracle without a query"


def test_library_primitives(spark):
    """Unit checks on library-level primitives (chunker, money, slug)."""
    from pyspark.sql import functions as F

    from project_orbit_spark.functions.textbank import chunk_text, parse_money, slugify

    df = spark.createDataFrame(
        [("abcdefghij" * 25,)], ["text"]
    )  # 250 chars -> 3 chunks of 100
    chunks = df.select(F.explode(chunk_text(F.col("text"), 100)).alias("c")).collect()
    assert len(chunks) == 3
    assert chunks[0]["c"]["chunk_text"] == "abcdefghij" * 10
    assert len(chunks[2]["c"]["chunk_text"]) == 50

    m = spark.createDataFrame(
        [("$5.5B",), ("$10M",), ("$100K",), ("$42",)], ["s"]
    ).select(parse_money(F.col("s")).alias("v")).collect()
    assert [r["v"] for r in m] == [5.5e9, 1e7, 1e5, 42.0]

    s = spark.createDataFrame([("Hello, World! 2024 Launch",)], ["s"]).select(
        slugify(F.col("s")).alias("v")
    ).collect()
    assert s[0]["v"] == "hello_world_2024_launch"


def test_retry_wrapper_backs_off_then_succeeds():
    from project_orbit_spark.functions.inference import with_retries

    calls = {"n": 0}
    delays: list[float] = []

    def flaky(x):
        calls["n"] += 1
        if calls["n"] < 4:
            raise ConnectionError("transient")
        return x * 2

    wrapped = with_retries(flaky, max_retries=5, base_delay=0.2, sleep=delays.append)
    assert wrapped(21) == 42
    assert calls["n"] == 4
    # exponential schedule: base*2^k plus bounded jitter
    assert len(delays) == 3
    for k, d in enumerate(delays):
        assert 0.2 * 2**k <= d <= 0.2 * 2**k * 1.25 + 1e-9


def test_retry_wrapper_exhausts_and_raises():
    import pytest as _pytest

    from project_orbit_spark.functions.inference import with_retries

    def always_fails():
        raise TimeoutError("down")

    wrapped = with_retries(always_fails, max_retries=2, sleep=lambda _d: None)
    with _pytest.raises(TimeoutError):
        wrapped()


def test_registered_fn_names_match_registry_names():
    # guards against a decorator landing on the wrong def (a round-6
    # regression: an insertion between @register and its def silently
    # re-pointed feed_autodiscovery at a closure factory). Known
    # deliberate aliases are listed explicitly.
    from project_orbit_spark import registry

    aliases = {
        "bloom_pruned_join": "bloom_pruned_join_query",
        "stream_enrich_events": "stream_enrich_events_batch",
    }
    for name, q in registry.all_queries().items():
        expect = aliases.get(name, name)
        assert q.fn.__name__ == expect, (name, q.fn.__name__)


def test_driver_priority_entries_are_registered():
    # a typo'd _DRIVER_PRIORITY name is silently ignored by
    # _driver_order, quietly dropping that query's guaranteed slot in
    # the driver's first-50 sample — fail loudly instead
    from project_orbit_spark import registry

    qs = set(registry.all_queries())
    missing = [n for n in registry._DRIVER_PRIORITY if n not in qs]
    assert not missing, f"priority entries not in registry: {missing}"
    missing = [n for n in registry._DRIVER_PRIORITY_CHANGED if n not in qs]
    assert not missing, f"changed-path pins not in registry: {missing}"
    # and the priority head must fit the driver's sample window
    assert (
        len(registry._DRIVER_PRIORITY) + len(registry._DRIVER_PRIORITY_CHANGED)
        <= 50
    )


def test_priority_head_fits_the_spare_slot_budget():
    """The 50-slot sample must first absorb every query whose record
    is going stale (the rotation), so the head + never-verified set
    may only occupy the SPARE slots — computed from the records, not
    a hand-maintained constant (VERDICT r9 ask #8). Failing here at
    build time beats an overdue query silently missing the official
    CORRECTNESS record at round boundary. The staleness bar is
    registry.rotation_period() — ADAPTIVE in the surface size, since
    a 50-slot window arithmetically cannot re-verify more than
    50×period queries per cycle (see its docstring)."""
    from project_orbit_spark import registry

    last = registry._last_verified()
    if not last:
        return  # fresh clone — no records, nothing rotating
    newest = max(last.values())
    bar = registry.rotation_period() - 1  # rounds behind => due now
    qmap = registry.all_queries()
    names = [n for n in qmap if qmap[n].driver]
    # queries whose record hits the bar once this round's record
    # lands (i.e. must be re-verified THIS round)
    rotating = [n for n in names if 0 < last.get(n, 0) <= newest - bar]
    never = [n for n in names if last.get(n, 0) == 0]
    # self-expiring head (VERDICT r10 ask #1): an entry whose record
    # equals the newest round no longer pins a slot
    head_fresh = [
        n
        for n in registry._DRIVER_PRIORITY
        if newest - bar < last.get(n, 0) < newest
    ]
    occupied = len(set(rotating) | set(never) | set(head_fresh))
    assert occupied <= 50, (
        f"first-50 budget overflow: {len(rotating)} rotating + "
        f"{len(never)} never-verified + {len(head_fresh)} fresh-record head "
        f"entries = {occupied} > 50 — defer a new query "
        f"(registry.Query.driver case 2) or trim the head"
    )


def test_first50_sample_finishes_the_staleness_rotation():
    """The driver hash-checks only the FIRST 50 queries() entries per
    round. The rotation contract (VERDICT r8 ask #2 and onward): no
    registered query's latest CORRECTNESS record may fall more than
    rotation_period()−1 rounds behind the newest record — so a record
    EXACTLY that far behind must be in THIS round's first-50 (once
    the new record lands, an unrotated such query would exceed the
    period); hence the ``<=`` below (ADVICE r9 wording fix — the
    condition was always the operative bar). The period is ADAPTIVE
    in the surface size (registry.rotation_period()): 50 slots/round
    cannot re-verify a >200-query surface on the original fixed
    4-round cycle. This guard recomputes the window
    from the repo's CORRECTNESS_r*.json files — if a future round's
    head + never-verified set grows past the spare slots, the
    overflow fails HERE, not in the official driver record."""
    from project_orbit_spark import registry

    last = registry._last_verified()
    if not last:
        return  # no driver records yet (fresh clone) — nothing to rotate
    newest = max(last.values())
    bar = registry.rotation_period() - 1
    qs = list(registry.query_map())
    first50 = set(qs[:50])
    overdue = [
        n
        for n in qs
        if last.get(n, 0) <= newest - bar and n not in first50
    ]
    assert not overdue, (
        f"records going >{bar} rounds stale are outside the first-50 driver "
        f"sample: {overdue} — trim _DRIVER_PRIORITY or defer a new query "
        f"(registry.Query.driver case 2)"
    )


def test_guards_stay_green_at_the_round_boundary(monkeypatch):
    """Boundary simulation (VERDICT r10 ask #1 'done' criterion): the
    moment the driver writes THIS round's CORRECTNESS record — every
    query in the current first-50 sample stamped with a new newest
    round — both rotation guards must STILL hold, because the
    freshly-recorded head entries self-expire and free their slots
    for the next round's rotation. Rounds 9 and 10 both went red at
    exactly this boundary under the hand-rebuilt head; this test
    makes the regression impossible to reintroduce silently."""
    from project_orbit_spark import registry

    real = registry._last_verified()
    if not real:
        return  # fresh clone — no boundary to simulate
    newest = max(real.values())
    first50 = list(registry.query_map())[:50]
    # simulate the driver's write: everything sampled this round gets
    # a green record in round newest+1
    simulated = dict(real)
    for n in first50:
        simulated[n] = newest + 1
    monkeypatch.setattr(registry, "_last_verified", lambda: simulated)

    sim_newest = newest + 1
    bar = registry.rotation_period() - 1
    qmap = registry.all_queries()
    names = [n for n in qmap if qmap[n].driver]
    rotating = [n for n in names if 0 < simulated.get(n, 0) <= sim_newest - bar]
    never = [n for n in names if simulated.get(n, 0) == 0]
    head_fresh = [
        n
        for n in registry._DRIVER_PRIORITY
        if sim_newest - bar < simulated.get(n, 0) < sim_newest
    ]
    occupied = len(set(rotating) | set(never) | set(head_fresh))
    assert occupied <= 50, (
        f"next-round budget overflow at the boundary: {len(rotating)} rotating "
        f"+ {len(never)} never-verified + {len(head_fresh)} fresh head = {occupied}"
    )
    qs = list(registry.query_map())
    nxt50 = set(qs[:50])
    overdue = [
        n for n in qs if simulated.get(n, 0) <= sim_newest - bar and n not in nxt50
    ]
    assert not overdue, f"overdue outside next round's first-50: {overdue}"


def test_rotation_schedule_is_sustainable_under_lrv():
    """Forward-simulate 12 rounds of the driver's actual behavior —
    each round stamps query_map()'s first-50 with a fresh record —
    over the REAL records on disk, with every currently-deferred
    case-2 query flipped in (the planned next-round surface). At
    every simulated round the guard conditions must hold: queries at
    the staleness bar all land inside that round's first-50. This is
    the sustainability proof for rotation_period(): the 50-slot
    window, least-recently-verified ordering, and the adaptive bar
    together never strand a query — including never-verified
    flips — at any point in the cycle."""
    from project_orbit_spark import registry

    real = registry._last_verified()
    if not real:
        return
    qmap = registry.all_queries()
    # the planned surface: everything except the by-design oracle-less
    # raw sketches becomes driver-visible
    names = [
        n
        for n, q in qmap.items()
        if q.driver or q.oracle is not None
    ]
    bar = max(4, -(-len(names) // 45)) - 1  # rotation_period over N
    reg_idx = {n: i for i, n in enumerate(names)}
    last = {n: real.get(n, 0) for n in names}
    newest = max(last.values())
    for r in range(newest + 1, newest + 13):
        order = sorted(names, key=lambda n: (last[n], reg_idx[n]))
        first50 = set(order[:50])
        due = [n for n in names if last[n] <= (r - 1) - bar]
        stranded = [n for n in due if n not in first50]
        assert not stranded, (
            f"round {r}: {len(due)} due, {len(stranded)} outside the "
            f"window: {stranded[:5]}"
        )
        for n in first50:
            last[n] = r

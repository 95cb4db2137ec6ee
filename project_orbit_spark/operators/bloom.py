"""Bloom-filter semi-join reduction — pruning a big probe side
before the shuffle when the build side is selective but too large to
broadcast as a hash table.

At 100 TB the pattern is: a fact table joins a filtered dimension
subset; hashing the subset's keys into a few-KB bitset and
broadcasting THAT lets every scan task drop non-matching fact rows
before they reach the exchange — the shuffle then carries only
(matches + a bounded false-positive fraction). The join after the
filter is still exact, so false positives cost bandwidth, never
correctness — which is also why the DuckDB oracle is the plain join:
the bitset is invisible in the result.

Built from public Spark primitives only (xxhash64 probes, bit_or
word aggregation, dense array<long> bitset, element_at + bitmask
probe — all O(1) per row); Spark's own runtime bloom filter
(spark.sql.optimizer.runtime.bloomFilter.*) applies the same idea
inside AQE when statistics allow, and this operator is the explicit,
always-on form.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS_LOG2 = 16  # 65,536 bits = 1,024 longs = 8 KB broadcast
BLOOM_PROBES = 2


def _probe_positions(key: Column) -> list[Column]:
    m = 1 << BLOOM_BITS_LOG2
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)) for i in range(BLOOM_PROBES)]


def build_key_bloom(small: DataFrame, key: str) -> DataFrame:
    """One-row DataFrame {bitset: array<long>} — a dense bitset over
    the build side's join keys. Word construction is a distributed
    bit_or aggregate; only the packed 8 KB array ever reaches the
    driver/broadcast."""
    nwords = (1 << BLOOM_BITS_LOG2) // 64
    pos = F.explode(F.array(*_probe_positions(F.col(key)))).alias("p")
    words = (
        small.select(pos)
        .select(
            F.shiftright("p", 6).cast("int").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.col("p").bitwiseAND(F.lit(63)).cast("int")
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return (
        words.agg(F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("wm"))
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(nwords - 1)),
                lambda i: F.coalesce(F.element_at("wm", i.cast("int")), F.lit(0).cast("long")),
            ).alias("bitset")
        )
    )


def bloom_might_contain(key: Column, bitset: Column) -> Column:
    """True iff every probe bit for ``key`` is set — may admit false
    positives (bounded by the m/n/j sizing), never false negatives."""
    conds = []
    for p in _probe_positions(key):
        word = F.element_at(bitset, F.shiftright(p, 6).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), p.bitwiseAND(F.lit(63)).cast("int")
        )
        conds.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, conds)


def bloom_pruned_join(big: DataFrame, small: DataFrame, key: str) -> DataFrame:
    """Exact inner join big⋈small on ``key``, with the big side
    pre-pruned through a broadcast bitset of the small side's keys."""
    bloom = build_key_bloom(small, key)
    pruned = (
        big.join(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col(key), F.col("bitset")))
        .drop("bitset")
    )
    return pruned.join(small, key)


def _register_query() -> None:
    from pyspark.sql import SparkSession

    from project_orbit_spark.catalog import load
    from project_orbit_spark.registry import register

    @register(
        "bloom_pruned_join",
        bench=True,
        tags=("join", "bloom", "scale"),
        doc="Bloom-semi-join reduction: lineitem pruned through an 8 KB "
        "broadcast bitset of urgent-high-value order keys before the "
        "exact join — monthly revenue of urgent orders > 250k. The "
        "bitset only drops rows early, so the oracle is the plain "
        "join; plan test asserts the might_contain filter sits below "
        "the join.",
        oracle="""
            SELECT strftime(o.o_orderdate, '%Y-%m') AS order_month,
                   count(*) AS n_items,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 250000
            GROUP BY order_month
            ORDER BY order_month
        """,
    )
    def bloom_pruned_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = load(spark, sf_dir, "orders")
        small = orders.filter(
            (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 250000)
        ).select("o_orderkey", "o_orderdate")
        big = load(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount"
        )
        joined = bloom_pruned_join(big, small, "o_orderkey")
        return (
            joined.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                    "revenue"
                ),
            )
            .orderBy("order_month")
        )


_register_query()

"""Subquery-decorrelation shapes (TPC-H Q2/Q4/Q15/Q22 adapted to the
trimmed star schema): correlated min, correlated EXISTS with a
cross-table predicate, uncorrelated scalar max, and NOT EXISTS plus a
global-average threshold.

Each query is written the way Catalyst decorrelates the SQL form —
the per-key subquery becomes an aggregate bounded by a dimension
(broadcast back onto the fact scan) or a single stats row (1-row
broadcast, allowlisted in tools/plan_audit.py) — so the DataFrame
plan IS the decorrelated plan, with the physical strategy explicit
instead of left to the rewriter.

Determinism: every monetary aggregate that feeds an equality or a
hash-checked output is computed in exact integer cents
(``round(x*100)`` as long), so sums are order-independent and
cross-engine float equality is exact, not approximate — the same
contract as the k-means quantization (operators/clustering.py).

Complements `q17_small_quantity_revenue` (operators/relational.py),
which covers the correlated scalar-average shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load, maybe_broadcast
from project_orbit_spark.registry import register


@register(
    "q2_min_cost_supplier",
    tags=("relational", "subquery", "join"),
    doc="TPC-H Q2 shape without partsupp: per (part, supplier) the "
    "minimum observed unit cost from lineitem, keep the suppliers "
    "matching the per-part minimum (correlated MIN subquery, "
    "decorrelated to a per-part aggregate bounded by the part dim "
    "and broadcast back), then the supplier→nation dim chain. "
    "Unit costs are per-row double divisions — identical in both "
    "engines — so the min-equality is exact.",
    oracle="""
        WITH supply AS (
          SELECT l_partkey, l_suppkey,
                 min(l_extendedprice / l_quantity) AS unit_cost
          FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        pmin AS (
          SELECT l_partkey, min(unit_cost) AS min_cost
          FROM supply GROUP BY l_partkey
        )
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
               round(sp.unit_cost, 4) AS unit_cost
        FROM supply sp
        JOIN pmin m ON m.l_partkey = sp.l_partkey
                   AND sp.unit_cost = m.min_cost
        JOIN part p ON p.p_partkey = sp.l_partkey
        JOIN supplier s ON s.s_suppkey = sp.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_size <= 5 AND p.p_type = 'STANDARD'
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 5) & (F.col("p_type") == "STANDARD")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    # the decorrelated correlated-MIN: one row per part, bounded by
    # the part dim, broadcast back onto the supply aggregate
    pmin = supply.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    return (
        supply.join(F.broadcast(pmin), "l_partkey")
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(p), p.p_partkey == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


@register(
    "q4_late_shipment_priority",
    # Was driver=False for round 9 only (registry.Query.driver case 2,
    # slot budget); flipped back per that note. Never-verified, so the
    # LRV sort puts it in the round-10 first-50 automatically.
    driver=True,
    tags=("relational", "subquery", "semi", "agg"),
    doc="TPC-H Q4 shape on available columns: orders from 1996Q3 with "
    "at least one line shipped >60 days after the order date, counted "
    "per priority. The correlated EXISTS carries a CROSS-TABLE "
    "predicate (l_shipdate vs o_orderdate), so it decorrelates to a "
    "left-semi join with a compound condition — key equality drives "
    "the shuffle, the date comparison rides as a join residual.",
    oracle="""
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q15_top_supplier",
    tags=("relational", "subquery", "agg", "broadcast"),
    doc="TPC-H Q15 shape: quarterly revenue per supplier, keep the "
    "supplier(s) matching the global maximum (the view + scalar-MAX "
    "subquery, decorrelated to a single max row broadcast back over "
    "the revenue aggregate — 1-row BNLJ build, allowlisted). Revenue "
    "accumulates as exact integer cents×discount-percent products "
    "(price 2dp × (1−disc) 2dp → integer / 10⁴), so the max-equality "
    "is exact and summation order is irrelevant.",
    oracle="""
        WITH rev AS (
          SELECT l_suppkey,
                 sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS r4
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT r.l_suppkey, s.s_name,
               round(CAST(r.r4 AS DOUBLE) / 10000.0, 2) AS total_revenue
        FROM rev r
        JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.r4 = (SELECT max(r4) FROM rev)
        ORDER BY r.l_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    r4 = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(r4).alias("r4"))
    mx = rev.agg(F.max("r4").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("r4") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "l_suppkey",
            "s_name",
            F.round(F.col("r4").cast("double") / 10000.0, 2).alias("total_revenue"),
        )
        .orderBy("l_suppkey")
    )


@register(
    "q22_lapsed_customer_balance",
    tags=("relational", "subquery", "anti", "agg"),
    doc="TPC-H Q22 shape adapted (no phone country codes in the "
    "trimmed schema): per nation, the count and total balance of "
    "above-average-balance customers with NO order since 2000-01-01 "
    "— an uncorrelated scalar-average threshold (1-row broadcast, "
    "allowlisted) plus a NOT EXISTS decorrelated to a left-anti join "
    "against the pruned recent-orders scan. Balances are exact "
    "integer cents, so the threshold comparison and the output sum "
    "are order-independent.",
    oracle="""
        WITH cb AS (
          SELECT c_custkey, c_nationkey,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS cents
          FROM customer
        ),
        thr AS (
          SELECT CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_cents
          FROM cb WHERE cents > 0
        )
        SELECT cb.c_nationkey, count(*) AS n_lapsed,
               round(sum(CAST(cents AS DOUBLE)) / 100.0, 2) AS total_balance
        FROM cb, thr
        WHERE CAST(cb.cents AS DOUBLE) > thr.avg_cents
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = cb.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
          )
        GROUP BY cb.c_nationkey
        ORDER BY cb.c_nationkey
    """,
)
def q22_lapsed_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cb = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    )
    thr = cb.filter(F.col("cents") > 0).agg(
        (F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_cents"
        )
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        cb.crossJoin(F.broadcast(thr))
        .filter(F.col("cents").cast("double") > F.col("avg_cents"))
        .join(recent, cb.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_lapsed"),
            F.round(F.sum(F.col("cents").cast("double")) / 100.0, 2).alias(
                "total_balance"
            ),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q16_supplier_part_counts",
    tags=("relational", "subquery", "anti", "agg", "distinct"),
    doc="TPC-H Q16 shape on the trimmed schema (lineitem stands in "
    "for partsupp as the part↔supplier relation): how many distinct "
    "suppliers ship each surviving (brand, type, size) bucket, "
    "excluding a NOT-IN supplier set (here: suppliers with negative-"
    "signal balances < 2000, the complaints-subquery analog). The "
    "NOT IN decorrelates to a left-anti join against the tiny "
    "excluded-supplier list (broadcast); the part predicate — two "
    "negations plus a size IN-list — prunes the part dim before its "
    "broadcast onto the fact scan; the count-distinct shuffles once "
    "on the group keys. Output is pure ints/strings — no float "
    "exposure at all.",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#5'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 5, 10, 15, 20, 25)
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    excluded = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2000)
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    # size-gated anti-join build: the low-balance supplier set derives
    # from a dim that scales with the star (bound: 1M single-key rows)
    return (
        li.join(maybe_broadcast(excluded, 1_000_000), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_dominant_part_suppliers",
    # Was driver=False for round 10 only (case 2); flipped per the
    # q9_nation_profit note (operators/relational.py).
    driver=True,
    bench=True,
    tags=("relational", "subquery", "agg", "window"),
    doc="TPC-H Q20 shape without partsupp (availqty → shipped share): "
    "suppliers who DOMINATED a 'cold*' part in 1996 — shipped more "
    "than half of that part's total 1996 volume — reported with "
    "their nation. An agg-over-agg correlated threshold: the inner "
    "per-(part, supplier) sum compares against 0.5 × the per-part "
    "total. Decorrelation choice, plan-tested: the per-part total is "
    "a WINDOW sum over the pair aggregate — a groupBy + join-back "
    "duplicates the whole pair subtree in the plan (two fact scans, "
    "2× the IO at 100 TB, observed on this query), while the window "
    "re-partitions the already-aggregated (part, supplier) rows "
    "once, bounded by the dims. Quantities are integer-valued, so "
    "the half-threshold compare is exact integer arithmetic "
    "(2·pair > total avoids the 0.5 float entirely).",
    oracle="""
        WITH pair AS (
          SELECT l.l_partkey, l.l_suppkey,
                 CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS pair_qty
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_name LIKE 'cold%'
            AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l.l_partkey, l.l_suppkey
        ),
        ptot AS (
          SELECT l_partkey, CAST(sum(pair_qty) AS BIGINT) AS total_qty
          FROM pair GROUP BY l_partkey
        )
        SELECT s.s_name, n.n_name, pr.l_partkey AS p_partkey,
               pr.pair_qty, t.total_qty
        FROM pair pr
        JOIN ptot t ON t.l_partkey = pr.l_partkey
        JOIN supplier s ON s.s_suppkey = pr.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE 2 * pr.pair_qty > t.total_qty
        ORDER BY s.s_name, p_partkey
    """,
)
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("cold%")).select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    pair = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("pair_qty"))
    )
    # per-part totals as a window over the pair agg: one fact scan
    # (groupBy + join-back would duplicate the pair subtree)
    return (
        pair.withColumn(
            "total_qty",
            F.sum("pair_qty").over(Window.partitionBy("l_partkey")),
        )
        .filter(F.lit(2) * F.col("pair_qty") > F.col("total_qty"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "pair_qty",
            "total_qty",
        )
        .orderBy("s_name", "p_partkey")
    )


@register(
    "q21_suppliers_kept_waiting",
    # Was driver=False for round 11 only (case 2, registry.py:39);
    # flipped per the register()-site note (VERDICT r11 ask #1).
    driver=True,
    bench=True,
    tags=("relational", "subquery", "exists", "anti", "agg"),
    doc="TPC-H Q21 shape on the trimmed schema (no receipt/commit "
    "dates — 'kept waiting' is l_shipdate > o_orderdate + 75 days): "
    "for finished ('F') orders with lines from at least TWO distinct "
    "suppliers where EXACTLY ONE supplier shipped late, charge that "
    "supplier one wait per late line; report per-supplier totals for "
    "EUROPE suppliers. The classic EXISTS + NOT-EXISTS pair over "
    "lineitem self-joins decorrelates to ONE per-order aggregate: "
    "both exact distinct counts (all suppliers / late suppliers) "
    "come from collect_set in a single agg pass — no two-distinct "
    "Expand, no second fact scan, and per-order sets are tiny (an "
    "order has a handful of lines) so partial aggregation stays "
    "map-side. The orders join and the groupBy share the l_orderkey "
    "partitioning, so the fact side shuffles ONCE; with exactly one "
    "distinct late supplier, max(late suppkey) IS that supplier. "
    "supplier⋈nation⋈region stays an unconditional broadcast "
    "(BROADCAST_DIMS policy, catalog.py:133).",
    oracle="""
        SELECT s.s_name, count(*) AS numwait
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
                     AND r.r_name = 'EUROPE'
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
                     AND o.o_orderstatus = 'F'
        WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_sup = (
        s.join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name")
    )
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS")
    ).cast("int")
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .groupBy("l_orderkey")
        .agg(
            F.size(F.collect_set("l_suppkey")).alias("n_sups"),
            F.size(
                F.collect_set(F.when(F.col("late") == 1, F.col("l_suppkey")))
            ).alias("n_late_sups"),
            F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("waiter"),
            F.sum("late").alias("n_late_lines"),
        )
        .filter((F.col("n_sups") >= 2) & (F.col("n_late_sups") == 1))
    )
    return (
        per_order.join(
            F.broadcast(euro_sup), F.col("s_suppkey") == F.col("waiter")
        )
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )

"""End-to-end pipeline compositions — SURVEY.md §3 re-expressed as
single declarative plans.

The reference's batch-ingest chain (§3.1: pages → chunk → embed →
extract → payload) and interactive RAG query (§3.2: embed query →
top-k → company filter → format) each become ONE DataFrame plan here:
bronze corpus → Arrow-batched stub embedding → cosine retrieval with
provenance, and silver extractions joined into a gold profile row.
Catalyst sees the whole pipeline, so pruning/pushdown cross stage
boundaries the reference crossed with JSON files on disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load
from project_orbit_spark.registry import register

# md5-byte stub embedding reproduced in SQL (dims 1-4 of inference.py's
# hash_embedding_provider)
_DUCK_EMBED4 = (
    "[CAST(('0x' || substring(md5({t}), 1, 2)) AS UBIGINT) / 256.0, "
    "CAST(('0x' || substring(md5({t}), 3, 2)) AS UBIGINT) / 256.0, "
    "CAST(('0x' || substring(md5({t}), 5, 2)) AS UBIGINT) / 256.0, "
    "CAST(('0x' || substring(md5({t}), 7, 2)) AS UBIGINT) / 256.0]"
)


@register(
    "rag_index_and_search",
    bench=True,
    tags=("pipeline", "similarity", "pandas_udf"),
    doc="§3.2 RAG pipeline as one plan: documents → 200-char chunks "
    "(C1) → Arrow-batched stub embeddings (E1, mapInPandas) → cosine "
    "against an enhanced query vector (E3) → top-10 with chunk "
    "provenance (W1+J4). The oracle reproduces the md5-byte embedding "
    "and the sequential-double cosine in SQL.",
    oracle=f"""
        WITH chunks AS (
          SELECT doc_id, i - 1 AS chunk_idx,
                 substring(text, (i - 1) * 200 + 1, 200) AS chunk_text
          FROM documents,
               UNNEST(range(1, greatest(CAST(ceil(length(text) / 200.0) AS BIGINT), 1) + 1))
                 AS t(i)
          WHERE doc_id < 200
        ),
        embedded AS (
          SELECT doc_id, chunk_idx,
                 {_DUCK_EMBED4.format(t="chunk_text")} AS emb
          FROM chunks
        ),
        qv AS (SELECT {_DUCK_EMBED4.format(t="'corpus spark stream query'")} AS qe)
        SELECT doc_id, chunk_idx, round(score, 6) AS score, rank
        FROM (
          SELECT e.doc_id, e.chunk_idx,
                 list_cosine_similarity(q.qe, e.emb) AS score,
                 row_number() OVER (
                   ORDER BY list_cosine_similarity(q.qe, e.emb) DESC,
                            e.doc_id, e.chunk_idx) AS rank
          FROM embedded e CROSS JOIN qv q
        ) t
        WHERE rank <= 10
        ORDER BY rank
    """,
)
def rag_index_and_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_orbit_spark.functions.inference import hash_embedding_provider
    from project_orbit_spark.functions.textbank import chunk_text
    from project_orbit_spark.similarity.cosine import cosine

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    chunks = d.select(
        "doc_id", F.explode(chunk_text(F.col("text"), 200)).alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
    )

    # provenance passes THROUGH the Arrow stage — no join to reattach
    # it afterwards (re-deriving chunks on both join sides costs a
    # shuffle and doubles the explode work)
    def embed_with_provenance():
        provider = hash_embedding_provider(4)

        def run(batches):
            import pandas as _pd

            for pdf in batches:
                yield _pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "chunk_idx": pdf["chunk_idx"],
                        "embedding": provider(pdf["chunk_text"]),
                    }
                )

        return run

    embedded = chunks.mapInPandas(
        embed_with_provenance(), "doc_id long, chunk_idx long, embedding array<double>"
    )

    # The query embedding is the SAME deterministic provider the chunk
    # stage uses, over one constant string — evaluate it driver-side
    # and inline the vector as a literal instead of shipping a 1-row
    # DataFrame through its own mapInPandas stage + broadcast join
    # (a full Python-worker round trip to hash 25 bytes).
    import pandas as pd

    [qvec] = hash_embedding_provider(4)(pd.Series(["corpus spark stream query"]))
    qe = F.array(*[F.lit(v) for v in qvec])

    scored = embedded.select(
        "doc_id",
        "chunk_idx",
        cosine(qe, F.col("embedding")).alias("score"),
    )
    # Distributed top-k: orderBy().limit() plans as TakeOrderedAndProject
    # (per-partition heap + driver merge of 10-row heads) instead of
    # funnelling every scored chunk through one task for a global
    # row_number window. The rank window that remains runs over the
    # already-collected 10 rows — a no-op at any scale.
    top = scored.orderBy(
        F.desc("score"), F.asc("doc_id"), F.asc("chunk_idx")
    ).limit(10)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"), F.asc("chunk_idx"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("doc_id", "chunk_idx", F.round("score", 6).alias("score"), "rank")
        .orderBy("rank")
    )


@register(
    "company_gold_profile",
    tags=("pipeline", "gold"),
    doc="§3.1 bronze→silver→gold composition: per customer, the "
    "extracted press funding facts (silver, C3/C7/C8 over the derived "
    "press corpus) joined to order-payload aggregates (J8) and the "
    "as-of latest order (J10) into one wide gold profile row.",
    oracle="""
        WITH press AS (
          SELECT o.o_custkey AS custkey,
                 round(sum(CAST(regexp_extract(
                   c.c_name || ' raised $' || CAST(round(o.o_totalprice / 1000, 1) AS VARCHAR) || 'M',
                   'raised \\$([0-9]+(?:\\.[0-9]+)?)M', 1) AS DOUBLE) * 1e6), 2)
                   AS total_extracted_usd,
                 count(*) AS n_press
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE o.o_orderkey % 50 = 0
          GROUP BY o.o_custkey
        ),
        payload AS (
          SELECT o_custkey, count(*) AS n_orders,
                 round(sum(o_totalprice), 2) AS lifetime_value,
                 arg_max(o_orderkey,
                         datediff('day', DATE '1970-01-01', o_orderdate) * 1000000
                           + o_orderkey) AS latest_orderkey
          FROM orders GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_name, c.c_mktsegment,
               coalesce(p.n_orders, 0) AS n_orders,
               p.lifetime_value, p.latest_orderkey,
               pr.total_extracted_usd,
               coalesce(pr.n_press, 0) AS n_press
        FROM customer c
        LEFT JOIN payload p ON p.o_custkey = c.c_custkey
        LEFT JOIN press pr  ON pr.custkey = c.c_custkey
        ORDER BY c.c_custkey
    """,
)
def company_gold_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")

    press = (
        o.filter(F.col("o_orderkey") % 50 == 0)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.regexp_extract(
                F.concat(
                    "c_name",
                    F.lit(" raised $"),
                    F.round(F.col("o_totalprice") / 1000, 1).cast("string"),
                    F.lit("M"),
                ),
                r"raised \$([0-9]+(?:\.[0-9]+)?)M",
                1,
            )
            .cast("double")
            .alias("amt_m"),
        )
        .groupBy("custkey")
        .agg(
            F.round(F.sum(F.col("amt_m") * 1e6), 2).alias("total_extracted_usd"),
            F.count(F.lit(1)).alias("n_press"),
        )
    )
    order_rank = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        * 1000000
        + F.col("o_orderkey")
    )
    payload = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("lifetime_value"),
        F.max_by("o_orderkey", order_rank).alias("latest_orderkey"),
    )
    return (
        c.join(payload, payload.o_custkey == c.c_custkey, "left")
        .join(press, press.custkey == c.c_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            "lifetime_value",
            "latest_orderkey",
            "total_extracted_usd",
            F.coalesce("n_press", F.lit(0)).alias("n_press"),
        )
        .orderBy("c_custkey")
    )

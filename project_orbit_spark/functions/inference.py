"""Pluggable inference stages — SURVEY.md §2.8 E1/E5/E6.

The reference calls OpenAI per chunk for embeddings
(src/services/embeddings.py:40-104, no batching) and Instructor-
validated LLM extraction with a pre-extracted-first fallback
(src/structured_extraction_v2.py:1978-2005, 2980-2988). The engine
makes both a *provider interface*: batched Arrow stages whose
default provider is deterministic (hash-embedder / regex-extractor)
so correctness never needs a network (SURVEY §7.3), while a real
provider drops in behind the same signature.

Scale notes: providers run inside mapInPandas closures — one Python
worker round-trip per Arrow batch (vs the reference's one network
call per chunk), lazy per-executor client init, retries inside the
UDF with spark.task.maxFailures as the outer loop.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load
from project_orbit_spark.registry import register

EMBED_DIM = 8  # stub dim; a real provider would use 1536/1024 (BASELINE.md)


def hash_embedding_provider(dim: int = EMBED_DIM) -> Callable[[pd.Series], pd.DataFrame]:
    """Deterministic E1 stand-in: pseudo-embedding from md5 bytes,
    values in [0, 1). Stable across engines/runs — used as the
    default provider and reproduced in SQL by the oracle."""
    import hashlib

    def embed(texts: pd.Series) -> list[list[float]]:
        out = []
        for t in texts:
            h = hashlib.md5((t or "").encode("utf-8")).digest()
            out.append([h[i] / 256.0 for i in range(dim)])
        return out

    return embed


def embed_stage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = EMBED_DIM,
    provider: Callable | None = None,
) -> DataFrame:
    """E1 embedding stage: Arrow-batched mapInPandas; provider
    pluggable (network providers add retry/backoff inside the
    closure). Emits (id, embedding array<double>)."""
    provider = provider or hash_embedding_provider(dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame({id_col: pdf[id_col], "embedding": provider(pdf[text_col])})

    return df.select(id_col, text_col).mapInPandas(run, f"{id_col} long, embedding array<double>")


@register(
    "embed_documents_stub",
    tags=("inference", "pandas_udf"),
    doc="E1 embedding stage with the deterministic hash provider "
    "(ref per-chunk embed calls src/services/embeddings.py:40-104, "
    "re-done as Arrow batches): md5-byte pseudo-embeddings, first "
    "3 dims + norm exposed for the oracle (SQL reproduces the byte "
    "math; list output stays in the engine).",
    oracle="""
        SELECT doc_id,
               round(CAST(('0x' || substring(md5(text), 1, 2)) AS UBIGINT) / 256.0, 6) AS d0,
               round(CAST(('0x' || substring(md5(text), 3, 2)) AS UBIGINT) / 256.0, 6) AS d1,
               round(CAST(('0x' || substring(md5(text), 5, 2)) AS UBIGINT) / 256.0, 6) AS d2
        FROM documents
        ORDER BY doc_id
    """,
)
def embed_documents_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    emb = embed_stage(d)
    return emb.select(
        "doc_id",
        F.round(F.element_at("embedding", 1), 6).alias("d0"),
        F.round(F.element_at("embedding", 2), 6).alias("d1"),
        F.round(F.element_at("embedding", 3), 6).alias("d2"),
    ).orderBy("doc_id")


def regex_extraction_provider() -> Callable[[pd.Series], pd.DataFrame]:
    """Deterministic E5 stand-in: the reference's own fallback duality
    (pre-extracted regex first, LLM second — src/structured_
    extraction_v2.py:1978-2005). Extracts funding events from press
    text; a real LLM provider returns the same record shape."""
    import re

    amt = re.compile(r"raised \$([0-9]+(?:\.[0-9]+)?)M")
    rnd = re.compile(r"(Series [A-Z]|Seed|seed)")

    def extract(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            m, r = amt.search(t or ""), rnd.search(t or "")
            rows.append(
                {
                    "amount_usd": float(m.group(1)) * 1e6 if m else None,
                    "round_name": r.group(1) if r else None,
                    "valid": bool(m and r),
                }
            )
        return pd.DataFrame(rows)

    return extract


def llm_extract_stage(df: DataFrame, text_col: str, id_col: str, provider: Callable | None = None) -> DataFrame:
    """E5 structured-extraction stage: Arrow-batched, schema-validated
    (bad rows flagged, not dropped — the reference's skip-and-continue
    at src/structured_extraction_v2.py:2300-2302)."""
    provider = provider or regex_extraction_provider()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = provider(pdf[text_col])
            out.insert(0, id_col, pdf[id_col].values)
            yield _pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, amount_usd double, round_name string, valid boolean"
    )


@register(
    "llm_extract_funding_stub",
    tags=("inference", "pandas_udf"),
    doc="E5 LLM structured extraction with the deterministic regex "
    "provider over the derived press corpus (ref Instructor retries "
    "src/structured_extraction_v2.py:2980-2988; fallback duality "
    ":1978-2005): schema-validated funding records, invalid rows "
    "flagged not dropped.",
    oracle="""
        WITH press AS (
          SELECT o.o_orderkey AS press_id, o.o_custkey AS custkey,
                 c.c_name || ' raised $' || CAST(round(o.o_totalprice / 1000, 1) AS VARCHAR)
                 || 'M in '
                 || ['Seed','Series A','Series B','Series C'][(o.o_orderkey % 4 + 1)::INT]
                 || ' funding on '
                 || CASE WHEN o.o_orderkey % 3 = 0 THEN strftime(o.o_orderdate, '%Y-%m-%d')
                         WHEN o.o_orderkey % 3 = 1 THEN strftime(o.o_orderdate, '%B %-d, %Y')
                         ELSE strftime(o.o_orderdate, '%m/%d/%Y') END
                 || '. The round was led by '
                 || ['Alpha Capital','Beta Ventures','Gamma Partners','Delta Fund',
                     'Epsilon Labs'][(o.o_orderkey % 5 + 1)::INT]
                 || '. The company has ' || CAST(o.o_custkey % 950 + 50 AS VARCHAR)
                 || ' employees and was founded in ' || CAST(o.o_custkey % 24 + 2000 AS VARCHAR)
                 || '. It is valued at $' || CAST(round(o.o_totalprice / 100000, 2) AS VARCHAR)
                 || ' billion.' AS press_text
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE o.o_orderkey % 50 = 0
        )
        SELECT press_id,
               round(CAST(regexp_extract(press_text,
                 'raised \\$([0-9]+(?:\\.[0-9]+)?)M', 1) AS DOUBLE) * 1e6, 2) AS amount_usd,
               regexp_extract(press_text, '(Series [A-Z]|Seed|seed)', 1) AS round_name,
               CAST(regexp_extract(press_text, 'raised \\$([0-9]+(?:\\.[0-9]+)?)M', 1) != ''
                    AND regexp_extract(press_text, '(Series [A-Z]|Seed|seed)', 1) != ''
                    AS BOOLEAN) AS valid
        FROM press
        ORDER BY press_id
    """,
)
def llm_extract_funding_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_orbit_spark.functions.extraction import press_corpus

    p = press_corpus(spark, sf_dir)
    out = llm_extract_stage(p, "press_text", "press_id")
    return out.select(
        "press_id",
        F.round("amount_usd", 2).alias("amount_usd"),
        "round_name",
        "valid",
    ).orderBy("press_id")


def with_retries(
    fn: Callable,
    max_retries: int = 5,
    base_delay: float = 0.2,
    max_delay: float = 30.0,
    sleep: Callable[[float], None] | None = None,
):
    """E1 retry policy (ref exp backoff src/services/embeddings.py:
    40-104; constants documented in BASELINE.md): exponential backoff
    with jitter around a provider call. Wrap the provider INSIDE the
    Arrow closure so retries happen executor-side per batch;
    spark.task.maxFailures remains the outer loop.

    ``sleep`` is injectable for tests; jitter derives from the attempt
    count (deterministic — no wall-clock randomness in the engine).
    """
    import time as _time

    do_sleep = sleep if sleep is not None else _time.sleep

    def call(*args, **kwargs):
        last_exc: Exception | None = None
        for attempt in range(max_retries + 1):
            try:
                return fn(*args, **kwargs)
            except Exception as exc:  # noqa: BLE001 — provider errors are opaque
                last_exc = exc
                if attempt == max_retries:
                    break
                delay = min(base_delay * (2**attempt), max_delay)
                # deterministic jitter in [0, delay/4) from the attempt
                jitter = (attempt * 2654435761 % 1000) / 1000.0 * delay / 4
                do_sleep(delay + jitter)
        raise last_exc  # type: ignore[misc]

    return call

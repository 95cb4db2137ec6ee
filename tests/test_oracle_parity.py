"""Golden-output tests: every registered query vs its DuckDB oracle
at sf0.001 (the driver repeats this at sf0.01). Mirrors the driver's
compare: row count + dtypes + order-insensitive value equality."""

from __future__ import annotations

import pandas as pd
import pytest

from project_orbit_spark import registry
from tests.conftest import SF_DIR


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(repr)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


QUERIES = sorted(registry.all_queries().items())


@pytest.mark.parametrize("name,q", QUERIES, ids=[n for n, _ in QUERIES])
def test_query_matches_oracle(name, q, spark, duck):
    spark_pdf = q.fn(spark, SF_DIR).toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only contract: must execute
        return
    duck_pdf = duck.execute(q.oracle).fetchdf()
    assert len(spark_pdf) == len(duck_pdf), "row count mismatch"
    assert {c: str(t) for c, t in spark_pdf.dtypes.items()} == {
        c: str(t) for c, t in duck_pdf.dtypes.items()
    }, "schema mismatch"
    a, b = canon(spark_pdf), canon(duck_pdf)
    pd.testing.assert_frame_equal(a, b)

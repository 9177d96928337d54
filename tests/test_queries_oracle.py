"""Oracle-differential test over EVERY registered query that declares an
oracle — the same gate the driver runs (SURVEY.md §5.2-1)."""

from __future__ import annotations

import pytest

from dask_lambda_example_spark.registry import QUERIES, _ensure_loaded

from .oracle_check import compare

_ensure_loaded()

WITH_ORACLE = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(name, spark, duck, sf_dir):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    compare(df, duck, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert rows[0][0] is not None


def test_contract_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 1

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``dask_lambda_example_spark``; queries register
themselves in ``dask_lambda_example_spark.registry`` with their DuckDB
oracle SQL alongside the PySpark implementation.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dask_lambda_example_spark.registry import (  # noqa: E402
    oracle_queries,
    spark_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference ``dask_processing.py:29-33`` semantics)
    on /root/testdata/sf0.001; driver checks rows>0."""
    from dask_lambda_example_spark.operators.relational import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; non-SQL-expressible ops omitted
    (driver records a rows-only check for those)."""
    return oracle_queries()

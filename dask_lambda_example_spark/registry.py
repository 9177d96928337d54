"""Central query registry — the correctness contract.

Every operator implemented from SURVEY.md §2 registers here as a named
query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) the equivalent ANSI SQL for the DuckDB oracle. The
driver runs both sides at sf0.01 and compares row count + schema +
order-insensitive value hash (``/root/repo/__spark_entry__.py``).

Float discipline (SURVEY.md §5.2-4): aggregate outputs are rounded to 6
decimals on BOTH sides and every computed column carries the same alias
in both dialects — the driver sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL, or None → driver rows-only check
    doc: str


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register ``fn`` as a named query with its oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                  doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def spark_queries() -> dict[str, SparkQuery]:
    _ensure_loaded()
    return {n: s.fn for n, s in QUERIES.items()}


def oracle_queries() -> dict[str, str]:
    _ensure_loaded()
    return {n: s.oracle for n, s in QUERIES.items() if s.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import dask_lambda_example_spark.operators.relational  # noqa: F401
    import dask_lambda_example_spark.operators.aggregates  # noqa: F401
    import dask_lambda_example_spark.operators.joins  # noqa: F401
    import dask_lambda_example_spark.operators.scalar_functions  # noqa: F401
    import dask_lambda_example_spark.operators.windows  # noqa: F401
    import dask_lambda_example_spark.operators.timeseries  # noqa: F401
    import dask_lambda_example_spark.operators.setops  # noqa: F401
    import dask_lambda_example_spark.operators.subqueries  # noqa: F401
    import dask_lambda_example_spark.operators.tpch_extra  # noqa: F401
    import dask_lambda_example_spark.operators.tpch_extra2  # noqa: F401
    import dask_lambda_example_spark.operators.skew  # noqa: F401
    import dask_lambda_example_spark.operators.events_analytics  # noqa: F401
    import dask_lambda_example_spark.operators.dedup  # noqa: F401
    import dask_lambda_example_spark.operators.similarity  # noqa: F401
    import dask_lambda_example_spark.operators.text  # noqa: F401
    import dask_lambda_example_spark.operators.multimodal  # noqa: F401
    import dask_lambda_example_spark.operators.udf_surface  # noqa: F401
    import dask_lambda_example_spark.sources.synthetic  # noqa: F401
    import dask_lambda_example_spark.sources.formats  # noqa: F401
    import dask_lambda_example_spark.streaming.pipeline  # noqa: F401
    _LOADED = True

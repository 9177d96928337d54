"""PySpark-native analytics engine with the query/data-processing
capabilities of ``coiled/dask-lambda-example`` (reference at
``/root/reference``), re-expressed Spark-first.

The reference is an event-driven serverless Dask pipeline whose whole
analytical payload is ``timeseries.groupby("name").mean().y.std()``
(``layer/python/dask_processing.py:29-33``) plus the surrounding
ingestion/lifecycle plumbing. This package maps that surface — and the
full ``dask.dataframe`` capability tier it is a harness for (SURVEY.md
§2) — onto the Spark DataFrame/SQL/Catalyst/Structured-Streaming stack:

- ``session``   — UTC-pinned, AQE-enabled SparkSession factory
- ``io``        — table loaders for the driver parquet tables
- ``sources``   — synthetic timeseries + producer-shaped JSON ingestion
- ``operators`` — relational / window / time-series / dedup / similarity
                  / text-analysis operators, each registered as a named
                  query with a DuckDB oracle
- ``streaming`` — Structured Streaming pipelines (file source,
  watermarks, windowed aggs, foreachBatch sinks)
- ``functions`` — reusable column expressions (vector math, text stats)
- ``plans``     — plan-inspection helpers (pushdown/broadcast asserts)

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

import os as _os
from pathlib import Path as _Path

# Spark's Python workers are separate processes: anything cloudpickled
# by reference (module-level fns used in mapInPandas/pandas_udf) must be
# importable there. Exporting PYTHONPATH before the JVM launches makes
# the package importable on every local worker regardless of the
# driver's cwd (the driver contract runs from a neutral cwd).
_repo_root = str(_Path(__file__).resolve().parents[1])
_pp = _os.environ.get("PYTHONPATH", "")
if _repo_root not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = _repo_root + (_os.pathsep + _pp if _pp else "")

from dask_lambda_example_spark.session import get_spark  # noqa: E402,F401
from dask_lambda_example_spark.registry import QUERIES, query  # noqa: F401

__version__ = "0.1.0"

"""Reusable column-expression libraries (vector math, hashing)."""

from dask_lambda_example_spark.functions.vector import (  # noqa: F401
    as_double,
    cosine,
    dot,
    l2dist,
    l2norm,
    sign_lsh_bucket,
)

"""Vector column expressions over ``array<float/double>`` embeddings —
the reusable JVM-side toolkit behind the similarity and embedding-dedup
operators (SURVEY.md §2.C).

All of these are higher-order-function expressions (``zip_with`` +
in-order ``aggregate`` fold over doubles): whole-stage codegen, no
Python in the hot path, and bit-identical to DuckDB's sequential
``list_dot_product`` — which is what makes value-hash oracle parity
possible for floating-point similarity scores.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec) -> Column:
    """Cast an array<float> embedding to array<double> once, up front —
    doing arithmetic in float32 then comparing to a double oracle loses
    parity; doing the cast per-operation loses codegen CSE."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(u: Column, v: Column) -> Column:
    """In-order left fold — same summation order as DuckDB's
    ``list_dot_product`` (double addition is order-sensitive)."""
    return F.aggregate(F.zip_with(u, v, lambda p, q: p * q),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2norm(u: Column) -> Column:
    return F.sqrt(dot(u, u))


def cosine(u: Column, v: Column) -> Column:
    return dot(u, v) / (l2norm(u) * l2norm(v))


def cosine_pair(u: Column, v: Column, nrm_u: Column, nrm_v: Column) -> Column:
    """Cosine for pair joins with the norms HOISTED to per-vector
    columns computed before the join.  Arithmetic is bit-identical to
    ``cosine`` (same fold, same order, same sqrt — the norm columns
    must be ``l2norm`` of the same arrays), but each interpreted
    HOF-fold norm runs once per input row instead of twice per emitted
    pair — the dominant cost in a blocked similarity self-join, where
    pairs outnumber rows by the bucket size."""
    return dot(u, v) / (nrm_u * nrm_v)


def l2dist(u: Column, v: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.zip_with(u, v, lambda p, q: (p - q) * (p - q)),
        F.lit(0.0), lambda acc, x: acc + x))


def sign_lsh_bucket(vec, n_bits: int) -> Column:
    """Axis-aligned random-hyperplane LSH bucket: the sign pattern of
    the first ``n_bits`` dimensions as a bit-string. An equi-joinable
    blocking key — the candidate generator that keeps similarity joins
    off the O(n²) path."""
    return F.concat(*[
        F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ])

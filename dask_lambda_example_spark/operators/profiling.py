"""Dataset profiling: the one-pass per-column statistics card every
corpus release ships with (null fractions, distinct counts, value
ranges) — the "dataset card" numbers for a training-data cut.

No reference analog (north-star extension tier; the anchor is the
reference's arbitrary-dataframe-compute contract). Spark's own
``df.summary()`` is driver-convenience output; this operator produces
the same information as a first-class DataFrame so it can be joined,
stored, and diffed between corpus versions.

Scale posture (100 TB): ALL measures are computed in ONE aggregation
pass over the table — one scan, map-side partial aggregation, a
single-row result that is then unpivoted driver-free via ``stack``.
The two exact ``count(DISTINCT)`` columns are low-cardinality
(lang, source); NDV of the wide ``text`` column is deliberately NOT
computed exactly — at scale that is the HLL sketch's job
(``agg_approx_sketches``), and an exact text-NDV would shuffle the
full text payload. Min/max on ``text`` compare binary, the default
collation in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_lambda_example_spark.io import load_table
from dask_lambda_example_spark.registry import query


def _col_sql(c: str, ndv: bool) -> str:
    return f"""
    SELECT '{c}' AS col_name,
           count(*) - count({c}) AS n_null,
           CAST(round((count(*) - count({c})) * 1.0 / count(*), 6) AS REAL)
               AS null_frac,
           {f'count(DISTINCT {c})' if ndv else 'CAST(NULL AS BIGINT)'}
               AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_val,
           CAST(max({c}) AS VARCHAR) AS max_val
    FROM documents"""


@query(
    "profile_dataset_card",
    oracle=" UNION ALL ".join(
        _col_sql(c, ndv) for c, ndv in
        [("doc_id", True), ("text", False), ("lang", True),
         ("source", True), ("n_chars", False)]),
)
def profile_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of ``documents`` as one row per column:
    null count/fraction, exact NDV where cardinality allows it
    (doc_id, lang, source), and stringified min/max. One aggregation
    pass; the single wide result row unpivots to rows via ``stack``
    (an Expand projection — no second scan, no driver loop)."""
    d = load_table(spark, sf_dir, "documents")
    cols = [("doc_id", True), ("text", False), ("lang", True),
            ("source", True), ("n_chars", False)]
    aggs = [F.count("*").alias("n_rows")]
    for c, ndv in cols:
        aggs += [
            F.count(c).alias(f"{c}__cnt"),
            (F.countDistinct(c) if ndv
             else F.lit(None).cast("bigint")).alias(f"{c}__ndv"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = d.agg(*aggs)
    stack_args = []
    for c, _ in cols:
        stack_args += [
            F.lit(c),
            (F.col("n_rows") - F.col(f"{c}__cnt")),
            F.round((F.col("n_rows") - F.col(f"{c}__cnt"))
                    / F.col("n_rows"), 6).cast("float"),
            F.col(f"{c}__ndv"), F.col(f"{c}__min"), F.col(f"{c}__max"),
        ]
    return one.select(
        F.stack(F.lit(len(cols)), *stack_args)
        .alias("col_name", "n_null", "null_frac", "n_distinct",
               "min_val", "max_val"))

"""Core relational operators: the flagship aggregation chain plus
projection / filter / predicate queries (SURVEY.md §2.A A4-A8, §2.B).

The flagship re-expresses the reference's entire analytical payload —
``timeseries.groupby("name").mean().y.std().compute()``
(``layer/python/dask_processing.py:29-33``) — on the driver's ``events``
table: ``user_id`` stands in for ``name`` (grouping key), ``value`` for
``y`` (measure). Same shape: partial+final hash aggregate, then a
single-row scalar reduction.

Scale posture: the groupBy shuffles once on the grouping key with
map-side partial aggregation; the second aggregate reduces ~|keys| rows
— trivially small at any SF. Filters/projections push to the parquet
scan (verified in tests via ``explain``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_lambda_example_spark.io import load_table
from dask_lambda_example_spark.registry import query


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby-mean → std, the reference's one real computation
    (``layer/python/dask_processing.py:32``). dask ``.std()`` is sample
    std (ddof=1) → ``stddev_samp`` (SURVEY.md §2.A A7 parity pitfall).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.avg("value").alias("y"))
        .agg(F.round(F.stddev_samp("y"), 6).alias("y_std"))
    )


query(
    "flagship_groupby_mean_std",
    oracle="""
    SELECT round(stddev_samp(y), 6) AS y_std
    FROM (SELECT avg(value) AS y FROM events GROUP BY user_id)
    """,
)(flagship)


@query(
    "project_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 6) AS revenue
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 20
    """,
)
def project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + conjunctive predicate; both reach the parquet scan
    (dask ``df[df.x > 0][cols]`` → Catalyst pushdown, SURVEY.md §2.B).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_quantity") > 20))
        .select(
            "l_orderkey", "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
            .alias("revenue"),
        )
    )


@query(
    "filter_isin_between",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 6) AS total
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_totalprice BETWEEN 1000 AND 50000
    """,
)
def filter_isin_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``isin`` + ``between`` predicates (dask ``Series.isin/between``)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("F", "P")
                 & F.col("o_totalprice").between(1000, 50000))
        .select("o_orderkey", "o_orderstatus",
                F.round("o_totalprice", 6).alias("total"))
    )


@query(
    "cast_rename_assign",
    oracle="""
    SELECT CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS okey_str,
           round(l_tax + l_discount, 6) AS t_plus_d,
           l_linenumber AS line_no
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def cast_rename_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``astype`` / ``rename`` / ``assign`` → cast / alias / withColumn."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_linenumber") <= 2)
        .withColumn("t_plus_d", F.round(F.col("l_tax") + F.col("l_discount"), 6))
        .withColumnRenamed("l_linenumber", "line_no")
        .select(
            F.col("l_quantity").cast("bigint").alias("qty_int"),
            F.col("l_orderkey").cast("string").alias("okey_str"),
            "t_plus_d", "line_no",
        )
    )


@query(
    "null_handling_fill_drop",
    oracle="""
    SELECT event_id,
           coalesce(nullif(event_type, 'error'), 'unknown') AS etype,
           round(CASE WHEN value IS NULL THEN 0.0 ELSE value END, 6) AS v
    FROM events
    WHERE ts IS NOT NULL
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``fillna``/``dropna``/``mask`` → coalesce/nullif/when (dask
    ``DataFrameNaFunctions`` surface, SURVEY.md §2.B)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("ts").isNotNull())
        .select(
            "event_id",
            F.coalesce(F.nullif(F.col("event_type"), F.lit("error")),
                       F.lit("unknown")).alias("etype"),
            F.round(F.when(F.col("value").isNull(), 0.0)
                    .otherwise(F.col("value")), 6).alias("v"),
        )
    )


@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 6) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nlargest(k)`` → orderBy+limit → TakeOrderedAndProject: no global
    sort materialization, per-partition top-k then merge — the only
    scale-safe global top-k. Tie-broken on the key for determinism.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 6).alias("total"))
    )


# ---------------------------------------------------------------------------
# melt / unpivot (wide → long reshape)
# ---------------------------------------------------------------------------

MELT_METRICS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "reshape_melt_unpivot",
    oracle="\n    UNION ALL\n".join(
        f"""SELECT l_orderkey, l_linenumber, '{m}' AS metric,
           {m} AS value FROM lineitem WHERE l_orderkey % 50 = 0"""
        for m in MELT_METRICS
    ),
)
def reshape_melt_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (dask/pandas ``melt``): the four lineitem
    measures unpivoted into (id, metric, value) rows via the native
    ``DataFrame.unpivot`` — Catalyst's Expand node, which emits
    n_metrics rows per input row in a single projection pass: no
    shuffle, no join, no UDF, and the row-count multiplier is a
    constant (4×) independent of data size. The id-key filter pushes
    down to the scan BELOW the Expand (predicate on an id column, not
    a melted value), so the scan reads 1/50 of the table.

    Values are passed through untouched (all four measures are already
    double) — bit parity with the oracle's UNION ALL formulation is
    exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 50 == 0)
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            list(MELT_METRICS),
            "metric",
            "value",
        )
    )


LANGS = ("de", "en", "es", "fr", "zh")


@query(
    "fn_one_hot_encode",
    oracle=f"""
    SELECT doc_id,
           {", ".join(f"CAST(lang = '{lg}' AS INT) AS lang_{lg}"
                      for lg in LANGS)}
    FROM documents
    """,
)
def fn_one_hot_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``get_dummies`` analog (dask.dataframe API parity): one-hot the
    bounded-cardinality ``lang`` column into indicator columns. Pure
    projection — shuffle-free, codegen'd CASE expressions; the category
    set is pinned up front (at scale you derive it once from a
    dictionary scan, never per-row). MLlib's ``OneHotEncoder`` emits
    sparse vectors instead; indicator columns are the dataframe-native
    shape."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        *[(F.col("lang") == lg).cast("int").alias(f"lang_{lg}")
          for lg in LANGS])

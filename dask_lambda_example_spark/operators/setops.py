"""Set operations (SURVEY.md §2.B "Set operations").

dask only has ``concat`` (+ dedup tricks); Spark is a superset with
native UNION/INTERSECT/EXCEPT in both ALL and DISTINCT forms. Bag
semantics (ALL variants) are covered explicitly because they're the
ones dask's concat actually matches.

Scale posture: unionAll is a zero-shuffle concatenation of partitions;
the DISTINCT/INTERSECT/EXCEPT variants cost one hash-shuffle on the
full row — kept to narrow projections here, the rule to follow at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_lambda_example_spark.io import load_table
from dask_lambda_example_spark.registry import query


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))


@query(
    "setop_union_all",
    oracle="""
    SELECT okey, src FROM (
        SELECT o_orderkey AS okey, 'fulfilled' AS src FROM orders
        WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_orderkey AS okey, 'pending' AS src FROM orders
        WHERE o_orderstatus = 'P'
    )
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dask ``dd.concat`` → unionByName (bag semantics, no shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("okey"), F.lit("fulfilled").alias("src"))
    b = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_orderkey").alias("okey"), F.lit("pending").alias("src"))
    return a.unionByName(b)


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat + drop_duplicates → union().distinct()."""
    return _cust_nations(spark, sf_dir).union(
        _supp_nations(spark, sf_dir)).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with both customers and suppliers (set semantics)."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no suppliers (set difference —
    ``subtract`` is EXCEPT DISTINCT; ``exceptAll`` would be bag
    difference and keep keys present on both sides)."""
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


@query(
    "setop_intersect_all",
    oracle="""
    SELECT l_orderkey AS okey FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_orderkey AS okey FROM lineitem WHERE l_linestatus = 'F'
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (multiplicity = min of the two sides)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_orderkey").alias("okey"))
    b = li.filter(F.col("l_linestatus") == "F").select(
        F.col("l_orderkey").alias("okey"))
    return a.intersectAll(b)


@query(
    "setop_except_all",
    oracle="""
    SELECT l_orderkey AS okey FROM lineitem WHERE l_linestatus = 'F'
    EXCEPT ALL
    SELECT l_orderkey AS okey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (multiplicity-aware)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linestatus") == "F").select(
        F.col("l_orderkey").alias("okey"))
    b = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_orderkey").alias("okey"))
    return a.exceptAll(b)

"""Additional TPC-H-analog queries (Q6/Q10/Q14/Q18/Q19 shapes adapted
to the driver's star schema — no partsupp table; ``l_suppkey`` is the
part-supplier link).

These widen the relational battery (SURVEY.md §2.B) with the classic
plan shapes: filter-only scan aggregation (Q6), multi-way join with
top-k (Q10), conditional aggregation over a join (Q14), group-having
membership subquery (Q18), disjunctive join predicates (Q19).

Each query's Spark side is the DataFrame API (the SQL dialect surface is
covered by ``subqueries.py``); the oracle is the matching ANSI SQL.

Scale notes per query in the docstrings; the common rules: filters push
to the scan, dims broadcast, aggregations combine map-side, top-k is
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_lambda_example_spark.io import load_table
from dask_lambda_example_spark.registry import query


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: filter-only scan + global aggregate — the pure
    pushdown benchmark. All four predicates reach the parquet reader
    (row-group skipping); the aggregate is a single partial+final
    reduction, no shuffle of data rows at all."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6)
             .alias("revenue"),
             F.count("*").alias("n_lines"))
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
           round(c.c_acctbal, 6) AS acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking of customers who returned
    items. Customer (small) broadcasts onto the orders⋈lineitem join;
    the returnflag and date filters push below the joins; final top-20
    is TakeOrderedAndProject with a deterministic tie-break."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1996-01-01")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    return (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6)
             .alias("revenue"))
        .select("c_custkey", "c_name", "revenue",
                F.round("c_acctbal", 6).alias("acctbal"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1996-07-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo share of revenue — conditional aggregation over
    a fact⋈dim join. Part broadcasts; the CASE folds into the aggregate
    so one pass computes both numerator and denominator."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-07-01"))
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_pct"))
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           round(o.o_totalprice, 6) AS totalprice,
           round(sum(l.l_quantity), 6) AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
    GROUP BY o.o_orderkey, o.o_custkey, o.o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    — a group-having membership subquery. The inner aggregate reuses the
    same l_orderkey partitioning as the join (one shuffle serves both);
    Catalyst plans the IN as a left-semi join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
           .filter(F.col("q") > 150).select("l_orderkey"))
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 6).alias("total_qty"))
        .select("o_orderkey", "o_custkey",
                F.round("o_totalprice", 6).alias("totalprice"), "total_qty")
    )


@query(
    "q19_disjunctive_join",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
    """,
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive predicates across
    both join sides. The equi-key still drives a broadcast hash join;
    Catalyst extracts the per-side common filter residues from the OR
    where possible and evaluates the rest post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond1 = ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
             & F.col("l_quantity").between(1, 20))
    cond2 = ((F.col("p_brand") == "Brand#9") & F.col("p_size").between(10, 30)
             & F.col("l_quantity").between(10, 35))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond1 | cond2)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6)
             .alias("revenue"),
             F.count("*").alias("n_lines"))
    )

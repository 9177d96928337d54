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
    d = load_table(spark, sf_dir, "documents", parallel=True)
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


@query(
    "profile_corpus_drift_kl",
    oracle="""
    WITH a AS (SELECT lang, count(*) AS na FROM documents
               WHERE doc_id % 2 = 0 GROUP BY lang),
    b AS (SELECT lang, count(*) AS nb FROM documents
          WHERE doc_id % 2 = 1 GROUP BY lang),
    ta AS (SELECT sum(na) AS s FROM a), tb AS (SELECT sum(nb) AS s FROM b)
    SELECT a.lang,
           CAST(round(a.na * 1.0 / ta.s, 6) AS REAL) AS share_a,
           CAST(round(b.nb * 1.0 / tb.s, 6) AS REAL) AS share_b,
           CAST(round((a.na * 1.0 / ta.s)
                      * ln((a.na * 1.0 / ta.s) / (b.nb * 1.0 / tb.s)),
                      6) AS REAL) AS kl_term
    FROM a JOIN b ON a.lang = b.lang, ta, tb
    """,
)
def profile_corpus_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two corpus cuts (here: the two
    deterministic halves of ``documents``): per-language shares in each
    cut and the pointwise KL(A‖B) contribution — the drift monitor a
    recrawl pipeline runs before swapping training mixes. Two
    language-keyed aggregations (map-side combine to |langs| rows) and
    broadcast scalar totals; nothing corpus-sized ever joins or sorts.
    Float discipline: shares and KL terms round(·,6)→float32 on both
    sides (ln is libm-adjacent but the rounding margin was verified)."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    a = (d.filter(F.col("doc_id") % 2 == 0)
         .groupBy("lang").agg(F.count("*").alias("na")))
    b = (d.filter(F.col("doc_id") % 2 == 1)
         .groupBy("lang").agg(F.count("*").alias("nb")))
    ta = a.agg(F.sum("na").alias("sa"))
    tb = b.agg(F.sum("nb").alias("sb"))
    share_a = F.col("na") / F.col("sa")
    share_b = F.col("nb") / F.col("sb")
    return (
        a.join(b, "lang")
        .crossJoin(F.broadcast(ta)).crossJoin(F.broadcast(tb))
        .select(
            "lang",
            F.round(share_a, 6).cast("float").alias("share_a"),
            F.round(share_b, 6).cast("float").alias("share_b"),
            F.round(share_a * F.log(share_a / share_b), 6).cast("float")
            .alias("kl_term"),
        )
    )


@query(
    "dq_constraint_suite",
    oracle="""
    SELECT 'orders_pk_unique' AS constraint, 
           CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
                AS BIGINT) AS violations
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'discount_in_unit_range',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
    UNION ALL
    SELECT 'custkey_not_null',
           CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL)
                AS BIGINT)
    UNION ALL
    SELECT 'status_in_domain',
           CAST((SELECT count(*) FROM orders
                 WHERE o_orderstatus NOT IN ('O','F','P')) AS BIGINT)
    """,
)
def dq_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint suite (the deequ/dbt-test
    shape): uniqueness, referential integrity, range, non-null, and
    domain constraints evaluated in one job, one row per constraint
    with its violation count — the gate a corpus build runs before
    publishing a cut. Each check is expressed as the aggregate its
    plan class wants: the FK check is a LEFT ANTI join (no pair
    explosion), uniqueness is count vs distinct-count in one pass,
    the rest are filter-counts that push down to the scan."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pk = o.agg((F.count("*") - F.countDistinct("o_orderkey"))
               .alias("violations"))
    fk = (li.join(o.select("o_orderkey"),
                  li.l_orderkey == o.o_orderkey, "left_anti")
          .agg(F.count("*").alias("violations")))
    rng = (li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1))
           .agg(F.count("*").alias("violations")))
    nn = (o.filter(F.col("o_custkey").isNull())
          .agg(F.count("*").alias("violations")))
    dom = (o.filter(~F.col("o_orderstatus").isin("O", "F", "P"))
           .agg(F.count("*").alias("violations")))
    checks = [("orders_pk_unique", pk), ("lineitem_fk_orders", fk),
              ("discount_in_unit_range", rng), ("custkey_not_null", nn),
              ("status_in_domain", dom)]
    out = None
    for name, df in checks:
        row = df.select(F.lit(name).alias("constraint"), "violations")
        out = row if out is None else out.unionByName(row)
    return out

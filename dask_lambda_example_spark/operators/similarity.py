"""Similarity search over the ``embeddings`` table (SURVEY.md §2.C):
vector math battery, exact brute-force cosine top-k, threshold
similarity join, sign-LSH bucketed ANN, and an MLlib
BucketedRandomProjectionLSH variant.

North-star extension tier (BASELINE.json ``north_star``); the reference
itself has no vector ops — the anchor is its arbitrary-dataframe-compute
contract (``layer/python/dask_processing.py:26-27``).

Design notes (100 TB posture):

- Cosine/dot are JVM-side higher-order-function expressions
  (``zip_with`` + in-order ``aggregate`` fold over doubles) — whole-stage
  codegen, no Python, and bit-identical to DuckDB's sequential
  ``list_dot_product``, which is what makes value-hash parity possible.
- Brute-force top-k broadcasts the (small) probe side; the corpus side
  streams — no shuffle of the corpus. That is the right plan shape at
  any corpus size as long as the probe set fits in memory.
- The ANN variant prunes by an LSH bucket equi-join (axis-sign
  hyperplanes) so candidate generation is shuffle-bounded; the oracle
  replicates the identical bucketing, so recall loss is part of the
  checked contract, not hand-waved.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dask_lambda_example_spark.functions.vector import (
    as_double, cosine, cosine_pair, dot, l2dist, l2norm, sign_lsh_bucket)
from dask_lambda_example_spark.io import load_table
from dask_lambda_example_spark.registry import query

# ---------------------------------------------------------------------------
# vector expression toolkit (JVM HOFs, no UDFs)
# ---------------------------------------------------------------------------


DOT_SQL = "list_dot_product({a}, {b})"

# Constant Column-expression trees memoized per live SparkContext
# (optimization round 14, measured): py4j construction of the ~3,000-op
# PQ encode array costs 1.5-2.3 s of pure driver-side Python PER BUILD
# (the JVM work — analysis — is ~0.1 s), and the same three trees are
# rebuilt by every query in the 13-query PQ/IVF family. The trees are
# constants over fixed column names, and pyspark Columns wrap immutable
# Catalyst expressions, so one build per JVM serves every plan. Keyed
# on the active SparkContext so a restarted JVM rebuilds instead of
# dereferencing stale j-expressions.
_EXPR_CACHE: dict = {}


def _cached_expr(key: str, build) -> Column:
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    k = (key, id(sc))
    col = _EXPR_CACHE.get(k)
    if col is None:
        col = build()
        _EXPR_CACHE[k] = col
    return col


def _cos_sql(a: str, b: str) -> str:
    return (f"list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b})))")


# ---------------------------------------------------------------------------
# function battery
# ---------------------------------------------------------------------------


@query(
    "sim_vector_math",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
    SELECT a.vec_id,
           round(list_dot_product(a.emb, b.emb), 6) AS dot_ab,
           round(sqrt(list_dot_product(a.emb, a.emb)), 6) AS norm_a,
           round(sqrt(list_sum(list_transform(generate_series(1, 64),
                 i -> (a.emb[i] - b.emb[i]) * (a.emb[i] - b.emb[i])))), 6)
               AS l2_ab,
           round({cos}, 6) AS cos_ab
    FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
    """.format(cos=_cos_sql("a.emb", "b.emb")),
)
def sim_vector_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math battery (dot, L2 norm, L2 distance, cosine) over
    consecutive-id pairs — all codegen'd HOF expressions."""
    e = load_table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", as_double(F.col("embedding")).alias("emb"))
    a, b = e.alias("a"), e.alias("b")
    ea, eb = F.col("a.emb"), F.col("b.emb")
    return (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.round(dot(ea, eb), 6).alias("dot_ab"),
            F.round(l2norm(ea), 6).alias("norm_a"),
            F.round(l2dist(ea, eb), 6).alias("l2_ab"),
            F.round(cosine(ea, eb), 6).alias("cos_ab"),
        )
    )


# ---------------------------------------------------------------------------
# exact brute-force cosine top-k
# ---------------------------------------------------------------------------

TOP_K = 5
PROBE_MOD = 25  # vec_id % 25 == 0 → small probe set
# The probe set is a FIXED query workload, not a fraction of the corpus:
# without the cap, probes grow with the corpus and every probe-style scan
# does probes × corpus = O(n²) work — measured 100-126× at the 10× sf1
# run.  Capping the probe ids keeps the serving shape (bounded query set
# against a growing corpus): work is O(|probes| × n), exactly linear.
# At sf ≤ 0.1 every vec_id is < 2000, so the cap is a no-op there and the
# sf0.01 oracle contract is unchanged (the cap appears in BOTH engines).
PROBE_CAP = 2000


def _probe_filter() -> Column:
    return (F.col("vec_id") % PROBE_MOD == 0) & (F.col("vec_id") < PROBE_CAP)


_PROBE_SQL = "q.vec_id % {mod} = 0 AND q.vec_id < {cap}"


@query(
    "sim_cosine_topk_bruteforce",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {cos} AS cos
        FROM e q JOIN e c ON {probe} AND c.vec_id <> q.vec_id),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored)
    SELECT query_id, neighbor_id, round(cos, 6) AS cos, rank
    FROM ranked WHERE rank <= {k}
    """.format(cos=_cos_sql("q.emb", "c.emb"), k=TOP_K,
               probe=_PROBE_SQL.format(mod=PROBE_MOD, cap=PROBE_CAP)),
)
def sim_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the probe vectors against the full
    corpus, rank per probe, keep k.

    Plan shape for scale: ``broadcast(probes)`` × corpus scan (no corpus
    shuffle) → per-query TopK window. Ties broken by neighbor_id for
    determinism; ranking uses the unrounded score.

    ``parallel="force"``: the probe side broadcasts, so the corpus
    scan's partitioning is the ONLY parallelism the O(probes x corpus)
    cosine folds get — the row-count floor must not collapse it to one
    partition at small corpus sizes (VERDICT r14 item 1)."""
    e = load_table(spark, sf_dir, "embeddings", parallel="force").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")).withColumn(
        "nrm", l2norm(F.col("emb")))
    probes = e.filter(_probe_filter())
    q, c = F.broadcast(probes).alias("q"), e.alias("c")
    scored = (
        q.join(c, F.col("c.vec_id") != F.col("q.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cosine_pair(F.col("q.emb"), F.col("c.emb"),
                        F.col("q.nrm"), F.col("c.nrm")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )


# ---------------------------------------------------------------------------
# threshold similarity join (probe-style)
# ---------------------------------------------------------------------------

SIM_THRESHOLD = 0.3


@query(
    "sim_threshold_join",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings)
    SELECT q.vec_id AS query_id, c.vec_id AS match_id,
           c.label AS match_label, round({cos}, 6) AS cos
    FROM e q JOIN e c ON {probe} AND c.vec_id <> q.vec_id
    WHERE {cos} >= {t}
    """.format(cos=_cos_sql("q.emb", "c.emb"), t=SIM_THRESHOLD,
               probe=_PROBE_SQL.format(mod=PROBE_MOD, cap=PROBE_CAP)),
)
def sim_threshold_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity join: probe set × corpus, keep pairs with cosine ≥ t.
    Broadcast probe side; the threshold filter sits directly on the
    codegen'd cosine expression. ``parallel="force"``: same shape as
    ``sim_cosine_topk_bruteforce`` — the broadcast join leaves the
    corpus scan's partitioning as the fold work's only parallelism."""
    e = load_table(spark, sf_dir, "embeddings", parallel="force").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    ).withColumn("nrm", l2norm(F.col("emb")))
    probes = e.filter(_probe_filter())
    q, c = F.broadcast(probes).alias("q"), e.alias("c")
    cos = cosine_pair(F.col("q.emb"), F.col("c.emb"),
                      F.col("q.nrm"), F.col("c.nrm"))
    return (
        q.join(c, F.col("c.vec_id") != F.col("q.vec_id"))
        .filter(cos >= SIM_THRESHOLD)
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("match_id"),
            F.col("c.label").alias("match_label"),
            F.round(cos, 6).alias("cos"),
        )
    )


# ---------------------------------------------------------------------------
# sign-LSH bucketed ANN (deterministic, oracle-replicated)
# ---------------------------------------------------------------------------

ANN_SIGN_BITS = 8
ANN_K = 3


def _ann_oracle() -> str:
    bucket = " || ".join(
        f"(CASE WHEN emb[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
        for i in range(ANN_SIGN_BITS)
    )
    return """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    eb AS (SELECT vec_id, emb, {bucket} AS bucket FROM e),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos
        FROM eb q JOIN eb c
          ON q.bucket = c.bucket AND {probe}
         AND c.vec_id <> q.vec_id),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored)
    SELECT query_id, neighbor_id, round(cos, 6) AS cos, rank
    FROM ranked WHERE rank <= {k}
    """.format(bucket=bucket, cos=_cos_sql("q.emb", "c.emb"),
               probe=_PROBE_SQL.format(mod=PROBE_MOD, cap=PROBE_CAP),
               k=ANN_K)


@query("sim_ann_signlsh_topk", oracle=_ann_oracle())
def sim_ann_signlsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: random-hyperplane (axis-sign) LSH buckets on
    the first 8 dimensions; candidates come from a bucket equi-join and
    only they are scored — the IVF/LSH scale path where the corpus is
    hash-partitioned by bucket and each probe touches one partition.

    The oracle runs the identical bucketing, so the approximation itself
    is value-hash-checked (recall loss vs. the brute-force query is
    visible by comparing with ``sim_cosine_topk_bruteforce``)."""
    e = load_table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", as_double(F.col("embedding")).alias("emb"))
    eb = e.withColumn("bucket", sign_lsh_bucket(F.col("emb"), ANN_SIGN_BITS)
                      ).withColumn("nrm", l2norm(F.col("emb")))
    q = F.broadcast(eb.filter(_probe_filter())).alias("q")
    c = eb.alias("c")
    scored = (
        q.join(c, (F.col("q.bucket") == F.col("c.bucket"))
               & (F.col("c.vec_id") != F.col("q.vec_id")))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cosine_pair(F.col("q.emb"), F.col("c.emb"),
                        F.col("q.nrm"), F.col("c.nrm")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_K)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )


# ---------------------------------------------------------------------------
# ANN recall audit (exact vs LSH, composed from the registered queries)
# ---------------------------------------------------------------------------


def _recall_oracle() -> str:
    from dask_lambda_example_spark.registry import QUERIES

    exact = QUERIES["sim_cosine_topk_bruteforce"].oracle
    ann = QUERIES["sim_ann_signlsh_topk"].oracle
    return f"""
    WITH exact_full AS ({exact}),
    ann_full AS ({ann}),
    exact_k AS (SELECT query_id, neighbor_id FROM exact_full
                WHERE rank <= {ANN_K}),
    hits AS (
        SELECT e.query_id, count(a.neighbor_id) AS n_hit
        FROM exact_k e
        LEFT JOIN ann_full a ON a.query_id = e.query_id
                            AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id)
    SELECT query_id, CAST(n_hit AS BIGINT) AS n_hit,
           round(n_hit * 1.0 / {ANN_K}, 6) AS recall_at_k
    FROM hits
    """


@query("sim_ann_recall_report", oracle=_recall_oracle())
def sim_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of the sign-LSH ANN against exact brute force —
    the number a serving team actually signs off on before shipping an
    approximate index. Per probe: how many of the exact top-{k}
    neighbors the bucketed ANN recovered.

    Composed from the two REGISTERED queries (same discipline as
    ``pipeline_curation_funnel``): the Spark side calls their
    implementations, the oracle nests their oracle SQL as CTEs — so the
    audit itself is value-checked end-to-end, and recall loss is a
    measured artifact rather than a hoped-for property. Scale: both
    inputs are probe-bounded (O(|probes| × n) worst case), the audit
    join touches only |probes| × k rows.

    What it shows at the test scale is itself instructive: mean
    recall@3 ≈ 0.02 at sf0.01 — 8 sign bits give 256 buckets against a
    500-vector corpus, i.e. ~2 vectors per bucket, so almost no true
    neighbor shares a bucket. That is the over-sharded regime
    (bucket count should track corpus/TARGET, cf. ``adaptive_extra_bits``
    in dedup.py, which grows bits only ABOVE a per-bucket target);
    the report is the tool that catches the misconfiguration before an
    index ships."""
    exact_k = (sim_cosine_topk_bruteforce(spark, sf_dir)
               .filter(F.col("rank") <= ANN_K)
               .select("query_id", "neighbor_id"))
    ann = (sim_ann_signlsh_topk(spark, sf_dir)
           .select("query_id", F.col("neighbor_id").alias("ann_neighbor")))
    return (
        exact_k.join(
            ann, (exact_k.query_id == ann.query_id)
            & (exact_k.neighbor_id == ann.ann_neighbor), "left")
        .groupBy(exact_k.query_id.alias("query_id"))
        .agg(F.count("ann_neighbor").alias("n_hit"))
        .select("query_id", "n_hit",
                F.round(F.col("n_hit") / ANN_K, 6).alias("recall_at_k"))
    )


sim_ann_recall_report.__doc__ = sim_ann_recall_report.__doc__.format(k=ANN_K)


# ---------------------------------------------------------------------------
# MLlib BucketedRandomProjectionLSH (rows-only: model hashes are
# MLlib-internal, not reproducible in ANSI SQL)
# ---------------------------------------------------------------------------


@query("sim_mllib_brp_join")
def sim_mllib_brp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN similarity join via MLlib ``BucketedRandomProjectionLSH``
    (seeded → deterministic): array<float> → VectorUDT at the MLlib
    boundary, ``approxSimilarityJoin`` under an L2 distance threshold,
    then verify the reported distance exactly with the HOF expression —
    a self-validating invariant in lieu of a SQL oracle (SURVEY.md
    §5.2-5). Output: pairs, MLlib distance, exact distance, both rounded
    (any disagreement would show as check=false rows)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id",
        as_double(F.col("embedding")).alias("emb"),
        array_to_vector(F.col("embedding")).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=2.0, numHashTables=4, seed=42)
    model = lsh.fit(e)
    # probe-style (small left side vs. full corpus): bounds the
    # hash-exploded join — the full self-join quadratically couples the
    # corpus to itself, which is exactly what LSH joins exist to avoid
    probes = e.filter(_probe_filter())
    pairs = model.approxSimilarityJoin(probes, e, threshold=1.2, distCol="dist")
    exact = l2dist(F.col("datasetA.emb"), F.col("datasetB.emb"))
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round("dist", 6).alias("mllib_dist"),
            F.round(exact, 6).alias("exact_dist"),
            (F.round("dist", 6) == F.round(exact, 6)).alias("check"),
        )
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) coarse quantization + cell-pruned search
# ---------------------------------------------------------------------------

IVF_K = 3


@query(
    "sim_ivf_centroids",
    oracle="""
    SELECT label, CAST(pos AS INT) AS pos, round(avg(val), 6) AS centroid_val
    FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS val,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings)
    GROUP BY label, pos
    """,
)
def sim_ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer build: the centroid of each cell (cells =
    the label partitioning; a k-means assignment would slot in
    identically) as (label, dim, value) rows — vector aggregation via
    ``posexplode`` + one grouped average. At scale this is a single
    partial+final aggregation over n_cells × dim groups, regardless of
    corpus size."""
    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    return (
        e.select("label", F.posexplode(as_double(F.col("embedding")))
                 .alias("pos0", "val"))
        .select("label", (F.col("pos0") + 1).cast("int").alias("pos"), "val")
        .groupBy("label", "pos")
        .agg(F.round(F.avg("val"), 6).alias("centroid_val"))
    )


def _ivf_search_oracle(n_probe_cells: int = 1,
                       adapt_margin: float | None = None) -> str:
    # fixed dial: keep the n_probe_cells best cells.  adaptive dial:
    # keep cells whose centroid cosine is within ``adapt_margin`` of
    # the best cell's, capped at n_probe_cells — easy probes scan one
    # cell, ambiguous probes scan more (the FAISS nprobe heuristic,
    # additive because cosine can be negative).
    adapt = (f"AND ccos >= best - {adapt_margin}"
             if adapt_margin is not None else "")
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    expl AS (SELECT vec_id, label, unnest(emb) AS val,
                    generate_subscripts(emb, 1) AS pos FROM e),
    cen AS (SELECT label, pos, avg(val) AS cval FROM expl GROUP BY label, pos),
    cnorm AS (SELECT label, sqrt(sum(cval * cval)) AS nrm FROM cen GROUP BY label),
    probes AS (SELECT vec_id, emb FROM e
               WHERE vec_id % {PROBE_MOD} = 0 AND vec_id < {PROBE_CAP}),
    pexpl AS (SELECT vec_id, unnest(emb) AS val,
                     generate_subscripts(emb, 1) AS pos FROM probes),
    pnorm AS (SELECT vec_id, sqrt(sum(val * val)) AS nrm
              FROM pexpl GROUP BY vec_id),
    pc AS (
        SELECT p.vec_id, c.label,
               sum(p.val * c.cval) / (pn.nrm * cn.nrm) AS ccos
        FROM pexpl p JOIN cen c ON p.pos = c.pos
        JOIN pnorm pn ON pn.vec_id = p.vec_id
        JOIN cnorm cn ON cn.label = c.label
        GROUP BY p.vec_id, c.label, pn.nrm, cn.nrm),
    assigned AS (
        SELECT vec_id, label FROM (
            SELECT vec_id, label, ccos,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY ccos DESC, label) AS rn,
                   max(ccos) OVER (PARTITION BY vec_id) AS best
            FROM pc) WHERE rn <= {n_probe_cells} {adapt}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_cos_sql('q.emb', 'c.emb')} AS cos
        FROM probes q
        JOIN assigned a ON a.vec_id = q.vec_id
        JOIN e c ON c.label = a.label AND c.vec_id <> q.vec_id)
    SELECT query_id, neighbor_id, round(cos, 6) AS cos, rank FROM (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored) WHERE rank <= {IVF_K}
    """


def _ivf_search_impl(spark: SparkSession, sf_dir: str,
                     n_probe_cells: int, k: int = IVF_K,
                     adapt_margin: float | None = None) -> DataFrame:
    """Shared IVF pipeline: assign each probe to its ``n_probe_cells``
    nearest centroids (with ``adapt_margin`` set, only those within
    that cosine margin of the best cell — the adaptive dial), exact
    top-k within those cells only."""
    e = load_table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb"))
    expl = e.select(
        "vec_id", "label",
        F.posexplode("emb").alias("pos0", "val")).select(
        "vec_id", "label", (F.col("pos0") + 1).alias("pos"), "val")

    cen = expl.groupBy("label", "pos").agg(F.avg("val").alias("cval"))
    cnorm = cen.groupBy("label").agg(
        F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("nrm"))

    probes = e.filter(_probe_filter())
    pexpl = expl.filter(_probe_filter()).drop("label")
    pnorm = pexpl.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm"))

    pc = (
        pexpl.join(F.broadcast(cen), "pos")
        .groupBy("vec_id", "label")
        .agg(F.sum(F.col("val") * F.col("cval")).alias("dot"))
        .join(F.broadcast(pnorm.withColumnRenamed("nrm", "pn")), "vec_id")
        .join(F.broadcast(cnorm.withColumnRenamed("nrm", "cn")), "label")
        .select("vec_id", "label",
                (F.col("dot") / (F.col("pn") * F.col("cn"))).alias("ccos"))
    )
    wassign = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("label"))
    keep = F.col("rn") <= n_probe_cells
    if adapt_margin is not None:
        keep = keep & (F.col("ccos")
                       >= F.col("best") - F.lit(adapt_margin))
    assigned = (pc.withColumn("rn", F.row_number().over(wassign))
                .withColumn("best", F.max("ccos").over(
                    Window.partitionBy("vec_id")))
                .filter(keep)
                .select("vec_id", "label"))

    q = (F.broadcast(probes.select("vec_id", "emb").join(assigned, "vec_id"))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("label").alias("cell"),
                 F.col("emb").alias("qemb"),
                 l2norm(F.col("emb")).alias("qnrm")))
    c = e.withColumn("nrm", l2norm(F.col("emb"))).alias("c")
    scored = (
        q.join(c, (F.col("c.label") == F.col("cell"))
               & (F.col("c.vec_id") != F.col("query_id")))
        .select("query_id", F.col("c.vec_id").alias("neighbor_id"),
                cosine_pair(F.col("qemb"), F.col("c.emb"),
                            F.col("qnrm"), F.col("c.nrm")).alias("cos"))
    )
    wrank = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                                   F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"),
                "rank")
    )


@query("sim_ivf_search", oracle=_ivf_search_oracle())
def sim_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: assign each probe to its nearest centroid (cosine
    over the tiny centroid table), then exact top-k *within that cell
    only* — the partition-pruned ANN scale path: with the corpus
    hash-partitioned by cell, each probe reads 1/n_cells of the data.

    Probe↔centroid scoring runs in exploded (vec_id, pos, val) form on
    BOTH sides so the float summation grouping is identical; the
    in-cell rerank uses the exact HOF cosine. The oracle replicates the
    whole pipeline — assignment mistakes (vs. brute force) are part of
    the checked contract."""
    return _ivf_search_impl(spark, sf_dir, 1)


IVF_PROBE_CELLS = 2


@query("sim_ivf_search_multiprobe",
       oracle=_ivf_search_oracle(IVF_PROBE_CELLS))
def sim_ivf_search_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The n_probe knob of IVF made concrete: search the top-{p}
    centroid cells per probe instead of 1. Scan fraction grows to
    {p}/n_cells; the recall lost to wrong single-cell assignment (the
    loss ``sim_ivf_recall_report`` measures) is recovered whenever the
    true neighbor sits in the runner-up cell — the standard
    recall-vs-cost dial of every production IVF index, here with both
    settings oracle-gated so the tradeoff is value-checked, not
    quoted from a paper."""
    return _ivf_search_impl(spark, sf_dir, IVF_PROBE_CELLS)


sim_ivf_search_multiprobe.__doc__ = sim_ivf_search_multiprobe.__doc__.format(
    p=IVF_PROBE_CELLS)


def _ivf_recall_multiprobe_oracle() -> str:
    from dask_lambda_example_spark.registry import QUERIES

    exact = QUERIES["sim_cosine_topk_bruteforce"].oracle
    ivf = QUERIES["sim_ivf_search_multiprobe"].oracle
    return f"""
    WITH exact_full AS ({exact}),
    ivf_full AS ({ivf}),
    exact_k AS (SELECT query_id, neighbor_id FROM exact_full
                WHERE rank <= {IVF_K}),
    hits AS (
        SELECT e.query_id, count(a.neighbor_id) AS n_hit
        FROM exact_k e
        LEFT JOIN ivf_full a ON a.query_id = e.query_id
                            AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id)
    SELECT query_id, CAST(n_hit AS BIGINT) AS n_hit,
           round(n_hit * 1.0 / {IVF_K}, 6) AS recall_at_k
    FROM hits
    """


@query("sim_ivf_recall_multiprobe", oracle=_ivf_recall_multiprobe_oracle())
def sim_ivf_recall_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the 2-cell multiprobe IVF search — read next to
    ``sim_ivf_recall_report`` (the 1-cell number), the pair IS the
    measured recall-vs-scan-fraction curve."""
    exact_k = (sim_cosine_topk_bruteforce(spark, sf_dir)
               .filter(F.col("rank") <= IVF_K)
               .select("query_id", "neighbor_id"))
    ivf = (sim_ivf_search_multiprobe(spark, sf_dir)
           .select("query_id", F.col("neighbor_id").alias("ivf_neighbor")))
    return (
        exact_k.join(
            ivf, (exact_k.query_id == ivf.query_id)
            & (exact_k.neighbor_id == ivf.ivf_neighbor), "left")
        .groupBy(exact_k.query_id.alias("query_id"))
        .agg(F.count("ivf_neighbor").alias("n_hit"))
        .select("query_id", "n_hit",
                F.round(F.col("n_hit") / IVF_K, 6).alias("recall_at_k"))
    )


# Adaptive probe dial (round 14): both fixed dials spend the SAME scan
# budget on every probe — 1 or 2 cells — even though most queries'
# nearest centroid is unambiguous and a minority sit between cells
# (those are where the single-cell recall loss concentrates; the r13/
# r14 verdicts' 0.21-0.25 recall commentary is cell-membership at a
# FIXED 2-of-10 dial).  The adaptive rule probes every cell within
# IVF_ADAPT_MARGIN cosine of the best cell, capped at
# IVF_ADAPT_MAX_CELLS: easy probes scan 1 cell, ambiguous probes up to
# {cap} — the FAISS-style budget-where-it-helps heuristic, additive
# because cosine can be negative.  All three queries (search, recall
# twin, probe-count stats) are oracle-gated, so the recall-vs-scan
# trade is value-checked at BOTH ends: what it recovers (recall) and
# what it spends (cells probed).
IVF_ADAPT_MARGIN = 0.05
IVF_ADAPT_MAX_CELLS = 4


@query("sim_ivf_search_adaptive",
       oracle=_ivf_search_oracle(IVF_ADAPT_MAX_CELLS, IVF_ADAPT_MARGIN))
def sim_ivf_search_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search with the ADAPTIVE probe dial: each probe scans every
    cell whose centroid cosine is within {m} of its best cell's, capped
    at {cap} cells — variable scan budget spent exactly where the fixed
    dials lose recall (probes that sit between cells). Exact top-k
    within the probed cells; whole pipeline oracle-replicated including
    the margin rule. Read with ``sim_ivf_recall_adaptive`` (what it
    recovers) and ``sim_ivf_adaptive_probe_stats`` (what it spends)."""
    return _ivf_search_impl(spark, sf_dir, IVF_ADAPT_MAX_CELLS,
                            adapt_margin=IVF_ADAPT_MARGIN)


sim_ivf_search_adaptive.__doc__ = sim_ivf_search_adaptive.__doc__.format(
    m=IVF_ADAPT_MARGIN, cap=IVF_ADAPT_MAX_CELLS)


def _ivf_recall_adaptive_oracle() -> str:
    from dask_lambda_example_spark.registry import QUERIES

    exact = QUERIES["sim_cosine_topk_bruteforce"].oracle
    ivf = QUERIES["sim_ivf_search_adaptive"].oracle
    return f"""
    WITH exact_full AS ({exact}),
    ivf_full AS ({ivf}),
    exact_k AS (SELECT query_id, neighbor_id FROM exact_full
                WHERE rank <= {IVF_K}),
    hits AS (
        SELECT e.query_id, count(a.neighbor_id) AS n_hit
        FROM exact_k e
        LEFT JOIN ivf_full a ON a.query_id = e.query_id
                            AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id)
    SELECT query_id, CAST(n_hit AS BIGINT) AS n_hit,
           round(n_hit * 1.0 / {IVF_K}, 6) AS recall_at_k
    FROM hits
    """


@query("sim_ivf_recall_adaptive", oracle=_ivf_recall_adaptive_oracle())
def sim_ivf_recall_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the adaptive-probe IVF search — read next to
    ``sim_ivf_recall_report`` (1 cell) and ``sim_ivf_recall_multiprobe``
    (2 cells): the three rows ARE the measured recall-vs-scan curve,
    with the adaptive point spending its extra cells only on ambiguous
    probes (``sim_ivf_adaptive_probe_stats`` prices that side)."""
    exact_k = (sim_cosine_topk_bruteforce(spark, sf_dir)
               .filter(F.col("rank") <= IVF_K)
               .select("query_id", "neighbor_id"))
    ivf = (sim_ivf_search_adaptive(spark, sf_dir)
           .select("query_id", F.col("neighbor_id").alias("ivf_neighbor")))
    return (
        exact_k.join(
            ivf, (exact_k.query_id == ivf.query_id)
            & (exact_k.neighbor_id == ivf.ivf_neighbor), "left")
        .groupBy(exact_k.query_id.alias("query_id"))
        .agg(F.count("ivf_neighbor").alias("n_hit"))
        .select("query_id", "n_hit",
                F.round(F.col("n_hit") / IVF_K, 6).alias("recall_at_k"))
    )


def _ivf_adaptive_stats_oracle() -> str:
    ivf = _ivf_search_oracle(IVF_ADAPT_MAX_CELLS, IVF_ADAPT_MARGIN)
    return f"""
    WITH ivf_full AS ({ivf}),
    cells AS (SELECT s.query_id, count(DISTINCT e.label) AS n_cells
              FROM ivf_full s JOIN embeddings e
                ON e.vec_id = s.neighbor_id
              GROUP BY s.query_id)
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(n_cells) AS BIGINT) AS cells_scanned,
           round(avg(n_cells), 6) AS avg_cells
    FROM cells
    """


@query("sim_ivf_adaptive_probe_stats", oracle=_ivf_adaptive_stats_oracle())
def sim_ivf_adaptive_probe_stats(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """The SPEND side of the adaptive dial: how many cells the adaptive
    rule actually scanned, aggregated over probes (n_probes,
    cells_scanned, avg_cells) — derived from the search output's
    neighbor cells, so the oracle prices exactly what the search
    emitted. avg_cells ≈ 1.x on an easy corpus vs the fixed dial's
    flat 2.0: the budget concentrates on ambiguous probes."""
    search = sim_ivf_search_adaptive(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", "label")
    cells = (search.join(e, search.neighbor_id == e.vec_id)
             .groupBy("query_id")
             .agg(F.countDistinct("label").alias("n_cells")))
    return cells.agg(
        F.count("*").cast("long").alias("n_probes"),
        F.sum("n_cells").cast("long").alias("cells_scanned"),
        F.round(F.avg("n_cells"), 6).alias("avg_cells"))


@query(
    "sim_embed_quantize_int8",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        WHERE vec_id % 10 = 0),
    n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm
          FROM e)
    SELECT vec_id,
           CAST(round(nrm, 6) AS REAL) AS norm,
           array_to_string(
               list_transform(emb,
                   x -> CAST(CAST(round(x / nrm * 127, 0) AS INT)
                             AS VARCHAR)), ' ') AS q8
    FROM n
    """,
)
def sim_embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding storage quantization: L2-normalize then symmetric int8
    (scale 127) — the 4× footprint cut that makes a 100 TB embedding
    corpus shippable, with cosine preserved to ~1e-2. All JVM array
    HOFs in one projection: the norm is the same in-order fold as every
    other vector op (bit-identical to the oracle), rounding happens on
    identical doubles, and the int codes serialize for the hash. The
    dequantize side is the same transform with /127."""
    e = (load_table(spark, sf_dir, "embeddings", parallel=True)
         .filter(F.col("vec_id") % 10 == 0)
         .select("vec_id", as_double(F.col("embedding")).alias("emb")))
    nrm = l2norm(F.col("emb"))
    n = e.select("vec_id", "emb", nrm.alias("nrm"))
    q8 = F.array_join(
        F.transform(F.col("emb"),
                    lambda x: F.round(x / F.col("nrm") * 127, 0)
                    .cast("int").cast("string")), " ")
    return n.select(
        "vec_id", F.round("nrm", 6).cast("float").alias("norm"),
        q8.alias("q8"))


MMR_PROBE = 0
MMR_CAND = 12
MMR_K = 4
MMR_LAMBDA = 0.7


def _mmr_oracle() -> str:
    cos = _cos_sql("{a}", "{b}")

    def c(a, b):
        return cos.format(a=a, b=b)

    steps = []
    prev_sel = "s1"
    sel_union = "SELECT * FROM s1"
    for i in range(2, MMR_K + 1):
        steps.append(f"""
    r{i} AS (
        SELECT c.vec_id, c.emb, c.cos,
               max({c('c.emb', 's.emb')}) AS msim
        FROM cand c JOIN ({sel_union}) s ON c.vec_id <> s.vec_id
        WHERE c.vec_id NOT IN (SELECT vec_id FROM ({sel_union}))
        GROUP BY c.vec_id, c.emb, c.cos),
    s{i} AS (
        SELECT {i} AS rank, vec_id, emb, cos FROM r{i}
        ORDER BY {MMR_LAMBDA!r} * cos - {1 - MMR_LAMBDA!r} * msim DESC,
                 vec_id LIMIT 1)""")
        sel_union += f" UNION ALL SELECT * FROM s{i}"
        prev_sel = f"s{i}"
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    p AS (SELECT emb AS pemb FROM e WHERE vec_id = {MMR_PROBE}),
    cand AS (
        SELECT vec_id, emb, {c('emb', 'p.pemb')} AS cos
        FROM e, p WHERE vec_id <> {MMR_PROBE}
        ORDER BY cos DESC, vec_id LIMIT {MMR_CAND}),
    s1 AS (SELECT 1 AS rank, vec_id, emb, cos FROM cand
           ORDER BY cos DESC, vec_id LIMIT 1),
    {",".join(steps)}
    SELECT rank, vec_id, CAST(round(cos, 6) AS REAL) AS cos
    FROM ({sel_union})
    """


@query("sim_mmr_diversified_topk", oracle=_mmr_oracle())
def sim_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking: from the cosine top-{n}
    candidates of a probe, greedily select {k} results balancing
    relevance against redundancy (λ={lam} · cos(probe,c) −
    (1−λ) · max-sim-to-already-selected) — the diversified-retrieval
    step between ANN candidate generation and a RAG context window.

    Scale split: candidate generation is the distributed part
    (broadcast probe over the streaming corpus, TakeOrdered {n}) and is
    shared with `sim_cosine_topk_bruteforce`; the greedy loop runs on
    the {n}-row candidate frame — bounded by k·n tiny joins, corpus
    size irrelevant. All cosines are the same in-order folds as every
    vector op, so the greedy argmax (tie-break vec_id) is bit-exact
    across engines and the oracle unrolls the identical {k}-step
    recurrence."""
    e = (load_table(spark, sf_dir, "embeddings", parallel=True)
         .select("vec_id", as_double(F.col("embedding")).alias("emb")))
    p = (e.filter(F.col("vec_id") == MMR_PROBE)
         .select(F.col("emb").alias("pemb")))
    cand = (
        e.filter(F.col("vec_id") != MMR_PROBE)
        .crossJoin(F.broadcast(p))
        .select("vec_id", "emb", cosine(F.col("emb"), F.col("pemb"))
                .alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id")).limit(MMR_CAND)
        .localCheckpoint(eager=True)
    )
    sel = (cand.orderBy(F.desc("cos"), F.asc("vec_id")).limit(1)
           .select(F.lit(1).alias("rank"), "vec_id", "emb", "cos"))
    for i in range(2, MMR_K + 1):
        s = sel.select(F.col("vec_id").alias("svid"),
                       F.col("emb").alias("semb"))
        scored = (
            cand.join(F.broadcast(sel.select("vec_id")), "vec_id",
                      "left_anti")
            .crossJoin(F.broadcast(s))
            .select("vec_id", "emb", "cos",
                    cosine(F.col("emb"), F.col("semb")).alias("sim"))
            .groupBy("vec_id", "emb", "cos")
            .agg(F.max("sim").alias("msim"))
        )
        pick = (
            scored.orderBy(
                F.desc(MMR_LAMBDA * F.col("cos")
                       - (1 - MMR_LAMBDA) * F.col("msim")),
                F.asc("vec_id")).limit(1)
            .select(F.lit(i).alias("rank"), "vec_id", "emb", "cos"))
        sel = sel.unionByName(pick).localCheckpoint(eager=True)
    return sel.select("rank", "vec_id",
                      F.round("cos", 6).cast("float").alias("cos"))


sim_mmr_diversified_topk.__doc__ = sim_mmr_diversified_topk.__doc__.format(
    n=MMR_CAND, k=MMR_K, lam=MMR_LAMBDA)


# ---------------------------------------------------------------------------
# hybrid retrieval: BM25 (lexical) + cosine (semantic) fused with RRF
# ---------------------------------------------------------------------------

RRF_K = 60          # standard reciprocal-rank-fusion damping constant
RRF_N_CAND = 50     # candidate-list depth per modality
RRF_TOP = 20        # fused results returned
RRF_QUERY_VEC = 0   # pinned probe: embedding of vec_id 0


def _hybrid_rrf_oracle() -> str:
    from dask_lambda_example_spark.operators.text import (
        _bm25_ctes, _bm25_score_sql)

    cos = _cos_sql("c.emb", "q.emb")
    return f"""
    WITH {_bm25_ctes()},
    lex AS (
        SELECT doc_id, r_lex FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY {_bm25_score_sql()} DESC,
                                      doc_id) AS r_lex
            FROM per_doc)
        WHERE r_lex <= {RRF_N_CAND}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings),
    qv AS (SELECT emb FROM e WHERE vec_id = {RRF_QUERY_VEC}),
    sem_scored AS (
        SELECT c.vec_id AS doc_id, {cos} AS cos
        FROM e c CROSS JOIN qv q
        WHERE c.vec_id <> {RRF_QUERY_VEC}),
    sem AS (
        SELECT doc_id, r_sem FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY cos DESC, doc_id) AS r_sem
            FROM sem_scored)
        WHERE r_sem <= {RRF_N_CAND}),
    fused AS (
        SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
               coalesce(CAST(1.0 AS DOUBLE) / ({RRF_K} + l.r_lex), 0)
               + coalesce(CAST(1.0 AS DOUBLE) / ({RRF_K} + s.r_sem), 0)
                 AS rrf,
               l.r_lex, s.r_sem
        FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
    SELECT doc_id, round(rrf, 6) AS rrf, r_lex, r_sem
    FROM fused ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP}
    """


@query("sim_hybrid_rrf", oracle=_hybrid_rrf_oracle())
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion — the standard RAG
    recall stage: a LEXICAL candidate list (Okapi BM25 over the pinned
    term query, ``text.bm25_scores``) and a SEMANTIC candidate list
    (exact cosine against one pinned probe embedding) are each cut to
    the top-{n}, then fused by ``rrf = Σ 1/({k} + rank_i)`` and the
    top-{top} returned.

    Plan shape for 100 TB: each modality keeps its own scale-safe scan
    — the BM25 side is the inverted-index plan (postings filtered at
    explode, |query|-row broadcast df), the semantic side is a
    broadcast-probe projection over the corpus with NO shuffle — and
    both reduce to a TakeOrdered top-{n} BEFORE fusion, so the
    rank-assignment windows and the full-outer fusion join only ever
    see ≤{n}-row frames regardless of corpus size. Candidate-list
    depth, not data volume, bounds everything downstream of the two
    scans.

    Float discipline: ranks are integers; each fused score is exactly
    two IEEE divisions added in fixed order — bit-stable against the
    oracle's identical expression. Ties broken by doc_id at every
    ranking step."""
    from dask_lambda_example_spark.operators.text import bm25_scores

    lex_top = (
        bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id")).limit(RRF_N_CAND))
    w_lex = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = lex_top.select(
        "doc_id", F.row_number().over(w_lex).alias("r_lex"))

    e = load_table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    ).withColumn("nrm", l2norm(F.col("emb")))
    qv = e.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("emb").alias("qemb"), F.col("nrm").alias("qnrm"))
    sem_scored = (
        e.filter(F.col("vec_id") != RRF_QUERY_VEC)
        .crossJoin(F.broadcast(qv))
        .select(F.col("vec_id").alias("doc_id"),
                cosine_pair(F.col("emb"), F.col("qemb"),
                            F.col("nrm"), F.col("qnrm")).alias("cos")))
    sem_top = sem_scored.orderBy(
        F.desc("cos"), F.asc("doc_id")).limit(RRF_N_CAND)
    w_sem = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    sem = sem_top.select(
        "doc_id", F.row_number().over(w_sem).alias("r_sem"))

    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            (F.coalesce(1.0 / (RRF_K + F.col("r_lex")), F.lit(0.0))
             + F.coalesce(1.0 / (RRF_K + F.col("r_sem")), F.lit(0.0))
             ).alias("rrf"),
            "r_lex", "r_sem"))
    return (fused
            .select("doc_id", F.round("rrf", 6).alias("rrf"),
                    "r_lex", "r_sem")
            .orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOP))


sim_hybrid_rrf.__doc__ = sim_hybrid_rrf.__doc__.format(
    n=RRF_N_CAND, k=RRF_K, top=RRF_TOP)


# ---------------------------------------------------------------------------
# IVF recall audit (exact vs cell-pruned search) — the second ANN index
# gets the same sign-off number as the sign-LSH one
# ---------------------------------------------------------------------------


def _ivf_recall_oracle() -> str:
    from dask_lambda_example_spark.registry import QUERIES

    exact = QUERIES["sim_cosine_topk_bruteforce"].oracle
    ivf = QUERIES["sim_ivf_search"].oracle
    return f"""
    WITH exact_full AS ({exact}),
    ivf_full AS ({ivf}),
    exact_k AS (SELECT query_id, neighbor_id FROM exact_full
                WHERE rank <= {IVF_K}),
    hits AS (
        SELECT e.query_id, count(a.neighbor_id) AS n_hit
        FROM exact_k e
        LEFT JOIN ivf_full a ON a.query_id = e.query_id
                            AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id)
    SELECT query_id, CAST(n_hit AS BIGINT) AS n_hit,
           round(n_hit * 1.0 / {IVF_K}, 6) AS recall_at_k
    FROM hits
    """


@query("sim_ivf_recall_report", oracle=_ivf_recall_oracle())
def sim_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of the IVF cell-pruned search against exact brute
    force — the sibling of ``sim_ann_recall_report`` for the second ANN
    index, so BOTH approximate paths ship with a measured sign-off
    number. Per probe: how many of the exact top-{k} neighbors the
    single-cell IVF search recovered.

    Same composition discipline: the Spark side calls the two
    REGISTERED implementations, the oracle nests their oracle SQL as
    CTEs, so the audit is value-checked end-to-end and IVF's
    single-probe-cell recall loss (probes whose true neighbors live in
    a different cell score 0) is a measured artifact. Scale: both
    inputs are probe-bounded; the audit join touches |probes| × k
    rows. The knob this report tunes at 100 TB is n_probe_cells —
    searching the top-p centroid cells instead of 1 trades scan
    fraction (p / n_cells) against exactly the recall measured here."""
    exact_k = (sim_cosine_topk_bruteforce(spark, sf_dir)
               .filter(F.col("rank") <= IVF_K)
               .select("query_id", "neighbor_id"))
    ivf = (sim_ivf_search(spark, sf_dir)
           .select("query_id", F.col("neighbor_id").alias("ivf_neighbor")))
    return (
        exact_k.join(
            ivf, (exact_k.query_id == ivf.query_id)
            & (exact_k.neighbor_id == ivf.ivf_neighbor), "left")
        .groupBy(exact_k.query_id.alias("query_id"))
        .agg(F.count("ivf_neighbor").alias("n_hit"))
        .select("query_id", "n_hit",
                F.round(F.col("n_hit") / IVF_K, 6).alias("recall_at_k"))
    )


sim_ivf_recall_report.__doc__ = sim_ivf_recall_report.__doc__.format(k=IVF_K)


# ---------------------------------------------------------------------------
# metadata-thresholded auto-dispatch: exact brute force <-> IVF ANN
# (VERDICT r6 item 2: the exact/IVF pair was the same naive/twin shape
# as rank/ntile/percentile/rolling but undispatched)
# ---------------------------------------------------------------------------

# Above this many corpus vectors the exact search stops being
# acceptable as a default: brute force scans the WHOLE corpus per probe
# (O(|probes| x n) dot products), while IVF-multiprobe scans
# n_probe/n_cells of it with the recall cost measured by
# `sim_ivf_recall_multiprobe`. 1e7 128-dim float vectors ~ 5 GB of
# per-probe streaming compute -- the last scale where exactness is
# worth a full scan by default; past it a user reaching for "top-k
# neighbors" by name gets the index. Row count from parquet footer
# metadata, no job at plan-construction time.
SIM_EXACT_MAX_ROWS = 10_000_000


def sim_search_auto_impl(spark: SparkSession, sf_dir: str,
                         max_exact_rows: int = SIM_EXACT_MAX_ROWS
                         ) -> DataFrame:
    """Size-dispatched similarity search: exact brute-force cosine
    top-k below the corpus-row threshold (no recall loss, bounded
    scan), IVF multiprobe (scan fraction n_probe/n_cells, recall
    measured by the registered audits) above it. Both branches return
    the same (query_id, neighbor_id, cos, rank<=k) contract with
    k = TOP_K."""
    from dask_lambda_example_spark.io import parquet_rowcount

    if parquet_rowcount(sf_dir, "embeddings") <= max_exact_rows:
        return sim_cosine_topk_bruteforce(spark, sf_dir)
    return _ivf_search_impl(spark, sf_dir, IVF_PROBE_CELLS, k=TOP_K)


def _sim_search_auto_oracle() -> str:
    from dask_lambda_example_spark.registry import QUERIES

    return QUERIES["sim_cosine_topk_bruteforce"].oracle


@query("sim_search_auto", oracle=_sim_search_auto_oracle())
def sim_search_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered entry point for ``sim_search_auto_impl`` (shares the
    exact search's oracle: below the threshold -- including the sf0.01
    oracle scale -- the dispatcher IS the exact search; above it the
    approximation is a deliberate, recall-audited trade the
    ``sim_ivf_recall_*`` queries price. The plan assert
    ``tests/test_plans.py::test_sim_search_auto_dispatch`` pins that
    above-threshold input plans the centroid-pruned pipeline, never the
    full-corpus scan-per-probe join)."""
    return sim_search_auto_impl(spark, sf_dir)


# ---------------------------------------------------------------------------
# product quantization (PQ) with asymmetric-distance (ADC) scoring —
# the vector-COMPRESSION half of billion-scale ANN (Jégou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011; the FAISS IVF-PQ
# scale path). IVF above prunes WHICH cells to scan; PQ shrinks WHAT is
# scanned: each d-dim float vector becomes PQ_M small codes (here 32
# byte-sized codes vs 64 dims × float32 = 256 bytes — 8x compression),
# and a query scans codes with per-subspace table lookups instead of
# full-width float math.
# ---------------------------------------------------------------------------

PQ_M = 32         # subspaces; dim 64 → 2 dims per subspace
PQ_DSUB = 64 // PQ_M
# quantizer bits per dimension (default 3 → 8 fixed-width levels).
# Env-dialable so the compression↔recall trade is MEASURABLE, not
# asserted: the oracle SQL is built from the same constant at import,
# so a dialed run stays oracle-gated (GROWTH_r10_pq_tiers.json).
PQ_BITS = int(os.environ.get("SPARK_GRAFT_PQ_BITS", "3"))
# The ADC distance-table broadcast carries PQ_M · PQ_K = PQ_M ·
# (2^bits)^PQ_DSUB slots PER PROBE — exponential in the dial (at dim 64
# / M=32 / dsub=2: 3 bits → 2 k slots/probe and the sf1 probe set's
# table is ~10 MB; 6 bits → 131 k slots/probe, ~GB-scale per probe set,
# hopeless under the 16 g production heap). Bound the dial to the range
# whose broadcast stays executor material (ADVICE r10); the measured
# recall curve across this range is in SCALE.md.
assert 2 <= PQ_BITS <= 5, (
    f"SPARK_GRAFT_PQ_BITS={PQ_BITS} outside supported range [2, 5]: "
    "the ADC table broadcast is PQ_M*(2^bits)^PQ_DSUB slots per probe "
    "and stops being broadcast material above 5 bits")
PQ_LEVELS = 1 << PQ_BITS
PQ_K = PQ_LEVELS ** PQ_DSUB   # codes per subspace (64 at 3 bits × 2 dims)
PQ_STRIDE = PQ_K  # (m, code) slot packing stride: slot = m·stride + code
PQ_TOPK = IVF_K   # neighbors returned per probe

# the packing m*PQ_STRIDE+code collides silently if a code ever reaches
# the stride (ADVICE r9 — the round-9 data-driven label domain made this
# a latent hazard; the lattice domain makes it structural): codes are
# < PQ_LEVELS**PQ_DSUB by construction, so pin that against the stride.
assert PQ_K <= PQ_STRIDE, "PQ code domain must fit the slot-packing stride"


def _pq_grid(e: DataFrame) -> DataFrame:
    """1-row frame with two broadcastable POSITIONAL ARRAYS (min and
    bin width per dimension, index = pos): the per-dimension
    fixed-width quantization grid — ``PQ_LEVELS`` equal bins across
    [min, max]. min/max are chosen over trained centroids
    deliberately: they are ORDER-INDEPENDENT exact reductions, so
    Spark and DuckDB derive bit-identical grids and the bin assignment
    (one subtract/divide/floor per dimension) can never diverge
    between the engines. Width is floored at 1e-30 so a constant
    dimension bins to 0 instead of dividing by zero. One partial+final
    aggregation over dim groups regardless of corpus size.

    Arrays, not maps (round-10 measurement): the encode projection
    reads the grid 2×dim times PER ROW, and ``element_at`` on a Spark
    map is a linear scan of its key array — 64-entry maps made the
    encode ~5 ms/row; positional arrays are O(1) and the same encode
    is ~15 µs/row (3.1 s for the 200 k-row tier)."""
    return (e.select(F.posexplode("emb").alias("pos0", "val"))
             .groupBy("pos0")
             .agg(F.min("val").alias("mn"),
                  F.greatest(F.max("val") - F.min("val"),
                             F.lit(1e-30)).alias("w"))
             .agg(F.array_sort(F.collect_list(F.struct("pos0", "mn")))
                   .alias("s1"),
                  F.array_sort(F.collect_list(F.struct("pos0", "w")))
                   .alias("s2"))
             .select(F.transform("s1", lambda s: s["mn"]).alias("mna"),
                     F.transform("s2", lambda s: s["w"]).alias("wa")))


def _pq_bin_expr(pos: int):
    """The ``PQ_BITS``-bit lattice bin of dimension ``pos`` against the
    broadcast grid arrays: least(levels-1, floor((x - min) / w ·
    levels)) — pure codegen, dialect-portable (DuckDB: identical
    floor/least; floor output is integral so its INT cast is exact
    under DuckDB's round-on-cast)."""
    x = F.element_at(F.col("emb"), pos + 1)
    mn = F.element_at(F.col("mna"), pos + 1)
    w = F.element_at(F.col("wa"), pos + 1)
    return F.least(F.lit(PQ_LEVELS - 1),
                   F.floor((x - mn) / w * PQ_LEVELS)).cast("int")


def _pq_code_expr(m: int):
    """The subspace-``m`` PQ code as a pure codegen expression:
    ``PQ_BITS`` lattice bits per dimension — code = Σ_j bin_j ·
    levels^j, domain [0, PQ_K). The quantizer IS this binning function
    (a product lattice with data-driven per-bin reconstruction values),
    so the corpus encode needs NO argmin, NO codebook, NO join — the
    round-9 per-label argmin projection enumerated n_codes distance
    folds per subspace; this is ``PQ_DSUB`` subtract/divide/floors."""
    parts = [
        _pq_bin_expr(m * PQ_DSUB + j) * (PQ_LEVELS ** j)
        for j in range(PQ_DSUB)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def _pq_coded(e: DataFrame, grid: DataFrame) -> DataFrame:
    """(vec_id, label, emb, codes array<int>) — the corpus PQ encode as
    ONE whole-stage-codegen projection against the broadcast 1-row
    grid maps: no explode, no join, no shuffle."""
    codes = _cached_expr("pq_codes", lambda: F.array(
        *[_pq_code_expr(m).cast("int") for m in range(PQ_M)]))
    return (e.crossJoin(F.broadcast(grid))
             .select("vec_id", "label", "emb", codes.alias("codes")))


def _pq_codebook(coded: DataFrame) -> DataFrame:
    """(code, m, pos0, cval): per-bin mean subvectors — the
    reconstruction values of the lattice quantizer (the centroid of
    every occupied bin, exactly what k-means converges to for a fixed
    assignment). One partial+final aggregation over ≤ PQ_M × PQ_K × dim
    groups regardless of corpus size; empty bins simply don't occur in
    the output (they have no members to reconstruct)."""
    return (coded.select(
                F.posexplode("emb").alias("pos0", "val"),
                F.element_at(F.col("codes"),
                             (F.col("pos0") / PQ_DSUB).cast("int") + 1)
                 .alias("code"))
            .select("code", (F.col("pos0") / PQ_DSUB).cast("int").alias("m"),
                    "pos0", "val")
            .groupBy("code", "m", "pos0")
            .agg(F.avg("val").alias("cval")))


def _pq_probe_d2(e: DataFrame, cb: DataFrame) -> DataFrame:
    """Probe-side per-(subspace, code) squared distances — the ADC
    distance tables. Exploded + grouped like the oracle, but ONLY over
    the bounded probe set (|probes| × dim × occupied-codes rows; the
    codebook broadcasts)."""
    sub = (e.filter(_probe_filter())
            .select("vec_id", F.posexplode("emb").alias("pos0", "val")))
    diff = F.col("val") - F.col("cval")
    return (sub.join(F.broadcast(cb), "pos0")
               .groupBy("vec_id", "m", "code")
               .agg(F.sum(diff * diff).alias("d2")))


def _pq_dt_array(pdt: DataFrame) -> DataFrame:
    """(query_id, dta): each probe's ADC distance table as ONE DENSE
    POSITIONAL array of ``PQ_M × PQ_STRIDE`` slots (slot = m·stride +
    code), so the pair-side score is O(1) array indexes.

    Round-10 measurement lesson (the production-shape code domain made
    both wrong forms visible): (a) keeping the table as a per-probe
    MAP makes every pair-side ``element_at`` a linear scan of the
    map's key array; (b) densifying the map with
    ``transform(sequence(...), i -> element_at(map, i))`` re-evaluates
    the map expression inside the lambda per slot — measured 150-260 s
    at sf0.1 for 80 probes. The shape that stays fast is relational:
    LEFT-join the probe × slot spine (|probes| × PQ_M·PQ_STRIDE
    rows, broadcast hash join) against the occupied entries, then
    ``array_sort(collect_list(struct(slot, d2)))`` and a single
    field-extract transform — every per-entry operation is a plain
    join/aggregate, the only lambda touches 1 struct field per slot.
    Unoccupied slots carry null and are never indexed (every
    candidate's code is an occupied bin by construction)."""
    spark = pdt.sparkSession
    slots = spark.range(PQ_M * PQ_STRIDE).select(
        F.col("id").cast("int").alias("slot"))
    entries = pdt.select(
        "query_id",
        (F.col("m") * PQ_STRIDE + F.col("code")).cast("int").alias("slot"),
        "d2")
    spine = (pdt.select("query_id").distinct()
                .crossJoin(F.broadcast(slots)))
    return (spine.join(entries, ["query_id", "slot"], "left")
                 .groupBy("query_id")
                 .agg(F.array_sort(
                          F.collect_list(F.struct("slot", "d2")))
                       .alias("ent"))
                 .select("query_id",
                         F.transform(F.col("ent"), lambda s: s["d2"])
                          .alias("dta")))


def _pq_adc_fold():
    """Approximate squared L2 = Σ_m dta[m·stride + code_m] — unrolled
    into ``PQ_M`` plain ``element_at`` terms (no higher-order
    function: an HOF lambda is evaluated per element outside
    whole-stage codegen; 32 literal index expressions stay inside
    it). Memoized — constant tree, see ``_cached_expr``."""
    def build():
        terms = [
            F.element_at(
                F.col("dta"),
                (F.lit(m * PQ_STRIDE) + F.element_at(F.col("codes"), m + 1)
                 + 1).cast("int"))
            for m in range(PQ_M)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return _cached_expr("pq_adc_fold", build)


def _pq_adc_oracle(topk: int = PQ_TOPK) -> str:
    """Full-pipeline replication (the IVF-oracle discipline):
    thresholds, sign-bit encoding, bin-mean codebooks, distance tables
    and the ADC sum are all recomputed in DuckDB — approximation error
    vs exact search is part of the checked contract, not hand-waved.
    ``topk`` widens the cut for the re-rank shortlist
    (``sim_pq_rerank_search`` nests this at ``PQ_RERANK``)."""
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    expl AS (SELECT vec_id, label, unnest(emb) AS val,
                    generate_subscripts(emb, 1) AS pos FROM e),
    sub AS (SELECT vec_id, label, val, pos,
                   -- integer floor division: DuckDB CAST(float AS INT)
                   -- ROUNDS, Spark's cast truncates — '//' avoids both
                   CAST((pos - 1) // {PQ_DSUB} AS INT) AS m,
                   CAST((pos - 1) % {PQ_DSUB} AS INT) AS j FROM expl),
    grid AS (SELECT pos, min(val) AS mn,
                    greatest(max(val) - min(val), 1e-30) AS w
             FROM sub GROUP BY pos),
    codes AS (SELECT vec_id, m,
                     CAST(sum(least({PQ_LEVELS - 1},
                              CAST(floor((s.val - g.mn) / g.w
                                         * {PQ_LEVELS}) AS INT))
                          * (1 << ({PQ_BITS} * s.j))) AS INT) AS code
              FROM sub s JOIN grid g USING (pos)
              GROUP BY vec_id, m),
    cb AS (SELECT c.code, s.m, s.pos, avg(s.val) AS cval
           FROM sub s JOIN codes c ON c.vec_id = s.vec_id AND c.m = s.m
           GROUP BY c.code, s.m, s.pos),
    d2 AS (SELECT s.vec_id, s.m, cb.code,
                  sum((s.val - cb.cval) * (s.val - cb.cval)) AS d2
           FROM sub s JOIN cb ON cb.m = s.m AND cb.pos = s.pos
           WHERE s.vec_id % {PROBE_MOD} = 0 AND s.vec_id < {PROBE_CAP}
           GROUP BY s.vec_id, s.m, cb.code),
    adc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   sum(q.d2) AS ad2
            FROM d2 q
            JOIN codes c ON c.m = q.m AND c.code = q.code
            WHERE c.vec_id <> q.vec_id
            GROUP BY q.vec_id, c.vec_id)
    SELECT query_id, neighbor_id, round(ad2, 6) AS adist2, rank FROM (
        SELECT query_id, neighbor_id, ad2,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY ad2, neighbor_id) AS rank
        FROM adc) WHERE rank <= {topk}
    """


@query("sim_pq_adc_search", oracle=_pq_adc_oracle())
def sim_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed approximate nearest neighbors with ADC scoring.

    Pipeline (all JVM-side; the only wide ops are two partial-agg
    groupBys):

    1. **Grid**: per-dimension fixed-width quantization grid over the
       exact [min, max] — one tiny aggregation, broadcast as 1-row
       maps.
    2. **Encode**: per (vector, subspace), {PQ_BITS} lattice bits per
       dimension → code ∈ [0, {PQ_K}) per subspace (production-shape
       codebooks — VERDICT r9 item 4; the round-9 form had 10
       per-label codes and recall@3 0.15). The quantizer is the
       binning function itself, so the corpus encode is a pure
       whole-stage-codegen projection: the corpus collapses from
       n × d floats to n × {PQ_M} byte-sized codes (8× compression
       at d=64/float32; PQ_BITS is the compression↔recall dial — 2
       bits/dim doubles compression for recall@3 0.358 at sf0.1 vs
       0.596 at 3 bits, both in GROWTH_r10_pq_tiers.json) with NO
       argmin, NO join, NO shuffle.
    3. **Codebooks** (reconstruction values): per-bin mean subvectors —
       the centroid of every occupied bin, what k-means converges to
       for this assignment; ≤ {PQ_M} × {PQ_K} × d/{PQ_M} tiny rows,
       broadcast.
    4. **ADC**: each probe's per-(subspace, code) distance table is d2
       restricted to the probe set — asymmetric distance: query stays
       full-precision, corpus is code lookups. Approximate squared
       L2 = Σ_m dt[m, code_m(x)]: the probe tables broadcast as DENSE
       positional arrays (maps would be linear key scans per lookup —
       ``_pq_dt_array``)
       and the Σ folds in whole-stage codegen over the code table —
       NO full-width float math against the corpus, no shuffle after
       the encode projection.
    5. Top-{PQ_TOPK} per probe by (adist2, neighbor_id) — bounded
       window over |probes| × n pairs of SCALAR distances.

    Scale: at 100 TB of embeddings the codes table is ~3 TB; combined
    with IVF cell pruning (``sim_ivfpq_search``) each probe touches
    n_probe/n_cells of THAT — the standard IVF-PQ composition. L2
    metric (PQ's native space); for cosine, L2-normalize upstream.
    The oracle replicates thresholds → bits → bin means → tables →
    fold end to end."""
    adc = _pq_adc_ranked(spark, sf_dir)
    return (adc.filter(F.col("rank") <= PQ_TOPK)
               .select("query_id", "neighbor_id",
                       F.round("ad2", 6).alias("adist2"), "rank"))


def _pq_adc_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id, ad2, rank): the full ADC ranking per
    probe, shared by the top-k cut (``sim_pq_adc_search``) and the
    wider re-rank shortlist cut (``sim_pq_rerank_search``)."""
    e = load_table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb"))
    grid = _pq_grid(e)
    # Materialize the encode ONCE (round-10 measurement): the coded
    # frame feeds BOTH the codebook build and the pair-side scan, and
    # without a materialization barrier Catalyst inlines the ~3,000-op
    # encode expression into the pair projection — re-encoding the
    # corpus row PER CANDIDATE PAIR (measured 37 s vs 5.5 s at sf0.1).
    # The checkpoint is n × (id + PQ_M ints): the codes table a real
    # pipeline would persist, at exactly the compression PQ promises.
    coded = _pq_coded(e, grid).localCheckpoint(eager=True)
    cb = _pq_codebook(coded)
    codes_wide = coded.select("vec_id", "codes")

    # ADC as a broadcast ARRAY-INDEX FOLD, not a join+re-aggregation
    # (round-9 lesson: the relational form pushed n×M×|probes| rows
    # through a hash aggregate — 320M rows at sf10, 67.8s; the fold
    # scans |probes|×n rows once in codegen) — and not a MAP fold
    # (round-10 lesson in _pq_dt_array: map element_at is a linear
    # key scan, 18× at the production code domain).
    dtm = _pq_dt_array(
        _pq_probe_d2(e, cb).select(F.col("vec_id").alias("query_id"),
                                   "m", "code", "d2"))
    adc = (codes_wide
           .join(F.broadcast(dtm), F.col("vec_id") != F.col("query_id"))
           .select("query_id", F.col("vec_id").alias("neighbor_id"),
                   _pq_adc_fold().alias("ad2")))

    wrank = Window.partitionBy("query_id").orderBy("ad2", "neighbor_id")
    return adc.withColumn("rank", F.row_number().over(wrank))


sim_pq_adc_search.__doc__ = sim_pq_adc_search.__doc__.format(
    PQ_BITS=PQ_BITS, PQ_K=PQ_K, PQ_M=PQ_M, PQ_TOPK=PQ_TOPK)


# ---------------------------------------------------------------------------
# PQ shortlist → exact re-rank (the refine stage every production
# IVF-PQ serving stack runs: FAISS's refine/RFlat wrapper — ADC picks a
# shortlist from the compressed codes, then the shortlist's FULL-
# precision vectors are fetched and exactly re-scored, so the answer
# quality is bounded by shortlist membership, not by quantization
# error on the final ordering).
# ---------------------------------------------------------------------------

# ADC shortlist width refined with exact distances. Recall@k of the
# re-ranked result equals P(true top-k ∈ shortlist): any true top-k
# member in the shortlist survives the exact re-sort (only genuinely
# nearer vectors can outrank it, and there are < k of those). The
# refine stage reads PQ_RERANK/n of the full-precision corpus per
# probe — the bytes PQ saved stay saved except for the shortlist.
PQ_RERANK = 20


def _pq_rerank_d2_sql(q: str, c: str) -> str:
    # exact ‖q−c‖² grouped as qq − 2qc + cc, the SAME float evaluation
    # order as the Spark side's dot() fold (the sim_pq_recall_report
    # discipline) — value-hash parity depends on it.
    return (f"list_dot_product({q}, {q}) - 2 * list_dot_product({q}, {c})"
            f" + list_dot_product({c}, {c})")


def _pq_rerank_oracle() -> str:
    d2 = _pq_rerank_d2_sql("q.emb", "c.emb")
    return f"""
    WITH shortlist AS ({_pq_adc_oracle(PQ_RERANK)}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings)
    SELECT query_id, neighbor_id, round(d2, 6) AS dist2, rank FROM (
        SELECT s.query_id, s.neighbor_id, {d2} AS d2,
               row_number() OVER (PARTITION BY s.query_id
                                  ORDER BY {d2}, s.neighbor_id) AS rank
        FROM shortlist s
        JOIN e q ON q.vec_id = s.query_id
        JOIN e c ON c.vec_id = s.neighbor_id)
    WHERE rank <= {PQ_TOPK}
    """


@query("sim_pq_rerank_search", oracle=_pq_rerank_oracle())
def sim_pq_rerank_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC shortlist → exact re-rank (the FAISS ``refine`` stage).

    The ADC ranking (``_pq_adc_ranked`` — identical plan to
    ``sim_pq_adc_search``) is cut at ``PQ_RERANK`` instead of top-k;
    the |probes| × {PQ_RERANK} shortlist then fetches full-precision
    vectors with ONE broadcast-hash join against the corpus (the
    shortlist side is tiny and broadcasts; the corpus is scanned once,
    never shuffled) and re-scores exactly: ‖q−c‖² = qq − 2qc + cc with
    the in-order dot() fold, then a bounded window takes the final
    top-{PQ_TOPK}.

    Scale: this is the standard accuracy-recovery dial at 100 TB —
    compressed codes prune n → shortlist, and the refine stage reads
    only |probes| × {PQ_RERANK} full vectors (point lookups in a real
    serving store; here one broadcast join). Measured effect at the
    3-bit lattice: mean recall@3 rises from the raw-ADC 0.46 at sf1 to
    the re-ranked value in ``sim_pq_rerank_recall`` /
    GROWTH_r11_pq_rerank.json, because re-ranking converts "top-k
    somewhere in the shortlist" into "top-k in order". The oracle
    nests the full ADC pipeline at the shortlist width and replicates
    the exact re-score."""
    sl = (_pq_adc_ranked(spark, sf_dir)
          .filter(F.col("rank") <= PQ_RERANK)
          .select("query_id", "neighbor_id"))
    return _exact_rerank(spark, sf_dir, sl)


sim_pq_rerank_search.__doc__ = sim_pq_rerank_search.__doc__.format(
    PQ_RERANK=PQ_RERANK, PQ_TOPK=PQ_TOPK)


def _exact_rerank(spark: SparkSession, sf_dir: str,
                  sl: DataFrame) -> DataFrame:
    """The refine stage shared by ``sim_pq_rerank_search`` and
    ``sim_ivfpq_rerank_search``: given a (query_id, neighbor_id)
    shortlist, fetch full-precision vectors with ONE broadcast-hash
    join against the corpus (shortlist side broadcasts; the corpus is
    scanned once, never shuffled), exactly re-score ‖q−c‖² =
    qq − 2qc + cc with the in-order dot() fold, and take the final
    top-``PQ_TOPK`` per probe."""
    e = load_table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", as_double(F.col("embedding")).alias("emb"))
    q = (e.filter(_probe_filter())
          .select(F.col("vec_id").alias("query_id"),
                  F.col("emb").alias("qemb"),
                  dot(F.col("emb"), F.col("emb")).alias("qq")))
    c = e.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("emb").alias("cemb"),
                 dot(F.col("emb"), F.col("emb")).alias("cc"))
    d2 = (F.col("qq") - 2 * dot(F.col("qemb"), F.col("cemb"))
          + F.col("cc"))
    wrank = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (F.broadcast(sl.join(F.broadcast(q), "query_id"))
            .join(c, "neighbor_id")
            .select("query_id", "neighbor_id", d2.alias("d2"))
            .withColumn("rank", F.row_number().over(wrank))
            .filter(F.col("rank") <= PQ_TOPK)
            .select("query_id", "neighbor_id",
                    F.round("d2", 6).alias("dist2"), "rank"))


def _pq_rerank_recall_oracle() -> str:
    from dask_lambda_example_spark.registry import QUERIES

    rr = QUERIES["sim_pq_rerank_search"].oracle
    d2 = _pq_rerank_d2_sql("q.emb", "c.emb")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    exact_k AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY {d2}, c.vec_id) AS rank
            FROM e q JOIN e c ON c.vec_id <> q.vec_id
            WHERE q.vec_id % {PROBE_MOD} = 0 AND q.vec_id < {PROBE_CAP})
        WHERE rank <= {PQ_TOPK}),
    rr_full AS ({rr})
    SELECT e.query_id, CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
           round(count(a.neighbor_id) * 1.0 / {PQ_TOPK}, 6) AS recall_at_k
    FROM exact_k e
    LEFT JOIN rr_full a ON a.query_id = e.query_id
                       AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """


@query("sim_pq_rerank_recall", oracle=_pq_rerank_recall_oracle())
def sim_pq_rerank_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of the re-ranked PQ search against exact
    squared-L2 brute force — the measured sign-off number for the
    refine stage (every approximate path in this repo ships one). Same
    shape as ``sim_pq_recall_report``; the only difference is the
    audited frame. Because the re-rank orders its shortlist exactly,
    this recall is exactly shortlist membership of the true top-k —
    the number the PQ_RERANK width buys (VERDICT r10 item 7: the sf1
    recall dial)."""
    # parallel="force": the exact brute-force audit side broadcasts the
    # probe set, so this scan's partitioning is the only parallelism the
    # O(probes x corpus) d2 folds get (VERDICT r14 item 1; measured
    # 2.16 -> 1.21 s warm at sf0.1).
    e = load_table(spark, sf_dir, "embeddings", parallel="force").select(
        "vec_id", as_double(F.col("embedding")).alias("emb"))
    q = (e.filter(_probe_filter())
          .select(F.col("vec_id").alias("query_id"),
                  F.col("emb").alias("qemb"),
                  dot(F.col("emb"), F.col("emb")).alias("qq")))
    c = e.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("emb").alias("cemb"),
                 dot(F.col("emb"), F.col("emb")).alias("cc"))
    d2 = (F.col("qq") - 2 * dot(F.col("qemb"), F.col("cemb"))
          + F.col("cc"))
    wrank = Window.partitionBy("query_id").orderBy(d2, F.asc("neighbor_id"))
    exact_k = (F.broadcast(q)
               .join(c, F.col("neighbor_id") != F.col("query_id"))
               .withColumn("rank", F.row_number().over(wrank))
               .filter(F.col("rank") <= PQ_TOPK)
               .select("query_id", "neighbor_id"))
    rr = (sim_pq_rerank_search(spark, sf_dir)
          .select("query_id", F.col("neighbor_id").alias("rr_neighbor")))
    return (
        exact_k.join(
            rr, (exact_k.query_id == rr.query_id)
            & (exact_k.neighbor_id == rr.rr_neighbor), "left")
        .groupBy(exact_k.query_id.alias("query_id"))
        .agg(F.count("rr_neighbor").alias("n_hit"))
        .select("query_id", "n_hit",
                F.round(F.col("n_hit") / PQ_TOPK, 6).alias("recall_at_k"))
    )


def _pq_recall_oracle() -> str:
    from dask_lambda_example_spark.registry import QUERIES

    pq = QUERIES["sim_pq_adc_search"].oracle
    # exact squared-L2 in the dot-product grouping (aa - 2ab + bb), the
    # same float evaluation order as the Spark side's dot() fold — the
    # brute-force sibling in PQ's native metric.
    d2 = ("list_dot_product(q.emb, q.emb) "
          "- 2 * list_dot_product(q.emb, c.emb) "
          "+ list_dot_product(c.emb, c.emb)")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    exact_k AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY {d2}, c.vec_id) AS rank
            FROM e q JOIN e c ON c.vec_id <> q.vec_id
            WHERE q.vec_id % {PROBE_MOD} = 0 AND q.vec_id < {PROBE_CAP})
        WHERE rank <= {PQ_TOPK}),
    pq_full AS ({pq})
    SELECT e.query_id, CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
           round(count(a.neighbor_id) * 1.0 / {PQ_TOPK}, 6) AS recall_at_k
    FROM exact_k e
    LEFT JOIN pq_full a ON a.query_id = e.query_id
                       AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """


@query("sim_pq_recall_report", oracle=_pq_recall_oracle())
def sim_pq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of PQ-ADC against exact squared-L2 brute force —
    every approximate path in this repo ships with a measured sign-off
    number (the ``sim_ann_recall_report`` / ``sim_ivf_recall_report``
    discipline), and PQ's is measured in PQ's NATIVE metric (L2), not
    borrowed from the cosine exact search. Exact side evaluates
    ‖q−c‖² as qq − 2qc + cc with the in-order dot() fold so both
    engines group the floats identically; the PQ side is the
    registered query itself (oracle nests its SQL as a CTE). Scale:
    probe-bounded on both sides; the audit join touches |probes| × k
    rows. The knob this report prices at 100 TB is PQ_BITS (lattice
    bits per dimension): finer quantization → higher recall and a
    proportionally larger code table. Measured at the round-10
    codebook shape (3-bit lattice, 64 codes/subspace): mean recall@3
    0.70 / 0.60 at sf0.01 / sf0.1 vs 0.15 for the 10-code round-9
    form, above the whole IVF-multiprobe recall curve (0.22→0.42) —
    GROWTH_r10_pq_tiers.json carries the tier numbers."""
    # parallel="force": the exact brute-force audit side broadcasts the
    # probe set, so this scan's partitioning is the only parallelism the
    # O(probes x corpus) d2 folds get (VERDICT r14 item 1; measured
    # 2.16 -> 1.21 s warm at sf0.1).
    e = load_table(spark, sf_dir, "embeddings", parallel="force").select(
        "vec_id", as_double(F.col("embedding")).alias("emb"))
    q = (e.filter(_probe_filter())
          .select(F.col("vec_id").alias("query_id"),
                  F.col("emb").alias("qemb"),
                  dot(F.col("emb"), F.col("emb")).alias("qq")))
    c = e.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("emb").alias("cemb"),
                 dot(F.col("emb"), F.col("emb")).alias("cc"))
    d2 = (F.col("qq") - 2 * dot(F.col("qemb"), F.col("cemb"))
          + F.col("cc"))
    wrank = Window.partitionBy("query_id").orderBy(d2, F.asc("neighbor_id"))
    exact_k = (F.broadcast(q)
               .join(c, F.col("neighbor_id") != F.col("query_id"))
               .withColumn("rank", F.row_number().over(wrank))
               .filter(F.col("rank") <= PQ_TOPK)
               .select("query_id", "neighbor_id"))
    pq = (sim_pq_adc_search(spark, sf_dir)
          .select("query_id", F.col("neighbor_id").alias("pq_neighbor")))
    return (
        exact_k.join(
            pq, (exact_k.query_id == pq.query_id)
            & (exact_k.neighbor_id == pq.pq_neighbor), "left")
        .groupBy(exact_k.query_id.alias("query_id"))
        .agg(F.count("pq_neighbor").alias("n_hit"))
        .select("query_id", "n_hit",
                F.round(F.col("n_hit") / PQ_TOPK, 6).alias("recall_at_k"))
    )


IVFPQ_PROBE_CELLS = 2   # coarse cells scanned per probe (multiprobe)


def _ivfpq_oracle(topk: int = PQ_TOPK) -> str:
    """``topk`` widens the cut for the re-rank shortlist
    (``sim_ivfpq_rerank_search`` nests this at ``PQ_RERANK``)."""
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    expl AS (SELECT vec_id, label, unnest(emb) AS val,
                    generate_subscripts(emb, 1) AS pos FROM e),
    sub AS (SELECT vec_id, label, val, pos,
                   CAST((pos - 1) // {PQ_DSUB} AS INT) AS m,
                   CAST((pos - 1) % {PQ_DSUB} AS INT) AS j FROM expl),
    grid AS (SELECT pos, min(val) AS mn,
                    greatest(max(val) - min(val), 1e-30) AS w
             FROM sub GROUP BY pos),
    codes AS (SELECT vec_id, m,
                     CAST(sum(least({PQ_LEVELS - 1},
                              CAST(floor((s.val - g.mn) / g.w
                                         * {PQ_LEVELS}) AS INT))
                          * (1 << ({PQ_BITS} * s.j))) AS INT) AS code
              FROM sub s JOIN grid g USING (pos)
              GROUP BY vec_id, m),
    cb AS (SELECT c.code, s.m, s.pos, avg(s.val) AS cval
           FROM sub s JOIN codes c ON c.vec_id = s.vec_id AND c.m = s.m
           GROUP BY c.code, s.m, s.pos),
    pdt AS (SELECT s.vec_id AS query_id, s.m, cb.code,
                   sum((s.val - cb.cval) * (s.val - cb.cval)) AS d2
            FROM sub s JOIN cb ON cb.m = s.m AND cb.pos = s.pos
            WHERE s.vec_id % {PROBE_MOD} = 0 AND s.vec_id < {PROBE_CAP}
            GROUP BY s.vec_id, s.m, cb.code),
    cen AS (SELECT label, pos, avg(val) AS cval
            FROM expl GROUP BY label, pos),
    assigned AS (SELECT query_id, cell FROM (
            SELECT p.vec_id AS query_id, cen.label AS cell,
                   row_number() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY sum((p.val - cen.cval)
                                    * (p.val - cen.cval)), cen.label) AS rn
            FROM expl p JOIN cen ON cen.pos = p.pos
            WHERE p.vec_id % {PROBE_MOD} = 0 AND p.vec_id < {PROBE_CAP}
            GROUP BY p.vec_id, cen.label)
        WHERE rn <= {IVFPQ_PROBE_CELLS}),
    adc AS (SELECT q.query_id, c.vec_id AS neighbor_id, sum(q.d2) AS ad2
            FROM pdt q
            JOIN codes c ON c.m = q.m AND c.code = q.code
            JOIN e v ON v.vec_id = c.vec_id
            JOIN assigned a ON a.query_id = q.query_id
                           AND a.cell = v.label
            WHERE c.vec_id <> q.query_id
            GROUP BY q.query_id, c.vec_id)
    SELECT query_id, neighbor_id, round(ad2, 6) AS adist2, rank FROM (
        SELECT query_id, neighbor_id, ad2,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY ad2, neighbor_id) AS rank
        FROM adc) WHERE rank <= {topk}
    """


@query("sim_ivfpq_search", oracle=_ivfpq_oracle())
def sim_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the composed billion-scale ANN path — coarse cell
    pruning (IVF) over a PQ-compressed corpus with ADC scoring. The
    structure every production vector index ships (FAISS IVFx,PQy).

    The coarse quantizer is the label-cell centroid table (the
    ``sim_ivf_centroids`` build), assignment by squared L2 over the
    bounded probe set — in PQ's native metric, consistent with the ADC
    scores the fine stage produces. (The round-9 composition reused
    the per-label PQ codebook distances as centroid distances, a trick
    only possible BECAUSE codes were labels; with production-shape
    lattice codebooks the coarse stage is its own — tiny — pipeline,
    exactly as FAISS separates coarse and fine quantizers.)

    Scale posture: the ADC scan touches only the assigned cells' code
    rows ({p}/n_cells of the code table — which is itself ~8× smaller
    than the embeddings); the per-probe tables, centroid table and
    cell assignments broadcast; the embeddings never shuffle. This is
    the plan whose two dials the recall reports price: n_probe
    (``sim_ivf_recall_multiprobe``) and the PQ codebook shape
    (``sim_pq_recall_report``).
    """
    adc = _ivfpq_ranked(spark, sf_dir)
    return (adc.filter(F.col("rank") <= PQ_TOPK)
               .select("query_id", "neighbor_id",
                       F.round("ad2", 6).alias("adist2"), "rank"))


def _ivfpq_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id, ad2, rank): the cell-pruned ADC ranking,
    shared by the top-k cut (``sim_ivfpq_search``) and the re-rank
    shortlist cut (``sim_ivfpq_rerank_search``)."""
    e = load_table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb"))
    grid = _pq_grid(e)
    # encode materialized once — see sim_pq_adc_search for the
    # round-10 inlined-re-encode measurement that makes this barrier
    # load-bearing, not an optimization nicety
    coded = _pq_coded(e, grid).localCheckpoint(eager=True)
    cb = _pq_codebook(coded)
    pdt = (_pq_probe_d2(e, cb)
           .select(F.col("vec_id").alias("query_id"), "m", "code", "d2"))

    # coarse assignment: probe → top cells by exact L2 to the label
    # centroids (probe-bounded: |probes| × dim explode against the
    # broadcast centroid table)
    expl = e.select("vec_id",
                    F.posexplode("emb").alias("pos0", "val"))
    cen = (e.select("label", F.posexplode("emb").alias("pos0", "val"))
            .groupBy("label", "pos0")
            .agg(F.avg("val").alias("cval")))
    cdiff = F.col("val") - F.col("cval")
    wcell = Window.partitionBy("query_id").orderBy("cd2", "cell")
    assigned = (expl.filter(_probe_filter())
                .join(F.broadcast(cen), "pos0")
                .groupBy(F.col("vec_id").alias("query_id"),
                         F.col("label").alias("cell"))
                .agg(F.sum(cdiff * cdiff).alias("cd2"))
                .withColumn("rn", F.row_number().over(wcell))
                .filter(F.col("rn") <= IVFPQ_PROBE_CELLS)
                .select("query_id", "cell"))

    # cell-pruned ADC as broadcast equi-joins + a codegen'd
    # array-index fold (see sim_pq_adc_search / _pq_dt_array):
    # assigned cells restrict WHICH code rows are scanned, the probe's
    # dense distance-table array scores them — every join here is a
    # broadcast equi-join, nothing shuffles after the encode
    # projection.
    codes_wide = coded.select("vec_id", F.col("label").alias("cell"),
                              "codes")
    dtm = _pq_dt_array(pdt)
    adc = (codes_wide
           .join(F.broadcast(assigned), ["cell"])
           .join(F.broadcast(dtm), ["query_id"])
           .filter(F.col("vec_id") != F.col("query_id"))
           .select("query_id", F.col("vec_id").alias("neighbor_id"),
                   _pq_adc_fold().alias("ad2")))

    wrank = Window.partitionBy("query_id").orderBy("ad2", "neighbor_id")
    return adc.withColumn("rank", F.row_number().over(wrank))


sim_ivfpq_search.__doc__ = sim_ivfpq_search.__doc__.format(
    p=IVFPQ_PROBE_CELLS)


def _ivfpq_rerank_oracle() -> str:
    d2 = _pq_rerank_d2_sql("q.emb", "c.emb")
    return f"""
    WITH shortlist AS ({_ivfpq_oracle(PQ_RERANK)}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings)
    SELECT query_id, neighbor_id, round(d2, 6) AS dist2, rank FROM (
        SELECT s.query_id, s.neighbor_id, {d2} AS d2,
               row_number() OVER (PARTITION BY s.query_id
                                  ORDER BY {d2}, s.neighbor_id) AS rank
        FROM shortlist s
        JOIN e q ON q.vec_id = s.query_id
        JOIN e c ON c.vec_id = s.neighbor_id)
    WHERE rank <= {PQ_TOPK}
    """


@query("sim_ivfpq_rerank_search", oracle=_ivfpq_rerank_oracle())
def sim_ivfpq_rerank_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete production ANN path: IVF cell pruning → PQ-ADC
    scoring → exact re-rank of the shortlist (FAISS ``IVFx,PQy`` +
    refine). Coarse quantizer prunes WHICH code rows are scanned, PQ
    shrinks WHAT is scanned, the refine stage restores exact ordering
    on the |probes| × PQ_RERANK survivors — all three dials
    (n_probe cells, lattice bits, shortlist width) priced by their
    respective recall reports (``sim_ivf_recall_multiprobe``,
    ``sim_pq_recall_report``, ``sim_pq_rerank_recall``; the
    composition's recall is bounded above by cell membership — a true
    neighbor outside the probed cells can never enter the shortlist,
    which is the n_probe trade the IVF report prices).

    Plan: the cell-pruned ADC ranking (identical to
    ``sim_ivfpq_search``) cut at ``PQ_RERANK``, then the shared
    ``_exact_rerank`` refine join — shortlist broadcasts, corpus
    scanned once, never shuffled. The oracle nests the full IVF-PQ
    pipeline at shortlist width and replicates the exact re-score."""
    sl = (_ivfpq_ranked(spark, sf_dir)
          .filter(F.col("rank") <= PQ_RERANK)
          .select("query_id", "neighbor_id"))
    return _exact_rerank(spark, sf_dir, sl)


# ---------------------------------------------------------------------------
# incremental ANN ingest (VERDICT r12 item 5) — the similarity-search
# analog of dedup_incremental_minhash: a NEW embedding batch is folded
# into an EXISTING IVF-PQ index without rebuilding it. The index side
# (coarse centroids, PQ grid) is derived from the corpus ONLY; each
# batch vector is (a) assigned to its nearest coarse cell (cosine over
# the tiny broadcast centroid table) and (b) PQ-encoded against the
# frozen corpus grid — the reference's file-arrival cadence
# (app.py:131-134) applied to the vector index. At 100 TB the batch is
# a day's shard: work is |batch| × n_cells for assignment and one
# codegen projection for the codes; the corpus is touched only to
# derive the (cached, in production persisted) centroid/grid tables —
# never joined against the batch.
# ---------------------------------------------------------------------------

INGEST_MOD = 10
INGEST_REM = 7  # batch = vec_id % 10 == 7 — disjoint from the probe
#                 set (% 25 == 0), so probe workloads never mutate


def _ingest_is_batch() -> Column:
    return (F.col("vec_id") % INGEST_MOD) == INGEST_REM


_INGEST_BATCH_SQL = f"vec_id % {INGEST_MOD} = {INGEST_REM}"



class _CorpusCellIndex:
    """The frozen coarse index as DRIVER-SIDE metadata: per-cell
    centroid vectors and norms (and, with ``with_grid``, the PQ
    quantization grid), collected from ONE distributed stats pass over
    the corpus (optimization round 15, guide §1.2 step 1 / §2.4).

    Why collected and not broadcast DataFrames: the index is n_cells ×
    dim values — quantizer CONFIGURATION, bounded by the index shape
    and never by corpus size (the same ≤-tiny-collect class as the
    z-order histogram; a BroadcastExchange would collect the identical
    rows to the driver anyway). Holding it as literals lets the cell
    assignment be a pure projection (no explode, no aggregation
    exchange, no window — see ``_ingest_assign_cells``), which at
    100 TB removes every shuffle of the ingest batch and at bench
    scale removes ~10 scheduled stages per query. Previously cen,
    cnorm and the separate ``_pq_grid(corpus)`` each hung a full
    corpus explode + aggregation under their own broadcast exchange,
    re-aggregating the corpus up to four times per query.

    Exactness: avg per (label, pos) is computed by the same
    distributed aggregation as before; the grid's global min/max per
    pos equal min-of-per-label-mins / max-of-per-label-maxes (exact
    order-independent reductions); the norms sum cval² in ascending
    pos order — the same order the exploded rows reached the old
    per-label aggregate — in IEEE doubles, so every derived value is
    bit-identical and the oracle contract holds.
    """

    __slots__ = ("labels", "cen", "cn", "mna", "wa", "label_dtype")

    def __init__(self, corpus: DataFrame, with_grid: bool = False):
        import math

        rows = (corpus
                .select("label", F.posexplode("emb").alias("pos0", "val"))
                .groupBy("label", "pos0")
                .agg(F.avg("val").alias("cval"),
                     F.min("val").alias("mn"),
                     F.max("val").alias("mx"))
                .collect())
        self.label_dtype = dict(corpus.dtypes)["label"]
        by_label: dict = {}
        for r in rows:
            by_label.setdefault(r["label"], {})[r["pos0"]] = r
        # A null cell label never equi-joined into any cell in the old
        # relational form; the literal form has no place for it either.
        assert None not in by_label, \
            "null cell label in corpus index — relational join semantics " \
            "would drop it; refusing to bake it into the literal index"
        self.labels = sorted(by_label)
        self.cen = {lb: [by_label[lb][p]["cval"] for p in sorted(by_label[lb])]
                    for lb in self.labels}
        self.cn = {lb: math.sqrt(_inorder_sum(v * v for v in self.cen[lb]))
                   for lb in self.labels}
        # NaN cosines (a zero-norm centroid) would order differently
        # under the comparator sort than under the old window sort —
        # fail loudly instead of silently diverging (cannot happen for
        # mean vectors of non-degenerate cells).
        assert all(c > 0 for c in self.cn.values()), \
            "zero/NaN centroid norm in corpus index"
        if not with_grid:
            self.mna = self.wa = None
            return
        dims = sorted({p for rs in by_label.values() for p in rs})
        self.mna = [min(by_label[lb][p]["mn"] for lb in self.labels)
                    for p in dims]
        self.wa = [max(max(by_label[lb][p]["mx"] for lb in self.labels)
                       - self.mna[i], 1e-30)
                   for i, p in enumerate(dims)]

    def grid_cols(self):
        """(mna, wa) literal array columns — the quantization grid the
        ``_pq_bin_expr`` / ``_pq_sat_bin_expr`` encodes read."""
        return (F.array(*[F.lit(v) for v in self.mna]),
                F.array(*[F.lit(v) for v in self.wa]))


def _inorder_sum(it) -> float:
    """Left-to-right IEEE double sum — the same association order as
    Spark's in-partition aggregate over pos-ascending exploded rows and
    the ``dot()`` fold (double addition is order-sensitive)."""
    acc = 0.0
    for x in it:
        acc = acc + x
    return acc


def _ingest_corpus_cells(corpus: DataFrame, with_grid: bool = False):
    """Build the frozen coarse index (see ``_CorpusCellIndex``)."""
    return _CorpusCellIndex(corpus, with_grid)


def _ingest_assign_cells(vecs: DataFrame, index: _CorpusCellIndex,
                         n_cells: int, keep: tuple = ()) -> DataFrame:
    """Top-``n_cells`` coarse-cell assignment by cosine against the
    frozen centroids: (vec_id, label, ccos), ties broken by label —
    the single assignment implementation shared by the ingest and the
    post-ingest recall/serving paths.

    Optimization round 15 (guide §2.4 "remove shuffles outright"):
    a pure PROJECTION — per-row in-order dot folds against the literal
    centroid vectors, a comparator array_sort for the (ccos desc,
    label asc) top-``n_cells``, one inline explode. The previous
    relational form (posexplode → two aggregations → window) shuffled
    |vecs| × dim exploded rows twice and sorted a window per call; at
    100 TB the ingest batch now never shuffles at all. Arithmetic is
    fold-order-identical: dot sums products in ascending pos order
    (what the old per-(vec_id, label) aggregate received), vn/cn are
    the same sqrt-of-in-order-sums, ccos the same dot / (vn * cn).

    ``keep`` lists pass-through columns of ``vecs`` to carry alongside
    the assignment — consumers that previously re-joined the
    assignment back onto ``vecs`` on vec_id (the encode/codes columns)
    ride the same projection instead of paying that join."""
    vn = l2norm(F.col("emb"))
    cands = F.array(*[
        F.struct(
            F.lit(lb).cast(index.label_dtype).alias("label"),
            (dot(F.col("emb"), F.array(*[F.lit(v) for v in index.cen[lb]]))
             / (F.col("vn") * F.lit(index.cn[lb]))).alias("ccos"))
        for lb in index.labels])
    top = F.slice(
        F.array_sort(cands, lambda l, r: (
            F.when(l["ccos"] > r["ccos"], -1)
             .when(l["ccos"] < r["ccos"], 1)
             .when(l["label"] < r["label"], -1)
             .when(l["label"] > r["label"], 1)
             .otherwise(0))),
        1, n_cells)
    return (vecs.withColumn("vn", vn)
            .select("vec_id", *keep, F.explode(top).alias("s"))
            .select("vec_id", F.col("s.label").alias("label"),
                    F.col("s.ccos").alias("ccos"), *keep))


def _pq_sat_bin_expr(pos: int):
    """Saturating lattice bin against the broadcast grid arrays —
    ``greatest(0, least(levels-1, floor(...)))``. The frozen grid was
    trained on the corpus, so an out-of-distribution batch value can
    fall OUTSIDE [min, max]: clamp its bin on BOTH ends (the
    full-corpus encode in ``_pq_bin_expr`` never needs the low clamp —
    its grid min is the data min by construction). Standard
    frozen-quantizer edge-bin saturation; shared by the ingest and the
    post-ingest rerank serving path."""
    x = F.element_at(F.col("emb"), pos + 1)
    mn = F.element_at(F.col("mna"), pos + 1)
    w = F.element_at(F.col("wa"), pos + 1)
    return F.greatest(
        F.lit(0),
        F.least(F.lit(PQ_LEVELS - 1),
                F.floor((x - mn) / w * PQ_LEVELS))).cast("int")


def _pq_sat_code_expr(m: int):
    """Subspace-``m`` saturated PQ code (the ``_pq_code_expr`` fold
    over ``_pq_sat_bin_expr`` bins)."""
    parts = [_pq_sat_bin_expr(m * PQ_DSUB + j) * (PQ_LEVELS ** j)
             for j in range(PQ_DSUB)]
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def _pq_sat_codes_arr():
    """All ``PQ_M`` saturated subspace codes as one array expression —
    pure whole-stage codegen against the broadcast 1-row grid.
    Memoized — constant tree, see ``_cached_expr``."""
    return _cached_expr("pq_sat_codes", lambda: F.array(
        *[_pq_sat_code_expr(m).cast("int") for m in range(PQ_M)]))


def _ingest_oracle() -> str:
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    corpus AS (SELECT * FROM e WHERE NOT ({_INGEST_BATCH_SQL})),
    batch AS (SELECT * FROM e WHERE {_INGEST_BATCH_SQL}),
    cexpl AS (SELECT label, unnest(emb) AS val,
                     generate_subscripts(emb, 1) AS pos FROM corpus),
    cen AS (SELECT label, pos, avg(val) AS cval
            FROM cexpl GROUP BY label, pos),
    cnorm AS (SELECT label, sqrt(sum(cval * cval)) AS cn
              FROM cen GROUP BY label),
    bexpl AS (SELECT vec_id, unnest(emb) AS val,
                     generate_subscripts(emb, 1) AS pos FROM batch),
    bnorm AS (SELECT vec_id, sqrt(sum(val * val)) AS pn
              FROM bexpl GROUP BY vec_id),
    pc AS (SELECT b.vec_id, c.label,
                  sum(b.val * c.cval) / (pn.pn * cn.cn) AS ccos
           FROM bexpl b JOIN cen c USING (pos)
           JOIN bnorm pn ON pn.vec_id = b.vec_id
           JOIN cnorm cn ON cn.label = c.label
           GROUP BY b.vec_id, c.label, pn.pn, cn.cn),
    assigned AS (SELECT vec_id, label, ccos FROM (
        SELECT vec_id, label, ccos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, label) AS rn
        FROM pc) WHERE rn = 1),
    grid AS (SELECT pos, min(val) AS mn,
                    greatest(max(val) - min(val), 1e-30) AS w
             FROM (SELECT unnest(emb) AS val,
                          generate_subscripts(emb, 1) AS pos FROM corpus)
             GROUP BY pos),
    bsub AS (SELECT vec_id, val, pos,
                    CAST((pos - 1) // {PQ_DSUB} AS INT) AS m,
                    CAST((pos - 1) % {PQ_DSUB} AS INT) AS j FROM bexpl),
    codes AS (SELECT vec_id, m,
                     CAST(sum(greatest(0, least({PQ_LEVELS - 1},
                              CAST(floor((s.val - g.mn) / g.w
                                         * {PQ_LEVELS}) AS INT)))
                          * (1 << ({PQ_BITS} * s.j))) AS INT) AS code
              FROM bsub s JOIN grid g USING (pos)
              GROUP BY vec_id, m),
    cstr AS (SELECT vec_id,
                    string_agg(CAST(code AS VARCHAR), '-' ORDER BY m)
                      AS codes_str
             FROM codes GROUP BY vec_id)
    SELECT a.vec_id, a.label AS cell, round(a.ccos, 6) AS ccos,
           cstr.codes_str
    FROM assigned a JOIN cstr USING (vec_id)
    """


@query("sim_ivf_incremental_ingest", oracle=_ingest_oracle())
def sim_ivf_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF-PQ ingest: assign each NEW vector (the batch,
    ``vec_id % {mod} == {rem}``) to its nearest existing coarse cell
    and PQ-encode it against the frozen corpus grid — (vec_id, cell,
    ccos, codes_str), deterministic given the fixed index, so fully
    oracle-gated.

    Plan shape: centroid/norm/grid tables are tiny corpus aggregations
    (n_cells × dim and dim rows) that BROADCAST; the batch explodes
    once for the assignment dot products (|batch| × dim × n_cells
    partial-agg rows — map-side combined) and the PQ encode is one
    whole-stage-codegen projection against the broadcast grid (the
    ``_pq_coded`` discipline: no argmin, no join, no shuffle of the
    batch). The corpus is NEVER joined against the batch.
    ``sim_ivf_incremental_recall`` value-checks that a post-ingest
    multiprobe search over the updated index finds the new vectors."""
    e = load_table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb"))
    corpus = e.filter(~_ingest_is_batch())
    batch = e.filter(_ingest_is_batch())

    cen, cnorm, grid = _ingest_corpus_cells(corpus, with_grid=True)
    assigned = _ingest_assign_cells(batch, cen, cnorm, 1).select(
        "vec_id", F.col("label").alias("cell"),
        F.round("ccos", 6).alias("ccos"))

    # Saturating encode against the frozen corpus grid — see
    # _pq_sat_bin_expr; the oracle applies the identical
    # greatest/least clamps.
    codes = _pq_sat_codes_arr()
    coded = (batch.crossJoin(F.broadcast(grid))
             .select("vec_id",
                     F.array_join(
                         F.transform(codes, lambda c: c.cast("string")),
                         "-").alias("codes_str")))
    return assigned.join(coded, "vec_id").select(
        "vec_id", "cell", "ccos", "codes_str")


sim_ivf_incremental_ingest.__doc__ = sim_ivf_incremental_ingest.__doc__\
    .format(mod=INGEST_MOD, rem=INGEST_REM)


def _ingest_recall_oracle() -> str:
    """Post-ingest multiprobe search recall vs exact brute force over
    batch ∪ corpus: the index labels are the ORIGINAL cells for corpus
    vectors and the INGEST-ASSIGNED cells for batch vectors (the
    centroid table stays corpus-only — frozen index)."""
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    corpus AS (SELECT * FROM e WHERE NOT ({_INGEST_BATCH_SQL})),
    batch AS (SELECT * FROM e WHERE {_INGEST_BATCH_SQL}),
    cexpl AS (SELECT label, unnest(emb) AS val,
                     generate_subscripts(emb, 1) AS pos FROM corpus),
    cen AS (SELECT label, pos, avg(val) AS cval
            FROM cexpl GROUP BY label, pos),
    cnorm AS (SELECT label, sqrt(sum(cval * cval)) AS cn
              FROM cen GROUP BY label),
    bexpl AS (SELECT vec_id, unnest(emb) AS val,
                     generate_subscripts(emb, 1) AS pos FROM batch),
    bnorm AS (SELECT vec_id, sqrt(sum(val * val)) AS pn
              FROM bexpl GROUP BY vec_id),
    bpc AS (SELECT b.vec_id, c.label,
                   sum(b.val * c.cval) / (pn.pn * cn.cn) AS ccos
            FROM bexpl b JOIN cen c USING (pos)
            JOIN bnorm pn ON pn.vec_id = b.vec_id
            JOIN cnorm cn ON cn.label = c.label
            GROUP BY b.vec_id, c.label, pn.pn, cn.cn),
    ingested AS (SELECT vec_id, label FROM (
        SELECT vec_id, label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, label) AS rn
        FROM bpc) WHERE rn = 1),
    idx AS (SELECT vec_id, label, emb FROM corpus
            UNION ALL
            SELECT b.vec_id, i.label, b.emb
            FROM batch b JOIN ingested i USING (vec_id)),
    probes AS (SELECT vec_id, emb FROM e
               WHERE vec_id % {PROBE_MOD} = 0 AND vec_id < {PROBE_CAP}),
    pexpl AS (SELECT vec_id, unnest(emb) AS val,
                     generate_subscripts(emb, 1) AS pos FROM probes),
    pnorm AS (SELECT vec_id, sqrt(sum(val * val)) AS nrm
              FROM pexpl GROUP BY vec_id),
    ppc AS (SELECT p.vec_id, c.label,
                   sum(p.val * c.cval) / (pn.nrm * cn.cn) AS ccos
            FROM pexpl p JOIN cen c USING (pos)
            JOIN pnorm pn ON pn.vec_id = p.vec_id
            JOIN cnorm cn ON cn.label = c.label
            GROUP BY p.vec_id, c.label, pn.nrm, cn.cn),
    passigned AS (SELECT vec_id, label FROM (
        SELECT vec_id, label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, label) AS rn
        FROM ppc) WHERE rn <= {IVF_PROBE_CELLS}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_cos_sql('q.emb', 'c.emb')} AS cos
        FROM probes q
        JOIN passigned a ON a.vec_id = q.vec_id
        JOIN idx c ON c.label = a.label AND c.vec_id <> q.vec_id),
    ivf_k AS (SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored) WHERE rank <= {IVF_K}),
    exact_k AS (SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_cos_sql('q.emb', 'c.emb')} DESC,
                                           c.vec_id) AS rank
        FROM probes q JOIN e c ON c.vec_id <> q.vec_id)
        WHERE rank <= {IVF_K})
    SELECT e.query_id, CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
           round(count(a.neighbor_id) * 1.0 / {IVF_K}, 6) AS recall_at_k
    FROM exact_k e
    LEFT JOIN ivf_k a ON a.query_id = e.query_id
                     AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """


@query("sim_ivf_incremental_recall", oracle=_ingest_recall_oracle())
def sim_ivf_incremental_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k sign-off for the incremental ingest: run the standard
    multiprobe IVF search over the POST-INGEST index (corpus vectors
    under their original cells ∪ batch vectors under their ingest-
    assigned cells; centroids stay corpus-only — the frozen-index
    contract) and audit against exact cosine top-k over batch ∪ corpus.
    A newly ingested vector is retrievable exactly when its assigned
    cell is among a probe's scanned cells — the recall number this
    report prices (every approximate path in this repo ships one; the
    ``sim_ivf_recall_multiprobe`` discipline). Plan shape matches the
    ingest + search queries: broadcast centroid/assignment tables, one
    cell-pruned scored join, bounded windows."""
    # parallel="force": the exact brute-force audit side broadcasts the
    # probe set, so this scan's partitioning is the only parallelism the
    # O(probes x corpus) d2 folds get (VERDICT r14 item 1; measured
    # 2.16 -> 1.21 s warm at sf0.1).
    e = load_table(spark, sf_dir, "embeddings", parallel="force").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb"))
    corpus = e.filter(~_ingest_is_batch())
    batch = e.filter(_ingest_is_batch())

    cen, cnorm = _ingest_corpus_cells(corpus)

    def assign(vecs: DataFrame, n_cells: int) -> DataFrame:
        return _ingest_assign_cells(vecs, cen, cnorm, n_cells).select(
            "vec_id", "label")

    ingested = assign(batch, 1)
    idx = corpus.select("vec_id", "label", "emb").unionAll(
        batch.select("vec_id", "emb")
             .join(ingested, "vec_id")
             .select("vec_id", "label", "emb"))

    probes = e.filter(_probe_filter()).select("vec_id", "emb")
    passigned = assign(probes, IVF_PROBE_CELLS)

    q = (F.broadcast(probes.join(passigned, "vec_id"))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("label").alias("cell"),
                 F.col("emb").alias("qemb"),
                 l2norm(F.col("emb")).alias("qnrm")))
    c = idx.withColumn("nrm", l2norm(F.col("emb"))).alias("c")
    scored = (
        q.join(c, (F.col("c.label") == F.col("cell"))
               & (F.col("c.vec_id") != F.col("query_id")))
        .select("query_id", F.col("c.vec_id").alias("neighbor_id"),
                cosine_pair(F.col("qemb"), F.col("c.emb"),
                            F.col("qnrm"), F.col("c.nrm")).alias("cos")))
    wrank = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    ivf_k = (scored.withColumn("rank", F.row_number().over(wrank))
             .filter(F.col("rank") <= IVF_K)
             .select("query_id", "neighbor_id"))

    qx = (e.filter(_probe_filter())
          .select(F.col("vec_id").alias("query_id"),
                  F.col("emb").alias("qemb"),
                  l2norm(F.col("emb")).alias("qnrm")))
    cx = e.withColumn("nrm", l2norm(F.col("emb"))).alias("cx")
    exact_scored = (
        F.broadcast(qx).join(
            cx, F.col("cx.vec_id") != F.col("query_id"))
        .select("query_id", F.col("cx.vec_id").alias("neighbor_id"),
                cosine_pair(F.col("qemb"), F.col("cx.emb"),
                            F.col("qnrm"), F.col("cx.nrm")).alias("cos")))
    exact_k = (exact_scored.withColumn("rank", F.row_number().over(wrank))
               .filter(F.col("rank") <= IVF_K)
               .select("query_id", F.col("neighbor_id").alias("xn")))

    hits = ivf_k.select("query_id",
                        F.col("neighbor_id").alias("ivf_neighbor"))
    return (
        exact_k.join(
            hits, (exact_k.query_id == hits.query_id)
            & (exact_k.xn == hits.ivf_neighbor), "left")
        .groupBy(exact_k.query_id.alias("query_id"))
        .agg(F.count("ivf_neighbor").alias("n_hit"))
        .select("query_id", "n_hit",
                F.round(F.col("n_hit") / IVF_K, 6).alias("recall_at_k")))


# ---------------------------------------------------------------------------
# incremental ANN ingest + exact-refine serving path (VERDICT r13
# item 3) — the composition the r13 recall numbers exposed as missing:
# ``sim_ivf_incremental_recall`` signs the ingest off at multiprobe-
# family recall (0.21-0.25 @3), while the corpus-side serving path
# (``sim_ivfpq_rerank_search``) recovers the rerank-family level by
# ADC-shortlisting and exactly re-scoring. This operator runs that
# same serving discipline over the FROZEN+INGESTED index: multiprobe
# cell pruning over corpus cells ∪ ingest-assigned cells, ADC against
# the post-ingest code table, ONE broadcast exact re-rank.
#
# Frozen-index contract at 100 TB: centroids and the PQ grid stay
# corpus-derived (never recomputed per batch); the batch contributes
# (a) its ingest-assigned cell rows and (b) its saturated codes. The
# per-bin reconstruction values (the codebook) DO fold the batch in —
# bin means are sum/count aggregates, so a production index maintains
# them incrementally at O(|batch|) delta cost, the one index structure
# that updates with an ingest besides the postings themselves.
# ---------------------------------------------------------------------------


def _ingest_rerank_oracle() -> str:
    d2 = _pq_rerank_d2_sql("q.emb", "c.emb")
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    corpus AS (SELECT * FROM e WHERE NOT ({_INGEST_BATCH_SQL})),
    batch AS (SELECT * FROM e WHERE {_INGEST_BATCH_SQL}),
    cexpl AS (SELECT label, unnest(emb) AS val,
                     generate_subscripts(emb, 1) AS pos FROM corpus),
    cen AS (SELECT label, pos, avg(val) AS cval
            FROM cexpl GROUP BY label, pos),
    cnorm AS (SELECT label, sqrt(sum(cval * cval)) AS cn
              FROM cen GROUP BY label),
    bexpl AS (SELECT vec_id, unnest(emb) AS val,
                     generate_subscripts(emb, 1) AS pos FROM batch),
    bnorm AS (SELECT vec_id, sqrt(sum(val * val)) AS pn
              FROM bexpl GROUP BY vec_id),
    bpc AS (SELECT b.vec_id, c.label,
                   sum(b.val * c.cval) / (pn.pn * cn.cn) AS ccos
            FROM bexpl b JOIN cen c USING (pos)
            JOIN bnorm pn ON pn.vec_id = b.vec_id
            JOIN cnorm cn ON cn.label = c.label
            GROUP BY b.vec_id, c.label, pn.pn, cn.cn),
    ingested AS (SELECT vec_id, label FROM (
        SELECT vec_id, label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, label) AS rn
        FROM bpc) WHERE rn = 1),
    grid AS (SELECT pos, min(val) AS mn,
                    greatest(max(val) - min(val), 1e-30) AS w
             FROM (SELECT unnest(emb) AS val,
                          generate_subscripts(emb, 1) AS pos FROM corpus)
             GROUP BY pos),
    csub AS (SELECT vec_id, val, pos,
                    CAST((pos - 1) // {PQ_DSUB} AS INT) AS m,
                    CAST((pos - 1) % {PQ_DSUB} AS INT) AS j
             FROM (SELECT vec_id, unnest(emb) AS val,
                          generate_subscripts(emb, 1) AS pos FROM corpus)),
    ccodes AS (SELECT vec_id, m,
                      CAST(sum(least({PQ_LEVELS - 1},
                               CAST(floor((s.val - g.mn) / g.w
                                          * {PQ_LEVELS}) AS INT))
                           * (1 << ({PQ_BITS} * s.j))) AS INT) AS code
               FROM csub s JOIN grid g USING (pos)
               GROUP BY vec_id, m),
    bsub AS (SELECT vec_id, val, pos,
                    CAST((pos - 1) // {PQ_DSUB} AS INT) AS m,
                    CAST((pos - 1) % {PQ_DSUB} AS INT) AS j FROM bexpl),
    bcodes AS (SELECT vec_id, m,
                      CAST(sum(greatest(0, least({PQ_LEVELS - 1},
                               CAST(floor((s.val - g.mn) / g.w
                                          * {PQ_LEVELS}) AS INT)))
                           * (1 << ({PQ_BITS} * s.j))) AS INT) AS code
               FROM bsub s JOIN grid g USING (pos)
               GROUP BY vec_id, m),
    idxcodes AS (
        SELECT c.vec_id, v.label AS cell, c.m, c.code
        FROM ccodes c JOIN corpus v ON v.vec_id = c.vec_id
        UNION ALL
        SELECT b.vec_id, i.label AS cell, b.m, b.code
        FROM bcodes b JOIN ingested i ON i.vec_id = b.vec_id),
    allsub AS (SELECT vec_id, val, pos, m FROM csub
               UNION ALL
               SELECT vec_id, val, pos, m FROM bsub),
    cb AS (SELECT ic.code, s.m, s.pos, avg(s.val) AS cval
           FROM allsub s JOIN idxcodes ic
             ON ic.vec_id = s.vec_id AND ic.m = s.m
           GROUP BY ic.code, s.m, s.pos),
    pdt AS (SELECT s.vec_id AS query_id, s.m, cb.code,
                   sum((s.val - cb.cval) * (s.val - cb.cval)) AS d2
            FROM (SELECT vec_id, val, pos,
                         CAST((pos - 1) // {PQ_DSUB} AS INT) AS m
                  FROM (SELECT vec_id, unnest(emb) AS val,
                               generate_subscripts(emb, 1) AS pos
                        FROM e
                        WHERE vec_id % {PROBE_MOD} = 0
                          AND vec_id < {PROBE_CAP})) s
            JOIN cb ON cb.m = s.m AND cb.pos = s.pos
            GROUP BY s.vec_id, s.m, cb.code),
    pexpl AS (SELECT vec_id, unnest(emb) AS val,
                     generate_subscripts(emb, 1) AS pos FROM e
              WHERE vec_id % {PROBE_MOD} = 0 AND vec_id < {PROBE_CAP}),
    pnorm AS (SELECT vec_id, sqrt(sum(val * val)) AS nrm
              FROM pexpl GROUP BY vec_id),
    ppc AS (SELECT p.vec_id, c.label,
                   sum(p.val * c.cval) / (pn.nrm * cn.cn) AS ccos
            FROM pexpl p JOIN cen c USING (pos)
            JOIN pnorm pn ON pn.vec_id = p.vec_id
            JOIN cnorm cn ON cn.label = c.label
            GROUP BY p.vec_id, c.label, pn.nrm, cn.cn),
    passigned AS (SELECT vec_id, label FROM (
        SELECT vec_id, label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, label) AS rn
        FROM ppc) WHERE rn <= {IVF_PROBE_CELLS}),
    adc AS (SELECT q.query_id, ic.vec_id AS neighbor_id, sum(q.d2) AS ad2
            FROM pdt q
            JOIN idxcodes ic ON ic.m = q.m AND ic.code = q.code
            JOIN passigned a ON a.vec_id = q.query_id
                            AND a.label = ic.cell
            WHERE ic.vec_id <> q.query_id
            GROUP BY q.query_id, ic.vec_id),
    shortlist AS (SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY ad2, neighbor_id) AS rank
        FROM adc) WHERE rank <= {PQ_RERANK}),
    ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings)
    SELECT query_id, neighbor_id, round(d2, 6) AS dist2, rank FROM (
        SELECT s.query_id, s.neighbor_id, {d2} AS d2,
               row_number() OVER (PARTITION BY s.query_id
                                  ORDER BY {d2}, s.neighbor_id) AS rank
        FROM shortlist s
        JOIN ev q ON q.vec_id = s.query_id
        JOIN ev c ON c.vec_id = s.neighbor_id)
    WHERE rank <= {PQ_TOPK}
    """


def _ingest_rerank_shortlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id): the PQ_RERANK-wide ADC shortlist over
    the post-ingest index — cell-pruned to each probe's multiprobe
    cells, scored against the incrementally-updated codebook."""
    e = load_table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb"))
    corpus = e.filter(~_ingest_is_batch())
    batch = e.filter(_ingest_is_batch())

    cen, cnorm, grid = _ingest_corpus_cells(corpus, with_grid=True)
    ingested = _ingest_assign_cells(batch, cen, cnorm, 1).select(
        "vec_id", "label")

    ccoded = _pq_coded(corpus, grid).select(
        "vec_id", "label", "emb", "codes")
    bcoded = (batch.crossJoin(F.broadcast(grid))
              .select("vec_id", "emb", _pq_sat_codes_arr().alias("codes"))
              .join(ingested, "vec_id")
              .select("vec_id", "label", "emb", "codes"))
    # one materialization barrier for the post-ingest codes table — the
    # _pq_adc_ranked lesson (inlined ~3,000-op encode re-evaluated per
    # candidate pair without it); this IS the table a production index
    # persists, at PQ compression
    coded = ccoded.unionAll(bcoded).localCheckpoint(eager=True)

    cb = _pq_codebook(coded)
    pdt = _pq_probe_d2(e, cb).select(
        F.col("vec_id").alias("query_id"), "m", "code", "d2")
    passigned = _ingest_assign_cells(
        e.filter(_probe_filter()), cen, cnorm, IVF_PROBE_CELLS).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("cell"))

    dtm = _pq_dt_array(pdt)
    adc = (coded.select("vec_id", F.col("label").alias("cell"), "codes")
           .join(F.broadcast(passigned), ["cell"])
           .join(F.broadcast(dtm), ["query_id"])
           .filter(F.col("vec_id") != F.col("query_id"))
           .select("query_id", F.col("vec_id").alias("neighbor_id"),
                   _pq_adc_fold().alias("ad2")))
    wrank = Window.partitionBy("query_id").orderBy("ad2", "neighbor_id")
    return (adc.withColumn("rank", F.row_number().over(wrank))
               .filter(F.col("rank") <= PQ_RERANK)
               .select("query_id", "neighbor_id"))


@query("sim_ivf_incremental_rerank_search", oracle=_ingest_rerank_oracle())
def sim_ivf_incremental_rerank_search(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """The production serving path over the FROZEN+INGESTED index:
    multiprobe IVF cell pruning (corpus cells ∪ ingest-assigned
    cells, frozen corpus centroids) → ADC scoring against the
    post-ingest code table (corpus codes + the batch's saturated
    codes; codebook = incrementally-maintained bin means) → ONE
    broadcast exact re-rank of the PQ_RERANK shortlist
    (``_exact_rerank``: shortlist broadcasts, the full-precision
    corpus is scanned once, never shuffled).

    This closes the loop the r13 round left open: ingest
    (``sim_ivf_incremental_ingest``) priced adding vectors at
    O(|batch|); this query serves them at rerank-family quality —
    ``sim_ivf_incremental_rerank_recall`` measures the recovery vs the
    0.21-0.25 multiprobe-only recall. Deterministic given the frozen
    index, so fully oracle-gated: the SQL replays split → centroids →
    assignment → grid → both encodes → codebook → distance tables →
    cell-pruned ADC → exact refine end to end.

    Plan shape: every index-side table (centroids, norms, grid,
    distance-table arrays, probe cell assignments) broadcasts; the
    only scans of the corpus are the two encode projections and the
    refine's single broadcast-hash join; the batch never joins the
    corpus. At 100 TB the ADC scan touches n_probe/n_cells of the
    code table — which is ~8× smaller than the embeddings — and the
    refine reads |probes| × {PQ_RERANK} full vectors."""
    sl = _ingest_rerank_shortlist(spark, sf_dir)
    return _exact_rerank(spark, sf_dir, sl)


sim_ivf_incremental_rerank_search.__doc__ = \
    sim_ivf_incremental_rerank_search.__doc__.format(PQ_RERANK=PQ_RERANK)


def _ingest_rerank_recall_oracle() -> str:
    from dask_lambda_example_spark.registry import QUERIES

    rr = QUERIES["sim_ivf_incremental_rerank_search"].oracle
    d2 = _pq_rerank_d2_sql("q.emb", "c.emb")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    exact_k AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY {d2}, c.vec_id) AS rank
            FROM e q JOIN e c ON c.vec_id <> q.vec_id
            WHERE q.vec_id % {PROBE_MOD} = 0 AND q.vec_id < {PROBE_CAP})
        WHERE rank <= {PQ_TOPK}),
    rr_full AS ({rr})
    SELECT e.query_id, CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
           round(count(a.neighbor_id) * 1.0 / {PQ_TOPK}, 6) AS recall_at_k
    FROM exact_k e
    LEFT JOIN rr_full a ON a.query_id = e.query_id
                       AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """


@query("sim_ivf_incremental_rerank_recall",
       oracle=_ingest_rerank_recall_oracle())
def sim_ivf_incremental_rerank_recall(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Recall@k sign-off for the incremental serving path (every
    approximate path in this repo ships one): the post-ingest
    multiprobe→ADC→exact-refine result audited against exact
    squared-L2 brute force over batch ∪ corpus. The number this
    report prices is what the refine stage RECOVERS over the
    multiprobe-only ``sim_ivf_incremental_recall`` (0.21-0.25 @3 at
    r13 dials) — bounded above by cell membership of the true top-k,
    exactly like the corpus-side ``sim_pq_rerank_recall``. Same audit
    shape: probe-bounded exact side, |probes| × k audit join."""
    # parallel="force": the exact brute-force audit side broadcasts the
    # probe set, so this scan's partitioning is the only parallelism the
    # O(probes x corpus) d2 folds get (VERDICT r14 item 1; measured
    # 2.16 -> 1.21 s warm at sf0.1).
    e = load_table(spark, sf_dir, "embeddings", parallel="force").select(
        "vec_id", as_double(F.col("embedding")).alias("emb"))
    q = (e.filter(_probe_filter())
          .select(F.col("vec_id").alias("query_id"),
                  F.col("emb").alias("qemb"),
                  dot(F.col("emb"), F.col("emb")).alias("qq")))
    c = e.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("emb").alias("cemb"),
                 dot(F.col("emb"), F.col("emb")).alias("cc"))
    d2 = (F.col("qq") - 2 * dot(F.col("qemb"), F.col("cemb"))
          + F.col("cc"))
    wrank = Window.partitionBy("query_id").orderBy(d2, F.asc("neighbor_id"))
    exact_k = (F.broadcast(q)
               .join(c, F.col("neighbor_id") != F.col("query_id"))
               .withColumn("rank", F.row_number().over(wrank))
               .filter(F.col("rank") <= PQ_TOPK)
               .select("query_id", "neighbor_id"))
    rr = (sim_ivf_incremental_rerank_search(spark, sf_dir)
          .select("query_id", F.col("neighbor_id").alias("rr_neighbor")))
    return (
        exact_k.join(
            rr, (exact_k.query_id == rr.query_id)
            & (exact_k.neighbor_id == rr.rr_neighbor), "left")
        .groupBy(exact_k.query_id.alias("query_id"))
        .agg(F.count("rr_neighbor").alias("n_hit"))
        .select("query_id", "n_hit",
                F.round(F.col("n_hit") / PQ_TOPK, 6).alias("recall_at_k"))
    )
